"""Distributed BPE tokenizer training (Sennrich et al. 2016, "Neural
Machine Translation of Rare Words with Subword Units").

The engine already counts tokens with a FIXED BPE-ish regex
(textops.doc_bpe_token_counts) and builds whitespace vocabularies
(packing.build_token_vocab); this module LEARNS the merge table — the
piece an LLM-training pipeline actually trains.

Scale shape:

* Stage 1 — the only corpus-scale pass: a word-frequency table via
  per-block Counter partials -> ONE groupby(word).sum shuffle.  The
  corpus never moves again; every merge round runs over the word
  table, which is smaller than the corpus by the repetition factor
  (Zipf: ~1e2-1e4x on web text).
* Stage 2 — merge rounds, two physical paths producing IDENTICAL
  merge lists (tested):
  - mode="driver" (default): the word table is pulled through a
    DOCUMENTED gate (``max_words``) and the classic in-memory loop
    runs — exactly what HuggingFace tokenizers / SentencePiece do
    after their own distributed word count.  Raising
    ``min_word_freq`` shrinks the table monotonically (the survivor-
    gate remedy pattern).
  - mode="distributed": each round is one partial-agg pair count over
    the word-table Dataset (per-block state bounded by the block's
    distinct pairs), a tiny sort-with-deterministic-tie-break argmax,
    and a broadcast rewrite map — the word table never leaves the
    cluster.  For corpora whose distinct-word table exceeds the
    driver gate.  Cost per round is a full recount of the word table
    (the incremental-update trick of in-memory trainers does not
    decompose into an associative aggregate); n_merges bounds it.

Tie-break everywhere: (count desc, pair lexicographic asc) — fully
deterministic, independent of block layout and merge order.

Reference analog: the per-token normalization/stemming pipeline of
ocr_evaluation.py:19-21 consumes a FIXED vocabulary; this is the
operator that would produce one.
"""

from __future__ import annotations

from collections import Counter

import pyarrow as pa

END = "</w>"


def _to_syms(word: str) -> tuple[str, ...]:
    return tuple(word) + (END,)


def _merge_word(sym: tuple[str, ...], a: str, b: str) -> tuple[str, ...]:
    """Merge every non-overlapping (a, b) occurrence left-to-right."""
    out = []
    i, n = 0, len(sym)
    while i < n:
        if i < n - 1 and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return tuple(out)


def _pair_counts(items) -> Counter:
    """Adjacent-pair counts over (symbol-tuple, weight) items."""
    c: Counter = Counter()
    for sym, n in items:
        for i in range(len(sym) - 1):
            c[(sym[i], sym[i + 1])] += n
    return c


def _best_pair(pairs: Counter) -> tuple[tuple[str, str], int] | None:
    if not pairs:
        return None
    best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
    return best


def word_frequencies(ds, text_col: str = "text"):
    """(word, n) Dataset: per-block Counter partials -> one groupby sum.
    Whitespace tokenization (str.split), matching build_token_vocab."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        c: Counter = Counter()
        for t in batch[text_col].to_pylist():
            c.update(t.split())
        return pa.table({"word": pa.array(list(c), pa.string()),
                         "n": pa.array(list(c.values()), pa.int64())})

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("word").aggregate(Sum("n", alias_name="n")))


def _train_in_memory(words: dict[str, int], n_merges: int,
                     min_pair_freq: int) -> list[tuple[str, str]]:
    vocab = {_to_syms(w): n for w, n in words.items()}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        best = _best_pair(_pair_counts(vocab.items()))
        if best is None or best[1] < min_pair_freq:
            break
        (a, b), _ = best
        merges.append((a, b))
        vocab = {_merge_word(sym, a, b): n for sym, n in vocab.items()}
    return merges


def _train_distributed(words_ds, n_merges: int,
                       min_pair_freq: int) -> list[tuple[str, str]]:
    from ray.data.aggregate import Sum

    def to_sym_rows(batch: pa.Table) -> pa.Table:
        syms = [list(_to_syms(w)) for w in batch["word"].to_pylist()]
        return pa.table({
            "sym": pa.array(syms, pa.list_(pa.string())),
            "n": batch["n"],
        })

    syms_ds = words_ds.map_batches(
        to_sym_rows, batch_format="pyarrow").materialize()
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        def pair_partial(batch: pa.Table) -> pa.Table:
            c = _pair_counts(
                zip((tuple(s) for s in batch["sym"].to_pylist()),
                    batch["n"].to_pylist()))
            return pa.table({
                "a": pa.array([k[0] for k in c], pa.string()),
                "b": pa.array([k[1] for k in c], pa.string()),
                "n": pa.array(list(c.values()), pa.int64()),
            })

        top = (syms_ds.map_batches(pair_partial, batch_format="pyarrow")
               .groupby(["a", "b"]).aggregate(Sum("n", alias_name="n"))
               .sort(["n", "a", "b"], descending=[True, False, False])
               .take(1))
        if not top or top[0]["n"] < min_pair_freq:
            break
        a, b = top[0]["a"], top[0]["b"]
        merges.append((a, b))

        def rewrite(batch: pa.Table, a=a, b=b) -> pa.Table:
            syms = [list(_merge_word(tuple(s), a, b))
                    for s in batch["sym"].to_pylist()]
            return pa.table({
                "sym": pa.array(syms, pa.list_(pa.string())),
                "n": batch["n"],
            })

        syms_ds = syms_ds.map_batches(
            rewrite, batch_format="pyarrow").materialize()
    return merges


def train_bpe(ds, text_col: str = "text", n_merges: int = 200,
              min_pair_freq: int = 2, min_word_freq: int = 1,
              mode: str = "driver",
              max_words: int = 2_000_000) -> list[tuple[str, str]]:
    """Learn a BPE merge table from a text Dataset.

    Returns the ordered merge list [(a, b), ...]; training stops early
    when the best pair's frequency drops below ``min_pair_freq``.
    ``min_word_freq`` prunes the word table before training (standard
    trainer knob; also the remedy when the driver gate trips).
    """
    import pyarrow.compute as pc

    words_ds = word_frequencies(ds, text_col)
    if min_word_freq > 1:
        def prune(batch: pa.Table, f=min_word_freq) -> pa.Table:
            return batch.filter(pc.greater_equal(batch["n"], f))

        words_ds = words_ds.map_batches(prune, batch_format="pyarrow")
    if mode == "distributed":
        return _train_distributed(words_ds, n_merges, min_pair_freq)
    if mode != "driver":
        raise ValueError(f"unknown mode {mode!r}")
    # materialize ONCE: the gate count and the gated pull must not each
    # re-execute the word-frequency shuffle (the bench pack-stats
    # double-execution lesson)
    words_ds = words_ds.materialize()
    n = words_ds.count()
    if n > max_words:
        raise ValueError(
            f"word table has {n} rows > max_words={max_words}; raise "
            "min_word_freq (shrinks the table monotonically) or use "
            "mode='distributed'")
    words = {r["word"]: r["n"] for r in words_ds.take_all()}
    return _train_in_memory(words, n_merges, min_pair_freq)


def bpe_encode_word(word: str,
                    ranks: dict[tuple[str, str], int]) -> list[str]:
    """Segment one word with a learned merge table: repeatedly merge
    the present pair with the LOWEST rank (training order) — standard
    BPE inference, reproducing the training segmentation exactly."""
    sym = _to_syms(word)
    while len(sym) > 1:
        best_rank, best_pair = None, None
        for i in range(len(sym) - 1):
            r = ranks.get((sym[i], sym[i + 1]))
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, (sym[i], sym[i + 1])
        if best_pair is None:
            break
        sym = _merge_word(sym, *best_pair)
    return list(sym)


def build_bpe_vocab(ds, merges: list[tuple[str, str]],
                    text_col: str = "text") -> dict[str, int]:
    """Contiguous subword-id vocabulary for a learned merge table:
    sorted(corpus alphabet ∪ {END} ∪ merge products).  The alphabet is
    ONE set-union aggregate of distinct characters (state bounded by
    the charset, a few KB), so ids are globally consistent without a
    driver corpus pull.  Every symbol ``bpe_encode_word`` can emit over
    this corpus is covered: unmerged chars come from the alphabet,
    merged symbols from the merge products."""
    from ray.data.aggregate import AggregateFn

    def acc(state: frozenset, blk: pa.Table) -> frozenset:
        chars: set[str] = set()
        for t in blk[text_col].to_pylist():
            for w in t.split():
                chars.update(w)
        return state | chars

    agg = AggregateFn(init=lambda _: frozenset(),
                      merge=lambda a, b: a | b,
                      accumulate_block=acc, name="alpha")
    alphabet = ds.aggregate(agg)["alpha"]
    symbols = sorted(set(alphabet) | {END} | {a + b for a, b in merges})
    return {s: i for i, s in enumerate(symbols)}


def bpe_subword_counts(ds, merges: list[tuple[str, str]],
                       text_col: str = "text",
                       id_col: str = "doc_id"):
    """(id, n_subwords) per document under a learned merge table.

    One map-only pass; per-block memoization of word -> subword count
    (Zipf reuse — the keyword-matcher memoization discipline), merge
    table shipped once per task via closure capture.
    """
    ranks = {p: i for i, p in enumerate(merges)}

    def count_block(batch: pa.Table, ranks=ranks) -> pa.Table:
        cache: dict[str, int] = {}
        out = []
        for t in batch[text_col].to_pylist():
            total = 0
            for w in t.split():
                c = cache.get(w)
                if c is None:
                    c = cache[w] = len(bpe_encode_word(w, ranks))
                total += c
            out.append(total)
        return pa.table({id_col: batch[id_col],
                         "n_subwords": pa.array(out, pa.int64())})

    return ds.map_batches(count_block, batch_format="pyarrow")


# ---------------------------------------------- HF-format interop

def export_bpe_hf(vocab: dict[str, int], merges: list[tuple[str, str]],
                  out_dir: str) -> None:
    """Write the trained tokenizer in the de-facto GPT-2/HF file
    layout — ``vocab.json`` ({token: id}) + ``merges.txt`` (one
    ``a b`` pair per line under a ``#version`` header) — so packs
    produced here and any HF-tokenizers consumer agree on the byte
    format.  Atomic per file (tmp+rename)."""
    import json
    import os

    os.makedirs(out_dir, exist_ok=True)
    for a, b in merges:
        if " " in a or " " in b or "\n" in a + b:
            raise ValueError(
                f"merge pair {(a, b)!r} contains a separator char — "
                "not representable in merges.txt")
    vpath = os.path.join(out_dir, "vocab.json")
    with open(vpath + ".tmp", "w", encoding="utf-8") as f:
        json.dump(vocab, f, ensure_ascii=False, indent=0,
                  sort_keys=True)
    os.replace(vpath + ".tmp", vpath)
    mpath = os.path.join(out_dir, "merges.txt")
    with open(mpath + ".tmp", "w", encoding="utf-8") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    os.replace(mpath + ".tmp", mpath)


def load_bpe_hf(out_dir: str) -> tuple[dict[str, int],
                                       list[tuple[str, str]]]:
    """Read back an ``export_bpe_hf`` directory (or any GPT-2-style
    vocab.json + merges.txt pair) as (vocab, ordered merges)."""
    import json
    import os

    with open(os.path.join(out_dir, "vocab.json"),
              encoding="utf-8") as f:
        vocab = {str(k): int(v) for k, v in json.load(f).items()}
    merges: list[tuple[str, str]] = []
    with open(os.path.join(out_dir, "merges.txt"),
              encoding="utf-8") as f:
        for idx, line in enumerate(f):
            line = line.rstrip("\n")
            # only the FIRST line may be the '#version' header — a
            # code-corpus merge like ('#', 'include') is a real pair
            # and must not be comment-skipped
            if not line or (idx == 0 and line.startswith("#version")):
                continue
            a, sep, b = line.partition(" ")
            if not sep:
                raise ValueError(f"malformed merges line {line!r}")
            merges.append((a, b))
    return vocab, merges

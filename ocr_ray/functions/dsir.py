"""DSIR — Data Selection with Importance Resampling (Xie et al., 2023,
arXiv:2302.03169).

Selects raw-corpus documents whose hashed-n-gram distribution matches a
TARGET corpus: fit bag-of-hashed-ngrams models p (target) and q (raw),
score every raw doc with the importance log-weight
``sum_b c_b * (log p_b - log q_b)`` over its bucket counts c, then
resample without replacement via Gumbel top-k.  This is the standard
pretraining-data-selection recipe (used to pick Pile-like subsets of
CommonCrawl); it complements the corpus-prep family's quality filter
(rule-based) and temperature sampling (source-level) with
DISTRIBUTION-level selection.

Scale design
------------
* Feature space is ``n_buckets`` hashed unigrams+bigrams (paper: 10k),
  so each global model is ONE associative aggregate whose state is a
  fixed n_buckets-long int64 count vector as a bytes blob — O(80 KB)
  per partial regardless of corpus size, integer-exact and
  merge-order-independent (the kmeans/quantile accumulator
  discipline).  Raw and target counts ride ONE shared scan: each block
  accumulates both vectors, target membership decided per row by the
  ``target_pred`` mask.
* The per-doc scoring pass broadcasts the (n_buckets,) float64
  log-ratio vector inside the map_batches closure (~80 KB — a
  broadcast lookup, never a shuffle) and re-tokenizes each doc once.
  Two text scans total (model fit + scoring) — the iterative-algorithm
  trade, same as prepare_corpus's two-by-design.
* Gumbel keys are a pure function of (seed, doc_id) via md5 — the repo
  determinism rule — so the selection is independent of block layout
  and execution order; top-k is a distributed sort + limit.

Tokens/ngrams: lowercase word tokens (``corpus_prep._tokens``),
features = unigrams + adjacent bigrams, bucket = crc32 % n_buckets
(paper's hashing trick).  Smoothing: add-alpha on both models.

Reference analog: none — beyond-reference training-data operator
(SURVEY.md §2.7 extension family).
"""
from __future__ import annotations

import hashlib
import math
import zlib

import numpy as np
import pyarrow as pa

from .corpus_prep import _tokens


def _bucket_ids_from_toks(toks: list[str], n_buckets: int) -> np.ndarray:
    """Hashed unigram+bigram bucket ids from a token list (with repeats
    — counts are the feature)."""
    feats = toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]
    if not feats:
        return np.empty(0, np.int64)
    return np.asarray([zlib.crc32(f.encode()) % n_buckets for f in feats],
                      dtype=np.int64)


def _bucket_ids(text: str, n_buckets: int) -> np.ndarray:
    return _bucket_ids_from_toks(_tokens(text), n_buckets)


def _default_target_pred(batch: pa.Table) -> pa.Array:
    """Default target: documents from source 'src0' (callers pass their
    own mask for real targets)."""
    import pyarrow.compute as pc

    return pc.equal(batch["source"], pa.scalar("src0"))


def dsir_models(ds, target_pred, n_buckets: int = 10_000):
    """ONE scan -> (raw_counts, target_counts) int64 vectors of hashed
    ngram counts.  ``target_pred(batch) -> bool mask`` marks the target
    rows; raw counts cover EVERY row (the paper's q is the full raw
    distribution, which includes the target's)."""
    from ray.data.aggregate import AggregateFn

    def acc_block(state, blk):
        arr = (np.frombuffer(state, dtype=np.int64)
               .reshape(2, n_buckets).copy() if state
               else np.zeros((2, n_buckets), np.int64))
        mask = np.asarray(target_pred(blk))
        texts = blk["text"].to_pylist()
        for i, t in enumerate(texts):
            ids = _bucket_ids(t, n_buckets)
            if not len(ids):
                continue
            bc = np.bincount(ids, minlength=n_buckets)
            arr[0] += bc
            if mask[i]:
                arr[1] += bc
        return arr.tobytes()

    def merge(s1, s2):
        if not s1:
            return s2
        if not s2:
            return s1
        return (np.frombuffer(s1, dtype=np.int64)
                + np.frombuffer(s2, dtype=np.int64)).tobytes()

    agg = AggregateFn(init=lambda _: b"", merge=merge,
                      accumulate_block=acc_block, name="dsir_counts")
    arr = np.frombuffer(ds.aggregate(agg)["dsir_counts"],
                        dtype=np.int64).reshape(2, n_buckets)
    return arr[0], arr[1]


def _log_ratio(raw_counts: np.ndarray, target_counts: np.ndarray,
               alpha: float = 1.0) -> np.ndarray:
    """log p_target(b) - log q_raw(b), add-alpha smoothed."""
    p = (target_counts + alpha) / (target_counts.sum()
                                   + alpha * len(target_counts))
    q = (raw_counts + alpha) / (raw_counts.sum()
                                + alpha * len(raw_counts))
    return np.log(p) - np.log(q)


def _gumbel(seed: int, doc_id: int) -> float:
    """Deterministic Gumbel(0,1) draw from md5(seed:doc_id): u in (0,1)
    from the top 53 bits, g = -log(-log(u))."""
    h = hashlib.md5(f"{seed}:{doc_id}".encode()).digest()
    u = (int.from_bytes(h[:8], "big") >> 11) / float(1 << 53)
    u = min(max(u, 1e-12), 1.0 - 1e-12)
    return -math.log(-math.log(u))


def dsir_weights(sf_dir: str, target_pred=None, n_buckets: int = 10_000,
                 alpha: float = 1.0, seed: int = 17,
                 pred_columns: tuple = ("source",)):
    """Dataset[doc_id, logw, key]: per-doc importance log-weight and its
    Gumbel-perturbed resampling key (key = logw + Gumbel via
    md5(seed:doc_id) — deterministic, layout-independent).
    ``pred_columns`` names the extra columns ``target_pred`` reads (the
    scan stays pruned to doc_id + text + exactly those)."""
    from ._io import clean_read

    target_pred = target_pred or _default_target_pred
    ds = clean_read(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text", *pred_columns])
    raw_c, tgt_c = dsir_models(ds, target_pred, n_buckets)
    if tgt_c.sum() == 0:
        raise ValueError("DSIR target is empty — target_pred matched "
                         "no rows")
    lr = _log_ratio(raw_c, tgt_c, alpha)

    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("logw", pa.float64()),
                            ("key", pa.float64())])

    def score(batch: pa.Table, lr=lr) -> pa.Table:
        dids = batch["doc_id"].to_pylist()
        logw, keys = [], []
        for did, t in zip(dids, batch["text"].to_pylist()):
            ids = _bucket_ids(t, n_buckets)
            w = float(lr[ids].sum()) if len(ids) else 0.0
            logw.append(w)
            keys.append(w + _gumbel(seed, did))
        return pa.table({"doc_id": pa.array(dids, pa.int64()),
                         "logw": pa.array(logw, pa.float64()),
                         "key": pa.array(keys, pa.float64())},
                        schema=out_schema)

    return ds.map_batches(score, batch_format="pyarrow")


def dsir_select(sf_dir: str, k: int, target_pred=None,
                n_buckets: int = 10_000, alpha: float = 1.0,
                seed: int = 17, pred_columns: tuple = ("source",)):
    """The selected subset: Gumbel top-k over the importance weights —
    equivalent to sampling k docs WITHOUT replacement proportionally to
    exp(logw) (the Gumbel-max trick).  Distributed sort + limit; ties
    cannot occur (keys are distinct reals from md5 draws)."""
    w = dsir_weights(sf_dir, target_pred, n_buckets, alpha, seed,
                     pred_columns)
    return w.sort("key", descending=True).limit(k)


def source_token_divergence(sf_dir: str, n_buckets: int = 10_000,
                            alpha: float | None = None) -> "pa.Table":
    """Pairwise Jensen-Shannon divergence between every source's hashed
    unigram+bigram distribution — "which dumps write DIFFERENTLY"
    (the distributional complement to grouped-KMV overlap's "which
    dumps duplicate each other").

    ONE integer aggregate fits every per-source histogram at once
    (state = n_sources x n_buckets int64, merge-order-independent);
    JS divergence (base 2, add-alpha smoothed) is driver math on that
    tiny state.  ``alpha=None`` (default) smooths ADAPTIVELY — each
    source gets pseudo mass equal to 1% of its real token mass, so the
    statistic is comparable across corpus sizes (a fixed alpha of 0.5
    adds n_buckets/2 pseudo counts and drowns small corpora toward 0).  JS is symmetric, in [0, 1], 0 iff identical
    distributions — planted tests pin both ends.
    Returns pa.Table(source_a, source_b, js_divergence) for a < b."""
    from ray.data.aggregate import AggregateFn

    from ._io import clean_read

    # source vocabulary first (tiny distinct scan) so the aggregate
    # state has a fixed, order-independent layout
    srcs = sorted(r["source"] for r in
                  clean_read(f"{sf_dir}/documents.parquet",
                             columns=["source"])
                  .groupby("source").count().take_all())
    s_ix = {s: i for i, s in enumerate(srcs)}
    n_src = len(srcs)

    def acc_block(state, blk):
        arr = (np.frombuffer(state, dtype=np.int64)
               .reshape(n_src, n_buckets).copy() if state
               else np.zeros((n_src, n_buckets), np.int64))
        for s, t in zip(blk["source"].to_pylist(),
                        blk["text"].to_pylist()):
            ids = _bucket_ids(t or "", n_buckets)
            if len(ids):
                arr[s_ix[s]] += np.bincount(ids, minlength=n_buckets)
        return arr.tobytes()

    def merge(s1, s2):
        if not s1:
            return s2
        if not s2:
            return s1
        return (np.frombuffer(s1, dtype=np.int64)
                + np.frombuffer(s2, dtype=np.int64)).tobytes()

    agg = AggregateFn(init=lambda _: b"", merge=merge,
                      accumulate_block=acc_block, name="srcdiv")
    ds = clean_read(f"{sf_dir}/documents.parquet",
                    columns=["source", "text"])
    arr = np.frombuffer(ds.aggregate(agg)["srcdiv"],
                        dtype=np.int64).reshape(n_src, n_buckets)

    if alpha is None:
        row_mass = arr.sum(axis=1, keepdims=True).astype(np.float64)
        a = np.maximum(row_mass * 0.01 / n_buckets, 1e-12)
    else:
        a = np.full((n_src, 1), float(alpha))
    sm = arr + a
    probs = sm / sm.sum(axis=1, keepdims=True)

    def _kl(p, q):
        return float(np.sum(p * np.log2(p / q)))

    rows = []
    for i in range(n_src):
        for j in range(i + 1, n_src):
            m = 0.5 * (probs[i] + probs[j])
            js = 0.5 * _kl(probs[i], m) + 0.5 * _kl(probs[j], m)
            rows.append({"source_a": srcs[i], "source_b": srcs[j],
                         "js_divergence":
                             float(np.floor(js * 1e6 + 0.5) / 1e6)})
    return pa.Table.from_pylist(rows, schema=pa.schema([
        ("source_a", pa.string()), ("source_b", pa.string()),
        ("js_divergence", pa.float64())]))

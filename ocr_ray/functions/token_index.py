"""Persisted inverted token index: token -> (doc_id, tf) posting lists,
hash-partitioned by token so a lookup reads ONE bucket directory.

The search-engine primitive behind the engine's keyword family: the
matcher stages scan the corpus per query; an inverted index pays one
build shuffle and answers every later lookup from a single pruned
partition read — the corpus itself is never touched again (the IVF /
band-index locality discipline applied to text search).

Scale design: (token, doc_id, tf) partials are emitted per block with a
per-block distinct-token hash cache (tokens are Zipf-distributed; one
blake2b per DISTINCT token per block, never per occurrence); the ONE
shuffle is groupby(bucket) — B data-sized groups, never per-token tiny
groups; document frequency is computed INSIDE the bucket kernel (a
token's postings are co-located by construction), where stop tokens
above ``max_df_frac`` are dropped at write time — the classic posting-
list explosion guard, recorded in the manifest instead of written.
Tokenization is the repo-canonical whitespace split, so every piece is
mirrorable in SQL (string_split_regex + unnest).
"""

from __future__ import annotations

import hashlib
from collections import Counter

import numpy as np
import pyarrow as pa

from .corpus_prep import _tokens
from .textops import _SQL_WS


def _token_bucket(tokens: np.ndarray, n_buckets: int) -> np.ndarray:
    """Deterministic bucket per DISTINCT token (blake2b, cached)."""
    uniq, inv = np.unique(tokens, return_inverse=True)
    b = np.empty(len(uniq), np.int64)
    for i, t in enumerate(uniq):
        d = hashlib.blake2b(str(t).encode(), digest_size=8).digest()
        b[i] = int.from_bytes(d, "big") % n_buckets
    return b[inv]


def token_bucket(token: str, n_buckets: int) -> int:
    d = hashlib.blake2b(str(token).encode(), digest_size=8).digest()
    return int.from_bytes(d, "big") % n_buckets


def build_token_index(sf_dir: str, out_dir: str, n_buckets: int = 32,
                      max_df_frac: float = 0.5,
                      store_positions: bool = False):
    """Build the index under ``out_dir`` (bucket=<k>/postings.parquet).

    ``store_positions=True`` adds a ``pos list<int32>`` column (each
    token's 0-based positions in the doc's token sequence, ascending)
    — the payload ``phrase_search`` needs; ~2-3x the index size, so
    it is opt-in.

    Returns the manifest table: one row per bucket with
    (bucket, n_tokens, n_postings, n_stop_dropped)."""
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from ._io import clean_read

    ds = clean_read(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text"])
    n_docs = pq.ParquetFile(
        f"{sf_dir}/documents.parquet").metadata.num_rows
    df_cap = max(1, int(max_df_frac * n_docs))
    os.makedirs(out_dir, exist_ok=True)

    def postings_partial(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as _pc

        batch = batch.filter(_pc.is_valid(batch["text"]))  # NULL text
        toks_out, docs_out, tfs_out, pos_out = [], [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            doc_toks = _tokens(text)
            if store_positions:
                arr = np.asarray(doc_toks, dtype=object)
                pos = np.arange(len(arr), dtype=np.int32)
                order = np.argsort(arr, kind="stable")
                uniq, starts = np.unique(arr[order], return_index=True)
                bounds = np.append(starts, len(arr))
                ps = pos[order]
                toks_out.extend(uniq)
                docs_out.extend([doc_id] * len(uniq))
                tfs_out.extend(
                    int(bounds[i + 1] - bounds[i])
                    for i in range(len(uniq)))
                # stable sort keeps each token's positions ascending
                pos_out.extend(
                    ps[bounds[i]:bounds[i + 1]].tolist()
                    for i in range(len(uniq)))
            else:
                c = Counter(doc_toks)
                toks_out.extend(c.keys())
                docs_out.extend([doc_id] * len(c))
                tfs_out.extend(c.values())
        toks = np.asarray(toks_out, dtype=object)
        bucket = _token_bucket(toks, n_buckets) if len(toks) else \
            np.empty(0, np.int64)
        cols = {
            "token": pa.array(toks_out, pa.string()),
            "doc_id": pa.array(docs_out, pa.int64()),
            "tf": pa.array(tfs_out, pa.int64()),
            "bucket": pa.array(bucket, pa.int64())}
        if store_positions:
            cols["pos"] = pa.array(pos_out, pa.list_(pa.int32()))
        return pa.table(cols)

    def write_bucket(part: pa.Table) -> pa.Table:
        bucket = int(part["bucket"][0].as_py())
        # df per token INSIDE the bucket (all postings co-located)
        g = part.group_by(["token"]).aggregate([("doc_id", "count")])
        df = dict(zip(g["token"].to_pylist(),
                      g["doc_id_count"].to_pylist()))
        toks = part["token"].to_pylist()
        keep = np.array([df[t] <= df_cap for t in toks], bool)
        kept = part.filter(pa.array(keep)).drop_columns(["bucket"])
        # deterministic file layout: sorted postings
        idx = np.lexsort((kept["doc_id"].to_numpy(zero_copy_only=False),
                          np.asarray(kept["token"].to_pylist(),
                                     dtype=object)))
        kept = kept.take(idx)
        d = os.path.join(out_dir, f"bucket={bucket}")
        os.makedirs(d, exist_ok=True)
        pq.write_table(kept, os.path.join(d, "postings.parquet"))
        n_stop = sum(1 for t, n in df.items() if n > df_cap)
        return pa.table({
            "bucket": pa.array([bucket], pa.int64()),
            "n_tokens": pa.array([len(df) - n_stop], pa.int64()),
            "n_postings": pa.array([kept.num_rows], pa.int64()),
            "n_stop_dropped": pa.array([n_stop], pa.int64())})

    manifest = (ds.map_batches(postings_partial, batch_format="pyarrow",
                               batch_size=256)
                .groupby("bucket")
                .map_groups(write_bucket, batch_format="pyarrow")
                .to_arrow_refs())
    import ray

    cols = ["bucket", "n_tokens", "n_postings", "n_stop_dropped"]
    # normalize: groupby emits occasional empty/column-reordered
    # blocks that break a naive concat (repo-wide empty-block rule)
    tbls = [t.select(cols) for t in
            (ray.get(r) for r in manifest)
            if t.num_rows > 0 and set(cols) <= set(t.column_names)]
    tbl = pa.concat_tables(tbls)
    pq.write_table(tbl, os.path.join(out_dir, "_manifest.parquet"))
    return tbl


def lookup_token(index_dir: str, token: str, n_buckets: int = 32):
    """Posting list for one token — reads exactly ONE bucket directory
    (file-list pruning tested).  Returns Dataset(doc_id, tf)."""
    import pyarrow.compute as pc
    import ray.data as rd

    b = token_bucket(token, n_buckets)
    ds = rd.read_parquet(f"{index_dir}/bucket={b}/")
    return ds.map_batches(
        lambda t, tok=token: t.filter(pc.equal(t["token"], tok))
        .select(["doc_id", "tf"]),
        batch_format="pyarrow")


def search_all_tokens(index_dir: str, tokens: list, n_buckets: int = 32):
    """AND query: doc_ids containing EVERY query token, with summed tf
    — reads only the query tokens' buckets (<= len(tokens) dirs)."""
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Count, Sum

    want = sorted(set(tokens))
    # explicit file paths: Ray accepts a single directory but not a
    # LIST of directories
    files = sorted({f"{index_dir}/bucket={token_bucket(t, n_buckets)}"
                    f"/postings.parquet" for t in want})
    ds = rd.read_parquet(files)
    tok_set = pa.array(want, pa.string())

    def pick(t: pa.Table) -> pa.Table:
        m = pc.is_in(t["token"], value_set=tok_set)
        return t.filter(m).select(["doc_id", "tf"])

    hits = ds.map_batches(pick, batch_format="pyarrow")
    agg = hits.groupby("doc_id").aggregate(
        Count(alias_name="n_matched"), Sum("tf", alias_name="total_tf"))
    return agg.filter(expr=f"n_matched == {len(want)}") \
        .select_columns(["doc_id", "total_tf"])


def lookup_token_sql(token: str) -> str:
    """DuckDB mirror of lookup_token over the raw documents table."""
    esc = token.replace("'", "''")
    return f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(
           trim(text, {_SQL_WS}), '[ \t\n\r\f\v]+')) AS token
  FROM documents WHERE length(trim(text, {_SQL_WS})) > 0
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS tf
FROM toks WHERE token = '{esc}' GROUP BY doc_id
"""


def search_ranked(index_dir: str, tokens: list, k: int = 10,
                  n_docs: int | None = None, n_buckets: int = 32):
    """Ranked OR query over the index: per-doc TF-IDF score
    sum_t tf(t, d) * ln(n_docs / df(t)) over the query tokens, top-k
    by (score desc, doc_id asc).

    Reads only the query tokens' buckets; df comes from the postings
    themselves (a token's postings are co-located, so ONE small
    groupby(token) inside the read computes every df); n_docs defaults
    to the manifest's posting-bearing doc count upper bound — pass the
    corpus size for textbook IDF.  Scores are quantized to micro-units
    so the ranking is a pure function of (tf, df, n_docs) — no float
    merge-order dependence (the repo determinism discipline)."""
    import pyarrow.compute as pc
    import ray.data as rd
    from ray.data.aggregate import Sum

    import math

    want = sorted(set(tokens))
    files = sorted({f"{index_dir}/bucket={token_bucket(t, n_buckets)}"
                    f"/postings.parquet" for t in want})
    ds = rd.read_parquet(files)
    tok_set = pa.array(want, pa.string())

    def pick(t: pa.Table) -> pa.Table:
        m = pc.is_in(t["token"], value_set=tok_set)
        return t.filter(m)

    hits = ds.map_batches(pick, batch_format="pyarrow").materialize()
    # df per query token: the postings ARE the df
    g = (hits.groupby("token").count().take_all())
    df = {r["token"]: int(r["count()"]) for r in g}
    if n_docs is None:
        n_docs = max(df.values(), default=1)
    idf_micro = {t: int(round(math.log(n_docs / d) * 1_000_000))
                 for t, d in df.items() if d > 0}

    def score(t: pa.Table, idf=idf_micro) -> pa.Table:
        toks = t["token"].to_pylist()
        w = np.array([idf.get(x, 0) for x in toks], np.int64)
        s = t["tf"].to_numpy(zero_copy_only=False) * w
        return pa.table({"doc_id": t["doc_id"],
                         "score_micro": pa.array(s, pa.int64())})

    ranked = (hits.map_batches(score, batch_format="pyarrow")
              .groupby("doc_id")
              .aggregate(Sum("score_micro", alias_name="score_micro")))
    return ranked.sort(["score_micro", "doc_id"],
                       descending=[True, False]).limit(k)


def phrase_search(index_dir: str, phrase, n_buckets: int = 32,
                  n_parts: int = 16):
    """Exact phrase query over a ``store_positions=True`` index:
    documents containing the query tokens CONSECUTIVELY, with the
    occurrence count.  Returns Dataset(doc_id, n_occurrences).

    Reads only the phrase tokens' buckets (<= len(phrase) dirs, the
    lookup_token pruning).  Matching is position-list intersection: a
    posting (token t at positions P, doc d) contributes candidate
    anchors {p - j : p in P} for every slot j where t appears in the
    phrase; an anchor that gathers ALL len(phrase) slots for a doc is
    one occurrence ("a a" in "a a a" = 2 — overlaps count, the
    standard positional-index semantics).  Candidates shuffle ONCE by
    hash(doc_id) %% ``n_parts`` and each partition resolves every doc
    in one lexsort + segmented-boundary pass — no per-doc tiny groups
    (the sessionize/asof kernel discipline).

    A phrase token missing from the index (never seen, or dropped by
    the build's ``max_df_frac`` stop gate) matches nothing — pass
    max_df_frac=1.0 at build time if phrases over stop words matter.
    """
    import pyarrow.compute as pc
    import pyarrow.parquet as pq
    import ray.data as rd

    toks = _tokens(phrase) if isinstance(phrase, str) else list(phrase)
    if not toks:
        raise ValueError("phrase_search: empty phrase")
    m = len(toks)
    slots: dict[str, list[int]] = {}
    for j, t in enumerate(toks):
        slots.setdefault(t, []).append(j)
    want = sorted(slots)

    import os

    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("n_occurrences", pa.int64())])
    files = sorted({f"{index_dir}/bucket={token_bucket(t, n_buckets)}"
                    f"/postings.parquet" for t in want})
    # a bucket no token ever hashed into is never written; a phrase
    # token living there is simply absent, and since EVERY slot must
    # match, dropping the file cannot create a false positive
    files = [f for f in files if os.path.exists(f)]
    if not files:
        return rd.from_arrow(out_schema.empty_table())
    if "pos" not in pq.read_schema(files[0]).names:
        raise ValueError(
            "phrase_search: index has no positions — rebuild with "
            "build_token_index(..., store_positions=True)")
    ds = rd.read_parquet(files)
    tok_set = pa.array(want, pa.string())

    def candidates(t: pa.Table) -> pa.Table:
        t = t.filter(pc.is_in(t["token"], value_set=tok_set))
        if t.num_rows == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "anchor": pa.array([], pa.int64()),
                             "slot": pa.array([], pa.int64()),
                             "part": pa.array([], pa.int64())})
        la = t["pos"].combine_chunks()
        offs = la.offsets.to_numpy(zero_copy_only=False)
        vals = la.values.to_numpy(zero_copy_only=False).astype(np.int64)
        counts = np.diff(offs)
        docs = np.repeat(
            t["doc_id"].to_numpy(zero_copy_only=False), counts)
        row_tok = np.asarray(t["token"].to_pylist(), dtype=object)
        tok_rep = np.repeat(row_tok, counts)
        d_out, a_out, s_out = [], [], []
        for tok, js in slots.items():
            sel = tok_rep == tok
            if not sel.any():
                continue
            dd, pp = docs[sel], vals[sel]
            for j in js:
                d_out.append(dd)
                a_out.append(pp - j)
                s_out.append(np.full(len(dd), j, np.int64))
        if not d_out:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "anchor": pa.array([], pa.int64()),
                             "slot": pa.array([], pa.int64()),
                             "part": pa.array([], pa.int64())})
        d = np.concatenate(d_out)
        a = np.concatenate(a_out)
        s = np.concatenate(s_out)
        keep = a >= 0                    # anchor before doc start
        d, a, s = d[keep], a[keep], s[keep]
        h = d.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        part = ((h >> np.uint64(33)) % np.uint64(n_parts)).astype(
            np.int64)
        return pa.table({"doc_id": pa.array(d, pa.int64()),
                         "anchor": pa.array(a, pa.int64()),
                         "slot": pa.array(s, pa.int64()),
                         "part": pa.array(part, pa.int64())})

    def resolve(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return out_schema.empty_table()
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        a = t["anchor"].to_numpy(zero_copy_only=False)
        s = t["slot"].to_numpy(zero_copy_only=False)
        order = np.lexsort((s, a, d))
        d, a, s = d[order], a[order], s[order]
        n = len(d)
        # dedup identical (doc, anchor, slot) triples (tf>1 per slot
        # can emit the same anchor once per position, but a slot only
        # counts once toward the m requirement)
        first = np.empty(n, bool)
        first[0] = True
        first[1:] = ((d[1:] != d[:-1]) | (a[1:] != a[:-1])
                     | (s[1:] != s[:-1]))
        d, a = d[first], a[first]
        # slots per (doc, anchor) segment; == m -> one occurrence
        nb = len(d)
        seg = np.empty(nb, bool)
        seg[0] = True
        seg[1:] = (d[1:] != d[:-1]) | (a[1:] != a[:-1])
        seg_ids = np.cumsum(seg) - 1
        slot_counts = np.bincount(seg_ids)
        hit = slot_counts == m
        seg_docs = d[np.flatnonzero(seg)]
        hit_docs = seg_docs[hit]
        if len(hit_docs) == 0:
            return out_schema.empty_table()
        uniq, occ = np.unique(hit_docs, return_counts=True)
        return pa.table({"doc_id": pa.array(uniq, pa.int64()),
                         "n_occurrences": pa.array(occ, pa.int64())})

    return (ds.map_batches(candidates, batch_format="pyarrow")
            .groupby("part")
            .map_groups(resolve, batch_format="pyarrow"))

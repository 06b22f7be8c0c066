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
                      max_df_frac: float = 0.5):
    """Build the index under ``out_dir`` (bucket=<k>/postings.parquet).

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
        toks_out, docs_out, tfs_out = [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            c = Counter(_tokens(text))
            toks_out.extend(c.keys())
            docs_out.extend([doc_id] * len(c))
            tfs_out.extend(c.values())
        toks = np.asarray(toks_out, dtype=object)
        bucket = _token_bucket(toks, n_buckets) if len(toks) else \
            np.empty(0, np.int64)
        return pa.table({
            "token": pa.array(toks_out, pa.string()),
            "doc_id": pa.array(docs_out, pa.int64()),
            "tf": pa.array(tfs_out, pa.int64()),
            "bucket": pa.array(bucket, pa.int64())})

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

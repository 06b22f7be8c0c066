"""Tag co-occurrence over shared keys — the exact cross-source
duplicate matrix.

``source_overlap_jaccard`` (sketches.py) ESTIMATES pairwise corpus
overlap from KMV samples; this module computes the exact counterpart:
for every unordered pair of tag values (sources, shards, crawls), the
number of distinct keys (content hashes, fingerprints, URLs) they
share.  The training-data use is provenance analysis — "which crawl
re-serves which other crawl's pages" — but the operator is generic:
users sharing IPs, docs sharing n-gram fingerprints, etc.

Scale design — one data shuffle:

1. per block, (key, tag) pairs dedup locally (Arrow group_by partial);
2. rows shuffle ONCE by hash(key) %% P (data-sized P, never a per-key
   groupby) so every holder of a key co-locates;
3. within a partition: one Arrow distinct, one lexsort (key, tag),
   then the segmented pair expansion (np.repeat + exclusive-cumsum
   offsets — the interval join's kernel) emits each unordered tag
   pair exactly once per shared key (tag_a < tag_b falls out of the
   sort order), immediately collapsed to per-partition (tag_a, tag_b)
   partial counts;
4. the final groupby sums partials over at most |tags|^2 rows.

Skew guard (custom-operator rule): a key shared by T tags emits
T(T-1)/2 pairs; ``max_tags_per_key`` refuses a pathological key with
the remedy named (raise the cap, or pre-filter boilerplate keys) —
the cap is a parameter because it crosses Ray's process boundary.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ._part import nparts_for

_MIX = np.uint64(0x9E3779B97F4A7C15)

_OUT = pa.schema([("tag_a", pa.string()), ("tag_b", pa.string()),
                  ("n_shared", pa.int64())])


def tag_cooccurrence(ds, key_col: str, tag_col: str,
                     max_tags_per_key: int = 1000,
                     n_parts: int | None = None):
    """Distinct-key co-occurrence counts for every unordered pair of
    ``tag_col`` values: (tag_a, tag_b, n_shared) with tag_a < tag_b.
    ``key_col`` and ``tag_col`` must be strings; NULL keys/tags are
    dropped (SQL mirror: a plain self-join skips NULLs)."""
    import ray.data  # noqa: F401
    from ray.data.aggregate import Sum

    def prep(batch: pa.Table, P: int) -> pa.Table:
        t = pa.table({"k": batch[key_col], "g": batch[tag_col]})
        t = t.filter(pc.and_(pc.is_valid(t["k"]), pc.is_valid(t["g"])))
        t = t.group_by(["k", "g"]).aggregate([])  # local dedup
        if t.num_rows == 0:
            return pa.schema([("k", pa.string()), ("g", pa.string()),
                              ("part", pa.int64())]).empty_table()
        # partition hash: C-speed SipHash over the full key string
        # (pd.util.hash_array).  Partition ASSIGNMENT only places rows
        # — results are layout-independent — so it just needs to agree
        # across blocks within a run, which a pure value hash does.
        import pandas as pd
        hs = pd.util.hash_array(
            t["k"].to_numpy(zero_copy_only=False)).astype(np.uint64)
        part = (((hs * _MIX) >> np.uint64(33)) % np.uint64(P)).astype(
            np.int64)
        return pa.table({"k": t["k"], "g": t["g"],
                         "part": pa.array(part, pa.int64())})

    def per_part(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _OUT.empty_table()
        t = t.group_by(["k", "g"]).aggregate([])  # global dedup
        key = t["k"].to_numpy(zero_copy_only=False)
        tag = t["g"].to_numpy(zero_copy_only=False)
        order = np.lexsort((tag, key))
        key, tag = key[order], tag[order]
        m = len(key)
        new = np.empty(m, bool)
        new[0] = True
        new[1:] = key[1:] != key[:-1]
        starts = np.flatnonzero(new)
        rank = np.cumsum(new) - 1
        seg_start = starts[rank]
        p = np.arange(m, dtype=np.int64) - seg_start  # in-segment pos
        worst = int(p.max()) + 1
        if worst > max_tags_per_key:
            raise ValueError(
                f"a key is shared by {worst} tags "
                f"(> max_tags_per_key={max_tags_per_key}); raise the "
                f"cap or pre-filter boilerplate keys")
        total = int(p.sum())
        if total == 0:
            return _OUT.empty_table()
        right = np.repeat(np.arange(m, dtype=np.int64), p)
        base = np.repeat(seg_start, p)
        excl = np.cumsum(p) - p
        off = np.arange(total, dtype=np.int64) - np.repeat(excl, p)
        left = base + off
        pairs = pa.table({"tag_a": pa.array(tag[left]),
                          "tag_b": pa.array(tag[right])})
        g = pairs.group_by(["tag_a", "tag_b"]).aggregate(
            [([], "count_all")])
        return pa.table({"tag_a": g["tag_a"], "tag_b": g["tag_b"],
                         "n_shared": pc.cast(g["count_all"],
                                             pa.int64())})

    P = n_parts or nparts_for(ds.count(), rows_per_part=500_000,
                              floor=4)
    partials = (ds.map_batches(lambda b: prep(b, P),
                               batch_format="pyarrow")
                .groupby("part")
                .map_groups(per_part, batch_format="pyarrow"))
    agg = (partials.groupby(["tag_a", "tag_b"])
           .aggregate(Sum("n_shared", alias_name="n_shared")))

    def fin(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return _OUT.empty_table()
        return pa.table({
            "tag_a": batch["tag_a"], "tag_b": batch["tag_b"],
            "n_shared": pc.cast(batch["n_shared"], pa.int64()),
        })

    return agg.map_batches(fin, batch_format="pyarrow")


def cross_source_dup_matrix(sf_dir: str):
    """Exact cross-source duplicate matrix over the documents table:
    for every source pair, how many distinct TEXTS (by md5) both
    serve.  The exact counterpart of source_overlap_jaccard's KMV
    estimate.  NOTE: the synthetic sf corpora contain no cross-source
    exact dups, so the meaningful oracles are the planted-dup corpora
    in tests/test_cooccur.py (DuckDB self-join parity) — same
    discipline as ngram_jaccard_pairs.  Oracle: CROSS_SOURCE_DUP_SQL.
    """
    from .relational import _read
    from .textops import _md5_col

    ds = _read(sf_dir, "documents", ["text", "source"])

    def add_hash(batch: pa.Table) -> pa.Table:
        # drop NULL texts BEFORE hashing (md5 of None would crash the
        # task; the oracle's WHERE text IS NOT NULL does the same) —
        # NULL sources are dropped downstream by tag_cooccurrence
        batch = batch.filter(pc.is_valid(batch["text"]))
        return pa.table({
            "text_md5": pa.array(_md5_col(batch["text"].to_pandas()),
                                 pa.string()),
            "source": batch["source"],
        })

    hashed = ds.map_batches(add_hash, batch_format="pyarrow",
                            batch_size=8192)
    return tag_cooccurrence(hashed, "text_md5", "source")


CROSS_SOURCE_DUP_SQL = """
WITH h AS (SELECT DISTINCT md5(text) AS th, source FROM documents
           WHERE text IS NOT NULL AND source IS NOT NULL)
SELECT a.source AS tag_a, b.source AS tag_b, count(*) AS n_shared
FROM h a JOIN h b ON a.th = b.th AND a.source < b.source
GROUP BY a.source, b.source
"""

"""Corpus snapshot diff: added / removed / changed / unchanged between
two document tables — the operational "what did this crawl actually
change" report behind incremental re-processing decisions (only
added+changed docs need re-extraction; reference analog: the poll
loop's implicit new-work detection, made explicit and auditable).

Scale design: each side reduces to (doc_id, md5(text)) in a pruned
map-only pass; the single shuffle is ONE hash-partitioned FULL OUTER
join on doc_id (the one join type the library had not exercised);
status resolution is a vectorized null/equality kernel per batch.  The
summary is a partial-aggregated status rollup.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _hashed(sf_dir: str, id_name: str, md5_name: str):
    from ._io import clean_read

    ds = clean_read(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text"])

    def h(batch: pa.Table) -> pa.Table:
        md5 = [hashlib.md5(t.encode()).hexdigest()
               for t in batch["text"].to_pylist()]
        return pa.table({id_name: batch["doc_id"],
                         md5_name: pa.array(md5, pa.string())})

    return ds.map_batches(h, batch_format="pyarrow", batch_size=8192)


def corpus_diff(dir_a: str, dir_b: str, num_partitions: int | None = None):
    """Per-document diff of snapshot ``dir_b`` (new) against ``dir_a``
    (old).  Returns Dataset(doc_id, status) with status in
    {'added', 'removed', 'changed', 'unchanged'}."""
    import pyarrow.parquet as pq

    from ._part import nparts_for

    a = _hashed(dir_a, "doc_id", "md5_a")
    b = _hashed(dir_b, "doc_id_b", "md5_b")
    if num_partitions is None:
        n = max(pq.ParquetFile(f"{d}/documents.parquet")
                .metadata.num_rows for d in (dir_a, dir_b))
        num_partitions = nparts_for(n)

    j = a.join(b, join_type="full_outer",
               num_partitions=num_partitions,
               on=("doc_id",), right_on=("doc_id_b",))

    def resolve(batch: pa.Table) -> pa.Table:
        # Ray's full_outer COALESCES the join key into the left name:
        # doc_id is non-null on every row; side-presence is read off
        # the md5 payload nulls instead
        ma = np.asarray(batch["md5_a"].to_pylist(), dtype=object)
        mb = np.asarray(batch["md5_b"].to_pylist(), dtype=object)
        a_null = pc.is_null(batch["md5_a"]).to_numpy(
            zero_copy_only=False)
        b_null = pc.is_null(batch["md5_b"]).to_numpy(
            zero_copy_only=False)
        status = np.where(
            a_null, "added",
            np.where(b_null, "removed",
                     np.where(ma == mb, "unchanged", "changed")))
        return pa.table({
            "doc_id": batch["doc_id"],
            "status": pa.array(status.astype(str), pa.string())})

    return j.map_batches(resolve, batch_format="pyarrow")


def corpus_diff_summary(dir_a: str, dir_b: str) -> pa.Table:
    """Status counts, sorted by status (partial-aggregated rollup)."""
    from ray.data.aggregate import Sum

    diff = corpus_diff(dir_a, dir_b)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["status"]).aggregate([([], "count_all")])
        return pa.table({"status": g["status"],
                         "n": g["count_all"].cast(pa.int64())})

    return (diff.map_batches(partial, batch_format="pyarrow")
            .groupby("status").aggregate(Sum("n", alias_name="n_docs"))
            .sort("status"))


CORPUS_DIFF_SQL = """
SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
       CASE WHEN a.doc_id IS NULL THEN 'added'
            WHEN b.doc_id IS NULL THEN 'removed'
            WHEN md5(a.text) = md5(b.text) THEN 'unchanged'
            ELSE 'changed' END AS status
FROM docs_a a FULL OUTER JOIN docs_b b ON a.doc_id = b.doc_id
"""

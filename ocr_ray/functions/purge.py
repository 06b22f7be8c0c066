"""Right-to-be-forgotten purge: remove every row of a set of users
from a table and PROVE it — the compliance operation every stored
corpus eventually needs (reference analog: the worker's per-document
delete path, generalized to a user-keyed sweep).

Scale design: small purge lists broadcast as an Arrow value_set into
one map-only filter (zero shuffle); lists above ``broadcast_limit``
switch to the hash-partitioned LEFT ANTI join (the dedup_survivors
leg) so the list never serializes into every task.  The audit proof
re-reads the WRITTEN output and counts remaining matches — the report
asserts on what landed on disk, not on what the pipeline intended.
NULL user_id rows are never purged (no subject to forget).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def purge_users(sf_dir: str, out_dir: str, user_ids,
                table: str = "events", key_col: str = "user_id",
                broadcast_limit: int = 100_000) -> dict:
    """Write ``out_dir`` = ``table`` minus all rows whose ``key_col``
    is in ``user_ids``; return the audit report
    {rows_before, rows_removed, rows_after, remaining_matches,
    strategy} with remaining_matches verified against the WRITTEN
    files (must be 0)."""
    import shutil

    import ray.data as rd

    from ._io import clean_read
    from ._part import nparts_for

    ids = sorted({int(u) for u in user_ids})
    ds = clean_read(f"{sf_dir}/{table}.parquet")
    rows_before = ds.count()
    shutil.rmtree(out_dir, ignore_errors=True)

    if len(ids) <= broadcast_limit:
        strategy = "broadcast"
        vs = pa.array(ids, pa.int64())

        def drop(batch: pa.Table, vs=vs) -> pa.Table:
            hit = pc.is_in(batch[key_col], value_set=vs)
            # NULL keys: is_in(NULL) is null -> fill false (kept)
            keep = pc.invert(pc.fill_null(hit, False))
            return batch.filter(keep)

        kept = ds.map_batches(drop, batch_format="pyarrow")
    else:
        strategy = "anti_join"
        ids_ds = rd.from_arrow(pa.table({key_col: pa.array(
            ids, pa.int64())}))
        kept = ds.join(ids_ds, join_type="left_anti",
                       num_partitions=nparts_for(rows_before),
                       on=(key_col,))

    kept.write_parquet(out_dir)

    # audit on the WRITTEN output
    written = rd.read_parquet(out_dir)
    rows_after = written.count()
    vs = pa.array(ids, pa.int64())

    def count_matches(batch: pa.Table, vs=vs) -> pa.Table:
        hit = pc.fill_null(pc.is_in(batch[key_col], value_set=vs),
                           False)
        return pa.table({"n": pa.array(
            [int(pc.sum(pc.cast(hit, pa.int64())).as_py() or 0)],
            pa.int64())})

    from ray.data.aggregate import Sum

    remaining = int(written.map_batches(
        count_matches, batch_format="pyarrow")
        .aggregate(Sum("n"))["sum(n)"] or 0)
    return {"table": table, "strategy": strategy,
            "rows_before": int(rows_before),
            "rows_removed": int(rows_before - rows_after),
            "rows_after": int(rows_after),
            "remaining_matches": remaining,
            "purged_users": len(ids)}

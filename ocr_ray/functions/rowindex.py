"""Deterministic global row numbering (the zipWithIndex / ROW_NUMBER
OVER (ORDER BY key) engine primitive).

A stable, dense, 0-based global index under a total order is the
primitive behind reproducible corpus snapshots ("doc #184,223,991 of
the 2025-08 crawl"), stable train/val splits by index range, and
resumable offset-addressed readers.  Ray Data has no built-in for it;
a naive sort().to_pandas() materializes the corpus on the driver.

Scale design — three bounded passes, no driver materialization:

1. ONE fused aggregate carries (row count, bottom-k key sample).  The
   sample is hash-deterministic (sketches.sample_hash), so the split
   points derived from it — and therefore everything downstream — are
   a pure function of the key SET, independent of block layout.
2. ONE fixed-size integer aggregate counts rows per key-range bucket
   (int64[P] state, merge = elementwise add: exact and
   merge-order-independent).  The driver folds P integers into
   exclusive prefix offsets.
3. ONE range shuffle: rows tag their bucket by searchsorted against
   the broadcast splits, groupby(bucket).map_groups lexsorts each
   ~rows_per_part-sized partition once and emits
   offset[bucket] + arange — the sessionize/asof partition-kernel
   idiom, P data-sized groups, no per-key tiny groups.

Equal keys land in one bucket, so ranks are globally exact; rows must
be unique under (key_col, *tie_cols) for the index to be fully
deterministic (the same contract as SQL ROW_NUMBER without a total
order).  Keys and tie columns must be integer-typed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .sketches import bk_merge, bk_sketch
from ._part import nparts_for


def global_row_index(ds, key_col: str, tie_cols: tuple = (),
                     idx_col: str = "row_idx", k_sample: int = 4096,
                     rows_per_part: int = 500_000):
    """Append ``idx_col``: the 0-based rank of each row under
    ORDER BY (key_col, *tie_cols).  See module docstring for the
    three-pass design."""
    from ray.data.aggregate import AggregateFn

    sort_cols = (key_col, *tie_cols)

    # ---- pass 1: fused (count, deterministic bottom-k key sample)
    def acc1(state, blk: pa.Table):
        n, sk = state
        keys = blk[key_col].to_numpy(zero_copy_only=False)
        if not np.issubdtype(keys.dtype, np.integer):
            raise TypeError(f"{key_col} must be integer-typed")
        return (n + len(keys),
                bk_merge(sk, bk_sketch(keys, keys, k_sample), k_sample))

    agg1 = AggregateFn(
        init=lambda _: (0, (np.empty(0, np.uint64),
                            np.empty(0, np.float64))),
        merge=lambda a, b: (a[0] + b[0],
                            bk_merge(a[1], b[1], k_sample)),
        accumulate_block=acc1,
        # bytes-pack: only the sampled values reach the driver, and a
        # (int, bytes) pair converts to an Arrow block cleanly where
        # the nested array tuple cannot
        finalize=lambda s: (s[0], s[1][1].tobytes()),
        name="rix")
    n_rows, sample_b = ds.aggregate(agg1)["rix"]
    sample = np.frombuffer(sample_b, np.float64)
    if n_rows == 0:
        # map fns never run on an empty dataset; build the schema'd
        # empty result directly
        import ray.data as rd

        sch = ds.schema()
        base = (sch.base_schema if sch is not None
                and hasattr(sch, "base_schema")
                else pa.schema([pa.field(c, pa.int64())
                                for c in sort_cols]))
        return rd.from_arrow(
            base.append(pa.field(idx_col, pa.int64())).empty_table())

    n_parts = nparts_for(n_rows, rows_per_part=rows_per_part, floor=4)
    s = np.sort(sample.astype(np.int64))
    m = len(s)
    # P-1 interior split points from the sample's quantile positions;
    # duplicates collapse (skewed keys simply share a bucket — ranks
    # stay exact, only balance degrades; run key_skew_report first on
    # suspect keys)
    pos = (np.arange(1, n_parts) * m) // n_parts
    splits = np.unique(s[np.minimum(pos, m - 1)]) if m else \
        np.empty(0, np.int64)

    # ---- pass 2: exact per-bucket counts (fixed int64[P] state)
    nb = len(splits) + 1

    def acc2(state: np.ndarray, blk: pa.Table) -> np.ndarray:
        keys = blk[key_col].to_numpy(zero_copy_only=False)
        b = np.searchsorted(splits, keys, side="right")
        return state + np.bincount(b, minlength=nb).astype(np.int64)

    agg2 = AggregateFn(
        init=lambda _: np.zeros(nb, np.int64),
        merge=lambda a, b: a + b,
        accumulate_block=acc2, name="bc")
    counts = ds.aggregate(agg2)["bc"]
    offsets = np.zeros(nb, np.int64)
    np.cumsum(counts[:-1], out=offsets[1:])

    # ---- pass 3: range shuffle + in-partition rank
    def tag(batch: pa.Table) -> pa.Table:
        keys = batch[key_col].to_numpy(zero_copy_only=False)
        b = np.searchsorted(splits, keys, side="right")
        return batch.append_column(
            "__bucket", pa.array(b.astype(np.int64)))

    def assign(part: pa.Table) -> pa.Table:
        bucket = int(part["__bucket"][0].as_py())
        cols = [part[c].to_numpy(zero_copy_only=False)
                for c in reversed(sort_cols)]
        order = np.lexsort(cols)
        out = part.drop_columns(["__bucket"]).take(order)
        idx = offsets[bucket] + np.arange(out.num_rows, dtype=np.int64)
        return out.append_column(idx_col, pa.array(idx))

    return (ds.map_batches(tag, batch_format="pyarrow")
            .groupby("__bucket")
            .map_groups(assign, batch_format="pyarrow"))


def doc_row_index(sf_dir: str):
    """documents ordered by doc_id with the global index attached —
    the registry-shaped entry point (SQL: ROW_NUMBER() - 1)."""
    from ._io import clean_read

    ds = clean_read(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "n_chars"])
    return global_row_index(ds, "doc_id").select_columns(
        ["doc_id", "n_chars", "row_idx"])


DOC_ROW_INDEX_SQL = """
SELECT doc_id, n_chars,
       CAST(row_number() OVER (ORDER BY doc_id) - 1 AS BIGINT) AS row_idx
FROM documents
"""


def order_price_percent_rank(sf_dir: str):
    """PERCENT_RANK() OVER (ORDER BY o_totalprice, o_orderkey) — the
    rank-normalization window over the whole table, derived from the
    global row index (idx / (n-1); the unique tie column makes SQL's
    rank-based percent_rank coincide with the row index).  Cost = the
    row-index passes; the division is map-only."""
    import pyarrow.compute as pc

    from ._io import clean_read
    from ._num import round_half_up

    ds = clean_read(f"{sf_dir}/orders.parquet",
                    columns=["o_orderkey", "o_totalprice"])
    n = ds.count()

    def cents(batch: pa.Table) -> pa.Table:
        c = pc.cast(pc.floor(pc.add(pc.multiply(
            batch["o_totalprice"], pa.scalar(100.0)),
            pa.scalar(0.5))), pa.int64())
        return pa.table({"o_orderkey": batch["o_orderkey"],
                         "cents": c})

    idx = global_row_index(ds.map_batches(cents, batch_format="pyarrow"),
                           "cents", tie_cols=("o_orderkey",))

    def finalize(batch: pa.Table, n=n) -> pa.Table:
        pr = pc.divide(pc.cast(batch["row_idx"], pa.float64()),
                       pa.scalar(float(max(1, n - 1))))
        return pa.table({"o_orderkey": batch["o_orderkey"],
                         "pct_rank": round_half_up(pr, 6)})

    return idx.map_batches(finalize, batch_format="pyarrow")


ORDER_PRICE_PERCENT_RANK_SQL = """
SELECT o_orderkey,
       floor(percent_rank() OVER (
           ORDER BY CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT),
                    o_orderkey) * 1000000.0 + 0.5) / 1000000.0
       AS pct_rank
FROM orders
"""


def orders_ntile(sf_dir: str, n_tiles: int = 10):
    """NTILE(n) OVER (ORDER BY o_totalprice, o_orderkey): equi-depth
    bucket assignment (the feature-binning operator), derived from the
    global row index by the exact NTILE formula
    bucket = idx * n // total + 1 — the first (total % n) buckets get
    the extra row, matching SQL."""
    import pyarrow.compute as pc

    from ._io import clean_read

    ds = clean_read(f"{sf_dir}/orders.parquet",
                    columns=["o_orderkey", "o_totalprice"])
    n = ds.count()

    def cents(batch: pa.Table) -> pa.Table:
        c = pc.cast(pc.floor(pc.add(pc.multiply(
            batch["o_totalprice"], pa.scalar(100.0)),
            pa.scalar(0.5))), pa.int64())
        return pa.table({"o_orderkey": batch["o_orderkey"],
                         "cents": c})

    idx = global_row_index(ds.map_batches(cents, batch_format="pyarrow"),
                           "cents", tie_cols=("o_orderkey",))

    def finalize(batch: pa.Table, n=n, k=n_tiles) -> pa.Table:
        t = pc.add(pc.divide(pc.multiply(
            batch["row_idx"], pa.scalar(int(k), pa.int64())),
            pa.scalar(int(max(1, n)), pa.int64())), pa.scalar(1, pa.int64()))
        return pa.table({"o_orderkey": batch["o_orderkey"],
                         "tile": pc.cast(t, pa.int64())})

    return idx.map_batches(finalize, batch_format="pyarrow")


ORDERS_NTILE_SQL = """
SELECT o_orderkey,
       CAST(ntile(10) OVER (
           ORDER BY CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT),
                    o_orderkey) AS BIGINT) AS tile
FROM orders
"""

"""Z-order (Morton-curve) clustering for multi-column pruned reads.

A corpus store is always sorted by ONE key; range queries on any other
column then touch every file.  Interleaving the bits of two (or more)
quantile-bucketed keys into a single Morton value and sorting by it
gives every participating column partial locality, so parquet
row-group min/max statistics prune multi-dimensional box queries —
Delta/Iceberg's OPTIMIZE ZORDER BY, rebuilt on Ray Data.

Scale design: per-column bucket cutpoints come from the deterministic
bottom-k sample (one fused aggregate pass over all columns); bucketing
+ bit interleave are pure vectorized uint64 ops inside ONE map_batches;
the single ds.sort on the Morton value is the only shuffle — exactly
the cost of the single-key clustering it replaces.  Everything is a
pure function of the data, so the layout is reproducible.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .sketches import bk_merge, bk_sketch


def _spread2(x: np.ndarray) -> np.ndarray:
    """Spread each of the low 32 bits of x to even positions (uint64)."""
    x = x.astype(np.uint64)
    x = (x | (x << np.uint64(16))) & np.uint64(0x0000FFFF0000FFFF)
    x = (x | (x << np.uint64(8))) & np.uint64(0x00FF00FF00FF00FF)
    x = (x | (x << np.uint64(4))) & np.uint64(0x0F0F0F0F0F0F0F0F)
    x = (x | (x << np.uint64(2))) & np.uint64(0x3333333333333333)
    x = (x | (x << np.uint64(1))) & np.uint64(0x5555555555555555)
    return x


def morton2(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Interleave two <=32-bit lane values: a's bits land on the odd
    positions, b's on the even — standard 2-D Morton encoding."""
    return (_spread2(a) << np.uint64(1)) | _spread2(b)


def morton2_reference(a: int, b: int, bits: int = 32) -> int:
    """Per-bit reference for the magic-number kernel (test oracle)."""
    z = 0
    for i in range(bits):
        z |= ((b >> i) & 1) << (2 * i)
        z |= ((a >> i) & 1) << (2 * i + 1)
    return z


def _column_splits(ds, cols, bits: int, k_sample: int):
    """One fused aggregate: a deterministic bottom-k sample PER COLUMN,
    folded into 2^bits-1 interior cutpoints each."""
    from ray.data.aggregate import AggregateFn

    def acc(state: dict, blk: pa.Table) -> dict:
        state = dict(state)
        for c in cols:
            v = blk[c].to_numpy(zero_copy_only=False)
            if not np.issubdtype(v.dtype, np.integer):
                raise TypeError(f"{c} must be integer-typed")
            sk = bk_sketch(v, v, k_sample)
            prev = state.get(c)
            state[c] = bk_merge(prev, sk, k_sample) if prev else sk
        return state

    def merge(a: dict, b: dict) -> dict:
        out = dict(a)
        for c, sk in b.items():
            prev = out.get(c)
            out[c] = bk_merge(prev, sk, k_sample) if prev else sk
        return out

    agg = AggregateFn(
        init=lambda _: {}, merge=merge, accumulate_block=acc,
        # pack to bytes: only the sampled VALUES survive to the driver
        # (hashes were for selection), and a bytes dict converts to an
        # Arrow block cleanly where a dict of array tuples cannot
        finalize=lambda st: {c: np.sort(sk[1].astype(np.int64)).tobytes()
                             for c, sk in st.items()},
        name="zsk")
    state = ds.aggregate(agg)["zsk"]
    splits = {}
    n_buckets = 1 << bits
    for c in cols:
        s = np.frombuffer(state.get(c, b""), np.int64)
        m = len(s)
        pos = (np.arange(1, n_buckets) * m) // n_buckets
        splits[c] = np.unique(s[np.minimum(pos, m - 1)]) if m else \
            np.empty(0, np.int64)
    return splits


def zorder_sort(ds, cols: tuple, bits: int = 10, k_sample: int = 4096,
                keep_z: bool = False):
    """Return ``ds`` globally sorted by the Morton interleave of the
    quantile-bucketed ``cols`` (exactly two columns, integer-typed).
    ``bits`` buckets per column (<= 32)."""
    if len(cols) != 2:
        raise ValueError("zorder_sort composes exactly two columns")
    splits = _column_splits(ds, cols, bits, k_sample)
    s0, s1 = splits[cols[0]], splits[cols[1]]

    def add_z(batch: pa.Table) -> pa.Table:
        a = np.searchsorted(
            s0, batch[cols[0]].to_numpy(zero_copy_only=False),
            side="right").astype(np.uint64)
        b = np.searchsorted(
            s1, batch[cols[1]].to_numpy(zero_copy_only=False),
            side="right").astype(np.uint64)
        z = morton2(a, b).astype(np.int64)
        return batch.append_column("__z", pa.array(z))

    out = ds.map_batches(add_z, batch_format="pyarrow").sort("__z")
    return out if keep_z else out.drop_columns(["__z"])


def zorder_write(ds, out_dir: str, cols: tuple, bits: int = 10,
                 rows_per_file: int = 10_000, k_sample: int = 4096):
    """Cluster ``ds`` by Z-order and write size-bounded parquet files —
    the OPTIMIZE ZORDER BY operation; downstream range reads on EITHER
    column prune by file/row-group min-max statistics (tested).

    File granularity IS the pruning granularity, so the sorted stream
    is re-split to ~rows_per_file blocks before the write (Ray's
    order-preserving non-shuffle repartition; write_parquet's
    min_rows_per_file alone leaves sort-output-sized files — measured
    16 x 12.5k blocks where 100 x 2k were asked for)."""
    z = zorder_sort(ds, cols, bits, k_sample).materialize()
    n = z.count()
    z.repartition(max(1, n // max(1, rows_per_file))) \
        .write_parquet(out_dir)
    return out_dir


def pruned_fraction(parquet_dir: str, col_ranges: dict) -> float:
    """Fraction of row groups a box query must read under the written
    layout, judged by parquet min/max statistics alone — the
    layout-quality metric (no Ray, pure metadata walk)."""
    import glob

    import pyarrow.parquet as pq

    total = touched = 0
    for f in sorted(glob.glob(f"{parquet_dir}/*.parquet")):
        md = pq.ParquetFile(f).metadata
        for rg in range(md.num_row_groups):
            total += 1
            g = md.row_group(rg)
            names = [g.column(i).path_in_schema
                     for i in range(g.num_columns)]
            hit = True
            for c, (lo, hi) in col_ranges.items():
                st = g.column(names.index(c)).statistics
                if st is None:
                    continue
                if st.min > hi or st.max < lo:
                    hit = False
                    break
            touched += hit
    return touched / max(1, total)

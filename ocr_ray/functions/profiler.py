"""One-pass whole-table profiler.

Every curation run starts with "what is in this table?" — null rates,
ranges, cardinalities, means — and the naive answer is one scan PER
column PER statistic.  At 100 TB that is the single most expensive
`describe` a user can run.  ``profile_table`` fuses the whole answer
into ONE streaming aggregate (the quality_suite / key_skew_report
IO-fusion discipline): each block contributes a constant-size partial
per column — (null count, non-null count, exact min/max, a KMV
distinct sketch, an exact integer sum) — and partials merge
associatively, so the result is independent of block layout and
merge order.

Determinism discipline (see `_num.py`): counts and sums are exact
Python ints (floats are micro-quantized with the shared
floor(x*1e6+0.5) rule before summing, so float means are a pure
function of the multiset of values, not of accumulation order); min /
max are exact; the distinct sketch is hash-based (``sample_hash`` —
vectorized splitmix64 for integer-like columns, blake2b for strings)
and EXACT below ``k`` distinct values, a standard-error ~1/sqrt(k-1)
estimate above.

Nested columns (list/struct/map) get null/row counts only — min/max
and distinct are reported NULL rather than forcing a Python unnest.

Reference analog: the reference reports per-corpus describe stats in
its metrics JSON (metrics_logger.py) one field at a time; here the
whole profile is a single pass regardless of column count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ._num import to_int_scaled
from .sketches import _hash64, kmv_estimate, kmv_merge, sample_hash

_NESTED = (pa.lib.ListType, pa.lib.LargeListType, pa.lib.StructType,
           pa.lib.MapType, pa.lib.FixedSizeListType)

# per-column partial: (n_nulls, n_nonnull, min_py, max_py,
#                      kmv uint64[<=k], sum_int|None, kind)
_EMPTY = (0, 0, None, None, None, None, None)


def _kind_of(typ: pa.DataType) -> str:
    if isinstance(typ, _NESTED):
        return "nested"
    if pa.types.is_boolean(typ):
        return "bool"
    if pa.types.is_integer(typ):
        return "int"
    if pa.types.is_floating(typ):
        return "float"
    if pa.types.is_timestamp(typ) or pa.types.is_date(typ):
        return "ts"
    return "str"  # strings, binary, anything orderable-by-arrow


def _col_partial(arr: pa.ChunkedArray, kind: str, k: int):
    """Constant-size partial for one column of one block."""
    nulls = arr.null_count
    vals = arr.drop_null()
    n = len(vals)
    if kind == "nested" or n == 0:
        return (nulls, n, None, None, None, None, kind)
    mm = pc.min_max(vals)
    lo, hi = mm["min"].as_py(), mm["max"].as_py()
    # distinct sketch: hash the VALUE IDENTITY deterministically
    if kind in ("int", "bool", "ts"):
        try:
            ints = pc.cast(vals, pa.int64()).to_numpy(
                zero_copy_only=False)
            h = sample_hash(ints)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            # date32 has no int64 cast; uint64 can exceed int64 —
            # fall back to the generic value hash
            h = _hash64(vals.to_pylist())
    elif kind == "float":
        # hash the raw bit pattern (distinct-by-bits; -0.0 != 0.0 is
        # acceptable for an estimate and keeps the path vectorized)
        bits = vals.combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.float64).view(np.uint64)
        h = sample_hash(bits.astype(np.int64))
    else:
        h = _hash64(vals.to_pylist())
    kmv = np.unique(h)[:k]
    s = None   # (exact integer sum, rows summed) for the mean
    if kind in ("int", "bool"):
        try:
            s = (int(pc.sum(pc.cast(vals, pa.int64())).as_py()), n)
        except (pa.ArrowInvalid, pa.ArrowNotImplementedError):
            s = None   # uint64 overflow: report no mean, not a crash
    elif kind == "float":
        # mean over FINITE values only — NaN/inf would poison the
        # quantized integer sum (a profiler must survive dirty data)
        fin = vals.filter(pc.is_finite(vals))
        if len(fin):
            s = (int(pc.sum(to_int_scaled(fin, 1e6)).as_py()),
                 len(fin))
    return (nulls, n, lo, hi, kmv, s, kind)


def _merge_col(a, b, k: int):
    if a[6] is None and a[1] == 0 and a[0] == 0:
        return b
    if b[6] is None and b[1] == 0 and b[0] == 0:
        return a
    kind = a[6] or b[6]
    lo = min((x for x in (a[2], b[2]) if x is not None), default=None)
    hi = max((x for x in (a[3], b[3]) if x is not None), default=None)
    kmvs = [x for x in (a[4], b[4]) if x is not None]
    kmv = kmv_merge(kmvs, k) if kmvs else None
    sa, sb = a[5], b[5]
    if sa is not None and sb is not None:
        s = (sa[0] + sb[0], sa[1] + sb[1])
    else:
        s = sa if sa is not None else sb
    return (a[0] + b[0], a[1] + b[1], lo, hi, kmv, s, kind)


def profile_table(ds, columns: list[str] | None = None,
                  k: int = 1024) -> pa.Table:
    """Profile every (or the named) column of ``ds`` in ONE pass.

    Returns pa.Table(column, dtype, n_rows, n_nulls, n_distinct
    float64 — exact when the column has < k distinct values, NULL for
    nested columns — min, max rendered as strings, mean float64 —
    micro-quantized half-up, NULL for non-numeric columns; float
    means are over FINITE values only, so NaN/inf cells cannot poison
    the profile), one row per column, sorted by column name.
    """
    from ray.data.aggregate import AggregateFn

    schema = ds.schema()
    if hasattr(schema, "base_schema"):
        schema = schema.base_schema
    names = list(schema.names)
    if columns is not None:
        missing = sorted(set(columns) - set(names))
        if missing:
            raise ValueError(f"unknown columns: {missing}")
        names = [c for c in names if c in set(columns)]
        ds = ds.select_columns(names)
    kinds = {c: _kind_of(schema.field(c).type) for c in names}
    dtypes = {c: str(schema.field(c).type) for c in names}

    def acc_block(state: dict, blk: pa.Table) -> dict:
        state = dict(state)
        for c in names:
            part = _col_partial(blk[c], kinds[c], k)
            state[c] = _merge_col(state.get(c, _EMPTY), part, k)
        return state

    def merge(s1: dict, s2: dict) -> dict:
        out = dict(s1)
        for c, p in s2.items():
            out[c] = _merge_col(out.get(c, _EMPTY), p, k)
        return out

    agg = AggregateFn(init=lambda _: {}, merge=merge,
                      accumulate_block=acc_block, name="prof")
    state: dict = ds.aggregate(agg)["prof"] or {}

    rows = []
    for c in sorted(names):
        nulls, n, lo, hi, kmv, s, _ = state.get(c, _EMPTY)
        distinct = None
        if kinds[c] != "nested" and kmv is not None:
            distinct = round(kmv_estimate(kmv, k), 1)
        elif kinds[c] != "nested":
            distinct = 0.0
        mean = None
        if s is not None and s[1] > 0:
            total, cnt = s
            raw = (total / cnt) if kinds[c] in ("int", "bool") \
                else (total / cnt / 1e6)
            mean = float(np.floor(raw * 1e6 + 0.5) / 1e6)
        rows.append((c, dtypes[c], nulls + n, nulls, distinct,
                     None if lo is None else str(lo),
                     None if hi is None else str(hi), mean))
    return pa.table({
        "column": pa.array([r[0] for r in rows], pa.string()),
        "dtype": pa.array([r[1] for r in rows], pa.string()),
        "n_rows": pa.array([r[2] for r in rows], pa.int64()),
        "n_nulls": pa.array([r[3] for r in rows], pa.int64()),
        "n_distinct": pa.array([r[4] for r in rows], pa.float64()),
        "min": pa.array([r[5] for r in rows], pa.string()),
        "max": pa.array([r[6] for r in rows], pa.string()),
        "mean": pa.array([r[7] for r in rows], pa.float64()),
    })

"""Equi-width histograms and PSI drift detection.

``column_histogram`` — exact per-bin counts in ONE streaming
aggregate: each block contributes an int64[bins+2] vector (bins plus
below/above overflow slots; nulls counted separately), merged by
vector addition — associative, layout-independent, constant state.
Bin index arithmetic is the single IEEE expression
floor((x - lo) / w) on both engines, so counts are DuckDB-exact.

``psi_drift`` — the population-stability-index monitoring metric for
"did this month's corpus shift?": shared bin edges from the combined
range, one histogram per side, PSI = sum((p_a - p_b) ln(p_a / p_b))
over proportions floored at ``eps`` (the standard smoothing for empty
bins; deterministic).  Convention: < 0.1 stable, 0.1-0.25 moderate
shift, > 0.25 major shift.  Cost: two histogram scans + (when bounds
are not passed) two min/max scans — all constant-state aggregates.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def _min_max(ds, column: str) -> tuple[float, float]:
    """min/max over FINITE values (Ray's Min/Max would propagate NaN
    into the bounds and poison every bin edge)."""
    from ray.data.aggregate import AggregateFn

    def acc(state, blk: pa.Table):
        x = blk[column].drop_null()
        x = x.filter(pc.is_finite(x)) if pa.types.is_floating(
            x.type) else x
        if len(x) == 0:
            return state
        mm = pc.min_max(x)
        lo, hi = float(mm["min"].as_py()), float(mm["max"].as_py())
        if state is None:
            return (lo, hi)
        return (min(state[0], lo), max(state[1], hi))

    def merge(a, b):
        if a is None:
            return b
        if b is None:
            return a
        return (min(a[0], b[0]), max(a[1], b[1]))

    agg = AggregateFn(init=lambda _: None, merge=merge,
                      accumulate_block=acc, name="mm")
    r = ds.aggregate(agg)["mm"]
    if r is None:
        raise ValueError(f"column_histogram: no finite non-null "
                         f"values in {column!r}")
    return r


def column_histogram(ds, column: str, bins: int = 32,
                     lo: float | None = None,
                     hi: float | None = None) -> dict:
    """Exact equi-width histogram of a numeric column.

    Returns {"table": pa.Table(bin, bin_lo, bin_hi, n) — bins rows,
    edges are lo + i*w with w = (hi-lo)/bins, the LAST bin includes
    hi — "n_below", "n_above", "n_null", "lo", "hi"}.  Pass lo/hi to
    pin the range (and make cross-corpus histograms comparable);
    otherwise one min/max aggregate discovers it.
    """
    from ray.data.aggregate import AggregateFn

    if bins < 1:
        raise ValueError("bins must be >= 1")
    if lo is not None and hi is not None and hi < lo:
        raise ValueError(
            f"column_histogram: hi ({hi}) < lo ({lo}) — swapped "
            "arguments?")
    if lo is None or hi is None:
        dlo, dhi = _min_max(ds, column)
        lo = dlo if lo is None else lo
        hi = dhi if hi is None else hi
    lo, hi = float(lo), float(hi)
    if not hi > lo:
        hi = lo + 1.0   # degenerate single-value range: one bin holds all
    w = (hi - lo) / bins

    def acc_block(state: np.ndarray, blk: pa.Table) -> np.ndarray:
        col = blk[column]
        nulls = col.null_count
        x = col.drop_null().to_numpy(zero_copy_only=False).astype(
            np.float64)
        finite = np.isfinite(x)
        n_nonfinite = int((~finite).sum())   # NaN/inf: counted, never
        x = x[finite]                        # binned (NaN != any range)
        # the ONE shared binning rule (SQL mirror: CASE x < lo / x > hi
        # / ELSE least(floor((x - lo) / w), bins - 1)):
        below = x < lo
        above = x > hi
        keep = ~below & ~above
        inr = np.minimum(np.floor((x[keep] - lo) / w),
                         bins - 1).astype(np.int64)   # hi -> last bin
        out = state.copy()
        out[:bins] += np.bincount(inr, minlength=bins)
        out[bins] += int(below.sum())
        out[bins + 1] += int(above.sum())
        out[bins + 2] += nulls
        out[bins + 3] += n_nonfinite
        return out

    agg = AggregateFn(
        init=lambda _: np.zeros(bins + 4, np.int64),
        merge=lambda a, b: a + b,
        accumulate_block=acc_block, name="hist")
    v = ds.aggregate(agg)["hist"]

    edges = lo + w * np.arange(bins + 1)
    return {
        "table": pa.table({
            "bin": pa.array(np.arange(bins), pa.int64()),
            "bin_lo": pa.array(edges[:-1], pa.float64()),
            "bin_hi": pa.array(edges[1:], pa.float64()),
            "n": pa.array(v[:bins], pa.int64())}),
        "n_below": int(v[bins]),
        "n_above": int(v[bins + 1]),
        "n_null": int(v[bins + 2]),
        "n_nonfinite": int(v[bins + 3]),
        "lo": lo, "hi": hi,
    }


def psi_drift(ds_a, ds_b, column: str, bins: int = 16,
              eps: float = 1e-4) -> dict:
    """Population stability index between two datasets' distributions
    of ``column`` over SHARED bin edges (combined min/max, so both
    histograms measure the same partition of the line).  Out-of-range
    mass cannot exist under combined bounds; nulls are excluded from
    the proportions and reported.

    Returns {"psi" (rounded to 6 — a pure function of the two count
    vectors), "verdict" stable|moderate|major, "n_a", "n_b",
    "null_a", "null_b", "histogram": pa.Table(bin, bin_lo, bin_hi,
    n_a, n_b)}."""
    alo, ahi = _min_max(ds_a, column)
    blo, bhi = _min_max(ds_b, column)
    lo, hi = min(alo, blo), max(ahi, bhi)
    ha = column_histogram(ds_a, column, bins, lo, hi)
    hb = column_histogram(ds_b, column, bins, lo, hi)
    na = ha["table"]["n"].to_numpy()
    nb = hb["table"]["n"].to_numpy()
    ta, tb = int(na.sum()), int(nb.sum())
    if ta == 0 or tb == 0:
        raise ValueError("psi_drift: a side has no in-range values")
    p = np.maximum(na / ta, eps)
    q = np.maximum(nb / tb, eps)
    psi = float(np.floor(np.sum((p - q) * np.log(p / q)) * 1e6
                         + 0.5) / 1e6)
    verdict = ("stable" if psi < 0.1 else
               "moderate" if psi < 0.25 else "major")
    return {
        "psi": psi, "verdict": verdict, "n_a": ta, "n_b": tb,
        "null_a": ha["n_null"], "null_b": hb["n_null"],
        "histogram": pa.table({
            "bin": ha["table"]["bin"],
            "bin_lo": ha["table"]["bin_lo"],
            "bin_hi": ha["table"]["bin_hi"],
            "n_a": pa.array(na, pa.int64()),
            "n_b": pa.array(nb, pa.int64())}),
    }

"""Generic AS-OF join over Datasets (pair-emitting).

``error_click_asof`` (events.py) is the concrete, SQL-checked rendition
of the as-of kernel; this module exposes the same machinery as a
reusable Dataset-level API, completing the generic join family
(auto_join / salted_join equi joins, interval_overlap_pairs for ranges,
asof_pairs for nearest-event): for every LEFT row, the single RIGHT row
with the greatest ``ts`` at or before the left row's ``ts`` (backward)
— or the smallest at-or-after (forward) — on the same key, optionally
within a tolerance.

Scale design (the round-4 asof lesson verbatim): rows shuffle once by
``hash(key) % P`` with P data-sized — never a per-key groupby — and
each partition is answered in ONE numpy pass: lexsort (key, ts, side)
with right rows sorting before left rows at equal ts (the inclusive
boundary), then the most-recent-right index is a segmented cumulative
max of ``rank·(n+2) + right_pos+1`` where rank is the key's dense rank
in sort order — the rank term dominates anything carried from an
earlier key, so the cummax resets per key with no loop.  Forward
direction is the same kernel over negated timestamps.

Determinism: ties among RIGHT rows at the same (key, ts) resolve to the
LARGEST ``id`` (ids are the innermost lexsort key, and the cummax keeps
the last right row in sort order) — a pure function of the data,
independent of block layout.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ._part import nparts_for

_SCHEMA = pa.schema([("key", pa.int64()),
                     ("left_id", pa.int64()),
                     ("right_id", pa.int64()),
                     ("gap", pa.int64())])


def _asof_partition(t: pa.Table, tolerance, inner: bool) -> pa.Table:
    if t.num_rows == 0:
        return pa.Table.from_pylist([], schema=_SCHEMA)
    key = t["key"].to_numpy(zero_copy_only=False)
    ts = t["ts"].to_numpy(zero_copy_only=False)
    side = t["side"].to_numpy(zero_copy_only=False)  # 0=right, 1=left
    rid = t["rid"].to_numpy(zero_copy_only=False)

    # right rows before left rows at equal ts (inclusive as-of);
    # among equal (key, ts, side), smaller id first -> deterministic
    # tie-break (the cummax then keeps the LAST right row in sort
    # order, i.e. the largest id at the match timestamp — pinned)
    order = np.lexsort((rid, side, ts, key))
    key, ts, side, rid = key[order], ts[order], side[order], rid[order]
    n = len(key)
    new = np.empty(n, bool)
    new[0] = True
    new[1:] = key[1:] != key[:-1]
    rank = np.cumsum(new) - 1
    big = np.int64(n + 2)
    pos = np.arange(n, dtype=np.int64)
    v = rank * big + np.where(side == 0, pos + 1, 0)
    m = np.maximum.accumulate(v)
    lf = side == 1
    if not lf.any():
        return pa.Table.from_pylist([], schema=_SCHEMA)
    off = m[lf] - rank[lf] * big          # 0 = no prior right row
    has = off >= 1
    right_idx = np.where(has, off - 1, 0)
    gap = ts[lf] - ts[right_idx]
    matched = has & ((gap <= tolerance) if tolerance is not None
                     else True)
    out_key = key[lf]
    out_left = rid[lf]
    out_right = np.where(matched, rid[right_idx], -1)
    out_gap = np.where(matched, gap, -1)
    if inner:
        keep = matched
        out_key, out_left = out_key[keep], out_left[keep]
        out_right, out_gap = out_right[keep], out_gap[keep]
        matched = matched[keep]
    nulls = ~matched
    return pa.table({
        "key": pa.array(out_key, pa.int64()),
        "left_id": pa.array(out_left, pa.int64()),
        "right_id": pa.array(out_right, pa.int64(), mask=nulls),
        "gap": pa.array(out_gap, pa.int64(), mask=nulls),
    })


def asof_pairs(left, right, tolerance: int | None = None,
               direction: str = "backward", how: str = "left",
               n_parts: int | None = None):
    """For every left row, the nearest right row on the same key at or
    before (``backward``) / at or after (``forward``) its timestamp,
    optionally within ``tolerance`` (same units as ``ts``).

    ``left`` / ``right``: Datasets with int64 columns (key, ts, id).
    Returns (key, left_id, right_id, gap); unmatched left rows keep a
    NULL right_id/gap under ``how="left"`` and drop under ``inner``.
    ``gap`` is always the non-negative distance |l.ts - r.ts|."""
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction {direction!r}")
    if how not in ("left", "inner"):
        raise ValueError(f"how {how!r}")
    import ray.data  # noqa: F401

    flip = -1 if direction == "forward" else 1

    def prep(batch: pa.Table, side: int, P: int) -> pa.Table:
        k = batch["key"].to_numpy(zero_copy_only=False)
        ts = batch["ts"].to_numpy(zero_copy_only=False) * flip
        rid = batch["id"].to_numpy(zero_copy_only=False)
        h = k.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        part = ((h >> np.uint64(33)) % np.uint64(P)).astype(np.int64)
        return pa.table({
            "key": pa.array(k, pa.int64()),
            "ts": pa.array(ts, pa.int64()),
            "side": pa.array(np.full(len(k), side, np.int64)),
            "rid": pa.array(rid, pa.int64()),
            "part": pa.array(part, pa.int64()),
        })

    P = n_parts or nparts_for(left.count() + right.count(),
                              rows_per_part=500_000, floor=8)
    both = (right.map_batches(lambda b: prep(b, 0, P),
                              batch_format="pyarrow")
            .union(left.map_batches(lambda b: prep(b, 1, P),
                                    batch_format="pyarrow")))
    return (both.groupby("part")
            .map_groups(lambda g: _asof_partition(
                g, tolerance, how == "inner"),
                batch_format="pyarrow"))

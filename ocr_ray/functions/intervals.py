"""Distributed INTERVAL-OVERLAP join (ranges × ranges).

The fourth member of the lacking-in-Ray-Data join trio+1 (as-of ✓,
windowed ✓, point-in-band range ✓ — all in ``events.py``): join two
INTERVAL relations on a key plus ``a.start <= b.end AND b.start <=
a.end``.  A point-in-band join replicates only the build side to
neighbor buckets; here BOTH sides are intervals of arbitrary width, so
both sides are replicated to every time bucket their interval covers
and a pair is counted exactly once in its CANONICAL bucket — the bucket
containing ``max(a.start, b.start)``.  For an overlapping pair that
maximum lies inside both intervals, so both rows were replicated to
that bucket: no pair is missed, and every other shared bucket drops the
pair by the canonicality test — dedup without a distinct pass.

Scale design:

* replication factor is ``ceil(interval_width / bucket_width) + 1`` per
  row — bounded by construction when callers bucket at the typical
  interval width (here: 1 day for day-long activity intervals, the
  incident windows are ±30 min);
* the shuffle key is ``hash(key, bucket) % P`` with P data-sized — the
  asof/range-join lesson: no per-(key,bucket) tiny groups, each
  partition is paired in ONE numpy pass;
* pairing inside a partition is vectorized: rows lexsorted by group,
  per-group cross products materialized with the repeat/offset trick
  (total work = Σ |A_g|·|B_g|, the join's output-candidate size —
  nothing quadratic in partition size), then one overlap + canonical
  mask.  No Python loop over groups, rows, or pairs.

Concrete operator: ``activity_incident_overlap`` — per-user daily
activity intervals [min ts, max ts] × per-error incident windows
[ts − w, ts + w], aggregated per user as exact integer-microsecond
overlap totals.  SQL-mirrored term for term (``ACTIVITY_INCIDENT_SQL``)
so the DuckDB parity is hash-exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ._io import clean_read
from ._part import nparts_for

_US_PER_DAY = 86_400_000_000


_MAX_CANDIDATES_PER_PARTITION = 50_000_000  # ~1.2 GB of pair indices


_EMPTY_PAIRS = pa.table({
    "key": pa.array([], pa.int64()),
    "a_id": pa.array([], pa.int64()),
    "b_id": pa.array([], pa.int64()),
    "overlap_us": pa.array([], pa.int64()),
})


def _pairs_in_partition(t: pa.Table, bucket_us: int,
                        max_candidates: int,
                        emit: str = "agg") -> pa.Table:
    """Vectorized per-partition pairing: one lexsort, per-group cross
    products via the repeat/offset trick, one overlap+canonical mask.
    ``t`` carries side (0=activity, 1=incident), key, bucket, start/end
    in int64 microseconds.

    Candidate count per partition is Σ|A_g|·|B_g| — bounded by interval
    DENSITY per (key, bucket), not by a key's total history.  If one
    key stacks pathologically many intervals into one bucket (the
    interval analog of a hot groupby key), the kernel refuses above
    ``_MAX_CANDIDATES_PER_PARTITION`` with the remedy instead of
    OOMing: narrow ``bucket_us`` (splits long-interval stacks) or
    pre-aggregate the denser side."""
    empty = pa.table({
        "key": pa.array([], pa.int64()),
        "n_pairs": pa.array([], pa.int64()),
        "overlap_us": pa.array([], pa.int64()),
    })
    if t.num_rows == 0:
        return _EMPTY_PAIRS if emit == "pairs" else empty
    key = t["key"].to_numpy(zero_copy_only=False)
    bucket = t["bucket"].to_numpy(zero_copy_only=False)
    side = t["side"].to_numpy(zero_copy_only=False)
    s = t["s"].to_numpy(zero_copy_only=False)
    e = t["e"].to_numpy(zero_copy_only=False)

    order = np.lexsort((s, side, bucket, key))
    key, bucket, side, s, e = (key[order], bucket[order], side[order],
                               s[order], e[order])
    # group = (key, bucket) runs; boundaries where either changes
    new_grp = np.empty(len(key), bool)
    new_grp[0] = True
    new_grp[1:] = (key[1:] != key[:-1]) | (bucket[1:] != bucket[:-1])
    gid = np.cumsum(new_grp) - 1
    g_start = np.flatnonzero(new_grp)
    g_end = np.append(g_start[1:], len(key))
    # within each group rows are side-sorted: activities first
    n_inc = np.add.reduceat(side, g_start)          # incidents per group
    n_act = (g_end - g_start) - n_inc
    # first incident row index per group
    inc_start = g_start + n_act

    act_rows = np.flatnonzero(side == 0)
    if len(act_rows) == 0:
        return _EMPTY_PAIRS if emit == "pairs" else empty
    # each activity row pairs with every incident of its group
    ni_per_act = n_inc[gid[act_rows]]
    total = int(ni_per_act.sum())
    if total == 0:
        return _EMPTY_PAIRS if emit == "pairs" else empty
    if total > max_candidates:
        raise ValueError(
            f"interval join candidate blow-up: {total:,} candidate "
            f"pairs in one partition (cap {max_candidates:,}). One "
            f"key stacks too many intervals into one bucket — narrow "
            f"bucket_us or pre-aggregate the denser side.")
    a_idx = np.repeat(act_rows, ni_per_act)
    base = np.repeat(inc_start[gid[act_rows]], ni_per_act)
    csum = np.cumsum(ni_per_act) - ni_per_act
    within = np.arange(total, dtype=np.int64) - np.repeat(csum,
                                                          ni_per_act)
    i_idx = base + within

    a_s, a_e = s[a_idx], e[a_idx]
    i_s, i_e = s[i_idx], e[i_idx]
    lo = np.maximum(a_s, i_s)
    hi = np.minimum(a_e, i_e)
    ok = (lo <= hi) & (lo // bucket_us == bucket[a_idx])  # canonical
    if not ok.any():
        if emit == "pairs":
            return _EMPTY_PAIRS
        return empty
    if emit == "pairs":
        rid = t["rid"].to_numpy(zero_copy_only=False)[order]
        return pa.table({
            "key": pa.array(key[a_idx][ok], pa.int64()),
            "a_id": pa.array(rid[a_idx][ok], pa.int64()),
            "b_id": pa.array(rid[i_idx][ok], pa.int64()),
            "overlap_us": pa.array((hi - lo)[ok], pa.int64()),
        })
    out = pa.table({
        "key": pa.array(key[a_idx][ok], pa.int64()),
        "one": pa.array(np.ones(int(ok.sum()), np.int64)),
        "ov": pa.array((hi - lo)[ok], pa.int64()),
    })
    g = out.group_by(["key"]).aggregate(
        [("one", "sum"), ("ov", "sum")])
    return pa.table({"key": g["key"],
                     "n_pairs": g["one_sum"],
                     "overlap_us": g["ov_sum"]})


def _replicator(bucket_us: int):
    """Batch fn: replicate each interval row to every bucket it covers
    (carrying the optional int64 ``id`` column as ``rid``)."""

    def replicate(batch: pa.Table, side: int) -> pa.Table:
        k = batch["key"].to_numpy(zero_copy_only=False)
        s = batch["s"].to_numpy(zero_copy_only=False)
        e = batch["e"].to_numpy(zero_copy_only=False)
        b_lo = s // bucket_us
        b_hi = e // bucket_us
        reps = (b_hi - b_lo + 1).astype(np.int64)
        total = int(reps.sum())
        row = np.repeat(np.arange(len(k), dtype=np.int64), reps)
        csum = np.cumsum(reps) - reps
        off = np.arange(total, dtype=np.int64) - np.repeat(csum, reps)
        cols = {
            "key": pa.array(k[row], pa.int64()),
            "bucket": pa.array(b_lo[row] + off, pa.int64()),
            "side": pa.array(np.full(total, side, np.int64)),
            "s": pa.array(s[row], pa.int64()),
            "e": pa.array(e[row], pa.int64()),
        }
        if "id" in batch.column_names:
            ids = batch["id"].to_numpy(zero_copy_only=False)
            cols["rid"] = pa.array(ids[row], pa.int64())
        return pa.table(cols)

    return replicate


def _tagger(P: int):
    """Batch fn: mix (key, bucket) into a stable partition id
    (splitmix-ish) so co-candidates land together without tiny
    per-(key,bucket) groups."""

    def tag(batch: pa.Table) -> pa.Table:
        k = batch["key"].to_numpy(zero_copy_only=False)
        b = batch["bucket"].to_numpy(zero_copy_only=False)
        h = (k.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
             + b.astype(np.uint64) * np.uint64(0xC2B2AE3D27D4EB4F))
        h ^= h >> np.uint64(33)
        h *= np.uint64(0xFF51AFD7ED558CCD)
        h ^= h >> np.uint64(33)
        return batch.append_column(
            "part", pa.array((h % np.uint64(P)).astype(np.int64)))

    return tag


def interval_overlap_agg(acts, incs, bucket_us: int,
                         n_parts: int | None = None,
                         max_candidates: int =
                         _MAX_CANDIDATES_PER_PARTITION):
    """Generic keyed interval-overlap join, aggregated per key.

    ``acts`` / ``incs``: Datasets with int64 columns (key, s, e) in the
    same units as ``bucket_us``; intervals are CLOSED on both ends (a
    touch at a single instant counts, with overlap 0 — SQL's
    ``a.s <= b.e AND b.s <= a.e``).  Returns per-key
    (n_pairs, overlap_us) totals as a Dataset."""
    import ray.data  # noqa: F401  (Dataset ops below)

    from ray.data.aggregate import Sum

    rep = _replicator(bucket_us)
    both = (acts.map_batches(lambda b: rep(b, 0),
                             batch_format="pyarrow")
            .union(incs.map_batches(lambda b: rep(b, 1),
                                    batch_format="pyarrow")))
    P = n_parts or nparts_for(both.count())
    pairs = (both.map_batches(_tagger(P), batch_format="pyarrow")
             .groupby("part")
             .map_groups(lambda g: _pairs_in_partition(
                 g, bucket_us, max_candidates),
                 batch_format="pyarrow"))
    return (pairs.groupby("key")
            .aggregate(Sum("n_pairs", alias_name="n_pairs"),
                       Sum("overlap_us", alias_name="overlap_us")))


def interval_overlap_pairs(acts, incs, bucket_us: int,
                           n_parts: int | None = None,
                           max_candidates: int =
                           _MAX_CANDIDATES_PER_PARTITION):
    """Pair-emitting variant of :func:`interval_overlap_agg`: returns a
    Dataset of (key, a_id, b_id, overlap_us) — one row per overlapping
    (left, right) interval pair, exactly once (canonical-bucket dedup).
    Both inputs must carry an int64 ``id`` column alongside
    (key, s, e).  Output size is the true join cardinality; the
    ``max_candidates`` guard bounds any one partition's blow-up."""
    import ray.data  # noqa: F401

    rep = _replicator(bucket_us)
    both = (acts.map_batches(lambda b: rep(b, 0),
                             batch_format="pyarrow")
            .union(incs.map_batches(lambda b: rep(b, 1),
                                    batch_format="pyarrow")))
    P = n_parts or nparts_for(both.count())
    return (both.map_batches(_tagger(P), batch_format="pyarrow")
            .groupby("part")
            .map_groups(lambda g: _pairs_in_partition(
                g, bucket_us, max_candidates, emit="pairs"),
                batch_format="pyarrow"))


def activity_incident_overlap(sf_dir: str, window_minutes: int = 30):
    """Per-user daily activity intervals [min ts, max ts] overlap-joined
    with per-error incident windows [ts − w, ts + w]; per user returns
    the number of overlapping (activity-day, incident) pairs and the
    exact total overlap in microseconds.  NULL users drop out exactly
    as the SQL equality join drops them."""
    w_us = window_minutes * 60_000_000
    ev = clean_read(f"{sf_dir}/events.parquet",
                    columns=["ts", "user_id", "event_type"])

    def day_partial(batch: pa.Table) -> pa.Table:
        sel = batch.filter(pc.is_valid(batch["user_id"]))
        ts = pc.cast(sel["ts"], pa.int64())
        # numpy floor division: matches DuckDB's // and replicate()'s
        # bucketing for pre-epoch (negative-us) timestamps, where Arrow
        # pc.divide would truncate toward zero instead
        day = ts.to_numpy(zero_copy_only=False) // _US_PER_DAY
        t = pa.table({
            "key": sel["user_id"],
            "day": pa.array(day, pa.int64()),
            "s": ts, "e": ts})
        g = t.group_by(["key", "day"]).aggregate(
            [("s", "min"), ("e", "max")])
        return pa.table({"key": g["key"], "day": g["day"],
                         "s": g["s_min"], "e": g["e_max"]})

    from ray.data.aggregate import Max, Min

    acts = (ev.map_batches(day_partial, batch_format="pyarrow",
                           batch_size=65536)
            .groupby(["key", "day"])
            .aggregate(Min("s", alias_name="s_"),
                       Max("e", alias_name="e_"))
            .map_batches(lambda b: pa.table({
                "key": b["key"], "s": b["s_"], "e": b["e_"]}),
                batch_format="pyarrow"))

    def windows(batch: pa.Table) -> pa.Table:
        sel = batch.filter(pc.and_(
            pc.is_valid(batch["user_id"]),
            pc.equal(batch["event_type"], "error")))
        ts = pc.cast(sel["ts"], pa.int64())
        return pa.table({
            "key": sel["user_id"],
            "s": pc.subtract(ts, pa.scalar(w_us, pa.int64())),
            "e": pc.add(ts, pa.scalar(w_us, pa.int64()))})

    incs = ev.map_batches(windows, batch_format="pyarrow",
                          batch_size=65536)
    # partition count from the SOURCE row count (parquet metadata —
    # free), not from counting the replicated union (which executes
    # the whole pipeline once just to size it: 11.2 -> ~6 s at
    # sf0.1/32).  Replication only multiplies rows by a small bounded
    # factor, so the source count is the right sizing signal.
    out = interval_overlap_agg(acts, incs, bucket_us=_US_PER_DAY,
                               n_parts=nparts_for(ev.count()))
    tbl = pa.Table.from_pylist(
        out.take_all(),
        schema=pa.schema([("key", pa.int64()),
                          ("n_pairs", pa.int64()),
                          ("overlap_us", pa.int64())]))
    tbl = tbl.rename_columns(["user_id", "n_pairs", "overlap_us"])
    return tbl.sort_by([("user_id", "ascending")])


ACTIVITY_INCIDENT_SQL = """
WITH act AS (
  SELECT user_id,
         CAST(min(epoch_us(ts)) AS BIGINT) AS s,
         CAST(max(epoch_us(ts)) AS BIGINT) AS e
  FROM events WHERE user_id IS NOT NULL
  GROUP BY user_id, CAST(epoch_us(ts) AS BIGINT) // 86400000000
),
inc AS (
  SELECT user_id,
         CAST(epoch_us(ts) AS BIGINT) - 1800000000 AS s,
         CAST(epoch_us(ts) AS BIGINT) + 1800000000 AS e
  FROM events WHERE user_id IS NOT NULL AND event_type = 'error'
)
SELECT a.user_id,
       count(*) AS n_pairs,
       CAST(sum(least(a.e, i.e) - greatest(a.s, i.s)) AS BIGINT)
         AS overlap_us
FROM act a JOIN inc i
  ON a.user_id = i.user_id AND a.s <= i.e AND i.s <= a.e
GROUP BY a.user_id
ORDER BY a.user_id
"""

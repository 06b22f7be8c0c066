"""Incremental state in raw Ray actors — the (c) escape hatch.

Ray Data expresses almost everything as Dataset transforms; the one
shape it cannot is ONLINE incremental state over an ordered stream
(SURVEY.md §2.9: the reference is an infinite poll loop with mutable
API-side state).  The documented pattern (ray guide "Streaming-shaped
workloads"): one actor per key-hash bucket, fed batches in timestamp
order; each actor owns its bucket's running state.

Partitioning assumption (stated per the brief's custom-operator rule):
key -> bucket by ``hash(key) % n_buckets``; a key's events must be fed in
ts order (the driver iterates a ts-sorted Dataset), and a key never moves
buckets, so per-key state is single-writer without locks.
"""

from __future__ import annotations

import ray


@ray.remote
class BucketStateActor:
    """Owns the running aggregates of one key-hash bucket."""

    def __init__(self):
        self.totals: dict[int, float] = {}
        self.counts: dict[int, int] = {}
        self.batches_seen = 0

    def consume(self, user_ids: list[int], value_millis: list[int]) -> int:
        for u, v in zip(user_ids, value_millis):
            self.totals[u] = self.totals.get(u, 0) + v
            self.counts[u] = self.counts.get(u, 0) + 1
        self.batches_seen += 1
        return self.batches_seen

    def snapshot(self) -> dict:
        """Point-in-time state — callable mid-stream (the incremental
        property a groupby cannot give)."""
        return {"totals": dict(self.totals), "counts": dict(self.counts)}


class StreamingUserAggregator:
    """Drives a ts-ordered event Dataset through bucket actors."""

    def __init__(self, n_buckets: int = 8):
        self.n_buckets = n_buckets
        self.actors = [BucketStateActor.remote() for _ in range(n_buckets)]

    def feed(self, events_ds, batch_size: int = 8192):
        """Consume the Dataset in ts order, routing rows to bucket owners.
        Sends to all buckets per batch are concurrent; per-bucket order is
        preserved because ray actor calls from one caller run FIFO."""
        import numpy as np

        sorted_ds = events_ds.sort("ts")
        for batch in sorted_ds.iter_batches(batch_size=batch_size,
                                            batch_format="pyarrow"):
            users = batch["user_id"].to_numpy(zero_copy_only=False)
            millis = np.floor(
                batch["value"].to_numpy(zero_copy_only=False) * 1000.0 + 0.5
            ).astype("int64")
            buckets = users % self.n_buckets
            pending = []
            for b in range(self.n_buckets):
                mask = buckets == b
                if mask.any():
                    pending.append(self.actors[b].consume.remote(
                        users[mask].tolist(), millis[mask].tolist()))
            ray.get(pending)  # backpressure: at most one in-flight wave

    def feed_partitioned(self, events_ds, chunk_size: int = 8192):
        """Distributed feed (round 2 — removes the driver funnel): the
        stream is bucket-partitioned with ONE groupby, then each bucket
        is replayed ts-ordered by its own feeder task pushing chunks to
        its bucket actor.  Per-key order is preserved because a key
        lives in exactly one bucket and one feeder; N feeders run
        concurrently, so ingest throughput scales with buckets instead
        of the driver's single iter_batches loop.  Memory per feeder is
        one bucket's rows — the stated partitioning assumption (raise
        n_buckets / salt hot key-spaces to bound it)."""
        import numpy as np
        import pyarrow as pa

        actors = self.actors
        nb = self.n_buckets

        def add_bucket(batch: pa.Table) -> pa.Table:
            users = batch["user_id"].to_numpy(zero_copy_only=False)
            return batch.append_column(
                "bucket", pa.array(users % nb, pa.int64()))

        def feed_group(group: pa.Table) -> pa.Table:
            b = group["bucket"][0].as_py()
            g = group.sort_by("ts")
            users = g["user_id"].to_numpy(zero_copy_only=False)
            millis = np.floor(g["value"].to_numpy(zero_copy_only=False)
                              * 1000.0 + 0.5).astype("int64")
            for lo in range(0, len(users), chunk_size):
                hi = lo + chunk_size
                # sequential per bucket: preserves ts order exactly
                ray.get(actors[b].consume.remote(
                    users[lo:hi].tolist(), millis[lo:hi].tolist()))
            return pa.table({"bucket": pa.array([b], pa.int64()),
                             "rows_fed": pa.array([group.num_rows],
                                                  pa.int64())})

        fed = (events_ds.map_batches(add_bucket, batch_format="pyarrow")
               .groupby("bucket")
               .map_groups(feed_group, batch_format="pyarrow"))
        return fed.to_pandas()  # tiny: one row per bucket

    def result(self):
        """Merge final per-bucket state into (user_id, n_events,
        total_value) rows."""
        import pyarrow as pa

        rows = []
        for snap in ray.get([a.snapshot.remote() for a in self.actors]):
            for u, total in snap["totals"].items():
                rows.append({
                    "user_id": u,
                    "n_events": snap["counts"][u],
                    "total_value": float(
                        __import__("math").floor(
                            (total / 1000.0) * 1000.0 + 0.5)) / 1000.0,
                })
        rows.sort(key=lambda r: r["user_id"])
        return pa.Table.from_pylist(rows, schema=pa.schema([
            ("user_id", pa.int64()), ("n_events", pa.int64()),
            ("total_value", pa.float64())]))

    def shutdown(self):
        for a in self.actors:
            ray.kill(a)


def running_user_totals(sf_dir: str, n_buckets: int = 8):
    """Streaming incremental aggregation over events; the FINAL state is
    SQL-checkable (equals a plain groupby), the incremental snapshots are
    the part a Dataset transform cannot express.  Uses the distributed
    per-bucket feed (round 2): no driver funnel in the ingest path."""
    from ..functions._io import clean_read

    ds = clean_read(f"{sf_dir}/events.parquet",
                    columns=["user_id", "ts", "value"])
    agg = StreamingUserAggregator(n_buckets=n_buckets)
    try:
        agg.feed_partitioned(ds)
        return agg.result()
    finally:
        agg.shutdown()


RUNNING_USER_TOTALS_SQL = """
SELECT user_id, count(*) AS n_events,
       floor((sum(CAST(floor(value * 1000.0 + 0.5) AS BIGINT)) / 1000.0) * 1000.0 + 0.5) / 1000.0 AS total_value
FROM events GROUP BY user_id
"""

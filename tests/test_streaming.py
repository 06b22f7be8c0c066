"""Bucket-actor incremental aggregation: mid-stream snapshots + final
state equal to the batch groupby."""

import duckdb
import pyarrow as pa
import ray
import ray.data as rd

from ocr_ray.stages.streaming import StreamingUserAggregator, running_user_totals

SF = "/root/testdata/sf0.001"


def test_final_state_matches_groupby(ray_session):
    got = running_user_totals(SF).to_pandas().set_index("user_id")
    exp = duckdb.sql(
        f"""SELECT user_id, count(*) AS n_events
            FROM read_parquet('{SF}/events.parquet') GROUP BY user_id"""
    ).df().set_index("user_id")
    assert len(got) == len(exp)
    assert (got["n_events"] == exp["n_events"]).all()


def test_midstream_snapshot_is_incremental(ray_session):
    ds = rd.read_parquet(f"{SF}/events.parquet",
                         columns=["user_id", "ts", "value"])
    half = ds.sort("ts").limit(ds.count() // 2)
    agg = StreamingUserAggregator(n_buckets=4)
    try:
        agg.feed(half)
        mid = agg.result()
        mid_events = sum(r["n_events"] for r in mid.to_pylist())
        assert mid_events == ds.count() // 2  # state reflects half the stream
        # feed the rest: state only grows
        agg.feed(ds.sort("ts"))
        final_events = sum(r["n_events"] for r in agg.result().to_pylist())
        assert final_events > mid_events
    finally:
        agg.shutdown()


def test_bucket_ownership_is_stable(ray_session):
    """A key's rows always land on hash(key) % n_buckets — single-writer."""
    agg = StreamingUserAggregator(n_buckets=4)
    try:
        ds = rd.from_arrow(pa.table({
            "user_id": pa.array([5, 5, 5, 9], pa.int64()),
            "ts": pa.array([1, 2, 3, 4], pa.int64()),
            "value": pa.array([1.0, 1.0, 1.0, 2.0], pa.float64()),
        }))
        agg.feed(ds, batch_size=2)
        snaps = ray.get([a.snapshot.remote() for a in agg.actors])
        owners_of_5 = [i for i, s in enumerate(snaps) if 5 in s["counts"]]
        assert owners_of_5 == [5 % 4]
        assert snaps[5 % 4]["counts"][5] == 3
    finally:
        agg.shutdown()


class TestDistributedFeed:
    def test_partitioned_feed_equals_driver_feed(self, ray_session):
        import ray.data as rd

        from ocr_ray.stages.streaming import StreamingUserAggregator

        ds = rd.read_parquet("/root/testdata/sf0.001/events.parquet",
                             columns=["user_id", "ts", "value"])
        a = StreamingUserAggregator(n_buckets=4)
        b = StreamingUserAggregator(n_buckets=4)
        try:
            a.feed(ds)                  # driver funnel (reference path)
            fed = b.feed_partitioned(ds)  # distributed per-bucket feed
            assert fed["rows_fed"].sum() == ds.count()
            assert a.result().equals(b.result())
        finally:
            a.shutdown()
            b.shutdown()

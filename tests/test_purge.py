"""purge_users: exact removal with written-output proof, untouched-row
preservation, NULL-key safety, and broadcast == anti-join equality."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_ray.functions.purge import purge_users

SF = "/root/testdata/sf0.001"


class TestPurgeUsers:
    def test_purge_matches_sql_and_proves_zero(self, ray_session,
                                               tmp_path):
        out = str(tmp_path / "purged")
        targets = [1, 2, 3, 10, 99999]
        rep = purge_users(SF, out, targets)
        assert rep["remaining_matches"] == 0
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{SF}/events.parquet'")
        con.execute(f"CREATE VIEW purged AS SELECT * FROM "
                    f"'{out}/*.parquet'")
        want_after = con.execute(
            "SELECT count(*) FROM events WHERE user_id IS NULL "
            "OR user_id NOT IN (1, 2, 3, 10, 99999)").fetchone()[0]
        assert rep["rows_after"] == want_after
        # every surviving row is identical to the SQL survivors
        got = con.execute(
            "SELECT event_id FROM purged ORDER BY event_id").fetchdf()
        want = con.execute(
            "SELECT event_id FROM events WHERE user_id IS NULL "
            "OR user_id NOT IN (1, 2, 3, 10, 99999) "
            "ORDER BY event_id").fetchdf()
        assert list(got["event_id"]) == list(want["event_id"])

    def test_null_keys_never_purged(self, ray_session, tmp_path):
        import pyarrow.compute as pc

        d = tmp_path / "sf"
        d.mkdir()
        t = pa.table({
            "event_id": pa.array([0, 1, 2], pa.int64()),
            "user_id": pa.array([7, None, 8], pa.int64()),
            "ts": pa.array([0, 0, 0], pa.int64())})
        t = t.set_column(t.schema.get_field_index("ts"), "ts",
                         pc.cast(t["ts"], pa.timestamp("us")))
        pq.write_table(t, d / "events.parquet")
        rep = purge_users(str(d), str(tmp_path / "out"), [7, 8])
        assert rep["rows_after"] == 1
        assert rep["remaining_matches"] == 0
        left = pq.read_table(f"{tmp_path}/out").to_pandas()
        assert list(left["event_id"]) == [1]

    def test_anti_join_leg_equals_broadcast(self, ray_session,
                                            tmp_path):
        targets = [5, 6, 7]
        a = str(tmp_path / "a")
        b = str(tmp_path / "b")
        rep_a = purge_users(SF, a, targets)
        rep_b = purge_users(SF, b, targets, broadcast_limit=0)
        assert rep_a["strategy"] == "broadcast"
        assert rep_b["strategy"] == "anti_join"
        assert rep_a["rows_after"] == rep_b["rows_after"]
        ta = pq.read_table(a).to_pandas().sort_values("event_id") \
            .reset_index(drop=True)
        tb = pq.read_table(b).to_pandas().sort_values("event_id") \
            .reset_index(drop=True)
        assert list(ta["event_id"]) == list(tb["event_id"])
        assert rep_b["remaining_matches"] == 0

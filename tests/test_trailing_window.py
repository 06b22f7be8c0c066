"""Trailing RANGE-interval window (user_trailing_window_spend):
planted boundary / peer-tie / NULL cases, randomized DuckDB parity,
and the sf0.001 oracle run."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ocr_ray.functions.events import (
    TRAILING_WINDOW_SQL,
    user_trailing_window_spend,
)

MIN = 60 * 1_000_000  # one minute in us


def _write_events(tmp_path, rows):
    t = pa.Table.from_pylist(rows)
    t = t.set_column(t.schema.get_field_index("ts"), "ts",
                     pc.cast(t["ts"], pa.timestamp("us")))
    pq.write_table(t, str(tmp_path / "events.parquet"))


def _oracle(tmp_path):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{tmp_path}/events.parquet'")
    return con.execute(TRAILING_WINDOW_SQL).df()


def _canon(d):
    d = d[sorted(d.columns)].copy()
    d["user_id"] = d["user_id"].astype("float64")
    return d.sort_values(list(d.columns)).reset_index(drop=True)


class TestTrailingWindow:
    def test_planted_boundaries_peers_and_nulls(self, ray_session,
                                                tmp_path):
        """Exactly-10-minutes-ago is INSIDE the window; equal-ts peers
        are included regardless of tie order (RANGE mode); NULL users
        form one shared window partition; NULL values count as zero
        rows that still count toward n_in_window."""
        rows = []
        # user 1: events at 0, exactly 10 min, 20 min 1 us ->
        #   the 10-min event sees BOTH itself and t=0 (inclusive
        #   boundary); the third sees only itself (10 min + 1 us gap).
        rows.append({"event_id": 1, "ts": 0, "user_id": 1,
                     "event_type": "click", "value": 5.0, "props": "{}"})
        rows.append({"event_id": 2, "ts": 10 * MIN, "user_id": 1,
                     "event_type": "click", "value": 7.0, "props": "{}"})
        rows.append({"event_id": 3, "ts": 20 * MIN + 1, "user_id": 1,
                     "event_type": "click", "value": 9.0, "props": "{}"})
        # user 2: three equal-ts peers -> every one of the three rows
        # sees all three (RANGE CURRENT ROW = end of peer group).
        for i in range(3):
            rows.append({"event_id": 10 + i, "ts": 5 * MIN,
                         "user_id": 2, "event_type": "view",
                         "value": float(i + 1), "props": "{}"})
        # NULL users: two events 1 min apart share a window partition.
        rows.append({"event_id": 20, "ts": 0, "user_id": None,
                     "event_type": "error", "value": 4.5, "props": "{}"})
        rows.append({"event_id": 21, "ts": MIN, "user_id": None,
                     "event_type": "error", "value": 5.5, "props": "{}"})
        # user 3: NULL value counts 0 toward the sum but 1 toward n.
        rows.append({"event_id": 30, "ts": 0, "user_id": 3,
                     "event_type": "view", "value": None, "props": "{}"})
        rows.append({"event_id": 31, "ts": MIN, "user_id": 3,
                     "event_type": "view", "value": 3.25, "props": "{}"})
        _write_events(tmp_path, rows)

        got = user_trailing_window_spend(str(tmp_path)).to_pandas()
        want = _oracle(tmp_path)
        pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                      check_dtype=False)

        by_eid = {int(r["event_id"]): r for r in got.to_dict("records")}
        assert by_eid[2]["n_in_window"] == 2          # boundary inside
        assert by_eid[2]["trail_sum"] == 12.0
        assert by_eid[3]["n_in_window"] == 1          # 1 us outside
        for i in range(3):                            # peers: all three
            assert by_eid[10 + i]["n_in_window"] == 3
            assert by_eid[10 + i]["trail_sum"] == 6.0
        assert by_eid[21]["n_in_window"] == 2         # NULL-user group
        assert by_eid[21]["trail_sum"] == 10.0
        assert by_eid[31]["n_in_window"] == 2         # NULL value -> 0
        assert by_eid[31]["trail_sum"] == 3.25

    def test_randomized_parity_vs_duckdb(self, ray_session, tmp_path):
        """Adversarial random stream: clumped timestamps (many exact
        ties, many bucket-boundary hits), negative values, NULL values
        and NULL users — parity with the RANGE-window oracle."""
        rng = np.random.default_rng(11)
        n = 400
        rows = []
        for i in range(n):
            uid = int(rng.integers(0, 10))
            # clump onto multiples of 2.5 min so windows straddle the
            # 10-min bucket edges in every alignment
            ts = int(rng.integers(0, 48)) * (5 * MIN // 2)
            rows.append({
                "event_id": i,
                "ts": ts,
                "user_id": None if uid == 9 else uid,
                "event_type": "click",
                "value": (None if i % 83 == 0
                          else float(np.round(rng.normal(0, 40), 3))),
                "props": "{}",
            })
        _write_events(tmp_path, rows)
        got = user_trailing_window_spend(str(tmp_path)).to_pandas()
        want = _oracle(tmp_path)
        pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                      check_dtype=False)

    def test_sf0001_matches_oracle(self, ray_session):
        sf = "/root/testdata/sf0.001"
        got = user_trailing_window_spend(sf).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{sf}/events.parquet'")
        want = con.execute(TRAILING_WINDOW_SQL
                           + " ORDER BY event_id").df() \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[["event_id", "user_id", "n_in_window", "trail_sum"]],
            want, check_dtype=False)

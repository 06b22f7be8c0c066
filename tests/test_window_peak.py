"""Per-user ROWS-window peak spend (user_peak_window_spend):
planted boundary/tie/NULL cases, randomized DuckDB parity, and the
sf0.001 oracle run."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ocr_ray.functions.events import (
    USER_PEAK_WINDOW_SQL,
    user_peak_window_spend,
)


def _write_events(tmp_path, rows):
    t = pa.Table.from_pylist(rows)
    t = t.set_column(t.schema.get_field_index("ts"), "ts",
                     pc.cast(t["ts"], pa.timestamp("us")))
    pq.write_table(t, str(tmp_path / "events.parquet"))


def _oracle(tmp_path):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"'{tmp_path}/events.parquet'")
    return con.execute(USER_PEAK_WINDOW_SQL).df()


def _canon(d):
    d = d[sorted(d.columns)].copy()
    # NaN-safe user key for sorting
    d["user_id"] = d["user_id"].astype("float64")
    return d.sort_values(list(d.columns)).reset_index(drop=True)


class TestUserPeakWindow:
    def test_planted_windows_ties_and_nulls(self, ray_session, tmp_path):
        """The peak is the best run of <=5 consecutive events; short
        histories use all events; same-ts ties break by event_id on
        both engines; NULL users keep their own group; NULL values
        count as zero."""
        rows = []
        # user 1: 7 events valued 1..7 -> peak = 3+4+5+6+7 = 25
        for i in range(7):
            rows.append({"event_id": i + 1, "ts": i * 1_000_000,
                         "user_id": 1, "event_type": "click",
                         "value": float(i + 1), "props": "{}"})
        # user 2: 3 events (shorter than the window) -> peak = 6.6
        for i in range(3):
            rows.append({"event_id": 10 + i, "ts": i * 1_000_000,
                         "user_id": 2, "event_type": "view",
                         "value": 2.2, "props": "{}"})
        # user 3: same-ts ties; order is event_id, so the last window
        # is [50, 1, 1, 1, 1] -> peak is the prefix [100, 50, 1, 1, 1]
        rows.append({"event_id": 20, "ts": 0, "user_id": 3,
                     "event_type": "click", "value": 100.0,
                     "props": "{}"})
        for i in range(5):
            rows.append({"event_id": 21 + i, "ts": 5_000_000,
                         "user_id": 3, "event_type": "click",
                         "value": 50.0 if i == 0 else 1.0,
                         "props": "{}"})
        # NULL user: two events -> its own group
        rows.append({"event_id": 30, "ts": 0, "user_id": None,
                     "event_type": "error", "value": 4.5,
                     "props": "{}"})
        rows.append({"event_id": 31, "ts": 1, "user_id": None,
                     "event_type": "error", "value": 5.5,
                     "props": "{}"})
        # user 4: a NULL value counts as 0 on both engines
        rows.append({"event_id": 40, "ts": 0, "user_id": 4,
                     "event_type": "view", "value": None,
                     "props": "{}"})
        rows.append({"event_id": 41, "ts": 1, "user_id": 4,
                     "event_type": "view", "value": 3.25,
                     "props": "{}"})
        _write_events(tmp_path, rows)

        got = user_peak_window_spend(str(tmp_path)).to_pandas()
        want = _oracle(tmp_path)
        pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                      check_dtype=False)

        by_user = {(-1 if r["user_id"] != r["user_id"]
                    else int(r["user_id"])): r
                   for r in got.to_dict("records")}
        assert by_user[1]["peak_w5"] == 25.0
        assert abs(by_user[2]["peak_w5"] - 6.6) < 1e-9
        assert by_user[3]["peak_w5"] == 153.0   # 100+50+1+1+1
        assert by_user[-1]["peak_w5"] == 10.0   # NULL group kept
        assert by_user[4]["peak_w5"] == 3.25    # NULL value -> 0

    def test_randomized_parity_vs_duckdb(self, ray_session, tmp_path):
        """Adversarial random stream: clumped timestamps (many exact
        ties), negative values, a NULL value and NULL users — byte-par
        with the window-function oracle."""
        rng = np.random.default_rng(7)
        n = 400
        rows = []
        for i in range(n):
            uid = int(rng.integers(0, 12))
            rows.append({
                "event_id": i,
                "ts": int(rng.integers(0, 40)) * 1_000_000,
                "user_id": None if uid == 11 else uid,
                "event_type": "click",
                "value": (None if i % 97 == 0
                          else float(np.round(rng.normal(0, 50), 3))),
                "props": "{}",
            })
        _write_events(tmp_path, rows)
        got = user_peak_window_spend(str(tmp_path)).to_pandas()
        want = _oracle(tmp_path)
        pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                      check_dtype=False)

    def test_sf0001_matches_oracle(self, ray_session):
        sf = "/root/testdata/sf0.001"
        got = user_peak_window_spend(sf).to_pandas() \
            .sort_values("user_id").reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{sf}/events.parquet'")
        want = con.execute(USER_PEAK_WINDOW_SQL
                           + " ORDER BY user_id").df() \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[["user_id", "n_events", "peak_w5"]], want,
            check_dtype=False)

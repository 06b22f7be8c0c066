"""Incremental sessionization: state-fed increments must equal a fresh
batch sessionize over the union of all increments — plus the
cross-boundary continuation, gap-boundary, NULL-user, late-event and
no-op edges."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from ocr_ray.functions.incremental import (
    init_session_state,
    session_state_result,
    sessionize_increment,
)

MIN_US = 60_000_000


def _events_table(rows):
    """rows: (event_id, user_id_or_None, ts_minutes)"""
    t = pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "user_id": pa.array([r[1] for r in rows], pa.int64()),
        "ts": pa.array([r[2] * MIN_US for r in rows], pa.int64()),
        "event_type": pa.array(["view"] * len(rows), pa.string()),
        "value": pa.array([1.0] * len(rows), pa.float64()),
        "props": pa.array(["{}"] * len(rows), pa.string()),
    })
    return t.set_column(t.schema.get_field_index("ts"), "ts",
                        pc.cast(t["ts"], pa.timestamp("us")))


def _ds(rows, parts=3):
    import ray.data as rd

    return rd.from_arrow(_events_table(rows)).repartition(parts)


def _batch_oracle(rows, tmp_path, tag):
    """events.sessionize over the union, as the ground truth."""
    from ocr_ray.functions.events import sessionize

    d = tmp_path / f"union_{tag}"
    d.mkdir()
    pq.write_table(_events_table(rows), d / "events.parquet")
    return sessionize(str(d)).to_pandas() \
        .sort_values("user_id", na_position="first") \
        .reset_index(drop=True)


def _canon(df):
    return df.sort_values("user_id", na_position="first") \
        .reset_index(drop=True)


class TestIncrementalSessionize:
    def test_increments_equal_batch_on_random_stream(self, ray_session,
                                                     tmp_path):
        rng = np.random.default_rng(0)
        n = 3000
        rows = sorted(
            ((i, int(u) if u >= 0 else None, int(t))
             for i, (u, t) in enumerate(zip(
                 rng.integers(-1, 40, n), rng.integers(0, 5000, n)))),
            key=lambda r: r[2])
        state = str(tmp_path / "st")
        init_session_state(state)
        # three time-split increments
        cuts = [rows[:1000], rows[1000:2200], rows[2200:]]
        for c in cuts:
            sessionize_increment(_ds(c), state)
        got = _canon(session_state_result(state).to_pandas())
        want = _batch_oracle(rows, tmp_path, "rand")
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_cross_boundary_continuation_and_break(self, ray_session,
                                                   tmp_path):
        state = str(tmp_path / "st")
        init_session_state(state)
        # user 1: events at 0 and +10min across the boundary -> ONE
        # session; user 2: 0 and +40min -> TWO sessions
        sessionize_increment(_ds([(0, 1, 0), (1, 2, 0)]), state)
        sessionize_increment(_ds([(2, 1, 10), (3, 2, 40)]), state)
        got = session_state_result(state).to_pandas() \
            .set_index("user_id")
        assert got.loc[1, "n_sessions"] == 1
        assert got.loc[2, "n_sessions"] == 2
        assert got.loc[1, "n_events"] == 2

    def test_exact_gap_boundary_continues(self, ray_session, tmp_path):
        """diff == gap is the SAME session (batch <= semantics)."""
        state = str(tmp_path / "st")
        init_session_state(state)
        sessionize_increment(_ds([(0, 7, 0)]), state)
        sessionize_increment(_ds([(1, 7, 30)]), state)     # == 30 min
        sessionize_increment(_ds([(2, 7, 61)]), state)     # 31 > gap
        got = session_state_result(state).to_pandas()
        assert list(got["n_sessions"]) == [2]
        assert list(got["n_events"]) == [3]

    def test_null_users_tracked_across_increments(self, ray_session,
                                                  tmp_path):
        state = str(tmp_path / "st")
        init_session_state(state)
        sessionize_increment(_ds([(0, None, 0), (1, 5, 0)]), state)
        sessionize_increment(_ds([(2, None, 10), (3, 5, 100)]), state)
        got = _canon(session_state_result(state).to_pandas())
        rows = [(0, None, 0), (1, 5, 0), (2, None, 10), (3, 5, 100)]
        want = _batch_oracle(rows, tmp_path, "nulls")
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_late_events_refused(self, ray_session, tmp_path):
        state = str(tmp_path / "st")
        init_session_state(state)
        sessionize_increment(_ds([(0, 1, 100)]), state)
        with pytest.raises(ValueError, match="late events"):
            sessionize_increment(_ds([(1, 1, 50)]), state)
        # equal-to-watermark is allowed
        sessionize_increment(_ds([(2, 1, 100)]), state)
        got = session_state_result(state).to_pandas()
        assert list(got["n_events"]) == [2]
        assert list(got["n_sessions"]) == [1]

    def test_empty_increment_noop(self, ray_session, tmp_path):
        import ray.data as rd

        state = str(tmp_path / "st")
        init_session_state(state)
        sessionize_increment(_ds([(0, 3, 0)]), state)
        before = session_state_result(state).to_pandas()
        info = sessionize_increment(
            rd.from_arrow(_events_table([])), state)
        after = session_state_result(state).to_pandas()
        pd.testing.assert_frame_equal(before, after)
        assert info["n_users"] == 1

    def test_inactive_users_pass_through(self, ray_session, tmp_path):
        state = str(tmp_path / "st")
        init_session_state(state)
        sessionize_increment(_ds([(0, 1, 0), (1, 2, 0)]), state)
        sessionize_increment(_ds([(2, 2, 1000)]), state)   # only user 2
        got = session_state_result(state).to_pandas() \
            .set_index("user_id")
        assert got.loc[1, "n_events"] == 1        # untouched
        assert got.loc[1, "n_sessions"] == 1
        assert got.loc[2, "n_sessions"] == 2

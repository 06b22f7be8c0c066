"""keyed_fill (LOCF / NOCB gap filling): DuckDB IGNORE-NULLS window
parity, cross-key carry isolation, tie order, layout independence."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _ds(tbl, parts=3):
    import ray.data as rd
    return rd.from_arrow(tbl).repartition(parts)


def _run(tbl, direction="forward", parts=3):
    from ocr_ray.functions.window import keyed_fill
    out = keyed_fill(_ds(tbl, parts), direction=direction).to_pandas()
    return out.sort_values("id").reset_index(drop=True)


def _oracle(tbl, direction="forward"):
    t = tbl  # noqa: F841 — duckdb scans the local
    if direction == "forward":
        w = ("last_value(val IGNORE NULLS) OVER (PARTITION BY key "
             "ORDER BY ts, id ROWS BETWEEN UNBOUNDED PRECEDING AND "
             "CURRENT ROW)")
    else:
        w = ("first_value(val IGNORE NULLS) OVER (PARTITION BY key "
             "ORDER BY ts, id ROWS BETWEEN CURRENT ROW AND UNBOUNDED "
             "FOLLOWING)")
    return duckdb.sql(
        f"SELECT id, key, ts, {w} AS val FROM t ORDER BY id").df()


def _vals(df):
    return [None if pd.isna(v) else int(v) for v in df["val"]]


def _tbl(rows):
    return pa.table({
        "key": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.int64()),
        "id": pa.array([r[2] for r in rows], pa.int64()),
        "val": pa.array([r[3] for r in rows], pa.int64()),
    })


class TestKeyedFill:
    def test_planted_semantics(self, ray_session):
        # key 1: leading NULL stays NULL, then 10 carries over two gaps
        # key 2: all NULL
        # key 3: starts valid right away
        rows = [(1, 1, 1, None), (1, 2, 2, 10), (1, 3, 3, None),
                (1, 5, 4, None), (2, 1, 5, None), (2, 2, 6, None),
                (3, 1, 7, 7), (3, 2, 8, None)]
        got = _run(_tbl(rows))
        assert _vals(got) == [None, 10, 10, 10, None, None, 7, 7]

    def test_carry_never_crosses_keys(self, ray_session):
        # adjacent keys in sort order: key 1 ends with a value, key 2
        # is all-NULL — the accumulate guard must null key 2 entirely
        rows = [(1, 1, 1, 99), (2, 1, 2, None), (2, 2, 3, None)]
        got = _run(_tbl(rows), parts=1)
        assert _vals(got) == [99, None, None]

    def test_tie_order_by_id(self, ray_session):
        # same ts: the id-ordered earlier row's value feeds the later
        rows = [(1, 5, 1, 11), (1, 5, 2, None), (1, 5, 3, 33),
                (1, 5, 4, None)]
        got = _run(_tbl(rows))
        assert _vals(got) == [11, 11, 33, 33]

    @pytest.mark.parametrize("direction", ["forward", "backward"])
    def test_fuzz_matches_duckdb(self, ray_session, direction):
        rng = np.random.default_rng(11)
        n = 30_000
        vals = rng.integers(0, 1000, n)
        tbl = pa.table({
            "key": pa.array(rng.integers(0, 200, n), pa.int64()),
            "ts": pa.array(rng.integers(0, 500, n), pa.int64()),
            "id": pa.array(np.arange(n), pa.int64()),
            "val": pa.array(np.where(rng.random(n) < 0.4, vals, -1),
                            pa.int64()),
        })
        # plant NULLs (40%) after the fact so numpy stays simple
        tbl = tbl.set_column(
            3, "val", pa.array(
                [None if v == -1 else v
                 for v in tbl["val"].to_pylist()], pa.int64()))
        got = _run(tbl, direction=direction, parts=7)
        want = _oracle(tbl, direction=direction)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_layout_independent(self, ray_session):
        rng = np.random.default_rng(3)
        n = 5_000
        tbl = pa.table({
            "key": pa.array(rng.integers(0, 50, n), pa.int64()),
            "ts": pa.array(rng.integers(0, 100, n), pa.int64()),
            "id": pa.array(np.arange(n), pa.int64()),
            "val": pa.array([None if i % 3 else i for i in range(n)],
                            pa.int64()),
        })
        a = _run(tbl, parts=1)
        b = _run(tbl, parts=9)
        pd.testing.assert_frame_equal(a, b)

    def test_bad_direction(self, ray_session):
        from ocr_ray.functions.window import keyed_fill
        with pytest.raises(ValueError, match="direction"):
            keyed_fill(_ds(_tbl([(1, 1, 1, 1)])), direction="sideways")


class TestUserLastClickValue:
    def test_null_users_share_one_partition(self, ray_session,
                                            tmp_path, monkeypatch):
        """SQL window semantics: PARTITION BY user_id groups NULLs
        together — the sentinel-key leg the driver corpus never
        exercises."""
        import os

        import duckdb
        import pyarrow.parquet as pq_

        from ocr_ray.functions.events import (
            USER_LAST_CLICK_SQL,
            user_last_click_value,
        )

        d = str(tmp_path)
        tbl = pa.table({
            "event_id": pa.array(range(8), pa.int64()),
            "ts": pa.array(
                pd.to_datetime([f"2026-01-01 00:0{i}:00"
                                for i in range(8)])),
            "user_id": pa.array([1, None, 1, None, None, 2, None, 2],
                                pa.int64()),
            "event_type": pa.array(["click", "view", "view", "click",
                                    "view", "view", "view", "click"],
                                   pa.string()),
            "value": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0, 8.0],
                              pa.float64()),
        })
        pq_.write_table(tbl, os.path.join(d, "events.parquet"))
        got = user_last_click_value(d).to_pandas() \
            .sort_values("event_id").reset_index(drop=True)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW events AS SELECT * FROM '{d}/events.parquet'")
        want = con.execute(
            USER_LAST_CLICK_SQL + " ORDER BY event_id").df()
        pd.testing.assert_frame_equal(
            got[["event_id", "last_click_millis"]],
            want[["event_id", "last_click_millis"]],
            check_dtype=False)
        # NULL users come back as NULL, and the two NULL-user clickless
        # prefix events stay NULL while the post-click one fills
        assert got["user_id"].isna().tolist() == [
            False, True, False, True, True, False, True, False]
        vals = [None if pd.isna(v) else int(v)
                for v in got["last_click_millis"]]
        assert vals == [1000, None, 1000, 4000, 4000, None, 4000, 8000]

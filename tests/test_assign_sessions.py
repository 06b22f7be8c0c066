"""Generic per-row session assignment: DuckDB window-function parity
and a brute-force reference over random streams; exact-gap boundary
and equal-ts tie pins."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest


def _run(streams, gap):
    import ray.data as rd

    from ocr_ray.functions.events import assign_sessions

    ds = rd.from_arrow(pa.table(streams)).repartition(3)
    rows = assign_sessions(ds, gap=gap, n_parts=4).take_all()
    return sorted(((r["key"], r["id"], r["ts"], r["session_seq"],
                    r["session_start_ts"]) for r in rows))


SQL = """
WITH o AS (
  SELECT key, id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                   OR ts - lag(ts) OVER w > {gap}
              THEN 1 ELSE 0 END AS brk
  FROM t WINDOW w AS (PARTITION BY key ORDER BY ts, id)
),
s AS (
  SELECT key, id, ts,
         sum(brk) OVER (PARTITION BY key ORDER BY ts, id) - 1
           AS session_seq
  FROM o
)
SELECT key, id, ts, session_seq,
       min(ts) OVER (PARTITION BY key, session_seq)
         AS session_start_ts
FROM s ORDER BY key, id
"""


@pytest.mark.parametrize("seed", [5, 6, 7])
def test_duckdb_window_parity(ray_session, seed):
    rng = np.random.default_rng(seed)
    n = 200
    streams = {
        "key": rng.integers(0, 6, n).astype(np.int64),
        "ts": rng.integers(0, 500, n).astype(np.int64),
        "id": np.arange(n, dtype=np.int64),
    }
    gap = 20
    got = _run(streams, gap)
    con = duckdb.connect()
    con.register("t", pa.table(streams))
    want = sorted(tuple(r) for r in
                  con.execute(SQL.format(gap=gap)).fetchall())
    assert got == want


def test_exact_gap_and_ties(ray_session):
    """A gap of EXACTLY the threshold continues the session (strict >);
    equal timestamps order by id and never break."""
    streams = {
        "key": np.array([1, 1, 1, 1], np.int64),
        "ts": np.array([0, 10, 10, 31], np.int64),  # 10->31 gap 21 > 20
        "id": np.array([0, 2, 1, 3], np.int64),
    }
    got = _run(streams, gap=20)
    # rows sorted by (key, id): id0 seq0, id1 seq0 (tie), id2 seq0
    # (exact order 0,(10,id1),(10,id2): all gaps <= 20), id3 seq1
    assert got == [
        (1, 0, 0, 0, 0), (1, 1, 10, 0, 0), (1, 2, 10, 0, 0),
        (1, 3, 31, 1, 31),
    ]
    # exact-threshold gap: 0 -> 20 with gap=20 stays one session
    streams2 = {"key": np.array([1, 1], np.int64),
                "ts": np.array([0, 20], np.int64),
                "id": np.array([0, 1], np.int64)}
    got2 = _run(streams2, gap=20)
    assert [r[3] for r in got2] == [0, 0]


class TestGroupedTopK:
    def test_duckdb_parity_and_prune_safety(self, ray_session):
        """Random corpora vs row_number() OVER; val ties break by id
        ASC on both engines.  Multi-block inputs exercise the per-block
        prune (a block's local top-k can only EVER contain the global
        top-k — pruning is lossless)."""
        import ray.data as rd

        from ocr_ray.functions.events import grouped_top_k

        con = duckdb.connect()
        for seed in (21, 22):
            rng = np.random.default_rng(seed)
            n = 400
            t = {
                "key": rng.integers(0, 7, n).astype(np.int64),
                "val": rng.integers(0, 50, n).astype(np.int64),  # ties
                "id": np.arange(n, dtype=np.int64),
            }
            ds = rd.from_arrow(pa.table(t)).repartition(5)
            got = sorted(
                ((r["key"], r["val"], r["id"], r["rank"]) for r in
                 grouped_top_k(ds, k=3, n_parts=4).take_all()))
            con.register("t", pa.table(t))
            want = sorted(tuple(r) for r in con.execute("""
                SELECT key, val, id,
                       row_number() OVER (PARTITION BY key
                                          ORDER BY val DESC, id) - 1
                         AS rank
                FROM t QUALIFY rank < 3
            """).fetchall())
            assert got == want, seed

    def test_k_larger_than_group(self, ray_session):
        import ray.data as rd

        from ocr_ray.functions.events import grouped_top_k

        t = pa.table({"key": pa.array([1, 1], pa.int64()),
                      "val": pa.array([5, 9], pa.int64()),
                      "id": pa.array([0, 1], pa.int64())})
        got = sorted(
            ((r["key"], r["val"], r["id"], r["rank"]) for r in
             grouped_top_k(rd.from_arrow(t), k=10,
                           n_parts=2).take_all()))
        assert got == [(1, 5, 0, 1), (1, 9, 1, 0)]


class TestGroupedCountDistinct:
    def test_duckdb_parity_across_layouts(self, ray_session):
        """Exact per-key COUNT(DISTINCT) matches DuckDB on random data
        with heavy duplication, independent of block layout."""
        import ray.data as rd

        from ocr_ray.functions.events import grouped_count_distinct

        rng = np.random.default_rng(33)
        n = 600
        t = {"key": rng.integers(0, 5, n).astype(np.int64),
             "val": rng.integers(0, 40, n).astype(np.int64)}
        con = duckdb.connect()
        con.register("t", pa.table(t))
        want = dict(con.execute(
            "SELECT key, count(DISTINCT val) FROM t GROUP BY key"
        ).fetchall())
        for nblocks in (1, 4, 9):
            ds = rd.from_arrow(pa.table(t)).repartition(nblocks)
            got = {r["key"]: r["n_distinct"] for r in
                   grouped_count_distinct(ds).take_all()}
            assert got == want, nblocks

"""Generic asof_pairs: brute-force reference + DuckDB ASOF JOIN parity
on random streams, both directions, tolerance, ties, and unmatched
rows."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest


def _mk(rng, n, keys=5, span=1000):
    return {
        "key": rng.integers(0, keys, n).astype(np.int64),
        "ts": rng.integers(0, span, n).astype(np.int64),
        "id": np.arange(n, dtype=np.int64),
    }


def _brute(left, right, tolerance, direction, how):
    out = []
    for k, lt, lid in zip(left["key"], left["ts"], left["id"]):
        best = None
        for k2, rt, rid in zip(right["key"], right["ts"], right["id"]):
            if k2 != k:
                continue
            if direction == "backward":
                if rt > lt:
                    continue
                gap = lt - rt
            else:
                if rt < lt:
                    continue
                gap = rt - lt
            if tolerance is not None and gap > tolerance:
                continue
            # nearest; ties at same ts -> largest id
            if best is None or gap < best[1] or \
                    (gap == best[1] and rid > best[0]):
                best = (rid, gap)
        if best is not None:
            out.append((int(k), int(lid), int(best[0]), int(best[1])))
        elif how == "left":
            out.append((int(k), int(lid), None, None))
    return sorted(out, key=lambda r: (r[0], r[1]))


def _run(ray_session, left, right, **kw):
    import ray.data as rd

    from ocr_ray.functions.asof import asof_pairs

    lds = rd.from_arrow(pa.table(left)).repartition(3)
    rds = rd.from_arrow(pa.table(right)).repartition(2)
    rows = asof_pairs(lds, rds, n_parts=4, **kw).take_all()
    return sorted(
        ((r["key"], r["left_id"], r["right_id"], r["gap"])
         for r in rows), key=lambda r: (r[0], r[1]))


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("how", ["left", "inner"])
def test_random_vs_bruteforce(ray_session, direction, how):
    for seed in (1, 2, 3):
        rng = np.random.default_rng(seed)
        left = _mk(rng, 80)
        right = _mk(rng, 60)
        for tol in (None, 50):
            got = _run(ray_session, left, right, tolerance=tol,
                       direction=direction, how=how)
            want = _brute(left, right, tol, direction, how)
            assert got == want, (direction, how, tol, seed)


def test_equal_ts_is_inclusive_and_tie_breaks_to_largest_id(
        ray_session):
    left = {"key": np.array([1], np.int64),
            "ts": np.array([100], np.int64),
            "id": np.array([0], np.int64)}
    # two right rows at EXACTLY the left ts -> inclusive match, the
    # larger id wins deterministically
    right = {"key": np.array([1, 1, 1], np.int64),
             "ts": np.array([100, 100, 99], np.int64),
             "id": np.array([7, 3, 9], np.int64)}
    got = _run(ray_session, left, right, direction="backward")
    assert got == [(1, 0, 7, 0)]


def test_duckdb_asof_parity(ray_session):
    """DuckDB ASOF LEFT JOIN as an independent oracle (backward,
    inclusive).  DuckDB's tie handling at equal ts picks an arbitrary
    row among equals, so the parity corpus keeps (key, ts) unique on
    the right side."""
    rng = np.random.default_rng(11)
    left = _mk(rng, 120, keys=6)
    # unique (key, ts) on the right: sample without replacement
    kts = rng.permutation(6 * 400)[:90]
    right = {"key": (kts // 400).astype(np.int64),
             "ts": (kts % 400).astype(np.int64),
             "id": np.arange(90, dtype=np.int64)}
    got = _run(ray_session, left, right, direction="backward")
    con = duckdb.connect()
    con.register("l", pa.table(left))
    con.register("r", pa.table(right))
    want = con.execute("""
        SELECT l.key, l.id AS left_id, r.id AS right_id,
               l.ts - r.ts AS gap
        FROM l ASOF LEFT JOIN r
          ON l.key = r.key AND l.ts >= r.ts
        ORDER BY l.key, l.id
    """).fetchall()
    want = [(k, li, ri if ri is not None else None,
             g if g is not None else None) for k, li, ri, g in want]
    assert got == want

"""Generic windowing APIs (functions/window.py): keyed_lag and
rolling_range_agg.

Oracles: a per-row pandas brute force, DuckDB LAG/LEAD and
RANGE-frame window functions on random tie-dense corpora (negative
timestamps included), and block-layout independence.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_ray.functions.window import keyed_lag, rolling_range_agg


def _corpus(seed, n, n_keys=7, ts_lo=-50, ts_hi=200):
    """Tie-dense keyed stream: few keys, tiny ts domain (many exact
    ties), values signed."""
    rng = np.random.default_rng(seed)
    return pa.table({
        "key": pa.array(rng.integers(0, n_keys, n), pa.int64()),
        "ts": pa.array(rng.integers(ts_lo, ts_hi, n), pa.int64()),
        "id": pa.array(rng.permutation(n).astype(np.int64)),
        "val": pa.array(rng.integers(-50, 50, n), pa.int64()),
    })


def _write(tmp_path, t, name):
    p = tmp_path / f"{name}.parquet"
    pq.write_table(t, p)
    return str(p)


@pytest.mark.parametrize("direction,fn", [("lag", "LAG"),
                                          ("lead", "LEAD")])
def test_keyed_lag_duckdb_parity(ray_session, tmp_path, direction, fn):
    import ray.data as rd

    t = _corpus(3, 3_000)
    p = _write(tmp_path, t, f"lag_{direction}")
    out = keyed_lag(rd.read_parquet(p), n=2,
                    direction=direction).to_pandas()
    con = duckdb.connect()
    oracle = con.execute(f"""
        SELECT id, key,
               {fn}(id, 2)  OVER w AS lag_id,
               {fn}(val, 2) OVER w AS lag_val,
               abs(ts - {fn}(ts, 2) OVER w) AS gap
        FROM read_parquet('{p}')
        WINDOW w AS (PARTITION BY key ORDER BY ts, id)""").df()
    cols = sorted(out.columns)
    assert sorted(oracle.columns) == cols
    a = (out[cols].sort_values(["id"]).reset_index(drop=True))
    b = (oracle[cols].sort_values(["id"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert a.lag_id.notna().sum() > 0 and a.lag_id.isna().sum() > 0


def test_keyed_lag_bruteforce_and_layout(ray_session, tmp_path):
    import ray.data as rd

    t = _corpus(9, 1_200, n_keys=4)
    p = _write(tmp_path, t, "lag_bf")
    df = t.to_pandas().sort_values(["key", "ts", "id"])
    exp = {}
    for key, g in df.groupby("key"):
        ids = g.id.to_numpy()
        vals = g.val.to_numpy()
        for i, rid in enumerate(ids):
            exp[rid] = (ids[i - 1], vals[i - 1]) if i >= 1 else None
    for nblocks in (1, 7):
        ds = rd.read_parquet(p).repartition(nblocks)
        out = keyed_lag(ds, n=1).to_pandas().set_index("id")
        assert len(out) == len(df)
        for rid, want in exp.items():
            row = out.loc[rid]
            if want is None:
                assert pd.isna(row.lag_id)
            else:
                assert (row.lag_id, row.lag_val) == want


def test_rolling_range_duckdb_parity(ray_session, tmp_path):
    import ray.data as rd

    t = _corpus(17, 4_000, n_keys=11, ts_lo=-300, ts_hi=900)
    p = _write(tmp_path, t, "roll")
    out = rolling_range_agg(rd.read_parquet(p), window=25).to_pandas()
    con = duckdb.connect()
    oracle = con.execute(f"""
        SELECT id, key,
               count(*) OVER w AS n_in_window,
               sum(val) OVER w AS win_sum
        FROM read_parquet('{p}')
        WINDOW w AS (PARTITION BY key ORDER BY ts
                     RANGE BETWEEN 25 PRECEDING AND CURRENT ROW)""").df()
    cols = sorted(out.columns)
    assert sorted(oracle.columns) == cols
    a = out[cols].sort_values("id").reset_index(drop=True)
    b = oracle[cols].sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert (a.n_in_window > 1).any()  # windows actually aggregate


def test_rolling_range_bruteforce(ray_session, tmp_path):
    import ray.data as rd

    t = _corpus(23, 800, n_keys=3, ts_lo=-40, ts_hi=40)
    p = _write(tmp_path, t, "roll_bf")
    w = 10
    out = (rolling_range_agg(rd.read_parquet(p), window=w)
           .to_pandas().set_index("id"))
    df = t.to_pandas()
    assert len(out) == len(df)
    for _, r in df.iterrows():
        mask = ((df.key == r.key) & (df.ts >= r.ts - w)
                & (df.ts <= r.ts))
        got = out.loc[r.id]
        assert got.n_in_window == mask.sum()
        assert got.win_sum == df.val[mask].sum()


def test_rolling_equal_ts_peers_included(ray_session, tmp_path):
    """RANGE semantics: ALL equal-ts peers count, regardless of id
    order — the divergence from ROWS frames."""
    import ray.data as rd

    t = pa.table({
        "key": pa.array([1, 1, 1, 1], pa.int64()),
        "ts": pa.array([5, 5, 5, 100], pa.int64()),
        "id": pa.array([10, 11, 12, 13], pa.int64()),
        "val": pa.array([1, 2, 4, 8], pa.int64()),
    })
    p = _write(tmp_path, t, "peers")
    out = (rolling_range_agg(rd.read_parquet(p), window=3)
           .to_pandas().set_index("id"))
    for rid in (10, 11, 12):
        assert out.loc[rid].n_in_window == 3
        assert out.loc[rid].win_sum == 7
    assert out.loc[13].n_in_window == 1 and out.loc[13].win_sum == 8


def test_bad_args(ray_session):
    with pytest.raises(ValueError):
        keyed_lag(None, n=0)
    with pytest.raises(ValueError):
        keyed_lag(None, direction="sideways")
    with pytest.raises(ValueError):
        rolling_range_agg(None, window=0)


def test_rolling_rows_duckdb_parity(ray_session, tmp_path):
    import ray.data as rd

    from ocr_ray.functions.window import rolling_rows_agg

    t = _corpus(31, 3_500, n_keys=9)
    p = _write(tmp_path, t, "rows_frame")
    out = rolling_rows_agg(rd.read_parquet(p), k=4).to_pandas()
    con = duckdb.connect()
    oracle = con.execute(f"""
        SELECT id, key,
               count(*) OVER w AS n_in_window,
               sum(val) OVER w AS win_sum
        FROM read_parquet('{p}')
        WINDOW w AS (PARTITION BY key ORDER BY ts, id
                     ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)""").df()
    cols = sorted(out.columns)
    assert sorted(oracle.columns) == cols
    a = out[cols].sort_values("id").reset_index(drop=True)
    b = oracle[cols].sort_values("id").reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert set(a.n_in_window) == {1, 2, 3, 4}


def test_rolling_rows_bad_args(ray_session):
    from ocr_ray.functions.window import rolling_rows_agg

    with pytest.raises(ValueError):
        rolling_rows_agg(None, k=0)


def test_rolling_range_overflow_guard(ray_session, tmp_path):
    """The (key,bucket)-band encoding must refuse, not silently wrap,
    when n_groups * 4*window exceeds int64 (review-fix regression):
    window=2^56 puts the threshold at 32 groups per partition."""
    import ray.data as rd

    n = 40                              # 40 keys -> >= 40 groups
    t = pa.table({
        "key": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(np.arange(n), pa.int64()),
        "id": pa.array(np.arange(n), pa.int64()),
        "val": pa.array(np.ones(n, np.int64), pa.int64()),
    })
    p = tmp_path / "ovf.parquet"
    pq.write_table(t, p)
    ds = rd.read_parquet(str(p))
    with pytest.raises(Exception, match="overflow"):
        rolling_range_agg(ds, window=2 ** 56, n_parts=1).to_pandas()

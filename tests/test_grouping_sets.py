"""GROUPING SETS / ROLLUP / CUBE (functions/grouping.py).

Oracles: DuckDB GROUP BY ROLLUP / CUBE with GROUPING() ids, at two
scales; a planted NULL-key corpus proving subtotal rows and data-NULL
groups do NOT conflate; and set-by-set equality of the one-shuffle
generic against independent per-set groupbys.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ocr_ray.functions.grouping import (EVENTS_CUBE_SQL,
                                        ORDERS_STATUS_ROLLUP_SQL, cube,
                                        events_type_year_cube,
                                        grouping_sets, orders_status_rollup,
                                        rollup)

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _cmp(ds, sql, sf_dir, tables=("orders", "events")):
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")
    mine = ds.to_pandas()
    oracle = con.execute(sql).df()
    cols = sorted(mine.columns)
    assert sorted(oracle.columns) == cols
    a = (mine[cols].sort_values(cols, na_position="first")
         .reset_index(drop=True))
    b = (oracle[cols].sort_values(cols, na_position="first")
         .reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    return len(a)


@pytest.mark.parametrize("sf_dir", [SF, SF01])
def test_orders_status_rollup_duckdb_parity(ray_session, sf_dir):
    n = _cmp(orders_status_rollup(sf_dir), ORDERS_STATUS_ROLLUP_SQL, sf_dir)
    assert n > 3  # cells + subtotals + grand total


def test_events_cube_duckdb_parity(ray_session):
    n = _cmp(events_type_year_cube(SF), EVENTS_CUBE_SQL, SF)
    assert n > 3


def test_null_keys_do_not_conflate_with_subtotals(ray_session,
                                                  tmp_path):
    """A data-NULL key group and the rollup subtotal over that key are
    distinct rows (different grouping_id), exactly as in SQL."""
    import pyarrow.parquet as pq
    import ray.data as rd

    t = pa.table({
        "a": pa.array(["x", "x", None, None, "y"]),
        "b": pa.array([1, 2, 1, None, None], pa.int64()),
        "v": pa.array([10, 20, 30, 40, 50], pa.int64()),
    })
    p = tmp_path / "t.parquet"
    pq.write_table(t, p)
    out = rollup(rd.read_parquet(str(p)), ["a", "b"], ["v"]).to_pandas()

    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM read_parquet('{p}')")
    oracle = con.execute("""
        SELECT a, b, CAST(GROUPING(a, b) AS BIGINT) AS grouping_id,
               count(*) AS n_rows, CAST(sum(v) AS BIGINT) AS sum_v
        FROM t GROUP BY ROLLUP(a, b)""").df()
    cols = sorted(out.columns)
    assert sorted(oracle.columns) == cols
    a = (out[cols].sort_values(cols, na_position="first")
         .reset_index(drop=True))
    b = (oracle[cols].sort_values(cols, na_position="first")
         .reset_index(drop=True))
    pd.testing.assert_frame_equal(a, b, check_dtype=False)

    # the data-NULL 'a' cell group (gid=0, a NULL) and the per-a
    # subtotal rows (gid=1) both exist and are distinct
    g0_null_a = out[(out.grouping_id == 0) & out.a.isna()]
    assert len(g0_null_a) == 2  # (NULL,1) and (NULL,NULL) data cells
    assert (out.grouping_id == 1).sum() == 3  # subtotals: x, y, NULL
    assert (out.grouping_id == 3).sum() == 1  # grand total
    assert out[out.grouping_id == 3].n_rows.iloc[0] == 5
    assert out[out.grouping_id == 3].sum_v.iloc[0] == 150


def test_generic_sets_equal_independent_groupbys(ray_session,
                                                 tmp_path):
    """The one-shuffle grouping_sets output, filtered to one gid,
    equals a plain per-set groupby — for every set in a CUBE."""
    import pyarrow.parquet as pq
    import ray.data as rd

    rng = np.random.default_rng(7)
    n = 5_000
    t = pa.table({
        "a": pa.array(rng.integers(0, 5, n), pa.int64()),
        "b": pa.array([f"s{i}" for i in rng.integers(0, 3, n)]),
        "v": pa.array(rng.integers(-100, 100, n), pa.int64()),
    })
    p = tmp_path / "c.parquet"
    pq.write_table(t, p)
    ds = rd.read_parquet(str(p))
    out = cube(ds, ["a", "b"], ["v"]).to_pandas()
    df = t.to_pandas()

    for keys_active, gid in [(["a", "b"], 0), (["a"], 1),
                             (["b"], 2), ([], 3)]:
        got = out[out.grouping_id == gid]
        if keys_active:
            exp = (df.groupby(keys_active)
                   .agg(n_rows=("v", "size"), sum_v=("v", "sum"))
                   .reset_index())
            g = (got[keys_active + ["n_rows", "sum_v"]]
                 .sort_values(keys_active).reset_index(drop=True))
            e = exp.sort_values(keys_active).reset_index(drop=True)
            pd.testing.assert_frame_equal(g, e, check_dtype=False)
        else:
            assert len(got) == 1
            assert got.n_rows.iloc[0] == n
            assert got.sum_v.iloc[0] == df.v.sum()
        # inactive keys are NULL
        for k in ("a", "b"):
            if k not in keys_active:
                assert got[k].isna().all()


def test_rollup_and_cube_set_construction(ray_session):
    with pytest.raises(ValueError):
        grouping_sets(None, ["a"], [("a",), ("a",)], ["v"])
    with pytest.raises(ValueError):
        grouping_sets(None, ["a"], [("zz",)], ["v"])

"""Multiset set operations (functions/setops.py).

Oracles: DuckDB EXCEPT/INTERSECT [ALL] on random duplicate- and
NULL-dense corpora (all four variants, multi-column rows), a pandas
brute-force bag check, counts-mode equivalence, and the concrete
click-surplus op at two scales.
"""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_ray.functions.setops import (CLICK_EXCEPT_ERROR_SQL,
                                      click_except_error_surplus,
                                      except_all, except_distinct,
                                      intersect_all,
                                      intersect_distinct, set_op)

SF = "/root/testdata/sf0.001"
SF01 = "/root/testdata/sf0.01"


def _mk(tmp_path, name, seed, n, xdom=6, sdom=4):
    """Small-domain two-column corpus: lots of duplicate rows + NULLs
    in both columns (the collision-dense regime where bag semantics
    and NULL-equality actually bite).  Asymmetric domains between the
    two sides keep DISTINCT variants non-vacuous."""
    rng = np.random.default_rng(seed)
    x = rng.integers(0, xdom, n).astype(np.int64)
    s = rng.integers(0, sdom, n)
    xn = rng.random(n) < 0.15
    sn = rng.random(n) < 0.15
    t = pa.table({
        "x": pa.array([None if m else int(v) for v, m in zip(x, xn)],
                      pa.int64()),
        "s": pa.array([None if m else f"g{v}" for v, m in zip(s, sn)]),
    })
    p = tmp_path / f"{name}.parquet"
    pq.write_table(t, p)
    return str(p), t


@pytest.mark.parametrize("op,sql_op", [
    ("except_all", "EXCEPT ALL"),
    ("except_distinct", "EXCEPT"),
    ("intersect_all", "INTERSECT ALL"),
    ("intersect_distinct", "INTERSECT"),
])
def test_set_ops_duckdb_parity(ray_session, tmp_path, op, sql_op):
    import ray.data as rd

    pa_path, _ = _mk(tmp_path, "a", 11, 4_000, xdom=8)
    pb_path, _ = _mk(tmp_path, "b", 22, 3_000, xdom=4)
    a = rd.read_parquet(pa_path)
    b = rd.read_parquet(pb_path)
    mine = set_op(a, b, ["x", "s"], op,
                  col_types={"x": pa.int64(), "s": pa.string()}
                  ).to_pandas()

    con = duckdb.connect()
    oracle = con.execute(f"""
        SELECT x, s FROM read_parquet('{pa_path}')
        {sql_op}
        SELECT x, s FROM read_parquet('{pb_path}')""").df()
    key = ["x", "s"]
    g = (mine[key].sort_values(key, na_position="first")
         .reset_index(drop=True))
    e = (oracle[key].sort_values(key, na_position="first")
         .reset_index(drop=True))
    pd.testing.assert_frame_equal(g, e, check_dtype=False)
    assert len(g) > 0


def test_except_all_bag_bruteforce(ray_session, tmp_path):
    """Per distinct row: multiplicity == max(count_a - count_b, 0)."""
    import ray.data as rd

    pa_path, ta = _mk(tmp_path, "a2", 5, 2_000)
    pb_path, tb = _mk(tmp_path, "b2", 6, 2_500)
    out = except_all(rd.read_parquet(pa_path), rd.read_parquet(pb_path),
                     ["x", "s"],
                     col_types={"x": pa.int64(), "s": pa.string()}
                     ).to_pandas()

    def bag(t):
        df = t.to_pandas()
        return df.fillna({"x": -999, "s": "\0"}).groupby(
            ["x", "s"]).size()

    ca, cb = bag(ta), bag(tb)
    expect = (ca.subtract(cb, fill_value=0)).clip(lower=0)
    expect = expect[expect > 0].astype(int)
    got = (out.fillna({"x": -999, "s": "\0"})
           .groupby(["x", "s"]).size())
    pd.testing.assert_series_equal(got.sort_index(),
                                   expect.sort_index(),
                                   check_names=False)


def test_counts_mode_matches_rows_mode(ray_session, tmp_path):
    import ray.data as rd

    pa_path, _ = _mk(tmp_path, "a3", 9, 1_500)
    pb_path, _ = _mk(tmp_path, "b3", 10, 1_500)
    kw = dict(col_types={"x": pa.int64(), "s": pa.string()})
    a, b = rd.read_parquet(pa_path), rd.read_parquet(pb_path)
    rows = intersect_all(a, b, ["x", "s"], **kw).to_pandas()
    cnts = set_op(rd.read_parquet(pa_path), rd.read_parquet(pb_path),
                  ["x", "s"], "intersect_all", emit="counts",
                  **kw).to_pandas()
    key = ["x", "s"]
    from_rows = (rows.fillna({"x": -999, "s": "\0"})
                 .groupby(key).size().sort_index())
    from_cnts = (cnts.fillna({"x": -999, "s": "\0"})
                 .set_index(key)["n"].sort_index())
    pd.testing.assert_series_equal(from_rows, from_cnts,
                                   check_names=False,
                                   check_dtype=False)
    assert (cnts["n"] > 0).all()


def test_distinct_variants_emit_once(ray_session, tmp_path):
    import ray.data as rd

    pa_path, _ = _mk(tmp_path, "a4", 13, 1_000)
    pb_path, _ = _mk(tmp_path, "b4", 14, 400)
    kw = dict(col_types={"x": pa.int64(), "s": pa.string()})
    for fn in (except_distinct, intersect_distinct):
        out = fn(rd.read_parquet(pa_path), rd.read_parquet(pb_path),
                 ["x", "s"], **kw).to_pandas()
        dedup = out.fillna({"x": -999, "s": "\0"}).drop_duplicates()
        assert len(dedup) == len(out)


def test_bad_args(ray_session):
    with pytest.raises(ValueError):
        set_op(None, None, ["x"], "union_all")
    with pytest.raises(ValueError):
        set_op(None, None, ["x"], "except_all", emit="bags")


@pytest.mark.parametrize("sf_dir", [SF, SF01])
def test_click_surplus_duckdb_parity(ray_session, sf_dir):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW events AS SELECT * FROM "
                f"read_parquet('{sf_dir}/events.parquet')")
    mine = click_except_error_surplus(sf_dir).to_pandas()
    oracle = con.execute(CLICK_EXCEPT_ERROR_SQL).df()
    cols = sorted(mine.columns)
    assert sorted(oracle.columns) == cols
    g = (mine[cols].sort_values(cols, na_position="first")
         .reset_index(drop=True))
    e = (oracle[cols].sort_values(cols, na_position="first")
         .reset_index(drop=True))
    pd.testing.assert_frame_equal(g, e, check_dtype=False)
    assert len(g) > 0

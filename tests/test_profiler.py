"""One-pass table profiler: DuckDB parity on the exact fields, KMV
exactness below k, layout independence, nested/null/empty edges."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from ocr_ray.functions.profiler import profile_table


def _prof_dict(tbl: pa.Table) -> dict:
    return {r["column"]: r for r in tbl.to_pylist()}


class TestProfilerParity:
    def test_orders_exact_fields_match_duckdb(self, ray_session):
        import ray.data as rd

        path = "/root/testdata/sf0.001/orders.parquet"
        prof = _prof_dict(profile_table(rd.read_parquet(path)))
        con = duckdb.connect()
        for c in prof:
            want = con.sql(f"""
                SELECT count(*) n_rows,
                       count(*) - count("{c}") n_nulls,
                       count(DISTINCT "{c}")::BIGINT n_distinct,
                       min("{c}") lo, max("{c}") hi
                FROM read_parquet('{path}')
            """).fetchone()
            got = prof[c]
            assert got["n_rows"] == want[0], c
            assert got["n_nulls"] == want[1], c
            assert got["min"] == str(want[3]) and got["max"] == str(want[4]), c
            # KMV is EXACT below k=1024, ~1/sqrt(k-1) error above
            if want[2] < 1024:
                assert got["n_distinct"] == float(want[2]), c
            else:
                assert abs(got["n_distinct"] / want[2] - 1) < 0.15, c

    def test_means_match_quantized_sql(self, ray_session):
        import ray.data as rd

        path = "/root/testdata/sf0.001/orders.parquet"
        prof = _prof_dict(profile_table(
            rd.read_parquet(path), columns=["o_orderkey", "o_totalprice"]))
        con = duckdb.connect()
        # int column: exact integer sum / n, half-up at 1e-6
        n, s = con.sql(f"""SELECT count(o_orderkey),
            sum(o_orderkey)::HUGEINT FROM read_parquet('{path}')
        """).fetchone()
        want = float(np.floor(int(s) / int(n) * 1e6 + 0.5) / 1e6)
        assert prof["o_orderkey"]["mean"] == want
        # float column: micro-quantize each value first (engine rule)
        n, s = con.sql(f"""SELECT count(o_totalprice),
            sum(floor(o_totalprice * 1e6 + 0.5)::HUGEINT)
            FROM read_parquet('{path}')""").fetchone()
        want = float(np.floor(int(s) / int(n) / 1e6 * 1e6 + 0.5) / 1e6)
        assert prof["o_totalprice"]["mean"] == want

    def test_layout_independent(self, ray_session):
        import ray.data as rd

        path = "/root/testdata/sf0.001/events.parquet"
        a = profile_table(rd.read_parquet(path).repartition(1))
        b = profile_table(rd.read_parquet(path).repartition(7))
        assert a.to_pydict() == b.to_pydict()


class TestProfilerEdges:
    def test_nulls_nested_and_bool(self, ray_session):
        import ray.data as rd

        tbl = pa.table({
            "i": pa.array([1, None, 3, None], pa.int64()),
            "s": pa.array(["b", "a", None, "a"], pa.string()),
            "f": pa.array([1.5, 2.5, None, None], pa.float64()),
            "b": pa.array([True, True, False, None], pa.bool_()),
            "lst": pa.array([[1], None, [2, 3], []],
                            pa.list_(pa.int64())),
        })
        prof = _prof_dict(profile_table(rd.from_arrow(tbl).repartition(3)))
        assert prof["i"] == {"column": "i", "dtype": "int64", "n_rows": 4,
                             "n_nulls": 2, "n_distinct": 2.0, "min": "1",
                             "max": "3", "mean": 2.0}
        assert prof["s"]["n_nulls"] == 1 and prof["s"]["n_distinct"] == 2.0
        assert prof["s"]["min"] == "a" and prof["s"]["max"] == "b"
        assert prof["s"]["mean"] is None
        assert prof["f"]["mean"] == 2.0 and prof["f"]["n_distinct"] == 2.0
        assert prof["b"] == {"column": "b", "dtype": "bool", "n_rows": 4,
                             "n_nulls": 1, "n_distinct": 2.0, "min": "False",
                             "max": "True", "mean": 0.666667}
        # nested: counts only, everything else NULL
        assert prof["lst"] == {"column": "lst", "dtype": "list<item: int64>",
                               "n_rows": 4, "n_nulls": 1,
                               "n_distinct": None, "min": None,
                               "max": None, "mean": None}

    def test_all_null_column(self, ray_session):
        import ray.data as rd

        tbl = pa.table({"x": pa.array([None, None], pa.int64())})
        prof = _prof_dict(profile_table(rd.from_arrow(tbl)))
        assert prof["x"]["n_nulls"] == 2 and prof["x"]["n_rows"] == 2
        assert prof["x"]["min"] is None and prof["x"]["n_distinct"] == 0.0

    def test_column_selection_and_unknown(self, ray_session):
        import ray.data as rd

        ds = rd.read_parquet("/root/testdata/sf0.001/orders.parquet")
        out = profile_table(ds, columns=["o_orderstatus"])
        assert out.num_rows == 1 and out["column"][0].as_py() == "o_orderstatus"
        with pytest.raises(ValueError, match="unknown columns"):
            profile_table(ds, columns=["nope"])

    def test_timestamp_column(self, ray_session):
        import ray.data as rd

        path = "/root/testdata/sf0.001/events.parquet"
        prof = _prof_dict(profile_table(rd.read_parquet(path),
                                        columns=["ts"]))
        lo, hi = duckdb.sql(
            f"SELECT min(ts), max(ts) FROM read_parquet('{path}')"
        ).fetchone()
        assert prof["ts"]["min"] == str(lo) and prof["ts"]["max"] == str(hi)
        assert prof["ts"]["mean"] is None


class TestDirtyColumns:
    def test_date32_and_uint64_survive(self, ray_session):
        import datetime

        import ray.data as rd

        tbl = pa.table({
            "d": pa.array([datetime.date(2026, 1, 1),
                           datetime.date(2026, 3, 5), None],
                          pa.date32()),
            "u": pa.array([2**63 + 5, 1, 2], pa.uint64()),
        })
        prof = _prof_dict(profile_table(rd.from_arrow(tbl)))
        assert prof["d"]["n_nulls"] == 1
        assert prof["d"]["min"] == "2026-01-01"
        assert prof["d"]["n_distinct"] == 2.0
        # uint64 above int64 max: distinct falls back to the generic
        # hash, mean is reported NULL instead of crashing
        assert prof["u"]["n_distinct"] == 3.0
        assert prof["u"]["max"] == str(2**63 + 5)
        assert prof["u"]["mean"] is None

    def test_nan_inf_float_column(self, ray_session):
        import ray.data as rd

        tbl = pa.table({"x": pa.array(
            [1.0, float("nan"), float("inf"), 3.0], pa.float64())})
        prof = _prof_dict(profile_table(rd.from_arrow(tbl)
                                        .repartition(2)))
        # mean over FINITE values only: (1+3)/2
        assert prof["x"]["mean"] == 2.0
        assert prof["x"]["n_rows"] == 4 and prof["x"]["n_nulls"] == 0

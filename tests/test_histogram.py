"""column_histogram (DuckDB-exact counts, range/null accounting) and
psi_drift (identity zero, planted shift, smoothing)."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from ocr_ray.functions.histogram import column_histogram, psi_drift


class TestColumnHistogram:
    def test_counts_match_duckdb(self, ray_session):
        import ray.data as rd

        path = "/root/testdata/sf0.001/orders.parquet"
        bins = 20
        h = column_histogram(rd.read_parquet(path), "o_totalprice",
                             bins=bins)
        lo, hi = h["lo"], h["hi"]
        w = (hi - lo) / bins
        want = duckdb.sql(f"""
            SELECT least(CAST(floor((o_totalprice - {lo!r}) / {w!r})
                         AS BIGINT), {bins - 1}) AS bin,
                   count(*)::BIGINT AS n
            FROM read_parquet('{path}')
            WHERE o_totalprice >= {lo!r} AND o_totalprice <= {hi!r}
            GROUP BY 1 ORDER BY 1
        """).fetchall()
        got = {r["bin"]: r["n"] for r in h["table"].to_pylist()}
        for b, n in want:
            assert got[b] == n, b
        assert sum(got.values()) == sum(n for _, n in want)
        assert h["n_below"] == 0 and h["n_above"] == 0

    def test_range_and_null_accounting(self, ray_session):
        import ray.data as rd

        tbl = pa.table({"x": pa.array(
            [-5.0, 0.0, 2.5, 5.0, 99.0, None], pa.float64())})
        h = column_histogram(rd.from_arrow(tbl).repartition(3), "x",
                             bins=2, lo=0.0, hi=5.0)
        assert h["n_below"] == 1 and h["n_above"] == 1
        assert h["n_null"] == 1
        # 0.0 and 2.5 -> bins 0 and 1; hi=5.0 lands in the LAST bin
        assert h["table"]["n"].to_pylist() == [1, 2]

    def test_degenerate_single_value(self, ray_session):
        import ray.data as rd

        tbl = pa.table({"x": pa.array([7.0] * 5, pa.float64())})
        h = column_histogram(rd.from_arrow(tbl), "x", bins=4)
        assert sum(h["table"]["n"].to_pylist()) == 5

    def test_all_null_refused(self, ray_session):
        import ray.data as rd

        tbl = pa.table({"x": pa.array([None, None], pa.float64())})
        with pytest.raises(ValueError, match="no finite non-null"):
            column_histogram(rd.from_arrow(tbl), "x")

    def test_layout_independent(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(5)
        tbl = pa.table({"x": pa.array(rng.normal(0, 1, 20_000))})
        a = column_histogram(rd.from_arrow(tbl).repartition(1), "x", 16)
        b = column_histogram(rd.from_arrow(tbl).repartition(9), "x", 16)
        assert a["table"].to_pydict() == b["table"].to_pydict()


class TestPsiDrift:
    def test_identical_distributions_zero(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(1)
        x = rng.normal(0, 1, 10_000)
        a = rd.from_arrow(pa.table({"x": pa.array(x)}))
        b = rd.from_arrow(pa.table({"x": pa.array(x)})).repartition(5)
        r = psi_drift(a, b, "x")
        assert r["psi"] == 0.0 and r["verdict"] == "stable"
        assert r["n_a"] == r["n_b"] == 10_000

    def test_planted_shift_flags_major(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(2)
        a = rd.from_arrow(pa.table({"x": pa.array(
            rng.normal(0, 1, 8_000))}))
        b = rd.from_arrow(pa.table({"x": pa.array(
            rng.normal(3, 1, 8_000))}))
        r = psi_drift(a, b, "x")
        assert r["verdict"] == "major" and r["psi"] > 0.25
        # shared edges: no out-of-range mass by construction
        hist = r["histogram"]
        assert int(sum(hist["n_a"].to_pylist())) == 8_000
        assert int(sum(hist["n_b"].to_pylist())) == 8_000

    def test_small_shift_is_not_major(self, ray_session):
        import ray.data as rd

        rng = np.random.default_rng(3)
        a = rd.from_arrow(pa.table({"x": pa.array(
            rng.normal(0, 1, 8_000))}))
        b = rd.from_arrow(pa.table({"x": pa.array(
            rng.normal(0.05, 1, 8_000))}))
        r = psi_drift(a, b, "x")
        assert r["psi"] < 0.1


class TestDirtyData:
    def test_nan_inf_counted_not_binned(self, ray_session):
        import ray.data as rd

        tbl = pa.table({"x": pa.array(
            [1.0, float("nan"), float("-inf"), 2.0, 5.0],
            pa.float64())})
        h = column_histogram(rd.from_arrow(tbl).repartition(2), "x",
                             bins=2)
        # bounds discovered over FINITE values: [1, 5]
        assert h["lo"] == 1.0 and h["hi"] == 5.0
        assert h["n_nonfinite"] == 2
        assert sum(h["table"]["n"].to_pylist()) == 3

    def test_inverted_bounds_refused(self, ray_session):
        import ray.data as rd

        tbl = pa.table({"x": pa.array([1.0, 2.0], pa.float64())})
        with pytest.raises(ValueError, match="swapped"):
            column_histogram(rd.from_arrow(tbl), "x", lo=100, hi=5)

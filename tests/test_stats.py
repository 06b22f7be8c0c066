"""Exact distributed correlation matrix: HUGEINT SQL parity, known
planted correlations, layout independence."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


class TestCorrelation:
    def test_sf0001_matches_hugeint_oracle(self, ray_session):
        import duckdb

        from ocr_ray.functions.stats import (
            correlation_matrix,
            correlation_matrix_sql,
        )

        sf = "/root/testdata/sf0.001"
        got = correlation_matrix(sf).to_pandas() \
            .sort_values(["col_a", "col_b"]).reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                    f"'{sf}/lineitem.parquet'")
        want = con.execute(correlation_matrix_sql()
                           + " ORDER BY col_a, col_b").fetchdf() \
            .reset_index(drop=True)
        assert list(got["col_a"]) == list(want["col_a"])
        assert list(got["col_b"]) == list(want["col_b"])
        assert list(got["corr"]) == list(want["corr"])
        assert any(abs(c) > 0.001 for c in got["corr"])  # non-vacuous

    def test_planted_correlations(self, ray_session, tmp_path):
        from ocr_ray.functions.stats import correlation_matrix

        sf = str(tmp_path / "sf")
        os.makedirs(sf, exist_ok=True)
        rng = np.random.RandomState(8)
        x = rng.rand(2000) * 10
        tbl = pa.table({
            "a": pa.array(x, pa.float64()),
            "b": pa.array(2.0 * x + 1.0, pa.float64()),   # corr = 1
            "c": pa.array(-x, pa.float64()),              # corr = -1
            "d": pa.array(rng.rand(2000) * 10, pa.float64()),
        })
        pq.write_table(tbl, f"{sf}/t.parquet", row_group_size=256)
        out = {(r["col_a"], r["col_b"]): r["corr"]
               for r in correlation_matrix(
                   sf, table="t", cols=("a", "b", "c", "d")).to_pylist()}
        assert out[("a", "b")] > 0.9999
        assert out[("a", "c")] < -0.9999
        assert abs(out[("a", "d")]) < 0.1

    def test_layout_independent(self, ray_session, tmp_path):
        """Bit-identical output across different row-group layouts —
        the integer-exact accumulation claim."""
        from ocr_ray.functions.stats import correlation_matrix

        rng = np.random.RandomState(3)
        tbl = pa.table({
            "a": pa.array(rng.rand(3000), pa.float64()),
            "b": pa.array(rng.rand(3000), pa.float64()),
        })
        outs = []
        for rg in (64, 1024):
            sf = str(tmp_path / f"sf{rg}")
            os.makedirs(sf, exist_ok=True)
            pq.write_table(tbl, f"{sf}/t.parquet", row_group_size=rg)
            outs.append(correlation_matrix(
                sf, table="t", cols=("a", "b")).to_pylist())
        assert outs[0] == outs[1]

    def test_constant_column_reads_zero(self, ray_session, tmp_path):
        from ocr_ray.functions.stats import correlation_matrix

        sf = str(tmp_path / "sf")
        os.makedirs(sf, exist_ok=True)
        pq.write_table(pa.table({
            "a": pa.array([1.0, 2.0, 3.0], pa.float64()),
            "k": pa.array([5.0, 5.0, 5.0], pa.float64())}),
            f"{sf}/t.parquet")
        out = correlation_matrix(sf, table="t",
                                 cols=("a", "k")).to_pylist()
        assert out[0]["corr"] == 0.0      # zero variance -> defined 0


class TestOls:
    def test_sf0001_matches_hugeint_oracle(self, ray_session):
        import duckdb

        from ocr_ray.functions.stats import ols_fit, ols_fit_sql

        sf = "/root/testdata/sf0.001"
        got = ols_fit(sf).to_pylist()[0]
        con = duckdb.connect()
        con.execute(f"CREATE VIEW lineitem AS SELECT * FROM "
                    f"'{sf}/lineitem.parquet'")
        want = con.execute(ols_fit_sql()).fetchdf().iloc[0]
        assert got["slope"] == want["slope"]
        assert got["intercept"] == want["intercept"]
        assert got["r2"] == want["r2"]

    def test_planted_line(self, ray_session, tmp_path):
        from ocr_ray.functions.stats import ols_fit

        sf = str(tmp_path / "sf")
        os.makedirs(sf, exist_ok=True)
        rng = np.random.RandomState(12)
        x = rng.rand(5000) * 100
        y = 3.0 * x + 7.0
        pq.write_table(pa.table({
            "x": pa.array(x, pa.float64()),
            "y": pa.array(y, pa.float64())}), f"{sf}/t.parquet")
        got = ols_fit(sf, table="t", x_col="x", y_col="y").to_pylist()[0]
        assert abs(got["slope"] - 3.0) < 1e-3
        assert abs(got["intercept"] - 7.0) < 0.05
        assert got["r2"] > 0.9999


class TestRiCheck:
    def test_sf0001_matches_duckdb(self, ray_session):
        import duckdb

        from ocr_ray.functions.stats import ri_check, ri_check_sql

        sf = "/root/testdata/sf0.001"
        got = ri_check(sf).to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        for t in ("lineitem", "orders", "part", "supplier", "customer",
                  "nation", "region"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"'{sf}/{t}.parquet'")
        want = con.execute(ri_check_sql()).fetchdf()
        assert list(got["fact_table"]) == list(want["fact_table"])
        assert list(got["n_orphan_keys"]) == list(want["n_orphan_keys"])

    def test_planted_orphans_detected(self, ray_session, tmp_path):
        from ocr_ray.functions.stats import ri_check

        sf = str(tmp_path / "sf")
        os.makedirs(sf, exist_ok=True)
        pq.write_table(pa.table({
            "l_orderkey": pa.array([1, 1, 2, 99, 98], pa.int64())}),
            f"{sf}/lineitem.parquet")
        pq.write_table(pa.table({
            "o_orderkey": pa.array([1, 2, 3], pa.int64())}),
            f"{sf}/orders.parquet")
        got = ri_check(sf, edges=(
            ("lineitem", "l_orderkey", "orders", "o_orderkey"),)) \
            .to_pylist()
        assert got[0]["n_orphan_keys"] == 2       # 98 and 99


class TestOlsMulti:
    def test_matches_numpy_lstsq(self, ray_session, tmp_path):
        from ocr_ray.functions.stats import ols_multi

        sf = str(tmp_path / "sf")
        os.makedirs(sf, exist_ok=True)
        rng = np.random.RandomState(9)
        x1 = rng.rand(4000) * 10
        x2 = rng.rand(4000) * 5
        y = 2.0 * x1 - 1.5 * x2 + 4.0 + rng.randn(4000) * 0.01
        pq.write_table(pa.table({
            "x1": pa.array(x1, pa.float64()),
            "x2": pa.array(x2, pa.float64()),
            "y": pa.array(y, pa.float64())}), f"{sf}/t.parquet")
        out = {r["term"]: r["coef"] for r in ols_multi(
            sf, table="t", x_cols=("x1", "x2"),
            y_col="y").to_pylist()}
        # independent oracle on the SAME quantized values
        x1q = np.floor(x1 * 100 + 0.5) / 100
        x2q = np.floor(x2 * 100 + 0.5) / 100
        yq = np.floor(y * 100 + 0.5) / 100
        X = np.column_stack([np.ones_like(x1q), x1q, x2q])
        beta = np.linalg.lstsq(X, yq, rcond=None)[0]
        assert abs(out["intercept"] - beta[0]) < 1e-3
        assert abs(out["x1"] - beta[1]) < 1e-4
        assert abs(out["x2"] - beta[2]) < 1e-4
        assert out["r2"] > 0.999

    def test_layout_independent(self, ray_session, tmp_path):
        from ocr_ray.functions.stats import ols_multi

        rng = np.random.RandomState(4)
        tbl = pa.table({
            "a": pa.array(rng.rand(2000), pa.float64()),
            "b": pa.array(rng.rand(2000), pa.float64()),
            "y": pa.array(rng.rand(2000), pa.float64())})
        outs = []
        for rg in (64, 1024):
            sf = str(tmp_path / f"sf{rg}")
            os.makedirs(sf, exist_ok=True)
            pq.write_table(tbl, f"{sf}/t.parquet", row_group_size=rg)
            outs.append(ols_multi(sf, table="t", x_cols=("a", "b"),
                                  y_col="y").to_pylist())
        assert outs[0] == outs[1]


class TestValueAnomalies:
    def test_matches_sql_on_corpus(self, ray_session):
        import duckdb

        from ocr_ray.functions.stats import (
            VALUE_ANOMALIES_SQL,
            value_anomalies,
        )

        sf = "/root/testdata/sf0.001"
        got = value_anomalies(sf).to_pandas().reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{sf}/events.parquet'")
        want = con.execute(VALUE_ANOMALIES_SQL).fetchdf()
        assert len(got) == len(want)
        assert list(got["event_id"]) == list(want["event_id"])
        assert list(got["event_type"]) == list(want["event_type"])

    def test_planted_outlier_detected(self, ray_session, tmp_path):
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from ocr_ray.functions.stats import value_anomalies

        rng = np.random.default_rng(2)
        n = 2000
        vals = rng.normal(100.0, 5.0, n).tolist() + [500.0, -300.0]
        t = pa.table({
            "event_id": pa.array(range(n + 2), pa.int64()),
            "event_type": pa.array(["view"] * (n + 2), pa.string()),
            "value": pa.array(vals, pa.float64()),
            "user_id": pa.array([1] * (n + 2), pa.int64()),
            "ts": pa.array([0] * (n + 2), pa.int64()),
            "props": pa.array(["{}"] * (n + 2), pa.string())})
        t = t.set_column(t.schema.get_field_index("ts"), "ts",
                         pc.cast(t["ts"], pa.timestamp("us")))
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(t, d / "events.parquet")
        got = value_anomalies(str(d)).to_pandas()
        ids = set(got["event_id"])
        assert n in ids and (n + 1) in ids      # both planted outliers
        # gaussian tail: ~0.3% false positives at z=3 on 2000 draws
        assert len(got) <= 2 + 25

    def test_null_values_ignored(self, ray_session, tmp_path):
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        from ocr_ray.functions.stats import value_anomalies

        t = pa.table({
            "event_id": pa.array([0, 1, 2], pa.int64()),
            "event_type": pa.array(["a"] * 3, pa.string()),
            "value": pa.array([1.0, None, 1.0], pa.float64()),
            "user_id": pa.array([1] * 3, pa.int64()),
            "ts": pa.array([0] * 3, pa.int64()),
            "props": pa.array(["{}"] * 3, pa.string())})
        t = t.set_column(t.schema.get_field_index("ts"), "ts",
                         pc.cast(t["ts"], pa.timestamp("us")))
        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(t, d / "events.parquet")
        got = value_anomalies(str(d)).to_pandas()
        assert len(got) == 0                    # zero variance, no nulls

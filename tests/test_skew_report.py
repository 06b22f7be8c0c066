"""grouped_approx_distinct_hll and key_skew_report (sketches.py)."""

import numpy as np
import pyarrow as pa
import pytest


class TestGroupedHLL:
    def test_error_within_bound_per_group(self, ray_session):
        import ray.data as rd

        from ocr_ray.functions.sketches import grouped_approx_distinct_hll

        rng = np.random.default_rng(4)
        groups = ["a"] * 20000 + ["b"] * 20000 + ["c"] * 100
        # a: 5000 distinct, b: 200 distinct, c: 100 distinct
        vals = ([f"a{v}" for v in rng.integers(0, 5000, 20000)]
                + [f"b{v}" for v in rng.integers(0, 200, 20000)]
                + [f"c{v}" for v in range(100)])
        ds = rd.from_arrow(pa.table({"g": groups, "v": vals})) \
            .repartition(8)
        out = grouped_approx_distinct_hll(ds, "g", "v").to_pandas()
        assert list(out["g"]) == ["a", "b", "c"]
        exact = {"a": len(set(vals[:20000])), "b": len(set(vals[20000:40000])),
                 "c": 100}
        for _, r in out.iterrows():
            rel = abs(r["approx_distinct"] - exact[r["g"]]) / exact[r["g"]]
            assert rel < 0.08, (r["g"], r["approx_distinct"], exact[r["g"]])

    def test_layout_and_order_independent(self, ray_session):
        import ray.data as rd

        from ocr_ray.functions.sketches import grouped_approx_distinct_hll

        t = pa.table({"g": ["x", "y"] * 500,
                      "v": [str(i % 37) for i in range(1000)]})
        a = grouped_approx_distinct_hll(
            rd.from_arrow(t).repartition(2), "g", "v")
        b = grouped_approx_distinct_hll(
            rd.from_arrow(t).repartition(13), "g", "v")
        assert a.equals(b)

    def test_null_values_skipped(self, ray_session):
        import ray.data as rd

        from ocr_ray.functions.sketches import grouped_approx_distinct_hll

        t = pa.table({"g": ["x"] * 4,
                      "v": pa.array(["a", None, "b", None], pa.string())})
        out = grouped_approx_distinct_hll(rd.from_arrow(t), "g", "v") \
            .to_pandas()
        assert abs(out["approx_distinct"][0] - 2) < 0.5


class TestKeySkewReport:
    def test_planted_skew_detected(self, ray_session):
        import ray.data as rd

        from ocr_ray.functions.sketches import key_skew_report

        n = 50_000
        keys = np.where(np.arange(n) % 10 < 9, 7,
                        np.arange(n) % 1000).astype(np.int64)
        ds = rd.from_arrow(pa.table({"k": keys})).repartition(8)
        rep = key_skew_report(ds, "k")
        assert rep["n_rows"] == n
        hot = rep["hot_keys"].to_pandas()
        assert hot.iloc[0]["value"] == "7"
        # exact count of the planted hot key
        assert hot.iloc[0]["n"] == int((keys == 7).sum())
        assert 0.89 < rep["max_share"] < 0.91
        assert rep["recommended_salt"] >= 2

    def test_uniform_keys_report_no_hot_keys(self, ray_session):
        import ray.data as rd

        from ocr_ray.functions.sketches import key_skew_report

        keys = (np.arange(40_000) % 4000).astype(np.int64)
        ds = rd.from_arrow(pa.table({"k": keys})).repartition(4)
        rep = key_skew_report(ds, "k")
        assert rep["hot_keys"].num_rows == 0
        assert rep["recommended_salt"] == 1
        rel = abs(rep["approx_distinct"] - 4000) / 4000
        assert rel < 0.08

    def test_guarantee_every_key_above_support(self, ray_session):
        """MG guarantee: every key with share > 1/(k+1) must appear."""
        import ray.data as rd

        from ocr_ray.functions.sketches import key_skew_report

        # three keys at 30/20/10%, the rest uniform noise
        n = 30_000
        rng = np.random.default_rng(8)
        keys = np.concatenate([
            np.full(9000, 100001), np.full(6000, 100002),
            np.full(3000, 100003), rng.integers(0, 5000, 12000)])
        ds = rd.from_arrow(pa.table({"k": keys})).repartition(6)
        rep = key_skew_report(ds, "k", k=16, hot_share=0.05)
        hot = rep["hot_keys"].to_pandas()
        got = dict(zip(hot["value"], hot["n"]))
        assert got.get("100001") == 9000
        assert got.get("100002") == 6000
        assert got.get("100003") == 3000

    def test_empty_dataset(self, ray_session):
        import ray.data as rd

        from ocr_ray.functions.sketches import key_skew_report

        ds = rd.from_arrow(pa.table({"k": pa.array([], pa.int64())}))
        rep = key_skew_report(ds, "k")
        assert rep["n_rows"] == 0
        assert rep["recommended_salt"] == 1

    def test_corpus_smoke(self, ray_session):
        import ray.data as rd

        from ocr_ray.functions.sketches import key_skew_report

        ds = rd.read_parquet("/root/testdata/sf0.001/events.parquet",
                             columns=["event_type"])
        rep = key_skew_report(ds, "event_type", hot_share=0.01)
        # few event types -> all of them are "hot"; counts sum to n
        assert rep["hot_keys"].num_rows >= 3
        assert int(rep["hot_keys"].to_pandas()["n"].sum()) == rep["n_rows"]

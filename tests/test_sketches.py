"""KMV sketch accuracy/merge properties and pathsafe table-driven cases
(reference style: tests_app/test_utils.py:4-22)."""

import numpy as np
import pytest

from ocr_ray.functions.sketches import kmv_estimate, kmv_merge, kmv_sketch
from ocr_ray.kernels.pathsafe import safe_name


class TestKMV:
    def test_exact_below_k(self):
        sk = kmv_sketch(range(100), k=1024)
        assert kmv_estimate(sk, 1024) == 100.0

    def test_estimate_within_error(self):
        n = 50_000
        sk = kmv_sketch(range(n), k=1024)
        est = kmv_estimate(sk, 1024)
        assert abs(est - n) / n < 0.15  # ~3 sigma of 1/sqrt(k-1)

    def test_merge_equals_union(self):
        a = kmv_sketch(range(0, 30_000), k=512)
        b = kmv_sketch(range(20_000, 50_000), k=512)
        merged = kmv_merge([a, b], k=512)
        whole = kmv_sketch(range(50_000), k=512)
        assert (merged == whole).all()

    def test_deterministic(self):
        assert (kmv_sketch(["a", "b", "c"]) == kmv_sketch(["c", "b", "a"])).all()

    def test_distributed_matches_exact_order_of_magnitude(self, ray_session):
        import ray.data as rd

        from ocr_ray.functions.sketches import approx_distinct

        ds = rd.read_parquet("/root/testdata/sf0.001/lineitem.parquet",
                             columns=["l_orderkey"])
        est = approx_distinct(ds, "l_orderkey")["approx_distinct"][0].as_py()
        import duckdb
        exact = duckdb.sql(
            "SELECT count(DISTINCT l_orderkey) FROM "
            "read_parquet('/root/testdata/sf0.001/lineitem.parquet')"
        ).fetchone()[0]
        assert abs(est - exact) / exact < 0.15


class TestSafeName:
    @pytest.mark.parametrize("raw,expect", [
        ("simple.txt", "simple.txt"),
        ("spaţiu şi ţară.pdf", "spatiu_si_tara.pdf"),
        ("a/b\\c:d", "a_b_c_d"),
        ("..hidden..", "hidden"),
        ("weird  --  name", "weird_--_name"),
    ])
    def test_table(self, raw, expect):
        assert safe_name(raw) == expect

    def test_unsafe_falls_back_to_hash(self):
        out = safe_name("¤¥¦§")
        assert out.startswith("f-") and len(out) == 18
        assert out == safe_name("¤¥¦§")  # deterministic

    def test_reserved_name(self):
        assert safe_name("CON").startswith("f-")

    def test_truncation(self):
        assert len(safe_name("x" * 500)) == 120


class TestHeavyHitters:
    def test_mg_guarantee_on_skewed_stream(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from ocr_ray.functions.sketches import heavy_hitters

        # 1000 rows: 'hot' x400, 'warm' x200, tail of 400 distinct
        vals = (["hot"] * 400 + ["warm"] * 200
                + [f"tail{i}" for i in range(400)])
        # deterministic interleave so batches see mixed traffic
        vals = [vals[i] for i in sorted(range(len(vals)),
                                        key=lambda i: (i * 37) % 1000)]
        ds = rd.from_arrow(pa.table({"v": pa.array(vals, pa.string())}))
        out = heavy_hitters(ds, "v", k=9).to_pylist()
        got = {r["value"]: r["n"] for r in out}
        # every item above n/(k+1) = 100 MUST be found with EXACT counts
        assert got["hot"] == 400 and got["warm"] == 200
        # nothing at/below the support threshold sneaks in
        assert all(n > 100 for n in got.values())

    def test_mg_merge_bound(self):
        from ocr_ray.functions.sketches import mg_merge, mg_sketch

        a = mg_sketch(["x"] * 50 + ["y"] * 30 + list("abcdefgh"), k=4)
        b = mg_sketch(["x"] * 40 + ["z"] * 35 + list("ijklmnop"), k=4)
        m = mg_merge(a, b, k=4)
        assert len(m) <= 4
        assert "x" in m  # 90 of 171 rows: must survive any k>=2 summary


class TestCountMin:
    def test_never_underestimates_and_bounded(self):
        import collections

        from ocr_ray.functions.sketches import cm_estimate, cm_sketch

        # Zipf-ish corpus: heavy keys + a long tail
        vals = ([f"hot{i}" for i in range(5) for _ in range(200)]
                + [f"tail{i}" for i in range(3000)])
        truth = collections.Counter(vals)
        sk = cm_sketch(vals, width=2048, depth=4)
        n = len(vals)
        for q in list(truth)[:50] + ["absent"]:
            est = cm_estimate(sk, q)
            assert est >= truth.get(q, 0)
            # e/width * n bound (holds w.p. 1-e^-4; deterministic seeds
            # make this a fixed, reproducible check)
            assert est - truth.get(q, 0) <= np.e / 2048 * n + 1

    def test_merge_is_elementwise_sum(self):
        from ocr_ray.functions.sketches import cm_sketch

        a = ["x"] * 10 + ["y"] * 3
        b = ["y"] * 7 + ["z"]
        whole = cm_sketch(a + b, width=64, depth=3)
        assert (cm_sketch(a, 64, 3) + cm_sketch(b, 64, 3) == whole).all()

    def test_distributed_matches_exact_for_heavy_keys(self, ray_session):
        import duckdb

        import ray.data as rd

        from ocr_ray.functions.sketches import approx_counts

        path = "/root/testdata/sf0.001/orders.parquet"
        ds = rd.read_parquet(path, columns=["o_orderpriority"])
        qs = ["1-URGENT", "5-LOW", "no-such-priority"]
        got = {r["value"]: r["approx_n"]
               for r in approx_counts(ds, "o_orderpriority",
                                      qs).to_pylist()}
        exact = dict(duckdb.sql(
            f"SELECT o_orderpriority, count(*) FROM read_parquet('{path}') "
            "GROUP BY 1").fetchall())
        n = sum(exact.values())
        for q in qs:
            assert got[q] >= exact.get(q, 0)
            assert got[q] - exact.get(q, 0) <= np.e / 2048 * n + 1

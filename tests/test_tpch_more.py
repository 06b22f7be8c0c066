"""The ten TPC-H shapes added in round 5 (Q2, Q8, Q9, Q11, Q12, Q15,
Q16, Q17, Q19, Q20) vs DuckDB oracles written in the ORIGINAL
(correlated-subquery / HAVING / EXISTS) form, plus planted-semantics
tests for the tie, boundary, and exclusion legs."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq_
import pytest

SFS = ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]
TABLES = ("lineitem", "orders", "part", "supplier", "nation", "customer")


def _duck(sf):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sf}/{t}.parquet'")
    return con


def _cmp(got: pa.Table, want, float_cols=()):
    got = got.to_pandas().reset_index(drop=True)
    want = want.reset_index(drop=True)
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        if c in float_cols:
            assert list(got[c]) == pytest.approx(list(want[c]))
        else:
            assert list(got[c]) == list(want[c]), c


class TestQ2:
    @pytest.mark.parametrize("sf", SFS)
    def test_oracle(self, ray_session, sf):
        from ocr_ray.functions.tpch_more import (
            Q2_SQL,
            q2_min_balance_supplier,
        )

        got = q2_min_balance_supplier(sf)
        want = _duck(sf).execute(Q2_SQL).fetchdf()
        assert len(got) > 0
        _cmp(got, want)

    def test_min_ties_kept(self, ray_session, tmp_path):
        """Two suppliers tied at the minimum balance must BOTH appear
        (the correlated `= (SELECT min ...)` keeps every minimal row)."""
        d = tmp_path / "sf"
        d.mkdir()
        pq_.write_table(pa.table({
            "p_partkey": [1, 2], "p_name": ["a", "b"],
            "p_type": ["STANDARD", "OTHER"]}), d / "part.parquet")
        pq_.write_table(pa.table({
            "s_suppkey": [1, 2, 3],
            "s_name": ["S1", "S2", "S3"],
            "s_nationkey": [0, 0, 0],
            "s_acctbal": [5.0, 5.0, 1.0]}), d / "supplier.parquet")
        pq_.write_table(pa.table({
            "n_nationkey": [0], "n_name": ["X"]}), d / "nation.parquet")
        # part 1 shipped by s1 and s2 (tied min 5.0); s3 never ships it.
        # part 2 is the wrong type -> excluded entirely.
        pq_.write_table(pa.table({
            "l_partkey": [1, 1, 1, 2],
            "l_suppkey": [1, 2, 1, 3]}), d / "lineitem.parquet")

        from ocr_ray.functions.tpch_more import q2_min_balance_supplier

        got = q2_min_balance_supplier(str(d)).to_pandas()
        assert list(got["p_partkey"]) == [1, 1]
        assert list(got["s_name"]) == ["S1", "S2"]


class TestQ8:
    @pytest.mark.parametrize("sf", SFS)
    def test_oracle(self, ray_session, sf):
        from ocr_ray.functions.tpch_more import q8_market_share, q8_sql

        con = _duck(sf)
        first = con.execute(
            "SELECT min(n_name) FROM nation").fetchone()[0]
        got = q8_market_share(sf)
        want = con.execute(q8_sql(first)).fetchdf()
        assert len(got) > 0
        _cmp(got, want, float_cols=("mkt_share",))

    def test_share_exactness(self, ray_session, tmp_path):
        """num/den are exact cents ints; a nation with no revenue in a
        year reads share 0.0, not NaN-adjacent."""
        d = tmp_path / "sf"
        d.mkdir()
        ts = lambda y: np.datetime64(f"{y}-06-01", "us")
        pq_.write_table(pa.table({
            "n_nationkey": [0, 1], "n_name": ["AAA", "BBB"]}),
            d / "nation.parquet")
        pq_.write_table(pa.table({
            "s_suppkey": [1, 2], "s_nationkey": [0, 1]}),
            d / "supplier.parquet")
        li = pa.table({
            "l_suppkey": [1, 2, 2],
            "l_extendedprice": [100.0, 300.0, 50.0],
            "l_discount": [0.0, 0.0, 0.0],
            "l_shipdate": pa.array([ts(1995), ts(1995), ts(1996)],
                                   pa.timestamp("us"))})
        pq_.write_table(li, d / "lineitem.parquet")

        from ocr_ray.functions.tpch_more import q8_market_share

        got = q8_market_share(str(d)).to_pandas()  # target = AAA
        assert list(got["l_year"]) == [1995, 1996]
        assert list(got["mkt_share"]) == [0.25, 0.0]


class TestQ9:
    @pytest.mark.parametrize("sf", SFS)
    def test_oracle(self, ray_session, sf):
        from ocr_ray.functions.tpch_more import (
            Q9_SQL,
            q9_profit_by_nation_year,
        )

        got = q9_profit_by_nation_year(sf)
        want = _duck(sf).execute(Q9_SQL).fetchdf()
        assert len(got) > 0
        _cmp(got, want, float_cols=("profit",))


class TestQ11:
    @pytest.mark.parametrize("sf", SFS)
    def test_oracle(self, ray_session, sf):
        from ocr_ray.functions.tpch_more import (
            Q11_SQL,
            q11_important_brands,
        )

        got = q11_important_brands(sf)
        want = _duck(sf).execute(Q11_SQL).fetchdf()
        assert len(got) > 0
        _cmp(got, want, float_cols=("value",))

    def test_gate_is_strict_integer(self, ray_session, tmp_path):
        """A brand at EXACTLY the threshold fraction is excluded (the
        HAVING is a strict >, cross-multiplied in ints)."""
        d = tmp_path / "sf"
        d.mkdir()
        pq_.write_table(pa.table({
            "p_partkey": [1, 2], "p_brand": ["B1", "B2"]}),
            d / "part.parquet")
        # B1 value 10.00, B2 value 290.00; total 300.00.
        # With frac 1/30: threshold = 10.00 exactly -> B1 excluded.
        pq_.write_table(pa.table({
            "l_partkey": [1, 2],
            "l_extendedprice": [10.0, 290.0]}), d / "lineitem.parquet")

        from ocr_ray.functions.tpch_more import q11_important_brands

        got = q11_important_brands(str(d)).to_pandas()
        assert list(got["p_brand"]) == ["B2"]


class TestQ12:
    @pytest.mark.parametrize("sf", SFS)
    def test_oracle(self, ray_session, sf):
        from ocr_ray.functions.tpch_more import (
            Q12_SQL,
            q12_priority_counts,
        )

        got = q12_priority_counts(sf)
        want = _duck(sf).execute(Q12_SQL).fetchdf()
        assert len(got) > 0
        _cmp(got, want)


class TestQ15:
    @pytest.mark.parametrize("sf", SFS)
    def test_oracle(self, ray_session, sf):
        from ocr_ray.functions.tpch_more import Q15_SQL, q15_top_suppliers

        got = q15_top_suppliers(sf)
        want = _duck(sf).execute(Q15_SQL).fetchdf()
        assert len(got) > 0
        _cmp(got, want, float_cols=("total_revenue",))

    def test_max_ties_kept(self, ray_session, tmp_path):
        d = tmp_path / "sf"
        d.mkdir()
        ts = np.datetime64("1996-06-01", "us")
        pq_.write_table(pa.table({
            "s_suppkey": [1, 2, 3],
            "s_name": ["S1", "S2", "S3"]}), d / "supplier.parquet")
        li = pa.table({
            "l_suppkey": [1, 2, 3],
            "l_extendedprice": [100.0, 100.0, 50.0],
            "l_discount": [0.0, 0.0, 0.0],
            "l_shipdate": pa.array([ts] * 3, pa.timestamp("us"))})
        pq_.write_table(li, d / "lineitem.parquet")

        from ocr_ray.functions.tpch_more import q15_top_suppliers

        got = q15_top_suppliers(str(d)).to_pandas()
        assert list(got["s_suppkey"]) == [1, 2]


class TestQ16:
    @pytest.mark.parametrize("sf", SFS)
    def test_oracle(self, ray_session, sf):
        from ocr_ray.functions.tpch_more import (
            Q16_SQL,
            q16_supplier_counts,
        )

        got = q16_supplier_counts(sf)
        want = _duck(sf).execute(Q16_SQL).fetchdf()
        assert len(got) > 0
        _cmp(got, want)

    def test_exclusion_list(self, ray_session, tmp_path):
        """A supplier on the NOT-IN list never counts, even when it is
        the only shipper of a part."""
        d = tmp_path / "sf"
        d.mkdir()
        pq_.write_table(pa.table({
            "p_partkey": [1, 2], "p_brand": ["B1", "B1"],
            "p_size": [3, 4]}), d / "part.parquet")
        pq_.write_table(pa.table({
            "s_suppkey": [1, 2],
            "s_name": ["GoodSupplier", "BadSupplier0"]}),
            d / "supplier.parquet")
        pq_.write_table(pa.table({
            "l_partkey": [1, 1, 2],
            "l_suppkey": [1, 2, 2]}), d / "lineitem.parquet")

        from ocr_ray.functions.tpch_more import q16_supplier_counts

        got = q16_supplier_counts(str(d)).to_pandas()
        # part 1: only supplier 1 counts; part 2: no eligible supplier
        assert list(got["p_size"]) == [3]
        assert list(got["supplier_cnt"]) == [1]


class TestQ17:
    @pytest.mark.parametrize("sf", SFS)
    def test_oracle(self, ray_session, sf):
        from ocr_ray.functions.tpch_more import (
            Q17_SQL,
            q17_small_quantity_revenue,
        )

        got = q17_small_quantity_revenue(sf)
        want = _duck(sf).execute(Q17_SQL).fetchdf()
        _cmp(got, want, float_cols=("avg_yearly",))

    def test_boundary_is_strict(self, ray_session, tmp_path):
        """A quantity EXACTLY at 0.2*avg is excluded: with quantities
        (1, 4, 4, 4, 4, 4, 4) the avg is 25/7, 0.2*avg = 5/7 — and with
        (2, 10) avg is 6, 0.2*avg = 1.2... plant the exact-equality
        case: quantities (1, 9) -> avg 5, 0.2*avg = 1.0; qty 1 is NOT
        < 1.0 so nothing qualifies."""
        d = tmp_path / "sf"
        d.mkdir()
        pq_.write_table(pa.table({
            "p_partkey": [1], "p_brand": ["Brand#13"]}),
            d / "part.parquet")
        pq_.write_table(pa.table({
            "l_partkey": [1, 1],
            "l_quantity": [1.0, 9.0],
            "l_extendedprice": [100.0, 900.0]}), d / "lineitem.parquet")

        from ocr_ray.functions.tpch_more import q17_small_quantity_revenue

        got = q17_small_quantity_revenue(str(d)).to_pandas()
        assert list(got["n_lines"]) == [0]
        assert list(got["total_cents"]) == [0]


class TestQ19:
    @pytest.mark.parametrize("sf", SFS)
    def test_oracle(self, ray_session, sf):
        from ocr_ray.functions.tpch_more import (
            Q19_SQL,
            q19_disjunctive_revenue,
        )

        got = q19_disjunctive_revenue(sf)
        want = _duck(sf).execute(Q19_SQL).fetchdf()
        _cmp(got, want, float_cols=("revenue",))
        assert got["n_lines"][0].as_py() > 0


class TestQ20:
    @pytest.mark.parametrize("sf", SFS)
    def test_oracle(self, ray_session, sf):
        from ocr_ray.functions.tpch_more import (
            Q20_SQL,
            q20_dominant_suppliers,
        )

        got = q20_dominant_suppliers(sf)
        want = _duck(sf).execute(Q20_SQL).fetchdf()
        assert len(got) > 0
        _cmp(got, want)

    def test_gate_semantics(self, ray_session, tmp_path):
        """Sole shipper of a part IS dominant (2q > q); an exact 50/50
        split is NOT (2q == total, strict >); the year filter holds."""
        d = tmp_path / "sf"
        d.mkdir()
        ts97 = np.datetime64("1997-06-01", "us")
        ts96 = np.datetime64("1996-06-01", "us")
        pq_.write_table(pa.table({
            "p_partkey": [1, 2, 3],
            "p_name": ["big widget", "old widget", "red bolt"]}),
            d / "part.parquet")
        pq_.write_table(pa.table({
            "s_suppkey": [1, 2],
            "s_name": ["S1", "S2"]}), d / "supplier.parquet")
        li = pa.table({
            # part 1 in 1997: s1 ships 5, s2 ships 5 -> nobody dominant
            # part 2 in 1996 only: s1 sole shipper but wrong year
            # part 3 ('bolt', no kw): s2 sole shipper but wrong part
            "l_partkey": [1, 1, 2, 3],
            "l_suppkey": [1, 2, 1, 2],
            "l_quantity": [5.0, 5.0, 9.0, 9.0],
            "l_shipdate": pa.array([ts97, ts97, ts96, ts97],
                                   pa.timestamp("us"))})
        pq_.write_table(li, d / "lineitem.parquet")

        from ocr_ray.functions.tpch_more import q20_dominant_suppliers

        got = q20_dominant_suppliers(str(d)).to_pandas()
        assert len(got) == 0

        # tip part 1 to s1 6/4 -> s1 dominant
        li2 = li.set_column(2, "l_quantity",
                            pa.array([6.0, 4.0, 9.0, 9.0]))
        pq_.write_table(li2, d / "lineitem.parquet")
        got = q20_dominant_suppliers(str(d)).to_pandas()
        assert list(got["s_suppkey"]) == [1]

"""TPC-H Q21/Q22 shapes: double-existential self join collapsed to
per-order aggregates, and a scalar-subquery gate + NOT-EXISTS anti join.

The oracles are deliberately written in the ORIGINAL existential form
(EXISTS / NOT EXISTS correlated subqueries) so the per-order-aggregate
rewrite in the engine is verified against the naive semantics, not
against a SQL transliteration of itself."""

import duckdb
import pytest


def _duck(sf, tables):
    con = duckdb.connect()
    for t in tables:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{sf}/{t}.parquet'")
    return con


class TestQ21:
    @pytest.mark.parametrize("sf", ["/root/testdata/sf0.001",
                                    "/root/testdata/sf0.01"])
    def test_matches_existential_oracle(self, ray_session, sf):
        from ocr_ray.functions.relational import (
            Q21_SQL,
            q21_blamed_suppliers,
        )

        got = q21_blamed_suppliers(sf).to_pandas().reset_index(drop=True)
        want = _duck(sf, ("lineitem", "orders", "supplier")) \
            .execute(Q21_SQL).fetchdf()
        assert len(got) == len(want) > 0
        assert list(got["s_name"]) == list(want["s_name"])
        assert list(got["numwait"]) == list(want["numwait"])

    def test_single_supplier_orders_never_blamed(self, ray_session,
                                                 tmp_path):
        """An order with ONE (late) supplier must not count: the
        EXISTS(other supplier) leg.  And an order where TWO suppliers
        are late must not count either: the NOT EXISTS leg."""
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        d = tmp_path / "sf"
        d.mkdir()
        ts = lambda day: np.datetime64("1995-01-01", "us") + \
            np.timedelta64(day, "D").astype("timedelta64[us]")
        # o1: single supplier, late        -> not blamed (no co-supplier)
        # o2: s1 late, s2 on time          -> s1 blamed
        # o3: s1 late, s2 late             -> nobody blamed (two late)
        # o4: s2 late, s1 on time, status P -> filtered out by status
        li = pa.table({
            "l_orderkey": [1, 2, 2, 3, 3, 4, 4],
            "l_suppkey": [1, 1, 2, 1, 2, 2, 1],
            "l_shipdate": pa.array([ts(100), ts(100), ts(10), ts(100),
                                    ts(100), ts(100), ts(10)],
                                   pa.timestamp("us")),
        })
        orders = pa.table({
            "o_orderkey": [1, 2, 3, 4],
            "o_orderdate": pa.array([ts(0)] * 4, pa.timestamp("us")),
            "o_orderstatus": ["F", "F", "F", "P"],
        })
        sup = pa.table({"s_suppkey": [1, 2],
                        "s_name": ["Supplier#1", "Supplier#2"]})
        pq.write_table(li, d / "lineitem.parquet")
        pq.write_table(orders, d / "orders.parquet")
        pq.write_table(sup, d / "supplier.parquet")

        from ocr_ray.functions.relational import q21_blamed_suppliers

        got = q21_blamed_suppliers(str(d)).to_pandas()
        assert list(got["s_name"]) == ["Supplier#1"]
        assert list(got["numwait"]) == [1]


class TestQ22:
    @pytest.mark.parametrize("sf", ["/root/testdata/sf0.001",
                                    "/root/testdata/sf0.01"])
    def test_matches_existential_oracle(self, ray_session, sf):
        from ocr_ray.functions.relational import (
            Q22_SQL,
            q22_idle_rich_customers,
        )

        got = q22_idle_rich_customers(sf).to_pandas() \
            .reset_index(drop=True)
        want = _duck(sf, ("customer", "orders")).execute(Q22_SQL) \
            .fetchdf()
        assert len(got) == len(want) > 0
        assert list(got["cntrycode"]) == list(want["cntrycode"])
        assert list(got["numcust"]) == list(want["numcust"])
        assert list(got["totacctbal"]) == \
            pytest.approx(list(want["totacctbal"]))

    def test_gate_and_anti_join_semantics(self, ray_session, tmp_path):
        """Planted: a rich customer WITH a big order is excluded (anti
        join); a poor customer with no big order is excluded (gate);
        negative balances are excluded from the average but still
        gated."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        d = tmp_path / "sf"
        d.mkdir()
        # positive balances: 100, 300 -> avg 200; rich = {c2, c4?}
        cust = pa.table({
            "c_custkey": [1, 2, 3, 4],
            "c_nationkey": [7, 7, 8, 9],
            "c_acctbal": [100.0, 300.0, -50.0, 250.0],
        })
        # avg over positive = (100+300+250)/3 = 216.67 -> rich: c2, c4
        orders = pa.table({
            "o_custkey": [4],
            "o_totalprice": [400000.0],   # c4 has a big order -> excluded
        })
        pq.write_table(cust, d / "customer.parquet")
        pq.write_table(orders, d / "orders.parquet")

        from ocr_ray.functions.relational import q22_idle_rich_customers

        got = q22_idle_rich_customers(str(d)).to_pandas()
        assert list(got["cntrycode"]) == [7]
        assert list(got["numcust"]) == [1]
        assert list(got["totacctbal"]) == [300.0]

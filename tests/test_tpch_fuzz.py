"""Randomized DuckDB parity for the trickiest round-5 TPC-H shapes:
random tiny corpora exercise tie, boundary, exclusion and dominance
legs far more densely than the fixed testdata (quantities drawn from
{1..4} force frequent exact 0.2·avg and 50/50 boundaries)."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq_
import pytest


def _write_corpus(d, rng):
    n_parts = int(rng.integers(3, 9))
    n_supp = int(rng.integers(2, 6))
    n_li = int(rng.integers(10, 60))
    types = ["STANDARD", "OTHER"]
    brands = ["Brand#13", "Brand#21", "Brand#9"]
    part = pa.table({
        "p_partkey": np.arange(n_parts, dtype=np.int64),
        "p_name": [f"{'widget' if rng.random() < 0.5 else 'bolt'} {i}"
                   for i in range(n_parts)],
        "p_type": [types[int(rng.integers(0, 2))]
                   for _ in range(n_parts)],
        "p_brand": [brands[int(rng.integers(0, 3))]
                    for _ in range(n_parts)],
        "p_size": rng.integers(1, 30, n_parts).astype(np.int64),
        "p_retailprice": np.round(rng.uniform(1, 100, n_parts), 2),
    })
    # duplicate balances on purpose: min ties must be common
    bal_pool = np.round(rng.uniform(-50, 50, max(2, n_supp // 2)), 2)
    sup = pa.table({
        "s_suppkey": np.arange(n_supp, dtype=np.int64),
        "s_name": [f"Supplier#{i}{'0' if rng.random() < 0.3 else '1'}"
                   for i in range(n_supp)],
        "s_nationkey": rng.integers(0, 2, n_supp).astype(np.int64),
        "s_acctbal": bal_pool[rng.integers(0, len(bal_pool), n_supp)],
    })
    nat = pa.table({"n_nationkey": np.array([0, 1], np.int64),
                    "n_name": ["AAA", "BBB"]})
    day0 = np.datetime64("1996-01-01", "us")
    ship = day0 + rng.integers(0, 720, n_li) * np.timedelta64(
        86_400_000_000, "us")
    li = pa.table({
        "l_orderkey": rng.integers(0, 20, n_li).astype(np.int64),
        "l_partkey": rng.integers(0, n_parts, n_li).astype(np.int64),
        "l_suppkey": rng.integers(0, n_supp, n_li).astype(np.int64),
        "l_quantity": rng.integers(1, 5, n_li).astype(np.float64),
        "l_extendedprice": np.round(rng.uniform(1, 1000, n_li), 2),
        "l_discount": np.round(rng.uniform(0, 0.1, n_li), 2),
        "l_shipdate": pa.array(ship, pa.timestamp("us")),
    })
    pq_.write_table(part, d / "part.parquet")
    pq_.write_table(sup, d / "supplier.parquet")
    pq_.write_table(nat, d / "nation.parquet")
    pq_.write_table(li, d / "lineitem.parquet")


def _con(d):
    con = duckdb.connect()
    for t in ("part", "supplier", "nation", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"'{d}/{t}.parquet'")
    return con


@pytest.mark.parametrize("seed", range(12))
def test_q2_q17_q20_random_parity(ray_session, tmp_path, seed):
    from ocr_ray.functions.tpch_more import (
        Q2_SQL,
        Q17_SQL,
        Q20_SQL,
        q2_min_balance_supplier,
        q17_small_quantity_revenue,
        q20_dominant_suppliers,
    )

    rng = np.random.default_rng(1000 + seed)
    d = tmp_path / "sf"
    d.mkdir()
    _write_corpus(d, rng)
    con = _con(d)

    got = q2_min_balance_supplier(str(d)).to_pandas()
    want = con.execute(Q2_SQL).fetchdf()
    assert got.shape == want.shape
    for c in got.columns:
        assert list(got[c]) == list(want[c]), f"q2 {c} seed={seed}"

    got = q17_small_quantity_revenue(str(d)).to_pandas()
    want = con.execute(Q17_SQL).fetchdf()
    assert list(got["total_cents"]) == list(want["total_cents"]), \
        f"q17 seed={seed}"
    assert list(got["n_lines"]) == list(want["n_lines"])
    assert list(got["avg_yearly"]) == pytest.approx(
        list(want["avg_yearly"]))

    got = q20_dominant_suppliers(str(d)).to_pandas()
    want = con.execute(Q20_SQL).fetchdf()
    assert list(got["s_suppkey"]) == list(want["s_suppkey"]), \
        f"q20 seed={seed}"

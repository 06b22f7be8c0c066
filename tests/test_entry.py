"""Driver-contract conformance: entry(), queries() vs oracle_sql() via
DuckDB at sf0.001 (the full sf0.01 sweep runs in scripts/selfcheck.py)."""

import sys

import duckdb
import pandas as pd
import pytest

sys.path.insert(0, "/root/repo")

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()

# fast, shape-diverse subset for the per-commit gate
CHECKED = [
    "q1_pricing_summary", "q22_idle_rich_customers",
    "priority_price_quantiles",
    "event_funnel", "sessionize", "q2_min_balance_supplier",
    "exact_dedup_groups", "knn_bruteforce", "interval_overlap",
]


@pytest.fixture(scope="module")
def entry_mod(ray_session):
    import __ray_entry__ as e

    return e


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                  f"read_parquet('{SF}/{t}.parquet')")
    return c


def _to_pandas(res):
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def test_entry_runs(entry_mod):
    df = entry_mod.entry()
    assert len(df) > 0
    assert {"doc_id", "spans", "n_spans"} <= set(df.columns)


def test_every_oracle_key_has_query(entry_mod):
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    assert set(os_) <= set(qs)


@pytest.mark.parametrize("name", CHECKED)
def test_query_matches_oracle(entry_mod, con, name):
    ray_df = _canon(_to_pandas(entry_mod.queries()[name](SF)))
    sql_df = _canon(con.execute(entry_mod.oracle_sql()[name]).df())
    assert list(ray_df.columns) == list(sql_df.columns)
    assert len(ray_df) == len(sql_df)
    pd.testing.assert_frame_equal(ray_df, sql_df, check_dtype=False)


def test_rows_only_queries_run(entry_mod):
    qs, os_ = entry_mod.queries(), entry_mod.oracle_sql()
    for name in set(qs) - set(os_) - {"span_extraction", "keyword_hits_corpus"}:
        df = _to_pandas(qs[name](SF))
        assert len(df) >= 0, name

"""global_row_index: exactness vs SQL ROW_NUMBER, layout independence,
tie columns, skewed keys, and the dense-permutation invariant."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest


def _ds(t, parts):
    import ray.data as rd

    return rd.from_arrow(t).repartition(parts)


class TestGlobalRowIndex:
    def test_matches_sql_row_number(self, ray_session):
        from ocr_ray.functions.rowindex import (
            DOC_ROW_INDEX_SQL,
            doc_row_index,
        )

        sf = "/root/testdata/sf0.001"
        got = doc_row_index(sf).to_pandas() \
            .sort_values("row_idx").reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'{sf}/documents.parquet'")
        want = con.execute(DOC_ROW_INDEX_SQL + " ORDER BY row_idx") \
            .fetchdf()
        assert list(got["doc_id"]) == list(want["doc_id"])
        assert list(got["row_idx"]) == list(want["row_idx"])
        assert list(got["n_chars"]) == list(want["n_chars"])

    def test_dense_permutation_and_order(self, ray_session):
        from ocr_ray.functions.rowindex import global_row_index

        rng = np.random.default_rng(0)
        keys = rng.permutation(10_000).astype(np.int64)
        t = pa.table({"k": keys, "payload": keys * 3})
        out = global_row_index(_ds(t, 9), "k").to_pandas() \
            .sort_values("k").reset_index(drop=True)
        # rank of k in sorted order IS k here (keys are 0..n-1)
        assert (out["row_idx"].values == out["k"].values).all()
        assert (out["payload"].values == out["k"].values * 3).all()

    def test_layout_independent(self, ray_session):
        from ocr_ray.functions.rowindex import global_row_index

        rng = np.random.default_rng(1)
        keys = rng.integers(0, 1 << 40, 5000).astype(np.int64)
        keys = np.unique(keys)
        t = pa.table({"k": keys})
        a = global_row_index(_ds(t, 3), "k").to_pandas() \
            .sort_values("k").reset_index(drop=True)
        b = global_row_index(_ds(t, 17), "k").to_pandas() \
            .sort_values("k").reset_index(drop=True)
        assert (a["row_idx"].values == b["row_idx"].values).all()

    def test_tie_cols_break_equal_keys(self, ray_session):
        from ocr_ray.functions.rowindex import global_row_index

        t = pa.table({"k": pa.array([5, 5, 5, 1, 1, 9], pa.int64()),
                      "sub": pa.array([2, 0, 1, 1, 0, 0], pa.int64())})
        out = global_row_index(_ds(t, 3), "k", tie_cols=("sub",)) \
            .to_pandas().sort_values("row_idx").reset_index(drop=True)
        assert list(zip(out["k"], out["sub"])) == [
            (1, 0), (1, 1), (5, 0), (5, 1), (5, 2), (9, 0)]
        assert list(out["row_idx"]) == [0, 1, 2, 3, 4, 5]

    def test_skewed_keys_stay_exact(self, ray_session):
        """90% of rows share one key: buckets collapse but ranks of
        OTHER keys remain exact around the hot run."""
        from ocr_ray.functions.rowindex import global_row_index

        n = 20_000
        keys = np.where(np.arange(n) % 10 < 9, 500_000,
                        np.arange(n)).astype(np.int64)
        sub = np.arange(n).astype(np.int64)
        t = pa.table({"k": keys, "sub": sub})
        out = global_row_index(_ds(t, 8), "k", tie_cols=("sub",)) \
            .to_pandas().sort_values(["k", "sub"]).reset_index(drop=True)
        want = np.lexsort((sub, keys))
        assert (out["row_idx"].values == np.arange(n)).all()
        # spot-check: the row AFTER the hot run is the max original key
        assert out.iloc[-1]["k"] == keys.max()

    def test_non_integer_key_refused(self, ray_session):
        from ocr_ray.functions.rowindex import global_row_index

        t = pa.table({"k": pa.array(["a", "b"], pa.string())})
        with pytest.raises(Exception):
            global_row_index(_ds(t, 1), "k").to_pandas()

    def test_empty_dataset(self, ray_session):
        from ocr_ray.functions.rowindex import global_row_index

        t = pa.table({"k": pa.array([], pa.int64())})
        out = global_row_index(_ds(t, 1), "k")
        assert out.count() == 0
        # (to_pandas on an empty Dataset drops columns — a Ray quirk —
        # so assert the contract on the Dataset schema)
        assert out.schema().names == ["k", "row_idx"]


class TestRankDerivatives:
    def test_percent_rank_matches_sql(self, ray_session):
        from ocr_ray.functions.rowindex import (
            ORDER_PRICE_PERCENT_RANK_SQL,
            order_price_percent_rank,
        )

        sf = "/root/testdata/sf0.001"
        got = order_price_percent_rank(sf).to_pandas() \
            .sort_values("o_orderkey").reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                    f"'{sf}/orders.parquet'")
        want = con.execute(ORDER_PRICE_PERCENT_RANK_SQL +
                           " ORDER BY o_orderkey").fetchdf()
        assert list(got["o_orderkey"]) == list(want["o_orderkey"])
        assert list(got["pct_rank"]) == list(want["pct_rank"])

    def test_ntile_matches_sql(self, ray_session):
        from ocr_ray.functions.rowindex import (
            ORDERS_NTILE_SQL,
            orders_ntile,
        )

        sf = "/root/testdata/sf0.001"
        got = orders_ntile(sf).to_pandas() \
            .sort_values("o_orderkey").reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                    f"'{sf}/orders.parquet'")
        want = con.execute(ORDERS_NTILE_SQL + " ORDER BY o_orderkey") \
            .fetchdf()
        assert list(got["o_orderkey"]) == list(want["o_orderkey"])
        assert list(got["tile"]) == list(want["tile"])
        # equi-depth: tile sizes differ by at most 1
        sizes = got.groupby("tile").size()
        assert sizes.max() - sizes.min() <= 1

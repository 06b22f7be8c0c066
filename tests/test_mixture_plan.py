"""Mixture token-budget planning: DuckDB byte-parity, temperature
semantics (tau=1 proportional, tau=0 equal), budget conservation."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq


def _write_docs(path, rows):
    os.makedirs(path, exist_ok=True)
    pq.write_table(pa.Table.from_pylist(
        [{"doc_id": i, "text": t, "source": s}
         for i, (s, t) in enumerate(rows)]),
        f"{path}/documents.parquet")


class TestParity:
    def test_sf0001_byte_parity(self, ray_session):
        import duckdb

        from ocr_ray.functions.corpus_prep import (
            mixture_token_plan,
            mixture_token_plan_sql,
        )

        sf = "/root/testdata/sf0.001"
        got = mixture_token_plan(sf, budget_tokens=500_000,
                                 tau=0.7).to_pandas()
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'{sf}/documents.parquet'")
        want = con.execute(
            mixture_token_plan_sql(500_000, 0.7)).fetchdf()
        assert list(got["source"]) == list(want["source"])
        assert list(got["n_tokens"]) == list(want["n_tokens"])
        assert list(got["weight"]) == list(want["weight"])
        assert list(got["target_tokens"]) == list(want["target_tokens"])
        assert list(got["epochs"]) == list(want["epochs"])
        assert got["n_tokens"].sum() > 0


class TestSemantics:
    def test_tau_one_is_proportional(self, ray_session, tmp_path):
        from ocr_ray.functions.corpus_prep import mixture_token_plan

        sf = str(tmp_path / "sf")
        _write_docs(sf, [("big", "w " * 300), ("small", "w " * 100)])
        out = mixture_token_plan(sf, budget_tokens=4000,
                                 tau=1.0).to_pandas().set_index("source")
        assert out.loc["big", "target_tokens"] == 3000
        assert out.loc["small", "target_tokens"] == 1000
        assert out.loc["big", "epochs"] == 10.0

    def test_tau_zero_is_equal_split(self, ray_session, tmp_path):
        from ocr_ray.functions.corpus_prep import mixture_token_plan

        sf = str(tmp_path / "sf")
        _write_docs(sf, [("big", "w " * 900), ("small", "w " * 10)])
        out = mixture_token_plan(sf, budget_tokens=1000,
                                 tau=0.0).to_pandas().set_index("source")
        assert out.loc["big", "target_tokens"] == 500
        assert out.loc["small", "target_tokens"] == 500
        assert out.loc["small", "epochs"] == 50.0  # over-epoch warning

    def test_budget_conserved_within_rounding(self, ray_session):
        from ocr_ray.functions.corpus_prep import mixture_token_plan

        out = mixture_token_plan("/root/testdata/sf0.001",
                                 budget_tokens=123_457,
                                 tau=0.5).to_pandas()
        n_sources = len(out)
        assert abs(out["target_tokens"].sum() - 123_457) <= n_sources
        assert abs(out["weight"].sum() - 1.0) < 1e-4


class TestZeroTokenSource:
    def test_zero_token_source_parity(self, ray_session, tmp_path):
        """A source of only-whitespace docs: engine and SQL both read
        epochs 0.0 (review fix: the mirror divided by zero)."""
        import duckdb

        from ocr_ray.functions.corpus_prep import (
            mixture_token_plan,
            mixture_token_plan_sql,
        )

        sf = str(tmp_path / "sf")
        _write_docs(sf, [("full", "some real tokens here"),
                         ("empty", "   "), ("empty", "")])
        got = mixture_token_plan(sf, budget_tokens=1000).to_pandas()
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'{sf}/documents.parquet'")
        want = con.execute(mixture_token_plan_sql(1000)).fetchdf()
        for col in ("source", "n_tokens", "weight", "target_tokens",
                    "epochs"):
            assert list(got[col]) == list(want[col]), col
        row = got.set_index("source").loc["empty"]
        assert row["n_tokens"] == 0 and row["epochs"] == 0.0

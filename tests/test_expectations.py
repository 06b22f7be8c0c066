"""check_expectations: per-rule violation counts vs DuckDB WHERE
counts, NULL semantics, unique rule, sample bounding, refusals."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

from ocr_ray.functions.expectations import check_expectations


def _tbl():
    return pa.table({
        "id": pa.array([1, 2, 2, 3, 4, 4, 4, None], pa.int64()),
        "lang": pa.array(["en", "de", "xx", None, "en", "fr", "en",
                          "en"], pa.string()),
        "n": pa.array([5, -1, 10, 200, None, 7, 8, 9], pa.int64()),
        "code": pa.array(["d-1", "d-2", "bad", "d-44", None, "d-5",
                          "nope", "d-7"], pa.string()),
        "txt": pa.array(["hello", "", "a" * 50, "ok", "yo", None,
                         "fine", "x"], pa.string()),
    })


def _by_rule(out):
    return {(r["column"], r["rule"]): r for r in out.to_pylist()}


class TestExpectations:
    def test_all_rule_kinds_planted(self, ray_session):
        import ray.data as rd

        rules = [
            {"column": "id", "rule": "not_null"},
            {"column": "lang", "rule": "in_set",
             "values": ["en", "de", "fr"]},
            {"column": "n", "rule": "range", "lo": 0, "hi": 100},
            {"column": "code", "rule": "regex", "pattern": r"d-\d+"},
            {"column": "txt", "rule": "str_len", "lo": 1, "hi": 10},
            {"column": "id", "rule": "unique"},
        ]
        out = _by_rule(check_expectations(
            rd.from_arrow(_tbl()).repartition(3), rules))
        assert out[("id", "not_null")]["n_violations"] == 1
        # NULL lang is NOT an in_set violation (SQL semantics)
        assert out[("lang", "in_set")]["n_violations"] == 1
        assert out[("lang", "in_set")]["sample_values"] == ["xx"]
        assert out[("n", "range")]["n_violations"] == 2     # -1, 200
        assert out[("code", "regex")]["n_violations"] == 2  # bad, nope
        assert out[("txt", "str_len")]["n_violations"] == 2  # "", a*50
        # id dups: 2x2 -> 1 extra, 4x3 -> 2 extra (NULL id not a dup)
        assert out[("id", "unique")]["n_violations"] == 3
        assert not out[("id", "unique")]["passed"]

    def test_counts_match_duckdb(self, ray_session):
        import ray.data as rd

        t = _tbl()  # noqa: F841
        rules = [
            {"column": "n", "rule": "range", "lo": 0, "hi": 100},
            {"column": "lang", "rule": "in_set",
             "values": ["en", "de", "fr"]},
            {"column": "code", "rule": "regex", "pattern": r"d-\d+"},
        ]
        out = _by_rule(check_expectations(rd.from_arrow(t), rules))
        want_range = duckdb.sql(
            "SELECT count(*) FROM t WHERE n < 0 OR n > 100").fetchone()[0]
        want_set = duckdb.sql(
            "SELECT count(*) FROM t WHERE lang IS NOT NULL AND "
            "lang NOT IN ('en','de','fr')").fetchone()[0]
        want_re = duckdb.sql(
            r"SELECT count(*) FROM t WHERE code IS NOT NULL AND "
            r"NOT regexp_full_match(code, 'd-\d+')").fetchone()[0]
        assert out[("n", "range")]["n_violations"] == want_range
        assert out[("lang", "in_set")]["n_violations"] == want_set
        assert out[("code", "regex")]["n_violations"] == want_re

    def test_clean_table_passes(self, ray_session):
        import ray.data as rd

        ds = rd.read_parquet("/root/testdata/sf0.001/orders.parquet")
        out = check_expectations(ds, [
            {"column": "o_orderkey", "rule": "not_null"},
            {"column": "o_orderkey", "rule": "unique"},
            {"column": "o_orderstatus", "rule": "in_set",
             "values": ["F", "O", "P"]},
            {"column": "o_totalprice", "rule": "range", "lo": 0},
        ])
        assert out["passed"].to_pylist() == [True] * 4
        assert out["n_violations"].to_pylist() == [0] * 4

    def test_sample_bounded(self, ray_session):
        import ray.data as rd

        n = 10_000
        tbl = pa.table({"x": pa.array(
            np.full(n, -5, np.int64), pa.int64())})
        out = check_expectations(
            rd.from_arrow(tbl).repartition(4),
            [{"column": "x", "rule": "range", "lo": 0}], sample=3)
        r = out.to_pylist()[0]
        assert r["n_violations"] == n
        assert r["sample_values"] == ["-5", "-5", "-5"]

    def test_one_sided_range(self, ray_session):
        import ray.data as rd

        tbl = pa.table({"x": pa.array([-2, 5, 1000], pa.int64())})
        out = check_expectations(
            rd.from_arrow(tbl), [{"column": "x", "rule": "range",
                                  "lo": 0}])
        assert out["n_violations"].to_pylist() == [1]

    def test_refusals(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(pa.table({"x": pa.array([1], pa.int64())}))
        with pytest.raises(ValueError, match="no rules"):
            check_expectations(ds, [])
        with pytest.raises(ValueError, match="unknown rule"):
            check_expectations(ds, [{"column": "x", "rule": "sorted"}])

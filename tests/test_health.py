"""corpus_health: report fields vs independent DuckDB facts; planted
dirty corpus flips the contract and dup rate."""

import os

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_ray.pipelines.health import corpus_health


class TestCorpusHealth:
    def test_clean_testdata_report(self, ray_session):
        sf = "/root/testdata/sf0.001"
        r = corpus_health(sf)
        facts = duckdb.sql(f"""
            SELECT count(*), count(DISTINCT md5(text)),
                   count(DISTINCT source || '|' || lang)
            FROM read_parquet('{sf}/documents.parquet')
        """).fetchone()
        assert r["n_docs"] == facts[0]
        assert r["n_exact_dup_docs"] == facts[0] - facts[1]
        assert r["contract_passed"] is True
        assert r["source_lang_mix"].num_rows == facts[2]
        assert int(sum(r["source_lang_mix"]["n_docs"].to_pylist())) \
            == facts[0]
        assert int(sum(r["length_hist"]["n"].to_pylist())) == facts[0]
        assert r["profile"].num_rows == 5   # 5 columns in documents

    def test_dirty_corpus_flags(self, ray_session, tmp_path):
        d = str(tmp_path)
        pq.write_table(pa.table({
            "doc_id": pa.array([1, 1, 2, 3], pa.int64()),   # dup id
            "text": pa.array(["same", "same", "", "other"],
                             pa.string()),                  # dup + empty
            "lang": pa.array(["en", "en", None, "de"],
                             pa.string()),                  # null lang
            "source": pa.array(["a", "a", "b", "b"], pa.string()),
            "n_chars": pa.array([4, 4, 0, 5], pa.int64()),
        }), os.path.join(d, "documents.parquet"))
        r = corpus_health(d)
        assert r["contract_passed"] is False
        failed = {(x["column"], x["rule"]) for x in
                  r["contract"].to_pylist() if not x["passed"]}
        assert ("doc_id", "unique") in failed
        assert ("text", "str_len") in failed
        assert ("lang", "not_null") in failed
        assert r["n_exact_dup_docs"] == 1 and r["dup_rate"] == 0.25

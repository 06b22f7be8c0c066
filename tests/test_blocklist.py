"""C4-style blocklist filter: DuckDB RE2 byte-parity, word-boundary /
case semantics on planted docs, survivor filtering, empty-list refusal."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_docs(path, rows):
    os.makedirs(path, exist_ok=True)
    pq.write_table(pa.Table.from_pylist(
        [{"doc_id": i, "text": t} for i, t in enumerate(rows)]),
        f"{path}/documents.parquet")


PLANTED = [
    "win the lottery today",             # plain hit
    "LoTTeRy CASINO lottery",            # case-insensitive, 3 hits
    "the lotteryx and casinos",          # boundary: no \b match
    "clean document about data",         # no hits
    "viagra, at a (casino)!",            # punctuation boundaries: 2
    "",                                  # empty text
]


class TestParityWithDuckDB:
    def test_sf0001_byte_parity(self, ray_session):
        import duckdb

        from ocr_ray.functions.blocklist import (
            blocklist_doc_stats,
            blocklist_sql,
        )

        sf = "/root/testdata/sf0.001"
        # words that DO occur in the synthetic corpus so the check is
        # non-vacuous, plus one that doesn't
        words = ("data", "vector", "zzznope")
        got = blocklist_doc_stats(sf, words).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'{sf}/documents.parquet'")
        want = con.execute(blocklist_sql(words) + " ORDER BY doc_id") \
            .fetchdf().reset_index(drop=True)
        assert got["n_blocked"].sum() > 0          # non-vacuous
        assert list(got["doc_id"]) == list(want["doc_id"])
        assert list(got["n_blocked"]) == list(want["n_blocked"])
        assert list(got["keep"]) == list(want["keep"])

    def test_planted_semantics(self, ray_session, tmp_path):
        from ocr_ray.functions.blocklist import blocklist_doc_stats

        sf = str(tmp_path / "sf")
        _write_docs(sf, PLANTED)
        out = {r["doc_id"]: r["n_blocked"]
               for r in blocklist_doc_stats(sf).take_all()}
        assert out == {0: 1, 1: 3, 2: 0, 3: 0, 4: 2, 5: 0}


class TestSurvivors:
    def test_only_clean_docs_survive(self, ray_session, tmp_path):
        from ocr_ray.functions.blocklist import blocklist_survivors

        sf = str(tmp_path / "sf")
        _write_docs(sf, PLANTED)
        kept = sorted(r["doc_id"]
                      for r in blocklist_survivors(sf).take_all())
        assert kept == [2, 3, 5]

    def test_prefix_cannot_shadow_longer_word(self, ray_session,
                                              tmp_path):
        """'cas' must not stop 'casino' from matching (longer-first
        alternation)."""
        from ocr_ray.functions.blocklist import blocklist_doc_stats

        sf = str(tmp_path / "sf")
        _write_docs(sf, ["cas casino"])
        out = blocklist_doc_stats(sf, ("cas", "casino")).take_all()
        assert out[0]["n_blocked"] == 2


class TestEdges:
    def test_empty_list_refused(self):
        from ocr_ray.functions.blocklist import blocklist_pattern

        with pytest.raises(ValueError):
            blocklist_pattern([])

    def test_regex_metachars_escaped(self, ray_session, tmp_path):
        from ocr_ray.functions.blocklist import blocklist_doc_stats

        sf = str(tmp_path / "sf")
        _write_docs(sf, ["price is $9.99 today", "price is $9x99"])
        out = {r["doc_id"]: r["n_blocked"]
               for r in blocklist_doc_stats(sf, ("9.99",)).take_all()}
        assert out == {0: 1, 1: 0}   # '.' is literal, not wildcard

"""Round-5 text-analysis extras: canonicalized dedup and distributed
top-terms-per-language.  DuckDB-parity at sf0.001 plus planted-case
semantics the real corpus cannot exercise (re-cased/re-wrapped copies,
tie-breaks, unicode boundaries of the ASCII-only canonicalization)."""

import duckdb
import pandas as pd
import pyarrow as pa
import pytest

from ocr_ray.functions import textops as tx

SF = "/root/testdata/sf0.001"


def _oracle(sql: str, view_sql: str = None) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(view_sql or
                f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    return con.execute(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _check(ray_res, oracle_df: pd.DataFrame):
    import ray.data

    if isinstance(ray_res, ray.data.Dataset):
        ray_df = ray_res.to_pandas()
    elif isinstance(ray_res, pa.Table):
        ray_df = ray_res.to_pandas()
    else:
        ray_df = ray_res
    pd.testing.assert_frame_equal(_canon(ray_df), _canon(oracle_df),
                                  check_dtype=False)


class TestCanonicalKey:
    def test_strip_collapse_lower(self):
        assert tx.canonical_text_key("  Hello\t\nWORLD  x ") == "hello world x"

    def test_ascii_only_lower(self):
        # unicode uppercase is left alone — that is the documented
        # contract that keeps Python and DuckDB byte-identical
        assert tx.canonical_text_key("İstanbul Straße") == "İstanbul straße"

    def test_unicode_ws_untouched(self):
        # NBSP is not ASCII whitespace on either engine
        assert tx.canonical_text_key("a b") == "a b"

    def test_empty_and_ws_only(self):
        assert tx.canonical_text_key("") == ""
        assert tx.canonical_text_key(" \t\r\n") == ""


class TestNormalizedDedup:
    def test_sql_parity_sf0001(self, ray_session):
        _check(tx.normalized_dedup_groups(SF),
               _oracle(tx.NORMALIZED_DEDUP_SQL))

    def test_planted_recased_copies(self, ray_session, tmp_path):
        rows = {
            "doc_id": [1, 2, 3, 4, 5],
            "text": ["The quick  Brown fox", "the QUICK brown\tfox  ",
                     " THE quick brown FOX", "the quick brown ox",
                     "unrelated"],
            "lang": ["en"] * 5, "source": ["s"] * 5,
            "n_chars": [20, 20, 20, 18, 9],
        }
        pa_tbl = pa.table(rows)
        import pyarrow.parquet as pq
        pq.write_table(pa_tbl, tmp_path / "documents.parquet")

        out = tx.normalized_dedup_groups(str(tmp_path)).to_pandas()
        # docs 1-3 are one canonical group surviving as doc 1
        grp = out[out.n_copies == 3]
        assert len(grp) == 1 and grp.iloc[0].keep_doc_id == 1
        assert len(out) == 3  # plus the two singletons
        # byte-exact dedup would NOT merge them
        exact = tx.exact_dedup_groups(str(tmp_path)).to_pandas()
        assert (exact.n_copies == 1).all()
        # and the oracle agrees on the planted corpus too
        oracle = _oracle(
            tx.NORMALIZED_DEDUP_SQL,
            view_sql=f"CREATE VIEW documents AS SELECT * FROM "
                     f"'{tmp_path / 'documents.parquet'}'")
        _check(tx.normalized_dedup_groups(str(tmp_path)), oracle)


class TestTopTermsPerLang:
    def test_sql_parity_sf0001(self, ray_session):
        _check(tx.top_terms_per_lang(SF),
               _oracle(tx.TOP_TERMS_PER_LANG_SQL))

    def test_tie_break_and_k(self, ray_session, tmp_path):
        # counts: en: b=3, a=3, c=1 -> rank (a,1),(b,2) at k=2 (token
        # ASC breaks the 3-3 tie); fr gets fewer than k rows
        rows = {
            "doc_id": [1, 2, 3],
            "text": ["a b a b", "B A c", "oui oui"],
            "lang": ["en", "en", "fr"], "source": ["s"] * 3,
            "n_chars": [7, 5, 7],
        }
        import pyarrow.parquet as pq
        pq.write_table(pa.table(rows), tmp_path / "documents.parquet")

        out = (tx.top_terms_per_lang(str(tmp_path), k=2).to_pandas()
               .sort_values(["lang", "rank"]).reset_index(drop=True))
        en = out[out.lang == "en"]
        assert list(en.token) == ["a", "b"] and list(en.n) == [3, 3]
        assert list(en["rank"]) == [1, 2]
        fr = out[out.lang == "fr"]
        assert list(fr.token) == ["oui"] and list(fr.n) == [2]

    def test_prune_is_lossless(self, ray_session):
        # global top-k from the pruned pipeline equals the exact top-k
        # computed from the full (lang, token) counts at a k larger
        # than the per-block prune could hide
        full = _oracle(tx.TOP_TERMS_PER_LANG_SQL)
        got = tx.top_terms_per_lang(SF, k=10).to_pandas()
        _check(got, full)


class TestMixedLanguage:
    def test_sf0001_matches_duckdb(self, ray_session):
        import duckdb

        from ocr_ray.functions.textops import (
            MIXED_LANGUAGE_SQL,
            mixed_language_stats,
        )

        sf = "/root/testdata/sf0.001"
        got = mixed_language_stats(sf).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'{sf}/documents.parquet'")
        want = con.execute(MIXED_LANGUAGE_SQL) \
            .fetchdf().reset_index(drop=True)
        assert list(got["doc_id"]) == list(want["doc_id"])
        assert list(got["n_lines"]) == list(want["n_lines"])
        assert list(got["top_lang"]) == list(want["top_lang"])
        assert list(got["top_frac"]) == list(want["top_frac"])

    def test_planted_mixed_doc(self, ray_session, tmp_path):
        import os

        import pyarrow as pa
        import pyarrow.parquet as pq

        from ocr_ray.functions.textops import mixed_language_stats

        sf = str(tmp_path / "sf")
        os.makedirs(sf, exist_ok=True)
        mixed = ("the cat is on the mat\n"
                 "der hund ist nicht hier\n"
                 "the dog is in the house\n"
                 "und das ist auch gut")        # 2 en + 2 de
        pure = "the one and the other and the rest"
        empty = ""
        pq.write_table(pa.Table.from_pylist([
            {"doc_id": 0, "text": mixed},
            {"doc_id": 1, "text": pure},
            {"doc_id": 2, "text": empty}]),
            f"{sf}/documents.parquet")
        out = {r["doc_id"]: r for r in
               mixed_language_stats(sf).take_all()}
        assert out[0]["n_lines"] == 4
        assert out[0]["top_lang"] == "de"     # tie -> de precedence
        assert out[0]["top_frac"] == 0.5      # the mixed-doc signal
        assert out[1]["top_lang"] == "en" and out[1]["top_frac"] == 1.0
        assert out[2] == {"doc_id": 2, "n_lines": 0,
                          "top_lang": "unk", "top_frac": 0.0}

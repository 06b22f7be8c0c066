"""Queries consolidated OUT of the 50-entry driver registry (the driver
caps CORRECTNESS at 50 rows) stay oracle-verified here, at sf0.001."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"
TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con.execute(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _check(ray_res, sql: str):
    import pyarrow as pa
    import ray.data

    if isinstance(ray_res, ray.data.Dataset):
        ray_df = ray_res.to_pandas()
    elif isinstance(ray_res, pa.Table):
        ray_df = ray_res.to_pandas()
    else:
        ray_df = ray_res
    a, b = _canon(ray_df), _canon(_oracle(sql))
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


class TestConsolidatedQueries:
    def test_q6_revenue_delta(self, ray_session):
        # rotated out for q21_blamed_suppliers (round-5 continuation)
        from ocr_ray.functions import relational as rel
        _check(rel.q6_revenue_delta(SF), rel.Q6_SQL)

    def test_top_users_by_value(self, ray_session):
        # rotated out for q22_idle_rich_customers (round-5 continuation)
        from ocr_ray.functions import events as ev
        _check(ev.top_users_by_value(SF), ev.TOP_USERS_SQL)

    def test_order_priority_counts(self, ray_session):
        from ocr_ray.functions import relational as rel
        _check(rel.order_priority_counts(SF), rel.ORDER_PRIORITY_SQL)

    def test_part_type_stats(self, ray_session):
        from ocr_ray.functions import relational as rel
        _check(rel.part_type_stats(SF), rel.PART_TYPE_SQL)

    def test_distinct_order_statuses(self, ray_session):
        from ocr_ray.functions import relational as rel
        _check(rel.distinct_order_statuses(SF), rel.DISTINCT_STATUS_SQL)

    def test_mktsegment_stats(self, ray_session):
        # rotated out of the registry in round 4 for the float grouped
        # quantiles; oracle coverage continues here
        from ocr_ray.functions import relational as rel
        _check(rel.mktsegment_stats(SF), rel.MKTSEGMENT_SQL)

    def test_doc_sample_stats(self, ray_session):
        # rotated out of the registry in round 4 for repeated_ngrams;
        # oracle coverage continues here
        from ocr_ray.functions import textops as tx
        _check(tx.doc_sample_stats(SF), tx.DOC_SAMPLE_SQL)

    def test_source_temperature_sample(self, ray_session):
        # GPT-3/PaLM-style mixture reweighting; md5-hash-sample parity
        # with the DuckDB oracle (pytest-only: the 50-slot registry is
        # full)
        from ocr_ray.functions import corpus_prep as cp
        _check(cp.source_temperature_sample(SF),
               cp.SOURCE_TEMPERATURE_SQL)

    def test_temperature_upweights_small_sources(self, ray_session,
                                                 tmp_path):
        """tau < 1 must raise the KEEP RATE of small sources above that
        of large ones (the reason the operator exists).  The shipped
        testdata is source-uniform, so plant a skewed corpus."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ocr_ray.functions import corpus_prep as cp

        rows = ([{"doc_id": i, "text": f"doc {i}", "lang": "en",
                  "source": "big", "n_chars": 10} for i in range(400)]
                + [{"doc_id": 10_000 + i, "text": f"doc b{i}",
                    "lang": "en", "source": "small", "n_chars": 10}
                   for i in range(40)])
        pq.write_table(pa.Table.from_pylist(rows),
                       str(tmp_path / "documents.parquet"))
        kept = {r["source"]: r["n_kept"] for r in
                cp.source_temperature_sample(
                    str(tmp_path), tau=0.3, target_frac=0.3)
                .to_pandas().to_dict("records")}
        rate_small = kept.get("small", 0) / 40
        rate_big = kept.get("big", 0) / 400
        assert rate_small > rate_big > 0

    def test_repeated_ngrams_param_variant(self, ray_session):
        # the registry checks the default (n=3, min_docs=5); pin a
        # different parameterization against an adjusted oracle
        from ocr_ray.functions import corpus_prep as cp
        _check(cp.repeated_ngrams(SF, n=3, min_docs=3),
               cp.REPEATED_NGRAMS_SQL.replace(">= 5", ">= 3"))

    def test_repeated_ngrams_two_phase_equals_default(self, ray_session):
        # the multi-node path (hash-candidate phase + exact string
        # recount, ~10x less network exchange) must be value-identical
        # to the string-shuffle default — including the SQL oracle
        from ocr_ray.functions import corpus_prep as cp

        def rows(ds):
            return sorted(map(tuple, ds.to_pandas().itertuples(index=False)))

        a = rows(cp.repeated_ngrams(SF, n=3, min_docs=3))
        b = rows(cp.repeated_ngrams(SF, n=3, min_docs=3, two_phase=True))
        assert a == b and len(a) > 0
        _check(cp.repeated_ngrams(SF, n=3, min_docs=3, two_phase=True),
               cp.REPEATED_NGRAMS_SQL.replace(">= 5", ">= 3"))

    def test_doc_lang_stats(self, ray_session):
        # rotated out of the registry in round 4 for props_redaction;
        # oracle coverage continues here
        from ocr_ray.functions import textops as tx
        _check(tx.doc_lang_stats(SF), tx.DOC_LANG_STATS_SQL)

    def test_doc_source_stats(self, ray_session):
        from ocr_ray.functions import textops as tx
        _check(tx.doc_source_stats(SF), tx.DOC_SOURCE_SQL)

    def test_events_windows_watermark(self, ray_session):
        from ocr_ray.functions import events as ev
        _check(ev.events_windows_watermark(SF),
               ev.EVENTS_WINDOWS_WATERMARK_SQL)
        # semantic check: exactly the last days are open (not final)
        df = ev.events_windows_watermark(SF).to_pandas()
        finals = df.sort_values("day")["is_final"].tolist()
        assert finals[0] and not finals[-1]      # oldest final, newest open
        assert finals == sorted(finals, reverse=True)  # monotone frontier

    def test_repeated_ngrams_survivor_gate(self, ray_session):
        # the two-phase driver gate must refuse rather than buffer an
        # unbounded survivor set on the driver
        import pytest as _pytest

        from ocr_ray.functions import corpus_prep as cp
        with _pytest.raises(ValueError, match="max_survivors"):
            cp.repeated_ngrams(SF, n=3, min_docs=2, two_phase=True,
                               max_survivors=3).to_pandas()

    def test_events_hourly_histogram(self, ray_session):
        # rotated out of the registry in round 5 for passage_removal;
        # oracle coverage continues here
        from ocr_ray.functions import events as ev
        _check(ev.events_hourly_histogram(SF), ev.EVENTS_HOURLY_SQL)

    def test_priority_price_quantiles_cont(self, ray_session):
        # interpolated percentile_cont sibling of the registry's
        # quantile_disc entry (round 5)
        from ocr_ray.functions import corpus_prep as cp
        _check(cp.priority_price_quantiles_cont(SF),
               cp.PRIORITY_PRICE_QUANTILES_CONT_SQL)

    def test_doc_compression_stats(self, ray_session):
        # property oracle (zlib is not SQL-expressible): looping text
        # compresses below prose, prose below noise; byte counts exact
        import zlib

        from ocr_ray.functions import textops as tx

        out = {r["doc_id"]: r
               for r in tx.doc_compression_stats(SF).take_all()}
        import duckdb
        rows = duckdb.sql(
            f"SELECT doc_id, text FROM read_parquet("
            f"'{SF}/documents.parquet') LIMIT 50").fetchall()
        for doc_id, text in rows:
            raw = text.encode("utf-8")
            r = out[doc_id]
            assert r["n_bytes"] == len(raw)
            assert r["compressed_bytes"] == len(zlib.compress(raw, 6))
        # ordering property on synthetic extremes via the same kernel
        loop = ("spam ham " * 200).encode()
        prose = ("the quick brown fox jumps over the lazy dog and then "
                 "wanders through seventeen unrelated meadows today "
                 ).encode() * 16
        import numpy as np
        noise = bytes(np.random.default_rng(5).integers(
            0, 256, len(loop), dtype=np.uint8))
        rat = lambda b: len(zlib.compress(b, 6)) / len(b)
        assert rat(loop) < rat(prose) < rat(noise)


class TestRoundFiveLateRotations:
    """Rotated out of the driver registry for the Q2/Q17/Q20 shapes
    (round-5 late continuation); oracle coverage continues here."""

    def test_doc_token_counts(self, ray_session):
        from ocr_ray.functions import textops as tx
        _check(tx.doc_token_counts(SF), tx.DOC_TOKEN_COUNTS_SQL)

    def test_doc_char_quality(self, ray_session):
        from ocr_ray.functions import textops as tx
        _check(tx.doc_char_quality(SF), tx.DOC_CHAR_QUALITY_SQL)

    def test_props_k_stats(self, ray_session):
        from ocr_ray.functions import events as ev
        _check(ev.props_k_stats(SF), ev.PROPS_K_SQL)

    def test_user_activity_join(self, ray_session):
        # rotated out for interval_overlap (round-5 late continuation)
        from ocr_ray.functions import events as ev
        _check(ev.user_activity_join(SF), ev.USER_ACTIVITY_SQL)


class TestSeventhContinuationRotations:
    """Rotated out of the driver registry for the ROLLUP and EXCEPT ALL
    shapes (round-5 seventh continuation); oracle coverage continues
    here."""

    def test_lang_id(self, ray_session):
        from ocr_ray.functions import textops as tx
        _check(tx.lang_id(SF), tx.LANG_ID_SQL)

    def test_doc_fingerprints(self, ray_session):
        from ocr_ray.functions import textops as tx
        _check(tx.doc_fingerprints(SF), tx.DOC_FINGERPRINTS_SQL)

    def test_doc_line_stats(self, ray_session):
        # rotated out for user_last_click_value (round-5, eighth
        # continuation): map-only per-doc shape kept driver-checked by
        # its three registry siblings
        from ocr_ray.functions import textops as tx
        _check(tx.doc_line_stats(SF), tx.DOC_LINE_STATS_SQL)

    def test_user_last_click_value_registry_parity(self, ray_session):
        # the rotated-IN entry, checked at extras scale too
        from ocr_ray.functions import events as ev
        _check(ev.user_last_click_value(SF), ev.USER_LAST_CLICK_SQL)

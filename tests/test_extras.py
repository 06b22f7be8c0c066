"""Tests for summarization, vector keyword search, multimodal plumbing,
and the corpus perf report."""

import numpy as np
import pytest
import ray.data as rd

from ocr_ray.kernels.summarize import split_sentences, summarize
from ocr_ray.kernels.vecsearch import VectorKeywordSearcher, _embed
from ocr_ray.stages.multimodal import (
    FEATURE_SCHEMA,
    MediaFeatureExtractor,
    media_features,
    synth_media_table,
)


class TestSummarize:
    def test_short_text_passthrough(self):
        t = "Prima propoziție. A doua propoziție."
        assert summarize(t) == t

    def test_topk_in_reading_order(self):
        sents = [f"Propoziția numărul {i} despre contract lege decizie." for i in range(12)]
        out = summarize(" ".join(sents), max_sentences=5)
        out_sents = split_sentences(out)
        assert len(out_sents) == 5
        idx = [sents.index(s) for s in out_sents]
        assert idx == sorted(idx)

    def test_deterministic(self):
        text = " ".join(f"Cuvinte diverse {i} lege contract." for i in range(30))
        assert summarize(text) == summarize(text)


class TestVectorSearch:
    def test_keyword_matches_itself(self):
        m = VectorKeywordSearcher(["achiziție publică", "contract cadru"])
        hits = m.search("S-a semnat un contract cadru important ieri.")
        assert any("contract cadru" in h["phrase"] for h in hits)

    def test_near_variant_matches(self):
        m = VectorKeywordSearcher(["achiziție publică"])
        # diacritic-free near-variant should still fall inside the
        # one-class boundary (embedding folds diacritics)
        hits = m.search("procedura de achizitie publica a fost lansată")
        assert hits

    def test_unrelated_text_scores_below(self):
        m = VectorKeywordSearcher(["achiziție publică", "licitație deschisă"])
        hits = m.search("zzz qqq www eee rrr ttt yyy uuu")
        assert hits == []

    def test_embedding_unit_norm(self):
        v = _embed("contract")
        assert abs(np.linalg.norm(v) - 1.0) < 1e-9


class TestMultimodal:
    def test_synth_table_deterministic(self):
        a, b = synth_media_table(10), synth_media_table(10)
        assert a.equals(b)

    def test_fake_codec_features(self, ray_session):
        media = rd.from_arrow(synth_media_table(40))
        feats = media_features(media).to_pandas()
        assert len(feats) == 40
        assert set(feats.columns) == {f.name for f in FEATURE_SCHEMA}
        img = feats[feats["media_type"] == "image"]
        aud = feats[feats["media_type"] == "audio"]
        assert (img["thumb_w"] == 32).all() and (img["frames_sampled"] == 1).all()
        assert (aud["thumb_w"] == 0).all() and (aud["frames_sampled"] > 1).all()
        assert all(len(f) == 32 for f in feats["feature"])

    def test_stub_codec_raises(self):
        ex = MediaFeatureExtractor(codec="stub")
        with pytest.raises(NotImplementedError):
            ex(synth_media_table(2))

    def test_unknown_codec_rejected(self):
        with pytest.raises(ValueError):
            MediaFeatureExtractor(codec="jpeg")


class TestPerfReport:
    def test_report_over_run(self, ray_session, small_corpus_path,
                             tmp_path_factory):
        from ocr_ray.functions.perfstats import corpus_report
        from ocr_ray.pipelines.extract_pipeline import run_extraction

        out = str(tmp_path_factory.mktemp("perf_out"))
        run_extraction(small_corpus_path, out)
        rep = corpus_report(f"{out}/extracted", top_k=5)
        assert rep["docs_ok"] == 57 and rep["docs_failed"] == 3
        assert set(rep["failure_reasons"]) == {
            "empty_document", "malformed_span", "too_many_spans"}
        assert len(rep["slowest_docs"]) == 5
        assert rep["slowest_docs"][0]["proc_ms"] >= rep["slowest_docs"][-1]["proc_ms"]
        assert all(d["quality_mean"] >= 0 for d in rep["worst_quality_docs"])
        assert rep["mean_ms_per_span"] > 0


class TestDegradePayload:
    """M13 parity (shorten_analysis ladder, ocr_worker.py:99-115):
    each rung strictly shrinks the payload; level 2 drops span text
    entirely while keeping the span skeleton."""

    def test_ladder_shrinks_payload(self, ray_session, golden_result):
        import ray.data as rd

        from ocr_ray.functions.textops import degrade_payload

        extracted = rd.from_arrow(golden_result["extracted"])
        full = sum(len(s["text"]) for r in
                   golden_result["extracted"].to_pylist()
                   for s in r["spans"])
        l1 = degrade_payload(extracted, level=1).to_pandas()
        l2 = degrade_payload(extracted, level=2).to_pandas()
        assert 0 < l1["payload_chars"].sum() < full
        assert l2["payload_chars"].sum() == 0
        # skeleton preserved: same span counts and offsets per doc
        base = {r["doc_id"]: [s["offset"] for s in r["spans"]]
                for r in golden_result["extracted"].to_pylist()}
        for _, row in l2.iterrows():
            assert [s["offset"] for s in row["spans"]] == base[row["doc_id"]]


class TestRangeJoin:
    def test_error_click_range_vs_sql(self, ray_session):
        """Bucketized band range join vs DuckDB interval join, both
        scale factors, including errors with zero nearby clicks."""
        import duckdb
        import pandas as pd

        from ocr_ray.functions.events import (
            ERROR_CLICK_RANGE_SQL,
            error_click_range_join,
        )

        for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
            got = error_click_range_join(sf).to_pandas()
            con = duckdb.connect()
            con.execute(f"CREATE VIEW events AS SELECT * FROM "
                        f"'{sf}/events.parquet'")
            want = con.execute(ERROR_CLICK_RANGE_SQL).df()
            key = ["user_id", "ts", "n_nearby_clicks"]
            got = got[key].sort_values(key).reset_index(drop=True)
            want = want[key].sort_values(key).reset_index(drop=True)
            pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_window_boundary_inclusive(self, ray_session, tmp_path):
        """Clicks exactly AT the +/- window edge count (inclusive), one
        microsecond outside does not — and partners in the NEIGHBOR
        bucket are found (the replication contract)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ocr_ray.functions.events import error_click_range_join

        w_us = 5 * 60 * 1_000_000
        base = 10 * w_us + 123  # error near a bucket's start
        rows = [
            {"event_id": 1, "ts": base, "user_id": 7,
             "event_type": "error", "value": 0.0, "props": "{}"},
            # exactly at the edges (count), just outside (don't)
            {"event_id": 2, "ts": base - w_us, "user_id": 7,
             "event_type": "click", "value": 0.0, "props": "{}"},
            {"event_id": 3, "ts": base + w_us, "user_id": 7,
             "event_type": "click", "value": 0.0, "props": "{}"},
            {"event_id": 4, "ts": base - w_us - 1, "user_id": 7,
             "event_type": "click", "value": 0.0, "props": "{}"},
            {"event_id": 5, "ts": base + w_us + 1, "user_id": 7,
             "event_type": "click", "value": 0.0, "props": "{}"},
            # other user: never joins
            {"event_id": 6, "ts": base, "user_id": 8,
             "event_type": "click", "value": 0.0, "props": "{}"},
        ]
        t = pa.Table.from_pylist(rows)
        t = t.set_column(t.schema.get_field_index("ts"),
                         "ts", pa.compute.cast(t["ts"], pa.timestamp("us")))
        pq.write_table(t, str(tmp_path / "events.parquet"))
        out = error_click_range_join(str(tmp_path)).to_pandas()
        assert len(out) == 1
        assert int(out["n_nearby_clicks"].iloc[0]) == 2


class TestFrameSampling:
    def test_frames_match_meta_and_are_deterministic(self, ray_session):
        import ray.data as rd

        from ocr_ray.stages.multimodal import (
            FrameSampler,
            sample_frames,
            synth_media_table,
        )

        media = synth_media_table(40)
        out = sample_frames(rd.from_arrow(media)).to_pandas()
        metas = {r["media_ref"]: r for r in media.to_pylist()}
        for ref, g in out.groupby("media_ref"):
            m = metas[ref]
            if m["media_type"] == "image":
                assert len(g) == 1 and int(g["frame_idx"].iloc[0]) == 0
            else:
                want = min(64, max(1, m["meta"]["n_frames"] // 4000))
                assert len(g) == want
                assert list(g.sort_values("frame_idx")["frame_idx"]) \
                    == list(range(want))
            assert all(len(f) > 0 for f in g["frame"])
        # pure function: a second pass over the same table is identical
        again = sample_frames(rd.from_arrow(media)).to_pandas()
        key = ["media_ref", "frame_idx"]
        a = out.sort_values(key).reset_index(drop=True)
        b = again.sort_values(key).reset_index(drop=True)
        assert a.equals(b)

    def test_stub_codec_marks_real_seam(self, ray_session):
        import pytest as _pytest

        from ocr_ray.stages.multimodal import FrameSampler, synth_media_table

        with _pytest.raises(NotImplementedError):
            FrameSampler(codec="stub")(synth_media_table(2))

    def test_duplicate_error_timestamps_match_sql_group_by(
            self, ray_session, tmp_path):
        """Duplicate (user_id, ts) error rows must collapse into ONE
        output row with multiplicity * clicks-in-range, exactly like
        the oracle's GROUP BY over the joined pairs."""
        import duckdb
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ocr_ray.functions.events import (
            ERROR_CLICK_RANGE_SQL,
            error_click_range_join,
        )

        base = 10_000_000_000
        rows = [
            {"event_id": 1, "ts": base, "user_id": 7,
             "event_type": "error", "value": 0.0, "props": "{}"},
            {"event_id": 2, "ts": base, "user_id": 7,     # duplicate ts
             "event_type": "error", "value": 0.0, "props": "{}"},
            {"event_id": 3, "ts": base + 1000, "user_id": 7,
             "event_type": "click", "value": 0.0, "props": "{}"},
            {"event_id": 4, "ts": base + 2000, "user_id": 7,
             "event_type": "click", "value": 0.0, "props": "{}"},
        ]
        t = pa.Table.from_pylist(rows)
        t = t.set_column(t.schema.get_field_index("ts"), "ts",
                         pa.compute.cast(t["ts"], pa.timestamp("us")))
        pq.write_table(t, str(tmp_path / "events.parquet"))
        got = error_click_range_join(str(tmp_path)).to_pandas()
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{tmp_path}/events.parquet'")
        want = con.execute(ERROR_CLICK_RANGE_SQL).df()
        assert len(got) == len(want) == 1
        assert int(got["n_nearby_clicks"].iloc[0]) \
            == int(want["n_nearby_clicks"].iloc[0]) == 4  # 2 errors x 2


class TestSaltedDistinct:
    def test_salted_distinct_vs_sql(self, ray_session):
        import duckdb
        import pandas as pd

        from ocr_ray.functions.events import (
            DISTINCT_USERS_SQL,
            distinct_users_by_type,
        )

        for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
            got = distinct_users_by_type(sf).to_pandas() \
                .sort_values("event_type").reset_index(drop=True)
            con = duckdb.connect()
            con.execute(f"CREATE VIEW events AS SELECT * FROM "
                        f"'{sf}/events.parquet'")
            want = con.execute(DISTINCT_USERS_SQL + " ORDER BY event_type") \
                .df().reset_index(drop=True)
            pd.testing.assert_frame_equal(got[["event_type", "n_users"]],
                                          want, check_dtype=False)

    def test_salting_partitions_are_disjoint(self, ray_session):
        """Same user always lands in the same salt bucket, so summing
        per-salt distinct counts cannot double count: with n_salts=1
        (no salting) the answer must be identical."""
        from ocr_ray.functions.events import distinct_users_by_type

        sf = "/root/testdata/sf0.001"
        a = distinct_users_by_type(sf, n_salts=16).to_pandas() \
            .sort_values("event_type").reset_index(drop=True)
        b = distinct_users_by_type(sf, n_salts=1).to_pandas() \
            .sort_values("event_type").reset_index(drop=True)
        assert a.equals(b)

    def test_null_user_ids_ignored_like_sql(self, ray_session, tmp_path):
        """count(DISTINCT user_id) ignores NULLs but keeps the group;
        the salted path must match on mixed and all-NULL groups."""
        import duckdb
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ocr_ray.functions.events import (
            DISTINCT_USERS_SQL,
            distinct_users_by_type,
        )

        rows = [
            {"event_id": 1, "ts": 1000, "user_id": 7,
             "event_type": "click", "value": 0.0, "props": "{}"},
            {"event_id": 2, "ts": 2000, "user_id": None,
             "event_type": "click", "value": 0.0, "props": "{}"},
            {"event_id": 3, "ts": 3000, "user_id": None,
             "event_type": "error", "value": 0.0, "props": "{}"},  # all-NULL group
        ]
        t = pa.Table.from_pylist(rows)
        t = t.set_column(t.schema.get_field_index("ts"), "ts",
                         pa.compute.cast(t["ts"], pa.timestamp("us")))
        pq.write_table(t, str(tmp_path / "events.parquet"))
        got = distinct_users_by_type(str(tmp_path)).to_pandas() \
            .sort_values("event_type").reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{tmp_path}/events.parquet'")
        want = con.execute(DISTINCT_USERS_SQL + " ORDER BY event_type") \
            .df().reset_index(drop=True)
        pd.testing.assert_frame_equal(got[["event_type", "n_users"]],
                                      want, check_dtype=False)


class TestAsofJoin:
    def test_asof_null_users_and_ties(self, ray_session, tmp_path):
        """Round-4 vectorized asof kernel: NULL-user errors keep the
        oracle's NULL group (zero matches), NULL-user clicks never
        join, and a click at the SAME timestamp as the error matches
        with gap 0 (ts >= click_ts)."""
        import duckdb
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ocr_ray.functions.events import (
            ERROR_CLICK_ASOF_SQL,
            error_click_asof,
        )

        rows = [
            # user 1: click then error (matched, gap 1s)
            {"event_id": 1, "ts": 1_000_000, "user_id": 1,
             "event_type": "click", "value": 0.0, "props": "{}"},
            {"event_id": 2, "ts": 2_000_000, "user_id": 1,
             "event_type": "error", "value": 0.0, "props": "{}"},
            # user 2: click at the SAME us as the error -> gap 0 match
            {"event_id": 3, "ts": 5_000_000, "user_id": 2,
             "event_type": "click", "value": 0.0, "props": "{}"},
            {"event_id": 4, "ts": 5_000_000, "user_id": 2,
             "event_type": "error", "value": 0.0, "props": "{}"},
            # null-user error (NULL output group, no match) + null click
            {"event_id": 5, "ts": 3_000_000, "user_id": None,
             "event_type": "error", "value": 0.0, "props": "{}"},
            {"event_id": 6, "ts": 2_500_000, "user_id": None,
             "event_type": "click", "value": 0.0, "props": "{}"},
            # user 3: error with no prior click at all
            {"event_id": 7, "ts": 9_000_000, "user_id": 3,
             "event_type": "error", "value": 0.0, "props": "{}"},
        ]
        t = pa.Table.from_pylist(rows)
        t = t.set_column(t.schema.get_field_index("ts"), "ts",
                         pa.compute.cast(t["ts"], pa.timestamp("us")))
        pq.write_table(t, str(tmp_path / "events.parquet"))
        got = error_click_asof(str(tmp_path)).to_pandas()
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{tmp_path}/events.parquet'")
        want = con.execute(ERROR_CLICK_ASOF_SQL).df()

        def canon(d):
            d = d[sorted(d.columns)]
            return d.sort_values(list(d.columns)).reset_index(drop=True)

        pd.testing.assert_frame_equal(canon(got), canon(want),
                                      check_dtype=False)
        by_user = {r["user_id"]: r for r in got.to_dict("records")
                   if r["user_id"] == r["user_id"]}
        assert by_user[2]["n_matched"] == 1          # same-ts tie matched
        assert by_user[2]["avg_gap_s"] == 0.0
        assert by_user[3]["n_matched"] == 0



class TestSessionize:
    def test_sessionize_null_users_ties_and_boundary(self, ray_session,
                                                     tmp_path):
        """Round-5 vectorized sessionize kernel: NULL users keep the
        oracle's NULL group; a gap of EXACTLY 30 minutes stays in the
        same session (SQL is strictly `>`); same-ts ties never open a
        session; a gap one microsecond over the threshold does."""
        import duckdb
        import pandas as pd
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ocr_ray.functions.events import SESSIONIZE_SQL, sessionize

        m30 = 30 * 60 * 1_000_000
        rows = [
            # user 1: 3 events -> 2 sessions (exact-boundary gap stays,
            # boundary+1us opens a new session)
            {"event_id": 1, "ts": 0, "user_id": 1,
             "event_type": "click", "value": 0.0, "props": "{}"},
            {"event_id": 2, "ts": m30, "user_id": 1,
             "event_type": "click", "value": 0.0, "props": "{}"},
            {"event_id": 3, "ts": 2 * m30 + 1, "user_id": 1,
             "event_type": "view", "value": 0.0, "props": "{}"},
            # user 2: same-ts tie -> one session
            {"event_id": 4, "ts": 7_000_000, "user_id": 2,
             "event_type": "click", "value": 0.0, "props": "{}"},
            {"event_id": 5, "ts": 7_000_000, "user_id": 2,
             "event_type": "error", "value": 0.0, "props": "{}"},
            # NULL user: two events far apart -> NULL group, 2 sessions
            {"event_id": 6, "ts": 1_000_000, "user_id": None,
             "event_type": "click", "value": 0.0, "props": "{}"},
            {"event_id": 7, "ts": 10 * m30, "user_id": None,
             "event_type": "click", "value": 0.0, "props": "{}"},
        ]
        t = pa.Table.from_pylist(rows)
        t = t.set_column(t.schema.get_field_index("ts"), "ts",
                         pa.compute.cast(t["ts"], pa.timestamp("us")))
        pq.write_table(t, str(tmp_path / "events.parquet"))
        got = sessionize(str(tmp_path)).to_pandas()
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{tmp_path}/events.parquet'")
        want = con.execute(SESSIONIZE_SQL).df()

        def canon(d):
            d = d[sorted(d.columns)]
            return d.sort_values(list(d.columns)).reset_index(drop=True)

        pd.testing.assert_frame_equal(canon(got), canon(want),
                                      check_dtype=False)
        by_user = {(-1 if r["user_id"] != r["user_id"] else r["user_id"]): r
                   for r in got.to_dict("records")}
        assert by_user[1]["n_sessions"] == 2    # exact boundary stays
        assert by_user[2]["n_sessions"] == 1    # same-ts tie
        assert by_user[-1]["n_sessions"] == 2   # NULL group kept

    def test_sessionize_sf0001_matches_oracle(self, ray_session):
        import duckdb
        import pandas as pd

        from ocr_ray.functions.events import SESSIONIZE_SQL, sessionize

        sf = "/root/testdata/sf0.001"
        got = sessionize(sf).to_pandas() \
            .sort_values("user_id").reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{sf}/events.parquet'")
        want = con.execute(SESSIONIZE_SQL + " ORDER BY user_id").df() \
            .reset_index(drop=True)
        pd.testing.assert_frame_equal(
            got[["user_id", "n_events", "n_sessions"]], want,
            check_dtype=False)


class TestMediaPHash:
    def test_kernel_invariance_and_separation(self):
        import numpy as np

        from ocr_ray.stages.multimodal import hamming64, phash64

        rng = np.random.default_rng(3)
        img = rng.random((64, 80))
        h0 = phash64(img)
        assert hamming64(h0, phash64(img + rng.normal(0, 0.01,
                                                      img.shape))) <= 3
        assert hamming64(h0, phash64(img * 1.1 + 0.05)) <= 3
        assert hamming64(h0, phash64(rng.random((64, 80)))) >= 16
        # audio (1D) path
        aud = rng.random(5000)
        assert hamming64(phash64(aud),
                         phash64(aud + rng.normal(0, 0.01, 5000))) <= 3
        # degenerate shapes are total
        assert isinstance(phash64(np.ones((3, 3))), int)
        assert phash64(np.array([])) == 0

    def test_distributed_exact_dups_found(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from ocr_ray.stages.multimodal import (media_dup_pairs,
                                               synth_media_table)

        t = synth_media_table(24, seed=7)
        # plant an exact payload dup of row 0 under a new ref
        dup = t.slice(0, 1).to_pylist()[0]
        dup["media_ref"] = "dup-of-0"
        t2 = pa.concat_tables([t, pa.Table.from_pylist([dup],
                                                       schema=t.schema)])
        pairs = media_dup_pairs(rd.from_arrow(t2), max_hamming=3) \
            .to_pandas()
        got = {(r.ref_a, r.ref_b, r.hamming)
               for r in pairs.itertuples()}
        planted = tuple(sorted([t.to_pylist()[0]["media_ref"],
                                "dup-of-0"]))
        assert (planted[0], planted[1], 0) in got
        # distinct synthetic payloads must not collide at hamming<=3
        assert all({a, b} == set(planted) for a, b, _ in got)

    def test_stub_codec_raises_at_decode(self, ray_session):
        import pytest as _pt
        import ray.data as rd

        from ocr_ray.stages.multimodal import (media_phashes,
                                               synth_media_table)

        ds = media_phashes(rd.from_arrow(synth_media_table(4)),
                           codec="stub")
        with _pt.raises(Exception):
            ds.materialize()

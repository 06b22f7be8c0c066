"""Training-corpus prep operators vs exact DuckDB oracles (registry is
capped at 50 driver entries; these are gated here instead)."""

import duckdb
import pandas as pd
import pytest

SF = "/root/testdata/sf0.001"


def _oracle(sql: str, sf: str = SF) -> pd.DataFrame:
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    return con.execute(sql).df()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _check(ray_res, sql: str, sf: str = SF):
    import pyarrow as pa
    import ray.data

    if isinstance(ray_res, (ray.data.Dataset,)):
        ray_df = ray_res.to_pandas()
    elif isinstance(ray_res, pa.Table):
        ray_df = ray_res.to_pandas()
    else:
        ray_df = ray_res
    pd.testing.assert_frame_equal(_canon(ray_df), _canon(_oracle(sql, sf)),
                                  check_dtype=False)


class TestCorpusPrep:
    def test_chunk_documents_content_exact(self, ray_session):
        from ocr_ray.functions import corpus_prep as cp
        _check(cp.chunk_documents(SF), cp.CHUNK_DOCUMENTS_SQL)

    def test_chunk_edge_cases(self, ray_session, tmp_path):
        """empty doc -> 1 empty chunk; exactly chunk_tokens -> 1 chunk;
        chunk_tokens+1 -> 2 chunks with the overlap window."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ocr_ray.functions import corpus_prep as cp

        rows = [
            {"doc_id": 1, "text": ""},
            {"doc_id": 2, "text": " ".join(f"t{i}" for i in range(128))},
            {"doc_id": 3, "text": " ".join(f"t{i}" for i in range(129))},
        ]
        pq.write_table(pa.Table.from_pylist(rows),
                       str(tmp_path / "documents.parquet"))
        out = cp.chunk_documents(str(tmp_path)).to_pandas()
        counts = out.groupby("doc_id")["chunk_id"].count().to_dict()
        assert counts == {1: 1, 2: 1, 3: 2}
        d3 = out[out.doc_id == 3].sort_values("chunk_id")
        assert list(d3["n_tokens"]) == [128, 17]  # 129-112 = 17 tail tokens

    def test_chunk_dedup_stats_exact(self, ray_session):
        from ocr_ray.functions import corpus_prep as cp
        _check(cp.chunk_dedup_stats(SF), cp.CHUNK_DEDUP_STATS_SQL)

    def test_quality_filter_stats_exact(self, ray_session):
        from ocr_ray.functions import corpus_prep as cp
        _check(cp.quality_filter_stats(SF), cp.QUALITY_FILTER_SQL)

    def test_contamination_check_exact(self, ray_session):
        from ocr_ray.functions import corpus_prep as cp
        _check(cp.contamination_check(SF), cp.CONTAMINATION_SQL)

    def test_contamination_finds_planted_overlap(self, ray_session,
                                                 tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ocr_ray.functions import corpus_prep as cp

        bench = ("alpha beta gamma delta epsilon zeta eta theta "
                 "iota kappa lambda mu")
        rows = [
            {"doc_id": 1, "text": bench},                    # probe
            {"doc_id": 2, "text": "clean text " * 10},       # probe
            {"doc_id": 3, "text": "more clean words " * 8},  # probe
            {"doc_id": 10, "text": f"prefix {bench} suffix"},   # leaked
            {"doc_id": 11, "text": "unrelated corpus doc " * 6},
        ]
        pq.write_table(pa.Table.from_pylist(rows),
                       str(tmp_path / "documents.parquet"))
        out = cp.contamination_check(str(tmp_path)).to_pandas()
        assert set(out["doc_id"]) == {10}
        assert int(out["n_hits"].iloc[0]) >= 1

    def test_contamination_external_probe_file(self, ray_session,
                                               tmp_path):
        """Decontaminate against a SEPARATE eval parquet (the real use:
        the benchmark is not part of the training corpus)."""
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ocr_ray.functions import corpus_prep as cp

        bench = ("alpha beta gamma delta epsilon zeta eta theta "
                 "iota kappa lambda mu")
        corpus = [
            {"doc_id": 1, "text": f"prefix {bench} suffix"},    # leaked
            {"doc_id": 2, "text": "clean corpus document " * 6},
        ]
        pq.write_table(pa.Table.from_pylist(corpus),
                       str(tmp_path / "documents.parquet"))
        evalset = [{"text": bench},
                   {"text": "held out benchmark question two " * 3}]
        probe = str(tmp_path / "evalset.parquet")
        pq.write_table(pa.Table.from_pylist(evalset), probe)
        out = cp.contamination_check(str(tmp_path),
                                     probe_path=probe).to_pandas()
        assert set(out["doc_id"]) == {1}

    def test_min_k_ids_streaming(self, ray_session):
        import ray.data as rd

        from ocr_ray.functions.corpus_prep import _min_k_ids

        ds = rd.from_items([{"doc_id": v} for v in
                            [9, 4, 7, 1, 8, 3, 12, 2]]).repartition(4)
        assert _min_k_ids(ds, "doc_id", 3) == [1, 2, 3]

    def test_bm25_scores_exact(self, ray_session):
        from ocr_ray.functions import corpus_prep as cp
        _check(cp.bm25_keyword_scores(SF), cp._bm25_sql())

    def test_stratified_sample_exact(self, ray_session):
        from ocr_ray.functions import corpus_prep as cp
        _check(cp.stratified_sample_stats(SF), cp.STRATIFIED_SAMPLE_SQL)

    def test_lang_char_quantiles_exact(self, ray_session):
        from ocr_ray.functions import corpus_prep as cp
        _check(cp.lang_char_quantiles(SF), cp.LANG_CHAR_QUANTILES_SQL)

    def test_source_char_quantiles_exact(self, ray_session):
        from ocr_ray.functions import corpus_prep as cp
        _check(cp.source_char_quantiles(SF), cp.SOURCE_CHAR_QUANTILES_SQL)

    def test_lang_char_quantiles_group_larger_than_batch(
            self, ray_session, tmp_path):
        """One skewed group far bigger than any batch: the histogram
        aggregate must reproduce DuckDB quantile_disc exactly (the old
        map_groups shape held the whole group in one task)."""
        import duckdb
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ocr_ray.functions import corpus_prep as cp

        rng = np.random.RandomState(3)
        n = 20_000
        langs = ["en"] * n + ["fr"] * 7      # en >> any batch size
        chars = np.concatenate([rng.randint(10, 5000, n),
                                np.array([3, 9, 27, 81, 243, 729, 2187])])
        pq.write_table(pa.table({
            "doc_id": pa.array(range(len(langs)), pa.int64()),
            "lang": pa.array(langs, pa.string()),
            "n_chars": pa.array(chars, pa.int64()),
            "text": pa.array([""] * len(langs), pa.string()),
        }), str(tmp_path / "documents.parquet"))
        got = cp.lang_char_quantiles(str(tmp_path)).to_pandas() \
            .sort_values("lang").reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'{tmp_path}/documents.parquet'")
        want = con.execute(cp.LANG_CHAR_QUANTILES_SQL + " ORDER BY lang") \
            .fetchdf().reset_index(drop=True)
        assert list(got["lang"]) == list(want["lang"])
        for c in ("p25", "p50", "p95"):
            assert [int(v) for v in got[c]] == [int(v) for v in want[c]], c


class TestGroupedQuantilesFloat:
    def test_registry_query_exact(self, ray_session):
        from ocr_ray.functions import corpus_prep as cp
        con = duckdb.connect()
        con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                    f"'{SF}/orders.parquet'")
        want = con.execute(cp.PRIORITY_PRICE_QUANTILES_SQL).df()
        got = cp.priority_price_quantiles(SF).to_pandas()
        pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                      check_dtype=False)

    def test_refinement_rounds_high_cardinality(self, ray_session,
                                                tmp_path):
        """Near-unique float values with a tiny gather_threshold so the
        B-ary rank search MUST run refinement rounds (the value-
        histogram shortcut would ship every distinct value to the
        driver).  Exact vs DuckDB quantile_disc, including ties planted
        at bin boundaries and a NULL group key + NULL values."""
        import duckdb
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ocr_ray.functions.corpus_prep import grouped_quantiles_float

        rng = np.random.RandomState(7)
        n = 30_000
        keys = (["en"] * n) + (["fr"] * 500) + ([None] * 100)
        vals = np.concatenate([
            rng.uniform(-1e6, 1e6, n - 64),
            np.full(64, 12345.0625),          # dense tie inside a bin
            rng.uniform(0, 1, 500),
            rng.uniform(5, 6, 100)])
        varr = vals.tolist()
        varr[n + 50] = None                   # NULL value: ignored
        pq.write_table(pa.table({
            "k": pa.array(keys, pa.string()),
            "v": pa.array(varr, pa.float64())}),
            str(tmp_path / "t.parquet"))
        import ray.data as rd
        ds = rd.read_parquet(str(tmp_path / "t.parquet"))
        got = grouped_quantiles_float(
            ds, "k", "v", n_bins=16, gather_threshold=64,
            max_rounds=8).to_pandas()
        con = duckdb.connect()
        con.execute(f"CREATE VIEW t AS SELECT * FROM "
                    f"'{tmp_path}/t.parquet'")
        want = con.execute(
            "SELECT k, quantile_disc(v, 0.25) AS p25, "
            "quantile_disc(v, 0.50) AS p50, "
            "quantile_disc(v, 0.95) AS p95 FROM t GROUP BY k "
            "ORDER BY k IS NULL, k").fetchdf()
        got = got.sort_values("k", na_position="last") \
            .reset_index(drop=True)
        want = want.reset_index(drop=True)
        assert list(got["k"].fillna("~")) == list(want["k"].fillna("~"))
        for c in ("p25", "p50", "p95"):
            assert list(got[c]) == list(want[c]), c

    def test_all_identical_values_degenerate(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from ocr_ray.functions.corpus_prep import grouped_quantiles_float

        ds = rd.from_arrow(pa.table({
            "k": pa.array(["a"] * 1000, pa.string()),
            "v": pa.array([3.5] * 1000, pa.float64())}))
        got = grouped_quantiles_float(ds, "k", "v", n_bins=4,
                                      gather_threshold=10,
                                      max_rounds=4).to_pylist()
        assert got == [{"k": "a", "p25": 3.5, "p50": 3.5, "p95": 3.5}]

    def test_cont_interpolated_vs_duckdb(self, ray_session, tmp_path):
        """percentile_cont mode: same rank search, two straddling order
        statistics per quantile, linear interpolation — vs DuckDB
        quantile_cont with refinement rounds forced on."""
        import duckdb
        import numpy as np
        import pyarrow as pa
        import pyarrow.parquet as pq
        import ray.data as rd

        from ocr_ray.functions.corpus_prep import grouped_quantiles_float

        rng = np.random.RandomState(11)
        keys = (["en"] * 20_000) + (["fr"] * 333)
        vals = np.concatenate([rng.uniform(-1e5, 1e5, 20_000),
                               rng.uniform(0, 10, 333)])
        pq.write_table(pa.table({"k": pa.array(keys, pa.string()),
                                 "v": pa.array(vals, pa.float64())}),
                       str(tmp_path / "t.parquet"))
        got = grouped_quantiles_float(
            rd.read_parquet(str(tmp_path / "t.parquet")), "k", "v",
            n_bins=16, gather_threshold=64, max_rounds=8,
            interpolation="cont").to_pandas()
        con = duckdb.connect()
        con.execute(f"CREATE VIEW t AS SELECT * FROM "
                    f"'{tmp_path}/t.parquet'")
        want = con.execute(
            "SELECT k, quantile_cont(v, 0.25) AS p25, "
            "quantile_cont(v, 0.50) AS p50, "
            "quantile_cont(v, 0.95) AS p95 FROM t GROUP BY k ORDER BY k"
        ).fetchdf()
        got = got.sort_values("k").reset_index(drop=True)
        for c in ("p25", "p50", "p95"):
            np.testing.assert_allclose(got[c], want[c], rtol=1e-12), c

    def test_cont_tiny_groups_match_numpy_linear(self, ray_session):
        """n=1 (degenerate), n=2 (pure interpolation), and an
        exact-integer h (frac == 0 -> single order statistic)."""
        import numpy as np
        import pyarrow as pa
        import ray.data as rd

        from ocr_ray.functions.corpus_prep import grouped_quantiles_float

        data = {"one": [7.5], "two": [1.0, 3.0],
                "five": [10.0, 20.0, 30.0, 40.0, 50.0]}
        ks, vs = [], []
        for k, arr in data.items():
            ks += [k] * len(arr)
            vs += arr
        ds = rd.from_arrow(pa.table({"k": pa.array(ks, pa.string()),
                                     "v": pa.array(vs, pa.float64())}))
        got = {r["k"]: r for r in grouped_quantiles_float(
            ds, "k", "v", qs={"p25": 0.25, "p50": 0.5, "p75": 0.75},
            interpolation="cont").to_pylist()}
        for k, arr in data.items():
            for name, q in (("p25", .25), ("p50", .5), ("p75", .75)):
                want = float(np.percentile(arr, q * 100,
                                           method="linear"))
                assert got[k][name] == pytest.approx(want, rel=1e-12), \
                    (k, name)


class TestBigramScores:
    def test_matches_pure_python_oracle(self, ray_session):
        import math

        import numpy as np
        import pyarrow.parquet as pq

        from ocr_ray.functions.corpus_prep import (
            _BIGRAM_DIM,
            _bigram_ids,
            char_bigram_logprob_scores,
        )

        tbl = pq.read_table(f"{SF}/documents.parquet",
                            columns=["doc_id", "text"])
        m = np.zeros((_BIGRAM_DIM, _BIGRAM_DIM), dtype=np.float64)
        for t in tbl["text"].to_pylist():
            ids = _bigram_ids(t)
            if len(ids) >= 2:
                np.add.at(m, (ids[:-1], ids[1:]), 1)
        logp = np.log((m + 0.5) / (m.sum(axis=1, keepdims=True)
                                   + 0.5 * _BIGRAM_DIM))
        want = {}
        for d, t in zip(tbl["doc_id"].to_pylist(), tbl["text"].to_pylist()):
            ids = _bigram_ids(t)
            s = (float(logp[ids[:-1], ids[1:]].mean())
                 if len(ids) >= 2 else 0.0)
            want[d] = math.floor(s * 1e6 + 0.5) / 1e6

        got = {r["doc_id"]: r["avg_logprob"]
               for r in char_bigram_logprob_scores(SF).take_all()}
        assert got == want

    def test_gibberish_scores_below_fluent(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ocr_ray.functions.corpus_prep import char_bigram_logprob_scores

        fluent = ("the quick brown fox jumps over the lazy dog and then "
                  "the dog sleeps in the warm sun near the old barn") * 3
        noise = "xqzj vwkx qjzx wvqk zzxj qkwv jxqz kvwx " * 8
        rows = [{"doc_id": i, "text": fluent} for i in range(1, 9)]
        rows.append({"doc_id": 9, "text": noise})
        pq.write_table(pa.Table.from_pylist(rows),
                       str(tmp_path / "documents.parquet"))
        got = {r["doc_id"]: r["avg_logprob"] for r in
               char_bigram_logprob_scores(str(tmp_path)).take_all()}
        assert got[9] < got[1]  # gibberish well below fluent text

    def test_lang_char_quantiles_null_group_key(self, ray_session,
                                                tmp_path):
        """SQL GROUP BY keeps a NULL-keyed group; the histogram fold
        must too (pandas' groupby default silently dropped it)."""
        import duckdb
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ocr_ray.functions import corpus_prep as cp

        pq.write_table(pa.table({
            "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
            "lang": pa.array(["en", "en", None, None], pa.string()),
            "n_chars": pa.array([10, 30, 7, 9], pa.int64()),
            "text": pa.array([""] * 4, pa.string()),
        }), str(tmp_path / "documents.parquet"))
        got = cp.lang_char_quantiles(str(tmp_path)).to_pandas()
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'{tmp_path}/documents.parquet'")
        want = con.execute(cp.LANG_CHAR_QUANTILES_SQL).fetchdf()
        assert len(got) == len(want) == 2
        nullrow = got[got["lang"].isna()]
        wantnull = want[want["lang"].isna()]
        assert len(nullrow) == 1
        for c in ("p25", "p50", "p95"):
            assert int(nullrow[c].iloc[0]) == int(wantnull[c].iloc[0])


class TestRepetitionStats:
    def test_exact_vs_sql(self, ray_session):
        from ocr_ray.functions import corpus_prep as cp
        _check(cp.repetition_stats(SF), cp.REPETITION_STATS_SQL)

    def test_planted_repetition(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ocr_ray.functions import corpus_prep as cp

        rows = [
            {"doc_id": 1, "text": "same line\nsame line\nother"},
            {"doc_id": 2, "text": "loop loop loop loop loop"},
            {"doc_id": 3, "text": "one"},          # <2 tokens
            {"doc_id": 4, "text": ""},
        ]
        pq.write_table(pa.Table.from_pylist(rows),
                       str(tmp_path / "documents.parquet"))
        out = cp.repetition_stats(str(tmp_path)).to_pandas() \
            .set_index("doc_id")
        assert int(out.loc[1, "dup_lines"]) == 1
        # 'loop loop' appears 4 times of 4 bigrams
        assert int(out.loc[2, "top_bigram_count"]) == 4
        assert int(out.loc[2, "n_bigrams"]) == 4
        assert int(out.loc[3, "n_bigrams"]) == 0
        assert int(out.loc[4, "n_bigrams"]) == 0
        import duckdb
        con = duckdb.connect()
        con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                    f"'{tmp_path}/documents.parquet'")
        want = con.execute(cp.REPETITION_STATS_SQL).df() \
            .set_index("doc_id").sort_index()
        got = out.sort_index()
        for c in ("n_lines", "dup_lines", "n_bigrams", "top_bigram_count"):
            assert list(got[c]) == [int(v) for v in want[c]], c


class TestSentenceChunking:
    def _ref(self, text, max_tokens):
        """Independent reference loop."""
        from ocr_ray.functions.corpus_prep import _tokens
        from ocr_ray.kernels.summarize import split_sentences

        out, cur, ct = [], [], 0
        for s in split_sentences(text or ""):
            nt = len(_tokens(s))
            if cur and ct + nt > max_tokens:
                out.append((" ".join(cur), ct, False))
                cur, ct = [], 0
            if nt > max_tokens:
                out.append((s, nt, True))
            else:
                cur.append(s)
                ct += nt
        if cur:
            out.append((" ".join(cur), ct, False))
        return out or [("", 0, False)]

    def test_no_sentence_split_and_budget(self):
        import pyarrow as pa

        from ocr_ray.functions.corpus_prep import sentence_chunk_batch
        from ocr_ray.kernels.summarize import split_sentences

        doc = " ".join(f"Sentence number {i} has exactly seven words."
                       for i in range(30))
        t = sentence_chunk_batch(
            pa.table({"doc_id": pa.array([1], pa.int64()),
                      "text": pa.array([doc])}), max_tokens=20)
        assert t.num_rows > 1
        sents = set(split_sentences(doc))
        for row in t.to_pylist():
            assert row["n_tokens"] <= 20 or row["oversize"]
            # every chunk is a concatenation of WHOLE sentences
            for s in split_sentences(row["text"]):
                assert s in sents
        # order-preserving reassembly: chunks joined == original
        joined = " ".join(r["text"] for r in t.to_pylist())
        assert joined == doc

    def test_oversize_sentence_flagged_not_split(self):
        import pyarrow as pa

        from ocr_ray.functions.corpus_prep import sentence_chunk_batch

        long_sent = " ".join(f"w{i}" for i in range(50)) + "."
        doc = "Short one. " + long_sent + " Short two."
        t = sentence_chunk_batch(
            pa.table({"doc_id": pa.array([1], pa.int64()),
                      "text": pa.array([doc])}), max_tokens=10)
        rows = t.to_pylist()
        ovs = [r for r in rows if r["oversize"]]
        assert len(ovs) == 1 and ovs[0]["n_tokens"] == 50
        assert ovs[0]["text"] == long_sent
        assert all(r["n_tokens"] <= 10 for r in rows if not r["oversize"])

    def test_matches_reference_on_varied_docs(self):
        import pyarrow as pa

        from ocr_ray.functions.corpus_prep import sentence_chunk_batch

        docs = [
            "",
            "no terminal punctuation at all",
            "One. Two. Three. Four. Five.",
            "A single very long sentence " + "pad " * 40 + "ends here.",
            "Mix! Of? Punctuation. And\nnewlines too. Final",
        ]
        t = sentence_chunk_batch(
            pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                      "text": pa.array(docs)}), max_tokens=12)
        got = {}
        for r in t.to_pylist():
            got.setdefault(r["doc_id"], []).append(
                (r["text"], r["n_tokens"], r["oversize"]))
        for i, d in enumerate(docs):
            assert got[i] == self._ref(d, 12), f"doc {i}"

    def test_distributed_equals_kernel(self, ray_session, tmp_path):
        import pyarrow as pa
        import pyarrow.parquet as pq

        from ocr_ray.functions.corpus_prep import (sentence_chunk_batch,
                                                   sentence_chunk_documents)

        docs = [f"Doc {i} first sentence. Doc {i} second sentence. "
                f"And a third one here." for i in range(20)]
        tbl = pa.table({"doc_id": pa.array(range(20), pa.int64()),
                        "text": pa.array(docs)})
        pq.write_table(tbl, str(tmp_path / "documents.parquet"))
        got = (sentence_chunk_documents(str(tmp_path), max_tokens=8)
               .to_pandas().sort_values(["doc_id", "chunk_id"])
               .reset_index(drop=True))
        want = (sentence_chunk_batch(tbl, max_tokens=8).to_pandas()
                .sort_values(["doc_id", "chunk_id"])
                .reset_index(drop=True))
        assert got.equals(want)

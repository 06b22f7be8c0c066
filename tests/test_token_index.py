"""Inverted token index: build/lookup parity vs the unnest SQL oracle,
one-bucket pruned reads, the stop-token gate, and AND search."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def built_index(ray_session, tmp_path_factory):
    from ocr_ray.functions.token_index import build_token_index

    # max_df_frac=1.0: the synthetic corpus's vocabulary is almost
    # entirely above 50% df (one sub-gate token corpus-wide), so the
    # parity fixture disables the stop gate; the gate itself is tested
    # on a planted corpus below
    out = str(tmp_path_factory.mktemp("tokidx") / "idx")
    manifest = build_token_index(SF, out, max_df_frac=1.0)
    return out, manifest


def _oracle(sql):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM "
                f"'{SF}/documents.parquet'")
    return con.execute(sql).fetchdf()


class TestTokenIndex:
    def test_lookup_matches_sql_for_sampled_tokens(self, built_index):
        from ocr_ray.functions.token_index import (
            lookup_token,
            lookup_token_sql,
        )

        from ocr_ray.functions.textops import _SQL_WS

        out, _ = built_index
        # pick real tokens across the df spectrum (gate disabled in
        # the fixture; see its comment)
        sample = _oracle(f"""
            WITH toks AS (
              SELECT doc_id, unnest(string_split_regex(
                       trim(text, {_SQL_WS}), '[ \t\n\r\f\v]+')) AS token
              FROM documents
              WHERE length(trim(text, {_SQL_WS})) > 0)
            SELECT token, count(DISTINCT doc_id) AS df FROM toks
            GROUP BY token
            ORDER BY df DESC, token LIMIT 8""")
        assert len(sample) >= 5
        for t in sample["token"]:
            want = _oracle(lookup_token_sql(t)).sort_values("doc_id") \
                .reset_index(drop=True)
            got = lookup_token(out, t).to_pandas() \
                .sort_values("doc_id").reset_index(drop=True)
            assert list(got["doc_id"]) == list(want["doc_id"]), t
            assert list(got["tf"]) == list(want["tf"]), t

    def test_lookup_reads_one_bucket(self, built_index):
        """Pruned read: lookup_token must touch exactly one bucket
        directory (the IVF file-list discipline)."""
        import unittest.mock as mock

        import ray.data as rd

        from ocr_ray.functions import token_index as m

        out, _ = built_index
        calls = []
        real = rd.read_parquet

        def spy(path, **kw):
            calls.append(path)
            return real(path, **kw)

        with mock.patch.object(rd, "read_parquet", side_effect=spy):
            m.lookup_token(out, "query").to_pandas()
        assert len(calls) == 1
        assert "bucket=" in str(calls[0])

    def test_stop_token_dropped(self, ray_session, tmp_path):
        """A token in >50% of docs is excluded at build time and the
        manifest records it."""
        from ocr_ray.functions.token_index import (
            build_token_index,
            lookup_token,
        )

        d = tmp_path / "sf"
        d.mkdir()
        rows = [(i, f"the unique{i} word{i % 2}") for i in range(10)]
        pq.write_table(pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string())}),
            d / "documents.parquet")
        out = str(tmp_path / "idx")
        manifest = build_token_index(str(d), out).to_pandas()
        assert manifest["n_stop_dropped"].sum() >= 1   # 'the' (df=10)
        assert lookup_token(out, "the").count() == 0
        # word0/word1 at df=5 (=50%, inside the cap) survive
        assert lookup_token(out, "word0").count() == 5

    def test_and_search(self, ray_session, tmp_path):
        from ocr_ray.functions.token_index import (
            build_token_index,
            search_all_tokens,
        )

        d = tmp_path / "sf"
        d.mkdir()
        rows = [(0, "alpha beta gamma x0"), (1, "alpha beta x1 y1"),
                (2, "alpha x2 y2 z2"), (3, "beta gamma x3 alpha beta")]
        pq.write_table(pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string())}),
            d / "documents.parquet")
        out = str(tmp_path / "idx")
        build_token_index(str(d), out, max_df_frac=1.0)
        got = search_all_tokens(out, ["alpha", "beta"]).to_pandas() \
            .sort_values("doc_id").reset_index(drop=True)
        assert list(got["doc_id"]) == [0, 1, 3]
        # doc 3 has beta twice: total_tf = 1 + 2
        assert list(got["total_tf"]) == [2, 2, 3]

    def test_postings_count_matches_manifest(self, built_index):
        import glob

        out, manifest = built_index
        total = 0
        for f in glob.glob(f"{out}/bucket=*/postings.parquet"):
            total += pq.ParquetFile(f).metadata.num_rows
        assert total == int(manifest["n_postings"].to_pandas().sum())


class TestRankedSearch:
    def test_matches_bruteforce_tfidf(self, ray_session, tmp_path):
        import math
        from collections import Counter

        from ocr_ray.functions.corpus_prep import _tokens
        from ocr_ray.functions.token_index import (
            build_token_index,
            search_ranked,
        )

        d = tmp_path / "sf"
        d.mkdir()
        rng = np.random.default_rng(6)
        vocab = [f"w{i}" for i in range(30)]
        rows = [(i, " ".join(rng.choice(vocab, 40))) for i in range(25)]
        pq.write_table(pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string())}),
            d / "documents.parquet")
        out = str(tmp_path / "idx")
        build_token_index(str(d), out, max_df_frac=1.0)

        query = ["w1", "w2", "w3"]
        got = search_ranked(out, query, k=5, n_docs=25).to_pandas()

        # brute-force oracle with the same micro-quantized idf
        df = Counter()
        tfs = {}
        for doc_id, text in rows:
            c = Counter(_tokens(text))
            tfs[doc_id] = c
            for t in set(c) & set(query):
                df[t] += 1
        idf = {t: int(round(math.log(25 / df[t]) * 1_000_000))
               for t in query if df[t]}
        scores = {doc: sum(tfs[doc].get(t, 0) * idf.get(t, 0)
                           for t in query) for doc, _ in rows}
        want = sorted(((s, doc) for doc, s in scores.items() if s > 0),
                      key=lambda p: (-p[0], p[1]))[:5]
        assert list(got["doc_id"]) == [doc for _, doc in want]
        assert list(got["score_micro"]) == [s for s, _ in want]

    def test_reads_only_query_buckets(self, ray_session, tmp_path):
        import unittest.mock as mock

        import ray.data as rd

        from ocr_ray.functions import token_index as m

        d = tmp_path / "sf"
        d.mkdir()
        pq.write_table(pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array(["alpha beta", "beta gamma"], pa.string())}),
            d / "documents.parquet")
        out = str(tmp_path / "idx")
        m.build_token_index(str(d), out, max_df_frac=1.0)
        calls = []
        real = rd.read_parquet

        def spy(path, **kw):
            calls.append(path)
            return real(path, **kw)

        with mock.patch.object(rd, "read_parquet", side_effect=spy):
            m.search_ranked(out, ["alpha"], k=3).to_pandas()
        assert len(calls) == 1
        assert all("bucket=" in str(p) for p in calls[0])

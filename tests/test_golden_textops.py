"""Golden-value oracles for the two deterministic-but-not-SQL queries
(doc_summaries, semantic_keyword_hits) — round-2 VERDICT #10.

These stay rows-only in the driver gate (a trained scorer / one-class
vector model is not SQL-expressible), but both kernels are pure
functions, so exact expected outputs are pinned here the way
tests/_reference_cleaner.py pins the cleaner.  A regression in either
kernel now fails a test instead of passing silently."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

DOCS = [
    ("Data pipelines shuffle rows. A vector index answers queries fast. "
     "Gardens bloom in spring. The batch engine joins tables with a hash "
     "join. Columnar scans prune early. Cats nap in the sun."),
    ("spark runs the query with a shuffle join over vector columns. "
     "spark caches the shuffle output between query stages."),
    ("short text no keywords here"),
]

# frozen expected outputs (generated once from the round-3 kernels)
GOLDEN_SUMMARIES = {
    1: ("Data pipelines shuffle rows. A vector index answers queries "
        "fast. Gardens bloom in spring. The batch engine joins tables "
        "with a hash join. Cats nap in the sun."),
    2: ("spark runs the query with a shuffle join over vector columns. "
        "spark caches the shuffle output between query stages."),
    3: "short text no keywords here",
}
GOLDEN_HITS = {
    1: [{"start": 15, "end": 37, "phrase": "shuffle rows. A vector",
         "score": 0.516029}],
    2: [{"start": 11, "end": 35, "phrase": "the query with a shuffle",
         "score": 0.482946}],
    3: [],
}


@pytest.fixture(scope="module")
def golden_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("golden_tx")
    pq.write_table(pa.Table.from_pylist(
        [{"doc_id": i + 1, "text": t} for i, t in enumerate(DOCS)]),
        str(d / "documents.parquet"))
    return str(d)


class TestDocSummariesGolden:
    def test_exact_summaries(self, ray_session, golden_dir):
        from ocr_ray.functions.textops import doc_summaries

        out = doc_summaries(golden_dir).to_pandas().set_index("doc_id")
        for doc_id, want in GOLDEN_SUMMARIES.items():
            assert out.loc[doc_id, "summary"] == want
            assert int(out.loc[doc_id, "summary_chars"]) == len(want)


class TestSemanticHitsGolden:
    def test_exact_span_hits(self, ray_session, golden_dir):
        from ocr_ray.functions.textops import semantic_keyword_hits

        out = semantic_keyword_hits(golden_dir).to_pandas()
        got = {i: [] for i in GOLDEN_HITS}
        for r in out.itertuples():
            got[r.doc_id].append({"start": r.start, "end": r.end,
                                  "phrase": r.phrase, "score": r.score})
        for doc_id, want in GOLDEN_HITS.items():
            rows = sorted(got[doc_id], key=lambda h: h["start"])
            assert rows == want, doc_id

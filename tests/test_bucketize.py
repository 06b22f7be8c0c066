"""Size-bucketed layout: one-pass partitioned write, then per-bucket jobs
whose combined output is span-sequence-equal to golden."""

import pyarrow.compute as pc
import pyarrow.dataset as pads
import pytest

from ocr_ray.golden import assert_span_equal
from ocr_ray.pipelines.bucketize import bucketize_corpus, run_bucketed_extraction


class TestBucketize:
    @pytest.fixture(scope="class")
    def bucketed(self, ray_session, small_corpus_path, tmp_path_factory):
        d = str(tmp_path_factory.mktemp("bucketed"))
        counts = bucketize_corpus(small_corpus_path, d, threshold=64)
        return d, counts

    def test_partition_counts(self, bucketed, small_corpus):
        d, counts = bucketed
        n_big = sum(
            1 for r in small_corpus.to_pylist()
            if r["spans"] is not None and len(r["spans"]) > 64)
        assert counts["big"] == n_big
        assert counts["small"] + counts["big"] == small_corpus.num_rows

    def test_bucketed_jobs_equal_golden(self, bucketed, golden_result,
                                        tmp_path_factory):
        d, _ = bucketed
        out = str(tmp_path_factory.mktemp("bucketed_out"))
        summary = run_bucketed_extraction(d, out)
        assert summary["extracted"] == golden_result["extracted"].num_rows
        assert summary["failed"] == golden_result["failed"].num_rows

        import pyarrow as pa

        parts = [
            pads.dataset(p).to_table(columns=["doc_id", "spans", "reject_reason"])
            for p in (f"{out}/small/extracted", f"{out}/big/extracted")
        ]
        tbl = pa.concat_tables(parts)
        ok = tbl.filter(pc.equal(tbl["reject_reason"], "")).select(
            ["doc_id", "spans"])
        assert_span_equal(ok, golden_result["extracted"])

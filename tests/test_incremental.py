"""Incremental dedup against the persistent band index: correctness,
pruned probe reads, and the no-rescan contract."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest


@pytest.fixture(scope="module")
def indexed_corpus(tmp_path_factory, ray_session):
    from ocr_ray.functions.incremental import build_band_index

    d = tmp_path_factory.mktemp("inc")
    base = ("the quick data pipeline processes large parquet tables with "
            "vectorized batch operators and spills to disk under pressure "
            "while the scheduler keeps every core busy with useful work")
    rows = [{"doc_id": 100, "text": base}]
    for i in range(60):  # unrelated indexed corpus
        rows.append({"doc_id": i,
                     "text": f"corpus doc {i} " + " ".join(
                         f"tok{i}x{j}" for j in range(40))})
    pq.write_table(pa.Table.from_pylist(rows),
                   str(d / "documents.parquet"))
    idx = str(d / "index")
    build_band_index(str(d), idx)
    return base, idx


class TestIncrementalDedup:
    def test_near_dup_increment_found(self, indexed_corpus):
        from ocr_ray.functions.incremental import dedup_new_against_index

        base, idx = indexed_corpus
        near = base.replace("useful work", "useful compute")
        new = pa.table({
            "doc_id": pa.array([1000, 1001], pa.int64()),
            "text": pa.array([near, "a completely novel document about "
                              "gardens tulips and sunshine"], pa.string()),
        })
        out = dedup_new_against_index(new, idx)
        pairs = {(r["new_doc"], r["indexed_doc"]): r["jaccard"]
                 for r in out.to_pylist()}
        assert (1000, 100) in pairs and pairs[(1000, 100)] >= 0.8
        assert not any(n == 1001 for n, _ in pairs)

    def test_exact_dup_increment_jaccard_one(self, indexed_corpus):
        from ocr_ray.functions.incremental import dedup_new_against_index

        base, idx = indexed_corpus
        new = pa.table({"doc_id": pa.array([2000], pa.int64()),
                        "text": pa.array([base], pa.string())})
        out = dedup_new_against_index(new, idx).to_pylist()
        assert {(r["new_doc"], r["indexed_doc"], r["jaccard"])
                for r in out} == {(2000, 100, 1.0)}

    def test_probe_reads_only_matching_partitions(self, indexed_corpus):
        """The file list the probe reads must be a strict subset of the
        index: only partitions the increment hashes into (the IVF
        pruned-read discipline applied to dedup)."""
        import os

        from ocr_ray.functions.dedup import _perm_params
        from ocr_ray.functions.incremental import (
            _band_rows,
            _PREFIX_CHARS,
            probe_band_paths,
        )

        base, idx = indexed_corpus
        a, b = _perm_params()
        band_id, band_hash, _, _, _ = _band_rows([9], [base], a, b)
        probes = {(bd, h[:_PREFIX_CHARS])
                  for bd, h in zip(band_id, band_hash)}
        paths = probe_band_paths(idx, probes)
        all_files = []
        for root, _, files in os.walk(f"{idx}/bands"):
            all_files.extend(os.path.join(root, f) for f in files
                             if f.endswith(".parquet"))
        assert 0 < len(paths) < len(all_files)
        assert set(paths) <= set(all_files)

    def test_append_dedups_across_increments(self, indexed_corpus,
                                             tmp_path):
        """Three successive increments with appends: a dup planted in
        increment 3 against a doc that arrived in increment 1 (never in
        the base corpus) must be found, and the probe must still read a
        strict subset of the index files (pruning survives appends)."""
        import os
        import shutil

        from ocr_ray.functions.dedup import _perm_params
        from ocr_ray.functions.incremental import (
            _band_rows,
            _PREFIX_CHARS,
            append_to_band_index,
            dedup_new_against_index,
            probe_band_paths,
        )

        base, idx0 = indexed_corpus
        idx = str(tmp_path / "index")
        shutil.copytree(idx0, idx)

        inc1_text = ("fresh increment one describes streaming shuffle "
                     "backpressure and actor pool scheduling across a "
                     "fixed size cluster of commodity nodes every day")
        inc1 = pa.table({"doc_id": pa.array([5001], pa.int64()),
                         "text": pa.array([inc1_text], pa.string())})
        assert dedup_new_against_index(inc1, idx).num_rows == 0
        append_to_band_index(inc1, idx)

        inc2 = pa.table({"doc_id": pa.array([5002], pa.int64()),
                         "text": pa.array(["increment two is about moss "
                                           "lichen ferns and granite"],
                                          pa.string())})
        assert dedup_new_against_index(inc2, idx).num_rows == 0
        append_to_band_index(inc2, idx)

        # increment 3: near-dup of the increment-1 doc + a novel doc
        inc3 = pa.table({
            "doc_id": pa.array([5003, 5004], pa.int64()),
            "text": pa.array([inc1_text.replace("every day", "all night"),
                              "novel increment three text with no "
                              "overlap against anything prior"],
                             pa.string())})
        pairs = {(r["new_doc"], r["indexed_doc"]): r["jaccard"]
                 for r in dedup_new_against_index(inc3, idx).to_pylist()}
        assert (5003, 5001) in pairs and pairs[(5003, 5001)] >= 0.8
        assert not any(n == 5004 for n, _ in pairs)

        # pruning still holds over the appended index
        a, b = _perm_params()
        band_id, band_hash, _, _, _ = _band_rows([9], [inc1_text], a, b)
        probes = {(bd, h[:_PREFIX_CHARS])
                  for bd, h in zip(band_id, band_hash)}
        paths = probe_band_paths(idx, probes)
        all_files = []
        for root, _, files in os.walk(f"{idx}/bands"):
            all_files.extend(os.path.join(root, f) for f in files
                             if f.endswith(".parquet"))
        assert 0 < len(paths) < len(all_files)
        assert set(paths) <= set(all_files)

    def test_compaction_merges_increment_files(self, indexed_corpus,
                                               tmp_path):
        """After appends, compaction must leave zero inc-* fragments,
        preserve probe results exactly, and keep hive pruning intact."""
        import os
        import shutil

        from ocr_ray.functions.incremental import (
            append_to_band_index,
            compact_band_index,
            dedup_new_against_index,
            increment_file_count,
        )

        base, idx0 = indexed_corpus
        idx = str(tmp_path / "index")
        shutil.copytree(idx0, idx)

        inc_text = ("compaction fixture increment with lots of band rows "
                    "describing parquet file merges and hive partitions "
                    "rewritten by a distributed pass over the index")
        inc = pa.table({"doc_id": pa.array([8001], pa.int64()),
                        "text": pa.array([inc_text], pa.string())})
        append_to_band_index(inc, idx)
        inc2 = pa.table({"doc_id": pa.array([8002], pa.int64()),
                         "text": pa.array(["another appended doc about "
                                           "rivers stones and rainfall"],
                                          pa.string())})
        append_to_band_index(inc2, idx)
        assert increment_file_count(idx) > 0

        probe = pa.table({
            "doc_id": pa.array([9001], pa.int64()),
            "text": pa.array([inc_text.replace("the index", "the table")],
                             pa.string())})
        before = sorted(map(tuple, (
            (r["new_doc"], r["indexed_doc"], r["jaccard"])
            for r in dedup_new_against_index(probe, idx).to_pylist())))
        assert any(o == 8001 for _, o, _ in before)

        assert compact_band_index(idx) is True
        assert increment_file_count(idx) == 0
        # no leftover tmp/old dirs from the swap
        assert not any(x.endswith((".compact-tmp", ".old"))
                       for x in os.listdir(idx))
        after = sorted(map(tuple, (
            (r["new_doc"], r["indexed_doc"], r["jaccard"])
            for r in dedup_new_against_index(probe, idx).to_pylist())))
        assert after == before
        # a second compaction with nothing appended is a no-op
        assert compact_band_index(idx) is False

    def test_bulk_increment_guard_raises(self, indexed_corpus):
        """A dup-heavy increment that blows the candidate-pair budget
        must be refused with guidance, not silently materialized on the
        driver (r3 VERDICT What's-wrong #6)."""
        from ocr_ray.functions.incremental import dedup_new_against_index

        base, idx = indexed_corpus
        new = pa.table({"doc_id": pa.array([7000, 7001], pa.int64()),
                        "text": pa.array([base, base], pa.string())})
        with pytest.raises(ValueError, match="small-increment contract"):
            dedup_new_against_index(new, idx, max_candidate_pairs=1)

    def test_novel_increment_no_pairs(self, indexed_corpus):
        from ocr_ray.functions.incremental import dedup_new_against_index

        _, idx = indexed_corpus
        new = pa.table({"doc_id": pa.array([3000], pa.int64()),
                        "text": pa.array(["entirely new content with zero "
                                          "overlap whatsoever here"],
                                         pa.string())})
        assert dedup_new_against_index(new, idx).num_rows == 0

    def test_interrupted_swap_is_recovered(self, indexed_corpus, tmp_path):
        """A kill between compaction's two swap renames (live gone, tmp
        complete) must be repaired on the next index operation — probe
        results byte-identical to an uninterrupted compaction (round-5
        ADVICE medium)."""
        import os
        import shutil

        from ocr_ray.functions.incremental import (
            append_to_band_index,
            compact_band_index,
            dedup_new_against_index,
            increment_file_count,
            recover_band_index,
        )

        base, idx0 = indexed_corpus
        idx = str(tmp_path / "index")
        shutil.copytree(idx0, idx)
        inc_text = ("swap crash fixture increment naming parquet rewrites "
                    "hive partitions and rename windows in enough words "
                    "to produce several shingles for the band hashes and "
                    "probe the partitions rebuilt by a pass over the index")
        append_to_band_index(
            pa.table({"doc_id": pa.array([8101], pa.int64()),
                      "text": pa.array([inc_text], pa.string())}), idx)
        probe = pa.table({
            "doc_id": pa.array([9101], pa.int64()),
            "text": pa.array([inc_text.replace("the index", "the table")],
                             pa.string())})
        want = sorted(map(tuple, (
            (r["new_doc"], r["indexed_doc"], r["jaccard"])
            for r in dedup_new_against_index(probe, idx).to_pylist())))
        assert any(o == 8101 for _, o, _ in want)

        # Simulate the crash window: tmp fully written, live renamed to
        # .old, second rename never happened — for BOTH subtables.
        for sub in ("bands", "features"):
            live = f"{idx}/{sub}"
            shutil.copytree(live, f"{live}.compact-tmp")
            os.rename(live, f"{live}.old")
            assert not os.path.isdir(live)

        # The next probe self-heals and returns identical pairs.
        got = sorted(map(tuple, (
            (r["new_doc"], r["indexed_doc"], r["jaccard"])
            for r in dedup_new_against_index(probe, idx).to_pylist())))
        assert got == want
        for sub in ("bands", "features"):
            assert os.path.isdir(f"{idx}/{sub}")
            assert not os.path.isdir(f"{idx}/{sub}.compact-tmp")
            assert not os.path.isdir(f"{idx}/{sub}.old")

        # Rollback leg: only .old survives (crash before tmp finished
        # would leave live intact, but a lost tmp must restore .old).
        for sub in ("bands", "features"):
            os.rename(f"{idx}/{sub}", f"{idx}/{sub}.old")
        assert recover_band_index(idx) is True
        got2 = sorted(map(tuple, (
            (r["new_doc"], r["indexed_doc"], r["jaccard"])
            for r in dedup_new_against_index(probe, idx).to_pylist())))
        assert got2 == want
        # recovered index still compacts normally
        assert increment_file_count(idx) > 0
        assert compact_band_index(idx) is True
        got3 = sorted(map(tuple, (
            (r["new_doc"], r["indexed_doc"], r["jaccard"])
            for r in dedup_new_against_index(probe, idx).to_pylist())))
        assert got3 == want

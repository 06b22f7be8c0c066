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

    def test_novel_increment_no_pairs(self, indexed_corpus):
        from ocr_ray.functions.incremental import dedup_new_against_index

        _, idx = indexed_corpus
        new = pa.table({"doc_id": pa.array([3000], pa.int64()),
                        "text": pa.array(["entirely new content with zero "
                                          "overlap whatsoever here"],
                                         pa.string())})
        assert dedup_new_against_index(new, idx).num_rows == 0

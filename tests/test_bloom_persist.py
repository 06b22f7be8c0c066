"""Bloom filter persistence: save/load round-trip, OR-merge == build
over the union, incremental file append with geometry refusal, and the
persisted-filter probe path through ngram_novelty_scores."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from ocr_ray.functions.bloom import (append_to_bloom_file,
                                     build_ngram_bloom, load_bloom,
                                     merge_blooms, save_bloom)

W, M, K = 4, 1 << 16, 4

A = pa.table({"text": pa.array([
    "alpha beta gamma delta epsilon zeta eta theta",
    "one two three four five six seven eight",
])})
B = pa.table({"text": pa.array([
    "red orange yellow green blue indigo violet ultra",
    "north south east west up down left right",
])})


def _build(tbl):
    return build_ngram_bloom(rd.from_arrow(tbl), window=W, m_bits=M,
                             k_hashes=K)


class TestPersistence:
    def test_save_load_roundtrip(self, ray_session, tmp_path):
        blob = _build(A)
        p = str(tmp_path / "f.bloom")
        save_bloom(blob, p, window=W, m_bits=M, k_hashes=K)
        got, meta = load_bloom(p)
        assert got == blob
        assert meta == {"window": W, "m_bits": M, "k_hashes": K}

    def test_save_refuses_wrong_size(self, tmp_path):
        with pytest.raises(ValueError, match="expected"):
            save_bloom(b"\x00" * 10, str(tmp_path / "f.bloom"),
                       window=W, m_bits=M, k_hashes=K)

    def test_load_refuses_foreign_file(self, tmp_path):
        p = tmp_path / "junk.bloom"
        p.write_bytes(b"not a filter at all")
        with pytest.raises(ValueError, match="not a saved bloom"):
            load_bloom(str(p))

    def test_atomic_overwrite(self, ray_session, tmp_path):
        p = str(tmp_path / "f.bloom")
        save_bloom(_build(A), p, window=W, m_bits=M, k_hashes=K)
        save_bloom(_build(B), p, window=W, m_bits=M, k_hashes=K)
        got, _ = load_bloom(p)
        assert got == _build(B)


class TestMerge:
    def test_merge_equals_union_build(self, ray_session):
        union = pa.concat_tables([A, B])
        assert merge_blooms(_build(A), _build(B)) == _build(union)

    def test_merge_refuses_size_mismatch(self, ray_session):
        other = build_ngram_bloom(rd.from_arrow(B), window=W,
                                  m_bits=M // 2, k_hashes=K)
        with pytest.raises(ValueError, match="mismatched"):
            merge_blooms(_build(A), other)

    def test_merge_is_bitwise_or(self, ray_session):
        a, b = _build(A), _build(B)
        want = np.bitwise_or(np.frombuffer(a, np.uint8),
                             np.frombuffer(b, np.uint8)).tobytes()
        assert merge_blooms(a, b) == want


class TestAppendFile:
    def test_incremental_append_equals_union(self, ray_session, tmp_path):
        p = str(tmp_path / "inc.bloom")
        append_to_bloom_file(p, rd.from_arrow(A), window=W, m_bits=M,
                             k_hashes=K)
        append_to_bloom_file(p, rd.from_arrow(B), window=W, m_bits=M,
                             k_hashes=K)
        got, _ = load_bloom(p)
        assert got == _build(pa.concat_tables([A, B]))

    def test_geometry_mismatch_refused(self, ray_session, tmp_path):
        p = str(tmp_path / "inc.bloom")
        append_to_bloom_file(p, rd.from_arrow(A), window=W, m_bits=M,
                             k_hashes=K)
        with pytest.raises(ValueError, match="Rebuild"):
            append_to_bloom_file(p, rd.from_arrow(B), window=W + 1,
                                 m_bits=M, k_hashes=K)

    def test_probe_through_novelty(self, ray_session, tmp_path):
        from ocr_ray.functions.novelty import ngram_novelty_scores

        p = str(tmp_path / "inc.bloom")
        append_to_bloom_file(p, rd.from_arrow(A), window=W, m_bits=M,
                             k_hashes=K)
        append_to_bloom_file(p, rd.from_arrow(B), window=W, m_bits=M,
                             k_hashes=K)
        ev = pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([
                A["text"][0].as_py(),          # in increment 1
                B["text"][1].as_py(),          # in increment 2
                "words absent from both increments entirely here now",
            ])})
        df = (ngram_novelty_scores(ev, mode="bloom", window=W,
                                   bloom_path=p)
              .to_pandas().set_index("doc_id"))
        assert df.loc[1, "novelty"] == 0.0
        assert df.loc[2, "novelty"] == 0.0
        assert df.loc[3, "novelty"] == 1.0

    def test_probe_window_mismatch_refused(self, ray_session, tmp_path):
        from ocr_ray.functions.novelty import ngram_novelty_scores

        p = str(tmp_path / "inc.bloom")
        append_to_bloom_file(p, rd.from_arrow(A), window=W, m_bits=M,
                             k_hashes=K)
        ev = pa.table({"doc_id": pa.array([1], pa.int64()),
                       "text": pa.array(["some words"])})
        with pytest.raises(ValueError, match="geometries differ"):
            ngram_novelty_scores(ev, mode="bloom", window=W + 2,
                                 bloom_path=p)

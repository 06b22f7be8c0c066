"""Content-defined chunking: kernel parity vs an independent per-byte
reference, partition/bounds invariants, the resynchronization property
that justifies CDC over fixed windows, and the distributed chunk-dedup
stats."""

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_ray.functions.cdc_chunk import (
    cdc_boundaries,
    cdc_boundaries_reference,
    cdc_chunk_documents,
    cdc_dedup_stats,
    cdc_shared_chunks,
    window_hashes,
)


def _rand_bytes(n: int, seed: int) -> np.ndarray:
    return np.frombuffer(
        hashlib.blake2b(str(seed).encode(),
                        digest_size=64).digest() * (n // 64 + 1),
        np.uint8)[:n].copy()


def _rng_bytes(n: int, seed: int) -> np.ndarray:
    return np.random.default_rng(seed).integers(
        0, 256, n, dtype=np.uint8)


class TestKernel:
    @pytest.mark.parametrize("n,seed", [(0, 0), (1, 1), (15, 2), (16, 3),
                                        (63, 4), (64, 5), (1000, 6),
                                        (5000, 7)])
    def test_matches_reference(self, n, seed):
        buf = _rng_bytes(n, seed)
        assert cdc_boundaries(buf) == cdc_boundaries_reference(buf)

    def test_matches_reference_tight_params(self):
        # small min/max exercise the forced-cut leg heavily
        for seed in range(5):
            buf = _rng_bytes(800, 100 + seed)
            got = cdc_boundaries(buf, min_size=20, avg_bits=5,
                                 max_size=90)
            want = cdc_boundaries_reference(buf, min_size=20,
                                            avg_bits=5, max_size=90)
            assert got == want

    def test_partition_and_bounds(self):
        buf = _rng_bytes(20000, 42)
        ends = cdc_boundaries(buf, min_size=64, avg_bits=8,
                              max_size=1024)
        assert ends[-1] == len(buf)
        assert ends == sorted(set(ends))
        sizes = np.diff([0] + ends)
        # every chunk but the last respects [min, max]
        assert (sizes[:-1] >= 64).all() and (sizes <= 1024).all()
        # average lands near 2^8 (loose: forced cuts + min skew it)
        assert 100 < sizes.mean() < 700

    def test_deterministic(self):
        buf = _rng_bytes(4096, 7)
        assert cdc_boundaries(buf) == cdc_boundaries(buf.copy())

    def test_window_hash_is_windowed(self):
        # the hash at position i depends ONLY on bytes (i-15..i): two
        # buffers agreeing on a suffix agree on suffix hashes
        a = _rng_bytes(256, 1)
        b = a.copy()
        b[:40] = _rng_bytes(40, 2)
        ha, hb = window_hashes(a), window_hashes(b)
        assert (ha[40 + 16 - 1:] == hb[40 + 16 - 1:]).all()
        assert (ha[16:40] != hb[16:40]).any()


class TestResync:
    def test_prefix_edit_resynchronizes(self):
        """THE property fixed-size chunking lacks: prepend bytes to a
        doc and most chunk hashes survive."""
        base = _rng_bytes(30000, 9)
        edited = np.concatenate([_rng_bytes(3, 77), base])

        def md5s(buf):
            ends = cdc_boundaries(buf)
            out, last = [], 0
            for e in ends:
                out.append(hashlib.md5(buf[last:e].tobytes()).hexdigest())
                last = e
            return out

        a, b = set(md5s(base)), set(md5s(edited))
        shared = len(a & b) / len(a)
        assert shared > 0.8, shared

        # fixed-size control: same edit, 256-byte windows -> ~no overlap
        def fixed_md5s(buf):
            return {hashlib.md5(buf[i:i + 256].tobytes()).hexdigest()
                    for i in range(0, len(buf), 256)}

        fixed_shared = len(fixed_md5s(base) & fixed_md5s(edited)) / \
            len(fixed_md5s(base))
        assert fixed_shared < 0.05, fixed_shared


def _write_docs(tmp_path, rows):
    d = tmp_path / "sf"
    d.mkdir(exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string()),
    }), d / "documents.parquet")
    return str(d)


class TestDistributed:
    def test_chunks_partition_every_doc(self, ray_session, tmp_path):
        rng = np.random.default_rng(3)
        texts = ["".join(chr(97 + c) for c in
                         rng.integers(0, 26, int(n)))
                 for n in rng.integers(0, 4000, 20)]
        sf = _write_docs(tmp_path, list(enumerate(texts)))
        df = cdc_chunk_documents(sf).to_pandas()
        for doc_id, text in enumerate(texts):
            g = df[df.doc_id == doc_id].sort_values("chunk_id")
            assert g.iloc[0].start == 0
            assert g.iloc[-1].end == len(text.encode())
            assert (g.end.values[:-1] == g.start.values[1:]).all()
            # md5 round-trips to the actual bytes
            raw = text.encode()
            for _, r in g.iterrows():
                assert r.chunk_md5 == hashlib.md5(
                    raw[r.start:r.end]).hexdigest()

    def test_shared_chunks_find_planted_passage(self, ray_session,
                                                tmp_path):
        rng = np.random.default_rng(5)
        mk = lambda n, s: "".join(
            chr(97 + c) for c in
            np.random.default_rng(s).integers(0, 26, n))
        passage = mk(3000, 99)
        rows = [(0, mk(2000, 1) + passage + mk(2000, 2)),
                (1, mk(1500, 3) + passage + mk(2500, 4)),
                (2, mk(6000, 5))]
        sf = _write_docs(tmp_path, rows)
        shared = cdc_shared_chunks(sf).to_pandas()
        assert len(shared) >= 3           # interior passage chunks
        assert (shared.n_docs >= 2).all()
        # and the lone doc contributes no shared chunk: every shared
        # md5 appears in docs 0/1's chunk sets
        chunks = cdc_chunk_documents(sf).to_pandas()
        lone = set(chunks[chunks.doc_id == 2].chunk_md5)
        both = set(chunks[chunks.doc_id == 0].chunk_md5) & \
            set(chunks[chunks.doc_id == 1].chunk_md5)
        assert set(shared.chunk_md5) <= both | lone
        assert not (set(shared.chunk_md5) & (lone - both))

    def test_dedup_stats_on_duplicated_corpus(self, ray_session,
                                              tmp_path):
        mk = lambda n, s: "".join(
            chr(97 + c) for c in
            np.random.default_rng(s).integers(0, 26, n))
        text = mk(20000, 11)
        sf = _write_docs(tmp_path, [(0, text), (1, text), (2, mk(500, 12))])
        stats = cdc_dedup_stats(sf)
        total = len(text.encode()) * 2 + len(mk(500, 12).encode())
        assert stats["total_bytes"] == total
        # the duplicated doc stores once: unique ~ half the dup pair
        assert stats["unique_bytes"] <= len(text.encode()) + 500
        assert stats["dedup_ratio"] < 0.6

    def test_layout_independent(self, ray_session, tmp_path):
        import ray.data as rd

        mk = lambda n, s: "".join(
            chr(97 + c) for c in
            np.random.default_rng(s).integers(0, 26, n))
        rows = [(i, mk(3000 + i, i)) for i in range(8)]
        sf = _write_docs(tmp_path, rows)
        a = cdc_chunk_documents(sf).to_pandas() \
            .sort_values(["doc_id", "chunk_id"]).reset_index(drop=True)
        # same corpus through a repartitioned read
        from ocr_ray.functions import cdc_chunk as m
        ds = rd.read_parquet(f"{sf}/documents.parquet").repartition(7)
        import unittest.mock as mock
        with mock.patch.object(m, "_read", lambda s, c: ds):
            b = cdc_chunk_documents(sf).to_pandas() \
                .sort_values(["doc_id", "chunk_id"]) \
                .reset_index(drop=True)
        import pandas as pd
        pd.testing.assert_frame_equal(a, b)

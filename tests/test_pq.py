"""Product-quantization ANN: exactness on a planted codebook corpus,
deterministic rebuilds, pruned reads, recall vs brute force, and the
compression contract."""

import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pqt
import pytest

SF = "/root/testdata/sf0.001"


def _write_corpus(path, mat: np.ndarray):
    os.makedirs(path, exist_ok=True)
    tbl = pa.table({
        "vec_id": pa.array(np.arange(len(mat)), pa.int64()),
        "embedding": pa.array([row.tolist() for row in mat],
                              pa.list_(pa.float32())),
        "label": pa.array(np.zeros(len(mat), np.int32), pa.int32()),
    })
    pqt.write_table(tbl, f"{path}/embeddings.parquet", row_group_size=64)


def _planted_matrix(m=4, k=4, dsub=4, seed=7) -> np.ndarray:
    """Vectors that ARE concatenations of k well-separated prototypes
    per subspace — PQ can represent them with zero quantization error
    once Lloyd converges, so ADC == exact cosine."""
    rng = np.random.RandomState(seed)
    protos = rng.randn(m, k, dsub) * 4.0 + \
        np.arange(k)[None, :, None] * 10.0
    rows = []
    for i in range(128):
        choice = [(i + mi * 3 + i // k) % k for mi in range(m)]
        rows.append(np.concatenate([protos[mi, c]
                                    for mi, c in enumerate(choice)]))
    return np.asarray(rows, dtype=np.float64)


class TestPlantedExactness:
    def test_matches_bruteforce_exactly(self, ray_session, tmp_path):
        from ocr_ray.functions.pq import knn_pq
        from ocr_ray.functions.similarity import knn_bruteforce

        sf = str(tmp_path / "sf")
        _write_corpus(sf, _planted_matrix())
        exact = knn_bruteforce(sf, query_vec_id=3, k=8).take_all()
        approx = knn_pq(sf, query_vec_id=3, k=8, m=4, nbits=2,
                        n_clusters=4).take_all()
        assert [(r["vec_id"], r["cosine"]) for r in approx] == \
               [(r["vec_id"], r["cosine"]) for r in exact]

    def test_zero_reconstruction_error(self, ray_session, tmp_path):
        from ocr_ray.functions.pq import (
            _encode,
            _normalize_rows,
            build_pq_index,
        )

        sf = str(tmp_path / "sf")
        mat = _planted_matrix()
        _write_corpus(sf, mat)
        _, cbs, _ = build_pq_index(sf, m=4, nbits=2, n_clusters=4)
        xn = _normalize_rows(mat)
        codes = _encode(xn, cbs)
        dsub = cbs.shape[2]
        recon = np.concatenate(
            [cbs[mi, codes[:, mi]] for mi in range(cbs.shape[0])], axis=1)
        assert recon.shape == xn.shape and dsub == 4
        # bounded by the refinement's 2^-24 fixed-point resolution and
        # the corpus file's float32 storage, not by codebook coarseness
        assert np.max(np.abs(recon - xn)) < 1e-6


class TestDeterminism:
    def test_rebuild_identical(self, ray_session, tmp_path):
        """Two fresh builds over the same file produce bit-identical
        codebooks and code files (integer-exact refinement aggregate:
        merge order and block layout cannot leak in)."""
        from ocr_ray.functions.pq import build_pq_index, pq_index_path

        sf = str(tmp_path / "sf")
        rng = np.random.RandomState(11)
        _write_corpus(sf, rng.randn(300, 32))
        path = pq_index_path(sf, 8, 4, 4)
        p1, cbs1, _ = build_pq_index(sf, m=8, nbits=4, n_clusters=4)
        codes1 = pqt.read_table(p1).sort_by("vec_id")
        shutil.rmtree(path)
        p2, cbs2, _ = build_pq_index(sf, m=8, nbits=4, n_clusters=4)
        codes2 = pqt.read_table(p2).sort_by("vec_id")
        assert np.array_equal(cbs1, cbs2)
        assert codes1.equals(codes2)


class TestPrunedRead:
    def test_only_probed_buckets_read(self, ray_session):
        from ocr_ray.functions.pq import build_pq_index
        from ocr_ray.functions.similarity import (
            _query_vector,
            probe_partitions,
        )

        path, _, cent = build_pq_index(SF, m=8, nbits=4, n_clusters=8)
        buckets = [d for d in os.listdir(path) if d.startswith("bucket=")]
        assert len(buckets) > 2
        q = _query_vector(SF, 0)
        probed = probe_partitions(path, cent, q, nprobe=2)
        probed_buckets = {p.split("/")[-2] for p in probed}
        assert 1 <= len(probed_buckets) <= 2
        assert all(p.startswith(path) for p in probed)

    def test_bucket_layout_matches_ivf(self, ray_session):
        """Codes are partitioned by the SAME assignment as the IVF
        index, so IVF-PQ probing prunes identically."""
        from ocr_ray.functions.pq import build_pq_index
        from ocr_ray.functions.similarity import build_ivf_index

        ppath, _, _ = build_pq_index(SF, m=8, nbits=4, n_clusters=8)
        ipath, _ = build_ivf_index(SF, n_clusters=8)
        pq_counts = {}
        for name in os.listdir(ppath):
            if name.startswith("bucket="):
                d = f"{ppath}/{name}"
                pq_counts[name] = sum(
                    pqt.ParquetFile(f"{d}/{f}").metadata.num_rows
                    for f in os.listdir(d) if f.endswith(".parquet"))
        ivf_counts = {}
        for name in os.listdir(ipath):
            if name.startswith("bucket="):
                d = f"{ipath}/{name}"
                ivf_counts[name] = sum(
                    pqt.ParquetFile(f"{d}/{f}").metadata.num_rows
                    for f in os.listdir(d) if f.endswith(".parquet"))
        assert pq_counts == ivf_counts


class TestRecallAndCompression:
    def test_recall_at_10(self, ray_session):
        from ocr_ray.functions.pq import knn_pq
        from ocr_ray.functions.similarity import knn_bruteforce

        exact = {r["vec_id"] for r in knn_bruteforce(SF, k=10).take_all()}
        approx = {r["vec_id"] for r in
                  knn_pq(SF, k=10, refine_factor=4).take_all()}
        assert len(exact & approx) / len(exact) >= 0.9

    def test_query_is_own_top_hit(self, ray_session):
        from ocr_ray.functions.pq import knn_pq

        top = knn_pq(SF, query_vec_id=5, k=1).take_all()
        assert top and top[0]["vec_id"] == 5
        assert top[0]["cosine"] == pytest.approx(1.0)

    def test_index_is_compressed(self, ray_session):
        from ocr_ray.functions.pq import build_pq_index

        path, cbs, _ = build_pq_index(SF, m=8, nbits=4, n_clusters=8)
        raw = os.stat(f"{SF}/embeddings.parquet").st_size
        idx = sum(os.path.getsize(os.path.join(r, f))
                  for r, _, fs in os.walk(path) for f in fs
                  if f.endswith(".parquet"))
        # d=64 float32 -> 8 code bytes + 8 id bytes per row: the code
        # table must be several times smaller than the vectors
        assert idx < raw / 4
        assert cbs.shape == (8, 16, 8)

    def test_k_exceeds_rows(self, ray_session, tmp_path):
        from ocr_ray.functions.pq import knn_pq

        sf = str(tmp_path / "sf")
        rng = np.random.RandomState(3)
        _write_corpus(sf, rng.randn(6, 16))
        out = knn_pq(sf, k=50, m=4, nbits=2, n_clusters=2).take_all()
        assert len(out) == 6


class TestKnnPqBatch:
    def test_batch_matches_per_query_pq(self, ray_session):
        """Each query's batched answer equals running knn_pq alone
        (same index, same nprobe/refine) — batching only dedups IO."""
        from ocr_ray.functions.pq import knn_pq, knn_pq_batch

        out = knn_pq_batch(SF, n_queries=4, k=5, nprobe=6).to_pandas()
        for qid in range(4):
            got = out[out["query_id"] == qid]
            single = knn_pq(SF, query_vec_id=qid, k=5,
                            nprobe=6).to_pandas()
            assert list(got["vec_id"]) == list(single["vec_id"])
            assert list(got["cosine"]) == list(single["cosine"])

    def test_each_query_is_own_top_hit(self, ray_session):
        from ocr_ray.functions.pq import knn_pq_batch

        out = knn_pq_batch(SF, n_queries=6, k=3).to_pandas()
        for qid, g in out.groupby("query_id"):
            top = g.sort_values(["cosine", "vec_id"],
                                ascending=[False, True]).iloc[0]
            assert top["vec_id"] == qid and top["cosine"] == 1.0


class TestAppend:
    def test_appended_vector_is_searchable(self, ray_session, tmp_path):
        """Append a near-copy of the query vector after the build: the
        probe must surface it; committed files stay byte-untouched;
        bucket counts grow by exactly the appended rows."""
        import json

        from ocr_ray.functions.pq import (
            append_to_pq_index,
            build_pq_index,
            knn_pq,
        )

        sf = str(tmp_path / "sf")
        rng = np.random.RandomState(21)
        base = rng.randn(200, 32)
        _write_corpus(sf, base)
        path, _, _ = build_pq_index(sf, m=8, nbits=4, n_clusters=4)
        before = {}
        for r, _, fs in os.walk(path):
            for f in fs:
                if f.endswith(".parquet"):
                    p = os.path.join(r, f)
                    before[p] = os.stat(p).st_mtime_ns
        counts_before = json.load(open(f"{path}/_bucket_counts.json"))

        # new rows: a near-duplicate of vector 0 plus background
        q = base[0]
        new = np.vstack([q + rng.randn(32) * 0.01,
                         rng.randn(9, 32)])
        newt = pa.table({
            "vec_id": pa.array(np.arange(1000, 1010), pa.int64()),
            "embedding": pa.array([r.tolist() for r in new],
                                  pa.list_(pa.float32())),
            "label": pa.array(np.zeros(10, np.int32), pa.int32())})
        pqt.write_table(newt, str(tmp_path / "new.parquet"))
        res = append_to_pq_index(path, str(tmp_path / "new.parquet"))
        assert res["rows"] == 10

        # committed files untouched
        for p, mt in before.items():
            assert os.stat(p).st_mtime_ns == mt
        counts_after = json.load(open(f"{path}/_bucket_counts.json"))
        assert (sum(counts_after.values())
                == sum(counts_before.values()) + 10)

        # the planted near-copy must now be vector 0's top-2 neighbor
        # (knn_pq rebuilds nothing: the cached index path is reused)
        top = knn_pq(sf, query_vec_id=0, k=2, m=8, nbits=4,
                     n_clusters=4).take_all()
        assert {r["vec_id"] for r in top} == {0, 1000}

"""Near-dup detection recall/precision on planted duplicates."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_ray.functions.dedup import (
    _minhash,
    _perm_params,
    _shingles,
    _simhash,
    embedding_dup_pairs,
    minhash_lsh_pairs,
    simhash_pairs,
)


@pytest.fixture(scope="module")
def planted_dir(tmp_path_factory):
    """documents.parquet with known near/exact dup pairs + embeddings."""
    base = ("the quick data pipeline processes large parquet tables with "
            "vectorized batch operators and spills to disk under pressure "
            "while the scheduler keeps every core busy with useful work")
    near = base.replace("useful work", "useful compute")  # 1-word change
    far = "completely different short text about gardening and tulips"
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base},        # exact dup of 1
        {"doc_id": 3, "text": near},        # near dup of 1
        {"doc_id": 4, "text": far},
        {"doc_id": 5, "text": "word salad " * 30},
    ]
    d = tmp_path_factory.mktemp("planted")
    pq.write_table(pa.Table.from_pylist(rows), str(d / "documents.parquet"))

    import numpy as np
    vecs = []
    rng = np.random.RandomState(7)
    v1 = rng.randn(16)
    vecs.append({"vec_id": 1, "embedding": v1.tolist()})
    vecs.append({"vec_id": 2, "embedding": (v1 + rng.randn(16) * 0.01).tolist()})
    vecs.append({"vec_id": 3, "embedding": rng.randn(16).tolist()})
    pq.write_table(pa.Table.from_pylist(vecs), str(d / "embeddings.parquet"))
    return str(d)


class TestMinhash:
    def test_exact_and_near_dup_found(self, ray_session, planted_dir):
        pairs = minhash_lsh_pairs(planted_dir, jaccard_threshold=0.5).to_pandas()
        found = {(r.doc_a, r.doc_b) for r in pairs.itertuples()}
        assert (1, 2) in found            # exact dup
        assert (1, 3) in found or (2, 3) in found  # near dup
        # no false positives against the unrelated docs
        assert not any(4 in p or 5 in p for p in found)
        exact = pairs[(pairs.doc_a == 1) & (pairs.doc_b == 2)]
        assert float(exact["jaccard"].iloc[0]) == 1.0

    def test_minhash_jaccard_estimate(self):
        a, b = _perm_params()
        s1 = _shingles("one two three four five six seven eight nine ten")
        s2 = _shingles("one two three four five six seven eight nine ten")
        assert (_minhash(s1, a, b) == _minhash(s2, a, b)).all()


class TestSimhash:
    def test_exact_dup_zero_hamming(self, ray_session, planted_dir):
        pairs = simhash_pairs(planted_dir).to_pandas()
        exact = pairs[(pairs.doc_a == 1) & (pairs.doc_b == 2)]
        assert len(exact) == 1 and int(exact["hamming"].iloc[0]) == 0

    def test_simhash_stability(self):
        t = "stable deterministic text for hashing purposes here"
        assert _simhash(t) == _simhash(t)
        assert _simhash(t) != _simhash(t + " changed")


class TestEmbeddingDups:
    def test_near_identical_vectors_found(self, ray_session, planted_dir):
        pairs = embedding_dup_pairs(planted_dir, cosine_threshold=0.99).to_pandas()
        found = {(r.vec_a, r.vec_b) for r in pairs.itertuples()}
        assert (1, 2) in found
        assert not any(3 in p for p in found)


class TestClusters:
    def test_components_from_pairs(self, ray_session):
        import pyarrow as pa

        from ocr_ray.functions.dedup import dedup_clusters

        pairs = pa.table({
            "doc_a": pa.array([1, 2, 7, 10], pa.int64()),
            "doc_b": pa.array([2, 3, 8, 11], pa.int64()),
        })  # components {1,2,3}, {7,8}, {10,11}
        out = dedup_clusters(pairs).to_pylist()
        got = {r["doc_id"]: r["cluster_id"] for r in out}
        assert got == {1: 1, 2: 1, 3: 1, 7: 7, 8: 7, 10: 10, 11: 10}

    def test_planted_corpus_clusters(self, ray_session, planted_dir):
        from ocr_ray.functions.dedup import dedup_clusters, minhash_lsh_pairs

        pairs = minhash_lsh_pairs(planted_dir, jaccard_threshold=0.5)
        out = {r["doc_id"]: r["cluster_id"]
               for r in dedup_clusters(pairs).to_pylist()}
        # docs 1,2,3 collapse into one cluster rooted at 1
        assert out[1] == out[2] == out[3] == 1

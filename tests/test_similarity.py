"""IVF index: pruned reads (file-list check) + recall vs brute force."""

import numpy as np
import pytest

SF = "/root/testdata/sf0.001"


class TestIvfIndex:
    def test_only_nprobe_partitions_read(self, ray_session):
        from ocr_ray.functions.similarity import (
            _query_vector,
            build_ivf_index,
            probe_partitions,
        )

        path, cent = build_ivf_index(SF, n_clusters=8)
        import os
        buckets = [d for d in os.listdir(path) if d.startswith("bucket=")]
        assert len(buckets) > 2  # a real partitioned layout exists
        q = _query_vector(SF, 0)
        probed = probe_partitions(path, cent, q, nprobe=2)
        probed_buckets = {p.split("/")[-2] for p in probed}
        assert 1 <= len(probed_buckets) <= 2   # reads ONLY nprobe buckets
        assert all(b.startswith("bucket=") for b in probed_buckets)

    def test_recall_vs_bruteforce(self, ray_session):
        from ocr_ray.functions.similarity import knn_bruteforce, knn_ivf

        exact = {r["vec_id"] for r in knn_bruteforce(SF, k=10).take_all()}
        approx = {r["vec_id"] for r in
                  knn_ivf(SF, k=10, n_clusters=8, nprobe=4).take_all()}
        recall = len(exact & approx) / len(exact)
        assert recall >= 0.5  # nprobe=4 of 8 buckets: well above half

    def test_query_vector_in_probed_bucket(self, ray_session):
        # probing the bucket containing the query vector itself must
        # return the query as its own top hit (cosine 1.0)
        from ocr_ray.functions.similarity import knn_ivf

        top = knn_ivf(SF, query_vec_id=0, k=1, n_clusters=8,
                      nprobe=1).take_all()
        assert top and top[0]["vec_id"] == 0
        assert top[0]["cosine"] == pytest.approx(1.0)


class TestKnnBatch:
    def test_batch_topk_vs_sql(self, ray_session):
        import duckdb

        from ocr_ray.functions.similarity import (
            KNN_BATCH_SQL,
            knn_batch_bruteforce,
        )

        got = knn_batch_bruteforce(SF).to_pandas() \
            .sort_values(["query_id", "cosine", "vec_id"],
                         ascending=[True, False, True]) \
            .reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW embeddings AS SELECT * FROM "
                    f"'{SF}/embeddings.parquet'")
        want = con.execute(
            KNN_BATCH_SQL + " ORDER BY query_id, cosine DESC, vec_id") \
            .fetchdf().reset_index(drop=True)
        assert len(got) == len(want) == 8 * 5
        assert list(got["query_id"]) == list(want["query_id"])
        assert list(got["vec_id"]) == list(want["vec_id"])
        assert np.allclose(got["cosine"], want["cosine"], atol=0)

    def test_each_query_is_own_top_hit(self, ray_session):
        from ocr_ray.functions.similarity import knn_batch_bruteforce

        out = knn_batch_bruteforce(SF).to_pandas()
        for qid, g in out.groupby("query_id"):
            top = g.sort_values(["cosine", "vec_id"],
                                ascending=[False, True]).iloc[0]
            assert top["vec_id"] == qid and top["cosine"] == 1.0


class TestKnnIvfBatch:
    def test_batch_matches_per_query_ivf(self, ray_session):
        """Each query's batched answer must equal running knn_ivf for
        that query alone (same index, same nprobe) — the batching only
        dedups IO, never changes visibility."""
        from ocr_ray.functions.similarity import knn_ivf, knn_ivf_batch

        out = knn_ivf_batch(SF, n_queries=4, k=5,
                            n_clusters=8, nprobe=3).to_pandas()
        for qid in range(4):
            got = out[out.query_id == qid].sort_values(
                ["cosine", "vec_id"], ascending=[False, True])
            want = knn_ivf(SF, query_vec_id=qid, k=5,
                           n_clusters=8, nprobe=3).to_pandas()
            assert list(got["vec_id"]) == list(want["vec_id"]), qid
            assert list(got["cosine"]) == list(want["cosine"]), qid


class TestAdaptiveNprobe:
    def test_small_corpus_recall_is_perfect(self, ray_session):
        """Round-4 VERDICT What's-missing #3: recall@10 was 0.9 at
        sf0.01/nprobe=4.  The adaptive widening (probe until covered
        rows >= 32*k) must reach 1.0 on the tiny corpus without
        touching the big-corpus probe count."""
        from ocr_ray.functions.similarity import knn_bruteforce, knn_ivf

        sf = "/root/testdata/sf0.01"
        exact = {r["vec_id"] for r in knn_bruteforce(sf, k=10).take_all()}
        approx = {r["vec_id"] for r in
                  knn_ivf(sf, k=10, nprobe=4).take_all()}
        assert len(exact & approx) / len(exact) == 1.0

    def test_widening_respects_coverage_bound(self, ray_session):
        from ocr_ray.functions.similarity import (
            _query_vector,
            build_ivf_index,
            probe_buckets,
        )

        sf = "/root/testdata/sf0.01"   # 500 rows, 16 buckets
        path, cent = build_ivf_index(sf)
        q = _query_vector(sf, 0)
        fixed = probe_buckets(path, cent, q, 4, min_covered_rows=0)
        assert len(fixed) == 4         # no bound -> exactly nprobe
        widened = probe_buckets(path, cent, q, 4, min_covered_rows=320)
        # widened, nearest-first (prefix preserved), but NOT the whole
        # index — the bound caps the read
        assert widened[:4] == fixed
        assert 4 < len(widened) < 16
        # bound larger than the corpus -> every bucket, no infinite loop
        all_b = probe_buckets(path, cent, q, 4, min_covered_rows=10**9)
        assert len(all_b) == 16

    def test_large_corpus_keeps_minimal_probes(self, ray_session):
        from ocr_ray.functions.similarity import (
            _query_vector,
            build_ivf_index,
            probe_buckets,
        )

        sf = "/root/testdata/sf0.1"    # 2000 rows: 4 buckets cover 320
        path, cent = build_ivf_index(sf)
        q = _query_vector(sf, 0)
        assert len(probe_buckets(path, cent, q, 4,
                                 min_covered_rows=320)) == 4


class TestEmbeddingClusterSample:
    def test_exact_per_cluster_counts(self, ray_session):
        """Every cluster contributes exactly min(per_cluster, size)."""
        from collections import Counter

        import numpy as np
        import pyarrow.parquet as pqt

        from ocr_ray.functions.similarity import (
            build_ivf_index,
            embedding_cluster_sample,
        )

        got = embedding_cluster_sample(SF, per_cluster=5, n_clusters=8)
        picked = Counter(got["cluster"].to_pylist())
        # true cluster sizes from the cached index assignment
        path, _ = build_ivf_index(SF, n_clusters=8)
        import os
        sizes = {}
        for name in os.listdir(path):
            if name.startswith("bucket="):
                b = int(name.split("=")[1])
                d = f"{path}/{name}"
                sizes[b] = sum(
                    pqt.ParquetFile(f"{d}/{f}").metadata.num_rows
                    for f in os.listdir(d) if f.endswith(".parquet"))
        assert picked == {b: min(5, n) for b, n in sizes.items() if n}
        # sampled ids are real and unique
        ids = got["vec_id"].to_pylist()
        assert len(ids) == len(set(ids))

    def test_deterministic(self, ray_session):
        from ocr_ray.functions.similarity import embedding_cluster_sample

        a = embedding_cluster_sample(SF, per_cluster=3, n_clusters=8)
        b = embedding_cluster_sample(SF, per_cluster=3, n_clusters=8)
        assert a.equals(b)

    def test_prefix_property(self, ray_session):
        """The size-2 sample is a prefix of the size-4 sample within
        each cluster — growing an eval set never resamples."""
        from ocr_ray.functions.similarity import embedding_cluster_sample

        small = embedding_cluster_sample(SF, per_cluster=2, n_clusters=8)
        big = embedding_cluster_sample(SF, per_cluster=4, n_clusters=8)

        def by_cluster(t):
            out = {}
            for c, v in zip(t["cluster"].to_pylist(),
                            t["vec_id"].to_pylist()):
                out.setdefault(c, []).append(v)
            return out

        s, b = by_cluster(small), by_cluster(big)
        for c, vs in s.items():
            assert b[c][:len(vs)] == vs

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

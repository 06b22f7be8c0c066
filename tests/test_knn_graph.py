"""kNN graph: exactness at full probe, planted-pair recall, edge
hygiene (no self loops, no duplicates, exact per-source degree)."""

import os

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def planted(tmp_path_factory):
    from ocr_ray.fixtures import write_neardup_corpus

    p = str(tmp_path_factory.mktemp("knng") / "corpus")
    write_neardup_corpus(p)
    return p


class TestExactAtFullProbe:
    def test_matches_bruteforce_both_modes(self, ray_session):
        """probe_r = n_clusters makes the graph exact in BOTH database
        modes: every query scores every database row."""
        from ocr_ray.functions.graph import (
            exact_knn_graph_local,
            knn_graph,
        )

        truth = exact_knn_graph_local(SF, k=5)
        for rep in (True, False):
            rows = knn_graph(SF, k=5, n_clusters=16, probe_r=16,
                             replicate_db=rep).take_all()
            got = {(r["src"], r["dst"]) for r in rows}
            assert got == truth
            assert len(rows) == len(got)      # no duplicate edges

    def test_cosines_match_bruteforce_formula(self, ray_session):
        import pyarrow.parquet as pqt

        from ocr_ray.functions.graph import knn_graph
        from ocr_ray.functions.semdedup import _norm_rows
        from ocr_ray.functions._num import np_round_half_up

        rows = knn_graph(SF, k=3, probe_r=16).take_all()
        tbl = pqt.read_table(f"{SF}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
        ids = tbl["vec_id"].to_numpy(zero_copy_only=False)
        mn = _norm_rows(np.asarray(tbl["embedding"].to_pylist(),
                                   dtype=np.float64))
        by_id = {int(i): mn[j] for j, i in enumerate(ids)}
        for r in rows[:50]:
            want = np_round_half_up(
                np.array([by_id[r["src"]] @ by_id[r["dst"]]]), 6)[0]
            assert r["cosine"] == want

    def test_degree_is_exactly_k(self, ray_session):
        from collections import Counter

        from ocr_ray.functions.graph import knn_graph

        rows = knn_graph(SF, k=5, probe_r=16).take_all()
        deg = Counter(r["src"] for r in rows)
        assert len(deg) == 500
        assert set(deg.values()) == {5}

    def test_no_self_edges(self, ray_session):
        from ocr_ray.functions.graph import knn_graph

        rows = knn_graph(SF, k=5, probe_r=16).take_all()
        assert all(r["src"] != r["dst"] for r in rows)


class TestPlantedRecall:
    def test_planted_pairs_are_mutual_top1(self, ray_session, planted):
        """Every planted cos-0.95 pair must be each other's nearest
        neighbor at probe_r=3 (the semdedup co-location contract:
        replicate_db finds an edge in ANY shared bucket)."""
        from ocr_ray.functions.graph import knn_graph

        truth = {(2 * i, 2 * i + 1) for i in range(40)} | \
                {(2 * i + 1, 2 * i) for i in range(40)}
        got = {(r["src"], r["dst"]) for r in
               knn_graph(planted, k=1, probe_r=3).take_all()}
        assert truth <= got

    def test_primary_only_mode_is_weaker_but_valid(self, ray_session,
                                                   planted):
        from collections import Counter

        from ocr_ray.functions.graph import knn_graph

        rows = knn_graph(planted, k=1, probe_r=3,
                         replicate_db=False).take_all()
        deg = Counter(r["src"] for r in rows)
        assert len(deg) == 120 and set(deg.values()) == {1}


class TestMutualGraph:
    def test_matches_bruteforce_mutual(self, ray_session):
        """At full probe the mutual graph equals the brute-force mutual
        graph exactly."""
        from ocr_ray.functions.graph import (
            exact_knn_graph_local,
            mutual_knn_graph,
        )

        directed = exact_knn_graph_local(SF, k=5)
        truth = {(min(a, b), max(a, b)) for a, b in directed
                 if (b, a) in directed}
        got = {(r["doc_a"], r["doc_b"]) for r in
               mutual_knn_graph(SF, k=5, probe_r=16).take_all()}
        assert got == truth
        assert all(a < b for a, b in got)

    def test_one_way_edges_dropped(self, ray_session, tmp_path):
        """Planted hub geometry: c's nearest is b, but b's nearest is
        a — (b, c) must NOT survive the mutual filter at k=1."""
        import pyarrow.parquet as pqt

        from ocr_ray.functions.graph import mutual_knn_graph

        sf = str(tmp_path / "sf")
        os.makedirs(sf, exist_ok=True)

        def vec(deg):
            r = np.deg2rad(deg)
            return [float(np.cos(r)), float(np.sin(r))] + [0.0] * 6

        tbl = pa.table({
            "vec_id": pa.array([0, 1, 2], pa.int64()),
            "embedding": pa.array([vec(0), vec(5), vec(20)],
                                  pa.list_(pa.float32())),
            "label": pa.array([0, 0, 0], pa.int32())})
        pqt.write_table(tbl, f"{sf}/embeddings.parquet")
        got = {(r["doc_a"], r["doc_b"]) for r in
               mutual_knn_graph(sf, k=1, n_clusters=2,
                                probe_r=2).take_all()}
        assert got == {(0, 1)}


class TestCommunities:
    def test_planted_three_clusters(self, ray_session, tmp_path):
        """Three well-separated Gaussian blobs -> exactly three
        communities, each containing exactly its blob's members."""
        import pyarrow.parquet as pqt

        from ocr_ray.functions.graph import semantic_communities

        sf = str(tmp_path / "sf")
        os.makedirs(sf, exist_ok=True)
        rng = np.random.RandomState(17)
        centers = np.eye(3)                  # orthogonal unit centers
        vecs, ids = [], []
        for c in range(3):
            base = np.zeros(12)
            base[c * 4] = 10.0
            for i in range(20):
                vecs.append(base + rng.randn(12) * 0.3)
                ids.append(c * 100 + i)
        tbl = pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([v.tolist() for v in vecs],
                                  pa.list_(pa.float32())),
            "label": pa.array(np.zeros(60, np.int32), pa.int32())})
        pqt.write_table(tbl, f"{sf}/embeddings.parquet")

        # k large enough to connect a 20-member blob: every blob is
        # exactly one community
        rows = semantic_communities(sf, k=19, min_cosine=0.5,
                                    n_clusters=4,
                                    probe_r=4).take_all()
        comm = {}
        for r in rows:
            comm.setdefault(r["community"], set()).add(r["vec_id"])
        assert len(comm) == 3
        got_groups = sorted(tuple(sorted(v)) for v in comm.values())
        want_groups = sorted(tuple(c * 100 + i for i in range(20))
                             for c in range(3))
        assert got_groups == want_groups

        # at small k the mutual graph legitimately FRAGMENTS a blob,
        # but communities must stay PURE: none may span two blobs
        rows = semantic_communities(sf, k=3, min_cosine=0.5,
                                    n_clusters=4,
                                    probe_r=4).take_all()
        comm = {}
        for r in rows:
            comm.setdefault(r["community"], set()).add(r["vec_id"])
        for members in comm.values():
            blobs = {v // 100 for v in members}
            assert len(blobs) == 1

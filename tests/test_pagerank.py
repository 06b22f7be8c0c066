"""PageRank: closed-form structures, a float power-iteration oracle,
dangling-mass handling, integer-fixed-point determinism across block
layouts, and the document_pagerank composition.

Reference analog: the reference has no graph analytics; this is part
of the engine's training-data-curation extension surface (centrality-
weighted sampling over the semantic kNN graph)."""

import numpy as np
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _ref_pagerank(edges, n_iter=10, d=0.85):
    """Independent float power iteration with uniform dangling
    redistribution — the textbook formulation, coded separately from
    the Dataset implementation."""
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {u: i for i, u in enumerate(nodes)}
    n = len(nodes)
    out = np.zeros(n)
    for u, _ in edges:
        out[idx[u]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        contrib = np.zeros(n)
        for u, v in edges:
            contrib[idx[v]] += r[idx[u]] / out[idx[u]]
        dang = r[out == 0].sum()
        r = (1 - d) / n + d * (contrib + dang / n)
    return {u: r[idx[u]] for u in nodes}


def _run(ray_session, edges, **kw):
    import ray.data as rd

    from ocr_ray.functions.graph import pagerank

    t = pa.table({"src": pa.array([u for u, _ in edges], pa.int64()),
                  "dst": pa.array([v for _, v in edges], pa.int64())})
    got = pagerank(rd.from_arrow(t), **kw).take_all()
    return {r["node"]: r["rank"] for r in got}


class TestClosedForm:
    def test_cycle_is_uniform(self, ray_session):
        """On a directed cycle every node has identical rank 1/n —
        the fixed point is exact, not just a limit."""
        n = 7
        got = _run(ray_session, [(i, (i + 1) % n) for i in range(n)])
        assert len(got) == n
        for v in got.values():
            assert abs(v - 1 / n) < 1e-9

    def test_star_center_dominates(self, ray_session):
        """Leaves 1..n all point at 0; 0 dangles.  Center rank must
        exceed every leaf and the ordering must be leaf-uniform."""
        got = _run(ray_session, [(i, 0) for i in range(1, 9)])
        leaves = [got[i] for i in range(1, 9)]
        assert got[0] > max(leaves)
        assert max(leaves) - min(leaves) < 1e-12
        assert abs(sum(got.values()) - 1.0) < 1e-6


class TestOracleParity:
    def test_random_graph_matches_float_reference(self, ray_session):
        rng = np.random.default_rng(11)
        n = 60
        edges = list({(int(a), int(b))
                      for a, b in rng.integers(0, n, (400, 2))
                      if a != b})
        got = _run(ray_session, edges, n_iter=12)
        want = _ref_pagerank(edges, n_iter=12)
        assert set(got) == set(want)
        for u in want:
            assert got[u] == pytest.approx(want[u], rel=1e-6, abs=1e-9)

    def test_dangling_heavy_graph(self, ray_session):
        """Most nodes dangle: the uniform-redistribution leg carries
        most of the mass, so an error there is maximally visible."""
        edges = [(0, 1), (0, 2), (0, 3), (1, 4), (2, 5), (3, 6)]
        got = _run(ray_session, edges)
        want = _ref_pagerank(edges)
        for u in want:
            assert got[u] == pytest.approx(want[u], rel=1e-6, abs=1e-9)
        assert abs(sum(got.values()) - 1.0) < 1e-6


class TestDeterminism:
    def test_identical_across_block_layouts(self, ray_session):
        """Integer fixed-point ranks are a pure function of the edge
        SET: two different partition layouts emit bit-identical
        values (the repo's no-float-accumulation discipline)."""
        import ray.data as rd

        from ocr_ray.functions.graph import pagerank

        rng = np.random.default_rng(3)
        edges = list({(int(a), int(b))
                      for a, b in rng.integers(0, 40, (250, 2))
                      if a != b})
        t = pa.table({"src": pa.array([u for u, _ in edges], pa.int64()),
                      "dst": pa.array([v for _, v in edges], pa.int64())})
        outs = []
        for nblocks in (1, 5):
            ds = rd.from_arrow(t).repartition(nblocks)
            rows = pagerank(ds).take_all()
            outs.append(sorted((r["node"], r["rank"]) for r in rows))
        assert outs[0] == outs[1]


class TestDocumentPagerank:
    def test_semantic_centrality_over_sf0001(self, ray_session):
        """Composition smoke over the real embeddings: undirected
        mutual-graph walk — every rank positive, mass sums to ~1,
        node set drawn from the graph's vertices."""
        from ocr_ray.functions.graph import document_pagerank

        rows = document_pagerank(SF, k=4, n_clusters=8,
                                 probe_r=8, n_iter=8).take_all()
        assert len(rows) > 0
        total = sum(r["rank"] for r in rows)
        assert abs(total - 1.0) < 1e-3
        assert all(r["rank"] > 0 for r in rows)


class TestConnectedComponents:
    def test_planted_components(self, ray_session):
        import pyarrow as pa

        from ocr_ray.functions.graph import connected_components

        # component A: 1-2-3-4 chain; component B: 10-11; C: 20-21-22 star
        edges = pa.table({
            "src": pa.array([1, 2, 3, 10, 20, 20], pa.int64()),
            "dst": pa.array([2, 3, 4, 11, 21, 22], pa.int64())})
        got = {r["node_id"]: r["component_id"]
               for r in connected_components(edges).take_all()}
        assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                       20: 20, 21: 20, 22: 20}

    def test_custom_columns_and_long_chain(self, ray_session):
        import pyarrow as pa
        import ray.data as rd

        from ocr_ray.functions.graph import connected_components

        n = 64  # chain 0-1-...-63: pointer jumping must close it
        edges = rd.from_arrow(pa.table({
            "a": pa.array(range(n - 1), pa.int64()),
            "b": pa.array(range(1, n), pa.int64())})).repartition(4)
        got = {r["node_id"]: r["component_id"]
               for r in connected_components(edges, src="a",
                                             dst="b").take_all()}
        assert got == {i: 0 for i in range(n)}

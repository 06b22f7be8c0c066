"""Distributed PCA oracles: numpy parity, integer-exact layout
independence, deterministic sign, and whitening semantics."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_embeddings(path, vecs):
    pq.write_table(pa.table({
        "vec_id": pa.array(range(len(vecs)), pa.int64()),
        "embedding": pa.array([v.tolist() for v in
                               vecs.astype(np.float32)],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * len(vecs), pa.int32()),
    }), path)


@pytest.fixture(scope="module")
def aniso_dir(tmp_path_factory):
    """400 vectors with a known anisotropic covariance in d=8."""
    d = tmp_path_factory.mktemp("pca_emb")
    rng = np.random.default_rng(11)
    base = rng.standard_normal((400, 8))
    scales = np.array([5.0, 3.0, 2.0, 1.0, 0.5, 0.3, 0.2, 0.1])
    vecs = base * scales + np.array([1.0, -2.0, 0, 0, 0, 0, 0, 0.5])
    _write_embeddings(str(d / "embeddings.parquet"), vecs)
    return str(d), vecs.astype(np.float32).astype(np.float64)


class TestEmbeddingPCA:
    def test_matches_numpy_reference(self, ray_session, aniso_dir):
        from ocr_ray.functions.pca import embedding_pca

        sf_dir, vecs = aniso_dir
        got = embedding_pca(sf_dir)
        mean = vecs.mean(0)
        cov = (vecs - mean).T @ (vecs - mean) / len(vecs)
        w, v = np.linalg.eigh(cov)
        w = w[::-1]
        assert got["n"] == len(vecs)
        assert got["mean"] == pytest.approx(mean, abs=1e-4)
        assert got["eigvals"] == pytest.approx(w, abs=1e-3)
        # principal axes match up to sign
        ref = v[:, ::-1].T
        for i in range(4):  # well-separated top axes
            dot = abs(float(got["components"][i] @ ref[i]))
            assert dot == pytest.approx(1.0, abs=1e-4), i

    def test_layout_independent_bit_identical(self, ray_session,
                                              aniso_dir):
        import ray.data as rd

        from ocr_ray.functions.pca import _moments

        sf_dir, _ = aniso_dir
        outs = []
        for par in (1, 7):
            ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                                 columns=["embedding"],
                                 override_num_blocks=par)
            outs.append(_moments(ds))
        assert outs[0][0] == outs[1][0]
        assert (outs[0][1] == outs[1][1]).all()  # integer-exact: ==
        assert (outs[0][2] == outs[1][2]).all()

    def test_sign_convention_deterministic(self, ray_session, aniso_dir):
        from ocr_ray.functions.pca import embedding_pca

        sf_dir, _ = aniso_dir
        comps = embedding_pca(sf_dir)["components"]
        mx = np.abs(comps).argmax(1)
        assert (comps[np.arange(len(comps)), mx] > 0).all()

    def test_whitened_projection_is_isotropic(self, ray_session,
                                              aniso_dir):
        from ocr_ray.functions.pca import embedding_pca, project_embeddings

        sf_dir, _ = aniso_dir
        pca = embedding_pca(sf_dir)
        out = project_embeddings(sf_dir, pca, k=4, whiten=True).take_all()
        p = np.array([r["proj"] for r in out], dtype=np.float64)
        assert p.shape == (400, 4)
        cov = (p - p.mean(0)).T @ (p - p.mean(0)) / len(p)
        assert cov == pytest.approx(np.eye(4), abs=0.05)
        # unwhitened projection variance == eigenvalues
        raw = project_embeddings(sf_dir, pca, k=4, whiten=False).take_all()
        pr = np.array([r["proj"] for r in raw], dtype=np.float64)
        assert pr.var(0, ddof=0) == pytest.approx(pca["eigvals"][:4],
                                                  rel=0.01)

    def test_driver_corpus_smoke(self, ray_session):
        from ocr_ray.functions.pca import embedding_pca

        got = embedding_pca("/root/testdata/sf0.001")
        assert got["n"] == 500 and len(got["eigvals"]) == 64
        assert (np.diff(got["eigvals"]) <= 1e-12).all()  # sorted desc

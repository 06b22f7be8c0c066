"""Hashed tf-idf vectorizer: pure-python oracle parity, layout
independence, planted near-dup cosine separation, corpus smoke."""

import hashlib

import numpy as np
import pyarrow as pa
import pytest

from ocr_ray.functions.corpus_prep import _tokens
from ocr_ray.functions.vectorize import (
    fit_df_counts,
    idf_vector,
    tfidf_document_vectors,
    tfidf_vectors,
)


def _mk_ds(texts):
    import ray.data as rd
    return rd.from_arrow(pa.table({
        "doc_id": pa.array(range(1, len(texts) + 1), pa.int64()),
        "text": pa.array(texts, pa.string())}))


def _oracle(texts, dim):
    """Independent reimplementation with dict counting."""
    def bucket(tok):
        return int.from_bytes(
            hashlib.blake2b(tok.encode(), digest_size=8).digest(),
            "big") % dim

    tfs = []
    df = np.zeros(dim, dtype=np.int64)
    for t in texts:
        tf = np.zeros(dim, dtype=np.int64)
        for tok in _tokens(t):
            tf[bucket(tok)] += 1
        tfs.append(tf)
        df += tf > 0
    idf = np.log((1.0 + len(texts)) / (1.0 + df)) + 1.0
    out = []
    for tf in tfs:
        v = tf * idf
        n = np.linalg.norm(v)
        out.append(v / n if n > 0 else v)
    return np.stack(out), df


TEXTS = ["the cat sat on the mat", "the dog ate the cat food",
         "completely unrelated words here", "", "the the the",
         "cat dog mat food"]


class TestTfidf:
    def test_oracle_parity(self, ray_session):
        dim = 64
        got = (tfidf_vectors(_mk_ds(TEXTS), dim=dim).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        want, want_df = _oracle(TEXTS, dim)
        df, n = fit_df_counts(_mk_ds(TEXTS), dim=dim)
        assert n == len(TEXTS) and (df == want_df).all()
        mat = np.stack(got["embedding"].to_numpy())
        np.testing.assert_allclose(mat, want, atol=1e-12)

    def test_layout_independent(self, ray_session):
        ds = _mk_ds(TEXTS * 4)
        a = (tfidf_vectors(ds, dim=32).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        b = (tfidf_vectors(ds.repartition(5), dim=32).to_pandas()
             .sort_values("doc_id").reset_index(drop=True))
        ma, mb = (np.stack(x["embedding"].to_numpy()) for x in (a, b))
        assert (ma == mb).all()  # bit-identical, not just close

    def test_empty_doc_zero_vector(self, ray_session):
        got = (tfidf_vectors(_mk_ds(TEXTS), dim=16).to_pandas()
               .sort_values("doc_id").reset_index(drop=True))
        assert np.linalg.norm(got["embedding"][3]) == 0.0
        # all non-empty docs are unit-norm
        for i in (0, 1, 2, 4, 5):
            assert np.linalg.norm(got["embedding"][i]) == pytest.approx(1.0)

    def test_neardup_cosine_separation(self, ray_session):
        # a re-wrapped/re-ordered copy lands near cosine 1; an
        # unrelated doc does not — the property that makes these
        # vectors usable by embedding_dup_pairs / semdedup
        base = "alpha beta gamma delta epsilon zeta eta theta " * 5
        near = "beta alpha gamma  delta epsilon zeta theta eta " * 5
        other = "totally different vocabulary in this document " * 5
        got = (tfidf_vectors(_mk_ds([base, near, other]), dim=128)
               .to_pandas().sort_values("doc_id").reset_index(drop=True))
        m = np.stack(got["embedding"].to_numpy())
        assert m[0] @ m[1] > 0.99
        assert m[0] @ m[2] < 0.5

    def test_corpus_smoke(self, ray_session):
        got = tfidf_document_vectors("/root/testdata/sf0.001", dim=64)
        df = got.to_pandas()
        assert len(df) == 500
        assert len(df["embedding"][0]) == 64

"""Hashed tf-idf document vectorizer — model-free `list<float>`
embeddings straight from the documents table, so every downstream
embedding operator (knn, embedding_dup_pairs, semdedup, PCA) runs on
corpora that ship no pretrained vectors.

The hashing-trick vectorizer (Weinberger et al. 2009, the fastText /
scikit-learn HashingVectorizer recipe): token -> blake2b -> bucket in a
fixed `dim`-slot space, tf x smoothed-idf weighting, L2 normalization.
Scale shape: document frequencies per bucket are ONE integer-exact
associative aggregate (state = a (dim+1,) int64 vector: per-bucket df
counts + the corpus doc count in the last slot — merge-order- and
block-layout-independent, the IVF/PCA determinism discipline); the
(dim,) idf vector is then closure-broadcast into a single map-only
vectorization pass.  Two streaming text scans total, no shuffle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .corpus_prep import _tokens


def _bucket_fn(dim: int):
    """Deterministic token -> bucket, memoized per closure (Zipf reuse:
    the keyword-matcher lesson — most tokens repeat, hash each distinct
    token once per actor, not once per occurrence)."""
    cache: dict[str, int] = {}

    def bucket(tok: str) -> int:
        b = cache.get(tok)
        if b is None:
            d = hashlib.blake2b(tok.encode(), digest_size=8).digest()
            b = int.from_bytes(d, "big") % dim
            cache[tok] = b
        return b

    return bucket


def _doc_tf(text: str, dim: int, bucket) -> np.ndarray:
    tf = np.zeros(dim, dtype=np.int64)
    for tok in _tokens(text):
        tf[bucket(tok)] += 1
    return tf


def fit_df_counts(ds, text_col: str = "text", dim: int = 256) -> tuple:
    """(df_counts[dim], n_docs) in one integer-exact aggregate pass."""
    from ray.data.aggregate import AggregateFn

    def acc_block(state: np.ndarray, blk: pa.Table) -> np.ndarray:
        out = state.copy()
        bucket = _bucket_fn(dim)
        for text in blk[text_col].to_pylist():
            tf = _doc_tf(text, dim, bucket)
            out[:dim] += (tf > 0)
            out[dim] += 1
        return out

    agg = AggregateFn(
        init=lambda _: np.zeros(dim + 1, dtype=np.int64),
        merge=lambda a, b: a + b,
        accumulate_block=acc_block,
        finalize=lambda s: s.tobytes(),
        name="df")
    blob = ds.aggregate(agg)["df"]
    state = np.frombuffer(blob, np.int64)
    return state[:dim].copy(), int(state[dim])


def idf_vector(df_counts: np.ndarray, n_docs: int) -> np.ndarray:
    """Smoothed idf (the sklearn formula): ln((1+n)/(1+df)) + 1."""
    return np.log((1.0 + n_docs) / (1.0 + df_counts.astype(np.float64))) + 1.0


def tfidf_vectors(ds, id_col: str = "doc_id", text_col: str = "text",
                  dim: int = 256):
    """Dataset of (id_col, embedding list<float64>) — L2-normalized
    hashed tf-idf rows.  Empty documents keep an all-zero vector (norm
    0 is never divided).  Deterministic: a pure function of the corpus
    multiset, independent of block layout on both passes."""
    df_counts, n_docs = fit_df_counts(ds, text_col, dim)
    idf = idf_vector(df_counts, n_docs)

    def vectorize(batch: pa.Table, idf=idf, dim=dim) -> pa.Table:
        bucket = _bucket_fn(dim)
        rows = np.empty((batch.num_rows, dim), dtype=np.float64)
        for i, text in enumerate(batch[text_col].to_pylist()):
            v = _doc_tf(text, dim, bucket) * idf
            n = np.linalg.norm(v)
            rows[i] = v / n if n > 0 else v
        return pa.table({
            id_col: batch[id_col],
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(rows.reshape(-1), pa.float64()), dim)})

    return ds.map_batches(vectorize, batch_format="pyarrow",
                          batch_size=1024)


def tfidf_document_vectors(sf_dir: str, dim: int = 256):
    """Hashed tf-idf vectors over the documents table."""
    from ._io import clean_read

    ds = clean_read(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text"])
    return tfidf_vectors(ds, dim=dim)

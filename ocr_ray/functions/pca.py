"""Distributed PCA / whitening over the ``embeddings`` table.

The moment-matrix route: ONE associative aggregate accumulates
(n, sum x, sum x x^T) and the driver eigendecomposes the d x d
covariance — the standard distributed PCA for d << n (here d = 64;
state is 8 * (1 + d + d^2) bytes ~ 33 KB, independent of corpus size).
Downstream uses: decorrelating/whitening embeddings before k-means /
SemDeDup / IVF (cluster quality is isotropy-sensitive), and
dimensionality reduction ahead of ANN.

Determinism (the IVF-centroid ADVICE discipline): Ray merges aggregate
partials in task-completion order, so float64 accumulation would drift
in the last ulp between runs.  Every PER-ROW contribution is quantized
ONCE to int64 fixed point — vectors at 2^24 fractional bits, outer
products at 2^16 — and all accumulation/merging is exact integer
addition: the moment matrix is bit-identical across block layouts and
merge orders (tested).  Overflow bound at 2^16 product scale and
|x_i x_j| <= ~500: 2^63 / (500 * 2^16) ~ 2.8e11 rows.

Numerical note: cov = E[xx^T] - mean mean^T loses precision when
|mean| >> std; embedding columns are near-centered by construction, and
the 2^-16 product quantum already bounds precision below that effect.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .similarity import _batch_matrix, _read

_VEC_SCALE = np.float64(1 << 24)
_OUTER_SCALE = np.float64(1 << 16)
_SLAB = 256  # rows per einsum slab: bounds the n x d x d temporary


def _moments(ds) -> tuple[int, np.ndarray, np.ndarray]:
    """(n, sum x, sum xx^T) via one integer-exact aggregate."""
    from ray.data.aggregate import AggregateFn

    def acc_block(state: bytes, blk: pa.Table) -> bytes:
        m = _batch_matrix(blk)
        if not len(m):
            return state
        d = m.shape[1]
        arr = (np.frombuffer(state, dtype=np.int64).copy() if state
               else np.zeros(1 + d + d * d, np.int64))
        arr[0] += len(m)
        arr[1:1 + d] += np.rint(m * _VEC_SCALE).astype(np.int64).sum(0)
        acc = np.zeros((d, d), np.int64)
        for i in range(0, len(m), _SLAB):
            s = m[i:i + _SLAB]
            o = np.einsum("ni,nj->nij", s, s) * _OUTER_SCALE
            acc += np.rint(o).astype(np.int64).sum(0)
        arr[1 + d:] += acc.reshape(-1)
        return arr.tobytes()

    def merge(s1: bytes, s2: bytes) -> bytes:
        if not s1:
            return s2
        if not s2:
            return s1
        return (np.frombuffer(s1, dtype=np.int64)
                + np.frombuffer(s2, dtype=np.int64)).tobytes()

    agg = AggregateFn(init=lambda _: b"", merge=merge,
                      accumulate_block=acc_block, name="pca")
    arr = np.frombuffer(ds.aggregate(agg)["pca"], dtype=np.int64)
    d = int((-1 + np.sqrt(1 + 4 * (len(arr) - 1))) / 2)
    n = int(arr[0])
    s1 = arr[1:1 + d].astype(np.float64) / _VEC_SCALE
    s2 = (arr[1 + d:].astype(np.float64) / _OUTER_SCALE).reshape(d, d)
    return n, s1, s2


def embedding_pca(sf_dir: str) -> dict:
    """Fit PCA over the embeddings table.

    Returns {n, mean (d,), eigvals (d,) desc, components (d, d) rows =
    principal axes}.  Eigenvector SIGN is fixed deterministically (the
    largest-|coord| entry of each axis is made positive) so the basis is
    reproducible across platforms/LAPACK builds up to degenerate
    eigenvalue ties.
    """
    n, s1, s2 = _moments(_read(sf_dir, ["embedding"]))
    if n == 0:
        raise ValueError("embeddings table is empty")
    mean = s1 / n
    cov = s2 / n - np.outer(mean, mean)
    eigvals, eigvecs = np.linalg.eigh(cov)     # ascending
    order = np.argsort(eigvals)[::-1]
    eigvals = np.maximum(eigvals[order], 0.0)
    comps = eigvecs[:, order].T
    flip = comps[np.arange(len(comps)), np.abs(comps).argmax(1)] < 0
    comps[flip] *= -1.0
    return {"n": n, "mean": mean, "eigvals": eigvals,
            "components": comps}


def project_embeddings(sf_dir: str, pca: dict, k: int,
                       whiten: bool = False,
                       eps: float = 1e-12):
    """Map-only projection onto the top-k principal axes.

    Adds ``proj: list<float>`` per vec_id; ``whiten=True`` scales each
    axis by 1/sqrt(eigval) so the projected covariance is ~identity.
    The (k x d) basis ships once per task via closure capture (broadcast
    small side, never per batch).
    """
    basis = pca["components"][:k]
    mean = pca["mean"]
    if whiten:
        basis = basis / np.sqrt(pca["eigvals"][:k, None] + eps)

    def proj(batch: pa.Table, basis=basis, mean=mean) -> pa.Table:
        m = _batch_matrix(batch)
        p = (m - mean) @ basis.T
        return pa.table({
            "vec_id": batch["vec_id"],
            "proj": pa.array([row.tolist() for row in
                              p.astype(np.float32)],
                             pa.list_(pa.float32())),
        })

    return _read(sf_dir, ["vec_id", "embedding"]).map_batches(
        proj, batch_format="pyarrow")

"""Mergeable sketches — the approx-aggregate pattern at scale.

The canonical shape (ray guide "Aggregation at scale"): each batch emits
ONE serialized sketch; a tiny second stage merges them.  Exact distinct
counting shuffles every key; a sketch ships a few KB per batch total.

Implemented: KMV (k-minimum-values) distinct-count estimator — fully
deterministic (hash-based, no RNG), mergeable by union+truncate, with
standard error ~ 1/sqrt(k-1).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_MAX_HASH = float(2 ** 64)


def _hash64(values) -> np.ndarray:
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        d = hashlib.blake2b(str(v).encode(), digest_size=8).digest()
        out[i] = int.from_bytes(d, "big")
    return out


def kmv_sketch(values, k: int = 1024) -> np.ndarray:
    """k smallest distinct 64-bit hashes of the values."""
    h = np.unique(_hash64(values))
    return h[:k]


def kmv_merge(sketches: list[np.ndarray], k: int = 1024) -> np.ndarray:
    parts = [s for s in sketches if len(s)]
    if not parts:
        return np.array([], dtype=np.uint64)
    return np.unique(np.concatenate(parts))[:k]


def kmv_estimate(sketch: np.ndarray, k: int = 1024) -> float:
    """Distinct-count estimate: (k-1) / max_kth_normalized."""
    if len(sketch) < k:
        return float(len(sketch))  # saw fewer than k distinct: exact
    kth = float(sketch[k - 1]) / _MAX_HASH
    return (k - 1) / kth


def approx_distinct(ds, column: str, k: int = 1024):
    """Distributed approx-distinct over a Dataset column.

    Per batch: one sketch row (list<uint64 as int64-bits>); merge on the
    driver (a few KB regardless of input size). Returns a one-row
    pyarrow Table {approx_distinct: float64}.
    """
    def per_batch(batch: pa.Table, column=column, k=k) -> pa.Table:
        sk = kmv_sketch(batch[column].to_pylist(), k)
        return pa.table({
            "sketch": pa.array([sk.astype(np.int64)], pa.list_(pa.int64()))})

    rows = ds.map_batches(per_batch, batch_format="pyarrow",
                          batch_size=65536).take_all()
    sketches = [np.asarray(r["sketch"], dtype=np.int64).astype(np.uint64)
                for r in rows]
    est = kmv_estimate(kmv_merge(sketches, k), k)
    return pa.table({"approx_distinct": pa.array([round(est, 1)], pa.float64())})

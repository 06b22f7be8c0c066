"""Bloom-filter decontamination — the bounded-memory variant of
``corpus_prep.contamination_check``.

The exact check broadcasts the eval set's n-gram hashes as a Python
set and reads the probe texts onto the driver — right for a handful of
benchmark files, wrong when the eval side is a full benchmark SUITE
(millions of n-grams: the set broadcast grows without bound and the
driver read is corpus-sized).  The standard fix (e.g. Dolma's
decontamination pass) is a Bloom filter:

* build — ONE associative Dataset.aggregate over the eval dataset whose
  state is a fixed ``m_bits``-bit array as bytes (merge = bitwise OR —
  idempotent, commutative, associative, so Ray's merge order cannot
  matter).  The eval texts never touch the driver; only the bit array
  does (1 MB at the 2^23 default, any eval-set size).
* probe — the bit array is broadcast inside the map closure; each
  corpus doc tests its ``window``-token n-grams with k double-hashed
  positions (Kirsch-Mitzenmacher: pos_j = h1 + j*h2 mod m from the two
  64-bit halves of the SAME md5 the exact operator hashes windows
  with).

Guarantees: NO false negatives — every doc the exact check flags is
flagged here (a Bloom filter never loses an inserted element), so the
result is a superset and the filter is safe to use as a removal list.
False-positive rate per n-gram is the textbook (1 - e^{-kn/m})^k; at
the defaults (m = 2^23, k = 4) one million inserted n-grams give
~2e-4 — callers sizing for 100-TB eval suites scale ``m_bits``
linearly with the inserted n-gram count (8 bits per n-gram keeps the
rate ~2e-4; the broadcast stays object-store-friendly: 2^30 bits =
128 MB covers ~134M n-grams).

Reference analog: none — beyond-reference training-data operator
(decontamination family, SURVEY.md §2.7 extension).
"""
from __future__ import annotations

import hashlib
import numpy as np
import pyarrow as pa

from .corpus_prep import _read, _win_shingles


def _win_digests(text: str, window: int) -> list[bytes]:
    """md5 digests of the ``window``-token shingles — the SAME shingle
    geometry and hash as the exact operator (``_win_shingles`` is the
    shared definition; hexdigest there, raw digest here)."""
    return [hashlib.md5(s.encode()).digest()
            for s in _win_shingles(text, window)]


def _positions(digests: list[bytes], k: int, m_bits: int) -> np.ndarray:
    """(n_windows, k) bit positions via double hashing from the two
    64-bit md5 halves (h2 forced odd so the stride cycles all of m)."""
    if not digests:
        return np.empty((0, k), np.int64)
    raw = np.frombuffer(b"".join(digests), dtype=">u8").reshape(-1, 2)
    h1 = raw[:, 0].astype(np.uint64)
    h2 = raw[:, 1].astype(np.uint64) | np.uint64(1)
    j = np.arange(k, dtype=np.uint64)
    return ((h1[:, None] + j[None, :] * h2[:, None])
            % np.uint64(m_bits)).astype(np.int64)


def build_ngram_bloom(ds, window: int = 8, m_bits: int = 1 << 23,
                      k_hashes: int = 4) -> bytes:
    """Bit array (little-endian within bytes) over every ``window``-gram
    of ``ds``'s text column — one associative aggregate, O(m/8) state."""
    from ray.data.aggregate import AggregateFn

    n_bytes = (m_bits + 7) // 8

    def acc_block(state: bytes, blk: pa.Table) -> bytes:
        bits = (np.frombuffer(state, np.uint8).copy() if state
                else np.zeros(n_bytes, np.uint8))
        for t in blk["text"].to_pylist():
            pos = _positions(_win_digests(t, window), k_hashes,
                             m_bits).ravel()
            if len(pos):
                np.bitwise_or.at(bits, pos >> 3,
                                 (1 << (pos & 7)).astype(np.uint8))
        return bits.tobytes()

    def merge(s1: bytes, s2: bytes) -> bytes:
        if not s1:
            return s2
        if not s2:
            return s1
        return np.bitwise_or(np.frombuffer(s1, np.uint8),
                             np.frombuffer(s2, np.uint8)).tobytes()

    agg = AggregateFn(init=lambda _: b"", merge=merge,
                      accumulate_block=acc_block, name="bloom")
    blob = ds.aggregate(agg)["bloom"]
    return blob if blob else bytes(n_bytes)


def bloom_contamination_check(sf_dir: str, n_probe_docs: int = 3,
                              window: int = 8,
                              probe_path: str | None = None,
                              m_bits: int = 1 << 23,
                              k_hashes: int = 4):
    """Dataset[doc_id, n_hits]: corpus docs sharing any ``window``-token
    n-gram with the eval side, counted through the Bloom filter —
    a SUPERSET of ``contamination_check``'s exact answer (never misses;
    n_hits can only over-count by the documented FP rate).

    Eval side: ``probe_path`` (parquet with a ``text`` column, read and
    inserted DISTRIBUTED — never driver-side) or the default
    ``n_probe_docs`` smallest-doc_id corpus docs (the deterministic
    stand-in, matching the exact operator)."""
    from ._io import clean_read
    from .corpus_prep import probe_doc_texts

    if probe_path is not None:
        eval_ds = clean_read(probe_path, columns=["text"])
        probe_ids: frozenset = frozenset()
    elif n_probe_docs > 0:
        # the deterministic stand-in is a handful of docs — the shared
        # pushdown selection is bounded; it still feeds the DISTRIBUTED
        # builder
        import ray.data as rd

        probe_ids, texts = probe_doc_texts(sf_dir, n_probe_docs)
        eval_ds = rd.from_arrow(pa.table({"text": pa.array(
            texts, pa.string())}))
    else:
        raise ValueError("need probe_path or n_probe_docs > 0")

    bloom = build_ngram_bloom(eval_ds, window, m_bits, k_hashes)
    bits = np.frombuffer(bloom, np.uint8)

    ds = _read(sf_dir, ["doc_id", "text"])

    def scan(batch: pa.Table, bits=bits,
             probe_ids=probe_ids) -> pa.Table:
        out_id, out_n = [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            if doc_id in probe_ids:
                continue
            pos = _positions(_win_digests(text, window), k_hashes, m_bits)
            if not len(pos):
                continue
            hit = ((bits[pos >> 3] >> (pos & 7)) & 1).all(axis=1)
            n = int(hit.sum())
            if n:
                out_id.append(doc_id)
                out_n.append(n)
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "n_hits": pa.array(out_n, pa.int64())})

    return ds.map_batches(scan, batch_format="pyarrow", batch_size=2048)


# ------------------------------------------------- persistence / merge
#
# Incremental decontamination: each eval-set (or corpus) increment
# builds its own filter distributed, the increments OR-merge into one
# persistent file, and later probes load it — the band-index
# append/compaction story applied to the Bloom family.  OR-merge is
# EXACTLY the distributed builder's merge step, so
# merge(build(A), build(B)) == build(A ∪ B) bit for bit.

_BLOOM_MAGIC = b"ORBF"
_HEADER_LEN = 4 + 3 * 8  # magic + window/m_bits/k_hashes int64s


def save_bloom(blob: bytes, path: str, *, window: int,
               m_bits: int, k_hashes: int) -> None:
    """Atomic (tmp+rename) single-file write: 28-byte header (magic +
    the three parameters that define gram geometry and bit layout)
    followed by the bit array.  The header makes parameter-mismatched
    merges/probes refusable instead of silently wrong."""
    import os
    import struct

    if len(blob) != (m_bits + 7) // 8:
        raise ValueError(f"blob is {len(blob)} bytes, expected "
                         f"{(m_bits + 7) // 8} for m_bits={m_bits}")
    header = _BLOOM_MAGIC + struct.pack("<qqq", window, m_bits, k_hashes)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(header)
        f.write(blob)
        f.flush()
        os.fsync(f.fileno())
    os.replace(tmp, path)


def load_bloom(path: str) -> tuple[bytes, dict]:
    """(bit blob, {window, m_bits, k_hashes}); refuses foreign files."""
    import struct

    with open(path, "rb") as f:
        header = f.read(_HEADER_LEN)
        blob = f.read()
    if len(header) != _HEADER_LEN or header[:4] != _BLOOM_MAGIC:
        raise ValueError(f"{path} is not a saved bloom filter")
    window, m_bits, k_hashes = struct.unpack("<qqq", header[4:])
    if len(blob) != (m_bits + 7) // 8:
        raise ValueError(f"{path} truncated: {len(blob)} bytes for "
                         f"m_bits={m_bits}")
    return blob, {"window": window, "m_bits": m_bits,
                  "k_hashes": k_hashes}


def merge_blooms(*blobs: bytes) -> bytes:
    """Bitwise-OR union of same-sized filters — equal to building one
    filter over the union of their corpora."""
    if not blobs:
        raise ValueError("need at least one blob")
    sizes = {len(b) for b in blobs}
    if len(sizes) != 1:
        raise ValueError(f"mismatched filter sizes {sorted(sizes)} — "
                         "filters must share m_bits to merge")
    acc = np.frombuffer(blobs[0], np.uint8).copy()
    for b in blobs[1:]:
        np.bitwise_or(acc, np.frombuffer(b, np.uint8), out=acc)
    return acc.tobytes()


def append_to_bloom_file(path: str, ds, *, window: int = 8,
                         m_bits: int = 1 << 23,
                         k_hashes: int = 4) -> dict:
    """Build a filter over ``ds`` (distributed) and OR it into the
    file at ``path`` (created if absent).  Parameters must match the
    existing file's header — mismatches are refused with the remedy
    (rebuild at the new geometry) rather than silently mixing
    incompatible bit layouts.  Concurrent appenders on one host are
    serialized by an advisory lock on ``path + ".lock"`` so the
    load→OR→replace cycle never loses an increment to a racing
    last-writer-wins; the expensive distributed build runs OUTSIDE
    the lock.  Returns the post-merge metadata."""
    import fcntl
    import os

    inc = build_ngram_bloom(ds, window=window, m_bits=m_bits,
                            k_hashes=k_hashes)
    with open(path + ".lock", "w") as lock:
        fcntl.flock(lock, fcntl.LOCK_EX)
        if os.path.exists(path):
            base, meta = load_bloom(path)
            if (meta["window"], meta["m_bits"],
                    meta["k_hashes"]) != (window, m_bits, k_hashes):
                raise ValueError(
                    f"{path} was built with {meta}; cannot append at "
                    f"window={window}, m_bits={m_bits}, "
                    f"k_hashes={k_hashes}. Rebuild the filter file at "
                    "one geometry.")
        else:
            base = bytes((m_bits + 7) // 8)
        save_bloom(merge_blooms(base, inc), path, window=window,
                   m_bits=m_bits, k_hashes=k_hashes)
    return {"window": window, "m_bits": m_bits, "k_hashes": k_hashes}

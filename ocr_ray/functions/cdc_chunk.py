"""Content-defined chunking (FastCDC/Rabin-style) + chunk-level dedup.

The sub-document dedup axis the fixed-size chunker cannot serve: fixed
windows (corpus_prep.chunk_documents) lose ALL alignment after a single
inserted byte, so two near-identical documents share ~no chunk hashes.
Content-defined boundaries are a pure function of a small sliding
window of the text itself, so chunking RESYNCHRONIZES a few hundred
bytes after any edit and the unchanged remainder of the document maps
to identical chunk hashes — the mechanism behind rsync, restic/borg
dedup stores, and chunk-level training-corpus delta storage.

Reference analog: the reference engine chunks per-document for its
summary/keyword windows (ocr_worker.py's per-doc processing); this
module generalizes that to the dedup-bearing variant a 100 TB corpus
store needs.

Scale design: the windowed Gear/polynomial hash is computed for ALL
positions of a batch's documents vectorized (w=16 shifted uint64
multiply-adds over the byte array — no per-byte Python); boundary
SELECTION walks only the candidate cut points (expected one per
2^avg_bits bytes, a 256x data reduction at the default), one
searchsorted per emitted chunk.  Chunking is per-document and
map-only; the only shuffle in the dedup stats is a groupby over
(chunk_md5)-keyed partials.  Determinism: the gear table and the
polynomial are fixed constants derived from blake2b, so boundaries are
a pure function of the text — independent of block layout, batch size
and platform endianness.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

# deterministic 256-entry gear table (little-endian blake2b(i) words)
_GEAR = np.frombuffer(
    b"".join(hashlib.blake2b(bytes([i]), digest_size=8).digest()
             for i in range(256)),
    dtype="<u8").astype(np.uint64)
_P = np.uint64(0x3DF958D1FD6B8B63)        # odd multiplier (wraps mod 2^64)
_WINDOW = 16

# P^j for j in [0, w) under uint64 wraparound (Python-int pow avoids a
# numpy overflow warning at import; the wraparound itself is intended)
_POWS = np.array([pow(int(_P), j, 1 << 64) for j in range(_WINDOW)],
                 dtype=np.uint64)

def window_hashes(buf: np.ndarray) -> np.ndarray:
    """h[i] = sum_{j<w} GEAR[buf[i-j]] * P^j (uint64 wraparound), valid
    for i >= w-1; positions below w-1 are 1 (never a boundary: the mask
    test needs the low bits zero and 1 has bit 0 set).  Vectorized as w
    shifted multiply-adds — no per-byte Python."""
    n = len(buf)
    h = np.ones(n, np.uint64)
    if n < _WINDOW:
        return h
    g = _GEAR[buf]
    acc = np.zeros(n - _WINDOW + 1, np.uint64)
    for j in range(_WINDOW):
        acc += g[_WINDOW - 1 - j: n - j] * _POWS[j]
    h[_WINDOW - 1:] = acc
    return h

def cdc_boundaries(buf: np.ndarray, min_size: int = 64,
                   avg_bits: int = 8, max_size: int = 1024) -> list[int]:
    """END offsets of the content-defined chunks of ``buf``.

    A cut happens after byte i when the windowed hash has its low
    ``avg_bits`` bits zero (expected chunk ~2^avg_bits bytes), subject
    to min_size (skip too-early candidates — also guarantees the
    window is full) and max_size (force a cut when no candidate
    appears).  The final chunk is the remainder and may be shorter
    than min_size.  Cuts are taken wherever candidates exist — also in
    the tail — because the resynchronization property depends on every
    content-defined boundary being honored.
    """
    n = len(buf)
    if n == 0:
        return [0]
    mask = np.uint64((1 << avg_bits) - 1)
    h = window_hashes(buf)
    cand = np.flatnonzero((h & mask) == 0) + 1      # end offsets
    ends: list[int] = []
    last = 0
    while True:
        lo = np.searchsorted(cand, last + min_size, side="left")
        hi = np.searchsorted(cand, last + max_size, side="right")
        cut = int(cand[lo]) if lo < hi else last + max_size
        if cut >= n:
            break
        ends.append(cut)
        last = cut
    ends.append(n)
    return ends

def cdc_boundaries_reference(buf: np.ndarray, min_size: int = 64,
                             avg_bits: int = 8,
                             max_size: int = 1024) -> list[int]:
    """Independent per-byte rolling reference for the vectorized kernel
    (test oracle only — O(n*w) Python)."""
    n = len(buf)
    if n == 0:
        return [0]
    mask = (1 << avg_bits) - 1
    ends: list[int] = []
    last = 0
    while True:
        cut = None
        # scan positions i whose cut point i+1 falls in
        # [last+min_size, last+max_size] and is < n
        for i in range(last + min_size - 1,
                       min(last + max_size, n - 1)):
            if i < _WINDOW - 1:
                continue
            hv = 0
            for j in range(_WINDOW):
                hv = (hv + int(_GEAR[buf[i - j]]) * int(_POWS[j])) \
                    % (1 << 64)
            if (hv & mask) == 0:
                cut = i + 1
                break
        if cut is None and n - last > max_size:
            cut = last + max_size
        if cut is None or cut >= n:
            break
        ends.append(cut)
        last = cut
    ends.append(n)
    return ends

def _read(sf_dir: str, columns):
    from ._io import clean_read

    return clean_read(f"{sf_dir}/documents.parquet", columns=columns)

def cdc_chunk_documents(sf_dir: str, min_size: int = 64,
                        avg_bits: int = 8, max_size: int = 1024):
    """Content-defined chunks per document.

    Output: (doc_id, chunk_id, start, end, n_bytes, chunk_md5) — byte
    offsets into the utf-8 encoding; chunks partition the document
    exactly (tested).  Map-only; boundaries are a pure function of the
    text, so the output is block-layout-independent.
    """
    ds = _read(sf_dir, ["doc_id", "text"])

    def chunk(batch: pa.Table) -> pa.Table:
        doc_ids, chunk_ids, starts, ends_c, md5s = [], [], [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            raw = text.encode("utf-8")
            buf = np.frombuffer(raw, np.uint8)
            ends = cdc_boundaries(buf, min_size, avg_bits, max_size)
            last = 0
            for i, e in enumerate(ends):
                doc_ids.append(doc_id)
                chunk_ids.append(i)
                starts.append(last)
                ends_c.append(e)
                md5s.append(hashlib.md5(raw[last:e]).hexdigest())
                last = e
        n_bytes = pc.subtract(pa.array(ends_c, pa.int64()),
                              pa.array(starts, pa.int64()))
        return pa.table({"doc_id": pa.array(doc_ids, pa.int64()),
                         "chunk_id": pa.array(chunk_ids, pa.int64()),
                         "start": pa.array(starts, pa.int64()),
                         "end": pa.array(ends_c, pa.int64()),
                         "n_bytes": n_bytes,
                         "chunk_md5": pa.array(md5s, pa.string())})

    return ds.map_batches(chunk, batch_format="pyarrow", batch_size=1024)

def cdc_shared_chunks(sf_dir: str, min_docs: int = 2, min_size: int = 64,
                      avg_bits: int = 8, max_size: int = 1024):
    """Chunk hashes appearing in >= min_docs DISTINCT documents — the
    shared-passage signal at content-defined byte granularity (the
    winnowing detector's storage-dedup sibling).  Per-block (md5,
    doc_id) dedup shrinks the shuffle; one groupby(chunk_md5)."""
    from ray.data.aggregate import Sum

    chunks = cdc_chunk_documents(sf_dir, min_size, avg_bits, max_size)

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"chunk_md5": batch["chunk_md5"],
                      "doc_id": batch["doc_id"],
                      "n_bytes": batch["n_bytes"]})
        g = t.group_by(["chunk_md5", "doc_id"]).aggregate(
            [("n_bytes", "max")])
        return pa.table({"chunk_md5": g["chunk_md5"],
                         "nd": pa.array(np.ones(g.num_rows, np.int64)),
                         "n_bytes": g["n_bytes_max"]})

    agg = (chunks.map_batches(partial, batch_format="pyarrow")
           .groupby("chunk_md5")
           .aggregate(Sum("nd", alias_name="n_docs"),
                      Sum("n_bytes", alias_name="tot_bytes")))
    # a (md5, doc) pair straddling a dynamic block split would count
    # twice only if one doc's chunks split across blocks AND repeat the
    # same md5 — in-doc repeats are real duplicates and counted once
    # per doc by the per-block max; cross-block same-doc same-md5 is
    # possible, so n_docs is an upper bound within one doc's repeats.
    # The min_docs >= 2 filter is still exact for cross-document
    # sharing because distinct docs land in distinct (md5, doc) pairs.
    return agg.filter(expr=f"n_docs >= {int(min_docs)}")

def cdc_dedup_stats(sf_dir: str, min_size: int = 64, avg_bits: int = 8,
                    max_size: int = 1024) -> dict:
    """One-row corpus summary: total chunk bytes, bytes after chunk-
    level dedup (each distinct chunk stored once), and the dedup ratio
    — the "how much smaller is the chunk store" number.  ONE groupby
    over md5-keyed partials; the driver sees three scalars."""
    from ray.data.aggregate import Count, Max, Sum

    chunks = cdc_chunk_documents(sf_dir, min_size, avg_bits, max_size)

    def partial(batch: pa.Table) -> pa.Table:
        t = pa.table({"chunk_md5": batch["chunk_md5"],
                      "n_bytes": batch["n_bytes"]})
        g = t.group_by(["chunk_md5"]).aggregate(
            [("n_bytes", "sum"), ("n_bytes", "max")])
        return pa.table({"chunk_md5": g["chunk_md5"],
                         "tot": g["n_bytes_sum"],
                         "one": g["n_bytes_max"]})

    per_md5 = (chunks.map_batches(partial, batch_format="pyarrow")
               .groupby("chunk_md5")
               .aggregate(Sum("tot", alias_name="tot"),
                          Max("one", alias_name="one")))
    roll = per_md5.aggregate(Sum("tot", alias_name="total_bytes"),
                             Sum("one", alias_name="unique_bytes"),
                             Count(alias_name="n_unique_chunks"))
    total = int(roll["total_bytes"] or 0)
    unique = int(roll["unique_bytes"] or 0)
    return {"total_bytes": total, "unique_bytes": unique,
            "n_unique_chunks": int(roll["n_unique_chunks"] or 0),
            "dedup_ratio": round(unique / total, 4) if total else 1.0}

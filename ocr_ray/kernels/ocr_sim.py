"""Deterministic simulated OCR engine.

Stand-in for the Tesseract/OCRmyPDF stage (app/services/ocr_service.py:112-125)
with the same *interface semantics*: given a media reference, produce line-
segmented text plus a per-line confidence, where a "rotated" scan yields
garbage on the first pass and clean text when re-run with ``force_rotate``
(the reference's --rotate-pages-threshold 9 retry, ocr_service.py:48,96-97,
triggered by the quality gate at ocr_worker.py:214-222).

Everything is a pure function of ``media_ref`` (sha256-derived), so the
distributed pipeline and the single-threaded golden oracle reproduce each
other bit for bit on any cluster.
"""

from __future__ import annotations

import hashlib

import numpy as np

from .wordpool import NOISE_CHARS, WORD_POOL


def _digest_stream(seed: str):
    """Infinite deterministic byte stream from chained sha256 digests."""
    counter = 0
    while True:
        block = hashlib.sha256(f"{seed}#{counter}".encode()).digest()
        yield from block
        counter += 1


def _digest_block(seed: str, n: int) -> bytes:
    """First ``n`` bytes of the same stream, materialized in one go
    (identical byte sequence to ``_digest_stream``, ~10x fewer Python
    ops than pulling the generator per byte)."""
    out = bytearray()
    counter = 0
    while len(out) < n:
        out += hashlib.sha256(f"{seed}#{counter}".encode()).digest()
        counter += 1
    return bytes(out[:n])


def is_rotated_scan(media_ref: str) -> bool:
    """~1 in 6 media spans simulate a rotated/skewed scan whose first OCR
    pass is garbage (drives the quality-gated retry path)."""
    h = hashlib.sha256(f"rot?{media_ref}".encode()).digest()
    return h[0] % 6 == 0


def scan_ground_truth(media_ref: str) -> list[str]:
    """The text "printed on the page": 4-18 lines of 5-11 pool words.

    Consumes the digest stream in exactly the round-1 order (1 byte for
    the line count, then per line 1 byte + 2 bytes per word), but from
    one materialized block with a cursor instead of a per-byte
    generator."""
    # worst case: 1 + 18 * (1 + 11 * 2) = 415 bytes
    buf = _digest_block(f"gt:{media_ref}", 448)
    pos = 0
    n_lines = 4 + buf[pos] % 15
    pos += 1
    pool_n = len(WORD_POOL)
    lines = []
    for _ in range(n_lines):
        n_words = 5 + buf[pos] % 7
        pos += 1
        words = []
        for _ in range(n_words):
            idx = (buf[pos] << 8 | buf[pos + 1]) % pool_n
            pos += 2
            words.append(WORD_POOL[idx])
        lines.append(" ".join(words))
    return lines


def _degrade(line: str, noise_rate_pct: int, seed: str) -> str:
    """Replace ~noise_rate_pct% of characters with implausible glyphs.

    Vectorized (same output as the round-1 per-char loop): one noise
    byte per character from the block stream, numpy mask for the
    replacement positions, Python only at the (sparse) noisy indices."""
    if noise_rate_pct <= 0:
        return line
    b = np.frombuffer(_digest_block(f"noise:{seed}", len(line)), np.uint8)
    cp = np.frombuffer(line.encode("utf-32-le"), np.uint32)
    noisy = (cp != 0x20) & (b % 100 < noise_rate_pct)
    if not noisy.any():
        return line
    chars = list(line)
    n_noise = len(NOISE_CHARS)
    for i in np.nonzero(noisy)[0]:
        chars[i] = NOISE_CHARS[b[i] % n_noise]
    return "".join(chars)


def run_ocr(media_ref: str, *, force_rotate: bool = False) -> tuple[str, list[float]]:
    """Simulate one OCR pass.

    Returns (text, per_line_confidence).  Clean scans get light noise
    (~1%, conf ≈ 0.93); rotated scans OCR'd without ``force_rotate`` get
    ~55% noise and conf ≈ 0.25 — far below the quality gate — while the
    force-rotate pass restores them to the clean profile.
    """
    truth = scan_ground_truth(media_ref)
    rotated = is_rotated_scan(media_ref)
    if rotated and not force_rotate:
        noise, base_conf = 55, 0.25
    else:
        noise, base_conf = 1, 0.93
    lines, confs = [], []
    for i, line in enumerate(truth):
        out = _degrade(line, noise, f"{media_ref}:{i}:{int(force_rotate)}")
        jitter = hashlib.sha256(f"cf:{media_ref}:{i}".encode()).digest()[0] / 255 * 0.05
        lines.append(out)
        confs.append(round(min(1.0, base_conf + jitter), 4))
    return "\n".join(lines), confs

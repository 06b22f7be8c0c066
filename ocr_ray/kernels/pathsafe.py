"""ASCII-safe output-name normalization (M10 parity, file_util.py:10-24).

Partition/file names derived from doc ids must be filesystem- and
object-store-safe on every node; unsafe results fall back to a content
hash (the reference falls back to a uuid)."""

from __future__ import annotations

import hashlib
import re
import unicodedata

_UNSAFE = re.compile(r"[^A-Za-z0-9_.-]+")
_WINDOWS_RESERVED = frozenset(
    "CON PRN AUX NUL COM1 COM2 COM3 COM4 LPT1 LPT2 LPT3".split())


def safe_name(name: str, max_len: int = 120) -> str:
    """Normalize to [A-Za-z0-9_.-]; deterministic hash fallback when
    nothing safe remains."""
    folded = unicodedata.normalize("NFKD", name).encode(
        "ascii", "ignore").decode("ascii")
    cleaned = _UNSAFE.sub("_", folded).strip("._")
    if not cleaned or cleaned.upper() in _WINDOWS_RESERVED:
        cleaned = "f-" + hashlib.sha256(name.encode()).hexdigest()[:16]
    return cleaned[:max_len]

"""Text normalization primitives: diacritic folding and a deterministic
Romanian suffix stemmer.

Reference semantics: ``remove_diacritics`` (app/services/text_processing.py:11-14,
NFKD -> ascii-ignore) and ``normalize_word`` = stem + de-diacritic
(app/services/ocr_evaluation.py:19-21, which uses a Snowball stemmer).  The
Snowball dependency is replaced by a small deterministic suffix-strip table —
the engine only needs normalization to be a stable pure function applied
identically when building the vocabulary and when scoring text.
"""

from __future__ import annotations

import re
import unicodedata
from functools import lru_cache

_WORD_RE = re.compile(r"\w+", re.UNICODE)

# Longest-first Romanian inflection suffixes (plural/article/verb endings).
_SUFFIXES = (
    "ilor", "ului", "elor", "iilor", "atie", "atii",
    "ează", "ească", "este", "este",
    "uri", "ile", "ele", "iei", "ive", "ită", "ate", "ati", "ata",
    "ul", "ei", "ii", "le", "ea", "ie", "ia", "ă", "a", "e", "i", "u",
)


def fold_diacritics(token: str) -> str:
    """NFKD-decompose and drop non-ascii combining marks.

    Mirrors text_processing.py:11-14 exactly (it is the observable
    normalization the keyword matcher and vocabulary rely on).
    """
    return unicodedata.normalize("NFKD", token).encode("ascii", "ignore").decode("ascii")


@lru_cache(maxsize=65536)
def stem(token: str) -> str:
    """Deterministic suffix-strip stemmer (Snowball stand-in).

    Strips the longest matching suffix once, as long as a stem of >= 3
    chars remains.  Pure function, cached (tokens repeat heavily).
    """
    t = token.lower()
    for suf in _SUFFIXES:
        if t.endswith(suf) and len(t) - len(suf) >= 3:
            return t[: -len(suf)]
    return t


@lru_cache(maxsize=65536)
def normalize_word(token: str) -> str:
    """stem + diacritic fold (ocr_evaluation.py:19-21 semantics).
    Cached end to end: the NFKD fold is the hot half and tokens follow
    a Zipf distribution."""
    return fold_diacritics(stem(token))


def tokenize(text: str) -> list[str]:
    """Unicode word tokenizer (\\w+ runs). Stand-in for nltk.word_tokenize
    in ocr_evaluation.py:63 — stable and dependency-free."""
    return _WORD_RE.findall(text)


def tokenize_with_offsets(text: str) -> list[tuple[str, int, int]]:
    """Tokens plus (start, end) char offsets — used by the keyword matcher
    to report span positions (our analog of PDF word rects,
    doc_analysis.py:200-215)."""
    return [(m.group(0), m.start(), m.end()) for m in _WORD_RE.finditer(text)]

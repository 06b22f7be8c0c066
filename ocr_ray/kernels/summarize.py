"""Extractive summarization (reference parity: A7, summarization.py).

The reference runs a Romanian sentencizer + biased TextRank keeping the
top 15 phrases / 5 sentences with input truncated to 2^18 chars
(summarization.py:10-29, app/config.py:41-43).  This engine keeps the
same contract with a deterministic dependency-free scorer: sentences are
ranked by normalized term-frequency weight (a one-iteration TextRank
surrogate) and the top-k are emitted in reading order.
"""

from __future__ import annotations

import re
from collections import Counter

from .textnorm import tokenize

_SENT_SPLIT = re.compile(r"(?<=[.!?])\s+")
MAX_INPUT_CHARS = 2 ** 18  # summarization.py:10-13 truncation


def split_sentences(text: str) -> list[str]:
    return [s.strip() for s in _SENT_SPLIT.split(text) if s.strip()]


def summarize(text: str, *, max_sentences: int = 5,
              min_sentence_tokens: int = 3) -> str:
    """Top-k sentences by mean token weight, emitted in document order."""
    text = text[:MAX_INPUT_CHARS]
    sents = split_sentences(text)
    if len(sents) <= max_sentences:
        return " ".join(sents)
    tokens_per_sent = [tokenize(s.lower()) for s in sents]
    tf = Counter(t for toks in tokens_per_sent for t in toks)
    scored = []
    for i, toks in enumerate(tokens_per_sent):
        if len(toks) < min_sentence_tokens:
            continue
        scored.append((sum(tf[t] for t in toks) / len(toks), -i))
    top = sorted(scored, reverse=True)[:max_sentences]
    keep = sorted(-neg_i for _, neg_i in top)
    return " ".join(sents[i] for i in keep)

"""Broadcast keyword matching over extracted text.

Rebuild of the reference's multi-variant phrase matching
(app/services/doc_analysis.py:52-178) without spaCy: every keyword token
expands to a variant set {surface, diacritic-folded, stem} — the LOWER /
ORTH / LEMMA matcher trio collapsed into one variant-set matcher — and
documents are scanned token-wise with a sliding window.  Overlapping
matches resolve longest-first (spacy.util.filter_spans semantics used at
doc_analysis.py:177: sort by length desc then start asc, greedy
non-overlap) — reimplemented in ``filter_spans``.

The compiled matcher is the classic Ray "broadcast small side": built once
per actor in ``__init__`` from the (≤ a few hundred row) keyword list, and
version-keyed by ``keywords_hash`` exactly like the reference's
LAST_KEYWORDS_HASH cache (doc_analysis.py:28,321-335).
"""

from __future__ import annotations

from collections import defaultdict

from .textnorm import fold_diacritics, normalize_word, tokenize_with_offsets


# Static synonym table standing in for the reference's rowordnet store
# (synonyms.py:3-28): deterministic, no external model, versioned via
# SYNONYM_TABLE_VERSION (folded into the matcher version hash so a table
# change rebuilds the actor pools, like a keyword-list change).
SYNONYM_TABLE_VERSION = "syn-1"
SYNONYMS: dict[str, frozenset] = {
    "query": frozenset({"search", "lookup"}),
    "join": frozenset({"merge"}),
    "shuffle": frozenset({"exchange"}),
    "batch": frozenset({"chunk"}),
    "fast": frozenset({"quick", "rapid"}),
    "large": frozenset({"big", "huge"}),
    "table": frozenset({"relation"}),
    "column": frozenset({"field"}),
    "error": frozenset({"fault", "failure"}),
    "document": frozenset({"record"}),
}


def synonyms_for(token: str) -> frozenset:
    """Context-filtered synonyms of one token, mirroring the reference's
    get_synonyms gates (synonyms.py:6-28): alphabetic tokens of length
    >= 4 only; no multi-word literals; no literal containing the token
    itself.  The static table is pre-filtered but the gates are applied
    anyway so table edits cannot violate the contract."""
    t = token.lower()
    if not t.isalpha() or len(t) < 4:
        return frozenset()
    return frozenset(s for s in SYNONYMS.get(t, frozenset())
                     if t not in s and " " not in s and "_" not in s)


def token_variants(token: str, *, with_synonyms: bool = True) -> frozenset:
    """Surface/folded/stemmed + synonym (and folded-synonym) variant set
    of one keyword token (doc_analysis.py:100-110 get_token_variants:
    {text, de-diacritic, lemma} + filtered synonyms + their de-diacritic
    forms)."""
    t = token.lower()
    out = {t, fold_diacritics(t), normalize_word(t)}
    if with_synonyms:
        for s in synonyms_for(t):
            out.add(s)
            out.add(fold_diacritics(s))
    return frozenset(out)


def filter_spans(spans: list[tuple[int, int, str]]) -> list[tuple[int, int, str]]:
    """Longest-match overlap resolution: sort by (length desc, start asc),
    keep greedily non-overlapping; result in document order."""
    order = sorted(spans, key=lambda s: (-(s[1] - s[0]), s[0]))
    taken: list[tuple[int, int, str]] = []
    occupied: set[int] = set()
    for start, end, label in order:
        if any(i in occupied for i in range(start, end)):
            continue
        occupied.update(range(start, end))
        taken.append((start, end, label))
    taken.sort(key=lambda s: s[0])
    return taken


class KeywordMatcher:
    """Compiled matcher for one keyword-list version."""

    def __init__(self, keywords: list[str], version_hash: str = ""):
        self.version_hash = version_hash
        self.keywords = sorted({k.strip() for k in keywords if k.strip()})
        # first-token variant -> [(keyword, [variant_set per token])]
        self._index: dict[str, list[tuple[str, list[frozenset]]]] = defaultdict(list)
        self.max_len = 1
        for kw in self.keywords:
            toks = kw.lower().split()
            if not toks:
                continue
            vsets = [token_variants(t) for t in toks]
            self.max_len = max(self.max_len, len(vsets))
            for first_var in vsets[0]:
                self._index[first_var].append((kw, vsets))

    def find(self, text: str) -> list[dict]:
        """All keyword occurrences in one text.

        Returns [{keyword, start, end, tok_start, tok_end}] in document
        order after longest-match de-overlap.
        """
        toks = tokenize_with_offsets(text)
        # document tokens do NOT expand synonyms: the reference expands
        # only KEYWORD tokens (make_keywords_in_spacy patterns); document
        # side matches by surface/lemma (LOWER/LEMMA/ORTH attrs)
        tok_variant = [token_variants(t, with_synonyms=False)
                       for t, _, _ in toks]
        raw: list[tuple[int, int, str]] = []  # (tok_start, tok_end, keyword)
        for i, tv in enumerate(tok_variant):
            # sorted: frozenset iteration order is hash-seed dependent and
            # would make tie-breaks differ across worker processes
            for var in sorted(tv):
                for kw, vsets in self._index.get(var, ()):
                    n = len(vsets)
                    if i + n > len(toks):
                        continue
                    if all(tok_variant[i + j] & vsets[j] for j in range(n)):
                        raw.append((i, i + n, kw))
        hits = []
        for ts, te, kw in filter_spans(raw):
            hits.append({
                "keyword": kw,
                "start": toks[ts][1],
                "end": toks[te - 1][2],
                "tok_start": ts,
                "tok_end": te,
            })
        return hits

    def group_hits(self, hits: list[dict]) -> list[dict]:
        """Group per keyword with counts (doc_analysis.py:298-306 shape)."""
        grouped: dict[str, list] = defaultdict(list)
        for h in hits:
            grouped[h["keyword"]].append(h)
        return [
            {"keyword": k, "occs": v, "total_occs": len(v)}
            for k, v in grouped.items()
        ]

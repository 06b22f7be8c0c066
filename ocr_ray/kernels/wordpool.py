"""Deterministic word pool, vocabulary and keyword list.

The reference ships a Romanian vocabulary for quality scoring
(nlp/resources/constants.py:2-4, loader app/services/ocr_evaluation.py:24-38)
and a 365-term keyword list (nlp/resources/keywords.txt, loader
doc_analysis.py:159-165).  This sandbox generates its own equivalents as a
pure function of a fixed seed: common Romanian words (public vocabulary)
form the pool; the synthetic corpus generator draws from the same pool, so
clean text scores high and injected OCR noise scores low — the property the
quality gate needs.
"""

from __future__ import annotations

import hashlib
from functools import lru_cache

from .textnorm import fold_diacritics, normalize_word

# Common Romanian words (plain public vocabulary; diacritic-bearing forms
# included deliberately so diacritic folding is exercised end to end).
WORD_POOL: tuple[str, ...] = (
    "abia", "acord", "actual", "acum", "adresa", "afla", "ajuns", "alege",
    "amândoi", "analiza", "anunț", "aparat", "aproape", "asigura", "astfel",
    "atunci", "autoritate", "avea", "bază", "bine", "birou", "bucurie",
    "bugetul", "caiet", "calitate", "camera", "capitol", "care", "cadru",
    "cerere", "cetățean", "cinci", "citi", "clauza", "comisie", "comun",
    "condiție", "conform", "consiliu", "contract", "control", "copil",
    "credit", "criteriu", "cunoaște", "curte", "decizie", "declara",
    "departe", "deschis", "despre", "detaliu", "dezvoltare", "diferit",
    "direcție", "document", "domeniu", "dosar", "drept", "drum", "după",
    "econom", "educație", "elabora", "emite", "energie", "etapa", "evalua",
    "exemplu", "exista", "expert", "factura", "familie", "fiecare",
    "finanța", "firma", "folosi", "forma", "funcție", "garanție", "gestiune",
    "grup", "hotărâre", "idee", "important", "include", "informație",
    "instanța", "instituție", "interes", "între", "întreba", "judecată",
    "juridic", "lege", "legal", "licitație", "limba", "lista", "local",
    "lucru", "lună", "mare", "măsură", "membru", "mediu", "metoda",
    "minister", "modifica", "moment", "motiv", "național", "necesar",
    "nivel", "norma", "notă", "nou", "număr", "obiect", "obliga", "oferta",
    "oficial", "opinie", "oraș", "ordine", "organiza", "pagina", "parte",
    "perioada", "persoana", "plan", "plata", "politic", "poziție", "precum",
    "pregăti", "prevede", "primar", "primi", "principiu", "problema",
    "procedura", "proces", "program", "proiect", "propune", "public",
    "punct", "putea", "raport", "răspuns", "realiza", "regiune", "registru",
    "regula", "rezultat", "rolul", "român", "sarcina", "scopul", "sediu",
    "semna", "serviciu", "sistem", "situație", "social", "soluție", "spune",
    "stabili", "standard", "structura", "studiu", "sumă", "școală",
    "ședința", "taxa", "termen", "teritoriu", "timp", "titlu", "total",
    "tratat", "trebui", "următor", "unitate", "urgent", "valabil",
    "valoare", "vedere", "venit", "verifica", "viață", "zona", "ziua",
)

# characters considered plausible OCR output (analog of RO_CHARS,
# nlp/resources/constants.py:5-7): lowercase romanian letters, digits,
# whitespace and common punctuation.
PLAUSIBLE_CHARS: frozenset = frozenset(
    "aăâbcdefghiîjklmnopqrsșşttțţuvwxyz0123456789 \n\t"
    "”„«»—“'!\"?.,\\/`()[]:;-"
)

# characters an upside-down / noisy scan produces — all implausible.
NOISE_CHARS: tuple[str, ...] = tuple("¤¥¦§¨©ª¬®±µ¶×ØÞð")


def _h(s: str) -> int:
    return int.from_bytes(hashlib.sha256(s.encode()).digest()[:8], "big")


@lru_cache(maxsize=1)
def vocabulary() -> frozenset:
    """Pool words + diacritic-folded + normalized forms
    (union semantics of ocr_evaluation.py:24-34)."""
    vocab = set()
    for w in WORD_POOL:
        lw = w.lower()
        vocab.add(lw)
        vocab.add(fold_diacritics(lw))
        vocab.add(normalize_word(lw))
    return frozenset(vocab)


@lru_cache(maxsize=1)
def keyword_list(n: int = 365, seed: int = 7) -> tuple[str, ...]:
    """Deterministic keyword phrase list (our keywords.txt analog):
    1- and 2-word phrases drawn from the pool, unique, sorted."""
    kws: list[str] = []
    seen = set()
    i = 0
    pool = WORD_POOL
    while len(kws) < n:
        r = _h(f"kw:{seed}:{i}")
        i += 1
        if r % 3 == 0:
            kw = pool[r % len(pool)]
        else:
            kw = f"{pool[r % len(pool)]} {pool[(r >> 16) % len(pool)]}"
        if kw not in seen:
            seen.add(kw)
            kws.append(kw)
    return tuple(sorted(kws))


def keywords_hash(keywords) -> str:
    """Version hash of a keyword list (cache key, doc_analysis.py:321-329)."""
    msg = "\n".join(sorted(keywords)).encode()
    return hashlib.sha256(msg).hexdigest()[:16]

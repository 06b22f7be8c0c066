"""Deterministic synthetic interleaved corpus (FIXTURES.md).

Every document is a pure function of ``(seed, i)`` — sha256-driven, no
global RNG — so the Ray pipeline, the golden oracle, and any re-run on any
cluster see byte-identical input.  Archetypes mirror the reference's PDF
fixture corpus (/root/reference/nlp/documents/, tests/test_ocr_worker.py:38-110):

  i == 0  normal        mixed text+media, clean
  i == 1  kwds_all      one span per keyword (golden hit count = len(list))
  i == 2  empty         spans == []            -> reject(empty_document)
  i == 3  malformed     bad kind / null text   -> reject(malformed_span)
  i == 4  mega          ~600 spans             -> explode/reassembly path
  i == 5  deep_dom      140-level nested divs
  i == 6  low_quality   rotated media scan     -> force-rotate retry path
  i == 7  typos         OCR-noise text
  i == 8  oversize      > max_spans_per_doc    -> reject(too_many_spans)
  i >= 9  hash-weighted mix (~60% text-only, ~25% interleaved, ~15% special)
"""

from __future__ import annotations

import hashlib

import pyarrow as pa

from .kernels.ocr_sim import is_rotated_scan
from .kernels.wordpool import WORD_POOL, keyword_list
from .schema import DOCUMENTS_SCHEMA, SPANS_TYPE


class DetRand:
    """Deterministic byte-stream RNG from chained sha256 digests."""

    def __init__(self, *key):
        self._seed = ":".join(map(str, key))
        self._buf = b""
        self._counter = 0

    def _fill(self):
        self._buf += hashlib.sha256(f"{self._seed}#{self._counter}".encode()).digest()
        self._counter += 1

    def randint(self, lo: int, hi: int) -> int:
        """Uniform-ish int in [lo, hi]."""
        while len(self._buf) < 4:
            self._fill()
        v = int.from_bytes(self._buf[:4], "big")
        self._buf = self._buf[4:]
        return lo + v % (hi - lo + 1)

    def choice(self, seq):
        return seq[self.randint(0, len(seq) - 1)]

    def chance(self, pct: int) -> bool:
        return self.randint(0, 99) < pct


# ---------------------------------------------------------------- content

def _sentence(rng: DetRand, n_lo=8, n_hi=18, keywords=()) -> str:
    words = [rng.choice(WORD_POOL) for _ in range(rng.randint(n_lo, n_hi))]
    for kw in keywords:
        pos = rng.randint(0, len(words) - 1)
        words[pos:pos] = kw.split()
    words[0] = words[0].capitalize()
    return " ".join(words) + "."


_DIRTY_SNIPPETS = (
    "<p>ok</p>",                                    # short line -> min_length
    "<p>12345 678901 234567 890123</p>",            # digit-heavy
    "<p>| col | col | col |</p>",                   # ascii table
    "<p>«»—“„«»—“„«»—“„«»—“„</p>",                  # punctuation-only
    "<p>Vezi www.exemplu.ro/pagina pentru detalii complete aici</p>",   # URL strip
    "<p>Scrie la contact@exemplu.ro pentru informații suplimentare</p>",  # email strip
    "<p>S-ar putea să fie necesar să- l recitiți în întregime acum</p>",  # hyphen rejoin
    "<p>Creșterea a fost de 1, 4% față de anul precedent conform datelor</p>",  # number comma
    "<p>Aceasta este o pro­poziție cu cratime moi în interior chiar</p>",  # soft hyphen
    "<p>Hotărârea – publicată — în monitorul oficial de astăzi</p>",  # unicode dash
    "<p>Cuvinte cu sedile vechi: naţional şi internaţional împreună</p>",  # cedilla fix
)


def _nav_footer(rng: DetRand) -> tuple[str, str]:
    links = "".join(
        f'<li><a href="/p{j}">{rng.choice(WORD_POOL)}</a></li>'
        for j in range(rng.randint(3, 8))
    )
    nav = f"<nav><ul>{links}</ul></nav>"
    footer = (
        "<footer>Contact: birou@exemplu.ro | www.exemplu.ro | "
        "Telefon 0210 000 000</footer>"
    )
    return nav, footer


def _linkfarm(rng: DetRand) -> str:
    links = " ".join(
        f'<a href="/x{j}">{rng.choice(WORD_POOL)} {rng.choice(WORD_POOL)}</a>'
        for j in range(rng.randint(4, 9))
    )
    return f"<div>{links}</div>"


def make_html_span(rng: DetRand, keywords=(), dirty_pct=35) -> str:
    """One HTML text span: boilerplate wrapping real paragraphs."""
    nav, footer = _nav_footer(rng)
    paras = []
    n_paras = rng.randint(2, 6)
    kw_per_para = list(keywords)
    for _ in range(n_paras):
        kws = []
        while kw_per_para and rng.chance(60):
            kws.append(kw_per_para.pop())
        sents = " ".join(_sentence(rng, keywords=kws if s == 0 else ())
                         for s in range(rng.randint(1, 3)))
        paras.append(f"<p>{sents}</p>")
        if rng.chance(dirty_pct):
            paras.append(rng.choice(_DIRTY_SNIPPETS))
    body = "".join(paras)
    farm = _linkfarm(rng) if rng.chance(50) else ""
    return (
        f"<html><head><title>{rng.choice(WORD_POOL)}</title></head><body>"
        f"{nav}<article><h1>{_sentence(rng, 3, 6)}</h1>{body}</article>"
        f"{farm}{footer}</body></html>"
    )


def _text_span(text: str, offset: int) -> dict:
    return {"kind": "text", "text": text, "media_ref": "", "offset": offset}


def _media_span(doc_id: str, offset: int) -> dict:
    return {"kind": "media", "text": "", "media_ref": f"m-{doc_id}-{offset}",
            "offset": offset}


def _doc_id(seed: int, i: int, arch: str) -> str:
    h = hashlib.sha256(f"doc:{seed}:{i}".encode()).hexdigest()[:20]
    return f"{arch}-{h}"


def _find_rotated_offset(doc_id: str, start: int = 0) -> int:
    """First offset whose media_ref simulates a rotated scan."""
    off = start
    while not is_rotated_scan(f"m-{doc_id}-{off}"):
        off += 1
    return off


# ---------------------------------------------------------------- archetypes

def gen_doc(seed: int, i: int) -> dict:
    """Generate document ``i`` of corpus ``seed``. Pure function."""
    if i == 0:
        arch = "normal"
    elif i == 1:
        arch = "kwdall"
    elif i == 2:
        arch = "empty"
    elif i == 3:
        arch = "malformed"
    elif i == 4:
        arch = "mega"
    elif i == 5:
        arch = "deepdom"
    elif i == 6:
        arch = "lowq"
    elif i == 7:
        arch = "typos"
    elif i == 8:
        arch = "oversize"
    else:
        r = DetRand("arch", seed, i).randint(0, 99)
        if r < 55:
            arch = "textonly"
        elif r < 72:
            arch = "normal"
        elif r < 82:
            arch = "kwdnat"
        elif r < 90:
            arch = "mediaheavy"
        elif r < 94:
            arch = "typos"
        elif r < 97:
            arch = "lowq"
        elif r < 99:
            arch = "mega"
        else:
            arch = "deepdom"

    doc_id = _doc_id(seed, i, arch)
    rng = DetRand("content", seed, i)
    spans: list[dict] = []

    if arch == "empty":
        pass

    elif arch == "malformed":
        spans.append(_text_span("<p>Prima parte este în regulă aici.</p>", 0))
        bad_type = rng.randint(0, 2)
        if bad_type == 0:
            spans.append({"kind": "video", "text": "", "media_ref": "m-x", "offset": 1})
        elif bad_type == 1:
            spans.append({"kind": "text", "text": None, "media_ref": "", "offset": 1})
        else:
            spans.append({"kind": "media", "text": "", "media_ref": "", "offset": 1})

    elif arch == "oversize":
        for off in range(4100):
            spans.append(_text_span("<p>Conținut repetat pentru test.</p>", off))

    elif arch == "kwdall":
        for off, kw in enumerate(keyword_list()):
            spans.append(_text_span(
                f"<p>Prezentul document menționează {kw} în mod explicit aici.</p>",
                off,
            ))

    elif arch == "mega":
        n = rng.randint(300, 900)
        for off in range(n):
            if rng.chance(30):
                spans.append(_media_span(doc_id, off))
            else:
                spans.append(_text_span(make_html_span(rng, dirty_pct=20), off))

    elif arch == "deepdom":
        depth = rng.randint(100, 140)
        inner = f"<p>{_sentence(rng)} {_sentence(rng)}</p>"
        html = "<div>" * depth + inner + "</div>" * depth
        spans.append(_text_span(f"<html><body>{html}</body></html>", 0))
        spans.append(_media_span(doc_id, 1))

    elif arch == "lowq":
        spans.append(_text_span(make_html_span(rng), 0))
        rot = _find_rotated_offset(doc_id, start=1)
        for off in range(1, rot + 1):
            spans.append(_media_span(doc_id, off))

    elif arch == "typos":
        noisy = []
        for _ in range(rng.randint(3, 6)):
            s = _sentence(rng)
            chars = list(s)
            for _ in range(max(1, len(chars) // 15)):
                chars[rng.randint(0, len(chars) - 1)] = rng.choice("¤¥¦§¨©")
            noisy.append("<p>" + "".join(chars) + "</p>")
        spans.append(_text_span("<html><body>" + "".join(noisy) + "</body></html>", 0))

    elif arch == "textonly":
        for off in range(rng.randint(1, 5)):
            spans.append(_text_span(make_html_span(rng), off))

    elif arch == "kwdnat":
        kws = [DetRand("kwpick", seed, i, j).choice(keyword_list())
               for j in range(rng.randint(3, 8))]
        for off in range(rng.randint(1, 4)):
            spans.append(_text_span(
                make_html_span(rng, keywords=kws if off == 0 else ()), off))

    elif arch == "mediaheavy":
        n = rng.randint(4, 12)
        for off in range(n):
            if rng.chance(70):
                spans.append(_media_span(doc_id, off))
            else:
                spans.append(_text_span(make_html_span(rng), off))

    else:  # normal
        n = rng.randint(3, 10)
        for off in range(n):
            if rng.chance(30):
                spans.append(_media_span(doc_id, off))
            else:
                spans.append(_text_span(make_html_span(rng), off))

    return {"doc_id": doc_id, "spans": spans}


# ---------------------------------------------------------------- tables

def docs_to_table(docs: list[dict]) -> pa.Table:
    return pa.Table.from_pylist(docs, schema=DOCUMENTS_SCHEMA)


def documents_table(n_docs: int, seed: int = 42, start: int = 0) -> pa.Table:
    return docs_to_table([gen_doc(seed, i) for i in range(start, start + n_docs)])


def write_corpus(path: str, n_docs: int, seed: int = 42, docs_per_file: int = 2000):
    """Materialize a corpus as a directory of parquet files (driver-side;
    bench-scale generation goes through Ray, see bench.py)."""
    import os

    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)
    part = 0
    for start in range(0, n_docs, docs_per_file):
        n = min(docs_per_file, n_docs - start)
        tbl = documents_table(n, seed=seed, start=start)
        pq.write_table(tbl, os.path.join(path, f"part-{part:05d}.parquet"))
        part += 1
    return path


# ------------------------------------------------ near-dup recall corpus

def write_neardup_corpus(path: str, n_background: int = 240,
                         n_near: int = 40, n_exact: int = 20,
                         n_vec_pairs: int = 40, n_vec_bg: int = 40,
                         seed: int = 13) -> str:
    """Deterministic planted near-duplicate corpus for RECALL measurement
    (bench entries dedup_recall_{minhash,simhash,embedding}): background
    docs, exact-dup pairs, near-dup pairs (a few tail tokens swapped, so
    shingle Jaccard lands ~0.85-0.95), and an embeddings table with
    pairs planted at cosine ~0.95-0.96 plus random background vectors.
    Ground truth is computed brute-force by the bench (the corpus is
    small by design); all content is a pure function of (seed, i).
    """
    import os

    import numpy as np
    import pyarrow.parquet as pq

    os.makedirs(path, exist_ok=True)

    def words(tag: str, n: int = 110) -> list[str]:
        rng = DetRand(seed, "ndc", tag)
        return [f"{tag}w{i}t{rng.randint(0, 9999)}" for i in range(n)]

    rows = []
    did = 0
    for i in range(n_background):
        rows.append({"doc_id": did, "text": " ".join(words(f"bg{i}"))})
        did += 1
    for i in range(n_exact):
        t = " ".join(words(f"ex{i}"))
        rows.append({"doc_id": did, "text": t}); did += 1
        rows.append({"doc_id": did, "text": t}); did += 1
    for i in range(n_near):
        w = words(f"nr{i}")
        a = " ".join(w)
        w2 = list(w)
        for j in range(1, 6):       # swap 5 tail tokens -> J ~ 0.87
            w2[-j] = f"alt{i}x{j}"
        rows.append({"doc_id": did, "text": a}); did += 1
        rows.append({"doc_id": did, "text": " ".join(w2)}); did += 1
    pq.write_table(pa.Table.from_pylist(
        [{"doc_id": r["doc_id"], "text": r["text"]} for r in rows]),
        os.path.join(path, "documents.parquet"))

    rng = np.random.RandomState(seed)
    vecs, vid = [], 0
    for i in range(n_vec_pairs):
        u = rng.randn(32); u /= np.linalg.norm(u)
        w = rng.randn(32); w -= (w @ u) * u; w /= np.linalg.norm(w)
        c = 0.952 + 0.008 * rng.rand()
        v = c * u + np.sqrt(1 - c * c) * w
        vecs.append({"vec_id": vid, "embedding": u.tolist()}); vid += 1
        vecs.append({"vec_id": vid, "embedding": v.tolist()}); vid += 1
    for _ in range(n_vec_bg):
        vecs.append({"vec_id": vid,
                     "embedding": rng.randn(32).tolist()}); vid += 1
    pq.write_table(pa.Table.from_pylist(vecs),
                   os.path.join(path, "embeddings.parquet"))
    return path

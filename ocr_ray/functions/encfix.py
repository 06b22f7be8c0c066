"""Mojibake repair — UTF-8 text that was decoded as cp1252/latin-1
(once or twice) restored to the original, the ftfy-core fix every
web-crawl pipeline runs before any text analysis.

Semantics (conservative, per-string all-or-nothing):

* a string is a repair CANDIDATE only on marker evidence: a valid
  UTF-8 lead byte's cp1252/latin-1 face followed by the face(s) of
  continuation bytes (``Ã©``, ``â€“``, ``È™`` …).  Markers are tiered
  — ``Â``/``Ã`` leads and all 3-/4-byte sequences are STRONG
  (essentially never legit); other 2-byte leads (``Ä``-``ß``) are
  WEAK, because e.g. ``É`` + curly apostrophe is real text ("JOSÉ's")
  that happens to be byte-valid UTF-8.  Repair needs >= 1 strong or
  >= 2 weak markers; marker-free text never enters Python (the
  vectorized RE2 pre-filter uses the same pattern);
* a repair round re-encodes through cp1252 (the five unmapped
  positions 0x81/0x8D/0x8F/0x90/0x9D fall back to their latin-1
  bytes — "sloppy cp1252", inverting either decode direction) and
  strictly re-decodes as UTF-8.  The round is REJECTED — string left
  byte-identical — if either codec step fails (this is what protects
  mixed clean+mojibake strings: one genuine ``é`` makes the strict
  UTF-8 decode fail), if the total marker count does not strictly
  drop, or if the decode introduces characters from implausible
  blocks (IPA extensions, bare combining marks, private use) that
  real mojibake sources never produce — the "JOSÉ's JOSÉ's" guard;
* rounds repeat (default 3) so double-encoded mojibake converges;
  strict marker decrease guarantees termination and idempotence:
  fix(fix(s)) == fix(s).

Known, documented residual: a weak-lead string whose repair lands in
a plausible block (e.g. ``×`` + NBSP -> one Hebrew letter) can still
false-positive when it co-occurs with a second marker; genuinely
ambiguous single-marker weak strings (Romanian ``È™`` alone) are
skipped by the same rule — corpora with systematic mojibake have many
markers per doc and repair fully.

Not SQL-expressible (DuckDB has no encode/decode) — pytest-gated
against a pure round-trip oracle (encode(u) -> misdecode -> fix == u).

Reference analog: none — beyond-reference training-data operator
(text-cleanup family, SURVEY.md §2.8 extension).
"""
from __future__ import annotations

import codecs
import re

import pyarrow as pa
import pyarrow.compute as pc

_MAX_ROUNDS = 3


def _sloppy_cp1252_error(err: UnicodeError):
    """Encode-error fallback: chars cp1252 cannot map but whose
    codepoint is < 0x100 become their latin-1 byte (the five cp1252
    holes decode to those codepoints via latin-1)."""
    obj = err.object[err.start:err.end]
    if any(ord(c) > 0xFF for c in obj):
        raise err
    return bytes(ord(c) for c in obj), err.end


codecs.register_error("ocr_ray_sloppy1252", _sloppy_cp1252_error)


def _cont_class() -> str:
    """Regex char class of every continuation byte's face under BOTH
    misdecode lenses: cp1252 (curly quotes, €, ™ …) and latin-1 (the
    raw C1 controls — a latin-1 misdecode leaves 0x80-0x9F as
    controls, not punctuation)."""
    chars = set()
    for b in range(0x80, 0xC0):
        chars.add(chr(b))
        try:
            chars.add(bytes([b]).decode("cp1252"))
        except UnicodeDecodeError:
            pass
    body = "".join(sorted(chars))
    for sp in ("\\", "]", "^", "-"):
        body = body.replace(sp, "\\" + sp)
    return "[" + body + "]"


_CONT = _cont_class()
# UTF-8 lead bytes through the cp1252 lens: 2-byte leads 0xC2-0xDF,
# 3-byte 0xE0-0xEF, 4-byte 0xF0-0xF4, each followed by that many
# continuation faces.
_STRONG_PATTERN = (f"[ÂÃ]{_CONT}"
                   f"|[à-ï]{_CONT}{{2}}"
                   f"|[ð-ô]{_CONT}{{3}}")
_WEAK_PATTERN = f"[Ä-ß]{_CONT}"
MOJIBAKE_PATTERN = f"{_STRONG_PATTERN}|{_WEAK_PATTERN}"
_STRONG_RE = re.compile(_STRONG_PATTERN)
_WEAK_RE = re.compile(_WEAK_PATTERN)
# repair output no real mojibake source produces: IPA extensions /
# spacing modifiers (except cp1252's own U+02C6 circumflex and U+02DC
# tilde, which legitimately appear in double-mojibake intermediates),
# bare combining marks, private use.
_IMPLAUSIBLE_RE = re.compile("[\u0250-\u02c5\u02c7-\u02db"
                             "\u02dd-\u02ff\u0300-\u036f"
                             "\ue000-\uf8ff]")


def mojibake_score(s: str) -> tuple[int, int]:
    """(strong, weak) counts of non-overlapping marker sequences."""
    return len(_STRONG_RE.findall(s)), len(_WEAK_RE.findall(s))


def fix_mojibake(s: str, max_rounds: int = _MAX_ROUNDS) -> tuple[str, int]:
    """Repair (once- or twice-) misdecoded UTF-8; returns
    (fixed_text, rounds_applied).  Marker-free, under-evidenced, or
    unrepairable input comes back unchanged with rounds 0."""
    fixed, rounds = s, 0
    for _ in range(max_rounds):
        ns, nw = mojibake_score(fixed)
        if ns == 0 and nw < 2:
            break
        try:
            raw = fixed.encode("cp1252", errors="ocr_ray_sloppy1252")
            cand = raw.decode("utf-8", errors="strict")
        except UnicodeError:
            break
        cs, cw = mojibake_score(cand)
        # accept only if (total, strong) strictly drops lexicographic:
        # a double-misdecode round can turn N strong markers into N
        # weak ones (Greek/Cyrillic leads are weak faces) — total ties
        # but strong falls, and the order is well-founded so the loop
        # still terminates
        if (cand == fixed or (cs + cw, cs) >= (ns + nw, ns)
                or _IMPLAUSIBLE_RE.search(cand)):
            break
        fixed, rounds = cand, rounds + 1
    return fixed, rounds


def fix_mojibake_batch(batch: pa.Table,
                       text_col: str = "text") -> pa.Table:
    """(…, text) batch -> same columns with ``text`` repaired plus an
    ``enc_fix_rounds:int32`` column.  RE2 pre-filter (the SAME pattern
    the Python kernel gates on) keeps clean rows out of Python."""
    col = batch[text_col]
    sus = pc.fill_null(
        pc.match_substring_regex(col, MOJIBAKE_PATTERN), False)
    rounds = [0] * batch.num_rows
    if pc.any(sus).as_py():
        flags = sus.to_pylist()
        idxs = [i for i, f in enumerate(flags) if f]
        texts = col.take(pa.array(idxs, pa.int64())).to_pylist()
        repaired = {}
        for i, t in zip(idxs, texts):
            ft, r = fix_mojibake(t)
            if r:
                repaired[i] = ft
                rounds[i] = r
        if repaired:
            # patch ONLY the repaired rows back: clean rows stay in
            # Arrow (a sporadically-dirty corpus must not pay a full
            # to_pylist round-trip per batch)
            mask = [i in repaired for i in range(batch.num_rows)]
            col = pc.replace_with_mask(
                col.combine_chunks() if isinstance(col, pa.ChunkedArray)
                else col,
                pa.array(mask, pa.bool_()),
                pa.array([repaired[i] for i in sorted(repaired)],
                         pa.string()))
    out = batch.set_column(batch.schema.get_field_index(text_col),
                           text_col, col)
    return out.append_column("enc_fix_rounds",
                             pa.array(rounds, pa.int32()))


def fix_encoding(sf_dir: str):
    """Dataset[doc_id, text, enc_fix_rounds] — the corpus with mojibake
    rows repaired.  Map-only: no shuffle at any scale."""
    from ._io import clean_read

    ds = clean_read(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text"])
    return ds.map_batches(fix_mojibake_batch, batch_format="pyarrow")


def encoding_health_stats(sf_dir: str) -> pa.Table:
    """One-row corpus summary: rows scanned, rows repaired, single- vs
    double-pass repair counts, marker rows left unrepaired (the
    conservative-skip bucket)."""
    from ray.data.aggregate import AggregateFn

    ds = fix_encoding(sf_dir)

    def acc(state, blk: pa.Table):
        n, fixed, r1, r2p, residual = state or (0, 0, 0, 0, 0)
        rr = blk["enc_fix_rounds"].to_pylist()
        left = pc.fill_null(pc.match_substring_regex(
            blk["text"], MOJIBAKE_PATTERN), False)
        residual += sum(1 for f, r in zip(left.to_pylist(), rr)
                        if f and r == 0)
        n += blk.num_rows
        fixed += sum(1 for r in rr if r > 0)
        r1 += sum(1 for r in rr if r == 1)
        r2p += sum(1 for r in rr if r >= 2)
        return (n, fixed, r1, r2p, residual)

    def merge(s1, s2):
        if s1 is None:
            return s2
        if s2 is None:
            return s1
        return tuple(a + b for a, b in zip(s1, s2))

    agg = AggregateFn(init=lambda _: None, merge=merge,
                      accumulate_block=acc, name="enc")
    n, fixed, r1, r2p, residual = ds.aggregate(agg)["enc"]
    return pa.table({"n_docs": [n], "n_repaired": [fixed],
                     "n_single_pass": [r1], "n_double_pass": [r2p],
                     "n_marker_unrepaired": [residual]})

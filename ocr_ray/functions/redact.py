"""PII / pattern redaction over text columns — a core training-data
scrub stage (strip emails, phone numbers, IPs, SSNs before a corpus is
chunked and packed).

Fully vectorized: each pattern is applied with the Arrow RE2 kernels
(``count_substring_regex`` + ``replace_substring_regex``) inside one
``map_batches`` — no Python loop over rows, no shuffle.  Patterns are
applied IN ORDER and each pattern's count is taken on the text as left
by the previous patterns (the observable contract; the DuckDB oracle
nests ``regexp_replace`` in the same order — both engines run RE2, so
the semantics match byte for byte, see tests/test_redact.py).

Reference analog: the reference cleans extracted text rule-by-rule with
ordered regex passes (app/services/text_processing.py:76-213); this
module applies the same ordered-pass discipline to redaction.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# Order matters: SSN before the phone shape would also match it if the
# separators were widened; emails before bare-number passes so the
# local-part digits don't get half-redacted first.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"),
)

REDACTION_TOKEN = "[PII]"


def redact_batch(col: pa.ChunkedArray | pa.Array,
                 patterns=PII_PATTERNS,
                 token: str = REDACTION_TOKEN):
    """(redacted_column, {name: count_array}) for one Arrow column."""
    counts = {}
    cur = col
    for name, pat in patterns:
        counts[name] = pc.count_substring_regex(cur, pat)
        cur = pc.replace_substring_regex(cur, pat, token)
    return cur, counts


def redact_columns(ds, text_col: str = "text",
                   patterns=PII_PATTERNS, token: str = REDACTION_TOKEN):
    """Dataset operator: replace ``text_col`` with its redacted form and
    append one ``n_<pattern>`` int64 count column per pattern.  Schema
    otherwise unchanged; streaming map-only (no shuffle)."""

    def apply(batch: pa.Table) -> pa.Table:
        red, counts = redact_batch(batch[text_col], patterns, token)
        out = batch.set_column(
            batch.schema.get_field_index(text_col), text_col, red)
        for name, _ in patterns:
            out = out.append_column(
                f"n_{name}", pc.cast(counts[name], pa.int64()))
        return out

    return ds.map_batches(apply, batch_format="pyarrow")


def redact_pii(ds, text_col: str = "text"):
    """The default PII scrub: emails, IPv4s, SSNs, phone numbers."""
    return redact_columns(ds, text_col, PII_PATTERNS)


# ------------------------------------------------- registry query

NUM_PATTERNS: tuple[tuple[str, str], ...] = (("num", r"\d+"),)


def props_redaction(sf_dir: str):
    """Per-event-type redaction stats over events.props (the synthetic
    corpus carries no planted PII, so the driver-visible check runs the
    numeric pattern — non-trivial on every row; the PII pattern set is
    exercised by the planted-fixture tests)."""
    from ray.data.aggregate import Sum

    from ._io import clean_read

    ds = clean_read(f"{sf_dir}/events.parquet",
                    columns=["event_type", "props"])

    def partial(batch: pa.Table) -> pa.Table:
        red, counts = redact_batch(batch["props"], NUM_PATTERNS)
        t = pa.table({
            "event_type": batch["event_type"],
            "n_redacted": pc.cast(counts["num"], pa.int64()),
            "redacted_len": pc.cast(pc.utf8_length(red), pa.int64()),
        })
        # partial-aggregate inside the map task: <= #event_types rows
        # leave each block, so the groupby shuffles O(types), not O(rows)
        g = t.group_by("event_type").aggregate(
            [("n_redacted", "count"), ("n_redacted", "sum"),
             ("redacted_len", "sum")])
        # select by NAME: pyarrow has moved group keys between first
        # and last column across versions (round-5 ADVICE)
        return pa.table({
            "event_type": g["event_type"],
            "n_events": g["n_redacted_count"].cast(pa.int64()),
            "n_redacted": g["n_redacted_sum"].cast(pa.int64()),
            "redacted_len": g["redacted_len_sum"].cast(pa.int64()),
        })

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby("event_type")
            .aggregate(Sum("n_events", alias_name="n_events"),
                       Sum("n_redacted", alias_name="n_redacted"),
                       Sum("redacted_len", alias_name="redacted_len")))


PROPS_REDACTION_SQL = """
SELECT event_type,
       count(*) AS n_events,
       CAST(sum(len(regexp_extract_all(props, '\\d+'))) AS BIGINT)
           AS n_redacted,
       CAST(sum(length(regexp_replace(props, '\\d+', '[PII]', 'g')))
           AS BIGINT) AS redacted_len
FROM events GROUP BY event_type
"""


def pii_spans_text(text: str, patterns=PII_PATTERNS
                   ) -> list[tuple[str, int, int]]:
    """(kind, start, end) character spans of every PII hit in ONE
    string, against the ORIGINAL text — the audit/annotation view of
    the same ordered pattern pass ``redact_batch`` applies.

    Ordered-pass emulation with stable offsets: after each pattern,
    matched regions are masked in a working copy with NULs (same
    length, so offsets never shift), which reproduces redaction's
    "later patterns don't re-match inside earlier hits" semantics
    without the length changes the real [PII] token introduces.  The
    one divergence (a later pattern matching ACROSS a [PII] seam in
    the redacted string) cannot produce a span here by construction —
    documented, and the splice-equality test pins agreement on
    realistic text.
    """
    import re as _re

    spans: list[tuple[str, int, int]] = []
    work = text
    for name, pat in patterns:
        for m in _re.finditer(pat, work):
            spans.append((name, m.start(), m.end()))
        if spans:
            buf = list(work)
            for _, s, e in spans:
                for i in range(s, e):
                    buf[i] = "\x00"
            work = "".join(buf)
    spans.sort(key=lambda t: t[1])
    return spans


def pii_spans(sf_dir: str, patterns=PII_PATTERNS):
    """Dataset[doc_id, kind, start, end] — one row per PII hit over
    the documents table, offsets into the ORIGINAL text.  Map-only."""
    from .corpus_prep import _read

    ds = _read(sf_dir, ["doc_id", "text"])

    def scan(batch: pa.Table) -> pa.Table:
        out_id, out_kind, out_s, out_e = [], [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            for kind, s, e in pii_spans_text(text or "", patterns):
                out_id.append(doc_id)
                out_kind.append(kind)
                out_s.append(s)
                out_e.append(e)
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "kind": pa.array(out_kind, pa.string()),
                         "start": pa.array(out_s, pa.int64()),
                         "end": pa.array(out_e, pa.int64())})

    return ds.map_batches(scan, batch_format="pyarrow", batch_size=2048)

"""Blocklist (bad-word) filtering — the C4-style corpus scrub stage
(Raffel et al. 2020 drop any page containing a blocklisted word).

One compiled RE2 alternation ``(?i)\\b(w1|w2|...)\\b`` applied with the
Arrow ``count_substring_regex`` kernel inside one ``map_batches`` —
vectorized, map-only, no shuffle, no Python row loop.  DuckDB runs the
SAME RE2 pattern (``regexp_extract_all``), so per-doc counts are
byte-parity checkable (tests/test_blocklist.py), the same discipline
as ``functions/redact.py``.

Scale shape: pure map over the pruned (doc_id, text) scan; the word
list rides inside the task closure (compiled once per task by Arrow's
kernel cache) — never a join, never a broadcast table.

Reference analog: keyword matching in the reference is allow-list
driven (app/services/analyzer); this is the deny-list complement a
training-data pipeline needs.
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc

# deliberately neutral default list; real deployments pass their own
DEFAULT_BLOCKWORDS: tuple[str, ...] = ("casino", "lottery", "viagra")


def blocklist_pattern(words) -> str:
    """The RE2 alternation both engines run.  Words are regex-escaped
    and sorted (deterministic pattern independent of input order;
    longer-first so RE2's leftmost-longest alternation can't shadow a
    longer word with its prefix)."""
    ws = sorted({w.lower() for w in words if w},
                key=lambda w: (-len(w), w))
    if not ws:
        raise ValueError("empty blocklist")
    return r"(?i)\b(" + "|".join(re.escape(w) for w in ws) + r")\b"


def blocklist_doc_stats(sf_dir: str, words=DEFAULT_BLOCKWORDS,
                        text_col: str = "text"):
    """Dataset[doc_id, n_blocked, keep]: per-document blocklisted-word
    occurrence count (word-boundary, case-insensitive) and the C4 keep
    flag (keep = zero occurrences)."""
    from ._io import clean_read

    pat = blocklist_pattern(words)
    ds = clean_read(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", text_col])

    def stats(batch: pa.Table, pat=pat) -> pa.Table:
        n = pc.cast(pc.count_substring_regex(batch[text_col], pat),
                    pa.int64())
        return pa.table({"doc_id": batch["doc_id"],
                         "n_blocked": n,
                         "keep": pc.equal(n, pa.scalar(0, pa.int64()))})

    return ds.map_batches(stats, batch_format="pyarrow")


def blocklist_survivors(sf_dir: str, words=DEFAULT_BLOCKWORDS,
                        text_col: str = "text"):
    """The filter itself: documents containing NO blocklisted word,
    full rows, one streaming pass (count + filter fused per batch)."""
    from ._io import clean_read

    pat = blocklist_pattern(words)
    ds = clean_read(f"{sf_dir}/documents.parquet")

    def keep_only(batch: pa.Table, pat=pat) -> pa.Table:
        n = pc.count_substring_regex(batch[text_col], pat)
        return batch.filter(pc.equal(pc.cast(n, pa.int64()),
                                     pa.scalar(0, pa.int64())))

    return ds.map_batches(keep_only, batch_format="pyarrow")


def blocklist_sql(words=DEFAULT_BLOCKWORDS,
                  text_col: str = "text") -> str:
    """DuckDB mirror of blocklist_doc_stats (same RE2 pattern)."""
    pat = blocklist_pattern(words).replace("'", "''")
    return (f"SELECT doc_id, "
            f"length(regexp_extract_all({text_col}, '{pat}')) "
            f"AS n_blocked, "
            f"length(regexp_extract_all({text_col}, '{pat}')) = 0 "
            f"AS keep FROM documents")

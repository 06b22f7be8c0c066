"""Canonical Arrow schemas (SURVEY.md §1.2).

The reference keeps shapes as implicit dict conventions
(/root/reference/app/constants.py:1-63); here every table has a declared
nested Arrow schema, identical for Parquet and Lance storage.
"""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct([
    ("kind", pa.string()),        # "text" | "media"
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("offset", pa.int32()),
])

SPANS_TYPE = pa.list_(SPAN_STRUCT)

# input + output share the shape (BASELINE.json input_hint)
DOCUMENTS_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("spans", SPANS_TYPE),
])

EXTRACTED_SCHEMA = DOCUMENTS_SCHEMA

FAILED_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("reason", pa.string()),
])

# per-doc metrics (aggregated to per-partition lineage records;
# CleanStats semantics text_processing.py:202-211)
METRICS_FIELDS = [
    ("doc_id", pa.string()),
    ("n_spans", pa.int64()),
    ("media_spans", pa.int64()),
    ("blocks_kept", pa.int64()),
    ("blocks_dropped", pa.int64()),
    ("clean_chars", pa.int64()),
    ("original_chars", pa.int64()),
    ("min_length_lines", pa.int64()),
    ("forbidden_lines", pa.int64()),
    ("low_alpha_lines", pa.int64()),
    ("high_digit_lines", pa.int64()),
    ("non_ascii_lines", pa.int64()),
    ("num_ents", pa.int64()),
    ("quality_mean", pa.float64()),
    ("retried_spans", pa.int64()),
    ("conf_hist", pa.list_(pa.int64())),
]
METRICS_SCHEMA = pa.schema(METRICS_FIELDS)

KEYWORD_HITS_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("keyword", pa.string()),
    ("occs", pa.list_(pa.struct([
        ("span_idx", pa.int32()),
        ("start", pa.int32()),
        ("end", pa.int32()),
    ]))),
    ("total_occs", pa.int64()),
])

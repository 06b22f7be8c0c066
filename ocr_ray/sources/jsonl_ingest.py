"""JSONL ingestion — source-format breadth beyond parquet/Lance.

The reference's data plane includes JSONL streams (perf rows,
tests/test_performance.py:79-80; job payloads are row-oriented JSON).
This source reads newline-delimited JSON documents of the shape

    {"doc_id": "...", "spans": [{"kind": ..., "text": ...,
                                 "media_ref": ..., "offset": ...}, ...]}

and lands them on the canonical Arrow schema, so a JSONL drop folder can
feed the same pipeline as the columnar tables.  Ray's ``read_json``
streams per-file, keeping ingestion parallel and bounded.
"""

from __future__ import annotations

import pyarrow as pa

from ..schema import DOCUMENTS_SCHEMA, SPANS_TYPE


def _conform(batch: pa.Table) -> pa.Table:
    """Cast the JSON-inferred types onto the canonical schema (JSON
    integers arrive int64; spans structs may order fields differently)."""
    spans = batch.column("spans")
    rows = []
    for doc_id, span_list in zip(batch.column("doc_id").to_pylist(),
                                 spans.to_pylist()):
        norm = None
        if span_list is not None:
            norm = [{
                "kind": s.get("kind"),
                "text": s.get("text"),
                "media_ref": s.get("media_ref"),
                "offset": s.get("offset"),
            } for s in span_list]
        rows.append({"doc_id": str(doc_id), "spans": norm})
    return pa.Table.from_pylist(rows, schema=DOCUMENTS_SCHEMA)


def read_jsonl_documents(path: str):
    """JSONL documents directory/file -> Dataset on DOCUMENTS_SCHEMA."""
    import ray.data as rd

    return rd.read_json(path).map_batches(_conform, batch_format="pyarrow")

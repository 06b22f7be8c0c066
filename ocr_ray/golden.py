"""Golden single-threaded extractor — the pytest oracle.

Runs the exact per-document kernel (ocr_ray.kernels.extract.extract_doc)
sequentially over a pyarrow documents table, with no Ray involvement.
The distributed pipeline must be span-sequence-equal (kind, text,
media_ref, order) per doc_id against this output — the north-rule
invariant.  Mirrors the reference's test harness pattern of running the
full validate+process chain per fixture document
(/root/reference/tests/test_ocr_worker.py:23-35).
"""

from __future__ import annotations

import pyarrow as pa

from .config import DEFAULT_CONFIG, PipelineConfig
from .kernels.extract import extract_doc
from .schema import EXTRACTED_SCHEMA, FAILED_SCHEMA, METRICS_SCHEMA


def golden_extract(
    documents: pa.Table, cfg: PipelineConfig = DEFAULT_CONFIG
) -> dict:
    """Sequentially extract every document.

    Returns {"extracted": Table, "failed": Table, "metrics": Table}.
    """
    extracted, failed, metrics = [], [], []
    for row in documents.to_pylist():
        res = extract_doc(row["doc_id"], row["spans"], cfg)
        if res["ok"]:
            extracted.append({"doc_id": res["doc_id"], "spans": res["spans"]})
            metrics.append({"doc_id": res["doc_id"], **res["metrics"]})
        else:
            failed.append({"doc_id": res["doc_id"], "reason": res["reason"]})
    return {
        "extracted": pa.Table.from_pylist(extracted, schema=EXTRACTED_SCHEMA),
        "failed": pa.Table.from_pylist(failed, schema=FAILED_SCHEMA),
        "metrics": pa.Table.from_pylist(metrics, schema=METRICS_SCHEMA),
    }


def spans_fingerprint(extracted: pa.Table) -> dict[str, tuple]:
    """doc_id -> hashable span sequence (kind, text, media_ref, offset),
    for order-sensitive equality assertions."""
    fp = {}
    for row in extracted.to_pylist():
        fp[row["doc_id"]] = tuple(
            (s["kind"], s["text"], s["media_ref"], s["offset"])
            for s in row["spans"]
        )
    return fp


def assert_span_equal(actual: pa.Table, expected: pa.Table):
    """Raise AssertionError with a useful diff on the first mismatch."""
    fa, fe = spans_fingerprint(actual), spans_fingerprint(expected)
    if set(fa) != set(fe):
        missing = set(fe) - set(fa)
        extra = set(fa) - set(fe)
        raise AssertionError(
            f"doc_id sets differ: missing={sorted(missing)[:5]} extra={sorted(extra)[:5]}"
        )
    for doc_id, exp in fe.items():
        act = fa[doc_id]
        if act != exp:
            for i, (a, e) in enumerate(zip(act, exp)):
                if a != e:
                    raise AssertionError(
                        f"doc {doc_id} span {i} differs:\n actual={a!r}\n expect={e!r}"
                    )
            raise AssertionError(
                f"doc {doc_id}: span count {len(act)} != {len(exp)}"
            )

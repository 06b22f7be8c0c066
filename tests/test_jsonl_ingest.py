"""JSONL ingestion lands on the canonical schema and feeds the pipeline."""

import json

import pyarrow.compute as pc

from ocr_ray.fixtures import gen_doc
from ocr_ray.golden import assert_span_equal, golden_extract
from ocr_ray.fixtures import docs_to_table
from ocr_ray.pipelines.extract_pipeline import build_extracted
from ocr_ray.schema import DOCUMENTS_SCHEMA
from ocr_ray.sources.jsonl_ingest import read_jsonl_documents


def test_jsonl_roundtrip_and_extract(ray_session, tmp_path):
    docs = [gen_doc(42, i) for i in range(12) if i not in (3,)]  # skip null-text malformed
    path = tmp_path / "docs.jsonl"
    with open(path, "w") as f:
        for d in docs:
            f.write(json.dumps(d) + "\n")

    ds = read_jsonl_documents(str(path))
    tbl = ds.to_pandas()
    assert len(tbl) == len(docs)

    result = build_extracted(read_jsonl_documents(str(path))).to_pandas()
    ok = result[result["reject_reason"] == ""]
    import pyarrow as pa

    actual = pa.Table.from_pylist(
        ok[["doc_id", "spans"]].to_dict("records"),
        schema=DOCUMENTS_SCHEMA)
    golden = golden_extract(docs_to_table(docs))
    assert_span_equal(actual, golden["extracted"])

"""CSV ingestion: flat (doc_id, text) rows land on the canonical span
schema and extract identically to the same corpus read from parquet."""

import csv

import pyarrow as pa

from ocr_ray.golden import assert_span_equal, golden_extract
from ocr_ray.pipelines.extract_pipeline import build_extracted
from ocr_ray.schema import DOCUMENTS_SCHEMA
from ocr_ray.sources.readers import read_csv_documents


def test_csv_roundtrip_and_extract(ray_session, tmp_path):
    rows = [
        ("101", "A plain paragraph of sufficiently long prose content "
                "that survives the line-length and alpha-ratio rules."),
        ("102", "Another document body with enough alphabetic text to "
                "be kept by the cleaner after normalization passes."),
        ("103", "Short."),  # cleaned away -> empty text span
    ]
    path = tmp_path / "docs.csv"
    with open(path, "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(["doc_id", "text"])
        w.writerows(rows)

    ds = read_csv_documents(str(path))
    tbl = ds.take_all()
    assert sorted(r["doc_id"] for r in tbl) == ["101", "102", "103"]
    assert all(len(r["spans"]) == 1 and r["spans"][0]["kind"] == "text"
               for r in tbl)

    result = build_extracted(read_csv_documents(str(path))).to_pandas()
    ok = result[result["reject_reason"] == ""]
    actual = pa.Table.from_pylist(
        ok[["doc_id", "spans"]].to_dict("records"),
        schema=DOCUMENTS_SCHEMA)
    # golden over the identical span-form table: CSV ingestion must be
    # indistinguishable from any other physical source
    flat = pa.Table.from_pylist(
        [{"doc_id": d,
          "spans": [{"kind": "text", "text": t, "media_ref": "",
                     "offset": 0}]} for d, t in rows],
        schema=DOCUMENTS_SCHEMA)
    golden = golden_extract(flat)
    assert_span_equal(actual, golden["extracted"])

"""Ray-parallel corpus generation must reproduce driver-side generation
bit for bit (the property the bench corpus relies on)."""

import hashlib

import pyarrow as pa
import ray.data as rd

from ocr_ray.fixtures import documents_table, gen_doc
from ocr_ray.golden import spans_fingerprint
from ocr_ray.schema import DOCUMENTS_SCHEMA


def _fingerprint(tbl: pa.Table) -> str:
    rows = sorted(tbl.to_pylist(), key=lambda r: r["doc_id"])
    return hashlib.sha256(repr(rows).encode()).hexdigest()


def test_ray_generation_matches_driver(ray_session):
    n = 40

    def gen_batch(batch: pa.Table) -> pa.Table:
        docs = [gen_doc(42, int(i)) for i in batch["id"].to_pylist()]
        return pa.Table.from_pylist(docs, schema=DOCUMENTS_SCHEMA)

    via_ray = (rd.range(n, override_num_blocks=8)
               .map_batches(gen_batch, batch_format="pyarrow", batch_size=7)
               .to_pandas())
    ray_tbl = pa.Table.from_pylist(
        via_ray.to_dict("records"), schema=DOCUMENTS_SCHEMA)
    driver_tbl = documents_table(n, seed=42)
    assert _fingerprint(ray_tbl) == _fingerprint(driver_tbl)

"""The flagship extraction pipeline.

    read -> validate -> { nested extract | explode -> span extract ->
    groupby(doc_id) reassemble } -> union -> write

Physical notes (SURVEY.md §4):

* the small/big split is expressed as two filtered branches over the same
  (cheap) read+validate prefix.  Ray Data executes each branch's lineage
  independently — the double scan is deliberate: this workload is compute
  bound (HTML parse + OCR dominate the read by >100x), so re-reading the
  pruned input costs ~1% while avoiding a mid-pipeline materialize() of
  the whole corpus, which would defeat streaming at the 100 TB target.
* the ONLY all-to-all shuffle is the ``groupby(doc_id)`` reassembling
  exploded mega-docs — a small fraction of rows by construction
  (n_spans > explode_threshold).  Per-span rows distribute evenly, which
  IS the skew mitigation: a 900-span doc becomes 900 independent rows.
* no stage materializes the dataset; output is streamed to partitioned
  parquet.  Failed docs are routed to a sidecar table, not dropped
  (reference marks them ocr_failed, ocr_worker.py:322-330).
"""

from __future__ import annotations

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..sources.readers import read_documents
from ..stages.extract_stage import (
    ExtractDocs,
    ExtractSpans,
    explode_spans,
    reassemble_group,
)
from ..stages.validate import validate_batch


def build_extracted(ds, cfg: PipelineConfig = DEFAULT_CONFIG):
    """Lazy Dataset of extraction results (RESULT_SCHEMA rows: doc_id,
    spans, per-doc metric columns) for the valid documents of ``ds``."""
    validated = ds.map_batches(
        validate_batch, batch_format="pyarrow", fn_kwargs={"cfg": cfg})

    ok = validated.filter(expr="reject_reason == ''")
    small = ok.filter(expr=f"n_spans <= {cfg.explode_threshold}")
    big = ok.filter(expr=f"n_spans > {cfg.explode_threshold}")

    small_res = small.map_batches(
        ExtractDocs,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.extract_batch_size,
        concurrency=cfg.extract_concurrency,
        num_cpus=1,
    )

    big_res = (
        big.map_batches(explode_spans, batch_format="pyarrow")
        .map_batches(
            ExtractSpans,
            fn_constructor_kwargs={"cfg": cfg},
            batch_format="pyarrow",
            batch_size=cfg.span_batch_size,
            concurrency=cfg.extract_concurrency,
            num_cpus=1,
        )
        .groupby("doc_id")
        .map_groups(
            reassemble_group, batch_format="pyarrow", fn_kwargs={"cfg": cfg})
    )
    return small_res.union(big_res)


def build_failed(ds, cfg: PipelineConfig = DEFAULT_CONFIG):
    """Lazy Dataset of (doc_id, reason) rejection rows."""
    return (
        ds.map_batches(validate_batch, batch_format="pyarrow", fn_kwargs={"cfg": cfg})
        .filter(expr="reject_reason != ''")
        .select_columns(["doc_id", "reject_reason"])
        .rename_columns({"reject_reason": "reason"})
    )


def run_extraction(
    input_path: str,
    output_dir: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> dict:
    """Execute the pipeline end to end, writing:

        {output_dir}/extracted/   doc_id, spans, per-doc metric columns
        {output_dir}/failed/      doc_id, reason

    Returns summary counts. For the resumable sharded runner see
    ocr_ray.state.checkpoint.CheckpointedRunner.
    """
    ds = read_documents(input_path)
    result = build_extracted(ds, cfg)
    result.write_parquet(f"{output_dir}/extracted")

    failed = build_failed(ds, cfg)
    failed.write_parquet(f"{output_dir}/failed")

    import pyarrow.dataset as pads

    n_ok = pads.dataset(f"{output_dir}/extracted").count_rows()
    n_failed = pads.dataset(f"{output_dir}/failed").count_rows()
    return {"extracted": n_ok, "failed": n_failed, "output_dir": output_dir}

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
    add_reassembly_bucket,
    explode_spans,
    reassemble_bucket,
)
from ..stages.validate import validate_batch


def _pool_and_blocks(cfg: PipelineConfig) -> tuple[tuple, int]:
    """Size the actor pools and block granularity from the cluster.

    Measured on the 32-CPU bench: an autoscaling (1, N) pool ramps so
    slowly that the exploded stage ran ~1-core (23 s for a 23-CPU-second
    workload); pre-starting min = CPUs/2 - 2 actors per branch cut it to
    4.3 s.  Two branches coexist, so each pool's floor leaves headroom
    for the task operators (read/validate/write) — the starvation rule.
    Blocks are split to ~4x CPUs before the heavy stages so every actor
    has work from the first scheduling tick.
    """
    import ray

    total = int(ray.cluster_resources().get("CPU", 8))
    if isinstance(cfg.extract_concurrency, int):
        pool = cfg.extract_concurrency
    else:
        # floor: most of the cluster, but always leave >=2 CPUs for the
        # task operators (read/write) — on tiny clusters total//2-2
        # degenerates to 1 actor and the job runs serial (measured 2x
        # loss at num_cpus=4)
        floor = max(1, min(total - 2, max(2, total * 2 // 3)))
        pool = (floor, max(total, 2))
    return pool, max(16, total * 4)


def _big_pool(cfg: PipelineConfig):
    """The exploded branch is usually near-empty (only true monster docs
    route here), so it autoscales from 1 instead of pre-reserving CPUs."""
    import ray

    total = int(ray.cluster_resources().get("CPU", 8))
    if isinstance(cfg.extract_concurrency, int):
        return cfg.extract_concurrency
    return (1, max(total, 2))


def _nested_branch(ok, cfg: PipelineConfig, pool):
    # no repartition barrier: read-fragment granularity + batch_size
    # slicing feed the pool evenly (measured equal to an explicit
    # repartition at 12k docs, minus the barrier)
    return ok.map_batches(
        ExtractDocs,
        fn_constructor_kwargs={"cfg": cfg},
        batch_format="pyarrow",
        batch_size=cfg.extract_batch_size,
        concurrency=pool,
        num_cpus=1,
        zero_copy_batch=True,  # fns never mutate input; ~13% at 32 CPUs
    )


def _exploded_branch(ok, cfg: PipelineConfig, pool, nblocks):
    return (
        ok.map_batches(explode_spans, batch_format="pyarrow",
                       zero_copy_batch=True)
        .repartition(nblocks)  # a monster doc arrives as ONE huge block;
                               # this spreads its spans across the cluster
        .map_batches(
            ExtractSpans,
            fn_constructor_kwargs={"cfg": cfg},
            batch_format="pyarrow",
            batch_size=None,
            concurrency=pool,
            num_cpus=1,
            zero_copy_batch=True,
        )
        # bucketized reassembly: ONE group per hash bucket (not per doc)
        # amortizes the per-group machinery over ~hundreds of docs; the
        # groupby(bucket) shuffle moves the same span rows the per-doc
        # groupby did.  Bucket count must scale with the DATA (a fixed
        # cluster-sized count makes group size grow with the corpus):
        # run_extraction sizes cfg.reassembly_buckets from the input's
        # metadata row count; the cluster-sized value only backstops
        # entry points that cannot count cheaply.
        .map_batches(add_reassembly_bucket, batch_format="pyarrow",
                     fn_kwargs={"n_buckets":
                                cfg.reassembly_buckets or nblocks},
                     zero_copy_batch=True)
        # NOTE: Ray's sort-based groupby logs a benign "new schema: ."
        # warning when a sort partition holds no groups (it emits a
        # zero-column empty block internally); every shuffle INPUT
        # block here is verified non-empty and fully typed
        .groupby("bucket")
        .map_groups(
            reassemble_bucket, batch_format="pyarrow", fn_kwargs={"cfg": cfg})
    )


def build_extracted(ds, cfg: PipelineConfig = DEFAULT_CONFIG):
    """Lazy Dataset of extraction results (RESULT_SCHEMA rows: doc_id,
    spans, per-doc metric columns) for the valid documents of ``ds``.

    Physical strategy per cfg.pipeline_mode (see config.py): "nested"
    and "exploded" are single-lineage; "hybrid" unions a filtered pair.
    """
    pool, nblocks = _pool_and_blocks(cfg)

    if cfg.pipeline_mode == "nested":
        # single lineage, validation fused INSIDE the extract actor
        # (ExtractDocs.__call__): read -> actor, no intermediate
        # materialization; rejected rows flow through as zero-metric rows
        # with reject_reason set — no second pass
        return _nested_branch(ds, cfg, pool)

    validated = ds.map_batches(
        validate_batch, batch_format="pyarrow", fn_kwargs={"cfg": cfg})
    ok = validated.filter(expr="reject_reason == ''")
    if cfg.pipeline_mode == "exploded":
        return _exploded_branch(ok, cfg, pool, nblocks)
    if cfg.pipeline_mode != "hybrid":
        raise ValueError(f"unknown pipeline_mode {cfg.pipeline_mode!r}")

    small = ok.filter(expr=f"n_spans <= {cfg.explode_threshold}")
    big = ok.filter(expr=f"n_spans > {cfg.explode_threshold}")
    return _nested_branch(small, cfg, pool).union(
        _exploded_branch(big, cfg, _big_pool(cfg), nblocks))


def build_failed(ds, cfg: PipelineConfig = DEFAULT_CONFIG):
    """Lazy Dataset of (doc_id, reason) rejection rows."""
    return (
        ds.map_batches(validate_batch, batch_format="pyarrow", fn_kwargs={"cfg": cfg})
        .filter(expr="reject_reason != ''")
        .select_columns(["doc_id", "reject_reason"])
        .rename_columns({"reject_reason": "reason"})
    )


def derive_failed_sidecar(extracted_dir: str, failed_dir: str) -> int:
    """Project the (tiny) failed rows out of a written extracted dataset
    into the ``failed`` sidecar — a column-pruned, STREAMING read-back
    of (doc_id, reject_reason) only, no recompute.  The round-2 version
    pulled the full doc_id column onto the driver via ``to_table``; at
    the 10^12-doc target that alone is terabytes.  Filtering happens
    per record batch with O(batch) driver memory."""
    import os

    import pyarrow as pa
    import pyarrow.compute as pc
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq

    from ..schema import FAILED_SCHEMA

    os.makedirs(failed_dir, exist_ok=True)
    n = 0
    frag = pads.dataset(extracted_dir)
    with pq.ParquetWriter(os.path.join(failed_dir, "failed.parquet"),
                          FAILED_SCHEMA) as w:
        if frag.files:
            for b in frag.to_batches(columns=["doc_id", "reject_reason"],
                                     batch_size=65536):
                mask = pc.not_equal(b.column("reject_reason"), "")
                sel = pa.Table.from_batches([b]).filter(mask)
                if sel.num_rows:
                    w.write_table(pa.Table.from_arrays(
                        [sel["doc_id"], sel["reject_reason"]],
                        schema=FAILED_SCHEMA))
                    n += sel.num_rows
        if n == 0:  # always leave a typed (possibly empty) sidecar file
            w.write_table(pa.Table.from_pylist([], schema=FAILED_SCHEMA))
    return n


def run_extraction(
    input_path: str,
    output_dir: str,
    cfg: PipelineConfig = DEFAULT_CONFIG,
) -> dict:
    """Execute the pipeline end to end, writing:

        {output_dir}/extracted/   RESULT_SCHEMA rows; reject_reason == ''
                                  marks successfully extracted docs (nested
                                  mode carries rejected docs inline as
                                  zero-metric rows — single execution)
        {output_dir}/failed/      doc_id, reason sidecar

    Returns summary counts. For the resumable sharded runner see
    ocr_ray.state.checkpoint.CheckpointedRunner.
    """
    import os

    import pyarrow.compute as pc
    import pyarrow.dataset as pads

    import shutil

    ds = read_documents(input_path)
    if (cfg.pipeline_mode in ("exploded", "hybrid")
            and cfg.reassembly_buckets is None):
        # size reassembly buckets from the data: count() on an
        # untransformed file read is parquet-metadata-only (no scan)
        from dataclasses import replace as _replace

        import ray

        total = int(ray.cluster_resources().get("CPU", 8))
        est_docs = ds.count()
        cfg = _replace(cfg, reassembly_buckets=int(max(
            max(16, total * 4),
            -(-est_docs // cfg.reassembly_docs_per_bucket))))
    result = build_extracted(ds, cfg)
    # fresh-run semantics: write_parquet APPENDS into existing dirs, so a
    # rerun would silently duplicate docs; resumability lives in the
    # CheckpointedRunner (atomic shard publish), not here
    shutil.rmtree(f"{output_dir}/extracted", ignore_errors=True)
    shutil.rmtree(f"{output_dir}/failed", ignore_errors=True)
    os.makedirs(f"{output_dir}/extracted", exist_ok=True)
    result.write_parquet(f"{output_dir}/extracted")

    if cfg.pipeline_mode == "nested":
        n_failed = derive_failed_sidecar(f"{output_dir}/extracted",
                                         f"{output_dir}/failed")
    else:
        os.makedirs(f"{output_dir}/failed", exist_ok=True)
        build_failed(ds, cfg).write_parquet(f"{output_dir}/failed")
        frag = pads.dataset(f"{output_dir}/failed")
        n_failed = frag.count_rows() if frag.files else 0

    frag = pads.dataset(f"{output_dir}/extracted")
    if frag.files:  # empty when every doc was rejected (e.g. a bucket of
        # only over-cap monsters) — write_parquet emits no files then
        reasons = frag.to_table(columns=["reject_reason"])
        n_ok = reasons.filter(
            pc.equal(reasons["reject_reason"], "")).num_rows
    else:
        n_ok = 0
    return {"extracted": n_ok, "failed": n_failed, "output_dir": output_dir}

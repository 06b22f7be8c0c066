"""Typed pipeline configuration.

The reference configures itself through environment variables
(/root/reference/app/config.py:9-43); here the same knobs are a frozen
dataclass that is cheap to ship to every Ray task / actor.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class PipelineConfig:
    # --- validation (analog of MAX_NUM_PAGES rejection, ocr_worker.py:161-167)
    max_spans_per_doc: int = 4000

    # --- cleaning thresholds (text_processing.py:76-84 defaults)
    min_line_length: int = 10
    percent_max_numeric: float = 0.7
    percent_max_non_ascii: float = 0.40

    # --- quality gate (app/config.py:17 MIN_QUALITY; ocr_worker.py:214-222)
    min_quality: float = 77.0

    # --- per-span straggler bound (tesseract-timeout analog,
    # ocr_service.py:40-41: 600 s/page). The simulated engine cannot
    # hang, so the enforceable contract here is a soft deadline: when the
    # first OCR pass has already consumed the budget, the force-rotate
    # retry is skipped (the doc ships with its first-pass text), bounding
    # worst-case per-span work at ~2x the budget for real engines.
    span_soft_timeout_ms: float = 600_000.0

    # --- physical strategy:
    # "nested"   (default) one lineage, docs stay whole rows; right when
    #            per-doc work is bounded (max_spans_per_doc caps it, the
    #            MAX_NUM_PAGES analog) — zero shuffle.
    # "exploded" one lineage, EVERY doc -> span rows -> actor pool ->
    #            groupby(doc_id) reassembly; right when per-span work is
    #            heavy (real OCR at seconds/page) so one doc must spread
    #            across the cluster.
    # "hybrid"   both, split at explode_threshold via a union of two
    #            filtered branches; NOTE Ray's UnionOperator does not
    #            overlap branch execution well (measured 2x wall on an
    #            empty big branch), so prefer pre-bucketing the input by
    #            size and running nested+exploded jobs instead.
    pipeline_mode: str = "nested"
    # hybrid-mode split point. Tuned to per-span COST, not count: at
    # ~0.6 ms/span (simulated OCR) a 1000-span doc is 0.6 s of work —
    # not a straggler; with real Tesseract (~s/page) drop this to ~32.
    explode_threshold: int = 1000

    # --- Ray execution knobs
    # docs per actor call (nested path); swept 32/64/128/256 at 32 CPUs:
    # 128 best (12.5s vs 13.7 at 64, 16.4 at 256 — tail skew from mega
    # docs dominates above that)
    extract_batch_size: int = 128
    span_batch_size: int = 256            # spans per actor call (exploded path)
    # actor pool (min, max): min MUST stay small — the nested-path and
    # exploded-path pools coexist in one execution, and min actors reserve
    # CPUs up front; a min of 2+2 on a 4-CPU test node starves the task
    # operators (read/validate) and the pipeline deadlocks.  max is high:
    # the autoscaler stops at available CPUs anyway, and a low cap idles
    # large clusters (observed: 16 capped the 32-CPU bench at 8-CPU speed).
    extract_concurrency: int | tuple = (1, 128)
    ocr_conf_bins: int = 10               # confidence histogram 0..100 step 10
    # exploded-path reassembly bucket count (None = cluster-sized
    # default, ~4x CPUs).  A bucket's group holds ~n_docs/buckets docs'
    # span rows, so for LARGE full-corpus exploded runs this must scale
    # with the data to bound per-task memory: run_extraction sizes it
    # automatically from the input's (metadata-cheap) row count at
    # reassembly_docs_per_bucket docs per bucket; other entry points can
    # set it explicitly.
    reassembly_buckets: int | None = None
    reassembly_docs_per_bucket: int = 256

    # --- output layout
    shard_partitions: int = 16            # checkpointable output partitions

    def __post_init__(self):
        if self.explode_threshold > self.max_spans_per_doc:
            raise ValueError("explode_threshold must be <= max_spans_per_doc")


DEFAULT_CONFIG = PipelineConfig()

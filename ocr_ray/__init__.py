"""ocr_ray — a Ray-Data-native main-content extraction engine.

A from-scratch rebuild of the capabilities of ``scrapperorg/ocr`` (the
reference at /root/reference) as an idiomatic Ray Data pipeline:

* input: tables of interleaved text + media documents
  ``(doc_id: string, spans: list<struct<kind, text, media_ref, offset>>)``
* text spans   -> DOM-heuristic HTML boilerplate stripping (readability /
  trafilatura-style block scoring) + line-level cleaning
* media spans  -> a deterministic simulated OCR engine (line segmentation +
  per-line confidence) + quality-gated force-rotate retry
  (reference semantics: ocr_worker.py:214-222, app/config.py:17)
* output: span-sequence-equal ``extracted`` table + per-partition
  ``metrics`` / lineage, resumable from checkpoint.

Layers:
    kernels/    pure-Python/numpy kernels, no Ray — shared by the golden
                single-threaded oracle (golden.py) and the Ray stages
    stages/     map_batches functions + actor-pool callables
    pipelines/  end-to-end Dataset pipelines
    sources/    readers + storage adapters (parquet now, lance-ready)
    functions/  general data-processing operator library (dedup, knn,
                text analysis, relational queries) used by __ray_entry__
    state/      checkpoint manifest / resumable partition commits
"""

__version__ = "0.1.0"

"""Extraction stages — the heavy compute of the pipeline.

Two physical strategies over the same kernel (SURVEY.md §7.4):

* **nested path** (default, no shuffle): documents stay one-row-per-doc;
  an actor pool maps ``extract_doc`` over batches of docs.  Order is free
  because each row carries its whole span list.
* **exploded path** (skew/mega docs): spans become rows, processed by an
  actor pool one span at a time (so a 900-span mega doc parallelizes
  across the cluster instead of stalling one actor — the Ray answer to
  the reference's page-level ``--jobs`` fan-out, ocr_service.py:37-39),
  then ONE ``groupby(doc_id)`` shuffle reassembles ordered span lists.

Both paths emit the same ``RESULT_SCHEMA``: (doc_id, spans) + flat per-doc
metric columns, so their union is seamless and metrics reproduce the
golden extractor's values bit for bit (summation happens in offset order).

Stateful setup (compiled regexes, vocabulary set, keyword structures) is
done once per actor in ``__init__`` — the reference's module-global
singletons (doc_analysis.py:25-49, ocr_evaluation.py:13-38) become actor
state.
"""

from __future__ import annotations

import time

import pyarrow as pa
import pyarrow.compute as pc

from ..config import DEFAULT_CONFIG, PipelineConfig
from ..kernels.cleaner import CleanStats
from ..kernels.extract import (
    conf_histogram,
    count_entities,
    extract_doc,
    extract_span,
)
from ..schema import METRICS_FIELDS, SPANS_TYPE

# (doc_id, spans) + per-doc metrics + reject_reason ('' = extracted OK),
# identical on every physical path.  Carrying rejects as rows (instead of
# a second validate pass) keeps the pipeline single-lineage — the Ray
# analog of the reference marking docs ocr_failed in place
# (ocr_worker.py:322-330).
RESULT_SCHEMA = pa.schema(
    [("doc_id", pa.string()), ("spans", SPANS_TYPE)]
    + [(n, t) for n, t in METRICS_FIELDS if n != "doc_id"]
    + [("reject_reason", pa.string()), ("proc_ms", pa.float64())]
)

_ZERO_METRICS = {
    "n_spans": 0, "media_spans": 0, "blocks_kept": 0, "blocks_dropped": 0,
    "clean_chars": 0, "original_chars": 0, "min_length_lines": 0,
    "forbidden_lines": 0, "low_alpha_lines": 0, "high_digit_lines": 0,
    "non_ascii_lines": 0, "num_ents": 0, "quality_mean": -1.0,
    "retried_spans": 0, "conf_hist": [],
}

# intermediate schema of the exploded path
SPAN_RESULT_SCHEMA = pa.schema([
    ("doc_id", pa.string()),
    ("kind", pa.string()),
    ("text", pa.string()),
    ("media_ref", pa.string()),
    ("offset", pa.int32()),
    ("quality", pa.float64()),
    ("retried", pa.int64()),
    ("confs", pa.list_(pa.float64())),
    ("kept_lines", pa.int64()),
    ("min_length_lines", pa.int64()),
    ("forbidden_lines", pa.int64()),
    ("low_alpha_lines", pa.int64()),
    ("high_digit_lines", pa.int64()),
    ("non_ascii_lines", pa.int64()),
    ("num_ents", pa.int64()),
    ("clean_chars", pa.int64()),
    ("original_chars", pa.int64()),
    ("span_ms", pa.float64()),
])


def _result_row(doc_id: str, spans: list, metrics: dict,
                reason: str = "", proc_ms: float = 0.0) -> dict:
    return {"doc_id": doc_id, "spans": spans, **metrics,
            "reject_reason": reason, "proc_ms": round(proc_ms, 3)}


class ExtractDocs:
    """Actor-pool callable for the nested path (whole docs per row).

    Rows the validate stage rejected (reject_reason != '') pass through
    as zero-metric rows — no extraction attempted, nothing dropped."""

    def __init__(self, cfg: PipelineConfig = DEFAULT_CONFIG):
        self.cfg = cfg
        # warm the per-actor state once: vocabulary set + regex compilation
        from ..kernels.wordpool import vocabulary
        vocabulary()
        # the kernel churns millions of short-lived acyclic objects per
        # batch; the cyclic GC's scans serialize badly across 32 procs
        # (measured +11% at 32 CPUs with it off).  Disable it and sweep
        # manually every N batches as cycle insurance.
        import gc
        gc.disable()
        self._calls = 0

    def _maybe_collect(self):
        self._calls += 1
        if self._calls % 50 == 0:
            import gc
            gc.collect()

    def __call__(self, batch: pa.Table) -> pa.Table:
        self._maybe_collect()
        if "reject_reason" not in batch.column_names:
            # validation fused into the actor: one less task hop and one
            # less full materialization of the corpus in the object store
            from .validate import validate_batch

            batch = validate_batch(batch, self.cfg)
        # columnar accumulation (no per-row result dicts + from_pylist
        # row-wise re-inference: measurable allocation churn at 32 CPUs)
        cols: dict[str, list] = {n: [] for n in RESULT_SCHEMA.names}
        metric_keys = [n for n in RESULT_SCHEMA.names
                       if n not in ("doc_id", "spans", "reject_reason",
                                    "proc_ms")]

        def emit(doc_id, spans, metrics, reason="", proc_ms=0.0):
            cols["doc_id"].append(doc_id)
            cols["spans"].append(spans)
            for k in metric_keys:
                cols[k].append(metrics[k])
            cols["reject_reason"].append(reason)
            cols["proc_ms"].append(round(proc_ms, 3))

        sel = ["doc_id", "spans", "reject_reason"]
        for row in batch.select(sel).to_pylist():
            reason = row.get("reject_reason", "")
            if reason:
                emit(row["doc_id"], [], _ZERO_METRICS, reason)
                continue
            t0 = time.monotonic()
            res = extract_doc(row["doc_id"], row["spans"], self.cfg)
            ms = (time.monotonic() - t0) * 1000.0
            if res["ok"]:
                emit(res["doc_id"], res["spans"], res["metrics"], proc_ms=ms)
            else:  # defense in depth if validate was skipped upstream
                emit(res["doc_id"], [], _ZERO_METRICS, res["reason"], ms)
        arrays = [pa.array(cols[f.name], type=f.type) for f in RESULT_SCHEMA]
        return pa.Table.from_arrays(arrays, schema=RESULT_SCHEMA)


def explode_spans(batch: pa.Table) -> pa.Table:
    """Zero-copy-ish flatten: one row per span, doc_id repeated via
    list_parent_indices (pyarrow kernels, no Python loop)."""
    spans = batch.column("spans").combine_chunks()
    flat = pc.list_flatten(spans)
    parent = pc.list_parent_indices(spans)
    doc_ids = pc.take(batch.column("doc_id"), parent)
    return pa.Table.from_arrays(
        [doc_ids.combine_chunks() if isinstance(doc_ids, pa.ChunkedArray) else doc_ids,
         flat.field("kind"), flat.field("text"),
         flat.field("media_ref"), flat.field("offset")],
        names=["doc_id", "kind", "text", "media_ref", "offset"],
    )


class ExtractSpans:
    """Actor-pool callable for the exploded path (one span per row)."""

    def __init__(self, cfg: PipelineConfig = DEFAULT_CONFIG):
        self.cfg = cfg
        from ..kernels.wordpool import vocabulary
        vocabulary()
        import gc
        gc.disable()  # see ExtractDocs.__init__
        self._calls = 0

    def __call__(self, batch: pa.Table) -> pa.Table:
        self._calls += 1
        if self._calls % 50 == 0:
            import gc
            gc.collect()
        rows = batch.to_pylist()
        out = []
        for r in rows:
            st = CleanStats()
            t0 = time.monotonic()
            cleaned, meta = extract_span(
                r["kind"], r["text"], r["media_ref"], self.cfg, stats=st)
            span_ms = (time.monotonic() - t0) * 1000.0
            out.append({
                "doc_id": r["doc_id"],
                "kind": r["kind"],
                "text": cleaned,
                "media_ref": r["media_ref"],
                "offset": r["offset"],
                "quality": meta["quality"],
                "retried": int(meta["retried"]),
                "confs": meta["confs"],
                "kept_lines": st.kept_lines,
                "min_length_lines": st.min_length_lines,
                "forbidden_lines": st.forbidden_lines,
                "low_alpha_lines": st.low_alpha_lines,
                "high_digit_lines": st.high_digit_lines,
                "non_ascii_lines": st.non_ascii_lines,
                "num_ents": count_entities(cleaned),
                "clean_chars": st.total_clean_chars,
                "original_chars": st.total_original_chars,
                "span_ms": span_ms,
            })
        return pa.Table.from_pylist(out, schema=SPAN_RESULT_SCHEMA)


def reassemble_group(group: pa.Table, cfg: PipelineConfig = DEFAULT_CONFIG) -> pa.Table:
    """Rebuild one document from its processed spans (sorted by offset).

    Metric aggregation mirrors extract_doc exactly — including summing
    media qualities in offset order so float means match bit for bit.
    """
    rows = sorted(group.to_pylist(), key=lambda r: r["offset"])
    doc_id = rows[0]["doc_id"]
    spans, qualities, confs = [], [], []
    retries = 0
    total_ms = 0.0
    agg = {k: 0 for k in ("kept_lines", "min_length_lines", "forbidden_lines",
                          "low_alpha_lines", "high_digit_lines",
                          "non_ascii_lines", "num_ents", "clean_chars",
                          "original_chars")}
    for r in rows:
        total_ms += r["span_ms"]
        spans.append({"kind": r["kind"], "text": r["text"],
                      "media_ref": r["media_ref"], "offset": r["offset"]})
        for k in agg:
            agg[k] += r[k]
        if r["kind"] == "media":
            qualities.append(r["quality"])
            confs.extend(r["confs"])
            retries += r["retried"]
    dropped = (agg["min_length_lines"] + agg["forbidden_lines"] +
               agg["low_alpha_lines"] + agg["high_digit_lines"] +
               agg["non_ascii_lines"])
    metrics = {
        "n_spans": len(spans),
        "media_spans": len(qualities),
        "blocks_kept": agg["kept_lines"],
        "blocks_dropped": dropped,
        "clean_chars": agg["clean_chars"],
        "original_chars": agg["original_chars"],
        "min_length_lines": agg["min_length_lines"],
        "forbidden_lines": agg["forbidden_lines"],
        "low_alpha_lines": agg["low_alpha_lines"],
        "high_digit_lines": agg["high_digit_lines"],
        "non_ascii_lines": agg["non_ascii_lines"],
        "num_ents": agg["num_ents"],
        "quality_mean": round(sum(qualities) / len(qualities), 4) if qualities else -1.0,
        "retried_spans": retries,
        "conf_hist": conf_histogram(confs, cfg.ocr_conf_bins),
    }
    return pa.Table.from_pylist(
        [_result_row(doc_id, spans, metrics, "", proc_ms=total_ms)],
        schema=RESULT_SCHEMA)

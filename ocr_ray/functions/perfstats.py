"""Corpus-run performance reporting — parity with the reference's
scripts/performance_analysis.py (G7/T1-T3 in SURVEY.md §2.5-2.6):
describe() over the metrics columns, failure counts by reason, top-K
slowest docs, worst-quality docs.

Operates on a written extraction output directory (column-pruned
read-back — the span text never loads).
"""

from __future__ import annotations

import pandas as pd
import pyarrow.compute as pc
import pyarrow.dataset as pads

_DESCRIBE_COLS = ["n_spans", "media_spans", "blocks_kept", "blocks_dropped",
                  "clean_chars", "quality_mean", "retried_spans", "proc_ms"]


def corpus_report(extracted_dir: str, top_k: int = 10) -> dict:
    """Aggregate report over one extraction run's output."""
    tbl = pads.dataset(extracted_dir).to_table(
        columns=["doc_id", "reject_reason"] + _DESCRIBE_COLS)
    df = tbl.to_pandas()
    ok = df[df["reject_reason"] == ""]
    failed = df[df["reject_reason"] != ""]

    report = {
        "docs_ok": int(len(ok)),
        "docs_failed": int(len(failed)),
        "failure_reasons": failed["reject_reason"].value_counts().to_dict(),
        # quality_mean uses -1 as the "no media spans" sentinel — mask it
        # out of the describe so the quality stats cover media docs only
        "describe": ok[_DESCRIBE_COLS].mask(
            ok[_DESCRIBE_COLS] == -1.0).describe().round(4).to_dict(),
        # T1: top-K slowest (performance_analysis.py:41-43)
        "slowest_docs": ok.nlargest(top_k, "proc_ms")[
            ["doc_id", "proc_ms", "n_spans"]].to_dict("records"),
        # T2: worst quality among docs that have media spans
        # (performance_analysis.py:48-51)
        "worst_quality_docs": ok[ok["quality_mean"] >= 0].nsmallest(
            top_k, "quality_mean")[["doc_id", "quality_mean"]].to_dict("records"),
        "mean_ms_per_span": round(
            float(ok["proc_ms"].sum() / max(1, ok["n_spans"].sum())), 4),
    }
    return report

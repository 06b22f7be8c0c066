"""Hashed Naive-Bayes quality classifier — the "train a classifier on a
high-quality reference and score the crawl" recipe (GPT-3's WebText-vs-
CommonCrawl logistic filter, Llama's fastText quality classifier),
reduced to what trains exactly and distributedly with no ML deps:
multinomial Naive Bayes over hashed unigram+bigram counts, which is a
linear model ``score(doc) = prior + sum_b c_b * w_b`` just like
fastText — the weights come from closed-form class-conditional counts
instead of SGD, so training is ONE associative integer aggregate
(merge-order-independent, the repo's accumulator discipline).

Relation to the neighbours in this family:

* ``dsir``      — importance WEIGHTS for resampling toward a target
                  distribution (generative ratio, no negative class);
* ``lm_filter`` — perplexity under a reference LM (fluency, not
                  class membership);
* this module   — a DISCRIMINATIVE positive-vs-negative score with a
                  calibrated-ish probability, the thing pipelines
                  threshold or importance-sample on (GPT-3 kept docs
                  with ``np.random.pareto(9) > 1 - score``).

Scale design
------------
* Fit: one scan, state = (2, n_buckets+1) int64 — class-conditional
  hashed feature counts plus a per-class doc count in the last slot
  (the prior) — ~160 KB at the 10k default, any corpus size.
* Score: the (n_buckets,) float64 log-odds vector broadcasts in the
  map closure; each doc is one numpy gather-sum.  Two text scans
  total (fit + score), same trade as DSIR/lm_filter.
* Determinism: integer counts + per-row float64 rounded to 1e-6.

Reference analog: none — beyond-reference training-data operator
(SURVEY.md §2.7 extension family).
"""
from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .dsir import _bucket_ids


def nb_class_counts(ds, pos_pred, neg_pred=None, n_buckets: int = 10_000):
    """ONE scan -> (pos, neg) int64 vectors of length n_buckets+1; the
    last slot is the class's DOC count.  ``neg_pred`` defaults to
    not-pos (every row is one of the two classes exactly once)."""
    from ray.data.aggregate import AggregateFn

    width = n_buckets + 1

    def acc_block(state, blk):
        arr = (np.frombuffer(state, dtype=np.int64)
               .reshape(2, width).copy() if state
               else np.zeros((2, width), np.int64))
        pos = np.asarray(pos_pred(blk), bool)
        neg = (np.asarray(neg_pred(blk), bool) if neg_pred is not None
               else ~pos)
        for i, t in enumerate(blk["text"].to_pylist()):
            cls = 0 if pos[i] else 1 if neg[i] else None
            if cls is None:
                continue
            ids = _bucket_ids(t, n_buckets)
            if len(ids):
                arr[cls, :n_buckets] += np.bincount(ids,
                                                    minlength=n_buckets)
            arr[cls, n_buckets] += 1
        return arr.tobytes()

    def merge(s1, s2):
        if not s1:
            return s2
        if not s2:
            return s1
        return (np.frombuffer(s1, dtype=np.int64)
                + np.frombuffer(s2, dtype=np.int64)).tobytes()

    agg = AggregateFn(init=lambda _: b"", merge=merge,
                      accumulate_block=acc_block, name="nb_counts")
    blob = ds.aggregate(agg)["nb_counts"]
    arr = (np.frombuffer(blob, dtype=np.int64).reshape(2, width)
           if blob else np.zeros((2, width), np.int64))
    return arr[0], arr[1]


def nb_model(pos_c: np.ndarray, neg_c: np.ndarray, n_buckets: int,
             alpha: float):
    """(log-odds weight vector, class prior) from the class counts —
    shared with the fused quality suite so the model arithmetic cannot
    drift between the two."""
    n_pos, n_neg = int(pos_c[n_buckets]), int(neg_c[n_buckets])
    if n_pos == 0 or n_neg == 0:
        raise ValueError("classifier class is empty — pos/neg predicate "
                         f"matched {n_pos}/{n_neg} docs")
    pf = pos_c[:n_buckets].astype(np.float64)
    nf = neg_c[:n_buckets].astype(np.float64)
    w = (np.log((pf + alpha) / (pf.sum() + alpha * n_buckets))
         - np.log((nf + alpha) / (nf.sum() + alpha * n_buckets)))
    return w, math.log(n_pos / n_neg)


def quality_classifier_scores(sf_dir: str, pos_pred=None, neg_pred=None,
                              n_buckets: int = 10_000, alpha: float = 1.0,
                              pred_columns: tuple = ("source",)):
    """Dataset[doc_id, score, prob]: per-doc Naive-Bayes log-odds of the
    positive (high-quality reference) class and its sigmoid.  Default
    positive class: rows with source='src0' (callers pass their own
    predicate for real reference sets)."""
    from ._io import clean_read
    from .dsir import _default_target_pred

    pos_pred = pos_pred or _default_target_pred
    ds = clean_read(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text", *pred_columns])
    pos_c, neg_c = nb_class_counts(ds, pos_pred, neg_pred, n_buckets)
    w, prior = nb_model(pos_c, neg_c, n_buckets, alpha)

    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("score", pa.float64()),
                            ("prob", pa.float64())])

    def score(batch: pa.Table, w=w, prior=prior) -> pa.Table:
        scores, probs = [], []
        for t in batch["text"].to_pylist():
            ids = _bucket_ids(t, n_buckets)
            s = prior + (float(w[ids].sum()) if len(ids) else 0.0)
            # prob derives from the ROUNDED score (pure function of the
            # emitted value — summation-order ulps cannot flip it)
            s_r = math.floor(s * 1e6 + 0.5) / 1e6
            scores.append(s_r)
            p = 1.0 / (1.0 + math.exp(-max(min(s_r, 500.0), -500.0)))
            probs.append(math.floor(p * 1e6 + 0.5) / 1e6)
        return pa.table({"doc_id": batch["doc_id"],
                         "score": pa.array(scores, pa.float64()),
                         "prob": pa.array(probs, pa.float64())},
                        schema=out_schema)

    return ds.map_batches(score, batch_format="pyarrow", batch_size=1024)

"""CCNet-style n-gram LM perplexity filter (Wenzek et al., 2020,
arXiv:1911.00359).

CCNet scores every document's perplexity under a language model trained
on a clean reference corpus (they use a Wikipedia KenLM) and splits the
corpus into head / middle / tail perplexity tertiles; pretraining
pipelines then keep the head (and often the middle).  This module is
that recipe with the heavyweight KenLM replaced by a hashed-bigram LM —
the model a no-external-deps engine can train ON the cluster in one
pass:

* ``p(w_i | w_{i-1}) = (c_bi[h2(w_{i-1} w_i)] + a) / (c_ctx[h1(w_{i-1})]
  + a * n_buckets)`` over lowercased whitespace tokens, where h1/h2 are
  crc32 hashes into ``n_buckets`` buckets (the hashing trick — fixed
  model size regardless of vocabulary).  Context counts are counts of
  tokens USED as contexts (every token but a doc's last), so the
  estimator is a proper add-alpha conditional over the hashed space.
* ``ppl(doc) = exp(-mean_i log p(w_i | w_{i-1}))`` — lower is more
  target-like.

Scale design
------------
* Training is ONE associative Dataset.aggregate whose state is a
  (2, n_buckets) int64 count matrix as a bytes blob (1 MB at the 2^16
  default) — integer-exact and merge-order-independent, the repo's
  accumulator discipline.  ``target_pred`` picks the clean reference
  rows (CCNet's Wikipedia); the default trains on the whole corpus
  (self-perplexity, like ``char_bigram_logprob_scores`` — gibberish
  still scores far above fluent text because it is rare).
* Scoring broadcasts the two count vectors inside the map closure
  (~1 MB — a broadcast lookup, never a shuffle) and walks each doc
  once, vectorized per doc via numpy gathers.
* The head/middle/tail split needs two GLOBAL quantiles of a float
  column: reused from ``grouped_quantiles_float``'s distributed B-ary
  rank search with a constant group key — no corpus-sized sort, no
  driver materialization.

Determinism: the model is integer counts; scoring is per-row float64
rounded to 1e-6 — independent of block layout and merge order.

Reference analog: none — beyond-reference training-data operator
(SURVEY.md §2.7 extension family; joins quality_filter_stats and
char_bigram_logprob_scores in the quality family).
"""
from __future__ import annotations

import math
import zlib

import numpy as np
import pyarrow as pa

from .corpus_prep import _tokens


def _ctx_bigram_ids_from_toks(raw_toks: list[str], n_buckets: int):
    """(context ids, bigram ids) from a token list — parallel arrays of
    length n_tokens - 1 (empty when the doc has < 2 tokens)."""
    toks = [t.lower() for t in raw_toks]
    if len(toks) < 2:
        e = np.empty(0, np.int64)
        return e, e
    ctx = np.asarray([zlib.crc32(t.encode()) % n_buckets
                      for t in toks[:-1]], dtype=np.int64)
    bi = np.asarray([zlib.crc32(f"{a} {b}".encode()) % n_buckets
                     for a, b in zip(toks, toks[1:])], dtype=np.int64)
    return ctx, bi


def _ctx_bigram_ids(text: str, n_buckets: int):
    return _ctx_bigram_ids_from_toks(_tokens(text), n_buckets)


def bigram_lm_counts(ds, target_pred=None, n_buckets: int = 65536):
    """ONE scan -> (ctx_counts, bigram_counts) int64 vectors over the
    target rows (all rows when ``target_pred`` is None)."""
    from ray.data.aggregate import AggregateFn

    def acc_block(state, blk):
        arr = (np.frombuffer(state, dtype=np.int64)
               .reshape(2, n_buckets).copy() if state
               else np.zeros((2, n_buckets), np.int64))
        mask = (np.asarray(target_pred(blk)) if target_pred is not None
                else np.ones(blk.num_rows, bool))
        for i, t in enumerate(blk["text"].to_pylist()):
            if not mask[i]:
                continue
            ctx, bi = _ctx_bigram_ids(t, n_buckets)
            if len(ctx):
                arr[0] += np.bincount(ctx, minlength=n_buckets)
                arr[1] += np.bincount(bi, minlength=n_buckets)
        return arr.tobytes()

    def merge(s1, s2):
        if not s1:
            return s2
        if not s2:
            return s1
        return (np.frombuffer(s1, dtype=np.int64)
                + np.frombuffer(s2, dtype=np.int64)).tobytes()

    agg = AggregateFn(init=lambda _: b"", merge=merge,
                      accumulate_block=acc_block, name="lm_counts")
    blob = ds.aggregate(agg)["lm_counts"]
    arr = (np.frombuffer(blob, dtype=np.int64).reshape(2, n_buckets)
           if blob else np.zeros((2, n_buckets), np.int64))
    return arr[0], arr[1]


def doc_perplexity(sf_dir: str, target_pred=None, n_buckets: int = 65536,
                   alpha: float = 1.0, pred_columns: tuple = ()):
    """Dataset[doc_id, logprob, n_pred, ppl]: per-doc total bigram
    log-probability, prediction count, and perplexity (rounded to 1e-6;
    NULL for docs with < 2 tokens).  Two text scans (model fit +
    scoring) — the iterative-algorithm trade, same as DSIR.
    ``pred_columns`` names the extra columns ``target_pred`` reads."""
    from ._io import clean_read

    ds = clean_read(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text", *pred_columns])
    ctx_c, bi_c = bigram_lm_counts(ds, target_pred, n_buckets)
    if target_pred is not None and ctx_c.sum() == 0:
        raise ValueError("LM target is empty — target_pred matched no "
                         "rows with >= 2 tokens")

    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("logprob", pa.float64()),
                            ("n_pred", pa.int64()),
                            ("ppl", pa.float64())])

    def score(batch: pa.Table, ctx_c=ctx_c, bi_c=bi_c) -> pa.Table:
        lps, nps, ppls = [], [], []
        for t in batch["text"].to_pylist():
            ctx, bi = _ctx_bigram_ids(t, n_buckets)
            if not len(ctx):
                lps.append(0.0)
                nps.append(0)
                ppls.append(None)
                continue
            lp = float(np.log((bi_c[bi] + alpha)
                              / (ctx_c[ctx] + alpha * n_buckets)).sum())
            # ppl derives from the ROUNDED logprob so it is a pure
            # function of the emitted value (summation-order noise in
            # the last ulp cannot flip the ppl rounding)
            lp_r = math.floor(lp * 1e6 + 0.5) / 1e6
            lps.append(lp_r)
            nps.append(len(ctx))
            p = math.exp(-lp_r / len(ctx))
            ppls.append(math.floor(p * 1e6 + 0.5) / 1e6)
        return pa.table({"doc_id": batch["doc_id"],
                         "logprob": pa.array(lps, pa.float64()),
                         "n_pred": pa.array(nps, pa.int64()),
                         "ppl": pa.array(ppls, pa.float64())},
                        schema=out_schema)

    return ds.map_batches(score, batch_format="pyarrow", batch_size=1024)


def perplexity_buckets(sf_dir: str, target_pred=None,
                       n_buckets: int = 65536, alpha: float = 1.0,
                       pred_columns: tuple = ()):
    """CCNet's head/middle/tail split: Dataset[doc_id, ppl, bucket]
    where bucket is 'head' (ppl <= 1/3 tertile), 'middle' (<= 2/3) or
    'tail'.  Tertile cutoffs are EXACT order statistics from the
    distributed B-ary rank search (constant group key); docs with no
    scorable bigram (ppl NULL) land in 'tail' — the conservative call
    for a quality filter.  The scored (doc_id, ppl) projection is
    materialized once (narrow columns) so the cutoff search and the
    labeling pass never re-run the scoring scan."""
    import pyarrow.compute as pc

    from .corpus_prep import grouped_quantiles_float

    scored = (doc_perplexity(sf_dir, target_pred, n_buckets, alpha,
                             pred_columns)
              .select_columns(["doc_id", "ppl"]).materialize())
    cuts = grouped_quantiles_float(
        scored.map_batches(
            lambda b: b.append_column(
                "__g", pa.array(["all"] * b.num_rows, type=pa.string())),
            batch_format="pyarrow"),
        "__g", "ppl", qs={"t1": 1 / 3, "t2": 2 / 3})
    if cuts.num_rows == 0:
        # no doc had a scorable bigram — everything is 'tail'
        t1 = t2 = float("-inf")
    else:
        t1 = float(cuts["t1"][0].as_py())
        t2 = float(cuts["t2"][0].as_py())

    def label(batch: pa.Table) -> pa.Table:
        ppl = batch["ppl"]
        bucket = pc.if_else(
            pc.is_null(ppl), pa.scalar("tail"),
            pc.if_else(pc.less_equal(ppl, pa.scalar(t1)),
                       pa.scalar("head"),
                       pc.if_else(pc.less_equal(ppl, pa.scalar(t2)),
                                  pa.scalar("middle"), pa.scalar("tail"))))
        return pa.table({"doc_id": batch["doc_id"], "ppl": ppl,
                         "bucket": bucket})

    return scored.map_batches(label, batch_format="pyarrow")

"""Fused quality-signal suite — all three model-based quality scorers
(DSIR importance weight, CCNet LM perplexity, Naive-Bayes classifier
probability) from TWO corpus passes instead of six.

Standalone, each scorer is fit(1 scan) + score(1 scan); a pipeline that
wants all three signals per document — the normal case when curating a
pretraining mix — would re-read the corpus six times.  At 100 TB the
input IO is the cost that matters (the round-4 lesson that fused
prepare_corpus stages 1-3 and dedup_survivors' two pair families):

* fit — ONE associative aggregate whose state concatenates every
  model's integer count vector (DSIR raw+target, LM context+bigram,
  NB pos+neg with doc-count slots) into a single int64 buffer
  (~1.4 MB at defaults).  Each row is tokenized ONCE; the hashed
  feature ids are shared where the models agree (DSIR and NB use the
  same unigram+bigram features — one hashing pass when their bucket
  counts match, the default).
* score — ONE map_batches pass emitting every signal; each model's
  arithmetic is byte-for-byte the standalone module's (parity is
  pinned by test against ``dsir_weights``, ``doc_perplexity`` and
  ``quality_classifier_scores`` outputs).

One ``target_pred`` drives all three: it is DSIR's target, the LM's
training set, and the classifier's positive class (negative = rest) —
"a clean reference corpus shapes every signal", the CCNet/GPT-3 setup.

Reference analog: none — beyond-reference training-data operator
(SURVEY.md §2.7 extension family).
"""
from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .corpus_prep import _tokens
from .dsir import _bucket_ids_from_toks, _default_target_pred, _log_ratio
from .lm_filter import _ctx_bigram_ids_from_toks
from .quality_classifier import nb_model


def fit_quality_models(ds, target_pred, dsir_buckets: int = 10_000,
                       lm_buckets: int = 65536,
                       nb_buckets: int = 10_000):
    """ONE scan -> dict of integer count vectors for all three models:
    ``dsir_raw``/``dsir_tgt`` (unigram+bigram, all rows / target rows),
    ``lm_ctx``/``lm_bi`` (target rows), ``nb_pos``/``nb_neg`` (feature
    counts + doc count in the last slot)."""
    from ray.data.aggregate import AggregateFn

    widths = [dsir_buckets, dsir_buckets, lm_buckets, lm_buckets,
              nb_buckets + 1, nb_buckets + 1]
    offs = np.concatenate([[0], np.cumsum(widths)])
    total = int(offs[-1])
    share_nb = nb_buckets == dsir_buckets

    def acc_block(state, blk):
        arr = (np.frombuffer(state, dtype=np.int64).copy() if state
               else np.zeros(total, np.int64))
        v = [arr[offs[i]:offs[i + 1]] for i in range(6)]
        mask = np.asarray(target_pred(blk))
        for i, t in enumerate(blk["text"].to_pylist()):
            toks = _tokens(t)
            tgt = bool(mask[i])
            ids_d = _bucket_ids_from_toks(toks, dsir_buckets)
            if len(ids_d):
                bc = np.bincount(ids_d, minlength=dsir_buckets)
                v[0] += bc
                if tgt:
                    v[1] += bc
            if tgt:
                ctx, bi = _ctx_bigram_ids_from_toks(toks, lm_buckets)
                if len(ctx):
                    v[2] += np.bincount(ctx, minlength=lm_buckets)
                    v[3] += np.bincount(bi, minlength=lm_buckets)
            nb = v[4] if tgt else v[5]
            ids_n = (ids_d if share_nb
                     else _bucket_ids_from_toks(toks, nb_buckets))
            if len(ids_n):
                nb[:nb_buckets] += np.bincount(ids_n,
                                               minlength=nb_buckets)
            nb[nb_buckets] += 1
        return arr.tobytes()

    def merge(s1, s2):
        if not s1:
            return s2
        if not s2:
            return s1
        return (np.frombuffer(s1, dtype=np.int64)
                + np.frombuffer(s2, dtype=np.int64)).tobytes()

    agg = AggregateFn(init=lambda _: b"", merge=merge,
                      accumulate_block=acc_block, name="quality_models")
    blob = ds.aggregate(agg)["quality_models"]
    arr = (np.frombuffer(blob, dtype=np.int64) if blob
           else np.zeros(total, np.int64))
    names = ["dsir_raw", "dsir_tgt", "lm_ctx", "lm_bi", "nb_pos",
             "nb_neg"]
    return {n: arr[offs[i]:offs[i + 1]] for i, n in enumerate(names)}


def quality_signals(sf_dir: str, target_pred=None,
                    dsir_buckets: int = 10_000, lm_buckets: int = 65536,
                    nb_buckets: int = 10_000, alpha: float = 1.0,
                    pred_columns: tuple = ("source",)):
    """Dataset[doc_id, logw, ppl, nb_score, nb_prob] — every model-based
    quality signal in one scoring pass.  Values are EXACTLY the
    standalone operators' outputs (same arrays, same arithmetic):
    ``logw`` = dsir_weights' importance log-weight, ``ppl`` =
    doc_perplexity's target-trained perplexity (NULL when < 2 tokens),
    ``nb_score``/``nb_prob`` = quality_classifier_scores with the
    target as positive class."""
    from ._io import clean_read

    target_pred = target_pred or _default_target_pred
    ds = clean_read(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text", *pred_columns])
    m = fit_quality_models(ds, target_pred, dsir_buckets, lm_buckets,
                           nb_buckets)
    if m["dsir_tgt"].sum() == 0:
        raise ValueError("quality target is empty — target_pred "
                         "matched no rows")
    if m["lm_ctx"].sum() == 0:
        # match doc_perplexity's refusal: target rows exist but none has
        # a scorable bigram — a uniform-model ppl would be meaningless
        raise ValueError("LM target is empty — target_pred matched no "
                         "rows with >= 2 tokens")

    lr = _log_ratio(m["dsir_raw"], m["dsir_tgt"], alpha)
    lm_ctx, lm_bi = m["lm_ctx"], m["lm_bi"]
    w_nb, prior = nb_model(m["nb_pos"], m["nb_neg"], nb_buckets, alpha)
    share_nb = nb_buckets == dsir_buckets

    out_schema = pa.schema([("doc_id", pa.int64()),
                            ("logw", pa.float64()),
                            ("ppl", pa.float64()),
                            ("nb_score", pa.float64()),
                            ("nb_prob", pa.float64())])

    def score(batch: pa.Table) -> pa.Table:
        logw, ppls, nbs, nbp = [], [], [], []
        for t in batch["text"].to_pylist():
            toks = _tokens(t)
            ids_d = _bucket_ids_from_toks(toks, dsir_buckets)
            logw.append(float(lr[ids_d].sum()) if len(ids_d) else 0.0)
            ctx, bi = _ctx_bigram_ids_from_toks(toks, lm_buckets)
            if len(ctx):
                lp = float(np.log((lm_bi[bi] + alpha)
                                  / (lm_ctx[ctx]
                                     + alpha * lm_buckets)).sum())
                lp_r = math.floor(lp * 1e6 + 0.5) / 1e6
                p = math.exp(-lp_r / len(ctx))
                ppls.append(math.floor(p * 1e6 + 0.5) / 1e6)
            else:
                ppls.append(None)
            ids_n = (ids_d if share_nb
                     else _bucket_ids_from_toks(toks, nb_buckets))
            s = prior + (float(w_nb[ids_n].sum()) if len(ids_n) else 0.0)
            s_r = math.floor(s * 1e6 + 0.5) / 1e6
            nbs.append(s_r)
            pr = 1.0 / (1.0 + math.exp(-max(min(s_r, 500.0), -500.0)))
            nbp.append(math.floor(pr * 1e6 + 0.5) / 1e6)
        return pa.table({"doc_id": batch["doc_id"],
                         "logw": pa.array(logw, pa.float64()),
                         "ppl": pa.array(ppls, pa.float64()),
                         "nb_score": pa.array(nbs, pa.float64()),
                         "nb_prob": pa.array(nbp, pa.float64())},
                        schema=out_schema)

    return ds.map_batches(score, batch_format="pyarrow", batch_size=1024)

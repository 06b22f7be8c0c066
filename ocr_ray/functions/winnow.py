"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003,
"Winnowing: Local Algorithms for Document Fingerprinting" — the MOSS
algorithm) and the shared-passage pair detector built on them.

Why this next to the existing dedup family: MinHash/SimHash answer
"are these DOCUMENTS near-identical"; ``repeated_ngrams`` finds the
shared STRINGS.  Winnowing answers "which document PAIRS share a
passage" with the paper's guarantee — any common substring of length
>= w + k - 1 produces at least one SHARED selected fingerprint — at
an expected density of only 2/(w+1) fingerprints per position, so the
fingerprint shuffle moves ~2/(w+1) of the gram volume a full n-gram
shuffle would.

Shapes:
* per-doc selection is fully vectorized: k-gram hashes via ONE
  sliding-window dot with uint64 polynomial powers (wraparound mod
  2^64), window minima via a (w,)-strided argmin with the paper's
  RIGHTMOST-min tie rule (robust winnowing), consecutive-duplicate
  collapse — no per-character Python;
* ``winnow_overlap_pairs``: ONE groupby(fingerprint) co-locates every
  doc selecting the same hash -> in-bucket pairs -> groupby(pair)
  count >= min_shared — the LSH-bucket pair shape, no corpus join.

Hashes are a pure function of the text bytes, so fingerprints are
layout/cluster/day-deterministic.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_B = np.uint64(1_000_003)          # polynomial base (odd, large)

_FP_SCHEMA = pa.schema([("doc_id", pa.int64()), ("pos", pa.int64()),
                        ("fp", pa.uint64())])


def _kgram_hashes(data: np.ndarray, k: int) -> np.ndarray:
    """uint64 polynomial hashes of every k-byte window (vectorized)."""
    n = len(data) - k + 1
    if n <= 0:
        return np.empty(0, np.uint64)
    powers = _B ** np.arange(k - 1, -1, -1, dtype=np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(
        data.astype(np.uint64), k)
    return (win * powers[None, :]).sum(axis=1, dtype=np.uint64)


def winnow_select(text: str, k: int = 5, w: int = 4):
    """(positions, fingerprints) selected by robust winnowing: in each
    window of ``w`` consecutive k-gram hashes keep the RIGHTMOST
    minimum; consecutive re-selections collapse.  Guarantees: every
    w-window contributes a fingerprint, and two texts sharing a
    substring of length >= w + k - 1 share a selected fingerprint."""
    data = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
    h = _kgram_hashes(data, k)
    if len(h) == 0:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    if len(h) < w:
        i = len(h) - 1 - int(np.argmin(h[::-1]))   # rightmost min
        return (np.array([i], np.int64), h[[i]])
    wins = np.lib.stride_tricks.sliding_window_view(h, w)
    # rightmost min per window: argmin of the reversed window
    right = w - 1 - np.argmin(wins[:, ::-1], axis=1)
    pos = np.arange(len(wins), dtype=np.int64) + right
    keep = np.empty(len(pos), bool)
    keep[0] = True
    keep[1:] = pos[1:] != pos[:-1]
    pos = pos[keep]
    return pos, h[pos]


def winnow_fingerprints(sf_dir: str, k: int = 5, w: int = 4):
    """Dataset[doc_id, pos, fp]: every selected fingerprint of every
    document (map-only over the pruned scan)."""
    from ._io import clean_read

    ds = clean_read(f"{sf_dir}/documents.parquet",
                    columns=["doc_id", "text"])

    def select(batch: pa.Table) -> pa.Table:
        ids, poss, fps = [], [], []
        for d, t in zip(batch["doc_id"].to_pylist(),
                        batch["text"].to_pylist()):
            p, f = winnow_select(t or "", k, w)
            ids.extend([d] * len(p))
            poss.append(p)
            fps.append(f)
        if not ids:
            return _FP_SCHEMA.empty_table()
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "pos": pa.array(np.concatenate(poss), pa.int64()),
            "fp": pa.array(np.concatenate(fps), pa.uint64())})

    return ds.map_batches(select, batch_format="pyarrow",
                          batch_size=1024)


def winnow_overlap_pairs(sf_dir: str, min_shared: int = 2,
                         k: int = 5, w: int = 4,
                         max_bucket: int = 64, fps=None):
    """Document pairs sharing >= min_shared selected fingerprints —
    shared-passage candidates.  ONE groupby(fp) co-locates selectors
    of the same hash (each doc contributes a fingerprint VALUE once —
    in-doc repeats dedup before the shuffle); buckets larger than
    ``max_bucket`` docs are dropped as stop-gram buckets (boilerplate
    shared by everything — the standard posting-list cap, logged via
    the n_shared semantics: dropped buckets only LOWER counts).
    Returns Dataset[doc_a, doc_b, n_shared], doc_a < doc_b.
    ``fps``: optionally a precomputed winnow_fingerprints Dataset so a
    composing caller (containment) pays the corpus scan once."""
    from ray.data.aggregate import Sum

    if fps is None:
        fps = winnow_fingerprints(sf_dir, k, w)

    def dedup_in_doc(batch: pa.Table) -> pa.Table:
        t = batch.select(["fp", "doc_id"])
        return t.group_by(["fp", "doc_id"]).aggregate([]).select(
            ["fp", "doc_id"])

    pair_schema = pa.schema([("doc_a", pa.int64()),
                             ("doc_b", pa.int64()),
                             ("n", pa.int64())])

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = np.unique(np.asarray(group["doc_id"].to_pylist(),
                                   dtype=np.int64))
        n = len(ids)
        if n < 2 or n > max_bucket:
            return pair_schema.empty_table()
        ai, bi = np.triu_indices(n, 1)
        return pa.table({"doc_a": pa.array(ids[ai], pa.int64()),
                         "doc_b": pa.array(ids[bi], pa.int64()),
                         "n": pa.array(np.ones(len(ai), np.int64),
                                       pa.int64())})

    pairs = (fps.map_batches(dedup_in_doc, batch_format="pyarrow")
             .groupby("fp")
             .map_groups(bucket_pairs, batch_format="pyarrow")
             .groupby(["doc_a", "doc_b"])
             .aggregate(Sum("n", alias_name="n_shared")))
    return pairs.filter(expr=f"n_shared >= {int(min_shared)}")


def winnow_containment_pairs(sf_dir: str, min_shared: int = 2,
                             k: int = 5, w: int = 4,
                             max_bucket: int = 64):
    """Overlap pairs with ASYMMETRIC containment scores — MOSS's
    report metric: ``contain_a`` = shared / |fingerprints(doc_a)| (how
    much of A is covered by the match; near 1.0 means A is quoted
    inside B even when B is huge, which symmetric Jaccard dilutes to
    noise).

    One extra tiny groupby over the fingerprint Dataset for per-doc
    distinct-fingerprint totals, joined onto the pair list
    (hash-partitioned, with the chained-join hygiene).  Scores round
    half-up to 1e-4 like the dedup pair family.
    Returns Dataset[doc_a, doc_b, n_shared, contain_a, contain_b]."""
    import ray.data as rd
    from ray.data.aggregate import Count

    from ._num import np_round_half_up
    from ._part import compact_parts, nparts_for
    from .dedup import _with_schema

    out_schema = pa.schema([
        ("doc_a", pa.int64()), ("doc_b", pa.int64()),
        ("n_shared", pa.int64()),
        ("contain_a", pa.float64()), ("contain_b", pa.float64())])

    # ONE corpus scan feeds BOTH the pair stage and the totals stage
    # (the dup_pairs_from_scan IO-fusion lesson)
    fps = winnow_fingerprints(sf_dir, k, w).materialize()
    pairs = winnow_overlap_pairs(sf_dir, min_shared, k, w,
                                 max_bucket, fps=fps).materialize()
    n_pairs = pairs.count()
    if n_pairs == 0:
        return rd.from_arrow(out_schema.empty_table())

    def distinct_in_doc(batch: pa.Table) -> pa.Table:
        return batch.select(["doc_id", "fp"]) \
            .group_by(["doc_id", "fp"]).aggregate([]) \
            .select(["doc_id", "fp"])

    def doc_partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["doc_id"]).aggregate([([], "count_all")])
        return pa.table({"doc_id": g["doc_id"],
                         "n": pa.compute.cast(g["count_all"],
                                              pa.int64())})

    # GLOBAL distinct before counting: the per-block dedup alone would
    # double-count a (doc_id, fp) value whose in-doc repeats straddle a
    # dynamic block split, deflating containment near the threshold
    from ray.data.aggregate import Sum as _Sum
    totals = (fps.map_batches(distinct_in_doc, batch_format="pyarrow")
              .groupby(["doc_id", "fp"]).count()
              .map_batches(doc_partial, batch_format="pyarrow")
              .groupby("doc_id")
              .aggregate(_Sum("n", alias_name="n_fp")))

    nparts = nparts_for(n_pairs)
    mid_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                            ("n_shared", pa.int64()),
                            ("n_fp_a", pa.int64())])
    half = (pairs.join(
        totals.rename_columns({"doc_id": "doc_a", "n_fp": "n_fp_a"}),
        "inner", num_partitions=nparts, on=("doc_a",))
        .map_batches(_with_schema(mid_schema), batch_format="pyarrow")
        .repartition(compact_parts(n_pairs))
        .materialize())
    joined = half.join(
        totals.rename_columns({"doc_id": "doc_b", "n_fp": "n_fp_b"}),
        "inner", num_partitions=nparts, on=("doc_b",))

    def score(batch: pa.Table) -> pa.Table:
        ns = batch["n_shared"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        fa = batch["n_fp_a"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        fb = batch["n_fp_b"].to_numpy(zero_copy_only=False) \
            .astype(np.float64)
        return pa.table({
            "doc_a": batch["doc_a"], "doc_b": batch["doc_b"],
            "n_shared": batch["n_shared"],
            "contain_a": pa.array(
                np_round_half_up(ns / np.maximum(fa, 1), 4),
                pa.float64()),
            "contain_b": pa.array(
                np_round_half_up(ns / np.maximum(fb, 1), 4),
                pa.float64())})

    return (joined.map_batches(score, batch_format="pyarrow")
            .map_batches(_with_schema(out_schema),
                         batch_format="pyarrow")
            .repartition(compact_parts(n_pairs)))


def containment_dedup_losers(sf_dir: str, threshold: float = 0.9,
                             min_shared: int = 2, k: int = 5, w: int = 4,
                             max_bucket: int = 64):
    """Docs that are >= ``threshold`` CONTAINED in another document —
    the subset-duplicate axis Jaccard dedup structurally misses (a
    fully-quoted short doc inside a long host has low Jaccard but
    containment ~1.0).  The contained (smaller-coverage) side of each
    qualifying pair loses; ties (mutual containment — near-identical
    docs) drop the higher doc_id, keeping the dedup family's min-id
    keeper convention.  Returns Dataset[doc_id] of losers."""
    import ray.data as rd

    from ._part import compact_parts
    from .dedup import _with_schema

    pairs = winnow_containment_pairs(sf_dir, min_shared, k, w,
                                     max_bucket)
    id_schema = pa.schema([("doc_id", pa.int64())])

    def losers(batch: pa.Table, thr=threshold) -> pa.Table:
        da = batch["doc_a"].to_numpy(zero_copy_only=False)
        db = batch["doc_b"].to_numpy(zero_copy_only=False)
        ca = np.asarray(batch["contain_a"].to_pylist())
        cb = np.asarray(batch["contain_b"].to_pylist())
        out = []
        both = (ca >= thr) & (cb >= thr)
        only_a = (ca >= thr) & ~both
        only_b = (cb >= thr) & ~both
        out.append(da[only_a])                    # a contained in b
        out.append(db[only_b])                    # b contained in a
        out.append(np.maximum(da, db)[both])      # mutual: max id loses
        ids = np.concatenate(out) if out else np.empty(0, np.int64)
        return pa.table({"doc_id": pa.array(ids, pa.int64())})

    raw = (pairs.map_batches(losers, batch_format="pyarrow")
           .map_batches(_with_schema(id_schema), batch_format="pyarrow")
           .materialize())
    n = raw.count()
    if n == 0:
        return rd.from_arrow(id_schema.empty_table())
    # a doc can lose against several hosts: dedup the loser set
    return (raw.repartition(compact_parts(n))
            .groupby("doc_id").count().select_columns(["doc_id"]))


def containment_dedup_survivors(sf_dir: str, threshold: float = 0.9,
                                **kw):
    """Corpus minus containment losers (hash-partitioned anti join —
    the dedup_survivors shape)."""
    from ._io import clean_read
    from ._part import compact_parts, nparts_for

    losers = containment_dedup_losers(sf_dir, threshold,
                                      **kw).materialize()
    docs = clean_read(f"{sf_dir}/documents.parquet", columns=["doc_id"])
    n_losers = losers.count()
    if n_losers == 0:
        return docs
    losers = losers.repartition(compact_parts(n_losers)).materialize()
    n_docs = docs.count()
    return (docs.join(losers, "left_anti",
                      num_partitions=nparts_for(n_docs),
                      on=("doc_id",))
            .repartition(compact_parts(max(1, n_docs - n_losers))))

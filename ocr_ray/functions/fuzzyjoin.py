"""Generic cross-DATASET fuzzy text join — record linkage between two
different tables (crawl vs. licensed corpus, new increment vs. catalog)
by near-duplicate text, the cross-side sibling of the within-corpus
``minhash_lsh_pairs`` family.

Shape (all existing dedup machinery, side-tagged):

1. featurize BOTH sides with the shared ``minhash_feature_batch``
   (same shingle geometry, same permutations — recall properties carry
   over unchanged) and tag ``side`` 0/1;
2. ONE union band shuffle: groupby(band_id, band_hash) buckets mix the
   sides; candidate emission is the CROSS product left x right only
   (never within-side), gated in-bucket by the vectorized signature
   estimate ``(sig_l == sig_r).mean()`` — an (n_l, n_r, 32) numpy
   comparison in row chunks, so a hot bucket costs bounded memory and
   no Python pair loop;
3. candidates dedup via groupby, then exact-Jaccard verify by TWO
   hash-partitioned joins against the feature tables (the
   minhash_lsh_pairs verify tail, including its empty-block hygiene);
4. optional order-aware re-verify: ``edit_threshold`` attaches texts
   through the same joins and runs the vectorized token-Levenshtein
   (``editsim``) so bag-of-words coincidences are rejected.

Keys are int64 per the dedup-family convention.  A per-bucket emitted-
pair cap (default 200k) refuses pathological buckets with the named
remedy (raise the threshold or pre-dedup the hot side) instead of
silently truncating.

Recall contract: pairs at Jaccard j collide in >= 1 of the 8 4-row
bands with prob 1-(1-j^4)^8 (identical texts: always); the in-bucket
estimate gate is thr-0.25 (>3 sd at 32 perms), exact Jaccard is the
real filter — same numbers as minhash_lsh_pairs.

Reference analog: none — beyond-reference training-data operator
(dedup/record-linkage family, SURVEY.md §2.7 extension).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from ._part import compact_parts as _compact_parts
from ._part import nparts_for as _num_partitions
from .dedup import (_perm_params, _shingles, _with_schema,
                    band_expansion, minhash_feature_batch)

_BUCKET_PAIR_CAP = 200_000
_EST_CHUNK = 256  # left-side rows per signature-matrix chunk


def _as_dataset(obj, key_col: str, text_col: str):
    import ray.data as rd

    if isinstance(obj, pa.Table):
        obj = rd.from_arrow(obj)
    return obj.select_columns([key_col, text_col]).rename_columns(
        {key_col: "doc_id", text_col: "text"})


def fuzzy_join(left, right, *, key_col: str = "doc_id",
               text_col: str = "text", jaccard_threshold: float = 0.8,
               edit_threshold: float | None = None,
               band_rows: int | None = None):
    """Near-duplicate text pairs ACROSS two datasets.

    ``left`` / ``right``: Datasets or pa.Tables with (key_col:int64,
    text_col:string).  Returns Dataset[left_id, right_id, jaccard
    (, edit_sim)] with jaccard >= jaccard_threshold (and edit_sim >=
    edit_threshold when given), rounded half-up to 1e-4.  Within-side
    pairs are never emitted.  No driver-side corpus reads.

    ``band_rows`` re-tunes the LSH band geometry over the SAME 32-perm
    signatures: defaults to 4 (8x4 bands — the dedup-family tuning for
    thr >= 0.7) when jaccard_threshold >= 0.6 and to 2 (16x2 — recall
    ~0.97 at j = 0.45 where 8x4 reads 0.26) below, at the cost of more
    candidate pairs; pass explicitly to pin either."""
    import ray.data as rd
    from ray.data.aggregate import Count

    a, b = _perm_params()
    keep_text = edit_threshold is not None
    if band_rows is None:
        band_rows = 4 if jaccard_threshold >= 0.6 else 2
    if band_rows not in (1, 2, 4, 8, 16, 32):
        raise ValueError("band_rows must divide the 32-perm signature")

    def featurize(side_tag: int):
        def fn(batch: pa.Table) -> pa.Table:
            feats = minhash_feature_batch(batch, a, b)
            feats = feats.append_column(
                "side", pa.array([side_tag] * feats.num_rows, pa.int8()))
            if keep_text:
                feats = feats.append_column("text", batch["text"])
            return feats
        return fn

    lf = _as_dataset(left, key_col, text_col).map_batches(
        featurize(0), batch_format="pyarrow", batch_size=1024)
    rf = _as_dataset(right, key_col, text_col).map_batches(
        featurize(1), batch_format="pyarrow", batch_size=1024)
    feats = lf.union(rf).materialize()

    def to_bands(batch: pa.Table) -> pa.Table:
        sig_list = batch["sig"].to_pylist()
        ids = batch["doc_id"].to_pylist()
        sides = batch["side"].to_pylist()
        band_id, band_hash, rows = band_expansion(sig_list,
                                                  rows_per_band=band_rows)
        return pa.table({"band_id": pa.array(band_id, pa.int64()),
                         "band_hash": pa.array(band_hash, pa.string()),
                         "doc_id": pa.array([ids[j] for j in rows],
                                            pa.int64()),
                         "sig": pa.array([sig_list[j] for j in rows],
                                         pa.binary()),
                         "side": pa.array([sides[j] for j in rows],
                                          pa.int8())})

    bands = feats.select_columns(["doc_id", "sig", "side"]).map_batches(
        to_bands, batch_format="pyarrow", batch_size=1024)

    pair_schema = pa.schema([("left_id", pa.int64()),
                             ("right_id", pa.int64())])
    est_gate = max(0.0, jaccard_threshold - 0.25)

    def bucket_pairs(group: pa.Table, gate=est_gate) -> pa.Table:
        sides = np.asarray(group["side"].to_pylist())
        l_idx = np.flatnonzero(sides == 0)
        r_idx = np.flatnonzero(sides == 1)
        if len(l_idx) == 0 or len(r_idx) == 0:
            return pa.Table.from_pylist([], schema=pair_schema)
        ids = np.asarray(group["doc_id"].to_pylist(), dtype=np.int64)
        sig_list = group["sig"].to_pylist()
        sigs_r = np.stack([np.frombuffer(sig_list[i], dtype=np.uint64)
                           for i in r_idx])
        out_l, out_r = [], []
        for s in range(0, len(l_idx), _EST_CHUNK):
            li = l_idx[s:s + _EST_CHUNK]
            sigs_l = np.stack([np.frombuffer(sig_list[i], dtype=np.uint64)
                               for i in li])
            est = (sigs_l[:, None, :] == sigs_r[None, :, :]).mean(axis=2)
            li_hit, ri_hit = np.nonzero(est >= gate)
            out_l.append(ids[li[li_hit]])
            out_r.append(ids[r_idx[ri_hit]])
            if sum(len(x) for x in out_l) > _BUCKET_PAIR_CAP:
                raise ValueError(
                    f"fuzzy_join bucket emitted > {_BUCKET_PAIR_CAP} "
                    "candidate pairs — a near-constant band hash. Raise "
                    "jaccard_threshold, or pre-dedup the hot side "
                    "(dedup_survivors) before joining.")
        return pa.table({"left_id": pa.array(np.concatenate(out_l)),
                         "right_id": pa.array(np.concatenate(out_r))})

    cand_schema = pa.schema([("left_id", pa.int64()),
                             ("right_id", pa.int64()),
                             ("n_bands", pa.int64())])
    cands = (bands.groupby(["band_id", "band_hash"])
             .map_groups(bucket_pairs, batch_format="pyarrow")
             .groupby(["left_id", "right_id"])
             .aggregate(Count(alias_name="n_bands"))
             .map_batches(_with_schema(cand_schema), batch_format="pyarrow")
             .materialize())

    out_fields = [("left_id", pa.int64()), ("right_id", pa.int64()),
                  ("jaccard", pa.float64())]
    if keep_text:
        out_fields.append(("edit_sim", pa.float64()))
    out_schema = pa.schema(out_fields)
    if cands.count() == 0:
        return rd.from_arrow(pa.Table.from_pylist([], schema=out_schema))

    nparts = _num_partitions(feats.count())
    side_cols = ["doc_id", "shingles"] + (["text"] if keep_text else [])
    fa = (feats.filter(expr="side == 0").select_columns(side_cols)
          .rename_columns({"doc_id": "left_id", "shingles": "sh_a",
                           **({"text": "text_a"} if keep_text else {})}))
    fb = (feats.filter(expr="side == 1").select_columns(side_cols)
          .rename_columns({"doc_id": "right_id", "shingles": "sh_b",
                           **({"text": "text_b"} if keep_text else {})}))
    mid_fields = [("left_id", pa.int64()), ("right_id", pa.int64()),
                  ("n_bands", pa.int64()), ("sh_a", pa.binary())]
    if keep_text:
        mid_fields.append(("text_a", pa.string()))
    mid_schema = pa.schema(mid_fields)
    half = (cands.join(fa, "inner", num_partitions=nparts, on=("left_id",))
            .map_batches(_with_schema(mid_schema), batch_format="pyarrow")
            .repartition(_compact_parts(cands.count()))
            .materialize())
    joined = half.join(fb, "inner", num_partitions=nparts, on=("right_id",))

    def verify(batch: pa.Table, thr=jaccard_threshold,
               ethr=edit_threshold) -> pa.Table:
        from .editsim import token_edit_similarity

        out = []
        cols = [batch["left_id"].to_pylist(), batch["right_id"].to_pylist(),
                batch["sh_a"].to_pylist(), batch["sh_b"].to_pylist()]
        if ethr is not None:
            cols += [batch["text_a"].to_pylist(),
                     batch["text_b"].to_pylist()]
        for row in zip(*cols):
            la, rb, ba, bb = row[:4]
            sa = np.frombuffer(ba, dtype=np.uint64)
            sb = np.frombuffer(bb, dtype=np.uint64)
            inter = len(np.intersect1d(sa, sb, assume_unique=True))
            union = len(sa) + len(sb) - inter
            j = inter / union if union else 0.0
            if j < thr:
                continue
            rec = {"left_id": la, "right_id": rb,
                   "jaccard": np.floor(j * 1e4 + 0.5) / 1e4}
            if ethr is not None:
                es = token_edit_similarity(row[4], row[5])
                if es < ethr:
                    continue
                rec["edit_sim"] = np.floor(es * 1e4 + 0.5) / 1e4
            out.append(rec)
        return pa.Table.from_pylist(out, schema=out_schema)

    return (joined.map_batches(verify, batch_format="pyarrow")
            .repartition(max(2, nparts // 4)))


def fuzzy_join_brute(left_tbl: pa.Table, right_tbl: pa.Table,
                     jaccard_threshold: float = 0.8) -> set[tuple]:
    """Driver-side all-pairs oracle for tests: exact shingle Jaccard
    over the full cross product."""
    out = set()
    lsh = [(i, _shingles(t)) for i, t in zip(
        left_tbl["doc_id"].to_pylist(), left_tbl["text"].to_pylist())]
    rsh = [(i, _shingles(t)) for i, t in zip(
        right_tbl["doc_id"].to_pylist(), right_tbl["text"].to_pylist())]
    for li, ls in lsh:
        for ri, rs in rsh:
            inter = len(np.intersect1d(ls, rs, assume_unique=True))
            union = len(ls) + len(rs) - inter
            j = inter / union if union else 0.0
            if j >= jaccard_threshold:
                out.add((li, ri, np.floor(j * 1e4 + 0.5) / 1e4))
    return out

"""Product-quantization ANN (IVF-PQ) over the ``embeddings`` table.

PQ (Jegou, Douze & Schmid 2011, "Product Quantization for Nearest
Neighbor Search") splits each d-dim vector into ``m`` subvectors and
replaces each with the id of its nearest subspace centroid: a vector
becomes ``m`` bytes instead of ``4*d`` float bytes (d=64, m=8 -> 32x
smaller index), and a query scores a vector by summing ``m``
lookup-table entries instead of a d-term dot product.  At 10^12
vectors x 64 float32 dims (~256 TB raw) the code table is ~8 TB and —
because codes are written partitioned by the SAME bucket assignment as
``functions/similarity.py``'s IVF index — a pruned query reads only
``nprobe/n_clusters`` of THAT.  This is the standard scale path
(FAISS's IVFPQ) expressed as Ray Data stages.

Pipeline shape:

* **codebook training**: strided row-group sample init (bounded IO —
  at most 8 column chunks regardless of corpus size) + distributed
  Lloyd rounds, each round ONE associative ``Dataset.aggregate`` whose
  state covers all ``m`` subspaces as int64 fixed-point partials (the
  ``_refine_centroids_distributed`` determinism discipline: integer
  accumulation is exact and independent of Ray's merge order and the
  corpus block layout);
* **encode**: one map-only pass over (vec_id, embedding) emitting
  (vec_id, codes: fixed_size_binary(m), bucket), written
  bucket-partitioned with footer row counts for adaptive probing;
* **search (ADC)**: asymmetric distance computation — the query builds
  an (m x k) inner-product lookup table driver-side, each code batch
  scores rows via two fancy-indexing ops, local top-N keeps only
  ``refine_factor * k`` candidates per batch, then an EXACT re-rank
  reads ONLY the candidate rows from the embeddings table (predicate
  pushdown on vec_id — a ~refine_factor*k-row point fetch, the one
  documented driver gate).  With re-rank the returned cosines are
  computed from the original vectors with ``knn_bruteforce``'s exact
  formula, so a perfect candidate set returns the IDENTICAL table and
  recall@k vs brute force (bench.py ``pq_recall_at_10``) is honest.

Vectors are L2-normalized before encoding so subspace inner-product
sums approximate cosine directly; bucket assignment uses the RAW
vectors so it matches the IVF index bit-for-bit.

Reference analog: vector_searcher.py's exhaustive scan, re-expressed
as a compressed-domain distributed scan with the same top-k contract
as ``knn_bruteforce``.
"""

from __future__ import annotations

import json
import os
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pqt

from ._num import np_round_half_up
from .similarity import (
    _batch_matrix,
    _fit_centroids,
    _query_vector,
    _read,
    build_ivf_index,
    probe_partitions,
)

_FIXED_POINT = float(1 << 24)


# shared zero-norm-to-1.0 row normalization: PQ encoding must follow
# the exact cosine convention of the IVF/semdedup family
from .semdedup import _norm_rows as _normalize_rows  # noqa: E402


def _fit_pq_codebooks(sample: np.ndarray, m: int, k: int,
                      iters: int = 8) -> np.ndarray:
    """Per-subspace deterministic Lloyd on the driver sample (init for
    the distributed refinement).  Returns (m, k, dsub)."""
    n, d = sample.shape
    if d % m:
        raise ValueError(f"dim {d} not divisible by m={m}")
    dsub = d // m
    cbs = np.empty((m, k, dsub), dtype=np.float64)
    for mi in range(m):
        cbs[mi] = _fit_centroids(
            np.ascontiguousarray(sample[:, mi * dsub:(mi + 1) * dsub]), k)
    return cbs


def _refine_pq_distributed(ds, cbs: np.ndarray, iters: int = 2) -> np.ndarray:
    """Distributed Lloyd rounds over the FULL corpus for every subspace
    at once: one integer-exact associative aggregate per round (state =
    m x k x (dsub+1) int64 sums+counts, ~33 KB at d=64/m=8/k=16) —
    merge-order- and block-layout-independent, like the IVF centroids.
    Empty clusters keep their previous centroid."""
    from ray.data.aggregate import AggregateFn

    m, k, dsub = cbs.shape

    for _ in range(iters):
        cur = cbs.copy()

        def acc_block(state, blk, cur=cur):
            x = _normalize_rows(_batch_matrix(blk))
            arr = (np.frombuffer(state, dtype=np.int64)
                   .reshape(m, k, dsub + 1).copy() if state
                   else np.zeros((m, k, dsub + 1), np.int64))
            if len(x):
                xs = x.reshape(len(x), m, dsub)
                for mi in range(m):
                    d2 = ((xs[:, mi, None, :] - cur[mi][None, :, :]) ** 2) \
                        .sum(-1)
                    a = d2.argmin(1)
                    xi = np.rint(xs[:, mi, :] * _FIXED_POINT) \
                        .astype(np.int64)
                    np.add.at(arr[mi, :, :dsub], a, xi)
                    arr[mi, :, dsub] += np.bincount(a, minlength=k)
            return arr.tobytes()

        def merge(s1, s2):
            if not s1:
                return s2
            if not s2:
                return s1
            return (np.frombuffer(s1, dtype=np.int64)
                    + np.frombuffer(s2, dtype=np.int64)).tobytes()

        agg = AggregateFn(init=lambda _: b"", merge=merge,
                          accumulate_block=acc_block, name="pqtrain")
        arr = np.frombuffer(ds.aggregate(agg)["pqtrain"],
                            dtype=np.int64).reshape(m, k, dsub + 1)
        cnt = arr[..., dsub:].astype(np.float64)
        sums = arr[..., :dsub].astype(np.float64) / _FIXED_POINT
        cbs = np.where(cnt > 0, sums / np.maximum(cnt, 1), cbs)
    return cbs


def _encode(xn: np.ndarray, cbs: np.ndarray) -> np.ndarray:
    """Normalized vectors -> (n, m) uint8 codes (nearest subspace
    centroid; argmin's first-index tie-break is deterministic)."""
    n = len(xn)
    m, k, dsub = cbs.shape
    codes = np.empty((n, m), dtype=np.uint8)
    xs = xn.reshape(n, m, dsub)
    for mi in range(m):
        d2 = ((xs[:, mi, None, :] - cbs[mi][None, :, :]) ** 2).sum(-1)
        codes[:, mi] = d2.argmin(1)
    return codes


def _codes_matrix(batch: pa.Table, m: int) -> np.ndarray:
    """Zero-copy fixed_size_binary(m) column -> (n, m) uint8 view."""
    flat = batch["codes"].combine_chunks()
    if isinstance(flat, pa.ChunkedArray):
        flat = pa.concat_arrays(flat.chunks)
    buf = np.frombuffer(flat.buffers()[1], dtype=np.uint8)
    start = flat.offset * m
    return buf[start:start + len(flat) * m].reshape(-1, m)


def pq_index_path(sf_dir: str, m: int, nbits: int, n_clusters: int) -> str:
    """Cache key folds in a data fingerprint (size + mtime), same rule
    as the IVF index: regenerating the parquet invalidates the cache."""
    import hashlib as _h

    st = os.stat(f"{sf_dir}/embeddings.parquet")
    key = _h.md5(f"{sf_dir}:{m}:{nbits}:{n_clusters}:pq-v1:"
                 f"{st.st_size}:{st.st_mtime_ns}".encode()).hexdigest()[:12]
    return f"/tmp/ocr_ray_pq_{key}"


def build_pq_index(sf_dir: str, m: int = 8, nbits: int = 4,
                   n_clusters: int = 16):
    """Build (once, cached, atomically published) the bucket-partitioned
    PQ code table.  Returns (path, codebooks (m,k,dsub), ivf_centroids).

    ``nbits`` <= 8 (codes are one byte per subspace); the effective k is
    capped by the driver sample size so tiny corpora still train."""
    if not 1 <= nbits <= 8:
        raise ValueError("nbits must be in [1, 8]")
    path = pq_index_path(sf_dir, m, nbits, n_clusters)
    meta_file = f"{path}/_pq_meta.json"
    if os.path.exists(f"{path}/_DONE"):
        meta = json.load(open(meta_file))
        return (path, np.asarray(meta["codebooks"], dtype=np.float64),
                np.asarray(meta["centroids"], dtype=np.float64))

    # bucket layout shared with the IVF index (builds/reuses its cache)
    _, cent = build_ivf_index(sf_dir, n_clusters)

    # strided sample for the init: a few rows from the head of at most
    # 8 evenly spaced row groups (bounded IO at any corpus size)
    pf = pqt.ParquetFile(f"{sf_dir}/embeddings.parquet")
    n_rg = pf.metadata.num_row_groups
    pick = sorted({int(i) for i in
                   np.linspace(0, n_rg - 1, num=min(n_rg, 8))})
    per_rg = max(1, 512 // len(pick))
    parts = []
    for rg in pick:
        t = pf.read_row_group(rg, columns=["embedding"])
        parts.append(np.asarray(t["embedding"][:per_rg].to_pylist(),
                                dtype=np.float64))
    sample = _normalize_rows(np.concatenate(parts)[:512])
    k = min(1 << nbits, len(sample))
    cbs = _fit_pq_codebooks(sample, m, k)

    ds = _read(sf_dir, ["vec_id", "embedding"])
    cbs = _refine_pq_distributed(ds, cbs)

    def encode_batch(batch: pa.Table, cbs=cbs, cent=cent) -> pa.Table:
        x = _batch_matrix(batch)
        codes = _encode(_normalize_rows(x), cbs)
        # bucket from RAW vectors — bit-identical to the IVF assignment
        bucket = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(-1) \
            .argmin(1).astype(np.int64)
        n, mm = codes.shape
        codes_arr = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(mm), n,
            [None, pa.py_buffer(np.ascontiguousarray(codes).tobytes())])
        return pa.table({"vec_id": batch["vec_id"],
                         "codes": codes_arr,
                         "bucket": pa.array(bucket, pa.int64())})

    tmp = f"{path}.build.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    ds.map_batches(encode_batch, batch_format="pyarrow",
                   batch_size=4096).write_parquet(
        tmp, partition_cols=["bucket"])
    # footer-metadata bucket counts (adaptive probing, zero data reads)
    counts: dict[str, int] = {}
    for name in sorted(os.listdir(tmp)):
        if not name.startswith("bucket="):
            continue
        b = name.split("=", 1)[1]
        d = f"{tmp}/{name}"
        counts[b] = sum(
            pqt.ParquetFile(f"{d}/{f}").metadata.num_rows
            for f in os.listdir(d) if f.endswith(".parquet"))
    with open(f"{tmp}/_bucket_counts.json", "w") as f:
        json.dump(counts, f)
    with open(f"{tmp}/_pq_meta.json", "w") as f:
        json.dump({"m": m, "nbits": nbits, "k": k,
                   "codebooks": cbs.tolist(),
                   "centroids": cent.tolist()}, f)
    open(f"{tmp}/_DONE", "w").close()
    try:
        os.rename(tmp, path)
    except OSError:
        shutil.rmtree(tmp, ignore_errors=True)  # a concurrent build won
    return path, cbs, cent


def _rerank_sources(sf_dir: str, index_path: str) -> list[str]:
    """Files the exact re-rank point-fetch reads: the base corpus plus
    any files recorded by append_to_pq_index (the appended vectors
    live outside the original parquet)."""
    import json

    srcs = [f"{sf_dir}/embeddings.parquet"]
    extra = f"{index_path}/_extra_sources.json"
    if os.path.exists(extra):
        srcs.extend(json.load(open(extra)))
    return srcs


def _point_fetch(sources: list[str], ids: list[int]) -> pa.Table:
    tabs = [pqt.read_table(p, columns=["vec_id", "embedding"],
                           filters=[("vec_id", "in", ids)])
            for p in sources]
    return pa.concat_tables([t for t in tabs if t.num_rows]) \
        if any(t.num_rows for t in tabs) else tabs[0]


def _empty_topk():
    import ray.data as rd

    return rd.from_arrow(pa.table({"vec_id": pa.array([], pa.int64()),
                                   "cosine": pa.array([], pa.float64())}))


def knn_pq(sf_dir: str, query_vec_id: int = 0, k: int = 10,
           m: int = 8, nbits: int = 8, n_clusters: int = 16,
           nprobe: int | None = None, refine_factor: int = 8,
           min_covered_rows: int | None = None):
    """Compressed-domain approximate cosine top-k with exact re-rank.

    ``nprobe=None`` (default) scans every bucket's CODES — still ~32x
    less IO than brute force at d=64/m=8; pass a small ``nprobe`` for
    the IVF-PQ pruned path (probes widen by footer counts exactly like
    ``knn_ivf``).  Rows-only oracle (approximate by design); recall@k
    vs knn_bruteforce is reported by bench.py (``pq_recall_at_10``).

    Defaults (nbits=8, refine_factor=8) were measured on the bench
    corpus: its embeddings are near-isotropic Gaussian, so every true
    neighbor sits in a razor-thin cosine band (~0.27-0.33 vs a 0.27
    bulk) — the hardest regime for ANN — and an 80-candidate exact
    re-rank is what reaches recall@10 = 1.0 at both sf0.001 and sf0.1
    (4-bit codes + 40 candidates read 0.8-0.9).  The re-rank is a
    refine_factor*k-row point fetch regardless of corpus size, so the
    wide setting costs nothing at scale."""
    import ray.data as rd

    path, cbs, cent = build_pq_index(sf_dir, m, nbits, n_clusters)
    mq, kq, dsub = cbs.shape
    q = _query_vector(sf_dir, query_vec_id)
    nq = np.linalg.norm(q)
    qn = q / nq if nq else q
    if nprobe is None:
        nprobe = len(cent)
    if min_covered_rows is None:
        min_covered_rows = 32 * k
    files = probe_partitions(path, cent, q, nprobe, min_covered_rows)
    if not files:
        return _empty_topk()

    # ADC lookup table: lut[mi, j] = q_sub(mi) . codebook[mi, j]
    lut = (cbs * qn.reshape(mq, 1, dsub)).sum(-1)
    n_cand = max(k, refine_factor * k)

    def adc_topn(batch: pa.Table, lut=lut, mq=mq, n=n_cand) -> pa.Table:
        codes = _codes_matrix(batch, mq)
        approx = lut[np.arange(mq)[None, :], codes].sum(1)
        ids = np.asarray(batch["vec_id"].to_numpy(zero_copy_only=False))
        take = min(n, len(ids))
        order = np.lexsort((ids, -approx))[:take]
        return pa.table({"vec_id": pa.array(ids[order], pa.int64()),
                         "adc": pa.array(approx[order], pa.float64())})

    cand = (rd.read_parquet(files, columns=["vec_id", "codes"])
            .map_batches(adc_topn, batch_format="pyarrow",
                         batch_size=8192)
            .sort(["adc", "vec_id"], descending=[True, False])
            .limit(n_cand))
    # the one driver gate: refine_factor*k candidate ids (tiny, bounded)
    cand_ids = [r["vec_id"] for r in cand.take(n_cand)]
    if not cand_ids:
        return _empty_topk()

    # exact re-rank: predicate-pushdown point fetch of ONLY those rows
    # (base corpus + any appended source files)
    tbl = _point_fetch(_rerank_sources(sf_dir, path), cand_ids)
    x = np.asarray(tbl["embedding"].to_pylist(), dtype=np.float64)
    ids = tbl["vec_id"].to_numpy(zero_copy_only=False)
    norms = np.linalg.norm(x, axis=1)
    norms[norms == 0] = 1.0
    cos = np_round_half_up((x @ qn) / norms, 6)   # knn_bruteforce formula
    order = np.lexsort((ids, -cos))[:min(k, len(ids))]
    return rd.from_arrow(pa.table({
        "vec_id": pa.array(np.asarray(ids)[order], pa.int64()),
        "cosine": pa.array(cos[order], pa.float64())}))


def knn_pq_batch(sf_dir: str, n_queries: int = 8, k: int = 5,
                 m: int = 8, nbits: int = 8, n_clusters: int = 16,
                 nprobe: int | None = None, refine_factor: int = 8,
                 min_covered_rows: int | None = None):
    """Batched multi-query PQ top-k (the knn_ivf_batch contract on the
    COMPRESSED table): ONE read over the union of every query's probed
    code partitions, one fancy-indexed LUT pass scores ALL queries per
    batch, per-(batch, query) top-N keeps refine_factor*k candidates,
    and ONE predicate-pushdown point fetch re-ranks every query's
    candidates exactly.  Per-query results are filtered to that
    query's own probed buckets and candidate list, so each answer is
    identical to running knn_pq alone (verified in tests)."""
    import ray.data as rd

    path, cbs, cent = build_pq_index(sf_dir, m, nbits, n_clusters)
    mq, kcb, dsub = cbs.shape
    empty = rd.from_arrow(pa.table({"query_id": pa.array([], pa.int64()),
                                    "vec_id": pa.array([], pa.int64()),
                                    "cosine": pa.array([], pa.float64())}))
    tbl = pqt.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"],
                         filters=[("vec_id", "<", n_queries)])
    if tbl.num_rows == 0:
        return empty
    order = pc.sort_indices(tbl["vec_id"])
    qids = pc.take(tbl["vec_id"], order).to_numpy(zero_copy_only=False)
    qmat = np.asarray(pc.take(tbl["embedding"], order).to_pylist(),
                      dtype=np.float64)
    qn = _normalize_rows(qmat)

    if nprobe is None:
        nprobe = len(cent)
    if min_covered_rows is None:
        min_covered_rows = 32 * k
    from .similarity import probe_buckets

    per_q_buckets = [
        set(probe_buckets(path, cent, q, nprobe, min_covered_rows))
        for q in qmat]
    all_paths = []
    for b in sorted(set().union(*per_q_buckets)):
        d = f"{path}/bucket={b}"
        if os.path.isdir(d):
            all_paths.extend(f"{d}/{f}" for f in sorted(os.listdir(d))
                             if f.endswith(".parquet"))
    if not all_paths:
        return empty

    # (Q, m*kcb) flattened LUTs; a batch's scores for every query come
    # from ONE fancy-index + sum — no per-query matmul
    lut_flat = (cbs[None, :, :, :] * qn[:, None, None, :]
                .reshape(len(qn), mq, 1, dsub)).sum(-1).reshape(
                    len(qn), mq * kcb)
    mask = np.array([[b in bq for bq in per_q_buckets]
                     for b in range(n_clusters)])  # (bucket, query)
    n_cand = max(k, refine_factor * k)

    raw = rd.read_parquet(all_paths, columns=["vec_id", "codes"],
                          include_paths=True)

    def adc_topn(batch: pa.Table, lut_flat=lut_flat, mq=mq, kcb=kcb,
                 mask=mask, n=n_cand) -> pa.Table:
        codes = _codes_matrix(batch, mq)
        off = np.arange(mq) * kcb + codes            # (rows, m)
        scores = lut_flat[:, off].sum(-1)            # (Q, rows)
        buckets = np.array([int(p.split("bucket=")[1].split("/")[0])
                            for p in batch["path"].to_pylist()],
                           dtype=np.int64)
        ids = np.asarray(batch["vec_id"].to_numpy(zero_copy_only=False))
        out_q, out_v, out_a = [], [], []
        for j in range(scores.shape[0]):
            ok = mask[buckets, j]
            if not ok.any():
                continue
            sel_ids, sel_adc = ids[ok], scores[j, ok]
            sel = np.lexsort((sel_ids, -sel_adc))[:min(n, len(sel_ids))]
            out_q.extend([j] * len(sel))
            out_v.extend(sel_ids[sel].tolist())
            out_a.extend(sel_adc[sel].tolist())
        return pa.table({"q_ix": pa.array(out_q, pa.int64()),
                         "vec_id": pa.array(out_v, pa.int64()),
                         "adc": pa.array(out_a, pa.float64())})

    def final_topn(group: pa.Table, n=n_cand) -> pa.Table:
        ids = np.asarray(group["vec_id"].to_pylist())
        adc = np.asarray(group["adc"].to_pylist())
        sel = np.lexsort((ids, -adc))[:n]
        return pa.table({"q_ix": group["q_ix"].take(pa.array(sel)),
                         "vec_id": pa.array(ids[sel], pa.int64()),
                         "adc": pa.array(adc[sel], pa.float64())})

    cand = (raw.map_batches(adc_topn, batch_format="pyarrow",
                            batch_size=8192)
            .groupby("q_ix").map_groups(final_topn,
                                        batch_format="pyarrow"))
    # the one driver gate: Q * refine_factor*k candidate ids
    per_q: dict[int, list[int]] = {}
    for r in cand.take_all():
        per_q.setdefault(int(r["q_ix"]), []).append(int(r["vec_id"]))
    all_ids = sorted({v for vs in per_q.values() for v in vs})
    if not all_ids:
        return empty

    rtbl = _point_fetch(_rerank_sources(sf_dir, path), all_ids)
    rx = np.asarray(rtbl["embedding"].to_pylist(), dtype=np.float64)
    rids = np.asarray(rtbl["vec_id"].to_numpy(zero_copy_only=False))
    norms = np.linalg.norm(rx, axis=1)
    norms[norms == 0] = 1.0
    cos_all = np_round_half_up((rx @ qn.T) / norms[:, None], 6)
    pos = {int(v): i for i, v in enumerate(rids)}
    out_q, out_v, out_c = [], [], []
    for j in sorted(per_q):
        cand_ids = np.array(sorted(set(per_q[j])), dtype=np.int64)
        rows = np.array([pos[int(v)] for v in cand_ids])
        cj = cos_all[rows, j]
        sel = np.lexsort((cand_ids, -cj))[:min(k, len(cand_ids))]
        out_q.extend([int(qids[j])] * len(sel))
        out_v.extend(cand_ids[sel].tolist())
        out_c.extend(cj[sel].tolist())
    return rd.from_arrow(pa.table({
        "query_id": pa.array(out_q, pa.int64()),
        "vec_id": pa.array(out_v, pa.int64()),
        "cosine": pa.array(out_c, pa.float64())}))


def append_to_pq_index(index_path: str, new_embeddings_file: str,
                       batch_size: int = 4096) -> dict:
    """Continuous ingestion for the PQ index (the band-index append
    story on the vector side): encode NEW vectors under the index's
    FROZEN codebook and add them as NEW files inside the existing
    bucket partitions — committed files are never touched, so readers
    mid-query see either the old or the new file set, both valid.

    The codebook is deliberately not retrained (the standard IVF-PQ
    append contract): quantization error drifts only if the new data's
    distribution does, and the exact re-rank absorbs moderate drift —
    rebuild when recall against a brute-force sample degrades.
    Bucket counts are refreshed via tmp-write + atomic rename, so
    adaptive probing sees the appended rows.  Caller contract: new
    vec_ids must not repeat ids already in the index (same rule as the
    parquet corpus itself).

    Returns {"rows": appended, "buckets": touched}."""
    import json

    import ray.data as rd

    meta = json.load(open(f"{index_path}/_pq_meta.json"))
    cbs = np.asarray(meta["codebooks"], dtype=np.float64)
    cent = np.asarray(meta["centroids"], dtype=np.float64)
    m = int(meta["m"])

    ds = rd.read_parquet(new_embeddings_file,
                         columns=["vec_id", "embedding"])

    def encode_batch(batch: pa.Table) -> pa.Table:
        x = _batch_matrix(batch)
        codes = _encode(_normalize_rows(x), cbs)
        bucket = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(-1) \
            .argmin(1).astype(np.int64)
        n, mm = codes.shape
        codes_arr = pa.FixedSizeBinaryArray.from_buffers(
            pa.binary(mm), n,
            [None, pa.py_buffer(np.ascontiguousarray(codes).tobytes())])
        return pa.table({"vec_id": batch["vec_id"],
                         "codes": codes_arr,
                         "bucket": pa.array(bucket, pa.int64())})

    # stage under a private dir, then move files into the live bucket
    # dirs with unique names (os.rename within the same fs is atomic)
    tmp = f"{index_path}/.append.{os.getpid()}"
    shutil.rmtree(tmp, ignore_errors=True)
    os.makedirs(tmp, exist_ok=True)
    ds.map_batches(encode_batch, batch_format="pyarrow",
                   batch_size=batch_size).write_parquet(
        tmp, partition_cols=["bucket"])

    counts = json.load(open(f"{index_path}/_bucket_counts.json"))
    appended, touched = 0, 0
    for name in sorted(os.listdir(tmp)):
        if not name.startswith("bucket="):
            continue
        b = name.split("=", 1)[1]
        src_dir, dst_dir = f"{tmp}/{name}", f"{index_path}/{name}"
        os.makedirs(dst_dir, exist_ok=True)
        moved = 0
        for i, f in enumerate(sorted(os.listdir(src_dir))):
            if not f.endswith(".parquet"):
                continue
            rows = pqt.ParquetFile(f"{src_dir}/{f}").metadata.num_rows
            os.rename(f"{src_dir}/{f}",
                      f"{dst_dir}/append-{os.getpid()}-{i}-{f}")
            moved += rows
        counts[b] = counts.get(b, 0) + moved
        appended += moved
        touched += 1
    with open(f"{index_path}/_bucket_counts.json.tmp", "w") as f:
        json.dump(counts, f)
    os.rename(f"{index_path}/_bucket_counts.json.tmp",
              f"{index_path}/_bucket_counts.json")
    # record the source file so the exact re-rank can point-fetch the
    # appended vectors (they live outside the base corpus parquet)
    extra_file = f"{index_path}/_extra_sources.json"
    extras = (json.load(open(extra_file))
              if os.path.exists(extra_file) else [])
    if new_embeddings_file not in extras:
        extras.append(new_embeddings_file)
    with open(extra_file + ".tmp", "w") as f:
        json.dump(extras, f)
    os.rename(extra_file + ".tmp", extra_file)
    shutil.rmtree(tmp, ignore_errors=True)
    return {"rows": appended, "buckets": touched}

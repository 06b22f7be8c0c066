"""Mergeable sketches — the approx-aggregate pattern at scale.

The canonical shape (ray guide "Aggregation at scale"): each batch emits
ONE serialized sketch; a tiny second stage merges them.  Exact distinct
counting shuffles every key; a sketch ships a few KB per batch total.

Implemented:
* KMV (k-minimum-values) distinct-count estimator — deterministic
  (hash-based, no RNG), mergeable by union+truncate, standard error
  ~ 1/sqrt(k-1);
* Misra-Gries heavy hitters — mergeable frequency summaries with the
  classic guarantee: every item with true frequency > n/(k+1) survives,
  and each reported count under-estimates by at most n/(k+1) — so a
  final exact count of only the surviving candidates (a tiny semi-join)
  yields exact heavy hitters without ever group-counting the full
  keyspace.
* Count-Min point-frequency sketch (below).
* bottom-k quantile sketch — ONE-PASS approximate quantiles: the k rows
  with the smallest deterministic key hashes form a uniform
  without-replacement row sample (bottom-k of a union == merge of
  bottom-ks, so the sketch is merge-order- and block-layout-
  independent); quantiles are order statistics of the sample, with the
  DKW rank-error bound ~ sqrt(ln(2/d)/(2k)).  The exact operators
  (order_price_quantiles / grouped_quantiles_float) need a sort or
  multiple refinement rounds; this needs a single streaming scan.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

_MAX_HASH = float(2 ** 64)


def _hash64(values) -> np.ndarray:
    out = np.empty(len(values), dtype=np.uint64)
    for i, v in enumerate(values):
        d = hashlib.blake2b(str(v).encode(), digest_size=8).digest()
        out[i] = int.from_bytes(d, "big")
    return out


def kmv_sketch(values, k: int = 1024) -> np.ndarray:
    """k smallest distinct 64-bit hashes of the values."""
    h = np.unique(_hash64(values))
    return h[:k]


def kmv_merge(sketches: list[np.ndarray], k: int = 1024) -> np.ndarray:
    parts = [s for s in sketches if len(s)]
    if not parts:
        return np.array([], dtype=np.uint64)
    return np.unique(np.concatenate(parts))[:k]


def kmv_estimate(sketch: np.ndarray, k: int = 1024) -> float:
    """Distinct-count estimate: (k-1) / max_kth_normalized."""
    if len(sketch) < k:
        return float(len(sketch))  # saw fewer than k distinct: exact
    kth = float(sketch[k - 1]) / _MAX_HASH
    return (k - 1) / kth


def approx_distinct(ds, column: str, k: int = 1024):
    """Distributed approx-distinct over a Dataset column.

    Per batch: one sketch row (list<uint64 as int64-bits>); merge on the
    driver (a few KB regardless of input size). Returns a one-row
    pyarrow Table {approx_distinct: float64}.
    """
    from ray.data.aggregate import AggregateFn

    agg = AggregateFn(
        init=lambda _: np.array([], dtype=np.uint64),
        merge=lambda a, b: kmv_merge([a, b], k),
        accumulate_block=lambda s, blk: kmv_merge(
            [s, kmv_sketch(blk[column].to_pylist(), k)], k),
        finalize=lambda s: s.astype(np.int64).tobytes(),
        name="kmv")
    blob = ds.aggregate(agg)["kmv"]
    sk = np.frombuffer(blob, np.int64).astype(np.uint64)
    est = kmv_estimate(sk, k)
    return pa.table({"approx_distinct": pa.array([round(est, 1)], pa.float64())})


# ------------------------------------------------ Misra-Gries heavy hitters

def mg_sketch(values, k: int = 16) -> dict:
    """Misra-Gries summary of one batch: at most k counters."""
    counters: dict = {}
    for v in values:
        if v in counters:
            counters[v] += 1
        elif len(counters) < k:
            counters[v] = 1
        else:
            dead = []
            for key in counters:
                counters[key] -= 1
                if counters[key] == 0:
                    dead.append(key)
            for key in dead:
                del counters[key]
    return counters


def mg_merge(a: dict, b: dict, k: int = 16) -> dict:
    """Merge two MG summaries (Agarwal et al.: add, then subtract the
    (k+1)-th largest count from all and drop non-positives)."""
    out = dict(a)
    for key, c in b.items():
        out[key] = out.get(key, 0) + c
    if len(out) > k:
        cut = sorted(out.values(), reverse=True)[k]
        out = {key: c - cut for key, c in out.items() if c - cut > 0}
    return out


def heavy_hitters(ds, column: str, k: int = 16):
    """Distributed heavy hitters: per-batch MG summaries (a few dozen
    rows each, never the keyspace), tree-merged, then candidates
    verified with ONE exact filtered count — exact output for every
    item with frequency > n/(k+1), guaranteed by the MG bound.

    Returns pa.Table(value, n) sorted by n desc, value asc, restricted
    to candidates whose exact count clears the n/(k+1) support.
    """
    import pyarrow.compute as pc

    from ray.data.aggregate import AggregateFn

    agg = AggregateFn(
        init=lambda _: {},
        merge=lambda a, b: mg_merge(a, b, k),
        accumulate_block=lambda s, blk: mg_merge(
            s, mg_sketch([str(v) for v in blk[column].to_pylist()], k), k),
        name="mg")
    # tree-merged in the aggregate (the MG merge bound composes in any
    # order; round-2 folded per-batch summary rows on the driver, which
    # at corpus scale is millions of tiny driver merges)
    merged: dict = ds.aggregate(agg)["mg"]
    support = ds.count() // (k + 1)
    candidates = sorted(merged)
    if not candidates:
        return pa.table({"value": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})

    def count_candidates(batch: pa.Table, column=column,
                         cand=tuple(candidates)) -> pa.Table:
        vals = pa.array([str(v) for v in batch[column].to_pylist()],
                        pa.string())
        sel = pc.is_in(vals, value_set=pa.array(cand, pa.string()))
        kept = pc.filter(vals, sel).to_pylist()
        out: dict = {}
        for v in kept:
            out[v] = out.get(v, 0) + 1
        return pa.table({"value": pa.array(list(out), pa.string()),
                         "n": pa.array(list(out.values()), pa.int64())})

    from ray.data.aggregate import Sum

    exact = (ds.map_batches(count_candidates, batch_format="pyarrow",
                            batch_size=65536)
             .groupby("value").aggregate(Sum("n", alias_name="n"))
             .take_all())
    keep = sorted((r for r in exact if r["n"] > support),
                  key=lambda r: (-r["n"], r["value"]))
    return pa.table({"value": pa.array([r["value"] for r in keep],
                                       pa.string()),
                     "n": pa.array([r["n"] for r in keep], pa.int64())})


# ------------------------------------------------- Count-Min frequency

def cm_hash(values, row: int, width: int) -> np.ndarray:
    """Row-d bucket indices: blake2b("{d}:{v}") % width — deterministic,
    no RNG (the repo hash-sampling discipline)."""
    out = np.empty(len(values), dtype=np.int64)
    for i, v in enumerate(values):
        d = hashlib.blake2b(f"{row}:{v}".encode(), digest_size=8).digest()
        out[i] = int.from_bytes(d, "big") % width
    return out


def cm_sketch(values, width: int = 2048, depth: int = 4) -> np.ndarray:
    """Count-Min table of one batch: (depth, width) int64 counts."""
    sk = np.zeros((depth, width), dtype=np.int64)
    for d in range(depth):
        sk[d] += np.bincount(cm_hash(values, d, width), minlength=width)
    return sk


def cm_estimate(sk: np.ndarray, value) -> int:
    """Point-frequency estimate: min over rows (Cormode & Muthukrishnan:
    never under-estimates; over-estimates by <= e/width * n with
    probability >= 1 - e^-depth)."""
    depth, width = sk.shape
    return int(min(sk[d, int(cm_hash([value], d, width)[0])]
                   for d in range(depth)))


def approx_counts(ds, column: str, queries: list,
                  width: int = 2048, depth: int = 4) -> pa.Table:
    """Distributed approx point frequencies for the queried values.

    ONE associative aggregate whose state is the (depth x width) int64
    Count-Min table as a bytes blob (integer addition — exact,
    merge-order-independent, the kmeans/DSIR accumulator discipline;
    64 KB at the 2048x4 default regardless of corpus size), then
    driver-side point lookups.  Guarantee per query: estimate >= true
    count, and estimate - true <= (e/width) * n with probability
    >= 1 - e^-depth over the hash family.

    Returns pa.Table(value, approx_n) in the queries' order.
    """
    from ray.data.aggregate import AggregateFn

    def acc_block(state, blk):
        sk = (np.frombuffer(state, dtype=np.int64)
              .reshape(depth, width).copy() if state
              else np.zeros((depth, width), np.int64))
        sk += cm_sketch([str(v) for v in blk[column].to_pylist()],
                        width, depth)
        return sk.tobytes()

    def merge(s1, s2):
        if not s1:
            return s2
        if not s2:
            return s1
        return (np.frombuffer(s1, dtype=np.int64)
                + np.frombuffer(s2, dtype=np.int64)).tobytes()

    agg = AggregateFn(init=lambda _: b"", merge=merge,
                      accumulate_block=acc_block, name="cm")
    sk = np.frombuffer(ds.aggregate(agg)["cm"],
                       dtype=np.int64).reshape(depth, width)
    return pa.table({
        "value": pa.array([str(q) for q in queries], pa.string()),
        "approx_n": pa.array([cm_estimate(sk, str(q)) for q in queries],
                             pa.int64()),
    })


# ------------------------------------------- bottom-k quantile sketch

def sample_hash(keys) -> np.ndarray:
    """64-bit sampling hash of row keys.  Integer keys take a vectorized
    splitmix64 finalizer (public-domain mixer — no per-row Python on the
    hot path); anything else falls back to the blake2b loop.  Both are
    deterministic functions of the key value alone, so the bottom-k set
    is independent of block layout and execution order."""
    arr = np.asarray(keys)
    if np.issubdtype(arr.dtype, np.integer):
        x = arr.astype(np.uint64)
        with np.errstate(over="ignore"):
            x = x + np.uint64(0x9E3779B97F4A7C15)
            x = (x ^ (x >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
            x = (x ^ (x >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
            x = x ^ (x >> np.uint64(31))
        return x
    return _hash64(keys)


def bk_sketch(keys, values, k: int = 4096) -> tuple[np.ndarray, np.ndarray]:
    """Bottom-k sample of one batch: the k (hash, value) pairs with the
    smallest key hashes, hash-ascending."""
    h = sample_hash(keys)
    v = np.asarray(values, dtype=np.float64)
    idx = np.argsort(h, kind="stable")[:k]
    return h[idx], v[idx]


def bk_merge(a: tuple[np.ndarray, np.ndarray],
             b: tuple[np.ndarray, np.ndarray],
             k: int = 4096) -> tuple[np.ndarray, np.ndarray]:
    """Merge two bottom-k sketches: bottom-k of the union.  Associative
    and commutative, so the aggregate is merge-order-independent."""
    h = np.concatenate([a[0], b[0]])
    v = np.concatenate([a[1], b[1]])
    idx = np.argsort(h, kind="stable")[:k]
    return h[idx], v[idx]


def bk_quantiles(sample: np.ndarray, qs) -> np.ndarray:
    """quantile_disc over the sampled values: the value whose rank is
    ceil(q * m) (1-indexed) in sorted order — DuckDB quantile_disc
    semantics, exact when the sample IS the data (m <= k)."""
    s = np.sort(sample)
    m = len(s)
    out = np.empty(len(qs), dtype=np.float64)
    for i, q in enumerate(qs):
        r = int(np.ceil(q * m)) - 1
        out[i] = s[min(max(r, 0), m - 1)]
    return out


def _bk_pack(h: np.ndarray, v: np.ndarray) -> bytes:
    return h.tobytes() + v.tobytes()


def _bk_unpack(state: bytes) -> tuple[np.ndarray, np.ndarray]:
    m = len(state) // 16
    return (np.frombuffer(state[:8 * m], np.uint64),
            np.frombuffer(state[8 * m:], np.float64))


def approx_quantiles(ds, value_col: str, key_col: str,
                     qs=(0.01, 0.25, 0.5, 0.75, 0.99),
                     k: int = 4096) -> pa.Table:
    """ONE-PASS approximate quantiles of ``value_col``.

    The k rows with the smallest ``sample_hash(key_col)`` form a uniform
    without-replacement row sample (``key_col`` must be row-unique, e.g.
    doc_id / o_orderkey — the md5-hash-sample determinism discipline);
    quantiles are order statistics of that sample.  ONE associative
    aggregate whose state is k (hash, value) pairs as a bytes blob
    (64 KB at the 4096 default), so a 100 TB scan ships a few KB per
    block and never sorts.  Rank error: by DKW, the sample's empirical
    CDF is within eps of the true CDF with probability
    1 - 2 exp(-2 k eps^2) — k=4096 gives eps ~ 0.03 at 99% confidence.
    Exact (== quantile_disc) whenever the input has <= k rows.  The
    exact multi-round operators (order_price_quantiles /
    grouped_quantiles_float) remain the right tool when exactness is
    required; this is the single-scan screening tool.

    Returns pa.Table(q: float64, approx_value: float64).
    """
    import pyarrow.compute as pc

    from ray.data.aggregate import AggregateFn

    def acc_block(state: bytes, blk: pa.Table) -> bytes:
        blk = blk.filter(pc.is_valid(blk[value_col]))
        if blk.num_rows == 0:
            return state
        vals = blk[value_col].to_numpy(zero_copy_only=False)
        col = blk[key_col]
        if pa.types.is_integer(col.type):
            keys = col.to_numpy(zero_copy_only=False)
        else:
            keys = col.to_pylist()
        sk = bk_sketch(keys, vals, k)
        return _bk_pack(*(bk_merge(_bk_unpack(state), sk, k)
                          if state else sk))

    def merge(s1: bytes, s2: bytes) -> bytes:
        if not s1:
            return s2
        if not s2:
            return s1
        return _bk_pack(*bk_merge(_bk_unpack(s1), _bk_unpack(s2), k))

    agg = AggregateFn(init=lambda _: b"", merge=merge,
                      accumulate_block=acc_block, name="bk")
    _, sample = _bk_unpack(ds.aggregate(agg)["bk"])
    if len(sample) == 0:
        return pa.table({"q": pa.array([], pa.float64()),
                         "approx_value": pa.array([], pa.float64())})
    est = bk_quantiles(sample, qs)
    return pa.table({"q": pa.array(list(qs), pa.float64()),
                     "approx_value": pa.array(est, pa.float64())})


def grouped_approx_quantiles(ds, group_col: str, value_col: str,
                             key_col: str, qs=(0.25, 0.5, 0.75),
                             k: int = 1024) -> pa.Table:
    """One-pass approximate quantiles PER GROUP: state is a dict of
    bottom-k sketches keyed by group value, bounded by
    n_groups x k x 16 B (16 MB at 1k groups / 1k samples) — for
    low-cardinality group columns (lang, source, priority...).  Same
    determinism and DKW rank-error story as ``approx_quantiles``; the
    exact multi-round ``grouped_quantiles_float`` remains the tool when
    exactness is required.  High-cardinality grouping should go through
    a groupby shuffle instead of this broadcast-state aggregate.

    Returns pa.Table(<group_col>, q, approx_value) sorted by
    (group, q).
    """
    import pyarrow.compute as pc

    from ray.data.aggregate import AggregateFn

    def acc_block(state: dict, blk: pa.Table) -> dict:
        blk = blk.filter(pc.is_valid(blk[value_col]))
        if blk.num_rows == 0:
            return state
        state = dict(state)
        vals = blk[value_col].to_numpy(zero_copy_only=False)
        kcol = blk[key_col]
        if pa.types.is_integer(kcol.type):
            keys = kcol.to_numpy(zero_copy_only=False)
        else:
            keys = np.asarray(kcol.to_pylist(), dtype=object)
        groups = np.asarray(blk[group_col].to_pylist(), dtype=object)
        order = np.argsort(groups, kind="stable")
        gs, starts = np.unique(groups[order], return_index=True)
        bounds = list(starts) + [len(order)]
        for gi, g in enumerate(gs):
            idx = order[bounds[gi]:bounds[gi + 1]]
            sk = bk_sketch(keys[idx], vals[idx], k)
            prev = state.get(g)
            state[g] = (_bk_pack(*bk_merge(_bk_unpack(prev), sk, k))
                        if prev else _bk_pack(*sk))
        return state

    def merge(s1: dict, s2: dict) -> dict:
        out = dict(s1)
        for g, blob in s2.items():
            prev = out.get(g)
            out[g] = (_bk_pack(*bk_merge(_bk_unpack(prev),
                                         _bk_unpack(blob), k))
                      if prev else blob)
        return out

    agg = AggregateFn(init=lambda _: {}, merge=merge,
                      accumulate_block=acc_block, name="gbk")
    state: dict = ds.aggregate(agg)["gbk"]
    g_out, q_out, v_out = [], [], []
    for g in sorted(state):
        _, sample = _bk_unpack(state[g])
        est = bk_quantiles(sample, qs)
        for q, v in zip(qs, est):
            g_out.append(g)
            q_out.append(q)
            v_out.append(v)
    return pa.table({group_col: pa.array(g_out),
                     "q": pa.array(q_out, pa.float64()),
                     "approx_value": pa.array(v_out, pa.float64())})


def stratified_fixed_sample(ds, group_col: str, key_col: str,
                            k: int = 100) -> pa.Table:
    """EXACTLY min(k, group size) uniformly sampled keys PER GROUP —
    deterministic eval-set construction (the rate-based
    ``stratified_sample_stats`` cannot hit a fixed size; bottom-k by
    key hash can, and stays a pure function of the key values: the
    same rows are picked on any cluster, any layout, any day).

    ONE associative aggregate; state is n_groups x k x (hash, key)
    pairs — the grouped-quantile-sketch bound, for low-cardinality
    group columns.  Keys must be row-unique (doc_id / vec_id).

    Returns pa.Table(<group_col>, <key_col>) sorted by (group, hash) —
    a stable "take the first m" prefix property: the size-m sample is
    a PREFIX of the size-k sample for m <= k, so growing an eval set
    never resamples existing members.
    """
    from ray.data.aggregate import AggregateFn

    def acc_block(state: dict, blk: pa.Table) -> dict:
        state = dict(state)
        kcol = blk[key_col]
        if pa.types.is_integer(kcol.type):
            keys = kcol.to_numpy(zero_copy_only=False)
        else:
            keys = np.asarray(kcol.to_pylist(), dtype=object)
        h = sample_hash(keys)
        groups = np.asarray(blk[group_col].to_pylist(), dtype=object)
        order = np.argsort(groups, kind="stable")
        gs, starts = np.unique(groups[order], return_index=True)
        bounds = list(starts) + [len(order)]
        for gi, g in enumerate(gs):
            idx = order[bounds[gi]:bounds[gi + 1]]
            hh, kk = h[idx], keys[idx]
            top = np.argsort(hh, kind="stable")[:k]
            cand = list(zip(hh[top].tolist(), kk[top].tolist()))
            prev = state.get(g)
            if prev:
                cand = sorted(prev + cand)[:k]
            state[g] = cand
        return state

    def merge(s1: dict, s2: dict) -> dict:
        out = dict(s1)
        for g, pairs in s2.items():
            prev = out.get(g)
            out[g] = sorted(prev + pairs)[:k] if prev else pairs
        return out

    agg = AggregateFn(init=lambda _: {}, merge=merge,
                      accumulate_block=acc_block, name="strat")
    state: dict = ds.aggregate(agg)["strat"]
    g_out, k_out = [], []
    for g in sorted(state):
        for _, key in state[g]:
            g_out.append(g)
            k_out.append(key)
    return pa.table({group_col: pa.array(g_out),
                     key_col: pa.array(k_out)})


# ------------------------------------- pairwise group overlap (KMV Jaccard)

def kmv_jaccard(sa: np.ndarray, sb: np.ndarray, k: int) -> float:
    """Jaccard estimate from two KMV sketches: restrict to the union's
    k smallest hashes S (itself a KMV of A∪B — a uniform sample of the
    union), count how many of S are in both sketches.  EXACT whenever
    |A∪B| <= k (the sketches then hold the complete sets)."""
    union = kmv_merge([sa, sb], k)
    if len(union) == 0:
        return 0.0
    both = np.intersect1d(union, sa, assume_unique=True)
    both = np.intersect1d(both, sb, assume_unique=True)
    return len(both) / len(union)


def grouped_kmv_overlap(ds, group_col: str, text_col: str,
                        window: int = 5, k: int = 4096) -> pa.Table:
    """Pairwise content overlap BETWEEN groups (sources, dumps, shards):
    one KMV sketch of each group's token-shingle set via a single
    grouped aggregate (state bounded by n_groups x k x 8 B — for
    low-cardinality group columns), then Jaccard + union-distinct
    estimates for every group pair at the driver (n_groups choose 2
    folds over k-length int arrays).  The corpus-curation question
    "which crawls/dumps duplicate each other, and how much?" answered
    in ONE streaming pass — no pairwise corpus joins.  Deterministic:
    blake2b hashes, set-algebra merges (layout/merge-order
    independent).

    Returns pa.Table(group_a, group_b, est_jaccard, est_union) with
    group_a < group_b, sorted."""
    from ray.data.aggregate import AggregateFn

    from .corpus_prep import _win_shingles

    def acc_block(state: dict, blk: pa.Table) -> dict:
        state = dict(state)
        groups = blk[group_col].to_pylist()
        texts = blk[text_col].to_pylist()
        per_group: dict = {}
        for g, t in zip(groups, texts):
            per_group.setdefault(g, []).extend(_win_shingles(t, window))
        for g, shingles in per_group.items():
            sk = kmv_sketch(shingles, k)
            prev = state.get(g)
            state[g] = kmv_merge([prev, sk], k) if prev is not None else sk
        return state

    def merge(s1: dict, s2: dict) -> dict:
        out = dict(s1)
        for g, sk in s2.items():
            prev = out.get(g)
            out[g] = kmv_merge([prev, sk], k) if prev is not None else sk
        return out

    agg = AggregateFn(init=lambda _: {}, merge=merge,
                      accumulate_block=acc_block, name="kmvg")
    state: dict = ds.aggregate(agg)["kmvg"]
    names = sorted(state)
    a_out, b_out, j_out, u_out = [], [], [], []
    for i, ga in enumerate(names):
        for gb in names[i + 1:]:
            union = kmv_merge([state[ga], state[gb]], k)
            a_out.append(ga)
            b_out.append(gb)
            j_out.append(round(kmv_jaccard(state[ga], state[gb], k), 6))
            u_out.append(round(kmv_estimate(union, k), 1))
    return pa.table({"group_a": pa.array(a_out, pa.string()),
                     "group_b": pa.array(b_out, pa.string()),
                     "est_jaccard": pa.array(j_out, pa.float64()),
                     "est_union": pa.array(u_out, pa.float64())})


def source_overlap_jaccard(sf_dir: str, window: int = 5, k: int = 4096):
    """Between-source shingle overlap over the documents table."""
    from ._io import clean_read

    ds = clean_read(f"{sf_dir}/documents.parquet",
                    columns=["source", "text"])
    return grouped_kmv_overlap(ds, "source", "text", window=window, k=k)


# ------------------------------------------------------- HyperLogLog

def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized bit_length for uint64 (6 binary-search passes —
    no float log2, whose 53-bit mantissa rounds values just below a
    power of two UP and would flip a register by one on rare inputs)."""
    x = x.copy()
    n = np.zeros(x.shape, np.int64)
    for s in (32, 16, 8, 4, 2, 1):
        m = x >= (np.uint64(1) << np.uint64(s))
        n[m] += s
        x[m] >>= np.uint64(s)
    n[x == 1] += 1
    return n


def hll_sketch(values, p: int = 12) -> np.ndarray:
    """HyperLogLog registers (uint8[2^p]) over the values' blake2b
    hashes: register index = top p bits, rank = leading-zero count of
    the remaining 64-p bits + 1.  Deterministic (hash-based, no RNG);
    relative error ~ 1.04/sqrt(2^p) (~1.6% at p=12 for 4 KB of state).
    """
    m = 1 << p
    reg = np.zeros(m, np.uint8)
    if len(values) == 0:
        return reg
    h = _hash64(values)
    idx = (h >> np.uint64(64 - p)).astype(np.int64)
    low = h & np.uint64((1 << (64 - p)) - 1)
    rank = ((64 - p) - _bit_length_u64(low) + 1).astype(np.uint8)
    np.maximum.at(reg, idx, rank)
    return reg


def hll_merge(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Register-wise max — associative, commutative, idempotent: the
    merged sketch is identical for ANY block layout or merge order."""
    return np.maximum(a, b)


def hll_estimate(reg: np.ndarray) -> float:
    """Bias-corrected harmonic-mean estimate with the small-range
    linear-counting correction (Flajolet et al. 2007); the 64-bit-hash
    large-range correction is unnecessary below ~2^57 distinct."""
    m = len(reg)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-reg.astype(np.float64)))
    zeros = int(np.count_nonzero(reg == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    return float(est)


def approx_distinct_hll(ds, column: str, p: int = 12):
    """Distributed HLL distinct-count over a Dataset column: each block
    accumulates into a 2^p-register state, Ray's aggregate tree merges
    by register-wise max (order-free by idempotent-max algebra), and
    only ONE 4 KB state ever reaches the driver — vs approx_distinct's
    KMV this trades ~2x error per byte for O(1) accumulate cost and a
    fixed-size state independent of k.

    Returns a one-row pyarrow Table {approx_distinct: float64}.
    """
    from ray.data.aggregate import AggregateFn

    agg = AggregateFn(
        init=lambda _: np.zeros(1 << p, np.uint8),
        merge=hll_merge,
        accumulate_block=lambda s, blk: hll_merge(
            s, hll_sketch(blk[column].to_pylist(), p)),
        finalize=lambda s: s.tobytes(),
        name="hll")
    reg = np.frombuffer(ds.aggregate(agg)["hll"], np.uint8)
    est = hll_estimate(reg)
    return pa.table({"approx_distinct":
                     pa.array([round(est, 1)], pa.float64())})


def grouped_approx_distinct_hll(ds, group_col: str, value_col: str,
                                p: int = 12) -> pa.Table:
    """HLL distinct-count PER GROUP in one pass: state is a dict of
    2^p-byte register arrays keyed by group value (n_groups x 4 KB at
    p=12) — the low-cardinality-group sibling of ``approx_distinct_hll``
    (lang, source, event_type...).  Register max is idempotent and
    commutative, so the result is independent of block layout and
    merge order.  High-cardinality grouping should go through a
    groupby shuffle instead of this broadcast-state aggregate
    (the grouped_approx_quantiles contract).

    Returns pa.Table(<group_col>, approx_distinct) sorted by group.
    """
    import pyarrow.compute as pc

    from ray.data.aggregate import AggregateFn

    def acc_block(state: dict, blk: pa.Table) -> dict:
        blk = blk.filter(pc.is_valid(blk[value_col]))
        if blk.num_rows == 0:
            return state
        state = dict(state)
        vals = np.asarray(blk[value_col].to_pylist(), dtype=object)
        groups = np.asarray(blk[group_col].to_pylist(), dtype=object)
        order = np.argsort(groups, kind="stable")
        gs, starts = np.unique(groups[order], return_index=True)
        bounds = list(starts) + [len(order)]
        for gi, g in enumerate(gs):
            idx = order[bounds[gi]:bounds[gi + 1]]
            sk = hll_sketch(vals[idx], p)
            prev = state.get(g)
            state[g] = (hll_merge(np.frombuffer(prev, np.uint8), sk)
                        if prev is not None else sk).tobytes()
        return state

    def merge(s1: dict, s2: dict) -> dict:
        out = dict(s1)
        for g, blob in s2.items():
            prev = out.get(g)
            out[g] = (hll_merge(np.frombuffer(prev, np.uint8),
                                np.frombuffer(blob, np.uint8)).tobytes()
                      if prev is not None else blob)
        return out

    agg = AggregateFn(init=lambda _: {}, merge=merge,
                      accumulate_block=acc_block, name="ghll")
    state: dict = ds.aggregate(agg)["ghll"]
    gs = sorted(state)
    return pa.table({
        group_col: pa.array(gs),
        "approx_distinct": pa.array(
            [round(hll_estimate(np.frombuffer(state[g], np.uint8)), 1)
             for g in gs], pa.float64())})


def key_skew_report(ds, column: str, k: int = 16,
                    hot_share: float = 0.05) -> dict:
    """Pre-shuffle skew diagnostic for a key column: would a
    groupby/join on this key hot-spot one partition?  ONE fused
    aggregate carries (row count, Misra-Gries candidates, HLL
    registers) — the count/heavy-hitter/distinct scans fused into a
    single pass (the quality_suite IO-fusion discipline) — then one
    exact filtered count verifies the MG candidates (the heavy_hitters
    guarantee: every key with share > 1/(k+1) is surfaced; counts are
    exact).

    Returns {n_rows, approx_distinct, hot_keys: pa.Table(value, n,
    share), max_share, recommended_salt} — recommended_salt is the
    salt factor that spreads the hottest key across its share of a
    data-sized partition count (ceil(max_share * nparts); 1 = no
    salting needed), the input ``salted_join`` / salted-distinct
    expect.
    """
    import math

    import pyarrow.compute as pc

    from ray.data.aggregate import AggregateFn, Sum

    from ._part import nparts_for

    def acc_block(state: tuple, blk: pa.Table) -> tuple:
        n, mg, reg = state
        vals = [str(v) for v in blk[column].to_pylist()]
        return (n + len(vals), mg_merge(mg, mg_sketch(vals, k), k),
                hll_merge(reg, hll_sketch(vals)))

    def merge(a: tuple, b: tuple) -> tuple:
        return (a[0] + b[0], mg_merge(a[1], b[1], k),
                hll_merge(a[2], b[2]))

    agg = AggregateFn(
        init=lambda _: (0, {}, np.zeros(1 << 12, np.uint8)),
        merge=merge, accumulate_block=acc_block, name="skew")
    n_rows, mg, reg = ds.aggregate(agg)["skew"]
    distinct = round(hll_estimate(reg), 1)
    empty = pa.table({"value": pa.array([], pa.string()),
                      "n": pa.array([], pa.int64()),
                      "share": pa.array([], pa.float64())})
    if n_rows == 0 or not mg:
        return {"n_rows": 0, "approx_distinct": distinct,
                "hot_keys": empty, "max_share": 0.0,
                "recommended_salt": 1}

    cand = tuple(sorted(mg))

    def count_candidates(batch: pa.Table, column=column,
                         cand=cand) -> pa.Table:
        vals = pa.array([str(v) for v in batch[column].to_pylist()],
                        pa.string())
        sel = pc.is_in(vals, value_set=pa.array(cand, pa.string()))
        kept = pc.filter(vals, sel).to_pylist()
        out: dict = {}
        for v in kept:
            out[v] = out.get(v, 0) + 1
        return pa.table({"value": pa.array(list(out), pa.string()),
                         "n": pa.array(list(out.values()), pa.int64())})

    exact = (ds.map_batches(count_candidates, batch_format="pyarrow",
                            batch_size=65536)
             .groupby("value").aggregate(Sum("n", alias_name="n"))
             .take_all())
    hot = sorted(((r["value"], int(r["n"])) for r in exact
                  if r["n"] / n_rows >= hot_share),
                 key=lambda r: (-r[1], r[0]))
    max_share = (hot[0][1] / n_rows) if hot else 0.0
    nparts = nparts_for(n_rows)
    salt = max(1, math.ceil(max_share * nparts)) if hot else 1
    return {
        "n_rows": int(n_rows),
        "approx_distinct": distinct,
        "hot_keys": pa.table({
            "value": pa.array([v for v, _ in hot], pa.string()),
            "n": pa.array([c for _, c in hot], pa.int64()),
            "share": pa.array([round(c / n_rows, 4) for _, c in hot],
                              pa.float64())}),
        "max_share": round(max_share, 4),
        "recommended_salt": int(salt),
    }


def grouped_heavy_hitters(ds, group_col: str, value_col: str,
                          k: int = 16) -> pa.Table:
    """Heavy hitters PER GROUP in one sketch pass + one exact verify
    pass: "top URLs per domain", "top tokens per language" — the MG
    sibling of ``grouped_approx_distinct_hll`` with the same
    low-cardinality-group contract (state is n_groups x k counters in
    a broadcast-state aggregate; high-cardinality grouping belongs in
    a groupby shuffle instead).

    Like ``heavy_hitters``, the MG candidates are verified with ONE
    exact filtered count, so the output is EXACT for every item with
    in-group frequency > n_g/(k+1) (n_g = the group's row count,
    tracked in the same aggregate state) — the per-group MG bound.

    Returns pa.Table(<group_col>, value, n) sorted by group asc,
    n desc, value asc.  Values compare as strings (the heavy_hitters
    convention); NULL groups and NULL values are dropped.
    """
    import pyarrow.compute as pc

    from ray.data.aggregate import AggregateFn, Sum

    def acc_block(state: dict, blk: pa.Table) -> dict:
        blk = blk.filter(pc.and_(pc.is_valid(blk[group_col]),
                                 pc.is_valid(blk[value_col])))
        if blk.num_rows == 0:
            return state
        state = dict(state)
        vals = np.asarray([str(v) for v in blk[value_col].to_pylist()],
                          dtype=object)
        groups = np.asarray([str(g) for g in blk[group_col].to_pylist()],
                            dtype=object)
        order = np.argsort(groups, kind="stable")
        gs, starts = np.unique(groups[order], return_index=True)
        bounds = list(starts) + [len(order)]
        for gi, g in enumerate(gs):
            idx = order[bounds[gi]:bounds[gi + 1]]
            n_prev, mg_prev = state.get(g, (0, {}))
            state[g] = (n_prev + len(idx),
                        mg_merge(mg_prev, mg_sketch(vals[idx], k), k))
        return state

    def merge(s1: dict, s2: dict) -> dict:
        out = dict(s1)
        for g, (n, mg) in s2.items():
            n_prev, mg_prev = out.get(g, (0, {}))
            out[g] = (n_prev + n, mg_merge(mg_prev, mg, k))
        return out

    agg = AggregateFn(init=lambda _: {}, merge=merge,
                      accumulate_block=acc_block, name="gmg")
    state: dict = ds.aggregate(agg)["gmg"]
    if not state:
        return pa.table({group_col: pa.array([], pa.string()),
                         "value": pa.array([], pa.string()),
                         "n": pa.array([], pa.int64())})

    # exact verify: one filtered count over the candidate (group,
    # value) pairs — bounded by n_groups * k pairs.  Pairs pack with
    # a LENGTH PREFIX ("<len(g)>:<g><v>") — unambiguous for any
    # content, unlike a separator byte a group string could contain
    def _pack(g: str, v: str) -> str:
        return f"{len(g)}:{g}{v}"

    def _unpack(p: str) -> tuple[str, str]:
        i = p.index(":")
        m = int(p[:i])
        return p[i + 1:i + 1 + m], p[i + 1 + m:]

    cand = {_pack(g, v) for g, (_, mg) in state.items() for v in mg}
    cand_arr = pa.array(sorted(cand), pa.string())

    def count_pairs(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.and_(pc.is_valid(batch[group_col]),
                                     pc.is_valid(batch[value_col])))
        pair = pa.array(
            [_pack(g, v) for g, v in
             zip((str(x) for x in batch[group_col].to_pylist()),
                 (str(x) for x in batch[value_col].to_pylist()))],
            pa.string())
        kept = pc.filter(pair, pc.is_in(pair, value_set=cand_arr))
        out: dict = {}
        for p in kept.to_pylist():
            out[p] = out.get(p, 0) + 1
        return pa.table({"pair": pa.array(list(out), pa.string()),
                         "n": pa.array(list(out.values()), pa.int64())})

    exact = (ds.map_batches(count_pairs, batch_format="pyarrow",
                            batch_size=65536)
             .groupby("pair").aggregate(Sum("n", alias_name="n"))
             .take_all())
    rows = []
    for r in exact:
        g, v = _unpack(r["pair"])
        if r["n"] > state[g][0] // (k + 1):
            rows.append((g, v, r["n"]))
    rows.sort(key=lambda t: (t[0], -t[2], t[1]))
    return pa.table({group_col: pa.array([t[0] for t in rows],
                                         pa.string()),
                     "value": pa.array([t[1] for t in rows], pa.string()),
                     "n": pa.array([t[2] for t in rows], pa.int64())})


def weighted_sample(ds, key_col: str, weight_col: str, k: int,
                    seed: int = 17) -> pa.Table:
    """Weighted sampling WITHOUT replacement: k rows drawn with
    probability proportional to ``weight_col`` via the Gumbel-top-k
    trick — sample_key = ln(w) + Gumbel(md5(seed:key)), take the k
    largest (the exact scheme behind dsir_select, exposed generically).
    Deterministic and layout-independent: each row's key is a pure
    function of (seed, key value); ties cannot occur (distinct md5
    draws), so the sample is a pure function of the data.

    Rows with NULL or non-positive weight are never sampled (standard
    w=0 semantics).  Per block only the local top-k survives (global
    top-k is contained in the union of block top-ks — lossless), so
    the driver sees at most k x n_blocks candidate rows and folds
    them to k.  Returns pa.Table(<key_col>, weight float64,
    sample_key float64) sorted by sample_key desc.
    """
    import math

    from ray.data.aggregate import AggregateFn

    from .dsir import _gumbel   # ONE source of truth for the draw

    if k < 1:
        raise ValueError("k must be >= 1")

    def block_topk(state: list, blk: pa.Table) -> list:
        import pyarrow.compute as pc

        blk = blk.filter(pc.and_(pc.is_valid(blk[weight_col]),
                                 pc.greater(blk[weight_col],
                                            pa.scalar(0))))
        rows = state[:]
        for kv, w in zip(blk[key_col].to_pylist(),
                         blk[weight_col].to_pylist()):
            rows.append((math.log(w) + _gumbel(seed, kv), kv,
                         float(w)))
        rows.sort(key=lambda r: -r[0])
        return rows[:k]

    def merge(a: list, b: list) -> list:
        rows = a + b
        rows.sort(key=lambda r: -r[0])
        return rows[:k]

    agg = AggregateFn(init=lambda _: [], merge=merge,
                      accumulate_block=block_topk, name="wsample")
    rows = ds.aggregate(agg)["wsample"] or []
    return pa.table({
        key_col: pa.array([r[1] for r in rows]),
        "weight": pa.array([r[2] for r in rows], pa.float64()),
        "sample_key": pa.array([r[0] for r in rows], pa.float64()),
    })


def grouped_weighted_sample(ds, group_col: str, key_col: str,
                            weight_col: str, k: int,
                            seed: int = 17) -> pa.Table:
    """``weighted_sample`` PER GROUP: for each group, k keys drawn
    w.p. proportional to weight, without replacement (Gumbel-top-k
    with the shared dsir draw) — "the k best-weighted docs per
    source" as one streaming aggregate.  State is n_groups x k rows
    (the stratified_fixed_sample low-cardinality-group contract);
    NULL groups/weights and non-positive weights are skipped.

    Deterministic: each key's sample_key is a pure function of
    (seed, key value), so the per-group sample is independent of
    layout, merge order, and day.

    Returns pa.Table(<group_col>, <key_col> as string, weight,
    sample_key) sorted by (group asc, sample_key desc)."""
    import math

    from ray.data.aggregate import AggregateFn

    from .dsir import _gumbel

    if k < 1:
        raise ValueError("k must be >= 1")

    def acc_block(state: dict, blk: pa.Table) -> dict:
        import pyarrow.compute as pc

        blk = blk.filter(pc.and_(
            pc.is_valid(blk[group_col]),
            pc.and_(pc.is_valid(blk[weight_col]),
                    pc.greater(blk[weight_col], pa.scalar(0)))))
        if blk.num_rows == 0:
            return state
        state = dict(state)
        for g, kv, w in zip(blk[group_col].to_pylist(),
                            blk[key_col].to_pylist(),
                            blk[weight_col].to_pylist()):
            rows = list(state.get(g, ()))
            rows.append((math.log(w) + _gumbel(seed, kv), str(kv),
                         float(w)))
            rows.sort(key=lambda r: -r[0])
            state[g] = tuple(rows[:k])
        return state

    def merge(a: dict, b: dict) -> dict:
        out = dict(a)
        for g, rows in b.items():
            combined = list(out.get(g, ())) + list(rows)
            combined.sort(key=lambda r: -r[0])
            out[g] = tuple(combined[:k])
        return out

    agg = AggregateFn(init=lambda _: {}, merge=merge,
                      accumulate_block=acc_block, name="gws")
    state: dict = ds.aggregate(agg)["gws"] or {}
    gs, ks, ws, sk = [], [], [], []
    for g in sorted(state, key=str):
        for key_s, kv, w in state[g]:
            gs.append(g)
            ks.append(kv)
            ws.append(w)
            sk.append(key_s)
    return pa.table({group_col: pa.array(gs),
                     key_col: pa.array(ks, pa.string()),
                     "weight": pa.array(ws, pa.float64()),
                     "sample_key": pa.array(sk, pa.float64())})

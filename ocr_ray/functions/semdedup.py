"""SemDeDup — semantic deduplication via k-means clusters (Abbas et
al., 2023, arXiv:2303.09540).

Complements the LSH near-dup family (`dedup.embedding_dup_pairs`):
instead of hashing every vector into L independent bucket tables, the
corpus is k-means-clustered ONCE and duplicate pairs are searched only
within clusters by exact pairwise cosine.  Per the paper, each
duplicate component keeps the example with the LOWEST cosine similarity
to its cluster centroid (the most "atypical" member — preserves
diversity) and drops the rest.

Soft assignment (probe_r)
-------------------------
Hard nearest-centroid assignment misses every true pair that straddles
a cluster boundary — measured recall on the planted bench corpus was
0.40 with 16 clusters over 32-dim unit vectors (pairs at cos ~0.95 sit
~18 degrees apart; k-means boundaries cut right through that).  Each
vector therefore joins its ``probe_r`` nearest clusters BY CENTROID
COSINE for candidate generation (multi-probe, the IVF nprobe idea on
the build side); verification stays exact, duplicate discoveries of the
same pair collapse by a (vec_a, vec_b) groupby — exactly the LSH
family's L-table replication trade at replication ``probe_r``.
Measured on that corpus: recall 0.75 at probe_r=1 (cosine assignment
alone beats the L2 0.40), 0.975 at 2, 1.000 at 3 — hence the default.
Bench ``dedup_recall_semdedup`` records the measured recall; the residual
cross-cluster blind spot (pairs not co-located in ANY of the r probes)
is inherent to the method — use `embedding_dup_pairs` when ~0.99 global
recall is required.

Scale design
------------
* Centroids come from the shared IVF index build (`similarity.
  build_ivf_index`): Lloyd-refined over the full corpus as associative
  integer aggregates, cached on disk, shared with `knn_ivf`.
* One pruned (vec_id, embedding) scan emits the probe_r-replicated
  candidate rows; ONE groupby(bucket) co-locates each cluster's
  members.  Within-cluster work is bounded by probe_r * N /
  n_clusters; the paper scales n_clusters with the corpus (50k
  clusters at 100M+ points) precisely so this stays flat.  Clusters
  above `_ALL_PAIRS_CAP` fall back to the repo's hub-rehub sparse pair
  walk instead of an O(n^2) matrix — same contract as the LSH buckets.
* Components are `dedup.dedup_clusters` (join-based min-label + pointer
  jumping — needed because soft assignment lets a component's pairs
  surface in different buckets); keeper selection is ONE
  groupby(component).Min over a packed (quantized centroid cosine,
  vec_id) int64 key — no per-component tiny-group map_groups (the
  anti-pattern the round-4/5 asof and sessionize rewrites removed).

Keeper rule, exactly: min by (centroid cosine quantized to 2^-21,
vec_id) — the quantization makes the rule a pure function of the packed
key; ties (cosines within ~4.8e-7) break deterministically by vec_id.
vec_id must fit in 40 bits (10^12-doc headroom; guarded per batch).

Reference analog: none — this is one of the beyond-reference
training-data operators (SURVEY.md §2.7 extension family).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from .dedup import _ALL_PAIRS_CAP, _rehub_pairs, _with_schema, dedup_clusters
from ._part import compact_parts as _compact_parts
from .similarity import build_ivf_index

PAIR_SCHEMA = pa.schema([("vec_a", pa.int64()), ("vec_b", pa.int64()),
                         ("cosine", pa.float64()),
                         ("cluster", pa.int64())])
LOSER_SCHEMA = pa.schema([("vec_id", pa.int64()),
                          ("cluster", pa.int64()),
                          ("keeper", pa.int64())])

_COS_BITS = 22            # quantized centroid cosine: [0, 2^22]
_ID_BITS = 40             # vec_id headroom: 10^12 docs ~ 2^40


def _norm_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1)
    n[n == 0] = 1.0
    return m / n[:, None]


def _batch_mat(batch: pa.Table) -> np.ndarray:
    flat = batch["embedding"].combine_chunks()
    if isinstance(flat, pa.ChunkedArray):
        flat = pa.concat_arrays(flat.chunks)
    dim = len(flat[0])
    return flat.flatten().to_numpy(zero_copy_only=False) \
        .reshape(-1, dim).astype(np.float64)


def _candidate_rows(sf_dir: str, n_clusters: int, probe_r: int):
    """ONE pruned (vec_id, embedding) scan -> probe_r rows per vector:
    (bucket, vec_id, embedding, prim, qcos) where prim is the primary
    (nearest-by-cosine) cluster and qcos its quantized centroid cosine.
    Replication factor probe_r is the candidate-recall knob — the LSH
    L-table trade."""
    from ._io import clean_read

    _path, cent = build_ivf_index(sf_dir, n_clusters)
    cn = _norm_rows(cent)
    r = max(1, min(probe_r, len(cn)))

    schema = pa.schema([("bucket", pa.int64()), ("vec_id", pa.int64()),
                        ("embedding", pa.list_(pa.float64())),
                        ("prim", pa.int64()), ("qcos", pa.int64())])

    def expand(batch: pa.Table, cn=cn, r=r) -> pa.Table:
        m = _batch_mat(batch)
        n = len(m)
        if n == 0:
            return schema.empty_table()
        vids = batch["vec_id"].to_numpy(zero_copy_only=False)
        if vids.size and int(vids.max()) >= (1 << _ID_BITS):
            raise ValueError("vec_id exceeds the 40-bit keeper-key "
                             "headroom; widen _ID_BITS/_COS_BITS")
        cos = _norm_rows(m) @ cn.T                      # (n, k)
        # top-r by cosine: argpartition (O(k)) then order the r
        # survivors — full argsort would pay O(k log k) per row at the
        # paper's 50k-cluster scale
        if r < cos.shape[1]:
            cand = np.argpartition(-cos, r - 1, axis=1)[:, :r]
        else:
            cand = np.broadcast_to(np.arange(cos.shape[1]),
                                   cos.shape).copy()
        rows_ix = np.arange(n)[:, None]
        order = np.argsort(-cos[rows_ix, cand], axis=1, kind="stable")
        top = cand[rows_ix, order]
        prim = top[:, 0]
        qcos = np.floor((cos[np.arange(n), prim] + 1.0)
                        * (1 << (_COS_BITS - 1))).astype(np.int64)
        idx = np.repeat(np.arange(n), r)
        emb = batch["embedding"].combine_chunks().cast(
            pa.list_(pa.float64()))
        return pa.table({
            "bucket": pa.array(top.ravel(), pa.int64()),
            "vec_id": pa.array(vids[idx], pa.int64()),
            "embedding": emb.take(pa.array(idx)),
            "prim": pa.array(prim[idx], pa.int64()),
            "qcos": pa.array(qcos[idx], pa.int64()),
        })

    ds = clean_read(f"{sf_dir}/embeddings.parquet",
                    columns=["vec_id", "embedding"])
    return ds.map_batches(expand, batch_format="pyarrow")


def _cluster_pairs(ids: np.ndarray, mn: np.ndarray,
                   thr: float) -> list[tuple[int, int, float]]:
    """Exact cosine pairs >= thr inside one bucket (local indices
    mapped to sorted vec_ids).  All-pairs up to the repo-wide cap,
    hub-rehub above it — identical contract to the LSH bucket kernels.
    Cosines round to 1e-4 like the LSH family so both pair sources
    agree byte-for-byte on shared pairs."""
    n = len(ids)
    rows: list[tuple[int, int, float]] = []
    if n <= _ALL_PAIRS_CAP:
        cos = mn @ mn.T
        for i in range(n):
            row = cos[i]
            for j in range(i + 1, n):
                c = float(row[j])
                if c >= thr:
                    rows.append((int(ids[i]), int(ids[j]),
                                 float(np.floor(c * 1e4 + 0.5) / 1e4)))
    else:
        def ok_fn(hub, rest):
            cos = mn[rest] @ mn[hub]
            return cos >= thr, cos
        rows = [(int(x), int(y),
                 float(np.floor(float(c) * 1e4 + 0.5) / 1e4))
                for x, y, c in _rehub_pairs(ids, ok_fn)]
    return rows


def semantic_dedup_pairs(sf_dir: str, cosine_threshold: float = 0.95,
                         n_clusters: int = 16, probe_r: int = 3):
    """Within-cluster duplicate pairs: Dataset[vec_a, vec_b, cosine,
    cluster] with vec_a < vec_b, exact cosine, one row per pair
    (discoveries in multiple probed buckets collapse by groupby;
    ``cluster`` is the smallest bucket the pair co-located in)."""
    import ray.data as rd
    from ray.data.aggregate import Max, Min

    feats = _candidate_rows(sf_dir, n_clusters, probe_r)

    def kernel(group: pa.Table, thr=cosine_threshold) -> pa.Table:
        # each vector appears at most once per bucket (its top-r bucket
        # ids are distinct), so ids within a group are unique
        ids_raw = np.asarray(group["vec_id"].to_pylist(), dtype=np.int64)
        order = np.argsort(ids_raw)
        ids = ids_raw[order]
        embs = group["embedding"].to_pylist()
        mn = _norm_rows(np.asarray([embs[i] for i in order],
                                   dtype=np.float64))
        cl = int(group["bucket"][0].as_py())
        rows = [{"vec_a": a, "vec_b": b, "cosine": c, "cluster": cl}
                for a, b, c in _cluster_pairs(ids, mn, thr)]
        return pa.Table.from_pylist(rows, schema=PAIR_SCHEMA)

    raw = (feats.groupby("bucket")
           .map_groups(kernel, batch_format="pyarrow")
           .map_batches(_with_schema(PAIR_SCHEMA), batch_format="pyarrow")
           .materialize())
    n_raw = raw.count()
    if n_raw == 0:
        return rd.from_arrow(PAIR_SCHEMA.empty_table())
    return (raw.repartition(_compact_parts(n_raw))
            .groupby(["vec_a", "vec_b"])
            .aggregate(Max("cosine", alias_name="cosine"),
                       Min("cluster", alias_name="cluster")))


def semantic_dedup_losers(sf_dir: str, cosine_threshold: float = 0.95,
                          n_clusters: int = 16, probe_r: int = 3):
    """Vectors SemDeDup drops: for each duplicate component, every
    member except the keeper (lowest centroid cosine, see module
    docstring for the exact quantized rule).  Returns
    Dataset[vec_id, cluster, keeper] where ``cluster`` is the vector's
    primary k-means cluster."""
    import ray.data as rd
    from ray.data.aggregate import Min

    pairs = semantic_dedup_pairs(sf_dir, cosine_threshold, n_clusters,
                                 probe_r)
    edge_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64())])

    def to_edges(batch: pa.Table) -> pa.Table:
        return pa.table({"doc_a": batch["vec_a"], "doc_b": batch["vec_b"]})

    comps = dedup_clusters(
        pairs.map_batches(to_edges, batch_format="pyarrow")
        .map_batches(_with_schema(edge_schema), batch_format="pyarrow"))
    n_members = comps.count()
    if n_members == 0:
        return rd.from_arrow(LOSER_SCHEMA.empty_table())
    comps = comps.repartition(_compact_parts(n_members)).materialize()

    # member metadata rides the primary-assignment slice of the SAME
    # candidate scan: (vec_id, prim, packed keeper key)
    meta_schema = pa.schema([("vec_id", pa.int64()), ("prim", pa.int64()),
                             ("kkey", pa.int64())])

    def prim_meta(batch: pa.Table) -> pa.Table:
        keep = pa.compute.equal(batch["bucket"], batch["prim"])
        b = batch.filter(keep)
        kkey = pa.compute.add(
            pa.compute.multiply(b["qcos"],
                                pa.scalar(1 << _ID_BITS, pa.int64())),
            b["vec_id"])
        return pa.table({"vec_id": b["vec_id"], "prim": b["prim"],
                         "kkey": kkey})

    meta = (_candidate_rows(sf_dir, n_clusters, probe_r)
            .drop_columns(["embedding"])
            .map_batches(prim_meta, batch_format="pyarrow")
            .map_batches(_with_schema(meta_schema), batch_format="pyarrow"))

    nparts = max(2, _compact_parts(n_members))
    # join hygiene (the dedup_clusters discipline): enforce schema and
    # compact away the schema-LESS empty blocks aggregate/join stages
    # emit — they break Acero's key resolution nondeterministically at
    # higher partition counts
    member_schema = pa.schema([("doc_id", pa.int64()),
                               ("cluster_id", pa.int64()),
                               ("prim", pa.int64()),
                               ("kkey", pa.int64())])

    def member_cols(batch: pa.Table) -> pa.Table:
        return pa.table({n: batch[n] for n in member_schema.names})

    members = (comps.join(meta, "inner", num_partitions=nparts,
                          on=("doc_id",), right_on=("vec_id",))
               .map_batches(member_cols, batch_format="pyarrow")
               .map_batches(_with_schema(member_schema),
                            batch_format="pyarrow")
               .repartition(nparts).materialize())

    keeper_schema = pa.schema([("cluster_id", pa.int64()),
                               ("kmin", pa.int64())])
    keepers = (members.select_columns(["cluster_id", "kkey"])
               .groupby("cluster_id")
               .aggregate(Min("kkey", alias_name="kmin"))
               .map_batches(_with_schema(keeper_schema),
                            batch_format="pyarrow")
               .repartition(nparts).materialize())

    joined = members.join(keepers, "inner", num_partitions=nparts,
                          on=("cluster_id",))

    def losers_batch(batch: pa.Table) -> pa.Table:
        keeper = pa.compute.bit_wise_and(
            batch["kmin"], pa.scalar((1 << _ID_BITS) - 1, pa.int64()))
        keep = pa.compute.not_equal(batch["doc_id"], keeper)
        t = batch.append_column("keeper", keeper).filter(keep)
        return pa.table({"vec_id": t["doc_id"], "cluster": t["prim"],
                         "keeper": t["keeper"]})

    out = (joined.map_batches(losers_batch, batch_format="pyarrow")
           .map_batches(_with_schema(LOSER_SCHEMA), batch_format="pyarrow")
           .materialize())
    n_out = out.count()
    if n_out == 0:
        return rd.from_arrow(LOSER_SCHEMA.empty_table())
    return out.repartition(_compact_parts(n_out))


def semantic_dedup_survivors(sf_dir: str, cosine_threshold: float = 0.95,
                             n_clusters: int = 16, probe_r: int = 3):
    """The deduplicated corpus: embeddings LEFT ANTI losers — same
    hash-partitioned anti-join discipline as `dedup.dedup_survivors`
    (no driver-side id set)."""
    from ._io import clean_read

    losers = semantic_dedup_losers(sf_dir, cosine_threshold, n_clusters,
                                   probe_r).select_columns(["vec_id"])
    corpus = clean_read(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "label"])
    n_l = losers.count()
    if n_l == 0:
        return corpus
    return corpus.join(losers, "left_anti",
                       num_partitions=max(2, _compact_parts(n_l)),
                       on=("vec_id",))

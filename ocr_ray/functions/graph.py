"""Approximate all-pairs kNN graph over the ``embeddings`` table.

``knn_graph(sf_dir, k)`` -> Dataset[src, dst, cosine]: for EVERY vector,
its k nearest neighbors by cosine — the graph-construction primitive
behind semantic clustering, diversity sampling and graph-based dedup.
Neighbor SETS are approximate (IVF-bucketed candidates), cosines are
exact (``np_round_half_up(.., 6)``, the knn family's formula).

Composition — every stage is existing machinery:

* **candidate expansion**: semdedup's soft assignment — ONE pruned
  (vec_id, embedding) scan replicating each vector to its ``probe_r``
  nearest IVF buckets by centroid cosine;
* **bucket co-scan**: ONE groupby(bucket); inside a bucket the QUERY
  side is every replicated row and the DATABASE side is the rows whose
  PRIMARY bucket is this one.  Each vector is database-side in exactly
  one bucket, so a true edge is discovered at most ``probe_r`` times
  and duplicate discoveries collapse in the merge.  Query-side memory
  is bounded by 1024-row query slices against the bucket matrix;
* **per-source merge** without tiny groups: hash(src) % P partitions
  (P sized to the data), per partition one lexsort for the
  (src, dst) duplicate collapse (keeping the max cosine,
  deterministic) and one for the segmented first-k take — the
  asof/sessionize kernel shape, no per-source Python.

``probe_r = n_clusters`` makes the graph EXACT (every query scores
every database row) — the test oracle.  At scale the cost is
O(N * avg_bucket * probe_r) instead of O(N^2); grow ``n_clusters``
with the corpus so buckets stay block-sized (the SemDeDup contract).

Reference analog: vector_searcher.py answers one query at a time; the
graph is the all-queries version a training-data pipeline needs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ._num import np_round_half_up
from ._part import compact_parts as _compact
from ._part import nparts_for
from .dedup import _with_schema
from .semdedup import _candidate_rows, _norm_rows

_GRAPH_SCHEMA = pa.schema([("src", pa.int64()), ("dst", pa.int64()),
                           ("cosine", pa.float64())])


def knn_graph(sf_dir: str, k: int = 5, n_clusters: int = 16,
              probe_r: int = 4, replicate_db: bool = True):
    """Approximate kNN graph; see module docstring.  Rows-only oracle
    (approximate by design); recall vs the exact graph is reported by
    bench.py (``knn_graph_recall``) and pinned exact in tests at
    ``probe_r = n_clusters``.

    ``replicate_db=True`` (default) scores queries against EVERY row
    replicated into the bucket, so an edge is found whenever the two
    vectors co-locate in ANY shared bucket (semdedup's discovery
    contract) — planted-pair mutual-top-1 recall 1.0 at probe_r=4 vs
    0.975 with primary-only.  ``False`` keeps the database side to
    rows whose PRIMARY bucket is this one — probe_r x less bucket
    compute, for corpora whose cluster structure makes the primary
    bucket a reliable home (a directed edge then needs src to probe
    dst's primary bucket)."""
    import pyarrow.parquet as pqt
    import ray.data as rd

    feats = _candidate_rows(sf_dir, n_clusters, probe_r)

    def bucket_kernel(group: pa.Table, k=k) -> pa.Table:
        ids = np.asarray(group["vec_id"].to_pylist(), dtype=np.int64)
        prim = np.asarray(group["prim"].to_pylist(), dtype=np.int64)
        bucket = int(group["bucket"][0].as_py())
        mn = _norm_rows(np.asarray(group["embedding"].to_pylist(),
                                   dtype=np.float64))
        db = np.ones(len(ids), bool) if replicate_db \
            else (prim == bucket)
        db_ids, dbn = ids[db], mn[db]
        if len(db_ids) == 0:
            return _GRAPH_SCHEMA.empty_table()
        srcs, dsts, coss = [], [], []
        for s in range(0, len(ids), 1024):
            q, qid = mn[s:s + 1024], ids[s:s + 1024]
            cos = q @ dbn.T
            cos[qid[:, None] == db_ids[None, :]] = -2.0  # no self edges
            kk = min(k, cos.shape[1])
            if kk < cos.shape[1]:
                cand = np.argpartition(-cos, kk - 1, axis=1)[:, :kk]
            else:
                cand = np.broadcast_to(np.arange(cos.shape[1]),
                                       (len(q), cos.shape[1])).copy()
            c = cos[np.arange(len(q))[:, None], cand]
            valid = (c > -1.5).ravel()   # drops the masked self slots
            srcs.append(np.repeat(qid, cand.shape[1])[valid])
            dsts.append(db_ids[cand.ravel()][valid])
            coss.append(c.ravel()[valid])
        if not srcs:
            return _GRAPH_SCHEMA.empty_table()
        return pa.table({
            "src": pa.array(np.concatenate(srcs), pa.int64()),
            "dst": pa.array(np.concatenate(dsts), pa.int64()),
            "cosine": pa.array(
                np_round_half_up(np.concatenate(coss), 6), pa.float64()),
        })

    n_rows = pqt.ParquetFile(
        f"{sf_dir}/embeddings.parquet").metadata.num_rows
    n_parts = nparts_for(n_rows * probe_r * k, rows_per_part=500_000,
                         floor=4)

    def tag(batch: pa.Table, n_parts=n_parts) -> pa.Table:
        src = batch["src"].to_numpy(zero_copy_only=False)
        mix = src.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
        part = ((mix >> np.uint64(33)) % np.uint64(n_parts)) \
            .astype(np.int64)
        return batch.append_column("part", pa.array(part, pa.int64()))

    def merge_part(part: pa.Table, k=k) -> pa.Table:
        src = part["src"].to_numpy(zero_copy_only=False)
        dst = part["dst"].to_numpy(zero_copy_only=False)
        cos = part["cosine"].to_numpy(zero_copy_only=False)
        if len(src) == 0:
            return _GRAPH_SCHEMA.empty_table()
        # duplicate collapse: sort (src, dst, -cos), keep first per
        # (src, dst) — keeps the max cosine, deterministic even if two
        # bucket discoveries differ in the last ulp before rounding
        order = np.lexsort((-cos, dst, src))
        src, dst, cos = src[order], dst[order], cos[order]
        keep = np.ones(len(src), bool)
        keep[1:] = (src[1:] != src[:-1]) | (dst[1:] != dst[:-1])
        src, dst, cos = src[keep], dst[keep], cos[keep]
        # segmented first-k by (cosine desc, dst asc) within each src
        order = np.lexsort((dst, -cos, src))
        src, dst, cos = src[order], dst[order], cos[order]
        new = np.empty(len(src), bool)
        new[0] = True
        new[1:] = src[1:] != src[:-1]
        starts = np.flatnonzero(new)
        reps = np.diff(np.append(starts, len(src)))
        pos = np.arange(len(src)) - np.repeat(starts, reps)
        sel = pos < k
        return pa.table({
            "src": pa.array(src[sel], pa.int64()),
            "dst": pa.array(dst[sel], pa.int64()),
            "cosine": pa.array(cos[sel], pa.float64()),
        })

    return (feats.groupby("bucket")
            .map_groups(bucket_kernel, batch_format="pyarrow")
            .map_batches(tag, batch_format="pyarrow")
            .groupby("part")
            .map_groups(merge_part, batch_format="pyarrow"))


def exact_knn_graph_local(sf_dir: str, k: int = 5) -> set:
    """Driver-side brute-force truth for recall measurement (test/bench
    only — O(N^2) memory, never a pipeline stage)."""
    import pyarrow.parquet as pqt

    tbl = pqt.read_table(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])
    ids = np.asarray(tbl["vec_id"].to_numpy(zero_copy_only=False))
    mn = _norm_rows(np.asarray(tbl["embedding"].to_pylist(),
                               dtype=np.float64))
    cos = np_round_half_up(mn @ mn.T, 6)
    np.fill_diagonal(cos, -2.0)
    edges = set()
    for i in range(len(ids)):
        row = cos[i]
        kk = min(k, len(ids) - 1)
        order = np.lexsort((ids, -row))[:kk]
        for j in order:
            edges.add((int(ids[i]), int(ids[j])))
    return edges


def mutual_knn_graph(sf_dir: str, k: int = 5, n_clusters: int = 16,
                     probe_r: int = 4, replicate_db: bool = True):
    """Symmetric (mutual) kNN graph: an undirected edge survives iff
    BOTH directions exist in the kNN graph — i is in j's top-k AND j
    is in i's top-k.  The standard robustification for graph
    clustering and density estimation: hub vectors lose their
    spurious one-way edges.

    ONE groupby over canonicalized pairs: each directed edge maps to
    (doc_a=min, doc_b=max, 1); knn_graph emits each direction at most
    once, so a direction-count of 2 IS mutuality.  Returns
    Dataset[doc_a, doc_b, cosine] with doc_a < doc_b."""
    from ray.data.aggregate import Max, Sum

    edges = knn_graph(sf_dir, k, n_clusters, probe_r, replicate_db)

    def canon(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_a": pa.array(np.minimum(src, dst), pa.int64()),
            "doc_b": pa.array(np.maximum(src, dst), pa.int64()),
            "cosine": batch["cosine"],
            "n": pa.array(np.ones(len(src), np.int64), pa.int64())})

    agg = (edges.map_batches(canon, batch_format="pyarrow")
           .groupby(["doc_a", "doc_b"])
           .aggregate(Sum("n", alias_name="n_dir"),
                      Max("cosine", alias_name="cosine")))
    return (agg.filter(expr="n_dir >= 2")
            .select_columns(["doc_a", "doc_b", "cosine"]))


def semantic_communities(sf_dir: str, k: int = 5,
                         min_cosine: float = 0.2,
                         n_clusters: int = 16, probe_r: int = 4):
    """Corpus clustering: connected components of the MUTUAL kNN graph
    restricted to edges at or above ``min_cosine`` — the standard
    mutual-kNN community construction (one-way hub edges removed, weak
    edges thresholded, then components).  Distinct from SemDeDup:
    communities group RELATED vectors at moderate similarity, not
    near-duplicates at 0.95.

    Composition: mutual_knn_graph -> cosine threshold filter ->
    ``dedup_clusters`` (join-based min-label + pointer jumping).
    Returns Dataset[vec_id, community] covering every vector that has
    at least one qualifying mutual edge; singletons are implicitly
    their own community (absent from the table, same contract as
    dedup_clusters)."""
    from .dedup import dedup_clusters

    edges = (mutual_knn_graph(sf_dir, k, n_clusters, probe_r)
             .filter(expr=f"cosine >= {float(min_cosine)}"))
    out = dedup_clusters(edges)
    return out.rename_columns({"doc_id": "vec_id",
                               "cluster_id": "community"})


RANK_SCALE = 10 ** 12          # fixed-point rank units (total mass)


def pagerank(edges, damping_pct: int = 85, n_iter: int = 10,
             num_partitions: int | None = None):
    """Distributed PageRank over a directed edge Dataset[src, dst] —
    the canonical "which nodes matter" graph analytic (Page et al.
    1999; the power-iteration formulation every engine ships).

    Scale design: per iteration exactly TWO exchanges — a hash join of
    the rank table to the edges on src, and a groupby(dst) sum of the
    contributions — both over Datasets, never a driver-side adjacency
    structure; the only driver scalars are N (node count) and the
    dangling mass D (one tiny aggregate per iteration, O(1) state).
    The edge list is materialized ONCE and reused across iterations
    (re-reading/vrecomputing the upstream per iteration would multiply
    input IO by n_iter).

    Determinism discipline: ranks are int64 fixed-point (RANK_SCALE =
    total mass), per-edge contribution = rank // outdeg, and every
    merge is exact integer addition — bit-identical across block
    layouts and Ray's merge order, unlike float accumulation.  The
    floor drops < outdeg ulps of mass per node per iteration
    (bounded drift vs the float reference; the tests pin < 1e-6
    relative).

    damping_pct is the damping factor as an integer percent (85 =
    0.85) so the update rule stays in integer arithmetic throughout.

    Returns Dataset[node, rank] (rank = float share summing to ~1).
    """
    from ray.data.aggregate import Sum

    from ._num import round_half_up as _rhu

    d_num, d_den = int(damping_pct), 100

    # ---- static structure: nodes, outdegree (ONE pass over edges)
    def node_partial(batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        nodes = np.concatenate([src, dst])
        deg = np.concatenate([np.ones(len(src), np.int64),
                              np.zeros(len(dst), np.int64)])
        t = pa.table({"node": pa.array(nodes, pa.int64()),
                      "outdeg": pa.array(deg, pa.int64())})
        g = t.group_by("node").aggregate([("outdeg", "sum")])
        return pa.table({"node": g["node"], "outdeg": g["outdeg_sum"]})

    edges = edges.materialize()
    n_edges = edges.count()
    if n_edges == 0:
        import ray.data as _rd
        return _rd.from_arrow(pa.table(
            {"node": pa.array([], pa.int64()),
             "rank": pa.array([], pa.float64())}))
    # join hygiene (dedup_clusters discipline): groupby aggregates emit
    # schema-LESS empty blocks that break Acero key resolution, and
    # map_batches passes them through WITHOUT calling the UDF — the
    # only real fix is a row-bounded compact repartition that merges
    # the empties away.  Applied to EVERY join input below.
    edges = edges.repartition(_compact(n_edges)).materialize()
    nodes = edges.map_batches(node_partial, batch_format="pyarrow") \
        .groupby("node").aggregate(Sum("outdeg", alias_name="outdeg")) \
        .materialize()
    n_nodes = nodes.count()
    nodes = nodes.repartition(_compact(n_nodes)).materialize()
    nparts = num_partitions or nparts_for(n_edges,
                                          rows_per_part=500_000, floor=8)
    r0 = RANK_SCALE // n_nodes

    def init_rank(batch: pa.Table) -> pa.Table:
        return pa.table({
            "node": batch["node"],
            "outdeg": batch["outdeg"],
            "rank_i": pa.array(np.full(len(batch), r0, np.int64),
                               pa.int64())})

    ranks = nodes.map_batches(init_rank, batch_format="pyarrow") \
        .materialize()

    for _ in range(n_iter):
        # dangling mass: one tiny aggregate -> driver scalar
        def dang_partial(batch: pa.Table) -> pa.Table:
            deg = batch["outdeg"].to_numpy(zero_copy_only=False)
            r = batch["rank_i"].to_numpy(zero_copy_only=False)
            return pa.table({"d": pa.array(
                [int(r[deg == 0].sum())], pa.int64())})

        dang = ranks.map_batches(dang_partial, batch_format="pyarrow") \
            .aggregate(Sum("d", alias_name="d"))["d"] or 0

        contrib_src = edges.join(
            ranks.select_columns(["node", "outdeg", "rank_i"]),
            join_type="inner", num_partitions=nparts,
            on=("src",), right_on=("node",))

        def contrib(batch: pa.Table) -> pa.Table:
            r = batch["rank_i"].to_numpy(zero_copy_only=False)
            deg = batch["outdeg"].to_numpy(zero_copy_only=False)
            t = pa.table({
                "node": batch["dst"],
                "c": pa.array(r // np.maximum(deg, 1), pa.int64())})
            g = t.group_by("node").aggregate([("c", "sum")])
            return pa.table({"node": g["node"], "c": g["c_sum"]})

        # in_sums is non-empty whenever edges exist (every edge's src
        # is a node, so the inner join always matches) — the compact
        # repartition below is therefore always row-backed.
        in_schema = pa.schema([("node", pa.int64()), ("c", pa.int64())])
        in_sums = contrib_src.map_batches(contrib,
                                          batch_format="pyarrow") \
            .groupby("node").aggregate(Sum("c", alias_name="c")) \
            .map_batches(_with_schema(in_schema),
                         batch_format="pyarrow") \
            .materialize()
        in_sums = in_sums.repartition(_compact(in_sums.count())) \
            .materialize()

        base = ((d_den - d_num) * RANK_SCALE) // (d_den * n_nodes)
        share = dang // n_nodes

        joined = nodes.join(in_sums, join_type="left_outer",
                            num_partitions=nparts, on=("node",))

        def update(batch: pa.Table, base=base, share=share) -> pa.Table:
            import pyarrow.compute as pc
            c = pc.fill_null(batch["c"], 0).to_numpy(
                zero_copy_only=False)
            new = base + (d_num * (c + share)) // d_den
            return pa.table({
                "node": batch["node"],
                "outdeg": batch["outdeg"],
                "rank_i": pa.array(new, pa.int64())})

        # the join's empty partitions emit schema-less blocks too —
        # compact to exactly-n_nodes-backed blocks before the next
        # iteration's join reads this as its right side
        ranks = joined.map_batches(update, batch_format="pyarrow") \
            .repartition(_compact(n_nodes)).materialize()

    def finalize(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc
        return pa.table({
            "node": batch["node"],
            "rank": _rhu(pc.divide(pc.cast(batch["rank_i"],
                                           pa.float64()),
                                   pa.scalar(float(RANK_SCALE))), 9),
        })

    return ranks.map_batches(finalize, batch_format="pyarrow")


def document_pagerank(sf_dir: str, k: int = 5, n_clusters: int = 16,
                      probe_r: int = 4, n_iter: int = 10):
    """PageRank centrality over the semantic mutual-kNN graph: which
    vectors sit at the center of the corpus's similarity structure —
    the selection signal for centrality-weighted sampling (pick
    representative docs) or its inverse (drop redundant hubs).

    The mutual graph is undirected; each surviving pair feeds BOTH
    directions so the random walk is symmetric."""
    mut = mutual_knn_graph(sf_dir, k, n_clusters, probe_r)

    def both_dirs(batch: pa.Table) -> pa.Table:
        a = batch["doc_a"].to_numpy(zero_copy_only=False)
        b = batch["doc_b"].to_numpy(zero_copy_only=False)
        return pa.table({
            "src": pa.array(np.concatenate([a, b]), pa.int64()),
            "dst": pa.array(np.concatenate([b, a]), pa.int64())})

    return pagerank(mut.map_batches(both_dirs, batch_format="pyarrow"),
                    n_iter=n_iter)


def connected_components(edges, src: str = "src", dst: str = "dst",
                         max_rounds: int = 20):
    """Generic connected components over an int64 edge list — the
    dedup-cluster kernel (join-based min-label propagation + pointer
    jumping, O(log diameter) rounds, no driver label map) exposed as a
    graph API.

    ``edges``: Dataset or pa.Table with two int64 endpoint columns.
    Returns Dataset[node_id, component_id] covering every edge-touched
    node; component_id = the component's min node id.  Isolated nodes
    (never on an edge) are absent by construction — union them in with
    component_id = node_id if needed."""
    import pyarrow as _pa
    import ray.data as rd

    from .dedup import dedup_clusters

    if isinstance(edges, _pa.Table):
        edges = rd.from_arrow(edges)
    pairs = edges.select_columns([src, dst]).rename_columns(
        {src: "doc_a", dst: "doc_b"})
    return (dedup_clusters(pairs, max_rounds=max_rounds)
            .rename_columns({"doc_id": "node_id",
                             "cluster_id": "component_id"}))

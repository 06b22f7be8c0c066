"""Near-duplicate detection family (training-data pipeline ops).

* ``minhash_lsh_pairs``  — shingle -> minhash -> band -> bucket groupby ->
  candidate pairs -> exact-Jaccard verify.  The LSH banding is the scale
  trick: only docs sharing a (band_id, band_hash) bucket ever meet, so
  the all-to-all is on tiny (band, hash, doc_id) rows, never on text.
* ``simhash_pairs``      — 64-bit simhash, 4x16-bit bands (any doc pair
  within Hamming distance 3 shares >= 1 exact band), verify Hamming.
* ``embedding_dup_pairs`` — random-hyperplane LSH signatures over the
  embedding column, bucket groupby, cosine verify.

All deterministic (hash-seeded, no RNG state).  Verification joins the
candidate doc_ids back to their features via a broadcast map — fine while
features-of-candidates fit in memory; at 100 TB the same verify becomes a
hash-partitioned join on doc_id (documented here as the scale path).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import pyarrow as pa

_TOKEN_RE = re.compile(r"\w+")

_MERSENNE = (1 << 61) - 1
_N_PERM = 32
_BANDS = 8          # 8 bands x 4 rows
_ROWS_PER_BAND = _N_PERM // _BANDS


def _perm_params(n_perm: int = _N_PERM) -> tuple[np.ndarray, np.ndarray]:
    """Deterministic universal-hash parameters a*x+b mod p."""
    a, b = [], []
    for i in range(n_perm):
        da = hashlib.sha256(f"minhash-a:{i}".encode()).digest()
        db = hashlib.sha256(f"minhash-b:{i}".encode()).digest()
        a.append(int.from_bytes(da[:8], "big") % _MERSENNE or 1)
        b.append(int.from_bytes(db[:8], "big") % _MERSENNE)
    return np.array(a, dtype=np.uint64), np.array(b, dtype=np.uint64)


def _shingles(text: str, k: int = 3) -> np.ndarray:
    """Hashed word k-gram shingle set (uint64)."""
    toks = _TOKEN_RE.findall(text.lower())
    if len(toks) < k:
        grams = [" ".join(toks)] if toks else []
    else:
        grams = [" ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)]
    out = {int.from_bytes(hashlib.blake2b(g.encode(), digest_size=8).digest(),
                          "big") >> 3
           for g in grams}
    return np.fromiter(out, dtype=np.uint64, count=len(out))


def _minhash(shingles: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    if len(shingles) == 0:
        return np.full(len(a), np.iinfo(np.uint64).max, dtype=np.uint64)
    # (n_perm, n_shingles) via broadcasting, mod Mersenne prime
    x = shingles.astype(np.uint64)[None, :]
    hashed = (a[:, None] * x + b[:, None]) % np.uint64(_MERSENNE)
    return hashed.min(axis=1)


def _band_rows(doc_id, sig: np.ndarray) -> list[dict]:
    rows = []
    for band in range(_BANDS):
        chunk = sig[band * _ROWS_PER_BAND:(band + 1) * _ROWS_PER_BAND]
        h = hashlib.blake2b(chunk.tobytes(), digest_size=8).hexdigest()
        rows.append({"band_id": band, "band_hash": h, "doc_id": doc_id})
    return rows


def minhash_lsh_pairs(sf_dir: str, jaccard_threshold: float = 0.8):
    """Near-dup pairs over documents.text with exact-Jaccard verification.

    Stages: (1) map: shingle+minhash+band rows; (2) groupby(band_id,
    band_hash): emit candidate pairs; (3) dedup pairs via groupby;
    (4) verify: exact Jaccard on shingle sets (broadcast feature map).
    Returns Dataset[doc_a, doc_b, jaccard] (doc_a < doc_b), rounded 4.
    """
    import ray
    import ray.data as rd
    import pyarrow.parquet as pq

    a, b = _perm_params()

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def to_bands(batch: pa.Table, a=a, b=b) -> pa.Table:
        rows = []
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            rows.extend(_band_rows(doc_id, _minhash(_shingles(text), a, b)))
        return pa.Table.from_pylist(rows, schema=pa.schema([
            ("band_id", pa.int64()), ("band_hash", pa.string()),
            ("doc_id", pa.int64())]))

    bands = ds.map_batches(to_bands, batch_format="pyarrow", batch_size=1024)

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = sorted(group["doc_id"].to_pylist())
        # STAR pairs (min-id hub -> member), not all-pairs: a hot bucket of
        # n identical docs would otherwise emit O(n^2) rows in one task and
        # OOM the worker. Star edges are enough to link every member to a
        # survivor (connected components still form through the hub).
        pairs = [{"doc_a": ids[0], "doc_b": y} for y in ids[1:]]
        return pa.Table.from_pylist(pairs, schema=pa.schema([
            ("doc_a", pa.int64()), ("doc_b", pa.int64())]))

    candidates = (bands.groupby(["band_id", "band_hash"])
                  .map_groups(bucket_pairs, batch_format="pyarrow"))

    # dedup identical pairs surfaced by multiple bands
    from ray.data.aggregate import Count

    uniq = candidates.groupby(["doc_a", "doc_b"]).aggregate(
        Count(alias_name="n_bands"))

    # broadcast the shingle sets of ALL docs for the verify step (fine at
    # this scale; scale path = hash-partitioned join on doc_id)
    tbl = pq.read_table(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"])
    feat = {d: _shingles(t) for d, t in zip(tbl["doc_id"].to_pylist(),
                                            tbl["text"].to_pylist())}
    feat_ref = ray.put(feat)

    def verify(batch: pa.Table, thr=jaccard_threshold) -> pa.Table:
        f = ray.get(feat_ref)
        out = []
        for pa_, pb_ in zip(batch["doc_a"].to_pylist(),
                            batch["doc_b"].to_pylist()):
            sa, sb = set(f[pa_].tolist()), set(f[pb_].tolist())
            union = len(sa | sb)
            j = len(sa & sb) / union if union else 0.0
            if j >= thr:
                out.append({"doc_a": pa_, "doc_b": pb_,
                            "jaccard": np.floor(j * 1e4 + 0.5) / 1e4})
        return pa.Table.from_pylist(out, schema=pa.schema([
            ("doc_a", pa.int64()), ("doc_b", pa.int64()),
            ("jaccard", pa.float64())]))

    return uniq.map_batches(verify, batch_format="pyarrow")


def _simhash(text: str) -> int:
    toks = _TOKEN_RE.findall(text.lower())
    acc = np.zeros(64, dtype=np.int64)
    for t in toks:
        h = int.from_bytes(
            hashlib.blake2b(t.encode(), digest_size=8).digest(), "big")
        bits = np.fromiter(((h >> i) & 1 for i in range(64)), dtype=np.int64,
                           count=64)
        acc += bits * 2 - 1
    sig = 0
    for i in range(64):
        if acc[i] > 0:
            sig |= 1 << i
    return sig


def simhash_pairs(sf_dir: str, max_hamming: int = 3):
    """SimHash near-dup pairs: 4x16-bit band buckets guarantee recall for
    Hamming distance <= 3; exact Hamming verify on candidates."""
    import ray
    import ray.data as rd
    import pyarrow.parquet as pq

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def to_bands(batch: pa.Table) -> pa.Table:
        rows = []
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            sig = _simhash(text)
            for band in range(4):
                rows.append({"band_id": band,
                             "band_val": (sig >> (band * 16)) & 0xFFFF,
                             "doc_id": doc_id})
        return pa.Table.from_pylist(rows, schema=pa.schema([
            ("band_id", pa.int64()), ("band_val", pa.int64()),
            ("doc_id", pa.int64())]))

    bands = ds.map_batches(to_bands, batch_format="pyarrow", batch_size=1024)

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = sorted(group["doc_id"].to_pylist())
        # STAR pairs (min-id hub -> member), not all-pairs: a hot bucket of
        # n identical docs would otherwise emit O(n^2) rows in one task and
        # OOM the worker. Star edges are enough to link every member to a
        # survivor (connected components still form through the hub).
        pairs = [{"doc_a": ids[0], "doc_b": y} for y in ids[1:]]
        return pa.Table.from_pylist(pairs, schema=pa.schema([
            ("doc_a", pa.int64()), ("doc_b", pa.int64())]))

    from ray.data.aggregate import Count

    uniq = (bands.groupby(["band_id", "band_val"])
            .map_groups(bucket_pairs, batch_format="pyarrow")
            .groupby(["doc_a", "doc_b"]).aggregate(Count(alias_name="nb")))

    tbl = pq.read_table(f"{sf_dir}/documents.parquet",
                        columns=["doc_id", "text"])
    sigs = {d: _simhash(t) for d, t in zip(tbl["doc_id"].to_pylist(),
                                           tbl["text"].to_pylist())}
    import ray as _ray
    sig_ref = _ray.put(sigs)

    def verify(batch: pa.Table, maxh=max_hamming) -> pa.Table:
        s = _ray.get(sig_ref)
        out = []
        for da, db in zip(batch["doc_a"].to_pylist(),
                          batch["doc_b"].to_pylist()):
            ham = bin(s[da] ^ s[db]).count("1")
            if ham <= maxh:
                out.append({"doc_a": da, "doc_b": db, "hamming": ham})
        return pa.Table.from_pylist(out, schema=pa.schema([
            ("doc_a", pa.int64()), ("doc_b", pa.int64()),
            ("hamming", pa.int64())]))

    return uniq.map_batches(verify, batch_format="pyarrow")


def embedding_dup_pairs(sf_dir: str, cosine_threshold: float = 0.95,
                        n_planes: int = 12):
    """Embedding near-dup via random-hyperplane LSH + cosine verify."""
    import ray
    import ray.data as rd
    import pyarrow.parquet as pq

    tbl = pq.read_table(f"{sf_dir}/embeddings.parquet",
                        columns=["vec_id", "embedding"])
    dim = len(tbl["embedding"][0])
    # deterministic hyperplanes
    planes = np.array([
        [int.from_bytes(hashlib.sha256(f"pl:{p}:{d}".encode()).digest()[:8],
                        "big") / 2**63 - 1.0
         for d in range(dim)] for p in range(n_planes)])

    ds = rd.read_parquet(f"{sf_dir}/embeddings.parquet",
                         columns=["vec_id", "embedding"])

    def to_sig(batch: pa.Table, planes=planes) -> pa.Table:
        flat = batch["embedding"].combine_chunks()
        m = flat.flatten().to_numpy(zero_copy_only=False).reshape(
            -1, dim).astype(np.float64)
        bits = (m @ planes.T) > 0
        sig = (bits * (1 << np.arange(n_planes))).sum(axis=1)
        return pa.table({"sig": pa.array(sig, pa.int64()),
                         "vec_id": batch["vec_id"]})

    def bucket_pairs(group: pa.Table) -> pa.Table:
        ids = sorted(group["vec_id"].to_pylist())
        # star pairs — see minhash_lsh_pairs.bucket_pairs
        pairs = [{"vec_a": ids[0], "vec_b": y} for y in ids[1:]]
        return pa.Table.from_pylist(pairs, schema=pa.schema([
            ("vec_a", pa.int64()), ("vec_b", pa.int64())]))

    cands = (ds.map_batches(to_sig, batch_format="pyarrow")
             .groupby("sig").map_groups(bucket_pairs, batch_format="pyarrow"))

    vecs = {v: np.asarray(e, dtype=np.float64)
            for v, e in zip(tbl["vec_id"].to_pylist(),
                            tbl["embedding"].to_pylist())}
    vec_ref = ray.put(vecs)

    def verify(batch: pa.Table, thr=cosine_threshold) -> pa.Table:
        vv = ray.get(vec_ref)
        out = []
        for va, vb in zip(batch["vec_a"].to_pylist(),
                          batch["vec_b"].to_pylist()):
            x, y = vv[va], vv[vb]
            nx, ny = np.linalg.norm(x), np.linalg.norm(y)
            cos = float(x @ y / (nx * ny)) if nx and ny else 0.0
            if cos >= thr:
                out.append({"vec_a": va, "vec_b": vb,
                            "cosine": np.floor(cos * 1e4 + 0.5) / 1e4})
        return pa.Table.from_pylist(out, schema=pa.schema([
            ("vec_a", pa.int64()), ("vec_b", pa.int64()),
            ("cosine", pa.float64())]))

    return cands.map_batches(verify, batch_format="pyarrow")


def ngram_jaccard_pairs(sf_dir: str, threshold: float = 0.8):
    """Exact all-candidates n-gram Jaccard — the oracle-checkable
    brute-force version of minhash_lsh_pairs, restricted to docs sharing
    their exact md5 prefix bucket to bound the pair count.  For the SQL
    gate the useful invariant is: every exact-duplicate text pair has
    jaccard 1.0; the oracle enumerates md5-equal pairs."""
    import ray.data as rd

    ds = rd.read_parquet(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])

    def add_hash(batch: pa.Table) -> pa.Table:
        import hashlib as _h
        md5 = [_h.md5(t.encode()).hexdigest()
               for t in batch["text"].to_pylist()]
        return pa.table({"text_md5": pa.array(md5, pa.string()),
                         "doc_id": batch["doc_id"]})

    def dup_pairs(group: pa.Table) -> pa.Table:
        ids = sorted(group["doc_id"].to_pylist())
        pairs = [{"doc_a": x, "doc_b": y, "jaccard": 1.0}
                 for i, x in enumerate(ids) for y in ids[i + 1:]]
        return pa.Table.from_pylist(pairs, schema=pa.schema([
            ("doc_a", pa.int64()), ("doc_b", pa.int64()),
            ("jaccard", pa.float64())]))

    out = (ds.map_batches(add_hash, batch_format="pyarrow")
           .groupby("text_md5").map_groups(dup_pairs, batch_format="pyarrow"))
    # materialize the (tiny) pair list as an Arrow table so an EMPTY result
    # still carries its schema through the driver's pandas conversion
    schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                        ("jaccard", pa.float64())])
    return pa.Table.from_pylist(out.take_all(), schema=schema)


NGRAM_JACCARD_SQL = """
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, 1.0 AS jaccard
FROM documents a JOIN documents b
  ON md5(a.text) = md5(b.text) AND a.doc_id < b.doc_id
"""


def dedup_clusters(pairs_ds, max_rounds: int = 10):
    """Connected components over near-dup pairs by iterative min-label
    propagation (the groupby formulation from the ray guide: no driver
    union-find, scales with the edge set).

    Input: Dataset/table with (doc_a, doc_b) edges. Output:
    pa.Table(doc_id, cluster_id) where cluster_id = min doc_id of the
    component. Star edges from the bucket stage converge in ~2 rounds;
    arbitrary edge sets in O(diameter) rounds (capped).

    Scale note: each round broadcasts the label map of CANDIDATE docs
    (docs with >=1 near-dup edge — sparse by construction); when even
    that outgrows the driver, replace the broadcast with a labels-to-
    edges hash join per round (same groupby(min) formulation).
    """
    import ray.data as rd
    from ray.data.aggregate import Min

    if not isinstance(pairs_ds, rd.Dataset):
        pairs_ds = rd.from_arrow(pairs_ds)
    edges = pairs_ds.select_columns(["doc_a", "doc_b"])

    def seed(batch: pa.Table) -> pa.Table:
        import numpy as np
        both = np.concatenate([
            batch["doc_a"].to_numpy(zero_copy_only=False),
            batch["doc_b"].to_numpy(zero_copy_only=False)])
        return pa.table({"doc_id": pa.array(both, pa.int64()),
                         "label": pa.array(both, pa.int64())})

    labels = (edges.map_batches(seed, batch_format="pyarrow")
              .groupby("doc_id").aggregate(Min("label", alias_name="label")))

    edge_tbl = pa.concat_tables([
        b for b in edges.iter_batches(batch_size=65536, batch_format="pyarrow")
    ]) if edges.count() else pa.table({"doc_a": pa.array([], pa.int64()),
                                       "doc_b": pa.array([], pa.int64())})

    for _ in range(max_rounds):
        lab = {r["doc_id"]: r["label"] for r in labels.take_all()}

        def propagate(batch: pa.Table, lab=lab) -> pa.Table:
            rows = []
            for a, b in zip(batch["doc_a"].to_pylist(),
                            batch["doc_b"].to_pylist()):
                m = min(lab[a], lab[b])
                rows.append({"doc_id": a, "label": m})
                rows.append({"doc_id": b, "label": m})
            return pa.Table.from_pylist(rows, schema=pa.schema([
                ("doc_id", pa.int64()), ("label", pa.int64())]))

        new_labels = (rd.from_arrow(edge_tbl)
                      .map_batches(propagate, batch_format="pyarrow")
                      .union(rd.from_items(
                          [{"doc_id": d, "label": l} for d, l in lab.items()]))
                      .groupby("doc_id").aggregate(Min("label", alias_name="label")))
        new_lab = {r["doc_id"]: r["label"] for r in new_labels.take_all()}
        labels = new_labels
        if new_lab == lab:
            break

    rows = sorted(({"doc_id": d, "cluster_id": l}
                   for d, l in new_lab.items()), key=lambda r: r["doc_id"])
    return pa.Table.from_pylist(rows, schema=pa.schema([
        ("doc_id", pa.int64()), ("cluster_id", pa.int64())]))


def exact_dup_clusters(sf_dir: str):
    """Cluster assignments for exact-duplicate docs (cluster = min doc_id
    of each md5-equal group with >1 member) — the SQL-checkable face of
    dedup_clusters, fed by the exact-dup pair list."""
    pairs = ngram_jaccard_pairs(sf_dir)
    return dedup_clusters(pairs)


EXACT_DUP_CLUSTERS_SQL = """
SELECT doc_id, cluster_id FROM (
  SELECT doc_id,
         min(doc_id) OVER (PARTITION BY md5(text)) AS cluster_id,
         count(*) OVER (PARTITION BY md5(text)) AS cnt
  FROM documents
) WHERE cnt > 1
"""

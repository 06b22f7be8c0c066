"""Token-level edit-similarity verification of candidate near-dup
pairs — the order-AWARE verify step production dedup runs after
MinHash/SimHash candidate generation.

Jaccard verification is set-based: a document and its randomly
shuffled copy verify as identical.  Edit similarity
``1 - levenshtein(tokens_a, tokens_b) / max(len_a, len_b)``
distinguishes "same bag of words" from "same sequence", which is what
near-duplicate actually means for training data (boilerplate reorders,
template fills).

Shapes:
* the DP inner loop is vectorized: each row is two numpy kernels —
  substitution/deletion elementwise, then the sequential insertion
  recurrence collapsed to ONE ``np.minimum.accumulate`` via the
  ``cur[j] = j + min_prefix(t[l] - l)`` transform — O(n*m) work with
  no per-cell Python;
* pair texts attach via two hash-partitioned ``Dataset.join``s against
  the pruned (doc_id, text) scan (the minhash_lsh_pairs verify shape —
  candidates never pull the corpus to the driver);
* ``edit_near_dup_pairs`` composes the whole pipeline: loose-gate
  MinHash candidates -> exact edit verify.

Similarities round half-up to 1e-4 like the dedup pair family.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_OUT_SCHEMA = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                         ("edit_sim", pa.float64())])


def token_edit_distance(a_ids: np.ndarray, b_ids: np.ndarray) -> int:
    """Exact Levenshtein over token-id sequences (unit costs).

    Row recurrence: t[j] = min(prev[j]+1, prev[j-1]+[a!=b]) handles
    deletion/substitution elementwise; insertion (cur[j-1]+1) is a
    prefix-min — cur[j] = min_{l<=j} (t[l] + (j-l)) = j +
    running_min(t[l]-l) — one ``np.minimum.accumulate`` per row."""
    n, m = len(a_ids), len(b_ids)
    if n == 0 or m == 0:
        return max(n, m)
    prev = np.arange(m + 1, dtype=np.int64)
    jr = np.arange(m + 1, dtype=np.int64)
    t = np.empty(m + 1, dtype=np.int64)
    for i in range(1, n + 1):
        t[0] = i
        np.minimum(prev[1:] + 1,
                   prev[:-1] + (b_ids != a_ids[i - 1]), out=t[1:])
        prev = jr + np.minimum.accumulate(t - jr)
    return int(prev[m])


def token_edit_similarity(text_a: str, text_b: str) -> float:
    """1 - lev/max(len) over whitespace tokens; 1.0 for two empties."""
    ta, tb = text_a.split(), text_b.split()
    if not ta and not tb:
        return 1.0
    allt, inv = np.unique(np.array(ta + tb, dtype=object),
                          return_inverse=True)
    d = token_edit_distance(inv[:len(ta)], inv[len(ta):])
    return 1.0 - d / max(len(ta), len(tb))


def edit_verify_pairs(sf_dir: str, pairs, threshold: float = 0.8):
    """Exact edit-similarity verification of a candidate pair set.

    ``pairs``: Dataset or pa.Table with (doc_a, doc_b).  Returns
    Dataset[doc_a, doc_b, edit_sim] for pairs at or above threshold."""
    import ray.data as rd

    from ._io import clean_read
    from ._part import compact_parts
    from .dedup import _num_partitions, _with_schema

    if isinstance(pairs, pa.Table):
        pairs = rd.from_arrow(pairs)
    pairs = pairs.select_columns(["doc_a", "doc_b"])
    n_pairs = pairs.count()
    if n_pairs == 0:
        return rd.from_arrow(_OUT_SCHEMA.empty_table())

    docs = clean_read(f"{sf_dir}/documents.parquet",
                      columns=["doc_id", "text"])
    nparts = _num_partitions(docs.count())
    fa = docs.rename_columns({"doc_id": "doc_a", "text": "text_a"})
    fb = docs.rename_columns({"doc_id": "doc_b", "text": "text_b"})
    # the dedup_clusters join hygiene: a join's empty partitions emit
    # schema-less blocks that break the NEXT Acero join's key
    # resolution — enforce the schema and compact between the two
    mid_schema = pa.schema([("doc_a", pa.int64()), ("doc_b", pa.int64()),
                            ("text_a", pa.string())])
    half = (pairs.join(fa, "inner", num_partitions=nparts,
                       on=("doc_a",))
            .map_batches(_with_schema(mid_schema),
                         batch_format="pyarrow")
            .repartition(compact_parts(n_pairs))
            .materialize())
    joined = half.join(fb, "inner", num_partitions=nparts,
                       on=("doc_b",))

    def verify(batch: pa.Table, thr=threshold) -> pa.Table:
        out = []
        for da, db, ta, tb in zip(batch["doc_a"].to_pylist(),
                                  batch["doc_b"].to_pylist(),
                                  batch["text_a"].to_pylist(),
                                  batch["text_b"].to_pylist()):
            s = token_edit_similarity(ta, tb)
            if s >= thr:
                out.append({"doc_a": da, "doc_b": db,
                            "edit_sim": np.floor(s * 1e4 + 0.5) / 1e4})
        return pa.Table.from_pylist(out, schema=_OUT_SCHEMA)

    return (joined.map_batches(verify, batch_format="pyarrow")
            .repartition(max(2, nparts // 4)))


def edit_near_dup_pairs(sf_dir: str, jaccard_gate: float = 0.5,
                        edit_threshold: float = 0.9):
    """End-to-end order-aware near-dup detection: MinHash/LSH candidate
    generation with a LOOSE Jaccard gate (recall side), then exact
    edit-similarity verification (precision side).  A shuffled copy
    passes the Jaccard gate but fails the edit verify — the case
    set-based dedup cannot express."""
    from .dedup import minhash_lsh_pairs

    cands = minhash_lsh_pairs(sf_dir, jaccard_threshold=jaccard_gate)
    return edit_verify_pairs(sf_dir, cands, threshold=edit_threshold)

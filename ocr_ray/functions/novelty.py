"""Per-document n-gram novelty vs. a reference (training) corpus —
the per-doc generalization of the binary ``contamination_check``:
``novelty = 1 - |doc grams seen in train| / |doc distinct grams|``.

The memorization-risk / eval-hygiene score: an eval candidate at
novelty ~0 is IN the training set (verbatim or near), ~1 is genuinely
unseen; thresholding replaces the all-or-nothing contamination verdict
with a tunable one.

Two physical modes, one definition (the shared ``_win_shingles``
geometry, so results are comparable with the contamination family):

* ``mode="exact"`` — the scale path.  Train and eval gram rows
  (in-doc deduplicated at scan time) take ONE hash(gram)%P shuffle;
  each partition answers membership with a single vectorized
  ``np.isin`` of eval grams against the partition's train vocabulary
  and emits per-doc (n_grams, n_seen) partials; a doc-keyed rollup
  (output-bounded: one row per eval doc) finishes.  No gram set is
  ever broadcast or driver-collected — the train corpus can be
  arbitrarily large.
* ``mode="bloom"`` — the broadcast path for fleets of small probes:
  ONE aggregate builds the train Bloom filter (``bloom.py`` —
  ~1 MB), eval scoring is then map-only.  False positives can only
  RAISE n_seen (never lower): bloom novelty is a certified LOWER
  bound on exact novelty, with the documented ~2e-4 FP rate at
  default sizing.

Docs with fewer than ``window`` tokens have no grams; their novelty
is defined as 1.0 (nothing to have memorized) with n_grams = 0.

SQL-expressible (DuckDB window-unnest + anti join) — exact-mode
parity is pytest-gated.

Reference analog: none — beyond-reference training-data operator
(decontamination family, SURVEY.md §2.7 extension).
"""
from __future__ import annotations

import numpy as np
import pyarrow as pa

from ._part import nparts_for as _num_partitions
from .corpus_prep import _read, _win_hashes_fn

_OUT_SCHEMA = pa.schema([("doc_id", pa.int64()), ("n_grams", pa.int64()),
                         ("n_seen", pa.int64()), ("novelty", pa.float64())])


def _as_dataset(obj):
    import ray.data as rd

    if isinstance(obj, pa.Table):
        obj = rd.from_arrow(obj)
    return obj.select_columns(["doc_id", "text"])


def ngram_novelty_scores(eval_ds, train_dir: str | None = None,
                         window: int = 8, mode: str = "exact",
                         m_bits: int = 1 << 23, k_hashes: int = 4,
                         bloom_path: str | None = None):
    """Dataset[doc_id, n_grams, n_seen, novelty] over the eval docs.

    ``eval_ds``: Dataset or pa.Table with (doc_id:int64, text);
    ``train_dir``: sf-style dir whose documents.parquet is the
    reference corpus.  ``bloom_path`` (bloom mode only) probes a
    persisted filter (``bloom.save_bloom`` / ``append_to_bloom_file``)
    instead of building one — its header overrides m_bits/k_hashes and
    must agree on ``window``.  Novelty rounds half-up to 1e-4."""
    if mode == "bloom":
        return _novelty_bloom(eval_ds, train_dir, window, m_bits,
                              k_hashes, bloom_path)
    if mode != "exact":
        raise ValueError(f"unknown mode {mode!r} (exact|bloom)")
    if train_dir is None:
        raise ValueError("exact mode needs train_dir")
    return _novelty_exact(eval_ds, train_dir, window)


def _finalize(batch: pa.Table) -> pa.Table:
    n = np.asarray(batch["n_grams"].to_pylist(), dtype=np.int64)
    s = np.asarray(batch["n_seen"].to_pylist(), dtype=np.int64)
    with np.errstate(divide="ignore", invalid="ignore"):
        nov = np.where(n > 0, 1.0 - s / np.maximum(n, 1), 1.0)
    nov = np.floor(nov * 1e4 + 0.5) / 1e4
    return pa.table({"doc_id": batch["doc_id"].cast(pa.int64()),
                     "n_grams": pa.array(n), "n_seen": pa.array(s),
                     "novelty": pa.array(nov, pa.float64())})


def _novelty_exact(eval_ds, train_dir: str, window: int):
    from ray.data.aggregate import Sum

    win_hashes = _win_hashes_fn(window)
    ev = _as_dataset(eval_ds)
    n_eval = ev.count()
    train = _read(train_dir, ["text"])
    # gram rows ~ tokens per doc; 256 is a conservative per-doc estimate
    nparts = _num_partitions((n_eval + train.count()) * 256,
                             rows_per_part=400_000)

    def eval_grams(batch: pa.Table) -> pa.Table:
        ids, grams = [], []
        zero_ids = []
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            ws = sorted(set(win_hashes(text or "")))
            if not ws:
                zero_ids.append(doc_id)
            ids.extend([doc_id] * len(ws))
            grams.extend(ws)
        t = pa.table({"gram": pa.array(grams, pa.string()),
                      "doc_id": pa.array(ids, pa.int64())})
        z = pa.table({"gram": pa.array([""] * len(zero_ids), pa.string()),
                      "doc_id": pa.array(zero_ids, pa.int64())})
        # zero-gram docs ride as sentinel rows so they still appear in
        # the rollup (gram "" never matches a real md5 hex)
        return pa.concat_tables([t, z])

    def train_grams(batch: pa.Table) -> pa.Table:
        seen = set()
        for text in batch["text"].to_pylist():
            seen.update(win_hashes(text or ""))
        return pa.table({"gram": pa.array(sorted(seen), pa.string()),
                         "doc_id": pa.array([-1] * len(seen), pa.int64())})

    rows = (ev.map_batches(eval_grams, batch_format="pyarrow",
                           batch_size=512)
            .union(train.map_batches(train_grams, batch_format="pyarrow",
                                     batch_size=512)))

    def add_part(batch: pa.Table, p=nparts) -> pa.Table:
        g = batch["gram"].to_pylist()
        part = np.array([int(x[:8], 16) % p if x else 0 for x in g],
                        dtype=np.int64)
        return batch.append_column("part", pa.array(part))

    def partition_kernel(group: pa.Table) -> pa.Table:
        ids = np.asarray(group["doc_id"].to_pylist(), dtype=np.int64)
        grams = np.asarray(group["gram"].to_pylist(), dtype=object)
        is_train = ids == -1
        ev_ids, ev_grams = ids[~is_train], grams[~is_train]
        if len(ev_ids) == 0:
            return pa.table({"doc_id": pa.array([], pa.int64()),
                             "n_grams": pa.array([], pa.int64()),
                             "n_seen": pa.array([], pa.int64())})
        real = np.array([bool(g) for g in ev_grams])
        hit = np.zeros(len(ev_ids), dtype=np.int64)
        if is_train.any() and real.any():
            vocab = np.unique(grams[is_train].astype("U32"))
            hit[real] = np.isin(ev_grams[real].astype("U32"),
                                vocab, assume_unique=False).astype(np.int64)
        uids, inv = np.unique(ev_ids, return_inverse=True)
        n_grams = np.bincount(inv, weights=real.astype(np.float64))
        n_seen = np.bincount(inv, weights=hit.astype(np.float64))
        return pa.table({"doc_id": pa.array(uids),
                         "n_grams": pa.array(n_grams.astype(np.int64)),
                         "n_seen": pa.array(n_seen.astype(np.int64))})

    partials = (rows.map_batches(add_part, batch_format="pyarrow")
                .groupby("part").map_groups(partition_kernel,
                                            batch_format="pyarrow"))
    rolled = (partials.groupby("doc_id")
              .aggregate(Sum("n_grams", alias_name="n_grams"),
                         Sum("n_seen", alias_name="n_seen")))
    return rolled.map_batches(_finalize, batch_format="pyarrow")


def _novelty_bloom(eval_ds, train_dir: str | None, window: int,
                   m_bits: int, k_hashes: int,
                   bloom_path: str | None = None):
    from .bloom import _positions, _win_digests, build_ngram_bloom

    if bloom_path is not None:
        from .bloom import load_bloom

        blob, meta = load_bloom(bloom_path)
        if meta["window"] != window:
            raise ValueError(
                f"{bloom_path} was built at window={meta['window']}, "
                f"probe asked window={window} — gram geometries differ")
        m_bits, k_hashes = meta["m_bits"], meta["k_hashes"]
    else:
        if train_dir is None:
            raise ValueError("bloom mode needs train_dir or bloom_path")
        blob = build_ngram_bloom(_read(train_dir, ["text"]),
                                 window=window, m_bits=m_bits,
                                 k_hashes=k_hashes)
    bits = np.frombuffer(blob, dtype=np.uint8)

    def score(batch: pa.Table, bits=bits) -> pa.Table:
        ids, ng, ns = [], [], []
        for doc_id, text in zip(batch["doc_id"].to_pylist(),
                                batch["text"].to_pylist()):
            digs = sorted(set(_win_digests(text or "", window)))
            ids.append(doc_id)
            ng.append(len(digs))
            if digs:
                pos = _positions(digs, k_hashes, m_bits)
                present = ((bits[pos >> 3] >> (pos & 7)) & 1).all(axis=1)
                ns.append(int(present.sum()))
            else:
                ns.append(0)
        return _finalize(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                   "n_grams": pa.array(ng, pa.int64()),
                                   "n_seen": pa.array(ns, pa.int64())}))

    return _as_dataset(eval_ds).map_batches(score, batch_format="pyarrow",
                                            batch_size=1024)

"""PMI collocation extraction — statistically-bound word pairs.

The corpus operator behind tokenizer-vocab curation and phrase-mining:
rank adjacent word pairs by pointwise mutual information
PMI(a,b) = ln( p(ab) / (p(a) p(b)) ) with p(ab) = c_ab / B,
p(a) = c_a / N  (B = total bigrams, N = total unigrams).  High-PMI
pairs ("new york") cohere; high-frequency-but-low-PMI pairs ("of the")
do not — frequency alone (repeated_ngrams) cannot tell them apart.

Scale design:
* ONE text scan emits both unigram AND bigram count partials,
  pre-aggregated per block (np.unique — a block never ships more than
  its distinct grams), tagged by a ``kind`` column; ONE
  groupby(kind, g1, g2) sums them.  The aggregated gram table is
  materialized once and reused for both families and both totals.
* unigram counts attach to bigrams via TWO hash joins (on the first
  word, then the second) — never a broadcast vocabulary dict: at
  100 TB the unigram table is itself huge, and joins are how the
  engine ships it (auto_join's plain leg; the keys here are
  near-uniform Zipf tails, the skew head is exactly the stop-word
  region the min_count gate keeps anyway).
* PMI is computed per row from five int64s in one float64 expression
  and micro-quantized — no accumulation, so the score is a pure
  function of the counts (repo determinism discipline); ties break
  (pmi desc, w1 asc, w2 asc).

``min_count`` gates rare pairs (PMI's known pathology: a hapax pair
of two hapax words maxes the score); the gate runs BEFORE the joins,
so join input is the surviving pairs only.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ._part import nparts_for
from .corpus_prep import _tokens


def collocation_pmi(sf_dir: str, k: int = 50, min_count: int = 5,
                    columns=("doc_id", "text")):
    """Top-``k`` bigrams by PMI over the documents table.  Returns
    pa.Table(w1, w2, n_pair, n_w1, n_w2, pmi_micro) sorted by
    (pmi_micro desc, w1, w2) — ``pmi_micro`` is round(PMI * 1e6)."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ._io import clean_read

    ds = clean_read(f"{sf_dir}/documents.parquet",
                    columns=list(columns))

    def gram_partials(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch["text"]))  # NULL text
        uni: dict = {}
        big: dict = {}
        for text in batch["text"].to_pylist():
            toks = _tokens(text)
            for t in toks:
                uni[t] = uni.get(t, 0) + 1
            for a, b in zip(toks, toks[1:]):
                big[(a, b)] = big.get((a, b), 0) + 1
        k0, k1, g2, n = [], [], [], []
        for t, c in uni.items():
            k0.append(0)
            k1.append(t)
            g2.append("")
            n.append(c)
        for (a, b), c in big.items():
            k0.append(1)
            k1.append(a)
            g2.append(b)
            n.append(c)
        return pa.table({"kind": pa.array(k0, pa.int64()),
                         "g1": pa.array(k1, pa.string()),
                         "g2": pa.array(g2, pa.string()),
                         "n": pa.array(n, pa.int64())})

    grams = (ds.map_batches(gram_partials, batch_format="pyarrow")
             .groupby(["kind", "g1", "g2"])
             .aggregate(Sum("n", alias_name="n"))
             .materialize())    # ONE shuffle, reused 4x below

    totals = {r["kind"]: r["n"] for r in
              grams.groupby("kind").aggregate(
                  Sum("n", alias_name="n")).take_all()}
    n_uni, n_big = int(totals.get(0, 0)), int(totals.get(1, 0))
    if n_big == 0:
        return pa.table({c: pa.array([], t) for c, t in
                         [("w1", pa.string()), ("w2", pa.string()),
                          ("n_pair", pa.int64()), ("n_w1", pa.int64()),
                          ("n_w2", pa.int64()),
                          ("pmi_micro", pa.int64())]})

    # join hygiene (the dedup_clusters discipline): filter/rename
    # stages emit schema-less empty blocks that break Acero's key
    # resolution — pin schemas, compact to data-sized block counts,
    # materialize before every join input
    from ._part import compact_parts
    from .dedup import _with_schema

    uni_schema = pa.schema([("w", pa.string()), ("c", pa.int64())])
    pair_schema = pa.schema([("w1", pa.string()), ("w2", pa.string()),
                             ("n_pair", pa.int64())])

    def split(kind: int, names: list[str], schema: pa.Schema):
        return (grams
                .filter(expr=f"kind == {kind}")
                .map_batches(
                    lambda t, ns=tuple(names): t.select(
                        ["g1", "g2", "n"]).rename_columns(list(ns))
                    .select(schema.names),
                    batch_format="pyarrow")
                .map_batches(_with_schema(schema),
                             batch_format="pyarrow"))

    uni = split(0, ["w", "_uni_drop", "c"], uni_schema).materialize()
    pairs = (split(1, ["w1", "w2", "n_pair"], pair_schema)
             .filter(expr=f"n_pair >= {min_count}")
             .map_batches(_with_schema(pair_schema),
                          batch_format="pyarrow")
             .materialize())
    n_pairs = pairs.count()
    if n_pairs == 0:
        return pa.table({
            "w1": pa.array([], pa.string()),
            "w2": pa.array([], pa.string()),
            "n_pair": pa.array([], pa.int64()),
            "n_w1": pa.array([], pa.int64()),
            "n_w2": pa.array([], pa.int64()),
            "pmi_micro": pa.array([], pa.int64())})
    pairs = pairs.repartition(compact_parts(n_pairs)).materialize()

    def _ren(ns):
        return lambda t: t.rename_columns(list(ns))

    # attach the unigram counts with the strategy-picking join: the
    # unigram table is dim-sized after a bench-scale corpus (broadcast
    # leg — zero shuffles) and corpus-sized at 100 TB (hash leg);
    # skew_check off — the min_count survivors are not a skewed key
    # space worth a diagnostic scan here
    from .relational import auto_join

    u1 = uni.map_batches(_ren(("w1", "n_w1")), batch_format="pyarrow")
    j1 = auto_join(pairs, u1, "w1", skew_check=False)
    # chained-join hygiene for the hash leg (harmless under broadcast)
    mid_schema = pa.schema([("w1", pa.string()), ("w2", pa.string()),
                            ("n_pair", pa.int64()),
                            ("n_w1", pa.int64())])
    j1 = j1.map_batches(_with_schema(mid_schema),
                        batch_format="pyarrow")
    u2 = uni.map_batches(_ren(("w2", "n_w2")), batch_format="pyarrow")
    j2 = auto_join(j1, u2, "w2", skew_check=False)

    def score(t: pa.Table, N=n_uni, B=n_big) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(
                "pmi_micro", pa.array([], pa.int64()))
        cab = t["n_pair"].to_numpy(zero_copy_only=False).astype(
            np.float64)
        c1 = t["n_w1"].to_numpy(zero_copy_only=False).astype(np.float64)
        c2 = t["n_w2"].to_numpy(zero_copy_only=False).astype(np.float64)
        # ln((c_ab/B) / ((c1/N)(c2/N))) in ONE expression per row —
        # no accumulation, deterministic for given integer counts
        pmi = np.log(cab * N * N / (B * c1 * c2))
        return t.append_column(
            "pmi_micro",
            pa.array(np.floor(pmi * 1e6 + 0.5).astype(np.int64)))

    scored = j2.map_batches(score, batch_format="pyarrow")
    top = (scored.sort(["pmi_micro", "w1", "w2"],
                       descending=[True, False, False])
           .limit(k).to_arrow_refs())
    import ray

    cols = ["w1", "w2", "n_pair", "n_w1", "n_w2", "pmi_micro"]
    tbls = [t.select(cols) for t in (ray.get(r) for r in top)
            if t.num_rows > 0]
    if not tbls:
        return pa.table({c: pa.array([], pa.string() if c[0] == "w"
                                     else pa.int64()) for c in cols})
    out = pa.concat_tables(tbls)
    idx = np.lexsort((
        np.asarray(out["w2"].to_pylist(), dtype=object),
        np.asarray(out["w1"].to_pylist(), dtype=object),
        -out["pmi_micro"].to_numpy(zero_copy_only=False)))
    return out.take(idx)

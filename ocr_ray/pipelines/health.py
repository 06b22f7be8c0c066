"""Corpus health report — the one-stop pre-curation audit.

Composes the engine's audit primitives over a documents table into a
single artifact a data engineer reads before spending compute on a
100-TB curation run:

1. column profile            (profiler.profile_table — ONE fused scan)
2. schema contract check     (expectations.check_expectations — ONE
                              fused scan + one groupby for uniqueness)
3. exact-duplicate rate      (textops.exact_dedup_groups — md5 groupby)
4. length distribution       (histogram.column_histogram — ONE
                              aggregate over the profiled char counts)
5. per-source × language mix (one groupby rollup)

Each piece stays independently usable and independently tested; the
report only ORCHESTRATES them (4 text scans + 1 metadata scan total —
the profile and contract scans read the text column once each, the
dup rate hashes it once, the histogram and mix read only short
columns).  Everything returned is a small driver-safe table or
scalar; nothing corpus-sized materializes.
"""

from __future__ import annotations

import pyarrow as pa

_DEFAULT_RULES = [
    {"column": "doc_id", "rule": "not_null"},
    {"column": "doc_id", "rule": "unique"},
    {"column": "text", "rule": "not_null"},
    {"column": "text", "rule": "str_len", "lo": 1},
    {"column": "lang", "rule": "not_null"},
]


def corpus_health(sf_dir: str, rules: list[dict] | None = None,
                  length_bins: int = 20) -> dict:
    """Audit ``{sf_dir}/documents.parquet``.  Returns
    {"profile": pa.Table, "contract": pa.Table, "contract_passed":
    bool, "n_docs", "n_exact_dup_docs", "dup_rate", "length_hist":
    pa.Table, "source_lang_mix": pa.Table}."""
    import ray.data as rd
    from ray.data.aggregate import Sum

    from ..functions._io import clean_read
    from ..functions.expectations import check_expectations
    from ..functions.histogram import column_histogram
    from ..functions.profiler import profile_table
    from ..functions.textops import exact_dedup_groups

    path = f"{sf_dir}/documents.parquet"

    profile = profile_table(rd.read_parquet(path))
    n_docs = int(profile["n_rows"][0].as_py()) if profile.num_rows \
        else 0

    contract = check_expectations(
        rd.read_parquet(path), rules or _DEFAULT_RULES)
    passed = bool(pa.compute.all(contract["passed"]).as_py())

    # exact-dup rate: every doc beyond the first of each md5 group
    dup_groups = exact_dedup_groups(sf_dir)
    extra = dup_groups.map_batches(
        lambda t: pa.table({"extra": pa.compute.subtract(
            t["n_copies"], pa.scalar(1))}),
        batch_format="pyarrow").aggregate(Sum("extra",
                                              alias_name="s")) or {}
    n_dup = int(extra.get("s") or 0)

    length_hist = column_histogram(
        clean_read(path, columns=["doc_id", "n_chars"]), "n_chars",
        bins=length_bins)

    import ray

    # Ray's sort-based groupby rejects NULL string keys — sentinel-
    # fill going in, restore at the driver fold
    NULL_S = "\x00<null>"

    def fill_keys(t: pa.Table) -> pa.Table:
        return pa.table({
            "source": pa.compute.fill_null(t["source"], NULL_S),
            "lang": pa.compute.fill_null(t["lang"], NULL_S)})

    mix = (clean_read(path, columns=["source", "lang"])
           .map_batches(fill_keys, batch_format="pyarrow")
           .groupby(["source", "lang"]).count())
    parts = [t.select(["source", "lang", "count()"]) for t in
             (ray.get(r) for r in mix.to_arrow_refs()) if t.num_rows]
    if parts:
        mix_tbl = pa.concat_tables(parts)
        # driver-side ordering + sentinel restore (the mix table is
        # sources x langs — tiny); NULLs sort last
        rows = sorted(
            ((None if r["source"] == NULL_S else r["source"],
              None if r["lang"] == NULL_S else r["lang"],
              r["count()"]) for r in mix_tbl.to_pylist()),
            key=lambda r: ((r[0] is None, r[0] or ""),
                           (r[1] is None, r[1] or "")))
        mix_tbl = pa.table({
            "source": pa.array([r[0] for r in rows], pa.string()),
            "lang": pa.array([r[1] for r in rows], pa.string()),
            "count()": pa.array([r[2] for r in rows], pa.int64())})
    else:
        mix_tbl = pa.table(
            {"source": pa.array([], pa.string()),
             "lang": pa.array([], pa.string()),
             "count()": pa.array([], pa.int64())})

    return {
        "profile": profile,
        "contract": contract,
        "contract_passed": passed,
        "n_docs": n_docs,
        "n_exact_dup_docs": n_dup,
        "dup_rate": round(n_dup / n_docs, 6) if n_docs else 0.0,
        "length_hist": length_hist["table"],
        "source_lang_mix": mix_tbl.rename_columns(
            ["source", "lang", "n_docs"]),
    }

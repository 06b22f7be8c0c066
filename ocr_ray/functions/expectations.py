"""Data-quality expectations: declarative column contracts checked in
ONE scan.

An ingest at 100 TB needs a cheap gate before any expensive stage:
"doc_id is never null and unique, lang is one of {...}, n_chars in
[1, 1e6], ts matches ISO". Checking rule-by-rule costs one scan per
rule; here every ROW-LEVEL rule (not_null / range / in_set / regex /
str_len) for every column fuses into ONE map_batches pass producing
per-rule violation counts as an associative integer aggregate, plus a
bounded sample of offending values per rule (first ``sample`` per
block, capped at merge — diagnostics, not a driver drain; counts are
exact and layout-independent, the sample CONTENT is whichever blocks
merged first and is the one deliberately non-deterministic field in
this module).  The only
rule needing a shuffle is ``unique`` (exact duplicate detection is a
groupby by nature); it runs once per unique-rule on the key column
only.

Rules are dicts:
    {"column": "lang", "rule": "not_null"}
    {"column": "n_chars", "rule": "range", "lo": 1, "hi": 1000000}
      (bounds inclusive; either side may be omitted)
    {"column": "lang", "rule": "in_set", "values": ["en", "de"]}
    {"column": "doc_id", "rule": "regex", "pattern": r"d-\\d+"}
      (full-match, RE2 via Arrow — no backtracking blowups)
    {"column": "text", "rule": "str_len", "lo": 1, "hi": 100000}
    {"column": "doc_id", "rule": "unique"}

NULLs: only ``not_null`` counts them — range/in_set/regex/str_len
follow SQL semantics (NULL is not a violation; declare not_null
separately), so each rule's SQL mirror is a plain WHERE count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_ROW_RULES = ("not_null", "range", "in_set", "regex", "str_len")
_SAMPLE = 5


def _violation_mask(arr: pa.ChunkedArray, rule: dict):
    kind = rule["rule"]
    if kind == "not_null":
        return pc.is_null(arr)
    valid = pc.is_valid(arr)
    if kind == "range" or kind == "str_len":
        x = pc.utf8_length(arr) if kind == "str_len" else arr
        bad = pa.array(np.zeros(len(arr), np.bool_))
        if rule.get("lo") is not None:
            bad = pc.or_(bad, pc.less(x, pa.scalar(rule["lo"])))
        if rule.get("hi") is not None:
            bad = pc.or_(bad, pc.greater(x, pa.scalar(rule["hi"])))
        return pc.and_(valid, pc.fill_null(bad, False))
    if kind == "in_set":
        ok = pc.is_in(arr, value_set=pa.array(rule["values"]))
        return pc.and_(valid, pc.invert(ok))
    if kind == "regex":
        ok = pc.match_substring_regex(
            arr, f"^(?:{rule['pattern']})$")
        return pc.and_(valid, pc.invert(pc.fill_null(ok, False)))
    raise ValueError(f"unknown rule {kind!r}")


def check_expectations(ds, rules: list[dict],
                       sample: int = _SAMPLE) -> pa.Table:
    """Check ``rules`` against ``ds``; returns pa.Table(rule_id,
    column, rule, n_violations, passed, sample_values list<string>)
    in input rule order.  Row-level rules cost ONE shared scan;
    each ``unique`` rule costs one groupby on its column."""
    from ray.data.aggregate import AggregateFn

    if not rules:
        raise ValueError("check_expectations: no rules")
    for r in rules:
        if r["rule"] not in _ROW_RULES + ("unique",):
            raise ValueError(f"unknown rule {r['rule']!r}")

    row_rules = [(i, r) for i, r in enumerate(rules)
                 if r["rule"] in _ROW_RULES]
    uniq_rules = [(i, r) for i, r in enumerate(rules)
                  if r["rule"] == "unique"]

    counts: dict[int, int] = {}
    samples: dict[int, list] = {}
    if row_rules:
        def acc_block(state: dict, blk: pa.Table) -> dict:
            state = dict(state)
            for i, r in row_rules:
                mask = _violation_mask(blk[r["column"]], r)
                n = int(pc.sum(mask).as_py() or 0)
                cnt, smp = state.get(i, (0, ()))
                if n and len(smp) < sample:
                    vals = blk[r["column"]].filter(
                        pc.fill_null(mask, False)).slice(0, sample)
                    smp = tuple(smp) + tuple(
                        str(v) for v in vals.to_pylist())
                state[i] = (cnt + n, tuple(smp[:sample]))
            return state

        def merge(a: dict, b: dict) -> dict:
            out = dict(a)
            for i, (n, smp) in b.items():
                n0, s0 = out.get(i, (0, ()))
                out[i] = (n0 + n, tuple((s0 + smp)[:sample]))
            return out

        agg = AggregateFn(init=lambda _: {}, merge=merge,
                          accumulate_block=acc_block, name="exp")
        got = ds.aggregate(agg)["exp"] or {}
        for i, (n, smp) in got.items():
            counts[i] = n
            samples[i] = list(smp)

    for i, r in uniq_rules:
        from ray.data.aggregate import Count, Sum

        c = r["column"]
        dup = (ds.select_columns([c]).groupby(c).count()
               .map_batches(
                   lambda t: t.filter(pc.greater(t["count()"], 1)),
                   batch_format="pyarrow")
               .materialize())   # executed once, reused below
        both = dup.aggregate(Sum("count()", alias_name="s"),
                             Count()) or {}
        total_dup_rows = int(both.get("s") or 0)
        n_dup_keys = int(both.get("count()") or 0)
        # violations = extra copies beyond the first of each dup key
        counts[i] = total_dup_rows - n_dup_keys
        samples[i] = [str(row[c]) for row in dup.take(sample)]

    rows = []
    for i, r in enumerate(rules):
        n = counts.get(i, 0)
        rows.append((i, r["column"], r["rule"], n, n == 0,
                     samples.get(i, [])))
    return pa.table({
        "rule_id": pa.array([r[0] for r in rows], pa.int64()),
        "column": pa.array([r[1] for r in rows], pa.string()),
        "rule": pa.array([r[2] for r in rows], pa.string()),
        "n_violations": pa.array([r[3] for r in rows], pa.int64()),
        "passed": pa.array([r[4] for r in rows], pa.bool_()),
        "sample_values": pa.array([r[5] for r in rows],
                                  pa.list_(pa.string())),
    })

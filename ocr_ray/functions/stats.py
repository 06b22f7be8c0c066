"""Distributed EXACT second-moment statistics — the Pearson
correlation matrix over numeric fact-table columns, computed without
any float accumulation.

Why the fuss: the textbook one-pass corr (Welford / running float
sums) gives merge-order-dependent last-ulp results on a distributed
engine — the exact class of nondeterminism this repo bans.  Here every
value is scaled once to int64 (half-up, the shared discipline), and
the aggregate state is a vector of PYTHON ints (arbitrary precision),
so sums of squares/products can NEVER overflow and every merge is
exact integer addition — bit-identical on any block layout, any merge
order, any cluster.  The DuckDB mirror does the same arithmetic in
HUGEINT (int128), so correlations match to the rounded digit.

corr(x, y) = (n*Sxy - Sx*Sy) / sqrt((n*Sxx - Sx^2) * (n*Syy - Sy^2)),
computed from the exact integer sums at the driver fold (state size:
O(d^2) ints), rounded half-up to 6.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_SCALE = 100.0          # cents-style fixed point, shared with _cents


def correlation_matrix(sf_dir: str, table: str = "lineitem",
                       cols: tuple = ("l_quantity", "l_extendedprice",
                                      "l_discount", "l_tax")) -> pa.Table:
    """Pairwise Pearson correlations over ``cols`` of ``table``.
    Returns pa.Table(col_a, col_b, corr) for a < b (column-name order).
    ONE streaming aggregate; see module docstring for the exactness
    argument."""
    from ray.data.aggregate import AggregateFn

    from ._io import clean_read

    d = len(cols)
    ds = clean_read(f"{sf_dir}/{table}.parquet", columns=list(cols))

    def acc_block(state, blk):
        # state: list [n, Sx_0..Sx_{d-1}, upper-tri S_ij incl. diag]
        # of PYTHON ints (exact, unbounded)
        if not state:
            state = [0] * (1 + d + d * (d + 1) // 2)
        state = list(state)
        m = np.stack([
            np.floor(blk[c].to_numpy(zero_copy_only=False)
                     * _SCALE + 0.5).astype(np.int64)
            for c in cols])                       # (d, n) exact ints
        state[0] += m.shape[1]
        # block-level products in object dtype only at the 128-bit-risk
        # step: int64 matmul could overflow silently, so go through
        # Python ints per pair on the BLOCK SUM level (d^2 scalars per
        # block, not per row)
        for i in range(d):
            state[1 + i] += int(m[i].sum(dtype=np.int64))
        k = 1 + d
        for i in range(d):
            for j in range(i, d):
                # exact: int64 rowwise product can overflow, so split
                # into (hi*2^32 + lo) once per pair
                prod = m[i].astype(object) * m[j].astype(object)
                state[k] += int(prod.sum())
                k += 1
        return state

    def merge(s1, s2):
        if not s1:
            return s2
        if not s2:
            return s1
        return [a + b for a, b in zip(s1, s2)]

    agg = AggregateFn(init=lambda _: [], merge=merge,
                      accumulate_block=acc_block, name="corr")
    st = ds.aggregate(agg)["corr"]
    n = st[0]
    sx = st[1:1 + d]
    sij = {}
    k = 1 + d
    for i in range(d):
        for j in range(i, d):
            sij[(i, j)] = st[k]
            k += 1

    rows = []
    for i in range(d):
        for j in range(i + 1, d):
            num = n * sij[(i, j)] - sx[i] * sx[j]
            den_a = n * sij[(i, i)] - sx[i] * sx[i]
            den_b = n * sij[(j, j)] - sx[j] * sx[j]
            if den_a <= 0 or den_b <= 0:
                r = 0.0
            else:
                # exact ints -> one float division at the very end
                r = float(num) / float(np.sqrt(float(den_a))
                                       * np.sqrt(float(den_b)))
            rows.append({"col_a": cols[i], "col_b": cols[j],
                         "corr": float(np.floor(r * 1e6 + 0.5) / 1e6)})
    return pa.Table.from_pylist(rows, schema=pa.schema([
        ("col_a", pa.string()), ("col_b", pa.string()),
        ("corr", pa.float64())]))


def correlation_matrix_sql(table: str = "lineitem",
                           cols: tuple = ("l_quantity",
                                          "l_extendedprice",
                                          "l_discount", "l_tax")) -> str:
    """DuckDB mirror: the SAME integer sums in HUGEINT, the same final
    fold — NOT DuckDB's corr() (whose float accumulation is
    order-dependent in the last ulp)."""
    def s(c):
        return f"CAST(floor({c} * 100.0 + 0.5) AS HUGEINT)"

    sums = [f"count(*) AS n"]
    for c in cols:
        sums.append(f"sum({s(c)}) AS sx_{c}")
    for i, a in enumerate(cols):
        for b in cols[i:]:
            sums.append(f"sum({s(a)} * {s(b)}) AS sp_{a}_{b}")
    pairs = []
    for i, a in enumerate(cols):
        for b in cols[i + 1:]:
            num = f"(n * sp_{a}_{b} - sx_{a} * sx_{b})"
            da = f"(n * sp_{a}_{a} - sx_{a} * sx_{a})"
            db = f"(n * sp_{b}_{b} - sx_{b} * sx_{b})"
            pairs.append(
                f"SELECT '{a}' AS col_a, '{b}' AS col_b, "
                f"floor(CAST({num} AS DOUBLE) / "
                f"(sqrt(CAST({da} AS DOUBLE)) * "
                f"sqrt(CAST({db} AS DOUBLE))) * 1e6 + 0.5) / 1e6 "
                f"AS corr FROM sums")
    return (f"WITH sums AS (SELECT {', '.join(sums)} FROM {table})\n"
            + "\nUNION ALL\n".join(pairs))


def ols_fit(sf_dir: str, table: str = "lineitem",
            x_col: str = "l_quantity",
            y_col: str = "l_extendedprice") -> pa.Table:
    """Closed-form simple linear regression y = intercept + slope * x
    from the SAME exact integer moment sums as correlation_matrix —
    one streaming aggregate, zero float accumulation, bit-identical on
    any layout.  slope = (n*Sxy - Sx*Sy) / (n*Sxx - Sx^2); r2 = corr^2.
    Returns one row (slope, intercept, r2), rounded half-up to 6.
    DuckDB mirror: ols_fit_sql (same HUGEINT arithmetic, not
    regr_slope's float accumulation)."""
    from ray.data.aggregate import AggregateFn

    from ._io import clean_read

    ds = clean_read(f"{sf_dir}/{table}.parquet", columns=[x_col, y_col])

    def acc_block(state, blk):
        if not state:
            state = [0] * 6         # n, Sx, Sy, Sxx, Syy, Sxy
        state = list(state)
        x = np.floor(blk[x_col].to_numpy(zero_copy_only=False)
                     * _SCALE + 0.5).astype(np.int64)
        y = np.floor(blk[y_col].to_numpy(zero_copy_only=False)
                     * _SCALE + 0.5).astype(np.int64)
        state[0] += len(x)
        state[1] += int(x.sum(dtype=np.int64))
        state[2] += int(y.sum(dtype=np.int64))
        state[3] += int((x.astype(object) * x.astype(object)).sum())
        state[4] += int((y.astype(object) * y.astype(object)).sum())
        state[5] += int((x.astype(object) * y.astype(object)).sum())
        return state

    def merge(s1, s2):
        if not s1:
            return s2
        if not s2:
            return s1
        return [a + b for a, b in zip(s1, s2)]

    agg = AggregateFn(init=lambda _: [], merge=merge,
                      accumulate_block=acc_block, name="ols")
    n, sx, sy, sxx, syy, sxy = ds.aggregate(agg)["ols"]
    den = n * sxx - sx * sx
    if den <= 0:
        slope, intercept, r2 = 0.0, float(sy) / max(n, 1) / _SCALE, 0.0
    else:
        num = n * sxy - sx * sy
        slope = float(num) / float(den)
        # intercept back in ORIGINAL units: the scale cancels in the
        # slope; the intercept carries one factor of 1/_SCALE
        intercept = (float(sy) - slope * float(sx)) / n / _SCALE
        dy = n * syy - sy * sy
        r2 = (float(num) ** 2 / (float(den) * float(dy))
              if dy > 0 else 0.0)

    def r6(v):
        return float(np.floor(v * 1e6 + 0.5) / 1e6)

    return pa.Table.from_pylist(
        [{"slope": r6(slope), "intercept": r6(intercept), "r2": r6(r2)}],
        schema=pa.schema([("slope", pa.float64()),
                          ("intercept", pa.float64()),
                          ("r2", pa.float64())]))


def ols_fit_sql(table: str = "lineitem", x_col: str = "l_quantity",
                y_col: str = "l_extendedprice") -> str:
    """HUGEINT mirror of ols_fit (same fold, same rounding)."""
    xs = f"CAST(floor({x_col} * 100.0 + 0.5) AS HUGEINT)"
    ys = f"CAST(floor({y_col} * 100.0 + 0.5) AS HUGEINT)"
    return f"""
WITH s AS (SELECT count(*) AS n, sum({xs}) AS sx, sum({ys}) AS sy,
                  sum({xs} * {xs}) AS sxx, sum({ys} * {ys}) AS syy,
                  sum({xs} * {ys}) AS sxy FROM {table})
SELECT
  floor(CAST(n * sxy - sx * sy AS DOUBLE)
        / CAST(n * sxx - sx * sx AS DOUBLE) * 1e6 + 0.5) / 1e6 AS slope,
  floor((CAST(sy AS DOUBLE) - CAST(n * sxy - sx * sy AS DOUBLE)
         / CAST(n * sxx - sx * sx AS DOUBLE) * CAST(sx AS DOUBLE))
        / n / 100.0 * 1e6 + 0.5) / 1e6 AS intercept,
  floor(CAST(n * sxy - sx * sy AS DOUBLE) * CAST(n * sxy - sx * sy AS DOUBLE)
        / (CAST(n * sxx - sx * sx AS DOUBLE) * CAST(n * syy - sy * sy AS DOUBLE))
        * 1e6 + 0.5) / 1e6 AS r2
FROM s
"""


_RI_EDGES = (
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("nation", "n_regionkey", "region", "r_regionkey"),
)


def ri_check(sf_dir: str, edges=_RI_EDGES) -> pa.Table:
    """Referential-integrity audit: orphan-row counts for every
    fact -> dimension key edge — the pipeline-health check a corpus
    ingest runs before anything joins.

    Per edge: distinct fact keys via per-block partial dedup + one
    groupby (key-sized), then a LEFT ANTI join against the dimension's
    key column and a count — the dedup_survivors anti-join shape, so
    neither side funnels through the driver.  Returns
    (fact_table, fact_key, dim_table, n_orphan_keys) per edge.
    DuckDB mirror: ri_check_sql (exact)."""
    from ray.data.aggregate import Count

    from ._io import clean_read
    from ._part import compact_parts, nparts_for

    rows = []
    for ft, fk, dt, dk in edges:
        fact = clean_read(f"{sf_dir}/{ft}.parquet", columns=[fk])

        key_schema = pa.schema([(fk, pa.int64())])

        def dedup_block(batch: pa.Table, fk=fk,
                        key_schema=key_schema) -> pa.Table:
            # cast both sides to int64: key dtypes differ across tables
            # (int32 nation keys vs int64 order keys), and Acero
            # refuses mixed-type join keys
            return batch.group_by([fk]).aggregate([]).select([fk]) \
                .cast(key_schema)

        keys = (fact.map_batches(dedup_block, batch_format="pyarrow")
                .groupby(fk).count()
                .select_columns([fk]).materialize())
        n_keys = keys.count()
        # compact to row-bounded blocks: drops the groupby's schema-less
        # empty blocks, which break the anti join's Acero key resolution
        keys = keys.repartition(compact_parts(max(1, n_keys))) \
            .materialize()
        dim = clean_read(f"{sf_dir}/{dt}.parquet", columns=[dk]) \
            .rename_columns({dk: fk}) \
            .map_batches(lambda b, s=key_schema: b.select([s[0].name])
                         .cast(s), batch_format="pyarrow")
        orphans = keys.join(dim, "left_anti",
                            num_partitions=nparts_for(n_keys),
                            on=(fk,))
        rows.append({"fact_table": ft, "fact_key": fk,
                     "dim_table": dt,
                     "n_orphan_keys": orphans.count()})
    return pa.Table.from_pylist(rows, schema=pa.schema([
        ("fact_table", pa.string()), ("fact_key", pa.string()),
        ("dim_table", pa.string()), ("n_orphan_keys", pa.int64())]))


def ri_check_sql(edges=_RI_EDGES) -> str:
    parts = []
    for ft, fk, dt, dk in edges:
        parts.append(
            f"SELECT '{ft}' AS fact_table, '{fk}' AS fact_key, "
            f"'{dt}' AS dim_table, "
            f"(SELECT count(*) FROM (SELECT DISTINCT {fk} FROM {ft}) f "
            f" WHERE {fk} IS NOT NULL AND {fk} NOT IN "
            f" (SELECT {dk} FROM {dt})) AS n_orphan_keys")
    return "\nUNION ALL\n".join(parts)


def ols_multi(sf_dir: str, table: str = "lineitem",
              x_cols: tuple = ("l_quantity", "l_discount", "l_tax"),
              y_col: str = "l_extendedprice") -> pa.Table:
    """Multiple linear regression y = b0 + sum(b_i * x_i) via the
    normal equations over EXACT integer moments: the same
    arbitrary-precision aggregate as correlation_matrix extended with
    the intercept column (a constant 1 feature), solved driver-side
    with one (d+1)x(d+1) numpy solve.  The moment sums are
    merge-order-exact ints, so coefficients are a pure function of the
    data — bit-identical on any layout (tested).

    Returns one row per coefficient: (term, coef) with term 'intercept'
    then x_cols order, plus an 'r2' row; coefficients rounded half-up
    to 6.  Oracle: numpy lstsq on the raw rows (tests) — DuckDB's
    regr_* family is bivariate only."""
    from ray.data.aggregate import AggregateFn

    from ._io import clean_read

    d = len(x_cols)
    cols = list(x_cols) + [y_col]
    ds = clean_read(f"{sf_dir}/{table}.parquet", columns=cols)
    # moment layout: X~ = [1, x_1..x_d, y] (d+2 wide), state =
    # [n] + upper-tri sums of X~_i * X~_j for i<=j (ints, exact)
    w = d + 2

    def acc_block(state, blk):
        if not state:
            state = [0] * (1 + w * (w + 1) // 2)
        state = list(state)
        m = [np.ones(blk.num_rows, dtype=np.int64) * int(_SCALE)]
        for c in cols:
            m.append(np.floor(blk[c].to_numpy(zero_copy_only=False)
                              * _SCALE + 0.5).astype(np.int64))
        state[0] += blk.num_rows
        k = 1
        for i in range(w):
            for j in range(i, w):
                prod = m[i].astype(object) * m[j].astype(object)
                state[k] += int(prod.sum())
                k += 1
        return state

    def merge(s1, s2):
        if not s1:
            return s2
        if not s2:
            return s1
        return [a + b for a, b in zip(s1, s2)]

    agg = AggregateFn(init=lambda _: [], merge=merge,
                      accumulate_block=acc_block, name="olsm")
    st = ds.aggregate(agg)["olsm"]
    n = st[0]
    S = np.empty((w, w), dtype=np.float64)
    k = 1
    for i in range(w):
        for j in range(i, w):
            # moments carry _SCALE^2; the factor cancels in the solve
            S[i, j] = S[j, i] = float(st[k])
            k += 1
    xtx = S[:w - 1, :w - 1]
    xty = S[:w - 1, w - 1]
    try:
        beta = np.linalg.solve(xtx, xty)
    except np.linalg.LinAlgError:
        beta = np.linalg.lstsq(xtx, xty, rcond=None)[0]
    # every column (incl. the constant) carries one _SCALE factor, so
    # X'X and X'y both carry _SCALE^2 and it cancels in the solve:
    # beta is already in natural units, intercept included
    coefs = list(beta[1:])
    intercept = float(beta[0])
    # r2 from the same scaled moments (the scale cancels in the ratio):
    # SSR~ = y~'y~ - beta'X~'y~ ; SST~ = y~'y~ - (sum y~)^2 / n
    sy = S[w - 1, w - 1]
    sum_yt = S[0, w - 1] / _SCALE        # S[0, w-1] = _SCALE * sum(y~)
    sst = sy - (sum_yt ** 2) / n if n else 0.0
    ssr = sy - float(beta @ S[:w - 1, w - 1])
    r2 = 1.0 - ssr / sst if sst > 0 else 0.0

    def r6(v):
        return float(np.floor(v * 1e6 + 0.5) / 1e6)

    rows = [{"term": "intercept", "coef": r6(intercept)}]
    rows += [{"term": c, "coef": r6(float(b))}
             for c, b in zip(x_cols, coefs)]
    rows.append({"term": "r2", "coef": r6(float(r2))})
    return pa.Table.from_pylist(rows, schema=pa.schema([
        ("term", pa.string()), ("coef", pa.float64())]))


# --------------------------------------------- z-score anomaly detection

def value_anomalies(sf_dir: str, z: float = 3.0) -> pa.Table:
    """Events whose value deviates more than ``z`` population standard
    deviations from their event_type's mean — the per-stream outlier
    gate a quality pipeline runs before aggregation.

    Exactness discipline: per-type moments (n, S=sum v, Q=sum v^2 in
    exact milli ints) accumulate as PYTHON ints (overflow-free,
    merge-order-exact — n*Q overflows int64 already at sf0.1);
    the float bounds mu +- z*sigma are then derived ONCE per type with
    a fixed expression shape, quantized to micro-units, and every row
    is compared in INTEGER space (v_milli * 1000 vs the quantized
    bound) — so the anomaly set is a pure function of the exact
    moments, and the SQL mirror computes literally the same
    expression tree (ulp-identical IEEE ops on both engines).

    Returns pa.Table(event_id, event_type, value) of anomalies,
    sorted by event_id.
    """
    import json
    import math

    from ray.data.aggregate import AggregateFn

    from ._io import clean_read

    ds = clean_read(f"{sf_dir}/events.parquet",
                    columns=["event_id", "event_type", "value"])

    def acc_block(state: dict, blk: pa.Table) -> dict:
        state = dict(state)
        ok = pc.is_valid(blk["value"])
        t = blk.filter(ok)
        if t.num_rows == 0:
            return state
        v = np.floor(t["value"].to_numpy(zero_copy_only=False)
                     * 1000.0 + 0.5).astype(np.int64)
        et = np.asarray(t["event_type"].to_pylist(), dtype=object)
        order = np.argsort(et, kind="stable")
        gs, starts = np.unique(et[order], return_index=True)
        bounds = list(starts) + [len(order)]
        for gi, g in enumerate(gs):
            vv = v[order[bounds[gi]:bounds[gi + 1]]]
            n, s, q = state.get(g, (0, 0, 0))
            state[g] = (n + len(vv), s + int(vv.sum(dtype=np.int64)),
                        q + int((vv.astype(object) * vv.astype(object))
                                .sum()))
        return state

    agg = AggregateFn(
        init=lambda _: {},
        merge=lambda a, b: {g: tuple(
            x + y for x, y in zip(a.get(g, (0, 0, 0)),
                                  b.get(g, (0, 0, 0))))
            for g in set(a) | set(b)},
        accumulate_block=acc_block,
        finalize=lambda st: json.dumps(
            {g: list(v) for g, v in st.items()}),
        name="mom")
    moments = json.loads(ds.aggregate(agg)["mom"])

    lo_micro, hi_micro = {}, {}
    for g, (n, s, q) in moments.items():
        if n == 0:
            continue
        # FIXED expression shape, mirrored in SQL term for term
        # (cast-to-double FIRST, then divide — like the SQL's
        # CAST(s AS DOUBLE)/n — so both engines round identically)
        mu = float(s) / float(n)
        var = float(q) / float(n) - mu * mu
        sigma = math.sqrt(max(var, 0.0))
        lo_micro[g] = math.floor((mu - z * sigma) * 1000.0)
        hi_micro[g] = math.ceil((mu + z * sigma) * 1000.0)

    def flag(batch: pa.Table, lo=lo_micro, hi=hi_micro) -> pa.Table:
        ok = pc.is_valid(batch["value"])
        t = batch.filter(ok)
        if t.num_rows == 0:
            return pa.table({"event_id": pa.array([], pa.int64()),
                             "event_type": pa.array([], pa.string()),
                             "value": pa.array([], pa.float64())})
        v = np.floor(t["value"].to_numpy(zero_copy_only=False)
                     * 1000.0 + 0.5).astype(np.int64) * 1000
        et = t["event_type"].to_pylist()
        l = np.array([lo.get(x, 0) for x in et], np.int64)
        h = np.array([hi.get(x, 0) for x in et], np.int64)
        keep = (v < l) | (v > h)
        t = t.filter(pa.array(keep))
        return pa.table({"event_id": t["event_id"],
                         "event_type": t["event_type"],
                         "value": t["value"]})

    import ray

    out = ds.map_batches(flag, batch_format="pyarrow").sort("event_id")
    return out


VALUE_ANOMALIES_SQL = """
WITH m AS (
  SELECT event_type,
         CAST(floor(value * 1000.0 + 0.5) AS BIGINT) AS v,
         event_id, value
  FROM events WHERE value IS NOT NULL
),
mom AS (
  SELECT event_type, count(*) AS n,
         sum(CAST(v AS HUGEINT)) AS s,
         sum(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS q
  FROM m GROUP BY event_type
),
bounds AS (
  SELECT event_type,
         floor((CAST(s AS DOUBLE) / n
                - 3.0 * sqrt(greatest(CAST(q AS DOUBLE) / n
                    - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n),
                    0.0))) * 1000.0) AS lo_micro,
         ceil((CAST(s AS DOUBLE) / n
               + 3.0 * sqrt(greatest(CAST(q AS DOUBLE) / n
                   - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n),
                   0.0))) * 1000.0) AS hi_micro
  FROM mom
)
SELECT m.event_id, m.event_type, m.value
FROM m JOIN bounds b ON m.event_type = b.event_type
WHERE m.v * 1000 < b.lo_micro OR m.v * 1000 > b.hi_micro
ORDER BY m.event_id
"""

"""Multiset set operations: EXCEPT [ALL] / INTERSECT [ALL].

The join family covers semi/anti by KEY; SQL's set operations compare
WHOLE ROWS with multiset (bag) semantics — ``EXCEPT ALL`` subtracts
per-row multiplicities, ``INTERSECT ALL`` takes their minimum.  The
engine lacked them; this module adds all four variants as generic
Dataset operators plus a SQL-checked concrete rendition.

Scale design — one shuffle total: each block of either side collapses
to per-distinct-row counts while local (Arrow group_by, the partial-
aggregation discipline), tagged ``na``/``nb`` by side; the union takes
a single global groupby summing both counters, and the output
multiplicity is pure arithmetic on (na, nb) — ``max(na-nb, 0)``,
``min(na, nb)``, or their DISTINCT gates.  Rows re-emit via one
np.repeat per batch; nothing ever gathers on the driver, and the
shuffled volume is the DISTINCT row count, not the input row count.

NULL discipline: SQL set ops treat NULLs as equal (IS NOT DISTINCT
FROM semantics — two (NULL, 1) rows cancel).  Every column travels
with a null-indicator sidecar (the uid_null discipline), so Arrow /
Ray group_by never sees a null key and NULL==NULL falls out.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .grouping import _sentinel_for

_OPS = ("except_all", "except_distinct", "intersect_all",
        "intersect_distinct")


def set_op(a, b, cols: list[str], op: str,
           col_types: dict | None = None, emit: str = "rows"):
    """Rows of ``a`` <op> rows of ``b`` compared on ``cols`` with SQL
    set-operation semantics (NULLs compare equal).  Returns a Dataset
    with exactly ``cols``; ALL variants preserve multiplicities,
    DISTINCT variants emit each surviving row once.

    ``emit="counts"`` skips the row re-expansion and returns
    (cols..., n) with n the surviving multiplicity — the compact form
    when the caller would only re-aggregate the bag anyway."""
    import ray.data  # noqa: F401
    from ray.data.aggregate import Sum

    if op not in _OPS:
        raise ValueError(f"op must be one of {_OPS}, got {op!r}")
    if emit not in ("rows", "counts"):
        raise ValueError(f"emit must be rows|counts, got {emit!r}")
    if col_types is None:
        sch = a.schema()
        col_types = {c: sch.base_schema.field(c).type for c in cols}

    mid_schema = pa.schema(
        [(c, col_types[c]) for c in cols]
        + [(f"{c}__null", pa.int64()) for c in cols]
        + [("na", pa.int64()), ("nb", pa.int64())])
    out_fields = [(c, col_types[c]) for c in cols]
    out_schema = pa.schema(out_fields if emit == "rows"
                           else out_fields + [("n", pa.int64())])
    gb_keys = list(cols) + [f"{c}__null" for c in cols]

    def partial(batch: pa.Table, side: str) -> pa.Table:
        if batch.num_rows == 0:
            return mid_schema.empty_table()
        prep: dict[str, pa.Array | pa.ChunkedArray] = {}
        for c in cols:
            col = batch[c]
            typ = col_types[c]
            prep[c] = pc.fill_null(col, pa.scalar(_sentinel_for(typ),
                                                  typ))
            prep[f"{c}__null"] = pc.cast(pc.is_null(col), pa.int64())
        g = pa.table(prep).group_by(gb_keys).aggregate([([],
                                                         "count_all")])
        n = g["count_all"]
        zero = pa.array(np.zeros(len(g), np.int64))
        out = {k: g[k] for k in gb_keys}
        out["na"] = n if side == "a" else zero
        out["nb"] = n if side == "b" else zero
        return pa.table(out).select(mid_schema.names).cast(mid_schema)

    counts = (a.map_batches(lambda t: partial(t, "a"),
                            batch_format="pyarrow")
              .union(b.map_batches(lambda t: partial(t, "b"),
                                   batch_format="pyarrow"))
              .groupby(gb_keys)
              .aggregate(Sum("na", alias_name="na"),
                         Sum("nb", alias_name="nb")))

    def expand(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return out_schema.empty_table()
        na = pc.cast(batch["na"], pa.int64()).to_numpy(
            zero_copy_only=False)
        nb = pc.cast(batch["nb"], pa.int64()).to_numpy(
            zero_copy_only=False)
        if op == "except_all":
            reps = np.maximum(na - nb, 0)
        elif op == "intersect_all":
            reps = np.minimum(na, nb)
        elif op == "except_distinct":
            reps = ((na > 0) & (nb == 0)).astype(np.int64)
        else:  # intersect_distinct
            reps = ((na > 0) & (nb > 0)).astype(np.int64)
        if emit == "counts":
            keep = reps > 0
            taken = batch.take(pa.array(np.flatnonzero(keep)))
            reps = reps[keep]
        else:
            idx = np.repeat(np.arange(len(reps), dtype=np.int64), reps)
            taken = batch.take(pa.array(idx))
        out: dict[str, pa.Array | pa.ChunkedArray] = {}
        for c in cols:
            null = pc.equal(taken[f"{c}__null"], pa.scalar(1))
            out[c] = pc.if_else(null, pa.scalar(None, col_types[c]),
                                pc.cast(taken[c], col_types[c]))
        if emit == "counts":
            out["n"] = pa.array(reps, pa.int64())
        return pa.table(out).select(out_schema.names)

    return counts.map_batches(expand, batch_format="pyarrow")


def except_all(a, b, cols, **kw):
    return set_op(a, b, cols, "except_all", **kw)


def except_distinct(a, b, cols, **kw):
    return set_op(a, b, cols, "except_distinct", **kw)


def intersect_all(a, b, cols, **kw):
    return set_op(a, b, cols, "intersect_all", **kw)


def intersect_distinct(a, b, cols, **kw):
    return set_op(a, b, cols, "intersect_distinct", **kw)


# --------------------------------------------------------------------
# concrete, SQL-checkable rendition over the testdata


def click_except_error_surplus(sf_dir: str):
    """Per-user surplus click multiplicity: the multiset of click-event
    user_ids EXCEPT ALL error-event user_ids, rolled up to (user_id,
    n_surplus) so the result is compact at any scale.  A user with 7
    clicks and 2 errors contributes 5; one with fewer clicks than
    errors disappears — the bag-subtraction semantics a semi/anti join
    cannot express.  NULL user_ids cancel against each other (SQL set
    ops treat NULLs as equal).  Because the op compares whole rows,
    the surviving multiplicity per distinct user IS the rollup — the
    compact ``emit="counts"`` form, no re-expansion and no second
    shuffle.  Oracle: CLICK_EXCEPT_ERROR_SQL."""
    from .relational import _read

    ev = _read(sf_dir, "events", ["user_id", "event_type"])

    def split(batch: pa.Table, want: str) -> pa.Table:
        keep = pc.equal(batch["event_type"], pa.scalar(want))
        return batch.filter(keep).select(["user_id"])

    clicks = ev.map_batches(lambda t: split(t, "click"),
                            batch_format="pyarrow")
    errors = ev.map_batches(lambda t: split(t, "error"),
                            batch_format="pyarrow")
    surplus = except_all(clicks, errors, ["user_id"],
                         col_types={"user_id": pa.int64()},
                         emit="counts")

    fin_schema = pa.schema([("user_id", pa.int64()),
                            ("n_surplus", pa.int64())])

    def finalize(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return fin_schema.empty_table()
        return pa.table({
            "user_id": pc.cast(batch["user_id"], pa.int64()),
            "n_surplus": pc.cast(batch["n"], pa.int64()),
        })

    return surplus.map_batches(finalize, batch_format="pyarrow")


CLICK_EXCEPT_ERROR_SQL = """
SELECT user_id, count(*) AS n_surplus
FROM (
  SELECT user_id FROM events WHERE event_type = 'click'
  EXCEPT ALL
  SELECT user_id FROM events WHERE event_type = 'error'
)
GROUP BY user_id
"""

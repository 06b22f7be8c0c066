"""GROUPING SETS / ROLLUP / CUBE — multi-level aggregation in ONE shuffle.

The relational family (relational.py, tpch_more.py) covers every
single-level GROUP BY shape; this module adds the multi-level one:
a query that wants per-(a,b) cells, per-a subtotals and a grand total
at once (SQL ``GROUP BY ROLLUP / CUBE / GROUPING SETS``).  Reference
analog: the worker's end-of-run report prints per-source, per-status
and overall counters from the same pass (ocr_worker.py's run summary);
generalized here to arbitrary grouping lattices.

Scale design — the naive plan runs one groupby per grouping set
(|sets| full shuffles of the fact table).  Here every block is
partially aggregated ONCE PER SET while it is still local (each
partial is at most |distinct keys in block| rows, and the coarser
sets collapse harder), and the union of partials takes a single
global groupby whose input is already block-collapsed.  One shuffle,
total rows shuffled <= sum over sets of per-block distinct counts —
for low-cardinality keys this is ~|sets| x |blocks| x |key domain|
rows regardless of corpus size.

NULL discipline: a subtotal row's "inactive" key and a DATA null in an
active key must not conflate (SQL disambiguates via GROUPING()).
Every key column travels with a null-indicator sidecar (the uid_null
sentinel discipline), and the output carries ``grouping_id`` computed
exactly like DuckDB's ``GROUPING(k1, ..., kn)`` (first key = most
significant bit), so (grouping_id, keys) is unambiguous even when the
data itself contains NULL keys.

Aggregates are exact int64 sums + count_all (the repo's
order-independent integer discipline); avg/ratios derive downstream.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from ._num import round_half_up  # noqa: F401  (re-export convenience)


def _sentinel_for(typ: pa.DataType):
    if pa.types.is_integer(typ):
        return 0
    if pa.types.is_string(typ) or pa.types.is_large_string(typ):
        return ""
    if pa.types.is_timestamp(typ):
        return 0
    raise TypeError(f"unsupported grouping key type {typ}")


def grouping_sets(ds, keys: list[str], sets: list[tuple],
                  sum_cols: list[str], count_name: str = "n_rows",
                  key_types: dict | None = None):
    """Aggregate ``ds`` over every grouping set in ``sets`` (tuples of
    names drawn from ``keys``) in one shuffle.

    ``sum_cols`` must be int64 columns (quantize money/floats to cents
    or millis upstream — same contract as every aggregate here).
    Returns a Dataset with ``keys`` (NULL where inactive or data-null),
    ``grouping_id`` (DuckDB GROUPING() bit order: keys[0] is the most
    significant bit; bit set = key INACTIVE in that set), ``count_name``
    and one ``sum_<col>`` per sum column.

    ``key_types`` pins the key column Arrow types without executing the
    input (pass it when you know them); otherwise ``ds.schema()`` is
    consulted.  Explicit types keep every block — including the
    schema-less empties Ray's sort groupby can emit — typed end to end.
    """
    import ray.data  # noqa: F401
    from ray.data.aggregate import Sum

    for s in sets:
        for k in s:
            if k not in keys:
                raise ValueError(f"grouping set key {k!r} not in keys")
    gids = [sum((1 << (len(keys) - 1 - i)) for i, k in enumerate(keys)
                if k not in s) for s in sets]
    if len(set(gids)) != len(gids):
        raise ValueError("duplicate grouping sets")

    if key_types is None:
        sch = ds.schema()
        key_types = {k: sch.base_schema.field(k).type for k in keys}

    partial_schema = pa.schema(
        [("grouping_id", pa.int64())]
        + [(k, key_types[k]) for k in keys]
        + [(f"{k}__null", pa.int64()) for k in keys]
        + [("__n", pa.int64())]
        + [(f"__sum_{c}", pa.int64()) for c in sum_cols])
    out_schema = pa.schema(
        [(k, key_types[k]) for k in keys]
        + [("grouping_id", pa.int64()), (count_name, pa.int64())]
        + [(f"sum_{c}", pa.int64()) for c in sum_cols])

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return partial_schema.empty_table()
        outs = []
        for s, gid in zip(sets, gids):
            cols: dict[str, pa.Array | pa.ChunkedArray] = {}
            n = batch.num_rows
            for k in keys:
                typ = key_types[k]
                if k in s:
                    col = batch[k]
                    cols[k] = pc.fill_null(
                        col, pa.scalar(_sentinel_for(typ), typ))
                    cols[f"{k}__null"] = pc.cast(
                        pc.is_null(col), pa.int64())
                else:
                    sent = _sentinel_for(typ)
                    cols[k] = pa.array([sent] * n, typ)
                    cols[f"{k}__null"] = pa.array([1] * n, pa.int64())
            cols["grouping_id"] = pa.array([gid] * n, pa.int64())
            for c in sum_cols:
                cols[c] = batch[c]
            t = pa.table(cols)
            gb_keys = (["grouping_id"] + list(keys)
                       + [f"{k}__null" for k in keys])
            g = t.group_by(gb_keys).aggregate(
                [([], "count_all")] + [(c, "sum") for c in sum_cols])
            out = {k: g[k] for k in gb_keys}
            out["__n"] = g["count_all"]
            for c in sum_cols:
                out[f"__sum_{c}"] = g[f"{c}_sum"]
            outs.append(pa.table(out).select(partial_schema.names)
                        .cast(partial_schema))
        return pa.concat_tables(outs)

    gb_keys_final = (["grouping_id"] + list(keys)
                     + [f"{k}__null" for k in keys])
    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(gb_keys_final)
           .aggregate(Sum("__n", alias_name=count_name),
                      *[Sum(f"__sum_{c}", alias_name=f"sum_{c}")
                        for c in sum_cols]))

    def restore(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return out_schema.empty_table()
        cols: dict[str, pa.Array | pa.ChunkedArray] = {}
        for k in keys:
            null = pc.equal(batch[f"{k}__null"], pa.scalar(1))
            cols[k] = pc.if_else(null, pa.scalar(
                None, key_types[k]), pc.cast(batch[k], key_types[k]))
        cols["grouping_id"] = batch["grouping_id"]
        cols[count_name] = pc.cast(batch[count_name], pa.int64())
        for c in sum_cols:
            cols[f"sum_{c}"] = pc.cast(batch[f"sum_{c}"], pa.int64())
        return pa.table(cols).select(out_schema.names)

    return agg.map_batches(restore, batch_format="pyarrow")


def rollup(ds, keys: list[str], sum_cols: list[str], **kw):
    """GROUP BY ROLLUP(keys): every prefix of ``keys`` plus the grand
    total — len(keys)+1 grouping sets, one shuffle."""
    sets = [tuple(keys[:i]) for i in range(len(keys), -1, -1)]
    return grouping_sets(ds, keys, sets, sum_cols, **kw)


def cube(ds, keys: list[str], sum_cols: list[str], **kw):
    """GROUP BY CUBE(keys): all 2^len(keys) subsets, one shuffle."""
    sets = []
    for mask in range(1 << len(keys)):
        sets.append(tuple(k for i, k in enumerate(keys)
                          if mask & (1 << i)))
    return grouping_sets(ds, keys, sets, sum_cols, **kw)


# --------------------------------------------------------------------
# concrete, SQL-checkable renditions over the testdata


def orders_status_rollup(sf_dir: str):
    """Order counts + exact total cents by ROLLUP(status, priority):
    per-(status, priority) cells, per-status subtotals, grand total.
    Oracle: ORDERS_STATUS_ROLLUP_SQL (GROUP BY ROLLUP + GROUPING()).
    Named orders_status_rollup to avoid colliding with the earlier
    relational.orders_rollup (ROLLUP(priority, year) -- a DIFFERENT query)."""
    from .relational import _cents, _read

    ds = _read(sf_dir, "orders",
               ["o_orderstatus", "o_orderpriority", "o_totalprice"])

    def prep(batch: pa.Table) -> pa.Table:
        return pa.table({
            "o_orderstatus": batch["o_orderstatus"],
            "o_orderpriority": batch["o_orderpriority"],
            "cents": _cents(batch["o_totalprice"]),
        })

    out = rollup(ds.map_batches(prep, batch_format="pyarrow"),
                 ["o_orderstatus", "o_orderpriority"], ["cents"],
                 count_name="n_orders",
                 key_types={"o_orderstatus": pa.string(),
                            "o_orderpriority": pa.string()})

    fin_schema = pa.schema([
        ("o_orderstatus", pa.string()), ("o_orderpriority", pa.string()),
        ("gid", pa.int64()), ("n_orders", pa.int64()),
        ("total_cents", pa.int64())])

    def finalize(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return fin_schema.empty_table()
        return pa.table({
            "o_orderstatus": batch["o_orderstatus"],
            "o_orderpriority": batch["o_orderpriority"],
            "gid": batch["grouping_id"],
            "n_orders": pc.cast(batch["n_orders"], pa.int64()),
            "total_cents": pc.cast(batch["sum_cents"], pa.int64()),
        })

    return out.map_batches(finalize, batch_format="pyarrow")


ORDERS_STATUS_ROLLUP_SQL = """
SELECT o_orderstatus, o_orderpriority,
       CAST(GROUPING(o_orderstatus, o_orderpriority) AS BIGINT) AS gid,
       count(*) AS n_orders,
       CAST(sum(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
            AS BIGINT) AS total_cents
FROM orders
GROUP BY ROLLUP(o_orderstatus, o_orderpriority)
"""


def events_type_year_cube(sf_dir: str):
    """Event counts + exact value millis by CUBE(event_type, year):
    all four grouping sets in one shuffle.  NULL values sum as 0
    (COALESCE in the mirror); years derive from epoch-us floor
    division on both engines via EXTRACT(year).
    Oracle: EVENTS_CUBE_SQL."""
    from .relational import _read

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])

    def prep(batch: pa.Table) -> pa.Table:
        milli = pc.cast(pc.floor(pc.add(pc.multiply(
            pc.fill_null(batch["value"], 0.0), pa.scalar(1000.0)),
            pa.scalar(0.5))), pa.int64())
        return pa.table({
            "event_type": batch["event_type"],
            "year": pc.cast(pc.year(batch["ts"]), pa.int64()),
            "milli": milli,
        })

    out = cube(ds.map_batches(prep, batch_format="pyarrow"),
               ["event_type", "year"], ["milli"], count_name="n_events",
               key_types={"event_type": pa.string(), "year": pa.int64()})

    fin_schema = pa.schema([
        ("event_type", pa.string()), ("year", pa.int64()),
        ("gid", pa.int64()), ("n_events", pa.int64()),
        ("value_milli", pa.int64())])

    def finalize(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 or batch.num_columns == 0:
            return fin_schema.empty_table()
        return pa.table({
            "event_type": batch["event_type"],
            "year": batch["year"],
            "gid": batch["grouping_id"],
            "n_events": pc.cast(batch["n_events"], pa.int64()),
            "value_milli": pc.cast(batch["sum_milli"], pa.int64()),
        })

    return out.map_batches(finalize, batch_format="pyarrow")


EVENTS_CUBE_SQL = """
SELECT event_type, CAST(EXTRACT(year FROM ts) AS BIGINT) AS year,
       CAST(GROUPING(event_type, EXTRACT(year FROM ts)) AS BIGINT)
         AS gid,
       count(*) AS n_events,
       CAST(sum(CAST(floor(COALESCE(value, 0) * 1000 + 0.5) AS BIGINT))
            AS BIGINT) AS value_milli
FROM events
GROUP BY CUBE(event_type, EXTRACT(year FROM ts))
"""

"""Order-independent whole-table fingerprints — the cross-run
validation primitive behind "did this rewrite/migration/resume produce
the SAME table?" at any scale.

A table is fingerprinted as the MULTISET of its row hashes: one
streaming aggregate whose state is (n_rows, sum h, sum h^2) with both
sums taken mod 2^64 — commutative and associative, so the result is
independent of block layout, task order, and merge order by
construction (the repo-wide determinism discipline).  The second
moment hardens the plain sum against crafted collisions; the final
fingerprint folds the sorted column names + types in, so two tables
with equal values under different schemas do not collide.

Row hashes come from pandas' fixed-key siphash
(``pd.util.hash_pandas_object``): vectorized, null-aware, and
deterministic across processes for one pandas version — the same
in-run-determinism contract the bloom join and cooccur partitioning
already rely on.  Fingerprints are for comparing runs within one
environment, not an archival format (a pandas major upgrade may change
them; the comparison both sides of which you care about is always
computed fresh).

Driver memory is O(1); nothing materializes.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa

_M64 = (1 << 64) - 1


def table_fingerprint(ds, columns: list[str] | None = None) -> dict:
    """Fingerprint a Dataset: ``{"n_rows", "fingerprint"}``.

    ``columns`` restricts the comparison (e.g. ignore a mutable
    updated_at column); by default every column participates.  Columns
    are compared by NAME (sorted), not position, so two writes with
    different column order fingerprint equal.
    """
    from ray.data.aggregate import AggregateFn

    schema = ds.schema()
    names = sorted(columns if columns is not None else schema.names)
    missing = [c for c in names if c not in schema.names]
    if missing:
        raise ValueError(f"table_fingerprint: columns {missing} not in "
                         f"dataset schema {schema.names}")
    if columns is not None:
        ds = ds.select_columns(list(names))

    def acc_block(state, blk: pa.Table):
        n, s1, s2 = state if state else (0, 0, 0)
        if blk.num_rows == 0:
            return (n, s1, s2)
        h = pd.util.hash_pandas_object(
            blk.select(names).to_pandas(), index=False) \
            .to_numpy().astype(np.uint64)
        with np.errstate(over="ignore"):
            b1 = int(h.sum(dtype=np.uint64))          # wraps mod 2^64
            b2 = int((h * h).sum(dtype=np.uint64))
        return (n + len(h), (s1 + b1) & _M64, (s2 + b2) & _M64)

    def merge(a, b):
        if not a:
            return b
        if not b:
            return a
        return (a[0] + b[0], (a[1] + b[1]) & _M64, (a[2] + b[2]) & _M64)

    agg = AggregateFn(init=lambda _: (0, 0, 0), merge=merge,
                      accumulate_block=acc_block,
                      finalize=lambda s: list(s), name="fp")
    n, s1, s2 = ds.aggregate(agg)["fp"]

    # fold the (sorted) schema in, typed: equal values under a renamed
    # or re-typed column are a DIFFERENT table
    type_of = dict(zip(schema.names, schema.types))
    typed = ",".join(f"{c}:{type_of[c]}" for c in names)
    digest = hashlib.blake2b(
        f"{typed}|{n}|{s1}|{s2}".encode(), digest_size=16).hexdigest()
    return {"n_rows": int(n), "fingerprint": digest}


def tables_equal(ds_a, ds_b, columns: list[str] | None = None) -> bool:
    """True iff the two Datasets hold the same multiset of rows over
    ``columns`` (order- and layout-independent)."""
    fa = table_fingerprint(ds_a, columns)
    fb = table_fingerprint(ds_b, columns)
    return fa == fb

"""Poison-row quarantine for arbitrary batch UDFs.

At 100 TB a 10-hour job WILL meet rows its UDF cannot digest — one
malformed record must not kill the run (Ray retries the task, hits
the same row, and fails the job after N retries).  The extraction
pipeline solves this with its reject taxonomy; ``safe_map_batches``
generalizes the pattern to ANY ``pa.Table -> pa.Table`` UDF:

* a failing batch is BISECTED — halves retried recursively, so the
  poison rows isolate in O(log batch_size) extra UDF calls while
  every healthy row still processes (a per-row try/except would pay
  Python per row on the happy path; bisection costs nothing unless a
  batch actually fails);
* isolated poison rows are written to ``quarantine_dir`` with their
  ORIGINAL input columns plus ``_error`` / ``_error_type`` — the
  operator's reject taxonomy — as parquet named by a content hash
  (deterministic, so retried tasks overwrite instead of duplicating);
* ``output_schema`` is required because a fully-poisoned batch must
  still emit a typed empty block (the repo-wide empty-block rule);
* ``max_quarantine_frac`` guards against the opposite failure: if the
  UDF rejects more than this fraction of a batch, the batch re-raises
  — a systematically-broken UDF should fail the job loudly, not
  quarantine the corpus.
"""

from __future__ import annotations

import hashlib
import os
import traceback

import pyarrow as pa


def _write_quarantine(rows: pa.Table, quarantine_dir: str) -> None:
    import pyarrow.parquet as pq

    os.makedirs(quarantine_dir, exist_ok=True)
    digest = hashlib.blake2b(str(rows.to_pydict()).encode(),
                             digest_size=10).hexdigest()
    out = os.path.join(quarantine_dir, f"q-{digest}.parquet")
    tmp = out + f".tmp-{os.getpid()}"
    pq.write_table(rows, tmp)
    os.replace(tmp, out)   # content-named: retries overwrite


def safe_map_batches(ds, fn, output_schema: pa.Schema,
                     quarantine_dir: str,
                     max_quarantine_frac: float = 0.5,
                     batch_format: str = "pyarrow",
                     **map_kwargs):
    """``ds.map_batches(fn)`` that survives poison rows.  Returns the
    Dataset of ``fn`` outputs over every row that processes; rows on
    which ``fn`` raises are bisect-isolated and land in
    ``quarantine_dir`` (input columns + _error + _error_type).

    ``fn`` must be row-independent (output rows of a subset == subset
    of output rows) — the bisection contract, same as map_batches'
    own batching contract."""
    if batch_format != "pyarrow":
        raise ValueError("safe_map_batches: pyarrow batches only")

    def process(batch: pa.Table):
        """-> (output table, quarantined-input table or None)"""
        try:
            out = fn(batch)
            return out, None
        except Exception as e:
            if batch.num_rows <= 1:
                err = pa.table({
                    **{c: batch[c] for c in batch.column_names},
                    "_error": pa.array(
                        [traceback.format_exception_only(
                            type(e), e)[-1].strip()] * batch.num_rows,
                        pa.string()),
                    "_error_type": pa.array(
                        [type(e).__name__] * batch.num_rows,
                        pa.string())})
                return output_schema.empty_table(), err
            mid = batch.num_rows // 2
            out_a, bad_a = process(batch.slice(0, mid))
            out_b, bad_b = process(batch.slice(mid))
            bad = [b for b in (bad_a, bad_b) if b is not None]
            return (pa.concat_tables([out_a, out_b]),
                    pa.concat_tables(bad) if bad else None)

    def wrapped(batch: pa.Table) -> pa.Table:
        out, bad = process(batch)
        if bad is not None:
            if (batch.num_rows and
                    bad.num_rows / batch.num_rows > max_quarantine_frac):
                raise RuntimeError(
                    f"safe_map_batches: {bad.num_rows}/"
                    f"{batch.num_rows} rows failed — above "
                    f"max_quarantine_frac={max_quarantine_frac}; the "
                    "UDF looks systematically broken "
                    f"(first error: {bad['_error'][0].as_py()})")
            _write_quarantine(bad, quarantine_dir)
        if out.num_rows == 0:
            return output_schema.empty_table()
        return out.select(output_schema.names)

    return ds.map_batches(wrapped, batch_format="pyarrow",
                          **map_kwargs)


def read_quarantine(quarantine_dir: str):
    """The quarantined rows as a Dataset (empty dir -> empty)."""
    import ray.data as rd

    if not os.path.isdir(quarantine_dir) or not any(
            f.endswith(".parquet")
            for f in os.listdir(quarantine_dir)):
        return None
    return rd.read_parquet(quarantine_dir)

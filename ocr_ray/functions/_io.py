"""Shared parquet-read helper.

``read_parquet`` blocks inherit the file's pandas schema metadata (a
dict), which Ray's operator-fusion schema hashing cannot hash — every
downstream stage then logs "Failed to hash the schemas" and empty
RefBundle warnings.  Passing an explicit metadata-free schema (read once
from the footer, driver-side) keeps every block cleanly typed.
"""

from __future__ import annotations

import os

import pyarrow as pa


def clean_read(path: str, columns: list[str] | None = None):
    """ray.data.read_parquet with a metadata-stripped explicit schema."""
    import pyarrow.parquet as pqt
    import ray.data as rd

    probe = path
    if os.path.isdir(path):
        parts = sorted(f for f in os.listdir(path) if f.endswith(".parquet"))
        if parts:
            probe = os.path.join(path, parts[0])
    try:
        sch = pqt.read_schema(probe).remove_metadata()
        if columns:
            sch = pa.schema([sch.field(c) for c in columns])
    except Exception:
        sch = None
    return rd.read_parquet(path, columns=columns, schema=sch)

"""Schema-level table operations: heterogeneous-shard union and
small-file compaction.

Both close real 100-TB operational gaps rather than query gaps:

* ``union_by_name`` — shards written months apart drift: columns get
  added, int32 ids get widened, column order changes.  A positional
  ``Dataset.union`` silently misaligns them; this unifies by NAME with
  explicit numeric widening and null-fill for missing columns (DuckDB
  ``UNION ALL BY NAME`` semantics), and REFUSES genuinely incompatible
  types instead of guessing.

* ``compact_parquet_dir`` — streaming pipelines and incremental
  appends leave directories of thousands of small files; reads then
  pay per-file open/footer costs and schedulers pay per-task overhead.
  Compaction here is metadata-driven: the driver reads only file
  SIZES, bin-packs files into ~target-size groups deterministically
  (a pure function of the sorted file list), and one Ray task per
  group rewrites its files into one output — no row ever shuffles, no
  driver materialization.  Outputs commit atomically (tmp + rename)
  and are named by group id, so a killed run resumes by skipping
  finished groups (the repo-wide resumable-output rule).

Reference analog: the reference's ocr_worker accumulates one output
file per processed document (ocr_worker.py result writes); any real
deployment of it needs exactly this compaction pass downstream.
"""

from __future__ import annotations

import os

import pyarrow as pa

_INT_ORDER = {pa.int8(): 0, pa.int16(): 1, pa.int32(): 2, pa.int64(): 3,
              pa.uint8(): 0, pa.uint16(): 1, pa.uint32(): 2,
              pa.uint64(): 3}
_FLOATS = (pa.float32(), pa.float64())


def _unify(a: pa.DataType, b: pa.DataType):
    """Widen two Arrow types, or None if incompatible."""
    if a.equals(b):
        return a
    ints = (a in _INT_ORDER, b in _INT_ORDER)
    floats = (a in _FLOATS, b in _FLOATS)
    if all(ints):
        if pa.types.is_signed_integer(a) == pa.types.is_signed_integer(b):
            return a if _INT_ORDER[a] >= _INT_ORDER[b] else b
        if pa.uint64() in (a, b):
            return None   # no signed 64-bit type holds uint64
        # mixed signedness: the next-wider SIGNED type holds both
        w = max(_INT_ORDER[a], _INT_ORDER[b]) + 1   # 1..3 past int8
        return [pa.int8(), pa.int16(), pa.int32(),
                pa.int64()][min(w, 3)]
    if all(floats):
        return pa.float64()
    if (ints[0] and floats[1]) or (floats[0] and ints[1]):
        return pa.float64()
    if pa.types.is_null(a):
        return b
    if pa.types.is_null(b):
        return a
    return None


def union_by_name(dss: list, strict: bool = False):
    """Union Datasets aligning columns by NAME (DuckDB ``UNION ALL BY
    NAME``): column order is ignored, integer/float widths widen to
    the common type, and columns absent from a shard are null-filled —
    unless ``strict=True``, which refuses any missing column.
    Incompatible types (e.g. string vs int64) always refuse, with the
    conflicting column named.

    Target column order = first appearance across the inputs, so the
    result schema is a pure function of the input list."""
    if not dss:
        raise ValueError("union_by_name: no datasets")

    schemas = []
    for ds in dss:
        sch = ds.schema()
        schemas.append(sch.base_schema if hasattr(sch, "base_schema")
                       else sch)

    order: list[str] = []
    types: dict[str, pa.DataType] = {}
    for sch in schemas:
        for f in sch:
            if f.name not in types:
                order.append(f.name)
                types[f.name] = f.type
            else:
                u = _unify(types[f.name], f.type)
                if u is None:
                    raise ValueError(
                        f"union_by_name: column {f.name!r} has "
                        f"incompatible types {types[f.name]} vs "
                        f"{f.type} — cast upstream")
                types[f.name] = u
    if strict:
        for i, sch in enumerate(schemas):
            missing = sorted(set(order) - set(sch.names))
            if missing:
                raise ValueError(
                    f"union_by_name: strict=True and input {i} lacks "
                    f"columns {missing}")
    target = pa.schema([(c, types[c]) for c in order])

    def conform(batch: pa.Table, target=target) -> pa.Table:
        cols = []
        for f in target:
            if f.name in batch.column_names:
                col = batch[f.name]
                if not col.type.equals(f.type):
                    col = col.cast(f.type)
            else:
                col = pa.nulls(batch.num_rows, f.type)
            cols.append(col)
        return pa.table(dict(zip(target.names, cols)))

    out = None
    for ds in dss:
        conformed = ds.map_batches(conform, batch_format="pyarrow")
        out = conformed if out is None else out.union(conformed)
    return out


def _plan_groups(files: list[tuple[str, int]],
                 target_bytes: int) -> list[list[str]]:
    """Greedy bin-pack IN SORTED FILE ORDER — deterministic, and
    neighboring files (usually written together) stay together."""
    groups, cur, cur_sz = [], [], 0
    for path, sz in files:
        if cur and cur_sz + sz > target_bytes:
            groups.append(cur)
            cur, cur_sz = [], 0
        cur.append(path)
        cur_sz += sz
    if cur:
        groups.append(cur)
    return groups


def compact_parquet_dir(src_dir: str, out_dir: str,
                        target_mb: int = 256,
                        resume: bool = True) -> dict:
    """Rewrite a directory of small parquet files into ~``target_mb``
    files.  Metadata-driven (driver touches only file names + sizes);
    one Ray task per output group; atomic per-file commit; a re-run
    with ``resume=True`` skips groups whose output already exists.

    All files must share one schema (checked from footers) — a
    heterogeneous directory should go through ``union_by_name`` +
    ``write_parquet`` instead, which rewrites rows anyway.

    Returns {n_input_files, n_output_files, n_skipped, n_rows}.
    """
    import ray
    import pyarrow.parquet as pq

    files = sorted(
        (os.path.join(src_dir, f) for f in os.listdir(src_dir)
         if f.endswith(".parquet")))
    if not files:
        raise ValueError(f"compact_parquet_dir: no parquet in {src_dir}")
    sized = [(f, os.stat(f).st_size) for f in files]

    base = pq.read_schema(files[0])
    for f in files[1:]:
        sch = pq.read_schema(f)
        if not sch.equals(base):
            raise ValueError(
                f"compact_parquet_dir: {f} schema differs from "
                f"{files[0]} — harmonize with union_by_name first")

    groups = _plan_groups(sized, target_mb * (1 << 20))
    os.makedirs(out_dir, exist_ok=True)
    # sweep stale tmps from killed tasks: incomplete by definition
    # (the atomic rename is the only commit), and a later directory
    # read would otherwise trip over them
    for f in os.listdir(out_dir):
        if ".tmp-" in f:
            os.unlink(os.path.join(out_dir, f))

    # the plan is a pure function of (sorted file list, sizes,
    # target); pin it so a resume can never mix two plans — output
    # names are positional, and a changed source set would silently
    # pair stale compact-NNNNN files with different input groups
    import json

    plan = {"target_mb": target_mb,
            "groups": [[os.path.basename(p) for p in g]
                       for g in groups]}
    plan_path = os.path.join(out_dir, "_plan.json")
    if os.path.exists(plan_path):
        with open(plan_path) as f:
            prev = json.load(f)
        if prev != plan:
            raise ValueError(
                "compact_parquet_dir: existing outputs in "
                f"{out_dir} were written under a DIFFERENT plan "
                "(source files or target_mb changed) — remove the "
                "output dir and re-run")
    else:
        tmp = plan_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(plan, f)
        os.replace(tmp, plan_path)

    @ray.remote
    def compact_group(gid: int, paths: list[str]) -> tuple[int, int]:
        out = os.path.join(out_dir, f"compact-{gid:05d}.parquet")
        if resume and os.path.exists(out):
            # skipped, but report the TRUE committed row count
            # (footer metadata only — no data read)
            return (pq.ParquetFile(out).metadata.num_rows, -1)
        tbl = pa.concat_tables([pq.read_table(p) for p in paths])
        tmp = out + ".tmp"
        pq.write_table(tbl, tmp)
        os.replace(tmp, out)   # atomic commit
        return (tbl.num_rows, gid)

    results = ray.get([compact_group.remote(g, paths)
                       for g, paths in enumerate(groups)])
    skipped = sum(1 for _, g in results if g == -1)
    return {"n_input_files": len(files),
            "n_output_files": len(groups),
            "n_skipped": skipped,
            "n_rows": sum(n for n, _ in results)}

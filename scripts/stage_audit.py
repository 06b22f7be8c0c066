"""Per-stage execution audit for any registry query: runs the query,
prints wall time, and when the result is a (lazy or materialized)
Dataset also prints Ray's per-operator ``ds.stats()`` so shuffle vs UDF
vs read cost is visible per stage.

Usage: python scripts/stage_audit.py <query> [sf_dir]

Queries that return a pyarrow Table or pandas DataFrame executed their
Datasets internally; for those only the wall time is reported (point
the audit at the function's own Datasets when digging deeper).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    if len(sys.argv) < 2:
        print(__doc__)
        raise SystemExit(2)
    name = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"

    import ray

    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", "32")),
                 include_dashboard=False, logging_level="ERROR")

    import ray.data

    import __ray_entry__ as entry

    qs = entry.queries()
    if name not in qs:
        print(f"unknown query {name!r}; choices:")
        for k in sorted(qs):
            print(" ", k)
        raise SystemExit(2)

    t0 = time.time()
    res = qs[name](sf_dir)
    if isinstance(res, ray.data.Dataset):
        res = res.materialize()
        wall = time.time() - t0
        print(f"{name}: {wall:.2f} s, {res.count()} rows")
        print(res.stats())
    else:
        wall = time.time() - t0
        n = len(res)
        print(f"{name}: {wall:.2f} s, {n} rows "
              f"(driver-folded result; stats live inside the function)")
    ray.shutdown()


if __name__ == "__main__":
    main()

"""Endurance / bounded-memory evidence run (BASELINE.md rows).

Runs the flagship extraction end-to-end over a large synthetic corpus
(default 768k docs = 32x the bench corpus) with the Ray object store
capped (default 500 MB vs the ~37 GB single-node default), proving the
pipeline STREAMS: block spill + backpressure instead of OOM.  Prints one
JSON line with wall time, docs/s and the object-store spill statistics.

    python scripts/endurance.py                  # 768k docs, 500 MB cap
    python scripts/endurance.py --docs 24000     # quick smoke
    python scripts/endurance.py --no-cap         # uncapped control

The corpus is generated once through Ray itself (pure function of
(seed, i)) and cached under /tmp keyed by (seed, n) — identical content
to the bench corpus at 32x scale.
"""

from __future__ import annotations

import argparse
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def spill_stats() -> dict:
    """Parse cumulative spill counters from the live session's raylet log
    (the debug-state dump Ray writes periodically; works in local mode
    where the GCS memory-summary RPC is unavailable)."""
    import glob

    out: dict = {"spilled_mib": 0, "spilled_objects": 0,
                 "restored_mib": 0, "restored_objects": 0}
    logs = sorted(glob.glob("/tmp/ray/session_latest/logs/raylet*.out"))
    for path in logs:
        try:
            txt = open(path, errors="replace").read()
        except OSError:  # pragma: no cover
            continue
        # keep the LAST (cumulative) occurrence per log
        for m in re.finditer(
                r"Spilled (\d+) MiB, (\d+) objects", txt):
            out["spilled_mib"] = max(out["spilled_mib"], int(m.group(1)))
            out["spilled_objects"] = max(out["spilled_objects"],
                                         int(m.group(2)))
        for m in re.finditer(
                r"Restored (\d+) MiB, (\d+) objects", txt):
            out["restored_mib"] = max(out["restored_mib"], int(m.group(1)))
            out["restored_objects"] = max(out["restored_objects"],
                                          int(m.group(2)))
    return out


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--docs", type=int, default=768_000)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--store-mb", type=int, default=500)
    ap.add_argument("--no-cap", action="store_true")
    args = ap.parse_args()

    # bench.py owns corpus generation; reuse it by env override so the
    # cache key (seed, n) and generator stay in one place
    os.environ["BENCH_DOCS"] = str(args.docs)
    os.environ["RAY_GRAFT_CPUS"] = str(args.cpus)

    import ray

    import bench
    from ray.data import DataContext

    # corpus generation runs UNCAPPED (it is fixture setup, not the
    # system under test); the capped session starts fresh afterwards
    ray.init(address="local", num_cpus=args.cpus,
             include_dashboard=False, logging_level="ERROR")
    DataContext.get_current().enable_progress_bars = False
    t0 = time.time()
    bench.ensure_corpus()
    gen_sec = round(time.time() - t0, 1)
    ray.shutdown()

    kw = {} if args.no_cap else {
        "object_store_memory": args.store_mb * 1024 * 1024}
    ray.init(address="local", num_cpus=args.cpus,
             include_dashboard=False, logging_level="ERROR", **kw)
    DataContext.get_current().enable_progress_bars = False

    flag = bench.run_flagship()
    rec = {
        "metric": "endurance extraction (bounded object store)",
        "docs": args.docs,
        "num_cpus": args.cpus,
        "object_store_mb": None if args.no_cap else args.store_mb,
        "corpus_gen_sec": gen_sec,
        "sec": flag["sec"],
        "docs_per_sec": flag["docs_per_sec"],
        "extracted": flag["docs"],
        "spill": spill_stats(),
    }
    print(json.dumps(rec))
    ray.shutdown()


if __name__ == "__main__":
    main()

"""Shared shuffle-partition sizing (used by relational joins and dedup).

One rule everywhere: partition count sized to the DATA, not the CPU
count.  Every hash-shuffle partition costs an aggregator actor (~100ms
startup), so tiny inputs must not fan out to cpu-count partitions;
large inputs scale the count linearly (bounded) and each partition
stays well under worker-heap size at any corpus scale.
"""

from __future__ import annotations


def nparts_for(n_rows: int, rows_per_part: int = 100_000,
               floor: int = 2) -> int:
    return int(max(floor, min(256, (n_rows + rows_per_part - 1)
                              // rows_per_part)))


def compact_parts(n_rows: int, rows_per_part: int = 100_000) -> int:
    """Repartition count that can never EXCEED the row count: Ray's
    repartition emits zero-column empty blocks when asked for more
    blocks than rows, and those blocks break Acero hash joins
    downstream ("No match for key field") nondeterministically
    depending on row placement.  Floor of 1 (not 2) for tiny sets;
    ceil(n/rows_per_part) <= n for every n >= 1."""
    return nparts_for(n_rows, rows_per_part, floor=1)

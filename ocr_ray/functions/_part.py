"""Shared shuffle-partition sizing (used by relational joins and dedup).

One rule everywhere: partition count sized to the DATA, not the CPU
count.  Every hash-shuffle partition costs an aggregator actor (~100ms
startup), so tiny inputs must not fan out to cpu-count partitions;
large inputs scale the count linearly (bounded) and each partition
stays well under worker-heap size at any corpus scale.
"""

from __future__ import annotations


def nparts_for(n_rows: int, rows_per_part: int = 100_000) -> int:
    return int(max(2, min(256, (n_rows + rows_per_part - 1)
                          // rows_per_part)))

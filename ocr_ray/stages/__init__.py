"""Ray Data stages: map_batches functions + actor-pool callables."""

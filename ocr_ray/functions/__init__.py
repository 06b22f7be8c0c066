"""General data-processing operator library over the testdata tables.

Each public function takes ``sf_dir`` and returns a lazy ray.data.Dataset
(or small materialized table) whose columns match the DuckDB oracle SQL in
``__ray_entry__.oracle_sql`` name-for-name.

Numeric-determinism discipline (so order-insensitive value hashes match
the oracle): money is summed as exact integer cents (float multiply +
round happens per row identically on both engines), counts are int64, and
every derived float is produced by a single division/round of identical
inputs — never by accumulating floats in engine-dependent order.
"""

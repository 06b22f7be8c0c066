"""Incremental per-key aggregates (incremental.py init_agg_state /
agg_increment / read_agg_state).

Oracles: union-equality (increments folded one at a time == one batch
groupby over everything), NULL-key grouping, crash-orphan recovery,
empty increments, and version GC.
"""

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_ray.functions.incremental import (agg_increment,
                                           init_agg_state,
                                           read_agg_state)


def _stream(seed, n, null_frac=0.1):
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, 40, n).astype(np.int64)
    nulls = rng.random(n) < null_frac
    return pa.table({
        "k": pa.array([None if m else int(v)
                       for v, m in zip(keys, nulls)], pa.int64()),
        "a": pa.array(rng.integers(-100, 100, n), pa.int64()),
        "b": pa.array(rng.integers(0, 10, n), pa.int64()),
    })


def _batch_expect(tables):
    df = pa.concat_tables(tables).to_pandas()
    g = (df.fillna({"k": -999}).groupby("k")
         .agg(n_rows=("a", "size"), sum_a=("a", "sum"),
              sum_b=("b", "sum")).reset_index())
    g["k"] = g["k"].replace(-999, np.nan)
    return g.sort_values("k", na_position="first").reset_index(
        drop=True)


def _state_df(state_dir):
    df = read_agg_state(state_dir).to_pandas()
    return df[["k", "n_rows", "sum_a", "sum_b"]].sort_values(
        "k", na_position="first").reset_index(drop=True)


def test_increments_equal_batch_union(ray_session, tmp_path):
    import ray.data as rd

    sd = str(tmp_path / "state")
    init_agg_state(sd, "k", ["a", "b"])
    incs = [_stream(s, n) for s, n in ((1, 3000), (2, 500), (3, 7000))]
    for i, t in enumerate(incs):
        p = tmp_path / f"inc{i}.parquet"
        pq.write_table(t, p)
        res = agg_increment(rd.read_parquet(str(p)), sd)
        # running state == batch aggregate over increments so far
        pd.testing.assert_frame_equal(
            _state_df(sd), _batch_expect(incs[:i + 1]),
            check_dtype=False, check_names=False)
        assert res["version"] == i + 1
    meta = json.load(open(os.path.join(sd, "meta.json")))
    assert meta["n_increments"] == 3
    # superseded versions are GC'd; only the live one remains
    vdirs = [d for d in os.listdir(sd) if d.startswith("v")]
    assert vdirs == ["v3"]


def test_null_keys_aggregate_as_own_group(ray_session, tmp_path):
    import ray.data as rd

    sd = str(tmp_path / "state")
    init_agg_state(sd, "k", ["a", "b"])
    t = pa.table({
        "k": pa.array([None, None, 5], pa.int64()),
        "a": pa.array([10, 20, 1], pa.int64()),
        "b": pa.array([1, 2, 3], pa.int64()),
    })
    p = tmp_path / "i.parquet"
    pq.write_table(t, p)
    agg_increment(rd.read_parquet(str(p)), sd)
    df = _state_df(sd)
    nullrow = df[df.k.isna()]
    assert len(nullrow) == 1
    assert nullrow.n_rows.iloc[0] == 2 and nullrow.sum_a.iloc[0] == 30


def test_crash_orphan_ignored_and_retry_clean(ray_session, tmp_path):
    """A crash after writing v<k+1> but before the meta swap leaves an
    orphan dir; the retry must overwrite it and converge to the same
    totals."""
    import ray.data as rd

    sd = str(tmp_path / "state")
    init_agg_state(sd, "k", ["a", "b"])
    t = _stream(7, 1000)
    p = tmp_path / "i.parquet"
    pq.write_table(t, p)
    # simulate the orphan: a half-written v1 with garbage
    os.makedirs(os.path.join(sd, "v1"))
    pq.write_table(pa.table({"key": pa.array([99], pa.int64()),
                             "key_null": pa.array([0], pa.int64()),
                             "n_rows": pa.array([1], pa.int64()),
                             "sum_a": pa.array([12345], pa.int64()),
                             "sum_b": pa.array([1], pa.int64())}),
                   os.path.join(sd, "v1", "garbage.parquet"))
    agg_increment(rd.read_parquet(str(p)), sd)
    pd.testing.assert_frame_equal(_state_df(sd), _batch_expect([t]),
                                  check_dtype=False, check_names=False)


def test_empty_increment_is_noop(ray_session, tmp_path):
    import ray.data as rd

    sd = str(tmp_path / "state")
    init_agg_state(sd, "k", ["a", "b"])
    t = _stream(11, 400)
    p = tmp_path / "i.parquet"
    pq.write_table(t, p)
    agg_increment(rd.read_parquet(str(p)), sd)
    before = _state_df(sd)
    empty = tmp_path / "empty.parquet"
    pq.write_table(t.schema.empty_table(), empty)
    res = agg_increment(rd.read_parquet(str(empty)), sd)
    assert res["version"] == 1  # no new version for a no-op
    pd.testing.assert_frame_equal(_state_df(sd), before)


def test_layout_independence(ray_session, tmp_path):
    import ray.data as rd

    t = _stream(13, 2000)
    p = tmp_path / "i.parquet"
    pq.write_table(t, p)
    states = []
    for nblocks in (1, 8):
        sd = str(tmp_path / f"state{nblocks}")
        init_agg_state(sd, "k", ["a", "b"])
        agg_increment(rd.read_parquet(str(p)).repartition(nblocks), sd)
        states.append(_state_df(sd))
    pd.testing.assert_frame_equal(states[0], states[1])

"""bloom_pruned_join: pre-shuffle large-side pruning must never change
the join's answer (no false negatives by construction; false positives
removed by the exact join), while actually removing most non-matching
rows before the exchange."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _canon(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


class TestBloomProbeMechanism:
    def test_no_false_negatives_and_high_prune_rate(self, ray_session):
        import ray.data as rd

        from ocr_ray.functions.relational import (_bloom4_build,
                                                  _bloom4_probe)

        rng = np.random.default_rng(7)
        right_keys = rng.choice(1_000_000, 500, replace=False) \
            .astype(np.int64)
        small = rd.from_arrow(pa.table({"k": right_keys}))
        log2m = 16
        bm = _bloom4_build(small, "k", log2m)

        # every inserted key probes True — zero false negatives
        ok = _bloom4_probe(bm, log2m, pa.array(right_keys))
        assert ok.all()

        # keys guaranteed absent: miss rate ~ (1 - e^{-kn/m})^k, far
        # below 5% at 500 keys in 2^16 bits with 4 probes
        absent = (np.arange(20_000, dtype=np.int64) + 2_000_000)
        fp = _bloom4_probe(bm, log2m, pa.array(absent)).mean()
        assert fp < 0.05

    def test_null_keys_always_kept(self, ray_session):
        import ray.data as rd

        from ocr_ray.functions.relational import (_bloom4_build,
                                                  _bloom4_probe)

        small = rd.from_arrow(pa.table({"k": pa.array([1, 2, 3],
                                                      pa.int64())}))
        bm = _bloom4_build(small, "k", 16)
        probe = pa.array([1, None, 99_999_999, None], pa.int64())
        keep = _bloom4_probe(bm, 16, probe)
        assert bool(keep[0]) and bool(keep[1]) and bool(keep[3])

    def test_int_hash_path_unchanged_by_nulls_in_batch(self, ray_session):
        """An int64 column WITH nulls must hash its non-null values
        identically to the same values in a null-free column (the
        numpy-dtype trap: nulls flip to_numpy to float64)."""
        from ocr_ray.functions.relational import _key_hash_u64

        clean = pa.array([5, 17, 42], pa.int64())
        dirty = pa.array([5, None, 17, 42, None], pa.int64())
        h_clean, v_clean = _key_hash_u64(clean)
        h_dirty, v_dirty = _key_hash_u64(dirty)
        assert v_clean.all()
        np.testing.assert_array_equal(h_dirty[v_dirty], h_clean)


class TestBloomPrunedJoin:
    def test_equality_on_selective_int_join(self, ray_session):
        import ray.data as rd

        from ocr_ray.functions.relational import bloom_pruned_join

        rng = np.random.default_rng(0)
        n = 60_000
        large = rd.from_arrow(pa.table({
            "k": rng.integers(0, 20_000, n).astype(np.int64),
            "x": np.arange(n, dtype=np.int64)})).repartition(8)
        small = rd.from_arrow(pa.table({
            "kk": np.arange(500, dtype=np.int64),
            "name": [f"d{i}" for i in range(500)]})).repartition(2)

        out, info = bloom_pruned_join(large, small, "k", right_on="kk",
                                      explain=True)
        assert info["strategy"] == "bloom+hash"

        got = _canon(out.to_pandas())
        want = _canon(large.to_pandas().merge(
            small.to_pandas().rename(columns={"kk": "k"}), on="k"))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_equality_on_string_keys(self, ray_session):
        import ray.data as rd

        from ocr_ray.functions.relational import bloom_pruned_join

        rng = np.random.default_rng(1)
        n = 20_000
        large = rd.from_arrow(pa.table({
            "k": [f"u{int(i)}" for i in rng.integers(0, 5_000, n)],
            "x": np.arange(n, dtype=np.int64)})).repartition(4)
        small = rd.from_arrow(pa.table({
            "k": [f"u{i}" for i in range(0, 5_000, 25)],
            "w": np.arange(200, dtype=np.int64)}))

        out = bloom_pruned_join(large, small, "k")
        got = _canon(out.to_pandas())
        want = _canon(large.to_pandas().merge(small.to_pandas(), on="k"))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_equality_vs_plain_ray_join_with_null_keys(self, ray_session):
        """Contract: identical rows to the unpruned Dataset.join —
        including whatever Ray's join does with NULL keys (pruning
        never touches null rows, so the two must agree exactly)."""
        import ray.data as rd

        from ocr_ray.functions.relational import bloom_pruned_join

        lk = pa.array([1, 2, None, 3, None, 2, 9], pa.int64())
        large = rd.from_arrow(pa.table({
            "k": lk, "x": pa.array(range(7), pa.int64())}))
        small = rd.from_arrow(pa.table({
            "k": pa.array([2, 3, None], pa.int64()),
            "w": pa.array([20, 30, 40], pa.int64())}))

        got = _canon(bloom_pruned_join(large, small, "k",
                                       num_partitions=2).to_pandas())
        want = _canon(large.join(small, join_type="inner",
                                 num_partitions=2, on=("k",))
                      .to_pandas())
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_empty_right_refused(self, ray_session):
        import ray.data as rd

        from ocr_ray.functions.relational import bloom_pruned_join

        large = rd.from_arrow(pa.table({"k": pa.array([1], pa.int64())}))
        small = rd.from_arrow(pa.table({"k": pa.array([], pa.int64())}))
        with pytest.raises(ValueError, match="empty right side"):
            bloom_pruned_join(large, small, "k")


class TestAutoJoinBloomLeg:
    def test_bloom_prune_keeps_answer_and_reports(self, ray_session):
        import ray.data as rd

        from ocr_ray.functions.relational import auto_join

        rng = np.random.default_rng(3)
        n = 30_000
        large = rd.from_arrow(pa.table({
            "k": rng.integers(0, 10_000, n).astype(np.int64),
            "x": np.arange(n, dtype=np.int64)})).repartition(6)
        small = rd.from_arrow(pa.table({
            "k": np.arange(300, dtype=np.int64),
            "name": [f"d{i}" for i in range(300)]}))

        out, info = auto_join(large, small, "k", broadcast_rows=100,
                              bloom_prune=True, explain=True)
        assert info["strategy"] == "hash"
        assert info["bloom_bits"] >= (1 << 16)

        got = _canon(out.to_pandas())
        want = _canon(large.to_pandas().merge(small.to_pandas(), on="k"))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_bloom_prune_composes_with_salted_leg(self, ray_session):
        import ray.data as rd

        from ocr_ray.functions.relational import auto_join

        n = 40_000
        # 90% of rows on one MATCHING hot key, the rest non-matching
        keys = np.where(np.arange(n) % 10 < 9, 7,
                        100_000 + (np.arange(n) % 2_000)).astype(np.int64)
        large = rd.from_arrow(pa.table({
            "k": keys, "x": np.arange(n, dtype=np.int64)})).repartition(8)
        small = rd.from_arrow(pa.table({
            "k": np.arange(2_000, dtype=np.int64),
            "name": [f"d{i}" for i in range(2_000)]}))

        out, info = auto_join(large, small, "k", broadcast_rows=100,
                              bloom_prune=True, explain=True)
        assert info["strategy"] == "salted"   # hot key survives pruning

        got = _canon(out.to_pandas())
        want = _canon(large.to_pandas().merge(small.to_pandas(), on="k"))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)


class TestNonStringIntKeyTypes:
    def test_timestamp_and_float_keys(self, ray_session):
        """Bloom pruning must handle any key type the plain join
        handles — timestamps and floats crashed the first version's
        string-sentinel fill (review-fix regression)."""
        import ray.data as rd

        from ocr_ray.functions.relational import bloom_pruned_join

        for typ, mk in [
            (pa.timestamp("us"), lambda v: v),
            (pa.float64(), lambda v: v * 0.5),
        ]:
            lv = [mk(int(i)) for i in np.arange(0, 4_000)]
            rv = [mk(int(i)) for i in range(0, 4_000, 100)]
            large = rd.from_arrow(pa.table({
                "k": pa.array(lv, typ),
                "x": pa.array(np.arange(4_000), pa.int64())})) \
                .repartition(3)
            small = rd.from_arrow(pa.table({
                "k": pa.array(rv, typ),
                "w": pa.array(np.arange(len(rv)), pa.int64())}))
            got = _canon(bloom_pruned_join(large, small, "k",
                                           num_partitions=2).to_pandas())
            want = _canon(large.join(small, join_type="inner",
                                     num_partitions=2, on=("k",))
                          .to_pandas())
            pd.testing.assert_frame_equal(got, want, check_dtype=False)
            assert len(got) == len(rv)

"""auto_join: strategy selection (broadcast / salted / hash) and the
all-legs-equal contract."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest


def _canon(df):
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def _plain_join(large, small, on, right_on):
    l = large.to_pandas()
    r = small.to_pandas().rename(columns={right_on: on})
    return l.merge(r, on=on, how="inner")


class TestAutoJoin:
    def test_broadcast_leg(self, ray_session):
        import ray.data as rd

        from ocr_ray.functions.relational import auto_join

        rng = np.random.default_rng(0)
        large = rd.from_arrow(pa.table({
            "k": rng.integers(0, 50, 10_000).astype(np.int64),
            "x": np.arange(10_000, dtype=np.int64)})).repartition(6)
        small = rd.from_arrow(pa.table({
            "kk": np.arange(50, dtype=np.int64),
            "name": [f"dim{i}" for i in range(50)]}))
        out, info = auto_join(large, small, "k", right_on="kk",
                              explain=True)
        assert info["strategy"] == "broadcast"
        got = _canon(out.to_pandas())
        want = _canon(_plain_join(large, small, "k", "kk"))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_salted_leg_on_planted_skew(self, ray_session):
        import ray.data as rd

        from ocr_ray.functions.relational import auto_join

        n = 40_000
        keys = np.where(np.arange(n) % 10 < 9, 7,
                        np.arange(n) % 2000).astype(np.int64)
        large = rd.from_arrow(pa.table({
            "k": keys, "x": np.arange(n, dtype=np.int64)})).repartition(8)
        small = rd.from_arrow(pa.table({
            "k": np.arange(2000, dtype=np.int64),
            "name": [f"d{i}" for i in range(2000)]}))
        out, info = auto_join(large, small, "k", broadcast_rows=100,
                              explain=True)
        assert info["strategy"] == "salted"
        assert info["max_share"] > 0.8
        got = _canon(out.to_pandas())
        want = _canon(_plain_join(large, small, "k", "k"))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_hash_leg_on_uniform_keys(self, ray_session):
        import ray.data as rd

        from ocr_ray.functions.relational import auto_join

        n = 30_000
        large = rd.from_arrow(pa.table({
            "k": (np.arange(n) % 3000).astype(np.int64),
            "x": np.arange(n, dtype=np.int64)})).repartition(6)
        small = rd.from_arrow(pa.table({
            "k": np.arange(3000, dtype=np.int64),
            "name": [f"d{i}" for i in range(3000)]}))
        out, info = auto_join(large, small, "k", broadcast_rows=100,
                              explain=True)
        assert info["strategy"] == "hash"
        got = _canon(out.to_pandas())
        want = _canon(_plain_join(large, small, "k", "k"))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_skew_check_off_skips_diagnostic(self, ray_session):
        import ray.data as rd

        from ocr_ray.functions.relational import auto_join

        n = 5_000
        keys = np.full(n, 3, np.int64)     # total skew, but check off
        large = rd.from_arrow(pa.table({
            "k": keys, "x": np.arange(n, dtype=np.int64)}))
        small = rd.from_arrow(pa.table({
            "k": np.arange(10, dtype=np.int64),
            "name": [f"d{i}" for i in range(10)]}))
        out, info = auto_join(large, small, "k", broadcast_rows=5,
                              skew_check=False, explain=True)
        assert info["strategy"] == "hash"
        assert "max_share" not in info
        assert out.count() == n            # key 3 matches every row

    def test_empty_right_refused(self, ray_session):
        import ray.data as rd

        from ocr_ray.functions.relational import auto_join

        large = rd.from_arrow(pa.table({"k": pa.array([1], pa.int64())}))
        small = rd.from_arrow(pa.table({"k": pa.array([], pa.int64())}))
        with pytest.raises(ValueError, match="empty right side"):
            auto_join(large, small, "k")


class TestLeftOuter:
    """join_type="left_outer" on all three legs: unmatched large-side
    rows null-extend exactly once, matched rows equal the inner join."""

    def _check(self, large, small, want_df, **kw):
        from ocr_ray.functions.relational import auto_join

        out, info = auto_join(large, small, "k",
                              join_type="left_outer", explain=True, **kw)
        got = _canon(out.to_pandas())
        want = _canon(want_df)
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        return info

    def test_broadcast_left_outer(self, ray_session):
        import ray.data as rd

        n = 8_000
        keys = (np.arange(n) % 120).astype(np.int64)  # 100..119 unmatched
        large = rd.from_arrow(pa.table({
            "k": keys, "x": np.arange(n, dtype=np.int64)})).repartition(5)
        small = rd.from_arrow(pa.table({
            "k": np.arange(100, dtype=np.int64),
            "name": [f"d{i}" for i in range(100)]}))
        want = large.to_pandas().merge(small.to_pandas(), on="k",
                                       how="left")
        info = self._check(large, small, want)
        assert info["strategy"] == "broadcast"

    def test_salted_left_outer_on_planted_skew(self, ray_session):
        import ray.data as rd

        n = 30_000
        # hot key 7 matches; scattered keys 5000+ never match
        keys = np.where(np.arange(n) % 10 < 9, 7,
                        5_000 + (np.arange(n) % 500)).astype(np.int64)
        large = rd.from_arrow(pa.table({
            "k": keys, "x": np.arange(n, dtype=np.int64)})).repartition(8)
        small = rd.from_arrow(pa.table({
            "k": np.arange(2_000, dtype=np.int64),
            "name": [f"d{i}" for i in range(2_000)]}))
        want = large.to_pandas().merge(small.to_pandas(), on="k",
                                       how="left")
        info = self._check(large, small, want, broadcast_rows=100)
        assert info["strategy"] == "salted"
        # row-count law: matched + unmatched == n (no per-salt dup)
        assert len(want) == n

    def test_hash_left_outer(self, ray_session):
        import ray.data as rd

        n = 20_000
        keys = (np.arange(n) % 4_000).astype(np.int64)  # half unmatched
        large = rd.from_arrow(pa.table({
            "k": keys, "x": np.arange(n, dtype=np.int64)})).repartition(6)
        small = rd.from_arrow(pa.table({
            "k": np.arange(0, 4_000, 2).astype(np.int64),
            "name": [f"d{i}" for i in range(2_000)]}))
        want = large.to_pandas().merge(small.to_pandas(), on="k",
                                       how="left")
        info = self._check(large, small, want, broadcast_rows=100,
                           skew_check=False)
        assert info["strategy"] == "hash"

    def test_bloom_prune_refused_for_left_outer(self, ray_session):
        import ray.data as rd

        from ocr_ray.functions.relational import auto_join, salted_join

        large = rd.from_arrow(pa.table({"k": pa.array([1], pa.int64())}))
        small = rd.from_arrow(pa.table({"k": pa.array([1], pa.int64()),
                                        "w": pa.array([2], pa.int64())}))
        with pytest.raises(ValueError, match="inner join"):
            auto_join(large, small, "k", join_type="left_outer",
                      bloom_prune=True)
        with pytest.raises(ValueError, match="not supported"):
            salted_join(large, small, "k", join_type="full_outer")


class TestFullOuter:
    def test_full_outer_matches_pandas(self, ray_session):
        import ray.data as rd

        from ocr_ray.functions.relational import auto_join

        # matched, left-only, and right-only keys all planted
        large = rd.from_arrow(pa.table({
            "k": np.array([1, 1, 2, 3, 3, 3, 9], np.int64),
            "x": np.arange(7, dtype=np.int64)})).repartition(3)
        small = rd.from_arrow(pa.table({
            "k": np.array([1, 3, 5], np.int64),
            "name": ["a", "c", "only-right"]}))
        out, info = auto_join(large, small, "k",
                              join_type="full_outer", explain=True)
        # small right side would be broadcast for inner — full outer
        # must still take the hash leg
        assert info["strategy"] == "hash"
        got = _canon(out.to_pandas())
        want = _canon(large.to_pandas().merge(
            small.to_pandas(), on="k", how="outer"))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_full_outer_matches_duckdb(self, ray_session):
        import duckdb
        import ray.data as rd

        from ocr_ray.functions.relational import auto_join

        rng = np.random.default_rng(7)
        lt = pa.table({"k": rng.integers(0, 300, 5000).astype(np.int64),
                       "x": np.arange(5000, dtype=np.int64)})
        rt = pa.table({"k": (np.arange(250, dtype=np.int64) * 2),
                       "name": [f"d{i}" for i in range(250)]})
        out = auto_join(rd.from_arrow(lt).repartition(4),
                        rd.from_arrow(rt), "k", join_type="full_outer")
        got = _canon(out.to_pandas())
        want = _canon(duckdb.sql(
            "SELECT coalesce(l.k, r.k) k, l.x, r.name "
            "FROM lt l FULL OUTER JOIN rt r ON l.k = r.k").df())
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_full_outer_refuses_bloom(self, ray_session):
        import ray.data as rd

        from ocr_ray.functions.relational import auto_join

        ds = rd.from_arrow(pa.table({"k": np.arange(4, dtype=np.int64)}))
        with pytest.raises(ValueError, match="bloom_prune"):
            auto_join(ds, ds, "k", join_type="full_outer",
                      bloom_prune=True)


class TestBroadcastEmptyBlocks:
    def test_filter_produced_empty_blocks_on_right(self, ray_session):
        """A filtered right side carries schema-less empty blocks;
        the broadcast concat must skip them (found live by
        collocation_pmi's min_count-filtered unigram side)."""
        import ray.data as rd

        from ocr_ray.functions.relational import auto_join

        large = rd.from_arrow(pa.table({
            "k": np.arange(100, dtype=np.int64) % 5,
            "x": np.arange(100, dtype=np.int64)}))
        small = (rd.from_arrow(pa.table({
            "k": np.arange(50, dtype=np.int64),
            "name": [f"d{i}" for i in range(50)]}))
            .repartition(10)
            .filter(expr="k < 5"))   # most partitions now empty
        out, info = auto_join(large, small, "k", explain=True)
        assert info["strategy"] == "broadcast"
        got = _canon(out.to_pandas())
        want = _canon(large.to_pandas().merge(
            pd.DataFrame({"k": range(5),
                          "name": [f"d{i}" for i in range(5)]}),
            on="k"))
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

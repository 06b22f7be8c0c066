"""Z-order clustering: Morton kernel parity, layout determinism, and
the actual row-group pruning win vs single-key and random layouts."""

import numpy as np
import pyarrow as pa
import pytest

from ocr_ray.functions.zorder import (
    morton2,
    morton2_reference,
    pruned_fraction,
    zorder_sort,
    zorder_write,
)


class TestMortonKernel:
    def test_matches_reference(self):
        rng = np.random.default_rng(0)
        a = rng.integers(0, 1 << 20, 500).astype(np.uint64)
        b = rng.integers(0, 1 << 20, 500).astype(np.uint64)
        z = morton2(a, b)
        for i in range(500):
            assert int(z[i]) == morton2_reference(int(a[i]), int(b[i]))

    def test_orders_quadrants(self):
        # all points of the low-low quadrant sort before any of the
        # high-high quadrant
        lo = morton2(np.array([3], np.uint64), np.array([3], np.uint64))
        hi = morton2(np.array([4], np.uint64), np.array([4], np.uint64))
        assert lo[0] < hi[0]


def _mk_ds(n, seed, parts=8):
    import ray.data as rd

    rng = np.random.default_rng(seed)
    return rd.from_arrow(pa.table({
        "x": rng.integers(0, 1_000_000, n).astype(np.int64),
        "y": rng.integers(0, 1_000_000, n).astype(np.int64),
        "payload": np.arange(n, dtype=np.int64),
    })).repartition(parts)


class TestZOrder:
    def test_sort_preserves_rows(self, ray_session):
        ds = _mk_ds(20_000, 1)
        out = zorder_sort(ds, ("x", "y")).to_pandas()
        src = ds.to_pandas()
        assert sorted(out["payload"]) == sorted(src["payload"])
        assert list(out.columns) == ["x", "y", "payload"]

    def test_layout_deterministic(self, ray_session):
        ds1, ds2 = _mk_ds(10_000, 2, 4), _mk_ds(10_000, 2, 13)
        a = zorder_sort(ds1, ("x", "y"), keep_z=True).to_pandas()
        b = zorder_sort(ds2, ("x", "y"), keep_z=True).to_pandas()
        assert list(a["__z"]) == list(b["__z"])
        assert list(a["payload"]) == list(b["payload"])

    def test_pruning_beats_random_and_covers_both_dims(
            self, ray_session, tmp_path):
        """The point of the operator: a 2-D box query prunes under
        Z-order; a single-key sort only prunes its own column."""
        n = 200_000
        ds = _mk_ds(n, 3, 16)

        zdir = str(tmp_path / "z")
        zorder_write(ds, zdir, ("x", "y"), rows_per_file=2_000)

        # controls written at the SAME file granularity (the same
        # order-preserving re-split zorder_write uses)
        xdir = str(tmp_path / "xsort")
        ds.sort("x").materialize().repartition(n // 2_000) \
            .write_parquet(xdir)

        rdir = str(tmp_path / "rand")
        ds.repartition(n // 2_000).write_parquet(rdir)

        # ~10% box in each dimension (1% of the data)
        box = {"x": (400_000, 500_000), "y": (400_000, 500_000)}
        fz = pruned_fraction(zdir, box)
        fx = pruned_fraction(xdir, box)
        fr = pruned_fraction(rdir, box)
        assert fz < 0.12, fz                   # z-order prunes the box
        assert fz < fx * 0.8, (fz, fx)         # beats single-key sort
        assert fr > 0.9, fr                    # random layout reads all

        # y-only query: the single-key x-sort cannot prune at all
        ybox = {"y": (0, 100_000)}
        assert pruned_fraction(zdir, ybox) < 0.5
        assert pruned_fraction(xdir, ybox) > 0.9

    def test_non_integer_refused(self, ray_session):
        import ray.data as rd

        ds = rd.from_arrow(pa.table({
            "x": pa.array(["a"], pa.string()),
            "y": pa.array([1], pa.int64())}))
        with pytest.raises(Exception):
            zorder_sort(ds, ("x", "y")).to_pandas()

    def test_two_columns_required(self, ray_session):
        ds = _mk_ds(10, 4, 1)
        with pytest.raises(ValueError):
            zorder_sort(ds, ("x",))

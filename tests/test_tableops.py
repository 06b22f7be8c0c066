"""union_by_name (DuckDB UNION ALL BY NAME parity, widening, refusals)
and compact_parquet_dir (row preservation, resume, determinism)."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_ray.functions.tableops import (
    _plan_groups,
    _unify,
    compact_parquet_dir,
    union_by_name,
)


class TestUnify:
    def test_widening_table(self):
        cases = [
            (pa.int32(), pa.int64(), pa.int64()),
            (pa.int8(), pa.uint8(), pa.int16()),
            (pa.uint32(), pa.int32(), pa.int64()),
            (pa.int64(), pa.uint32(), pa.int64()),
            (pa.float32(), pa.float64(), pa.float64()),
            (pa.int64(), pa.float32(), pa.float64()),
            (pa.null(), pa.string(), pa.string()),
            (pa.string(), pa.string(), pa.string()),
        ]
        for a, b, want in cases:
            assert _unify(a, b).equals(want), (a, b)
            assert _unify(b, a).equals(want), (b, a)

    def test_incompatible(self):
        assert _unify(pa.string(), pa.int64()) is None
        assert _unify(pa.timestamp("us"), pa.int64()) is None


class TestUnionByName:
    def test_matches_duckdb_union_by_name(self, ray_session):
        import ray.data as rd

        t1 = pa.table({"a": pa.array([1, 2], pa.int32()),
                       "b": pa.array(["x", "y"], pa.string())})
        t2 = pa.table({"b": pa.array(["z"], pa.string()),
                       "a": pa.array([3], pa.int64()),
                       "c": pa.array([1.5], pa.float64())})
        out = union_by_name([rd.from_arrow(t1), rd.from_arrow(t2)])
        got = out.to_pandas().sort_values("a").reset_index(drop=True)
        want = duckdb.sql(
            "SELECT * FROM t1 UNION ALL BY NAME SELECT * FROM t2 "
            "ORDER BY a").df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        # widened + null-filled schema
        sch = out.schema()
        base = sch.base_schema if hasattr(sch, "base_schema") else sch
        assert base.field("a").type == pa.int64()
        assert base.field("c").type == pa.float64()

    def test_strict_refuses_missing(self, ray_session):
        import ray.data as rd

        t1 = pa.table({"a": pa.array([1], pa.int64())})
        t2 = pa.table({"a": pa.array([2], pa.int64()),
                       "b": pa.array([3], pa.int64())})
        with pytest.raises(ValueError, match="lacks columns"):
            union_by_name([rd.from_arrow(t1), rd.from_arrow(t2)],
                          strict=True)

    def test_incompatible_refused(self, ray_session):
        import ray.data as rd

        t1 = pa.table({"a": pa.array([1], pa.int64())})
        t2 = pa.table({"a": pa.array(["s"], pa.string())})
        with pytest.raises(ValueError, match="incompatible"):
            union_by_name([rd.from_arrow(t1), rd.from_arrow(t2)])

    def test_empty_list(self, ray_session):
        with pytest.raises(ValueError, match="no datasets"):
            union_by_name([])


class TestPlanGroups:
    def test_deterministic_binpack(self):
        files = [(f"f{i}", 40) for i in range(10)]
        groups = _plan_groups(files, 100)
        assert groups == [["f0", "f1"], ["f2", "f3"], ["f4", "f5"],
                          ["f6", "f7"], ["f8", "f9"]]

    def test_oversize_file_gets_own_group(self):
        groups = _plan_groups([("a", 10), ("big", 500), ("b", 10)], 100)
        assert groups == [["a"], ["big"], ["b"]]


class TestCompact:
    def _write_small_files(self, d, n_files=12, rows=500):
        os.makedirs(d, exist_ok=True)
        rng = np.random.default_rng(5)
        for i in range(n_files):
            pq.write_table(pa.table({
                "k": pa.array(rng.integers(0, 100, rows), pa.int64()),
                "v": pa.array([f"r{i}-{j}" for j in range(rows)],
                              pa.string())}),
                os.path.join(d, f"part-{i:04d}.parquet"))

    def test_rows_preserved_and_files_reduced(self, ray_session, tmp_path):
        import ray.data as rd

        from ocr_ray.functions.fingerprint import tables_equal

        src, out = str(tmp_path / "src"), str(tmp_path / "out")
        self._write_small_files(src)
        res = compact_parquet_dir(src, out, target_mb=1)
        assert res["n_input_files"] == 12
        assert res["n_output_files"] < 12
        assert res["n_rows"] == 12 * 500
        assert tables_equal(rd.read_parquet(src), rd.read_parquet(out))

    def test_resume_skips_done_groups(self, ray_session, tmp_path):
        src, out = str(tmp_path / "src"), str(tmp_path / "out")
        self._write_small_files(src, n_files=6)
        first = compact_parquet_dir(src, out, target_mb=1)
        assert first["n_skipped"] == 0
        again = compact_parquet_dir(src, out, target_mb=1)
        assert again["n_skipped"] == again["n_output_files"]
        # skipped groups still report the TRUE committed row count
        # (footer metadata) — a resume must not claim 0 rows
        assert again["n_rows"] == first["n_rows"] == 6 * 500

    def test_schema_mismatch_refused(self, ray_session, tmp_path):
        src = str(tmp_path / "src")
        os.makedirs(src)
        pq.write_table(pa.table({"a": pa.array([1], pa.int64())}),
                       os.path.join(src, "a.parquet"))
        pq.write_table(pa.table({"a": pa.array(["x"], pa.string())}),
                       os.path.join(src, "b.parquet"))
        with pytest.raises(ValueError, match="schema differs"):
            compact_parquet_dir(src, str(tmp_path / "out"))

    def test_empty_dir_refused(self, ray_session, tmp_path):
        src = str(tmp_path / "src")
        os.makedirs(src)
        with pytest.raises(ValueError, match="no parquet"):
            compact_parquet_dir(src, str(tmp_path / "out"))


class TestReviewFixes:
    def test_uint64_widening(self):
        assert _unify(pa.uint32(), pa.uint64()).equals(pa.uint64())
        assert _unify(pa.uint64(), pa.uint8()).equals(pa.uint64())
        # no signed 64-bit type holds uint64 — refuse, don't truncate
        assert _unify(pa.uint64(), pa.int64()) is None
        assert _unify(pa.int32(), pa.uint64()) is None

    def test_changed_plan_refused(self, ray_session, tmp_path):
        src, out = str(tmp_path / "src"), str(tmp_path / "out")
        os.makedirs(src)
        for i in range(4):
            pq.write_table(pa.table({
                "a": pa.array([i] * 100, pa.int64())}),
                os.path.join(src, f"p{i}.parquet"))
        compact_parquet_dir(src, out, target_mb=1)
        # the source set changes: positional group ids no longer mean
        # the same inputs — a resume must refuse, not silently mix
        pq.write_table(pa.table({"a": pa.array([9] * 100, pa.int64())}),
                       os.path.join(src, "p9.parquet"))
        with pytest.raises(ValueError, match="DIFFERENT plan"):
            compact_parquet_dir(src, out, target_mb=1)

    def test_interrupted_compaction_resumes_exactly(self, ray_session,
                                                    tmp_path):
        """Atomic-commit contract: after an interrupted run (simulated
        by pre-writing only SOME outputs and leaving a stale tmp), a
        resume completes the rest, ignores the tmp, and the final
        directory equals a fresh compaction byte-for-byte."""
        import ray.data as rd

        from ocr_ray.functions.fingerprint import tables_equal

        src = str(tmp_path / "src")
        TestCompact._write_small_files(TestCompact(), src, n_files=8,
                                       rows=20_000)
        fresh = str(tmp_path / "fresh")
        compact_parquet_dir(src, fresh, target_mb=1)

        # "interrupted" run: copy plan + first output only, plus a
        # stale .tmp that a killed task would leave behind
        import shutil

        part = str(tmp_path / "part")
        os.makedirs(part)
        shutil.copy(os.path.join(fresh, "_plan.json"), part)
        done = sorted(f for f in os.listdir(fresh)
                      if f.startswith("compact-"))
        shutil.copy(os.path.join(fresh, done[0]), part)
        with open(os.path.join(part, done[1] + ".tmp-999"), "w") as f:
            f.write("garbage from a killed task")

        res = compact_parquet_dir(src, part, target_mb=1)
        assert res["n_skipped"] == 1          # the pre-done group
        assert res["n_rows"] == 8 * 20_000    # true total either way
        got = sorted(f for f in os.listdir(part)
                     if f.startswith("compact-") and
                     f.endswith(".parquet"))
        assert got == done
        assert tables_equal(rd.read_parquet(fresh),
                            rd.read_parquet(part))

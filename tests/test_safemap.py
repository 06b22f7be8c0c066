"""safe_map_batches: poison-row isolation, healthy-row completeness,
quarantine taxonomy, systematic-failure guard, no-failure passthrough."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from ocr_ray.functions.safemap import read_quarantine, safe_map_batches

OUT_SCHEMA = pa.schema([("doc_id", pa.int64()),
                        ("n_chars", pa.int64())])


def _make_fn():
    # defined as a CLOSURE so cloudpickle ships it by value (a
    # module-level fn in a test file is not importable on workers)
    def _fn(batch: pa.Table) -> pa.Table:
        # poison: raises on any doc_id divisible by 97
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        if (ids % 97 == 0).any():
            raise ValueError("poison row")
        return pa.table({
            "doc_id": batch["doc_id"],
            "n_chars": pc.utf8_length(batch["text"]).cast(pa.int64())})
    return _fn


def _corpus(n=500):
    return pa.table({
        "doc_id": pa.array(np.arange(1, n + 1), pa.int64()),
        "text": pa.array([f"doc {i}" for i in range(1, n + 1)],
                         pa.string())})


class TestSafeMap:
    def test_poison_rows_isolated(self, ray_session, tmp_path):
        import ray.data as rd

        q = str(tmp_path / "q")
        ds = rd.from_arrow(_corpus(500)).repartition(4)
        out = safe_map_batches(ds, _make_fn(), OUT_SCHEMA, q).to_pandas()
        poisons = {i for i in range(1, 501) if i % 97 == 0}
        # every healthy row processed, exactly the poisons missing
        assert set(out["doc_id"]) == set(range(1, 501)) - poisons
        quar = read_quarantine(q).to_pandas()
        assert set(quar["doc_id"]) == poisons
        assert (quar["_error_type"] == "ValueError").all()
        assert quar["_error"].str.contains("poison row").all()
        # quarantined rows keep their original input columns
        assert set(quar.columns) >= {"doc_id", "text", "_error"}

    def test_output_matches_clean_subset(self, ray_session, tmp_path):
        import ray.data as rd

        q = str(tmp_path / "q")
        tbl = _corpus(300)
        out = safe_map_batches(
            rd.from_arrow(tbl).repartition(3), _make_fn(), OUT_SCHEMA,
            q).to_pandas().sort_values("doc_id").reset_index(drop=True)
        ids = tbl["doc_id"].to_numpy()
        clean = tbl.filter(pa.array(ids % 97 != 0))
        want = _make_fn()(clean).to_pandas().sort_values(
            "doc_id").reset_index(drop=True)
        assert out.equals(want)

    def test_no_failures_no_quarantine(self, ray_session, tmp_path):
        import ray.data as rd

        q = str(tmp_path / "q")
        tbl = pa.table({"doc_id": pa.array([1, 2, 3], pa.int64()),
                        "text": pa.array(["a", "bb", "ccc"],
                                         pa.string())})
        out = safe_map_batches(rd.from_arrow(tbl), _make_fn(), OUT_SCHEMA,
                               q).to_pandas()
        assert sorted(out["n_chars"]) == [1, 2, 3]
        assert read_quarantine(q) is None

    def test_systematic_failure_reraises(self, ray_session, tmp_path):
        import ray.data as rd

        def broken(batch):
            raise RuntimeError("always")

        ds = rd.from_arrow(_corpus(50))
        with pytest.raises(Exception, match="systematically broken"):
            safe_map_batches(ds, broken, OUT_SCHEMA,
                             str(tmp_path / "q")).count()

    def test_all_poison_small_batch_quarantines(self, ray_session,
                                                tmp_path):
        import ray.data as rd

        q = str(tmp_path / "q")
        tbl = pa.table({"doc_id": pa.array([97, 194], pa.int64()),
                        "text": pa.array(["x", "y"], pa.string())})
        out = safe_map_batches(rd.from_arrow(tbl), _make_fn(), OUT_SCHEMA, q,
                               max_quarantine_frac=1.0)
        assert out.count() == 0
        assert read_quarantine(q).count() == 2

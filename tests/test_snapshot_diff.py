"""corpus_diff: FULL OUTER join semantics vs the DuckDB oracle,
planted add/remove/change, identity, and the summary rollup."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_ray.functions.snapshot import (
    CORPUS_DIFF_SQL,
    corpus_diff,
    corpus_diff_summary,
)


def _write(d, rows):
    d.mkdir(exist_ok=True)
    pq.write_table(pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows], pa.string())}),
        d / "documents.parquet")
    return str(d)


def _oracle(dir_a, dir_b):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW docs_a AS SELECT * FROM "
                f"'{dir_a}/documents.parquet'")
    con.execute(f"CREATE VIEW docs_b AS SELECT * FROM "
                f"'{dir_b}/documents.parquet'")
    return con.execute(CORPUS_DIFF_SQL + " ORDER BY doc_id").fetchdf()


class TestCorpusDiff:
    def test_planted_statuses(self, ray_session, tmp_path):
        a = _write(tmp_path / "a", [(1, "one"), (2, "two"), (3, "three")])
        b = _write(tmp_path / "b", [(2, "two"), (3, "THREE"), (4, "four")])
        got = corpus_diff(a, b).to_pandas().sort_values("doc_id") \
            .reset_index(drop=True)
        assert list(zip(got["doc_id"], got["status"])) == [
            (1, "removed"), (2, "unchanged"), (3, "changed"),
            (4, "added")]
        want = _oracle(a, b)
        assert list(got["status"]) == list(want["status"])

    def test_random_corpora_match_oracle(self, ray_session, tmp_path):
        rng = np.random.default_rng(5)
        mk = lambda i, s: (int(i), f"text-{s}")
        ids_a = rng.choice(2000, 600, replace=False)
        ids_b = rng.choice(2000, 600, replace=False)
        a = _write(tmp_path / "a",
                   [mk(i, i % 37) for i in sorted(ids_a)])
        b = _write(tmp_path / "b",
                   [mk(i, i % 41) for i in sorted(ids_b)])
        got = corpus_diff(a, b).to_pandas().sort_values("doc_id") \
            .reset_index(drop=True)
        want = _oracle(a, b)
        assert list(got["doc_id"]) == list(want["doc_id"])
        assert list(got["status"]) == list(want["status"])

    def test_identical_snapshots_all_unchanged(self, ray_session,
                                               tmp_path):
        rows = [(i, f"t{i}") for i in range(50)]
        a = _write(tmp_path / "a", rows)
        b = _write(tmp_path / "b", rows)
        s = corpus_diff_summary(a, b).to_pandas()
        assert list(s["status"]) == ["unchanged"]
        assert list(s["n_docs"]) == [50]

    def test_summary_counts(self, ray_session, tmp_path):
        a = _write(tmp_path / "a", [(1, "x"), (2, "y")])
        b = _write(tmp_path / "b", [(2, "Y"), (3, "z"), (4, "w")])
        s = corpus_diff_summary(a, b).to_pandas()
        assert dict(zip(s["status"], s["n_docs"])) == {
            "added": 2, "changed": 1, "removed": 1}

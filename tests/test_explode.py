"""explode (UNNEST WITH ORDINALITY): DuckDB parity incl. null/empty
lists and null elements; map-only layout independence."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

from ocr_ray.functions.relational import explode


def _tbl():
    return pa.table({
        "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "tag": pa.array(["a", "b", "c", "d", "e"], pa.string()),
        "xs": pa.array([[10, 20], [], None, [30], [40, None, 50]],
                       pa.list_(pa.int64())),
    })


class TestExplode:
    def test_matches_duckdb_unnest_with_ordinality(self, ray_session):
        import ray.data as rd

        t = _tbl()  # noqa: F841
        got = (explode(rd.from_arrow(_tbl()).repartition(3), "xs",
                       ["id", "tag"])
               .to_pandas().sort_values(["id", "ordinal"])
               .reset_index(drop=True))
        want = duckdb.sql("""
            SELECT id, tag, s.i AS ordinal, xs[s.i] AS value
            FROM t, unnest(generate_series(1, len(t.xs))) AS s(i)
            ORDER BY id, ordinal
        """).df()
        pd.testing.assert_frame_equal(got, want, check_dtype=False)
        # null + empty lists vanish; null ELEMENT survives
        assert set(got["id"]) == {1, 4, 5}
        assert got["value"].isna().sum() == 1

    def test_empty_and_layout(self, ray_session):
        import ray.data as rd

        empty = pa.table({
            "id": pa.array([], pa.int64()),
            "tag": pa.array([], pa.string()),
            "xs": pa.array([], pa.list_(pa.int64()))})
        out = explode(rd.from_arrow(empty), "xs", ["id"])
        assert out.count() == 0
        a = explode(rd.from_arrow(_tbl()).repartition(1), "xs",
                    ["id"]).to_pandas().sort_values(
            ["id", "ordinal"]).reset_index(drop=True)
        b = explode(rd.from_arrow(_tbl()).repartition(5), "xs",
                    ["id"]).to_pandas().sort_values(
            ["id", "ordinal"]).reset_index(drop=True)
        pd.testing.assert_frame_equal(a, b)

    def test_string_lists(self, ray_session):
        import ray.data as rd

        t = pa.table({
            "k": pa.array([7], pa.int64()),
            "ws": pa.array([["x", "y", "z"]],
                           pa.list_(pa.string()))})
        got = explode(rd.from_arrow(t), "ws", ["k"]).to_pandas()
        assert got["value"].tolist() == ["x", "y", "z"]
        assert got["ordinal"].tolist() == [1, 2, 3]


class TestRegexpExtractRows:
    def test_matches_duckdb(self, ray_session, tmp_path):
        import os

        import pyarrow.parquet as pq

        from ocr_ray.functions.textops import regexp_extract_rows

        pq.write_table(pa.table({
            "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
            "text": pa.array(
                ["call 555-1234 or 555-9999", "no digits here",
                 None, "x 123-4567"], pa.string())}),
            os.path.join(str(tmp_path), "documents.parquet"))
        pat = r"\d{3}-\d{4}"
        got = (regexp_extract_rows(str(tmp_path), pat)
               .to_pandas().sort_values(["doc_id", "match_idx"])
               .reset_index(drop=True))
        want = duckdb.sql(f"""
            WITH m AS (SELECT doc_id,
                       regexp_extract_all(text, '{pat}') ms
                       FROM read_parquet(
                           '{tmp_path}/documents.parquet'))
            SELECT doc_id, s.i AS match_idx, ms[s.i] AS match
            FROM m, unnest(generate_series(1, len(ms))) AS s(i)
            ORDER BY doc_id, match_idx
        """).df()
        pd.testing.assert_frame_equal(
            got[["doc_id", "match_idx", "match"]], want,
            check_dtype=False)
        # offsets point at the matches
        for r in got.itertuples():
            full = {0: "call 555-1234 or 555-9999",
                    3: "x 123-4567"}[r.doc_id]
            assert full[r.start:r.end] == r.match

    def test_per_doc_cap(self, ray_session, tmp_path):
        import os

        import pyarrow.parquet as pq

        from ocr_ray.functions.textops import regexp_extract_rows

        pq.write_table(pa.table({
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array(["a " * 500], pa.string())}),
            os.path.join(str(tmp_path), "documents.parquet"))
        out = regexp_extract_rows(str(tmp_path), "a",
                                  max_matches_per_doc=7)
        assert out.count() == 7

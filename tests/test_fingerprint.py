"""table_fingerprint / tables_equal (functions/fingerprint.py) and the
dense daily spine (events_daily_dense): order/layout independence,
sensitivity, and DuckDB parity for the spine."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ocr_ray.functions.fingerprint import table_fingerprint, tables_equal

SF = "/root/testdata/sf0.001"


def _mk(tmp_path, name, tbl):
    p = tmp_path / f"{name}.parquet"
    pq.write_table(tbl, p)
    return str(p)


def _base_table(n=5_000, seed=0):
    rng = np.random.default_rng(seed)
    return pa.table({
        "id": pa.array(np.arange(n), pa.int64()),
        "v": pa.array(rng.integers(0, 100, n), pa.int64()),
        "s": pa.array([f"row{i % 97}" for i in range(n)]),
        "f": pa.array(rng.random(n), pa.float64()),
    })


class TestTableFingerprint:
    def test_layout_and_row_order_independent(self, ray_session,
                                              tmp_path):
        import ray.data as rd

        t = _base_table()
        p = _mk(tmp_path, "a", t)
        fp1 = table_fingerprint(rd.read_parquet(p).repartition(1))
        fp7 = table_fingerprint(rd.read_parquet(p).repartition(7))
        assert fp1 == fp7
        # permuted rows = same multiset = same fingerprint
        perm = t.take(pa.array(np.random.default_rng(3)
                               .permutation(t.num_rows)))
        fp_perm = table_fingerprint(
            rd.from_arrow(perm).repartition(4))
        assert fp_perm == fp1
        assert fp1["n_rows"] == t.num_rows

    def test_column_order_independent(self, ray_session, tmp_path):
        import ray.data as rd

        t = _base_table()
        reordered = t.select(["f", "s", "v", "id"])
        assert table_fingerprint(rd.from_arrow(t)) == \
            table_fingerprint(rd.from_arrow(reordered))

    def test_single_value_change_detected(self, ray_session):
        import ray.data as rd

        t = _base_table()
        v = t["v"].to_numpy().copy()
        v[1234] += 1
        t2 = t.set_column(1, "v", pa.array(v, pa.int64()))
        assert not tables_equal(rd.from_arrow(t), rd.from_arrow(t2))

    def test_duplicate_row_detected(self, ray_session):
        """Multiset semantics: appending a copy of an existing row
        changes the fingerprint even though the SET of rows is equal."""
        import ray.data as rd

        t = _base_table(n=200)
        dup = pa.concat_tables([t, t.slice(10, 1)])
        assert not tables_equal(rd.from_arrow(t), rd.from_arrow(dup))

    def test_schema_rename_detected_and_subset_columns(self,
                                                       ray_session):
        import ray.data as rd

        t = _base_table(n=300)
        renamed = t.rename_columns(["id", "v2", "s", "f"])
        assert table_fingerprint(rd.from_arrow(t)) != \
            table_fingerprint(rd.from_arrow(renamed))
        # but comparing only shared columns matches
        assert tables_equal(rd.from_arrow(t), rd.from_arrow(renamed),
                            columns=["id", "s", "f"])

    def test_nulls_participate(self, ray_session):
        import ray.data as rd

        a = pa.table({"x": pa.array([1, None, 3], pa.int64())})
        b = pa.table({"x": pa.array([1, 2, 3], pa.int64())})
        assert not tables_equal(rd.from_arrow(a), rd.from_arrow(b))
        assert tables_equal(rd.from_arrow(a), rd.from_arrow(a))

    def test_missing_column_refused(self, ray_session):
        import ray.data as rd

        with pytest.raises(ValueError, match="not in"):
            table_fingerprint(rd.from_arrow(_base_table(n=10)),
                              columns=["nope"])

    def test_corpus_smoke_vs_rewrite(self, ray_session, tmp_path):
        """The intended use: a rewritten copy of a real table
        fingerprints equal; a filtered copy does not."""
        import ray.data as rd

        src = rd.read_parquet(f"{SF}/orders.parquet")
        out = str(tmp_path / "rewrite")
        src.repartition(5).write_parquet(out)
        assert tables_equal(rd.read_parquet(f"{SF}/orders.parquet"),
                            rd.read_parquet(out))
        assert not tables_equal(
            rd.read_parquet(f"{SF}/orders.parquet"),
            rd.read_parquet(out).filter(
                lambda r: r["o_orderkey"] != 1))


class TestEventsDailyDense:
    def test_duckdb_parity_with_planted_gaps(self, ray_session,
                                             tmp_path):
        from ocr_ray.functions.events import (EVENTS_DAILY_DENSE_SQL,
                                              events_daily_dense)

        # three clusters of days with multi-day gaps between them
        us_day = 86_400_000_000
        ts = ([3 * us_day + 7] * 4 + [4 * us_day + 1] * 2
              + [9 * us_day] * 3 + [15 * us_day + 12345])
        t = pa.table({
            "ts": pa.array(np.array(ts, np.int64),
                           pa.timestamp("us")),
            "value": pa.array(np.ones(len(ts)), pa.float64()),
            "user_id": pa.array(np.zeros(len(ts), np.int64)),
            "event_type": pa.array(["e"] * len(ts)),
        })
        sf = tmp_path / "sf"
        sf.mkdir()
        pq.write_table(t, sf / "events.parquet")

        got = events_daily_dense(str(sf)).to_pandas()
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"read_parquet('{sf}/events.parquet')")
        want = con.execute(EVENTS_DAILY_DENSE_SQL).df()
        cols = sorted(want.columns)
        pd.testing.assert_frame_equal(
            got[cols].sort_values(cols).reset_index(drop=True),
            want[cols].sort_values(cols).reset_index(drop=True),
            check_dtype=False)
        # spine is dense: 3..15 inclusive, gaps zero-filled
        assert len(got) == 13
        assert got.n_events.sum() == len(ts)
        assert (got.set_index("epoch_day").n_events.loc[[5, 6, 7, 8]]
                == 0).all()

    def test_sf_corpus_parity(self, ray_session):
        from ocr_ray.functions.events import (EVENTS_DAILY_DENSE_SQL,
                                              events_daily_dense)

        got = events_daily_dense(SF).to_pandas()
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"read_parquet('{SF}/events.parquet')")
        want = con.execute(EVENTS_DAILY_DENSE_SQL).df()
        cols = sorted(want.columns)
        pd.testing.assert_frame_equal(
            got[cols].sort_values(cols).reset_index(drop=True),
            want[cols].sort_values(cols).reset_index(drop=True),
            check_dtype=False)

"""PIVOT (events_type_pivot), ROLLUP (orders_rollup) and CDC MERGE
(merge_changeset): planted semantics, randomized parity, sf0.001
oracle runs."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ocr_ray.functions.events import (
    EVENTS_PIVOT_SQL,
    events_type_pivot,
)
from ocr_ray.functions.relational import (
    MERGE_CHANGESET_SQL,
    ORDERS_ROLLUP_SQL,
    merge_changeset,
    orders_rollup,
)


def _write_events(tmp_path, rows):
    t = pa.Table.from_pylist(rows)
    t = t.set_column(t.schema.get_field_index("ts"), "ts",
                     pc.cast(t["ts"], pa.timestamp("us")))
    pq.write_table(t, str(tmp_path / "events.parquet"))


def _write_orders(tmp_path, rows):
    t = pa.Table.from_pylist(rows)
    i = t.schema.get_field_index("o_orderdate")
    t = t.set_column(i, "o_orderdate",
                     pc.cast(t["o_orderdate"], pa.timestamp("us")))
    pq.write_table(t, str(tmp_path / "orders.parquet"))


def _con(tmp_path, table):
    con = duckdb.connect()
    con.execute(f"CREATE VIEW {table} AS SELECT * FROM "
                f"'{tmp_path}/{table}.parquet'")
    return con


def _canon(d, float_keys=("user_id",)):
    d = d[sorted(d.columns)].copy()
    for k in float_keys:
        if k in d.columns:
            d[k] = d[k].astype("float64")
    return d.sort_values(list(d.columns),
                         na_position="first").reset_index(drop=True)


DAY = 86_400_000_000


class TestEventsPivot:
    def test_planted_unknown_type_and_nulls(self, ray_session, tmp_path):
        """A type outside the declared pivot set rolls into n_other;
        NULL users form one pivot row; NULL values count toward n_*
        but add 0 to v_*."""
        rows = [
            {"event_id": 1, "ts": 0, "user_id": 1,
             "event_type": "click", "value": 2.5, "props": "{}"},
            {"event_id": 2, "ts": 1, "user_id": 1,
             "event_type": "click", "value": None, "props": "{}"},
            {"event_id": 3, "ts": 2, "user_id": 1,
             "event_type": "mystery", "value": 9.0, "props": "{}"},
            {"event_id": 4, "ts": 3, "user_id": None,
             "event_type": "view", "value": 1.25, "props": "{}"},
            {"event_id": 5, "ts": 4, "user_id": None,
             "event_type": "purchase", "value": 3.75, "props": "{}"},
        ]
        _write_events(tmp_path, rows)
        got = events_type_pivot(str(tmp_path)).to_pandas()
        want = _con(tmp_path, "events").execute(EVENTS_PIVOT_SQL).df()
        pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                      check_dtype=False)
        u1 = got[got.user_id == 1].iloc[0]
        assert u1["n_click"] == 2 and u1["v_click"] == 2.5
        assert u1["n_other"] == 1
        un = got[got.user_id.isna()].iloc[0]
        assert un["n_view"] == 1 and un["v_purchase"] == 3.75

    def test_sf0001_matches_oracle(self, ray_session):
        sf = "/root/testdata/sf0.001"
        got = events_type_pivot(sf).to_pandas()
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{sf}/events.parquet'")
        want = con.execute(EVENTS_PIVOT_SQL).df()
        pd.testing.assert_frame_equal(_canon(got), _canon(want),
                                      check_dtype=False)


class TestOrdersRollup:
    def test_planted_null_keys_vs_subtotals(self, ray_session, tmp_path):
        """A NULL data key stays a lvl-0 group; subtotal rows carry
        lvl 1 / 3 — exactly GROUPING()'s disambiguation."""
        rows = [
            {"o_orderkey": 1, "o_custkey": 1, "o_orderstatus": "O",
             "o_totalprice": 10.0, "o_orderdate": 0,
             "o_orderpriority": "1-URGENT"},
            {"o_orderkey": 2, "o_custkey": 1, "o_orderstatus": "O",
             "o_totalprice": 20.0, "o_orderdate": 400 * DAY,
             "o_orderpriority": "1-URGENT"},
            {"o_orderkey": 3, "o_custkey": 2, "o_orderstatus": "F",
             "o_totalprice": 40.0, "o_orderdate": 0,
             "o_orderpriority": None},          # NULL data key
        ]
        _write_orders(tmp_path, rows)
        got = orders_rollup(str(tmp_path)).to_pandas()
        want = _con(tmp_path, "orders").execute(ORDERS_ROLLUP_SQL).df()
        pd.testing.assert_frame_equal(
            _canon(got, ()), _canon(want, ()), check_dtype=False)
        # the NULL-priority group appears at lvl 0 AND as its own lvl-1
        # subtotal, distinct from the grand total
        nul0 = got[(got.lvl == 0) & got.o_orderpriority.isna()]
        assert len(nul0) == 1 and nul0.iloc[0]["revenue"] == 40.0
        grand = got[got.lvl == 3]
        assert len(grand) == 1 and grand.iloc[0]["n_orders"] == 3
        assert grand.iloc[0]["revenue"] == 70.0
        # per-priority subtotal sums both years
        sub = got[(got.lvl == 1) & (got.o_orderpriority == "1-URGENT")]
        assert sub.iloc[0]["n_orders"] == 2
        assert sub.iloc[0]["revenue"] == 30.0

    def test_sf0001_matches_oracle(self, ray_session):
        sf = "/root/testdata/sf0.001"
        got = orders_rollup(sf).to_pandas()
        con = duckdb.connect()
        con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                    f"'{sf}/orders.parquet'")
        want = con.execute(ORDERS_ROLLUP_SQL).df()
        pd.testing.assert_frame_equal(
            _canon(got, ()), _canon(want, ()), check_dtype=False)


class TestMergeChangeset:
    def test_planted_cdc_semantics(self, ray_session, tmp_path):
        """Every stream interaction: update, delete, update-then-delete
        (%91), delete-then-reinsert (%26), two competing updates (%14),
        fresh insert (%11), untouched base row."""
        keys = [1, 7, 13, 14, 26, 91, 182, 11]
        rows = [{"o_orderkey": k, "o_custkey": k * 10,
                 "o_orderstatus": "O", "o_totalprice": 100.0,
                 "o_orderdate": 0, "o_orderpriority": "5-LOW"}
                for k in keys]
        _write_orders(tmp_path, rows)
        got = merge_changeset(str(tmp_path)).to_pandas()
        want = _con(tmp_path, "orders").execute(MERGE_CHANGESET_SQL).df()
        pd.testing.assert_frame_equal(
            _canon(got, ()), _canon(want, ()), check_dtype=False)

        by_key = {int(r["o_orderkey"]): r for r in got.to_dict("records")}
        assert by_key[1]["o_orderstatus"] == "O"      # untouched
        assert by_key[7]["o_orderstatus"] == "X"      # seq-1 update
        assert by_key[7]["o_totalprice"] == 200.0
        assert 13 not in by_key                       # deleted
        assert 91 not in by_key                       # U then D: D wins
        assert by_key[14]["o_orderstatus"] == "Y"     # seq-3 beats seq-1
        assert by_key[14]["o_totalprice"] == 300.0
        assert by_key[26]["o_orderstatus"] == "Z"     # resurrection
        assert by_key[26]["o_totalprice"] == 1.0
        assert by_key[182]["o_orderstatus"] == "Z"    # U,D,U,I: I wins
        # fresh insert for key % 11 == 0
        assert by_key[10_000_011]["o_orderstatus"] == "N"
        assert by_key[10_000_011]["o_totalprice"] == 11.0

    def test_sf0001_matches_oracle(self, ray_session):
        sf = "/root/testdata/sf0.001"
        got = merge_changeset(sf).to_pandas()
        con = duckdb.connect()
        con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                    f"'{sf}/orders.parquet'")
        want = con.execute(MERGE_CHANGESET_SQL).df()
        pd.testing.assert_frame_equal(
            _canon(got, ()), _canon(want, ()), check_dtype=False)


class TestMergeTimeTravel:
    def test_every_snapshot_matches_oracle(self, ray_session):
        from ocr_ray.functions.relational import merge_changeset_as_of_sql

        sf = "/root/testdata/sf0.001"
        con = duckdb.connect()
        con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                    f"'{sf}/orders.parquet'")
        for seq in range(5):
            got = merge_changeset(sf, as_of_seq=seq).to_pandas()
            want = con.execute(merge_changeset_as_of_sql(seq)).df()
            pd.testing.assert_frame_equal(
                _canon(got, ()), _canon(want, ()), check_dtype=False,
                obj=f"as_of={seq}")

    def test_as_of_latest_equals_default(self, ray_session):
        sf = "/root/testdata/sf0.001"
        a = _canon(merge_changeset(sf).to_pandas(), ())
        b = _canon(merge_changeset(sf, as_of_seq=4).to_pandas(), ())
        pd.testing.assert_frame_equal(a, b, check_dtype=False)

    def test_as_of_zero_is_base_snapshot(self, ray_session):
        sf = "/root/testdata/sf0.001"
        got = _canon(merge_changeset(sf, as_of_seq=0).to_pandas(), ())
        con = duckdb.connect()
        con.execute(f"CREATE VIEW orders AS SELECT * FROM "
                    f"'{sf}/orders.parquet'")
        want = _canon(con.execute("""
            SELECT o_orderkey, o_custkey, o_orderstatus,
                   floor((CAST(floor(o_totalprice * 100.0 + 0.5) AS BIGINT)
                          / 100.0) * 100.0 + 0.5) / 100.0 AS o_totalprice
            FROM orders""").df(), ())
        pd.testing.assert_frame_equal(got, want, check_dtype=False)

    def test_resurrection_timeline(self, ray_session, tmp_path):
        """Key 26 (%13 delete at seq 2, %26 reinsert at seq 4): present
        at 0-1, absent at 2-3, back with status Z at 4."""
        rows = [{"o_orderkey": 26, "o_custkey": 260,
                 "o_orderstatus": "O", "o_totalprice": 100.0,
                 "o_orderdate": 0, "o_orderpriority": "5-LOW"}]
        _write_orders(tmp_path, rows)
        present = {}
        for seq in range(5):
            df = merge_changeset(str(tmp_path), as_of_seq=seq).to_pandas()
            by_key = {int(r["o_orderkey"]): r
                      for r in df.to_dict("records")}
            present[seq] = by_key.get(26)
        assert present[0]["o_orderstatus"] == "O"
        assert present[1]["o_orderstatus"] == "O"   # 26 % 7 != 0
        assert present[2] is None and present[3] is None
        assert present[4]["o_orderstatus"] == "Z"
        assert present[4]["o_totalprice"] == 1.0


class TestUnpivot:
    def test_roundtrip_equals_long_groupby(self, ray_session):
        """melt(pivot(events)) == the long-form groupby (the reshape
        inverse law), via the SQL oracle at sf0.001."""
        from ocr_ray.functions.events import (
            EVENTS_UNPIVOT_SQL,
            events_unpivot,
        )

        sf = "/root/testdata/sf0.001"
        got = events_unpivot(sf).to_pandas()
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{sf}/events.parquet'")
        want = con.execute(EVENTS_UNPIVOT_SQL).df()
        pd.testing.assert_frame_equal(
            _canon(got), _canon(want), check_dtype=False)
        assert len(got) > 0

    def test_melt_generic(self, ray_session):
        import ray.data as rd

        from ocr_ray.functions.relational import melt

        t = pa.table({"id": [1, 2], "a_x": [10, 20], "a_y": [1.5, 2.5],
                      "b_x": [30, 40], "b_y": [3.5, 4.5]})
        out = melt(rd.from_arrow(t), ["id"],
                   {"a": {"x": "a_x", "y": "a_y"},
                    "b": {"x": "b_x", "y": "b_y"}},
                   var_name="grp").to_pandas() \
            .sort_values(["id", "grp"]).reset_index(drop=True)
        assert list(out.columns) == ["id", "grp", "x", "y"]
        assert out.values.tolist() == [
            [1, "a", 10, 1.5], [1, "b", 30, 3.5],
            [2, "a", 20, 2.5], [2, "b", 40, 4.5]]

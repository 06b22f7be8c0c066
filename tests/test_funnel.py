"""Funnel analysis: DuckDB parity at sf0.001, planted boundary
semantics (inclusive window edges, same-ts steps, NULL users)."""

import os
from datetime import datetime, timedelta

import pyarrow as pa
import pyarrow.parquet as pq


def _write_events(path, rows):
    """rows: (user_id | None, minutes_offset, event_type)"""
    os.makedirs(path, exist_ok=True)
    base = datetime(2024, 1, 1)
    pq.write_table(pa.Table.from_pylist([
        {"event_id": i, "ts": base + timedelta(minutes=m),
         "user_id": u, "event_type": t, "value": 1.0, "props": "{}"}
        for i, (u, m, t) in enumerate(rows)]),
        f"{path}/events.parquet")


class TestParity:
    def test_sf0001_matches_duckdb(self, ray_session):
        import duckdb

        from ocr_ray.functions.events import (
            event_funnel,
            event_funnel_sql,
        )

        sf = "/root/testdata/sf0.001"
        got = event_funnel(sf).to_pandas().sort_values("step") \
            .reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{sf}/events.parquet'")
        want = con.execute(event_funnel_sql()).fetchdf()
        assert list(got["step"]) == list(want["step"])
        assert list(got["event_type"]) == list(want["event_type"])
        assert list(got["n_users"]) == list(want["n_users"])
        assert list(got["conversion"]) == list(want["conversion"])
        assert got["n_users"].iloc[0] > 0


class TestSemantics:
    def test_planted_funnel(self, ray_session, tmp_path):
        from ocr_ray.functions.events import event_funnel

        sf = str(tmp_path / "sf")
        _write_events(sf, [
            # user 1: full funnel inside the window
            (1, 0, "view"), (1, 10, "click"), (1, 20, "purchase"),
            # user 2: click lands exactly AT the 24 h edge (inclusive)
            (2, 0, "view"), (2, 24 * 60, "click"),
            # user 3: click one minute past the window -> drops at step 2
            (3, 0, "view"), (3, 24 * 60 + 1, "click"),
            # user 4: purchase BEFORE the click -> not counted at step 3
            (4, 0, "view"), (4, 30, "purchase"), (4, 40, "click"),
            # user 5: click at the SAME ts as the view (inclusive >=)
            (5, 0, "view"), (5, 0, "click"),
            # NULL user: never counted
            (None, 0, "view"), (None, 1, "click"),
        ])
        out = {r["step"]: r["n_users"]
               for r in event_funnel(sf).take_all()}
        assert out == {1: 5, 2: 4, 3: 1}

    def test_matches_duckdb_on_planted(self, ray_session, tmp_path):
        import duckdb

        from ocr_ray.functions.events import (
            event_funnel,
            event_funnel_sql,
        )

        sf = str(tmp_path / "sf")
        _write_events(sf, [
            (1, 0, "view"), (1, 5, "click"), (1, 9, "purchase"),
            (2, 0, "view"), (2, 24 * 60, "click"), (2, 24 * 60, "purchase"),
            (3, 3, "click"), (3, 4, "purchase"),      # no view: step-1 miss
        ])
        got = event_funnel(sf).to_pandas().sort_values("step") \
            .reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{sf}/events.parquet'")
        want = con.execute(event_funnel_sql()).fetchdf()
        assert list(got["n_users"]) == list(want["n_users"])
        assert list(got["conversion"]) == list(want["conversion"])


class TestTransitions:
    def test_sf0001_matches_duckdb(self, ray_session):
        import duckdb

        from ocr_ray.functions.events import (
            EVENT_TRANSITIONS_SQL,
            event_transitions,
        )

        sf = "/root/testdata/sf0.001"
        got = event_transitions(sf).to_pandas() \
            .sort_values(["from_type", "to_type"]).reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{sf}/events.parquet'")
        want = con.execute(EVENT_TRANSITIONS_SQL
                           + " ORDER BY from_type, to_type").fetchdf()
        assert list(got["from_type"]) == list(want["from_type"])
        assert list(got["to_type"]) == list(want["to_type"])
        assert list(got["n_transitions"]) == list(want["n_transitions"])
        assert got["n_transitions"].sum() > 0

    def test_planted_chain(self, ray_session, tmp_path):
        from ocr_ray.functions.events import event_transitions

        sf = str(tmp_path / "sf")
        _write_events(sf, [
            (1, 0, "view"), (1, 1, "click"), (1, 2, "click"),
            (2, 0, "view"), (2, 1, "click"),
            (None, 0, "view"), (None, 1, "click"),   # excluded
        ])
        out = {(r["from_type"], r["to_type"]): r["n_transitions"]
               for r in event_transitions(sf).take_all()}
        assert out == {("view", "click"): 2, ("click", "click"): 1}

    def test_same_ts_tiebreak_by_event_id(self, ray_session, tmp_path):
        from ocr_ray.functions.events import event_transitions

        sf = str(tmp_path / "sf")
        # both events at minute 0: order must follow event_id (0 then 1)
        _write_events(sf, [(1, 0, "signup"), (1, 0, "view")])
        out = {(r["from_type"], r["to_type"]): r["n_transitions"]
               for r in event_transitions(sf).take_all()}
        assert out == {("signup", "view"): 1}


class TestRetention:
    def test_sf0001_matches_duckdb(self, ray_session):
        import duckdb

        from ocr_ray.functions.events import (
            WEEKLY_RETENTION_SQL,
            weekly_retention,
        )

        sf = "/root/testdata/sf0.001"
        got = weekly_retention(sf).to_pandas() \
            .sort_values(["cohort_week", "week_offset"]) \
            .reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{sf}/events.parquet'")
        want = con.execute(WEEKLY_RETENTION_SQL
                           + " ORDER BY cohort_week, week_offset") \
            .fetchdf()
        assert list(got["cohort_week"]) == list(want["cohort_week"])
        assert list(got["week_offset"]) == list(want["week_offset"])
        assert list(got["n_users"]) == list(want["n_users"])
        assert len(got) > 1

    def test_planted_cohorts(self, ray_session, tmp_path):
        from ocr_ray.functions.events import weekly_retention

        sf = str(tmp_path / "sf")
        wk = 7 * 24 * 60          # one week in minutes
        _write_events(sf, [
            # user 1: weeks 0, 1, 3 (two events in week 1 count once)
            (1, 0, "view"), (1, wk, "click"), (1, wk + 9, "view"),
            (1, 3 * wk, "view"),
            # user 2: joins in week 1, returns week 2
            (2, wk, "view"), (2, 2 * wk, "view"),
            (None, 0, "view"),                       # excluded
        ])
        out = {(r["cohort_week"], r["week_offset"]): r["n_users"]
               for r in weekly_retention(sf).take_all()}
        base = 2817  # epoch-week of 2024-01-01 (pure epoch math)
        assert out == {(base, 0): 1, (base, 1): 1, (base, 3): 1,
                       (base + 1, 0): 1, (base + 1, 1): 1}


class TestQ13:
    def test_sf0001_matches_duckdb(self, ray_session):
        import duckdb

        from ocr_ray.functions.relational import (
            Q13_SQL,
            q13_customer_distribution,
        )

        sf = "/root/testdata/sf0.001"
        got = q13_customer_distribution(sf).to_pandas() \
            .reset_index(drop=True)
        con = duckdb.connect()
        for t in ("customer", "orders"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"'{sf}/{t}.parquet'")
        want = con.execute(Q13_SQL).fetchdf()
        assert list(got["c_count"]) == list(want["c_count"])
        assert list(got["custdist"]) == list(want["custdist"])
        # the outer join must surface zero-order customers
        assert 0 in set(got["c_count"]) or \
            int(want[want["c_count"] == 0]["custdist"].sum()) == 0


class TestQ18:
    def test_sf0001_matches_duckdb(self, ray_session):
        import duckdb

        from ocr_ray.functions.relational import (
            Q18_SQL,
            q18_large_volume_customers,
        )

        sf = "/root/testdata/sf0.001"
        got = q18_large_volume_customers(sf).to_pandas() \
            .reset_index(drop=True)
        con = duckdb.connect()
        for t in ("lineitem", "orders"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"'{sf}/{t}.parquet'")
        want = con.execute(Q18_SQL).fetchdf()
        assert len(got) == len(want) > 0
        for col in ("c_custkey", "o_orderkey", "o_orderdate",
                    "o_totalprice", "sum_qty"):
            assert list(got[col]) == list(want[col]), col


class TestQ7:
    def test_sf0001_matches_duckdb(self, ray_session):
        import duckdb

        from ocr_ray.functions.relational import Q7_SQL, q7_nation_volume

        sf = "/root/testdata/sf0.001"
        got = q7_nation_volume(sf).to_pandas() \
            .sort_values(["supp_nation", "cust_nation", "l_year"]) \
            .reset_index(drop=True)
        con = duckdb.connect()
        for t in ("lineitem", "supplier", "nation", "orders",
                  "customer"):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                        f"'{sf}/{t}.parquet'")
        want = con.execute(
            Q7_SQL + " ORDER BY supp_nation, cust_nation, l_year") \
            .fetchdf()
        assert len(got) == len(want) > 0
        for col in ("supp_nation", "cust_nation", "l_year", "revenue"):
            assert list(got[col]) == list(want[col]), col


class TestSaltedJoin:
    def test_equals_plain_join_on_planted_skew(self, ray_session):
        """90% of the large side carries ONE key: the salted join must
        return exactly the plain join's multiset of rows."""
        import numpy as np
        import ray.data as rd

        from ocr_ray.functions.relational import salted_join

        rng = np.random.RandomState(4)
        keys = np.where(rng.rand(5000) < 0.9, 7,
                        rng.randint(0, 50, 5000)).astype(np.int64)
        large = rd.from_arrow(pa.table({
            "k": pa.array(keys, pa.int64()),
            "v": pa.array(np.arange(5000), pa.int64())}))
        small = rd.from_arrow(pa.table({
            "rk": pa.array(np.arange(0, 50, 1), pa.int64()),
            "name": pa.array([f"n{i}" for i in range(50)],
                             pa.string())}))

        got = sorted((r["k"], r["v"], r["name"]) for r in
                     salted_join(large, small, on="k",
                                 right_on="rk").take_all())
        want = sorted((int(k), int(v), f"n{k}")
                      for k, v in zip(keys, np.arange(5000)))
        assert got == want

    def test_small_side_dup_keys(self, ray_session):
        """Duplicate keys on the small side multiply rows exactly as a
        plain join would."""
        import numpy as np
        import ray.data as rd

        from ocr_ray.functions.relational import salted_join

        large = rd.from_arrow(pa.table({
            "k": pa.array([1, 1, 2], pa.int64()),
            "v": pa.array([10, 11, 20], pa.int64())}))
        small = rd.from_arrow(pa.table({
            "k": pa.array([1, 1, 2], pa.int64()),
            "w": pa.array([100, 101, 200], pa.int64())}))
        got = sorted((r["k"], r["v"], r["w"]) for r in
                     salted_join(large, small, on="k",
                                 num_partitions=4).take_all())
        assert got == [(1, 10, 100), (1, 10, 101), (1, 11, 100),
                       (1, 11, 101), (2, 20, 200)]


class TestRandomizedParity:
    def test_event_trio_random_streams(self, ray_session, tmp_path):
        """20 seeded random event streams with adversarial structure
        (same-ts collisions, NULL users, exact-window boundaries,
        singleton users): funnel, transitions and retention must match
        DuckDB on every one."""
        import duckdb
        import numpy as np

        from ocr_ray.functions.events import (
            EVENT_TRANSITIONS_SQL,
            WEEKLY_RETENTION_SQL,
            event_funnel,
            event_funnel_sql,
            event_transitions,
            weekly_retention,
        )

        types = ["view", "click", "purchase", "error"]
        for seed in range(20):
            rng = np.random.RandomState(seed)
            n = int(rng.randint(5, 120))
            rows = []
            for i in range(n):
                u = None if rng.rand() < 0.1 else int(rng.randint(1, 8))
                # coarse minute grid -> frequent same-ts collisions;
                # occasionally land EXACTLY on the 24 h boundary
                m = int(rng.choice([0, 1, 5, 24 * 60,
                                    int(rng.randint(0, 3000))]))
                rows.append((u, m, types[int(rng.randint(0, 4))]))
            sf = str(tmp_path / f"sf{seed}")
            _write_events(sf, rows)
            con = duckdb.connect()
            con.execute(f"CREATE VIEW events AS SELECT * FROM "
                        f"'{sf}/events.parquet'")

            got = event_funnel(sf).to_pandas().sort_values("step") \
                .reset_index(drop=True)
            want = con.execute(event_funnel_sql()).fetchdf()
            assert list(got["n_users"]) == list(want["n_users"]), \
                f"funnel seed {seed}"

            got = event_transitions(sf).to_pandas() \
                .sort_values(["from_type", "to_type"]) \
                .reset_index(drop=True)
            want = con.execute(
                EVENT_TRANSITIONS_SQL
                + " ORDER BY from_type, to_type").fetchdf()
            assert list(got["from_type"]) == list(want["from_type"]) \
                and list(got["n_transitions"]) == \
                list(want["n_transitions"]), f"transitions seed {seed}"

            got = weekly_retention(sf).to_pandas() \
                .sort_values(["cohort_week", "week_offset"]) \
                .reset_index(drop=True)
            want = con.execute(
                WEEKLY_RETENTION_SQL
                + " ORDER BY cohort_week, week_offset").fetchdf()
            assert list(got["n_users"]) == list(want["n_users"]), \
                f"retention seed {seed}"
            con.close()


class TestSaltedJoinFuzz:
    def test_random_tables_equal_plain_join(self, ray_session):
        """10 seeded random (large, small) table pairs incl. dup keys
        on both sides and keys that miss: salted == plain, exactly."""
        import numpy as np
        import ray.data as rd

        from ocr_ray.functions.relational import salted_join

        for seed in range(10):
            rng = np.random.RandomState(100 + seed)
            nl = int(rng.randint(10, 400))
            ns = int(rng.randint(1, 40))
            lk = rng.randint(0, 20, nl).astype(np.int64)
            sk = rng.randint(0, 25, ns).astype(np.int64)  # some miss
            large = rd.from_arrow(pa.table({
                "k": pa.array(lk, pa.int64()),
                "v": pa.array(np.arange(nl), pa.int64())}))
            small = rd.from_arrow(pa.table({
                "k": pa.array(sk, pa.int64()),
                "w": pa.array(np.arange(ns), pa.int64())}))
            got = sorted((r["k"], r["v"], r["w"]) for r in
                         salted_join(large, small, on="k",
                                     n_salts=int(rng.randint(2, 9)),
                                     num_partitions=4).take_all())
            want = sorted((int(k), int(v), int(w))
                          for v, k in enumerate(lk)
                          for w, k2 in enumerate(sk) if k == k2)
            assert got == want, f"seed {seed}"


class TestFunnelEmptyCorpus:
    def test_no_step_events_still_emits_all_steps(self, ray_session,
                                                  tmp_path):
        """A corpus with NO funnel-step events must still emit
        len(steps) zero rows, matching the SQL oracle (review fix)."""
        import duckdb

        from ocr_ray.functions.events import (
            event_funnel,
            event_funnel_sql,
        )

        sf = str(tmp_path / "sf")
        _write_events(sf, [(1, 0, "error"), (None, 1, "view")])
        got = event_funnel(sf).to_pandas().sort_values("step") \
            .reset_index(drop=True)
        con = duckdb.connect()
        con.execute(f"CREATE VIEW events AS SELECT * FROM "
                    f"'{sf}/events.parquet'")
        want = con.execute(event_funnel_sql()).fetchdf()
        assert len(got) == len(want) == 3
        assert list(got["n_users"]) == list(want["n_users"]) == [0, 0, 0]
        assert list(got["conversion"]) == list(want["conversion"])

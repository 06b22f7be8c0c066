"""Mimic the driver's correctness gate locally: run every queries() entry
and compare against oracle_sql() via DuckDB (row count + sorted-column
value comparison). Usage: python scripts/selfcheck.py [sf_dir] [name...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import pandas as pd

TABLES = ("region nation customer supplier part orders lineitem events "
          "documents embeddings").split()


def to_pandas(res) -> pd.DataFrame:
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.to_pandas()
    if isinstance(res, pa.Table):
        return res.to_pandas()
    return res


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def compare(name: str, ray_df: pd.DataFrame, sql_df: pd.DataFrame) -> list[str]:
    issues = []
    if len(ray_df) != len(sql_df):
        issues.append(f"rowcount ray={len(ray_df)} sql={len(sql_df)}")
    if sorted(ray_df.columns) != sorted(sql_df.columns):
        issues.append(f"columns ray={sorted(ray_df.columns)} sql={sorted(sql_df.columns)}")
        return issues
    a, b = canon(ray_df), canon(sql_df)
    for col in a.columns:
        if str(a[col].dtype) != str(b[col].dtype):
            issues.append(f"dtype[{col}] ray={a[col].dtype} sql={b[col].dtype}")
    if len(a) == len(b):
        for col in a.columns:
            try:
                eq = (a[col].values == b[col].values) | (
                    a[col].isna().values & b[col].isna().values)
                if not eq.all():
                    i = int((~eq).argmax())
                    issues.append(
                        f"value[{col}] row{i}: ray={a[col].iloc[i]!r} "
                        f"sql={b[col].iloc[i]!r} ({int((~eq).sum())} diffs)")
            except Exception as e:
                issues.append(f"cmp[{col}] error {e}")
    return issues


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import ray
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext
    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as e

    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{sf_dir}/{t}.parquet')")

    qs, oracles = e.queries(), e.oracle_sql()
    n_pass = n_fail = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            ray_df = to_pandas(fn(sf_dir))
        except Exception as ex:
            print(f"FAIL {name}: query raised {type(ex).__name__}: {ex}")
            n_fail += 1
            continue
        dt = time.time() - t0
        if name not in oracles:
            ok = len(ray_df) >= 0
            print(f"rows-only {name}: {len(ray_df)} rows  [{dt:.1f}s]")
            continue
        try:
            sql_df = con.execute(oracles[name]).df()
        except Exception as ex:
            print(f"FAIL {name}: oracle raised {ex}")
            n_fail += 1
            continue
        issues = compare(name, ray_df, sql_df)
        if issues:
            n_fail += 1
            print(f"FAIL {name} [{dt:.1f}s]: " + "; ".join(issues[:4]))
        else:
            n_pass += 1
            print(f"PASS {name}: {len(ray_df)} rows  [{dt:.1f}s]")
    print(f"\n{n_pass} pass, {n_fail} fail")
    ray.shutdown()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

"""Local stand-in for the driver's correctness gate: run every queries()
entry and its oracle_sql() side by side, compare row count, column names,
and order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb
import numpy as np
import pandas as pd
import ray

TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()


def to_pandas(obj):
    if isinstance(obj, pd.DataFrame):
        return obj
    if hasattr(obj, "to_pandas"):
        return obj.to_pandas()
    import pyarrow as pa

    if isinstance(obj, pa.Table):
        return obj.to_pandas()
    raise TypeError(type(obj))


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif np.issubdtype(df[c].dtype, np.floating):
            df[c] = df[c].astype("float64").round(6)
        elif np.issubdtype(df[c].dtype, np.integer):
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns), kind="mergesort").reset_index(drop=True)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    ray.init(address="local", num_cpus=8, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    import __ray_entry__ as entrymod

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entrymod.queries()
    oracles = entrymod.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            got = to_pandas(fn(sf_dir))
        except Exception as e:
            failures.append(name)
            print(f"[ERR ] {name}: query raised {type(e).__name__}: {e}")
            continue
        if name not in oracles:
            print(f"[ROWS] {name}: {len(got)} rows, cols={list(got.columns)} (no oracle)")
            continue
        try:
            want = con.sql(oracles[name]).df()
        except Exception as e:
            failures.append(name)
            print(f"[ERR ] {name}: oracle raised {type(e).__name__}: {e}")
            continue
        g, w = canon(got), canon(want)
        if list(g.columns) != list(w.columns):
            failures.append(name)
            print(f"[FAIL] {name}: columns {list(g.columns)} != {list(w.columns)}")
            continue
        if len(g) != len(w):
            failures.append(name)
            print(f"[FAIL] {name}: rows {len(g)} != {len(w)}")
            continue
        if not g.equals(w):
            neq = (g != w).any(axis=1)
            failures.append(name)
            print(f"[FAIL] {name}: {int(neq.sum())}/{len(g)} rows differ")
            print(pd.concat([g[neq].head(3).add_suffix("_got"),
                             w[neq].head(3).add_suffix("_want")], axis=1).to_string())
            continue
        print(f"[ OK ] {name}: {len(g)} rows match")

    ray.shutdown()
    if failures:
        print("FAILED:", failures)
        sys.exit(1)
    print("all checks passed")


if __name__ == "__main__":
    main()

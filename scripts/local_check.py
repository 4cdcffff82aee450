#!/usr/bin/env python3
"""Local pre-flight mimicking the driver's DuckDB oracle compare.

Usage: python3 scripts/local_check.py <verify_out_dir> <sf_dir> [query ...]

Reads <out>/<name>/ parquet (Spark result) and <out>/oracle_sql.json, runs
each oracle SQL in DuckDB against the sf_dir parquet tables, then compares:
column names (sorted), row counts, and values (rows sorted, NaN-safe,
list columns normalized). Exit 1 on any mismatch.
"""
import json
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: tuple(v.tolist()) if isinstance(v, np.ndarray)
                else tuple(v) if isinstance(v, list) else v)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def dtype_key(dt) -> str:
    """Dtype signature matching the driver's sensitivity: the driver hashes
    the typed frame, so int64 vs float64 (e.g. DuckDB HUGEINT from
    sum(integer) vs Spark BIGINT) must FAIL here too. Only timestamp unit
    (ns/us) and tz-naive representation are collapsed — parquet readers
    disagree on those while the driver's compare does not."""
    s = str(dt)
    if s.startswith("datetime64"):
        return "datetime64"
    return s


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(q for arg in sys.argv[3:] for q in arg.split(",") if q)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    if only:
        unknown = only - set(oracle)
        if unknown:
            print(f"FAIL unknown query names: {sorted(unknown)}")
            sys.exit(1)
    failed = []
    checked = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        checked += 1
        try:
            got = pd.read_parquet(f"{out_dir}/{name}")
        except Exception as e:
            print(f"FAIL {name}: spark output missing ({e})")
            failed.append(name)
            continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            failed.append(name)
            continue
        g, x = norm(got), norm(exp)
        if list(g.columns) != list(x.columns):
            print(f"FAIL {name}: columns {list(g.columns)} vs {list(x.columns)}")
            failed.append(name)
            continue
        if len(g) != len(x):
            print(f"FAIL {name}: rows {len(g)} vs {len(x)}")
            failed.append(name)
            continue
        gd = [dtype_key(t) for t in g.dtypes]
        xd = [dtype_key(t) for t in x.dtypes]
        if gd != xd:
            diff = [f"{c}: {a} vs {b}"
                    for c, a, b in zip(g.columns, gd, xd) if a != b]
            print(f"FAIL {name}: dtypes differ ({'; '.join(diff)})")
            failed.append(name)
            continue
        bad = None
        for c in g.columns:
            a, b = g[c], x[c]
            if pd.api.types.is_float_dtype(a) and pd.api.types.is_float_dtype(b):
                ok = ((a.isna() & b.isna()) | (a == b)).all()
            else:
                ok = a.astype(object).where(pd.notna(a), None).equals(
                    b.astype(object).where(pd.notna(b), None))
            if not ok:
                mism = None
                try:
                    neq = ~((a.isna() & b.isna()) | (a.astype(object) == b.astype(object)))
                    i = int(np.argmax(neq.values))
                    mism = f"row {i}: {a.iloc[i]!r} vs {b.iloc[i]!r}"
                except Exception:
                    pass
                bad = f"col {c} differs ({mism})"
                break
        if bad:
            print(f"FAIL {name}: {bad}")
            failed.append(name)
        else:
            print(f"OK   {name} ({len(g)} rows)")
    # Summary counts ONLY what this invocation actually compared: a
    # subset run must never read as a full pass (round 10: a
    # comma-separated name list silently matched nothing and printed
    # the full N/N — two real failures hid behind it).
    if only:
        print(f"\n{checked - len(failed)}/{checked} checked ok "
              f"({len(oracle) - checked} not checked)")
    else:
        print(f"\n{checked - len(failed)}/{checked} ok")
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()

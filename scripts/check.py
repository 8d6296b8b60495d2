#!/usr/bin/env python3
"""Local mirror of the driver's correctness gate (dev tool only, not part
of the engine): runs DuckDB on each oracle_sql.json entry over the same
parquet tables and compares with the Verify-dumped Spark result.

Usage: python3 scripts/check.py <sfDir> <verifyOutDir>
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(sf_dir, out_dir, prefixes=()):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    import glob
    import os
    dumped = set(os.path.basename(p) for p in glob.glob(f"{out_dir}/*")
                 if os.path.isdir(p))
    try:
        declared = set(json.load(open(f"{out_dir}/queries.json")))
    except FileNotFoundError:
        declared = set()
    # union of dumped dirs, declared queries, and oracle keys: a query that
    # crashed in Verify (no dir) or an orphan oracle entry is a failure,
    # never silently skipped
    names = sorted(dumped | declared | set(oracle))
    # optional CLI prefixes: check only matching queries (dev iteration
    # on a single oracle; the driver-equivalent full gate passes none)
    if prefixes:
        names = [n for n in names if any(n.startswith(p) for p in prefixes)]
    for name in names:
        if name not in dumped:
            print(f"{name:40s} MISSING OUTPUT (crashed in Verify or orphan oracle)")
            failures += 1
            continue
        got = con.sql(f"SELECT * FROM '{out_dir}/{name}/*.parquet'").df()
        if name not in oracle:
            print(f"{name:40s} rows-only: {len(got)} rows "
                  f"{'OK' if len(got) > 0 else 'EMPTY!'}")
            continue
        try:
            exp = con.sql(oracle[name]).df()
        except Exception as e:
            print(f"{name:40s} ORACLE SQL ERROR: {e}")
            failures += 1
            continue
        g, e = canon(got), canon(exp)
        if list(g.columns) != list(e.columns):
            print(f"{name:40s} SCHEMA MISMATCH spark={list(g.columns)} "
                  f"duckdb={list(e.columns)}")
            failures += 1
            continue
        if len(g) != len(e):
            print(f"{name:40s} ROWCOUNT MISMATCH spark={len(g)} duckdb={len(e)}")
            failures += 1
            continue
        # exact-value compare (same spirit as the driver's hash compare)
        try:
            import pandas as pd
            pd.testing.assert_frame_equal(g, e, check_dtype=False,
                                          check_exact=True)
            # the driver's hash compare is dtype-sensitive (e.g. DuckDB
            # HUGEINT sums surface as float64 vs Spark int64) — treat a
            # kind mismatch as a failure even when values compare equal
            kinds_g = [g[c].dtype.kind for c in g.columns]
            kinds_e = [e[c].dtype.kind for c in e.columns]
            if kinds_g != kinds_e:
                print(f"{name:40s} DTYPE MISMATCH spark={kinds_g} duckdb={kinds_e}")
                failures += 1
            else:
                print(f"{name:40s} OK ({len(g)} rows)")
        except AssertionError as ex:
            print(f"{name:40s} VALUE MISMATCH: {str(ex)[:300]}")
            failures += 1
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], tuple(sys.argv[3:])))

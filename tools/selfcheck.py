#!/usr/bin/env python3
"""Local mimic of the driver's DuckDB-oracle correctness gate.

Usage: python3 tools/selfcheck.py <sfDir> <verifyOutDir>

Reads each <verifyOutDir>/<name> parquet result, runs the matching
oracle SQL from oracle_sql.json in DuckDB against the raw testdata
tables, and compares: row count, sorted column names, and exact values
(column-name-sorted, as the driver hashes them).
"""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p)[:-len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
fails, passes, skipped = [], [], []
for name in sorted(oracle):
    sql = oracle[name]
    res_dir = os.path.join(outdir, name)
    if not os.path.isdir(res_dir):
        fails.append((name, "no result parquet"))
        continue
    got = con.sql(f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").df()
    want = con.sql(sql).df()
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    if list(got.columns) != list(want.columns):
        fails.append((name, f"cols {list(got.columns)} != {list(want.columns)}"))
        continue
    if len(got) != len(want):
        fails.append((name, f"rows {len(got)} != {len(want)}"))
        continue
    bad = None
    for c in got.columns:
        a, b = got[c], want[c]
        try:
            if a.dtype != b.dtype:
                # surface dtype gaps (driver may hash raw types)
                note = f"dtype {c}: {a.dtype} vs {b.dtype}"
            else:
                note = None
            eq = (a.values == b.values) | (pd.isna(a.values) & pd.isna(b.values))
            if not eq.all():
                i = int(np.argmin(eq))
                bad = f"col {c} row {i}: {a.iloc[i]!r} != {b.iloc[i]!r}"
                break
            if note:
                bad = bad or None
                print(f"  [warn] {name}: {note}")
        except Exception as ex:
            bad = f"col {c}: compare error {ex}"
            break
    if bad:
        fails.append((name, bad))
    else:
        passes.append(name)

# queries with no oracle: rows-only check
for d in sorted(glob.glob(os.path.join(outdir, "*"))):
    name = os.path.basename(d)
    if os.path.isdir(d) and name not in oracle:
        n = len(con.sql(f"SELECT * FROM read_parquet('{d}/*.parquet')").df())
        skipped.append((name, n))

print(f"\nPASS {len(passes)}: {passes}")
for name, n in skipped:
    print(f"ROWS-ONLY {name}: {n} rows")
for name, why in fails:
    print(f"FAIL {name}: {why}")
sys.exit(1 if fails else 0)

#!/usr/bin/env python3
"""Full-tier oracle sweep with per-query budgets — the sf1/sf10 version
of selfcheck.py, producing a CORRECTNESS-style JSON record.

Usage: python3 tools/tier_sweep.py <sfDir> <verifyOutDir> <out.json>
           [--timeout SEC] [--exclude name=reason ...]

Differences from selfcheck.py (the driver-gate mimic):
- each DuckDB oracle replay runs under a watchdog (con.interrupt() at
  --timeout seconds, default 900): big-tier replays that blow the
  budget are recorded as excluded with the measured time, not hung;
- --exclude marks queries as excluded-by-design up front (with the
  stated reason) without attempting the replay;
- output is the driver's CORRECTNESS_r{N}.json shape (rows_match /
  schema_match / hash_match / spark_rows / oracle_rows / err) plus an
  "_excluded" section mapping name -> reason, so the record is
  directly comparable across tiers.
"""
import sys, json, glob, os, threading, time
import duckdb
import pandas as pd
import numpy as np

args = sys.argv[1:]
timeout = 900.0
mem = "24GB"
spill = "25GB"
excludes = {}
pos = []
i = 0
while i < len(args):
    if args[i] == "--timeout":
        timeout = float(args[i + 1]); i += 2
    elif args[i] == "--mem":
        mem = args[i + 1]; i += 2
    elif args[i] == "--spill":
        spill = args[i + 1]; i += 2
    elif args[i] == "--exclude":
        name, _, reason = args[i + 1].partition("="); excludes[name] = reason
        i += 2
    else:
        pos.append(args[i]); i += 1
sfdir, outdir, outjson = pos

con = duckdb.connect()
# a runaway replay (e.g. a recursive-CTE closure at a big tier) must
# fail ITS query with an out-of-memory error, not OOM-kill the sweep;
# the temp dir lets spillable operators spill instead of failing
con.sql(f"SET memory_limit='{mem}'")
con.sql("SET temp_directory='/tmp/duckdb_sweep_spill'")
con.sql(f"SET max_temp_directory_size='{spill}'")
for p in glob.glob(os.path.join(sfdir, "*.parquet")):
    name = os.path.basename(p)[: -len(".parquet")]
    con.sql(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(os.path.join(outdir, "oracle_sql.json")))
record, excluded = {}, {}


def replay(sql):
    """Run oracle SQL under the watchdog; returns (df, seconds, timed_out)."""
    out, err = [], []
    done = threading.Event()
    t0 = time.time()

    def watchdog():
        if not done.wait(timeout):
            con.interrupt()

    w = threading.Thread(target=watchdog, daemon=True)
    w.start()
    try:
        out.append(con.sql(sql).df())
    except Exception as ex:
        err.append(ex)
    done.set()
    dt = time.time() - t0
    timed_out = bool(err) and dt >= timeout - 1
    return (out[0] if out else None), dt, timed_out, (err[0] if err else None)


for name in sorted(oracle):
    sql = oracle[name]
    res_dir = os.path.join(outdir, name)
    entry = dict(rows_match=None, schema_match=None, hash_match=None,
                 spark_rows=None, oracle_rows=None, err=None)
    if name in excludes:
        excluded[name] = excludes[name]
        continue
    if not os.path.isdir(res_dir):
        entry["err"] = "no_spark_result"
        record[name] = entry
        print(f"MISSING {name}", flush=True)
        continue
    got = con.sql(f"SELECT * FROM read_parquet('{res_dir}/*.parquet')").df()
    entry["spark_rows"] = len(got)
    want, dt, timed_out, ex = replay(sql)
    if want is None:
        if timed_out:
            excluded[name] = (f"oracle replay exceeded {timeout:.0f}s budget "
                              f"at this tier (interrupted at {dt:.0f}s)")
            print(f"EXCLUDED(timeout {dt:.0f}s) {name}", flush=True)
        elif ("OutOfMemory" in type(ex).__name__ or "emory" in str(ex)[:200]
              or "temp_directory" in str(ex) or "No space left" in str(ex)):
            excluded[name] = (f"oracle replay exceeded the {mem} DuckDB "
                              f"memory / {spill} spill budget at this tier "
                              f"({dt:.0f}s in)")
            print(f"EXCLUDED(mem {dt:.0f}s) {name}", flush=True)
        else:
            entry["err"] = f"oracle error: {ex}"
            record[name] = entry
            print(f"FAIL {name}: {ex}", flush=True)
        continue
    entry["oracle_rows"] = len(want)
    got = got[sorted(got.columns)]
    want = want[sorted(want.columns)]
    entry["schema_match"] = list(got.columns) == list(want.columns)
    entry["rows_match"] = len(got) == len(want)
    hash_ok = entry["schema_match"] and entry["rows_match"]
    if hash_ok:
        for c in got.columns:
            a, b = got[c].values, want[c].values
            try:
                eq = (a == b) | (pd.isna(a) & pd.isna(b))
                if not eq.all():
                    i0 = int(np.argmin(eq))
                    entry["err"] = (f"col {c} row {i0}: "
                                    f"{got[c].iloc[i0]!r} != {want[c].iloc[i0]!r}")
                    hash_ok = False
                    break
            except Exception as cex:
                entry["err"] = f"col {c}: compare error {cex}"
                hash_ok = False
                break
    entry["hash_match"] = hash_ok
    record[name] = entry
    status = "PASS" if hash_ok else "FAIL"
    print(f"{status} ({dt:6.1f}s) {name}"
          + (f": {entry['err']}" if entry["err"] else ""), flush=True)

# declared queries whose Spark result exists but have no oracle
for d in sorted(glob.glob(os.path.join(outdir, "*"))):
    name = os.path.basename(d)
    if os.path.isdir(d) and name not in oracle:
        n = con.sql(f"SELECT count(*) FROM read_parquet('{d}/*.parquet')").fetchone()[0]
        record[name] = dict(rows_match=None, schema_match=None,
                            hash_match=None, spark_rows=n, oracle_rows=None,
                            err="no_oracle")

record["_excluded"] = excluded
json.dump(record, open(outjson, "w"), indent=1)
npass = sum(1 for k, v in record.items()
            if k != "_excluded" and v.get("hash_match"))
nfail = sum(1 for k, v in record.items()
            if k != "_excluded" and v.get("hash_match") is False)
print(f"\nSWEEP: {npass} pass, {nfail} fail, {len(excluded)} excluded "
      f"-> {outjson}", flush=True)
sys.exit(1 if nfail else 0)

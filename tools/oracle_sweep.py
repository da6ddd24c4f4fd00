#!/usr/bin/env python3
"""Local DuckDB oracle sweep (optimization-round harness).

Usage: python3 tools/oracle_sweep.py <sfDir> <verifyOutDir> [only,csv,names]

Compares each query's Spark parquet (written by `graft.Verify`) against
the DuckDB result of oracle_sql.json run over the same sf parquet
tables. Value-exact comparison after sorting both sides identically
(ORDER BY ALL NULLS FIRST is already baked into both sides).
"""
import json, math, os, sys
import duckdb

sf, out = sys.argv[1], sys.argv[2]
only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None

con = duckdb.connect()
for f in os.listdir(sf):
    if f.endswith(".parquet"):
        t = f[:-len(".parquet")]
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{f}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))

def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return v
    if isinstance(v, bytes):
        return v.hex()
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v

fails, passes, skips = [], 0, 0
for name in sorted(oracle):
    if only is not None and name not in only:
        continue
    qdir = f"{out}/{name}"
    if not os.path.isdir(qdir):
        fails.append((name, "no spark output dir"))
        continue
    try:
        o = con.execute(oracle[name]).fetchall()
    except Exception as e:
        fails.append((name, f"oracle error: {str(e)[:200]}"))
        continue
    try:
        s = con.execute(
            f"SELECT * FROM '{qdir}/*.parquet'").fetchall()
    except Exception as e:
        fails.append((name, f"spark read error: {str(e)[:200]}"))
        continue
    if len(o) != len(s):
        fails.append((name, f"rows oracle={len(o)} spark={len(s)}"))
        continue
    no = sorted([tuple(norm(v) for v in r) for r in o], key=repr)
    ns = sorted([tuple(norm(v) for v in r) for r in s], key=repr)
    bad = None
    for i, (a, b) in enumerate(zip(no, ns)):
        if a != b:
            bad = (i, a, b)
            break
    if bad:
        fails.append((name, f"row {bad[0]}: oracle={bad[1]} spark={bad[2]}"))
    else:
        passes += 1

print(f"PASS {passes}  FAIL {len(fails)}")
for n, why in fails:
    print(f"  FAIL {n}: {why}")
sys.exit(1 if fails else 0)

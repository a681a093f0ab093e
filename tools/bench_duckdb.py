#!/usr/bin/env python3
"""Time every oracle SQL in DuckDB over the sf0.1 parquet — the
apples-to-apples baseline row for BASELINE.md's ledger (same query set
as graft.Bench). Builder-side tool only.

Usage: python3 tools/bench_duckdb.py [sfDir] [oracle_sql.json] [threads]
"""
import sys, os, glob, json, time
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
ORACLE = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"
THREADS = sys.argv[3] if len(sys.argv) > 3 else "32"

con = duckdb.connect()
con.execute(f"SET threads={THREADS}")
for p in glob.glob(f"{SF}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(ORACLE))
# One untimed warm pass per query — symmetric with graft.Bench's warm
# passes (OS page cache + DuckDB buffer warm), so the ledger compares
# steady-state against steady-state rather than cold vs warm.
for k in sorted(oracle):
    try:
        con.execute(oracle[k]).fetchall()
    except Exception:
        pass
times = {}
for k in sorted(oracle):
    t0 = time.time()
    try:
        n = len(con.execute(oracle[k]).fetchall())
    except Exception as e:
        n = -1
        print(f"{k}: ERROR {str(e)[:80]}", flush=True)
    times[k] = time.time() - t0
    print(f"{times[k]:8.2f}s  {k} ({n} rows)", flush=True)

print(json.dumps({"metric": "duckdb_total", "value": sum(times.values()),
                  "unit": "sec", "threads": THREADS, "sf": SF, "queries": times}))

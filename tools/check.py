#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (SURVEY.md §5.2.1).

Runs each oracle SQL from Verify's oracle_sql.json in DuckDB over the same
parquet tables, loads the Spark-side parquet dump, sorts columns by name,
canonicalizes values, and compares row-by-row. Usage:

    python3 tools/check.py [sfDir] [outDir]

Exit code 0 iff every oracled query matches (schema + values, in order).
This is a *builder-side* tool only — the Scala engine has no Python deps.
"""
import sys, os, glob, json, math
import duckdb

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"


def canon(v):
    """Canonical string for a cell, tolerant of engine-level type skew."""
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        # both sides round to 6 digits already; normalize -0.0 and int-floats
        r = round(v, 6)
        if r == 0:
            r = 0.0
        return repr(r)
    if isinstance(v, bool):
        return str(v)
    import decimal, datetime
    if isinstance(v, decimal.Decimal):
        # Strict: keep the scale as rendered. NOTE the external comparator
        # is stricter still (it red-flagged Spark DECIMAL(28,6) vs DuckDB
        # DECIMAL(38,6) sums even with equal values) — the type check
        # below bans decimal output columns outright.
        return str(v)
    if isinstance(v, datetime.datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return "[" + ",".join(canon(x) for x in v) + "]"
    return str(v)


def rows_of(cur):
    cols = [d[0] for d in cur.description]
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    data = cur.fetchall()
    return [cols[i] for i in order], [tuple(canon(r[i]) for i in order) for r in data]


con = duckdb.connect()
for p in glob.glob(f"{SF}/*.parquet"):
    name = os.path.basename(p).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{OUT}/oracle_sql.json"))
fails, passes = [], []
for k in sorted(oracle):
    spark_glob = f"{OUT}/{k}/*.parquet"
    if not glob.glob(spark_glob):
        fails.append((k, "spark output missing"))
        continue
    try:
        # Parity rulebook §7.3: no DECIMAL and no MAP in any oracled
        # output — both are canonicalized engine-specifically by the
        # external pandas-based comparator (decimal sum precision skew;
        # MapType crashes its sort with "unhashable type").
        tcur = con.execute(f"DESCRIBE SELECT * FROM read_parquet('{spark_glob}')")
        badtypes = [(c, t) for c, t, *_ in tcur.fetchall()
                    if "DECIMAL" in t.upper() or "MAP" in t.upper()]
        if badtypes:
            fails.append((k, f"banned output column type(s): {badtypes}"))
            continue
        # Same ban on the ORACLE side, plus HUGEINT: DuckDB widens integer
        # SUMs (and windowed SUMs) to HUGEINT, which pandas renders as
        # float64 — the r2 win_lag_sessionize hash failure. Catch the type
        # mechanically instead of via downstream hash divergence.
        ocur = con.execute(f"DESCRIBE {oracle[k]}")
        obad = [(c, t) for c, t, *_ in ocur.fetchall()
                if any(b in t.upper() for b in ("DECIMAL", "MAP", "HUGEINT"))]
        if obad:
            fails.append((k, f"banned ORACLE column type(s): {obad} — CAST it"))
            continue
        scols, srows = rows_of(con.execute(f"SELECT * FROM read_parquet('{spark_glob}')"))
        dcols, drows = rows_of(con.execute(oracle[k]))
    except Exception as e:
        fails.append((k, f"exec error: {e}"))
        continue
    if scols != dcols:
        fails.append((k, f"schema mismatch: spark={scols} duck={dcols}"))
        continue
    if len(srows) != len(drows):
        fails.append((k, f"row count: spark={len(srows)} duck={len(drows)}"))
        continue
    bad = next((i for i, (a, b) in enumerate(zip(srows, drows)) if a != b), None)
    if bad is not None:
        fails.append((k, f"row {bad}: spark={srows[bad]} duck={drows[bad]}"))
    else:
        passes.append((k, len(srows)))

for k, n in passes:
    print(f"PASS {k} ({n} rows)")
for k, msg in fails:
    print(f"FAIL {k}: {msg}")
print(f"\n{len(passes)} passed, {len(fails)} failed, "
      f"{len(oracle)} oracled queries")
sys.exit(1 if fails else 0)

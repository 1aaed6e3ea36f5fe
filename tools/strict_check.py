#!/usr/bin/env python3
"""Strict local pre-check: EXACT value compare (like the driver's hash gate).

Usage: python3 tools/strict_check.py [sfDir] [outDir] [only_query ...]
Loads Spark result parquet + oracle SQL into DuckDB, casts every column to
VARCHAR, sorts rows, and diffs exactly. Prints first mismatching cells.
"""
import sys, os, json, glob
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
only = set(sys.argv[3:])

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    if only and name not in only:
        continue
    res_dir = f"{out}/{name}"
    if not os.path.isdir(res_dir):
        print(f"FAIL {name}: no result parquet"); fails += 1; continue
    try:
        got = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'")
        want = con.sql(sql)
        # Output-type lint: the VARCHAR cast below masks exactly the
        # divergence the driver's pandas-rendered hash catches (HUGEINT →
        # float64 '250.0' vs Spark int64 '250' — round-9 span_screen).
        # Ban lossy types in the oracle's final schema outright.
        lossy = [(c, t) for c, t, *_ in con.sql(f"DESCRIBE ({sql})").fetchall()
                 if any(b in t.upper() for b in ("HUGEINT", "UHUGEINT", "DECIMAL"))]
        if lossy:
            cols = ", ".join(f"{c}:{t}" for c, t in lossy)
            print(f"FAIL {name}: lossy oracle output type(s) {cols} — CAST to BIGINT/DOUBLE")
            fails += 1
            continue
        gcols, wcols = sorted(got.columns), sorted(want.columns)
        if gcols != wcols:
            print(f"FAIL {name}: columns {gcols} != {wcols}"); fails += 1; continue
        sel = ", ".join(f'CAST("{c}" AS VARCHAR) AS "{c}"' for c in gcols)
        ordr = ", ".join(f'"{c}"' for c in gcols)
        con.execute(f"CREATE OR REPLACE TEMP TABLE _g AS SELECT {sel} FROM got ORDER BY {ordr}")
        con.execute(f"CREATE OR REPLACE TEMP TABLE _w AS SELECT {sel} FROM want ORDER BY {ordr}")
        ng = con.sql("SELECT count(*) FROM _g").fetchone()[0]
        nw = con.sql("SELECT count(*) FROM _w").fetchone()[0]
        if ng != nw:
            print(f"FAIL {name}: rows {ng} != {nw}"); fails += 1; continue
        diff = con.sql(
            "SELECT * FROM ((SELECT * FROM _g EXCEPT ALL SELECT * FROM _w) "
            "UNION ALL (SELECT * FROM _w EXCEPT ALL SELECT * FROM _g))").df()
        if len(diff) == 0:
            print(f"PASS {name} ({ng} rows)")
        else:
            fails += 1
            print(f"FAIL {name}: {len(diff)//2} differing rows (of {ng})")
            import pandas as pd
            with pd.option_context("display.max_columns", None, "display.width", 250):
                print(diff.sort_values(gcols, ignore_index=True).head(10).to_string())
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__} {str(e)[:300]}"); fails += 1

sys.exit(1 if fails else 0)

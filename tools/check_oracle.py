#!/usr/bin/env python3
"""Local pre-check mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py [sfDir] [outDir]
Reads outDir/<name>/ parquet (written by graft.Verify) and oracle_sql.json,
registers each testdata table as a DuckDB view, runs the oracle SQL, and
compares values (rows sorted, columns sorted by name, floats rounded).
"""
import sys, os, json, glob
import duckdb

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    res_dir = f"{out}/{name}"
    if not os.path.isdir(res_dir):
        print(f"FAIL {name}: no result parquet"); fails += 1; continue
    try:
        got = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'")
        want = con.sql(sql)
        gcols, wcols = sorted(got.columns), sorted(want.columns)
        if gcols != wcols:
            print(f"FAIL {name}: columns {gcols} != {wcols}"); fails += 1; continue
        gdf = got.df()[gcols].sort_values(gcols, ignore_index=True)
        wdf = want.df()[wcols].sort_values(wcols, ignore_index=True)
        if len(gdf) != len(wdf):
            print(f"FAIL {name}: rows {len(gdf)} != {len(wdf)}"); fails += 1; continue
        import pandas as pd
        try:
            pd.testing.assert_frame_equal(gdf, wdf, check_dtype=False,
                                          check_exact=False, rtol=1e-9, atol=1e-9)
            print(f"PASS {name} ({len(gdf)} rows)")
        except AssertionError as e:
            print(f"FAIL {name}: {str(e)[:500]}"); fails += 1
    except Exception as e:
        print(f"FAIL {name}: {type(e).__name__} {str(e)[:300]}"); fails += 1

queries_without_oracle = [os.path.basename(d) for d in glob.glob(f"{out}/*")
                          if os.path.isdir(d) and os.path.basename(d) not in oracle]
if queries_without_oracle:
    print("rows-only (no oracle):", sorted(queries_without_oracle))
sys.exit(1 if fails else 0)

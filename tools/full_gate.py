#!/usr/bin/env python3
"""Build a CORRECTNESS_sf01_full.json-style report from a Verify dump:
per query, hash-exact compare (strict_check's VARCHAR-cast discipline)
plus DuckDB wall time. Usage:
  python3 tools/full_gate.py <sfDir> <outDir> <reportPath> <what>
"""
import sys, os, json, glob, time
import duckdb

sf, out, report, what = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{out}/oracle_sql.json"))
rows = {}
total_sec = 0.0
green = 0
for name, sql in sorted(oracle.items()):
    res_dir = f"{out}/{name}"
    entry = {"hash_match": False, "rows": 0, "duckdb_sec": 0.0, "err": None}
    try:
        if not os.path.isdir(res_dir):
            raise RuntimeError("no result parquet")
        t0 = time.time()
        got = con.sql(f"SELECT * FROM '{res_dir}/*.parquet'")
        want = con.sql(sql)
        gcols = sorted(got.columns)
        wcols = sorted(want.columns)
        if gcols != wcols:
            raise RuntimeError(f"schema mismatch: {gcols} vs {wcols}")
        def canon(rel, cols):
            sel = ", ".join(f'CAST("{c}" AS VARCHAR) AS "{c}"' for c in cols)
            return rel.project(sel).df().sort_values(by=cols,
                ignore_index=True)
        g = canon(got, gcols)
        w = canon(want, wcols)
        sec = time.time() - t0
        entry["duckdb_sec"] = round(sec, 1)
        total_sec += sec
        entry["rows"] = len(g)
        if len(g) != len(w):
            raise RuntimeError(f"row count {len(g)} vs {len(w)}")
        if not g.equals(w):
            raise RuntimeError("value mismatch")
        entry["hash_match"] = True
        green += 1
        print(f"PASS {name} ({len(g)} rows, {sec:.1f}s)")
    except Exception as e:
        entry["err"] = str(e)[:300]
        print(f"FAIL {name}: {entry['err']}")
    rows[name] = entry

rows["_meta"] = {
    "what": what,
    "green_rows": green,
    "total_rows": len(oracle),
    "duckdb_total_sec": round(total_sec, 1),
}
json.dump(rows, open(report, "w"), indent=1)
print(f"{green}/{len(oracle)} green, duckdb total {total_sec:.1f}s -> {report}")
sys.exit(0 if green == len(oracle) else 1)

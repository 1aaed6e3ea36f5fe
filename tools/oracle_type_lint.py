#!/usr/bin/env python3
"""Oracle output-type lint: fail when any oracle's FINAL output column types
as a DuckDB type pandas renders lossily.

Why: the driver compares Spark vs DuckDB by hashing pandas-rendered values.
DuckDB types an uncast sum(int) as HUGEINT (int128), which pandas renders as
float64 — so `250` hashes as `250.0` and the row mismatches even when values
are equal (round-9 span_screen). DECIMAL has the same failure mode. The
repo's oracle discipline (SURVEY §8) is: every aggregate in a FINAL select
is CAST to BIGINT/DOUBLE. This lint makes the discipline mechanical —
DESCRIBE each oracle and ban the lossy types outright.

Usage: python3 tools/oracle_type_lint.py [sfDir] [oracle_sql.json]
Exit 1 if any oracle's output schema contains a banned type.
"""
import sys, os, json, glob
import duckdb

BANNED = ("HUGEINT", "UHUGEINT", "DECIMAL")  # int128 / lossy in pandas

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
path = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out/oracle_sql.json"

con = duckdb.connect()
for p in glob.glob(f"{sf}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(path))
fails = 0
for name, sql in sorted(oracle.items()):
    try:
        desc = con.sql(f"DESCRIBE ({sql})").fetchall()
    except Exception as e:
        print(f"FAIL {name}: DESCRIBE error {type(e).__name__} {str(e)[:200]}")
        fails += 1
        continue
    bad = [(c, t) for c, t, *_ in desc if any(b in t.upper() for b in BANNED)]
    if bad:
        fails += 1
        cols = ", ".join(f"{c}:{t}" for c, t in bad)
        print(f"FAIL {name}: lossy output type(s) {cols} — CAST to BIGINT/DOUBLE")
    else:
        print(f"PASS {name}")
sys.exit(1 if fails else 0)

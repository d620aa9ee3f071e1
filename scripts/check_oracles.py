#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run graft.Verify first
(`SPARK_GRAFT_CPUS=8 sbt -batch "runMain graft.Verify /root/testdata/sf0.01 target/verify-out"`),
then this script compares every query's parquet output against its DuckDB
oracle SQL (columns sorted by name, rows sorted, values stringified).
Exit 0 = all match."""
import duckdb, json, os, sys

sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out = sys.argv[2] if len(sys.argv) > 2 else "target/verify-out"

con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sf}/{t}.parquet')")

oracle = json.load(open(f"{out}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        sdf = con.execute(f"SELECT * FROM parquet_scan('{out}/{name}/*.parquet')").df()
        odf = con.execute(sql).df()
    except Exception as e:
        fails.append((name, str(e)[:150]))
        continue
    sdf = sdf.reindex(sorted(sdf.columns), axis=1)
    odf = odf.reindex(sorted(odf.columns), axis=1)
    if list(sdf.columns) != list(odf.columns):
        fails.append((name, f"cols {list(sdf.columns)} vs {list(odf.columns)}"))
        continue
    s = sdf.sort_values(by=list(sdf.columns)).reset_index(drop=True).astype(str)
    o = odf.sort_values(by=list(odf.columns)).reset_index(drop=True).astype(str)
    if len(s) != len(o):
        fails.append((name, f"rows {len(s)} vs {len(o)}"))
    elif not s.equals(o):
        fails.append((name, f"value mismatch in {(s != o).any(axis=1).sum()} rows"))

print(f"oracled: {len(oracle)}")
for f in fails:
    print("FAIL", *f)
print("ALL MATCH" if not fails else f"{len(fails)} FAILURES")
sys.exit(1 if fails else 0)

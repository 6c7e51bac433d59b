#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Registers each parquet in sfDir as a DuckDB view named after the file, runs
every oracle_sql.json statement, and compares against the Spark-written
parquet in verifyOutDir: row count, column names (sorted), and per-cell
values (rows sorted for stability).
"""
import json
import math
import sys

import duckdb

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]:
    con.execute(
        f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
ok = fail = 0
for name, sql in sorted(oracle.items()):
    try:
        odf = con.execute(sql).fetchdf()
    except Exception as e:
        print(f"FAIL {name}: oracle sql error: {e}")
        fail += 1
        continue
    try:
        sdf = duckdb.sql(
            f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf()
    except Exception as e:
        print(f"FAIL {name}: spark result missing: {e}")
        fail += 1
        continue
    errs = []
    if len(odf) != len(sdf):
        errs.append(f"rows oracle={len(odf)} spark={len(sdf)}")
    ocols, scols = sorted(odf.columns), sorted(sdf.columns)
    if ocols != scols:
        errs.append(f"cols oracle={ocols} spark={scols}")
    if not errs:
        o = odf[ocols].sort_values(by=ocols).reset_index(drop=True)
        s = sdf[scols].sort_values(by=scols).reset_index(drop=True)
        for c in ocols:
            for i, (a, b) in enumerate(zip(o[c], s[c])):
                same = (a == b) or (
                    isinstance(a, float) and isinstance(b, float)
                    and (math.isnan(a) and math.isnan(b)
                         or abs(a - b) <= 1e-9 * max(1, abs(a))))
                if not same:
                    errs.append(f"col {c} row {i}: oracle={a!r} spark={b!r}")
                    break
            if errs:
                break
    if errs:
        print(f"FAIL {name}: {'; '.join(errs)}")
        fail += 1
    else:
        print(f"PASS {name} ({len(odf)} rows)")
        ok += 1
print(f"\n{ok} passed, {fail} failed")
sys.exit(1 if fail else 0)

#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate.

Usage: python3 tools/compare.py [sfDir] [outDir]

Reads each Spark result parquet under outDir/<name>/ and replays the
corresponding oracle SQL (outDir/oracle_sql.json) in DuckDB with every
/root/testdata table registered as a view. Compares after sorting columns
by name and rows by all columns. Reports exact-match / mismatch per query
with a diff sample, so oracle drift is caught before the driver runs.
"""
import sys, json, glob, os
import duckdb

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
OUT_DIR = sys.argv[2] if len(sys.argv) > 2 else "target/verify_out"

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

con = duckdb.connect()
for t in TABLES:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")

with open(f"{OUT_DIR}/oracle_sql.json") as f:
    oracles = json.load(f)

failures = 0
for name in sorted(oracles):
    sql = oracles[name]
    spark_glob = f"{OUT_DIR}/{name}/*.parquet"
    if not glob.glob(spark_glob):
        print(f"FAIL  {name}: no spark output at {spark_glob}")
        failures += 1
        continue
    try:
        oracle = con.sql(sql).df()
    except Exception as e:
        print(f"FAIL  {name}: oracle SQL error: {e}")
        failures += 1
        continue
    spark = con.sql(f"SELECT * FROM '{spark_glob}'").df()

    o = oracle.reindex(sorted(oracle.columns), axis=1)
    s = spark.reindex(sorted(spark.columns), axis=1)
    if list(o.columns) != list(s.columns):
        print(f"FAIL  {name}: columns differ oracle={list(o.columns)} spark={list(s.columns)}")
        failures += 1
        continue
    if len(o) != len(s):
        print(f"FAIL  {name}: row counts differ oracle={len(o)} spark={len(s)}")
        failures += 1
        continue
    o = o.sort_values(by=list(o.columns), kind="mergesort").reset_index(drop=True)
    s = s.sort_values(by=list(s.columns), kind="mergesort").reset_index(drop=True)
    # normalize dtypes for compare (e.g. int32 vs int64, date vs datetime)
    o = o.astype(str)
    s = s.astype(str)
    eq = o.eq(s).all(axis=None)
    if eq:
        print(f"ok    {name}: {len(s)} rows, {len(s.columns)} cols")
    else:
        failures += 1
        bad = ~o.eq(s).all(axis=1)
        idx = list(o.index[bad])[:5]
        print(f"FAIL  {name}: {bad.sum()} mismatching rows of {len(o)}")
        for i in idx:
            print(f"      row {i} oracle={o.loc[i].to_dict()}")
            print(f"      row {i} spark ={s.loc[i].to_dict()}")

sys.exit(1 if failures else 0)

#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/parity.py <sfdir> <verify_out_dir>

Registers the testdata parquet as views, runs each oracle_sql.json entry,
and compares to the Spark result parquet: schema (column names + dtypes),
row count, and exact value equality after sorting columns by name and rows
by all columns.
"""
import sys, json, glob, os
import duckdb

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(f)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{f}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for q in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, q)
    if not os.path.isdir(d):
        continue
    spark = con.execute(f"SELECT * FROM '{d}/*.parquet'").fetchdf()
    if q not in oracle:
        print(f"ROWS-ONLY {q}: rows={len(spark)}")
        continue
    duck = con.execute(oracle[q]).fetchdf()
    ok = True
    if sorted(spark.columns) != sorted(duck.columns):
        print(f"FAIL {q}: columns spark={sorted(spark.columns)} duck={sorted(duck.columns)}")
        ok = False
    elif len(spark) != len(duck):
        print(f"FAIL {q}: rowcount spark={len(spark)} duck={len(duck)}")
        ok = False
    else:
        s = spark[sorted(spark.columns)].sort_values(by=sorted(spark.columns)).reset_index(drop=True)
        k = duck[sorted(duck.columns)].sort_values(by=sorted(duck.columns)).reset_index(drop=True)
        for c in s.columns:
            if str(s[c].dtype) != str(k[c].dtype):
                print(f"FAIL {q}: dtype[{c}] spark={s[c].dtype} duck={k[c].dtype}")
                ok = False
            elif not (s[c].fillna("__N__") == k[c].fillna("__N__")).all():
                bad = (s[c].fillna("__N__") != k[c].fillna("__N__"))
                i = bad.idxmax()
                print(f"FAIL {q}: values[{c}] differ at row {i}: spark={s[c][i]!r} duck={k[c][i]!r} ({bad.sum()} rows)")
                ok = False
    if ok:
        print(f"OK   {q}: rows={len(spark)}")
    else:
        fails += 1
print(f"\n{'ALL PASS' if fails == 0 else f'{fails} FAILURES'}")
sys.exit(1 if fails else 0)

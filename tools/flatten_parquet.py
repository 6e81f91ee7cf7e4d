#!/usr/bin/env python3
"""Flatten Spark parquet table DIRECTORIES into single files so
tools/check.py's DuckDB views (`'{dir}/{t}.parquet'`, one quoted path,
no glob) can read a ScaleData output dir.

Usage: python3 tools/flatten_parquet.py <sparkDir> <flatDir>
"""
import sys, os, glob, duckdb

src, dst = sys.argv[1], sys.argv[2]
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()
for p in sorted(glob.glob(f"{src}/*.parquet")):
    t = os.path.basename(p)
    out = f"{dst}/{t}"
    if os.path.isfile(p):  # already flat
        if not os.path.exists(out):
            os.link(p, out)
        continue
    if os.path.exists(out):
        continue
    con.sql(f"COPY (SELECT * FROM read_parquet('{p}/*.parquet')) TO '{out}' (FORMAT parquet)")
    print(f"[flatten] {t}")
print(f"[flatten] done: {dst}")

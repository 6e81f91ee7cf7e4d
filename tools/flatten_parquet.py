#!/usr/bin/env python3
"""Flatten Spark parquet table DIRECTORIES into single files so
tools/check.py's DuckDB views (`'{dir}/{t}.parquet'`, one quoted path,
no glob) can read a ScaleData output dir.

Usage: python3 tools/flatten_parquet.py <sparkDir> <flatDir>
"""
import sys, os, glob, duckdb


def newest_mtime(path):
    """Latest mtime under a Spark table dir (or of a flat file)."""
    if os.path.isfile(path):
        return os.path.getmtime(path)
    parts = glob.glob(f"{path}/*.parquet") or [path]
    return max(os.path.getmtime(p) for p in parts)


src, dst = sys.argv[1], sys.argv[2]
os.makedirs(dst, exist_ok=True)
con = duckdb.connect()
for p in sorted(glob.glob(f"{src}/*.parquet")):
    t = os.path.basename(p)
    out = f"{dst}/{t}"
    # STALENESS, not just existence (r14 ADVICE): a regenerated source
    # corpus must invalidate the flat copy, or check.py's oracle silently
    # reads old data against Spark's new corpus
    if os.path.exists(out) and os.path.getmtime(out) >= newest_mtime(p):
        continue
    if os.path.exists(out):
        os.remove(out)
        print(f"[flatten] {t}: stale, re-flattening")
    if os.path.isfile(p):  # already flat
        os.link(p, out)
        continue
    con.sql(f"COPY (SELECT * FROM read_parquet('{p}/*.parquet')) TO '{out}' (FORMAT parquet)")
    print(f"[flatten] {t}")
print(f"[flatten] done: {dst}")

#!/usr/bin/env python3
"""Local replica of the driver's correctness gate (dev tool only — the
shipped engine is Scala; this mirrors what the driver does with DuckDB).

Usage: python3 tools/check.py <sfDir> <verifyOutDir>

Reads each <outDir>/<name>/ parquet (Spark output), runs the matching
oracle_sql.json entry in DuckDB over the sfDir tables, sorts columns by
name, and compares TYPES (arrow schema — the driver hashes typed values,
so DuckDB HUGEINT vs Spark BIGINT is a FAIL even when the stringified
values match) + shape + values (exact for non-floats; tiny-eps for
floats). Reports per-query PASS/FAIL, both row-order-sensitive and
row-sorted, so ordering bugs are visible separately from value bugs.
"""
import sys, json, glob
import duckdb
import pandas as pd
import numpy as np

# arrow types the driver's typed hash treats as equivalent (none: strict).
# Spark writes TIMESTAMP as timestamp[us, tz=UTC] in parquet while DuckDB
# emits timestamp[us]; the driver normalizes tz — mirror only that.
def _tname(t):
    s = str(t)
    return s.replace(", tz=UTC", "")

def type_err(spark_tbl, ora_tbl):
    sa = {f.name: _tname(f.type) for f in spark_tbl.schema}
    oa = {f.name: _tname(f.type) for f in ora_tbl.schema}
    for c in sorted(set(sa) | set(oa)):
        if sa.get(c) != oa.get(c):
            return f"TYPE col {c}: spark={sa.get(c)} oracle={oa.get(c)}"
    return None

TABLES = ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]

def norm(df):
    df = df[sorted(df.columns)].reset_index(drop=True)
    return df

def cmp(a, b, name, sort_rows=False):
    if sort_rows and len(a.columns):
        cols = list(a.columns)
        a = a.sort_values(cols, kind="mergesort").reset_index(drop=True)
        b = b.sort_values(cols, kind="mergesort").reset_index(drop=True)
    if list(a.columns) != list(b.columns):
        return f"cols {list(a.columns)} != {list(b.columns)}"
    if len(a) != len(b):
        return f"rows {len(a)} != {len(b)}"
    for c in a.columns:
        av, bv = a[c], b[c]
        if np.issubdtype(av.dtype, np.floating) or np.issubdtype(bv.dtype, np.floating):
            av = av.astype(float); bv = bv.astype(float)
            bad = ~(np.isclose(av, bv, rtol=0, atol=1e-9, equal_nan=True))
            if bad.any():
                i = int(np.argmax(bad))
                return f"float col {c} row {i}: {av.iloc[i]!r} != {bv.iloc[i]!r}"
        else:
            if not av.astype(str).equals(bv.astype(str)):
                neq = av.astype(str) != bv.astype(str)
                i = int(np.argmax(neq.values))
                return f"col {c} row {i}: {av.iloc[i]!r} != {bv.iloc[i]!r}"
    return None

def main():
    sfdir, outdir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sfdir}/{t}.parquet'")
    oracle = json.load(open(f"{outdir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{outdir}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output"); n_fail += 1; continue
        try:
            spark_rel = con.sql(f"SELECT * FROM read_parquet({files!r})")
            ora_rel = con.sql(sql)
            terr = type_err(spark_rel.arrow(), ora_rel.arrow())
            spark_df = norm(spark_rel.df())
            ora_df = norm(ora_rel.df())
        except Exception as e:
            print(f"FAIL {name}: {e}"); n_fail += 1; continue
        if terr is not None:
            print(f"FAIL {name}: {terr}"); n_fail += 1; continue
        err = cmp(spark_df, ora_df, name)
        if err is None:
            print(f"PASS {name} ({len(spark_df)} rows)"); n_pass += 1
        else:
            err2 = cmp(spark_df, ora_df, name, sort_rows=True)
            tag = "ordered-FAIL/sorted-PASS" if err2 is None else "FAIL"
            print(f"{tag} {name}: {err}")
            n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()

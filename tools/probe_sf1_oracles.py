#!/usr/bin/env python3
"""Probe which catalog oracles are FEASIBLE in DuckDB at sf1 (dev tool).

The r11 sf1 sweep hash-matched the 131 entries whose oracle was known
cheap and excluded the rest wholesale. Most exclusions were
conservative: this probe actually RUNS each excluded entry's oracle SQL
over the sf1 tables under a wall-clock timeout and memory cap, so the
r12 sweep can extend the strongest signal (DuckDB hash-match) to every
entry whose oracle completes, leaving only the genuinely infeasible
(pairwise-naive / unrolled-iterative) set to the planted-invariant
harness (graft.ScaleInvariants).

Usage: python3 tools/probe_sf1_oracles.py <sfDir> <oracle_sql.json> \
          <names-file> <out.json> [timeout_s=240]

Each probe runs in a subprocess (duckdb can't be interrupted in-process)
with memory_limit=24GB, threads=16. Result per entry: ok (wall secs) /
timeout / error.
"""
import sys, json, subprocess, time

PROBE = r'''
import sys, json, duckdb, time
sfdir, sql = sys.argv[1], sys.stdin.read()
con = duckdb.connect()
con.execute("SET memory_limit='24GB'")
con.execute("SET threads=16")
con.execute(f"SET temp_directory='{sfdir}/../duckdb_probe_tmp'")
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sfdir}/{t}.parquet/*.parquet')"
                if __import__('os').path.isdir(f'{sfdir}/{t}.parquet')
                else f"CREATE VIEW {t} AS SELECT * FROM parquet_scan('{sfdir}/{t}.parquet')")
t0 = time.time()
n = len(con.execute(sql).fetchall())
print(json.dumps({"rows": n, "secs": round(time.time() - t0, 1)}))
'''

def main():
    sfdir, oracles_path, names_path, out_path = sys.argv[1:5]
    timeout = int(sys.argv[5]) if len(sys.argv) > 5 else 240
    oracles = json.load(open(oracles_path))
    names = [n.strip() for n in open(names_path) if n.strip()]
    results = {}
    for name in names:
        sql = oracles.get(name)
        if not sql:
            results[name] = {"status": "no_oracle"}
            continue
        t0 = time.time()
        try:
            p = subprocess.run([sys.executable, "-c", PROBE, sfdir],
                               input=sql, capture_output=True, text=True,
                               timeout=timeout)
            if p.returncode == 0:
                r = json.loads(p.stdout.strip().splitlines()[-1])
                results[name] = {"status": "ok", **r}
            else:
                results[name] = {"status": "error",
                                 "err": p.stderr.strip()[-300:]}
        except subprocess.TimeoutExpired:
            results[name] = {"status": "timeout", "secs": timeout}
        print(f"[probe] {name}: {results[name]['status']} "
              f"({time.time()-t0:.0f}s)", flush=True)
    json.dump(results, open(out_path, "w"), indent=1)
    ok = [n for n, r in results.items() if r["status"] == "ok"]
    print(f"[probe] {len(ok)}/{len(names)} feasible -> {out_path}")

if __name__ == "__main__":
    main()

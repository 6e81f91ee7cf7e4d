#!/usr/bin/env python3
"""Merge the round-15 factor-1000 facts-only invariant passes into the
round artifact (the run was split: pushdown-dominated checks first,
then the shuffle-heavy graphs + planted-skew — so a disk blow-up in the
heavy pass could not take down the recorded light results).

Usage: merge_f1000_r15.py <light.json> <heavy.json> <out.json> \
          <gen_wall_sec> <gen_max_gc_pause_ms> [runlog...]
"""
import json, re, sys

light, heavy, out, wall, gc = sys.argv[1:6]
a = json.load(open(light))
b = json.load(open(heavy))
checks = {k: v for src in (a, b) for k, v in src.items()
          if not k.startswith("_") and isinstance(v, dict)}

# the graph family at x1000 is a measured refusal on this box (SCALE.md
# round-15 section: three attempts, three environmental failure
# signatures), recorded as exclusions with the evidence, never as passes
GRAPH_REFUSAL = (
    "box-infeasible at factor 1000, measured: the ~590M-edge graph's "
    "1.2B directed rows need 40-60 GB of localCheckpoint/shuffle scratch "
    "per entry - kcore/sssp/bfs/mass-flow died on 'No space left on "
    "device' with 38-50 GB free (solo and concurrent), bfs OOMed an "
    "80 GiB heap with spark.rdd.compress=true, and single-pass triangles "
    "filled 60 GB in 18 min (logs /tmp/f1000_graph_*.log). Factor-100 "
    "evidence is green (147/147, sf10); x1000 needs a real cluster's "
    "aggregate disk, which is the deployment answer, not a plan change")
graph_excl = {g: GRAPH_REFUSAL for g in (
    "graph_kcore", "graph_triangles", "graph_mass_flow",
    "graph_bfs_hops", "graph_sssp") if g not in checks}
# per-check wall seconds from the run logs ("[invariants] name: PASS (..., 12.3s)")
for log in sys.argv[6:]:
    for line in open(log, errors="replace"):
        m = re.match(r"\[invariants\] (\S+): (?:PASS|FAIL) \(.*, ([0-9.]+)s\)", line.strip())
        if m and m.group(1) in checks:
            checks[m.group(1)]["secs"] = float(m.group(2))
excluded = {**a.get("_excluded", {}), **b.get("_excluded", {}), **graph_excl}
n_pass = sum(1 for v in checks.values() if v["pass"])
doc = {
    "purpose": "factor-1000 invariant run on the FACTS-ONLY corpus "
               "(ScaleData --facts-only sf0.1 -> /tmp/graft_f1000 1000: "
               "100M events / 600M lineitem / 150M orders; documents and "
               "embeddings not written by design). Checks are the "
               "fact-family subset of ScaleInvariants (restricted_eq with "
               "replica-0 key restrictions, exact x1000 rollup laws, "
               "graph isomorphic-component recovery, the planted-hot-key "
               "skew law); content families and the f^2 cost walls carry "
               "reasoned exclusions.",
    "factor": 1000,
    "generation": {
        "wall_sec": int(wall),
        "max_driver_gc_pause_ms": float(gc),
        "note": "one fan-out-after-shuffle scan per table "
                "(ScaleData.replicateN); events (user_id, ts) uniqueness "
                "asserted on the written output",
    },
    "n_checks": len(checks),
    "n_pass": n_pass,
    "checks": dict(sorted(checks.items())),
    "_excluded": dict(sorted(excluded.items())),
}
json.dump(doc, open(out, "w"), indent=1)
print(f"[merge-f1000] {len(checks)} checks, {n_pass} pass -> {out}")
sys.exit(0 if n_pass == len(checks) else 1)

#!/bin/bash
# Per-round proof-artifact suite, mechanized (the round ritual that was
# previously hand-driven in tmux — r14's "mechanize the remaining
# hand-run judgments"). Runs the standing checks in dependency order,
# writes the round-numbered artifacts the judge reads, and finishes with
# ONE round manifest (step → artifact → pass/fail → wall → tree hash) so
# the judge and driver read a single file to know which proofs ran on
# which tree.
#
# Usage:
#   tools/round_proofs.sh <round> [--changed a,b,c] [--approx x,y] \
#       [--steps data,sweep,inv1,inv10,f1000,margin,ledger,cluster,aqe]
#
#   <round>    round number, used in artifact names (tools/*_r{N}.json)
#   --changed  catalog entries changed since the previous round: they are
#              re-swept at sf1 (stale prior-round signals must not carry)
#   --approx   approximate-by-contract entries among them (a sweep hash
#              miss downgrades to the planted invariant in the ledger)
#   --steps    subset to run (default: all, in the order above; an extra
#              non-default `drift` step runs the standalone bench drift
#              control against the previous round's tree)
#
# Prereqs: compiled classes (sbt compile), driver testdata at
# /root/testdata/sf0.1. Scaled corpora are generated if missing.
# Each step is independently restartable; artifacts are only written on
# step success. Drive long runs from tmux, not a tool with a timeout.
set -uo pipefail
cd "$(dirname "$0")/.."

ROUND="${1:?usage: round_proofs.sh <round> [--changed ...] [--approx ...] [--steps ...]}"
shift
CHANGED=""
APPROX=""
STEPS="data,sweep,inv1,inv10,f1000,margin,ledger,cluster,aqe"
while [[ $# -gt 0 ]]; do
  case "$1" in
    --changed) CHANGED="$2"; shift 2 ;;
    --approx)  APPROX="$2"; shift 2 ;;
    --steps)   STEPS="$2"; shift 2 ;;
    *) echo "unknown arg: $1" >&2; exit 2 ;;
  esac
done

BASE=/root/testdata/sf0.1
SF1=/tmp/graft_sf1
SF10=/tmp/graft_sf10
F1000=/tmp/graft_f1000
FAIL=0
# append across invocations: the suite is restartable per step, so a
# round often runs as several --steps subsets — the manifest must cover
# the union (the final python dedups by step name, last record wins)
MANIFEST=/tmp/round_manifest_r$ROUND.jsonl
touch "$MANIFEST"
has_step() { [[ ",$STEPS," == *",$1,"* ]]; }
note() { echo "[round-proofs] $*"; }
step_rc() { # step_rc <name> <rc> [artifact]: record, keep going
  local wall=$(( $(date +%s) - STEP_T0 ))
  echo "{\"step\": \"$1\", \"rc\": $2, \"wall_sec\": $wall, \"artifact\": \"${3:-}\"}" >> "$MANIFEST"
  if [[ "$2" -ne 0 ]]; then note "STEP $1 FAILED (rc=$2)"; FAIL=1; else note "step $1 ok (${wall}s)"; fi
}
step_t0() { STEP_T0=$(date +%s); }

# corpus-complete markers: gate on the LAST table each generator mode
# writes (r14 ADVICE: events.parquet is mid-sequence in full mode, so a
# generation killed during the documents write looked complete forever)
full_corpus_ok()  { [[ -d $1/embeddings.parquet ]]; }
facts_corpus_ok() { [[ -d $1/events.parquet && ! -d $1/documents.parquet ]]; }

if has_step data; then
  step_t0
  full_corpus_ok $SF1  || tools/run_main.sh graft.ScaleData "$BASE" $SF1 10
  full_corpus_ok $SF10 || \
    SPARK_DRIVER_MEM=32g tools/run_main.sh graft.ScaleData "$BASE" $SF10 100
  python3 tools/flatten_parquet.py $SF1 ${SF1}_flat
  step_rc data $?
fi

if has_step sweep; then
  step_t0
  if [[ -n "$CHANGED" ]]; then
    SPARK_GRAFT_SHUFFLE_PARTITIONS=64 \
      tools/run_main.sh graft.Verify $SF1 /tmp/vsf1_r$ROUND "$CHANGED"
    rc=$?
    if [[ $rc -eq 0 ]]; then
      python3 tools/check.py ${SF1}_flat /tmp/vsf1_r$ROUND \
        | tee /tmp/sf1_check_r$ROUND.log
      # the check run itself must have completed (r14 ADVICE: a crash
      # before per-entry output left no FAIL lines and read as ok)
      rc=${PIPESTATUS[0]}
    fi
    if [[ $rc -eq 0 ]]; then
      # approx-by-contract entries are EXPECTED to hash-miss here; the
      # ledger downgrades them — any other FAIL is real and fails the step
      while read -r line; do
        # real tags: "FAIL name: ..." and "ordered-FAIL/sorted-PASS name: ..."
        name=$(sed -E 's|^(ordered-FAIL/sorted-PASS\|FAIL) ([^ :]+).*|\2|' <<<"$line")
        [[ ",$APPROX," == *",$name,"* ]] || { note "sweep FAIL: $line"; rc=1; }
      done < <(grep -E '^(ordered-FAIL/sorted-PASS|FAIL) ' /tmp/sf1_check_r$ROUND.log)
    fi
    step_rc sweep $rc /tmp/sf1_check_r$ROUND.log
  else
    note "sweep skipped: no --changed entries"
    : > /tmp/sf1_check_r$ROUND.log
    step_rc sweep 0 /tmp/sf1_check_r$ROUND.log
  fi
fi

if has_step inv1; then
  step_t0
  SPARK_GRAFT_SHUFFLE_PARTITIONS=64 tools/run_main.sh graft.ScaleInvariants \
    "$BASE" $SF1 tools/scale_invariants_sf1_r$ROUND.json
  step_rc inv1 $? tools/scale_invariants_sf1_r$ROUND.json
fi

if has_step inv10; then
  step_t0
  SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE_PARTITIONS=128 \
    tools/run_main.sh graft.ScaleInvariants \
    "$BASE" $SF10 tools/scale_invariants_sf10_r$ROUND.json
  step_rc inv10 $? tools/scale_invariants_sf10_r$ROUND.json
fi

if has_step f1000; then
  step_t0
  rc=0
  facts_corpus_ok $F1000 || \
    SPARK_DRIVER_MEM=48g SPARK_GRAFT_SHUFFLE_PARTITIONS=64 \
    SPARK_GRAFT_JAVA_OPTS="-Xlog:gc:file=/tmp/f1000_gc.log:time,uptime" \
    tools/run_main.sh graft.ScaleData --facts-only "$BASE" $F1000 1000 || rc=1
  if [[ $rc -eq 0 ]]; then
    SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE_PARTITIONS=256 \
      tools/run_main.sh graft.ScaleInvariants --facts-rep \
      "$BASE" $F1000 tools/scale_invariants_f1000_r$ROUND.json
    rc=$?
  fi
  step_rc f1000 $rc tools/scale_invariants_f1000_r$ROUND.json
fi

if has_step margin; then
  step_t0
  rc=0
  : > /tmp/minhash_margin_r$ROUND.jsonl
  for sf in /root/testdata/sf0.01 "$BASE" $SF1 $SF10; do
    SPARK_DRIVER_MEM=24g tools/run_main.sh graft.MinhashSizingSmoke "$sf" 200 \
      | grep -E '^\{' >> /tmp/minhash_margin_r$ROUND.jsonl || rc=1
  done
  python3 - "$ROUND" <<'EOF' || rc=1
import json, math, sys
r = sys.argv[1]
rows = [json.loads(l) for l in open(f"/tmp/minhash_margin_r{r}.jsonl")]
ok = all(x["theta995_margin_ok"] for x in rows) and len(rows) >= 4

def fit(ys):  # least-squares slope of ln(y) vs ln(n_docs)
    xs = [math.log(x["n_docs"]) for x in rows]
    ys = [math.log(max(y, 1e-9)) for y in ys]
    mx, my = sum(xs)/len(xs), sum(ys)/len(ys)
    return round(sum((a-mx)*(b-my) for a, b in zip(xs, ys)) /
                 sum((a-mx)**2 for a in xs), 3)

exponents = {}
for cfg in ("sized", "pinned"):
    exponents[cfg] = {
        "secs": fit([x[cfg]["secs"] for x in rows]),
        "cand_instances": fit([x[cfg]["occupancy"]["cand_instances"] for x in rows]),
        "verified_pairs": fit([x[cfg]["pairs"] for x in rows]),
        "max_occupancy_all_sfs": max(x[cfg]["occupancy"]["max_c"] for x in rows),
    }
out = {"purpose": "theta=0.995 margin behind dedup_minhash_sized, measured per SF "
       "(max non-identical jaccard via the exact uncapped prefix join at 0.9); "
       "sized-vs-pinned banding recall at each corpus size; and per-band bucket "
       "occupancy with fitted log-log exponents vs corpus size (r14 verdict #3)",
       "margin_ok_all_sfs": ok, "exponents": exponents, "runs": rows}
json.dump(out, open(f"tools/minhash_margin_r{r}.json", "w"), indent=1)
print(f"[round-proofs] margin: {len(rows)} SFs, all_ok={ok}, exponents={exponents}")
sys.exit(0 if ok else 1)
EOF
  step_rc margin $rc tools/minhash_margin_r$ROUND.json
fi

if has_step ledger; then
  step_t0
  PREV=$((ROUND - 1))
  ls /tmp/vsf1_r$ROUND > /tmp/catalog_names_r$ROUND.txt 2>/dev/null
  # the sweep out-dir only holds CHANGED entries; the catalog list needs
  # all of them — take names from the freshest full verify dir instead
  if [[ -d /tmp/vout ]]; then ls /tmp/vout > /tmp/catalog_names_r$ROUND.txt; fi
  python3 tools/sf1_signal.py --round $ROUND \
    --catalog /tmp/catalog_names_r$ROUND.txt \
    --prev-ledger tools/sf1_signal_r$PREV.json \
    --check /tmp/sf1_check_r$ROUND.log \
    --invariants tools/scale_invariants_sf1_r$ROUND.json \
    --changed "$CHANGED" --approx "$APPROX" \
    --out tools/sf1_signal_r$ROUND.json
  step_rc ledger $? tools/sf1_signal_r$ROUND.json
fi

if has_step cluster; then
  step_t0
  SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
    SPARK_GRAFT_MASTER='local-cluster[2,8,4096]' \
    tools/run_main.sh graft.Verify /root/testdata/sf0.01 /tmp/vcluster_r$ROUND
  rc=$?
  if [[ $rc -eq 0 ]]; then
    python3 tools/check.py /root/testdata/sf0.01 /tmp/vcluster_r$ROUND \
      | tee /tmp/cluster_check_r$ROUND.log | tail -3
    rc=${PIPESTATUS[0]}
  fi
  if [[ $rc -eq 0 ]]; then
    SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
      tools/run_main.sh graft.ClusterChecks | tee /tmp/cluster_checks_r$ROUND.log
    rc=${PIPESTATUS[0]}
  fi
  step_rc cluster $rc /tmp/cluster_check_r$ROUND.log
fi

if has_step aqe; then
  step_t0
  tools/run_main.sh graft.PlanFingerprints --aqe-check "$BASE"
  step_rc aqe $? tools/plan_fingerprints_aqe.json
fi

if has_step drift; then
  step_t0
  tools/run_main.sh graft.BenchDrift "$BASE" | tail -1 > /tmp/bench_drift_r$ROUND.json
  rc=$?
  grep -q '"code_factor"' /tmp/bench_drift_r$ROUND.json || rc=1
  step_rc drift $rc /tmp/bench_drift_r$ROUND.json
fi

# round manifest: one file naming the tree every proof ran on
python3 - "$ROUND" "$MANIFEST" "$FAIL" <<'EOF'
import json, subprocess, sys
rnd, manifest, fail = sys.argv[1], sys.argv[2], int(sys.argv[3])
by_step = {}
for l in open(manifest):
    rec = json.loads(l)
    by_step[rec["step"]] = rec  # last record per step wins
steps = list(by_step.values())
fail = max(fail, max((r["rc"] != 0 for r in steps), default=0))
out = {
    "round": int(rnd),
    "head": subprocess.check_output(["git", "rev-parse", "HEAD"]).decode().strip(),
    "tree": subprocess.check_output(["git", "rev-parse", "HEAD^{tree}"]).decode().strip(),
    "dirty": bool(subprocess.check_output(["git", "status", "--porcelain"]).decode().strip()),
    "fail": fail,
    "steps": steps,
}
path = f"tools/round_manifest_r{rnd}.json"
json.dump(out, open(path, "w"), indent=1)
print(f"[round-proofs] manifest: {path}")
EOF

note "suite complete: FAIL=$FAIL (artifacts: tools/*_r$ROUND.json)"
exit $FAIL

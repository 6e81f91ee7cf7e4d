#!/bin/bash
# Per-round proof-artifact suite, mechanized (the round ritual that was
# previously hand-driven in tmux — r14's "mechanize the remaining
# hand-run judgments"). Runs the standing checks in dependency order and
# writes the round-numbered artifacts the judge reads.
#
# Usage:
#   tools/round_proofs.sh <round> [--changed a,b,c] [--approx x,y] \
#       [--steps data,sweep,inv1,inv10,margin,ledger,cluster,aqe]
#
#   <round>    round number, used in artifact names (tools/*_r{N}.json)
#   --changed  catalog entries changed since the previous round: they are
#              re-swept at sf1 (stale prior-round signals must not carry)
#   --approx   approximate-by-contract entries among them (a sweep hash
#              miss downgrades to the planted invariant in the ledger)
#   --steps    subset to run (default: all, in the order above)
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
STEPS="data,sweep,inv1,inv10,margin,ledger,cluster,aqe"
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
FAIL=0
has_step() { [[ ",$STEPS," == *",$1,"* ]]; }
note() { echo "[round-proofs] $*"; }
step_rc() { # step_rc <name> <rc>: record, keep going (artifacts are per-step)
  if [[ "$2" -ne 0 ]]; then note "STEP $1 FAILED (rc=$2)"; FAIL=1; else note "step $1 ok"; fi
}

if has_step data; then
  [[ -d $SF1/events.parquet ]]  || tools/run_main.sh graft.ScaleData "$BASE" $SF1 10
  [[ -d $SF10/events.parquet ]] || \
    SPARK_DRIVER_MEM=32g tools/run_main.sh graft.ScaleData "$BASE" $SF10 100
  python3 tools/flatten_parquet.py $SF1 ${SF1}_flat
  step_rc data $?
fi

if has_step sweep; then
  if [[ -n "$CHANGED" ]]; then
    SPARK_GRAFT_SHUFFLE_PARTITIONS=64 \
      tools/run_main.sh graft.Verify $SF1 /tmp/vsf1_r$ROUND "$CHANGED"
    rc=$?
    if [[ $rc -eq 0 ]]; then
      python3 tools/check.py ${SF1}_flat /tmp/vsf1_r$ROUND \
        | tee /tmp/sf1_check_r$ROUND.log
      # approx-by-contract entries are EXPECTED to hash-miss here; the
      # ledger downgrades them — any other FAIL is real and fails the step
      rc=0
      while read -r line; do
        name=$(sed -E 's/^(ordered-FAIL|FAIL) ([^ :]+).*/\2/' <<<"$line")
        [[ ",$APPROX," == *",$name,"* ]] || { note "sweep FAIL: $line"; rc=1; }
      done < <(grep -E '^(ordered-)?FAIL' /tmp/sf1_check_r$ROUND.log)
    fi
    step_rc sweep $rc
  else
    note "sweep skipped: no --changed entries"
    : > /tmp/sf1_check_r$ROUND.log
  fi
fi

if has_step inv1; then
  SPARK_GRAFT_SHUFFLE_PARTITIONS=64 tools/run_main.sh graft.ScaleInvariants \
    "$BASE" $SF1 tools/scale_invariants_sf1_r$ROUND.json
  step_rc inv1 $?
fi

if has_step inv10; then
  SPARK_DRIVER_MEM=64g SPARK_GRAFT_SHUFFLE_PARTITIONS=128 \
    tools/run_main.sh graft.ScaleInvariants \
    "$BASE" $SF10 tools/scale_invariants_sf10_r$ROUND.json
  step_rc inv10 $?
fi

if has_step margin; then
  rc=0
  : > /tmp/minhash_margin_r$ROUND.jsonl
  for sf in /root/testdata/sf0.01 "$BASE" $SF1 $SF10; do
    SPARK_DRIVER_MEM=24g tools/run_main.sh graft.MinhashSizingSmoke "$sf" 200 \
      | grep -E '^\{' >> /tmp/minhash_margin_r$ROUND.jsonl || rc=1
  done
  python3 - "$ROUND" <<'EOF' || rc=1
import json, sys
r = sys.argv[1]
rows = [json.loads(l) for l in open(f"/tmp/minhash_margin_r{r}.jsonl")]
ok = all(x["theta995_margin_ok"] for x in rows) and len(rows) >= 4
out = {"purpose": "theta=0.995 margin behind dedup_minhash_sized, measured per SF "
       "(max non-identical jaccard via the exact uncapped prefix join at 0.9); "
       "plus sized-vs-pinned banding recall at each corpus size",
       "margin_ok_all_sfs": ok, "runs": rows}
json.dump(out, open(f"tools/minhash_margin_r{r}.json", "w"), indent=1)
print(f"[round-proofs] margin: {len(rows)} SFs, all_ok={ok}")
sys.exit(0 if ok else 1)
EOF
  step_rc margin $rc
fi

if has_step ledger; then
  PREV=$((ROUND - 1))
  ls /tmp/vsf1_r$ROUND > /tmp/catalog_names_r$ROUND.txt 2>/dev/null
  # the sweep out-dir only holds CHANGED entries; the catalog list needs
  # all of them — take names from the freshest full verify dir instead
  if [[ -d /tmp/vout ]]; then ls /tmp/vout > /tmp/catalog_names_r$ROUND.txt; fi
  python3 tools/sf1_signal_r$ROUND.py \
    --catalog /tmp/catalog_names_r$ROUND.txt \
    --r$PREV-ledger tools/sf1_signal_r$PREV.json \
    --r$ROUND-check /tmp/sf1_check_r$ROUND.log \
    --invariants tools/scale_invariants_sf1_r$ROUND.json \
    --changed "$CHANGED" --approx "$APPROX" \
    --out tools/sf1_signal_r$ROUND.json
  step_rc ledger $?
fi

if has_step cluster; then
  SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
    SPARK_GRAFT_MASTER='local-cluster[2,8,4096]' \
    tools/run_main.sh graft.Verify /root/testdata/sf0.01 /tmp/vcluster_r$ROUND
  rc=$?
  if [[ $rc -eq 0 ]]; then
    python3 tools/check.py /root/testdata/sf0.01 /tmp/vcluster_r$ROUND \
      | tee /tmp/cluster_check_r$ROUND.log | tail -3
    rc=$?
  fi
  if [[ $rc -eq 0 ]]; then
    SPARK_HOME=/opt/spark SPARK_SCALA_VERSION=2.13 \
      tools/run_main.sh graft.ClusterChecks | tee /tmp/cluster_checks_r$ROUND.log
    rc=$?
  fi
  step_rc cluster $rc
fi

if has_step aqe; then
  tools/run_main.sh graft.PlanFingerprints --aqe-check "$BASE"
  step_rc aqe $?
fi

note "suite complete: FAIL=$FAIL (artifacts: tools/*_r$ROUND.json)"
exit $FAIL

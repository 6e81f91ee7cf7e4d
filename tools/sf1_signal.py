#!/usr/bin/env python3
"""Generic ≥sf1 correctness-signal ledger: one signal per catalog entry.

Replaces the per-round copies (tools/sf1_signal_r{12,13,14}.py, which
differed only in round numbers). Precedence per entry:

  this round's sf1 hash-match (sweep of CHANGED entries)
  > previous round's ledger signal (valid for entries unchanged since)
  > planted invariant (this round's ScaleInvariants sf1 output)

Inputs:
  --round        round number N (labels the signals "sf1_hash_match_rN")
  --catalog      file listing ALL catalog entry names (ls of a Verify out dir)
  --prev-ledger  the previous round's validated ledger JSON
  --check        check.py log of this round's sf1 sweep (changed entries)
  --invariants   ScaleInvariants sf1 output JSON
  --changed      comma list of entries changed since last round (their
                 carried signal is stale and must not be used)
  --approx       approximate-by-contract entries (a hash miss downgrades
                 to the planted invariant, hash result kept visible)
  --out          output JSON

Exits 1 on any uncovered or failed entry.
"""
import argparse, json, re, sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--round", required=True, type=int)
    ap.add_argument("--catalog", required=True)
    ap.add_argument("--prev-ledger", required=True)
    ap.add_argument("--check", required=True)
    ap.add_argument("--invariants", required=True)
    ap.add_argument("--changed", default="")
    ap.add_argument("--approx", default="")
    ap.add_argument("--out", required=True)
    a = ap.parse_args()
    rn, rp = a.round, a.round - 1

    # the catalog list comes from `ls` of a Verify out dir, which also
    # holds oracle_sql.json — entry names never contain a dot
    catalog = sorted(set(n for n in re.split(r"[\s,]+", open(a.catalog).read())
                         if n and not n.startswith("_") and "." not in n))
    prev = json.load(open(a.prev_ledger))["entries"]
    changed = set(n for n in a.changed.split(",") if n)
    approx = set(n for n in a.approx.split(",") if n)

    fresh = {}
    for line in open(a.check):
        # check.py's real tags: "PASS name (N rows)", "FAIL name: ...",
        # "ordered-FAIL/sorted-PASS name: ..." (r15 ADVICE: the old
        # alternation never matched the order-failure tag, so an
        # order-regressed entry silently dropped out of `fresh`).
        # sorted-PASS counts as a FAILURE here, same as the sweep step:
        # ordered output is part of the contract unless approx downgrades
        m = re.match(r"(ordered-FAIL/sorted-PASS|PASS|FAIL)\s+([^\s:]+)", line.strip())
        if m:
            fresh[m.group(2)] = m.group(1) == "PASS"

    inv_raw = json.load(open(a.invariants))
    inv = {k: v for k, v in inv_raw.items()
           if not k.startswith("_") and isinstance(v, dict)}

    out, uncovered, failed = {}, [], []
    for name in catalog:
        if name in fresh and not fresh[name] and name in approx and name in inv:
            e = inv[name]
            sig = {"signal": f"planted_invariant:{e['check']}",
                   "pass": bool(e["pass"]), "detail": e["detail"],
                   "sf1_hash_match": False,
                   "note": "approx-by-contract operator vs exact oracle"}
        elif name in fresh:
            sig = {"signal": f"sf1_hash_match_r{rn}", "pass": fresh[name]}
        elif name in prev and name not in changed and prev[name]["pass"]:
            # collapse nested carried_r{N}: prefixes to the ORIGINAL signal
            orig = re.sub(r"^(carried_r\d+:)+", "", prev[name]["signal"])
            sig = {"signal": f"carried_r{rp}:{orig}", "pass": True}
        elif name in inv:
            e = inv[name]
            sig = {"signal": f"planted_invariant:{e['check']}",
                   "pass": bool(e["pass"]), "detail": e["detail"]}
        else:
            sig = {"signal": "NONE", "pass": False}
            uncovered.append(name)
        if not sig["pass"] and name not in uncovered:
            failed.append(name)
        if name in inv and not sig["signal"].startswith("planted"):
            sig["also_invariant"] = {"check": inv[name]["check"],
                                     "pass": bool(inv[name]["pass"])}
        out[name] = sig

    # age ledger (r15 verdict #5): the round a hash signal was actually
    # minted, so the rotation policy's effect is auditable — the oldest
    # signal should never fall more than ~5 rounds behind
    minted = {}
    for s in out.values():
        m = re.search(r"sf1_hash_match_r(\d+)$", s["signal"])
        if m:
            minted[int(m.group(1))] = minted.get(int(m.group(1)), 0) + 1
    summary = {
        "n_entries": len(catalog),
        f"hash_match_r{rn}": sum(1 for s in out.values()
                                 if s["signal"] == f"sf1_hash_match_r{rn}" and s["pass"]),
        f"carried_r{rp}": sum(1 for s in out.values()
                              if s["signal"].startswith(f"carried_r{rp}")),
        "planted_invariant": sum(1 for s in out.values()
                                 if s["signal"].startswith("planted") and s["pass"]),
        "with_secondary_invariant": sum(1 for s in out.values()
                                        if s.get("also_invariant", {}).get("pass")),
        "oldest_hash_signal_round": min(minted) if minted else None,
        "hash_signal_rounds": {str(k): v for k, v in sorted(minted.items())},
        "uncovered": uncovered,
        "failed": failed,
    }
    json.dump({"summary": summary, "entries": out}, open(a.out, "w"), indent=1)
    print(json.dumps(summary, indent=1))
    sys.exit(1 if uncovered or failed else 0)


if __name__ == "__main__":
    main()

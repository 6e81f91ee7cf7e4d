#!/usr/bin/env python3
"""Round-14 ≥sf1 correctness-signal ledger: one signal per catalog entry.

Extends tools/sf1_signal_r13.py's precedence by one round:
  r14 sf1 hash-match (this round's sweep of CHANGED entries)
  > r13 ledger signal (valid for entries unchanged since r13)
  > planted invariant (tools/scale_invariants_sf1_r14.json)

Inputs:
  --catalog     file listing ALL catalog entry names (ls of a Verify out dir)
  --r13-ledger  tools/sf1_signal_r13.json (the validated r13 signals)
  --r14-check   check.py log of this round's sf1 sweep (changed entries)
  --invariants  ScaleInvariants sf1 output JSON
  --changed     comma list of entries changed since r13 (stale r13 signal)
  --approx      approximate-by-contract entries (hash miss downgrades to
                the planted invariant, hash result kept visible)
  --out         output JSON

Exits 1 on any uncovered or failed entry.
"""
import argparse, json, re, sys


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--catalog", required=True)
    ap.add_argument("--r13-ledger", required=True)
    ap.add_argument("--r14-check", required=True)
    ap.add_argument("--invariants", required=True)
    ap.add_argument("--changed", default="")
    ap.add_argument("--approx", default="")
    ap.add_argument("--out", required=True)
    a = ap.parse_args()

    catalog = sorted(set(n for n in re.split(r"[\s,]+", open(a.catalog).read())
                         if n and n.endswith != "" and not n.startswith("_")))
    r13 = json.load(open(a.r13_ledger))["entries"]
    changed = set(n for n in a.changed.split(",") if n)
    approx = set(n for n in a.approx.split(",") if n)

    r14 = {}
    for line in open(a.r14_check):
        m = re.match(r"(ordered-FAIL|PASS|FAIL)\s+([^\s:]+)", line.strip())
        if m:
            r14[m.group(2)] = m.group(1) == "PASS"

    inv_raw = json.load(open(a.invariants))
    inv = {k: v for k, v in inv_raw.items() if k != "_excluded"}

    out, uncovered, failed = {}, [], []
    for name in catalog:
        if name in r14 and not r14[name] and name in approx and name in inv:
            e = inv[name]
            sig = {"signal": f"planted_invariant:{e['check']}",
                   "pass": bool(e["pass"]), "detail": e["detail"],
                   "sf1_hash_match": False,
                   "note": "approx-by-contract operator vs exact oracle"}
        elif name in r14:
            sig = {"signal": "sf1_hash_match_r14", "pass": r14[name]}
        elif name in r13 and name not in changed and r13[name]["pass"]:
            sig = {"signal": f"carried_r13:{r13[name]['signal']}", "pass": True}
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

    summary = {
        "n_entries": len(catalog),
        "hash_match_r14": sum(1 for s in out.values() if s["signal"] == "sf1_hash_match_r14" and s["pass"]),
        "carried_r13": sum(1 for s in out.values() if s["signal"].startswith("carried_r13")),
        "planted_invariant": sum(1 for s in out.values() if s["signal"].startswith("planted") and s["pass"]),
        "with_secondary_invariant": sum(1 for s in out.values()
                                        if s.get("also_invariant", {}).get("pass")),
        "uncovered": uncovered,
        "failed": failed,
    }
    json.dump({"summary": summary, "entries": out}, open(a.out, "w"), indent=1)
    print(json.dumps(summary, indent=1))
    sys.exit(1 if uncovered or failed else 0)


if __name__ == "__main__":
    main()

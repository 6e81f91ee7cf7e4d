#!/usr/bin/env python3
"""Combine the round-12 ≥sf1 correctness signals into one per-entry
artifact (VERDICT r11 #3: every catalog entry must have SOME correctness
signal at sf1+, hash-match where the oracle is feasible, a planted
invariant where it is not).

Inputs:
  --catalog       newline/comma list of ALL catalog entry names
                  (e.g. ls of a full Verify out dir)
  --r11-swept     names hash-matched by the r11 sf1 sweep (still valid
                  for entries whose engine code AND oracle are unchanged
                  since ffbd5fa; changed ones must appear in --r12-check)
  --r12-check     check.py log of the r12 sf1 sweep (PASS/FAIL lines)
  --invariants    ScaleInvariants output JSON {name: {check, pass, detail}}
  --changed       entries changed since r11 whose r11 sweep result is
                  therefore stale (must be re-proven by --r12-check)
  --approx        entries whose operator is approximate BY CONTRACT
                  (documented recall < 1): a FAILed sf1 hash-match
                  downgrades to the planted invariant as the pass
                  signal, with the hash result kept visible on the
                  entry. Anything not listed here must hash-match.
  --out           output JSON

Signal precedence per entry: r12 hash-match > r11 hash-match (if
unchanged) > planted invariant. Exits 1 if any entry is uncovered or
any claimed signal FAILed.
"""
import argparse, json, re, sys


def read_names(path):
    return [n for n in re.split(r"[\s,]+", open(path).read()) if n]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--catalog", required=True)
    ap.add_argument("--r11-swept", required=True)
    ap.add_argument("--r12-check", required=True)
    ap.add_argument("--invariants", required=True)
    ap.add_argument("--changed", default="")
    ap.add_argument("--approx", default="")
    ap.add_argument("--out", required=True)
    a = ap.parse_args()

    catalog = sorted(set(read_names(a.catalog)))
    r11 = set(read_names(a.r11_swept))
    changed = set(n for n in a.changed.split(",") if n)
    approx = set(n for n in a.approx.split(",") if n)

    r12 = {}
    for line in open(a.r12_check):
        # FAIL lines carry a trailing colon on the name ("FAIL x: rows..."),
        # and ordered-FAIL is a distinct (still failing) verdict
        m = re.match(r"(ordered-FAIL|PASS|FAIL)\s+([^\s:]+)", line.strip())
        if m:
            r12[m.group(2)] = m.group(1) == "PASS"

    inv = json.load(open(a.invariants))

    out, uncovered, failed = {}, [], []
    for name in catalog:
        if name in r12 and not r12[name] and name in approx and name in inv:
            # approximate-by-contract operator vs an exact oracle: the
            # planted invariant is the pass signal; keep the hash miss
            # visible rather than pretending the sweep didn't run
            e = inv[name]
            sig = {"signal": f"planted_invariant:{e['check']}",
                   "pass": bool(e["pass"]), "detail": e["detail"],
                   "sf1_hash_match": False,
                   "note": "approx-by-contract operator vs exact oracle"}
        elif name in r12:
            sig = {"signal": "sf1_hash_match_r12", "pass": r12[name]}
        elif name in r11 and name not in changed:
            sig = {"signal": "sf1_hash_match_r11", "pass": True}
        elif name in inv:
            e = inv[name]
            sig = {"signal": f"planted_invariant:{e['check']}",
                   "pass": bool(e["pass"]), "detail": e["detail"]}
        else:
            sig = {"signal": "NONE", "pass": False}
            uncovered.append(name)
        if not sig["pass"] and name not in uncovered:
            failed.append(name)
        # secondary signal: an invariant that ALSO passed for a
        # hash-matched entry strengthens it; record it
        if name in inv and not sig["signal"].startswith("planted"):
            sig["also_invariant"] = {"check": inv[name]["check"],
                                     "pass": bool(inv[name]["pass"])}
        out[name] = sig

    summary = {
        "n_entries": len(catalog),
        "hash_match_r12": sum(1 for s in out.values() if s["signal"] == "sf1_hash_match_r12" and s["pass"]),
        "hash_match_r11": sum(1 for s in out.values() if s["signal"] == "sf1_hash_match_r11"),
        "planted_invariant": sum(1 for s in out.values() if s["signal"].startswith("planted") and s["pass"]),
        "uncovered": uncovered,
        "failed": failed,
    }
    json.dump({"summary": summary, "entries": out}, open(a.out, "w"), indent=1)
    print(json.dumps(summary, indent=1))
    sys.exit(1 if uncovered or failed else 0)


if __name__ == "__main__":
    main()

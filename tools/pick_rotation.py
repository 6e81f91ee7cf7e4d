#!/usr/bin/env python3
"""Pick the N catalog entries whose carried sf1 hash signal is OLDEST,
for re-minting in this round's sweep (r15 verdict #5: most carried
signals dated to r11 — four rounds of carry without re-minting would let
a partition-count-sensitive or spill-path regression hide until someone
happened to re-run).

Usage: pick_rotation.py <prev_ledger.json> <N> [--skip a,b,c]

Prints a comma-joined entry list. Entries whose signal is a planted
invariant (the approx-by-contract operators — they can never hash-match
the exact oracle) and entries in --skip (already in this round's changed
set: they are being re-swept anyway) are excluded.
"""
import json, re, sys


def main():
    ledger, n = sys.argv[1], int(sys.argv[2])
    skip = set()
    if "--skip" in sys.argv:
        skip = set(x for x in sys.argv[sys.argv.index("--skip") + 1].split(",") if x)
    entries = json.load(open(ledger))["entries"]

    def minted_round(sig):
        m = re.search(r"sf1_hash_match_r(\d+)$", sig)
        return int(m.group(1)) if m else None

    cands = sorted(
        (minted_round(s["signal"]), name)
        for name, s in entries.items()
        if name not in skip and minted_round(s["signal"]) is not None)
    print(",".join(name for _, name in cands[:n]))


if __name__ == "__main__":
    main()

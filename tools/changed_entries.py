#!/usr/bin/env python3
"""Mechanically derive the catalog entries affected by a round's src/main
diff (r15 verdict #4: the sweep's --changed list was hand-fed and empty
while src/main DID change — "builder asserts nothing changed" is the
honor-system gap the round manifest exists to close).

Method — file-level static reachability, deliberately OVER-approximate
(sweeping an unchanged entry at sf1 costs minutes; missing a changed one
carries a stale correctness signal):

  1. touched = `git diff --name-only <prev>..HEAD -- src/main build.sbt`
     plus any uncommitted src/main files (dirty trees must not read as
     "nothing changed").
  2. every .scala file declares symbols (object/class/trait names); a
     file DEPENDS on another when its text mentions a symbol the other
     uniquely declares (symbols declared in 2+ files or shorter than 4
     chars are skipped — they cannot be attributed).
  3. affected = touched plus all transitive REVERSE dependents.
  4. entries = every `QueryDef("name"...)` declared in an affected file.
     A touched build.sbt or a touched file with no inbound edge that
     ITSELF declares no entries yields an empty list honestly — the map
     artifact records why.

Usage:
  changed_entries.py [--prev auto|<ref>] [--out map.json]

Prints the comma-joined entry list on stdout (empty line if none).
The --out JSON records prev/head, the touched files, and the
file→entries attribution so the round manifest can show WHICH files
mapped to WHICH entries instead of trusting a hand-fed list.
"""
import argparse, json, os, re, subprocess, sys

SRC = "src/main/scala"


def git(*args):
    return subprocess.run(["git", *args], capture_output=True, text=True).stdout.strip()


def resolve_prev():
    """Latest `round N:` commit whose TREE differs from HEAD's (the same
    rule BenchDrift uses — the driver commits the round snapshot before
    benching, so the latest round commit can be HEAD itself)."""
    head_tree = git("rev-parse", "HEAD^{tree}")
    for h in git("log", "-E", "--grep", "^round [0-9]+:", "-10", "--format=%H").splitlines():
        if git("rev-parse", f"{h}^{{tree}}") != head_tree:
            return h
    return ""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--prev", default="auto")
    ap.add_argument("--out", default="")
    a = ap.parse_args()
    prev = resolve_prev() if a.prev == "auto" else a.prev
    if not prev:
        print("", end="")
        sys.exit(0)

    touched = set()
    diff = git("diff", "--name-only", f"{prev}..HEAD", "--", "src/main", "build.sbt")
    touched |= {l for l in diff.splitlines() if l}
    # uncommitted edits count: the sweep must cover the tree it verifies.
    # whitespace-split is safe here (no repo path contains spaces) and
    # robust against the XY-column offset; renames keep the NEW path.
    for l in git("status", "--porcelain", "src/main").splitlines():
        if l.strip():
            touched.add(l.strip().split(None, 1)[-1].split(" -> ")[-1])

    scala_files = []
    for root, _, files in os.walk(SRC):
        scala_files += [os.path.join(root, f) for f in files if f.endswith(".scala")]
    text = {f: open(f, encoding="utf-8").read() for f in scala_files}

    def strip_comments(t):
        """Drop /*...*/ blocks and // line tails so a scaladoc [[Name]]
        link doesn't become a dependency edge (found immediately: every
        harness main is [[linked]] from Queries.scala's doc, which would
        have made ANY harness edit invalidate the whole catalog). The //
        tail is only dropped when preceded by an even number of quotes —
        a URL inside an oracle-SQL string must not truncate the line."""
        t = re.sub(r"/\*.*?\*/", " ", t, flags=re.S)
        out = []
        for line in t.splitlines():
            i = line.find("//")
            while i != -1 and line[:i].count('"') % 2 == 1:
                i = line.find("//", i + 1)
            out.append(line if i == -1 else line[:i])
        return "\n".join(out)

    code = {f: strip_comments(t) for f, t in text.items()}

    decl_re = re.compile(r"^\s*(?:private\s+|final\s+|sealed\s+|abstract\s+|case\s+|implicit\s+|\[[\w\]]+\]\s*)*"
                         r"(?:object|class|trait)\s+(\w+)", re.M)
    declared = {}  # symbol -> set of files
    for f, t in code.items():
        for sym in set(decl_re.findall(t)):
            declared.setdefault(sym, set()).add(f)
    # attributable symbols only: unique declaration site, non-trivial name
    unique = {s: next(iter(fs)) for s, fs in declared.items()
              if len(fs) == 1 and len(s) >= 4}

    # reverse edges: declaring file -> files that mention the symbol
    word_cache = {f: set(re.findall(r"\w+", t)) for f, t in code.items()}
    dependents = {f: set() for f in scala_files}
    for sym, decl_file in unique.items():
        for f in scala_files:
            if f != decl_file and sym in word_cache[f]:
                dependents[decl_file].add(f)

    affected = set(t for t in touched if t in text)
    frontier = list(affected)
    while frontier:
        f = frontier.pop()
        for d in dependents.get(f, ()):
            if d not in affected:
                affected.add(d)
                frontier.append(d)

    qdef_re = re.compile(r"QueryDef\(\s*\"([a-z0-9_]+)\"")
    file_entries = {f: sorted(set(qdef_re.findall(text[f])))
                    for f in sorted(affected) if qdef_re.search(text[f])}
    # build.sbt (or any non-scala touch) can't be traced through symbols:
    # it invalidates the whole catalog
    non_scala = sorted(t for t in touched if t not in text)
    if any(t == "build.sbt" for t in non_scala):
        file_entries = {f: sorted(set(qdef_re.findall(t)))
                        for f, t in text.items() if qdef_re.search(t)}

    entries = sorted(set(e for es in file_entries.values() for e in es))
    if a.out:
        json.dump({
            "prev": prev, "head": git("rev-parse", "HEAD"),
            "touched_files": sorted(touched),
            "non_scala_touched": non_scala,
            "n_affected_files": len(affected),
            "affected_files": sorted(affected),
            "entries_by_file": file_entries,
            "entries": entries,
        }, open(a.out, "w"), indent=1)
    print(",".join(entries))


if __name__ == "__main__":
    main()

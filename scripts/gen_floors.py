#!/usr/bin/env python3
"""Regenerate scripts/bench_floors.tsv from a round's committed bench
captures: per (sf, query), the minimum over every capture's min-of-2.

Usage: gen_floors.py [bench_captures/rN]  (default: newest rN dir)

Run this whenever the capture set changes — Bench's third repass
trigger compares each live min-of-2 against these floors (>2x is
re-timed and recorded), so stale floors make the trigger fire on real
improvements' inverse: a much FASTER tree never trips it (floors are
minima, excursions are upward), but floors from a retired slower tree
would mask regressions. Keep them in the same commit as the captures.
"""
import json, glob, os, re, sys, collections

if len(sys.argv) > 1:
    dirs = sys.argv[1:]  # several dirs -> minima across ALL of them
else:
    rounds = sorted(glob.glob("bench_captures/r*"),
                    key=lambda p: int(re.search(r"r(\d+)$", p).group(1)))
    if not rounds:
        sys.exit("no bench_captures/r* directory")
    dirs = [rounds[-1]]

floors = collections.defaultdict(dict)
n = 0
for d in dirs:
    for p in sorted(glob.glob(f"{d}/bench_*_*.json")):
        sf = "sf" + os.path.basename(p)[len("bench_"):].rsplit("_", 1)[0]
        cap = json.load(open(p))
        n += 1
        for q, t in cap["queries"].items():
            if q not in floors[sf] or t < floors[sf][q]:
                floors[sf][q] = t

# floor-reset visibility (r15 ADVICE): a regeneration that RAISES floors
# (slower box, or a genuinely slower tree) must be visible — diff against
# the previous tsv and stamp the raise summary into the header, which
# Bench quotes verbatim into every floor_gate record
prev = {}
if os.path.exists("scripts/bench_floors.tsv"):
    for line in open("scripts/bench_floors.tsv"):
        if line.startswith("#") or not line.strip():
            continue
        parts = line.rstrip("\n").split("\t")
        if len(parts) == 3:
            try:
                prev[(parts[0], parts[1])] = float(parts[2])
            except ValueError:
                pass
raised = worst = 0
for sf in floors:
    for q, t in floors[sf].items():
        p0 = prev.get((sf, q))
        if p0 and p0 > 0 and t > p0:
            raised += 1
            worst = max(worst, t / p0)
reset_note = (f"{raised} floors raised vs previous set (worst x{worst:.2f})"
              if raised else "no floors raised vs previous set")

lines = [
    "# per-query committed bench floors: sf<TAB>query<TAB>"
    f"min-over-committed-captures ({'+'.join(dirs)}); {reset_note}",
    "# regenerated alongside the captures (scripts/gen_floors.py; pass "
    "several capture dirs for cross-round minima); Bench repasses any "
    "query whose min-of-2 exceeds 2x its floor",
]
for sf in sorted(floors):
    for q in sorted(floors[sf]):
        lines.append(f"{sf}\t{q}\t{floors[sf][q]:.3f}")
open("scripts/bench_floors.tsv", "w").write("\n".join(lines) + "\n")
print(f"{sum(len(v) for v in floors.values())} floors from {n} captures "
      f"in {'+'.join(dirs)}; {reset_note}")

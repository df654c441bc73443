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
    d = sys.argv[1]
else:
    rounds = sorted(glob.glob("bench_captures/r*"),
                    key=lambda p: int(re.search(r"r(\d+)$", p).group(1)))
    if not rounds:
        sys.exit("no bench_captures/r* directory")
    d = rounds[-1]

floors = collections.defaultdict(dict)
n = 0
for p in sorted(glob.glob(f"{d}/bench_*_*.json")):
    sf = "sf" + os.path.basename(p)[len("bench_"):].rsplit("_", 1)[0]
    cap = json.load(open(p))
    n += 1
    for q, t in cap["queries"].items():
        if q not in floors[sf] or t < floors[sf][q]:
            floors[sf][q] = t

lines = [
    "# per-query committed bench floors: sf<TAB>query<TAB>"
    f"min-over-committed-captures ({d})",
    "# regenerated alongside the captures (scripts/gen_floors.py); "
    "Bench repasses any query whose min-of-2 exceeds 2x its floor",
]
for sf in sorted(floors):
    for q in sorted(floors[sf]):
        lines.append(f"{sf}\t{q}\t{floors[sf][q]:.3f}")
open("scripts/bench_floors.tsv", "w").write("\n".join(lines) + "\n")
print(f"{sum(len(v) for v in floors.values())} floors from {n} captures in {d}")

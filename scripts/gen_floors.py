#!/usr/bin/env python3
"""Regenerate scripts/bench_floors.tsv from a round's committed bench
captures: per (sf, query), the minimum over every capture's min-of-2.

Usage: gen_floors.py [bench_captures/rN]  (default: newest rN dir)
       gen_floors.py --selftest           (unit-check the note arithmetic)

Run this whenever the capture set changes — Bench's third repass
trigger compares each live min-of-2 against these floors (>2x is
re-timed and recorded), so stale floors make the trigger fire on real
improvements' inverse: a much FASTER tree never trips it (floors are
minima, excursions are upward), but floors from a retired slower tree
would mask regressions. Keep them in the same commit as the captures.

The raise note in the header diffs against the LAST ROUND's committed
tsv (the newest `round N:` driver commit), NOT the on-disk file: an
intra-round double regeneration used to compare the second run against
the first and wash out the reset signal (r16 verdict note 1).
"""
import json, glob, os, re, subprocess, sys, collections


def parse_tsv(text):
    """tsv text -> {(sf, query): floor} (header/blank lines skipped)."""
    prev = {}
    for line in text.splitlines():
        if line.startswith("#") or not line.strip():
            continue
        parts = line.rstrip("\n").split("\t")
        if len(parts) == 3:
            try:
                prev[(parts[0], parts[1])] = float(parts[2])
            except ValueError:
                pass
    return prev


def raise_note(prev, floors, baseline_label):
    """The header note: how many floors ROSE vs the baseline set, and
    the worst ratio. Pure so --selftest can pin the arithmetic."""
    raised, worst = 0, 0.0
    for sf in floors:
        for q, t in floors[sf].items():
            p0 = prev.get((sf, q))
            if p0 and p0 > 0 and t > p0:
                raised += 1
                worst = max(worst, t / p0)
    if raised:
        return (f"{raised} floors raised vs {baseline_label} "
                f"(worst x{worst:.2f})")
    return f"no floors raised vs {baseline_label}"


def committed_baseline():
    """The last round's committed floors: scripts/bench_floors.tsv as of
    the newest driver round-boundary commit (message `round N: ...`).
    Falls back to the on-disk file (first round / no such commit), then
    to empty."""
    try:
        log = subprocess.run(
            ["git", "log", "--format=%H %s"],
            capture_output=True, text=True, check=True).stdout
        sha = next(l.split()[0] for l in log.splitlines()
                   if re.match(r"^[0-9a-f]+ round \d+:", l))
        txt = subprocess.run(
            ["git", "show", f"{sha}:scripts/bench_floors.tsv"],
            capture_output=True, text=True, check=True).stdout
        return parse_tsv(txt), f"committed set @{sha[:7]}"
    except Exception:
        if os.path.exists("scripts/bench_floors.tsv"):
            return (parse_tsv(open("scripts/bench_floors.tsv").read()),
                    "on-disk set (no round commit found)")
        return {}, "empty baseline"


def selftest():
    # raise counting: only strictly-higher floors count; worst is a ratio
    prev = {("sf0.1", "q1"): 1.0, ("sf0.1", "q2"): 2.0,
            ("sf0.01", "q1"): 0.5}
    floors = {"sf0.1": {"q1": 1.5, "q2": 2.0, "q3": 9.9},
              "sf0.01": {"q1": 0.25}}
    note = raise_note(prev, floors, "BASE")
    assert note == "1 floors raised vs BASE (worst x1.50)", note
    # no raises -> the quiet form
    note2 = raise_note(prev, {"sf0.1": {"q1": 0.9}}, "BASE")
    assert note2 == "no floors raised vs BASE", note2
    # zero/missing baselines never divide or count
    note3 = raise_note({("sf0.1", "q1"): 0.0}, {"sf0.1": {"q1": 5.0}}, "B")
    assert note3 == "no floors raised vs B", note3
    # parse round-trips the emitted row format
    assert parse_tsv("# h\nsf0.1\tq1\t1.250\n") == {("sf0.1", "q1"): 1.25}
    # the baseline resolver anchors on a `round N:` commit when one
    # exists (this repo always has one after round 1)
    _, label = committed_baseline()
    assert label.startswith("committed set @") or "baseline" in label \
        or "on-disk" in label, label
    print("gen_floors selftest OK")


if __name__ == "__main__" and len(sys.argv) > 1 and sys.argv[1] == "--selftest":
    selftest()
    sys.exit(0)

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

# floor-reset visibility (r15 ADVICE + r16 verdict): a regeneration that
# RAISES floors (slower box, or a genuinely slower tree) must be visible
# cumulatively — diff against the last ROUND's committed tsv and stamp
# the raise summary into the header, which Bench quotes verbatim into
# every floor_gate record
prev, baseline_label = committed_baseline()
reset_note = raise_note(prev, floors, baseline_label)

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

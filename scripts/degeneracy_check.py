#!/usr/bin/env python3
"""Degenerate-fixture sweep (r11 verdict item 3).

The oracle hash gate proves Spark == DuckDB; a column that holds ONE
distinct value across every row proves that vacuously — the arithmetic
behind it was never exercised by the fixture (the q259 lesson: at sf0.01
every sampled user purchased, so emp_rate = base_rate = 1.0 everywhere
and res_num = 0, and the one hash-red row of round 11 hid in exactly
those never-varying renderings).

Usage:  python3 scripts/degeneracy_check.py <verify_out_dir> [--csv out]

For every <query>.parquet under the Verify output dir, counts distinct
values per column and reports columns that are constant over >1 rows.
Constant columns are NOT automatically bugs — a broadcast global scalar
(base_rate, brier, a certification flag that SHOULD be all-true) is
constant by design — so each flagged (query, column) must be either
fixed (de-degenerate the fixture/target) or allowlisted below with a
reason. The exit code is 1 only when a flag is neither allowlisted nor
explained, so the sweep can gate CI.
"""
import json
import os
import sys

import duckdb

# (query, column) -> why a constant value is the DESIGNED output here.
# "global scalar" = a grand-total broadcast onto every row (one value by
# construction); "certification" = a proof column whose pass-state is
# constant-true precisely when the query's invariant holds; "fixture
# grid" = the synthetic data only exercises one cell of a documented
# enum. Keep entries SPECIFIC: a blanket per-query waiver would let a
# future regression hide behind an old reason.
ALLOWLIST_PATH = os.path.join(os.path.dirname(__file__),
                              "degeneracy_allowlist.json")


def load_allowlist():
    if os.path.exists(ALLOWLIST_PATH):
        with open(ALLOWLIST_PATH) as f:
            return {(e["query"], e["column"]): e["reason"]
                    for e in json.load(f)}
    return {}


def main():
    out_dir = sys.argv[1]
    allow = load_allowlist()
    con = duckdb.connect()
    flagged, waived = [], []
    names = sorted(d for d in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, d)))
    for name in names:
        glob = os.path.join(out_dir, name, "*.parquet")
        # r12 ADVICE: never interpolate the path or identifiers raw into
        # SQL — bind the glob as a parameter to read_parquet, and escape
        # embedded double quotes in column identifiers, so a quote
        # character in either can't silently break or misread the sweep
        try:
            cols = [r[0] for r in con.execute(
                "DESCRIBE SELECT * FROM read_parquet(?)",
                [glob]).fetchall()]
            n = con.execute(
                "SELECT count(*) FROM read_parquet(?)",
                [glob]).fetchone()[0]
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"SKIP {name}: {e}")
            continue
        if n <= 1:
            continue  # single-row scalar summaries are fine by shape

        def qident(c):
            return '"' + c.replace('"', '""') + '"'

        exprs = ", ".join(
            f"count(distinct {qident(c)}) , count({qident(c)})"
            for c in cols)
        row = con.execute(
            f"SELECT {exprs} FROM read_parquet(?)", [glob]).fetchone()
        for i, c in enumerate(cols):
            ndv, nnn = row[2 * i], row[2 * i + 1]
            # all-NULL (ndv=0 with 0 non-null) is its own degeneracy
            if ndv <= 1 and not (ndv == 1 and nnn < n):
                key = (name, c)
                if key in allow:
                    waived.append((name, c, n, ndv, allow[key]))
                else:
                    flagged.append((name, c, n, ndv))
    for name, c, n, ndv, why in waived:
        print(f"WAIVED {name}.{c} rows={n} ndv={ndv} — {why}")
    for name, c, n, ndv in flagged:
        print(f"FLAG   {name}.{c} rows={n} ndv={ndv}")
    print(f"\n{len(names)} queries swept, {len(flagged)} flagged, "
          f"{len(waived)} waived")
    sys.exit(1 if flagged else 0)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Row-sorted byte-equality compare of two Verify output dirs — the
determinism-at-scale check (same results regardless of parallelism).

Usage: compare_runs.py <outdirA> <outdirB>
"""
import sys, os, duckdb

a, b = sys.argv[1], sys.argv[2]
qa = {d for d in os.listdir(a) if os.path.isdir(os.path.join(a, d))}
qb = {d for d in os.listdir(b) if os.path.isdir(os.path.join(b, d))}
if qa != qb:
    print(f"QUERY-SET MISMATCH: only-in-A={sorted(qa - qb)} "
          f"only-in-B={sorted(qb - qa)}")
    sys.exit(1)
bad = 0
for q in sorted(qa):
    ra = duckdb.sql(
        f"SELECT * FROM '{a}/{q}/*.parquet'").fetchall()
    rb = duckdb.sql(
        f"SELECT * FROM '{b}/{q}/*.parquet'").fetchall()
    ka = sorted(map(repr, ra))
    kb = sorted(map(repr, rb))
    if ka != kb:
        bad += 1
        print(f"MISMATCH {q}: {len(ra)} vs {len(rb)} rows")
print(f"{len(qa) - bad} identical, {bad} mismatched, {len(qa)} compared")
sys.exit(1 if bad else 0)

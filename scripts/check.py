#!/usr/bin/env python3
"""Local mimic of the driver's correctness gate: run DuckDB oracle SQL
against the same parquet tables and diff against graft.Verify's output.

Usage: check.py [sfdir] [outdir]
"""
import duckdb, sys, json, glob, os
import pandas as pd
import numpy as np

sfdir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
outdir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(p)[:-8]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sfdir}/{name}.parquet'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
try:
    expected = set(json.load(open(f"{outdir}/query_names.json")))
except FileNotFoundError:
    expected = set(oracle)
n_pass = n_fail = 0
checked = set()
for name in sorted(os.listdir(outdir)):
    path = os.path.join(outdir, name)
    if not os.path.isdir(path):
        continue
    checked.add(name)
    got = duckdb.sql(f"SELECT * FROM '{path}/*.parquet'").df()
    if name not in oracle:
        status = "ROWS-ONLY" if len(got) > 0 else "ROWS-ONLY-EMPTY"
        print(f"{status:18s} {name}: rows={len(got)}")
        if len(got) == 0:  # driver's rows-only gate would fail this
            n_fail += 1
        continue
    try:
        exp = con.execute(oracle[name]).df()
    except Exception as e:
        print(f"ORACLE-ERR         {name}: {e}")
        n_fail += 1
        continue
    got = got.reindex(sorted(got.columns), axis=1)
    exp = exp.reindex(sorted(exp.columns), axis=1)
    ok = True
    msgs = []
    if list(got.columns) != list(exp.columns):
        ok = False
        msgs.append(f"cols {list(got.columns)} != {list(exp.columns)}")
    elif len(got) != len(exp):
        ok = False
        msgs.append(f"rows {len(got)} != {len(exp)}")
    else:
        gs = got.sort_values(by=list(got.columns), na_position="last").reset_index(drop=True)
        es = exp.sort_values(by=list(exp.columns), na_position="last").reset_index(drop=True)
        for c in got.columns:
            a, b = gs[c], es[c]
            if a.dtype.kind == "f" or b.dtype.kind == "f":
                eq = (a.isna() & b.isna()) | (a == b)
            else:
                eq = (a.isna() & b.isna()) | (a.astype(object) == b.astype(object))
            if not eq.all():
                ok = False
                bad = (~eq).idxmax()
                msgs.append(f"col {c}: first diff row {bad}: got={gs[c][bad]!r} exp={es[c][bad]!r} ({int((~eq).sum())} diffs)")
        # dtype drift is informative, not fatal, in this local mimic
        for c in got.columns:
            if got[c].dtype != exp[c].dtype:
                msgs.append(f"[dtype] {c}: got {got[c].dtype} exp {exp[c].dtype}")
    if ok:
        n_pass += 1
        note = "; ".join(m for m in msgs if m.startswith("[dtype]"))
        print(f"PASS               {name}: rows={len(got)} {note}")
    else:
        n_fail += 1
        print(f"FAIL               {name}: " + "; ".join(msgs))

# A query that crashed in graft.Verify writes no output dir at all — that
# must be a failure, not a silent skip.
missing = (expected | set(oracle)) - checked
for name in sorted(missing):
    print(f"MISSING-OUTPUT     {name}: query produced no output dir")
    n_fail += 1

print(f"\n{n_pass} pass, {n_fail} fail, {len(oracle)} oracles, "
      f"{len(checked)} checked of {len(expected | set(oracle))} expected")
sys.exit(1 if n_fail else 0)

#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate: run Verify output
against DuckDB oracles and diff values. Usage:
  python3 tools/compare.py <sfDir> <verifyOutDir> [query ...]
"""
import json, sys, glob
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
only = set(sys.argv[3:])

con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for q, sql in sorted(oracle.items()):
    if only and q not in only:
        continue
    try:
        rel = con.sql(sql)
        # HUGEINT columns pandas-materialize as float/object, which
        # the driver's value hash trips on (14019 vs 14019.0) even
        # when values match — flag them loudly so the local loop
        # catches what the driver hash catches (r15 q160/q161 bug).
        huge = [c for c, t in zip(rel.columns, rel.types)
                if "HUGEINT" in str(t).upper()]
        want = rel.df()
    except Exception as e:
        print(f"FAIL {q}: oracle error: {e}")
        fails += 1
        continue
    if huge:
        print(f"FAIL {q}: oracle HUGEINT cols {huge} — cast ::BIGINT "
              "(driver hash would mismatch)")
        fails += 1
        continue
    try:
        got = pd.read_parquet(f"{outdir}/{q}")
    except Exception as e:
        print(f"FAIL {q}: spark output missing: {e}")
        fails += 1
        continue
    want = want.reindex(sorted(want.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(want.columns) != list(got.columns):
        print(f"FAIL {q}: columns want={list(want.columns)} got={list(got.columns)}")
        fails += 1
        continue
    if len(want) != len(got):
        print(f"FAIL {q}: rows want={len(want)} got={len(got)}")
        fails += 1
        continue
    # numeric-kind divergence (float vs int) also breaks the driver
    # hash even when values compare equal — int width diffs are fine
    kindbad = [c for c in want.columns
               if want[c].dtype.kind != got[c].dtype.kind
               and {want[c].dtype.kind, got[c].dtype.kind} <= {"i", "u", "f"}
               and "f" in {want[c].dtype.kind, got[c].dtype.kind}]
    if kindbad:
        print(f"FAIL {q}: dtype kind diverges (float vs int) on "
              f"{[(c, str(want[c].dtype), str(got[c].dtype)) for c in kindbad]}"
              " — driver hash would mismatch")
        fails += 1
        continue
    # row order as produced (both sides ORDER BY deterministically)
    bad = []
    for c in want.columns:
        wv, gv = want[c], got[c]
        try:
            eq = (wv.astype("object").where(~wv.isna(), None).values ==
                  gv.astype("object").where(~gv.isna(), None).values)
        except Exception:
            eq = wv.values == gv.values
        import numpy as np
        neq = (~pd.Series(eq.astype(bool))).to_numpy().nonzero()[0]
        if len(neq):
            i = int(neq[0])
            bad.append((c, i, wv.iloc[i], gv.iloc[i], len(neq)))
    if bad:
        for c, i, w, g, n in bad[:3]:
            print(f"FAIL {q}: col {c} row {i}: want={w!r} got={g!r} ({n} diffs)")
        fails += 1
    else:
        print(f"PASS {q} ({len(want)} rows)")
sys.exit(1 if fails else 0)

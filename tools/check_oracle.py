#!/usr/bin/env python3
"""Local pre-check of SparkEntry.oracleSql vs the Verify parquet dump.

Mimics the driver's t2 gate: for each query, run the oracle SQL in
DuckDB over the sf parquet tables and compare with the Spark result
(columns sorted by name, rows sorted, exact value comparison; reports
near-miss magnitudes for floats so determinism gaps are visible).

Usage: python3 tools/check_oracle.py /root/testdata/sf0.01 /tmp/vout
"""
import json, sys, glob
import duckdb
import pandas as pd
import numpy as np

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    name = p.split("/")[-1].replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        exp = con.execute(sql).fetchdf()
    except Exception as e:
        fails.append(name); print(f"FAIL {name}: duckdb error: {e}"); continue
    try:
        got = pd.read_parquet(glob.glob(f"{outdir}/{name}/*.parquet")[0] if glob.glob(f"{outdir}/{name}/*.parquet") else f"{outdir}/{name}")
    except Exception as e:
        fails.append(name); print(f"FAIL {name}: spark read error: {e}"); continue

    exp = exp.reindex(sorted(exp.columns), axis=1)
    got = got.reindex(sorted(got.columns), axis=1)
    if list(exp.columns) != list(got.columns):
        fails.append(name)
        print(f"FAIL {name}: columns exp={list(exp.columns)} got={list(got.columns)}")
        continue
    if len(exp) != len(got):
        fails.append(name)
        print(f"FAIL {name}: rows exp={len(exp)} got={len(got)}")
        continue
    sort_cols = list(exp.columns)
    hashable = [c for c in sort_cols if exp[c].dtype != object or not exp[c].map(lambda x: isinstance(x, (list, np.ndarray))).any()]
    exp = exp.sort_values(hashable).reset_index(drop=True)
    got = got.sort_values(hashable).reset_index(drop=True)
    bad = []
    for c in exp.columns:
        e, g = exp[c], got[c]
        if e.dtype != g.dtype:
            bad.append(f"{c}: dtype exp={e.dtype} got={g.dtype}")
        if np.issubdtype(e.dtype, np.floating) and np.issubdtype(np.dtype(g.dtype), np.floating):
            both_nan = e.isna() & g.isna()
            eq = (e == g) | both_nan
            if not eq.all():
                d = (e - g).abs().max()
                bad.append(f"{c}: {int((~eq).sum())}/{len(e)} values differ, max abs diff {d}")
        else:
            ee = e.map(lambda x: tuple(x) if isinstance(x, (list, np.ndarray)) else x)
            gg = g.map(lambda x: tuple(x) if isinstance(x, (list, np.ndarray)) else x)
            eq = (ee == gg) | (e.isna() & g.isna() if e.dtype != object else (ee.isna() & gg.isna()))
            if not eq.all():
                i = (~eq).idxmax()
                bad.append(f"{c}: {int((~eq).sum())}/{len(e)} values differ, first at row {i}: exp={e[i]!r} got={g[i]!r}")
    if bad:
        fails.append(name)
        print(f"FAIL {name}:")
        for b in bad:
            print(f"   {b}")
    else:
        print(f"OK   {name} ({len(exp)} rows)")

print(f"\n{len(oracle) - len(fails)}/{len(oracle)} queries match")
sys.exit(1 if fails else 0)

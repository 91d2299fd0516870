#!/usr/bin/env python3
"""Local mimic of the driver's t2 DuckDB-oracle check.
Usage: oracle_check.py <sfDir> <verifyOutDir>
"""
import sys, json, glob, os
import duckdb, pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sfdir}/*.parquet"):
    t = os.path.basename(p).replace('.parquet','')
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
# a partial Verify run leaves a marker naming its subset; anything else
# in the dir is stale output from an earlier run — skip it, loudly
partial = None
if os.path.exists(f"{outdir}/_PARTIAL_RUN"):
    partial = set(open(f"{outdir}/_PARTIAL_RUN").read().strip().split(","))
    print(f"*** PARTIAL RUN: checking only {sorted(partial)} ***")
fails = []
# a requested query whose output dir is MISSING errored inside Verify —
# report it as a failure instead of silently skipping it. Expected set
# comes from Verify's own manifest of REQUESTED queries (covers rows-only
# queries too, not just oracled ones); fall back to oracle keys for dumps
# written before the manifest existed.
manifest = os.path.join(outdir, "queries_requested.json")
if partial is not None:
    expected = partial
elif os.path.exists(manifest):
    expected = set(json.load(open(manifest)))
else:
    expected = set(oracle)
for name in sorted(expected):
    if not os.path.isdir(os.path.join(outdir, name)):
        fails.append(name)
        print(f"{name:26s} MISSING OUTPUT (query errored in Verify?)")
for name in sorted(os.listdir(outdir)):
    d = os.path.join(outdir, name)
    if not os.path.isdir(d):
        continue
    if partial is not None and name not in partial:
        continue
    got = con.sql(f"SELECT * FROM '{d}/*.parquet'").df()
    got = got[sorted(got.columns)]
    if name not in oracle:
        print(f"{name:26s} rows={len(got):7d}  (no oracle)")
        continue
    try:
        exp = con.sql(oracle[name]).df()
    except Exception as ex:
        fails.append(name); print(f"{name:26s} ORACLE SQL ERROR: {str(ex)[:200]}"); continue
    exp = exp[sorted(exp.columns)]
    status = []
    if list(got.columns) != list(exp.columns):
        status.append(f"cols {list(got.columns)} != {list(exp.columns)}")
    elif len(got) != len(exp):
        status.append(f"rows {len(got)} != {len(exp)}")
    else:
        for c in got.columns:
            a, b = got[c], exp[c]
            if str(a.dtype) != str(b.dtype):
                status.append(f"dtype[{c}] {a.dtype} != {b.dtype}")
            try:
                av, bv = a.values, b.values
                eq = (av == bv)
                try:
                    eq = eq | (pd.isna(a).values & pd.isna(b).values)
                except Exception:
                    pass
                n_bad = int((~eq).sum())
                if n_bad:
                    idx = list((~eq).nonzero()[0][:3])
                    status.append(f"val[{c}] {n_bad} mismatches e.g. rows {idx}: {list(a.iloc[idx])} vs {list(b.iloc[idx])}")
            except Exception as ex:
                status.append(f"cmp[{c}] error {str(ex)[:100]}")
    if status:
        fails.append(name)
        print(f"{name:26s} FAIL  " + " | ".join(status)[:400])
    else:
        print(f"{name:26s} OK    rows={len(got)}")
print(f"\n{len(fails)} failures: {fails}")

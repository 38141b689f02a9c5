#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB over the sf parquet tables, load the Spark-side parquet dump, sort
columns by name, sort rows, and compare cell-exact. Usage:
    python3 tools/oracle_check.py /tmp/verify_out /root/testdata/sf0.01
"""
import sys, json, glob, os
import duckdb
import pyarrow.parquet as pq
import pandas as pd
import numpy as np

outdir, sfdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for f in glob.glob(f"{sfdir}/*.parquet"):
    name = os.path.basename(f).replace(".parquet", "")
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{f}')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
present = {d for d in os.listdir(outdir)
           if os.path.isdir(os.path.join(outdir, d))}
# A query that threw in Verify writes no dir — that's a FAIL, not an
# omission; conversely a stale dir with no oracle key is reported.
declared = sorted(present | set(oracle.keys()))

def norm(df):
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)

n_pass = n_fail = 0
for name in declared:
    tag = lambda s: print(f"{name:28s} {s}")
    if name not in present:
        tag("MISSING spark output (query failed in Verify)"); n_fail += 1; continue
    try:
        sdf = pq.read_table(os.path.join(outdir, name)).to_pandas()
    except Exception as e:
        tag(f"SPARK READ ERROR {e}"); n_fail += 1; continue
    if name not in oracle:
        tag(f"no oracle (rows={len(sdf)})"); continue
    try:
        ddf = con.execute(oracle[name]).fetchdf()
    except Exception as e:
        tag(f"ORACLE ERROR {str(e).splitlines()[0][:120]}"); n_fail += 1; continue
    s, d = norm(sdf), norm(ddf)
    if list(s.columns) != list(d.columns):
        tag(f"COLS spark={list(s.columns)} duck={list(d.columns)}"); n_fail += 1; continue
    if len(s) != len(d):
        tag(f"ROWS spark={len(s)} duck={len(d)}"); n_fail += 1; continue
    bad = []
    for c in s.columns:
        a, b = s[c].values, d[c].values
        if np.issubdtype(s[c].dtype, np.floating) or np.issubdtype(d[c].dtype, np.floating):
            eq = (pd.isna(a) & pd.isna(b)) | (a == b)
        else:
            eq = (pd.Series(a).astype(str).fillna("<NA>") ==
                  pd.Series(b).astype(str).fillna("<NA>")).values
        if not eq.all():
            i = int(np.argmin(eq))
            bad.append(f"{c}[row{i}]: spark={a[i]!r} duck={b[i]!r} "
                       f"(dtypes {s[c].dtype}/{d[c].dtype})")
    if bad:
        tag("VALUE MISMATCH " + "; ".join(bad[:3])); n_fail += 1
    else:
        dt = [f"{c}:{s[c].dtype}/{d[c].dtype}" for c in s.columns
              if str(s[c].dtype) != str(d[c].dtype)]
        tag(f"OK rows={len(s)}" + (f"  [dtype diff: {', '.join(dt)}]" if dt else ""))
        n_pass += 1
print(f"\n== {n_pass} pass, {n_fail} fail, "
      f"{len(declared) - n_pass - n_fail} oracle-less ==")
sys.exit(1 if n_fail else 0)

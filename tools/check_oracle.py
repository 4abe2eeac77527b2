#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: run each oracle SQL in
DuckDB against the sf parquet tables, compare to the Spark parquet dumps
(sort columns by name, sort rows, compare values)."""
import sys, json, glob, os
import duckdb
import pandas as pd
import numpy as np

outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/vout"
sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.001"

con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    p = f"{sfdir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))

def norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize timestamps to us
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df.sort_values(by=list(df.columns), ignore_index=True)

fails = []
for name, sql in sorted(oracle.items()):
    spath = f"{outdir}/{name}"
    try:
        sdf = norm(con.sql(f"SELECT * FROM '{spath}/*.parquet'").df())
        odf = norm(con.sql(sql).df())
    except Exception as e:
        print(f"FAIL {name}: exception {e}")
        fails.append(name)
        continue
    if list(sdf.columns) != list(odf.columns):
        print(f"FAIL {name}: columns {list(sdf.columns)} vs {list(odf.columns)}")
        fails.append(name); continue
    if len(sdf) != len(odf):
        print(f"FAIL {name}: rows {len(sdf)} vs {len(odf)}")
        fails.append(name); continue
    ok = True
    for c in sdf.columns:
        a, b = sdf[c].values, odf[c].values
        if a.dtype != b.dtype:
            print(f"  {name}.{c}: dtype {a.dtype} vs {b.dtype}")
        if np.issubdtype(a.dtype, np.floating):
            eq = np.allclose(a.astype(float), b.astype(float), rtol=0, atol=0, equal_nan=True)
            if not eq:
                d = np.nanmax(np.abs(a.astype(float) - b.astype(float)))
                print(f"FAIL {name}.{c}: max abs diff {d}")
                ok = False
        else:
            eq = (pd.Series(a).astype(str) == pd.Series(b).astype(str)).all()
            if not eq:
                m = pd.Series(a).astype(str) != pd.Series(b).astype(str)
                i = int(np.argmax(m.values))
                print(f"FAIL {name}.{c}: first diff row {i}: {a[i]!r} vs {b[i]!r}")
                ok = False
    if ok:
        print(f"OK   {name} ({len(sdf)} rows)")
    else:
        fails.append(name)

print(f"\n{len(oracle)-len(fails)}/{len(oracle)} oracle-matched; no-oracle queries: "
      f"{sorted(set(os.path.basename(p) for p in glob.glob(outdir+'/q_*')) - set(oracle))}")
sys.exit(1 if fails else 0)

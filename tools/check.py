#!/usr/bin/env python3
"""Local mirror of the driver's DuckDB-oracle differential check.

Usage: python3 tools/check.py <sfDir> <outDir>
Reads <outDir>/<name>/ parquet (written by graft.Verify) and
<outDir>/oracle_sql.json, runs each SQL in DuckDB over the sfDir
tables, and compares values after sorting columns by name and rows.
"""
import sys, json, glob, math
import duckdb, pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sfdir}/{t}.parquet')")

oracle = json.load(open(f"{outdir}/oracle_sql.json"))
fails = 0
for name in sorted(oracle):
    sql = oracle[name]
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fails += 1; continue
    try:
        spark_df = pd.concat([pd.read_parquet(f) for f in files])
        duck_df = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fails += 1; continue
    a = spark_df.reindex(sorted(spark_df.columns), axis=1)
    b = duck_df.reindex(sorted(duck_df.columns), axis=1)
    if list(a.columns) != list(b.columns):
        print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}"); fails += 1; continue
    if len(a) != len(b):
        print(f"FAIL {name}: rows {len(a)} vs {len(b)}"); fails += 1; continue
    a = a.sort_values(by=list(a.columns)).reset_index(drop=True)
    b = b.sort_values(by=list(b.columns)).reset_index(drop=True)
    ok = True
    for c in a.columns:
        av, bv = a[c], b[c]
        if str(av.dtype) != str(bv.dtype):
            # dtype drift (e.g. timestamp unit); compare as strings
            av, bv = av.astype(str), bv.astype(str)
        eq = (av == bv) | (av.isna() & bv.isna())
        if not eq.all():
            i = (~eq).idxmax()
            print(f"FAIL {name}: col {c} row {i}: spark={a[c][i]!r} duck={b[c][i]!r} "
                  f"(dtypes {a[c].dtype}/{b[c].dtype}, {int((~eq).sum())} diffs)")
            ok = False; fails += 1; break
    if ok:
        print(f"PASS {name} ({len(a)} rows)")
# queries with no oracle entry get a rows-only check (driver contract:
# non-SQL-expressible ops record a weaker rows>0 check)
import os
no_oracle = sorted(set(
    d for d in os.listdir(outdir)
    if os.path.isdir(f"{outdir}/{d}") and d not in oracle))
for name in no_oracle:
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    n = sum(len(pd.read_parquet(f)) for f in files) if files else 0
    if n > 0:
        print(f"PASS {name} (rows-only: {n} rows)")
    else:
        print(f"FAIL {name}: rows-only check, 0 rows"); fails += 1
print(f"\n{len(oracle)+len(no_oracle)-fails}/{len(oracle)+len(no_oracle)} checks pass")
sys.exit(1 if fails else 0)

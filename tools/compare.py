#!/usr/bin/env python3
"""Local replica of the driver's t2 gate: run DuckDB oracle SQL from
outDir/oracle_sql.json against sfDir, compare to the Spark parquet dumps
(columns sorted by name, rows sorted, exact value match)."""
import sys, json, glob
import duckdb
import pandas as pd

sfdir, outdir = sys.argv[1], sys.argv[2]
oracle = json.load(open(f"{outdir}/oracle_sql.json"))
con = duckdb.connect()
fail = 0
for name, sql in sorted(oracle.items()):
    files = glob.glob(f"{outdir}/{name}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark output"); fail += 1; continue
    try:
        spark_df = duckdb.sql(f"SELECT * FROM '{outdir}/{name}/*.parquet'").df()
        oracle_df = con.sql(sql.replace("<sfDir>", sfdir)).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fail += 1; continue
    s = spark_df.reindex(sorted(spark_df.columns), axis=1)
    o = oracle_df.reindex(sorted(oracle_df.columns), axis=1)
    if list(s.columns) != list(o.columns):
        print(f"FAIL {name}: columns {list(s.columns)} vs {list(o.columns)}"); fail += 1; continue
    if list(s.dtypes) != list(o.dtypes):
        print(f"FAIL {name}: dtypes {s.dtypes.to_dict()} vs {o.dtypes.to_dict()}")
        fail += 1; continue
    s = s.sort_values(by=list(s.columns)).reset_index(drop=True)
    o = o.sort_values(by=list(o.columns)).reset_index(drop=True)
    if len(s) != len(o):
        print(f"FAIL {name}: rows {len(s)} vs {len(o)}"); fail += 1; continue
    o2 = o
    eq = s.equals(o2)
    if not eq:
        # exact cell compare with report
        bad = (s != o2) & ~(s.isna() & o2.isna())
        nbad = int(bad.to_numpy().sum())
        print(f"FAIL {name}: {nbad} mismatched cells / {len(s)} rows")
        idx = bad.any(axis=1)
        print(pd.concat([s[idx].head(3).add_suffix("_spark"),
                         o2[idx].head(3).add_suffix("_oracle")], axis=1).to_string())
        fail += 1
    else:
        print(f"OK   {name} ({len(s)} rows)")
# coverage: every dumped query dir should either have an oracle (hash gate)
# or be a known rows-only query; surface the uncovered set explicitly
import os
dumped = sorted(d for d in os.listdir(outdir)
                if os.path.isdir(os.path.join(outdir, d)))
rows_only = [q for q in dumped if q not in oracle]
if rows_only:
    print(f"\nrows-only (no oracle): {rows_only}")
print(f"\n{len(oracle)-fail}/{len(oracle)} queries match")
sys.exit(1 if fail else 0)

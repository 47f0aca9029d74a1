#!/usr/bin/env python3
"""Dev-only harness replicating the driver's correctness gate:
run graft.Verify (done separately via sbt), then compare each query's
parquet dump against its DuckDB oracle SQL on the same tables.
Not part of the library; python deps are driver-side only."""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"

con = duckdb.connect()
for t in ["region","nation","customer","supplier","part","orders",
          "lineitem","events","documents","embeddings"]:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
results = {}
for name in sorted(oracle):
    sql = oracle[name]
    pdir = f"{out_dir}/{name}"
    try:
        spark_df = pd.concat([pd.read_parquet(f) for f in
                              sorted(glob.glob(f"{pdir}/*.parquet"))])
    except Exception as e:
        results[name] = f"NO_SPARK_OUT: {e}"
        continue
    try:
        duck_df = con.sql(sql).df()
    except Exception as e:
        results[name] = f"ORACLE_SQL_FAIL: {e}"
        continue
    sc = sorted(spark_df.columns); dc = sorted(duck_df.columns)
    if sc != dc:
        results[name] = f"SCHEMA_MISMATCH: spark={sc} duck={dc}"
        continue
    a = spark_df[sc].sort_values(sc).reset_index(drop=True)
    b = duck_df[dc].sort_values(dc).reset_index(drop=True)
    if len(a) != len(b):
        results[name] = f"ROWCOUNT_MISMATCH: spark={len(a)} duck={len(b)}"
        continue
    # normalize dtypes the way a value-hash would see them
    for c in sc:
        if a[c].dtype != b[c].dtype:
            try:
                a[c] = a[c].astype("float64"); b[c] = b[c].astype("float64")
            except Exception:
                a[c] = a[c].astype(str); b[c] = b[c].astype(str)
    if a.equals(b):
        results[name] = f"OK ({len(a)} rows)"
    else:
        neq = (a != b) & ~(a.isna() & b.isna())
        bad_cols = [c for c in sc if neq[c].any()]
        i = neq.any(axis=1).idxmax()
        results[name] = (f"VALUE_MISMATCH cols={bad_cols} "
                         f"row{i}: spark={a.loc[i].to_dict()} duck={b.loc[i].to_dict()}")

ok = sum(1 for v in results.values() if v.startswith("OK"))
for k, v in results.items():
    print(("PASS " if v.startswith("OK") else "FAIL ") + k + ": " + str(v)[:500])
print(f"== {ok}/{len(results)} pass")
sys.exit(0 if ok == len(results) else 1)

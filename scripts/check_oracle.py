#!/usr/bin/env python3
"""Local stand-in for the driver's t2 DuckDB-oracle compare.

Usage: check_oracle.py <sfDir> <verifyOutDir>
Reads <verifyOutDir>/oracle_sql.json, registers each <sfDir>/*.parquet as a
view, runs each oracle SQL in DuckDB, and compares against the Spark parquet
dump (columns sorted by name, rows sorted, exact value match).
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for p in glob.glob(f"{sf_dir}/*.parquet"):
    name = os.path.basename(p)[:-len(".parquet")]
    con.execute(f"CREATE VIEW {name} AS SELECT * FROM read_parquet('{p}')")

oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
fails = 0
for name, sql in sorted(oracle.items()):
    spark_path = f"{out_dir}/{name}"
    if not os.path.isdir(spark_path):
        print(f"FAIL {name}: spark output missing"); fails += 1; continue
    try:
        rel = con.sql(sql)
        # dtype lint: the driver's hash is dtype-aware, so a DuckDB
        # HUGEINT column (uncast SUM(BIGINT) etc.) hash-mismatches a
        # value-identical Spark int64. Catch that class locally.
        bad_types = [(c, str(t)) for c, t in zip(rel.columns, rel.types)
                     if str(t).upper() in ("HUGEINT", "UHUGEINT")]
        if bad_types:
            print(f"FAIL {name}: oracle emits non-portable dtype(s) "
                  f"{bad_types} — add CAST(... AS BIGINT)")
            fails += 1; continue
        duck = rel.df()
    except Exception as e:
        print(f"FAIL {name}: duckdb error: {e}"); fails += 1; continue
    spark = con.execute(
        f"SELECT * FROM read_parquet('{spark_path}/*.parquet')").df()
    duck = duck.reindex(sorted(duck.columns), axis=1)
    spark = spark.reindex(sorted(spark.columns), axis=1)
    if list(duck.columns) != list(spark.columns):
        print(f"FAIL {name}: columns duck={list(duck.columns)} spark={list(spark.columns)}")
        fails += 1; continue
    for c in duck.columns:
        d, s = str(duck[c].dtype), str(spark[c].dtype)
        # integer WIDTH differences hash identically on the driver
        # (r9 evidence: int32 Spark ntile vs int64 DuckDB was green);
        # warn only on cross-kind drift (int vs float/object/etc.)
        if d != s and not (d.startswith("int") and s.startswith("int")):
            print(f"WARN {name}: dtype of {c}: duck={d} spark={s} "
                  f"(driver hash is dtype-aware)")
    if len(duck) != len(spark):
        print(f"FAIL {name}: rows duck={len(duck)} spark={len(spark)}")
        fails += 1; continue
    dv = duck.sort_values(by=list(duck.columns)).reset_index(drop=True)
    sv = spark.sort_values(by=list(spark.columns)).reset_index(drop=True)
    mismatch = None
    for c in duck.columns:
        a, b = dv[c], sv[c]
        try:
            eq = (a == b) | (a.isna() & b.isna())
        except Exception:
            eq = a.astype(str) == b.astype(str)
        if not eq.all():
            i = int((~eq).idxmax())
            mismatch = (c, a.iloc[i], b.iloc[i], (~eq).sum())
            break
    if mismatch:
        c, a, b, n = mismatch
        print(f"FAIL {name}: col {c}: duck={a!r} spark={b!r} ({n} rows differ)")
        fails += 1
    else:
        print(f"OK   {name} ({len(duck)} rows)")
print(f"\n{len(oracle)-fails}/{len(oracle)} passed")
sys.exit(1 if fails else 0)

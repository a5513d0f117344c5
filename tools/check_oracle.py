#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: check_oracle.py <sfDir> <verifyOutDir>
Compares each <outDir>/<name> parquet against the oracle SQL in
<outDir>/oracle_sql.json run by DuckDB over the same sf tables.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

sf_dir, out_dir = sys.argv[1], sys.argv[2]
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    p = f"{sf_dir}/{t}.parquet"
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")

oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
fail = 0
for name, sql in sorted(oracles.items()):
    res_dir = f"{out_dir}/{name}"
    files = glob.glob(f"{res_dir}/*.parquet")
    if not files:
        print(f"FAIL {name}: no spark result"); fail += 1; continue
    try:
        spark_df = pd.concat([pd.read_parquet(f) for f in files])
        duck_df = con.execute(sql).df()
    except Exception as e:
        print(f"FAIL {name}: {e}"); fail += 1; continue

    def norm(df):
        df = df[sorted(df.columns)].copy()
        for c in df.columns:
            if str(df[c].dtype).startswith("datetime"):
                df[c] = df[c].astype(str)
        return df.sort_values(by=list(df.columns)).reset_index(drop=True)

    a, b = norm(spark_df), norm(duck_df)
    if list(a.columns) != list(b.columns):
        print(f"FAIL {name}: columns {list(a.columns)} vs {list(b.columns)}"); fail += 1; continue
    if len(a) != len(b):
        print(f"FAIL {name}: rows {len(a)} vs {len(b)}"); fail += 1; continue
    # The driver hashes RENDERED values, so a DuckDB HUGEINT against a
    # Spark BIGINT hash-mismatches even at equal values (round-11 q239).
    # duckdb's .df() maps HUGEINT to dtype 'object' when values overflow
    # int64 but to 'float64' when they fit (the round-12 q261/q271 slip),
    # so BOTH dtype splits mean the oracle left an aggregate uncast.
    # Surface either as a hard FAIL: integer Spark side + object-or-float
    # DuckDB side.
    hugeint = [c for c in a.columns
               if a[c].dtype.kind in "iu"
               and (b[c].dtype == object or b[c].dtype.kind == "f")]
    if hugeint:
        print(f"FAIL {name}: uncast oracle aggregate (DuckDB HUGEINT renders as {[str(b[c].dtype) for c in hugeint]}) in {hugeint}")
        fail += 1; continue
    try:
        pd.testing.assert_frame_equal(a, b, check_dtype=False, check_exact=True)
        print(f"OK   {name}: {len(a)} rows")
    except AssertionError as e:
        print(f"FAIL {name}: value mismatch\n{str(e)[:500]}"); fail += 1
print("RESULT:", "PASS" if fail == 0 else f"{fail} FAILURES")
sys.exit(1 if fail else 0)

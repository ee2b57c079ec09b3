#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle correctness check.

Dev-loop tool only (driver-side python libs); the shipped engine is Scala.
Usage: python3 scripts/check_oracle.py <sfDir> <verifyOutDir>
"""
import json, sys, glob
import duckdb
import pandas as pd

TABLES = ["region","nation","customer","supplier","part","orders","lineitem",
          "events","documents","embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    fails = []
    for name, sql in sorted(oracle.items()):
        files = glob.glob(f"{out_dir}/{name}/*.parquet")
        if not files:
            fails.append((name, "no spark output")); continue
        try:
            exp = con.sql(sql).df()
        except Exception as e:
            fails.append((name, f"oracle sql error: {e}")); continue
        # Read the Spark output with pyarrow/pandas, NOT duckdb: the driver
        # does the same, so Spark-side decimals stay Decimal objects while
        # the oracle side goes through DuckDB's decimal→float64 .df()
        # conversion. Reading both sides through duckdb masked exactly the
        # representation mismatches the driver's hash catches (round-2
        # trailing-zero decimal failures).
        got = pd.read_parquet(files)
        exp = exp.reindex(sorted(exp.columns), axis=1)
        got = got.reindex(sorted(got.columns), axis=1)
        if list(exp.columns) != list(got.columns):
            fails.append((name, f"schema: oracle={list(exp.columns)} got={list(got.columns)}")); continue
        if len(exp) != len(got):
            fails.append((name, f"rows: oracle={len(exp)} got={len(got)}")); continue
        # Compare STRINGIFIED values (the driver hashes value strings):
        # Decimal('138014.00') vs float 138014.0 must FAIL here.
        exp_s = exp.astype(str).sort_values(by=list(exp.columns)).reset_index(drop=True)
        got_s = got.astype(str).sort_values(by=list(got.columns)).reset_index(drop=True)
        eq = exp_s.equals(got_s)
        if not eq:
            diff = (exp_s != got_s)
            bad_cols = [c for c in exp_s.columns if diff[c].any()]
            fails.append((name, f"values differ in cols {bad_cols}; "
                                f"first rows:\n{exp_s[diff.any(axis=1)].head(2)}\nvs\n{got_s[diff.any(axis=1)].head(2)}"))
        else:
            print(f"  OK  {name} ({len(got)} rows)")
    spark_only = [n for n in
                  {f.split('/')[-1] for f in glob.glob(f'{out_dir}/*') if not f.endswith('.json')}
                  if n not in oracle]
    for n in sorted(spark_only):
        files = glob.glob(f"{out_dir}/{n}/*.parquet")
        nrows = len(con.sql(f"SELECT * FROM read_parquet({files!r})").df()) if files else -1
        print(f"  rows-only  {n}: {nrows} rows")
    if fails:
        print("\nFAILURES:")
        for n, why in fails: print(f"  FAIL {n}: {why}")
        sys.exit(1)
    print("all oracle checks passed")

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])

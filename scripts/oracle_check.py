#!/usr/bin/env python3
"""Dev-only oracle validation harness (mimics the driver's t2 compare).

Usage: oracle_check.py <verify_outdir> [sfdir]

Runs each SQL from <verify_outdir>/oracle_sql.json in DuckDB (with the
sfdir parquet tables registered as views), canonicalizes both results
(sorted columns, sorted rows, floats rounded, NaN->null), and diffs
against the Spark parquet dump at <verify_outdir>/<name>/.

NOT part of the shipped engine — uses the driver-side python env.
"""
import glob
import json
import os
import sys

import duckdb
import numpy as np
import pandas as pd

ROUND = 6


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        k = df[c].dtype.kind
        if k == "f":
            df[c] = df[c].astype("float64").round(ROUND)
        elif k in "iu":
            df[c] = df[c].astype("int64")
    return df.sort_values(list(df.columns)).reset_index(drop=True)


def main() -> int:
    outdir = sys.argv[1]
    sfdir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.01"
    con = duckdb.connect()
    for p in sorted(glob.glob(f"{sfdir}/*.parquet")):
        t = p.split("/")[-1].replace(".parquet", "")
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{p}')"
        )
    sqls = json.load(open(f"{outdir}/oracle_sql.json"))
    n_fail = 0
    for name in sorted(sqls):
        if not os.path.isdir(f"{outdir}/{name}"):
            continue  # dev runs may dump only a query subset
        if os.path.exists(f"{outdir}/{name}/_ERROR"):
            msg = open(f"{outdir}/{name}/_ERROR").read().strip()
            print(f"ERR  {name}: Spark-side failure: {msg[:200]}")
            n_fail += 1
            continue
        try:
            duck = canon(con.execute(sqls[name]).df())
            spark = canon(pd.read_parquet(f"{outdir}/{name}"))
            if list(duck.columns) != list(spark.columns):
                print(f"FAIL {name}: columns duck={list(duck.columns)} "
                      f"spark={list(spark.columns)}")
                n_fail += 1
                continue
            if len(duck) != len(spark):
                print(f"FAIL {name}: rows duck={len(duck)} spark={len(spark)}")
                n_fail += 1
                continue
            # Driver's hash is type-sensitive: a DuckDB HUGEINT->float64
            # column vs a Spark int64 column hash-diverges even when every
            # value is equal (q13 r1, q37/q73 r2). Fail on dtype drift.
            dt = [(c, str(duck[c].dtype), str(spark[c].dtype))
                  for c in duck.columns
                  if duck[c].dtype.kind != spark[c].dtype.kind
                  and not (duck[c].dtype.kind in "iu"
                           and spark[c].dtype.kind in "iu")]
            if dt:
                print(f"FAIL {name}: dtype mismatch (duck vs spark): {dt}")
                n_fail += 1
                continue
            neq = ~(duck.eq(spark) | (duck.isna() & spark.isna()))
            if neq.any().any():
                bad = neq.any(axis=1)
                print(f"FAIL {name}: {int(bad.sum())}/{len(duck)} rows differ; "
                      f"first diffs:")
                both = duck[bad].head(3).join(
                    spark[bad].head(3), lsuffix="_duck", rsuffix="_spark")
                print(both.to_string())
                n_fail += 1
            else:
                print(f"OK   {name} ({len(duck)} rows)")
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {type(e).__name__}: {e}")
            n_fail += 1
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())

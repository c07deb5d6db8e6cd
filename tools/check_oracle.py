#!/usr/bin/env python3
"""Local mirror of the driver's t2 correctness gate: load the Verify
parquet dumps, run each oracle SQL in DuckDB over the same sf dir, sort
columns by name, and compare cell-by-cell (strict). Usage:
    python3 tools/check_oracle.py <sfDir> <verifyOutDir>
"""
import duckdb, glob, json, sys

import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].reset_index(drop=True)
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == "float32":
            df[c] = df[c].astype("float64")
        elif str(df[c].dtype) in ("int32", "Int32", "Int64"):
            df[c] = df[c].astype("float64") if df[c].isna().any() else df[c].astype("int64")
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = 0
    for name in sorted(oracle):
        files = sorted(glob.glob(f"{out_dir}/{name}/*.parquet"))
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        spark_df = norm(pd.concat([pd.read_parquet(p) for p in files], ignore_index=True))
        try:
            duck_df = norm(con.execute(oracle[name]).df())
        except Exception as e:
            print(f"FAIL {name}: oracle sql error: {e}")
            n_fail += 1
            continue
        if list(spark_df.columns) != list(duck_df.columns):
            print(f"FAIL {name}: columns spark={list(spark_df.columns)} duck={list(duck_df.columns)}")
            n_fail += 1
            continue
        if len(spark_df) != len(duck_df):
            print(f"FAIL {name}: rows spark={len(spark_df)} duck={len(duck_df)}")
            n_fail += 1
            continue
        diff_cols = []
        for c in spark_df.columns:
            a, b = spark_df[c], duck_df[c]
            if a.dtype != b.dtype:
                diff_cols.append((c, f"dtype {a.dtype} vs {b.dtype}"))
                continue
            eq = (a == b) | (a.isna() & b.isna())
            if not eq.all():
                i = int((~eq).idxmax())
                diff_cols.append((c, f"row {i}: {a[i]!r} vs {b[i]!r} ({int((~eq).sum())} diffs)"))
        if diff_cols:
            print(f"FAIL {name}: " + "; ".join(f"{c}: {m}" for c, m in diff_cols))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    declared = set(json.load(open(f"{out_dir}/oracle_sql.json")))
    dumped = {p.split("/")[-1] for p in glob.glob(f"{out_dir}/*") if not p.endswith(".json")}
    for extra in sorted(dumped - declared):
        n = len(glob.glob(f"{out_dir}/{extra}/*.parquet"))
        print(f"INFO {extra}: no oracle (rows-only check, {n} parquet files)")
    # Blind-spot guard: every key SparkEntry declares must have produced a
    # dump dir — a no-oracle query that threw in Verify is a FAIL here.
    try:
        all_keys = set(json.load(open(f"{out_dir}/keys.json")))
    except FileNotFoundError:
        all_keys = declared
    for missing in sorted(all_keys - dumped):
        print(f"FAIL {missing}: declared in SparkEntry but no Verify dump (query threw?)")
        n_fail += 1
    print(f"\n{n_pass} passed, {n_fail} failed")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

#!/usr/bin/env python3
"""Local correctness harness mimicking the driver's DuckDB-oracle compare.

Usage: python3 tools/check.py [sf_dir] [out_dir]
  1. expects graft.Verify to have been run:  sbt "runMain graft.Verify <sf> <out>"
  2. loads <out>/oracle_sql.json, runs each SQL in DuckDB over the sf tables
  3. compares to <out>/<name>/ parquet: columns sorted by name, rows sorted
     by all columns, exact value compare (floats: exact bits after round-trip)
"""
import sys, json, glob, math
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize dtypes that differ in representation only
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime"):
            df[c] = df[c].astype("datetime64[us]")
        elif df[c].dtype == object:
            df[c] = df[c].map(lambda v: str(v) if v is not None else None)
    df = df.reset_index(drop=True)  # iloc below needs positional labels
    key = df.apply(lambda r: tuple(str(x) for x in r), axis=1) if len(df) else None
    if key is not None:
        df = df.iloc[key.sort_values(kind="mergesort").index].reset_index(drop=True)
    return df


def cmp(name, spark_df, duck_df, con):
    a, b = norm(spark_df), norm(duck_df)
    if list(a.columns) != list(b.columns):
        return f"SCHEMA cols spark={list(a.columns)} duck={list(b.columns)}"
    if len(a) != len(b):
        return f"ROWS spark={len(a)} duck={len(b)}"
    if len(a) > 100_000:  # vectorized bag-compare for big results
        con.register("t_spark", a)
        con.register("t_duck", b)
        d1 = con.sql("SELECT count(*) FROM (SELECT * FROM t_spark EXCEPT ALL SELECT * FROM t_duck)").fetchone()[0]
        d2 = con.sql("SELECT count(*) FROM (SELECT * FROM t_duck EXCEPT ALL SELECT * FROM t_spark)").fetchone()[0]
        con.unregister("t_spark")
        con.unregister("t_duck")
        if d1 or d2:
            return f"BAGDIFF spark_only={d1} duck_only={d2}"
        return None
    for c in a.columns:
        av, bv = a[c], b[c]
        for i in range(len(a)):
            x, y = av.iloc[i], bv.iloc[i]
            xn = isinstance(x, float) and math.isnan(x) or x is None or x is pd.NaT
            yn = isinstance(y, float) and math.isnan(y) or y is None or y is pd.NaT
            if xn and yn:
                continue
            if xn != yn or (str(x) != str(y)):
                return (f"VALUE col={c} row={i} spark={x!r} duck={y!r}")
    return None


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    if len(sys.argv) > 3:  # optional comma-separated name-prefix filter
        pre = sys.argv[3].split(",")
        oracles = {k: v for k, v in oracles.items()
                   if any(k.startswith(p) for p in pre)}
    n_pass = n_fail = 0
    for name in sorted(oracles):
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            n_fail += 1
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files],
                             ignore_index=True)
        try:
            duck_df = con.sql(oracles[name]).df()
        except Exception as e:
            print(f"FAIL {name}: oracle error {e}")
            n_fail += 1
            continue
        err = cmp(name, spark_df, duck_df, con)
        if err:
            print(f"FAIL {name}: {err}")
            n_fail += 1
        else:
            print(f"PASS {name} ({len(spark_df)} rows)")
            n_pass += 1
    print(f"== {n_pass} pass / {n_fail} fail ==")
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()

#!/usr/bin/env python3
"""Same-session DuckDB anchor for BENCH comparisons.

Runs every oracle SQL (from a Verify output dir) against the sf tables in
one 32-thread DuckDB process, best-of-N per query (default 2), and prints
ONE JSON line shaped like Bench's. Compare Spark and DuckDB totals from the
SAME session/hour — this host has multi-second external load noise, so
cross-session ratios mislead.

Usage: python3 tools/duck_bench.py [sf_dir] [verify_out_dir] [n]
"""
import sys, json, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def main():
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else "/tmp/verify_out"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    con = duckdb.connect(config={"threads": 32})
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    oracles = json.load(open(f"{out}/oracle_sql.json"))
    results, failed = {}, []
    for name in sorted(oracles):
        best = None
        for _ in range(n):
            t0 = time.time()
            try:
                con.sql(oracles[name]).fetchall()
            except Exception as e:
                failed.append(name)
                print(f"[duck_bench] {name} failed: {e}", file=sys.stderr)
                break
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        # a failed query is EXCLUDED from results/total (a 0.0 would deflate
        # the anchor the Spark total is compared against) and only listed in
        # "failed" — even if an earlier rep succeeded
        if name not in failed:
            results[name] = round(best, 3)
    total = round(sum(results.values()), 3)
    print(json.dumps({"metric": "duckdb_total", "value": total,
                      "unit": "sec", "queries": results,
                      "failed": sorted(failed), "sf": sf}))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()

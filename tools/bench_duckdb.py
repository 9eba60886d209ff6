#!/usr/bin/env python3
"""Time DuckDB executing every oracle SQL (the exact same computations
the Spark engine runs) over one scale directory — the single-node
throughput baseline the engine is graded against. Not part of the
library.

Usage: python3 tools/bench_duckdb.py <sfDir> <verifyOutDir-with-oracle_sql.json>
"""
import sys, json, os, time
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def main(sf_dir, out_dir):
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    timings = {}
    for name, sql in sorted(oracle.items()):
        t0 = time.time()
        try:
            con.execute(sql).fetchall()
            timings[name] = round(time.time() - t0, 3)
        except Exception as e:
            timings[name] = None
            print(f"FAIL {name}: {e}", file=sys.stderr)
    total = sum(v for v in timings.values() if v is not None)
    print(json.dumps({"metric": "duckdb_total", "value": round(total, 2),
                      "unit": "sec", "queries": timings, "sf": sf_dir}))

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])

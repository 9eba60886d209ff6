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
    # per-query min-of-N, mirroring graft.Bench's round-15 protocol —
    # a symmetric pair needs the same noise stripping on both engines;
    # a malformed value warns and falls back like Bench's toIntOption
    # (aborting here would break the pair asymmetrically)
    try:
        reps = int(os.environ.get("GRAFT_DUCKDB_REPS", "2"))
    except ValueError:
        print(f"WARN: bad GRAFT_DUCKDB_REPS="
              f"{os.environ['GRAFT_DUCKDB_REPS']!r}, using 2", file=sys.stderr)
        reps = 2
    reps = max(1, reps)
    load_start = os.getloadavg()[0]
    timings = {}
    for name, sql in sorted(oracle.items()):
        best = None
        for _ in range(reps):
            t0 = time.time()
            try:
                con.execute(sql).fetchall()
            except Exception as e:
                best = None
                print(f"FAIL {name}: {e}", file=sys.stderr)
                break
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        timings[name] = round(best, 3) if best is not None else None
    load_end = os.getloadavg()[0]
    total = sum(v for v in timings.values() if v is not None)
    record = {"metric": "duckdb_total", "value": round(total, 2),
              "unit": "sec", "queries": timings, "reps": reps,
              "load_avg": [round(load_start, 2), round(load_end, 2)],
              "sf": sf_dir}
    # per-query record mirroring Spark's BENCH_DETAIL.json, so a
    # symmetric pair diffs per-query without log archaeology.
    # GRAFT_DUCKDB_DETAIL_PATH redirects it (third-party runs must not
    # clobber the official artifact — same rule as the Spark side's
    # SPARK_GRAFT_DETAIL_PATH).
    detail_path = os.environ.get("GRAFT_DUCKDB_DETAIL_PATH",
                                 os.path.join(os.path.dirname(os.path.dirname(
                                     os.path.abspath(__file__))), "DUCKDB_DETAIL.json"))
    try:
        with open(detail_path, "w") as f:
            json.dump(record, f, indent=1, sort_keys=True)
    except OSError as e:
        print(f"WARN: detail write failed: {e}", file=sys.stderr)
    print(json.dumps(record))

if __name__ == "__main__":
    main(sys.argv[1], sys.argv[2])

#!/usr/bin/env python3
"""Local stand-in for the driver's correctness gate (NOT part of the
library): reads Verify's parquet dumps + oracle_sql.json, runs each
oracle SQL in DuckDB over the same sf directory's parquet tables, and
compares (columns sorted by name, rows sorted, values hashed).

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir> [jsonOut]

<sfDir> tables may be single parquet files (driver testdata) or
Spark-written directories of part files (ScaleBench replicas).
[jsonOut] additionally writes the per-query result map as a
CORRECTNESS-style JSON artifact.
"""
import sys, json, glob, os
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize types: ints -> int64, floats -> float64, rest -> str
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64").round(9)
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = df[c].astype("datetime64[us]").astype(str)
        else:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)

def fresh_con(sf_dir):
    # one connection PER QUERY: a 90GB replay poisons the shared
    # allocator for every query after it; views are free to recreate.
    # The cap + spill dir make heavy oracles degrade to disk instead
    # of getting OOM-killed mid-artifact.
    con = duckdb.connect()
    con.execute(f"SET memory_limit='{os.environ.get('DUCKDB_MEMLIMIT', '90GB')}'")
    # one spill dir PER PROCESS: two concurrent checkers sharing a
    # temp_directory delete each other's spill files mid-query
    con.execute(
        f"SET temp_directory='{os.environ.get('DUCKDB_TMPDIR', f'/tmp/duckdb_spill_{os.getpid()}')}'")
    # cap DuckDB's thread pool when sharing the box with a live Spark
    # run (e.g. checking completed dumps while Verify is still going)
    if os.environ.get("DUCKDB_THREADS"):
        con.execute(f"SET threads={int(os.environ['DUCKDB_THREADS'])}")
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.isdir(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}/*.parquet')")
        elif os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    return con

def main(sf_dir, out_dir, json_out=None):
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_noracle = 0
    # resumable: a rerun with the same json_out skips queries already
    # recorded and only replays the remainder (the report is flushed
    # after every query, so a crash loses at most the in-flight one)
    report = {}
    if json_out and os.path.exists(json_out):
        report = json.load(open(json_out))
        n_pass = sum(1 for v in report.values() if v.get("hash_match"))
        n_noracle = sum(1 for v in report.values() if v.get("rows_only"))
        n_fail = len(report) - n_pass - n_noracle
    def flush():
        if json_out:
            json.dump(report, open(json_out, "w"), indent=1, sort_keys=True)
    for qdir in sorted(glob.glob(f"{out_dir}/*/")):
        name = os.path.basename(qdir.rstrip("/"))
        if name in report and report[name].get("err") is None:
            continue
        files = glob.glob(f"{qdir}/*.parquet")
        if not files:
            print(f"MISSING-OUTPUT {name}"); n_fail += 1
            report[name] = {"err": "missing output"}
            flush()
            continue
        spark_df = pd.concat([pd.read_parquet(f) for f in sorted(files)])
        if name not in oracle:
            print(f"NO-ORACLE      {name} rows={len(spark_df)}"); n_noracle += 1
            report[name] = {"rows_only": True, "spark_rows": len(spark_df)}
            flush()
            continue
        try:
            con = fresh_con(sf_dir)
            duck_df = con.execute(oracle[name]).fetchdf()
            con.close()
        except Exception as e:
            print(f"ORACLE-ERR     {name}: {e}"); n_fail += 1
            report[name] = {"err": f"oracle: {e}"}
            flush()
            continue
        a, b = canon(spark_df), canon(duck_df)
        r = {"rows_match": len(a) == len(b),
             "schema_match": list(a.columns) == list(b.columns),
             "spark_rows": len(a), "oracle_rows": len(b), "err": None}
        report[name] = r
        if not r["schema_match"]:
            print(f"SCHEMA-MISMATCH {name}: spark={list(a.columns)} duck={list(b.columns)}")
            r["hash_match"] = False
            n_fail += 1; flush(); continue
        if not r["rows_match"]:
            print(f"ROWS-MISMATCH  {name}: spark={len(a)} duck={len(b)}")
            r["hash_match"] = False
            n_fail += 1; flush(); continue
        if not a.equals(b):
            r["hash_match"] = False
            neq = (a != b) & ~(a.isna() & b.isna())
            bad_cols = [c for c in a.columns if neq[c].any()]
            print(f"VALUE-MISMATCH {name}: cols={bad_cols}")
            for c in bad_cols[:2]:
                idx = neq[c].idxmax()
                print(f"   first diff {c}[{idx}]: spark={a[c][idx]!r} duck={b[c][idx]!r}")
            n_fail += 1; flush(); continue
        r["hash_match"] = True
        print(f"PASS           {name} rows={len(a)}")
        n_pass += 1; flush()
    print(f"\n== {n_pass} pass, {n_fail} fail, {n_noracle} rows-only ==")
    if json_out:
        json.dump(report, open(json_out, "w"), indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if n_fail else 0

if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2], sys.argv[3] if len(sys.argv) > 3 else None))

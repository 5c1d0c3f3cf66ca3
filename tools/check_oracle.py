#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB oracle compare.

Usage: python3 tools/check_oracle.py <sf_dir> <verify_out_dir>

For each query dir in verify_out_dir with an entry in oracle_sql.json:
register the sf_dir parquet tables in DuckDB, run the oracle SQL, load the
Spark parquet result, sort columns by name, sort rows, and hash-compare.
"""
import sys, json, glob, os, hashlib
import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]

def canon(df: pd.DataFrame) -> str:
    df = df.reindex(sorted(df.columns), axis=1)
    # normalize values to strings with stable float formatting
    def norm(v):
        if v is None or (isinstance(v, float) and pd.isna(v)):
            return "NULL"
        if isinstance(v, float):
            return f"{v:.6f}"
        if isinstance(v, (list, tuple)) or hasattr(v, "tolist") and not isinstance(v, (str, bytes)):
            try:
                v = list(v.tolist() if hasattr(v, "tolist") else v)
                return "[" + ",".join(norm(x) for x in v) + "]"
            except Exception:
                return str(v)
        if isinstance(v, pd.Timestamp):
            return v.isoformat()
        return str(v)
    rows = ["\x01".join(norm(v) for v in row) for row in df.itertuples(index=False, name=None)]
    rows.sort()
    return hashlib.md5("\n".join(rows).encode()).hexdigest(), len(rows)

def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    oracle = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.isdir(p):  # Spark-written table (GenScale fixtures)
            p = os.path.join(p, "*.parquet")
        if glob.glob(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
    n_pass = n_fail = 0
    for qdir in sorted(glob.glob(os.path.join(out_dir, "q*"))):
        name = os.path.basename(qdir)
        files = glob.glob(os.path.join(qdir, "*.parquet"))
        if not files:
            print(f"MISSING  {name}: no parquet output"); n_fail += 1; continue
        spark_df = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
        if name not in oracle:
            print(f"ROWSONLY {name}: rows={len(spark_df)}" + (" EMPTY!" if len(spark_df)==0 else ""))
            continue
        try:
            oracle_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"ORACLE-ERR {name}: {e}"); n_fail += 1; continue
        (h1, r1), (h2, r2) = canon(spark_df), canon(oracle_df)
        if h1 == h2:
            print(f"PASS     {name} rows={r1}"); n_pass += 1
        else:
            n_fail += 1
            print(f"FAIL     {name} spark_rows={r1} oracle_rows={r2}")
            # show small diff hint
            s = spark_df.reindex(sorted(spark_df.columns), axis=1)
            o = oracle_df.reindex(sorted(oracle_df.columns), axis=1)
            if list(s.columns) != list(o.columns):
                print(f"  cols spark={list(s.columns)} oracle={list(o.columns)}")
    print(f"\n{n_pass} pass, {n_fail} fail")
    sys.exit(1 if n_fail else 0)

if __name__ == "__main__":
    main()

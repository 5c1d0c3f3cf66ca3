#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB correctness gate.

Usage: python3 tools/check_oracle.py <sfDir> <verifyOutDir>

Loads each <name>/ parquet written by graft.Verify, runs the matching SQL
from oracle_sql.json in DuckDB over the same fixture tables, sorts columns
by name and rows by all columns, and compares values (exact for
ints/strings, repr-exact for floats since both sides round explicitly).
"""
import json
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    return df


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").df()
            want = con.execute(sql).df()
            g, w = canon(got), canon(want)
            if list(g.columns) != list(w.columns):
                print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
                failures += 1
                continue
            if len(g) != len(w):
                print(f"FAIL {name}: rows {len(g)} != {len(w)}")
                failures += 1
                continue
            # dtype-tolerant value compare (driver hashes values; we diff)
            mismatched = []
            for c in g.columns:
                a, b = g[c], w[c]
                try:
                    if a.dtype.kind == 'f' or b.dtype.kind == 'f':
                        import numpy as np
                        bad = ~(np.isclose(a.astype(float), b.astype(float),
                                           rtol=0, atol=0, equal_nan=True))
                    else:
                        bad = a.astype(object).ne(b.astype(object)) & ~(a.isna() & b.isna())
                except Exception as e:  # noqa: BLE001
                    print(f"  compare error on {c}: {e}")
                    mismatched.append((c, -1))
                    continue
                if bad.any():
                    mismatched.append((c, int(bad.sum())))
            # schema strictness note (driver may compare schemas too)
            dt_note = ""
            for c in g.columns:
                if str(g[c].dtype) != str(w[c].dtype):
                    dt_note += f" [dtype {c}: {g[c].dtype} vs {w[c].dtype}]"
            if mismatched:
                print(f"FAIL {name}: value mismatches {mismatched}{dt_note}")
                for c, _ in mismatched[:1]:
                    diff = g[c].astype(object) != w[c].astype(object)
                    idx = diff[diff].index[:3]
                    for i in idx:
                        print(f"    row {i} col {c}: got={g[c][i]!r} want={w[c][i]!r}")
                failures += 1
            else:
                print(f"OK   {name}: {len(g)} rows{dt_note}")
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}")
            failures += 1
    return failures


if __name__ == "__main__":
    sys.exit(1 if main(sys.argv[1], sys.argv[2]) else 0)

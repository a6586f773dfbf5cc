#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/check_oracle.py <verify_out_dir> <sf_dir>

For each query in <verify_out_dir>/oracle_sql.json: run the SQL in
DuckDB over the sf tables, read the Spark parquet result, sort columns
by name and rows by all columns, and compare values exactly.
Dev tooling only — the Scala library has no Python dependency.
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df):
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main(out_dir, sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            want = canon(con.execute(sql).fetchdf())
            got = canon(con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{name}/*.parquet')").fetchdf())
        except Exception as e:
            print(f"FAIL {name}: {e}")
            failures += 1
            continue
        if list(got.columns) != list(want.columns):
            print(f"FAIL {name}: columns got={list(got.columns)} want={list(want.columns)}")
            failures += 1
            continue
        # dtype-strict: the driver hashes value REPRESENTATIONS, so an
        # int64 Spark column vs a DuckDB HUGEINT/DOUBLE (float64/object
        # in pandas) mismatches even when values compare ==. The one
        # tolerated pair: tz-aware (Spark parquet) vs naive (DuckDB)
        # timestamps — the driver normalizes those; strip tz and
        # compare values.
        dtype_bad = []
        for c in got.columns:
            gd, wd = str(got[c].dtype), str(want[c].dtype)
            if gd == wd:
                continue
            if gd.startswith("datetime64") and wd.startswith("datetime64"):
                try:
                    got[c] = got[c].dt.tz_localize(None)
                except TypeError:
                    pass
                try:
                    want[c] = want[c].dt.tz_localize(None)
                except TypeError:
                    pass
                if str(got[c].dtype) == str(want[c].dtype):
                    continue
            dtype_bad.append((c, gd, wd))
        if dtype_bad:
            print(f"FAIL {name}: dtype mismatch {dtype_bad} "
                  f"(driver hash is representation-sensitive)")
            failures += 1
            continue
        if len(got) != len(want):
            print(f"FAIL {name}: rows got={len(got)} want={len(want)}")
            failures += 1
            continue
        # exact value compare (NaN-safe)
        neq = (got != want) & ~(got.isna() & want.isna())
        if neq.any().any():
            bad_cols = [c for c in got.columns if neq[c].any()]
            print(f"FAIL {name}: value mismatch in {bad_cols} "
                  f"({int(neq.any(axis=1).sum())}/{len(got)} rows)")
            for c in bad_cols[:3]:
                idx = neq[c].idxmax()
                print(f"  {c}[{idx}]: got={got[c][idx]!r} want={want[c][idx]!r}")
            failures += 1
            continue
        print(f"ok   {name} ({len(got)} rows, {len(got.columns)} cols)")
    print(f"\n{len(oracle) - failures}/{len(oracle)} queries match")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

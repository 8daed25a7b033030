#!/usr/bin/env python3
"""Local pre-validation of SparkEntry oracle pairs (mimics the driver's
DuckDB compare). Dev tool only — the library itself has no Python.

Usage: python3 tools/localcheck.py <outDir> <sfDir> [query ...]
  where <outDir> is what `graft.Verify <sfDir> <outDir>` produced.
Compares each <outDir>/<name> parquet against the oracle SQL in
<outDir>/oracle_sql.json run on the sfDir tables, after canonicalizing
(columns sorted by name, rows sorted by all columns).
"""
import json, sys, glob, os
import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(con, rel_sql):
    df = con.sql(rel_sql).fetchdf()
    df = df[sorted(df.columns)]
    df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def main():
    out_dir, sf_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for name, sql in sorted(oracle.items()):
        if only and name not in only:
            continue
        spark_glob = f"{out_dir}/{name}/*.parquet"
        if not glob.glob(spark_glob):
            print(f"[MISS] {name}: no spark output");  n_bad += 1; continue
        try:
            got = canon(con, f"SELECT * FROM '{spark_glob}'")
            want = canon(con, sql)
        except Exception as e:
            print(f"[ERR ] {name}: {e}"); n_bad += 1; continue
        if list(got.columns) != list(want.columns):
            print(f"[COLS] {name}: spark={list(got.columns)} oracle={list(want.columns)}")
            n_bad += 1; continue
        if [str(t) for t in got.dtypes] != [str(t) for t in want.dtypes]:
            print(f"[TYPE] {name}: spark={dict(got.dtypes.astype(str))} oracle={dict(want.dtypes.astype(str))}")
            n_bad += 1; continue
        if len(got) != len(want):
            print(f"[ROWS] {name}: spark={len(got)} oracle={len(want)}")
            n_bad += 1; continue
        eq = got.equals(want)
        if not eq:
            # dtype-tolerant retry (int64 vs int32 etc.)
            try:
                import pandas as pd
                diff = (got.astype(str) != want.astype(str))
                ndiff = int(diff.any(axis=1).sum())
                if ndiff == 0:
                    eq = True
                else:
                    bad = diff.any(axis=1)
                    print(f"[DIFF] {name}: {ndiff} differing rows; first:")
                    print("  spark:", got[bad].head(2).to_dict("records"))
                    print("  oracle:", want[bad].head(2).to_dict("records"))
            except Exception as e:
                print(f"[DIFF] {name}: {e}")
        if eq:
            if len(got) == 0:
                # empty == empty proves nothing about the query logic —
                # surface it so a threshold change that silently empties
                # a result can't masquerade as a pass (cf. round-3 q11)
                print(f"[WARN] {name}: 0 rows on BOTH sides — match is inconclusive")
            print(f"[ OK ] {name} ({len(got)} rows)"); n_ok += 1
        else:
            n_bad += 1
    print(f"== {n_ok} ok, {n_bad} bad ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()

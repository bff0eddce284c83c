#!/usr/bin/env python3
"""Dev-only differential harness (NOT part of the shipped library).

Mirrors the driver's correctness gate: reads the parquet dumps written by
`graft.Verify` plus `oracle_sql.json`, runs each oracle in DuckDB over the
same testdata parquet tables, and compares row-by-row with columns sorted by
name. Usage:  python3 tools/localcheck.py <sfDir> <verifyOutDir> [key ...]
"""
import json
import sys

import duckdb

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return round(v, 9)
    if isinstance(v, list):
        return tuple(norm(x) for x in v)
    return v


def main():
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    only = set(sys.argv[3:])
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")
    oracles = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_ok = n_bad = 0
    for key, sql in sorted(oracles.items()):
        if only and key not in only:
            continue
        try:
            got = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{key}/*.parquet')").fetch_arrow_table()
            want = con.execute(sql).fetch_arrow_table()
            g_cols, w_cols = sorted(got.column_names), sorted(want.column_names)
            if g_cols != w_cols:
                print(f"FAIL {key}: columns {g_cols} vs oracle {w_cols}")
                n_bad += 1
                continue
            g = [tuple(norm(row[c]) for c in g_cols) for row in got.to_pylist()]
            w = [tuple(norm(row[c]) for c in w_cols) for row in want.to_pylist()]
            if g == w:
                print(f"ok   {key}: {len(g)} rows")
                n_ok += 1
            else:
                n_bad += 1
                print(f"FAIL {key}: rows {len(g)} vs {len(w)}")
                for i, (a, b) in enumerate(zip(g, w)):
                    if a != b:
                        print(f"  first diff at row {i}:\n   spark={a}\n   duck ={b}")
                        break
        except Exception as e:
            n_bad += 1
            print(f"FAIL {key}: {type(e).__name__}: {e}")
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()

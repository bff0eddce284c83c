#!/usr/bin/env python3
"""Dev-only differential harness (NOT part of the shipped library).

Mirrors the driver's correctness gate at FULL strictness: reads the parquet
dumps written by `graft.Verify` plus `oracle_sql.json`, runs each oracle in
DuckDB over the same testdata parquet tables, converts both sides to pandas,
and compares

  1. column names (sorted),
  2. dtypes EXACTLY (no coercion: an int64 result vs a HUGEINT-as-float64
     oracle is a FAIL here, exactly as it hash-fails at the driver),
  3. values EXACTLY (no float rounding — the driver hashes raw values, so
     this harness must too),

after sorting rows by every column, as the driver does. Top-level
list/map/struct columns are REJECTED outright: the driver's pandas sort
crashes on them (`unhashable type: numpy.ndarray`), so a key emitting one
can never pass the gate regardless of values — serialize the array
(array_join / array_to_string) on both sides instead.

The round-3 lesson this encodes: the previous norm()-rounding version passed
six keys the driver gate failed. Lenient dev harness == red driver rows.

Usage:  python3 tools/localcheck.py <sfDir> <verifyOutDir> [key ...]
"""
import json
import sys

import duckdb
import pyarrow.types as patypes

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def nested_cols(table):
    """List/map/struct columns in an arrow table (driver-gate poison).

    Schema-level check: O(#columns), catches an all-NULL LIST column too —
    the previous per-value Python scan walked every string cell of every
    clean key just to conclude it was flat."""
    return [f.name for f in table.schema if patypes.is_nested(f.type)]


def canon(df):
    """Sort columns by name, rows by all columns — the driver's layout."""
    df = df[sorted(df.columns)]
    if len(df.columns) and len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


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
            got_t = con.execute(
                f"SELECT * FROM read_parquet('{out_dir}/{key}/*.parquet')"
            ).fetch_arrow_table()
            want_t = con.execute(sql).fetch_arrow_table()

            bad = [(side, c)
                   for side, t in (("spark", got_t), ("oracle", want_t))
                   for c in nested_cols(t)]
            got, want = got_t.to_pandas(), want_t.to_pandas()
            if bad:
                n_bad += 1
                print(f"FAIL {key}: top-level array/map column(s) "
                      f"{bad} — the driver gate cannot hash these; "
                      f"serialize with array_join/array_to_string")
                continue

            g_cols, w_cols = sorted(got.columns), sorted(want.columns)
            if g_cols != w_cols:
                n_bad += 1
                print(f"FAIL {key}: columns {g_cols} vs oracle {w_cols}")
                continue

            got, want = canon(got), canon(want)
            dt_g = [str(t) for t in got.dtypes]
            dt_w = [str(t) for t in want.dtypes]
            if dt_g != dt_w:
                n_bad += 1
                diffs = [(c, a, b) for c, a, b in zip(g_cols, dt_g, dt_w)
                         if a != b]
                print(f"FAIL {key}: dtype mismatch (spark vs oracle): {diffs}")
                continue

            if len(got) != len(want):
                n_bad += 1
                print(f"FAIL {key}: rows {len(got)} vs {len(want)}")
                continue

            if got.equals(want):
                print(f"ok   {key}: {len(got)} rows")
                n_ok += 1
            else:
                n_bad += 1
                neq = ~(got.eq(want) | (got.isna() & want.isna()))
                rows = neq.any(axis=1)
                i = int(rows.idxmax())
                cols = [c for c in got.columns if neq.loc[i, c]]
                print(f"FAIL {key}: value diff, first at sorted row {i} "
                      f"cols {cols}:\n   spark={got.loc[i].to_dict()}"
                      f"\n   duck ={want.loc[i].to_dict()}")
        except Exception as e:
            n_bad += 1
            print(f"FAIL {key}: {type(e).__name__}: {e}")
    print(f"== {n_ok} ok, {n_bad} fail ==")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()

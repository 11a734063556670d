#!/usr/bin/env python3
"""Local pre-flight for the driver's DuckDB correctness gate.

Usage: python3 tools/compare.py <sfDir> <verifyOutDir>

For every query result parquet written by graft.Verify, runs the paired
oracle SQL from oracle_sql.json in DuckDB against the same sf parquet
tables, then compares: schema (column names), row count, and values
(columns sorted by name, rows sorted by all columns, floats compared
exactly after normalization to float64).
"""
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def table_source(sf_dir: str, t: str) -> str:
    """Parquet source for a table: the harness single file, or a glob
    when the table is a multi-file directory (graft.ScaleData layout)."""
    p = f"{sf_dir}/{t}.parquet"
    return f"{p}/*.parquet" if os.path.isdir(p) else p


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            df[c] = pd.to_datetime(s).astype("datetime64[us]")
        elif pd.api.types.is_float_dtype(s):
            df[c] = s.astype("float64")
        elif pd.api.types.is_integer_dtype(s):
            df[c] = s.astype("int64")
        elif s.dtype == object:
            df[c] = s.map(lambda v: str(v) if v is not None else None)
    return df.sort_values(by=list(df.columns), na_position="first").reset_index(drop=True)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{table_source(sf_dir, t)}'")
    oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
    failures = 0
    for name in sorted(os.listdir(out_dir)):
        path = os.path.join(out_dir, name)
        if not os.path.isdir(path):
            continue
        got = pd.read_parquet(path)
        if name not in oracles:
            print(f"  [rows-only] {name}: {len(got)} rows")
            if len(got) == 0:
                print(f"  !! {name}: EMPTY result for rows-only query")
                failures += 1
            continue
        try:
            exp = con.execute(oracles[name]).df()
        except Exception as e:
            print(f"  !! {name}: oracle SQL failed: {e}")
            failures += 1
            continue
        # The driver's gate hashes TYPED values, so a cross-class dtype
        # mismatch (e.g. DuckDB widening sum(BIGINT) to HUGEINT, read back
        # as float64, vs Spark's int64) fails the driver even when every
        # value is numerically identical. Mirror that here: cross-class
        # (int vs float vs bool vs datetime vs object) is a FAILURE;
        # same-class width diffs (int32 vs int64) stay warnings because
        # normalize() erases them exactly as the driver's canonicalizer does.
        dtype_fail = False
        for c in sorted(set(got.columns) & set(exp.columns)):
            a, b = got[c], exp[c]
            if str(a.dtype) == str(b.dtype):
                continue
            def kind(s):
                if pd.api.types.is_datetime64_any_dtype(s):
                    return "datetime"
                if pd.api.types.is_bool_dtype(s):
                    return "bool"
                if pd.api.types.is_integer_dtype(s):
                    return "int"
                if pd.api.types.is_float_dtype(s):
                    return "float"
                return "object"
            if kind(a) != kind(b):
                print(f"  !! {name}: dtype CLASS mismatch col={c} "
                      f"spark={a.dtype} duck={b.dtype} (driver hash is type-sensitive)")
                dtype_fail = True
            else:
                print(f"  ~~ {name}: dtype diff col={c} spark={a.dtype} duck={b.dtype}")
        if dtype_fail:
            failures += 1
            continue
        g, e = normalize(got.copy()), normalize(exp.copy())
        if list(g.columns) != list(e.columns):
            print(f"  !! {name}: schema mismatch spark={list(g.columns)} duck={list(e.columns)}")
            failures += 1
            continue
        if len(g) != len(e):
            print(f"  !! {name}: rowcount spark={len(g)} duck={len(e)}")
            failures += 1
            continue
        bad = None
        for c in g.columns:
            a, b = g[c], e[c]
            if pd.api.types.is_float_dtype(a):
                eq = (a == b) | (a.isna() & b.isna())
            else:
                eq = (a.astype(object).where(a.notna(), None)
                      == b.astype(object).where(b.notna(), None)) | (a.isna() & b.isna())
            if not eq.all():
                i = int((~eq).idxmax())
                bad = (c, i, a.iloc[i], b.iloc[i])
                break
        if bad:
            c, i, av, bv = bad
            print(f"  !! {name}: value mismatch col={c} row={i} spark={av!r} duck={bv!r}")
            failures += 1
        else:
            print(f"  OK {name}: {len(g)} rows")
    print(f"\n{failures} failures")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

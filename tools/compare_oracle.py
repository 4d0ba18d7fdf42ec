#!/usr/bin/env python3
"""Local replica of the driver's correctness gate: for each query output
under OUT_DIR, run the matching oracle SQL from oracle_sql.json in DuckDB
against the same parquet tables, sort columns by name, and compare values.

Usage: compare_oracle.py <sf_dir> <out_dir>
"""
import json
import math
import sys

import duckdb
import numpy as np
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """Replicate the driver's canonicalization EXACTLY: sort columns by
    name, then row-sort on all columns (pandas sort_values). The row
    sort CRASHES on array-typed cells ('unhashable type: numpy.ndarray')
    — deliberately not caught here, so a local green can never again
    ship a driver red (round-2 lesson: q28/q39/q41/q47/q50)."""
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df.columns):
        df = df.sort_values(by=list(df.columns)).reset_index(drop=True)
    return df


def type_class(v) -> str:
    """Coarse type class for strict cross-engine comparison. The driver's
    hash is TYPE-sensitive: 86 (BIGINT) and 86.0 (DOUBLE) hash differently
    even though == passes — the round-4 q71 failure shipped exactly because
    this comparator accepted them as equal. Bool must be checked before int
    (bool is an int subclass in Python and numpy)."""
    if isinstance(v, (bool, np.bool_)):
        return "bool"
    if isinstance(v, (int, np.integer)):
        return "int"
    if isinstance(v, (float, np.floating)):
        return "float"
    if isinstance(v, str):
        return "str"
    if isinstance(v, (bytes, bytearray)):
        return "bytes"
    return type(v).__name__


def values_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if hasattr(a, "__len__") and not isinstance(a, (str, bytes)) and \
       hasattr(b, "__len__") and not isinstance(b, (str, bytes)):
        if len(a) != len(b):
            return False
        return all(values_equal(x, y) for x, y in zip(a, b))
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) != pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    if type_class(a) != type_class(b):
        return False
    if isinstance(a, (float, np.floating)):
        if math.isnan(a) and math.isnan(b):
            return True
        return a == b
    return a == b


def main() -> int:
    sf_dir, out_dir = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    import glob
    import os
    names = sorted(d.split("/")[-1] for d in glob.glob(f"{out_dir}/q*"))
    n_pass = n_fail = n_rows_only = 0
    # Round-6 lesson: a query that throws writes no parquet, so a purely
    # presence-based sweep reads as green while coverage shrinks. Verify
    # now persists errors.json (per-query failure messages) and
    # manifest.json (the selected query set); every error is a hard fail
    # and every manifest entry must be accounted for.
    errors = {}
    if os.path.exists(f"{out_dir}/errors.json"):
        errors = json.load(open(f"{out_dir}/errors.json"))
        for name, msg in sorted(errors.items()):
            print(f"{name}: QUERY_ERROR {msg[:200]}")
            n_fail += 1
    if os.path.exists(f"{out_dir}/manifest.json"):
        manifest = json.load(open(f"{out_dir}/manifest.json"))
        missing = sorted(set(manifest) - set(names) - set(errors))
        for name in missing:
            print(f"{name}: MISSING_OUTPUT (in manifest, no parquet, no error)")
            n_fail += 1
    for name in names:
        spark_df = pd.read_parquet(f"{out_dir}/{name}")
        if name not in oracle:
            print(f"{name}: ROWS_ONLY rows={len(spark_df)}")
            n_rows_only += 1
            continue
        try:
            duck_df = con.execute(oracle[name]).df()
        except Exception as e:
            print(f"{name}: ORACLE_SQL_ERROR {e}")
            n_fail += 1
            continue
        try:
            s, d = canon(spark_df), canon(duck_df)
        except Exception as e:
            print(f"{name}: SORT_ERROR (driver would crash too) {e}")
            n_fail += 1
            continue
        if list(s.columns) != list(d.columns):
            print(f"{name}: COLS_MISMATCH spark={list(s.columns)} duck={list(d.columns)}")
            n_fail += 1
            continue
        if len(s) != len(d):
            print(f"{name}: ROWCOUNT_MISMATCH spark={len(s)} duck={len(d)}")
            n_fail += 1
            continue
        # Column-level dtype audit: integer-vs-float kind mismatch is the
        # q71 failure class — fail hard. Other dtype diffs (object vs
        # string repr, int32 vs int64) get a visible warning so any driver
        # sensitivity there can be chased from the log.
        kind_bad = None
        for col in s.columns:
            sk, dk = s[col].dtype.kind, d[col].dtype.kind
            if sk != dk and {sk, dk} <= {"i", "u", "f"} and "f" in {sk, dk}:
                kind_bad = (col, s[col].dtype, d[col].dtype)
                break
            if s[col].dtype != d[col].dtype:
                print(f"{name}: DTYPE_WARN col={col} "
                      f"spark={s[col].dtype} duck={d[col].dtype}")
        if kind_bad:
            col, sd, dd = kind_bad
            print(f"{name}: DTYPE_MISMATCH col={col} spark={sd} duck={dd}")
            n_fail += 1
            continue
        bad = None
        for col in s.columns:
            sv, dv = s[col].tolist(), d[col].tolist()
            for i, (x, y) in enumerate(zip(sv, dv)):
                if not values_equal(x, y):
                    bad = (col, i, x, y)
                    break
            if bad:
                break
        if bad:
            col, i, x, y = bad
            print(f"{name}: VALUE_MISMATCH col={col} row={i} spark={x!r} duck={y!r}")
            n_fail += 1
        else:
            print(f"{name}: MATCH rows={len(s)}")
            n_pass += 1
    print(f"\n== {n_pass} match, {n_fail} fail, {n_rows_only} rows-only ==")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())

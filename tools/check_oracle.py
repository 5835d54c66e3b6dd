#!/usr/bin/env python3
"""Local replica of the driver's DuckDB-oracle differential check.

Usage: after `sbt "runMain graft.Verify <sfDir> <outDir>"`, run
    python3 tools/check_oracle.py <sfDir> <outDir>

For each query result parquet under outDir, runs the matching oracle SQL
from oracle_sql.json in DuckDB over the same sf tables, sorts columns by
name + rows by all columns, and compares cell-exact (floats byte-exact,
which is what our DECIMAL-routed aggregation guarantees).
"""
import json
import math
import os
import sys

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part",
          "orders", "lineitem", "events", "documents", "embeddings"]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), kind="mergesort",
                        na_position="first").reset_index(drop=True)
    return df


def cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    try:
        if pd.isna(a) and pd.isna(b):
            return True
        if pd.isna(a) or pd.isna(b):
            return False
    except (TypeError, ValueError):
        pass
    if isinstance(a, float) or isinstance(b, float):
        # Driver hashes are dtype-sensitive: an int64 Spark column vs a
        # float64 oracle column (e.g. DuckDB HUGEINT SUM -> pandas float64)
        # fails on the driver even when every value is numerically equal.
        if isinstance(a, float) != isinstance(b, float):
            return False
        try:
            return float(a) == float(b) or (math.isnan(float(a)) and math.isnan(float(b)))
        except (TypeError, ValueError):
            return False
    return str(a) == str(b)


def main(sf_dir: str, out_dir: str) -> int:
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    with open(os.path.join(out_dir, "oracle_sql.json")) as f:
        oracles = json.load(f)

    results = {}
    for name in sorted(os.listdir(out_dir)):
        qdir = os.path.join(out_dir, name)
        if not os.path.isdir(qdir):
            continue
        spark_df = pd.concat(
            [pd.read_parquet(os.path.join(qdir, f))
             for f in sorted(os.listdir(qdir)) if f.endswith(".parquet")],
            ignore_index=True)
        if name not in oracles:
            results[name] = f"NO-ORACLE rows={len(spark_df)}"
            continue
        try:
            duck_df = con.execute(oracles[name]).df()
        except Exception as e:  # noqa: BLE001
            results[name] = f"ORACLE-SQL-ERROR {e}"
            continue
        s, d = canon(spark_df), canon(duck_df)
        if list(s.columns) != list(d.columns):
            results[name] = f"COLUMN-MISMATCH spark={list(s.columns)} duck={list(d.columns)}"
            continue
        if len(s) != len(d):
            results[name] = f"ROWCOUNT-MISMATCH spark={len(s)} duck={len(d)}"
            continue
        bad = None
        for col in s.columns:
            sv, dv = s[col].tolist(), d[col].tolist()
            for i, (x, y) in enumerate(zip(sv, dv)):
                if not cells_equal(x, y):
                    bad = f"CELL-MISMATCH col={col} row={i} spark={x!r} duck={y!r}"
                    break
            if bad:
                break
        results[name] = bad or f"OK rows={len(s)}"

    n_hash = sum(1 for v in results.values() if v.startswith("OK"))
    n_rowsonly = sum(1 for v in results.values() if v.startswith("NO-ORACLE"))
    n_ok = n_hash + n_rowsonly
    for k, v in results.items():
        mark = "  " if v.startswith(("OK", "NO-ORACLE")) else "XX"
        print(f"{mark} {k}: {v}")
    suffix = (f" ({n_hash} hash-green + {n_rowsonly} rows-only)"
              if n_rowsonly else " (all hash-green)")
    print(f"\n{n_ok}/{len(results)} pass{suffix}")
    return 0 if n_ok == len(results) else 1


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

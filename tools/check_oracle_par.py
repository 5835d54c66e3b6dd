#!/usr/bin/env python3
"""Parallel, timeout-guarded variant of check_oracle.py for the heavy
sf0.1 full-surface pass: one subprocess per query (duckdb is single-
connection CPU-bound on the brute-force oracles; process parallelism
plus a per-query wall budget keeps one quadratic oracle from stalling
the whole sweep). Timeouts are reported separately from mismatches —
the affected oracles are the deliberately-O(n^2) brute-force baselines,
whose Spark sides are verified at sf0.01 and row-checked here.

Usage: check_oracle_par.py <sfDir> <outDir> [timeout_s] [procs]
"""
import os
import subprocess
import sys
from concurrent.futures import ProcessPoolExecutor, as_completed

TOOLS_DIR = os.path.dirname(os.path.abspath(__file__))

CHILD = """
import sys
sys.path.insert(0, {tools!r})
from check_oracle import canon, cells_equal, TABLES
import duckdb, json, os
import pandas as pd
sf_dir, out_dir, name = {sf!r}, {out!r}, {name!r}
con = duckdb.connect()
con.execute("SET enable_progress_bar = false")
for t in TABLES:
    p = os.path.join(sf_dir, t + ".parquet")
    if os.path.exists(p):
        con.execute("CREATE VIEW " + t + " AS SELECT * FROM '" + p + "'")
oracles = json.load(open(os.path.join(out_dir, "oracle_sql.json")))
qdir = os.path.join(out_dir, name)
spark_df = pd.concat([pd.read_parquet(os.path.join(qdir, f))
    for f in sorted(os.listdir(qdir)) if f.endswith(".parquet")],
    ignore_index=True)
if name not in oracles:
    print("NO-ORACLE rows=" + str(len(spark_df))); raise SystemExit(0)
try:
    duck_df = con.execute(oracles[name]).df()
except Exception as e:
    print("ORACLE-SQL-ERROR " + str(e)); raise SystemExit(0)
s, d = canon(spark_df), canon(duck_df)
if list(s.columns) != list(d.columns):
    print("COLUMN-MISMATCH spark=" + str(list(s.columns))
          + " duck=" + str(list(d.columns))); raise SystemExit(0)
if len(s) != len(d):
    print("ROWCOUNT-MISMATCH spark=" + str(len(s))
          + " duck=" + str(len(d))); raise SystemExit(0)
bad = None
for col in s.columns:
    for i, (x, y) in enumerate(zip(s[col].tolist(), d[col].tolist())):
        if not cells_equal(x, y):
            bad = ("CELL-MISMATCH col=" + col + " row=" + str(i)
                   + " spark=" + repr(x) + " duck=" + repr(y))
            break
    if bad:
        break
print(bad or "OK rows=" + str(len(s)))
"""


def run_one(args):
    sf_dir, out_dir, name, timeout = args
    code = CHILD.format(tools=TOOLS_DIR, sf=sf_dir, out=out_dir, name=name)
    try:
        r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                           text=True, timeout=timeout)
        out = r.stdout.strip()
        if not out:
            tail = r.stderr.strip().splitlines()
            out = "CHILD-ERROR " + (tail[-1] if tail else "empty output")
        return name, out
    except subprocess.TimeoutExpired:
        return name, f"TIMEOUT >{timeout}s"


def main(sf_dir, out_dir, timeout=600, procs=10):
    names = sorted(n for n in os.listdir(out_dir)
                   if os.path.isdir(os.path.join(out_dir, n)))
    results = {}
    with ProcessPoolExecutor(procs) as ex:
        futs = {ex.submit(run_one, (sf_dir, out_dir, n, timeout)): n
                for n in names}
        done = 0
        for fut in as_completed(futs):
            name, res = fut.result()
            results[name] = res
            done += 1
            print(f"[{done}/{len(names)}] {name}: {res}", flush=True)
    n_hash = sum(1 for v in results.values() if v.startswith("OK"))
    n_rowsonly = sum(1 for v in results.values() if v.startswith("NO-ORACLE"))
    ok = n_hash + n_rowsonly
    to = sum(1 for v in results.values() if v.startswith("TIMEOUT"))
    bad = {k: v for k, v in results.items()
           if not v.startswith(("OK", "NO-ORACLE", "TIMEOUT"))}
    suffix = (f" ({n_hash} hash-green + {n_rowsonly} rows-only)"
              if n_rowsonly else " (all hash-green)")
    print(f"\n{ok}/{len(names)} pass{suffix}, {to} timeout, "
          f"{len(bad)} mismatch", flush=True)
    for k, v in sorted(bad.items()):
        print(f"XX {k}: {v}", flush=True)
    return 0 if not bad else 1


if __name__ == "__main__":
    a = sys.argv
    sys.exit(main(a[1], a[2],
                  int(a[3]) if len(a) > 3 else 600,
                  int(a[4]) if len(a) > 4 else 10))

#!/usr/bin/env python3
"""Time-boxed per-query wrapper around tools/selfcheck.py semantics.

Usage: selfcheck_timeboxed.py <verifyOutDir> <sfDir> <perQueryTimeoutSec> [skipListFile]

Runs each oracle query in its own subprocess with a hard timeout, so
quadratic DuckDB oracles (exact all-pairs at sf0.1) report TIMEOUT instead
of stalling the whole sweep. Prints the same PASS/FAIL lines.
"""
import json, subprocess, sys, os

WORKER = r'''
import json, sys
from glob import glob
import duckdb, pandas as pd

out_dir, sf_dir, name = sys.argv[1], sys.argv[2], sys.argv[3]
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]
con = duckdb.connect()
for t in TABLES:
    con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
sql = json.load(open(f"{out_dir}/oracle_sql.json"))[name]

def canon(df):
    df = df.reindex(sorted(df.columns), axis=1)
    key = df.astype(str)
    order = key.sort_values(by=list(df.columns)).index
    return df.loc[order].reset_index(drop=True)

want = con.sql(sql).df()
files = sorted(glob(f"{out_dir}/{name}/*.parquet"))
if not files:
    print(f"FAIL {name}: no spark output"); sys.exit(1)
got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
w, g = canon(want), canon(got)
if list(w.columns) != list(g.columns):
    print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}"); sys.exit(1)
if len(w) != len(g):
    print(f"FAIL {name}: rows {len(g)} != {len(w)}"); sys.exit(1)
if not w.astype(str).equals(g.astype(str)):
    print(f"FAIL {name}: value mismatch"); sys.exit(1)
print(f"PASS {name} ({len(g)} rows)")
'''

def main():
    out_dir, sf_dir, tmo = sys.argv[1], sys.argv[2], int(sys.argv[3])
    done = set()
    if len(sys.argv) > 4 and os.path.exists(sys.argv[4]):
        for line in open(sys.argv[4]):
            if line.startswith("PASS "):
                done.add(line.split()[1])
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    n_pass = n_fail = n_tmo = 0
    for name in sorted(oracle):
        if name in done:
            n_pass += 1
            continue
        try:
            r = subprocess.run([sys.executable, "-c", WORKER, out_dir, sf_dir, name],
                               timeout=tmo, capture_output=True, text=True)
            sys.stdout.write(r.stdout or f"FAIL {name}: {r.stderr.strip()[-200:]}\n")
            sys.stdout.flush()
            if r.returncode == 0: n_pass += 1
            else: n_fail += 1
        except subprocess.TimeoutExpired:
            print(f"TIMEOUT {name} (> {tmo}s oracle — quadratic DuckDB form)", flush=True)
            n_tmo += 1
    print(f"SUMMARY pass={n_pass} fail={n_fail} timeout={n_tmo}")

if __name__ == "__main__":
    main()

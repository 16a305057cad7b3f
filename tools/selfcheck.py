#!/usr/bin/env python3
"""Local stand-in for the driver's DuckDB-oracle compare.

Usage: python3 tools/selfcheck.py <verifyOutDir> <sfDir>

Reads <verifyOutDir>/oracle_sql.json, runs each SQL in DuckDB with the sf
tables registered as views, loads the Spark result parquet from
<verifyOutDir>/<name>/, canonicalizes both sides (columns sorted by name,
rows sorted by all columns), and reports match/mismatch per query.

`check_one` is the single compare implementation — selfcheck_timeboxed.py
imports it so the two sweeps cannot drift (r14 review: an inlined copy had
silently dropped the dtype-drift WARN and the per-column/per-row mismatch
pinpointing).
"""
import json
import sys
from glob import glob

import duckdb
import pandas as pd

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def connect(sf_dir: str):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _canon_col(s: pd.Series) -> pd.Series:
    """Dtype-stable string form (ADVICE r14): int64 1 and float64 1.0 must
    render identically, so a dtype drift between engines sorts both frames
    into the SAME row order and surfaces as the dtype WARN — not as a
    spurious value FAIL at whatever row the divergent orderings first
    misalign. Integers stay exact (no float round-trip); integral floats
    below 2**53 drop the ".0"."""
    if pd.api.types.is_integer_dtype(s):
        return s.map(lambda v: "nan" if pd.isna(v) else str(int(v)))
    if pd.api.types.is_float_dtype(s):
        def fmt(v):
            if pd.isna(v):
                return "nan"
            f = float(v)
            return str(int(f)) if f.is_integer() and abs(f) < 2**53 else repr(f)
        return s.map(fmt)
    # object/bool columns: a MISSING value reads back as None from Spark
    # parquet and as NaN from duckdb.df() — same logical NULL, different
    # str() ("None" vs "nan"), which not only fails the value compare but
    # silently DERAILS the canonical row ordering and misreports mismatches
    # on unrelated rows (r16 sweep). One spelling for every null-ish value.
    def fmt_obj(v):
        if v is None:
            return "nan"
        try:
            if pd.isna(v):
                return "nan"
        except (TypeError, ValueError):
            pass  # pd.isna on arrays/lists raises or vectorizes — not null
        return str(v)
    return s.map(fmt_obj)


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    # canonical per-column strings for a dtype-stable total ordering
    key = pd.DataFrame({c: _canon_col(df[c]) for c in df.columns})
    order = key.sort_values(by=list(df.columns)).index
    return df.loc[order].reset_index(drop=True)


def check_one(con, out_dir: str, name: str, sql: str):
    """Compare one query. Returns (passed: bool, lines: list[str])."""
    want = con.sql(sql).df()
    files = sorted(glob(f"{out_dir}/{name}/*.parquet"))
    if not files:
        return False, [f"FAIL {name}: no spark output"]
    got = pd.concat([pd.read_parquet(f) for f in files], ignore_index=True)
    w, g = canon(want), canon(got)
    if list(w.columns) != list(g.columns):
        return False, [f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}"]
    if len(w) != len(g):
        return False, [f"FAIL {name}: rows {len(g)} != {len(w)}"]
    dtype_warns = []  # collect ALL dtype drifts, not just the last column's
    for c in w.columns:
        wa, ga = w[c], g[c]
        if str(wa.dtype) != str(ga.dtype):
            # dtype mismatch may still hash-differ driver-side; flag it
            dtype_warns.append(f"dtype {c}: spark={ga.dtype} duck={wa.dtype}")
        eq = (_canon_col(wa) == _canon_col(ga))
        if not eq.all():
            i = eq.idxmin()
            return False, [f"FAIL {name}: value {c}[{i}]: spark={ga[i]!r} duck={wa[i]!r}"]
    if dtype_warns:
        return True, [f"WARN {name}: rows match but {d}" for d in dtype_warns] + [
            f"PASS {name} ({len(g)} rows, dtype warning)"]
    if len(g) == 0:
        # 0 == 0 is a real match, but a query whose engine AND oracle both
        # return nothing proves nothing about either — make the vacuity
        # impossible to miss in the sweep transcript (r17 checker audit)
        return True, [f"PASS {name} (0 rows — VACUOUS: both sides empty)"]
    return True, [f"PASS {name} ({len(g)} rows)"]


def main(out_dir: str, sf_dir: str) -> int:
    con = connect(sf_dir)
    oracle = json.load(open(f"{out_dir}/oracle_sql.json"))
    failures = 0
    for name, sql in sorted(oracle.items()):
        try:
            ok, lines = check_one(con, out_dir, name, sql)
            for line in lines:
                print(line)
            if not ok:
                failures += 1
        except Exception as e:  # noqa: BLE001
            print(f"ERROR {name}: {e}")
            failures += 1
    print(f"{'ALL PASS' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1], sys.argv[2]))

#!/usr/bin/env python3
"""Planted-bug MUTATION test of the oracle checker (VERDICT r16 #4).

The DuckDB oracle compare (tools/selfcheck.py::check_one) is the single
point of trust for 239 catalog rows — a checker bug that reports PASS on a
real divergence greens both engines silently. This harness plants known
divergences into fake "Spark outputs" and asserts the checker CATCHES each
one (and, just as deliberately, asserts what it is DOCUMENTED to accept:
row-order changes, int→float dtype drift with equal values, and the two
known blind spots below).

Usage: python3 tools/selfcheck_mutation.py [sfDir]   (default sf0.001)

Known, documented blind spots asserted here so a behavior change is loud:
  * NaN-vs-NULL in float columns: pandas reads a parquet NULL back as NaN
    in a float64 column, so a Spark NULL where the oracle computed NaN (or
    vice versa) compares equal. Inherent to the pandas float dtype; every
    oracle that can produce NaN/NULL pins the distinction engine-side in a
    ScalaTest contract instead (DESIGN.md r16 NULL/NaN contracts).
  * Both-sides-empty passes (vacuously true). selfcheck now tags these
    'VACUOUS' in the transcript; CORRECTNESS_r16 had zero such rows.
"""
import json
import os
import shutil
import sys
import tempfile

import duckdb

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
import selfcheck  # noqa: E402


def write_parquet(con, out_dir, name, sql, params=None):
    d = f"{out_dir}/{name}"
    os.makedirs(d, exist_ok=True)
    con.execute(f"COPY ({sql}) TO '{d}/data.parquet' (FORMAT PARQUET)", params or [])


def main(sf_dir: str) -> int:
    out_dir = tempfile.mkdtemp(prefix="selfcheck-mutation-")
    con = selfcheck.connect(sf_dir)
    base = "SELECT l_orderkey AS k, l_quantity AS q, l_returnflag AS c FROM lineitem WHERE l_orderkey < 200"
    cases = {}  # name -> (oracle_sql, spark_sql, expect_pass, expect_substr)

    # 0. control: byte-identical output must PASS
    cases["m_correct"] = (base, base, True, "PASS")
    # 1. one flipped value must FAIL (the "flip a hash" mutation)
    cases["m_value_flip"] = (
        base,
        base.replace("l_quantity AS q",
                     "CASE WHEN l_orderkey = 1 THEN l_quantity + 1 ELSE l_quantity END AS q"),
        False, "value")
    # 2. a dropped row must FAIL on the row count
    cases["m_row_drop"] = (base, base + " AND l_linenumber <> 1", False, "rows")
    # 3. a duplicated row must FAIL on the row count
    cases["m_row_extra"] = (
        base, base + " UNION ALL (" + base + " LIMIT 1)", False, "rows")
    # 4. a renamed column must FAIL on the schema
    cases["m_col_rename"] = (base, base.replace("AS q", "AS q2"), False, "columns")
    # 5. row-order shuffle must PASS — the compare canonicalizes ordering
    cases["m_row_order"] = (base, base + " ORDER BY c DESC, k DESC", True, "PASS")
    # 6. int→float dtype drift with equal values must PASS **with a WARN**
    cases["m_dtype_drift"] = (
        base, base.replace("l_orderkey AS k", "CAST(l_orderkey AS DOUBLE) AS k"),
        True, "WARN")
    # 7. NULL where the oracle has a value must FAIL
    cases["m_null_vs_value"] = (
        base,
        base.replace("l_quantity AS q",
                     "CASE WHEN l_orderkey = 1 THEN NULL ELSE l_quantity END AS q"),
        False, None)
    # 8. KNOWN BLIND SPOT (documented): NaN vs NULL in a float column
    #    passes — pandas reads both back as NaN. Asserted so any checker
    #    change that closes (or widens) the hole is visible here.
    cases["m_nan_vs_null"] = (
        "SELECT 1 AS k, CAST('NaN' AS DOUBLE) AS q",
        "SELECT 1 AS k, CAST(NULL AS DOUBLE) AS q",
        True, None)
    # 9. KNOWN VACUITY: both sides empty passes, tagged VACUOUS
    cases["m_empty_both"] = (base + " AND 1=0", base + " AND 1=0", True, "VACUOUS")

    oracle = {n: o for n, (o, _, _, _) in cases.items()}
    with open(f"{out_dir}/oracle_sql.json", "w") as f:
        json.dump(oracle, f)
    for n, (_, spark_sql, _, _) in cases.items():
        write_parquet(con, out_dir, n, spark_sql)

    violations = 0
    for n, (o_sql, _, expect_pass, expect_substr) in sorted(cases.items()):
        ok, lines = selfcheck.check_one(con, out_dir, n, o_sql)
        text = "\n".join(lines)
        status = "ok"
        if ok != expect_pass:
            status = f"VIOLATION: expected {'PASS' if expect_pass else 'FAIL'}, got {'PASS' if ok else 'FAIL'}"
            violations += 1
        elif expect_substr and expect_substr not in text:
            status = f"VIOLATION: expected '{expect_substr}' in output"
            violations += 1
        print(f"{n:<18} expected={'PASS' if expect_pass else 'FAIL'} got={'PASS' if ok else 'FAIL'} {status}")
        if status != "ok":
            print("  " + text.replace("\n", "\n  "))

    shutil.rmtree(out_dir, ignore_errors=True)
    print("MUTATION " + ("ALL OK" if violations == 0 else f"{violations} VIOLATIONS"))
    return 1 if violations else 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"))

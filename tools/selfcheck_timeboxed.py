#!/usr/bin/env python3
"""Time-boxed per-query wrapper around tools/selfcheck.py.

Usage: selfcheck_timeboxed.py <verifyOutDir> <sfDir> <perQueryTimeoutSec> [skipListFile]

Runs each oracle query in its own subprocess with a hard timeout, so
quadratic DuckDB oracles (exact all-pairs at sf0.1) report TIMEOUT instead
of stalling the whole sweep. The compare itself is selfcheck.check_one —
imported, not copied, so the two sweeps report identical PASS/WARN/FAIL
diagnostics (r14 review).
"""
import json, subprocess, sys, os

# Worker: one query per process. sys.argv = [out_dir, sf_dir, name, tools_dir]
WORKER = r'''
import json, sys
out_dir, sf_dir, name, tools_dir = sys.argv[1], sys.argv[2], sys.argv[3], sys.argv[4]
sys.path.insert(0, tools_dir)
import selfcheck
con = selfcheck.connect(sf_dir)
sql = json.load(open(f"{out_dir}/oracle_sql.json"))[name]
ok, lines = selfcheck.check_one(con, out_dir, name, sql)
for line in lines:
    print(line)
sys.exit(0 if ok else 1)
'''


def main():
    out_dir, sf_dir, tmo = sys.argv[1], sys.argv[2], int(sys.argv[3])
    tools_dir = os.path.dirname(os.path.abspath(__file__))
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
            r = subprocess.run(
                [sys.executable, "-c", WORKER, out_dir, sf_dir, name, tools_dir],
                timeout=tmo, capture_output=True, text=True)
            out = r.stdout or f"FAIL {name}: {r.stderr.strip()[-200:]}\n"
            sys.stdout.write(out)
            sys.stdout.flush()
            # The printed verdict is authoritative: check_one prints PASS as
            # its last act before exit(0), so a nonzero rc after a PASS line
            # is an interpreter/duckdb teardown crash, not a compare failure
            # — count it as pass but surface the rc and stderr tail so it is
            # never silent (and never anonymous in the summary).
            verdict_pass = ("PASS " in out) and ("FAIL" not in out)
            if r.returncode != 0 and verdict_pass:
                print(f"NOTE {name}: worker exited rc={r.returncode} AFTER printing its "
                      f"verdict (teardown crash); stderr tail: {r.stderr.strip()[-200:]}")
            if verdict_pass: n_pass += 1
            else: n_fail += 1
        except subprocess.TimeoutExpired:
            print(f"TIMEOUT {name} (> {tmo}s oracle — quadratic DuckDB form)", flush=True)
            n_tmo += 1
    print(f"SUMMARY pass={n_pass} fail={n_fail} timeout={n_tmo}")


if __name__ == "__main__":
    main()

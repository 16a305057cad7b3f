#!/usr/bin/env python3
"""Adversarial-fixture builder for the oracle ROBUSTNESS sweep (r15).

The pristine sf* fixtures are ASCII, non-empty, and zero-norm-free — so an
engine/oracle divergence that only triggers on a degenerate row stays green
forever (the class the r14 advice caught on the ANN oracles' zero-norm
cosines). This builds a COPY of a fixture with the degenerate rows planted:

  documents  +4: empty text, whitespace-only, single word, non-ASCII
                 (combining accent) near-dup
  embeddings +2: zero-norm vector, denormal-norm vector

and the sweep is then the normal Verify + selfcheck over the copy:

  python3 tools/advfixture.py /root/testdata/sf0.001 /tmp/testdata-adv
  sbt -batch "runMain graft.Verify /tmp/testdata-adv /tmp/verify-adv"
  python3 tools/selfcheck.py /tmp/verify-adv /tmp/testdata-adv

Any FAIL is a latent contract divergence the pristine fixture hides. The
r15 run found four: a DIVIDE_BY_ZERO job kill in text_quality (Spark 4
ANSI throws even for double/0 — one empty doc in 100 TB killed the job),
a NULL-vs-0 empty-fold mismatch in the token-count oracle, and
codepoint-vs-byte modeling in both multimodal oracles. All fixed; the full
catalog is green on the adversarial fixture since r15.
"""
import os
import shutil
import sys

import duckdb

COPY_TABLES = ["region", "nation", "customer", "supplier", "part",
               "orders", "lineitem", "events"]


def build(src: str, dst: str) -> None:
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    for t in COPY_TABLES:
        shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    con = duckdb.connect()
    base = con.sql(f"SELECT max(doc_id) FROM '{src}/documents.parquet'").fetchone()[0] + 1
    con.sql(f"""
COPY (
  SELECT * FROM '{src}/documents.parquet'
  UNION ALL SELECT {base + 0}, '', 'en', 'srcadv', 0
  UNION ALL SELECT {base + 1}, '   ', 'en', 'srcadv', 3
  UNION ALL SELECT {base + 2}, 'solitary', 'en', 'srcadv', 8
  UNION ALL SELECT {base + 3}, 'the fast key ordé sort', 'es', 'srcadv', 22
) TO '{dst}/documents.parquet' (FORMAT PARQUET)""")
    vbase = con.sql(f"SELECT max(vec_id) FROM '{src}/embeddings.parquet'").fetchone()[0] + 1
    con.sql(f"""
COPY (
  SELECT * FROM '{src}/embeddings.parquet'
  UNION ALL SELECT {vbase + 0},
    list_transform(range(64), x -> CAST(0.0 AS FLOAT)), 0
  UNION ALL SELECT {vbase + 1},
    list_transform(range(64), x -> CAST(CASE WHEN x = 0 THEN 1e-30 ELSE 0.0 END AS FLOAT)), 1
) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)""")
    n_docs = con.sql(f"SELECT count(*) FROM '{dst}/documents.parquet'").fetchone()[0]
    n_vecs = con.sql(f"SELECT count(*) FROM '{dst}/embeddings.parquet'").fetchone()[0]
    print(f"built {dst}: documents={n_docs} embeddings={n_vecs}")


if __name__ == "__main__":
    build(sys.argv[1], sys.argv[2])

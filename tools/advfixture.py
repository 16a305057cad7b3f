#!/usr/bin/env python3
"""Adversarial-fixture builder for the oracle ROBUSTNESS sweep (r15).

The pristine sf* fixtures are ASCII, non-empty, and zero-norm-free — so an
engine/oracle divergence that only triggers on a degenerate row stays green
forever (the class the r14 advice caught on the ANN oracles' zero-norm
cosines). This builds a COPY of a fixture with the degenerate rows planted:

  documents  +4: empty text, whitespace-only, single word, non-ASCII
                 (combining accent) near-dup
  documents  +3 (r16): NULL text (NULL n_chars too — the malformed-row
                 class; the pinned contract is SQL NULL-transparency,
                 see DESIGN.md r16), astral-plane unicode (surrogate
                 pairs in UTF-16 engines: emoji + Deseret + a combining
                 ZWJ sequence), and a >1 MB single document (row-size
                 stress: one doc larger than a parquet page)
  embeddings +2: zero-norm vector, denormal-norm vector
  embeddings +3 (r16): NaN component, +Inf component, -Inf/mixed
                 component (IEEE-754 propagation parity between engines)
  events    +10 (r16): the pristine events table has NO duplicate
                 (user_id, ts) pairs, no negative/half-cent values, and
                 props is always well-formed {"k": n} — so every window
                 tie-break, round-half, and JSON-miss path in the event
                 oracles is dead code against it. Planted: a triple
                 same-instant (user_id, ts) collision (one with a
                 missing JSON key), a lone single-event user (empty
                 windows, twap span=0), an exact-30-min session-gap
                 boundary chain (merge-vs-split rule), a negative value,
                 a half-cent value, NULL props, and a pre-1970 event
                 (DuckDB `//` floors, integer div truncates — negative
                 epochs adjudicate which semantics the engine pinned).
                 Malformed (non-JSON) props is NOT planted: DuckDB's
                 json_extract_string throws on it while Spark's
                 get_json_object returns NULL, so no oracle can run —
                 that contract is pinned engine-side in a spec instead.

The sweep is TWO-TIER (r16): the >1 MB doc makes the O(n²) all-pairs
ORACLES (exact Jaccard ground truth etc.) computationally infeasible in
DuckDB — 125k pair rows each carrying ~160k-element shingle lists OOMs
the oracle process, which is precisely why the engine fences those exact
forms behind scale twins. So:

  # tier 1 — ENGINE ROBUSTNESS: full fixture incl. the 1 MB doc;
  # every query must COMPLETE (no hang, no crash) — selfcheck not run
  python3 tools/advfixture.py /root/testdata/sf0.001 /tmp/testdata-adv
  sbt -batch "runMain graft.Verify /tmp/testdata-adv /tmp/verify-adv"
  # PASS = zero lines in /tmp/verify-adv/_failures.json

  # tier 2 — ORACLE AGREEMENT: same fixture minus the big doc
  python3 tools/advfixture.py /root/testdata/sf0.001 /tmp/testdata-adv-nobig --no-big-doc
  sbt -batch "runMain graft.Verify /tmp/testdata-adv-nobig /tmp/verify-adv-nobig"
  python3 tools/selfcheck.py /tmp/verify-adv-nobig /tmp/testdata-adv-nobig

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
               "orders", "lineitem"]


def build(src: str, dst: str, big_doc: bool = True) -> None:
    shutil.rmtree(dst, ignore_errors=True)
    os.makedirs(dst)
    for t in COPY_TABLES:
        shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    con = duckdb.connect()
    base = con.sql(f"SELECT max(doc_id) FROM '{src}/documents.parquet'").fetchone()[0] + 1
    # >1 MB single document: realistic prose-shaped filler (words + line
    # breaks) so line/shingle operators do real work on it, not one token
    big_text = " ".join(
        f"chunk{i % 977} weights {i % 53} gradient" + ("\n" if i % 17 == 0 else "")
        for i in range(40000))
    assert len(big_text) > 1_000_000
    big_row = f"UNION ALL SELECT {base + 6}, ?, 'en', 'srcadv', ?" if big_doc else ""
    con.execute(f"""
COPY (
  SELECT * FROM '{src}/documents.parquet'
  UNION ALL SELECT {base + 0}, '', 'en', 'srcadv', 0
  UNION ALL SELECT {base + 1}, '   ', 'en', 'srcadv', 3
  UNION ALL SELECT {base + 2}, 'solitary', 'en', 'srcadv', 8
  UNION ALL SELECT {base + 3}, 'the fast key ordé sort', 'es', 'srcadv', 22
  UNION ALL SELECT {base + 4}, NULL, 'en', 'srcadv', NULL
  UNION ALL SELECT {base + 5}, 'emoji 😀😀 pair 𐐷 mixed family 👩‍👩‍👧 end', 'en', 'srcadv', 33
  {big_row}
) TO '{dst}/documents.parquet' (FORMAT PARQUET)""", ([big_text, len(big_text)] if big_doc else []))
    ebase = con.sql(f"SELECT max(event_id) FROM '{src}/events.parquet'").fetchone()[0] + 1
    con.sql(f"""
COPY (
  SELECT * FROM '{src}/events.parquet'
  -- triple same-instant (user_id, ts) collision: every (ts, event_id)
  -- lexicographic tie-break in the asof/window oracles goes live
  UNION ALL SELECT {ebase + 0}, TIMESTAMP '2024-01-15 12:00:00', 3, 'click', 5.0, '{{"k": 1}}'
  UNION ALL SELECT {ebase + 1}, TIMESTAMP '2024-01-15 12:00:00', 3, 'purchase', 7.5, '{{"k": 2}}'
  UNION ALL SELECT {ebase + 2}, TIMESTAMP '2024-01-15 12:00:00', 3, 'click', 2.25, '{{}}'
  -- lone single-event user: 1-row windows, twap span_us = 0 exclusion
  UNION ALL SELECT {ebase + 3}, TIMESTAMP '2024-01-20 08:00:00', 9999, 'view', 0.005, NULL
  -- exact session-gap boundary chain: +30:00 merges (strict > rule),
  -- +30:00.000001 splits
  UNION ALL SELECT {ebase + 4}, TIMESTAMP '2024-01-21 00:00:00', 9998, 'click', 1.0, '{{"k": 3}}'
  UNION ALL SELECT {ebase + 5}, TIMESTAMP '2024-01-21 00:30:00', 9998, 'view', 2.0, '{{"k": 4}}'
  UNION ALL SELECT {ebase + 6}, TIMESTAMP '2024-01-21 01:00:00.000001', 9998, 'purchase', 3.0, '{{"k": 5}}'
  -- negative + half-cent values: round-half-away parity
  UNION ALL SELECT {ebase + 7}, TIMESTAMP '2024-01-22 10:00:00', 5, 'error', -12.345, '{{"k": -6}}'
  UNION ALL SELECT {ebase + 8}, TIMESTAMP '2024-01-22 11:00:00', 5, 'error', 0.125, '{{"k": 7}}'
  -- pre-1970: negative epoch adjudicates floor-vs-truncate bucketing
  UNION ALL SELECT {ebase + 9}, TIMESTAMP '1969-12-31 23:45:00', 9997, 'view', 1.0, '{{"k": 8}}'
) TO '{dst}/events.parquet' (FORMAT PARQUET)""")
    vbase = con.sql(f"SELECT max(vec_id) FROM '{src}/embeddings.parquet'").fetchone()[0] + 1
    con.sql(f"""
COPY (
  SELECT * FROM '{src}/embeddings.parquet'
  UNION ALL SELECT {vbase + 0},
    list_transform(range(64), x -> CAST(0.0 AS FLOAT)), 0
  UNION ALL SELECT {vbase + 1},
    list_transform(range(64), x -> CAST(CASE WHEN x = 0 THEN 1e-30 ELSE 0.0 END AS FLOAT)), 1
  UNION ALL SELECT {vbase + 2},
    list_transform(range(64), x -> CAST(CASE WHEN x = 0 THEN 'NaN'::FLOAT ELSE 0.25 END AS FLOAT)), 2
  UNION ALL SELECT {vbase + 3},
    list_transform(range(64), x -> CAST(CASE WHEN x = 1 THEN 'Infinity'::FLOAT ELSE 0.25 END AS FLOAT)), 3
  UNION ALL SELECT {vbase + 4},
    list_transform(range(64), x -> CAST(CASE WHEN x = 2 THEN '-Infinity'::FLOAT WHEN x = 3 THEN 'Infinity'::FLOAT ELSE 0.25 END AS FLOAT)), 4
) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)""")
    n_docs = con.sql(f"SELECT count(*) FROM '{dst}/documents.parquet'").fetchone()[0]
    n_vecs = con.sql(f"SELECT count(*) FROM '{dst}/embeddings.parquet'").fetchone()[0]
    n_ev = con.sql(f"SELECT count(*) FROM '{dst}/events.parquet'").fetchone()[0]
    print(f"built {dst}: documents={n_docs} embeddings={n_vecs} events={n_ev}")


if __name__ == "__main__":
    build(sys.argv[1], sys.argv[2], big_doc="--no-big-doc" not in sys.argv[3:])

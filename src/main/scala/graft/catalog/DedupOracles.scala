package graft.catalog

/** DuckDB oracle SQL for the deduplication query family —
  * split out of [[graft.SparkEntry]] (round 11) so the catalog stays
  * reviewable as it grows. Keys map 1:1 to `SparkEntry.queries`;
  * bodies are byte-identical to the pre-split map (CatalogDump-diffed).
  */
private[graft] object DedupOracles {

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  /** Exact all-pairs new-vs-corpus ground truth, shared verbatim by
    * `dedup_incremental` and `dedup_incremental_store`.
    */
  private val IncrementalDedupOracle: String =
    """WITH sh AS (
      | SELECT doc_id, list_distinct(list_transform(range(1, len(w) - 1),
      |   i -> w[CAST(i AS INTEGER)] || ' ' || w[CAST(i+1 AS INTEGER)] || ' ' || w[CAST(i+2 AS INTEGER)])) AS s
      | FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents)
      | WHERE len(w) >= 3)
      |SELECT * FROM (
      | SELECT n.doc_id AS id_new, c.doc_id AS id_corpus,
      |  CAST(len(list_intersect(n.s, c.s)) AS BIGINT) AS n_inter,
      |  CAST(len(list_intersect(n.s, c.s)) AS DOUBLE)
      |    / CAST(len(n.s) + len(c.s) - len(list_intersect(n.s, c.s)) AS DOUBLE) AS jaccard
      | FROM sh n JOIN sh c ON n.doc_id >= 400 AND c.doc_id < 400)
      |WHERE jaccard >= 0.6""".stripMargin


  /** Exact all-pairs increment-vs-corpus ground truth on the planted-copy
    * embedding corpus, shared verbatim by `dedup_embedding_incremental` and
    * its bucket-store round trip (the [[IncrementalDedupOracle]] pattern).
    * Sound for the LSH path because verified pairs ⊆ exact pairs and
    * `dedup_embedding_lsh_check` proves recall 1.0 on this corpus.
    */
  private val EmbeddingIncrementalOracle: String =
    """WITH base AS (SELECT vec_id, embedding FROM embeddings),
      |planted AS (
      | SELECT vec_id + 100000 AS vec_id,
      |  list_concat([CAST(0.0 AS FLOAT)], embedding[2:]) AS embedding
      | FROM base WHERE vec_id < 20),
      |n AS (
      | SELECT vec_id, embedding,
      |  sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
      |    (acc, x) -> acc + x)) AS norm
      | FROM planted),
      |c AS (
      | SELECT vec_id, embedding,
      |  sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
      |    (acc, x) -> acc + x)) AS norm
      | FROM base)
      |SELECT * FROM (
      | SELECT n.vec_id AS id_new, c.vec_id AS id_corpus,
      |  list_reduce(list_transform(range(1, len(n.embedding) + 1),
      |    i -> CAST(n.embedding[CAST(i AS INTEGER)] AS DOUBLE) * CAST(c.embedding[CAST(i AS INTEGER)] AS DOUBLE)),
      |    (acc, x) -> acc + x) / (n.norm * c.norm) AS cosine
      | FROM n CROSS JOIN c
      | WHERE n.norm > 0 AND n.norm < 'Infinity'::DOUBLE AND c.norm > 0 AND c.norm < 'Infinity'::DOUBLE)
      |WHERE cosine >= 0.7""".stripMargin


  /** Exact word-3-gram Jaccard ground truth at τ=0.6 as a CTE block
    * yielding `pairs(id_a, id_b, n_inter, jaccard)` — shared by
    * `dedup_minhash` / `dedup_jaccard_exact` and, via composition, by the
    * clustering / canonical / edit-distance / pipeline-summary oracles, so
    * none of them can drift from the pair ground truth.
    *
    * BUCKETED form (r14, VERDICT r13 #3): the naive `sh a JOIN sh b ON
    * a.doc_id < b.doc_id` + `list_intersect` all-pairs is Ω(n²) and
    * time-boxes out of the sf0.1 adjudication. This rewrite applies the
    * engine's own discipline to the oracle: explode distinct shingles,
    * equi-join on the shingle, and COUNT matches per pair — algebraically
    * identical output (a qualifying pair at τ=0.6 shares ≥1 shingle, and
    * distinct-shingle match counts ARE the intersection size), verified
    * row-identical to the all-pairs form at sf0.01 and 65× faster there
    * (5.2 s → 0.08 s; sf0.1: 150 s+ timeout → 0.45 s).
    */
  private[catalog] val JaccardPairsCtes: String =
    """sh AS (
      | SELECT DISTINCT doc_id,
      |  w[CAST(i AS INTEGER)] || ' ' || w[CAST(i+1 AS INTEGER)] || ' ' || w[CAST(i+2 AS INTEGER)] AS g
      | FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents) d,
      |  LATERAL unnest(generate_series(1, len(d.w) - 2)) t(i)),
      |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS m FROM sh GROUP BY doc_id),
      |cand AS (
      | SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS n_inter
      | FROM sh a JOIN sh b ON a.g = b.g AND a.doc_id < b.doc_id
      | GROUP BY 1, 2),
      |pairs AS (
      | SELECT id_a, id_b, n_inter,
      |  CAST(n_inter AS DOUBLE) / CAST(sa.m + sb.m - n_inter AS DOUBLE) AS jaccard
      | FROM cand JOIN sz sa ON id_a = sa.doc_id JOIN sz sb ON id_b = sb.doc_id
      | WHERE CAST(n_inter AS DOUBLE) / CAST(sa.m + sb.m - n_inter AS DOUBLE) >= 0.6)""".stripMargin

  private val JaccardPairsOracle: String =
    s"WITH $JaccardPairsCtes\nSELECT id_a, id_b, n_inter, jaccard FROM pairs"

  /** Exact all-pairs embedding cosine ground truth at τ=0.4 as a CTE block
    * yielding `pairs(id_a, id_b, cosine)` — shared by `dedup_embedding` /
    * `dedup_semantic` / `dedup_semantic_clusters`. The exact contract is
    * Ω(n²) by nature (a 0.4 threshold slices a continuum — no bucketing
    * shortcut exists), so the r14 speedup is per-pair: DuckDB's native
    * `list_inner_product` replaces the interpreted
    * `list_reduce(list_transform(...))` lambda fold — verified EXACTLY
    * equal (same summation order, bit-identical doubles over all 124,750
    * sf0.1-subset pairs) and ~4× faster, bringing the sf0.1 oracle back
    * under the 150 s adjudication box (175 s → ~40 s).
    */
  /** Squared L2 distance between two BIGINT micro-vectors as an exact
    * integer fold — order-fixed but order-irrelevant (integer addition
    * commutes), the same determinism argument as the Spark side's
    * row-local argmin.
    */
  private def kmDist(qCol: String, cCol: String): String =
    s"list_reduce(list_transform(range(1, len($qCol) + 1), " +
      s"i -> ($qCol[CAST(i AS INTEGER)] - $cCol[CAST(i AS INTEGER)]) * " +
      s"($qCol[CAST(i AS INTEGER)] - $cCol[CAST(i AS INTEGER)])), (acc, x) -> acc + x)"

  /** One Lloyd ASSIGNMENT as a CTE: nearest centroid from `centsCte`,
    * ties to the smallest centroid index (ORDER BY dist, cluster_id) —
    * the Spark side's struct-ordered array_min, spelled relationally.
    */
  private def kmAssign(name: String, centsCte: String): String =
    s"""$name AS (
       | SELECT vec_id, q, cluster_id, dist FROM (
       |  SELECT vec_id, q, cluster_id, dist,
       |   row_number() OVER (PARTITION BY vec_id ORDER BY dist, cluster_id) AS rn
       |  FROM (
       |   SELECT p.vec_id, p.q, c.j AS cluster_id, ${kmDist("p.q", "c.c")} AS dist
       |   FROM kq p CROSS JOIN $centsCte c))
       | WHERE rn = 1)""".stripMargin

  /** One Lloyd UPDATE as a CTE pair: exact integer per-dim sums, then
    * centroid component `trunc(Σq/n)` — one IEEE division of an exactly-
    * representable bigint sum, bit-identical to the Spark driver's
    * `(s.toDouble / n).toLong`. An empty cluster keeps its previous
    * centroid (COALESCE against `prevCents`).
    */
  private def kmUpdate(name: String, assignCte: String, prevCents: String): String =
    s"""${name}_s AS (
       | SELECT cluster_id, dim, sum(v) AS s, count(*) AS n FROM (
       |  SELECT cluster_id, unnest(range(0, len(q))) AS dim, unnest(q) AS v
       |  FROM $assignCte)
       | GROUP BY cluster_id, dim),
       |$name AS (
       | SELECT p.j, COALESCE(m.c, p.c) AS c
       | FROM $prevCents p LEFT JOIN (
       |  SELECT cluster_id AS j,
       |   list(CAST(trunc(CAST(s AS DOUBLE) / n) AS BIGINT) ORDER BY dim) AS c
       |  FROM ${name}_s GROUP BY cluster_id) m ON p.j = m.j)""".stripMargin

  /** Deterministic integer-micros k-means, unrolled to the catalog spec
    * (k=8, two Lloyd updates, final assignment a3) — the full
    * `Dedup.kmeansMicroAssign` iteration replayed relationally: quantize
    * to `round(x·1e6)` bigints, seed with the 8 smallest vec_ids in rank
    * order, assign → update → assign → update → assign. Every stage is
    * either exact integer arithmetic or a single IEEE division, so the
    * oracle reproduces the engine BIT-identically, partitioning-free.
    */
  private val KmeansCtes: String =
    s"""kq AS (
       | SELECT vec_id,
       |  list_transform(embedding, x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
       | FROM embeddings
       | WHERE sqrt(list_inner_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
       |   list_transform(embedding, x -> CAST(x AS DOUBLE)))) < 'Infinity'::DOUBLE),
       |c0 AS (
       | SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS BIGINT) AS j, q AS c
       | FROM (SELECT vec_id, q FROM kq ORDER BY vec_id LIMIT 8)),
       |${kmAssign("a1", "c0")},
       |${kmUpdate("c1", "a1", "c0")},
       |${kmAssign("a2", "c1")},
       |${kmUpdate("c2", "a2", "c1")},
       |${kmAssign("a3", "c2")}""".stripMargin

  private val CosinePairsCtes: String =
    """e AS (
      | SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
      |  sqrt(list_inner_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
      |                          list_transform(embedding, x -> CAST(x AS DOUBLE)))) AS norm
      | FROM embeddings
      | WHERE norm > 0 AND norm < 'Infinity'::DOUBLE),
      |pairs AS (
      | SELECT * FROM (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |   list_inner_product(a.emb, b.emb) / (a.norm * b.norm) AS cosine
      |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
      | WHERE cosine >= 0.4)""".stripMargin


  val sql: Map[String, String] = Map(
    "dedup_exact" ->
      "SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_copies FROM documents GROUP BY text",
    "dedup_exact_hash" ->
      """SELECT min(doc_id) AS keep_id, CAST(count(*) AS BIGINT) AS n_copies, fp31, fp37 FROM (
        | SELECT doc_id,
        |  list_reduce(list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS fp31,
        |  list_reduce(list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 37 + x) % 998244353) AS fp37
        | FROM documents)
        |GROUP BY fp31, fp37""".stripMargin,
    "corpus_diff" ->
      """WITH v1 AS (SELECT doc_id, text FROM documents),
        |v2 AS (
        | SELECT doc_id, CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END AS text
        | FROM v1 WHERE doc_id % 17 != 0
        | UNION ALL
        | SELECT doc_id + 500000, text FROM v1 WHERE doc_id % 19 = 0),
        |f1 AS (SELECT doc_id,
        |  list_reduce(list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS fp31_old,
        |  list_reduce(list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 37 + x) % 998244353) AS fp37_old
        | FROM v1),
        |f2 AS (SELECT doc_id,
        |  list_reduce(list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) AS fp31_new,
        |  list_reduce(list_transform(string_split(text, ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 37 + x) % 998244353) AS fp37_new
        | FROM v2)
        |SELECT doc_id, status, fp31_old, fp31_new FROM (
        | SELECT doc_id,
        |  CASE WHEN fp31_new IS NULL THEN 'removed'
        |       WHEN fp31_old IS NULL THEN 'added'
        |       WHEN fp31_old = fp31_new AND fp37_old = fp37_new THEN 'unchanged'
        |       ELSE 'changed' END AS status,
        |  fp31_old, fp31_new
        | FROM f1 FULL JOIN f2 USING (doc_id))
        |WHERE status != 'unchanged'""".stripMargin,
    "dedup_minhash" -> JaccardPairsOracle,
    "dedup_jaccard_exact" -> JaccardPairsOracle,
    // exact ground truth for the incremental path: every new×corpus pair
    "dedup_incremental" -> IncrementalDedupOracle,
    // the store round trip must be lossless: the SAME ground-truth value,
    // bound once so the two oracles can never drift apart
    "dedup_incremental_store" -> IncrementalDedupOracle,
    "dedup_clusters" ->
      (s"WITH RECURSIVE $JaccardPairsCtes,\n" +
      """edges AS (
        | SELECT id_a AS src, id_b AS dst FROM pairs
        | UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(id, label) AS (
        | SELECT src, src FROM edges
        | UNION
        | SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id)
        |SELECT id AS doc_id, min(label) AS cluster_id FROM reach GROUP BY id""".stripMargin),
    "dedup_canonical" ->
      (s"WITH RECURSIVE $JaccardPairsCtes,\n" +
      """edges AS (
        | SELECT id_a AS src, id_b AS dst FROM pairs
        | UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(id, label) AS (
        | SELECT src, src FROM edges
        | UNION
        | SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id),
        |clusters AS (SELECT id AS doc_id, min(label) AS cluster_id FROM reach GROUP BY id),
        |reps AS (
        | SELECT min(doc_id) AS doc_id, CAST(count(*) AS BIGINT) AS group_size
        | FROM clusters GROUP BY cluster_id)
        |SELECT doc_id, group_size FROM reps
        |UNION ALL
        |SELECT d.doc_id, CAST(1 AS BIGINT) AS group_size
        |FROM documents d LEFT JOIN clusters c ON d.doc_id = c.doc_id
        |WHERE c.doc_id IS NULL""".stripMargin),
    "dedup_canonical_best" ->
      (s"WITH RECURSIVE $JaccardPairsCtes,\n" +
      """edges AS (
        | SELECT id_a AS src, id_b AS dst FROM pairs
        | UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(id, label) AS (
        | SELECT src, src FROM edges
        | UNION
        | SELECT e.src, r.label FROM edges e JOIN reach r ON e.dst = r.id),
        |clusters AS (SELECT id AS doc_id, min(label) AS cluster_id FROM reach GROUP BY id),
        |q AS (
        | SELECT doc_id,
        |  CASE WHEN len(text) = 0 THEN CAST(-1 AS BIGINT)
        |   ELSE CAST(len(regexp_extract_all(text, '[a-zA-Z]')) AS BIGINT) * 1000 // len(text)
        |  END AS quality_key
        | FROM documents),
        |ranked AS (
        | SELECT c.cluster_id, c.doc_id, q.quality_key,
        |  row_number() OVER (PARTITION BY c.cluster_id
        |    ORDER BY q.quality_key DESC, c.doc_id ASC) AS rn,
        |  count(*) OVER (PARTITION BY c.cluster_id) AS group_size
        | FROM clusters c JOIN q USING (doc_id))
        |SELECT doc_id, quality_key, CAST(group_size AS BIGINT) AS group_size
        |FROM ranked WHERE rn = 1
        |UNION ALL
        |SELECT q.doc_id, q.quality_key, CAST(1 AS BIGINT) AS group_size
        |FROM q LEFT JOIN clusters c ON q.doc_id = c.doc_id
        |WHERE c.doc_id IS NULL""".stripMargin),
    "dedup_simhash" ->
      """WITH sh AS (
        | SELECT doc_id, unnest(list_distinct(list_transform(range(1, len(w) - 1),
        |   i -> w[CAST(i AS INTEGER)] || ' ' || w[CAST(i+1 AS INTEGER)] || ' ' || w[CAST(i+2 AS INTEGER)]))) AS shingle
        | FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS w FROM documents)
        | WHERE len(w) >= 3),
        |h AS (
        | SELECT doc_id,
        |  list_reduce(list_transform(string_split(shingle, ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) * 1073741824
        |  + (list_reduce(list_transform(string_split(shingle, ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 37 + x) % 998244353) % 1073741824) AS hh
        | FROM sh),
        |bits AS (
        | SELECT doc_id, j, sum(CASE WHEN (hh >> CAST(j AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS s
        | FROM h, range(60) r(j) GROUP BY doc_id, j)
        |SELECT doc_id, CAST(sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INTEGER)) ELSE 0 END) AS BIGINT) AS simhash
        |FROM bits GROUP BY doc_id""".stripMargin,
    "dedup_semantic_clusters" ->
      (s"WITH RECURSIVE $CosinePairsCtes,\n" +
      """edges AS (
        | SELECT id_a AS src, id_b AS dst FROM pairs
        | UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(id, label) AS (
        | SELECT src, src FROM edges
        | UNION
        | SELECT e2.src, r.label FROM edges e2 JOIN reach r ON e2.dst = r.id)
        |SELECT id AS vec_id, min(label) AS cluster_id FROM reach GROUP BY id""".stripMargin),
    "dedup_semantic" ->
      (s"WITH RECURSIVE $CosinePairsCtes,\n" +
      """edges AS (
        | SELECT id_a AS src, id_b AS dst FROM pairs
        | UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(id, label) AS (
        | SELECT src, src FROM edges
        | UNION
        | SELECT e2.src, r.label FROM edges e2 JOIN reach r ON e2.dst = r.id),
        |clusters AS (SELECT id AS vec_id, min(label) AS cluster_id FROM reach GROUP BY id),
        |reps AS (
        | SELECT min(vec_id) AS vec_id, CAST(count(*) AS BIGINT) AS group_size
        | FROM clusters GROUP BY cluster_id)
        |SELECT vec_id, group_size FROM reps
        |UNION ALL
        |SELECT vec_id, CAST(1 AS BIGINT) FROM embeddings
        |ANTI JOIN clusters USING (vec_id)""".stripMargin),
    "dedup_embedding" ->
      s"WITH $CosinePairsCtes\nSELECT id_a, id_b, cosine FROM pairs",
    // r12: shingle sets as 60-bit packed fingerprints on BOTH engines (the
    // text_containment recipe) — the Spark side ships 8-byte longs through
    // the verify joins, the oracle computes the identical integers
    "dedup_ngram" ->
      """WITH sh AS (
        | SELECT DISTINCT doc_id,
        |  list_reduce(list_transform(string_split(substr(text, CAST(i AS INTEGER), 5), ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 31 + x) % 1000000007) * 1073741824
        |  + list_reduce(list_transform(string_split(substr(text, CAST(i AS INTEGER), 5), ''), c -> CAST(ascii(c) AS BIGINT)),
        |    (acc, x) -> (acc * 37 + x) % 998244353) % 1073741824 AS s
        | FROM documents, LATERAL unnest(generate_series(1, greatest(len(text) - 4, 1))) t(i)),
        |sz AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS m FROM sh GROUP BY doc_id),
        |pair AS (
        | SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(count(*) AS BIGINT) AS n_inter
        | FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
        | GROUP BY 1, 2)
        |SELECT id_a, id_b, n_inter,
        | CAST(n_inter AS DOUBLE) / CAST(sa.m + sb.m - n_inter AS DOUBLE) AS jaccard
        |FROM pair
        | JOIN sz sa ON id_a = sa.doc_id
        | JOIN sz sb ON id_b = sb.doc_id
        |WHERE CAST(n_inter AS DOUBLE) / CAST(sa.m + sb.m - n_inter AS DOUBLE) >= 0.6""".stripMargin,
    "dedup_edit_distance" ->
      (s"WITH $JaccardPairsCtes\n" +
      """SELECT id_a, id_b,
        | CAST(levenshtein(da.text, db.text) AS BIGINT) AS edit_dist
        |FROM pairs
        | JOIN documents da ON da.doc_id = id_a
        | JOIN documents db ON db.doc_id = id_b""".stripMargin),
    // recomputes the exact near-dup pairs of the planted-copy corpus and
    // asserts the LSH path found each one (recall 1.0, per-pair)
    "dedup_semantic_lsh" ->
      """WITH RECURSIVE base AS (SELECT vec_id, embedding FROM embeddings),
        |planted AS (
        | SELECT vec_id + 100000 AS vec_id,
        |  list_concat([CAST(0.0 AS FLOAT)], embedding[2:]) AS embedding
        | FROM base WHERE vec_id < 20),
        |aug AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
        |e AS (
        | SELECT vec_id, embedding,
        |  sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        |    (acc, x) -> acc + x)) AS norm
        | FROM aug
        | WHERE norm > 0 AND norm < 'Infinity'::DOUBLE),
        |pairs AS (
        | SELECT id_a, id_b FROM (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |   list_reduce(list_transform(range(1, len(a.embedding) + 1),
        |     i -> CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE) * CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)),
        |     (acc, x) -> acc + x) / (a.norm * b.norm) AS cosine
        |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
        | WHERE cosine >= 0.7),
        |edges AS (
        | SELECT id_a AS src, id_b AS dst FROM pairs
        | UNION ALL SELECT id_b, id_a FROM pairs),
        |reach(id, label) AS (
        | SELECT src, src FROM edges
        | UNION
        | SELECT e2.src, r.label FROM edges e2 JOIN reach r ON e2.dst = r.id)
        |SELECT id AS vec_id, min(label) AS cluster_id FROM reach GROUP BY id""".stripMargin,
    "cluster_kmeans" ->
      s"WITH $KmeansCtes\nSELECT vec_id, cluster_id, dist AS dist_sq FROM a3",
    // SemDeDup: within-cluster exact cosine, greedy min-id keep rule —
    // a vector is dropped iff a smaller-id same-cluster partner clears
    // the threshold; zero-norm vectors never pair (NaN discipline)
    "dedup_semdedup" ->
      (s"WITH $KmeansCtes,\n" +
      """e AS (
        | SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS emb,
        |  sqrt(list_inner_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |                          list_transform(embedding, x -> CAST(x AS DOUBLE)))) AS norm
        | FROM embeddings),
        |dropped AS (
        | SELECT DISTINCT ab.vec_id
        | FROM a3 aa JOIN a3 ab ON aa.cluster_id = ab.cluster_id AND aa.vec_id < ab.vec_id
        |  JOIN e ea ON ea.vec_id = aa.vec_id
        |  JOIN e eb ON eb.vec_id = ab.vec_id
        | WHERE ea.norm > 0 AND ea.norm < 'Infinity'::DOUBLE AND eb.norm > 0 AND eb.norm < 'Infinity'::DOUBLE
        |  AND list_inner_product(ea.emb, eb.emb) / (ea.norm * eb.norm) >= 0.4)
        |SELECT a3.vec_id, a3.cluster_id, (dropped.vec_id IS NULL) AS kept
        |FROM a3 LEFT JOIN dropped ON a3.vec_id = dropped.vec_id""".stripMargin),
    "dedup_embedding_incremental" -> EmbeddingIncrementalOracle,
    "dedup_embedding_incremental_store" -> EmbeddingIncrementalOracle,
    "dedup_embedding_lsh_check" ->
      """WITH base AS (SELECT vec_id, embedding FROM embeddings),
        |planted AS (
        | SELECT vec_id + 100000 AS vec_id,
        |  list_concat([CAST(0.0 AS FLOAT)], embedding[2:]) AS embedding
        | FROM base WHERE vec_id < 20),
        |aug AS (SELECT * FROM base UNION ALL SELECT * FROM planted),
        |e AS (
        | SELECT vec_id, embedding,
        |  sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        |    (acc, x) -> acc + x)) AS norm
        | FROM aug
        | WHERE norm > 0 AND norm < 'Infinity'::DOUBLE)
        |SELECT id_a, id_b, TRUE AS lsh_found FROM (
        | SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |  list_reduce(list_transform(range(1, len(a.embedding) + 1),
        |    i -> CAST(a.embedding[CAST(i AS INTEGER)] AS DOUBLE) * CAST(b.embedding[CAST(i AS INTEGER)] AS DOUBLE)),
        |    (acc, x) -> acc + x) / (a.norm * b.norm) AS cosine
        | FROM e a JOIN e b ON a.vec_id < b.vec_id)
        |WHERE cosine >= 0.7""".stripMargin,
  )
}

package graft.catalog

/** DuckDB oracle SQL for the ANN / embedding-similarity query family —
  * split out of [[graft.SparkEntry]] (round 11) so the catalog stays
  * reviewable as it grows. Keys map 1:1 to `SparkEntry.queries`;
  * bodies are byte-identical to the pre-split map (CatalogDump-diffed).
  */
private[graft] object AnnOracles {

  // r15 (ADVICE r14): every exact-cosine oracle excludes zero-norm vectors
  // (`WHERE norm > 0` on the corpus CTE, which the query CTEs inherit) —
  // the engine's `withNorm` filters them on the Spark side, and the oracle
  // must PIN that exclusion contract rather than silently depend on the
  // fixture containing no zero-norm embedding (DuckDB would rank the NaN
  // cosines first the moment one appeared).
  val sql: Map[String, String] = Map(
    // r10 continuation: ratio-margin mining — candidate pairs are the
    // union of forward/backward k-NN; neighborhood sums fold top-k
    // cosines in (c DESC, id ASC) rank order, matching graft_topk's
    // emission order exactly; ranks resolve on the micro-rounded margin
    "ann_margin_mining" ->
      """WITH n AS (
        | SELECT * FROM (
        |  SELECT vec_id, embedding,
        |   sqrt(list_reduce(list_transform(embedding, v -> CAST(v AS DOUBLE) * CAST(v AS DOUBLE)), (a, b) -> a + b)) AS nm
        |  FROM embeddings)
        | WHERE nm > 0 AND nm < 'Infinity'::DOUBLE),
        |x AS (SELECT vec_id AS xi, embedding AS xe, nm AS xn FROM n WHERE vec_id % 10 = 0),
        |y AS (SELECT vec_id AS yi, embedding AS ye, nm AS yn FROM n WHERE vec_id % 10 != 0),
        |s AS (
        | SELECT xi, yi,
        |  list_reduce(list_transform(range(1, len(xe) + 1),
        |    i -> CAST(xe[CAST(i AS INTEGER)] AS DOUBLE) * CAST(ye[CAST(i AS INTEGER)] AS DOUBLE)),
        |    (a, b) -> a + b) / (xn * yn) AS c
        | FROM x CROSS JOIN y),
        |rx AS (SELECT xi, yi, c, row_number() OVER (PARTITION BY xi ORDER BY c DESC, yi ASC) AS rkx FROM s),
        |ry AS (SELECT xi, yi, c, row_number() OVER (PARTITION BY yi ORDER BY c DESC, xi ASC) AS rky FROM s),
        |dx AS (SELECT xi, list_reduce(list(c ORDER BY rkx), (a, b) -> a + b) AS dx FROM rx WHERE rkx <= 4 GROUP BY xi),
        |dy AS (SELECT yi, list_reduce(list(c ORDER BY rky), (a, b) -> a + b) AS dy FROM ry WHERE rky <= 4 GROUP BY yi),
        |cand AS (
        | SELECT xi, yi FROM rx WHERE rkx <= 4
        | UNION
        | SELECT xi, yi FROM ry WHERE rky <= 4),
        |m AS (
        | SELECT cand.xi, cand.yi,
        |  CAST(round(1000000.0 * (8 * s.c) / (dx.dx + dy.dy)) AS BIGINT) AS margin_micro
        | FROM cand JOIN s ON s.xi = cand.xi AND s.yi = cand.yi
        | JOIN dx ON dx.xi = cand.xi JOIN dy ON dy.yi = cand.yi),
        |r2 AS (
        | SELECT *,
        |  row_number() OVER (PARTITION BY xi ORDER BY margin_micro DESC, yi ASC) AS rkx,
        |  row_number() OVER (PARTITION BY yi ORDER BY margin_micro DESC, xi ASC) AS rky
        | FROM m),
        |best AS (SELECT xi, yi, margin_micro FROM r2 WHERE rkx = 1),
        |besty AS (SELECT yi, xi AS bx FROM r2 WHERE rky = 1)
        |SELECT best.xi AS x_id, best.yi AS y_id, best.margin_micro,
        | besty.bx = best.xi AS is_mutual
        |FROM best JOIN besty ON besty.yi = best.yi""".stripMargin,
    "ann_topk" ->
      """WITH e AS (
        | SELECT * FROM (
        |  SELECT vec_id, embedding,
        |   sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        |     (acc, x) -> acc + x)) AS norm
        |  FROM embeddings)
        | WHERE norm > 0 AND norm < 'Infinity'::DOUBLE),
        |q AS (SELECT vec_id AS q_id, embedding AS q_emb, norm AS q_norm FROM e WHERE vec_id < 5),
        |s AS (
        | SELECT q.q_id, e.vec_id,
        |  list_reduce(list_transform(range(1, len(e.embedding) + 1),
        |    i -> CAST(q.q_emb[CAST(i AS INTEGER)] AS DOUBLE) * CAST(e.embedding[CAST(i AS INTEGER)] AS DOUBLE)),
        |    (acc, x) -> acc + x) / (q.q_norm * e.norm) AS cosine
        | FROM e CROSS JOIN q WHERE e.vec_id != q.q_id)
        |SELECT q_id, neighbor_id, rank FROM (
        | SELECT q_id, vec_id AS neighbor_id,
        |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS INTEGER) AS rank
        | FROM s)
        |WHERE rank <= 10""".stripMargin,
    // the ann_topk ground truth with the semi-hard band filter applied
    // before ranking — the mining contract is exact, not approximate
    "ann_hard_negatives" ->
      """WITH e AS (
        | SELECT * FROM (
        |  SELECT vec_id, embedding,
        |   sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        |     (acc, x) -> acc + x)) AS norm
        |  FROM embeddings)
        | WHERE norm > 0 AND norm < 'Infinity'::DOUBLE),
        |q AS (SELECT vec_id AS q_id, embedding AS q_emb, norm AS q_norm FROM e WHERE vec_id < 5),
        |s AS (
        | SELECT q.q_id, e.vec_id,
        |  list_reduce(list_transform(range(1, len(e.embedding) + 1),
        |    i -> CAST(q.q_emb[CAST(i AS INTEGER)] AS DOUBLE) * CAST(e.embedding[CAST(i AS INTEGER)] AS DOUBLE)),
        |    (acc, x) -> acc + x) / (q.q_norm * e.norm) AS cosine
        | FROM e CROSS JOIN q WHERE e.vec_id != q.q_id)
        |SELECT q_id, neighbor_id, rank FROM (
        | SELECT q_id, vec_id AS neighbor_id,
        |  CAST(row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS INTEGER) AS rank
        | FROM s WHERE cosine >= 0.1 AND cosine < 0.3)
        |WHERE rank <= 10""".stripMargin,
    "ann_recall" ->
      """WITH e AS (
        | SELECT * FROM (
        |  SELECT vec_id, embedding,
        |   sqrt(list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
        |     (acc, x) -> acc + x)) AS norm
        |  FROM embeddings)
        | WHERE norm > 0 AND norm < 'Infinity'::DOUBLE),
        |q AS (SELECT vec_id AS q_id, embedding AS q_emb, norm AS q_norm FROM e WHERE vec_id < 5),
        |s AS (
        | SELECT q.q_id, e.vec_id,
        |  list_reduce(list_transform(range(1, len(e.embedding) + 1),
        |    i -> CAST(q.q_emb[CAST(i AS INTEGER)] AS DOUBLE) * CAST(e.embedding[CAST(i AS INTEGER)] AS DOUBLE)),
        |    (acc, x) -> acc + x) / (q.q_norm * e.norm) AS cosine
        | FROM e CROSS JOIN q WHERE e.vec_id != q.q_id),
        |topk AS (
        | SELECT q_id, vec_id FROM (
        |  SELECT q_id, vec_id, row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id) AS rank
        |  FROM s)
        | WHERE rank <= 10)
        |SELECT q_id, CAST(count(*) AS BIGINT) AS n_hits FROM topk GROUP BY q_id""".stripMargin,
    "ann_ivf_check" ->
      """SELECT vec_id AS q_id, TRUE AS recall_floor_met
        |FROM embeddings WHERE vec_id < 5""".stripMargin,
    // r12: the recall gate over the hot-cell clustered twin corpus — both
    // paths run in Spark over the same derived table, the oracle pins the
    // gate's TRUE-per-query contract
    "ann_ivf_skew_check" ->
      """SELECT vec_id AS q_id, TRUE AS recall_floor_met
        |FROM embeddings WHERE vec_id < 5""".stripMargin,
    // r11: IVF-backed margin mining is gated on agreement with the exact
    // path (coverage / same-partner floor / no mutual-flag flips)
    "ann_margin_mining_ivf_check" ->
      """SELECT 'anchor_coverage_full' AS check_name, TRUE AS passed
        |UNION ALL SELECT 'partner_agreement_floor', TRUE
        |UNION ALL SELECT 'mutual_flag_consistent', TRUE""".stripMargin,
    "ann_ivf_store_check" ->
      """SELECT vec_id AS q_id, TRUE AS recall_floor_met
        |FROM embeddings WHERE vec_id < 5""".stripMargin,
    "ann_pq_check" ->
      """SELECT vec_id AS q_id, TRUE AS recall_floor_met
        |FROM embeddings WHERE vec_id < 5""".stripMargin,
    "ann_sq_check" ->
      """SELECT vec_id AS q_id, TRUE AS recall_floor_met
        |FROM embeddings WHERE vec_id < 5""".stripMargin,
    "ann_sq_store_check" ->
      """SELECT vec_id AS q_id, TRUE AS recall_floor_met
        |FROM embeddings WHERE vec_id < 5""".stripMargin,
    "ann_ivfpq_check" ->
      """SELECT vec_id AS q_id, TRUE AS recall_floor_met
        |FROM embeddings WHERE vec_id < 5""".stripMargin,
    "ann_ivfpq_store_check" ->
      """SELECT vec_id AS q_id, TRUE AS recall_floor_met
        |FROM embeddings WHERE vec_id < 5""".stripMargin,
    "ann_ivfpq_append_check" ->
      """SELECT vec_id AS q_id, TRUE AS recall_floor_met
        |FROM embeddings WHERE vec_id < 5""".stripMargin,
    "sample_coreset_check" ->
      """SELECT 'radii_consistent_independent_arithmetic' AS check_name, TRUE AS passed
        |UNION ALL SELECT 'radii_monotone', TRUE
        |UNION ALL SELECT 'centers_distinct', TRUE""".stripMargin,
    "ann_pq_store_check" ->
      """SELECT vec_id AS q_id, TRUE AS recall_floor_met
        |FROM embeddings WHERE vec_id < 5""".stripMargin,
    "embedding_gram" ->
      """WITH e AS (
        | SELECT list_transform(embedding,
        |   x -> CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS q
        | FROM embeddings
        | WHERE sqrt(list_inner_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |   list_transform(embedding, x -> CAST(x AS DOUBLE)))) < 'Infinity'::DOUBLE),
        |p AS (
        | SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j
        | FROM range(0, 64) t(i), range(0, 64) u(j) WHERE i <= j)
        |SELECT p.i, p.j,
        | CAST(sum(e.q[CAST(p.i + 1 AS INTEGER)] * e.q[CAST(p.j + 1 AS INTEGER)]) AS BIGINT) AS sum_qq
        |FROM e, p GROUP BY p.i, p.j""".stripMargin,
    "embedding_centroid" ->
      """SELECT label, dim,
        | CAST(sum(CAST(round(CAST(x AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT) AS sum_micros,
        | CAST(count(*) AS BIGINT) AS n
        |FROM (
        | SELECT label,
        |  unnest(range(0, len(embedding))) AS dim,
        |  unnest(list_transform(range(0, len(embedding)), i -> embedding[CAST(i + 1 AS INTEGER)])) AS x
        | FROM embeddings
        | WHERE sqrt(list_inner_product(list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |   list_transform(embedding, x -> CAST(x AS DOUBLE)))) < 'Infinity'::DOUBLE)
        |GROUP BY label, dim""".stripMargin,
  )
}

package graft.catalog

/** DuckDB oracle SQL for the sketch-estimator gate query family —
  * split out of [[graft.SparkEntry]] (round 11) so the catalog stays
  * reviewable as it grows. Keys map 1:1 to `SparkEntry.queries`;
  * bodies are byte-identical to the pre-split map (CatalogDump-diffed).
  */
private[graft] object SketchOracles {

  val sql: Map[String, String] = Map(
    "sketch_distinct_check" ->
      """SELECT l_returnflag,
        | CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        | CAST(count(DISTINCT l_orderkey) AS BIGINT) AS exact_orders,
        | TRUE AS parts_within_5pct, TRUE AS orders_within_5pct
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "sketch_freq_merge_check" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS exact_n,
        | TRUE AS estimate_exact
        |FROM events GROUP BY event_type""".stripMargin,
    "sketch_hll_merge_check" ->
      """SELECT l_returnflag,
        | CAST(count(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
        | TRUE AS parts_within_5pct
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "sketch_kll_merge_check" ->
      """WITH r AS (
        | SELECT l_returnflag, l_quantity,
        |  CAST(row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity, l_orderkey, l_linenumber) AS BIGINT) AS rn,
        |  count(*) OVER (PARTITION BY l_returnflag) AS n
        | FROM lineitem)
        |SELECT l_returnflag,
        | max(CASE WHEN rn = CAST(ceil(n * 0.45) AS BIGINT) THEN l_quantity END) AS lo,
        | max(CASE WHEN rn = CAST(ceil(n * 0.55) AS BIGINT) THEN l_quantity END) AS hi,
        | TRUE AS q50_within_rank_bounds
        |FROM r GROUP BY l_returnflag""".stripMargin,
    "sketch_theta_merge_check" ->
      """SELECT event_type,
        | CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
        | TRUE AS users_within_5pct
        |FROM events GROUP BY event_type""".stripMargin,
    "sketch_freq_check" ->
      """WITH tok AS (
        | SELECT unnest(regexp_split_to_array(trim(text), '\s+')) AS token
        | FROM documents),
        |hh AS (SELECT 'hh_' || CAST(i % 4 AS VARCHAR) AS token FROM range(16000) t(i)),
        |allt AS (SELECT token FROM tok UNION ALL SELECT token FROM hh),
        |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM allt),
        |exact AS (SELECT token, CAST(count(*) AS BIGINT) AS true_cnt
        |          FROM allt GROUP BY token)
        |SELECT e.token, e.true_cnt, n.n AS stream_len,
        | TRUE AS present_in_sketch, TRUE AS bounds_hold,
        | TRUE AS error_within_threshold
        |FROM exact e CROSS JOIN n WHERE e.true_cnt * 16 > n.n""".stripMargin,
    "sketch_theta_check" ->
      """WITH du AS (SELECT DISTINCT event_type, user_id FROM events),
        |cnt AS (SELECT event_type, count(*) AS n FROM du GROUP BY event_type),
        |ex AS (
        | SELECT x.event_type AS type_a, y.event_type AS type_b, count(*) AS exact_both
        | FROM du x JOIN du y ON x.user_id = y.user_id AND x.event_type < y.event_type
        | GROUP BY x.event_type, y.event_type)
        |SELECT ex.type_a, ex.type_b,
        | CAST(ex.exact_both AS BIGINT) AS exact_both,
        | CAST(ca.n + cb.n - ex.exact_both AS BIGINT) AS exact_either,
        | TRUE AS both_within_5pct, TRUE AS either_within_5pct
        |FROM ex
        | JOIN cnt ca ON ca.event_type = ex.type_a
        | JOIN cnt cb ON cb.event_type = ex.type_b""".stripMargin,
    "sketch_quantile_check" ->
      """WITH r AS (
        | SELECT l_returnflag, l_quantity,
        |  CAST(row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity, l_orderkey, l_linenumber) AS BIGINT) AS rn,
        |  count(*) OVER (PARTITION BY l_returnflag) AS n
        | FROM lineitem)
        |SELECT l_returnflag,
        | max(CASE WHEN rn = CAST(ceil(n * 0.45) AS BIGINT) THEN l_quantity END) AS lo,
        | max(CASE WHEN rn = CAST(ceil(n * 0.55) AS BIGINT) THEN l_quantity END) AS hi,
        | TRUE AS q50_within_rank_bounds
        |FROM r GROUP BY l_returnflag""".stripMargin,
  )
}

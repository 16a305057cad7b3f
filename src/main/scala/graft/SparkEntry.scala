package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.Relational

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.q1Agg(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2 (+ beyond-reference
    * operators). Names map 1:1 to [[oracleSql]] keys.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "s1_full_scan" -> (Relational.fullScan _),
    "s2_user_query" -> (Relational.userQuery _),
    "f1_partition_daily" -> (Relational.partitionDaily _),
    "f1_partition_monthly" -> (Relational.partitionMonthly _),
    "f1_partition_hourly" -> (Relational.partitionHourly _),
    "x1_range_split_union" -> (Relational.rangeSplitUnion _),
    "l1_limit_topk" -> (Relational.limitTopK _),
    "s4_minmax_bounds" -> (Relational.minMaxBounds _),
    "p4_type_projection" -> (Relational.typeProjection _),
    "a2_count" -> (Relational.countAll _),
    "q1_agg" -> (Relational.q1Agg _),
    "q3_join_agg" -> (Relational.q3JoinAgg _),
    "w1_window_topk" -> (Relational.windowTopK _),
    "set_except" -> (Relational.setExcept _),
    "events_hourly_agg" -> (Relational.eventsHourlyAgg _)
  )

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] = Map(
    "s1_full_scan" -> "SELECT * FROM lineitem",
    "s2_user_query" ->
      "SELECT * FROM (SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_totalprice > 150000.0) as user_sql_query WHERE 1=1",
    "f1_partition_daily" ->
      "SELECT * FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-11-05' AND l_shipdate < TIMESTAMP '1997-11-06'",
    "f1_partition_monthly" ->
      "SELECT * FROM lineitem WHERE l_shipdate >= TIMESTAMP '1997-11-01' AND l_shipdate < TIMESTAMP '1997-12-01'",
    "f1_partition_hourly" ->
      "SELECT event_id, user_id, event_type, ts FROM events WHERE ts >= TIMESTAMP '2024-01-01 06:00:00' AND ts < TIMESTAMP '2024-01-01 07:00:00'",
    "x1_range_split_union" -> "SELECT * FROM lineitem",
    "l1_limit_topk" ->
      "SELECT * FROM lineitem ORDER BY l_orderkey, l_linenumber LIMIT 100",
    "s4_minmax_bounds" ->
      "SELECT MIN(l_orderkey) AS min_s, MAX(l_orderkey) AS max_s FROM lineitem",
    "p4_type_projection" ->
      "SELECT l_orderkey, l_linenumber, CAST(epoch_ms(l_shipdate) AS BIGINT) AS ship_ms, CAST(l_linenumber AS BIGINT) AS line_long, l_returnflag = 'R' AS is_return FROM lineitem",
    "a2_count" -> "SELECT CAST(count(*) AS BIGINT) AS n FROM lineitem",
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus, CAST(count(*) AS BIGINT) AS n_rows,
        | CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
        | CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_price_cents
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,
    "q3_join_agg" ->
      """SELECT o_orderkey,
        | CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey ORDER BY revenue_cents DESC, o_orderkey LIMIT 10""".stripMargin,
    "w1_window_topk" ->
      """SELECT o_custkey, o_orderkey, CAST(rk AS INTEGER) AS rk FROM (
        | SELECT o_custkey, o_orderkey,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
        | FROM orders) WHERE rk <= 3""".stripMargin,
    "set_except" ->
      "SELECT o_custkey FROM orders EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'",
    "events_hourly_agg" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1, 2""".stripMargin
  )
}

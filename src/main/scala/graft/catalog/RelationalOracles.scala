package graft.catalog

/** DuckDB oracle SQL for the relational/TPC-H/window/set/stats/DQ/layout query family —
  * split out of [[graft.SparkEntry]] (round 11) so the catalog stays
  * reviewable as it grows. Keys map 1:1 to `SparkEntry.queries`;
  * bodies are byte-identical to the pre-split map (CatalogDump-diffed).
  */
private[graft] object RelationalOracles {

  /** Ground truth shared verbatim by `q_ntile` and its skew-safe twin —
    * bound once so the pair can never drift apart (the
    * [[IncrementalDedupOracle]] pattern).
    */
  private val NtileOracle: String =
    """SELECT c_custkey, c_mktsegment, cents,
      | CAST(ntile(10) OVER (PARTITION BY c_mktsegment ORDER BY cents DESC, c_custkey) AS BIGINT) AS decile
      |FROM (SELECT c_custkey, c_mktsegment,
      | CAST(round(c_acctbal * 100) AS BIGINT) AS cents FROM customer)""".stripMargin


  /** Shared verbatim by `q_rank_family` and its histogram skew twin. The
    * window orders by price ALONE — dense_rank/percent_rank/cume_dist are
    * tie-invariant, so no unique tiebreak is needed for determinism and
    * dense_rank keeps real semantics (see the operator scaladoc).
    */
  private val RankFamilyOracle: String =
    """SELECT o_custkey, o_orderkey,
      | CAST(dense_rank() OVER w AS BIGINT) AS dense_rk,
      | CAST(round(percent_rank() OVER w * 1000000) AS BIGINT) AS pct_rank_micros,
      | CAST(round(cume_dist() OVER w * 1000000) AS BIGINT) AS cume_dist_micros
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC)""".stripMargin


  /** Shared by `q_percentile_disc` and its skew-safe twin. */
  private val PercentileDiscOracle: String =
    """SELECT l_returnflag,
      | max(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN l_quantity END) AS p50_qty,
      | max(CASE WHEN rn = CAST(ceil(n * 0.95) AS BIGINT) THEN l_quantity END) AS p95_qty,
      | CAST(max(n) AS BIGINT) AS n
      |FROM (
      | SELECT l_returnflag, l_quantity,
      |  CAST(row_number() OVER (PARTITION BY l_returnflag ORDER BY l_quantity, l_orderkey, l_linenumber) AS BIGINT) AS rn,
      |  count(*) OVER (PARTITION BY l_returnflag) AS n
      | FROM lineitem)
      |GROUP BY l_returnflag""".stripMargin


  private val base: Map[String, String] = Map(
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
    // identical ground truth as w1 — the heap aggregate must reproduce the
    // window-function ranks exactly (score desc, id asc tiebreak)
    "q_grouped_topk" ->
      """SELECT o_custkey, o_orderkey, CAST(rk AS INTEGER) AS rk FROM (
        | SELECT o_custkey, o_orderkey,
        |  row_number() OVER (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey) AS rk
        | FROM orders) WHERE rk <= 3""".stripMargin,
    "set_except" ->
      "SELECT o_custkey FROM orders EXCEPT SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'",
    "q_full_outer" ->
      """WITH c AS (
        | SELECT c_nationkey AS nk_c, CAST(count(*) AS BIGINT) AS n_rich_cust
        | FROM customer WHERE c_acctbal > 9900 GROUP BY c_nationkey),
        |s AS (
        | SELECT s_nationkey AS nk_s, CAST(count(*) AS BIGINT) AS n_supp
        | FROM supplier GROUP BY s_nationkey)
        |SELECT coalesce(nk_c, nk_s) AS nationkey,
        | coalesce(n_rich_cust, 0) AS n_rich_cust,
        | coalesce(n_supp, 0) AS n_supp
        |FROM c FULL OUTER JOIN s ON nk_c = nk_s""".stripMargin,
    "q_unpivot" ->
      """WITH w AS (
        | SELECT l_returnflag,
        |  CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS qty_centi,
        |  CAST(count(*) AS BIGINT) AS n_rows
        | FROM lineitem GROUP BY l_returnflag)
        |SELECT l_returnflag, 'qty_centi' AS metric, qty_centi AS value FROM w
        |UNION ALL
        |SELECT l_returnflag, 'n_rows' AS metric, n_rows AS value FROM w""".stripMargin,
    "set_union" ->
      "SELECT o_custkey FROM orders WHERE o_orderstatus = 'O' UNION SELECT o_custkey FROM orders WHERE o_totalprice > 200000.0",
    "set_intersect_all" ->
      "SELECT o_custkey FROM orders WHERE o_orderstatus = 'O' INTERSECT ALL SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'",
    "set_except_all" ->
      "SELECT o_custkey FROM orders EXCEPT ALL SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'",
    "q_window_lead_lag" ->
      """SELECT user_id, event_id,
        | epoch_us(ts) - lag(epoch_us(ts), 1)
        |   OVER (PARTITION BY user_id ORDER BY ts, event_id) AS gap_us,
        | lead(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        |FROM events""".stripMargin,
    // RANGE frame on epoch-µs so both engines use the identical value
    // offset (an INTERVAL frame on a ns timestamp would differ in unit)
    "q_range_frame" ->
      """SELECT event_id, user_id,
        | CAST(count(*) OVER w AS BIGINT) AS n_trailing_1h,
        | CAST(sum(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS cents_trailing_1h
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        | RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)""".stripMargin,
    "q_ntile" -> NtileOracle,
    "q_rank_family" -> RankFamilyOracle,
    "q_rank_family_skew" -> RankFamilyOracle, // histogram twin: oracle shared verbatim,
    "q_ntile_skew" -> NtileOracle,
    "q_rollup" ->
      """SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders GROUP BY ROLLUP (o_orderstatus, o_orderpriority)""".stripMargin,
    "q_cube" ->
      """SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)""".stripMargin,
    "q_pivot" ->
      """SELECT l_returnflag,
        | CAST(sum(CASE WHEN l_linestatus = 'F' THEN CAST(round(l_extendedprice * 100) AS BIGINT) END) AS BIGINT) AS cents_F,
        | CAST(sum(CASE WHEN l_linestatus = 'O' THEN CAST(round(l_extendedprice * 100) AS BIGINT) END) AS BIGINT) AS cents_O
        |FROM lineitem GROUP BY l_returnflag""".stripMargin,
    "q_percentile_disc" -> PercentileDiscOracle,
    "q_percentile_disc_skew" -> PercentileDiscOracle,
    "q8_market_share" ->
      """WITH rev AS (
        | SELECT year(o.o_orderdate) AS o_year,
        |  CAST(round(l.l_extendedprice * 100) AS BIGINT)
        |    * (100 - CAST(round(l.l_discount * 100) AS BIGINT)) AS rev,
        |  sn.n_name AS sup_nation
        | FROM lineitem l
        | JOIN part p ON l.l_partkey = p.p_partkey AND p.p_type = 'PROMO'
        | JOIN orders o ON l.l_orderkey = o.o_orderkey
        | JOIN customer c ON o.o_custkey = c.c_custkey
        | JOIN nation cn ON c.c_nationkey = cn.n_nationkey
        | JOIN region r ON cn.n_regionkey = r.r_regionkey AND r.r_name = 'ASIA'
        | JOIN supplier s ON l.l_suppkey = s.s_suppkey
        | JOIN nation sn ON s.s_nationkey = sn.n_nationkey)
        |SELECT CAST(o_year AS BIGINT) AS o_year,
        | CAST(sum(CASE WHEN sup_nation = 'NATION_1' THEN rev ELSE 0 END) AS BIGINT) AS nation_rev,
        | CAST(sum(rev) AS BIGINT) AS total_rev,
        | CAST(sum(CASE WHEN sup_nation = 'NATION_1' THEN rev ELSE 0 END) * 1000
        |   // sum(rev) AS BIGINT) AS share_permille
        |FROM rev GROUP BY o_year""".stripMargin,
    "stats_trend" ->
      """WITH counts AS (
        | SELECT event_type, date_trunc('hour', ts) AS hour, CAST(count(*) AS BIGINT) AS y
        | FROM events GROUP BY 1, 2),
        |o AS (SELECT min(epoch_us(hour)) AS h0 FROM counts),
        |pts AS (
        | SELECT event_type, (epoch_us(hour) - h0) // 3600000000 AS x, y
        | FROM counts, o),
        |agg AS (
        | SELECT event_type, count(*) AS n_pts,
        |  CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
        |  CAST(sum(x * y) AS BIGINT) AS sxy, CAST(sum(x * x) AS BIGINT) AS sx2
        | FROM pts GROUP BY event_type)
        |SELECT event_type, n_pts, sx, sy,
        | (1000 * (n_pts * sxy - sx * sy)) // (n_pts * sx2 - sx * sx) AS slope_milli
        |FROM agg""".stripMargin,
    "link_fuzzy_names" ->
      """SELECT a.c_custkey AS key_a, a.c_name AS name_a,
        | b.c_custkey AS key_b, b.c_name AS name_b,
        | CAST(levenshtein(a.c_name, b.c_name) AS BIGINT) AS dist
        |FROM customer a JOIN customer b
        | ON a.c_custkey < b.c_custkey
        | AND levenshtein(a.c_name, b.c_name) <= 1""".stripMargin,
    "q16_supplier_variety" ->
      """SELECT p_brand, CAST(p_size AS BIGINT) AS p_size,
        | CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1'
        |GROUP BY p_brand, p_size""".stripMargin,
    "orders_lorenz" ->
      """WITH per AS (
        | SELECT o_custkey AS custkey,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
        | FROM orders GROUP BY 1),
        |dec AS (
        | SELECT *, CAST(ntile(10) OVER (ORDER BY cents DESC, custkey) AS BIGINT) AS decile
        | FROM per),
        |byd AS (
        | SELECT decile, count(*) AS n_customers, CAST(sum(cents) AS BIGINT) AS cents
        | FROM dec GROUP BY 1),
        |t AS (SELECT CAST(sum(cents) AS BIGINT) AS total FROM byd)
        |SELECT a.decile, CAST(a.n_customers AS BIGINT) AS n_customers,
        | a.cents AS decile_cents,
        | CAST(sum(b.cents) AS BIGINT) * 1000 // t.total AS cum_share_permille
        |FROM byd a JOIN byd b ON b.decile <= a.decile CROSS JOIN t
        |GROUP BY a.decile, a.n_customers, a.cents, t.total""".stripMargin,
    "customer_rfm" ->
      """WITH per AS (
        | SELECT o_custkey AS custkey, max(o_orderdate) AS last_order,
        |  count(*) AS frequency,
        |  CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS monetary_cents
        | FROM orders GROUP BY 1),
        |sc AS (
        | SELECT *,
        |  CAST(ntile(5) OVER (ORDER BY last_order, custkey) AS BIGINT) AS r_score,
        |  CAST(ntile(5) OVER (ORDER BY frequency, custkey) AS BIGINT) AS f_score,
        |  CAST(ntile(5) OVER (ORDER BY monetary_cents, custkey) AS BIGINT) AS m_score
        | FROM per)
        |SELECT custkey, last_order, CAST(frequency AS BIGINT) AS frequency,
        | monetary_cents, r_score, f_score, m_score,
        | r_score * 100 + f_score * 10 + m_score AS rfm
        |FROM sc""".stripMargin,
    "dq_freshness" ->
      """SELECT event_type, max(ts) AS latest_ts,
        | count(*) AS n_rows,
        | (epoch_us(TIMESTAMP '2024-02-01 00:00:00') - epoch_us(max(ts))) // 3600000000 AS lag_hours,
        | (epoch_us(TIMESTAMP '2024-02-01 00:00:00') - epoch_us(max(ts))) // 3600000000 <= 24 AS fresh
        |FROM events GROUP BY event_type""".stripMargin,
    "dq_kanonymity" ->
      """WITH g AS (
        | SELECT c_nationkey, c_mktsegment, count(*) AS c
        | FROM customer GROUP BY 1, 2)
        |SELECT CAST(5 AS BIGINT) AS k,
        | count(*) AS n_groups,
        | CAST(sum(c) AS BIGINT) AS n_rows,
        | CAST(min(c) AS BIGINT) AS k_anonymity,
        | CAST(sum(CASE WHEN c < 5 THEN c ELSE 0 END) AS BIGINT) AS rows_below_k,
        | CAST(sum(CASE WHEN c < 5 THEN c ELSE 0 END) AS BIGINT) * 1000 // CAST(sum(c) AS BIGINT) AS permille_below
        |FROM g""".stripMargin,
    "dq_battery" ->
      """WITH b AS (
        | SELECT count(*) AS n,
        |  sum(CASE WHEN l_shipdate IS NOT NULL THEN 1 ELSE 0 END) AS nn,
        |  sum(CASE WHEN l_returnflag IN ('A', 'N', 'R') THEN 1 ELSE 0 END) AS dom,
        |  sum(CASE WHEN l_quantity >= 1 AND l_quantity <= 50 THEN 1 ELSE 0 END) AS rng
        | FROM lineitem),
        |u AS (
        | SELECT sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS matched, sum(c) AS total
        | FROM (SELECT count(*) AS c FROM lineitem GROUP BY l_orderkey, l_linenumber)),
        |r AS (
        | SELECT count(*) AS matched FROM lineitem
        | WHERE l_orderkey IN (SELECT o_orderkey FROM orders)),
        |rows_out AS (
        | SELECT 'not_null:l_shipdate' AS check_name, nn AS matched, n AS total FROM b
        | UNION ALL
        | SELECT 'domain:l_returnflag', dom, n FROM b
        | UNION ALL
        | SELECT 'range:l_quantity:1..50', rng, n FROM b
        | UNION ALL
        | SELECT 'unique:l_orderkey+l_linenumber', matched, total FROM u
        | UNION ALL
        | SELECT 'ref:l_orderkey->orders', r.matched, b.n FROM r, b)
        |SELECT check_name, CAST(matched AS BIGINT) AS matched,
        | CAST(total AS BIGINT) AS total,
        | CAST(matched AS BIGINT) * 1000 // CAST(total AS BIGINT) AS metric_permille,
        | matched = total AS passed
        |FROM rows_out""".stripMargin,
    "layout_skipping" ->
      s"""WITH li AS (
        | SELECT l_orderkey, l_partkey, l_suppkey,
        |  ${graft.operators.Layout.zValueSql("l_partkey", "l_suppkey")} AS zval
        | FROM lineitem),
        |b AS (
        | SELECT min(zval) AS zmin, max(zval) AS zmax,
        |  min(l_orderkey) AS omin, max(l_orderkey) AS omax,
        |  min(l_partkey) AS pmin, max(l_partkey) AS pmax,
        |  min(l_suppkey) AS smin, max(l_suppkey) AS smax
        | FROM li),
        |zc AS (
        | SELECT (li.zval - b.zmin) // greatest(1, (b.zmax - b.zmin + 32) // 32) AS chunk,
        |  min(l_partkey) AS cpmin, max(l_partkey) AS cpmax,
        |  min(l_suppkey) AS csmin, max(l_suppkey) AS csmax
        | FROM li, b GROUP BY 1),
        |oc AS (
        | SELECT (li.l_orderkey - b.omin) // greatest(1, (b.omax - b.omin + 32) // 32) AS chunk,
        |  min(l_partkey) AS cpmin, max(l_partkey) AS cpmax,
        |  min(l_suppkey) AS csmin, max(l_suppkey) AS csmax
        | FROM li, b GROUP BY 1),
        |pr AS (
        | SELECT CAST(i AS BIGINT) AS probe_id,
        |  b.pmin + (i * (b.pmax - b.pmin)) // 15 AS pk,
        |  b.smin + (((i * 7) % 16) * (b.smax - b.smin)) // 15 AS sk
        | FROM range(0, 16) t(i), b)
        |SELECT 'natural' AS layout, probe_id, pk, sk,
        | count(*) AS n_chunks,
        | CAST(sum(CASE WHEN cpmin <= pk AND pk <= cpmax
        |   AND csmin <= sk AND sk <= csmax THEN 1 ELSE 0 END) AS BIGINT) AS chunks_scanned
        |FROM pr CROSS JOIN oc GROUP BY 1, 2, 3, 4
        |UNION ALL
        |SELECT 'zorder' AS layout, probe_id, pk, sk,
        | count(*) AS n_chunks,
        | CAST(sum(CASE WHEN cpmin <= pk AND pk <= cpmax
        |   AND csmin <= sk AND sk <= csmax THEN 1 ELSE 0 END) AS BIGINT) AS chunks_scanned
        |FROM pr CROSS JOIN zc GROUP BY 1, 2, 3, 4""".stripMargin,
    "agg_incremental_merge" ->
      """SELECT l_returnflag,
        | CAST(sum(cents) AS BIGINT) AS sum_cents,
        | count(*) AS n,
        | CAST(min(cents) AS BIGINT) AS min_cents,
        | CAST(max(cents) AS BIGINT) AS max_cents,
        | CAST(sum(cents) AS BIGINT) // count(*) AS avg_cents
        |FROM (SELECT l_returnflag,
        |  CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        | FROM lineitem)
        |GROUP BY l_returnflag""".stripMargin,
    "q17_small_qty" ->
      """WITH li AS (
        | SELECT l_partkey, p_brand,
        |  CAST(round(l_quantity) AS BIGINT) AS qty,
        |  CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        | FROM lineitem JOIN part ON l_partkey = p_partkey
        | WHERE p_brand = 'Brand#1'),
        |w AS (
        | SELECT p_brand, qty, cents,
        |  CAST(sum(qty) OVER (PARTITION BY l_partkey) AS BIGINT) AS sum_qty,
        |  count(*) OVER (PARTITION BY l_partkey) AS cnt
        | FROM li)
        |SELECT p_brand, count(*) AS n_small,
        | CAST(sum(cents) AS BIGINT) AS small_revenue_cents,
        | CAST(sum(cents) AS BIGINT) * 10 // 7 AS avg_yearly_decicents
        |FROM w WHERE qty * 5 * cnt < sum_qty
        |GROUP BY p_brand""".stripMargin,
    // one-pass exact integer moments; r computed from identical bigint
    // sums on both engines, so the doubles downstream can't diverge
    "stats_correlation" ->
      """WITH li AS (
        | SELECT CAST(round(l_quantity) AS BIGINT) AS qty,
        |  CAST(round(l_extendedprice / 100) AS BIGINT) AS prc,
        |  CAST(round(l_discount * 100) AS BIGINT) AS dsc,
        |  CAST(round(l_tax * 100) AS BIGINT) AS tax
        | FROM lineitem),
        |m AS (
        | SELECT CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(qty) AS BIGINT) AS s_qty, CAST(sum(prc) AS BIGINT) AS s_prc,
        |  CAST(sum(dsc) AS BIGINT) AS s_dsc, CAST(sum(tax) AS BIGINT) AS s_tax,
        |  CAST(sum(qty * qty) AS BIGINT) AS s_qty_qty, CAST(sum(qty * prc) AS BIGINT) AS s_qty_prc,
        |  CAST(sum(qty * dsc) AS BIGINT) AS s_qty_dsc, CAST(sum(qty * tax) AS BIGINT) AS s_qty_tax,
        |  CAST(sum(prc * prc) AS BIGINT) AS s_prc_prc, CAST(sum(prc * dsc) AS BIGINT) AS s_prc_dsc,
        |  CAST(sum(prc * tax) AS BIGINT) AS s_prc_tax, CAST(sum(dsc * dsc) AS BIGINT) AS s_dsc_dsc,
        |  CAST(sum(dsc * tax) AS BIGINT) AS s_dsc_tax, CAST(sum(tax * tax) AS BIGINT) AS s_tax_tax
        | FROM li)
        |SELECT 'qty' AS var_a, 'prc' AS var_b, CAST(round(1000.0 * (n * s_qty_prc - s_qty * s_prc) / (sqrt(CAST(n * s_qty_qty - s_qty * s_qty AS DOUBLE)) * sqrt(CAST(n * s_prc_prc - s_prc * s_prc AS DOUBLE)))) AS BIGINT) AS r_milli FROM m
        |UNION ALL SELECT 'qty', 'dsc', CAST(round(1000.0 * (n * s_qty_dsc - s_qty * s_dsc) / (sqrt(CAST(n * s_qty_qty - s_qty * s_qty AS DOUBLE)) * sqrt(CAST(n * s_dsc_dsc - s_dsc * s_dsc AS DOUBLE)))) AS BIGINT) FROM m
        |UNION ALL SELECT 'qty', 'tax', CAST(round(1000.0 * (n * s_qty_tax - s_qty * s_tax) / (sqrt(CAST(n * s_qty_qty - s_qty * s_qty AS DOUBLE)) * sqrt(CAST(n * s_tax_tax - s_tax * s_tax AS DOUBLE)))) AS BIGINT) FROM m
        |UNION ALL SELECT 'prc', 'dsc', CAST(round(1000.0 * (n * s_prc_dsc - s_prc * s_dsc) / (sqrt(CAST(n * s_prc_prc - s_prc * s_prc AS DOUBLE)) * sqrt(CAST(n * s_dsc_dsc - s_dsc * s_dsc AS DOUBLE)))) AS BIGINT) FROM m
        |UNION ALL SELECT 'prc', 'tax', CAST(round(1000.0 * (n * s_prc_tax - s_prc * s_tax) / (sqrt(CAST(n * s_prc_prc - s_prc * s_prc AS DOUBLE)) * sqrt(CAST(n * s_tax_tax - s_tax * s_tax AS DOUBLE)))) AS BIGINT) FROM m
        |UNION ALL SELECT 'dsc', 'tax', CAST(round(1000.0 * (n * s_dsc_tax - s_dsc * s_tax) / (sqrt(CAST(n * s_dsc_dsc - s_dsc * s_dsc AS DOUBLE)) * sqrt(CAST(n * s_tax_tax - s_tax * s_tax AS DOUBLE)))) AS BIGINT) FROM m""".stripMargin,
    // r10 completion batch: the remaining TPC-H shapes, same integral
    // conventions
    "q6_forecast_revenue" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_lines,
        | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |  CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT) AS revenue_cents_pct
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        | AND CAST(round(l_discount * 100) AS BIGINT) BETWEEN 5 AND 7
        | AND l_quantity < 24""".stripMargin,
    "q7_nation_volume" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        | CAST(year(l_shipdate) AS BIGINT) AS l_year,
        | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |  (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation sn ON s_nationkey = sn.n_nationkey
        | JOIN customer ON o_custkey = c_custkey
        | JOIN nation cn ON c_nationkey = cn.n_nationkey
        |WHERE ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        |  OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
        | AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2, 3""".stripMargin,
    "q9_profit_by_nation" ->
      """SELECT n_name AS nation, CAST(year(l_shipdate) AS BIGINT) AS o_year,
        | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |   (100 - CAST(round(l_discount * 100) AS BIGINT)) -
        |  CAST(round(p_retailprice * 100) AS BIGINT) *
        |   CAST(round(l_quantity) AS BIGINT) * 80) AS BIGINT) AS sum_profit
        |FROM lineitem
        | JOIN part ON l_partkey = p_partkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%red%'
        |GROUP BY 1, 2""".stripMargin,
    "q10_returned_items" ->
      """WITH rev AS (
        | SELECT o_custkey, CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |  (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | WHERE l_returnflag = 'R'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-04-01'
        | GROUP BY o_custkey)
        |SELECT CAST(c_custkey AS BIGINT) AS c_custkey, c_name, revenue,
        | CAST(round(c_acctbal * 100) AS BIGINT) AS acctbal_cents, n_name
        |FROM rev JOIN customer ON o_custkey = c_custkey
        | JOIN nation ON c_nationkey = n_nationkey
        |ORDER BY revenue DESC, c_custkey LIMIT 20""".stripMargin,
    "q11_important_share" ->
      """WITH pp AS (
        | SELECT l_partkey,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS value_cents
        | FROM lineitem GROUP BY 1)
        |SELECT CAST(l_partkey AS BIGINT) AS p_partkey, value_cents FROM pp
        |WHERE value_cents * 10000 > (SELECT CAST(sum(value_cents) AS BIGINT) FROM pp) * 7""".stripMargin,
    "q12_shipmode_priority" ->
      """SELECT l_linestatus,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        | CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |GROUP BY l_linestatus""".stripMargin,
    "q14_promo_share" ->
      """WITH x AS (
        | SELECT CAST(round(l_extendedprice * 100) AS BIGINT) *
        |   (100 - CAST(round(l_discount * 100) AS BIGINT)) AS rev, p_type
        | FROM lineitem JOIN part ON l_partkey = p_partkey
        | WHERE l_shipdate >= TIMESTAMP '1996-03-01' AND l_shipdate < TIMESTAMP '1996-04-01')
        |SELECT CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS BIGINT) AS promo_revenue,
        | CAST(sum(rev) AS BIGINT) AS total_revenue,
        | CAST(sum(CASE WHEN p_type = 'PROMO' THEN rev ELSE 0 END) AS BIGINT) * 1000
        |  // CAST(sum(rev) AS BIGINT) AS promo_permille
        |FROM x""".stripMargin,
    "q19_discounted_revenue" ->
      """SELECT CAST(count(*) AS BIGINT) AS n_lines,
        | CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |  (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS revenue
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#1' AND CAST(round(l_quantity) AS BIGINT) BETWEEN 1 AND 11)
        | OR (p_brand = 'Brand#2' AND CAST(round(l_quantity) AS BIGINT) BETWEEN 10 AND 20)
        | OR (p_brand = 'Brand#3' AND CAST(round(l_quantity) AS BIGINT) BETWEEN 20 AND 30)""".stripMargin,
    "q20_excess_suppliers" ->
      """WITH ps AS (
        | SELECT l_suppkey, CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qty
        | FROM lineitem JOIN part ON l_partkey = p_partkey
        | WHERE p_name LIKE '%red%'
        |  AND l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        | GROUP BY l_suppkey),
        |g AS (SELECT CAST(sum(qty) AS BIGINT) AS total_qty, CAST(count(*) AS BIGINT) AS n_supp FROM ps)
        |SELECT s_name, n_name, qty
        |FROM ps CROSS JOIN g
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN nation ON s_nationkey = n_nationkey
        |WHERE qty * n_supp > total_qty""".stripMargin,
    // r10 TPC-H batch — all money in integral cents, comparisons
    // cross-multiplied where an average appears, so both engines stay
    // on BIGINT arithmetic throughout
    "q2_min_cost_supplier" ->
      """WITH cost AS (
        | SELECT l_partkey, l_suppkey, s_name, n_name, p_name,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS cost_cents
        | FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |  JOIN part ON l_partkey = p_partkey
        | WHERE r_name = 'ASIA' AND p_size = 15
        | GROUP BY l_partkey, l_suppkey, s_name, n_name, p_name),
        |mc AS (SELECT l_partkey AS k, min(cost_cents) AS m FROM cost GROUP BY 1)
        |SELECT CAST(l_partkey AS BIGINT) AS p_partkey, p_name, s_name, n_name, cost_cents
        |FROM cost JOIN mc ON l_partkey = k AND cost_cents = m""".stripMargin,
    "q4_priority_wait" ->
      """SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS order_count
        |FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        | AND o_orderdate < TIMESTAMP '1996-04-01'
        | AND EXISTS (SELECT 1 FROM lineitem
        |   WHERE l_orderkey = o_orderkey
        |    AND l_shipdate > o_orderdate + INTERVAL 60 DAY)
        |GROUP BY o_orderpriority""".stripMargin,
    "q13_custdist" ->
      """SELECT c_count, CAST(count(*) AS BIGINT) AS custdist FROM (
        | SELECT c_custkey, CAST(count(o_orderkey) AS BIGINT) AS c_count
        | FROM customer LEFT JOIN orders
        |  ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
        | GROUP BY c_custkey)
        |GROUP BY c_count""".stripMargin,
    "q15_top_supplier" ->
      """WITH rev AS (
        | SELECT l_suppkey,
        |  CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |   (100 - CAST(round(l_discount * 100) AS BIGINT))) AS BIGINT) AS total_rev
        | FROM lineitem
        | WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1996-04-01'
        | GROUP BY l_suppkey)
        |SELECT CAST(s_suppkey AS BIGINT) AS s_suppkey, s_name, total_rev
        |FROM supplier JOIN rev ON s_suppkey = l_suppkey
        |WHERE total_rev = (SELECT max(total_rev) FROM rev)""".stripMargin,
    "q18_large_orders" ->
      """WITH big AS (
        | SELECT l_orderkey, CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS total_qty
        | FROM lineitem GROUP BY l_orderkey HAVING total_qty > 300)
        |SELECT c_name, CAST(c_custkey AS BIGINT) AS c_custkey,
        | CAST(o_orderkey AS BIGINT) AS o_orderkey, o_orderdate,
        | CAST(round(o_totalprice * 100) AS BIGINT) AS totalprice_cents, total_qty
        |FROM big JOIN orders ON l_orderkey = o_orderkey
        | JOIN customer ON o_custkey = c_custkey""".stripMargin,
    "q21_waiting_supplier" ->
      """WITH pos AS (
        | SELECT l_orderkey, l_suppkey,
        |  CAST(max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 90 DAY
        |   THEN 1 ELSE 0 END) AS BIGINT) AS supp_late
        | FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        | WHERE o_orderstatus = 'F'
        | GROUP BY l_orderkey, l_suppkey),
        |po AS (
        | SELECT l_orderkey AS k, count(*) AS n_supp,
        |  CAST(sum(supp_late) AS BIGINT) AS n_late
        | FROM pos GROUP BY 1)
        |SELECT s_name, CAST(count(*) AS BIGINT) AS numwait
        |FROM pos JOIN po ON l_orderkey = k
        | JOIN supplier ON l_suppkey = s_suppkey
        |WHERE supp_late = 1 AND n_supp >= 2 AND n_late = 1
        |GROUP BY s_name""".stripMargin,
    "q22_global_sales" ->
      """WITH cust AS (
        | SELECT c_custkey, c_mktsegment,
        |  CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
        | FROM customer),
        |pa AS (
        | SELECT CAST(sum(bal_cents) AS BIGINT) AS sum_pos,
        |  CAST(count(*) AS BIGINT) AS n_pos
        | FROM cust WHERE bal_cents > 0)
        |SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS numcust,
        | CAST(sum(bal_cents) AS BIGINT) AS totacctbal_cents
        |FROM cust, pa
        |WHERE bal_cents * n_pos > sum_pos
        | AND NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey
        |   AND o_orderdate >= TIMESTAMP '2000-01-01')
        |GROUP BY c_mktsegment""".stripMargin,
    // value-atomic p01/p99 via RANGE-frame cumulative counts (peers
    // included), then clip-and-aggregate — all integers
    "stats_winsorize" ->
      """WITH x AS (
        | SELECT l_returnflag AS flag, CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
        | FROM lineitem),
        |c AS (
        | SELECT flag, cents,
        |  count(*) OVER (PARTITION BY flag ORDER BY cents) AS cum,
        |  count(*) OVER (PARTITION BY flag) AS n
        | FROM x),
        |b AS (
        | SELECT flag,
        |  min(CASE WHEN cum * 100 >= n THEN cents END) AS p01_cents,
        |  min(CASE WHEN cum * 100 >= n * 99 THEN cents END) AS p99_cents
        | FROM c GROUP BY flag)
        |SELECT x.flag, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CASE WHEN cents < p01_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_low,
        | CAST(sum(CASE WHEN cents > p99_cents THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_high,
        | CAST(sum(greatest(p01_cents, least(p99_cents, cents))) AS BIGINT) AS sum_clipped_cents,
        | min(p01_cents) AS p01_cents, min(p99_cents) AS p99_cents
        |FROM x JOIN b ON x.flag = b.flag
        |GROUP BY x.flag""".stripMargin,
    // linkage replayed without the key: same dirty derivation, same
    // blocks (both probe buckets), same integer weights, ROW_NUMBER
    // resolution with the identical (score desc, key asc) tie order
    "link_customers" ->
      """WITH c AS (
        | SELECT c_custkey AS k, c_name AS nm, c_nationkey AS nat,
        |  CAST(round(c_acctbal * 100) AS BIGINT) AS cents, c_mktsegment AS mkt
        | FROM customer),
        |d AS (
        | SELECT k AS d_key,
        |  CASE WHEN k % 3 = 0 THEN lower(nm) ELSE nm END AS d_name,
        |  nat AS d_nat,
        |  cents + CASE WHEN k % 5 = 0 THEN 7 ELSE 0 END AS d_cents,
        |  CASE WHEN k % 11 = 0 THEN 'UNKNOWN' ELSE mkt END AS d_mkt
        | FROM c),
        |p AS (
        | SELECT d.*, unnest([(d_cents + 100000) // 10000, (d_cents + 100000) // 10000 - 1]) AS blk
        | FROM d),
        |s AS (
        | SELECT p.d_key, c.k AS cand_key,
        |  (CASE WHEN p.d_name = c.nm THEN 40
        |        WHEN p.d_name = lower(c.nm) THEN 30 ELSE 0 END
        |   + CASE WHEN p.d_cents = c.cents THEN 30
        |          WHEN abs(p.d_cents - c.cents) <= 10 THEN 25 ELSE 0 END
        |   + CASE WHEN p.d_mkt = c.mkt THEN 15 ELSE 0 END) AS score
        | FROM p JOIN c ON p.d_nat = c.nat AND p.blk = (c.cents + 100000) // 10000),
        |r AS (
        | SELECT *, row_number() OVER (PARTITION BY d_key ORDER BY score DESC, cand_key ASC) AS rn,
        |  count(*) OVER (PARTITION BY d_key) AS n_candidates
        | FROM s)
        |SELECT d_key, cand_key AS best_key, CAST(score AS BIGINT) AS best_score,
        | n_candidates, score >= 45 AS matched
        |FROM r WHERE rn = 1""".stripMargin,
    "q_semi_join" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |              WHERE o_custkey = c_custkey AND o_totalprice > 200000.0)""".stripMargin,
    "q_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_orderstatus = 'O')""".stripMargin,
    "q_scalar_subquery" ->
      """SELECT o_orderkey, o_custkey, CAST(round(o_totalprice * 100) AS BIGINT) AS o_cents
        |FROM orders o
        |WHERE CAST(round(o_totalprice * 100) AS BIGINT) * 2 *
        |   (SELECT count(*) FROM orders i WHERE i.o_custkey = o.o_custkey)
        | > 3 * (SELECT sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |        FROM orders i WHERE i.o_custkey = o.o_custkey)""".stripMargin,
    "q_count_distinct" ->
      """SELECT o_orderstatus,
        | CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_cust,
        | CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS n_prio,
        | CAST(count(*) AS BIGINT) AS n
        |FROM orders GROUP BY o_orderstatus""".stripMargin,
    "w2_running_sum" ->
      """SELECT o_custkey, o_orderkey,
        | CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
        |  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |        ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS BIGINT) AS cents_sum3
        |FROM orders""".stripMargin,
    "q5_multi_join" ->
      """SELECT n_name,
        | CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
        |FROM lineitem
        | JOIN orders ON l_orderkey = o_orderkey
        | JOIN supplier ON l_suppkey = s_suppkey
        | JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        | JOIN nation ON s_nationkey = n_nationkey
        | JOIN region ON n_regionkey = r_regionkey
        |WHERE r_name = 'ASIA'
        |GROUP BY n_name""".stripMargin,
    "q_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
        |FROM orders
        |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin,
    "set_intersect" ->
      """SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
        |INTERSECT
        |SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'""".stripMargin,
    "layout_zorder" ->
      s"""SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        | ${graft.operators.Layout.zValueSql("l_partkey", "l_suppkey")} AS zval
        |FROM lineitem""".stripMargin,
    // the identical xy2d recurrence replayed as a recursive CTE: per level
    // b the quadrant digit (3*rx) XOR ry weighs s^2 into d, then the
    // coordinates reflect/transpose into the canonical sub-quadrant
    "layout_hilbert" ->
      """WITH RECURSIVE hc AS (
        | SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |  CAST(l_partkey AS BIGINT) & 65535 AS x, CAST(l_suppkey AS BIGINT) & 65535 AS y,
        |  15 AS b, CAST(0 AS BIGINT) AS d
        | FROM lineitem
        | UNION ALL
        | SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
        |  CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN s - 1 - y ELSE y END) ELSE x END,
        |  CASE WHEN ry = 0 THEN (CASE WHEN rx = 1 THEN s - 1 - x ELSE x END) ELSE y END,
        |  b - 1,
        |  d + s * s * (CASE WHEN rx = 1 THEN 3 - ry ELSE ry END)
        | FROM (
        |  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, x, y, b, d,
        |   CAST(1 AS BIGINT) << b AS s, (x >> b) & 1 AS rx, (y >> b) & 1 AS ry
        |  FROM hc WHERE b >= 0))
        |SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey, d AS hval
        |FROM hc WHERE b = -1""".stripMargin,
    // the bloom stage is pruning-only: output is the exact semi-join
    "q_bloom_semi_join" ->
      """SELECT l_returnflag,
        | CAST(count(*) AS BIGINT) AS n_rows,
        | CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty
        |FROM lineitem SEMI JOIN (
        |  SELECT o_orderkey FROM orders WHERE o_totalprice > 450000.0) o
        | ON l_orderkey = o.o_orderkey
        |GROUP BY l_returnflag""".stripMargin,
    "stats_profile" ->
      """WITH c AS (
        | SELECT CAST(l_quantity AS BIGINT) AS qty,
        |  CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
        |  CAST(round(l_discount * 100) AS BIGINT) AS disc_cents
        | FROM lineitem)
        |SELECT 'l_quantity' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,
        | CAST(sum(CASE WHEN qty IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
        | CAST(count(DISTINCT qty) AS BIGINT) AS n_distinct,
        | min(qty) AS min_val, max(qty) AS max_val FROM c
        |UNION ALL
        |SELECT 'l_extendedprice_cents', CAST(count(*) AS BIGINT),
        | CAST(sum(CASE WHEN price_cents IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        | CAST(count(DISTINCT price_cents) AS BIGINT),
        | min(price_cents), max(price_cents) FROM c
        |UNION ALL
        |SELECT 'l_discount_cents', CAST(count(*) AS BIGINT),
        | CAST(sum(CASE WHEN disc_cents IS NULL THEN 1 ELSE 0 END) AS BIGINT),
        | CAST(count(DISTINCT disc_cents) AS BIGINT),
        | min(disc_cents), max(disc_cents) FROM c""".stripMargin,
    "stats_histogram" ->
      """WITH c AS (
        | SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents FROM lineitem),
        |b AS (SELECT min(cents) AS mn, max(cents) AS mx FROM c)
        |SELECT CAST((cents - mn) * 32 // (mx - mn + 1) AS BIGINT) AS bucket,
        | CAST(count(*) AS BIGINT) AS n,
        | min(cents) AS lo_cents, max(cents) AS hi_cents
        |FROM c CROSS JOIN b
        |GROUP BY 1""".stripMargin,
    "stats_histogram_eqdepth" ->
      """WITH h AS (
        | SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents, count(*) AS cnt
        | FROM lineitem GROUP BY 1),
        |c AS (
        | SELECT cents, cnt,
        |  sum(cnt) OVER (ORDER BY cents ROWS UNBOUNDED PRECEDING) AS cum,
        |  sum(cnt) OVER () AS n
        | FROM h)
        |SELECT CAST((cum * 8 + n - 1) // n AS BIGINT) AS bucket,
        | min(cents) AS lo_cents, max(cents) AS hi_cents,
        | CAST(sum(cnt) AS BIGINT) AS n_rows
        |FROM c GROUP BY 1""".stripMargin,
    "bloom_fpr_check" ->
      """SELECT
        | CAST(sum(CASE WHEN o_totalprice > 450000.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_members,
        | CAST(sum(CASE WHEN o_totalprice <= 450000.0 THEN 1 ELSE 0 END) AS BIGINT) AS n_non_members,
        | TRUE AS no_false_negatives,
        | TRUE AS fpr_bounded
        |FROM orders""".stripMargin,
  )

  /** Skew-safe / derived twins share their plain twin's oracle
    * verbatim — a green row proves the rewrite changed the plan,
    * not the answer.
    */
  val sql: Map[String, String] = base ++ Map(
    "q_range_frame_skew" -> base("q_range_frame"),
    "q_window_lead_lag_skew" -> base("q_window_lead_lag"),
    // r10 continuation: DQ audits — Benford expectations are LITERALS on
    // both engines (no log evaluated anywhere)
    "dq_benford" ->
      """WITH o AS (
        | SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS VARCHAR), 1, 1) AS BIGINT) AS digit
        | FROM orders),
        |g AS (SELECT digit, CAST(count(*) AS BIGINT) AS observed FROM o GROUP BY 1),
        |t AS (SELECT CAST(sum(observed) AS BIGINT) AS total FROM g)
        |SELECT digit, observed, 1000 * observed // total AS observed_milli,
        | CAST(CASE digit WHEN 1 THEN 301 WHEN 2 THEN 176 WHEN 3 THEN 125 WHEN 4 THEN 97
        |  WHEN 5 THEN 79 WHEN 6 THEN 67 WHEN 7 THEN 58 WHEN 8 THEN 51 WHEN 9 THEN 46 END AS BIGINT) AS expected_milli,
        | abs(1000 * observed // total -
        |  CASE digit WHEN 1 THEN 301 WHEN 2 THEN 176 WHEN 3 THEN 125 WHEN 4 THEN 97
        |   WHEN 5 THEN 79 WHEN 6 THEN 67 WHEN 7 THEN 58 WHEN 8 THEN 51 WHEN 9 THEN 46 END) AS dev_milli
        |FROM g, t""".stripMargin,
    // +10^8 cent shift keeps the bucket div non-negative on both engines
    "dq_ldiversity" ->
      """SELECT CAST(c_nationkey AS BIGINT) AS nationkey, c_mktsegment AS segment,
        | CAST(count(*) AS BIGINT) AS k,
        | CAST(count(DISTINCT (CAST(round(c_acctbal * 100) AS BIGINT) + 100000000) // 100000) AS BIGINT) AS l,
        | count(DISTINCT (CAST(round(c_acctbal * 100) AS BIGINT) + 100000000) // 100000) >= 3 AS is_diverse
        |FROM customer GROUP BY 1, 2""".stripMargin,
  )
}

package graft.catalog

/** DuckDB oracle SQL for the graph query family —
  * split out of [[graft.SparkEntry]] (round 11) so the catalog stays
  * reviewable as it grows. Keys map 1:1 to `SparkEntry.queries`;
  * bodies are byte-identical to the pre-split map (CatalogDump-diffed).
  */
private[graft] object GraphOracles {

  /** Shared CTE prefix for the graph oracles: the symmetric trade graph
    * (see [[graft.operators.Graph]]). */
  private val tradeGraphCtes: String =
    """e0 AS (SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
      |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)""".stripMargin


  /** Unrolled fixed-iteration integer-PageRank oracle — the recursive-CTE-
    * free twin of [[graft.operators.Graph.pageRank]]: each superstep is one
    * CTE, so DuckDB executes literally the same integer recurrence.
    */
  private def pageRankOracle(iters: Int): String =
    pageRankOracleOver(iters, tradeGraphCtes,
      """SELECT c_custkey * 2 AS node FROM customer
        | UNION ALL SELECT s_suppkey * 2 + 1 FROM supplier""".stripMargin)

  /** Hub-heavy twin: the supplier side collapsed to `l_suppkey % 8` — the
    * degree-skew amplifier [[graft.operators.Graph.pageRankHubSkew]]
    * documents; identical recurrence, 8 supplier super-nodes.
    */
  private def pageRankSkewOracle(iters: Int): String =
    pageRankOracleOver(iters,
      """e0 AS (SELECT DISTINCT o_custkey * 2 AS src, (l_suppkey % 8) * 2 + 1 AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)""".stripMargin,
      """SELECT c_custkey * 2 AS node FROM customer
        | UNION ALL SELECT DISTINCT (s_suppkey % 8) * 2 + 1 FROM supplier""".stripMargin)

  private def pageRankOracleOver(iters: Int, graphCtes: String, nodesSql: String): String = {
    val steps = (1 to iters).map { i =>
      s"""r$i AS (SELECT n.node,
         | CAST(150000000 + (85 * COALESCE(c.s, 0)) // 100 AS BIGINT) AS pr
         | FROM nodes n LEFT JOIN (
         |  SELECT ed.dst AS node, sum(r.pr // ed.outdeg) AS s
         |  FROM r${i - 1} r JOIN ed ON r.node = ed.src GROUP BY 1) c
         | ON n.node = c.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH $graphCtes,
       |deg AS (SELECT src, count(*) AS outdeg FROM e GROUP BY 1),
       |ed AS (SELECT e.src, e.dst, deg.outdeg FROM e JOIN deg ON e.src = deg.src),
       |nodes AS ($nodesSql),
       |r0 AS (SELECT node, CAST(1000000000 AS BIGINT) AS pr FROM nodes),
       |$steps
       |SELECT node, pr FROM r$iters""".stripMargin
  }


  /** Unrolled bounded-hop BFS oracle twin of
    * [[graft.operators.Graph.reachability]]. */
  private def reachOracle(maxHops: Int): String = {
    val steps = (1 to maxHops).map { i =>
      s"""f$i AS (SELECT DISTINCT e.dst AS node
         | FROM f${i - 1} JOIN e ON f${i - 1}.node = e.src
         | WHERE e.dst NOT IN (SELECT node FROM v${i - 1})),
         |v$i AS (SELECT * FROM v${i - 1}
         | UNION ALL SELECT node, CAST($i AS BIGINT) FROM f$i)""".stripMargin
    }.mkString(",\n")
    s"""WITH $tradeGraphCtes,
       |seeds AS (SELECT c_custkey * 2 AS node
       | FROM customer JOIN nation ON c_nationkey = n_nationkey
       | WHERE n_name = 'NATION_1'),
       |f0 AS (SELECT node FROM seeds),
       |v0 AS (SELECT node, CAST(0 AS BIGINT) AS hop FROM seeds),
       |$steps
       |SELECT node, hop FROM v$maxHops""".stripMargin
  }


  /** Unrolled k-superstep min-label-propagation oracle twin of
    * [[graft.operators.Graph.components]]. */
  private def componentsOracle(iters: Int): String =
    componentsOracleOver(iters, tradeGraphCtes,
      """SELECT c_custkey * 2 AS node FROM customer
        | UNION ALL SELECT s_suppkey * 2 + 1 FROM supplier""".stripMargin)

  /** Hub-heavy twin ([[graft.operators.Graph.componentsHubSkew]]):
    * identical min-label recurrence over the `l_suppkey % 8` hub graph.
    */
  private def componentsSkewOracle(iters: Int): String =
    componentsOracleOver(iters,
      """e0 AS (SELECT DISTINCT o_custkey * 2 AS src, (l_suppkey % 8) * 2 + 1 AS dst
        |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey),
        |e AS (SELECT src, dst FROM e0 UNION ALL SELECT dst, src FROM e0)""".stripMargin,
      """SELECT c_custkey * 2 AS node FROM customer
        | UNION ALL SELECT DISTINCT (s_suppkey % 8) * 2 + 1 FROM supplier""".stripMargin)

  private def componentsOracleOver(iters: Int, graphCtes: String,
      nodesSql: String): String = {
    val steps = (1 to iters).map { i =>
      s"""c$i AS (SELECT p.node,
         | least(p.label, COALESCE(m.nmin, p.label)) AS label
         | FROM c${i - 1} p LEFT JOIN (
         |  SELECT e.dst AS node, min(p2.label) AS nmin
         |  FROM c${i - 1} p2 JOIN e ON p2.node = e.src GROUP BY 1) m
         | ON p.node = m.node)""".stripMargin
    }.mkString(",\n")
    s"""WITH $graphCtes,
       |nodes AS ($nodesSql),
       |c0 AS (SELECT node, node AS label FROM nodes),
       |$steps
       |SELECT CAST(node AS BIGINT) AS node, CAST(label AS BIGINT) AS label
       |FROM c$iters""".stripMargin
  }


  private val base: Map[String, String] = Map(
  )

  /** Skew-safe / derived twins share their plain twin's oracle
    * verbatim — a green row proves the rewrite changed the plan,
    * not the answer.
    */
  val sql: Map[String, String] = base ++ Map(
    "graph_pagerank" -> pageRankOracle(5),
    "graph_pagerank_skew" -> pageRankSkewOracle(5),
    "graph_reach" -> reachOracle(3),
    "graph_components" -> componentsOracle(4),
    // r10 continuation: wedge-enumerated RA link prediction; total order
    // (ra DESC, common DESC, u, v) makes the LIMIT deterministic
    "graph_link_predict" ->
      linkPredictOracle("SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem", 900),
    // r13 hub-skew twin ([[graft.operators.Graph.linkPredictHubSkew]]):
    // identical arithmetic over `l_suppkey % 8` super-nodes, median cut
    // (the 8-hub backbone above the top-decile cut has no wedges left)
    "graph_link_predict_skew" ->
      linkPredictOracle(
        "SELECT DISTINCT l_orderkey, l_suppkey % 8 AS l_suppkey FROM lineitem", 500),
    // r10 continuation: 3 unrolled synchronous LPA supersteps over the
    // TOP-DECILE backbone (median graph too dense — one community);
    // argmax is the (count DESC, label ASC) rank = the min-struct order
    "graph_lpa" ->
      """WITH sup AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
        |ew AS (
        | SELECT a.l_suppkey AS u, b.l_suppkey AS v, CAST(count(*) AS BIGINT) AS w
        | FROM sup a JOIN sup b
        |  ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
        | GROUP BY 1, 2),
        |h AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM ew GROUP BY w),
        |rk AS (SELECT w, sum(c) OVER (ORDER BY w ASC) AS cum, sum(c) OVER () AS n FROM h),
        |thr AS (SELECT min(w) AS t FROM rk WHERE cum * 1000 >= n * 900),
        |e AS (SELECT u, v FROM ew, thr WHERE w > t),
        |adj AS (SELECT u AS v, v AS nb FROM e UNION ALL SELECT v, u FROM e),
        |l0 AS (SELECT DISTINCT v, v AS lbl FROM adj),
        |c1 AS (SELECT a.v, l.lbl, count(*) AS c FROM adj a JOIN l0 l ON l.v = a.nb GROUP BY 1, 2),
        |l1 AS (SELECT v, lbl FROM (
        | SELECT v, lbl, row_number() OVER (PARTITION BY v ORDER BY c DESC, lbl ASC) AS r FROM c1) WHERE r = 1),
        |c2 AS (SELECT a.v, l.lbl, count(*) AS c FROM adj a JOIN l1 l ON l.v = a.nb GROUP BY 1, 2),
        |l2 AS (SELECT v, lbl FROM (
        | SELECT v, lbl, row_number() OVER (PARTITION BY v ORDER BY c DESC, lbl ASC) AS r FROM c2) WHERE r = 1),
        |c3 AS (SELECT a.v, l.lbl, count(*) AS c FROM adj a JOIN l2 l ON l.v = a.nb GROUP BY 1, 2),
        |l3 AS (SELECT v, lbl FROM (
        | SELECT v, lbl, row_number() OVER (PARTITION BY v ORDER BY c DESC, lbl ASC) AS r FROM c3) WHERE r = 1)
        |SELECT v AS supplier, CAST(lbl AS BIGINT) AS community,
        | CAST(count(*) OVER (PARTITION BY lbl) AS BIGINT) AS community_size
        |FROM l3""".stripMargin,
    // oriented u<v edges stored once: each triangle a<b<c matches the
    // two-join exactly once; clustering in exact permille (all integers)
    "graph_triangles" ->
      trianglesOracle("SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem"),
    // hub-heavy twin ([[graft.operators.Graph.trianglesHubSkew]]):
    // identical arithmetic over `l_suppkey % 8` super-nodes
    "graph_triangles_skew" ->
      trianglesOracle(
        "SELECT DISTINCT l_orderkey, l_suppkey % 8 AS l_suppkey FROM lineitem"),
    "graph_components_skew" -> componentsSkewOracle(4),
  )

  private def linkPredictOracle(supSql: String, permille: Int): String =
    s"""WITH sup AS ($supSql),
       |ew AS (
       | SELECT a.l_suppkey AS u, b.l_suppkey AS v, CAST(count(*) AS BIGINT) AS w
       | FROM sup a JOIN sup b
       |  ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
       | GROUP BY 1, 2),
       |h AS (SELECT w, CAST(count(*) AS BIGINT) AS c FROM ew GROUP BY w),
       |rk AS (SELECT w, sum(c) OVER (ORDER BY w ASC) AS cum, sum(c) OVER () AS n FROM h),
       |thr AS (SELECT min(w) AS t FROM rk WHERE cum * 1000 >= n * $permille),
       |e AS (SELECT u, v FROM ew, thr WHERE w > t),
       |adj AS (SELECT u AS mid, v AS nb FROM e UNION ALL SELECT v, u FROM e),
       |deg AS (SELECT mid, CAST(count(*) AS BIGINT) AS d FROM adj GROUP BY mid),
       |sc AS (
       | SELECT a.nb AS u, b.nb AS v, CAST(count(*) AS BIGINT) AS n_common,
       |  CAST(sum(1000000 // d) AS BIGINT) AS ra_micros
       | FROM adj a JOIN adj b ON a.mid = b.mid AND a.nb < b.nb
       | JOIN deg ON deg.mid = a.mid
       | GROUP BY 1, 2)
       |SELECT u, v, n_common, ra_micros FROM sc
       |WHERE NOT EXISTS (SELECT 1 FROM e WHERE e.u = sc.u AND e.v = sc.v)
       |ORDER BY ra_micros DESC, n_common DESC, u ASC, v ASC LIMIT 20""".stripMargin

  private def trianglesOracle(supSql: String): String =
    s"""WITH sup AS ($supSql),
       |e AS (
       | SELECT a.l_suppkey AS u, b.l_suppkey AS v
       | FROM sup a JOIN sup b
       |  ON a.l_orderkey = b.l_orderkey AND a.l_suppkey < b.l_suppkey
       | GROUP BY 1, 2 HAVING count(*) >= 5),
       |deg AS (
       | SELECT n, CAST(count(*) AS BIGINT) AS d FROM (
       |  SELECT u AS n FROM e UNION ALL SELECT v FROM e) GROUP BY n),
       |tri AS (
       | SELECT CAST(count(*) AS BIGINT) AS n_tri
       | FROM e e1 JOIN e e2 ON e1.v = e2.u
       | WHERE EXISTS (SELECT 1 FROM e e3 WHERE e3.u = e1.u AND e3.v = e2.v))
       |SELECT (SELECT CAST(count(*) AS BIGINT) FROM deg) AS n_nodes,
       | (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges,
       | (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) FROM deg) AS n_wedges,
       | (SELECT n_tri FROM tri) AS n_triangles,
       | 3 * (SELECT n_tri FROM tri) * 1000 //
       |  (SELECT CAST(sum(d * (d - 1) // 2) AS BIGINT) FROM deg) AS clustering_permille""".stripMargin
}

package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Graph

/** Off-default cells for the graph-family knobs (the DedupParamSpec /
  * IvfSpec gated-cell pattern) plus the runtime guards added with them:
  * the load-bearing properties are MONOTONICITY of the strength threshold
  * (a higher `minOrders` examines a sub-graph, so every count shrinks or
  * holds), WELL-DEFINEDNESS of LPA at any `steps` (one label per node,
  * sizes consistent), DETERMINISM of link prediction at any `cutPermille`
  * (total order ⇒ re-running is bit-identical), and the LOUD failure of
  * the PageRank overflow precondition.
  */
class GraphParamSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = SparkSpec.testDataDir

  test("triangles off-default minOrders cells shrink monotonically and keep clustering in [0, 1000]") {
    def stats(minOrders: Long): (Long, Long, Long, Long) = {
      val r = Graph.triangles(spark, dir, minOrders = minOrders).head()
      (r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges"),
        r.getAs[Long]("n_wedges"), r.getAs[Long]("n_triangles"))
    }
    val loose = stats(3L)
    val default = stats(5L)
    val tight = stats(8L)
    // a higher threshold keeps a subset of edges: every count is monotone
    for (((a, b), what) <- Seq(loose -> default, default -> tight)
        .flatMap { case (x, y) =>
          Seq((x._1, y._1) -> "nodes", (x._2, y._2) -> "edges",
            (x._3, y._3) -> "wedges", (x._4, y._4) -> "triangles") })
      assert(a >= b, s"$what must not grow when minOrders tightens: $a -> $b")
    assert(loose._4 > 0, "minOrders=3 graph on the fixture must contain triangles")
    val cp = Graph.triangles(spark, dir, minOrders = 3L)
      .head().getAs[Long]("clustering_permille")
    assert(cp >= 0 && cp <= 1000)
    // r14: forced wedge blocking (wedgeCap=2 makes every src multi-bucket)
    // must count the IDENTICAL triangles — the blocked-pairing lemma on
    // the orientation join
    val plain = Graph.triangles(spark, dir, minOrders = 3L).head()
    val forced = Graph.triangles(spark, dir, minOrders = 3L, wedgeCap = 2).head()
    assert(forced.getAs[Long]("n_triangles") == plain.getAs[Long]("n_triangles") &&
      forced.getAs[Long]("n_wedges") == plain.getAs[Long]("n_wedges"),
      s"blocked wedge count diverged: $forced vs $plain")
    intercept[IllegalArgumentException](Graph.triangles(spark, dir, wedgeCap = 0))
  }

  test("lpa off-default steps cell (steps=1) labels every backbone node exactly once with consistent sizes") {
    val one = Graph.lpaCommunities(spark, dir, steps = 1)
    val three = Graph.lpaCommunities(spark, dir) // default steps = 3
    val s1 = one.collect()
    // one row per supplier; community sizes agree with the label multiset
    assert(s1.map(_.getAs[Long]("supplier")).distinct.length == s1.length)
    val byCommunity = s1.groupBy(_.getAs[Long]("community"))
    byCommunity.foreach { case (c, rows) =>
      assert(rows.forall(_.getAs[Long]("community_size") == rows.length),
        s"community $c size field disagrees with its row count")
    }
    // the node set is the backbone, independent of steps
    assert(s1.map(_.getAs[Long]("supplier")).toSet ==
      three.collect().map(_.getAs[Long]("supplier")).toSet)
  }

  test("link-predict off-default cutPermille cell (500 = median backbone) is deterministic and well-formed") {
    def rows() = Graph.linkPredict(spark, dir, topK = 10, cutPermille = 500)
      .collect().map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"),
        r.getAs[Long]("n_common"), r.getAs[Long]("ra_micros"))).toSeq
    val a = rows()
    assert(a.nonEmpty && a.length <= 10)
    a.foreach { case (u, v, common, ra) =>
      assert(u < v, "candidate pairs are canonical u < v")
      assert(common >= 1 && ra >= 1, "every candidate comes from >= 1 wedge")
    }
    // the (ra DESC, common DESC, u, v) total order holds in the output
    a.sliding(2).foreach {
      case Seq((u1, v1, c1, r1), (u2, v2, c2, r2)) =>
        assert(r1 > r2 || (r1 == r2 && (c1 > c2 || (c1 == c2 &&
          (u1 < u2 || (u1 == u2 && v1 < v2))))),
          "output must follow the documented total order")
      case _ => ()
    }
    assert(rows() == a, "total order makes the cut deterministic across runs")
  }

  test("blocked wedge enumeration is invariant in wedgeCap (salting changes the plan, never the answer)") {
    // wedgeCap=1 forces EVERY mid through the maximal salt (s = d buckets,
    // full replication); the default leaves light mids unsalted. Identical
    // output proves the bucket decomposition enumerates each wedge once.
    def rows(cap: Int) = Graph.linkPredict(spark, dir, topK = 15,
        cutPermille = 500, wedgeCap = cap)
      .collect().map(r => (r.getAs[Long]("u"), r.getAs[Long]("v"),
        r.getAs[Long]("n_common"), r.getAs[Long]("ra_micros"))).toSeq
    val salted = rows(1)
    assert(salted.nonEmpty)
    assert(rows(1024) == salted, "wedgeCap must not change the result")
  }

  test("link-predict hub-skew twin: pairs live in the hub universe, arithmetic matches the plain core") {
    val rows = Graph.linkPredictHubSkew(spark, dir, hubMod = 8, wedgeCap = 2).collect()
    assert(rows.nonEmpty, "median-cut 8-hub graph must leave non-adjacent pairs")
    rows.foreach { r =>
      val (u, v) = (r.getAs[Long]("u"), r.getAs[Long]("v"))
      assert(u >= 0 && u < 8 && v >= 0 && v < 8 && u < v,
        s"hub pair out of universe: ($u, $v)")
      assert(r.getAs[Long]("n_common") >= 1 && r.getAs[Long]("ra_micros") >= 1)
    }
    // C(8,2) bounds the candidate set
    assert(rows.length <= 28)
  }

  test("pageRank overflow precondition fails loudly at a scale the node count cannot carry") {
    val e = intercept[IllegalArgumentException] {
      Graph.pageRank(spark, dir, scale = Long.MaxValue / 100)
    }
    assert(e.getMessage.contains("overflow"))
  }

  test("hub-skew twin collapses suppliers into hubMod super-nodes and conserves rank mass") {
    val pr = Graph.pageRankHubSkew(spark, dir, hubMod = 4)
    val rows = pr.collect()
    // 150 customers + at most 4 supplier hubs; every node holds positive rank
    val suppliers = rows.filter(r => r.getAs[Long]("node") % 2 == 1)
    assert(suppliers.length <= 4 && suppliers.nonEmpty)
    assert(rows.length > 150 && rows.forall(_.getAs[Long]("pr") > 0))
    // truncating division only LEAKS mass: total stays ≤ N · SCALE
    val total = rows.map(_.getAs[Long]("pr")).sum
    assert(total <= rows.length * Graph.Scale)
    // the hubs absorb customer mass: every hub outranks every customer
    val minHub = suppliers.map(_.getAs[Long]("pr")).min
    val maxCustomer = rows.filter(r => r.getAs[Long]("node") % 2 == 0)
      .map(_.getAs[Long]("pr")).max
    assert(minHub > maxCustomer, "super-node degree must dominate the rank ordering")
  }

  test("components hub-skew twin: one label per node, min-propagation only shrinks, hub count bounded") {
    val rows = Graph.componentsHubSkew(spark, dir, hubMod = 4).collect()
    assert(rows.map(_.getAs[Long]("node")).distinct.length == rows.length)
    // supplier hubs collapse to < hubMod odd nodes; customers stay even
    val hubs = rows.filter(_.getAs[Long]("node") % 2 == 1)
    assert(hubs.nonEmpty && hubs.length <= 4)
    // min-label propagation can never assign a label above the node's own id
    rows.foreach(r =>
      assert(r.getAs[Long]("label") <= r.getAs[Long]("node"),
        s"label grew past own id on node ${r.getAs[Long]("node")}"))
    // every hub touches (almost) every customer, so after 4 supersteps the
    // connected mass shares the global minimum label
    val minNode = rows.map(_.getAs[Long]("node")).min
    assert(rows.count(_.getAs[Long]("label") == minNode) > rows.length / 2,
      "the hub graph must collapse the majority into the min-label component")
  }

  test("triangles hub-skew twin: counts bounded by the hub universe and internally consistent") {
    val r = Graph.trianglesHubSkew(spark, dir, hubMod = 4).head()
    val (n, e, w, tri) = (r.getAs[Long]("n_nodes"), r.getAs[Long]("n_edges"),
      r.getAs[Long]("n_wedges"), r.getAs[Long]("n_triangles"))
    assert(n <= 4 && e <= 6, s"hubMod=4 universe exceeded: n=$n e=$e")
    assert(tri >= 0 && tri <= 4, s"C(4,3) bounds the triangle count, got $tri")
    assert(3 * tri <= w, "each triangle closes exactly 3 wedges")
    val cp = r.getAs[Long]("clustering_permille")
    assert(cp >= 0 && cp <= 1000)
    // the dense hub fixture actually contains closed triangles — the twin
    // must exercise the wedge-close join, not vacuously count zero
    assert(tri > 0, "hub co-service graph on the fixture must be triangle-rich")
  }
}

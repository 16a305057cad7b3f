package graft

import org.scalatest.funsuite.AnyFunSuite

/** Iterative graph family: PageRank and bounded BFS over the trade graph.
  * The driver oracle covers the real fixture; these specs pin the exact
  * integer recurrence on a hand-built graph where the interesting cases
  * (unreached nodes, hop-3 frontier, isolated nodes) actually occur —
  * sf0.01 is so dense every node is reached by hop 2.
  */
class GraphSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  /** A 3-customer / 2-supplier path graph: c1—s1—c2—s2—c3, seed nation
    * holds only c1. Written as minimal parquet tables so the operator
    * runs its real scan path.
    */
  private lazy val pathDir: String = {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("graphfx").toString
    // orders: order k by customer k; lineitem rows wire supplier trades
    Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("o_orderkey", "o_custkey")
      .write.parquet(s"$tmp/orders.parquet")
    // s1 trades with c1,c2 (orders 1,2); s2 with c2,c3 (orders 2,3)
    Seq((1L, 1L), (2L, 1L), (2L, 2L), (3L, 2L))
      .toDF("l_orderkey", "l_suppkey")
      .write.parquet(s"$tmp/lineitem.parquet")
    Seq((1L, 1), (2L, 2), (3L, 2), (4L, 3)) // c4 isolated, no orders
      .toDF("c_custkey", "c_nationkey")
      .write.parquet(s"$tmp/customer.parquet")
    Seq((1L, 9), (2L, 9)).toDF("s_suppkey", "s_nationkey")
      .write.parquet(s"$tmp/supplier.parquet")
    Seq((1, "NATION_1"), (2, "NATION_2"), (9, "NATION_9"))
      .toDF("n_nationkey", "n_name")
      .write.parquet(s"$tmp/nation.parquet")
    tmp
  }

  test("r9: BFS hop levels on the path graph, including the unreached node") {
    val got = graft.operators.Graph.reachability(spark, pathDir, maxHops = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // node ids: customer k -> 2k, supplier k -> 2k+1
    assert(got == Map(2L -> 0L, 3L -> 1L, 4L -> 2L, 5L -> 3L),
      s"c1=0, s1=1, c2=2, s2=3; c3 and isolated c4 unreached: $got")
  }

  test("r9: BFS with maxHops=4 reaches c3; isolated c4 never appears") {
    val got = graft.operators.Graph.reachability(spark, pathDir, maxHops = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(6L) == 4L && !got.contains(8L), s"$got")
  }

  test("r9: integer PageRank matches a driver-side recurrence bit-for-bit") {
    val dir = SparkSpec.testDataDir
    val edges = graft.operators.Graph.tradeEdges(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val nodes = graft.operators.Graph.tradeNodes(spark, dir)
      .collect().map(_.getLong(0))
    val scale = graft.operators.Graph.Scale
    var pr = nodes.map(_ -> scale).toMap
    for (_ <- 1 to 5) {
      val in = scala.collection.mutable.Map.empty[Long, Long]
      edges.foreach { case (src, dst, outdeg) =>
        in(dst) = in.getOrElse(dst, 0L) + pr(src) / outdeg
      }
      pr = nodes.map(n => n -> (scale * 15L / 100L + 85L * in.getOrElse(n, 0L) / 100L)).toMap
    }
    val got = graft.operators.Graph.pageRank(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == pr, s"diff=${(got.toSet -- pr.toSet).take(5)}")
    // mass sanity: total never exceeds the initial uniform mass
    assert(got.values.sum <= nodes.length * scale)
    assert(got.values.min >= scale * 15L / 100L, "base rank floor")
  }

  test("r9: PageRank on the path graph favors the bridge customer c2") {
    val got = graft.operators.Graph.pageRank(spark, pathDir, iters = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // c2 (node 4) is on every path; isolated c4 (node 8) keeps base rank
    assert(got(4L) > got(2L) && got(4L) > got(6L), s"$got")
    assert(got(8L) == graft.operators.Graph.Scale * 15L / 100L, s"$got")
  }

  test("r9: min-label propagation finds both components of the path graph") {
    val got = graft.operators.Graph.components(spark, pathDir, iters = 4)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // chain c1-s1-c2-s2-c3 all collapse to min node id 2; isolated c4 keeps its own
    assert(got == Map(2L -> 2L, 3L -> 2L, 4L -> 2L, 5L -> 2L, 6L -> 2L, 8L -> 8L), s"$got")
  }

  test("r9: one superstep only propagates one hop (semantics are k-step, not CC)") {
    val got = graft.operators.Graph.components(spark, pathDir, iters = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // after 1 step c3 (node 6) has only seen s2's label (5), not the chain min
    assert(got(6L) == 5L && got(2L) == 2L, s"$got")
  }
}

package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling evidence for the iterative graph family: replicate the trade
  * tables k× with key offsets (k disjoint copies of the graph — node and
  * edge count scale k×, diameter does not), run `graph_pagerank` /
  * `graph_components` / `graph_reach` at 1× and k×, and report wall +
  * shuffle-bytes exponents `log(ratio)/log(k)`. Exponent ≈ 1 is the
  * structural expectation: every superstep is one edge-table pass plus
  * one node-table aggregate — strictly linear work, constant rounds.
  *
  * Usage: `runMain graft.tools.GraphScaleProbe [sfDir] [bigFactor]`.
  * Numbers land in DESIGN.md; harness tool, not a catalog query.
  */
object GraphScaleProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val bigK = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[32]")
      .appName("graph-scale-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    def settle(): Unit = {
      var prev = -1L
      while (prev != shuffleBytes.get()) { prev = shuffleBytes.get(); Thread.sleep(200) }
    }
    def measured[A](body: => A): (Double, Long) = {
      settle()
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      body
      val wall = (System.nanoTime() - t0) / 1e9
      settle()
      (wall, shuffleBytes.get())
    }

    /** k disjoint key-offset copies of the four trade tables. Offsets are
      * far above any real key so copies never collide. */
    def replicate(k: Int): String = {
      val out = java.nio.file.Files.createTempDirectory(s"graph-probe-x$k").toString
      val copies = spark.range(k).select(col("id").as("copy"))
      def off(c: String, step: Long) = (col(c) + col("copy") * step).as(c)
      spark.read.parquet(s"$dir/orders.parquet")
        .crossJoin(copies)
        .select(off("o_orderkey", 100000000L), off("o_custkey", 1000000L),
          col("o_orderdate"))
        .write.mode("overwrite").parquet(s"$out/orders.parquet")
      spark.read.parquet(s"$dir/lineitem.parquet")
        .crossJoin(copies)
        .select(off("l_orderkey", 100000000L), off("l_suppkey", 1000000L))
        .write.mode("overwrite").parquet(s"$out/lineitem.parquet")
      spark.read.parquet(s"$dir/customer.parquet")
        .crossJoin(copies)
        .select(off("c_custkey", 1000000L), col("c_nationkey"))
        .write.mode("overwrite").parquet(s"$out/customer.parquet")
      spark.read.parquet(s"$dir/supplier.parquet")
        .crossJoin(copies)
        .select(off("s_suppkey", 1000000L), col("s_nationkey"))
        .write.mode("overwrite").parquet(s"$out/supplier.parquet")
      spark.read.parquet(s"$dir/nation.parquet")
        .write.mode("overwrite").parquet(s"$out/nation.parquet")
      out
    }

    val d1 = replicate(1)
    val dk = replicate(bigK)
    val G = graft.operators.Graph
    val probes: Seq[(String, String => Long)] = Seq(
      ("graph_pagerank", (d: String) => G.pageRank(spark, d).count()),
      ("graph_components", (d: String) => G.components(spark, d).count()),
      ("graph_reach", (d: String) => G.reachability(spark, d).count()),
      // co-service projection family: replicated copies are key-disjoint,
      // so edges/wedges scale k× — exponent ≈ 1 is again the expectation
      // (the wedge set is Σ d² per copy, copies don't cross-pair)
      ("graph_triangles", (d: String) => G.triangles(spark, d).count()),
      ("graph_lpa", (d: String) => G.lpaCommunities(spark, d).count()),
      ("graph_link_predict", (d: String) => G.linkPredict(spark, d).count()),
      // r12 hub-skew twins: the key offsets are multiples of 8, so every
      // copy's suppliers collapse onto the SAME eight hubs — k× the load
      // on a FIXED hot-key set, the adversarial case for the superstep
      // aggregates and the co-order pair count. Exponent ≈ 1 here is the
      // map-side-combine guarantee the twins exist to certify.
      ("graph_pagerank_skew", (d: String) => G.pageRankHubSkew(spark, d).count()),
      ("graph_components_skew", (d: String) => G.componentsHubSkew(spark, d).count()),
      ("graph_triangles_skew", (d: String) => G.trianglesHubSkew(spark, d).count()),
      // r13: the blocked wedge enumeration under k× load on the fixed 8-hub
      // key set — with a tiny wedgeCap every hub splits into many buckets,
      // so exponent ≈ 1 certifies the salt spreads d² wedge rows instead of
      // funneling them through one shuffle key
      ("graph_link_predict_skew",
        (d: String) => G.linkPredictHubSkew(spark, d, wedgeCap = 64).count()))
    println(f"${"probe"}%-18s ${"wall1"}%8s ${"wallK"}%8s ${"expW"}%6s ${"shuf1MB"}%8s ${"shufKMB"}%8s ${"expS"}%6s")
    probes.foreach { case (name, run) =>
      run(d1) // warm the shape once
      val (w1, s1) = measured(run(d1))
      val (wk, sk) = measured(run(dk))
      val expW = math.log(wk / w1) / math.log(bigK.toDouble)
      val expS = math.log(sk.toDouble / s1.toDouble) / math.log(bigK.toDouble)
      println(f"$name%-18s $w1%8.2f $wk%8.2f $expW%6.2f ${s1 / 1e6}%8.1f ${sk / 1e6}%8.1f $expS%6.2f")
    }
    spark.stop()
  }
}

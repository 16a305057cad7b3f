package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B probe for the r13 blocked wedge enumeration in
  * [[graft.operators.Graph.linkPredict]]: times the plain fixture at the
  * default wedgeCap (light mids unsalted, s = 1 everywhere on this
  * fixture) against an effectively-unsalted giant cap and a small cap
  * that forces real replication — isolating what the salt machinery
  * costs when idle and what it costs when active. Best-of-2, warm
  * shapes, local[32].
  *
  * Usage: `runMain graft.tools.LinkPredictProbe [sfDir]`.
  * Numbers land in DESIGN.md; harness tool, not a catalog query.
  */
object LinkPredictProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("link-predict-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val G = graft.operators.Graph
    def time2(body: => Unit): Double = {
      def once: Double = {
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      math.min(once, once)
    }
    // warm the shape once
    G.linkPredict(spark, dir).count()
    for ((label, cap) <- Seq(
        ("wedgeCap=1024 (default)", 1024),
        ("wedgeCap=1<<30 (salt idle)", 1 << 30),
        ("wedgeCap=16 (salt active)", 16))) {
      val t = time2(G.linkPredict(spark, dir, wedgeCap = cap).count())
      println(f"$label%-28s $t%6.2f s")
    }
    spark.stop()
  }
}

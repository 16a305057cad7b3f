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

    // WEDGE-ROWS-PER-KEY BOUND (VERDICT r12 #2 evidence): for the top-decile
    // backbone, compare the hottest join key's wedge output unsalted (one
    // key per mid → d² rows through one task) vs blocked at wedgeCap. The
    // per-key output of key (mid, ba, bb) is |bucket ba| · |bucket bb|, so
    // the max over keys is computable from bucket counts alone — no wedge
    // enumeration needed.
    import org.apache.spark.sql.functions._
    val sup = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_orderkey", "l_suppkey").distinct()
    val (ew, e) = G.sparsifiedCoServiceEdgesFrom(sup, 900)
    val adj = e.select(col("u").as("mid"), col("v").as("nb"))
      .union(e.select(col("v").as("mid"), col("u").as("nb")))
    val deg = adj.groupBy("mid").agg(count(lit(1)).as("d")).cache()
    val unsaltedMax = deg.agg(max(expr("d * d"))).head().getLong(0)
    for (cap <- Seq(1024, 64, 16)) {
      val buckets = adj.join(deg, "mid")
        .withColumn("s", expr(s"(d + ${cap - 1}L) div ${cap}L"))
        .withColumn("bs", pmod(hash(col("nb")).cast("bigint"), col("s")))
        .groupBy("mid", "bs").agg(count(lit(1)).as("c"))
      val maxBucket = buckets.groupBy("mid").agg(max("c").as("mc"))
        .agg(max(expr("mc * mc"))).head().getLong(0)
      println(f"max wedge rows/key: unsalted $unsaltedMax%,d -> wedgeCap=$cap%-6d $maxBucket%,d")
    }
    deg.unpersist(false); ew.unpersist(false)
    spark.stop()
  }
}

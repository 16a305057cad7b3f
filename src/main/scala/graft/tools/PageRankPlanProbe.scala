package graft.tools

import org.apache.spark.sql.SparkSession

/** Exchange-count + checkpoint-cadence probe for the PageRank superstep
  * loop: prints the Exchange/AQEShuffleRead operators of a 2-superstep
  * plan (is the persisted src-partitioning actually reused?) and times
  * the 5-iteration run at checkpoint cadences 2 / 4 / never, bench
  * config (local[32], 32 shuffle partitions).
  *
  * Usage: `runMain graft.tools.PageRankPlanProbe [sfDir]`.
  * Numbers land in DESIGN.md; this is a harness tool, not a catalog query.
  */
object PageRankPlanProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("pagerank-plan-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(label: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    // warm: parquet footers, codegen, broadcast machinery
    graft.operators.Graph.pageRank(spark, dir, iters = 1).count()

    time("edge build only (count)") {
      graft.operators.Graph.tradeEdges(spark, dir).count()
    }
    for (ck <- Seq(2, 4, 100)) time(s"pageRank iters=5 checkpointEvery=$ck") {
      graft.operators.Graph.pageRank(spark, dir, iters = 5, checkpointEvery = ck).count()
    }
    // exchange census of the un-checkpointed 2-superstep plan
    val df = graft.operators.Graph.pageRank(spark, dir, iters = 2, checkpointEvery = 100)
    val plan = df.queryExecution.executedPlan.toString
    val exchanges = "Exchange ".r.findAllIn(plan).size
    println(s"2-superstep plan: $exchanges Exchange operators")
    plan.linesIterator.filter(l => l.contains("Exchange") || l.contains("AQEShuffleRead"))
      .take(12).foreach(l => println("  " + l.trim.take(140)))
    spark.stop()
  }
}

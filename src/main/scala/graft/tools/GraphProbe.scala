package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off wall-clock decomposition of the graph family at a given SF:
  * edge-build vs per-superstep cost — the evidence behind the bench-row
  * tuning notes in DESIGN.md.
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      body
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    time("tradeEdges count") {
      println("edges=" + graft.operators.Graph.tradeEdges(spark, dir).count())
    }
    for (it <- Seq(1, 3, 5)) time(s"pageRank iters=$it") {
      graft.operators.Graph.pageRank(spark, dir, iters = it).count()
    }
    spark.stop()
  }
}

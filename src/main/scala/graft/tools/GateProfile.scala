package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage-level timing of the margin-mining agreement gate at sf0.1. */
object GateProfile {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .appName("gate-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"STAGE $label%-28s ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    // warm the session on a cheap query first
    graft.SparkEntry.queries("ann_topk")(spark, dir).collect()
    time("full gate (1st)") { graft.operators.Similarity.marginMiningIvfAgreement(spark, dir).collect() }
    time("full gate (2nd)") { graft.operators.Similarity.marginMiningIvfAgreement(spark, dir).collect() }
    time("exact miner alone") { graft.operators.Similarity.marginMining(spark, dir).collect() }
    time("ivf miner alone") { graft.operators.Similarity.marginMiningIvf(spark, dir).collect() }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-query hit counts of the hot-cell clustered recall gate at both
  * fixture scales and at the default / off-default clusterPermille —
  * the evidence behind `ivfRecallFloorClustered`'s minHits choice.
  *
  * Usage: `runMain graft.tools.ClusterGateProbe`.
  * Numbers land in DESIGN.md; this is a harness tool, not a catalog query.
  */
object ClusterGateProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("cluster-gate-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import graft.operators.Similarity
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01", "/root/testdata/sf0.1");
         permille <- Seq(900, 500)) {
      val clustered = Similarity.clusteredEmbeddings(spark, dir, permille).cache()
      clustered.count()
      val exact = Similarity.bruteForceTopKFrom(clustered, 10, 5)
        .select("q_id", "neighbor_id")
      val approx = Similarity.ivfTopKFrom(spark, clustered, 10, 5)
        .select("q_id", "neighbor_id")
      val hits = exact.join(approx, Seq("q_id", "neighbor_id"), "left_semi")
        .groupBy("q_id").agg(count(lit(1)).as("hits"))
        .orderBy("q_id").collect()
        .map(r => s"q${r.getLong(0)}=${r.getLong(1)}").mkString(" ")
      val inBall = clustered.filter(
        pmod(xxhash64(col("vec_id")), lit(1000L)) < permille &&
          col("vec_id") < 5).count()
      println(s"$dir permille=$permille hits: $hits (queries in ball: $inBall/5)")
      clustered.unpersist()
    }
    spark.stop()
  }
}

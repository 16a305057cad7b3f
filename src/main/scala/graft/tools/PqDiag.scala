package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object PqDiag {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .appName("pq-diag").config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (d <- Seq("/root/testdata/sf0.1", "/tmp/testdata-adv01-nobig");
         sl <- Seq(200, 400, 800); pc <- Seq(16, 32)) {
      val exact = graft.operators.Similarity.bruteForceTopK(spark, d, 10, 5).select("q_id", "neighbor_id")
      val approx = graft.operators.Similarity.pqTopK(spark, d, 10, 5,
        pqCentroids = pc, pqShortlist = sl).select("q_id", "neighbor_id")
      val hits = exact.join(approx, Seq("q_id", "neighbor_id"))
        .groupBy("q_id").agg(count(lit(1)).as("n")).orderBy("q_id")
        .collect().map(r => s"${r.getLong(1)}").mkString(",")
      println(s"PQDIAG dir=${d.split('/').last} shortlist=$sl centroids=$pc hits=[$hits]")
    }
    spark.stop()
  }
}

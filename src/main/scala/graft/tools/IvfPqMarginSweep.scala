package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Similarity

/** Measures the IVF-PQ recall gate's per-query hits across (numProbes,
  * pqShortlist) — the PqDiag recipe for the COMPOSED path, after
  * GateMarginProbe (r17) showed the ivfpq trio holding only a one-hit
  * margin (min-hits 4 vs floor 3, identical on pristine and adversarial
  * sf0.1). The sweep answers whether a wider probe ring or deeper
  * shortlist buys a real margin and at what wall cost, so the default is
  * picked on evidence rather than left at the knife's edge.
  */
object IvfPqMarginSweep {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.1", "/tmp/testdata-adv01-nobig")
        .filter(d => new java.io.File(d).isDirectory)
    val spark = SparkSession.builder().master("local[32]")
      .appName("ivfpq-margin-sweep")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- dirs; probes <- Seq(8, 10, 12); shortlist <- Seq(400, 800)) {
      val t0 = System.nanoTime()
      val exact = Similarity.bruteForceTopK(spark, dir, 10, 5)
        .select("q_id", "neighbor_id")
      val approx = Similarity.ivfPqTopK(spark, dir, 10, 5,
        numProbes = probes, pqShortlist = shortlist)
        .select("q_id", "neighbor_id")
      val hits = exact.join(approx, Seq("q_id", "neighbor_id"))
        .groupBy("q_id").agg(count(lit(1)).as("n")).orderBy("q_id")
        .collect().map(_.getLong(1))
      println(f"IVFPQSWEEP dir=${dir.split('/').last}%s probes=$probes%d " +
        f"shortlist=$shortlist%d min=${hits.min}%d hits=[${hits.mkString(",")}%s] " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}

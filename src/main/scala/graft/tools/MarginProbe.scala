package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.Similarity

/** Probe for the margin-mining IVF configuration: times the exact miner
  * against [[Similarity.marginMiningIvf]] at candidate quantizer shapes
  * (numCentroids, numProbes) and prints each shape's agreement-gate row
  * ([[Similarity.marginMiningIvfAgreement]] semantics) so the production
  * default can be picked on evidence — lowest wall time among shapes that
  * keep full anchor coverage and clear the 70% partner-agreement floor.
  *
  * The tension the probe measures: the symmetric multiprobe candidate
  * fraction is ~1 − (1 − p/C)², so 8-of-16 probes admit ~75% of all pairs
  * (nearly the exact scan's work, paid through shuffles), while 4-of-32
  * admits ~23% — but recall, and with it the agreement floor, drops as
  * the ring narrows. Bench-config session (local[32], 32 shuffle
  * partitions).
  *
  * Usage: `runMain graft.tools.MarginProbe [sfDir]`.
  * Numbers land in DESIGN.md; this is a harness tool, not a catalog query.
  */
object MarginProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("margin-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // warm the JVM + parquet footers on both paths, then measure
    Similarity.marginMining(spark, dir).count()
    Similarity.marginMiningIvf(spark, dir).count()
    val (_, tExact) = time(Similarity.marginMining(spark, dir).count())
    println(f"exact: $tExact%.2f s")

    for ((c, p) <- Seq((16, 8), (16, 4), (32, 8), (32, 4), (64, 4))) {
      val (_, t) = time(Similarity.marginMiningIvf(spark, dir,
        numCentroids = c, numProbes = p).count())
      val gate = Similarity.marginMiningIvfAgreement(spark, dir,
        numCentroids = c, numProbes = p)
        .collect().map(r => s"${r.getString(0)}=${r.getBoolean(1)}").mkString(" ")
      println(f"ivf C=$c%-3d P=$p%-2d wall=$t%.2f s  $gate")
    }
    spark.stop()
  }
}

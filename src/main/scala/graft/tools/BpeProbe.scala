package graft.tools

import org.apache.spark.sql.SparkSession

/** Round-9 probe: BPE training wall vs merge count for the two paths —
  * the distributed per-rank fold (one Spark job + driver argmax per
  * merge: correct, but linear in MERGE COUNT with a per-job barrier
  * constant) and the driver-side incremental trainer over the collected
  * vocab-bounded word-type histogram (one Spark job TOTAL; per-merge work
  * proportional to the words actually touched, served from the lazy-heap
  * pair index). Merge tables asserted identical at every probed count.
  *
  * The production question this answers: at a 32k-merge tokenizer
  * vocabulary, does training cost 32k serial Spark barriers, or one
  * corpus scan + an in-memory loop? Numbers land in DESIGN.md.
  */
object BpeProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[32]")
      .appName("bpe-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def run(numMerges: Int, threshold: Int): (Double, Seq[(Int, String, String, String, Long)]) = {
      val t0 = System.nanoTime()
      val rows = graft.operators.TextAnalysis
        .bpeMerges(spark, dir, numMerges, driverMergeThreshold = threshold)
        .collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getString(3), r.getLong(4)))
        .sortBy(_._1).toSeq
      ((System.nanoTime() - t0) / 1e9, rows)
    }

    // warm the JVM/plan paths once
    run(4, Int.MaxValue); run(4, 0)

    for (m <- Seq(16, 64, 256)) {
      val (wDist, tDist) = run(m, Int.MaxValue) // force distributed
      val (wDrv, tDrv) = run(m, 0) // force driver
      require(tDist == tDrv, s"paths diverged at $m merges")
      println(f"[bpe] merges=$m%-4d distributed=$wDist%7.2fs driver=$wDrv%7.2fs table=${tDist.length} rows")
    }
    spark.stop()
  }
}

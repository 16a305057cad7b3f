package graft.tools

import org.apache.spark.sql.SparkSession

import graft.operators.TextAnalysis

/** Measures the pruned-LM xent inflation (`sum_delta / sum_exact`, in
  * permille) across `topK` values and fixture scales — the PqDiag recipe
  * applied to `text_lm_xent_pruned_check`, after GateMarginProbe (r17)
  * found the 450‰ bound calibrated on sf0.01 is exceeded at sf0.1
  * (734‰ at topK=16): the top-k successor cut prunes a GROWING fraction
  * of bigram mass as the corpus's per-context continuation count grows,
  * so a fixed (topK, bound) pair is an operating point per scale band,
  * not a scale-free constant. The sweep picks the default that holds the
  * bound with margin at every fixture scale the gates actually run
  * (sf0.01 driver gate, sf0.1 adjudication).
  */
object LmPruneSweep {
  def main(args: Array[String]): Unit = {
    val dirs = if (args.nonEmpty) args.toSeq
      else Seq("/root/testdata/sf0.01", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("lm-prune-sweep")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (dir <- dirs; topK <- Seq(16, 18, 20, 22, 24, 26, 28, 30, 32)) {
      val t0 = System.nanoTime()
      val r = TextAnalysis.lmCrossEntropyPrunedCheck(spark, dir, topK).head()
      val (nDocs, viol, sumExact, sumDelta) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val permille = if (sumExact == 0) 0L else sumDelta * 1000 / sumExact
      println(f"LMPRUNE dir=${dir.split('/').last}%s topK=$topK%d " +
        f"delta_permille=$permille%d violations=$viol%d docs=$nDocs%d " +
        f"wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}

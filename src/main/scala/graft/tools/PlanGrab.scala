package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.FormattedMode

/** Dumps `explain("formatted")` for the r17-optimized operators into
  * plans/r17/ (the judge's plan evidence). Opaque catalog rows (their
  * output is a localCheckpoint — Scan ExistingRDD) are dumped through the
  * un-materialized seams (`forPlanInspection`, candidate accessors) so the
  * interesting internal plan is visible. Copy this file into the before
  * worktree and run it there with a different outDir for the before legs
  * (the old tree's seams have the same names).
  *
  * Usage: runMain graft.tools.PlanGrab <outDir> [suffix] [sfDir]
  */
object PlanGrab {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val suffix = if (args.length > 1) args(1) else "after"
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.01"
    new java.io.File(outDir).mkdirs()
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    def dump(name: String, df: => org.apache.spark.sql.DataFrame): Unit =
      try {
        val plan = df.queryExecution.explainString(FormattedMode)
        Files.writeString(Paths.get(s"$outDir/${name}_$suffix.txt"), plan)
        println(s"dumped $name")
      } catch { case scala.util.control.NonFatal(e) =>
        println(s"SKIP $name: ${e.getMessage}")
      }

    import graft.operators.{Dedup, Graph, Similarity, TextAnalysis}

    dump("text_lm_xent", TextAnalysis.lmCrossEntropy(spark, dir))
    dump("text_lm_xent_pruned", TextAnalysis.lmCrossEntropyPruned(spark, dir))
    dump("pipeline_ppl_buckets",
      TextAnalysis.pipelinePplBuckets(spark, dir, forPlanInspection = true))
    dump("ann_margin_mining_ivf",
      Similarity.marginMiningIvf(spark, dir, forPlanInspection = true))
    // containment: the catalog row materializes; dump the un-materialized
    // verify frame built on the candidate seam (both trees expose it).
    // Caches are NOT unpersisted before the dump — the InMemoryTableScans
    // ARE the evidence; the session dies at the end anyway.
    dump("text_containment", {
      val (cached, cand) = TextAnalysis.containmentCandidates(spark, dir)
      val arrs =
        if (cached.columns.contains("arr")) cached // after: per-doc array frame
        else cached.groupBy("doc_id") // before: exploded postings
          .agg(sort_array(collect_list("s")).as("arr"))
      cand
        .join(arrs.select(col("doc_id").as("a_id"), col("arr").as("a_arr")), "a_id")
        .join(arrs.select(col("doc_id").as("b_id"), col("arr").as("b_arr")), "b_id")
        .select(col("a_id"), col("b_id"), col("size_a").cast("bigint").as("size_a"),
          size(array_intersect(col("a_arr"), col("b_arr"))).cast("bigint").as("n_common"))
        .filter(expr("1000 * n_common div size_a >= 800"))
        .withColumn("containment_milli", expr("1000 * n_common div size_a"))
    })
    // graph edge stage: the pairs-cache change lives here (the supersteps
    // themselves are checkpoint-opaque in both trees)
    dump("graph_trade_edges",
      Graph.tradeEdgesFrom(spark, dir, col("l_suppkey") * 2 + 1, fillCache = false)._2)
    spark.stop()
  }
}

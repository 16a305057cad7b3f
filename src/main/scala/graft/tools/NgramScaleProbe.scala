package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling probe for the char-ngram near-dup path after the round-5
  * signature-agreement rework: replicates the documents table K× with a
  * replica-specific prefix (shifts every 5-gram window, so replicas are
  * near-dups of their source but not byte-identical — the worst case for
  * banding) and times `Dedup.ngramNearDups` end to end.
  *
  * What to look for: the band-join match STREAM grows ~quadratically on
  * this high-background-similarity corpus (that is the corpus's nature,
  * not a plan defect — see the MinHashMixedSignature scaladoc), but it is
  * scanned inside the join, never shuffled; the shuffled survivor set
  * tracks the true-pair count (~linear in K here). So wall-clock should
  * grow distinctly slower than K² while output pairs grow ~linearly.
  *
  * Usage: `runMain graft.tools.NgramScaleProbe [sfDir] [maxFactor]`.
  * Numbers land in DESIGN.md; this is a harness tool, not a catalog query.
  */
object NgramScaleProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxFactor = args.drop(1).headOption.map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder().master("local[32]")
      .appName("ngram-scale-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$dir/documents.parquet")
    def time[A](body: => A): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    var k = 1
    while (k <= maxFactor) {
      val parts = (0 until k).map { i =>
        base.select(
          (col("doc_id") + lit(i * 10000000L)).as("doc_id"),
          (if (i == 0) col("text")
           else concat(lit("r" + i + " "), col("text"))).as("text"),
          col("lang"), col("source"), col("n_chars"))
      }
      val tmp = java.nio.file.Files.createTempDirectory(s"ngram-probe-$k").toString
      parts.reduce(_ union _).repartition(32)
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val docs = spark.read.parquet(s"$tmp/documents.parquet")
      val n = docs.count()
      var pairs = 0L
      val t = time { pairs = graft.operators.Dedup.ngramNearDups(spark, tmp).count() }
      println(f"NGRAM_PROBE k=$k docs=$n pairs=$pairs seconds=$t%.2f")
      k *= 2
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling probe for the round-4 corpus operators: replicates the documents
  * table K× and times
  *
  *   - [[graft.operators.TextAnalysis.lineDedup]] — expected near-linear
  *     (one cached segment pass + broadcast mark join + one agg). Each
  *     replica's text gets a distinct one-word prefix, which SHIFTS the
  *     10-word segment alignment, so replicas share almost no segments and
  *     the boilerplate rate stays realistic instead of saturating.
  *   - [[graft.operators.Dedup.incrementalNearDups]] with a FIXED-size
  *     increment vs a growing corpus — expected ~linear in corpus size
  *     (the corpus-side band table) with the broadcast increment constant.
  *
  * Usage: `runMain graft.tools.TextScaleProbe [sfDir] [maxFactor]`.
  * Numbers land in DESIGN.md; this is a harness tool, not a catalog query.
  */
object TextScaleProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxFactor = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[32]")
      .appName("text-scale-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$dir/documents.parquet").select("doc_id", "text")
    base.count()

    def time[A](body: => A): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    var k = 1
    while (k <= maxFactor) {
      val parts = (0 until k).map(i => base.select(
        (col("doc_id") + lit(i * 1000000L)).as("doc_id"),
        concat(lit(s"r$i "), col("text")).as("text")))
      val tmp = java.nio.file.Files.createTempDirectory(s"text-scale-$k").toString
      val docs = parts.reduce(_ union _)
      docs.write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      val n = spark.read.parquet(s"$tmp/documents.parquet").count()
      val line = time { graft.operators.TextAnalysis.lineDedup(spark, tmp).count() }
      // fixed-size increment (the LAST replica) vs a growing corpus
      val inc = if (k == 1) Double.NaN else time {
        graft.operators.Dedup.incrementalNearDups(spark, tmp, splitId = (k - 1) * 1000000L).count()
      }
      println(f"[probe] n=$n%7d (x$k) line_dedup=${line}%6.2fs incremental=${inc}%6.2fs")
      // don't leave K corpus copies in /tmp
      new scala.reflect.io.Directory(new java.io.File(tmp)).deleteRecursively()
      k *= 2
    }
    spark.stop()
  }
}

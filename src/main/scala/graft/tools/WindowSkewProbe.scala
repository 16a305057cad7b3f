package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scaling probe for the round-7 low-cardinality ranked-window twins
  * (`q_ntile_skew`, `q_percentile_disc_skew`): replicate the input K×
  * (fresh keys per replica) and time the plain window form against the
  * histogram-decomposition twin, outputs asserted identical first.
  *
  * What to look for: the plain forms rank inside windows partitioned by a
  * handful-of-values key (5 market segments / 3 return flags), so their
  * per-task sort grows linearly with K while parallelism stays capped at
  * the key cardinality. The twins' corpus-side work is a map-side-combined
  * histogram aggregate (+ a high-cardinality tie window for NTILE), so
  * wall-clock should stay near-flat in K.
  *
  * Usage: `runMain graft.tools.WindowSkewProbe [sfDir] [maxFactor]`.
  * Numbers land in DESIGN.md; this is a harness tool, not a catalog query.
  */
object WindowSkewProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxFactor = args.drop(1).headOption.map(_.toInt).getOrElse(16)
    // "dup" keeps the cents domain FIXED as the corpus grows (the bounded-
    // domain regime the twin is designed for — acctbal has ≤1.1M possible
    // cents at any corpus size); "jitter" grows the domain with the corpus
    // (the regime where the twin's histogram is corpus-sized and the plain
    // form should be preferred).
    val mode = args.drop(2).headOption.getOrElse("dup")
    val spark = SparkSession.builder().master("local[32]")
      .appName("window-skew-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time[A](body: => A): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def time2[A](body: => A): Double = math.min(time(body), time(body))

    val cust = spark.read.parquet(s"$dir/customer.parquet")
      .select("c_custkey", "c_mktsegment", "c_acctbal")
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
      .select("l_returnflag", "l_quantity", "l_orderkey", "l_linenumber")
    val nCust = cust.agg(max("c_custkey")).head().getLong(0) + 1
    val nOrd = li.agg(max("l_orderkey")).head().getLong(0) + 1

    // Replicas get fresh keys AND (for customer) a per-replica cents
    // offset: a real 100× corpus has ~100× distinct balances, not 100
    // copies of each one — duplicating values verbatim would grow the
    // twin's tie groups K-fold, a shape real scale-up doesn't have.
    // (lineitem's quantity keeps its fixed 50-value domain — that IS the
    // realistic shape for the percentile probe.)
    def replicate(df: DataFrame, k: Int, keyCols: Map[String, Long],
        jitterCol: Option[String] = None): DataFrame =
      (0 until k).map { r =>
        val keyed = keyCols.foldLeft(df) { case (d, (c, span)) =>
          d.withColumn(c, col(c) + lit(r * span))
        }
        jitterCol.fold(keyed)(c => keyed.withColumn(c, col(c) + lit(r * 0.01)))
      }.reduce(_ unionByName _)

    val tempDirs = scala.collection.mutable.ArrayBuffer[String]()
    try {
      var k = 1
      while (k <= maxFactor) {
        val tmp = Files.createTempDirectory(s"wskew-$k").toString
        tempDirs += tmp
        replicate(cust, k, Map("c_custkey" -> nCust),
            jitterCol = if (mode == "jitter") Some("c_acctbal") else None)
          .write.mode("overwrite").parquet(s"$tmp/customer.parquet")
        replicate(li, k, Map("l_orderkey" -> nOrd))
          .write.mode("overwrite").parquet(s"$tmp/lineitem.parquet")

        // correctness first (once per K): twins must stay bit-equal
        val ntPlain = graft.operators.Relational.ntileDeciles(spark, tmp)
        val ntTwin = graft.operators.Relational.ntileDecilesSkewSafe(spark, tmp)
        require(ntPlain.exceptAll(ntTwin).isEmpty && ntTwin.exceptAll(ntPlain).isEmpty,
          s"K=$k: ntile twin diverged")
        val pcPlain = graft.operators.Relational.percentileDisc(spark, tmp)
        val pcTwin = graft.operators.Relational.percentileDiscSkewSafe(spark, tmp)
        require(pcPlain.exceptAll(pcTwin).isEmpty && pcTwin.exceptAll(pcPlain).isEmpty,
          s"K=$k: percentile twin diverged")

        val tNtP = time2(graft.operators.Relational.ntileDeciles(spark, tmp).count())
        val tNtT = time2(graft.operators.Relational.ntileDecilesSkewSafe(spark, tmp).count())
        val tPcP = time2(graft.operators.Relational.percentileDisc(spark, tmp).count())
        val tPcT = time2(graft.operators.Relational.percentileDiscSkewSafe(spark, tmp).count())
        println(f"PROBE K=$k%-3d cust=${nCust * k}%-9d li=${nOrd * k}%-9d " +
          f"ntile plain=$tNtP%.2fs twin=$tNtT%.2fs | pctile plain=$tPcP%.2fs twin=$tPcT%.2fs")
        k *= 4
      }
    } finally {
      tempDirs.foreach(d =>
        new scala.reflect.io.Directory(new java.io.File(d)).deleteRecursively())
      spark.stop()
    }
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-timing probe for [[graft.operators.Dedup.ngramNearDups]] (5.4 s
  * at sf0.1 in the r11 bench): separates the string 5-gram array build,
  * the 24+128-hash signature pass, the banded self-join with the inline
  * agreement filter, and the string-array verification — so a hashed-
  * shingle rewrite (longs through signatures AND verify, the
  * text_containment recipe) is adopted only if the string stages actually
  * carry the time.
  *
  * Usage: `runMain graft.tools.NgramDedupProbe [sfDir]`.
  * Numbers land in DESIGN.md; this is a harness tool, not a catalog query.
  */
object NgramDedupProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("ngram-dedup-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"$label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }

    import graft.operators.Dedup
    time("ngram e2e (cold)") { Dedup.ngramNearDups(spark, dir).count() }
    time("ngram e2e (warm)") { Dedup.ngramNearDups(spark, dir).count() }

    // stage dissection from the same public pieces
    val arrays = Dedup.charShingleArrays(spark, dir).cache()
    time("string shingle arrays fill") { println(s"  docs=${arrays.count()}") }
    val P1 = graft.functions.Portable.P1
    val base = s"graft_poly_hash_array(shingles, 31, ${P1}L)"
    val sigs = arrays.select(
      col("doc_id"),
      expr(s"graft_minhash($base, 24)").as("sig"),
      expr(s"transform(graft_minhash_mix($base, 128), " +
        "h -> CAST(h % 128 AS TINYINT))").as("sigb")).cache()
    time("signatures fill") { println(s"  sigs=${sigs.count()}") }
    // hashed-shingle alternative for the SAME signature values: poly-hash
    // the 5-gram windows straight off the text (set of hashes identical to
    // hashing the distinct string shingles; min is duplicate-blind)
    val hashedSigs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), expr(
        s"CASE WHEN length(text) >= 5 THEN graft_shingle_poly(text, 5, 31, ${P1}L) " +
          s"ELSE array(graft_poly_hash(text, 31, ${P1}L)) END").as("hs"))
      .select(col("doc_id"),
        expr("graft_minhash(hs, 24)").as("sig"),
        expr("transform(graft_minhash_mix(hs, 128), " +
          "h -> CAST(h % 128 AS TINYINT))").as("sigb")).cache()
    time("hashed-shingle signatures fill") { println(s"  sigs=${hashedSigs.count()}") }
    time("signature equality check") {
      val d = sigs.exceptAll(hashedSigs).count() + hashedSigs.exceptAll(sigs).count()
      println(s"  sym-diff=$d")
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off decomposition of link_fuzzy_names wall time. */
object FuzzyProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(body: => Any): Unit = {
      val t0 = System.nanoTime()
      val r = body
      println(f"$label%-30s ${(System.nanoTime() - t0) / 1e9}%.2f s  ($r)")
    }
    val c = spark.read.parquet(s"$dir/customer.parquet").select("c_custkey", "c_name")
    val v = c.select(col("c_custkey"), col("c_name"),
      explode(expr("""array_distinct(transform(sequence(0, length(c_name)),
        i -> concat(substring(c_name, 1, i), substring(c_name, i + 2))))""")).as("variant"))
    time("explode count")(v.count())
    time("explode count again")(v.count())
    val j = v.toDF("key_a", "name_a", "variant_a")
      .join(v.toDF("key_b", "name_b", "variant_b"),
        col("variant_a") === col("variant_b") && col("key_a") < col("key_b"))
    time("join count (no lev)")(j.count())
    time("join+distinct")(j.select("key_a", "name_a", "key_b", "name_b").distinct().count())
    time("join+distinct+lev")(j.select("key_a", "name_a", "key_b", "name_b").distinct()
      .filter(levenshtein(col("name_a"), col("name_b")) <= 1).count())
    time("full operator")(graft.operators.Relational.fuzzyNameJoin(spark, dir).count())
    time("full operator again")(graft.operators.Relational.fuzzyNameJoin(spark, dir).count())

    // FastSS scaling: k disjoint name universes (a per-copy prefix keeps
    // deletion neighborhoods inside copies), wall exp = log(ratio)/log(k)
    val bigK = 8
    def replicate(k: Int): String = {
      val out = java.nio.file.Files.createTempDirectory(s"fuzzy-x$k").toString
      val copies = spark.range(k).select(col("id").as("copy"))
      spark.read.parquet(s"$dir/customer.parquet")
        .crossJoin(copies)
        .selectExpr("c_custkey + copy * 10000000 AS c_custkey",
          "concat('C', copy, '_', c_name) AS c_name")
        .write.mode("overwrite").parquet(s"$out/customer.parquet")
      out
    }
    val d1 = replicate(1); val dk = replicate(bigK)
    graft.operators.Relational.fuzzyNameJoin(spark, d1).count() // warm
    def wall(d: String): Double = {
      val t0 = System.nanoTime()
      graft.operators.Relational.fuzzyNameJoin(spark, d).count()
      (System.nanoTime() - t0) / 1e9
    }
    val w1 = wall(d1); val wk = wall(dk)
    println(f"fastss x1=$w1%.2f s  x$bigK=$wk%.2f s  expW=${math.log(wk / w1) / math.log(bigK.toDouble)}%.2f")
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-timing probe for
  * [[graft.operators.TextAnalysis.containmentJoin]] (7.3 s at sf0.1 in the
  * r11 bench): shingle postings, document frequency + prefix ranking
  * windows, candidate generation, and the sorted-array verify are timed
  * separately so the optimization lands on the real cost.
  *
  * Usage: `runMain graft.tools.ContainProbe [sfDir]`.
  * Numbers land in DESIGN.md; this is a harness tool, not a catalog query.
  */
object ContainProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("contain-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val a = f
      println(f"$label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s")
      a
    }

    import graft.operators.TextAnalysis
    time("containment e2e (cold)") { TextAnalysis.containmentJoin(spark, dir).count() }
    time("containment e2e (warm)") { TextAnalysis.containmentJoin(spark, dir).count() }

    val (k, tMilli) = (12, 800)
    val shC = spark.read.parquet(s"$dir/documents.parquet")
      .filter(length(col("text")) >= k)
      .select(col("doc_id"),
        explode(array_distinct(expr(s"graft_shingle_hash60(text, $k)"))).as("s"))
      .cache()
    time("postings fill") { println(s"  postings=${shC.count()}") }
    val df = shC.groupBy("s").agg(count(lit(1)).as("dfreq"))
    val ranked = shC.join(df, "s")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")
          .orderBy(col("dfreq").asc, col("s").asc)))
      .withColumn("size_a", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("doc_id")))
    val prefix = ranked
      .filter(col("rk") <= col("size_a") - expr(s"($tMilli * size_a + 999) div 1000") + 1)
      .select(col("doc_id").as("a_id"), col("s"), col("size_a")).cache()
    time("prefix fill (df+windows)") { println(s"  prefix=${prefix.count()}") }
    val sizes = shC.groupBy("doc_id").agg(count(lit(1)).as("size_b"))
    val cand = prefix.join(shC.select(col("doc_id").as("b_id"), col("s")), "s")
      .filter(col("a_id") =!= col("b_id"))
      .select("a_id", "b_id", "size_a").distinct()
      .join(sizes.select(col("doc_id").as("b_id"), col("size_b")), "b_id")
      .filter(col("size_b") >= expr(s"($tMilli * size_a + 999) div 1000"))
      .select("a_id", "b_id", "size_a").cache()
    time("candidates fill") { println(s"  cand=${cand.count()}") }
    val arrs = shC.groupBy("doc_id").agg(sort_array(collect_list("s")).as("arr"))
    time("array verify") {
      val n = cand
        .join(arrs.select(col("doc_id").as("a_id"), col("arr").as("a_arr")), "a_id")
        .join(arrs.select(col("doc_id").as("b_id"), col("arr").as("b_arr")), "b_id")
        .select(col("a_id"), col("b_id"),
          size(array_intersect(col("a_arr"), col("b_arr"))).as("n_common"))
        .count()
      println(s"  verified=$n")
    }
    spark.stop()
  }
}

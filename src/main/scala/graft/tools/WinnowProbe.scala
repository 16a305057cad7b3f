package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-timing probe for [[graft.operators.TextAnalysis.winnowingOverlap]]
  * — the slowest catalog row of the r11 bench (11.1 s at sf0.1). Times the
  * pipeline's stages separately (fingerprint postings, document frequency,
  * df-capped keep set, pair aggregation, gated output) so optimization
  * effort lands where the time actually is, and compares the posting
  * SELF-JOIN pair enumeration against a grouped-array alternative
  * (collect postings per hash — bounded by the df cap — and explode the
  * C(df, 2) pairs from the array) to decide whether the join is the cost.
  *
  * Usage: `runMain graft.tools.WinnowProbe [sfDir]`.
  * Numbers land in DESIGN.md; this is a harness tool, not a catalog query.
  */
object WinnowProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("winnow-probe")
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

    val (k, w, maxDfPermille) = (8, 4, 20)
    // the winnowSelected stage, reproduced via the public single-doc query
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println(s"docs=${docs.count()}")

    import graft.operators.TextAnalysis
    // end-to-end twice: cold then warm
    time("overlap e2e (cold)") { TextAnalysis.winnowingOverlap(spark, dir).count() }
    time("overlap e2e (warm)") { TextAnalysis.winnowingOverlap(spark, dir).count() }
    // fingerprint selection alone (the winnowing summary row shares it)
    time("fingerprints only") { TextAnalysis.winnowing(spark, dir, k, w).count() }

    // stage dissection: rebuild the pipeline from the same public pieces
    val post = docs
      .filter(length(col("text")) >= k + w - 1)
      .select(col("doc_id"),
        expr(s"transform(sequence(1, length(text) - ${k - 1}), " +
          s"i -> graft_poly_hash(substring(text, i, $k), 31, ${graft.functions.Portable.P1}L))").as("hs"))
      .select(col("doc_id"), explode(expr(
        s"array_distinct(transform(transform(sequence(1, size(hs) - ${w - 1}), " +
          s"j -> aggregate(sequence(0, ${w - 1}), " +
          "named_struct('h', 9223372036854775807L, 'pos', -1L), " +
          "(acc, o) -> IF(element_at(hs, CAST(j + o AS INT)) <= acc.h, " +
          "named_struct('h', element_at(hs, CAST(j + o AS INT)), 'pos', CAST(j + o AS BIGINT)), " +
          "acc))), s -> s.h))")).as("h"))
      .cache()
    time("postings fill") { println(s"  postings=${post.count()}") }

    // lean alternative: the overlap detector drops positions, so the
    // per-window fold can be a plain long min (no struct allocation) and
    // the distinct collapses window-level duplicates identically
    val postLean = docs
      .filter(length(col("text")) >= k + w - 1)
      .select(col("doc_id"),
        expr(s"transform(sequence(1, length(text) - ${k - 1}), " +
          s"i -> graft_poly_hash(substring(text, i, $k), 31, ${graft.functions.Portable.P1}L))").as("hs"))
      .select(col("doc_id"), explode(expr(
        s"array_distinct(transform(sequence(1, size(hs) - ${w - 1}), " +
          s"j -> aggregate(sequence(0, ${w - 1}), 9223372036854775807L, " +
          "(acc, o) -> least(acc, element_at(hs, CAST(j + o AS INT))))))")).as("h"))
      .cache()
    time("lean postings fill") { println(s"  postings=${postLean.count()}") }
    time("lean vs struct identical") {
      val d = postLean.exceptAll(post).count() + post.exceptAll(postLean).count()
      println(s"  sym-diff=$d")
    }
    val df = post.groupBy("h").agg(count(lit(1)).as("dfreq"))
    val nDocs = post.agg(countDistinct("doc_id").as("nd"))
    val keep = post.join(df, "h")
      .crossJoin(broadcast(nDocs))
      .filter(col("dfreq") * 1000 <= col("nd") * maxDfPermille)
      .select("doc_id", "h")
      .cache()
    time("keep fill") { println(s"  keep=${keep.count()}") }
    time("pair self-join agg") {
      val n = keep.as("a").join(keep.as("b"),
          col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
        .groupBy(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
        .agg(count(lit(1)).as("n_shared")).count()
      println(s"  pairs=$n")
    }
    time("grouped-array pair agg") {
      val n = keep.groupBy("h").agg(sort_array(collect_list("doc_id")).as("ds"))
        .select(explode(expr(
          """flatten(transform(ds, (x, i) ->
            | transform(slice(ds, i + 2, size(ds)), y -> struct(x AS a_id, y AS b_id))))"""
            .stripMargin)).as("p"))
        .groupBy(col("p.a_id"), col("p.b_id")).agg(count(lit(1)).as("n_shared"))
        .count()
      println(s"  pairs=$n")
    }
    spark.stop()
  }
}

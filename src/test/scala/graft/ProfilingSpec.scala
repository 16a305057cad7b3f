package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ProfilingSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = SparkSpec.testDataDir

  test("selectTokenBudget equals the naive global-sort prefix, budget never exceeded") {
    import org.apache.spark.sql.expressions.Window
    // ground truth: ORDER BY (quality_key DESC, doc_id) global running sum
    val base = spark.read.parquet(s"$dir/documents.parquet")
      .filter(length(col("text")) > 0)
      .select(
        col("doc_id"),
        size(split(trim(col("text")), "\\s+")).cast("bigint").as("n_tokens"),
        expr("CAST(regexp_count(text, '[a-zA-Z]') AS BIGINT)").as("n_alpha"),
        length(col("text")).cast("bigint").as("n_chars"))
      .withColumn("quality_key", expr("n_alpha * 1000 div n_chars"))
    val w = Window.orderBy(desc("quality_key"), col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    for (budget <- Seq(1000L, 20000L, 10000000L)) {
      val truth = base.withColumn("cum", sum("n_tokens").over(w))
        .filter(col("cum") <= budget).select("doc_id")
        .collect().map(_.getLong(0)).toSet
      val got = graft.operators.TextAnalysis.selectTokenBudget(spark, dir, budget)
      val gotIds = got.select("doc_id").collect().map(_.getLong(0)).toSet
      assert(gotIds == truth, s"budget=$budget: histogram route != global prefix " +
        s"(${(gotIds -- truth).take(3)} / ${(truth -- gotIds).take(3)})")
      val spent = got.agg(sum("n_tokens")).head().getLong(0)
      assert(spent <= budget, s"budget=$budget overspent: $spent")
    }
    // a huge budget selects every non-empty document
    val all = base.count()
    assert(graft.operators.TextAnalysis.selectTokenBudget(spark, dir, Long.MaxValue / 4)
      .count() == all)
  }

  test("sampleMixture: per-language counts follow the weights, window-equivalent, deterministic") {
    import org.apache.spark.sql.expressions.Window
    val got = graft.operators.TextAnalysis.sampleMixture(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val caps = Map("en" -> 60L, "zh" -> 30L, "de" -> 30L, "es" -> 15L, "fr" -> 15L)
    val perLang = got.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val strata = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    for ((l, cap) <- caps)
      assert(perLang.getOrElse(l, 0L) == math.min(cap, strata.getOrElse(l, 0L)),
        s"$l: got ${perLang.get(l)} want min($cap, ${strata.get(l)})")
    // equals the per-stratum window form with the same caps
    graft.functions.GraftFunctions.register(spark)
    val w = Window.partitionBy("lang").orderBy(col("rank_hash"), col("doc_id"))
    val capCase = "CASE lang WHEN 'en' THEN 60 WHEN 'zh' THEN 30 WHEN 'de' THEN 30 " +
      "WHEN 'es' THEN 15 WHEN 'fr' THEN 15 ELSE 0 END"
    val win = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"),
        graft.functions.Portable.polyHashNative("text", 43, 999999893L).as("rank_hash"))
      .withColumn("mix_rank", row_number().over(w).cast("bigint"))
      .filter(col("mix_rank") <= expr(capCase))
      .select("doc_id", "lang", "mix_rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSet == win.toSet, "heap-aggregate mixture must equal the window form")
  }

  test("sampleTemperature: integer-exact sqrt targets, flattening property, window-equivalent") {
    import org.apache.spark.sql.expressions.Window
    val total = 200L
    val got = graft.operators.TextAnalysis.sampleTemperature(spark, dir, total).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // targets recomputed independently: floor(sqrt(n)) weights, integer div
    val strata = spark.read.parquet(s"$dir/documents.parquet")
      .groupBy("lang").count().collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val wts = strata.view.mapValues(n => math.sqrt(n.toDouble).toLong).toMap
    val sumW = wts.values.sum
    val targets = wts.view.mapValues(w => total * w / sumW).toMap
    val perLang = got.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    for ((l, t) <- targets)
      assert(perLang.getOrElse(l, 0L) == math.min(t, strata(l)),
        s"$l: got ${perLang.get(l)} want min($t, ${strata(l)})")
    // temperature flattening: the dominant language's share of the sample
    // must be BELOW its raw corpus share, every minority's at-or-above
    val nCorpus = strata.values.sum
    val nSample = got.length.toLong
    val dominant = strata.maxBy(_._2)._1
    assert(perLang(dominant).toDouble / nSample < strata(dominant).toDouble / nCorpus,
      s"dominant $dominant not down-weighted")
    for ((l, n) <- strata if l != dominant)
      assert(perLang(l).toDouble / nSample >= n.toDouble / nCorpus - 1e-9,
        s"minority $l lost share")
    // equals the per-stratum window form with the same targets
    graft.functions.GraftFunctions.register(spark)
    val w = Window.partitionBy("lang").orderBy(col("rank_hash"), col("doc_id"))
    val win = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("lang"),
        graft.functions.Portable.polyHashNative("text", 43, 999999893L).as("rank_hash"))
      .withColumn("mix_rank", row_number().over(w).cast("bigint"))
      .withColumn("t", element_at(typedLit(targets.toMap), col("lang")))
      .filter(col("mix_rank") <= col("t"))
      .select("doc_id", "lang", "mix_rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSet == win.toSet, "heap-aggregate temperature mix must equal the window form")
  }

  test("sampleTemperature: high-cardinality keyCol fails loudly, never collects unbounded") {
    // 'text' is effectively unique per doc — a caller reaching for it as a
    // mixture key must get an immediate error, not an unbounded driver map
    val e = intercept[IllegalArgumentException] {
      graft.operators.TextAnalysis.sampleTemperature(spark, dir, 200L,
        keyCol = "text", maxKeys = 10)
    }
    assert(e.getMessage.contains("distinct values"), e.getMessage)
    // and the bounded contract keys stay accepted under the same cap
    assert(graft.operators.TextAnalysis.sampleTemperature(spark, dir, 200L,
      keyCol = "lang", maxKeys = 10).count() > 0)
  }

  test("canonicalDocsBest: every representative is its cluster's argmax quality") {
    val clusters = graft.operators.Dedup.nearDupClustersStar(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val byCluster = clusters.groupBy(_._2).view.mapValues(_.map(_._1).toSet).toMap
    val quality = spark.read.parquet(s"$dir/documents.parquet")
      .selectExpr("doc_id",
        "CASE WHEN length(text) = 0 THEN CAST(-1 AS BIGINT) " +
          "ELSE CAST(regexp_count(text, '[a-zA-Z]') AS BIGINT) * 1000 div length(text) END AS q")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val best = graft.operators.Dedup.canonicalDocsBest(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // multi-doc groups: the emitted rep is the (quality desc, id asc) argmax
    val multi = best.filter(_._3 > 1)
    assert(multi.nonEmpty, "fixture should contain near-dup groups")
    val repIds = multi.map(_._1).toSet
    for ((cid, members) <- byCluster) {
      val want = members.toSeq.map(id => (quality(id), -id)).max
      val wantId = -want._2
      assert(repIds.contains(wantId), s"cluster $cid: rep must be argmax-quality doc $wantId")
    }
    // group sizes agree with the min-id canonical form (same clustering)
    val minForm = graft.operators.Dedup.canonicalDocs(spark, dir).collect()
      .map(r => r.getLong(1)).sorted
    assert(best.map(_._3).sorted.toSeq == minForm.toSeq)
  }

  test("statsProfile: one row per column, exact counts against direct queries") {
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val rows = graft.operators.Relational.statsProfile(spark, dir).collect()
      .map(r => r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))))
      .toMap
    assert(rows.keySet == Set("l_quantity", "l_extendedprice_cents", "l_discount_cents"))
    val n = li.count()
    val qty = li.select(col("l_quantity").cast("bigint").as("q"))
    val (qd, qmin, qmax) = {
      val r = qty.agg(countDistinct("q"), min("q"), max("q")).head()
      (r.getLong(0), r.getLong(1), r.getLong(2))
    }
    assert(rows("l_quantity") == ((n, 0L, qd, qmin, qmax)))
    // profile runs in a single aggregate: all three columns share n_rows
    assert(rows.values.forall(_._1 == n))
  }

  test("statsHistogram: buckets partition the rows, edges exact") {
    val h = graft.operators.Relational.statsHistogram(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val total = spark.read.parquet(s"$dir/lineitem.parquet").count()
    assert(h.map(_._2).sum == total, "bucket counts must partition the table")
    assert(h.forall(t => t._1 >= 0 && t._1 < 32))
    // min of the first bucket == global min; max of last == global max
    val sorted = h.sortBy(_._1)
    val b = spark.read.parquet(s"$dir/lineitem.parquet")
      .select(round(col("l_extendedprice") * 100).cast("bigint").as("c"))
      .agg(min("c"), max("c")).head()
    assert(sorted.head._3 == b.getLong(0) && sorted.last._4 == b.getLong(1))
    // within every bucket, lo <= hi and buckets don't overlap
    assert(sorted.forall(t => t._3 <= t._4))
    assert(sorted.sliding(2).forall {
      case Array(a, c) => a._4 < c._3
      case _ => true
    })
  }

  test("sampleStratified: exact per-language counts, deterministic, hash-ordered") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val langSizes = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val run1 = graft.operators.TextAnalysis.sampleStratified(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    val run2 = graft.operators.TextAnalysis.sampleStratified(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(run1.sorted.toSeq == run2.sorted.toSeq, "sample must be deterministic")
    val perLang = run1.groupBy(_._2)
    langSizes.foreach { case (lang, size) =>
      assert(perLang(lang).length == math.min(20L, size),
        s"stratum $lang: expected min(20, $size) rows")
    }
    // ranks are 1..k and ordered by (rank_hash, doc_id) within each stratum
    perLang.values.foreach { rows =>
      val byRank = rows.sortBy(_._4)
      assert(byRank.map(_._4).toSeq == (1L to byRank.length))
      val keys = byRank.map(t => (t._3, t._1)).toSeq
      assert(keys == keys.sorted, "stratum_rank must follow (rank_hash, doc_id) order")
    }
  }

  test("graft_topk stratified sample is bit-equal to the window form") {
    val win = graft.operators.TextAnalysis.sampleStratified(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).sorted.toSeq
    val agg = graft.operators.TextAnalysis.sampleStratifiedTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3))).sorted.toSeq
    assert(agg == win, "the bounded-heap swap must reproduce the window sample exactly")
    // and its plan must have no Sort below the aggregate (the whole point)
    val plan = graft.operators.TextAnalysis.sampleStratifiedTopK(spark, dir)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"swap still uses a window:\n$plan")
  }
}

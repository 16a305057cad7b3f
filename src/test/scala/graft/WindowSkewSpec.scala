package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Relational
import graft.streaming.EventStream

/** Hot-key guard for the window family: the time-chunked skew-safe
  * variants must be BIT-EQUAL to their plain twins on a corpus with a
  * planted hot user, while bounding the per-task partition to the chunk
  * volume instead of the hot user's whole history.
  */
class WindowSkewSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private val ChunkUs = 6L * 3600000000L

  /** Synthetic events.parquet: user 0 is a bot with `hotN` events every
    * ~3.6 min (sessions chain across chunk boundaries for days); 50 cold
    * users get 20 events each, one per hour (each its own session). ts is
    * raw NANOS in the file, like the driver testdata.
    */
  private lazy val dir: String = {
    import spark.implicits._
    val baseNs = 1700000000000000000L // 2023-11-14, epoch ns
    val hotN = 2000
    val hot = (0 until hotN).map { i =>
      (i.toLong, 0L, baseNs + i.toLong * 217L * 1000000000L, "click", (i % 97).toDouble / 7.0)
    }
    val cold = for (u <- 1 to 50; i <- 0 until 20) yield {
      val id = 100000L + u * 100L + i
      (id, u.toLong, baseNs + (u * 977L + i * 3600L) * 1000000000L,
        if (i % 3 == 0) "purchase" else "view", (i * u % 89).toDouble / 3.0)
    }
    val tmp = java.nio.file.Files.createTempDirectory("window-skew").toString
    (hot ++ cold).toDF("event_id", "user_id", "ts", "event_type", "value")
      .repartition(7)
      .write.mode("overwrite").parquet(s"$tmp/events.parquet")
    tmp
  }

  private def rows(df: org.apache.spark.sql.DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  test("r10: rank-family histogram twin == plain form on a hot customer WITH price ties") {
    // the fixture's random doubles carry no ties, so this corpus plants
    // them deliberately: the hot customer places 3000 orders over only 40
    // distinct prices (75-deep tie groups), which is exactly the regime
    // the histogram twin exists for (40 histogram rows vs 3000 sorted) and
    // the regime where dense_rank/percent_rank/cume_dist tie semantics
    // actually bite
    import spark.implicits._
    val hot = (0 until 3000).map(i => (i.toLong, 0L, (i % 40) * 10.0 + 5.0))
    val cold = for (c <- 1 to 30; i <- 0 until 10) yield
      (100000L + c * 100L + i, c.toLong, (c * 17 + i * 3) % 50 * 7.0)
    val tmp = java.nio.file.Files.createTempDirectory("rank-skew").toString
    (hot ++ cold).toDF("o_orderkey", "o_custkey", "o_totalprice")
      .repartition(5)
      .write.mode("overwrite").parquet(s"$tmp/orders.parquet")
    val plain = rows(Relational.qRankFamily(spark, tmp))
    val chunked = rows(Relational.qRankFamilySkewSafe(spark, tmp))
    assert(plain.nonEmpty && chunked == plain)
  }

  test("skew-safe RANGE frame == plain form on a planted hot user") {
    val plain = rows(Relational.rangeFrameTrailing(spark, dir))
    val chunked = rows(Relational.rangeFrameTrailingSkewSafe(spark, dir, ChunkUs))
    assert(chunked == plain)
  }

  test("skew-safe LEAD/LAG == plain form, including across empty chunks") {
    // cold users have 1-hour gaps < chunk, and consecutive events of a
    // cold user also land chunks apart — the sparse case a naive
    // adjacent-chunk carry gets wrong
    val plain = rows(Relational.eventLeadLag(spark, dir))
    val chunked = rows(Relational.eventLeadLagSkewSafe(spark, dir, ChunkUs))
    assert(chunked == plain)
  }

  test("skew-safe sessionize == plain form (sessions chain across chunks)") {
    val plain = rows(EventStream.sessionizeBatch(spark, dir))
    val chunked = rows(EventStream.sessionizeSkewSafe(spark, dir, ChunkUs))
    assert(chunked == plain)
    // the bot's unbroken 3.6-min cadence must still be ONE session even
    // though it spans ~5 days of 6-hour chunks
    val bot = EventStream.sessionizeSkewSafe(spark, dir, ChunkUs)
      .filter(col("user_id") === 0L).collect()
    assert(bot.length == 1 && bot.head.getLong(2) == 2000L)
  }

  test("chunking bounds the hot-user partition to chunk volume") {
    val e = Relational.events(spark, dir)
      .withColumn("ts_us", unix_micros(col("ts")))
      .withColumn("chunk", expr(s"ts_us div $ChunkUs"))
    val hotTotal = e.filter(col("user_id") === 0L).count()
    val maxChunk = e.groupBy("user_id", "chunk").count()
      .agg(max("count")).head().getLong(0)
    assert(hotTotal == 2000L)
    // 6 h / 217 s ≈ 100 events per chunk — the task bound the plain form
    // lacks (its hot partition is all 2000)
    assert(maxChunk <= 150L,
      s"per-(user, chunk) partition must be chunk-bounded, got $maxChunk")
  }

  // ---- round-7 twins: low-cardinality ranked windows (histogram-boundary
  // decomposition — no window task ever sorts a constant table fraction) ----

  private val tpchDir = SparkSpec.testDataDir

  test("skew-safe NTILE deciles == plain form (big-tiles-first rule exact)") {
    val plain = rows(Relational.ntileDeciles(spark, tpchDir))
    val hist = rows(Relational.ntileDecilesSkewSafe(spark, tpchDir))
    assert(hist == plain)
  }

  test("skew-safe discrete percentiles == plain form") {
    val plain = rows(Relational.percentileDisc(spark, tpchDir))
    val hist = rows(Relational.percentileDiscSkewSafe(spark, tpchDir))
    assert(hist == plain)
  }

  test("skew-safe funnel == plain form on the hot-user fixture AND real events") {
    // hot fixture: clicks only for the bot, purchases only for cold users —
    // exercises the all-null and no-conversion carry paths
    val plainHot = rows(Relational.eventsFunnel(spark, dir))
    val chunkedHot = rows(Relational.eventsFunnelSkewSafe(spark, dir, ChunkUs))
    assert(chunkedHot == plainHot)
    // real events table: genuine click->purchase conversions cross chunks
    val plain = rows(Relational.eventsFunnel(spark, tpchDir))
    val chunked = rows(Relational.eventsFunnelSkewSafe(spark, tpchDir, ChunkUs))
    assert(chunked == plain)
    assert(plain.exists(_.apply(3) == true), "fixture should contain conversions")
  }

  test("skew-safe as-of == plain form on the hot-user fixture AND real events") {
    val plainHot = rows(Relational.asofLastPurchase(spark, dir))
    val chunkedHot = rows(Relational.asofLastPurchaseSkewSafe(spark, dir, ChunkUs))
    assert(chunkedHot == plainHot)
    val plain = rows(Relational.asofLastPurchase(spark, tpchDir))
    val chunked = rows(Relational.asofLastPurchaseSkewSafe(spark, tpchDir, ChunkUs))
    assert(chunked == plain)
    assert(plain.exists(_.apply(3) != null), "fixture should contain as-of matches")
  }

  test("r9: native backward-strict as-of == window form (the catalog default's twins)") {
    // the catalog rows now answer through AsOfJoinExec; the window form and
    // the time-chunked form stay behind as bit-equal oracle twins — on the
    // hot-user fixture AND the driver testdata
    val nativeHot = rows(Relational.asofLastPurchaseNative(spark, dir))
    val plainHot = rows(Relational.asofLastPurchase(spark, dir))
    assert(nativeHot == plainHot)
    val native = rows(Relational.asofLastPurchaseNative(spark, tpchDir))
    val plain = rows(Relational.asofLastPurchase(spark, tpchDir))
    assert(native == plain)
    assert(native.exists(_.apply(3) != null), "fixture should contain as-of matches")
  }

  test("domain-mix scale twin == plain form's kept flag, for every doc") {
    val plain = rows(graft.operators.TextAnalysis.domainMix(spark, tpchDir)
      .select("doc_id", "lang", "kept"))
    val scale = rows(graft.operators.TextAnalysis.domainMixScale(spark, tpchDir))
    assert(scale == plain)
    // sanity: each language keeps exactly cap = min per-lang count docs
    val kept = graft.operators.TextAnalysis.domainMixScale(spark, tpchDir)
      .filter(col("kept")).groupBy("lang").count().collect()
      .map(_.getLong(1)).toSet
    assert(kept.size == 1, s"every language must keep exactly cap docs, got $kept")
  }
}

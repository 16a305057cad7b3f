package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.Portable
import graft.operators.{Dedup, Multimodal, TextAnalysis}

/** Pins the r16 adversarial-fixture contracts at the ENGINE level, on
  * synthetic frames — the classes the pristine fixtures structurally
  * cannot exercise (advfixture.py plants them for the oracle sweep; this
  * spec keeps them pinned in plain `sbt test`):
  *
  *   - NULL text: SQL-NULL-transparent by default; imperative/typed seams
  *     (BPE encode, packBins, decodePipeline) normalize NULL -> '' so one
  *     malformed row can never kill a 100 TB job;
  *   - malformed JSON props: Spark's get_json_object returns NULL (DuckDB
  *     THROWS on the same input, so this contract is engine-side only —
  *     no oracle can run);
  *   - non-finite vectors: usableNorm/finiteNorm exclusion semantics;
  *   - the Portable.let binding: shingling/fingerprinting stays LINEAR in
  *     doc length (the alias-inlining quadratic burned ~10^12 regex steps
  *     on a 1 MB doc before r16 — a coarse wall-clock tripwire here);
  *   - winnowing's consecutive-dedup == array_distinct (selections of a
  *     position are contiguous in the window index).
  */
class AdversarialContractSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def docsDir(rows: Seq[(Long, String, String, String, Long)]): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("adv-contract").toString
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    dir
  }

  test("malformed props: get_json_object returns NULL, the aggregate survives") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("adv-json").toString
    Seq(
      (0L, "2024-01-01 00:00:00", 1L, "click", 1.0, """{"k": 7}"""),
      (1L, "2024-01-01 00:01:00", 1L, "click", 1.0, "not json at all"),
      (2L, "2024-01-01 00:02:00", 1L, "click", 1.0, "{}"),
      (3L, "2024-01-01 00:03:00", 1L, "click", 1.0, null))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
      .withColumn("ts", col("ts").cast("timestamp"))
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = graft.operators.Relational.jsonExtractAgg(spark, dir).collect()
    assert(out.length == 1)
    val r = out.head
    // only the well-formed row contributes; malformed/missing/NULL are NULL
    assert(r.getAs[Long]("n") == 4)
    assert(r.getAs[Long]("sum_k") == 7L && r.getAs[Long]("max_k") == 7L)
  }

  test("NULL text: BPE encode, packBins and decodePipeline treat it as the empty doc") {
    val dir = docsDir(Seq(
      (0L, "alpha beta alpha beta", "en", "s", 21L),
      (1L, null, "en", "s", 0L),
      (2L, "", "en", "s", 0L)))
    // typed mapPartitions encoder: NULL must not NPE, and must equal ''
    val enc = TextAnalysis.bpeEncode(spark, dir, numMerges = 4)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(enc.contains(1L) && enc(1L) == enc(2L),
      s"NULL doc must encode exactly like the empty doc: $enc")
    // typed FFD packer: NULL doc packs like the empty doc (1 whitespace token)
    val bins = TextAnalysis.packBins(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(bins(1L) == bins(2L), s"NULL and empty docs must pack alike: $bins")
    // typed decoder: NULL payload decodes like the empty payload
    val dec = Multimodal.decodePipelineQuery(spark, dir)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getLong(5))).toMap
    assert(dec(1L) == dec(2L) && dec(1L) == ((0L, 0L)),
      s"NULL payload must decode as empty: $dec")
  }

  test("non-finite vectors: usableNorm excludes zero/NaN/Inf, finiteNorm keeps zero") {
    import spark.implicits._
    val df = Seq(
      (0L, 1.0), (1L, 0.0), (2L, Double.NaN), (3L, Double.PositiveInfinity))
      .toDF("id", "norm")
    assert(df.filter(Portable.usableNorm(col("norm"))).collect().map(_.getLong(0)).toSet == Set(0L))
    assert(df.filter(Portable.finiteNorm(col("norm"))).collect().map(_.getLong(0)).toSet == Set(0L, 1L))
  }

  test("non-finite embeddings: kmeans and semDeDup exclude them instead of dying") {
    import spark.implicits._
    val vecs = (0L until 16L).map(i =>
      (i, Array.fill(4)((i % 5).toFloat + 0.25f))) ++ Seq(
      (16L, Array(Float.NaN, 1f, 1f, 1f)),
      (17L, Array(Float.PositiveInfinity, 1f, 1f, 1f)),
      (18L, Array(0f, 0f, 0f, 0f))) // zero vector: L2-legal, cosine-excluded
    val df = vecs.toDF("vec_id", "embedding")
    val assigned = Dedup.kmeansMicroAssign(df, k = 3, lloydIters = 1)
      .select("vec_id").collect().map(_.getLong(0)).toSet
    assert(!assigned.contains(16L) && !assigned.contains(17L),
      "non-finite vectors must be excluded from k-means")
    assert(assigned.contains(18L), "the zero vector is L2-legal and must stay")
    val sem = Dedup.semDeDupFrom(df, k = 3, lloydIters = 1)
      .collect().map(r => r.getLong(0)).toSet
    assert(!sem.contains(16L) && !sem.contains(17L))
  }

  test("shingling and fingerprinting stay linear on a large document (let-binding tripwire)") {
    val big = (0 until 16000).map(i => s"w${i % 997} tok$i").mkString(" ") // ~400 KB
    assert(big.length > 200000)
    val dir = docsDir(Seq((0L, big, "en", "s", big.length.toLong)))
    val t0 = System.nanoTime()
    // substringDupScore: 25-token windows over ~32k tokens
    val n = TextAnalysis.substringDupScore(spark, dir).collect()
    assert(n.length == 1 && n.head.getAs[Long]("n_windows") > 30000)
    // fingerprint: min-5-gram over ~400k chars (native one-pass)
    TextAnalysis.fingerprint(spark, dir).collect()
    // winnowing: consecutive-dedup selection over ~400k windows
    val w = TextAnalysis.winnowing(spark, dir).collect()
    assert(w.length == 1 && w.head.getAs[Long]("n_selected") > 1000)
    val wallSec = (System.nanoTime() - t0) / 1e9
    // fixed path: a few seconds; the quadratic took HOURS on 3x this size.
    // 120 s is a generous tripwire, not a benchmark.
    assert(wallSec < 120, f"large-doc text ops took $wallSec%.1f s — quadratic regression?")
  }

  test("winnowing consecutive-dedup equals array_distinct (contiguity of selections)") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val docs = (0L until 30L).map { i =>
      val len = 20 + rnd.nextInt(300)
      (i, (0 until len).map(_ => ('a' + rnd.nextInt(4)).toChar).mkString,
        "en", "s", len.toLong)
    }
    val dir = docsDir(docs)
    val sel = TextAnalysis.winnowing(spark, dir)
      .select("doc_id", "n_selected", "n_distinct_h", "h_checksum").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).sortBy(_._1)
    // independent recomputation: brute-force windows + plain distinct
    val k = 8; val w = 4
    val expected = docs.filter(_._2.length >= k + w - 1).map { case (id, text, _, _, _) =>
      val hs = (0 to text.length - k).map { i =>
        var acc = 0L
        text.substring(i, i + k).codePoints().forEach(cp => acc = (acc * 31 + cp) % Portable.P1)
        acc
      }
      val sels = (0 to hs.length - w).map { j =>
        var best = (Long.MaxValue, -1L)
        for (o <- 0 until w) if (hs(j + o) <= best._1) best = (hs(j + o), (j + o + 1).toLong)
        best
      }.distinct
      (id, sels.length.toLong, sels.map(_._1).distinct.length.toLong, sels.map(_._1).sum)
    }.sortBy(_._1)
    assert(sel.toSeq == expected,
      s"winnowing selection diverged from brute force")
  }
}

package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Dedup, Similarity}

/** Pins the r14 review fixes that a fixture without pathological rows
  * would never exercise: zero-norm embeddings (NaN cosine under Spark's
  * NaN-greatest ordering), zero-hit recall-gate queries, and index-append
  * idempotence under re-runs.
  */
class ReviewHardeningSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = SparkSpec.testDataDir

  test("zero-norm embeddings pair with NOTHING in the grid and LSH dedup paths") {
    // Without the norm > 0 guard, cosine(zero, x) = 0/0 = NaN and
    // NaN >= threshold is TRUE — the zero vector would be reported as a
    // near-dup of EVERY partner and semanticClusters would collapse the
    // corpus into one component through it.
    import spark.implicits._
    val base = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val dims = base.select(size(col("embedding"))).head().getInt(0)
    val zero = Seq((999999L, Seq.fill(dims)(0.0f))).toDF("vec_id", "embedding")
    val planted = base.unionByName(zero)
    for ((name, pairs) <- Seq(
        "grid" -> Dedup.embeddingNearDupsGrid(planted, threshold = 0.4),
        "lsh" -> Dedup.embeddingNearDupsLsh(planted, threshold = 0.4))) {
      val touching = pairs.filter(col("id_a") === 999999L || col("id_b") === 999999L).count()
      assert(touching == 0L, s"$name: zero-norm vector paired $touching times")
      assert(!pairs.select("cosine").collect().exists(r => r.getDouble(0).isNaN),
        s"$name: NaN cosine leaked into the output")
    }
  }

  test("recall gates emit a row for EVERY query — zero hits reads n_hits=0, not silence") {
    // The bare left_semi + groupBy form produced NO row for a query the
    // approximate path missed entirely, so a total recall failure passed a
    // forall(recall_floor_met) check vacuously.
    import spark.implicits._
    val exact = Seq((0L, 10L), (0L, 11L), (1L, 10L), (2L, 12L))
      .toDF("q_id", "neighbor_id")
    val approx = Seq((0L, 10L), (0L, 11L)) // q=1 and q=2 fully missed
      .toDF("q_id", "neighbor_id")
    val rows = Similarity.recallHitCounts(exact, approx)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(rows == Map(0L -> 2L, 1L -> 0L, 2L -> 0L),
      s"expected explicit zero rows for missed queries, got $rows")
  }

  test("appendToIvfPqIndex is idempotent: a re-run duplicates no coded rows") {
    val store = java.nio.file.Files.createTempDirectory("graft-append-idem").toString
    try {
      val n = spark.read.parquet(s"$dir/embeddings.parquet").count()
      val splitId = n * 9 / 10
      Similarity.writeIvfPqIndexFiltered(spark, dir, store, col("vec_id") < splitId)
      Similarity.appendToIvfPqIndex(spark, dir, store, col("vec_id") >= splitId)
      val afterFirst = spark.read.parquet(s"$store/coded.parquet").count()
      assert(afterFirst == n, s"first append incomplete: $afterFirst of $n coded")
      // the retried nightly job: must be a no-op, not a duplication
      Similarity.appendToIvfPqIndex(spark, dir, store, col("vec_id") >= splitId)
      val afterSecond = spark.read.parquet(s"$store/coded.parquet").count()
      assert(afterSecond == n, s"re-run duplicated rows: $afterSecond vs $n")
      val dupIds = spark.read.parquet(s"$store/coded.parquet")
        .groupBy("vec_id").count().filter(col("count") > 1).count()
      assert(dupIds == 0L, s"$dupIds vec_ids coded more than once")
    } finally {
      import scala.reflect.io.Directory
      new Directory(new java.io.File(store)).deleteRecursively()
    }
  }

  test("incremental embedding dedup: blocked bipartite join == plain bucket join, pair for pair") {
    // The bipartite hot-bucket blocking (corpus rows own one sub-block,
    // increment rows visit all s) must be CANDIDATE-IDENTICAL to the plain
    // (t, key) join it replaces — verified-pair equality at the same LSH
    // parameters isolates the blocking from LSH recall.
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = emb.count()
    val split = n * 4 / 5
    val corpus = emb.filter(col("vec_id") < split)
    val inc = emb.filter(col("vec_id") >= split)
    val got = Dedup.embeddingIncrementalFrom(corpus, inc, threshold = 0.4)
      .select("id_new", "id_corpus").as[(Long, Long)].collect().toSet
    // the pre-blocking form, inline: plain (t, key) equi-join over the
    // same graft_lsh_buckets keys, same exact-cosine verification
    def withNorm(df: org.apache.spark.sql.DataFrame) = df.select(col("vec_id"), col("embedding"),
      graft.functions.Portable.l2NormNative("embedding").as("norm")).filter(col("norm") > 0)
    def buckets(df: org.apache.spark.sql.DataFrame) = df.select(col("vec_id"),
      posexplode(expr("graft_lsh_buckets(embedding, 16, 8)")).as(Seq("t", "key")))
    val cor = withNorm(corpus); val incN = withNorm(inc)
    val plain = buckets(cor).select(col("t"), col("key"), col("vec_id").as("id_corpus"))
      .join(buckets(incN).select(col("t"), col("key"), col("vec_id").as("id_new")), Seq("t", "key"))
      .select("id_new", "id_corpus").distinct()
      .join(incN.select(col("vec_id").as("id_new"), col("embedding").as("e_n"), col("norm").as("n_n")), "id_new")
      .join(cor.select(col("vec_id").as("id_corpus"), col("embedding").as("e_c"),
        col("norm").as("n_c")), "id_corpus")
      .withColumn("cos", graft.functions.Portable.dotProductNative("e_n", "e_c") / (col("n_n") * col("n_c")))
      .filter(col("cos") >= 0.4)
      .select("id_new", "id_corpus").as[(Long, Long)].collect().toSet
    assert(got == plain, s"missed=${(plain -- got).take(5)} spurious=${(got -- plain).take(5)}")
    assert(got.nonEmpty, "fixture split produced no incremental near-dups — test is vacuous")
  }
}

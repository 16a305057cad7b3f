package graft

import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Dedup

/** Off-default cells for the round-10 parameter surfaces on the minhash and
  * simhash families (VERDICT r9 #4) — the same gated-cell pattern IvfSpec
  * uses for the ANN parameters. The load-bearing property: banding
  * parameters decide which pairs are EXAMINED; the exact verification step
  * decides which pairs are EMITTED — so every setting that examines a
  * superset (r=1 minhash, more simhash tables, wider signatures at r=2)
  * must emit bit-identical output, and tighter banding (r=4) must emit a
  * subset (never a false pair).
  */
class DedupParamSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = SparkSpec.testDataDir

  private def pairSet(df: DataFrame): Set[(Long, Long)] =
    df.select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash off-default cells (wider signature at r=2; r=1 banding) emit the default output") {
    val default = pairSet(Dedup.minhashNearDups(spark, dir))
    assert(default.nonEmpty, "fixture corpus must contain near-dups")
    // 128 hashes / 64 bands: same r=2 scheme, twice the band count — a
    // candidate superset in expectation, identical verified output
    assert(pairSet(Dedup.minhashNearDups(spark, dir, numHashes = 128, bands = 64)) == default)
    // r=1: every single minhash component is a band — maximal recall
    // (candidate superset by construction), identical verified output
    assert(pairSet(Dedup.minhashNearDups(spark, dir, numHashes = 64, bands = 64)) == default)
  }

  test("minhash r=4 folded banding verifies to a subset (never a false pair) with the frozen key shape") {
    val r4 = Dedup.minhashNearDups(spark, dir, numHashes = 64, bands = 16)
    // (band, k1, k2) schema unchanged — the store contract survives r != 2
    assert(r4.columns.toSeq == Seq("id_a", "id_b", "n_inter", "jaccard"))
    val r4Pairs = pairSet(r4)
    val default = pairSet(Dedup.minhashNearDups(spark, dir))
    assert(r4Pairs.subsetOf(default),
      "exact verification must prevent any false pair at tighter banding")
    assert(r4Pairs.nonEmpty, "sf0.001 dup pairs are high-similarity; r=4 banding should retain them")
  }

  test("ngram near-dups accept the same parameter surface") {
    val default = pairSet(Dedup.ngramNearDups(spark, dir))
    assert(pairSet(Dedup.ngramNearDups(spark, dir, numHashes = 128, bands = 64)) == default)
  }

  test("r14: semanticClusters at occupancy-scaled bits finds the planted pairs (SignLsh recall at off-default width)") {
    import org.apache.spark.sql.functions._
    // the lshBitsFor knob (CorpusScaleProbe's scaled-bits cell) must not
    // silently trade away recall at the widths a growing corpus would
    // pick: plant 20 near-dup partners (cosine ≈ 0.94-0.99) and require
    // each planted vector to land in its original's cluster at bits = 8
    // (default) AND at a wider banding a 16x corpus would use
    val base = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val n = base.count()
    for (bits <- Seq(8, Dedup.lshBitsFor(n * 16))) {
      val planted = base.filter(col("vec_id") < 20)
        .withColumn("vec_id", col("vec_id") + 100000L)
        .withColumn("embedding",
          expr("transform(embedding, (x, j) -> CASE WHEN j = 0 THEN CAST(0.0 AS FLOAT) ELSE x END)"))
      val aug = base.unionByName(planted)
      val pairs = Dedup.embeddingNearDupsLsh(aug, 0.7, bits = bits)
        .select("id_a", "id_b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val expected = (0L until 20L).map(i => (i, i + 100000L)).toSet
      assert(expected.subsetOf(pairs),
        s"bits=$bits missed planted pairs: ${expected -- pairs}")
    }
  }

  test("simhash off-default table counts emit the default output (pigeonhole recall at any partition)") {
    def rows(df: DataFrame): Set[(Long, Long, Long)] =
      df.collect().map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Number](2).longValue())).toSet
    val default = rows(Dedup.simhashNearDups(spark, dir))
    assert(default.nonEmpty)
    assert(rows(Dedup.simhashNearDups(spark, dir, maxDist = 3, tables = 5)) == default)
    assert(rows(Dedup.simhashNearDups(spark, dir, maxDist = 3, tables = 6)) == default)
  }

  test("parameter validation: non-dividing bands and pigeonhole-violating tables are rejected") {
    intercept[IllegalArgumentException](
      Dedup.minhashNearDups(spark, dir, numHashes = 64, bands = 48))
    intercept[IllegalArgumentException](
      Dedup.simhashNearDups(spark, dir, maxDist = 4, tables = 4))
  }
}

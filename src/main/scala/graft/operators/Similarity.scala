package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (`Array[Float]`, 64-dim).
  *
  *   - [[bruteForceTopK]]: exact baseline — broadcast the (small) query set
  *     against the full corpus; one pass, no corpus shuffle. At 100 TB the
  *     corpus side streams through executors once per query batch.
  *   - [[lshTopK]]: the scale path — sign-random-projection LSH buckets
  *     corpus AND queries, candidates come from an equi-join on bucket keys
  *     (multi-probe via several independent tables), then exact re-ranking
  *     of candidates only. Hyperplanes are derived from deterministic
  *     integer arithmetic, so results are reproducible across runs/engines.
  */
object Similarity {

  private def embeddings(spark: SparkSession, dir: String): DataFrame =
    spark.read.parquet(s"$dir/embeddings.parquet")

  private def withNorm(df: DataFrame): DataFrame = {
    graft.functions.GraftFunctions.register(df.sparkSession)
    df.select(col("vec_id"), col("embedding"), Portable.l2NormNative("embedding").as("norm"))
  }

  private def cosine: Column =
    Portable.dotProductNative("q_emb", "embedding") / (col("q_norm") * col("norm"))

  /** Exact top-k neighbors (cosine) for each query vector (vec_id < nQueries),
    * excluding self. Output (q_id, neighbor_id, rank).
    */
  def bruteForceTopK(spark: SparkSession, dir: String, k: Int = 10, nQueries: Int = 5): DataFrame = {
    val e = withNorm(embeddings(spark, dir))
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("norm").as("q_norm"))
    val w = Window.partitionBy("q_id").orderBy(desc("cosine"), col("vec_id"))
    e.join(broadcast(q), col("vec_id") =!= col("q_id"))
      .withColumn("cosine", cosine)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"))
  }

  /** LSH table count / key width. Sized for HIGH RECALL on corpora whose
    * "neighbors" are weak (random-ish embeddings, cosine ≈ 0.3): with 32
    * tables × 4 bits, P(candidate | cos=0.3) ≈ 0.99. For a real 100 TB
    * corpus with genuine near-dups (cos ≥ 0.8 ⇒ p_bit ≈ 0.8) the right
    * setting is MORE bits (≈ log2(n_vectors) for O(1) bucket sizes) and
    * fewer tables — expose both as parameters when productionizing.
    */
  val NumTables = 32
  val BitsPerTable = 4

  /** Deterministic ±1 plane component for (table t, bit j, dim i): a
    * splitmix64-style integer mix, evaluated once on the DRIVER — planes
    * reach executors as literal arrays, so the per-row work is a plain
    * codegen'd dot product (an earlier per-element-hash version re-hashed
    * inside the fold and was 10× slower; a naive parity mixer correlates
    * tables and caps recall).
    */
  private def planeSign(t: Int, j: Int, i: Int): Double = {
    var z = i.toLong * 0x9E3779B97F4A7C15L + t.toLong * 0xBF58476D1CE4E5B9L + j.toLong * 0x94D049BB133111EBL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z = z ^ (z >>> 31)
    if ((z & 1L) == 0L) 1.0 else -1.0
  }

  /** Bucket key of one LSH table: sign bits of `BitsPerTable` projections
    * onto literal ±1 planes, packed into a long.
    */
  private def bucketKey(t: Int, dims: Int): Column =
    (0 until BitsPerTable).map { j =>
      val plane = (0 until dims).map(planeSign(t, j, _))
      val planeSql = plane.mkString("array(", "D, ", "D)")
      val proj = expr(s"graft_dot(embedding, $planeSql)")
      when(proj >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce[Column](_ + _)

  /** ANN top-k via LSH bucketing + exact re-rank of candidates. Recall is
    * data-dependent (verified ≥0.9 vs [[bruteForceTopK]] in AnnSpec); falls
    * short only for queries whose true neighbors share no bucket in any
    * table.
    */
  def lshTopK(spark: SparkSession, dir: String, k: Int = 10, nQueries: Int = 5): DataFrame = {
    val e = withNorm(embeddings(spark, dir))
    val dims = e.select(size(col("embedding"))).head().getInt(0)
    val tables = (0 until NumTables).map(t => struct(lit(t).as("t"), bucketKey(t, dims).as("key")))
    // Buckets carry ONLY (vec_id, t, key): candidate generation and dedup
    // never shuffle the embedding payloads.
    val bucketed = e
      .withColumn("b", explode(array(tables: _*)))
      .select(col("vec_id"), col("b.t"), col("b.key"))
    val qb = bucketed.filter(col("vec_id") < nQueries).withColumnRenamed("vec_id", "q_id")
    val pairs = bucketed.join(broadcast(qb), Seq("t", "key"))
      .filter(col("vec_id") =!= col("q_id"))
      .select("q_id", "vec_id")
      .distinct()
    // Score only the deduped candidate ids: join payloads back, queries
    // broadcast.
    val q = e.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("norm").as("q_norm"))
    val w = Window.partitionBy("q_id").orderBy(desc("cosine"), col("vec_id"))
    pairs
      .join(e, "vec_id")
      .join(broadcast(q), "q_id")
      .withColumn("cosine", cosine)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"))
  }
}

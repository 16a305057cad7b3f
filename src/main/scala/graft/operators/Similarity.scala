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

  private def withNorm(df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("embedding"), Portable.l2Norm("embedding").as("norm"))

  private def cosine: Column =
    Portable.dotProduct("q_emb", "embedding") / (col("q_norm") * col("norm"))

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
  val NumTables = 64
  val BitsPerTable = 4

  /** Bucket key of one LSH table: sign bits of `BitsPerTable` pseudo-random
    * ±1 projections packed into a long. Plane components come from
    * `xxhash64(dim, table, bit)` — seed-fixed, so runs are reproducible,
    * and bits are independent across tables (a weak arithmetic mixer here
    * caps recall: correlated planes make tables redundant).
    */
  private def bucketKey(t: Int): Column =
    (0 until BitsPerTable).map { j =>
      val proj = expr(
        s"aggregate(zip_with(embedding, sequence(0, size(embedding) - 1), (x, i) -> " +
          s"CAST(x AS DOUBLE) * (CASE WHEN (xxhash64(i, $t, $j) & 1) = 0 THEN 1.0 ELSE -1.0 END)), 0.0D, (acc, v) -> acc + v)")
      when(proj >= 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce[Column](_ + _)

  /** ANN top-k via LSH bucketing + exact re-rank of candidates. Recall is
    * data-dependent (verified ≥0.9 vs [[bruteForceTopK]] in AnnSpec); falls
    * short only for queries whose true neighbors share no bucket in any
    * table.
    */
  def lshTopK(spark: SparkSession, dir: String, k: Int = 10, nQueries: Int = 5): DataFrame = {
    val e = withNorm(embeddings(spark, dir))
    val tables = (0 until NumTables).map(t => struct(lit(t).as("t"), bucketKey(t).as("key")))
    val bucketed = e
      .withColumn("b", explode(array(tables: _*)))
      .select(col("vec_id"), col("embedding"), col("norm"), col("b.t"), col("b.key"))
    val q = bucketed.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("norm").as("q_norm"), col("t"), col("key"))
    val candidates = bucketed.join(broadcast(q), Seq("t", "key"))
      .filter(col("vec_id") =!= col("q_id"))
      .select("q_id", "q_emb", "q_norm", "vec_id", "embedding", "norm")
      .distinct()
    val w = Window.partitionBy("q_id").orderBy(desc("cosine"), col("vec_id"))
    candidates
      .withColumn("cosine", cosine)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"))
  }
}

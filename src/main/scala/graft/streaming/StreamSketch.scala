package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming sketch rollup — per micro-batch, per-key HLL blobs are merged
  * into a PERSISTED, VERSIONED sketch store: the standing
  * corpus-statistics artifact a 100 TB ingest pipeline maintains ("distinct
  * users per event type, so far, updated as data lands") without ever
  * re-scanning history. The batch-side building blocks are the round-8
  * merge surface (`graft_hll_sketch` to emit blobs, `graft_hll_merge_sketch`
  * to fold them), so the streaming path cannot drift from the batch rollup
  * it composes.
  *
  * Delivery semantics: foreachBatch is AT-LEAST-ONCE (a failed batch can be
  * re-delivered with the same batchId), but this sink is safe under replay
  * TWICE over:
  *   - by ALGEBRA — HLL union is idempotent (register-wise maxima), so
  *     merging the same batch's blob a second time cannot change any
  *     estimate, unlike a count- or sum-based sink;
  *   - by LAYOUT — each batch writes store version `v<batchId>` with
  *     overwrite from `v<latest < batchId>` + the batch, so re-running
  *     batch N deterministically rebuilds the same v<N> and readers always
  *     see a complete version, never a partial overwrite of the live store.
  *
  * Scale: the store carries one compact blob per key (≤ ~2^lgK bytes each),
  * the per-batch merge shuffles (key, blob) pairs — state ∝ key cardinality,
  * never rows seen. Old versions are pruned down to `keepVersions` so a
  * long-running query does not accumulate history.
  */
object StreamSketch {

  /** Starts the rollup: `newRows` is a STREAMING frame; each micro-batch
    * folds `graft_hll_sketch(valCol)` per `keyCol` into the latest store
    * version and writes `storeDir/v<batchId>`.
    */
  def start(newRows: DataFrame, storeDir: String, checkpointDir: String,
      keyCol: String, valCol: String, keepVersions: Int = 2): StreamingQuery =
    newRows.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        graft.functions.GraftFunctions.register(spark)
        val newBlobs = batch.groupBy(col(keyCol))
          .agg(expr(s"graft_hll_sketch($valCol)").as("sk"))
        val merged = latestVersion(spark, storeDir, below = Some(batchId)) match {
          case Some(prev) =>
            spark.read.parquet(prev).select(col(keyCol), col("sk"))
              .union(newBlobs)
              .groupBy(col(keyCol))
              .agg(expr("graft_hll_merge_sketch(sk)").as("sk"))
          case None => newBlobs
        }
        merged.write.mode("overwrite").parquet(s"$storeDir/v$batchId")
        prune(spark, storeDir, keepVersions)
      }
      .start()

  /** Per-key distinct-count estimates from the newest store version. */
  def estimates(spark: SparkSession, storeDir: String, keyCol: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    val latest = latestVersion(spark, storeDir, below = None).getOrElse(
      throw new IllegalStateException(s"no sketch store versions under $storeDir"))
    spark.read.parquet(latest)
      .groupBy(col(keyCol))
      .agg(expr("graft_hll_merge(sk)").as("approx_distinct"))
  }

  /** Newest `v<id>` dir (optionally with id < `below`, for replay safety:
    * a re-delivered batch must fold the version BEFORE its own, not the
    * half-written result of its failed attempt).
    */
  private def latestVersion(spark: SparkSession, storeDir: String,
      below: Option[Long]): Option[String] = {
    val fs = new Path(storeDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new Path(storeDir)
    if (!fs.exists(dir)) return None
    val ids = fs.listStatus(dir).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.drop(1).forall(_.isDigit) => n.drop(1).toLong }
      .filter(id => below.forall(id < _))
    if (ids.isEmpty) None else Some(s"$storeDir/v${ids.max}")
  }

  private def prune(spark: SparkSession, storeDir: String, keep: Int): Unit = {
    val fs = new Path(storeDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new Path(storeDir)
    if (!fs.exists(dir)) return
    val ids = fs.listStatus(dir).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.drop(1).forall(_.isDigit) => n.drop(1).toLong }
      .sorted
    ids.dropRight(keep).foreach(id => fs.delete(new Path(s"$storeDir/v$id"), true))
  }
}

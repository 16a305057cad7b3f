package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

import graft.operators.Similarity

/** STREAMING ANN index ingest — the real-time shape of
  * [[graft.operators.Similarity.appendToIvfPqIndex]]: a stream of new
  * (vec_id, embedding) rows is encoded micro-batch by micro-batch with the
  * persisted index's FROZEN quantizer models and lands as a versioned
  * increment of the store. A reader composes `coded.parquet` with the
  * increments ([[graft.operators.Similarity.ivfPqTopKViaStoreWithIncrements]])
  * and sees every ingested vector without the index ever retraining.
  *
  * Replay safety: appends are NOT idempotent, so the increment is written
  * as `increments/v<batchId>.parquet` in OVERWRITE mode — a re-delivered
  * batch rewrites ITS OWN directory byte-for-byte instead of duplicating
  * rows (the versioned-layout argument of [[StreamSketch]], applied to an
  * append-only corpus; ReplaySpec-style coverage in Round10OpsSpec).
  *
  * Scale: the per-batch body is one map-only encode (cell assignment +
  * PQ codes against driver-loaded models, ~16 output bytes per vector);
  * per-batch cost is the increment's size, never the corpus's. The
  * increment directories stay small and numerous — a nightly compaction
  * into `coded.parquet` (plain parquet rewrite) is the documented
  * maintenance step, exactly like any LSM-ish layout.
  */
object StreamAnnIngest {

  def start(newVecs: DataFrame, storeDir: String, checkpointDir: String): StreamingQuery =
    newVecs.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        foldBatch(batch, batchId, storeDir)
      }
      .start()

  /** The per-batch fold, exposed so tests can double-deliver a batch and
    * assert the composed store unchanged.
    */
  def foldBatch(batch: DataFrame, batchId: Long, storeDir: String): Unit = {
    requireOwnership(batch.sparkSession, storeDir, batchId)
    Similarity.encodeWithStoreModels(batch, storeDir)
      .write.mode("overwrite").parquet(s"$storeDir/increments/v$batchId.parquet")
  }

  /** The [[VersionedStore.requireOwnership]] guard applied to the
    * increment layout: a query restarted with a FRESH checkpoint restarts
    * batchIds at 0, and overwrite mode would silently clobber the existing
    * `increments/v0.parquet` with DIFFERENT data (replay rewrites its own
    * id byte-for-byte; a new checkpoint does not). Equality is allowed —
    * that is the replay contract.
    */
  private def requireOwnership(spark: org.apache.spark.sql.SparkSession,
      storeDir: String, batchId: Long): Unit = {
    val fs = new org.apache.hadoop.fs.Path(storeDir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new org.apache.hadoop.fs.Path(s"$storeDir/increments")
    if (!fs.exists(dir)) return
    val ids = fs.listStatus(dir).toSeq.map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".parquet") &&
        n.stripPrefix("v").stripSuffix(".parquet").nonEmpty &&
        n.stripPrefix("v").stripSuffix(".parquet").forall(_.isDigit) =>
        n.stripPrefix("v").stripSuffix(".parquet").toLong }
    ids.maxOption.foreach { maxId =>
      require(maxId <= batchId,
        s"ANN increment store $storeDir already holds v$maxId > batch $batchId: this " +
          "checkpoint does not own the store (fresh checkpoint against an existing store?). " +
          "Overwrite would clobber a committed increment — point the query at a new storeDir " +
          "or resume from the original checkpoint")
    }
  }
}

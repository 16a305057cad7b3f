package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Shared contract + layout helpers for the versioned parquet state stores
  * (StreamLineDedup / StreamSketch / StreamMonitor / StreamScd2 — the
  * `storeDir/vN` + prune layout). ONE implementation of version listing,
  * pruning, and the replay/ownership guards: the r15 streaming deep-read
  * found the four per-store copies had already drifted (two lost the
  * non-numeric-name guard and would crash on a stray `v*` directory), so
  * the copies are gone.
  */
private[streaming] object VersionedStore {

  /** The versioned-layout replay guarantee (a re-delivered batch N finds
    * the pre-N state and rebuilds the same store) requires the PREVIOUS
    * version to survive pruning: keepVersions=1 would prune v(N-1) right
    * after writing vN, so a redelivery of N finds nothing below it and
    * silently rebuilds the store from that one batch (cumulative history
    * lost); keepVersions=0 would delete even the version just written.
    * Enforced in every start() (fail-fast at stream setup, before the
    * query goes live) AND in every foldBatch (the testable seam callers
    * can also drive directly) so the guarantee cannot be silently
    * disabled by configuration.
    */
  def requireReplaySafe(keepVersions: Int): Unit =
    require(keepVersions >= 2,
      s"keepVersions must be >= 2 to keep the replay-safety guarantee (got $keepVersions): " +
        "a re-delivered batch needs the previous version to still exist after pruning")

  /** Fail fast when the store already holds versions NEWER than the batch
    * about to fold — the signature of a query restarted with a FRESH
    * checkpoint (batchIds restart at 0) pointed at an EXISTING store.
    * Without this guard the fold "succeeds": v0 rebuilds from nothing
    * (latestVersion(below=0) is None, so cumulative history is silently
    * dropped from the new lineage) and prune — which deletes the SMALLEST
    * ids — then removes v0 itself, so readers keep serving the stale old
    * maximum and the new batch's rows vanish without a trace. Equality is
    * allowed: a re-delivered batch rebuilding its own `v<batchId>` is the
    * replay contract, not a conflict.
    */
  def requireOwnership(spark: SparkSession, storeDir: String, batchId: Long): Unit =
    versionIds(spark, storeDir).lastOption.foreach { maxId =>
      require(maxId <= batchId,
        s"store $storeDir already holds v$maxId > batch $batchId: this checkpoint does not " +
          "own the store (fresh checkpoint against an existing store?). Folding would drop " +
          "history and prune would delete the new version — point the query at a new storeDir " +
          "or resume from the original checkpoint")
    }

  /** Newest `v<id>` path (optionally with id < `below`, for replay safety:
    * a re-delivered batch must fold the version BEFORE its own, never the
    * half-written result of its failed attempt). Non-numeric `v*` names
    * are ignored, not parsed — a stray directory must not crash the fold.
    */
  def latestVersion(spark: SparkSession, storeDir: String,
      below: Option[Long]): Option[String] = {
    val ids = versionIds(spark, storeDir).filter(id => below.forall(id < _))
    if (ids.isEmpty) None else Some(s"$storeDir/v${ids.max}")
  }

  /** Newest version path, or fail with a store-specific message. */
  def latestOrFail(spark: SparkSession, storeDir: String, what: String): String =
    latestVersion(spark, storeDir, below = None).getOrElse(
      throw new IllegalStateException(s"no $what store versions under $storeDir"))

  /** Deletes all but the newest `keep` versions. */
  def prune(spark: SparkSession, storeDir: String, keep: Int): Unit = {
    val fs = new Path(storeDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    versionIds(spark, storeDir).dropRight(keep)
      .foreach(id => fs.delete(new Path(s"$storeDir/v$id"), true))
  }

  /** All numeric version ids under `storeDir`, ascending. */
  private def versionIds(spark: SparkSession, storeDir: String): Seq[Long] = {
    val fs = new Path(storeDir).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dir = new Path(storeDir)
    if (!fs.exists(dir)) return Nil
    fs.listStatus(dir).toSeq
      .filter(_.isDirectory)
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.length > 1 && n.drop(1).forall(_.isDigit) =>
        n.drop(1).toLong }
      .sorted
  }
}

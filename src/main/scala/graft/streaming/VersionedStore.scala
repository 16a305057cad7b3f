package graft.streaming

/** Shared contract checks for the versioned parquet state stores
  * (StreamLineDedup / StreamSketch / StreamMonitor / StreamScd2 — the
  * `storeDir/vN` + prune layout).
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
}

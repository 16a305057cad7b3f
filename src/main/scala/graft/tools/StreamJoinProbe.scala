package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Sizing probe for the stream-stream LEFT OUTER interval join
  * (`stream_interval_join`, 5.3 s in the round-6 bench): DESIGN.md argues
  * the wall-clock is dominated by per-partition state-store commit latency
  * (`shuffle.partitions` stores × a handful of micro-batches at ~300
  * rows/store), a FIXED overhead that amortizes as real state volume
  * grows. This probe proves it the AnnScaleProbe way: the same join runs
  * at `spark.sql.shuffle.partitions` ∈ {8, 32} × state volume ∈ {1×, 4×}
  * (replicas get fresh user/event ids so join state genuinely scales),
  * outputs are asserted IDENTICAL across partition settings before
  * timing, and the wall × state-store commit-time matrix lands in
  * DESIGN.md.
  *
  * What to look for: at 1× volume the p=8 run should be markedly faster
  * than p=32 (fewer stores to commit per batch, same tiny state each); at
  * 4× the gap should NARROW in relative terms — per-store work grows
  * while the commit count stays fixed — which is exactly the "sizing
  * note, not a plan problem" claim.
  *
  * Usage: `runMain graft.tools.StreamJoinProbe [sfDir]`.
  * Numbers land in DESIGN.md; this is a harness tool, not a catalog query.
  */
object StreamJoinProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("stream-join-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val tempDirs = scala.collection.mutable.ArrayBuffer[String]()
    def tempDir(prefix: String): String = {
      val d = Files.createTempDirectory(prefix).toString
      tempDirs += d
      d
    }

    try {
      val base = spark.read.parquet(s"$dir/events.parquet")
        .select("event_id", "user_id", "ts", "event_type")
      val nUsers = base.agg(max("user_id")).head().getLong(0) + 1
      val nEvents = base.agg(max("event_id")).head().getLong(0) + 1

      // Replicas shift user AND event ids so every copy contributes fresh
      // join keys — state rows scale with the factor instead of piling onto
      // the same users' intervals.
      def replicated(k: Int): String = {
        val out = tempDir(s"sjp-input-$k")
        (0 until k).map { r =>
          base.select(
            (col("event_id") + lit(r * nEvents)).as("event_id"),
            (col("user_id") + lit(r * nUsers)).as("user_id"),
            col("ts"), col("event_type"))
        }.reduce(_ unionByName _)
          .write.mode("overwrite").parquet(s"$out/events.parquet")
        out
      }

      def run(inputDir: String, partitions: Int): (Double, Long, Long, Set[(Long, Long, Any)]) = {
        spark.conf.set("spark.sql.shuffle.partitions", partitions.toString)
        val schema = spark.read.parquet(s"$inputDir/events.parquet").schema
        def side(tpe: String) = spark.readStream.schema(schema)
          .option("pathGlobFilter", "*.parquet").parquet(s"$inputDir/events.parquet")
          .transform(graft.operators.Relational.normalizeEventTs)
          .filter(col("event_type") === tpe)
          .select("user_id", "event_id", "ts")
        val joined = graft.streaming.EventStream.clickPurchaseLeftJoin(
          side("click"), side("purchase"))
        val outDir = tempDir(s"sjp-out-$partitions")
        val ckpt = tempDir(s"sjp-ckpt-$partitions")
        val t0 = System.nanoTime()
        val q = joined.writeStream.outputMode("append").format("parquet")
          .option("path", outDir).option("checkpointLocation", ckpt)
          .trigger(Trigger.AvailableNow()).start()
        q.awaitTermination()
        val wall = (System.nanoTime() - t0) / 1e9
        // state-store commit time summed over every progress event — the
        // quantity DESIGN claims dominates this query's wall-clock
        val progresses = q.recentProgress
        val commitMs = progresses.flatMap(_.stateOperators).map(_.commitTimeMs).sum
        val stateRows = progresses.flatMap(_.stateOperators).map(_.numRowsTotal).lastOption.getOrElse(0L)
        val rows = spark.read.parquet(outDir)
          .select("user_id", "click_id", "purchase_id").collect()
          .map(r => (r.getLong(0), r.getLong(1), if (r.isNullAt(2)) null else r.getLong(2)))
          .toSet[(Long, Long, Any)]
        (wall, commitMs, stateRows, rows)
      }

      // one discarded warmup so the first matrix cell doesn't carry the
      // join's codegen/JIT compilation cost
      run(replicated(1), 32)

      for (vol <- Seq(1, 4)) {
        val input = replicated(vol)
        val results = Seq(8, 32).map { p => p -> run(input, p) }
        // identical outputs across partition settings — partitioning must
        // never change the join's semantics
        val sets = results.map(_._2._4)
        require(sets.distinct.size == 1,
          s"vol=$vol: outputs diverged across shuffle.partitions settings")
        for ((p, (wall, commitMs, stateRows, rows)) <- results) {
          println(f"PROBE vol=${vol}x partitions=$p%-3d wall=$wall%.2fs " +
            f"state_commit=${commitMs}ms state_rows=$stateRows out_rows=${rows.size}")
        }
      }
    } finally {
      tempDirs.foreach(d =>
        new scala.reflect.io.Directory(new java.io.File(d)).deleteRecursively())
      spark.stop()
    }
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.streaming.EventStream

/** transformWithState sessionizer ×8 scale probe (VERDICT r15 #5): the
  * spec pins the TIMER contract at fixture scale; this measures how the
  * RocksDB state and timer volume GROW — the scale claim is
  * "state ∝ ACTIVE KEYS, not events". Three cells over the sf0.1 events:
  *
  *   base      — the fixture as-is;
  *   x8_events — 8 time-shifted copies, SAME user set (8× events, ~1×
  *               keys): state rows must stay ~flat;
  *   x8_users  — 8 user-renamed copies (8× keys AND 8× events): state
  *               rows must scale ~8×.
  *
  * Reported per cell: wall, input rows, final state rows (the
  * stateOperators' numRowsTotal), state commit time, and
  * timer-processing counts where exposed. Numbers land in DESIGN.md;
  * harness tool, not a catalog query.
  *
  * Usage: `runMain graft.tools.TwsScaleProbe [sfDir]`
  */
object TwsScaleProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("tws-scale-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val base = spark.read.parquet(s"$dir/events.parquet")
      .transform(graft.operators.Relational.normalizeEventTs)
      .select(col("user_id"), col("event_id"), col("ts"))
      .cache()
    base.count()

    def copies(n: Int, renameUsers: Boolean): DataFrame =
      (0 until n).map { i =>
        base.select(
          (if (renameUsers) col("user_id") + lit(i * 1000000L) else col("user_id")).as("user_id"),
          (col("event_id") + lit(i * 10000000L)).as("event_id"),
          // shift WITHIN the session gap so copies extend sessions rather
          // than create disjoint ones — same active-key story either way
          (col("ts") + expr(s"INTERVAL ${i} SECONDS")).as("ts"))
      }.reduce(_ unionByName _)

    def cell(label: String, df: DataFrame): Unit = {
      val in = java.nio.file.Files.createTempDirectory(s"tws-$label-in").toString
      df.write.mode("overwrite").parquet(in)
      val schema = spark.read.parquet(in).schema
      val ckpt = java.nio.file.Files.createTempDirectory(s"tws-$label-ckpt").toString
      val stream = spark.readStream.schema(schema)
        .option("pathGlobFilter", "*.parquet").parquet(in)
        .withWatermark("ts", "1 minute")
        .as[EventStream.Event]
      val t0 = System.nanoTime()
      val q = EventStream.sessionizeTws(stream)
        .writeStream.outputMode("append").format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      val progs = q.recentProgress.toSeq
      val inputRows = progs.map(_.numInputRows).sum
      require(inputRows > 0, s"$label read zero rows")
      val lastState = progs.reverse.flatMap(_.stateOperators.toSeq).headOption
      val stateRows = lastState.map(_.numRowsTotal).getOrElse(-1L)
      val commitMs = progs.flatMap(_.stateOperators.toSeq).map(_.commitTimeMs).sum
      val updated = progs.flatMap(_.stateOperators.toSeq).map(_.numRowsUpdated).sum
      val removed = progs.flatMap(_.stateOperators.toSeq).map(_.numRowsRemoved).sum
      println(f"[tws-probe] $label%-10s wall=$wall%6.2fs input=$inputRows%8d " +
        f"stateRowsFinal=$stateRows%8d rowsUpdated=$updated%8d rowsRemoved=$removed%8d " +
        f"stateCommitMs=$commitMs%6d batches=${progs.size}")
      Seq(in, ckpt).foreach(p =>
        new scala.reflect.io.Directory(new java.io.File(p)).deleteRecursively())
    }

    cell("base", copies(1, renameUsers = false))
    cell("x8_events", copies(8, renameUsers = false))
    cell("x8_users", copies(8, renameUsers = true))
    spark.stop()
  }
}

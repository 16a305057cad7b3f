package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Stage/phase profile for the `stream_interval_join` bench row (VERDICT
  * r14 #6: 2.08 s, heaviest streaming row, flat two rounds, never
  * profiled). Runs the EXACT bench pipeline — two file-source streams of
  * the events table, watermarked left-outer interval join, noop sink,
  * AvailableNow — and decomposes wall time from the streaming progress
  * events: batches, per-batch `durationMs` phases (addBatch = the actual
  * join work, walCommit/commitOffsets = checkpoint fsyncs, latestOffset/
  * getBatch = source listing) and the state-operator commit times. A
  * second cell re-runs with the session's default 200 shuffle partitions
  * to show the state-store-count sensitivity (each stream-stream join
  * batch commits 4 state stores × shufflePartitions delta files).
  *
  * Usage: `runMain graft.tools.StreamJoinProbe [sfDir]`. Numbers land in
  * DESIGN.md; this is a harness tool, not a catalog query.
  */
object StreamJoinProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("stream-join-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")

    def runOnce(label: String, shufflePartitions: Int): Unit = {
      spark.conf.set("spark.sql.shuffle.partitions", shufflePartitions.toString)
      val schema = spark.read.parquet(s"$dir/events.parquet").schema
      // Layout-aware read (ADVICE r15): handles both a single
      // `events.parquet` FILE and a Spark-written DIRECTORY of part files
      // — the fixed parent-dir glob listed zero files against a directory
      // layout and the probe printed vacuous numbers.
      def side(tpe: String) = graft.streaming.FileStreams
        .streamTable(spark, dir, "events", schema)
        .transform(graft.operators.Relational.normalizeEventTs)
        .filter(col("event_type") === tpe)
        .select("user_id", "event_id", "ts")
      val joined = graft.streaming.EventStream.clickPurchaseLeftJoin(
        side("click"), side("purchase"))
      val ckpt = java.nio.file.Files.createTempDirectory("sij-probe").toString
      val t0 = System.nanoTime()
      val q = joined.writeStream.outputMode("append").format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      val progs = q.recentProgress.toSeq
      // A silent empty read (bad glob, moved fixture) must fail loudly,
      // not print vacuous zeros that read like a fast run.
      require(progs.map(_.numInputRows).sum > 0,
        s"probe read ZERO input rows from $dir/events.parquet — fixture layout or glob is wrong")
      println(f"[probe] $label: wall=${wall}%5.2fs batches=${progs.size}")
      progs.foreach { p =>
        val d = p.durationMs
        def ms(k: String) = Option(d.get(k)).map(_.longValue()).getOrElse(-1L)
        val stateCommit = p.stateOperators.map(_.commitTimeMs).sum
        val stateRows = p.stateOperators.map(_.numRowsTotal).sum
        println(f"[probe]   batch=${p.batchId}%2d rows=${p.numInputRows}%7d " +
          f"triggerMs=${ms("triggerExecution")}%5d addBatch=${ms("addBatch")}%5d " +
          f"walCommit=${ms("walCommit")}%4d commitOffsets=${ms("commitOffsets")}%4d " +
          f"latestOffset=${ms("latestOffset")}%4d stateCommitMs=$stateCommit%5d " +
          f"stateRows=$stateRows%7d")
      }
      new scala.reflect.io.Directory(new java.io.File(ckpt)).deleteRecursively()
    }

    runOnce("cold (8 shuffle partitions, the bench streaming section's r9 sizing)", 8)
    runOnce("warm (8 shuffle partitions)", 8)
    runOnce("warm (32 shuffle partitions)", 32)
    runOnce("warm (200 shuffle partitions — state-store-count sensitivity)", 200)
    spark.stop()
  }
}

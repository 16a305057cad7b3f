package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** r15 streaming deep-read hardening, demonstrated end-to-end:
  *
  *   1. CRASH-REPLAY E2E (VERDICT r14 #8) — not the unit fold-twice
  *      property (ReplaySpec), but the real event: a streaming query dies
  *      AFTER its store/sink write and BEFORE the checkpoint commit,
  *      leaving a half-written (here: deliberately corrupted) version; a
  *      restart from the SAME checkpoint re-delivers the batch and must
  *      rebuild the exact uninterrupted state. Run for the two stores the
  *      verdict named: the SCD2 run store and the incremental-dedup sink.
  *   2. OWNERSHIP GUARD — a query restarted with a FRESH checkpoint
  *      restarts batchIds at 0; against an existing store that silently
  *      dropped history (v0 rebuilt from nothing, then pruned away as the
  *      smallest id). Every versioned store now fails fast instead.
  *   3. STRAY-DIRECTORY TOLERANCE — StreamScd2/StreamMonitor used to
  *      parse ANY `v*` name with `.toLong` (NumberFormatException on a
  *      `vOLD-backup` left by an operator); the consolidated
  *      VersionedStore listing ignores non-numeric names everywhere.
  */
class StreamCrashReplaySpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = SparkSpec.testDataDir

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def ts(m: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")

  /** Stages `rows` as ONE new parquet file in the streaming input dir
    * (the file source triggers on new files, not on new subdirectories).
    */
  private def stageFile(inputDir: String, name: String, df: DataFrame): Unit = {
    val staging = tmp("stage")
    df.coalesce(1).write.mode("overwrite").parquet(staging)
    val part = new java.io.File(staging).listFiles()
      .find(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .getOrElse(fail(s"no part file staged under $staging"))
    Files.move(part.toPath, Paths.get(inputDir, s"$name.parquet"))
  }

  // ---------------------------------------------------------------- e2e

  test("crash-replay e2e: restarted scd2 query rebuilds the corrupted version from checkpoint") {
    import spark.implicits._
    val input = tmp("scd2-e2e-in")
    val store = tmp("scd2-e2e-store")
    val ckpt = tmp("scd2-e2e-ckpt")

    val batchA = Seq(
      (1L, ts(0), 1L, "A", 0.0, "{}"), (2L, ts(1), 1L, "A", 0.0, "{}"),
      (3L, ts(2), 2L, "B", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val batchB = Seq(
      (4L, ts(3), 1L, "B", 0.0, "{}"), (5L, ts(4), 2L, "B", 0.0, "{}"),
      (6L, ts(5), 2L, "C", 0.0, "{}"), (7L, ts(6), 3L, "A", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val schema = batchA.schema

    def startQuery() = graft.streaming.StreamScd2.start(
      spark.readStream.schema(schema).parquet(input), store, ckpt)

    // batch 0 commits normally
    stageFile(input, "a", batchA)
    val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
    assert(new java.io.File(s"$store/v0").exists())

    // the crash: batch 1's fold ran PARTIALLY (only 2 of 4 rows made it)
    // and the query died before the checkpoint committed batch 1 — the
    // store now holds a wrong v1 the checkpoint does not know about
    stageFile(input, "b", batchB)
    graft.streaming.StreamScd2.foldBatch(batchB.filter(col("event_id") <= 5L), 1L, store)
    val corrupted = graft.streaming.StreamScd2.intervals(spark, store)
      .collect().map(_.toString).sorted.toSeq

    // restart from the SAME checkpoint: batch 1 re-delivers in full and
    // must overwrite the half-written v1 (rebuilt from v0, never from v1)
    val q2 = startQuery(); q2.processAllAvailable(); q2.stop()
    val replayed = graft.streaming.StreamScd2.intervals(spark, store)
      .collect().map(_.toString).sorted.toSeq

    // the uninterrupted run, folded into a fresh store
    val cleanStore = tmp("scd2-e2e-clean")
    graft.streaming.StreamScd2.foldBatch(batchA, 0L, cleanStore)
    graft.streaming.StreamScd2.foldBatch(batchB, 1L, cleanStore)
    val clean = graft.streaming.StreamScd2.intervals(spark, cleanStore)
      .collect().map(_.toString).sorted.toSeq

    assert(replayed == clean, "restarted query diverged from the uninterrupted run")
    assert(corrupted != clean, "fixture error: the simulated crash must corrupt the store")
  }

  test("crash-replay e2e: restarted incremental-dedup query overwrites the half-written sink batch") {
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    val nDocs = docs.agg(max("doc_id")).head().getLong(0) + 1
    val splitId = nDocs * 8 / 10
    val store = tmp("dedup-e2e-sigstore")
    val arrays = graft.operators.Dedup.docShingleArrays(spark, dir)
    graft.operators.Dedup.writeSignatureStore(arrays, store, splitId)
    val corpusBands = spark.read.parquet(s"$store/bands.parquet")
    val corpusArrays = arrays.filter(col("doc_id") < splitId)
    val newDocs = docs.filter(col("doc_id") >= splitId).select("doc_id", "text")
    val midId = splitId + (nDocs - splitId) / 2

    val input = tmp("dedup-e2e-in")
    val out = tmp("dedup-e2e-out")
    val ckpt = tmp("dedup-e2e-ckpt")
    val schema = newDocs.schema

    def startQuery() = graft.streaming.StreamDedup.start(
      spark.readStream.schema(schema).parquet(input),
      corpusArrays, corpusBands, 0.6, ckpt) { (pairs, batchId) =>
      pairs.write.mode("overwrite").parquet(s"$out/batch_$batchId")
    }

    // batch 0 commits normally
    stageFile(input, "a", newDocs.filter(col("doc_id") < midId))
    val q1 = startQuery(); q1.processAllAvailable(); q1.stop()

    // the crash: batch 1's sink write ran on a PARTIAL batch before the
    // checkpoint committed — batch_1 holds wrong rows the restart must
    // overwrite (the documented overwrite-by-batchId sink contract)
    val batchB = newDocs.filter(col("doc_id") >= midId)
    stageFile(input, "b", batchB)
    graft.operators.Dedup.incrementalNearDupsFrom(
      batchB.limit(1), corpusArrays, corpusBands, 0.6)
      .write.mode("overwrite").parquet(s"$out/batch_1")

    val q2 = startQuery(); q2.processAllAvailable(); q2.stop()

    val streamed = spark.read.parquet(s"$out/batch_*")
      .collect().map(_.toString).sorted.toSeq
    val batch = graft.operators.Dedup.incrementalNearDupsFrom(
      newDocs, corpusArrays, corpusBands, 0.6)
      .collect().map(_.toString).sorted.toSeq
    assert(streamed == batch,
      "restarted dedup stream's sink union diverged from the batch increment operator")
    assert(batch.nonEmpty, "fixture must contain near-dup pairs across the split")
  }

  test("r17 crash-replay e2e: all four sketch-store kinds rebuild the corrupted version from checkpoint (VERDICT r16 #6)") {
    import spark.implicits._
    // Per kind: batch 0 commits; batch 1's fold runs PARTIALLY and the
    // query dies before the checkpoint commit (half-written v1 the
    // checkpoint does not know about); the restart re-delivers batch 1 in
    // full and must rebuild v1 FROM v0 — never from the corrupt v1 — so
    // the replayed store equals an uninterrupted fold.
    def strRows(r: Range, keyOf: Int => String): Seq[(String, String)] =
      r.map(i => (keyOf(i), s"u$i"))
    def check(kind: String, batchA: DataFrame, batchB: DataFrame,
        partial: DataFrame, reader: String => DataFrame): Unit = {
      val input = tmp(s"sketch-e2e-$kind-in")
      val store = tmp(s"sketch-e2e-$kind-store")
      val ckpt = tmp(s"sketch-e2e-$kind-ckpt")
      val schema = batchA.schema
      def startQuery() = graft.streaming.StreamSketch.start(
        spark.readStream.schema(schema).parquet(input), store, ckpt,
        "k", "v", kind = kind)

      stageFile(input, "a", batchA)
      val q1 = startQuery(); q1.processAllAvailable(); q1.stop()
      assert(new java.io.File(s"$store/v0").exists(), s"$kind: batch 0 must commit v0")

      stageFile(input, "b", batchB)
      graft.streaming.StreamSketch.foldBatch(partial, 1L, store, "k", "v", kind = kind)
      val corrupted = reader(store).collect().map(_.toString).sorted.toSeq

      val q2 = startQuery(); q2.processAllAvailable(); q2.stop()
      val replayed = reader(store).collect().map(_.toString).sorted.toSeq

      val clean = tmp(s"sketch-e2e-$kind-clean")
      graft.streaming.StreamSketch.foldBatch(batchA, 0L, clean, "k", "v", kind = kind)
      graft.streaming.StreamSketch.foldBatch(batchB, 1L, clean, "k", "v", kind = kind)
      val expected = reader(clean).collect().map(_.toString).sorted.toSeq

      assert(replayed == expected, s"$kind: restarted query diverged from the uninterrupted fold")
      assert(corrupted != expected, s"$kind: fixture error — the simulated crash must corrupt the store")
    }

    // hll/theta: distinct-count sketches over string values; dropping the
    // partial batch's tail changes the per-key distinct counts
    val aStr = strRows(0 until 40, i => if (i % 2 == 0) "a" else "b").toDF("k", "v")
    val bStr = strRows(40 until 100, i => if (i % 2 == 0) "a" else "b").toDF("k", "v")
    val bStrPartial = strRows(40 until 55, i => if (i % 2 == 0) "a" else "b").toDF("k", "v")
    check("hll", aStr, bStr, bStrPartial,
      s => graft.streaming.StreamSketch.estimates(spark, s, "k"))
    check("theta", aStr, bStr, bStrPartial,
      s => graft.streaming.StreamSketch.estimates(spark, s, "k", kind = "theta"))

    // freq: heavy hitters — batch B's tail makes "hot" the clear winner;
    // the partial fold misses it
    val aFreq = (0 until 30).map(i => ("g", s"item${i % 5}")).toDF("k", "v")
    val bFreq = ((0 until 10).map(i => ("g", s"item${i % 5}")) ++
      (0 until 50).map(_ => ("g", "hot"))).toDF("k", "v")
    val bFreqPartial = (0 until 10).map(i => ("g", s"item${i % 5}")).toDF("k", "v")
    check("freq", aFreq, bFreq, bFreqPartial,
      s => graft.streaming.StreamSketch.heavyHitters(spark, s, "k"))

    // kll: quantiles over doubles — batch B's tail shifts the median
    val aKll = (0 until 50).map(i => ("g", i.toDouble)).toDF("k", "v")
    val bKll = (50 until 150).map(i => ("g", i.toDouble)).toDF("k", "v")
    val bKllPartial = (50 until 60).map(i => ("g", i.toDouble)).toDF("k", "v")
    check("kll", aKll, bKll, bKllPartial,
      s => graft.streaming.StreamSketch.quantiles(spark, s, "k", Seq(0.5, 0.9)))
  }

  // ------------------------------------------------------- ownership guard

  test("ownership guard: a fresh checkpoint (batchId 0) against a newer store fails fast") {
    import spark.implicits._
    val events = Seq((1L, ts(0), 1L, "A", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val counts = Seq((ts(0), "click")).toDF("ts", "event_type")
    val kv = Seq(("a", "x")).toDF("k", "v")
    val docs = Seq((0L, "alpha beta gamma")).toDF("doc_id", "text")

    def expectOwnershipFailure(label: String)(fold: Long => Unit): Unit = {
      fold(0L); fold(1L)
      val e = intercept[IllegalArgumentException](fold(0L))
      assert(e.getMessage.contains("does not own"), s"$label: wrong failure: ${e.getMessage}")
      fold(1L) // equality = replay, still allowed
    }

    val s1 = tmp("own-scd2")
    expectOwnershipFailure("scd2")(id => graft.streaming.StreamScd2.foldBatch(events, id, s1))
    val s2 = tmp("own-monitor")
    expectOwnershipFailure("monitor")(id => graft.streaming.StreamMonitor.foldBatch(counts, id, s2))
    val s3 = tmp("own-sketch")
    expectOwnershipFailure("sketch")(id =>
      graft.streaming.StreamSketch.foldBatch(kv, id, s3, "k", "v"))
    val s4 = tmp("own-linededup")
    expectOwnershipFailure("line-dedup")(id =>
      graft.streaming.StreamLineDedup.foldBatch(docs, id, s4))
  }

  test("ownership guard: ann increment store rejects a fresh checkpoint before encoding") {
    import spark.implicits._
    val store = tmp("own-ann")
    // a committed increment from a previous checkpoint's batch 5
    Files.createDirectories(Paths.get(store, "increments", "v5.parquet"))
    val batch = Seq((1L, Array(0.1f, 0.2f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException](
      graft.streaming.StreamAnnIngest.foldBatch(batch, 0L, store))
    assert(e.getMessage.contains("does not own"))
  }

  // --------------------------------------------------- stray-dir tolerance

  test("stray non-numeric v* directories are ignored, not parsed (scd2 + monitor)") {
    import spark.implicits._
    val events = Seq((1L, ts(0), 1L, "A", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    val store = tmp("stray-scd2")
    graft.streaming.StreamScd2.foldBatch(events, 0L, store)
    Files.createDirectories(Paths.get(store, "vOLD-backup"))
    Files.createDirectories(Paths.get(store, "v1.bak"))
    // previously: NumberFormatException in latestVersion/prune
    graft.streaming.StreamScd2.foldBatch(events, 1L, store)
    assert(graft.streaming.StreamScd2.intervals(spark, store).count() == 1)

    val counts = Seq((ts(0), "click")).toDF("ts", "event_type")
    val mstore = tmp("stray-monitor")
    graft.streaming.StreamMonitor.foldBatch(counts, 0L, mstore)
    Files.createDirectories(Paths.get(mstore, "vOLD-backup"))
    graft.streaming.StreamMonitor.foldBatch(counts, 1L, mstore)
    assert(graft.streaming.StreamMonitor.flags(spark, mstore).count() >= 0)
  }
}

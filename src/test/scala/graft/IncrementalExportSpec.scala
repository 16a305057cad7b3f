package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.jobs.IncrementalExport

/** High-watermark incremental export: consecutive successful runs are
  * non-overlapping, their union is the full table, the watermark never
  * regresses, and an empty delta is a clean no-op export.
  */
class IncrementalExportSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def readIds(outDir: String): Seq[Long] = {
    val files = new java.io.File(outDir).listFiles()
      .filter(f => f.getName.endsWith(".avro")).sortBy(_.getName)
    files.flatMap { f =>
      import scala.jdk.CollectionConverters._
      val r = new org.apache.avro.file.DataFileReader(f,
        new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
      val ids = r.iterator().asScala.map(_.get("id").asInstanceOf[Long]).toVector
      r.close(); ids
    }.toSeq.sorted
  }

  test("r9: three-run incremental protocol over a growing table") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("inc-export").toString
    val in = s"$root/in"; val state = s"$root/state"
    val conf = spark.sparkContext.hadoopConfiguration

    (1L to 100L).toDF("id").withColumn("payload", col("id") * 2)
      .write.mode("overwrite").parquet(in)
    val r1 = IncrementalExport.run(spark, in, s"$root/run1", state, "id")
    assert(r1.metrics.recordCount == 100)
    assert(readIds(s"$root/run1") == (1L to 100L))
    assert(IncrementalExport.readState(conf, state).contains(
      IncrementalExport.State("id", "100")))

    // append a second file — only the delta may export
    (101L to 150L).toDF("id").withColumn("payload", col("id") * 2)
      .write.mode("append").parquet(in)
    val r2 = IncrementalExport.run(spark, in, s"$root/run2", state, "id")
    assert(r2.metrics.recordCount == 50)
    assert(readIds(s"$root/run2") == (101L to 150L))
    assert(IncrementalExport.readState(conf, state).contains(
      IncrementalExport.State("id", "150")))

    // no new data: zero rows, watermark unchanged
    val r3 = IncrementalExport.run(spark, in, s"$root/run3", state, "id")
    assert(r3.metrics.recordCount == 0)
    assert(IncrementalExport.readState(conf, state).contains(
      IncrementalExport.State("id", "150")))
  }

  test("r15: the watermark bound is fixed BEFORE the export and recorded in the query sidecar") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("inc-export-bound").toString
    val in = s"$root/in"; val state = s"$root/state"
    (1L to 20L).toDF("id").write.mode("overwrite").parquet(in)
    IncrementalExport.run(spark, in, s"$root/run1", state, "id")
    // the sidecar carries the CLIPPED window — proof the export is bounded
    // by the pre-computed watermark, not left open to a racing append
    val q1 = scala.io.Source.fromFile(s"$root/run1/_queries/query_0.sql").mkString
    assert(q1.contains("id <= '20'"), s"first-run sidecar must carry the bound: $q1")
    (21L to 30L).toDF("id").write.mode("append").parquet(in)
    IncrementalExport.run(spark, in, s"$root/run2", state, "id")
    val q2 = scala.io.Source.fromFile(s"$root/run2/_queries/query_0.sql").mkString
    assert(q2.contains("id > '20'") && q2.contains("id <= '30'"),
      s"second-run sidecar must carry both bounds: $q2")
  }

  test("r9: timestamp watermark round-trips through the state literal") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("inc-export-ts").toString
    val in = s"$root/in"; val state = s"$root/state"
    val conf = spark.sparkContext.hadoopConfiguration

    (0L until 10L).toDF("n")
      .select(col("n").as("id"), timestamp_micros(col("n") * 3600000000L).as("ts"))
      .write.mode("overwrite").parquet(in)
    val r1 = IncrementalExport.run(spark, in, s"$root/run1", state, "ts")
    assert(r1.metrics.recordCount == 10)
    val s1 = IncrementalExport.readState(conf, state).get
    assert(s1.column == "ts" && s1.maxLiteral.nonEmpty)

    (10L until 15L).toDF("n")
      .select(col("n").as("id"), timestamp_micros(col("n") * 3600000000L).as("ts"))
      .write.mode("append").parquet(in)
    val r2 = IncrementalExport.run(spark, in, s"$root/run2", state, "ts")
    assert(r2.metrics.recordCount == 5, s"state literal $s1 must parse back exactly")
  }

  test("r16: NULL watermark values refuse loudly instead of silently losing rows") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("inc-export-null").toString
    val in = s"$root/in"; val state = s"$root/state"
    Seq(Some(1L), Some(2L), None, Some(3L)).toDF("id")
      .write.mode("overwrite").parquet(in)
    val e = intercept[IllegalArgumentException] {
      IncrementalExport.run(spark, in, s"$root/run1", state, "id")
    }
    assert(e.getMessage.contains("NULL"), e.getMessage)
    // refusal happens BEFORE any state is written
    assert(IncrementalExport.readState(
      spark.sparkContext.hadoopConfiguration, state).isEmpty)
  }

  test("r17: NULL watermark appended AFTER the first run still refuses (audit is not delta-filtered)") {
    // The delta predicate `col > prev` is NULL-false, so a delta-side
    // NULL audit would be blind once state exists — the audit must see
    // the unfiltered base on EVERY run.
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("inc-export-null2").toString
    val in = s"$root/in"; val state = s"$root/state"
    val conf = spark.sparkContext.hadoopConfiguration
    (1L to 10L).toDF("id").write.mode("overwrite").parquet(in)
    IncrementalExport.run(spark, in, s"$root/run1", state, "id")
    assert(IncrementalExport.readState(conf, state).contains(
      IncrementalExport.State("id", "10")))

    Seq(Some(11L), None).toDF("id").write.mode("append").parquet(in)
    val e = intercept[IllegalArgumentException] {
      IncrementalExport.run(spark, in, s"$root/run2", state, "id")
    }
    assert(e.getMessage.contains("NULL"), e.getMessage)
    // watermark untouched by the refused run
    assert(IncrementalExport.readState(conf, state).contains(
      IncrementalExport.State("id", "10")))
  }

  test("r16: first run over an empty table exports 0 rows, writes no state, and the next run catches up") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("inc-export-empty").toString
    val in = s"$root/in"; val state = s"$root/state"
    val conf = spark.sparkContext.hadoopConfiguration
    (1L to 5L).toDF("id").filter(lit(false)).write.mode("overwrite").parquet(in)

    val r1 = IncrementalExport.run(spark, in, s"$root/run1", state, "id")
    assert(r1.metrics.recordCount == 0)
    assert(IncrementalExport.readState(conf, state).isEmpty)
    // the data (0 rows) must AGREE with the WHERE 1=0 sidecar
    val q1 = scala.io.Source.fromFile(s"$root/run1/_queries/query_0.sql").mkString
    assert(q1.contains("1=0"), q1)

    (1L to 5L).toDF("id").write.mode("append").parquet(in)
    val r2 = IncrementalExport.run(spark, in, s"$root/run2", state, "id")
    assert(r2.metrics.recordCount == 5)
    assert(readIds(s"$root/run2") == (1L to 5L))
    assert(IncrementalExport.readState(conf, state).contains(
      IncrementalExport.State("id", "5")))
  }

  test("r9: mixed-column state refuses, unsupported type refuses") {
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("inc-export-bad").toString
    val in = s"$root/in"; val state = s"$root/state"
    (1L to 5L).toDF("id").withColumn("v", col("id") * 0.5)
      .write.mode("overwrite").parquet(in)
    IncrementalExport.run(spark, in, s"$root/run1", state, "id")
    intercept[IllegalArgumentException] {
      IncrementalExport.run(spark, in, s"$root/run2", state, "v") // double: unsupported
    }
    intercept[IllegalArgumentException] {
      // different (supported) column against the same state dir
      (1L to 5L).toDF("id").withColumn("w", col("id") + 10)
        .write.mode("overwrite").parquet(s"$root/in2")
      IncrementalExport.run(spark, s"$root/in2", s"$root/run3", state, "w")
    }
  }
}

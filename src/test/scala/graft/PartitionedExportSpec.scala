package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.jobs.PartitionedExport

class PartitionedExportSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("r9: hive layout, per-dir contract, manifest total == input count") {
    val dir = SparkSpec.testDataDir
    val out = java.nio.file.Files.createTempDirectory("pexp").toString
    val df = spark.read.parquet(s"$dir/events.parquet")
    val res = PartitionedExport.run(spark, df, out, "event_type",
      sinkArgs = graft.args.AvroSinkArgs(codec = "deflate1"))
    assert(res.partitions.length == 5)
    assert(res.totalRecords == df.count())
    val root = new java.io.File(out)
    val subdirs = root.listFiles().filter(_.isDirectory).map(_.getName).sorted
    assert(subdirs.forall(_.startsWith("event_type=")), subdirs.mkString(","))
    // each sub-export carries the full single-export contract
    subdirs.foreach { d =>
      val files = new java.io.File(root, d).listFiles().map(_.getName).toSet
      for (f <- Seq("_AVRO_SCHEMA.avsc", "_METRICS.json", "_MANIFEST"))
        assert(files.contains(f), s"$d missing $f")
      assert(files.exists(_.endsWith(".avro")), s"$d has no avro part")
    }
    // manifest agrees with a direct group-by
    val manifest = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$out/_PARTITIONS.json")))
    val exact = df.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(manifest.contains(s""""${PartitionedExport.sanitize(k)}":$n"""), s"$k=$n in $manifest")
    }
    // avro rows readable and typed
    val anAvro = new java.io.File(root, subdirs.head).listFiles()
      .filter(_.getName.endsWith(".avro")).head
    val reader = new org.apache.avro.file.DataFileReader(anAvro,
      new org.apache.avro.generic.GenericDatumReader[org.apache.avro.generic.GenericRecord]())
    assert(reader.hasNext && reader.next().get("event_type") != null)
    reader.close()
  }

  test("r9: refusals — cardinality bound and sanitization collisions") {
    import spark.implicits._
    val df = spark.range(100).selectExpr("id", "CAST(id AS STRING) AS k")
    val out = java.nio.file.Files.createTempDirectory("pexp-refuse").toString
    val e = intercept[IllegalArgumentException] {
      PartitionedExport.run(spark, df, out, "k", maxPartitions = 10)
    }
    assert(e.getMessage.contains("distinct values"))
    val collide = Seq((1L, "a.b"), (2L, "a_b")).toDF("id", "k")
    val e2 = intercept[IllegalArgumentException] {
      PartitionedExport.run(spark, collide, out, "k")
    }
    assert(e2.getMessage.contains("collide"))
  }
}

package graft

import java.io.File
import java.nio.file.Files

import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.scalatest.funsuite.AnyFunSuite

import graft.args.AvroSinkArgs
import graft.jobs.ExportJob
import graft.schema.AvroSchemaGen
import graft.sink.AvroSink

/** The reference's e2e suite matrix (`e2e/e2e.sh:102-109`) as one contract
  * test over the parquet fixtures: {deflate1, zstandard1} codecs ×
  * {default, queryParallelism=5} write layout × array handling (no arrays /
  * typed array items / nullable array items — the Spark-side faces of the
  * reference's `--arrayMode` cells). Every cell runs the full ExportJob
  * pipeline (what `ExportCli.main` drives after arg parsing) and asserts
  * the W6 output-layout contract, the minRows gate, the requested codec in
  * the container header, and the parallelism in the part-file naming.
  */
class E2eMatrixSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = SparkSpec.testDataDir

  private def openReader(f: File) =
    new DataFileReader[GenericRecord](f, new GenericDatumReader[GenericRecord]())

  test("e2e matrix: codec x parallelism x array handling, full layout + minRows per cell") {
    case class Cell(name: String, table: String, codec: String,
        parallelism: Option[Int], nullableArrayItems: Boolean)
    // The reference suite's five executions, re-expressed for the parquet
    // source: two codec cells, one split-parallelism cell, two array cells.
    val cells = Seq(
      Cell("deflate1", "lineitem", "deflate1", None, nullableArrayItems = false),
      Cell("zstandard1", "lineitem", "zstandard1", None, nullableArrayItems = false),
      Cell("deflate1-par5", "lineitem", "deflate1", Some(5), nullableArrayItems = false),
      Cell("arrays-typed", "embeddings", "deflate1", None, nullableArrayItems = false),
      Cell("arrays-nullable", "embeddings", "deflate1", None, nullableArrayItems = true))

    for (cell <- cells) {
      val out = Files.createTempDirectory(s"e2e-${cell.name}").toString
      try {
      val df0 = spark.read.parquet(s"$dir/${cell.table}.parquet")
      val expected = df0.count()
      // --queryParallelism=n, exactly as ExportCli wires it
      val df = cell.parallelism
        .map(n => AvroSink.ensureWriteParallelism(df0, n))
        .getOrElse(df0.coalesce(1))
      val res = ExportJob.run(
        spark, df, out,
        sinkArgs = AvroSinkArgs(codec = cell.codec),
        schemaCfg = AvroSchemaGen.Config(
          tableName = cell.table, nullableArrayItems = cell.nullableArrayItems),
        queries = Seq(s"SELECT * FROM ${cell.table} WHERE 1=1"),
        minRows = expected) // the gate itself: one row short would throw (exit 50)
      assert(res.metrics.recordCount == expected, s"${cell.name}: row count")

      // W6 layout contract, exactly (reference `jobs/JdbcAvroJobTest.java:101-140`)
      val entries = new File(out).listFiles().map(_.getName).toSet
      val parts = entries.filter(_.endsWith(".avro"))
      val nParts = cell.parallelism.getOrElse(1)
      assert(parts == (0 until nParts)
        .map(i => f"part-$i%05d-of-$nParts%05d.avro").toSet, s"${cell.name}: part naming")
      assert(entries -- parts == Set("_MANIFEST", "_AVRO_SCHEMA.avsc", "_METRICS.json",
        "_SERVICE_METRICS.json", "_queries"), s"${cell.name}: side outputs")

      // requested codec is in every container header (`avro-tools getmeta`;
      // the header carries the codec NAME — the level is a write-time knob)
      val codecName = cell.codec.replaceAll("[0-9]+$", "")
      for (p <- parts) {
        val r = openReader(new File(out, p))
        try assert(r.getMetaString("avro.codec") == codecName, s"${cell.name}: codec header")
        finally r.close()
      }

      // array cells: item schema reflects the nullable-items flag
      if (cell.table == "embeddings") {
        val schema = new org.apache.avro.Schema.Parser().parse(
          Files.readString(new File(out, "_AVRO_SCHEMA.avsc").toPath))
        val emb = schema.getField("embedding").schema() // ["null", array]
        val arr = emb.getTypes.get(1)
        val item = arr.getElementType
        val isUnionNull = item.getType == org.apache.avro.Schema.Type.UNION
        assert(isUnionNull == cell.nullableArrayItems,
          s"${cell.name}: array item nullability must follow the flag, got $item")
        // and the data decodes: spot-check one record's array length
        val r = openReader(new File(out, parts.head))
        try {
          val rec = r.next()
          val a = rec.get("embedding").asInstanceOf[java.util.Collection[_]]
          assert(a.size == 64, s"${cell.name}: 64-dim embedding round-trip")
        } finally r.close()
      }

      } finally {
        // clean the cell's output even when an assertion fails mid-cell
        // (no /tmp accumulation across red CI runs)
        new scala.reflect.io.Directory(new File(out)).deleteRecursively()
      }
    }
  }
}

package graft

import java.io.File
import java.nio.file.Files
import java.sql.Timestamp

import scala.jdk.CollectionConverters._

import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.args.AvroSinkArgs
import graft.jobs.{ExportJob, FailedValidationException}
import graft.schema.AvroSchemaGen
import graft.sink.AvroSink

/** Avro round-trip + output-contract tests, mirroring the reference's
  * `avro/JdbcAvroRecordTest.java:187-249` (value equality through the file)
  * and `jobs/JdbcAvroJobTest.java:101-140` (file-set contract).
  */
class AvroSinkSpec extends AnyFunSuite {

  private lazy val spark = SparkSpec.spark

  private def tmpDir(prefix: String): String =
    Files.createTempDirectory(prefix).toString

  private val coffeeSchema = StructType(Seq(
    StructField("COF_NAME", StringType, nullable = false),
    StructField("SUP_ID", IntegerType),
    StructField("PRICE", DecimalType(21, 2)),
    StructField("TEMPERATURE", FloatType),
    StructField("SIZE", DoubleType),
    StructField("IS_ARABIC", BooleanType),
    StructField("TOTAL", LongType),
    StructField("CREATED", TimestampType),
    StructField("UPDATED", TimestampType),
    StructField("INT_ARR", ArrayType(IntegerType, containsNull = false)),
    StructField("TEXT_ARR", ArrayType(StringType, containsNull = false))
  ))

  // Golden row 1 from the reference fixture (`Coffee.java:136-163`).
  private val created = Timestamp.from(java.time.Instant.parse("2017-02-28T16:35:33Z"))
  private val rows = Seq(
    Row("costa rica caffee", null, new java.math.BigDecimal("7.20"), 82.5f, 320.7, true,
      200L, created, null, Seq(5, 7, 11), Seq("rock", "scissors", "paper")),
    Row("colombian caffee", null, new java.math.BigDecimal("9.99"), 75.0f, 500.0, false,
      401L, created, null, Seq(1, 2, 3), Seq("a", "b", "c"))
  )

  private def coffeeDf = spark.createDataFrame(rows.asJava, coffeeSchema).coalesce(1)

  private def readAvro(dir: String): Seq[GenericRecord] = {
    val files = new File(dir).listFiles().filter(_.getName.endsWith(".avro")).sortBy(_.getName)
    files.flatMap { f =>
      val r = new DataFileReader[GenericRecord](f, new GenericDatumReader[GenericRecord]())
      val out = r.iterator().asScala.toVector
      r.close()
      out
    }.toSeq
  }

  test("round trip: values survive with dbeam conversion semantics") {
    val dir = tmpDir("avro-rt")
    val schema = AvroSchemaGen.generate(coffeeSchema, AvroSchemaGen.Config(tableName = "COFFEES"))
    val m = AvroSink.write(coffeeDf, schema, dir, "deflate1")
    assert(m.recordCount == 2)
    assert(m.bytesWritten > 0)

    val recs = readAvro(dir)
    assert(recs.size == 2)
    val r1 = recs.find(_.get("COF_NAME").toString == "costa rica caffee").get
    assert(r1.get("SUP_ID") == null)
    assert(r1.get("PRICE").toString == "7.20") // decimal -> string, scale preserved
    assert(r1.get("TEMPERATURE") == 82.5f)
    assert(r1.get("SIZE") == 320.7)
    assert(r1.get("IS_ARABIC") == true)
    assert(r1.get("TOTAL") == 200L)
    assert(r1.get("CREATED") == 1488299733000L) // epoch millis, UTC
    assert(r1.get("UPDATED") == null)
    assert(r1.get("INT_ARR").asInstanceOf[java.util.List[_]].asScala.toList == List(5, 7, 11))
    assert(r1.get("TEXT_ARR").asInstanceOf[java.util.List[_]].asScala.map(_.toString).toList ==
      List("rock", "scissors", "paper"))
  }

  test("file metadata: codec, sync, created_by") {
    val dir = tmpDir("avro-meta")
    val schema = AvroSchemaGen.generate(coffeeSchema, AvroSchemaGen.Config(tableName = "COFFEES"))
    AvroSink.write(coffeeDf, schema, dir, "deflate1")
    val f = new File(dir).listFiles().find(_.getName.endsWith(".avro")).get
    val r = new DataFileReader[GenericRecord](f, new GenericDatumReader[GenericRecord]())
    assert(r.getMetaString("avro.codec") == "deflate")
    assert(r.getMetaString("created_by") == "dbeamspark")
    r.close()
  }

  test("one part file per partition, named part-SSSSS-of-NNNNN.avro") {
    val dir = tmpDir("avro-parts")
    val df = spark.range(0, 1000).toDF("id").repartition(3)
    val schema = AvroSchemaGen.generate(df.schema, AvroSchemaGen.Config(tableName = "r"))
    val m = AvroSink.write(df, schema, dir, "deflate1")
    assert(m.recordCount == 1000)
    val names = new File(dir).listFiles().map(_.getName).filter(_.endsWith(".avro")).sorted
    assert(names.toSeq == Seq(
      "part-00000-of-00003.avro", "part-00001-of-00003.avro", "part-00002-of-00003.avro"))
    assert(readAvro(dir).map(_.get("id").asInstanceOf[Long]).sorted == (0L until 1000L))
  }

  test("metering cadence: in-flight flushes fire every meterEveryRows, count stays exact") {
    // 2500 rows in ONE partition at cadence 1000 → exactly 2 in-flight
    // flushes (the 500-row remainder lands in the end-of-task flush);
    // recordCount must be exact either way (reference JdbcAvroMetering
    // cadence, avro/JdbcAvroMetering.java:54-78).
    val dir = tmpDir("avro-meter")
    val df = spark.range(0, 2500).toDF("id").coalesce(1)
    val schema = AvroSchemaGen.generate(df.schema, AvroSchemaGen.Config(tableName = "r"))
    val m = AvroSink.write(df, schema, dir, "deflate1", meterEveryRows = 1000L)
    assert(m.recordCount == 2500)
    assert(m.meterFlushes == 2, s"expected 2 cadence flushes, got ${m.meterFlushes}")
    // multi-partition: flushes sum per-task floors
    val dir2 = tmpDir("avro-meter2")
    val df2 = spark.range(0, 1000).toDF("id").repartition(4)
    val m2 = AvroSink.write(df2, schema, dir2, "deflate1", meterEveryRows = 100L)
    assert(m2.recordCount == 1000)
    val perPart = readAvro(dir2).size // sanity: all rows present
    assert(perPart == 1000)
    // 4 tasks × floor(rows_p/100) flushes; rows_p ≈ 250 ⇒ 8-10 total
    assert(m2.meterFlushes >= 8 && m2.meterFlushes <= 10,
      s"cadence flushes off: ${m2.meterFlushes}")
    // default cadence (100k) leaves small exports flush-free
    val dir3 = tmpDir("avro-meter3")
    val m3 = AvroSink.write(df, schema, dir3, "deflate1")
    assert(m3.meterFlushes == 0 && m3.recordCount == 2500)
  }

  test("r15: a zero-partition plan still publishes one readable empty part matching the manifest") {
    val schema = StructType(Seq(StructField("id", LongType)))
    // an RDD-backed empty frame keeps ZERO partitions through toRdd —
    // previously: no task ran, no part file, but the manifest named one
    val df = spark.createDataFrame(spark.sparkContext.emptyRDD[Row], schema)
    assert(df.queryExecution.toRdd.getNumPartitions == 0, "fixture must be zero-partition")
    val out = tmpDir("avro-empty")
    val avro = AvroSchemaGen.generate(schema, AvroSchemaGen.Config(tableName = "empty"))
    val m = AvroSink.write(df, avro, out, "deflate1")
    assert(m.recordCount == 0)
    val names = new File(out).listFiles().map(_.getName).toSet
    assert(names.contains("part-00000-of-00001.avro"), s"missing empty part: $names")
    // and the sink's own reader accepts the directory (manifest matches)
    assert(graft.sources.AvroSource.read(spark, out).count() == 0)
  }

  test("codec validation") {
    AvroSink.codecFactory("snappy")
    AvroSink.codecFactory("deflate9")
    AvroSink.codecFactory("zstandard3")
    assertThrows[IllegalArgumentException](AvroSink.codecFactory("deflate0"))
    assertThrows[IllegalArgumentException](AvroSink.codecFactory("lz4"))
    assertThrows[IllegalArgumentException](AvroSinkArgs(codec = "gzip"))
  }

  test("ExportJob writes the full dbeam output contract") {
    val dir = tmpDir("job-contract")
    val res = ExportJob.run(
      spark, coffeeDf, dir,
      sinkArgs = AvroSinkArgs(codec = "deflate1"),
      schemaCfg = AvroSchemaGen.Config(tableName = "COFFEES"),
      queries = Seq("SELECT * FROM COFFEES WHERE 1=1"))
    assert(res.metrics.recordCount == 2)
    val entries = new File(dir).listFiles().map(_.getName).toSet
    assert(entries == Set(
      "part-00000-of-00001.avro", "_MANIFEST", "_AVRO_SCHEMA.avsc", "_METRICS.json",
      "_SERVICE_METRICS.json", "_queries"))
    assert(new File(dir, "_queries").listFiles().map(_.getName).toSeq == Seq("query_0.sql"))
    val schemaJson = Files.readString(new File(dir, "_AVRO_SCHEMA.avsc").toPath)
    assert(new org.apache.avro.Schema.Parser().parse(schemaJson).getName == "COFFEES")
    val metrics = Files.readString(new File(dir, "_METRICS.json").toPath)
    for (k <- Seq("recordCount", "bytesWritten", "writeElapsedMs", "msPerMillionRows",
        "rowsPerMinute", "KbWritePerSec", "executeQueryElapsedMs", "schemaElapsedTimeMs"))
      assert(metrics.contains(k), s"missing metric $k")
  }

  test("dataOnly writes part files only") {
    val dir = tmpDir("job-dataonly")
    ExportJob.run(spark, coffeeDf, dir,
      sinkArgs = AvroSinkArgs(codec = "deflate1"),
      schemaCfg = AvroSchemaGen.Config(tableName = "COFFEES"),
      queries = Seq("q"), dataOnly = true)
    assert(new File(dir).listFiles().map(_.getName).toSet == Set("part-00000-of-00001.avro"))
  }

  test("minRows validation fails with FailedValidationException (exit 50)") {
    val dir = tmpDir("job-minrows")
    val e = intercept[FailedValidationException] {
      ExportJob.run(spark, coffeeDf, dir,
        sinkArgs = AvroSinkArgs(codec = "deflate1"),
        schemaCfg = AvroSchemaGen.Config(tableName = "COFFEES"),
        minRows = 100)
    }
    assert(graft.jobs.ExitCodes.forThrowable(e) == 50)
  }

  test("user-provided Avro schema replaces inference, docs/namespace propagate") {
    // mirrors the reference's input-schema path (`jobs/JdbcAvroJob.java:146-152`,
    // `options/InputAvroSchemaTest.java`): record doc, namespace and field
    // docs come from the user .avsc, values still round-trip
    val userJson =
      """{
        |  "name": "UserCoffee", "namespace": "v2", "type": "record",
        |  "doc": "Record description",
        |  "fields": [
        |    {"name": "name", "type": ["null", "string"], "doc": "Field1 description", "default": null},
        |    {"name": "total", "type": ["null", "long"], "doc": "Field2 description", "default": null}
        |  ]
        |}""".stripMargin
    val avscPath = Files.createTempFile("user-schema", ".avsc")
    Files.write(avscPath, userJson.getBytes("UTF-8"))
    val user = AvroSchemaGen.parseInputAvroSchemaFile(
      spark.sparkContext.hadoopConfiguration, avscPath.toString)

    val df = coffeeDf.selectExpr("COF_NAME", "TOTAL")
    val dir = tmpDir("avro-user-schema")
    val res = ExportJob.run(spark, df, dir, userSchema = Some(user))
    assert(res.metrics.recordCount == 2)

    // the side-output schema IS the user schema
    val sideSchema = new org.apache.avro.Schema.Parser().parse(
      new String(Files.readAllBytes(java.nio.file.Paths.get(dir, "_AVRO_SCHEMA.avsc")), "UTF-8"))
    assert(sideSchema.getDoc == "Record description")
    assert(sideSchema.getNamespace == "v2")
    assert(sideSchema.getField("name").doc() == "Field1 description")

    // data files decode with the user header, values intact under user names
    val recs = readAvro(dir)
    assert(recs.map(_.get("name").toString).toSet == Set("costa rica caffee", "colombian caffee"))
    assert(recs.map(_.get("total")).toSet == Set(200L, 401L))
    assert(recs.head.getSchema.getNamespace == "v2")
  }

  test("wire-incompatible user schema fails fast (exit 43), not corrupt files") {
    val badJson =
      """{
        |  "name": "Bad", "type": "record",
        |  "fields": [
        |    {"name": "name", "type": ["null", "int"], "default": null},
        |    {"name": "total", "type": ["null", "long"], "default": null}
        |  ]
        |}""".stripMargin
    val bad = new org.apache.avro.Schema.Parser().parse(badJson)
    val df = coffeeDf.selectExpr("COF_NAME", "TOTAL")
    val e = intercept[IllegalArgumentException] {
      ExportJob.run(spark, df, tmpDir("avro-bad-user-schema"), userSchema = Some(bad))
    }
    assert(e.getMessage.contains("name"))
    // field-count mismatch is also caught before any write
    intercept[IllegalArgumentException] {
      ExportJob.run(spark, coffeeDf, tmpDir("avro-bad-user-schema2"), userSchema = Some(bad))
    }
  }

  test("null array item without nullableArrayItems fails with targeted error") {
    val dir = tmpDir("avro-nullitem")
    val schema = StructType(Seq(StructField("arr", ArrayType(IntegerType, containsNull = true))))
    val df = spark.createDataFrame(
      Seq(Row(Seq[Any](1, null, 3))).asJava, schema).coalesce(1)
    val avro = AvroSchemaGen.generate(schema, AvroSchemaGen.Config())
    val e = intercept[Exception] {
      AvroSink.write(df, avro, dir, "deflate1")
    }
    assert(e.getMessage.contains("nullableArrayItems") ||
      Option(e.getCause).exists(_.getMessage.contains("nullableArrayItems")))

    // and with the flag, the null item round-trips
    val dir2 = tmpDir("avro-nullitem-ok")
    val avro2 = AvroSchemaGen.generate(schema, AvroSchemaGen.Config(nullableArrayItems = true))
    val m = AvroSink.write(df, avro2, dir2, "deflate1", nullableArrayItems = true)
    assert(m.recordCount == 1)
  }
}

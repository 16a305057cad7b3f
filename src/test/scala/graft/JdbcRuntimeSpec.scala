package graft

import java.io.File
import java.nio.file.Files
import java.sql.{Timestamp, Types}
import java.time.{Instant, Period}

import scala.jdk.CollectionConverters._

import org.apache.avro.file.DataFileReader
import org.apache.avro.generic.{GenericDatumReader, GenericRecord}
import org.scalatest.funsuite.AnyFunSuite

import graft.args.{ArrayMode, ConnectionArgs, QueryArgs}
import graft.jdbc.StubDb
import graft.jobs.{ExitCodes, ExportJob, FailedValidationException, NotReadyException, ReplicationCheck}
import graft.sources.JdbcSource
import graft.sql.QueryBuilder

/** RUNTIME exercise of the JDBC product path — the round-9 VERDICT's #2:
  * `JdbcSource.read` → `spark.read.jdbc` → Spark's driver registry → the
  * in-repo `org.h2.Driver` stub ([[graft.jdbc.StubDb]]) — so the ResultSet-
  * driving loop, fetchSize plumbing, sessionInitStatement pre-commands,
  * the `WHERE 1=0` schema probe, split-predicate partitioning, and the
  * live replication query all EXECUTE rather than just compile. Modeled on
  * the reference's H2-backed `jobs/JdbcAvroJobTest.java:83-295`
  * (fixtures: `DbTestHelper.java` COFFEES) and
  * `JdbcAvroRecordTest`/`PsqlReplicationCheckTest`.
  */
class JdbcRuntimeSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  /** COFFEES-shaped fixture: 100 rows, BIGINT split column, a NULLable
    * column, a timestamp — the types `JdbcTypeMap` exercises end-to-end.
    */
  private def fixture(db: String): Unit = {
    StubDb.reset(db)
    val rows = (0 until 100).map { i =>
      Vector[Any](
        i.toLong, // ID BIGINT
        s"coffee_$i", // COF_NAME VARCHAR
        100 + i, // SIZE INTEGER
        i * 1.5, // TOTAL DOUBLE
        Timestamp.from(Instant.parse("2026-02-01T00:00:00Z").plusSeconds(i * 3600L)), // CREATED
        if (i % 10 == 0) null else s"note_$i") // NOTE VARCHAR NULL
    }.toVector
    StubDb.register(db, "COFFEES", StubDb.Table(
      Vector(
        StubDb.Col("ID", Types.BIGINT),
        StubDb.Col("COF_NAME", Types.VARCHAR),
        StubDb.Col("SIZE", Types.INTEGER),
        StubDb.Col("TOTAL", Types.DOUBLE),
        StubDb.Col("CREATED", Types.TIMESTAMP),
        StubDb.Col("NOTE", Types.VARCHAR, nullable = true)),
      rows))
  }

  private def conn(db: String) = ConnectionArgs(s"jdbc:h2:mem:$db", username = "tester")

  private def readAvro(outDir: String): Vector[GenericRecord] = {
    val parts = new File(outDir).listFiles().filter(_.getName.endsWith(".avro")).sortBy(_.getName)
    parts.toVector.flatMap { f =>
      val r = new DataFileReader[GenericRecord](f, new GenericDatumReader[GenericRecord]())
      try r.iterator().asScala.toVector
      finally r.close()
    }
  }

  test("JDBC export end-to-end: split predicates -> spark.read.jdbc -> Avro layout (W6)") {
    val db = "graftjdbc_e2e"
    fixture(db)
    val args = QueryArgs(
      base = QueryBuilder.fromTable("COFFEES"),
      queryParallelism = Some(4), splitColumn = Some("ID"))
    val source = JdbcSource(conn(db), args, fetchSize = 1234)
    val df = source.read(spark)

    // one Spark partition per generated range query — the reference's
    // one-query-one-writer model (JdbcAvroJob.java:138-143)
    assert(df.rdd.getNumPartitions == 4)

    val out = Files.createTempDirectory("jdbc-e2e").toString
    val res = ExportJob.run(spark, df, out,
      schemaCfg = graft.schema.AvroSchemaGen.Config(tableName = "COFFEES"),
      queries = source.queries(spark), minRows = 100)
    assert(res.metrics.recordCount == 100)

    // W6 layout: schema + metrics + one query file per split + part files
    val names = new File(out).listFiles().map(_.getName).toSet
    assert(names.contains("_AVRO_SCHEMA.avsc"))
    assert(names.contains("_METRICS.json"))
    assert(names.contains("_SERVICE_METRICS.json"))
    assert(names.contains("_queries"))
    val queryFiles = new File(s"$out/_queries").listFiles().map(_.getName).toSet
    assert(queryFiles == Set("query_0.sql", "query_1.sql", "query_2.sql", "query_3.sql"))

    // values round-trip through the real ResultSet loop: all 100 ids, the
    // U1 timestamp→epoch-millis contract, NULLs preserved
    val records = readAvro(out)
    assert(records.size == 100)
    val byId = records.map(r => r.get("ID").asInstanceOf[Long] -> r).toMap
    assert(byId.keySet == (0L until 100L).toSet)
    assert(byId(3L).get("COF_NAME").toString == "coffee_3")
    assert(byId(3L).get("SIZE") == 103)
    assert(byId(3L).get("TOTAL") == 4.5)
    assert(byId(3L).get("CREATED") ==
      Instant.parse("2026-02-01T03:00:00Z").toEpochMilli)
    assert(byId(10L).get("NOTE") == null && byId(11L).get("NOTE").toString == "note_11")

    // the schema probe executed as a real query (Spark's resolveTable)
    val log = StubDb.log(db).toVector
    assert(log.exists(e => e.startsWith("prepareStatement(") && e.contains("WHERE 1=0")),
      s"schema probe missing from protocol log:\n${log.mkString("\n")}")
    // split predicates reached the database as WHERE clauses
    assert(log.exists(e => e.contains("ID >= 0") && e.contains("ID < 25")))
    assert(log.exists(e => e.contains("ID >= 75") && e.contains("ID <= 99")), // last range inclusive (X1)
      s"inclusive last range missing:\n${log.filter(_.contains("ID >=")).mkString("\n")}")
    // fetchSize plumbed through to every data statement
    assert(log.count(_ == "main.setFetchSize(1234)") >= 4)
  }

  test("JDBC pre-commands run before the main query on the same connection (sessionInitStatement)") {
    val db = "graftjdbc_pre"
    fixture(db)
    val source = JdbcSource(conn(db),
      QueryArgs(base = QueryBuilder.fromTable("COFFEES")),
      fetchSize = 500, preCommands = Seq("SET SESSION characteristics AS TRANSACTION READ ONLY"))
    assert(source.read(spark).count() == 100)
    val log = StubDb.log(db).toVector
    val preIdx = log.indexWhere(e => e.startsWith("pre.execute(SET SESSION"))
    val mainIdx = log.lastIndexWhere(_ == "main.executeQuery")
    assert(preIdx >= 0, s"pre-command never executed:\n${log.mkString("\n")}")
    assert(preIdx < mainIdx, "pre-command must run before the main data query")
  }

  test("JDBC partition filter (F1) pushes into the generated query and filters rows") {
    val db = "graftjdbc_f1"
    fixture(db)
    // CREATED spans 100 hours from 2026-02-01T00:00Z; a 1-day window keeps hours 0-23
    val args = QueryArgs(
      base = QueryBuilder.fromTable("COFFEES"),
      partitionColumn = Some("CREATED"),
      partition = Some(Instant.parse("2026-02-01T00:00:00Z")),
      partitionPeriod = Period.ofDays(1))
    val df = JdbcSource(conn(db), args).read(spark)
    assert(df.count() == 24)
    val log = StubDb.log(db).toVector
    assert(log.exists(e => e.contains("CREATED >= '2026-02-01'") && e.contains("CREATED < '2026-02-02'")),
      s"partition filter not in generated SQL:\n${log.filter(_.startsWith("prepareStatement")).mkString("\n")}")
  }

  test("JDBC limit pushes down (L1) and the user-query base wraps (S2)") {
    val db = "graftjdbc_lim"
    fixture(db)
    val args = QueryArgs(
      base = QueryBuilder.fromSqlQuery("SELECT * FROM COFFEES WHERE SIZE >= 150;"),
      limit = Some(7))
    val df = JdbcSource(conn(db), args).read(spark)
    assert(df.count() == 7)
    val log = StubDb.log(db).toVector
    assert(log.exists(e => e.contains("user_sql_query") && e.contains("LIMIT 7")))
  }

  test("executeQueryWithPreCommands drives a live ResultSet with the reference's statement protocol") {
    val db = "graftjdbc_proto"
    fixture(db)
    val source = JdbcSource(conn(db),
      QueryArgs(base = QueryBuilder.fromTable("COFFEES")),
      fetchSize = 42, preCommands = Seq("SET a=1", "SET b=2"))
    val connection = StubDb.connect(s"jdbc:h2:mem:$db")
    val rs = source.executeQueryWithPreCommands(connection, "SELECT * FROM COFFEES WHERE 1=1 LIMIT 3")
    val ids = Iterator.continually(rs).takeWhile(_.next()).map(_.getLong("ID")).toVector
    assert(ids == Vector(0L, 1L, 2L))
    val log = StubDb.log(db).toVector
    // reference JdbcAvroIO.java:174-201 order: prepare main, setFetchSize,
    // pre-commands, then execute main
    val prepIdx = log.indexWhere(_.startsWith("prepareStatement(SELECT * FROM COFFEES"))
    val fetchIdx = log.indexOf("main.setFetchSize(42)")
    val preA = log.indexOf("pre.execute(SET a=1)")
    val preB = log.indexOf("pre.execute(SET b=2)")
    val execIdx = log.indexOf("main.executeQuery")
    assert(prepIdx >= 0 && fetchIdx > prepIdx && preA > fetchIdx && preB > preA && execIdx > preB,
      s"protocol order violated:\n${log.mkString("\n")}")
  }

  test("live replication check: ready, delayed (exit 20), primary server, empty result") {
    val db = "graftjdbc_repl"
    StubDb.reset(db)
    val connection = StubDb.connect(s"jdbc:h2:mem:$db")
    val partition = Instant.parse("2026-03-01T00:00:00Z")

    // replica replayed past the partition end -> ready
    StubDb.replicationReply = (1000L, Timestamp.from(Instant.parse("2026-03-02T00:00:01Z")))
    ReplicationCheck.checkLive(connection, partition, Period.ofDays(1))

    // replica behind -> NotReadyException, reference exit code 20
    StubDb.replicationReply = (3600000L, Timestamp.from(Instant.parse("2026-03-01T23:00:00Z")))
    val notReady = intercept[NotReadyException] {
      ReplicationCheck.checkLive(connection, partition, Period.ofDays(1))
    }
    assert(ExitCodes.forThrowable(notReady) == ExitCodes.NotReady)

    // NULL last_replication (a primary, not a replica) -> the reference's
    // guidance message (PsqlReplicationCheck.java:113-115)
    StubDb.replicationReply = (0L, null)
    val primary = intercept[IllegalStateException] {
      ReplicationCheck.queryLastReplication(connection)
    }
    assert(primary.getMessage.contains("consider using jdbc-avro-job"))

    // empty result set -> same guidance (PsqlReplicationCheck.java:109-111)
    StubDb.register(db, "EMPTY_REPL", StubDb.Table(
      Vector(StubDb.Col("last_replication", Types.TIMESTAMP, nullable = true)), Vector.empty))
    val empty = intercept[IllegalStateException] {
      ReplicationCheck.queryLastReplication(connection, "SELECT * FROM EMPTY_REPL")
    }
    assert(empty.getMessage.contains("empty results"))
  }

  test("wide JDBC type matrix executes through read -> schema gen -> Avro (U1/U2-family rules live)") {
    val db = "graftjdbc_types"
    StubDb.reset(db)
    StubDb.register(db, "WIDE", StubDb.Table(
      Vector(
        StubDb.Col("ID", Types.BIGINT),
        StubDb.Col("SM", Types.SMALLINT),
        StubDb.Col("FL", Types.REAL),
        StubDb.Col("DEC", Types.DECIMAL, nullable = true, precision = 10, scale = 2),
        StubDb.Col("FLAG", Types.BOOLEAN),
        StubDb.Col("D", Types.DATE)),
      Vector(
        Vector[Any](1L, 7, 1.5f, new java.math.BigDecimal("12345.67"), true,
          java.sql.Date.valueOf("2026-02-01")),
        Vector[Any](2L, -3, -0.25f, null, false,
          java.sql.Date.valueOf("1970-01-02")))))

    val source = JdbcSource(conn(db), QueryArgs(base = QueryBuilder.fromTable("WIDE")))
    val df = source.read(spark)
    // Spark's JDBC schema mapping executed for real
    val types = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    // Spark's default JDBC mapping widens SMALLINT to int and REAL to
    // double (JdbcUtils.getCatalystType) — the runtime test pins the
    // ACTUAL product mapping, not the JDBC spec's
    assert(types("ID") == "bigint" && types("SM") == "int" && types("FL") == "double")
    assert(types("DEC") == "decimal(10,2)" && types("FLAG") == "boolean" && types("D") == "date")

    val out = Files.createTempDirectory("jdbc-types").toString
    ExportJob.run(spark, df, out,
      schemaCfg = graft.schema.AvroSchemaGen.Config(tableName = "WIDE"),
      queries = source.queries(spark), minRows = 2)
    val records = readAvro(out).sortBy(_.get("ID").asInstanceOf[Long])
    // type-conversion contract (§1.3): smallint→int, real→float,
    // decimal→STRING, boolean passthrough, date→epoch-millis UTC
    assert(records(0).get("SM") == 7 && records(1).get("SM") == -3)
    assert(records(0).get("FL") == 1.5d)
    assert(records(0).get("DEC").toString == "12345.67" && records(1).get("DEC") == null)
    assert(records(0).get("FLAG") == true && records(1).get("FLAG") == false)
    assert(records(1).get("D") == 86400000L) // 1970-01-02 → one day of millis
    assert(records(0).get("D") ==
      java.time.LocalDate.parse("2026-02-01").toEpochDay * 86400000L)
  }

  // ------------------------------------------------------------------ arrays
  // §1.4's three array modes driven through the REAL `spark.read.jdbc`
  // path against the postgres-scheme stub (Spark's PostgresDialect is the
  // only built-in dialect that maps Types.ARRAY). Reference tests:
  // `avro/PostgresJdbcAvroTest.java:162-245` (modes) and `:281-305`
  // (nullable-item error parity).

  private def pgConn(db: String) = ConnectionArgs(s"jdbc:postgresql:mem:$db", username = "tester")

  /** PG_DOCS: id + a `_text` and a `_int4` array, Postgres-shaped metadata. */
  private def arrayFixture(db: String, rows: Vector[Vector[Any]]): Unit = {
    StubDb.reset(db)
    StubDb.register(db, "PG_DOCS", StubDb.Table(
      Vector(
        StubDb.Col("ID", Types.BIGINT),
        StubDb.Col("TAGS", Types.ARRAY, nullable = true,
          typeNameOv = "_text", itemType = Types.VARCHAR, itemTypeName = "text"),
        StubDb.Col("SCORES", Types.ARRAY, nullable = true,
          typeNameOv = "_int4", itemType = Types.INTEGER, itemTypeName = "int4")),
      rows))
  }

  private def defaultArrayRows: Vector[Vector[Any]] = Vector(
    Vector[Any](1L, Vector[Any]("alpha", "beta"), Vector[Any](10, 20, 30)),
    Vector[Any](2L, Vector[Any]("gamma"), Vector[Any]()),
    Vector[Any](3L, null, Vector[Any](7)))

  private def items(rec: GenericRecord, field: String): Vector[Any] =
    rec.get(field) match {
      case null => null
      case l: java.util.Collection[_] => l.asScala.toVector // GenericData.Array included
    }

  test("typed_postgres arrays: spark.read.jdbc types items from _-prefixed metadata and exports to Avro") {
    val db = "graftpg_typed"
    arrayFixture(db, defaultArrayRows)
    val source = JdbcSource(pgConn(db),
      QueryArgs(base = QueryBuilder.fromTable("PG_DOCS")), arrayMode = ArrayMode.TypedPostgres)
    val df = source.read(spark)
    val types = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(types("TAGS") == "array<string>" && types("SCORES") == "array<int>")

    val out = Files.createTempDirectory("jdbc-arr-typed").toString
    val res = ExportJob.run(spark, df, out,
      schemaCfg = graft.schema.AvroSchemaGen.Config(tableName = "PG_DOCS"),
      queries = source.queries(spark), minRows = 3)
    assert(res.metrics.recordCount == 3)
    val recs = readAvro(out).sortBy(_.get("ID").asInstanceOf[Long])
    assert(items(recs(0), "TAGS").map(_.toString) == Vector("alpha", "beta"))
    assert(items(recs(0), "SCORES") == Vector(10, 20, 30))
    assert(items(recs(1), "SCORES") == Vector.empty) // empty array, not null
    assert(items(recs(2), "TAGS") == null) // null array survives as union null
    assert(items(recs(2), "SCORES") == Vector(7))
    // the metadata probe executed as a real WHERE 1=0 query
    val log = StubDb.log(db).toVector
    assert(log.exists(e => e.startsWith("prepareStatement(") && e.contains("WHERE 1=0")))
  }

  test("typed_postgres rejects item types outside the reference's table (_float8)") {
    val db = "graftpg_float8"
    StubDb.reset(db)
    StubDb.register(db, "PG_DOCS", StubDb.Table(
      Vector(
        StubDb.Col("ID", Types.BIGINT),
        StubDb.Col("WEIGHTS", Types.ARRAY, nullable = true,
          typeNameOv = "_float8", itemType = Types.DOUBLE, itemTypeName = "float8")),
      Vector(Vector[Any](1L, Vector[Any](1.5, 2.5)))))
    val source = JdbcSource(pgConn(db),
      QueryArgs(base = QueryBuilder.fromTable("PG_DOCS")), arrayMode = ArrayMode.TypedPostgres)
    val e = intercept[IllegalArgumentException](source.read(spark))
    assert(e.getMessage.contains("Unsupported postgres array item type"))
  }

  test("typed_first_row throws when the first row's array is NULL (PostgresJdbcAvroTest.java:162-174)") {
    val db = "graftpg_firstnull"
    // row ordering in the stub is insertion order; first row has TAGS = null
    arrayFixture(db, Vector(
      Vector[Any](1L, null, Vector[Any](1)),
      Vector[Any](2L, Vector[Any]("x"), Vector[Any](2))))
    val source = JdbcSource(pgConn(db),
      QueryArgs(base = QueryBuilder.fromTable("PG_DOCS")), arrayMode = ArrayMode.TypedFirstRow)
    val e = intercept[RuntimeException](source.read(spark))
    assert(e.getMessage.contains("null in the first row"))

    // non-null first row: the same mode reads clean
    arrayFixture(db, defaultArrayRows)
    assert(source.read(spark).count() == 3)
  }

  test("typed_first_row exports typed array items end-to-end when the first row is non-null") {
    // the success half of the TypedMetaFromFirstRow contract
    // (PostgresJdbcAvroTest.java:120-160): items typed, full export runs,
    // Avro carries typed arrays — not bytes
    val db = "graftpg_firstrow_ok"
    arrayFixture(db, defaultArrayRows)
    val source = JdbcSource(pgConn(db),
      QueryArgs(base = QueryBuilder.fromTable("PG_DOCS")), arrayMode = ArrayMode.TypedFirstRow)
    val df = source.read(spark)
    val types = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(types("TAGS") == "array<string>" && types("SCORES") == "array<int>")
    val out = Files.createTempDirectory("jdbc-arr-firstrow").toString
    val res = ExportJob.run(spark, df, out,
      schemaCfg = graft.schema.AvroSchemaGen.Config(tableName = "PG_DOCS"),
      queries = source.queries(spark), minRows = 3)
    assert(res.metrics.recordCount == 3)
    val recs = readAvro(out).sortBy(_.get("ID").asInstanceOf[Long])
    assert(items(recs(0), "TAGS").map(_.toString) == Vector("alpha", "beta"))
    assert(items(recs(0), "SCORES") == Vector(10, 20, 30))
    assert(items(recs(2), "TAGS") == null) // null array AFTER the first row is fine
  }

  test("typed_postgres types from metadata alone: all-null arrays in the FIRST row survive (PostgresJdbcAvroTest.java:202-245)") {
    // the reference's shouldHandleArrayWithNullsWithoutReadingFirstRow:
    // TypedMetaPostgres never probes row 1, so a first row whose every
    // array is NULL still types from the _-prefixed metadata — including
    // the int8 → long item rule the default fixture doesn't reach
    val db = "graftpg_nullfirst"
    StubDb.reset(db)
    StubDb.register(db, "PG_DOCS", StubDb.Table(
      Vector(
        StubDb.Col("ID", Types.BIGINT),
        StubDb.Col("NAMES", Types.ARRAY, nullable = true,
          typeNameOv = "_varchar", itemType = Types.VARCHAR, itemTypeName = "varchar"),
        StubDb.Col("COUNTS", Types.ARRAY, nullable = true,
          typeNameOv = "_int4", itemType = Types.INTEGER, itemTypeName = "int4"),
        StubDb.Col("TOTALS", Types.ARRAY, nullable = true,
          typeNameOv = "_int8", itemType = Types.BIGINT, itemTypeName = "int8")),
      Vector(
        Vector[Any](1L, null, null, null),
        Vector[Any](2L, Vector[Any]("some_varchar_42", "42"), Vector[Any](42), Vector[Any](42L)))))
    val source = JdbcSource(pgConn(db),
      QueryArgs(base = QueryBuilder.fromTable("PG_DOCS")), arrayMode = ArrayMode.TypedPostgres)
    val df = source.read(spark)
    val types = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(types("NAMES") == "array<string>" && types("COUNTS") == "array<int>" &&
      types("TOTALS") == "array<bigint>")
    val out = Files.createTempDirectory("jdbc-arr-nullfirst").toString
    ExportJob.run(spark, df, out,
      schemaCfg = graft.schema.AvroSchemaGen.Config(tableName = "PG_DOCS"),
      queries = source.queries(spark), minRows = 2)
    val recs = readAvro(out).sortBy(_.get("ID").asInstanceOf[Long])
    assert(items(recs(0), "NAMES") == null && items(recs(0), "COUNTS") == null &&
      items(recs(0), "TOTALS") == null)
    assert(items(recs(1), "NAMES").map(_.toString) == Vector("some_varchar_42", "42"))
    assert(items(recs(1), "COUNTS") == Vector(42))
    assert(items(recs(1), "TOTALS") == Vector(42L))
  }

  test("bytes array mode reads arrays via getBytes into Avro bytes (PostgresJdbcAvroTest.java:177-198)") {
    val db = "graftpg_bytes"
    arrayFixture(db, defaultArrayRows)
    val source = JdbcSource(pgConn(db),
      QueryArgs(base = QueryBuilder.fromTable("PG_DOCS")), arrayMode = ArrayMode.Bytes)
    val df = source.read(spark)
    val types = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(types("TAGS") == "binary" && types("SCORES") == "binary")

    val out = Files.createTempDirectory("jdbc-arr-bytes").toString
    ExportJob.run(spark, df, out,
      schemaCfg = graft.schema.AvroSchemaGen.Config(tableName = "PG_DOCS"),
      queries = source.queries(spark), minRows = 3)
    val recs = readAvro(out).sortBy(_.get("ID").asInstanceOf[Long])
    def bytesOf(r: GenericRecord, f: String): String = r.get(f) match {
      case null => null
      case bb: java.nio.ByteBuffer =>
        val a = new Array[Byte](bb.remaining()); bb.duplicate().get(a)
        new String(a, java.nio.charset.StandardCharsets.UTF_8)
    }
    assert(bytesOf(recs(0), "TAGS") == "{alpha,beta}")
    assert(bytesOf(recs(0), "SCORES") == "{10,20,30}")
    assert(bytesOf(recs(1), "SCORES") == "{}")
    assert(bytesOf(recs(2), "TAGS") == null)
  }

  test("bytes mode quotes array labels needing escaping (reserved word, space) in customSchema") {
    // ADVICE r12: the customSchema override is assembled as a DDL string —
    // an unquoted reserved word or a label with a space either fails the
    // parse or silently leaves the array column un-overridden. The
    // backtick-quoted form must still override BOTH columns to binary.
    val db = "graftpg_quoted"
    StubDb.reset(db)
    StubDb.register(db, "PG_DOCS", StubDb.Table(
      Vector(
        StubDb.Col("ID", Types.BIGINT),
        StubDb.Col("ORDER", Types.ARRAY, nullable = true, // reserved word
          typeNameOv = "_text", itemType = Types.VARCHAR, itemTypeName = "text"),
        StubDb.Col("TAG LIST", Types.ARRAY, nullable = true, // embedded space
          typeNameOv = "_int4", itemType = Types.INTEGER, itemTypeName = "int4")),
      Vector(Vector[Any](1L, Vector[Any]("a", "b"), Vector[Any](5, 6)))))
    val source = JdbcSource(pgConn(db),
      QueryArgs(base = QueryBuilder.fromTable("PG_DOCS")), arrayMode = ArrayMode.Bytes)
    val df = source.read(spark)
    val types = df.schema.fields.map(f => f.name -> f.dataType.simpleString).toMap
    assert(types("ORDER") == "binary", types.toString)
    assert(types("TAG LIST") == "binary", types.toString)
  }

  test("null array item: targeted error without nullableArrayItems, union item with it (PostgresJdbcAvroTest.java:281-305)") {
    val db = "graftpg_nullitem"
    arrayFixture(db, Vector(
      Vector[Any](1L, Vector[Any]("a", null, "c"), Vector[Any](1, 2))))
    val source = JdbcSource(pgConn(db),
      QueryArgs(base = QueryBuilder.fromTable("PG_DOCS")), arrayMode = ArrayMode.TypedPostgres)
    val df = source.read(spark)

    val out1 = Files.createTempDirectory("jdbc-arr-nullitem1").toString
    val e = intercept[Exception] {
      ExportJob.run(spark, df, out1,
        schemaCfg = graft.schema.AvroSchemaGen.Config(tableName = "PG_DOCS"),
        queries = source.queries(spark), minRows = 1)
    }
    def messages(t: Throwable): List[String] =
      if (t == null) Nil else Option(t.getMessage).toList ++ messages(t.getCause)
    assert(messages(e).exists(_.contains("nullableArrayItems")),
      s"expected the reference's targeted null-item error, got: ${messages(e)}")

    val out2 = Files.createTempDirectory("jdbc-arr-nullitem2").toString
    ExportJob.run(spark, df, out2,
      schemaCfg = graft.schema.AvroSchemaGen.Config(tableName = "PG_DOCS", nullableArrayItems = true),
      queries = source.queries(spark), minRows = 1)
    val recs = readAvro(out2)
    assert(items(recs(0), "TAGS").map(v => if (v == null) null else v.toString) ==
      Vector("a", null, "c"))
  }

  test("PsqlExportCli validateOptions: postgres-only, partition required, no gate skipping (PsqlReplicationCheck.java:56-67)") {
    import graft.jobs.PsqlExportCli.validate
    val ok = Map("connectionUrl" -> "jdbc:postgresql:mem:db", "partition" -> "2026-03-01")
    validate(ok) // no throw
    assert(intercept[IllegalArgumentException](
      validate(ok + ("connectionUrl" -> "jdbc:h2:mem:db")))
      .getMessage.contains("PostgreSQL"))
    assert(intercept[IllegalArgumentException](validate(ok - "partition"))
      .getMessage.contains("Partition parameter"))
    assert(intercept[IllegalArgumentException](
      validate(ok + ("skipReplicationDelayCheck" -> "true")))
      .getMessage.contains("replication pre-flight"))
    // r14 (ADVICE r13): a bare `--partition` flag parses to the "true"
    // sentinel — it must fail HERE with the wrapper's message, not later
    // inside ExportCli with a date-parse error. The two failure shapes get
    // DISTINCT messages: a missing/bare flag says "must be defined"; a
    // present-but-malformed value names the value and says it isn't a date
    // (an operator who DID pass a value shouldn't be told they didn't).
    assert(intercept[IllegalArgumentException](
      validate(ok + ("partition" -> "true")))
      .getMessage.contains("must be defined"))
    val malformed = intercept[IllegalArgumentException](
      validate(ok + ("partition" -> "01/03/2026"))).getMessage
    assert(malformed.contains("01/03/2026") && malformed.contains("not a valid"))
    validate(ok + ("partition" -> "2026-03")) // month form stays valid (U5)
  }

  test("r14: mysql driver-map branch runtime e2e — unsigned INTEGER exports as Avro long (JdbcAvroRecordTest.java:252-272)") {
    val db = "graftjdbc_mysql"
    StubDb.reset(db)
    // values above Int.MaxValue prove the long path end-to-end: the MySQL
    // driver reports unsigned INT as isSigned=false / columnClassName
    // java.lang.Long, and both the Spark read schema and the Avro schema
    // must come out 64-bit wide
    StubDb.register(db, "GAUGES", StubDb.Table(
      Vector(
        StubDb.Col("ID", Types.BIGINT),
        StubDb.Col("HITS_UNSIGNED", Types.INTEGER, unsigned = true),
        StubDb.Col("HITS_SIGNED", Types.INTEGER),
        StubDb.Col("NAME", Types.VARCHAR)),
      (0 until 10).map(i => Vector[Any](
        i.toLong, Int.MaxValue.toLong + 1 + i, 100 + i, s"g_$i")).toVector))
    // jdbc:mysql → com.mysql.cj.jdbc.Driver (the driver map's mysql row,
    // args/ExportArgs driverFor) AND Spark's MySQLDialect (backtick quoting)
    val source = JdbcSource(ConnectionArgs(s"jdbc:mysql:mem:$db", username = "tester"),
      QueryArgs(base = QueryBuilder.fromTable("GAUGES")))
    val df = source.read(spark)
    assert(df.schema("HITS_UNSIGNED").dataType ==
      org.apache.spark.sql.types.LongType, df.schema.treeString)
    assert(df.schema("HITS_SIGNED").dataType ==
      org.apache.spark.sql.types.IntegerType, df.schema.treeString)
    val out = Files.createTempDirectory("jdbc-mysql").toString
    val res = ExportJob.run(spark, df, out,
      schemaCfg = graft.schema.AvroSchemaGen.Config(tableName = "GAUGES"),
      queries = source.queries(spark), minRows = 10)
    assert(res.metrics.recordCount == 10)
    val schemaJson = new String(Files.readAllBytes(
      new File(s"$out/_AVRO_SCHEMA.avsc").toPath))
    assert(schemaJson.contains("HITS_UNSIGNED"))
    val records = readAvro(out)
    assert(records.size == 10)
    val r0 = records.minBy(_.get("ID").asInstanceOf[Long])
    assert(r0.get("HITS_UNSIGNED") == Int.MaxValue.toLong + 1,
      s"unsigned int must survive as long: ${r0.get("HITS_UNSIGNED")}")
    assert(r0.get("HITS_SIGNED") == 100)
  }

  test("r14: mariadb driver-map branch runtime e2e — generic dialect, values round-trip") {
    val db = "graftjdbc_mariadb"
    fixture(db)
    // jdbc:mariadb → org.mariadb.jdbc.Driver (the driver map's last
    // untested URL branch); no dedicated Spark dialect, same as production
    val source = JdbcSource(
      ConnectionArgs(s"jdbc:mariadb:mem:$db", username = "tester"),
      QueryArgs(base = QueryBuilder.fromTable("COFFEES"),
        queryParallelism = Some(2), splitColumn = Some("ID")))
    val df = source.read(spark)
    assert(df.rdd.getNumPartitions == 2)
    val out = Files.createTempDirectory("jdbc-mariadb").toString
    val res = ExportJob.run(spark, df, out,
      schemaCfg = graft.schema.AvroSchemaGen.Config(tableName = "COFFEES"),
      queries = source.queries(spark), minRows = 100)
    assert(res.metrics.recordCount == 100)
    val records = readAvro(out)
    assert(records.map(_.get("ID").asInstanceOf[Long]).toSet == (0L until 100L).toSet)
  }

  test("minRows gate fires on the JDBC path (exit 50)") {
    val db = "graftjdbc_minrows"
    fixture(db)
    val source = JdbcSource(conn(db), QueryArgs(base = QueryBuilder.fromTable("COFFEES")))
    val out = Files.createTempDirectory("jdbc-minrows").toString
    val e = intercept[FailedValidationException] {
      ExportJob.run(spark, source.read(spark), out,
        queries = source.queries(spark), minRows = 101)
    }
    assert(ExitCodes.forThrowable(e) == ExitCodes.FailedValidation)
  }
}

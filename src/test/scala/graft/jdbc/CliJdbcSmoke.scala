package graft.jdbc

import java.sql.{Timestamp, Types}
import java.time.Instant

/** Smoke main (Test/runMain graft.jdbc.CliJdbcSmoke): drives the REAL
  * `ExportCli.main` against the stub `org.h2.Driver`, proving the CLI's
  * `--connectionUrl` branch end-to-end (arg parsing → JdbcSource → split
  * predicates → Avro layout). Separate from JdbcRuntimeSpec because
  * ExportCli.main owns its SparkSession lifecycle (stop() at the end),
  * which must not tear down the suite-shared session.
  */
object CliJdbcSmoke {
  def main(args: Array[String]): Unit = {
    val db = "clismoke"
    StubDb.register(db, "COFFEES", StubDb.Table(
      Vector(StubDb.Col("ID", Types.BIGINT), StubDb.Col("COF_NAME", Types.VARCHAR),
        StubDb.Col("CREATED", Types.TIMESTAMP)),
      (0 until 50).map(i => Vector[Any](i.toLong, s"c$i",
        Timestamp.from(Instant.parse("2026-02-01T00:00:00Z").plusSeconds(i)))).toVector))
    val out = java.nio.file.Files.createTempDirectory("cli-jdbc-smoke").toString
    graft.jobs.ExportCli.main(Array(
      s"--connectionUrl=jdbc:h2:mem:$db",
      "--table=COFFEES",
      s"--output=$out",
      "--username=tester",
      "--splitColumn=ID",
      "--queryParallelism=3",
      "--avroCodec=deflate1",
      "--minRows=50",
      "--skipPartitionCheck"))
    val names = new java.io.File(out).listFiles().map(_.getName).toSet
    require(names.contains("_AVRO_SCHEMA.avsc") && names.contains("_METRICS.json")
      && names.contains("_queries"), s"layout incomplete: $names")
    val nQueries = new java.io.File(s"$out/_queries").listFiles().length
    require(nQueries == 3, s"expected 3 query files, got $nQueries")
    println(s"CLI_JDBC_SMOKE_OK layout=$names queries=$nQueries")
  }
}

/** Smoke main for the dedicated PostgreSQL wrapper
  * (Test/runMain graft.jdbc.PsqlCliSmoke): drives `PsqlExportCli.main`
  * against the stub `org.postgresql.Driver` with a READY replica — the
  * replication pre-flight executes live (the stub serves the
  * `pg_last_xact_replay_timestamp` query) and the partition-filtered
  * export lands the full layout.
  */
object PsqlCliSmoke {
  def main(args: Array[String]): Unit = {
    val db = "psqlclismoke"
    StubDb.reset(db)
    StubDb.register(db, "EVENTS", StubDb.Table(
      Vector(StubDb.Col("ID", Types.BIGINT), StubDb.Col("NAME", Types.VARCHAR),
        StubDb.Col("CREATED", Types.TIMESTAMP)),
      (0 until 40).map(i => Vector[Any](i.toLong, s"e$i",
        Timestamp.from(Instant.parse("2026-03-01T00:00:00Z").plusSeconds(i * 600L)))).toVector))
    // replica caught up past the partition window's end
    StubDb.replicationReply =
      (1000L, Timestamp.from(Instant.parse("2026-03-02T00:00:01Z")))
    val out = java.nio.file.Files.createTempDirectory("psql-cli-smoke").toString
    graft.jobs.PsqlExportCli.main(Array(
      s"--connectionUrl=jdbc:postgresql:mem:$db",
      "--table=EVENTS",
      s"--output=$out",
      "--username=tester",
      "--partitionColumn=CREATED",
      "--partition=2026-03-01",
      "--skipPartitionCheck",
      "--avroCodec=deflate1",
      "--minRows=40"))
    val names = new java.io.File(out).listFiles().map(_.getName).toSet
    require(names.contains("_AVRO_SCHEMA.avsc") && names.contains("_METRICS.json"),
      s"layout incomplete: $names")
    // the pre-flight actually ran: the stub's protocol log carries the query
    require(StubDb.log(db).toVector.exists(_.contains("pg_last_xact_replay_timestamp")),
      "replication pre-flight did not execute")
    println(s"PSQL_CLI_SMOKE_OK layout=$names")
  }
}

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

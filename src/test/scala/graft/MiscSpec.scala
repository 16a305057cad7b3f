package graft

import java.nio.file.Files
import java.time.{Duration, Instant, Period}

import org.scalatest.funsuite.AnyFunSuite

import graft.args.{JobName, PasswordReader, SplitColumn}
import graft.jobs.{NotReadyException, ReplicationCheck}

class MiscSpec extends AnyFunSuite {

  test("job name normalization (U4)") {
    assert(JobName.jobName("My_DB", "Some.Table") == "dbeam-mydb-sometable")
    assert(JobName.jobName("db", "t", Some("16 hex")) == "dbeam-db-t-16hex")
  }

  test("split column typing rule (X2)") {
    val spark = SparkSpec.spark
    val li = spark.read.parquet(s"${SparkSpec.testDataDir}/lineitem.parquet")
    SplitColumn.validate(li, "l_orderkey") // bigint ok
    SplitColumn.validate(li, "l_linenumber") // int ok
    assertThrows[IllegalArgumentException](SplitColumn.validate(li, "l_quantity")) // double
    assertThrows[IllegalArgumentException](SplitColumn.validate(li, "l_returnflag")) // string
    assertThrows[IllegalArgumentException](SplitColumn.validate(li, "nope"))
  }

  test("password sources (U9)") {
    assert(PasswordReader.read(Some("pw"), None).contains("pw"))
    val f = Files.createTempFile("pw", ".txt")
    Files.writeString(f, "secret\n")
    assert(PasswordReader.read(Some("inline"), Some(f.toString)).contains("secret"))
    assert(PasswordReader.read(None, None).isEmpty)
    assertThrows[IllegalStateException](
      PasswordReader.read(None, None, Some(f.toString), None))
    val rot13 = new PasswordReader.Decrypter {
      def decrypt(c: Array[Byte]): String = new String(c).trim.reverse
    }
    assert(PasswordReader.read(None, None, Some(f.toString), Some(rot13)).contains("terces"))
  }

  test("KMS decrypter: envelope round-trip, key naming, whitespace tolerance (U9)") {
    import graft.args.KmsDecrypter
    val backend = new KmsDecrypter.LocalAesKms("master-key-material".getBytes("UTF-8"))
    val d = KmsDecrypter(backend, location = "global", keyring = "dbeam",
      key = "default", project = Some("proj1"))
    // reference key naming (`KmsDecrypter.java:126-131`)
    assert(d.keyName == "projects/proj1/locations/global/keyRings/dbeam/cryptoKeys/default")

    val cipherB64 = backend.encrypt(d.keyName, "s3cr3t-pw\n")
    // the encrypted password FILE path: whitespace in the base64 is stripped
    // (`CharMatcher.whitespace().removeFrom`), result is trimmed
    val f = Files.createTempFile("pw-kms", ".enc")
    Files.writeString(f, cipherB64.grouped(16).mkString("\n") + "\n")
    assert(PasswordReader.read(None, None, Some(f.toString), Some(d)).contains("s3cr3t-pw"))

    // a different key name must fail authentication, not return garbage
    val wrongKey = d.copy(key = "other")
    assertThrows[Exception](wrongKey.decrypt(cipherB64))
    // no project → the reference would fall back to gcloud detection; offline
    // that is an explicit failure
    assertThrows[IllegalStateException](d.copy(project = None).keyName)
  }

  test("replication check decision table (PsqlReplicationCheck truth table)") {
    val partition = Instant.parse("2027-07-31T00:00:00Z")
    val daily = Period.ofDays(1)
    // replica replayed past the window end -> ready
    ReplicationCheck.check(partition, Instant.parse("2027-08-01T00:00:01Z"), daily)
    // replayed exactly to window end -> ready (not before)
    ReplicationCheck.check(partition, Instant.parse("2027-08-01T00:00:00Z"), daily)
    // still inside the window -> not ready
    assertThrows[NotReadyException](
      ReplicationCheck.check(partition, Instant.parse("2027-07-31T23:59:59Z"), daily))
    assert(ReplicationCheck.isReplicationDelayed(
      partition, Instant.parse("2027-07-31T12:00:00Z"), Duration.ofHours(1)) == false)
    assert(ReplicationCheck.ReplicationQuery.contains("pg_last_xact_replay_timestamp"))
  }

  test("jdbc url -> driver mapping (S7)") {
    import graft.args.ConnectionArgs
    assert(ConnectionArgs.driverFor("jdbc:postgresql://host/db") == "org.postgresql.Driver")
    assert(ConnectionArgs.driverFor("jdbc:mysql://host/db") == "com.mysql.cj.jdbc.Driver")
    assert(ConnectionArgs.driverFor("jdbc:mariadb://h/d") == "org.mariadb.jdbc.Driver")
    assert(ConnectionArgs.driverFor("jdbc:h2:mem:test") == "org.h2.Driver")
    assertThrows[IllegalArgumentException](ConnectionArgs.driverFor("jdbc:oracle:thin:@h"))
    assertThrows[IllegalArgumentException](ConnectionArgs.driverFor("http://nope"))
  }

  test("jdbc source generates dbeam range predicates (X1 on the Spark seam)") {
    import graft.args.{ConnectionArgs, QueryArgs}
    import graft.sources.JdbcSource
    import graft.sql.QueryBuilder
    val src = JdbcSource(
      ConnectionArgs("jdbc:postgresql://h/db"),
      QueryArgs(QueryBuilder.fromTable("tab"), splitColumn = Some("sp"), queryParallelism = Some(3)))
    val preds = src.predicates(_ => (100L, 400L))
    assert(preds.toSeq == Seq(
      "sp >= 100 AND sp < 200", "sp >= 200 AND sp < 300", "sp >= 300 AND sp <= 400"))
  }

  test("sql file reader (S6)") {
    val f = Files.createTempFile("query", ".sql")
    Files.writeString(f, "SELECT * FROM COFFEES WHERE SIZE > 10")
    val conf = new org.apache.hadoop.conf.Configuration()
    assert(graft.jobs.ExportJob.readSqlFile(conf, f.toString) ==
      "SELECT * FROM COFFEES WHERE SIZE > 10")
  }
}

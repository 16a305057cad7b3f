package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.args.QueryArgs
import graft.sources.FileSource
import graft.sql.QueryBuilder

class FileSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private def qa = QueryArgs(base = QueryBuilder.fromTable("events"))

  test("r9: format detection by extension and explicit override") {
    assert(FileSource.detectFormat("/a/b/events.parquet", None) == "parquet")
    assert(FileSource.detectFormat("/a/b/events.csv", None) == "csv")
    assert(FileSource.detectFormat("/a/b/events.jsonl", None) == "json")
    assert(FileSource.detectFormat("/a/b/out.avro", None) == "avro")
    assert(FileSource.detectFormat("/a/b/whatever", None) == "parquet")
    assert(FileSource.detectFormat("/a/b/events.csv", Some("json")) == "json")
  }

  test("r9: CSV and JSON inputs round-trip the events table through the export") {
    val dir = SparkSpec.testDataDir
    val pq = spark.read.parquet(s"$dir/events.parquet")
      .selectExpr("event_id", "CAST(ts AS STRING) AS ts", "user_id", "event_type", "value")
    val tmp = java.nio.file.Files.createTempDirectory("filesrc").toString
    pq.coalesce(1).write.option("header", "true").mode("overwrite").csv(s"$tmp/events.csv")
    pq.coalesce(1).write.mode("overwrite").json(s"$tmp/events.json")
    val exact = pq.collect().map(r => r.getLong(0) -> r.getString(3)).toMap
    for (fmt <- Seq("csv", "json")) {
      val df = FileSource(s"$tmp/events.$fmt", fmt, "events", qa).read(spark)
      assert(df.count() == exact.size.toLong, s"$fmt row count")
      val got = df.selectExpr("CAST(event_id AS BIGINT)", "event_type").collect()
        .map(r => r.getLong(0) -> r.getString(1)).toMap
      assert(got == exact, s"$fmt values")
      // and the standard export contract runs over it unchanged
      val out = java.nio.file.Files.createTempDirectory(s"filesrc-out-$fmt").toString
      val res = graft.jobs.ExportJob.run(spark, df, out,
        sinkArgs = graft.args.AvroSinkArgs(codec = "deflate1"))
      assert(res.metrics.recordCount == exact.size.toLong, s"$fmt export count")
    }
  }

  test("r9: avro format reads the sink's own output back") {
    val dir = SparkSpec.testDataDir
    val df = spark.read.parquet(s"$dir/events.parquet")
    val out = java.nio.file.Files.createTempDirectory("filesrc-avro").toString
    graft.jobs.ExportJob.run(spark, df, out,
      sinkArgs = graft.args.AvroSinkArgs(codec = "deflate1"))
    val back = FileSource(out, "avro", "events", qa).read(spark)
    assert(back.count() == df.count())
  }

  test("r9: limit and unknown format behave per contract") {
    val dir = SparkSpec.testDataDir
    val limited = FileSource(s"$dir/events.parquet", "parquet", "events",
      qa.copy(limit = Some(7L))).read(spark)
    assert(limited.count() == 7L)
    intercept[IllegalArgumentException] {
      FileSource("/x", "orc", "t", qa).read(spark)
    }
  }
}

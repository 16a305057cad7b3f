package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.SparkSession

import graft.schema.AvroSchemaGen
import graft.sink.AvroSink

/** Serial `export_avro` drift adjudication (VERDICT r15 #1): the headline
  * ms/M series moved 2036 → 2448 (local) across two rounds — inside the
  * 1.3× noise floor but drifting. This replays EXACTLY the bench's serial
  * export protocol (same session config, table warm, best-of-2 into fresh
  * dirs, deflate1, parallelism 1) REPEATEDLY in one exclusive session, so
  * the settled number and its spread are visible without an 11-minute
  * full-bench run per sample. Same cold-JVM scale as the bench's export
  * row (the export runs first in both).
  *
  * Usage: `runMain graft.tools.ExportDriftProbe [sfDir] [reps]`
  */
object ExportDriftProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val reps = args.drop(1).headOption.map(_.toInt).getOrElse(5)
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("export-drift-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def loadavg: String =
      try scala.io.Source.fromFile("/proc/loadavg").mkString.trim.split(" ").take(1).mkString
      catch { case _: Throwable => "n/a" }

    val df = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val rows = df.count() // table warm, as in Bench
    val schema = AvroSchemaGen.generate(df.schema, AvroSchemaGen.Config(tableName = "lineitem"))

    val best2 = (1 to reps).map { r =>
      var best = Double.MaxValue
      for (_ <- 0 until 2) {
        val out = Files.createTempDirectory(s"drift-export-$r").toString
        val t0 = System.nanoTime()
        AvroSink.write(df, schema, out, "deflate1")
        val t = (System.nanoTime() - t0) / 1e9
        if (t < best) best = t
        new scala.reflect.io.Directory(new java.io.File(out)).deleteRecursively()
      }
      val msPerM = best * 1000 / (rows / 1e6)
      println(f"[drift-probe] rep=$r best2=$best%6.3f s msPerM=$msPerM%7.1f loadavg=$loadavg")
      msPerM
    }
    val sorted = best2.sorted
    println(f"[drift-probe] rows=$rows reps=$reps median=${sorted(sorted.size / 2)}%7.1f " +
      f"min=${sorted.head}%7.1f max=${sorted.last}%7.1f ms/M (r14 series: 2036, r15: 2448, baseline: 3136)")
    spark.stop()
  }
}

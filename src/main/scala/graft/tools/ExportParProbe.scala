package graft.tools

import org.apache.spark.sql.SparkSession

import graft.schema.AvroSchemaGen
import graft.sink.AvroSink

/** Re-measures the bench-export parallelism decision: straight-through
  * (1 partition on the single-row-group fixture parquet) vs round-robin
  * repartition at several widths, deflate1 and zstandard1, best-of-2 per
  * cell with fresh output dirs. The round-7 note said the shuffle +
  * writer contention beat the serial encode on this disk; this probe
  * keeps that claim current.
  *
  * Usage: `runMain graft.tools.ExportParProbe [sfDir]`.
  * Numbers land in DESIGN.md; this is a harness tool, not a catalog query.
  */
object ExportParProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("export-par-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val df0 = spark.read.parquet(s"$sfDir/lineitem.parquet")
    val schema = AvroSchemaGen.generate(df0.schema,
      AvroSchemaGen.Config(tableName = "lineitem"))
    df0.count() // warm page cache + codegen

    def cell(label: String, parts: Int, codec: String): Unit = {
      val df = if (parts <= 0) df0 else df0.repartition(parts)
      var best = Double.MaxValue
      for (_ <- 0 until 2) {
        val out = java.nio.file.Files.createTempDirectory("export-par").toString
        val t0 = System.nanoTime()
        AvroSink.write(df, schema, out, codec)
        val t = (System.nanoTime() - t0) / 1e9
        if (t < best) best = t
        new scala.reflect.io.Directory(new java.io.File(out)).deleteRecursively()
      }
      println(f"$label%-26s $best%.2f s")
    }
    for (codec <- Seq("deflate1", "zstandard1")) {
      cell(s"$codec straight", 0, codec)
      for (p <- Seq(4, 8, 16, 32)) cell(s"$codec repartition($p)", p, codec)
    }
    spark.stop()
  }
}

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

    // ---- ×8 scale section (r14, VERDICT r13 #6) ------------------------
    // The bench export is 600k rows; replicate lineitem 8× (4.8M rows,
    // keys offset so rows are distinct) and pin: (a) serial
    // msPerMillionRows stays ~flat vs the 1× run — the encoder is a
    // streaming per-row loop with no superlinear term; (b) the 100k-row
    // metering cadence costs ~nothing vs metering every row (A2 overhead
    // claim, measured not asserted); (c) the 32p parallel speedup curve
    // at a row count where parallelism has real work to amortize.
    val big = {
      val copies = spark.range(8).select(org.apache.spark.sql.functions.col("id").as("copy"))
      spark.read.parquet(s"$sfDir/lineitem.parquet").crossJoin(copies)
        .withColumn("l_orderkey",
          org.apache.spark.sql.functions.col("l_orderkey") +
            org.apache.spark.sql.functions.col("copy") * 100000000L)
        .drop("copy").cache()
    }
    val bigN = big.count()
    val oneN = df0.count()
    def msPerM(rows: Long, sec: Double): Double = sec * 1000.0 / (rows / 1e6)
    def cellN(label: String, df: org.apache.spark.sql.DataFrame, rows: Long,
        parts: Int, meterEvery: Long = 100000L): Double = {
      val d = if (parts <= 0) df else df.repartition(parts)
      var best = Double.MaxValue
      for (_ <- 0 until 2) {
        val out = java.nio.file.Files.createTempDirectory("export-par-x8").toString
        val t0 = System.nanoTime()
        AvroSink.write(d, schema, out, "deflate1", meterEveryRows = meterEvery)
        val t = (System.nanoTime() - t0) / 1e9
        if (t < best) best = t
        new scala.reflect.io.Directory(new java.io.File(out)).deleteRecursively()
      }
      println(f"$label%-34s $best%6.2f s  ${msPerM(rows, best)}%8.1f ms/M")
      best
    }
    println(s"[x8] rows: 1x=$oneN 8x=$bigN")
    val t1 = cellN("x1 serial (cadence 100k)", df0, oneN, 0)
    val t8 = cellN("x8 serial (cadence 100k)", big, bigN, 0)
    cellN("x8 serial (cadence 1 row)", big, bigN, 0, meterEvery = 1L)
    for (p <- Seq(8, 16, 32)) cellN(s"x8 repartition($p)", big, bigN, p)
    println(f"[x8] serial ms/M ratio x8/x1 = ${msPerM(bigN, t8) / msPerM(oneN, t1)}%.3f (flat ≈ 1.0)")
    spark.stop()
  }
}

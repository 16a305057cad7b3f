package graft.jobs


import graft.schema.AvroSchemaGen
import graft.sink.AvroSink

/** Benchmark job with the reference's shape
  * (`jobs/BenchJdbcAvroJob.java:61-129`): run the export `--executions=N`
  * times into `<output>/run_<i>`, then print a per-run table of
  * `recordCount | writeElapsedMs | msPerMillionRows | bytesWritten |
  * KbWritePerSec` followed by max / mean / min / population-stddev rows.
  *
  * Usage: `runMain graft.jobs.BenchJob --input=... --output=... [--executions=3] [--avroCodec=deflate1]`
  */
object BenchJob {

  private val Columns = Seq(
    "recordCount", "writeElapsedMs", "msPerMillionRows", "bytesWritten", "KbWritePerSec")

  def main(args: Array[String]): Unit = {
    val opts = args.filter(_.startsWith("--")).map { a =>
      a.stripPrefix("--").split("=", 2) match {
        case Array(k, v) => k -> v
        case Array(k) => k -> "true"
      }
    }.toMap
    val input = opts("input")
    val output = opts("output")
    val executions = opts.getOrElse("executions", "3").toInt
    val codec = opts.getOrElse("avroCodec", "deflate1")

    // shared engine session config (r18, VERDICT r17 #3)
    val spark = graft.SessionFactory
      .builder(sys.env.getOrElse("SPARK_MASTER", "local[32]"),
        "graft-bench-job", "32")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val runs = (0 until executions).map { i =>
      val df = spark.read.parquet(input)
      val t0 = System.currentTimeMillis()
      val schema = AvroSchemaGen.generate(df.schema, AvroSchemaGen.Config(tableName = "bench"))
      val m = AvroSink.write(df, schema, s"$output/run_$i", codec, System.currentTimeMillis() - t0)
      m.toMap
    }

    println(Columns.mkString("run\t", "\t", ""))
    runs.zipWithIndex.foreach { case (m, i) =>
      println(Columns.map(m(_)).mkString(s"$i\t", "\t", ""))
    }
    def stats(vals: Seq[Double]): (Double, Double, Double, Double) = {
      val mean = vals.sum / vals.size
      val variance = vals.map(v => (v - mean) * (v - mean)).sum / vals.size
      (vals.max, mean, vals.min, math.sqrt(variance))
    }
    Seq("max", "mean", "min", "stddev").zipWithIndex.foreach { case (label, idx) =>
      val row = Columns.map { c =>
        val s = stats(runs.map(_(c).toDouble))
        val v = idx match { case 0 => s._1; case 1 => s._2; case 2 => s._3; case _ => s._4 }
        // locale-pinned like Bench's JSON line (the `f` interpolator uses
        // the JVM default locale; a comma-decimal locale breaks the TSV)
        String.format(java.util.Locale.ROOT, "%.1f", Double.box(v))
      }
      println(row.mkString(s"$label\t", "\t", ""))
    }
    spark.stop()
  }
}

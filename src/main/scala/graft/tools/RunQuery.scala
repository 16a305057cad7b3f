package graft.tools

import org.apache.spark.sql.SparkSession

/** Executes named catalog queries against a testdata dir and prints their
  * results (bounded) — the local loop for checking a gate row at a scale
  * factor before the driver's Verify pass does.
  *
  * Usage: runMain graft.tools.RunQuery [dir] name [name ...]
  */
object RunQuery {
  def main(args: Array[String]): Unit = {
    val (dir, names) =
      if (args.headOption.exists(_.startsWith("/"))) (args.head, args.drop(1).toSeq)
      else ("/root/testdata/sf0.01", args.toSeq)
    require(names.nonEmpty, "pass at least one catalog query name")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n########## $n @ $dir ##########")
      val t0 = System.nanoTime()
      val df = graft.SparkEntry.queries(n)(spark, dir)
      df.show(50, truncate = false)
      println(f"rows=${df.count()} wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}

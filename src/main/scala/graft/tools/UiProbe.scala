package graft.tools

import org.apache.spark.sql.SparkSession

/** Runs one catalog query with the Spark UI ON, then sleeps so the SQL tab
  * REST API can be scraped (r17 opt measurement). Ctrl-C / kill when done.
  *
  * Usage: runMain graft.tools.UiProbe <name> [sfDir] [sleepSec]
  */
object UiProbe {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val sleepSec = if (args.length > 2) args(2).toInt else 300
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // match graft.Bench (r17): AQE may re-partition cached-plan reads
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val fn = graft.SparkEntry.queries(name)
    fn(spark, "/root/testdata/sf0.001").count() // warm codegen
    val t0 = System.nanoTime()
    fn(spark, dir).count()
    println(f"UIPROBE $name wall=${(System.nanoTime() - t0) / 1e9}%.3f s — UI at :4040, sleeping $sleepSec s")
    Thread.sleep(sleepSec * 1000L)
    spark.stop()
  }
}

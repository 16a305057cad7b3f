package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Debug harness: runs one catalog query with a job listener and prints
  * per-Spark-job wall times — shows whether an operator's cost is data or
  * stage-scheduling. Usage: runMain graft.tools.StageProbe <query> [sfDir]
  */
object StageProbe {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("dedup_minhash")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val starts = scala.collection.concurrent.TrieMap[Int, Long]()
    val durations = scala.collection.mutable.ArrayBuffer[(Int, Long)]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        starts(js.jobId) = System.currentTimeMillis()
      override def onJobEnd(je: SparkListenerJobEnd): Unit =
        starts.remove(je.jobId).foreach(t0 =>
          durations.synchronized { durations += je.jobId -> (System.currentTimeMillis() - t0) })
    })
    // warm
    graft.SparkEntry.queries(name)(spark, "/root/testdata/sf0.001").count()
    Thread.sleep(500)
    durations.synchronized(durations.clear())
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, sfDir).count()
    val total = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    val ds = durations.synchronized(durations.toVector)
    println(f"PROBE $name total ${total}%.3f s, ${ds.size} jobs, job-sum ${ds.map(_._2).sum / 1000.0}%.3f s")
    ds.sortBy(-_._2).take(12).foreach { case (id, ms) => println(s"PROBE   job $id: ${ms} ms") }
    spark.stop()
  }
}

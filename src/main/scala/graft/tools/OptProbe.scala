package graft.tools

import java.nio.file.{Files, Paths}
import java.util.concurrent.atomic.{AtomicInteger, AtomicLong}

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.execution.FormattedMode

/** r17 optimization probe — per-query wall time under the BENCH config
  * (local[32], shuffle=32, AQE, warm pass at sf0.001, best-of-2 count())
  * PLUS the listener-side facts the Spark UI would show: job/stage/task
  * counts, summed task time, shuffle read/write bytes, GC time, spill.
  * Optionally dumps each query's formatted plan to plans/r17/.
  *
  * Usage: runMain graft.tools.OptProbe [--plans=<dir>] [--sf=<sfDir>] name...
  *        (no names = the full catalog, sorted)
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val planDir = args.collectFirst { case a if a.startsWith("--plans=") => a.drop(8) }
    val sfDir = args.collectFirst { case a if a.startsWith("--sf=") => a.drop(5) }
      .getOrElse("/root/testdata/sf0.1")
    val names0 = args.filterNot(_.startsWith("--")).toSeq
    val names = if (names0.nonEmpty) names0 else graft.SparkEntry.queries.keySet.toSeq.sorted
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // shared engine config; the cache-AQE flag stays env-overridable for
    // A/B (a later .config overrides the factory's default)
    val spark = graft.SessionFactory.builder(s"local[$cpus]", "graft-optprobe", cpus)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning",
        sys.env.getOrElse("SPARK_GRAFT_CACHE_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // Listener totals (reset per timed query)
    val jobs = new AtomicInteger
    val stages = new AtomicInteger
    val tasks = new AtomicInteger
    val taskMs = new AtomicLong
    val gcMs = new AtomicLong
    val shufR = new AtomicLong
    val shufW = new AtomicLong
    val spill = new AtomicLong
    val input = new AtomicLong
    val stageLog = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val verbose = args.contains("--stages")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        stages.incrementAndGet()
        if (verbose) {
          val i = s.stageInfo
          val ms = i.taskMetrics
          val wall = (for (a <- i.completionTime; b <- i.submissionTime) yield a - b).getOrElse(-1L)
          stageLog.add(f"  stage ${i.stageId}%4d tasks=${i.numTasks}%4d wall=${wall}%6dms " +
            f"taskTime=${ms.executorRunTime}%7dms shufR=${ms.shuffleReadMetrics.totalBytesRead / 1000}%8dK " +
            f"shufW=${ms.shuffleWriteMetrics.bytesWritten / 1000}%8dK  ${i.name.take(90)}")
        }
      }
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = {
        tasks.incrementAndGet()
        val m = t.taskMetrics
        if (m != null) {
          taskMs.addAndGet(m.executorRunTime)
          gcMs.addAndGet(m.jvmGCTime)
          shufR.addAndGet(m.shuffleReadMetrics.totalBytesRead)
          shufW.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          spill.addAndGet(m.diskBytesSpilled + m.memoryBytesSpilled)
          input.addAndGet(m.inputMetrics.bytesRead)
        }
      }
    })
    def reset(): Unit = {
      Seq(taskMs, gcMs, shufR, shufW, spill, input).foreach(_.set(0L))
      jobs.set(0); stages.set(0); tasks.set(0)
    }

    // warm tables + query shapes like Bench does
    Seq("lineitem", "documents", "embeddings", "events")
      .foreach(t => spark.read.parquet(s"$sfDir/$t.parquet").count())
    val warmDir = "/root/testdata/sf0.001"
    names.foreach { n =>
      try graft.SparkEntry.queries(n)(spark, warmDir).count()
      catch { case scala.util.control.NonFatal(_) => () }
    }

    planDir.foreach(d => new java.io.File(d).mkdirs())
    // wall_s = min of the two runs (the bench estimator); w2_s = run 2's
    // wall, the run ALL listener counters describe (ADVICE r17: min(w1,w2)
    // next to run-2 counters silently mixed two runs when run 1 was faster)
    println(f"${"query"}%-36s ${"wall_s"}%8s ${"w2_s"}%8s ${"jobs"}%5s ${"stg"}%5s ${"tasks"}%6s ${"taskS"}%8s ${"gcS"}%6s ${"shufMB"}%8s ${"inMB"}%7s ${"spillMB"}%8s")
    names.foreach { n =>
      val fn = graft.SparkEntry.queries(n)
      def once(): Double = {
        val t0 = System.nanoTime()
        fn(spark, sfDir).count()
        (System.nanoTime() - t0) / 1e9
      }
      val w1 = once() // run 1
      reset()
      stageLog.clear()
      val w2 = once() // instrumented run 2 (counters reflect this run)
      val wall = math.min(w1, w2)
      println(f"$n%-36s $wall%8.3f $w2%8.3f ${jobs.get}%5d ${stages.get}%5d ${tasks.get}%6d ${taskMs.get / 1e3}%8.2f ${gcMs.get / 1e3}%6.2f ${(shufR.get + shufW.get) / 1e6}%8.1f ${input.get / 1e6}%7.1f ${spill.get / 1e6}%8.1f")
      if (verbose) { Thread.sleep(300); stageLog.forEach(l => println(l)) }
      planDir.foreach { d =>
        val plan = fn(spark, sfDir).queryExecution.explainString(FormattedMode)
        Files.writeString(Paths.get(s"$d/$n.txt"), plan)
      }
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling evidence for the de-hinted TPC-H join family (r13): replicate
  * ALL trade tables k× with consistent key offsets (fact AND dims grow
  * k× together — the regime the broadcast hints were wrong for), run the
  * multi-join catalog rows at 1× and k×, and report wall + shuffle-bytes
  * exponents `log(ratio)/log(k)`. Exponent ≈ 1 is the structural
  * expectation: every join is an equi-join whose both sides scale
  * linearly, and AQE re-picks broadcast-vs-shuffle from the runtime
  * sizes at each scale instead of a hint frozen at authoring time.
  *
  * Usage: `runMain graft.tools.TpchScaleProbe [sfDir] [bigFactor]`.
  * Numbers land in DESIGN.md; harness tool, not a catalog query.
  */
object TpchScaleProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val bigK = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[32]")
      .appName("tpch-scale-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    def settle(): Unit = {
      var prev = -1L
      while (prev != shuffleBytes.get()) { prev = shuffleBytes.get(); Thread.sleep(200) }
    }
    def measured[A](body: => A): (Double, Long) = {
      settle()
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      body
      val wall = (System.nanoTime() - t0) / 1e9
      settle()
      (wall, shuffleBytes.get())
    }

    /** k disjoint key-offset copies of every trade table, keys offset
      * CONSISTENTLY across tables so each copy keeps referential
      * integrity (copy i's lineitem joins copy i's orders/part/supplier).
      */
    def replicate(k: Int): String = {
      val out = java.nio.file.Files.createTempDirectory(s"tpch-probe-x$k").toString
      val copies = spark.range(k).select(col("id").as("copy"))
      def rep(table: String, keySteps: (String, Long)*): Unit = {
        var df = spark.read.parquet(s"$dir/$table.parquet").crossJoin(copies)
        keySteps.foreach { case (c, step) =>
          df = df.withColumn(c, col(c) + col("copy") * step)
        }
        df.drop("copy").write.mode("overwrite").parquet(s"$out/$table.parquet")
      }
      rep("lineitem", "l_orderkey" -> 100000000L, "l_partkey" -> 1000000L,
        "l_suppkey" -> 1000000L)
      rep("orders", "o_orderkey" -> 100000000L, "o_custkey" -> 1000000L)
      rep("customer", "c_custkey" -> 1000000L)
      rep("supplier", "s_suppkey" -> 1000000L)
      rep("part", "p_partkey" -> 1000000L)
      rep("nation")
      rep("region")
      out
    }

    val d1 = replicate(1)
    val dk = replicate(bigK)
    val probes = Seq("q3_join_agg", "q5_multi_join", "q7_nation_volume",
      "q8_market_share", "q9_profit_by_nation", "q2_min_cost_supplier",
      "q18_large_orders", "q21_waiting_supplier")
    println(f"${"probe"}%-22s ${"wall1"}%8s ${"wallK"}%8s ${"expW"}%6s ${"shuf1MB"}%8s ${"shufKMB"}%8s ${"expS"}%6s")
    probes.foreach { name =>
      val run = (d: String) => graft.SparkEntry.queries(name)(spark, d).count()
      run(d1) // warm the shape once
      val (w1, s1) = measured(run(d1))
      val (wk, sk) = measured(run(dk))
      val expW = math.log(wk / w1) / math.log(bigK.toDouble)
      val expS = math.log(sk.toDouble / s1.toDouble) / math.log(bigK.toDouble)
      println(f"$name%-22s $w1%8.2f $wk%8.2f $expW%6.2f ${s1 / 1e6}%8.1f ${sk / 1e6}%8.1f $expS%6.2f")
    }
    spark.stop()
  }
}

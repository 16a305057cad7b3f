package graft.tools

import org.apache.spark.sql.SparkSession

/** Interleaved A/B row probe (VERDICT r16 #1): times an env-selected set
  * of catalog rows under EXACTLY the bench estimator (sf0.001 warm pass,
  * then best-of-2 `count()` at the target SF, local[32], shuffle=32, AQE
  * on), plus a self-contained host-speed calibration stamp so two legs
  * run on different host-days can still be compared as row/calib ratios.
  *
  * Self-contained on purpose: the file can be copied verbatim into a git
  * worktree of an OLD commit (whose tree predates this tool) so both legs
  * of an A/B run the byte-identical probe. Usage per PROTOCOL.md:
  * alternate old/new sessions ≥3 times each on an idle box, compare mins.
  *
  *   SPARK_GRAFT_AB_ROWS=text_cooccur,text_line_dedup \
  *     SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 sbt "runMain graft.tools.AbRowsProbe"
  */
object AbRowsProbe {

  private def calib(): (Double, Double) = {
    val n = 1 << 19
    val buf = new Array[Long](n)
    var x = 0x9E3779B97F4A7C15L
    var i = 0
    while (i < n) {
      x += 0x9E3779B97F4A7C15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
      z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
      buf(i) = z ^ (z >>> 31)
      i += 1
    }
    @volatile var sink = 0L
    def run(passes: Int): Long = {
      var h = 0x27D4EB2F165667C5L
      var p = 0
      while (p < passes) {
        var j = 0
        while (j < n) {
          h ^= buf(j) * 0xC2B2AE3D27D4EB4FL
          h = java.lang.Long.rotateLeft(h, 31) * 0x9E3779B185EBCA87L
          j += 1
        }
        p += 1
      }
      h
    }
    sink ^= run(20)
    var single = Double.MaxValue
    for (_ <- 0 until 3) {
      val t0 = System.nanoTime(); sink ^= run(150)
      single = math.min(single, (System.nanoTime() - t0) / 1e6)
    }
    val cores = Runtime.getRuntime.availableProcessors()
    def mt(): Double = {
      val t0 = System.nanoTime()
      val ts = (0 until cores).map { _ =>
        val t = new Thread(() => { sink ^= run(60) }); t.start(); t
      }
      ts.foreach(_.join())
      (System.nanoTime() - t0) / 1e6
    }
    mt()
    (single, math.min(mt(), mt()))
  }

  def main(args: Array[String]): Unit = {
    val rows = sys.env.getOrElse("SPARK_GRAFT_AB_ROWS",
      "q1_agg,text_fingerprint,text_winnowing,text_lm_xent," + // canaries
        "text_cooccur,text_line_dedup,text_decontaminate_bloom_check")
      .split(",").map(_.trim).filter(_.nonEmpty).toVector
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val (c1, cMt) = calib()
    val loadavg = try {
      val src = scala.io.Source.fromFile("/proc/loadavg")
      try src.mkString.trim.split(" ").take(3).mkString(" ") finally src.close()
    } catch { case scala.util.control.NonFatal(_) => "n/a" }

    val spark = SparkSession.builder().master("local[32]")
      .appName("ab-rows-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      // match graft.Bench (r17): AQE may re-partition cached-plan reads
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    println(f"AB calib_ms=$c1%.1f calib_mt_ms=$cMt%.1f loadavg=$loadavg")
    val warmDir = "/root/testdata/sf0.001"
    for (q <- rows) {
      if (!graft.SparkEntry.queries.contains(q)) println(s"AB $q MISSING")
      else {
        val fn = graft.SparkEntry.queries(q)
        if (new java.io.File(warmDir).isDirectory)
          try fn(spark, warmDir).count()
          catch { case scala.util.control.NonFatal(_) => () }
        val times = (1 to 2).map { _ =>
          val t0 = System.nanoTime()
          fn(spark, sfDir).count()
          (System.nanoTime() - t0) / 1e9
        }
        println(f"AB $q%-34s ${times.min}%.3f  ratio_mt=${times.min * 1000 / cMt}%.4f")
      }
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 probe: the native AsOfJoinExec vs the two composed forms of
  * the same forward as-of (click → first purchase at-or-after), outputs
  * asserted identical, wall + shuffle-bytes measured at 1× and 10× the
  * sf0.1 events (replicas shift user AND event ids so join keys stay
  * fresh — the StreamJoinProbe recipe):
  *
  *   - window form: union the relations, per-user sort, running min over
  *     the FOLLOWING frame restricted to purchases, filter back to
  *     clicks — every purchase rides the window machinery with the
  *     clicks.
  *   - candidate form: inequality join + min-struct re-aggregate —
  *     candidates ∝ clicks × purchases-per-user.
  *   - native: one exchange per side, streamed merge, one buffered row.
  *
  * Numbers land in DESIGN.md; harness tool, not a catalog query.
  */
object AsofProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val bigK = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .appName("asof-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    def settle(): Unit = {
      var prev = -1L
      while (prev != shuffleBytes.get()) { prev = shuffleBytes.get(); Thread.sleep(200) }
    }
    def measured[A](body: => A): (Double, Long, A) = {
      settle(); shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      val a = body
      val wall = (System.nanoTime() - t0) / 1e9
      settle()
      (wall, shuffleBytes.get(), a)
    }

    def windowForm(s: SparkSession, d: String): DataFrame = {
      val e = graft.operators.Relational.events(s, d)
        .filter(col("event_type").isin("click", "purchase"))
        .select("event_id", "user_id", "ts", "event_type")
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      e.withColumn("m", min(when(col("event_type") === "purchase",
          struct(col("ts"), col("event_id")))).over(w))
        .filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"),
          col("m.event_id").as("purchase_id"), col("m.ts").as("purchase_ts"))
    }

    def candidateForm(s: SparkSession, d: String): DataFrame = {
      val e = graft.operators.Relational.events(s, d)
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("pid"), col("user_id").as("pu"), col("ts").as("pts"))
      clicks.join(purchases,
          col("user_id") === col("pu") &&
            (col("pts") > col("ts") ||
              (col("pts") === col("ts") && col("pid") >= col("event_id"))), "left")
        .groupBy("event_id", "user_id", "ts")
        .agg(min(when(col("pid").isNotNull, struct(col("pts"), col("pid")))).as("m"))
        .select(col("event_id"), col("user_id"), col("ts"),
          col("m.pid").as("purchase_id"), col("m.pts").as("purchase_ts"))
    }

    val base = spark.read.parquet(s"$dir/events.parquet")
    val nUsers = base.agg(max("user_id")).head().getLong(0) + 1
    val nEvents = base.agg(max("event_id")).head().getLong(0) + 1

    def replicated(k: Int): String = {
      val out = java.nio.file.Files.createTempDirectory(s"asof-probe-$k").toString
      (0 until k).map { r =>
        base.select(
          (col("event_id") + lit(r * nEvents)).as("event_id"),
          (col("user_id") + lit(r * nUsers)).as("user_id"),
          col("ts"), col("event_type"), col("value"), col("props"))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$out/events.parquet")
      out
    }

    val forms = Seq[(String, (SparkSession, String) => DataFrame)](
      ("window", windowForm),
      ("candidate", candidateForm),
      ("native", (s, d) => graft.operators.Relational.asofNativeNextPurchase(s, d)))

    // r9: the SELF as-of family — the catalog rows' shape (every event ->
    // most recent strictly-earlier purchase). window = the r6 catalog
    // default; chunked = the r7 skew twin; native = the r9 catalog default
    // (backward STRICT streamed merge). Outputs asserted identical.
    val selfForms = Seq[(String, (SparkSession, String) => DataFrame)](
      ("self-window", (s, d) => graft.operators.Relational.asofLastPurchase(s, d)),
      ("self-chunked", (s, d) => graft.operators.Relational.asofLastPurchaseSkewSafe(s, d)),
      ("self-native", (s, d) => graft.operators.Relational.asofLastPurchaseNative(s, d)))

    // r9: last-touch attribution (backward inclusive, hot-collapsed user)
    // vs its candidate-join composition — the hot key makes the candidate
    // form's clicks x purchases blow-up visible
    def attributionCandidate(s: SparkSession, d: String): DataFrame = {
      val e = graft.operators.Relational.events(s, d)
        .withColumn("uid", when(col("user_id") % 16 === 0, lit(-1L)).otherwise(col("user_id")))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id").as("purchase_id"), col("uid").as("user_id"),
          col("ts").as("purchase_ts"))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id").as("cid"), col("uid").as("cu"), col("ts").as("cts"))
      purchases.join(clicks,
          col("user_id") === col("cu") &&
            (col("cts") < col("purchase_ts") ||
              (col("cts") === col("purchase_ts") && col("cid") <= col("purchase_id"))), "left")
        .groupBy("purchase_id", "user_id", "purchase_ts")
        .agg(max(when(col("cid").isNotNull, struct(col("cts"), col("cid")))).as("m"))
        .select(col("purchase_id"), col("user_id"), col("purchase_ts"),
          col("m.cid").as("click_id"), col("m.cts").as("click_ts"))
    }
    val attrForms = Seq[(String, (SparkSession, String) => DataFrame)](
      ("attr-candidate", attributionCandidate),
      ("attr-native", (s, d) => graft.operators.Relational.attributionLastTouch(s, d)))

    val families = Seq(("fwd", forms), ("self", selfForms), ("attr", attrForms))

    for (k <- Seq(1, bigK)) {
      val d = replicated(k)
      try {
        for ((fam, fs) <- families) {
          var firstResult: Set[(Long, Option[Long])] = null
          for ((name, f) <- fs) {
            // equality check UNTIMED — a 1M-row collect would otherwise
            // dominate and noise out the operator's own wall
            val res = f(spark, d).collect()
              .map(r => (r.getLong(0), Option(r.get(3)).map {
                case l: java.lang.Long => l.toLong
                case t: java.sql.Timestamp => t.getTime
              })).toSet
            if (firstResult == null) firstResult = res
            else require(res == firstResult, s"$fam/$name diverged at x$k")
            val (wall, bytes, _) = measured {
              f(spark, d).write.mode("overwrite").format("noop").save()
            }
            println(f"[asof] $name%-15s x$k%-3d wall=$wall%6.2fs shuffle=${bytes / 1e6}%8.1f MB rows=${res.size}")
          }
          firstResult = null
        }
      } finally {
        new scala.reflect.io.Directory(new java.io.File(d)).deleteRecursively()
      }
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scaling probe for the round-6 ANN rank-selection swap: per-query top-k
  * via the bounded-heap `graft_topk` aggregate vs the old
  * `row_number().over(Window.partitionBy(q_id))` form, on a corpus
  * replicated K× (replicas get fresh vec_ids and a deterministic
  * per-replica dimension nudge so they are distinct vectors, not exact
  * copies).
  *
  * What to look for: the window form shuffles EVERY scored candidate row
  * (corpus × nQueries of them) into nQueries window partitions — its
  * per-task work grows linearly with K while its parallelism stays capped
  * at nQueries. The aggregate forwards ≤ k rows per (task, query) to the
  * exchange, so its shuffle volume is flat in K and the scan keeps full
  * parallelism. Outputs are asserted identical before timing.
  *
  * Usage: `runMain graft.tools.AnnScaleProbe [sfDir] [maxFactor]`.
  * Numbers land in DESIGN.md; this is a harness tool, not a catalog query.
  */
object AnnScaleProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxFactor = args.drop(1).headOption.map(_.toInt).getOrElse(16)
    val spark = SparkSession.builder().master("local[32]")
      .appName("ann-scale-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    val base = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
    val n = base.count()
    def time[A](body: => A): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    def replicate(k: Int): DataFrame =
      (0 until k).map { r =>
        base.select(
          (col("vec_id") + lit(r.toLong * n)).as("vec_id"),
          // nudge dim (r mod 64) so replicas are distinct vectors
          expr(s"transform(embedding, (x, i) -> IF(i = ${r % 64}, x + ${r}.0f * 0.01f, x))")
            .as("embedding"))
      }.reduce(_ unionByName _)

    val k0 = 10
    val nQueries = 5

    def scored(vecs: DataFrame) = {
      val e = vecs.select(col("vec_id"), col("embedding"),
        graft.functions.Portable.l2NormNative("embedding").as("norm"))
      val q = e.filter(col("vec_id") < nQueries)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"), col("norm").as("q_norm"))
      e.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .withColumn("cosine",
          graft.functions.Portable.dotProductNative("q_emb", "embedding") /
            (col("q_norm") * col("norm")))
    }

    def aggForm(vecs: DataFrame) = scored(vecs)
      .withColumn("s", col("cosine"))
      .groupBy("q_id").agg(expr(s"graft_topk(vec_id, s, $k0)").as("top"))
      .select(col("q_id"), posexplode(col("top")).as(Seq("pos", "t")))
      .select(col("q_id"), col("t.id").as("neighbor_id"), (col("pos") + 1).cast("int").as("rank"))

    def winForm(vecs: DataFrame) = {
      val w = Window.partitionBy("q_id").orderBy(desc("cosine"), col("vec_id"))
      scored(vecs).withColumn("rank", row_number().over(w))
        .filter(col("rank") <= k0)
        .select(col("q_id"), col("vec_id").as("neighbor_id"), col("rank"))
    }

    // Shuffle-volume accounting: rows written to shuffle across all stages
    // of one action — the quantity that decides survival at 100×, long
    // before local wall-clock moves.
    val shuffleRows = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleRows.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.recordsWritten)
    })
    // listener events arrive asynchronously; wait until the count settles.
    // Settling must happen BEFORE the reset too, or a late stage-completion
    // event from the preceding timing job bleeds into the next measurement.
    def settle(): Unit = {
      var prev = -1L
      while (prev != shuffleRows.get()) { prev = shuffleRows.get(); Thread.sleep(200) }
    }
    def shuffled[A](body: => A): Long = {
      settle(); shuffleRows.set(0)
      body
      settle()
      shuffleRows.get()
    }

    var k = 1
    while (k <= maxFactor) {
      val vecs = replicate(k).cache()
      vecs.count()
      // identical outputs first (once per K), then best-of-2 timings
      val a = aggForm(vecs).collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val w = winForm(vecs).collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      require(a == w, s"K=$k: aggregate/window outputs diverged")
      val tAgg = math.min(time(aggForm(vecs).count()), time(aggForm(vecs).count()))
      val tWin = math.min(time(winForm(vecs).count()), time(winForm(vecs).count()))
      val sAgg = shuffled(aggForm(vecs).count())
      val sWin = shuffled(winForm(vecs).count())
      println(f"PROBE K=$k%-3d vectors=${n * k}%-8d agg=$tAgg%.3fs/$sAgg%d-shuffled " +
        f"window=$tWin%.3fs/$sWin%d-shuffled shuffle_ratio=${sWin.toDouble / math.max(1, sAgg)}%.0fx")
      vecs.unpersist(false)
      k *= 4
    }
    spark.stop()
  }
}

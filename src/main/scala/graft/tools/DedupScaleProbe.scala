package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scaling probe for the embedding-dedup paths: replicates the embeddings
  * table K× (ids offset so replicas are distinct rows) and times
  *
  *   - the EXACT blocked-grid self-join (`Dedup.embeddingNearDups` on a
  *     view) — expected ~n² work but distributed evenly across the grid
  *   - the LSH candidate path (`Dedup.embeddingNearDupsLsh`) — expected
  *     near-linear while the corpus has bounded near-dup structure
  *
  * Usage: `runMain graft.tools.DedupScaleProbe [sfDir] [maxFactor]`.
  * Numbers land in DESIGN.md; this is a harness tool, not a catalog query.
  */
object DedupScaleProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxFactor = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[32]")
      .appName("dedup-scale-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = spark.read.parquet(s"$dir/embeddings.parquet").select("vec_id", "embedding")
    val n0 = base.count()

    def replicated(k: Int) = {
      val parts = (0 until k).map(i => base.select((col("vec_id") + lit(i * 1000000L)).as("vec_id"), col("embedding")))
      parts.reduce(_ union _).repartition(32).cache()
    }

    def time[A](body: => A): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    // shuffle-byte meter for the semdedup co-growth cell: the LINEARITY
    // claim is about work, and wall clock on a shared host lies — shuffle
    // write bytes do not
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })

    var k = 1
    val semCells = Seq.newBuilder[(Long, Double, Long)]
    while (k <= maxFactor) {
      val vecs = replicated(k)
      val n = vecs.count() // fill cache
      // exact blocked grid: more blocks as n grows (blocks ~ cluster width)
      val blocks = math.max(8, 2 * k)
      val exact = time {
        graft.operators.Dedup.embeddingNearDupsGrid(vecs, 0.4, blocks).count()
      }
      val lsh = time {
        graft.operators.Dedup.embeddingNearDupsLsh(vecs, 0.9).count()
      }
      // r15 (VERDICT r14 #5): the SemDeDup CO-GROWTH cell — k-means k grown
      // with n via kmeansKFor at a FIXED small target cluster size (so the
      // ×8 sweep actually exercises k ∝ n at probe scale), Σ n_c² ≈
      // n·target and the whole operator should scale ~linear in n: wall
      // AND shuffle-byte exponents ≈ 1 across doublings.
      val semTarget = 256
      val semK = graft.operators.Dedup.kmeansKFor(n, semTarget)
      shuffleBytes.set(0L)
      val sem = time {
        graft.operators.Dedup.semDeDupFrom(vecs, semK, lloydIters = 2, threshold = 0.4).count()
      }
      Thread.sleep(500) // listener bus is async; stage events post within ms
      val semSh = shuffleBytes.get()
      semCells += ((n, sem, semSh))
      println(f"[probe] n=$n%7d (x$k) blocks=$blocks exact_grid=${exact}%7.2fs " +
        f"lsh=${lsh}%6.2fs semdedup(k=$semK)=${sem}%6.2fs shuffle=${semSh / 1048576.0}%7.1fMiB")
      vecs.unpersist()
      k *= 2
    }
    val cells = semCells.result()
    if (cells.size >= 2) {
      val (n1, w1, s1) = cells.head
      val (n2, w2, s2) = cells.last
      val span = math.log(n2.toDouble / n1)
      println(f"[probe] semdedup co-growth exponents over x${n2 / n1}: " +
        f"wall=${math.log(w2 / w1) / span}%5.2f shuffle=${math.log(s2.toDouble / s1) / span}%5.2f " +
        "(≈1.0 = linear; k grew with n at fixed cluster size)")
    }
    spark.stop()
  }
}

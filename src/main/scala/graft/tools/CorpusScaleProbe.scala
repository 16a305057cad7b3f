package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** ×k co-growth evidence for the dedup/text heavy hitters (VERDICT r13 #5
  * — the TpchScaleProbe treatment applied to the corpus operators), plus
  * the forced-crowded-prune cell (r13 #1 tail).
  *
  * Replica construction is the point: to measure the LINEAR regime the
  * replicas must be mutually DISSIMILAR (a byte-identical copy would make
  * every original pair k²-fold). Text replicas prefix every word with a
  * copy tag (`c<i>_`), so every word-3-gram and char-5-gram differs across
  * copies while within-copy similarity structure is preserved exactly.
  * Embedding replicas multiply element j by a copy-derived ±1 mask — an
  * orthogonal transform, so within-copy cosines are bit-preserved while
  * cross-copy cosines decorrelate to ~0.
  *
  * Reported per row: wall and shuffle-bytes exponents
  * `log(ratio)/log(k)` — ≈1 is the structural expectation for the banded
  * equi-join paths.
  *
  * The `crowded_prune` cell forces `maxBucketSize` far below the fixture's
  * real bucket sizes so the prune list (never triggered at test scale
  * otherwise) becomes LARGE, exercising the de-hinted left_anti join in
  * exactly the boilerplate-at-100TB regime it exists for; it reports the
  * crowded-set size and the surviving pair count vs the default run.
  *
  * Usage: `runMain graft.tools.CorpusScaleProbe [sfDir] [bigFactor]`.
  * Numbers land in DESIGN.md; harness tool, not a catalog query.
  */
object CorpusScaleProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val bigK = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[32]")
      .appName("corpus-scale-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
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
    def measured[A](body: => A): (Double, Long) = {
      settle()
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      body
      val wall = (System.nanoTime() - t0) / 1e9
      settle()
      (wall, shuffleBytes.get())
    }

    /** k mutually-dissimilar copies of documents + embeddings (see object
      * scaladoc for the construction), written as a probe sf dir.
      */
    def replicate(k: Int): String = {
      val out = java.nio.file.Files.createTempDirectory(s"corpus-probe-x$k").toString
      val copies = spark.range(k).select(col("id").as("copy"))
      spark.read.parquet(s"$dir/documents.parquet")
        .crossJoin(copies)
        .withColumn("doc_id", col("doc_id") + col("copy") * 10000000L)
        .withColumn("text",
          // per-copy word prefix: within-copy n-gram structure preserved,
          // zero shared word-3-grams / char-5-grams across copies
          expr("array_join(transform(split(text, ' '), w -> concat('c', copy, '_', w)), ' ')"))
        .drop("copy")
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      spark.read.parquet(s"$dir/embeddings.parquet")
        .crossJoin(copies)
        .withColumn("vec_id", col("vec_id") + col("copy") * 10000000L)
        .withColumn("embedding",
          // copy-derived ±1 mask per dimension: orthogonal within a copy
          // (cosines preserved), decorrelating across copies
          expr("transform(embedding, (x, j) -> CAST(x * (1 - 2 * pmod(hash(copy, j), 2)) AS FLOAT))"))
        .drop("copy")
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
      out
    }

    val d1 = replicate(1)
    val dk = replicate(bigK)

    import graft.operators.{Dedup, EmbeddingStrategy, TextAnalysis}
    val probes: Seq[(String, String => Long)] = Seq(
      "dedup_ngram" -> ((d: String) => Dedup.ngramNearDups(spark, d).count()),
      "dedup_minhash" -> ((d: String) => Dedup.minhashNearDups(spark, d).count()),
      "semantic_clusters_lsh" -> ((d: String) =>
        Dedup.semanticClusters(spark, d, 0.7, EmbeddingStrategy.SignLsh).count()),
      "semantic_canonical_lsh" -> ((d: String) =>
        Dedup.semanticCanonical(spark, d, 0.7, EmbeddingStrategy.SignLsh).count()),
      "text_containment" -> ((d: String) => TextAnalysis.containmentJoin(spark, d).count()))

    println(f"${"probe"}%-24s ${"wall1"}%8s ${"wallK"}%8s ${"expW"}%6s ${"shuf1MB"}%8s ${"shufKMB"}%8s ${"expS"}%6s")
    probes.foreach { case (name, run) =>
      run(d1) // warm the shape once
      val (w1, s1) = measured(run(d1))
      val (wk, sk) = measured(run(dk))
      val expW = math.log(wk / w1) / math.log(bigK.toDouble)
      val expS = math.log(sk.toDouble / s1.toDouble) / math.log(bigK.toDouble)
      println(f"$name%-24s $w1%8.2f $wk%8.2f $expW%6.2f ${s1 / 1e6}%8.1f ${sk / 1e6}%8.1f $expS%6.2f")
    }

    // ---- forced-crowded-prune cell (r13 #1 Done condition) -------------
    // maxBucketSize=3 at ×k makes a large fraction of band buckets
    // "crowded": the prune list is now corpus-sized, the regime the
    // broadcast hint was wrong for. Report crowded-set size, wall, and
    // surviving pairs vs the default run at the same scale.
    val defPairs = Dedup.minhashNearDups(spark, dk).count()
    val (wCrowd, _) = measured {
      val prunedPairs = Dedup.minhashNearDups(spark, dk, maxBucketSize = 3).count()
      println(s"[crowded] pruned-run pairs=$prunedPairs (default-run pairs=$defPairs)")
    }
    // size of the forced crowded set itself, from the same banding params
    val crowdedN = Dedup.crowdedBucketCount(spark, dk, maxBucketSize = 3)
    println(f"[crowded] forced maxBucketSize=3 crowded_buckets=$crowdedN wall=$wCrowd%6.2fs")
    spark.stop()
  }
}

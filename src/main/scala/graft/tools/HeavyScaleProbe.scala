package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-8 scaling probe for the CATALOG'S HEAVIEST rows, answering two
  * questions the sf0.1 bench cannot:
  *
  * 1. **substring-dup rewrite evidence** — the r8 fingerprint rewrite of
  *    [[graft.operators.TextAnalysis.substringDupScore]] claims ~20× fewer
  *    shuffle bytes than the raw-gram form with IDENTICAL output. The probe
  *    runs BOTH forms (the old raw-gram shape is reconstructed inline) on
  *    the same corpus, asserts the per-doc results bit-equal, and reports
  *    measured shuffle-write bytes for each from stage metrics.
  *
  * 2. **sf0.1 → sf1-equivalent scaling exponents** — the five most
  *    expensive rows (dedup_ngram, dedup_semantic_lsh, ann_pq, ann_pq via
  *    store, pipeline_curate) timed at 1× and 10× the sf0.1 corpus
  *    (replicated with shifted ids/text prefixes, the TextScaleProbe
  *    recipe), with wall + shuffle-bytes exponents
  *    `log(ratio)/log(10)`. The exact semantic grid (`dedup_semantic`) is
  *    deliberately NOT probed at 10×: its Ω(n²) pair budget REFUSES past
  *    `GridPairBudget` by contract — the LSH twin is the scale path.
  *
  * Usage: `runMain graft.tools.HeavyScaleProbe [sfDir] [bigFactor]`.
  * Numbers land in DESIGN.md; harness tool, not a catalog query.
  */
object HeavyScaleProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val bigK = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .appName("heavy-scale-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)

    // --- shuffle-bytes accounting via stage metrics ---------------------
    val shuffleBytes = new java.util.concurrent.atomic.AtomicLong(0L)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        shuffleBytes.addAndGet(sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten)
    })
    // listenerBus is private[spark]; settle the async bus by polling the
    // counter until it stops moving (the AnnScaleProbe recipe)
    def settle(): Unit = {
      var prev = -1L
      while (prev != shuffleBytes.get()) { prev = shuffleBytes.get(); Thread.sleep(200) }
    }
    def measured[A](body: => A): (Double, Long, A) = {
      settle()
      shuffleBytes.set(0L)
      val t0 = System.nanoTime()
      val a = body
      val wall = (System.nanoTime() - t0) / 1e9
      settle()
      (wall, shuffleBytes.get(), a)
    }

    // --- part 1: substring-dup old vs new on the same corpus ------------
    {
      import graft.functions.Portable
      val k = 25
      def gOld = spark.read.parquet(s"$dir/documents.parquet")
        .withColumn("toks", Portable.tokens("text"))
        .filter(size(col("toks")) >= k)
        .select(col("doc_id"), explode(Portable.wordShingles("toks", k)).as("gram"))
      val dupOld = gOld.groupBy("gram")
        .agg(countDistinct(col("doc_id")).as("df"))
        .filter(col("df") >= 2)
        .select(col("gram"), lit(true).as("is_dup"))
      val oldForm = gOld.join(broadcast(dupOld), Seq("gram"), "left")
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_windows"),
          count(when(col("is_dup"), 1)).as("n_dup_windows"))
        .withColumn("dup_frac",
          col("n_dup_windows").cast("double") / col("n_windows"))

      val newForm = graft.operators.TextAnalysis.substringDupScore(spark, dir, k)

      // warm both shapes once (codegen), then measure
      oldForm.count(); newForm.count()
      val (tOld, bOld, rOld) = measured {
        oldForm.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      }
      val (tNew, bNew, rNew) = measured {
        newForm.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
      }
      require(rOld.sameElements(rNew),
        s"substring-dup rewrite changed results: old=${rOld.length} new=${rNew.length} rows")
      println(f"[probe:substring_dup] OUTPUT IDENTICAL (${rNew.length}%d docs). " +
        f"raw-gram: $tOld%6.2fs ${bOld / 1e6}%8.1f MB shuffled | " +
        f"fingerprint: $tNew%6.2fs ${bNew / 1e6}%8.1f MB shuffled | " +
        f"shuffle ratio ${bOld.toDouble / math.max(bNew, 1)}%5.1fx")
    }

    // --- part 2: heavy hitters at 1x and bigK x --------------------------
    val baseDocs = spark.read.parquet(s"$dir/documents.parquet")
    val baseVecs = spark.read.parquet(s"$dir/embeddings.parquet")

    def replicate(tmp: String, kRep: Int): Unit = {
      (0 until kRep).map(i => baseDocs
          .withColumn("doc_id", col("doc_id") + lit(i * 10000000L))
          .withColumn("text",
            if (i == 0) col("text") else concat(lit(s"r$i "), col("text"))))
        .reduce(_ union _)
        .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
      (0 until kRep).map(i => baseVecs
          .withColumn("vec_id", col("vec_id") + lit(i * 10000000L)))
        .reduce(_ union _)
        .write.mode("overwrite").parquet(s"$tmp/embeddings.parquet")
    }

    val rows = Seq[(String, (SparkSession, String) => Long)](
      ("dedup_ngram", (s, d) => graft.operators.Dedup.ngramNearDups(s, d).count()),
      ("dedup_semantic_lsh", (s, d) => graft.operators.Dedup.semanticClustersLsh(s, d).count()),
      ("ann_pq", (s, d) => graft.operators.Similarity.pqTopK(s, d).count()),
      ("pipeline_curate", (s, d) => graft.operators.TextAnalysis.pipelineCurate(s, d).count()),
      // r8 addition: the bigram-LM scorer — its model table grows with the
      // corpus, so the exponent proves the AQE-sized score join scales
      ("text_lm_xent", (s, d) => graft.operators.TextAnalysis.lmCrossEntropy(s, d).count()),
      // r8: the composed IVF-PQ index — training samples, encoding is one
      // map pass, probe scan reads codes only; wall should stay near-flat
      ("ann_ivfpq", (s, d) => graft.operators.Similarity.ivfPqTopK(s, d).count()),
      // r8: DSIR — occurrence stream scales with tokens, model stays 1024
      // buckets; exponent proves the bounded-broadcast apply join scales
      ("text_dsir", (s, d) => graft.operators.TextAnalysis.dsirWeights(s, d).count()),
      // r9: the pruned-LM twin — top-K heap caps the model side; probe it
      // NEXT TO the exact scorer so the two exponents read side by side
      ("text_lm_xent_pruned", (s, d) => graft.operators.TextAnalysis.lmCrossEntropyPruned(s, d).count()),
      // r9 continuation: the EXACT prefix-filter Jaccard join — its
      // candidate count is data-dependent (rare-first prefixes); the
      // exponent shows whether replication's duplicated grams (df scales
      // with kRep, prefixes stay rare RELATIVE to the corpus) keep the
      // join subquadratic the way the LSH twin is
      ("dedup_jaccard_exact", (s, d) => graft.operators.Dedup.jaccardPrefixNearDups(s, d).count()))

    val results = scala.collection.mutable.Map[(String, Int), (Double, Long)]()
    for (kRep <- Seq(1, bigK)) {
      val tmp = java.nio.file.Files.createTempDirectory(s"heavy-scale-$kRep").toString
      try {
        replicate(tmp, kRep)
        spark.read.parquet(s"$tmp/documents.parquet").count() // warm FS cache
        for ((name, run) <- rows) {
          run(spark, tmp) // warm the shape
          val (wall, bytes, _) = measured(run(spark, tmp))
          results((name, kRep)) = (wall, bytes)
          println(f"[probe] $name%-20s x$kRep%-3d wall=$wall%7.2fs shuffle=${bytes / 1e6}%9.1f MB")
        }
      } finally {
        new scala.reflect.io.Directory(new java.io.File(tmp)).deleteRecursively()
      }
    }
    println("[probe] scaling exponents (log ratio / log " + bigK + "):")
    for ((name, _) <- rows) {
      val (w1, b1) = results((name, 1))
      val (wK, bK) = results((name, bigK))
      val we = math.log(wK / w1) / math.log(bigK.toDouble)
      val be = math.log(bK.toDouble / math.max(b1, 1).toDouble) / math.log(bigK.toDouble)
      println(f"[probe] $name%-20s wall_exp=$we%5.2f shuffle_exp=$be%5.2f " +
        f"(${w1}%6.2fs -> ${wK}%7.2fs, ${b1 / 1e6}%8.1f MB -> ${bK / 1e6}%9.1f MB)")
    }
    spark.stop()
  }
}

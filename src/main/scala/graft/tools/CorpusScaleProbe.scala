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
  * every original pair k²-fold). Text replicas apply a per-copy Caesar
  * substitution over letters+digits — a BIJECTION on words and on char
  * n-grams, so every within-copy Jaccard value is preserved exactly (copy
  * 0 is the identity: the ×1 corpus IS the bench corpus) while grams
  * never match across copies. A first attempt prefixed every word with a
  * copy tag instead; that injected the same `c0_` substring into every
  * word of every doc, pushed the char-5-gram background similarity past
  * the sig-filter cutoff, and blew the verify join up to a 39 GB spill at
  * ×1 — a good demonstration of exactly the boilerplate regime the
  * crowded-bucket guard exists for, but not the linear regime this probe
  * measures.
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
  * Usage: `runMain graft.tools.CorpusScaleProbe [sfDir] [bigFactor]
  * [rowSubstring,...]` — the optional third arg filters probe rows by
  * name (comma-separated substrings) for targeted re-runs.
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
      // stall watchdog: a measured body that runs >20 s on this fixture is
      // a stall, not work — dump all thread stacks once so the wait site
      // is identifiable from the probe log
      val done = new java.util.concurrent.atomic.AtomicBoolean(false)
      val watchdog = new Thread(() => {
        val slept = try { Thread.sleep(20000); true }
          catch { case _: InterruptedException => false }
        if (slept && !done.get()) {
          println("[watchdog] measured body >20s — thread dump:")
          import scala.jdk.CollectionConverters._
          Thread.getAllStackTraces.asScala
            .filter { case (t, st) => st.nonEmpty &&
              t.getName.contains("Executor task launch") }
            .take(8)
            .foreach { case (t, st) =>
              println(s"  == ${t.getName} (${t.getState})\n" +
                st.take(14).map(f => s"     at $f").mkString("\n"))
            }
        }
      })
      watchdog.setDaemon(true)
      watchdog.start()
      val t0 = System.nanoTime()
      body
      val wall = (System.nanoTime() - t0) / 1e9
      done.set(true)
      watchdog.interrupt()
      settle()
      (wall, shuffleBytes.get())
    }

    /** k mutually-dissimilar copies of documents + embeddings (see object
      * scaladoc for the construction), written as a probe sf dir.
      */
    def replicate(k: Int): String = {
      val out = java.nio.file.Files.createTempDirectory(s"corpus-probe-x$k").toString
      val lower = "abcdefghijklmnopqrstuvwxyz"
      val upper = lower.toUpperCase
      val digits = "0123456789"
      val src = lower + upper + digits
      def rot(s: String, i: Int) = s.drop(i % s.length) + s.take(i % s.length)
      def dst(i: Int) = rot(lower, i) + rot(upper, i) + rot(digits, i)
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      (0 until k).map { i =>
        docs.withColumn("doc_id", col("doc_id") + lit(i.toLong * 10000000L))
          .withColumn("text", translate(col("text"), src, dst(i)))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$out/documents.parquet")
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      (0 until k).map { i =>
        emb.withColumn("vec_id", col("vec_id") + lit(i.toLong * 10000000L))
          .withColumn("embedding",
            // copy-derived ±1 mask per dimension: orthogonal within a copy
            // (cosines preserved), decorrelating across copies
            expr(s"transform(embedding, (x, j) -> CAST(x * (1 - 2 * pmod(hash($i, j), 2)) AS FLOAT))"))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
      out
    }

    val d1 = replicate(1)
    val dk = replicate(bigK)

    import graft.operators.{Dedup, EmbeddingStrategy, TextAnalysis}
    val rowFilter = args.drop(2).headOption.map(_.split(',').toSeq)
    val allProbes: Seq[(String, String => Long)] = Seq(
      "dedup_ngram" -> ((d: String) => Dedup.ngramNearDups(spark, d).count()),
      "dedup_minhash" -> ((d: String) => Dedup.minhashNearDups(spark, d).count()),
      "semantic_clusters_lsh" -> ((d: String) =>
        Dedup.semanticClusters(spark, d, 0.7, EmbeddingStrategy.SignLsh).count()),
      "semantic_canonical_lsh" -> ((d: String) =>
        Dedup.semanticCanonical(spark, d, 0.7, EmbeddingStrategy.SignLsh).count()),
      "text_containment" -> ((d: String) => TextAnalysis.containmentJoin(spark, d).count()),
      // exact prefix-filter twin (VERDICT r16 #7): no committed growth
      // curve existed for it or for containment's CANDIDATE stage — the
      // `_cands` rows count the candidate frames directly (the filters'
      // whole point), not just the verified output
      "jaccard_prefix" -> ((d: String) => Dedup.jaccardPrefixNearDups(spark, d).count()),
      "containment_cands" -> ((d: String) => {
        val (shC, cand) = TextAnalysis.containmentCandidates(spark, d)
        val n = cand.count()
        shC.unpersist(false)
        n
      }),
      "jaccard_prefix_cands" -> ((d: String) => {
        val (caches, _, cand) = Dedup.jaccardPrefixCandidates(
          Dedup.docShingleArrays(spark, d), 3, 5)
        val n = cand.count()
        caches.foreach(_.unpersist(false))
        n
      }),
      // the scale-path discipline applied: bits grows log2(k) so bucket
      // occupancy (and with it the candidate stream) stays constant per
      // vector — the fixed-bits twin above shows the quadratic candidate
      // growth this avoids (expS ~2.0 there, ~1.0 here)
      "semantic_clusters_scaledbits" -> ((d: String) => {
        val bits = if (d == dk) 8 + (math.log(bigK.toDouble) / math.log(2.0)).round.toInt else 8
        Dedup.semanticClusters(spark, d, 0.7, EmbeddingStrategy.SignLsh, bits = bits).count()
      }))
    val probes = rowFilter.map(fs => allProbes.filter(p => fs.exists(p._1.contains)))
      .getOrElse(allProbes)

    println(f"${"probe"}%-24s ${"wall1"}%8s ${"wallK"}%8s ${"expW"}%6s ${"shuf1MB"}%8s ${"shufKMB"}%8s ${"expS"}%6s ${"n1"}%9s ${"nK"}%10s ${"expN"}%6s")
    probes.foreach { case (name, run) =>
      // warm BOTH corpora before measuring: a cold ×k run pays parquet
      // page-cache misses + codegen the warmed ×1 cell doesn't, biasing
      // expW upward (r14 review; SemanticLshDiag measured 47 s cold vs
      // 4 s warm on the identical DAG)
      run(d1); run(dk)
      var n1 = 0L; var nk = 0L
      val (w1, s1) = measured { n1 = run(d1) }
      val (wk, sk) = measured { nk = run(dk) }
      val expW = math.log(wk / w1) / math.log(bigK.toDouble)
      val expS = math.log(sk.toDouble / s1.toDouble) / math.log(bigK.toDouble)
      // output/candidate-COUNT growth exponent: ≈1 = the replicas stayed
      // mutually invisible (per-copy work only); >1 = cross-copy leakage
      val expN = math.log(nk.toDouble / n1.toDouble) / math.log(bigK.toDouble)
      println(f"$name%-24s $w1%8.2f $wk%8.2f $expW%6.2f ${s1 / 1e6}%8.1f ${sk / 1e6}%8.1f $expS%6.2f $n1%9d $nk%10d $expN%6.2f")
    }

    // same match direction as the probe-row filter: run the cell iff some
    // filter substring occurs in its name "crowded_prune" (r14 review: the
    // inverted containment made `crowded_prune` — the cell's documented
    // name — skip the cell)
    if (rowFilter.exists(fs => !fs.exists("crowded_prune".contains(_)))) { spark.stop(); return }
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

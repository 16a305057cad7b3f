package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 scale probe for the PERSISTED index family added in r9
  * (VERDICT r9 #6): IVF-PQ and SQ8 stores on corpora replicated up to 10×
  * sf0.1 (the sf1-equivalent corpus this sandbox lacks as parquet),
  * separating the two costs that matter at 100 TB:
  *
  *   - BUILD (once): sample-train quantizers, assign + encode the corpus,
  *     persist. Must scale ~linearly with corpus size — training reads a
  *     fixed-fraction sample, encoding is one map pass.
  *   - QUERY (many): load the quantizer models (driver-side, corpus-size
  *     independent), ADC-scan the coded corpus, shortlist, re-rank. The
  *     coded scan is the only corpus-∝ term, at 8–64 B/vector instead of
  *     256 B raw — the point of the compressed index.
  *
  * Per factor K the probe reports build wall, best-of-2 query wall over
  * the SAME store (build once / query many), and the exact-top-k recall
  * overlap so speed never silently buys wrong answers. Scaling exponents
  * between successive K are printed at the end; build and query should
  * both sit near 1 (linear in corpus), with query ≪ build in absolute
  * terms. Numbers land in the commit message / DESIGN.md.
  *
  * Usage: `runMain graft.tools.AnnStoreScaleProbe [sfDir] [maxFactor]`.
  */
object AnnStoreScaleProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val maxFactor = args.drop(1).headOption.map(_.toInt).getOrElse(10)
    val spark = SparkSession.builder().master("local[32]")
      .appName("ann-store-scale-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import graft.operators.Similarity

    val base = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding")
    val n = base.count()

    def time[A](body: => A): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def best2(body: => Long): Double = math.min(time(body), time(body))

    // replicas keep vec_id 0..nQueries-1 (the query vectors) ONLY in copy
    // 0; later copies shift ids and nudge one dimension so they are
    // distinct vectors (the AnnScaleProbe recipe)
    def materialize(k: Int): String = {
      val out = java.nio.file.Files.createTempDirectory(s"ann-store-k$k").toString
      (0 until k).map { r =>
        base.select(
          (col("vec_id") + lit(r.toLong * n)).as("vec_id"),
          expr(s"transform(embedding, (x, i) -> IF(i = ${r % 64}, x + ${r}.0f * 0.01f, x))")
            .as("embedding"))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
      out
    }

    final case class Point(k: Int, build: Double, query: Double, recall: Double)

    def run(name: String, build: (String, String) => Unit,
        query: (String, String) => DataFrame): Vector[Point] = {
      var points = Vector.empty[Point]
      var k = 1
      while (k <= maxFactor) {
        val kdir = materialize(k)
        val store = java.nio.file.Files.createTempDirectory(s"ann-store-$name-$k").toString
        val tBuild = time(build(kdir, store))
        // query MANY against the one store: best-of-2 over the same index
        val tQuery = best2(query(kdir, store).count())
        // recall vs the exact answer on the same corpus (50 pairs total)
        val exact = Similarity.bruteForceTopK(spark, kdir).select("q_id", "neighbor_id")
        val approx = query(kdir, store).select("q_id", "neighbor_id")
        val hits = exact.join(approx, Seq("q_id", "neighbor_id"), "left_semi").count()
        val recall = hits.toDouble / exact.count()
        println(f"PROBE $name%-7s K=$k%-3d vectors=${n * k}%-8d build=$tBuild%.2fs " +
          f"query=$tQuery%.2fs recall=$recall%.2f")
        points :+= Point(k, tBuild, tQuery, recall)
        k *= (if (maxFactor >= 10) (if (k == 1) 4 else 3) else 2) // 1, 4, 12-capped
        if (k > maxFactor && points.last.k < maxFactor) k = maxFactor
      }
      points
    }

    val ivfpq = run("ivfpq",
      (d, s) => Similarity.writeIvfPqIndex(spark, d, s),
      (d, s) => Similarity.ivfPqTopKViaStore(spark, d, s))
    val sq = run("sq8",
      (d, s) => Similarity.writeSqIndex(spark, d, s),
      (d, s) => Similarity.sqTopKViaStore(spark, d, s))

    def exponents(ps: Vector[Point]): String =
      ps.sliding(2).collect { case Vector(a, b) =>
        val f = math.log(b.k.toDouble / a.k)
        f"K${a.k}->K${b.k}: build=${math.log(b.build / a.build) / f}%.2f " +
          f"query=${math.log(b.query / a.query) / f}%.2f"
      }.mkString("; ")
    println(s"SCALING ivfpq ${exponents(ivfpq)}")
    println(s"SCALING sq8   ${exponents(sq)}")
    spark.stop()
  }
}

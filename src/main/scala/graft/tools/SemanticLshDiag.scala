package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off diagnostic for the CorpusScaleProbe ×8 semantic-clusters cell:
  * where do 47 s go when the same DAG's second run takes 4 s? Stages the
  * pipeline (LSH pair generation, edge canonicalization, CC) separately
  * on the ×8 masked corpus. Harness tool.
  */
object SemanticLshDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val k = args.drop(1).headOption.map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder().master("local[32]")
      .appName("semantic-lsh-diag")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"DIAG $label%-34s ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val emb = spark.read.parquet(s"$dir/embeddings.parquet")
    val big = (0 until k).map { i =>
      emb.withColumn("vec_id", col("vec_id") + lit(i.toLong * 10000000L))
        .withColumn("embedding",
          expr(s"transform(embedding, (x, j) -> CAST(x * (1 - 2 * pmod(hash($i, j), 2)) AS FLOAT))"))
    }.reduce(_ unionByName _).localCheckpoint(true)
    println(s"DIAG corpus rows=${big.count()}")
    // the probe cell VERBATIM: write the replica dir, then semanticClusters on it
    val out = java.nio.file.Files.createTempDirectory(s"diag-x$k").toString
    time("write replica dir") {
      (0 until k).map { i =>
        emb.withColumn("vec_id", col("vec_id") + lit(i.toLong * 10000000L))
          .withColumn("embedding",
            expr(s"transform(embedding, (x, j) -> CAST(x * (1 - 2 * pmod(hash($i, j), 2)) AS FLOAT))"))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    }
    time("semanticClusters SignLsh (1st)") {
      graft.operators.Dedup.semanticClusters(spark, out, 0.7,
        graft.operators.EmbeddingStrategy.SignLsh).count()
    }
    time("semanticClusters SignLsh (2nd)") {
      graft.operators.Dedup.semanticClusters(spark, out, 0.7,
        graft.operators.EmbeddingStrategy.SignLsh).count()
    }
    // now the probe's exact sequence: d1 dir, warm at d1, measured d1, measured dk
    val out1 = java.nio.file.Files.createTempDirectory("diag-x1").toString
    emb.withColumn("embedding",
        expr(s"transform(embedding, (x, j) -> CAST(x * (1 - 2 * pmod(hash(0, j), 2)) AS FLOAT))"))
      .write.mode("overwrite").parquet(s"$out1/embeddings.parquet")
    def runAt(d: String) = graft.operators.Dedup.semanticClusters(spark, d, 0.7,
      graft.operators.EmbeddingStrategy.SignLsh).count()
    time("seq: warm d1") { runAt(out1) }
    time("seq: measured d1") { runAt(out1) }
    time("seq: measured dk") { runAt(out) }
    val pairs = time("lsh pairs (1st)") {
      val p = graft.operators.Dedup.embeddingNearDupsLsh(big.select("vec_id", "embedding"), 0.7)
      val n = p.count(); println(s"DIAG verified pairs=$n"); p
    }
    time("lsh pairs (2nd)") {
      graft.operators.Dedup.embeddingNearDupsLsh(big.select("vec_id", "embedding"), 0.7).count()
    }
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
    time("cc adaptive (1st)") {
      println(s"DIAG cc rows=${graft.operators.Dedup.connectedComponentsAdaptive(edges).count()}")
    }
    time("cc adaptive (2nd)") {
      graft.operators.Dedup.connectedComponentsAdaptive(edges).count()
    }
    spark.stop()
  }
}

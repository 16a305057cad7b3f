package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage-level timing of the margin-mining agreement gate at sf0.1. */
object GateProfile {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .appName("gate-profile")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime(); val r = body
      println(f"STAGE $label%-28s ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    // warm the session on a cheap query first
    graft.SparkEntry.queries("ann_topk")(spark, dir).collect()
    time("full gate (1st)") { graft.operators.Similarity.marginMiningIvfAgreement(spark, dir).collect() }
    time("full gate (2nd)") { graft.operators.Similarity.marginMiningIvfAgreement(spark, dir).collect() }
    time("exact miner alone") { graft.operators.Similarity.marginMining(spark, dir).collect() }
    time("ivf miner alone") { graft.operators.Similarity.marginMiningIvf(spark, dir).collect() }

    // ---- r14 (VERDICT r13 #4): the two remaining heavy ANN gates -------
    import graft.operators.Similarity
    println("--- ann_ivfpq_store_check ---")
    time("store gate (1st)") { Similarity.ivfPqStoreRecallFloor(spark, dir).collect() }
    time("store gate (2nd)") { Similarity.ivfPqStoreRecallFloor(spark, dir).collect() }
    val store = java.nio.file.Files.createTempDirectory("gate-profile-ivfpq").toString
    try {
      time("  build+persist index") { Similarity.writeIvfPqIndex(spark, dir, store) }
      time("  exact brute force") { Similarity.bruteForceTopK(spark, dir, 10, 5).collect() }
      time("  store-backed query") { Similarity.ivfPqTopKViaStore(spark, dir, store).collect() }
    } finally {
      new scala.reflect.io.Directory(new java.io.File(store)).deleteRecursively()
    }
    println("--- ann_ivfpq_append_check ---")
    time("append gate (1st)") { Similarity.ivfPqAppendRecallFloor(spark, dir).collect() }
    time("append gate (2nd)") { Similarity.ivfPqAppendRecallFloor(spark, dir).collect() }
    val store2 = java.nio.file.Files.createTempDirectory("gate-profile-append").toString
    try {
      import org.apache.spark.sql.functions.col
      val emb = spark.read.parquet(s"$dir/embeddings.parquet")
      val n = emb.count()
      val splitId = n * 9 / 10
      time("  build 90% index") {
        Similarity.writeIvfPqIndexFiltered(spark, dir, store2, col("vec_id") < splitId) }
      time("  append 10%") {
        Similarity.appendToIvfPqIndex(spark, dir, store2, col("vec_id") >= splitId) }
      time("  exact brute force") { Similarity.bruteForceTopK(spark, dir, 10, 5).collect() }
    } finally {
      new scala.reflect.io.Directory(new java.io.File(store2)).deleteRecursively()
    }
    spark.stop()
  }
}

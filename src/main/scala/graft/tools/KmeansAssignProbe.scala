package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** k-means assignment-path crossover measurement (VERDICT r15 #8): the
  * r15 broadcast-join path triggers above `LiteralAssignMaxK = 64`;
  * this measures BOTH paths at k = 16/32/64 (the literal path refuses
  * above the knob — codegen size grows with k·dim by design) and the
  * join path alone at 128/256, on the sf0.1 embeddings. Warm best-of-2
  * per cell (the TpchTimer A/B scale — compare cells RELATIVELY, never
  * against bench rows).
  *
  * Usage: `runMain graft.tools.KmeansAssignProbe [sfDir]`. Numbers land
  * in DESIGN.md next to the LiteralAssignMaxK knob.
  */
object KmeansAssignProbe {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("kmeans-assign-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
      .select("vec_id", "embedding").cache()
    val n = vecs.count()
    println(s"[kmeans-probe] corpus: $n vectors @ $dir")

    def time(body: => Unit): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }

    // one warm pass per shape so janino compile cost is excluded
    graft.operators.Dedup.kmeansMicroAssign(vecs, 8, 1, assignVia = "literal").count()
    graft.operators.Dedup.kmeansMicroAssign(vecs, 8, 1, assignVia = "join").count()

    for (k <- Seq(16, 32, 64, 128, 256); via <- Seq("literal", "join")) {
      if (via == "join" || k <= graft.operators.Dedup.LiteralAssignMaxK) {
        val t = math.min(
          time(graft.operators.Dedup.kmeansMicroAssign(vecs, k, lloydIters = 2, assignVia = via).count()),
          time(graft.operators.Dedup.kmeansMicroAssign(vecs, k, lloydIters = 2, assignVia = via).count()))
        println(f"[kmeans-probe] k=$k%4d via=$via%-8s best2=$t%6.2f s")
      }
    }
    spark.stop()
  }
}

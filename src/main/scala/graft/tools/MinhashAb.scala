package graft.tools

import org.apache.spark.sql.SparkSession

/** Warm best-of-3 A/B cell for dedup_minhash (and the sig-filtered ngram
  * twin) — run identically in the r13 worktree and the r14 tree.
  */
object MinhashAb {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .appName("minhash-ab")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def best3(label: String)(body: => Long): Unit = {
      body // warm
      val walls = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
      }
      println(f"AB $label%-16s best=${walls.min}%.2f s  runs=${walls.map(w => f"$w%.2f").mkString(",")}")
    }
    best3("dedup_minhash") { graft.operators.Dedup.minhashNearDups(spark, dir).count() }
    best3("dedup_ngram") { graft.operators.Dedup.ngramNearDups(spark, dir).count() }
    spark.stop()
  }
}

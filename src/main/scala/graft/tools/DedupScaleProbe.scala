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

    var k = 1
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
      println(f"[probe] n=$n%7d (x$k) blocks=$blocks exact_grid=${exact}%7.2fs lsh=${lsh}%6.2fs")
      vecs.unpersist()
      k *= 2
    }
    spark.stop()
  }
}

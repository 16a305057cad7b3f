package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off: components wall vs checkpoint cadence. */
object CompProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(body: => Any): Unit = {
      val t0 = System.nanoTime(); body
      println(f"$label%-24s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    graft.operators.Graph.components(spark, dir).count() // warm
    for (ce <- Seq(1, 2, 4))
      time(s"components ce=$ce")(
        graft.operators.Graph.components(spark, dir, checkpointEvery = ce).count())
    spark.stop()
  }
}

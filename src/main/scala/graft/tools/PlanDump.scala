package graft.tools

import org.apache.spark.sql.SparkSession

/** Dumps formatted physical plans of selected catalog queries for
  * scale-review (pushdown, broadcast, shuffle count).
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val names = if (args.length > 1) args.drop(1).toSeq
      else Seq("f1_partition_monthly", "q3_join_agg", "q1_agg", "text_quality", "dedup_minhash")
    names.foreach { n =>
      println(s"\n########## $n ##########")
      println(graft.SparkEntry.queries(n)(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

/** One-off timer for the de-hinted TPC-H rows (r13 broadcast-hint sweep). */
object TpchTimer {
  def main(args: Array[String]): Unit = {
    val sf = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .appName("tpch-timer")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val rows = Seq("q3_join_agg", "q5_multi_join", "q8_market_share",
      "q17_small_qty", "q16_supplier_variety", "q7_nation_volume",
      "q9_profit_by_nation", "q10_returned_items", "q14_promo_share",
      "q19_discounted_revenue", "q20_excess_suppliers", "q2_min_cost_supplier",
      "q15_top_supplier", "q18_large_orders", "q21_waiting_supplier",
      "q_ntile_skew", "events_enrich")
    for (q <- rows if graft.SparkEntry.queries.contains(q)) {
      // warm once, then best of 2 timed runs (the bench estimator)
      graft.SparkEntry.queries(q)(spark, sf).collect()
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(q)(spark, sf).collect()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"TIMING $q%-24s ${times.min}%.3f")
    }
    spark.stop()
  }
}

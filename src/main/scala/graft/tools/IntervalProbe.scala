package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Evidence for the native interval join: the same per-user prior-30min
  * density computed by (a) the native sweeping exec and (b) the composed
  * RANGE-frame window twin, outputs asserted identical, walls compared.
  * Numbers land in DESIGN.md.
  */
object IntervalProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(label: String)(body: => Long): Long = {
      val t0 = System.nanoTime()
      val n = body
      println(f"$label%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
      n
    }
    def native() = graft.operators.Relational.rangeJoinNative(spark, dir)
    def windowTwin() = {
      val w = Window.partitionBy("user_id").orderBy(unix_micros(col("ts")))
        .rangeBetween(-1800000000L, -1L)
      graft.operators.Relational.events(spark, dir)
        .select(col("event_id"), col("user_id"), col("ts"))
        .withColumn("n_prior_30min", count(lit(1)).over(w).cast("bigint"))
        .select("event_id", "n_prior_30min")
    }
    // warm both shapes
    native().count(); windowTwin().count()
    time("native sweep")(native().count())
    time("window RANGE twin")(windowTwin().count())
    val a = native().collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = windowTwin().collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    require(a == b, s"outputs differ: ${(a.toSet -- b.toSet).take(5)}")
    println("outputs identical: " + a.size + " rows")

    // the case only a JOIN can serve: emit the matched PAIRS (payload
    // retrieval) — native sweep vs the bucketized explode join
    def nativePairs() = {
      graft.functions.GraftFunctions.register(spark)
      val e = graft.operators.Relational.events(spark, dir)
      val probe = e.select(col("event_id"), col("user_id"), col("ts"))
      val build = e.select(col("event_id").as("b_event_id"),
        col("user_id").as("b_user_id"), col("ts").as("b_ts"))
      val lp = probe.queryExecution.analyzed
      val rp = build.queryExecution.analyzed
      val (lo, ro) = (lp.output, rp.output)
      org.apache.spark.sql.graft.PlanBridge.ofRows(spark,
        graft.plans.IntervalJoinPlan(lp, rp, lo(1), ro(1), lo(2), ro(2),
          lo(0), ro(0), -1800L * 1000000L, -1L))
    }
    def bucketPairs() = {
      val e = graft.operators.Relational.events(spark, dir)
      val w = 1800L * 1000000L
      val bkt = (unix_micros(col("ts")) / w).cast("bigint")
      val probe = e.select(col("event_id"), col("user_id"), col("ts"),
        explode(array(bkt - 1, bkt)).as("bkt"))
      val build = e.select(col("event_id").as("b_event_id"),
        col("user_id").as("b_user_id"), col("ts").as("b_ts"))
        .withColumn("bkt", (unix_micros(col("b_ts")) / w).cast("bigint"))
      probe.join(build,
        probe("user_id") === build("b_user_id") && probe("bkt") === build("bkt") &&
          unix_micros(col("b_ts")) >= unix_micros(col("ts")) - w &&
          unix_micros(col("b_ts")) <= unix_micros(col("ts")) - 1)
    }
    nativePairs().count(); bucketPairs().count()
    val n1 = time("native pairs")(nativePairs().count())
    val n2 = time("bucketized pairs")(bucketPairs().count())
    require(n1 == n2, s"pair counts differ: $n1 vs $n2")
    spark.stop()
  }
}

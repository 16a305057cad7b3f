package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-10 guard probe (VERDICT r9 #7): catches a silent regression of the
  * native `AsOfJoinExec` / `IntervalJoinExec` to a quadratic fallback
  * (BroadcastNestedLoopJoin) by TIME SIGNATURE, complementing PlanSpec's
  * plan-shape assertions.
  *
  * Method: run each native operator on a synthetic keyed-event input at N
  * and 4N users (events-per-user constant, so per-key density is fixed)
  * and fit the scaling exponent `log(t4/t1)/log(4)`. The native merge /
  * sweep execs are O(rows·log rows) in the sort — exponent ≈ 1; a
  * nested-loop fallback is O(rows²) — exponent ≈ 2. The probe prints both
  * walls, the exponent, and a loud GUARD verdict (exponent > 1.6 ⇒
  * suspect fallback), plus a belt-and-braces plan grep. Run on an idle
  * machine; record numbers in the commit message.
  */
object NativeExecGuardProbe {

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .appName("native-exec-guard")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.functions.GraftFunctions.register(spark)

    // synthetic: users × 20 events each, two streams with decorrelated
    // timestamps; scaling N scales USERS, the shape a bigger corpus has
    def events(users: Int, salt: Long): DataFrame =
      spark.range(users.toLong * 20).select(
        (col("id") % users).as("user_id"),
        col("id").as("event_id"),
        ((col("id") * 2654435761L + salt) % 86400000000L).as("ts_us"))

    def asofDf(users: Int): DataFrame = {
      val l = events(users, 1L)
      val r = events(users, 7L).select(col("user_id").as("r_user_id"),
        col("event_id").as("r_event_id"), col("ts_us").as("r_ts_us"))
      val lp = l.queryExecution.analyzed
      val rp = r.queryExecution.analyzed
      val (lo, ro) = (lp.output, rp.output)
      org.apache.spark.sql.graft.PlanBridge.ofRows(spark,
        graft.plans.AsOfJoinPlan(lp, rp,
          leftKey = lo(0), rightKey = ro(0),
          leftTime = lo(2), rightTime = ro(2),
          leftTie = lo(1), rightTie = ro(1)))
    }

    def intervalDf(users: Int): DataFrame = {
      val l = events(users, 1L)
      val r = events(users, 7L).select(col("user_id").as("r_user_id"),
        col("event_id").as("r_event_id"), col("ts_us").as("r_ts_us"))
      val lp = l.queryExecution.analyzed
      val rp = r.queryExecution.analyzed
      val (lo, ro) = (lp.output, rp.output)
      org.apache.spark.sql.graft.PlanBridge.ofRows(spark,
        graft.plans.IntervalJoinPlan(lp, rp,
          leftKey = lo(0), rightKey = ro(0),
          leftTime = lo(2), rightTime = ro(2),
          leftTie = lo(1), rightTie = ro(1),
          lowDeltaUs = -1800L * 1000000L, highDeltaUs = -1L))
    }

    def time(body: => Long): Double = {
      val t0 = System.nanoTime(); body; (System.nanoTime() - t0) / 1e9
    }
    def best2(body: => Long): Double = math.min(time(body), time(body))

    def guard(name: String, df: Int => DataFrame): Unit = {
      val plan = df(100).queryExecution.executedPlan.toString
      val planOk = plan.contains(name)
      df(1000).count() // warm codegen
      val t1 = best2(df(50000).count())
      val t4 = best2(df(200000).count())
      val exponent = math.log(t4 / t1) / math.log(4.0)
      val verdict = if (exponent > 1.6 || !planOk) "SUSPECT-FALLBACK" else "OK"
      println(f"GUARD $name%-14s planHasNative=$planOk t(N)=$t1%.2fs t(4N)=$t4%.2fs exponent=$exponent%.2f -> $verdict")
    }

    guard("AsOfJoin", asofDf)
    guard("IntervalJoin", intervalDf)
    spark.stop()
  }
}

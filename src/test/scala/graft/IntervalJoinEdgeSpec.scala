package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

/** r15 plans deep-read regression: the native interval join's window
  * tests must be DIFFERENCE comparisons. The shifted-bound form
  * (`rTime <= time + hi`) overflows for unbounded-style deltas —
  * `hi = Long.MaxValue` wrapped negative and silently matched NOTHING.
  */
class IntervalJoinEdgeSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def run(lowUs: Long, highUs: Long): Seq[(Long, Long)] = {
    graft.functions.GraftFunctions.register(spark) // inject IntervalJoinStrategy
    import spark.implicits._
    def ts(m: Int) = Timestamp.valueOf(f"2024-01-01 00:$m%02d:00")
    val l = Seq((1L, 1L, ts(10)), (2L, 1L, ts(30)), (3L, 2L, ts(5)))
      .toDF("event_id", "user_id", "ts")
    val r = Seq((11L, 1L, ts(20)), (12L, 1L, ts(40)), (13L, 2L, ts(50)))
      .toDF("b_event_id", "b_user_id", "b_ts")
    val lp = l.queryExecution.analyzed
    val rp = r.queryExecution.analyzed
    val (lo, ro) = (lp.output, rp.output)
    org.apache.spark.sql.graft.PlanBridge.ofRows(spark,
      graft.plans.IntervalJoinPlan(lp, rp,
        leftKey = lo(1), rightKey = ro(1),
        leftTime = lo(2), rightTime = ro(2),
        leftTie = lo(0), rightTie = ro(0),
        lowDeltaUs = lowUs, highDeltaUs = highUs))
      .select("event_id", "b_event_id")
      .collect().map(x => (x.getLong(0), x.getLong(1))).toSeq.sorted
  }

  test("unbounded-above delta (hi = Long.MaxValue) matches every same-key row at-or-after") {
    // forward-unbounded: every same-user right at-or-after the left
    assert(run(0L, Long.MaxValue) ==
      Seq((1L, 11L), (1L, 12L), (2L, 12L), (3L, 13L)))
  }

  test("unbounded-below delta (lo = Long.MinValue) matches every same-key row at-or-before") {
    assert(run(Long.MinValue, 0L) == Seq((2L, 11L)))
  }

  test("bounded window still selects exactly the in-window rows") {
    // ±15 minutes around each left event
    assert(run(-15L * 60000000L, 15L * 60000000L) ==
      Seq((1L, 11L), (2L, 11L), (2L, 12L)))
  }
}

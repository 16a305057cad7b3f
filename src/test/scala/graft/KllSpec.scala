package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** KLL quantile sketch: estimates must land within the sketch's rank-error
  * envelope of the exact quantiles, and merging partial sketches
  * (repartitioned input) must not change that.
  */
class KllSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private lazy val dir = SparkSpec.testDataDir

  private def exactQuantile(values: Array[Double], rank: Double): Double = {
    val sorted = values.sorted
    sorted(math.min(sorted.length - 1, math.max(0, math.ceil(rank * sorted.length).toInt - 1)))
  }

  test("kll quantiles within rank-error envelope of exact quantiles") {
    graft.functions.GraftFunctions.register(spark)
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val exact = li.select(col("l_quantity").cast("double")).collect().map(_.getDouble(0))
    val est = graft.operators.Relational.sketchQuantiles(spark, dir)
      .select(col("qty_q50"), col("qty_q95"), col("qty_q99"))
      .collect().flatMap(r => Seq(r.getDouble(0), r.getDouble(1), r.getDouble(2)))
    // per-group sketches; check every estimate sits between the exact
    // global rank-eps bounds for SOME rank in {0.5, 0.95, 0.99} of its
    // group — simpler: re-run ungrouped and compare directly
    li.createOrReplaceTempView("kll_li")
    val global = spark.sql(
      "SELECT graft_kll_quantiles(l_quantity, array(0.5D, 0.95D, 0.99D), 200) AS q FROM kll_li")
      .head().getSeq[Double](0)
    val eps = 0.02 // k=200 → ~1.7% rank error at high confidence
    Seq(0.5, 0.95, 0.99).zip(global).foreach { case (r, v) =>
      val lo = exactQuantile(exact, math.max(0.0, r - eps))
      val hi = exactQuantile(exact, math.min(1.0, r + eps))
      assert(v >= lo && v <= hi, s"rank $r: estimate $v outside exact [$lo, $hi]")
    }
    assert(est.nonEmpty)
  }

  test("kll quantiles run inside streaming aggregation (complete mode)") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    graft.functions.GraftFunctions.register(spark)
    val mem = MemoryStream[Double]
    val agg = mem.toDF().toDF("v")
      .agg(expr("graft_kll_quantiles(v, array(0.5D), 200)").as("q"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("stream_kll")
      .trigger(Trigger.ProcessingTime(0)).start()
    mem.addData((1 to 500).map(_.toDouble): _*)
    q.processAllAvailable()
    mem.addData((501 to 1000).map(_.toDouble): _*) // state must carry batch 1
    q.processAllAvailable()
    q.stop()
    val median = spark.table("stream_kll").collect().head.getSeq[Double](0).head
    assert(median >= 480 && median <= 520,
      s"streaming median $median should be ~500 over both batches")
  }

  test("kll estimate is repartition-invariant in distribution (merge path)") {
    graft.functions.GraftFunctions.register(spark)
    val li = spark.read.parquet(s"$dir/lineitem.parquet")
    val exact = li.select(col("l_quantity").cast("double")).collect().map(_.getDouble(0))
    li.repartition(13).createOrReplaceTempView("kll_li13")
    val merged = spark.sql(
      "SELECT graft_kll_quantiles(l_quantity, array(0.5D), 200) AS q FROM kll_li13")
      .head().getSeq[Double](0).head
    val lo = exactQuantile(exact, 0.48)
    val hi = exactQuantile(exact, 0.52)
    assert(merged >= lo && merged <= hi, s"merged median $merged outside [$lo, $hi]")
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series analytics over the events stream (round-10 continuation).
  *
  * Every operator here reduces the raw event stream to the CALENDAR-BOUNDED
  * hourly-counts table first (≤ types × hours rows regardless of event
  * volume — the same bound [[Relational.eventsEwma]] and the streaming
  * monitor lean on), so the per-key windowed passes after the first
  * map-combined exchange never see raw-event cardinality. That is the
  * 100 TB posture: one shuffle proportional to the calendar, not the data.
  *
  * All outputs are exact integers (milli/micro scaling, `div` on
  * non-negative terms only per the build conventions) so the DuckDB
  * oracles match bit-for-bit.
  */
object TimeSeries {

  /** Hourly counts keyed by integer epoch-hour — `unix_micros div 3.6e9`
    * matches DuckDB's `epoch_us(ts) // 3600000000` exactly (timestamps
    * are non-negative here, so `div` == `//`).
    */
  private def hourlyCounts(spark: SparkSession, dir: String): DataFrame =
    Relational.events(spark, dir)
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("hr"))
      .agg(count(lit(1)).as("y"))

  /** AUTOCORRELATION (ACF) of the hourly volume series at lags 1..`maxLag`
    * per event type. Pairs come from an equi-join of the counts table with
    * itself on `(type, hr + lag)` — hours with zero events are simply
    * absent on both engines, so the overlapping-pair set is identical by
    * construction. Pearson r is assembled from bigint moment sums only
    * (the [[Relational.statsCorrelation]] discipline): both engines divide
    * the SAME integers, so the milli-rounded doubles cannot diverge.
    *
    * Scale: the join input is calendar-bounded; the lag fan-out is a
    * 3-row explode. Nothing here grows with event volume.
    */
  def eventsAcf(spark: SparkSession, dir: String, maxLag: Int = 3): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val c = hourlyCounts(spark, dir)
    val lagged = c.select(col("event_type"), col("hr"), col("y"),
        explode(sequence(lit(1), lit(maxLag))).as("lag"))
      .select(col("event_type"), (col("hr") + col("lag")).as("hr"),
        col("lag"), col("y").as("x"))
    val m = lagged.join(c.withColumnRenamed("y", "z"), Seq("event_type", "hr"))
      .groupBy("event_type", "lag")
      .agg(count(lit(1)).as("n"),
        sum("x").as("s_x"), sum("z").as("s_z"),
        sum(col("x") * col("x")).as("s_xx"),
        sum(col("z") * col("z")).as("s_zz"),
        sum(col("x") * col("z")).as("s_xz"))
    m.select(col("event_type"), col("lag").cast("bigint").as("lag"),
      col("n").cast("bigint").as("n_pairs"),
      expr("CASE WHEN n * s_xx - s_x * s_x > 0 AND n * s_zz - s_z * s_z > 0 " +
        "THEN CAST(round(1000.0 * (n * s_xz - s_x * s_z) / " +
        "(sqrt(CAST(n * s_xx - s_x * s_x AS DOUBLE)) * " +
        "sqrt(CAST(n * s_zz - s_z * s_z AS DOUBLE)))) AS BIGINT) END").as("r_milli"))
  }

  /** CUSUM CHANGEPOINT per event type: with prefix sums `P_t` over the
    * ordered hourly series, the deviation statistic is kept as the exact
    * integer `S_t = n·P_t − t·total` (the cumulative deviation from the
    * mean scaled by n — no division, no floats). The changepoint is the
    * earliest position attaining the maximum |S_t|; both engines resolve
    * the argmax with the identical `(|S| DESC, t ASC)` window rank.
    *
    * Scale: the window partitions are calendar-bounded per type; the raw
    * stream is reduced map-side before the only exchange.
    */
  def eventsCusum(spark: SparkSession, dir: String): DataFrame = {
    val c = hourlyCounts(spark, dir)
    val byHr = Window.partitionBy("event_type").orderBy("hr")
    val all = Window.partitionBy("event_type")
    val s = c
      .withColumn("t", row_number().over(byHr).cast("bigint"))
      .withColumn("prefix", sum("y").over(byHr.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("n_hours", count(lit(1)).over(all))
      .withColumn("total", sum("y").over(all))
      .withColumn("s", col("n_hours") * col("prefix") - col("t") * col("total"))
    s.withColumn("rk",
        row_number().over(Window.partitionBy("event_type").orderBy(abs(col("s")).desc, col("t").asc)))
      .filter(col("rk") === 1)
      .select(col("event_type"), col("n_hours").cast("bigint").as("n_hours"),
        col("total").cast("bigint").as("total"),
        col("t").as("cp_t"), col("hr").as("cp_hr"),
        col("s").as("s_at_cp"), abs(col("s")).as("abs_s"))
  }

  /** SEASONALITY PROFILE: hour-of-day (UTC, `hr mod 24` on the integer
    * epoch-hour — identical arithmetic both engines) volume profile per
    * type over OBSERVED hours, with the peak slot flagged via a
    * deterministic `(total DESC, hod ASC)` rank. `mean_milli` is
    * `1000·total div n_hours` — non-negative integers, `div` == `//`.
    */
  def eventsSeasonality(spark: SparkSession, dir: String): DataFrame = {
    val c = hourlyCounts(spark, dir)
    val prof = c.groupBy(col("event_type"), expr("hr % 24").as("hod"))
      .agg(count(lit(1)).as("n_hours"), sum("y").as("total"))
    prof.withColumn("rk",
        row_number().over(Window.partitionBy("event_type").orderBy(col("total").desc, col("hod").asc)))
      .select(col("event_type"), col("hod").cast("bigint").as("hod"),
        col("n_hours").cast("bigint").as("n_hours"),
        col("total").cast("bigint").as("total"),
        expr("1000 * total div n_hours").as("mean_milli"),
        (col("rk") === 1).as("is_peak"))
  }

  /** OHLC CANDLES per (type, hour): open/close are the value (in exact
    * cents) of the first/last event under the TOTAL order `(ts, event_id)`
    * — `event_id` breaks equal-timestamp ties identically on both engines,
    * so first/last are well-defined even with duplicate timestamps. One
    * exchange on the group key; the two row_number passes share its sort.
    */
  def eventsOhlc(spark: SparkSession, dir: String): DataFrame = {
    val e = Relational.events(spark, dir)
      .select(col("event_type"), expr("unix_micros(ts) div 3600000000").as("hr"),
        col("ts"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val asc = Window.partitionBy("event_type", "hr").orderBy(col("ts").asc, col("event_id").asc)
    val desc = Window.partitionBy("event_type", "hr").orderBy(col("ts").desc, col("event_id").desc)
    e.withColumn("rn_a", row_number().over(asc))
      .withColumn("rn_d", row_number().over(desc))
      .groupBy("event_type", "hr")
      .agg(count(lit(1)).as("volume"),
        max(when(col("rn_a") === 1, col("cents"))).as("open_cents"),
        max("cents").as("high_cents"),
        min("cents").as("low_cents"),
        max(when(col("rn_d") === 1, col("cents"))).as("close_cents"),
        sum("cents").as("total_cents"))
  }

  /** SEASONAL DECOMPOSITION (round-10 continuation) — the classical
    * additive `y = trend + seasonal + residual` split over the hourly
    * series: trend is the centered 5-hour rolling mean, the seasonal
    * component is the hour-of-day mean of the detrended series, and the
    * residual is what remains — the decomposition every anomaly monitor
    * runs before alerting so a nightly dip stops paging anyone.
    *
    * Exact-integer discipline: everything is milli-scaled;
    * `trend_milli = 1000·Σframe div cnt` divides non-negative terms, and
    * the seasonal mean — whose numerator CAN be negative — is computed
    * through the `+n·B` shift (`(Σd + n·B) div n − B`, B = 10⁹) so the
    * one integer division both engines execute still sees a non-negative
    * numerator (the build convention: truncation vs floor never gets a
    * chance to disagree).
    *
    * Scale: calendar-bounded windows after the map-combined hourly
    * reduction; the seasonal means are a ≤ types×24-row aggregate that
    * broadcasts back; nothing scales with raw event volume.
    */
  def eventsDecompose(spark: SparkSession, dir: String): DataFrame = {
    val c = hourlyCounts(spark, dir)
    val frame = Window.partitionBy("event_type").orderBy("hr").rowsBetween(-2, 2)
    val withTrend = c
      .withColumn("s_frame", sum("y").over(frame))
      .withColumn("n_frame", count(lit(1)).over(frame))
      .withColumn("trend_milli", expr("1000 * s_frame div n_frame"))
      .withColumn("d_milli", expr("1000 * y - trend_milli"))
    val seas = withTrend
      .groupBy(col("event_type"), expr("hr % 24").as("hod"))
      .agg(count(lit(1)).as("n"), sum("d_milli").as("sd"))
      .select(col("event_type"), col("hod"),
        expr("(sd + n * 1000000000L) div n - 1000000000L").as("seasonal_milli"))
    withTrend
      .withColumn("hod", expr("hr % 24"))
      .join(broadcast(seas), Seq("event_type", "hod"))
      .select(col("event_type"), col("hr"), col("y").cast("bigint").as("y"),
        col("trend_milli"), col("seasonal_milli"),
        (col("d_milli") - col("seasonal_milli")).as("residual_milli"))
  }

  /** ROLLING MEDIAN (5-hour trailing frame) of hourly volume per type.
    * Counts are milli-scaled BEFORE the median so the even-frame midpoint
    * average `(a+b)/2` lands on an exact multiple of 500 — Spark takes
    * `(a+b) div 2` on the sorted frame array, DuckDB's interpolating
    * `median()` produces the identical value as an exact double. The frame
    * is 5 rows, so the per-row sorted array is O(1); the partition is
    * calendar-bounded.
    */
  def eventsRollingMedian(spark: SparkSession, dir: String): DataFrame = {
    val c = hourlyCounts(spark, dir).withColumn("m", col("y") * 1000)
    val w = Window.partitionBy("event_type").orderBy("hr").rowsBetween(-4, 0)
    c.withColumn("arr", sort_array(collect_list("m").over(w)))
      .select(col("event_type"), col("hr"), col("y").cast("bigint").as("y"),
        expr("CASE WHEN size(arr) % 2 = 1 THEN element_at(arr, CAST((size(arr) + 1) div 2 AS INT)) " +
          "ELSE (element_at(arr, CAST(size(arr) div 2 AS INT)) + element_at(arr, CAST(size(arr) div 2 + 1 AS INT))) div 2 END")
          .as("med_milli"))
  }
}

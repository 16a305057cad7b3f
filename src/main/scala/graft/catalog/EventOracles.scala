package graft.catalog

/** DuckDB oracle SQL for the event-series, time-series and streaming-twin query family —
  * split out of [[graft.SparkEntry]] (round 11) so the catalog stays
  * reviewable as it grows. Keys map 1:1 to `SparkEntry.queries`;
  * bodies are byte-identical to the pre-split map (CatalogDump-diffed).
  */
private[graft] object EventOracles {

  /** Shared by `events_asof_purchase` and its time-chunked skew twin. */
  private val AsofOracle: String =
    """SELECT event_id, user_id, ts,
      | max(CASE WHEN event_type = 'purchase' THEN ts END)
      |  OVER (PARTITION BY user_id ORDER BY ts, event_id
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_purchase_ts
      |FROM events""".stripMargin


  /** Shared by `events_funnel` and its time-chunked skew-safe twin. */
  private val FunnelOracle: String =
    """WITH x AS (
      | SELECT user_id, event_id, ts, event_type,
      |  min(CASE WHEN event_type = 'click' THEN ts END)
      |   OVER (PARTITION BY user_id ORDER BY ts, event_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS fc
      | FROM events),
      |agg AS (
      | SELECT user_id,
      |  min(CASE WHEN event_type = 'click' THEN ts END) AS first_click_ts,
      |  min(CASE WHEN event_type = 'purchase' AND fc IS NOT NULL THEN ts END)
      |   AS first_conversion_ts
      | FROM x GROUP BY user_id)
      |SELECT user_id, first_click_ts, first_conversion_ts,
      | first_conversion_ts IS NOT NULL AS converted,
      | CASE WHEN first_conversion_ts IS NOT NULL
      |  THEN CAST(epoch_us(first_conversion_ts) - epoch_us(first_click_ts) AS BIGINT)
      | END AS conversion_us
      |FROM agg""".stripMargin


  private val base: Map[String, String] = Map(
    "events_hourly_agg" ->
      """SELECT date_trunc('hour', ts) AS hour, event_type, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events GROUP BY 1, 2""".stripMargin,
    "events_sessionize" ->
      """WITH x AS (
        | SELECT user_id, ts, event_id,
        |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        | FROM events),
        |y AS (
        | SELECT user_id, ts, event_id,
        |  CASE WHEN prev_ts IS NULL THEN 1
        |       WHEN epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1
        |       ELSE 0 END AS new_session
        | FROM x),
        |z AS (
        | SELECT user_id, ts,
        |  sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_seq
        | FROM y)
        |SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
        | CAST(count(*) AS BIGINT) AS n_events,
        | min(ts) AS session_start, max(ts) AS session_end
        |FROM z GROUP BY user_id, session_seq""".stripMargin,
    // native session_window semantics: merge while gap <= 30 min (probed:
    // an event exactly gap-after MERGES), session_end = last event + gap
    "events_session_window" ->
      """WITH x AS (
        | SELECT user_id, ts,
        |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
        | FROM events),
        |y AS (
        | SELECT user_id, ts,
        |  CASE WHEN prev_ts IS NULL THEN 1
        |       WHEN epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1
        |       ELSE 0 END AS new_session
        | FROM x),
        |z AS (
        | SELECT user_id, ts,
        |  sum(new_session) OVER (PARTITION BY user_id ORDER BY ts ROWS UNBOUNDED PRECEDING) AS session_seq
        | FROM y)
        |SELECT user_id,
        | min(ts) AS session_start,
        | max(ts) + INTERVAL 30 MINUTE AS session_end,
        | CAST(count(*) AS BIGINT) AS n_events
        |FROM z GROUP BY user_id, session_seq""".stripMargin,
    "events_json_extract" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS n,
        | CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        | CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS max_k
        |FROM events GROUP BY event_type""".stripMargin,
    "events_asof_purchase" -> AsofOracle,
    // row-for-row semantics of the native as-of exec: first purchase with
    // (ts, event_id) at-or-after the click's, per user, LEFT OUTER
    "events_asof_native" ->
      """SELECT c.event_id, c.user_id, c.ts, p.purchase_id, p.purchase_ts
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
        |LEFT JOIN LATERAL (
        | SELECT event_id AS purchase_id, ts AS purchase_ts FROM events p
        | WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
        |  AND (p.ts > c.ts OR (p.ts = c.ts AND p.event_id >= c.event_id))
        | ORDER BY p.ts, p.event_id LIMIT 1) p ON TRUE""".stripMargin,
    "events_asof_native_backward" ->
      """SELECT c.event_id, c.user_id, c.ts, p.purchase_id, p.purchase_ts
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
        |LEFT JOIN LATERAL (
        | SELECT event_id AS purchase_id, ts AS purchase_ts FROM events p
        | WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
        |  AND (p.ts < c.ts OR (p.ts = c.ts AND p.event_id <= c.event_id))
        | ORDER BY p.ts DESC, p.event_id DESC LIMIT 1) p ON TRUE""".stripMargin,
    // the at-or-after match must also land within the 1-hour tolerance
    "events_asof_tolerance" ->
      """SELECT c.event_id, c.user_id, c.ts, p.purchase_id, p.purchase_ts
        |FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
        |LEFT JOIN LATERAL (
        | SELECT event_id AS purchase_id, ts AS purchase_ts FROM events p
        | WHERE p.user_id = c.user_id AND p.event_type = 'purchase'
        |  AND (p.ts > c.ts OR (p.ts = c.ts AND p.event_id >= c.event_id))
        |  AND p.ts <= c.ts + INTERVAL 1 HOUR
        | ORDER BY p.ts, p.event_id LIMIT 1) p ON TRUE""".stripMargin,
    "events_asof_purchase_skew" -> AsofOracle,
    // last-touch attribution: per purchase, the last click at-or-before by
    // (ts, event_id) of the same HOT-COLLAPSED user (user_id%16==0 -> -1),
    // mirroring the Spark side's deterministic skew synthesis
    "events_attribution_lasttouch" ->
      """WITH e AS (
        | SELECT event_id, ts, event_type,
        |  CASE WHEN user_id % 16 = 0 THEN -1 ELSE user_id END AS uid
        | FROM events)
        |SELECT p.event_id AS purchase_id, p.uid AS user_id, p.ts AS purchase_ts,
        | c.click_id, c.click_ts
        |FROM (SELECT * FROM e WHERE event_type = 'purchase') p
        |LEFT JOIN LATERAL (
        | SELECT event_id AS click_id, ts AS click_ts FROM e c
        | WHERE c.event_type = 'click' AND c.uid = p.uid
        |  AND (c.ts < p.ts OR (c.ts = p.ts AND c.event_id <= p.event_id))
        | ORDER BY c.ts DESC, c.event_id DESC LIMIT 1) c ON TRUE""".stripMargin,
    "events_retention" ->
      """WITH w AS (
        | SELECT user_id, epoch_us(ts) // CAST(604800000000 AS BIGINT) AS week
        | FROM events),
        |pu AS (SELECT user_id, min(week) AS cohort_week FROM w GROUP BY user_id),
        |act AS (
        | SELECT pu.cohort_week, dw.week - pu.cohort_week AS week_offset,
        |  CAST(count(*) AS BIGINT) AS n_active_users
        | FROM (SELECT DISTINCT user_id, week FROM w) dw JOIN pu USING (user_id)
        | GROUP BY 1, 2)
        |SELECT a.cohort_week, a.week_offset, a.n_active_users,
        | c.n_active_users AS cohort_size
        |FROM act a JOIN act c
        | ON a.cohort_week = c.cohort_week AND c.week_offset = 0""".stripMargin,
    // the 3-step funnel replayed as two LATERAL first-at-or-after probes
    // with the exec's (ts, event_id) lexicographic rule
    "events_funnel3_native" ->
      """WITH fv AS (
        | SELECT user_id, ts AS view_ts, event_id AS view_id FROM (
        |  SELECT user_id, ts, event_id,
        |   row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        |  FROM events WHERE event_type = 'view') WHERE rn = 1),
        |c AS (
        | SELECT fv.*, cl.ts AS click_ts, cl.event_id AS click_id
        | FROM fv LEFT JOIN LATERAL (
        |  SELECT ts, event_id FROM events e
        |  WHERE e.user_id = fv.user_id AND e.event_type = 'click'
        |   AND (e.ts > fv.view_ts OR (e.ts = fv.view_ts AND e.event_id >= fv.view_id))
        |  ORDER BY e.ts, e.event_id LIMIT 1) cl ON TRUE),
        |p AS (
        | SELECT c.*, pu.ts AS purchase_ts
        | FROM c LEFT JOIN LATERAL (
        |  SELECT ts FROM events e
        |  WHERE c.click_ts IS NOT NULL AND e.user_id = c.user_id AND e.event_type = 'purchase'
        |   AND (e.ts > c.click_ts OR (e.ts = c.click_ts AND e.event_id >= c.click_id))
        |  ORDER BY e.ts, e.event_id LIMIT 1) pu ON TRUE)
        |SELECT user_id, view_ts, click_ts, purchase_ts,
        | purchase_ts IS NOT NULL AS completed,
        | CASE WHEN purchase_ts IS NOT NULL
        |  THEN CAST(epoch_us(purchase_ts) - epoch_us(view_ts) AS BIGINT) END AS funnel_us
        |FROM p""".stripMargin,
    "events_top_paths" ->
      """WITH x AS (
        | SELECT user_id, ts, event_id, event_type,
        |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        | FROM events),
        |y AS (
        | SELECT user_id, ts, event_id, event_type,
        |  CASE WHEN prev_ts IS NULL
        |       OR epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1
        |       ELSE 0 END AS new_session
        | FROM x),
        |z AS (
        | SELECT user_id, ts, event_id, event_type,
        |  sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_seq
        | FROM y),
        |paths AS (
        | SELECT array_to_string(
        |   list_transform(
        |     (list({'et': event_type} ORDER BY ts, event_id))[1:8],
        |     e -> e.et), '>') AS path,
        |  count(*) > 8 AS truncated
        | FROM z GROUP BY user_id, session_seq)
        |SELECT path, truncated, count(*) AS n_sessions
        |FROM paths GROUP BY path, truncated
        |ORDER BY n_sessions DESC, path, truncated LIMIT 20""".stripMargin,
    "events_range_join_native" ->
      """SELECT a.event_id,
        | CAST(count(b.event_id) AS BIGINT) AS n_prior_30min
        |FROM events a LEFT JOIN events b
        | ON a.user_id = b.user_id
        | AND epoch_us(b.ts) >= epoch_us(a.ts) - 1800000000
        | AND epoch_us(b.ts) <= epoch_us(a.ts) - 1
        |GROUP BY a.event_id""".stripMargin,
    "events_concurrency" ->
      """WITH x AS (
        | SELECT user_id, ts, event_id,
        |  lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        | FROM events),
        |y AS (
        | SELECT user_id, ts, event_id,
        |  CASE WHEN prev_ts IS NULL THEN 1
        |       WHEN epoch_us(ts) - epoch_us(prev_ts) > 1800000000 THEN 1
        |       ELSE 0 END AS new_session
        | FROM x),
        |z AS (
        | SELECT user_id, ts,
        |  sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS session_seq
        | FROM y),
        |sess AS (
        | SELECT min(ts) AS session_start, max(ts) AS session_end
        | FROM z GROUP BY user_id, session_seq),
        |deltas AS (
        | SELECT session_start AS ts, 1 AS delta FROM sess
        | UNION ALL
        | SELECT session_end AS ts, -1 AS delta FROM sess),
        |runs AS (
        | SELECT ts, sum(delta) OVER (ORDER BY ts, delta DESC ROWS UNBOUNDED PRECEDING) AS run
        | FROM deltas)
        |SELECT date_trunc('hour', ts) AS hour,
        | CAST(max(run) AS BIGINT) AS peak_concurrency
        |FROM runs GROUP BY 1""".stripMargin,
    "events_twap" ->
      """WITH x AS (
        | SELECT user_id, ts, event_id,
        |  CAST(round(value * 100) AS BIGINT) AS cents,
        |  lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_ts
        | FROM events),
        |a AS (
        | SELECT user_id,
        |  CAST(sum(CASE WHEN next_ts IS NOT NULL
        |   THEN cents * (epoch_us(next_ts) - epoch_us(ts)) ELSE 0 END) AS BIGINT) AS weighted,
        |  CAST(sum(COALESCE(epoch_us(next_ts) - epoch_us(ts), 0)) AS BIGINT) AS span_us,
        |  count(*) AS n_events
        | FROM x GROUP BY user_id)
        |SELECT user_id, weighted // span_us AS twap_cents, span_us, n_events
        |FROM a WHERE span_us > 0""".stripMargin,
    "events_attribution_linear" ->
      """WITH p AS (
        | SELECT event_id AS purchase_id, user_id, ts AS pts
        | FROM events WHERE event_type = 'purchase'),
        |c AS (
        | SELECT event_id AS click_id, user_id AS cuser, ts AS cts
        | FROM events WHERE event_type = 'click'),
        |pairs AS (
        | SELECT purchase_id, cuser, click_id, cts
        | FROM p JOIN c ON p.user_id = c.cuser
        |  AND c.cts <= p.pts AND c.cts > p.pts - INTERVAL 7 DAY),
        |w AS (
        | SELECT *,
        |  count(*) OVER (PARTITION BY purchase_id) AS n,
        |  row_number() OVER (PARTITION BY purchase_id ORDER BY cts, click_id) AS rk
        | FROM pairs),
        |credits AS (
        | SELECT cuser AS user_id, click_id,
        |  CASE WHEN rk = n THEN 1000000 - (1000000 // n) * (n - 1)
        |   ELSE 1000000 // n END AS credit_micro
        | FROM w)
        |SELECT user_id, click_id, CAST(sum(credit_micro) AS BIGINT) AS credit_micro,
        | count(*) AS n_purchases
        |FROM credits GROUP BY user_id, click_id""".stripMargin,
    "events_gapfill" ->
      """WITH counts AS (
        | SELECT event_type, date_trunc('hour', ts) AS hour, CAST(count(*) AS BIGINT) AS n
        | FROM events GROUP BY 1, 2),
        |b AS (
        | SELECT date_trunc('hour', min(ts)) AS h0, date_trunc('hour', max(ts)) AS h1
        | FROM events),
        |grid AS (
        | SELECT t.event_type, unnest(generate_series(b.h0, b.h1, INTERVAL 1 HOUR)) AS hour
        | FROM (SELECT DISTINCT event_type FROM counts) t, b),
        |g AS (
        | SELECT grid.event_type, grid.hour, counts.n
        | FROM grid LEFT JOIN counts
        |  ON grid.event_type = counts.event_type AND grid.hour = counts.hour),
        |wnd AS (
        | SELECT event_type, hour, n,
        |  last_value(n IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY hour
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_n,
        |  last_value(CASE WHEN n IS NOT NULL THEN hour END IGNORE NULLS)
        |   OVER (PARTITION BY event_type ORDER BY hour
        |   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_h,
        |  first_value(n IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY hour
        |   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_n,
        |  first_value(CASE WHEN n IS NOT NULL THEN hour END IGNORE NULLS)
        |   OVER (PARTITION BY event_type ORDER BY hour
        |   ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_h
        | FROM g)
        |SELECT event_type, hour, n AS n_raw,
        | CAST(CASE WHEN n IS NOT NULL THEN n
        |  WHEN prev_n IS NULL THEN next_n
        |  WHEN next_n IS NULL THEN prev_n
        |  ELSE (prev_n * (((epoch_us(next_h) - epoch_us(prev_h)) // 3600000000)
        |          - ((epoch_us(hour) - epoch_us(prev_h)) // 3600000000))
        |      + next_n * ((epoch_us(hour) - epoch_us(prev_h)) // 3600000000))
        |     // ((epoch_us(next_h) - epoch_us(prev_h)) // 3600000000)
        |  END AS BIGINT) AS n_filled,
        | n IS NULL AS filled
        |FROM wnd""".stripMargin,
    "events_compact_latest" ->
      """SELECT user_id, event_id AS last_event_id, ts AS last_ts,
        | event_type AS current_type, CAST(n AS BIGINT) AS n_events
        |FROM (
        | SELECT *, count(*) OVER (PARTITION BY user_id) AS n,
        |  row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        | FROM events)
        |WHERE rn = 1""".stripMargin,
    "events_scd2" ->
      """WITH x AS (
        | SELECT user_id, ts, event_id, event_type,
        |  lag(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
        | FROM events),
        |y AS (
        | SELECT user_id, ts, event_id, event_type,
        |  CASE WHEN prev_type IS NULL OR prev_type <> event_type THEN 1 ELSE 0 END AS chg
        | FROM x),
        |z AS (
        | SELECT user_id, ts, event_type,
        |  sum(chg) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS version
        | FROM y),
        |isl AS (
        | SELECT user_id, version, event_type,
        |  min(ts) AS valid_from, count(*) AS n_events
        | FROM z GROUP BY user_id, version, event_type)
        |SELECT user_id, CAST(version AS BIGINT) AS version, event_type,
        | valid_from,
        | lead(valid_from) OVER (PARTITION BY user_id ORDER BY version) AS valid_to,
        | CAST(n_events AS BIGINT) AS n_events
        |FROM isl""".stripMargin,
    // sequential integer fold — DuckDB's list_reduce seeds from the first
    // element, matching the Spark sentinel branch; non-negative terms so
    // div == //
    "events_ewma" ->
      """WITH c AS (
        | SELECT event_type, date_trunc('hour', ts) AS hour, CAST(count(*) AS BIGINT) AS y
        | FROM events GROUP BY 1, 2),
        |s AS (SELECT event_type, list(y ORDER BY hour) AS ys FROM c GROUP BY event_type)
        |SELECT event_type, CAST(len(ys) AS BIGINT) AS n_hours,
        | CAST(list_reduce(ys, (acc, y) -> (3 * acc + y) // 4) AS BIGINT) AS ewma_last,
        | ys[-1] AS last_hour_count,
        | CAST(list_sum(ys) AS BIGINT) AS total
        |FROM s""".stripMargin,
    "events_markov" ->
      """WITH p AS (
        | SELECT event_type AS prev_type,
        |  lead(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
        | FROM events),
        |c AS (
        | SELECT prev_type, next_type, CAST(count(*) AS BIGINT) AS n
        | FROM p WHERE next_type IS NOT NULL GROUP BY 1, 2)
        |SELECT prev_type, next_type, n,
        | CAST(n * 1000 // sum(n) OVER (PARTITION BY prev_type) AS BIGINT) AS p_permille
        |FROM c""".stripMargin,
    // lower medians selected by rank over the same deterministic
    // (value, hour) order — integer arithmetic end to end
    "events_anomaly_mad" ->
      """WITH hc AS (
        | SELECT event_type, date_trunc('hour', ts) AS hour, CAST(count(*) AS BIGINT) AS n
        | FROM events GROUP BY 1, 2),
        |m AS (
        | SELECT *, row_number() OVER (PARTITION BY event_type ORDER BY n, hour) AS rn,
        |  count(*) OVER (PARTITION BY event_type) AS n_hours
        | FROM hc),
        |med AS (
        | SELECT *, min(CASE WHEN rn * 2 >= n_hours THEN n END)
        |   OVER (PARTITION BY event_type) AS med
        | FROM m),
        |d AS (
        | SELECT *, abs(n - med) AS dev,
        |  row_number() OVER (PARTITION BY event_type ORDER BY abs(n - med), hour) AS rn2
        | FROM med),
        |mad AS (
        | SELECT *, min(CASE WHEN rn2 * 2 >= n_hours THEN dev END)
        |   OVER (PARTITION BY event_type) AS mad
        | FROM d)
        |SELECT event_type, hour, n, med, mad, dev > mad * 3 AS is_anomaly
        |FROM mad""".stripMargin,
    "events_funnel" -> FunnelOracle,
    "events_funnel_skew" -> FunnelOracle,
    "events_funnel_native" -> FunnelOracle,
    "events_interval_left_join" ->
      """SELECT c.user_id, c.event_id AS click_id, p.event_id AS purchase_id,
        | c.ts AS c_ts, p.ts AS p_ts
        |FROM events c LEFT JOIN events p
        | ON c.user_id = p.user_id AND p.event_type = 'purchase'
        | AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 1 HOUR
        |WHERE c.event_type = 'click'""".stripMargin,
    "events_range_join" ->
      """SELECT e1.event_id, CAST(count(e2.event_id) AS BIGINT) AS n_prior_5min
        |FROM events e1 LEFT JOIN events e2
        | ON e2.ts >= e1.ts - INTERVAL 5 MINUTE AND e2.ts < e1.ts
        |GROUP BY e1.event_id""".stripMargin,
    "events_salted_join" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_events,
        | CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        |FROM events JOIN customer ON user_id = c_custkey
        |GROUP BY c_mktsegment""".stripMargin,
  )

  /** Skew-safe / derived twins share their plain twin's oracle
    * verbatim — a green row proves the rewrite changed the plan,
    * not the answer.
    */
  val sql: Map[String, String] = base ++ Map(
    "events_sessionize_skew" -> base("events_sessionize"),
    // r10 continuation: time-series family — all from the calendar-bounded
    // hourly-counts table, exact integer moments / window arithmetic
    "events_acf" ->
      """WITH c AS (
        | SELECT event_type, epoch_us(ts) // 3600000000 AS hr, CAST(count(*) AS BIGINT) AS y
        | FROM events GROUP BY 1, 2),
        |p AS (
        | SELECT a.event_type, l.lag, a.y AS x, b.y AS z
        | FROM c a, (VALUES (1), (2), (3)) l(lag)
        | JOIN c b ON b.event_type = a.event_type AND b.hr = a.hr + l.lag),
        |m AS (
        | SELECT event_type, lag, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(x) AS BIGINT) AS s_x, CAST(sum(z) AS BIGINT) AS s_z,
        |  CAST(sum(x * x) AS BIGINT) AS s_xx, CAST(sum(z * z) AS BIGINT) AS s_zz,
        |  CAST(sum(x * z) AS BIGINT) AS s_xz
        | FROM p GROUP BY 1, 2)
        |SELECT event_type, CAST(lag AS BIGINT) AS lag, n AS n_pairs,
        | CASE WHEN n * s_xx - s_x * s_x > 0 AND n * s_zz - s_z * s_z > 0
        |  THEN CAST(round(1000.0 * (n * s_xz - s_x * s_z) /
        |   (sqrt(CAST(n * s_xx - s_x * s_x AS DOUBLE)) *
        |    sqrt(CAST(n * s_zz - s_z * s_z AS DOUBLE)))) AS BIGINT) END AS r_milli
        |FROM m""".stripMargin,
    // exact integer deviation statistic S_t = n*prefix - t*total; argmax
    // with the identical (|S| DESC, t ASC) tie order
    "events_cusum" ->
      """WITH c AS (
        | SELECT event_type, epoch_us(ts) // 3600000000 AS hr, CAST(count(*) AS BIGINT) AS y
        | FROM events GROUP BY 1, 2),
        |s AS (
        | SELECT event_type, hr,
        |  CAST(row_number() OVER w AS BIGINT) AS t,
        |  CAST(sum(y) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS prefix,
        |  CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT) AS n_hours,
        |  CAST(sum(y) OVER (PARTITION BY event_type) AS BIGINT) AS total
        | FROM c WINDOW w AS (PARTITION BY event_type ORDER BY hr)),
        |d AS (
        | SELECT *, n_hours * prefix - t * total AS sv,
        |  row_number() OVER (PARTITION BY event_type ORDER BY abs(n_hours * prefix - t * total) DESC, t ASC) AS rk
        | FROM s)
        |SELECT event_type, n_hours, total, t AS cp_t, hr AS cp_hr,
        | sv AS s_at_cp, abs(sv) AS abs_s
        |FROM d WHERE rk = 1""".stripMargin,
    "events_seasonality" ->
      """WITH c AS (
        | SELECT event_type, epoch_us(ts) // 3600000000 AS hr, CAST(count(*) AS BIGINT) AS y
        | FROM events GROUP BY 1, 2),
        |p AS (
        | SELECT event_type, hr % 24 AS hod, CAST(count(*) AS BIGINT) AS n_hours,
        |  CAST(sum(y) AS BIGINT) AS total
        | FROM c GROUP BY 1, 2)
        |SELECT event_type, CAST(hod AS BIGINT) AS hod, n_hours, total,
        | 1000 * total // n_hours AS mean_milli,
        | row_number() OVER (PARTITION BY event_type ORDER BY total DESC, hod ASC) = 1 AS is_peak
        |FROM p""".stripMargin,
    // open/close under the (ts, event_id) total order — ties well-defined
    "events_ohlc" ->
      """WITH e AS (
        | SELECT event_type, epoch_us(ts) // 3600000000 AS hr, ts, event_id,
        |  CAST(round(value * 100) AS BIGINT) AS cents,
        |  row_number() OVER (PARTITION BY event_type, epoch_us(ts) // 3600000000 ORDER BY ts ASC, event_id ASC) AS rn_a,
        |  row_number() OVER (PARTITION BY event_type, epoch_us(ts) // 3600000000 ORDER BY ts DESC, event_id DESC) AS rn_d
        | FROM events)
        |SELECT event_type, hr, CAST(count(*) AS BIGINT) AS volume,
        | CAST(max(CASE WHEN rn_a = 1 THEN cents END) AS BIGINT) AS open_cents,
        | CAST(max(cents) AS BIGINT) AS high_cents,
        | CAST(min(cents) AS BIGINT) AS low_cents,
        | CAST(max(CASE WHEN rn_d = 1 THEN cents END) AS BIGINT) AS close_cents,
        | CAST(sum(cents) AS BIGINT) AS total_cents
        |FROM e GROUP BY 1, 2""".stripMargin,
    // additive decomposition: centered 5h rolling-mean trend; seasonal
    // mean through the +n*B shift so the div numerator stays non-negative
    "events_decompose" ->
      """WITH c AS (
        | SELECT event_type, epoch_us(ts) // 3600000000 AS hr, CAST(count(*) AS BIGINT) AS y
        | FROM events GROUP BY 1, 2),
        |t AS (
        | SELECT event_type, hr, y,
        |  CAST(sum(y) OVER w AS BIGINT) AS s_frame,
        |  CAST(count(*) OVER w AS BIGINT) AS n_frame
        | FROM c WINDOW w AS (PARTITION BY event_type ORDER BY hr
        |  ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)),
        |d AS (
        | SELECT *, CAST(1000 * s_frame // n_frame AS BIGINT) AS trend_milli,
        |  CAST(1000 * y - 1000 * s_frame // n_frame AS BIGINT) AS d_milli
        | FROM t),
        |s AS (
        | SELECT event_type, hr % 24 AS hod,
        |  CAST((CAST(sum(d_milli) AS BIGINT) + count(*) * 1000000000) // count(*) - 1000000000 AS BIGINT) AS seasonal_milli
        | FROM d GROUP BY 1, 2)
        |SELECT d.event_type, d.hr, d.y, d.trend_milli, s.seasonal_milli,
        | CAST(d.d_milli - s.seasonal_milli AS BIGINT) AS residual_milli
        |FROM d JOIN s ON s.event_type = d.event_type AND s.hod = d.hr % 24""".stripMargin,
    // milli-scaled so the even-frame midpoint average is exact (mult of 500)
    "events_rolling_median" ->
      """WITH c AS (
        | SELECT event_type, epoch_us(ts) // 3600000000 AS hr, CAST(count(*) AS BIGINT) AS y
        | FROM events GROUP BY 1, 2)
        |SELECT event_type, hr, y,
        | CAST(median(y * 1000) OVER (PARTITION BY event_type ORDER BY hr
        |  ROWS BETWEEN 4 PRECEDING AND CURRENT ROW) AS BIGINT) AS med_milli
        |FROM c""".stripMargin,
  )
}

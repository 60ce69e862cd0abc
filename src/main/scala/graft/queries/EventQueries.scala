package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch analytics over the events table (SURVEY §2.11's batch-equivalent
  * forms — the streaming versions live in graft.streaming and are spec-
  * tested; these give the DuckDB oracle the same semantics).
  *
  * `ts` is int64 *nanoseconds* (Tables.events) — bit-exact with DuckDB's
  * `epoch_ns(ts)`, so window boundaries and session gaps agree across
  * engines with zero truncation ambiguity.
  */
object EventQueries {

  private val HourNs = 3600L * 1000000000L
  private val GapUs = 30L * 60 * 1000000L // 30-minute session gap, microseconds

  /** Tumbling 1-hour windowed aggregation (epoch-aligned, like Spark's
    * `window(ts, "1 hour")`). */
  def windowedAgg(s: SparkSession, dir: String): DataFrame = {
    Tables.events(s, dir)
      .groupBy((floor(col("ts") / HourNs) * HourNs).cast("long").as("window_start_ns"),
        col("event_type"))
      .agg(
        count(lit(1)).as("n_events"),
        count_distinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
  }

  /** Gap-based sessionization: a new session starts when a user is idle
    * > 30 minutes. Classic lag → gap-flag → running-sum session id.
    * Works on microseconds (DuckDB truncates the ns parquet to µs on read,
    * so µs is the precision both engines share). */
  def sessionize(s: SparkSession, dir: String): DataFrame = {
    // event_id tie-break + explicit ROWS frame: Spark's default frame with
    // an orderBy is RANGE, which treats equal-ts_us rows as peers and
    // diverges from the oracle's ROWS semantics on µs ties.
    val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("ts_us", expr("ts div 1000")) // integer division: exact at ns magnitudes where double floor is not
      .withColumn("prev_ts", lag(col("ts_us"), 1).over(byUser))
      .withColumn("new_session",
        when(col("prev_ts").isNull || col("ts_us") - col("prev_ts") > GapUs, 1).otherwise(0))
      .withColumn("session_seq", sum(col("new_session"))
        .over(byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("session_start_us"),
        max(col("ts_us")).as("session_end_us"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
  }

  /** Per-user top event types by frequency (rank over grouped counts). */
  def topEventTypes(s: SparkSession, dir: String): DataFrame = {
    val counts = Tables.events(s, dir)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("n").desc, col("event_type"))
    counts.withColumn("rank", row_number().over(w)).where(col("rank") === 1)
      .select(col("user_id"), col("event_type"), col("n"))
  }

  /** Carry-forward enrichment: each event gets the value of that user's
    * most recent purchase at or before it (graft.operators.AsOf). */
  def asofLastPurchase(s: SparkSession, dir: String): DataFrame = {
    graft.operators.AsOf.carryForward(
      Tables.events(s, dir).withColumn("ts_us", expr("ts div 1000")),
      partitionCol = "user_id", orderCols = Seq("ts_us", "event_id"),
      condition = col("event_type") === "purchase",
      value = col("value"),
      asOfCol = "last_purchase_value")
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("event_type"), col("last_purchase_value"))
  }

  /** TWO-TABLE as-of join (AsOf.joinAsOf): every non-purchase event
    * enriched with the user's most recent purchase value at-or-before it.
    * The purchase side is pre-aggregated to one row per (user, µs) so the
    * as-of pick is well-defined; the oracle uses DuckDB's native
    * `ASOF LEFT JOIN` — two independent implementations of the same
    * semantics. */
  def asofJoin(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).withColumn("ts_us", expr("ts div 1000"))
    val left = ev.where(col("event_type") =!= "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"))
    val right = ev.where(col("event_type") === "purchase")
      .groupBy(col("user_id"), col("ts_us")).agg(max(col("value")).as("pvalue"))
    graft.operators.AsOf.joinAsOf(left, right, keyCol = "user_id", timeCol = "ts_us",
      rightValue = col("pvalue"), asOfCol = "last_purchase_value")
  }

  // four weekly promo windows over Jan 2024, inclusive µs bounds
  private val WeekUs = 7L * 24 * 3600 * 1000000L
  private val Jan1Us = 1704067200000000L // 2024-01-01T00:00:00Z
  private[queries] val promoWindows: Seq[(Long, Long, Long)] =
    (0 until 4).map(i => (i.toLong, Jan1Us + i * WeekUs, Jan1Us + (i + 1) * WeekUs - 1))

  /** Point-in-interval join via the custom IntervalJoin operator
    * (graft.plans) — events against dim-sized promo windows, aggregated
    * per window. The plan uses IntervalJoinExec, not a nested-loop join. */
  def intervalWindows(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val windows = promoWindows.toDF("window_id", "start_us", "end_us")
    val ev = Tables.events(s, dir).withColumn("ts_us", expr("ts div 1000"))
    graft.plans.IntervalJoin.join(ev, windows, ev("ts_us"),
      windows("start_us"), windows("end_us"))
      .groupBy(col("window_id"))
      .agg(count(lit(1)).as("n_events"),
        count_distinct(col("user_id")).as("n_users"),
        sum(col("value").cast("decimal(18,6)")).cast("double").as("sum_value"))
  }

  /** Batch twin of EventStreams.attributeConversions (stream-stream
    * interval join): per purchase, how many of the same user's views fell
    * in the preceding hour, and the latest such view. Inner join —
    * purchases with no prior view don't appear, same as the stream. */
  def attribution(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).withColumn("ts_us", expr("ts div 1000"))
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("ts_us").as("view_us"))
    val purchases = ev.where(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("purchase_id"), col("ts_us").as("purchase_us"))
    purchases.join(views,
      col("user_id") === col("v_user") &&
        col("view_us") <= col("purchase_us") &&
        col("view_us") >= col("purchase_us") - lit(3600000000L))
      .groupBy(col("user_id"), col("purchase_id"), col("purchase_us"))
      .agg(count(lit(1)).as("n_views"), max(col("view_us")).as("last_view_us"))
  }

  /** Semi-structured property parsing — the relational analog of Neo4j's
    * per-entity property maps (the reference exports them as typed CSV
    * columns): extract a typed field from the JSON `props` payload with
    * codegen'd get_json_object and aggregate it. */
  def propsJson(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_type"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(col("k")).as("n_k"), sum(col("k")).as("sum_k"),
        min(col("k")).as("min_k"), max(col("k")).as("max_k"))

  /** The optimizer-rule path end to end: a PLAIN DataFrame BETWEEN join
    * (no explicit operator) that RewriteRangeJoin turns into
    * IntervalJoinExec once IntervalJoin.register is called — users keep
    * writing ordinary range joins and get the O(log m) operator. The
    * rewrite itself is plan-asserted in IntervalJoinSpec; this query
    * driver-checks its RESULTS. */
  def betweenRewrite(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    graft.plans.IntervalJoin.register(s)
    val windows = promoWindows.toDF("window_id", "start_us", "end_us")
    val ev = Tables.events(s, dir).withColumn("ts_us", expr("ts div 1000"))
    ev.join(windows,
      ev("ts_us") >= windows("start_us") && ev("ts_us") <= windows("end_us"))
      .groupBy(col("window_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts_us")).as("first_us"), max(col("ts_us")).as("last_us"))
  }

  /** Ordered conversion funnel: signup → later view → later purchase,
    * strictly increasing µs timestamps per user (the MATCH_RECOGNIZE-ish
    * sequence question every product-analytics stack asks). Three
    * stage-wise conditional mins — each stage joins the previous stage's
    * per-user earliest time and keeps only later events, so users who
    * did things out of order DON'T convert. One row per stage with
    * survivor counts and the MEAN time-to-stage — exact-decimal sum of
    * µs integers, one unrounded IEEE division (a median would ride on
    * each engine's percentile interpolation arithmetic, which differs
    * in the last ulps at 10¹¹-µs magnitudes — observed live). */
  def funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), expr("ts div 1000").as("ts_us"))
    val s1 = ev.where(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts_us")).as("t1"))
    val s2 = ev.where(col("event_type") === "view")
      .join(s1, "user_id").where(col("ts_us") > col("t1"))
      .groupBy(col("user_id"), col("t1")).agg(min(col("ts_us")).as("t2"))
    val s3 = ev.where(col("event_type") === "purchase")
      .join(s2, "user_id").where(col("ts_us") > col("t2"))
      .groupBy(col("user_id"), col("t1")).agg(min(col("ts_us")).as("t3"))
    def stage(name: String, df: DataFrame, tCol: String) =
      df.agg(count(lit(1)).as("n_users"),
        sum((col(tCol) - col("t1")).cast("decimal(38,0)")).as("__s"))
        .select(lit(name).as("stage"), col("n_users"),
          (col("__s").cast("double") / col("n_users")).as("avg_us_from_signup"))
    stage("1_signup", s1.withColumn("t0", col("t1")), "t0")
      .unionAll(stage("2_view_after_signup", s2, "t2"))
      .unionAll(stage("3_purchase_after_view", s3, "t3"))
  }

  private val HourUs = 3600000000L

  /** Hourly regularization + LOCF over a bounded user cohort: the
    * [[graft.operators.TimeSeries.gapFillLocf]] resample — dense per-user
    * hourly grid between each user's first and last observed hour,
    * exact-mean observations, gaps carried forward. Cohort keeps the
    * GRID (not the scan) bounded at the gate SFs; at scale the step is
    * the lever. */
  def gapFill(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).where(col("user_id") < 50)
      .select(col("user_id"), expr("ts div 1000").as("t_us"), col("value"))
    graft.operators.TimeSeries.gapFillLocf(ev, "user_id", "t_us", "value", HourUs)
      .select(col("key").as("user_id"), col("bucket_us"), col("n_obs"),
        col("obs_value"), col("filled_value"), col("is_gap"))
  }

  /** Trailing-window z-score anomaly flags per user (TimeSeries
    * .rollingZscore): the online data-quality monitor — exact decimal
    * window sums, identical double mean/variance/z expression in both
    * engines, null z for cold keys. */
  def rollingZscore(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir).where(col("user_id") < 200)
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("t_us"),
        col("value"))
    graft.operators.TimeSeries.rollingZscore(ev, "user_id", "t_us", "event_id", "value")
  }

  /** Time-based RANGE frame windows — the frame kind ROWS cannot
    * emulate on irregular events: per user, the trailing-24h event
    * count and exact-decimal mean value AT EACH event. The frame is a
    * physical range over the µs timestamp (ties share a frame — RANGE
    * semantics are tie-deterministic by definition, no tiebreak column
    * needed); the mean is the one-unrounded-division portable form. */
  def rolling24h(s: SparkSession, dir: String): DataFrame = {
    val DayUs = 86400000000L
    val ev = Tables.events(s, dir).where(col("user_id") < 50)
      .select(col("event_id"), col("user_id"), expr("ts div 1000").as("t_us"),
        col("value"))
    val w = Window.partitionBy("user_id").orderBy("t_us")
      .rangeBetween(-(DayUs - 1), Window.currentRow)
    ev.select(col("event_id"), col("user_id"), col("t_us"),
      count(lit(1)).over(w).as("n_24h"),
      (sum(col("value").cast("decimal(28,6)")).over(w).cast("double") /
        count(lit(1)).over(w).cast("double")).as("mean_24h"))
  }

  /** SCD2 dimension-history build: each user's event_type stream collapses
    * into validity intervals (TimeSeries.scd2History — one exchange, all
    * windows riding it). */
  def scd2(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), expr("ts div 1000").as("t_us"), col("event_id"),
        col("event_type"))
    graft.operators.TimeSeries.scd2History(ev, "user_id", "t_us", "event_id",
      "event_type")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ev_scd2" -> (scd2 _),
    "ev_rolling_24h" -> (rolling24h _),
    "ev_rolling_zscore" -> (rollingZscore _),
    "ev_gapfill" -> (gapFill _),
    "ev_funnel" -> (funnel _),
    "ev_between_rewrite" -> (betweenRewrite _),
    "ev_props_json" -> (propsJson _),
    "ev_attribution" -> (attribution _),
    "ev_interval_windows" -> (intervalWindows _),
    "ev_asof_last_purchase" -> (asofLastPurchase _),
    "ev_asof_join" -> (asofJoin _),
    "ev_windowed_agg" -> (windowedAgg _),
    "ev_sessionize" -> (sessionize _),
    "ev_top_event_types" -> (topEventTypes _))

  private val windowValues = promoWindows
    .map { case (id, s0, e0) => s"($id, $s0, $e0)" }.mkString(", ")

  val oracles: Map[String, String] = Map(
    "ev_scd2" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS t_us, event_id, event_type
        |  FROM events WHERE user_id IS NOT NULL AND ts IS NOT NULL),
        |m AS (SELECT user_id, t_us, event_id, event_type,
        |    row_number() OVER w AS rn,
        |    COUNT(*) OVER (PARTITION BY user_id) AS tot,
        |    (row_number() OVER w = 1 OR
        |     event_type IS DISTINCT FROM lag(event_type) OVER w) AS chg
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY t_us, event_id)),
        |s AS (SELECT * FROM m WHERE chg)
        |SELECT user_id, CAST(row_number() OVER w2 AS INT) AS version,
        |  event_type, t_us AS valid_from, lead(t_us) OVER w2 AS valid_to,
        |  CAST(COALESCE(lead(rn) OVER w2, tot + 1) - rn AS BIGINT) AS n_events,
        |  (lead(t_us) OVER w2 IS NULL) AS is_current
        |FROM s WINDOW w2 AS (PARTITION BY user_id ORDER BY t_us, event_id)""".stripMargin,
    "ev_rolling_24h" ->
      """SELECT event_id, user_id, t_us,
        |  COUNT(*) OVER w AS n_24h,
        |  CAST(SUM(CAST(value AS DECIMAL(28,6))) OVER w AS DOUBLE)
        |    / CAST(COUNT(*) OVER w AS DOUBLE) AS mean_24h
        |FROM (SELECT event_id, user_id, epoch_us(ts) AS t_us, value
        |      FROM events WHERE user_id < 50)
        |WINDOW w AS (PARTITION BY user_id ORDER BY t_us
        |  RANGE BETWEEN 86399999999 PRECEDING AND CURRENT ROW)""".stripMargin,
    "ev_rolling_zscore" ->
      """WITH v AS (SELECT event_id, user_id, epoch_us(ts) AS t_us,
        |    CAST(round(value, 6) AS DECIMAL(18,6)) AS vq
        |  FROM events WHERE user_id < 200 AND value IS NOT NULL),
        |sft AS (SELECT event_id, user_id, t_us,
        |    CAST(vq - first(vq) OVER (PARTITION BY user_id
        |      ORDER BY t_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS DECIMAL(18,6)) AS vs
        |  FROM v),
        |w AS (SELECT event_id, user_id, vs,
        |    COUNT(*) OVER win AS n_window,
        |    COUNT(vs) OVER win AS nvs,
        |    SUM(vs) OVER win AS s1,
        |    SUM(vs * vs) OVER win AS s2
        |  FROM sft WINDOW win AS (PARTITION BY user_id ORDER BY t_us, event_id
        |    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING)),
        |m AS (SELECT event_id, user_id, vs, n_window, nvs,
        |    CAST(s1 AS DOUBLE) / CAST(n_window AS DOUBLE) AS mu,
        |    CAST(s2 AS DOUBLE) / CAST(n_window AS DOUBLE) AS m2
        |  FROM w WHERE n_window > 0
        |  UNION ALL SELECT event_id, user_id, vs, n_window, nvs, NULL, NULL
        |  FROM w WHERE n_window = 0),
        |z AS (SELECT event_id, user_id, CAST(n_window AS BIGINT) AS n_window,
        |    CASE WHEN n_window >= 8 AND m2 - mu * mu > 0 AND nvs = n_window
        |      THEN round((CAST(vs AS DOUBLE) - mu) / sqrt(m2 - mu * mu), 6) END AS zscore
        |  FROM m)
        |SELECT event_id, user_id, n_window, zscore,
        |  CASE WHEN zscore IS NOT NULL THEN abs(zscore) > 3.0 END AS is_anomaly
        |FROM z""".stripMargin,
    "ev_gapfill" ->
      """WITH ev AS (SELECT user_id, epoch_us(ts) AS t_us, value
        |  FROM events WHERE user_id < 50),
        |obs AS (SELECT user_id AS key, t_us - t_us % 3600000000 AS bucket_us,
        |    COUNT(*) AS n_obs,
        |    CAST(SUM(CAST(value AS DECIMAL(28,6))) AS DOUBLE)
        |      / CAST(COUNT(*) AS DOUBLE) AS obs_value
        |  FROM ev GROUP BY 1, 2),
        |grid AS (SELECT key, unnest(generate_series(lo, hi, 3600000000)) AS bucket_us
        |  FROM (SELECT key, MIN(bucket_us) AS lo, MAX(bucket_us) AS hi
        |    FROM obs GROUP BY key))
        |SELECT g.key AS user_id, g.bucket_us,
        |  COALESCE(o.n_obs, 0) AS n_obs, o.obs_value,
        |  last_value(o.obs_value IGNORE NULLS) OVER (PARTITION BY g.key
        |    ORDER BY g.bucket_us
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
        |  o.n_obs IS NULL AS is_gap
        |FROM grid g LEFT JOIN obs o
        |  ON o.key = g.key AND o.bucket_us = g.bucket_us""".stripMargin,
    "ev_funnel" ->
      """WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events),
        |s1 AS (SELECT user_id, MIN(ts_us) AS t1 FROM ev
        |  WHERE event_type = 'signup' GROUP BY user_id),
        |s2 AS (SELECT e.user_id, s1.t1, MIN(e.ts_us) AS t2
        |  FROM ev e JOIN s1 ON e.user_id = s1.user_id
        |  WHERE e.event_type = 'view' AND e.ts_us > s1.t1 GROUP BY e.user_id, s1.t1),
        |s3 AS (SELECT e.user_id, s2.t1, MIN(e.ts_us) AS t3
        |  FROM ev e JOIN s2 ON e.user_id = s2.user_id
        |  WHERE e.event_type = 'purchase' AND e.ts_us > s2.t2 GROUP BY e.user_id, s2.t1)
        |SELECT '1_signup' AS stage, COUNT(*) AS n_users,
        |  CAST(SUM(t1 - t1) AS DOUBLE) / COUNT(*) AS avg_us_from_signup FROM s1
        |UNION ALL SELECT '2_view_after_signup', COUNT(*),
        |  CAST(SUM(t2 - t1) AS DOUBLE) / COUNT(*) FROM s2
        |UNION ALL SELECT '3_purchase_after_view', COUNT(*),
        |  CAST(SUM(t3 - t1) AS DOUBLE) / COUNT(*) FROM s3""".stripMargin,
    "ev_asof_join" ->
      """WITH ev AS (
        |  SELECT event_id, epoch_us(ts) AS ts_us, user_id, event_type, value FROM events),
        |l AS (SELECT event_id, user_id, ts_us FROM ev WHERE event_type <> 'purchase'),
        |r AS (SELECT user_id, ts_us, max(value) AS pvalue
        |  FROM ev WHERE event_type = 'purchase' GROUP BY 1, 2)
        |SELECT l.event_id, l.user_id, l.ts_us, r.pvalue AS last_purchase_value
        |FROM l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.ts_us >= r.ts_us""".stripMargin,
    "ev_between_rewrite" ->
      s"""WITH w(window_id, start_us, end_us) AS (VALUES $windowValues)
         |SELECT CAST(w.window_id AS BIGINT) AS window_id, COUNT(*) AS n_events,
         |  MIN(epoch_us(e.ts)) AS first_us, MAX(epoch_us(e.ts)) AS last_us
         |FROM events e JOIN w ON epoch_us(e.ts) BETWEEN w.start_us AND w.end_us
         |GROUP BY w.window_id""".stripMargin,
    "ev_props_json" ->
      """SELECT event_type, COUNT(k) AS n_k, CAST(SUM(k) AS BIGINT) AS sum_k,
        |  MIN(k) AS min_k, MAX(k) AS max_k
        |FROM (SELECT event_type,
        |        CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
        |GROUP BY event_type""".stripMargin,
    "ev_attribution" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us FROM events)
        |SELECT p.user_id, p.event_id AS purchase_id, p.ts_us AS purchase_us,
        |  COUNT(*) AS n_views, MAX(v.ts_us) AS last_view_us
        |FROM e p JOIN e v ON p.user_id = v.user_id
        |  AND v.ts_us <= p.ts_us AND v.ts_us >= p.ts_us - 3600000000
        |WHERE p.event_type = 'purchase' AND v.event_type = 'view'
        |GROUP BY p.user_id, p.event_id, p.ts_us""".stripMargin,
    "ev_interval_windows" ->
      s"""WITH w(window_id, start_us, end_us) AS (VALUES $windowValues)
         |SELECT CAST(w.window_id AS BIGINT) AS window_id, COUNT(*) AS n_events,
         |  COUNT(DISTINCT e.user_id) AS n_users,
         |  CAST(CAST(SUM(CAST(e.value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_value
         |FROM events e JOIN w ON epoch_us(e.ts) BETWEEN w.start_us AND w.end_us
         |GROUP BY w.window_id""".stripMargin,
    "ev_asof_last_purchase" ->
      """SELECT event_id, user_id, epoch_us(ts) AS ts_us, event_type,
        |  last(CASE WHEN event_type = 'purchase' THEN value END IGNORE NULLS)
        |    OVER (PARTITION BY user_id ORDER BY epoch_us(ts), event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_purchase_value
        |FROM events""".stripMargin,
    "ev_windowed_agg" ->
      """SELECT CAST(FLOOR(epoch_ns(ts) / 3600000000000) * 3600000000000 AS BIGINT) AS window_start_ns,
        |  event_type, COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_users,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin,
    "ev_sessionize" ->
      """WITH flagged AS (
        |  SELECT user_id, event_id, value, epoch_us(ts) AS ts_us,
        |    CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |      OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1 ELSE 0 END AS new_session
        |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |), sessions AS (
        |  SELECT user_id, value, ts_us,
        |    CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_seq
        |  FROM flagged)
        |SELECT user_id, session_seq, COUNT(*) AS n_events,
        |  MIN(ts_us) AS session_start_us, MAX(ts_us) AS session_end_us,
        |  CAST(CAST(SUM(CAST(value AS DECIMAL(18,6))) AS VARCHAR) AS DOUBLE) AS sum_value
        |FROM sessions GROUP BY user_id, session_seq""".stripMargin,
    "ev_top_event_types" ->
      """SELECT user_id, event_type, n FROM (
        |  SELECT user_id, event_type, COUNT(*) AS n,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY COUNT(*) DESC, event_type) AS rank
        |  FROM events GROUP BY user_id, event_type)
        |WHERE rank = 1""".stripMargin)
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: turn an irregular event stream into a
  * dense per-key grid — the resample step every monitoring/feature
  * pipeline runs before windowed models (reference analogue: the export
  * pipeline emits raw event rows; cf. neo4j_export.py's full-table
  * scans — regularization is a mandated pipeline extension, SURVEY §2.10).
  *
  * Scale shape: one aggregation to per-(key, bucket) observations, one
  * per-key min/max agg, ONE `sequence()` explode to the grid (each key's
  * grid generates inside its own task — no driver loop, no cross-key
  * shuffle beyond the join back), then a single lag-window pass for the
  * carry-forward. Grid size is bounded by keys·span/step — the caller
  * chooses the step; nothing quadratic, nothing collected.
  */
object TimeSeries {

  /** Dense per-key grid between each key's own first and last bucket
    * (inclusive), step `stepUs`, with observed per-bucket aggregates and
    * last-observation-carried-forward fill.
    *
    * Input rows: (key, tUs, value). Output: (key, bucket_us, n_obs,
    * obs_value, filled_value, is_gap) where `obs_value` is the exact
    * per-bucket mean (DECIMAL sum, one unrounded IEEE division — the
    * cross-engine-portable form) and `filled_value` carries the last
    * non-null `obs_value` forward within the key (the first grid cell is
    * always observed, so LOCF never reads before the series starts). */
  def gapFillLocf(df: DataFrame, keyCol: String, tUsCol: String,
      valueCol: String, stepUs: Long): DataFrame = {
    require(stepUs > 0, s"stepUs=$stepUs must be positive")
    val bucket = (col(tUsCol) - pmod(col(tUsCol), lit(stepUs))).as("bucket_us")
    val obs = df
      .where(col(keyCol).isNotNull && col(tUsCol).isNotNull)
      .groupBy(col(keyCol).as("key"), bucket)
      .agg(count(lit(1)).as("n_obs"),
        (sum(col(valueCol).cast("decimal(28,6)")).cast("double") /
          count(lit(1)).cast("double")).as("obs_value"))
    val grid = obs.groupBy("key")
      .agg(min(col("bucket_us")).as("lo"), max(col("bucket_us")).as("hi"))
      .select(col("key"),
        explode(sequence(col("lo"), col("hi"), lit(stepUs))).as("bucket_us"))
    val w = Window.partitionBy("key").orderBy("bucket_us")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    grid.join(obs, Seq("key", "bucket_us"), "left")
      .select(col("key"), col("bucket_us"),
        coalesce(col("n_obs"), lit(0L)).as("n_obs"),
        col("obs_value"),
        last(col("obs_value"), ignoreNulls = true).over(w).as("filled_value"),
        col("n_obs").isNull.as("is_gap"))
  }

  /** SCD2 (type-2 slowly-changing-dimension) history from a change
    * stream: per key, consecutive equal `attrCol` values collapse into
    * validity intervals — the lakehouse dimension-history primitive
    * (Kimball's type-2 dimension, built from an event log instead of
    * per-batch diffs; complements PropertyGraphIO's copy-on-write upsert,
    * which keeps only the CURRENT version).
    *
    * Output per interval: (key, version 1.., attr, valid_from = first
    * event's time, valid_to = next interval's valid_from or NULL,
    * n_events = rows collapsed into the interval, is_current).
    *
    * Scale shape: ONE hash exchange on the key; change detection (lag),
    * the per-key row count, the interval lead/row_number all run as
    * Window operators over that same (key, time, tie) partitioning+sort —
    * the start-row filter preserves both, so Catalyst plans no second
    * exchange and no second sort. Nothing is collected; per-key state is
    * one row per VERSION, not per event. Ties at equal `tUsCol` break on
    * `tieCol` (pass the event's unique id) so replay is deterministic.
    * Null attr values are genuine states: transitions use null-safe
    * equality, so null→x and x→null both open new intervals. */
  def scd2History(df: DataFrame, keyCol: String, tUsCol: String,
      tieCol: String, attrCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tUsCol), col(tieCol))
    val marked = df
      .select(col(keyCol), col(tUsCol), col(tieCol), col(attrCol))
      .where(col(keyCol).isNotNull && col(tUsCol).isNotNull)
      .withColumn("__rn", row_number().over(w))
      .withColumn("__tot", count(lit(1)).over(Window.partitionBy(col(keyCol))))
      .withColumn("__chg",
        col("__rn") === 1 || !(col(attrCol) <=> lag(col(attrCol), 1).over(w)))
    marked.where(col("__chg")).select(
      col(keyCol),
      row_number().over(w).cast("int").as("version"),
      col(attrCol),
      col(tUsCol).as("valid_from"),
      lead(col(tUsCol), 1).over(w).as("valid_to"),
      (coalesce(lead(col("__rn"), 1).over(w).cast("long"), col("__tot") + 1)
        - col("__rn")).as("n_events"),
      lead(col(tUsCol), 1).over(w).isNull.as("is_current"))
  }

  /** Trailing-window z-score anomaly flags — the online data-quality
    * monitor every ingestion pipeline runs (a value is anomalous when it
    * deviates > `threshold`σ from its key's own trailing `window`
    * observations; the window excludes the current row, so an outlier
    * never masks itself). Cross-engine determinism: values quantize to
    * 6dp DECIMAL once, the window SUMS (Σv, Σv²) are exact decimals, and
    * mean/variance/z run as the identical double expression in both
    * engines (multiplication, not pow — libm pow(x,2) can differ from
    * x·x by an ulp); z is 6dp-rounded for output. Rows with fewer than
    * `minObs` trailing observations (or zero variance) get null z/flag —
    * a cold key is unknown, not normal.
    *
    * Scale shape: ONE hash(key) exchange into per-key sorted windows —
    * rows-frame running aggregates are O(1) per row; nothing collected,
    * nothing quadratic. */
  def rollingZscore(df: DataFrame, keyCol: String, tCol: String,
      idCol: String, valueCol: String, window: Int = 24, minObs: Int = 8,
      threshold: Double = 3.0): DataFrame = {
    require(window >= minObs && minObs >= 2, s"need window >= minObs >= 2")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tCol), col(idCol))
      .rowsBetween(-window, -1)
    val wc = Window.partitionBy(col(keyCol)).orderBy(col(tCol), col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // SHIFT-INVARIANCE defense against catastrophic cancellation: z is
    // unchanged by subtracting a per-key constant, but E[x²]−E[x]² in
    // doubles is NOT — for |mean| >> stddev (values near 1e9, small
    // spread) the subtraction wipes the significant bits and the
    // statistic silently nulls or lies. Center every value on the KEY'S
    // FIRST quantized observation (a running first() over the same sort
    // — one window pass, exact decimal subtraction), so the double
    // arithmetic sees magnitudes of the per-key SPREAD, not the offset.
    // Contract: the spread must fit DECIMAL(18,6) (12 integer digits) —
    // a per-key RANGE bound instead of the old absolute-magnitude one.
    // The oracle mirrors the same shift, so cross-engine equality holds.
    // the quantization itself is ALSO a try_cast (r14 ADVICE): a raw
    // |value| >= 1e12 would throw under ANSI one expression before the
    // shift guard below; as a NULL it flows into __vs and the same
    // __nvs != n_window window guard covers it in both modes
    df.where(col(keyCol).isNotNull && col(tCol).isNotNull && col(valueCol).isNotNull)
      .select(col(idCol), col(keyCol), col(tCol),
        expr(s"try_cast(round(`$valueCol`, 6) as decimal(18,6))").as("__vq"))
      // OVERFLOW honesty (r13 ADVICE): a spread past DECIMAL(18,6) made
      // the plain cast THROW under ANSI (Spark 4 default — one bad key
      // kills the whole job) and silently null under non-ANSI — where
      // SUM skipped the row while n_window still counted it, biasing
      // every covering window's mean/variance. try_cast makes the
      // overflow an explicit NULL in both modes, and the per-window
      // non-null count below nulls the zscore of any window touching
      // one: an overflowed neighborhood is unknown, not normal. (DuckDB
      // can't reach the divergent state — its cast ERRORS on overflow —
      // so the oracle's mirrored guard is vacuously true and
      // cross-engine equality holds on all data both engines complete.)
      .withColumn("__f", first(col("__vq")).over(wc))
      .withColumn("__vs", expr("try_cast(__vq - __f as decimal(18,6))"))
      .withColumn("n_window", count(lit(1)).over(w))
      .withColumn("__nvs", count(col("__vs")).over(w))
      .withColumn("__m",
        sum(col("__vs")).over(w).cast("double") / col("n_window").cast("double"))
      .withColumn("__var",
        sum(col("__vs") * col("__vs")).over(w).cast("double") /
          col("n_window").cast("double") - col("__m") * col("__m"))
      .withColumn("zscore",
        when(col("n_window") >= minObs && col("__var") > 0.0 &&
            col("__nvs") === col("n_window"),
          round((col("__vs").cast("double") - col("__m")) / sqrt(col("__var")), 6)))
      .withColumn("is_anomaly",
        when(col("zscore").isNotNull, abs(col("zscore")) > threshold))
      .select(col(idCol), col(keyCol), col("n_window"), col("zscore"),
        col("is_anomaly"))
  }
}

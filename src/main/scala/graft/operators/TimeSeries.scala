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
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of / carry-forward enrichment (SURVEY §2.11 family): for each row,
  * the most recent prior value satisfying a predicate within its
  * partition — "the user's last purchase before this event", "the latest
  * config active at this timestamp".
  *
  * Implemented as a conditional `last(_, ignoreNulls)` over a running
  * ROWS window: one sort-shuffle on (partition, order), no per-key loops,
  * no range join — the shape that survives a 1000-executor scale-up. For
  * two-table as-of joins, union the right side in with a tag column and
  * apply the same carry-forward, then filter back to left rows.
  */
object AsOf {

  /** Adds `asOfCol`: the latest `value` from a row where `condition` held,
    * at or before the current row in (partitionCol, orderCols) order. */
  def carryForward(df: DataFrame, partitionCol: String, orderCols: Seq[String],
      condition: Column, value: Column, asOfCol: String): DataFrame = {
    val w = Window.partitionBy(col(partitionCol))
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn(asOfCol, last(when(condition, value), ignoreNulls = true).over(w))
  }

  /** As-of join: enrich each `left` row with the most recent `right` row
    * (by `timeCol`, per `keyCol`) at or strictly before it. Right columns
    * arrive as `rightValue` carried forward through a tagged union — one
    * shuffle total. */
  def joinAsOf(left: DataFrame, right: DataFrame, keyCol: String, timeCol: String,
      rightValue: Column, asOfCol: String): DataFrame = {
    val l = left.withColumn("__is_left", lit(1))
      .withColumn("__asof_v", lit(null).cast("double"))
    val r = right
      .withColumn("__is_left", lit(0))
      .withColumn("__asof_v", rightValue)
      .select(col(keyCol), col(timeCol), col("__is_left"), col("__asof_v"))
    val lCols = left.columns
    val unioned = l.select((lCols.toSeq.map(col) :+ col("__is_left") :+ col("__asof_v")): _*)
      .unionByName(
        r.select((lCols.toSeq.map(c => if (c == keyCol || c == timeCol) col(c) else lit(null).cast(left.schema(c).dataType).as(c))
          :+ col("__is_left") :+ col("__asof_v")): _*))
    // right rows sort before left rows at the same timestamp → "at or before"
    val enriched = carryForward(unioned, keyCol, Seq(timeCol, "__is_left"),
      col("__is_left") === 0, col("__asof_v"), asOfCol)
    enriched.where(col("__is_left") === 1).drop("__is_left", "__asof_v")
  }
}

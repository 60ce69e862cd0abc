package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graft.{ColumnBridge, DatasetBridge}

/** Custom whole-operator extension (SURVEY preference tier (c)): an
  * interval/point-in-range join.
  *
  * `SELECT * FROM fact f JOIN dims d ON f.t BETWEEN d.start AND d.end`
  * has no equi-key, so Spark plans a BroadcastNestedLoopJoin — O(n·m)
  * predicate evaluations. When the interval side is dim-sized (calendar
  * windows, maintenance periods, promo campaigns), the right algorithm is
  *: broadcast the intervals sorted by start, binary-search the upper
  * bound per fact row, and scan only candidate intervals — O(n·log m + n·k).
  *
  * Full custom-plan machinery: logical node → planner [[Strategy]] →
  * physical [[IntervalJoinExec]], registered per-session via
  * `spark.experimental.extraStrategies` (see [[IntervalJoin.register]]).
  */
final case class IntervalJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftTime: Expression, rightStart: Expression, rightEnd: Expression)
  extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): IntervalJoinPlan =
    copy(left = newLeft, right = newRight)
}

final case class IntervalJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftTime: Expression, rightStart: Expression, rightEnd: Expression)
  extends BinaryExecNode {
  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): IntervalJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    // interval side is dim-sized by contract: collect, sort, broadcast.
    // NULL bounds never satisfy the inner-join BETWEEN predicate, so those
    // rows are dropped here instead of crashing asLong — an ordinary dim
    // table with one nullable bound row must not kill the query.
    val startBound = BindReferences.bindReference(rightStart, right.output)
    val endBound = BindReferences.bindReference(rightEnd, right.output)
    val intervals = right.executeCollect().flatMap { r =>
      val s = startBound.eval(r)
      val e = endBound.eval(r)
      if (s == null || e == null) None
      else Some((asLong(s), asLong(e), r.copy()))
    }.sortBy(_._1)
    // prefix running max of interval ends: walking candidates downward
    // from the binary-search bound can stop as soon as the running max end
    // drops below t — per-row work is O(log m + answers + overlap depth),
    // not O(all starts ≤ t)
    val prefixMaxEnd = new Array[Long](intervals.length)
    var runningMax = Long.MinValue
    var pi = 0
    while (pi < intervals.length) {
      if (intervals(pi)._2 > runningMax) runningMax = intervals(pi)._2
      prefixMaxEnd(pi) = runningMax
      pi += 1
    }
    val bc = sparkContext.broadcast((intervals, prefixMaxEnd))
    val timeBound = BindReferences.bindReference(leftTime, left.output)
    val outAttrs = output

    left.execute().mapPartitions { it =>
      val (ivs, pme) = bc.value
      val starts = ivs.map(_._1)
      val joiner = new JoinedRow
      val proj = UnsafeProjection.create(outAttrs, outAttrs)
      it.flatMap { lrow =>
        val tv = timeBound.eval(lrow)
        if (tv == null) Iterator.empty
        else {
          val t = asLong(tv)
          // candidates have start <= t; among those keep end >= t
          var hi = java.util.Arrays.binarySearch(starts, t)
          if (hi < 0) hi = -hi - 1 else { while (hi < starts.length && starts(hi) == t) hi += 1 }
          // no lrow.copy(): flatMap only advances the outer row after this
          // inner iterator is exhausted, and proj materializes the joined
          // row into its own buffer before that — one copy per OUTPUT row
          // (required, proj reuses its buffer), zero per input row
          new Iterator[InternalRow] {
            private var i = hi - 1
            private def seek(): Unit = {
              while (i >= 0 && pme(i) >= t && ivs(i)._2 < t) i -= 1
              if (i >= 0 && pme(i) < t) i = -1 // no earlier interval can reach t
            }
            seek()
            def hasNext: Boolean = i >= 0
            def next(): InternalRow = {
              val out = proj(joiner(lrow, ivs(i)._3)).copy()
              i -= 1; seek(); out
            }
          }
        }
      }
    }
  }

  private def asLong(v: Any): Long = v match {
    case l: java.lang.Long => l
    case i: java.lang.Integer => i.toLong
    case o => throw new IllegalArgumentException(s"interval bounds must be integral, got $o")
  }
}

object IntervalJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case IntervalJoinPlan(l, r, t, s, e) =>
      IntervalJoinExec(planLater(l), planLater(r), t, s, e) :: Nil
    case _ => Nil
  }
}

object IntervalJoin {
  /** Idempotently register the planner strategy (and the BETWEEN-join
    * rewrite rule) on this session. */
  def register(spark: SparkSession): Unit = {
    val es = spark.experimental
    if (!es.extraStrategies.contains(IntervalJoinStrategy))
      es.extraStrategies = es.extraStrategies :+ IntervalJoinStrategy
    if (!es.extraOptimizations.contains(RewriteRangeJoin))
      es.extraOptimizations = es.extraOptimizations :+ RewriteRangeJoin
  }

  /** Join `fact` rows to every `intervals` row whose
    * [startCol, endCol] contains timeCol (inclusive both ends). Columns
    * must be resolved against their own frame, e.g. `fact("ts_us")`. */
  def join(fact: DataFrame, intervals: DataFrame,
      timeCol: Column, startCol: Column, endCol: Column): DataFrame = {
    val spark = fact.sparkSession
    register(spark)
    DatasetBridge.ofRows(spark, IntervalJoinPlan(
      DatasetBridge.analyzedPlan(fact), DatasetBridge.analyzedPlan(intervals),
      ColumnBridge.expression(timeCol),
      ColumnBridge.expression(startCol),
      ColumnBridge.expression(endCol)))
  }
}

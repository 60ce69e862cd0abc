package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Optimizer rule (SURVEY tier: Rule[LogicalPlan]): recognizes the plain
  * range-join pattern
  *
  * {{{ fact.join(dims, fact("t") >= dims("s") && fact("t") <= dims("e")) }}}
  *
  * and rewrites it to [[IntervalJoinPlan]] whenever the interval side is
  * broadcast-small — so users writing ordinary BETWEEN joins get the
  * O(n log m) operator instead of a BroadcastNestedLoopJoin without
  * changing their code. Registered together with [[IntervalJoinStrategy]]
  * by [[IntervalJoin.register]] / `GraftExtensions`.
  */
object RewriteRangeJoin extends Rule[LogicalPlan] {

  private def integral(e: Expression): Boolean = e.dataType match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def refsOnly(e: Expression, side: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(side.outputSet)

  /** p as a lower bound "t >= s" with t from left, s from right. */
  private def lowerBound(p: Expression, l: LogicalPlan, r: LogicalPlan): Option[(Expression, Expression)] =
    p match {
      case GreaterThanOrEqual(t, s) if refsOnly(t, l) && refsOnly(s, r) => Some((t, s))
      case LessThanOrEqual(s, t) if refsOnly(t, l) && refsOnly(s, r) => Some((t, s))
      case _ => None
    }

  /** p as an upper bound "t <= e" with t from left, e from right. */
  private def upperBound(p: Expression, l: LogicalPlan, r: LogicalPlan): Option[(Expression, Expression)] =
    p match {
      case LessThanOrEqual(t, e) if refsOnly(t, l) && refsOnly(e, r) => Some((t, e))
      case GreaterThanOrEqual(e, t) if refsOnly(t, l) && refsOnly(e, r) => Some((t, e))
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case j @ Join(l, r, Inner, Some(And(p1, p2)), _)
        if r.stats.sizeInBytes >= 0 && r.stats.sizeInBytes <= conf.autoBroadcastJoinThreshold =>
      val rewritten = (for {
        (t1, s) <- lowerBound(p1, l, r); (t2, e) <- upperBound(p2, l, r)
        if t1.semanticEquals(t2) && integral(t1) && integral(s) && integral(e)
      } yield IntervalJoinPlan(l, r, t1, s, e)).orElse(for {
        (t1, s) <- lowerBound(p2, l, r); (t2, e) <- upperBound(p1, l, r)
        if t1.semanticEquals(t2) && integral(t1) && integral(s) && integral(e)
      } yield IntervalJoinPlan(l, r, t1, s, e))
      rewritten.getOrElse(j)
  }
}

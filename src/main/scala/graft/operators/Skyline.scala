package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skyline (Pareto-front) queries — Börzsönyi et al., ICDE 2001: the
  * rows no other row dominates, where q dominates p iff q is at least
  * as good on EVERY criterion and strictly better on at least one.
  * The multi-objective shortlist operator ("cheap AND recent AND
  * high-quality") relational engines lack as a primitive.
  *
  * Naive evaluation is an O(n²) dominance anti-join. The distributed
  * plan here prunes first with a GRID summary: each point lands in a
  * cell (per-criterion buckets); a cell whose best corner is dominated
  * by some other cell's WORST corner cannot contain any skyline point,
  * so its points drop before the quadratic step. The cell summary is
  * tiny (≤ buckets^dims rows) and broadcasts; at web scale the
  * surviving candidate set is a thin Pareto shell, and only that shell
  * pays the anti-join. Both the pruning corner comparison and the
  * final dominance predicate are integer/exact comparisons over the
  * caller's criteria — no float hazards.
  */
object Skyline {

  /** A skyline criterion: `expr` is the value, `maximize` its
    * direction. A MINIMIZED criterion is negated internally, so it must
    * be numeric (dates/strings: maximize a numeric projection instead,
    * e.g. datediff from an epoch — see q_skyline_orders). */
  final case class Criterion(name: String, expr: Column, maximize: Boolean)

  /** The skyline of `df` under `criteria`, with `buckets` grid cells
    * per criterion for the pruning pass. Duplicate criterion vectors
    * all survive (none strictly dominates its twin). Rows with a NULL
    * criterion value are EXCLUDED up front: under three-valued logic a
    * NULL row can neither dominate nor be dominated (the predicate is
    * null), so it would vacuously surface as a "skyline" member —
    * dominance over missing data is undefined, and silently promoting
    * incomparable rows is the wrong default. Callers who want NULLs
    * ranked should coalesce them to an explicit worst value first. */
  def skyline(df: DataFrame, criteria: Seq[Criterion],
      buckets: Int = 16): DataFrame =
    skylinePerKey(df, Nil, criteria, buckets)

  /** Per-group skyline: one independent Pareto front per `keyCols`
    * value. With keys the exact dominance step becomes an EQUI-join on
    * the key with the theta predicate as a residual — hash-partitioned
    * by group, not a broadcast nested loop — and the grid pruning
    * compares cells within a group only. */
  def skylinePerKey(df: DataFrame, keyCols: Seq[String],
      criteria: Seq[Criterion], buckets: Int = 16): DataFrame = {
    require(criteria.nonEmpty, "need at least one criterion")
    // orient every criterion as MAXIMIZE: negate minimized ones;
    // NULL-criterion rows drop here (see scaladoc — three-valued
    // dominance would otherwise keep them all, undominated by anything)
    val vals = criteria.map(c =>
      (if (c.maximize) c.expr else -c.expr).as(s"__c_${c.name}"))
    val base = df.where(criteria.map(_.expr.isNotNull).reduce(_ && _))
      .select(col("*") +: vals: _*)
    val cNames = criteria.map(c => s"__c_${c.name}")

    // grid cells: per-criterion equi-width buckets over the GLOBAL
    // observed range (a per-key range would be tighter but needs a
    // second aggregate; global ranges keep pruning correct either way)
    val rangeAgg = cNames.flatMap(n =>
      Seq(min(col(n)).as(s"__min_$n"), max(col(n)).as(s"__max_$n")))
    val ranges = base.agg(rangeAgg.head, rangeAgg.tail: _*)
    val withCell = base.crossJoin(broadcast(ranges))
      .select(col("*") +: cNames.map { n =>
        val span = col(s"__max_$n") - col(s"__min_$n")
        when(span === 0, lit(0))
          .otherwise(least(
            floor((col(n) - col(s"__min_$n")) * buckets / span).cast("int"),
            lit(buckets - 1))).as(s"__b_$n")
      }: _*)

    // cell summary: per (key, cell), the worst corner (min per
    // criterion) of its members; a cell C is pruned when some same-key
    // cell D's worst corner dominates C's best corner (max per
    // criterion) — strictly better on one axis, ≥ on all
    val bNames = keyCols ++ cNames.map(n => s"__b_$n")
    val cellCols = bNames.map(col)
    val aggs = cNames.map(n => min(col(n)).as(s"__lo_$n")) ++
      cNames.map(n => max(col(n)).as(s"__hi_$n"))
    val summary = withCell.groupBy(cellCols: _*)
      .agg(aggs.head, aggs.tail: _*)
      .localCheckpoint(true)
    val d = summary.select(
      keyCols.map(k => col(k).as(s"__dk_$k")) ++
        cNames.map(n => col(s"__lo_$n").as(s"__dlo_$n")): _*)
    val sameKey = keyCols.map(k => col(s"__dk_$k") === col(k))
    val cellDom =
      cNames.map(n => col(s"__dlo_$n") >= col(s"__hi_$n")).reduce(_ && _) &&
        cNames.map(n => col(s"__dlo_$n") > col(s"__hi_$n")).reduce(_ || _)
    val dominatedCells = summary.join(broadcast(d),
        (sameKey :+ cellDom).reduce(_ && _), "left_semi")
      .select(cellCols: _*)
    val candidates = withCell.join(dominatedCells, bNames, "left_anti")

    // exact dominance anti-join over the surviving shell: with keys an
    // equi-join on the key (theta residual), keyless a broadcast loop
    val r = candidates.select(
      keyCols.map(k => col(k).as(s"__rk_$k")) ++
        cNames.map(n => col(n).as(s"__r_$n")): _*)
    val dominates =
      (keyCols.map(k => col(s"__rk_$k") === col(k)) :+
        (cNames.map(n => col(s"__r_$n") >= col(n)).reduce(_ && _) &&
          cNames.map(n => col(s"__r_$n") > col(n)).reduce(_ || _))).reduce(_ && _)
    val rSide = if (keyCols.isEmpty) broadcast(r) else r
    candidates.join(rSide, dominates, "left_anti")
      .select(df.columns.map(col).toSeq: _*)
  }
}

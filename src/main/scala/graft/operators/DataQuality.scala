package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality validation (the Deequ/great-expectations
  * shape): a check list compiles into ONE conditional-aggregation pass
  * over the table — every violation counter rides the same scan — plus
  * one anti-join per referential check. The reference validates as it
  * exports (unique identifiers, NULL filtering — neo4j_export.py:132-175,
  * 303-313); this generalizes that into an auditable report.
  *
  * Report row: (check_name, violations, total, passed). All counters are
  * exact BIGINTs — no sampled approximations — so the report is
  * hash-portable across engines. At 100 TB each table still costs one
  * scan; referential checks shuffle only the key columns.
  */
object DataQuality {

  sealed trait Check { def name: String }
  /** ≤ maxNullFrac of rows may be NULL (fraction compared exactly via
    * cross-multiplication — no float division in the pass/fail). */
  final case class NotNull(col: String, maxNullFracPpm: Long = 0L) extends Check {
    val name = s"not_null:$col"
  }
  /** Column values are unique (violations = rows beyond the first per
    * duplicated value; NULLs ignored — uniqueness is about present keys). */
  final case class Unique(col: String) extends Check { val name = s"unique:$col" }
  /** All non-null values inside [lo, hi]. */
  final case class InRange(col: String, lo: Double, hi: Double) extends Check {
    val name = s"in_range:$col"
  }
  /** All non-null values drawn from the accepted set. */
  final case class Accepted(col: String, values: Seq[String]) extends Check {
    val name = s"accepted:$col"
  }

  /** One-pass report for scan checks (NotNull / InRange / Accepted) +
    * per-check aggregation for Unique (needs its own distinct count —
    * still one shuffle on the checked column, keys only). */
  def report(df: DataFrame, checks: Seq[Check]): DataFrame = {
    require(checks.nonEmpty, "no checks given")
    val total = count(lit(1))
    val scanChecks = checks.collect {
      case c @ NotNull(col0, _) =>
        (c, sum(when(col(col0).isNull, 1L).otherwise(0L)))
      case c @ InRange(col0, lo, hi) =>
        (c, sum(when(col(col0).isNotNull &&
          (col(col0) < lo || col(col0) > hi), 1L).otherwise(0L)))
      case c @ Accepted(col0, vs) =>
        (c, sum(when(col(col0).isNotNull &&
          !col(col0).isin(vs: _*), 1L).otherwise(0L)))
    }
    val scanReport: Option[DataFrame] =
      if (scanChecks.isEmpty) None
      else {
        val aggs = scanChecks.zipWithIndex.map { case ((_, a), i) => a.as(s"v$i") } :+
          total.as("t")
        val one = df.agg(aggs.head, aggs.tail: _*)
        Some(scanChecks.zipWithIndex.map { case ((c, _), i) =>
          val passed = c match {
            // ppm cross-multiplication: violations·10⁶ ≤ maxPpm·total
            case NotNull(_, maxPpm) =>
              col(s"v$i") * lit(1000000L) <= lit(maxPpm) * col("t")
            case _ => col(s"v$i") === 0L
          }
          one.select(lit(c.name).as("check_name"),
            col(s"v$i").cast("long").as("violations"),
            col("t").cast("long").as("total"), passed.as("passed"))
        }.reduce(_ unionAll _))
      }
    val uniqueReports = checks.collect { case Unique(col0) =>
      df.where(col(col0).isNotNull)
        .agg(count(lit(1)).as("t"), count_distinct(col(col0)).as("d"))
        .select(lit(s"unique:$col0").as("check_name"),
          (col("t") - col("d")).cast("long").as("violations"),
          col("t").cast("long").as("total"),
          (col("t") === col("d")).as("passed"))
    }
    (scanReport.toSeq ++ uniqueReports).reduce(_ unionAll _)
  }

  /** Referential-integrity check: every non-null `fkCol` value exists in
    * `ref`'s `refCol`. One left-anti join on the key columns only. */
  def referential(df: DataFrame, fkCol: String, ref: DataFrame,
      refCol: String, checkName: String): DataFrame = {
    val present = df.where(col(fkCol).isNotNull).select(col(fkCol))
    val orphans = present
      .join(ref.select(col(refCol).as(fkCol)).distinct(), Seq(fkCol), "left_anti")
    present.agg(count(lit(1)).as("t"))
      .crossJoin(orphans.agg(count(lit(1)).as("v")))
      .select(lit(checkName).as("check_name"),
        col("v").cast("long").as("violations"),
        col("t").cast("long").as("total"),
        (col("v") === 0L).as("passed"))
  }
}

package graft.schema

import graft.model.PropertyMeta
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed schema/metadata inference — the engine-side analog of
  * `apoc.meta.data` (neo4j_export.py:58-81).
  *
  * The reference asks the database for per-label property metadata; here
  * we compute it from the data itself in ONE aggregation pass per table
  * (a map-side-combinable `count(col)` per column + `count(*)`), so the
  * cost is a single scan regardless of column count — no per-property
  * scans, no driver-side row iteration. At 100 TB this is the only shape
  * that works: one job, partial aggregation, tiny (1-row) result.
  */
object SchemaInference {

  final case class ColumnStats(name: String, typeToken: String, total: Long, nonNull: Long) {
    def nullable: Boolean = nonNull < total
    def meta: PropertyMeta = PropertyMeta(name, typeToken, nullable)
  }

  /** One aggregation pass: per-column non-null counts + total row count. */
  def columnStats(df: DataFrame): Seq[ColumnStats] = {
    val cols = df.columns.toSeq
    val aggs = count(lit(1)).as("__total") +: cols.map(c => count(col(c)).as(s"__nn_$c"))
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val total = row.getLong(0)
    cols.zipWithIndex.map { case (c, i) =>
      ColumnStats(c, TypeInference.fromCatalyst(df.schema(c).dataType), total, row.getLong(i + 1))
    }
  }

  /** Property metadata for one label's node table: name → {type, nullable}.
    * Ordering follows the DataFrame schema. */
  def inferProperties(df: DataFrame): Seq[PropertyMeta] = columnStats(df).map(_.meta)
}

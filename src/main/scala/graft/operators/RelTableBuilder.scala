package graft.operators

import graft.model.{RelPattern, RelSchema}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Relationship pattern discovery — the analog of the reference's
  * `MATCH (s)-[r:T]->(t) RETURN DISTINCT labels(s)[0], type(r), labels(t)[0]`
  * (neo4j_export.py:342-354). Given an edge DataFrame carrying label
  * columns, one `distinct` over a 3-column projection (a single shuffle on
  * a tiny projection, whatever the edge count).
  */
object RelPatternDiscovery {
  def discover(edges: DataFrame, srcLabelCol: String, relTypeCol: String,
      dstLabelCol: String): Seq[RelPattern] = {
    edges.select(col(srcLabelCol), col(relTypeCol), col(dstLabelCol))
      .distinct()
      .collect() // patterns are schema-sized (tens), not data-sized
      .map(r => RelPattern(r.getString(0), r.getString(1), r.getString(2)))
      .toSeq.sortBy(_.key)
  }
}

/** Per-pattern relationship-table construction — the distributed
  * re-expression of `export_relationships` (neo4j_export.py:356-448):
  *
  *   - endpoint columns named `{Label}_{idProp}`, with `_source`/`_target`
  *     suffixes for self-relationships (neo4j_export.py:383-390);
  *   - rows with NULL endpoints dropped (neo4j_export.py:402-403) — here a
  *     pushed-down notNull filter plus endpoint-existence semi-joins
  *     (the reference's MATCH implies both endpoints exist);
  *   - column order: source, target, sorted rel props (neo4j_export.py:421).
  *
  * Scale: the semi-joins shuffle on the FK only when the node side is too
  * big to broadcast; Catalyst/AQE picks broadcast automatically for dims
  * under the threshold, which is exactly what we want on a 1000-executor
  * cluster — lineitem-sized edge tables never get moved twice.
  */
object RelTableBuilder {

  /** @param edgeTable  rows carrying srcFk, dstFk and the rel's own props
    * @param relProps   the relationship's own property columns (sorted into
    *                   the output after the endpoint columns)
    * @param srcNodeIds single-column DataFrame of valid source ids (built
    *                   from the node table); None to skip endpoint check
    */
  def build(
      pattern: RelPattern,
      edgeTable: DataFrame,
      srcFk: String, dstFk: String,
      srcIdProp: String, dstIdProp: String,
      relProps: Seq[String],
      srcNodeIds: Option[DataFrame] = None,
      dstNodeIds: Option[DataFrame] = None): (DataFrame, RelSchema) = {

    val schema0 = RelSchema(pattern, srcIdProp, dstIdProp, Nil)
    val srcCol = schema0.srcColName
    val dstCol = schema0.dstColName

    var out = edgeTable
      .where(NodeTableBuilder.validId(edgeTable, srcFk) && NodeTableBuilder.validId(edgeTable, dstFk))

    // Endpoint existence — the MATCH semantics. left_semi keeps the edge
    // row shape; Catalyst/AQE broadcasts the id side when it is small.
    srcNodeIds.foreach { ids =>
      out = out.join(ids.toDF("__src_id"), out(srcFk) === col("__src_id"), "left_semi")
    }
    dstNodeIds.foreach { ids =>
      out = out.join(ids.toDF("__dst_id"), out(dstFk) === col("__dst_id"), "left_semi")
    }

    val projected = out.select(
      (col(srcFk).as(srcCol) +: col(dstFk).as(dstCol) +: relProps.sorted.map(col)): _*)
    // Property metadata from the Catalyst schema (free); callers needing
    // observed nullability run SchemaInference on the result explicitly.
    val meta = relProps.sorted.map { p =>
      val f = projected.schema(p)
      graft.model.PropertyMeta(p, graft.schema.TypeInference.fromCatalyst(f.dataType), f.nullable)
    }
    (projected, schema0.copy(properties = meta))
  }
}

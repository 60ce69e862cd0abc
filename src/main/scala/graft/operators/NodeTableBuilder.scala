package graft.operators

import graft.model.LabelSchema
import graft.schema.{GraphCatalog, IdentifierDetector, SchemaInference}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** Node-table construction for one label — the distributed re-expression of
  * `export_nodes` (neo4j_export.py:269-332):
  *
  *   - drop rows whose identifier is NULL / "" / "NULL"
  *     (neo4j_export.py:303-313) — a scan-pushable filter, not a driver loop;
  *   - order columns identifier-first, rest sorted (neo4j_export.py:315-317)
  *     — a zero-cost projection.
  *
  * The reference collects every node into a Python list first
  * (neo4j_export.py:284-292); here the table never leaves the executors.
  */
object NodeTableBuilder {

  /** The reference's missing-identifier predicate (None/""/"NULL"). */
  def validId(df: DataFrame, idCol: String): Column = {
    val c = col(idCol)
    if (df.schema(idCol).dataType == StringType)
      c.isNotNull && c =!= "" && c =!= "NULL"
    else c.isNotNull
  }

  /** Build the export-shaped node table: filtered + reordered. */
  def build(df: DataFrame, identifier: String): DataFrame = {
    require(df.columns.contains(identifier), s"identifier $identifier not in ${df.columns.mkString(",")}")
    val ordered = identifier +: df.columns.filterNot(_ == identifier).sorted.toSeq
    df.where(validId(df, identifier)).select(ordered.map(col): _*)
  }

  /** Detect the identifier, infer property metadata, and build the table. */
  def buildWithSchema(df: DataFrame, label: String,
      catalog: GraphCatalog = GraphCatalog.empty): (DataFrame, LabelSchema) = {
    val id = IdentifierDetector.detect(df, label, catalog)
    val out = build(df, id)
    val props = SchemaInference.inferProperties(out)
    (out, LabelSchema(label, id, props))
  }
}

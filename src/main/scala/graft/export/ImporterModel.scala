package graft.export

import graft.model.{GraphConstraint, GraphIndex, RelPattern}
import graft.schema.TypeInference

/** Inputs to the importer-model generators — the per-label / per-pattern
  * facts the reference carries between `export_nodes` /
  * `export_relationships` and `generate_importer_model`
  * (neo4j_export.py:269-448): ordered CSV columns, the chosen identifier,
  * and a sample row (CSV-rendered strings) for type sniffing.
  */
final case class NodeExport(
    label: String,
    identifier: String,
    properties: Seq[String],        // CSV column order: identifier first
    sample: Map[String, String]) {  // first CSV row; "" when absent
  def csvFileName: String = s"$label.csv"
}

final case class RelExport(
    pattern: RelPattern,
    srcIdProp: String,
    dstIdProp: String,
    srcColName: String,
    dstColName: String,
    relProperties: Seq[String],     // the relationship's own columns, sorted
    sample: Map[String, String]) {
  def allColumns: Seq[String] = Seq(srcColName, dstColName) ++ relProperties
  def csvFileName: String = s"${pattern.key}.csv"
}

object ImporterModel {
  /** Shared helpers for the three format generators. */

  def sampleOf(sample: Map[String, String], prop: String): String =
    sample.getOrElse(prop, "")

  /** Type token from the sample value — the reference's `_infer_type`
    * (neo4j_export.py:1221-1244). */
  def inferType(sample: Map[String, String], prop: String): String =
    TypeInference.fromSample(sampleOf(sample, prop))

  /** The reference marks a property nullable when its sample is missing/
    * NULL (neo4j_export.py:541). */
  def nullable(sample: Map[String, String], prop: String): Boolean = {
    val v = sample.get(prop).orNull
    v == null || v.isEmpty || v == "NULL"
  }

  /** Truncated sample string for tableSchemas (neo4j_export.py:592). */
  def sampleField(sample: Map[String, String], prop: String): String =
    sampleOf(sample, prop).take(50)

  /** Visualisation position grid (neo4j_export.py:510-512). */
  def position(idx: Int): JObj =
    JObj(Seq("x" -> JValue(300 * (idx % 3) - 300), "y" -> JValue(300 * (idx / 3))))

  def propertyJson(id: String, token: String, typeToken: String, isNullable: Boolean): JObj =
    JObj(Seq(
      "$id" -> JStr(id),
      "token" -> JStr(token),
      "type" -> JObj(Seq("type" -> JStr(typeToken))),
      "nullable" -> JBool(isNullable)))

  def tableField(name: String, sample: String, typeToken: String): JObj =
    JObj(Seq(
      "name" -> JStr(name),
      "sample" -> JStr(sample),
      "recommendedType" -> JObj(Seq("type" -> JStr(typeToken)))))

  /** Generate the model for a format version — the dispatch in
    * `generate_importer_model` (neo4j_export.py:450-458). */
  def generate(
      formatVersion: String,
      nodes: Seq[NodeExport],
      rels: Seq[RelExport],
      constraints: Seq[GraphConstraint] = Nil,
      indexes: Seq[GraphIndex] = Nil): JValue = formatVersion match {
    case "3.0"   => ModelV3.generate(nodes, rels)
    case "2.4.0" => ModelV24.generate(nodes, rels, constraints, indexes)
    case _       => ModelV01.generate(nodes, rels)
  }
}

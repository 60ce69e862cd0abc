package graft.export

import graft.model._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import JsonParser.JOps

/** The inverse of [[GraphExporter]]: load a Data Importer v3.0 package
  * (CSVs + `neo4j_importer_model.json`) back into a distributed
  * [[PropertyGraph]] — so a package produced by the reference (or this
  * engine) becomes queryable Spark tables. CSVs are read distributed with
  * types restored from the model's recommendedType tokens; the reference
  * has no import path at all (the Data Importer UI is its consumer), so
  * this closes the round trip.
  */
object GraphImporter {

  private def sparkType(token: String): String = token match {
    case "integer" => "bigint"
    case "float"   => "double"
    case "boolean" => "boolean"
    case _         => "string"
  }

  def fromPackage(spark: SparkSession, dir: String): PropertyGraph = {
    val model = JsonParser.parse(
      java.nio.file.Files.readString(java.nio.file.Paths.get(dir, "neo4j_importer_model.json")))
    val schema = model / "dataModel" / "graphSchemaRepresentation" / "graphSchema"
    val tableSchemas = (model / "dataModel" / "graphMappingRepresentation" /
      "dataSourceSchema" / "tableSchemas").items
      .map(t => (t / "name").str -> t).toMap

    // ---- nodes: one label per nodeLabels entry, CSV named {label}.csv
    val nodeLabels = (schema / "nodeLabels").items
    val nodeRefToLabel = nodeLabels.zipWithIndex
      .map { case (nl, i) => s"n:$i" -> (nl / "token").str }.toMap
    val keyProps: Map[String, String] = {
      val propToken = nodeLabels.flatMap { nl =>
        (nl / "properties").items.map(p => (p / "$id").str -> (p / "token").str)
      }.toMap
      // resolve each entry's node $ref — entries may be reordered or
      // omitted relative to nodeLabels (the reference skips nodes with no
      // key), so positional pairing would mis-assign identifiers
      (model / "dataModel" / "graphSchemaExtensionsRepresentation" / "nodeKeyProperties").items
        .map { kp =>
          val nodeRef = ((kp / "node") / "$ref").str.stripPrefix("#")
          val keyRef = ((kp / "keyProperties").items.head / "$ref").str.stripPrefix("#")
          nodeRefToLabel(nodeRef) -> propToken(keyRef)
        }.toMap
    }

    val nodes: Map[String, (DataFrame, LabelSchema)] = nodeLabels.map { nl =>
      val label = (nl / "token").str
      val csv = tableSchemas(s"$label.csv")
      val fields = (csv / "fields").items.map(f =>
        ((f / "name").str, (f / "recommendedType" / "type").str))
      val raw = spark.read.options(CsvPackageWriter.CsvOptions).csv(s"$dir/$label.csv")
      val typed = raw.select(fields.map { case (n, tok) =>
        when(col(n) === "NULL", lit(null)).otherwise(col(n)).cast(sparkType(tok)).as(n)
      }: _*)
      val props = fields.map { case (n, tok) =>
        PropertyMeta(n, tok, nullable = true)
      }
      label -> (typed, LabelSchema(label, keyProps.getOrElse(label, fields.head._1), props))
    }.toMap

    // ---- relationships: relationshipObjectTypes (pattern-level) joined
    // back to node labels via the n:i refs
    val nodeByRef = nodeRefToLabel
    val relTypeToken = (schema / "relationshipTypes").items
      .map(rt => (rt / "$id").str -> (rt / "token").str).toMap

    val rels: Seq[(RelPattern, DataFrame, RelSchema)] =
      (schema / "relationshipObjectTypes").items.map { rot =>
        val relType = relTypeToken(((rot / "type") / "$ref").str.stripPrefix("#"))
        val srcLabel = nodeByRef(((rot / "from") / "$ref").str.stripPrefix("#"))
        val dstLabel = nodeByRef(((rot / "to") / "$ref").str.stripPrefix("#"))
        val pattern = RelPattern(srcLabel, relType, dstLabel)
        val csv = tableSchemas(pattern.key + ".csv")
        val fields = (csv / "fields").items.map(f =>
          ((f / "name").str, (f / "recommendedType" / "type").str))
        require(fields.size >= 2,
          s"relationship table ${pattern.key}.csv needs source+target columns, got ${fields.map(_._1)}")
        val raw = spark.read.options(CsvPackageWriter.CsvOptions).csv(s"$dir/${pattern.key}.csv")
        val typed = raw.select(fields.map { case (n, tok) =>
          when(col(n) === "NULL", lit(null)).otherwise(col(n)).cast(sparkType(tok)).as(n)
        }: _*)
        val srcId = nodes(srcLabel)._2.identifier
        val dstId = nodes(dstLabel)._2.identifier
        val relProps = fields.map(_._1).filterNot(Set(fields.head._1, fields(1)._1))
        (pattern, typed, RelSchema(pattern, srcId, dstId,
          relProps.map(p => PropertyMeta(p, fields.find(_._1 == p).get._2, nullable = true))))
      }

    PropertyGraph(
      nodes = nodes.map { case (l, (df, _)) => l -> df },
      rels = rels.map(r => r._1 -> r._2).toMap,
      schema = GraphSchema(
        labels = nodeLabels.map(nl => nodes((nl / "token").str)._2),
        rels = rels.map(_._3)))
  }
}

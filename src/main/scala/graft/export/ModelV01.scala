package graft.export

import ImporterModel._

/** Importer model format 0.1.0-beta (legacy) — structural replica of the
  * reference's `_generate_model_v0_1` (neo4j_export.py:1042-1219):
  * graph.nodes with captions, fileSchemas keyed by CSV name,
  * nodeSchemas/relationshipSchemas with per-property identifier UUIDs,
  * and the mapping model.
  *
  * Divergence (improvement): the reference uses `uuid.uuid4()` — output
  * changes every run. We derive name-based UUIDs
  * (`UUID.nameUUIDFromBytes` of "label/property"), so exports are
  * byte-stable and diffable. Quirk replicated: relationship sample data
  * is read from the never-written `{rel_type}.csv` → all relationship
  * property types land as "string"; node CSV fileSchemas only (the
  * reference never adds fileSchemas for relationship CSVs).
  */
object ModelV01 {

  private def propUuid(scope: String, prop: String): String =
    java.util.UUID.nameUUIDFromBytes(s"$scope/$prop".getBytes("UTF-8")).toString

  def generate(nodes: Seq[NodeExport], rels: Seq[RelExport]): JValue = {
    val nodeIdx = nodes.zipWithIndex
    val nodeId = nodeIdx.map { case (n, i) => n.label -> s"n$i" }.toMap

    val graphNodes = JArr(nodeIdx.map { case (n, i) =>
      JObj(Seq(
        "id" -> JStr(s"n$i"),
        "position" -> position(i),
        "caption" -> JStr(n.label)))
    })

    val fileSchemas = JObj(nodes.map { n =>
      n.csvFileName -> (JObj(Seq(
        "expanded" -> JBool(false),
        "fields" -> JArr(n.properties.map(p => JObj(Seq(
          "name" -> JStr(p),
          "type" -> JStr(inferType(n.sample, p)),
          "sample" -> JStr(sampleField(n.sample, p)),
          "include" -> JBool(true))))))): JValue)
    })

    val nodeSchemas = JObj(nodes.map { n =>
      val props = n.properties.map(p => (p, propUuid(n.label, p)))
      nodeId(n.label) -> (JObj(Seq(
        "label" -> JStr(n.label),
        "additionLabels" -> JArr(Nil),
        "labelProperties" -> JArr(Nil),
        "properties" -> JArr(props.map { case (p, u) => JObj(Seq(
          "property" -> JStr(p),
          "type" -> JStr(inferType(n.sample, p)),
          "identifier" -> JStr(u)))
        }),
        "key" -> JObj(Seq(
          "properties" -> JArr(Seq(JStr(propUuid(n.label, n.identifier)))),
          "name" -> JStr(""))))): JValue)
    })

    val emptySample = Map.empty[String, String] // the {rel_type}.csv quirk

    val relIdx = rels.zipWithIndex
    val graphRels = JArr(relIdx.map { case (r, i) =>
      JObj(Seq(
        "id" -> JStr(s"n$i"),
        "type" -> JStr(r.pattern.relType),
        "fromId" -> JStr(nodeId(r.pattern.srcLabel)),
        "toId" -> JStr(nodeId(r.pattern.dstLabel))))
    })

    val relationshipSchemas = JObj(relIdx.map { case (r, i) =>
      s"n$i" -> (JObj(Seq(
        "type" -> JStr(r.pattern.relType),
        "sourceNodeSchema" -> JStr(nodeId(r.pattern.srcLabel)),
        "targetNodeSchema" -> JStr(nodeId(r.pattern.dstLabel)),
        "properties" -> JArr(r.relProperties.map(p => JObj(Seq(
          "property" -> JStr(p),
          "type" -> JStr(inferType(emptySample, p)),
          "identifier" -> JStr(propUuid(r.pattern.key, p)))))))): JValue)
    })

    val nodeMappings = JObj(nodes.map { n =>
      nodeId(n.label) -> (JObj(Seq(
        "nodeSchema" -> JStr(nodeId(n.label)),
        "fileSchema" -> JStr(n.csvFileName),
        "mappings" -> JArr(n.properties.map(p => JObj(Seq("field" -> JStr(p))))))): JValue)
    })

    val relationshipMappings = JObj(relIdx.map { case (r, i) =>
      s"n$i" -> (JObj(Seq(
        "relationshipSchema" -> JStr(s"n$i"),
        "mappings" -> JArr(r.relProperties.map(p => JObj(Seq("field" -> JStr(p))))),
        "sourceMappings" -> JArr(Seq(JObj(Seq("field" -> JStr(r.srcColName))))),
        "targetMappings" -> JArr(Seq(JObj(Seq("field" -> JStr(r.dstColName))))),
        "fileSchema" -> JStr(r.csvFileName))): JValue)
    })

    JObj(Seq(
      "version" -> JStr("0.1.0-beta.0"),
      "graph" -> JObj(Seq(
        "nodes" -> graphNodes,
        "relationships" -> graphRels)),
      "dataModel" -> JObj(Seq(
        "fileModel" -> JObj(Seq("fileSchemas" -> fileSchemas)),
        "graphModel" -> JObj(Seq(
          "nodeSchemas" -> nodeSchemas,
          "relationshipSchemas" -> relationshipSchemas)),
        "mappingModel" -> JObj(Seq(
          "nodeMappings" -> nodeMappings,
          "relationshipMappings" -> relationshipMappings))))))
  }
}

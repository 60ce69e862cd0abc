package graft.export

import graft.model.{GraphConstraint, GraphIndex}
import ImporterModel._

/** Importer model format 2.4.0-beta — structural replica of the
  * reference's `_generate_model_v2_4` (neo4j_export.py:731-1040):
  * n:nX / nl:nX ids, one global p:N property counter starting at 1,
  * relationship types carry from/to directly (one per pattern), indexes +
  * constraints sections, `primaryKeys`/`foreignKeys` stubs on table
  * schemas.
  *
  * Quirk replicated for parity: the reference samples relationship CSVs
  * from `{rel_type}.csv` — a file it never writes (it writes
  * `{src}_{type}_{dst}.csv`, neo4j_export.py:897) — so every relationship
  * property lands as nullable "string". We therefore feed an empty sample
  * map to the relationship side.
  */
object ModelV24 {

  def generate(nodes: Seq[NodeExport], rels: Seq[RelExport],
      constraints: Seq[GraphConstraint], indexes: Seq[GraphIndex]): JValue = {
    val nodeIdx = nodes.zipWithIndex
    val nodeId = nodeIdx.map { case (n, i) => n.label -> s"n:n$i" }.toMap
    val labelId = nodeIdx.map { case (n, i) => n.label -> s"nl:n$i" }.toMap

    var propCounter = 1
    var propId = Map.empty[(String, String), String]

    val visualisation = JObj(Seq("nodes" -> JArr(nodeIdx.map { case (_, i) =>
      JObj(Seq("id" -> JStr(s"n:n$i"), "position" -> position(i)))
    })))

    val nodeLabels = JArr(nodeIdx.map { case (n, _) =>
      JObj(Seq(
        "$id" -> JStr(labelId(n.label)),
        "token" -> JStr(n.label),
        "properties" -> JArr(n.properties.map { p =>
          val id = s"p:$propCounter"
          propId += (n.label, p) -> id
          propCounter += 1
          propertyJson(id, p, inferType(n.sample, p), nullable(n.sample, p))
        })))
    })

    val nodeKeyProperties = JArr(nodes.map { n =>
      JObj(Seq(
        "node" -> JValue.ref(nodeId(n.label)),
        "keyProperties" -> JArr(Seq(JValue.ref(propId((n.label, n.identifier)))))))
    })

    val nodeTableSchemas = nodes.map { n =>
      JObj(Seq(
        "name" -> JStr(n.csvFileName),
        "expanded" -> JBool(false),
        "fields" -> JArr(n.properties.map(p =>
          tableField(p, sampleField(n.sample, p), inferType(n.sample, p)))),
        "primaryKeys" -> JArr(Nil),
        "foreignKeys" -> JArr(Nil)))
    }

    val nodeMappings = JArr(nodes.map { n =>
      JObj(Seq(
        "node" -> JValue.ref(nodeId(n.label)),
        "propertyMappings" -> JArr(n.properties.map(p => JObj(Seq(
          "property" -> JValue.ref(propId((n.label, p))),
          "fieldName" -> JStr(p))))),
        "tableName" -> JStr(n.csvFileName)))
    })

    val emptySample = Map.empty[String, String] // the {rel_type}.csv quirk

    val relationshipTypes = scala.collection.mutable.ArrayBuffer.empty[JValue]
    val relationshipMappings = scala.collection.mutable.ArrayBuffer.empty[JValue]
    val relTableSchemas = scala.collection.mutable.ArrayBuffer.empty[JValue]

    rels.zipWithIndex.foreach { case (r, k) =>
      val relTypeId = s"r:n$k"
      val relPropIds = r.relProperties.map { p =>
        val id = s"p:$propCounter"
        propCounter += 1
        p -> id
      }
      relationshipTypes += JObj(Seq(
        "$id" -> JStr(relTypeId),
        "token" -> JStr(r.pattern.relType),
        "from" -> JValue.ref(labelId(r.pattern.srcLabel)),
        "to" -> JValue.ref(labelId(r.pattern.dstLabel)),
        "properties" -> JArr(relPropIds.map { case (p, id) =>
          propertyJson(id, p, inferType(emptySample, p), nullable(emptySample, p))
        })))

      relationshipMappings += JObj(Seq(
        "relationship" -> JValue.ref(relTypeId),
        "propertyMappings" -> JArr(relPropIds.map { case (p, id) => JObj(Seq(
          "property" -> JValue.ref(id),
          "fieldName" -> JStr(p)))
        }),
        "tableName" -> JStr(r.csvFileName),
        "fromMappings" -> JObj(Seq(propId((r.pattern.srcLabel, r.srcIdProp)) -> JStr(r.srcColName))),
        "toMappings" -> JObj(Seq(propId((r.pattern.dstLabel, r.dstIdProp)) -> JStr(r.dstColName)))))

      relTableSchemas += JObj(Seq(
        "name" -> JStr(r.csvFileName),
        "expanded" -> JBool(false),
        "fields" -> JArr(r.allColumns.map(f =>
          tableField(f, sampleField(emptySample, f), inferType(emptySample, f)))),
        "primaryKeys" -> JArr(Nil),
        "foreignKeys" -> JArr(Nil)))
    }

    var indexCounter = 1
    val indexJson = indexes.filter(_.entityType == "node").flatMap { ix =>
      ix.labels.headOption.flatMap(labelId.get).map { lid =>
        val props = ix.properties.flatMap(p => propId.get((ix.labels.head, p)))
        if (props.isEmpty) None else {
          val j = JObj(Seq(
            "$id" -> JStr(s"i:$indexCounter"),
            "name" -> JStr(ix.name),
            "indexType" -> JStr(if (ix.indexType == "RANGE") "default" else ix.indexType),
            "entityType" -> JStr("node"),
            "nodeLabel" -> JValue.ref(lid),
            "properties" -> JArr(props.map(JValue.ref))))
          indexCounter += 1
          Some(j)
        }
      }.flatten
    }

    var constraintCounter = 0
    val constraintJson = constraints.filter(_.entityType == "node").flatMap { c =>
      c.labels.headOption.flatMap(labelId.get).flatMap { lid =>
        val props = c.properties.flatMap(p => propId.get((c.labels.head, p)))
        if (props.isEmpty) None else {
          val j = JObj(Seq(
            "$id" -> JStr(s"c:$constraintCounter"),
            "name" -> JStr(c.name),
            "constraintType" -> JStr(c.constraintType),
            "entityType" -> JStr("node"),
            "nodeLabel" -> JValue.ref(lid),
            "properties" -> JArr(props.map(JValue.ref))))
          constraintCounter += 1
          Some(j)
        }
      }
    }

    JObj(Seq(
      "version" -> JStr("2.4.0-beta.0"),
      "visualisation" -> visualisation,
      "dataModel" -> JObj(Seq(
        "version" -> JStr("2.4.0-beta.0"),
        "graphSchemaRepresentation" -> JObj(Seq(
          "version" -> JStr("1.0.0"),
          "graphSchema" -> JObj(Seq(
            "nodeLabels" -> nodeLabels,
            "relationshipTypes" -> JArr(relationshipTypes.toSeq),
            "indexes" -> JArr(indexJson),
            "constraints" -> JArr(constraintJson))))),
        "graphSchemaExtensionsRepresentation" -> JObj(Seq(
          "nodeKeyProperties" -> nodeKeyProperties)),
        "graphMappingRepresentation" -> JObj(Seq(
          "dataSourceSchema" -> JObj(Seq(
            "type" -> JStr("local"),
            "tableSchemas" -> JArr(nodeTableSchemas ++ relTableSchemas.toSeq))),
          "nodeMappings" -> nodeMappings,
          "relationshipMappings" -> JArr(relationshipMappings.toSeq))),
        "configurations" -> JObj(Seq("idsToIgnore" -> JArr(Nil)))))))
  }
}

package graft.export

import ImporterModel._

/** Importer model format 3.0.0 — structural replica of the reference's
  * `_generate_model_v3_0` (neo4j_export.py:460-729): id schemes n:X /
  * nl:X / p:X_Y / rt:X / r:X / c:X, nodeObjectTypes split from
  * nodeLabels, relationship *types* deduplicated by token with
  * per-pattern relationshipObjectTypes, `#`-prefixed keys in
  * from/toMappings, and relationship propertyMappings left empty
  * (neo4j_export.py:709 leaves them [] even when the type has
  * properties — replicated for output parity).
  */
object ModelV3 {

  def generate(nodes: Seq[NodeExport], rels: Seq[RelExport]): JValue = {
    val nodeIdx = nodes.zipWithIndex
    val nodeId = nodeIdx.map { case (n, i) => n.label -> s"n:$i" }.toMap
    val labelId = nodeIdx.map { case (n, i) => n.label -> s"nl:$i" }.toMap
    // (label, prop) -> p:i_j
    val propId: Map[(String, String), String] = nodeIdx.flatMap { case (n, i) =>
      n.properties.zipWithIndex.map { case (p, j) => (n.label, p) -> s"p:${i}_$j" }
    }.toMap

    val visualisation = JObj(Seq("nodes" -> JArr(nodeIdx.map { case (_, i) =>
      JObj(Seq("id" -> JStr(s"n:$i"), "position" -> position(i)))
    })))

    val nodeLabels = JArr(nodeIdx.map { case (n, i) =>
      JObj(Seq(
        "$id" -> JStr(labelId(n.label)),
        "token" -> JStr(n.label),
        "properties" -> JArr(n.properties.map(p =>
          propertyJson(propId((n.label, p)), p, inferType(n.sample, p), nullable(n.sample, p))))))
    })

    val nodeObjectTypes = JArr(nodeIdx.map { case (n, _) =>
      JObj(Seq(
        "$id" -> JStr(nodeId(n.label)),
        "labels" -> JArr(Seq(JValue.ref(labelId(n.label))))))
    })

    // key property: the identifier (first property), like the reference's
    // unique-constraint-then-first-property fallback (neo4j_export.py:556-564)
    val keyPropId = nodes.map(n => n.label -> propId((n.label, n.identifier))).toMap

    val nodeKeyProperties = JArr(nodes.map { n =>
      JObj(Seq(
        "node" -> JValue.ref(nodeId(n.label)),
        "keyProperties" -> JArr(Seq(JValue.ref(keyPropId(n.label))))))
    })

    val constraints = JArr(nodeIdx.map { case (n, i) =>
      JObj(Seq(
        "$id" -> JStr(s"c:$i"),
        "name" -> JStr(s"${n.properties.head}_${n.label}_uniq"),
        "constraintType" -> JStr("uniqueness"),
        "entityType" -> JStr("node"),
        "nodeLabel" -> JValue.ref(labelId(n.label)),
        "relationshipType" -> JNull,
        "properties" -> JArr(Seq(JValue.ref(keyPropId(n.label))))))
    })

    // Relationship types dedup'd by token; note the reference's off-by-one
    // quirk: rt:K's property ids are p:r{K+1}_j (counter incremented before
    // property-id generation, neo4j_export.py:633-654). Replicated.
    var relTypeTokens = Map.empty[String, String]
    var relTypeCounter = 0
    val relationshipTypes = scala.collection.mutable.ArrayBuffer.empty[JValue]
    val relationshipObjectTypes = scala.collection.mutable.ArrayBuffer.empty[JValue]
    val relationshipMappings = scala.collection.mutable.ArrayBuffer.empty[JValue]
    val relTableSchemas = scala.collection.mutable.ArrayBuffer.empty[JValue]

    rels.zipWithIndex.foreach { case (r, j) =>
      val relTypeId = relTypeTokens.get(r.pattern.relType) match {
        case Some(id) => id
        case None =>
          val id = s"rt:$relTypeCounter"
          relTypeTokens += r.pattern.relType -> id
          relTypeCounter += 1
          relationshipTypes += JObj(Seq(
            "$id" -> JStr(id),
            "token" -> JStr(r.pattern.relType),
            "properties" -> JArr(r.relProperties.zipWithIndex.map { case (p, k) =>
              propertyJson(s"p:r${relTypeCounter}_$k", p, inferType(r.sample, p), nullable(r.sample, p))
            })))
          id
      }
      val relObjId = s"r:$j"
      relationshipObjectTypes += JObj(Seq(
        "$id" -> JStr(relObjId),
        "type" -> JValue.ref(relTypeId),
        "from" -> JValue.ref(nodeId(r.pattern.srcLabel)),
        "to" -> JValue.ref(nodeId(r.pattern.dstLabel))))

      relationshipMappings += JObj(Seq(
        "relationship" -> JValue.ref(relObjId),
        "tableName" -> JStr(r.csvFileName),
        "fromMappings" -> JObj(Seq(
          s"#${propId((r.pattern.srcLabel, r.srcIdProp))}" -> JStr(r.srcColName))),
        "toMappings" -> JObj(Seq(
          s"#${propId((r.pattern.dstLabel, r.dstIdProp))}" -> JStr(r.dstColName))),
        "propertyMappings" -> JArr(Nil)))

      relTableSchemas += JObj(Seq(
        "name" -> JStr(r.csvFileName),
        "expanded" -> JBool(true),
        "fields" -> JArr(r.allColumns.map(f =>
          tableField(f, sampleField(r.sample, f), inferType(r.sample, f))))))
    }

    val nodeTableSchemas = nodes.map { n =>
      JObj(Seq(
        "name" -> JStr(n.csvFileName),
        "expanded" -> JBool(false),
        "fields" -> JArr(n.properties.map(p =>
          tableField(p, sampleField(n.sample, p), inferType(n.sample, p))))))
    }

    val nodeMappings = JArr(nodes.map { n =>
      JObj(Seq(
        "node" -> JValue.ref(nodeId(n.label)),
        "propertyMappings" -> JArr(n.properties.map(p => JObj(Seq(
          "property" -> JValue.ref(propId((n.label, p))),
          "fieldName" -> JStr(p))))),
        "tableName" -> JStr(n.csvFileName)))
    })

    JObj(Seq(
      "version" -> JStr("3.0.0"),
      "visualisation" -> visualisation,
      "dataModel" -> JObj(Seq(
        "version" -> JStr("3.0"),
        "graphSchemaRepresentation" -> JObj(Seq(
          "version" -> JStr("1.0.0"),
          "graphSchema" -> JObj(Seq(
            "nodeLabels" -> nodeLabels,
            "relationshipTypes" -> JArr(relationshipTypes.toSeq),
            "nodeObjectTypes" -> nodeObjectTypes,
            "relationshipObjectTypes" -> JArr(relationshipObjectTypes.toSeq),
            "constraints" -> constraints,
            "indexes" -> JArr(Nil))))),
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

package graft.model

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet at-rest layout for a PropertyGraph:
  *
  * {{{
  *   <root>/nodes/<label>/          (hash-partitioned on the identifier)
  *   <root>/rels/<pattern-key>/     (hash-partitioned on the source key)
  *   <root>/_schema.json            (labels, identifiers, patterns)
  * }}}
  *
  * Repartitioning node tables by id and edge tables by source key at write
  * time means later endpoint joins and degree aggregations start
  * co-partitioned — the "pay the shuffle once" layout for a graph that is
  * written once and queried many times.
  */
object PropertyGraphIO {
  import graft.export.{JArr, JObj, JStr, JValue, JsonParser}
  import JsonParser.JOps

  def save(g: PropertyGraph, root: String, bucketsPerTable: Int = 0): Unit = {
    g.schema.labels.foreach { ls =>
      val df = g.nodes(ls.label)
      val out = if (bucketsPerTable > 0) df.repartition(bucketsPerTable, col(ls.identifier)) else df
      out.write.mode(SaveMode.Overwrite).parquet(s"$root/nodes/${ls.label}")
    }
    g.schema.rels.foreach { rs =>
      val df = g.rels(rs.pattern)
      val out = if (bucketsPerTable > 0) df.repartition(bucketsPerTable, col(rs.srcColName)) else df
      out.write.mode(SaveMode.Overwrite).parquet(s"$root/rels/${rs.pattern.key}")
    }
    val schemaJson = JObj(Seq(
      "labels" -> JArr(g.schema.labels.map(ls => JObj(Seq(
        "label" -> JStr(ls.label), "identifier" -> JStr(ls.identifier))))),
      "rels" -> JArr(g.schema.rels.map(rs => JObj(Seq(
        "src" -> JStr(rs.pattern.srcLabel), "relType" -> JStr(rs.pattern.relType),
        "dst" -> JStr(rs.pattern.dstLabel),
        "srcIdProp" -> JStr(rs.srcIdProp), "dstIdProp" -> JStr(rs.dstIdProp)))))))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(root))
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(root, "_schema.json"), schemaJson.render() + "\n")
  }

  def load(spark: SparkSession, root: String): PropertyGraph = {
    val schemaJson = JsonParser.parse(
      java.nio.file.Files.readString(java.nio.file.Paths.get(root, "_schema.json")))
    val labels = (schemaJson / "labels").items.map { l =>
      val label = (l / "label").str
      val df = spark.read.parquet(s"$root/nodes/$label")
      (label, (l / "identifier").str, df)
    }
    val rels = (schemaJson / "rels").items.map { r =>
      val pattern = RelPattern((r / "src").str, (r / "relType").str, (r / "dst").str)
      val df = spark.read.parquet(s"$root/rels/${pattern.key}")
      val rs = RelSchema(pattern, (r / "srcIdProp").str, (r / "dstIdProp").str,
        df.columns.drop(2).toSeq.map(c => PropertyMeta(c,
          graft.schema.TypeInference.fromCatalyst(df.schema(c).dataType), df.schema(c).nullable)))
      (pattern, df, rs)
    }
    PropertyGraph(
      nodes = labels.map { case (l, _, df) => l -> df }.toMap,
      rels = rels.map(r => r._1 -> r._2).toMap,
      schema = GraphSchema(
        labels = labels.map { case (l, id, df) =>
          LabelSchema(l, id, df.schema.fields.toSeq.map(f => PropertyMeta(f.name,
            graft.schema.TypeInference.fromCatalyst(f.dataType), f.nullable)))
        },
        rels = rels.map(_._3)))
  }
}

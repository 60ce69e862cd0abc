package graft.export

import java.nio.file.{Files, Paths}
import graft.model.{PropertyGraph, RelSchema}
import org.apache.spark.sql.{DataFrame, Row}

/** End-to-end export pipeline — the engine's `export_all`
  * (neo4j_export.py:1278-1333): node CSVs per label, relationship CSVs per
  * pattern, `neo4j_importer_model.json` in the chosen format, optional
  * zip. Everything data-sized is a distributed write; only the model JSON
  * (schema-sized metadata) is assembled on the driver, which is also how
  * the reference behaves — minus its full-database driver collect.
  */
object GraphExporter {

  final case class ExportResult(
      outputDir: String,
      nodeFiles: Map[String, String],
      relFiles: Map[String, String],
      modelPath: String,
      zipPath: Option[String])

  /** CSV-rendered first row of a table: prop -> string ("NULL" for null).
    * Uses CsvPackageWriter's own stringification so the sniffed sample is
    * byte-identical with what the written CSV contains (Row.get.toString
    * would render e.g. timestamps differently). */
  private def sampleRow(df: DataFrame): Map[String, String] =
    CsvPackageWriter.stringified(df).take(1).headOption.map { row: Row =>
      df.columns.zipWithIndex.map { case (c, i) =>
        c -> (if (row.isNullAt(i)) "NULL" else row.getString(i))
      }.toMap
    }.getOrElse(Map.empty)

  def exportAll(
      graph: PropertyGraph,
      outputDir: String,
      formatVersion: String = "3.0",
      singleFileCsv: Boolean = true,
      createZip: Boolean = true,
      zipName: Option[String] = None): ExportResult = {
    Files.createDirectories(Paths.get(outputDir))

    // --- node CSVs (identifier-first ordering is already the table shape)
    val nodeExports = graph.schema.labels.map { ls =>
      val df = graph.nodes(ls.label)
      CsvPackageWriter.write(df, outputDir, ls.label, singleFileCsv)
      NodeExport(ls.label, ls.identifier, df.columns.toSeq, sampleRow(df))
    }

    // --- relationship CSVs
    val relExports = graph.schema.rels.map { rs: RelSchema =>
      val df = graph.rels(rs.pattern)
      CsvPackageWriter.write(df, outputDir, rs.pattern.key, singleFileCsv)
      RelExport(rs.pattern, rs.srcIdProp, rs.dstIdProp, rs.srcColName, rs.dstColName,
        rs.properties.map(_.name).sorted, sampleRow(df))
    }

    // --- importer model
    val model = ImporterModel.generate(formatVersion, nodeExports, relExports,
      graph.schema.constraints, graph.schema.indexes)
    val modelPath = Paths.get(outputDir, "neo4j_importer_model.json")
    Files.writeString(modelPath, model.render() + "\n")

    // --- zip
    val zipPath = if (createZip) {
      val name = zipName.getOrElse(s"${Paths.get(outputDir).getFileName}-export.zip")
      Some(ZipPackager.zipDirectory(outputDir, Paths.get(outputDir).resolveSibling(name).toString).toString)
    } else None

    ExportResult(
      outputDir,
      nodeExports.map(n => n.label -> n.csvFileName).toMap,
      relExports.map(r => r.pattern.key -> r.csvFileName).toMap,
      modelPath.toString,
      zipPath)
  }
}

package graft.tools

import graft.export.GraphExporter
import graft.model.TpchGraph
import org.apache.spark.sql.SparkSession

/** CLI driver for the full export pipeline: builds the TPC-H property
  * graph from a scale-factor directory and writes a complete Data
  * Importer package (CSVs + model JSON + zip).
  *
  * Usage: runMain graft.tools.ExportDemo <sfDir> <outDir> [formatVersion]
  */
object ExportDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val outDir = args.lift(1).getOrElse("/tmp/graft_export")
    val format = args.lift(2).getOrElse("3.0")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val result = GraphExporter.exportAll(TpchGraph.load(spark, sfDir), outDir, format)
    println(s"[export] nodes: ${result.nodeFiles.keys.toSeq.sorted.mkString(", ")}")
    println(s"[export] rels: ${result.relFiles.keys.toSeq.sorted.mkString(", ")}")
    println(s"[export] model: ${result.modelPath}")
    println(s"[export] zip: ${result.zipPath.getOrElse("-")}")
    spark.stop()
  }
}

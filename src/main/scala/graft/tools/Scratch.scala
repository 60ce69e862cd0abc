package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc local probe; not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val g = graft.export.GraphImporter.fromPackage(spark, "/tmp/graft_export")
    println("[import] labels: " + g.nodes.keys.toSeq.sorted.mkString(","))
    println("[import] customers: " + g.nodes("Customer").count())
    println("[import] contains edges: " + g.rels(graft.model.RelPattern("Order","CONTAINS","Part")).count())
    g.nodes("Customer").printSchema()
    spark.stop()
  }
}

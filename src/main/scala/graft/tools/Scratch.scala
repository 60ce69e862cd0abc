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
    val dir = "/root/testdata/sf0.1"
    println("===== q5 =====")
    graft.queries.RelationalQueries.q5(spark, dir).explain("formatted")
    println("===== g_rel_order_contains_part =====")
    graft.queries.GraphQueries.relOrderContainsPart(spark, dir).explain("formatted")
    spark.stop()
  }
}

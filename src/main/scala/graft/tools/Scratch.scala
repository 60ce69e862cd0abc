package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc local probe; not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    println("[keys] " + graft.SparkEntry.queries.keys.toSeq.sorted.mkString(","))
    println("[entry] rows=" + graft.SparkEntry.entry(spark).count())
    spark.stop()
  }
}

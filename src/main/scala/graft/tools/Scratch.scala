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
    try {
      val ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
      ev.printSchema()
      ev.show(3, truncate = false)
    } catch { case e: Throwable => println("plain read failed: " + e.getMessage) }
    try {
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
      ev.printSchema()
      ev.show(3, truncate = false)
    } catch { case e: Throwable => println("nanosAsLong read failed: " + e.getMessage) }
    spark.stop()
  }
}

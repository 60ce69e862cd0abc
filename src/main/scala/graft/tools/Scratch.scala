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
    // drive the streaming surface: windowed counts over the real events feed
    val dir = java.nio.file.Files.createTempDirectory("ev").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      java.nio.file.Paths.get(dir, "events.parquet"))
    val q = graft.streaming.EventStreams
      .windowedCounts(graft.streaming.EventStreams.readEvents(spark, dir))
      .writeStream.outputMode("complete").format("memory").queryName("demo").start()
    q.processAllAvailable()
    println("[stream] windowed rows: " + spark.table("demo").count())
    spark.table("demo").orderBy("window_start", "event_type").show(5)
    q.stop()
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.sql.SparkSession

// scratch profiling main — not committed
object Probe {
  def main(args: Array[String]): Unit = {
    System.setProperty("graft.coreness.debug", "1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val t0 = System.nanoTime
    val n = graft.queries.AnalyticsQueries.queries("g_coreness")(spark, "/root/repo/testdata_sf1").count()
    println(f"[probe] g_coreness total ${(System.nanoTime - t0) / 1e9}%8.2f s rows=$n")
    spark.stop()
  }
}

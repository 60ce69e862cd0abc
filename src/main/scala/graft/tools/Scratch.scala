package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc local probe; not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val edges = graft.queries.AnalyticsQueries.sccFixtureEdges(spark, dir)
    val t0 = System.nanoTime()
    val r = graft.operators.Mis.jpColoring(edges, rounds = args.drop(1).headOption.map(_.toInt).getOrElse(12), srcCol = "src", dstCol = "dst")
      .localCheckpoint(true)
    println("ELAPSED:" + (System.nanoTime() - t0) / 1e9)
    println("SENTINEL:" + r.where(col("vid") === -1L).collect().mkString(","))
    println("TOP:" + r.groupBy("color").count().orderBy(desc("color")).limit(6).collect().mkString(" "))
    spark.stop()
  }
}

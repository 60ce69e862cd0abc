package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Ad-hoc local probe; not part of the library surface. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val dir = "/root/testdata/sf0.01"
    val (edges, _) = graft.operators.GraphAnalytics.unifiedEdges(graft.model.TpchGraph.load(spark, dir))
    val e = edges.select(col("src").as("u"), col("dst").as("v")).where(col("u") =!= col("v"))
    val und = e.unionAll(e.select(col("v").as("u"), col("u").as("v")))
      .distinct().repartition(col("u")).persist(StorageLevel.MEMORY_AND_DISK)
    println("[und] " + und.count())
    var labels = und.select(col("u").as("vid")).distinct().withColumn("community", col("vid"))
    val next = und.join(broadcast(labels), und("v") === labels("vid"))
      .groupBy(und("u"), col("community")).agg(count(lit(1)).as("n"))
      .groupBy(col("u"))
      .agg(max(struct(col("n"), (-col("community")).as("negc"))).as("m"))
      .select(col("u").as("vid"), (-col("m.negc")).as("community"))
    next.explain("formatted")
    // round 2: does the shape survive a localCheckpoint of labels?
    val l2 = next.localCheckpoint(true)
    val next2 = und.join(broadcast(l2), und("v") === l2("vid"))
      .groupBy(und("u"), col("community")).agg(count(lit(1)).as("n"))
      .groupBy(col("u"))
      .agg(max(struct(col("n"), (-col("community")).as("negc"))).as("m"))
      .select(col("u").as("vid"), (-col("m.negc")).as("community"))
    next2.explain("formatted")
    spark.stop()
  }
}

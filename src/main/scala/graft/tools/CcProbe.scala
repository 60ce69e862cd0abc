package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Temporary probe: per-phase timing of the distributed CC path at sf1. */
object CcProbe {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "testdata_sf1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", "16g")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ccprobe] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val g = t("load")(graft.model.TpchGraph.load(spark, dir))
    val (edges, _) = t("unifiedEdges")(graft.operators.GraphAnalytics.unifiedEdges(g))
    val e2 = t("edges ckpt")(edges.localCheckpoint(true))
    println(s"[ccprobe] edge rows: ${e2.count()}")
    // forest-size estimate for two-level contraction: per-partition
    // distinct vids minus local component count = local forest edges
    val fs = t("forest estimate")(e2
      .select(spark_partition_id().as("p"), col("src").as("a"), col("dst").as("b"))
      .select(col("p"), explode(array(col("a"), col("b"))).as("vid"))
      .groupBy("p").agg(countDistinct(col("vid")).as("nv"))
      .agg(sum(col("nv"))).head().getLong(0))
    println(s"[ccprobe] sum per-partition distinct vids (forest upper bound): $fs")
    val res = t("cc total")(
      graft.operators.DataFramePregel.connectedComponents(e2, localThreshold = 0L))
    println(s"[ccprobe] assignments: ${t("final count")(res.count())}")
    spark.stop()
  }
}

package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    sys.props("graft.coreness.debug") = "1"
    val dir = "/root/testdata/sf0.1"
    val (edges, _) = graft.operators.GraphAnalytics.unifiedEdges(graft.model.TpchGraph.load(spark, dir))
    val t0 = System.nanoTime()
    val (df, sizes) = graft.operators.GraphAnalytics.corenessWithStats(edges, rounds = 16)
    val n = df.count()
    println("ELAPSED: " + (System.nanoTime()-t0)/1e9)
    println("ROWS: " + n)
    println("FRONTIER: " + sizes.mkString(","))
    spark.stop()
  }
}

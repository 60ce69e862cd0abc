package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Detailed plan dump for named queries (PushedFilters / join strategies /
  * ReadSchema) — the evidence PLANS.md quotes. */
object PlanDetail {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args(1).split(",").toSeq
      else Seq("q1_pricing_summary", "q3_shipping_priority", "ss_cosine_topk")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, sfDir)
      df.queryExecution.executedPlan.execute().count()
      val plan = df.queryExecution.executedPlan.toString
      println(s"===== $n =====")
      plan.linesIterator
        .filter(l => l.contains("PushedFilters") || l.contains("Join") ||
          l.contains("ReadSchema") || l.contains("Exchange"))
        .map(_.take(220)).foreach(println)
    }
    spark.stop()
  }
}

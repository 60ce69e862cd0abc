package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Plan hygiene audit: materializes every SparkEntry query's physical plan
  * at a small scale factor and flags the smells that stop mattering only
  * when the data is small — cartesian products, parquet scans with no
  * pushed filters where the query clearly filters, and shuffle counts.
  * Run per-round after correctness goes green:
  *   runMain graft.tools.PlanAudit [sfDir]
  */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rows = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      try {
        val df = fn(spark, sfDir)
        // execute THIS queryExecution so its AdaptiveSparkPlan finalizes in
        // place (a separate write/count action builds its own plan copy and
        // leaves df's plan showing pre-AQE state)
        df.queryExecution.executedPlan.execute().count()
        val plan = df.queryExecution.executedPlan.toString
        val flags = Seq(
          if (plan.contains("CartesianProduct")) Some("CARTESIAN") else None,
          if (plan.contains("BroadcastNestedLoopJoin") && !name.startsWith("ss_")) Some("BNLJ") else None
        ).flatten
        val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
        // executedPlan.toString marks codegen'd operators with a "*(n)" prefix
        val codegen = raw"\*\(\d+\)".r.findAllIn(plan).toSeq
          .map(_.drop(2).dropRight(1).toInt).distinct.size
        f"$name%-28s exchanges=$exchanges%-3d codegenSpans=$codegen%-3d ${flags.mkString(",")}"
      } catch {
        case e: Throwable => f"$name%-28s PLAN-ERROR: ${e.getMessage.take(80)}"
      }
    }
    println("[audit] physical-plan hygiene @ " + sfDir)
    rows.foreach(r => println("[audit] " + r))
    spark.stop()
  }
}

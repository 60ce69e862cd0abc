package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Full `explain("formatted")` dump for named queries, one file per
  * query — the before/after plan evidence the optimization rounds
  * commit under plans/<round>/. For loop-shaped operators whose work
  * happens in per-round jobs during construction, the top-level plan is
  * the outer union; pair these files with a QueryProbe stage dump when
  * the claim is about per-round stages.
  *
  *   runMain graft.tools.PlanDump <sfDir> <outDir> <q1,q2,...> [suffix]
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanDump <sfDir> <outDir> <q1,q2,...> [suffix]")
    val (sfDir, outDir) = (args(0), args(1))
    val names = args(2).split(",").toSeq
    val suffix = if (args.length > 3) args(3) else ""
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    names.foreach { n =>
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(outDir, s"$n$suffix.txt"), txt)
        println(s"[plandump] wrote $outDir/$n$suffix.txt")
      } catch {
        case t: Throwable => println(s"[plandump] $n FAILED: ${t.getMessage}")
      }
    }
    spark.stop()
  }
}

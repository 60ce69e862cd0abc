package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Throwaway profiling main for the coreness per-round fixed-cost floor:
  * runs [[graft.operators.GraphAnalytics.coreness]] on the unified graph
  * of the given SF dir with a stage listener, printing every completed
  * stage's wall time, task count, and shuffle bytes interleaved with the
  * per-round debug lines — attribution for which stage class (adjacency
  * scan, value-broadcast build, window, count) owns the 2-5 s/round
  * frontier floor that VERDICT r10 flagged.
  *
  * Usage: `sbt "runMain graft.tools.CorenessProbe /root/repo/testdata_sf1"`.
  */
object CorenessProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("PROBE_AQE", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(j: org.apache.spark.scheduler.SparkListenerJobStart): Unit =
        println(s"[job] start id=${j.jobId} t=${j.time % 1000000}")
      override def onJobEnd(j: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        println(s"[job] end   id=${j.jobId} t=${j.time % 1000000}")
    })
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val ms = (for (a <- i.completionTime; b <- i.submissionTime) yield a - b).getOrElse(-1L)
        val m = i.taskMetrics
        println(f"[stage] id=${i.stageId}%-4d ms=$ms%-6d tasks=${i.numTasks}%-3d " +
          f"srd=${m.shuffleReadMetrics.totalBytesRead}%-10d swr=${m.shuffleWriteMetrics.bytesWritten}%-10d " +
          i.name.take(90))
      }
    })
    sys.props("graft.coreness.debug") = "1"
    val (edges, _) = graft.operators.GraphAnalytics.unifiedEdges(graft.model.TpchGraph.load(spark, dir))
    val t0 = System.nanoTime()
    val out = graft.operators.GraphAnalytics.coreness(edges, rounds = 16)
    val n = out.count()
    println(f"[probe] total=${(System.nanoTime() - t0) / 1e9}%.1f s rows=$n")
    spark.stop()
  }
}

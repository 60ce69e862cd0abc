package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** Generic stage/job-timeline profiler for any registered SparkEntry
  * query (the instrument that found the round-11 coreness wins):
  * per-stage wall/tasks/shuffle bytes, plus job start/end timestamps so
  * ZERO-JOB GAPS — driver-side work like broadcast hash-relation builds
  * and planning — become visible. The stage log attributes executor
  * time; the gaps attribute driver time; together they account for the
  * wall.
  *
  * Usage: `sbt "runMain graft.tools.QueryProbe <sfDir> <queryKey>"`.
  */
object QueryProbe {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: QueryProbe <sfDir> <queryKey>")
    val (dir, key) = (args(0), args(1))
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var lastJobEnd = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val gap = if (lastJobEnd > 0) j.time - lastJobEnd else 0L
        if (gap > 100) println(f"[probe] DRIVER GAP ${gap}ms before job ${j.jobId}")
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit = lastJobEnd = j.time
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val ms = (for (a <- i.completionTime; b <- i.submissionTime) yield a - b).getOrElse(-1L)
        val m = i.taskMetrics
        if (ms > 50)
          println(f"[probe] stage=${i.stageId}%-4d ms=$ms%-6d tasks=${i.numTasks}%-4d " +
            f"srd=${m.shuffleReadMetrics.totalBytesRead / 1000000}%-5dMB swr=${m.shuffleWriteMetrics.bytesWritten / 1000000}%-5dMB " +
            i.name.take(60))
      }
    })
    val t0 = System.nanoTime()
    val n = graft.SparkEntry.queries(key)(spark, dir).count()
    println(f"[probe] $key rows=$n wall=${(System.nanoTime() - t0) / 1e9}%.1f s")
    Thread.sleep(500)
    spark.stop()
  }
}

package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted, SparkListenerTaskEnd}
import org.apache.spark.sql.SparkSession
import scala.collection.mutable

/** Per-task time distribution for the hub-skew fixture queries
  * (g_skew_pagerank / g_skew_cc): records every stage's task-duration
  * max vs median so hot-partition stragglers — the thing the fixture's
  * 8 × |orders|/8-degree hubs exist to provoke — are measured, not
  * assumed. Prints the top stages by max-task time with their skew
  * ratio (max/median task duration).
  *
  * Usage: `sbt "runMain graft.tools.SkewProbe /root/repo/testdata_sf1"`.
  */
object SkewProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val taskMs = mutable.Map.empty[Int, mutable.ArrayBuffer[Long]]
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit = synchronized {
        taskMs.getOrElseUpdate(t.stageId, mutable.ArrayBuffer.empty) += t.taskInfo.duration
      }
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = ()
    })
    Seq("g_skew_pagerank", "g_skew_cc").foreach { q =>
      taskMs.clear()
      val t0 = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, dir).count()
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(500) // listener bus drain
      val report = taskMs.toSeq.map { case (sid, ds) =>
        val sorted = ds.sorted
        (sid, ds.size, sorted(ds.size / 2), sorted.last)
      }.sortBy(-_._4).take(8)
      println(f"[skew] $q rows=$n wall=$wall%.1f s — top stages by max task ms:")
      report.foreach { case (sid, n2, med, mx) =>
        println(f"[skew]   stage=$sid%-5d tasks=$n2%-4d medianTask=${med}ms maxTask=${mx}ms ratio=${mx.toDouble / math.max(1, med)}%.1f")
      }
    }
    spark.stop()
  }
}

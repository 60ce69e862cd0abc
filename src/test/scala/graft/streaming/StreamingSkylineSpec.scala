package graft.streaming

import java.nio.file.Files
import graft.SparkTestBase
import graft.operators.Skyline
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSkylineSpec extends SparkTestBase {
  import spark.implicits._

  private val criteria = Seq(
    Skyline.Criterion("a", col("a"), maximize = true),
    Skyline.Criterion("b", col("b"), maximize = true))

  test("incremental front equals the batch skyline of everything seen") {
    val frontDir = Files.createTempDirectory("sky-front").toString
    val ckpt = Files.createTempDirectory("sky-ckpt").toString

    val b0 = Seq((1L, 1, 5), (2L, 3, 3), (3L, 1, 1))
    val b1 = Seq((4L, 5, 1), (5L, 2, 2))   // 4 joins the front; 5 dominated
    val b2 = Seq((6L, 6, 6))               // 6 dominates EVERYTHING

    val ms = MemoryStream[(Long, Int, Int)](spark)
    val q = StreamingSkyline.incrementalSkyline(
      ms.toDF().toDF("id", "a", "b"), criteria, frontDir, ckpt)
    try {
      ms.addData(b0: _*); q.processAllAvailable()
      val f0 = StreamingSkyline.currentFront(spark, frontDir)
        .select("id").as[Long].collect().toSet
      assert(f0 == Set(1L, 2L))

      ms.addData(b1: _*); q.processAllAvailable()
      val f1 = StreamingSkyline.currentFront(spark, frontDir)
        .select("id").as[Long].collect().toSet
      assert(f1 == Set(1L, 2L, 4L))

      ms.addData(b2: _*); q.processAllAvailable()
      val f2 = StreamingSkyline.currentFront(spark, frontDir)
        .select("id").as[Long].collect().toSet
      assert(f2 == Set(6L))

      // stream ≡ batch over the full history
      val batch = Skyline.skyline((b0 ++ b1 ++ b2).toDF("id", "a", "b"), criteria)
        .select("id").as[Long].collect().toSet
      assert(f2 == batch)
    } finally q.stop()
  }

  test("per-key incremental fronts stay independent") {
    val frontDir = Files.createTempDirectory("sky2-front").toString
    val ckpt = Files.createTempDirectory("sky2-ckpt").toString
    val ms = MemoryStream[(String, Long, Int, Int)](spark)
    val q = StreamingSkyline.incrementalSkyline(
      ms.toDF().toDF("g", "id", "a", "b"), criteria, frontDir, ckpt,
      keyCols = Seq("g"))
    try {
      ms.addData(("g1", 1L, 5, 5), ("g2", 2L, 1, 1)); q.processAllAvailable()
      ms.addData(("g2", 3L, 2, 2)); q.processAllAvailable()
      val f = StreamingSkyline.currentFront(spark, frontDir)
        .select("g", "id").as[(String, Long)].collect().toSet
      // g1's (5,5) does not evict g2's points; g2's (2,2) evicts (1,1)
      assert(f == Set(("g1", 1L), ("g2", 3L)))
    } finally q.stop()
  }
}

package graft.streaming

import java.nio.file.Files
import graft.SparkTestBase
import graft.operators.GraphAnalytics
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingLinkFeaturesSpec extends SparkTestBase {
  import spark.implicits._

  private type FeatRow = (Long, Long, Long, Double, Double, Long)

  test("incremental features: per-batch affected-set updates equal the full recompute") {
    val stateDir = Files.createTempDirectory("slf-state").toString
    val ckpt = Files.createTempDirectory("slf-ckpt").toString
    val ms = MemoryStream[(Long, Long)](spark)
    val q = StreamingLinkFeatures.incremental(
      ms.toDF().toDF("src", "dst"), "src", "dst", stateDir, ckpt,
      topPerVertex = 5, minCommon = 1)
    try {
      // batch 0: the hand-computed wedge graph
      ms.addData((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
      q.processAllAvailable()
      val gen0 = StreamingLinkFeatures.latestFeatures(spark, stateDir)
        .as[FeatRow].collect().toSet
      val full0 = GraphAnalytics.linkFeatures(
        Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)).toDF("u", "v"), "u", "v",
        topPerVertex = 5, minCommon = 1)
        .as[FeatRow].collect().toSet
      assert(gen0 == full0 && gen0.nonEmpty)

      // batch 1: edge (4,5). deg(4) changes 1→2, which feeds the new
      // wedge 3–4–5 AND jaccard(1,4)/jaccard(2,4) — anchors 1 and 2 are
      // TWO hops from the delta (the case that proves the 2-hop
      // affected set: a 1-hop set left their gen0 rows stale at 0.5
      // instead of 0.333333).
      ms.addData((4L, 5L))
      q.processAllAvailable()
      val gen1 = StreamingLinkFeatures.latestFeatures(spark, stateDir)
        .as[FeatRow].collect().toSet
      val full1 = GraphAnalytics.linkFeatures(
        Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L)).toDF("u", "v"), "u", "v",
        topPerVertex = 5, minCommon = 1)
        .as[FeatRow].collect().toSet
      assert(gen1 == full1)
      // the update was real: 3 gained candidate 5 (via 4), and (3,5)
      // is a non-edge negative example
      assert(gen1.exists(r => r._1 == 3L && r._2 == 5L && r._6 == 0L))
    } finally q.stop()
  }
}

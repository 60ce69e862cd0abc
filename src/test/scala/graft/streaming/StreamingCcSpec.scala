package graft.streaming

import java.nio.file.Files
import graft.SparkTestBase
import graft.operators.DataFramePregel
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingCcSpec extends SparkTestBase {
  import spark.implicits._

  test("incremental CC: batches merge components, final labels equal batch CC over full log") {
    val stateDir = Files.createTempDirectory("scc-state").toString
    val ckpt = Files.createTempDirectory("scc-ckpt").toString
    val ms = MemoryStream[(Long, Long)](spark)
    val q = StreamingCc.incrementalCc(
      ms.toDF().toDF("src", "dst"), "src", "dst", stateDir, ckpt)
    try {
      // batch 0: two separate components {1,2,3} and {10,11}
      ms.addData((1L, 2L), (2L, 3L), (10L, 11L))
      q.processAllAvailable()
      val gen0 = StreamingCc.latestLabels(spark, stateDir)
        .as[(Long, Long)].collect().toMap
      assert(gen0 == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L))

      // batch 1: an edge BRIDGING the two components, plus a new pair
      ms.addData((3L, 10L), (20L, 21L))
      q.processAllAvailable()
      val gen1 = StreamingCc.latestLabels(spark, stateDir)
        .as[(Long, Long)].collect().toMap
      // merge keeps the min root: everything in {1..3,10,11} labels 1
      assert(gen1 == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 1L, 11L -> 1L,
        20L -> 20L, 21L -> 20L))

      // ground truth: batch CC over the full accumulated edge log
      val batchCc = DataFramePregel.connectedComponents(
        StreamingCc.readEdges(spark, stateDir))
        .as[(Long, Long)].collect().toMap
      assert(gen1 == batchCc)
    } finally q.stop()
  }
}

package graft.streaming

import java.nio.file.Files
import graft.SparkTestBase
import graft.operators.GraphAnalytics
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingPprSpec extends SparkTestBase {
  import spark.implicits._

  // a small two-community digraph: cohort {1} reaches 2,3,4; 10<->11 is a
  // disconnected pocket the sparse rank table must never mention
  private val allEdges = Seq(
    (1L, 2L), (2L, 3L), (3L, 1L), (2L, 4L), (4L, 3L),
    (10L, 11L), (11L, 10L))

  test("incremental PPR: stream equals batch, generations advance, reach stays sparse") {
    val stateDir = Files.createTempDirectory("sppr-state").toString
    val ckpt = Files.createTempDirectory("sppr-ckpt").toString
    val ms = MemoryStream[(Long, Long)](spark)
    val sources = Seq(1L).toDF("vid")
    val q = StreamingPpr.incrementalPpr(
      ms.toDF().toDF("src", "dst"), "src", "dst", sources, stateDir, ckpt, numIter = 6)
    try {
      ms.addData(allEdges.take(3): _*)
      q.processAllAvailable()
      val gen0 = StreamingPpr.latestRanks(spark, stateDir)
        .as[(Long, Double)].collect().toMap
      // first batch: 1->2->3->1 cycle only
      assert(gen0.keySet == Set(1L, 2L, 3L))

      ms.addData(allEdges.drop(3): _*)
      q.processAllAvailable()
      val gen1 = StreamingPpr.latestRanks(spark, stateDir)
        .as[(Long, Double)].collect().toMap
      // vertex 4 is reachable now; the 10<->11 pocket never is (sparse)
      assert(gen1.keySet == Set(1L, 2L, 3L, 4L))

      // stream ≡ batch: the final generation matches a one-shot batch
      // derivation over the full edge set, value for value
      val batch = GraphAnalytics.personalizedPageRankDF(
        allEdges.toDF("src", "dst"), sources, numIter = 6)
        .as[(Long, Double)].collect().toMap
      assert(gen1 == batch)

      // both generations remain readable (retries/rollback window)
      assert(Files.exists(java.nio.file.Paths.get(stateDir, "ranks", "batch_0")))
      assert(Files.exists(java.nio.file.Paths.get(stateDir, "ranks", "batch_1")))
    } finally q.stop()
  }
}

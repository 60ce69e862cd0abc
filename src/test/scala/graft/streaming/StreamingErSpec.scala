package graft.streaming

import java.nio.file.Files
import graft.SparkTestBase
import graft.operators.EntityResolution
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingErSpec extends SparkTestBase {
  import spark.implicits._

  private val blockExpr = expr("substr(name, 1, 1)")

  test("incremental fuzzy pairs: stream equals batch, idempotent layout") {
    val indexDir = Files.createTempDirectory("er-index").toString
    val pairsDir = Files.createTempDirectory("er-pairs").toString
    val ckpt = Files.createTempDirectory("er-ckpt").toString

    val all = Seq(
      (1L, "jon smith"), (2L, "john smith"),   // in-batch pair (batch 0)
      (3L, "jon smyth"),                       // batch 1: cross-batch vs 1 (and 2 at dist 2 — excluded)
      (4L, "bob jones"), (5L, "bob jonez"))    // batch 1 in-batch pair

    val ms = MemoryStream[(Long, String)](spark)
    val q = StreamingEr.incrementalFuzzyPairs(
      ms.toDF().toDF("id", "name"), "id", "name", blockExpr,
      indexDir, pairsDir, ckpt, maxDist = 1)
    try {
      ms.addData(all.take(2): _*)
      q.processAllAvailable()
      ms.addData(all.drop(2): _*)
      q.processAllAvailable()

      val streamed = StreamingEr.allPairs(spark, pairsDir)
        .select("id_a", "id_b", "dist").as[(Long, Long, Long)].collect()
        .map { case (a, b, d) => (math.min(a, b), math.max(a, b), d) }.toSet

      val batch = EntityResolution.fuzzyPairs(
        all.toDF("id", "name"), "id", "name", blockExpr, maxDist = 1)
        .select("id_a", "id_b", "dist").as[(Long, Long, Long)].collect().toSet

      assert(streamed == batch, s"stream $streamed != batch $batch")
      assert(streamed.contains((1L, 2L, 1L)) && streamed.contains((1L, 3L, 1L))
        && streamed.contains((4L, 5L, 1L)))
      // jon smyth vs john smith is 2 edits — correctly absent
      assert(!streamed.exists(p => p._1 == 2L && p._2 == 3L))
    } finally q.stop()
  }

  test("hot blocks stop producing pairs once the corpus-so-far exceeds the cap") {
    val indexDir = Files.createTempDirectory("er2-index").toString
    val pairsDir = Files.createTempDirectory("er2-pairs").toString
    val ckpt = Files.createTempDirectory("er2-ckpt").toString

    val ms = MemoryStream[(Long, String)](spark)
    val q = StreamingEr.incrementalFuzzyPairs(
      ms.toDF().toDF("id", "name"), "id", "name", lit("same"),
      indexDir, pairsDir, ckpt, maxDist = 99, maxBucketSize = 3)
    try {
      ms.addData((1L, "aa"), (2L, "ab"))
      q.processAllAvailable()           // 2 ≤ cap → pair emitted
      ms.addData((3L, "ac"), (4L, "ad"))
      q.processAllAvailable()           // corpus-so-far 4 > cap → none
      val pairs = StreamingEr.allPairs(spark, pairsDir)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(pairs == Set((1L, 2L)).map(p => (math.min(p._1, p._2), math.max(p._1, p._2)))
        || pairs == Set((2L, 1L)), s"got $pairs")
    } finally q.stop()
  }
}

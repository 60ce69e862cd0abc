package graft.streaming

import java.nio.file.Files
import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingDedupSpec extends SparkTestBase {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog while the " +
    "cat watches from the warm windowsill and the birds sing in the garden"

  test("incremental minhash index: cross-batch and in-batch candidates, idempotent layout") {
    val indexDir = Files.createTempDirectory("sd-index").toString
    val pairsDir = Files.createTempDirectory("sd-pairs").toString
    val ckpt = Files.createTempDirectory("sd-ckpt").toString

    val ms = MemoryStream[(Long, String)](spark)
    val q = StreamingDedup.incrementalMinhashPairs(
      ms.toDF().toDF("doc_id", "text"), "doc_id", "text",
      indexDir, pairsDir, ckpt)
    try {
      // batch 0: original + in-batch near-dup
      ms.addData((1L, base), (2L, base.replace("quick", "swift")))
      q.processAllAvailable()
      // batch 1: a later near-dup (cross-batch hit) + an unrelated doc
      ms.addData((3L, base.replace("lazy", "idle")),
        (4L, "completely different content about distributed query engines and shuffle planning"))
      q.processAllAvailable()

      val pairs = StreamingDedup.allPairs(spark, pairsDir)
        .as[(Long, Long)].collect().toSet
      // in-batch pair from batch 0
      assert(pairs.contains((2L, 1L)), s"missing in-batch pair, got $pairs")
      // cross-batch pairs: doc 3 against the batch-0 index
      assert(pairs.contains((3L, 1L)) && pairs.contains((3L, 2L)), s"missing cross-batch pair, got $pairs")
      // unrelated doc shares no bucket with the near-dup cluster
      assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L), s"unrelated doc paired: $pairs")
      // each candidate pair appears exactly once across all batches
      val dupCounts = StreamingDedup.allPairs(spark, pairsDir)
        .groupBy("id_a", "id_b").count().where(col("count") > 1).count()
      assert(dupCounts == 0)

      // index holds band keys for every doc, one subdir per batch
      val idx = spark.read.parquet(
        Files.list(java.nio.file.Paths.get(indexDir)).toArray.map(_.toString): _*)
      assert(idx.select("doc_id").distinct().count() == 4)
    } finally q.stop()
  }
}

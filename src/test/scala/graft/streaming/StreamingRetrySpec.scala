package graft.streaming

import java.nio.file.Files
import graft.SparkTestBase
import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Retry-replay idempotence for the batch-dir streaming recipe.
  *
  * foreachBatch delivers AT LEAST once: after a mid-batch crash the same
  * batch id is re-delivered with the same data. The house recipe claims
  * exactly-once EFFECTIVE semantics because (a) each batch writes only to
  * its own `batch_<id>` dirs with overwrite, and (b) a batch reads only
  * STRICTLY OLDER batch dirs — so a retry can neither see its failed
  * attempt's partial state nor double anything. These specs exercise the
  * claim directly: run two micro-batches normally, snapshot the derived
  * result, then simulate a crashed attempt of the LAST batch (its output
  * dirs corrupted with partial garbage — the worst at-least-once case:
  * some of the batch's multiple writes landed, some did not) and
  * re-deliver the batch via the extracted per-batch body. The derived
  * result must be byte-for-byte the clean run's.
  *
  * The per-batch bodies are the SAME code the live stream runs
  * (foreachBatch delegates to them), so re-delivering through them is a
  * faithful replay of the engine's retry path without needing to crash a
  * real StreamExecution mid-commit.
  */
class StreamingRetrySpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  /** Overwrite a batch dir with schema-mismatched garbage, as a crashed
    * attempt that got partway through its writes would leave behind. */
  private def corrupt(dir: String): Unit =
    Seq(("garbage", 1)).toDF("junk", "n")
      .write.mode("overwrite").parquet(dir)

  private val base = "the quick brown fox jumps over the lazy dog while the " +
    "cat watches from the warm windowsill and the birds sing in the garden"

  test("dedup: re-delivered minhash batch converges to the clean-run pairs") {
    val indexDir = tmp("rr-dd-idx"); val pairsDir = tmp("rr-dd-pairs")
    val b0 = Seq((1L, base), (2L, base.replace("quick", "swift"))).toDF("doc_id", "text")
    val b1 = Seq((3L, base.replace("lazy", "idle")),
      (4L, "completely different content about distributed query engines")).toDF("doc_id", "text")
    def run(b: DataFrame, id: Long) = StreamingDedup.processMinhashBatch(
      b, id, "doc_id", "text", indexDir, pairsDir, 3, 64, 16)
    run(b0, 0L); run(b1, 1L)
    val clean = StreamingDedup.allPairs(spark, pairsDir).as[(Long, Long)].collect().toSet
    assert(clean.contains((3L, 1L)), s"fixture lost its cross-batch pair: $clean")
    // crashed attempt: pairs written as garbage, index half-written
    corrupt(s"$pairsDir/batch_1"); corrupt(s"$indexDir/batch_1")
    run(b1, 1L) // the retry
    val retried = StreamingDedup.allPairs(spark, pairsDir).as[(Long, Long)].collect().toSet
    assert(retried == clean, s"retry diverged: $retried vs $clean")
    val docs = spark.read.parquet(s"$indexDir/batch_0", s"$indexDir/batch_1")
      .select("doc_id").distinct().count()
    assert(docs == 4L)
  }

  test("er: re-delivered fuzzy batch converges to the clean-run matches") {
    val indexDir = tmp("rr-er-idx"); val pairsDir = tmp("rr-er-pairs")
    val b0 = Seq((1L, "Customer#001"), (2L, "Customer#002")).toDF("id", "name")
    val b1 = Seq((3L, "Customer#003"), (9L, "Unrelated#999")).toDF("id", "name")
    def run(b: DataFrame, id: Long) = StreamingEr.processErBatch(
      b, id, "id", "name", expr("substr(name, 1, length(name)-1)"),
      indexDir, pairsDir, 1, 1000)
    run(b0, 0L); run(b1, 1L)
    val clean = StreamingEr.allPairs(spark, pairsDir)
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)].collect().toSet
    assert(clean.exists(p => p._1 == 3L || p._2 == 3L), s"fixture lost cross-batch match: $clean")
    corrupt(s"$pairsDir/batch_1"); corrupt(s"$indexDir/batch_1")
    run(b1, 1L)
    val retried = StreamingEr.allPairs(spark, pairsDir)
      .select("id_a", "id_b", "dist").as[(Long, Long, Long)].collect().toSet
    assert(retried == clean, s"retry diverged: $retried vs $clean")
  }

  test("cc: re-delivered edge batch converges to the clean-run labels") {
    val stateDir = tmp("rr-cc")
    val b0 = Seq((1L, 2L), (3L, 4L)).toDF("src", "dst")
    val b1 = Seq((2L, 3L), (10L, 11L)).toDF("src", "dst") // merges {1,2}+{3,4}
    def run(b: DataFrame, id: Long) = StreamingCc.processCcBatch(b, id, "src", "dst", stateDir)
    run(b0, 0L); run(b1, 1L)
    val clean = StreamingCc.latestLabels(spark, stateDir)
      .as[(Long, Long)].collect().toMap
    assert(Set(1L, 2L, 3L, 4L).map(clean) == Set(1L), s"merge missing: $clean")
    corrupt(s"$stateDir/labels/batch_1"); corrupt(s"$stateDir/edges/batch_1")
    run(b1, 1L)
    val retried = StreamingCc.latestLabels(spark, stateDir)
      .as[(Long, Long)].collect().toMap
    assert(retried == clean, s"retry diverged: $retried vs $clean")
  }

  test("ann: re-delivered vector batch converges to the clean-run index and top-k") {
    val indexDir = tmp("rr-ann")
    val model = Similarity.IvfModel(Array(Array(1.0, 0.0), Array(0.0, 1.0)))
    val b0 = Seq((1L, Seq(1.0, 0.1)), (2L, Seq(0.1, 1.0))).toDF("vec_id", "embedding")
    val b1 = Seq((3L, Seq(0.9, 0.2)), (4L, Seq(0.2, 0.9))).toDF("vec_id", "embedding")
    def run(b: DataFrame, id: Long) = StreamingAnn.processIvfBatch(
      b, id, "vec_id", "embedding", model, indexDir)
    run(b0, 0L); run(b1, 1L)
    def topk() = StreamingAnn.ivfTopKFromIndex(spark, indexDir,
      b0.where(col("vec_id") === 1L), "vec_id", "embedding", k = 2, model, nProbe = 1)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Long)].collect().toSet
    val clean = topk()
    // a crashed partitioned write: only one cell dir landed
    corrupt(s"$indexDir/batch_1/cell=0")
    run(b1, 1L)
    assert(topk() == clean, "retry diverged")
    assert(StreamingAnn.readIndex(spark, indexDir).select("vec_id").distinct().count() == 4L)
  }

  test("sketches: re-delivered HLL batch converges to the clean-run estimate") {
    val sketchDir = tmp("rr-hll")
    val b0 = (1L to 500L).toDF("v")
    val b1 = (400L to 900L).toDF("v") // overlap on purpose: max-merge must not double
    def run(b: DataFrame, id: Long) = StreamingSketches.processHllBatch(b, id, "v", sketchDir, 9)
    run(b0, 0L); run(b1, 1L)
    val clean = StreamingSketches.hllEstimate(spark, sketchDir, 9).collect()(0).getDouble(0)
    corrupt(s"$sketchDir/batch_1")
    run(b1, 1L)
    val retried = StreamingSketches.hllEstimate(spark, sketchDir, 9).collect()(0).getDouble(0)
    assert(retried == clean, s"retry diverged: $retried vs $clean")
  }
}

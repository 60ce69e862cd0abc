package graft.streaming

import java.nio.file.Files
import graft.SparkTestBase
import graft.operators.Similarity
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingAnnSpec extends SparkTestBase {
  import spark.implicits._

  private def vec(seed: Int): Array[Float] = {
    val rnd = new scala.util.Random(seed)
    Array.fill(8)(rnd.nextFloat() * 2 - 1)
  }

  test("incremental IVF index: stream equals batch, partitioned by cell, idempotent layout") {
    val corpus = (0 until 40).map(i => (i.toLong, vec(i)))
    val corpusDf = corpus.toDF("vec_id", "embedding")
    val model = Similarity.trainIvf(corpusDf, "embedding", nCells = 4, seed = 42L, sampleRows = 40)

    val indexDir = Files.createTempDirectory("sa-index").toString
    val ckpt = Files.createTempDirectory("sa-ckpt").toString
    val ms = MemoryStream[(Long, Array[Float])](spark)
    val q = StreamingAnn.incrementalIvfIndex(
      ms.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding", model, indexDir, ckpt)
    try {
      ms.addData(corpus.take(25): _*)
      q.processAllAvailable()
      ms.addData(corpus.drop(25): _*)
      q.processAllAvailable()

      // the accumulated index holds every vector exactly once
      val idx = StreamingAnn.readIndex(spark, indexDir)
      assert(idx.count() == 40 && idx.select("vec_id").distinct().count() == 40)
      // layout: one batch_<id> dir, cell=<n> partition dirs inside
      val b0 = java.nio.file.Paths.get(indexDir, "batch_0")
      assert(Files.exists(b0))
      assert(Files.list(b0).toArray.map(_.toString).exists(_.contains("cell=")))

      // querying the streamed index ≡ batch ivfTopK over the full corpus
      val queries = corpusDf.where(col("vec_id") < 5)
      val fromIndex = StreamingAnn.ivfTopKFromIndex(
        spark, indexDir, queries, "vec_id", "embedding", k = 3, model, nProbe = 2)
        .as[(Long, Long, Double, Long)].collect().toSet
      val batch = Similarity.ivfTopK(corpusDf, queries, "vec_id", "embedding",
        k = 3, model, nProbe = 2)
        .as[(Long, Long, Double, Long)].collect().toSet
      assert(fromIndex == batch, "streamed index must answer identically to the batch path")
      assert(fromIndex.nonEmpty)
    } finally q.stop()
  }
}

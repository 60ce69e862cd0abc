package graft.streaming

import java.nio.file.Files
import graft.SparkTestBase
import graft.operators.Pca
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingPcaSpec extends SparkTestBase {
  import spark.implicits._

  private def vec(i: Int): Seq[Double] = Seq(
    math.sin(i * 1.7) * 4.0, math.sin(i * 1.7) * 4.0 + math.cos(i * 3.1) * 0.02,
    math.cos(i * 2.3) * 1.5, -math.cos(i * 2.3) * 1.5 + math.sin(i * 5.1) * 0.02)

  test("streaming moments fold to EXACTLY the one-shot batch model") {
    val dir = Files.createTempDirectory("sp-moments").toString
    val ckpt = Files.createTempDirectory("sp-ckpt").toString
    val ms = MemoryStream[Seq[Double]](spark)
    val q = StreamingPca.momentsStream(ms.toDF().toDF("vec"), "vec", dir, ckpt)
    try {
      ms.addData((0 until 120).map(vec): _*)
      q.processAllAvailable()
      ms.addData((120 until 170).map(vec): _*)
      q.processAllAvailable()
      ms.addData((170 until 300).map(vec): _*)
      q.processAllAvailable()
    } finally q.stop()

    val whole = (0 until 300).map(vec).toDF("vec")
    val batchModel = Pca.train(whole, "vec", k = 3)
    val streamModel = StreamingPca.currentModel(spark, dir, k = 3)
    assert(streamModel.n == batchModel.n)
    assert(streamModel.eigenvalues.toSeq == batchModel.eigenvalues.toSeq)
    (0 until 3).foreach { j =>
      assert(streamModel.components(j).sameElements(batchModel.components(j)),
        s"component $j differs")
      assert(streamModel.meanDotPico(j) == batchModel.meanDotPico(j))
    }
    assert(streamModel.mean.sameElements(batchModel.mean))
  }

  test("a retried batch overwrites its own block — no double counting") {
    val dir = Files.createTempDirectory("sp-retry").toString
    val rows = (0 until 80).map(vec).toDF("vec")
    StreamingPca.processBatch(rows, 0L, "vec", dir, Pca.Scale)
    // replay of batch 0 (post-failure retry) — same id, same data
    StreamingPca.processBatch(rows, 0L, "vec", dir, Pca.Scale)
    val m = StreamingPca.mergedMoments(spark, dir)
    assert(m.n == BigInt(80))
    val direct = Pca.moments(rows, "vec")
    assert(m.s.toSeq == direct.s.toSeq && m.g.toSeq == direct.g.toSeq)
  }

  test("moment blocks merge associatively across arbitrary groupings") {
    val a = Pca.moments((0 until 50).map(vec).toDF("vec"), "vec")
    val b = Pca.moments((50 until 90).map(vec).toDF("vec"), "vec")
    val c = Pca.moments((90 until 200).map(vec).toDF("vec"), "vec")
    val abc = a.merge(b).merge(c)
    val cba = c.merge(b.merge(a))
    assert(abc.n == cba.n && abc.s.toSeq == cba.s.toSeq && abc.g.toSeq == cba.g.toSeq)
    val whole = Pca.moments((0 until 200).map(vec).toDF("vec"), "vec")
    assert(abc.n == whole.n && abc.s.toSeq == whole.s.toSeq && abc.g.toSeq == whole.g.toSeq)
  }
}

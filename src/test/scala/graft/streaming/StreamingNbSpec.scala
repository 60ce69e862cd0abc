package graft.streaming

import java.nio.file.Files
import graft.SparkTestBase
import graft.operators.TextClassifier
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

class StreamingNbSpec extends SparkTestBase {
  import spark.implicits._

  private val langs = Seq("en", "de", "fr")
  private def doc(i: Int): (Long, String, String) = {
    val words = Seq("alpha", "beta", "gamma", "delta", "omega", "zeta")
    val text = (0 until (i % 7)).map(j => words((i * 3 + j * 5) % words.length))
      .mkString(" ")
    (i.toLong, text, langs(i % langs.length))
  }

  test("streaming count blocks fold to EXACTLY the one-shot batch model and predictions") {
    val dir = Files.createTempDirectory("nb-counts").toString
    val ckpt = Files.createTempDirectory("nb-ckpt").toString
    val ms = MemoryStream[(Long, String, String)](spark)
    val q = StreamingNb.countsStream(
      ms.toDF().toDF("id", "text", "cls"), "text", "cls", dir, ckpt)
    try {
      ms.addData((0 until 40).map(doc): _*)
      q.processAllAvailable()
      ms.addData((40 until 70).map(doc): _*)
      q.processAllAvailable()
      ms.addData((70 until 120).map(doc): _*)
      q.processAllAvailable()
    } finally q.stop()

    val whole = (0 until 120).map(doc).toDF("id", "text", "cls")
    val batchStats = TextClassifier.nbClassStats(whole, "text", "cls")
      .as[(String, Long, Long, Long, BigDecimal, BigDecimal)].collect().toSet
    val streamStats = StreamingNb.currentClassStats(spark, dir)
      .as[(String, Long, Long, Long, BigDecimal, BigDecimal)].collect().toSet
    assert(streamStats == batchStats)

    val test = Seq((900L, "alpha beta beta"), (901L, "omega"), (902L, ""),
      (903L, "unseen tokens only")).toDF("id", "text")
    val batchPred = TextClassifier.nbPredict(whole, test, "id", "text", "cls")
      .as[(Long, String)].collect().toMap
    val streamPred = StreamingNb.predict(spark, dir, test, "id", "text")
      .as[(Long, String)].collect().toMap
    assert(streamPred == batchPred)
  }

  test("a retried batch overwrites its own block — no double counting") {
    val dir = Files.createTempDirectory("nb-retry").toString
    val rows = (0 until 50).map(doc).toDF("id", "text", "cls")
    StreamingNb.processBatch(rows, 0L, "text", "cls", dir)
    StreamingNb.processBatch(rows, 0L, "text", "cls", dir) // replay, same id
    val stats = StreamingNb.currentClassStats(spark, dir)
      .as[(String, Long, Long, Long, BigDecimal, BigDecimal)].collect().toSet
    val direct = TextClassifier.nbClassStats(rows, "text", "cls")
      .as[(String, Long, Long, Long, BigDecimal, BigDecimal)].collect().toSet
    assert(stats == direct)
  }
}

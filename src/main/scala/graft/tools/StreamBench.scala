package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming-ingest throughput bench (VERDICT r10 #7): sustained rows/s
  * through the REAL foreachBatch machinery — MemoryStream → writeStream →
  * per-batch body with its checkpoint, batch-dir state layout and
  * cross-batch index probes — for the two families whose ingest story
  * carries the 100 TB pipeline claim:
  *
  *  - StreamingDedup: minhash-band the batch, probe the accumulated band
  *    index, write pairs + index generation;
  *  - StreamingCc: star rounds over (previous assignment ∪ batch edges).
  *
  * The first batch is warmup (stream bootstrap, codegen, empty-index
  * edge case); rows/s is measured over the remaining batches, which all
  * probe a non-empty accumulated state — the steady-state shape. One
  * JSON line on stdout; appended to bench_history/stream_log.jsonl.
  *
  * Usage: `sbt "runMain graft.tools.StreamBench /root/testdata/sf0.1"`.
  */
object StreamBench {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val batchRows = sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCH", "5000").toInt
    val nBatches = sys.env.getOrElse("SPARK_GRAFT_STREAM_BATCHES", "6").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_streambench").toString

    /** Feed `batches` through `start`, timing all but the first; returns
      * (rows/s over timed batches, timed rows, timed seconds). */
    def drive[A](batches: Seq[Seq[A]],
        start: MemoryStream[A] => org.apache.spark.sql.streaming.StreamingQuery)(
        implicit enc: org.apache.spark.sql.Encoder[A]): (Double, Long, Double) = {
      val ms = MemoryStream[A](spark)
      val q = start(ms)
      try {
        ms.addData(batches.head)
        q.processAllAvailable() // warmup: bootstrap + empty-state batch
        val timedRows = batches.tail.map(_.size.toLong).sum
        val t0 = System.nanoTime()
        batches.tail.foreach { b => ms.addData(b); q.processAllAvailable() }
        val secs = (System.nanoTime() - t0) / 1e9
        (timedRows / secs, timedRows, secs)
      } finally q.stop()
    }

    // ---- StreamingDedup: documents in ingest order
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect().toSeq
    // documents is a much smaller table than lineitem: size batches off
    // the corpus so nBatches post-warmup batches actually exist
    val docBatchRows = math.max(100, math.min(batchRows, docs.size / (nBatches + 1)))
    val docBatches = docs.grouped(docBatchRows).take(nBatches + 1).toSeq
    val (dedupRps, dedupRows, dedupSecs) = drive[(Long, String)](docBatches, ms =>
      graft.streaming.StreamingDedup.incrementalMinhashPairs(
        ms.toDF().toDF("doc_id", "text"), "doc_id", "text",
        s"$root/dd/index", s"$root/dd/pairs", s"$root/dd/ckpt"))

    // ---- StreamingCc: lineitem (orderkey, partkey) edges in ingest order
    val edges = graft.Tables(spark, dir, "lineitem")
      .select(col("l_orderkey").cast("long"), col("l_partkey").cast("long"))
      .limit(batchRows * (nBatches + 1))
      .as[(Long, Long)].collect().toSeq
    val edgeBatches = edges.grouped(batchRows).take(nBatches + 1).toSeq
    val (ccRps, ccRows, ccSecs) = drive[(Long, Long)](edgeBatches, ms =>
      graft.streaming.StreamingCc.incrementalCc(
        ms.toDF().toDF("src", "dst"), "src", "dst", s"$root/cc/state", s"$root/cc/ckpt"))

    // ---- StreamingAnn: embeddings through the IVF index-maintenance
    // stream (quantizer trained offline, as in production: the stream
    // only assigns + writes cell-partitioned batch tables)
    val embDf = graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id").cast("long"), col("embedding"))
    val model = graft.operators.Similarity.trainIvf(embDf, "embedding", nCells = 16)
    val embs = embDf.as[(Long, Array[Float])].collect().toSeq
    val embBatchRows = math.max(100, math.min(batchRows, embs.size / (nBatches + 1)))
    val embBatches = embs.grouped(embBatchRows).take(nBatches + 1).toSeq
    val (annRps, annRows, annSecs) = drive[(Long, Array[Float])](embBatches, ms =>
      graft.streaming.StreamingAnn.incrementalIvfIndex(
        ms.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding",
        model, s"$root/ann/index", s"$root/ann/ckpt"))

    // ---- StreamingSketches: HLL registers over lineitem partkeys
    val keys = graft.Tables(spark, dir, "lineitem")
      .select(col("l_partkey").cast("long"))
      .limit(batchRows * (nBatches + 1)).as[Long].collect().toSeq
    val keyBatches = keys.grouped(batchRows).take(nBatches + 1).toSeq
    val (hllRps, hllRows, hllSecs) = drive[Long](keyBatches, ms =>
      graft.streaming.StreamingSketches.hllRegistersStream(
        ms.toDF().toDF("v"), "v", s"$root/hll/sketch", s"$root/hll/ckpt"))

    val json =
      f"""{"metric":"stream_rows_per_sec","dedup_rps":$dedupRps%.1f,"dedup_rows":$dedupRows,"dedup_secs":$dedupSecs%.2f,"cc_rps":$ccRps%.1f,"cc_rows":$ccRows,"cc_secs":$ccSecs%.2f,"ann_rps":$annRps%.1f,"ann_rows":$annRows,"ann_secs":$annSecs%.2f,"hll_rps":$hllRps%.1f,"hll_rows":$hllRows,"hll_secs":$hllSecs%.2f,"batch_rows":$batchRows,"doc_batch_rows":$docBatchRows,"emb_batch_rows":$embBatchRows,"batches":$nBatches,"sf":"$dir","epoch_ms":${System.currentTimeMillis}}"""
    println(json)
    try {
      val repo = java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_REPO_ROOT", "/root/repo"))
      java.nio.file.Files.createDirectories(repo.resolve("bench_history"))
      java.nio.file.Files.writeString(repo.resolve("bench_history/stream_log.jsonl"),
        json + "\n", java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    } catch { case e: Throwable => System.err.println(s"[streambench] log append failed: ${e.getMessage}") }
    spark.stop()
  }
}

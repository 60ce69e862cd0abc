package graft.streaming

import graft.operators.TextClassifier
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incremental Naive Bayes model maintenance (SURVEY §2.11): the
  * streaming twin of [[graft.operators.TextClassifier]].
  *
  * NB's sufficient statistics — the (class, token) count table and the
  * per-class doc counts — merge by plain ADDITION, so the streaming form
  * is the [[StreamingPca]]/[[StreamingSketches]] recipe over TABLES
  * instead of a constant block: each micro-batch writes its OWN count
  * tables to a batch-id-named subdirectory (idempotent under retry — a
  * replayed batch overwrites its own output, never double-counts), and
  * the corpus model comes from folding all blocks with one groupBy-sum
  * at read time. Because the statistics are exact integers, stream ≡
  * batch is EXACT equality of the trained model and of every downstream
  * prediction (spec-pinned) — the same guarantee as the PCA twin, which
  * a gradient-trained classifier fundamentally lacks.
  *
  * Scale: a batch block is bounded by the batch's OWN vocabulary (Heaps'
  * law: sublinear in batch tokens); the fold is a union of count tables
  * partial-combined before the wire, and the document stream itself
  * never re-scans. */
object StreamingNb {

  /** Per-micro-batch body, exposed for the retry/equivalence specs. */
  private[streaming] def processBatch(batch: DataFrame, batchId: Long,
      textCol: String, labelCol: String, countsDir: String): Unit = {
    if (!batch.isEmpty) {
      val (cnt, docs) = TextClassifier.trainCounts(batch, textCol, labelCol)
      // ATOMIC publish: stage BOTH tables under a hidden tmp dir, then
      // one rename to batch_<id>. Two direct writes left a crash window
      // where a half-batch (tok without doc) matched listBatchDirs'
      // batch_* listing and broke every fold until the stream replayed;
      // and a retry's in-place overwrite raced concurrent readers. The
      // tmp prefix never matches the listing, and rename is atomic on
      // local FS and HDFS.
      val conf = batch.sparkSession.sparkContext.hadoopConfiguration
      val tmp = new org.apache.hadoop.fs.Path(s"$countsDir/.tmp_batch_$batchId")
      val fin = new org.apache.hadoop.fs.Path(s"$countsDir/batch_$batchId")
      val fs = tmp.getFileSystem(conf)
      if (fs.exists(tmp)) fs.delete(tmp, true)
      cnt.write.mode("overwrite").parquet(s"${tmp.toString}/tok")
      docs.write.mode("overwrite").parquet(s"${tmp.toString}/doc")
      if (fs.exists(fin)) fs.delete(fin, true) // retry: replace the whole batch
      require(fs.rename(tmp, fin), s"could not publish $tmp -> $fin")
    }
  }

  /** Maintain per-batch count blocks for the labeled document stream
    * under `countsDir/batch_<id>/{tok,doc}`. */
  def countsStream(rows: DataFrame, textCol: String, labelCol: String,
      countsDir: String, checkpointDir: String): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, textCol, labelCol, countsDir)
      }
      .start()

  /** Fold every batch block into the corpus-so-far sufficient
    * statistics: ((class, token) counts — checkpointed, it feeds the
    * vocab count, totals and log-likelihoods — and per-class doc
    * counts). */
  private[streaming] def mergedCounts(spark: SparkSession, countsDir: String)
      : (DataFrame, DataFrame) = {
    val dirs = StreamingDedup.listBatchDirs(spark, countsDir).map(_._2)
    require(dirs.nonEmpty, s"no count batches under $countsDir")
    val cnt = spark.read.parquet(dirs.map(d => s"$d/tok"): _*)
      .groupBy("__cls", "tok").agg(sum(col("c")).as("c"))
      .localCheckpoint(true)
    val docs = spark.read.parquet(dirs.map(d => s"$d/doc"): _*)
      .groupBy("__cls").agg(sum(col("nd")).as("nd"))
    (cnt, docs)
  }

  /** The corpus-so-far per-class stats — EXACTLY the batch
    * [[TextClassifier.nbClassStats]] result on the union of all
    * batches. */
  def currentClassStats(spark: SparkSession, countsDir: String): DataFrame = {
    val (cnt, docs) = mergedCounts(spark, countsDir)
    TextClassifier.classStatsDF(cnt, TextClassifier.vocabSize(cnt), docs)
  }

  /** Predict with the corpus-so-far model — EXACTLY the batch
    * [[TextClassifier.nbPredict]] result trained on the union of all
    * batches. */
  def predict(spark: SparkSession, countsDir: String, test: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val (cnt, docs) = mergedCounts(spark, countsDir)
    TextClassifier.nbPredictFromCounts(cnt, docs,
      TextClassifier.vocabSize(cnt), test, idCol, textCol)
  }
}

package graft.streaming

import graft.operators.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incremental MinHash-LSH index maintenance (SURVEY §2.11): near-dup
  * detection AT INGEST, the shape a training-data pipeline actually needs —
  * a new document should be flagged against the whole corpus seen so far
  * without re-running the full O(corpus) self-join.
  *
  * Per micro-batch:
  *   1. minhash-band the batch's documents ((doc_id, band, bucket) keys);
  *   2. probe the persistent band index: batch × older-batches equi-join
  *     on (band, bucket) → cross-batch candidate pairs, plus the batch's
  *     internal pairs;
  *   3. write the pairs and the batch's band keys to batch-id-named
  *     subdirectories with overwrite — a retried batch REPLACES its own
  *     output and re-reads only strictly-older batches, so the operator is
  *     idempotent (exactly-once effective semantics on top of
  *     foreachBatch's at-least-once delivery).
  *
  * The index only ever stores (doc_id, band, bucket) — 24 bytes × bands
  * per document, never text or shingles — so probing N new docs against a
  * billion-document index is an equi-join against a bucketed key set, not
  * a scan of the corpus.
  */
object StreamingDedup {

  private[streaming] def listBatchDirs(spark: org.apache.spark.sql.SparkSession,
      dir: String): Seq[(Long, String)] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Nil
    else fs.listStatus(path).toSeq.collect {
      case st if st.isDirectory && st.getPath.getName.startsWith("batch_") =>
        (st.getPath.getName.stripPrefix("batch_").toLong, st.getPath.toString)
    }
  }

  /** The per-micro-batch body, exposed so the retry-replay specs can
    * re-deliver a batch id exactly as foreachBatch's at-least-once
    * contract does (StreamingRetrySpec). */
  private[streaming] def processMinhashBatch(
      batch: DataFrame, batchId: Long, idCol: String, textCol: String,
      indexDir: String, pairsDir: String,
      shingleSize: Int, numHashes: Int, bands: Int): Unit = {
    val spark = batch.sparkSession
    val banded = Dedup.minHashBands(batch, idCol, textCol, shingleSize, numHashes, bands)
      .localCheckpoint(true) // reused three times below

    // strictly-older batches only: a retry of THIS batch must not see
    // its own failed attempt's index rows
    val olderDirs = listBatchDirs(spark, indexDir)
      .filter(_._1 < batchId).map(_._2)
    val older =
      if (olderDirs.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          banded.schema)
      else spark.read.parquet(olderDirs: _*)

    val probe = banded.select(col("band"), col("bucket"), col("doc_id").as("id_a"))
    val crossBatch = probe
      .join(older.select(col("band"), col("bucket"), col("doc_id").as("id_b")),
        Seq("band", "bucket"))
    val inBatch = probe
      .join(banded.select(col("band"), col("bucket"), col("doc_id").as("id_b")),
        Seq("band", "bucket"))
      .where(col("id_a") > col("id_b"))
    crossBatch.unionAll(inBatch)
      .select(col("id_a"), col("id_b")).distinct()
      .write.mode("overwrite").parquet(s"$pairsDir/batch_$batchId")

    banded.write.mode("overwrite").parquet(s"$indexDir/batch_$batchId")
  }

  def incrementalMinhashPairs(
      docs: DataFrame, idCol: String, textCol: String,
      indexDir: String, pairsDir: String, checkpointDir: String,
      shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 16): StreamingQuery =
    docs.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processMinhashBatch(batch, batchId, idCol, textCol, indexDir, pairsDir,
          shingleSize, numHashes, bands)
      }
      .start()

  /** All candidate pairs emitted so far (for downstream exact verify). */
  def allPairs(spark: org.apache.spark.sql.SparkSession, pairsDir: String): DataFrame = {
    val dirs = listBatchDirs(spark, pairsDir).map(_._2)
    require(dirs.nonEmpty, s"no pair batches under $pairsDir")
    spark.read.parquet(dirs: _*)
  }
}

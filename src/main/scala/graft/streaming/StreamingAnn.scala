package graft.streaming

import graft.streaming.BatchIo._

import graft.operators.Similarity
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incremental IVF-ANN index maintenance (SURVEY §2.11): embeddings are
  * assigned to their coarse cell AT INGEST against a FIXED offline-trained
  * quantizer (the production contract — [[Similarity.trainIvf]] runs once,
  * the centroids are versioned artifacts) and appended to a
  * cell-partitioned parquet index. Queries probe the accumulated index and
  * read ONLY their nProbe cells' partitions — the IVF promise held at
  * rest, for a corpus that grows batch by batch.
  *
  * Idempotency follows the [[StreamingDedup]] recipe: each micro-batch
  * writes to a batch-id-named subdirectory with overwrite, so a retried
  * batch replaces its own output — exactly-once effective semantics on
  * foreachBatch's at-least-once delivery. The index stores
  * (vec_id, vec, norm, cell): the norm is precomputed once at ingest, so
  * query-time rerank does one dot product per candidate.
  */
object StreamingAnn {

  /** Start the index-maintenance stream: one cell-partitioned parquet
    * write per micro-batch. */
  /** Per-micro-batch body, exposed for the retry-replay specs
    * (StreamingRetrySpec). */
  private[streaming] def processIvfBatch(
      batch: DataFrame, batchId: Long, idCol: String, vecCol: String,
      model: Similarity.IvfModel, indexDir: String): Unit =
    Similarity.assignCells(batch, idCol, vecCol, model)
      .publishBatch(s"$indexDir", batchId, "cell")

  def incrementalIvfIndex(
      vectors: DataFrame, idCol: String, vecCol: String,
      model: Similarity.IvfModel, indexDir: String,
      checkpointDir: String): StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processIvfBatch(batch, batchId, idCol, vecCol, model, indexDir)
      }
      .start()

  /** The accumulated index as a DataFrame (vec_id, vec, norm, cell).
    * Each batch directory is its own partitioned table root (cell=N
    * subdirs), so batches are opened separately and unioned — one
    * multi-root read would fail partition inference. */
  def readIndex(spark: org.apache.spark.sql.SparkSession, indexDir: String): DataFrame = {
    val dirs = StreamingDedup.listBatchDirs(spark, indexDir).map(_._2)
    require(dirs.nonEmpty, s"no index batches under $indexDir")
    dirs.map(spark.read.parquet(_)).reduce(_ unionByName _)
  }

  /** Approximate top-k against everything indexed so far: probe joins
    * over the at-rest cells ([[Similarity.ivfTopKAssigned]] — cell
    * assignment is NOT recomputed; `cell` is a partition column, so scans
    * prune to the probed cells). Same model ⇒ identical results to batch
    * [[Similarity.ivfTopK]] over the unioned corpus (spec-checked). */
  def ivfTopKFromIndex(
      spark: org.apache.spark.sql.SparkSession, indexDir: String,
      queries: DataFrame, idCol: String, vecCol: String,
      k: Int, model: Similarity.IvfModel, nProbe: Int): DataFrame =
    Similarity.ivfTopKAssigned(
      // partition columns come back at the end and as int — restore the
      // index row shape assignCells wrote
      readIndex(spark, indexDir).select(col("vec_id"), col("vec"), col("norm"),
        col("cell").cast("int").as("cell")),
      queries, idCol, vecCol, k, model, nProbe)
}

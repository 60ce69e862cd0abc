package graft.streaming

import graft.streaming.BatchIo._

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incremental entity resolution at ingest (SURVEY §2.11): fuzzy-match
  * each arriving entity batch against the whole corpus seen so far
  * without re-running the O(corpus²) self-join — the streaming twin of
  * [[graft.operators.EntityResolution.fuzzyPairs]].
  *
  * Per micro-batch:
  *   1. project the batch to (id, name, blk) under the caller's blocking
  *      expression;
  *   2. probe the persistent block index (strictly-older batches): a
  *      same-block equi-join verified IN the join stage by thresholded
  *      levenshtein — unlike minhash, verification is cheap enough to
  *      run at probe time, so the output is final matches, not
  *      candidates;
  *   3. append this batch's (id, name, blk) rows to the index and its
  *      verified pairs to the pairs dir, batch-id-named with overwrite —
  *      a retried batch replaces its own output and re-reads only
  *      strictly-older batches (idempotent on at-least-once delivery,
  *      the StreamingDedup layout).
  *
  * The `maxBucketSize` guard evaluates per batch against the
  * corpus-so-far (older index ∪ this batch): once a block goes hot it
  * stops producing pairs — prefix-corpus semantics of the batch
  * operator's guard. The index stores (id, name, blk) only; entity
  * names are small, so probing N new entities against a billion-entity
  * index is a key-join on blk, not a corpus scan.
  */
object StreamingEr {

  /** Per-micro-batch body, exposed for the retry-replay specs
    * (StreamingRetrySpec). */
  private[streaming] def processErBatch(
      batch: DataFrame, batchId: Long, idCol: String, nameCol: String,
      blockExpr: Column, indexDir: String, pairsDir: String,
      maxDist: Int, maxBucketSize: Int): Unit = {
    val spark = batch.sparkSession
    val keyed = batch.select(col(idCol).as("id"), col(nameCol).as("name"),
      blockExpr.as("blk")).localCheckpoint(true)

    val olderDirs = StreamingDedup.listBatchDirs(spark, indexDir)
      .filter(_._1 < batchId).map(_._2)
    val older =
      if (olderDirs.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          keyed.schema)
      else spark.read.parquet(olderDirs: _*)

    // hot-block guard over the corpus-so-far
    val okBlocks = older.unionAll(keyed).groupBy("blk")
      .agg(count(lit(1)).as("blk_n")).where(col("blk_n") <= maxBucketSize)
      .select("blk")

    val probe = keyed.join(okBlocks, Seq("blk"))
    val crossBatch = probe.as("a")
      .join(older.join(okBlocks, Seq("blk")).as("b"), Seq("blk"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.name").as("name_a"), col("b.name").as("name_b"))
    val inBatch = probe.as("a").join(probe.as("b"), Seq("blk"))
      .where(col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        col("a.name").as("name_a"), col("b.name").as("name_b"))
    crossBatch.unionAll(inBatch)
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b"), maxDist).cast("long"))
      .where(col("dist") >= 0)
      .distinct()
      .publishBatch(s"$pairsDir", batchId)

    keyed.publishBatch(s"$indexDir", batchId)
  }

  def incrementalFuzzyPairs(
      entities: DataFrame, idCol: String, nameCol: String, blockExpr: Column,
      indexDir: String, pairsDir: String, checkpointDir: String,
      maxDist: Int = 1, maxBucketSize: Int = 1000): StreamingQuery =
    entities.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processErBatch(batch, batchId, idCol, nameCol, blockExpr,
          indexDir, pairsDir, maxDist, maxBucketSize)
      }
      .start()

  /** All verified fuzzy pairs emitted so far. */
  def allPairs(spark: org.apache.spark.sql.SparkSession, pairsDir: String): DataFrame =
    StreamingDedup.allPairs(spark, pairsDir)
}

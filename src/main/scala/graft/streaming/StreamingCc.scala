package graft.streaming

import graft.streaming.BatchIo._

import graft.operators.DataFramePregel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incremental connected-components maintenance over streaming edge
  * ingest (SURVEY §2.11). Unlike [[StreamingPpr]] (whose mass is
  * globally coupled and must re-derive), component structure has a true
  * incremental form: the previous generation's (vid → component)
  * assignment IS a star graph with identical connectivity, so each
  * micro-batch runs the large-star/small-star rounds over
  *
  *   prev assignment edges  ∪  the new batch's edges
  *
  * — an input of |V| + |Δ| rows, NOT the accumulated edge log. A batch
  * that merges two components converges in O(1) star rounds because
  * both sides are already stars; min-id component labels are stable
  * across generations (a merge keeps the smaller root), so downstream
  * consumers can diff generations meaningfully. Equality with a batch
  * run over the full edge history is spec-checked.
  *
  * State layout follows the house recipe: generation `batch_<id>`
  * written with overwrite — retried batches replace their own output,
  * readers always see a complete generation. Raw batch edges are ALSO
  * logged (edges/batch_<id>) so the stream ≡ batch claim stays
  * re-checkable offline at any time.
  */
object StreamingCc {

  /** Per-micro-batch body, exposed for the retry-replay specs
    * (StreamingRetrySpec). */
  private[streaming] def processCcBatch(
      batch: DataFrame, batchId: Long, srcCol: String, dstCol: String,
      stateDir: String): Unit = {
    val spark = batch.sparkSession
    val b = batch.select(col(srcCol).as("src"), col(dstCol).as("dst"))
    b.publishBatch(s"$stateDir/edges", batchId)
    // previous generations may be missing on the FIRST batch only
    val prevDirs = StreamingDedup.listBatchDirs(spark, s"$stateDir/labels")
      .filter(_._1 < batchId)
    val input = prevDirs.sortBy(_._1).lastOption match {
      case Some((_, dir)) =>
        spark.read.parquet(dir)
          .select(col("vid").as("src"), col("component").as("dst"))
          .unionAll(b)
      case None => b
    }
    DataFramePregel.connectedComponents(input)
      .publishBatch(s"$stateDir/labels", batchId)
  }

  def incrementalCc(
      edges: DataFrame, srcCol: String, dstCol: String,
      stateDir: String, checkpointDir: String): StreamingQuery =
    edges.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processCcBatch(batch, batchId, srcCol, dstCol, stateDir)
      }
      .start()

  /** The newest complete (vid, component) generation. */
  def latestLabels(spark: SparkSession, stateDir: String): DataFrame = {
    val dirs = StreamingDedup.listBatchDirs(spark, s"$stateDir/labels")
    require(dirs.nonEmpty, s"no label generations under $stateDir/labels")
    spark.read.parquet(dirs.maxBy(_._1)._2)
  }

  /** The accumulated raw edge log (src, dst) — the offline audit path.
    * Compaction-aware: [[StreamingDedup.compactLog]] may have folded old
    * generations into a checkpoint. */
  def readEdges(spark: SparkSession, stateDir: String): DataFrame = {
    val dirs = StreamingDedup.listLogDirs(spark, s"$stateDir/edges").map(_._2)
    require(dirs.nonEmpty, s"no edge batches under $stateDir/edges")
    spark.read.parquet(dirs: _*)
  }
}

package graft.streaming

import graft.streaming.BatchIo._

import graft.operators.GraphAnalytics
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incremental personalized-PageRank maintenance over streaming edge
  * ingest (SURVEY §2.11) — the [[StreamingAnn]] recipe applied to the
  * rank table: every micro-batch of new relationships lands in a
  * batch-id-named edge-log directory (overwrite → a retried batch
  * replaces its own output, exactly-once effective semantics), and the
  * cohort's rank table is re-derived and written as a NEW generation
  * keyed by the same batch id. Readers always see a complete, consistent
  * generation; a crashed writer leaves the previous generation intact.
  *
  * Why re-derive instead of delta-patching: PPR mass is globally coupled
  * — one new edge re-routes rank through every downstream vertex, so an
  * exact delta is itself a propagation over the affected subgraph
  * (push-style updates à la Berkhin's bookmark-coloring exist but keep
  * per-vertex residual state that must live in an external store).
  * [[GraphAnalytics.personalizedPageRankDF]] is already REACH-BOUNDED:
  * its per-round join touches only edges leaving ranked vertices, so the
  * per-batch cost scales with the cohort's reach subgraph — for a
  * focused cohort a small corner of a 100 TB graph — not with the
  * accumulated edge count. The derivation stays bit-reproducible
  * (fixed-point integer arithmetic), so rank generations are comparable
  * across batches and engines, and stream ≡ batch exactly (spec-checked).
  */
object StreamingPpr {

  /** Start the maintenance stream: per micro-batch, log the edges and
    * write rank generation `batch_<id>` over everything ingested so far.
    * `sources` is the fixed personalization cohort (first column = vertex
    * id). */
  def incrementalPpr(
      edges: DataFrame, srcCol: String, dstCol: String,
      sources: DataFrame, stateDir: String, checkpointDir: String,
      numIter: Int = 10, resetProb: Double = 0.15): StreamingQuery = {
    val src = sources.select(col(sources.columns.head).as("vid")).localCheckpoint(true)
    edges.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        batch.select(col(srcCol).as("src"), col(dstCol).as("dst"))
          .publishBatch(s"$stateDir/edges", batchId)
        GraphAnalytics.personalizedPageRankDF(
          readEdges(spark, stateDir), src, numIter, resetProb)
          .publishBatch(s"$stateDir/ranks", batchId)
      }
      .start()
  }

  /** The accumulated edge log (src, dst) — compaction-aware
    * ([[StreamingDedup.compactLog]]). */
  def readEdges(spark: SparkSession, stateDir: String): DataFrame = {
    val dirs = StreamingDedup.listLogDirs(spark, s"$stateDir/edges").map(_._2)
    require(dirs.nonEmpty, s"no edge batches under $stateDir/edges")
    spark.read.parquet(dirs: _*)
  }

  /** The newest complete rank generation (vid, ppr). */
  def latestRanks(spark: SparkSession, stateDir: String): DataFrame = {
    val dirs = StreamingDedup.listBatchDirs(spark, s"$stateDir/ranks")
    require(dirs.nonEmpty, s"no rank generations under $stateDir/ranks")
    spark.read.parquet(dirs.maxBy(_._1)._2)
  }
}

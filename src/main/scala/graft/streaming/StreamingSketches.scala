package graft.streaming

import graft.streaming.BatchIo._

import graft.operators.Sketches
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQuery

/** Incremental sketch maintenance (SURVEY §2.11): the streaming twin of
  * [[graft.operators.Sketches]]. Sketches are the state a pipeline keeps
  * PRECISELY because they merge: HLL registers max-merge and count-min
  * counters sum-merge, so per-batch partial sketches written to
  * batch-id-named subdirectories (the StreamingDedup idempotence recipe —
  * a retried batch overwrites its own output) fold into the corpus-level
  * sketch at READ time with one ≤(2^b + d·w)-row aggregation. Nothing is
  * ever rewritten in place; there is no read-modify-write race; and the
  * same fold works over any subset of batches (per-day sketches, per-
  * source sketches) — the property exact distinct counts fundamentally
  * lack.
  *
  * Batch ≡ streaming agreement is spec-checked (StreamingSketchesSpec):
  * the folded streaming registers equal the one-shot batch registers on
  * the same data, row for row.
  */
object StreamingSketches {

  /** Per-micro-batch body of [[hllRegistersStream]], exposed for the
    * retry-replay specs (StreamingRetrySpec). */
  private[streaming] def processHllBatch(
      batch: DataFrame, batchId: Long, valueCol: String, sketchDir: String,
      b: Int): Unit =
    Sketches.hllRegisters(batch, col(valueCol), b)
      .publishBatch(s"$sketchDir", batchId)

  /** Maintain per-batch HLL register tables for `value` under
    * `sketchDir/batch_<id>`. */
  def hllRegistersStream(
      rows: DataFrame, valueCol: String, sketchDir: String, checkpointDir: String,
      b: Int = Sketches.HllBits): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processHllBatch(batch, batchId, valueCol, sketchDir, b)
      }
      .start()

  /** Fold all per-batch register tables into the corpus registers. */
  def mergedHllRegisters(spark: SparkSession, sketchDir: String): DataFrame = {
    val dirs = StreamingDedup.listBatchDirs(spark, sketchDir).map(_._2)
    require(dirs.nonEmpty, s"no sketch batches under $sketchDir")
    spark.read.parquet(dirs: _*)
      .groupBy("bucket").agg(max(col("register")).cast("int").as("register"))
  }

  /** Corpus-so-far distinct estimate from the folded registers. */
  def hllEstimate(spark: SparkSession, sketchDir: String,
      b: Int = Sketches.HllBits): DataFrame =
    Sketches.hllEstimate(mergedHllRegisters(spark, sketchDir), b)

  /** Maintain per-batch count-min tables for `value` under
    * `sketchDir/batch_<id>`. */
  def cmsTableStream(
      rows: DataFrame, valueCol: String, sketchDir: String, checkpointDir: String,
      depth: Int = Sketches.CmsDepth, width: Int = Sketches.CmsWidth): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Sketches.cmsTable(batch, col(valueCol), depth, width)
          .publishBatch(s"$sketchDir", batchId)
      }
      .start()

  /** Fold all per-batch count-min tables into the corpus sketch. */
  def mergedCmsTable(spark: SparkSession, sketchDir: String): DataFrame = {
    val dirs = StreamingDedup.listBatchDirs(spark, sketchDir).map(_._2)
    require(dirs.nonEmpty, s"no sketch batches under $sketchDir")
    spark.read.parquet(dirs: _*)
      .groupBy("row", "cell").agg(sum(col("cnt")).as("cnt"))
  }

  /** Maintain per-batch Bloom bit tables for `value` under
    * `sketchDir/batch_<id>`; bits union-distinct-merge (bitwise OR). */
  def bloomBitsStream(
      rows: DataFrame, valueCol: String, sketchDir: String, checkpointDir: String,
      m: Int = Sketches.BloomM, h: Int = Sketches.BloomH): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Sketches.bloomBits(batch, col(valueCol), m, h)
          .publishBatch(s"$sketchDir", batchId)
      }
      .start()

  /** Fold all per-batch Bloom bit tables into the corpus filter. */
  def mergedBloomBits(spark: SparkSession, sketchDir: String): DataFrame = {
    val dirs = StreamingDedup.listBatchDirs(spark, sketchDir).map(_._2)
    require(dirs.nonEmpty, s"no sketch batches under $sketchDir")
    spark.read.parquet(dirs: _*).distinct()
  }

  /** Maintain per-batch bottom-k quantile samples (grouped) under
    * `sketchDir/batch_<id>`. The per-batch sample must keep its sampling
    * KEY so batches re-merge: bottom-k of a union = bottom-k over the
    * per-batch bottom-k union — so this twin stores (group, value, id)
    * and [[mergedQuantileSample]] re-keys with the same hash. */
  def quantileSampleStream(
      rows: DataFrame, groupCol: String, idCol: String, valueCol: String,
      sketchDir: String, checkpointDir: String,
      k: Int = Sketches.QuantileSampleK): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // the sample row's ID survives next to its value (unlike the
        // batch operator's (group, value) output): merging re-keys with
        // the identical "qs:"||id hash, so bottom-k of the batch-sample
        // union IS the whole-stream bottom-k
        val keyed = batch.select(col(groupCol),
          col(idCol).cast("string").as("sample_id"), col(valueCol).as("value"))
        graft.operators.TopK.perKey(
          keyed.withColumn("__nh",
            negate(graft.operators.Dedup.md5Long(
              concat(lit("qs:"), col("sample_id"))))),
          groupCol, "__nh", k, tieBreak = Seq("sample_id"))
          .drop("__nh")
          .publishBatch(s"$sketchDir", batchId)
      }
      .start()

  /** Fold all per-batch samples into the corpus bottom-k sample —
    * identical to the one-shot sample over the full stream
    * (spec-checked). */
  def mergedQuantileSample(spark: SparkSession, sketchDir: String,
      groupCol: String, k: Int = Sketches.QuantileSampleK): DataFrame = {
    val dirs = StreamingDedup.listBatchDirs(spark, sketchDir).map(_._2)
    require(dirs.nonEmpty, s"no sample batches under $sketchDir")
    val union = spark.read.parquet(dirs: _*)
    Sketches.quantileSample(union, groupCol, col("sample_id"), col("value"), k)
  }

  /** Maintain per-batch KMV (theta) sketches under `sketchDir/batch_<id>`
    * — ≤ k hash rows per batch. */
  def kmvSketchStream(
      rows: DataFrame, valueCol: String, sketchDir: String, checkpointDir: String,
      k: Int = Sketches.KmvK): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Sketches.kmvSketch(batch, col(valueCol), k)
          .publishBatch(s"$sketchDir", batchId)
      }
      .start()

  /** Fold all per-batch KMV sketches into the corpus sketch — bottom-k
    * of the union of per-batch bottom-k sets IS the whole-stream sketch
    * (exact merge, like the quantile sample; spec-checked), so
    * intersection estimates between streamed cohorts stay available. */
  def mergedKmvSketch(spark: SparkSession, sketchDir: String,
      k: Int = Sketches.KmvK): DataFrame = {
    val dirs = StreamingDedup.listBatchDirs(spark, sketchDir).map(_._2)
    require(dirs.nonEmpty, s"no sketch batches under $sketchDir")
    spark.read.parquet(dirs: _*).distinct().orderBy("h").limit(k)
  }

  /** Maintain per-batch Munro-Paterson quantile sketches under
    * `sketchDir/batch_<id>` — each batch compacted to ≤ k weighted rows
    * before it lands, so the at-rest footprint is batches·k rows
    * regardless of stream volume. */
  def mpQuantileSketchStream(
      rows: DataFrame, groupCol: String, idCol: String, valueCol: String,
      sketchDir: String, checkpointDir: String,
      k: Int = Sketches.MpSketchK): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        Sketches.mpQuantileSketch(batch, groupCol, col(idCol), col(valueCol), k)
          .publishBatch(s"$sketchDir", batchId)
      }
      .start()

  /** Fold all per-batch MP sketches into the corpus sketch via pairwise
    * [[Sketches.mpMerge]] in batch-id order. Unlike the other four
    * sketch folds this one is LOSSY-but-bounded rather than identical to
    * the one-shot sketch (each merge spends another compaction level of
    * the Σ 2^ℓ/2 rank-error budget — the price of o(1/√k) accuracy in a
    * mergeable summary); it IS deterministic for a given batch split,
    * and the spec checks the folded estimates stay inside the widened
    * bound next to the one-shot sketch. */
  def mergedMpQuantileSketch(spark: SparkSession, sketchDir: String,
      groupCol: String, k: Int = Sketches.MpSketchK): DataFrame = {
    val dirs = StreamingDedup.listBatchDirs(spark, sketchDir).sortBy(_._1).map(_._2)
    require(dirs.nonEmpty, s"no sketch batches under $sketchDir")
    dirs.map(spark.read.parquet(_))
      .reduce((a, b) => Sketches.mpMerge(a, b, groupCol, k))
  }

  /** Maintain per-batch HyperBall 1-hop ball registers for an EDGE
    * stream under `sketchDir/batch_<id>`: each batch contributes the
    * registers of {v} ∪ out-neighbors(v) restricted to the batch's
    * edges. Ball registers are MONOTONE max-merge state — an edge seen
    * twice, in any batch, in any order, folds to the same registers —
    * so the corpus fold equals the one-shot batch B₁ registers over the
    * union of all edges (spec-checked). This is the incremental entry
    * point of [[graft.operators.GraphAnalytics.hyperAnf]]: fold, then
    * run the remaining T−1 propagation rounds offline without
    * rescanning the edge log for round one. */
  def ballRegistersStream(
      edges: DataFrame, srcCol: String, dstCol: String,
      sketchDir: String, checkpointDir: String,
      b: Int = Sketches.HllBits): StreamingQuery =
    edges.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val members = batch.select(col(srcCol).as("vid"), col(srcCol).as("member"))
          .unionAll(batch.select(col(dstCol).as("vid"), col(dstCol).as("member")))
          .unionAll(batch.select(col(srcCol).as("vid"), col(dstCol).as("member")))
        Sketches.hllRegistersGrouped(members, "vid", col("member"), b)
          .publishBatch(s"$sketchDir", batchId)
      }
      .start()

  /** Fold all per-batch ball registers into the corpus B₁ registers:
    * one (vid, bucket) max-combine — ≤ V·2^b rows however long the
    * stream ran. */
  def mergedBallRegisters(spark: SparkSession, sketchDir: String): DataFrame = {
    val dirs = StreamingDedup.listBatchDirs(spark, sketchDir).map(_._2)
    require(dirs.nonEmpty, s"no sketch batches under $sketchDir")
    spark.read.parquet(dirs: _*)
      .groupBy("vid", "bucket").agg(max(col("register")).cast("int").as("register"))
  }
}

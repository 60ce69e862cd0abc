package graft.streaming

import graft.streaming.BatchIo._

import graft.operators.Pca
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery
import org.apache.spark.sql.types._

/** Incremental PCA model maintenance (SURVEY §2.11): the streaming twin
  * of [[graft.operators.Pca]].
  *
  * PCA's sufficient statistics — (n, Σq, Σqqᵀ) on the exact integer
  * grid — merge by plain addition ([[Pca.Moments.merge]]), so the
  * streaming form is the [[StreamingSketches]] recipe verbatim: each
  * micro-batch writes its OWN moment block to a batch-id-named
  * subdirectory (idempotent under retry — a replayed batch overwrites
  * its own output, never double-counts), and the corpus model comes from
  * folding all blocks at read time + the deterministic driver solve.
  * Because the statistics are exact integers, stream ≡ batch is EXACT
  * model equality (spec-pinned, StreamingPcaSpec), not an approximation
  * — the property incremental-SVD-style updates fundamentally lack.
  *
  * Scale: a block is d + d(d+1)/2 DECIMAL cells (~2 KB serialized at
  * d = 64) regardless of batch size; folding B batches is a B-row local
  * read. The embedding stream itself never re-scans. */
object StreamingPca {

  private def blockSchema(dim: Int): StructType = StructType(Seq(
    StructField("n", DecimalType(38, 0)),
    StructField("s", ArrayType(DecimalType(38, 0))),
    StructField("g", ArrayType(DecimalType(38, 0)))))

  private def toRow(m: Pca.Moments): Row = Row(
    new java.math.BigDecimal(m.n.bigInteger),
    m.s.map(x => new java.math.BigDecimal(x.bigInteger)).toSeq,
    m.g.map(x => new java.math.BigDecimal(x.bigInteger)).toSeq)

  private def fromRow(r: Row): Pca.Moments = Pca.Moments(
    BigInt(r.getDecimal(0).toBigInteger),
    r.getSeq[java.math.BigDecimal](1).map(d => BigInt(d.toBigInteger)).toArray,
    r.getSeq[java.math.BigDecimal](2).map(d => BigInt(d.toBigInteger)).toArray)

  /** Per-micro-batch body, exposed for the retry/equivalence specs. */
  private[streaming] def processBatch(batch: DataFrame, batchId: Long,
      vecCol: String, momentsDir: String, scale: Double): Unit = {
    if (!batch.isEmpty) {
      val m = Pca.moments(batch, vecCol, scale)
      val spark = batch.sparkSession
      spark.createDataFrame(
          java.util.Collections.singletonList(toRow(m)), blockSchema(m.dim))
        .coalesce(1)
        .publishBatch(s"$momentsDir", batchId)
    }
  }

  /** Maintain per-batch moment blocks for `vecCol` under
    * `momentsDir/batch_<id>`. */
  def momentsStream(rows: DataFrame, vecCol: String, momentsDir: String,
      checkpointDir: String, scale: Double = Pca.Scale): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(batch, batchId, vecCol, momentsDir, scale)
      }
      .start()

  /** Fold every batch block into the corpus moments. */
  def mergedMoments(spark: SparkSession, momentsDir: String): Pca.Moments = {
    val dirs = StreamingDedup.listBatchDirs(spark, momentsDir).map(_._2)
    require(dirs.nonEmpty, s"no moment batches under $momentsDir")
    spark.read.parquet(dirs: _*).collect().map(fromRow).reduce(_ merge _)
  }

  /** The corpus-so-far model — EXACTLY the batch [[Pca.train]] result on
    * the union of all batches. */
  def currentModel(spark: SparkSession, momentsDir: String, k: Int,
      scale: Double = Pca.Scale, maxSweeps: Int = 64): Pca.PcaModel =
    Pca.modelFromMoments(mergedMoments(spark, momentsDir), k, scale, maxSweeps)
}

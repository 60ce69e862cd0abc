package graft.streaming

import graft.streaming.BatchIo._

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

  /** The authoritative read set of a COMPACTED batch LOG (a dir whose
    * state is the UNION of its generations — edge logs, count logs): the
    * newest `compact_<id>` checkpoint, if any, plus every `batch_<id>`
    * dir with a LARGER id. [[compactLog]] publishes the checkpoint with
    * one atomic rename, so this listing is crash-consistent at every
    * instant: superseded batch dirs are ignored whether or not their
    * deletion finished, and a replayed batch id ≤ the checkpoint
    * re-creates a dir this listing skips (its content is already folded
    * in — at-least-once replays re-write identical bytes). Without a
    * checkpoint this is exactly [[listBatchDirs]]. */
  private[streaming] def listLogDirs(spark: org.apache.spark.sql.SparkSession,
      dir: String): Seq[(Long, String)] = {
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) return Nil
    val st = fs.listStatus(path).toSeq.filter(_.isDirectory)
    val batches = st.collect {
      case s if s.getPath.getName.startsWith("batch_") =>
        (s.getPath.getName.stripPrefix("batch_").toLong, s.getPath.toString)
    }
    val compacts = st.collect {
      case s if s.getPath.getName.startsWith("compact_") =>
        (s.getPath.getName.stripPrefix("compact_").toLong, s.getPath.toString)
    }
    if (compacts.isEmpty) batches.sortBy(_._1)
    else {
      val newest = compacts.maxBy(_._1)
      (newest +: batches.filter(_._1 > newest._1)).sortBy(_._1)
    }
  }

  /** The authoritative read set of a compacted log as ONE DataFrame —
    * the public batch-consumer twin of [[listLogDirs]] (union-state
    * logs: the newest compact checkpoint plus every later batch dir).
    * The driver-gate q_hll_compacted query folds registers through
    * this, putting the retention path under the same oracle gate as
    * every batch operator. */
  def readLog(spark: org.apache.spark.sql.SparkSession, dir: String): DataFrame = {
    val dirs = listLogDirs(spark, dir)
    require(dirs.nonEmpty, s"no log generations under $dir")
    spark.read.parquet(dirs.map(_._2): _*)
  }

  /** On-disk generation count of a compacted log (compact checkpoint +
    * later batch dirs) — lets callers assert retention actually ran. */
  def logGenerationCount(spark: org.apache.spark.sql.SparkSession,
      dir: String): Int = listLogDirs(spark, dir).size

  /** Bound a batch-dir LOG's on-disk generation count (the streaming
    * twin of [[graft.model.PropertyGraphIO.vacuum]] for union-state
    * logs): fold the current read set into `compact_<maxId>` — staged
    * under a hidden tmp dir, published with ONE atomic rename — then
    * delete the superseded batch dirs and older checkpoints. Readers
    * going through [[listLogDirs]] see either the old read set or the
    * new checkpoint at every instant; a crash mid-cleanup leaves only
    * ignored dirs behind, and re-running compaction finishes the job.
    * Safe to run while the stream is live: a batch landing after the
    * listing has a larger id and stays in the read set, and every
    * producer publishes its batch dirs via [[BatchIo.BatchPublish
    * .publishBatch]]'s staged atomic rename (r13 ADVICE) — so the fold
    * can never read a half-written retry and freeze partial rows into
    * the checkpoint. */
  def compactLog(spark: org.apache.spark.sql.SparkSession, dir: String): Unit = {
    val cur = listLogDirs(spark, dir)
    if (cur.isEmpty) return
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val maxId = cur.map(_._1).max
    if (cur.size > 1 || !cur.head._2.endsWith(s"compact_$maxId")) {
      val tmp = new org.apache.hadoop.fs.Path(s"$dir/.tmp_compact_$maxId")
      val fin = new org.apache.hadoop.fs.Path(s"$dir/compact_$maxId")
      if (fs.exists(tmp)) fs.delete(tmp, true)
      spark.read.parquet(cur.map(_._2): _*)
        .write.mode("overwrite").parquet(tmp.toString)
      if (fs.exists(fin)) fs.delete(fin, true)
      require(fs.rename(tmp, fin), s"could not publish $tmp -> $fin")
    }
    // cleanup runs even when nothing new was folded, so a re-run after a
    // crashed cleanup — or after a stale replay re-created an old dir —
    // finishes the deletions (idempotent)
    fs.listStatus(path).foreach { st =>
      val n = st.getPath.getName
      val superseded = st.isDirectory &&
        ((n.startsWith("batch_") && n.stripPrefix("batch_").toLong <= maxId) ||
          (n.startsWith("compact_") && n.stripPrefix("compact_").toLong < maxId))
      if (superseded) fs.delete(st.getPath, true)
    }
  }

  /** Retention vacuum for DERIVED-generation tables (rank/label/feature/
    * skyline fronts, where each batch dir is a complete snapshot and
    * only the newest is authoritative): keep the newest `retain + 1`
    * batch dirs, delete the rest. `retain` defaults to 1, NOT 0 — a
    * foreachBatch retry replays the NEWEST batch, whose body reads the
    * newest strictly-older generation as its base; retaining one
    * predecessor keeps that replay exact. */
  def vacuumGenerations(spark: org.apache.spark.sql.SparkSession,
      dir: String, retain: Int = 1): Unit = {
    require(retain >= 0, "retain must be non-negative")
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    listBatchDirs(spark, dir).sortBy(-_._1).drop(retain + 1).foreach {
      case (_, p) => fs.delete(new org.apache.hadoop.fs.Path(p), true)
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
      .publishBatch(s"$pairsDir", batchId)

    banded.publishBatch(s"$indexDir", batchId)
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

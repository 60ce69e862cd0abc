package graft.streaming

import org.apache.spark.sql.DataFrame

/** Atomic publication of per-micro-batch output dirs (the StreamingNb
  * recipe, shared by every foreachBatch body — r13 ADVICE): stage the
  * parquet under a hidden `.tmp_batch_<id>` name that no listing
  * matches, then publish with ONE rename. A direct
  * `write.mode(overwrite)` straight to `batch_<id>` is visible
  * mid-write, so a concurrent [[StreamingDedup.compactLog]] fold could
  * read a half-written retry, fold partial rows into `compact_<id>`,
  * and permanently skip the replayed dir afterwards — silent log loss.
  * With the staged rename, listings, folds and compaction see either
  * the old dir or the complete new one — EXCEPT on the retry path
  * (r14 ADVICE): replacing an existing `batch_<id>` is delete-then-
  * rename, so there is a window where the dir is ABSENT. (An
  * overwriting rename cannot close it: POSIX rename(2) — and hence
  * FileContext's Rename.OVERWRITE — refuses a non-empty destination
  * DIRECTORY.) That window is safe because of a log invariant the
  * readers rely on: a batch is only ever replaced while it is the MAX
  * id in its log (foreachBatch replays the latest batch, never an
  * older one), and [[StreamingDedup.compactLog]] folds strictly by
  * ascending id from the compact watermark — a fold that lists during
  * the gap sees a shorter log and stops BEFORE the replayed id, never
  * past it, so no batch is ever silently skipped. A crash leaves only
  * an ignored hidden dir that the next attempt deletes. Rename is
  * atomic on local FS and HDFS; object stores with non-atomic rename
  * need a manifest commit layer instead — out of scope here. */
object BatchIo {

  implicit class BatchPublish(private val df: DataFrame) extends AnyVal {
    /** Atomically write `df` as `dir/batch_<batchId>`, optionally
      * partitioned by `partitionCols`. */
    def publishBatch(dir: String, batchId: Long, partitionCols: String*): Unit = {
      val conf = df.sparkSession.sparkContext.hadoopConfiguration
      val tmp = new org.apache.hadoop.fs.Path(s"$dir/.tmp_batch_$batchId")
      val fin = new org.apache.hadoop.fs.Path(s"$dir/batch_$batchId")
      val fs = tmp.getFileSystem(conf)
      if (fs.exists(tmp)) fs.delete(tmp, true)
      val w = df.write.mode("overwrite")
      (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
        .parquet(tmp.toString)
      // retry: replace the batch whole. The dir is briefly ABSENT here —
      // safe only because a replayed batch is always the max id in its
      // log (see the object scaladoc); do not reuse this helper for
      // rewriting HISTORICAL ids.
      if (fs.exists(fin)) fs.delete(fin, true)
      require(fs.rename(tmp, fin), s"could not publish $tmp -> $fin")
    }
  }
}

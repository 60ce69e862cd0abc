package graft.streaming

import graft.streaming.BatchIo._

import graft.operators.Skyline
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Incremental skyline maintenance (SURVEY §2.11): keep the Pareto
  * front current as data arrives, without rescanning history — the
  * streaming twin of [[graft.operators.Skyline]].
  *
  * Correctness rests on dominance transitivity: once a point is
  * dominated it stays dominated (its dominator either remains on the
  * front or was itself dominated by a transitively-dominating point),
  * so front' = skyline(front ∪ batch) — the state is the front itself,
  * typically microscopic next to history.
  *
  * Per micro-batch: read the CUMULATIVE front of the latest
  * strictly-older batch (not a union of per-batch outputs — each
  * batch's dir holds the whole front as of that batch), fold the new
  * rows in, write this batch's front dir with overwrite. A retried
  * batch re-reads the same older front and replaces its own output —
  * idempotent on at-least-once delivery (the StreamingDedup layout).
  */
object StreamingSkyline {

  def incrementalSkyline(
      rows: DataFrame, criteria: Seq[Skyline.Criterion],
      frontDir: String, checkpointDir: String,
      keyCols: Seq[String] = Nil, buckets: Int = 16): StreamingQuery =
    rows.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val spark = batch.sparkSession
        val olderDirs = StreamingDedup.listBatchDirs(spark, frontDir)
          .filter(_._1 < batchId)
        val base =
          if (olderDirs.isEmpty) batch
          else batch.unionByName(
            spark.read.parquet(olderDirs.maxBy(_._1)._2))
        Skyline.skylinePerKey(base, keyCols, criteria, buckets)
          .publishBatch(s"$frontDir", batchId)
      }
      .start()

  /** The current front: the latest batch's cumulative output. */
  def currentFront(spark: org.apache.spark.sql.SparkSession,
      frontDir: String): DataFrame = {
    val dirs = StreamingDedup.listBatchDirs(spark, frontDir)
    require(dirs.nonEmpty, s"no front batches under $frontDir")
    spark.read.parquet(dirs.maxBy(_._1)._2)
  }
}

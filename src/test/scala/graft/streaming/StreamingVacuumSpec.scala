package graft.streaming

import java.nio.file.Files
import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Bounded on-disk state for the batch-dir streaming recipe: without a
  * retention hook the generation logs grow with the STREAM'S LIFETIME —
  * unbounded disk for an infinite stream, the one resource the
  * idempotence recipe said nothing about. Two hooks bound it:
  *
  *   - [[StreamingDedup.compactLog]] for UNION-state logs (edge/count
  *     logs): fold the read set into one atomically-published
  *     `compact_<id>` checkpoint; readers via `listLogDirs` ignore
  *     superseded dirs at every instant, including a replayed old batch
  *     id re-creating its dir AFTER compaction.
  *   - [[StreamingDedup.vacuumGenerations]] for DERIVED snapshots
  *     (labels/ranks/features/fronts): keep the newest retain+1; the
  *     default retain=1 keeps exactly the predecessor a foreachBatch
  *     retry of the NEWEST batch reads as its base.
  *
  * These specs pin: state bounded after the hooks, reads byte-identical
  * across compact/vacuum, and retry-after-vacuum still exact.
  */
class StreamingVacuumSpec extends SparkTestBase {
  import spark.implicits._

  private def tmp(p: String) = Files.createTempDirectory(p).toString

  private def batchDirCount(dir: String): Int = {
    val f = new java.io.File(dir)
    if (!f.exists()) 0
    else f.listFiles().count(d => d.isDirectory &&
      (d.getName.startsWith("batch_") || d.getName.startsWith("compact_")))
  }

  test("cc: compact + vacuum bound disk state; latest labels and edge log exact") {
    val stateDir = tmp("vac-cc")
    val batches = Seq(
      Seq((1L, 2L), (3L, 4L)),
      Seq((2L, 3L)),
      Seq((10L, 11L)),
      Seq((4L, 10L))).map(_.toDF("s", "d"))
    batches.zipWithIndex.foreach { case (b, i) =>
      StreamingCc.processCcBatch(b, i.toLong, "s", "d", stateDir)
    }
    val cleanLabels = StreamingCc.latestLabels(spark, stateDir)
      .as[(Long, Long)].collect().toSet
    val cleanEdges = StreamingCc.readEdges(spark, stateDir)
      .as[(Long, Long)].collect().sorted.toSeq // multiset: duplicates matter
    assert(batchDirCount(s"$stateDir/edges") == 4)
    assert(batchDirCount(s"$stateDir/labels") == 4)

    StreamingDedup.compactLog(spark, s"$stateDir/edges")
    StreamingDedup.vacuumGenerations(spark, s"$stateDir/labels")
    assert(batchDirCount(s"$stateDir/edges") == 1, "edge log not compacted")
    assert(batchDirCount(s"$stateDir/labels") == 2, "labels not vacuumed to retain+1")
    assert(StreamingCc.readEdges(spark, stateDir)
      .as[(Long, Long)].collect().sorted.toSeq == cleanEdges,
      "compaction changed the edge log contents")
    assert(StreamingCc.latestLabels(spark, stateDir)
      .as[(Long, Long)].collect().toSet == cleanLabels)

    // retry of the NEWEST batch after vacuum: its base generation
    // (batch_2) was retained, so the replay is exact
    StreamingCc.processCcBatch(batches(3), 3L, "s", "d", stateDir)
    assert(StreamingCc.latestLabels(spark, stateDir)
      .as[(Long, Long)].collect().toSet == cleanLabels,
      "retry after vacuum diverged")

    // a new batch after compaction reads checkpoint + its own dir
    StreamingCc.processCcBatch(Seq((11L, 20L)).toDF("s", "d"), 4L, "s", "d", stateDir)
    val after = StreamingCc.latestLabels(spark, stateDir)
      .as[(Long, Long)].collect().toMap
    assert(after(20L) == after(10L) && after(10L) == after(1L),
      s"post-compaction batch lost history: $after") // 4-10 bridge + 11-20
  }

  test("ppr: a replayed pre-compaction batch id is ignored by the read set") {
    val stateDir = tmp("vac-ppr")
    def writeEdges(rows: Seq[(Long, Long)], id: Long): Unit =
      rows.toDF("src", "dst").write.mode("overwrite")
        .parquet(s"$stateDir/edges/batch_$id")
    writeEdges(Seq((1L, 2L)), 0L)
    writeEdges(Seq((2L, 3L)), 1L)
    writeEdges(Seq((3L, 1L)), 2L)
    val clean = StreamingPpr.readEdges(spark, stateDir)
      .as[(Long, Long)].collect().sorted.toSeq
    StreamingDedup.compactLog(spark, s"$stateDir/edges")
    assert(batchDirCount(s"$stateDir/edges") == 1)
    // at-least-once replay of an OLD id re-creates its dir with the same
    // bytes — the compaction-aware listing must skip it (already folded)
    writeEdges(Seq((1L, 2L)), 0L)
    assert(batchDirCount(s"$stateDir/edges") == 2)
    assert(StreamingPpr.readEdges(spark, stateDir)
      .as[(Long, Long)].collect().sorted.toSeq == clean,
      "replayed pre-compaction batch double-counted")
    // idempotent re-compaction cleans the straggler up
    StreamingDedup.compactLog(spark, s"$stateDir/edges")
    assert(StreamingPpr.readEdges(spark, stateDir)
      .as[(Long, Long)].collect().sorted.toSeq == clean)
  }
}

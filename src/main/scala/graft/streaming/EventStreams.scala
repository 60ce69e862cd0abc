package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import org.apache.spark.sql.types._

/** A single event row in its streaming shape (µs timestamps — the shared
  * precision across engines, see EventQueries). */
final case class Ev(user_id: Long, ts_us: Long, event_type: String, value: Double)

final case class SessionState(startUs: Long, lastUs: Long, n: Long, sum: Double)
final case class SessionOut(user_id: Long, session_start_us: Long, session_end_us: Long,
    n_events: Long, sum_value: Double)

/** A change-stream row for streaming SCD2 (key, event time µs, unique
  * tie-break id, tracked attribute). */
final case class Scd2Ev(key: Long, t_us: Long, tie: Long, attr: Option[String])
final case class Scd2State(version: Int, attr: Option[String], validFrom: Long,
    n: Long)
final case class Scd2Out(key: Long, version: Int, attr: Option[String],
    valid_from: Long, valid_to: Option[Long], n_events: Long, is_current: Boolean)

/** Structured Streaming operators over the events feed (SURVEY §2.11):
  * unbounded ingestion with watermarked windowed aggregation and
  * stateful gap-sessionization — the streaming twins of EventQueries'
  * batch forms, sharing semantics so a batch backfill and the live
  * stream agree.
  */
object EventStreams {

  /** The events logical schema after ingestion — `ts` is always int64
    * epoch-nanoseconds regardless of the files' physical timestamp
    * encoding (see graft.Tables.tsToNanos). */
  val EventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType), StructField("ts", LongType),
    StructField("user_id", LongType), StructField("event_type", StringType),
    StructField("value", DoubleType), StructField("props", StringType)))

  /** Unbounded read of an events directory (new files = new data).
    *
    * `readStream` needs a declared schema, and that schema must match the
    * files' *physical* `ts` encoding, which has varied across testdata
    * generations (int64-nanos vs timestamp[us]/NTZ). A one-time
    * footer-only batch probe of the directory resolves the physical type;
    * the stream then normalizes `ts` to the int64-ns contract at the scan
    * projection, so every downstream operator sees [[EventSchema]]. On an
    * empty / not-yet-populated directory the probe can't infer anything,
    * so we fall back to the declared int64-ns contract — preserving the
    * "new files = new data" cold start. */
  def readEvents(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val physicalTs =
      try spark.read.parquet(dir).schema("ts").dataType
      catch { case _: org.apache.spark.sql.AnalysisException => LongType }
    val physicalSchema = StructType(EventSchema.map(f =>
      if (f.name == "ts") f.copy(dataType = physicalTs) else f))
    spark.readStream.schema(physicalSchema).parquet(dir)
      .withColumn("ts", graft.Tables.tsToNanos(physicalTs, col("ts")))
      .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
  }

  /** Tumbling-window counts with a watermark: late data beyond
    * `watermark` is dropped, state is bounded — the only viable shape for
    * an unbounded 100 TB/day feed. */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("event_time", watermark)
      .groupBy(window(col("event_time"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("sum_value"))

  /** Stateful gap-sessionization via flatMapGroupsWithState: one state
    * object per user; a session closes (and is emitted) when an event
    * arrives more than `gapUs` after the previous one. Events inside a
    * batch are processed in ts order per user. */
  def sessionize(events: Dataset[Ev], gapUs: Long = 30L * 60 * 1000000): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, SessionOut](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (userId: Long, evs: Iterator[Ev], state: GroupState[SessionState]) =>
          val sorted = evs.toSeq.sortBy(_.ts_us)
          var cur = state.getOption
          val closed = scala.collection.mutable.ArrayBuffer.empty[SessionOut]
          sorted.foreach { e =>
            cur match {
              case Some(s) if e.ts_us - s.lastUs <= gapUs =>
                cur = Some(s.copy(lastUs = e.ts_us, n = s.n + 1, sum = s.sum + e.value))
              case Some(s) =>
                closed += SessionOut(userId, s.startUs, s.lastUs, s.n, s.sum)
                cur = Some(SessionState(e.ts_us, e.ts_us, 1, e.value))
              case None =>
                cur = Some(SessionState(e.ts_us, e.ts_us, 1, e.value))
            }
          }
          cur.foreach(state.update)
          closed.iterator
      }
  }

  /** Streaming SCD2 (the incremental twin of TimeSeries.scd2History,
    * SURVEY §2.11 #45l): one open interval of state per key; an arriving
    * event whose attr differs (null-safe, like the batch form) CLOSES the
    * open interval — emitted immediately with valid_to = the new
    * interval's valid_from — and opens the next version. Equal attrs just
    * extend the open interval's event count. Emitted rows are exactly the
    * batch operator's `is_current = false` rows, in arrival order
    * (spec-pinned); the open intervals live in state, one row per key —
    * V-sized state, never log-sized, which is what makes an unbounded
    * dimension history maintainable.
    *
    * Ordering contract: events must arrive per-key (t, tie)-monotone
    * ACROSS batches (within a batch they are sorted here) — the same
    * in-order-feed contract the sessionizer documents; an out-of-order
    * arrival would need a reorder buffer bounded by a watermark, which
    * this operator deliberately omits to keep state V-sized. */
  def scd2Stream(events: Dataset[Scd2Ev]): Dataset[Scd2Out] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState[Scd2State, Scd2Out](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (key: Long, evs: Iterator[Scd2Ev], state: GroupState[Scd2State]) =>
          val sorted = evs.toSeq.sortBy(e => (e.t_us, e.tie))
          var cur = state.getOption
          val closed = scala.collection.mutable.ArrayBuffer.empty[Scd2Out]
          sorted.foreach { e =>
            cur match {
              case Some(s) if s.attr == e.attr =>
                cur = Some(s.copy(n = s.n + 1))
              case Some(s) =>
                closed += Scd2Out(key, s.version, s.attr, s.validFrom,
                  Some(e.t_us), s.n, is_current = false)
                cur = Some(Scd2State(s.version + 1, e.attr, e.t_us, 1))
              case None =>
                cur = Some(Scd2State(1, e.attr, e.t_us, 1))
            }
          }
          cur.foreach(state.update)
          closed.iterator
      }
  }

  /** Native session windows (gap-based, watermark-bounded) — the built-in
    * alternative to [[sessionize]]'s explicit state machine; prefer this
    * when per-session output is aggregate-shaped (the engine keeps state
    * and merges adjacent windows automatically). */
  def sessionWindows(events: DataFrame, gap: String = "30 minutes",
      watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("event_time", watermark)
      .groupBy(session_window(col("event_time"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("sum_value"))

  /** Stream-stream attribution join: each purchase joins the same user's
    * view events from the preceding `attribution` interval. BOTH sides
    * carry watermarks and the join condition bounds view_time to a window
    * around purchase_time, so the state store evicts rows once the
    * watermark passes — the only shape under which an unbounded×unbounded
    * join has bounded state. Append-mode output: a match emits once both
    * sides have it. */
  def attributeConversions(events: DataFrame, attribution: String = "1 hour",
      watermark: String = "2 hours"): DataFrame = {
    val views = events.where(col("event_type") === "view")
      .select(col("user_id").as("v_user"), col("event_time").as("view_time"),
        col("event_id").as("view_id"))
      .withWatermark("view_time", watermark)
    val purchases = events.where(col("event_type") === "purchase")
      .select(col("user_id").as("user_id"), col("event_time").as("purchase_time"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_time", watermark)
    purchases.join(views,
      col("user_id") === col("v_user") &&
        col("view_time") <= col("purchase_time") &&
        col("view_time") >= col("purchase_time") - expr(s"INTERVAL $attribution"))
      .select(col("user_id"), col("purchase_id"), col("purchase_time"),
        col("view_id"), col("view_time"), col("value"))
  }

  /** Streaming exact dedup: drop events whose id was already seen, with
    * state bounded by the watermark (late duplicates beyond it are the
    * accepted trade-off — unbounded dedup state is impossible on an
    * unbounded stream). */
  def dedupStream(events: DataFrame, idCol: String = "event_id",
      watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("event_time", watermark)
      .dropDuplicatesWithinWatermark(idCol)

  /** Incremental graph ingest (SURVEY §2.11 #45): stream edge rows into a
    * PropertyGraph edge directory via the built-in parquet file sink,
    * which IS exactly-once — its _spark_metadata commit log records the
    * files of each committed batch, and a retried batch replaces rather
    * than re-appends. (A foreachBatch with a plain mode("append") write
    * would be at-least-once: a batch retried after a mid-write failure
    * appends its rows twice.) */
  def ingestEdges(edges: DataFrame, targetDir: String,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    edges.writeStream
      .format("parquet")
      .option("path", targetDir)
      .option("checkpointLocation", checkpointDir)
      .start()

  /** Streaming MUTATION ingest: merge each micro-batch into a label's
    * at-rest node table via PropertyGraphIO.upsertNodes — the streaming
    * twin of the Cypher MERGE+SET loop that maintains the reference's
    * source store. Within a batch, multiple updates to one key are
    * reduced to the final state (max `orderCol` wins, deterministic)
    * before the merge, because a snapshot merge takes one value per key.
    * Retry safety comes from the merge itself being idempotent: a batch
    * re-run after a mid-write failure re-merges the same final states
    * onto keys that already hold them, leaving the table identical (a new
    * generation with equal content) — unlike a blind append, which would
    * double rows. */
  def upsertNodesStream(batches: DataFrame, root: String, label: String,
      orderCol: String, checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    upsertStream(batches, checkpointDir, keyColsOf = b =>
      Seq(graft.model.PropertyGraphIO.identifierOf(root, label)), orderCol,
      (b, finalStates) =>
        graft.model.PropertyGraphIO.upsertNodes(b.sparkSession, root, label, finalStates))

  /** Relationship twin of [[upsertNodesStream]]: merge key is the endpoint
    * pair — resolved from the AT-REST table's first two columns (the
    * layout contract upsertRels merges on), not the batch's: a batch
    * whose columns arrive in a different order would otherwise be deduped
    * on the wrong pair and then rejected (or mis-merged) downstream. */
  def upsertRelsStream(batches: DataFrame, root: String, patternKey: String,
      orderCol: String, checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    upsertStream(batches, checkpointDir, keyColsOf = b =>
      graft.model.PropertyGraphIO.relKeyColsOf(b.sparkSession, root, patternKey), orderCol,
      (b, finalStates) =>
        graft.model.PropertyGraphIO.upsertRels(b.sparkSession, root, patternKey, finalStates))

  private def upsertStream(batches: DataFrame, checkpointDir: String,
      keyColsOf: DataFrame => Seq[String], orderCol: String,
      merge: (DataFrame, DataFrame) => Unit): org.apache.spark.sql.streaming.StreamingQuery = {
    import org.apache.spark.sql.expressions.Window
    batches.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val keyCols = keyColsOf(batch)
        val w = Window.partitionBy(keyCols.map(col): _*)
          .orderBy(col(orderCol).desc +: keyCols.map(col(_).asc): _*)
        val finalStates = batch
          .withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
        if (!finalStates.isEmpty) merge(batch, finalStates)
      }
      .start()
  }
}

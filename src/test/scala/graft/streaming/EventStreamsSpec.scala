package graft.streaming

import java.nio.file.{Files, Paths, StandardCopyOption}
import graft.SparkTestBase
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class NodeUpd(nid: Long, name: String, ver: Long)
case class RelUpd(a: Long, b: Long, w: Long)

class EventStreamsSpec extends SparkTestBase {
  import spark.implicits._

  private def stageEventsDir(): String = {
    val dir = Files.createTempDirectory("graft-events").toString
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"),
      Paths.get(dir, "events.parquet"), StandardCopyOption.REPLACE_EXISTING)
    dir
  }

  test("windowed streaming counts equal the batch equivalent") {
    val dir = stageEventsDir()
    val q = EventStreams.windowedCounts(EventStreams.readEvents(spark, dir))
      .writeStream.outputMode("complete").format("memory").queryName("win_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("win_out")
        .select("window_start", "event_type", "n_events")
        .as[(java.sql.Timestamp, String, Long)].collect().toSet
      val batch = graft.Tables.events(spark, dir)
        .withColumn("event_time", timestamp_micros(expr("ts div 1000")))
        .groupBy(window(col("event_time"), "1 hour"), col("event_type"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("window.start"), col("event_type"), col("n_events"))
        .as[(java.sql.Timestamp, String, Long)].collect().toSet
      assert(streamed == batch)
      assert(streamed.nonEmpty)
    } finally q.stop()
  }

  test("stateful sessionization: sessions close on gap, state carries across batches") {
    val ms = MemoryStream[Ev](spark)
    val out = EventStreams.sessionize(ms.toDS(), gapUs = 1000000L) // 1s gap
    val q = out.writeStream.outputMode("append").format("memory").queryName("sess_out").start()
    try {
      // batch 1: two events 0.5s apart (one session), then nothing
      ms.addData(Ev(1L, 0L, "click", 1.0), Ev(1L, 500000L, "click", 2.0))
      q.processAllAvailable()
      assert(spark.table("sess_out").count() == 0) // session still open in state

      // batch 2: event 10s later → closes the first session
      ms.addData(Ev(1L, 10500000L, "click", 4.0))
      q.processAllAvailable()
      val closed = spark.table("sess_out").as[SessionOut].collect()
      assert(closed.length == 1)
      assert(closed(0) == SessionOut(1L, 0L, 500000L, 2L, 3.0))

      // batch 3: another user in parallel, immediate gap close
      ms.addData(Ev(2L, 0L, "view", 1.0), Ev(2L, 5000000L, "view", 1.0))
      q.processAllAvailable()
      val all = spark.table("sess_out").as[SessionOut].collect()
      assert(all.exists(s => s.user_id == 2L && s.n_events == 1L))
    } finally q.stop()
  }

  test("streaming SCD2: closed intervals across batches ≡ the batch operator's") {
    val ms = MemoryStream[Scd2Ev](spark)
    val q = EventStreams.scd2Stream(ms.toDS())
      .writeStream.outputMode("append").format("memory").queryName("scd2_out").start()
    val log = Seq(
      Scd2Ev(1L, 10L, 1L, Some("a")), Scd2Ev(1L, 20L, 2L, Some("a")),
      Scd2Ev(1L, 30L, 3L, Some("b")),
      Scd2Ev(1L, 40L, 4L, Some("b")), Scd2Ev(1L, 50L, 5L, Some("a")),
      Scd2Ev(2L, 10L, 1L, Some("x")), Scd2Ev(2L, 10L, 2L, Some("y")),
      Scd2Ev(2L, 20L, 3L, None))
    try {
      // feed per-key in-order across three batches (the ordering contract)
      ms.addData(log.take(3): _*); q.processAllAvailable()
      ms.addData(log.slice(3, 6): _*); q.processAllAvailable()
      ms.addData(log.drop(6): _*); q.processAllAvailable()
      val streamed = spark.table("scd2_out").as[Scd2Out].collect()
        .map(o => (o.key, o.version, o.attr, o.valid_from, o.valid_to, o.n_events))
        .toSet
      val batch = graft.operators.TimeSeries.scd2History(
          log.toDF("uid", "t", "id", "attr"), "uid", "t", "id", "attr")
        .where(!col("is_current"))
        .as[(Long, Int, Option[String], Long, Option[Long], Long, Boolean)]
        .collect().map(r => (r._1, r._2, r._3, r._4, r._5, r._6)).toSet
      assert(streamed == batch && streamed.size == 4)
    } finally q.stop()
  }

  test("native session windows agree with the explicit-state sessionizer on counts") {
    val dir = stageEventsDir()
    val q = EventStreams.sessionWindows(EventStreams.readEvents(spark, dir))
      .writeStream.outputMode("complete").format("memory").queryName("sw_out").start()
    try {
      q.processAllAvailable()
      val sw = spark.table("sw_out")
      assert(sw.count() > 0)
      // total events across sessions == total events in the feed
      val totalEvents = sw.agg(sum("n_events")).head().getLong(0)
      assert(totalEvents == spark.read.parquet(dir).count())
    } finally q.stop()
  }

  test("stream-stream attribution join matches the batch twin on real data") {
    val dir = stageEventsDir()
    val q = EventStreams.attributeConversions(EventStreams.readEvents(spark, dir))
      .writeStream.outputMode("append").format("memory").queryName("attr_out").start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("attr_out")
        .groupBy("user_id", "purchase_id")
        .agg(count(lit(1)).as("n_views"))
        .as[(Long, Long, Long)].collect().toSet
      val batch = graft.queries.EventQueries
        .attribution(spark, Paths.get("/root/testdata/sf0.001").getParent.resolve("sf0.001").toString)
        .select("user_id", "purchase_id", "n_views")
        .as[(Long, Long, Long)].collect().toSet
      assert(streamed.nonEmpty)
      assert(streamed == batch)
    } finally q.stop()
  }

  test("streaming dedup drops repeated event ids within the watermark") {
    val dir = Files.createTempDirectory("graft-dedup").toString
    // two copies of the same events file → every event_id appears twice
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"), Paths.get(dir, "a.parquet"))
    Files.copy(Paths.get("/root/testdata/sf0.001/events.parquet"), Paths.get(dir, "b.parquet"))
    val q = EventStreams.dedupStream(EventStreams.readEvents(spark, dir))
      .writeStream.outputMode("append").format("memory").queryName("dedup_out").start()
    try {
      q.processAllAvailable()
      val total = spark.read.parquet(dir).count()
      val deduped = spark.table("dedup_out").count()
      assert(total == 2 * deduped)
      assert(spark.table("dedup_out").groupBy("event_id").count()
        .where(col("count") > 1).count() == 0)
    } finally q.stop()
  }

  test("streaming node upsert: in-batch last-write-wins, cross-batch merge, retry-idempotent shape") {
    import graft.model._
    val root = Files.createTempDirectory("graft-upsert-stream").toString
    val ckp = Files.createTempDirectory("graft-upsert-ckp").toString
    val nodes = Seq((1L, "one", 0L), (2L, "two", 0L), (3L, "three", 0L))
      .toDF("nid", "name", "ver")
    val g = PropertyGraph(
      nodes = Map("N" -> nodes), rels = Map.empty,
      schema = GraphSchema(labels = Seq(LabelSchema("N", "nid", Nil)), rels = Nil))
    PropertyGraphIO.save(g, root)

    val ms = MemoryStream[NodeUpd](spark)
    val q = EventStreams.upsertNodesStream(
      ms.toDS().select(col("nid"), col("name"), col("ver")),
      root, "N", orderCol = "ver", checkpointDir = ckp)
    try {
      // batch 1: two updates to nid=1 (ver 2 must win) + a brand-new nid=9
      ms.addData(NodeUpd(1L, "one_v1", 1L), NodeUpd(1L, "one_v2", 2L), NodeUpd(9L, "nine", 1L))
      q.processAllAvailable()
      val t1 = PropertyGraphIO.load(spark, root).nodes("N")
        .as[(Long, String, Long)].collect().map(r => r._1 -> r._2).toMap
      assert(t1 == Map(1L -> "one_v2", 2L -> "two", 3L -> "three", 9L -> "nine"))
      // batch 2: update the row batch 1 created
      ms.addData(NodeUpd(9L, "nine_v2", 2L))
      q.processAllAvailable()
      val t2 = PropertyGraphIO.load(spark, root).nodes("N")
        .as[(Long, String, Long)].collect().map(r => r._1 -> r._2).toMap
      assert(t2(9L) == "nine_v2" && t2.size == 4)
    } finally q.stop()
  }

  test("streaming rel upsert merges on the endpoint pair") {
    import graft.model._
    val root = Files.createTempDirectory("graft-upsert-rels").toString
    val ckp = Files.createTempDirectory("graft-upsert-rels-ckp").toString
    val p = RelPattern("N", "R", "N")
    val g = PropertyGraph(
      nodes = Map("N" -> Seq(1L, 2L, 3L).toDF("nid")),
      rels = Map(p -> Seq((1L, 2L, 10L)).toDF("N_nid_source", "N_nid_target", "w")),
      schema = GraphSchema(
        labels = Seq(LabelSchema("N", "nid", Nil)),
        rels = Seq(RelSchema(p, "nid", "nid", Nil))))
    PropertyGraphIO.save(g, root)

    val ms = MemoryStream[RelUpd](spark)
    val q = EventStreams.upsertRelsStream(
      ms.toDS().select(col("a").as("N_nid_source"), col("b").as("N_nid_target"), col("w")),
      root, p.key, orderCol = "w", checkpointDir = ckp)
    try {
      // replace edge (1,2) [two in-batch updates, max w wins] and append (2,3)
      ms.addData(RelUpd(1L, 2L, 77L), RelUpd(1L, 2L, 99L), RelUpd(2L, 3L, 5L))
      q.processAllAvailable()
      val got = PropertyGraphIO.load(spark, root).rels(p)
        .as[(Long, Long, Long)].collect().toSet
      assert(got == Set((1L, 2L, 99L), (2L, 3L, 5L)))
    } finally q.stop()
  }

  test("incremental edge ingest appends each micro-batch exactly once") {
    val src = Files.createTempDirectory("graft-ingest-src").toString
    val dst = Files.createTempDirectory("graft-ingest-dst").toString + "/edges"
    val ckp = Files.createTempDirectory("graft-ingest-ckp").toString
    Seq((1L, 10L), (2L, 20L)).toDF("src", "dst").write.parquet(src + "/batch1")
    val stream = spark.readStream
      .schema("src LONG, dst LONG")
      .parquet(src + "/batch1")
    val q = EventStreams.ingestEdges(stream, dst, ckp)
    try {
      q.processAllAvailable()
      assert(spark.read.parquet(dst).count() == 2)
    } finally q.stop()
  }

  test("readEvents cold-starts on an empty directory (new files = new data)") {
    val dir = Files.createTempDirectory("graft-events-cold").toString
    // empty dir: the physical-ts probe can't infer a schema; the declared
    // int64-ns fallback must let the stream open anyway
    val q = EventStreams.windowedCounts(EventStreams.readEvents(spark, dir))
      .writeStream.outputMode("complete").format("memory").queryName("cold_out").start()
    try {
      q.processAllAvailable()
      assert(spark.table("cold_out").count() == 0)
      // files arriving later are picked up — but only if their physical ts
      // matches the fallback schema, so stage an int64-ns file explicitly
      graft.Tables.events(spark, "/root/testdata/sf0.001")
        .limit(100).write.mode("overwrite").parquet(dir + "/late")
      // readEvents watches the dir root; move the part files up
      val late = Paths.get(dir, "late")
      Files.list(late).filter(p => p.toString.endsWith(".parquet"))
        .forEach(p => Files.move(p, Paths.get(dir, p.getFileName.toString)))
      q.processAllAvailable()
      assert(spark.table("cold_out").count() > 0)
    } finally q.stop()
  }
}

package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}

/** Loader-contract gate against the REAL driver-generated testdata.
  *
  * The driver regenerates /root/testdata between rounds and has already
  * changed the physical `ts` encoding once (TIMESTAMP(NANOS) →
  * timestamp[us]), silently breaking every ts-touching query in the
  * round-8 gate. This spec pins the ingestion contract to the actual
  * files at every scale factor so the next regeneration fails HERE,
  * loudly, instead of in the driver's correctness run.
  */
class TablesContractSpec extends SparkTestBase {
  private val sfDirs = Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
    "/root/testdata/sf0.1").filter(d => Files.isDirectory(Paths.get(d)))

  test("events.ts loads as int64 nanoseconds at every available SF") {
    assert(sfDirs.nonEmpty, "no testdata directories found")
    sfDirs.foreach { dir =>
      val ev = Tables.events(spark, dir)
      assert(ev.schema("ts").dataType == LongType,
        s"$dir: ts must normalize to LongType, got ${ev.schema("ts").dataType}")
      // ts arithmetic must analyze and the values must be plausible
      // epoch-ns (year 2000–2100 ⇒ ~0.95e18 .. 4.1e18... actually
      // 2024 epoch-ns ≈ 1.7e18): bound to [1e18, 1e19).
      val r = ev.selectExpr("min(ts div 1000) as lo_us", "max(ts) as hi_ns",
        "count(*) as n").head()
      assert(r.getLong(2) > 0, s"$dir: events is empty")
      assert(r.getLong(1) > 1e18.toLong && r.getLong(1) < 1e19.toLong,
        s"$dir: max ts ${r.getLong(1)} is not plausible epoch-ns")
    }
  }

  test("ts normalization is independent of session timezone") {
    val dir = sfDirs.head
    // bit_xor is an exact order-independent checksum that cannot overflow
    val utc = Tables.events(spark, dir).selectExpr("bit_xor(ts)").head().getLong(0)
    val prev = spark.conf.get("spark.sql.session.timeZone")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      val ny = Tables.events(spark, dir).selectExpr("bit_xor(ts)").head().getLong(0)
      assert(ny == utc, s"ts checksum differs across session timezones: $ny vs $utc")
    } finally spark.conf.set("spark.sql.session.timeZone", prev)
  }

  test("streaming reader agrees with the batch loader on real data") {
    import org.apache.spark.sql.streaming.Trigger
    val dir = Files.createTempDirectory("evcontract").toString
    Files.copy(Paths.get(s"${sfDirs.head}/events.parquet"),
      Paths.get(dir, "events.parquet"))
    val stream = graft.streaming.EventStreams.readEvents(spark, dir)
    assert(stream.schema("ts").dataType == LongType)
    val q = stream.selectExpr("bit_xor(ts) as x", "count(*) as n")
      .writeStream.format("memory").queryName("ev_contract")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.awaitTermination(120000)
    val got = spark.table("ev_contract").head()
    val want = Tables.events(spark, sfDirs.head)
      .selectExpr("bit_xor(ts)", "count(*)").head()
    assert(got.getLong(0) == want.getLong(0) && got.getLong(1) == want.getLong(1))
  }
}

package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MapLookupSpec extends SparkTestBase {
  import spark.implicits._

  test("LongLongMap: build, overwrite, zero key, miss default, grow past hint") {
    // duplicate key keeps the LAST value (the overlay-accumulation
    // contract); key 0 is stored out-of-band (0 marks an empty slot)
    val m = LongLongMap.build(
      Iterator((5L, 50L), (0L, 7L), (5L, 51L), (-3L, 9L)), sizeHint = 2)
    assert(m.get(5L, -1L) == 51L)
    assert(m.get(0L, -1L) == 7L)
    assert(m.get(-3L, -1L) == 9L)
    assert(m.get(42L, -1L) == -1L)
    assert(m.size == 3)
    assert(m.pairs.toMap == Map(5L -> 51L, 0L -> 7L, -3L -> 9L))
    // a zero size hint must still grow to hold everything
    val big = LongLongMap.build((1L to 10000L).iterator.map(k => (k, k * 2)), 0)
    assert(big.size == 10000)
    (1L to 10000L).foreach(k => assert(big.get(k, -1L) == k * 2))
    assert(LongLongMap.Empty.get(1L, -9L) == -9L)
  }

  test("BroadcastLongMapLookup: overlay shadows base, base serves the rest, codegen path") {
    val sc = spark.sparkContext
    val base = sc.broadcast(LongLongMap.build(
      (1L to 1000L).iterator.map(k => (k, k * 10)), 1000))
    val overlay = sc.broadcast(LongLongMap.build(
      Iterator((7L, 777L), (0L, 111L)), 2))
    // spark.range (a codegen'd leaf) rather than a LocalRelation: the
    // optimizer folds a projection over local rows via interpreted eval
    // (which would silently skip doGenCode)
    val df = spark.range(0L, 1001L).toDF("k")
      .select(col("k"), BroadcastLongMapLookup(col("k"), overlay, base, -5L).as("v"))
    val got = df.as[(Long, Long)].collect().toMap
    assert(got(7L) == 777L, "overlay must shadow base")
    assert(got(0L) == 111L, "zero key must resolve through the overlay")
    assert(got(3L) == 30L && got(1000L) == 10000L, "base must serve non-overlay keys")
    // 0 is in the overlay here; a key in NEITHER map takes the default —
    // and the whole select must run inside whole-stage codegen (the
    // expression exists to keep the round loop join-free AND codegen'd)
    val miss = Seq(5000L).toDF("k")
      .select(BroadcastLongMapLookup(col("k"), overlay, base, -5L)).as[Long].head()
    assert(miss == -5L)
    // the `*(n)` prefix marks a WholeStageCodegen stage in the simple
    // plan string — the projection must carry it (no interpreted
    // fallback; PlanAudit would also catch the codegen-failure WARN)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("*(1) Project"), s"expected codegen'd projection, got:\n$plan")
    base.destroy(); overlay.destroy()
  }
}

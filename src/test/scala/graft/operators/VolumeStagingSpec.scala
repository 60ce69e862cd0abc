package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Contract of the shared volume-gated staging helpers (PLANS.md r11
  * delta 7): partition counts derive from row volume below the config
  * cap, the cap binds above it, and volumeStage never pins a
  * checkpoint for a source the cap declares "large" — both contract
  * points were fixed by sf3 measurement (tiny-task/shuffle-block
  * explosion past the cap; G1 humongous-allocation failures from
  * eager full-scale checkpoints) before being baked in here. */
class VolumeStagingSpec extends SparkTestBase {
  private def conf = spark.sessionState.conf.numShufflePartitions // 4 in tests

  test("volumeParts: one partition per 300k rows, capped at the config count, floor 1") {
    assert(GraphAnalytics.volumeParts(spark, 0L) === 1)
    assert(GraphAnalytics.volumeParts(spark, 1L) === 1)
    assert(GraphAnalytics.volumeParts(spark, 300000L) === 2)
    assert(GraphAnalytics.volumeParts(spark, 650000L) === 3)
    // cap binds: the config value, never more
    assert(GraphAnalytics.volumeParts(spark, 100L * 300000L) === conf)
  }

  test("volumePartsOpt: Some(volume-sized) strictly below the cap, None at/after it") {
    assert(GraphAnalytics.volumePartsOpt(spark, 1L) === Some(1))
    assert(GraphAnalytics.volumePartsOpt(spark, 650000L) === Some(3))
    // at the boundary and past it, None — callers then keep the bare
    // repartition(key) whose exchange stays AQE-coalescible
    assert(GraphAnalytics.volumePartsOpt(spark, 3L * 300000L) === None)
    assert(GraphAnalytics.volumePartsOpt(spark, 100L * 300000L) === None)
  }

  test("volumeStage: small sources come back pinned with a count; large ones UNTOUCHED") {
    val df = spark.range(10).select(col("id").as("u"), (col("id") + 1).as("v"))
    val (small, smallParts) = GraphAnalytics.volumeStage(df, 10L)
    assert(smallParts === Some(1))
    // pinned: the returned plan is a materialized checkpoint, not the lineage
    assert(small.queryExecution.analyzed ne df.queryExecution.analyzed)
    assert(small.collect().toSet === df.collect().toSet)

    val (large, largeParts) = GraphAnalytics.volumeStage(df, 10L * 300000L)
    assert(largeParts === None)
    // untouched: the exact source reference ships, no eager checkpoint
    assert(large eq df)
  }

  test("repartitionSized honors the explicit count and the bare fallback") {
    val df = spark.range(1000).select(col("id").as("u"), (col("id") % 7).as("v"))
    val sized = GraphAnalytics.repartitionSized(df, Some(3), col("u"))
    assert(sized.rdd.getNumPartitions === 3)
    val bare = GraphAnalytics.repartitionSized(df, None, col("u"))
    // bare = repartition(key) with NO explicit count — which is exactly
    // what leaves AQE free to coalesce the tiny exchange (observed: 1
    // partition here), where the explicit count above opts out of it
    assert(bare.rdd.getNumPartitions <= conf)
    assert(sized.collect().toSet === bare.collect().toSet)
  }
}

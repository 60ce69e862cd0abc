package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class AsOfSpec extends SparkTestBase {
  import spark.implicits._

  test("carry-forward: latest matching value at or before each row") {
    val df = Seq(
      (1L, 1L, "view", 0.0), (1L, 2L, "purchase", 5.0), (1L, 3L, "view", 0.0),
      (1L, 4L, "purchase", 7.0), (1L, 5L, "view", 0.0),
      (2L, 1L, "view", 0.0)).toDF("user", "t", "kind", "v")
    val got = AsOf.carryForward(df, "user", Seq("t"),
      col("kind") === "purchase", col("v"), "last_p")
      .select("user", "t", "last_p").as[(Long, Long, Option[Double])].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got((1L, 1L)).isEmpty)        // nothing before first event
    assert(got((1L, 2L)).contains(5.0))  // at = inclusive
    assert(got((1L, 3L)).contains(5.0))
    assert(got((1L, 5L)).contains(7.0))
    assert(got((2L, 1L)).isEmpty)        // partitions independent
  }

  test("as-of join: nearest right row at or before each left row") {
    val events = Seq((10L, 100L, "a"), (10L, 200L, "b"), (10L, 50L, "c"))
      .toDF("k", "t", "tag")
    val quotes = Seq((10L, 90L, 1.5), (10L, 150L, 2.5), (11L, 10L, 9.9))
      .toDF("k", "t", "price")
    val got = AsOf.joinAsOf(events, quotes, "k", "t",
      rightValue = col("price"), asOfCol = "px")
      .select("tag", "px").as[(String, Option[Double])].collect().toMap
    assert(got("c").isEmpty)           // t=50, earliest quote is 90
    assert(got("a").contains(1.5))     // t=100 → quote@90
    assert(got("b").contains(2.5))     // t=200 → quote@150
  }
}

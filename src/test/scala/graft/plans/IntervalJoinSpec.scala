package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class IntervalJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val facts = Seq((1L, 5L), (2L, 15L), (3L, 25L), (4L, 100L), (5L, 10L))
    .toDF("fact_id", "t")
  private val ivs = Seq((10L, 0L, 10L), (20L, 10L, 20L), (30L, 5L, 30L))
    .toDF("iv_id", "s", "e")

  test("interval join equals the BNLJ range join, including overlaps and inclusive ends") {
    val got = IntervalJoin.join(facts, ivs, facts("t"), ivs("s"), ivs("e"))
      .select("fact_id", "iv_id").as[(Long, Long)].collect().toSet
    val want = facts.join(ivs, facts("t") >= ivs("s") && facts("t") <= ivs("e"))
      .select("fact_id", "iv_id").as[(Long, Long)].collect().toSet
    assert(got == want)
    // hand-check a few: t=5 ∈ [0,10] and [5,30]; t=100 matches none
    assert(got.contains((1L, 10L)) && got.contains((1L, 30L)))
    assert(!got.exists(_._1 == 4L))
    // t=10 is inclusive in [0,10], [10,20], [5,30]
    assert(Set((5L, 10L), (5L, 20L), (5L, 30L)).subsetOf(got))
  }

  test("physical plan uses IntervalJoinExec, not BroadcastNestedLoopJoin") {
    val df = IntervalJoin.join(facts, ivs, facts("t"), ivs("s"), ivs("e"))
    df.collect()
    // SparkPlan.nodeName strips the "Exec" suffix in plan strings
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("IntervalJoin"))
    assert(!plan.contains("BroadcastNestedLoopJoin"))
    assert(df.queryExecution.executedPlan.exists(_.isInstanceOf[IntervalJoinExec]))
  }

  test("optimizer rule rewrites a plain BETWEEN join to IntervalJoinExec") {
    IntervalJoin.register(spark)
    val df = facts.join(ivs, facts("t") >= ivs("s") && facts("t") <= ivs("e"))
      .select("fact_id", "iv_id")
    df.collect()
    assert(df.queryExecution.executedPlan.exists(_.isInstanceOf[IntervalJoinExec]),
      df.queryExecution.executedPlan.toString)
    val direct = IntervalJoin.join(facts, ivs, facts("t"), ivs("s"), ivs("e"))
      .select("fact_id", "iv_id").as[(Long, Long)].collect().toSet
    assert(df.as[(Long, Long)].collect().toSet == direct)
  }

  test("null fact times produce no matches; downstream ops compose") {
    val withNull = Seq((1L, Some(5L)), (2L, None)).toDF("fact_id", "t")
    val got = IntervalJoin.join(withNull, ivs, withNull("t"), ivs("s"), ivs("e"))
      .groupBy("fact_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got.get(2L).isEmpty)
    assert(got(1L) == 2L) // [0,10] and [5,30]
  }
}

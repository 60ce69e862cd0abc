package graft.operators

import graft.SparkTestBase

class ButterfliesSpec extends SparkTestBase {
  import spark.implicits._

  test("hand-computed: one 4-cycle, K_{2,3}, and a non-butterfly wedge") {
    // K_{2,2} (one butterfly): customers 1,2 × parts 10,20
    val square = Seq((1L, 10L), (1L, 20L), (2L, 10L), (2L, 20L))
    val g1 = Butterflies.globalCount(square.toDF("l", "r"), "l", "r")
      .as[(Long, Long, Long)].head()
    assert(g1 == ((4L, 2L, 1L)))  // 4 edges, wedge pair (1,2) w=2, C(2,2)=1

    // K_{2,3}: w=3 for the single pair → C(3,2)=3 butterflies
    val k23 = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 10L), (2L, 20L), (2L, 30L))
    assert(Butterflies.globalCount(k23.toDF("l", "r"), "l", "r")
      .as[(Long, Long, Long)].head() == ((6L, 3L, 3L)))

    // a wedge only (one shared part) has no butterfly
    val wedge = Seq((1L, 10L), (2L, 10L), (1L, 20L))
    assert(Butterflies.globalCount(wedge.toDF("l", "r"), "l", "r")
      .as[(Long, Long, Long)].head() == ((3L, 1L, 0L)))
  }

  test("per-vertex counts symmetric over K_{2,3} and empty below threshold") {
    val k23 = Seq((1L, 10L), (1L, 20L), (1L, 30L), (2L, 10L), (2L, 20L), (2L, 30L))
    val per = Butterflies.perLeftVertex(k23.toDF("l", "r"), "l", "r")
      .as[(Long, Long)].collect().toMap
    assert(per == Map(1L -> 3L, 2L -> 3L))
  }

  test("maxRightDegree drops hub parts from every statistic") {
    // part 99 is a degree-3 hub; cap 2 removes it entirely
    val g = Seq((1L, 99L), (2L, 99L), (3L, 99L), (1L, 10L), (2L, 10L))
    val stats = Butterflies.globalCount(g.toDF("l", "r"), "l", "r", maxRightDegree = 2)
      .as[(Long, Long, Long)].head()
    assert(stats == ((2L, 1L, 0L)))  // only part 10's edges and wedge remain
    // duplicate edges dedupe before counting
    val dup = g ++ g
    assert(Butterflies.globalCount(dup.toDF("l", "r"), "l", "r", maxRightDegree = 2)
      .as[(Long, Long, Long)].head() == ((2L, 1L, 0L)))
  }
}

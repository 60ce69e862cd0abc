package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions.col

class ModularitySpec extends SparkTestBase {
  import spark.implicits._

  /** Two triangles joined by one bridge edge — the textbook modularity
    * fixture: the optimum is one community per triangle. */
  private def twoTriangles() = Seq(
    (1L, 2L), (2L, 3L), (1L, 3L),
    (4L, 5L), (5L, 6L), (4L, 6L),
    (3L, 4L)).toDF("src", "dst")

  test("modularity communities: two triangles split at the bridge") {
    val comm = GraphAnalytics.modularityCommunitiesDF(twoTriangles(), numIter = 4)
      .as[(Long, Long)].collect().toMap
    assert(comm.keySet == (1L to 6L).toSet)
    val a = Set(1L, 2L, 3L).map(comm)
    val b = Set(4L, 5L, 6L).map(comm)
    assert(a.size == 1, s"triangle 1 not one community: $comm")
    assert(b.size == 1, s"triangle 2 not one community: $comm")
    assert(a != b, s"bridge merged the triangles: $comm")
  }

  test("modularity communities: broadcast and shuffle plans agree; deterministic") {
    val e = twoTriangles()
    val bc = GraphAnalytics.modularityCommunitiesDF(e, numIter = 3)
      .as[(Long, Long)].collect().toSet
    val sh = GraphAnalytics.modularityCommunitiesDF(e, numIter = 3,
      broadcastState = false).as[(Long, Long)].collect().toSet
    assert(bc == sh)
    val again = GraphAnalytics.modularityCommunitiesDF(e, numIter = 3)
      .as[(Long, Long)].collect().toSet
    assert(bc == again)
  }

  test("modularity score: exact value on the known optimum, and it dominates") {
    val e = twoTriangles()
    // optimum: {1,2,3} and {4,5,6}; m = 7, Q = 2·(6/14 − (7/14)²) = 5/14
    val opt = Seq((1L, 10L), (2L, 10L), (3L, 10L),
      (4L, 20L), (5L, 20L), (6L, 20L)).toDF("vid", "community")
    val row = GraphAnalytics.modularityScore(e, opt).collect().head
    assert(row.getLong(0) == 2L)
    assert(row.getDouble(1) == math.rint(5.0 / 14.0 * 1e6) / 1e6)

    // singletons score 0 - Σ(k/2m)² < 0; one blob scores exactly 0
    val single = (1L to 6L).map(v => (v, v)).toDF("vid", "community")
    val blob = (1L to 6L).map(v => (v, 1L)).toDF("vid", "community")
    assert(GraphAnalytics.modularityScore(e, single).collect().head.getDouble(1) < 0.0)
    assert(GraphAnalytics.modularityScore(e, blob).collect().head.getDouble(1) == 0.0)

    // the operator's own assignment reaches the optimum here
    val found = GraphAnalytics.modularityCommunitiesDF(e, numIter = 4)
    val q = GraphAnalytics.modularityScore(e, found).collect().head.getDouble(1)
    assert(q == math.rint(5.0 / 14.0 * 1e6) / 1e6)
  }

  test("modularity communities: a star collapses to one community") {
    // center 1 with leaves 2..5: parity rounds move odd then even
    // vertices; stay-on-tie keeps the center anchored while the leaves
    // join it — one community by round 3 (hand-traced), stable after
    val star = (2L to 5L).map(l => (1L, l)).toDF("src", "dst")
    val comm = GraphAnalytics.modularityCommunitiesDF(star, numIter = 4)
      .as[(Long, Long)].collect().toMap
    assert(comm.values.toSet.size == 1, s"star should be one community: $comm")
  }

  test("modularity communities: self-loops and duplicate edges are ignored") {
    val e = twoTriangles()
      .unionAll(Seq((1L, 1L), (2L, 1L), (1L, 2L)).toDF("src", "dst"))
    val base = GraphAnalytics.modularityCommunitiesDF(twoTriangles(), numIter = 3)
      .as[(Long, Long)].collect().toSet
    val dup = GraphAnalytics.modularityCommunitiesDF(e, numIter = 3)
      .as[(Long, Long)].collect().toSet
    assert(base == dup)
  }
}

package graft.operators

import graft.SparkTestBase

class BetweennessSpec extends SparkTestBase {
  import spark.implicits._

  private def bc(edges: Seq[(Long, Long)], nPivots: Int, horizon: Int,
      broadcast: Boolean = true): Map[Long, Double] =
    Betweenness.pivotBetweenness(edges.toDF("src", "dst"), nPivots, horizon,
      broadcastState = broadcast)
      .as[(Long, Double)].collect().toMap

  test("path graph, all pivots: exact Brandes values") {
    // 1-2-3-4-5: unnormalized directed-pair betweenness is
    // BC(3)=8, BC(2)=BC(4)=6, endpoints 0 (σ=1 everywhere → no rounding)
    val m = bc((1L to 4L).map(i => (i, i + 1)), nPivots = 5, horizon = 6)
    assert(m == Map(1L -> 0.0, 2L -> 6.0, 3L -> 8.0, 4L -> 6.0, 5L -> 0.0))
  }

  test("square graph, all pivots: fractional path counts split evenly") {
    // 1-2-4-3-1: each vertex mediates one opposite pair via σ=2 → 2·(1/2)
    val m = bc(Seq((1L, 2L), (2L, 4L), (4L, 3L), (3L, 1L)), nPivots = 4, horizon = 4)
    assert(m == Map(1L -> 1.0, 2L -> 1.0, 3L -> 1.0, 4L -> 1.0))
  }

  test("bounded horizon truncates far pairs") {
    // path 1..5 with horizon 2: only ≤2-hop pairs count; BC(3) = pairs
    // (1,5) dropped, (2,4)/(4,2) kept + (1,3)... hand sum: from each
    // endpoint s, δ_s(mid)=1 for the one 2-hop pair through it
    val full = bc((1L to 4L).map(i => (i, i + 1)), nPivots = 5, horizon = 6)
    val cut = bc((1L to 4L).map(i => (i, i + 1)), nPivots = 5, horizon = 2)
    assert(cut(3L) == 2.0) // (1,3)?? no: pairs THROUGH 3 within 2 hops: (2,4),(4,2)
    assert(cut(2L) == 2.0 && cut(4L) == 2.0)
    assert(cut.values.sum < full.values.sum)
  }

  test("pivot subset: dependency sums only from selected pivots; deterministic") {
    val edges = (1L to 4L).map(i => (i, i + 1))
    val two = bc(edges, nPivots = 2, horizon = 6)
    val five = bc(edges, nPivots = 5, horizon = 6)
    assert(two.values.sum < five.values.sum)
    assert(bc(edges, nPivots = 2, horizon = 6) == two)
  }

  test("broadcast and shuffle plans agree") {
    val edges = Seq((1L, 2L), (2L, 4L), (4L, 3L), (3L, 1L), (4L, 5L))
    assert(bc(edges, 5, 4) == bc(edges, 5, 4, broadcast = false))
  }

  test("disconnected vertices score zero; short-circuit past the true diameter") {
    val edges = Seq((1L, 2L), (2L, 3L), (10L, 11L))
    val m = bc(edges, nPivots = 5, horizon = 10) // horizon ≫ diameter
    assert(m(2L) == 2.0 && m(1L) == 0.0 && m(3L) == 0.0)
    assert(m(10L) == 0.0 && m(11L) == 0.0)
  }
}

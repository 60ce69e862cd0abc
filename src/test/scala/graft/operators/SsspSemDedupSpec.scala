package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SsspSemDedupSpec extends SparkTestBase {
  import spark.implicits._

  test("sssp takes a cheaper 3-hop detour over the direct edge") {
    // 1→2 costs 10 directly, but 1→3→4→2 costs 3
    val edges = Seq((1L, 2L, 10L), (1L, 3L, 1L), (3L, 4L, 1L), (4L, 2L, 1L)).toDF("src", "dst", "w")
    val sources = Seq(1L).toDF("vid")
    val d = GraphAnalytics.ssspDistances(edges, sources, rounds = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(1L -> 0L, 2L -> 3L, 3L -> 1L, 4L -> 2L))
  }

  test("sssp with too few rounds reports the best path found so far") {
    val edges = Seq((1L, 2L, 10L), (1L, 3L, 1L), (3L, 4L, 1L), (4L, 2L, 1L)).toDF("src", "dst", "w")
    val d = GraphAnalytics.ssspDistances(edges, Seq(1L).toDF("vid"), rounds = 1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d(2L) == 10L) // the detour needs 3 relaxation rounds
  }

  test("sssp frontier shrinks to the wavefront and short-circuits at the fixpoint") {
    // path graph 1-2-3-4-5: frontier is one vertex per round (the
    // wavefront), and rounds stop as soon as a frontier empties even
    // with a generous budget — a fixpoint round is the identity
    val edges = (1L to 4L).map(i => (i, i + 1, 1L)).toDF("src", "dst", "w")
    val (d, sizes) = GraphAnalytics.ssspDistancesWithStats(
      edges, Seq(1L).toDF("vid"), rounds = 50)
    val m = d.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
    // rounds 1-4 reach one new vertex each; round 5 (backward relaxation
    // finds nothing better) empties and the loop stops — not 50 rounds
    assert(sizes == Seq(1L, 1L, 1L, 1L, 0L), s"got $sizes")
  }

  test("sssp frontier form matches dense semantics when a vertex improves twice") {
    // 1→5 direct costs 9 (settles round 1), the 4-hop detour costs 4
    // (improves vertex 5 again in round 4) — the re-improvement must
    // re-enter the frontier and the final map must show the detour
    val edges = Seq((1L, 5L, 9L), (1L, 2L, 1L), (2L, 3L, 1L), (3L, 4L, 1L), (4L, 5L, 1L))
      .toDF("src", "dst", "w")
    val (d, sizes) = GraphAnalytics.ssspDistancesWithStats(
      edges, Seq(1L).toDF("vid"), rounds = 10, undirected = false)
    val m = d.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(m(5L) == 4L, s"got $m")
    // vertex 5 appears in round 1's frontier (d=9) AND round 4's (d=4)
    assert(sizes.head == 2L && sizes(3) == 1L && sizes.last == 0L, s"got $sizes")
  }

  test("sssp respects direction when undirected = false") {
    val edges = Seq((2L, 1L, 5L)).toDF("src", "dst", "w")
    val d = GraphAnalytics.ssspDistances(edges, Seq(1L).toDF("vid"), rounds = 3,
      undirected = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(1L -> 0L)) // 2 is upstream only
  }

  test("sssp collapses parallel edges to their min weight") {
    val edges = Seq((1L, 2L, 7L), (1L, 2L, 3L)).toDF("src", "dst", "w")
    val d = GraphAnalytics.ssspDistances(edges, Seq(1L).toDF("vid"), rounds = 2)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d(2L) == 3L)
  }

  test("personalized PageRank keeps mass relative to the source set") {
    // 1 → 2 → 3, plus 4 → 1: with S = {1}, vertex 4 gets NO rank (nothing
    // flows to it, it is not a source) while 2 and 3 accumulate damped mass
    val edges = Seq((1L, 2L), (2L, 3L), (4L, 1L)).toDF("src", "dst")
    val out = GraphAnalytics.personalizedPageRankDF(edges, Seq(1L).toDF("vid"), numIter = 6)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(!out.contains(4L), s"unreached vertex ranked: $out")
    // 1 receives nothing (its only in-neighbor 4 has rank 0) → pure teleport
    assert(out(1L) == 0.15)
    // one hop: r1(2) = damp·r(1); converges to 0.85·0.15 = 0.1275
    assert(out(2L) == 0.1275, s"got ${out(2L)}")
    assert(out(3L) > 0.0 && out(3L) < out(2L))
  }

  test("semanticDedup keeps the lowest id of each within-cluster duplicate pair") {
    val model = Similarity.IvfModel(Array(Array(1.0, 0.0), Array(0.0, 1.0)))
    val vecs = Seq(
      (1L, Seq(1.0, 0.0)),  // cell 0
      (2L, Seq(1.0, 0.0)),  // cell 0, identical to 1 → dropped
      (3L, Seq(0.8, 0.6)),  // cell 0, cos 0.8 vs 1 → kept at τ=0.99
      (10L, Seq(0.0, 1.0)), // cell 1
      (11L, Seq(0.0, 2.0))) // cell 1, cos 1 vs 10 → dropped
      .toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(vecs, "vec_id", "embedding", model, threshold = 0.99)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(out(1L)._2 && !out(2L)._2 && out(3L)._2 && out(10L)._2 && !out(11L)._2)
    assert(out(1L)._1 == 0L && out(10L)._1 == 1L)
  }

  test("semanticDedup misses cross-cluster duplicates by construction") {
    // two identical vectors equidistant from neither centroid land in the
    // SAME cell (argmin is deterministic) — so build a pair that truly
    // splits: nudge each toward a different centroid
    val model = Similarity.IvfModel(Array(Array(1.0, 0.0), Array(0.0, 1.0)))
    val vecs = Seq(
      (1L, Seq(0.9, 0.8)),  // cell 0
      (2L, Seq(0.8, 0.9)))  // cell 1; cos vs 1 ≈ 0.99+ but never compared
      .toDF("vec_id", "embedding")
    val out = Similarity.semanticDedup(vecs, "vec_id", "embedding", model, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out(1L) && out(2L)) // both kept: the documented trade
  }
}

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

  /** Ring of `n` triangles — the classic resolution-limit fixture
    * (Fortunato & Barthélemy 2007): level 1 finds each triangle; for
    * n > 2m/(k²) the CONTRACTED level merges adjacent triangles (gain
    * 2m·w − k² = 8n − 64 > 0 at n > 8), which one-level moves can
    * never do. Bridges close the ring at the triangle "3" vertices. */
  private def triangleRing(n: Int) = {
    val tris = (0 until n).flatMap { t =>
      val b = 3L * t
      Seq((b + 1, b + 2), (b + 2, b + 3), (b + 1, b + 3))
    }
    val bridges = (0 until n).map { t =>
      (3L * t + 3, 3L * ((t + 1) % n) + 1)
    }
    (tris ++ bridges).toDF("src", "dst")
  }

  test("multi-level with levels = 1 is bit-identical to the single-level operator") {
    for (fixture <- Seq(twoTriangles(), (2L to 5L).map(l => (1L, l)).toDF("src", "dst"))) {
      val one = GraphAnalytics.modularityCommunitiesDF(fixture, numIter = 4)
        .as[(Long, Long)].collect().toSet
      val ml = GraphAnalytics.modularityCommunitiesMultiLevelDF(fixture,
        numIter = 4, levels = 1).as[(Long, Long)].collect().toSet
      assert(one == ml)
    }
  }

  test("level-2 contraction merges the triangle ring and Q strictly improves") {
    val e = triangleRing(10)
    val l1 = GraphAnalytics.modularityCommunitiesDF(e, numIter = 4)
    val l2 = GraphAnalytics.modularityCommunitiesMultiLevelDF(e, numIter = 4, levels = 2)
    val c1 = l1.as[(Long, Long)].collect().toMap
    val c2 = l2.as[(Long, Long)].collect().toMap
    // level 1 resolves exactly the 10 triangles
    assert(c1.values.toSet.size == 10, s"level 1 should find the triangles: $c1")
    // contraction merges some of them — impossible for one-level moves
    assert(c2.values.toSet.size < 10, s"level 2 merged nothing: $c2")
    // label composition preserves level-1 grouping: triangles stay intact
    (0 until 10).foreach { t =>
      val ids = Set(3L * t + 1, 3L * t + 2, 3L * t + 3)
      assert(ids.map(c2).size == 1, s"triangle $t split at level 2: $c2")
    }
    val q1 = GraphAnalytics.modularityScore(e, l1).collect().head.getDouble(1)
    val q2 = GraphAnalytics.modularityScore(e, l2).collect().head.getDouble(1)
    assert(q2 > q1, s"contraction should improve Q: q1=$q1 q2=$q2")
  }

  test("Q is non-decreasing across levels on the small fixtures") {
    val star = (2L to 5L).map(l => (1L, l)).toDF("src", "dst")
    for (e <- Seq(twoTriangles(), star)) {
      val q1 = GraphAnalytics.modularityScore(e,
        GraphAnalytics.modularityCommunitiesDF(e, numIter = 4))
        .collect().head.getDouble(1)
      val q2 = GraphAnalytics.modularityScore(e,
        GraphAnalytics.modularityCommunitiesMultiLevelDF(e, numIter = 4, levels = 2))
        .collect().head.getDouble(1)
      assert(q2 >= q1, s"Q decreased across levels: q1=$q1 q2=$q2")
    }
  }

  test("multi-level broadcast and shuffle plans agree") {
    val e = triangleRing(10)
    val bc = GraphAnalytics.modularityCommunitiesMultiLevelDF(e, numIter = 3, levels = 2)
      .as[(Long, Long)].collect().toSet
    val sh = GraphAnalytics.modularityCommunitiesMultiLevelDF(e, numIter = 3, levels = 2,
      broadcastState = false).as[(Long, Long)].collect().toSet
    assert(bc == sh)
  }

  test("staging hint: a hinted non-scan input lineage executes exactly once") {
    // an input whose every execution bumps an accumulator — with the
    // hint the staging checkpoint is its ONLY action; without, the gate
    // count adds a second full pass (the r12 coOccurrenceEdges class)
    val acc = spark.sparkContext.longAccumulator("lineageRuns")
    def edges() = spark.range(1).coalesce(1).mapPartitions { it =>
      acc.add(1); it.flatMap(_ => Iterator((1L, 2L), (2L, 3L), (1L, 3L)))
    }.toDF("src", "dst")
    acc.reset()
    GraphAnalytics.modularityCommunitiesDF(edges(), numIter = 2,
      stagingRowsHint = Some(6L)).collect()
    assert(acc.value == 1L, s"hinted modularity ran the lineage ${acc.value}x")
    acc.reset()
    Betweenness.pivotBetweenness(edges(), nPivots = 1, horizon = 2,
      stagingRowsHint = Some(3L)).collect()
    assert(acc.value == 1L, s"hinted betweenness ran the lineage ${acc.value}x")
  }

  test("levels = 3: each level contracts through its OWN labels (r13 ADVICE)") {
    // 13-vertex fixture found by randomized search against a driver-side
    // replay of the exact integer algebra (parity rounds, stay-on-tie,
    // smallest-community tie-break, hash parity at contracted levels,
    // contraction summing unit weights): at level 1 an anchor vertex
    // moves out of its eponymous community, so the r13 shape — which
    // contracted level 3 through the composed ORIGINAL-vid label table
    // instead of level 2's own (contracted-vid → community) labels —
    // returns a DIFFERENT partition here (it splits {4,5,7,8,10,11,12}
    // into three). `expected` is the replay's output; levels 1 and 2
    // agree between both shapes on this fixture, isolating the bug.
    val e = Seq((1L, 2L), (1L, 7L), (1L, 12L), (1L, 13L), (2L, 3L), (2L, 9L),
      (3L, 4L), (3L, 5L), (3L, 6L), (3L, 9L), (4L, 10L), (4L, 11L), (4L, 13L),
      (5L, 11L), (7L, 8L), (7L, 10L), (7L, 11L), (8L, 11L), (8L, 12L),
      (8L, 13L), (9L, 13L), (10L, 11L), (10L, 13L), (11L, 12L), (11L, 13L))
      .toDF("src", "dst")
    val expected = Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 1L, 5L -> 1L,
      6L -> 2L, 7L -> 1L, 8L -> 1L, 9L -> 2L, 10L -> 1L, 11L -> 1L,
      12L -> 1L, 13L -> 2L)
    val got = GraphAnalytics.modularityCommunitiesMultiLevelDF(e,
      numIter = 2, levels = 3).as[(Long, Long)].collect().toMap
    assert(got == expected, s"levels=3 diverged from the replay oracle: $got")
    val sh = GraphAnalytics.modularityCommunitiesMultiLevelDF(e,
      numIter = 2, levels = 3, broadcastState = false)
      .as[(Long, Long)].collect().toMap
    assert(sh == expected, s"shuffle plan diverged at levels=3: $sh")
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

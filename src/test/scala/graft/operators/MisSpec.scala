package graft.operators

import graft.SparkTestBase

class MisSpec extends SparkTestBase {
  import spark.implicits._

  private def check(edges: Seq[(Long, Long)], seed: Long = 7L): Set[Long] = {
    val out = Mis.maximalIndependentSet(edges.toDF("src", "dst"), rounds = 12, seed = seed)
      .as[(Long, Long)].collect()
    assert(!out.exists(_._1 == -1L), "did not converge in 12 rounds")
    val mis = out.map(_._1).toSet
    val und = edges.flatMap { case (a, b) => Seq((a, b), (b, a)) }.filter(e => e._1 != e._2)
    // independence: no selected pair is adjacent
    assert(!und.exists(e => mis(e._1) && mis(e._2)), "not independent")
    // maximality: every unselected vertex has a selected neighbor
    val verts = und.map(_._1).toSet
    val uncovered = (verts -- mis).filterNot(v =>
      und.exists(e => e._1 == v && mis(e._2)))
    assert(uncovered.isEmpty, s"not maximal: $uncovered")
    mis
  }

  test("independence + maximality on path, star, clique, two components") {
    check((1L until 10L).map(i => (i, i + 1)))              // path
    check((2L to 8L).map(i => (1L, i)))                     // star: either hub or all leaves
    check(for { a <- 1L to 5L; b <- 1L to 5L if a < b } yield (a, b)) // K5: exactly one
    val k5 = check(for { a <- 1L to 5L; b <- 1L to 5L if a < b } yield (a, b))
    assert(k5.size == 1)
    check(Seq((1L, 2L), (2L, 3L), (10L, 11L)))              // disconnected
  }

  test("jpColoring: proper, greedy-tight, reproducible") {
    def checkColoring(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val out = Mis.jpColoring(edges.toDF("src", "dst"), rounds = 16)
        .as[(Long, Long)].collect()
      assert(!out.exists(_._1 == -1L), "uncolored vertices left")
      val c = out.toMap
      val und = edges.filter(e => e._1 != e._2)
      assert(!und.exists(e => c(e._1) == c(e._2)), "improper coloring")
      c
    }
    // even cycle: 2 colors suffice and greedy mex can't exceed 3
    val c6 = checkColoring(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 1L)))
    assert(c6.values.max <= 2)
    // K4 needs exactly 4 colors {0,1,2,3}
    val k4 = checkColoring(for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b))
    assert(k4.values.toSet == Set(0L, 1L, 2L, 3L))
    // star: hub one color, leaves share the other
    val star = checkColoring((2L to 9L).map(i => (1L, i)))
    assert(star.values.toSet.size == 2)
    // reproducible
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
    assert(checkColoring(g) == checkColoring(g))
  }

  test("jpColoring: local-state loop ≡ legacy distributed loop, value for value") {
    def both(edges: Seq[(Long, Long)], rounds: Int, seed: Long): (Set[(Long, Long)], Set[(Long, Long)]) = {
      val local = Mis.jpColoring(edges.toDF("src", "dst"), rounds, seed)
        .as[(Long, Long)].collect().toSet
      val legacy = Mis.jpColoring(edges.toDF("src", "dst"), rounds, seed,
        localStateCap = 0L) // force the legacy loop on any graph
        .as[(Long, Long)].collect().toSet
      (local, legacy)
    }
    // ring + chords (the fixture shape), K4, star, disconnected, and an
    // UNDER-provisioned round budget so the sentinel row is compared too
    val graphs = Seq(
      (1L to 12L).map(i => (i, i % 12 + 1)) ++ Seq((1L, 7L), (3L, 9L)),
      for { a <- 1L to 4L; b <- 1L to 4L if a < b } yield (a, b),
      (2L to 9L).map(i => (1L, i)),
      Seq((1L, 2L), (2L, 3L), (10L, 11L)))
    graphs.foreach { g =>
      val (a, b) = both(g.toSeq, rounds = 16, seed = 7L)
      assert(a == b, s"diverged on $g")
      val (a1, b1) = both(g.toSeq, rounds = 1, seed = 99L)
      assert(a1 == b1, s"diverged under 1 round on $g")
    }
  }

  test("pure function of (graph, seed): reproducible, seed-sensitive") {
    val g = (for { a <- 1L to 30L; b <- 1L to 30L if a < b && (a + b) % 3 == 0 } yield (a, b)).toSeq
    val s1 = check(g, seed = 7L)
    val s2 = check(g, seed = 7L)
    assert(s1 == s2)
    // a different seed reprioritizes; on this graph the set differs
    val s3 = check(g, seed = 99L)
    assert(s1 != s3)
  }
}

package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class WlRefinementSpec extends SparkTestBase {
  import spark.implicits._

  private def colors(edges: Seq[(Long, Long)], rounds: Int): Map[Long, Long] =
    WlRefinement.wlColors(edges.toDF("src", "dst"), rounds)
      .as[(Long, Long)].collect().toMap

  test("vertex-transitive ring: one color class at every round") {
    val ring = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 1L))
    for (r <- 0 to 3)
      assert(colors(ring, r).values.toSet.size == 1, s"round $r split the ring")
  }

  test("path graph: refinement separates ends, middle, and stabilizes") {
    // a-b-c-d-e: round 0 by degree {ends}{interior}; round 1 splits the
    // interior into {b,d} (one end-neighbor) vs {c} (none)
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
    val r0 = colors(path, 0)
    assert(r0(1L) == r0(5L) && r0(2L) == r0(3L) && r0(1L) != r0(2L))
    val r1 = colors(path, 1)
    assert(r1(2L) == r1(4L) && r1(2L) != r1(3L) && r1(1L) == r1(5L) && r1(1L) != r1(2L))
    // partition is stable from round 2 on: same class sizes at round 3
    def classSizes(m: Map[Long, Long]) =
      m.groupBy(_._2).values.map(_.size).toSeq.sorted
    assert(classSizes(colors(path, 2)) == classSizes(colors(path, 3)))
  }

  test("isomorphic graphs get identical color histograms (cross-graph comparable)") {
    val g1 = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))      // triangle + tail
    val g2 = Seq((10L, 20L), (20L, 30L), (30L, 10L), (30L, 40L)) // relabeled
    val h1 = WlRefinement.wlHistogram(g1.toDF("src", "dst"), 3)
      .as[(Long, Long)].collect().toSet
    val h2 = WlRefinement.wlHistogram(g2.toDF("src", "dst"), 3)
      .as[(Long, Long)].collect().toSet
    assert(h1 == h2)
  }

  test("1-WL ceiling: two triangles vs a 6-cycle are NOT distinguished") {
    // both are 2-regular on 6 vertices — color refinement cannot separate
    // them (the known 1-WL limitation; this pins the DEFINITION)
    val twoTriangles = Seq((1L, 2L), (2L, 3L), (3L, 1L), (4L, 5L), (5L, 6L), (6L, 4L))
    val sixCycle = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 1L))
    val h1 = WlRefinement.wlHistogram(twoTriangles.toDF("src", "dst"), 4)
      .as[(Long, Long)].collect().toSet
    val h2 = WlRefinement.wlHistogram(sixCycle.toDF("src", "dst"), 4)
      .as[(Long, Long)].collect().toSet
    assert(h1 == h2)
  }
}

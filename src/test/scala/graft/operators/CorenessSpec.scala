package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class CorenessSpec extends SparkTestBase {
  import spark.implicits._

  private def run(edges: Seq[(Long, Long)], rounds: Int = 8): Map[Long, Long] =
    GraphAnalytics.coreness(edges.toDF("src", "dst"), rounds)
      .as[(Long, Long)].collect().toMap

  test("K4 with a pendant: core 3 inside, 1 on the tail") {
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L), (4L, 5L))
    val c = run(k4)
    assert(!c.contains(-1L), "unexpectedly unconverged")
    assert(c == Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L, 5L -> 1L))
  }

  test("triangle with tail and coreness-vs-kCore consistency") {
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L), (4L, 5L))
    val c = run(g)
    assert(c == Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 1L, 5L -> 1L))
    // {v : coreness >= k} must equal the k-core survivor set
    val core2 = GraphAnalytics.kCore(g.toDF("src", "dst"), k = 2)
      .select("vid").as[Long].collect().toSet
    assert(c.filter(_._2 >= 2L).keySet == core2)
  }

  test("sentinel row appears when rounds are too few on a slow chain") {
    // a 14-vertex path: degree-2 interior needs ~half the path length of
    // rounds to drain to coreness 1 from both ends
    val path = (1L until 14L).map(i => (i, i + 1))
    val under = run(path, rounds = 2)
    assert(under.contains(-1L), "expected the convergence sentinel")
    val enough = run(path, rounds = 10)
    assert(!enough.contains(-1L) && enough.filter(_._1 > 0).values.forall(_ == 1L))
  }
}

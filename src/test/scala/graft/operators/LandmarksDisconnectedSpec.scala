package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Disconnected-components coverage for the frontier BFS family: rings
  * that the landmark wavefronts can never leave. Pins (a) unreached
  * (vertex, landmark) pairs stay absent, (b) the empty-frontier
  * short-circuit stops well before a generous round budget (a fixpoint
  * round is the identity, so stopping early is exact). */
class LandmarksDisconnectedSpec extends SparkTestBase {
  import spark.implicits._

  test("disconnected rings: sparse output, horizon short-circuits") {
    // 100 vertices in rings of 8 (disconnected), like the scc fixture
    val edges = (0L until 100L).map { i =>
      val ring = i / 8; val pos = i % 8
      val next = ring * 8 + ((pos + 1) % math.min(8, 100 - ring * 8))
      (i, next)
    }.filter(e => e._1 != e._2).toDF("src", "dst")
    val d = Landmarks.landmarkDistances(edges, nLandmarks = 4, rounds = 12, seed = 11L)
      .as[(Long, Long, Long)].collect()
    // each landmark reaches exactly its own ring (8 vertices, max hop 4)
    assert(d.length == 32, s"got ${d.length} pairs")
    assert(d.forall(_._3 <= 4L))
    val byLm = d.groupBy(_._2)
    assert(byLm.size == 4 && byLm.values.forall(_.length == 8))
    byLm.foreach { case (lm, rows) =>
      assert(rows.forall(r => r._1 / 8 == lm / 8), s"wavefront escaped ring of $lm")
    }
  }
}

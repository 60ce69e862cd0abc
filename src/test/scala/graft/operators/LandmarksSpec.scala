package graft.operators

import graft.SparkTestBase

class LandmarksSpec extends SparkTestBase {
  import spark.implicits._

  test("path graph: exact hop distances from each landmark, sparse horizon") {
    // path 1-2-3-4-5; with n=1 the single landmark is the md5-min vertex
    val path = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)).toDF("src", "dst")
    val d = Landmarks.landmarkDistances(path, nLandmarks = 1, rounds = 10)
      .as[(Long, Long, Long)].collect()
    val lm = d.filter(_._3 == 0L).head._2
    // every vertex reached; distance equals |vid - lm| on a path
    val got = d.map(r => r._1 -> r._3).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L, 5L))
    assert((1L to 5L).forall(v => got(v) == math.abs(v - lm)))
    // a 1-round horizon reaches only the landmark and its neighbors
    val near = Landmarks.landmarkDistances(path, nLandmarks = 1, rounds = 1)
      .as[(Long, Long, Long)].collect()
    assert(near.length <= 3 && near.forall(_._3 <= 1L))
  }

  test("multiple landmarks: one labeled BFS carries all wavefronts") {
    val ring = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (5L, 6L), (6L, 1L)).toDF("src", "dst")
    val d = Landmarks.landmarkDistances(ring, nLandmarks = 3, rounds = 6)
      .as[(Long, Long, Long)].collect()
    val landmarks = d.filter(_._3 == 0L).map(_._2).distinct
    assert(landmarks.length == 3)
    // every (vertex, landmark) pair present with the ring distance
    assert(d.length == 6 * 3)
    def ringDist(a: Long, b: Long): Long = {
      val x = math.abs(a - b); math.min(x, 6 - x)
    }
    assert(d.forall(r => r._3 == ringDist(r._1, r._2)))
    // deterministic selection: same landmarks on a rerun
    val again = Landmarks.landmarkDistances(ring, nLandmarks = 3, rounds = 6)
      .as[(Long, Long, Long)].collect().filter(_._3 == 0L).map(_._2).distinct
    assert(again.sorted.sameElements(landmarks.sorted))
  }
}

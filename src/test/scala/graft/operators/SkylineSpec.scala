package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SkylineSpec extends SparkTestBase {
  import spark.implicits._

  private def crits(maxA: Boolean = true, maxB: Boolean = true) = Seq(
    Skyline.Criterion("a", col("a"), maxA),
    Skyline.Criterion("b", col("b"), maxB))

  test("hand-computed 2-D front, both orientations") {
    // points: (1,5) (3,3) (5,1) form the max-max front; (2,2) (1,1) dominated
    val pts = Seq((1L, 1, 5), (2L, 3, 3), (3L, 5, 1), (4L, 2, 2), (5L, 1, 1))
      .toDF("id", "a", "b")
    val front = Skyline.skyline(pts, crits()).select("id").as[Long].collect().toSet
    assert(front == Set(1L, 2L, 3L))
    // min-min flips the front to the single point (1,1)... which is
    // dominated by nothing; (1,5),(5,1) each lose on one axis to (1,1)
    val minFront = Skyline.skyline(pts, crits(maxA = false, maxB = false))
      .select("id").as[Long].collect().toSet
    assert(minFront == Set(5L))
  }

  test("grid pruning is result-invariant and duplicates survive") {
    val rnd = new scala.util.Random(3)
    val pts = (1L to 300L).map(i => (i, rnd.nextInt(50), rnd.nextInt(50))) ++
      Seq((900L, 49, 49), (901L, 49, 49)) // duplicate maximal pair
    val df = pts.toDF("id", "a", "b")
    val b1 = Skyline.skyline(df, crits(), buckets = 1).select("id").as[Long].collect().toSet
    val b16 = Skyline.skyline(df, crits(), buckets = 16).select("id").as[Long].collect().toSet
    assert(b1 == b16)
    assert(b16.contains(900L) && b16.contains(901L)) // ties both survive
    // definition check vs brute force
    val brute = pts.filterNot { p =>
      pts.exists(q => q._2 >= p._2 && q._3 >= p._3 && (q._2 > p._2 || q._3 > p._3))
    }.map(_._1).toSet
    assert(b16 == brute)
  }

  test("skylinePerKey: independent fronts per group") {
    // group g1 front = {(5,1),(1,5)}; g2's (3,3) survives because the
    // dominating (5,5) sits in ANOTHER group
    val pts = Seq(
      ("g1", 1L, 5, 1), ("g1", 2L, 1, 5), ("g1", 3L, 1, 1),
      ("g2", 4L, 3, 3), ("g1", 5L, 5, 5))
      .toDF("g", "id", "a", "b")
    val got = Skyline.skylinePerKey(pts, Seq("g"), crits())
      .select("id").as[Long].collect().toSet
    assert(got == Set(4L, 5L))
    val noKey = Skyline.skylinePerKey(pts, Nil, crits())
      .select("id").as[Long].collect().toSet
    assert(noKey == Set(5L)) // keyless: (5,5) dominates everything
  }

  test("single criterion degenerates to max (with ties)") {
    val df = Seq((1L, 3), (2L, 7), (3L, 7)).toDF("id", "a")
    val got = Skyline.skyline(df, Seq(Skyline.Criterion("a", col("a"), maximize = true)))
      .select("id").as[Long].collect().toSet
    assert(got == Set(2L, 3L))
  }
}

package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class KMeansSpec extends SparkTestBase {
  import spark.implicits._

  private def vecs(rows: (Long, Seq[Double])*) =
    rows.toDF("vec_id", "embedding")

  test("Lloyd converges to the exact integer-grid means, any init") {
    val df = vecs(1L -> Seq(1.0, 0.0), 2L -> Seq(1.2, 0.0),
      3L -> Seq(5.0, 0.0), 4L -> Seq(5.2, 0.0))
    val m = KMeans.train(df, "vec_id", "embedding", k = 2, iters = 4)
    // means: (1.0+1.2)/2 = 1.1, (5.0+5.2)/2 = 5.1 on the micro grid
    assert(m.finalCentroids.map(_.toSeq).toSet ==
      Set(Seq(1100000L, 0L), Seq(5100000L, 0L)))
    val cells = KMeans.assign(df, "vec_id", "embedding", m.finalCentroids)
      .select("vec_id", "cell").as[(Long, Int)].collect().toMap
    assert(cells(1L) == cells(2L) && cells(3L) == cells(4L) && cells(1L) != cells(3L))
  }

  test("assignment ties break to the smallest cell id") {
    val cents = Array(Array(0L), Array(2000000L))
    val cell = KMeans.assign(vecs(1L -> Seq(1.0)), "vec_id", "embedding", cents)
      .select("cell").as[Int].head()
    assert(cell == 0)
  }

  test("empty clusters keep their centroid; identical points pile on cell 0") {
    val df = vecs(1L -> Seq(3.0), 2L -> Seq(3.0), 3L -> Seq(3.0))
    val m = KMeans.train(df, "vec_id", "embedding", k = 2, iters = 3)
    assert(m.roundCentroids.forall(_.map(_.toSeq).toSeq ==
      m.roundCentroids.head.map(_.toSeq).toSeq))
    val stats = KMeans.roundStats(df, "vec_id", "embedding", m)
      .select("round", "cell", "n_points").as[(Int, Int, Long)].collect()
    assert(stats.forall { case (_, cell, n) => cell == 0 && n == 3L })
  }

  test("roundStats: per-round totals cover the corpus; inertia is monotone non-increasing") {
    val df = vecs((1L to 40L).map(i =>
      i -> Seq((i % 7).toDouble, (i % 3).toDouble, 0.5)): _*)
    val m = KMeans.train(df, "vec_id", "embedding", k = 3, iters = 4)
    val byRound = KMeans.roundStats(df, "vec_id", "embedding", m)
      .groupBy("round").agg(sum("n_points").as("n"), sum("inertia").as("j"))
      .orderBy("round").as[(Int, Long, Long)].collect().toSeq
    assert(byRound.map(_._1) == (1 to 4) && byRound.forall(_._2 == 40L))
    assert(byRound.map(_._3).sliding(2).forall(p => p.head >= p.last))
  }

  test("balancedSample: at most perCell rows per cluster, ranks contiguous") {
    val df = vecs((1L to 30L).map(i => i -> Seq((i % 2).toDouble * 4, 1.0)): _*)
    val m = KMeans.train(df, "vec_id", "embedding", k = 2, iters = 3)
    val s = KMeans.balancedSample(df, "vec_id", "embedding", m, perCell = 5)
      .as[(Int, Long, Int)].collect().toSeq
    val byCell = s.groupBy(_._1)
    assert(byCell.values.forall(g => g.size <= 5 &&
      g.map(_._3).sorted == (1 to g.size)))
    assert(s.map(_._2).distinct.size == s.size)
  }

  test("declarative assign agrees with the training pass's centroid update") {
    val df = vecs((1L to 25L).map(i =>
      i -> Seq(math.sin(i.toDouble), math.cos(i.toDouble * 2))): _*)
    val m = KMeans.train(df, "vec_id", "embedding", k = 4, iters = 2)
    // recompute round 2's update from round 1's centroids declaratively
    val assigned = KMeans.assign(df, "vec_id", "embedding", m.roundCentroids(1))
      .join(df, "vec_id")
      .select(col("cell"), transform(col("embedding"),
        x => floor(x * lit(KMeans.Scale) + 0.5).cast("long")).as("q"))
      .as[(Int, Seq[Long])].collect()
    val expect = m.roundCentroids(2)
    assigned.groupBy(_._1).foreach { case (cell, rows) =>
      val n = rows.size.toLong
      val sums = rows.map(_._2.toSeq).toSeq.transpose.map(_.sum)
      val mean = sums.map(x => Math.floorDiv(2 * x + n, 2 * n))
      assert(mean == expect(cell).toSeq, s"cell $cell")
    }
  }
}

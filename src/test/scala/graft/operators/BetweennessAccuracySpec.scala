package graft.operators

import graft.SparkTestBase
import scala.collection.mutable

/** Quantifies pivot-sampling error against EXACT Brandes — the question a
  * user sizing `nPivots` actually has. Exact betweenness is O(V·E) and
  * only feasible at fixture scale, so the reference implementation lives
  * here: plain driver-side Brandes (BFS σ + reverse δ accumulation, the
  * same directed-pair unnormalized convention the operator uses). The
  * measured curve is recorded in BASELINE.md §7; the structural claims
  * pinned here are (a) all-pivots estimates are exact up to micro-unit
  * truncation and (b) error shrinks from k=2 to k=V on a fixture with
  * strongly heterogeneous centrality (a barbell: two K6 cliques joined
  * by a 6-vertex path — path vertices mediate everything, clique
  * vertices almost nothing). */
class BetweennessAccuracySpec extends SparkTestBase {
  import spark.implicits._

  /** Exact unnormalized directed-pair Brandes (Brandes 2001) over an
    * undirected unweighted edge list. */
  private def exactBrandes(edges: Seq[(Long, Long)]): Map[Long, Double] = {
    val adj = mutable.Map.empty[Long, List[Long]].withDefaultValue(Nil)
    edges.foreach { case (a, b) =>
      if (a != b) { adj(a) = b :: adj(a); adj(b) = a :: adj(b) }
    }
    val verts = adj.keys.toSeq.sorted
    val bc = mutable.Map.empty[Long, Double].withDefaultValue(0.0)
    verts.foreach { s =>
      val sigma = mutable.Map(s -> 1.0).withDefaultValue(0.0)
      val dist = mutable.Map(s -> 0)
      val preds = mutable.Map.empty[Long, List[Long]].withDefaultValue(Nil)
      val order = mutable.ArrayBuffer(s)
      val queue = mutable.Queue(s)
      while (queue.nonEmpty) {
        val v = queue.dequeue()
        adj(v).foreach { w =>
          if (!dist.contains(w)) {
            dist(w) = dist(v) + 1; order += w; queue.enqueue(w)
          }
          if (dist(w) == dist(v) + 1) {
            sigma(w) += sigma(v); preds(w) = v :: preds(w)
          }
        }
      }
      val delta = mutable.Map.empty[Long, Double].withDefaultValue(0.0)
      order.reverseIterator.foreach { w =>
        preds(w).foreach { v =>
          delta(v) += sigma(v) / sigma(w) * (1.0 + delta(w))
        }
        if (w != s) bc(w) += delta(w)
      }
    }
    verts.map(v => v -> bc(v)).toMap
  }

  /** Two K6 cliques (1..6, 101..106) joined by the path
    * 6–50–51–52–53–54–55–101: diameter 9, centrality spanning zero
    * (clique interiors) to huge (mid-path). */
  private def barbell(): Seq[(Long, Long)] = {
    def clique(ids: Seq[Long]) =
      for { i <- ids.indices; j <- i + 1 until ids.size } yield (ids(i), ids(j))
    val left = clique(1L to 6L)
    val right = clique(101L to 106L)
    val pathIds = 6L +: (50L to 55L) :+ 101L
    val path = pathIds.zip(pathIds.tail)
    left ++ right ++ path
  }

  test("error curve vs exact Brandes: exact at k=V, shrinking from k=2") {
    val edges = barbell()
    val exact = exactBrandes(edges)
    val v = exact.size
    val e = edges.toDF("src", "dst")
    val meanExact = exact.values.sum / v
    val curve = Seq(2, 4, 8, 16, v).map { k =>
      val est = Betweenness.pivotBetweenness(e, nPivots = k, horizon = 16)
        .as[(Long, Double)].collect().toMap
      val scale = v.toDouble / math.min(k, v)
      val relMae = exact.map { case (vid, ex) =>
        math.abs(est.getOrElse(vid, 0.0) * scale - ex)
      }.sum / v / meanExact
      (k, relMae)
    }
    curve.foreach { case (k, err) => info(f"nPivots=$k%2d  relMAE=$err%.4f") }
    // (a) all pivots ⇒ exact, modulo the micro-unit integral division
    assert(curve.last._2 < 1e-3, s"all-pivots run not exact: ${curve.last}")
    // (b) sampling error shrinks with k on the heterogeneous fixture
    assert(curve.head._2 > curve.last._2)
    val e16 = curve.find(_._1 == 16).get._2
    assert(e16 <= curve.head._2,
      s"k=16 should not be worse than k=2: $curve")
  }

  test("uniform-centrality ring: the estimator is unbiased under symmetry") {
    // cycle of 20 — exact BC is uniform; with all pivots the estimate is
    // exactly uniform too, and the exact value matches Brandes
    val n = 20
    val ring = (0 until n).map(i => (i.toLong, ((i + 1) % n).toLong))
    val exact = exactBrandes(ring)
    assert(exact.values.toSet.size == 1, "ring BC must be uniform")
    val est = Betweenness.pivotBetweenness(ring.toDF("src", "dst"),
      nPivots = n, horizon = n).as[(Long, Double)].collect().toMap
    val diffs = exact.map { case (k, ex) => math.abs(est(k) - ex) }
    assert(diffs.max < 1e-3, s"all-pivots ring estimate off: max=${diffs.max}")
  }
}

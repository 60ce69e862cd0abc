package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class PcaSpec extends SparkTestBase {
  import spark.implicits._

  /** Deterministic anisotropic 4-d cloud: dominant direction (1,1,0,0)/√2,
    * weaker (0,0,1,−1)/√2, tiny noise on the rest — eigenstructure is
    * known by construction. */
  private def cloud(n: Int): Seq[(Long, Seq[Double])] =
    (0 until n).map { i =>
      val t = math.sin(i * 1.7) * 4.0      // dominant coordinate
      val u = math.cos(i * 2.3) * 1.5      // secondary coordinate
      val e1 = math.sin(i * 5.1) * 0.01
      val e2 = math.cos(i * 7.7) * 0.01
      (i.toLong, Seq(t + e1, t - e1, u + e2, -u + e2))
    }

  private lazy val df = cloud(400).toDF("id", "vec")
  private lazy val model = Pca.train(df, "vec", k = 4)

  test("components are orthonormal") {
    for (a <- 0 until model.k; b <- a until model.k) {
      val d = model.components(a).zip(model.components(b)).map { case (x, y) => x * y }.sum
      val expect = if (a == b) 1.0 else 0.0
      assert(math.abs(d - expect) < 1e-9, s"<c$a, c$b> = $d")
    }
  }

  test("eigen equation holds against an independently computed covariance") {
    // plain-Scala covariance on the SAME micro grid the operator uses
    val rows = cloud(400).map(_._2.map(x => math.floor(x * 1e6 + 0.5) / 1e6).toArray)
    val n = rows.length
    val dim = 4
    val mean = Array.tabulate(dim)(j => rows.map(_(j)).sum / n)
    val cov = Array.tabulate(dim, dim) { (i, j) =>
      rows.map(r => (r(i) - mean(i)) * (r(j) - mean(j))).sum / n
    }
    (0 until model.k).foreach { c =>
      val v = model.components(c)
      val lam = model.eigenvalues(c)
      (0 until dim).foreach { i =>
        val av = (0 until dim).map(j => cov(i)(j) * v(j)).sum
        assert(math.abs(av - lam * v(i)) < 1e-6,
          s"(Cv)[$i]=$av vs λv=${lam * v(i)} for component $c")
      }
    }
  }

  test("dominant direction and eigenvalue ordering match construction") {
    assert(model.eigenvalues(0) > model.eigenvalues(1))
    assert(model.eigenvalues(1) > model.eigenvalues(2))
    val c0 = model.components(0)
    // (1,1,0,0)/√2 up to sign — sign canonicalization makes it positive
    assert(math.abs(math.abs(c0(0)) - math.sqrt(0.5)) < 1e-3, c0.mkString(","))
    assert(math.abs(c0(0) - c0(1)) < 1e-3)
    assert(math.abs(c0(2)) < 0.05 && math.abs(c0(3)) < 0.05)
    val c1 = model.components(1)
    assert(math.abs(c1(2) + c1(3)) < 1e-3, c1.mkString(","))
  }

  test("training is layout-independent (exact integer partials)") {
    val m2 = Pca.train(df.repartition(7), "vec", k = 4)
    assert(m2.n == model.n)
    (0 until 4).foreach { j =>
      assert(m2.eigenvalues(j) == model.eigenvalues(j), s"eigenvalue $j drifted")
      assert(m2.components(j).sameElements(model.components(j)), s"component $j drifted")
      assert(m2.meanDotPico(j) == model.meanDotPico(j))
    }
  }

  test("projection is centered and its variance matches the eigenvalues") {
    val varRows = Pca.componentVariance(df, "id", "vec", model)
      .orderBy("component").collect()
    assert(varRows.map(_.getInt(0)).toSeq == Seq(0, 1, 2, 3))
    val n = varRows.head.getLong(1)
    assert(n == 400)
    val ss = varRows.map(r => BigDecimal(r.getDecimal(2)).toDouble)
    // non-increasing, and ss/(n·pico²) ≈ eigenvalue (biased /n covariance)
    assert(ss(0) > ss(1) && ss(1) > ss(2) && ss(2) >= ss(3))
    (0 until 4).foreach { j =>
      val est = ss(j) / n / 1e24
      assert(math.abs(est - model.eigenvalues(j)) < 1e-6 + 0.01 * model.eigenvalues(j),
        s"component $j: projected var $est vs eigenvalue ${model.eigenvalues(j)}")
    }
    // centering: the model mean lives on the MICRO grid, so each row's
    // centered projection can carry up to dim · 0.5 micro-units
    // (= dim · 5·10⁵ pico) of mean-quantization bias plus dim per-term
    // floor units — bound Σ pc by n times that
    val sums = Pca.project(df, "id", "vec", model)
      .agg(sum("pc0"), sum("pc1"), sum("pc2"), sum("pc3")).head()
    val dim = 4
    val bound = 400L * dim * 500001L
    (0 until 4).foreach { j =>
      assert(math.abs(sums.getLong(j)) <= bound,
        s"pc$j sum ${sums.getLong(j)} not centered (bound $bound)")
    }
  }

  test("projection values replay the per-term floor arithmetic") {
    val got = Pca.project(df, "id", "vec", model)
      .where($"id" === 7L).head()
    val v = cloud(400)(7)._2
    (0 until 4).foreach { j =>
      val w = model.picoWeights(j)
      val expect = v.indices.map(i => math.floor(v(i) * w(i) + 0.5).toLong).sum -
        model.meanDotPico(j)
      assert(got.getLong(1 + j) == expect, s"pc$j")
    }
  }

  test("short vectors zero-pad and empty corpus is rejected") {
    intercept[IllegalArgumentException] {
      Pca.train(Seq.empty[(Long, Seq[Double])].toDF("id", "vec"), "vec", k = 2)
    }
    // a row shorter than dim contributes zeros beyond its length
    val mixed = (Seq((0L, Seq(1.0, 2.0, 3.0, 4.0)), (1L, Seq(1.0, 2.0))) ++
      cloud(50).map { case (i, v) => (i + 2, v) }).toDF("id", "vec")
    val m = Pca.train(mixed, "vec", k = 2)
    assert(m.n == 52)
    val p = Pca.project(mixed, "id", "vec", m).where($"id" === 1L).head()
    val w = m.picoWeights(0)
    val expect = Seq(1.0, 2.0).zipWithIndex
      .map { case (x, i) => math.floor(x * w(i) + 0.5).toLong }.sum - m.meanDotPico(0)
    assert(p.getLong(1) == expect)
  }
}

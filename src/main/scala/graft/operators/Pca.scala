package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact distributed PCA over an embedding column — the dimensionality-
  * reduction primitive of an embedding pipeline (whiten/compress before
  * ANN indexing, dataset drift inspection, JL's data-aware sibling; cf.
  * [[Similarity.randomProjection]], which is the data-OBLIVIOUS fallback
  * when a training pass is not affordable).
  *
  * == Scale shape ==
  * Training is ONE corpus pass with ZERO shuffles: each task folds its
  * rows into a fixed-size (n, Σq, Σqqᵀ upper triangle) integer block —
  * d(d+1)/2 + d longs ≈ 17 KB at d = 64 — and the driver merges P blocks
  * (the [[KMeans.train]] / treeAggregate shape; nothing corpus-sized
  * moves). The d×d eigenproblem is driver-side cyclic Jacobi — microseconds
  * at embedding dims, and d² is CONSTANT in corpus size, so the split
  * distributed-moments/local-solve is exactly how a 100 TB run does it.
  * Projection is embarrassingly parallel codegen column math
  * ([[graft.functions.VecDotFixedPoint]] against component literals).
  *
  * == Determinism / oracle replayability ==
  * The moment pass quantizes per element to the micro grid
  * (floor(x·10⁶ + 0.5) — per-element, so no float-sum association to
  * disagree on) and accumulates EXACT integers; per-task Long blocks
  * flush to BigInt past a row budget, so no partition size overflows.
  * The scatter matrix n·G − S·Sᵀ is therefore a pure function of corpus
  * CONTENT — layout/partitioning cannot perturb the trained model (the
  * property [[Similarity.trainIvf]] gets from content-hash sampling,
  * here for free from exactness). Jacobi runs a fixed cyclic sweep order
  * on the driver; eigenpairs sort by (eigenvalue desc, index asc) and
  * each component's sign is canonicalized (largest-|weight| element
  * positive). Projections use the pico-grid fixed-point dot
  * ([[graft.functions.VecDotFixedPoint]] — a plain float dot is NOT
  * engine-portable, see that scaladoc's measured DuckDB divergences), so
  * every projected coordinate is an exact BIGINT both engines reproduce
  * bit-for-bit from the same component literals.
  *
  * Reference scope: the reference (neo4j_export.py) has no vector ops at
  * all; this extends the mandated similarity-search family (SURVEY §2.7).
  */
object Pca {

  /** Micro quantization grid for the moment pass (matches [[KMeans.Scale]]). */
  val Scale: Double = 1e6

  /** Pico grid for projection weights (matches [[Similarity]]'s PQ/ADC). */
  val Pico: Double = 1e12

  /** Rows a task folds into one Long block before flushing it to the
    * BigInt side: q ≤ 10⁶·|x|, so a product term is ≤ 10¹²·|x|² and
    * 4M rows stay 2000× under 2⁶³ for |x| ≤ 1 (and 20× for |x| ≤ 10). */
  private val FlushRows = 4000000

  /** `components(j)` is the j-th principal axis (unit, sign-canonical);
    * `eigenvalues(j)` its variance in original units²; `mean` the corpus
    * mean on the micro grid (exact rational S/(n·10⁶), one IEEE division
    * per element). */
  final case class PcaModel(n: Long, mean: Array[Double],
      components: Array[Array[Double]], eigenvalues: Array[Double]) {
    def dim: Int = mean.length
    def k: Int = components.length
    /** Pico-scaled weights of component j — the literal array the
      * fixed-point projection dot consumes (pre-scaled driver-side so
      * neither engine folds a 3-operand multiply chain). */
    def picoWeights(j: Int): Array[Double] = components(j).map(_ * Pico)
    /** The mean's projection on the same per-term floor grid — the exact
      * integer the centered projection subtracts. */
    def meanDotPico(j: Int): Long = {
      val w = picoWeights(j)
      var s = 0L; var i = 0
      while (i < dim) { s += math.floor(mean(i) * w(i) + 0.5).toLong; i += 1 }
      s
    }
  }

  /** Exact corpus moments on the micro grid: n, S = Σq, G = Σqqᵀ (upper
    * triangle, row-major). MERGEABLE by plain elementwise addition — the
    * property the streaming twin ([[graft.streaming.StreamingPca]]) and
    * any partitioned/backfilled training run is built on: moments of a
    * union are the sums of the moments, exactly, so incremental
    * maintenance is lossless (unlike incremental SVD's approximations). */
  final case class Moments(n: BigInt, s: Array[BigInt], g: Array[BigInt]) {
    def dim: Int = s.length
    def merge(o: Moments): Moments = {
      require(o.dim == dim, s"dim mismatch: $dim vs ${o.dim}")
      Moments(n + o.n,
        Array.tabulate(s.length)(i => s(i) + o.s(i)),
        Array.tabulate(g.length)(i => g(i) + o.g(i)))
    }
  }

  /** Train a k-component model on the full corpus: one zero-shuffle
    * distributed moment pass + a driver-side Jacobi eigensolve. */
  def train(corpus: DataFrame, vecCol: String, k: Int,
      scale: Double = Scale, maxSweeps: Int = 64): PcaModel =
    modelFromMoments(moments(corpus, vecCol, scale), k, scale, maxSweeps)

  /** The distributed moment pass (see class doc: one fixed-size integer
    * block per flush segment per task, BigInt merge on the driver). */
  def moments(corpus: DataFrame, vecCol: String,
      scale: Double = Scale): Moments = {
    val base = corpus
      .select(col(vecCol).cast("array<double>").as("__v"))
      .where(col("__v").isNotNull)
    val firstRow = base.limit(1).collect()
    require(firstRow.nonEmpty, "cannot train PCA on an empty corpus")
    val dim = firstRow.head.getSeq[Double](0).length
    val tri = dim * (dim + 1) / 2

    // one (n, S, G) integer block per flush segment per task; rows shorter
    // than dim zero-pad (the KMeans convention), longer ones truncate
    val partials = base.rdd.mapPartitions { rows =>
      val segs = scala.collection.mutable.ArrayBuffer
        .empty[(Long, Array[Long], Array[Long])]
      var n = 0L
      var s = new Array[Long](dim)
      var g = new Array[Long](tri)
      def flush(): Unit = {
        if (n > 0) segs += ((n, s, g))
        n = 0L; s = new Array[Long](dim); g = new Array[Long](tri)
      }
      val q = new Array[Long](dim)
      rows.foreach { row =>
        val v = row.getSeq[Double](0)
        val m = math.min(v.length, dim)
        var i = 0
        while (i < m) { q(i) = math.floor(v(i) * scale + 0.5).toLong; i += 1 }
        while (i < dim) { q(i) = 0L; i += 1 }
        n += 1
        var t = 0
        i = 0
        while (i < dim) {
          s(i) += q(i)
          val qi = q(i)
          var j = i
          while (j < dim) { g(t) += qi * q(j); j += 1; t += 1 }
          i += 1
        }
        if (n >= FlushRows) flush()
      }
      flush()
      segs.iterator
    }.collect()

    // merge segments exactly (BigInt: no driver-side overflow either)
    var nTot = BigInt(0)
    val sTot = Array.fill(dim)(BigInt(0))
    val gTot = Array.fill(tri)(BigInt(0))
    partials.foreach { case (pn, ps, pg) =>
      nTot += pn
      var i = 0
      while (i < dim) { sTot(i) += ps(i); i += 1 }
      i = 0
      while (i < tri) { gTot(i) += pg(i); i += 1 }
    }
    Moments(nTot, sTot, gTot)
  }

  /** Deterministic driver-side solve from exact moments — identical
    * moments give the identical model, however they were accumulated. */
  def modelFromMoments(m: Moments, k: Int, scale: Double = Scale,
      maxSweeps: Int = 64): PcaModel = {
    val dim = m.dim
    require(k >= 1 && k <= dim, s"k=$k must be in [1, $dim]")
    val nTot = m.n
    val sTot = m.s
    val gTot = m.g
    val n = nTot.toLong
    require(n > 1, s"PCA needs at least 2 rows, got $n")

    // covariance = (n·G − S·Sᵀ) / (n²·scale²), exact integers until the
    // single BigInt→double conversion per cell
    val denom = (nTot * nTot).doubleValue * scale * scale
    val cov = Array.ofDim[Double](dim, dim)
    var t = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val sc = nTot * gTot(t) - sTot(i) * sTot(j)
        val c = sc.doubleValue / denom
        cov(i)(j) = c; cov(j)(i) = c
        j += 1; t += 1
      }
      i += 1
    }
    val mean = Array.tabulate(dim)(i => sTot(i).doubleValue / (n.toDouble * scale))

    val (eigVals, eigVecs) = jacobiEigen(cov, maxSweeps)
    // order by (eigenvalue desc, original index asc); canonical sign
    val order = eigVals.indices.sortBy(i => (-eigVals(i), i)).take(k)
    val comps = order.map { c =>
      val v = Array.tabulate(dim)(r => eigVecs(r)(c))
      var best = 0
      var i2 = 1
      while (i2 < dim) { if (math.abs(v(i2)) > math.abs(v(best))) best = i2; i2 += 1 }
      if (v(best) < 0) v.map(x => -x) else v
    }.toArray
    PcaModel(n, mean, comps, order.map(eigVals).toArray)
  }

  /** Cyclic Jacobi for a symmetric matrix: returns (diag eigenvalues,
    * eigenvector COLUMNS). Fixed p<q row-major rotation order, exits when
    * a full sweep finds only zero off-diagonals — a pure function of the
    * input doubles. */
  private[graft] def jacobiEigen(a0: Array[Array[Double]],
      maxSweeps: Int): (Array[Double], Array[Array[Double]]) = {
    val nn = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(nn, nn)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    var rotated = true
    while (sweep < maxSweeps && rotated) {
      rotated = false
      var p = 0
      while (p < nn - 1) {
        var q = p + 1
        while (q < nn) {
          val apq = a(p)(q)
          // skip rotations that cannot move the result: |a_pq| already
          // below the relative noise floor of its diagonal pair
          if (math.abs(apq) > 1e-300 &&
              math.abs(apq) > 1e-15 * (math.abs(a(p)(p)) + math.abs(a(q)(q)))) {
            rotated = true
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val tt =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else -1.0 / (-theta + math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(tt * tt + 1.0)
            val s = tt * c
            var i = 0
            while (i < nn) {
              if (i != p && i != q) {
                val aip = a(i)(p); val aiq = a(i)(q)
                a(i)(p) = c * aip - s * aiq; a(p)(i) = a(i)(p)
                a(i)(q) = s * aip + c * aiq; a(q)(i) = a(i)(q)
              }
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = c * vip - s * viq
              v(i)(q) = s * vip + c * viq
              i += 1
            }
            val app = a(p)(p); val aqq = a(q)(q)
            a(p)(p) = c * c * app - 2.0 * s * c * apq + s * s * aqq
            a(q)(q) = s * s * app + 2.0 * s * c * apq + c * c * aqq
            a(p)(q) = 0.0; a(q)(p) = 0.0
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    (Array.tabulate(nn)(i => a(i)(i)), v)
  }

  /** Mean-centered projection onto the model's components: one exact
    * pico-grid BIGINT per (row, component) — `pc_j = Σᵢ floor(xᵢ·wᵢⱼ+½)
    * − meanDotPico(j)`, pure codegen column math against literals. */
  def project(df: DataFrame, idCol: String, vecCol: String,
      model: PcaModel): DataFrame = {
    val vec = col(vecCol).cast("array<double>")
    val pcs = (0 until model.k).map { j =>
      (VectorFunctions.vec_dot_fixed_point(vec, typedLit(model.picoWeights(j).toSeq))
        - lit(model.meanDotPico(j))).as(s"pc$j")
    }
    df.select(col(idCol) +: pcs: _*)
  }

  /** Distributed diagonalization audit: per component, n and the exact
    * integer sum of squared pico projections (DECIMAL(38,0) — pico² sums
    * hold 10¹² rows of unit-normalized data under the 10³⁸ ceiling).
    * Downstream: ss/(n−1)/10²⁴ ≈ the component's eigenvalue, and the
    * sequence is non-increasing — checked by spec; the oracle re-derives
    * every value from the component literals. */
  def componentVariance(df: DataFrame, idCol: String, vecCol: String,
      model: PcaModel): DataFrame = {
    val proj = project(df, idCol, vecCol, model)
    val sums = (0 until model.k).map { j =>
      sum(col(s"pc$j").cast("decimal(38,0)") * col(s"pc$j").cast("decimal(38,0)"))
        .as(s"ss$j")
    }
    val one = proj.agg(count(lit(1)).as("n"), sums: _*)
    val rows = (0 until model.k).map { j =>
      struct(lit(j).as("component"), col("n"), col(s"ss$j").as("ss_pico2"))
    }
    one.select(explode(array(rows: _*)).as("r"))
      .select(col("r.component").as("component"), col("r.n").as("n"),
        col("r.ss_pico2").as("ss_pico2"))
  }
}

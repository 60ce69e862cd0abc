package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed k-means (Lloyd) over an embedding column, exact on the
  * integer grid — the clustering primitive behind cluster-balanced data
  * curation (sample evenly across semantic clusters instead of letting
  * the head domains dominate; cf. SemDeDup's cluster-then-prune,
  * Similarity.scala:536, which this generalizes to an explicit model).
  *
  * Differs from [[Similarity.trainIvf]] on purpose: IVF trains a coarse
  * partitioner on a bounded DRIVER sample (cells only need to split
  * space); this trains on the FULL corpus distributed — the shape you
  * need when the clustering itself is the product.
  *
  * == Scale shape ==
  * Per Lloyd round: ZERO shuffles. Assignment and partial aggregation
  * fuse into one `mapPartitions` pass — each task walks its rows once,
  * quantizes, finds the nearest centroid (tight integer loops), and emits
  * a single (k × dim) partial-sum block; the driver merges P blocks
  * (k·dim·P longs ≈ KBs — the `treeAggregate` shape without needing the
  * tree). Nothing corpus-sized ever moves. The assignment QUERIES
  * ([[assign]], [[roundStats]]) are declarative codegen expressions
  * ([[graft.functions.VecQuantL2]]) so downstream consumers stay inside
  * whole-stage codegen.
  *
  * == Determinism / oracle replayability ==
  * All distance math is exact integers: vectors quantize per element to
  * the micro grid (floor(x·10⁶ + 0.5) — per-element, so no float-sum
  * association to disagree on), d² sums are Longs (order-independent),
  * ties break to the smallest cell id, and the centroid update is exact
  * integer half-up division (floorDiv(2·Σq + n, 2n)). Initialization is
  * content-keyed (k smallest (md5('km:'||id), id)) — layout-independent
  * and replayable in DuckDB SQL, like every other md5-keyed sample in
  * this codebase. A DuckDB oracle re-derives every round's assignment,
  * cluster sizes and inertia from the round's centroid literals. */
object KMeans {

  /** Micro quantization grid. Overflow headroom: per-cluster component
    * sums are n·|x|·10⁶ ≤ 2⁶³ for n·|x| ≤ 9·10¹² — a 10¹²-row cluster of
    * unit-normalized embeddings still fits with 9× slack. */
  val Scale: Double = 1e6

  /** `roundCentroids(0)` = the content-keyed init; `roundCentroids(r)` =
    * centroids AFTER Lloyd round r (quantized longs). Round r's
    * assignment uses `roundCentroids(r-1)`. */
  final case class KMeansModel(roundCentroids: Seq[Array[Array[Long]]]) {
    def finalCentroids: Array[Array[Long]] = roundCentroids.last
    def iters: Int = roundCentroids.length - 1
    def dim: Int = roundCentroids.head.head.length
  }

  private def quantizeDriver(v: Seq[Double], scale: Double): Array[Long] =
    v.map(x => math.floor(x * scale + 0.5).toLong).toArray

  /** Train `iters` Lloyd rounds with `k` clusters on the full corpus. */
  def train(corpus: DataFrame, idCol: String, vecCol: String, k: Int,
      iters: Int, scale: Double = Scale): KMeansModel = {
    require(k > 0 && iters >= 0, s"k=$k, iters=$iters must be positive")
    val base = corpus
      .select(col(idCol).cast("long").as("__id"),
        col(vecCol).cast("array<double>").as("__v"))
      .where(col("__v").isNotNull)

    // content-keyed deterministic init (TakeOrderedAndProject, not a sort)
    val initRows = base
      .orderBy(md5(concat(lit("km:"), col("__id").cast("string")).cast("binary")).asc,
        col("__id").asc)
      .limit(k).select("__v").collect()
    require(initRows.nonEmpty, "cannot train k-means on an empty corpus")
    var cents: Array[Array[Long]] =
      initRows.map(r => quantizeDriver(r.getSeq[Double](0), scale))
    val dim = cents.head.length
    val rounds = scala.collection.mutable.ArrayBuffer(cents.map(_.clone()))

    var it = 0
    while (it < iters) {
      val localCents = cents
      val partials = base.select(col("__v")).rdd.mapPartitions { rows =>
        val kk = localCents.length
        val sums = Array.fill(kk)(new Array[Long](dim))
        val counts = new Array[Long](kk)
        rows.foreach { row =>
          val v = row.getSeq[Double](0)
          val n = math.min(v.length, dim)
          val q = new Array[Long](dim)
          var i = 0
          while (i < n) { q(i) = math.floor(v(i) * scale + 0.5).toLong; i += 1 }
          var best = 0; var bestD = Long.MaxValue; var c = 0
          while (c < kk) {
            val cc = localCents(c)
            var s = 0L; var j = 0
            while (j < dim) { val d = q(j) - cc(j); s += d * d; j += 1 }
            if (s < bestD) { bestD = s; best = c } // strict < : ties → smallest c
            c += 1
          }
          counts(best) += 1
          val sb = sums(best)
          var j = 0
          while (j < dim) { sb(j) += q(j); j += 1 }
        }
        Iterator.single((sums, counts))
      }.collect()

      val sums = Array.fill(cents.length)(new Array[Long](dim))
      val counts = new Array[Long](cents.length)
      partials.foreach { case (ps, pc) =>
        var c = 0
        while (c < cents.length) {
          counts(c) += pc(c)
          val s = sums(c); val p = ps(c)
          var j = 0
          while (j < dim) { s(j) += p(j); j += 1 }
          c += 1
        }
      }
      cents = cents.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0L) old // empty cluster keeps its centroid
        else sums(c).map(x => Math.floorDiv(2 * x + counts(c), 2 * counts(c)))
      }
      rounds += cents.map(_.clone())
      it += 1
    }
    KMeansModel(rounds.toSeq)
  }

  /** Min-(d², cell) struct over the given centroids — one codegen
    * VecQuantL2 per centroid, argmin with smallest-cell tie-break via
    * struct ordering. */
  private def bestCell(vec: Column, cents: Array[Array[Long]],
      scale: Double): Column =
    array_min(array(cents.zipWithIndex.map { case (cc, i) =>
      struct(
        VectorFunctions.vec_quant_l2(vec, typedLit(cc.toSeq), scale).as("d"),
        lit(i).as("c"))
    }.toSeq: _*))

  /** Assignment under a centroid set: (id, cell, d2). */
  def assign(df: DataFrame, idCol: String, vecCol: String,
      cents: Array[Array[Long]], scale: Double = Scale): DataFrame = {
    val best = bestCell(col(vecCol).cast("array<double>"), cents, scale)
    df.select(col(idCol), best.as("__b"))
      .select(col(idCol), col("__b.c").as("cell"), col("__b.d").as("d2"))
  }

  /** Per-round training audit: (round 1.., cell, n_points, inertia) where
    * round r replays its assignment against roundCentroids(r-1). The
    * oracle-checkable face of training. */
  def roundStats(df: DataFrame, idCol: String, vecCol: String,
      model: KMeansModel, scale: Double = Scale): DataFrame =
    (1 to model.iters).map { r =>
      assign(df, idCol, vecCol, model.roundCentroids(r - 1), scale)
        .groupBy(col("cell"))
        .agg(count(lit(1)).as("n_points"), sum(col("d2")).as("inertia"))
        .select(lit(r).as("round"), col("cell"), col("n_points"), col("inertia"))
    }.reduce(_ unionAll _)

  /** Cluster-balanced sample: `perCell` rows per final cluster, keyed by
    * (md5('ks:'||id), id) — the curation move that keeps tail clusters
    * represented. One exchange (hash by cell), one window over it. */
  def balancedSample(df: DataFrame, idCol: String, vecCol: String,
      model: KMeansModel, perCell: Int, scale: Double = Scale): DataFrame = {
    val a = assign(df, idCol, vecCol, model.finalCentroids, scale)
    val w = Window.partitionBy(col("cell"))
      .orderBy(md5(concat(lit("ks:"), col(idCol).cast("string")).cast("binary")).asc,
        col(idCol).asc)
    a.select(col("cell"), col(idCol), row_number().over(w).as("rank"))
      .where(col("rank") <= perCell)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (SURVEY §2.7).
  *
  * Vector math is plain `zip_with`/`aggregate` column algebra (codegen'd,
  * no UDFs). Two paths:
  *   - brute-force cosine top-k: exact, O(|queries| × |corpus|) — the
  *     baseline, fine when the query side is broadcastable;
  *   - random-hyperplane LSH: corpus bucketed by sign-bit signature;
  *     queries probe their bucket (plus optional multi-table union) and
  *     rerank exactly within candidates — the 100 TB path, where the
  *     crossJoin is replaced by an equi-join on bucket keys.
  */
object Similarity {

  /** Element-wise dot product of two float/double array columns, computed
    * in double — a native codegen'd expression (graft.functions.VecDot);
    * the equivalent `aggregate(zip_with(...))` runs an interpreted lambda
    * per element, ~100x slower in the ANN rerank hot path. */
  def dot(a: Column, b: Column): Column = graft.functions.VectorFunctions.vec_dot(a, b)

  def l2Norm(a: Column): Column = graft.functions.VectorFunctions.vec_norm(a)

  /** Cosine similarity with zero-vector guard. */
  def cosine(a: Column, b: Column): Column = {
    val d = dot(a, b)
    val n = l2Norm(a) * l2Norm(b)
    when(n === 0.0, lit(0.0)).otherwise(d / n)
  }

  /** Exact cosine top-k: for each query vector, the k nearest corpus
    * vectors (self-match excluded). The query side is broadcast — use only
    * when |queries| is small; otherwise use [[lshTopK]]. */
  def bruteForceTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    // Norms are computed ONCE per row on each side before the join —
    // higher-order array functions are interpreted (not codegen'd), so
    // per-pair work must be a single dot product, nothing more.
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      l2Norm(col(vecCol)).as("q_norm"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
      l2Norm(col(vecCol)).as("c_norm"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_sim").desc, col("neighbor_id"))
    c.crossJoin(broadcast(q))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine_sim",
        when(col("q_norm") * col("c_norm") === 0.0, lit(0.0))
          .otherwise(dot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm"))))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine_sim"), col("rank").cast("long").as("rank"))
  }

  /** Deterministic random hyperplanes: `numBits` planes in `dim`
    * dimensions, Gaussian entries from a fixed seed. Exposed within graft
    * so the DuckDB oracles can embed the SAME planes as SQL literals
    * (Double.toString round-trips exactly through DuckDB's parser). */
  private[graft] def hyperplanes(dim: Int, numBits: Int, seed: Long): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** [[hyperplanes]] with entries snapped to float precision: float24 ×
    * float24 products are exact in double, so the only rounding in the
    * quantized dot is the grid snap itself. */
  private[graft] def rpPlanes(dim: Int, outDim: Int, seed: Long): Seq[Array[Double]] =
    hyperplanes(dim, outDim, seed).map(_.map(x => x.toFloat.toDouble))

  /** Sign-bit LSH signature of a vector column: bit i = sign(v · plane_i),
    * packed into a long bucket key. Pure column expressions. */
  def lshBucket(vec: Column, dim: Int, numBits: Int, seed: Long = 7L): Column = {
    val planes = hyperplanes(dim, numBits, seed)
    planes.zipWithIndex.map { case (plane, i) =>
      val planeCol = array(plane.toSeq.map(lit): _*)
      when(dot(vec, planeCol) > 0.0, shiftleft(lit(1L), i)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
  }

  /** Approximate cosine top-k: `numTables` independent LSH tables; each
    * query meets only corpus vectors sharing a bucket in at least one
    * table, then candidates are exactly reranked. Equi-join on
    * (table, bucket) — shuffles key+vector, never the cross product. */
  def lshTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, dim: Int, numBits: Int = 12, numTables: Int = 4): DataFrame = {
    def withBuckets(df: DataFrame, idName: String, vecName: String, normName: String) = {
      val t = df.select(col(idCol).as(idName), col(vecCol).as(vecName),
        l2Norm(col(vecCol)).as(normName))
      t.select(col(idName), col(vecName), col(normName),
        explode(array((0 until numTables).map(i =>
          struct(lit(i).as("tbl"), lshBucket(col(vecName), dim, numBits, seed = 7L + i).as("bucket"))): _*)).as("tb"))
        .select(col(idName), col(vecName), col(normName), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    }
    val q = withBuckets(queries, "query_id", "q_vec", "q_norm")
    val c = withBuckets(corpus, "neighbor_id", "c_vec", "c_norm")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_sim").desc, col("neighbor_id"))
    q.join(c, Seq("tbl", "bucket"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("q_vec"), col("q_norm"),
        col("neighbor_id"), col("c_vec"), col("c_norm"))
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cosine_sim",
        when(col("q_norm") * col("c_norm") === 0.0, lit(0.0))
          .otherwise(dot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm"))))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine_sim"), col("rank").cast("long").as("rank"))
  }

  /** IVF coarse-quantizer model: `nCells` centroids. At corpus scale this
    * is trained ONCE, offline, on a bounded sample, and the centroids are
    * persisted — queries only do column math against centroid literals
    * (FAISS trains its IVF quantizers on in-memory samples the same way).
    * Keep nCells modest (≤ a few hundred): cell assignment is O(nCells·dim)
    * codegen'd expressions per row; a 65k-cell index needs a join-based
    * assignment instead. */
  final case class IvfModel(centroids: Array[Array[Double]])

  /** Train the coarse quantizer on ≤ `sampleRows` vectors collected to the
    * driver (bounded by contract: 100k × 64 dims ≈ 50 MB), with k-means++
    * seeding and `iters` Lloyd iterations — deterministic for a given seed
    * and sample. The full corpus is never scanned for training; cells only
    * need to partition space, not converge tightly. */
  def trainIvf(
      corpus: DataFrame, vecCol: String, nCells: Int,
      seed: Long = 42L, sampleRows: Int = 100000, iters: Int = 10): IvfModel = {
    // Deterministic, layout-independent sample: a bare limit() returns
    // whichever partitions answer first, so the trained centroids would
    // depend on file layout/parallelism. Ordering by a content hash of the
    // vector (xxhash64 hashes array columns element-wise natively) makes
    // the sample a pure function of corpus CONTENT, and Spark plans
    // orderBy+limit as TakeOrderedAndProject — a top-k per partition +
    // merge, not a full sort.
    val sample: Array[Array[Double]] = corpus
      .select(col(vecCol).cast("array<double>").as("__v"))
      .orderBy(xxhash64(col("__v")).asc)
      .limit(sampleRows)
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "cannot train IVF quantizer on an empty corpus")
    IvfModel(kMeans(sample, nCells, seed, iters))
  }

  /** k-means++ seeding + `iters` Lloyd iterations — deterministic for a
    * given (sample, seed). Shared by the IVF coarse quantizer and the PQ
    * per-subspace codebooks (byte-identical to trainIvf's original
    * inline body, so trained IVF centroids are unchanged). */
  private def kMeans(sample: Array[Array[Double]], nCells: Int,
      seed: Long, iters: Int): Array[Array[Double]] = {
    val dim = sample.head.length
    val rnd = new scala.util.Random(seed)
    val k = math.min(nCells, sample.length)

    def d2(a: Array[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    // k-means++ init
    val centers = scala.collection.mutable.ArrayBuffer(sample(rnd.nextInt(sample.length)))
    while (centers.length < k) {
      val dists = sample.map(v => centers.map(c => d2(v, c)).min)
      val total = dists.sum
      if (total == 0.0) centers += sample(rnd.nextInt(sample.length))
      else {
        var r = rnd.nextDouble() * total; var i = 0
        while (i < sample.length - 1 && r > dists(i)) { r -= dists(i); i += 1 }
        centers += sample(i)
      }
    }
    // Lloyd iterations over the sample
    var cs = centers.map(_.clone()).toArray
    var it = 0
    while (it < iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      sample.foreach { v =>
        var best = 0; var bestD = Double.MaxValue; var c = 0
        while (c < k) { val d = d2(v, cs(c)); if (d < bestD) { bestD = d; best = c }; c += 1 }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += v(i); i += 1 }
      }
      cs = cs.zipWithIndex.map { case (old, c) =>
        if (counts(c) == 0) old
        else sums(c).map(_ / counts(c))
      }
      it += 1
    }
    cs
  }

  /** Product-quantization model: `codebooks(j)(c)` is centroid c of
    * subspace j. */
  final case class PqModel(codebooks: Array[Array[Array[Double]]]) {
    def m: Int = codebooks.length
    def nCentroids: Int = codebooks.head.length
    def subDim: Int = codebooks.head.head.length
  }

  /** Train PQ codebooks (Jégou et al., TPAMI 2011): the vector space
    * splits into `m` subspaces of dim/m dims; each gets its own k-means
    * codebook over the SAME content-hash-ordered deterministic sample
    * trainIvf uses (per-subspace seed = seed + j). A vector compresses
    * to m small codes — 64 dims × 8 B → 8 codes, an 8× compression at
    * 16 centroids — and asymmetric-distance queries (see [[pqTopK]])
    * score against codes without decompressing. */
  def trainPq(corpus: DataFrame, vecCol: String, m: Int, nCentroids: Int,
      seed: Long = 42L, sampleRows: Int = 100000, iters: Int = 10): PqModel = {
    val sample: Array[Array[Double]] = corpus
      .select(col(vecCol).cast("array<double>").as("__v"))
      .orderBy(xxhash64(col("__v")).asc)
      .limit(sampleRows)
      .collect()
      .map(_.getSeq[Double](0).toArray)
    require(sample.nonEmpty, "cannot train PQ codebooks on an empty corpus")
    val dim = sample.head.length
    require(dim % m == 0, s"dim $dim not divisible by m=$m")
    val subDim = dim / m
    val codebooks = (0 until m).map { j =>
      val sub = sample.map(_.slice(j * subDim, (j + 1) * subDim))
      kMeans(sub, nCentroids, seed + j, iters)
    }.toArray
    PqModel(codebooks)
  }

  /** PQ code columns: per subspace the 1-BASED index of the nearest
    * centroid (squared L2; `array_position(dists, array_min(dists))`
    * takes the FIRST minimum — the tie-break DuckDB's `list_position`
    * replays exactly). Distances are PICO-GRID integers — each term
    * floor((v[i]−c)²·10¹² + 0.5) summed as BIGINT — because float `+`
    * chains are NOT association-proof across engines (DuckDB rebalances
    * even explicit left-deep chains; the VecDotFixedPoint lesson), and
    * a last-ulp flip near an argmin tie would silently re-code a
    * vector. Codebook literals fold into the plan, so encoding is pure
    * codegen'd column math over the scan. */
  private[graft] def pqCodeCols(v: Column, model: PqModel): Seq[Column] =
    model.codebooks.toSeq.zipWithIndex.map { case (cb, j) =>
      val dists = array(cb.toSeq.map { c =>
        c.zipWithIndex.map { case (cv, i) =>
          val t = v.getItem(j * model.subDim + i) - lit(cv)
          floor(t * t * lit(1e12) + lit(0.5)).cast("long")
        }.reduce(_ + _)
      }: _*)
      array_position(dists, array_min(dists)).as(s"code_$j")
    }

  /** PQ/ADC approximate top-k (asymmetric distance computation): the
    * corpus is ENCODED (m code columns — at rest this is the 8×
    * compressed index), each query precomputes one m×nCentroids
    * partial-dot lookup table against the codebook literals, and the
    * approximate dot of (query, neighbor) is m table lookups summed —
    * no per-pair floating vector math at all. Scale shape: the encoded
    * corpus is the only big operand; queries broadcast with their
    * lookup tables; scoring is a codegen'd expression over the code
    * columns. */
  /** Encode a corpus to its PQ code columns (neighbor_id, code_0..m) —
    * the at-rest compressed index; do this ONCE and persist (the codes
    * are what a production deployment stores and re-reads). */
  def pqEncode(corpus: DataFrame, idCol: String, vecCol: String,
      model: PqModel): DataFrame =
    corpus.select(
      col(idCol).as("neighbor_id") +:
        pqCodeCols(col(vecCol).cast("array<double>"), model): _*)

  def pqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, model: PqModel): DataFrame =
    pqTopKEncoded(pqEncode(corpus, idCol, vecCol, model), queries, idCol, vecCol, k, model)

  /** ADC top-k over an already-encoded corpus (see [[pqEncode]]). */
  def pqTopKEncoded(codes: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, model: PqModel): DataFrame = {
    // partial dots on the same pico grid: centroid values pre-scaled to
    // 10¹² in SCALA (so neither engine constant-folds differently),
    // each term floored to BIGINT — integer sums are association-proof.
    // Deliberately HOFs over a literal 2-D codebook, NOT the unrolled
    // per-term expression tree the corpus encode uses: query rows are
    // FEW (one lookup table per query), and the fully unrolled
    // dim × nCentroids tree overflowed the JVM's 64 KB method limit
    // (Janino "Code grows beyond 64 KB" → interpreted fallback plus an
    // ERROR in every run's log). Same floor/scale/BIGINT arithmetic,
    // bit-identical partials, O(1) generated code.
    val qp = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("__qv"))
      .select(col("query_id") +: pqPartialCols(model): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("approx_pico").desc, col("neighbor_id"))
    broadcast(qp).crossJoin(codes)
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("approx_pico", adcScore(model))
      .withColumn("approx_dot", col("approx_pico").cast("double") / lit(1e12))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("approx_dot"),
        col("rank").cast("long").as("rank"))
  }

  /** Per-query ADC lookup-table columns p_0..p_{m-1} (each an
    * nCentroids-long array of pico-grid partial dots against the
    * codebook literals), built over a `__qv` double-array column. Shared
    * by [[pqTopKEncoded]] (full-corpus ADC) and [[ivfPqTopKEncoded]]
    * (cell-pruned ADC) so the two paths score bit-identically. */
  private def pqPartialCols(model: PqModel): Seq[Column] =
    model.codebooks.zipWithIndex.toSeq.map { case (cb, j) =>
      val cbScaled = typedLit(cb.map(_.map(_ * 1e12).toSeq).toSeq)
      transform(cbScaled, c =>
        aggregate(sequence(lit(0), lit(model.subDim - 1)), lit(0L),
          (acc, i) => acc + floor(
            element_at(col("__qv"), lit(j * model.subDim + 1) + i) *
              element_at(c, i + lit(1)) + lit(0.5)).cast("long")))
        .as(s"p_$j")
    }

  /** The ADC approximate dot in pico-grid integers: m table lookups
    * (code_j indexes p_j) summed as BIGINT. */
  private def adcScore(model: PqModel): Column =
    (0 until model.m).map(j =>
      element_at(col(s"p_$j"), col(s"code_$j").cast("int"))).reduce(_ + _)

  /** IVFADC index (Jégou et al., TPAMI 2011 §IV — the system the paper
    * actually deploys): one row per corpus vector, carrying its coarse
    * IVF cell AND its m PQ codes — (neighbor_id, cell, code_0..code_{m-1}).
    * This is the 100 TB at-rest ANN shape: stored partitioned by `cell`,
    * a query reads only its nProbe cells' partitions (sub-linear I/O,
    * the IVF property) and each row it reads is m small codes instead
    * of dim×8 bytes (the PQ property) — where [[pqTopKEncoded]] alone
    * stays corpus-linear and [[ivfTopKAssigned]] alone re-reads full
    * vectors. Encode ONCE and persist; queries never touch raw
    * embeddings. */
  def ivfPqEncode(corpus: DataFrame, idCol: String, vecCol: String,
      ivf: IvfModel, pq: PqModel): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    corpus.select(
      col(idCol).as("neighbor_id") +:
        nearestCell(ivf.centroids, v).as("cell") +:
        pqCodeCols(v, pq): _*)
  }

  /** ADC top-k over the nProbe nearest cells of an IVFADC index (see
    * [[ivfPqEncode]]): each query explodes its probed cells, the probe
    * is a broadcast equi-join on `cell` — so a cell-partitioned at-rest
    * index prunes partitions instead of scanning the corpus — and
    * scoring is the identical pico-grid ADC of [[pqTopKEncoded]]
    * (shared [[pqPartialCols]]/[[adcScore]]), so with nProbe = nCells
    * the two outputs are bit-identical (spec-pinned). Corpus vectors
    * live in exactly one cell and probed cells are distinct, so no pair
    * dedup is needed. */
  def ivfPqTopKEncoded(codes: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, ivf: IvfModel, pq: PqModel, nProbe: Int): DataFrame = {
    val qp = queries.select(col(idCol).as("query_id"),
      col(vecCol).cast("array<double>").as("__qv"))
      .select(col("query_id"), col("__qv"),
        explode(nearestCells(ivf.centroids, col("__qv"), nProbe)).as("cell"))
      .select(col("query_id") +: col("cell") +: pqPartialCols(pq): _*)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("approx_pico").desc, col("neighbor_id"))
    broadcast(qp).join(codes, Seq("cell"))
      .where(col("query_id") =!= col("neighbor_id"))
      .withColumn("approx_pico", adcScore(pq))
      .withColumn("approx_dot", col("approx_pico").cast("double") / lit(1e12))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("approx_dot"),
        col("rank").cast("long").as("rank"))
  }

  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, k: Int, ivf: IvfModel, pq: PqModel, nProbe: Int): DataFrame =
    ivfPqTopKEncoded(ivfPqEncode(corpus, idCol, vecCol, ivf, pq),
      queries, idCol, vecCol, k, ivf, pq, nProbe)

  /** IVF-style approximate top-k: the coarse quantizer's cells partition
    * the corpus; each query exactly reranks only the `nProbe` nearest
    * cells. The scale shape of FAISS-IVF on Spark: the corpus is assigned
    * once (and can be persisted partitioned by cell), per-query work is
    * nProbe/nCells of the corpus, and the cell assignment join is a plain
    * equi-join on cell id.
    */
  // nearest cell(s) as column math against centroid literals — the
  // assignment never leaves codegen'd expressions
  private def cellDistances(centroids: Array[Array[Double]])(vec: Column): Column =
    array(centroids.toSeq.zipWithIndex.map { case (c, i) =>
      val cCol = array(c.toSeq.map(lit): _*)
      struct((dot(vec, vec) - lit(2.0) * dot(vec, cCol) + lit(c.map(x => x * x).sum)).as("d2"),
        lit(i).as("cell"))
    }: _*)
  private def nearestCells(centroids: Array[Array[Double]], vec: Column, n: Int): Column =
    slice(transform(array_sort(cellDistances(centroids)(vec)), s => s.getField("cell")), 1, n)
  // corpus side needs only the argmin cell: array_min over the struct
  // array (d2 is the leading field) generates a fraction of the code a
  // full sort does — the corpus scan is the big side, keep it lean
  private def nearestCell(centroids: Array[Array[Double]], vec: Column): Column =
    array_min(cellDistances(centroids)(vec)).getField("cell")

  /** Assign every vector its coarse cell: (vec_id, vec, norm, cell) —
    * the IVF INDEX row. Run once over a corpus (or per micro-batch in
    * [[graft.streaming.StreamingAnn]]) and persist partitioned by cell;
    * queries then read only the cells they probe. */
  def assignCells(df: DataFrame, idCol: String, vecCol: String, model: IvfModel): DataFrame =
    df.select(col(idCol).as("vec_id"), col(vecCol).as("vec"),
      l2Norm(col(vecCol)).as("norm"),
      nearestCell(model.centroids, col(vecCol)).as("cell"))

  /** IVF top-k over an ALREADY-ASSIGNED corpus (the output shape of
    * [[assignCells]]) — the at-rest / streaming-index path: cell
    * assignment is not recomputed, so the per-query cost is the probe
    * joins alone. */
  /** Broadcast the exploded probe side only when |queries|·nProbe fits
    * the WIDTH-SCALED row ceiling — a probe row carries the full
    * dim-wide vector, so the 2-column calibration is divided by ~dim/2
    * (the [[GraphAnalytics.maxBroadcastRows]] rule). Past the ceiling
    * the plain join ships: the corpus re-exchanges on the nCells-keyed
    * column (the documented decay), which is slow but finishes, unlike
    * an 8 GiB-capped broadcast build. The count runs on the RAW query
    * table (pre-explode) — probe sets are small or the guard is moot. */
  private def probeSide(q: DataFrame, queries: DataFrame, model: IvfModel,
      nProbe: Int): DataFrame = {
    val dim = model.centroids.headOption.map(_.length).getOrElse(2)
    val widthCols = 3 + dim / 2
    val ceiling = GraphAnalytics.maxBroadcastRows(
      GraphAnalytics.maxBroadcastVerticesDyn, widthCols)
    if (queries.count() * nProbe <= ceiling) broadcast(q) else q
  }

  def ivfTopKAssigned(
      assigned: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, model: IvfModel, nProbe: Int): DataFrame = {
    val c = assigned.select(col("vec_id").as("neighbor_id"), col("vec").as("c_vec"),
      col("norm").as("c_norm"), col("cell"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      l2Norm(col(vecCol)).as("q_norm"),
      explode(nearestCells(model.centroids, col(vecCol), nProbe)).as("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_sim").desc, col("neighbor_id"))
    // EXPLICIT broadcast of the probe side — |queries|·nProbe rows, tiny
    // by the operator's contract (the bruteForceTopK trade: a probe set,
    // not a second corpus). Without the hint the planner's choice decays
    // with CORPUS size: past the auto-broadcast threshold it re-exchanges
    // the whole corpus keyed on `cell` — nCells distinct values, i.e. a
    // 16-key skew shuffle at 100 TB (caught by the sf10 probe: 0 → 55 MB
    // corpus exchange at 10× data, wall 9 → 32 s). With the hint the
    // join preserves the index's own partitioning at any corpus scale.
    // GUARDED like every other broadcast site: the probe rows carry full
    // dim-wide vectors, so an unguarded hint would sail into Spark's
    // 8 GiB broadcast hard cap (or a driver-build OOM) on a large query
    // set where the old plan merely degraded to a shuffle join — gate on
    // the width-scaled row ceiling and fall back to the plain join.
    probeSide(q, queries, model, nProbe).join(c, Seq("cell"))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine_sim",
        when(col("q_norm") * col("c_norm") === 0.0, lit(0.0))
          .otherwise(dot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm"))))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine_sim"), col("rank").cast("long").as("rank"))
  }

  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, model: IvfModel, nProbe: Int): DataFrame =
    ivfTopKAssigned(assignCells(corpus, idCol, vecCol, model),
      queries, idCol, vecCol, k, model, nProbe)

  /** IVF top-k with JOIN-BASED cell assignment — the large-`nCells`
    * scale path. [[ivfTopK]] compiles the centroids into the projection
    * as literal arrays: O(nCells·dim) generated code per operator, ideal
    * at 16 cells and impossible at 65k (janino limits, compile time).
    * Here the centroids are a broadcast DataFrame: every row meets every
    * centroid through a broadcast cross join and keeps its argmin via
    * `min(struct(d2, cell))` — plan size is constant in nCells, the
    * distance math is the same VecDot codegen, and the per-row work is
    * identical flops. Same-model agreement with the literal path is
    * spec-checked. */
  def ivfTopKJoin(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, model: IvfModel, nProbe: Int): DataFrame = {
    val spark = corpus.sparkSession
    import spark.implicits._
    val cdf = broadcast(model.centroids.zipWithIndex.toSeq.map { case (c, i) =>
      (i, c.toSeq, c.map(x => x * x).sum)
    }.toDF("cell", "cvec", "c2"))

    def withD2(df: DataFrame, vec: Column): DataFrame = df.crossJoin(cdf)
      .withColumn("d2", dot(vec, vec) - lit(2.0) * dot(vec, col("cvec")) + col("c2"))

    val c = withD2(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
        l2Norm(col(vecCol)).as("c_norm")), col("c_vec"))
      .groupBy(col("neighbor_id"), col("c_vec"), col("c_norm"))
      .agg(min(struct(col("d2"), col("cell"))).as("m"))
      .select(col("neighbor_id"), col("c_vec"), col("c_norm"), col("m.cell").as("cell"))

    val qw = Window.partitionBy(col("query_id")).orderBy(col("d2").asc, col("cell").asc)
    val q = withD2(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
        l2Norm(col(vecCol)).as("q_norm")), col("q_vec"))
      .withColumn("__r", row_number().over(qw))
      .where(col("__r") <= nProbe)
      .select(col("query_id"), col("q_vec"), col("q_norm"), col("cell"))

    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_sim").desc, col("neighbor_id"))
    // same guarded probe-side broadcast as ivfTopKAssigned (see its
    // scaladoc): q is ≤ |queries|·nProbe rows after the window cut
    probeSide(q, queries, model, nProbe).join(c, Seq("cell"))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine_sim",
        when(col("q_norm") * col("c_norm") === 0.0, lit(0.0))
          .otherwise(dot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm"))))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine_sim"), col("rank").cast("long").as("rank"))
  }

  /** Recall@k of an approximate top-k result against the exact one —
    * the metric nProbe/numTables/numBits are tuned with. Both inputs are
    * (query_id, neighbor_id, …) top-k frames (the output shape of every
    * topK operator here); recall for a query = |approx ∩ exact| / |exact|
    * over that query's rows. Queries the approximate pass missed entirely
    * score 0. One aggregation per side + a per-query join — runs at any
    * corpus scale the underlying top-k runs at. */
  /** Johnson–Lindenstrauss random-projection dimensionality reduction:
    * each output coordinate j is v · g_j / √outDim over the deterministic
    * Gaussian directions of [[hyperplanes]] — E‖proj‖² = ‖v‖², pairwise
    * distances concentrate within (1±ε) for outDim = O(log n / ε²)
    * (Johnson & Lindenstrauss 1984). The 4-64× narrower vectors feed
    * brute-force/IVF rerank pipelines at a fraction of the shuffle and
    * scan bytes; like the LSH buckets, the projection is a pure function
    * of content (fixed seed), so the SQL oracle replays it bit-for-bit
    * via plane literals and `list_dot_product` — per-row column math,
    * no shuffle at all. Output: idCol + outDim scalar `rp_j` columns
    * (scalars, not an array, so driver comparators can sort them).
    *
    * The dot runs through [[graft.functions.VecDotFixedPoint]] against
    * pico-grid-scaled planes — products quantized to the 1e-12 grid and
    * summed as exact integers — because a plain float dot is NOT
    * cross-engine portable (see that expression's scaladoc for the
    * measured DuckDB reassociations); the ≤ dim·5e-13 quantization is
    * noise against JL distortion. */
  def randomProjection(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, outDim: Int, seed: Long = 11L): DataFrame = {
    require(outDim >= 1 && dim >= 1, "dimensions must be positive")
    val planes = rpPlanes(dim, outDim, seed)
    val scale = 1.0 / math.sqrt(outDim.toDouble)
    val projections = planes.zipWithIndex.map { case (plane, j) =>
      val picoPlane = array(plane.toSeq.map(p => lit(p * 1e12)): _*)
      ((graft.functions.VectorFunctions.vec_dot_fixed_point(
        col(vecCol), picoPlane).cast("double") / lit(1e12)) * lit(scale)).as(s"rp_$j")
    }
    df.select(col(idCol) +: projections: _*)
  }

  def recallAtK(approx: DataFrame, exact: DataFrame): DataFrame = {
    val hits = exact.select(col("query_id"), col("neighbor_id"))
      .join(approx.select(col("query_id"), col("neighbor_id")),
        Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("__hits"))
    exact.groupBy(col("query_id")).agg(count(lit(1)).as("__truth"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        round(coalesce(col("__hits"), lit(0L)).cast("double") / col("__truth"), 6).as("recall"))
  }

  /** Convenience overload that trains the quantizer from a corpus sample
    * in-line — for exploration and tests. Production pipelines call
    * [[trainIvf]] once and reuse the model across queries. */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nCells: Int = 16, nProbe: Int = 4, seed: Long = 42L): DataFrame =
    ivfTopK(corpus, queries, idCol, vecCol, k,
      trainIvf(corpus, vecCol, nCells, seed), nProbe)

  /** Symmetric int8 quantization of an embedding column: per-vector scale
    * = max|x|/127, codes = round(x/scale) as bytes — 4× less storage and
    * shuffle bandwidth than float32, the standard ANN compression step.
    * Zero vectors quantize to scale 1 / all-zero codes. Pure column math
    * (quantization runs once, offline, over the corpus). */
  def quantizeInt8(vec: Column): Column =
    // bindOnce (see Dedup.bindOnce): both the cast pass and the scale —
    // which embeds a whole array_max(abs) pass — sit inside the codes
    // lambda; unbound, the interpreter re-runs them per ELEMENT, turning
    // a 3-pass quantization into O(dim²) work per vector (the sf1
    // ss_quant_topk isolation flagged exactly this).
    Dedup.bindOnce(transform(vec, x => x.cast("double")), d =>
      Dedup.bindOnce(array_max(transform(d, x => abs(x))), mx => {
        val scale = when(mx === 0.0, lit(1.0)).otherwise(mx / 127.0)
        struct(scale.as("scale"),
          transform(d, x => round(x / scale).cast("byte")).as("codes"))
      }))

  /** Reconstruct approximate float values from an int8-quantized struct. */
  def dequantizeInt8(q: Column): Column =
    transform(q.getField("codes"), c => c.cast("double") * q.getField("scale"))

  /** Exact cosine top-k over int8-quantized vectors: the per-vector scales
    * cancel in cosine, so ranking integer-code vectors IS the quantized
    * cosine — no dequantization in the hot path, and the pairwise dot
    * products run over 4×-smaller data. */
  def quantizedTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    def codesAsDouble(df: DataFrame) = df.withColumn(vecCol,
      quantizeInt8(col(vecCol)).getField("codes").cast("array<double>"))
    bruteForceTopK(codesAsDouble(corpus), codesAsDouble(queries), idCol, vecCol, k)
  }

  /** SemDeDup (Abbas et al. 2023, "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication"): semantic near-duplicate
    * pruning via k-means clusters. Every vector is assigned its nearest
    * centroid ([[assignCells]] — the same trained coarse quantizer IVF
    * uses); within each cluster, pairs above the cosine threshold are
    * semantic duplicates and only the LOWEST id of each pair survives
    * (deterministic stand-in for the paper's arbitrary keep-one). Cross-
    * cluster near-dups are missed by construction — that is the trade
    * the paper makes to avoid the all-pairs join.
    *
    * Scale shape: the pairing is a self-equi-join on cell id, so per-cell
    * work is (n/k)² — production picks nCells to bound cells (SemDeDup
    * used 50k clusters for LAION), and the assignment itself is one
    * codegen'd scan. The cluster index (vec_id, cell) is the thing a
    * pipeline persists and maintains incrementally (StreamingAnn shape).
    *
    * Output: (vec_id, cell, kept) for EVERY corpus vector. */
  def semanticDedup(corpus: DataFrame, idCol: String, vecCol: String,
      model: IvfModel, threshold: Double): DataFrame = {
    // materialize the assignment once — both join sides and the final
    // projection read it (the embedCosinePairs index pattern)
    val a = assignCells(corpus, idCol, vecCol, model).localCheckpoint(true)
    val l = a.select(col("cell"), col("vec_id").as("id_a"), col("vec").as("v_a"), col("norm").as("n_a"))
    val r = a.select(col("cell"), col("vec_id").as("id_b"), col("vec").as("v_b"), col("norm").as("n_b"))
    val dropped = l.join(r, Seq("cell")).where(col("id_a") < col("id_b"))
      .where(when(col("n_a") * col("n_b") === 0.0, lit(0.0))
        .otherwise(dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b"))) >= threshold)
      .select(col("id_b").as("vec_id")).distinct()
    a.join(dropped.withColumn("__drop", lit(true)), Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell").cast("long").as("cell"),
        coalesce(col("__drop"), lit(false)).unary_!.as("kept"))
  }

  /** Embedding-cosine near-duplicate pairs: LSH-bucketed candidates with
    * exact cosine verification above `threshold` (SURVEY §2.6 #30).
    *
    * Scale shape (rebuilt after the sf1 bench measured the naive form at
    * 94× shuffle / 26 GB spill on 10× duplicate-heavy data):
    *
    *  1. EXACT-DUPLICATE COLLAPSE first. Real corpora are duplicate-
    *     heavy, and identical vectors quadratically densify every LSH
    *     bucket (10 copies → 100× the within-bucket pairs). Identical
    *     vectors land in identical buckets with identical cosines, so
    *     running LSH over one REPRESENTATIVE per distinct vector and
    *     expanding groups back afterwards produces the exact same pair
    *     set — candidate work drops from Σ(bucket·dups)² to Σ bucket²,
    *     and the quadratic part that remains is the OUTPUT itself
    *     (inherent — those pairs really are near-duplicates).
    *  2. The bucket self-join carries (id, norm) only — vectors rejoin
    *     by id for the surviving deduped candidates. The wide rows
    *     (2 × dim floats) that used to ride the join and the
    *     dropDuplicates exchange were the measured spill.
    *
    * Within-group pairs score as dot(v,v)/n² — the same arithmetic an
    * engine computing the pair naively performs, so results stay
    * bit-identical (zero vectors score 0 and fall to the threshold
    * exactly as before). */
  def embedCosinePairs(
      df: DataFrame, idCol: String, vecCol: String, dim: Int,
      threshold: Double = 0.95, numBits: Int = 12, numTables: Int = 4): DataFrame = {
    val rows = df.select(col(idCol).as("id"), col(vecCol).as("vec"))
    // one corpus-sized shuffle on vector bytes — the standard exact-dedup
    // pass; groups carries each distinct vector once
    val groups = rows.groupBy("vec")
      .agg(min(col("id")).as("rep"), count(lit(1)).as("gsz"))
      .localCheckpoint(true)
    val members = rows.join(groups.select(col("vec"), col("rep")), Seq("vec"))
      .select(col("id"), col("rep")).localCheckpoint(true)
    val reps = groups.select(col("rep").as("id"), col("vec"),
      l2Norm(col("vec")).as("nrm")).localCheckpoint(true)

    val b = (0 until numTables).map(i =>
      struct(lit(i).as("tbl"), lshBucket(col("vec"), dim, numBits, seed = 7L + i).as("bucket")))
    // the LSH INDEX over representatives — narrow (id, bucket) rows only;
    // production keeps it persisted
    val base = reps
      .select(col("id"), explode(array(b: _*)).as("tb"))
      .select(col("id"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
      .localCheckpoint(true)
    val l = base.select(col("tbl"), col("bucket"), col("id").as("id_a"))
    val r = base.select(col("tbl"), col("bucket"), col("id").as("id_b"))
    val cand = l.join(r, Seq("tbl", "bucket")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b")).dropDuplicates("id_a", "id_b")
    val va = reps.select(col("id").as("id_a"), col("vec").as("v_a"), col("nrm").as("n_a"))
    val vb = reps.select(col("id").as("id_b"), col("vec").as("v_b"), col("nrm").as("n_b"))
    // EXPLICIT guarded broadcast of the vector sides (width-scaled for
    // dim+2-column rows): the checkpointed reps advertise no stats, so
    // the planner sort-merges these joins and every CANDIDATE row then
    // drags two dim-float vectors through an exchange — on a 30-way
    // near-dup corpus (sf3 probe) that was 6M candidates × ~540 B =
    // 6.76 GB shuffle and an 1096 s wall for a corpus whose rep table is
    // 31 MB. Broadcast means candidate pairs cross the wire as bare
    // (id_a, id_b) and vectors attach map-side — the shuffles-carry-ids-
    // never-payloads staging rule. Past the guard (corpus reps outgrow
    // one executor's heap share) the shuffle shape returns, which is the
    // correct degradation.
    val nReps = reps.count() // cache-scan count: reps is checkpointed
    val repBroadcastable = nReps <=
      GraphAnalytics.maxBroadcastRows(GraphAnalytics.maxBroadcastVerticesDyn, dim + 2)
    def vecSide(df: DataFrame): DataFrame = if (repBroadcastable) broadcast(df) else df
    val repPairs = cand.join(vecSide(va), Seq("id_a")).join(vecSide(vb), Seq("id_b"))
      .withColumn("cosine_sim",
        when(col("n_a") * col("n_b") === 0.0, lit(0.0))
          .otherwise(dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b"))))
      .where(col("cosine_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine_sim"))

    // expansion: a surviving rep pair stands for every cross pair of the
    // two groups (disjoint groups ⇒ no duplicates after least/greatest
    // normalization); a group of g identical vectors stands for its own
    // g·(g−1)/2 internal pairs
    // broadcast the 2-column member maps under the narrow-row guard:
    // checkpointed members also advertise no stats, so these expansion
    // joins sort-merged — and the SECOND one exchanged the already-
    // EXPANDED pair stream (sf3 probe: a 5.5M-pair output crossed the
    // wire at 2.05 GB in one 57 s stage). Broadcast makes the whole
    // expansion map-side: the output pairs never shuffle at all.
    val nMembers = members.count() // cache-scan count
    val memBroadcastable = nMembers <=
      GraphAnalytics.maxBroadcastRows(GraphAnalytics.maxBroadcastVerticesDyn, 2)
    def memSide(df: DataFrame): DataFrame = if (memBroadcastable) broadcast(df) else df
    val ma = members.select(col("rep").as("id_a"), col("id").as("__ma"))
    val mb = members.select(col("rep").as("id_b"), col("id").as("__mb"))
    val cross = repPairs.join(memSide(ma), Seq("id_a")).join(memSide(mb), Seq("id_b"))
      .select(least(col("__ma"), col("__mb")).as("id_a"),
        greatest(col("__ma"), col("__mb")).as("id_b"), col("cosine_sim"))
    val selfCos = when(col("nrm") * col("nrm") === 0.0, lit(0.0))
      .otherwise(dot(col("vec"), col("vec")) / (col("nrm") * col("nrm")))
    val dupReps = groups.where(col("gsz") > 1).select(col("rep").as("__grp"))
      .join(reps.withColumnRenamed("id", "__grp"), Seq("__grp"))
      .withColumn("cosine_sim", selfCos)
      .where(col("cosine_sim") >= threshold)
      .select(col("__grp"), col("cosine_sim"))
    val wa = members.select(col("rep").as("__grp"), col("id").as("__wa"))
    val wb = members.select(col("rep").as("__grp"), col("id").as("__wb"))
    val within = dupReps.join(memSide(wa), Seq("__grp")).join(memSide(wb), Seq("__grp"))
      .where(col("__wa") < col("__wb"))
      .select(col("__wa").as("id_a"), col("__wb").as("id_b"), col("cosine_sim"))
    cross.unionAll(within)
  }
}

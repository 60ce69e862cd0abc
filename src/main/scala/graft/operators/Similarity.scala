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
    * dimensions, Gaussian entries from a fixed seed. */
  private[operators] def hyperplanes(dim: Int, numBits: Int, seed: Long): Seq[Array[Double]] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numBits)(Array.fill(dim)(rnd.nextGaussian()))
  }

  /** Sign-bit LSH signature of a vector column: bit i = sign(v · plane_i),
    * packed into a long bucket key. Pure column expressions. */
  def lshBucket(vec: Column, dim: Int, numBits: Int, seed: Long = 7L): Column = {
    val planes = hyperplanes(dim, numBits, seed)
    planes.zipWithIndex.map { case (plane, i) =>
      val planeCol = array(plane.map(lit): _*)
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

  /** IVF-style approximate top-k: a KMeans coarse quantizer partitions the
    * corpus into `nCells` cells; each query exactly reranks only the
    * `nProbe` nearest cells. The scale shape of FAISS-IVF on Spark: the
    * corpus is assigned once (and can be persisted partitioned by cell),
    * per-query work is nProbe/nCells of the corpus, and the cell
    * assignment join is a plain equi-join on cell id.
    */
  def ivfTopK(
      corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, nCells: Int = 16, nProbe: Int = 4, seed: Long = 42L): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession

    val train = corpus.select(array_to_vector(col(vecCol).cast("array<double>")).as("features"))
    // 10 iterations is ample for a coarse quantizer — cells only need to
    // partition space, not converge tightly
    val model = new KMeans().setK(nCells).setSeed(seed).setMaxIter(10).fit(train)
    val centroids = model.clusterCenters.map(_.toArray)

    // nearest cell(s) as column math against centroid literals — the
    // assignment never leaves codegen'd expressions
    def cellDistances(vec: Column): Column = array(centroids.zipWithIndex.map { case (c, i) =>
      val cCol = array(c.map(lit): _*)
      struct((dot(vec, vec) - lit(2.0) * dot(vec, cCol) + lit(c.map(x => x * x).sum)).as("d2"),
        lit(i).as("cell"))
    }: _*)
    def nearestCells(vec: Column, n: Int): Column =
      slice(transform(array_sort(cellDistances(vec)), s => s.getField("cell")), 1, n)

    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("c_vec"),
      l2Norm(col(vecCol)).as("c_norm"),
      element_at(nearestCells(col(vecCol), 1), 1).as("cell"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("q_vec"),
      l2Norm(col(vecCol)).as("q_norm"),
      explode(nearestCells(col(vecCol), nProbe)).as("cell"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine_sim").desc, col("neighbor_id"))
    q.join(c, Seq("cell"))
      .where(col("neighbor_id") =!= col("query_id"))
      .withColumn("cosine_sim",
        when(col("q_norm") * col("c_norm") === 0.0, lit(0.0))
          .otherwise(dot(col("q_vec"), col("c_vec")) / (col("q_norm") * col("c_norm"))))
      .withColumn("rank", row_number().over(w))
      .where(col("rank") <= k)
      .select(col("query_id"), col("neighbor_id"), col("cosine_sim"), col("rank").cast("long").as("rank"))
  }

  /** Embedding-cosine near-duplicate pairs: LSH-bucketed candidates with
    * exact cosine verification above `threshold` (SURVEY §2.6 #30). */
  def embedCosinePairs(
      df: DataFrame, idCol: String, vecCol: String, dim: Int,
      threshold: Double = 0.95, numBits: Int = 12, numTables: Int = 4): DataFrame = {
    val b = (0 until numTables).map(i =>
      struct(lit(i).as("tbl"), lshBucket(col("vec"), dim, numBits, seed = 7L + i).as("bucket")))
    val base = df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      l2Norm(col(vecCol)).as("nrm"))
      .select(col("id"), col("vec"), col("nrm"), explode(array(b: _*)).as("tb"))
      .select(col("id"), col("vec"), col("nrm"), col("tb.tbl").as("tbl"), col("tb.bucket").as("bucket"))
    val l = base.select(col("tbl"), col("bucket"), col("id").as("id_a"), col("vec").as("v_a"), col("nrm").as("n_a"))
    val r = base.select(col("tbl"), col("bucket"), col("id").as("id_b"), col("vec").as("v_b"), col("nrm").as("n_b"))
    l.join(r, Seq("tbl", "bucket")).where(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cosine_sim",
        when(col("n_a") * col("n_b") === 0.0, lit(0.0))
          .otherwise(dot(col("v_a"), col("v_b")) / (col("n_a") * col("n_b"))))
      .where(col("cosine_sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine_sim"))
  }
}

package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  test("cosine: hand-computed values") {
    val df = Seq((Seq(1.0f, 0.0f), Seq(0.0f, 1.0f)),
      (Seq(1.0f, 1.0f), Seq(1.0f, 1.0f)),
      (Seq(1.0f, 2.0f), Seq(2.0f, 4.0f))).toDF("a", "b")
    val got = df.select(Similarity.cosine(col("a"), col("b"))).as[Double].collect()
    assert(math.abs(got(0) - 0.0) < 1e-12)
    assert(math.abs(got(1) - 1.0) < 1e-12)
    assert(math.abs(got(2) - 1.0) < 1e-12)
  }

  test("zero vector guard") {
    val df = Seq((Seq(0.0f, 0.0f), Seq(1.0f, 1.0f))).toDF("a", "b")
    assert(df.select(Similarity.cosine(col("a"), col("b"))).as[Double].head() == 0.0)
  }

  test("brute-force top-k: correct ordering and ranks") {
    // corpus around two directions; query id=1 along (1,0)
    val vecs = Seq(
      (1L, Seq(1.0f, 0.0f)),
      (2L, Seq(0.9f, 0.1f)),  // closest to 1
      (3L, Seq(0.5f, 0.5f)),
      (4L, Seq(0.0f, 1.0f)))  // orthogonal
      .toDF("vec_id", "embedding")
    val got = Similarity.bruteForceTopK(vecs, vecs.where(col("vec_id") === 1), "vec_id", "embedding", k = 3)
      .orderBy("rank").select("neighbor_id").as[Long].collect()
    assert(got.toSeq == Seq(2L, 3L, 4L))
  }

  test("LSH top-k finds an identical vector as nearest") {
    val v = Seq.tabulate(8)(i => (i + 1).toFloat)
    val vecs = Seq(
      (1L, v), (2L, v), // identical pair — always same bucket in every table
      (3L, Seq.tabulate(8)(i => (8 - i).toFloat)))
      .toDF("vec_id", "embedding")
    val got = Similarity.lshTopK(vecs, vecs.where(col("vec_id") === 1), "vec_id", "embedding",
      k = 1, dim = 8, numBits = 4, numTables = 2)
      .select("neighbor_id", "cosine_sim").as[(Long, Double)].collect()
    assert(got.length == 1 && got(0)._1 == 2L && math.abs(got(0)._2 - 1.0) < 1e-9)
  }

  test("IVF top-k finds an identical vector with nProbe covering its cell") {
    val rnd = new scala.util.Random(3)
    val base = (1L to 60L).map(i => (i, Seq.fill(8)(rnd.nextGaussian().toFloat)))
    val withDup = base :+ (100L, base.head._2) // identical twin of vec 1
    val vecs = withDup.toDF("vec_id", "embedding")
    val got = Similarity.ivfTopK(vecs, vecs.where(col("vec_id") === 1), "vec_id", "embedding",
      k = 1, nCells = 4, nProbe = 1)
      .select("neighbor_id", "cosine_sim").as[(Long, Double)].collect()
    assert(got.length == 1 && got(0)._1 == 100L && math.abs(got(0)._2 - 1.0) < 1e-9)
  }

  test("join-based IVF assignment agrees with the literal-centroid path") {
    val rnd = new scala.util.Random(9)
    val vecs = (1L to 120L).map(i => (i, Seq.fill(8)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val model = Similarity.trainIvf(vecs, "embedding", nCells = 6, sampleRows = 120)
    val queries = vecs.where(col("vec_id") <= 5)
    val literal = Similarity.ivfTopK(vecs, queries, "vec_id", "embedding",
      k = 3, model, nProbe = 2)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Long)].collect().toSet
    val joined = Similarity.ivfTopKJoin(vecs, queries, "vec_id", "embedding",
      k = 3, model, nProbe = 2)
      .select("query_id", "neighbor_id", "rank").as[(Long, Long, Long)].collect().toSet
    assert(literal == joined)
    assert(literal.nonEmpty)
  }

  test("int8 quantization: bounded error, scales cancel in cosine, zero-vector safe") {
    val v = Seq(0.5f, -1.0f, 0.25f, 2.0f, -0.125f, 1.5f, 0.0f, -2.0f)
    val df = Seq((1L, v), (2L, v.map(-_)), (3L, Seq.fill(8)(0.0f))).toDF("vec_id", "embedding")
    val deq = df.select(col("vec_id"),
      Similarity.dequantizeInt8(Similarity.quantizeInt8(col("embedding"))).as("d"))
      .as[(Long, Seq[Double])].collect().toMap
    // reconstruction error bounded by scale/2 = maxabs/254
    v.map(_.toDouble).zip(deq(1L)).foreach { case (orig, got) =>
      assert(math.abs(orig - got) <= 2.0 / 254 + 1e-12, s"$orig vs $got")
    }
    assert(deq(3L).forall(_ == 0.0)) // zero vector round-trips to zeros
    // quantized cosine: v vs -v is exactly -1, v vs v exactly 1
    val topk = Similarity.quantizedTopK(df, df.where(col("vec_id") === 1), "vec_id", "embedding", k = 2)
      .select("neighbor_id", "cosine_sim").as[(Long, Double)].collect().toMap
    assert(math.abs(topk(2L) - (-1.0)) < 1e-12)
    assert(topk(3L) == 0.0) // zero-vector guard
  }

  test("embedding near-dup pairs verify cosine above threshold") {
    val v = Seq.tabulate(8)(i => (i + 1).toFloat)
    val nearly = v.updated(0, 1.05f)
    val far = Seq.tabulate(8)(i => (if (i % 2 == 0) 1f else -1f))
    val vecs = Seq((1L, v), (2L, nearly), (3L, far)).toDF("vec_id", "embedding")
    val pairs = Similarity.embedCosinePairs(vecs, "vec_id", "embedding", dim = 8,
      threshold = 0.99, numBits = 2, numTables = 4)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("embedding near-dup pairs: duplicate-heavy input expands exactly") {
    // 3 copies of v, 2 of a near neighbor, 2 zero vectors, 1 far vector:
    // the duplicate-collapse path must emit every within-group pair
    // (identical vectors, cosine ≈ 1), every cross-group member pair of
    // the surviving rep pair, NO zero-vector pairs (cosine defined 0,
    // below threshold), and identical cosines across one group's pairs
    val v = Seq.tabulate(8)(i => (i + 1).toFloat)
    val nearly = v.updated(0, 1.05f)
    val far = Seq.tabulate(8)(i => (if (i % 2 == 0) 1f else -1f))
    val zero = Seq.fill(8)(0f)
    val vecs = Seq((1L, v), (2L, v), (3L, v), (4L, nearly), (5L, nearly),
      (6L, zero), (7L, zero), (8L, far)).toDF("vec_id", "embedding")
    val rows = Similarity.embedCosinePairs(vecs, "vec_id", "embedding", dim = 8,
      threshold = 0.99, numBits = 2, numTables = 4)
      .as[(Long, Long, Double)].collect()
    val got = rows.map(r => (r._1, r._2)).toSet
    val within = Set((1L, 2L), (1L, 3L), (2L, 3L), (4L, 5L))
    val cross = (for (a <- Seq(1L, 2L, 3L); b <- Seq(4L, 5L)) yield (a, b)).toSet
    assert(got == within ++ cross)
    val cos = rows.map(r => (r._1, r._2) -> r._3).toMap
    assert(cos((1L, 2L)) == cos((2L, 3L))) // identical vectors, identical value
    assert(cos((1L, 4L)) == cos((3L, 5L))) // one rep pair, one value
    assert(cos((1L, 2L)) >= 0.99 && cos((1L, 4L)) >= 0.99)
  }

  test("recall@k: hand-computed on constructed approx/exact frames") {
    val exact = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L), (2L, 21L), (3L, 30L))
      .toDF("query_id", "neighbor_id")
    // q1: 2 of 3 found; q2: both; q3: missed entirely (no approx rows)
    val approx = Seq((1L, 10L), (1L, 12L), (1L, 99L), (2L, 21L), (2L, 20L))
      .toDF("query_id", "neighbor_id")
    val got = Similarity.recallAtK(approx, exact)
      .as[(Long, Double)].collect().toMap
    assert(math.abs(got(1L) - 2.0 / 3.0) < 1e-6)
    assert(got(2L) == 1.0 && got(3L) == 0.0)
    // and live: IVF probing ALL cells recovers brute-force exactly
    val rnd = new scala.util.Random(5)
    val vecs = (0L until 30L).map(i => (i, Array.fill(8)(rnd.nextFloat()))).toDF("vec_id", "embedding")
    val q = vecs.where($"vec_id" < 5)
    val bf = Similarity.bruteForceTopK(vecs, q, "vec_id", "embedding", k = 3)
    val ivf = Similarity.ivfTopK(vecs, q, "vec_id", "embedding", k = 3, nCells = 4, nProbe = 4)
    val recall = Similarity.recallAtK(ivf, bf).agg(avg($"recall")).as[Double].head()
    assert(recall == 1.0, s"full-probe IVF must have recall 1.0, got $recall")
  }

  test("random projection: norms concentrate (JL), deterministic across partitionings") {
    val rnd = new scala.util.Random(17)
    val vecs = (0L until 200L).map(i => (i, Array.fill(64)(rnd.nextFloat() - 0.5f)))
      .toDF("vec_id", "embedding")
    val proj = Similarity.randomProjection(vecs, "vec_id", "embedding", dim = 64, outDim = 8)
    assert(proj.columns.toSeq == "vec_id" +: (0 until 8).map(i => s"rp_$i"))
    // E||proj||^2 == E||v||^2 — the mean squared-norm ratio concentrates
    // around 1 even at outDim = 8 when averaged over 200 vectors
    val sqn = proj.select($"vec_id",
      (0 until 8).map(i => col(s"rp_$i") * col(s"rp_$i")).reduce(_ + _).as("p2"))
    val orig = vecs.select($"vec_id",
      graft.functions.VectorFunctions.vec_dot($"embedding", $"embedding").as("v2"))
    val ratio = sqn.join(orig, "vec_id")
      .agg(avg($"p2" / $"v2")).as[Double].head()
    assert(math.abs(ratio - 1.0) < 0.25, s"mean norm ratio $ratio should be ~1")
    // pure function of content: identical under repartition
    val a = proj.as[(Long, Double, Double, Double, Double, Double, Double, Double, Double)]
      .collect().toSet
    val b = Similarity.randomProjection(vecs.repartition(7), "vec_id", "embedding", 64, 8)
      .as[(Long, Double, Double, Double, Double, Double, Double, Double, Double)]
      .collect().toSet
    assert(a == b)
  }

  test("PQ: codes in range, identical vectors coded identically, ADC finds the duplicate") {
    // three well-separated clusters in 16 dims + an exact duplicate of v0
    val rnd = new scala.util.Random(5)
    def jitter(base: Array[Float]): Array[Float] =
      base.map(x => x + (rnd.nextFloat() - 0.5f) * 0.05f)
    val c0 = Array.fill(16)(1.0f); val c1 = Array.fill(16)(-1.0f)
    val c2 = Array.tabulate(16)(i => if (i % 2 == 0) 1.0f else -1.0f)
    val vecs = (Seq((0L, c0), (100L, c0.clone())) ++
      (1L to 20L).map(i => (i, jitter(if (i % 3 == 0) c0 else if (i % 3 == 1) c1 else c2))))
      .toDF("vec_id", "embedding")
    val model = Similarity.trainPq(vecs, "embedding", m = 4, nCentroids = 4,
      seed = 42L, sampleRows = 1000, iters = 5)
    assert(model.m == 4 && model.subDim == 4)
    val codes = vecs.select(col("vec_id") +:
      Similarity.pqCodeCols(col("embedding").cast("array<double>"), model): _*)
      .collect().map(r => r.getLong(0) -> (1 to 4).map(r.getLong(_))).toMap
    assert(codes.values.flatten.forall(c => c >= 1 && c <= 4))
    assert(codes(0L) == codes(100L)) // identical vectors -> identical codes
    // ADC resolves at CODE granularity: every vector sharing v0's codes
    // ties at the maximal score (the duplicate cannot outrank same-code
    // cluster-mates — ids break the tie), so the top-k must all come
    // from v0's own cluster {multiples of 3} ∪ {100}
    val c0Cluster = (1L to 20L).filter(_ % 3 == 0).toSet + 100L
    val top = Similarity.pqTopK(vecs, vecs.where(col("vec_id") === 0L),
      "vec_id", "embedding", k = 3, model)
      .orderBy(col("rank")).select("neighbor_id").as[Long].collect()
    assert(top.forall(c0Cluster), s"non-cluster neighbor in ${top.toSeq}")
    // and the duplicate's score ties the rank-1 score exactly
    val scores = Similarity.pqTopK(vecs, vecs.where(col("vec_id") === 0L),
      "vec_id", "embedding", k = 21, model)
      .select("neighbor_id", "approx_dot").as[(Long, Double)].collect().toMap
    assert(scores(100L) == scores(top.head))
  }

  test("IVFADC: all-cells probe is bit-identical to PQ-only ADC; pruned probe has recall") {
    val rnd = new scala.util.Random(9)
    val vecs = (1L to 80L).map(i => (i, Seq.fill(16)(rnd.nextGaussian().toFloat)))
      .toDF("vec_id", "embedding")
    val ivf = Similarity.trainIvf(vecs, "embedding", nCells = 4, seed = 42L,
      sampleRows = 1000, iters = 5)
    val pq = Similarity.trainPq(vecs, "embedding", m = 4, nCentroids = 4,
      seed = 42L, sampleRows = 1000, iters = 5)
    val queries = vecs.where(col("vec_id") <= 5)
    // nProbe = nCells ⇒ every (query, neighbor) pair survives the cell
    // join exactly once, and scoring shares pqPartialCols/adcScore — the
    // composed operator must reproduce the full-ADC output bit-for-bit
    val full = Similarity.pqTopK(vecs, queries, "vec_id", "embedding", k = 5, pq)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    val ivfpqAll = Similarity.ivfPqTopK(vecs, queries, "vec_id", "embedding",
      k = 5, ivf, pq, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3))).toSet
    assert(ivfpqAll == full)
    // pruned probe: the index row count a query touches drops to
    // ~nProbe/nCells of the corpus, yet recall vs BRUTE FORCE stays
    // useful (identical-twin guarantee: a duplicate shares its query's
    // cell, so it is always probed)
    val exact = Similarity.bruteForceTopK(vecs, queries, "vec_id", "embedding", k = 5)
    val approx = Similarity.ivfPqTopK(vecs, queries, "vec_id", "embedding",
      k = 5, ivf, pq, nProbe = 2)
    val recall = Similarity.recallAtK(approx, exact)
      .agg(avg(col("recall"))).as[Double].head()
    assert(recall >= 0.2, s"IVFADC recall collapsed: $recall")
  }

  test("fixed-point dot: matches a double dot to the grid and is exactly integer picos") {
    val vecs = Seq((1L, Array(0.5f, -0.25f, 0.125f))).toDF("vec_id", "embedding")
    val w = Array(1.0, 2.0, 4.0)
    val pico = org.apache.spark.sql.functions.array(w.map(x => lit(x * 1e12)): _*)
    val got = vecs.select(graft.functions.VectorFunctions
      .vec_dot_fixed_point($"embedding", pico).as("s")).as[Long].head()
    // 0.5*1 - 0.25*2 + 0.125*4 = 0.5 exactly -> 5e11 picos
    assert(got == 500000000000L)
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Generate an sf1-scale perf dataset by replicating the driver's sf0.1
  * tables 10× with shifted keys.
  *
  * The driver only ships sf0.001/0.01/0.1, but every performance claim
  * needs at least one run against data big enough to punish a wrong plan
  * (~6M lineitem rows, ~1M events). Replication with per-replica key
  * offsets preserves the source distributions (degree histograms, skew,
  * group cardinalities per key-neighborhood) and referential integrity
  * exactly — replica r of orders points at replica r of customer — so
  * operator work scales the way a real 10× would. Row CONTENT (names,
  * text, embeddings) repeats across replicas; that only matters to the
  * dedup/ANN family, where 10-way exact duplicates are a realistic (and
  * harsher) workload, not a shortcut.
  *
  * Correctness stays gated at sf0.01 against the DuckDB oracle — this
  * dataset is for benchmarks only and lives outside git
  * (testdata_sf1/, gitignored).
  *
  * PERTURBATION (default on; pass `--exact` as the 3rd arg for the r9
  * exact-replica behavior): replicas 1..9 of `documents.text` get ~1%
  * of whitespace tokens mutated and `embeddings.embedding` components
  * jittered by ±1% — deterministic per (id, replica, position) via
  * murmur3, no RNG. Exact replication makes the near-dup/ANN family's
  * 10×-scale workload degenerate (every row is a 10-way EXACT
  * duplicate, which the duplicate-collapse paths crush in one hash);
  * perturbed replicas are realistic near-duplicates: high-Jaccard
  * non-identical shingle sets, cosine ≈ 0.9998 non-identical vectors —
  * the workload shape a web corpus actually has. Replica 0 is always
  * verbatim, so every original row survives. */
object MakeSf1 {
  /** Replica count: 10 = sf1 from sf0.1 (the round default); override via
    * SPARK_GRAFT_REPLICAS for deeper scale probes (30 = sf3). */
  private val Replicas = sys.env.getOrElse("SPARK_GRAFT_REPLICAS", "10").toInt

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "testdata_sf1"
    val perturb = !args.contains("--exact")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // events.ts may be physically TIMESTAMP(NANOS); read it as int64-ns
    // (the same contract Tables.events uses) so replication round-trips
    // whichever encoding the driver generated.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    new java.io.File(dst).mkdirs()

    // copied verbatim: the shared small dimensions
    Seq("region", "nation").foreach { t =>
      spark.read.parquet(s"$src/$t.parquet").write.mode("overwrite")
        .parquet(s"$dst/$t.parquet")
    }

    // per-table key columns to shift by replica * stride, where stride is
    // derived from the table OWNING the key so FK references stay aligned
    def stride(table: String, key: String): Long =
      spark.read.parquet(s"$src/$table.parquet")
        .agg(max(col(key))).head().getLong(0) + 1L

    val custStride = stride("customer", "c_custkey")
    val suppStride = stride("supplier", "s_suppkey")
    val partStride = stride("part", "p_partkey")
    val orderStride = stride("orders", "o_orderkey")
    val eventStride = stride("events", "event_id")
    val userStride = stride("events", "user_id")
    val docStride = stride("documents", "doc_id")
    val vecStride = stride("embeddings", "vec_id")

    def replicate(table: String, shifts: Map[String, Long],
        mutate: DataFrame => DataFrame = identity): Unit = {
      val base = spark.read.parquet(s"$src/$table.parquet")
      val reps = spark.range(Replicas).select(col("id").as("__rep"))
      val out = base.crossJoin(reps)
      val shifted = shifts.foldLeft(out) { case (df, (c, s)) =>
        df.withColumn(c, col(c) + col("__rep") * lit(s))
      }
      val mutated = if (perturb) mutate(shifted) else shifted
      mutated.select(base.columns.map(col).toIndexedSeq: _*)
        .write.mode("overwrite").parquet(s"$dst/$table.parquet")
      println(s"[sf1] $table: ${Replicas}x${if (perturb) " (perturbed)" else ""}")
    }

    // ~1% of whitespace tokens mutated per non-zero replica, chosen by
    // murmur3(doc_id, rep, token index) — deterministic, replayable.
    // The mutation (append the replica digit) changes the token's
    // shingles/fingerprints without shifting whitespace offsets much.
    def perturbText(df: DataFrame): DataFrame =
      df.withColumn("text",
        when(col("__rep") === 0, col("text")).otherwise(
          array_join(
            expr("""transform(split(text, ' '), (t, i) ->
                    CASE WHEN pmod(hash(doc_id, __rep, i), 100) = 0
                         THEN concat(t, __rep) ELSE t END)"""),
            " ")))
        // keep the length metadata honest for the mutated replicas
        .withColumn("n_chars",
          when(col("__rep") === 0, col("n_chars")).otherwise(length(col("text"))))

    // ±1% multiplicative jitter per component: cosine vs the original
    // stays ≈ 0.99995 — inside every near-dup threshold, but no longer
    // bit-identical, so signature blocking has to do real work.
    def perturbEmbedding(df: DataFrame): DataFrame =
      df.withColumn("embedding",
        when(col("__rep") === 0, col("embedding")).otherwise(
          expr("""transform(embedding, (x, i) -> CAST(
                    x * (1.0D + (pmod(hash(vec_id, __rep, i), 2001) - 1000) / 100000.0D)
                  AS FLOAT))""")))

    replicate("customer", Map("c_custkey" -> custStride))
    replicate("supplier", Map("s_suppkey" -> suppStride))
    replicate("part", Map("p_partkey" -> partStride))
    replicate("orders", Map("o_orderkey" -> orderStride, "o_custkey" -> custStride))
    replicate("lineitem", Map("l_orderkey" -> orderStride,
      "l_partkey" -> partStride, "l_suppkey" -> suppStride))
    replicate("events", Map("event_id" -> eventStride, "user_id" -> userStride))
    replicate("documents", Map("doc_id" -> docStride), perturbText)
    replicate("embeddings", Map("vec_id" -> vecStride), perturbEmbedding)
    spark.stop()
  }
}

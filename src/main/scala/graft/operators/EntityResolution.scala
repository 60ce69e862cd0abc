package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Blocked fuzzy-matching entity resolution (SURVEY §2.6): candidate
  * pairs from a cheap deterministic blocking key, verified with a
  * THRESHOLDED edit distance — the classic record-linkage shape
  * (Fellegi–Sunter blocking; sorted-neighborhood's fixed-window cousin).
  *
  * Scale shape mirrors the round-2 minhash refactor: the self-join runs
  * on (block, id, name) only — never full records — and pathological
  * blocks are dropped by the same windowed `maxBucketSize` guard (a hot
  * block of k rows would otherwise emit k² candidates). Verification
  * uses Spark's bounded `levenshtein(l, r, threshold)`, which
  * short-circuits the DP at `maxDist` band width — O(len·d) per pair,
  * not O(len²) — and the filter runs inside the join's codegen stage,
  * so non-matches never materialize.
  */
object EntityResolution {

  /** Candidate pairs (id_a < id_b) whose `nameCol` values sit within
    * `maxDist` edits, blocked by `blockExpr`. Returns
    * (id_a, id_b, name_a, name_b, dist). */
  def fuzzyPairs(df: DataFrame, idCol: String, nameCol: String,
      blockExpr: Column, maxDist: Int = 1,
      maxBucketSize: Int = 1000): DataFrame = {
    require(maxDist >= 0, "maxDist must be non-negative")
    val base = df.select(col(idCol).as("id"), col(nameCol).as("name"),
      blockExpr.as("blk"))
    // EXACT-DUPLICATE COLLAPSE first (the embedCosinePairs recipe —
    // rebuilt after the sf1 bench measured 56× wall-clock on 10×
    // duplicate-heavy data): identical (block, name) rows quadratically
    // densify the block self-join, but the edit distance depends only on
    // the names, so candidate generation and verification run over one
    // REPRESENTATIVE per distinct (block, name) and the groups expand
    // back afterwards — the levenshtein work drops from Σ(rows/block)²
    // to Σ(distinct names/block)², and the quadratic remainder is the
    // output itself (those pairs really match). Results are row-for-row
    // identical: within-group pairs have distance 0 by definition, and
    // every cross pair inherits its rep pair's distance verbatim.
    val groups = base.groupBy("blk", "name")
      .agg(min(col("id")).as("rep"), count(lit(1)).as("gsz"))
      .localCheckpoint(true)
    val members = base.join(groups.select(col("blk"), col("name"), col("rep")),
      Seq("blk", "name")).select(col("id"), col("rep")).localCheckpoint(true)
    // skew guard: a boilerplate block of k RAW rows emits k^2 candidates;
    // the guard keeps its raw-row semantics via the group-size sum
    val sized = groups.withColumn("blk_n",
      sum(col("gsz")).over(Window.partitionBy(col("blk"))))
      .where(col("blk_n") <= maxBucketSize)
    val l = sized.select(col("blk"), col("rep").as("ra"), col("name").as("na"))
    val r = sized.select(col("blk"), col("rep").as("rb"), col("name").as("nb"))
    val repPairs = l.join(r, Seq("blk"))
      .where(col("ra") < col("rb"))
      .withColumn("dist", levenshtein(col("na"), col("nb"), maxDist).cast("long"))
      .where(col("dist") >= 0) // threshold form returns -1 above maxDist
      .select(col("ra"), col("rb"), col("na"), col("nb"), col("dist"))
    val ma = members.select(col("rep").as("ra"), col("id").as("__xa"))
    val mb = members.select(col("rep").as("rb"), col("id").as("__xb"))
    val cross = repPairs.join(ma, Seq("ra")).join(mb, Seq("rb"))
      .select(least(col("__xa"), col("__xb")).as("id_a"),
        greatest(col("__xa"), col("__xb")).as("id_b"),
        when(col("__xa") < col("__xb"), col("na")).otherwise(col("nb")).as("name_a"),
        when(col("__xa") < col("__xb"), col("nb")).otherwise(col("na")).as("name_b"),
        col("dist"))
    val wa = members.select(col("rep"), col("id").as("__xa"))
    val wb = members.select(col("rep"), col("id").as("__xb"))
    val within = sized.where(col("gsz") > 1).select(col("rep"), col("name"))
      .join(wa, Seq("rep")).join(wb, Seq("rep"))
      .where(col("__xa") < col("__xb"))
      .select(col("__xa").as("id_a"), col("__xb").as("id_b"),
        col("name").as("name_a"), col("name").as("name_b"), lit(0L).as("dist"))
    cross.unionAll(within)
  }

  /** Sorted-neighborhood matching (Hernández–Stolfo 1995), the
    * complementary classic to hash blocking: order entities by a sort
    * key inside each partition block and compare each row to its next
    * `window − 1` neighbors only — O(n·w) comparisons, and typo classes
    * the blocking key cannot see (e.g. a LEADING-digit error under a
    * prefix block) become adjacent under the right sort (e.g. a
    * reversed-name suffix sort).
    *
    * Scale shape: ONE hash exchange on the block key and a per-block
    * sort — never a global single-partition window; all `window − 1`
    * leads compute in one WindowExec pass and explode to pairs, with
    * the thresholded-levenshtein verify inside the same stage. Returns
    * (id_a, id_b, dist) with id_a < id_b. */
  def sortedNeighborPairs(df: DataFrame, idCol: String, nameCol: String,
      sortExpr: Column, blockExpr: Column, window: Int = 4,
      maxDist: Int = 1): DataFrame = {
    require(window >= 2, "window must be at least 2")
    val base = df.select(col(idCol).as("id"), col(nameCol).as("name"),
      sortExpr.as("sk"), blockExpr.as("blk"))
    val w = Window.partitionBy(col("blk")).orderBy(col("sk"), col("id"))
    val neighbors = array((1 until window).map(j =>
      struct(lead(col("id"), j).over(w).as("id_b"),
        lead(col("name"), j).over(w).as("name_b"))): _*)
    base.select(col("id"), col("name"), neighbors.as("nbs"))
      .select(col("id"), col("name"), explode(col("nbs")).as("nb"))
      .where(col("nb.id_b").isNotNull)
      .withColumn("dist",
        levenshtein(col("name"), col("nb.name_b"), maxDist).cast("long"))
      .where(col("dist") >= 0)
      .select(least(col("id"), col("nb.id_b")).as("id_a"),
        greatest(col("id"), col("nb.id_b")).as("id_b"), col("dist"))
  }

  /** Entity clusters over the verified pairs: connected components via
    * the existing large-star/small-star machinery, canonical (minimum)
    * id per cluster, unmatched entities canonical to themselves — the
    * merge step of an ER pipeline. Returns (id, canonical_id,
    * is_canonical). */
  def resolve(df: DataFrame, idCol: String, nameCol: String,
      blockExpr: Column, maxDist: Int = 1,
      maxBucketSize: Int = 1000): DataFrame = {
    val pairs = fuzzyPairs(df, idCol, nameCol, blockExpr, maxDist, maxBucketSize)
    Dedup.nearDupClusters(df.select(col(idCol)), idCol, pairs)
      .select(col("doc_id").as("id"), col("canonical_id"), col("is_canonical"))
  }
}

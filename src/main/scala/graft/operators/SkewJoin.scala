package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-resistant equi-join (SURVEY §4): when a join key is pathologically
  * hot (one customer with 10^8 orders), a plain hash join sends the whole
  * hot key to one reducer. Salting splits each hot key `saltFactor` ways:
  * the big side gets a deterministic per-row salt, the small side is
  * replicated across all salts, and the join key becomes (key, salt).
  *
  * AQE's skew-join handling covers sort-merge joins automatically; this
  * operator is for the cases AQE can't rewrite (e.g. aggregations after
  * the join keyed on the hot key, or deliberate pre-partitioning).
  */
object SkewJoin {

  /** Join `big` (skewed side) with `small` on `key`, spreading each key
    * over `saltFactor` reducers. Row-content-hash salting is deterministic
    * (no rand()), so the same input always produces the same plan and the
    * join is retry-safe under task re-execution. */
  def saltedJoin(big: DataFrame, small: DataFrame, key: String, saltFactor: Int,
      joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0, "saltFactor must be positive")
    // right/full-outer would null-extend every unmatched replica of the
    // small side (saltFactor copies per row) — only big-side-preserving
    // join types are well-defined under replication.
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti", "cross").contains(joinType.toLowerCase),
      s"saltedJoin supports inner/left join types, not $joinType")
    val bigCols = big.columns
    val salted = big.withColumn("__salt",
      pmod(xxhash64(bigCols.map(col).toSeq: _*), lit(saltFactor)).cast("int"))
    val expanded = small.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(expanded, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Salted aggregation: two-phase groupBy for hot grouping keys — partial
    * aggregate on (key, salt), then final aggregate on key. Spark's own
    * partial aggregation already does this for algebraic aggregates; this
    * explicit form is for `collect_list`-style holistic aggregates where
    * map-side combine doesn't bound reducer load. */
  def saltedCollectList(df: DataFrame, key: String, valueCol: String,
      saltFactor: Int): DataFrame = {
    df.withColumn("__salt", pmod(xxhash64(col(valueCol)), lit(saltFactor)))
      .groupBy(col(key), col("__salt"))
      .agg(collect_list(col(valueCol)).as("__partial"))
      .groupBy(col(key))
      .agg(flatten(collect_list(col("__partial"))).as(s"${valueCol}_list"))
  }
}

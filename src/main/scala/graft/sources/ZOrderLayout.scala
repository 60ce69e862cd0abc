package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout for multi-dimensional file
  * skipping — the at-rest complement of [[BucketedTables]] (which
  * co-locates JOINS; this co-locates RANGE PREDICATES). Sorting a table
  * by one column makes that column's per-file min/max ranges tight and
  * every other column's ranges as wide as the table; interleaving the
  * bits of two dimensions and range-partitioning on the interleaved
  * value gives every file a tight bounding BOX, so parquet min/max
  * stats prune files for predicates on EITHER dimension (or both) —
  * the Delta/Iceberg OPTIMIZE ZORDER recipe in minimal explicit form.
  * At 100 TB the win is the scan: a (customer, date-range) probe reads
  * the few files whose box intersects it instead of the whole table.
  *
  * The z-value is pure integer bit math (shift/and/or), identical in
  * every engine — the computation itself is oracle-checkable (g_zorder)
  * even though layout effects are a physical property (spec-asserted via
  * per-file bounding-box tightness instead).
  */
object ZOrderLayout {

  /** Default per-dimension width: 21 bits × 2 dims = 42-bit z-values. */
  val DefaultBits = 21

  /** Bit-interleave two non-negative integer columns into the Morton
    * code: bit i of `a` lands at position 2i+1, bit i of `b` at 2i.
    * Inputs must fit `bits` bits — out-of-range values fail LOUDLY
    * (raise_error stays inside codegen), because silent truncation
    * would interleave garbage and quietly destroy locality. Callers
    * with wider domains rescale first (rank, epoch-day, id div N). */
  def zValue(a: Column, b: Column, bits: Int = DefaultBits): Column = {
    require(bits >= 1 && bits <= 31, s"bits=$bits outside [1, 31]")
    val lim = 1L << bits
    def guarded(c: Column, name: String): Column =
      when(c.isNull || c < 0 || c >= lim,
        raise_error(concat(lit(s"z-order input $name out of [0, 2^$bits): "), c.cast("string"))))
        .otherwise(c.cast("long"))
    val ga = guarded(a, "a")
    val gb = guarded(b, "b")
    val terms = (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(ga, i).bitwiseAND(lit(1L)), 2 * i + 1),
        shiftleft(shiftright(gb, i).bitwiseAND(lit(1L)), 2 * i))
    }
    terms.reduce(_ bitwiseOR _)
  }

  /** The matching SQL expression text (engine-portable bit ops) — used
    * by oracles and handy for external engines reading the same layout. */
  def zValueSql(a: String, b: String, bits: Int = DefaultBits): String =
    (0 until bits).flatMap { i =>
      Seq(s"((($a >> $i) & 1) << ${2 * i + 1})", s"((($b >> $i) & 1) << ${2 * i})")
    }.mkString(" | ")

  /** Re-arrange `df` into z-cluster order on two integer dimensions:
    * range-partition by the z-value into `numFiles` partitions, sort
    * within each, drop the helper column. Range boundaries come from
    * Spark's reservoir sample over the z column — boundary placement
    * varies run to run, but every partition is always a contiguous
    * z-range, which is the property pruning needs. The layout is
    * transparent to readers: parquet footers carry the resulting tight
    * per-file min/max on both dims, and every engine's stats pruning
    * uses them with no reader-side cooperation. */
  def clustered(df: DataFrame, colA: String, colB: String,
      numFiles: Int, bits: Int = DefaultBits): DataFrame =
    df.withColumn("__z", zValue(col(colA), col(colB), bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")

  /** [[clustered]] + parquet write. */
  def writeZOrdered(df: DataFrame, colA: String, colB: String, path: String,
      numFiles: Int, bits: Int = DefaultBits): Unit =
    clustered(df, colA, colB, numFiles, bits)
      .write.mode("overwrite").parquet(path)
}

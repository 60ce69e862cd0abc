package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable streaming sketches — the fixed-size summaries a 100 TB
  * pipeline keeps instead of exact state (SURVEY §2 pipeline extensions;
  * cf. reference's store-everything export model, neo4j_export.py's
  * full-table MATCH scans).
  *
  * Both sketches here are built on the engine-portable 60-bit md5 hash
  * ([[Dedup.md5Long]]): every register value is a deterministic pure
  * function of the input CONTENT, so a DuckDB oracle replays the whole
  * sketch — estimates included — bit for bit. That is deliberate: approx
  * algorithms usually escape exact correctness gates; portable hashing
  * puts them back inside one.
  *
  *   - HyperLogLog (Flajolet et al. 2007): distinct-count in m = 2^b
  *     registers. The scale story: exact COUNT(DISTINCT) shuffles every
  *     distinct value; the HLL shuffle is ≤ m (bucket, register) rows —
  *     constant — and registers max-merge across partitions, days, or
  *     streaming micro-batches.
  *   - Count-min (Cormode & Muthukrishnan 2005): frequency table in
  *     d × w counters. Point estimates overshoot by at most εN with
  *     ε = e/w — and never undershoot. Counters sum-merge.
  */
object Sketches {

  /** Default HLL precision: b=8 → m=256 registers, standard error
    * 1.04/√m ≈ 6.5%. */
  val HllBits = 8

  private val HashBits = 60 // md5Long yields a 60-bit non-negative hash

  /** HLL registers of a value column: (bucket, register) — bucket is the
    * low `b` hash bits, register the max over values of ρ(w) = leading
    * zeros of the remaining 60−b bits + 1 (computed EXACTLY via binary-
    * string length — floating log2 misrounds at powers of two). ≤ 2^b
    * rows out; map-side partial max keeps the shuffle at ≤ 2^b rows per
    * task regardless of input size. Registers from different slices of a
    * corpus max-merge: `union.groupBy(bucket).agg(max(register))`. */
  def hllRegisters(df: DataFrame, value: Column, b: Int = HllBits): DataFrame = {
    require(b >= 4 && b <= 16, s"HLL precision b=$b outside [4, 16]")
    val m = 1L << b
    val w = HashBits - b // width of the rank field
    val h = Dedup.md5Long(value.cast("string"))
    // top w bits via shift — a double division would round above 2^53
    val rank = shiftright(h, b)
    val rho = when(rank === 0L, lit(w + 1))
      .otherwise(lit(w + 1) - length(conv(rank, 10, 2)))
    df.select(pmod(h, lit(m)).as("bucket"), rho.as("rho"))
      .groupBy("bucket").agg(max(col("rho")).cast("int").as("register"))
  }

  /** Fold an HLL register table to the cardinality estimate — one row,
    * `approx_distinct` (rounded to 6dp). The harmonic sum runs SCALED:
    * Σ 2^(60−Mj) as DECIMAL(38,0) is exact and order-independent
    * (a plain double Σ 2^−Mj would be aggregation-order-dependent and
    * never reproduce across engines); one cast to double at the end is
    * a single correctly-rounded IEEE op. Small-range (V > 0, E ≤ 2.5m)
    * uses linear counting m·ln(m/V); the 2^60 hash space needs no
    * large-range correction below ~10^17 distincts. */
  /** α_m · m² · 2^60 folded to ONE double constant — exposed within graft
    * so SQL oracles embed the IDENTICAL literal (Double.toString
    * round-trips through DuckDB's parser) and the estimate division is
    * the same single IEEE op in both engines. */
  private[graft] def hllNumer(b: Int): Double = {
    val m = 1L << b
    val alpha = b match {
      case 4 => 0.673
      case 5 => 0.697
      case 6 => 0.709
      case _ => 0.7213 / (1.0 + 1.079 / m)
    }
    alpha * m.toDouble * m.toDouble * math.pow(2.0, HashBits)
  }

  def hllEstimate(registers: DataFrame, b: Int = HllBits): DataFrame = {
    val m = 1L << b
    val numer = hllNumer(b)
    registers
      .agg(
        coalesce(sum(expr(s"CAST(shiftleft(CAST(1 AS BIGINT), $HashBits - register) AS DECIMAL(38,0))")),
          lit(0).cast("decimal(38,0)")).as("s_present"),
        count(lit(1)).as("n_buckets"))
      .select(
        (lit(m) - col("n_buckets")).as("v"),
        (col("s_present") + (lit(m) - col("n_buckets")).cast("decimal(38,0)")
          * lit(1L << HashBits).cast("decimal(38,0)")).as("s_total"))
      .select(
        round(
          when(col("v") > 0 &&
            lit(numer) / col("s_total").cast("double") <= lit(2.5 * m),
            lit(m.toDouble) * log(lit(m.toDouble) / col("v").cast("double")))
            .otherwise(lit(numer) / col("s_total").cast("double")),
          6).as("approx_distinct"))
  }

  /** One-shot convenience: registers + estimate. */
  def hllDistinct(df: DataFrame, value: Column, b: Int = HllBits): DataFrame =
    hllEstimate(hllRegisters(df, value, b), b)

  /** Default count-min geometry: 4 × 1024 counters ≈ ε = e/1024 ≈ 0.27%
    * of total count, failure probability e^−4 ≈ 1.8%. */
  val CmsDepth = 4
  val CmsWidth = 1024

  /** Count-min table of a value column: (row, cell, cnt), ≤ d·w rows.
    * Row i's hash is md5("i:" || value) mod w — independent-enough rows
    * from one portable hash family. Map-side partial count keeps the
    * shuffle ≤ d·w rows per task; tables from corpus slices SUM-merge. */
  def cmsTable(df: DataFrame, value: Column,
      depth: Int = CmsDepth, width: Int = CmsWidth): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad CMS geometry ${depth}x$width")
    val cells = array((0 until depth).map { i =>
      struct(lit(i).as("row"),
        pmod(Dedup.md5Long(concat(lit(s"$i:"), value.cast("string"))), lit(width.toLong)).as("cell"))
    }: _*)
    df.select(explode(cells).as("rc"))
      .select(col("rc.row").as("row"), col("rc.cell").as("cell"))
      .groupBy("row", "cell").agg(count(lit(1)).as("cnt"))
  }

  /** Point-estimate the frequency of each item in `items` against a CMS
    * table: est(x) = min over rows of the counter x hashes into — never
    * below the true count, above it only by colliding mass. The sketch
    * side is ≤ d·w rows → broadcast; the items side streams at any
    * scale. Output: (item, est_count). */
  def cmsLookup(cms: DataFrame, items: DataFrame, itemCol: String,
      depth: Int = CmsDepth, width: Int = CmsWidth): DataFrame = {
    val cells = array((0 until depth).map { i =>
      struct(lit(i).as("row"),
        pmod(Dedup.md5Long(concat(lit(s"$i:"), col(itemCol).cast("string"))), lit(width.toLong)).as("cell"))
    }: _*)
    items.select(col(itemCol), explode(cells).as("rc"))
      .select(col(itemCol), col("rc.row").as("row"), col("rc.cell").as("cell"))
      .join(broadcast(cms), Seq("row", "cell"))
      .groupBy(col(itemCol))
      .agg(min(col("cnt")).as("est_count"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** GROUPED HLL registers: one ≤2^b-register sketch per group key —
    * the per-key cardinality shape (distinct users per domain, distinct
    * queries per day) that exact per-group COUNT(DISTINCT) pays a full
    * (group, value) shuffle for; this shuffles ≤ groups·2^b register
    * rows with map-side partial max. Same portable hash, so grouped
    * sketches merge across slices AND fold down to the global sketch
    * (max over groups per bucket — spec-checked). */
  def hllRegistersGrouped(df: DataFrame, groupCol: String, value: Column,
      b: Int = HllBits): DataFrame = {
    require(b >= 4 && b <= 16, s"HLL precision b=$b outside [4, 16]")
    val m = 1L << b
    val w = HashBits - b
    val h = Dedup.md5Long(value.cast("string"))
    val rank = shiftright(h, b)
    val rho = when(rank === 0L, lit(w + 1))
      .otherwise(lit(w + 1) - length(conv(rank, 10, 2)))
    df.select(col(groupCol), pmod(h, lit(m)).as("bucket"), rho.as("rho"))
      .groupBy(col(groupCol), col("bucket"))
      .agg(max(col("rho")).cast("int").as("register"))
  }

  /** Per-group estimates from grouped registers: (group,
    * approx_distinct) — the same raw/linear-counting branches as
    * [[hllEstimate]], evaluated per group. */
  def hllEstimateGrouped(registers: DataFrame, groupCol: String,
      b: Int = HllBits): DataFrame = {
    val m = 1L << b
    val numer = hllNumer(b)
    registers
      .groupBy(col(groupCol))
      .agg(
        coalesce(sum(expr(s"CAST(shiftleft(CAST(1 AS BIGINT), $HashBits - register) AS DECIMAL(38,0))")),
          lit(0).cast("decimal(38,0)")).as("s_present"),
        count(lit(1)).as("n_buckets"))
      .select(col(groupCol),
        (lit(m) - col("n_buckets")).as("v"),
        (col("s_present") + (lit(m) - col("n_buckets")).cast("decimal(38,0)")
          * lit(1L << HashBits).cast("decimal(38,0)")).as("s_total"))
      .select(col(groupCol),
        round(
          when(col("v") > 0 &&
            lit(numer) / col("s_total").cast("double") <= lit(2.5 * m),
            lit(m.toDouble) * log(lit(m.toDouble) / col("v").cast("double")))
            .otherwise(lit(numer) / col("s_total").cast("double")),
          6).as("approx_distinct"))
  }

  /** Default count-min geometry: 4 × 1024 counters ≈ ε = e/1024 ≈ 0.27%
    * of total count, failure probability e^−4 ≈ 1.8%. */
  val CmsDepth = 4
  val CmsWidth = 1024

  /** Count-min table of a value column: (row, cell, cnt), ≤ d·w rows.
    * Row i's hash is md5("i:" || value) mod w — independent-enough rows
    * from one portable hash family. Map-side partial count keeps the
    * shuffle ≤ d·w rows per task; tables from corpus slices SUM-merge.
    *
    * Plan shape: one aggregation branch PER SKETCH ROW, unioned — not an
    * `explode` of a per-input-row cell array. The branches each scan the
    * single value column (columnar parquet makes d scans ≈ one full-row
    * scan in bytes) and map-side-combine into ≤ w cells before the wire;
    * the explode form was measured at sf1 to cost ~3× the whole md5
    * workload in pure `Generate` + row-reassembly overhead (25.7 s vs
    * 9.9 s for identical hashing over 6M rows — the generated rows fall
    * out of the columnar batch path exactly where the input is widest). */
  def cmsTable(df: DataFrame, value: Column,
      depth: Int = CmsDepth, width: Int = CmsWidth): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad CMS geometry ${depth}x$width")
    (0 until depth).map { i =>
      df.select(lit(i).as("row"),
          pmod(Dedup.md5Long(concat(lit(s"$i:"), value.cast("string"))), lit(width.toLong)).as("cell"))
        .groupBy("row", "cell").agg(count(lit(1)).as("cnt"))
    }.reduce(_ unionAll _)
  }

  /** [[cmsTable]] over PRE-COUNTED values: `counts` holds one row per
    * distinct value with its multiplicity in `cntCol`. The sketch is
    * bit-identical to the row-level table (a CMS cell is a SUM of the
    * counts of the values hashing into it — grouping first changes the
    * addition order, not the sums) but hashes each distinct value once
    * instead of once per occurrence: a caller that already aggregates
    * true counts (q_cms_heavy's truth table, any keyed slice summary)
    * drops the sketch's hash work from O(rows·d) to O(distinct·d) —
    * 24M → 800k md5s at sf1, and the ratio only improves with scale. */
  def cmsTableWeighted(counts: DataFrame, value: Column, cntCol: Column,
      depth: Int = CmsDepth, width: Int = CmsWidth): DataFrame = {
    require(depth >= 1 && width >= 2, s"bad CMS geometry ${depth}x$width")
    (0 until depth).map { i =>
      counts.select(lit(i).as("row"),
          pmod(Dedup.md5Long(concat(lit(s"$i:"), value.cast("string"))), lit(width.toLong)).as("cell"),
          cntCol.as("__w"))
        .groupBy("row", "cell").agg(sum(col("__w")).as("cnt"))
    }.reduce(_ unionAll _)
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

  /** Default Bloom geometry: m = 2^16 bits, h = 3 hashes → ~5% false
    * positives at n ≈ 10k keys (m/n ≈ 6.5); the set-bit table is at most
    * m rows of one BIGINT — broadcast-sized at any corpus scale. */
  val BloomM = 65536
  val BloomH = 3

  private def bloomPositions(value: Column, m: Int, h: Int): Column =
    array((0 until h).map { i =>
      pmod(Dedup.md5Long(concat(lit(s"bf$i:"), value.cast("string"))), lit(m.toLong))
    }: _*)

  /** Bloom-filter sketch of a key set: the DISTINCT set positions of h
    * portable md5 hashes per key — ≤ m rows out, built with one map-side-
    * combined aggregation (shuffle ≤ m rows per task). Deterministic
    * function of content, so a DuckDB oracle replays every bit — including
    * which probes come back as FALSE POSITIVES. Sketches of corpus slices
    * merge by `union.distinct` (bitwise OR). */
  def bloomBits(df: DataFrame, value: Column, m: Int = BloomM, h: Int = BloomH): DataFrame = {
    require(m >= 2 && h >= 1, s"bad bloom geometry m=$m h=$h")
    df.select(explode(bloomPositions(value, m, h)).as("pos")).distinct()
  }

  /** Probe each item against a Bloom sketch: might_contain = all h of the
    * item's positions are set (1/0; one-sided — a true member is NEVER
    * reported absent). The bits side broadcasts; the items side streams.
    * Output: (item, might_contain). */
  def bloomMightContain(bits: DataFrame, items: DataFrame, itemCol: String,
      m: Int = BloomM, h: Int = BloomH): DataFrame =
    items.select(col(itemCol), explode(bloomPositions(col(itemCol), m, h)).as("pos"))
      .join(broadcast(bits.withColumn("__set", lit(1))), Seq("pos"), "left_outer")
      .groupBy(col(itemCol))
      .agg((count(col("__set")) === h).cast("long").as("might_contain"))

  /** Bloom-pruned semi-join: `big SEMI JOIN keys ON bigKey = keysKey`,
    * with the big side pre-filtered through a Bloom sketch of the key set
    * before the exact join. At 100 TB the win is shuffle volume: the
    * sketch is ≤ m broadcast rows, the pre-filter drops every big-side
    * row whose key hashes to an unset bit (all true negatives — the
    * one-sided guarantee means no true match is lost), and only the
    * surviving ~(match + εN) rows reach the exact semi-join. This is
    * Spark's own runtime-filter rewrite (`spark.sql.optimizer.runtime.
    * bloomFilter.enabled`) in explicit, engine-portable form — usable
    * where the optimizer can't see the key set (e.g. a precomputed sketch
    * from another job, day, or engine). Result ≡ the plain semi-join
    * (spec-checked). */
  def bloomPrunedSemiJoin(big: DataFrame, bigKey: String,
      keys: DataFrame, keysKey: String,
      m: Int = BloomM, h: Int = BloomH): DataFrame = {
    val bits = bloomBits(keys, col(keysKey), m, h)
    val candidateKeys = bloomMightContain(bits, big.select(col(bigKey)).distinct(), bigKey, m, h)
      .where(col("might_contain") === 1L).select(col(bigKey))
    big.join(candidateKeys, Seq(bigKey), "left_semi")
      .join(keys.select(col(keysKey).as(bigKey)), Seq(bigKey), "left_semi")
  }

  /** Default quantile-sketch sample size: ε ≈ 1/√k ≈ 3% rank error. */
  val QuantileSampleK = 1000

  /** Deterministic bottom-k row sample per group — the quantile sketch's
    * storage object (and a general-purpose uniform sample). Each row's
    * sampling key is the portable md5 hash of its UNIQUE id ("qs:" || id),
    * so the selected set is a pure function of content: the same rows
    * survive across runs, reshards, partitionings, and engines (a DuckDB
    * oracle replays the selection with `row_number() OVER (ORDER BY h,
    * id)`). Hash-of-id is uniform, so the sample is uniform-without-
    * replacement per group — quantiles over it estimate the group's
    * quantiles with rank error O(1/√k) (Vitter-style sample; cf. the
    * bottom-k/KMV sketches of Cohen & Kaplan 2007).
    *
    * Scale shape: [[TopK.perKey]] prunes with per-partition bounded heaps
    * before the exact window pass, so each group moves ≤ partitions·k
    * (group, value, hash) triples — never its full row set. The sketch
    * MERGES: bottom-k of a union = bottom-k of the per-slice bottom-k
    * unions, so per-day/per-source samples fold into a corpus sample
    * without rescanning (spec-checked).
    *
    * Output: (groupCol, value). A group with ≤ k rows returns all of them
    * (its quantiles are then exact). */
  def quantileSample(df: DataFrame, groupCol: String, id: Column,
      value: Column, k: Int = QuantileSampleK): DataFrame = {
    require(k > 0, "sample size k must be positive")
    val keyed = df.select(col(groupCol), value.as("value"),
      negate(Dedup.md5Long(concat(lit("qs:"), id.cast("string")))).as("__nh"),
      id.cast("string").as("__id"))
    TopK.perKey(keyed, groupCol, "__nh", k, tieBreak = Seq("__id"))
      .select(col(groupCol), col("value"))
  }

  // ------------------------------------------------- KMV (theta) sketch

  /** Default KMV size: relative error ≈ 1/√(k−2) ≈ 3.2% at k=1024. */
  val KmvK = 1024

  /** K-minimum-values (theta) distinct-count sketch (Bar-Yossef et al.
    * 2002; the Apache theta-sketch shape): keep the k smallest portable
    * md5 hashes of the distinct values. What it buys over HLL is SET
    * OPERATIONS: two sketches intersect/difference by plain set algebra
    * on their hash samples below a shared θ — HLL registers can union
    * (max-merge) but fundamentally cannot intersect. Deterministic
    * (content-keyed hashes, no coins), so build AND estimates replay in
    * SQL bit-for-bit.
    *
    * Scale shape: distinct + global bottom-k = one (hash)-keyed
    * aggregation then TakeOrderedAndProject-style per-partition top-k —
    * ≤ partitions·k rows move. Output: single column `h`, the ≤ k
    * smallest 60-bit hashes. Sketches of slices union-merge (re-take
    * bottom-k of the union — exact, like the quantile sample). */
  def kmvSketch(df: DataFrame, value: Column, k: Int = KmvK): DataFrame =
    df.select(Dedup.md5Long(value.cast("string")).as("h"))
      .distinct().orderBy("h").limit(k)

  /** Distinct-count estimate from a KMV sketch: (k−1)·2^60/h_k with
    * h_k the largest retained hash — or the EXACT count when the whole
    * distinct set fit (fewer than k hashes). One BIGINT→double cast per
    * operand and one division: engine-exact. */
  def kmvEstimate(sketch: DataFrame, k: Int = KmvK): DataFrame =
    sketch.agg(count(lit(1)).as("n"), coalesce(max(col("h")), lit(0L)).as("hk"))
      .select(when(col("n") < k, col("n").cast("double"))
        .otherwise(lit((k - 1).toDouble * math.pow(2, 60)) / col("hk").cast("double"))
        .as("approx_distinct"))

  /** Intersection-cardinality estimate from two KMV sketches: both
    * samples are uniform below their θ (the k-th min hash), so below
    * θ = min(θ_A, θ_B) the shared hashes are a uniform sample of the
    * intersection: |A∩B| ≈ |S_A ∩ S_B ∩ [0,θ)| · 2^60/θ. When either
    * side kept its whole set (n < k, θ treated as 2^60) the estimate
    * degrades gracefully toward exact. Same recipe estimates ANY set
    * expression (union via inclusion-exclusion or direct merge,
    * difference by A-side-only hashes) — the operation HLL cannot do. */
  def kmvIntersectEstimate(a: DataFrame, b: DataFrame, k: Int = KmvK): DataFrame = {
    def theta(s: DataFrame) = s.agg(
      when(count(lit(1)) < k, lit(1L << 60)).otherwise(max(col("h"))).as("theta"))
    val thetas = theta(a).crossJoin(theta(b).withColumnRenamed("theta", "theta_b"))
      .select(least(col("theta"), col("theta_b")).as("theta"))
    // count agg keeps the one-row shape even for an empty intersection
    val d = a.join(b, Seq("h"), "inner").crossJoin(broadcast(thetas))
      .where(col("h") < col("theta"))
      .agg(count(lit(1)).as("d"))
    d.crossJoin(thetas)
      .select((col("d").cast("double") * lit(math.pow(2, 60)) / col("theta").cast("double"))
        .as("approx_intersection"))
  }

  // ------------------------------------------- multi-level quantile sketch

  /** Default compaction-sketch size: with L = ceil(log2(n/k)) levels the
    * rank error is Σ_{ℓ<L} 2^ℓ/2 < 2^L/2 ≤ n/k ranks — ε ≤ 1/k ≈ 0.4%
    * at k=256, an order better than the bottom-k sample's 1/√k ≈ 3% at
    * comparable row count. */
  val MpSketchK = 256

  /** [[mpQuantileSketch]]/[[mpMerge]] switch from the one-window-pass
    * compaction to the distributed range-rank form once the LARGEST
    * group exceeds this row count: below it a group's sort fits one
    * task comfortably and the distributed form's per-round fixed jobs
    * are pure overhead; above it a single hot group would serialize an
    * entire round through one task — the 100 TB disqualifier. Both
    * forms produce bit-identical survivors. */
  val MpDistributedRankRows: Long = 2L * 1000 * 1000

  /** Broadcast ceiling for the distributed compaction's per-round stat
    * tables (offsets/gstats, 5 narrow columns each). offsets is
    * O(partitions × live (group, level) pairs) — tiny in every measured
    * round, but unbounded in the group count, so past this ceiling the
    * rank joins fall back to shuffle joins instead of failing the
    * broadcast build. Width-scaled from the 2-column vertex ceiling
    * ([[GraphAnalytics.maxBroadcastRows]]): 5 columns → 2/5 of the
    * row budget at the same byte cap. */
  val MpMaxBroadcastStatRows: Long =
    GraphAnalytics.maxBroadcastRows(GraphAnalytics.MaxBroadcastVertices, 5)

  /** Deterministic parity bit for compacting (group, level): which of the
    * two rank classes survives the halving. Derandomized via the portable
    * md5 hash — KLL flips a real coin here; tying the coin to CONTENT
    * keeps the whole sketch a pure function of the input multiset, so it
    * reproduces across runs, partitionings and engines (the property the
    * DuckDB oracle checks). */
  private def mpParity(groupCol: String): Column =
    pmod(Dedup.md5Long(concat(lit("mp:"), col(groupCol).cast("string"),
      lit(":"), col("level").cast("string"))), lit(2))

  /** One compaction round over sketch rows (groupCol, value, rid, level).
    * Groups at ≤ k rows pass through untouched (the identity property
    * that lets a FIXED generous round count replay in SQL); a group over
    * k sorts its MINIMUM-level rows by (value, rid) and keeps every other
    * one — survivors move up a level (weight doubles). Rank-preserving
    * halving of a weight-2^ℓ run costs ≤ 2^ℓ/2 ranks (Munro–Paterson
    * 1980; the MRL96 "collapse" step), and compacting the lowest level
    * first keeps that cost geometric.
    *
    * ODD-RUN accounting: an odd-length min-level run keeps ⌈m/2⌉ or
    * ⌊m/2⌋ rows depending on the parity bit — in the ⌊⌋ case the run's
    * total weight drops by 2^ℓ (the extreme being a single-row run
    * vanishing entirely). KLL carries the unmatched element; this
    * sketch instead accepts one extra 2^ℓ of one-sided rank slack per
    * compaction so that survivorship stays a pure parity function of
    * (group, level) — the property the SQL oracle replays row-for-row.
    * The documented error budget is therefore Σ(2^ℓ/2 + 2^ℓ) = Σ 3·2^ℓ/2
    * over compactions, still geometric and still o(1/√k)-class; the
    * estimate side renormalizes by realized total weight, so dropped
    * weight biases ranks, never the weight ledger. */
  private[graft] def mpCompactOnce(cur: DataFrame, groupCol: String, k: Int,
      distributedRank: Boolean): DataFrame = {
    if (!distributedRank) {
      // SMALL-GROUP form (below [[MpDistributedRankRows]]): one window
      // pass per round — a group sorts inside a single task, which is
      // exactly right when it fits one task. The distributed form's
      // extra per-round jobs (range sampling, checkpoint, broadcast
      // builds) cost ~3× wall at bench SF for zero benefit there
      // (measured 2.6 → 9.6 s at sf0.1) — the same local-floor/scale
      // trade the CC local-fallback and coreness frontier gates encode.
      // Both forms keep bit-identical survivors (rank ≡ row_number over
      // the same total order), so the oracle replays either.
      val wAll = Window.partitionBy(groupCol)
      val wRank = Window.partitionBy(col(groupCol), col("level"))
        .orderBy(col("value"), col("rid"))
      val stepped = cur.select(col(groupCol), col("value"), col("rid"), col("level"),
        (count(lit(1)).over(wAll) > k).as("__over"),
        (col("level") === min(col("level")).over(wAll)).as("__atMin"),
        row_number().over(wRank).as("__rn"), mpParity(groupCol).as("__par"))
      return stepped
        .where(!col("__over") || !col("__atMin") || pmod(col("__rn"), lit(2)) === col("__par"))
        .select(col(groupCol), col("value"), col("rid"),
          when(col("__over") && col("__atMin"), col("level") + 1)
            .otherwise(col("level")).as("level"))
    }
    // DISTRIBUTED rank, not Window.partitionBy(group): a per-group window
    // runs the whole group's sort in ONE task — 20M+ rows per return flag
    // at 10× scale, and a single hot group is exactly what a 100 TB
    // corpus slice looks like. The global (value, rid) rank within
    // (group, level) is reconstructed from a range-partitioned local
    // rank plus broadcast per-(partition, group, level) offsets — the
    // weightedNegativeSamples two-phase-cumsum recipe. (group, value,
    // rid, level) is a total order (rid is unique), so range partitions
    // are order-disjoint and local-rank + offset ≡ the global
    // row_number: bit-identical survivors, and the identity-padded CTE
    // oracle replays unchanged. Group stats (over k? min level?) come
    // from a map-combined aggregate broadcast back — the old
    // count-over-group window forced the same single-task-per-group
    // shape. Each round's input is a narrow filter over the PREVIOUS
    // round's checkpointed frame (see the eager pin below), so the
    // range partitioner's sampling pass — repartitionByRange executes
    // its child twice — re-runs only that filter against cache.
    // ONE exchange per round: the range repartition. Rows land
    // range-disjoint in (group, level, value, rid) order; the narrow
    // in-partition sort by that (unique → total) key makes row order a
    // pure function of content — shuffle fetch order cannot perturb it —
    // so the partition-local monotonic id yields the local rank as
    // (id − min id over (partition, group, level)), and the broadcast
    // per-(partition, group, level) counts reconstruct the global
    // offsets. A window over (__pid, group, level) would compute the
    // same rank but re-exchange every row by hash — the bytes this
    // round shape exists to avoid.
    // EAGERLY materialized: three consumers (the two broadcast builds
    // below and the stepped join) would otherwise each re-execute the
    // range exchange — measured 2.6 → 9.6 s at sf0.1 before this pin,
    // at identical shuffle bytes. __pid/__mid are computed BEFORE the
    // checkpoint, so the ranks are already plain columns and the
    // cached row order no longer matters.
    val parted = cur
      .repartitionByRange(col(groupCol), col("level"), col("value"), col("rid"))
      .sortWithinPartitions(col(groupCol), col("level"), col("value"), col("rid"))
      .withColumn("__pid", spark_partition_id())
      .withColumn("__mid", monotonically_increasing_id())
      .localCheckpoint(true)
    // cnts is O(partitions × live (group, level) pairs) — broadcast-sized
    // for any sane round, but at 100 TB a very large group COUNT (with
    // one hot group pulling the whole input into this path) can make
    // the stat tables themselves the failure point, so both broadcasts
    // ride a count guard with a shuffle-join fallback (the operators'
    // standard discipline). The guard count reads the eagerly-pinned
    // cnts frame, so the extra action is one cached-aggregate job.
    val cnts = parted.groupBy(col("__pid"), col(groupCol), col("level"))
      .agg(count(lit(1)).as("__cnt"), min(col("__mid")).as("__mlo"))
      .localCheckpoint(true)
    val statsFit = cnts.count() <= MpMaxBroadcastStatRows
    def maybeB(df: DataFrame): DataFrame = if (statsFit) broadcast(df) else df
    val gstats = cnts.groupBy(groupCol).agg(
      (sum(col("__cnt")) > k).as("__over"), min(col("level")).as("__minl"))
    val offsets = cnts
      .select(col("__pid").as("__opid"), col(groupCol).as("__og"),
        col("level").as("__ol"), col("__cnt"), col("__mlo"))
      .withColumn("__off", coalesce(sum(col("__cnt")).over(
        Window.partitionBy(col("__og"), col("__ol")).orderBy(col("__opid"))
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .drop("__cnt")
    val stepped = parted
      .join(maybeB(offsets), parted("__pid") === col("__opid")
        && parted(groupCol) === col("__og") && parted("level") === col("__ol"))
      .join(maybeB(gstats), groupCol)
      .select(col(groupCol), col("value"), col("rid"), col("level"),
        col("__over"), (col("level") === col("__minl")).as("__atMin"),
        (col("__mid") - col("__mlo") + 1L + col("__off")).as("__rn"),
        mpParity(groupCol).as("__par"))
    stepped
      .where(!col("__over") || !col("__atMin") || pmod(col("__rn"), lit(2)) === col("__par"))
      .select(col(groupCol), col("value"), col("rid"),
        when(col("__over") && col("__atMin"), col("level") + 1)
          .otherwise(col("level")).as("level"))
  }

  private def mpFinish(cur: DataFrame, groupCol: String): DataFrame =
    cur.select(col(groupCol), col("value"), col("rid"), col("level"),
      expr("shiftleft(CAST(1 AS BIGINT), level)").as("weight"))

  /** Multi-level deterministic quantile sketch (Munro–Paterson /
    * Manku-Rajagopalan-Lindsay family): per group, repeatedly halve the
    * value-sorted rows — survivors double in weight — until ≤ k weighted
    * rows summarize the whole distribution. Every halving keeps one of
    * the two rank-parity classes, chosen by the md5 parity bit, so unlike
    * KLL's coin flips the sketch is a pure function of the input content:
    * same rows survive across runs, reshards and engines, and a DuckDB
    * oracle replays build AND estimates exactly (chained identity-padded
    * CTE rounds — see the q_mp_quantiles oracle).
    *
    * Rank error after L = ceil(log2(n/k)) levels is < 2^L/2 ≤ n/k
    * ranks (ε ≤ 1/k) — o(1/√k): at k rows stored this beats the
    * bottom-k sample sketch ([[quantileSample]], ε = 1/√k) by ~√k.
    *
    * Scale shape: each round is ONE window pass whose input halves
    * round-over-round — log2(n/k) shuffles totalling ≤ 2n rows moved,
    * each carrying only (group, value, rid, level). Per-group rows
    * co-locate for the window sort; for a single group too hot for one
    * partition, sketch deterministic md5(id)-salted slices and fold them
    * with [[mpMerge]] (content-keyed slices keep the result
    * partition-independent). Output: (groupCol, value, rid, level,
    * weight) — ≤ k rows per group, mergeable via [[mpMerge]].
    *
    * NULL values are excluded up front (quantiles over NULL are
    * undefined; matches `percentile`'s ignore-null semantics). */
  def mpQuantileSketch(df: DataFrame, groupCol: String, id: Column,
      value: Column, k: Int = MpSketchK): DataFrame = {
    require(k >= 2, "sketch size k must be >= 2")
    val base = df.where(value.isNotNull).select(col(groupCol), value.as("value"),
      id.cast("string").as("rid"), lit(0).as("level"))
    val maxN = base.groupBy(groupCol).count()
      .agg(coalesce(max("count"), lit(0L))).head().getLong(0)
    var rounds = 0
    var cap = k.toLong
    while (cap < maxN) { cap *= 2; rounds += 1 }
    // Hot-group gate: maxN is exactly the largest group's row count.
    // A per-round DECAYED gate (groups halve every round, so round r's
    // ceiling is maxN >> (r−1) — only the first rounds need the
    // distributed rank) was measured at sf1 and REVERTED: with few hot
    // groups the window rounds serialize on single tasks and give the
    // fixed-job savings straight back (23.0 s vs 21.5 s static,
    // overlapping noise; bytes ~equal). The static gate keeps every
    // round of a hot build parallel.
    // Distributed rounds checkpoint their range-partitioned frame
    // internally (multi-consumer pin, bounds lineage — a round's output
    // is a narrow filter over that cache); window rounds keep the
    // caller-side cadence (eager while data-heavy, sparse after).
    // Generations sum geometrically (n + n/2 + … ≤ 2n rows), so the
    // retained blocks stay O(input).
    val distributedRank = maxN > MpDistributedRankRows
    var cur = if (rounds > 0) base.localCheckpoint(true) else base
    (1 to rounds).foreach { r =>
      cur = mpCompactOnce(cur, groupCol, k, distributedRank)
      if (!distributedRank && (r <= 4 || r % 4 == 0 || r == rounds))
        cur = cur.localCheckpoint(true)
    }
    mpFinish(cur, groupCol)
  }

  /** Merge two MP sketches of DISJOINT slices of a corpus: union the
    * weighted rows, then compact lowest-level-first until each group is
    * back under k rows. Mixed levels need no pre-alignment — the estimate
    * reads weights, not levels — so merge cost is a few ≤ 2k-row window
    * passes. Unlike HLL/CMS/bottom-k merges this one is lossy (each
    * compaction spends more of the rank-error budget: the merged sketch
    * is ~one level deeper than the single-pass sketch of the union), but
    * it stays deterministic and within the Σ 2^ℓ/2 bound — the price of
    * o(1/√k) accuracy in a mergeable summary. */
  def mpMerge(a: DataFrame, b: DataFrame, groupCol: String, k: Int = MpSketchK): DataFrame = {
    require(k >= 2, "sketch size k must be >= 2")
    val cols = Seq(col(groupCol), col("value"), col("rid"), col("level"))
    var cur = a.select(cols: _*).unionByName(b.select(cols: _*))
    val stats = cur.groupBy(groupCol)
      .agg(count(lit(1)).as("n"), min("level").as("lo"), max("level").as("hi"))
      .agg(coalesce(max("n"), lit(0L)).as("n"),
        coalesce(max(col("hi") - col("lo")), lit(0)).as("spread")).head()
    val (maxN, spread) = (stats.getLong(0), stats.getInt(1))
    var rounds = spread + 1
    var cap = k.toLong
    while (cap < maxN) { cap *= 2; rounds += 1 }
    val distributedRank = maxN > MpDistributedRankRows
    if (rounds > 0) cur = cur.localCheckpoint(true)
    (1 to rounds).foreach { r =>
      cur = mpCompactOnce(cur, groupCol, k, distributedRank)
      if (!distributedRank && (r <= 4 || r % 4 == 0 || r == rounds))
        cur = cur.localCheckpoint(true)
    }
    // the spread+log2(maxN/k) round budget is heuristic for adversarial
    // level mixes: estimates stay valid on an oversized sketch, but an
    // overrun must be VISIBLE (the graph operators' sentinel-row
    // convention — a sketch row can't carry a sentinel, so log instead)
    cur = cur.localCheckpoint(true)
    val oversized = cur.groupBy(groupCol).agg(count(lit(1)).as("n"))
      .where(col("n") > k).count()
    if (oversized > 0)
      System.err.println(s"[graft] mpMerge: $oversized group(s) still over k=$k rows " +
        s"after $rounds compaction rounds (estimates remain valid; sketch oversized)")
    mpFinish(cur, groupCol)
  }

  /** Quantile estimates from an MP sketch: for each q (given in exact
    * per-mille so the target-rank comparison stays in integers — a
    * double q·W boundary would be engine-dependent), the estimate is the
    * first sketch value whose cumulative weight reaches q·W/1000, i.e.
    * `min value with 1000·cw ≥ q‰·W`. All-integer, so estimates — not
    * just sketch rows — replay bit-for-bit in the oracle. Output:
    * (groupCol, q DOUBLE, est) with est in the value's own type. */
  def mpQuantileEstimate(sketch: DataFrame, groupCol: String,
      qsPermille: Seq[Int]): DataFrame = {
    require(qsPermille.nonEmpty && qsPermille.forall(q => q > 0 && q <= 1000),
      s"per-mille quantiles must be in (0, 1000]: $qsPermille")
    val spark = sketch.sparkSession
    import spark.implicits._
    val wCum = Window.partitionBy(groupCol).orderBy(col("value"), col("rid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wAll = Window.partitionBy(groupCol)
    val cum = sketch.select(col(groupCol), col("value"),
      sum("weight").over(wCum).as("__cw"), sum("weight").over(wAll).as("__tw"))
    val qdf = qsPermille.toDF("__qpm")
    cum.crossJoin(broadcast(qdf))
      .where(col("__cw") * 1000 >= col("__qpm") * col("__tw"))
      .groupBy(col(groupCol), col("__qpm"))
      .agg(min(col("value")).as("est"))
      .select(col(groupCol), (col("__qpm") / 1000.0).as("q"), col("est"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators (SURVEY §2.6) for web-scale corpora.
  *
  * Exact dedup is a single hash-shuffle on a 32-byte digest — at 100 TB the
  * shuffle carries (hash, id) pairs only, never the documents. Near-dup
  * variants (MinHash-LSH, SimHash, n-gram Jaccard, embedding LSH) bound the
  * candidate-pair explosion by banding/bucketing before any pairwise work.
  */
object Dedup {

  /** Content digest used for exact grouping. sha2-256 of the raw text. */
  def contentHash(text: Column): Column = sha2(text, 256)

  /** Exact-duplicate groups: one row per distinct content, the kept
    * (minimum) id and the number of copies. Shuffles only (hash, id). */
  def exactGroups(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(contentHash(col(textCol)).as("content_hash"), col(idCol))
      .groupBy(col("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Exact dedup keeping the minimum-id row per distinct content. */
  def dropExactDuplicates(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val w = Window.partitionBy(contentHash(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w)).where(col("__rn") === 1).drop("__rn")
  }

  // ------------------------------------------------------------- shingles

  /** Evaluate `v` ONCE per row and pass it to `body` as a bound lambda
    * variable. Higher-order functions (transform/aggregate/filter) are
    * CodegenFallback: the interpreter re-evaluates every FREE
    * subexpression inside a lambda once per ARRAY ELEMENT, so a lambda
    * that closes over an expensive expression (a regex split, a hash)
    * multiplies its cost by the array length — measured at sf1 as 9×
    * on the shingle builder (36.4 s → 4.1 s over 50k docs) because each
    * of a document's ~45 window slices re-ran the whole tokenizer.
    * `element_at(transform(array(v), body), 1)` is the expression-level
    * `let`: the element IS the evaluated `v`, bodies see a BoundReference.
    * NULL flows through unchanged (array(v)=[null] → body(null), exactly
    * the unbound evaluation). */
  private[graft] def bindOnce(v: Column, body: Column => Column): Column =
    element_at(transform(array(v), body), 1)

  /** Word shingles (n-grams of whitespace tokens) as an array column.
    * The token array is [[bindOnce]]-bound: each window slice must NOT
    * re-run the tokenizer. */
  def wordShingles(text: Column, n: Int): Column =
    bindOnce(split(trim(text), "\\s+"), toks => {
      // sliding index range [0, size-n]; codegen'd transform, no UDF
      val idx = sequence(lit(0), greatest(size(toks) - n, lit(0)))
      when(size(toks) < n, array(array_join(toks, " ")))
        .otherwise(transform(idx, i => array_join(slice(toks, i + 1, lit(n)), " ")))
    })

  /** 64-bit hashes of the shingle set (distinct), the MinHash input. */
  def shingleHashes(text: Column, n: Int): Column =
    transform(array_distinct(wordShingles(text, n)), s => xxhash64(s))

  /** 60-bit md5 hash of a string column (first 15 hex chars) —
    * engine-portable: DuckDB parses `'0x' || hex` to BIGINT directly, so
    * structures built on it are SQL-replayable (see [[simHashMd5]]). */
  private[graft] def md5Long(s: Column): Column =
    conv(substring(md5(s), 1, 15), 16, 10).cast("long")

  /** Engine-portable variant of [[shingleHashes]]. */
  def shingleHashesMd5(text: Column, n: Int): Column =
    transform(array_distinct(wordShingles(text, n)), s => md5Long(s))

  // ------------------------------------------------------------- minhash

  /** Deterministic (a, b) parameters of the `numHashes` universal-hash
    * permutations — exposed within graft so SQL oracles embed the
    * IDENTICAL constants (same pattern as Similarity.hyperplanes). */
  private[graft] def minHashParams(numHashes: Int, seed: Long = 42L): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(seed)
    Seq.fill(numHashes)(
      (math.abs(rnd.nextLong()) % 1000000007L + 1, math.abs(rnd.nextLong()) % 1000000007L))
  }

  private[graft] val MinHashPrime = 4294967311L // smallest prime > 2^32

  /** MinHash signature of `numHashes` permutations via the standard
    * (a*x + b) mod p universal-hash trick over the given shingle hashes,
    * folded to 32 bits first so a*x never overflows a signed 64-bit long
    * (p ≈ 2^32, a < 2^30 → a*x < 2^62). Pure column expressions — the
    * signature computation never leaves whole-stage codegen. */
  def minHashSignature(shingles: Column, numHashes: Int, seed: Long = 42L): Column = {
    val p = lit(MinHashPrime)
    // bindOnce: the folded shingle hashes feed every one of the numHashes
    // permutation mins — unbound, the shingle expression (often a whole
    // tokenize+hash pipeline) would re-run per permutation
    bindOnce(transform(shingles, h => pmod(h, p)), folded =>
      array(minHashParams(numHashes, seed).map { case (a, b) =>
        array_min(transform(folded, h => pmod(h * lit(a) + lit(b), p)))
      }: _*))
  }

  /** LSH band keys: hash `rows`-sized slices of the signature; docs sharing
    * any band key become candidate pairs. */
  def lshBandKeys(signature: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band"), xxhash64(array_join(slice(signature, b * rows + 1, rows), ",")).as("bucket"))
    }: _*)

  /** Engine-portable band keys: the bucket hash is [[md5Long]] of the
    * comma-joined slice instead of xxhash64. */
  def lshBandKeysMd5(signature: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      struct(lit(b).as("band"),
        md5Long(array_join(slice(signature, b * rows + 1, rows), ",")).as("bucket"))
    }: _*)

  /** LSH band-bucket assignment per document: (doc_id, band, bucket).
    * The join key space of the near-dup candidate generation — exposed as
    * its own operator so the banding can be checked/benchmarked directly. */
  def minHashBands(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val rows = numHashes / bands
    df.select(col(idCol).as("doc_id"),
      minHashSignature(shingleHashes(col(textCol), shingleSize), numHashes).as("sig"))
      .select(col("doc_id"), explode(lshBandKeys(col("sig"), bands, rows)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))
  }

  /** Fully engine-portable [[minHashBands]]: md5 shingle hashes + md5
    * band buckets — every value SQL-replayable, so the driver can
    * hash-check the complete banding structure. The xxhash64 form stays
    * the production default (xxhash64 is several times faster). */
  def minHashBandsMd5(df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 16): DataFrame = {
    val rows = numHashes / bands
    df.select(col(idCol).as("doc_id"),
      minHashSignature(shingleHashesMd5(col(textCol), shingleSize), numHashes).as("sig"))
      .select(col("doc_id"), explode(lshBandKeysMd5(col("sig"), bands, rows)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))
  }

  /** Near-duplicate candidate pairs via MinHash-LSH, with exact Jaccard
    * verification over the shingle sets.
    *
    * Pipeline: shingle → minhash → explode band keys → SIGNATURE-ONLY
    * self-join per bucket (skew-guarded by capping bucket size) →
    * signature Jaccard-estimate prune → join back to the documents by id
    * for the exact shingle-set verify.
    *
    * The banded shuffle carries (id, 64-slot signature) — never the
    * shingle sets, which are corpus-sized: at web scale the shingle arrays
    * are the documents. The estimator (fraction of agreeing minhash slots,
    * the textbook unbiased Jaccard estimate) prunes candidates at
    * threshold − `pruneSigmas`·σ (σ = √(J(1−J)/numHashes)), so the exact
    * verify — two id-equi-joins against the corpus — touches only
    * plausible pairs. At the default 3σ a true pair sitting exactly at the
    * threshold is dropped with probability ≈0.1% (binomial tail); callers
    * that need the exhaustive LSH-candidates + exact-verify semantics pass
    * `pruneSigmas = Double.PositiveInfinity` to disable the prune. */
  def minHashLshPairs(
      df: DataFrame, idCol: String, textCol: String,
      shingleSize: Int = 3, numHashes: Int = 64, bands: Int = 16,
      jaccardThreshold: Double = 0.8, maxBucketSize: Int = 1000,
      pruneSigmas: Double = 3.0): DataFrame = {
    val rows = numHashes / bands
    val base = df.select(
      col(idCol).as("doc_id"),
      minHashSignature(shingleHashes(col(textCol), shingleSize), numHashes).as("sig"))
    val banded = base
      .select(col("doc_id"), col("sig"), explode(lshBandKeys(col("sig"), bands, rows)).as("bk"))
      .select(col("doc_id"), col("sig"), col("bk.band").as("band"), col("bk.bucket").as("bucket"))
    // skew guard: drop pathological buckets (boilerplate explosion)
    val sized = banded.withColumn("bucket_n",
      count(lit(1)).over(Window.partitionBy(col("band"), col("bucket"))))
      .where(col("bucket_n") <= maxBucketSize)
    val l = sized.select(col("band"), col("bucket"), col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val r = sized.select(col("band"), col("bucket"), col("doc_id").as("id_b"), col("sig").as("sig_b"))
    require(pruneSigmas >= 0, "pruneSigmas must be non-negative (PositiveInfinity disables the prune)")
    val sigma = math.sqrt(jaccardThreshold * (1 - jaccardThreshold) / numHashes)
    val pruneAt =
      if (pruneSigmas.isPosInfinity) 0.0
      else math.max(0.0, jaccardThreshold - pruneSigmas * sigma)
    val candidates = l.join(r, Seq("band", "bucket")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("jaccard_est",
        size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y), b => b))
          .cast("double") / numHashes)
      .where(col("jaccard_est") >= pruneAt)
      .select(col("id_a"), col("id_b"))
    // exact verify on the surviving pairs only: fetch shingles by id
    val shingled = df.select(col(idCol).as("__sid"),
      shingleHashes(col(textCol), shingleSize).as("__sh"))
    candidates
      .join(shingled.select(col("__sid").as("id_a"), col("__sh").as("sh_a")), Seq("id_a"))
      .join(shingled.select(col("__sid").as("id_b"), col("__sh").as("sh_b")), Seq("id_b"))
      .withColumn("jaccard", round(
        size(array_intersect(col("sh_a"), col("sh_b"))).cast("double") /
          size(array_union(col("sh_a"), col("sh_b"))).cast("double"), 6))
      .where(col("jaccard") >= jaccardThreshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }

  /** Near-duplicate CLUSTERS: connected components over the near-dup pair
    * graph (large-star/small-star, O(log n) rounds — see DataFramePregel),
    * each cluster keeping its minimum doc id as the canonical survivor.
    * This is the step that turns pairwise candidates into an actionable
    * dedup decision: near-dup relations are not transitive, but training-
    * data pipelines deduplicate by cluster anyway (one survivor per
    * connected group). Docs in no pair cluster alone (they survive).
    * Output: (doc_id, canonical_id, is_canonical). */
  def nearDupClusters(allDocs: DataFrame, idCol: String, pairs: DataFrame,
      idA: String = "id_a", idB: String = "id_b"): DataFrame = {
    val edges = pairs.select(col(idA).as("src"), col(idB).as("dst"))
    val comp = DataFramePregel.connectedComponents(edges)
    allDocs.select(col(idCol).as("doc_id"))
      .join(comp.withColumnRenamed("vid", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("component"), col("doc_id")).as("canonical_id"))
      .withColumn("is_canonical", col("doc_id") === col("canonical_id"))
  }

  // -------------------------------------------------------------- simhash

  /** 64-bit SimHash: per-token 64-bit hash, signed bit-vote across tokens,
    * sign → bit. Implemented as 64 conditional sums over the token array —
    * fully codegen'd column math. */
  def simHash(text: Column): Column =
    // bindOnce: 64 bit-vote aggregates read the token hashes — unbound,
    // the tokenize+hash pass would re-run once per bit position
    bindOnce(transform(split(trim(text), "\\s+"), t => xxhash64(t)), tokenHashes => {
      val bits = (0 until 64).map { i =>
        val votes = aggregate(tokenHashes, lit(0L),
          (acc, h) => acc + when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L)))
        when(votes > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
      }
      bits.reduce((a, b) => a.bitwiseOR(b))
    })

  /** 60-bit SimHash over md5 token hashes — identical vote/sign algebra
    * to [[simHash]], but the per-token hash is the first 15 hex chars of
    * md5 (60 bits, always non-negative), which every engine can compute:
    * DuckDB parses `'0x' || hex` straight to BIGINT, so the whole
    * signature is SQL-replayable and the driver can hash-check it —
    * xxhash64 exists only in Spark. Keep [[simHash]] for production
    * (xxhash64 is several times faster than md5); this variant is the
    * cross-engine-verifiable twin with the same near-dup behavior. */
  def simHashMd5(text: Column, bits: Int = 60): Column = {
    require(bits <= 60, "md5 prefix parses to 60 bits")
    // bindOnce: same bit-vote fan-out as [[simHash]], and the md5 token
    // hash is several times heavier than xxhash64 — re-running it per
    // bit position would be a 60× hash blowup
    bindOnce(transform(split(trim(text), "\\s+"),
        t => conv(substring(md5(t), 1, 15), 16, 10).cast("long")), tokenHashes => {
      val bitCols = (0 until bits).map { i =>
        val votes = aggregate(tokenHashes, lit(0L),
          (acc, h) => acc + when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, lit(1L)).otherwise(lit(-1L)))
        when(votes > 0, shiftleft(lit(1L), i)).otherwise(lit(0L))
      }
      bitCols.reduce((a, b) => a.bitwiseOR(b))
    })
  }

  /** Hamming distance between two 64-bit signatures. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: bucket by the 4 16-bit signature quarters
    * (any pair within hamming distance 3 shares at least one quarter),
    * then verify the full distance.
    *
    * Boilerplate corpora concentrate signatures: one hot (q, qk) bucket of
    * k docs would emit k² candidate rows, so buckets above `maxBucketSize`
    * are dropped before the self-join — the same skew guard as
    * [[minHashLshPairs]]. Docs inside a dropped bucket still pair through
    * any of their three other quarters, so only pairs whose EVERY shared
    * quarter is pathological are lost — at that bucket size they are
    * boilerplate, the thing near-dup dedup exists to collapse. */
  def simHashPairs(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, maxBucketSize: Int = 1000): DataFrame = {
    val sigs = df.select(col(idCol).as("doc_id"), simHash(col(textCol)).as("sig"))
    val quarters = sigs.select(col("doc_id"), col("sig"),
      explode(array((0 until 4).map(q =>
        struct(lit(q).as("q"), shiftright(col("sig"), q * 16).bitwiseAND(lit(0xFFFFL)).as("qk"))): _*)).as("b"))
      .select(col("doc_id"), col("sig"), col("b.q").as("q"), col("b.qk").as("qk"))
    // skew guard: cap quarter-bucket size (boilerplate signature pileup)
    val sized = quarters.withColumn("bucket_n",
      count(lit(1)).over(Window.partitionBy(col("q"), col("qk"))))
      .where(col("bucket_n") <= maxBucketSize)
    val l = sized.select(col("q"), col("qk"), col("doc_id").as("id_a"), col("sig").as("sig_a"))
    val r = sized.select(col("q"), col("qk"), col("doc_id").as("id_b"), col("sig").as("sig_b"))
    l.join(r, Seq("q", "qk")).where(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("hamming", hamming(col("sig_a"), col("sig_b")))
      .where(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  // ------------------------------------------------------- ngram jaccard

  /** Character n-grams of a text column, distinct, as an array column. */
  private[graft] def charGrams(c: Column, n: Int): Column =
    array_distinct(transform(
      sequence(lit(1), greatest(length(c) - (n - 1), lit(1))),
      i => c.substr(i, lit(n))))

  /** Blocking band keys over a minhash signature: one 60-bit md5 key per
    * `bands`-th slice of `rows` slots, with the band index folded INTO the
    * hash input (`"b:slots"`) so keys from different bands can never
    * collide and a single long column is the whole join key. Every value
    * is SQL-replayable (see [[md5Long]]). */
  private[graft] def bandKeysFolded(sig: Column, bands: Int, rows: Int): Column =
    array((0 until bands).map { b =>
      md5Long(concat(lit(s"$b:"), array_join(slice(sig, b * rows + 1, rows), ",")))
    }: _*)

  /** Character n-gram Jaccard similarity over blocked candidate pairs.
    *
    * Blocking is length bucket (±10%, adjacent-bucket probe) AND a shared
    * band of a small minhash over the gram set — length alone concentrates
    * a web corpus into a few hot buckets (document length distributions
    * are tight) and made the self-join quadratic per bucket. The band keys
    * use the engine-portable md5 hash family so an external SQL oracle can
    * replay the complete blocking structure.
    *
    * The blocking join is SIGNATURE-ONLY: it carries (doc_id, len_bucket,
    * band_key) — the gram arrays, which are document-sized, are joined
    * back BY ID only for the surviving candidates' exact-Jaccard verify
    * (the same refactor [[minHashLshPairs]] got). Buckets larger than
    * `maxBucketSize` are dropped before the self-join (boilerplate skew
    * guard, as in minhash/simhash).
    *
    * Recall is governed by the banding: P(candidate | J) =
    * 1 − (1 − J^rows)^bands within a length bucket. The default 8 bands ×
    * 2 rows keeps ≈99.5% recall at J = 0.7; callers screening at a LOW
    * threshold should pass `blockBands = blockHashes` (1-row bands:
    * 1 − (1−J)^16 ≈ 99% at J = 0.25). */
  def ngramJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      n: Int = 4, threshold: Double = 0.7,
      blockHashes: Int = 16, blockBands: Int = 8,
      maxBucketSize: Int = 1000): DataFrame = {
    require(blockHashes % blockBands == 0, "blockBands must divide blockHashes")
    val rows = blockHashes / blockBands
    // per-doc blocking keys: length bucket + minhash band keys over the
    // md5-hashed gram set. The gram arrays themselves stay out of this DF.
    val keyed = df.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .withColumn("len_bucket",
        floor(log(1.1, greatest(length(col("text")), lit(1)).cast("double"))))
      .withColumn("sig",
        minHashSignature(transform(charGrams(col("text"), n), g => md5Long(g)), blockHashes))
      .select(col("doc_id"), col("len_bucket"),
        explode(bandKeysFolded(col("sig"), blockBands, rows)).as("bk"))
    // skew guard: drop pathological content buckets before the self-join
    val sized = keyed.withColumn("bucket_n",
      count(lit(1)).over(Window.partitionBy(col("bk"))))
      .where(col("bucket_n") <= maxBucketSize)
    // one side probes its own AND both adjacent length buckets so
    // near-dups straddling a bucket boundary are still compared
    val l = sized.select(
      explode(array(col("len_bucket") - 1, col("len_bucket"), col("len_bucket") + 1)).as("len_bucket"),
      col("bk"), col("doc_id").as("id_a"))
    val r = sized.select(col("len_bucket"), col("bk"), col("doc_id").as("id_b"))
    val candidates = l.join(r, Seq("len_bucket", "bk")).where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"))
      .dropDuplicates("id_a", "id_b")
    // exact verify on candidates only: gram arrays fetched by id — two
    // id-equi-joins against the corpus, never part of the blocking shuffle
    val grams = df.select(col(idCol).as("__gid"), charGrams(col(textCol), n).as("__g"))
    candidates
      .join(grams.select(col("__gid").as("id_a"), col("__g").as("g_a")), Seq("id_a"))
      .join(grams.select(col("__gid").as("id_b"), col("__g").as("g_b")), Seq("id_b"))
      .withColumn("jaccard", round(
        size(array_intersect(col("g_a"), col("g_b"))).cast("double") /
          size(array_union(col("g_a"), col("g_b"))).cast("double"), 6))
      .where(col("jaccard") >= threshold)
      .select(col("id_a"), col("id_b"), col("jaccard"))
  }
}

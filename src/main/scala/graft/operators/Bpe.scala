package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Byte-pair-encoding tokenizer TRAINING and application, distributed
  * (Sennrich, Haddow & Birch 2016, "Neural Machine Translation of Rare
  * Words with Subword Units"). The reference exporter has no tokenizer —
  * this is part of the training-data-pipeline extension surface: a
  * pretraining pipeline must be able to TRAIN its tokenizer on the corpus
  * it curates, not just count whitespace tokens.
  *
  * == Why this scales ==
  * Classic BPE training (subword-nmt) never iterates over the corpus: it
  * iterates over the DISTINCT-WORD table with frequencies. We do the same,
  * distributed: one corpus-wide shuffle builds `(word, count)` (Heaps' law
  * makes this table orders of magnitude smaller than the corpus — at
  * 100 TB the corpus has ~10¹¹ word occurrences but ~10⁸ distinct words),
  * it is pinned once, and each merge round is then
  *   - a MAP over the pinned word table (apply the merges learned so far,
  *     enumerate adjacent pairs), followed by
  *   - a partial-aggregated `(pair, Σcount)` shuffle — the exchange carries
  *     one row per distinct PAIR per map task, bounded by the pair
  *     vocabulary (≪ word vocabulary), never by data volume, and
  *   - a `TakeOrderedAndProject` top-1 (count desc, pair asc) to the
  *     driver: one ~50-byte row per round.
  * The learned model (the merge list) lives on the driver exactly like
  * [[Similarity.trainIvf]]'s centroids — training is the offline step,
  * application is embarrassingly parallel column math.
  *
  * == Determinism / oracle replayability ==
  * Everything is exact integer counting plus a total-order tie-break
  * (max count, then lexicographically smallest pair), so a DuckDB oracle
  * can re-derive every round's argmax from the same parquet. The trick
  * that makes merge APPLICATION portable: a token sequence [c1..cn] is
  * encoded as the string `"||c1||c2||…||cn||"` (double delimiter), where
  * applying merge (a,b)→ab is EXACTLY the SQL standard
  * `replace(enc, '|a||b|', '|ab|')`: literal replace-all is
  * leftmost-non-overlapping — the same greedy semantics BPE defines for a
  * merge pass — and the double delimiter keeps adjacent matches from
  * consuming each other's boundary (replacing `|a||b|` inside
  * `…||a||b||a||b||…` leaves the outer `|` of each neighbour intact, so
  * the second occurrence still matches). Both engines run the identical
  * replace chain; no engine-private fold semantics to mirror.
  *
  * == Pre-tokenizer contract ==
  * Words are maximal `[a-z]+` or `[0-9]+` runs of the lowercased text
  * (the GPT-2-style regex pre-tokenizer reduced to its letter/digit core —
  * the alphabet then cannot collide with the `|` delimiter or the `>`
  * end-of-word marker), and every word gets a terminal `>` token so
  * merges can learn suffixes without ever crossing word boundaries. */
object Bpe {

  /** One learned merge: at `rank` (1-based), the adjacent pair
    * (`lhs`,`rhs`) had the highest corpus frequency `pairCount` and was
    * fused into the new token `lhs+rhs`. */
  final case class Merge(rank: Int, lhs: String, rhs: String, pairCount: Long) {
    def merged: String = lhs + rhs
  }

  /** A trained tokenizer: merges in training order. */
  final case class BpeModel(merges: Seq[Merge])

  private[graft] val WordPattern = "[a-z]+|[0-9]+"

  /** `(word, cnt)` over the corpus — the one corpus-wide pass of training
    * (and the reduction that makes everything after it vocabulary-sized). */
  def wordCounts(df: DataFrame, textCol: String): DataFrame =
    df.select(explode(expr(
        s"regexp_extract_all(lower($textCol), '$WordPattern', 0)")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))

  /** Double-delimiter encoding of a word column: "cat" → "||c||a||t||>||". */
  private[graft] def encode(word: Column): Column =
    concat(lit("||"), regexp_replace(word, "(.)", "$1||"), lit(">||"))

  /** The merge chain applied to an encoded column — a nest of codegen'd
    * `StringReplace`s, identical to the oracle's `replace(…)` nest. */
  private[graft] def applyMerges(enc: Column, merges: Seq[Merge]): Column =
    merges.foldLeft(enc) { (c, m) =>
      call_function("replace", c,
        lit(s"|${m.lhs}||${m.rhs}|"), lit(s"|${m.merged}|"))
    }

  /** Tokens of an encoded column, in order. */
  private[graft] def tokens(enc: Column): Column =
    filter(split(enc, "\\|\\|"), t => t =!= "")

  /** Adjacent pairs of an encoded column as `"lhs rhs"` strings. The space
    * joiner sorts below every alphabet char ([a-z0-9>]), so ordering by
    * the pair STRING equals ordering by the (lhs, rhs) tuple — one
    * groupBy key, tuple tie-break semantics. */
  private[graft] def adjacentPairs(enc: Column): Column = {
    val t = tokens(enc)
    zip_with(
      slice(t, lit(1), size(t) - 1),
      slice(t, lit(2), size(t) - 1),
      (a, b) => concat(a, lit(" "), b))
  }

  /** Train `numMerges` merges on the corpus. One corpus shuffle (the word
    * table), then `numMerges` vocabulary-sized rounds (see object doc).
    * Stops early only if the corpus runs out of adjacent pairs. */
  def train(df: DataFrame, textCol: String, numMerges: Int): BpeModel = {
    val words = wordCounts(df, textCol)
      .select(encode(col("w")).as("enc"), col("cnt"))
      .localCheckpoint() // loop-invariant pin: vocabulary-sized, not corpus-sized
    try {
      val merges = scala.collection.mutable.ArrayBuffer.empty[Merge]
      var exhausted = false
      while (merges.length < numMerges && !exhausted) {
        val top = words
          .select(col("cnt"),
            explode(adjacentPairs(applyMerges(col("enc"), merges.toSeq))).as("pair"))
          .groupBy("pair").agg(sum("cnt").as("c"))
          .orderBy(col("c").desc, col("pair").asc)
          .limit(1)
          .collect()
        if (top.isEmpty) exhausted = true
        else {
          val Array(l, r) = top(0).getString(0).split(" ", 2)
          merges += Merge(merges.length + 1, l, r, top(0).getLong(1))
        }
      }
      BpeModel(merges.toSeq)
    } finally {
      org.apache.spark.sql.graft.DatasetBridge.unpersistCheckpoint(words)
    }
  }

  /** The learned merge table as a DataFrame — training made queryable. */
  def mergeTable(spark: org.apache.spark.sql.SparkSession,
      model: BpeModel): DataFrame = {
    import spark.implicits._
    model.merges.map(m => (m.rank, m.lhs, m.rhs, m.merged, m.pairCount))
      .toDF("rank", "lhs", "rhs", "merged", "pair_count")
  }

  /** Corpus-wide token frequencies under the trained tokenizer, top
    * `topN` by (count desc, token asc). Runs on the distinct-word table —
    * vocabulary-sized work regardless of corpus size. */
  def tokenFrequencies(df: DataFrame, textCol: String, model: BpeModel,
      topN: Int): DataFrame =
    wordCounts(df, textCol)
      .select(col("cnt"),
        explode(tokens(applyMerges(encode(col("w")), model.merges))).as("token"))
      .groupBy("token").agg(sum("cnt").as("n_occ"))
      .orderBy(col("n_occ").desc, col("token").asc)
      .limit(topN)

  /** Per-document token counts under the trained tokenizer — the "how
    * many tokens is this document" pipeline primitive, with a REAL
    * (trained) tokenizer rather than the whitespace/BPE-ish heuristics of
    * [[TextAnalysis.tokenCount]]. Purely map-side per document. */
  def docTokenCounts(df: DataFrame, idCol: String, textCol: String,
      model: BpeModel): DataFrame =
    df.select(col(idCol),
        expr(s"regexp_extract_all(lower($textCol), '$WordPattern', 0)").as("__ws"))
      .select(col(idCol),
        coalesce(
          aggregate(
            transform(col("__ws"),
              w => size(tokens(applyMerges(encode(w), model.merges)))),
            lit(0L), (acc, x) => acc + x),
          lit(0L)).as("n_tokens"))
}

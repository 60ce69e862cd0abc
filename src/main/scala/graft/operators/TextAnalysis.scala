package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis column functions (SURVEY §2.8) — all built from codegen'd
  * `org.apache.spark.sql.functions`, no UDFs, so they stay inside
  * whole-stage codegen and scale linearly with input bytes.
  */
object TextAnalysis {

  /** Whitespace token count; empty/blank text counts 0. */
  def tokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** Tokens of a BPE-ish segmentation: runs of word chars, runs of digits,
    * or single non-space punctuation — a cheap proxy for subword token
    * pressure. */
  def bpeishTokenCount(text: Column): Column =
    when(length(trim(text)) === 0, lit(0))
      .otherwise(size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))))

  def charCount(text: Column): Column = length(text)

  /** Count of characters matching a regex character class. */
  def classCount(text: Column, clazz: String): Column =
    length(text) - length(regexp_replace(text, clazz, ""))

  def punctCount(text: Column): Column = classCount(text, "[.,!?;:]")
  def digitCount(text: Column): Column = classCount(text, "[0-9]")
  def upperCount(text: Column): Column = classCount(text, "[A-Z]")
  def whitespaceCount(text: Column): Column = classCount(text, "\\s")

  /** Ratio helpers return NULL-safe doubles rounded to 6 digits so both
    * engines agree bit-for-bit after identical rounding. */
  private def ratio(num: Column, den: Column): Column =
    round(when(den === 0, lit(0.0)).otherwise(num.cast("double") / den.cast("double")), 6)

  def punctRatio(text: Column): Column = ratio(punctCount(text), charCount(text))
  def digitRatio(text: Column): Column = ratio(digitCount(text), charCount(text))
  def upperRatio(text: Column): Column = ratio(upperCount(text), charCount(text))
  def whitespaceRatio(text: Column): Column = ratio(whitespaceCount(text), charCount(text))

  /** Fraction of tokens that are in the given stopword list. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val toks = split(trim(text), "\\s+")
    val stops = array(stopwords.map(lit): _*)
    ratio(size(filter(toks, t => array_contains(stops, t))), tokenCount(text))
  }

  val EnglishStopwords: Seq[String] =
    Seq("the", "a", "an", "and", "or", "of", "to", "in", "is", "it", "that", "for", "on", "with", "as")

  /** Composite quality score in [0,1]: long-enough, low punctuation
    * density, has stopwords (fluent-text prior), few digits. */
  def qualityScore(text: Column, stopwords: Seq[String] = EnglishStopwords): Column = {
    val lenScore = least(charCount(text).cast("double") / 200.0, lit(1.0))
    val punctPenalty = least(punctRatio(text) * 5.0, lit(1.0))
    val digitPenalty = least(digitRatio(text) * 5.0, lit(1.0))
    val stopScore = least(stopwordRatio(text, stopwords) * 4.0, lit(1.0))
    round((lenScore * 0.4 + stopScore * 0.3 + (lit(1.0) - punctPenalty) * 0.15
      + (lit(1.0) - digitPenalty) * 0.15), 6)
  }

  // ---------------------------------------------------------- language id

  /** Stopword profiles for the language-ID heuristic: the most frequent
    * function words of each language (public lists). */
  val LanguageProfiles: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "an", "and", "of", "to", "in", "is", "it", "that", "for", "on", "with", "was", "as"),
    "fr" -> Seq("le", "la", "les", "de", "des", "et", "un", "une", "du", "en", "est", "que", "qui", "dans", "pour"),
    "es" -> Seq("el", "la", "los", "las", "de", "y", "un", "una", "en", "es", "que", "del", "se", "por", "con"),
    "de" -> Seq("der", "die", "das", "und", "ein", "eine", "von", "zu", "mit", "ist", "den", "im", "für", "auf", "nicht"),
    "it" -> Seq("il", "la", "le", "di", "e", "un", "una", "che", "per", "del", "della", "con", "sono", "non", "in"))

  /** CJK-character ratio — script detection for zh/ja/ko, which stopword
    * lists cannot cover (no whitespace tokenization). */
  def cjkRatio(text: Column): Column =
    ratio(classCount(text, "[\\u4e00-\\u9fff\\u3040-\\u30ff\\uac00-\\ud7af]"), charCount(text))

  /** N-gram/stopword-profile language ID: score each profile by stopword
    * hit ratio; CJK script wins outright above 20% CJK characters;
    * `und` (undetermined) when no profile scores. All codegen'd column
    * math — per-language scores are parallel array ops over one token
    * split. */
  def languageId(text: Column, profiles: Map[String, Seq[String]] = LanguageProfiles): Column = {
    val toks = split(lower(trim(text)), "\\s+")
    val scored = profiles.toSeq.sortBy(_._1).map { case (lang, words) =>
      val stops = array(words.map(lit): _*)
      struct(ratio(size(filter(toks, t => array_contains(stops, t))), size(toks)).as("score"),
        lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(cjkRatio(text) > 0.2, lit("zh"))
      .when(best.getField("score") > 0.0, best.getField("lang"))
      .otherwise(lit("und"))
  }

  // -------------------------------------------------- repetition quality

  /** Gopher-style repetition signals (Rae et al. 2021, "Scaling Language
    * Models", App. A quality filters): heavily repetitive documents are
    * low-quality training data even when every other signal looks fine.
    * Per document: token counts, duplicate-token fraction, and the most
    * frequent word bigram with its occurrence count and fraction of all
    * bigrams (ties → lexicographically smallest bigram, deterministic).
    * The bigram count is one explode + two aggregations keyed by (doc,
    * bigram) — shuffles carry (id, bigram) pairs, never documents. */
  def repetitionStats(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = df.select(col(idCol), split(trim(col(textCol)), "\\s+").as("__toks"))
      .withColumn("n_tokens", size(col("__toks")).cast("long"))
      .withColumn("n_distinct_tokens", size(array_distinct(col("__toks"))).cast("long"))
    val bigrams = base.select(col(idCol),
      explode(transform(
        slice(col("__toks"), lit(1), greatest(size(col("__toks")) - 1, lit(0))),
        (t, i) => concat(t, lit(" "), get(col("__toks"), i + 1)))).as("bigram"))
    // deterministic argmax: min(struct(-n, bigram)) = highest count, then
    // lexicographically smallest bigram
    val top = bigrams.groupBy(col(idCol), col("bigram")).agg(count(lit(1)).as("n"))
      .groupBy(col(idCol))
      .agg(min(struct((-col("n")).as("negn"), col("bigram").as("bigram"))).as("m"))
      .select(col(idCol), col("m.bigram").as("top_bigram"), (-col("m.negn")).as("top_bigram_n"))
    base.join(top, Seq(idCol), "left")
      .select(col(idCol), col("n_tokens"), col("n_distinct_tokens"),
        ratio(col("n_tokens") - col("n_distinct_tokens"), col("n_tokens")).as("dup_token_frac"),
        col("top_bigram"),
        coalesce(col("top_bigram_n"), lit(0L)).as("top_bigram_n"),
        when(col("n_tokens") <= 1, lit(0.0))
          .otherwise(ratio(coalesce(col("top_bigram_n"), lit(0L)), col("n_tokens") - 1))
          .as("top_bigram_frac"))
  }

  // ------------------------------------------------------- PII redaction

  /** PII patterns kept RE2-compatible (simple classes, no lookaround) so
    * the DuckDB oracle applies the identical regexes. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "\\+?[0-9][-0-9 ()]{6,}[0-9]"

  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailPattern), lit(0))).cast("long")

  /** Phone counting runs on email-redacted text: digit runs inside an
    * email's local part must not double-count as phone numbers. */
  def phoneCount(emailRedacted: Column): Column =
    size(regexp_extract_all(emailRedacted, lit(PhonePattern), lit(0))).cast("long")

  def redactEmails(text: Column): Column =
    regexp_replace(text, EmailPattern, "<EMAIL>")

  /** Redact emails then phone numbers with typed sentinels — the
    * pre-training PII scrub pass. Pure regexp_replace: codegen'd,
    * linear in input bytes, no UDFs. */
  def redactPii(text: Column): Column =
    regexp_replace(redactEmails(text), PhonePattern, "<PHONE>")

  // -------------------------------------------------------- fingerprints

  /** Rolling-hash document fingerprint: xxhash64 over the document's
    * normalized (lowercased, whitespace-collapsed) content. Stable under
    * formatting noise, unlike a raw byte hash. */
  def fingerprint(text: Column): Column =
    xxhash64(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** md5 variant of the normalized-content fingerprint — same stability
    * properties, reproducible by engines without xxhash64 (DuckDB oracle). */
  def fingerprintMd5(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Winnowing-style k-gram min-sketch: the `sketchSize` smallest xxhash64
    * values over word k-grams — a compact, order-insensitive fingerprint
    * for containment/overlap detection at corpus scale. */
  def fingerprintSketch(text: Column, k: Int = 5, sketchSize: Int = 16): Column =
    slice(array_sort(Dedup.shingleHashes(text, k)), 1, sketchSize)

  // ------------------------------------------------------------- splits

  /** Deterministic train/val/test split assignment: md5 of the id's first
    * byte → bucket 0-255 → named split by cumulative bucket weights.
    * Hash-based (not random): the same document lands in the same split
    * on every run, across reshards, and across engines — the property a
    * reproducible training pipeline needs. All codegen'd column math. */
  def splitAssign(id: Column, weights: Seq[(String, Int)]): Column = {
    require(weights.map(_._2).sum == 256,
      s"split weights must sum to 256 buckets, got ${weights.map(_._2).sum}")
    val bucket = conv(substring(md5(id.cast("string")), 1, 2), 16, 10).cast("int")
    val bounds = weights.scanLeft(0) { case (acc, (_, w)) => acc + w }.tail
    weights.zip(bounds).foldRight(lit(weights.last._1): Column) {
      case (((name, _), upper), rest) => when(bucket < upper, lit(name)).otherwise(rest)
    }
  }

  /** Exact train-set contamination in an evaluation split: eval docs whose
    * normalized-content fingerprint also appears in the train split. ONE
    * equi-join on the 32-char digest — the decontamination primitive run
    * before every training job; near-dup contamination composes the same
    * way from [[Dedup.minHashLshPairs]] candidates. */
  def contamination(df: DataFrame, idCol: String, textCol: String,
      splitCol: String, trainSplit: String, evalSplit: String): DataFrame = {
    val fp = df.select(col(idCol), col(splitCol),
      fingerprintMd5(col(textCol)).as("__fp"))
    val train = fp.where(col(splitCol) === trainSplit)
      .select(col("__fp")).distinct()
    fp.where(col(splitCol) === evalSplit)
      .join(train, Seq("__fp"), "left_semi")
      .select(col(idCol), col("__fp").as("fingerprint_md5"))
  }
}

package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class TextAnalysisSpec extends SparkTestBase {
  import spark.implicits._

  test("token count: hand-computed cases") {
    val df = Seq("a b  c", "", "   ", "one").toDF("t")
    val got = df.select(TextAnalysis.tokenCount(col("t"))).as[Int].collect()
    assert(got.toSeq == Seq(3, 0, 0, 1))
  }

  test("featureHash: fixed dims, signed counts, deterministic") {
    val df = Seq((1L, "alpha alpha beta"), (2L, "alpha alpha beta"),
      (3L, "gamma")).toDF("doc_id", "text")
    val rows = TextAnalysis.featureHash(df, "doc_id", "text", dims = 8)
      .collect().map(r => r.getLong(0) -> (1 to 8).map(r.getLong(_))).toMap
    // identical docs hash identically
    assert(rows(1L) == rows(2L))
    // the L1 norm is at most the token count (equal absent sign-cancel
    // collisions; 'alpha'/'beta' land somewhere with weight 2 and 1)
    assert(rows(1L).map(math.abs).sum <= 3 && rows(1L).map(math.abs).sum >= 1)
    assert(rows(1L).count(_ != 0L) <= 2)
    // single-token doc: exactly one dimension at ±1
    assert(rows(3L).map(math.abs).sum == 1)
  }

  test("bpe-ish token count splits words, digits, punctuation") {
    val df = Seq("hello, world 42!").toDF("t")
    // tokens: hello , world 42 ! → 5
    assert(df.select(TextAnalysis.bpeishTokenCount(col("t"))).as[Int].head() == 5)
  }

  test("ratios: hand-computed on 'ab, cd!'") {
    // chars=7, punct(, !)=2, ws=1 → punct 2/7, ws 1/7
    val df = Seq("ab, cd!").toDF("t")
    val r = df.select(
      TextAnalysis.punctRatio(col("t")),
      TextAnalysis.whitespaceRatio(col("t"))).as[(Double, Double)].head()
    assert(r._1 == 0.285714)
    assert(r._2 == 0.142857)
  }

  test("stopword ratio") {
    val df = Seq("the cat sat on the mat").toDF("t")
    // stopwords: the, on, the → 3/6
    val got = df.select(TextAnalysis.stopwordRatio(col("t"), TextAnalysis.EnglishStopwords))
      .as[Double].head()
    assert(got == 0.5)
  }

  test("language id on real sentences") {
    val df = Seq(
      ("en", "the cat is on the table and it is happy"),
      ("fr", "le chat est sur la table et il est dans la maison"),
      ("es", "el gato es un animal que vive en la casa con los otros"),
      ("de", "der hund und die katze sind nicht mit dem kind im haus"),
      ("zh", "今天天气很好我们一起去公园散步吧这是一个测试")).toDF("expected", "text")
    val got = df.select(col("expected"), TextAnalysis.languageId(col("text")))
      .as[(String, String)].collect()
    got.foreach { case (exp, pred) => assert(pred == exp, s"expected $exp got $pred") }
  }

  test("fingerprint is stable under whitespace noise, distinct for different content") {
    val df = Seq("Hello   World", "hello world", "goodbye world").toDF("t")
    val fps = df.select(TextAnalysis.fingerprint(col("t"))).as[Long].collect()
    assert(fps(0) == fps(1))
    assert(fps(0) != fps(2))
  }

  test("split assignment: deterministic, complete, weight-proportional-ish") {
    val df = (0L until 1000L).toDF("id")
    val weights = Seq("train" -> 204, "val" -> 26, "test" -> 26)
    val counts = df.select(TextAnalysis.splitAssign(col("id"), weights).as("s"))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(counts.keySet == Set("train", "val", "test"))
    assert(counts.values.sum == 1000)
    // ~80/10/10 with hash noise
    assert(counts("train") > 700 && counts("val") > 50 && counts("test") > 50)
    // deterministic: same ids → identical assignment
    val again = df.select(TextAnalysis.splitAssign(col("id"), weights).as("s"))
      .groupBy("s").count().as[(String, Long)].collect().toMap
    assert(again == counts)
    intercept[IllegalArgumentException](TextAnalysis.splitAssign(col("id"), Seq("a" -> 100)))
  }

  test("contamination: leaked eval docs found, clean ones not") {
    val df = Seq(
      (1L, "shared content here", "train"),
      (2L, "other train doc", "train"),
      (10L, "Shared   CONTENT here", "eval"), // normalized match → leak
      (11L, "genuinely new eval doc", "eval"))
      .toDF("doc_id", "text", "split")
    val got = TextAnalysis.contamination(df, "doc_id", "text", "split", "train", "eval")
      .select("doc_id").as[Long].collect().toSeq
    assert(got == Seq(10L))
  }

  test("fuzzy contamination: edited leaks caught, exact check blind to them") {
    val base = "the quick brown fox jumps over the lazy dog and runs far away into the green forest tonight"
    val df = Seq(
      (1L, base, "train"),
      (2L, "other train doc about completely different things entirely", "train"),
      (10L, base + " suffix", "eval"), // edited leak: exact fp differs
      (11L, "genuinely new eval content nothing like the training corpus at all here", "eval"))
      .toDF("doc_id", "text", "split")
    // the exact check misses the edited copy...
    assert(TextAnalysis.contamination(df, "doc_id", "text", "split", "train", "eval").count() == 0)
    // ...the fuzzy one flags it, and only it
    val got = TextAnalysis.contaminationFuzzy(df, "doc_id", "text", "split", "train", "eval")
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got == Set((10L, 1L, true), (11L, 0L, false)))
  }

  test("duplicated spans: shared boilerplate flagged, unique text not") {
    val header = "alpha beta gamma delta epsilon zeta eta theta iota kappa" // 10 tokens
    val df = Seq(
      (1L, header + " unique tail one here today"),
      (2L, header + " different ending entirely now"),
      (3L, "completely unrelated words with no shared spans at all in this document"))
      .toDF("doc_id", "text")
    val got = TextAnalysis.duplicatedSpans(df, "doc_id", "text", windowTokens = 10)
      .as[(Long, Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // docs 1/2: 15/14 tokens → 6/5 distinct windows; only the pure-header
    // window (offset 0) is shared — later windows differ by their tails
    assert(got(1L)._2 == 6 && got(1L)._3 == 1)
    assert(got(2L)._2 == 5 && got(2L)._3 == 1)
    assert(got(3L)._3 == 0 && got(3L)._4 == 0.0)
    assert(math.abs(got(1L)._4 - 1.0 / 6.0) < 1e-6)
  }

  test("quality score ranges and ordering") {
    val good = "the quick brown fox jumps over the lazy dog and it runs through the forest with a friend " * 3
    val bad = "1234 5678 !!!! ???? 9999"
    val df = Seq(good, bad).toDF("t")
    val q = df.select(TextAnalysis.qualityScore(col("t"))).as[Double].collect()
    assert(q(0) > q(1))
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("repetition stats: hand-computed bigram dominance and duplicate fraction") {
    // "a b a b a b c": 7 tokens, 3 distinct, bigrams = [a b, b a, a b, b a, a b, b c]
    // → top bigram "a b" ×3 of 6 bigrams
    val df = Seq((1L, "a b a b a b c"), (2L, "x y z")).toDF("doc_id", "text")
    val got = TextAnalysis.repetitionStats(df, "doc_id", "text")
      .as[(Long, Long, Long, Double, String, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == ((1L, 7L, 3L, 0.571429, "a b", 3L, 0.5)))
    // no repeated bigram: deterministic tie-break picks the smallest
    assert(got(2L) == ((2L, 3L, 3L, 0.0, "x y", 1L, 0.5)))
  }

  test("chunking: full coverage, overlap, short tail") {
    val text = "x" * 350
    val got = TextAnalysis.chunk(Seq((1L, text)).toDF("doc_id", "text"),
      "doc_id", "text", size = 200, stride = 150)
      .select("chunk_id", "n_chars").as[(Long, Long)].collect().sortBy(_._1)
    // starts 1, 151, 301 → lengths 200, 200, 50
    assert(got.toSeq == Seq((0L, 200L), (1L, 200L), (2L, 50L)))
    // empty docs produce no chunks
    assert(TextAnalysis.chunk(Seq((2L, "")).toDF("doc_id", "text"), "doc_id", "text").count() == 0)
  }

  test("unigram logprob: hand-computed corpus frequencies") {
    // freq: a=3, b=2, total=5; -ln(3/5)→0.510826, -ln(2/5)→0.916291
    // doc1 = (3·0.510826 + 0.916291)/4 = 0.61219225 (UNROUNDED mean —
    // the exact-decimal sum / count quotient lands on decimal
    // half-boundaries routinely, where Spark and DuckDB round apart;
    // see bigramLogprob scaladoc); doc2 = 0.916291
    val df = Seq((1L, "a a a b"), (2L, "b")).toDF("doc_id", "text")
    val got = TextAnalysis.unigramLogprob(df, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(got(1L) == ((4L, 2.448769 / 4)))
    assert(got(2L) == ((1L, 0.916291)))
  }

  test("temperature sampling flattens the language mix deterministically") {
    val df = (0 until 80).map(i => (i.toLong, "en")) ++ (80 until 100).map(i => (i.toLong, "fr"))
    val got = TextAnalysis.temperatureSample(df.toDF("doc_id", "lang"), "doc_id", "lang")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // the rare language keeps everything (threshold saturates at 256);
    // the dominant language is downsampled
    assert(got("fr")._3 == 256L && got("fr")._4 == 20L)
    assert(got("en")._3 < 256L && got("en")._4 < 80L && got("en")._4 > 0L)
    // deterministic: same input → identical sample
    val again = TextAnalysis.temperatureSample(df.toDF("doc_id", "lang"), "doc_id", "lang")
      .as[(String, Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    assert(again == got)
  }

  test("character entropy: hand-computed, uniform text scores 0, empty scores 0") {
    val df = Seq((1L, "aabb"), (2L, "aaaa"), (3L, ""), (4L, "abcd")).toDF("doc_id", "text")
    val got = TextAnalysis.charEntropy(df, "doc_id", "text")
      .as[(Long, Double)].collect().toMap
    // "aabb": -2*round(0.5*ln(0.5), 6) = 0.693148 (quantized ln 2)
    assert(got(1L) == 0.693148)
    assert(got(2L) == 0.0 && got(3L) == 0.0)
    // "abcd": 4 classes at p=0.25 -> ln 4 quantized
    assert(math.abs(got(4L) - math.log(4.0)) < 1e-5)
  }

  test("bigram logprob: smoothed corpus model, order sensitivity, short docs excluded") {
    // corpus: "a b a" + "a b" + "solo" -> c1(a)=3, c1(b)=2, c1(solo)=1,
    // V=3; c2(a,b)=2, c2(b,a)=1
    val df = Seq((1L, "a b a"), (2L, "a b"), (3L, "solo")).toDF("doc_id", "text")
    val got = TextAnalysis.bigramLogprob(df, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    // doc1: -ln((2+1)/(3+3)) + -ln((1+1)/(2+3)) averaged
    val expected1 = (math.rint(-math.log(3.0 / 6.0) * 1e6) / 1e6 +
      math.rint(-math.log(2.0 / 5.0) * 1e6) / 1e6) / 2
    assert(got(1L)._2 == 2L && math.abs(got(1L)._3 - expected1) < 1e-6)
    assert(got(2L)._2 == 1L)
    // a seen-bigram doc scores lower (more natural) than doc2 reversed
    // would; single-token docs have no bigrams and are excluded
    assert(!got.contains(3L))
    // order sensitivity: unseen bigram (b,b) scores above seen (a,b)
    val probe = TextAnalysis.bigramLogprob(
      Seq((1L, "a b a"), (2L, "a b"), (10L, "b b")).toDF("doc_id", "text"),
      "doc_id", "text").as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(probe(10L) > probe(2L))
  }

  test("pii redaction: emails then phones, counts match replacements") {
    val df = Seq(
      (1L, "mail me at jane.doe+x@corp.example.org or call +1 (555) 010-9988 today"),
      (2L, "no pii here at all"))
      .toDF("doc_id", "text")
    val red = df.select(col("doc_id"),
      TextAnalysis.emailCount(col("text")).as("ne"),
      TextAnalysis.phoneCount(TextAnalysis.redactEmails(col("text"))).as("np"),
      TextAnalysis.redactPii(col("text")).as("r"))
      .as[(Long, Long, Long, String)].collect().map(r => r._1 -> r).toMap
    assert(red(1L)._2 == 1L && red(1L)._3 == 1L)
    assert(red(1L)._4 == "mail me at <EMAIL> or call <PHONE> today")
    assert(red(2L) == ((2L, 0L, 0L, "no pii here at all")))
  }
}

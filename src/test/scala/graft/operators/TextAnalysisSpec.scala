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

  test("quality score ranges and ordering") {
    val good = "the quick brown fox jumps over the lazy dog and it runs through the forest with a friend " * 3
    val bad = "1234 5678 !!!! ???? 9999"
    val df = Seq(good, bad).toDF("t")
    val q = df.select(TextAnalysis.qualityScore(col("t"))).as[Double].collect()
    assert(q(0) > q(1))
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
  }
}

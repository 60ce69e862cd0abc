package graft.operators

import graft.SparkTestBase

class TextClassifierSpec extends SparkTestBase {
  import spark.implicits._

  // train: class a = {"cat cat dog", "cat"} (4 tokens), b = {"dog dog"}
  // (2 tokens); vocab = {cat, dog} = 2
  private def train() = Seq(
    (1L, "cat cat dog", "a"), (2L, "cat", "a"), (3L, "dog dog", "b"))
    .toDF("id", "text", "cls")

  test("class stats: counts, priors and defaults, hand-computed") {
    val stats = TextClassifier.nbClassStats(train(), "text", "cls")
      .as[(String, Long, Long, Long, BigDecimal, BigDecimal)]
      .collect().map(r => r._1 -> r).toMap
    assert(stats("a")._2 == 2L && stats("a")._3 == 4L && stats("a")._4 == 2L)
    assert(stats("b")._2 == 1L && stats("b")._3 == 2L && stats("b")._4 == 2L)
    // prior(a) = round(ln(2/3), 6); dflt(a) = round(ln(1/(4+2)), 6)
    assert(stats("a")._5 == BigDecimal("-0.405465"))
    assert(stats("a")._6 == BigDecimal("-1.791759"))
    assert(stats("b")._5 == BigDecimal("-1.098612"))
    assert(stats("b")._6 == BigDecimal("-1.386294"))
  }

  test("predictions: seen, cross-class, unseen and empty docs, hand-computed") {
    // "cat cat": a = ln(2/3) + 2*ln(4/6) beats b (cat unseen in b)
    // "dog":     b = ln(1/3) + ln(3/4) = -1.386294 beats a's -1.504077
    // "zzz":     all-unseen -> a (-2.197224) beats b (-2.484906)
    // "":        zero tokens -> priors only -> a
    val test = Seq((10L, "cat cat"), (11L, "dog"), (12L, "zzz"), (13L, ""))
      .toDF("id", "text")
    val got = TextClassifier.nbPredict(train(), test, "id", "text", "cls")
      .as[(Long, String)].collect().toMap
    assert(got == Map(10L -> "a", 11L -> "b", 12L -> "a", 13L -> "a"))
  }

  test("score ties break to the smaller class label") {
    // symmetric training data: "x" scores identically under both classes
    val t = Seq((1L, "x", "b"), (2L, "x", "a")).toDF("id", "text", "cls")
    val got = TextClassifier.nbPredict(t, Seq((9L, "x")).toDF("id", "text"),
      "id", "text", "cls").as[(Long, String)].collect().toMap
    assert(got == Map(9L -> "a"))
  }
}

package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** BPE training on hand-computed corpora: merge order (incl. the
  * leftmost-non-overlapping run semantics and the count-then-lexicographic
  * tie-break), token frequencies, per-doc token counts, early exhaustion. */
class BpeSpec extends SparkTestBase {
  import spark.implicits._

  private def corpus(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")

  test("merge order: counts, overlap semantics, and the pair tie-break") {
    // words: "aaa"×2 (pairs aa:2/word) and "ab"×3.
    // round 1: (a,a)=4 beats (a,b)=3 — frequency.
    // round 2: "aaa"→[aa,a,>] (LEFTMOST non-overlap: one merge per run of 3),
    //          (a,b)=3 ties (b,>)=3 → lexicographic: "a b" < "b >".
    // round 3: "ab"→[ab,>], (ab,>)=3 wins.
    val model = Bpe.train(corpus("aaa aaa", "ab ab ab"), "text", 3)
    assert(model.merges.map(m => (m.rank, m.lhs, m.rhs, m.pairCount)) ==
      Seq((1, "a", "a", 4L), (2, "a", "b", 3L), (3, "ab", ">", 3L)))
  }

  test("token frequencies under the trained model, (count desc, token asc)") {
    val docs = corpus("aaa aaa", "ab ab ab")
    val model = Bpe.train(docs, "text", 3)
    // "aaa"(×2) → [aa, a, >]; "ab"(×3) → [ab>]
    val freq = Bpe.tokenFrequencies(docs, "text", model, 10)
      .as[(String, Long)].collect().toSeq
    assert(freq == Seq(("ab>", 3L), (">", 2L), ("a", 2L), ("aa", 2L)))
  }

  test("per-doc token counts; wordless and empty docs count zero") {
    val docs = corpus("aaa aaa", "ab ab ab", "", "?!... --")
    val model = Bpe.train(docs, "text", 3)
    val n = Bpe.docTokenCounts(docs, "doc_id", "text", model)
      .as[(Long, Long)].collect().toMap
    assert(n == Map(0L -> 6L, 1L -> 3L, 2L -> 0L, 3L -> 0L))
  }

  test("training stops when the corpus runs out of adjacent pairs") {
    val model = Bpe.train(corpus("a a a"), "text", 5)
    // "a" → [a,>] → merge (a,>); then every word is a single token.
    assert(model.merges.map(m => (m.lhs, m.rhs)) == Seq(("a", ">")))
  }

  test("digits and case folding follow the pre-tokenizer contract") {
    // "A1a" lowercases then splits to letter/digit runs: ["a","1","a"].
    val model = Bpe.train(corpus("A1a A1a"), "text", 1)
    // pairs: (a,>)=4 from the two single-letter 'a' runs... plus (1,>)=2.
    assert(model.merges.head.lhs == "a" && model.merges.head.rhs == ">")
    val n = Bpe.docTokenCounts(corpus("A1a"), "doc_id", "text", model)
      .select("n_tokens").as[Long].head()
    // words a,1,a → [a>], [1,>], [a>] = 4 tokens
    assert(n == 4L)
  }

  test("mergeTable schema and content round-trip") {
    val docs = corpus("ab ab")
    val model = Bpe.train(docs, "text", 2)
    val rows = Bpe.mergeTable(spark, model)
      .as[(Int, String, String, String, Long)].collect().toSeq
    assert(rows == model.merges.map(m => (m.rank, m.lhs, m.rhs, m.merged, m.pairCount)))
  }
}

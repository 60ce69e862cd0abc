package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.Row

class DsirSpec extends SparkTestBase {
  import spark.implicits._

  private val raw = Seq(
    (1L, "the quick brown fox jumps"),
    (2L, "the quick brown dog runs"),
    (3L, "zzz qqq www kkk jjj"),
    (4L, "vvv nnn mmm ppp rrr"),
    (5L, "the quick brown cat sits")).toDF("doc_id", "text")
  private val target = Seq(
    (100L, "the quick brown bear sleeps"),
    (101L, "the quick brown wolf howls")).toDF("doc_id", "text")

  test("target-like documents get higher importance weights") {
    val out = TextAnalysis.dsirSelect(raw, target, "doc_id", "text",
      buckets = 64, topK = 5).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val likeTarget = Seq(1L, 2L, 5L).map(out)
    val unlike = Seq(3L, 4L).map(out)
    assert(likeTarget.min > unlike.max,
      s"target-like docs should outweigh gibberish: $out")
  }

  test("n_feats = unigrams + bigrams; ranks dense from 1; deterministic") {
    val run1 = TextAnalysis.dsirSelect(raw, target, "doc_id", "text",
      buckets = 64, topK = 3).collect()
    assert(run1.length == 3)
    assert(run1.map(_.getLong(4)).toSeq == Seq(1L, 2L, 3L))
    // every doc has 5 tokens → 5 unigrams + 4 bigrams = 9 features
    assert(run1.forall(_.getLong(1) == 9L))
    val run2 = TextAnalysis.dsirSelect(raw, target, "doc_id", "text",
      buckets = 64, topK = 3).collect()
    assert(run1.map(_.toSeq).toSeq == run2.map(_.toSeq).toSeq)
  }

  test("weights shift with the target: swapping the exemplar flips the ordering") {
    val gibberishTarget = Seq((200L, "zzz qqq www nnn mmm")).toDF("doc_id", "text")
    val out = TextAnalysis.dsirSelect(raw, gibberishTarget, "doc_id", "text",
      buckets = 64, topK = 5).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(Seq(3L, 4L).map(out).min > Seq(1L, 2L, 5L).map(out).max)
  }

  test("empty text contributes no features and survives") {
    val withEmpty = raw.unionAll(Seq((9L, "")).toDF("doc_id", "text"))
    val out = TextAnalysis.dsirSelect(withEmpty, target, "doc_id", "text",
      buckets = 64, topK = 10).collect()
    // the empty doc has no (doc_id, bucket) rows → absent from scores
    assert(out.length == 5 && !out.exists(_.getLong(0) == 9L))
  }
}

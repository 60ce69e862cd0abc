package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class SetSimJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def bruteJaccard(docs: Seq[(Long, String)], t: Double): Set[(Long, Long, Double)] = {
    val sets = docs.map { case (id, s) =>
      id -> s.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSet
    }
    (for {
      (ia, sa) <- sets; (ib, sb) <- sets if ia < ib
      inter = (sa & sb).size
      j = inter.toDouble / (sa.size + sb.size - inter)
      if j >= t
    } yield (ia, ib, j)).toSet
  }

  test("jaccardJoin is exact: matches brute force on a mixed corpus") {
    val docs = Seq(
      (1L, "the quick brown fox jumps"),
      (2L, "the quick brown fox leaps"),      // J(1,2)=4/6
      (3L, "the quick brown fox jumps high"), // J(1,3)=5/6
      (4L, "completely different words here"),
      (5L, "the quick brown fox jumps"),      // J(1,5)=1.0 exact dup
      (6L, "quick brown"),                    // small set, length filter territory
      (7L, "words here"))
    for (t <- Seq(0.5, 0.7, 0.99)) {
      val got = SetSimJoin.jaccardJoin(docs.toDF("doc_id", "text"), "doc_id", "text", t)
        .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSet
      assert(got == bruteJaccard(docs, t), s"mismatch at t=$t")
    }
  }

  test("prefix filtering prunes: candidate blocking never joins on the most frequent token") {
    // 'common' appears in every doc; at t=0.9 each prefix is 1 token —
    // the RAREST — so docs sharing only 'common' are never candidates
    val docs = Seq(
      (1L, "common aaa bbb ccc ddd eee fff ggg hhh iii"),
      (2L, "common jjj kkk lll mmm nnn ooo ppp qqq rrr")).toDF("doc_id", "text")
    val got = SetSimJoin.jaccardJoin(docs, "doc_id", "text", 0.9)
    assert(got.count() == 0)
  }

  test("empty and single-doc inputs") {
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(SetSimJoin.jaccardJoin(empty, "doc_id", "text", 0.8).count() == 0)
    val one = Seq((1L, "only one doc")).toDF("doc_id", "text")
    assert(SetSimJoin.jaccardJoin(one, "doc_id", "text", 0.8).count() == 0)
  }
}

package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class HybridRetrievalSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val docs = Seq(
    (0L, "spark shuffle join"),              // the query doc
    (1L, "spark shuffle join broadcast"),    // matches all 3 query terms
    (2L, "spark join"),                      // matches 2
    (3L, "spark spark spark"),               // high tf on 1 term
    (4L, "window aggregate"),                // matches none
    (5L, "shuffle")                          // matches 1, short doc
  ).toDF("doc_id", "text")

  test("bm25PerQuery agrees with the single-query literal-bag operator") {
    val per = HybridRetrieval.bm25PerQuery(docs, "doc_id", "text",
      docs.where($"doc_id" === 0L), "doc_id", "text", topN = 10)
      .select($"doc_id", $"bm25", $"n_matched")
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    val single = TextAnalysis.bm25Retrieval(docs, "doc_id", "text",
      Seq("spark", "shuffle", "join"), topN = 10)
      .collect().map(r => (r.getLong(0), (r.getDouble(1), r.getLong(2)))).toMap
    assert(per == single)
    assert(per.contains(0L) && per.contains(1L) && !per.contains(4L))
  }

  test("per-query isolation: each query only sees its own terms") {
    val queries = Seq((100L, "broadcast"), (200L, "window")).toDF("qid", "qtext")
    val res = HybridRetrieval.bm25PerQuery(docs, "doc_id", "text",
      queries, "qid", "qtext", topN = 10)
      .select("query_id", "doc_id").as[(Long, Long)].collect().toSet
    assert(res == Set((100L, 1L), (200L, 4L)))
  }

  test("ranks are dense per query, ties break on doc id") {
    val queries = Seq((9L, "spark")).toDF("qid", "qtext")
    val r = HybridRetrieval.bm25PerQuery(docs, "doc_id", "text",
      queries, "qid", "qtext", topN = 10)
      .orderBy("rank").select("doc_id", "rank").as[(Long, Long)].collect()
    assert(r.map(_._2).toSeq == (1L to r.length))
    // doc 3 (tf=3 of 'spark' in a 3-token doc) outranks single-tf docs
    assert(r.head._1 == 3L)
  }

  test("rrfFuse sums contributions, keeps per-source ranks, orders by fused score") {
    val sparse = Seq((1L, 10L, 1L), (1L, 20L, 2L)).toDF("q", "d", "rank")
    val dense = Seq((1L, 20L, 1L), (1L, 30L, 2L)).toDF("q", "d", "rank")
    val fused = HybridRetrieval.rrfFuse(
      Seq("sparse" -> sparse, "dense" -> dense), "q", "d", "rank")
      .orderBy("fused_rank").collect()
    // doc 20 appears in both lists (ranks 2 and 1) → wins
    assert(fused.map(_.getAs[Long]("doc_id")).toSeq == Seq(20L, 10L, 30L))
    val top = fused.head
    assert(top.getAs[Long]("sparse_rank") == 2L)
    assert(top.getAs[Long]("dense_rank") == 1L)
    val bd = (r: Long) => BigDecimal(1.0 / (60.0 + r)).setScale(9, BigDecimal.RoundingMode.HALF_UP)
    assert(BigDecimal(top.getAs[java.math.BigDecimal]("rrf_dec")) == bd(2) + bd(1))
    // single-list docs carry a null rank for the missing source
    val only10 = fused.find(_.getAs[Long]("doc_id") == 10L).get
    assert(only10.isNullAt(only10.fieldIndex("dense_rank")))
  }

  test("rrf ties break on doc id") {
    val a = Seq((1L, 5L, 1L), (1L, 7L, 2L)).toDF("q", "d", "rank")
    val b = Seq((1L, 7L, 1L), (1L, 5L, 2L)).toDF("q", "d", "rank")
    val fused = HybridRetrieval.rrfFuse(Seq("a" -> a, "b" -> b), "q", "d", "rank")
      .orderBy("fused_rank").collect()
    // identical fused scores → doc 5 first
    assert(fused.map(_.getAs[Long]("doc_id")).toSeq == Seq(5L, 7L))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid retrieval: per-query BM25 (sparse leg) + reciprocal-rank fusion
  * of heterogeneous ranked lists (Cormack et al., SIGIR 2009) — the RAG
  * retrieval shape (dense ANN list ⊕ lexical list → one fused ranking).
  *
  * == Scale shape ==
  * [[bm25PerQuery]] generalizes [[TextAnalysis.bm25Retrieval]] from one
  * literal term bag to a QUERY TABLE: the corpus tokenize/explode runs
  * once; the (doc, term) aggregation shuffles only terms that appear in
  * some query (a broadcast semi-join under the aggregation, so unmatched
  * terms never hit the wire); document frequency, corpus stats and the
  * query-term map are all query- or vocabulary-sized broadcasts; and each
  * query's top-N goes through [[TopK.perKey]]'s bounded heaps — no
  * corpus-sized window. Queries are small by contract (they are the
  * broadcast side); the corpus is the 100 TB side and is touched exactly
  * once. [[rrfFuse]] joins k·|Q|-sized rank lists — trivially small.
  *
  * == Determinism / oracle replayability ==
  * BM25 per-term scores are 6dp-rounded DECIMAL(18,6) before the per-doc
  * sum (order-independent — the tx_bm25 recipe); RRF contributions are
  * 1/(rrfK + rank) rounded to 9dp DECIMAL(18,9) before the per-doc sum,
  * so fusion of ANY number of lists is order-independent and exact in
  * both engines; all rank ties break on ids. */
object HybridRetrieval {

  /** Per-query BM25 top-N: (query_id, doc_id, bm25, n_matched, rank).
    * Lucene-form idf; same constants/rounding as
    * [[TextAnalysis.bm25Retrieval]] (neo4j_export.py has no retrieval —
    * mandated pipeline extension, SURVEY §2.8). */
  def bm25PerQuery(corpus: DataFrame, idCol: String, textCol: String,
      queries: DataFrame, qIdCol: String, qTextCol: String,
      k1: Double = 1.2, b: Double = 0.75, topN: Int = 20): DataFrame = {
    def tokenize(df: DataFrame, id: Column, idName: String, text: Column) =
      df.select(id.as(idName), explode(split(trim(lower(text)), "\\s+")).as("term"))
        .where(col("term") =!= "")
    // corpus tokens feed doc lengths AND term frequencies — one pass
    val toks = tokenize(corpus, col(idCol), "doc_id", col(textCol))
      .localCheckpoint(true)
    // distinct query terms: query-sized, broadcast everywhere below
    val qterms = tokenize(queries, col(qIdCol), "query_id", col(qTextCol))
      .distinct()
      .localCheckpoint(true)
    val dl = toks.groupBy("doc_id").agg(count(lit(1)).as("dl"))
      .localCheckpoint(true)
    val stats = dl.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("total_dl"))
    // the semi-join sits UNDER the aggregation: only query-matched terms
    // shuffle into the (doc, term) count
    val tf = toks
      .join(broadcast(qterms.select("term").distinct()), Seq("term"), "left_semi")
      .groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val k1p1 = k1 + 1.0
    val oneMinusB = 1.0 - b
    val scored = tf.join(broadcast(dfreq), "term")
      .join(dl, "doc_id")
      .crossJoin(broadcast(stats))
      .withColumn("score_t",
        round((log((col("n_docs") - col("df") + lit(0.5)) / (col("df") + lit(0.5)) + lit(1.0))
            * (col("tf") * lit(k1p1)))
          / (col("tf") + lit(k1) * (lit(oneMinusB)
             + lit(b) * col("dl") / (col("total_dl") / col("n_docs")))), 6)
          .cast("decimal(18,6)"))
    val perQuery = scored.join(broadcast(qterms), "term")
      .groupBy("query_id", "doc_id")
      .agg(sum(col("score_t")).as("bm25_dec"), count(lit(1)).as("n_matched"))
    val top = TopK.perKey(perQuery, "query_id", "bm25_dec", topN,
      tieBreak = Seq("doc_id"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("bm25_dec").desc, col("doc_id").asc)
    top.withColumn("rank", row_number().over(w).cast("long"))
      .select(col("query_id"), col("doc_id"),
        col("bm25_dec").cast("double").as("bm25"), col("n_matched"), col("rank"))
  }

  /** Reciprocal-rank fusion of named rank lists. Each input is
    * (name, df(query, doc, rank)); output carries the exact DECIMAL(18,9)
    * fused score, one nullable `<name>_rank` column per source, and the
    * fused per-query rank (score desc, doc asc). Lists are k·|Q|-sized —
    * the fusion is never the scale problem; determinism is (hence the
    * rounded-decimal contributions). */
  def rrfFuse(lists: Seq[(String, DataFrame)], qCol: String, dCol: String,
      rankCol: String, rrfK: Int = 60): DataFrame = {
    require(lists.nonEmpty, "rrfFuse needs at least one ranked list")
    val tagged = lists.map { case (name, df) =>
      df.select(col(qCol).as("query_id"), col(dCol).as("doc_id"),
        lit(name).as("src"), col(rankCol).cast("long").as("src_rank"),
        round(lit(1.0) / (lit(rrfK.toDouble) + col(rankCol).cast("double")), 9)
          .cast("decimal(18,9)").as("contrib"))
    }.reduce(_ unionAll _)
    val perSrcRank = lists.map { case (name, _) =>
      max(when(col("src") === name, col("src_rank"))).as(s"${name}_rank")
    }
    val fused = tagged.groupBy("query_id", "doc_id")
      .agg(sum(col("contrib")).as("rrf_dec"), perSrcRank: _*)
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_dec").desc, col("doc_id").asc)
    fused.withColumn("fused_rank", row_number().over(w).cast("long"))
  }
}

package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Empty-input behavior of the pipeline operators: a 100 TB pipeline
  * routinely produces empty partitions, empty filters, and empty
  * micro-batches — every operator must return an empty (or identity)
  * result, never throw.
  */
class EmptyInputSpec extends SparkTestBase {
  import spark.implicits._

  private val noDocs = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private val noEdges = Seq.empty[(Long, Long)].toDF("src", "dst")

  test("dedup operators on an empty corpus") {
    assert(Dedup.exactGroups(noDocs, "doc_id", "text").count() == 0)
    assert(Dedup.minHashBands(noDocs, "doc_id", "text").count() == 0)
    assert(Dedup.minHashBandsMd5(noDocs, "doc_id", "text").count() == 0)
    assert(Dedup.minHashLshPairs(noDocs, "doc_id", "text").count() == 0)
    assert(Dedup.simHashPairs(noDocs, "doc_id", "text").count() == 0)
    assert(Dedup.ngramJaccardPairs(noDocs, "doc_id", "text").count() == 0)
    val clusters = Dedup.nearDupClusters(noDocs, "doc_id",
      Seq.empty[(Long, Long)].toDF("id_a", "id_b"))
    assert(clusters.count() == 0)
  }

  test("text operators on an empty corpus") {
    assert(TextAnalysis.repetitionStats(noDocs, "doc_id", "text").count() == 0)
    assert(TextAnalysis.chunk(noDocs, "doc_id", "text").count() == 0)
    assert(TextAnalysis.unigramLogprob(noDocs, "doc_id", "text").count() == 0)
    val ts = TextAnalysis.temperatureSample(
      Seq.empty[(Long, String)].toDF("doc_id", "lang"), "doc_id", "lang")
    assert(ts.count() == 0)
    val cont = TextAnalysis.contamination(
      Seq.empty[(Long, String, String)].toDF("doc_id", "text", "split"),
      "doc_id", "text", "split", "train", "eval")
    assert(cont.count() == 0)
  }

  test("graph operators on an empty edge list") {
    // CC converges immediately (checksum count 0) and assigns nothing
    assert(DataFramePregel.connectedComponents(noEdges).count() == 0)
    assert(DataFramePregel.connectedComponents(noEdges, localThreshold = 0L).count() == 0)
    assert(GraphAnalytics.triangleCountsDF(noEdges).count() == 0)
    assert(GraphAnalytics.labelPropagationDF(noEdges).count() == 0)
    assert(GraphAnalytics.pageRankQuantizedDF(noEdges).count() == 0)
    assert(GraphAnalytics.coOccurrenceEdges(
      Seq.empty[(Long, Long)].toDF("g", "item"), "g", "item").count() == 0)
    // hyperAnf: no vertices → every round's NF total is exactly 0
    val anf = GraphAnalytics.hyperAnf(noEdges, 2).collect()
    assert(anf.length == 3 && anf.forall(_.getDecimal(1).signum == 0))
  }

  test("round-4 operators on empty inputs") {
    // map-typed ingest: no observed keys → id-only projection
    val noMaps = Seq.empty[(Long, Map[String, String])].toDF("id", "props")
    val mapped = NodeTableBuilder.fromPropertyMap(noMaps, "id", "props")
    assert(mapped.columns.toSeq == Seq("id") && mapped.count() == 0)
    // fuzzy contamination: empty corpus → empty worklist
    val cont = TextAnalysis.contaminationFuzzy(
      Seq.empty[(Long, String, String)].toDF("doc_id", "text", "split"),
      "doc_id", "text", "split", "train", "eval")
    assert(cont.count() == 0)
    // codec dispatch on an empty payload → generic featurizer, all zeros
    assert(Multimodal.decode(Array.emptyByteArray, 4).forall(_ == 0.0))
    // capped dedup paths on empty corpora
    assert(Dedup.ngramJaccardPairs(noDocs, "doc_id", "text", maxBucketSize = 1).count() == 0)
    assert(Dedup.simHashPairs(noDocs, "doc_id", "text", maxBucketSize = 1).count() == 0)
  }

  test("top-k and as-of on empty inputs") {
    val noOrders = Seq.empty[(Long, Double, Long)].toDF("k", "ord", "id")
    assert(TopK.perKey(noOrders, "k", "ord", 3, tieBreak = Seq("id")).count() == 0)
    val noLeft = Seq.empty[(Long, Long)].toDF("k", "t")
    val noRight = Seq.empty[(Long, Long, Double)].toDF("k", "t", "v")
    assert(AsOf.joinAsOf(noLeft, noRight, "k", "t", col("v"), "asof").count() == 0)
  }

  test("round-6 operators on empty inputs") {
    val noVids = Seq.empty[Long].toDF("vid")
    val noW = Seq.empty[(Long, Long, Long)].toDF("src", "dst", "w")
    assert(GraphAnalytics.ssspDistances(noW, noVids, rounds = 3).count() == 0)
    assert(GraphAnalytics.bfsDistances(noEdges, noVids, maxHops = 3).count() == 0)
    assert(GraphAnalytics.kCore(noEdges, k = 2).count() == 0)
    assert(GraphAnalytics.randomWalks(noEdges, noVids, 2, 3).count() == 0)
    assert(GraphAnalytics.personalizedPageRankDF(noEdges, noVids).count() == 0)
    // sources over an empty EDGE list but real sources: source rows stand
    val d = GraphAnalytics.ssspDistances(noW, Seq(7L).toDF("vid"), rounds = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(d.toSeq == Seq((7L, 0L)))

    assert(Sketches.hllRegisters(noDocs, col("text")).count() == 0)
    assert(Sketches.hllDistinct(noDocs, col("text")).collect()(0).getDouble(0) == 0.0)
    assert(Sketches.cmsTable(noDocs, col("text")).count() == 0)
    assert(Sketches.cmsLookup(Sketches.cmsTable(noDocs, col("text")), noDocs, "text").count() == 0)

    assert(TextAnalysis.tfIdf(noDocs, "doc_id", "text", 3).count() == 0)
    assert(TextAnalysis.bm25Retrieval(noDocs, "doc_id", "text", Seq("q")).count() == 0)
    assert(TextAnalysis.weightedSample(
      Seq.empty[(Long, Long)].toDF("doc_id", "w"), "doc_id", col("w"), 5).count() == 0)

    val model = Similarity.IvfModel(Array(Array(1.0, 0.0)))
    val noVecs = Seq.empty[(Long, Seq[Double])].toDF("vec_id", "embedding")
    assert(Similarity.semanticDedup(noVecs, "vec_id", "embedding", model, 0.9).count() == 0)

    assert(graft.schema.SchemaInference.profile(noDocs)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet ==
      Set(("doc_id", 0L, 0L), ("text", 0L, 0L)))
  }

  test("round-10 reshaped operators on empty inputs") {
    val noVids = Seq.empty[Long].toDF("vid")
    // empty edges, anchored and unanchored (count-guarded broadcast paths)
    assert(GraphAnalytics.linkFeatures(noEdges, "src", "dst").count() == 0)
    assert(GraphAnalytics.linkFeatures(noEdges, "src", "dst",
      anchors = Some(Seq(1L).toDF("vid"))).count() == 0)
    // real edges, EMPTY anchor set: broadcast of zero anchor rows
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("src", "dst")
    assert(GraphAnalytics.linkFeatures(tri, "src", "dst",
      anchors = Some(noVids)).count() == 0)
    // kCore canonical fast path on empty input
    assert(GraphAnalytics.kCore(noEdges, k = 2, assumeCanonical = true).count() == 0)
    // negative sampling: empty pair table and empty weight table
    val noPairs = Seq.empty[(Long, Long)].toDF("center", "context")
    val w = Seq((1L, 3L), (2L, 1L)).toDF("vid", "w")
    assert(GraphAnalytics.weightedNegativeSamples(noPairs, w, k = 2).count() == 0)
    val pairs = Seq((1L, 2L)).toDF("center", "context")
    val noW2 = Seq.empty[(Long, Long)].toDF("vid", "w")
    assert(GraphAnalytics.weightedNegativeSamples(pairs, noW2, k = 2).count() == 0)
    // weighted pagerank's pinned-cache staging on empty edges
    assert(GraphAnalytics.pageRankWeightedDF(noW3).count() == 0)
  }

  private def noW3 = Seq.empty[(Long, Long, Long)].toDF("src", "dst", "w")
}

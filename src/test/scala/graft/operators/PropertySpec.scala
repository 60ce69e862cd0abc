package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Seeded randomized equivalence properties — many random instances per
  * law, deterministic seeds (no flaky tests). Where scalacheck's Gen
  * would drive these, a seeded Random keeps the dependency surface to
  * scalatest alone while testing the same laws.
  */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  test("TopK.perKey equals the exact window top-k under random ties and k") {
    (1 to 4).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val k = 1 + rnd.nextInt(4)
      // few distinct ord values → dense ties; tie-break on id must decide
      val data = Seq.tabulate(400)(i =>
        (rnd.nextInt(7).toLong, rnd.nextInt(5).toDouble, i.toLong))
      val df = data.toDF("key", "ord", "id").repartition(1 + rnd.nextInt(7))
      val got = TopK.perKey(df, "key", "ord", k, tieBreak = Seq("id"))
        .select("key", "ord", "id").as[(Long, Double, Long)].collect().toSet
      val w = Window.partitionBy(col("key")).orderBy(col("ord").desc, col("id").asc)
      val want = df.withColumn("rn", row_number().over(w)).where(col("rn") <= k)
        .select("key", "ord", "id").as[(Long, Double, Long)].collect().toSet
      assert(got == want, s"seed=$seed k=$k")
    }
  }

  test("anchored linkFeatures equals the all-pairs output restricted to anchors") {
    // a feature row depends only on its anchor's 2-hop neighborhood, so
    // the broadcast-anchored pipeline must agree row-for-row with the
    // unanchored plan filtered to anchor rows — across random graphs,
    // anchor sets, and partitionings
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(seed)
      val edges = Seq.fill(120)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
        .filter { case (a, b) => a != b }.distinct
      val df = edges.toDF("src", "dst").repartition(1 + rnd.nextInt(5))
      val anchorIds = (0 until 25).filter(_ => rnd.nextBoolean()).map(_.toLong)
      val anchors = anchorIds.toDF("vid")
      def rows(out: org.apache.spark.sql.DataFrame) =
        out.select("a", "b", "n_common", "jaccard", "adamic_adar", "is_edge")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
            r.getDouble(3), r.getDouble(4), r.getLong(5))).toSet
      val anchored = rows(GraphAnalytics.linkFeatures(df, "src", "dst",
        topPerVertex = 3, minCommon = 1, anchors = Some(anchors)))
      val all = rows(GraphAnalytics.linkFeatures(df, "src", "dst",
        topPerVertex = 3, minCommon = 1))
        .filter(r => anchorIds.contains(r._1))
      assert(anchored == all, s"seed=$seed anchors=${anchorIds.mkString(",")}")
    }
  }

  test("kCore assumeCanonical equals the dedup path across random graphs") {
    (1 to 3).foreach { seed =>
      val rnd = new scala.util.Random(100 + seed)
      val raw = Seq.fill(150)((rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
      val canon = raw.filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }.distinct
      val k = 2 + rnd.nextInt(3)
      def rows(df: org.apache.spark.sql.DataFrame, assume: Boolean) =
        GraphAnalytics.kCore(df, k = k, rounds = 10, assumeCanonical = assume)
          .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      // canonical input through the fast path == raw input through dedup
      assert(rows(canon.toDF("src", "dst"), true) ==
        rows(raw.toDF("src", "dst"), false), s"seed=$seed k=$k")
    }
  }

  test("linkFeatures and negative sampling: forced-shuffle path agrees with broadcast path") {
    // maxBroadcast = 0 routes every guarded broadcast to the shuffle
    // plan — results must be bit-identical (plan shape, not semantics)
    val rnd = new scala.util.Random(77)
    val edges = Seq.fill(150)((rnd.nextInt(20).toLong, rnd.nextInt(20).toLong))
      .filter { case (a, b) => a != b }.distinct.toDF("src", "dst")
    val anchors = Some(Seq(1L, 3L, 5L).toDF("vid"))
    def lf(mb: Long) = GraphAnalytics.linkFeatures(edges, "src", "dst",
        topPerVertex = 3, minCommon = 1, anchors = anchors, maxBroadcast = mb)
      .collect().map(_.toSeq).toSet
    assert(lf(Long.MaxValue) == lf(0L))
    val pairs = Seq((1L, 2L), (3L, 4L), (5L, 2L)).toDF("center", "context")
    val w = Seq.tabulate(12)(i => (i.toLong, (1 + i % 4).toLong)).toDF("vid", "w")
    def ns(mb: Long) = GraphAnalytics.weightedNegativeSamples(pairs, w, k = 3,
        maxBroadcast = mb).collect().map(_.toSeq).toSet
    assert(ns(Long.MaxValue) == ns(0L))
  }

  test("chunking covers every character; stride==size reassembles the text") {
    val rnd = new scala.util.Random(5)
    (1 to 4).foreach { _ =>
      val len = 1 + rnd.nextInt(900)
      val text = rnd.alphanumeric.take(len).mkString
      val size = 1 + rnd.nextInt(100)
      // no-overlap chunks concatenate back to the exact original
      val flat = TextAnalysis.chunk(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", size = size, stride = size)
        .select("chunk_id", "n_chars").as[(Long, Long)].collect().sortBy(_._1)
      assert(flat.map(_._2).sum == len, s"len=$len size=$size")
      assert(flat.map(_._1).toSeq == flat.indices.map(_.toLong), "contiguous chunk ids")
      // overlapping chunks: every non-tail chunk is exactly `size` chars
      val stride = 1 + rnd.nextInt(size)
      val over = TextAnalysis.chunk(Seq((1L, text)).toDF("doc_id", "text"),
        "doc_id", "text", size = size, stride = stride)
        .select("chunk_id", "n_chars").as[(Long, Long)].collect().sortBy(_._1)
      assert(over.length == (len - 1) / stride + 1)
      over.dropRight(1).zipWithIndex.foreach { case ((_, n), i) =>
        val start = i.toLong * stride + 1
        assert(n == math.min(size.toLong, len - start + 1), s"chunk $i len=$len size=$size stride=$stride")
      }
    }
  }

  test("splitAssign is total, deterministic, and layout-independent") {
    val ids = (0L until 2000L).toDF("id")
    val weights = Seq("train" -> 204, "val" -> 26, "test" -> 26)
    def assign(df: org.apache.spark.sql.DataFrame) =
      df.select(col("id"), TextAnalysis.splitAssign(col("id"), weights).as("s"))
        .as[(Long, String)].collect().toMap
    val a = assign(ids.repartition(3))
    val b = assign(ids.repartition(11).sortWithinPartitions(desc("id")))
    assert(a == b)
    assert(a.values.toSet.subsetOf(Set("train", "val", "test")))
    assert(a.size == 2000)
    // weight-proportional within tolerance
    val train = a.values.count(_ == "train").toDouble / a.size
    assert(train > 0.72 && train < 0.88, s"train frac $train")
  }
}

package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream ≡ batch at BENCH scale (VERDICT r11 #4; r13 #6 extended the
  * MATCH set): streaming families driven through the real foreachBatch
  * machinery in micro-batches, then the FINAL generation compared
  * row-for-row (exceptAll both ways) against the one-shot batch
  * operator over the identical input. r12 proved cc/dedup/ppr/nb; r14
  * adds MATCH rows for er, linkfeatures, skyline and ann (previously
  * rows/s-only), so every stateful streaming family has a full-corpus
  * equivalence row. Sustained ingest rows/s uses the same
  * first-batch-is-warmup convention as StreamBench.
  *
  * Usage: `sbt "runMain graft.tools.StreamEquiv /root/repo/testdata_sf1"`.
  * Appends one JSON line to bench_history/r14_stream_equiv.jsonl.
  */
object StreamEquiv {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val root = java.nio.file.Files.createTempDirectory("graft_streamequiv").toString

    def drive[A](batches: Seq[Seq[A]],
        start: MemoryStream[A] => org.apache.spark.sql.streaming.StreamingQuery)(
        implicit enc: org.apache.spark.sql.Encoder[A]): (Double, Long, Double) = {
      val ms = MemoryStream[A](spark)
      val q = start(ms)
      try {
        ms.addData(batches.head)
        q.processAllAvailable()
        val timedRows = batches.tail.map(_.size.toLong).sum
        val t0 = System.nanoTime()
        batches.tail.foreach { b => ms.addData(b); q.processAllAvailable() }
        val secs = (System.nanoTime() - t0) / 1e9
        (timedRows / secs, timedRows, secs)
      } finally q.stop()
    }

    /** Row-for-row equality, executor-side (never collects V rows). */
    def sameRows(a: DataFrame, b: DataFrame): Boolean =
      a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty

    val results = scala.collection.mutable.LinkedHashMap.empty[String, String]

    // ---- StreamingCc over the full lineitem edge corpus
    val edges = graft.Tables(spark, dir, "lineitem")
      .select(col("l_orderkey").cast("long"), col("l_partkey").cast("long"))
      .as[(Long, Long)].collect().toSeq
    val ccBatches = edges.grouped(math.max(1, edges.size / 10)).toSeq
    val (ccRps, ccRows, ccSecs) = drive[(Long, Long)](ccBatches, ms =>
      graft.streaming.StreamingCc.incrementalCc(
        ms.toDF().toDF("src", "dst"), "src", "dst", s"$root/cc/state", s"$root/cc/ckpt"))
    val ccStream = graft.streaming.StreamingCc.latestLabels(spark, s"$root/cc/state")
    val ccBatch = graft.operators.DataFramePregel.connectedComponents(
      graft.streaming.StreamingCc.readEdges(spark, s"$root/cc/state"))
    val ccMatch = sameRows(ccStream, ccBatch.toDF(ccStream.columns: _*))
    results += "cc" -> s"""{"match":$ccMatch,"rows":$ccRows,"rps":${f"$ccRps%.1f"},"secs":${f"$ccSecs%.2f"}}"""
    println(s"[equiv] cc match=$ccMatch rows=$ccRows rps=$ccRps")

    // ---- StreamingDedup over the full documents corpus
    val docs = graft.Tables(spark, dir, "documents")
      .select(col("doc_id").cast("long"), col("text"))
      .as[(Long, String)].collect().toSeq
    val ddBatches = docs.grouped(math.max(1, docs.size / 10)).toSeq
    val (ddRps, ddRows, ddSecs) = drive[(Long, String)](ddBatches, ms =>
      graft.streaming.StreamingDedup.incrementalMinhashPairs(
        ms.toDF().toDF("doc_id", "text"), "doc_id", "text",
        s"$root/dd/index", s"$root/dd/pairs", s"$root/dd/ckpt"))
    // canonicalize both sides: stream pairs are (newer, older) by batch
    // order, batch pairs are (larger id, smaller id)
    def canon(df: DataFrame) = df.select(
      greatest(col("id_a"), col("id_b")).as("id_a"),
      least(col("id_a"), col("id_b")).as("id_b")).distinct()
    val ddStream = canon(graft.streaming.StreamingDedup.allPairs(spark, s"$root/dd/pairs"))
    val banded = graft.operators.Dedup.minHashBands(
      graft.Tables(spark, dir, "documents"), "doc_id", "text")
    val ddBatch = canon(
      banded.select(col("band"), col("bucket"), col("doc_id").as("id_a"))
        .join(banded.select(col("band"), col("bucket"), col("doc_id").as("id_b")),
          Seq("band", "bucket"))
        .where(col("id_a") > col("id_b")))
    val ddMatch = sameRows(ddStream, ddBatch)
    results += "dedup" -> s"""{"match":$ddMatch,"rows":$ddRows,"rps":${f"$ddRps%.1f"},"secs":${f"$ddSecs%.2f"}}"""
    println(s"[equiv] dedup match=$ddMatch rows=$ddRows rps=$ddRps")

    // ---- StreamingPpr over the lineitem order→part graph, cohort = the
    // first 100 orderkeys (reach-bounded: the sparse rank table is the
    // cohort's 1-hop part neighborhood)
    val sources = edges.map(_._1).distinct.sorted.take(100).toDF("vid")
    val (pprRps, pprRows, pprSecs) = drive[(Long, Long)](ccBatches, ms =>
      graft.streaming.StreamingPpr.incrementalPpr(
        ms.toDF().toDF("src", "dst"), "src", "dst", sources,
        s"$root/ppr/state", s"$root/ppr/ckpt"))
    val pprStream = graft.streaming.StreamingPpr.latestRanks(spark, s"$root/ppr/state")
    val pprBatch = graft.operators.GraphAnalytics.personalizedPageRankDF(
      graft.streaming.StreamingPpr.readEdges(spark, s"$root/ppr/state"), sources)
    val pprMatch = sameRows(pprStream, pprBatch.toDF(pprStream.columns: _*))
    results += "ppr" -> s"""{"match":$pprMatch,"rows":$pprRows,"rps":${f"$pprRps%.1f"},"secs":${f"$pprSecs%.2f"}}"""
    println(s"[equiv] ppr match=$pprMatch rows=$pprRows rps=$pprRps")

    // ---- StreamingNb over the full labeled documents corpus: fold the
    // per-batch count blocks, then compare BOTH the trained class stats
    // and the predictions over a held-out probe against the one-shot
    // batch classifier on the identical input
    val labeled = graft.Tables(spark, dir, "documents")
      .select(col("doc_id").cast("long"), col("text"), col("lang"))
      .as[(Long, String, String)].collect().toSeq
    val nbBatches = labeled.grouped(math.max(1, labeled.size / 10)).toSeq
    val (nbRps, nbRows, nbSecs) = drive[(Long, String, String)](nbBatches, ms =>
      graft.streaming.StreamingNb.countsStream(
        ms.toDF().toDF("doc_id", "text", "lang"), "text", "lang",
        s"$root/nb/counts", s"$root/nb/ckpt"))
    val wholeNb = graft.Tables(spark, dir, "documents")
      .select(col("doc_id"), col("text"), col("lang"))
    val probe = wholeNb.where(col("doc_id") % 97 === 0).select(col("doc_id"), col("text"))
    val nbStatsMatch = sameRows(
      graft.streaming.StreamingNb.currentClassStats(spark, s"$root/nb/counts"),
      graft.operators.TextClassifier.nbClassStats(wholeNb, "text", "lang"))
    val nbPredMatch = sameRows(
      graft.streaming.StreamingNb.predict(spark, s"$root/nb/counts", probe, "doc_id", "text"),
      graft.operators.TextClassifier.nbPredict(wholeNb, probe, "doc_id", "text", "lang"))
    val nbMatch = nbStatsMatch && nbPredMatch
    results += "nb" -> s"""{"match":$nbMatch,"rows":$nbRows,"rps":${f"$nbRps%.1f"},"secs":${f"$nbSecs%.2f"}}"""
    println(s"[equiv] nb statsMatch=$nbStatsMatch predMatch=$nbPredMatch rows=$nbRows rps=$nbRps")

    // ---- rows/s-only families (BASELINE §6 gap): er, linkfeatures, skyline
    val customers = graft.Tables(spark, dir, "customer")
      .select(col("c_custkey").cast("long"), col("c_name"))
      .limit(35000).as[(Long, String)].collect().toSeq
    val erBatches = customers.grouped(5000).toSeq
    val (erRps, erRows, erSecs) = drive[(Long, String)](erBatches, ms =>
      graft.streaming.StreamingEr.incrementalFuzzyPairs(
        ms.toDF().toDF("c_custkey", "c_name"), "c_custkey", "c_name",
        blockExpr = expr("substr(c_name, 1, length(c_name)-2)"),
        s"$root/er/index", s"$root/er/pairs", s"$root/er/ckpt"))
    // stream ≡ batch (r13 verdict #6): same collected input, same block
    // expr and caps on both sides; name-prefix blocks stay far under the
    // 1000-row bucket cap at sf1, so the stream's corpus-so-far cap and
    // the batch's bucket cap never diverge. Pairs canonicalized (stream
    // emits (newer, older), batch (larger, smaller)).
    val erStream = graft.streaming.StreamingEr.allPairs(spark, s"$root/er/pairs")
      .select(greatest(col("id_a"), col("id_b")).as("id_a"),
        least(col("id_a"), col("id_b")).as("id_b"), col("dist")).distinct()
    val erBatch = graft.operators.EntityResolution.fuzzyPairs(
      customers.toDF("c_custkey", "c_name"), "c_custkey", "c_name",
      blockExpr = expr("substr(c_name, 1, length(c_name)-2)"))
      .select(greatest(col("id_a"), col("id_b")).as("id_a"),
        least(col("id_a"), col("id_b")).as("id_b"), col("dist")).distinct()
    val erMatch = sameRows(erStream, erBatch)
    results += "er" -> s"""{"match":$erMatch,"rows":$erRows,"rps":${f"$erRps%.1f"},"secs":${f"$erSecs%.2f"}}"""
    println(s"[equiv] er match=$erMatch rps=$erRps")

    val lfBatches = edges.take(7000).grouped(1000).toSeq
    val (lfRps, lfRows, lfSecs) = drive[(Long, Long)](lfBatches, ms =>
      graft.streaming.StreamingLinkFeatures.incremental(
        ms.toDF().toDF("src", "dst"), "src", "dst",
        s"$root/lf/state", s"$root/lf/ckpt"))
    val lfStream = graft.streaming.StreamingLinkFeatures.latestFeatures(spark, s"$root/lf/state")
    val lfBatch = graft.operators.GraphAnalytics.linkFeatures(
      edges.take(7000).toDF("src", "dst"), "src", "dst",
      topPerVertex = 5, minCommon = 2)
    val lfMatch = sameRows(lfStream, lfBatch.select(lfStream.columns.map(col): _*))
    results += "linkfeatures" -> s"""{"match":$lfMatch,"rows":$lfRows,"rps":${f"$lfRps%.1f"},"secs":${f"$lfSecs%.2f"}}"""
    println(s"[equiv] linkfeatures match=$lfMatch rps=$lfRps")

    val orders = graft.Tables(spark, dir, "orders")
      .withColumn("o_orderdate_d", to_date(col("o_orderdate")))
      .select(col("o_orderkey").cast("long"), col("o_orderpriority"),
        col("o_totalprice").cast("double"),
        datediff(col("o_orderdate_d"), lit("1990-01-01").cast("date")).as("recency"))
      .limit(70000).as[(Long, String, Double, Int)].collect().toSeq
    val skBatches = orders.grouped(10000).toSeq
    val (skRps, skRows, skSecs) = drive[(Long, String, Double, Int)](skBatches, ms =>
      graft.streaming.StreamingSkyline.incrementalSkyline(
        ms.toDF().toDF("o_orderkey", "o_orderpriority", "o_totalprice", "recency"),
        criteria = Seq(
          graft.operators.Skyline.Criterion("price", col("o_totalprice"), maximize = true),
          graft.operators.Skyline.Criterion("recency", col("recency"), maximize = true)),
        s"$root/sk/front", s"$root/sk/ckpt",
        keyCols = Seq("o_orderpriority")))
    val skStream = graft.streaming.StreamingSkyline.currentFront(spark, s"$root/sk/front")
    val skBatch = graft.operators.Skyline.skylinePerKey(
      orders.toDF("o_orderkey", "o_orderpriority", "o_totalprice", "recency"),
      keyCols = Seq("o_orderpriority"),
      criteria = Seq(
        graft.operators.Skyline.Criterion("price", col("o_totalprice"), maximize = true),
        graft.operators.Skyline.Criterion("recency", col("recency"), maximize = true)))
    val skMatch = sameRows(skStream, skBatch.select(skStream.columns.map(col): _*))
    results += "skyline" -> s"""{"match":$skMatch,"rows":$skRows,"rps":${f"$skRps%.1f"},"secs":${f"$skSecs%.2f"}}"""
    println(s"[equiv] skyline match=$skMatch rps=$skRps")

    // ---- StreamingAnn over the full embeddings corpus: the streamed
    // cell-partitioned index must answer top-k IDENTICALLY to the batch
    // ivfTopK over the unioned corpus (same trained model both sides)
    val vecs = graft.Tables(spark, dir, "embeddings")
      .select(col("vec_id").cast("long"), col("embedding"))
      .as[(Long, Array[Float])].collect().toSeq
    val annModel = graft.operators.Similarity.trainIvf(
      vecs.toDF("vec_id", "embedding"), "embedding", nCells = 16)
    val annBatches = vecs.grouped(math.max(1, vecs.size / 10)).toSeq
    val (annRps, annRows, annSecs) = drive[(Long, Array[Float])](annBatches, ms =>
      graft.streaming.StreamingAnn.incrementalIvfIndex(
        ms.toDF().toDF("vec_id", "embedding"), "vec_id", "embedding", annModel,
        s"$root/ann/index", s"$root/ann/ckpt"))
    val annQueries = vecs.take(50).toDF("vec_id", "embedding")
    val annStream = graft.streaming.StreamingAnn.ivfTopKFromIndex(
      spark, s"$root/ann/index", annQueries, "vec_id", "embedding",
      k = 10, annModel, nProbe = 4)
    val annBatch = graft.operators.Similarity.ivfTopK(
      vecs.toDF("vec_id", "embedding"), annQueries, "vec_id", "embedding",
      k = 10, annModel, nProbe = 4)
    val annMatch = sameRows(annStream, annBatch.select(annStream.columns.map(col): _*))
    results += "ann" -> s"""{"match":$annMatch,"rows":$annRows,"rps":${f"$annRps%.1f"},"secs":${f"$annSecs%.2f"}}"""
    println(s"[equiv] ann match=$annMatch rps=$annRps")

    val json = results.map { case (k, v) => s""""$k":$v""" }
      .mkString(s"""{"metric":"stream_equiv","sf":"$dir",""", ",",
        s""","epoch_ms":${System.currentTimeMillis}}""")
    println(json)
    try {
      val repo = java.nio.file.Paths.get(sys.env.getOrElse("SPARK_GRAFT_REPO_ROOT", "/root/repo"))
      java.nio.file.Files.createDirectories(repo.resolve("bench_history"))
      java.nio.file.Files.writeString(repo.resolve("bench_history/r14_stream_equiv.jsonl"),
        json + "\n", java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    } catch { case e: Throwable => System.err.println(s"[equiv] log append failed: ${e.getMessage}") }
    spark.stop()
  }
}

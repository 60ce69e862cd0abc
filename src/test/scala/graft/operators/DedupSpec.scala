package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class DedupSpec extends SparkTestBase {
  import spark.implicits._

  private val base = "the quick brown fox jumps over the lazy dog and runs far away into the green forest tonight"

  test("exact groups: copies collapse to min id") {
    val df = Seq((3L, "aaa"), (1L, "aaa"), (2L, "bbb")).toDF("doc_id", "text")
    val got = Dedup.exactGroups(df, "doc_id", "text")
      .select("keep_id", "n_copies").as[(Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 2L), (2L, 1L)))
  }

  test("drop exact duplicates keeps one row per content") {
    val df = Seq((3L, "aaa"), (1L, "aaa"), (2L, "bbb")).toDF("doc_id", "text")
    val kept = Dedup.dropExactDuplicates(df, "doc_id", "text")
      .select("doc_id").as[Long].collect().sorted
    assert(kept.toSeq == Seq(1L, 2L))
  }

  test("word shingles: hand-computed trigrams") {
    val df = Seq("a b c d").toDF("t")
    val got = df.select(Dedup.wordShingles(col("t"), 3)).as[Seq[String]].head()
    assert(got == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("t")
      .select(Dedup.wordShingles(col("t"), 3)).as[Seq[String]].head()
    assert(short == Seq("a b"))
  }

  test("minhash LSH finds near-duplicates, not unrelated docs") {
    val nearDup = base.replace("quick", "swift")
    val unrelated = "completely different content about spark dataframes and distributed query planning at scale"
    val df = Seq((1L, base), (2L, nearDup), (3L, unrelated)).toDF("doc_id", "text")
    val pairs = Dedup.minHashLshPairs(df, "doc_id", "text", jaccardThreshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("minhash LSH band join shuffles signatures only, never shingle sets") {
    val df = Seq((1L, base), (2L, base)).toDF("doc_id", "text")
    val plan = Dedup.minHashLshPairs(df, "doc_id", "text")
      .queryExecution.optimizedPlan
    // every shuffle below the band-bucket join must be shingle-free: the
    // shingle arrays only reappear in the final per-id verify join
    val joins = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    val bandJoin = joins.find(_.condition.exists(_.references.exists(a =>
      a.name == "band" || a.name == "bucket")))
    assert(bandJoin.nonEmpty, "band-bucket self-join not found in plan")
    val bandJoinCols = bandJoin.get.children.flatMap(_.output).map(_.name)
    val shingleCols = Set("shingles", "sh_a", "sh_b", "__sh")
    assert(!bandJoinCols.exists(shingleCols),
      s"shingles must not ride the band join, got: $bandJoinCols")
    assert(bandJoinCols.count(_.startsWith("sig")) >= 2,
      s"band join should carry signatures, got: $bandJoinCols")
  }

  test("near-dup clusters: CC over pairs, min id canonical, singletons survive") {
    val docs = Seq(1L, 2L, 3L, 4L, 5L).toDF("doc_id")
    // two chained pairs {1,2,3} + isolated pair-less docs 4, 5
    val pairs = Seq((1L, 2L), (2L, 3L)).toDF("id_a", "id_b")
    val got = Dedup.nearDupClusters(docs, "doc_id", pairs)
      .as[(Long, Long, Boolean)].collect().toSet
    assert(got == Set(
      (1L, 1L, true), (2L, 1L, false), (3L, 1L, false),
      (4L, 4L, true), (5L, 5L, true)))
  }

  test("simhash: identical docs distance 0, near-dups close, pairs found") {
    val nearDup = base.replace("quick", "swift")
    val df = Seq((1L, base), (2L, nearDup), (3L, base)).toDF("doc_id", "text")
    val sigs = df.select(Dedup.simHash(col("text"))).as[Long].collect()
    assert(sigs(0) == sigs(2))
    val d12 = java.lang.Long.bitCount(sigs(0) ^ sigs(1))
    assert(d12 > 0 && d12 <= 16, s"near-dup hamming was $d12")
    val pairs = Dedup.simHashPairs(df, "doc_id", "text", maxHamming = 16)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 3L)))
  }

  test("md5 simhash: same near-dup behavior, 60-bit range, engine-portable hash") {
    val nearDup = base.replace("quick", "swift")
    val df = Seq((1L, base), (2L, nearDup), (3L, base)).toDF("doc_id", "text")
    val sigs = df.select(Dedup.simHashMd5(col("text"))).as[Long].collect()
    assert(sigs(0) == sigs(2))
    assert(sigs.forall(s => s >= 0 && s < (1L << 60)))
    val d12 = java.lang.Long.bitCount(sigs(0) ^ sigs(1))
    assert(d12 > 0 && d12 <= 16, s"near-dup hamming was $d12")
    // spot-check the token hash against a known md5: conv(md5 prefix)
    // must equal DuckDB's ('0x' || prefix)::BIGINT for 'hello'
    val h = spark.sql(
      "SELECT CAST(conv(substring(md5('hello'), 1, 15), 16, 10) AS BIGINT)").as[Long].head()
    assert(h == 419982666956583591L)
  }

  test("ngram jaccard: hand-computed value") {
    // 4-grams: {abcd,bcdx} vs {abcd,bcdy} → J = 1/3; 1-row bands so the
    // shared gram "abcd" reliably blocks the pair (any shared slot joins)
    val df2 = Seq((1L, "abcdx"), (2L, "abcdy")).toDF("doc_id", "text")
    val got2 = Dedup.ngramJaccardPairs(df2, "doc_id", "text", n = 4, threshold = 0.0,
      blockHashes = 16, blockBands = 16)
      .select("jaccard").as[Double].head()
    assert(math.abs(got2 - 1.0 / 3.0) < 1e-5)
    // lengths 49 vs 50 straddle the log-1.1 bucket boundary at 1.1^41≈49.8
    // (within ±10% length) — adjacent-bucket probing must pair them;
    // identical gram sets → identical signatures → every band shared
    val df3 = Seq((1L, "x" * 49), (2L, "x" * 50)).toDF("doc_id", "text")
    val got3 = Dedup.ngramJaccardPairs(df3, "doc_id", "text", n = 4, threshold = 0.0)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect()
    assert(got3.toSeq == Seq((1L, 2L, 1.0))) // grams both just {"xxxx"}
  }

  test("ngram jaccard: near-dups found at default banding, unrelated not paired") {
    val nearDup = base.replace("quick", "swift")
    val unrelated = "completely different content about spark dataframes and distributed query planning at scale today"
    val df = Seq((1L, base), (2L, nearDup), (3L, unrelated)).toDF("doc_id", "text")
    val pairs = Dedup.ngramJaccardPairs(df, "doc_id", "text", n = 4, threshold = 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("ngram jaccard: blocking join is signature-only — gram arrays never shuffle") {
    val df = Seq((1L, base), (2L, base)).toDF("doc_id", "text")
    val plan = Dedup.ngramJaccardPairs(df, "doc_id", "text")
      .queryExecution.optimizedPlan
    val joins = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j }
    val blockJoin = joins.find(_.condition.exists(_.references.exists(a =>
      a.name == "bk" || a.name == "len_bucket")))
    assert(blockJoin.nonEmpty, "blocking self-join not found in plan")
    val blockJoinCols = blockJoin.get.children.flatMap(_.output).map(_.name)
    val gramCols = Set("grams", "g_a", "g_b", "__g")
    assert(!blockJoinCols.exists(gramCols),
      s"gram arrays must not ride the blocking join, got: $blockJoinCols")
  }

  test("ngram jaccard: hot buckets above maxBucketSize are dropped") {
    // 40 identical docs: one hot content bucket → with the cap at 10 the
    // bucket is dropped entirely and no pairs come back; with the default
    // cap they all pair up (40*39/2)
    val df = (1L to 40L).map(i => (i, base)).toDF("doc_id", "text")
    val capped = Dedup.ngramJaccardPairs(df, "doc_id", "text", maxBucketSize = 10).count()
    assert(capped == 0L)
    val uncapped = Dedup.ngramJaccardPairs(df, "doc_id", "text").count()
    assert(uncapped == 40L * 39 / 2)
  }

  test("simhash pairs: hot quarter buckets above maxBucketSize are dropped") {
    // identical docs share all four quarter buckets; cap 10 drops all four
    // hot buckets → no candidates; default cap finds every pair
    val df = (1L to 40L).map(i => (i, base)).toDF("doc_id", "text")
    val capped = Dedup.simHashPairs(df, "doc_id", "text", maxBucketSize = 10).count()
    assert(capped == 0L)
    val uncapped = Dedup.simHashPairs(df, "doc_id", "text").count()
    assert(uncapped == 40L * 39 / 2)
  }
}

package graft.streaming

import java.nio.file.Files
import graft.SparkTestBase
import graft.operators.Sketches
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingSketchesSpec extends SparkTestBase {
  import spark.implicits._

  test("streaming HLL registers fold to EXACTLY the one-shot batch registers") {
    val dir = Files.createTempDirectory("ss-hll").toString
    val ckpt = Files.createTempDirectory("ss-hll-ckpt").toString
    val ms = MemoryStream[String](spark)
    val q = StreamingSketches.hllRegistersStream(ms.toDF().toDF("v"), "v", dir, ckpt)
    try {
      ms.addData((1 to 4000).map(i => s"u$i"): _*)
      q.processAllAvailable()
      ms.addData((3000 to 7000).map(i => s"u$i"): _*) // overlap with batch 0
      q.processAllAvailable()
    } finally q.stop()

    val whole = (1 to 7000).map(i => s"u$i").toDF("v")
    val batchRegs = Sketches.hllRegisters(whole, col("v"))
      .orderBy("bucket").as[(Long, Int)].collect().toSeq
    val streamRegs = StreamingSketches.mergedHllRegisters(spark, dir)
      .orderBy("bucket").as[(Long, Int)].collect().toSeq
    assert(streamRegs == batchRegs)

    val est = StreamingSketches.hllEstimate(spark, dir).collect()(0).getDouble(0)
    assert(math.abs(est - 7000) / 7000.0 < 0.3, s"estimate $est for 7000")
  }

  test("streaming CMS counters fold to EXACTLY the one-shot batch table") {
    val dir = Files.createTempDirectory("ss-cms").toString
    val ckpt = Files.createTempDirectory("ss-cms-ckpt").toString
    val ms = MemoryStream[String](spark)
    val q = StreamingSketches.cmsTableStream(ms.toDF().toDF("v"), "v", dir, ckpt)
    try {
      ms.addData((1 to 500).map(i => s"k${i % 40}"): _*)
      q.processAllAvailable()
      ms.addData((1 to 300).map(i => s"k${i % 25}"): _*)
      q.processAllAvailable()
    } finally q.stop()

    val whole = ((1 to 500).map(i => s"k${i % 40}") ++ (1 to 300).map(i => s"k${i % 25}")).toDF("v")
    val batchCms = Sketches.cmsTable(whole, col("v"))
      .orderBy("row", "cell").as[(Int, Long, Long)].collect().toSeq
    val streamCms = StreamingSketches.mergedCmsTable(spark, dir)
      .orderBy("row", "cell").as[(Int, Long, Long)].collect().toSeq
    assert(streamCms == batchCms)

    // estimates off the merged sketch still never undershoot
    val items = whole.distinct()
    val est = Sketches.cmsLookup(StreamingSketches.mergedCmsTable(spark, dir), items, "v")
      .join(whole.groupBy("v").agg(count(lit(1)).as("t")), Seq("v"))
      .as[(String, Long, Long)].collect()
    est.foreach { case (k, e, t) => assert(e >= t, s"undershoot for $k") }
  }

  test("streaming Bloom bits fold to EXACTLY the one-shot batch bits") {
    val dir = Files.createTempDirectory("ss-bloom").toString
    val ckpt = Files.createTempDirectory("ss-bloom-ckpt").toString
    val ms = MemoryStream[String](spark)
    val q = StreamingSketches.bloomBitsStream(ms.toDF().toDF("v"), "v", dir, ckpt)
    try {
      ms.addData((1 to 800).map(i => s"x$i"): _*)
      q.processAllAvailable()
      ms.addData((500 to 1500).map(i => s"x$i"): _*)
      q.processAllAvailable()
    } finally q.stop()
    val whole = (1 to 1500).map(i => s"x$i").toDF("v")
    val batchBits = Sketches.bloomBits(whole, col("v"))
      .as[Long].collect().sorted.toSeq
    val streamBits = StreamingSketches.mergedBloomBits(spark, dir)
      .as[Long].collect().sorted.toSeq
    assert(streamBits == batchBits)
  }

  test("streaming quantile samples merge to EXACTLY the one-shot batch sample") {
    val dir = Files.createTempDirectory("ss-qs").toString
    val ckpt = Files.createTempDirectory("ss-qs-ckpt").toString
    val ms = MemoryStream[(String, Long, Double)](spark)
    val q = StreamingSketches.quantileSampleStream(
      ms.toDF().toDF("g", "id", "v"), "g", "id", "v", dir, ckpt, k = 100)
    try {
      ms.addData((1 to 2000).map(i => (s"g${i % 2}", i.toLong, i.toDouble)): _*)
      q.processAllAvailable()
      ms.addData((2001 to 5000).map(i => (s"g${i % 2}", i.toLong, i.toDouble)): _*)
      q.processAllAvailable()
    } finally q.stop()
    val whole = (1 to 5000).map(i => (s"g${i % 2}", i.toLong, i.toDouble)).toDF("g", "id", "v")
    val batchSample = Sketches.quantileSample(whole, "g", col("id"), col("v"), k = 100)
      .as[(String, Double)].collect().sorted.toSeq
    val streamSample = StreamingSketches.mergedQuantileSample(spark, dir, "g", k = 100)
      .as[(String, Double)].collect().sorted.toSeq
    assert(streamSample == batchSample)
    assert(streamSample.count(_._1 == "g0") == 100)
  }

  test("streaming KMV sketches fold to EXACTLY the one-shot batch sketch") {
    val dir = Files.createTempDirectory("ss-kmv").toString
    val ckpt = Files.createTempDirectory("ss-kmv-ckpt").toString
    val ms = MemoryStream[String](spark)
    val q = StreamingSketches.kmvSketchStream(ms.toDF().toDF("v"), "v", dir, ckpt, k = 256)
    try {
      ms.addData((1 to 5000).map(i => s"u$i"): _*)
      q.processAllAvailable()
      ms.addData((4000 to 9000).map(i => s"u$i"): _*) // overlap
      q.processAllAvailable()
    } finally q.stop()
    val whole = (1 to 9000).map(i => s"u$i").toDF("v")
    val batchSk = Sketches.kmvSketch(whole, col("v"), k = 256).as[Long].collect().toSeq
    val streamSk = StreamingSketches.mergedKmvSketch(spark, dir, k = 256).as[Long].collect().toSeq
    assert(streamSk == batchSk)
    val est = Sketches.kmvEstimate(
      StreamingSketches.mergedKmvSketch(spark, dir, k = 256), k = 256).as[Double].head()
    assert(math.abs(est - 9000) / 9000.0 < 0.3, s"estimate $est for 9000")
  }

  test("streaming MP sketches fold deterministically and estimates stay inside the widened bound") {
    val dir = Files.createTempDirectory("ss-mp").toString
    val ckpt = Files.createTempDirectory("ss-mp-ckpt").toString
    val n = 30000
    val k = 128
    val ms = MemoryStream[(String, Long, Double)](spark)
    val q = StreamingSketches.mpQuantileSketchStream(
      ms.toDF().toDF("g", "id", "v"), "g", "id", "v", dir, ckpt, k = k)
    // interleaved slices (same value distribution per batch)
    val all = (1 to n).map(i => ("g", i.toLong, ((i.toLong * 104729L) % n).toDouble))
    try {
      ms.addData(all.filter(_._2 % 2 == 0): _*)
      q.processAllAvailable()
      ms.addData(all.filter(_._2 % 2 == 1): _*)
      q.processAllAvailable()
    } finally q.stop()
    val folded = StreamingSketches.mergedMpQuantileSketch(spark, dir, "g", k = k)
    assert(folded.count() <= k)
    // fold twice — deterministic for a given batch split
    val again = StreamingSketches.mergedMpQuantileSketch(spark, dir, "g", k = k)
      .as[(String, Double, String, Int, Long)].collect().toSet
    assert(folded.as[(String, Double, String, Int, Long)].collect().toSet == again)
    // estimates within the one-extra-level bound (2n/k ranks); values are
    // a permutation of 0..n-1 so rank(v) = v + 1
    val est = Sketches.mpQuantileEstimate(folded, "g", Seq(500, 900))
      .select(col("q"), col("est").cast("double")).as[(Double, Double)].collect()
    est.foreach { case (qq, v) =>
      val rankErr = math.abs((v + 1) - qq * n)
      assert(rankErr <= 2.0 * n / k, s"folded q=$qq est=$v rank error $rankErr > 2n/k")
    }
  }

  test("streaming ball registers fold to EXACTLY the one-shot B1 registers") {
    val dir = Files.createTempDirectory("ss-ball").toString
    val ckpt = Files.createTempDirectory("ss-ball-ckpt").toString
    val ms = MemoryStream[(Long, Long)](spark)
    val q = StreamingSketches.ballRegistersStream(
      ms.toDF().toDF("src", "dst"), "src", "dst", dir, ckpt)
    // ring 1→2→…→50→1 plus chords, split across batches WITH overlap
    val edges = (1L to 50L).map(v => (v, v % 50 + 1)) ++
      (1L to 20L).map(v => (v, v + 25))
    try {
      ms.addData(edges.take(40): _*)
      q.processAllAvailable()
      ms.addData(edges.drop(30): _*) // 10 edges re-delivered
      q.processAllAvailable()
    } finally q.stop()

    // ground truth built directly from the member sets {v} ∪ out(v)
    val members = edges.flatMap { case (s, d) => Seq((s, s), (d, d), (s, d)) }
      .toDF("vid", "member")
    val batchRegs = Sketches.hllRegistersGrouped(members, "vid", col("member"))
      .orderBy("vid", "bucket").as[(Long, Long, Int)].collect().toSeq
    val streamRegs = StreamingSketches.mergedBallRegisters(spark, dir)
      .orderBy("vid", "bucket").as[(Long, Long, Int)].collect().toSeq
    assert(streamRegs == batchRegs)
  }
}

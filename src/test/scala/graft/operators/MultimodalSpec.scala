package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  test("binary column + metadata struct") {
    val df = Seq((1L, "abc")).toDF("doc_id", "text")
    val out = Multimodal.asBinaryColumn(df, "text")
    val row = out.select(col("meta.format"), col("meta.n_bytes"), col("content")).head()
    assert(row.getString(0) == "text/plain")
    assert(row.getLong(1) == 3L)
    assert(row.getAs[Array[Byte]](2).toSeq == "abc".getBytes("UTF-8").toSeq)
  }

  test("stub decode: deterministic feature accumulation") {
    // bytes 'a'=97,'b'=98 into dim 8 → [97/255, 98/255, 0, ...]
    val feats = Multimodal.stubDecode("ab".getBytes("UTF-8"), 8)
    assert(math.abs(feats(0) - 97f / 255f) < 1e-6)
    assert(math.abs(feats(1) - 98f / 255f) < 1e-6)
    assert(feats.drop(2).forall(_ == 0f))
  }

  test("stub resize keeps every factor-th byte and updates metadata") {
    val df = Multimodal.asBinaryColumn(Seq((1L, "abcdef")).toDF("doc_id", "text"), "text")
    val out = Multimodal.resize(df, "doc_id", factor = 2)
    val row = out.select(col("content"), col("meta.n_bytes")).head()
    assert(row.getAs[Array[Byte]](0).toSeq == "ace".getBytes("UTF-8").toSeq)
    assert(row.getLong(1) == 3L)
  }

  test("frame sampling: fixed-size frames, every stride-th kept") {
    val df = Multimodal.asBinaryColumn(Seq((7L, "a" * 10)).toDF("doc_id", "text"), "text")
    // frames of 3 bytes: 4 frames (3,3,3,1); stride 2 keeps frames 0 and 2
    val got = Multimodal.sampleFrames(df, "doc_id", frameBytes = 3, stride = 2)
      .orderBy("frame_index").as[(Long, Long, Array[Byte])].collect()
    assert(got.map(_._2).toSeq == Seq(0L, 2L))
    assert(got.forall(_._3.length == 3))
  }

  test("decodeFeatures end-to-end through mapPartitions") {
    val df = Multimodal.asBinaryColumn(Seq((1L, "ab"), (2L, "")).toDF("doc_id", "text"), "text")
    val got = Multimodal.decodeFeatures(df, "doc_id", featureDim = 4)
      .orderBy("id").as[(Long, Seq[Double])].collect()
    assert(got.length == 2)
    assert(got(0)._2.take(2) == Seq(97 / 255.0, 98 / 255.0))
    assert(got(1)._2.forall(_ == 0.0))
  }
}

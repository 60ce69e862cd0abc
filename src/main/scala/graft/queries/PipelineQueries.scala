package graft.queries

import graft.Tables
import graft.operators.{Multimodal, Similarity, TextAnalysis => TA}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data-pipeline queries (SURVEY §2.7–§2.9): similarity search,
  * language ID, fingerprinting, multimodal columns. ANN/fingerprint
  * results hinge on xxhash64/LSH internals DuckDB cannot reproduce, so
  * they are rows-only checked here and exactness-tested in specs;
  * mm_binary_meta is fully oracle-checked.
  */
object PipelineQueries {

  private val Dim = 64 // embedding dimensionality of the test corpus

  def cosineTopK(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    Similarity.bruteForceTopK(e, e.where(col("vec_id") < 10), "vec_id", "embedding", k = 5)
  }

  def lshTopK(s: SparkSession, dir: String): DataFrame = {
    val e = Tables(s, dir, "embeddings")
    Similarity.lshTopK(e, e.where(col("vec_id") < 10), "vec_id", "embedding",
      k = 5, dim = Dim, numBits = 6, numTables = 8)
  }

  def embedCosinePairs(s: SparkSession, dir: String): DataFrame =
    Similarity.embedCosinePairs(Tables(s, dir, "embeddings"), "vec_id", "embedding",
      dim = Dim, threshold = 0.3, numBits = 6, numTables = 8)

  def langId(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").select(col("doc_id"), col("lang").as("lang_labeled"),
      TA.languageId(col("text")).as("lang_pred"))

  def fingerprint(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents").select(col("doc_id"),
      TA.fingerprint(col("text")).as("fingerprint"),
      TA.fingerprintSketch(col("text")).as("sketch"))

  def binaryMeta(s: SparkSession, dir: String): DataFrame = {
    val withBin = Multimodal.asBinaryColumn(Tables(s, dir, "documents"), "text")
    withBin.select(col("doc_id"), col("meta.format").as("format"),
      col("meta.n_bytes").as("n_bytes"), md5(col("content")).as("content_md5"))
  }

  def decodeFeatures(s: SparkSession, dir: String): DataFrame =
    Multimodal.decodeFeatures(
      Multimodal.asBinaryColumn(Tables(s, dir, "documents"), "text"), "doc_id")

  def frameSample(s: SparkSession, dir: String): DataFrame =
    Multimodal.sampleFrames(
      Multimodal.asBinaryColumn(Tables(s, dir, "documents"), "text"), "doc_id",
      frameBytes = 64, stride = 2)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ss_cosine_topk" -> (cosineTopK _),
    "ss_lsh_topk" -> (lshTopK _),
    "ss_ivf_topk" -> ((s, dir) => {
      val e = Tables(s, dir, "embeddings")
      Similarity.ivfTopK(e, e.where(col("vec_id") < 10), "vec_id", "embedding",
        k = 5, nCells = 16, nProbe = 4)
    }),
    "dd_embed_cosine" -> (embedCosinePairs _),
    "tx_langid" -> (langId _),
    "tx_fingerprint" -> (fingerprint _),
    "mm_binary_meta" -> (binaryMeta _),
    "mm_decode_features" -> (decodeFeatures _),
    "mm_frame_sample" -> (frameSample _))

  val oracles: Map[String, String] = Map(
    "mm_binary_meta" ->
      """SELECT doc_id, 'text/plain' AS format,
        |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
        |  md5(text) AS content_md5
        |FROM documents""".stripMargin)
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import scala.util.Try

/** Multimodal-column plumbing (SURVEY §2.9): image/audio/video payloads as
  * opaque `binary` columns with a typed metadata struct, plus the
  * decode/feature-extract operator shape a training-data pipeline needs.
  *
  * Decode dispatches on magic bytes: BMP and PCM-16 WAV payloads get a
  * REAL pure-JVM parse (header + pixels/samples — [[Codec]]); any other
  * format falls back to the generic byte-sum featurizer, which is what an
  * opaque blob admits without its format's native library. The Spark-side
  * machinery — schema, batched per-partition processing, deterministic
  * output shape — is identical in both paths; production adds codecs by
  * extending the dispatch, not the plumbing.
  */
object Multimodal {

  /** Typed metadata carried next to every binary payload. */
  val MetadataSchema: StructType = StructType(Seq(
    StructField("format", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("width", IntegerType, nullable = true),
    StructField("height", IntegerType, nullable = true),
    StructField("duration_ms", LongType, nullable = true)))

  /** Attach a binary `content` column + metadata struct to any DataFrame
    * with a string payload column — the ingestion shape for blobs that in
    * production arrive from object storage. */
  def asBinaryColumn(df: DataFrame, payloadCol: String, format: String = "text/plain"): DataFrame =
    df.withColumn("content", col(payloadCol).cast("binary"))
      .withColumn("meta", struct(
        lit(format).as("format"),
        octet_length(col(payloadCol)).cast("long").as("n_bytes"),
        lit(null).cast("int").as("width"),
        lit(null).cast("int").as("height"),
        lit(null).cast("long").as("duration_ms")))

  /** Generic featurizer for payloads in a format no codec claims: per-dim
    * byte sums. Accumulation is INTEGER (exact in a 64-bit long,
    * order-independent) with one final division, so the result is
    * bit-reproducible by any engine — float accumulation would be
    * summation-order-dependent and unverifiable. */
  def stubDecode(bytes: Array[Byte], featureDim: Int): Array[Double] = {
    val sums = new Array[Long](featureDim)
    var i = 0
    while (i < bytes.length) {
      sums(i % featureDim) += (bytes(i) & 0xFF)
      i += 1
    }
    sums.map(_ / 255.0)
  }

  /** Magic-byte codec dispatch: BMP → image features, WAV → audio
    * features (both real parses, [[Codec]]); anything else → the generic
    * byte-sum featurizer at `featureDim`. BMP/WAV feature vectors are
    * 8-wide by contract (Codec scaladoc).
    *
    * Magic bytes are a sniff, not a guarantee — a text payload starting
    * "BM" or a non-PCM RIFF container matches the dispatch but fails the
    * parse. Any codec exception degrades to the generic featurizer so one
    * hostile/truncated blob can't fail the whole job. */
  def decode(bytes: Array[Byte], featureDim: Int): Array[Double] =
    Codec.detectFormat(bytes) match {
      case Some("image/bmp") => Try(Codec.bmpFeatures(bytes)).getOrElse(stubDecode(bytes, featureDim))
      case Some("image/png") => Try(Codec.pngFeatures(bytes)).getOrElse(stubDecode(bytes, featureDim))
      case Some("audio/wav") => Try(Codec.wavFeatures(bytes)).getOrElse(stubDecode(bytes, featureDim))
      case _ => stubDecode(bytes, featureDim)
    }

  /** Batched decode/feature-extract over partitions — the `mapInPandas`
    * shape (iterator of batches in, iterator of batches out) expressed as
    * `mapPartitions`: the codec is called per row *inside* a partition
    * loop, so per-batch setup (model load, codec init) amortizes across
    * the partition, exactly like a Pandas-UDF batch. */
  def decodeFeatures(df: DataFrame, idCol: String, featureDim: Int = 8): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition init (codec/model load) would happen here once
        it.map { case (id, bytes) => (id, decode(bytes, featureDim)) }
      }
      .toDF("id", "features")
  }

  /** Generic downsample for formats no codec claims: keep every
    * factor-th byte — the shape (binary in → smaller binary out) of a
    * real resize, without format knowledge. */
  def stubResizeBytes(bytes: Array[Byte], factor: Int): Array[Byte] = {
    val out = new Array[Byte]((bytes.length + factor - 1) / factor)
    var i = 0
    while (i < out.length) { out(i) = bytes(i * factor); i += 1 }
    out
  }

  /** Resize: BMP and PNG payloads get a REAL nearest-neighbor downsample
    * (re-encoded with correct headers — [[Codec.resizeBmp]] /
    * [[Codec.resizePng]]), with the new width/height in the metadata
    * struct; other formats fall back to byte decimation. */
  def resize(df: DataFrame, idCol: String, factor: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("content")).as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, bytes) =>
        // lazy: the O(payload) decimation fallback must not run (and be
        // discarded) on the happy path where the image resize succeeds
        lazy val generic = (id, stubResizeBytes(bytes, factor), "resized", None: Option[Int], None: Option[Int])
        Codec.detectFormat(bytes) match {
          case Some("image/bmp") =>
            // parse failure (false-positive magic, unsupported variant,
            // truncated header) degrades to byte decimation, as above
            Try {
              val out = Codec.resizeBmp(bytes, factor)
              val img = Codec.decodeBmp(out)
              (id, out, "image/bmp", Some(img.width): Option[Int], Some(img.height): Option[Int])
            }.getOrElse(generic)
          case Some("image/png") =>
            Try {
              val out = Codec.resizePng(bytes, factor)
              val img = Codec.decodePng(out)
              (id, out, "image/png", Some(img.width): Option[Int], Some(img.height): Option[Int])
            }.getOrElse(generic)
          case _ => generic
        }
      })
      .toDF("id", "content", "format", "width", "height")
      .withColumn("meta", struct(
        col("format"),
        octet_length(col("content")).cast("long").as("n_bytes"),
        col("width"),
        col("height"),
        lit(null).cast("long").as("duration_ms")))
      .select(col("id"), col("content"), col("meta"))
  }

  /** ==== STUB ==== Frame sampling for video-shaped payloads: split the
    * byte stream into fixed-size "frames" and keep every `stride`-th one.
    * Output is one row per sampled frame — the explode shape a real
    * frame sampler produces. (For actual multi-frame CONTAINERS use
    * [[sampleGifFrames]], which decodes real GIF animations.) */
  def sampleFrames(df: DataFrame, idCol: String, frameBytes: Int, stride: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("content")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        bytes.grouped(frameBytes).zipWithIndex
          .filter { case (_, idx) => idx % stride == 0 }
          .map { case (frame, idx) => (id, idx.toLong, frame) }
      }
      .toDF("id", "frame_index", "frame")
  }

  /** REAL frame sampling over animated GIF payloads: LZW-decode every
    * frame ([[Codec.decodeGif]]), keep every `stride`-th, and emit
    * luminance statistics per kept frame — n_frames, frame dims, and
    * exact integer pixel sums (palette-mapped red channel as luminance;
    * all-integer so the row hashes portably). Non-GIF payloads produce
    * no rows — the dispatch is the caller's filter, like decode. The
    * mapPartitions shape matches the Pandas-UDF batch contract
    * (SURVEY §2.9): per-task batch decode, no driver involvement. */
  def sampleGifFrames(df: DataFrame, idCol: String, stride: Int): DataFrame = {
    require(stride >= 1, s"stride=$stride must be >= 1")
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col("content")).as[(Long, Array[Byte])]
      .flatMap { case (id, bytes) =>
        if (!Codec.detectFormat(bytes).contains("image/gif")) Iterator.empty
        else {
          val gif = Codec.decodeGif(bytes)
          val lum = gif.palette.map(rgb => (rgb >> 16) & 0xFF)
          gif.frames.iterator.zipWithIndex
            .filter { case (_, idx) => idx % stride == 0 }
            .map { case (frame, idx) =>
              var sum = 0L
              var mx = 0
              var mn = 255
              var i = 0
              while (i < frame.length) {
                val v = lum(frame(i) & 0xFF)
                sum += v
                if (v > mx) mx = v
                if (v < mn) mn = v
                i += 1
              }
              (id, idx, gif.frames.length, gif.width, gif.height, sum, mn, mx)
            }
        }
      }
      .toDF("id", "frame_index", "n_frames", "width", "height",
        "lum_sum", "lum_min", "lum_max")
      .select(col("id"), col("frame_index").cast("long").as("frame_index"),
        col("n_frames").cast("long").as("n_frames"),
        col("width").cast("long").as("width"), col("height").cast("long").as("height"),
        col("lum_sum"), col("lum_min").cast("long").as("lum_min"),
        col("lum_max").cast("long").as("lum_max"))
  }
}

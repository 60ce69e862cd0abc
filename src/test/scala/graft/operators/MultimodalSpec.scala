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

  test("BMP codec: encode/decode round-trips pixels, hand-computed features") {
    // 2x2 BGR image: px(0,0)=(10,20,30) px(1,0)=(40,50,60)
    //                px(0,1)=(70,80,90) px(1,1)=(100,110,120)
    val pixels = Array[Byte](10, 20, 30, 40, 50, 60, 70, 80, 90, 100, 110, 120)
    val bmp = Codec.encodeBmp(2, 2, pixels)
    assert(Codec.detectFormat(bmp).contains("image/bmp"))
    val img = Codec.decodeBmp(bmp)
    assert(img.width == 2 && img.height == 2)
    assert(img.pixels.toSeq == pixels.toSeq) // bottom-up write undone by read
    val f = Codec.bmpFeatures(bmp)
    // [w, h, n, meanB, meanG, meanR, max, min]
    assert(f.toSeq == Seq(2.0, 2.0, 4.0,
      (10 + 40 + 70 + 100) / 4.0, (20 + 50 + 80 + 110) / 4.0, (30 + 60 + 90 + 120) / 4.0,
      120.0, 10.0))
    // width 2 → 6-byte rows are padded to 8: decode must skip padding
    assert(bmp.length == 54 + 16)
  }

  test("BMP resize: nearest-neighbor downsample with rebuilt header") {
    // 4x4 gradient image, factor 2 → 2x2 keeping pixels (0,0),(2,0),(0,2),(2,2)
    val pixels = Array.tabulate(48)(i => i.toByte)
    val bmp = Codec.encodeBmp(4, 4, pixels)
    val out = Codec.resizeBmp(bmp, 2)
    val img = Codec.decodeBmp(out)
    assert(img.width == 2 && img.height == 2)
    // pixel (x,y) of the original starts at (y*4+x)*3
    val expect = Seq(0, 2, 8, 10).flatMap(p => Seq(p * 3, p * 3 + 1, p * 3 + 2)).map(_.toByte)
    assert(img.pixels.toSeq == expect)
    // and the DataFrame-level resize reports the new dimensions in meta
    val df = Seq((1L, bmp)).toDF("doc_id", "content")
    val row = Multimodal.resize(df, "doc_id", 2)
      .select(col("meta.format"), col("meta.width"), col("meta.height")).head()
    assert(row.getString(0) == "image/bmp" && row.getInt(1) == 2 && row.getInt(2) == 2)
  }

  test("WAV codec: encode/decode round-trips samples, hand-computed features") {
    val samples = Array[Short](1000, -1000, 32767, -32768, 0, 500)
    val wav = Codec.encodeWavPcm16(8000, 1, samples)
    assert(Codec.detectFormat(wav).contains("audio/wav"))
    val got = Codec.decodeWav(wav)
    assert(got.sampleRate == 8000 && got.channels == 1)
    assert(got.samples.toSeq == samples.toSeq)
    val f = Codec.wavFeatures(wav)
    // [n, rate, channels, durationMs, mean, meanAbs, max, min]
    val sum = samples.map(_.toLong).sum
    val sumAbs = samples.map(s => math.abs(s.toLong)).sum
    assert(f.toSeq == Seq(6.0, 8000.0, 1.0, 0.0, sum / 6.0, sumAbs / 6.0, 32767.0, -32768.0))
  }

  test("decode dispatches on magic bytes: BMP/WAV real, other falls back") {
    val bmp = Codec.encodeBmp(1, 1, Array[Byte](1, 2, 3))
    assert(Multimodal.decode(bmp, 8).toSeq.take(3) == Seq(1.0, 1.0, 1.0))
    val wav = Codec.encodeWavPcm16(16000, 1, Array[Short](7))
    assert(Multimodal.decode(wav, 8)(1) == 16000.0)
    val txt = "ab".getBytes("UTF-8")
    assert(Multimodal.decode(txt, 8).toSeq == Multimodal.stubDecode(txt, 8).toSeq)
  }

  test("false-positive magic match degrades to the generic featurizer, not a task failure") {
    // a text payload starting "BM" matches the BMP sniff but is no BMP
    val fakeBmp = "BMW is a carmaker, not a bitmap header".getBytes("UTF-8")
    assert(Multimodal.decode(fakeBmp, 8).toSeq == Multimodal.stubDecode(fakeBmp, 8).toSeq)
    // a RIFF/WAVE container that is not PCM-16 (fmt=85 = MP3-in-WAV)
    val nonPcm = Codec.encodeWavPcm16(8000, 1, Array[Short](1, 2))
    nonPcm(20) = 85 // overwrite the fmt tag
    assert(Multimodal.decode(nonPcm, 8).toSeq == Multimodal.stubDecode(nonPcm, 8).toSeq)
    // truncated WAV: header claims more data than the payload carries
    val wav = Codec.encodeWavPcm16(8000, 1, Array[Short](1, 2, 3, 4))
    val truncated = wav.take(wav.length - 4)
    assert(Multimodal.decode(truncated, 8).toSeq == Multimodal.stubDecode(truncated, 8).toSeq)
    // end-to-end: one hostile blob among good ones must not fail the job
    val df = Seq((1L, fakeBmp), (2L, Codec.encodeBmp(1, 1, Array[Byte](9, 9, 9))))
      .toDF("doc_id", "content")
    assert(Multimodal.decodeFeatures(df, "doc_id").count() == 2)
    // resize likewise degrades instead of throwing
    assert(Multimodal.resize(Seq((1L, fakeBmp)).toDF("doc_id", "content"), "doc_id", 2)
      .select(col("meta.format")).head().getString(0) == "resized")
  }

  test("WAV chunk walk: data chunk before fmt still validates and decodes") {
    val samples = Array[Short](5, -5, 100)
    val wav = Codec.encodeWavPcm16(4000, 1, samples)
    // rebuild with the data chunk first: RIFF header, data, then fmt
    val fmtChunk = wav.slice(12, 36)
    val dataChunk = wav.slice(36, wav.length)
    val reordered = wav.slice(0, 12) ++ dataChunk ++ fmtChunk
    val got = Codec.decodeWav(reordered)
    assert(got.sampleRate == 4000 && got.samples.toSeq == samples.toSeq)
  }

  test("BMP: top-down (negative height) variant decodes; hostile headers fail loudly") {
    val pixels = Array[Byte](10, 20, 30, 40, 50, 60) // 1x2 image, rows (10,20,30) then (40,50,60)
    val bmp = Codec.encodeBmp(1, 2, pixels)
    // flip to top-down: height = -2, rows stored in display order
    val topDown = bmp.clone()
    topDown(22) = (-2 & 0xFF).toByte; topDown(23) = 0xFF.toByte
    topDown(24) = 0xFF.toByte; topDown(25) = 0xFF.toByte
    // bottom-up storage of (r0, r1) is (r1, r0); reinterpreted top-down it reads reversed
    val img = Codec.decodeBmp(topDown)
    assert(img.height == 2 && img.pixels.toSeq == Seq[Byte](40, 50, 60, 10, 20, 30))
    // width=0 and out-of-bounds offset are rejected with require, not AIOOBE
    val zeroW = bmp.clone(); zeroW(18) = 0; zeroW(19) = 0; zeroW(20) = 0; zeroW(21) = 0
    intercept[IllegalArgumentException](Codec.decodeBmp(zeroW))
    val badOff = bmp.clone(); badOff(10) = 0x7F; badOff(11) = 0x7F
    intercept[IllegalArgumentException](Codec.decodeBmp(badOff))
    intercept[IllegalArgumentException](Codec.decodeBmp("BM".getBytes("UTF-8")))
  }

  test("PNG codec: real zlib round trip for RGB and RGBA, hand-computed features") {
    val rgb = Array.tabulate[Byte](48)(i => (i * 5 % 251).toByte) // 4x4 RGB
    val png = Codec.encodePng(4, 4, 3, rgb)
    assert(Codec.detectFormat(png).contains("image/png"))
    val img = Codec.decodePng(png)
    assert(img.width == 4 && img.height == 4 && img.channels == 3)
    assert(img.pixels.toSeq == rgb.toSeq) // inflate + unfilter inverted the encoder
    val f = Codec.pngFeatures(png)
    val sums = Array(0L, 0L, 0L)
    rgb.zipWithIndex.foreach { case (b, i) => sums(i % 3) += b & 0xFF }
    assert(f(0) == 4.0 && f(1) == 4.0 && f(2) == 16.0)
    assert(f(3) == sums(0) / 16.0 && f(4) == sums(1) / 16.0 && f(5) == sums(2) / 16.0)
    // RGBA round trip
    val rgba = Array.tabulate[Byte](2 * 2 * 4)(i => (200 - i).toByte)
    val img4 = Codec.decodePng(Codec.encodePng(2, 2, 4, rgba))
    assert(img4.channels == 4 && img4.pixels.toSeq == rgba.toSeq)
  }

  test("PNG decoder inverts all five scanline filters") {
    // craft a 3x3 RGB raw stream with filters Sub/Up/Average/Paeth applied
    // manually, then wrap it in valid chunks: the decoder must reconstruct
    val w = 3; val h = 5; val bpp = 3; val stride = w * bpp
    val pixels = Array.tabulate[Byte](stride * h)(i => ((i * 37 + 11) % 256).toByte)
    def px(y: Int, x: Int): Int = pixels(y * stride + x) & 0xFF
    val raw = new java.io.ByteArrayOutputStream
    (0 until h).foreach { y =>
      val filter = y % 5 // one row per filter type
      raw.write(filter)
      (0 until stride).foreach { x =>
        val cur = px(y, x)
        val left = if (x >= bpp) px(y, x - bpp) else 0
        val up = if (y > 0) px(y - 1, x) else 0
        val upLeft = if (y > 0 && x >= bpp) px(y - 1, x - bpp) else 0
        val filtered = filter match {
          case 0 => cur
          case 1 => cur - left
          case 2 => cur - up
          case 3 => cur - (left + up) / 2
          case 4 =>
            val p = left + up - upLeft
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - upLeft)
            val pred = if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft
            cur - pred
        }
        raw.write(filtered & 0xFF)
      }
    }
    val deflater = new java.util.zip.Deflater
    deflater.setInput(raw.toByteArray); deflater.finish()
    val buf = new Array[Byte](4096); val comp = new java.io.ByteArrayOutputStream
    while (!deflater.finished()) comp.write(buf, 0, deflater.deflate(buf))
    deflater.end()
    val out = new java.io.ByteArrayOutputStream
    Array(137, 80, 78, 71, 13, 10, 26, 10).foreach(out.write)
    def chunk(kind: String, data: Array[Byte]): Unit = {
      def be(v: Int): Unit = { out.write(v >>> 24); out.write((v >>> 16) & 0xFF); out.write((v >>> 8) & 0xFF); out.write(v & 0xFF) }
      be(data.length)
      val kb = kind.getBytes("US-ASCII"); out.write(kb)
      out.write(data)
      val crc = new java.util.zip.CRC32; crc.update(kb); crc.update(data)
      be(crc.getValue.toInt)
    }
    val ihdr = new Array[Byte](13)
    ihdr(3) = w.toByte; ihdr(7) = h.toByte; ihdr(8) = 8; ihdr(9) = 2
    chunk("IHDR", ihdr); chunk("IDAT", comp.toByteArray); chunk("IEND", Array.emptyByteArray)
    val img = Codec.decodePng(out.toByteArray)
    assert(img.pixels.toSeq == pixels.toSeq, "all five filters must invert exactly")
  }

  test("PNG: CRC mismatch, truncation and unsupported variants fail loudly; resize works") {
    val png = Codec.encodePng(4, 4, 3, Array.tabulate[Byte](48)(_.toByte))
    val corrupt = png.clone(); corrupt(40) = (corrupt(40) ^ 0x01).toByte
    intercept[IllegalArgumentException](Codec.decodePng(corrupt))
    intercept[IllegalArgumentException](Codec.decodePng(png.take(30)))
    // grayscale (color type 0) is rejected, not mis-decoded: patch IHDR
    // color byte AND its CRC is wrong -> require fires either way
    val gray = png.clone(); gray(8 + 8 + 9) = 0
    intercept[IllegalArgumentException](Codec.decodePng(gray))
    val small = Codec.decodePng(Codec.resizePng(png, 2))
    assert(small.width == 2 && small.height == 2)
    // resize dispatch surfaces PNG dimensions in the metadata struct
    import spark.implicits._
    val df = Seq((1L, png)).toDF("doc_id", "content")
    val meta = Multimodal.resize(df, "doc_id", 2)
      .select("meta.format", "meta.width", "meta.height")
      .as[(String, Option[Int], Option[Int])].head()
    assert(meta == (("image/png", Some(2), Some(2))))
  }

  // frames sized/patterned to push the LZW dictionary through the 512,
  // 1024 and 2048 width boundaries (64×64 = 4096 indices per frame)
  private def gifFrames(n: Int): Seq[Array[Byte]] =
    (0 until n).map { f =>
      Array.tabulate(64 * 64) { i =>
        (((i * (f + 3)) ^ (i >> 3) ^ (f * 41)) & 0xFF).toByte
      }
    }

  test("GIF codec: multi-frame LZW round trip through width growth and KwKwK") {
    val frames = gifFrames(4) :+
      Array.fill(64 * 64)(7.toByte) :+               // constant frame → KwKwK chains
      Array.tabulate(64 * 64)(i => (i & 1).toByte)   // two-symbol alternation
    val bytes = Codec.encodeGif(64, 64, Codec.GrayPalette, frames)
    assert(Codec.detectFormat(bytes).contains("image/gif"))
    val gif = Codec.decodeGif(bytes)
    assert(gif.width == 64 && gif.height == 64 && gif.frames.length == frames.length)
    frames.zip(gif.frames).foreach { case (want, got) =>
      assert(java.util.Arrays.equals(want, got))
    }
  }

  test("GIF encoder output decodes identically under the JDK ImageIO reader") {
    val frames = gifFrames(3)
    val bytes = Codec.encodeGif(64, 64, Codec.GrayPalette, frames)
    val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
    reader.setInput(javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes)))
    val n = reader.getNumImages(true)
    assert(n == frames.length)
    (0 until n).foreach { f =>
      val img = reader.read(f)
      assert(img.getWidth == 64 && img.getHeight == 64)
      val want = frames(f)
      var i = 0
      while (i < 64 * 64) {
        val gray = img.getRGB(i % 64, i / 64) & 0xFF // gray palette: B == index
        assert(gray == (want(i) & 0xFF), s"frame $f pixel $i")
        i += 1
      }
    }
  }

  test("GIF decoder reads a JDK-ImageIO-written GIF (independent encoder)") {
    val w = 48; val h = 32
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_BYTE_INDEXED)
    (0 until h).foreach { y =>
      (0 until w).foreach(x => img.setRGB(x, y, ((x * 7 + y * 13) & 0xFF) * 0x010101))
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "gif", bos))
    val gif = Codec.decodeGif(bos.toByteArray)
    assert(gif.width == w && gif.height == h && gif.frames.length == 1)
    // compare through the palette: decoded index → RGB must equal the image
    val idx = gif.frames.head
    (0 until h).foreach { y =>
      (0 until w).foreach { x =>
        val rgb = gif.palette(idx(y * w + x) & 0xFF)
        assert((img.getRGB(x, y) & 0xFFFFFF) == rgb, s"pixel $x,$y")
      }
    }
  }

  test("GIF: malformed payloads fail loudly") {
    intercept[IllegalArgumentException](Codec.decodeGif(Array[Byte](1, 2, 3)))
    val ok = Codec.encodeGif(8, 8, Codec.GrayPalette, Seq(Array.fill(64)(0.toByte)))
    intercept[IllegalArgumentException](Codec.decodeGif(ok.dropRight(10))) // truncated
    intercept[IllegalArgumentException](
      Codec.encodeGif(8, 8, Codec.GrayPalette, Seq(Array.fill(63)(0.toByte))))
  }
}

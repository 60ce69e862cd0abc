package graft.operators

/** Pure-JVM binary codecs for the multimodal column pipeline: BMP (24-bpp
  * uncompressed) and WAV (16-bit PCM) — formats whose containers are plain
  * header + payload, parseable with no native libraries, which is what
  * this environment allows. They make [[Multimodal.decodeFeatures]] a REAL
  * decode for image/audio payloads (magic-byte dispatch) while arbitrary
  * formats still fall back to the generic byte-sum featurizer.
  *
  * All feature math accumulates in integers (exact, order-independent)
  * with one final division — the same bit-reproducibility contract as the
  * rest of the engine's oracle-checked operators.
  */
object Codec {

  // little-endian readers/writers over byte arrays
  private def u8(b: Array[Byte], i: Int): Int = b(i) & 0xFF
  private def u16(b: Array[Byte], i: Int): Int = u8(b, i) | (u8(b, i + 1) << 8)
  private def i32(b: Array[Byte], i: Int): Int =
    u8(b, i) | (u8(b, i + 1) << 8) | (u8(b, i + 2) << 16) | (u8(b, i + 3) << 24)
  private def putI32(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = v.toByte; b(i + 1) = (v >> 8).toByte
    b(i + 2) = (v >> 16).toByte; b(i + 3) = (v >> 24).toByte
  }
  private def putI16(b: Array[Byte], i: Int, v: Int): Unit = {
    b(i) = v.toByte; b(i + 1) = (v >> 8).toByte
  }

  /** Container sniff by magic bytes: BMP ("BM"), WAV ("RIFF"+"WAVE"). */
  def detectFormat(bytes: Array[Byte]): Option[String] =
    if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') Some("image/bmp")
    else if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E')
      Some("audio/wav")
    else None

  // ------------------------------------------------------------------ BMP

  /** Decoded 24-bpp image: BGR pixel bytes, row-major TOP-DOWN (the
    * decoder un-does BMP's bottom-up row order and strips row padding). */
  final case class Bmp(width: Int, height: Int, pixels: Array[Byte])

  /** Encode a 24-bpp uncompressed BMP: 54-byte header (BITMAPFILEHEADER +
    * BITMAPINFOHEADER), rows written bottom-up, each padded to 4 bytes.
    * `pixels` are BGR row-major top-down, length = 3·w·h. */
  def encodeBmp(width: Int, height: Int, pixels: Array[Byte]): Array[Byte] = {
    require(pixels.length == 3 * width * height,
      s"need ${3 * width * height} BGR bytes, got ${pixels.length}")
    val rowSize = ((width * 3 + 3) / 4) * 4
    val dataSize = rowSize * height
    val out = new Array[Byte](54 + dataSize)
    out(0) = 'B'; out(1) = 'M'
    putI32(out, 2, out.length) // file size
    putI32(out, 10, 54)        // pixel data offset
    putI32(out, 14, 40)        // DIB header size
    putI32(out, 18, width)
    putI32(out, 22, height)
    putI16(out, 26, 1)         // planes
    putI16(out, 28, 24)        // bpp
    putI32(out, 30, 0)         // BI_RGB, uncompressed
    putI32(out, 34, dataSize)
    var y = 0
    while (y < height) {
      val srcRow = (height - 1 - y) * width * 3 // write bottom-up
      System.arraycopy(pixels, srcRow, out, 54 + y * rowSize, width * 3)
      y += 1
    }
    out
  }

  /** Parse a 24-bpp uncompressed BMP; throws on other BMP variants or a
    * malformed/truncated header. Negative height (top-down row order) is
    * supported; every field that indexes into `bytes` is bounds-checked
    * first so hostile headers fail with a `require`, never an AIOOBE. */
  def decodeBmp(bytes: Array[Byte]): Bmp = {
    require(detectFormat(bytes).contains("image/bmp"), "not a BMP payload")
    require(bytes.length >= 54, s"BMP header truncated (${bytes.length} bytes)")
    val offset = i32(bytes, 10)
    val width = i32(bytes, 18)
    val rawHeight = i32(bytes, 22)
    val bpp = u16(bytes, 28)
    val compression = i32(bytes, 30)
    require(bpp == 24 && compression == 0, s"only 24-bpp uncompressed BMP (got bpp=$bpp comp=$compression)")
    // abs(Int.MinValue) is Int.MinValue — height must be checked POSITIVE
    // after the abs, or a hostile rawHeight slips through every bound and
    // blows up at the pixel allocation
    require(width > 0 && rawHeight != 0 && rawHeight != Int.MinValue,
      s"invalid BMP dimensions ${width}x$rawHeight")
    val topDown = rawHeight < 0 // negative height = rows stored top-down
    val height = math.abs(rawHeight)
    require(width.toLong * height * 3 <= Int.MaxValue, s"BMP too large (${width}x$height)")
    // row-size arithmetic in Long: width*3+3 overflows Int for width near
    // 715,827,883, producing a negative rowSize that passes the offset
    // bound check below
    val rowSizeL = ((width.toLong * 3 + 3) / 4) * 4
    require(offset >= 54 && offset.toLong + rowSizeL * height <= bytes.length,
      s"BMP pixel data out of bounds (offset=$offset rows=$height rowSize=$rowSizeL of ${bytes.length} bytes)")
    val rowSize = rowSizeL.toInt // ≤ bytes.length after the bound check
    val pixels = new Array[Byte](3 * width * height)
    var y = 0
    while (y < height) {
      val storedRow = if (topDown) y else height - 1 - y // default storage is bottom-up
      val srcRow = offset + storedRow * rowSize
      System.arraycopy(bytes, srcRow, pixels, y * width * 3, width * 3)
      y += 1
    }
    Bmp(width, height, pixels)
  }

  /** 8 image features: [width, height, nPixels, meanB, meanG, meanR,
    * maxChannelByte, minChannelByte]. Channel means are exact integer
    * sums divided once. */
  def bmpFeatures(bytes: Array[Byte]): Array[Double] = {
    val img = decodeBmp(bytes)
    val n = img.width * img.height
    val sums = new Array[Long](3)
    var mx = 0L; var mn = 255L
    var i = 0
    while (i < img.pixels.length) {
      val v = img.pixels(i) & 0xFF
      sums(i % 3) += v
      if (v > mx) mx = v
      if (v < mn) mn = v
      i += 1
    }
    Array(img.width.toDouble, img.height.toDouble, n.toDouble,
      sums(0) / n.toDouble, sums(1) / n.toDouble, sums(2) / n.toDouble,
      mx.toDouble, mn.toDouble)
  }

  /** Nearest-neighbor integer-factor downsample (every `factor`-th pixel
    * of every `factor`-th row), re-encoded as BMP. */
  def resizeBmp(bytes: Array[Byte], factor: Int): Array[Byte] = {
    require(factor >= 1, "factor must be >= 1")
    val img = decodeBmp(bytes)
    val w2 = math.max(1, img.width / factor)
    val h2 = math.max(1, img.height / factor)
    val out = new Array[Byte](3 * w2 * h2)
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) {
        val src = ((y * factor) * img.width + (x * factor)) * 3
        val dst = (y * w2 + x) * 3
        out(dst) = img.pixels(src); out(dst + 1) = img.pixels(src + 1); out(dst + 2) = img.pixels(src + 2)
        x += 1
      }
      y += 1
    }
    encodeBmp(w2, h2, out)
  }

  // ------------------------------------------------------------------ WAV

  /** Decoded 16-bit PCM audio. */
  final case class Wav(sampleRate: Int, channels: Int, samples: Array[Short]) {
    def durationMs: Long =
      if (sampleRate == 0 || channels == 0) 0L
      else samples.length.toLong * 1000L / (sampleRate.toLong * channels)
  }

  /** Encode 16-bit PCM mono/stereo WAV: RIFF header + "fmt " + "data". */
  def encodeWavPcm16(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    val dataSize = samples.length * 2
    val out = new Array[Byte](44 + dataSize)
    out(0) = 'R'; out(1) = 'I'; out(2) = 'F'; out(3) = 'F'
    putI32(out, 4, 36 + dataSize)
    out(8) = 'W'; out(9) = 'A'; out(10) = 'V'; out(11) = 'E'
    out(12) = 'f'; out(13) = 'm'; out(14) = 't'; out(15) = ' '
    putI32(out, 16, 16)            // fmt chunk size
    putI16(out, 20, 1)             // PCM
    putI16(out, 22, channels)
    putI32(out, 24, sampleRate)
    putI32(out, 28, sampleRate * channels * 2) // byte rate
    putI16(out, 32, channels * 2)  // block align
    putI16(out, 34, 16)            // bits per sample
    out(36) = 'd'; out(37) = 'a'; out(38) = 't'; out(39) = 'a'
    putI32(out, 40, dataSize)
    var i = 0
    while (i < samples.length) { putI16(out, 44 + 2 * i, samples(i)); i += 1 }
    out
  }

  /** Parse a PCM-16 WAV by walking RIFF chunks ("fmt " and "data" in any
    * order, unknown chunks skipped — real-world WAVs carry LIST/INFO).
    * The data chunk's POSITION is buffered during the walk and decoded
    * only after it completes, so fmt validation sees the fmt chunk even
    * when data precedes it; chunk sizes are bounds-checked so truncated
    * or hostile containers fail with a `require`, never an AIOOBE. */
  def decodeWav(bytes: Array[Byte]): Wav = {
    require(detectFormat(bytes).contains("audio/wav"), "not a WAV payload")
    var pos = 12
    var sampleRate = 0; var channels = 0; var bits = 0; var fmt = 0
    var haveFmt = false
    var dataPos = -1; var dataSize = 0
    while (pos + 8 <= bytes.length) {
      val id = new String(bytes, pos, 4, "US-ASCII")
      val size = i32(bytes, pos + 4)
      require(size >= 0 && pos + 8 + size.toLong <= bytes.length,
        s"malformed WAV chunk '$id' at $pos (size=$size of ${bytes.length} bytes)")
      id match {
        case "fmt " =>
          require(size >= 16, s"fmt chunk too small ($size bytes)")
          fmt = u16(bytes, pos + 8)
          channels = u16(bytes, pos + 10)
          sampleRate = i32(bytes, pos + 12)
          bits = u16(bytes, pos + 22)
          haveFmt = true
        case "data" =>
          dataPos = pos + 8; dataSize = size
        case _ => // skip unknown chunk
      }
      pos += 8 + size + (size & 1) // chunks are word-aligned
    }
    require(haveFmt, "WAV has no fmt chunk")
    require(fmt == 1 && bits == 16, s"only PCM-16 WAV (got fmt=$fmt bits=$bits)")
    require(dataPos >= 0, "WAV has no data chunk")
    val n = dataSize / 2
    val samples = new Array[Short](n)
    var k = 0
    while (k < n) { samples(k) = u16(bytes, dataPos + 2 * k).toShort; k += 1 }
    Wav(sampleRate, channels, samples)
  }

  /** 8 audio features: [nSamples, sampleRate, channels, durationMs,
    * meanSample, meanAbsSample, maxSample, minSample]. */
  def wavFeatures(bytes: Array[Byte]): Array[Double] = {
    val wav = decodeWav(bytes)
    val n = wav.samples.length
    var sum = 0L; var sumAbs = 0L
    var mx = Long.MinValue; var mn = Long.MaxValue
    var i = 0
    while (i < n) {
      val s = wav.samples(i).toLong
      sum += s; sumAbs += math.abs(s)
      if (s > mx) mx = s
      if (s < mn) mn = s
      i += 1
    }
    Array(n.toDouble, wav.sampleRate.toDouble, wav.channels.toDouble,
      wav.durationMs.toDouble,
      if (n == 0) 0.0 else sum / n.toDouble,
      if (n == 0) 0.0 else sumAbs / n.toDouble,
      if (n == 0) 0.0 else mx.toDouble,
      if (n == 0) 0.0 else mn.toDouble)
  }
}

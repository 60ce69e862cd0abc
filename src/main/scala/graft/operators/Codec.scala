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

  /** Ceiling on any single decoded image/audio buffer (pixels + per-row
    * filter bytes): executors decode a BATCH of cells per task, so one
    * cell claiming gigabytes is an input error, not a workload. */
  private[operators] val MaxDecodedBytes: Long = 256L * 1024 * 1024

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

  private val PngSignature: Array[Int] = Array(137, 80, 78, 71, 13, 10, 26, 10)

  /** Container sniff by magic bytes: BMP ("BM"), WAV ("RIFF"+"WAVE"),
    * PNG (8-byte signature). */
  def detectFormat(bytes: Array[Byte]): Option[String] =
    if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') Some("image/bmp")
    else if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' && bytes(11) == 'E')
      Some("audio/wav")
    else if (bytes.length >= 8 && (0 until 8).forall(i => (bytes(i) & 0xFF) == PngSignature(i)))
      Some("image/png")
    else if (bytes.length >= 6 && bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == '8' && (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a')
      Some("image/gif")
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

  // ------------------------------------------------------------------ PNG

  /** Decoded PNG: 8-bit RGB (channels=3) or RGBA (channels=4) samples,
    * row-major top-down. */
  final case class Png(width: Int, height: Int, channels: Int, pixels: Array[Byte])

  // big-endian readers/writers (PNG chunk framing is network order)
  private def i32be(b: Array[Byte], i: Int): Int =
    (u8(b, i) << 24) | (u8(b, i + 1) << 16) | (u8(b, i + 2) << 8) | u8(b, i + 3)
  private def putI32be(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >>> 24) & 0xFF); out.write((v >>> 16) & 0xFF)
    out.write((v >>> 8) & 0xFF); out.write(v & 0xFF)
  }

  private def pngChunk(out: java.io.ByteArrayOutputStream, kind: String, data: Array[Byte]): Unit = {
    putI32be(out, data.length)
    val kb = kind.getBytes("US-ASCII")
    out.write(kb, 0, 4)
    out.write(data, 0, data.length)
    val crc = new java.util.zip.CRC32
    crc.update(kb); crc.update(data)
    putI32be(out, crc.getValue.toInt)
  }

  /** Encode an 8-bit RGB/RGBA PNG: IHDR + one deflated IDAT (every
    * scanline filter 0) + IEND, CRC32 per chunk. Lossless: decodePng
    * returns exactly `pixels`. */
  def encodePng(width: Int, height: Int, channels: Int, pixels: Array[Byte]): Array[Byte] = {
    require(channels == 3 || channels == 4, s"channels must be 3 or 4, got $channels")
    require(pixels.length == channels * width * height,
      s"need ${channels * width * height} bytes, got ${pixels.length}")
    val out = new java.io.ByteArrayOutputStream
    PngSignature.foreach(out.write)
    val ihdr = new Array[Byte](13)
    ihdr(0) = (width >>> 24).toByte; ihdr(1) = (width >>> 16).toByte
    ihdr(2) = (width >>> 8).toByte; ihdr(3) = width.toByte
    ihdr(4) = (height >>> 24).toByte; ihdr(5) = (height >>> 16).toByte
    ihdr(6) = (height >>> 8).toByte; ihdr(7) = height.toByte
    ihdr(8) = 8 // bit depth
    ihdr(9) = (if (channels == 3) 2 else 6).toByte // color type RGB / RGBA
    ihdr(10) = 0; ihdr(11) = 0; ihdr(12) = 0 // deflate, adaptive filters, no interlace
    pngChunk(out, "IHDR", ihdr)
    val stride = width * channels
    val raw = new Array[Byte]((stride + 1) * height)
    var y = 0
    while (y < height) {
      raw(y * (stride + 1)) = 0 // filter type None per scanline
      System.arraycopy(pixels, y * stride, raw, y * (stride + 1) + 1, stride)
      y += 1
    }
    val deflater = new java.util.zip.Deflater
    deflater.setInput(raw); deflater.finish()
    val buf = new Array[Byte](math.max(1024, raw.length + 64))
    val comp = new java.io.ByteArrayOutputStream
    while (!deflater.finished()) {
      val n = deflater.deflate(buf)
      comp.write(buf, 0, n)
    }
    deflater.end()
    pngChunk(out, "IDAT", comp.toByteArray)
    pngChunk(out, "IEND", Array.emptyByteArray)
    out.toByteArray
  }

  /** Parse an 8-bit RGB/RGBA non-interlaced PNG — a REAL decoder: chunk
    * walk with CRC32 verification, concatenated-IDAT zlib inflate
    * (java.util.zip.Inflater), and per-scanline unfiltering of all five
    * PNG filter types (None/Sub/Up/Average/Paeth, RFC 2083 §6). Throws
    * on other color types/bit depths, interlacing, truncation, CRC
    * mismatch, or inflate errors — hostile containers fail with a
    * require/IO error, never a corrupt image. */
  def decodePng(bytes: Array[Byte]): Png = {
    require(detectFormat(bytes).contains("image/png"), "not a PNG payload")
    var pos = 8
    var width = 0; var height = 0; var channels = 0
    var haveIhdr = false; var sawIend = false
    val idat = new java.io.ByteArrayOutputStream
    while (pos + 8 <= bytes.length && !sawIend) {
      val len = i32be(bytes, pos)
      require(len >= 0 && pos + 12L + len <= bytes.length,
        s"malformed PNG chunk at $pos (len=$len of ${bytes.length} bytes)")
      val kind = new String(bytes, pos + 4, 4, "US-ASCII")
      val crc = new java.util.zip.CRC32
      crc.update(bytes, pos + 4, 4 + len)
      require(crc.getValue.toInt == i32be(bytes, pos + 8 + len),
        s"PNG chunk '$kind' CRC mismatch at $pos")
      kind match {
        case "IHDR" =>
          require(len == 13, s"IHDR length $len")
          width = i32be(bytes, pos + 8)
          height = i32be(bytes, pos + 12)
          val bitDepth = u8(bytes, pos + 16)
          val colorType = u8(bytes, pos + 17)
          val interlace = u8(bytes, pos + 20)
          require(width > 0 && height > 0, s"invalid PNG dimensions ${width}x$height")
          require(bitDepth == 8 && (colorType == 2 || colorType == 6) && interlace == 0,
            s"only 8-bit RGB/RGBA non-interlaced PNG (depth=$bitDepth color=$colorType interlace=$interlace)")
          channels = if (colorType == 2) 3 else 4
          // cap the DECODED size (pixels + one filter byte per row —
          // the raw buffer is (stride+1)*height, so a pixel-only cap at
          // Int.MaxValue could overflow the allocation size negative
          // and a hostile header could demand a ~2 GiB buffer before
          // the zlib stream validates a single byte)
          require(width.toLong * height * channels + height <= MaxDecodedBytes,
            s"PNG too large (${width}x$height x$channels > $MaxDecodedBytes decoded bytes)")
          haveIhdr = true
        case "IDAT" => idat.write(bytes, pos + 8, len)
        case "IEND" => sawIend = true
        case _ => // ancillary chunk (tEXt, pHYs, ...) — skip
      }
      pos += 12 + len
    }
    require(haveIhdr, "PNG has no IHDR chunk")
    require(idat.size() > 0, "PNG has no IDAT data")
    val stride = width * channels
    val raw = new Array[Byte]((stride + 1) * height)
    val inflater = new java.util.zip.Inflater
    inflater.setInput(idat.toByteArray)
    var off = 0
    try {
      while (off < raw.length && !inflater.finished()) {
        val n = inflater.inflate(raw, off, raw.length - off)
        require(n > 0 || inflater.finished(), "PNG inflate stalled (truncated IDAT)")
        off += n
      }
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(s"PNG IDAT not valid zlib: ${e.getMessage}")
    } finally inflater.end()
    require(off == raw.length, s"PNG pixel data truncated ($off of ${raw.length} bytes)")
    // unfilter scanlines in place into the output array
    val px = new Array[Byte](stride * height)
    val bpp = channels
    var y = 0
    while (y < height) {
      val filter = raw(y * (stride + 1)) & 0xFF
      val rowIn = y * (stride + 1) + 1
      val rowOut = y * stride
      var x = 0
      while (x < stride) {
        val cur = raw(rowIn + x) & 0xFF
        val left = if (x >= bpp) px(rowOut + x - bpp) & 0xFF else 0
        val up = if (y > 0) px(rowOut - stride + x) & 0xFF else 0
        val upLeft = if (y > 0 && x >= bpp) px(rowOut - stride + x - bpp) & 0xFF else 0
        val recon = filter match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case 4 => // Paeth predictor
            val p = left + up - upLeft
            val pa = math.abs(p - left); val pb = math.abs(p - up); val pc = math.abs(p - upLeft)
            val pred = if (pa <= pb && pa <= pc) left else if (pb <= pc) up else upLeft
            cur + pred
          case f => throw new IllegalArgumentException(s"unknown PNG filter type $f in row $y")
        }
        px(rowOut + x) = (recon & 0xFF).toByte
        x += 1
      }
      y += 1
    }
    Png(width, height, channels, px)
  }

  /** 8 image features (same layout as [[bmpFeatures]]): [width, height,
    * nPixels, meanC0, meanC1, meanC2, maxChannelByte, minChannelByte] —
    * channel means over the first three channels (alpha, when present,
    * contributes to extrema only through its own channel class being
    * skipped). Integer-accumulated, one division each. */
  def pngFeatures(bytes: Array[Byte]): Array[Double] = {
    val img = decodePng(bytes)
    val n = img.width * img.height
    val sums = new Array[Long](3)
    var mx = 0L; var mn = 255L
    var i = 0
    while (i < img.pixels.length) {
      val v = img.pixels(i) & 0xFF
      val ch = i % img.channels
      if (ch < 3) sums(ch) += v
      if (v > mx) mx = v
      if (v < mn) mn = v
      i += 1
    }
    Array(img.width.toDouble, img.height.toDouble, n.toDouble,
      sums(0) / n.toDouble, sums(1) / n.toDouble, sums(2) / n.toDouble,
      mx.toDouble, mn.toDouble)
  }

  /** Nearest-neighbor integer-factor PNG downsample, re-encoded. */
  def resizePng(bytes: Array[Byte], factor: Int): Array[Byte] = {
    require(factor >= 1, "factor must be >= 1")
    val img = decodePng(bytes)
    val w2 = math.max(1, img.width / factor)
    val h2 = math.max(1, img.height / factor)
    val c = img.channels
    val out = new Array[Byte](c * w2 * h2)
    var y = 0
    while (y < h2) {
      var x = 0
      while (x < w2) {
        val src = ((y * factor) * img.width + (x * factor)) * c
        val dst = (y * w2 + x) * c
        var k = 0
        while (k < c) { out(dst + k) = img.pixels(src + k); k += 1 }
        x += 1
      }
      y += 1
    }
    encodePng(w2, h2, c, out)
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

  // ------------------------------------------------------------------ GIF

  /** Decoded GIF: per-frame palette INDICES (full logical-screen rects)
    * plus the global color table as packed 0xRRGGBB ints. The multi-frame
    * container behind real frame sampling (GIF 89a, LZW §Appendix F). */
  final case class Gif(width: Int, height: Int, palette: Array[Int],
      frames: Vector[Array[Byte]])

  /** LZW-compress palette indices (GIF variant: LSB-first bit packing,
    * variable 9→12-bit codes, clear/eoi codes, dictionary reset at 4096).
    * The width-advance rule mirrors [[lzwDecode]] position for position —
    * the pair is round-trip spec-checked against the JDK's ImageIO GIF
    * plugin in BOTH directions, so the bit-level details are pinned to an
    * independent implementation, not to each other. */
  private def lzwEncode(indices: Array[Byte], minCodeSize: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream(indices.length / 2 + 16)
    var bitBuf = 0L
    var bitCnt = 0
    var width = minCodeSize + 1
    def put(code: Int): Unit = {
      bitBuf |= code.toLong << bitCnt
      bitCnt += width
      while (bitCnt >= 8) { out.write((bitBuf & 0xFF).toInt); bitBuf >>>= 8; bitCnt -= 8 }
    }
    var dict = new java.util.HashMap[Integer, Integer]()
    var next = eoi + 1
    put(clear)
    if (indices.nonEmpty) {
      var cur = indices(0) & 0xFF
      var i = 1
      while (i < indices.length) {
        val k = indices(i) & 0xFF
        val key: Integer = (cur << 8) | k
        val hit = dict.get(key)
        if (hit != null) cur = hit.intValue()
        else {
          put(cur)
          if (next < 4096) {
            dict.put(key, next)
            next += 1
            // a future code `next-1` needs one more bit once it reaches
            // 2^width — grow BEFORE it can be emitted (decoder mirror)
            if (next == (1 << width) + 1 && width < 12) width += 1
          } else { // dictionary full: reset, like every mainstream writer
            put(clear)
            dict = new java.util.HashMap[Integer, Integer]()
            next = eoi + 1
            width = minCodeSize + 1
          }
          cur = k
        }
        i += 1
      }
      put(cur)
    }
    put(eoi)
    if (bitCnt > 0) out.write((bitBuf & 0xFF).toInt)
    out.toByteArray
  }

  /** LZW-decompress exactly `expected` palette indices. Handles the
    * KwKwK case (code == next), clear-code resets, and the deferred
    * width growth matching [[lzwEncode]]. */
  private def lzwDecode(data: Array[Byte], minCodeSize: Int, expected: Int): Array[Byte] = {
    val clear = 1 << minCodeSize
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Byte](4096)
    val length = new Array[Int](4096)
    var c = 0
    while (c < clear) { prefix(c) = -1; suffix(c) = c.toByte; length(c) = 1; c += 1 }
    var next = eoi + 1
    var width = minCodeSize + 1
    val out = new Array[Byte](expected)
    var oi = 0
    var bitBuf = 0L
    var bitCnt = 0
    var pos = 0
    def read(): Int = {
      while (bitCnt < width && pos < data.length) {
        bitBuf |= (data(pos) & 0xFFL) << bitCnt; pos += 1; bitCnt += 8
      }
      require(bitCnt >= width, "LZW stream truncated")
      val code = (bitBuf & ((1L << width) - 1)).toInt
      bitBuf >>>= width; bitCnt -= width
      code
    }
    // expand `code` into out; returns its FIRST index byte
    def emit(code: Int): Byte = {
      val l = length(code)
      require(oi + l <= expected, s"LZW expansion overruns frame ($oi + $l > $expected)")
      var cc = code
      var j = oi + l - 1
      while (cc >= 0) { out(j) = suffix(cc); j -= 1; cc = prefix(cc) }
      oi += l
      out(oi - l)
    }
    var prev = -1
    var done = false
    while (!done && oi < expected) {
      val code = read()
      if (code == clear) { next = eoi + 1; width = minCodeSize + 1; prev = -1 }
      else if (code == eoi) done = true
      else if (prev < 0) {
        require(code < clear, s"first LZW code $code after clear is not a root")
        emit(code)
        prev = code
      } else {
        require(code < next && code != eoi || code == next, s"LZW code $code out of range (next=$next)")
        val first: Byte =
          if (code == next) { // KwKwK: expansion = expand(prev) + first(prev)
            require(next < 4096, "KwKwK with full dictionary")
            val f = suffix(rootFirst(prefix, prev))
            // temporary entry so emit() can expand it
            prefix(next) = prev; suffix(next) = f; length(next) = length(prev) + 1
            emit(code)
          } else emit(code)
        if (next < 4096) {
          prefix(next) = prev
          suffix(next) = first
          length(next) = length(prev) + 1
          next += 1
          // the decoder's dictionary lags the encoder's by ONE entry at
          // equal stream positions (the encoder adds on emit, the decoder
          // one code later), so its growth threshold is 2^w where the
          // encoder's is 2^w + 1 — the classic GIF off-by-one
          if (next == (1 << width) && width < 12) width += 1
        }
        prev = code
      }
    }
    require(oi == expected, s"LZW decoded $oi of $expected indices")
    out
  }

  /** Walk a code's prefix chain to its root (first-byte lookup). */
  private def rootFirst(prefix: Array[Int], code: Int): Int = {
    var c = code
    while (prefix(c) >= 0) c = prefix(c)
    c
  }

  /** Encode a multi-frame GIF89a: one global 256-entry color table,
    * every frame a full logical-screen rect of palette indices, no
    * transparency/disposal extensions (frames fully replace). */
  def encodeGif(width: Int, height: Int, palette: Array[Int],
      frames: Seq[Array[Byte]]): Array[Byte] = {
    require(width > 0 && height > 0 && width <= 0xFFFF && height <= 0xFFFF,
      s"invalid GIF dimensions ${width}x$height")
    require(palette.length == 256, s"palette must have 256 entries (got ${palette.length})")
    require(frames.nonEmpty, "GIF needs at least one frame")
    frames.foreach(f => require(f.length == width * height,
      s"frame has ${f.length} indices for ${width}x$height"))
    val out = new java.io.ByteArrayOutputStream()
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(width & 0xFF); out.write(width >> 8)
    out.write(height & 0xFF); out.write(height >> 8)
    out.write(0xF7) // GCT present, 8 bits/channel, 256 entries
    out.write(0)    // background color index
    out.write(0)    // aspect
    palette.foreach { rgb =>
      out.write((rgb >> 16) & 0xFF); out.write((rgb >> 8) & 0xFF); out.write(rgb & 0xFF)
    }
    frames.foreach { frame =>
      out.write(0x2C) // image descriptor
      out.write(0); out.write(0); out.write(0); out.write(0) // left, top
      out.write(width & 0xFF); out.write(width >> 8)
      out.write(height & 0xFF); out.write(height >> 8)
      out.write(0) // no local table, not interlaced
      out.write(8) // LZW min code size
      val lzw = lzwEncode(frame, 8)
      var off = 0
      while (off < lzw.length) {
        val n = math.min(255, lzw.length - off)
        out.write(n)
        out.write(lzw, off, n)
        off += n
      }
      out.write(0) // block terminator
    }
    out.write(0x3B) // trailer
    out.toByteArray
  }

  /** Parse a GIF87a/89a — a REAL decoder: logical screen + global color
    * table, extension blocks skipped by sub-block walk, every image
    * descriptor LZW-decompressed (variable-width codes, KwKwK, clear
    * resets). Restrictions (loud, not silent): no interlace, no local
    * color tables, full-rect frames only — exactly what [[encodeGif]]
    * and typical synthetic/screen-capture GIFs produce. */
  def decodeGif(bytes: Array[Byte]): Gif = {
    require(detectFormat(bytes).contains("image/gif"), "not a GIF payload")
    var pos = 6
    def u8g(): Int = { require(pos < bytes.length, "GIF truncated"); val v = bytes(pos) & 0xFF; pos += 1; v }
    def u16g(): Int = { val lo = u8g(); val hi = u8g(); lo | (hi << 8) }
    val width = u16g()
    val height = u16g()
    require(width > 0 && height > 0, s"invalid GIF dimensions ${width}x$height")
    val packed = u8g()
    u8g() // background index
    u8g() // aspect
    val gctSize = if ((packed & 0x80) != 0) 2 << (packed & 7) else 0
    val palette = new Array[Int](256)
    var i = 0
    while (i < gctSize) {
      palette(i) = (u8g() << 16) | (u8g() << 8) | u8g()
      i += 1
    }
    val frames = Vector.newBuilder[Array[Byte]]
    var done = false
    while (!done) {
      u8g() match {
        case 0x3B => done = true
        case 0x21 => // extension: label + sub-blocks
          u8g()
          var n = u8g()
          while (n != 0) { pos += n; n = u8g() }
        case 0x2C =>
          val left = u16g(); val top = u16g()
          val fw = u16g(); val fh = u16g()
          val fpacked = u8g()
          require(left == 0 && top == 0 && fw == width && fh == height,
            s"only full-rect frames supported (got ${fw}x$fh at $left,$top)")
          require((fpacked & 0x80) == 0, "local color tables not supported")
          val interlaced = (fpacked & 0x40) != 0
          val minCode = u8g()
          require(minCode >= 2 && minCode <= 8, s"bad LZW min code size $minCode")
          val data = new java.io.ByteArrayOutputStream()
          var n = u8g()
          while (n != 0) {
            require(pos + n <= bytes.length, "GIF image data truncated")
            data.write(bytes, pos, n); pos += n
            n = u8g()
          }
          val raw = lzwDecode(data.toByteArray, minCode, width * height)
          frames += (if (interlaced) deinterlace(raw, width, height) else raw)
        case other => throw new IllegalArgumentException(
          f"unknown GIF block 0x$other%02X at ${pos - 1}")
      }
    }
    val fs = frames.result()
    require(fs.nonEmpty, "GIF contains no image frames")
    Gif(width, height, palette, fs)
  }

  /** Undo GIF 4-pass interlacing: stored row order is rows 0,8,16,… then
    * 4,12,… then 2,6,10,… then 1,3,5,… (GIF89a spec, appendix E). */
  private def deinterlace(raw: Array[Byte], width: Int, height: Int): Array[Byte] = {
    val out = new Array[Byte](raw.length)
    val passes = Array((0, 8), (4, 8), (2, 4), (1, 2))
    var src = 0
    passes.foreach { case (start, step) =>
      var y = start
      while (y < height) {
        System.arraycopy(raw, src * width, out, y * width, width)
        src += 1
        y += step
      }
    }
    out
  }

  /** The standard 256-entry grayscale palette (index i → gray i,i,i). */
  val GrayPalette: Array[Int] = Array.tabulate(256)(i => (i << 16) | (i << 8) | i)
}

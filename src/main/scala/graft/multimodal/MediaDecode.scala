package graft.multimodal

/** Real, zero-dependency decode kernels for the formats that are pure byte
  * layout or only need the JDK's zlib — no codec library:
  *
  *  - BMP (BI_RGB 24/32-bit): header parse + pixel access → 8×8 mean-luma
  *    grid, the classic perceptual-hash feature (and the real base for
  *    image near-dup at scale).
  *  - PNG (8/16-bit, color types 0/2/3/4/6, non-interlaced): chunk walk →
  *    `java.util.zip.Inflater` → Sub/Up/Average/Paeth unfiltering → the same
  *    mean-luma grid. Covers the most common image format with zero deps;
  *    the row unfilter is shared with PDF /Predictor decoding
  *    ([[pngUnfilter]]).
  *  - WAV (PCM 8/16-bit): RIFF chunk walk → duration + N-bin RMS envelope,
  *    the audio-fingerprint baseline.
  *
  * JPEG (baseline AND progressive) decodes for real too ([[JpegDecode]],
  * luma channel). MP3/MP4 remain the documented stub in
  * [[Multimodal.fakeDecodeFeatures]] — those genuinely need codec libraries
  * absent from this offline build. Every parser here throws
  * IllegalArgumentException on malformed/unsupported input; callers decide
  * whether to fall back.
  */
private[graft] object MediaDecode {

  @inline private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)
  @inline private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)

  def isBmp(b: Array[Byte]): Boolean =
    b.length > 54 && b(0) == 'B' && b(1) == 'M'

  def isWav(b: Array[Byte]): Boolean =
    b.length > 44 && b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'

  // ------------------------------------------------------------------- BMP

  private final case class Bmp(
      width: Int, height: Int, topDown: Boolean, bpp: Int,
      dataOffset: Int, rowSize: Int, bytes: Array[Byte]) {
    /** Luminance in [0,1] at display coordinates (x left→right, y top→down). */
    def luma(x: Int, y: Int): Double = {
      val row = if (topDown) y else height - 1 - y
      val off = dataOffset + row * rowSize + x * (bpp / 8)
      val bl = bytes(off) & 0xff
      val g = bytes(off + 1) & 0xff
      val r = bytes(off + 2) & 0xff
      (0.299 * r + 0.587 * g + 0.114 * bl) / 255.0
    }
  }

  private def parseBmp(b: Array[Byte]): Bmp = {
    require(isBmp(b), "not a BMP")
    val dataOffset = le32(b, 10)
    val width = le32(b, 18)
    val heightRaw = le32(b, 22)
    val bpp = le16(b, 28)
    val compression = le32(b, 30)
    // all bounds in Long with hard dimension caps: crafted headers must not
    // be able to overflow Int arithmetic into a "valid" bounds check and
    // then AIOOBE out of the IllegalArgumentException fallback contract
    val MaxDim = 1 << 16
    if (width <= 0 || width > MaxDim || heightRaw == 0 || heightRaw == Int.MinValue ||
        math.abs(heightRaw) > MaxDim)
      throw new IllegalArgumentException(s"bad BMP dimensions ${width}x$heightRaw")
    if (bpp != 24 && bpp != 32)
      throw new IllegalArgumentException(s"unsupported BMP bpp $bpp (24/32 only)")
    if (compression != 0)
      throw new IllegalArgumentException(s"unsupported BMP compression $compression")
    if (dataOffset < 54)
      throw new IllegalArgumentException(s"bad BMP data offset $dataOffset")
    val height = math.abs(heightRaw)
    val rowSize = ((width.toLong * (bpp / 8) + 3) / 4) * 4
    if (dataOffset.toLong + rowSize * height > b.length)
      throw new IllegalArgumentException("truncated BMP pixel data")
    Bmp(width, height, heightRaw < 0, bpp, dataOffset, rowSize.toInt, b)
  }

  def bmpSize(b: Array[Byte]): (Int, Int) = {
    val p = parseBmp(b); (p.width, p.height)
  }

  /** grid×grid mean-luminance feature in [0,1], row-major — block means over
    * the image (blocks clamped to ≥1 px so tiny images still map cleanly).
    */
  def bmpLumaGrid(b: Array[Byte], grid: Int = 8): Array[Float] = {
    val img = parseBmp(b)
    lumaGridOf(img.width, img.height, grid, img.luma)
  }

  /** Shared block-mean grid: same arithmetic for every raster source. */
  private[multimodal] def lumaGridOf(
      width: Int, height: Int, grid: Int, luma: (Int, Int) => Double): Array[Float] = {
    val out = new Array[Float](grid * grid)
    var gy = 0
    while (gy < grid) {
      val y0 = gy * height / grid
      val y1 = math.max(y0 + 1, (gy + 1) * height / grid)
      var gx = 0
      while (gx < grid) {
        val x0 = gx * width / grid
        val x1 = math.max(x0 + 1, (gx + 1) * width / grid)
        var sum = 0.0
        var y = y0
        while (y < math.min(y1, height)) {
          var x = x0
          while (x < math.min(x1, width)) { sum += luma(x, y); x += 1 }
          y += 1
        }
        val n = (math.min(y1, height) - y0) * (math.min(x1, width) - x0)
        out(gy * grid + gx) = (sum / math.max(1, n)).toFloat
        gx += 1
      }
      gy += 1
    }
    out
  }

  // ------------------------------------------------------------------- PNG

  private val PngSignature =
    Array(0x89, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  def isPng(b: Array[Byte]): Boolean =
    b.length > 8 && (0 until 8).forall(i => b(i) == PngSignature(i))

  @inline private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 24) | ((b(off + 1) & 0xff) << 16) |
      ((b(off + 2) & 0xff) << 8) | (b(off + 3) & 0xff)

  private final case class Png(
      width: Int, height: Int, colorType: Int, bitDepth: Int,
      channels: Int, palette: Array[Byte], pixels: Array[Byte]) {
    private val sampleBytes = bitDepth / 8 // 1 or 2; 16-bit reads the high byte
    private val pixBytes = channels * sampleBytes
    private val rowBytes = width * pixBytes

    /** Luminance in [0,1]; alpha ignored (features are content, not blending). */
    def luma(x: Int, y: Int): Double = {
      val off = y * rowBytes + x * pixBytes
      colorType match {
        case 0 | 4 => (pixels(off) & 0xff) / 255.0 // gray / gray+alpha
        case 2 | 6 => // RGB / RGBA
          val r = pixels(off) & 0xff
          val g = pixels(off + sampleBytes) & 0xff
          val bl = pixels(off + 2 * sampleBytes) & 0xff
          (0.299 * r + 0.587 * g + 0.114 * bl) / 255.0
        case 3 => // palette index → PLTE rgb
          val idx = (pixels(off) & 0xff) * 3
          val r = palette(idx) & 0xff
          val g = palette(idx + 1) & 0xff
          val bl = palette(idx + 2) & 0xff
          (0.299 * r + 0.587 * g + 0.114 * bl) / 255.0
      }
    }
  }

  private def pngChannels(colorType: Int): Int = colorType match {
    case 0 => 1 // grayscale
    case 2 => 3 // rgb
    case 3 => 1 // palette index
    case 4 => 2 // gray + alpha
    case 6 => 4 // rgba
    case other => throw new IllegalArgumentException(s"bad PNG color type $other")
  }

  private def parsePng(b: Array[Byte]): Png = {
    require(isPng(b), "not a PNG")
    val MaxDim = 1 << 16
    var off = 8
    var width, height, colorType, bitDepth = -1
    var palette: Array[Byte] = null
    val idat = new java.io.ByteArrayOutputStream()
    var done = false
    while (!done && off + 8 <= b.length) {
      val len = be32(b, off)
      if (len < 0 || off.toLong + 12L + len > b.length)
        throw new IllegalArgumentException("truncated PNG chunk")
      val ctype = new String(b, off + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)
      ctype match {
        case "IHDR" =>
          if (len < 13) throw new IllegalArgumentException("short IHDR")
          width = be32(b, off + 8)
          height = be32(b, off + 12)
          bitDepth = b(off + 16) & 0xff
          colorType = b(off + 17) & 0xff
          val interlace = b(off + 20) & 0xff
          if (width <= 0 || width > MaxDim || height <= 0 || height > MaxDim)
            throw new IllegalArgumentException(s"bad PNG dimensions ${width}x$height")
          if (width.toLong * height > (1L << 26))
            throw new IllegalArgumentException(
              s"PNG area ${width}x$height exceeds pixel cap") // deflate-bomb guard, same cap as GIF/JPEG
          if (bitDepth != 8 && bitDepth != 16)
            throw new IllegalArgumentException(s"unsupported PNG bit depth $bitDepth (8/16 only)")
          if (colorType == 3 && bitDepth != 8)
            throw new IllegalArgumentException("palette PNG requires bit depth 8")
          if (interlace != 0)
            throw new IllegalArgumentException("interlaced PNG unsupported")
        case "PLTE" => palette = java.util.Arrays.copyOfRange(b, off + 8, off + 8 + len)
        case "IDAT" => idat.write(b, off + 8, len)
        case "IEND" => done = true
        case _ => () // ancillary chunks skipped
      }
      off += 12 + len // length + type + data + crc
    }
    if (width < 0) throw new IllegalArgumentException("PNG missing IHDR")
    if (idat.size() == 0) throw new IllegalArgumentException("PNG missing IDAT")
    val channels = pngChannels(colorType)
    if (colorType == 3 && (palette == null || palette.length % 3 != 0 || palette.isEmpty))
      throw new IllegalArgumentException("palette PNG missing/bad PLTE")
    val pixBytes = channels * (bitDepth / 8)
    val rowBytes = width * pixBytes
    val raw = inflate(idat.toByteArray, (rowBytes + 1).toLong * height)
    val pixels = pngUnfilter(raw, rowBytes, pixBytes, height)
    if (colorType == 3) {
      // validate indices up front so luma() can't AIOOBE past the palette
      val maxIdx = palette.length / 3
      var i = 0
      while (i < pixels.length) {
        if ((pixels(i) & 0xff) >= maxIdx)
          throw new IllegalArgumentException("PNG palette index out of range")
        i += 1
      }
    }
    Png(width, height, colorType, bitDepth, channels, palette, pixels)
  }

  /** zlib-inflate exactly `expected` bytes (short/long streams both reject —
    * a wrong-size stream means a corrupt or lying header).
    */
  private def inflate(data: Array[Byte], expected: Long): Array[Byte] = {
    if (expected > Int.MaxValue - 8)
      throw new IllegalArgumentException("PNG raster too large")
    val inf = new java.util.zip.Inflater()
    try {
      inf.setInput(data)
      val out = new Array[Byte](expected.toInt)
      var total = 0
      while (total < out.length && !inf.finished()) {
        val n = inf.inflate(out, total, out.length - total)
        // n == 0 while unfinished covers truncation (needsInput), preset-
        // dictionary streams (needsDictionary — inflate returns 0 forever,
        // a hang if only needsInput were checked), and any other stall
        if (n == 0 && !inf.finished())
          throw new IllegalArgumentException("truncated or unsupported zlib stream")
        total += n
      }
      if (total < out.length)
        throw new IllegalArgumentException("short PNG IDAT stream")
      out
    } catch {
      case e: java.util.zip.DataFormatException =>
        throw new IllegalArgumentException(s"bad zlib stream: ${e.getMessage}")
    } finally inf.end()
  }

  /** PNG row unfiltering (filters 0-4: None/Sub/Up/Average/Paeth) over
    * `height` rows of `rowBytes` bytes, each preceded by its filter-type
    * byte; `bpp` is the filter delta distance in bytes. Returns the
    * reconstructed scanlines without filter bytes.
    *
    * Shared with PDF stream /Predictor >= 10 decoding (PdfExtract) — the
    * PDF spec defines those predictors as exactly these PNG filters.
    */
  private[graft] def pngUnfilter(
      raw: Array[Byte], rowBytes: Int, bpp: Int, height: Int): Array[Byte] = {
    if (raw.length < (rowBytes + 1).toLong * height)
      throw new IllegalArgumentException("short filtered stream")
    val out = new Array[Byte](rowBytes * height)
    var y = 0
    while (y < height) {
      val filter = raw(y * (rowBytes + 1)) & 0xff
      val src = y * (rowBytes + 1) + 1
      val dst = y * rowBytes
      var x = 0
      while (x < rowBytes) {
        val cur = raw(src + x) & 0xff
        val left = if (x >= bpp) out(dst + x - bpp) & 0xff else 0
        val up = if (y > 0) out(dst - rowBytes + x) & 0xff else 0
        val upLeft = if (y > 0 && x >= bpp) out(dst - rowBytes + x - bpp) & 0xff else 0
        val recon = filter match {
          case 0 => cur
          case 1 => cur + left
          case 2 => cur + up
          case 3 => cur + (left + up) / 2
          case 4 => cur + paeth(left, up, upLeft)
          case other => throw new IllegalArgumentException(s"bad PNG filter $other")
        }
        out(dst + x) = recon.toByte
        x += 1
      }
      y += 1
    }
    out
  }

  private def paeth(a: Int, b: Int, c: Int): Int = {
    val p = a + b - c
    val pa = math.abs(p - a)
    val pb = math.abs(p - b)
    val pc = math.abs(p - c)
    if (pa <= pb && pa <= pc) a else if (pb <= pc) b else c
  }

  def pngSize(b: Array[Byte]): (Int, Int) = {
    require(isPng(b), "not a PNG")
    if (b.length < 24 ||
        new String(b, 12, 4, java.nio.charset.StandardCharsets.US_ASCII) != "IHDR")
      throw new IllegalArgumentException("PNG missing IHDR")
    val w = be32(b, 16)
    val h = be32(b, 20)
    if (w <= 0 || h <= 0) throw new IllegalArgumentException(s"bad PNG dimensions ${w}x$h")
    (w, h)
  }

  /** grid×grid mean-luminance feature over a decoded PNG — identical
    * arithmetic to [[bmpLumaGrid]], so a pixel-identical BMP and PNG produce
    * the identical feature vector.
    */
  def pngLumaGrid(b: Array[Byte], grid: Int = 8): Array[Float] = {
    val img = parsePng(b)
    lumaGridOf(img.width, img.height, grid, img.luma)
  }

  // ------------------------------------------------------------------- WAV

  private final case class Wav(
      sampleRate: Int, channels: Int, bits: Int,
      data: Array[Byte], dataOff: Int, dataLen: Int) {
    def nFrames: Int = if (channels == 0) 0 else dataLen / (channels * bits / 8)
    /** Mono-mixed sample in [-1,1] at frame i. */
    def sample(i: Int): Double = {
      var acc = 0.0
      var c = 0
      while (c < channels) {
        val off = dataOff + (i * channels + c) * (bits / 8)
        acc += (if (bits == 16) le16(data, off).toShort / 32768.0
                else ((data(off) & 0xff) - 128) / 128.0)
        c += 1
      }
      acc / channels
    }
  }

  private def parseWav(b: Array[Byte]): Wav = {
    require(isWav(b), "not a WAV")
    var off = 12
    var fmt: Option[(Int, Int, Int)] = None // (channels, rate, bits)
    var data: Option[(Int, Int)] = None // (offset, len)
    while (off + 8 <= b.length && (fmt.isEmpty || data.isEmpty)) {
      val id = new String(b, off, 4, java.nio.charset.StandardCharsets.US_ASCII)
      val size = le32(b, off + 4)
      // bounds math in Long: a crafted size near Int.MaxValue wraps Int
      // arithmetic negative and would bypass the truncation check
      if (size < 0 || off.toLong + 8L + size > b.length)
        throw new IllegalArgumentException("truncated WAV chunk")
      id match {
        case "fmt " =>
          // a declared size < 16 would let the field reads below run past
          // the chunk (and potentially the buffer) — reject, don't AIOOBE
          if (size < 16)
            throw new IllegalArgumentException(s"fmt chunk too short ($size)")
          val audioFormat = le16(b, off + 8)
          if (audioFormat != 1)
            throw new IllegalArgumentException(s"unsupported WAV format $audioFormat (PCM only)")
          fmt = Some((le16(b, off + 10), le32(b, off + 12), le16(b, off + 22)))
        case "data" => data = Some((off + 8, size))
        case _ => ()
      }
      off += 8 + size + (size & 1) // chunks are 2-byte aligned
    }
    (fmt, data) match {
      case (Some((ch, rate, bits)), Some((dOff, dLen))) =>
        if (ch <= 0 || rate <= 0 || (bits != 8 && bits != 16))
          throw new IllegalArgumentException(s"unsupported WAV layout ch=$ch rate=$rate bits=$bits")
        Wav(rate, ch, bits, b, dOff, dLen)
      case _ => throw new IllegalArgumentException("WAV missing fmt/data chunk")
    }
  }

  def wavDurationMs(b: Array[Byte]): Long = {
    val w = parseWav(b)
    w.nFrames.toLong * 1000L / w.sampleRate
  }

  /** N-bin RMS envelope in [0,1] over the mono mix — equal-width segments,
    * empty segments 0.
    */
  def wavEnvelope(b: Array[Byte], bins: Int = 64): Array[Float] = {
    val w = parseWav(b)
    val out = new Array[Float](bins)
    val n = w.nFrames
    if (n == 0) return out
    var bin = 0
    while (bin < bins) {
      val i0 = bin.toLong * n / bins
      val i1 = math.max(i0 + 1, (bin + 1).toLong * n / bins)
      var sum = 0.0
      var i = i0
      while (i < math.min(i1, n)) { val s = w.sample(i.toInt); sum += s * s; i += 1 }
      val cnt = math.min(i1, n) - i0
      out(bin) = if (cnt <= 0) 0f else math.sqrt(sum / cnt).toFloat
      bin += 1
    }
    out
  }
}

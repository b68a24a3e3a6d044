package graft.multimodal

/** Real, zero-dependency decode kernels for the container formats that are
  * pure byte layout — no codec library needed:
  *
  *  - BMP (BI_RGB 24/32-bit): header parse + pixel access → 8×8 mean-luma
  *    grid, the classic perceptual-hash feature (and the real base for
  *    image near-dup at scale).
  *  - WAV (PCM 8/16-bit): RIFF chunk walk → duration + N-bin RMS envelope,
  *    the audio-fingerprint baseline.
  *
  * Compressed codecs (JPEG/PNG/MP3/MP4) remain the documented stub in
  * [[Multimodal.fakeDecodeFeatures]] — those genuinely need codec libraries
  * absent from this offline build. Every parser here throws
  * IllegalArgumentException on malformed/unsupported input; callers decide
  * whether to fall back.
  */
private[multimodal] object MediaDecode {

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
    val out = new Array[Float](grid * grid)
    var gy = 0
    while (gy < grid) {
      val y0 = gy * img.height / grid
      val y1 = math.max(y0 + 1, (gy + 1) * img.height / grid)
      var gx = 0
      while (gx < grid) {
        val x0 = gx * img.width / grid
        val x1 = math.max(x0 + 1, (gx + 1) * img.width / grid)
        var sum = 0.0
        var y = y0
        while (y < math.min(y1, img.height)) {
          var x = x0
          while (x < math.min(x1, img.width)) { sum += img.luma(x, y); x += 1 }
          y += 1
        }
        val n = (math.min(y1, img.height) - y0) * (math.min(x1, img.width) - x0)
        out(gy * grid + gx) = (sum / math.max(1, n)).toFloat
        gx += 1
      }
      gy += 1
    }
    out
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

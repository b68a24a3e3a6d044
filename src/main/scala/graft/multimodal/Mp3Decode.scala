package graft.multimodal

/** Zero-dependency MPEG audio (MP3) metadata decode: a frame-header walk
  * over MPEG-1/2/2.5 Layer III streams (ISO/IEC 11172-3 §2.4.1 header
  * layout, public bitrate/samplerate tables), with ID3v2 tag skipping,
  * ID3v1 trailer tolerance, and Xing/Info + VBRI VBR-header parsing for
  * the authoritative frame count.
  *
  * Scope: header-level decode — exact duration, frame count, average
  * bitrate, sample rate, channel count, and a per-frame bitrate envelope
  * (the real VBR structure of the stream, usable as a cheap audio
  * fingerprint basis). Full Layer III PCM (huffman + IMDCT) is out of
  * scope; [[Multimodal.decodeFeatures]] routes MP3 to the envelope kernel
  * and [[Multimodal.probeMeta]] to [[mp3Meta]].
  *
  * Same defensive contract as the other decoders here: all public entry
  * points throw IllegalArgumentException on malformed input (AIOOBE is
  * wrapped), never hang (every loop advances by ≥ 4 bytes or breaks), and
  * bound their work by the input length.
  *
  * Reference behavior anchor: the reference system (the-hive) has no audio
  * pipeline at all — this is a north-star extension component, exercised
  * through the multimodal column surface.
  */
object Mp3Decode {

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  /** Layer III bitrates in kbps by [mpeg1?][bitrateIndex]; 0 = free format
    * (unsupported here), -1 = invalid.
    */
  private val BitratesMpeg1 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, -1)
  private val BitratesMpeg2 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160, -1)

  /** Sample rates by [versionId][srIndex]; versionId: 0=MPEG2.5, 2=MPEG2,
    * 3=MPEG1 (1 is reserved).
    */
  private val SampleRates: Array[Array[Int]] = Array(
    Array(11025, 12000, 8000), // MPEG2.5
    Array(0, 0, 0), // reserved
    Array(22050, 24000, 16000), // MPEG2
    Array(44100, 48000, 32000)) // MPEG1

  /** One parsed frame header. `size` includes the 4 header bytes. */
  private[multimodal] final case class Frame(
      mpeg1: Boolean, bitrateKbps: Int, sampleRate: Int, channels: Int,
      samplesPerFrame: Int, crc: Boolean, size: Int)

  /** Parse the 4-byte frame header at `off`; None when the bytes are not a
    * supported (Layer III, non-free-bitrate) frame sync.
    */
  private[multimodal] def parseFrame(b: Array[Byte], off: Int): Option[Frame] = {
    if (off < 0 || off + 4 > b.length) return None
    val b0 = b(off) & 0xFF; val b1 = b(off + 1) & 0xFF
    val b2 = b(off + 2) & 0xFF; val b3 = b(off + 3) & 0xFF
    if (b0 != 0xFF || (b1 & 0xE0) != 0xE0) return None
    val versionId = (b1 >> 3) & 3
    val layer = (b1 >> 1) & 3
    if (versionId == 1 || layer != 1) return None // reserved version / not Layer III
    val mpeg1 = versionId == 3
    val bitrateIdx = (b2 >> 4) & 0xF
    val srIdx = (b2 >> 2) & 3
    if (srIdx == 3) return None
    val bitrate = (if (mpeg1) BitratesMpeg1 else BitratesMpeg2)(bitrateIdx)
    if (bitrate <= 0) return None // free-format and invalid both unsupported
    val sampleRate = SampleRates(versionId)(srIdx)
    val padding = (b2 >> 1) & 1
    val channels = if (((b3 >> 6) & 3) == 3) 1 else 2
    val spf = if (mpeg1) 1152 else 576
    // Layer III frame length: floor(spf/8 * bitrate / samplerate) + padding
    val size = (spf / 8) * bitrate * 1000 / sampleRate + padding
    if (size < 24) return None // a header-only "frame" is not a frame
    Some(Frame(mpeg1, bitrate, sampleRate, channels, spf,
      crc = (b1 & 1) == 0, size = size))
  }

  /** Size of a leading ID3v2 tag (including its 10-byte header), or 0. */
  private[multimodal] def id3v2Size(b: Array[Byte]): Int = {
    if (b.length < 10 || b(0) != 'I' || b(1) != 'D' || b(2) != '3') return 0
    // 4-byte syncsafe size (7 bits per byte)
    val size = ((b(6) & 0x7F) << 21) | ((b(7) & 0x7F) << 14) |
      ((b(8) & 0x7F) << 7) | (b(9) & 0x7F)
    val total = 10 + size
    if (total <= 0 || total > b.length) 0 else total
  }

  /** Container sniff: an optional ID3v2 tag followed by a valid Layer III
    * frame whose successor position is also consistent (a second valid
    * header, or the stream ending at/inside the final frame) — strict
    * enough not to misfire on arbitrary binary with a lucky 0xFFE.
    */
  def isMp3(b: Array[Byte]): Boolean =
    try {
      val start = id3v2Size(b)
      parseFrame(b, start) match {
        case None => false
        case Some(f) =>
          val next = start + f.size
          next >= b.length - 4 || parseFrame(b, next).isDefined
      }
    } catch { case _: ArrayIndexOutOfBoundsException => false }

  final case class Mp3Meta(
      durationMs: Long, bitrateKbps: Int, sampleRate: Int, channels: Int,
      nFrames: Int, vbr: Boolean)

  /** Offset of the Xing/Info or VBRI tag within the first frame, relative
    * to the frame header start. Xing sits after the side info; VBRI at a
    * fixed 32-byte offset (both per the public encoder conventions).
    */
  private def xingOffset(f: Frame): Int =
    4 + (if (f.crc) 2 else 0) +
      (if (f.mpeg1) { if (f.channels == 1) 17 else 32 }
       else { if (f.channels == 1) 9 else 17 })

  private def be32(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xFF) << 24) | ((b(off + 1) & 0xFF) << 16) |
      ((b(off + 2) & 0xFF) << 8) | (b(off + 3) & 0xFF)

  private def tagAt(b: Array[Byte], off: Int, tag: String): Boolean =
    off + tag.length <= b.length &&
      tag.indices.forall(i => (b(off + i) & 0xFF) == tag.charAt(i))

  /** Frame count declared by a Xing/Info or VBRI header in the first
    * frame, with the VBR flag (Info = CBR encoder header).
    */
  private def vbrHeaderFrames(b: Array[Byte], start: Int, f: Frame): Option[(Int, Boolean)] = {
    val xo = start + xingOffset(f)
    if (tagAt(b, xo, "Xing") || tagAt(b, xo, "Info")) {
      val vbr = tagAt(b, xo, "Xing")
      if (xo + 8 > b.length) return None
      val flags = be32(b, xo + 4)
      if ((flags & 1) != 0 && xo + 12 <= b.length) {
        val n = be32(b, xo + 8)
        if (n > 0) return Some((n, vbr))
      }
      None
    } else {
      val vo = start + 4 + 32 // VBRI: fixed 32 bytes after the header
      if (tagAt(b, vo, "VBRI") && vo + 18 <= b.length) {
        val n = be32(b, vo + 14)
        if (n > 0) Some((n, true)) else None
      } else None
    }
  }

  /** Walk every frame; returns (frames walked, audio bytes walked, per-frame
    * bitrates). Stops (never fails) at the first non-frame position after a
    * valid start — trailing ID3v1/garbage/truncation ends the walk.
    */
  private def walkFrames(b: Array[Byte], start: Int): (Int, Long, Array[Int]) = {
    val bitrates = Array.newBuilder[Int]
    var off = start
    var n = 0
    var bytes = 0L
    var continue = true
    while (continue) parseFrame(b, off) match {
      case Some(f) =>
        n += 1; bytes += f.size; bitrates += f.bitrateKbps
        off += f.size // size ≥ 24: the walk always advances
      case None => continue = false
    }
    (n, bytes, bitrates.result())
  }

  /** Header-walk metadata: exact duration (all frames counted — exact for
    * CBR and VBR alike), average bitrate, rate/channels from the first
    * frame. A Xing/Info/VBRI frame count takes precedence over the walk
    * (it is the encoder's authoritative count when the file is truncated).
    */
  def mp3Meta(b: Array[Byte]): Mp3Meta =
    try {
      val start = id3v2Size(b)
      val first = parseFrame(b, start).getOrElse(fail("not an MP3 frame sync"))
      val (walked, walkedBytes, _) = walkFrames(b, start)
      val (frames, vbrFlag) = vbrHeaderFrames(b, start, first) match {
        case Some((n, vbr)) => (n, vbr)
        case None           => (walked, false)
      }
      if (frames <= 0) fail("empty MP3 stream")
      val durationMs = frames.toLong * first.samplesPerFrame * 1000L / first.sampleRate
      // average bitrate over the WALKED audio region and the WALKED
      // duration — dividing walked bytes by the (possibly larger)
      // Xing-declared duration would understate the rate on truncated files
      val walkedMs = walked.toLong * first.samplesPerFrame * 1000L / first.sampleRate
      val bitrate =
        if (walkedMs <= 0) first.bitrateKbps
        else math.round(walkedBytes * 8.0 / walkedMs).toInt
      Mp3Meta(durationMs, bitrate, first.sampleRate, first.channels, frames,
        vbr = vbrFlag)
    } catch {
      case _: ArrayIndexOutOfBoundsException => fail("truncated MP3 data")
    }

  /** `bins`-bin mean-bitrate envelope over the frame sequence, normalized
    * by the 320 kbps Layer III ceiling — the stream's real VBR structure
    * (a constant line for CBR), the audio analog of the image luma grid.
    */
  def mp3BitrateEnvelope(b: Array[Byte], bins: Int = 64): Array[Float] =
    try {
      require(bins > 0, "bins must be positive")
      val start = id3v2Size(b)
      if (parseFrame(b, start).isEmpty) fail("not an MP3 frame sync")
      val (n, _, rates) = walkFrames(b, start)
      if (n == 0) fail("empty MP3 stream")
      val out = new Array[Float](bins)
      var bin = 0
      while (bin < bins) {
        val lo = bin * n / bins
        val hi = math.max(lo + 1, (bin + 1) * n / bins)
        var sum = 0.0
        var i = lo
        while (i < math.min(hi, n)) { sum += rates(i); i += 1 }
        val cnt = math.min(hi, n) - lo
        out(bin) = if (cnt <= 0) 0f else (sum / cnt / 320.0).toFloat
        bin += 1
      }
      out
    } catch {
      case _: ArrayIndexOutOfBoundsException => fail("truncated MP3 data")
    }
}

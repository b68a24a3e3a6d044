package graft.multimodal

/** Zero-dependency MP4/ISO-BMFF metadata probe (ISO/IEC 14496-12 public box
  * layout): walks the box tree to the movie header and the video track —
  * exact duration (`mvhd` duration/timescale), presentation width/height
  * (`tkhd` 16.16 fixed point), and average frame rate (`stts` sample count
  * over `mdhd` media time) for the track whose `hdlr` type is `vide`.
  *
  * Header-level only, like [[Mp3Decode]]: sample decode (H.264 et al.) is
  * the documented codec boundary; [[Multimodal.probeMeta]] routes MP4 here
  * so the metadata surface is real while `decodeFeatures` keeps the stub
  * kernel for pixels.
  *
  * Defensive contract of the other decoders: IllegalArgumentException on
  * malformed input (AIOOBE wrapped), every loop advances (box size ≥ 8
  * enforced), work bounded by input length.
  */
object Mp4Probe {

  private def fail(msg: String): Nothing = throw new IllegalArgumentException(msg)

  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xFF) << 8) | (b(o + 1) & 0xFF)
  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xFFL) << 24) | ((b(o + 1) & 0xFFL) << 16) |
      ((b(o + 2) & 0xFFL) << 8) | (b(o + 3) & 0xFFL)
  private def be64(b: Array[Byte], o: Int): Long =
    (be32(b, o) << 32) | be32(b, o + 4)
  private def boxType(b: Array[Byte], o: Int): String =
    new String(b, o + 4, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Container sniff: a well-formed leading box whose type is `ftyp` (the
    * brand box every MP4 writer emits first) — strict enough for dispatch.
    */
  def isMp4(b: Array[Byte]): Boolean =
    b.length >= 12 && boxType(b, 0) == "ftyp" && be32(b, 0) >= 8

  final case class Mp4Meta(
      durationMs: Long, width: Option[Int], height: Option[Int],
      frameRate: Option[Double])

  /** Containers descended by the walk; everything else is an opaque leaf. */
  private val Containers = Set("moov", "trak", "mdia", "minf", "stbl")

  def probe(b: Array[Byte]): Mp4Meta =
    try {
      if (!isMp4(b)) fail("not an MP4 (no leading ftyp box)")
      var movieDurationMs = -1L
      // per-trak state, committed when the trak proves to be the video one
      var trakW, trakH = 0
      var trakIsVideo = false
      var mdhdTimescale = 0L
      var sttsSamples = 0L
      var sttsTicks = 0L
      var width, height: Option[Int] = None
      var frameRate: Option[Double] = None

      def commitTrak(): Unit = {
        if (trakIsVideo && width.isEmpty && trakW > 0 && trakH > 0) {
          width = Some(trakW); height = Some(trakH)
          if (sttsSamples > 0 && sttsTicks > 0 && mdhdTimescale > 0)
            frameRate = Some(sttsSamples.toDouble * mdhdTimescale / sttsTicks)
        }
        trakW = 0; trakH = 0; trakIsVideo = false
        mdhdTimescale = 0; sttsSamples = 0; sttsTicks = 0
      }

      def walk(start: Int, end: Int, depth: Int): Unit = {
        if (depth > 8) fail("box nesting too deep")
        var off = start
        while (off + 8 <= end) {
          val size32 = be32(b, off)
          val t = boxType(b, off)
          var header = 8
          val size: Long =
            if (size32 == 1) {
              if (off + 16 > end) fail("truncated largesize box")
              header = 16
              be64(b, off + 8)
            } else if (size32 == 0) (end - off).toLong // box extends to end
            else size32
          if (size < header || off + size > end) fail(s"bad $t box size")
          val bodyStart = off + header
          val bodyEnd = (off + size).toInt
          t match {
            case c if Containers.contains(c) =>
              walk(bodyStart, bodyEnd, depth + 1)
              if (c == "trak") commitTrak()
            case "mvhd" =>
              if (bodyStart + 4 > bodyEnd) fail("short mvhd")
              val v = b(bodyStart) & 0xFF
              if (v == 1) {
                if (bodyStart + 32 > bodyEnd) fail("short mvhd v1")
                val ts = be32(b, bodyStart + 20)
                val dur = be64(b, bodyStart + 24)
                if (ts > 0) movieDurationMs = dur * 1000 / ts
              } else {
                if (bodyStart + 20 > bodyEnd) fail("short mvhd v0")
                val ts = be32(b, bodyStart + 12)
                val dur = be32(b, bodyStart + 16)
                if (ts > 0) movieDurationMs = dur * 1000 / ts
              }
            case "tkhd" =>
              if (bodyStart + 4 > bodyEnd) fail("short tkhd")
              val v = b(bodyStart) & 0xFF
              // width/height are the LAST 8 bytes (16.16 fixed), after the
              // version-dependent times (v1: 64-bit) and the fixed
              // layer/volume/matrix fields — at body offset 88 (v1) / 76 (v0)
              if (bodyEnd - 8 >= bodyStart + (if (v == 1) 88 else 76)) {
                trakW = be32(b, bodyEnd - 8).toInt >>> 16
                trakH = be32(b, bodyEnd - 4).toInt >>> 16
              }
            case "hdlr" =>
              if (bodyStart + 12 <= bodyEnd)
                trakIsVideo = boxType(b, bodyStart + 4) == "vide"
            case "mdhd" =>
              if (bodyStart + 4 > bodyEnd) fail("short mdhd")
              val v = b(bodyStart) & 0xFF
              mdhdTimescale =
                if (v == 1) { if (bodyStart + 24 > bodyEnd) 0 else be32(b, bodyStart + 20) }
                else { if (bodyStart + 16 > bodyEnd) 0 else be32(b, bodyStart + 12) }
            case "stts" =>
              if (bodyStart + 8 <= bodyEnd) {
                val n = be32(b, bodyStart + 4)
                val avail = (bodyEnd - bodyStart - 8) / 8
                var i = 0
                while (i < math.min(n, avail)) {
                  val cnt = be32(b, bodyStart + 8 + i * 8)
                  val delta = be32(b, bodyStart + 12 + i * 8)
                  sttsSamples += cnt
                  sttsTicks += cnt * delta
                  i += 1
                }
              }
            case _ => () // opaque leaf (mdat, ftyp, codec boxes, ...)
          }
          off = bodyEnd // size ≥ header ≥ 8: the walk always advances
        }
      }
      walk(0, b.length, 0)
      if (movieDurationMs < 0) fail("MP4 without a movie header (mvhd)")
      Mp4Meta(movieDurationMs, width, height, frameRate)
    } catch {
      case _: ArrayIndexOutOfBoundsException => fail("truncated MP4 data")
      case _: StringIndexOutOfBoundsException => fail("truncated MP4 data")
    }
}

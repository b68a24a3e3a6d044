package graft.multimodal

/** Zero-dependency GIF decoder (87a/89a, first frame) — LZW decompression,
  * global/local color tables, interlacing. Animated GIFs decode their first
  * image descriptor (the perceptual-feature contract: one representative
  * raster → the shared 8×8 mean-luma grid). Transparency is ignored
  * (features are content, not compositing), matching the PNG kernel's
  * alpha policy. Pure integer arithmetic; malformed input throws
  * IllegalArgumentException ([[Multimodal.decodeFeatures]] falls back).
  */
private[graft] object GifDecode {

  def isGif(b: Array[Byte]): Boolean =
    b.length > 13 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F' &&
      b(3) == '8' && (b(4) == '7' || b(4) == '9') && b(5) == 'a'

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"gif: $msg")

  @inline private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xFF) | ((b(off + 1) & 0xFF) << 8)

  @inline private def guarded[A](body: => A): A =
    try body
    catch {
      case _: ArrayIndexOutOfBoundsException => fail("truncated or corrupt data")
      case _: NegativeArraySizeException => fail("corrupt size field")
    }

  private final case class Frame(
      screenW: Int, screenH: Int, left: Int, top: Int, w: Int, h: Int,
      palette: Array[Byte], indices: Array[Int], bg: Int,
      globalPalette: Array[Byte]) {
    private def lumaOf(pal: Array[Byte], idx: Int): Double = {
      val o = idx * 3
      if (pal == null || o < 0 || o + 2 >= pal.length) 0.0
      else {
        val r = pal(o) & 0xFF
        val g = pal(o + 1) & 0xFF
        val bl = pal(o + 2) & 0xFF
        (0.299 * r + 0.587 * g + 0.114 * bl) / 255.0
      }
    }
    /** Luminance in [0,1] at screen coordinates; pixels outside the first
      * frame's rectangle take the background color. Frame pixels index the
      * frame's (possibly local) table; the background index is defined
      * against the GLOBAL color table by the spec — with a local-table
      * frame the two differ.
      */
    def luma(x: Int, y: Int): Double =
      if (x >= left && x < left + w && y >= top && y < top + h)
        lumaOf(palette, indices((y - top) * w + (x - left)))
      else lumaOf(globalPalette, bg)
  }

  /** LZW decode of the concatenated image sub-blocks into `nPixels` color
    * indices (GIF variant: variable code width starting at minCode+1, clear
    * and end codes, 4096-entry dictionary).
    */
  private def lzw(
      data: Array[Byte], minCodeSize: Int, nPixels: Int): Array[Int] = {
    if (minCodeSize < 2 || minCodeSize > 11) fail("bad LZW min code size")
    val clear = 1 << minCodeSize
    val end = clear + 1
    val out = new Array[Int](nPixels)
    var outPos = 0
    // dictionary as (prefix link, appended index) pairs
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    var dictSize = end + 1
    var codeSize = minCodeSize + 1
    var bitPos = 0
    def readCode(): Int = {
      var v = 0
      var i = 0
      while (i < codeSize) {
        val byteI = bitPos >> 3
        if (byteI >= data.length) return end // truncated → stop cleanly
        v |= (((data(byteI) & 0xFF) >> (bitPos & 7)) & 1) << i
        bitPos += 1
        i += 1
      }
      v
    }
    val stack = new Array[Int](4096)
    def emit(code: Int): Int = { // writes the string for code; returns first index
      var stackTop = 0
      var c = code
      while (c >= clear) { // walk prefix links (codes < clear are literals)
        if (stackTop >= 4096) fail("LZW loop")
        stack(stackTop) = suffix(c)
        stackTop += 1
        c = prefix(c)
      }
      val first = c
      if (outPos < out.length) { out(outPos) = first; outPos += 1 }
      while (stackTop > 0) {
        stackTop -= 1
        if (outPos < out.length) { out(outPos) = stack(stackTop); outPos += 1 }
      }
      first
    }
    @inline def firstChar(code: Int): Int = {
      var c = code
      while (c >= clear) c = prefix(c)
      c
    }
    var prev = -1
    while (outPos < nPixels) {
      val code = readCode()
      if (code == end) {
        if (outPos < nPixels) fail("LZW ended before frame was full")
      } else if (code == clear) {
        dictSize = end + 1
        codeSize = minCodeSize + 1
        prev = -1
      } else if (prev < 0) {
        if (code >= clear) fail("first LZW code after clear must be a literal")
        emit(code)
        prev = code
      } else {
        if (code < dictSize) { // known string: emit, then add prev+first(code)
          val first = emit(code)
          if (dictSize < 4096) {
            prefix(dictSize) = prev; suffix(dictSize) = first; dictSize += 1
          }
        } else if (code == dictSize && dictSize < 4096) {
          // KwKwK: the new entry IS prev + firstChar(prev); add then emit it
          prefix(dictSize) = prev
          suffix(dictSize) = firstChar(prev)
          dictSize += 1
          emit(code)
        } else fail("LZW code beyond dictionary")
        if (dictSize == (1 << codeSize) && codeSize < 12) codeSize += 1
        prev = code
      }
    }
    out
  }

  private def decodeFirstFrame(b: Array[Byte]): Frame = {
    if (!isGif(b)) fail("not a GIF")
    val screenW = le16(b, 6)
    val screenH = le16(b, 8)
    if (screenW <= 0 || screenH <= 0 ||
      screenW.toLong * screenH > (1L << 26)) fail("bad screen size")
    val flags = b(10) & 0xFF
    val bg = b(11) & 0xFF
    var pos = 13
    var globalPal: Array[Byte] = null
    if ((flags & 0x80) != 0) {
      val n = 3 * (2 << (flags & 7))
      if (pos + n > b.length) fail("truncated global color table")
      globalPal = java.util.Arrays.copyOfRange(b, pos, pos + n)
      pos += n
    }
    while (pos < b.length) {
      (b(pos) & 0xFF) match {
        case 0x3B => fail("trailer before any image") // ';'
        case 0x21 => // extension: label + sub-blocks
          pos += 2
          while ((b(pos) & 0xFF) != 0) pos += 1 + (b(pos) & 0xFF)
          pos += 1
        case 0x2C => // image descriptor
          val left = le16(b, pos + 1)
          val top = le16(b, pos + 3)
          val w = le16(b, pos + 5)
          val h = le16(b, pos + 7)
          val iflags = b(pos + 9) & 0xFF
          if (w <= 0 || h <= 0 || w.toLong * h > (1L << 26))
            fail("bad frame size")
          pos += 10
          var pal = globalPal
          if ((iflags & 0x80) != 0) {
            val n = 3 * (2 << (iflags & 7))
            if (pos + n > b.length) fail("truncated local color table")
            pal = java.util.Arrays.copyOfRange(b, pos, pos + n)
            pos += n
          }
          if (pal == null) fail("no color table")
          val minCodeSize = b(pos) & 0xFF
          pos += 1
          // concatenate data sub-blocks
          val blocks = new java.io.ByteArrayOutputStream()
          while ((b(pos) & 0xFF) != 0) {
            val n = b(pos) & 0xFF
            if (pos + 1 + n > b.length) fail("truncated image data")
            blocks.write(b, pos + 1, n)
            pos += 1 + n
          }
          var idx = lzw(blocks.toByteArray, minCodeSize, w * h)
          if ((iflags & 0x40) != 0) { // interlaced: reorder rows (4 passes)
            val ordered = new Array[Int](w * h)
            var src = 0
            for ((start, step) <- Seq((0, 8), (4, 8), (2, 4), (1, 2));
                 row <- start until h by step) {
              System.arraycopy(idx, src * w, ordered, row * w, w)
              src += 1
            }
            idx = ordered
          }
          return Frame(screenW, screenH, left, top, w, h, pal, idx, bg, globalPal)
        case other => fail(f"unknown block 0x$other%02x")
      }
    }
    fail("no image descriptor")
  }

  /** (width, height) of the logical screen. */
  def gifSize(b: Array[Byte]): (Int, Int) = guarded {
    if (!isGif(b)) fail("not a GIF")
    (le16(b, 6), le16(b, 8))
  }

  /** grid×grid mean-luma blocks of the first frame (same contract as the
    * BMP/PNG/JPEG kernels).
    */
  def gifLumaGrid(b: Array[Byte], grid: Int = 8): Array[Float] = guarded {
    val f = decodeFirstFrame(b)
    MediaDecode.lumaGridOf(f.screenW, f.screenH, grid, f.luma)
  }
}

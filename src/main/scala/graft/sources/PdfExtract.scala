package graft.sources

import java.nio.charset.StandardCharsets
import java.util.zip.Inflater
import scala.collection.mutable
import scala.util.matching.Regex

/** Minimal, zero-dependency PDF text extractor.
  *
  * Contract from the reference (/root/reference/internal/parser/pdf.go:14-44,
  * MuPDF-backed): per-page text, pages joined by a blank line, pages that fail
  * to decode are skipped, error when nothing was extracted.
  *
  * Supported subset (the "simple generated PDF" class — office exports,
  * report generators, the reference's own seeder corpus):
  *   - classic xref PDFs with `N 0 obj … endobj` bodies (PDF ≤ 1.4 layout;
  *     also any newer file that keeps objects uncompressed)
  *   - streams stored raw or /FlateDecode (java.util.zip.Inflater), direct or
  *     indirect /Length
  *   - page tree walk (/Catalog → /Pages → /Kids) with document-order fallback
  *   - text operators BT/ET, Tj, TJ, ', ", Td/TD/T*, Tf; literal `(…)` strings
  *     with escapes and hex `<…>` strings
  *   - per-font /ToUnicode CMaps (bfchar + bfrange, 1- and 2-byte codes), the
  *     mechanism subsetted fonts use — without it glyph-index strings are
  *     unreadable
  *
  *   - /ObjStm object streams (PDF 1.5+ compressed-object layout): embedded
  *     objects are expanded after the top-level scan, so page trees and font
  *     dicts stored inside object streams resolve normally
  *
  *   - PNG-predictor-filtered Flate streams (/Predictor >= 10 with /Columns,
  *     the common modern xref/ObjStm layout), undone via the shared PNG row
  *     unfilter
  *
  *   - standard security handler: RC4 revisions 2–3 (40–128 bit, PDF 1.7
  *     §7.6.3 algorithms 2/4/5/6; pure JDK MD5 + a 30-line RC4), AES-128-CBC
  *     (/V 4 /R 4 with the /AESV2 crypt filter, §7.6.2's sAlT object keys +
  *     javax.crypto), and AES-256-CBC (/V 5 /R 5–6, ISO 32000-2 §7.6.4: the
  *     SHA-256/384/512 + AES-CBC hardened hash of Algorithm 2.B validates
  *     /U and unwraps the file key from /UE). `text(bytes)` opens files
  *     with the EMPTY user password (the owner-locked "encrypted" PDF a
  *     user actually meets); `text(bytes, password)` authenticates a
  *     supplied password FIRST as the user password, THEN as the owner
  *     password (Algorithm 7: the owner key decrypts /O back into the
  *     padded user password for R 2–4; /O‖/OE hashed over the 48-byte /U
  *     for V5) — the Acrobat try-order. A wrong or missing password throws
  *     (lands in the caller's error column); there is no silent fallback
  *     from a supplied-but-wrong password to the empty one.
  *
  *   - predictor-filtered Flate streams: PNG predictors (/Predictor >= 10,
  *     shared row unfilter) AND TIFF horizontal differencing (/Predictor 2,
  *     8-bit components)
  *
  * Out of scope (documented boundary, not silent): DCT/CCITT image text,
  * public-key (/Adobe.PubSec) security handlers, SASLprep normalization of
  * non-ASCII V5 passwords (UTF-8 bytes are used verbatim, truncated to the
  * spec's 127-byte bound; R ≤ 4 passwords are Latin-1 bytes per
  * PDFDocEncoding's Latin-text subset).
  */
private[graft] object PdfExtract {

  private val Latin1 = StandardCharsets.ISO_8859_1

  // ---------------------------------------------------------------- objects

  private final case class PdfObj(
      num: Int, dict: String, stream: Option[Array[Byte]], gen: Int = 0)

  private val ObjStart: Regex = """(?s)(\d+)\s+(\d+)\s+obj""".r

  /** Scan `N G obj … endobj` bodies; for stream objects capture the raw
    * stream bytes using /Length when resolvable, else the endstream scan.
    */
  private def parseObjects(bytes: Array[Byte]): Map[Int, PdfObj] = {
    val s = new String(bytes, Latin1)
    // First pass: object body spans (endobj may be absent on malformed tails).
    val starts = ObjStart.findAllMatchIn(s).toVector
    val bodies = mutable.Map.empty[Int, (Int, Int)] // num -> (bodyStart, bodyEnd)
    val gens = mutable.Map.empty[Int, Int]
    for (i <- starts.indices) {
      val m = starts(i)
      val bodyStart = m.end
      val hardEnd = if (i + 1 < starts.length) starts(i + 1).start else s.length
      val endObj = s.indexOf("endobj", bodyStart)
      val bodyEnd = if (endObj >= 0 && endObj < hardEnd) endObj else hardEnd
      bodies(m.group(1).toInt) = (bodyStart, bodyEnd)
      gens(m.group(1).toInt) = m.group(2).toIntOption.getOrElse(0)
    }
    def body(num: Int): String = bodies.get(num) match {
      case Some((a, b)) => s.substring(a, b)
      case None => ""
    }
    val lengthRef = """/Length\s+(\d+)(\s+\d+\s+R)?""".r
    bodies.map { case (num, (a, b)) =>
      val raw = s.substring(a, b)
      val gen = gens.getOrElse(num, 0)
      val streamKw = raw.indexOf("stream")
      val obj =
        if (streamKw < 0) PdfObj(num, raw, None, gen)
        else {
          val dict = raw.substring(0, streamKw)
          // stream keyword is followed by CRLF or LF
          var dataStart = a + streamKw + "stream".length
          if (dataStart < bytes.length && bytes(dataStart) == '\r') dataStart += 1
          if (dataStart < bytes.length && bytes(dataStart) == '\n') dataStart += 1
          val len: Option[Int] = lengthRef.findFirstMatchIn(dict).flatMap { lm =>
            if (lm.group(2) == null) Some(lm.group(1).toInt)
            else body(lm.group(1).toInt).trim.toIntOption
          }
          // bounds are GLOBAL, not clamped to the next object start: binary
          // stream bytes can spell an ASCII "N M obj" and fake an object
          // boundary, which must not truncate this stream mid-data
          val dataEnd = len match {
            case Some(n) if dataStart + n <= bytes.length => dataStart + n
            case _ =>
              val e = s.indexOf("endstream", dataStart)
              if (e >= 0) {
                // strip the EOL that precedes endstream
                var e2 = e
                if (e2 > dataStart && bytes(e2 - 1) == '\n') e2 -= 1
                if (e2 > dataStart && bytes(e2 - 1) == '\r') e2 -= 1
                e2
              } else bytes.length
          }
          PdfObj(num, dict, Some(java.util.Arrays.copyOfRange(bytes, dataStart, dataEnd)), gen)
        }
      num -> obj
    }.toMap
  }

  /** Decode a stream body: raw unless /FlateDecode; PNG-predictor
    * post-filtering (/Predictor >= 10, the common modern xref/ObjStm layout)
    * is undone via the shared [[graft.multimodal.MediaDecode.pngUnfilter]]
    * — the PDF spec defines those predictors as exactly the PNG row filters.
    * None when undecodable (TIFF /Predictor 2 stays out of scope).
    */
  private def decodeStream(obj: PdfObj): Option[Array[Byte]] =
    obj.stream.flatMap { data =>
      if (!obj.dict.contains("/FlateDecode")) Some(data)
      else
        try {
          val inf = new Inflater()
          inf.setInput(data)
          val out = new java.io.ByteArrayOutputStream(math.max(64, data.length * 4))
          val buf = new Array[Byte](8192)
          while (!inf.finished() && !inf.needsInput()) {
            val n = inf.inflate(buf)
            if (n == 0 && !inf.finished()) throw new IllegalStateException("stall")
            out.write(buf, 0, n)
          }
          inf.end()
          unpredict(obj.dict, out.toByteArray)
        } catch { case _: Exception => None }
    }

  private def dictInt(dict: String, key: String): Option[Int] =
    (key + """\s+(\d+)""").r.findFirstMatchIn(dict).map(_.group(1).toInt)

  /** Blank out nested `<< … >>` sub-dictionaries, keeping only the top-level
    * entries of `dict` (which may or may not include its own outer `<<`).
    * Needed wherever a nested dict can shadow a same-named top-level key —
    * e.g. the /CF crypt-filter's '/Length 16' (BYTES) vs the encrypt dict's
    * '/Length 128' (bits).
    */
  private[graft] def stripNestedDicts(dict: String): String = {
    val sb = new java.lang.StringBuilder(dict.length)
    var depth = 0
    var i = 0
    val topDepth = if (dict.trim.startsWith("<<")) 1 else 0
    while (i < dict.length) {
      val two = if (i + 1 < dict.length) dict.substring(i, i + 2) else ""
      if (two == "<<") {
        depth += 1
        sb.append(if (depth <= topDepth) "<<" else "  ")
        i += 2
      } else if (two == ">>") {
        sb.append(if (depth <= topDepth) ">>" else "  ")
        depth -= 1
        i += 2
      } else {
        sb.append(if (depth <= topDepth) dict.charAt(i) else ' ')
        i += 1
      }
    }
    sb.toString
  }

  /** Undo a declared /Predictor on inflated data. Predictor 1/absent = raw;
    * >= 10 = PNG row filters over /Columns-wide rows (each prefixed by its
    * filter byte). A stream that isn't a whole number of rows is corrupt —
    * None, never a partial decode.
    */
  private def unpredict(dict: String, inflated: Array[Byte]): Option[Array[Byte]] = {
    val predictor = dictInt(dict, "/Predictor").getOrElse(1)
    if (predictor <= 1) Some(inflated)
    else if (predictor >= 10) {
      val columns = dictInt(dict, "/Columns").getOrElse(1)
      val colors = dictInt(dict, "/Colors").getOrElse(1)
      val bpc = dictInt(dict, "/BitsPerComponent").getOrElse(8)
      if (columns <= 0 || colors <= 0 || bpc <= 0) None
      else {
        val rowBytes = (columns.toLong * colors * bpc + 7) / 8
        if (rowBytes <= 0 || rowBytes > Int.MaxValue - 1) None
        else {
          val bpp = math.max(1, colors * bpc / 8)
          val height = inflated.length / (rowBytes.toInt + 1)
          if (height.toLong * (rowBytes + 1) != inflated.length) None
          else Some(graft.multimodal.MediaDecode.pngUnfilter(
            inflated, rowBytes.toInt, bpp, height))
        }
      }
    } else if (predictor == 2) {
      // TIFF horizontal differencing: each sample byte is a delta against
      // the byte one pixel earlier in its row (8-bit components only — the
      // layout every real predictor-2 PDF stream uses)
      val columns = dictInt(dict, "/Columns").getOrElse(1)
      val colors = dictInt(dict, "/Colors").getOrElse(1)
      val bpc = dictInt(dict, "/BitsPerComponent").getOrElse(8)
      if (columns <= 0 || colors <= 0 || bpc != 8) None
      else {
        val rowBytes = columns.toLong * colors
        if (rowBytes <= 0 || rowBytes > Int.MaxValue ||
            inflated.length % rowBytes != 0) None
        else {
          val out = inflated.clone()
          val rb = rowBytes.toInt
          var row = 0
          while (row * rb < out.length) {
            var i = row * rb + colors
            val end = (row + 1) * rb
            while (i < end) {
              out(i) = (out(i) + out(i - colors)).toByte
              i += 1
            }
            row += 1
          }
          Some(out)
        }
      }
    } else None // predictors 3-9 are not defined by the PDF spec
  }

  /** Expand a /Type/ObjStm stream: header is N (objnum, offset) integer
    * pairs; object bodies start at /First + offset. ObjStm members carry no
    * streams of their own (forbidden by the spec), so dict-only PdfObjs.
    */
  private def parseObjStm(dict: String, data: Array[Byte]): Seq[PdfObj] = {
    val s = new String(data, Latin1)
    val n = """/N\s+(\d+)""".r.findFirstMatchIn(dict).map(_.group(1).toInt).getOrElse(0)
    val first = """/First\s+(\d+)""".r.findFirstMatchIn(dict).map(_.group(1).toInt).getOrElse(0)
    if (n == 0 || first <= 0 || first > s.length) return Seq.empty
    val headerInts = s.substring(0, first).trim.split("\\s+").toSeq
      .flatMap(_.toIntOption)
    val pairs = headerInts.grouped(2).collect { case Seq(a, b) => (a, b) }
      .toVector.take(n)
    pairs.zipWithIndex.map { case ((num, off), i) =>
      val start = math.min(first + off, s.length)
      val end =
        if (i + 1 < pairs.length) math.min(first + pairs(i + 1)._2, s.length)
        else s.length
      PdfObj(num, s.substring(start, math.max(start, end)), None)
    }
  }

  // ----------------------------------------------------------------- CMaps

  /** code → unicode string; width = bytes per code (1 or 2). */
  private final case class CMap(width: Int, map: Map[Int, String])

  private def hexToInt(h: String): Int = java.lang.Integer.parseInt(h, 16)

  private def hexToUtf16(h: String): String = {
    // dst hex is UTF-16BE code units
    val sb = new StringBuilder
    var i = 0
    while (i + 4 <= h.length) { sb.append(hexToInt(h.substring(i, i + 4)).toChar); i += 4 }
    if (i + 2 <= h.length && h.length % 4 != 0)
      sb.append(hexToInt(h.substring(i, i + 2)).toChar) // tolerate 1-byte dst
    sb.toString
  }

  private val CodeSpace: Regex = """(?s)begincodespacerange\s*<([0-9A-Fa-f]+)>""".r
  private val BfCharBlock: Regex = """(?s)beginbfchar(.*?)endbfchar""".r
  private val BfRangeBlock: Regex = """(?s)beginbfrange(.*?)endbfrange""".r
  private val HexPair: Regex = """<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>""".r
  private val RangeArr: Regex = """(?s)<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*\[(.*?)\]""".r
  private val RangeFlat: Regex = """<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>\s*<([0-9A-Fa-f]+)>""".r
  private val HexTok: Regex = """<([0-9A-Fa-f]+)>""".r

  private def parseCMap(text: String): CMap = {
    val width = CodeSpace.findFirstMatchIn(text)
      .map(m => math.max(1, m.group(1).length / 2)).getOrElse(1)
    val map = mutable.Map.empty[Int, String]
    for (block <- BfCharBlock.findAllMatchIn(text); p <- HexPair.findAllMatchIn(block.group(1)))
      map(hexToInt(p.group(1))) = hexToUtf16(p.group(2))
    for (block <- BfRangeBlock.findAllMatchIn(text)) {
      val body = block.group(1)
      // array form first (the flat regex would also match its prefix)
      val arrSpans = RangeArr.findAllMatchIn(body).toVector
      for (m <- arrSpans) {
        val lo = hexToInt(m.group(1))
        val dsts = HexTok.findAllMatchIn(m.group(3)).map(_.group(1)).toVector
        dsts.zipWithIndex.foreach { case (d, i) => map(lo + i) = hexToUtf16(d) }
      }
      val arrCovered = arrSpans.map(m => (m.start, m.end))
      def inArr(pos: Int) = arrCovered.exists { case (a, b) => pos >= a && pos < b }
      for (m <- RangeFlat.findAllMatchIn(body) if !inArr(m.start)) {
        val lo = hexToInt(m.group(1)); val hi = hexToInt(m.group(2))
        val dst = m.group(3)
        // increment the last code unit of dst across the range
        val base = hexToUtf16(dst)
        var c = lo
        while (c <= hi && c - lo < 65536) {
          val off = c - lo
          map(c) =
            if (base.isEmpty) ""
            else base.dropRight(1) + (base.last + off).toChar
          c += 1
        }
      }
    }
    CMap(width, map.toMap)
  }

  // ------------------------------------------------------- dict navigation

  private val Ref: Regex = """(\d+)\s+\d+\s+R""".r

  /** Value after /Key: Some(Left(objNum)) for `N 0 R`, Some(Right(inline))
    * for an inline `<<…>>` dict (balanced), None when absent.
    */
  private def dictValue(dict: String, key: String): Option[Either[Int, String]] = {
    val i = dict.indexOf(s"/$key")
    if (i < 0) return None
    var j = i + key.length + 1
    while (j < dict.length && dict.charAt(j).isWhitespace) j += 1
    if (j >= dict.length) None
    else if (dict.charAt(j).isDigit)
      Ref.findPrefixMatchOf(dict.substring(j)).map(m => Left(m.group(1).toInt))
    else if (dict.startsWith("<<", j)) {
      var depth = 0; var k = j
      while (k < dict.length) {
        if (dict.startsWith("<<", k)) { depth += 1; k += 2 }
        else if (dict.startsWith(">>", k)) {
          depth -= 1; k += 2
          if (depth == 0) return Some(Right(dict.substring(j, k)))
        } else k += 1
      }
      None
    } else None
  }

  // ---------------------------------------------------- content tokenizer

  /** Decode a literal `(…)` string body (escapes, nesting already handled by
    * the scanner — this receives the raw inner bytes with escapes intact).
    */
  private def decodeLiteral(raw: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(raw.length)
    var i = 0
    while (i < raw.length) {
      val c = raw.charAt(i)
      if (c == '\\' && i + 1 < raw.length) {
        raw.charAt(i + 1) match {
          case 'n' => out.write('\n'); i += 2
          case 'r' => out.write('\r'); i += 2
          case 't' => out.write('\t'); i += 2
          case 'b' => out.write('\b'); i += 2
          case 'f' => out.write('\f'); i += 2
          case '(' => out.write('('); i += 2
          case ')' => out.write(')'); i += 2
          case '\\' => out.write('\\'); i += 2
          case '\n' => i += 2 // line continuation
          case '\r' =>
            i += 2; if (i < raw.length && raw.charAt(i) == '\n') i += 1
          case d if d >= '0' && d <= '7' =>
            var v = 0; var n = 0; var k = i + 1
            while (k < raw.length && n < 3 && raw.charAt(k) >= '0' && raw.charAt(k) <= '7') {
              v = v * 8 + (raw.charAt(k) - '0'); k += 1; n += 1
            }
            out.write(v & 0xff); i = k
          case other => out.write(other.toInt & 0xff); i += 2
        }
      } else { out.write(c.toInt & 0xff); i += 1 }
    }
    out.toByteArray
  }

  /** Map shown string bytes → text through the current font's CMap. */
  private def showBytes(b: Array[Byte], cmap: Option[CMap]): String = cmap match {
    case None => new String(b, Latin1)
    case Some(m) if m.width <= 1 =>
      b.map(x => m.map.getOrElse(x & 0xff, "")).mkString
    case Some(m) =>
      val sb = new StringBuilder
      var i = 0
      while (i + 1 < b.length) {
        sb.append(m.map.getOrElse(((b(i) & 0xff) << 8) | (b(i + 1) & 0xff), ""))
        i += 2
      }
      sb.toString
  }

  /** Extract text from one page's content stream(s). */
  private def pageText(content: Array[Byte], fonts: Map[String, CMap]): String = {
    val s = new String(content, Latin1)
    val out = new StringBuilder
    var cmap: Option[CMap] = None
    val nums = mutable.ArrayBuffer.empty[Double]
    var lastName: String = ""
    var pendingStr: Array[Byte] = null
    var inArray = false
    val arrayParts = mutable.ArrayBuffer.empty[Array[Byte]]
    var emittedInBlock = false

    def newline(): Unit =
      if (out.nonEmpty && out.last != '\n') out.append('\n')
    def show(b: Array[Byte]): Unit = {
      val t = showBytes(b, cmap)
      if (t.nonEmpty) { out.append(t); emittedInBlock = true }
    }

    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '%') { while (i < n && s.charAt(i) != '\n') i += 1 } // comment
      else if (c == '(') {
        // literal string: balanced parens, backslash escapes
        var depth = 1; var j = i + 1
        val sb = new StringBuilder
        while (j < n && depth > 0) {
          val ch = s.charAt(j)
          if (ch == '\\' && j + 1 < n) { sb.append(ch).append(s.charAt(j + 1)); j += 2 }
          else {
            if (ch == '(') depth += 1
            else if (ch == ')') depth -= 1
            if (depth > 0) sb.append(ch)
            j += 1
          }
        }
        val bytes = decodeLiteral(sb.toString)
        if (inArray) arrayParts += bytes else pendingStr = bytes
        i = j
      } else if (c == '<' && i + 1 < n && s.charAt(i + 1) == '<') {
        // inline dict (BDC property lists etc.) — skip balanced
        var depth = 0; var j = i
        while (j < n) {
          if (s.startsWith("<<", j)) { depth += 1; j += 2 }
          else if (s.startsWith(">>", j)) { depth -= 1; j += 2; if (depth == 0) { i = j; j = n } }
          else j += 1
        }
        if (i < j && depth != 0) i = n // unbalanced: bail
      } else if (c == '<') {
        val j = s.indexOf('>', i + 1)
        val hex = if (j < 0) "" else s.substring(i + 1, j).replaceAll("\\s", "")
        val padded = if (hex.length % 2 == 1) hex + "0" else hex
        val bytes = new Array[Byte](padded.length / 2)
        var k = 0
        var ok = true
        while (k < bytes.length && ok) {
          try bytes(k) = hexToInt(padded.substring(k * 2, k * 2 + 2)).toByte
          catch { case _: NumberFormatException => ok = false }
          k += 1
        }
        if (ok) { if (inArray) arrayParts += bytes else pendingStr = bytes }
        i = if (j < 0) n else j + 1
      } else if (c == '[') { inArray = true; arrayParts.clear(); i += 1 }
      else if (c == ']') { inArray = false; i += 1 }
      else if (c == '/') {
        var j = i + 1
        while (j < n && !s.charAt(j).isWhitespace &&
          !"()<>[]{}/%".contains(s.charAt(j))) j += 1
        lastName = s.substring(i + 1, j)
        i = j
      } else if (c == '-' || c == '+' || c == '.' || c.isDigit) {
        var j = i + 1
        while (j < n && (s.charAt(j).isDigit || s.charAt(j) == '.')) j += 1
        s.substring(i, j).toDoubleOption.foreach(nums += _)
        i = j
      } else {
        // operator token
        var j = i
        while (j < n && !s.charAt(j).isWhitespace &&
          !"()<>[]{}/%".contains(s.charAt(j))) j += 1
        val op = s.substring(i, j)
        op match {
          case "BT" => emittedInBlock = false
          case "ET" => if (emittedInBlock) newline()
          case "Tf" => cmap = fonts.get(lastName)
          case "Tj" => if (pendingStr != null) show(pendingStr); pendingStr = null
          case "'" =>
            newline(); if (pendingStr != null) show(pendingStr); pendingStr = null
          case "\"" =>
            newline(); if (pendingStr != null) show(pendingStr); pendingStr = null
          case "TJ" =>
            arrayParts.foreach(show); arrayParts.clear()
          case "Td" | "TD" =>
            // ty != 0 → vertical move → new output line
            if (nums.length >= 2 && nums.last != 0.0) newline()
          case "T*" => newline()
          case _ => () // graphics ops — ignored
        }
        nums.clear()
        i = if (j == i) i + 1 else j
      }
    }
    out.toString
  }

  // ------------------------------------------------------------ page walk

  /** Ordered page object numbers via the /Catalog → /Pages → /Kids tree;
    * document-order /Type/Page objects when the tree is unnavigable.
    */
  private def pageOrder(objs: Map[Int, PdfObj]): Seq[Int] = {
    val typePage = """/Type\s*/Page\b(?!s)""".r
    def isPage(o: PdfObj) = typePage.findFirstIn(o.dict).isDefined
    val catalog = objs.values.find(o => o.dict.contains("/Catalog"))
    val fromTree = catalog.flatMap { c =>
      dictValue(c.dict, "Pages").collect { case Left(root) => root }
    }.map { root =>
      val out = mutable.ArrayBuffer.empty[Int]
      val seen = mutable.Set.empty[Int]
      def walk(num: Int): Unit =
        if (seen.add(num)) objs.get(num).foreach { o =>
          if (isPage(o)) out += num
          else {
            val kidsIdx = o.dict.indexOf("/Kids")
            if (kidsIdx >= 0) {
              val close = o.dict.indexOf(']', kidsIdx)
              val arr = if (close > 0) o.dict.substring(kidsIdx, close) else o.dict.substring(kidsIdx)
              Ref.findAllMatchIn(arr).foreach(m => walk(m.group(1).toInt))
            }
          }
        }
      walk(root)
      out.toSeq
    }
    fromTree.filter(_.nonEmpty).getOrElse(
      objs.toSeq.sortBy(_._1).collect { case (num, o) if isPage(o) => num })
  }

  // ------------------------------------------------- standard security handler

  /** The 32-byte password pad of PDF 1.7 §7.6.3.3 (Algorithm 2 step a). */
  private[graft] val PasswordPad: Array[Byte] = Array(
    0x28, 0xBF, 0x4E, 0x5E, 0x4E, 0x75, 0x8A, 0x41, 0x64, 0x00, 0x4E, 0x56,
    0xFF, 0xFA, 0x01, 0x08, 0x2E, 0x2E, 0x00, 0xB6, 0xD0, 0x68, 0x3E, 0x80,
    0x2F, 0x0C, 0xA9, 0xFE, 0x64, 0x53, 0x69, 0x7A).map(_.toByte)

  private[graft] def md5Bytes(parts: Array[Byte]*): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5")
    parts.foreach(d.update)
    d.digest()
  }

  /** Textbook RC4 (KSA + PRGA) — the cipher of the standard handler's
    * revisions 2–3. Symmetric, so the spec uses it to BUILD fixtures too.
    */
  private[graft] def rc4(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val st = Array.tabulate(256)(identity)
    var j = 0
    for (i <- 0 until 256) {
      j = (j + st(i) + (key(i % key.length) & 0xFF)) & 0xFF
      val t = st(i); st(i) = st(j); st(j) = t
    }
    val out = new Array[Byte](data.length)
    var a = 0; var b = 0; var i = 0
    while (i < data.length) {
      a = (a + 1) & 0xFF
      b = (b + st(a)) & 0xFF
      val t = st(a); st(a) = st(b); st(b) = t
      out(i) = (data(i) ^ st((st(a) + st(b)) & 0xFF)).toByte
      i += 1
    }
    out
  }

  private[graft] def padPassword(pw: Array[Byte]): Array[Byte] =
    (pw.take(32) ++ PasswordPad).take(32)

  /** File-level encryption key from a PADDED user password — Algorithm 2
    * for /R 2–4: MD5(paddedPw ‖ O ‖ P-as-LE32 ‖ ID[0] ‖ [FFFFFFFF if R4 and
    * /EncryptMetadata false]), then for R ≥ 3 fifty MD5 re-digests of the
    * first `n` bytes. The default padded password is the bare pad — the
    * empty user password.
    */
  private[graft] def fileKey(
      o: Array[Byte], p: Int, id: Array[Byte], r: Int, keyLen: Int,
      encryptMetadata: Boolean = true,
      paddedPw: Array[Byte] = PasswordPad): Array[Byte] = {
    val pLe = Array[Byte](p.toByte, (p >> 8).toByte, (p >> 16).toByte, (p >> 24).toByte)
    val noMeta =
      if (r >= 4 && !encryptMetadata) Array.fill[Byte](4)(0xFF.toByte)
      else Array.empty[Byte]
    var h = md5Bytes(paddedPw, o, pLe, id, noMeta)
    if (r >= 3) for (_ <- 0 until 50) h = md5Bytes(h.take(keyLen))
    h.take(keyLen)
  }

  /** The RC4 key of the /O entry — Algorithm 3 steps a–d: MD5 of the padded
    * OWNER password (fifty re-digests for R ≥ 3), truncated to the key
    * length. Encrypting direction builds /O; decrypting direction
    * (Algorithm 7) recovers the padded user password from it.
    */
  private def ownerKey(paddedOwnerPw: Array[Byte], r: Int, keyLen: Int): Array[Byte] = {
    var h = md5Bytes(paddedOwnerPw)
    // like Algorithm 2 step h, each re-digest runs over the first keyLen
    // bytes only (a no-op at the common 128-bit length, real at 40-bit)
    if (r >= 3) for (_ <- 0 until 50) h = md5Bytes(h.take(keyLen))
    h.take(keyLen)
  }

  /** AES-CBC via the JDK provider (the standard handler's /V ≥ 4 cipher).
    * Exposed private[graft] like [[rc4]]/[[md5Bytes]] — AES is symmetric, so
    * the spec builds its encrypted fixtures with the same primitive.
    */
  private[graft] def aesCbc(
      encrypt: Boolean, key: Array[Byte], iv: Array[Byte], data: Array[Byte],
      pkcs5: Boolean): Array[Byte] = {
    val c = javax.crypto.Cipher.getInstance(
      if (pkcs5) "AES/CBC/PKCS5Padding" else "AES/CBC/NoPadding")
    c.init(
      if (encrypt) javax.crypto.Cipher.ENCRYPT_MODE else javax.crypto.Cipher.DECRYPT_MODE,
      new javax.crypto.spec.SecretKeySpec(key, "AES"),
      new javax.crypto.spec.IvParameterSpec(iv))
    try c.doFinal(data)
    catch {
      case e: java.security.GeneralSecurityException =>
        throw new IllegalArgumentException(s"AES stream undecipherable: ${e.getMessage}")
    }
  }

  /** Decrypt a /V ≥ 4 stream: leading 16-byte IV, AES-CBC body, PKCS#5
    * padding (§7.6.2). Empty input stays empty (some writers emit
    * zero-length encrypted streams); a body that is not whole blocks is a
    * corrupt file, reported loudly.
    */
  private def aesDecryptStream(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    if (data.isEmpty) data
    else if (data.length < 32 || (data.length - 16) % 16 != 0)
      throw new IllegalArgumentException(
        s"AES stream is not IV + whole blocks (${data.length} bytes)")
    else aesCbc(encrypt = false, key, data.take(16), data.drop(16), pkcs5 = true)
  }

  /** The hardened password hash of ISO 32000-2 §7.6.4.3.4 (Algorithm 2.B,
    * /R 6): SHA-256 seed, then rounds of AES-128-CBC over 64 repetitions of
    * (password ‖ K ‖ udata) re-digested with SHA-256/384/512 chosen by the
    * first 16 bytes mod 3, until ≥ 64 rounds AND last-E-byte ≤ round − 32.
    */
  private[graft] def hash2B(
      pw: Array[Byte], salt: Array[Byte], udata: Array[Byte]): Array[Byte] = {
    def sha(algo: String, parts: Array[Byte]*): Array[Byte] = {
      val d = java.security.MessageDigest.getInstance(algo)
      parts.foreach(d.update)
      d.digest()
    }
    var k = sha("SHA-256", pw, salt, udata)
    var e = Array.empty[Byte]
    var round = 0
    while (round < 64 || (e(e.length - 1) & 0xFF) > round - 32) {
      val one = pw ++ k ++ udata
      val k1 = new Array[Byte](one.length * 64)
      for (i <- 0 until 64) System.arraycopy(one, 0, k1, i * one.length, one.length)
      e = aesCbc(encrypt = true, k.take(16), k.slice(16, 32), k1, pkcs5 = false)
      val mod = (0 until 16).map(e(_) & 0xFF).sum % 3
      k = sha(Seq("SHA-256", "SHA-384", "SHA-512")(mod), e)
      round += 1
    }
    k.take(32)
  }

  /** Per-object decryptor — one impl per standard-handler cipher family. */
  private sealed trait Decryptor {
    def decrypt(num: Int, gen: Int, data: Array[Byte]): Array[Byte]
  }

  /** RC4 /V 1–2 (Algorithm 1: obj/gen-salted MD5 key). */
  private final class Rc4Decryptor(key: Array[Byte]) extends Decryptor {
    def decrypt(num: Int, gen: Int, data: Array[Byte]): Array[Byte] = {
      val salt = Array[Byte](
        num.toByte, (num >> 8).toByte, (num >> 16).toByte,
        gen.toByte, (gen >> 8).toByte)
      val objKey = md5Bytes(key, salt).take(math.min(key.length + 5, 16))
      rc4(objKey, data)
    }
  }

  /** AES-128 /V 4 (/AESV2): the object key appends the sAlT marker bytes to
    * the MD5 input (§7.6.2 Algorithm 1 step b).
    */
  private final class AesV2Decryptor(key: Array[Byte]) extends Decryptor {
    private val SAlT = Array[Byte](0x73, 0x41, 0x6C, 0x54)
    def decrypt(num: Int, gen: Int, data: Array[Byte]): Array[Byte] = {
      val salt = Array[Byte](
        num.toByte, (num >> 8).toByte, (num >> 16).toByte,
        gen.toByte, (gen >> 8).toByte)
      val objKey = md5Bytes(key, salt, SAlT).take(math.min(key.length + 5, 16))
      aesDecryptStream(objKey, data)
    }
  }

  /** AES-256 /V 5 (/AESV3): the file key is used directly (Algorithm 1.A —
    * no per-object salting).
    */
  private final class AesV3Decryptor(key: Array[Byte]) extends Decryptor {
    def decrypt(num: Int, gen: Int, data: Array[Byte]): Array[Byte] =
      aesDecryptStream(key, data)
  }

  /** Parse a PDF array of strings after /key (`[(…) <…> …]`), literal
    * escapes and BALANCED unescaped parens handled (binary DER blobs in
    * /Recipients routinely contain both). Order is preserved — the
    * public-key file-key digest walks the array in order.
    */
  private def dictStringArray(dict: String, key: String): Option[Seq[Array[Byte]]] = {
    val start = (s"""/$key\\s*\\[""").r.findFirstMatchIn(dict).map(_.end)
    start.map { p0 =>
      val out = Seq.newBuilder[Array[Byte]]
      var p = p0
      var done = false
      while (!done && p < dict.length) {
        dict.charAt(p) match {
          case ']' => done = true
          case '(' =>
            // literal string: track escape + paren balance
            val sb = new StringBuilder
            var depth = 1
            p += 1
            while (depth > 0 && p < dict.length) {
              val c = dict.charAt(p)
              if (c == '\\' && p + 1 < dict.length) {
                sb.append(c).append(dict.charAt(p + 1)); p += 2
              } else {
                if (c == '(') depth += 1
                else if (c == ')') depth -= 1
                if (depth > 0) sb.append(c)
                p += 1
              }
            }
            out += decodeLiteral(sb.toString)
          case '<' =>
            val end = dict.indexOf('>', p)
            require(end > 0, s"unterminated hex string in /$key")
            out += dict.substring(p + 1, end).replaceAll("\\s", "")
              .grouped(2).filter(_.length == 2)
              .map(h => java.lang.Integer.parseInt(h, 16).toByte).toArray
            p = end + 1
          case _ => p += 1
        }
      }
      out.result()
    }
  }

  /** Parse a PDF string value (`(…)` literal or `<…>` hex) after /key. */
  private def dictStringBytes(dict: String, key: String): Option[Array[Byte]] = {
    val m = (s"""/$key\\s*(\\((?:\\\\.|[^\\\\)])*\\)|<[0-9A-Fa-f\\s]*>)""").r
      .findFirstMatchIn(dict).map(_.group(1))
    m.map { v =>
      if (v.startsWith("(")) decodeLiteral(v.substring(1, v.length - 1))
      else v.substring(1, v.length - 1).replaceAll("\\s", "")
        .grouped(2).filter(_.length == 2)
        .map(h => java.lang.Integer.parseInt(h, 16).toByte).toArray
    }
  }

  /** Build the decryptor when the trailer carries /Encrypt: standard
    * handler, RC4 /V 1–2 (/R 2–3), AES-128 /V 4 (/R 4), or AES-256 /V 5
    * (/R 5–6). `password` ("" = the empty user password) authenticates
    * first as user, then as owner (Algorithm 7 / the V5 /O‖/OE check).
    * Wrong password or an unsupported scheme throws (→ the caller's error
    * column); returns (encrypt object number, decryptor) so the encrypt
    * dict itself is left alone. `None` also when a /V 4–5 file routes
    * streams through the /Identity filter (streams then aren't encrypted
    * at all).
    */
  private def buildDecryptor(
      s: String, objs: Map[Int, PdfObj],
      password: String,
      recipientKey: Option[java.security.PrivateKey] = None): Option[(Int, Decryptor)] = {
    val encRef = """/Encrypt\s+(\d+)\s+\d+\s+R""".r.findFirstMatchIn(s)
      .map(_.group(1).toInt)
    encRef.flatMap { num =>
      val dict = objs.get(num).map(_.dict)
        .getOrElse(throw new IllegalArgumentException("missing /Encrypt object"))
      if (dict.contains("/Adobe.PubSec"))
        return encRef.flatMap(n => buildPubSecDecryptor(n, dict, recipientKey))
      if (!dict.contains("/Standard"))
        throw new IllegalArgumentException("unsupported PDF security handler")
      // the 32 raw bytes inside the /O and /U literal strings can spell
      // 'R 9' or '/V 7' by chance — strip every (…) literal before
      // scanning for integer entries (ints never live inside strings)
      val cleanDict = dict.replaceAll("""\((?:\\.|[^\\)])*\)""", " ")
      // Top-level entries only: Acrobat serializes dict keys alphabetically,
      // so the nested /CF crypt-filter dict (whose /Length is in BYTES, e.g.
      // '/Length 16') precedes the top-level '/Length 128' (bits) — a
      // first-match regex over the whole dict would read the wrong one and
      // derive a 2-byte file key. /CFM is looked up in cleanDict because it
      // legitimately lives INSIDE the nested CF dict.
      val topDict = stripNestedDicts(cleanDict)
      val v = dictInt(topDict, "/V").getOrElse(0)
      val r = dictInt(topDict, "/R").getOrElse(0)
      val u = dictStringBytes(dict, "U")
        .getOrElse(throw new IllegalArgumentException("missing /U entry"))
      val id = """/ID\s*\[\s*<([0-9A-Fa-f]*)>""".r.findFirstMatchIn(s)
        .map(_.group(1).grouped(2).filter(_.length == 2)
          .map(h => java.lang.Integer.parseInt(h, 16).toByte).toArray)
        .getOrElse(Array.empty[Byte])

      def pEntry: Int =
        """/P\s+(-?\d+)""".r.findFirstMatchIn(topDict).map(_.group(1).toInt)
          .getOrElse(throw new IllegalArgumentException("missing /P entry"))
      def oEntry: Array[Byte] = dictStringBytes(dict, "O")
        .getOrElse(throw new IllegalArgumentException("missing /O entry"))

      // Algorithm 4/5 check (/R 2–4): does this file key open the file?
      // (The /U comparison only depends on the derived key, so it verifies
      // whichever password — empty, user, or owner-recovered — produced it.)
      def keyOpensFile(key: Array[Byte]): Boolean =
        if (r == 2) java.util.Arrays.equals(rc4(key, PasswordPad), u.take(32))
        else {
          var enc = rc4(key, md5Bytes(PasswordPad, id))
          for (i <- 1 to 19)
            enc = rc4(key.map(b => (b ^ i).toByte), enc)
          java.util.Arrays.equals(enc, u.take(16))
        }

      def authFailure: Nothing =
        throw new IllegalArgumentException(
          if (password.isEmpty) "encrypted PDF requires a user password"
          else "wrong password for encrypted PDF")

      // R 2–4 authentication: the supplied password as USER password
      // (Algorithm 2 + 4/5), else as OWNER password (Algorithm 7: the
      // owner key peels /O back into the padded user password, which must
      // then itself open the file).
      def authenticate(keyLen: Int, encMeta: Boolean = true): Array[Byte] = {
        val pwBytes = password.getBytes(Latin1)
        val asUser = fileKey(oEntry, pEntry, id, r, keyLen, encMeta,
          paddedPw = padPassword(pwBytes))
        if (keyOpensFile(asUser)) return asUser
        if (password.nonEmpty) {
          val ok = ownerKey(padPassword(pwBytes), r, keyLen)
          var recovered = oEntry.take(32)
          if (r == 2) recovered = rc4(ok, recovered)
          else for (i <- 19 to 0 by -1)
            recovered = rc4(ok.map(b => (b ^ i).toByte), recovered)
          // recovered is already 32 padded bytes; padPassword is the
          // identity on it
          val asOwner = fileKey(oEntry, pEntry, id, r, keyLen, encMeta,
            paddedPw = padPassword(recovered))
          if (keyOpensFile(asOwner)) return asOwner
        }
        authFailure
      }

      v match {
        case 1 | 2 =>
          if (r < 2 || r > 3)
            throw new IllegalArgumentException(
              s"unsupported PDF encryption (V=$v R=$r)")
          val keyLen = if (v == 1 || r == 2) 5
            else dictInt(topDict, "/Length").map(_ / 8).getOrElse(5)
          val key = authenticate(keyLen)
          Some((num, new Rc4Decryptor(key)))

        case 4 =>
          // crypt-filter layout: /CF <</StdCF <</CFM /AESV2|/V2 …>>>>; the
          // stream filter /StmF names the CF (absent = /Identity = streams
          // in the clear, nothing for us to decrypt)
          val stmF = """/StmF\s*/(\w+)""".r.findFirstMatchIn(topDict).map(_.group(1))
          if (stmF.forall(_ == "Identity")) None
          else {
            val cfm = """/CFM\s*/(\w+)""".r.findFirstMatchIn(cleanDict).map(_.group(1))
              .getOrElse(throw new IllegalArgumentException(
                "V4 encryption without a /CFM crypt filter method"))
            val keyLen = dictInt(topDict, "/Length").map(_ / 8).getOrElse(16)
            val encMeta = !"""/EncryptMetadata\s+false""".r
              .findFirstIn(topDict).isDefined
            val key = authenticate(keyLen, encMeta)
            cfm match {
              case "AESV2" => Some((num, new AesV2Decryptor(key)))
              case "V2" => Some((num, new Rc4Decryptor(key)))
              case other => throw new IllegalArgumentException(
                s"unsupported crypt filter method /$other")
            }
          }

        case 5 =>
          if (r != 5 && r != 6)
            throw new IllegalArgumentException(
              s"unsupported PDF encryption (V=5 R=$r)")
          val stmF = """/StmF\s*/(\w+)""".r.findFirstMatchIn(topDict).map(_.group(1))
          if (stmF.forall(_ == "Identity")) None
          else {
            if (u.length < 48)
              throw new IllegalArgumentException(
                s"/U entry is ${u.length} bytes, need 48 for V5")
            // Algorithm 2.A: V5 passwords are UTF-8, capped at 127 bytes
            // (SASLprep normalization documented out of scope)
            val pw = password.getBytes(StandardCharsets.UTF_8).take(127)
            // R6 hardens with Algorithm 2.B; R5 (deprecated Adobe
            // extension) is a single SHA-256(pw ‖ salt ‖ udata)
            def pwHash(salt: Array[Byte], udata: Array[Byte]): Array[Byte] =
              if (r == 6) hash2B(pw, salt, udata)
              else sha256Of(pw, salt, udata)
            def unwrap(keyHash: Array[Byte], e: Array[Byte], entry: String): Array[Byte] = {
              if (e.length != 32)
                throw new IllegalArgumentException(
                  s"/$entry entry is ${e.length} bytes, need 32")
              aesCbc(encrypt = false, keyHash, new Array[Byte](16), e, pkcs5 = false)
            }
            val empty = Array.empty[Byte]
            val key =
              if (java.util.Arrays.equals(pwHash(u.slice(32, 40), empty), u.take(32))) {
                // user password: key salt + /UE
                val ue = dictStringBytes(dict, "UE").getOrElse(
                  throw new IllegalArgumentException("missing /UE entry"))
                unwrap(pwHash(u.slice(40, 48), empty), ue, "UE")
              } else {
                // owner password: /O's salts hash over the full 48-byte /U
                // (Algorithms 12/2.A), key unwraps from /OE
                val u48 = u.take(48)
                val oOpt = dictStringBytes(dict, "O").filter(_.length >= 48)
                val asOwner = password.nonEmpty && oOpt.exists(o =>
                  java.util.Arrays.equals(
                    pwHash(o.slice(32, 40), u48), o.take(32)))
                if (!asOwner)
                  throw new IllegalArgumentException(
                    if (password.isEmpty) "encrypted PDF requires a user password"
                    else "wrong password for encrypted PDF")
                val o = oOpt.get
                val oe = dictStringBytes(dict, "OE").getOrElse(
                  throw new IllegalArgumentException("missing /OE entry"))
                unwrap(pwHash(o.slice(40, 48), u48), oe, "OE")
              }
            Some((num, new AesV3Decryptor(key)))
          }

        case other =>
          throw new IllegalArgumentException(
            s"unsupported PDF encryption (V=$other R=$r)")
      }
    }
  }

  /** Public-key (/Adobe.PubSec) handler, ISO 32000-1 §7.6.4: recover the
    * seed from /Recipients with the supplied RSA private key (PdfPubSec),
    * derive the file key as digest(seed ‖ blobs [‖ FFFFFFFF]), then reuse
    * the standard handler's per-object decryptors — the cipher families
    * are identical downstream of key derivation.
    *
    * SubFilters: adbe.pkcs7.s3/s4 (/V 1–2, RC4, SHA-1 key) and
    * adbe.pkcs7.s5 (/V 4 crypt filters with SHA-1, /V 5 AES-256 with
    * SHA-256). /Recipients lives top-level for s3/s4 and inside the crypt
    * filter dict for s5 — a plain whole-dict search finds both layouts.
    * No /U//O/P entries exist here; authentication IS the RSA unwrap (a
    * wrong key matches no recipient and refuses loudly).
    */
  private def buildPubSecDecryptor(
      num: Int, dict: String,
      recipientKey: Option[java.security.PrivateKey]): Option[(Int, Decryptor)] = {
    val key = recipientKey.getOrElse(throw new IllegalArgumentException(
      "public-key encrypted PDF requires a recipient private key"))
    val cleanDict = dict.replaceAll("""\((?:\\.|[^\\)])*\)""", " ")
    val topDict = stripNestedDicts(cleanDict)
    val v = dictInt(topDict, "/V").getOrElse(0)
    val blobs = dictStringArray(dict, "Recipients")
      .getOrElse(throw new IllegalArgumentException(
        "public-key encrypted PDF without /Recipients"))
    val (seed, _) = PdfPubSec.openSeed(blobs, key)
    val encMeta = !"""/EncryptMetadata\s+false""".r.findFirstIn(cleanDict).isDefined
    v match {
      case 1 | 2 =>
        val keyLen = if (v == 1) 5 else dictInt(topDict, "/Length").map(_ / 8).getOrElse(5)
        val fk = PdfPubSec.fileKey(seed, blobs, keyLen, sha256 = false,
          encryptMetadata = true) // the FFFFFFFF step is V≥4 only
        Some((num, new Rc4Decryptor(fk)))
      case 4 =>
        val stmF = """/StmF\s*/(\w+)""".r.findFirstMatchIn(topDict).map(_.group(1))
        if (stmF.forall(_ == "Identity")) None
        else {
          val cfm = """/CFM\s*/(\w+)""".r.findFirstMatchIn(cleanDict).map(_.group(1))
            .getOrElse(throw new IllegalArgumentException(
              "V4 encryption without a /CFM crypt filter method"))
          val keyLen = dictInt(topDict, "/Length").map(_ / 8).getOrElse(16)
          val fk = PdfPubSec.fileKey(seed, blobs, keyLen, sha256 = false, encMeta)
          cfm match {
            case "AESV2" => Some((num, new AesV2Decryptor(fk)))
            case "V2" => Some((num, new Rc4Decryptor(fk)))
            case other => throw new IllegalArgumentException(
              s"unsupported crypt filter method /$other")
          }
        }
      case 5 =>
        val stmF = """/StmF\s*/(\w+)""".r.findFirstMatchIn(topDict).map(_.group(1))
        if (stmF.forall(_ == "Identity")) None
        else {
          val fk = PdfPubSec.fileKey(seed, blobs, 32, sha256 = true, encMeta)
          Some((num, new AesV3Decryptor(fk)))
        }
      case other =>
        throw new IllegalArgumentException(
          s"unsupported public-key PDF encryption (V=$other)")
    }
  }

  /** SHA-256(pw ‖ salt ‖ udata) — the /R 5 password hash (Adobe ext.
    * level 3); `udata` is empty for /U, the 48-byte /U for /O.
    */
  private def sha256Of(
      pw: Array[Byte], salt: Array[Byte],
      udata: Array[Byte] = Array.empty): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("SHA-256")
    d.update(pw); d.update(salt); d.update(udata)
    d.digest()
  }

  // ---------------------------------------------------------------- public

  def text(bytes: Array[Byte]): String = text(bytes, password = "")

  /** [[text]] for a public-key (/Adobe.PubSec) protected file: the RSA
    * private key of any listed recipient opens it (PKCS#1 unwrap decides —
    * no certificate matching needed, the poppler behavior).
    */
  def text(bytes: Array[Byte], recipientKey: java.security.PrivateKey): String =
    textImpl(bytes, password = "", recipientKey = Some(recipientKey))

  /** [[text]] for a password-protected file: `password` authenticates as
    * the user password first, then as the owner password (see the handler
    * notes in the object scaladoc). "" = the empty user password.
    */
  def text(bytes: Array[Byte], password: String): String =
    textImpl(bytes, password, recipientKey = None)

  private def textImpl(
      bytes: Array[Byte], password: String,
      recipientKey: Option[java.security.PrivateKey]): String = {
    val topObjs0 = parseObjects(bytes)
    if (topObjs0.isEmpty) throw new IllegalArgumentException("failed to open PDF: no objects")
    // standard security handler: RC4-decrypt every object stream (strings
    // inside content streams decrypt with their stream; XRef streams and
    // the encrypt dict are never encrypted per spec)
    val topObjs = buildDecryptor(new String(bytes, Latin1), topObjs0, password,
      recipientKey) match {
      case None => topObjs0
      case Some((encNum, d)) =>
        val xref = """/Type\s*/XRef""".r
        topObjs0.map { case (n, o) =>
          val skip = n == encNum || xref.findFirstIn(o.dict).isDefined
          n -> (if (skip) o else o.copy(stream = o.stream.map(d.decrypt(n, o.gen, _))))
        }
    }
    // expand compressed object streams; top-level definitions win conflicts
    val objStmType = """/Type\s*/ObjStm""".r
    val embedded = topObjs.values
      .filter(o => objStmType.findFirstIn(o.dict).isDefined)
      .flatMap(o => decodeStream(o).toSeq.flatMap(d => parseObjStm(o.dict, d)))
      .map(o => o.num -> o).toMap
    val objs = embedded ++ topObjs

    // font name → CMap, resolved per page resources below; cache per obj num
    val cmapCache = mutable.Map.empty[Int, Option[CMap]]
    def fontCmap(fontObj: Int): Option[CMap] =
      cmapCache.getOrElseUpdate(fontObj,
        objs.get(fontObj)
          .flatMap(f => dictValue(f.dict, "ToUnicode").collect { case Left(r) => r })
          .flatMap(objs.get)
          .flatMap(decodeStream)
          .map(b => parseCMap(new String(b, Latin1))))

    def resourceFonts(pageDict: String): Map[String, CMap] = {
      val resDict: Option[String] = dictValue(pageDict, "Resources") match {
        case Some(Left(num)) => objs.get(num).map(_.dict)
        case Some(Right(inline)) => Some(inline)
        case None => None
      }
      val fontDict: Option[String] = resDict.flatMap(rd => dictValue(rd, "Font") match {
        case Some(Left(num)) => objs.get(num).map(_.dict)
        case Some(Right(inline)) => Some(inline)
        case None => None
      })
      fontDict.map { fd =>
        """/([^\s/<>\[\]()]+)\s+(\d+)\s+\d+\s+R""".r.findAllMatchIn(fd).flatMap { m =>
          fontCmap(m.group(2).toInt).map(cm => m.group(1) -> cm)
        }.toMap
      }.getOrElse(Map.empty)
    }

    val pages = pageOrder(objs)
    val texts: Seq[String] =
      if (pages.nonEmpty) {
        pages.flatMap { num =>
          objs.get(num).flatMap { page =>
            val contentNums: Seq[Int] = dictValue(page.dict, "Contents") match {
              case Some(Left(n)) => Seq(n)
              case _ =>
                val ci = page.dict.indexOf("/Contents")
                if (ci < 0) Seq.empty
                else {
                  val close = page.dict.indexOf(']', ci)
                  val arr = if (close > 0) page.dict.substring(ci, close) else ""
                  Ref.findAllMatchIn(arr).map(_.group(1).toInt).toSeq
                }
            }
            val content = contentNums.flatMap(cn => objs.get(cn).flatMap(decodeStream))
            if (content.isEmpty) None // errored page skipped (pdf.go:27-30)
            else {
              val merged = content.reduce(_ ++ Array[Byte](' ') ++ _)
              val t = pageText(merged, resourceFonts(page.dict)).trim
              if (t.isEmpty) None else Some(t)
            }
          }
        }
      } else {
        // no page objects (e.g. objects inside /ObjStm): best-effort — every
        // decodable stream that looks like a content stream, document order
        objs.toSeq.sortBy(_._1).flatMap { case (_, o) =>
          decodeStream(o).flatMap { b =>
            val str = new String(b, Latin1)
            if (str.contains("BT") && (str.contains("Tj") || str.contains("TJ"))) {
              val t = pageText(b, Map.empty).trim
              if (t.isEmpty) None else Some(t)
            } else None
          }
        }
      }

    val result = texts.mkString("\n\n").trim
    if (result.isEmpty)
      throw new IllegalArgumentException("no text extracted from PDF")
    result
  }
}

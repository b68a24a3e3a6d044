package graft.sources

import java.nio.charset.StandardCharsets
import java.util.zip.{CRC32, Inflater}

/** WARC (Web ARChive, ISO 28500) reader — the container format of Common
  * Crawl and every large-scale web corpus, i.e. THE input a 100 TB
  * training-data pipeline actually starts from. Zero-dependency: gzip
  * members are decoded with a STRICT member-by-member walker built on raw
  * `Inflater` (`GZIPInputStream` silently treats a corrupt second member
  * header as EOF — a damaged archive would truncate without any signal,
  * the opposite of the loud-failure contract), HTML → text via the
  * existing [[Parsers.HtmlParser]].
  *
  * A WARC file is a sequence of records, each:
  * {{{
  *   WARC/1.0\r\n
  *   WARC-Type: response\r\n
  *   WARC-Target-URI: http://…\r\n
  *   Content-Length: N\r\n
  *   …\r\n
  *   \r\n
  *   <N payload bytes>\r\n\r\n
  * }}}
  * For `response` records the payload is a full HTTP response (status line,
  * headers, blank line, body); `conversion` records carry extracted text
  * directly. The reference has no web-archive source (its watcher ingests
  * office documents, dispatcher.go:12-62) — this is a scale-pipeline
  * extension, same tier as the curation operators.
  *
  * Scale shape: one WARC file = one `binaryFile` row = one task; record
  * iteration is sequential within a file (the format is not splittable
  * mid-stream — Common Crawl ships ~1 GB archives precisely so the FILE is
  * the parallelism unit, thousands per crawl). Memory: the compressed
  * archive is whatever `binaryFile` materialized (≤ its 2 GiB row limit);
  * decompression is STREAMED member-by-member and [[documents]] retains
  * only the extracted text — the ~4–5 GB inflated archive never exists as
  * one buffer. Malformed records, corrupt members and trailing garbage all
  * throw `IllegalArgumentException` → the caller's error column; per-member
  * and per-record caps turn crafted bombs into loud errors instead of
  * executor OOMs (same contract as the media decoders).
  */
private[graft] object WarcExtract {

  /** Single-record and single-gzip-member inflated caps (bomb guards; a
    * Common Crawl member is one record, so these align).
    */
  val MaxRecordBytes: Long = 1L << 26 // 64 MiB per record payload
  val MaxMemberBytes: Long = 1L << 28 // 256 MiB per inflated gzip member

  final case class WarcRecord(
      warcType: String,
      targetUri: String,
      date: String,
      contentType: String,
      payload: Array[Byte])

  /** One extracted document: a text-bearing response/conversion record. */
  final case class WarcDoc(target_uri: String, warc_date: String, text: String)

  private def isGzip(bytes: Array[Byte]): Boolean =
    bytes.length >= 2 && (bytes(0) & 0xFF) == 0x1F && (bytes(1) & 0xFF) == 0x8B

  private def le32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xFFL)) | ((b(off + 1) & 0xFFL) << 8) |
      ((b(off + 2) & 0xFFL) << 16) | ((b(off + 3) & 0xFFL) << 24)

  /** Decode ONE gzip member starting at `off`: RFC 1952 header walk, raw
    * inflate, CRC32 + ISIZE trailer verification. Returns (plaintext, next
    * offset). Every malformation throws IAE with the member offset.
    */
  private def inflateMember(data: Array[Byte], off: Int): (Array[Byte], Int) = {
    def bad(msg: String): Nothing =
      throw new IllegalArgumentException(s"gzip member at offset $off: $msg")
    if (off + 10 > data.length) bad("truncated header")
    if ((data(off) & 0xFF) != 0x1F || (data(off + 1) & 0xFF) != 0x8B)
      bad("bad magic")
    if ((data(off + 2) & 0xFF) != 8) bad("unsupported compression method")
    val flg = data(off + 3) & 0xFF
    var pos = off + 10
    if ((flg & 4) != 0) { // FEXTRA
      if (pos + 2 > data.length) bad("truncated FEXTRA")
      val xlen = ((data(pos) & 0xFF) | ((data(pos + 1) & 0xFF) << 8))
      pos += 2 + xlen
      if (pos > data.length) bad("truncated FEXTRA payload")
    }
    def skipZeroTerminated(what: String): Unit = {
      while (pos < data.length && data(pos) != 0) pos += 1
      if (pos >= data.length) bad(s"unterminated $what")
      pos += 1
    }
    if ((flg & 8) != 0) skipZeroTerminated("FNAME") // FNAME
    if ((flg & 16) != 0) skipZeroTerminated("FCOMMENT") // FCOMMENT
    if ((flg & 2) != 0) { // FHCRC
      pos += 2
      if (pos > data.length) bad("truncated FHCRC")
    }
    val inf = new Inflater(true)
    inf.setInput(data, pos, data.length - pos)
    val out = new java.io.ByteArrayOutputStream(64 * 1024)
    val buf = new Array[Byte](64 * 1024)
    try {
      while (!inf.finished()) {
        val n =
          try inf.inflate(buf)
          catch { case e: java.util.zip.DataFormatException => bad(e.getMessage) }
        if (n == 0 && !inf.finished()) {
          if (inf.needsInput()) bad("truncated deflate body")
          bad("deflate stall")
        }
        out.write(buf, 0, n)
        if (out.size() > MaxMemberBytes) bad(s"inflates past $MaxMemberBytes bytes")
      }
      val trailerAt = pos + inf.getBytesRead.toInt
      if (trailerAt + 8 > data.length) bad("truncated trailer")
      val plain = out.toByteArray
      val crc = new CRC32()
      crc.update(plain)
      if (crc.getValue != le32(data, trailerAt)) bad("CRC32 mismatch")
      if ((plain.length & 0xFFFFFFFFL) != le32(data, trailerAt + 4))
        bad("ISIZE mismatch")
      (plain, trailerAt + 8)
    } finally inf.end()
  }

  /** Lazy plaintext chunks: one per gzip member (strict — a corrupt member
    * ANYWHERE throws, including after valid members), or the raw bytes for
    * an uncompressed archive.
    */
  private def plaintextChunks(bytes: Array[Byte]): Iterator[Array[Byte]] =
    if (!isGzip(bytes)) Iterator.single(bytes)
    else new Iterator[Array[Byte]] {
      private var off = 0
      def hasNext: Boolean = off < bytes.length
      def next(): Array[Byte] = {
        val (plain, nextOff) = inflateMember(bytes, off)
        off = nextOff
        plain
      }
    }

  /** Byte cursor over lazily-produced chunks — readLine/readN never require
    * the concatenated plaintext to exist as one buffer.
    */
  private final class ChunkCursor(chunks: Iterator[Array[Byte]]) {
    private var cur: Array[Byte] = Array.emptyByteArray
    private var pos = 0
    private def ensure(): Boolean = {
      while (pos >= cur.length && chunks.hasNext) { cur = chunks.next(); pos = 0 }
      pos < cur.length
    }
    def atEof: Boolean = !ensure()
    def readByte(): Int =
      if (!ensure()) -1
      else { val b = cur(pos) & 0xFF; pos += 1; b }
    /** Line up to '\n' (consumed), trailing '\r' stripped; None at EOF. */
    def readLine(): Option[String] = {
      if (!ensure()) return None
      val sb = new java.io.ByteArrayOutputStream(128)
      var b = readByte()
      while (b >= 0 && b != '\n') { sb.write(b); b = readByte() }
      val arr = sb.toByteArray
      val n = if (arr.nonEmpty && arr(arr.length - 1) == '\r') arr.length - 1 else arr.length
      Some(new String(arr, 0, n, StandardCharsets.UTF_8))
    }
    /** Exactly n bytes; IAE when the stream ends early. */
    def readN(n: Int): Array[Byte] = {
      val out = new Array[Byte](n)
      var got = 0
      while (got < n) {
        if (!ensure())
          throw new IllegalArgumentException(
            s"WARC record payload truncated ($n bytes declared, $got available)")
        val take = math.min(n - got, cur.length - pos)
        System.arraycopy(cur, pos, out, got, take)
        pos += take
        got += take
      }
      out
    }
  }

  /** Streaming record walk — records are parsed and handed out one at a
    * time; memory is one record + one inflated member, never the archive.
    */
  def recordIterator(bytes: Array[Byte]): Iterator[WarcRecord] = {
    val in = new ChunkCursor(plaintextChunks(bytes))
    new Iterator[WarcRecord] {
      private var nextRec: WarcRecord = null
      private def advance(): Unit = {
        nextRec = null
        // tolerate blank separator lines between records
        var line = in.readLine()
        while (line.exists(_.isEmpty)) line = in.readLine()
        line match {
          case None => ()
          case Some(version) =>
            if (!version.startsWith("WARC/"))
              throw new IllegalArgumentException(
                s"expected WARC version line, got '${version.take(40)}'")
            val headers = scala.collection.mutable.Map.empty[String, String]
            var lastKey: String = null
            var h = in.readLine().getOrElse(
              throw new IllegalArgumentException("WARC record truncated in headers"))
            while (h.nonEmpty) {
              if ((h.startsWith(" ") || h.startsWith("\t")) && lastKey != null) {
                headers(lastKey) = headers(lastKey) + " " + h.trim
              } else {
                val ci = h.indexOf(':')
                if (ci <= 0)
                  throw new IllegalArgumentException(
                    s"malformed WARC header '${h.take(40)}'")
                lastKey = h.substring(0, ci).trim.toLowerCase(java.util.Locale.ROOT)
                headers(lastKey) = h.substring(ci + 1).trim
              }
              h = in.readLine().getOrElse(
                throw new IllegalArgumentException("WARC record truncated in headers"))
            }
            val len = headers.get("content-length") match {
              case Some(v) =>
                val n = try v.toLong catch {
                  case _: NumberFormatException =>
                    throw new IllegalArgumentException(s"bad Content-Length '$v'")
                }
                if (n < 0 || n > MaxRecordBytes)
                  throw new IllegalArgumentException(
                    s"WARC record length $n out of range")
                n.toInt
              case None =>
                throw new IllegalArgumentException("WARC record missing Content-Length")
            }
            nextRec = WarcRecord(
              warcType = headers.getOrElse("warc-type", ""),
              targetUri = headers.getOrElse("warc-target-uri", ""),
              date = headers.getOrElse("warc-date", ""),
              contentType = headers.getOrElse("content-type", ""),
              payload = in.readN(len))
        }
      }
      advance()
      def hasNext: Boolean = nextRec != null
      def next(): WarcRecord = {
        val r = nextRec
        advance()
        r
      }
    }
  }

  /** All records materialized (spec convenience; [[documents]] streams). */
  def records(bytes: Array[Byte]): Vector[WarcRecord] =
    recordIterator(bytes).toVector

  /** Split an HTTP message payload into (headers, body) at the first blank
    * line; returns None when no separator exists (truncated message).
    */
  private def splitHttp(payload: Array[Byte]): Option[(String, Array[Byte])] = {
    var i = 0
    while (i + 1 < payload.length) {
      if (i + 3 < payload.length &&
        payload(i) == '\r' && payload(i + 1) == '\n' &&
        payload(i + 2) == '\r' && payload(i + 3) == '\n') {
        val head = new String(payload, 0, i, StandardCharsets.UTF_8)
        return Some((head, java.util.Arrays.copyOfRange(payload, i + 4, payload.length)))
      }
      // Lenient LF-only variant (some writers normalize).
      if (payload(i) == '\n' && payload(i + 1) == '\n') {
        val head = new String(payload, 0, i, StandardCharsets.UTF_8)
        return Some((head, java.util.Arrays.copyOfRange(payload, i + 2, payload.length)))
      }
      i += 1
    }
    None
  }

  private def httpHeader(head: String, name: String): Option[String] = {
    val ln = name.toLowerCase(java.util.Locale.ROOT) + ":"
    head.linesIterator.drop(1) // skip the status line
      .find(_.toLowerCase(java.util.Locale.ROOT).startsWith(ln))
      .map(l => l.substring(l.indexOf(':') + 1).trim)
  }

  /** Extract readable text from one record: `response` payloads have their
    * HTTP envelope stripped and text/html (via [[Parsers.HtmlParser]]) or
    * text/plain bodies extracted; `conversion` records with a text-family
    * content type are taken verbatim. Everything else (requests, warcinfo,
    * metadata, binary responses) yields None.
    */
  def text(r: WarcRecord): Option[String] = r.warcType match {
    case "response" if r.contentType.startsWith("application/http") =>
      splitHttp(r.payload).flatMap { case (head, body) =>
        val ct = httpHeader(head, "Content-Type").getOrElse("")
        if (ct.contains("text/html"))
          scala.util.Try(Parsers.HtmlParser.parse(body)).toOption.filter(_.nonEmpty)
        else if (ct.contains("text/plain"))
          Some(new String(body, StandardCharsets.UTF_8).trim).filter(_.nonEmpty)
        else None
      }
    case "conversion" if r.contentType.startsWith("text/") =>
      Some(new String(r.payload, StandardCharsets.UTF_8).trim).filter(_.nonEmpty)
    case _ => None
  }

  /** All text-bearing documents of one (possibly gzipped) WARC archive —
    * streamed: only the extracted text is retained.
    */
  def documents(bytes: Array[Byte]): Vector[WarcDoc] =
    recordIterator(bytes)
      .flatMap(r => text(r).map(WarcDoc(r.targetUri, r.date, _)))
      .toVector
}

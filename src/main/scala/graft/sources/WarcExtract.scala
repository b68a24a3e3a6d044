package graft.sources

import java.io.{ByteArrayInputStream, EOFException}
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

/** WARC (Web ARChive, ISO 28500) reader — the container format of Common
  * Crawl and every large-scale web corpus, i.e. THE input a 100 TB
  * training-data pipeline actually starts from. Zero-dependency: gzip via
  * `java.util.zip` (multi-member concatenation — the standard per-record
  * gzip layout of Common Crawl — is handled by `GZIPInputStream`
  * transparently), HTML → text via the existing [[Parsers.HtmlParser]].
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
  * the parallelism unit, thousands per crawl). Malformed records throw
  * `IllegalArgumentException` → the caller's error column; decompression and
  * per-record sizes are capped so a crafted bomb degrades loudly instead of
  * OOM-killing the executor (same contract as the media decoders).
  */
private[graft] object WarcExtract {

  /** Decompressed-stream and single-record caps (documented bomb guards). */
  val MaxArchiveBytes: Long = 1L << 28 // 256 MiB decompressed per archive
  val MaxRecordBytes: Long = 1L << 26 // 64 MiB per record payload

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

  /** Fully decompress (if gzipped) under [[MaxArchiveBytes]]. */
  private def inflate(bytes: Array[Byte]): Array[Byte] = {
    if (!isGzip(bytes)) {
      if (bytes.length > MaxArchiveBytes)
        throw new IllegalArgumentException(
          s"WARC archive exceeds $MaxArchiveBytes bytes")
      return bytes
    }
    val out = new java.io.ByteArrayOutputStream(math.min(bytes.length.toLong * 4, 1L << 20).toInt)
    val buf = new Array[Byte](64 * 1024)
    var total = 0L
    var in: GZIPInputStream = null
    try {
      // Constructor parses the gzip header — its ZipException is a corrupt
      // archive too, so it lives inside the same catch.
      in = new GZIPInputStream(new ByteArrayInputStream(bytes))
      var n = in.read(buf)
      while (n >= 0) {
        total += n
        if (total > MaxArchiveBytes)
          throw new IllegalArgumentException(
            s"WARC archive inflates past $MaxArchiveBytes bytes")
        out.write(buf, 0, n)
        n = in.read(buf)
      }
    } catch {
      case _: EOFException =>
        throw new IllegalArgumentException("truncated gzip member in WARC archive")
      case e: java.util.zip.ZipException =>
        throw new IllegalArgumentException(s"corrupt gzip in WARC archive: ${e.getMessage}")
    } finally if (in != null) in.close()
    out.toByteArray
  }

  /** Cursor-based record walk over the inflated archive. */
  def records(bytes: Array[Byte]): Vector[WarcRecord] = {
    val data = inflate(bytes)
    val out = Vector.newBuilder[WarcRecord]
    var pos = 0

    def lineEnd(from: Int): Int = {
      var i = from
      while (i < data.length && data(i) != '\n') i += 1
      i
    }
    // Reads the line at pos (sans trailing \r\n), advances pos past it.
    def readLine(): String = {
      val e = lineEnd(pos)
      val trimEnd = if (e > pos && data(e - 1) == '\r') e - 1 else e
      val s = new String(data, pos, trimEnd - pos, StandardCharsets.UTF_8)
      pos = math.min(e + 1, data.length)
      s
    }

    while (pos < data.length) {
      // Tolerate blank separator lines between records.
      var line = readLine()
      while (line.isEmpty && pos < data.length) line = readLine()
      if (line.nonEmpty) {
        if (!line.startsWith("WARC/"))
          throw new IllegalArgumentException(
            s"expected WARC version line at offset, got '${line.take(40)}'")
        // Headers until the blank line; folded continuations appended.
        val headers = scala.collection.mutable.Map.empty[String, String]
        var lastKey: String = null
        var h = readLine()
        while (h.nonEmpty) {
          if ((h.startsWith(" ") || h.startsWith("\t")) && lastKey != null) {
            headers(lastKey) = headers(lastKey) + " " + h.trim
          } else {
            val ci = h.indexOf(':')
            if (ci <= 0)
              throw new IllegalArgumentException(s"malformed WARC header '${h.take(40)}'")
            lastKey = h.substring(0, ci).trim.toLowerCase(java.util.Locale.ROOT)
            headers(lastKey) = h.substring(ci + 1).trim
          }
          if (pos >= data.length)
            throw new IllegalArgumentException("WARC record truncated in headers")
          h = readLine()
        }
        val len = headers.get("content-length") match {
          case Some(v) =>
            val n = try v.toLong catch {
              case _: NumberFormatException =>
                throw new IllegalArgumentException(s"bad Content-Length '$v'")
            }
            if (n < 0 || n > MaxRecordBytes)
              throw new IllegalArgumentException(s"WARC record length $n out of range")
            n.toInt
          case None =>
            throw new IllegalArgumentException("WARC record missing Content-Length")
        }
        if (pos + len > data.length)
          throw new IllegalArgumentException(
            s"WARC record payload truncated ($len bytes declared, ${data.length - pos} left)")
        val payload = java.util.Arrays.copyOfRange(data, pos, pos + len)
        pos += len
        out += WarcRecord(
          warcType = headers.getOrElse("warc-type", ""),
          targetUri = headers.getOrElse("warc-target-uri", ""),
          date = headers.getOrElse("warc-date", ""),
          contentType = headers.getOrElse("content-type", ""),
          payload = payload)
      }
    }
    out.result()
  }

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

  /** All text-bearing documents of one (possibly gzipped) WARC archive. */
  def documents(bytes: Array[Byte]): Vector[WarcDoc] =
    records(bytes).flatMap(r => text(r).map(WarcDoc(r.targetUri, r.date, _)))
}

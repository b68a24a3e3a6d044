package graft.sources

import java.nio.charset.StandardCharsets

/** Format parsers: bytes → extracted text (SURVEY.md §2.1 S3-S9).
  *
  * All formats have real zero-dependency implementations: text/markdown/HTML/
  * EML directly, DOCX and XLSX via `java.util.zip` + JDK StAX over the OOXML
  * parts (`OoxmlExtract`), and PDF via a minimal extractor with FlateDecode,
  * ToUnicode CMap and /ObjStm support (`PdfExtract`). The PDF subset boundary
  * (no predictor filters / encryption) is documented on `PdfExtract`.
  */
trait Parser extends Serializable {
  /** Extract plain text; throw on unparseable input (caller maps to error col). */
  def parse(bytes: Array[Byte]): String
}

object Parsers {

  /** Extension → parser dispatch table (dispatcher.go:12-62). */
  val supportedExtensions: Seq[String] =
    Seq("pdf", "docx", "txt", "md", "xlsx", "xls", "html", "htm", "eml")

  object TextParser extends Parser {
    def parse(bytes: Array[Byte]): String = {
      val s = new String(bytes, StandardCharsets.UTF_8)
      if (s.isEmpty) throw new IllegalArgumentException("empty file")
      s
    }
  }

  /** HTML → text: drop script/style/noscript subtrees and all tags, decode
    * basic entities, collapse whitespace (html.go:13-40 contract: the visible
    * text only).
    */
  object HtmlParser extends Parser {
    private val dropBlocks = "(?is)<(script|style|noscript)\\b[^>]*>.*?</\\1>".r
    private val comments = "(?s)<!--.*?-->".r
    private val tags = "(?s)<[^>]+>".r
    def parse(bytes: Array[Byte]): String = {
      var s = new String(bytes, StandardCharsets.UTF_8)
      s = dropBlocks.replaceAllIn(s, " ")
      s = comments.replaceAllIn(s, " ")
      s = tags.replaceAllIn(s, " ")
      // &amp; decoded LAST: decoding it first would double-decode escaped
      // entities ("&amp;lt;" must yield "&lt;", not "<")
      s = s.replace("&nbsp;", " ").replace("&lt;", "<")
        .replace("&gt;", ">").replace("&quot;", "\"").replace("&#39;", "'")
        .replace("&amp;", "&")
      s.replaceAll("\\s+", " ").trim
    }
  }

  /** EML → text: `Subject:`/`Sender:`/`Date:` header lines + the body after
    * the first blank line (email.go:15-77 output shape).
    */
  object EmlParser extends Parser {
    def parse(bytes: Array[Byte]): String = {
      // RFC 5322 messages use CRLF; normalize so the blank-line split works
      val s = new String(bytes, StandardCharsets.UTF_8).replace("\r\n", "\n")
      val (headerPart, body) = s.indexOf("\n\n") match {
        case -1 => (s, "")
        case i => (s.substring(0, i), s.substring(i + 2))
      }
      val headers = headerPart.linesIterator.toSeq
      def header(name: String): Option[String] =
        headers.find(_.toLowerCase(java.util.Locale.ROOT).startsWith(name.toLowerCase(java.util.Locale.ROOT) + ":"))
          .map(_.substring(name.length + 1).trim)
      val out = new StringBuilder
      header("Subject").foreach(v => out.append(s"Subject: $v\n"))
      header("From").foreach(v => out.append(s"Sender: $v\n"))
      header("Date").foreach(v => out.append(s"Date: $v\n"))
      out.append("\n").append(body.trim)
      out.toString.trim
    }
  }

  /** PDF text extraction (pdf.go:14-44 contract: per-page text joined by
    * "\n\n", errored pages skipped, error when nothing extracted). Classic
    * xref layout + FlateDecode + ToUnicode CMaps; see `PdfExtract` scaladoc
    * for the exact subset boundary.
    */
  object PdfParser extends Parser {
    def parse(bytes: Array[Byte]): String = PdfExtract.text(bytes)
  }

  /** DOCX extraction (docx.go:13-31 contract: all text, trimmed, error when
    * empty) — ZIP + `word/document.xml` `<w:t>` runs, no POI needed.
    */
  object DocxParser extends Parser {
    def parse(bytes: Array[Byte]): String = OoxmlExtract.docxText(bytes)
  }

  /** XLSX "markdownification" (excel.go:13-94 contract: per sheet a
    * `Sheet: name` line then `Row N: H1: v1, H2: v2` rows, empty cells
    * skipped, unreadable sheets noted inline) — ZIP + worksheet/sharedStrings
    * XML. Legacy binary .xls is not OOXML and still raises.
    */
  object ExcelParser extends Parser {
    def parse(bytes: Array[Byte]): String = OoxmlExtract.xlsxText(bytes)
  }

  /** Dispatch by lowercase extension (dispatcher.go:12-50). */
  def forExtension(ext: String): Option[Parser] = ext.toLowerCase(java.util.Locale.ROOT) match {
    case "txt" | "md" => Some(TextParser)
    case "html" | "htm" => Some(HtmlParser)
    case "eml" => Some(EmlParser)
    case "pdf" => Some(PdfParser)
    case "docx" => Some(DocxParser)
    case "xlsx" | "xls" => Some(ExcelParser)
    case _ => None
  }

  /** Parse or None on failure/unsupported (pipeline keeps going; the
    * reference logs and skips failed files).
    */
  def parseOrNone(ext: String, bytes: Array[Byte]): Option[String] =
    forExtension(ext).flatMap(p => scala.util.Try(p.parse(bytes)).toOption)
}

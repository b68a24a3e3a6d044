package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.util.zip.ZipInputStream
import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}
import scala.collection.mutable

/** Zero-dependency OOXML readers: .docx and .xlsx are ZIP containers of XML
  * parts, readable with `java.util.zip` + the JDK StAX parser — no POI needed.
  *
  * Behavioral contracts come from the reference:
  *   - DOCX: /root/reference/internal/parser/docx.go:13-31 — all text runs,
  *     trimmed, error when empty.
  *   - XLSX: /root/reference/internal/parser/excel.go:13-94 — per sheet a
  *     `Sheet: name` line then `Row N: Header: v, Header: v` rows (1-based row
  *     numbers counting the header row, so the first data row is "Row 2"),
  *     empty cells skipped, blank headers become `Column N`, unreadable sheets
  *     noted inline, sheets separated by a blank line.
  */
private[graft] object OoxmlExtract {

  /** Read every ZIP entry into memory (parser inputs are whole-file byte
    * arrays already, so the container is bounded by the same budget).
    */
  def zipEntries(bytes: Array[Byte]): Map[String, Array[Byte]] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = mutable.Map.empty[String, Array[Byte]]
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory) out(e.getName) = zin.readAllBytes()
        zin.closeEntry()
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.toMap
  }

  /** Hardened StAX reader (no DTDs, no external entities). */
  private def xmlReader(bytes: Array[Byte]): XMLStreamReader = {
    val f = XMLInputFactory.newInstance()
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.createXMLStreamReader(new ByteArrayInputStream(bytes))
  }

  private def attr(r: XMLStreamReader, name: String): Option[String] = {
    var i = 0
    while (i < r.getAttributeCount) {
      if (r.getAttributeLocalName(i) == name) return Some(r.getAttributeValue(i))
      i += 1
    }
    None
  }

  // ------------------------------------------------------------------ DOCX

  /** word/document.xml text: `<w:t>` runs concatenated; `<w:tab/>` → TAB,
    * `<w:br/>`/`<w:cr/>` → newline, paragraph end → newline.
    */
  def docxText(bytes: Array[Byte]): String = {
    val parts = zipEntries(bytes)
    val doc = parts.getOrElse("word/document.xml",
      throw new IllegalArgumentException("not a .docx: missing word/document.xml"))
    val sb = new StringBuilder
    val r = xmlReader(doc)
    var inT = false
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "t" => inT = true
            case "tab" => sb.append('\t')
            case "br" | "cr" => sb.append('\n')
            case _ => ()
          }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (inT) sb.append(r.getText)
          case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
            case "t" => inT = false
            case "p" => sb.append('\n')
            case _ => ()
          }
          case _ => ()
        }
      }
    } finally r.close()
    val text = sb.toString.trim
    if (text.isEmpty)
      throw new IllegalArgumentException("no text extracted from DOCX")
    text
  }

  // ------------------------------------------------------------------ XLSX

  /** `A1`-style reference → 0-based column index. */
  private[sources] def colIndex(ref: String): Int = {
    var i = 0; var c = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      c = c * 26 + (ref.charAt(i).toUpper - 'A' + 1); i += 1
    }
    c - 1
  }

  /** sharedStrings.xml: one entry per `<si>`, rich-text `<t>` runs joined. */
  private def sharedStrings(bytes: Array[Byte]): IndexedSeq[String] = {
    val out = mutable.ArrayBuffer.empty[String]
    val r = xmlReader(bytes)
    var cur: StringBuilder = null
    var inT = false
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "si" => cur = new StringBuilder
            case "t" => inT = true
            case _ => ()
          }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (inT && cur != null) cur.append(r.getText)
          case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
            case "t" => inT = false
            case "si" => out += cur.toString; cur = null
            case _ => ()
          }
          case _ => ()
        }
      }
    } finally r.close()
    out.toIndexedSeq
  }

  /** Worksheet XML → dense rows (1..maxRow), each a dense cell vector. */
  private def sheetRows(bytes: Array[Byte],
                        shared: IndexedSeq[String]): Vector[Vector[String]] = {
    val rows = mutable.Map.empty[Int, mutable.Map[Int, String]]
    val r = xmlReader(bytes)
    var rowN = 0; var colN = -1
    var cellType = ""; var inV = false; var inIs = false; var inT = false
    var value = new StringBuilder
    try {
      while (r.hasNext) {
        r.next() match {
          case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
            case "row" =>
              rowN = attr(r, "r").map(_.toInt).getOrElse(rowN + 1)
              colN = -1
            case "c" =>
              colN = attr(r, "r").map(colIndex).getOrElse(colN + 1)
              cellType = attr(r, "t").getOrElse("")
              value = new StringBuilder
            case "v" => inV = true
            case "is" => inIs = true
            case "t" => inT = true
            case _ => ()
          }
          case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA =>
            if (inV || (inIs && inT)) value.append(r.getText)
          case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
            case "v" => inV = false
            case "is" => inIs = false
            case "t" => inT = false
            case "c" =>
              val raw = value.toString
              val resolved = cellType match {
                case "s" => raw.toIntOption.flatMap(shared.lift).getOrElse("")
                // value-less boolean cells are EMPTY cells, not FALSE
                case "b" => if (raw == "1") "TRUE" else if (raw.nonEmpty) "FALSE" else ""
                case _ => raw // n, str, inlineStr (already captured), e
              }
              if (resolved.nonEmpty && rowN > 0 && colN >= 0)
                rows.getOrElseUpdate(rowN, mutable.Map.empty)(colN) = resolved
            case _ => ()
          }
          case _ => ()
        }
      }
    } finally r.close()
    if (rows.isEmpty) Vector.empty
    else {
      val maxRow = rows.keys.max
      (1 to maxRow).map { rn =>
        rows.get(rn) match {
          case None => Vector.empty[String]
          case Some(cells) =>
            val maxCol = cells.keys.max
            (0 to maxCol).map(c => cells.getOrElse(c, "")).toVector
        }
      }.toVector
    }
  }

  /** workbook.xml sheet list (name, r:id) in declared order. */
  private def workbookSheets(bytes: Array[Byte]): Seq[(String, String)] = {
    val out = mutable.ArrayBuffer.empty[(String, String)]
    val r = xmlReader(bytes)
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "sheet") {
          val name = attr(r, "name").getOrElse(s"Sheet${out.size + 1}")
          val rid = attr(r, "id").getOrElse("") // r:id resolves by local name
          out += ((name, rid))
        }
      }
    } finally r.close()
    out.toSeq
  }

  /** workbook.xml.rels: r:id → part path rooted at the package. */
  private def workbookRels(bytes: Array[Byte]): Map[String, String] = {
    val out = mutable.Map.empty[String, String]
    val r = xmlReader(bytes)
    try {
      while (r.hasNext) {
        if (r.next() == XMLStreamConstants.START_ELEMENT && r.getLocalName == "Relationship") {
          (attr(r, "Id"), attr(r, "Target")) match {
            case (Some(id), Some(t)) =>
              out(id) = if (t.startsWith("/")) t.drop(1) else "xl/" + t
            case _ => ()
          }
        }
      }
    } finally r.close()
    out.toMap
  }

  /** Full workbook → markdownified text (excel.go:29-83 format, exactly). */
  def xlsxText(bytes: Array[Byte]): String = {
    val parts = zipEntries(bytes)
    val wb = parts.getOrElse("xl/workbook.xml",
      throw new IllegalArgumentException("not a .xlsx: missing xl/workbook.xml"))
    val sheets = workbookSheets(wb)
    if (sheets.isEmpty)
      throw new IllegalArgumentException("no sheets found in Excel file")
    val rels = parts.get("xl/_rels/workbook.xml.rels")
      .map(workbookRels).getOrElse(Map.empty)
    val shared = parts.get("xl/sharedStrings.xml")
      .map(sharedStrings).getOrElse(IndexedSeq.empty)

    val out = new StringBuilder
    sheets.zipWithIndex.foreach { case ((name, rid), sheetIdx) =>
      if (sheetIdx > 0) out.append("\n\n")
      out.append(s"Sheet: $name\n")
      val rowsOrErr: Either[String, Vector[Vector[String]]] =
        rels.get(rid).flatMap(parts.get) match {
          case None => Left("worksheet part not found")
          case Some(xml) =>
            try Right(sheetRows(xml, shared))
            catch { case e: Exception => Left(String.valueOf(e.getMessage)) }
        }
      rowsOrErr match {
        case Left(err) => out.append(s"(Unable to read sheet $name: $err)\n")
        case Right(rows) if rows.isEmpty => ()
        case Right(rows) =>
          val headers = rows.head
          if (headers.nonEmpty) {
            var rowIdx = 1
            while (rowIdx < rows.length) {
              val row = rows(rowIdx)
              val rowParts = headers.indices.flatMap { colIdx =>
                if (colIdx < row.length && row(colIdx).nonEmpty) {
                  val v = row(colIdx).trim
                  if (v.nonEmpty) {
                    val h = headers(colIdx).trim
                    val headerName = if (h.isEmpty) s"Column ${colIdx + 1}" else h
                    Some(s"$headerName: $v")
                  } else None
                } else None
              }
              if (rowParts.nonEmpty)
                out.append(s"Row ${rowIdx + 1}: ${rowParts.mkString(", ")}\n")
              rowIdx += 1
            }
          }
      }
    }
    val result = out.toString.trim
    if (result.isEmpty)
      throw new IllegalArgumentException("no content extracted from Excel file")
    result
  }
}

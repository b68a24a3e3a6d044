package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util.zip.{Deflater, ZipEntry, ZipOutputStream}

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Binary-format parsers built from java.util.zip + JDK XML only:
  * DOCX/XLSX (OoxmlExtract) against the reference's docx.go/excel.go
  * contracts, and the minimal PDF extractor (PdfExtract) against pdf.go's
  * per-page contract — including the reference's own sample.pdf, whose
  * subsetted font requires the ToUnicode CMap path.
  */
class BinaryParsersSpec extends AnyFunSuite {

  // ------------------------------------------------------- fixture builders

  private def zip(entries: (String, String)*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val z = new ZipOutputStream(bos)
    entries.foreach { case (name, content) =>
      z.putNextEntry(new ZipEntry(name))
      z.write(content.getBytes(StandardCharsets.UTF_8))
      z.closeEntry()
    }
    z.close()
    bos.toByteArray
  }

  private val W = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"

  private def docxFixture: Array[Byte] = zip(
    "[Content_Types].xml" -> """<?xml version="1.0"?><Types/>""",
    "word/document.xml" ->
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<w:document xmlns:w="$W"><w:body>
         |<w:p><w:r><w:t>Quarterly report for </w:t></w:r><w:r><w:t>Project Alpha</w:t></w:r></w:p>
         |<w:p><w:r><w:t>Second paragraph with a</w:t><w:tab/><w:t>tab and a</w:t><w:br/><w:t>line break.</w:t></w:r></w:p>
         |</w:body></w:document>""".stripMargin)

  private def xlsxFixture: Array[Byte] = zip(
    "xl/workbook.xml" ->
      """<?xml version="1.0"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        |          xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets>
        |  <sheet name="People" sheetId="1" r:id="rId1"/>
        |  <sheet name="Extra" sheetId="2" r:id="rId2"/>
        |  <sheet name="Broken" sheetId="3" r:id="rId3"/>
        |</sheets></workbook>""".stripMargin,
    "xl/_rels/workbook.xml.rels" ->
      """<?xml version="1.0"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="t" Target="worksheets/sheet1.xml"/>
        |<Relationship Id="rId2" Type="t" Target="worksheets/sheet2.xml"/>
        |<Relationship Id="rId3" Type="t" Target="worksheets/missing.xml"/>
        |</Relationships>""".stripMargin,
    "xl/sharedStrings.xml" ->
      """<?xml version="1.0"?>
        |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="5" uniqueCount="5">
        |<si><t>Name</t></si>
        |<si><r><t>Reg</t></r><r><t>ion</t></r></si>
        |<si><t>Alice</t></si>
        |<si><t>North</t></si>
        |<si><t>Bob</t></si>
        |</sst>""".stripMargin,
    "xl/worksheets/sheet1.xml" ->
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1">
        |  <c r="A1" t="s"><v>0</v></c>
        |  <c r="B1" t="s"><v>1</v></c>
        |  <c r="C1" t="inlineStr"><is><t>Amount</t></is></c>
        |  <c r="D1" t="inlineStr"><is><t>Flag</t></is></c>
        |</row>
        |<row r="2">
        |  <c r="A2" t="s"><v>2</v></c>
        |  <c r="B2" t="s"><v>3</v></c>
        |  <c r="C2"><v>100</v></c>
        |  <c r="D2" t="b"/>
        |</row>
        |<row r="4">
        |  <c r="A4" t="s"><v>4</v></c>
        |  <c r="C4"><v>250</v></c>
        |  <c r="D4" t="b"><v>1</v></c>
        |</row>
        |</sheetData></worksheet>""".stripMargin,
    "xl/worksheets/sheet2.xml" ->
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>
        |<row r="1"><c r="B1" t="inlineStr"><is><t>H</t></is></c></row>
        |<row r="2">
        |  <c r="A2" t="inlineStr"><is><t>x</t></is></c>
        |  <c r="B2" t="b"><v>1</v></c>
        |</row>
        |</sheetData></worksheet>""".stripMargin)

  /** Two-page classic-layout PDF: page 1 Flate-compressed with escapes and a
    * hex string, page 2 a raw stream; Kids order 3,5 regardless of object
    * order in the file.
    */
  private def pdfFixture: Array[Byte] = {
    def deflate(s: String): Array[Byte] = {
      val d = new Deflater()
      d.setInput(s.getBytes(StandardCharsets.ISO_8859_1)); d.finish()
      val out = new ByteArrayOutputStream()
      val buf = new Array[Byte](1024)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end(); out.toByteArray
    }
    val c1 = deflate(
      "BT /F1 12 Tf 72 720 Td (Hello from page one.) Tj " +
        "0 -14 Td (Second line with \\(escapes\\) and octal \\101.) Tj " +
        "0 -14 Td [(A)-120(B)] TJ 0 -14 Td <48657821> Tj ET")
    val c2 = "BT (Page two text) Tj ET".getBytes(StandardCharsets.ISO_8859_1)
    val bos = new ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.4\n")
    w("1 0 obj <</Type/Catalog/Pages 2 0 R>> endobj\n")
    w("2 0 obj <</Type/Pages/Kids[3 0 R 5 0 R]/Count 2>> endobj\n")
    w("3 0 obj <</Type/Page/Parent 2 0 R/Contents 4 0 R/Resources<</Font<</F1 7 0 R>>>>>> endobj\n")
    w(s"4 0 obj <</Length ${c1.length}/Filter/FlateDecode>>\nstream\n")
    bos.write(c1)
    w("\nendstream\nendobj\n")
    w("5 0 obj <</Type/Page/Parent 2 0 R/Contents 6 0 R>> endobj\n")
    w(s"6 0 obj <</Length ${c2.length}>>\nstream\n")
    bos.write(c2)
    w("\nendstream\nendobj\n")
    w("7 0 obj <</Type/Font/Subtype/Type1/BaseFont/Helvetica>> endobj\n")
    w("%%EOF\n")
    bos.toByteArray
  }

  /** PDF 1.5-style layout: catalog/pages/page dicts live inside a Flate-
    * compressed /ObjStm; only the content stream is a top-level object.
    */
  private def pdfObjStmFixture: Array[Byte] = {
    def deflate(b: Array[Byte]): Array[Byte] = {
      val d = new Deflater(); d.setInput(b); d.finish()
      val out = new ByteArrayOutputStream(); val buf = new Array[Byte](1024)
      while (!d.finished()) out.write(buf, 0, d.deflate(buf))
      d.end(); out.toByteArray
    }
    val bodies = Seq(
      1 -> "<</Type/Catalog/Pages 2 0 R>>",
      2 -> "<</Type/Pages/Kids[3 0 R]/Count 1>>",
      3 -> "<</Type/Page/Parent 2 0 R/Contents 4 0 R>>")
    val joined = bodies.map(_._2).mkString("\n")
    val offsets = bodies.map(_._2).scanLeft(0)((acc, b) => acc + b.length + 1)
    val header = bodies.zip(offsets).map { case ((num, _), off) => s"$num $off" }
      .mkString(" ") + "\n"
    val stmData = (header + joined).getBytes(StandardCharsets.ISO_8859_1)
    val packed = deflate(stmData)
    val content = "BT (Compressed object stream text) Tj ET"
      .getBytes(StandardCharsets.ISO_8859_1)
    val bos = new ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.5\n")
    w(s"5 0 obj <</Type/ObjStm/N 3/First ${header.length}/Length ${packed.length}/Filter/FlateDecode>>\nstream\n")
    bos.write(packed)
    w("\nendstream\nendobj\n")
    w(s"4 0 obj <</Length ${content.length}>>\nstream\n")
    bos.write(content)
    w("\nendstream\nendobj\n")
    w("%%EOF\n")
    bos.toByteArray
  }

  // ------------------------------------------------------------------ DOCX

  test("docx: w:t runs, tabs, breaks, paragraph newlines (docx.go contract)") {
    val text = Parsers.DocxParser.parse(docxFixture)
    assert(text ==
      "Quarterly report for Project Alpha\nSecond paragraph with a\ttab and a\nline break.")
  }

  test("docx: empty document and non-docx zip fail loudly") {
    intercept[IllegalArgumentException](
      Parsers.DocxParser.parse(zip("other.xml" -> "<a/>")))
    intercept[IllegalArgumentException](Parsers.DocxParser.parse(zip(
      "word/document.xml" -> s"""<w:document xmlns:w="$W"><w:body/></w:document>""")))
    assert(Parsers.parseOrNone("docx", Array[Byte](1, 2, 3)).isEmpty)
  }

  // ------------------------------------------------------------------ XLSX

  test("xlsx: markdownification matches excel.go row format exactly") {
    val text = Parsers.ExcelParser.parse(xlsxFixture)
    // row lines end with \n and sheets are separated by "\n\n" — exactly the
    // strings.Builder sequence of excel.go:30-33,73 (two blank lines between
    // a sheet's last row and the next Sheet: header)
    // D2 is a value-less boolean cell: an EMPTY cell (skipped), not FALSE;
    // D4 carries <v>1</v> → TRUE
    val expected =
      """Sheet: People
        |Row 2: Name: Alice, Region: North, Amount: 100
        |Row 4: Name: Bob, Amount: 250, Flag: TRUE
        |
        |
        |Sheet: Extra
        |Row 2: Column 1: x, H: TRUE
        |
        |
        |Sheet: Broken
        |(Unable to read sheet Broken: worksheet part not found)""".stripMargin
    assert(text == expected)
  }

  test("xlsx: column reference arithmetic (A, Z, AA, AB)") {
    assert(OoxmlExtract.colIndex("A1") == 0)
    assert(OoxmlExtract.colIndex("Z9") == 25)
    assert(OoxmlExtract.colIndex("AA10") == 26)
    assert(OoxmlExtract.colIndex("AB1") == 27)
  }

  test("xlsx: no-sheet workbook fails loudly") {
    intercept[IllegalArgumentException](Parsers.ExcelParser.parse(zip(
      "xl/workbook.xml" -> "<workbook><sheets/></workbook>")))
  }

  // ------------------------------------------------------------------- PDF

  test("pdf: pages in Kids order joined by blank line; escapes, TJ, hex") {
    val text = Parsers.PdfParser.parse(pdfFixture)
    assert(text ==
      "Hello from page one.\nSecond line with (escapes) and octal A.\nAB\nHex!\n\nPage two text")
  }

  test("pdf: the reference's sample.pdf decodes via its ToUnicode CMap") {
    val path = Paths.get("/root/reference/test_watch_dir/sample.pdf")
    assume(Files.exists(path))
    val text = Parsers.PdfParser.parse(Files.readAllBytes(path))
    assert(text == "Dummy PDF file")
  }

  test("pdf: page tree inside a compressed /ObjStm object stream resolves") {
    val text = Parsers.PdfParser.parse(pdfObjStmFixture)
    assert(text == "Compressed object stream text")
  }

  test("pdf: stream bytes spelling 'N M obj' don't truncate the stream") {
    // a content stream whose DATA contains an ASCII object-header pattern;
    // the object scanner must not clamp the stream at the fake boundary
    val content = "BT (fake 7 0 obj inside string) Tj ET"
      .getBytes(StandardCharsets.ISO_8859_1)
    val bos = new ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.4\n")
    w("1 0 obj <</Type/Catalog/Pages 2 0 R>> endobj\n")
    w("2 0 obj <</Type/Pages/Kids[3 0 R]/Count 1>> endobj\n")
    w("3 0 obj <</Type/Page/Parent 2 0 R/Contents 4 0 R>> endobj\n")
    w(s"4 0 obj <</Length ${content.length}>>\nstream\n")
    bos.write(content)
    w("\nendstream\nendobj\n%%EOF\n")
    assert(Parsers.PdfParser.parse(bos.toByteArray) == "fake 7 0 obj inside string")
  }

  /** Classic-layout PDF whose content stream is Flate + PNG-Up predictor
    * (/Predictor 12 /Columns 16) — the filter layout modern writers use for
    * xref/ObjStm streams, applied here to a content stream so text
    * extraction exercises the full unpredict path.
    */
  private def pdfPredictorFixture: Array[Byte] = {
    val text = "BT (Predictor stream text) Tj ET"
    val columns = 16
    val padded = text + " " * ((columns - text.length % columns) % columns)
    val raw = padded.getBytes(StandardCharsets.ISO_8859_1)
    // PNG Up filter: filtered[x] = raw[x] - prior[x]; each row prefixed by 2
    val rows = raw.grouped(columns).toSeq
    val filtered = new ByteArrayOutputStream()
    var prior = new Array[Byte](columns)
    for (row <- rows) {
      filtered.write(2)
      for (x <- row.indices) filtered.write((row(x) - prior(x)) & 0xff)
      prior = row
    }
    val d = new Deflater(); d.setInput(filtered.toByteArray); d.finish()
    val out = new ByteArrayOutputStream(); val buf = new Array[Byte](1024)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    val packed = out.toByteArray
    val bos = new ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.5\n")
    w("1 0 obj <</Type/Catalog/Pages 2 0 R>> endobj\n")
    w("2 0 obj <</Type/Pages/Kids[3 0 R]/Count 1>> endobj\n")
    w("3 0 obj <</Type/Page/Parent 2 0 R/Contents 4 0 R>> endobj\n")
    w(s"4 0 obj <</Length ${packed.length}/Filter/FlateDecode" +
      s"/DecodeParms<</Predictor 12/Columns $columns>>>>\nstream\n")
    bos.write(packed)
    w("\nendstream\nendobj\n")
    w("%%EOF\n")
    bos.toByteArray
  }

  test("pdf: TIFF-predictor Flate stream (Predictor 2) extracts correctly") {
    val text = "BT (Tiff predictor text) Tj ET"
    val columns = 15
    val padded = text + " " * ((columns - text.length % columns) % columns)
    val raw = padded.getBytes(StandardCharsets.ISO_8859_1)
    // TIFF horizontal differencing (no per-row filter byte): delta vs the
    // previous sample in the row
    val diffed = raw.clone()
    for (row <- 0 until raw.length / columns; i <- (columns - 1) to 1 by -1)
      diffed(row * columns + i) =
        (raw(row * columns + i) - raw(row * columns + i - 1)).toByte
    val d = new Deflater(); d.setInput(diffed); d.finish()
    val out = new ByteArrayOutputStream(); val buf = new Array[Byte](1024)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    val packed = out.toByteArray
    val bos = new ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.5\n")
    w("1 0 obj <</Type/Catalog/Pages 2 0 R>> endobj\n")
    w("2 0 obj <</Type/Pages/Kids[3 0 R]/Count 1>> endobj\n")
    w("3 0 obj <</Type/Page/Parent 2 0 R/Contents 4 0 R>> endobj\n")
    w(s"4 0 obj <</Length ${packed.length}/Filter/FlateDecode" +
      s"/DecodeParms<</Predictor 2/Columns $columns>>>>\nstream\n")
    bos.write(packed)
    w("\nendstream\nendobj\n")
    w("%%EOF\n")
    assert(PdfExtract.text(bos.toByteArray) == "Tiff predictor text")
  }

  test("pdf: PNG-predictor Flate stream (Predictor 12) extracts correctly") {
    assert(PdfExtract.text(pdfPredictorFixture) == "Predictor stream text")
  }

  test("pdf: corrupt predictor layout degrades to no-text error, not crash") {
    // declare Columns that don't divide the stream into whole rows
    val fixture = new String(pdfPredictorFixture, StandardCharsets.ISO_8859_1)
      .replace("/Columns 16", "/Columns 7")
      .getBytes(StandardCharsets.ISO_8859_1)
    intercept[IllegalArgumentException](PdfExtract.text(fixture))
  }

  /** Owner-locked RC4-encrypted PDF built with the PDF 1.7 §7.6.3 public
    * algorithms themselves (RC4 is symmetric, so the extractor's own
    * primitives encrypt the fixture): owner password "hive-owner", EMPTY
    * user password, the most common "encrypted" PDF in the wild.
    * `userPw` non-empty builds a genuinely user-locked file instead.
    */
  private def pdfRc4Fixture(r: Int, userPw: String = ""): Array[Byte] = {
    import PdfExtract.{md5Bytes, padPassword, rc4, PasswordPad}
    val keyLen = if (r == 2) 5 else 16
    val perms = -44 // print allowed, modify denied — a typical owner lock
    val id = Array.tabulate[Byte](16)(i => (i * 11 + 3).toByte)
    val idHex = id.map(b => f"${b & 0xFF}%02x").mkString
    // Algorithm 3: the /O entry (padded user password under the owner key)
    var oh = md5Bytes(padPassword("hive-owner".getBytes(StandardCharsets.ISO_8859_1)))
    if (r >= 3) for (_ <- 0 until 50) oh = md5Bytes(oh)
    val ownerKey = oh.take(keyLen)
    var o = rc4(ownerKey, padPassword(userPw.getBytes(StandardCharsets.ISO_8859_1)))
    if (r >= 3) for (i <- 1 to 19) o = rc4(ownerKey.map(b => (b ^ i).toByte), o)
    // Algorithm 2: file key from the USER password this fixture is locked to
    val pLe = Array[Byte](perms.toByte, (perms >> 8).toByte,
      (perms >> 16).toByte, (perms >> 24).toByte)
    var kh = md5Bytes(padPassword(userPw.getBytes(StandardCharsets.ISO_8859_1)),
      o, pLe, id)
    if (r >= 3) for (_ <- 0 until 50) kh = md5Bytes(kh.take(keyLen))
    val key = kh.take(keyLen)
    // Algorithms 4/5: the /U entry
    val u =
      if (r == 2) rc4(key, PasswordPad)
      else {
        var enc = rc4(key, md5Bytes(PasswordPad, id))
        for (i <- 1 to 19) enc = rc4(key.map(b => (b ^ i).toByte), enc)
        enc ++ new Array[Byte](16) // 16 bytes of arbitrary padding per spec
      }
    def hex(b: Array[Byte]) = b.map(x => f"${x & 0xFF}%02x").mkString
    // Algorithm 1: per-object stream encryption
    def encObj(num: Int, data: Array[Byte]): Array[Byte] = {
      val salt = Array[Byte](num.toByte, (num >> 8).toByte, (num >> 16).toByte, 0, 0)
      rc4(md5Bytes(key, salt).take(math.min(keyLen + 5, 16)), data)
    }
    val c1 = encObj(4, "BT (Owner locked, user readable.) Tj ET"
      .getBytes(StandardCharsets.ISO_8859_1))
    val bos = new ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.4\n")
    w("1 0 obj <</Type/Catalog/Pages 2 0 R>> endobj\n")
    w("2 0 obj <</Type/Pages/Kids[3 0 R]/Count 1>> endobj\n")
    w("3 0 obj <</Type/Page/Parent 2 0 R/Contents 4 0 R>> endobj\n")
    w(s"4 0 obj <</Length ${c1.length}>>\nstream\n")
    bos.write(c1)
    w("\nendstream\nendobj\n")
    w(s"5 0 obj <</Filter/Standard/V ${if (r == 2) 1 else 2}/R $r" +
      s"${if (r >= 3) "/Length 128" else ""}/O <${hex(o)}>/U <${hex(u)}>" +
      s"/P $perms>> endobj\n")
    w(s"trailer <</Root 1 0 R/Encrypt 5 0 R/ID [<$idHex> <$idHex>]>>\n")
    w("%%EOF\n")
    bos.toByteArray
  }

  /** Owner-locked AES-128 (/V 4 /R 4 /AESV2) PDF — same MD5 key derivation
    * as RC4 R3/R4, content streams AES-CBC'd with the sAlT object key and a
    * leading IV (PDF 1.7 §7.6.2). Built with the extractor's own symmetric
    * primitives, like [[pdfRc4Fixture]].
    */
  private def pdfAesV2Fixture(userPw: String = ""): Array[Byte] = {
    import PdfExtract.{aesCbc, md5Bytes, padPassword, rc4, PasswordPad}
    val keyLen = 16
    val perms = -44
    val id = Array.tabulate[Byte](16)(i => (i * 11 + 3).toByte)
    val idHex = id.map(b => f"${b & 0xFF}%02x").mkString
    // Algorithm 3 /O (identical to R3/R4)
    var oh = md5Bytes(padPassword("hive-owner".getBytes(StandardCharsets.ISO_8859_1)))
    for (_ <- 0 until 50) oh = md5Bytes(oh)
    val ownerKey = oh.take(keyLen)
    var o = rc4(ownerKey, padPassword(userPw.getBytes(StandardCharsets.ISO_8859_1)))
    for (i <- 1 to 19) o = rc4(ownerKey.map(b => (b ^ i).toByte), o)
    // Algorithm 2 file key (R4, /EncryptMetadata true)
    val pLe = Array[Byte](perms.toByte, (perms >> 8).toByte,
      (perms >> 16).toByte, (perms >> 24).toByte)
    var kh = md5Bytes(padPassword(userPw.getBytes(StandardCharsets.ISO_8859_1)),
      o, pLe, id)
    for (_ <- 0 until 50) kh = md5Bytes(kh.take(keyLen))
    val key = kh.take(keyLen)
    // Algorithm 5 /U (R >= 3 branch)
    var uEnc = rc4(key, md5Bytes(PasswordPad, id))
    for (i <- 1 to 19) uEnc = rc4(key.map(b => (b ^ i).toByte), uEnc)
    val u = uEnc ++ new Array[Byte](16)
    def hex(b: Array[Byte]) = b.map(x => f"${x & 0xFF}%02x").mkString
    // AESV2 object encryption: MD5(key || salt || sAlT), IV-prefixed CBC
    def encObj(num: Int, data: Array[Byte]): Array[Byte] = {
      val salt = Array[Byte](num.toByte, (num >> 8).toByte, (num >> 16).toByte, 0, 0,
        0x73, 0x41, 0x6C, 0x54)
      val objKey = md5Bytes(key, salt).take(16)
      val iv = Array.fill[Byte](16)(0x42)
      iv ++ aesCbc(encrypt = true, objKey, iv, data, pkcs5 = true)
    }
    val c1 = encObj(4, "BT (AES-128 owner locked.) Tj ET"
      .getBytes(StandardCharsets.ISO_8859_1))
    val bos = new ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-1.6\n")
    w("1 0 obj <</Type/Catalog/Pages 2 0 R>> endobj\n")
    w("2 0 obj <</Type/Pages/Kids[3 0 R]/Count 1>> endobj\n")
    w("3 0 obj <</Type/Page/Parent 2 0 R/Contents 4 0 R>> endobj\n")
    w(s"4 0 obj <</Length ${c1.length}>>\nstream\n")
    bos.write(c1)
    w("\nendstream\nendobj\n")
    w(s"5 0 obj <</Filter/Standard/V 4/R 4/Length 128" +
      s"/CF <</StdCF <</CFM/AESV2/AuthEvent/DocOpen/Length 16>>>>" +
      s"/StmF/StdCF/StrF/StdCF/O <${hex(o)}>/U <${hex(u)}>/P $perms>> endobj\n")
    w(s"trailer <</Root 1 0 R/Encrypt 5 0 R/ID [<$idHex> <$idHex>]>>\n")
    w("%%EOF\n")
    bos.toByteArray
  }

  /** Owner-locked AES-256 (/V 5 /R 5–6 /AESV3) PDF per ISO 32000-2 §7.6.4:
    * /U carries hash ‖ validation salt ‖ key salt, /UE wraps the random
    * file key under the key-salt hash (Algorithm 2.B for R6, single
    * SHA-256 for the deprecated R5).
    */
  private def pdfAesV3Fixture(r: Int, userPw: String = ""): Array[Byte] = {
    import PdfExtract.{aesCbc, hash2B}
    val fileKey = Array.tabulate[Byte](32)(i => (i * 7 + 1).toByte)
    val pw = userPw.getBytes(StandardCharsets.UTF_8).take(127)
    val vs = Array.tabulate[Byte](8)(i => (i + 10).toByte)
    val ks = Array.tabulate[Byte](8)(i => (i + 50).toByte)
    def sha256(parts: Array[Byte]*): Array[Byte] = {
      val d = java.security.MessageDigest.getInstance("SHA-256")
      parts.foreach(d.update)
      d.digest()
    }
    def pwHash(salt: Array[Byte], udata: Array[Byte]): Array[Byte] =
      if (r == 6) hash2B(pw, salt, udata) else sha256(pw, salt, udata)
    val empty = Array.empty[Byte]
    val iv0 = new Array[Byte](16)
    val u = pwHash(vs, empty) ++ vs ++ ks
    val ue = aesCbc(encrypt = true, pwHash(ks, empty), iv0, fileKey, pkcs5 = false)
    // owner entries (hashed over the full 48-byte /U per Algorithms 9/3.A)
    val opw = "hive-owner".getBytes(StandardCharsets.UTF_8)
    val ovs = Array.tabulate[Byte](8)(i => (i + 90).toByte)
    val oks = Array.tabulate[Byte](8)(i => (i + 120).toByte)
    def oHash(salt: Array[Byte]): Array[Byte] =
      if (r == 6) hash2B(opw, salt, u) else sha256(opw, salt, u)
    val o = oHash(ovs) ++ ovs ++ oks
    val oe = aesCbc(encrypt = true, oHash(oks), iv0, fileKey, pkcs5 = false)
    val permsBlock = Array[Byte](
      -44, -1, -1, -1, -1.toByte, -1.toByte, -1.toByte, -1.toByte,
      'T', 'a', 'd', 'b', 0, 0, 0, 0)
    val permsEnc = aesCbc(encrypt = true, fileKey, iv0, permsBlock, pkcs5 = false)
    def hex(b: Array[Byte]) = b.map(x => f"${x & 0xFF}%02x").mkString
    def encObj(data: Array[Byte]): Array[Byte] = {
      val iv = Array.fill[Byte](16)(0x24)
      iv ++ aesCbc(encrypt = true, fileKey, iv, data, pkcs5 = true)
    }
    val c1 = encObj(s"BT (AES-256 R$r owner locked.) Tj ET"
      .getBytes(StandardCharsets.ISO_8859_1))
    val bos = new ByteArrayOutputStream()
    def w(s: String): Unit = bos.write(s.getBytes(StandardCharsets.ISO_8859_1))
    w("%PDF-2.0\n")
    w("1 0 obj <</Type/Catalog/Pages 2 0 R>> endobj\n")
    w("2 0 obj <</Type/Pages/Kids[3 0 R]/Count 1>> endobj\n")
    w("3 0 obj <</Type/Page/Parent 2 0 R/Contents 4 0 R>> endobj\n")
    w(s"4 0 obj <</Length ${c1.length}>>\nstream\n")
    bos.write(c1)
    w("\nendstream\nendobj\n")
    w(s"5 0 obj <</Filter/Standard/V 5/R $r/Length 256" +
      s"/CF <</StdCF <</CFM/AESV3/AuthEvent/DocOpen/Length 32>>>>" +
      s"/StmF/StdCF/StrF/StdCF/O <${hex(o)}>/OE <${hex(oe)}>" +
      s"/U <${hex(u)}>/UE <${hex(ue)}>/P -44/Perms <${hex(permsEnc)}>>> endobj\n")
    w("trailer <</Root 1 0 R/Encrypt 5 0 R>>\n")
    w("%%EOF\n")
    bos.toByteArray
  }

  test("pdf: RC4 owner-locked files extract with the empty user password") {
    // both the 40-bit R2 and 128-bit R3 revisions of the standard handler
    assert(PdfExtract.text(pdfRc4Fixture(r = 2)) == "Owner locked, user readable.")
    assert(PdfExtract.text(pdfRc4Fixture(r = 3)) == "Owner locked, user readable.")
  }

  test("pdf: AES-128 (AESV2) owner-locked files extract") {
    assert(PdfExtract.text(pdfAesV2Fixture()) == "AES-128 owner locked.")
  }

  test("pdf: AESV2 with Acrobat's alphabetical key order (/CF precedes /Length)") {
    // Acrobat serializes dict keys alphabetically, so the nested crypt
    // filter's '/Length 16' (BYTES) appears before the top-level
    // '/Length 128' (bits) — a first-match scan over the whole dict reads
    // the wrong one and derives a 2-byte file key
    val s = new String(pdfAesV2Fixture(), StandardCharsets.ISO_8859_1)
    val pat = ("""(?s)<</Filter/Standard/V 4/R 4/Length 128""" +
      """(/CF <</StdCF <</CFM/AESV2/AuthEvent/DocOpen/Length 16>>>>)""" +
      """/StmF/StdCF/StrF/StdCF/O <([0-9a-f]+)>/U <([0-9a-f]+)>/P (-?\d+)>>""").r
    val m = pat.findFirstMatchIn(s).getOrElse(fail("encrypt dict not found"))
    val alphabetical = s"<<${m.group(1)}/Filter/Standard/Length 128" +
      s"/O <${m.group(2)}>/P ${m.group(4)}/R 4/StmF/StdCF/StrF/StdCF" +
      s"/U <${m.group(3)}>/V 4>>"
    val reordered = s.substring(0, m.start) + alphabetical + s.substring(m.end)
    assert(reordered != s)
    assert(PdfExtract.text(reordered.getBytes(StandardCharsets.ISO_8859_1))
      == "AES-128 owner locked.")
  }

  test("pdf: AES-256 (AESV3) owner-locked files extract, R5 and R6") {
    assert(PdfExtract.text(pdfAesV3Fixture(r = 5)) == "AES-256 R5 owner locked.")
    assert(PdfExtract.text(pdfAesV3Fixture(r = 6)) == "AES-256 R6 owner locked.")
  }

  test("pdf: user-password-locked files land in the error column") {
    // genuinely user-locked: the empty-password check must refuse loudly
    // across all three cipher families
    for (locked <- Seq(pdfRc4Fixture(r = 3, userPw = "secret123"),
        pdfAesV2Fixture(userPw = "secret123"),
        pdfAesV3Fixture(r = 6, userPw = "secret123"))) {
      val e = intercept[IllegalArgumentException](PdfExtract.text(locked))
      assert(e.getMessage.contains("user password"))
      // and through the pipeline boundary: skipped, never a crash
      assert(Parsers.parseOrNone("pdf", locked).isEmpty)
    }
  }

  test("pdf: the user password opens user-locked files, all cipher families") {
    assert(PdfExtract.text(pdfRc4Fixture(r = 2, userPw = "secret123"), "secret123")
      == "Owner locked, user readable.")
    assert(PdfExtract.text(pdfRc4Fixture(r = 3, userPw = "secret123"), "secret123")
      == "Owner locked, user readable.")
    assert(PdfExtract.text(pdfAesV2Fixture(userPw = "secret123"), "secret123")
      == "AES-128 owner locked.")
    assert(PdfExtract.text(pdfAesV3Fixture(r = 5, userPw = "secret123"), "secret123")
      == "AES-256 R5 owner locked.")
    assert(PdfExtract.text(pdfAesV3Fixture(r = 6, userPw = "secret123"), "secret123")
      == "AES-256 R6 owner locked.")
  }

  test("pdf: the owner password opens user-locked files, all cipher families") {
    // Algorithm 7 for R 2–4 (the owner key peels /O back into the padded
    // user password); the /O‖/OE hash-over-/U path for V5
    for (locked <- Seq(pdfRc4Fixture(r = 2, userPw = "secret123"),
        pdfRc4Fixture(r = 3, userPw = "secret123"),
        pdfAesV2Fixture(userPw = "secret123"),
        pdfAesV3Fixture(r = 5, userPw = "secret123"),
        pdfAesV3Fixture(r = 6, userPw = "secret123")))
      assert(PdfExtract.text(locked, "hive-owner").nonEmpty)
  }

  test("pdf: a wrong password fails loudly, never mis-decrypts") {
    for (locked <- Seq(pdfRc4Fixture(r = 3, userPw = "secret123"),
        pdfAesV2Fixture(userPw = "secret123"),
        pdfAesV3Fixture(r = 6, userPw = "secret123"))) {
      val e = intercept[IllegalArgumentException](
        PdfExtract.text(locked, "not-the-password"))
      assert(e.getMessage.contains("wrong password"))
    }
    // a supplied-but-wrong password on an owner-locked (empty-user) file
    // must ALSO refuse — no silent fallback to the empty password
    intercept[IllegalArgumentException](
      PdfExtract.text(pdfRc4Fixture(r = 3), "not-the-password"))
    // and the empty password still opens owner-locked files via the overload
    assert(PdfExtract.text(pdfRc4Fixture(r = 3), "")
      == "Owner locked, user readable.")
  }

  test("pdf: passwords past the spec bound are truncated, not rejected") {
    // R <= 4 pads/truncates to 32 bytes (§7.6.3.3 Algorithm 2 step a): a
    // 40-char password authenticates via its first 32 chars
    val pw40 = "A" * 40
    val lockedR3 = pdfRc4Fixture(r = 3, userPw = pw40)
    assert(PdfExtract.text(lockedR3, pw40) == "Owner locked, user readable.")
    assert(PdfExtract.text(lockedR3, "A" * 32) == "Owner locked, user readable.")
    // V5 caps at 127 UTF-8 bytes (Algorithm 2.A)
    val pw130 = "B" * 130
    val lockedV5 = pdfAesV3Fixture(r = 6, userPw = pw130)
    assert(PdfExtract.text(lockedV5, pw130) == "AES-256 R6 owner locked.")
    assert(PdfExtract.text(lockedV5, "B" * 127) == "AES-256 R6 owner locked.")
  }

  test("pdf: mutated encrypted fixtures never escape parseOrNone") {
    // bit-flips over all three cipher families: corrupt key material, IVs,
    // padding and dict entries must degrade to None, never hang or escape
    // (the ParserFuzzSpec contract applied to the encrypted layouts)
    val rnd = new scala.util.Random(20260812L)
    for (base <- Seq(pdfRc4Fixture(r = 3), pdfAesV2Fixture(), pdfAesV3Fixture(r = 6));
        _ <- 1 to 60) {
      val mutated = base.clone()
      for (_ <- 1 to 1 + rnd.nextInt(5))
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      Parsers.parseOrNone("pdf", mutated) // must return, Some or None
    }
    // same contract down the password-authentication paths (user and owner)
    for (base <- Seq(pdfRc4Fixture(r = 3, userPw = "secret123"),
        pdfAesV2Fixture(userPw = "secret123"),
        pdfAesV3Fixture(r = 6, userPw = "secret123"));
        pw <- Seq("secret123", "hive-owner"); _ <- 1 to 30) {
      val mutated = base.clone()
      for (_ <- 1 to 1 + rnd.nextInt(5))
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      try { PdfExtract.text(mutated, pw); () }
      catch { case _: IllegalArgumentException => () } // only the loud kind
    }
  }

  test("pdf: unsupported encryption schemes error loudly, not mis-decrypt") {
    // an unknown /V version
    val v7 = new String(pdfRc4Fixture(r = 3), StandardCharsets.ISO_8859_1)
      .replace("/V 2/R 3", "/V 7/R 9").getBytes(StandardCharsets.ISO_8859_1)
    intercept[IllegalArgumentException](PdfExtract.text(v7))
    // a public-key security handler
    val pubsec = new String(pdfRc4Fixture(r = 3), StandardCharsets.ISO_8859_1)
      .replace("/Filter/Standard", "/Filter/Adobe.PubSec")
      .getBytes(StandardCharsets.ISO_8859_1)
    intercept[IllegalArgumentException](PdfExtract.text(pubsec))
    // a V4 file with an unknown crypt filter method
    val cfm = new String(pdfAesV2Fixture(), StandardCharsets.ISO_8859_1)
      .replace("/CFM/AESV2", "/CFM/AESV9")
      .getBytes(StandardCharsets.ISO_8859_1)
    intercept[IllegalArgumentException](PdfExtract.text(cfm))
  }

  test("xls: legacy BIFF bytes land in the error column, not a crash") {
    // BIFF8 compound-file magic (D0 CF 11 E0 ...) — not OOXML, must raise
    val biff = Array(0xd0, 0xcf, 0x11, 0xe0, 0xa1, 0xb1, 0x1a, 0xe1)
      .map(_.toByte) ++ Array.fill[Byte](64)(0)
    assert(Parsers.forExtension("xls").contains(Parsers.ExcelParser))
    intercept[Exception](Parsers.ExcelParser.parse(biff))
    // the pipeline-level contract: parseOrNone skips, never throws
    assert(Parsers.parseOrNone("xls", biff).isEmpty)
  }

  test("pdf: garbage bytes and text-free PDFs fail loudly") {
    intercept[IllegalArgumentException](Parsers.PdfParser.parse(Array[Byte](1, 2)))
    assert(Parsers.parseOrNone("pdf", "no pdf here".getBytes).isEmpty)
  }

  // ----------------------------------------------------------- end-to-end

  test("ingest pipeline chunks docx/xlsx/pdf through the dispatcher") {
    val spark = SparkTestBase.spark
    val dir = Files.createTempDirectory("graft-binparse")
    Files.write(dir.resolve("report.docx"), docxFixture)
    Files.write(dir.resolve("numbers.xlsx"), xlsxFixture)
    Files.write(dir.resolve("brief.pdf"), pdfFixture)
    val chunks = Ingest.ingestDir(spark, dir.toString, organizationId = "org1",
      chunkSize = 200, overlap = 40, dim = 8)
    val byFile = chunks.collect()
      .groupBy(_.getAs[Map[String, String]]("metadata")("filename"))
      .view.mapValues(_.map(_.getAs[String]("content")).mkString(" ")).toMap
    assert(byFile.keySet == Set("report.docx", "numbers.xlsx", "brief.pdf"))
    assert(byFile("report.docx").contains("Project Alpha"))
    assert(byFile("numbers.xlsx").contains("Row 2: Name: Alice, Region: North, Amount: 100"))
    assert(byFile("brief.pdf").contains("Hello from page one."))
  }
}

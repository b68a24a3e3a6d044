package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

/** Robustness fuzz for the binary parsers: random bytes, truncations and
  * bit-flips of valid fixtures must never hang, loop or escape the
  * `parseOrNone` Try boundary — malformed real-world files are the ingest
  * pipeline's steady diet, and one pathological file must not kill a batch.
  * Fixed seed → deterministic CI.
  */
class ParserFuzzSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(20260812L)

  private def randomBytes(n: Int): Array[Byte] = {
    val b = new Array[Byte](n); rnd.nextBytes(b); b
  }

  private lazy val samplePdf: Array[Byte] =
    Files.readAllBytes(Paths.get("/root/reference/test_watch_dir/sample.pdf"))

  test("random garbage never escapes parseOrNone for any extension") {
    for (_ <- 1 to 50; ext <- Seq("pdf", "docx", "xlsx", "html", "eml", "txt")) {
      val bytes = randomBytes(1 + rnd.nextInt(2048))
      Parsers.parseOrNone(ext, bytes) // must return, Some or None
    }
  }

  test("truncated real PDF at every 10% never hangs or escapes") {
    for (pct <- 1 to 9) {
      val cut = samplePdf.length * pct / 10
      Parsers.parseOrNone("pdf", java.util.Arrays.copyOf(samplePdf, cut))
    }
  }

  test("bit-flipped real PDF parses or fails cleanly") {
    for (_ <- 1 to 20) {
      val mutated = samplePdf.clone()
      for (_ <- 1 to 5)
        mutated(rnd.nextInt(mutated.length)) = rnd.nextInt(256).toByte
      Parsers.parseOrNone("pdf", mutated)
    }
  }

  test("PDF content-stream tokenizer survives unbalanced constructs") {
    // hand-built pathological content streams exercised through the object
    // layer: unterminated string, unbalanced dict, bare hex, deep parens
    val payloads = Seq(
      "BT (never closed",
      "BT << /deep << /deeper << >> Tj ET",
      "BT <48656 Tj ET",
      "BT " + "(".*(500) + "x" + ")".*(500) + " Tj ET",
      "[ (a) -12 <4142> /Name << /k [1 2 3] >> ] TJ")
    payloads.foreach { p =>
      val body = s"%PDF-1.4\n1 0 obj <</Type/Catalog/Pages 2 0 R>> endobj\n" +
        "2 0 obj <</Type/Pages/Kids[3 0 R]/Count 1>> endobj\n" +
        "3 0 obj <</Type/Page/Contents 4 0 R>> endobj\n" +
        s"4 0 obj <</Length ${p.length}>>\nstream\n$p\nendstream\nendobj\n"
      Parsers.parseOrNone("pdf", body.getBytes("ISO-8859-1")) // no hang/throw
    }
  }

  test("zip bombs of nested empty entries don't blow up OOXML readers") {
    val bos = new java.io.ByteArrayOutputStream()
    val z = new java.util.zip.ZipOutputStream(bos)
    for (i <- 1 to 200) {
      z.putNextEntry(new java.util.zip.ZipEntry(s"word/part$i.xml"))
      z.write("<x/>".getBytes)
      z.closeEntry()
    }
    z.close()
    assert(Parsers.parseOrNone("docx", bos.toByteArray).isEmpty) // no document.xml
    assert(Parsers.parseOrNone("xlsx", bos.toByteArray).isEmpty) // no workbook
  }

  test("malformed XML inside a valid zip fails cleanly") {
    def zipWith(name: String, content: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val z = new java.util.zip.ZipOutputStream(bos)
      z.putNextEntry(new java.util.zip.ZipEntry(name))
      z.write(content.getBytes)
      z.closeEntry(); z.close()
      bos.toByteArray
    }
    assert(Parsers.parseOrNone("docx",
      zipWith("word/document.xml", "<w:document><unclosed")).isEmpty)
    // entity-expansion attempt must not be processed (DTD disabled)
    assert(Parsers.parseOrNone("docx",
      zipWith("word/document.xml",
        """<!DOCTYPE x [<!ENTITY a "bbbb">]><w:document><w:body>
          |<w:p><w:r><w:t>&a;</w:t></w:r></w:p></w:body></w:document>""".stripMargin)).isEmpty)
  }
}

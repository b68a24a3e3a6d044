package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.Files
import java.util.zip.GZIPOutputStream

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** WARC fixtures are hand-built from the ISO 28500 record grammar (version
  * line, headers, Content-Length framing) — same spec-anchored approach as
  * the MP3/MP4/PDF fixtures in BinaryParsersSpec.
  */
class WarcSpec extends AnyFunSuite {

  private def record(
      warcType: String, uri: String, contentType: String,
      payload: Array[Byte], date: String = "2024-01-15T10:00:00Z"): Array[Byte] = {
    val h = new StringBuilder
    h.append("WARC/1.0\r\n")
    h.append(s"WARC-Type: $warcType\r\n")
    if (uri.nonEmpty) h.append(s"WARC-Target-URI: $uri\r\n")
    h.append(s"WARC-Date: $date\r\n")
    h.append(s"WARC-Record-ID: <urn:uuid:0000-$warcType>\r\n")
    h.append(s"Content-Type: $contentType\r\n")
    h.append(s"Content-Length: ${payload.length}\r\n")
    h.append("\r\n")
    h.toString.getBytes(UTF_8) ++ payload ++ "\r\n\r\n".getBytes(UTF_8)
  }

  private def httpResponse(contentType: String, body: Array[Byte]): Array[Byte] =
    (s"HTTP/1.1 200 OK\r\nContent-Type: $contentType\r\nServer: x\r\n\r\n").getBytes(UTF_8) ++ body

  private val htmlBody =
    "<html><head><title>T</title><style>p{}</style></head><body><p>Hello <b>Warc</b> world</p></body></html>"
      .getBytes(UTF_8)

  private def fixture: Array[Byte] =
    record("warcinfo", "", "application/warc-fields",
      "software: test\r\n".getBytes(UTF_8)) ++
      record("request", "http://example.com/a", "application/http; msgtype=request",
        "GET /a HTTP/1.1\r\nHost: example.com\r\n\r\n".getBytes(UTF_8)) ++
      record("response", "http://example.com/a", "application/http; msgtype=response",
        httpResponse("text/html; charset=utf-8", htmlBody)) ++
      record("response", "http://example.com/plain", "application/http; msgtype=response",
        httpResponse("text/plain", "  just plain text  ".getBytes(UTF_8))) ++
      record("response", "http://example.com/img", "application/http; msgtype=response",
        httpResponse("image/png", Array[Byte](1, 2, 3))) ++
      record("conversion", "http://example.com/conv", "text/plain",
        "pre-extracted text".getBytes(UTF_8))

  private def gzipMembers(records: Seq[Array[Byte]]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    records.foreach { r =>
      val gz = new GZIPOutputStream(out)
      gz.write(r)
      gz.finish()
    }
    out.toByteArray
  }

  test("record walk: all six records parse with framed payloads") {
    val rs = WarcExtract.records(fixture)
    assert(rs.length == 6)
    assert(rs.map(_.warcType) ==
      Vector("warcinfo", "request", "response", "response", "response", "conversion"))
    assert(rs(2).targetUri == "http://example.com/a")
    assert(rs(2).date == "2024-01-15T10:00:00Z")
    assert(new String(rs(5).payload, UTF_8) == "pre-extracted text")
  }

  test("text extraction: HTML stripped, plain trimmed, binary/request/warcinfo skipped") {
    val docs = WarcExtract.documents(fixture)
    assert(docs.length == 3)
    assert(docs(0).target_uri == "http://example.com/a")
    assert(docs(0).text == "T Hello Warc world")
    assert(docs(1).text == "just plain text")
    assert(docs(2).text == "pre-extracted text")
  }

  test("per-record gzip members (Common Crawl layout) inflate transparently") {
    val gz = gzipMembers(Seq(
      record("response", "http://example.com/a", "application/http; msgtype=response",
        httpResponse("text/html", htmlBody)),
      record("conversion", "http://example.com/conv", "text/plain",
        "second member".getBytes(UTF_8))))
    val docs = WarcExtract.documents(gz)
    assert(docs.map(_.text) == Vector("T Hello Warc world", "second member"))
  }

  test("LF-only HTTP header separator is tolerated") {
    val payload = "HTTP/1.1 200 OK\nContent-Type: text/plain\n\nbody here".getBytes(UTF_8)
    val doc = WarcExtract.documents(
      record("response", "http://e.com", "application/http; msgtype=response", payload))
    assert(doc.head.text == "body here")
  }

  test("header folding continuation lines are joined") {
    val raw =
      ("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: http://e.com/x\r\n" +
        "Content-Type: text/plain;\r\n charset=utf-8\r\nContent-Length: 2\r\n\r\nhi\r\n\r\n")
        .getBytes(UTF_8)
    val rs = WarcExtract.records(raw)
    assert(rs.head.contentType == "text/plain; charset=utf-8")
    assert(WarcExtract.documents(raw).head.text == "hi")
  }

  test("corrupt archives throw IllegalArgumentException, never anything else") {
    val cases = Seq[Array[Byte]](
      "NOTWARC/1.0\r\nContent-Length: 0\r\n\r\n".getBytes(UTF_8),
      "WARC/1.0\r\nWARC-Type: response\r\n\r\n".getBytes(UTF_8), // no length
      "WARC/1.0\r\nContent-Length: 999\r\n\r\nshort".getBytes(UTF_8), // truncated
      "WARC/1.0\r\nContent-Length: -5\r\n\r\n".getBytes(UTF_8),
      "WARC/1.0\r\nContent-Length: abc\r\n\r\n".getBytes(UTF_8),
      "WARC/1.0\r\nno-colon-header\r\nContent-Length: 0\r\n\r\n".getBytes(UTF_8),
      Array[Byte](0x1F, 0x8B.toByte, 1, 2, 3, 4)) // corrupt gzip
    cases.foreach { c =>
      intercept[IllegalArgumentException](WarcExtract.records(c))
    }
  }

  test("corrupt SECOND gzip member throws instead of silently truncating") {
    // GZIPInputStream treats a damaged later member header as EOF — the
    // strict member walker must refuse the whole archive loudly instead
    // of yielding a partial doc set with error = null
    val m1 = {
      val out = new ByteArrayOutputStream()
      val gz = new GZIPOutputStream(out)
      gz.write(record("conversion", "http://a.com", "text/plain", "first".getBytes(UTF_8)))
      gz.finish()
      out.toByteArray
    }
    val m2 = {
      val out = new ByteArrayOutputStream()
      val gz = new GZIPOutputStream(out)
      gz.write(record("conversion", "http://b.com", "text/plain", "second".getBytes(UTF_8)))
      gz.finish()
      out.toByteArray
    }
    // sanity: intact two-member archive yields both docs
    assert(WarcExtract.documents(m1 ++ m2).map(_.text) == Vector("first", "second"))
    // corrupt the second member's header magic
    val badHeader = m2.clone(); badHeader(1) = 0x77
    intercept[IllegalArgumentException](WarcExtract.documents(m1 ++ badHeader))
    // corrupt the second member's deflate body
    val badBody = m2.clone(); badBody(14) = (badBody(14) ^ 0x5A).toByte
    intercept[IllegalArgumentException](WarcExtract.documents(m1 ++ badBody))
    // corrupt the second member's CRC trailer
    val badCrc = m2.clone(); badCrc(m2.length - 6) = (badCrc(m2.length - 6) ^ 1).toByte
    intercept[IllegalArgumentException](WarcExtract.documents(m1 ++ badCrc))
    // trailing garbage after the last member
    intercept[IllegalArgumentException](
      WarcExtract.documents(m1 ++ m2 ++ Array[Byte](9, 9, 9)))
  }

  test("mutation fuzz: 20k corruptions only ever raise IllegalArgumentException") {
    val base = fixture
    val rnd = new scala.util.Random(42)
    (0 until 20000).foreach { _ =>
      val m = base.clone()
      val flips = 1 + rnd.nextInt(4)
      (0 until flips).foreach { _ =>
        m(rnd.nextInt(m.length)) = rnd.nextInt(256).toByte
      }
      try { WarcExtract.documents(m); () }
      catch { case _: IllegalArgumentException => () }
    }
  }

  test("warc docs flow into the curation pipeline end-to-end") {
    val spark = SparkTestBase.spark
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("warc-curate").toFile
    try {
      // two near-identical pages (near-dup), one unique, one degenerate spam
      val page = (1 to 12).map(i => s"<p>Sentence number $i of real content here.</p>").mkString
      val spamText = Array.fill(30)("buy cheap deals now online").mkString(" ")
      Files.write(new java.io.File(dir, "crawl.warc").toPath,
        record("response", "http://a.com/1", "application/http; msgtype=response",
          httpResponse("text/html", page.getBytes(UTF_8))) ++
          record("response", "http://b.com/copy", "application/http; msgtype=response",
            httpResponse("text/html", (page + "<p>tail</p>").getBytes(UTF_8))) ++
          record("conversion", "http://c.com/unique", "text/plain",
            "a genuinely different document about completely other matters".getBytes(UTF_8)) ++
          record("conversion", "http://d.com/spam", "text/plain", spamText.getBytes(UTF_8)))

      val docs = Ingest.readWarcDir(spark, dir.getAbsolutePath)
        .filter(col("error").isNull)
        .withColumn("doc_id", abs(xxhash64(col("target_uri"))))
      val out = graft.operators.Curate.run(
        docs, "doc_id", "text", "target_uri",
        cfg = graft.operators.Curate.Config(
          nearDupMinJaccard = Some(0.5),
          repetitionMaxDup5gram = Some(0.5)))
        .select("target_uri").collect().map(_.getString(0)).toSet
      // spam dropped by the repetition stage, the copy by near-dup dedup
      assert(out.contains("http://c.com/unique"))
      assert(!out.contains("http://d.com/spam"))
      assert((out & Set("http://a.com/1", "http://b.com/copy")).size == 1)
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("readWarcDir: Spark scan explodes docs and surfaces file errors") {
    val spark = SparkTestBase.spark
    val dir = Files.createTempDirectory("warc-spec").toFile
    try {
      Files.write(new java.io.File(dir, "good.warc").toPath, fixture)
      Files.write(new java.io.File(dir, "crawl.warc.gz").toPath,
        gzipMembers(Seq(record("conversion", "http://g.com", "text/plain",
          "gz doc".getBytes(UTF_8)))))
      Files.write(new java.io.File(dir, "bad.warc").toPath,
        "WARC/1.0\r\nContent-Length: 999\r\n\r\nx".getBytes(UTF_8))
      Files.write(new java.io.File(dir, "ignored.txt").toPath, "not a warc".getBytes(UTF_8))
      // parses fine but carries no text-bearing record: must emit NO row
      // (a phantom null-text row would masquerade as a document)
      Files.write(new java.io.File(dir, "empty.warc").toPath,
        record("response", "http://img.only", "application/http; msgtype=response",
          httpResponse("image/png", Array[Byte](9, 8, 7))))

      val rows = Ingest.readWarcDir(spark, dir.getAbsolutePath)
        .collect().map(r => (r.getAs[String]("path"), r.getAs[String]("target_uri"),
          r.getAs[String]("text"), r.getAs[String]("error")))

      val good = rows.filter(_._1.endsWith("good.warc"))
      assert(good.length == 3 && good.forall(_._4 == null))
      assert(good.map(_._3).toSet ==
        Set("T Hello Warc world", "just plain text", "pre-extracted text"))
      val gz = rows.filter(_._1.endsWith("crawl.warc.gz"))
      assert(gz.map(_._3).toSeq == Seq("gz doc"))
      val bad = rows.filter(_._1.endsWith("bad.warc"))
      assert(bad.length == 1 && bad.head._3 == null && bad.head._4 != null)
      assert(!rows.exists(_._1.endsWith("ignored.txt")))
      assert(!rows.exists(_._1.endsWith("empty.warc")))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }
}

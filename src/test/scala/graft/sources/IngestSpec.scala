package graft.sources

import java.nio.file.Files
import java.nio.charset.StandardCharsets

import graft.SparkTestBase
import graft.functions.Uuid5
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Batch ingest pipeline over a seeder-style fixture directory
  * (FIXTURES.md §1): filters (F1-F3), parser dispatch (S3), chunk explode,
  * idempotent ids, metadata contract.
  */
class IngestSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-ingest")
    def write(name: String, content: String): Unit =
      Files.write(d.resolve(name), content.getBytes(StandardCharsets.UTF_8))
    write("project_alpha.md", "Project Alpha confidential report. " + ("Body sentence. " * 100))
    write("beta_analysis.txt", "Beta analysis quarterly results. Revenue up.")
    write("page.html",
      "<html><head><style>p{color:red}</style><script>var x=1;</script></head>" +
        "<body><p>Gamma protocol &amp; implementation guide.</p></body></html>")
    write("mail.eml",
      "From: alice@example.com\nDate: Mon, 1 Jan 2024 00:00:00 +0000\n" +
        "Subject: Delta research findings\n\nSummary of compression algorithms.")
    write("~$temp.txt", "should be filtered") // F1
    write("._hidden.txt", "should be filtered") // F1
    write("junk.tmp", "should be filtered") // F1
    write("empty.txt", "") // F3
    write("image.unsupported", "binary-ish") // F2
    d.toString
  }

  test("filters drop temp/unsupported/empty files") {
    val files = Ingest.applyFilters(Ingest.readDir(spark, dir))
    val names = files.select("filename").collect().map(_.getString(0)).toSet
    assert(names == Set("project_alpha.md", "beta_analysis.txt", "page.html", "mail.eml"))
  }

  test("html parser strips script/style/tags and decodes entities") {
    val text = Parsers.HtmlParser.parse(
      Files.readAllBytes(java.nio.file.Paths.get(dir, "page.html")))
    assert(text == "Gamma protocol & implementation guide.")
  }

  test("html parser does not double-decode escaped entities") {
    val text = Parsers.HtmlParser.parse(
      "<p>use &amp;lt;br&amp;gt; here, a &amp; b</p>".getBytes)
    assert(text == "use &lt;br&gt; here, a & b")
  }

  test("eml parser handles CRLF line endings (RFC 5322)") {
    val text = Parsers.EmlParser.parse(
      "From: bob@example.com\r\nSubject: CRLF mail\r\n\r\nThe actual body.".getBytes)
    assert(text.contains("Subject: CRLF mail"))
    assert(text.endsWith("The actual body."))
  }

  test("eml parser emits Subject/Sender/Date headers + body") {
    val text = Parsers.EmlParser.parse(
      Files.readAllBytes(java.nio.file.Paths.get(dir, "mail.eml")))
    assert(text.startsWith("Subject: Delta research findings\nSender: alice@example.com\nDate: Mon, 1 Jan 2024"))
    assert(text.endsWith("Summary of compression algorithms."))
  }

  test("unparseable binary inputs fail loudly, dispatcher drops them gracefully") {
    intercept[IllegalArgumentException](Parsers.PdfParser.parse(Array[Byte](1)))
    assert(Parsers.parseOrNone("pdf", Array[Byte](1)).isEmpty)
    // legacy binary .xls is not OOXML — still rejected, not misparsed
    assert(Parsers.parseOrNone("xls", Array[Byte](0xd0.toByte, 0xcf.toByte)).isEmpty)
    assert(Parsers.forExtension("nope").isEmpty)
  }

  test("full pipeline: chunks, idempotent uuid5 ids, metadata contract") {
    val chunks = Ingest.ingestDir(spark, dir, organizationId = "org1",
      chunkSize = 200, overlap = 40, dim = 32).cache()
    val rows = chunks.collect()
    assert(rows.nonEmpty)
    // multi-chunk doc present (alpha ~1500 chars / 200)
    val alpha = rows.filter(_.getAs[Map[String, String]]("metadata")("filename") == "project_alpha.md")
    assert(alpha.length > 1)
    // id = uuid5(path-chunk_index), reproducible
    rows.foreach { r =>
      val meta = r.getAs[Map[String, String]]("metadata")
      assert(r.getAs[String]("id") ==
        Uuid5.chunkId(meta("path"), r.getAs[Int]("chunk_index")))
      assert(meta("total_chunks").toInt > 0)
      assert(r.getAs[String]("organization_id") == "org1")
      assert(r.getAs[scala.collection.Seq[Float]]("vector").length == 32)
    }
    // re-ingest produces identical ids (idempotency key)
    val again = Ingest.ingestDir(spark, dir, organizationId = "org1",
      chunkSize = 200, overlap = 40, dim = 32)
    val ids1 = rows.map(_.getAs[String]("id")).toSet
    val ids2 = again.collect().map(_.getAs[String]("id")).toSet
    assert(ids1 == ids2)
    assert(Ingest.idempotent(chunks.union(chunks)).count() == rows.length)
  }

  test("ingest output conforms to the typed Chunk schema") {
    import spark.implicits._
    val ds = Ingest.ingestDir(spark, dir, organizationId = "org1",
      chunkSize = 200, overlap = 40, dim = 8).as[graft.model.Chunk]
    val first = ds.head()
    assert(first.vector.length == 8)
    assert(first.organization_id == "org1")
    assert(first.metadata.contains("filename"))
  }

  test("file catalog decides new/update/skip") {
    import spark.implicits._
    val files = Seq(
      ("/a.txt", "h1"), ("/b.txt", "h2x"), ("/c.txt", "h3")).toDF("path", "file_hash")
    val catalog = Seq(
      ("/b.txt", "h2", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "ingested"),
      ("/c.txt", "h3", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "ingested"))
      .toDF("file_path", "file_hash", "last_processed", "server_status")
    val decided = FileCatalog.decide(files, catalog)
    val m = decided.collect().map(r => r.getAs[String]("path") -> r.getAs[String]("ingest_type")).toMap
    assert(m == Map("/a.txt" -> "new", "/b.txt" -> "update", "/c.txt" -> "skip"))
    assert(FileCatalog.toProcess(decided).count() == 2)
    val updated = FileCatalog.updatedCatalog(catalog,
      FileCatalog.toProcess(decided))
    assert(updated.count() == 3)
    val hashes = updated.collect().map(r =>
      r.getAs[String]("file_path") -> r.getAs[String]("file_hash")).toMap
    assert(hashes("/b.txt") == "h2x") // upserted
    assert(hashes("/c.txt") == "h3") // untouched
  }
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** The pure-SQL surface: after Graft.init, everything runs via spark.sql. */
class SqlSurfaceSpec extends AnyFunSuite {
  private lazy val spark = {
    val s = SparkTestBase.spark
    Graft.init(s, "/root/testdata/sf0.001")
  }

  test("custom codegen expression is callable from SQL") {
    val r = spark.sql("""
      SELECT vec_id,
             cosine_similarity(embedding, (SELECT embedding FROM embeddings WHERE vec_id = 0)) AS score
      FROM embeddings WHERE vec_id <> 0
      ORDER BY score DESC, vec_id LIMIT 3""").collect()
    assert(r.length == 3)
    assert(r.forall(x => math.abs(x.getAs[Double]("score")) <= 1.0))
    val dot = spark.sql(
      "SELECT dot_product(array(CAST(1.0 AS FLOAT), CAST(2.0 AS FLOAT)), array(CAST(3.0 AS FLOAT), CAST(4.0 AS FLOAT))) AS d")
      .collect().head.getDouble(0)
    assert(dot == 11.0)
    // plain double-literal arrays (the natural SQL spelling) are coerced,
    // not misread on 4-byte strides
    val unit = spark.sql(
      "SELECT cosine_similarity(array(0.6, 0.8), array(0.6, 0.8)) AS s")
      .collect().head.getDouble(0)
    assert(math.abs(unit - 1.0) < 1e-6)
    val dotD = spark.sql("SELECT dot_product(array(1.0, 2.0), array(3.0, 4.0)) AS d")
      .collect().head.getDouble(0)
    assert(dotD == 11.0)
  }

  test("dimension mismatch fails loudly, not with a truncated score") {
    val e = intercept[Exception] {
      spark.sql("SELECT cosine_similarity(array(1.0, 2.0), array(1.0, 2.0, 3.0))")
        .collect()
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Seq.empty else t +: causes(t.getCause)
    assert(causes(e).exists(_.getMessage != null) &&
      causes(e).exists(c => Option(c.getMessage).exists(_.contains("dimension mismatch"))))
  }

  test("chunking + uuid5 + embedding pipeline in pure SQL") {
    val rows = spark.sql("""
      SELECT doc_id, p.chunk_index, p.content,
             uuid5(concat(doc_id, '-', p.chunk_index)) AS chunk_id,
             mock_embed(p.content, 32) AS vector
      FROM documents
      LATERAL VIEW explode(chunk_text(text, 120, 30)) t AS p
      WHERE doc_id < 5
      ORDER BY doc_id, p.chunk_index""").collect()
    assert(rows.nonEmpty)
    assert(rows.forall(_.getAs[scala.collection.Seq[Float]]("vector").length == 32))
    assert(rows.forall(_.getAs[String]("chunk_id").length == 36))
  }

  test("dedup + text analysis functions in pure SQL") {
    val r = spark.sql("""
      SELECT lang_id(text) AS lang_pred,
             hamming(simhash(split(text, ' ')), 0L) AS bits,
             size(minhash_signature(text, 3)) AS sig_len,
             rolling_fingerprint(text) AS fp
      FROM documents LIMIT 5""").collect()
    assert(r.length == 5)
    assert(r.forall(_.getAs[Int]("sig_len") == 64))
  }

  test("repetition stats + full canonicalization in pure SQL") {
    // E2808B = zero-width space BETWEEN base and combining mark (CC81):
    // the full pipeline must strip it first so the mark still composes
    val r = spark.sql("""
      SELECT repetition_stats('a b\na b\nc d').dupLineFrac AS dlf,
             canonicalize_text(concat('cafe', decode(unhex('CC81'), 'UTF-8'))) AS nfc,
             canonicalize_text(concat('cafe', decode(unhex('E2808BCC81'), 'UTF-8'))) AS zw""").collect().head
    assert(math.abs(r.getAs[Double]("dlf") - 1.0 / 3) < 1e-9)
    assert(r.getAs[String]("nfc") == "caf\u00E9")
    assert(r.getAs[String]("zw") == "caf\u00E9")
  }

  test("binary parsing + media decode are callable from pure SQL") {
    import spark.implicits._
    val html = "<p>Pure <b>SQL</b> ingest &amp; parse</p>".getBytes("UTF-8")
    Seq(("a.html", "html", html), ("junk.pdf", "pdf", Array[Byte](1, 2, 3)))
      .toDF("name", "ext", "content").createOrReplaceTempView("raw_files")
    val parsed = spark.sql("""
      SELECT name, parse_document(ext, content) AS text FROM raw_files
      ORDER BY name""").collect()
    assert(parsed(0).getAs[String]("text") == "Pure SQL ingest & parse")
    assert(parsed(1).getAs[String]("text") == null) // unparseable → NULL, no crash
    val feat = spark.sql(
      "SELECT media_features(content, 16) AS f FROM raw_files WHERE name = 'a.html'")
      .collect().head.getAs[scala.collection.Seq[Float]]("f")
    assert(feat.length == 16) // non-media bytes → deterministic stub features
  }

  test("general SQL over registered views (reference-style analytics)") {
    val r = spark.sql("""
      SELECT event_type, COUNT(*) AS n
      FROM events
      WHERE user_id = 7
      GROUP BY event_type ORDER BY event_type""").collect()
    assert(r.nonEmpty)
  }

  test("l2_squared, sorted_intersect_count, registered_domain, perceptual_hashes from SQL") {
    val l2 = spark.sql(
      "SELECT l2_squared(array(1.0, 2.0), array(4.0, 6.0)) AS d")
      .collect().head.getDouble(0)
    assert(l2 == 25.0)
    val n = spark.sql(
      "SELECT sorted_intersect_count(array(1L, 3L, 5L), array(3L, 4L, 5L)) AS n")
      .collect().head.getLong(0)
    assert(n == 2L)
    val rd = spark.sql(
      "SELECT registered_domain('a.b.example.co.uk') AS d").collect().head.getString(0)
    assert(rd == "example.co.uk")
    // a real PNG via the engine's own encoder-side fixture path is overkill
    // here; undecodable bytes must yield NULL, not throw
    val ph = spark.sql(
      "SELECT perceptual_hashes(CAST('nonsense' AS BINARY)) AS h").collect().head
    assert(ph.isNullAt(0))
  }
}

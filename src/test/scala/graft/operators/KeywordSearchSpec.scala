package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BM25 ranking semantics + reciprocal rank fusion. */
class KeywordSearchSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def corpus = {
    import spark.implicits._
    Seq(
      (1L, "spark window merge spark window merge"), // all terms, repeated
      (2L, "spark window merge"), // all terms once
      (3L, "spark spark spark spark spark spark spark spark"), // one term, high tf
      (4L, "filler filler filler filler filler filler"), // no terms
      (5L, "window and some other words entirely unrelated")) // one term
      .toDF("doc_id", "text")
  }

  test("bm25 ranks docs with more matching terms first; non-matching absent") {
    val res = KeywordSearch.bm25(corpus, "doc_id", "text",
      Seq("spark", "window", "merge"), k = 10).collect()
    val ids = res.map(_.getAs[Long]("doc_id"))
    assert(!ids.contains(4L)) // zero matching terms → no score at all
    assert(ids.take(2).toSet == Set(1L, 2L)) // all three terms beat single-term docs
    // scores strictly ordered, ties impossible here
    val scores = res.map(_.getAs[Double]("score"))
    assert(scores.sameElements(scores.sorted.reverse))
  }

  test("bm25 term-frequency saturation: tf grows score sublinearly") {
    import spark.implicits._
    val docs = Seq(
      (1L, "t x x x x x x x"),
      (2L, "t t x x x x x x"),
      (3L, "t t t t t t x x")).toDF("doc_id", "text")
    val res = KeywordSearch.bm25(docs, "doc_id", "text", Seq("t"), k = 3)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("score")).toMap
    assert(res(3L) > res(2L) && res(2L) > res(1L))
    // saturation: going 1→2 occurrences gains more than 2→6
    assert(res(2L) - res(1L) > (res(3L) - res(2L)) / 4)
  }

  test("bm25 with precomputed lens table is identical to the inline scan") {
    val lens = KeywordSearch.docLengths(corpus, "doc_id", "text")
    val inline = KeywordSearch.bm25(corpus, "doc_id", "text",
      Seq("spark", "window", "merge"), k = 10).collect().toSeq
    val precomputed = KeywordSearch.bm25(corpus, "doc_id", "text",
      Seq("spark", "window", "merge"), k = 10, lens = Some(lens)).collect().toSeq
    assert(inline == precomputed)
    // lens persisted through parquet (the at-scale shape) round-trips too
    val tmp = java.nio.file.Files.createTempDirectory("lens").toString
    lens.write.mode("overwrite").parquet(tmp)
    val fromDisk = KeywordSearch.bm25(corpus, "doc_id", "text",
      Seq("spark", "window", "merge"), k = 10,
      lens = Some(spark.read.parquet(tmp))).collect().toSeq
    assert(inline == fromDisk)
  }

  test("bm25 guards: empty query throws; null-text docs excluded from stats") {
    import spark.implicits._
    intercept[IllegalArgumentException](
      KeywordSearch.bm25(corpus, "doc_id", "text", Seq.empty))
    val withNull = Seq((1L, "spark spark"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val res = KeywordSearch.bm25(withNull, "doc_id", "text", Seq("spark"), k = 5)
      .collect()
    assert(res.map(_.getAs[Long]("doc_id")).toSeq == Seq(1L))
    // idf from n_docs=1 (null-text doc not counted): ln((1-1+0.5)/(1+0.5)+1)
    val idf = math.log(0.5 / 1.5 + 1.0)
    val expected = math.rint(idf * (2 * 2.2) / (2 + 1.2 * (1 - 0.75 + 0.75 * 1.0)) * 1e6) / 1e6
    assert(math.abs(res.head.getAs[Double]("score") - expected) < 1e-9)
  }

  test("reciprocal rank fusion: appearing in both rankings beats one") {
    import spark.implicits._
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("doc_id", "rn")
    val b = Seq((20L, 1), (40L, 2)).toDF("doc_id", "rn")
    val fused = KeywordSearch.reciprocalRankFusion(Seq(a, b), k = 10)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Double]("rrf_score"))
    assert(fused.head._1 == 20L) // rank 2 + rank 1 beats any single ranking
    val m = fused.toMap
    assert(m(20L) == math.rint((1.0 / 62 + 1.0 / 61) * 1e6) / 1e6)
    assert(m(10L) == math.rint((1.0 / 61) * 1e6) / 1e6)
  }

  test("hybrid retrieval surfaces exact-identifier matches semantic search misses") {
    import spark.implicits._
    val query = "ERR4492 handshake failure"
    val chunks = Seq(
      ("c1", "docA", "ERR4492 handshake failure"), // exact → both rankings
      ("c2", "docB", "the gateway rejected the tls negotiation yesterday evening"),
      ("c3", "docC", "error code ERR4492 appeared in the proxy logbook"), // lexical-only
      ("c4", "docD", "quarterly budget and staffing review notes"),
      ("c5", "docE", "handshake retries exceeded during maintenance"))
      .toDF("id", "document_id", "content")
      .withColumn("vector", graft.functions.GraftFunctions.mockEmbed(col("content"), 32))
      .withColumn("organization_id", lit("org1"))
    val hybrid = Rag.retrieveHybrid(chunks, query, k = 3,
      organizationId = Some("org1"), dim = 32).collect()
    assert(hybrid.head.getAs[String]("id") == "c1") // exact match tops fusion
    // c3 has no semantic similarity to the query text but carries the exact
    // rare identifier — lexical ranking must pull it into the fused top-3
    assert(hybrid.map(_.getAs[String]("id")).contains("c3"))
    assert(hybrid.forall(_.getAs[String]("document_id").nonEmpty))
  }

  test("ranked attaches contiguous 1-based ranks with deterministic ties") {
    import spark.implicits._
    val top = Seq((5L, 1.0), (2L, 2.0), (9L, 1.0)).toDF("doc_id", "score")
    val r = KeywordSearch.ranked(top, "score").collect()
      .map(x => x.getAs[Long]("doc_id") -> x.getAs[Int]("rn")).toMap
    assert(r == Map(2L -> 1, 5L -> 2, 9L -> 3)) // tie on 1.0 → doc_id asc
  }

  test("tfidf keywords: rare terms beat common, corpus-wide terms score zero") {
    import spark.implicits._
    // "shared" appears in all 3 docs -> idf = ln(1) = 0; "rare" only in doc 1
    val docs = Seq(
      (1L, "shared rare rare common"),
      (2L, "shared common common"),
      (3L, "shared other")).toDF("doc_id", "text")
    val out = KeywordSearch.tfidfTopKeywords(docs, "doc_id", "text", k = 2)
      .collect()
      .map(r => (r.getLong(0), r.getInt(4)) -> (r.getString(1), r.getDouble(3)))
      .toMap
    // doc 1: rare tf=2 idf=ln(3) -> top; common tf=1 idf=ln(3/2) second
    assert(out((1L, 1))._1 == "rare")
    assert(math.abs(out((1L, 1))._2 - 2 * math.log(3.0)) < 1e-6)
    assert(out((1L, 2))._1 == "common")
    // doc 3: "other" (unique) beats "shared" (idf 0)
    assert(out((3L, 1))._1 == "other")
    assert(out((3L, 2)) == ("shared", 0.0))
  }

  test("postings: lowercased terms with 0-based positions, empty docs drop out") {
    import spark.implicits._
    val docs = Seq((1L, "Alpha beta  ALPHA"), (2L, ""), (3L, "   ")).toDF("doc_id", "text")
    val p = KeywordSearch.postings(docs, "doc_id", "text")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getInt(2))).toSet
    assert(p === Set(("alpha", 1L, 0), ("beta", 1L, 1), ("alpha", 1L, 2)))
  }

  test("phraseCount: consecutive positions only, overlaps count, order matters") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the quick fox saw the quick fox"), // phrase twice
      (2L, "quick the fox"),                   // right words, wrong order
      (3L, "the slow quick fox"),              // not consecutive
      (4L, "a a a")                            // overlapping "a a" twice
    ).toDF("doc_id", "text")
    val posts = KeywordSearch.postings(docs, "doc_id", "text")
    def counts(phrase: Seq[String]) =
      KeywordSearch.phraseCount(posts, phrase)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts(Seq("the", "quick")) === Map(1L -> 2L))
    assert(counts(Seq("the", "quick", "fox")) === Map(1L -> 2L))
    assert(counts(Seq("a", "a")) === Map(4L -> 2L))
    assert(counts(Seq("fox", "saw", "the")) === Map(1L -> 1L))
    assert(counts(Seq("missing", "term")).isEmpty)
  }

  test("phraseCount: a single-term phrase is plain term frequency") {
    import spark.implicits._
    val docs = Seq((1L, "a b a"), (2L, "b b")).toDF("doc_id", "text")
    val posts = KeywordSearch.postings(docs, "doc_id", "text")
    val got = KeywordSearch.phraseCount(posts, Seq("a"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got === Map(1L -> 2L))
  }

  test("phraseCount is partition-invariant") {
    import spark.implicits._
    val docs = (0L until 50L)
      .map(i => (i, s"w${i % 3} w${(i + 1) % 3} w${i % 3} w${(i + 1) % 3}"))
      .toDF("doc_id", "text")
    def run(parts: Int) = KeywordSearch.phraseCount(
      KeywordSearch.postings(docs.repartition(parts), "doc_id", "text"),
      Seq("w0", "w1"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(run(1) === run(13) && run(1).nonEmpty)
  }
}

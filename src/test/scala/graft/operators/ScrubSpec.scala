package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PII detection/redaction + benchmark decontamination behavior on real
  * pattern fixtures (the oracle gate runs them over the synthetic corpus;
  * these prove the patterns actually catch PII).
  */
class ScrubSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("pii counts and redaction over real pattern fixtures") {
    import spark.implicits._
    val df = Seq(
      (1L, "contact alice.smith+dev@example.co.uk or bob@test.io today"),
      (2L, "server 192.168.1.100 responded; backup at 10.0.0.1"),
      (3L, "ssn 123-45-6789 leaked with phone 555-867-5309"),
      (4L, "clean text with numbers 12345 and a date 2024-01-01"))
      .toDF("doc_id", "text")
    val r = Scrub.withPiiCounts(df, "text")
      .withColumn("red", Scrub.redact(col("text")))
      .collect().map(x => x.getAs[Long]("doc_id") -> x).toMap
    assert(r(1L).getAs[Int]("n_email") == 2)
    assert(r(2L).getAs[Int]("n_ipv4") == 2)
    assert(r(3L).getAs[Int]("n_ssn") == 1)
    assert(r(3L).getAs[Int]("n_phone") == 1)
    assert(r(4L).getAs[Int]("n_email") + r(4L).getAs[Int]("n_ipv4") +
      r(4L).getAs[Int]("n_ssn") + r(4L).getAs[Int]("n_phone") == 0)
    assert(r(1L).getAs[String]("red") == "contact <EMAIL> or <EMAIL> today")
    assert(r(2L).getAs[String]("red") == "server <IPV4> responded; backup at <IPV4>")
    assert(r(3L).getAs[String]("red") == "ssn <SSN> leaked with phone <PHONE>")
    assert(r(4L).getAs[String]("red") == r(4L).getAs[String]("text")) // untouched
  }

  test("decontamination flags only docs sharing a full benchmark 8-gram") {
    import spark.implicits._
    val bench = Seq(
      (1L, "what is the capital of france paris is the answer here"))
      .toDF("doc_id", "text")
    val corpus = Seq(
      (10L, "prefix words what is the capital of france paris is copied"), // shares 8-grams
      (11L, "what is the capital of germany berlin is the answer"), // no shared 8-gram
      (12L, "totally unrelated content about spark shuffles and joins"))
      .toDF("doc_id", "text")
    val flagged = Decontaminate.sharedNgrams(corpus, bench, "doc_id", "text", n = 8)
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_shared_grams")).toMap
    assert(flagged.keySet == Set(10L))
    assert(flagged(10L) >= 1L)
  }

  test("short docs (< n tokens) produce no grams and never flag") {
    import spark.implicits._
    val bench = Seq((1L, "a b c d e f g h")).toDF("doc_id", "text")
    val corpus = Seq((10L, "a b c")).toDF("doc_id", "text")
    assert(Decontaminate.sharedNgrams(corpus, bench, "doc_id", "text", 8).count() == 0)
  }

  test("bloom-prefiltered decontamination equals the exact path, even at fpp 0.5") {
    import spark.implicits._
    val bench = (1L to 20L).map(i =>
      (i, s"benchmark question number $i asks about topic $i in exactly eight words yes"))
      .toDF("doc_id", "text")
    val corpus = ((1L to 20L).map(i =>
      (100L + i, s"a doc copying benchmark question number $i asks about topic $i in exactly eight words yes indeed")) ++
      (200L to 260L).map(i => (i, s"clean document $i with its own words token$i filler$i etc$i and more padding here")))
      .toDF("doc_id", "text")
    def toMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_shared_grams")).toMap
    val exact = toMap(Decontaminate.sharedNgrams(corpus, bench, "doc_id", "text", 8))
    assert(exact.size == 20) // every copier flagged, no clean doc flagged
    // a deliberately terrible filter (fpp 0.5) floods the pre-filter with
    // false positives; the exact verification join must kill every one
    for (fpp <- Seq(0.01, 0.5)) {
      val bloom = toMap(Decontaminate.sharedNgramsBloom(
        corpus, bench, "doc_id", "text", 8, minShared = 1, fpp = fpp))
      assert(bloom == exact, s"fpp=$fpp diverged")
    }
  }

  test("repeatedSpans discovers the droplist sharedNgrams then enforces") {
    import spark.implicits._
    val boiler = "all rights reserved contact us for details"
    val corpus = Seq(
      (1L, s"first unique article body text $boiler"),
      (2L, s"second unique piece of writing $boiler"),
      (3L, s"third totally different content $boiler"),
      (4L, "clean document with no shared span inside")
    ).toDF("doc_id", "text")
    // discovery: the boilerplate 7-gram shows up with doc frequency 3
    val spans = Decontaminate.repeatedSpans(corpus, "doc_id", "text", n = 7,
      minDocs = 3L)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(spans.toSeq === Seq((boiler, 3L, 1L)))
    // intra-doc repeats do not inflate the doc frequency
    val rep = Seq((9L, s"$boiler $boiler"), (10L, "x y")).toDF("doc_id", "text")
    val repSpans = Decontaminate.repeatedSpans(rep, "doc_id", "text", 7, 1L)
      .filter(col("gram") === boiler).head()
    assert(repSpans.getLong(1) === 1L)
    // the discover→enforce loop: feed the found span back as the droplist
    val droplist = Seq((0L, boiler)).toDF("doc_id", "text")
    val flagged = Decontaminate.sharedNgrams(corpus, droplist, "doc_id", "text", 7)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(flagged === Set(1L, 2L, 3L))
    // map-side-combinable pick, never a window
    val plan = Decontaminate.repeatedSpans(corpus, "doc_id", "text", 7)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"unexpected Window:\n$plan")
  }
}

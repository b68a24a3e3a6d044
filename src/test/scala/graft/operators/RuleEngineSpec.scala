package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Deterministic rule/tag/alert semantics (analyst.go:269-292,
  * tagger.go:172-194) + the reference's E2E scenario
  * (cmd/integration-test/main.go:96-135, FIXTURES.md §1).
  */
class RuleEngineSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("fallbackAnswer keyword implications incl. fall-through") {
    import spark.implicits._
    val cases = Seq(
      // (question, content, expected)
      ("Does this contain confidential data?", "CONFIDENTIAL report", "YES"),
      ("Does this contain confidential data?", "public report", "NO"),
      // fall-through: question has 'confidential' (no hit) AND 'pricing' (hit)
      ("Is confidential pricing present?", "our price list", "YES"),
      ("Does this discuss pricing?", "the PRICING page", "YES"),
      ("Does this discuss pricing?", "price only", "YES"),
      ("Is there a secret?", "top secret plan", "YES"),
      ("Is there a secret?", "nothing here", "NO"),
      ("Unrelated question?", "secret confidential price", "NO"))
    val df = cases.map { case (q, c, _) => (q, c) }.toDF("q", "c")
    val got = df.select(RuleEngine.fallbackAnswer(col("q"), col("c"))).as[String].collect()
    assert(got.toSeq == cases.map(_._3))
  }

  test("fallbackTags emits tags in declaration order, multi-tag") {
    import spark.implicits._
    val df = Seq(
      "the legal contract for the invoice payment is URGENT and confidential",
      "a quote for the proposal",
      "nothing special").toDF("c")
    val got = df.select(RuleEngine.fallbackTags(col("c"))).as[Seq[String]].collect()
    assert(got(0) == Seq("#legal", "#finance", "#urgent", "#confidential"))
    assert(got(1) == Seq("#proposal"))
    assert(got(2) == Seq.empty)
  }

  test("E2E scenario: confidential-pricing rule fires on the test doc") {
    import spark.implicits._
    val rules = Seq((1, "Does this document contain confidential pricing information?"))
      .toDF("rule_id", "question")
    val doc = Seq(("test_confidential.txt",
      "This document contains CONFIDENTIAL pricing information for Q4 2025."))
      .toDF("document_id", "text")
    val res = RuleEngine.evaluate(doc, rules, col("text")).collect()
    assert(res.length == 1)
    assert(res.head.getAs[String]("answer") == "YES")

    val alerts = RuleEngine.keywordAlerts(doc, col("text")).collect()
    assert(alerts.length == 1)
    assert(alerts.head.getAs[String]("alert_keyword") == "CONFIDENTIAL")
    // keyword matching is case-insensitive regardless of how it's passed
    assert(RuleEngine.keywordAlerts(doc, col("text"), "pricing").count() == 1)
    assert(RuleEngine.keywordAlerts(doc, col("text"), "Pricing").count() == 1)
    assert(RuleEngine.keywordAlerts(doc, col("text"), "absent").count() == 0)
  }

  test("DeterministicOracle mirrors the column implementation") {
    assert(DeterministicOracle.yesNo("any pricing question", "price"))
    assert(!DeterministicOracle.yesNo("other question", "price"))
    assert(DeterministicOracle.tags("urgent invoice") == Seq("#finance", "#urgent"))
  }
}

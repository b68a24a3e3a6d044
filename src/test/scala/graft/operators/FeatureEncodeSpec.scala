package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FeatureEncodeSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("woeIv matches the hand formula, clamps outliers, stays finite on empty sides") {
    import spark.implicits._
    // bin width 10 over [0,30): bins 0,1,2; values at -5 and 99 clamp in
    val rows = Seq(
      (-5.0, 1), (2.0, 1), (3.0, 0),          // bin 0: pos 2, neg 1
      (12.0, 0), (15.0, 0),                   // bin 1: pos 0, neg 2
      (25.0, 1), (99.0, 1))                   // bin 2: pos 2, neg 0
    val df = rows.toDF("x", "y")
    val got = FeatureEncode.woeIv(df, col("x"), col("y"), bins = 3, lo = 0.0, hi = 30.0)
      .orderBy("bin").collect()
    assert(got.map(_.getAs[Int]("bin")).toSeq == Seq(0, 1, 2))
    val posTot = 4.0; val negTot = 3.0
    def woe(p: Long, n: Long): Double = {
      val d = math.log(((p + 0.5) / posTot) / ((n + 0.5) / negTot))
      BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val exp = Seq((2L, 1L), (0L, 2L), (2L, 0L)).map { case (p, n) => woe(p, n) }
    assert(got.map(_.getAs[Double]("woe")).toSeq == exp)
    // iv_total is the decimal sum of the rounded terms, same on every row
    val terms = got.map(_.getAs[Double]("iv_term"))
    val tot = BigDecimal(terms.map(BigDecimal(_).setScale(6)).sum.toString).toDouble
    assert(got.map(_.getAs[Double]("iv_total")).distinct.toSeq == Seq(tot))
  }

  test("woeIv ignores null-feature and null-label rows instead of binning them") {
    import spark.implicits._
    // greatest/least skip nulls, so an unfiltered null feature would land
    // in bin 0 and contaminate its counts (the HistogramSketch trap)
    val clean = Seq((0.5, 1), (0.5, 0), (1.5, 1), (1.5, 1))
      .toDF("x", "y").select(col("x").as("x"), col("y").as("y"))
    val dirty = clean.unionByName(
      Seq((Option.empty[Double], Option(1)), (Option(0.5), Option.empty[Int]))
        .toDF("x", "y"))
    val a = FeatureEncode.woeIv(clean, col("x"), col("y"), bins = 2, lo = 0.0, hi = 2.0)
      .orderBy("bin").collect().map(r =>
        (r.getAs[Int]("bin"), r.getAs[Long]("n"), r.getAs[Double]("woe"))).toSeq
    val b = FeatureEncode.woeIv(dirty, col("x"), col("y"), bins = 2, lo = 0.0, hi = 2.0)
      .orderBy("bin").collect().map(r =>
        (r.getAs[Int]("bin"), r.getAs[Long]("n"), r.getAs[Double]("woe"))).toSeq
    assert(a == b)
    assert(a.map(_._2).sum == 4L) // only the clean rows are counted
  }

  test("targetEncode shrinks small categories toward the prior") {
    import spark.implicits._
    val df = (Seq.fill(100)(("big", 1)) ++ Seq.fill(100)(("big", 0)) ++
      Seq(("tiny", 1))).toDF("c", "y")
    val got = FeatureEncode.targetEncode(df, col("c"), col("y"), m = 10.0)
      .orderBy("category").collect()
      .map(r => r.getAs[String]("category") -> r.getAs[Double]("enc")).toMap
    val prior = 101.0 / 201.0
    def enc(sy: Long, n: Long): Double =
      BigDecimal((sy + 10.0 * prior) / (n + 10.0))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got("big") == enc(100, 200))
    assert(got("tiny") == enc(1, 1))
    // tiny sits between its raw mean (1.0) and the prior, near the prior
    assert(got("tiny") < 1.0 && got("tiny") > prior)
  }
}

package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Closed-form fitting against analytic ground truths: OLS recovers an
  * exactly-linear law with R² = 1, the stump finds a perfectly separating
  * split with zero Gini, PAVA leaves monotone input untouched and pools a
  * violating pair to its average, and the rank statistics hit ±1 on
  * monotone data and 0 on designed independence.
  */
class RegressSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  test("ols2 recovers an exact linear relationship with r2 = 1") {
    // y = 2 + 3·x1 − 0.5·x2 on a non-degenerate design
    val rows = for { a <- 1 to 6; b <- 1 to 5 }
      yield (2.0 + 3.0 * a - 0.5 * b, a.toDouble, b.toDouble)
    val out = Regress.ols2(rows.toDF("y", "x1", "x2"),
      col("y"), col("x1"), col("x2")).collect()(0)
    assert(out.getAs[Long]("n") == 30L)
    assert(out.getAs[Double]("b0") == 2.0)
    assert(out.getAs[Double]("b1") == 3.0)
    assert(out.getAs[Double]("b2") == -0.5)
    assert(out.getAs[Double]("r2") == 1.0)
  }

  test("ols2 on pure-noise feature keeps its coefficient at zero") {
    // y depends only on x1; x2 cycles independently of y
    val rows = for { a <- 1 to 8; b <- 1 to 4 }
      yield (10.0 + 2.0 * a, a.toDouble, b.toDouble)
    val out = Regress.ols2(rows.toDF("y", "x1", "x2"),
      col("y"), col("x1"), col("x2")).collect()(0)
    assert(out.getAs[Double]("b1") == 2.0)
    assert(out.getAs[Double]("b2") == 0.0)
    assert(out.getAs[Double]("r2") == 1.0)
  }

  test("decisionStump finds a perfectly separating threshold at gini 0") {
    val rows = (1 to 40).map(v => (v.toDouble, if (v <= 25) 0L else 1L))
    val out = Regress.decisionStump(rows.toDF("f", "y"),
      Seq("f" -> col("f")), col("y")).collect()(0)
    assert(out.getAs[String]("feature") == "f")
    assert(out.getAs[Double]("threshold") == 25.0)
    assert(out.getAs[Double]("gini") == 0.0)
    assert(out.getAs[Long]("n_left") == 25L)
    assert(out.getAs[Long]("n_right") == 15L)
  }

  test("decisionStump prefers the informative feature over a constant-rate one") {
    val rows = (1 to 30).map { v =>
      (v.toDouble, (v % 2).toDouble, if (v <= 10) 1L else 0L)
    }
    val out = Regress.decisionStump(rows.toDF("good", "parity", "y"),
        Seq("good" -> col("good"), "parity" -> col("parity")), col("y"))
      .orderBy(col("gini")).collect()
    assert(out(0).getAs[String]("feature") == "good")
    assert(out(0).getAs[Double]("threshold") == 10.0)
    assert(out(0).getAs[Double]("gini") == 0.0)
    assert(out(1).getAs[Double]("gini") > 0.3)
  }

  private def bins(rows: Seq[(Long, Double, Long)]) =
    rows.toDF("bin", "y", "n")
      .select(col("bin"), col("y").cast("decimal(18,2)").as("sum_y"), col("n"))

  test("isotonicBins keeps already-monotone rates untouched") {
    val out = Regress.isotonicBins(bins(Seq((0L, 1.0, 10L), (1L, 3.0, 10L),
      (2L, 7.0, 10L)))).orderBy("bin").collect()
    assert(out.map(_.getAs[Double]("iso_rate")).toSeq == Seq(0.1, 0.3, 0.7))
    assert(out.map(_.getAs[Double]("rate")).toSeq == Seq(0.1, 0.3, 0.7))
  }

  test("isotonicBins pools a violating pair to its weighted mean") {
    // rates 0.6, 0.2 violate; pooled mean over equal weights = 0.4
    val out = Regress.isotonicBins(bins(Seq((0L, 6.0, 10L), (1L, 2.0, 10L),
      (2L, 9.0, 10L)))).orderBy("bin").collect()
    assert(out.map(_.getAs[Double]("iso_rate")).toSeq == Seq(0.4, 0.4, 0.9))
  }

  test("isotonicBins pools with weights, not bin-count averages") {
    // violator bin 1 has 3× the weight: pooled = (2 + 3)/(10 + 30) = 0.125
    val out = Regress.isotonicBins(bins(Seq((0L, 2.0, 10L), (1L, 3.0, 30L))))
      .orderBy("bin").collect()
    assert(out.map(_.getAs[Double]("iso_rate")).toSeq == Seq(0.125, 0.125))
  }

  test("rankCorrelation: monotone data scores +1/+1, reversed −1/−1") {
    val up = (1 to 12).map(i => ("g", i.toDouble, math.exp(i.toDouble), i.toLong))
    val dn = (1 to 12).map(i => ("h", i.toDouble, -math.exp(i.toDouble), i.toLong))
    val out = Regress.rankCorrelation((up ++ dn).toDF("g", "x", "y", "id"),
        Seq("g"), col("x"), col("y"), col("id"))
      .orderBy("g").collect()
    assert(out(0).getAs[Double]("spearman_rho") == 1.0)
    assert(out(0).getAs[Double]("kendall_tau") == 1.0)
    assert(out(1).getAs[Double]("spearman_rho") == -1.0)
    assert(out(1).getAs[Double]("kendall_tau") == -1.0)
  }

  test("rankCorrelation handles ties via average ranks and tau-b") {
    // y constant → zero variance → null rho and null tau (guarded, not NaN)
    val rows = (1 to 6).map(i => ("g", i.toDouble, 5.0, i.toLong))
    val out = Regress.rankCorrelation(rows.toDF("g", "x", "y", "id"),
      Seq("g"), col("x"), col("y"), col("id")).collect()(0)
    assert(out.isNullAt(out.fieldIndex("spearman_rho")))
    assert(out.isNullAt(out.fieldIndex("kendall_tau")))
  }
}

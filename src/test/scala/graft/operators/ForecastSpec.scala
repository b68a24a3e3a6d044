package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Holt linear-trend ground truths: a hand-walked two-point series, trend
  * recovery on a clean ramp, the single-observation degenerate case, the
  * dyadic-parameter guard, and partition invariance of the ordered fold.
  */
class ForecastSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  test("two-point series walks the exact recursion by hand") {
    // seed l=1, b=0; step y=3: l' = .5*3+.5*1 = 2; b' = .25*(2-1) = 0.25
    val out = Forecast.holtLinear(
      Seq(("k", 1L, 1.0), ("k", 2L, 3.0)).toDF("k", "t", "y"),
      "k", "t", "y").collect().head
    assert(out.getAs[Long]("n_obs") == 2L)
    assert(out.getAs[Double]("level") == 2.0)
    assert(out.getAs[Double]("trend") == 0.25)
    assert(out.getAs[Double]("forecast_7") == 2.0 + 7 * 0.25)
  }

  test("clean ramp recovers slope ~1 and forecasts ahead") {
    val ramp = (1 to 40).map(t => ("k", t.toLong, t.toDouble))
    val out = Forecast.holtLinear(ramp.toDF("k", "t", "y"), "k", "t", "y")
      .collect().head
    val level = out.getAs[Double]("level")
    val trend = out.getAs[Double]("trend")
    assert(math.abs(trend - 1.0) < 0.05)
    assert(math.abs(level - 40.0) < 2.0)
    assert(math.abs(out.getAs[Double]("forecast_7") - (level + 7 * trend))
      < 1e-9)
  }

  test("single observation: level = y, zero trend") {
    val out = Forecast.holtLinear(
      Seq(("k", 1L, 5.5)).toDF("k", "t", "y"), "k", "t", "y")
      .collect().head
    assert(out.getAs[Long]("n_obs") == 1L)
    assert(out.getAs[Double]("level") == 5.5)
    assert(out.getAs[Double]("trend") == 0.0)
    assert(out.getAs[Double]("forecast_7") == 5.5)
  }

  test("order column, not input order, drives the fold") {
    val shuffled = Seq(("k", 2L, 3.0), ("k", 1L, 1.0)).toDF("k", "t", "y")
    val out = Forecast.holtLinear(shuffled, "k", "t", "y").collect().head
    assert(out.getAs[Double]("level") == 2.0) // same as the ordered fixture
  }

  test("non-dyadic smoothing parameters are refused") {
    val df = Seq(("k", 1L, 1.0)).toDF("k", "t", "y")
    intercept[IllegalArgumentException](
      Forecast.holtLinear(df, "k", "t", "y", alpha = 0.3))
    intercept[IllegalArgumentException](
      Forecast.holtLinear(df, "k", "t", "y", beta = 0.1))
    intercept[IllegalArgumentException](
      Forecast.holtLinear(df, "k", "t", "y", horizon = 0))
  }

  test("backtest: one-step errors accumulate before each update") {
    // [1,3]: prediction for the 2nd point is 1+0=1, error 2 => mae=2, rmse=2
    val out = Forecast.holtBacktest(
      Seq(("k", 1L, 1.0), ("k", 2L, 3.0)).toDF("k", "t", "y"),
      "k", "t", "y").collect().head
    assert(out.getAs[Double]("mae") == 2.0)
    assert(out.getAs[Double]("rmse") == 2.0)
    assert(out.getAs[Double]("level") == 2.0) // fit identical to holtLinear
    assert(out.getAs[Double]("trend") == 0.25)
    // [1,3,5]: step2 pred = 2+0.25 = 2.25, err 2.75
    val out3 = Forecast.holtBacktest(
      Seq(("k", 1L, 1.0), ("k", 2L, 3.0), ("k", 3L, 5.0)).toDF("k", "t", "y"),
      "k", "t", "y").collect().head
    assert(out3.getAs[Double]("mae") == (2.0 + 2.75) / 2)
    assert(math.abs(out3.getAs[Double]("rmse")
      - math.sqrt((4.0 + 2.75 * 2.75) / 2)) < 1e-6)
  }

  test("backtest: single observation yields null errors") {
    val out = Forecast.holtBacktest(
      Seq(("k", 1L, 5.5)).toDF("k", "t", "y"), "k", "t", "y").collect().head
    assert(out.isNullAt(out.fieldIndex("mae")))
    assert(out.isNullAt(out.fieldIndex("rmse")))
    assert(out.getAs[Double]("level") == 5.5)
  }

  test("backtest: a clean ramp backtests near its own trend error floor") {
    val ramp = (1 to 40).map(t => ("k", t.toLong, t.toDouble))
    val out = Forecast.holtBacktest(ramp.toDF("k", "t", "y"), "k", "t", "y")
      .collect().head
    // after warmup the one-step error shrinks; average stays below 1
    assert(out.getAs[Double]("mae") < 1.0)
    assert(out.getAs[Double]("rmse") >= out.getAs[Double]("mae"))
  }

  test("holt-winters: two-point series walks the ring by hand") {
    // seed [1, 0, ring 0s]; x=3: l'=2, b'=.25, s'=.25 lands at ring tail
    val out = Forecast.holtWinters(
      Seq(("k", 1L, 1.0), ("k", 2L, 3.0)).toDF("k", "t", "y"),
      "k", "t", "y").collect().head
    assert(out.getAs[Double]("level") == 2.0)
    assert(out.getAs[Double]("trend") == 0.25)
    assert(out.getAs[Double]("s_next") == 0.0) // ring rotated, tail updated
    // forecast_7 reads the updated tail slot: 2 + 7*0.25 + 0.25
    assert(out.getAs[Double]("forecast_7") == 4.0)
  }

  test("holt-winters: an exact weekly pattern forecasts its own slot") {
    val pattern = Seq(5.0, 5.0, 5.0, 5.0, 5.0, 5.0, 19.0)
    val series = (0 until 70).map(t => ("k", t.toLong, pattern(t % 7)))
    val out = Forecast.holtWinters(series.toDF("k", "t", "y"), "k", "t", "y")
      .collect().head
    // t=70..76 repeats the pattern; forecast_7 predicts slot (70+6)%7 = 6
    val expected = pattern((70 + 7 - 1) % 7)
    assert(math.abs(out.getAs[Double]("forecast_7") - expected) < 1.5)
    // residual convergence drift from the zero seasonal seed, not a trend
    assert(math.abs(out.getAs[Double]("trend")) < 0.2)
  }

  test("hw multiplicative: constant series stays at identity components") {
    val series = (0 until 35).map(t => ("k", t.toLong, 8.0))
    val out = Forecast.holtWintersMultiplicative(
      series.toDF("k", "t", "y"), "k", "t", "y").collect().head
    // x/s = 8/1 = 8 = l+b at every step: level pinned, trend 0, ring 1
    assert(out.getAs[Double]("level") == 8.0)
    assert(out.getAs[Double]("trend") == 0.0)
    assert(out.getAs[Double]("s_next") == 1.0)
    assert(out.getAs[Double]("forecast_7") == 8.0)
  }

  test("hw multiplicative: proportional weekly pattern tracks its slot") {
    // level ramps 2% per day; slot-6 spikes ×3 — a multiplicative shape
    val series = (0 until 70).map { t =>
      val base = 10.0 * math.pow(1.0, t) // flat base, spike via seasonal
      ("k", t.toLong, if (t % 7 == 6) base * 3 else base)
    }
    val out = Forecast.holtWintersMultiplicative(
      series.toDF("k", "t", "y"), "k", "t", "y").collect().head
    // forecast slot (70+6)%7 = 6 — the spiked slot, near 30
    assert(out.getAs[Double]("forecast_7") > 20.0)
    // zero and negative values are filtered, not folded
    val withZero = series :+ (("k", 70L, 0.0))
    val out2 = Forecast.holtWintersMultiplicative(
      withZero.toDF("k", "t", "y"), "k", "t", "y").collect().head
    assert(out2.getAs[Long]("n_obs") == 70L)
  }

  test("holt-winters: guards and single observation") {
    val df = Seq(("k", 1L, 5.5)).toDF("k", "t", "y")
    intercept[IllegalArgumentException](
      Forecast.holtWinters(df, "k", "t", "y", gamma = 0.3))
    intercept[IllegalArgumentException](
      Forecast.holtWinters(df, "k", "t", "y", period = 1))
    val out = Forecast.holtWinters(df, "k", "t", "y").collect().head
    assert(out.getAs[Double]("level") == 5.5)
    assert(out.getAs[Double]("forecast_7") == 5.5)
  }

  test("partition invariance and per-key independence") {
    val series = (1 to 100).map(i =>
      (s"k${i % 5}", (i / 5).toLong, (i % 13).toDouble))
    val a = Forecast.holtLinear(series.toDF("k", "t", "y").repartition(1),
      "k", "t", "y").orderBy("k").collect().toSeq
    val b = Forecast.holtLinear(series.toDF("k", "t", "y").repartition(11),
      "k", "t", "y").orderBy("k").collect().toSeq
    assert(a == b)
    assert(a.size == 5)
  }

  test("holtResidualAnomalies: hand-walked residuals, sigma and flags") {
    import spark.implicits._
    // key a: steady 10s then a spike to 30 — the spike step must flag
    val rows = Seq(("a", 1L, 10.0), ("a", 2L, 10.0), ("a", 3L, 10.0),
      ("a", 4L, 30.0), ("a", 5L, 10.0), ("b", 1L, 5.0))
    val df = rows.toDF("k", "o", "y")
    val got = Forecast.holtResidualAnomalies(df, "k", "o", "y",
      alpha = 0.5, beta = 0.25, z = 1.5)
      .orderBy("k", "o").collect()
    // key b has a single observation -> no residual rows
    assert(got.forall(_.getString(0) == "a") && got.length == 4)
    // hand walk: l1=10,b1=0; step2: err=0 -> l=10,b=0; step3 same;
    // step4: err=20; step5 forecast l+b after spike
    val r = got.map(x => (x.getAs[Long]("o"), x.getAs[Double]("resid"),
      x.getAs[Boolean]("is_anomaly")))
    assert(r(0) == ((2L, 0.0, false)))
    assert(r(1) == ((3L, 0.0, false)))
    assert(r(2)._1 == 4L && r(2)._2 == 20.0 && r(2)._3)
    // sigma = sqrt((0+0+400+r5^2)/4), identical on every row
    val sigmas = got.map(_.getAs[Double]("sigma")).distinct
    assert(sigmas.length == 1 && sigmas.head > 10.0)
    // only the spike step flags at z=1.5 (sigma≈11.79: 20 > 17.7, 12.5 < 17.7)
    assert(got.count(_.getAs[Boolean]("is_anomaly")) == 1)
  }

  test("croston walks the two-series recursion by hand; zeros drop") {
    // nonzero points (day, qty): (1,4), (3,2), (6,6); the (2,0) row drops.
    // seed z=4, p=d2-d1=2; k=2: z=.5*2+.5*4=3, p=.5*2+.5*2=2;
    // k=3 (i=3): z=.5*6+.5*3=4.5, p=.5*3+.5*2=2.5 -> forecast 1.8, SBA 1.35
    val df = Seq(("k", 1L, 4.0), ("k", 2L, 0.0), ("k", 3L, 2.0),
      ("k", 6L, 6.0)).toDF("k", "t", "y")
    val out = Forecast.croston(df, "k", "t", "y").collect().head
    assert(out.getAs[Long]("n_points") == 3L)
    assert(out.getAs[Double]("z_level") == 4.5)
    assert(out.getAs[Double]("p_interval") == 2.5)
    assert(out.getAs[Double]("croston") == 1.8)
    assert(out.getAs[Double]("sba") == 1.35)
  }

  test("croston: single-point keys omitted; steady demand -> interval 1") {
    val df = Seq(("solo", 5L, 9.0)) ++ (1L to 30L).map(d => ("dense", d, 2.0))
    val out = Forecast.croston(df.toDF("k", "t", "y"), "k", "t", "y")
      .collect().map(r => r.getString(0) -> r).toMap
    assert(!out.contains("solo"))
    val dense = out("dense")
    assert(dense.getAs[Double]("z_level") == 2.0)      // constant size
    assert(dense.getAs[Double]("p_interval") == 1.0)   // every day
    assert(dense.getAs[Double]("croston") == 2.0)
  }
}

package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Gap-fill linear interpolation: exact midpoint/fractional fills,
  * multi-gap series, single-observation keys, per-key independent grids,
  * observed-value passthrough, and partition invariance.
  */
class ResampleSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def series = Seq(
    (1L, 0L, 10.0), (1L, 4L, 30.0), (1L, 6L, 0.0), // gaps at 1,2,3,5
    (2L, 100L, 7.5)                                // single point
  ).toDF("k", "b", "v")

  private def run(d: org.apache.spark.sql.DataFrame) =
    Resample.gapFillLinear(d, "k", "b", "v")
      .orderBy("k", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))

  test("fills every missing bucket with the linear interpolant") {
    assert(run(series).toSeq == Seq(
      (1L, 0L, 10.0, false),
      (1L, 1L, 15.0, true),
      (1L, 2L, 20.0, true),
      (1L, 3L, 25.0, true),
      (1L, 4L, 30.0, false),
      (1L, 5L, 15.0, true),
      (1L, 6L, 0.0, false),
      (2L, 100L, 7.5, false)))
  }

  test("grid is the key's own [min,max] span — no extrapolation") {
    val out = run(series)
    assert(out.filter(_._1 == 1L).map(_._2).toSeq == (0L to 6L))
    assert(out.filter(_._1 == 2L).map(_._2).toSeq == Seq(100L))
  }

  test("observed values pass through exactly (no rounding)") {
    val d = Seq((1L, 0L, 1.0 / 3.0), (1L, 1L, 2.0 / 3.0)).toDF("k", "b", "v")
    val out = run(d)
    assert(out(0)._3 == 1.0 / 3.0 && out(1)._3 == 2.0 / 3.0)
    assert(out.forall(!_._4))
  }

  test("fractional interpolation snaps to 6 decimals") {
    // gap of 3: fills at 1/3 and 2/3 of the way from 0.0 to 1.0
    val d = Seq((1L, 0L, 0.0), (1L, 3L, 1.0)).toDF("k", "b", "v")
    val out = run(d)
    assert(out(1)._3 == 0.333333 && out(2)._3 == 0.666667)
  }

  test("partition invariance") {
    val a = run(series).toSeq
    assert(run(series.repartition(5, col("v"))).toSeq == a)
  }

  test("gapFillLocf: carries the last observation, exact copies") {
    val out = Resample.gapFillLocf(series, "k", "b", "v")
      .orderBy("k", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getBoolean(3)))
    assert(out.toSeq == Seq(
      (1L, 0L, 10.0, false),
      (1L, 1L, 10.0, true), // carried, not interpolated
      (1L, 2L, 10.0, true),
      (1L, 3L, 10.0, true),
      (1L, 4L, 30.0, false),
      (1L, 5L, 30.0, true),
      (1L, 6L, 0.0, false),
      (2L, 100L, 7.5, false)))
  }

  test("rollingStats: trailing window over the dense grid") {
    val dense = Resample.gapFillLinear(series, "k", "b", "v")
    val out = Resample.rollingStats(dense, "k", "b", "value", nBuckets = 3)
      .orderBy("k", "b").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[Long]("roll_n"), r.getAs[Double]("roll_mean"),
        r.getAs[Double]("roll_min"), r.getAs[Double]("roll_max")))
    // key 1 values: 10,15,20,25,30,15,0 on buckets 0..6
    val k1 = out.filter(_._1 == 1L)
    assert(k1.map(_._3).toSeq == Seq(1L, 2L, 3L, 3L, 3L, 3L, 3L))
    assert(k1(0)._4 == 10.0 && k1(1)._4 == 12.5 && k1(2)._4 == 15.0)
    assert(k1(6)._4 == 15.0) // (30+15+0)/3
    assert(k1(6)._5 == 0.0 && k1(6)._6 == 30.0)
    // single-point key: window of itself
    val k2 = out.filter(_._1 == 2L)
    assert(k2.toSeq == Seq((2L, 100L, 1L, 7.5, 7.5, 7.5)))
  }

  test("rollingStats: exact decimal midpoint means snap half-up") {
    val d = Seq((1L, 0L, 0.000001), (1L, 1L, 0.0)).toDF("k", "b", "v")
    val out = Resample.rollingStats(d, "k", "b", "v", nBuckets = 2)
      .orderBy("b").collect().map(_.getAs[Double]("roll_mean"))
    assert(out.toSeq == Seq(0.000001, 0.000001)) // 5e-7 rounds up
  }

  test("refuses missing and reserved columns") {
    intercept[IllegalArgumentException] {
      Resample.gapFillLinear(series, "k", "nope", "v")
    }
    intercept[IllegalArgumentException] {
      Resample.gapFillLinear(series.withColumn("__v", lit(1.0)), "k", "b", "v")
    }
  }
}

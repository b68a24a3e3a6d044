package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Life-table ground truths: hand-computed risk sets and hazards, the
  * deaths-before-censorings convention, the exhausted-risk-set null, and
  * partition invariance of the whole table.
  */
class SurvivalSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  // (duration, event): deaths at 1 and 3 (x2), censors at 2 and 5
  private def fixture = Seq(
    (1L, 1), (2L, 0), (3L, 1), (3L, 1), (5L, 0)).toDF("dur", "ev")

  test("risk sets and hazards match the hand computation") {
    val rows = Survival.lifeTable(fixture, "dur", "ev")
      .orderBy("t").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 5L))
    // n_risk: 5, 4, 3, 1
    assert(rows.map(_.getAs[Long]("n_risk")).toSeq == Seq(5L, 4L, 3L, 1L))
    assert(rows.map(_.getAs[Long]("d_events")).toSeq == Seq(1L, 0L, 2L, 0L))
    assert(rows.map(_.getAs[Long]("c_censored")).toSeq == Seq(0L, 1L, 0L, 1L))
    assert(rows(0).getAs[Double]("hazard") == 0.2)
    assert(rows(1).getAs[Double]("hazard") == 0.0)
    assert(math.abs(rows(2).getAs[Double]("hazard") - 2.0 / 3.0) < 1e-8)
    // Nelson-Aalen: 0.2, 0.2, 0.2 + 2/3, same
    assert(math.abs(rows(2).getAs[Double]("na_cum_hazard")
      - (0.2 + 2.0 / 3.0)) < 1e-6)
    assert(rows(3).getAs[Double]("na_cum_hazard") ==
      rows(2).getAs[Double]("na_cum_hazard"))
    // KM in log space: ln(0.8) then + ln(1/3)
    assert(math.abs(rows(0).getAs[Double]("km_log_survival")
      - math.log(0.8)) < 1e-6)
    assert(math.abs(rows(2).getAs[Double]("km_log_survival")
      - (math.log(0.8) + math.log(1.0 / 3.0))) < 1e-6)
    // censoring-only time keeps the previous survival
    assert(rows(1).getAs[Double]("km_log_survival") ==
      rows(0).getAs[Double]("km_log_survival"))
  }

  test("exhausted risk set nulls KM from that time on, hazard stays 1") {
    val df = Seq((1L, 1), (1L, 1), (0L, 1)).toDF("dur", "ev")
    val rows = Survival.lifeTable(df, "dur", "ev").orderBy("t").collect()
    // t=0: 1 death of 3 at risk — survives; t=1: 2 deaths of 2 — exhausted
    assert(rows(0).getAs[Double]("km_log_survival") != 0.0)
    assert(rows(1).getAs[Double]("hazard") == 1.0)
    assert(rows(1).isNullAt(rows(1).fieldIndex("km_log_survival")))
    // Nelson-Aalen keeps accumulating regardless
    assert(math.abs(rows(1).getAs[Double]("na_cum_hazard")
      - (1.0 / 3.0 + 1.0)) < 1e-6)
  }

  test("negative durations and null events are dropped") {
    val df = Seq((-1L, 1), (2L, 1)).toDF("dur", "ev")
      .union(Seq((3L, 1)).toDF("dur", "ev")
        .selectExpr("dur", "CAST(NULL AS INT) AS ev"))
    val rows = Survival.lifeTable(df, "dur", "ev").collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(2L))
    assert(rows.head.getAs[Long]("n_risk") == 1L)
  }

  test("partition invariance") {
    val big = (1 to 500).map(i => ((i % 17).toLong, i % 3 min 1))
      .toDF("dur", "ev")
    val a = Survival.lifeTable(big.repartition(1), "dur", "ev")
      .orderBy("t").collect().toSeq
    val b = Survival.lifeTable(big.repartition(13), "dur", "ev")
      .orderBy("t").collect().toSeq
    assert(a == b)
  }
}

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

  test("log-rank hand walk: O-E and hypergeometric variance per time") {
    // A: (1,1),(2,0); B: (1,0),(2,1),(3,1)
    // t=1: n=5,nA=2,d=1,dA=1 -> E=0.4, oe=0.6, v=(2/5)(3/5)(4/4)=0.24
    // t=2: n=3,nA=1,d=1,dA=0 -> E=1/3, oe=-1/3, v=(1/3)(2/3)=0.222222222222
    // t=3: n=1 -> v skipped, oe=0
    val df = Seq(("a", 1L, 1), ("a", 2L, 0), ("b", 1L, 0), ("b", 2L, 1),
      ("b", 3L, 1)).toDF("g", "dur", "ev")
    val r = Survival.logRank(df, "dur", "ev", "g").collect().head
    assert(r.getAs[Long]("n_times") == 3L)
    assert(r.getAs[Long]("deaths_a") == 1L)
    assert(r.getAs[Long]("deaths_b") == 2L)
    assert(r.getAs[Double]("o_minus_e") == 0.266667)
    assert(r.getAs[Double]("variance") == 0.462222)
    assert(math.abs(r.getAs[Double]("z") - 0.392232) < 1e-6)
  }

  test("log-rank: identical cohorts give z = 0; group A is the MIN label") {
    val df = Seq(("x", 1L, 1), ("x", 2L, 1), ("w", 1L, 1), ("w", 2L, 1))
      .toDF("g", "dur", "ev")
    val r = Survival.logRank(df, "dur", "ev", "g").collect().head
    assert(r.getAs[Double]("z") == 0.0)
    // deaths_a counts the MIN label ('w') deterministically
    assert(r.getAs[Long]("deaths_a") == 2L)
  }

  test("log-rank partition invariance") {
    val big = (1 to 400).map(i =>
      (if (i % 2 == 0) "a" else "b", (i % 19).toLong, i % 3 min 1))
      .toDF("g", "dur", "ev")
    val a = Survival.logRank(big.repartition(1), "dur", "ev", "g").collect()
    val b = Survival.logRank(big.repartition(13), "dur", "ev", "g").collect()
    assert(a.toSeq == b.toSeq)
  }
}

package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Reliability table: bin edges (including score exactly 1.0), per-bin
  * conf/acc arithmetic, ECE as the count-weighted gap mean, domain
  * filtering, and partition invariance.
  */
class CalibrationSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def df = Seq(
    (0.05, true), (0.05, false),          // bin 0: conf .05, acc .5
    (0.55, true), (0.65, true),           // bin 5/6
    (1.0, true),                          // top edge -> bin 9, not bin 10
    (0.95, false)                         // bin 9
  ).toDF("score", "label")

  private def run(d: org.apache.spark.sql.DataFrame) =
    Calibration.reliabilityTable(d, "score", "label", 10)
      .orderBy("bin").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3),
        r.getDouble(4), r.getDouble(5), r.getDouble(6)))

  test("bins, counts and means are exact; 1.0 lands in the top bin") {
    val out = run(df)
    assert(out.map(_._1).toSeq == Seq(0, 5, 6, 9))
    val bin0 = out.head
    assert(bin0._2 == 2 && bin0._3 == 1)
    assert(bin0._4 == 0.05 && bin0._5 == 0.5 && bin0._6 == 0.45)
    val bin9 = out.last
    assert(bin9._2 == 2 && bin9._3 == 1) // {1.0 true, 0.95 false}
    assert(bin9._4 == 0.975 && bin9._5 == 0.5 && bin9._6 == 0.475)
  }

  test("ece is the count-weighted mean gap, identical on every row") {
    val out = run(df)
    val n = out.map(_._2).sum.toDouble
    val expected = out.map(r => r._2 * r._6).sum / n
    out.foreach(r => assert(math.abs(r._7 - expected) < 1e-6))
    assert(out.map(_._7).distinct.length == 1)
  }

  test("perfectly calibrated bins give ece 0") {
    val d = Seq((0.5, true), (0.5, false)).toDF("score", "label")
    val out = run(d)
    assert(out.length == 1 && out.head._7 == 0.0)
  }

  test("out-of-domain and null scores are dropped") {
    val d = Seq(
      (Some(-0.1), true), (Some(1.5), true), (Option.empty[Double], true),
      (Some(0.5), true)
    ).toDF("score", "label")
    val out = run(d)
    assert(out.length == 1 && out.head._2 == 1)
  }

  test("partition invariance") {
    val a = run(df).toSeq
    assert(run(df.repartition(7, col("label"))).toSeq == a)
  }

  test("binaryMetrics: hand-computed confusion, F1 and rank-sum AUC") {
    val d = Seq((0.9, true), (0.8, false), (0.7, true), (0.4, true),
      (0.2, false)).toDF("score", "label")
    val r = Calibration.binaryMetrics(d, "score", "label", 0.5).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) ==
      ((2L, 1L, 1L, 1L)))
    assert(r.getAs[Double]("precision") == 0.666667)
    assert(r.getAs[Double]("recall") == 0.666667)
    assert(r.getAs[Double]("f1") == 0.666667)
    assert(r.getAs[Double]("accuracy") == 0.6)
    // pairs: (0.4,0.2)w (0.7,0.2)w (0.9,0.2)w (0.4,0.8)l (0.7,0.8)l (0.9,0.8)w
    // -> 4 wins / 6 pairs = 0.666667
    assert(r.getAs[Double]("auc") == 0.666667)
  }

  test("binaryMetrics: tied scores contribute half-wins to AUC") {
    val d = Seq((0.5, true), (0.5, false)).toDF("score", "label")
    val r = Calibration.binaryMetrics(d, "score", "label", 0.9).collect().head
    assert(r.getAs[Double]("auc") == 0.5)
  }

  test("binaryMetrics: single-class input yields null AUC, not NaN") {
    val d = Seq((0.9, true), (0.1, true)).toDF("score", "label")
    val r = Calibration.binaryMetrics(d, "score", "label", 0.5).collect().head
    assert(r.isNullAt(r.fieldIndex("auc")))
  }

  test("binaryMetrics: partition invariance") {
    val d = (1 to 500).map(i => ((i % 97) / 97.0, i % 3 == 0))
      .toDF("score", "label")
    val a = Calibration.binaryMetrics(d, "score", "label", 0.4).collect().head
    val b = Calibration.binaryMetrics(d.repartition(11, col("label")),
      "score", "label", 0.4).collect().head
    assert(a.toSeq == b.toSeq)
  }

  test("streaming image: any micro-batch split folds to the exact batch table") {
    val d = (1 to 400).map(i => ((i % 89) / 89.0, i % 3 == 0))
      .toDF("score", "label")
    val batch = Calibration.reliabilityTable(d, "score", "label", 10)
      .orderBy("bin").collect().map(_.toSeq)
    // three uneven micro-batches, merged in stream order
    val splits = Seq(d.limit(50), d.offset(50).limit(123), d.offset(173))
    val img = splits
      .map(b => Calibration.batchImage(b, "score", "label", 10))
      .reduce(Calibration.mergeImages)
    val streamed = Calibration.imageToTable(spark, img)
      .orderBy("bin").collect().map(_.toSeq)
    assert(streamed.toSeq == batch.toSeq)
  }

  test("streaming image: merge is commutative") {
    val d1 = Seq((0.2, true), (0.9, false)).toDF("score", "label")
    val d2 = Seq((0.25, false), (0.9, true), (0.1, true)).toDF("score", "label")
    val a = Calibration.batchImage(d1, "score", "label", 4)
    val b = Calibration.batchImage(d2, "score", "label", 4)
    val ab = Calibration.imageToTable(spark, Calibration.mergeImages(a, b))
      .collect().map(_.toSeq)
    val ba = Calibration.imageToTable(spark, Calibration.mergeImages(b, a))
      .collect().map(_.toSeq)
    assert(ab.toSeq == ba.toSeq)
  }

  test("refuses bad inputs") {
    intercept[IllegalArgumentException] {
      Calibration.reliabilityTable(df, "score", "label", 0)
    }
    intercept[IllegalArgumentException] {
      Calibration.reliabilityTable(df, "nope", "label", 10)
    }
  }

  test("liftTable: hand-computed deciles, capture and lift") {
    import spark.implicits._
    // scores 10..1 rank in order; labels put 3 of 4 positives in the top half
    val labels = Seq(1, 1, 0, 1, 0, 0, 0, 0, 0, 1)
    val df = labels.zipWithIndex.map { case (y, i) => (10 - i, y, i.toLong) }
      .toDF("score", "y", "id")
    val got = Calibration.liftTable(df, col("score"), col("y"), buckets = 2,
      tiebreaks = Seq(col("id")))
      .orderBy("bucket").collect()
      .map(r => (r.getAs[Int]("bucket"), r.getAs[Long]("n"), r.getAs[Long]("pos"),
        r.getAs[Double]("response_rate"), r.getAs[Double]("cum_capture"),
        r.getAs[Double]("cum_lift"))).toSeq
    assert(got == Seq((1, 5L, 3L, 0.6, 0.75, 1.5), (2, 5L, 1L, 0.2, 1.0, 1.0)))
  }

  test("liftTable is partition-invariant") {
    import spark.implicits._
    val df = (1 to 1000).map(i => ((i * 37) % 500, (i % 3).min(1), i.toLong))
      .toDF("score", "y", "id")
    val a = Calibration.liftTable(df.repartition(1), col("score"), col("y"), 10,
      Seq(col("id"))).orderBy("bucket").collect().map(_.toSeq).toSeq
    val b = Calibration.liftTable(df.repartition(17), col("score"), col("y"), 10,
      Seq(col("id"))).orderBy("bucket").collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}

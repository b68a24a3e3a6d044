package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Boosted stumps against hand-derived fits: a perfectly stump-shaped
  * target is nailed in round 1 (sse 0), round 2 then corrects exactly
  * the residual the 0.5 learning rate left behind, and the informative
  * feature beats a noise feature in both rounds.
  */
class BoostSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  test("two-level target: round 1 splits exactly, round 2 halves the residual") {
    // y = 10 for f ≤ 5, y = 20 for f > 5; noise feature constant
    val rows = (1 to 10).map(i =>
      (if (i <= 5) 10.0 else 20.0, i.toDouble, 1.0))
    val out = Boost.boostedStumps2(rows.toDF("y", "f", "g"),
        col("y"), "f", col("f"), "g", col("g"), lr = 0.5)
      .orderBy("round").collect()
    val r0 = out(0); val r1 = out(1); val r2 = out(2)
    assert(r0.getAs[Double]("w_left") == 15.0) // F0 = mean
    assert(r0.getAs[Double]("sse") == 250.0) // 10 · 5²
    assert(r1.getAs[String]("feature") == "f")
    assert(r1.getAs[Double]("threshold") == 5.0)
    assert(r1.getAs[Double]("w_left") == -5.0)
    assert(r1.getAs[Double]("w_right") == 5.0)
    assert(r1.getAs[Double]("sse") == 0.0)
    // after lr=0.5: predictions 12.5 / 17.5 → residuals ∓2.5, same split
    assert(r2.getAs[String]("feature") == "f")
    assert(r2.getAs[Double]("threshold") == 5.0)
    assert(r2.getAs[Double]("w_left") == -2.5)
    assert(r2.getAs[Double]("w_right") == 2.5)
    assert(r2.getAs[Double]("sse") == 0.0)
  }

  test("the informative feature wins over an anti-correlated weak one") {
    // f separates perfectly; g only partially
    val rows = (1 to 12).map { i =>
      val y = if (i <= 6) 0.0 else 12.0
      (y, i.toDouble, (i % 4).toDouble)
    }
    val out = Boost.boostedStumps2(rows.toDF("y", "f", "g"),
        col("y"), "f", col("f"), "g", col("g"), lr = 0.5)
      .orderBy("round").collect()
    assert(out(1).getAs[String]("feature") == "f")
    assert(out(1).getAs[Double]("threshold") == 6.0)
    assert(out(1).getAs[Double]("sse") == 0.0)
  }
}

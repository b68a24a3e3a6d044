package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Power iteration: alignment with a planted dominant direction, unit
  * output norm, sigma = dominant Gram action, dimension filtering,
  * partition invariance (the decimal-sum grid must make the iteration
  * layout-independent), and the zero-matrix failure mode.
  */
class PcaSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  /** Rows strongly aligned with (.6,.8,0,0) plus small deterministic
    * off-direction wiggle.
    */
  private def planted = (1 to 200).map { i =>
    val a = 1.0 + (i % 7) * 0.1
    val w = (i % 3 - 1) * 0.01
    (i.toLong, Seq(0.6f * a.toFloat, 0.8f * a.toFloat, w.toFloat, -w.toFloat))
  }.toDF("id", "vec")

  private def run(df: org.apache.spark.sql.DataFrame, iters: Int = 3) =
    Pca.topComponent(df, "id", "vec", dim = 4, iters = iters)
      .orderBy("dim").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))

  test("recovers the planted dominant direction") {
    val out = run(planted)
    val v = out.map(_._2)
    val cos = math.abs(v(0) * 0.6 + v(1) * 0.8)
    assert(cos > 0.999, s"cosine with planted direction was $cos")
    assert(math.abs(v(2)) < 0.05 && math.abs(v(3)) < 0.05)
  }

  test("output direction has unit L2 norm (to the snap grid)") {
    val v = run(planted).map(_._2)
    assert(math.abs(v.map(x => x * x).sum - 1.0) < 1e-6)
  }

  test("sigma is positive and identical on every row") {
    val out = run(planted)
    assert(out.map(_._3).distinct.length == 1)
    assert(out.head._3 > 0.0)
  }

  test("rows with null or wrong-length vectors are ignored") {
    val dirty = planted
      .unionByName(Seq((9001L, Seq(1.0f, 2.0f))).toDF("id", "vec"))
      .unionByName(Seq((9002L, Option.empty[Seq[Float]])).toDF("id", "vec"))
    assert(run(dirty).toSeq == run(planted).toSeq)
  }

  test("partition invariance: bit-identical across layouts") {
    val a = run(planted).toSeq
    assert(run(planted.repartition(13, col("id"))).toSeq == a)
    assert(run(planted.coalesce(1)).toSeq == a)
  }

  test("projectionStats: removing the dominant direction kills most norm") {
    val comp = run(planted).map(t => t._1 -> t._2).toMap
    val out = Pca.projectionStats(planted, "id", "vec", 4, comp)
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getDouble(2), r.getDouble(3)))
    assert(out.length == 200)
    out.foreach { case (_, coef, before, after) =>
      // planted rows are nearly parallel to the direction: the residual
      // is the 0.01-scale wiggle, and |coef| ≈ the row norm
      assert(after < 0.05, s"residual norm $after")
      assert(before > 0.9 && math.abs(math.abs(coef) - before) < 0.01)
    }
    // Pythagoras on the snap grid: coef² + after² ≈ before²
    out.foreach { case (_, c, b, a) =>
      assert(math.abs(c * c + a * a - b * b) < 1e-4)
    }
  }

  test("zero matrix fails loudly instead of emitting NaNs") {
    val z = Seq((1L, Seq(0f, 0f, 0f, 0f))).toDF("id", "vec")
    intercept[IllegalArgumentException] { run(z) }
  }
}

package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** LOF semantics on designed densities: interior points of a uniform
  * cluster score ≈ 1, a distant point scores ≫ 1, and the score is
  * invariant to input partitioning.
  */
class OutliersSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  // a 4×4 unit grid plus one point far away; 2-d vectors padded to 4 dims
  private def fixture = {
    val grid = for { x <- 0 until 4; y <- 0 until 4 }
      yield ((x * 4 + y).toLong, Array(x.toFloat, y.toFloat, 0f, 0f))
    val out = Seq((99L, Array(40f, 40f, 0f, 0f)))
    (grid ++ out).toDF("id", "vec")
  }

  test("a far point gets LOF >> 1; grid interior stays near 1") {
    val res = Outliers.lof(fixture, "id", "vec", k = 3)
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Double]("lof"), r.getAs[Double]("kdist"))).toMap
    assert(res.size == 17)
    val (lofOut, kdistOut) = res(99L)
    assert(lofOut > 5.0, s"outlier lof=$lofOut")
    // interior point (1,1) = id 5: three unit-distance neighbors
    val (lofIn, kdistIn) = res(5L)
    assert(kdistIn == 1.0)
    assert(math.abs(lofIn - 1.0) < 0.2, s"interior lof=$lofIn")
    assert(kdistOut > 40.0)
  }

  test("every point scores, and scores are partition-invariant") {
    val base = Outliers.lof(fixture, "id", "vec", k = 3)
      .orderBy("id").collect().toSeq
    val repart = Outliers.lof(fixture.repartition(7, col("id")), "id", "vec",
      k = 3).orderBy("id").collect().toSeq
    assert(base == repart)
  }

  test("k >= panel size - 1 degrades to global density and still works") {
    val small = Seq(
      (1L, Array(0f, 0f, 0f, 0f)),
      (2L, Array(1f, 0f, 0f, 0f)),
      (3L, Array(2f, 0f, 0f, 0f))).toDF("id", "vec")
    val res = Outliers.lof(small, "id", "vec", k = 2).orderBy("id").collect()
    assert(res.length == 3)
    assert(res.forall(!_.isNullAt(3)))
  }
}

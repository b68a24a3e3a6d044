package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Theil–Sen against exact lines and designed outliers; Katz centrality
  * against hand-unrolled power series on tiny graphs.
  */
class TheilSenKatzSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  test("theilSen recovers an exact line") {
    val rows = (1 to 9).map(i => ("g", i.toDouble, 2.0 * i + 1.0, i.toLong))
    val out = Regress.theilSen(rows.toDF("g", "x", "y", "id"),
      Seq("g"), col("x"), col("y"), col("id")).collect()(0)
    assert(out.getAs[Double]("sen_slope") == 2.0)
    assert(out.getAs[Double]("sen_intercept") == 1.0)
    assert(out.getAs[Long]("n_pairs") == 36L)
  }

  test("theilSen shrugs off a wild outlier that would wreck OLS") {
    val clean = (1 to 10).map(i => ("g", i.toDouble, i.toDouble, i.toLong))
    val rows = clean :+ (("g", 11.0, 1000.0, 11L))
    val out = Regress.theilSen(rows.toDF("g", "x", "y", "id"),
      Seq("g"), col("x"), col("y"), col("id")).collect()(0)
    assert(out.getAs[Double]("sen_slope") == 1.0)
    assert(out.getAs[Double]("sen_intercept") == 0.0)
    // same data through OLS moments (x2 an independent nuisance column to
    // keep the design non-singular): slope far from 1
    val ols = Regress.ols2(rows.toDF("g", "x", "y", "id")
        .withColumn("x2", (col("id") % 3).cast("double")),
      col("y"), col("x"), col("x2")).collect()(0)
    assert(math.abs(ols.getAs[Double]("b1") - 1.0) > 5.0)
  }

  test("theilSen skips vertical pairs (equal x) instead of dividing by zero") {
    val rows = Seq(("g", 1.0, 1.0, 1L), ("g", 1.0, 9.0, 2L), ("g", 2.0, 2.0, 3L))
    val out = Regress.theilSen(rows.toDF("g", "x", "y", "id"),
      Seq("g"), col("x"), col("y"), col("id")).collect()(0)
    assert(out.getAs[Long]("n_pairs") == 2L) // (1,3) and (2,3) only
  }

  test("katz on a path graph matches the hand-unrolled series") {
    val edges = Seq((1L, 2L), (2L, 3L)).toDF("src", "dst")
    val out = GraphOps.katz(edges, alpha = 0.5, iterations = 3)
      .orderBy("node").collect()
      .map(r => r.getAs[Long]("node") -> r.getAs[Double]("katz")).toMap
    assert(out(1L) == 1.0)       // no in-edges
    assert(out(2L) == 1.5)       // 1 + α
    assert(out(3L) == 1.75)      // 1 + α(1 + α)
  }

  test("katz on a 2-cycle walks three damped rounds") {
    val edges = Seq((1L, 2L), (2L, 1L)).toDF("src", "dst")
    val out = GraphOps.katz(edges, alpha = 0.5, iterations = 3)
      .orderBy("node").collect()
    // rounds: 1.5, 1.75, 1.875 — symmetric
    assert(out.forall(_.getAs[Double]("katz") == 1.875))
  }
}

package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Exact AUC identities: perfect ranking = 1, inverted = 0, the
  * hand-computed tie case = 0.875, and CV on exactly-linear data is
  * error-free in every fold.
  */
class RocAucSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def auc(rows: Seq[(Double, Long)]): (Double, Double) = {
    val r = Stats.rocAuc(rows.toDF("s", "y"), col("s"), col("y")).collect()(0)
    (r.getAs[Double]("auc"), r.getAs[Double]("gini"))
  }

  test("perfectly separated scores give AUC 1 and gini 1") {
    val (a, g) = auc(Seq((0.1, 0L), (0.2, 0L), (0.8, 1L), (0.9, 1L)))
    assert(a == 1.0 && g == 1.0)
  }

  test("inverted scores give AUC 0 and gini −1") {
    val (a, g) = auc(Seq((0.9, 0L), (0.8, 0L), (0.2, 1L), (0.1, 1L)))
    assert(a == 0.0 && g == -1.0)
  }

  test("hand-computed tie case: pos {3,2} vs neg {1,2} = 0.875") {
    val (a, _) = auc(Seq((3.0, 1L), (2.0, 1L), (1.0, 0L), (2.0, 0L)))
    assert(a == 0.875)
  }

  test("all-tied scores give AUC exactly 0.5") {
    val (a, g) = auc(Seq((7.0, 1L), (7.0, 0L), (7.0, 1L), (7.0, 0L)))
    assert(a == 0.5 && g == 0.0)
  }

  test("CV folds on exactly-linear data: zero rmse, perfect r2, fold sizes add up") {
    val rows = for { a <- 1 to 10; b <- 1 to 4 } yield
      (1.0 + 2.0 * a + 3.0 * b, a.toDouble, b.toDouble, ((a * 4 + b) % 5).toLong)
    val out = Regress.ols2CvFolds(rows.toDF("y", "x1", "x2", "f"),
      col("y"), col("x1"), col("x2"), col("f")).orderBy("fold").collect()
    assert(out.length == 5)
    out.foreach { r =>
      assert(r.getAs[Double]("b0") == 1.0)
      assert(r.getAs[Double]("b1") == 2.0)
      assert(r.getAs[Double]("b2") == 3.0)
      assert(r.getAs[Double]("rmse") == 0.0)
      assert(r.getAs[Double]("r2_test") == 1.0)
      assert(r.getAs[Long]("n_train") + r.getAs[Long]("n_test") == 40L)
    }
  }
}

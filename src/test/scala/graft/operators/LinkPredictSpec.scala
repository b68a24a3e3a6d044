package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Wedge link-prediction scores against hand-computed graphs. */
class LinkPredictSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def scores(edges: Seq[(Long, Long)]) =
    LinkPredict.wedgeScores(edges.toDF("src", "dst"))
      .collect().map(r => (r.getAs[Long]("u"), r.getAs[Long]("w")) ->
        (r.getAs[Long]("cn"), r.getAs[Double]("jaccard"),
          r.getAs[Double]("aa"), r.getAs[Long]("pa"))).toMap

  test("path graph: endpoints share the middle, adjacent pairs excluded") {
    val m = scores(Seq((1L, 2L), (2L, 3L)))
    assert(m.keySet == Set((1L, 3L)))
    val (cn, jac, aa, pa) = m((1L, 3L))
    assert(cn == 1L && pa == 1L)
    assert(jac == 1.0) // 1 / (1 + 1 − 1)
    assert(aa == BigDecimal(1.0 / math.log(2.0))
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("4-cycle: two disjoint wedge centers accumulate in cn and aa") {
    val m = scores(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)))
    assert(m.keySet == Set((1L, 3L), (2L, 4L)))
    val (cn, jac, _, pa) = m((1L, 3L))
    assert(cn == 2L && jac == 1.0 && pa == 4L)
  }

  test("triangle plus tail: closed pairs never appear, tail wedges do") {
    val m = scores(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)))
    // (1,2),(1,3),(2,3) are edges; open wedges are (1,4) and (2,4) via 3
    assert(m.keySet == Set((1L, 4L), (2L, 4L)))
    val (cn, jac, aa, pa) = m((1L, 4L))
    assert(cn == 1L && pa == 2L)
    assert(jac == BigDecimal(1.0 / 2.0).toDouble) // 1/(2+1−1)
    assert(aa == BigDecimal(1.0 / math.log(3.0))
      .setScale(12, BigDecimal.RoundingMode.HALF_UP)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
  }

  test("direction and duplication collapse before scoring") {
    val once = scores(Seq((1L, 2L), (2L, 3L)))
    val noisy = scores(Seq((1L, 2L), (2L, 1L), (1L, 2L), (2L, 3L), (3L, 2L)))
    assert(once == noisy)
  }
}

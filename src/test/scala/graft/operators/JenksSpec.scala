package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Jenks natural breaks against designed clusters and optimality
  * properties.
  */
class JenksSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  test("three well-separated clusters split exactly at the gaps") {
    val vals = Seq(1L, 2L, 10L, 11L, 20L, 21L)
    val out = Jenks.naturalBreaks(vals.toDF("v"), col("v"), k = 3)
      .orderBy("segment").collect()
    assert(out.map(r => (r.getAs[Long]("lo_v"), r.getAs[Long]("hi_v"))).toSeq ==
      Seq((1L, 2L), (10L, 11L), (20L, 21L)))
    assert(out.forall(_.getAs[Double]("sse") == 0.5))
    assert(out.map(_.getAs[Double]("mean")).toSeq == Seq(1.5, 10.5, 20.5))
  }

  test("weights matter: a heavy value pulls the break to isolate it") {
    // value 10 appears 100×: the 2-split isolates {1,2,3} from {10}
    val rows = Seq(1L, 2L, 3L) ++ Seq.fill(100)(10L)
    val out = Jenks.naturalBreaks(rows.toDF("v"), col("v"), k = 2)
      .orderBy("segment").collect()
    assert(out(0).getAs[Long]("hi_v") == 3L)
    assert(out(1).getAs[Long]("lo_v") == 10L)
    assert(out(1).getAs[Double]("sse") == 0.0)
    assert(out(1).getAs[Long]("n") == 100L)
  }

  test("total SSE is optimal: beats every alternative 2-split by scan") {
    val vals = Seq(1L, 3L, 4L, 9L, 11L, 16L)
    val out = Jenks.naturalBreaks(vals.toDF("v"), col("v"), k = 2)
      .collect()
    val got = out.map(_.getAs[Double]("sse")).sum
    def sse(xs: Seq[Long]): Double = {
      val m = xs.sum.toDouble / xs.size
      xs.map(x => (x - m) * (x - m)).sum
    }
    val best = (1 until vals.size)
      .map(c => sse(vals.take(c)) + sse(vals.drop(c))).min
    assert(math.abs(got - best) < 1e-6, s"got $got best $best")
  }

  test("fewer distinct values than k is rejected loudly") {
    intercept[IllegalArgumentException] {
      Jenks.naturalBreaks(Seq(1L, 1L, 2L).toDF("v"), col("v"), k = 3)
        .collect()
    }
  }
}

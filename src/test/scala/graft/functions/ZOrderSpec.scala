package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Morton interleave correctness + the layout property that justifies it:
  * z-sorted bins bound EVERY dimension, a single-column sort only its own.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def mortonRef(x: Long, y: Long, bits: Int): Long = {
    var z = 0L
    var b = 0
    while (b < bits) {
      z |= ((x >> b) & 1L) << (2 * b)
      z |= ((y >> b) & 1L) << (2 * b + 1)
      b += 1
    }
    z
  }

  test("interleave matches the local Morton reference; SQL twin agrees") {
    import spark.implicits._
    val pts = for (x <- 0L until 40L; y <- Seq(0L, 1L, 7L, 31L, 999L))
      yield (x, y)
    val df = pts.toDF("x", "y")
      .withColumn("z", ZOrder.interleave(Seq(col("x"), col("y")), bitsPerDim = 16))
      .withColumn("zsql", expr(ZOrder.interleaveSql(Seq("x", "y"), 16)))
    df.collect().foreach { r =>
      val (x, y, z, zsql) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(z === mortonRef(x, y, 16), s"($x,$y)")
      assert(zsql === z, s"SQL twin diverges at ($x,$y)")
    }
  }

  test("z-sorted bins bound both dimensions; x-sorted bins do not bound y") {
    import spark.implicits._
    // full 64×64 grid → 16 z-bins of 256 rows each are 16×16 quadrants
    val grid = (for (x <- 0L until 64L; y <- 0L until 64L) yield (x, y))
      .toDF("x", "y")
      .withColumn("z", ZOrder.interleave(Seq(col("x"), col("y")), bitsPerDim = 6))
    def binRanges(orderCol: String): Seq[(Long, Long)] = {
      val sorted = grid.orderBy(col(orderCol)).collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      sorted.grouped(256).map { bin =>
        val xs = bin.map(_._1); val ys = bin.map(_._2)
        (xs.max - xs.min, ys.max - ys.min)
      }.toSeq
    }
    val zBins = binRanges("z")
    assert(zBins.forall { case (rx, ry) => rx == 15 && ry == 15 },
      s"z bins must be 16×16 quadrants, got $zBins")
    val xBins = binRanges("x")
    assert(xBins.forall { case (_, ry) => ry == 63 },
      "single-column sort leaves the other dimension unbounded per bin")
  }

  test("binByBoundaries maps values into [0, nBins) by first boundary ≥ value") {
    import spark.implicits._
    val bounds = Array(10.0, 20.0, 30.0)
    val got = Seq(5.0, 10.0, 15.0, 20.5, 30.0, 31.0).toDF("v")
      .withColumn("bin", ZOrder.binByBoundaries(col("v"), bounds))
      .orderBy("v").select("bin").collect().map(_.getInt(0)).toSeq
    assert(got === Seq(0, 0, 1, 2, 2, 3))
  }

  test("interleave rejects layouts that overflow a positive BIGINT") {
    intercept[IllegalArgumentException] {
      ZOrder.interleave(Seq(lit(1L), lit(2L)), bitsPerDim = 32)
    }
    intercept[IllegalArgumentException] {
      ZOrder.interleave(Seq.empty, bitsPerDim = 8)
    }
  }
}

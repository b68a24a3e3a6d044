package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** DTW against hand-computed DP tables and alignment identities. */
class TimeWarpSpec extends AnyFunSuite {

  test("identical series warp at zero cost") {
    assert(TimeWarp.dtw(Seq(3L, 1L, 4L, 1L, 5L), Seq(3L, 1L, 4L, 1L, 5L)) == 0L)
  }

  test("hand-computed DP table: [1,2,3] vs [2,3,4] costs 2") {
    assert(TimeWarp.dtw(Seq(1L, 2L, 3L), Seq(2L, 3L, 4L)) == 2L)
  }

  test("a shifted spike aligns at zero cost where Euclidean pays 10") {
    val a = Seq(0L, 0L, 5L, 0L, 0L)
    val b = Seq(0L, 5L, 0L, 0L, 0L)
    assert(TimeWarp.dtw(a, b) == 0L)
    assert(a.zip(b).map { case (x, y) => math.abs(x - y) }.sum == 10L)
  }

  test("symmetry and the degenerate single-point series") {
    assert(TimeWarp.dtw(Seq(1L, 5L, 9L), Seq(2L, 2L)) ==
      TimeWarp.dtw(Seq(2L, 2L), Seq(1L, 5L, 9L)))
    // single point vs series: every element pays its distance to the point
    assert(TimeWarp.dtw(Seq(3L), Seq(1L, 2L, 3L)) == 3L)
  }

  test("empty series are rejected loudly") {
    intercept[IllegalArgumentException] { TimeWarp.dtw(Nil, Seq(1L)) }
  }
}

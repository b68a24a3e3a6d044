package graft.functions

import org.apache.spark.sql.expressions.UserDefinedFunction
import org.apache.spark.sql.functions.udf

/** Dynamic time warping distance between two integer series (Sakoe–Chiba
  * 1978 formulation, |a_i − b_j| cost, no band constraint).
  *
  * Deliberately integer-only: over count profiles the whole DP is exact
  * Long arithmetic, so the DuckDB oracle (a recursive CTE running the
  * identical row-major DP with a sliding 25-cell window) matches
  * bit-for-bit with no float-parity reasoning at all.
  *
  * Scale: the UDF runs per PAIR of bounded profiles (e.g. 24-point
  * hourly shapes) — O(n·m) per pair with n, m fixed and small; the pair
  * set itself comes from a bounded profile table, never raw rows.
  */
object TimeWarp {

  def dtw(a: scala.collection.Seq[Long], b: scala.collection.Seq[Long]): Long = {
    require(a.nonEmpty && b.nonEmpty, "DTW needs non-empty series")
    val n = a.length
    val m = b.length
    val prev = new Array[Long](m)
    val cur = new Array[Long](m)
    var j = 0
    var acc = 0L
    while (j < m) { // first row: only left moves
      acc += math.abs(a(0) - b(j)); prev(j) = acc; j += 1
    }
    var i = 1
    while (i < n) {
      cur(0) = prev(0) + math.abs(a(i) - b(0))
      j = 1
      while (j < m) {
        val best = math.min(math.min(prev(j), prev(j - 1)), cur(j - 1))
        cur(j) = math.abs(a(i) - b(j)) + best
        j += 1
      }
      System.arraycopy(cur, 0, prev, 0, m)
      i += 1
    }
    prev(m - 1)
  }

  val dtwUdf: UserDefinedFunction =
    udf((a: scala.collection.Seq[Long], b: scala.collection.Seq[Long]) => dtw(a, b))
}

package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke over the full declared inventory at sf0.001: every query executes;
  * queries/oracleSql contracts hold. (Exact value correctness is the driver's
  * DuckDB gate, pre-validated by tools/compare.py.)
  */
class QueriesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  private val sf = "/root/testdata/sf0.001"

  test("flagship entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries; headline queries exist") {
    assert(SparkEntry.oracleSql.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.headline.toSet.subsetOf(SparkEntry.queries.keySet))
    assert(SparkEntry.oracleSql.size >= 30)
  }

  for ((name, fn) <- SparkEntry.all.toSeq.sortBy(_._1)) {
    test(s"$name executes at sf0.001") {
      val df = fn.fn(spark, sf)
      assert(df.columns.nonEmpty)
      assert(df.count() >= 0)
    }
  }
}

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

  // Round-9 sweep gate (VERDICT r8 task 2): the dimension-profile rank-cut
  // family must route every global rank through ScaleOps.globalRowNumber —
  // an UNPARTITIONED row_number()/rank() window is the single-partition
  // sort that dies at 100× the dimension size. The logical plan is the
  // stable surface to assert on (the physical plan hides behind AQE query
  // stages): no Window node with an empty partitionSpec may survive
  // optimization anywhere in these queries' visible lineage. (The
  // globalRowNumber internals window by __pid — a nonempty spec — and the
  // primitive itself is physical-plan-gated in ScaleOpsSpec.)
  for (name <- Seq("qjh_kraljic", "qjj_sourcing_risk",
      "qjk_supplier_switching", "qj3_alive_score", "qke_persistence",
      "qkj_runner_repeater")) {
    test(s"$name plans no unpartitioned window (rank-cut sweep gate)") {
      val df = SparkEntry.all(name).fn(spark, sf)
      val bad = df.queryExecution.optimizedPlan.collect {
        case w: org.apache.spark.sql.catalyst.plans.logical.Window
            if w.partitionSpec.isEmpty => w
      }
      assert(bad.isEmpty,
        s"unpartitioned window (global-rank scale-killer) in $name:\n" +
          bad.mkString("\n"))
    }
  }
}

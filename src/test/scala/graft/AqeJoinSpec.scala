package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** AQE runtime re-planning evidence: a join whose build side only becomes
  * broadcast-sized AFTER a selective filter (static size estimates see the
  * full relation) must be planned as a sort-merge join initially and
  * converted to a broadcast join by adaptive execution at run time — the
  * mechanism SCALE.md's "AQE-managed fact-fact joins" claims lean on.
  */
class AqeJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("selective non-key filter flips SMJ to broadcast at runtime") {
    // two DISTINCT tables and a NON-join-key filter: a join-key predicate
    // would be inferred onto the fact side and shrink the static estimate
    // of both inputs — the first draft of this spec proved exactly that
    val li = Tables(spark, "/root/testdata/sf0.01", "lineitem")
      .select(col("l_orderkey"), col("l_quantity"))
    val dim = Tables(spark, "/root/testdata/sf0.01", "orders")
      .filter(col("o_totalprice") < 20000.0) // runtime-small, static-big
      .select(col("o_orderkey"), col("o_totalprice"))
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "32KB")
      val joined = li.join(dim, col("l_orderkey") === col("o_orderkey"))
        .agg(count(lit(1)).as("n"))
      val before = joined.queryExecution.executedPlan.toString
      assert(before.contains("SortMergeJoin"),
        s"expected a static SMJ plan:\n$before")
      val n = joined.collect()(0).getLong(0)
      val after = joined.queryExecution.executedPlan.toString
      assert(after.contains("BroadcastHashJoin"),
        s"runtime plan still merge-joins a broadcast-sized side:\n$after")
      assert(n > 0)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }
}

package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Snapshot diff: add/remove/change classification, null-safe column
  * attribution, multi-column keys, input validation, and partition
  * invariance (the full-outer join must not depend on input layout).
  */
class TableDiffSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def base = Seq(
    (1L, "a", Some(10)), // unchanged
    (2L, "b", Some(20)), // changed: v 20 -> 21
    (3L, "c", None),     // changed: null -> 30
    (4L, "d", Some(40)), // removed
    (6L, "f", None)      // unchanged (null == null)
  ).toDF("k", "s", "v")

  private def next = Seq(
    (1L, "a", Some(10)),
    (2L, "b", Some(21)),
    (3L, "c", Some(30)),
    (5L, "e", Some(50)), // added
    (6L, "f", None)
  ).toDF("k", "s", "v")

  private def run() =
    TableDiff.diff(base, next, Seq("k"), Seq("s", "v"))
      .orderBy("k")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))

  test("classifies added, removed, changed; drops unchanged rows") {
    assert(run().toSeq == Seq(
      (2L, "changed", "v"),
      (3L, "changed", "v"),
      (4L, "removed", ""),
      (5L, "added", "")))
  }

  test("null vs value is a change; null vs null is not") {
    val out = run().map { case (k, c, _) => k -> c }.toMap
    assert(out.get(3L).contains("changed")) // null -> 30
    assert(!out.contains(6L))               // null == null: unchanged
  }

  test("changed_columns lists every differing column alphabetically") {
    val b = Seq((1L, "x", 1, "p")).toDF("k", "b", "a", "c")
    val n = Seq((1L, "y", 2, "p")).toDF("k", "b", "a", "c")
    val out = TableDiff.diff(b, n, Seq("k"), Seq("b", "a", "c")).collect()
    assert(out.length == 1)
    assert(out.head.getString(2) == "a,b")
  }

  test("multi-column keys join on the full tuple") {
    val b = Seq((1L, "x", 10), (1L, "y", 20)).toDF("k1", "k2", "v")
    val n = Seq((1L, "x", 11), (2L, "y", 20)).toDF("k1", "k2", "v")
    val out = TableDiff.diff(b, n, Seq("k1", "k2"), Seq("v"))
      .orderBy("k1", "k2")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(out.toSeq == Seq(
      (1L, "x", "changed"),
      (1L, "y", "removed"),
      (2L, "y", "added")))
  }

  test("refuses missing columns and reserved scratch names") {
    intercept[IllegalArgumentException] {
      TableDiff.diff(base, next, Seq("nope"), Seq("v"))
    }
    intercept[IllegalArgumentException] {
      TableDiff.diff(base.withColumn("__b", lit(1)), next, Seq("k"), Seq("v"))
    }
    intercept[IllegalArgumentException] {
      TableDiff.diff(base, next, Seq("k"), Seq.empty)
    }
  }

  test("bucketed snapshots diff with zero Exchange below the join") {
    spark.sql("DROP TABLE IF EXISTS diff_base_b")
    spark.sql("DROP TABLE IF EXISTS diff_next_b")
    base.write.bucketBy(4, "k").sortBy("k").mode("overwrite")
      .saveAsTable("diff_base_b")
    next.write.bucketBy(4, "k").sortBy("k").mode("overwrite")
      .saveAsTable("diff_next_b")
    val prevT = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevA = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val d = TableDiff.diff(spark.table("diff_base_b"),
        spark.table("diff_next_b"), Seq("k"), Seq("s", "v"))
      val plan = d.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), plan)
      val sub = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!sub.contains("Exchange"),
        s"bucketed snapshot diff still shuffles:\n$plan")
      // and the result is the same diff
      val got = d.orderBy("k").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      assert(got.toSeq == run().toSeq)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevT)
      spark.conf.set("spark.sql.adaptive.enabled", prevA)
      spark.sql("DROP TABLE IF EXISTS diff_base_b")
      spark.sql("DROP TABLE IF EXISTS diff_next_b")
    }
  }

  test("partition invariance: layout does not change the diff") {
    val a = run().toSeq
    val shuffled = TableDiff.diff(
        base.repartition(7, col("v")), next.repartition(3, col("s")),
        Seq("k"), Seq("s", "v"))
      .orderBy("k")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(shuffled.toSeq == a)
  }
}

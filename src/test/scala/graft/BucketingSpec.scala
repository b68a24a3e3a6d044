package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Co-located joins via bucketing: both fact tables bucketed+sorted on the
  * join key join with NO shuffle exchange on either side — the layout that
  * turns the 100 TB fact-fact join from a full-network shuffle into local
  * merges (SCALE.md "co-bucketing both facts by orderkey").
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("bucketed fact-fact join plans without shuffle exchanges") {
    val sf = "/root/testdata/sf0.001"
    spark.sql("DROP TABLE IF EXISTS li_bucketed")
    spark.sql("DROP TABLE IF EXISTS o_bucketed")
    Tables(spark, sf, "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("li_bucketed")
    Tables(spark, sf, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("o_bucketed")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
    try {
      // force a sort-merge join so the shuffle question is observable
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      val joined = spark.table("li_bucketed")
        .join(spark.table("o_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"))
      // everything below the join (its two inputs) must be shuffle-free:
      // the bucket layout already satisfies the required distribution
      val joinSubtree = plan.substring(plan.indexOf("SortMergeJoin"))
      assert(!joinSubtree.contains("Exchange"), s"unexpected shuffle in:\n$plan")
      val n = joined.collect().map(_.getAs[Long]("n")).sum
      assert(n == Tables(spark, sf, "lineitem").count())
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS o_bucketed")
    }
  }

  test("Warehouse.writeBucketed: q03-shaped fact-fact join over the " +
      "warehouse layout is exchange-free below the join and result-exact") {
    val sf = "/root/testdata/sf0.001"
    val root = java.nio.file.Files.createTempDirectory("wh-bucketed").toFile
    val li = Tables(spark, sf, "lineitem")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val o = Tables(spark, sf, "orders")
      .select("o_orderkey", "o_orderstatus")
    spark.sql("DROP TABLE IF EXISTS wh_li")
    spark.sql("DROP TABLE IF EXISTS wh_o")
    try {
      sources.Warehouse.writeBucketed(li, "wh_li", "l_orderkey", 8,
        path = Some(new java.io.File(root, "li").toString))
      sources.Warehouse.writeBucketed(o, "wh_o", "o_orderkey", 8,
        path = Some(new java.io.File(root, "o").toString))

      val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
      val prevAqe = spark.conf.get("spark.sql.adaptive.enabled")
      try {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        // q02/q03 core: revenue per order over the lineitem⋈orders equi-join
        def revenue(l: org.apache.spark.sql.DataFrame,
            r: org.apache.spark.sql.DataFrame) =
          l.join(r, col("l_orderkey") === col("o_orderkey"))
            .groupBy(col("o_orderkey"), col("o_orderstatus"))
            .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
              .cast("decimal(18,6)")).cast("double").as("revenue"))
        val bucketed = revenue(spark.table("wh_li"), spark.table("wh_o"))
        val plan = bucketed.queryExecution.executedPlan.toString
        assert(plan.contains("SortMergeJoin"), plan)
        val joinSubtree = plan.substring(plan.indexOf("SortMergeJoin"))
        assert(!joinSubtree.contains("Exchange"),
          s"bucketed warehouse join still shuffles:\n$plan")
        // the grouping key starts with the bucket key, so even the
        // aggregation above the join rides the bucket distribution:
        // the WHOLE plan is exchange-free
        assert(!plan.contains("Exchange"),
          s"aggregate above the co-bucketed join shuffled:\n$plan")

        val expect = revenue(li, o).collect()
          .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
        val got = bucketed.collect()
          .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
        assert(got == expect)
      } finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
        spark.conf.set("spark.sql.adaptive.enabled", prevAqe)
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS wh_li")
      spark.sql("DROP TABLE IF EXISTS wh_o")
      org.apache.commons.io.FileUtils.deleteQuietly(root)
    }
  }

  test("writeBucketed validates bucket count") {
    val df = spark.range(1).toDF("k")
    intercept[IllegalArgumentException] {
      sources.Warehouse.writeBucketed(df, "wh_bad", "k", 0)
    }
  }
}

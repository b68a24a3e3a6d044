package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScaleOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("exactDistinctCount equals countDistinct") {
    import spark.implicits._
    val df = (1 to 5000).map(i => (s"k${i % 3}", i % 97)).toDF("k", "v")
    val got = ScaleOps.exactDistinctCount(df, Seq("k"), col("v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val expected = df.groupBy("k").agg(countDistinct(col("v")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == expected)
  }

  test("saltedSum equals plain sum, any salt count") {
    import spark.implicits._
    val df = (1 to 10000).map(i => (s"k${i % 2}", i.toLong)).toDF("k", "v")
    for (salts <- Seq(1, 7, 64)) {
      val got = ScaleOps.saltedSum(df, Seq("k"), col("v"), salts)
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val expected = df.groupBy("k").agg(sum(col("v")).as("s"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      assert(got == expected, s"salts=$salts")
    }
  }

  test("globalRowNumber equals one-partition window row_number") {
    import spark.implicits._
    val df = (1 to 4003).map(i => ((i * 7919) % 4003, i.toLong))
      .toDF("k", "id").repartition(13)
    val expected = df
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window.orderBy(col("k"), col("id"))).cast("long"))
      .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    for (parts <- Seq(1, 5, 32)) {
      val got = ScaleOps.globalRowNumber(df, Seq(col("k"), col("id")),
        "rn", numPartitions = parts)
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
      assert(got == expected, s"parts=$parts")
    }
  }

  test("globalNtile equals SQL NTILE, including n<k, and plans no single-partition exchange") {
    import spark.implicits._
    for ((n, k) <- Seq((4003, 5), (4003, 7), (3, 5))) {
      val df = (1 to n).map(i => ((i * 7919) % n, i.toLong)).toDF("k", "id")
        .repartition(7)
      val expected = df
        .withColumn("b", ntile(k).over(
          org.apache.spark.sql.expressions.Window.orderBy(col("k").desc, col("id"))))
        .collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getInt(2)).toMap
      val res = ScaleOps.globalNtile(df, Seq(col("k").desc, col("id")), k, "b",
        numPartitions = 8)
      val got = res.collect().map(r => (r.getInt(0), r.getLong(1)) -> r.getInt(2)).toMap
      assert(got == expected, s"n=$n k=$k")
      val plan = res.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange SinglePartition"),
        s"global-rank scale-killer in plan:\n$plan")
    }
  }

  test("globalRunningSum equals one-partition window sum exactly (DECIMAL)") {
    import spark.implicits._
    val df = (1 to 2500)
      .map(i => (i.toLong, BigDecimal((i * 31 % 997) + 0.25).setScale(2)))
      .toDF("id", "v")
      .withColumn("v", col("v").cast("decimal(18,2)"))
      .repartition(11)
    val expected = df
      .withColumn("c", sum(col("v")).over(
        org.apache.spark.sql.expressions.Window.orderBy(col("v").desc, col("id"))
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.currentRow)).cast("string"))
      .collect().map(r => r.getLong(0) -> BigDecimal(r.getString(2))).toMap
    val got = ScaleOps.globalRunningSum(df, Seq(col("v").desc, col("id")),
      col("v"), "c", numPartitions = 6)
      .withColumn("c", col("c").cast("string"))
      .collect().map(r => r.getLong(0) -> BigDecimal(r.getString(2))).toMap
    assert(got == expected)
  }

  test("groupedGlobalRunningSum equals per-group window sum under group skew") {
    import spark.implicits._
    // one huge group, two small ones
    val rows = (1 to 3000).map { i =>
      val g = if (i % 100 == 0) s"small${i % 2}" else "huge"
      (g, i.toLong, BigDecimal((i * 13 % 500) + 0.75).setScale(2))
    }
    val df = rows.toDF("g", "id", "v")
      .withColumn("v", col("v").cast("decimal(18,2)")).repartition(9)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("g")).orderBy(col("v"), col("id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val expected = df.withColumn("c", sum(col("v")).over(w).cast("string"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> BigDecimal(r.getString(3))).toMap
    val got = ScaleOps.groupedGlobalRunningSum(df, Seq("g"),
      Seq(col("v"), col("id")), col("v"), "c", numPartitions = 7)
      .withColumn("c", col("c").cast("string"))
      .collect().map(r => (r.getString(0), r.getLong(1)) -> BigDecimal(r.getString(3))).toMap
    assert(got == expected)
  }

  test("minhash bucket cap drops pathological buckets but keeps near-dups") {
    import spark.implicits._
    // 30 identical docs (one giant bucket) + one genuine near-dup pair
    val base = (1 to 100).map(i => s"uniq$i word$i tok$i").mkString(" ")
    val near = base.split(" ").drop(5).mkString(" ")
    val boiler = (1 to 30).map(i => (100L + i, "same boilerplate text repeated here " * 10))
    val docs = (Seq((1L, base), (2L, near)) ++ boiler).toDF("doc_id", "text")
    val pairs = Dedup.minhashCandidatePairs(docs, "doc_id", "text",
      minEstJaccard = 0.5, maxBucketSize = 10).collect()
    val pairSet = pairs.map(r => Set(r.getLong(0), r.getLong(1))).toSet
    assert(pairSet.contains(Set(1L, 2L))) // near-dup survives
    assert(!pairSet.exists(_.exists(_ > 100L))) // boilerplate bucket dropped
  }
}

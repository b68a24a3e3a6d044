package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SegmentSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("rfm scores match a direct one-partition NTILE computation") {
    import spark.implicits._
    val orders = (1 to 900).map { i =>
      val cust = i % 90
      (cust.toLong, (i * 3600000L) % 86400000L, BigDecimal((i % 50) + 0.5).setScale(2))
    }.toDF("cust", "ts", "v").withColumn("v", col("v").cast("decimal(18,2)"))
    val got = Segment.rfm(orders, "cust", col("ts"), col("v"), k = 4)
    val w = org.apache.spark.sql.expressions.Window
    val base = orders.groupBy("cust").agg(max("ts").as("recency_ms"),
      count(lit(1)).as("frequency"), sum("v").as("mon"))
    val expected = base
      .withColumn("r", ntile(4).over(w.orderBy(col("recency_ms").desc, col("cust"))))
      .withColumn("f", ntile(4).over(w.orderBy(col("frequency").desc, col("cust"))))
      .withColumn("m", ntile(4).over(w.orderBy(col("mon").desc, col("cust"))))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(4), r.getInt(5), r.getInt(6))).toMap
    val gotMap = got.collect().map(r => r.getAs[Long]("cust") ->
      (r.getAs[Int]("r_score"), r.getAs[Int]("f_score"), r.getAs[Int]("m_score"))).toMap
    assert(gotMap == expected)
    // segment code is the three digits
    got.collect().foreach { r =>
      assert(r.getAs[Int]("segment") ==
        r.getAs[Int]("r_score") * 100 + r.getAs[Int]("f_score") * 10 + r.getAs[Int]("m_score"))
    }
  }

  test("abcClassify cumulative shares are exact and classes split at the cuts") {
    import spark.implicits._
    // values 100, 60, 20, 15, 5 → total 200; cumulative shares .5 .8 .9 .975 1.0
    val df = Seq((1L, "100.00"), (2L, "60.00"), (3L, "20.00"), (4L, "15.00"),
      (5L, "5.00")).toDF("k", "v")
      .withColumn("v", col("v").cast("decimal(18,2)"))
    val got = Segment.abcClassify(df, Seq("k"), col("v"))
      .orderBy(col("k"))
      .collect().map(r => (r.getAs[Long]("k"), r.getAs[Double]("value_share"),
        r.getAs[String]("abc_class")))
    assert(got.toSeq == Seq((1L, 0.5, "A"), (2L, 0.8, "A"), (3L, 0.9, "B"),
      (4L, 0.975, "C"), (5L, 1.0, "C")))
  }

  test("abcClassify is partition-invariant") {
    import spark.implicits._
    val df = (1 to 500).map(i => (i.toLong, BigDecimal((i * 17) % 300 + 0.25).setScale(2)))
      .toDF("k", "v").withColumn("v", col("v").cast("decimal(18,2)"))
    val a = Segment.abcClassify(df.repartition(1), Seq("k"), col("v"))
      .orderBy("k").collect().map(_.toString).toSeq
    val b = Segment.abcClassify(df.repartition(17), Seq("k"), col("v"))
      .orderBy("k").collect().map(_.toString).toSeq
    assert(a == b)
  }
}

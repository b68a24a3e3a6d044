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

package graft.operators

import graft.{SparkTestBase, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class MutualNnSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def exactMutual(e: org.apache.spark.sql.DataFrame): Set[(Long, Long)] = {
    val top1 = VectorSearch.knnJoinViaAggregator(
      e.select(col("vec_id").as("q_id"), col("embedding").as("qv")),
      e.select(col("vec_id").as("c_id"), col("embedding").as("cv")),
      "q_id", "qv", "c_id", "cv", k = 1)
    val fwd = top1.select(col("query_id").as("a"), col("neighbor_id").as("b"))
    val rev = top1.select(col("query_id").as("rb"), col("neighbor_id").as("ra"))
    fwd.join(rev, fwd("a") === rev("ra") && fwd("b") === rev("rb"))
      .filter(col("a") < col("b"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("saturating tables recover the exact reciprocal pairs") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val exact = exactMutual(e)
    val got = VectorSearch.mutualNearestLsh(e, "vec_id", "embedding",
      nBits = 1, nTables = 12)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == exact)
    assert(got.nonEmpty)
  }

  test("production working point returns only genuine reciprocal-collision pairs") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val got = VectorSearch.mutualNearestLsh(e, "vec_id", "embedding",
      nBits = 2, nTables = 4).collect()
    // each id appears in at most one mutual pair, and scores are valid
    val ids = got.flatMap(r => Seq(r.getLong(0), r.getLong(1)))
    assert(ids.distinct.length == ids.length)
    assert(got.forall(r => math.abs(r.getDouble(2)) <= 1.0))
  }

  test("partition invariance") {
    val e = Tables(spark, "/root/testdata/sf0.001", "embeddings")
    val a = VectorSearch.mutualNearestLsh(e.repartition(1), "vec_id", "embedding")
      .orderBy("vec_a").collect().map(_.toSeq).toSeq
    val b = VectorSearch.mutualNearestLsh(e.repartition(13), "vec_id", "embedding")
      .orderBy("vec_a").collect().map(_.toSeq).toSeq
    assert(a == b)
  }
}

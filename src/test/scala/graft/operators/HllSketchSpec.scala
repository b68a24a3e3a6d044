package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** HyperLogLog: accuracy envelope, multiplicity insensitivity, register
  * mergeability, partition invariance, and the empty-input fixpoint.
  */
class HllSketchSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def est(keys: Seq[Long]): Double =
    HllSketch.estimate(HllSketch.registers(keys.toDF("k"), "k"))
      .collect()(0).getAs[Double]("est_distinct")

  test("estimates land inside the p=10 accuracy envelope") {
    // standard error 1.04/sqrt(1024) ~ 3.25%; assert a generous 4 sigma
    for (n <- Seq(500, 5000, 20000)) {
      val e = est((1L to n.toLong).map(_ * 2654435761L)) // spread keys
      assert(math.abs(e - n) < n * 0.13, s"n=$n est=$e")
    }
  }

  test("duplicates do not move a single register") {
    val keys = (1L to 300L).toSeq
    val a = HllSketch.registers(keys.toDF("k"), "k")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val b = HllSketch.registers((keys ++ keys ++ keys).toDF("k"), "k")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(a == b)
  }

  test("registers merge by max: sketch(A ∪ B) = max-merge of the parts") {
    val a = (1L to 400L).toSeq
    val b = (200L to 700L).toSeq
    val merged = HllSketch.registers(a.toDF("k"), "k")
      .unionByName(HllSketch.registers(b.toDF("k"), "k"))
      .groupBy("bucket").agg(max(col("rho")).as("rho"))
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val whole = HllSketch.registers((a ++ b).toDF("k"), "k")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(merged == whole)
  }

  test("registers are partition-invariant and rho/bucket stay in range") {
    val df = (1L to 2000L).toDF("k")
    val a = HllSketch.registers(df, "k")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    val b = HllSketch.registers(df.repartition(17), "k")
      .collect().map(r => (r.getInt(0), r.getInt(1))).toSet
    assert(a == b)
    assert(a.forall { case (bkt, rho) =>
      bkt >= 0 && bkt < HllSketch.M && rho >= 1 && rho <= HllSketch.RhoEmpty })
  }

  test("the empty sketch estimates exactly zero") {
    assert(est(Seq.empty) == 0.0)
  }
}

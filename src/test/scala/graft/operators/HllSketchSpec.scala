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

  test("grouped sketch: each group equals its own ungrouped sketch") {
    val rows = (1L to 500L).map(("a", _)) ++ (1L to 80L).map(("b", _)) ++
      (400L to 900L).map(("c", _))
    val df = rows.toDF("grp", "k")
    val grouped = HllSketch.groupedEstimate(
        HllSketch.groupedRegisters(df, "grp", "k"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("est_distinct")).toMap
    for ((g, n) <- Seq(("a", 500), ("b", 80), ("c", 501))) {
      val solo = HllSketch.estimate(
          HllSketch.registers(df.filter(col("grp") === g).select("k"), "k"))
        .collect()(0).getAs[Double]("est_distinct")
      assert(grouped(g) == solo, s"group $g") // bit-identical to the solo sketch
      assert(math.abs(grouped(g) - n) < n * 0.13)
    }
  }

  test("inclusion-exclusion over merged sketches tracks the true overlap") {
    val a = (1L to 4000L).toSeq
    val b = (3001L to 8000L).toSeq
    val ra = HllSketch.registers(a.toDF("k"), "k")
    val rb = HllSketch.registers(b.toDF("k"), "k")
    val ru = ra.unionByName(rb)
      .groupBy("bucket").agg(max(col("rho")).as("rho"))
    def e(r: org.apache.spark.sql.DataFrame): Double =
      HllSketch.estimate(r).collect()(0).getAs[Double]("est_distinct")
    val inter = e(ra) + e(rb) - e(ru)
    // true intersection 1000; the union's ~3.25% sigma amplifies through
    // the three-term difference — assert a wide but meaningful band
    assert(math.abs(inter - 1000.0) < 900.0, s"est_inter=$inter")
    assert(math.abs(e(ru) - 8000.0) < 8000 * 0.13)
  }
}

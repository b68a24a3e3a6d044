package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** PSI drift: hand-computed values, zero drift on identical slices,
  * one-sided categories stay finite via smoothing, numeric bin edges and
  * outlier clamping, null exclusion, partition invariance.
  */
class DriftSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def catMap(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => (r.getString(0),
      (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4),
        r.getDouble(5)))).toMap

  test("hand-computed PSI on a two-category shift") {
    val ref = (Seq.fill(80)("a") ++ Seq.fill(20)("b")).toDF("v")
    val cur = (Seq.fill(50)("a") ++ Seq.fill(50)("b")).toDF("v")
    val got = catMap(Drift.categoricalDrift(ref, cur, "v", smoothing = 0.5))
    val (nrA, ncA, prA, pcA, psiA) = got("a")
    assert(nrA == 80L && ncA == 50L)
    val expPrA = 80.5 / 101.0
    val expPcA = 50.5 / 101.0
    assert(math.abs(prA - expPrA) < 1e-12)
    assert(math.abs(pcA - expPcA) < 1e-12)
    assert(math.abs(psiA - (expPcA - expPrA) * math.log(expPcA / expPrA)) < 1e-12)
    // total PSI positive on a real shift
    val total = got.values.map(_._5).sum
    assert(total > 0.1)
  }

  test("identical slices have psi_term exactly 0 per category") {
    val df = (Seq.fill(30)("x") ++ Seq.fill(70)("y")).toDF("v")
    val got = catMap(Drift.categoricalDrift(df, df, "v"))
    assert(got.size == 2)
    got.values.foreach { case (_, _, pr, pc, psi) =>
      assert(pr == pc && psi == 0.0)
    }
  }

  test("category present on one side only stays finite and contributes") {
    val ref = Seq("a", "a", "b").toDF("v")
    val cur = Seq("a", "a", "c").toDF("v")
    val got = catMap(Drift.categoricalDrift(ref, cur, "v"))
    assert(got.keySet == Set("a", "b", "c"))
    val (nrB, ncB, _, _, psiB) = got("b")
    assert(nrB == 1L && ncB == 0L)
    assert(!psiB.isNaN && !psiB.isInfinite && psiB > 0.0)
  }

  test("nulls are excluded from counts and totals") {
    val ref = Seq(Some("a"), Some("a"), None, Some("b")).toDF("v")
    val cur = Seq(Some("a"), None, None, Some("b")).toDF("v")
    val got = catMap(Drift.categoricalDrift(ref, cur, "v"))
    assert(got("a")._1 == 2L && got("a")._2 == 1L)
    assert(got.values.map(_._1).sum == 3L) // null never counted
  }

  test("binned drift: edges, outlier clamp into end bins") {
    val ref = Seq(-5.0, 0.0, 9.999, 10.0, 55.0, 99.9, 150.0).toDF("x")
    val cur = Seq(5.0, 5.0, 5.0).toDF("x")
    // lo=0, width=10, 10 bins over [0, 100): -5 clamps to bin 0, 150 to bin 9
    val got = Drift.binnedDrift(ref, cur, "x", lo = 0.0, width = 10.0, nBins = 10)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(got(0L) == ((3L, 3L))) // -5, 0, 9.999 | three 5.0s
    assert(got(1L)._1 == 1L)      // 10.0
    assert(got(5L)._1 == 1L)      // 55
    assert(got(9L) == ((2L, 0L))) // 99.9 and clamped 150
  }

  test("smoothing must be positive; bin params validated") {
    val df = Seq("a").toDF("v")
    intercept[IllegalArgumentException](
      Drift.categoricalDrift(df, df, "v", smoothing = 0.0))
    val n = Seq(1.0).toDF("x")
    intercept[IllegalArgumentException](
      Drift.binnedDrift(n, n, "x", 0.0, 0.0, 10))
    intercept[IllegalArgumentException](
      Drift.binnedDrift(n, n, "x", 0.0, 1.0, 1))
  }

  test("partition invariance") {
    val ref = (1 to 200).map(i => s"c${i % 7}").toDF("v")
    val cur = (1 to 150).map(i => s"c${i % 5}").toDF("v")
    val a = catMap(Drift.categoricalDrift(ref.repartition(1), cur.repartition(1), "v"))
    val b = catMap(Drift.categoricalDrift(ref.repartition(8), cur.repartition(3), "v"))
    assert(a == b)
  }
}

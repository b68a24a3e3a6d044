package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** k-anonymity class accounting against hand counts, and the
  * deterministic-Laplace DP release: reproducible per salt, redrawn
  * across salts, clamped non-negative, noise at the 1/ε scale.
  */
class PrivacySpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  test("k-anonymity: class sizes, achieved k and suppression by hand") {
    // classes: (a,1)x5, (a,2)x2, (b,1)x3  => k_achieved 2
    val rows = Seq.fill(5)(("a", 1)) ++ Seq.fill(2)(("a", 2)) ++
      Seq.fill(3)(("b", 1))
    val out = Privacy.kAnonymityProfile(rows.toDF("q1", "q2"),
      Seq("q1", "q2"), k = 3).orderBy("q1", "q2").collect()
    assert(out.map(_.getAs[Long]("class_size")).toSeq == Seq(5L, 2L, 3L))
    assert(out.map(_.getAs[Boolean]("violates")).toSeq ==
      Seq(false, true, false))
    assert(out.forall(_.getAs[Long]("n_classes") == 3L))
    assert(out.forall(_.getAs[Long]("n_rows") == 10L))
    assert(out.forall(_.getAs[Long]("k_achieved") == 2L))
    assert(out.forall(_.getAs[Double]("suppression_rate") == 0.2))
  }

  test("k-anonymity: guards") {
    val df = Seq(("a", 1)).toDF("q1", "q2")
    intercept[IllegalArgumentException](
      Privacy.kAnonymityProfile(df, Nil, 3))
    intercept[IllegalArgumentException](
      Privacy.kAnonymityProfile(df, Seq("q1"), 1))
  }

  test("dp counts: reproducible per salt, redrawn across salts, clamped") {
    val df = (1 to 2000).map(i => s"g${i % 200}").toDF("g")
    val a = Privacy.dpCounts(df, "g", eps = 0.5, salt = "s1")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("noise")).toMap
    val b = Privacy.dpCounts(df, "g", eps = 0.5, salt = "s1")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("noise")).toMap
    assert(a == b) // same salt: identical release
    val c = Privacy.dpCounts(df, "g", eps = 0.5, salt = "s2")
      .collect().map(r => r.getString(0) -> r.getAs[Double]("noise")).toMap
    assert(a != c) // rotated salt: fresh noise
    val rel = Privacy.dpCounts(df, "g", eps = 0.5, salt = "s1").collect()
    assert(rel.forall(_.getAs[Double]("n_released") >= 0.0))
    // Laplace(1/eps = 2): mean |noise| should sit near 2, signs mixed
    val noises = a.values.toSeq
    val meanAbs = noises.map(math.abs).sum / noises.size
    assert(meanAbs > 0.5 && meanAbs < 8.0)
    assert(noises.count(_ < 0) > 20 && noises.count(_ > 0) > 20)
  }

  test("dp counts: clamp floors a small count with large negative noise") {
    // scan salts until some group's noise drives the release to the floor
    val df = (1 to 50).map(i => s"u$i").toDF("g") // all counts = 1
    val found = (1 to 40).exists { s =>
      Privacy.dpCounts(df, "g", eps = 0.5, salt = s"t$s").collect()
        .exists(r => r.getAs[Double]("n_released") == 0.0 &&
          r.getAs[Double]("noise") < -1.0)
    }
    assert(found, "no salt produced a clamped release — widen the scan")
  }
}

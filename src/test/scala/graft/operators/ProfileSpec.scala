package graft.operators

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

/** Table-profile contracts: per-type slot dispatch, null/distinct
  * semantics, hand-computed extremes. Driver-level hash-exactness is
  * q5f_table_profile.
  */
class ProfileSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def rowsByCol(df: org.apache.spark.sql.DataFrame) =
    df.collect().map { r =>
      r.getString(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
        Option(r.get(4)).map(_.asInstanceOf[Double]),
        Option(r.get(5)).map(_.asInstanceOf[Double]),
        Option(r.get(6)).map(_.asInstanceOf[String]),
        Option(r.get(7)).map(_.asInstanceOf[String])))
    }.toMap

  test("numeric and string columns profile into their slots, nulls counted") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, String)](
      (1L, "b"), (3L, "a"), (null, "b"), (3L, null), (7L, "c"))
      .toDF("num", "s")
    val p = rowsByCol(Profile.tableProfile(df, Seq("num", "s")))
    // num: 5 rows, 1 null, distinct {1,3,7}, min 1, max 7; string slots empty
    assert(p("num") === ((5L, 1L, 3L, Some(1.0), Some(7.0), None, None)))
    // s: 1 null, distinct {a,b,c}, min "a", max "c"; numeric slots empty
    assert(p("s") === ((5L, 1L, 3L, None, None, Some("a"), Some("c"))))
  }

  test("date/timestamp columns land in the string slots via ISO cast") {
    import spark.implicits._
    val df = Seq("2021-03-04", "1999-12-31", "2021-03-04")
      .toDF("d0").selectExpr("CAST(d0 AS DATE) AS d")
    val p = rowsByCol(Profile.tableProfile(df, Seq("d")))
    assert(p("d") === ((3L, 0L, 2L, None, None,
      Some("1999-12-31"), Some("2021-03-04"))))
  }

  test("all-null column: distinct 0, extremes absent") {
    import spark.implicits._
    val df = Seq[(Int, java.lang.Double)]((1, null), (2, null)).toDF("k", "v")
    val p = rowsByCol(Profile.tableProfile(df, Seq("v")))
    assert(p("v") === ((2L, 2L, 0L, None, None, None, None)))
  }

  test("empty table: zero counts, absent extremes") {
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("k", "s").filter("k < 0")
    val p = rowsByCol(Profile.tableProfile(df, Seq("k", "s")))
    assert(p("k") === ((0L, 0L, 0L, None, None, None, None)))
    assert(p("s") === ((0L, 0L, 0L, None, None, None, None)))
  }

  test("unknown columns refuse loudly; empty column list refuses") {
    import spark.implicits._
    val df = Seq((1, "x")).toDF("a", "b")
    assertThrows[IllegalArgumentException] {
      Profile.tableProfile(df, Seq("nope"))
    }
    assertThrows[IllegalArgumentException] {
      Profile.tableProfile(df, Seq.empty)
    }
  }

  test("keySkew: heavy keys, shares, uniform vs skewed entropy, null bucket") {
    import spark.implicits._
    // 8 'a', 1 'b', 1 null -> total 10
    val df = (Seq.fill(8)(Some("a")) ++ Seq(Some("b"), None)).toDF("k")
    val out = Profile.keySkew(df, "k", topK = 2)
      .orderBy(org.apache.spark.sql.functions.col("cnt").desc).collect()
    assert(out.length == 2)
    assert(out(0).getString(0) == "a" && out(0).getLong(1) == 8L)
    assert(out(0).getAs[Double]("share") == 0.8)
    assert(out(0).getAs[Long]("n_keys") == 3L) // null IS a key
    assert(out(0).getAs[Long]("total") == 10L)
    // entropy: -(0.8 ln 0.8 + 0.1 ln 0.1 + 0.1 ln 0.1), 9-grid terms
    val expected = Seq(0.8, 0.1, 0.1)
      .map(p => BigDecimal(-p * math.log(p))
        .setScale(9, BigDecimal.RoundingMode.HALF_UP)).sum
    assert(out(0).getAs[Double]("entropy") ==
      expected.setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
    // uniform distribution has strictly higher entropy
    val uni = (1 to 10).map(i => s"k$i").toDF("k")
    val uniH = Profile.keySkew(uni, "k", 1).collect()(0).getAs[Double]("entropy")
    assert(uniH > out(0).getAs[Double]("entropy"))
    assert(math.abs(uniH - math.log(10)) < 1e-6)
  }
}

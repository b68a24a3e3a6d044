package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  // 1000 rows of hot key 'h' + a tail, joined to a 3-keys-x-2-rows side
  private def fixtures: (DataFrame, DataFrame) = {
    import spark.implicits._
    val skewed = ((1 to 1000).map(i => ("h", i.toLong)) ++
      Seq(("a", 2000L), ("b", 2001L), ("x", 2002L), (null, 2003L)))
      .toDF("k", "v")
    val other = Seq(("h", "H1"), ("h", "H2"), ("a", "A"), ("b", "B"),
      (null.asInstanceOf[String], "N")).toDF("k", "tag")
    (skewed, other)
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("salted inner join equals the plain join, duplicates and nulls included") {
    val (skewed, other) = fixtures
    val plain = skewed.join(other, Seq("k"), "inner")
    val salted = SkewJoin.saltedEquiJoin(skewed, other, "k", nSalts = 8)
    assert(sortedRows(salted.select("k", "v", "tag"))
      == sortedRows(plain.select("k", "v", "tag")))
    assert(salted.count() == 2002) // 1000 hot rows x 2 tags + a + b
  }

  test("salted left and left_anti joins preserve outer semantics") {
    val (skewed, other) = fixtures
    for (jt <- Seq("left", "left_anti")) {
      val plain = skewed.join(other, Seq("k"), jt)
      val salted = SkewJoin.saltedEquiJoin(skewed, other, "k", nSalts = 4, jt)
      assert(sortedRows(salted) == sortedRows(plain), s"join type $jt")
    }
  }

  test("the hot key's rows actually spread across salts") {
    val (skewed, _) = fixtures
    val salts = skewed.filter(col("k") === "h")
      .withColumn("__salt",
        pmod(xxhash64(struct(col("k"), col("v"))), lit(8)).cast("int"))
      .select("__salt").distinct().count()
    assert(salts == 8, "1000 distinct rows must cover all 8 salt buckets")
  }

  test("collapseDuplicates: identical hot rows pre-aggregate, result multiset exact") {
    import spark.implicits._
    // 500 BYTE-IDENTICAL hot rows — the whole-row hash puts them all in one
    // salt bucket (documented limit); collapseDuplicates turns them into a
    // single (row, 500) aggregate before the join and re-expands after
    val dup = (Seq.fill(500)(("h", 0L)) ++ Seq(("a", 1L))).toDF("k", "v")
    val (_, other) = fixtures
    val defaultSalts = dup.filter(col("k") === "h")
      .withColumn("__salt", pmod(xxhash64(struct(col("k"), col("v"))), lit(8)).cast("int"))
      .select("__salt").distinct().count()
    assert(defaultSalts == 1L) // the documented limitation, pinned
    for (jt <- Seq("inner", "left", "left_anti")) {
      val collapsed = SkewJoin.saltedEquiJoin(dup, other, "k", nSalts = 8,
        joinType = jt, collapseDuplicates = true)
      assert(sortedRows(collapsed) == sortedRows(dup.join(other, Seq("k"), jt)),
        s"join type $jt")
    }
  }

  test("reserved internal column names are rejected loudly") {
    import spark.implicits._
    val (skewed, other) = fixtures
    val bad = skewed.withColumn("__salt", lit(1))
    intercept[IllegalArgumentException](
      SkewJoin.saltedEquiJoin(bad, other, "k", 4))
    intercept[IllegalArgumentException](
      SkewJoin.saltedEquiJoin(skewed, other.withColumn("__n", lit(1)), "k", 4))
  }

  test("map-typed columns are skipped by the salt hash, not an analysis error") {
    import spark.implicits._
    val skewed = Seq(("a", 1L), ("a", 2L), ("b", 3L))
      .toDF("k", "v").withColumn("m", map(lit("x"), col("v")))
    val other = Seq(("a", 10L), ("b", 20L)).toDF("k", "w")
    val got = SkewJoin.saltedEquiJoin(skewed, other, "k", 4)
      .select(col("k"), col("v"), col("w")).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).sorted.toSeq
    assert(got == Seq(("a", 1L, 10L), ("a", 2L, 10L), ("b", 3L, 20L)))
    // collapseDuplicates must refuse: it would have to group by the map
    intercept[IllegalArgumentException](
      SkewJoin.saltedEquiJoin(skewed, other, "k", 4, collapseDuplicates = true))
  }

  test("selectiveSalted equals the plain join; nulls ride the cold branch") {
    val (skewed, other) = fixtures
    for (jt <- Seq("inner", "left", "left_anti")) {
      val plain = skewed.join(other, Seq("k"), jt)
      val sel = SkewJoin.selectiveSalted(skewed, other, "k", Seq("h"),
        nSalts = 8, jt)
      assert(sortedRows(sel) == sortedRows(plain), s"join type $jt")
    }
  }

  test("autoSalted: CMS finds the hot key, result matches the plain join") {
    import spark.implicits._
    val skewed = (((1 to 1000).map(_ => 7L) ++ (101L to 150L))
      .zipWithIndex.map { case (k, i) => (k, i.toLong) }).toDF("k", "v")
    val other = (Seq(7L) ++ (101L to 150L)).map(k => (k, s"t$k"))
      .toDF("k", "tag")
    val (joined, hot) = SkewJoin.autoSalted(skewed, other, "k",
      threshold = 500L, nSalts = 8)
    assert(hot == Seq(7L))
    val plain = skewed.join(other, Seq("k"), "inner")
    assert(sortedRows(joined.select("k", "v", "tag"))
      == sortedRows(plain.select("k", "v", "tag")))
  }

  test("autoSalted with nothing hot falls back to one plain join") {
    import spark.implicits._
    val skewed = (1L to 100L).map(k => (k, k)).toDF("k", "v")
    val other = (1L to 100L).map(k => (k, s"t$k")).toDF("k", "tag")
    val (joined, hot) = SkewJoin.autoSalted(skewed, other, "k",
      threshold = 50L, nSalts = 8)
    assert(hot.isEmpty)
    assert(joined.count() == 100)
  }

  test("selectiveSalted refuses empty and null hot-key lists") {
    val (skewed, other) = fixtures
    intercept[IllegalArgumentException] {
      SkewJoin.selectiveSalted(skewed, other, "k", Seq.empty, 4)
    }
    intercept[IllegalArgumentException] {
      SkewJoin.selectiveSalted(skewed, other, "k", Seq("h", null), 4)
    }
  }

  test("right/full outer are rejected loudly") {
    val (skewed, other) = fixtures
    intercept[IllegalArgumentException](
      SkewJoin.saltedEquiJoin(skewed, other, "k", 4, "right"))
    intercept[IllegalArgumentException](
      SkewJoin.saltedEquiJoin(skewed, other, "k", 4, "full_outer"))
  }
}

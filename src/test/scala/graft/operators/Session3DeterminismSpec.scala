package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition invariance for the session-3 operators whose oracles pin
  * exact results: the same input under a hostile repartition must give
  * byte-identical output (the DeterminismSpec discipline — shuffle
  * placement must never leak into values).
  */
class Session3DeterminismSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def same(a: org.apache.spark.sql.DataFrame,
      b: org.apache.spark.sql.DataFrame): Unit = {
    val x = a.collect().map(_.toString).sorted.toSeq
    val y = b.collect().map(_.toString).sorted.toSeq
    assert(x == y)
  }

  test("boostedStumps2 is partition-invariant") {
    val rows = (1 to 200).map(i =>
      ((i % 13).toDouble * 7 + (i % 5), (i % 13).toDouble, (i % 5).toDouble))
    val df = rows.toDF("y", "f", "g")
    same(
      Boost.boostedStumps2(df, col("y"), "f", col("f"), "g", col("g"), 0.5),
      Boost.boostedStumps2(df.repartition(7, col("g")), col("y"),
        "f", col("f"), "g", col("g"), 0.5))
  }

  test("Shapley attribution is partition-invariant") {
    val ev = (1 to 300).map { i =>
      (i.toLong % 40, i.toLong,
        Seq("a", "b", "c", "conv")(i % 4))
    }
    val df = ev.toDF("u", "ts", "ch")
    same(
      Shapley.attribution(df, "u", "ts", "ch", col("ch") === "conv",
        Seq("a", "b", "c")),
      Shapley.attribution(df.repartition(9, col("ts")), "u", "ts", "ch",
        col("ch") === "conv", Seq("a", "b", "c")))
  }

  test("Jenks naturalBreaks is partition-invariant") {
    val df = (1 to 500).map(i => ((i * 7919) % 97).toLong).toDF("v")
    same(Jenks.naturalBreaks(df, col("v"), 4),
      Jenks.naturalBreaks(df.repartition(11), col("v"), 4))
  }

  test("rocAuc is partition-invariant") {
    val df = (1 to 400).map(i =>
      (((i * 31) % 100).toDouble, (i % 3 == 0).compareTo(false).toLong))
      .toDF("s", "y")
    same(Stats.rocAuc(df, col("s"), col("y")),
      Stats.rocAuc(df.repartition(13, col("s")), col("s"), col("y")))
  }

  test("Geo.radiusJoinCells is partition-invariant") {
    val pts = (1 to 120).map(i =>
      (i.toLong, ((i * 7919) % 120).toDouble - 60.0,
        ((i * 104729) % 360).toDouble - 180.0))
    val a = pts.toDF("a_id", "a_lat", "a_lon")
    val b = pts.map { case (i, la, lo) => (i + 1000, la, lo) }
      .toDF("b_id", "b_lat", "b_lon")
    same(
      Geo.radiusJoinCells(a, "a_lat", "a_lon", b, "b_lat", "b_lon",
        800.0, 5.0, 2, 5),
      Geo.radiusJoinCells(a.repartition(5), "a_lat", "a_lon",
        b.repartition(3), "b_lat", "b_lon", 800.0, 5.0, 2, 5))
  }
}

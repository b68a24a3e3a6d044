package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class IntervalsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private def run(rows: Seq[(String, Long, Long, Long)]) = {
    import spark.implicits._
    val df = rows.toDF("k", "s", "e", "id")
    Intervals.mergeIntervals(df, Seq("k"), col("s"), col("e"), col("id"))
      .orderBy(col("k"), col("island_seq"))
      .collect()
      .map(r => (r.getAs[String]("k"), r.getAs[Long]("island_seq"),
        r.getAs[Long]("island_start"), r.getAs[Long]("island_end"),
        r.getAs[Long]("n_intervals"), r.getAs[Long]("covered_ms")))
      .toSeq
  }

  test("overlap, touch, containment and gaps merge correctly") {
    val got = run(Seq(
      ("a", 0L, 10L, 1L),    // island 1
      ("a", 5L, 12L, 2L),    // overlaps
      ("a", 12L, 20L, 3L),   // touches (end-exclusive): still merges
      ("a", 30L, 40L, 4L),   // gap → island 2
      ("a", 32L, 35L, 5L),   // contained
      ("b", 0L, 1L, 6L)))
    assert(got == Seq(
      ("a", 1L, 0L, 20L, 3L, 20L),
      ("a", 2L, 30L, 40L, 2L, 10L),
      ("b", 1L, 0L, 1L, 1L, 1L)))
  }

  test("tie starts never split an island regardless of order") {
    val got = run(Seq(("a", 0L, 10L, 1L), ("a", 0L, 3L, 2L), ("a", 3L, 4L, 3L)))
    assert(got == Seq(("a", 1L, 0L, 10L, 3L, 10L)))
  }

  test("coverageStats sums islands and gaps per key") {
    import spark.implicits._
    val df = Seq(("a", 0L, 10L, 1L), ("a", 20L, 25L, 2L)).toDF("k", "s", "e", "id")
    val islands = Intervals.mergeIntervals(df, Seq("k"), col("s"), col("e"), col("id"))
    val stats = Intervals.coverageStats(islands, Seq("k")).collect()
    assert(stats.length == 1)
    val r = stats.head
    assert(r.getAs[Long]("n_islands") == 2L)
    assert(r.getAs[Long]("covered_ms") == 15L)
    assert(r.getAs[Long]("gap_ms") == 10L)
  }

  test("partition invariance") {
    import spark.implicits._
    val rows = (1 to 2000).map { i =>
      (s"k${i % 7}", (i * 13L) % 500L, (i * 13L) % 500L + (i % 9) + 1L, i.toLong)
    }
    val df = rows.toDF("k", "s", "e", "id")
    val one = Intervals.mergeIntervals(df.repartition(1), Seq("k"), col("s"),
      col("e"), col("id")).orderBy("k", "island_seq").collect().map(_.toString).toSeq
    val many = Intervals.mergeIntervals(df.repartition(23), Seq("k"), col("s"),
      col("e"), col("id")).orderBy("k", "island_seq").collect().map(_.toString).toSeq
    assert(one == many)
  }
}

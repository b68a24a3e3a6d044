package graft.streaming

import graft.SparkTestBase
import graft.operators.Intervals
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingIslandsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val fixture: Seq[IntervalEvent] = {
    // two keys, overlap/touch/containment/gap shapes, starts non-decreasing
    // per key (the contract) — ids implicit in order
    Seq(
      IntervalEvent("a", 0, 10), IntervalEvent("a", 5, 12),
      IntervalEvent("b", 0, 4),
      IntervalEvent("a", 12, 20), IntervalEvent("a", 30, 40),
      IntervalEvent("b", 10, 15), IntervalEvent("a", 32, 35),
      IntervalEvent("b", 15, 16), IntervalEvent("a", 50, 55))
  }

  private def streamed(chunks: Seq[Seq[IntervalEvent]]): Seq[Island] = {
    import spark.implicits._
    implicit val sq = spark.sqlContext
    val input = MemoryStream[IntervalEvent]
    val sink = scala.collection.mutable.ArrayBuffer.empty[Island]
    val query = StreamingIslands.islandUpdates(input.toDS()).writeStream
      .outputMode("append")
      .foreachBatch { (b: org.apache.spark.sql.Dataset[Island], _: Long) =>
        sink ++= b.collect(); ()
      }
      .start()
    try {
      chunks.foreach { c => input.addData(c); query.processAllAvailable() }
      // flush: an interval far beyond everything closes each open island
      val keys = chunks.flatten.map(_.key).distinct
      input.addData(keys.map(k => IntervalEvent(k, 1000000L, 1000001L)))
      query.processAllAvailable()
    } finally query.stop()
    sink.toSeq.filterNot(_.island_start == 1000000L)
  }

  private def batchExpected(events: Seq[IntervalEvent]): Set[Island] = {
    import spark.implicits._
    val df = events.zipWithIndex
      .map { case (e, i) => (e.key, e.start_ms, e.end_ms, i.toLong) }
      .toDF("k", "s", "e", "id")
    Intervals.mergeIntervals(df, Seq("k"), col("s"), col("e"), col("id"))
      .collect()
      .map(r => Island(r.getAs[String]("k"), r.getAs[Long]("island_start"),
        r.getAs[Long]("island_end"), r.getAs[Long]("n_intervals")))
      .toSet
  }

  test("streamed islands equal the batch merge across every 2-way split") {
    val expected = batchExpected(fixture)
    for (cut <- 1 until fixture.length) {
      val got = streamed(Seq(fixture.take(cut), fixture.drop(cut))).toSet
      assert(got == expected, s"cut=$cut")
    }
  }

  test("three-way splits and a one-event-per-batch dribble also agree") {
    val expected = batchExpected(fixture)
    assert(streamed(fixture.grouped(3).toSeq).toSet == expected)
    assert(streamed(fixture.map(Seq(_))).toSet == expected)
  }

  test("batchIslands twin equals the operator result") {
    assert(StreamingIslands.batchIslands(spark, fixture).toSet ==
      batchExpected(fixture))
  }
}

package graft.streaming

import graft.SparkTestBase
import graft.operators.RangeJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Stream-stream interval correlate: batch ≡ stream across micro-batch
  * splits, including pairs whose two sides arrive in DIFFERENT
  * micro-batches (the buffered-state case a per-batch join would miss).
  */
class StreamingCorrelateSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val W = 1000L

  // (key, ts, id) fixtures with in- and out-of-window pairs per key
  private val leftRows = Seq(
    (1L, 1000L, 10L), (1L, 5000L, 11L), (2L, 2000L, 20L), (3L, 9000L, 30L))
  private val rightRows = Seq(
    (1L, 1000L, 100L),  // boundary: == left ts
    (1L, 2000L, 101L),  // == left ts + W
    (1L, 2001L, 102L),  // outside
    (1L, 5500L, 103L),  // matches second anchor
    (2L, 2500L, 200L),  // matches
    (3L, 8000L, 300L))  // before the anchor: no match

  private def batchPairs: Set[(Long, Long)] = {
    import spark.implicits._
    RangeJoin.within(
        leftRows.toDF("k", "ts", "lid"), rightRows.toDF("k", "ts", "rid"),
        Seq("k"), "ts", "ts", W)
      .select(col("lid"), col("r_rid"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
  }

  test("stream-stream correlate equals the batch RangeJoin across splits") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val lIn = MemoryStream[(Long, Long, Long)]
    val rIn = MemoryStream[(Long, Long, Long)]
    val joined = StreamingCorrelate.within(
      lIn.toDF().toDF("k", "ts", "lid"), rIn.toDF().toDF("k", "ts", "rid"),
      Seq("k"), "ts", "ts", W)
    val q = joined.writeStream.format("memory").queryName("correlate_stream")
      .outputMode("append").start()
    try {
      // split so some pairs STRADDLE micro-batches: anchors arrive first,
      // their matches arrive one (or two) triggers later
      lIn.addData(leftRows.take(2))
      q.processAllAvailable()
      rIn.addData(rightRows.take(3))
      q.processAllAvailable()
      lIn.addData(leftRows.drop(2))
      rIn.addData(rightRows.drop(3))
      q.processAllAvailable()
      val got = spark.table("correlate_stream")
        .select(col("lid"), col("r_rid"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
      val want = batchPairs
      assert(want == Set((10L, 100L), (10L, 101L), (11L, 103L), (20L, 200L)))
      assert(got == want)
    } finally {
      q.stop()
      spark.sql("DROP VIEW IF EXISTS correlate_stream")
    }
  }

  test("output contract matches the batch operator; validation refuses junk") {
    import spark.implicits._
    val out = StreamingCorrelate.within(
      leftRows.toDF("k", "ts", "lid"), rightRows.toDF("k", "ts", "rid"),
      Seq("k"), "ts", "ts", W)
    assert(out.columns.toSet == Set("k", "ts", "lid", "r_ts", "r_rid"))
    intercept[IllegalArgumentException](StreamingCorrelate.within(
      leftRows.toDF("k", "ts", "lid"), rightRows.toDF("k", "ts", "rid"),
      Seq.empty, "ts", "ts", W))
    intercept[IllegalArgumentException](StreamingCorrelate.within(
      leftRows.toDF("k", "ts", "lid"), rightRows.toDF("k", "ts", "rid"),
      Seq("k"), "ts", "ts", 0L))
    intercept[IllegalArgumentException](StreamingCorrelate.within(
      leftRows.toDF("k", "ts", "__l_event_time"),
      rightRows.toDF("k", "ts", "rid"), Seq("k"), "ts", "ts", W))
  }
}

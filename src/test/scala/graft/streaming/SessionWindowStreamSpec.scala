package graft.streaming

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Native session_window in STREAMING mode (watermark + append output)
  * must produce exactly the batch session_window result once the
  * watermark closes every session — across different micro-batch
  * splits. This is the built-in stateful-session surface (qai proves
  * batch parity against gaps-and-islands; here the streaming twin).
  */
class SessionWindowStreamSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  private val gap = "10 minutes"

  // (user, epoch-second) events: u1 has two sessions split by a >10 min
  // hole, u2 one session straddling the micro-batch boundary
  // time-ordered so no split ever feeds data behind the watermark
  private val events = Seq(
    (1L, 1000L), (1L, 1100L), (2L, 1200L), (1L, 1400L),
    (2L, 1700L), (2L, 2100L), (1L, 3000L), (1L, 3100L),
    // a far-future event per user pushes the watermark past all sessions
    (1L, 100000L), (2L, 100000L))

  private def toDf(rows: Seq[(Long, Long)]) = {
    import spark.implicits._
    rows.toDF("user_id", "sec")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"))
  }

  private def sessionize(df: org.apache.spark.sql.DataFrame) = df
    .groupBy(col("user_id"), session_window(col("ts"), gap))
    .agg(count(lit(1)).as("n"))
    .select(col("user_id"),
      unix_millis(col("session_window.start")).as("start_ms"),
      unix_millis(col("session_window.end")).as("end_ms"), col("n"))

  test("streamed session_window equals batch across micro-batch splits") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // append mode only emits sessions the watermark has CLOSED — the
    // far-future flush events' own sessions stay open and must be
    // excluded from the batch expectation
    val expected = sessionize(toDf(events)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .filter(_._2 < 90000000L)
      .sortBy(t => (t._1, t._2)).toSeq

    for ((split, i) <- Seq(3, 5, 8).zipWithIndex) {
      val input = MemoryStream[(Long, Long)]
      val streamed = input.toDF().toDF("user_id", "sec")
        .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"))
        .withWatermark("ts", "0 seconds")
      val q = sessionize(streamed)
        .writeStream.format("memory").queryName(s"sess_stream_$i")
        .outputMode("append").start()
      try {
        input.addData(events.take(split))
        q.processAllAvailable()
        input.addData(events.drop(split))
        q.processAllAvailable()
      } finally q.stop()
      val got = spark.table(s"sess_stream_$i").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .sortBy(t => (t._1, t._2)).toSeq
      assert(got == expected, s"split at $split diverged from batch")
    }
  }

  test("a session re-opened by a late-but-in-watermark event merges, not duplicates") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // second batch extends u1's open session before any flush event
    val rows1 = Seq((1L, 1000L), (1L, 1200L))
    val rows2 = Seq((1L, 1500L), (1L, 99999L))
    val all = rows1 ++ rows2
    val expected = sessionize(toDf(all)).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .filter(_._2 < 90000000L) // the flush session stays open
      .sortBy(t => (t._1, t._2)).toSeq

    val input = MemoryStream[(Long, Long)]
    val streamed = input.toDF().toDF("user_id", "sec")
      .select(col("user_id"), timestamp_seconds(col("sec")).as("ts"))
      .withWatermark("ts", "0 seconds")
    val q = sessionize(streamed)
      .writeStream.format("memory").queryName("sess_merge")
      .outputMode("append").start()
    try {
      input.addData(rows1); q.processAllAvailable()
      input.addData(rows2); q.processAllAvailable()
    } finally q.stop()
    val got = spark.table("sess_merge").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(got == expected)
  }
}

package graft.streaming

import graft.SparkTestBase
import graft.operators.Funnel
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Streaming funnel/retention ≡ their batch operators across micro-batch
  * splits (the StreamingOpsSpec precedent), under the documented per-user
  * event-time-ordered arrival contract.
  */
class StreamingFunnelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  // the FunnelSpec fixture, in per-user ts order (user 2's out-of-window
  // B(5)/B(9) precede their A(10) — order by ts keeps per-user order)
  private val fixture = Seq(
    FunnelEvent(2L, "B", 5L), FunnelEvent(4L, "C", 5L), FunnelEvent(2L, "B", 9L),
    FunnelEvent(1L, "A", 10L), FunnelEvent(2L, "A", 10L), FunnelEvent(3L, "A", 10L),
    FunnelEvent(5L, "A", 10L), FunnelEvent(5L, "B", 11L), FunnelEvent(5L, "C", 12L),
    FunnelEvent(3L, "C", 15L), FunnelEvent(1L, "B", 20L), FunnelEvent(3L, "B", 20L),
    FunnelEvent(1L, "C", 30L), FunnelEvent(2L, "C", 40L))

  private def batchDf = {
    import spark.implicits._
    fixture.map(e => (e.user_id, e.event_type, e.ts_ms))
      .toDF("user_id", "event_type", "ts_ms")
  }

  /** Latest progress per user from the update-mode sink (max n_done). */
  private def latest(rows: Seq[FunnelProgress]): Map[Long, Seq[Long]] =
    rows.groupBy(_.user_id).map { case (u, rs) =>
      u -> rs.maxBy(_.n_done).times
    }

  private def runStream(
      steps: Seq[String], maxGapMs: Option[Long],
      splits: Seq[Seq[FunnelEvent]], name: String): Map[Long, Seq[Long]] = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[FunnelEvent]
    val q = StreamingFunnel.stepCompletions(spark, input.toDS(), steps, maxGapMs)
      .writeStream.format("memory").queryName(name).outputMode("update").start()
    try splits.foreach { s => input.addData(s: _*); q.processAllAvailable() }
    finally q.stop()
    latest(spark.table(name).as[FunnelProgress].collect().toSeq)
  }

  private def batchTimes(steps: Seq[String], maxGapMs: Option[Long]): Map[Long, Seq[Long]] = {
    val frames = Funnel.stepCompletions(
      batchDf, "user_id", "event_type", "ts_ms", steps, maxGapMs)
    val perStep = frames.map(_.collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap)
    perStep.flatMap(_.keys).toSet.iterator.map { (u: Long) =>
      u -> perStep.map(_.getOrElse(u, StreamingFunnel.Unset)).toSeq
    }.toMap
  }

  test("funnel stream ≡ batch across micro-batch splits (unbounded window)") {
    val steps = Seq("A", "B", "C")
    val sorted = fixture.sortBy(_.ts_ms)
    val splits = Seq(sorted.take(5), sorted.slice(5, 9), sorted.drop(9))
    val got = runStream(steps, None, splits, "funnel_s1")
    assert(got == batchTimes(steps, None))
    // the final counts are the batch stepCounts report
    val counts = steps.indices.map(i =>
      got.values.count(_(i) != StreamingFunnel.Unset).toLong)
    val expected = Funnel.stepCounts(
      batchDf, "user_id", "event_type", "ts_ms", steps)
      .collect().map(_.getLong(2)).toSeq
    assert(counts == expected)
  }

  test("funnel stream ≡ batch with a conversion window, single batch") {
    val steps = Seq("A", "B", "C")
    val got = runStream(steps, Some(5L), Seq(fixture), "funnel_s2")
    assert(got == batchTimes(steps, Some(5L)))
  }

  test("earliest-completion anchoring holds across splits (late second A)") {
    val e = Seq(
      FunnelEvent(9L, "A", 10L), FunnelEvent(9L, "A", 100L),
      FunnelEvent(9L, "B", 105L))
    val got = runStream(Seq("A", "B"), Some(20L),
      Seq(e.take(1), e.drop(1)), "funnel_s3")
    // A completed at 10; B(105) is outside 10+20 even though a later A(100)
    // would have admitted it — the first-completion anchor must persist
    assert(got == Map(9L -> Seq(10L, StreamingFunnel.Unset)))
  }

  test("retention stream ≡ batch matrix across micro-batch splits") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val day = 86400000L
    val evs = Seq(
      (1L, 0L * day + 5), (2L, 0L * day + 9), (2L, 0L * day + 10),
      (3L, 1L * day + 1), (1L, 1L * day + 5), (2L, 1L * day + 9),
      (1L, 3L * day + 5)).map { case (u, ts) => FunnelEvent(u, "X", ts) }
    val input = MemoryStream[FunnelEvent]
    val q = StreamingFunnel.retentionCells(spark, input.toDS())
      .writeStream.format("memory").queryName("ret_s1").outputMode("update").start()
    try {
      input.addData(evs.take(3): _*); q.processAllAvailable()
      input.addData(evs.drop(3): _*); q.processAllAvailable()
    } finally q.stop()
    // cells are emitted at most once per (user, offset) -> count(*) per cell
    val got = spark.table("ret_s1")
      .groupBy("cohort_day", "day_offset").agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val expected = Funnel.retention(
      evs.map(e => (e.user_id, e.ts_ms)).toDF("user_id", "ts_ms"),
      "user_id", "ts_ms")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(got == expected)
    // duplicate re-delivery of an already-seen day emits nothing new
    assert(spark.table("ret_s1").count() ==
      spark.table("ret_s1").distinct().count())
  }

  test("retention horizon bounds state and emission") {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val day = 86400000L
    // user 1 active on offsets 0, 2, 400 — a 30-day horizon must neither
    // emit nor remember the 400-day offset
    val evs = Seq(0L, 2L * day, 400L * day).map(FunnelEvent(1L, "X", _))
    val input = MemoryStream[FunnelEvent]
    val q = StreamingFunnel.retentionCells(spark, input.toDS(),
        horizonDays = Some(30L))
      .writeStream.format("memory").queryName("ret_hz").outputMode("update").start()
    try {
      input.addData(evs: _*); q.processAllAvailable()
    } finally q.stop()
    assert(spark.table("ret_hz").select("day_offset")
      .collect().map(_.getLong(0)).toSet == Set(0L, 2L))
    intercept[IllegalArgumentException](
      StreamingFunnel.retentionCells(spark, input.toDS(), horizonDays = Some(-1L)))
  }
}

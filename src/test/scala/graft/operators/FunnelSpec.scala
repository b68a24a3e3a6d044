package graft.operators

import graft.SparkTestBase
import org.scalatest.funsuite.AnyFunSuite

class FunnelSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  // user 1: A(10) B(20) C(30)        -> completes all three
  // user 2: B(5)  A(10) B(9) C(40)   -> B never AFTER first A, stops at A
  // user 3: A(10) B(20) C(15)        -> C before B's completion, stops at B
  // user 4: C(5)                     -> never does A
  // user 5: A(10) B(11) C(12)        -> completes (tight but ordered)
  private def events = {
    import spark.implicits._
    Seq(
      (1L, "A", 10L), (1L, "B", 20L), (1L, "C", 30L),
      (2L, "B", 5L), (2L, "A", 10L), (2L, "B", 9L), (2L, "C", 40L),
      (3L, "A", 10L), (3L, "B", 20L), (3L, "C", 15L),
      (4L, "C", 5L),
      (5L, "A", 10L), (5L, "B", 11L), (5L, "C", 12L))
      .toDF("user_id", "event_type", "ts_ms")
  }

  test("strict ordering: steps count only completions after the previous step") {
    val counts = Funnel.stepCounts(events, "user_id", "event_type", "ts_ms",
      Seq("A", "B", "C"))
      .collect().map(r => (r.getInt(0), r.getString(1), r.getLong(2)))
    assert(counts.toSeq == Seq((1, "A", 4L), (2, "B", 3L), (3, "C", 2L)))
  }

  test("conversion window bounds each step-to-step gap") {
    // window of 5 ms: user 1's B(20) is 10 after A(10) -> out;
    // user 5's B(11)/C(12) stay in
    val counts = Funnel.stepCounts(events, "user_id", "event_type", "ts_ms",
      Seq("A", "B", "C"), maxGapMs = Some(5L))
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(counts == Map("A" -> 4L, "B" -> 1L, "C" -> 1L))
  }

  test("earliest-completion semantics: the FIRST previous-step time anchors the window") {
    import spark.implicits._
    // first A at 10; a later A at 100 must NOT re-open the window for B(105)
    val e = Seq((9L, "A", 10L), (9L, "A", 100L), (9L, "B", 105L))
      .toDF("user_id", "event_type", "ts_ms")
    val counts = Funnel.stepCounts(e, "user_id", "event_type", "ts_ms",
      Seq("A", "B"), maxGapMs = Some(20L))
      .collect().map(r => (r.getString(1), r.getLong(2))).toMap
    assert(counts == Map("A" -> 1L, "B" -> 0L))
  }

  test("retention: cohorts by first day, offsets count distinct active users") {
    import spark.implicits._
    val day = 86400000L
    // u1: days 0,1,3 (cohort 0); u2: days 0,1 (cohort 0); u3: day 1 only
    // (cohort 1); duplicate events on one day must count once
    val e = Seq(
      (1L, 0L * day + 5), (1L, 1L * day + 5), (1L, 3L * day + 5),
      (2L, 0L * day + 9), (2L, 0L * day + 10), (2L, 1L * day + 9),
      (3L, 1L * day + 1))
      .toDF("user_id", "ts_ms")
    val m = Funnel.retention(e, "user_id", "ts_ms")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m == Map(
      (0L, 0L) -> 2L, // u1 + u2 on their cohort day
      (0L, 1L) -> 2L, // both return next day
      (0L, 3L) -> 1L, // only u1
      (1L, 0L) -> 1L)) // u3's own cohort
  }

  test("retention day bucketing floors negative (pre-1970) timestamps") {
    import spark.implicits._
    val day = 86400000L
    // -5 ms is late on day -1; truncate-toward-zero would misbucket it as
    // day 0 and split this user into two cohort cells
    val e = Seq((1L, -5L), (1L, 5L)).toDF("user_id", "ts_ms")
    val m = Funnel.retention(e, "user_id", "ts_ms")
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(m == Map((-1L, 0L) -> 1L, (-1L, 1L) -> 1L))
  }

  test("funnel is monotone non-increasing and partition-invariant") {
    def run(df: org.apache.spark.sql.DataFrame) =
      Funnel.stepCounts(df, "user_id", "event_type", "ts_ms", Seq("A", "B", "C"))
        .collect().map(_.getLong(2)).toSeq
    val a = run(events)
    assert(a == a.sorted.reverse, "conversion counts must not increase")
    assert(run(events.repartition(7)) == a)
  }

  test("touchAttribution: first/last picks, window bounds, no-touch nulls") {
    import spark.implicits._
    val touches = Seq(
      (1L, 100L, 11L, "view"),   // in window of conv at 150 (lookback 100)
      (1L, 120L, 12L, "click"),  // in window — last touch
      (1L, 40L, 13L, "view"),    // OUTSIDE the 100ms lookback of conv@150
      (2L, 500L, 21L, "view"),   // after user 2's conversion: excluded
      (1L, 150L, 14L, "click")   // exactly at conv ts: inclusive
    ).toDF("user_id", "ts_ms", "event_id", "event_type")
    val convs = Seq(
      (1L, 150L, 91L),
      (2L, 400L, 92L), // no prior touch in window
      (3L, 100L, 93L)  // user with no touches at all
    ).toDF("user_id", "ts_ms", "event_id")
    val out = Funnel.touchAttribution(touches, convs, Seq("user_id"),
        "ts_ms", "event_id", "event_type", "ts_ms", "event_id", 100L)
      .orderBy("event_id").collect()
    val r1 = out(0)
    assert(r1.getAs[Long]("event_id") == 91L)
    assert(r1.getAs[Long]("n_touches") == 3L)
    assert(r1.getAs[String]("first_touch_type") == "view" &&
      r1.getAs[Long]("first_touch_ms") == 100L) // 40L is out of window
    assert(r1.getAs[String]("last_touch_type") == "click" &&
      r1.getAs[Long]("last_touch_ms") == 150L) // inclusive upper bound
    for (i <- 1 to 2) {
      assert(out(i).getAs[Long]("n_touches") == 0L)
      assert(out(i).isNullAt(out(i).fieldIndex("first_touch_type")))
    }
  }

  test("touchAttribution: equal-timestamp touches tiebreak on id") {
    import spark.implicits._
    val touches = Seq(
      (1L, 100L, 2L, "b"), (1L, 100L, 1L, "a"), (1L, 100L, 3L, "c")
    ).toDF("user_id", "ts_ms", "event_id", "event_type")
    val convs = Seq((1L, 100L, 9L)).toDF("user_id", "ts_ms", "event_id")
    val out = Funnel.touchAttribution(touches, convs, Seq("user_id"),
      "ts_ms", "event_id", "event_type", "ts_ms", "event_id", 50L).collect()
    assert(out.head.getAs[String]("first_touch_type") == "a")
    assert(out.head.getAs[String]("last_touch_type") == "c")
  }
}

package graft.operators

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class AsOfJoinSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  test("asOf picks latest right row at-or-before each left row, per key") {
    import spark.implicits._
    val left = Seq(
      ("u1", 100L, 1L), // after right@50 → picks 50
      ("u1", 200L, 2L), // after right@150 → picks 150
      ("u1", 150L, 3L), // simultaneous with right@150 → picks 150 ("at or before")
      ("u1", 40L, 4L), // before any right row → null
      ("u2", 500L, 5L)) // other key, right only on u1 → null
      .toDF("k", "ts", "seq")
    val r2 = Seq(
      ("u1", 50L, 10L, "r50"),
      ("u1", 150L, 11L, "r150"))
      .toDF("k", "ts", "seq", "tag")
    val res = AsOfJoin.asOf(left, r2, Seq("k"), "ts", "seq", payload = Seq("tag"))
      .select(col("seq"), col("__asof.tag").as("tag")).collect()
      .map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    assert(res == Map(
      1L -> Some("r50"), 2L -> Some("r150"), 3L -> Some("r150"),
      4L -> None, 5L -> None))
  }

  test("asOf tie among equal-ts right rows: greatest seq wins") {
    import spark.implicits._
    val left = Seq(("k", 100L, 1L)).toDF("k", "ts", "seq")
    val right = Seq(("k", 100L, 10L, "a"), ("k", 100L, 11L, "b"))
      .toDF("k", "ts", "seq", "tag")
    val res = AsOfJoin.asOf(left, right, Seq("k"), "ts", "seq", Seq("tag"))
      .select(col("__asof.tag")).collect()
    assert(res.head.getString(0) == "b")
  }

  test("sessionize: gap splits sessions; stats roll up") {
    import spark.implicits._
    val events = Seq(
      ("u1", 0L, 1L, 10.0), ("u1", 1000L, 2L, 20.0), // session 1
      ("u1", 10000L, 3L, 5.0), // gap 9000 > 5000 → session 2
      ("u2", 0L, 4L, 1.0)) // own key → session 1
      .toDF("user_id", "ts_ms", "event_id", "value")
    val s = Sessionize.byGap(events, Seq("user_id"), col("ts_ms"),
      col("event_id"), gapMs = 5000L)
    val seqs = s.collect().map(r =>
      r.getAs[Long]("event_id") -> r.getAs[Long]("session_seq")).toMap
    assert(seqs == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L))
    val stats = Sessionize.sessionStats(s, Seq("user_id"), col("ts_ms"), col("value"))
      .collect().map(r => (r.getAs[String]("user_id"), r.getAs[Long]("session_seq")) ->
        (r.getAs[Long]("n_events"), r.getAs[Double]("session_value"))).toMap
    assert(stats(("u1", 1L)) == ((2L, 30.0)))
    assert(stats(("u1", 2L)) == ((1L, 5.0)))
    assert(stats(("u2", 1L)) == ((1L, 1.0)))
  }
}

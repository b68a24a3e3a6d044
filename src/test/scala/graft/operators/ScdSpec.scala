package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SCD2 history build: interval construction, consecutive-duplicate
  * collapse, all-null first rows, multi-attribute change detection,
  * half-open interval chaining, and partition invariance.
  */
class ScdSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def events = Seq(
    // (key, ts, tie, state)
    (1L, 10L, 1L, "a"),
    (1L, 20L, 2L, "a"), // duplicate state: collapsed
    (1L, 30L, 3L, "b"),
    (1L, 40L, 4L, "a"), // back to a: NEW interval (type 2, not type 1)
    (2L, 10L, 5L, "x")
  ).toDF("k", "ts", "tie", "st")

  private def run(df: org.apache.spark.sql.DataFrame) =
    Scd.scd2(df, "k", "ts", "tie", Seq("st"))
      .orderBy("k", "valid_from", "tie")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        Option(r.get(3)).map(_.asInstanceOf[Long]), r.getBoolean(4)))

  test("collapses consecutive duplicates, reopens on revert, chains intervals") {
    assert(run(events).toSeq == Seq(
      (1L, "a", 10L, Some(30L), false),
      (1L, "b", 30L, Some(40L), false),
      (1L, "a", 40L, None, true),
      (2L, "x", 10L, None, true)))
  }

  test("intervals are half-open and gap-free per key") {
    val rows = run(events).filter(_._1 == 1L).toSeq
    rows.sliding(2).foreach {
      case Seq(a, b) => assert(a._4.contains(b._3))
      case _ =>
    }
    assert(rows.last._4.isEmpty && rows.last._5)
  }

  test("a first row with an all-null attribute still opens an interval") {
    val df = Seq((1L, 10L, 1L, Option.empty[String]),
      (1L, 20L, 2L, Some("a"))).toDF("k", "ts", "tie", "st")
    val out = Scd.scd2(df, "k", "ts", "tie", Seq("st"))
      .orderBy("valid_from").collect()
    assert(out.length == 2)
    assert(out.head.isNullAt(1)) // the null state row survived
  }

  test("any of several attributes changing opens an interval") {
    val df = Seq(
      (1L, 10L, 1L, "a", 1),
      (1L, 20L, 2L, "a", 2), // second attr changes
      (1L, 30L, 3L, "a", 2)  // nothing changes
    ).toDF("k", "ts", "tie", "s1", "s2")
    val out = Scd.scd2(df, "k", "ts", "tie", Seq("s1", "s2")).collect()
    assert(out.length == 2)
  }

  test("partition invariance") {
    val a = run(events).toSeq
    assert(run(events.repartition(5, col("st"))).toSeq == a)
  }

  test("refuses missing columns and empty attribute list") {
    intercept[IllegalArgumentException] {
      Scd.scd2(events, "k", "ts", "tie", Seq.empty)
    }
    intercept[IllegalArgumentException] {
      Scd.scd2(events, "k", "ts", "nope", Seq("st"))
    }
  }
}

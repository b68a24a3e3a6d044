package graft.operators

import org.scalatest.funsuite.AnyFunSuite

/** Absorption probabilities against hand-solved chains. */
class AbsorbingChainSpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def run(events: Seq[(Long, Long, String)]) =
    AbsorbingChain.absorption(
        events.map { case (u, t, st) => (u, t, t, st) }
          .toDF("u", "ts", "tie", "st"),
        "u", "ts", "tie", "st",
        transient = Seq("t1", "t2", "t3"), absorbing = Seq("A", "B"))
      .collect().map(r => r.getAs[String]("state") ->
        (r.getAs[Double]("p_A"), r.getAs[Double]("p_B"))).toMap

  test("expected steps to absorption: direct = 1, chained = 2") {
    val ev = Seq(
      (1L, 1L, "t1"), (1L, 2L, "A"),                 // t1 → A (1 step)
      (2L, 1L, "t2"), (2L, 2L, "t1"), (2L, 3L, "A"), // t2 → t1 → A
      (3L, 1L, "t3"), (3L, 2L, "B"))                 // t3 → B (1 step)
    val m = AbsorbingChain.expectedSteps(
        ev.map { case (u, t, st) => (u, t, t, st) }
          .toDF("u", "ts", "tie", "st"),
        "u", "ts", "tie", "st",
        transient = Seq("t1", "t2", "t3"), absorbing = Seq("A", "B"))
      .collect().map(r => r.getAs[String]("state") ->
        r.getAs[Double]("expected_steps")).toMap
    assert(m("t1") == 1.0)
    assert(m("t2") == 2.0)
    assert(m("t3") == 1.0)
  }

  test("direct, chained and split absorption solve exactly") {
    val ev = Seq(
      (1L, 1L, "t1"), (1L, 2L, "A"),            // t1 → A
      (2L, 1L, "t2"), (2L, 2L, "t1"), (2L, 3L, "A"), // t2 → t1 (→ A)
      (3L, 1L, "t3"), (3L, 2L, "A"),            // t3 → A
      (4L, 1L, "t3"), (4L, 2L, "B"))            // t3 → B
    val m = run(ev)
    assert(m("t1") == (1.0, 0.0))
    assert(m("t2") == (1.0, 0.0))
    assert(m("t3") == (0.5, 0.5))
  }

  test("a self-loop still absorbs with probability 1 (geometric series)") {
    val ev = Seq(
      (1L, 1L, "t1"), (1L, 2L, "t1"), (1L, 3L, "A"), // q11 = r1A = 0.5
      (2L, 1L, "t2"), (2L, 2L, "B"),
      (3L, 1L, "t3"), (3L, 2L, "B"))
    val m = run(ev)
    assert(m("t1") == (1.0, 0.0))
    assert(m("t2") == (0.0, 1.0))
    assert(m("t3") == (0.0, 1.0))
  }

  test("a state outside the declared universe is rejected loudly") {
    // silent dropping would deflate absorption mass (p_A + p_B < 1);
    // the contract is an up-front refusal instead
    val ev = Seq(
      (1L, 1L, "t1"), (1L, 2L, "mystery"), (1L, 3L, "A"),
      (2L, 1L, "t2"), (2L, 2L, "B"),
      (3L, 1L, "t3"), (3L, 2L, "B"))
    val e = intercept[IllegalArgumentException](run(ev))
    assert(e.getMessage.contains("outside the declared universe"))
  }

  test("absorbing-state successors are ignored, unknown-state rows rejected by filter") {
    // a user continuing AFTER absorption must not pollute the rates
    val ev = Seq(
      (1L, 1L, "t1"), (1L, 2L, "A"), (1L, 3L, "B"), // A→B ignored
      (2L, 1L, "t2"), (2L, 2L, "B"),
      (3L, 1L, "t3"), (3L, 2L, "B"))
    val m = run(ev)
    assert(m("t1") == (1.0, 0.0))
  }
}

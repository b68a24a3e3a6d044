package graft.operators

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Shapley attribution against hand-solved games: a channel that fully
  * explains conversion takes all the credit, symmetric channels split
  * evenly, and the efficiency property Σφ = v(C) − v(∅) holds.
  */
class ShapleySpec extends AnyFunSuite {
  private lazy val spark = graft.SparkTestBase.spark
  import spark.implicits._

  private def run(events: Seq[(Long, Long, String)], channels: Seq[String]) =
    Shapley.attribution(events.toDF("u", "ts", "ch"), "u", "ts", "ch",
        col("ch") === "conv", channels)
      .collect().map(r => r.getAs[String]("channel") ->
        r.getAs[Double]("phi")).toMap

  test("a perfectly explanatory channel takes all the credit") {
    // v(∅)=0, v(a)=1, v(b)=0, v(ab)=1 → φ_a = 1, φ_b = 0
    val ev = Seq(
      (1L, 1L, "a"), (1L, 2L, "conv"),
      (2L, 1L, "a"), (2L, 3L, "conv"),
      (3L, 1L, "b"),
      (4L, 1L, "a"), (4L, 2L, "b"), (4L, 5L, "conv"))
    val phi = run(ev, Seq("a", "b"))
    assert(phi("a") == 1.0)
    assert(phi("b") == 0.0)
  }

  test("symmetric channels earn identical credit") {
    val ev = Seq(
      (1L, 1L, "a"), (1L, 2L, "conv"),
      (2L, 1L, "b"), (2L, 2L, "conv"),
      (3L, 1L, "a"), (3L, 2L, "b"), (3L, 9L, "x")) // non-converter, both
    val phi = run(ev, Seq("a", "b"))
    assert(phi("a") == phi("b"))
  }

  test("efficiency: credits sum to v(full) − v(empty) on the fixture") {
    val ev = graft.Tables(spark, "/root/testdata/sf0.001", "events")
      .withColumn("ts_ms", unix_millis(col("ts")))
    val conv = col("event_type") === "purchase" && col("value") > 180.0
    val chans = Seq("click", "error", "signup", "view")
    val phis = Shapley.attribution(ev, "user_id", "ts_ms", "event_type",
      conv, chans).collect().map(_.getAs[Double]("phi"))
    // v(full)/v(empty) recomputed independently from the coalition sets
    val fp = ev.filter(conv).groupBy(col("user_id")).agg(min(col("ts_ms")).as("fp"))
    val users = ev.select(col("user_id")).distinct()
      .join(fp, Seq("user_id"), "left")
    val expoFull = ev.filter(!conv)
      .join(fp, Seq("user_id"), "left")
      .filter(col("fp").isNull || col("ts_ms") < col("fp"))
      .filter(col("event_type").isin(chans: _*))
      .groupBy(col("user_id"))
      .agg(countDistinct(col("event_type")).as("k"))
    val byMask = users.join(expoFull, Seq("user_id"), "left")
      .withColumn("k", coalesce(col("k"), lit(0L)))
      .withColumn("conv", col("fp").isNotNull.cast("long"))
    def rate(cond: org.apache.spark.sql.Column): Double = {
      val r = byMask.filter(cond)
        .agg(count(lit(1)).as("n"), sum(col("conv")).as("c")).collect()(0)
      if (r.getAs[Long]("n") == 0L) 0.0
      else BigDecimal(r.getAs[Long]("c").toDouble / r.getAs[Long]("n"))
        .setScale(12, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val vFull = rate(col("k") === chans.size)
    val vEmpty = rate(col("k") === 0)
    assert(math.abs(phis.sum - (vFull - vEmpty)) < 1e-5,
      s"sum=${phis.sum} vFull=$vFull vEmpty=$vEmpty")
  }
}

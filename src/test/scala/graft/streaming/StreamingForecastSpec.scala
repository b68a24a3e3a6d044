package graft.streaming

import graft.SparkTestBase
import graft.operators.Forecast
import org.scalatest.funsuite.AnyFunSuite

/** Streaming Holt–Winters ≡ the batch fold bit-for-bit across arbitrary
  * micro-batch splits, replay idempotence of the pure transition, and the
  * late-bucket skip policy.
  */
class StreamingForecastSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark

  // two series with different shapes: a weekly-ish pattern and a ramp
  private val fixture: Seq[SeriesPoint] =
    (0 until 21).map(t => SeriesPoint("wk", t.toLong,
      if (t % 7 == 6) 19.0 else 5.0)) ++
      (0 until 15).map(t => SeriesPoint("ramp", t.toLong, 2.0 * t + 1))

  private def batchExpected: Map[String, (Double, Double, Double, Double)] = {
    import spark.implicits._
    val df = fixture.map(p => (p.key, p.t, p.y)).toDF("k", "t", "y")
    Forecast.holtWinters(df, "k", "t", "y").collect().map { r =>
      r.getAs[String]("k") -> ((r.getAs[Double]("level"),
        r.getAs[Double]("trend"), r.getAs[Double]("s_next"),
        r.getAs[Double]("forecast_7")))
    }.toMap
  }

  private def latest(rows: Seq[ForecastUpdate]) =
    rows.groupBy(_.key).map { case (k, rs) =>
      val last = rs.maxBy(_.n_obs)
      k -> ((last.level, last.trend, last.s_next, last.forecast))
    }

  private def runStream(
      splits: Seq[Seq[SeriesPoint]], name: String): Map[String, (Double, Double, Double, Double)] = {
    import spark.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[SeriesPoint]
    val q = StreamingForecast.holtWintersUpdates(spark, input.toDS())
      .writeStream.format("memory").queryName(name).outputMode("update").start()
    try splits.foreach { s => input.addData(s: _*); q.processAllAvailable() }
    finally q.stop()
    latest(spark.table(name).as[ForecastUpdate].collect().toSeq)
  }

  test("stream ≡ batch bit-for-bit across micro-batch splits") {
    val ordered = fixture.sortBy(p => (p.key, p.t))
    val splits = Seq(ordered.take(7), ordered.slice(7, 20), ordered.drop(20))
    assert(runStream(splits, "hw_s1") == batchExpected)
  }

  test("stream ≡ batch when everything arrives in one batch") {
    assert(runStream(Seq(fixture), "hw_s2") == batchExpected)
  }

  test("advance: replayed buckets are skipped (at-least-once idempotence)") {
    val pts = (0 until 10).map(t => SeriesPoint("k", t.toLong, t * 3.0))
    val once = StreamingForecast.advance(None, pts, 0.5, 0.25, 0.25, 7)
    val replayed = StreamingForecast.advance(once, pts.drop(4), 0.5, 0.25, 0.25, 7)
    assert(replayed == once)
    // and a genuinely-new bucket still advances
    val more = StreamingForecast.advance(once,
      Seq(SeriesPoint("k", 10L, 30.0)), 0.5, 0.25, 0.25, 7)
    assert(more != once)
  }

  test("advance: within-batch ordering is by t, not arrival order") {
    val shuffled = Seq(SeriesPoint("k", 2L, 3.0), SeriesPoint("k", 0L, 1.0),
      SeriesPoint("k", 1L, 2.0))
    val sorted = Seq(SeriesPoint("k", 0L, 1.0), SeriesPoint("k", 1L, 2.0),
      SeriesPoint("k", 2L, 3.0))
    assert(StreamingForecast.advance(None, shuffled, 0.5, 0.25, 0.25, 7) ==
      StreamingForecast.advance(None, sorted, 0.5, 0.25, 0.25, 7))
  }

  test("any 2-way split equals the batch fold (exhaustive cut points)") {
    val pts = (0 until 12).map(t => SeriesPoint("k", t.toLong, (t % 5) * 2.0))
    val whole = StreamingForecast.advance(None, pts, 0.5, 0.25, 0.25, 7)
    (1 until 12).foreach { cut =>
      val split = StreamingForecast.advance(
        StreamingForecast.advance(None, pts.take(cut), 0.5, 0.25, 0.25, 7),
        pts.drop(cut), 0.5, 0.25, 0.25, 7)
      assert(split == whole, s"cut at $cut diverged")
    }
  }
}

package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One aggregated series observation on the wire: key (series id), `t`
  * (ordinal time bucket — day/hour index, UNIQUE per key) and the value.
  */
final case class SeriesPoint(key: String, t: Long, y: Double)

/** The per-key forecast snapshot emitted whenever a batch advances the
  * series: fitted level/trend, the next step's seasonal, and the
  * horizon-step forecast — 6-rounded exactly like the batch operator's
  * output columns.
  */
final case class ForecastUpdate(
    key: String, n_obs: Long, level: Double, trend: Double,
    s_next: Double, forecast: Double)

private final case class HwState(
    lastT: Long, n: Long, l: Double, b: Double, ring: Seq[Double])

/** Streaming twin of [[graft.operators.Forecast.holtWinters]] — the
  * additive Holt–Winters recursion carried as `flatMapGroupsWithState`
  * state, so a live metric stream maintains the SAME fitted state the
  * batch fold computes over the accumulated series (StreamingForecastSpec
  * proves streamed ≡ batch bit-for-bit across arbitrary micro-batch
  * splits — the per-step BigDecimal 9-snap here is the identical rounding
  * Spark's `round(col, 9)` applies inside the batch fold, the
  * imageToMoments precedent).
  *
  * Ordering/replay contract: points advance the state only when their
  * `t` EXCEEDS the last consumed bucket — within a batch points are
  * sorted by `t`, and replayed or late buckets are SKIPPED (idempotent
  * under at-least-once delivery; an ordered fold cannot retract, the
  * StreamingFunnel no-retraction caveat). Aggregated series buckets are
  * produced in time order upstream, so the skip only ever drops
  * duplicates or genuinely-late stragglers.
  *
  * Scale shape: state per key is 2+period doubles and two longs —
  * constant for the life of the stream; per-batch work is O(points for
  * that key); the only shuffle is the key exchange every stateful
  * aggregate pays.
  */
object StreamingForecast {

  /** Spark's `round(x, 9)` on doubles, replicated driver-side. */
  private def r9(x: Double): Double = java.math.BigDecimal.valueOf(x)
    .setScale(9, java.math.RoundingMode.HALF_UP).doubleValue()

  private def r6(x: Double): Double = java.math.BigDecimal.valueOf(x)
    .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** The pure per-key transition: fold this batch's points (sorted by t,
    * stale buckets skipped) into the Holt–Winters state. Mirrors the
    * batch fold exactly: the first-ever point seeds (l = y, b = 0, zero
    * ring); each later point updates the three states with per-step
    * 9-snaps and rotates the ring.
    */
  private[streaming] def advance(
      state: Option[HwState], points: Seq[SeriesPoint],
      alpha: Double, beta: Double, gamma: Double,
      period: Int): Option[HwState] = {
    var st = state
    points.sortBy(_.t).foreach { p =>
      st match {
        case None =>
          st = Some(HwState(p.t, 1L, p.y, 0.0, Vector.fill(period)(0.0)))
        case Some(s) if p.t > s.lastT =>
          val sCur = s.ring.head
          val lNew = r9(alpha * (p.y - sCur) + (1 - alpha) * (s.l + s.b))
          val bNew = r9(beta * (lNew - s.l) + (1 - beta) * s.b)
          val sNew = r9(gamma * (p.y - lNew) + (1 - gamma) * sCur)
          st = Some(HwState(p.t, s.n + 1, lNew, bNew,
            s.ring.tail.toVector :+ sNew))
        case _ => // replayed or late bucket: skip (idempotent)
      }
    }
    st
  }

  /** Forecast snapshots over a (possibly streaming) point Dataset:
    * Update-mode rows, one per key per micro-batch that advanced it. The
    * latest row per key carries exactly the batch operator's
    * level/trend/s_next/forecast for the series consumed so far.
    */
  def holtWintersUpdates(
      spark: SparkSession, points: Dataset[SeriesPoint],
      alpha: Double = 0.5, beta: Double = 0.25, gamma: Double = 0.25,
      period: Int = 7, horizon: Int = 7): Dataset[ForecastUpdate] = {
    import spark.implicits._
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    require(beta > 0 && beta < 1, s"beta must be in (0,1), got $beta")
    require(gamma > 0 && gamma < 1, s"gamma must be in (0,1), got $gamma")
    require(period >= 2 && period <= 24,
      s"period must be in [2,24], got $period")
    require(horizon >= 1, s"horizon must be >= 1, got $horizon")

    points.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (key: String, batch: Iterator[SeriesPoint], state: GroupState[HwState]) =>
          val before = state.getOption
          val after = advance(before, batch.toSeq, alpha, beta, gamma, period)
          if (after.isDefined && after != before) {
            val s = after.get
            state.update(s)
            val slot = (horizon - 1) % period
            Iterator.single(ForecastUpdate(key, s.n,
              r6(s.l), r6(s.b), r6(s.ring.head),
              r6(s.l + horizon.toDouble * s.b + s.ring(slot))))
          } else Iterator.empty
      }
  }
}

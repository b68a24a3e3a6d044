package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One analytics event on the wire (the events-table shape reduced to what
  * funnels/retention consume; timestamps are epoch millis like the batch
  * operators).
  */
final case class FunnelEvent(user_id: Long, event_type: String, ts_ms: Long)

/** A user's funnel progress: `times(i)` is the earliest completion time of
  * step i, [[StreamingFunnel.Unset]] where the step is not reached yet.
  * `n_done` is the completed-step prefix length (monotone per user — the
  * latest row per user is the one with the largest `n_done`).
  */
final case class FunnelProgress(user_id: Long, n_done: Int, times: Seq[Long])

/** One newly-observed retention cell for a user: active on
  * `cohort_day + day_offset`, cohort = first active day. Emitted at most
  * once per (user, offset), so the matrix is a plain count per cell.
  */
final case class RetentionCell(user_id: Long, cohort_day: Long, day_offset: Long)

private final case class FunnelState(times: Seq[Long])
private final case class RetentionState(cohort: Long, offsets: Seq[Long])

/** Streaming twins of [[graft.operators.Funnel]] — the batch operator's
  * per-user min-aggregates carried as `flatMapGroupsWithState` state, so a
  * live event stream maintains the same funnel/retention answer the batch
  * query computes over the accumulated store (StreamingFunnelSpec proves
  * batch ≡ stream across micro-batch splits, the StreamingOpsSpec
  * precedent).
  *
  * Exactness contract: per-user event-time-ordered arrival (the standard
  * per-key ordering a partitioned log gives when events are keyed by user).
  * Under it the one-pass update IS the batch earliest-completion recursion:
  * the first step-k event after t_{k-1} is the minimum such event. Late
  * out-of-order data degrades gracefully (a late earlier step-1 event
  * cannot retract already-emitted completions — the same no-retraction
  * caveat every update-mode analytic carries); replaying the store in batch
  * remains the ground truth.
  *
  * Scale shape: state per user is K longs (funnel) or the active-day-offset
  * list (retention — set `horizonDays` to BOUND it: a retention analysis
  * only ever reads a fixed offset window, and without the bound a
  * years-running stream accretes one long per active day per user forever)
  * — no per-user event collection, state updates are O(batch events for
  * that user), and the shuffle is the same single user-key exchange the
  * batch aggregates pay.
  */
object StreamingFunnel {

  /** Sentinel for "step not reached" (no valid event time is MinValue). */
  val Unset: Long = Long.MinValue

  /** The per-user state transition: fold this batch's events (sorted by
    * event time) into the earliest-completion vector. Emits the updated
    * progress row when (and only when) a new step completed this batch.
    */
  private[streaming] def advance(
      times: Array[Long], events: Seq[FunnelEvent],
      stepIdx: Map[String, Int], maxGapMs: Option[Long]): Boolean = {
    var changed = false
    events.sortBy(_.ts_ms).foreach { e =>
      stepIdx.get(e.event_type).foreach { s =>
        val prevOk =
          if (s == 0) true
          else times(s - 1) != Unset && e.ts_ms > times(s - 1) &&
            maxGapMs.forall(g => e.ts_ms <= times(s - 1) + g)
        if (times(s) == Unset && prevOk) {
          times(s) = e.ts_ms
          changed = true
        }
      }
    }
    changed
  }

  /** Funnel progress over a (possibly streaming) event Dataset: Update-mode
    * rows, one per user per micro-batch that advanced them. The latest row
    * per user (max `n_done`) equals the batch
    * [[graft.operators.Funnel.stepCompletions]] membership and times.
    */
  def stepCompletions(
      spark: SparkSession, events: Dataset[FunnelEvent], steps: Seq[String],
      maxGapMs: Option[Long] = None): Dataset[FunnelProgress] = {
    import spark.implicits._
    require(steps.nonEmpty, "need at least one funnel step")
    require(maxGapMs.forall(_ > 0), s"maxGapMs must be positive, got $maxGapMs")
    val stepIdx = steps.zipWithIndex.toMap
    val k = steps.length
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[FunnelEvent], state: GroupState[FunnelState]) =>
          val times = state.getOption.map(_.times.toArray)
            .getOrElse(Array.fill(k)(Unset))
          val changed = advance(times, batch.toSeq, stepIdx, maxGapMs)
          if (changed) {
            state.update(FunnelState(times.toSeq))
            Iterator.single(
              FunnelProgress(user, times.count(_ != Unset), times.toSeq))
          } else Iterator.empty
      }
  }

  /** Retention cells over a (possibly streaming) event Dataset: each
    * (user, day_offset) emitted exactly once, anchored at the user's first
    * active day. `count(*)` per (cohort_day, day_offset) over the sink is
    * the batch [[graft.operators.Funnel.retention]] matrix (restricted to
    * the horizon when one is set).
    *
    * `horizonDays`: offsets beyond it are neither emitted nor remembered,
    * bounding per-user state to ≤ horizon+1 longs for the life of the
    * stream. None preserves exact batch ≡ stream over any window but lets
    * state grow with the user's active-day count — only for bounded
    * replays/backfills, not a years-running production stream.
    */
  def retentionCells(
      spark: SparkSession, events: Dataset[FunnelEvent],
      dayMs: Long = 86400000L,
      horizonDays: Option[Long] = None): Dataset[RetentionCell] = {
    import spark.implicits._
    require(dayMs > 0, s"dayMs must be positive, got $dayMs")
    require(horizonDays.forall(_ >= 0), s"horizonDays must be >= 0, got $horizonDays")
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Update, GroupStateTimeout.NoTimeout) {
        (user: Long, batch: Iterator[FunnelEvent], state: GroupState[RetentionState]) =>
          // floorDiv matches the batch operator's pmod-adjusted floor `div`
          val days = batch.map(e => Math.floorDiv(e.ts_ms, dayMs)).toSeq.distinct.sorted
          if (days.isEmpty) Iterator.empty
          else {
            val st = state.getOption.getOrElse(RetentionState(days.min, Seq.empty))
            val seen = st.offsets.toSet
            val fresh = days.map(_ - st.cohort).filter(o =>
              o >= 0 && !seen.contains(o) && horizonDays.forall(o <= _))
            if (fresh.isEmpty) Iterator.empty
            else {
              state.update(RetentionState(st.cohort, (st.offsets ++ fresh).sorted))
              fresh.iterator.map(RetentionCell(user, st.cohort, _))
            }
          }
      }
  }
}

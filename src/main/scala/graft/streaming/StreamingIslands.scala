package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One interval on the wire: [start_ms, end_ms) for a key. */
final case class IntervalEvent(key: String, start_ms: Long, end_ms: Long)

/** A CLOSED coverage island (the [[graft.operators.Intervals]] output
  * grain): emitted the moment a later interval opens strictly beyond the
  * island's end. The currently-open island per key stays in state — a
  * stream never knows its last interval, so open islands are read by a
  * final flush (or the batch replay, which remains ground truth).
  */
final case class Island(key: String, island_start: Long, island_end: Long,
    n_intervals: Long)

private final case class OpenIsland(start: Long, end: Long, n: Long)

/** Streaming twin of [[graft.operators.Intervals.mergeIntervals]]: the
  * per-key running max-end prefix carried as `flatMapGroupsWithState`
  * state — ONE open island (three longs) per key, for the stream's life.
  *
  * Exactness contract: per-key starts must not decrease ACROSS
  * micro-batches (within a batch any order is fine — the update sorts its
  * batch slice); a partitioned log keyed by `key` with event-time-ordered
  * appends provides exactly that. Under the contract, streamed closed
  * islands plus the final open state equal the batch merge bit-for-bit
  * (StreamingIslandsSpec, exhaustive split sweep). A late interval that
  * would re-open an already-CLOSED island cannot retract it — the same
  * no-retraction caveat every update-mode analytic carries; the batch
  * replay over the accumulated store is ground truth.
  *
  * Scale shape: state per key is O(1); each micro-batch costs one key
  * exchange plus an O(n log n) sort of that key's batch slice only.
  */
object StreamingIslands {

  private def update(key: String, rows: Iterator[IntervalEvent],
      state: GroupState[OpenIsland]): Iterator[Island] = {
    val batch = rows.toSeq.sortBy(e => (e.start_ms, e.end_ms))
    var open = state.getOption
    val closed = Seq.newBuilder[Island]
    for (e <- batch) {
      open match {
        case Some(o) if e.start_ms <= o.end =>
          open = Some(OpenIsland(o.start, math.max(o.end, e.end_ms), o.n + 1))
        case Some(o) =>
          closed += Island(key, o.start, o.end, o.n)
          open = Some(OpenIsland(e.start_ms, e.end_ms, 1))
        case None =>
          open = Some(OpenIsland(e.start_ms, e.end_ms, 1))
      }
    }
    open.foreach(state.update)
    closed.result().iterator
  }

  /** Closed islands as they become final; open islands remain in state. */
  def islandUpdates(events: Dataset[IntervalEvent]): Dataset[Island] = {
    import events.sparkSession.implicits._
    events.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.NoTimeout())(update)
  }

  /** Batch-mode replay of the same update (spec twin): fold the whole
    * dataset as one "batch" per key and return closed ++ open islands —
    * must equal [[graft.operators.Intervals.mergeIntervals]].
    */
  def batchIslands(spark: SparkSession,
      events: Seq[IntervalEvent]): Seq[Island] =
    events.groupBy(_.key).toSeq.flatMap { case (k, rows) =>
      var open: Option[OpenIsland] = None
      val closed = Seq.newBuilder[Island]
      for (e <- rows.sortBy(e => (e.start_ms, e.end_ms))) {
        open match {
          case Some(o) if e.start_ms <= o.end =>
            open = Some(OpenIsland(o.start, math.max(o.end, e.end_ms), o.n + 1))
          case Some(o) =>
            closed += Island(k, o.start, o.end, o.n)
            open = Some(OpenIsland(e.start_ms, e.end_ms, 1))
          case None => open = Some(OpenIsland(e.start_ms, e.end_ms, 1))
        }
      }
      closed.result() ++ open.map(o => Island(k, o.start, o.end, o.n))
    }
}

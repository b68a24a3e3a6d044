package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream twin of [[graft.operators.RangeJoin]]: correlate two LIVE
  * event streams within a bounded time window (alert↔cause, view→purchase
  * attribution) using Structured Streaming's watermarked interval join.
  *
  * Same pair semantics as the batch operator —
  * `right.ts ∈ [left.ts, left.ts + windowMs]`, inclusive both ends, equal
  * keys — so StreamingCorrelateSpec can prove batch ≡ stream across
  * micro-batch splits (the StreamingOpsSpec/StreamingFunnel discipline).
  *
  * Scale shape: Spark buffers each side's rows in join state and the
  * time-range condition plus the watermarks give the state a provable
  * eviction bound (a left row can only match rights up to windowMs after
  * it, so once the watermark passes `ts + windowMs + delay` the row is
  * dropped) — state is events-per-watermark-horizon, not the stream's
  * history. An inner interval join emits a pair as soon as both rows have
  * arrived; the watermark only bounds state, so no emission latency is
  * added for in-order streams.
  */
object StreamingCorrelate {

  /** All (left, right) pairs with equal `keyCols` and `right.tsRight ∈
    * [left.tsLeft, left.tsLeft + windowMs]`, over streaming (or batch)
    * DataFrames whose timestamps are epoch-ms longs (the engine-wide
    * convention). Left columns keep their names; non-key right columns
    * come back `r_`-prefixed — the [[graft.operators.RangeJoin.within]]
    * output contract.
    *
    * `watermarkDelay` is the out-of-orderness budget (how late an event
    * may arrive and still join); it bounds state, not correctness for
    * in-order streams.
    */
  def within(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsLeft: String, tsRight: String, windowMs: Long,
      watermarkDelay: String = "1 hour"): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(windowMs > 0, s"windowMs must be positive, got $windowMs")
    val reserved = Seq("__l_event_time", "__r_event_time")
    val clash = (left.columns ++ right.columns).filter(reserved.contains)
    require(clash.isEmpty,
      s"input columns collide with correlate internals: ${clash.distinct.mkString(", ")}")
    // the RangeJoin output contract: left names kept, right r_-prefixed —
    // refuse ambiguous spellings instead of emitting duplicate columns
    val prefixClash = right.columns.filterNot(keyCols.contains)
      .map("r_" + _).filter(left.columns.contains)
    require(prefixClash.isEmpty,
      s"left columns collide with prefixed right columns: ${prefixClash.mkString(", ")}")
    val l = left
      .withColumn("__l_event_time", timestamp_millis(col(tsLeft).cast("long")))
      .withWatermark("__l_event_time", watermarkDelay)
    val r0 = right.select(
      keyCols.map(c => col(c).as(s"__rk_$c")) ++
        right.columns.filterNot(keyCols.contains)
          .map(c => col(c).as(s"r_$c")): _*)
    val r = r0
      .withColumn("__r_event_time", timestamp_millis(col(s"r_$tsRight").cast("long")))
      .withWatermark("__r_event_time", watermarkDelay)
    val keyCond = keyCols.map(c => col(c) === col(s"__rk_$c")).reduce(_ && _)
    val rangeCond = col("__r_event_time") >= col("__l_event_time") &&
      col("__r_event_time") <=
        col("__l_event_time") + expr(s"INTERVAL $windowMs MILLISECOND")
    l.join(r, keyCond && rangeCond, "inner")
      .drop("__l_event_time", "__r_event_time")
      .drop(keyCols.map(c => s"__rk_$c"): _*)
  }
}

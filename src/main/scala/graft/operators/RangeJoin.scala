package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Time-window interval join — "every `right` event within [t, t+window]
  * of a `left` anchor, per key": alert↔cause correlation over the events
  * timeline (which `right` events preceded this alert within the hour),
  * view→purchase attribution, sensor fusion. Complements [[AsOfJoin]]
  * (latest ONE prior event) with the bounded ALL-matches variant.
  *
  * Scale shape — the whole point of this operator: a naive inequality
  * join (`l.key = r.key AND r.ts BETWEEN l.ts AND l.ts + w`) gives
  * Catalyst only a non-equi predicate beyond the key, which on a skewed
  * key degenerates to one task nested-looping a hot key's full history.
  * Here both sides are BUCKETED by floor(ts / window): a right event in
  * [l.ts, l.ts+w] can only live in the anchor's bucket or the next one,
  * so each anchor is emitted under its two candidate buckets and the join
  * is a pure EQUI-join on (key, bucket) — shuffle keyed by (key, bucket),
  * hot keys spread across time buckets, the exact range check a cheap
  * post-filter inside each bucket pair. Join fan-out is bounded by events
  * per (key, 2·window) instead of events per key.
  *
  * Inclusive on both ends ([t, t+w]) — matching DuckDB's BETWEEN so the
  * oracle replays verbatim.
  */
object RangeJoin {

  /** All (left, right) pairs with equal `keyCols` and
    * `right.tsRight ∈ [left.tsLeft, left.tsLeft + windowMs]`. Left columns
    * keep their names; right columns are prefixed `r_`. Timestamps are
    * epoch-ms longs (the engine-wide convention).
    */
  def within(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsLeft: String, tsRight: String, windowMs: Long): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    require(windowMs > 0, s"windowMs must be positive, got $windowMs")
    require(!left.columns.contains("__bucket") && !right.columns.contains("__bucket"),
      "input columns collide with range-join internals: __bucket")
    // left keeps its names and right comes back r_-prefixed — a left column
    // already spelled r_<right column> would produce an ambiguous output
    val prefixClash = right.columns.filterNot(keyCols.contains)
      .map("r_" + _).filter(left.columns.contains)
    require(prefixClash.isEmpty,
      s"left columns collide with prefixed right columns: ${prefixClash.mkString(", ")}")
    // exact floorDiv (negative-epoch safe): subtract the positive pmod so
    // the division is over an exact multiple — no double-rounding at any
    // bucket boundary (the StreamingFunnel floorDiv convention)
    def bucketOf(ts: Column): Column = {
      val t = ts.cast("long")
      ((t - pmod(t, lit(windowMs))) / lit(windowMs)).cast("long")
    }
    val lb = left.withColumn("__bucket",
      explode(array(bucketOf(col(tsLeft)), bucketOf(col(tsLeft)) + lit(1L))))
    val rb = right.select(
      (keyCols.map(col) :+ col(tsRight).as("__r_ts")) ++
        right.columns.filterNot(c => keyCols.contains(c) || c == tsRight)
          .map(c => col(c).as(s"r_$c")): _*)
      .withColumn("__bucket", bucketOf(col("__r_ts")))
    lb.join(rb, keyCols :+ "__bucket")
      .filter(col("__r_ts") >= col(tsLeft) &&
        col("__r_ts") <= col(tsLeft) + lit(windowMs))
      .drop("__bucket")
      .withColumnRenamed("__r_ts", s"r_$tsRight")
  }
}

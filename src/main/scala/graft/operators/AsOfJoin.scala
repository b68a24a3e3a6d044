package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the most recent right row at or before its
  * timestamp, per key — the standard case/alert/market-data lookup Spark has
  * no built-in operator for.
  *
  * Implementation is Spark-first composition (preference (a) of the custom-
  * operator ladder): tag + union both sides, one window pass with
  * `last(_, ignoreNulls)` ordered by (ts, side), then keep left rows. One
  * shuffle on (key), no range-join explosion, no per-row lookups — the same
  * single-pass shape a hand-written merge join would have, but expressed so
  * Catalyst/AQE own partitioning and spill.
  *
  * Ordering ties: right rows sort before left rows at equal ts (side 0 < 1),
  * so an exactly-simultaneous right row IS visible to the left row ("at or
  * before"); among equal-ts right rows the greatest `seqCol` wins.
  */
object AsOfJoin {

  /** @param left    probe side (events needing enrichment)
    * @param right   reference side (state changes / quotes / prior events)
    * @param keyCols equality keys present in both sides
    * @param tsCol   ordering column name (present in both sides)
    * @param seqCol  unique tiebreaker column on the right side
    * @param payload right-side columns to carry to the left rows
    */
  def asOf(
      left: DataFrame, right: DataFrame, keyCols: Seq[String],
      tsCol: String, seqCol: String, payload: Seq[String]): DataFrame = {
    val keep = keyCols ++ Seq(tsCol, seqCol)
    val l = left.withColumn("__side", lit(1))
      .withColumn("__payload", lit(null).cast(payloadType(right, payload)))
    val r = right.select((keep.map(col) :+
        struct(payload.map(col): _*).as("__payload")): _*)
      .withColumn("__side", lit(0))
    val unioned = l.select(
      (left.columns.map(col).toSeq :+ col("__side") :+ col("__payload")): _*)
      .unionByName(r.select(
        (keep.map(col) :+ col("__side") :+ col("__payload")): _*),
        allowMissingColumns = true)
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(tsCol), col("__side"), col(seqCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .drop("__side", "__payload")
  }

  private def payloadType(right: DataFrame, payload: Seq[String]) =
    org.apache.spark.sql.types.StructType(
      payload.map(c => right.schema(c)))
}

/** Sessionization (gaps-and-islands): assign session ids to event streams by
  * inactivity gap — the batch twin of Structured Streaming's
  * `session_window`, and the base for per-session training-data grouping.
  */
object Sessionize {

  /** Adds `session_id` (global: key-prefixed ordinal) and `is_session_start`.
    * One shuffle on the key; window lag + running count, single pass.
    */
  def byGap(
      events: DataFrame, keyCols: Seq[String], tsCol: Column,
      seqCol: Column, gapMs: Long): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(tsCol, seqCol)
    events
      .withColumn("__prev_ts", lag(tsCol, 1).over(w))
      .withColumn("is_session_start",
        col("__prev_ts").isNull || tsCol - col("__prev_ts") > gapMs)
      .withColumn("session_seq",
        sum(when(col("is_session_start"), 1).otherwise(0))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .drop("__prev_ts")
  }

  /** Streaming twin: Structured Streaming's native `session_window` with the
    * same inactivity gap — per-session aggregates with watermark-driven state
    * eviction (SURVEY.md §2.9). `events` must be a streaming DataFrame with
    * event-time column `tsCol`.
    */
  def streamingSessions(
      events: DataFrame, keyCols: Seq[String], tsColName: String,
      valueCol: Column, gap: String = "30 minutes",
      watermark: String = "1 hour"): DataFrame = {
    import org.apache.spark.sql.functions.{session_window => sw}
    events
      .withWatermark(tsColName, watermark)
      .groupBy((sw(col(tsColName), gap) +: keyCols.map(col)): _*)
      .agg(
        count(lit(1)).as("n_events"),
        sum(valueCol.cast("decimal(18,2)")).cast("double").as("session_value"))
  }

  /** Per-session rollup: bounds, size, value sum (exact decimal). */
  def sessionStats(
      sessionized: DataFrame, keyCols: Seq[String], tsCol: Column,
      valueCol: Column): DataFrame =
    sessionized.groupBy((keyCols.map(col) :+ col("session_seq")): _*)
      .agg(
        min(tsCol).as("session_start"),
        max(tsCol).as("session_end"),
        count(lit(1)).as("n_events"),
        sum(valueCol.cast("decimal(18,2)")).cast("double").as("session_value"))
}

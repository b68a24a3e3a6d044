package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Gaps-and-islands interval analytics: merge overlapping-or-touching
  * intervals per key into maximal "islands" and report coverage. The
  * classic SQL shape — a running `max(end)` prefix marks island starts,
  * a running sum of start flags numbers them — partitioned by the key, so
  * state per window partition is one key's intervals, never the table.
  *
  * The reference has no interval operator; this is the standard
  * sessionized-coverage primitive (uptime stitching, exposure windows,
  * on-screen time) for the §2.12 event-analytics north star.
  */
object Intervals {

  private def requireNoScratchClash(df: DataFrame, reserved: String*): Unit = {
    val clash = df.columns.toSet.intersect(reserved.toSet)
    require(clash.isEmpty,
      s"input already has reserved scratch column(s) ${clash.mkString(", ")}")
  }

  /** One row per maximal merged interval ("island") per key: intervals
    * [start, end) that overlap or touch (next.start ≤ running max end)
    * coalesce. `tiebreakCol` must make (start, end, tiebreak) unique per
    * key so the window order — and with it every island id — is total.
    * Output: keys, island_seq (1-based LONG), island_start, island_end,
    * n_intervals, covered_ms.
    */
  def mergeIntervals(df: DataFrame, keyCols: Seq[String], startCol: Column,
      endCol: Column, tiebreakCol: Column): DataFrame = {
    requireNoScratchClash(df, "__start", "__end", "__pmax", "__new", "island_seq")
    val ordered = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(startCol, endCol, tiebreakCol)
    df.withColumn("__start", startCol.cast("long"))
      .withColumn("__end", endCol.cast("long"))
      .withColumn("__pmax", max(col("__end")).over(
        ordered.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("__new",
        when(col("__pmax").isNull || col("__start") > col("__pmax"), 1L).otherwise(0L))
      .withColumn("island_seq", sum(col("__new")).over(
        ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy((keyCols.map(col) :+ col("island_seq")): _*)
      .agg(min(col("__start")).as("island_start"),
        max(col("__end")).as("island_end"),
        count(lit(1)).as("n_intervals"))
      .withColumn("covered_ms", col("island_end") - col("island_start"))
  }

  /** Per-key coverage rollup over [[mergeIntervals]] output: number of
    * islands, total covered time, total gap time inside the key's span.
    */
  def coverageStats(islands: DataFrame, keyCols: Seq[String]): DataFrame =
    islands.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_islands"),
        sum(col("covered_ms")).as("covered_ms"),
        (max(col("island_end")) - min(col("island_start"))
          - sum(col("covered_ms"))).as("gap_ms"))
}

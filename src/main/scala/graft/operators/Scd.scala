package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history build: collapse an ordered
  * per-key attribute stream into validity intervals — one row per distinct
  * consecutive attribute state, with `[valid_from, valid_to)` bounds and a
  * current-row flag.
  *
  * This is the batch shape of "entity state over time" that the
  * reference's audit/event sinks (SURVEY §2.1 S13) only store as raw
  * rows; the SCD2 rollup is what a warehouse consumer actually joins
  * against (as-of semantics via `valid_from <= t < valid_to`).
  *
  * Shape at scale: two window passes over the SAME partitioning
  * (`partitionBy(key) orderBy(ts, tie)`) — Catalyst plans one Exchange +
  * one Sort and runs both windows in a single stage; per-key state is a
  * running lag/lead, never a buffered collect. Skew is bounded by the
  * busiest key's row count, the same bound sessionization carries.
  */
object Scd {

  /** Collapse `df` into SCD2 intervals.
    *
    * @param keyCol   entity key
    * @param tsCol    event-time column (becomes `valid_from`)
    * @param tieCol   unique-per-key tiebreaker for a total order (e.g. an
    *                 event id); also emitted for deterministic downstream
    *                 ordering
    * @param attrCols tracked attribute columns; a row opens a new interval
    *                 iff ANY of them differs null-safely from the previous
    *                 row's value
    */
  def scd2(
      df: DataFrame,
      keyCol: String,
      tsCol: String,
      tieCol: String,
      attrCols: Seq[String]): DataFrame = {
    require(attrCols.nonEmpty, "scd2 needs at least one tracked attribute")
    for (c <- Seq(keyCol, tsCol, tieCol) ++ attrCols)
      require(df.columns.contains(c), s"column $c missing from input schema")
    require(!df.columns.contains("__first"),
      "input already has a column named __first (reserved scratch name)")

    val w = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    // lag(tie) is null exactly on the first row of a key (tie is non-null
    // by contract); attr-only change detection would silently drop a first
    // row whose attributes are all null (null <=> null holds).
    val isFirst = lag(col(tieCol), 1).over(w).isNull
    val changed = attrCols
      .map(c => !(lag(col(c), 1).over(w) <=> col(c)))
      .reduce(_ || _)

    val opens = df
      .withColumn("__first", isFirst || changed)
      .filter(col("__first"))
      .drop("__first")

    val w2 = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    opens
      .withColumn("valid_to", lead(col(tsCol), 1).over(w2))
      .withColumn("is_current", col("valid_to").isNull)
      .withColumnRenamed(tsCol, "valid_from")
      .select((Seq(keyCol) ++ attrCols ++
        Seq("valid_from", "valid_to", "is_current", tieCol)).map(col): _*)
  }
}

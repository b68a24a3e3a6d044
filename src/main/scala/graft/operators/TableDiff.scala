package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Snapshot diff — the change-data-capture primitive between two versions
  * of a keyed table: which rows were added, which removed, and which
  * changed (with the exact set of changed columns).
  *
  * The reference's warehouse is upsert-only (chunk uuid5 dedup,
  * `INSERT OR REPLACE INTO chunks`, internal/server/hive_service.go:82); a
  * 100 TB curation
  * pipeline additionally needs to answer "what moved between snapshot N
  * and N+1" — for incremental re-embedding, cache invalidation, and audit.
  *
  * Shape at scale: ONE full-outer shuffle join on the key columns — the
  * information-theoretic minimum for a diff — with every per-column
  * comparison a codegen'd null-safe equality in the join's project. No
  * window, no collect, no second pass. When both snapshots are written
  * with [[graft.sources.Warehouse.writeBucketed]] on the key, the join
  * plans as a zero-Exchange sort-merge join and the diff never shuffles
  * at all.
  */
object TableDiff {

  /** Rows of `next` minus/changed-from `base`, keyed by `keys`.
    *
    * Output: the key columns (coalesced across sides), `change` in
    * ('added', 'removed', 'changed'), and `changed_columns` — the
    * alphabetical comma-joined list of `compareCols` whose values differ
    * null-safely (empty string for added/removed rows, where column-level
    * attribution is meaningless). Unchanged rows are dropped.
    *
    * Null semantics: comparisons are null-safe (`<=>`), so null == null
    * is "unchanged" and null vs value is a change — matching SQL's
    * IS DISTINCT FROM, not the null-propagating `=`.
    */
  def diff(
      base: DataFrame,
      next: DataFrame,
      keys: Seq[String],
      compareCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "diff needs at least one key column")
    require(compareCols.nonEmpty, "diff needs at least one compare column")
    val needed = keys ++ compareCols
    for (df <- Seq(base, next); c <- needed)
      require(df.columns.contains(c), s"column $c missing from input schema")
    for (df <- Seq(base, next); c <- Seq("__b", "__n"))
      require(!df.columns.contains(c),
        s"input already has a column named $c (reserved scratch name)")

    val b = base.select(needed.map(col) :+ lit(1).as("__b"): _*).alias("b")
    val n = next.select(needed.map(col) :+ lit(1).as("__n"): _*).alias("n")
    // PLAIN equality on keys, not <=>: null-safe key equality compiles to
    // coalesce/isnull composite join keys, which the planner cannot match
    // to a bucketBy(key) layout — the zero-Exchange bucketed diff would
    // silently re-shuffle. Keys are non-null by CDC contract; a null-keyed
    // row classifies as removed+added (never matches), not changed.
    val cond = keys.map(k => col(s"b.$k") === col(s"n.$k")).reduce(_ && _)
    val joined = b.join(n, cond, "full_outer")

    val change = when(col("b.__b").isNull, lit("added"))
      .when(col("n.__n").isNull, lit("removed"))
      .otherwise(lit("changed"))
    // concat_ws skips nulls, so each unchanged column contributes nothing.
    val changedList = concat_ws(",",
      compareCols.sorted.map(c =>
        when(!(col(s"b.$c") <=> col(s"n.$c")), lit(c))): _*)
    val anyDiff = compareCols.map(c => !(col(s"b.$c") <=> col(s"n.$c")))
      .reduce(_ || _)

    joined
      .filter(col("b.__b").isNull || col("n.__n").isNull || anyDiff)
      .select(
        keys.map(k => coalesce(col(s"b.$k"), col(s"n.$k")).as(k)) ++ Seq(
          change.as("change"),
          when(change === "changed", changedList).otherwise(lit(""))
            .as("changed_columns")): _*)
  }
}

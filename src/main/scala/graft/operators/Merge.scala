package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** CDC changeset application — the batch MERGE INTO: fold a versioned
  * stream of upserts/deletes into a keyed base table, latest version
  * wins, deletes tombstone the key.
  *
  * Complements [[TableDiff]] (which PRODUCES a changeset) and the
  * reference's uuid5 upsert sink (SURVEY §2.1 S10, which is the
  * degenerate version-free case): `applyChanges(base, diff)` round-trips
  * a snapshot.
  *
  * Shape at scale: one union (no shuffle) + one `row_number` window on
  * the key. The window picks one winner per key, so Spark's
  * WindowGroupLimit pushes the rank filter map-side — per-key state in
  * the shuffle is the current best row, not the full change history.
  * At 100 TB this is exactly Delta/Iceberg's merge-on-read compaction
  * shape, expressed as a plain DataFrame op.
  */
object Merge {

  /** Apply `changes` to `base`.
    *
    * `base` rows participate as version `baseVersion` upserts (default
    * −1, i.e. older than every change). `changes` must carry `versionCol`
    * (BIGINT-comparable, unique per key by contract — ties would make
    * the winner ambiguous, so the tiebreak is the op: delete beats
    * upsert at the same version) and `opCol` with values
    * 'upsert'/'delete'. Output: the winning upsert rows, base schema,
    * without the version/op bookkeeping columns.
    */
  def applyChanges(
      base: DataFrame,
      changes: DataFrame,
      keys: Seq[String],
      versionCol: String,
      opCol: String,
      baseVersion: Long = -1L): DataFrame = {
    require(keys.nonEmpty, "applyChanges needs at least one key column")
    for (k <- keys) {
      require(base.columns.contains(k), s"key $k missing from base")
      require(changes.columns.contains(k), s"key $k missing from changes")
    }
    require(changes.columns.contains(versionCol), s"changes lacks $versionCol")
    require(changes.columns.contains(opCol), s"changes lacks $opCol")
    for (c <- Seq(versionCol, opCol))
      require(!base.columns.contains(c),
        s"base already has a column named $c (bookkeeping name)")
    require(!base.columns.contains("__rn") && !changes.columns.contains("__rn"),
      "__rn is a reserved scratch name")

    val dataCols = base.columns.toSeq
    for (c <- dataCols)
      require(changes.columns.contains(c),
        s"changes lacks base column $c (upserts must carry the full row)")

    val b = base
      .withColumn(versionCol, lit(baseVersion))
      .withColumn(opCol, lit("upsert"))
      .select((dataCols ++ Seq(versionCol, opCol)).map(col): _*)
    val c = changes.select((dataCols ++ Seq(versionCol, opCol)).map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(versionCol).desc, col(opCol).asc) // 'delete' < 'upsert'
    b.unionByName(c)
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opCol) === "upsert")
      .select(dataCols.map(col): _*)
  }

  /** Incremental AGGREGATE maintenance — update a (count, DECIMAL sums)
    * aggregate snapshot from a row-level delta without recomputing the
    * base: the delta aggregates map-side with each row weighted by `op`
    * (+1 insert, −1 delete), then one full-outer join per key adds the
    * images. Decrementable aggregates only (count/sum — min/max cannot
    * retract); groups whose count reaches zero drop out; a count driven
    * NEGATIVE means the delta deleted rows the base never had — that is
    * a data bug, surfaced loudly (one bounded scalar probe, not a silent
    * wrong snapshot). `baseAgg` columns: keys, `n`, then `sumCols` names.
    */
  def incrementalSumAgg(
      baseAgg: DataFrame, delta: DataFrame, keys: Seq[String],
      opCol: Column, sumCols: Seq[(String, Column)]): DataFrame = {
    require(keys.nonEmpty, "incrementalSumAgg needs at least one key column")
    require(baseAgg.columns.contains("n"), "baseAgg must carry count column n")
    for ((name, _) <- sumCols)
      require(baseAgg.columns.contains(name), s"baseAgg lacks sum column $name")
    val dAggs = sum(opCol.cast("long")).as("__dn") +:
      sumCols.map { case (name, c) => sum(opCol * c).as(s"__d_$name") }
    val dAgg = delta.groupBy(keys.map(col): _*).agg(dAggs.head, dAggs.tail: _*)
    val joined = baseAgg.join(dAgg, keys, "full_outer")
      .withColumn("__n_new",
        coalesce(col("n"), lit(0L)) + coalesce(col("__dn"), lit(0L)))
    val negatives = joined.filter(col("__n_new") < 0).limit(1).count()
    require(negatives == 0L,
      "delta retracts rows absent from the base aggregate — refusing to " +
        "publish a corrupt snapshot")
    val merged = sumCols.foldLeft(joined) { case (df, (name, _)) =>
      df.withColumn(name,
        when(col(name).isNull, col(s"__d_$name"))
          .when(col(s"__d_$name").isNull, col(name))
          .otherwise(col(name) + col(s"__d_$name")))
    }
    merged.filter(col("__n_new") > 0)
      .withColumn("n", col("__n_new"))
      .drop(("__n_new" +: "__dn" +: sumCols.map(c => s"__d_${c._1}")): _*)
  }
}

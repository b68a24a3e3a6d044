package graft.operators

import org.apache.spark.sql.DataFrame
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
}

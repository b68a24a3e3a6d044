package graft.streaming

import graft.operators.Merge
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming CDC materialization — the stream twin of
  * [[graft.operators.Merge.applyChanges]]: a change stream (versioned
  * upserts/deletes) continuously materialized as a queryable latest-wins
  * table.
  *
  * Storage is a merge-on-read lakehouse miniature in plain parquet:
  *
  *   store/changelog/batch_id=N/   one partition per micro-batch,
  *                                 dynamic-overwrite (replay idempotent)
  *   store/base/                   optional compacted snapshot
  *
  * Reads resolve base ∪ changelog with latest-wins at query time;
  * [[compact]] folds the changelog into the base with the Warehouse
  * stage/retire/promote rename discipline. Winners are decided by the
  * VERSION column, not arrival order, so the resolved state is
  * independent of micro-batch boundaries — the property the spec pins
  * (any split of the same changes ≡ one-shot batch apply).
  *
  * Scale shape: each micro-batch does ONE append-only write (no read, no
  * shuffle of the store); merge cost is paid on read/compaction as one
  * row_number window per key — WindowGroupLimit keeps per-key state at
  * the current winner. Compaction replay is idempotent (re-folding an
  * already-folded changelog reproduces the same winners), so a crash
  * between base promote and changelog cleanup loses nothing.
  */
object StreamingMerge {

  private def fs(spark: SparkSession, p: String) =
    new org.apache.hadoop.fs.Path(p)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def readIfExists(spark: SparkSession, p: String): Option[DataFrame] = {
    val hp = new org.apache.hadoop.fs.Path(p)
    if (fs(spark, p).exists(hp)) Some(spark.read.parquet(p)) else None
  }

  /** The changelog's live batch partitions. A compaction crash after
    * deleting the last `batch_id=` partition but before deleting the root
    * leaves a file-less dir (only _SUCCESS) whose parquet read fails on
    * schema inference — so every changelog read keys off the PARTITION
    * DIRS, not the root's existence, and a partition-less root counts as
    * absent (recoverable) instead of wedging the store.
    */
  private def changelogBatchDirs(
      spark: SparkSession, storePath: String): Seq[org.apache.hadoop.fs.Path] = {
    val logPath = new org.apache.hadoop.fs.Path(s"$storePath/changelog")
    val f = fs(spark, storePath)
    if (!f.exists(logPath)) Seq.empty
    else f.listStatus(logPath).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("batch_id="))
      .map(_.getPath)
  }

  /** The changelog as a DataFrame, or None when no batch partition is live
    * (absent root, or the crash-window root holding only _SUCCESS).
    */
  private def readChangelogIfExists(
      spark: SparkSession, storePath: String): Option[DataFrame] =
    if (changelogBatchDirs(spark, storePath).isEmpty) None
    else Some(spark.read.parquet(s"$storePath/changelog"))

  /** Append one micro-batch of changes (data cols + version + op) to the
    * changelog. Dynamic partition overwrite: a replayed batch rewrites its
    * own `batch_id` partition instead of duplicating it.
    */
  def appendBatch(batch: DataFrame, storePath: String, batchId: Long): Unit =
    batch.withColumn("batch_id", lit(batchId))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(s"$storePath/changelog")

  /** The resolved latest-wins state: base ∪ changelog folded by version.
    * Missing base = empty bootstrap; missing changelog = just the base;
    * both missing is an error (reading an unwritten store is a bug, not
    * an empty table — the StreamingDedup loud-failure rule).
    */
  def currentState(
      spark: SparkSession, storePath: String, keys: Seq[String],
      versionCol: String, opCol: String): DataFrame = {
    val base = readIfExists(spark, s"$storePath/base")
    val log = readChangelogIfExists(spark, storePath)
      .map(_.drop("batch_id"))
    (base, log) match {
      case (Some(b), Some(l)) =>
        Merge.applyChanges(b, l, keys, versionCol, opCol)
      case (Some(b), None) => b
      case (None, Some(l)) =>
        // bootstrap: empty base with the changelog's data schema
        val data = l.drop(versionCol, opCol)
        Merge.applyChanges(data.limit(0), l, keys, versionCol, opCol)
      case (None, None) =>
        throw new java.io.IOException(
          s"merge store $storePath has neither base nor changelog")
    }
  }

  /** Fold the changelog into the base snapshot and clear it. Crash-safe:
    * the new base is staged and promoted by rename (stage/retire/promote);
    * the changelog is deleted only after the promote, and a crash before
    * the delete merely re-folds an already-folded changelog (idempotent —
    * winners are version-decided). Caller must be the store's only writer
    * for the duration (pause the stream), same contract as
    * `Warehouse.compactOrganization`.
    */
  def compact(
      spark: SparkSession, storePath: String, keys: Seq[String],
      versionCol: String, opCol: String): Unit = {
    val f = fs(spark, storePath)
    val basePath = new org.apache.hadoop.fs.Path(s"$storePath/base")
    val logPath = new org.apache.hadoop.fs.Path(s"$storePath/changelog")
    val staging = new org.apache.hadoop.fs.Path(s"$storePath/.base-staging")
    val retired = new org.apache.hadoop.fs.Path(s"$storePath/.base-retired")
    if (!f.exists(logPath)) return // nothing to fold
    val resolved = currentState(spark, storePath, keys, versionCol, opCol)
    if (f.exists(staging)) f.delete(staging, true)
    resolved.write.mode(SaveMode.Overwrite).parquet(staging.toString)
    if (f.exists(retired)) f.delete(retired, true)
    if (f.exists(basePath) && !f.rename(basePath, retired))
      throw new java.io.IOException(s"failed to retire $basePath")
    if (!f.rename(staging, basePath)) {
      if (f.exists(retired)) f.rename(retired, basePath) // roll back
      throw new java.io.IOException(s"failed to promote $staging")
    }
    f.delete(retired, true)
    f.delete(logPath, true)
  }

  // ---- Versioned-base mode (round 9, VERDICT r8 task 3) ----------------
  // The rename-promote compact above leaves a window where `base/` is
  // briefly absent and gives readers no isolation from the fold. With the
  // base kept as a [[graft.sources.SnapshotStore]] root
  // (store/base/_manifests + store/base/data), the fold publishes a NEW
  // base version in one manifest commit: a reader that resolved before
  // the fold keeps its version, time travel covers retained history, and
  // the crash windows collapse to (a) orphan data dir before the commit
  // (swept by expireSnapshots) and (b) already-folded changelog after it
  // (re-folding is idempotent — winners are version-decided).

  /** [[currentState]] with a snapshot-store base: the resolved latest-wins
    * view over the base version (default: latest committed) plus the live
    * changelog. `version` pins the base for time travel.
    */
  def currentStateVersioned(
      spark: SparkSession, storePath: String, keys: Seq[String],
      versionCol: String, opCol: String,
      version: Option[Int] = None): DataFrame = {
    val baseRoot = s"$storePath/base"
    val base =
      if (graft.sources.SnapshotStore.versions(spark, baseRoot).nonEmpty)
        Some(graft.sources.SnapshotStore.read(spark, baseRoot, version))
      else None
    val log = readChangelogIfExists(spark, storePath)
      .map(_.drop("batch_id"))
    (base, log) match {
      case (Some(b), Some(l)) =>
        Merge.applyChanges(b, l, keys, versionCol, opCol)
      case (Some(b), None) => b
      case (None, Some(l)) =>
        val data = l.drop(versionCol, opCol)
        Merge.applyChanges(data.limit(0), l, keys, versionCol, opCol)
      case (None, None) =>
        throw new java.io.IOException(
          s"merge store $storePath has neither base nor changelog")
    }
  }

  /** Fold the changelog into a NEW base snapshot version and clear the
    * folded batches. Concurrent READERS need no care from the caller:
    * whatever version they resolved stays on disk until
    * `SnapshotStore.expireSnapshots(storePath + "/base")`. Concurrent
    * WRITERS keep [[compact]]'s contract — pause the append stream for
    * the fold — but the blast radius of violating it is bounded: the
    * batch ids present at entry are CAPTURED first, only those rows are
    * folded, and only those `batch_id=` partitions are deleted, so a
    * batch that lands mid-fold survives in the changelog and folds next
    * time (instead of being deleted unfolded — silent loss). Returns the
    * committed base version, or None when there was nothing to fold.
    */
  def compactVersioned(
      spark: SparkSession, storePath: String, keys: Seq[String],
      versionCol: String, opCol: String): Option[Int] = {
    val logPath = new org.apache.hadoop.fs.Path(s"$storePath/changelog")
    val f = fs(spark, storePath)
    // key off the batch_id= partition dirs, not the root: a crash between
    // the last partition delete and the root delete leaves a file-less
    // root that parquet schema inference chokes on — treat it as absent
    // (and sweep it) so the store recovers without manual cleanup
    if (changelogBatchDirs(spark, storePath).isEmpty) {
      if (f.exists(logPath)) f.delete(logPath, true)
      return None
    }
    // capture the fold set ONCE; everything below references exactly it
    val foldIds = spark.read.parquet(logPath.toString)
      .select(col("batch_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSeq.sorted
    if (foldIds.isEmpty) return None
    val baseRoot = s"$storePath/base"
    val base =
      if (graft.sources.SnapshotStore.versions(spark, baseRoot).nonEmpty)
        Some(graft.sources.SnapshotStore.read(spark, baseRoot))
      else None
    val log = spark.read.parquet(logPath.toString)
      .filter(col("batch_id").cast("long").isin(foldIds: _*))
      .drop("batch_id")
    val resolved = base match {
      case Some(b) => Merge.applyChanges(b, log, keys, versionCol, opCol)
      case None =>
        val data = log.drop(versionCol, opCol)
        Merge.applyChanges(data.limit(0), log, keys, versionCol, opCol)
    }
    val v = graft.sources.SnapshotStore.overwrite(spark, baseRoot, resolved)
    // only after the commit — a crash here re-folds idempotently; delete
    // ONLY the folded partitions (directory names are the long values the
    // cast above parsed, so the round-trip is exact)
    foldIds.foreach { id =>
      f.delete(new org.apache.hadoop.fs.Path(logPath, s"batch_id=$id"), true)
    }
    // retire the changelog root only when nothing remains (a mid-fold
    // append keeps it alive); a root holding only _SUCCESS would poison
    // the next read's schema inference
    val leftover = f.listStatus(logPath).exists(s =>
      s.isDirectory && s.getPath.getName.startsWith("batch_id="))
    if (!leftover) f.delete(logPath, true)
    Some(v)
  }

  /** Streaming wiring: each micro-batch appends to the changelog. The
    * store stays queryable throughout via [[currentState]].
    */
  def run(
      changes: DataFrame, storePath: String,
      checkpoint: String): org.apache.spark.sql.streaming.StreamingQuery =
    changes.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        appendBatch(batch, storePath, batchId)
      }
      .start()
}

package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Warehouse sinks for the chunks table (SURVEY.md §2.1 S10-S12).
  *
  * Layout: parquet partitioned by `organization_id` — the tenant predicate
  * (F4) becomes partition pruning, and tenant purge (S12) becomes a
  * partition-level delete instead of the reference's scroll+batched-delete
  * loop (vectordb.go:403-591). On a transactional format (Delta/Iceberg)
  * `writeChunks` is a MERGE on id and `purgeOrganization` a
  * `DELETE WHERE organization_id = ?`; plain parquet gets the same semantics
  * via idempotent ids + partition overwrite/delete.
  */
object Warehouse {

  /** S10/S11: land chunks idempotently, partitioned by tenant. */
  def writeChunks(chunks: DataFrame, path: String): Unit =
    Ingest.idempotent(chunks)
      .write.mode("append").partitionBy("organization_id").parquet(path)

  // ---- Versioned-commit mode (round 9, VERDICT r8 task 3) --------------
  // The rename-swap paths above are honest about their plain-parquet
  // limits: readers can catch a partition mid-swap, and old data is gone
  // the moment the swap completes. The reference gets reader/writer
  // safety on every path from SQLite WAL (cmd/hive-server/main.go:140-149);
  // here the same guarantees come from running the chunks table as a
  // [[SnapshotStore]] root — every write is a manifest commit, a reader
  // resolves ONE version at open and keeps it through any concurrent
  // compaction, and time travel covers retained history. These are the
  // production write/read/compact paths for deployments that want
  // isolation without a lakehouse format; the plain-parquet paths remain
  // for layouts owned by external writers.

  /** [[writeChunks]] as a snapshot commit: idempotent chunk rows land as a
    * new immutable tenant-partitioned data dir plus a manifest publish.
    * Returns the committed version. Concurrent appends collide loudly
    * (optimistic concurrency) instead of interleaving files.
    */
  def writeChunksVersioned(
      spark: SparkSession, chunks: DataFrame, root: String,
      expectedBase: Option[Int] = None): Int =
    SnapshotStore.append(spark, root, Ingest.idempotent(chunks),
      expectedBase, partitionBy = Seq("organization_id"))

  /** Open the chunks table at a version (default: latest). Resolution is
    * pinned at this call — a compaction committing mid-read changes
    * nothing the returned DataFrame references.
    */
  def readChunksVersioned(
      spark: SparkSession, root: String, version: Option[Int] = None): DataFrame =
    SnapshotStore.read(spark, root, version)

  /** Small-files compaction as a snapshot commit: the current version is
    * rewritten into ≈`filesPerTenantLeaf` files per tenant leaf and
    * published as a NEW version — no absent-partition window, no
    * single-writer swap contract; readers of the old version keep it until
    * [[SnapshotStore.expireSnapshots]] retires it. Returns the new version.
    */
  def compactChunksVersioned(
      spark: SparkSession, root: String, filesPerTenantLeaf: Int = 1): Int =
    SnapshotStore.compact(spark, root, filesPerTenantLeaf,
      partitionBy = Seq("organization_id"))

  /** [[writeChunks]] with a z-ordered file layout inside each tenant
    * partition: rows are range-partitioned and sorted by the Morton
    * interleave of `zDims` ([[graft.functions.ZOrder]]), so every parquet
    * file carries tight min/max statistics on EVERY interleaved dimension —
    * selective predicates on any of them skip most files at scan time
    * (WarehouseSpec quantifies the candidate-file fraction vs a
    * single-column sort; a one-column layout only skips on that column).
    * The multi-dimensional row-skipping lever for the 100 TB chunks table;
    * costs one range shuffle (plus one distinct-count pass to size it) at
    * write, nothing at read.
    *
    * Dimensions must already be non-negative ints fitting `bitsPerDim`
    * bits — pre-bin wider domains with [[graft.functions.ZOrder.quantileBins]]
    * / `binByBoundaries`. Out-of-range values SATURATE at the bin edges
    * (order-preserving, so stats stay tight) instead of aliasing modulo
    * 2^bits. The range-partition count scales with the tenant count so each
    * tenant keeps ≈`filesPerTenant` files (range boundaries are sampled
    * over (tenant, z) jointly — data-proportional, bigger tenants get more
    * files, which is the right file-size behavior).
    */
  def writeChunksZOrdered(
      chunks: DataFrame, path: String, zDims: Seq[org.apache.spark.sql.Column],
      bitsPerDim: Int = 8, filesPerTenant: Int = 8): Unit = {
    val deduped = Ingest.idempotent(chunks)
    val maxV = (1L << bitsPerDim) - 1
    val clamped = zDims.map(c =>
      least(greatest(c.cast("long"), lit(0L)), lit(maxV)))
    val nTenants = math.max(1L,
      deduped.select("organization_id").distinct().count()).toInt
    deduped
      .withColumn("__z", graft.functions.ZOrder.interleave(clamped, bitsPerDim))
      .repartitionByRange(filesPerTenant * nTenants,
        col("organization_id"), col("__z"))
      .sortWithinPartitions(col("organization_id"), col("__z"))
      .drop("__z")
      .write.mode("append").partitionBy("organization_id").parquet(path)
  }

  /** Write a fact table bucketed (and sorted) on its join key — the layout
    * that turns a fact-fact equi-join into local merges with NO shuffle on
    * either side (BucketingSpec proves the Exchange-free plan; SCALE.md
    * carries the q02/q03 capture). Both sides of a co-located join must use
    * the SAME bucket count on their join keys.
    *
    * Bucket metadata lives in the catalog, so this is a `saveAsTable`;
    * pass `path` to keep the files external to the warehouse dir. Size
    * `nBuckets` so one bucket of the LARGER fact fits an executor's scan
    * budget (at 100 TB of lineitem-shaped data, thousands of buckets —
    * the write shuffles once on the bucket hash, every subsequent join of
    * the co-bucketed facts shuffles never).
    */
  def writeBucketed(
      df: DataFrame, table: String, bucketCol: String, nBuckets: Int,
      path: Option[String] = None, sortCols: Seq[String] = Seq.empty): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    val sorts = if (sortCols.nonEmpty) sortCols else Seq(bucketCol)
    val writer = df.write
      .bucketBy(nBuckets, bucketCol)
      .sortBy(sorts.head, sorts.tail: _*)
      .mode("overwrite")
    path.fold(writer)(p => writer.option("path", p)).saveAsTable(table)
  }

  def readChunks(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  /** Latest-state view over appended history: one row per chunk id, the
    * most recently written wins (re-ingests append new versions under the
    * same uuid5 id; a transactional format would MERGE instead). Equal
    * timestamps tiebreak on the content hash so the view is deterministic.
    */
  def latestChunks(spark: SparkSession, path: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id"))
      .orderBy(col("created_at").desc,
        org.apache.spark.sql.functions.md5(col("content")).desc)
    readChunks(spark, path)
      .withColumn("__rn", org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** The stage/retire/promote partition swap shared by
    * [[compactOrganization]] and [[rewriteWithoutDocuments]]: the live
    * partition is retired by rename (recoverable), staging is promoted by
    * rename, and the old data is deleted only after the new data is live —
    * so a crash never loses committed rows (a crash between the renames
    * leaves the data intact under `.retired-*`, recoverable by renaming it
    * back). Honest limits of plain parquet (a transactional format lifts
    * both): (1) there is NO atomic directory swap, so a concurrent reader
    * listing between the two renames sees the partition briefly ABSENT —
    * old-or-new-never-mixed holds, old-or-new-always-present does not;
    * (2) the caller must be the partition's only writer for the swap's
    * duration — a concurrent append between the renames would land in a
    * recreated live dir and be clobbered, which the promote guards against
    * by failing (and rolling back) rather than renaming INTO the recreated
    * directory.
    */
  private def swapPartition(
      fs: org.apache.hadoop.fs.FileSystem,
      staging: Path, partPath: Path, retired: Path): Unit = {
    if (fs.exists(retired)) fs.delete(retired, true)
    if (!fs.rename(partPath, retired))
      throw new java.io.IOException(s"failed to retire $partPath")
    if (fs.exists(partPath)) {
      // a concurrent writer recreated the live dir mid-swap: renaming now
      // would move staging INSIDE it (HDFS rename-into-dir semantics) and
      // the retired delete would destroy the writer's data — refuse loudly
      fs.rename(retired, partPath)
      throw new java.io.IOException(
        s"concurrent writer recreated $partPath during swap; rolled back")
    }
    if (!fs.rename(staging, partPath)) {
      fs.rename(retired, partPath) // roll back; old data is still intact
      throw new java.io.IOException(s"failed to promote $staging")
    }
    fs.delete(retired, true)
  }

  /** Small-files compaction for one tenant partition — the housekeeping op
    * incremental ingest makes mandatory at scale: every micro-batch append
    * lands more files, and a 100 TB table's scan cost grows with FILE COUNT
    * (listing, footer reads, task scheduling) long before data volume. Rows
    * are rewritten into ≈`targetFileBytes` files (estimated from the
    * partition's current on-disk bytes — parquet-to-parquet size is
    * roughly preserved), sorted by `sortCols` inside each file so min/max
    * stats stay tight. A partition with no data files is a no-op (0, 0).
    *
    * Crash-safe via [[swapPartition]] — read its contract: the caller must
    * be this partition's ONLY writer while compaction runs (pause the
    * ingest stream for the tenant, or take maintenance-window ownership);
    * concurrent readers may see the partition briefly absent between the
    * renames. Returns (filesBefore, filesAfter).
    */
  def compactOrganization(
      spark: SparkSession, path: String, organizationId: String,
      targetFileBytes: Long = 128L * 1024 * 1024,
      sortCols: Seq[String] = Seq("document_id", "chunk_index")): (Int, Int) = {
    require(targetFileBytes > 0, s"targetFileBytes must be positive, got $targetFileBytes")
    val partPath = new Path(path, s"organization_id=$organizationId")
    val fs = partPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    require(fs.exists(partPath), s"no partition for organization $organizationId")
    val dataFiles = fs.listStatus(partPath)
      .filter(s => !s.isDirectory && !s.getPath.getName.startsWith("_")
        && !s.getPath.getName.startsWith("."))
    val nBefore = dataFiles.length
    if (nBefore == 0) return (0, 0) // metadata-only dir: nothing to compact
    val bytes = dataFiles.map(_.getLen).sum
    val nFiles = math.max(1, math.ceil(bytes.toDouble / targetFileBytes).toInt)
    val rows = spark.read.parquet(partPath.toString)
    val sorts = sortCols.filter(rows.columns.contains).map(col)
    val compacted =
      if (sorts.nonEmpty) rows.repartitionByRange(nFiles, sorts: _*)
        .sortWithinPartitions(sorts: _*)
      else rows.repartition(nFiles)
    val staging = new Path(path, s".compact-organization_id=$organizationId")
    val retired = new Path(path, s".retired-organization_id=$organizationId")
    if (fs.exists(staging)) fs.delete(staging, true)
    compacted.write.mode("overwrite").parquet(staging.toString)
    swapPartition(fs, staging, partPath, retired)
    val nAfter = fs.listStatus(partPath)
      .count(s => !s.isDirectory && s.getPath.getName.endsWith(".parquet"))
    (nBefore, nAfter)
  }

  /** S12: tenant purge = drop the tenant's partition directory (the logical
    * equivalent of `DELETE FROM chunks WHERE organization_id = ?`,
    * purge_handler.go:96-122 — without the 1000-point batching artifact).
    */
  def purgeOrganization(spark: SparkSession, path: String, organizationId: String): Boolean = {
    val partition = new Path(path, s"organization_id=$organizationId")
    val fs = partition.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(partition) && fs.delete(partition, true)
  }

  /** S12: purge-all (vectordb.go:403-485) — recreate the table root. */
  def purgeAll(spark: SparkSession, path: String): Boolean = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.exists(root) && fs.delete(root, true)
  }

  /** Latest DOCUMENT state: for each document, only the chunks of its most
    * recent ingest run (all rows of one run share a created_at). Unlike
    * [[latestChunks]] (per-chunk-id), this correctly drops the stale tail
    * when a re-ingested document shrinks to fewer chunks — chunk ids
    * path-2..4 from v1 no longer shadow a 2-chunk v2.
    */
  def latestDocuments(spark: SparkSession, path: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("document_id"))
    readChunks(spark, path)
      .withColumn("__max_ts",
        org.apache.spark.sql.functions.max(col("created_at")).over(w))
      .filter(col("created_at") === col("__max_ts"))
      .drop("__max_ts")
      .dropDuplicates("id")
  }

  /** S12 delete-by-id (vectordb.go:382-400): the read-path view with a set
    * of deleted document ids applied — an anti-join, the scalable logical
    * delete. Physical deletion on plain parquet = rewrite of affected
    * tenant partitions ([[rewriteWithoutDocuments]]); on a transactional
    * format it is a `DELETE WHERE document_id IN (...)`.
    */
  def applyDeletes(chunks: DataFrame, deletedDocIds: DataFrame): DataFrame =
    chunks.join(deletedDocIds.select(col("document_id")),
      Seq("document_id"), "left_anti")

  /** Physical delete: rewrite only the tenant partitions that contain the
    * doomed documents. Crash-safe via [[swapPartition]] (see its contract:
    * single writer per partition during the swap; readers may see the
    * partition briefly absent between the renames).
    */
  def rewriteWithoutDocuments(
      spark: SparkSession, path: String, docIds: Seq[String]): Unit = {
    val all = readChunks(spark, path)
    val affectedOrgs = all
      .filter(col("document_id").isin(docIds: _*))
      .select("organization_id").distinct()
      .collect().map(_.getString(0))
    affectedOrgs.foreach { org =>
      val partPath = new Path(path, s"organization_id=$org")
      val staging = new Path(path, s".staging-organization_id=$org")
      val retired = new Path(path, s".retired-organization_id=$org")
      val fs = partPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
      val kept = spark.read.parquet(partPath.toString)
        .filter(!col("document_id").isin(docIds: _*))
      kept.write.mode("overwrite").parquet(staging.toString)
      swapPartition(fs, staging, partPath, retired)
    }
  }

  /** A4: per-file ingest tally — successes vs failures per source file
    * (ingest_handler.go:97-171 success/failedChunks counters). Expects a
    * DataFrame with (path, ok BOOLEAN) rows from the parse stage.
    */
  def ingestTally(parsedStatus: DataFrame): DataFrame =
    parsedStatus.groupBy(col("path")).agg(
      sum(when(col("ok"), 1).otherwise(0)).as("n_success"),
      sum(when(!col("ok"), 1).otherwise(0)).as("n_failed"))
}

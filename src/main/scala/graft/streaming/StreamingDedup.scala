package graft.streaming

import graft.functions.GraftFunctions
import graft.operators.Dedup
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental near-duplicate dedup for a continuously arriving corpus —
  * the production LLM-pipeline pattern: each micro-batch is deduped
  * (1) within itself (redelivered ids + exact + MinHash-LSH near-dup), then
  * (2) against the ACCUMULATED signature store via an LSH band join, and
  * survivors' signatures are appended to the store.
  *
  * Scale shape: the store is a table (parquet/lakehouse), not executor
  * memory — restart safety, compaction and TTL come from the storage layer.
  * Each batch performs ONE read of the store with the (small) batch side
  * broadcast, so the store is never shuffled — and the store is laid out
  * partitioned by `band_bucket` (= band_key mod [[NumBandBuckets]]), so
  * that read PRUNES to the buckets the batch's band keys can collide with
  * (a directory-level PartitionFilter, not a full scan). A micro-batch of
  * b docs touches ≤ min(b·bands, NumBandBuckets) buckets of the
  * accumulated store; at cluster scale raise NumBandBuckets into the
  * thousands so a trigger's read stays a small fraction of a 100 TB store.
  *
  * Replay safety: both sinks are written as `batch_id=N` partitions with
  * dynamic partition overwrite — a replayed batch overwrites its own
  * partitions instead of appending duplicates (signatures are
  * deterministic, so a replay regenerates identical band_bucket leaves).
  */
object StreamingDedup {

  /** Store partition fan-out. Bounded so the bucket set of a batch can be
    * collected driver-side (≤ this many ints) to drive partition pruning.
    */
  val NumBandBuckets = 64

  /** Exploded band-signature rows for a batch: (doc_id, sig, band_idx,
    * band_key). The store holds exactly these columns (doc_id as STRING —
    * id-type agnostic; uuid5 chunk ids are strings).
    */
  def bandRows(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    bandRowsFromSigs(Dedup.minhashSignatures(docs, idCol, textCol, n), idCol)

  /** The store-row projection over precomputed signatures — shared by
    * [[bandRows]] (store bootstrap) and [[processBatch]] (which hashes the
    * batch once and must not recompute signatures for the projection).
    */
  private def bandRowsFromSigs(sigs: DataFrame, idCol: String): DataFrame =
    sigs.select(col(idCol).cast("string").as("doc_id"), col("sig"),
      posexplode(col("bands")).as(Seq("band_idx", "band_key")))
      .withColumn("band_bucket",
        pmod(col("band_key"), lit(NumBandBuckets.toLong)).cast("int"))

  /** One batch against one store state (pure — unit-testable without a
    * stream): returns (survivors, survivorBandRows).
    *
    *  - redelivered ids within the batch collapse first (`dropDuplicates`)
    *  - within-batch near-dups collapse to their min-id representative
    *  - a batch doc whose estimated Jaccard vs ANY stored signature sharing
    *    an LSH band is ≥ `minEstJaccard` is dropped as a duplicate
    *
    * Signatures are computed ONCE (the band rows are localCheckpoint'ed and
    * reused for both the store join and the returned survivor rows).
    */
  def processBatch(
      batch: DataFrame, store: DataFrame, idCol: String, textCol: String,
      minEstJaccard: Double = 0.8, n: Int = 3): (DataFrame, DataFrame) = {
    // (1) within-batch: redelivered ids, then near-dup collapse to min-id
    // rep. Signatures are hashed ONCE for the whole batch (localCheckpoint)
    // and reused for both the within-batch banding and the store rows —
    // text is the widest column; hashing it twice per batch would double
    // the dominant batch cost.
    val uniqueIds = batch.dropDuplicates(idCol)
    // LAZY pin (round 12): the hash pass materializes inside the first
    // consuming job (the within-batch components probe) instead of paying
    // its own driver-blocking barrier; every later consumer reuses the
    // pinned blocks. Lineage is batch-only (no store read), so the pin
    // can never capture a store image the flush later overwrites.
    val sigs = Dedup.minhashSignatures(uniqueIds, idCol, textCol, n)
      .localCheckpoint(eager = false)
    val withinPairs = Dedup.minhashCandidatePairsFromSigs(sigs, idCol, minEstJaccard)
    val dropWithin = Dedup.dropSet(withinPairs)
    val batchDeduped = uniqueIds.join(
      dropWithin.withColumnRenamed("doc_id", idCol), Seq(idCol), "left_anti")

    // (2) against the store: ONE bucket-pruned store read, batch side
    // broadcast (the store is never shuffled); signature refine on band
    // collisions. Survivor band rows are derived from the SAME precomputed
    // signatures.
    // LAZY pin again: materializes inside the bucket-set collect of
    // [[pruneStoreForBatch]] (one job for both), then backs the store
    // join, the survivor anti-join and the returned rows. Same batch-only
    // lineage argument as the signature pin above.
    val newBands = bandRowsFromSigs(
      sigs.join(dropWithin.withColumnRenamed("doc_id", idCol), Seq(idCol), "left_anti"),
      idCol)
      .localCheckpoint(eager = false)
    val hitIds = pruneStoreForBatch(store, newBands).as("st")
      .join(broadcast(newBands.as("nb")), Seq("band_idx", "band_key"))
      .filter(GraftFunctions.minhashJaccardUdf(col("nb.sig"), col("st.sig"))
        >= minEstJaccard)
      .select(col("nb.doc_id")).distinct()
    // EAGER pin (round 12): both returned frames consume the store-join +
    // signature-refine chain — unpinned, the survivor write and the
    // survivor-rows buffer each re-executed it (two store reads + two UDF
    // refine passes per batch). One materialization here serves both, and
    // the pin captures the store image AT CALL TIME, so a deferred-commit
    // caller's later store flush can never leak into this batch's rows.
    val survivorRows = newBands.join(hitIds, Seq("doc_id"), "left_anti")
      .localCheckpoint()
    val survivors = batchDeduped.join(
      survivorRows.select(col("doc_id").as(idCol)).distinct()
        .withColumn(idCol, col(idCol).cast(batch.schema(idCol).dataType)),
      Seq(idCol), "left_semi")
    (survivors, survivorRows)
  }

  /** The store restricted to band buckets the batch can collide with:
    * `band_bucket` is a pure function of the join key `band_key`, so rows
    * outside the batch's bucket set can never satisfy the band join — the
    * IN filter is a safe superset selection. On a `band_bucket`-partitioned
    * store it lands as a directory-level PartitionFilter (the 100 TB
    * lever); the driver-side collect is bounded by [[NumBandBuckets]].
    * Stores without the column (pre-bucketing layouts) pass through intact.
    */
  private[graft] def pruneStoreForBatch(store: DataFrame, newBands: DataFrame): DataFrame =
    if (!store.columns.contains("band_bucket")) store
    else {
      val buckets = newBands.select("band_bucket").distinct()
        .collect().map(_.getInt(0)).toSeq // ≤ NumBandBuckets values
      if (buckets.size >= NumBandBuckets) store // full coverage: nothing to prune
      else store.filter(col("band_bucket").isin(buckets: _*))
    }

  private val StoreSchema =
    "doc_id STRING, sig ARRAY<BIGINT>, band_idx INT, band_key LONG, band_bucket INT"

  /** The signature store at `storePath`, or the empty store when the path
    * does not exist yet (first batch). Any OTHER read failure propagates —
    * silently resetting dedup state would un-dedup the batch.
    *
    * `excludeBatchId` is the replay guard: a micro-batch replayed after a
    * crash that happened AFTER its store write but BEFORE the checkpoint
    * commit would otherwise see its own signatures in the store, drop
    * every one of its docs as a "duplicate" of itself, and dynamically
    * overwrite its output partition with an EMPTY survivor set — silent
    * data loss. Excluding the batch's own `batch_id` partition makes the
    * replay read exactly the state the original attempt saw (signatures
    * are deterministic, so the recomputed survivors are identical).
    */
  def readStore(
      spark: SparkSession, storePath: String,
      excludeBatchId: Option[Long] = None): DataFrame = {
    val hPath = new org.apache.hadoop.fs.Path(storePath)
    val fs = hPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(hPath)) {
      val df = spark.read.parquet(storePath)
      val replaySafe = excludeBatchId match {
        case Some(b) if df.columns.contains("batch_id") =>
          df.filter(col("batch_id") =!= b)
        case _ => df
      }
      // pre-bucketing stores: derive the bucket (no pruning, but the same
      // code path); bucketed stores read it back as the partition column
      val withBucket =
        if (replaySafe.columns.contains("band_bucket")) replaySafe
        else replaySafe.withColumn("band_bucket",
          pmod(col("band_key"), lit(NumBandBuckets.toLong)).cast("int"))
      withBucket.select("doc_id", "sig", "band_idx", "band_key", "band_bucket")
    } else spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType.fromDDL(StoreSchema))
  }

  /** Streaming wiring: foreachBatch drives [[processBatch]] with a parquet
    * signature store and writes survivors to `outPath`. Both writes land in
    * a `batch_id` partition with dynamic overwrite, so a replayed batch is
    * idempotent. Only a genuinely missing store path falls back to the
    * empty store — any other read failure propagates (silently resetting
    * dedup state would un-dedup the batch).
    *
    * `commitEveryN` (round 9, VERDICT r8 task 8) amortizes the store
    * commit cost: each trigger's store write is a ≤[[NumBandBuckets]]-leaf
    * dynamic-overwrite parquet job, and that commit overhead — not the
    * dedup math — dominates the trigger path (32% of the r8 bench total).
    * With N > 1, survivor band rows accumulate in memory (localCheckpoint
    * pins them) and flush as ONE write of the last N batches' partitions
    * every Nth batch; batches in between dedup against store ∪ pending, so
    * the semantics are batch-for-batch identical to N = 1. The replay
    * contract survives because the layout is unchanged (per-batch
    * `batch_id=` partitions, so a replayed flush overwrites its own
    * partitions) and the recovery path rebuilds any signatures a crash
    * kept out of the store: survivors land in `outPath` per batch WITH
    * their text, signatures are deterministic, so
    * [[recoverPendingSignatures]] (run at EVERY start, whatever this
    * run's N — a prior N>1 run may have left the window open)
    * recomputes exactly the missing partitions from the survivor docs.
    */
  def run(
      spark: SparkSession, docsStream: DataFrame, idCol: String, textCol: String,
      storePath: String, outPath: String, checkpoint: String,
      minEstJaccard: Double = 0.8,
      commitEveryN: Int = 1): org.apache.spark.sql.streaming.StreamingQuery = {
    require(commitEveryN >= 1, s"commitEveryN must be >= 1, got $commitEveryN")
    // recovery runs UNCONDITIONALLY: a previous N>1 run may have stopped
    // mid-window (survivors published, signatures pending) — restarting
    // with the default N=1 must still rebuild those store partitions, or
    // every future near-dup of the window's survivors re-enters the corpus
    recoverPendingSignatures(spark, storePath, outPath, idCol, textCol)
    // pending survivor band rows not yet flushed to the store, each stamped
    // with its batch_id; driver-held but bounded (N-1 batches of survivor
    // signatures, localCheckpointed so they neither recompute nor pin the
    // store-read lineage)
    val pending = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    docsStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatchDeferred(spark, batch, batchId, storePath, outPath,
          idCol, textCol, minEstJaccard, pending)
        if (pending.size >= commitEveryN) flushPending(pending, storePath)
        ()
      }
      .start()
  }

  /** One micro-batch of the deferred-commit loop: dedup `batch` against
    * store ∪ `pending` (a batch must see every PRIOR batch's signatures,
    * flushed or not — filter pushdown still reaches the parquet side of
    * the union for bucket pruning), publish survivors to their `outPath`
    * batch partition, and buffer the survivor band rows into `pending`.
    * Shared verbatim by [[run]] and the bench's batched-commit entry so
    * the benchmark measures EXACTLY the production algorithm.
    */
  def processBatchDeferred(
      spark: SparkSession, batch: DataFrame, batchId: Long,
      storePath: String, outPath: String, idCol: String, textCol: String,
      minEstJaccard: Double,
      pending: scala.collection.mutable.ArrayBuffer[DataFrame]): Unit = {
    val committed = readStore(spark, storePath, excludeBatchId = Some(batchId))
    val store = pending.foldLeft(committed)((s, p) =>
      s.unionByName(p.drop("batch_id")))
    val (survivors, survivorRows) = processBatch(
      batch, store, idCol, textCol, minEstJaccard)
    survivors.withColumn("batch_id", lit(batchId))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id").parquet(outPath)
    // no second pin: survivorRows is already localCheckpoint'ed inside
    // processBatch (store lineage severed there), so the buffered frame is
    // a scan of pinned blocks plus a literal column — safe to hold across
    // the window and cheap to flush
    pending += survivorRows.withColumn("batch_id", lit(batchId))
  }

  /** Flush the buffered survivor band rows as ONE store write covering the
    * window's batch partitions — one shuffle of the (small) band rows so
    * each band_bucket leaf gets a single file instead of one per task (the
    * store is read every batch; its file count is the read cost).
    */
  def flushPending(
      pending: scala.collection.mutable.ArrayBuffer[DataFrame],
      storePath: String): Unit = if (pending.nonEmpty) {
    pending.reduce(_.unionByName(_))
      .repartition(col("band_bucket"))
      .write.mode(SaveMode.Overwrite)
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id", "band_bucket").parquet(storePath)
    pending.clear()
  }

  /** Rebuild store partitions a deferred-commit crash lost: any `batch_id`
    * present under `outPath` (survivors were published) but absent from
    * the store (its signatures were pending, never flushed) gets its band
    * rows recomputed from the survivor docs — deterministic signatures
    * make the rebuilt partition byte-equivalent to what the flush would
    * have written. Bounded work: at most commitEveryN − 1 batches can be
    * missing, each a survivor-sized hash pass. Returns the batch ids
    * rebuilt (empty when the store is complete — the N = 1 fast path).
    */
  def recoverPendingSignatures(
      spark: SparkSession, storePath: String, outPath: String,
      idCol: String, textCol: String, n: Int = 3): Seq[Long] = {
    val fs = new org.apache.hadoop.fs.Path(outPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(new org.apache.hadoop.fs.Path(outPath))) return Seq.empty
    val out = spark.read.parquet(outPath)
    if (!out.columns.contains("batch_id")) return Seq.empty
    // partition-column types come from directory inference — cast both
    // sides to LONG rather than trusting it
    val outIds = out.select(col("batch_id").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSet
    val storeIds =
      if (!fs.exists(new org.apache.hadoop.fs.Path(storePath))) Set.empty[Long]
      else {
        val st = spark.read.parquet(storePath)
        if (!st.columns.contains("batch_id")) Set.empty[Long]
        else st.select(col("batch_id").cast("long")).distinct()
          .collect().map(_.getLong(0)).toSet
      }
    val missing = (outIds -- storeIds).toSeq.sorted
    missing.foreach { b =>
      bandRows(out.filter(col("batch_id").cast("long") === b)
          .drop("batch_id"), idCol, textCol, n)
        .withColumn("batch_id", lit(b))
        .repartition(col("band_bucket"))
        .write.mode(SaveMode.Overwrite)
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("batch_id", "band_bucket").parquet(storePath)
    }
    missing
  }
}

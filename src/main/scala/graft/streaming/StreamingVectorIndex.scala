package graft.streaming

import graft.operators.IvfIndex
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Continuous vector-index upsert (round 9 — the streaming face of
  * `IvfIndex.appendToStore`; reference parity: the-hive upserts points
  * into its live index on every ingest, internal/vectordb/vectordb.go:
  * 117-193). Each micro-batch of new embeddings is quantized + assigned
  * with the FROZEN coarse centroids and committed as one cell-partitioned
  * delta version of the SnapshotStore root — so a concurrently-serving
  * query keeps the version it resolved at open, and the index grows
  * delta-sized work per trigger, never a rebuild.
  *
  * Exactly-once across replays: Structured Streaming re-runs a batch
  * whose epoch didn't commit, and a blind append would double-insert the
  * batch's vectors. Each append therefore carries a `b<batchId>` dir tag
  * and [[processBatch]] first scans the CURRENT manifest for it — a
  * replayed batch whose append already committed becomes a no-op. The
  * crash windows: (a) append committed, checkpoint epoch lost → replay
  * sees the tag, skips (the guard's whole point); (b) data dir written,
  * manifest not committed → the orphan dir is invisible to readers,
  * `SnapshotStore.expireSnapshots` sweeps it, and the replay appends
  * cleanly (fresh uuid suffix, no name collision).
  *
  * Staleness contract: centroids stay frozen — assignment quality drifts
  * as the corpus distribution moves (RecallSpec gates the 80%-trained
  * case). The monitoring hook is `IvfIndex.assignQuality` per batch
  * delta; past tolerance, the first response is the delta-sized repair
  * loop — `IvfIndex.cellQuality` to localize, `refreshCells` /
  * `splitCell` to re-fit or split only the affected cells (run it
  * BETWEEN triggers: the repair commit and a concurrent micro-batch
  * append collide loudly under optimistic concurrency, never silently) —
  * and only distribution-wide drift warrants a full `buildStoreVersioned`
  * rebuild (one overwrite commit readers never race).
  */
object StreamingVectorIndex {

  /** One micro-batch: skip if this batchId's delta is already committed,
    * else append it. Returns the committed version (None = skipped or
    * empty batch). Factored out of [[run]] so the replay contract is
    * directly testable.
    *
    * `upsertIdCol` (round 10): when set, the batch commits through
    * `IvfIndex.upsertToStore` — the reference's ACTUAL re-ingest
    * semantics (same deterministic id replaces the point,
    * internal/vectordb/vectordb.go:117-193): one commit carrying a
    * tombstone per incoming id plus the replacement rows, so re-ingested
    * documents never serve stale vectors. Serve the store through
    * `IvfIndex.readStoreLatest`/`searchQuantizedLatest` in this mode.
    * The default (None) keeps blind appends for insert-only streams.
    */
  def processBatch(
      spark: SparkSession, batch: DataFrame, batchId: Long,
      storeRoot: String, index: IvfIndex.Index, vecCol: String,
      upsertIdCol: Option[String] = None): Option[Int] = {
    val tag = s"b$batchId"
    // two-layer replay guard: (a) the durable `_tags` sidecar every tagged
    // append records — NOT subject to expireSnapshots, so the guard
    // survives manifest retirement inside the checkpoint replay horizon
    // (round-10 ADVICE fix: previously keepLast < horizon silently
    // double-inserted); (b) the retained-manifest scan, which still covers
    // the one crash window where the manifest committed but the tag write
    // didn't land. A rebuild (buildStoreVersioned = overwrite) folds
    // tagged deltas into an untagged dir, and both layers keep the tags
    // visible — no replay straddling a rebuild can double-insert.
    val already =
      graft.sources.SnapshotStore.committedTags(spark, storeRoot).contains(tag) ||
      graft.sources.SnapshotStore
        .allCommittedDirs(spark, storeRoot)
        .exists(_.contains(s"-$tag-"))
    if (already || batch.isEmpty) None
    else upsertIdCol match {
      case Some(idCol) => Some(IvfIndex.upsertToStore(
        spark, storeRoot, batch, idCol, vecCol, index, dirTag = Some(tag)))
      case None => Some(IvfIndex.appendToStore(
        spark, storeRoot, batch, vecCol, index, dirTag = Some(tag)))
    }
  }

  /** Streaming wiring: every micro-batch of `vecStream` (id + embedding
    * rows) lands as one delta version. The store stays queryable at any
    * pinned version throughout via `IvfIndex.readStoreVersioned` (or
    * `readStoreLatest` in upsert mode).
    */
  def run(
      spark: SparkSession, vecStream: DataFrame, vecCol: String,
      storeRoot: String, index: IvfIndex.Index,
      checkpoint: String,
      upsertIdCol: Option[String] = None): org.apache.spark.sql.streaming.StreamingQuery =
    vecStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(spark, batch, batchId, storeRoot, index, vecCol,
          upsertIdCol)
        ()
      }
      .start()

  /** The index the stream is CURRENTLY assigning with — mutable because
    * the maintenance hook's refresh/split repairs evolve the centroid set
    * mid-stream. `@volatile` so a concurrently-serving reader (searches
    * plan against `ref.index`) sees repairs as soon as their store commit
    * lands; the store itself stays consistent at every pinned version
    * regardless (a query planned against the OLD index over the NEW
    * version simply probes the old cell ids — the splitCell mid-rollout
    * contract).
    */
  final class IndexRef(@volatile var index: IvfIndex.Index)

  /** Maintenance-hook config (VERDICT r10 task 5 — the planner wired INTO
    * the streaming loop instead of prose telling the operator to run it):
    * after every `every`-th micro-batch, [[applyMaintenance]] runs
    * `IndexMaintenance.plan` and applies the local repairs inline —
    * BETWEEN triggers by construction (foreachBatch bodies are
    * serialized), so a repair commit can never race this stream's own
    * appends; a FOREIGN writer racing it collides loudly under the
    * store's optimistic concurrency, exactly like any repair call.
    *
    *   - `refresh` / `split` decisions are applied and the [[IndexRef]]
    *     advanced to the repaired centroids — later batches assign with
    *     them.
    *   - `compact` folds tombstones physically.
    *   - `rebuild` is NOT auto-applied (a full re-draw mid-stream needs a
    *     corpus-wide decision the operator owns); it is surfaced through
    *     `onPlan` — stop the stream, `buildStoreVersioned`, restart.
    *
    * Replay interaction: a replayed batch skips its append (the dir-tag
    * guard) but re-runs the hook; the plan then scores the
    * already-repaired store, so re-application is at worst an extra
    * no-op-ish commit, never corruption — the same idempotence the repair
    * family has for any caller.
    *
    * `baselineMeanScore` is the build-time `IvfIndex.assignQuality` mean
    * (record it at build, like every planner caller);
    * `extraPartitionCols` must match the build's layout (the repair
    * family's layout guard enforces it loudly).
    */
  final case class Maintain(
      every: Int,
      idCol: String,
      baselineMeanScore: Double,
      thresholds: graft.operators.IndexMaintenance.Thresholds =
        graft.operators.IndexMaintenance.Thresholds(),
      extraPartitionCols: Seq[String] = Seq.empty,
      sampleFrac: Option[Double] = None,
      onPlan: Seq[graft.operators.IndexMaintenance.Decision] => Unit = _ => ()) {
    require(every >= 1, s"maintain every must be >= 1, got $every")
  }

  /** One maintenance window: plan against `ref.index`, apply the local
    * repairs (refresh / split / compact), advance `ref`, surface the full
    * decision list (rebuilds included) through `m.onPlan` and the return
    * value. Factored out of [[runWithMaintenance]] so the drift →
    * automatic-refresh loop is directly testable without a stream.
    */
  def applyMaintenance(
      spark: SparkSession, storeRoot: String, ref: IndexRef,
      m: Maintain): Seq[graft.operators.IndexMaintenance.Decision] = {
    import graft.operators.{IndexMaintenance, IvfIndex}
    val decisions = IndexMaintenance.plan(
      spark, storeRoot, ref.index, m.idCol, m.baselineMeanScore,
      t = m.thresholds, sampleFrac = m.sampleFrac)
    decisions.foreach {
      case IndexMaintenance.Decision("refresh", cells, _) if cells.nonEmpty =>
        val (idx2, _) = IvfIndex.refreshCells(
          spark, storeRoot, ref.index, cells, m.idCol,
          extraPartitionCols = m.extraPartitionCols)
        ref.index = idx2
      case IndexMaintenance.Decision("split", Seq(cell), _) =>
        val (idx2, _) = IvfIndex.splitCell(
          spark, storeRoot, ref.index, cell, m.idCol,
          extraPartitionCols = m.extraPartitionCols)
        ref.index = idx2
      case IndexMaintenance.Decision("compact", _, _) =>
        IvfIndex.compactStore(spark, storeRoot, m.idCol,
          extraPartitionCols = m.extraPartitionCols)
        ()
      case _ => () // rebuild (operator-owned) — surfaced via onPlan below
    }
    m.onPlan(decisions)
    decisions
  }

  /** [[run]] with the maintenance hook armed: every `maintain.every`-th
    * micro-batch is followed by one [[applyMaintenance]] window before the
    * trigger completes. Returns the query AND the live [[IndexRef]] —
    * serve searches against `ref.index` so repairs take effect as they
    * commit.
    */
  def runWithMaintenance(
      spark: SparkSession, vecStream: DataFrame, vecCol: String,
      storeRoot: String, index: IvfIndex.Index,
      checkpoint: String, maintain: Maintain,
      upsertIdCol: Option[String] = None): (org.apache.spark.sql.streaming.StreamingQuery, IndexRef) = {
    val ref = new IndexRef(index)
    val query = vecStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(spark, batch, batchId, storeRoot, ref.index, vecCol,
          upsertIdCol)
        if ((batchId + 1) % maintain.every == 0)
          applyMaintenance(spark, storeRoot, ref, maintain)
        ()
      }
      .start()
    (query, ref)
  }
}

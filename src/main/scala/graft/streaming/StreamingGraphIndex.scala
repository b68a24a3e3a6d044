package graft.streaming

import graft.operators.GraphAnn
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Continuous GRAPH-index upsert (round 11 — the graph-tier twin of
  * [[StreamingVectorIndex]]; reference parity: the-hive upserts points
  * into its live Qdrant index on every ingest,
  * internal/vectordb/vectordb.go:117-193, whose default index is the
  * HNSW-family graph our beam tier re-expresses): each micro-batch of new
  * embeddings commits TWO delta versions —
  *
  *   1. the vectors into the [[GraphAnn.writeVectorStore]] corpus root —
  *      by default an UPSERT ([[GraphAnn.upsertToVectorStore]]: tombstone
  *      per id + replacement in one bucketed commit, so re-ingested ids
  *      replace their old vectors; `Config(upsert = false)` keeps blind
  *      appends for checked-insert-only streams), and
  *   2. the nodes into the graph store via
  *      [[GraphAnn.appendNodesToStore]] — the HNSW-insert shape: each new
  *      node finds its neighbors by the existing graph's OWN beam search
  *      (the driver-hosted twin below `smallBatchBound` — micro-batches
  *      are the canonical small batch), and the commit rewrites only the
  *      touched `src_bucket` partitions.
  *
  * Exactly-once across replays, per store: each commit carries a
  * batch-scoped dir tag (`v<id>` corpus / `g<id>` graph) checked against
  * the durable `_tags` sidecar ∪ retained manifests — the
  * [[StreamingVectorIndex.processBatch]] guard applied twice. The crash
  * windows compose safely BECAUSE the corpus leg commits first and the
  * graph leg's inputs are replay-stable:
  *
  *   - corpus committed, graph not → the replay skips the corpus append
  *     (tag present) and re-runs the graph leg against the SAME corpus
  *     image (the store's latest with this batch's own ids anti-joined
  *     out — identical whether the corpus commit was fresh or replayed),
  *     producing the same deterministic insert;
  *   - both committed → full no-op;
  *   - graph-leg data dir written but its manifest not committed → the
  *     orphan is unreferenced, expireSnapshots sweeps it, the replay
  *     commits cleanly.
  *
  * Staleness contract inherited from [[GraphAnn.appendNodes]]: appended
  * nodes carry no skip-ring links, so after several-fold growth rebuild
  * via [[GraphAnn.buildGraph]] + [[GraphAnn.writeGraphStore]] — the
  * `IndexMaintenance.planGraph` ring-coverage probe is the alarm; run it
  * (and the compaction it may plan) BETWEEN triggers exactly like the IVF
  * maintenance hook.
  */
object StreamingGraphIndex {

  /** Insert/search knobs for the per-batch graph append — one value
    * object so [[run]] and [[processBatch]] share defaults. `nBuckets` /
    * `idBuckets` MUST match the stores' build layouts.
    *
    * `upsert` (round 12, r11 ADVICE): the default TRUE is the reference's
    * re-ingest semantics (same id replaces the point, vectordb.go:117-193)
    * — each corpus commit carries a tombstone per incoming id plus the
    * replacement rows ([[GraphAnn.upsertToVectorStore]]), and every read
    * of the corpus goes through the latest-wins fold, so a re-ingested
    * document can never leave duplicate id rows behind (which would split
    * the gated search twins: duplicate beam rows distributed vs an
    * arbitrary survivor in the local cache). `upsert = false` keeps blind
    * appends for streams KNOWN insert-only — and makes that claim a
    * CHECKED contract: a batch carrying any pre-existing id fails loudly
    * instead of silently duplicating.
    */
  final case class Config(
      m: Int = 12, maxDegree: Int = 48, nBuckets: Int = 64,
      idBuckets: Int = 64, reserveLong: Int = 8,
      beamWidth: Int = 24, maxHops: Int = 12, nSeeds: Int = 4,
      expandPerHop: Int = 0, smallBatchBound: Int = 64,
      upsert: Boolean = true,
      ringRoot: Option[String] = None,
      rosterBuckets: Int = 64, ringStride: Int = 2)

  /** One micro-batch: append the vectors (skip if its `v<id>` tag is
    * already committed), then insert the nodes (skip if `g<id>` is).
    * Returns the graph store's committed version (None = batch empty or
    * graph leg already committed). Factored out of [[run]] so the replay
    * contract is directly testable.
    */
  def processBatch(
      spark: SparkSession, batch: DataFrame, batchId: Long,
      graphRoot: String, vectorRoot: String,
      idCol: String, vecCol: String,
      cfg: Config = Config(),
      cache: Option[GraphAnn.ServingCache] = None): Option[Int] = {
    // one bounded probe replaces the isEmpty job AND (for small batches)
    // the corpus anti-join below: the batch's ids as a driver literal
    // (round 12 optimization — every per-hop collect of the insert search
    // re-executed the anti-join's scan of the batch source)
    val idProbe = batch.select(col(idCol).cast("long"))
      .limit(cfg.smallBatchBound + 1).collect().map(_.getLong(0))
    if (idProbe.isEmpty) return None
    val smallIds: Option[Seq[Long]] =
      if (idProbe.length > cfg.smallBatchBound) None else Some(idProbe.toSeq)
    val vTag = s"v$batchId"
    val gTag = s"g$batchId"
    def committed(root: String, tag: String): Boolean =
      graft.sources.SnapshotStore.committedTags(spark, root).contains(tag) ||
        graft.sources.SnapshotStore.allCommittedDirs(spark, root)
          .exists(_.contains(s"-$tag-"))
    // warm-cache protocol (round 12, VERDICT r11 task 3): validate against
    // the CURRENT store versions (a foreign commit resets the stale side),
    // collect the batch image once (bounded: the warm path is armed only
    // for batches within the driver-hosted serving bound), and mask the
    // batch's ids ABSENT for the insert search — the corpus-minus-batch
    // image it must see. The commits this batch makes advance the handle
    // surgically below instead of invalidating it.
    val batchImage: Option[Seq[(Long, Array[Float])]] = cache.flatMap { c =>
      val rows = batch.select(col(idCol).cast("long"),
          graft.functions.VectorFunctions.asFloatArray(col(vecCol)))
        .limit(cfg.smallBatchBound + 1).collect()
      if (rows.length > cfg.smallBatchBound) { c.reset(); None }
      else {
        c.ensure(
          vectorRoot,
          graft.sources.SnapshotStore.currentVersion(spark, vectorRoot).getOrElse(0),
          graphRoot,
          graft.sources.SnapshotStore.currentVersion(spark, graphRoot).getOrElse(0))
        Some(rows.toIndexedSeq.map(r =>
          r.getLong(0) -> r.getAs[scala.collection.Seq[Float]](1).toArray))
      }
    }
    val warm = cache.filter(_ => batchImage.isDefined)
    if (!committed(vectorRoot, vTag)) {
      if (cfg.upsert)
        GraphAnn.upsertToVectorStore(spark, vectorRoot, batch, idCol,
          nBuckets = cfg.idBuckets, dirTag = Some(vTag))
      else {
        // insert-only mode must BE insert-only (round-12, r11 ADVICE):
        // verify the batch's ids are new and fail loudly — a silent blind
        // append of a re-ingested id would leave duplicate corpus rows
        // that diverge the gated search twins
        val preExisting = GraphAnn
          .readVectorStoreLatest(spark, vectorRoot, idCol)
          .join(batch.select(col(idCol)), Seq(idCol), "left_semi").count()
        require(preExisting == 0L,
          s"insert-only stream got $preExisting pre-existing id(s) in " +
            s"batch $batchId — re-ingest needs Config(upsert = true)")
        GraphAnn.appendToVectorStore(spark, vectorRoot, batch, idCol,
          nBuckets = cfg.idBuckets, dirTag = Some(vTag))
      }
    }
    val vVersion = graft.sources.SnapshotStore
      .currentVersion(spark, vectorRoot).getOrElse(0)
    val out =
      if (committed(graphRoot, gTag)) { sweepRoster(spark, batch, idCol, cfg); None }
      else {
        // the corpus the insert searches over: the store's CURRENT image
        // minus this batch's own ids — replay-stable (identical whether the
        // corpus commit above was fresh or skipped) and semantically the
        // appendNodes contract (new nodes search the EXISTING corpus; the
        // intra-batch chain covers batch-internal links). The latest-wins
        // view also folds out any OLDER copy of a re-ingested id, so the
        // insert search never scores stale vectors. The warm handle sees
        // the same image: the batch's ids are masked absent until the
        // corpus advance below.
        warm.foreach(c => c.maskAbsent(batchImage.get.map(_._1)))
        val live = GraphAnn.readVectorStoreLatest(spark, vectorRoot, idCol)
        val corpus = smallIds match {
          case Some(ids) =>
            live.filter(!col(idCol).cast("long").isInCollection(ids))
          case None =>
            live.join(batch.select(col(idCol)), Seq(idCol), "left_anti")
        }
        Some(GraphAnn.appendNodesToStore(spark, graphRoot, corpus, batch,
          idCol, vecCol, m = cfg.m, maxDegree = cfg.maxDegree,
          nBuckets = cfg.nBuckets, reserveLong = cfg.reserveLong,
          beamWidth = cfg.beamWidth, maxHops = cfg.maxHops,
          nSeeds = cfg.nSeeds, expandPerHop = cfg.expandPerHop,
          smallBatchBound = cfg.smallBatchBound,
          idBuckets = Some(cfg.idBuckets), dirTag = Some(gTag),
          ringRoot = cfg.ringRoot, rosterBuckets = cfg.rosterBuckets,
          ringStride = cfg.ringStride, servingCache = warm))
      }
    // corpus advance LAST (both paths): the batch's vectors are live in
    // the store from this batch on — overwrite the mask, merge the seed
    // image, stamp the post-commit version
    warm.foreach(_.advanceCorpus(vectorRoot, vVersion, batchImage.get))
    out
  }

  /** Replay sweep for the one ring crash window (graph committed, roster
    * append lost): with `cfg.ringRoot` set, a REPLAYED batch whose graph
    * leg is already committed still re-runs the idempotent roster append —
    * invoked by [[processBatch]] after the graph-leg guard fires. Kept
    * separate so the replay path stays explicit and testable.
    */
  private def sweepRoster(
      spark: SparkSession, batch: DataFrame, idCol: String,
      cfg: Config): Unit =
    cfg.ringRoot.foreach { rr =>
      graft.operators.RingRoster.append(
        spark, rr, batch.select(col(idCol)), idCol, cfg.rosterBuckets)
      ()
    }

  /** Streaming wiring: every micro-batch of `vecStream` (id + embedding
    * rows) lands as one corpus delta + one graph delta. Serve searches
    * from the two stores with both prune knobs
    * (`searchMany(srcBuckets = Some(cfg.nBuckets),
    * idBuckets = Some(cfg.idBuckets))`) at any pinned version.
    */
  def run(
      spark: SparkSession, vecStream: DataFrame,
      graphRoot: String, vectorRoot: String,
      idCol: String, vecCol: String, checkpoint: String,
      cfg: Config = Config(),
      cache: Option[GraphAnn.ServingCache] = None): org.apache.spark.sql.streaming.StreamingQuery =
    vecStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(spark, batch, batchId, graphRoot, vectorRoot,
          idCol, vecCol, cfg, cache)
        ()
      }
      .start()

  /** Graph-tier maintenance hook (the `StreamingVectorIndex.Maintain`
    * twin): every `every`-th micro-batch runs
    * `IndexMaintenance.planGraph` between triggers and applies the
    * zero-query repairs inline —
    *
    *   - `compact` (edge fold waste past the threshold) is applied via
    *     `GraphAnn.compactGraphStore` (the tombstone-folding twin);
    *   - `rebuild` (ring coverage below the cut — appended nodes outgrew
    *     the skip ring) is NOT auto-applied: a full `buildGraph` re-run
    *     is a corpus-wide decision the operator owns; it is surfaced
    *     through `onPlan` — stop the stream, rebuild, restart.
    *
    * `buildIds` is a THUNK returning the roster the ring was last built
    * over (the build corpus' id column — record it at (re)build like the
    * IVF baseline); a thunk so a restart after a rebuild can swap it
    * without re-wiring the stream.
    */
  final case class Maintain(
      every: Int,
      buildIds: () => DataFrame,
      buildIdCol: String,
      thresholds: graft.operators.IndexMaintenance.Thresholds =
        graft.operators.IndexMaintenance.Thresholds(),
      onPlan: Seq[graft.operators.IndexMaintenance.Decision] => Unit = _ => ()) {
    require(every >= 1, s"maintain every must be >= 1, got $every")
  }

  /** One graph maintenance window: plan, apply compactions, surface the
    * full decision list (rebuilds included) through `m.onPlan` and the
    * return value. Factored out of [[runWithMaintenance]] so the
    * delete-debt → automatic-compaction loop is directly testable.
    */
  def applyMaintenance(
      spark: SparkSession, graphRoot: String, cfg: Config,
      m: Maintain): Seq[graft.operators.IndexMaintenance.Decision] = {
    import graft.operators.IndexMaintenance
    val decisions = IndexMaintenance.planGraph(
      spark, graphRoot, m.buildIds(), m.buildIdCol, m.thresholds)
    decisions.foreach {
      case IndexMaintenance.Decision("compact", _, _) =>
        GraphAnn.compactGraphStore(spark, graphRoot, nBuckets = cfg.nBuckets)
        ()
      case IndexMaintenance.Decision("stitch_region", buckets, _)
          if cfg.ringRoot.isDefined && buckets.nonEmpty =>
        // the round-12 middle rung: delta-sized, commit confined to the
        // stale buckets — safe to auto-apply inline like compaction
        GraphAnn.repairRingRegion(spark, graphRoot, cfg.ringRoot.get,
          buckets, nBuckets = cfg.nBuckets,
          rosterBuckets = cfg.rosterBuckets, ringStride = cfg.ringStride)
        ()
      case _ => () // rebuild (operator-owned) — surfaced via onPlan below
    }
    m.onPlan(decisions)
    decisions
  }

  /** [[run]] with the maintenance hook armed: every `maintain.every`-th
    * micro-batch is followed by one [[applyMaintenance]] window before
    * the trigger completes (foreachBatch serialization — the compaction
    * commit never races this stream's own appends).
    */
  def runWithMaintenance(
      spark: SparkSession, vecStream: DataFrame,
      graphRoot: String, vectorRoot: String,
      idCol: String, vecCol: String, checkpoint: String,
      maintain: Maintain,
      cfg: Config = Config(),
      cache: Option[GraphAnn.ServingCache] = None): org.apache.spark.sql.streaming.StreamingQuery =
    vecStream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        processBatch(spark, batch, batchId, graphRoot, vectorRoot,
          idCol, vecCol, cfg, cache)
        // a maintenance commit (compact / regional stitch) changes store
        // versions the handle can't track surgically — the next batch's
        // ensure() resets the stale side, never serves stale state
        if ((batchId + 1) % maintain.every == 0)
          applyMaintenance(spark, graphRoot, cfg, maintain)
        ()
      }
      .start()
}

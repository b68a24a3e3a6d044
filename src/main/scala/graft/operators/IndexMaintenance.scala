package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The maintenance PLANNER for versioned ANN stores — turns the probe
  * family into one ranked action list, so a deployment runs a single
  * decision call per maintenance window instead of hand-wiring the loop.
  *
  * The probes and repairs exist individually (round 10):
  * [[IvfIndex.assignQuality]] is the drift alarm, [[IvfIndex.cellQuality]]
  * the localizer, [[IvfIndex.refreshCells]] / [[IvfIndex.splitCell]] the
  * delta-sized repairs, [[IvfIndex.compactStore]] the tombstone fold, and
  * a full [[IvfIndex.buildStoreVersioned]] rebuild the last resort. What
  * a deployment actually needs is the POLICY: which action, on which
  * cells, and when a local repair stops being enough. That policy lives
  * here, with the thresholds as one documented value object instead of
  * lore spread across scaladocs.
  *
  * Reference parity note: the-hive's vector store delegates maintenance
  * to its engine (Qdrant optimizes segments internally); a Spark-native
  * versioned store must surface the decision explicitly — this is the
  * missing operational face of internal/vectordb/vectordb.go's
  * continuous-upsert lifecycle.
  *
  * Scale shape: one full-store [[IvfIndex.cellQuality]] pass (narrow
  * codegen scan, partial-aggregated on cell; pass a SAMPLED read for the
  * quality leg at extreme sizes — per-cell means survive sampling), two
  * count aggregates for the fold-waste ratio, and driver images bounded
  * by nCells. No action is taken here — the caller applies the returned
  * decisions with the repair functions, under the store's optimistic
  * concurrency.
  */
object IndexMaintenance {

  /** The policy knobs, one place, documented:
    *
    *   - `refreshQualityDrop`: a cell is DRIFTED when its mean
    *     own-centroid cosine sits more than this below
    *     `baselineMeanScore` (the build-time [[IvfIndex.assignQuality]]
    *     mean the caller recorded).
    *   - `refreshMaxCells`: per-window repair budget — the worst drifted
    *     cells up to this count go into one refresh decision.
    *   - `globalDriftFrac`: when MORE than this fraction of scored cells
    *     is drifted, local refresh stops being the right tool (it would
    *     re-fit most of the index cell by cell) — plan a rebuild instead.
    *   - `splitSkewFactor`: a cell is OVERFULL when its member count
    *     exceeds this multiple of the median cell size; with
    *     cell-partitioned stores the count IS the probe cost.
    *   - `compactFoldWaste`: plan a compaction when the rows a latest
    *     read must scan-and-discard (superseded copies + tombstones +
    *     purge markers) exceed this fraction of the live rows.
    *   - `minCellSize`: cells below this member count are skipped by the
    *     drift scorer (singletons are perfectly cohesive by construction
    *     and tiny cells rank on noise).
    *   - `ringCoverageRebuild` (graph tier, [[planGraph]]): a src bucket
    *     is RING-STALE when its ring-linked fraction of live source nodes
    *     falls below this — the `GraphAnn.appendNodes` staleness
    *     contract's documented cut, applied per bucket since round 12.
    *   - `stitchRegionMaxFrac` (round 12, VERDICT r11 task 2 — the middle
    *     rung): when AT MOST this fraction of live buckets is ring-stale,
    *     the plan is the delta-sized `stitch_region` repair
    *     ([[GraphAnn.repairRingRegion]]: fingers for just those buckets'
    *     uncovered nodes, commit touching only their dirs); past it the
    *     staleness is structural and the plan escalates to the full
    *     rebuild.
    */
  final case class Thresholds(
      refreshQualityDrop: Double = 0.05,
      refreshMaxCells: Int = 4,
      globalDriftFrac: Double = 0.5,
      splitSkewFactor: Double = 4.0,
      compactFoldWaste: Double = 0.2,
      minCellSize: Long = 2L,
      ringCoverageRebuild: Double = 0.7,
      stitchRegionMaxFrac: Double = 0.25)

  /** One planned action: `action` ∈ rebuild | refresh | split | compact,
    * the cells it applies to (empty for store-wide actions), and a
    * human-readable reason carrying the measured numbers that tripped
    * the threshold.
    */
  final case class Decision(action: String, cells: Seq[Int], reason: String)

  /** Plan the maintenance window for the store at `root`. Returns
    * decisions ranked by severity: a `rebuild` (exclusive of `refresh` —
    * it supersedes per-cell re-fits) or a `refresh` first, then `split`
    * per overfull cell, then `compact`. An empty result means the store
    * is healthy under `t`.
    *
    * `baselineMeanScore` is the build-time corpus mean from
    * [[IvfIndex.assignQuality]] — record it when (re)building; drift is
    * measured against it, not against an absolute cut (absolute cosine
    * levels are corpus-dependent).
    *
    * `vecColOpt` follows the repair family's convention: None for int8
    * stores (dequantized scoring), Some(vecCol) for IVF-PQ roots.
    */
  def plan(
      spark: org.apache.spark.sql.SparkSession, root: String,
      index: IvfIndex.Index, idCol: String, baselineMeanScore: Double,
      q8Col: String = "q8", scaleCol: String = "scale",
      cellCol: String = "cell", vecColOpt: Option[String] = None,
      t: Thresholds = Thresholds(),
      sampleFrac: Option[Double] = None): Seq[Decision] = {
    require(t.refreshMaxCells > 0, "refreshMaxCells must be positive")
    sampleFrac.foreach(f => require(f > 0.0 && f <= 1.0,
      s"sampleFrac must be in (0, 1], got $f"))
    val live = IvfIndex.readStoreLatest(spark, root, idCol, cellCol)
    // the quality leg is the one full-corpus scoring pass — at extreme
    // store sizes sample it (per-cell MEANS rank cells; they survive
    // sampling; `n` is scaled back up so the size-based policies keep
    // their units). Seeded: two plans over the same snapshot agree.
    val scoredInput = sampleFrac.fold(live)(f => live.sample(f, seed = 41L))
    val scaleUp = sampleFrac.fold(1.0)(1.0 / _)
    // bounded driver image: one row per cell
    val quality = IvfIndex
      .cellQuality(scoredInput, q8Col, scaleCol, index, cellCol, vecColOpt)
      .withColumn("n", ceil(col("n") * lit(scaleUp)).cast("long"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)

    val out = Seq.newBuilder[Decision]

    // ---- drift: refresh the worst cells, or rebuild past the global cut
    val scored = quality.filter(_._2 >= t.minCellSize)
    val drifted = scored
      .filter { case (_, _, mean) =>
        mean < baselineMeanScore - t.refreshQualityDrop }
      .sortBy { case (cell, _, mean) => (mean, cell) }
    if (drifted.nonEmpty) {
      val frac = drifted.length.toDouble / scored.length
      if (frac > t.globalDriftFrac)
        out += Decision("rebuild", Seq.empty,
          f"${drifted.length}/${scored.length} scored cells (${frac * 100}%.0f%%) " +
            f"drifted > ${t.refreshQualityDrop}%.3f below baseline " +
            f"$baselineMeanScore%.4f — local refresh would re-fit most of " +
            "the index; rebuild instead")
      else
        out += Decision("refresh",
          drifted.take(t.refreshMaxCells).map(_._1).toSeq,
          f"${drifted.length} drifted cells (worst mean " +
            f"${drifted.head._3}%.4f vs baseline $baselineMeanScore%.4f); " +
            s"refreshing up to ${t.refreshMaxCells} per window")
    }

    // ---- skew: split every overfull cell (needs >= 2 members to split).
    // Sampled plans re-check candidates' TRUE counts first (round-10
    // ADVICE): ceil-extrapolation turns 1 sampled member into n >= 2, so
    // without the re-check a sampled plan could name a cell splitCell
    // then rejects ("has < 2 members"). The re-check is one
    // partition-pruned count over only the candidate cells, and the skew
    // CONDITION itself is re-applied on the true count (round-11 ADVICE:
    // a sampling overestimate must not plan a split of a cell that is not
    // actually overfull — the extrapolated median stays the yardstick,
    // per-cell means/medians survive sampling where single counts don't);
    // the decision reason reports the TRUE count.
    if (quality.nonEmpty) {
      val sizes = quality.map(_._2).sorted
      val median = sizes(sizes.length / 2).toDouble
      val candidates = quality.filter { case (_, n, _) =>
        n > t.splitSkewFactor * median && n >= 2 }
      val trueN: Map[Int, Long] =
        if (sampleFrac.isEmpty || candidates.isEmpty)
          candidates.map(c => c._1 -> c._2).toMap
        else live.filter(col(cellCol).isin(candidates.map(_._1).toSeq: _*))
          .groupBy(col(cellCol)).count()
          .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
      for {
        (cell, _, _) <- candidates
        tn = trueN.getOrElse(cell, 0L)
        if tn >= 2L && tn > t.splitSkewFactor * median
      } out += Decision("split", Seq(cell),
          f"cell $cell holds $tn members > ${t.splitSkewFactor}%.1f x " +
            f"median $median%.0f — its partition is the probe-cost hot spot")
    }

    // ---- fold waste: compact when dead weight outgrows the live rows
    val rawCount = graft.sources.SnapshotStore
      .read(spark, root, commitCol = Some(IvfIndex.CommitCol),
        absentDefaults = Seq(IvfIndex.OpCol -> lit("U")))
      .count()
    val liveCount = live.count()
    val waste =
      if (liveCount == 0L) 0.0
      else (rawCount - liveCount).toDouble / liveCount
    if (liveCount > 0L && waste > t.compactFoldWaste)
      out += Decision("compact", Seq.empty,
        f"latest read scans-and-discards ${rawCount - liveCount} of " +
          f"$rawCount rows (${waste * 100}%.0f%% of live) — fold " +
          "tombstones physically")

    out.result()
  }

  /** The graph-tier window: the zero-query probes only.
    *
    *   - Ring coverage below `ringCoverageRebuild` — PER SRC BUCKET since
    *     round 12: stale buckets hold live source nodes missing from the
    *     ring roster (appended un-stitched, or stranded by a crash
    *     window), so their routes lack the O(log n) long-link ladder.
    *     Localized staleness (≤ `stitchRegionMaxFrac` of live buckets) →
    *     `stitch_region` naming exactly those buckets — apply with
    *     [[GraphAnn.repairRingRegion]], delta-sized, commit confined to
    *     their dirs. Widespread staleness → `rebuild` (exclusive, like
    *     the IVF refresh/rebuild ladder). `buildIds` is the roster the
    *     ring was last (re)built or stitched over — with a
    *     [[RingRoster]]-maintained store pass `RingRoster.read(...)`,
    *     which [[GraphAnn.appendNodesToStore]]'s stitching keeps current
    *     so neither decision ever fires from growth alone.
    *   - Edge fold waste past `compactFoldWaste` → compact via
    *     [[GraphAnn.compactGraphStore]] (the tombstone-folding twin).
    *
    * The deeper audit ([[GraphAnn.graphHealth]]: hops-to-converge and
    * scored-fraction drift over a query sample) stays a separate,
    * costlier call — run it when this plan is empty but latency SLOs
    * regress anyway.
    */
  def planGraph(
      spark: org.apache.spark.sql.SparkSession, root: String,
      buildIds: DataFrame, buildIdCol: String,
      t: Thresholds = Thresholds()): Seq[Decision] = {
    require(t.stitchRegionMaxFrac >= 0.0 && t.stitchRegionMaxFrac <= 1.0,
      s"stitchRegionMaxFrac must be in [0, 1], got ${t.stitchRegionMaxFrac}")
    val live = GraphAnn.readGraphStoreLatest(spark, root)
    val out = Seq.newBuilder[Decision]
    // per-bucket coverage: one distinct + broadcast-ranged semi-join +
    // bucket-grain aggregate — driver image ≤ nBuckets rows
    val liveSrcs = live.select(col("src").cast("long"), col("src_bucket"))
      .distinct()
    val build = buildIds
      .select(col(buildIdCol).cast("long").as("src")).distinct()
    val perBucket = liveSrcs
      .join(build.withColumn("__cov", lit(1)), Seq("src"), "left")
      .groupBy(col("src_bucket"))
      .agg(count(lit(1)).as("n"), sum(coalesce(col("__cov"), lit(0))).as("c"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .sortBy(_._1)
    val stale = perBucket.filter { case (_, n, c) =>
      n > 0 && c.toDouble / n < t.ringCoverageRebuild }
    if (stale.nonEmpty) {
      val frac = stale.length.toDouble / perBucket.length
      val worst = stale.minBy { case (b, n, c) => (c.toDouble / n, b) }
      if (frac <= t.stitchRegionMaxFrac)
        out += Decision("stitch_region", stale.map(_._1).toSeq,
          f"${stale.length}/${perBucket.length} buckets ring-stale " +
            f"(worst: bucket ${worst._1} coverage ${worst._3.toDouble / worst._2}%.3f " +
            f"< ${t.ringCoverageRebuild}%.2f) — stitch fingers for their " +
            "uncovered nodes; commit confined to these buckets")
      else
        out += Decision("rebuild", Seq.empty,
          f"${stale.length}/${perBucket.length} buckets (${frac * 100}%.0f%%) " +
            f"ring-stale past ${t.stitchRegionMaxFrac * 100}%.0f%% — staleness " +
            "is structural; rebuild restores the O(log n) routing diameter")
    }
    val rawCount = graft.sources.SnapshotStore
      .read(spark, root,
        commitCol = Some(graft.sources.SnapshotStore.CommitCol)).count()
    val liveCount = live.count()
    val waste =
      if (liveCount == 0L) 0.0
      else (rawCount - liveCount).toDouble / liveCount
    if (liveCount > 0L && waste > t.compactFoldWaste)
      out += Decision("compact", Seq.empty,
        f"latest read scans-and-discards ${rawCount - liveCount} of " +
          f"$rawCount edge rows (${waste * 100}%.0f%% of live) — fold " +
          "node tombstones physically")
    out.result()
  }
}

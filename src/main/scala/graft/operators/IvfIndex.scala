package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Inverted-file (IVF) approximate nearest-neighbor index over an embedding
  * column — the coarse-quantizer scale path alongside the hyperplane LSH in
  * [[VectorSearch]] (SURVEY.md §2.5 T1 extension; the capability the
  * reference serves per-query via brute force, re-expressed as an index).
  *
  * Shape at 100 TB: `centroidsByDraw` (or `refine`) builds a small centroid
  * table once per corpus snapshot — index metadata, broadcastable by
  * construction. `assign` adds a `cell` column in one narrow, shuffle-free,
  * whole-stage-codegen pass (the centroids are inlined literals, not a join
  * side); writing the corpus partitioned by `cell` then makes every probe a
  * partition-pruned scan of nProbe/nCells of the data. `search` touches only
  * the probed cells and lowers to TakeOrderedAndProject like the exact path.
  *
  * Determinism contract (what makes q3g oracle-able in DuckDB): the centroid
  * draw orders by (md5(id), id); assignment and probe selection rank by
  * (round(cosine, 6) DESC, cell ASC). Both engines replay the identical
  * integer/double pipeline, so cell ids and search results are hash-exact.
  */
object IvfIndex {

  /** A built coarse index: cell ids 0..nCells-1 with centroid vectors.
    * Small by contract (index metadata) — it ships to executors as literals.
    */
  final case class Index(centroids: Array[(Int, Array[Float])]) {
    def nCells: Int = centroids.length
    require(nCells > 0, "IVF index needs at least one centroid")
  }

  /** Deterministic centroid selection: the `nCells` corpus vectors with the
    * smallest (md5(id), id) — a uniform pseudo-random draw with no RNG state,
    * the same technique as [[DataMix]]'s sampling hash. One corpus scan with
    * a global top-nCells (TakeOrderedAndProject — per-partition heaps), and a
    * driver collect bounded by nCells × dim.
    */
  def centroidsByDraw(
      corpus: DataFrame, idCol: String, vecCol: String, nCells: Int): Index = {
    require(nCells > 0, s"nCells must be positive, got $nCells")
    val rows = corpus
      .select(md5(col(idCol).cast("string")).as("__d"),
        col(idCol).cast("string").as("__id"),
        VectorFunctions.asFloatArray(col(vecCol)).as("__v"))
      .orderBy(col("__d"), col("__id"))
      .limit(nCells)
      .collect()
    Index(rows.zipWithIndex.map { case (r, i) =>
      i -> r.getAs[scala.collection.Seq[Float]]("__v").toArray
    })
  }

  /** Nearest-centroid id for a vector column: argmax over the centroid set by
    * (round(cosine, 6) DESC, cell ASC) as one codegen expression — K cosines
    * per row, zero shuffle, no join. The tiebreak is encoded by taking the
    * struct-ordering max of (score, -cell). For very large nCells a two-level
    * coarse/fine assignment keeps the expression bounded; at typical
    * nCells ≤ 1024 this inlines fine (Spark splits oversized codegen).
    */
  def assignCell(vec: Column, index: Index, scoreScale: Int = 6): Column = {
    val scored = index.centroids.map { case (cell, cv) =>
      struct(
        round(VectorFunctions.cosine(vec, typedLit(cv)), scoreScale).as("s"),
        lit(-cell).as("negc"))
    }
    (-array_max(array(scored.toIndexedSeq: _*)).getField("negc")).as("cell")
  }

  /** `(cell, score)` struct for the nearest centroid — the cell exactly as
    * [[assignCell]] picks it, plus the winning `round(cosine, scoreScale)`
    * (the member→centroid similarity, e.g. for cluster-quality aggregates
    * or SemDeDup-style thresholds). Same single codegen expression, zero
    * shuffle.
    */
  def assignCellScore(vec: Column, index: Index, scoreScale: Int = 6): Column = {
    val scored = index.centroids.map { case (cell, cv) =>
      struct(
        round(VectorFunctions.cosine(vec, typedLit(cv)), scoreScale).as("s"),
        lit(-cell).as("negc"))
    }
    val best = array_max(array(scored.toIndexedSeq: _*))
    struct((-best.getField("negc")).as("cell"), best.getField("s").as("score"))
  }

  /** Corpus with a `cellCol` nearest-centroid column appended (the index
    * build's data pass). Persist partitioned/bucketed by this column so
    * probes prune at the source.
    */
  def assign(
      corpus: DataFrame, vecCol: String, index: Index,
      cellCol: String = "cell"): DataFrame =
    corpus.withColumn(cellCol, assignCell(col(vecCol), index))

  /** The nProbe cells nearest the query vector, ranked exactly like
    * [[assignCell]] ((round(cosine, 6) DESC, cell ASC)) — driver-side math
    * over the tiny centroid set, mirroring Spark's HALF_UP rounding so the
    * DuckDB oracle reproduces the probe set.
    */
  def probeCells(
      index: Index, queryVec: Array[Float], nProbe: Int,
      scoreScale: Int = 6): Seq[Int] = {
    require(nProbe > 0, s"nProbe must be positive, got $nProbe")
    index.centroids
      .map { case (cell, cv) => (roundHalfUp(cosineScalar(cv, queryVec), scoreScale), cell) }
      .sortBy { case (s, cell) => (-s, cell) }
      .take(nProbe)
      .map(_._2)
      .toSeq
  }

  /** IVF top-k: brute-force cosine restricted to the nProbe probed cells.
    * With the corpus stored partitioned by cell, the `isin` filter is a
    * partition-pruning predicate — the scan reads nProbe/nCells of the data.
    * nProbe = nCells degrades to the exact [[VectorSearch.topK]].
    */
  def search(
      assigned: DataFrame, vecCol: String, queryVec: Array[Float], index: Index,
      nProbe: Int, k: Int, cellCol: String = "cell",
      scoreScale: Option[Int] = Some(6), tiebreak: Option[String] = None): DataFrame = {
    val cells = probeCells(index, queryVec, nProbe)
    VectorSearch.topK(assigned, vecCol, queryVec, k,
      filter = col(cellCol).isin(cells: _*), scoreScale = scoreScale,
      tiebreak = tiebreak)
  }

  /** The q3a × q3g composition — the 100 TB serving layout: per-vector
    * symmetric int8 quantization (4× scan bandwidth vs FLOAT) stored
    * together with its `scale`, assigned to IVF cells by the DEQUANTIZED
    * view (what the stored bytes can reproduce — assignment must not
    * depend on the discarded float original). Write the result partitioned
    * by `cellCol`; [[searchQuantized]] then prunes partitions AND
    * dequantizes only the probed rows.
    */
  def quantizedStore(
      corpus: DataFrame, vecCol: String, index: Index,
      cellCol: String = "cell"): DataFrame =
    corpus
      .withColumn("scale", VectorFunctions.int8Scale(col(vecCol)))
      .withColumn("q8", VectorFunctions.int8Quantize(col(vecCol), col("scale")))
      .withColumn("__dv", VectorFunctions.int8Dequant(col("q8"), col("scale")))
      .withColumn(cellCol, assignCell(col("__dv"), index))
      .drop("__dv", vecCol)

  // ---- Versioned store lifecycle (round 9, VERDICT r8 task 4) ----------
  // The reference upserts points into a live index continuously
  // (internal/vectordb/vectordb.go:117-193). The Spark-native equivalent:
  // the quantized cell-partitioned store lives as a SnapshotStore root, a
  // full (re)build is an `overwrite` commit, and NEW vectors append as one
  // more cell-partitioned data dir — assigned with the FROZEN centroids,
  // so the append touches only the delta (no corpus rewrite) and probes
  // keep pruning: the per-dir union read pushes the cell predicate into
  // every snapshot dir. Readers get snapshot isolation and time travel for
  // free; recall drift of frozen-centroid assignment vs a fresh rebuild is
  // gated in RecallSpec, and when drift exceeds tolerance the answer is a
  // rebuild commit (same root, one `overwrite`).

  /** Build (or fully rebuild) the int8 IVF store as a snapshot commit:
    * [[quantizedStore]] written cell-partitioned under `root`. Returns the
    * committed version.
    *
    * `extraPartitionCols` adds secondary partition dimensions under the
    * cell — most importantly the TENANT column (VERDICT r9 task 4;
    * reference parity: the org filter is compiled into every vector
    * search, internal/vectordb/vectordb.go:216-234): with
    * `Seq("organization_id")`, a per-tenant search filters
    * `(cell IN probes) AND org = x` and BOTH predicates prune directories,
    * so small tenants get k rows at index cost instead of a post-filtered
    * global top-k that leaks budget to other tenants' neighbors.
    */
  def buildStoreVersioned(
      spark: org.apache.spark.sql.SparkSession, root: String,
      corpus: DataFrame, vecCol: String, index: Index,
      cellCol: String = "cell",
      extraPartitionCols: Seq[String] = Seq.empty): Int =
    graft.sources.SnapshotStore.overwrite(
      spark, root, quantizedStore(corpus, vecCol, index, cellCol),
      partitionBy = cellCol +: extraPartitionCols)

  /** Incrementally add `newVecs` to an existing store: quantize + assign
    * with the store's FROZEN centroids and commit one cell-partitioned
    * data dir (delta-sized work, optimistic-concurrency append — a racing
    * writer fails loudly, nothing interleaves). Returns the committed
    * version. Pass `expectedBase` to pin the version this delta was
    * planned against. `extraPartitionCols` must match the build's.
    */
  def appendToStore(
      spark: org.apache.spark.sql.SparkSession, root: String,
      newVecs: DataFrame, vecCol: String, index: Index,
      cellCol: String = "cell", expectedBase: Option[Int] = None,
      dirTag: Option[String] = None,
      extraPartitionCols: Seq[String] = Seq.empty): Int =
    graft.sources.SnapshotStore.append(
      spark, root, quantizedStore(newVecs, vecCol, index, cellCol),
      expectedBase, partitionBy = cellCol +: extraPartitionCols,
      dirTag = dirTag)

  // ---- Id-level upsert / delete (round 10, VERDICT r9 task 2) ----------
  // Reference parity: the vector sink is an UPSERT — re-ingesting a point
  // with the same id REPLACES it (internal/vectordb/vectordb.go:117-193),
  // points are deletable by id (:382-400) and purgeable by predicate
  // (:488-591). Plain-parquet translation: logical deletes ride as
  // TOMBSTONE rows (id + `__op = 'D'`, parked in the never-probed
  // `cell = -1` partition so data scans stay pruned while every fold sees
  // them), and "newer commit wins" is decided by the snapshot protocol's
  // OWN dir versions — SnapshotStore.read(commitCol) stamps each row with
  // the version its dir committed at, so no version column is stored.
  // An upsert is ONE commit carrying both the tombstone (kills strictly
  // older copies) and the replacement rows (same commit → survive).
  // Tombstones hold ids only and fold physically at [[compactStore]];
  // between compactions they are small by contract, so the fold is a
  // broadcast anti-ish join, not a shuffle.

  /** Marker column: 'U' data row, 'D' tombstone. Dirs written before the
    * upsert era lack it and read as 'U' via absentDefaults. Shared with
    * [[PqIndex]] — the tombstone mechanics are quantization-agnostic
    * (only the id, the cell partition and the op marker participate), so
    * `deleteFromStore`/`readStoreLatest`/`compactStore` work verbatim on
    * IVF-PQ roots.
    */
  private[operators] val OpCol = "__op"
  private[operators] val CommitCol = graft.sources.SnapshotStore.CommitCol

  /** Tombstone rows for `ids`, shaped to the store row type of `dataDf`:
    * every column null except the id, `cellCol = -1`, `__op = 'D'`.
    */
  private[operators] def tombstonesLike(
      dataDf: DataFrame, ids: DataFrame, idCol: String,
      cellCol: String): DataFrame = {
    val base = ids.select(col(idCol))
    dataDf.schema.fields.foldLeft(base) { (d, f) =>
      if (f.name == idCol) d
      else if (f.name == cellCol) d.withColumn(f.name, lit(-1))
      else if (f.name == OpCol) d.withColumn(f.name, lit("D"))
      else d.withColumn(f.name, lit(null).cast(f.dataType))
    }.select(dataDf.columns.map(col).toIndexedSeq: _*)
  }

  /** Upsert `newVecs` by id in ONE commit: a tombstone per incoming id
    * (kills every strictly-older copy of that id, in whatever cell the old
    * vector landed — an update can MOVE cells, so the kill must be
    * cell-agnostic) plus the quantized replacement rows. Returns the
    * committed version. Latest-wins reads via [[readStoreLatest]] /
    * [[searchQuantizedLatest]]; pinned older versions still serve the old
    * rows until expiry.
    */
  def upsertToStore(
      spark: org.apache.spark.sql.SparkSession, root: String,
      newVecs: DataFrame, idCol: String, vecCol: String, index: Index,
      cellCol: String = "cell", expectedBase: Option[Int] = None,
      dirTag: Option[String] = None,
      extraPartitionCols: Seq[String] = Seq.empty): Int = {
    val data = quantizedStore(newVecs, vecCol, index, cellCol)
      .withColumn(OpCol, lit("U"))
    val df = data.unionByName(
      tombstonesLike(data, newVecs.select(col(idCol)), idCol, cellCol))
    // tenant stores: the delta rides the same (cell, org) layout as the
    // build (tombstone rows carry null in the extra columns — they live
    // in cell=-1 regardless, so their pruning is unaffected)
    graft.sources.SnapshotStore.append(
      spark, root, df, expectedBase,
      partitionBy = cellCol +: extraPartitionCols,
      dirTag = dirTag)
  }

  /** Delete by id: one tombstone-only commit. A later [[upsertToStore]] of
    * the same id resurrects it (newer commit wins); [[compactStore]] folds
    * the tombstone away physically. Returns the committed version.
    */
  def deleteFromStore(
      spark: org.apache.spark.sql.SparkSession, root: String,
      ids: DataFrame, idCol: String, cellCol: String = "cell",
      expectedBase: Option[Int] = None): Int = {
    val shape = graft.sources.SnapshotStore
      .read(spark, root, absentDefaults = Seq(OpCol -> lit("U")))
      .limit(0)
    graft.sources.SnapshotStore.append(
      spark, root, tombstonesLike(shape, ids, idCol, cellCol),
      expectedBase, partitionBy = Seq(cellCol))
  }

  /** Tenant purge — ONE tombstone row per purge call (reference parity:
    * org-scoped point deletion, internal/vectordb/vectordb.go:488-591,
    * where the whole organization's points are removed by a filter, not by
    * id enumeration): commits a single marker row `__op = "P:<orgCol>"`
    * carrying the org value, which the latest-wins fold reads as "every
    * STRICTLY older row whose <orgCol> equals this value is dead". The
    * marker is self-describing — the fold discovers purge columns from the
    * op string itself, so reads need no caller-supplied tenant column.
    *
    * Delta-sized by construction: a billion-row tenant purges with one
    * committed row — no id scan, no partition rewrite. Logical-then-
    * physical: the tenant disappears from [[readStoreLatest]] /
    * [[searchQuantizedLatest]] at this commit; bytes leave disk at
    * [[compactStore]] (folds the rows away) + `SnapshotStore
    * .expireSnapshots` (retires the old versions still holding them) —
    * the two-step every snapshot-versioned store (and the GDPR clock)
    * requires. A LATER upsert of the same tenant's ids resurrects exactly
    * those ids (newer commit wins) — re-ingest-after-purge semantics.
    * Works verbatim on IVF-PQ roots (the shared tombstone mechanics).
    */
  def purgeTenantFromStore(
      spark: org.apache.spark.sql.SparkSession, root: String,
      orgCol: String, orgValue: Any, cellCol: String = "cell",
      expectedBase: Option[Int] = None): Int = {
    val shape = graft.sources.SnapshotStore
      .read(spark, root, absentDefaults = Seq(OpCol -> lit("U")))
      .limit(0)
    require(shape.columns.contains(orgCol),
      s"store at $root has no column '$orgCol' to purge on")
    require(orgCol != cellCol && orgCol != OpCol,
      s"cannot purge on protocol column '$orgCol'")
    val marker = shape.schema.fields.foldLeft(
      spark.range(1).toDF("__seed")) { (d, f) =>
      if (f.name == orgCol) d.withColumn(f.name, lit(orgValue).cast(f.dataType))
      else if (f.name == cellCol) d.withColumn(f.name, lit(-1))
      else if (f.name == OpCol) d.withColumn(f.name, lit(s"P:$orgCol"))
      else d.withColumn(f.name, lit(null).cast(f.dataType))
    }.select(shape.columns.map(col).toIndexedSeq: _*)
    graft.sources.SnapshotStore.append(
      spark, root, marker, expectedBase, partitionBy = Seq(cellCol))
  }

  /** Broadcast bound for tombstone folds (VERDICT r10 task 3): at ~64
    * bytes a row, 4M distinct tombstoned ids is a ~256 MB broadcast — the
    * edge of sane; past it a hard-hinted broadcast would OOM executors
    * exactly when a bulk delete made the cleanup urgent. Shared with
    * [[GraphAnn.readGraphStoreLatest]].
    */
  private[operators] val DefaultMaxBroadcastTombstones = 4000000L

  /** The size-guarded join hint: ONE cheap count over `small` (the caller
    * passes a partition-pruned tombstone aggregate) decides broadcast vs
    * an unhinted join — above the bound Spark is free to plan a shuffle
    * join and the fold completes instead of OOMing. Results are identical
    * either way (spec-gated with the bound forced to 0).
    */
  private[operators] def sizeGuardedHint(
      small: DataFrame, maxRows: Long): DataFrame => DataFrame = {
    val n = small.count()
    if (n <= maxRows) df => broadcast(df) else identity[DataFrame]
  }

  /** Latest-wins tombstone fold over a commit-stamped read: a data row
    * survives unless SOME tombstone for its id carries a STRICTLY newer
    * commit (an upsert's same-commit replacement outlives its own
    * tombstone), and unless a strictly-newer org-level purge marker
    * ([[purgeTenantFromStore]]) covers one of its column values. Purge
    * markers are self-describing (`P:<orgCol>`), discovered by one bounded
    * collect over the tombstone partition (cell = -1, partition-pruned;
    * distinct marker strings ≤ the number of columns ever purged on — in
    * practice one). Id tombstones fold physically at [[compactStore]] and
    * are small between compactions by contract — but the join strategy is
    * SIZE-GUARDED, not contract-trusted ([[sizeGuardedHint]]): a bulk
    * delete degrades the fold to a shuffle join instead of OOMing it.
    * Purge markers stay broadcast (one committed row per purge call by
    * construction).
    */
  private def foldTombstones(
      raw: DataFrame, idCol: String, cellCol: String,
      maxBroadcastTombstones: Long = DefaultMaxBroadcastTombstones,
      tombstonesPossible: Boolean = true): DataFrame = {
    // round-11 ADVICE: when the caller proved (manifest/dir listing, no
    // Spark job) that no committed dir holds the -1 parking lot, there is
    // nothing to fold — skip the strategy count AND the marker collect
    if (!tombstonesPossible) return raw.filter(col(OpCol) === "U")
    val dead = raw.filter(col(cellCol) === -1)
    val tombs = dead.filter(col(OpCol) === "D")
      .groupBy(col(idCol)).agg(max(col(CommitCol)).as("__tv"))
    val hint = sizeGuardedHint(tombs, maxBroadcastTombstones)
    val purgeMarkers = dead
      .filter(col(OpCol).startsWith("P:"))
      .select(col(OpCol)).distinct()
      .collect().map(_.getString(0)).sorted // bounded: ≤ #purged-on columns
    val base = raw.filter(col(OpCol) === "U")
      .join(hint(tombs), Seq(idCol), "left")
      .filter(col("__tv").isNull || col(CommitCol) >= col("__tv"))
      .drop("__tv")
    purgeMarkers.foldLeft(base) { (live, m) =>
      val oc = m.stripPrefix("P:")
      val pt = dead.filter(col(OpCol) === m)
        .groupBy(col(oc)).agg(max(col(CommitCol)).as("__pv"))
      live.join(broadcast(pt), Seq(oc), "left")
        .filter(col("__pv").isNull || col(CommitCol) >= col("__pv"))
        .drop("__pv")
    }
  }

  /** The store's LIVE rows at a version (default current): tombstones and
    * superseded copies folded out, helper columns dropped. Time travel to
    * a pinned version replays exactly that version's visible state.
    */
  def readStoreLatest(
      spark: org.apache.spark.sql.SparkSession, root: String,
      idCol: String, cellCol: String = "cell",
      version: Option[Int] = None,
      maxBroadcastTombstones: Long = DefaultMaxBroadcastTombstones): DataFrame =
    foldTombstones(
      graft.sources.SnapshotStore.read(spark, root, version,
        commitCol = Some(CommitCol),
        absentDefaults = Seq(OpCol -> lit("U"))),
      idCol, cellCol, maxBroadcastTombstones,
      tombstonesPossible = graft.sources.SnapshotStore
        .mayContainPartition(spark, root, cellCol, "-1", version))
      .filter(col(cellCol) =!= -1)
      .drop(CommitCol, OpCol)

  /** [[searchQuantized]] over an upsert/delete store: probes read the
    * probed cells PLUS the tombstone partition (`cell = -1`) — still one
    * partition-pruning isin predicate — fold latest-wins, then score.
    * A row whose id was upserted into an UNPROBED cell is correctly
    * absent: its old copy is killed by the tombstone, its new copy lives
    * in the cell that now matches its vector.
    */
  def searchQuantizedLatest(
      spark: org.apache.spark.sql.SparkSession, root: String,
      q8Col: String, scaleCol: String, queryVec: Array[Float], index: Index,
      nProbe: Int, k: Int, idCol: String, cellCol: String = "cell",
      version: Option[Int] = None, scoreScale: Option[Int] = Some(6),
      tiebreak: Option[String] = None,
      maxBroadcastTombstones: Long = DefaultMaxBroadcastTombstones): DataFrame = {
    val cells = probeCells(index, queryVec, nProbe) :+ -1
    val raw = graft.sources.SnapshotStore.read(spark, root, version,
        commitCol = Some(CommitCol),
        absentDefaults = Seq(OpCol -> lit("U")))
      .where(col(cellCol).isin(cells: _*))
    val live = foldTombstones(raw, idCol, cellCol, maxBroadcastTombstones,
      tombstonesPossible = graft.sources.SnapshotStore
        .mayContainPartition(spark, root, cellCol, "-1", version))
      .filter(col(cellCol) =!= -1)
      .drop(CommitCol, OpCol)
    VectorSearch.topK(
      live.withColumn("__dv", VectorFunctions.int8Dequant(col(q8Col), col(scaleCol))),
      "__dv", queryVec, k, scoreScale = scoreScale, tiebreak = tiebreak)
      .drop("__dv")
  }

  /** Fold tombstones PHYSICALLY: rewrite the resolved live rows as one
    * fresh cell-partitioned snapshot (tombstone rows and superseded copies
    * do not survive into the new dir). This — not the generic
    * `SnapshotStore.compact`, which would collapse every row onto one
    * commit version and resurrect deleted ids — is the compaction path for
    * upsert/delete stores. Returns the committed version.
    */
  def compactStore(
      spark: org.apache.spark.sql.SparkSession, root: String,
      idCol: String, cellCol: String = "cell",
      expectedBase: Option[Int] = None,
      extraPartitionCols: Seq[String] = Seq.empty): Int = {
    // pin ONE version as both the read snapshot and the commit base — a
    // commit interleaving this read-modify-write collides loudly instead
    // of being silently folded over (the appendNodesToStore discipline).
    // `extraPartitionCols` MUST match the build's (e.g. the tenant column
    // of a buildStoreVersioned(extraPartitionCols = Seq(org)) store) —
    // ENFORCED against the store's own directory layout, so compacting
    // with the default can no longer silently demote the org dimension
    // to a data column (round-10 ADVICE, the refreshCells guard).
    requireLayoutMatches(spark, root, cellCol, extraPartitionCols, "compactStore")
    val base = expectedBase.orElse(
      graft.sources.SnapshotStore.currentVersion(spark, root))
    val live = readStoreLatest(spark, root, idCol, cellCol, version = base)
      .withColumn(OpCol, lit("U"))
    graft.sources.SnapshotStore.overwrite(spark, root, live,
      base, partitionBy = cellCol +: extraPartitionCols)
  }

  /** Open the versioned store (latest or pinned version) for
    * [[searchQuantized]]. Cell predicates prune inside every snapshot dir.
    * RAW view for append-only stores — a store that has seen
    * [[upsertToStore]]/[[deleteFromStore]] must read through
    * [[readStoreLatest]]/[[searchQuantizedLatest]] so tombstones fold
    * (this raw read fails loudly on the `__op` column-set mismatch rather
    * than silently serving dead rows).
    */
  def readStoreVersioned(
      spark: org.apache.spark.sql.SparkSession, root: String,
      version: Option[Int] = None): DataFrame =
    graft.sources.SnapshotStore.read(spark, root, version)

  /** Index-staleness probe — the drift alarm for frozen-centroid appends
    * (the hook [[graft.streaming.StreamingVectorIndex]]'s contract names):
    * one aggregate over `vecs` returning (n, mean/min member→centroid
    * cosine at the [[assignCellScore]] arithmetic). A falling mean against
    * the build-time baseline means the corpus distribution has moved off
    * the frozen centroids — rebuild via [[buildStoreVersioned]]. One
    * narrow codegen pass + a scalar aggregate: cheap enough to run on
    * every append delta.
    */
  def assignQuality(
      vecs: DataFrame, vecCol: String, index: Index): (Long, Double, Double) = {
    val row = vecs
      .select(assignCellScore(col(vecCol), index).getField("score").as("__s"))
      .agg(count(lit(1)), avg(col("__s")), min(col("__s")))
      .head()
    if (row.getLong(0) == 0L) (0L, Double.NaN, Double.NaN)
    else (row.getLong(0), row.getDouble(1), row.getDouble(2))
  }

  /** The member vector the repair family scores and re-fits against —
    * MUST match the convention the store's build assigned with:
    * the int8 store ([[quantizedStore]]) assigns on the DEQUANTIZED
    * vector (default — `q8Col`/`scaleCol`), the IVF-PQ store
    * ([[PqIndex.ivfPqStore]]) on the RAW float sibling column (pass
    * `vecColOpt = Some(vecCol)`; PQ codes are codebook-only functions,
    * so a cell move never invalidates them and the repair family works
    * verbatim on IVF-PQ roots).
    */
  private def memberVec(
      q8Col: String, scaleCol: String, vecColOpt: Option[String]): Column =
    vecColOpt.fold(VectorFunctions.int8Dequant(col(q8Col), col(scaleCol)))(
      vc => VectorFunctions.asFloatArray(col(vc)))

  // ---- Drift repair: localize + refresh (round 10) ---------------------
  // [[assignQuality]] is the ALARM (corpus-level mean cohesion falling
  // against the build-time baseline); acting on it used to mean a full
  // [[buildStoreVersioned]] rebuild. The repair is usually local — drift
  // concentrates in the cells the appended distribution lands on — so the
  // maintenance loop is: alarm (assignQuality on each append delta) →
  // localize ([[cellQuality]], one pass naming the incohesive cells) →
  // repair ([[refreshCells]], Lloyd over ONLY those cells' members +
  // a partition-level replace commit). The repair is delta-sized twice
  // over: the Lloyd rounds touch only the named cells' members
  // (partition-pruned read), and the commit rewrites only their dirs —
  // untouched cells' files are re-referenced byte-identical, the
  // [[appendToStore]] discipline applied to re-clustering.

  /** Per-cell cohesion: for every cell, the member count and mean/min
    * round-6 cosine of each member's dequantized vector against its OWN
    * cell centroid — the localization scan behind [[refreshCells]].
    * Columns `(cellCol, n, mean_score, min_score)`.
    *
    * One narrow full-store pass (codegen dequant + cosine against a
    * broadcast centroid frame, partial-aggregated on cell); on a 100 TB
    * store run it on a sampled read (`store.sample(f)`) — per-cell MEANS
    * are what rank cells, and they survive sampling.
    */
  def cellQuality(
      store: DataFrame, q8Col: String, scaleCol: String, index: Index,
      cellCol: String = "cell", vecColOpt: Option[String] = None): DataFrame = {
    val spark = store.sparkSession
    import spark.implicits._
    val cents = index.centroids.toSeq.toDF(cellCol, "__cent")
    store
      .select(col(cellCol), memberVec(q8Col, scaleCol, vecColOpt).as("__dv"))
      .join(broadcast(cents), cellCol)
      .select(col(cellCol),
        round(VectorFunctions.cosine(col("__dv"), col("__cent")), 6).as("__s"))
      .groupBy(col(cellCol))
      // order-free mean (the refineExact discipline applied to the
      // localizer): round-6 scores sum exactly through DECIMAL, divide in
      // double, snap back to the 6-grid — so [[worstCells]] ranks, the
      // planner's drift cuts, and any oracle replay see the SAME number
      // on every partitioning (a double `avg` leaks summation order)
      .agg(count(lit(1)).as("n"),
        round(sum(col("__s").cast("decimal(18,6)")).cast("double")
          / count(lit(1)).cast("double"), 6).as("mean_score"),
        min(col("__s")).as("min_score"))
  }

  /** The `k` least-cohesive cells of a [[cellQuality]] frame (mean ASC,
    * cell ASC tiebreak), skipping cells below `minCellSize` members —
    * singleton cells are perfectly cohesive by construction and tiny ones
    * rank low on noise, not drift.
    */
  def worstCells(
      quality: DataFrame, k: Int, minCellSize: Long = 2L,
      cellCol: String = "cell"): Seq[Int] =
    quality.filter(col("n") >= minCellSize)
      .orderBy(col("mean_score").asc, col(cellCol).asc)
      .limit(k)
      .select(col(cellCol)).collect().map(_.getInt(0)).toSeq

  /** Re-cluster ONLY `cells` and commit the result as a partition-level
    * replace: their live members (tombstones folded at the pinned base
    * version) are read partition-pruned, their centroids re-fit with
    * [[refineExact]]'s order-free DECIMAL/9-grid Lloyd rounds seeded from
    * the current centroids, members re-assigned among the REFRESHED
    * subset only (a member cannot leave the touched set, so untouched
    * cells — and their files — are provably untouched), and the touched
    * dirs replaced in one optimistic-concurrency commit. Returns the new
    * caller-held [[Index]] (untouched centroids carried as-is) and the
    * committed version.
    *
    * Codes and scales are per-row and cell-independent, so the rewrite
    * re-quantizes nothing — only the `cellCol` value changes. A cell whose
    * reassignment emptied it is dropped from the manifest via
    * `dropPartitions` (a hive write cannot emit an empty dir); its
    * refreshed centroid stays in the index and simply probes zero rows
    * until an append repopulates it.
    *
    * Tenant-partitioned stores (VERDICT r10 task 1): pass the build's
    * `extraPartitionCols` and the rewrite dir carries the full
    * `(cell, org, …)` layout — touched cells keep EVERY prune dimension
    * (the tenant values ride readStoreLatest's output as ordinary columns
    * and become directories again at the write). The store's actual
    * layout is derived from its own dirs and checked against the declared
    * one, so a refresh that would silently demote a partition dimension
    * fails loudly instead (round-10 ADVICE).
    */
  def refreshCells(
      spark: org.apache.spark.sql.SparkSession, root: String,
      index: Index, cells: Seq[Int], idCol: String,
      q8Col: String = "q8", scaleCol: String = "scale",
      cellCol: String = "cell", iters: Int = 2,
      expectedBase: Option[Int] = None,
      dirTag: Option[String] = None,
      vecColOpt: Option[String] = None,
      extraPartitionCols: Seq[String] = Seq.empty): (Index, Int) = {
    require(cells.nonEmpty, "refreshCells needs at least one cell")
    require(iters >= 1, s"iters must be >= 1, got $iters")
    requireLayoutMatches(spark, root, cellCol, extraPartitionCols, "refreshCells")
    val cellSet = cells.toSet
    val known = index.centroids.map(_._1).toSet
    require(cellSet.subsetOf(known),
      s"unknown cells: ${(cellSet -- known).toSeq.sorted.mkString(",")}")
    // pin ONE version as both the read snapshot and the commit base — a
    // commit interleaving this read-modify-write collides loudly instead
    // of being silently folded over (the compactStore discipline)
    val base = expectedBase.orElse(
      graft.sources.SnapshotStore.currentVersion(spark, root))
    val members = graft.operators.IterCheckpoint.pin(
      readStoreLatest(spark, root, idCol, cellCol, version = base)
        .filter(col(cellCol).isin(cells: _*))
        .withColumn("__dv", memberVec(q8Col, scaleCol, vecColOpt)))
    val subIndex = Index(index.centroids.filter(p => cellSet.contains(p._1)))
    val refreshed = refineExact(members, "__dv", subIndex, iters)
    val rewritten = members
      .withColumn(cellCol, assignCell(col("__dv"), refreshed))
      .drop("__dv")
      .withColumn(OpCol, lit("U"))
    // bounded collect: ≤ |cells| ints — cells the reassignment emptied
    val kept = rewritten.select(col(cellCol)).distinct()
      .collect().map(_.getInt(0)).toSet
    val next = graft.sources.SnapshotStore.replacePartitions(
      spark, root, rewritten, cellCol, expectedBase = base, dirTag = dirTag,
      dropPartitions = cellSet.diff(kept).map(c => s"$cellCol=$c"),
      extraPartitionCols = extraPartitionCols)
    val byCell = refreshed.centroids.toMap
    (Index(index.centroids.map { case (c, v) =>
      c -> byCell.getOrElse(c, v)
    }), next)
  }

  /** The repair family's layout guard (round-10 ADVICE): the store's real
    * partition chain — derived from its own directory structure, the only
    * layout record a plain-parquet store has — must equal the declared
    * `cellCol +: extraPartitionCols`, or the rewrite would silently demote
    * the undeclared dimensions to data columns for every touched cell and
    * per-tenant searches would lose directory pruning from that version
    * on. Empty layout (fresh/unpartitioned store) passes — there is
    * nothing to demote.
    */
  private def requireLayoutMatches(
      spark: org.apache.spark.sql.SparkSession, root: String,
      cellCol: String, extraPartitionCols: Seq[String], op: String): Unit = {
    val layout = graft.sources.SnapshotStore.partitionLayout(spark, root)
    val declared = cellCol +: extraPartitionCols
    require(layout.isEmpty || layout == declared,
      s"$op: store at $root is partitioned (${layout.mkString(", ")}) but " +
        s"the rewrite would commit (${declared.mkString(", ")}) — pass " +
        "extraPartitionCols matching the build's so touched partitions " +
        "keep every prune dimension")
  }

  /** The `k` FULLEST cells of a [[cellQuality]] frame (n DESC, cell ASC
    * tiebreak) — the skew localizer behind [[splitCell]]. With the store
    * partitioned by cell, a cell's member count IS its probe cost
    * ([[TunePoint]] measures real sizes for the same reason), so a
    * runaway cell makes every query that probes it pay its whole scan.
    */
  def largestCells(
      quality: DataFrame, k: Int, cellCol: String = "cell"): Seq[Int] =
    quality.orderBy(col("n").desc, col(cellCol).asc)
      .limit(k)
      .select(col(cellCol)).collect().map(_.getInt(0)).toSeq

  /** Split ONE overfull cell in two — the skew repair beside
    * [[refreshCells]]'s drift repair. The cell's live members are read
    * partition-pruned at a pinned base version, two seed centroids are
    * drawn deterministically INSIDE the cell ((md5(id), id) order — the
    * [[centroidsByDraw]] contract restricted to its members), re-fit with
    * [[refreshCells]]'s exact Lloyd rounds over the dequantized vectors,
    * members re-assigned between the two halves, and the result committed
    * as a partition-level replace of the one touched dir plus the new
    * cell's dir. Returns the grown [[Index]] (the new half gets
    * `max(cell) + 1`; every other centroid carried verbatim) and the
    * committed version.
    *
    * Untouched cells' files are never rewritten; codes/scales are reused
    * (cell-independent, like the refresh); the split is delta-sized in
    * the one cell's member count. Probes keep working mid-rollout: a
    * query planned against the OLD index simply never probes the new
    * cell id, and the pinned-version read serves the pre-split layout.
    * Tenant-partitioned stores: same `extraPartitionCols` contract and
    * layout guard as [[refreshCells]].
    */
  def splitCell(
      spark: org.apache.spark.sql.SparkSession, root: String,
      index: Index, cell: Int, idCol: String,
      q8Col: String = "q8", scaleCol: String = "scale",
      cellCol: String = "cell", iters: Int = 2,
      expectedBase: Option[Int] = None,
      dirTag: Option[String] = None,
      vecColOpt: Option[String] = None,
      extraPartitionCols: Seq[String] = Seq.empty): (Index, Int) = {
    require(index.centroids.exists(_._1 == cell), s"unknown cell $cell")
    requireLayoutMatches(spark, root, cellCol, extraPartitionCols, "splitCell")
    val newCell = index.centroids.map(_._1).max + 1
    val base = expectedBase.orElse(
      graft.sources.SnapshotStore.currentVersion(spark, root))
    val members = graft.operators.IterCheckpoint.pin(
      readStoreLatest(spark, root, idCol, cellCol, version = base)
        .filter(col(cellCol) === cell)
        .withColumn("__dv", memberVec(q8Col, scaleCol, vecColOpt)))
    val seeds = centroidsByDraw(members, idCol, "__dv", nCells = 2)
    require(seeds.nCells == 2,
      s"cell $cell has < 2 members — nothing to split")
    val subIndex = Index(Array(
      cell -> seeds.centroids(0)._2, newCell -> seeds.centroids(1)._2))
    val refined = refineExact(members, "__dv", subIndex, iters)
    val rewritten = members
      .withColumn(cellCol, assignCell(col("__dv"), refined))
      .drop("__dv")
      .withColumn(OpCol, lit("U"))
    // bounded collect: ≤ 2 ints — a half the reassignment emptied (the
    // degenerate all-members-on-one-side split) must still drop its dir
    val kept = rewritten.select(col(cellCol)).distinct()
      .collect().map(_.getInt(0)).toSet
    val next = graft.sources.SnapshotStore.replacePartitions(
      spark, root, rewritten, cellCol, expectedBase = base, dirTag = dirTag,
      dropPartitions =
        (Set(cell) -- kept).map(c => s"$cellCol=$c"),
      extraPartitionCols = extraPartitionCols)
    val byCell = refined.centroids.toMap
    (Index(index.centroids.map { case (c, v) =>
      c -> byCell.getOrElse(c, v)
    } :+ (newCell -> byCell(newCell))), next)
  }

  /** IVF top-k over an int8 store: probe cells exactly like [[search]]
    * (float query against the float centroid metadata), dequantize on the
    * fly inside the probed cells only — the cell filter is applied BEFORE
    * the dequant column so it reaches the scan as a partition predicate.
    */
  def searchQuantized(
      store: DataFrame, q8Col: String, scaleCol: String, queryVec: Array[Float],
      index: Index, nProbe: Int, k: Int, cellCol: String = "cell",
      scoreScale: Option[Int] = Some(6), tiebreak: Option[String] = None): DataFrame = {
    val cells = probeCells(index, queryVec, nProbe)
    VectorSearch.topK(
      store.where(col(cellCol).isin(cells: _*))
        .withColumn("__dv", VectorFunctions.int8Dequant(col(q8Col), col(scaleCol))),
      "__dv", queryVec, k, scoreScale = scoreScale, tiebreak = tiebreak)
      .drop("__dv")
  }

  /** Lloyd's k-means refinement of an index: `iters` rounds of assign →
    * per-cell mean. Each round is one narrow assignment pass plus one
    * partial-aggregated shuffle of nCells × dim × partitions rows (posexplode
    * keyed on (cell, dim)); the driver collect per round is nCells × dim
    * doubles — index metadata. Empty cells keep their previous centroid.
    * Means use distributed double summation, so refined centroids are
    * deterministic only up to float-addition order — refinement trades the
    * draw index's bit-exact replayability for recall (RecallSpec gates the
    * improvement); keep [[centroidsByDraw]] output where oracle parity
    * matters.
    */
  def refine(
      corpus: DataFrame, vecCol: String, index: Index, iters: Int = 3): Index = {
    require(iters >= 0, s"iters must be non-negative, got $iters")
    var cents = index
    var round = 0
    while (round < iters) {
      val sums = assign(corpus, vecCol, cents, cellCol = "__cell")
        .select(col("__cell"),
          posexplode(VectorFunctions.asFloatArray(col(vecCol))).as(Seq("__pos", "__x")))
        .groupBy("__cell", "__pos")
        .agg(avg(col("__x").cast("double")).as("__m"))
        .collect()
      val byCell = sums.groupBy(_.getInt(0))
      val next = cents.centroids.map { case (cell, old) =>
        byCell.get(cell) match {
          case Some(rows) =>
            val v = old.clone()
            rows.foreach(r => v(r.getInt(1)) = r.getDouble(2).toFloat)
            cell -> v
          case None => cell -> old
        }
      }
      cents = Index(next)
      round += 1
    }
    cents
  }

  /** Grid-snapped Lloyd refinement — the oracle-able twin of [[refine]].
    * Each round reassigns (the [[assignCell]] ranking contract) and recomputes
    * every centroid component as an ORDER-FREE exact mean: components sum
    * through DECIMAL(28,12) (float inputs are exact at scale 12 in unit
    * range), divide by the exact member count in double, snap to the
    * 9-decimal grid, and store as FLOAT — the same DECIMAL-sum /
    * 9-decimal-grid / float-cast recipe that keeps PageRank (q4b) and the
    * quantized store (q3n) hash-exact across engines. Unlike [[refine]]
    * (double `avg`, float-addition order leaks in), the refined centroids
    * here are bit-identical on any partitioning, so a DuckDB twin can unroll
    * the rounds as chained CTEs.
    *
    * Scale shape per round: one narrow assignment pass (centroids are inlined
    * literals), one partial-aggregated shuffle keyed on (cell, dim) — at most
    * nCells × dim × partitions combiner rows — and a driver collect bounded
    * by nCells × dim (index metadata). Empty cells keep their previous
    * centroid, mirroring [[refine]].
    */
  def refineExact(
      corpus: DataFrame, vecCol: String, index: Index, iters: Int): Index = {
    require(iters >= 0, s"iters must be non-negative, got $iters")
    var cents = index
    for (_ <- 1 to iters) {
      // one round = one sums image + the shared finalize arithmetic, the
      // exact same two steps the streaming path runs (assignSums add-merged
      // across micro-batches, finalizeCentroids at trigger end) — a single
      // source of truth for the mean arithmetic
      val acc = scala.collection.mutable
        .Map.empty[(Int, Int), (java.math.BigDecimal, Long)]
      mergeAssignSums(acc, assignSums(corpus, vecCol, cents))
      cents = finalizeCentroids(acc, cents)
    }
    cents
  }

  /** Per-batch component sums for ONE distributed Lloyd round: each row is
    * assigned to its nearest centroid of the FIXED `index` and contributes
    * its components as DECIMAL(28,12)-exact sums — (cell, pos, sum, n) rows,
    * at most nCells × dim of them per batch. The streaming complement of
    * [[refineExact]]: sums ADD across micro-batches (the CMS exactly-once
    * contract), so accumulating batch images and finalizing with
    * [[finalizeCentroids]] yields BIT-IDENTICAL centroids to one
    * refineExact round over the union of the batches — the order-free
    * DECIMAL arithmetic is what makes the split irrelevant.
    */
  def assignSums(
      batch: DataFrame, vecCol: String, index: Index): DataFrame =
    assign(batch, vecCol, index, cellCol = "__cell")
      .select(col("__cell"),
        posexplode(VectorFunctions.asFloatArray(col(vecCol))).as(Seq("__pos", "__x")))
      .groupBy("__cell", "__pos")
      .agg(sum(col("__x").cast("double").cast("decimal(28,12)")).as("__s"),
        count(lit(1)).as("__n"))
      .select(col("__cell").as("cell"), col("__pos").as("pos"),
        col("__s").as("s"), col("__n").as("n"))

  /** Add-merge a batch's [[assignSums]] image into the streaming
    * accumulator (driver state ≤ nCells × dim entries — index metadata).
    */
  def mergeAssignSums(
      acc: scala.collection.mutable.Map[(Int, Int), (java.math.BigDecimal, Long)],
      batchSums: DataFrame): Unit =
    batchSums.collect().foreach { r =>
      val k = (r.getInt(0), r.getInt(1))
      val s = r.getDecimal(2)
      val n = r.getLong(3)
      val (s0, n0) = acc.getOrElse(k,
        (java.math.BigDecimal.ZERO.setScale(s.scale), 0L))
      acc(k) = (s0.add(s), n0 + n)
    }

  /** Finalize an accumulated sums image into the next centroid set with
    * refineExact's exact arithmetic: mean = round(sumDouble / n, 9) stored
    * as float; empty cells keep their previous centroid.
    */
  def finalizeCentroids(
      acc: scala.collection.Map[(Int, Int), (java.math.BigDecimal, Long)],
      prev: Index): Index =
    Index(prev.centroids.map { case (cell, old) =>
      val v = old.clone()
      var touched = false
      acc.foreach { case ((c, pos), (s, n)) =>
        if (c == cell) {
          v(pos) = roundHalfUp(s.doubleValue() / n, 9).toFloat
          touched = true
        }
      }
      cell -> (if (touched) v else old)
    })

  /** One measured point of the recall/cost trade-off grid: mean recall@k
    * over the query sample and the mean fraction of the corpus the probed
    * cells actually cover (REAL per-cell sizes, not nProbe/nCells — cells
    * are uneven). `scanFrac` IS the probe cost: with the store partitioned
    * by cell, it is the fraction of data a query's scan reads.
    */
  final case class TunePoint(
      nCells: Int, nProbe: Int, recall: Double, scanFrac: Double)

  /** [[tuneForRecall]] output: the full measured curve plus the cheapest
    * point meeting the target (None when even exhaustive probing misses it
    * — possible when k-NN ties straddle cell boundaries).
    */
  final case class TuneResult(best: Option[TunePoint], curve: Seq[TunePoint]) {
    /** The measured curve as a DataFrame (n_cells, n_probe, recall,
      * scan_frac) for reporting/persistence.
      */
    def curveDf(spark: org.apache.spark.sql.SparkSession): DataFrame = {
      import spark.implicits._
      curve.map(p => (p.nCells, p.nProbe, p.recall, p.scanFrac))
        .toDF("n_cells", "n_probe", "recall", "scan_frac")
    }
  }

  /** Recall auto-tuner (VERDICT r7 task 2 — the honest answer to the
    * HNSW-tier gap): measure recall@k across a (nCells, nProbe) grid on a
    * deterministic query sample and return the CHEAPEST configuration
    * meeting `targetRecall`, so a deployment maps "recall ≥ 0.95 at
    * minimum probe cost" to concrete knobs instead of hand-tuning.
    *
    * Method: per candidate nCells, build the deterministic index
    * (centroidsByDraw + refineExact — both replayable), run ONE distributed
    * assignment pass, and sweep nProbe over a power-of-two ladder. Recall
    * is measured against the exact cosine ranking with the codegen
    * expression's arithmetic (cosineScalar/roundHalfUp — IvfSpec proves
    * the equivalence to the distributed path); cost is the measured
    * fraction of corpus rows inside the probed cells. Cheapest = smallest
    * scanFrac, ties to smaller nCells (less index metadata), then smaller
    * nProbe.
    *
    * Contract: `corpus` is a bounded AUDIT SAMPLE (the RecallSpec/q31
    * bounded-panel discipline — ≲10⁵ rows collect locally; at 100 TB you
    * tune on a deterministic sample and apply the chosen config to the
    * full build, exactly like any ANN parameter search). The index builds
    * still run the REAL distributed path, so the chosen (nCells, nProbe)
    * transfers as-is.
    */
  def tuneForRecall(
      corpus: DataFrame, idCol: String, vecCol: String,
      targetRecall: Double, k: Int,
      nCellsGrid: Seq[Int] = Seq(8, 16, 32, 64),
      nQueries: Int = 30, refineIters: Int = 2): TuneResult = {
    require(targetRecall > 0 && targetRecall <= 1, s"bad target $targetRecall")
    require(nCellsGrid.nonEmpty && nCellsGrid.forall(_ > 0), "bad nCells grid")
    val vecs = corpus
      .select(col(idCol).cast("long").as("id"),
        graft.functions.VectorFunctions.asFloatArray(col(vecCol)).as("v"))
      .collect()
      .map(r => r.getLong(0) -> r.getAs[scala.collection.Seq[Float]](1).toArray)
      .sortBy(_._1)
    require(vecs.length > k, s"audit sample smaller than k=$k")
    val queries = vecs.take(nQueries)
    val exactByQ = queries.map { case (qid, qv) =>
      qid -> vecs.filter(_._1 != qid).map { case (id, v) =>
        (roundHalfUp(cosineScalar(v, qv), 6), id)
      }.sortBy { case (s, id) => (-s, id) }.take(k).map(_._2).toSet
    }.toMap
    val curve = nCellsGrid.sorted.flatMap { nc =>
      val idx = refineExact(corpus, vecCol,
        centroidsByDraw(corpus, idCol, vecCol, nc), refineIters)
      // one REAL distributed assignment pass per nCells candidate
      val cellOf = assign(corpus, vecCol, idx)
        .select(col(idCol).cast("long"), col("cell")).collect()
        .map(r => r.getLong(0) -> r.getInt(1)).toMap
      val cellSize = cellOf.valuesIterator.toSeq
        .groupBy(identity).map { case (c, xs) => c -> xs.size.toLong }
      val probeLadder =
        (Iterator.iterate(1)(_ * 2).takeWhile(_ < nc) ++ Iterator(nc)).toSeq
      probeLadder.map { np =>
        val per = queries.map { case (qid, qv) =>
          val probes = probeCells(idx, qv, np).toSet
          val got = vecs.filter { case (id, _) =>
            id != qid && probes.contains(cellOf(id))
          }.map { case (id, v) =>
            (roundHalfUp(cosineScalar(v, qv), 6), id)
          }.sortBy { case (s, id) => (-s, id) }.take(k).map(_._2).toSet
          val scanned = probes.iterator.map(c => cellSize.getOrElse(c, 0L)).sum
          ((exactByQ(qid) intersect got).size.toDouble / k,
            scanned.toDouble / vecs.length)
        }
        TunePoint(nc, np,
          recall = per.map(_._1).sum / per.length,
          scanFrac = per.map(_._2).sum / per.length)
      }
    }
    val best = curve.filter(_.recall >= targetRecall)
      .sortBy(p => (p.scanFrac, p.nCells, p.nProbe)).headOption
    TuneResult(best, curve)
  }

  /** Double cosine, left-to-right accumulation over float inputs — the exact
    * arithmetic of the codegen [[graft.functions.CosineSimilarity]] and of
    * DuckDB's list_cosine_similarity over CAST(... AS DOUBLE[]). 0.0 on
    * zero-norm inputs (the expression's contract).
    */
  private[graft] def cosineScalar(a: Array[Float], b: Array[Float]): Double = {
    val n = math.min(a.length, b.length)
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      val x = a(i).toDouble; val y = b(i).toDouble
      dot += x * y; na += x * x; nb += y * y
      i += 1
    }
    if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Spark `round(col, s)` semantics (BigDecimal HALF_UP over the double's
    * shortest decimal repr) for driver-side score math.
    */
  private[graft] def roundHalfUp(x: Double, scale: Int): Double =
    BigDecimal(java.math.BigDecimal.valueOf(x))
      .setScale(scale, BigDecimal.RoundingMode.HALF_UP)
      .toDouble
}

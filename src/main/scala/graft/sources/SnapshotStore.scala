package graft.sources

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Snapshot-versioned warehouse reads (VERDICT r7 task 5): a tiny
  * manifest-pointer protocol over plain parquet that gives readers
  * isolation from in-flight compaction plus crude time travel — the two
  * properties [[Warehouse]]'s rename swap cannot provide (its readers may
  * catch the partition mid-swap, and old data is gone the moment the swap
  * completes). The design is the public snapshot-table idea (Iceberg-style
  * version pointers) shrunk to the minimum that plain files support:
  *
  * {{{
  *   root/
  *     _manifests/v00000001.manifest   one committed version per file:
  *     _manifests/v00000002.manifest   the list of live data dirs
  *     data/s1-<token>/ ...parquet     immutable once written, never
  *     data/s2-<token>/ ...parquet     mutated — only ADDED and (much
  *                                     later) garbage-collected
  * }}}
  *
  * Rules:
  *   - data dirs are IMMUTABLE: every commit writes a brand-new dir and
  *     publishes a new manifest naming the dirs that make up the snapshot
  *     (append = previous list + new dir; compact = the rewritten dir
  *     alone). Nothing a committed manifest references is ever rewritten.
  *   - a manifest commit is `create(path, overwrite = false)` of
  *     `v<N+1>.manifest`: two writers racing from the same base version
  *     collide on the same file name and the loser FAILS LOUDLY
  *     (optimistic concurrency — re-read and retry). Plain-parquet
  *     honesty: local/HDFS create-no-overwrite is the strongest primitive
  *     available; object stores want a conditional PUT here.
  *   - readers resolve the highest committed manifest ONCE at open and
  *     read only dirs it names — a compaction committing v+1 mid-read
  *     changes nothing the reader references, because the old dirs stay
  *     on disk until [[expireSnapshots]] garbage-collects versions older
  *     than the retention set. Time travel = resolving an explicit
  *     version that is still retained.
  */
object SnapshotStore {

  private val ManifestDir = "_manifests"
  private val DataDir = "data"
  private val TagsDir = "_tags"

  /** THE commit-column name every tombstone-carrying store reads with —
    * one shared constant (round-10 ADVICE: `IndexMaintenance.planGraph`
    * and `GraphAnn.readGraphStoreLatest` each spelled the literal, so a
    * rename would silently desynchronize the fold from the waste probe).
    * The column itself is synthesized by [[read]]'s `commitCol` option;
    * nothing with this name is ever stored in data files.
    */
  private[graft] val CommitCol = "__commit"

  /** Manifest entries are root-relative paths that are either a whole data
    * dir (`data/sN-tok`) or — since the partition-level replace commit
    * ([[replacePartitions]]) — a hive partition SUBTREE inside one, possibly
    * nested (`data/sN-tok/col=value`, `data/sN-tok/cell=3/org=7`). This maps
    * any entry back to its data dir, the unit of immutability and garbage
    * collection.
    */
  private def dataDirOf(entry: String): String =
    entry.split('/').take(2).mkString("/")

  /** The commit version a data dir (or leaf ref inside it) was written at,
    * parsed from the protocol's own `s<N>-` prefix.
    */
  private[graft] def entryVersion(entry: String): Option[Int] = {
    val name = entry.split('/').lift(1).getOrElse("")
    if (name.startsWith("s")) name.drop(1).takeWhile(_ != '-').toIntOption
    else None
  }

  private def fsOf(spark: SparkSession, root: String): FileSystem =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestPath(root: String, v: Int): Path =
    new Path(new Path(root, ManifestDir), f"v$v%08d.manifest")

  private def versionOf(p: Path): Option[Int] = {
    val n = p.getName
    if (n.startsWith("v") && n.endsWith(".manifest"))
      n.stripPrefix("v").stripSuffix(".manifest").toIntOption
    else None
  }

  /** All committed versions, ascending; empty for a fresh root. */
  def versions(spark: SparkSession, root: String): Seq[Int] = {
    val fs = fsOf(spark, root)
    val dir = new Path(root, ManifestDir)
    if (!fs.exists(dir)) Seq.empty
    else fs.listStatus(dir).toSeq.flatMap(s => versionOf(s.getPath)).sorted
  }

  /** Highest committed version, or None for a fresh root. */
  def currentVersion(spark: SparkSession, root: String): Option[Int] =
    versions(spark, root).lastOption

  /** The data dirs a committed version names (relative to root). */
  private def readManifest(fs: FileSystem, root: String, v: Int): Seq[String] = {
    val in = fs.open(manifestPath(root, v))
    val text =
      try new String(in.readAllBytes(), java.nio.charset.StandardCharsets.UTF_8)
      finally in.close()
    text.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** Publish `dirs` as version `v` — create-no-overwrite, so a racing
    * writer targeting the same version fails loudly instead of clobbering.
    */
  private def commitManifest(
      fs: FileSystem, root: String, v: Int, dirs: Seq[String]): Unit = {
    val dir = new Path(root, ManifestDir)
    if (!fs.exists(dir)) fs.mkdirs(dir)
    val out =
      try fs.create(manifestPath(root, v), false)
      catch { case e: java.io.IOException =>
        throw new java.io.IOException(
          s"concurrent writer already committed v$v of $root — " +
            "re-read the current version and retry", e)
      }
    try out.write(
      (dirs.mkString("\n") + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Append `df` as a new snapshot: one new immutable data dir + a manifest
    * listing the previous snapshot's dirs plus the new one. Returns the
    * committed version. Fails loudly if another writer commits the same
    * next version first (nothing is lost — the orphaned data dir is
    * unreferenced and [[expireSnapshots]] sweeps it).
    *
    * `expectedBase` is the optimistic-concurrency handle: pass the version
    * this write was planned against (e.g. the one a validation read used)
    * and the commit targets exactly expectedBase+1 — if anyone committed
    * in between, the create-no-overwrite collides and this call throws
    * instead of silently rebasing onto data it never saw. The default
    * (None) rebases onto whatever is current at call time, which is fine
    * for blind appends.
    */
  def append(spark: SparkSession, root: String, df: DataFrame,
      expectedBase: Option[Int] = None,
      partitionBy: Seq[String] = Seq.empty,
      dirTag: Option[String] = None): Int = {
    dirTag.foreach(t => require(t.nonEmpty && t.forall(c =>
      c.isLetterOrDigit || c == '_'), s"dirTag must be [A-Za-z0-9_]+, got '$t'"))
    val fs = fsOf(spark, root)
    val base = expectedBase.orElse(currentVersion(spark, root)).filter(_ > 0)
    val prevDirs = base.map(v => readManifest(fs, root, v)).getOrElse(Seq.empty)
    val next = base.getOrElse(0) + 1
    // the optional tag rides INSIDE the dir name so an idempotence check
    // can ask "was this logical append already committed?" by scanning
    // the current manifest (committedDirs) — the streaming-upsert replay
    // guard ([[graft.streaming.StreamingVectorIndex]])
    val tag = dirTag.fold("")(t => s"$t-")
    val newDir = s"$DataDir/s$next-$tag${java.util.UUID.randomUUID().toString.take(8)}"
    writeDataDir(df, new Path(root, newDir), partitionBy)
    commitManifest(fs, root, next, prevDirs :+ newDir)
    dirTag.foreach(recordTag(fs, root, _))
    next
  }

  /** Durably record a committed dir tag in the `_tags` sidecar — NOT
    * subject to [[expireSnapshots]], so a replay guard keyed on tags
    * (the [[graft.streaming.StreamingVectorIndex]] exactly-once contract)
    * survives manifest retirement inside the checkpoint replay horizon.
    * Written AFTER the manifest commit: a crash in between narrows the
    * guard back to the retained-manifest scan for that one tag.
    */
  private def recordTag(fs: FileSystem, root: String, tag: String): Unit = {
    val dir = new Path(root, TagsDir)
    if (!fs.exists(dir)) fs.mkdirs(dir)
    val p = new Path(dir, tag)
    try fs.create(p, false).close()
    catch { case _: java.io.IOException => () } // already recorded — idempotent
  }

  /** Every dir tag durably recorded by a committed append — the durable
    * half of the replay-guard surface (see [[allCommittedDirs]] for the
    * manifest-scan half).
    */
  def committedTags(spark: SparkSession, root: String): Set[String] = {
    val fs = fsOf(spark, root)
    val dir = new Path(root, TagsDir)
    if (!fs.exists(dir)) Set.empty
    else fs.listStatus(dir).toSeq.map(_.getPath.getName).toSet
  }

  /** The data dirs (root-relative) the given — default current — committed
    * version references. Empty for a fresh root.
    */
  def committedDirs(
      spark: SparkSession, root: String, version: Option[Int] = None): Seq[String] = {
    val v = version.orElse(currentVersion(spark, root))
    v.map(readManifest(fsOf(spark, root), root, _)).getOrElse(Seq.empty)
  }

  /** The distinct data dirs referenced by ANY retained manifest — the
    * idempotence surface for tag-based replay guards: an `overwrite`
    * (rebuild) rewrites the CURRENT manifest to one new dir, but the
    * tagged delta dirs stay visible here as long as their manifests are
    * retained. Callers gating replays on a tag must size
    * [[expireSnapshots]]'s `keepLast` to cover their replay horizon.
    */
  def allCommittedDirs(spark: SparkSession, root: String): Seq[String] = {
    val fs = fsOf(spark, root)
    versions(spark, root).flatMap(v => readManifest(fs, root, v)).distinct
  }

  /** Replace the snapshot's CONTENT in one commit: a new data dir holding
    * exactly `df`, published as a manifest that references only it — the
    * versioned twin of an overwrite write (and the primitive a changelog
    * fold publishes through, [[graft.streaming.StreamingMerge]]). Readers
    * of prior versions are untouched; same loud-failure contract as
    * [[append]] on a concurrent commit. Works on a fresh root (version 1).
    */
  def overwrite(spark: SparkSession, root: String, df: DataFrame,
      expectedBase: Option[Int] = None,
      partitionBy: Seq[String] = Seq.empty): Int = {
    val fs = fsOf(spark, root)
    val base = expectedBase.orElse(currentVersion(spark, root)).filter(_ > 0)
    val next = base.getOrElse(0) + 1
    val newDir = s"$DataDir/s$next-${java.util.UUID.randomUUID().toString.take(8)}"
    writeDataDir(df, new Path(root, newDir), partitionBy)
    commitManifest(fs, root, next, Seq(newDir))
    next
  }

  /** Replace ONLY the hive partitions of `partitionCol` that `df` carries,
    * in one commit — the delta-sized alternative to [[overwrite]] for
    * partition-local rewrites (VERDICT r9 task 1: the graph-ANN append
    * rewrites touched `src_bucket` partitions; untouched partitions' files
    * are never rewritten, only re-referenced). Mechanics:
    *
    *   - `df` is written as one new data dir partitioned by `partitionCol`
    *     plus `extraPartitionCols` (immutable, like every commit);
    *   - the new manifest references that dir PLUS, for every previous
    *     entry, only the partition subtrees the new dir does NOT carry —
    *     so a replaced partition's old rows drop out of the snapshot while
    *     their files stay on disk for pinned readers until
    *     [[expireSnapshots]].
    *
    * '''Nested layouts''' (VERDICT r10 task 1): `extraPartitionCols` adds
    * secondary partition dimensions UNDER `partitionCol` — e.g. a tenant
    * store laid out `cell=3/organization_id=7`. The replace unit is the
    * prefix of the partition chain named by `replaceLevels` (default 1 =
    * whole `cell=` subtrees, every tenant leaf under a touched cell
    * replaced together; `replaceLevels = 2` replaces individual
    * `cell=/org=` leaves while sibling tenants inside the same cell are
    * carried as DEEPER leaf refs). Untouched subtrees survive at their
    * shallowest possible ref — a previous entry none of whose leaves were
    * touched is carried verbatim, one that was partially touched is split
    * into refs for exactly its untouched children.
    *
    * Previous entries that are not hive-partitioned by `partitionCol`
    * (e.g. the zero-row non-partitioned guard dir) are carried whole —
    * they hold no rows of any replaced partition by construction. Same
    * optimistic-concurrency contract as [[append]]; requires an existing
    * snapshot (a first write is an [[overwrite]]).
    *
    * `dropPartitions` names replace units (`"col=value"` paths of depth
    * `replaceLevels`, e.g. `"cell=3"` or `"cell=3/org=7"`) to remove from
    * the new manifest even though `df` carries no rows for them — the
    * rewrite-to-empty case (a hive write cannot emit an empty partition
    * dir, so a partition whose rewrite produced zero rows would otherwise
    * silently keep its OLD rows). [[graft.operators.IvfIndex.refreshCells]]
    * passes the refreshed cells that ended up empty after reassignment.
    */
  def replacePartitions(spark: SparkSession, root: String, df: DataFrame,
      partitionCol: String, expectedBase: Option[Int] = None,
      dirTag: Option[String] = None,
      dropPartitions: Set[String] = Set.empty,
      extraPartitionCols: Seq[String] = Seq.empty,
      replaceLevels: Int = 1): Int = {
    val partitionCols = partitionCol +: extraPartitionCols
    require(replaceLevels >= 1 && replaceLevels <= partitionCols.length,
      s"replaceLevels must be in [1, ${partitionCols.length}], got $replaceLevels")
    val levelCols = partitionCols.take(replaceLevels)
    val unitShape = levelCols.map(_ + "=<value>").mkString("/")
    dropPartitions.foreach { d =>
      val ps = d.split('/')
      require(ps.length == replaceLevels &&
        ps.zip(levelCols).forall { case (p, c) => p.startsWith(s"$c=") },
        s"dropPartitions entries must be '$unitShape' paths, got '$d'")
    }
    dirTag.foreach(t => require(t.nonEmpty && t.forall(c =>
      c.isLetterOrDigit || c == '_'), s"dirTag must be [A-Za-z0-9_]+, got '$t'"))
    val fs = fsOf(spark, root)
    val base = expectedBase.orElse(currentVersion(spark, root)).getOrElse(
      throw new IllegalStateException(
        s"replacePartitions needs an existing snapshot at $root — " +
          "first write is an overwrite"))
    val prev = readManifest(fs, root, base)
    val next = base + 1
    val tag = dirTag.fold("")(t => s"$t-")
    val newDir = s"$DataDir/s$next-$tag${java.util.UUID.randomUUID().toString.take(8)}"
    val newDirPath = new Path(root, newDir)
    writeDataDir(df, newDirPath, partitionCols)
    // list the `col=` children of a dir for one partition level
    def children(p: Path, c: String): Seq[String] =
      fs.listStatus(p).toSeq.collect {
        case s if s.isDirectory && s.getPath.getName.startsWith(s"$c=") =>
          s.getPath.getName
      }
    // the replaced unit set, read back from what was ACTUALLY written
    // (exact hive dir-name formatting, no value-to-string guesswork):
    // relative `col=value[/col=value…]` paths of depth replaceLevels
    def unitsUnder(p: Path, cols: Seq[String]): Seq[String] = cols match {
      case Seq() => Seq("")
      case c +: rest => children(p, c).flatMap { name =>
        unitsUnder(new Path(p, name), rest)
          .map(sub => if (sub.isEmpty) name else s"$name/$sub")
      }
    }
    val touched = unitsUnder(newDirPath, levelCols).toSet ++ dropPartitions
    // survivors: walk each previous entry only as deep as needed. An
    // entry at or below replace depth survives unless its depth-L prefix
    // was touched; a shallower entry splits into child refs ONLY when a
    // touched unit actually lives under it (collapse keeps untouched
    // entries verbatim, so repeated replaces don't fragment manifests).
    def survivorsOf(entry: String, rel: Vector[String]): Seq[String] = {
      if (rel.length >= replaceLevels) {
        if (touched.contains(rel.take(replaceLevels).mkString("/"))) Seq.empty
        else Seq(entry)
      } else {
        val kids = children(new Path(root, entry), levelCols(rel.length))
        if (kids.isEmpty) Seq(entry) // non-partitioned (zero-row guard) dir
        else {
          val kept = kids.flatMap(k => survivorsOf(s"$entry/$k", rel :+ k))
          // nothing under this entry was touched → carry it whole
          if (kept == kids.map(k => s"$entry/$k")) Seq(entry) else kept
        }
      }
    }
    val survivors = prev.flatMap { entry =>
      survivorsOf(entry, entry.split('/').drop(2).toVector)
    }
    commitManifest(fs, root, next, survivors :+ newDir)
    dirTag.foreach(recordTag(fs, root, _))
    next
  }

  /** Memo for [[mayContainPartition]]: a committed version's entry set is
    * immutable, so the probe's answer is too. Keyed (root, version,
    * col=value); cleared wholesale past a sanity bound rather than LRU'd —
    * entries are a few dozen bytes and real sessions touch few stores.
    */
  private val partitionProbeMemo =
    new java.util.concurrent.ConcurrentHashMap[(String, Int, Long, String), java.lang.Boolean]()

  /** Could the given committed version reference ANY rows under
    * `col=value`? Answered from the manifest entries' own paths plus (for
    * whole-dir refs) one driver-side directory listing per entry — '''no
    * Spark job''' (round-11 ADVICE: the tombstone folds' size-guarded
    * broadcast probe ran an eager `count()` on every read even when the
    * store had never seen a delete; this probe short-circuits that to a
    * listing, memoized per immutable (root, version)).
    *
    * Exactness: partition dirs ARE the layout, so a partitioned dir
    * answers exactly. A dir with no `col=` children at the probed level is
    * either the zero-row empty-append guard or a pre-partitioning write —
    * indistinguishable by listing, so it conservatively answers TRUE
    * (fold runs, correctness unharmed). Callers use this only to SKIP
    * work when the answer is provably no.
    */
  def mayContainPartition(
      spark: SparkSession, root: String, partitionCol: String, value: String,
      version: Option[Int] = None): Boolean = {
    version.orElse(currentVersion(spark, root)) match {
      case None => false
      case Some(v) =>
        val fs = fsOf(spark, root)
        // the manifest's mtime disambiguates a deleted-and-recreated root
        // that reuses version numbers — same (root, v), different content
        val mtime =
          try Some(fs.getFileStatus(manifestPath(root, v)).getModificationTime)
          catch { case _: java.io.IOException => None }
        mtime match {
          case None => false
          case Some(mt) =>
            val target = s"$partitionCol=$value"
            val key = (root, v, mt, target)
            val cached = partitionProbeMemo.get(key)
            if (cached != null) cached.booleanValue()
            else {
              // walk down one dir: does `target` exist among (possibly
              // deeper) partition children? Recursion only happens when the
              // probed column sits BELOW another partition level — the
              // tombstone parking lots are level 1: a single listing.
              def probeDir(p: Path): Boolean =
                fs.exists(p) && {
                  val partDirs = fs.listStatus(p).toSeq
                    .filter(s => s.isDirectory && s.getPath.getName.contains('='))
                    .map(_.getPath)
                  if (partDirs.isEmpty) true // non-partitioned guard/legacy dir
                  else if (partDirs.exists(_.getName.startsWith(s"$partitionCol=")))
                    partDirs.exists(_.getName == target)
                  else partDirs.exists(probeDir)
                }
              val answer = committedDirs(spark, root, Some(v)).exists { e =>
                e.split('/').drop(2).find(_.startsWith(s"$partitionCol=")) match {
                  case Some(seg) => seg == target // leaf ref pins the value
                  case None => probeDir(new Path(root, e))
                }
              }
              if (partitionProbeMemo.size > 100000) partitionProbeMemo.clear()
              partitionProbeMemo.put(key, answer)
              answer
            }
        }
    }
  }

  /** The store's partition-column chain, derived from the CURRENT
    * snapshot's own directory structure (the store records no layout
    * metadata — the dirs ARE the metadata): the deepest `col=` chain any
    * referenced entry exhibits. Tombstone-only dirs are partitioned
    * shallower than data dirs by design (the `cell = -1` parking lot needs
    * no tenant level), so the DEEPEST chain is the data layout. Empty for
    * an unpartitioned or empty store.
    *
    * This is the guard the repair family checks `extraPartitionCols`
    * against (round-10 ADVICE: a refresh that silently demotes a partition
    * dimension to a data column costs every later per-tenant search its
    * directory pruning — fail loudly instead).
    */
  private[graft] def partitionLayout(
      spark: SparkSession, root: String): Seq[String] = {
    val fs = fsOf(spark, root)
    def chainBelow(p: Path): Seq[String] = {
      val sub = fs.listStatus(p).toSeq.find(s =>
        s.isDirectory && s.getPath.getName.contains('='))
      sub match {
        case Some(s) =>
          s.getPath.getName.takeWhile(_ != '=') +: chainBelow(s.getPath)
        case None => Seq.empty
      }
    }
    committedDirs(spark, root).map { e =>
      val refCols = e.split('/').drop(2).toSeq.map(_.takeWhile(_ != '='))
      val entryPath = new Path(root, e)
      refCols ++ (if (fs.exists(entryPath)) chainBelow(entryPath) else Seq.empty)
    }.maxByOption(_.length).getOrElse(Seq.empty)
  }

  /** One immutable data dir, hive-partitioned when `partitionBy` is set so
    * partition-column predicates prune directories inside every snapshot.
    *
    * Empty-input guard: a PARTITIONED write of zero rows emits no parquet
    * files at all (only _SUCCESS), and a file-less dir poisons every later
    * [[read]] ("unable to infer schema") — an empty append would brick the
    * store. Zero-row frames therefore write non-partitioned: the single
    * empty file carries the full schema (partition columns as ordinary
    * columns), reads back as zero rows, and unions cleanly.
    */
  private def writeDataDir(
      df: DataFrame, dir: Path, partitionBy: Seq[String]): Unit = {
    val parts = if (partitionBy.nonEmpty && df.isEmpty) Seq.empty else partitionBy
    val w = df.write.mode("errorifexists")
    (if (parts.nonEmpty) w.partitionBy(parts: _*) else w)
      .parquet(dir.toString)
  }

  /** Rewrite the CURRENT snapshot into ≈`nFiles` compacted files as a new
    * snapshot that references only the rewritten dir. The old snapshot's
    * dirs are untouched — readers that resolved before this commit keep
    * reading them, and explicit-version reads keep working until
    * [[expireSnapshots]]. Same loud-failure contract as [[append]] on a
    * concurrent commit.
    *
    * NOT for tombstone-carrying stores: this preserves rows as-is, which
    * collapses every row onto ONE commit version — a `commitCol` read can
    * then no longer order tombstones against the rows they killed
    * (resurrection). Stores using id-level upsert/delete must compact via
    * their folding twin (`IvfIndex.compactStore`), which resolves
    * tombstones BEFORE the rewrite.
    */
  def compact(spark: SparkSession, root: String, nFiles: Int = 1,
      partitionBy: Seq[String] = Seq.empty): Int = {
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    val fs = fsOf(spark, root)
    val base = currentVersion(spark, root).getOrElse(
      throw new IllegalStateException(s"nothing to compact at $root"))
    val next = base + 1
    val newDir = s"$DataDir/s$next-${java.util.UUID.randomUUID().toString.take(8)}"
    val compacted = read(spark, root, Some(base)) match {
      // fan each hive leaf across ≈nFiles writer tasks: shuffling on the
      // partition columns ALONE would funnel every leaf through a single
      // task (one file per leaf, nFiles dead, and the whole-table
      // single-task scale-killer at nFiles=1) — so add a CONTENT-DERIVED
      // salt, pmod(hash(all columns), nFiles). A row-position salt would
      // be a nondeterministic shuffle key (silent row loss/dup on
      // fetch-failure recompute — the SkewJoin lesson); the content hash
      // is recompute-stable.
      case df if partitionBy.nonEmpty =>
        import org.apache.spark.sql.functions.{col, hash, lit, pmod}
        val salt = pmod(hash(df.columns.map(col).toIndexedSeq: _*), lit(nFiles))
        // EXPLICIT partition count: an unsized repartition(cols…) is an
        // AQE coalescing target — tiny leaves get merged back into one
        // task and the fanout silently collapses to 1 file per leaf
        val numLeaves = math.max(1L,
          df.select(partitionBy.map(col): _*).distinct().count())
        val numParts = math.min(numLeaves * nFiles, 100000L).toInt
        df.repartition(numParts, partitionBy.map(col) :+ salt: _*)
      case df => df.repartition(nFiles)
    }
    writeDataDir(compacted, new Path(root, newDir), partitionBy)
    commitManifest(fs, root, next, Seq(newDir))
    next
  }

  /** Open a snapshot: the given version, or the highest committed one.
    * Resolution happens HERE, once — the returned DataFrame reads exactly
    * the resolved dirs regardless of later commits.
    *
    * `commitCol`: when set, every row gains an INT column holding the
    * version its data dir was committed at (parsed from the protocol's own
    * `s<N>-` dir prefix — zero write-side cost). This is the ordering
    * handle for latest-wins folds and tombstone semantics
    * ([[graft.operators.IvfIndex]] id-level upsert/delete): "newer commit
    * beats older" without any version column in the stored data.
    *
    * `absentDefaults`: per-dir columns to synthesize when a dir predates a
    * schema addition (e.g. an `__op` marker added by the upsert path) —
    * the union stays loud on true mismatches while tolerating the documented
    * forward-compatible additions.
    */
  def read(spark: SparkSession, root: String, version: Option[Int] = None,
      commitCol: Option[String] = None,
      absentDefaults: Seq[(String, org.apache.spark.sql.Column)] = Seq.empty): DataFrame = {
    val fs = fsOf(spark, root)
    val v = version.orElse(currentVersion(spark, root)).getOrElse(
      throw new IllegalStateException(s"no committed snapshot at $root"))
    require(fs.exists(manifestPath(root, v)),
      s"version $v of $root does not exist or was expired")
    val entries = readManifest(fs, root, v)
    // group entries by data dir, preserving first-appearance order: whole
    // dirs read as their own hive root; partition-leaf refs (from
    // replacePartitions) read with basePath = the data dir, which keeps
    // the partition column while listing ONLY the referenced leaves
    val grouped = scala.collection.mutable.LinkedHashMap.empty[String, Vector[String]]
    entries.foreach { e =>
      val d = dataDirOf(e)
      grouped(d) = grouped.getOrElse(d, Vector.empty) :+ e
    }
    // one scan per data dir, unioned — NOT a multi-path load: each dir is
    // its own hive-partitioned root (data/sN-x/organization_id=y/...), and
    // a multi-path read would refuse the "conflicting" structures. Filters
    // push through the Union into every child scan, so partition-column
    // predicates still prune directories per snapshot dir; a column-SET
    // mismatch between dirs fails loudly in unionByName.
    val dfs = grouped.toSeq.map { case (dirRel, es) =>
      val dirAbs = new Path(root, dirRel).toString
      val base =
        if (es.contains(dirRel)) spark.read.parquet(dirAbs)
        else spark.read.option("basePath", dirAbs)
          .parquet(es.map(e => new Path(root, e).toString): _*)
      val stamped = commitCol.fold(base)(c => base.withColumn(c,
        org.apache.spark.sql.functions.lit(entryVersion(dirRel).getOrElse(0))))
      absentDefaults.foldLeft(stamped) { case (d, (name, expr)) =>
        if (d.columns.contains(name)) d else d.withColumn(name, expr)
      }
    }
    // partition-column TYPES are inferred per dir, so one delta whose
    // values happen to look numeric infers INT while its siblings infer
    // STRING — a same-table union must not fail (or silently coerce
    // '0123' -> 123) on that artifact. Only on an actual conflict, cast
    // the column to STRING in every dir: no behavior change for stores
    // whose dirs agree.
    val conflicted = dfs.flatMap(_.schema.fields).groupBy(_.name).collect {
      case (name, fields) if fields.map(_.dataType).distinct.size > 1 => name
    }.toSet
    val normalized =
      if (conflicted.isEmpty) dfs
      else dfs.map(df => conflicted.foldLeft(df) { (d, c) =>
        if (d.columns.contains(c))
          d.withColumn(c, org.apache.spark.sql.functions.col(c).cast("string"))
        else d
      })
    normalized.reduce(_.unionByName(_))
  }

  /** Undo the NEWEST commit: delete version `v`'s manifest and the data
    * dirs only it introduced (the `s<v>-` prefix), restoring the previous
    * version as current. Refuses unless `v` IS the current version —
    * history rollback is not what this is for. Single-writer operation
    * (the caller owns the store for the duration, e.g. a benchmark
    * measuring a repair steady-state by discarding its own commit, or an
    * operator backing out a just-published bad commit before readers
    * resolve it); a reader that already resolved `v` loses it mid-read,
    * exactly like an aggressive [[expireSnapshots]].
    */
  private[graft] def discardVersion(
      spark: SparkSession, root: String, v: Int): Unit = {
    val cur = currentVersion(spark, root)
    require(cur.contains(v),
      s"discardVersion: $v is not the current version of $root (current $cur)")
    val fs = fsOf(spark, root)
    fs.delete(manifestPath(root, v), false)
    val dataRoot = new Path(root, DataDir)
    if (fs.exists(dataRoot))
      fs.listStatus(dataRoot).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.startsWith(s"s$v-"))
        .foreach(s => fs.delete(s.getPath, true))
    ()
  }

  /** Retire history: keep the newest `keepLast` manifests, delete older
    * ones, then delete every data dir no RETAINED manifest references.
    * Run it after a grace period covering the longest reader, like any
    * snapshot-table maintenance. Returns (manifestsDeleted, dataDirsDeleted).
    *
    * Writer safety (round-9 ADVICE): [[append]]/[[compact]] write their
    * data dir BEFORE committing the manifest, so an in-flight writer's dir
    * is unreferenced while its parquet write runs. The sweep therefore
    * only deletes unreferenced dirs whose `s<N>-` version prefix is at or
    * below the newest RETAINED version: an in-flight writer's dir carries
    * N = current + 1 (above every retained version → never swept), while a
    * lost-race orphan's N equals a version someone else committed (at or
    * below current → swept). Dirs with an unparseable name are left alone
    * — deleting only what this protocol provably wrote is the
    * fails-loudly-never-corrupts contract.
    */
  def expireSnapshots(
      spark: SparkSession, root: String, keepLast: Int = 2): (Int, Int) = {
    require(keepLast >= 1, s"must keep at least one snapshot, got $keepLast")
    val fs = fsOf(spark, root)
    val all = versions(spark, root)
    val (drop, keep) = all.splitAt(math.max(0, all.size - keepLast))
    // normalize leaf refs (replacePartitions manifests) to their data dir:
    // a dir stays as long as ANY retained manifest references any of its
    // partitions — GC granularity is the whole immutable dir
    val referenced = keep.flatMap(v => readManifest(fs, root, v))
      .map(dataDirOf).toSet
    val newestRetained = keep.lastOption.getOrElse(0)
    drop.foreach(v => fs.delete(manifestPath(root, v), false))
    val dataRoot = new Path(root, DataDir)
    def dirVersion(name: String): Option[Int] =
      if (name.startsWith("s")) name.drop(1).takeWhile(_ != '-').toIntOption
      else None
    val doomed =
      if (!fs.exists(dataRoot)) Seq.empty
      else fs.listStatus(dataRoot).toSeq.filter { s =>
        s.isDirectory &&
          !referenced.contains(s"$DataDir/${s.getPath.getName}") &&
          dirVersion(s.getPath.getName).exists(_ <= newestRetained)
      }
    doomed.foreach(s => fs.delete(s.getPath, true))
    (drop.size, doomed.size)
  }
}

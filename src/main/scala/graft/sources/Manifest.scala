package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** File-level min/max data skipping — the pruning tier BELOW partition
  * pruning: a manifest of per-file column statistics lets a range query
  * read only the files whose [min, max] envelope intersects the
  * predicate, the Iceberg/Delta "data skipping" idea in plain parquet.
  *
  * Partition pruning prunes directories; parquet row-group stats prune
  * WITHIN a file but only after the task has been scheduled and the
  * footer read. At 100 TB the scan cost is dominated by file COUNT
  * (listing, footer reads, task scheduling — the compactOrganization
  * rationale), so skipping whole files from the MANIFEST, before any
  * task launches, is the lever that matters. Sorting by the stats
  * columns at write time ([[writeWithManifest]] range-partitions +
  * sorts) makes the envelopes disjoint, which is what makes skipping
  * effective — same reason Z-order exists for the multi-column case
  * (`functions.ZOrder`).
  *
  * The manifest lives in `path/_manifest` — an underscore directory,
  * invisible to Spark's file index, so plain `spark.read.parquet(path)`
  * readers are unaffected.
  */
object Manifest {

  final case class SkipReport(filesTotal: Int, filesRead: Int, stale: Boolean)

  private def manifestPath(path: String) = s"$path/_manifest"

  /** Write `df` range-partitioned into ≈`nFiles` files sorted by
    * `statsCols` (tight envelopes), then build the per-file min/max/count
    * manifest. The manifest is written AFTER the data: a crash between
    * the two leaves a fully readable table that merely full-scans.
    */
  def writeWithManifest(
      df: DataFrame, path: String, statsCols: Seq[String],
      nFiles: Int): Unit = {
    require(statsCols.nonEmpty, "need at least one stats column")
    require(nFiles > 0, s"nFiles must be positive, got $nFiles")
    for (c <- statsCols)
      require(df.columns.contains(c), s"column $c missing from input schema")
    df.repartitionByRange(nFiles, statsCols.map(col): _*)
      .sortWithinPartitions(statsCols.map(col): _*)
      .write.mode(SaveMode.Overwrite).parquet(path)
    refreshManifest(df.sparkSession, path, statsCols)
  }

  /** (Re)build the manifest for the CURRENT set of data files — call
    * after compaction or out-of-band writes.
    *
    * `bloomCols` adds a per-file Bloom image (`bloom_<col>`: the sorted
    * set-bit positions, ≤ bloomM ints per file) for EQUALITY skipping on
    * high-cardinality columns where a min/max envelope is useless unless
    * the layout is sorted by that very column — the Parquet-footer
    * bloom idea lifted to the manifest tier, so point-lookup files prune
    * BEFORE any task launches. Bits use the engine-wide splitmix64
    * bucket ([[graft.operators.CmSketch.bucket]], the BloomFilter
    * operator's layout): no false negatives ever, false positives just
    * read an extra file. Bloom columns cost one extra aggregation pass
    * over the data (the distinct (file, bit) set is bounded by
    * files × bloomM, never row count).
    */
  def refreshManifest(
      spark: SparkSession, path: String, statsCols: Seq[String],
      bloomCols: Seq[String] = Nil, bloomK: Int = 4,
      bloomM: Int = 4096): Unit = {
    val aggs = statsCols.flatMap(c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))) :+
      count(lit(1)).as("n_rows")
    val base = spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
    val withBlooms = bloomCols.foldLeft(base) { (acc, c) =>
      val sds = graft.operators.CmSketch.seeds(bloomK)
      val positions = udf((key: Long) =>
        sds.map(s => graft.operators.CmSketch.bucket(key, s, bloomM)))
      val blooms = spark.read.parquet(path)
        .select(input_file_name().as("file"), col(c).cast("long").as("__k"))
        .filter(col("__k").isNotNull)
        .select(col("file"), explode(positions(col("__k"))).as("__pos"))
        .distinct()
        .groupBy("file")
        .agg(sort_array(collect_list(col("__pos"))).as(s"bloom_$c"))
      acc.join(blooms, Seq("file"), "left")
    }
    withBlooms
      .coalesce(1)
      .write.mode(SaveMode.Overwrite).parquet(manifestPath(path))
  }

  private def listDataFiles(spark: SparkSession, path: String): Seq[String] = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p)
      .filter(s => !s.isDirectory && !s.getPath.getName.startsWith("_")
        && !s.getPath.getName.startsWith("."))
      .map(_.getPath.toUri.toString).toSeq
  }

  /** Read rows with `lo <= col <= hi`, scanning only the files whose
    * manifest envelope intersects the range. The predicate is STILL
    * applied to the surviving files — skipping is an optimization, never
    * the filter itself.
    *
    * Safety: if the manifest is missing, or its file list does not match
    * the directory's current data files (stale — e.g. compaction ran
    * without [[refreshManifest]]), every file is read (`stale = true` in
    * the report). A wrong skip is silent data loss; a useless manifest is
    * just a full scan. Files whose stats are null (all-null column) are
    * always kept.
    */
  def readSkipping(
      spark: SparkSession, path: String, rangeCol: String,
      lo: Any, hi: Any): (DataFrame, SkipReport) = {
    val pred = col(rangeCol) >= lit(lo) && col(rangeCol) <= lit(hi)
    val dataFiles = listDataFiles(spark, path)
    val mPath = new org.apache.hadoop.fs.Path(manifestPath(path))
    val fs = mPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(mPath))
      return (spark.read.parquet(path).filter(pred),
        SkipReport(dataFiles.length, dataFiles.length, stale = true))

    val manifest = spark.read.parquet(manifestPath(path))
      .select(col("file"), col(s"min_$rangeCol").as("mn"),
        col(s"max_$rangeCol").as("mx"))
      .collect()
    val manifestFiles = manifest.map(_.getString(0)).toSet
    // canonicalize both sides to bare names: input_file_name() URIs and
    // FileSystem listings can differ in scheme/authority spelling
    def name(f: String) = f.substring(f.lastIndexOf('/') + 1)
    if (manifestFiles.map(name) != dataFiles.map(name).toSet)
      return (spark.read.parquet(path).filter(pred),
        SkipReport(dataFiles.length, dataFiles.length, stale = true))

    // exact envelope comparison: numerics via BigDecimal (no double
    // rounding — a wrong skip is silent data loss), strings lexicographic
    def lt(a: Any, b: Any): Boolean = (a, b) match {
      case (x: java.lang.Number, y: java.lang.Number) =>
        new java.math.BigDecimal(x.toString)
          .compareTo(new java.math.BigDecimal(y.toString)) < 0
      case (x: String, y: String) => x < y
      case (x: java.sql.Timestamp, y: java.sql.Timestamp) => x.before(y)
      case (x: java.sql.Date, y: java.sql.Date) => x.before(y)
      case _ => throw new IllegalArgumentException(
        s"unsupported range-column type: ${a.getClass} vs ${b.getClass}")
    }
    val keep = manifest.filter { r =>
      val (mn, mx) = (r.get(1), r.get(2))
      mn == null || mx == null || !(lt(mx, lo) || lt(hi, mn))
    }.map(r => name(r.getString(0))).toSet
    val files = dataFiles.filter(f => keep.contains(name(f)))
    val df =
      if (files.isEmpty) spark.read.parquet(path).filter(pred).limit(0)
      else spark.read.parquet(files: _*).filter(pred)
    (df, SkipReport(dataFiles.length, files.length, stale = false))
  }

  /** Point-lookup skipping: read rows with `eqCol = key`, scanning only
    * the files whose manifest Bloom image (`bloom_<eqCol>`, built by
    * [[refreshManifest]] with `bloomCols`) contains ALL of the key's bit
    * positions. The same safety ladder as [[readSkipping]]: missing
    * manifest, missing bloom column, stale file list, or a null-stats
    * file ⇒ that file (or the whole scan) is read rather than skipped —
    * a wrong skip is silent data loss, a useless bloom is one extra
    * file. The equality predicate is still applied to survivors.
    *
    * `bloomK`/`bloomM` must match the refresh call — position layout is
    * part of the manifest contract (the StreamingDedup bucket=f(key)
    * lesson).
    */
  def readSkippingEquals(
      spark: SparkSession, path: String, eqCol: String, key: Long,
      bloomK: Int = 4, bloomM: Int = 4096): (DataFrame, SkipReport) = {
    val pred = col(eqCol) === lit(key)
    val dataFiles = listDataFiles(spark, path)
    val mPath = new org.apache.hadoop.fs.Path(manifestPath(path))
    val fs = mPath.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def fullScan(stale: Boolean) =
      (spark.read.parquet(path).filter(pred),
        SkipReport(dataFiles.length, dataFiles.length, stale))
    if (!fs.exists(mPath)) return fullScan(stale = true)

    val manifestDf = spark.read.parquet(manifestPath(path))
    if (!manifestDf.columns.contains(s"bloom_$eqCol"))
      return fullScan(stale = true)
    val manifest = manifestDf
      .select(col("file"), col(s"bloom_$eqCol").as("bloom"))
      .collect()
    def name(f: String) = f.substring(f.lastIndexOf('/') + 1)
    if (manifest.map(r => name(r.getString(0))).toSet !=
        dataFiles.map(name).toSet)
      return fullScan(stale = true)

    val sds = graft.operators.CmSketch.seeds(bloomK)
    val want = sds.map(s => graft.operators.CmSketch.bucket(key, s, bloomM))
    val keep = manifest.filter { r =>
      if (r.isNullAt(1)) true // no bloom recorded (all-null column): keep
      else {
        val bits = r.getAs[scala.collection.Seq[Int]](1).toSet
        want.forall(bits.contains)
      }
    }.map(r => name(r.getString(0))).toSet
    val files = dataFiles.filter(f => keep.contains(name(f)))
    val df =
      if (files.isEmpty) spark.read.parquet(path).filter(pred).limit(0)
      else spark.read.parquet(files: _*).filter(pred)
    (df, SkipReport(dataFiles.length, files.length, stale = false))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The persisted SKIP-RING ROSTER — round 12's answer to the graph tier's
  * one remaining scale gap (VERDICT r11 task 1): appended nodes used to
  * carry no long-range links, so sustained growth ended in a full
  * O(corpus-LSH-pairs) rebuild. Reference parity: Qdrant's HNSW maintains
  * its layer structure on EVERY upsert and never rebuilds corpus-wide
  * (/root/reference/internal/vectordb/vectordb.go:117-193).
  *
  * The public idea is the Chord finger table (Stoica et al., SIGCOMM '01)
  * fused with the build's own deterministic draw: every node owns a
  * 60-bit '''draw''' — the integer value of the first 15 hex digits of
  * md5(id), i.e. the build ring's ordering key coarsened to an integer —
  * and long links are '''fingers''': node x links to the roster's
  * CIRCULAR SUCCESSOR of `draw(x) + 2^(j·stride) · ⌊2^60 / n⌋` for each
  * level j with `2^(j·stride) < n`. In draw space that is the node
  * ≈`2^(j·stride)` ring positions ahead — the same exponential ladder the
  * build's positional ring lays down, but INSERTABLE: a new node computes
  * its fingers from the roster alone (log n bucket-pruned point lookups),
  * no renumbering, no rebuild.
  *
  * Storage: a [[graft.sources.SnapshotStore]] of (id, draw) partitioned by
  * `draw_bucket = draw >> (60 − log2(nBuckets))` — CONTIGUOUS draw ranges,
  * so a successor lookup partition-prunes to the target's bucket and its
  * right neighbor (the provably-sufficient window; see [[stitchFingers]]).
  * `nBuckets` must be a power of two and MUST match the store's build
  * value on every later call (the StreamingDedup store-constant rule:
  * bucket = f(draw) must agree with the dirs).
  *
  * Determinism: draw is a pure function of id; successor resolution is a
  * total order ((circular distance, id) argmin); so the stitched edge set
  * is replayable — the qkw driver query replays it in DuckDB exactly.
  */
object RingRoster {

  /** Draw-space modulus: draws live in [0, 2^60). */
  val P: Long = 1L << 60

  /** The 60-bit draw of an id — the build ring's (md5(id), id) ordering
    * key as an integer: first 15 hex digits of md5(cast(id as string)),
    * base 16. DuckDB twin: `CAST('0x' || substr(md5(...), 1, 15) AS
    * BIGINT)` (CLAUDE.md rule 12 — proven hex-parse parity).
    */
  def drawCol(id: Column): Column =
    conv(substring(md5(id.cast("string")), 1, 15), 16, 10).cast("long")

  private def log2(n: Int): Int = {
    require(n > 0 && (n & (n - 1)) == 0, s"nBuckets must be a power of 2, got $n")
    java.lang.Integer.numberOfTrailingZeros(n)
  }

  /** `draw_bucket` for a draw column: the top log2(nBuckets) bits — a
    * RANGE bucketing (contiguous draw intervals), unlike the id stores'
    * pmod hashing, because successor lookups need neighboring draws in
    * neighboring dirs.
    */
  def bucketCol(draw: Column, nBuckets: Int): Column =
    shiftright(draw, 60 - log2(nBuckets)).cast("int")

  private def rosterRows(ids: DataFrame, idCol: String, nBuckets: Int): DataFrame =
    ids.select(col(idCol).cast("long").as("id"))
      .withColumn("draw", drawCol(col("id")))
      .withColumn("draw_bucket", bucketCol(col("draw"), nBuckets))

  /** Create the roster for `corpus` — run it beside `writeGraphStore` at
    * (re)build time; it IS the `buildIds` the staleness probes measure
    * against from then on. Returns the committed version.
    */
  def write(
      spark: org.apache.spark.sql.SparkSession, root: String,
      corpus: DataFrame, idCol: String, nBuckets: Int = 64): Int =
    graft.sources.SnapshotStore.overwrite(spark, root,
      rosterRows(corpus, idCol, nBuckets).repartition(col("draw_bucket")),
      partitionBy = Seq("draw_bucket"))

  /** Append `newIds` as one delta commit — IDEMPOTENT by construction:
    * already-rostered ids are anti-joined out first (the anti-join scan
    * partition-prunes to the batch's own draw buckets, so the guard is
    * delta-sized), which is what makes streaming replays and re-ingested
    * ids safe without dir tags (a re-ingest keeps its draw: draw = f(id)).
    * Returns the committed version (None → nothing new to add).
    */
  def append(
      spark: org.apache.spark.sql.SparkSession, root: String,
      newIds: DataFrame, idCol: String, nBuckets: Int = 64,
      expectedBase: Option[Int] = None): Option[Int] = {
    val rows = rosterRows(newIds, idCol, nBuckets)
    val batchBuckets = rows.select(col("draw_bucket"))
      .distinct().collect().map(_.getInt(0)).toSeq // bounded: ≤ nBuckets
    val existing = read(spark, root)
      .where(col("draw_bucket").isin(batchBuckets: _*))
      .select(col("id"))
    val fresh = rows.join(existing, Seq("id"), "left_anti")
      .repartition(col("draw_bucket"))
      .localCheckpoint() // pinned: isEmpty probe + write must agree
    if (fresh.isEmpty) None
    else Some(graft.sources.SnapshotStore.append(spark, root, fresh,
      expectedBase, partitionBy = Seq("draw_bucket")))
  }

  /** [[append]] with driver-held ids (round 12 optimization — the
    * insert path already knows the batch's ids, so the append needs no
    * bucket collect, no anti-join checkpoint and no isEmpty probe): draws
    * and buckets are computed on the driver ([[drawOf]], exact parity
    * with the conv/md5 column), the already-rostered check is ONE
    * bucket-pruned point-lookup collect, and fresh rows enter as a
    * single-partition parallelize (≤ |ids| rows) so the partitioned
    * write emits one file per touched bucket. Returns the committed
    * version (None → nothing new).
    */
  private[graft] def appendIds(
      spark: org.apache.spark.sql.SparkSession, root: String,
      ids: Seq[Long], nBuckets: Int = 64,
      expectedBase: Option[Int] = None): Option[Int] = {
    val b = log2(nBuckets)
    val rows = ids.distinct.map(id => (id, drawOf(id)))
    val batchBuckets = rows.map(_._2 >> (60 - b)).map(_.toInt).distinct
    if (rows.isEmpty) return None
    val existing = read(spark, root)
      .where(col("draw_bucket").isin(batchBuckets: _*))
      .where(col("id").isInCollection(rows.map(_._1)))
      .select(col("id")).collect().map(_.getLong(0)).toSet
    val fresh = rows.filterNot { case (id, _) => existing.contains(id) }
    if (fresh.isEmpty) None
    else {
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("id",
          org.apache.spark.sql.types.LongType, nullable = true),
        org.apache.spark.sql.types.StructField("draw",
          org.apache.spark.sql.types.LongType, nullable = true),
        org.apache.spark.sql.types.StructField("draw_bucket",
          org.apache.spark.sql.types.IntegerType, nullable = true)))
      val df = spark.createDataFrame(
        spark.sparkContext.parallelize(fresh.map { case (id, d) =>
          org.apache.spark.sql.Row(id, d, (d >> (60 - b)).toInt)
        }, 1), schema)
      Some(graft.sources.SnapshotStore.append(spark, root, df,
        expectedBase, partitionBy = Seq("draw_bucket")))
    }
  }

  /** The driver twin of [[drawCol]]: first 15 hex digits of
    * md5(id.toString) parsed base 16 — 60 bits, never overflows a long.
    */
  private[graft] def drawOf(id: Long): Long =
    java.lang.Long.parseLong(
      graft.operators.GraphAnn.md5hexOf(id).substring(0, 15), 16)

  /** Open the roster: (id, draw, draw_bucket). */
  def read(
      spark: org.apache.spark.sql.SparkSession, root: String,
      version: Option[Int] = None): DataFrame =
    graft.sources.SnapshotStore.read(spark, root, version)

  /** Rewrite the roster to exactly the ids of `liveIds` — hygiene after
    * bulk deletes/purges (a dangling roster entry is HARMLESS — a finger
    * to a tombstoned node folds out of the live graph view / scores
    * nothing, it is just dead weight — so this is maintenance, not
    * correctness). Returns the committed version.
    */
  def compactTo(
      spark: org.apache.spark.sql.SparkSession, root: String,
      liveIds: DataFrame, idCol: String, nBuckets: Int = 64): Int = {
    val base = graft.sources.SnapshotStore.currentVersion(spark, root)
    val kept = read(spark, root, base)
      .join(liveIds.select(col(idCol).cast("long").as("id")), Seq("id"),
        "left_semi")
      .repartition(col("draw_bucket"))
    graft.sources.SnapshotStore.overwrite(spark, root, kept, base,
      partitionBy = Seq("draw_bucket"))
  }

  /** The FINGER edges for `newIds` against the roster at `version`
    * (default current), EXCLUDING the batch's own ids from the candidate
    * roster — which makes the result identical whether or not the batch
    * was already appended to the roster (the streaming replay-stability
    * contract, same shape as the corpus anti-join in
    * [[graft.streaming.StreamingGraphIndex.processBatch]]).
    *
    * Semantics (total, deterministic, DuckDB-replayable): for each new id
    * x and level j with `off = 2^(j·ringStride) < n` (n = candidate
    * roster size),
    *
    *   target  t = (draw(x) + off · (2^60 div n)) mod 2^60
    *   finger(x, j) = argmin over roster rows r of
    *                  ((r.draw − t) mod 2^60, r.id)   — circular successor
    *
    * Execution is delta-sized: the successor scan partition-prunes to the
    * target's `draw_bucket` and its right neighbor — SUFFICIENT whenever a
    * roster draw lies in the circular arc [t, end of next bucket), which
    * the acceptance filter checks EXACTLY (candidate distance < arc
    * length); the rare targets whose two-bucket window is empty (sparse or
    * tiny rosters) fall back to one full-roster argmin restricted to just
    * those targets, so the semantics above hold unconditionally. Driver
    * images: the batch's target-bucket set (≤ 2 · batch · levels ints,
    * ≤ nBuckets after distinct) and one count.
    *
    * Returns one row per DISTINCT (src, dst) finger, forward direction
    * only — callers symmetrize as their commit scope allows
    * ([[GraphAnn.appendNodesToStore]] does; [[GraphAnn.repairRingRegion]]
    * stays forward-only so its commit touches only the repaired buckets).
    */
  def stitchFingers(
      spark: org.apache.spark.sql.SparkSession, root: String,
      newIds: DataFrame, idCol: String, ringStride: Int = 2,
      nBuckets: Int = 64, version: Option[Int] = None): DataFrame = {
    require(ringStride >= 1, s"ringStride must be >= 1, got $ringStride")
    val b = log2(nBuckets)
    val w = P >> b // bucket width in draw space
    val batch = rosterRows(newIds, idCol, nBuckets)
      .select(col("id").as("src"), col("draw").as("__sd"))
    val roster = read(spark, root, version)
      .join(batch.select(col("src").as("id")), Seq("id"), "left_anti")
    val n = roster.count()
    val empty = batch.sparkSession.createDataFrame(
      batch.sparkSession.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("src",
          org.apache.spark.sql.types.LongType, nullable = true),
        org.apache.spark.sql.types.StructField("dst",
          org.apache.spark.sql.types.LongType, nullable = true))))
    if (n == 0) return empty
    val offsets = Iterator.iterate(1L)(_ << ringStride).takeWhile(_ < n).toSeq
    if (offsets.isEmpty) return empty
    val unit = P / n
    // pinned: targets feed the bucket collect, the pruned join, the
    // acceptance window and (rarely) the fallback — one materialization
    val targets = batch
      .withColumn("__off", explode(typedLit(offsets)))
      .withColumn("__t", pmod(col("__sd") + col("__off") * lit(unit), lit(P)))
      .withColumn("__bt", shiftright(col("__t"), 60 - b).cast("int"))
      .localCheckpoint()
    val probed = targets
      .withColumn("__cb", explode(array(col("__bt"),
        pmod(col("__bt") + 1, lit(nBuckets)).cast("int"))))
    val buckets = probed.select(col("__cb")).distinct()
      .collect().map(_.getInt(0)).toSeq // bounded ≤ nBuckets
    val slice = roster.where(col("draw_bucket").isin(buckets: _*))
      .select(col("id").as("__rid"), col("draw").as("__rd"),
        col("draw_bucket").as("__cb"))
    val distOf = pmod(col("__rd") - col("__t"), lit(P))
    // the acceptance arc: [t, start of bucket bt+2) — everything the two
    // probed buckets can see circularly; a candidate inside it is provably
    // the true successor when ranked first
    val arcLen = (col("__bt") + 2) * lit(w) - col("__t")
    val rankW = Window.partitionBy(col("src"), col("__off"))
      .orderBy(col("__dist").asc, col("__rid").asc)
    val nearWins = probed.join(slice, Seq("__cb"))
      .withColumn("__dist", distOf)
      .filter(col("__dist") < arcLen)
      .withColumn("__rn", row_number().over(rankW))
      .filter(col("__rn") === 1)
      .select(col("src"), col("__off"), col("__rid").as("dst"))
      .localCheckpoint()
    val missing = targets.join(nearWins, Seq("src", "__off"), "left_anti")
    val resolved =
      if (missing.isEmpty) nearWins
      else {
        // full-roster argmin for just the unresolved targets (tiny by
        // construction: fires only when two consecutive buckets held no
        // successor candidate)
        nearWins.unionByName(
          broadcast(missing.select(col("src"), col("__off"), col("__t")))
            .crossJoin(roster.select(col("id").as("__rid"), col("draw").as("__rd")))
            .withColumn("__dist", distOf)
            .withColumn("__rn", row_number().over(rankW))
            .filter(col("__rn") === 1)
            .select(col("src"), col("__off"), col("__rid").as("dst")))
      }
    resolved.select(col("src"), col("dst")).distinct()
  }

  /** The DRIVER-HOSTED twin of [[stitchFingers]] for driver-held id
    * batches (round 12 optimization): the distributed stitch costs a
    * checkpoint + bucket collect + windowed rank + emptiness probe per
    * insert — ~5 driver-blocking jobs to resolve a few hundred successor
    * lookups. Here the targets (draw ladder, probe buckets, acceptance
    * arcs) are computed on the driver ([[drawOf]] parity), and the
    * successor argmin is ONE aggregate job — `min(struct(dist, id))`
    * per (src, level) over the bucket-pruned roster slice, which is the
    * same total order as the distributed rank (struct comparison is
    * field-order lexicographic), with map-side partial aggregation so
    * only |batch| · levels rows ever reach the driver. The rare
    * empty-window targets fall back to one restricted full-roster argmin
    * job, exactly like the distributed fallback. RingRosterSpec gates
    * row-identity against [[stitchFingers]] on dense and sparse rosters.
    */
  private[graft] def stitchFingersLocal(
      spark: org.apache.spark.sql.SparkSession, root: String,
      ids: Seq[Long], ringStride: Int = 2, nBuckets: Int = 64,
      version: Option[Int] = None): Seq[(Long, Long)] = {
    require(ringStride >= 1, s"ringStride must be >= 1, got $ringStride")
    val b = log2(nBuckets)
    val w = P >> b
    val batch = ids.distinct.map(id => (id, drawOf(id)))
    if (batch.isEmpty) return Seq.empty
    val roster = read(spark, root, version)
      .where(!col("id").isInCollection(batch.map(_._1)))
    val n = roster.count()
    if (n == 0) return Seq.empty
    val offsets = Iterator.iterate(1L)(_ << ringStride).takeWhile(_ < n).toSeq
    if (offsets.isEmpty) return Seq.empty
    val unit = P / n
    // (src, off, t, arcLen, probe bucket) rows, driver-computed
    val targets = for {
      (src, sd) <- batch
      off <- offsets
    } yield {
      val t = Math.floorMod(sd + off * unit, P)
      val bt = (t >> (60 - b)).toInt
      (src, off, t, (bt + 2) * w - t, bt)
    }
    val probed = targets.flatMap { case (src, off, t, arc, bt) =>
      Seq((src, off, t, arc, bt), (src, off, t, arc, (bt + 1) % nBuckets))
    }
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("src",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("__off",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("__t",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("__arc",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("__cb",
        org.apache.spark.sql.types.IntegerType, nullable = true)))
    val targetsDf = spark.createDataFrame(
      spark.sparkContext.parallelize(probed.map { case (s, o, t, a, cb) =>
        org.apache.spark.sql.Row(s, o, t, a, cb)
      }, 1), schema)
    val buckets = probed.map(_._5).distinct
    def argmin(cand: DataFrame): Seq[((Long, Long), Long)] =
      cand
        .withColumn("__dist", pmod(col("draw") - col("__t"), lit(P)))
        .filter(col("__dist") < col("__arc"))
        .groupBy(col("src"), col("__off"))
        .agg(min(struct(col("__dist"), col("id"))).as("__m"))
        .select(col("src"), col("__off"), col("__m.id"))
        .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getLong(2))).toSeq
    val nearWins = argmin(
      roster.where(col("draw_bucket").isin(buckets: _*))
        .join(broadcast(targetsDf), col("draw_bucket") === col("__cb")))
    val resolvedKeys = nearWins.map(_._1).toSet
    val missing = targets.filterNot(t => resolvedKeys.contains((t._1, t._2)))
    val resolved =
      if (missing.isEmpty) nearWins
      else {
        // full-roster argmin for just the unresolved targets (arc filter
        // dropped — the circular-distance min over everything)
        val missDf = spark.createDataFrame(
          spark.sparkContext.parallelize(missing.map { case (s, o, t, _, _) =>
            org.apache.spark.sql.Row(s, o, t, Long.MaxValue, 0)
          }, 1), schema)
        nearWins ++ argmin(roster.crossJoin(broadcast(missDf)))
      }
    resolved.map { case ((src, _), dst) => (src, dst) }.distinct
  }
}

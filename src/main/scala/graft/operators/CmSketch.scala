package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Count-min sketch over a key column — one-pass, fixed-memory frequency
  * estimation (Cormode & Muthukrishnan 2005). The 100 TB use: heavy-hitter
  * and frequency questions ("how often does this host / shingle / token
  * appear?") answered with a shuffle whose volume is bounded by the SKETCH
  * size (depth × width cells per partition), not by key cardinality — a
  * `groupBy(key)` over 10¹⁰ distinct crawl keys shuffles the whole key
  * space; this shuffles ≤ depth·width·partitions bounded cells.
  *
  * Estimates are biased up only (est ≥ true count, classic CMS guarantee);
  * width is a power of two so the bucket is the low bits of a splitmix64
  * mix — the same [[graft.functions.TextHashing.mix64]] the minhash family
  * uses, so DuckDB replays buckets exactly via `OracleSql.mix64Nested`.
  * Depth-d seeds are mix64(GOLDEN·(d+1)), the TextHashing seed recipe.
  */
object CmSketch {

  private val Golden = 0x9e3779b97f4a7c15L

  /** Per-depth xor seeds, exposed for the oracle to inline as literals. */
  private[graft] def seeds(depth: Int): Array[Long] =
    Array.tabulate(depth)(d => graft.functions.TextHashing.mix64(Golden * (d + 1)))

  /** Bucket of `key` at one depth: low bits of mix64(key ^ seed). */
  @inline private[graft] def bucket(key: Long, seed: Long, width: Int): Int =
    (graft.functions.TextHashing.mix64(key ^ seed) & (width - 1)).toInt

  private def validate(depth: Int, width: Int): Unit = {
    require(depth >= 1 && depth <= 16, s"depth must be in [1,16], got $depth")
    require(width >= 2 && (width & (width - 1)) == 0,
      s"width must be a power of two >= 2, got $width")
  }

  /** Build the sketch table (d, bucket, cnt) from `df`'s long-castable
    * `keyCol` (null keys are skipped). Each partition accumulates a local
    * depth×width array (mapPartitions, zero per-row allocation) and emits
    * only its non-zero cells; one bounded aggregation merges partitions.
    */
  def sketch(df: DataFrame, keyCol: String,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    validate(depth, width)
    val sds = seeds(depth)
    val spark = df.sparkSession
    import spark.implicits._
    val keys: Dataset[Long] =
      df.select(col(keyCol).cast("long")).filter(col(keyCol).isNotNull).as[Long]
    keys.mapPartitions { it =>
      val acc = Array.ofDim[Long](depth, width)
      it.foreach { k =>
        var d = 0
        while (d < depth) { acc(d)(bucket(k, sds(d), width)) += 1; d += 1 }
      }
      for {
        d <- (0 until depth).iterator
        b <- (0 until width).iterator if acc(d)(b) > 0
      } yield (d, b, acc(d)(b))
    }.toDF("d", "bucket", "cnt")
      .groupBy("d", "bucket").agg(sum(col("cnt")).as("cnt"))
  }

  /** AMS-style equi-join size estimate from two sketches built with the
    * SAME (depth, width, seeds): per depth the cell inner product
    * Σ_w a_dw·b_dw, estimate = min over depths — an upper-biased
    * estimate of the exact join output cardinality Σ_k a_k·b_k (hash
    * collisions only ADD cross-mass, never subtract). This is the
    * sketch a cost-based planner consults to size a join BEFORE running
    * it; the arithmetic is one (d, bucket)-keyed join over ≤ depth·width
    * cells per side — index-sized, independent of data volume.
    */
  def innerProductEstimate(skA: DataFrame, skB: DataFrame): DataFrame =
    skA.select(col("d"), col("bucket"), col("cnt").as("__ca"))
      .join(skB.select(col("d"), col("bucket"), col("cnt").as("__cb")),
        Seq("d", "bucket"))
      .groupBy(col("d"))
      .agg(sum(col("__ca") * col("__cb")).as("__ip"))
      .agg(min(col("__ip")).as("est_join_size"))

  /** Streaming twin: fold one micro-batch's sketch table into an
    * accumulated cell image — cells ADD (counts are sums), unlike HLL's
    * idempotent max-merge, so a REPLAYED batch double-counts: feed this
    * from an exactly-once source (foreachBatch with idempotent upstream,
    * or dedup batch ids first). State is bounded by depth·width cells for
    * any stream length. [[cellsToSketch]] feeds the image back through
    * [[estimates]] for the batch twin's arithmetic.
    */
  def mergeCells(acc: scala.collection.mutable.Map[(Int, Int), Long],
      sk: DataFrame): Unit =
    sk.collect().foreach { r =>
      val key = (r.getInt(0), r.getInt(1))
      acc(key) = acc.getOrElse(key, 0L) + r.getLong(2)
    }

  /** An accumulated cell image back as a sketch DataFrame. */
  def cellsToSketch(spark: org.apache.spark.sql.SparkSession,
      acc: scala.collection.Map[(Int, Int), Long]): DataFrame = {
    import spark.implicits._
    acc.toSeq.map { case ((d, b), c) => (d, b, c) }.toDF("d", "bucket", "cnt")
  }

  /** EXACT heavy hitters with a sketch pre-filter: keys whose true count
    * ≥ `threshold`, computed by (1) sketching, (2) keeping only rows whose
    * key's CMS estimate reaches the threshold — upward bias means NO false
    * negatives, so no heavy key can be lost — and (3) exact-counting the
    * surviving candidate rows. At 100 TB the exact `groupBy` touches only
    * the candidate slice (heavy keys + collision false positives, pruned
    * again by the final HAVING) instead of shuffling the whole key space.
    * The sketch is collected and broadcast — bounded by depth·width cells
    * (32 KB at 4×1024), never by data. Note: `df` is scanned TWICE (sketch
    * pass + candidate pass) — cache or checkpoint expensive upstreams
    * before calling.
    */
  def heavyHitters(df: DataFrame, keyCol: String, threshold: Long,
      depth: Int = 4, width: Int = 1024): DataFrame = {
    validate(depth, width)
    require(threshold >= 1, s"threshold must be >= 1, got $threshold")
    val sds = seeds(depth)
    val cells: Map[(Int, Int), Long] = sketch(df, keyCol, depth, width)
      .collect().map(r => (r.getInt(0), r.getInt(1)) -> r.getLong(2)).toMap
    val spark = df.sparkSession
    val bc = spark.sparkContext.broadcast(cells)
    val estU = udf { (k: Long) =>
      var m = Long.MaxValue
      var d = 0
      while (d < depth) {
        val c = bc.value.getOrElse((d, bucket(k, sds(d), width)), 0L)
        if (c < m) m = c
        d += 1
      }
      m
    }
    df.select(col(keyCol).cast("long").as("k"))
      .filter(col("k").isNotNull)
      .filter(estU(col("k")) >= threshold)
      .groupBy("k").agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= threshold)
  }

  /** Point estimates for `probes` against a sketch built with the same
    * (depth, width): min over depths of the probed cell, 0 when a cell is
    * empty (the key was never seen and nothing collided into it). Probe
    * buckets are computed driver-side (probes are a parameter, not data)
    * and resolved with one left join against the sketch.
    */
  def estimates(sketchDf: DataFrame, probes: Seq[Long],
      depth: Int = 4, width: Int = 1024): DataFrame = {
    validate(depth, width)
    require(probes.nonEmpty, "estimates needs at least one probe key")
    val sds = seeds(depth)
    val spark = sketchDf.sparkSession
    import spark.implicits._
    val probeRows = probes.distinct.flatMap(k =>
      (0 until depth).map(d => (k, d, bucket(k, sds(d), width))))
    probeRows.toDF("k", "d", "bucket")
      .join(sketchDf, Seq("d", "bucket"), "left")
      .groupBy("k")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Auditable Bloom filter over a key column — the set-membership sketch
  * completing the family (CMS = frequency, HLL = cardinality, histogram =
  * quantiles, Bloom = membership). The 100 TB use: "was this URL / doc id
  * / orderkey in that other corpus?" answered by broadcasting an ≤ m-row
  * bit table instead of joining against the corpus — the CCNet/Dolma-style
  * cross-snapshot dedup pre-filter, with the classic guarantee: NO false
  * negatives, false positives at a rate set by m and k.
  *
  * Bits are the low bits of the SAME splitmix64 mix the CMS buckets use
  * ([[CmSketch.bucket]], k depth seeds), so DuckDB replays the entire bit
  * image and probe verdicts via `OracleSql.cmsBucket` — unlike Spark's
  * builtin `stat.bloomFilter`, whose bit layout is opaque to the oracle.
  *
  * Scale shape: the build is one mapPartitions pass emitting each
  * partition's set bits from a local m-bit array (bounded by m per
  * partition, like the CMS cell emit) plus one distinct; the image is ≤ m
  * rows regardless of corpus size. Probing broadcasts the image and
  * checks each probe's k positions — per-row work, no shuffle of the
  * probed side.
  */
object BloomFilter {

  private def validate(k: Int, m: Int): Unit = {
    require(k >= 1 && k <= 16, s"k must be in [1,16], got $k")
    require(m >= 2 && (m & (m - 1)) == 0,
      s"m must be a power of two >= 2, got $m")
  }

  /** The bit image (bit INT, distinct, sorted-free) of `df`'s
    * long-castable `keyCol` (nulls skipped — a null key has no membership
    * to encode).
    */
  def bits(df: DataFrame, keyCol: String, k: Int = 4, m: Int = 4096): DataFrame = {
    validate(k, m)
    val sds = CmSketch.seeds(k)
    val spark = df.sparkSession
    import spark.implicits._
    val keys: Dataset[Long] =
      df.select(col(keyCol).cast("long")).filter(col(keyCol).isNotNull).as[Long]
    keys.mapPartitions { it =>
      val local = new java.util.BitSet(m)
      it.foreach { key =>
        var i = 0
        while (i < k) { local.set(CmSketch.bucket(key, sds(i), m)); i += 1 }
      }
      Iterator.range(0, m).filter(local.get)
    }.toDF("bit").distinct()
  }

  /** Streaming accumulation: OR-merge one micro-batch's bit image into a
    * driver-side BitSet from `foreachBatch`. Setting bits is IDEMPOTENT,
    * so replayed/overlapping batches are harmless — the HLL max-merge
    * contract, not CMS's exactly-once. State is ≤ m bits for any stream
    * length.
    */
  def mergeBits(acc: java.util.BitSet, bitsDf: DataFrame): Unit =
    bitsDf.collect().foreach(r => acc.set(r.getInt(0)))

  /** An accumulated image back as a bit DataFrame (feeds [[mightContain]]
    * so streaming and batch share the probe path).
    */
  def imageToBits(spark: org.apache.spark.sql.SparkSession,
      acc: java.util.BitSet): DataFrame = {
    import spark.implicits._
    acc.stream().toArray.toSeq.toDF("bit")
  }

  /** Bloom semi-join pushdown: drop the BIG side's rows whose key cannot
    * be in `bitsDf` BEFORE any shuffle — a map-side codegen-adjacent
    * filter against a broadcast ≤m-bit image. False positives only cost
    * shuffle rows the join then discards; false NEGATIVES are impossible,
    * so downstream results are exactly the unfiltered ones. Null keys are
    * dropped (inner-equi-join semantics — they can never match).
    *
    * This is the explicit form of runtime row-level filtering: at 100 TB
    * the win is shuffle VOLUME — the big side ships only rows that might
    * join, bounded by |matches| + fp·|big| with fp set by m/k.
    */
  def prefilter(
      big: DataFrame, keyCol: String, bitsDf: DataFrame,
      k: Int = 4, m: Int = 4096): DataFrame = {
    validate(k, m)
    val sds = CmSketch.seeds(k)
    val bs = new java.util.BitSet(m)
    bitsDf.collect().foreach(r => bs.set(r.getInt(0)))
    val spark = big.sparkSession
    val bc = spark.sparkContext.broadcast(bs)
    val pass = udf { (key: java.lang.Long) =>
      key != null && {
        var i = 0
        var ok = true
        while (ok && i < k) {
          ok = bc.value.get(CmSketch.bucket(key.longValue(), sds(i), m))
          i += 1
        }
        ok
      }
    }
    big.filter(col(keyCol).isNotNull && pass(col(keyCol).cast("long")))
  }

  /** [[prefilter]] composed with the inner equi-join itself: result is
    * EXACTLY `big ⋈ small` (the bloom is an optimization, never the
    * filter of record).
    */
  def prefilterJoin(
      big: DataFrame, small: DataFrame, keyCol: String,
      k: Int = 4, m: Int = 4096): DataFrame =
    prefilter(big, keyCol, bits(small, keyCol, k, m), k, m)
      .join(small, Seq(keyCol), "inner")

  /** Probe verdicts: one row per distinct probe key with `n_positions`
    * (its DISTINCT bit positions — k hashes can collide on one bit),
    * `n_hit` (how many are set in the image) and `might_contain`
    * (1 iff every position is set). A key that was inserted can NEVER
    * miss (no false negatives); a `might_contain = 0` is definitive
    * absence.
    */
  def mightContain(
      probes: DataFrame, keyCol: String, bitsDf: DataFrame,
      k: Int = 4, m: Int = 4096): DataFrame = {
    validate(k, m)
    val sds = CmSketch.seeds(k)
    val spark = probes.sparkSession
    import spark.implicits._
    val keys: Dataset[Long] =
      probes.select(col(keyCol).cast("long")).filter(col(keyCol).isNotNull).as[Long]
    val positions = keys.mapPartitions { it =>
      it.flatMap { key =>
        val ps = Array.tabulate(k)(i => CmSketch.bucket(key, sds(i), m))
        ps.distinct.iterator.map(p => (key, p))
      }
    }.toDF("k", "bit").distinct()
    positions
      .join(broadcast(bitsDf.withColumn("__set", lit(1))), Seq("bit"), "left")
      .groupBy("k")
      .agg(count(lit(1)).as("n_positions"),
        sum(coalesce(col("__set"), lit(0))).as("n_hit"))
      .withColumn("might_contain",
        when(col("n_hit") === col("n_positions"), lit(1)).otherwise(lit(0)))
  }
}

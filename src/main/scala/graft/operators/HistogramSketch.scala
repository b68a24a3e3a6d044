package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fixed-grid histogram quantile sketch — the AUDITABLE approximate-
  * quantile of the sketch family (CmSketch / HllSketch pattern): the
  * sketch state is a plain DataFrame a human can read, the estimator is
  * exact integer arithmetic over it, and every step replays in ANSI SQL,
  * so the driver's DuckDB gate hash-verifies the whole pipeline — unlike
  * `approx_percentile`'s opaque KLL buffer.
  *
  * The sketch: values bucket into `bins` equal-width cells over a fixed
  * [lo, hi) domain (integer floor division — no float rounding anywhere);
  * the per-group state is ≤ `bins` (bin, n) rows. Quantile q reads off
  * the first bin whose cumulative count reaches ceil(q·n), reported as
  * the bin's LOWER EDGE — a deterministic rank-error-bounded estimate
  * (off by at most one bin width, i.e. (hi−lo)/bins, for any data
  * distribution; no interpolation, so engines can't diverge).
  *
  * Histograms are trivially mergeable (add counts bin-wise —
  * [[merge]]), which is what makes this the 100 TB shape: map-side
  * partial aggregation collapses every partition's values into ≤ bins
  * rows before the wire, per-day/per-shard sketches roll up by
  * addition, and the quantile read touches `bins` rows per group, never
  * the data.
  *
  * The length-distribution data-card use (per-source token-count
  * p50/p95 over a corpus) is q4t's shape.
  */
object HistogramSketch {

  /** Per-group fixed-grid histogram: (g, bin, n) with bin =
    * floor((v − lo)·bins / (hi − lo)) clamped to [0, bins−1]; rows with
    * null values are dropped (no silent zero-bin inflation). Integer
    * arithmetic end to end — `valueCol` is cast to BIGINT first, so the
    * bin boundary can never move with float rounding.
    */
  def histogram(
      df: DataFrame, groupCol: String, valueCol: Column,
      bins: Int, lo: Long, hi: Long): DataFrame = {
    require(bins >= 1, s"bins must be >= 1, got $bins")
    require(lo < hi, s"need lo < hi, got [$lo, $hi)")
    // clamp v into [lo, hi] BEFORE any arithmetic: the numerator is then
    // non-negative (so Spark's truncating cast and DuckDB's // agree —
    // floor == truncate on non-negatives) and bounded (so neither the
    // long multiply nor the double-space division can lose precision;
    // the require pins the 2^53 bound of float-parity rule 11)
    require((BigInt(hi) - BigInt(lo)) * bins < (BigInt(1) << 53),
      s"(hi-lo)*bins must stay below 2^53 for exact division, got [$lo,$hi)x$bins")
    // filter on the RAW cast: greatest/least SKIP nulls (they return the
    // largest/smallest non-null operand), so clamping first would quietly
    // turn a null value into bin 0 — the exact hazard the HllSketch
    // groupedRegisters fix closed
    val cast0 = valueCol.cast("long")
    val v = least(greatest(cast0, lit(lo)), lit(hi))
    val binRaw = ((v - lit(lo)) * lit(bins.toLong) / lit(hi - lo)).cast("long")
    val bin = least(binRaw, lit(bins.toLong - 1L))
    df.filter(cast0.isNotNull)
      .select(col(groupCol).as("g"), bin.as("bin"))
      .groupBy("g", "bin").agg(count(lit(1)).as("n"))
  }

  /** Merge histogram sketches (same grid): bin-wise count addition. */
  def merge(a: DataFrame, b: DataFrame): DataFrame =
    a.unionByName(b).groupBy("g", "bin").agg(sum(col("n")).as("n"))

  /** Streaming accumulation (the HllSketch.mergeRegisters /
    * CmSketch.mergeCells pattern): fold one micro-batch's histogram into a
    * driver-side image from `foreachBatch`. Counts ADD, so the stream
    * needs the exactly-once batch contract (CmSketch's, not HLL's
    * idempotent max) — foreachBatch re-delivery would double-count. The
    * image is bounded by groups × bins — sketch metadata scale, same as
    * collecting CMS cells.
    */
  def mergeBins(acc: scala.collection.mutable.Map[(String, Long), Long],
      hist: DataFrame): Unit =
    hist.collect().foreach { r =>
      val key = (r.getString(0), r.getLong(1))
      acc(key) = acc.getOrElse(key, 0L) + r.getLong(2)
    }

  /** An accumulated image back as a histogram DataFrame (feeds
    * [[quantiles]] so streaming and batch share every arithmetic step).
    */
  def imageToHistogram(spark: org.apache.spark.sql.SparkSession,
      acc: scala.collection.Map[(String, Long), Long]): DataFrame = {
    import spark.implicits._
    acc.toSeq.map { case ((g, bin), n) => (g, bin, n) }.toDF("g", "bin", "n")
  }

  /** Quantiles from a histogram: for each q (in PER-MILLE integers, e.g.
    * 500 = p50, 950 = p95 — kept integral so the rank threshold
    * ceil(n·q) is exact in both engines), the lower edge of the first
    * bin whose cumulative count reaches ceil(n·qpm/1000). Output
    * (g, qpm, est) with est = lo + bin·(hi−lo)/bins as DOUBLE (single
    * terminal division — replayable).
    *
    * One bounded window per group (≤ bins rows by construction) and a
    * min-aggregate per (g, qpm); the quantile never touches the data.
    */
  def quantiles(
      hist: DataFrame, qsPerMille: Seq[Int],
      bins: Int, lo: Long, hi: Long): DataFrame = {
    require(qsPerMille.nonEmpty, "need at least one quantile")
    require(qsPerMille.forall(q => q >= 1 && q <= 1000),
      s"per-mille quantiles must be in [1,1000], got $qsPerMille")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("g").orderBy("bin")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val wt = org.apache.spark.sql.expressions.Window.partitionBy("g")
    val cum = hist
      .withColumn("cum", sum(col("n")).over(w))
      .withColumn("total", sum(col("n")).over(wt))
    val qs = qsPerMille.map(q => lit(q.toLong)).toArray
    val est = lit(lo) + col("qbin").cast("double") * lit((hi - lo).toDouble / bins)
    cum.select(col("g"), col("bin"), col("cum"), col("total"),
        explode(array(qs.toIndexedSeq: _*)).as("qpm"))
      // ceil(total*qpm/1000) as integers: (total*qpm + 999) div 1000 — the
      // operands are non-negative, so the truncating cast IS the floor
      .filter(col("cum") >=
        ((col("total") * col("qpm") + lit(999L)) / lit(1000L)).cast("long"))
      .groupBy("g", "qpm").agg(min(col("bin")).as("qbin"))
      .select(col("g"), col("qpm"), est.as("est"))
  }
}

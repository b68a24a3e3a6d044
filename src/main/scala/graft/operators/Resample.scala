package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: densify a per-key bucketed series onto its
  * full integer grid and linearly interpolate the missing points — the
  * resample/gap-fill step every downstream window model (EMA q5i, drift
  * q5m, spike q4w) silently assumes has already happened.
  *
  * Shape at scale: per-key span (one map-side-combinable min/max agg), a
  * `sequence` explode bounded by the span width, then one left join back
  * to the observations and TWO frame-complementary windows over the SAME
  * `(key, bucket)` partitioning — Catalyst plans a single Exchange + Sort
  * and evaluates both frames in one stage. Per-key cost is the grid
  * width; the caller picks the bucket granularity, so the explode is
  * bounded by design, not by luck. No collect, no cartesian.
  */
object Resample {

  /** Fill each key's missing buckets between its first and last
    * observation by linear interpolation.
    *
    * Input: one row per observed (key, bucket) with a numeric value
    * (pre-aggregate duplicates first — duplicate buckets are refused
    * downstream by the join's row explosion being caught in tests, not
    * silently averaged). Output: `key, bucket, value, filled` where
    * interpolated values are snapped to `scale` decimals (observed values
    * pass through exactly). Edge buckets are always observed (the grid is
    * the key's own [min, max] span), so interpolation is always bracketed.
    */
  def gapFillLinear(
      df: DataFrame,
      keyCol: String,
      bucketCol: String,
      valueCol: String,
      scale: Int = 6): DataFrame = {
    for (c <- Seq(keyCol, bucketCol, valueCol))
      require(df.columns.contains(c), s"column $c missing from input schema")
    for (c <- Seq("__v", "__pb", "__pv", "__nb", "__nv"))
      require(!df.columns.contains(c),
        s"input already has a column named $c (reserved scratch name)")

    val obs = df.select(
      col(keyCol).as("key"),
      col(bucketCol).cast("long").as("bucket"),
      col(valueCol).cast("double").as("__v"))

    val grid = obs.groupBy("key")
      .agg(min("bucket").as("__lo"), max("bucket").as("__hi"))
      .select(col("key"),
        explode(sequence(col("__lo"), col("__hi"))).as("bucket"))

    val joined = grid.join(obs, Seq("key", "bucket"), "left")

    val before = Window.partitionBy("key").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, 0)
    val after = Window.partitionBy("key").orderBy("bucket")
      .rowsBetween(0, Window.unboundedFollowing)

    val pv = last(col("__v"), ignoreNulls = true).over(before)
    val pb = last(when(col("__v").isNotNull, col("bucket")), ignoreNulls = true)
      .over(before)
    val nv = first(col("__v"), ignoreNulls = true).over(after)
    val nb = first(when(col("__v").isNotNull, col("bucket")), ignoreNulls = true)
      .over(after)

    val frac = (col("bucket") - col("__pb")).cast("double") /
      (col("__nb") - col("__pb")).cast("double")
    // Explicit floor-based half-up snap instead of round(): interpolants
    // routinely land on exact dyadic midpoints (half-way fractions of
    // decimal inputs), where engines' double ROUND tie rules diverge.
    // floor(x·10^s + 0.5)/10^s is the same IEEE op sequence everywhere.
    val factor = lit(math.pow(10, scale))
    val interp = col("__pv") + (col("__nv") - col("__pv")) * frac
    joined
      .withColumn("__pv", pv).withColumn("__pb", pb)
      .withColumn("__nv", nv).withColumn("__nb", nb)
      .withColumn("value",
        when(col("__v").isNotNull, col("__v"))
          .otherwise(floor(interp * factor + lit(0.5)) / factor))
      .withColumn("filled", col("__v").isNull)
      .select(col("key").as(keyCol), col("bucket").as(bucketCol),
        col("value"), col("filled"))
  }

  /** Last-observation-carried-forward densification — [[gapFillLinear]]'s
    * causal sibling: fills each missing bucket with the most recent
    * observed value. Unlike interpolation (which needs the FUTURE
    * bracket and is therefore inherently offline), LOCF is causal, so it
    * is the variant a streaming pipeline can maintain incrementally.
    * Carried values are exact copies — no float contract at all. One
    * backward-looking window over the same single-Exchange shape.
    */
  def gapFillLocf(
      df: DataFrame,
      keyCol: String,
      bucketCol: String,
      valueCol: String): DataFrame = {
    for (c <- Seq(keyCol, bucketCol, valueCol))
      require(df.columns.contains(c), s"column $c missing from input schema")
    require(!df.columns.contains("__v"),
      "input already has a column named __v (reserved scratch name)")
    val obs = df.select(
      col(keyCol).as("key"),
      col(bucketCol).cast("long").as("bucket"),
      col(valueCol).cast("double").as("__v"))
    val grid = obs.groupBy("key")
      .agg(min("bucket").as("__lo"), max("bucket").as("__hi"))
      .select(col("key"),
        explode(sequence(col("__lo"), col("__hi"))).as("bucket"))
    val before = Window.partitionBy("key").orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, 0)
    grid.join(obs, Seq("key", "bucket"), "left")
      .withColumn("value",
        last(col("__v"), ignoreNulls = true).over(before))
      .withColumn("filled", col("__v").isNull)
      .select(col("key").as(keyCol), col("bucket").as(bucketCol),
        col("value"), col("filled"))
  }

  /** Rolling features over a DENSE per-key bucket series (pair with
    * [[gapFillLinear]] — on a dense grid a ROWS frame equals a RANGE
    * frame, so "last `nBuckets` rows" means "last `nBuckets` time
    * buckets" with no silent gap-skipping): per row the trailing
    * mean/min/max and the actual window row count (`roll_n` < nBuckets
    * during each key's warm-up prefix).
    *
    * One window partitioning (key → bucket), bounded running frame —
    * per-key window state is ≤ nBuckets rows by construction. The mean
    * sums through DECIMAL(18,6) (exact for 6-decimal inputs, order-free)
    * and snaps via the same floor-based half-up used by the
    * interpolator, because trailing means of decimal-ish values land on
    * exact decimal midpoints where engines' ROUND tie rules diverge.
    */
  def rollingStats(
      df: DataFrame,
      keyCol: String,
      bucketCol: String,
      valueCol: String,
      nBuckets: Int): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    for (c <- Seq(keyCol, bucketCol, valueCol))
      require(df.columns.contains(c), s"column $c missing from input schema")

    val w = Window.partitionBy(keyCol).orderBy(bucketCol)
      .rowsBetween(-(nBuckets - 1).toLong, 0)
    val v = col(valueCol).cast("double")
    val n = count(lit(1)).over(w)
    val meanRaw = sum(v.cast("decimal(18,6)")).over(w).cast("double") /
      n.cast("double")
    df.withColumn("roll_n", n)
      .withColumn("roll_mean", floor(meanRaw * lit(1e6) + lit(0.5)) / lit(1e6))
      .withColumn("roll_min", min(v).over(w))
      .withColumn("roll_max", max(v).over(w))
  }
}

package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-rate spike detection over tumbling windows, per group — the
  * "is this hour anomalous" alert signal (q4w), factored so batch and
  * streaming share every arithmetic step.
  *
  * A window is a spike when its count exceeds the group's mean by more than
  * two standard deviations, computed ENTIRELY in integers: with W windows,
  * count sum S1 and sum-of-squares S2,
  *   n − μ > 2σ  ⇔  n·W − S1 > 0  ∧  (n·W − S1)² > 4·(W·S2 − S1²)
  * (multiply through by W²; every quantity is an exact BIGINT, so there is
  * zero cross-engine float risk and zero accumulation-order sensitivity).
  *
  * Streaming: the per-(group, window) count image ADDS across micro-batches
  * ([[mergeCounts]], the CMS exactly-once contract — each event must be
  * delivered once), carries one long per live window, and feeds the SAME
  * [[flags]] arithmetic, so the streaming verdicts are bit-identical to a
  * batch run over the union of the batches. Spike flags need the group's
  * FULL window population (W, S1, S2 are corpus statistics), which is why
  * the streaming side accumulates counts and defers flagging to read time
  * instead of emitting per-trigger verdicts that would retract.
  *
  * Scale shape: one map-side-combinable count shuffle keyed on
  * (group, window); the stats join is per-group scalars; state is bounded
  * by live (group, window) pairs — windows age out of the image once the
  * retention horizon drops them.
  */
object SpikeDetect {

  /** Tumbling-window counts: (group, window_start_ms, n). `tsMsCol` is
    * epoch millis (BIGINT); windows align to epoch zero via pmod, so the
    * bucketing is exact for negative timestamps too.
    */
  def windowCounts(
      events: DataFrame, groupCol: String, tsMsCol: String,
      windowMs: Long): DataFrame = {
    require(windowMs > 0, s"windowMs must be positive, got $windowMs")
    events
      .select(col(groupCol).as("g"),
        (col(tsMsCol) - pmod(col(tsMsCol), lit(windowMs))).as("window_start_ms"))
      .groupBy("g", "window_start_ms")
      .agg(count(lit(1)).as("n"))
  }

  /** Integer-exact two-sigma flags over a counts frame
    * (g, window_start_ms, n) — every window emitted with is_spike 0/1.
    */
  def flags(counts: DataFrame): DataFrame = {
    val stats = counts.groupBy("g").agg(
      count(lit(1)).as("w"),
      sum(col("n")).as("s1"),
      sum(col("n") * col("n")).as("s2"))
    val dev = col("n") * col("w") - col("s1")
    counts.join(stats, "g")
      .select(col("g"), col("window_start_ms"), col("n"),
        when(dev > 0 &&
            dev * dev > lit(4L) * (col("w") * col("s2") - col("s1") * col("s1")),
          lit(1)).otherwise(lit(0)).as("is_spike"))
  }

  /** Add-merge a batch's (g, window_start_ms, n) counts into the streaming
    * image. Counts ADD — the exactly-once contract (a replayed batch would
    * double-count; dedupe upstream or key batches like StreamingDedup).
    * The driver-side image is bounded by live (group, window) pairs.
    */
  def mergeCounts(
      acc: scala.collection.mutable.Map[(String, Long), Long],
      batchCounts: DataFrame): Unit =
    batchCounts.select(col("g"), col("window_start_ms"), col("n")).collect()
      .foreach { r =>
        val k = (r.getString(0), r.getLong(1))
        acc(k) = acc.getOrElse(k, 0L) + r.getLong(2)
      }

  /** Rehydrate the accumulated image as a counts frame for [[flags]] —
    * streaming and batch share every downstream arithmetic step.
    */
  def imageToCounts(
      spark: SparkSession,
      acc: scala.collection.Map[(String, Long), Long]): DataFrame = {
    import spark.implicits._
    acc.toSeq.map { case ((g, ws), n) => (g, ws, n) }
      .toDF("g", "window_start_ms", "n")
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distribution-drift measurement between two slices of a dataset — the
  * population stability index (PSI, the standard scorecard-monitoring
  * statistic from the credit-risk literature): "did this column's
  * distribution move between last week's corpus snapshot and this week's?"
  * The companion to [[Profile.tableProfile]] (what a column looks like) —
  * this is whether it CHANGED.
  *
  * PSI = Σ_v (p_cur(v) − p_ref(v)) · ln(p_cur(v) / p_ref(v)), summed over
  * categories (or numeric bins). Laplace smoothing (α added to every count,
  * denominator grown by α·K over the K union categories) keeps categories
  * absent on one side finite and the index defined — the conventional
  * guard for the ln's pole at zero.
  *
  * Scale shape: per-side frequencies are map-side-combinable counts; the
  * two sides meet in a full outer join keyed by the (low-cardinality)
  * category value; the three scalars (side totals, category count) ride a
  * broadcast 1-row aggregate — no driver collect anywhere. Numeric columns
  * bin with FIXED edges (caller-declared lo/width), never percentiles: at
  * 100 TB an exact quantile pass costs a full sort, and drift against a
  * moving reference grid is circular anyway.
  */
object Drift {

  /** Per-category drift rows between `ref` and `cur` on `valueCol`:
    * `value`, `n_ref`, `n_cur`, `p_ref`, `p_cur`, `psi_term` (raw doubles;
    * callers round for cross-engine replay). Total PSI = sum(psi_term).
    * Null values are excluded on both sides (profile them via
    * [[Profile.tableProfile]]'s n_null instead — a null is a completeness
    * problem, not a distribution shift).
    */
  def categoricalDrift(
      ref: DataFrame, cur: DataFrame, valueCol: String,
      smoothing: Double = 0.5): DataFrame =
    driftFromCounts(valueCounts(ref, valueCol), valueCounts(cur, valueCol),
      smoothing)

  /** Per-category counts (`value`, `n`) of one slice — the unit
    * [[driftFromCounts]] consumes and the streaming image add-merges.
    * Nulls excluded (see [[categoricalDrift]]).
    */
  def valueCounts(df: DataFrame, valueCol: String): DataFrame =
    df.select(col(valueCol).as("value"))
      .filter(col("value").isNotNull)
      .groupBy(col("value"))
      .agg(count(lit(1)).as("n"))

  /** PSI drift between two pre-aggregated (`value`, `n`) counts frames —
    * the arithmetic core [[categoricalDrift]] and the streaming path
    * share, so batch and stream verdicts are bit-identical over equal
    * counts.
    */
  def driftFromCounts(
      refCounts: DataFrame, curCounts: DataFrame,
      smoothing: Double = 0.5): DataFrame = {
    require(smoothing > 0.0, s"smoothing must be > 0 (ln pole), got $smoothing")
    val joined = refCounts.select(col("value"), col("n").as("__nr"))
      .join(curCounts.select(col("value"), col("n").as("__nc")),
        Seq("value"), "full_outer")
      .select(col("value"),
        coalesce(col("__nr"), lit(0L)).as("n_ref"),
        coalesce(col("__nc"), lit(0L)).as("n_cur"))
    val totals = joined.agg(
      sum(col("n_ref")).as("__tr"), sum(col("n_cur")).as("__tc"),
      count(lit(1)).as("__k"))
    val a = lit(smoothing)
    val pRef = (col("n_ref").cast("double") + a) /
      (col("__tr").cast("double") + a * col("__k").cast("double"))
    val pCur = (col("n_cur").cast("double") + a) /
      (col("__tc").cast("double") + a * col("__k").cast("double"))
    joined.crossJoin(broadcast(totals))
      .withColumn("p_ref", pRef)
      .withColumn("p_cur", pCur)
      .withColumn("psi_term",
        (col("p_cur") - col("p_ref")) * log(col("p_cur") / col("p_ref")))
      .select(col("value"), col("n_ref"), col("n_cur"),
        col("p_ref"), col("p_cur"), col("psi_term"))
  }

  /** Add-merge a batch's (`value`, `n`) counts into the streaming drift
    * image (keys stringified — one image contract for every monitored
    * type, the xxhash64-funnel idea from the streaming data card). Counts
    * ADD — the exactly-once contract (a replayed batch double-counts;
    * dedupe upstream or key batches like StreamingDedup). The image is
    * bounded by the column's category domain — the same boundedness that
    * makes the column worth monitoring categorically at all.
    */
  def mergeCounts(
      acc: scala.collection.mutable.Map[String, Long],
      batchCounts: DataFrame): Unit =
    batchCounts.select(col("value").cast("string"), col("n")).collect()
      .foreach { r =>
        val k = r.getString(0)
        acc(k) = acc.getOrElse(k, 0L) + r.getLong(1)
      }

  /** Rehydrate the accumulated image as a (`value`, `n`) counts frame for
    * [[driftFromCounts]] — streaming and batch share every arithmetic step
    * downstream of the counts.
    */
  def imageToCounts(
      spark: org.apache.spark.sql.SparkSession,
      acc: scala.collection.Map[String, Long]): DataFrame = {
    import spark.implicits._
    acc.toSeq.toDF("value", "n")
  }

  /** Numeric drift via fixed-width bins: values land in
    * floor((x − lo) / width) clamped to [0, nBins−1] (outliers collapse
    * into the edge bins, the standard PSI convention), then the
    * categorical machinery runs on the bin index. Fixed caller-declared
    * edges — see the class doc for why not percentiles. Nulls excluded
    * BEFORE clamping (greatest/least skip null operands — the
    * HistogramSketch lesson).
    */
  def binnedDrift(
      ref: DataFrame, cur: DataFrame, numCol: String,
      lo: Double, width: Double, nBins: Int,
      smoothing: Double = 0.5): DataFrame = {
    require(width > 0.0, s"width must be > 0, got $width")
    require(nBins >= 2, s"nBins must be >= 2, got $nBins")
    def binned(df: DataFrame): DataFrame = {
      val x = col(numCol).cast("double")
      df.filter(x.isNotNull)
        .select(least(greatest(
            floor((x - lit(lo)) / lit(width)).cast("long"), lit(0L)),
          lit(nBins - 1L)).as("bin"))
    }
    categoricalDrift(binned(ref), binned(cur), "bin", smoothing)
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Classifier-score calibration: the reliability table (per-bin confidence
  * vs empirical accuracy) plus expected calibration error — the standard
  * diagnostic before a trained gate ([[TextClassifier]],
  * `Curate.Config.classifierGate`) is trusted to threshold a corpus.
  *
  * Shape at scale: one map-side-combinable groupBy over `bins` cells (a
  * few dozen rows out of any input size), then window arithmetic over the
  * tiny aggregated table — the single-partition window is over ≤ bins
  * rows by construction, never over data.
  *
  * Oracle contract: per-bin means divide an exact DECIMAL(28,12) score
  * sum by a BIGINT count in DOUBLE, snapped to 6 decimals; the ECE
  * numerator multiplies the 6-decimal gap (as DECIMAL(18,6)) by the bin
  * count exactly, so the weighted sum is order-free.
  */
object Calibration {

  /** Equal-width reliability table over scores in [0, 1].
    *
    * Output per occupied bin: `bin` (0-based), `n`, `n_pos`, `conf`
    * (mean score), `acc` (positive rate), `gap` (|acc − conf|), and
    * `ece` (the corpus-wide Σ n_b/N · gap_b, identical on every row).
    * Scores outside [0, 1] or null are dropped; score exactly 1.0 lands
    * in the top bin.
    */
  def reliabilityTable(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      bins: Int): DataFrame = {
    require(bins > 0, s"bins must be positive, got $bins")
    for (c <- Seq(scoreCol, labelCol))
      require(df.columns.contains(c), s"column $c missing from input schema")
    require(!df.columns.contains("__bin"),
      "input already has a column named __bin (reserved scratch name)")

    val s = col(scoreCol).cast("double")
    val agg = df
      .filter(s.isNotNull && s >= 0.0 && s <= 1.0)
      .withColumn("__bin",
        least(floor(s * bins), lit(bins - 1)).cast("int"))
      .groupBy(col("__bin").as("bin"))
      .agg(
        count(lit(1)).as("n"),
        sum(s.cast("decimal(28,12)")).as("__ssum"),
        sum(when(col(labelCol).cast("boolean"), 1L).otherwise(0L)).as("n_pos"))

    val rated = agg
      .withColumn("conf", round(col("__ssum").cast("double") / col("n"), 6))
      .withColumn("acc", round(col("n_pos").cast("double") / col("n"), 6))
      .withColumn("gap", round(abs(col("acc") - col("conf")), 6))
      .drop("__ssum")

    val tot = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    rated
      .withColumn("ece", round(
        sum(col("gap").cast("decimal(18,6)") * col("n")).over(tot)
          .cast("double") / sum(col("n")).over(tot), 6))
      .select(col("bin"), col("n"), col("n_pos"), col("conf"), col("acc"),
        col("gap"), col("ece"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Supervised feature-encoding diagnostics: Weight-of-Evidence / IV
  * binning and smoothed target (mean) encoding — the standard credit-
  * scoring / tabular-ML transforms over a binary label. Both reduce to
  * grouped integer counts plus ln/division arithmetic (oracle-proven
  * parity: ln and division per q3y/q38, doubles via early CAST).
  *
  * The reference has no feature engineering; formulations are the
  * textbook ones (Siddiqi's credit-scorecard WOE/IV; the Micci-Barreca
  * smoothed target encoder), built Spark-first for the §2.12 north star.
  */
object FeatureEncode {

  /** Equal-width WOE/IV binning of `featureCol` against binary `labelCol`
    * (0/1 int): bin i covers [lo + i·w, lo + (i+1)·w) with outliers
    * clamped into the edge bins. Laplace-smoothed (+0.5 per bin side) so
    * empty-side bins stay finite. Output: one row per OCCUPIED bin with
    * counts, WOE, the bin's IV term, and the total IV replicated per row.
    *
    * Scale shape: one map-side-combinable groupBy over the data; the
    * window totals run over the ≤`bins`-row aggregate, never the data.
    */
  def woeIv(df: DataFrame, featureCol: Column, labelCol: Column,
      bins: Int, lo: Double, hi: Double): DataFrame = {
    require(bins > 0 && hi > lo, s"need bins>0 and hi>lo, got $bins [$lo,$hi)")
    val width = (hi - lo) / bins
    val rawBin = floor((featureCol.cast("double") - lo) / width).cast("int")
    val bin = least(greatest(rawBin, lit(0)), lit(bins - 1))
    // Spark greatest/least SKIP null operands, so a NULL feature would be
    // clamped straight into bin 0 and contaminate its counts/WOE — filter
    // null feature AND null label rows out before binning (a null label
    // can't contribute to either side of the evidence ratio).
    val perBin = df
      .filter(featureCol.isNotNull && labelCol.isNotNull)
      .withColumn("__bin", bin)
      .groupBy(col("__bin").as("bin"))
      .agg(count(lit(1)).as("n"), sum(labelCol.cast("long")).as("pos"))
      .withColumn("neg", col("n") - col("pos"))
    val all = Window.partitionBy() // ≤bins rows by construction — bounded
    val dPos = (col("pos").cast("double") + 0.5) / sum(col("pos")).over(all).cast("double")
    val dNeg = (col("neg").cast("double") + 0.5) / sum(col("neg")).over(all).cast("double")
    // iv_total sums the ROUNDED per-bin terms through DECIMAL so the
    // cross-bin addition order (unspecified in both engines' window sums)
    // can't perturb the last double bits.
    val ivTerm = round((dPos - dNeg) * log(dPos / dNeg), 6)
    perBin
      .withColumn("woe", round(log(dPos / dNeg), 6))
      .withColumn("iv_term", ivTerm)
      .withColumn("iv_total",
        sum(ivTerm.cast("decimal(18,6)")).over(all).cast("double"))
  }

  /** Smoothed target encoding of a categorical column: enc = (Σy + m·prior)
    * / (n + m) with the global prior injected as a literal from one scalar
    * aggregate job — the per-category encoding is then a pure map-side
    * groupBy with no global window, whatever the category cardinality.
    * `labelCol` must be 0/1.
    */
  def targetEncode(df: DataFrame, catCol: Column, labelCol: Column,
      m: Double): DataFrame = {
    val lbl = labelCol.cast("long")
    val tot = df.agg(sum(lbl).as("sy"), count(lit(1)).as("n")).collect()(0)
    val prior = tot.getLong(0).toDouble / tot.getLong(1).toDouble
    df.groupBy(catCol.as("category"))
      .agg(count(lit(1)).as("n"), sum(lbl).as("sum_y"))
      .withColumn("prior", round(lit(prior), 6))
      .withColumn("enc",
        round((col("sum_y").cast("double") + lit(m) * lit(prior))
          / (col("n").cast("double") + lit(m)), 6))
  }
}

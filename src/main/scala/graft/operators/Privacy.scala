package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Privacy-release primitives — the disclosure-risk side of the scrub
  * family ([[Scrub]] removes identifiers; these measure and bound what
  * the REMAINING quasi-identifiers leak):
  *
  *  - k-anonymity profiling (Sweeney 2002): equivalence-class sizes of
  *    the quasi-identifier tuple, the dataset's achieved k, and the
  *    suppression rate a k-threshold release would pay.
  *  - ε-differentially-private counts (Dwork et al. 2006) with
  *    DETERMINISTIC Laplace noise: the draw comes from the engine-wide
  *    salted md5 uniform ([[DataMix.hashDraw]]) through the inverse-CDF
  *    transform −(1/ε)·sgn(u−½)·ln(1−2|u−½|), so releases are
  *    reproducible run-to-run AND replayable by the DuckDB oracle
  *    (hex-parse + ln parity, the q4d recipe). Reproducibility is a
  *    release-engineering feature (the same publication can be
  *    re-derived); rotating the salt per release restores
  *    fresh-randomness semantics.
  */
object Privacy {

  /** Equivalence-class profile of `quasiCols`: one row per class with
    * `class_size`, `violates` (size < k), and the repeated global
    * summary (`n_classes`, `n_rows`, `k_achieved` = min class size,
    * `suppression_rate` = share of rows in violating classes — what a
    * suppress-below-k release would drop). Class count is bounded by
    * the quasi-identifier domain (the q6d aggregated-table contract);
    * both aggregations are map-side combinable.
    */
  def kAnonymityProfile(
      df: DataFrame, quasiCols: Seq[String], k: Long): DataFrame = {
    require(quasiCols.nonEmpty, "need at least one quasi-identifier column")
    require(k >= 2, s"k must be >= 2, got $k")
    val classes = df.groupBy(quasiCols.map(col): _*)
      .agg(count(lit(1)).as("class_size"))
    val all = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    classes
      .withColumn("violates", col("class_size") < k)
      .withColumn("n_classes", count(lit(1)).over(all))
      .withColumn("n_rows", sum(col("class_size")).over(all))
      .withColumn("k_achieved", min(col("class_size")).over(all))
      .withColumn("suppression_rate",
        round(sum(when(col("violates"), col("class_size")).otherwise(0L))
          .over(all).cast("double") / col("n_rows"), 6))
  }

  /** The (0,1) uniform behind the Laplace draw: the 8-hex md5 prefix as
    * an integer, centered — (i + 0.5)/2³², never exactly 0, ½ or 1.
    */
  private def uniform(key: Column, salt: String): Column =
    (conv(DataMix.hashDraw(key, salt), 16, 10).cast("double") + lit(0.5)) /
      lit(4294967296.0)

  /** ε-DP noisy counts per group: `n_true` (keep for auditing/testing —
    * a REAL release drops this column), `noise` (deterministic
    * Laplace(1/ε), 6-rounded), `n_released` = max(0, n_true + noise)
    * (clamped — counts are non-negative by definition, and the clamp is
    * post-processing, which DP composition permits). One map-side
    * combinable aggregation; the noise is per-GROUP arithmetic on the
    * aggregated table.
    */
  def dpCounts(
      df: DataFrame, groupCol: String, eps: Double, salt: String): DataFrame = {
    require(eps > 0, s"eps must be positive, got $eps")
    val u = uniform(col(groupCol).cast("string"), salt)
    val centered = u - lit(0.5)
    // explicit sign CASE (not signum): spelled identically in the oracle,
    // immune to cross-engine sign() return-type differences
    val sgn = when(centered < 0, lit(-1.0)).otherwise(lit(1.0))
    val noise = round(
      lit(-1.0 / eps) * sgn *
        log(lit(1.0) - lit(2.0) * abs(centered)), 6)
    df.filter(col(groupCol).isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n_true"))
      .withColumn("noise", noise)
      // outer round normalizes a possible -0.0 from the clamp boundary
      .withColumn("n_released",
        round(greatest(round(col("n_true") + col("noise"), 6), lit(0.0)), 6))
  }
}

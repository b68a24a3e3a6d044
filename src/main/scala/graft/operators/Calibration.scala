package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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

  /** Decile gains/lift table — the ranking-model acceptance report: rows
    * bucketed by score rank via [[ScaleOps.globalNtile]] (range-
    * partitioned — no one-partition window however many rows are
    * scored), then per-bucket response rate, cumulative capture of all
    * positives, and cumulative lift over the base rate. The cumulative
    * windows run over the ≤`buckets`-row aggregate, never the data.
    * `labelCol` must be 0/1; `tiebreaks` make (score desc, tiebreaks) a
    * total order.
    */
  def liftTable(df: DataFrame, scoreCol: Column, labelCol: Column,
      buckets: Int, tiebreaks: Seq[Column]): DataFrame = {
    val ranked = ScaleOps.globalNtile(df, scoreCol.desc +: tiebreaks,
      buckets, "bucket")
    val per = ranked.groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"), sum(labelCol.cast("long")).as("pos"))
    val all = Window.orderBy(col("bucket")) // ≤buckets rows — bounded
    val cum = all.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val tot = all.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    def d(c: Column) = c.cast("double")
    per
      .withColumn("response_rate", round(d(col("pos")) / d(col("n")), 6))
      .withColumn("cum_capture",
        round(d(sum(col("pos")).over(cum)) / d(sum(col("pos")).over(tot)), 6))
      .withColumn("cum_lift",
        round((d(sum(col("pos")).over(cum)) / d(sum(col("n")).over(cum)))
          / (d(sum(col("pos")).over(tot)) / d(sum(col("n")).over(tot))), 6))
  }

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

  /** One-row binary-classifier evaluation: confusion counts at
    * `threshold` (predicted positive ⇔ score ≥ threshold) plus
    * precision / recall / F1 / accuracy, and the EXACT ROC AUC.
    *
    * AUC is the Mann–Whitney rank-sum in its tie-aware grouped form:
    * group by distinct score, order ascending, and accumulate
    * 2·p_s·cumNeg_below + p_s·n_s — every term an INTEGER, so
    * AUC = Σ / (2·P·N) needs exactly one double division (no rank
    * windows over raw rows, no per-row state). F1 is computed as
    * 2tp/(2tp+fp+fn) — one division over integers — rather than from
    * rounded precision/recall.
    *
    * Shape at scale: confusion counts are one map-side-combinable
    * aggregate; the AUC pass pre-aggregates to one row per DISTINCT
    * score before its ordered prefix window, so window input is bounded
    * by score-grid resolution, not corpus size (snap scores to a grid
    * upstream if they are raw doubles). Null scores/labels are dropped.
    */
  def binaryMetrics(
      df: DataFrame,
      scoreCol: String,
      labelCol: String,
      threshold: Double): DataFrame = {
    for (c <- Seq(scoreCol, labelCol))
      require(df.columns.contains(c), s"column $c missing from input schema")

    val s = col(scoreCol).cast("double")
    val y = col(labelCol).cast("boolean")
    val base = df.filter(s.isNotNull && y.isNotNull)
      .select(s.as("__s"), y.as("__y"))

    val conf = base.agg(
      sum(when(col("__y") && col("__s") >= threshold, 1L).otherwise(0L)).as("tp"),
      sum(when(!col("__y") && col("__s") >= threshold, 1L).otherwise(0L)).as("fp"),
      sum(when(!col("__y") && col("__s") < threshold, 1L).otherwise(0L)).as("tn"),
      sum(when(col("__y") && col("__s") < threshold, 1L).otherwise(0L)).as("fn"))

    // per-distinct-score positive/negative counts, ordered prefix of
    // negatives below, integer AUC numerator
    val byScore = base.groupBy(col("__s"))
      .agg(
        sum(when(col("__y"), 1L).otherwise(0L)).as("__p"),
        sum(when(!col("__y"), 1L).otherwise(0L)).as("__n"))
    val wAsc = Window.orderBy(col("__s"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val auc = byScore
      .withColumn("__cumneg", coalesce(sum(col("__n")).over(wAsc), lit(0L)))
      .agg(
        sum(lit(2L) * col("__p") * col("__cumneg") + col("__p") * col("__n"))
          .as("__num"),
        sum(col("__p")).as("__P"),
        sum(col("__n")).as("__N"))
      .select(
        when(col("__P") > 0 && col("__N") > 0,
          round(col("__num").cast("double") /
            (lit(2.0) * col("__P") * col("__N")), 6)).as("auc"))

    // every ratio is null (not NaN/error) when its denominator is empty —
    // ANSI mode makes the unguarded division a hard failure
    def ratio(num: org.apache.spark.sql.Column,
        den: org.apache.spark.sql.Column) =
      when(den > 0, round(num.cast("double") / den, 6))
    conf.crossJoin(auc)
      .select(col("tp"), col("fp"), col("tn"), col("fn"),
        ratio(col("tp"), col("tp") + col("fp")).as("precision"),
        ratio(col("tp"), col("tp") + col("fn")).as("recall"),
        ratio(lit(2L) * col("tp"),
          lit(2L) * col("tp") + col("fp") + col("fn")).as("f1"),
        ratio(col("tp") + col("tn"),
          col("tp") + col("fp") + col("tn") + col("fn")).as("accuracy"),
        col("auc"))
  }

  /** Mergeable per-bin state for the streaming reliability card: counts
    * are longs, the score mass is an EXACT DECIMAL(28,12) BigDecimal —
    * merging is plain addition, so any micro-batch split of the stream
    * folds to the identical table (the Profile.ColumnState discipline).
    */
  final case class BinState(n: Long, ssum: java.math.BigDecimal, nPos: Long) {
    def merge(o: BinState): BinState =
      BinState(n + o.n, ssum.add(o.ssum), nPos + o.nPos)
  }

  /** One micro-batch folded to its per-bin image (driver state: ≤ bins
    * entries of three scalars). Same binning/filters as
    * [[reliabilityTable]].
    */
  def batchImage(
      df: DataFrame, scoreCol: String, labelCol: String,
      bins: Int): Map[Int, BinState] = {
    require(bins > 0, s"bins must be positive, got $bins")
    val s = col(scoreCol).cast("double")
    df.filter(s.isNotNull && s >= 0.0 && s <= 1.0)
      .withColumn("__bin", least(floor(s * bins), lit(bins - 1)).cast("int"))
      .groupBy("__bin")
      .agg(count(lit(1)).as("n"),
        sum(s.cast("decimal(28,12)")).as("ssum"),
        sum(when(col(labelCol).cast("boolean"), 1L).otherwise(0L)).as("np"))
      .collect()
      .map(r => r.getInt(0) -> BinState(r.getLong(1),
        r.getDecimal(2), r.getLong(3)))
      .toMap
  }

  /** Pointwise image merge. */
  def mergeImages(
      a: Map[Int, BinState], b: Map[Int, BinState]): Map[Int, BinState] =
    (a.keySet ++ b.keySet).map { k =>
      k -> ((a.get(k), b.get(k)) match {
        case (Some(x), Some(y)) => x.merge(y)
        case (x, y) => x.orElse(y).get
      })
    }.toMap

  /** The accumulated image as the [[reliabilityTable]] output — identical
    * arithmetic (double division of the exact decimal mass, 6-decimal
    * snaps, count-weighted ECE), so streamed ≡ batch bit-for-bit.
    */
  def imageToTable(
      spark: org.apache.spark.sql.SparkSession,
      img: Map[Int, BinState]): DataFrame = {
    import spark.implicits._
    val rated = img.toSeq.sortBy(_._1).map { case (bin, st) =>
      val conf = BigDecimal(st.ssum).toDouble / st.n
      val acc = st.nPos.toDouble / st.n
      def r6(x: Double) =
        java.math.BigDecimal.valueOf(x)
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
      (bin, st.n, st.nPos, r6(conf), r6(acc))
    }.map { case (bin, n, np, conf, acc) =>
      (bin, n, np, conf, acc,
        java.math.BigDecimal.valueOf(math.abs(acc - conf))
          .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue())
    }
    val totN = rated.map(_._2).sum
    val eceNum = rated.foldLeft(java.math.BigDecimal.ZERO) { (z, r) =>
      z.add(java.math.BigDecimal.valueOf(r._6)
        .setScale(6, java.math.RoundingMode.HALF_UP)
        .multiply(java.math.BigDecimal.valueOf(r._2)))
    }
    val ece = java.math.BigDecimal.valueOf(eceNum.doubleValue() / totN)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    rated.map(r => (r._1, r._2, r._3, r._4, r._5, r._6, ece))
      .toDF("bin", "n", "n_pos", "conf", "acc", "gap", "ece")
  }
}

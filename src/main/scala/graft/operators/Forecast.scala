package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic time-series forecasting — Holt's linear-trend double
  * exponential smoothing (Holt 1957, public literature): per key, the
  * classic two-state recursion
  *
  *   l_t = α·y_t + (1−α)·(l_{t−1} + b_{t−1})
  *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
  *
  * seeded l₁ = y₁, b₁ = 0, with the h-step-ahead forecast l + h·b.
  *
  * Reproducibility: the recursion is an ORDERED FOLD, so it rides the q5i
  * EMA recipe — the per-key series is collected as a sorted list and
  * folded with a per-step 9-decimal snap on BOTH state components, making
  * Spark and the DuckDB list_reduce oracle walk identical doubles. The
  * accumulator is a 2-field struct (level, trend); the oracle mirrors it
  * with DuckDB's struct-in-lambda (the q3s idiom). Smoothing parameters
  * must be EXACTLY representable in binary (0.5, 0.25, 0.75…) so that
  * 1−α / 1−β computed on the Scala side equals the decimal literal the
  * oracle spells — the constructor enforces it.
  *
  * Scale shape: one groupBy collapsing raw rows to per-key ordered value
  * lists (state bounded by series length — DAILY/HOURLY buckets per key,
  * not raw events; callers pre-aggregate, the q6o contract), then a
  * per-row fold. No windows, no iteration-count shuffles: the serial
  * dependency lives inside one row's array, the parallelism across keys.
  */
object Forecast {

  private def exactBinary(x: Double, name: String): Unit = {
    // exactly representable iff scaling by 2^k hits an integer for small k
    val ok = (0 to 20).exists { k =>
      val s = x * (1L << k); s == math.floor(s) && math.abs(s) < (1L << 52)
    }
    require(ok, s"$name=$x is not exactly binary-representable; " +
      "pick a dyadic rational (0.5, 0.25, 0.75, …) so the oracle's decimal " +
      "literal parses to the identical double")
  }

  /** Holt linear-trend fit + forecast per key over an ordered numeric
    * series. Output, one row per key: `n_obs`, `level`, `trend` (final
    * smoothed state, 6-rounded) and `forecast_h` = level + horizon·trend.
    */
  def holtLinear(
      series: DataFrame, keyCol: String, orderCol: String, valueCol: String,
      alpha: Double = 0.5, beta: Double = 0.25, horizon: Int = 7): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    require(beta > 0 && beta < 1, s"beta must be in (0,1), got $beta")
    require(horizon >= 1, s"horizon must be >= 1, got $horizon")
    exactBinary(alpha, "alpha")
    exactBinary(beta, "beta")

    val collected = series
      .filter(col(valueCol).isNotNull && col(orderCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_obs"),
        array_sort(collect_list(struct(col(orderCol).as("o"),
          col(valueCol).cast("double").as("y")))).as("__seq"))
      .withColumn("__ys", transform(col("__seq"), x => x.getField("y")))

    def step(acc: Column, x: Column): Column = {
      val lPrev = acc.getField("l")
      val bPrev = acc.getField("b")
      val lNew = round(lit(alpha) * x + lit(1 - alpha) * (lPrev + bPrev), 9)
      struct(lNew.as("l"),
        round(lit(beta) * (lNew - lPrev) + lit(1 - beta) * bPrev, 9).as("b"))
    }

    val seed = struct(element_at(col("__ys"), 1).as("l"), lit(0.0).as("b"))
    val rest = slice(col("__ys"), lit(2),
      greatest(size(col("__ys")) - 1, lit(0)))
    collected
      .withColumn("__st", aggregate(rest, seed, step))
      .select(col(keyCol), col("n_obs"),
        round(col("__st.l"), 6).as("level"),
        round(col("__st.b"), 6).as("trend"),
        round(col("__st.l") + lit(horizon.toDouble) * col("__st.b"), 6)
          .as(s"forecast_$horizon"))
  }

  /** [[holtLinear]] with an in-sample backtest: the fold additionally
    * scores each step's ONE-step-ahead prediction l+b against the
    * arriving observation BEFORE updating, accumulating 9-snapped
    * absolute and squared errors — so the output carries `mae`/`rmse`
    * over the n−1 forecastable steps (null for single-point series).
    * The honesty check that belongs next to any forecast: a Holt fit
    * whose one-step RMSE rivals the series' own deviation is noise.
    *
    * Accumulator is a FOUR-field struct (level, trend, Σ|e|, Σe²);
    * the DuckDB oracle must carry it as a 4-element LIST (list_reduce
    * mutates struct accumulators in place — the q7d finding).
    */
  def holtBacktest(
      series: DataFrame, keyCol: String, orderCol: String, valueCol: String,
      alpha: Double = 0.5, beta: Double = 0.25, horizon: Int = 7): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    require(beta > 0 && beta < 1, s"beta must be in (0,1), got $beta")
    require(horizon >= 1, s"horizon must be >= 1, got $horizon")
    exactBinary(alpha, "alpha")
    exactBinary(beta, "beta")

    val collected = series
      .filter(col(valueCol).isNotNull && col(orderCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_obs"),
        array_sort(collect_list(struct(col(orderCol).as("o"),
          col(valueCol).cast("double").as("y")))).as("__seq"))
      .withColumn("__ys", transform(col("__seq"), x => x.getField("y")))

    def step(acc: Column, x: Column): Column = {
      val lPrev = acc.getField("l")
      val bPrev = acc.getField("b")
      val err = x - (lPrev + bPrev)
      val lNew = round(lit(alpha) * x + lit(1 - alpha) * (lPrev + bPrev), 9)
      struct(
        lNew.as("l"),
        round(lit(beta) * (lNew - lPrev) + lit(1 - beta) * bPrev, 9).as("b"),
        round(acc.getField("sae") + round(abs(err), 9), 9).as("sae"),
        round(acc.getField("sse") + round(err * err, 9), 9).as("sse"))
    }

    val seed = struct(element_at(col("__ys"), 1).as("l"), lit(0.0).as("b"),
      lit(0.0).as("sae"), lit(0.0).as("sse"))
    val rest = slice(col("__ys"), lit(2),
      greatest(size(col("__ys")) - 1, lit(0)))
    val m = (col("n_obs") - 1).cast("double")
    collected
      .withColumn("__st", aggregate(rest, seed, step))
      .select(col(keyCol), col("n_obs"),
        round(col("__st.l"), 6).as("level"),
        round(col("__st.b"), 6).as("trend"),
        round(col("__st.l") + lit(horizon.toDouble) * col("__st.b"), 6)
          .as(s"forecast_$horizon"),
        when(col("n_obs") > 1,
          round(col("__st.sae") / m, 6)).as("mae"),
        when(col("n_obs") > 1,
          round(sqrt(col("__st.sse") / m), 6)).as("rmse"))
  }
}

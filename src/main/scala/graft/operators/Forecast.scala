package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Additive Holt–Winters triple exponential smoothing (Winters 1960):
    * [[holtLinear]] plus a `period`-slot seasonal component —
    *
    *   l_t = α·(y_t − s_{t−m}) + (1−α)·(l_{t−1} + b_{t−1})
    *   b_t = β·(l_t − l_{t−1}) + (1−β)·b_{t−1}
    *   s_t = γ·(y_t − l_t) + (1−γ)·s_{t−m}
    *
    * seeded l₁ = y₁, b₁ = 0, seasonals 0 (the components converge within
    * a few cycles; zero seed keeps the fold replayable with no lookahead
    * pass). Forecast: l + h·b + s_{matching slot}.
    *
    * The accumulator is the (2+period)-element vector
    * [l, b, ring…] with the ring ROTATED each step so its head is always
    * the CURRENT step's seasonal — a fixed-shape array rebuild, which is
    * what lets the DuckDB oracle replay it as a pure LIST fold (the q7d
    * struct-mutation finding; a keyed map accumulator would not be
    * replayable). Same 9-snap-per-step, dyadic-parameter, one-row-fold
    * contract and scale shape as [[holtLinear]].
    */
  def holtWinters(
      series: DataFrame, keyCol: String, orderCol: String, valueCol: String,
      alpha: Double = 0.5, beta: Double = 0.25, gamma: Double = 0.25,
      period: Int = 7, horizon: Int = 7): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    require(beta > 0 && beta < 1, s"beta must be in (0,1), got $beta")
    require(gamma > 0 && gamma < 1, s"gamma must be in (0,1), got $gamma")
    require(period >= 2 && period <= 24,
      s"period must be in [2,24], got $period")
    require(horizon >= 1, s"horizon must be >= 1, got $horizon")
    exactBinary(alpha, "alpha")
    exactBinary(beta, "beta")
    exactBinary(gamma, "gamma")

    val collected = series
      .filter(col(valueCol).isNotNull && col(orderCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_obs"),
        array_sort(collect_list(struct(col(orderCol).as("o"),
          col(valueCol).cast("double").as("y")))).as("__seq"))
      .withColumn("__ys", transform(col("__seq"), x => x.getField("y")))

    // acc layout (1-based): [l, b, s_cur, s_next, …, s_cur+period−1]
    def step(acc: Column, x: Column): Column = {
      val l = element_at(acc, 1)
      val b = element_at(acc, 2)
      val sCur = element_at(acc, 3)
      val lNew = round(lit(alpha) * (x - sCur) + lit(1 - alpha) * (l + b), 9)
      val bNew = round(lit(beta) * (lNew - l) + lit(1 - beta) * b, 9)
      val sNew = round(lit(gamma) * (x - lNew) + lit(1 - gamma) * sCur, 9)
      val rotated = (4 to period + 2).map(i => element_at(acc, i))
      array(lNew +: bNew +: rotated :+ sNew: _*)
    }

    val seed = array(element_at(col("__ys"), 1) +:
      Seq.fill(period + 1)(lit(0.0)): _*)
    val rest = slice(col("__ys"), lit(2),
      greatest(size(col("__ys")) - 1, lit(0)))
    // after the last step the ring head is the NEXT step's slot, so the
    // h-step forecast reads ring position (h−1) mod period
    val slot = 3 + ((horizon - 1) % period)
    collected
      .withColumn("__st", aggregate(rest, seed, step))
      .select(col(keyCol), col("n_obs"),
        round(element_at(col("__st"), 1), 6).as("level"),
        round(element_at(col("__st"), 2), 6).as("trend"),
        round(element_at(col("__st"), 3), 6).as("s_next"),
        round(element_at(col("__st"), 1) +
          lit(horizon.toDouble) * element_at(col("__st"), 2) +
          element_at(col("__st"), slot), 6).as(s"forecast_$horizon"))
  }

  /** Multiplicative Holt–Winters: the [[holtWinters]] twin for series
    * whose seasonal swing SCALES with the level (a growing shop's weekend
    * bump grows with it — additive seasonals then under-correct high
    * levels and over-correct low ones). Same rotating-ring fold and
    * 9-snap-per-step contract; the seasonal links are DIVISIONS
    * (x/s_cur, x/l — proven oracle-parity links) and the ring seeds at
    * 1.0 (the multiplicative identity). Requires a strictly positive
    * series — a zero value would zero a seasonal slot and poison later
    * divisions, so the input is filtered to > 0 (document the gap as a
    * missing observation, exactly like nulls).
    * Forecast: (l + h·b) · s_{matching slot}.
    */
  def holtWintersMultiplicative(
      series: DataFrame, keyCol: String, orderCol: String, valueCol: String,
      alpha: Double = 0.5, beta: Double = 0.25, gamma: Double = 0.25,
      period: Int = 7, horizon: Int = 7): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    require(beta > 0 && beta < 1, s"beta must be in (0,1), got $beta")
    require(gamma > 0 && gamma < 1, s"gamma must be in (0,1), got $gamma")
    require(period >= 2 && period <= 24,
      s"period must be in [2,24], got $period")
    require(horizon >= 1, s"horizon must be >= 1, got $horizon")
    exactBinary(alpha, "alpha")
    exactBinary(beta, "beta")
    exactBinary(gamma, "gamma")

    val collected = series
      .filter(col(valueCol).isNotNull && col(orderCol).isNotNull &&
        col(valueCol).cast("double") > 0)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_obs"),
        array_sort(collect_list(struct(col(orderCol).as("o"),
          col(valueCol).cast("double").as("y")))).as("__seq"))
      .withColumn("__ys", transform(col("__seq"), x => x.getField("y")))

    // acc layout (1-based): [l, b, s_cur, s_next, …, s_cur+period−1]
    def step(acc: Column, x: Column): Column = {
      val l = element_at(acc, 1)
      val b = element_at(acc, 2)
      val sCur = element_at(acc, 3)
      val lNew = round(lit(alpha) * (x / sCur) + lit(1 - alpha) * (l + b), 9)
      val bNew = round(lit(beta) * (lNew - l) + lit(1 - beta) * b, 9)
      val sNew = round(lit(gamma) * (x / lNew) + lit(1 - gamma) * sCur, 9)
      val rotated = (4 to period + 2).map(i => element_at(acc, i))
      array(lNew +: bNew +: rotated :+ sNew: _*)
    }

    val seed = array(element_at(col("__ys"), 1) +: lit(0.0) +:
      Seq.fill(period)(lit(1.0)): _*)
    val rest = slice(col("__ys"), lit(2),
      greatest(size(col("__ys")) - 1, lit(0)))
    val slot = 3 + ((horizon - 1) % period)
    collected
      .withColumn("__st", aggregate(rest, seed, step))
      .select(col(keyCol), col("n_obs"),
        round(element_at(col("__st"), 1), 6).as("level"),
        round(element_at(col("__st"), 2), 6).as("trend"),
        round(element_at(col("__st"), 3), 6).as("s_next"),
        round((element_at(col("__st"), 1) +
          lit(horizon.toDouble) * element_at(col("__st"), 2)) *
          element_at(col("__st"), slot), 6).as(s"forecast_$horizon"))
  }

  /** Holt one-step-ahead residual anomalies — the monitor the forecast
    * family exists to feed: the [[holtBacktest]] fold additionally carries
    * every step's 9-snapped residual (the accumulator struct grows an
    * array — per-key state is the series, which the collect_list fold
    * already holds), residual sigma is the backtest RMSE, and a step flags
    * when |resid| > z·sigma. One row per (key, step ≥ 2); keys with a
    * single observation have no one-step-ahead residual and drop out.
    */
  def holtResidualAnomalies(
      series: DataFrame, keyCol: String, orderCol: String, valueCol: String,
      alpha: Double = 0.5, beta: Double = 0.25, z: Double = 3.0): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    require(beta > 0 && beta < 1, s"beta must be in (0,1), got $beta")
    require(z > 0, s"z must be positive, got $z")
    exactBinary(alpha, "alpha")
    exactBinary(beta, "beta")
    exactBinary(z, "z")

    val collected = series
      .filter(col(valueCol).isNotNull && col(orderCol).isNotNull)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_obs"),
        array_sort(collect_list(struct(col(orderCol).as("o"),
          col(valueCol).cast("double").as("y")))).as("__seq"))
      .withColumn("__ys", transform(col("__seq"), x => x.getField("y")))
      .withColumn("__os", transform(col("__seq"), x => x.getField("o")))

    def step(acc: Column, x: Column): Column = {
      val lPrev = acc.getField("l")
      val bPrev = acc.getField("b")
      val err = x - (lPrev + bPrev)
      val lNew = round(lit(alpha) * x + lit(1 - alpha) * (lPrev + bPrev), 9)
      struct(
        lNew.as("l"),
        round(lit(beta) * (lNew - lPrev) + lit(1 - beta) * bPrev, 9).as("b"),
        round(acc.getField("sse") + round(err * err, 9), 9).as("sse"),
        concat(acc.getField("rs"), array(round(err, 9))).as("rs"))
    }

    val seed = struct(element_at(col("__ys"), 1).as("l"), lit(0.0).as("b"),
      lit(0.0).as("sse"), array().cast("array<double>").as("rs"))
    val rest = slice(col("__ys"), lit(2),
      greatest(size(col("__ys")) - 1, lit(0)))
    collected
      .filter(col("n_obs") > 1)
      .withColumn("__st", aggregate(rest, seed, step))
      .withColumn("sigma",
        round(sqrt(col("__st.sse") / (col("n_obs") - 1).cast("double")), 6))
      .select(col(keyCol), col("n_obs"), col("sigma"), col("__os"), col("__ys"),
        posexplode(col("__st.rs")).as(Seq("__pos", "__r")))
      .select(col(keyCol), col("__os").getItem(col("__pos") + 1).as("o"),
        col("__ys").getItem(col("__pos") + 1).as("y"),
        round(col("__r"), 6).as("resid"), col("sigma"),
        (abs(col("__r")) > lit(z) * col("sigma")).as("is_anomaly"))
  }

  /** Split-conformal prediction interval for the Holt one-step forecaster
    * (Vovk et al.; the distribution-free way to put HONEST bands on any
    * point forecaster): the first `calN` one-step-ahead absolute residuals
    * per key are the calibration scores, q̂ = the ⌈(calN+1)·(1−miscoverage)⌉-th
    * smallest of them, and the interval ŷ ± q̂ then covers future points
    * with probability ≥ 1−miscoverage under exchangeability — no
    * distributional assumption, unlike the q88 z·σ gaussian band. The
    * remaining points are the holdout on which the EMPIRICAL coverage is
    * reported, so a broken exchangeability assumption (drift) is visible
    * in the output rather than silently miscovering.
    *
    * Determinism: residuals come from [[holtResidualAnomalies]]'s
    * 9-snapped fold; q̂ is an exact order statistic (rank k computed
    * driver-side in BigDecimal so ceil can't wobble on float
    * representation); coverage is an integer ratio. Scale shape: per-key
    * windows over series-length rows — bounded, parallel across keys.
    */
  def conformalHoltInterval(
      series: DataFrame, keyCol: String, orderCol: String, valueCol: String,
      alpha: Double = 0.5, beta: Double = 0.25,
      calN: Int, miscoverage: Double = 0.2): DataFrame = {
    require(calN >= 1, s"calN must be positive, got $calN")
    require(miscoverage > 0 && miscoverage < 1, s"bad miscoverage $miscoverage")
    val k = (BigDecimal(calN + 1) * (BigDecimal(1) - BigDecimal(miscoverage)))
      .setScale(0, BigDecimal.RoundingMode.CEILING).toInt
    require(k <= calN,
      s"miscoverage $miscoverage too small for calN=$calN (needs rank $k)")
    val r = holtResidualAnomalies(series, keyCol, orderCol, valueCol, alpha, beta)
      .select(col(keyCol), col("o"), abs(col("resid")).as("__ar"))
    val byOrder = Window.partitionBy(keyCol).orderBy(col("o"))
    val pos = r.withColumn("__pos", row_number().over(byOrder))
    val byScore = Window.partitionBy(keyCol).orderBy(col("__ar"), col("o"))
    val qhat = pos.filter(col("__pos") <= calN)
      .withColumn("__rk", row_number().over(byScore))
      .filter(col("__rk") === k)
      .select(col(keyCol), col("__ar").as("q_hat"))
    pos.filter(col("__pos") > calN)
      .join(qhat, Seq(keyCol))
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_test"),
        sum(when(col("__ar") <= col("q_hat"), 1L).otherwise(0L)).as("n_covered"),
        max(col("q_hat")).as("q_hat"))
      .select(col(keyCol), lit(calN).as("n_cal"), col("n_test"),
        col("q_hat"),
        round(col("n_covered").cast("double") / col("n_test").cast("double"), 6)
          .as("coverage"),
        round(lit(2.0) * col("q_hat"), 6).as("width"))
  }

  /** Croston's method (Croston 1972) for INTERMITTENT demand — series
    * that are mostly zero with occasional positive spikes, where plain
    * exponential smoothing decays toward zero between spikes and
    * systematically under-forecasts. Croston smooths two series over the
    * NONZERO demand points only: demand size z and inter-demand interval
    * p, forecasting z/p demand per period; the Syntetos–Boylan
    * approximation (1−α/2)·z/p corrects Croston's positive bias.
    *
    * Convention (pinned for reproducibility): seed z₁ = first size,
    * p seeded with the SECOND point's interval i₂, then fold points
    * 2..n updating z ← α·x + (1−α)z and p ← α·i + (1−α)p — the k=2 step's
    * p-update is idempotent by construction (p₂ = i₂ either way). Keys
    * with fewer than 2 nonzero points have no interval and are omitted.
    *
    * Same q5i/holt ordered-fold recipe: per-key sorted lists, 9-snap per
    * state component per step, dyadic α enforced so the DuckDB
    * list_reduce oracle (LIST accumulator — the q7d finding) walks
    * identical doubles. Scale shape: one groupBy to per-key nonzero-point
    * lists (bounded by the demand-bucket domain per key), fold inside the
    * row, parallel across keys.
    */
  def croston(
      series: DataFrame, keyCol: String, orderCol: String, valueCol: String,
      alpha: Double = 0.5): DataFrame = {
    require(alpha > 0 && alpha < 1, s"alpha must be in (0,1), got $alpha")
    exactBinary(alpha, "alpha")
    val collected = series
      .filter(col(valueCol).isNotNull && col(orderCol).isNotNull &&
        col(valueCol) > 0)
      .groupBy(col(keyCol))
      .agg(count(lit(1)).as("n_points"),
        array_sort(collect_list(struct(col(orderCol).cast("long").as("o"),
          col(valueCol).cast("double").as("y")))).as("__seq"))
      .withColumn("__ds", transform(col("__seq"), x => x.getField("o")))
      .withColumn("__zs", transform(col("__seq"), x => x.getField("y")))

    def step(acc: Column, k: Column): Column = {
      val ki = k.cast("int")
      val z = round(lit(alpha) * element_at(col("__zs"), ki) +
        lit(1 - alpha) * acc.getField("z"), 9)
      val iv = (element_at(col("__ds"), ki) -
        element_at(col("__ds"), ki - 1)).cast("double")
      struct(z.as("z"),
        round(lit(alpha) * iv + lit(1 - alpha) * acc.getField("p"), 9).as("p"))
    }

    val seed = struct(element_at(col("__zs"), 1).as("z"),
      (element_at(col("__ds"), 2) - element_at(col("__ds"), 1))
        .cast("double").as("p"))
    collected
      .filter(col("n_points") >= 2)
      .withColumn("__st",
        aggregate(sequence(lit(2), col("n_points").cast("int")), seed, step))
      .select(col(keyCol), col("n_points"),
        round(col("__st.z"), 6).as("z_level"),
        round(col("__st.p"), 6).as("p_interval"),
        round(col("__st.z") / col("__st.p"), 6).as("croston"),
        round(lit(1 - alpha / 2) * col("__st.z") / col("__st.p"), 6).as("sba"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic statistical diagnostics — the distribution-shape tests a
  * data-quality gate runs before trusting a column: higher moments
  * (skewness/kurtosis), the Gini concentration coefficient, Benford's
  * first-digit law, and series autocorrelation.
  *
  * Spark's native `skewness`/`kurtosis` stream float accumulators whose
  * result depends on partition order; these versions run on EXACT decimal
  * power sums (order-free) with the engine-wide snap discipline, so they
  * are bit-reproducible on any layout and replayable in the oracle.
  */
object Stats {

  /** Per-group n/mean/variance/skewness/excess-kurtosis from exact decimal
    * power sums. Intended for BOUNDED-magnitude values (|x| such that x⁴
    * stays under the 2^53 double↔decimal agreement bound — quantities,
    * ratings, counts; NOT raw monetary amounts, which should be scaled
    * first). Population moments (divide by n), n ≥ 1; variance 0 yields
    * null skew/kurtosis rather than a division blow-up.
    */
  def groupedMoments(
      df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val x = col(valueCol).cast("double")
    def psum(k: Int) = {
      val p = Seq.fill(k)(x).reduce(_ * _)
      sum(p.cast("decimal(38,6)")).as(s"__s$k")
    }
    val agg = df.filter(x.isNotNull)
      .groupBy(col(groupCol))
      .agg(count(lit(1)).as("n"), psum(1), psum(2), psum(3), psum(4))
    val n = col("n").cast("double")
    def s(k: Int) = col(s"__s$k").cast("double")
    val mean = s(1) / n
    val m2 = s(2) / n - mean * mean
    val m3 = s(3) / n - lit(3.0) * mean * (s(2) / n) +
      lit(2.0) * mean * mean * mean
    val m4 = s(4) / n - lit(4.0) * mean * (s(3) / n) +
      lit(6.0) * mean * mean * (s(2) / n) -
      lit(3.0) * mean * mean * mean * mean
    agg.select(col(groupCol), col("n"),
      round(mean, 6).as("mean"),
      round(m2, 6).as("variance"),
      when(m2 > 0, round(m3 / (m2 * sqrt(m2)), 6)).as("skewness"),
      when(m2 > 0, round(m4 / (m2 * m2) - lit(3.0), 6)).as("kurtosis"))
  }

  /** Mergeable per-group moment state: exact decimal power sums — the
    * reason the whole moments pipeline is streaming-ready: merging is
    * plain BigDecimal addition, so any micro-batch split folds to the
    * bit-identical batch table (the Calibration.BinState discipline).
    */
  final case class MomentState(
      n: Long,
      s1: java.math.BigDecimal, s2: java.math.BigDecimal,
      s3: java.math.BigDecimal, s4: java.math.BigDecimal) {
    def merge(o: MomentState): MomentState =
      MomentState(n + o.n, s1.add(o.s1), s2.add(o.s2),
        s3.add(o.s3), s4.add(o.s4))
  }

  /** One micro-batch folded to its per-group moment image (driver state:
    * one 5-scalar record per group). Same filters/casts as
    * [[groupedMoments]].
    */
  def momentsImage(
      df: DataFrame, groupCol: String,
      valueCol: String): Map[String, MomentState] = {
    val x = col(valueCol).cast("double")
    def psum(k: Int) = {
      val p = Seq.fill(k)(x).reduce(_ * _)
      sum(p.cast("decimal(38,6)")).as(s"s$k")
    }
    df.filter(x.isNotNull)
      .groupBy(col(groupCol).cast("string").as("g"))
      .agg(count(lit(1)).as("n"), psum(1), psum(2), psum(3), psum(4))
      .collect()
      .map(r => r.getString(0) -> MomentState(r.getLong(1),
        r.getDecimal(2), r.getDecimal(3), r.getDecimal(4), r.getDecimal(5)))
      .toMap
  }

  /** Pointwise image merge. */
  def mergeMoments(
      a: Map[String, MomentState],
      b: Map[String, MomentState]): Map[String, MomentState] =
    (a.keySet ++ b.keySet).map { k =>
      k -> ((a.get(k), b.get(k)) match {
        case (Some(x), Some(y)) => x.merge(y)
        case (x, y) => x.orElse(y).get
      })
    }.toMap

  /** The accumulated image as [[groupedMoments]]'s output — identical
    * double arithmetic on the exact sums, so streamed ≡ batch
    * bit-for-bit.
    */
  def imageToMoments(
      spark: org.apache.spark.sql.SparkSession,
      img: Map[String, MomentState]): DataFrame = {
    import spark.implicits._
    def r6(x: Double) = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    img.toSeq.sortBy(_._1).map { case (g, st) =>
      val n = st.n.toDouble
      val mean = st.s1.doubleValue() / n
      val m2 = st.s2.doubleValue() / n - mean * mean
      val m3 = st.s3.doubleValue() / n -
        3.0 * mean * (st.s2.doubleValue() / n) + 2.0 * mean * mean * mean
      val m4 = st.s4.doubleValue() / n -
        4.0 * mean * (st.s3.doubleValue() / n) +
        6.0 * mean * mean * (st.s2.doubleValue() / n) -
        3.0 * mean * mean * mean * mean
      (g, st.n, r6(mean), r6(m2),
        if (m2 > 0) Some(r6(m3 / (m2 * math.sqrt(m2)))) else None,
        if (m2 > 0) Some(r6(m4 / (m2 * m2) - 3.0)) else None)
    }.toDF("g", "n", "mean", "variance", "skewness", "kurtosis")
  }

  /** Gini coefficient of the per-key mass distribution (0 = uniform,
    * →1 = one key owns everything): the sorted-rank formula
    * G = 2·Σ i·cᵢ / (n·Σc) − (n+1)/n over counts sorted ascending.
    * Integer-exact numerator; ONE final double expression. The rank
    * window runs over the AGGREGATED key-count table (domain-bounded,
    * the q6d contract), never raw rows.
    */
  def giniOfCounts(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))
    val w = Window.orderBy(col("cnt"), col("key"))
    counts
      .withColumn("__i", row_number().over(w))
      .agg(
        count(lit(1)).as("n_keys"),
        sum(col("cnt")).as("total"),
        sum(col("__i") * col("cnt")).as("__ic"))
      .select(col("n_keys"), col("total"),
        round(
          lit(2.0) * col("__ic") / (col("n_keys") * col("total")) -
            (col("n_keys") + lit(1L)).cast("double") / col("n_keys"),
          6).as("gini"))
  }

  /** Benford first-digit profile of a positive 2-decimal monetary column:
    * observed counts vs N·ln(1+1/d)/ln(10) expectations and the χ²
    * statistic (identical on every row). The first digit derives from the
    * EXACT cents integer (DECIMAL(18,2)·100 → BIGINT → leading digit of
    * the decimal string) — no log10/formatting in the digit path.
    */
  def benfordProfile(df: DataFrame, valueCol: String): DataFrame = {
    val cents = (col(valueCol).cast("decimal(18,2)") * 100).cast("long")
    val digit = substring(cents.cast("string"), 1, 1).cast("int")
    val byDigit = df
      .filter(col(valueCol).isNotNull && col(valueCol) > 0)
      .withColumn("__d", digit)
      .groupBy(col("__d").as("digit"))
      .agg(count(lit(1)).as("n"))
    val tot = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val total = sum(col("n")).over(tot)
    val expected = total.cast("double") *
      (log(lit(1.0) + lit(1.0) / col("digit")) / log(lit(10.0)))
    val term = {
      val diff = col("n").cast("double") - col("expected")
      round(diff * diff / col("expected"), 9)
    }
    byDigit
      .withColumn("expected", expected)
      .withColumn("__t", term)
      .withColumn("chi2",
        round(sum(col("__t").cast("decimal(28,9)")).over(tot)
          .cast("double"), 6))
      .select(col("digit"), col("n"), round(col("expected"), 6).as("expected"),
        col("chi2"))
  }

  /** Per-group OLS trend line from exact decimal cross-sums: slope,
    * intercept (at the group's own x-origin — x is re-based to
    * x − min(x) per group, which both conditions the normal equations
    * and keeps every cross-product inside the double↔decimal agreement
    * bound), and r². Groups with zero x-variance yield nulls. One
    * min-agg + broadcast join + one map-side-combinable sum pass.
    */
  def groupedTrend(
      df: DataFrame, groupCol: String, xCol: String, yCol: String): DataFrame = {
    val xr = col(xCol).cast("double")
    val yr = col(yCol).cast("double")
    val base = df.filter(xr.isNotNull && yr.isNotNull)
      .select(col(groupCol).as("__g"), xr.as("__xr"), yr.as("__y"))
    val mins = base.groupBy("__g").agg(min(col("__xr")).as("__x0"))
    val rebased = base.join(broadcast(mins), "__g")
      .select(col("__g"), (col("__xr") - col("__x0")).as("__x"), col("__y"))
    val agg = rebased.groupBy("__g")
      .agg(count(lit(1)).as("n"),
        sum(col("__x").cast("decimal(38,6)")).as("__sx"),
        sum(col("__y").cast("decimal(38,6)")).as("__sy"),
        sum((col("__x") * col("__y")).cast("decimal(38,6)")).as("__sxy"),
        sum((col("__x") * col("__x")).cast("decimal(38,6)")).as("__sxx"),
        sum((col("__y") * col("__y")).cast("decimal(38,6)")).as("__syy"))
    val n = col("n").cast("double")
    def d(c: String) = col(c).cast("double")
    val mx = d("__sx") / n
    val my = d("__sy") / n
    val cov = d("__sxy") / n - mx * my
    val varx = d("__sxx") / n - mx * mx
    val vary = d("__syy") / n - my * my
    agg.select(col("__g").as(groupCol), col("n"),
      when(varx > 0, round(cov / varx, 6)).as("slope"),
      when(varx > 0, round(my - (cov / varx) * mx, 6)).as("intercept"),
      when(varx > 0 && vary > 0,
        round((cov * cov) / (varx * vary), 6)).as("r2"))
  }

  /** Autocorrelation of an ordered numeric series at lags 1..`maxLag`:
    * standardize with snapped mean/sd (z stays O(1), keeping products
    * inside the decimal agreement bound), then
    * ACF(k) = Σ zᵢ·zᵢ₊ₖ / Σ zᵢ². The lead window runs over the
    * AGGREGATED series table (one row per bucket — caller pre-aggregates),
    * not raw events.
    */
  def autocorrelation(
      series: DataFrame, orderCol: String, valueCol: String,
      maxLag: Int): DataFrame = {
    require(maxLag >= 1, s"maxLag must be >= 1, got $maxLag")
    val v = col(valueCol).cast("double")
    val base = series.filter(v.isNotNull)
      .select(col(orderCol).as("__o"), v.as("__v"))
    val stats = base.agg(
      count(lit(1)).as("__n"),
      sum(col("__v").cast("decimal(28,6)")).as("__s1"),
      sum((col("__v") * col("__v")).cast("decimal(38,6)")).as("__s2"))
      .select(col("__n"),
        round(col("__s1").cast("double") / col("__n"), 9).as("__mean"),
        round(sqrt(
          col("__s2").cast("double") / col("__n") -
            (col("__s1").cast("double") / col("__n")) *
            (col("__s1").cast("double") / col("__n"))), 9).as("__sd"))
    val z = base.crossJoin(broadcast(stats))
      .select(col("__o"),
        round((col("__v") - col("__mean")) / col("__sd"), 9).as("__z"))
    val w = Window.orderBy("__o")
    val withLeads = (1 to maxLag).foldLeft(z) { (d, k) =>
      d.withColumn(s"__z$k", lead(col("__z"), k).over(w))
    }
    val denom = sum((col("__z") * col("__z")).cast("decimal(28,12)"))
    val acfs = (1 to maxLag).map { k =>
      round(
        sum((col("__z") * col(s"__z$k")).cast("decimal(28,12)"))
          .cast("double") /
          denom.cast("double"), 6).as(s"acf_$k")
    }
    withLeads.agg(count(lit(1)).as("n"), acfs: _*)
  }
}

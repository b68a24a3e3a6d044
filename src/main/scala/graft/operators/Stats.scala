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

  /** Lorenz curve of a per-key value distribution — [[giniOfCounts]]'s
    * pointwise companion (WHERE the concentration sits, not just how
    * much): keys sorted ascending by value, bucketed into `k` equal-rank
    * bins (ntile), each bin reporting its value mass and the cumulative
    * value share at its upper edge. Exact decimal value sums; the shares
    * are single proven-parity divisions, 6-rounded.
    *
    * The rank window runs over the per-KEY aggregated table (the q6d
    * contract) — callers pre-aggregate raw rows to (key, value) first.
    * Ties break by key, fully deterministic.
    */
  def lorenzCurve(
      df: DataFrame, keyCol: String, valueCol: String, k: Int): DataFrame = {
    require(k >= 2, s"k must be >= 2, got $k")
    val w = Window.orderBy(col("__v"), col("__k"))
    val all = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val binned = df
      .select(col(keyCol).as("__k"),
        col(valueCol).cast("decimal(18,2)").as("__v"))
      .filter(col("__v").isNotNull)
      .withColumn("bin", ntile(k).over(w).cast("int"))
    binned
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_keys"), sum(col("__v")).as("__bv"))
      .withColumn("__cum", sum(col("__bv"))
        .over(Window.orderBy("bin")
          .rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__tot", sum(col("__bv")).over(all))
      .select(col("bin"), col("n_keys"),
        col("__bv").cast("double").as("bin_value"),
        round(col("__cum").cast("double") / col("__tot").cast("double"), 6)
          .as("cum_value_share"))
  }

  /** Welch's unequal-variance t-test between two groups of a continuous
    * metric — the means-comparison companion to
    * [[Experiment.twoProportionZ]]: t = (m₁−m₂)/√(s₁²/n₁+s₂²/n₂) with
    * the Welch–Satterthwaite degrees of freedom, from exact decimal
    * power sums (SAMPLE variances, n−1). Groups are ordered min/max by
    * label (the struct-fold idiom); output is ONE row with per-group
    * n/mean/var, `t` (6-rounded), `dof` (3-rounded) — null when either
    * group is degenerate (n < 2 or zero variance on both sides).
    * Intended for bounded-magnitude metrics (the [[groupedMoments]]
    * contract).
    */
  def welchTTest(
      df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val g = df.filter(v.isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("grp"), v.as("__v"))
      .groupBy("grp")
      .agg(count(lit(1)).as("__n"),
        sum(col("__v").cast("decimal(38,6)")).as("__s1"),
        sum((col("__v") * col("__v")).cast("decimal(38,6)")).as("__s2"))
    val folded = g
      .agg(min(struct(col("grp"), col("__n"), col("__s1"), col("__s2")))
          .as("__a"),
        max(struct(col("grp"), col("__n"), col("__s1"), col("__s2")))
          .as("__b"))
    def side(p: String, n: Column, s1: Column, s2: Column) = Seq(
      n.as(s"n_$p"),
      round(s1.cast("double") / n, 9).as(s"mean_$p"),
      // sample variance is undefined for singletons — null, and the ANSI
      // (n-1) division must sit INSIDE the guard
      when(n > 1, round((s2.cast("double") -
        s1.cast("double") * s1.cast("double") / n) / (n - lit(1)), 9))
        .as(s"var_$p"))
    val wide = folded.select(
      col("__a.grp").as("group_a") +: col("__b.grp").as("group_b") +:
        (side("a", col("__a.__n").cast("double"), col("__a.__s1"),
          col("__a.__s2")) ++
          side("b", col("__b.__n").cast("double"), col("__b.__s1"),
            col("__b.__s2"))): _*)
    val sa = col("var_a") / col("n_a")
    val sb = col("var_b") / col("n_b")
    val ok = col("n_a") > 1 && col("n_b") > 1 && (sa + sb) > 0
    val t = (col("mean_a") - col("mean_b")) / sqrt(sa + sb)
    val dof = (sa + sb) * (sa + sb) /
      (sa * sa / (col("n_a") - 1) + sb * sb / (col("n_b") - 1))
    wide.select(col("group_a"), col("n_a").cast("long").as("n_a"),
      col("mean_a"), col("var_a"),
      col("group_b"), col("n_b").cast("long").as("n_b"),
      col("mean_b"), col("var_b"),
      when(ok, round(t, 6)).as("t"),
      when(ok, round(dof, 3)).as("dof"))
  }

  /** Mann–Whitney U test (two-sided normal approximation with tie
    * correction) — the rank-based, outlier-proof alternative to
    * [[welchTTest]]: ranks computed over the AGGREGATED distinct-value
    * table (average ranks for ties derive from prefix counts — no
    * per-row rank window, the q5z exact-rank-sum discipline), U₁ from
    * the group-1 rank sum, z = (U₁ − μ)/σ with
    * σ² = n₁n₂/12·((N+1) − Σ(t³−t)/(N(N−1))). All inputs to the final
    * expression are exact integer-derived decimals.
    */
  def mannWhitneyU(
      df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val base = df.filter(v.isNotNull && col(groupCol).isNotNull)
      .select(col(groupCol).as("grp"), v.as("__v"))
    val labels = base.groupBy("grp").agg(count(lit(1)).as("__n"))
      .agg(min(struct(col("grp"), col("__n"))).as("__a"),
        max(struct(col("grp"), col("__n"))).as("__b"))
      .select(col("__a.grp").as("group_a"), col("__a.__n").as("n_a"),
        col("__b.grp").as("group_b"), col("__b.__n").as("n_b"))
    val byValue = base.crossJoin(broadcast(labels))
      .groupBy(col("__v"))
      .agg(sum(when(col("grp") === col("group_a"), 1).otherwise(0))
          .cast("long").as("__ca"),
        count(lit(1)).cast("long").as("__c"))
    val prior = Window.orderBy("__v")
      .rowsBetween(Window.unboundedPreceding, -1)
    val ranked = byValue
      .withColumn("__prior", coalesce(sum(col("__c")).over(prior), lit(0L)))
      // average rank of a tie block: prior + (c+1)/2 — exact in doubles
      .withColumn("__avgrank",
        col("__prior").cast("double") +
          (col("__c") + lit(1L)).cast("double") / lit(2.0))
    val agg = ranked.agg(
      sum((col("__ca").cast("double") * col("__avgrank"))
        .cast("decimal(38,6)")).as("__r1"),
      sum((col("__c") * col("__c") * col("__c") - col("__c"))
        .cast("decimal(38,0)")).as("__ties"))
    val out = agg.crossJoin(broadcast(labels))
    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val bigN = na + nb
    val u1 = col("__r1").cast("double") - na * (na + lit(1.0)) / lit(2.0)
    val mu = na * nb / lit(2.0)
    val sigma2 = na * nb / lit(12.0) *
      ((bigN + lit(1.0)) -
        col("__ties").cast("double") / (bigN * (bigN - lit(1.0))))
    val ok = sigma2 > 0 && col("group_a") =!= col("group_b")
    out.select(col("group_a"), col("n_a"), col("group_b"), col("n_b"),
      round(u1, 3).as("u1"),
      round(na * nb - u1, 3).as("u2"),
      when(ok, round((u1 - mu) / sqrt(sigma2), 6)).as("z"))
  }

  /** CUSUM changepoint scan of an ordered series: cumulative sum of
    * 9-snapped deviations from the (9-snapped) global mean, with the
    * |CUSUM|-argmax flagged — the classic "where did the level shift"
    * monitor (Page 1954). Windows run over the aggregated series table
    * only (caller pre-aggregates, the q6o contract); deviations
    * accumulate through DECIMAL(28,9), flags compare 6-rounded doubles —
    * identical in both engines.
    *
    * Output per point: order, value, `cusum` (6-rounded),
    * `is_changepoint` (true on the max-|CUSUM| row(s)).
    */
  def cusum(
      series: DataFrame, orderCol: String, valueCol: String): DataFrame = {
    val v = col(valueCol).cast("double")
    val base = series.filter(v.isNotNull)
      .select(col(orderCol).as("__o"), v.as("__v"))
    val m = base.agg(
        count(lit(1)).as("__n"),
        sum(col("__v").cast("decimal(28,6)")).as("__s"))
      .select(round(col("__s").cast("double") / col("__n"), 9).as("__mean"))
    val upTo = Window.orderBy("__o")
      .rowsBetween(Window.unboundedPreceding, 0)
    val all = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    base.crossJoin(broadcast(m))
      .withColumn("__d", round(col("__v") - col("__mean"), 9))
      .withColumn("cusum",
        round(sum(col("__d").cast("decimal(28,9)")).over(upTo)
          .cast("double"), 6))
      .withColumn("is_changepoint",
        abs(col("cusum")) === max(abs(col("cusum"))).over(all))
      .select(col("__o").as(orderCol), col("__v").as(valueCol),
        col("cusum"), col("is_changepoint"))
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

  /** Pairwise Pearson correlation matrix over numeric columns in ONE
    * aggregate pass: per-column sums/squares and per-pair product sums
    * ride exact DECIMAL(38,6) (the [[groupedTrend]] recipe), then each
    * pair's r is a fixed double chain over the cast sums — identical in
    * both engines. Long-format output (col_a < col_b), r null when a
    * variance is zero. Rows with ANY null among `cols` are dropped so
    * every pair sees the same n (listwise deletion — the matrix stays
    * positive-semidefinite-consistent).
    */
  def correlationMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, s"need at least two columns, got $cols")
    val vs = cols.map(c => col(c).cast("double"))
    val base = df.filter(vs.map(_.isNotNull).reduce(_ && _))
      .select(cols.zip(vs).map { case (n, v) => v.as(n) }: _*)
    val pairs = for { i <- cols.indices; j <- (i + 1) until cols.size }
      yield (cols(i), cols(j))
    // scratch aliases are keyed by COLUMN INDEX / PAIR INDEX, never by
    // concatenated names: "__sp_${a}_$b" collides for underscore-bearing
    // columns (("x","y_z") and ("x_y","z") both alias __sp_x_y_z)
    val aggs = count(lit(1)).as("n") +:
      (cols.zipWithIndex.flatMap { case (c, i) =>
        Seq(sum(col(c).cast("decimal(38,6)")).as(s"__s_$i"),
          sum((col(c) * col(c)).cast("decimal(38,6)")).as(s"__ss_$i"))
      } ++ pairs.zipWithIndex.map { case ((a, b), pi) =>
        sum((col(a) * col(b)).cast("decimal(38,6)")).as(s"__sp_$pi")
      })
    val one = base.agg(aggs.head, aggs.tail: _*)
    val n = col("n").cast("double")
    def d(name: String) = col(name).cast("double")
    val idx = cols.zipWithIndex.toMap
    val rows = pairs.zipWithIndex.map { case ((a, b), pi) =>
      val (ia, ib) = (idx(a), idx(b))
      val cov = d(s"__sp_$pi") / n - (d(s"__s_$ia") / n) * (d(s"__s_$ib") / n)
      val va = d(s"__ss_$ia") / n - (d(s"__s_$ia") / n) * (d(s"__s_$ia") / n)
      val vb = d(s"__ss_$ib") / n - (d(s"__s_$ib") / n) * (d(s"__s_$ib") / n)
      struct(lit(a).as("col_a"), lit(b).as("col_b"),
        when(va > 0 && vb > 0, round(cov / sqrt(va * vb), 6)).as("r"))
    }
    one.select(col("n"), explode(array(rows: _*)).as("p"))
      .select(col("p.col_a"), col("p.col_b"), col("n"), col("p.r"))
  }

  /** Mutual information between two categorical columns (nats), with the
    * joint and marginal distributions taken over the non-null-pair rows:
    * one map-side groupBy to the (x, y) cell table, marginals and the
    * 6-rounded MI terms via windows over that bounded table, total MI
    * summed through DECIMAL so cross-cell order can't perturb bits.
    */
  def mutualInformation(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val cells = df.select(xCol.as("x"), yCol.as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
      .groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("n_xy"))
    val wx = Window.partitionBy(col("x"))
    val wy = Window.partitionBy(col("y"))
    val all = Window.partitionBy()
    def d(c: Column) = c.cast("double")
    val pxy = d(col("n_xy")) / d(sum(col("n_xy")).over(all))
    val px = d(sum(col("n_xy")).over(wx)) / d(sum(col("n_xy")).over(all))
    val py = d(sum(col("n_xy")).over(wy)) / d(sum(col("n_xy")).over(all))
    val term = round(pxy * log(pxy / (px * py)), 6)
    cells
      .withColumn("p_xy", round(pxy, 6))
      .withColumn("mi_term", term)
      .withColumn("mi_total",
        sum(term.cast("decimal(18,6)")).over(all).cast("double"))
  }

  /** One-row log–log OLS fit (slope/intercept of ln y on ln x) for
    * power-law diagnostics (Heaps, Zipf): both logs and their products
    * snap to the 9-decimal grid and sum through DECIMAL(28,12), so the
    * distributed addition order can't perturb the fit. Rows with x ≤ 0 or
    * y ≤ 0 are dropped (ln pole).
    */
  def loglogFit(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val lx = round(log(xCol.cast("double")), 9)
    val ly = round(log(yCol.cast("double")), 9)
    val base = df.filter(xCol > 0 && yCol > 0)
      .select(lx.as("__x"), ly.as("__y"))
    def dec(c: Column) = sum(c.cast("decimal(28,12)"))
    val agg = base.agg(count(lit(1)).as("n_points"),
      dec(col("__x")).as("__sx"), dec(col("__y")).as("__sy"),
      dec(round(col("__x") * col("__y"), 9)).as("__sxy"),
      dec(round(col("__x") * col("__x"), 9)).as("__sxx"))
    val n = col("n_points").cast("double")
    def d(c: String) = col(c).cast("double")
    val varx = d("__sxx") / n - (d("__sx") / n) * (d("__sx") / n)
    val cov = d("__sxy") / n - (d("__sx") / n) * (d("__sy") / n)
    agg.select(col("n_points"),
      when(varx > 0, round(cov / varx, 6)).as("slope"),
      when(varx > 0,
        round(d("__sy") / n - (cov / varx) * (d("__sx") / n), 6)).as("intercept"))
  }

  /** One-row semi-log OLS fit (slope/intercept of ln y on RAW x) — the
    * exponential-decay estimator (retention half-life, failure rates).
    * Same order-free DECIMAL discipline as [[loglogFit]]; rows with
    * y ≤ 0 or null x are dropped.
    */
  def semiLogFit(df: DataFrame, xCol: Column, yCol: Column): DataFrame = {
    val lx = round(xCol.cast("double"), 9)
    val ly = round(log(yCol.cast("double")), 9)
    val base = df.filter(yCol > 0 && xCol.isNotNull)
      .select(lx.as("__x"), ly.as("__y"))
    def dec(c: Column) = sum(c.cast("decimal(28,12)"))
    val agg = base.agg(count(lit(1)).as("n_points"),
      dec(col("__x")).as("__sx"), dec(col("__y")).as("__sy"),
      dec(round(col("__x") * col("__y"), 9)).as("__sxy"),
      dec(round(col("__x") * col("__x"), 9)).as("__sxx"))
    val n = col("n_points").cast("double")
    def d(c: String) = col(c).cast("double")
    val varx = d("__sxx") / n - (d("__sx") / n) * (d("__sx") / n)
    val cov = d("__sxy") / n - (d("__sx") / n) * (d("__sy") / n)
    agg.select(col("n_points"),
      when(varx > 0, round(cov / varx, 6)).as("slope"),
      when(varx > 0,
        round(d("__sy") / n - (cov / varx) * (d("__sx") / n), 6)).as("intercept"))
  }

  /** Exact weighted quantiles per group: the smallest value whose
    * cumulative weight reaches q/1000 of the group total, one output
    * column per requested per-mille point. The ordered scan rides
    * [[ScaleOps.groupedGlobalRunningSum]] (range-partitioned, balanced
    * regardless of group sizes — a `Window.partitionBy(group)` running
    * sum would serialize a huge group into one reducer), totals come from
    * a map-side-combinable groupBy, and the crossing test is exact
    * DECIMAL arithmetic (`cumw·1000 ≥ q·totw`). `weightCol` must be
    * DECIMAL and non-negative; group values non-null; `tiebreaks` make
    * the within-group order total.
    */
  def weightedQuantiles(df: DataFrame, groupCols: Seq[String],
      valueCol: Column, weightCol: Column, qsPerMille: Seq[Int],
      tiebreaks: Seq[Column]): DataFrame = {
    require(qsPerMille.nonEmpty && qsPerMille.forall(q => q >= 1 && q <= 1000),
      s"per-mille quantiles must be in [1,1000], got $qsPerMille")
    val cum = ScaleOps.groupedGlobalRunningSum(df, groupCols,
      valueCol +: tiebreaks, weightCol, "__cumw")
    val tot = df.groupBy(groupCols.map(col): _*)
      .agg(sum(weightCol).as("__totw"))
    val picks = qsPerMille.map { q =>
      min(when(col("__cumw") * 1000 >= col("__totw") * q, valueCol))
        .as(s"wq_$q")
    }
    cum.join(tot, groupCols)
      .groupBy(groupCols.map(col): _*)
      .agg(picks.head, picks.tail: _*)
  }

  /** Exact ROC-AUC by the rank identity AUC = (Σ_pos avgrank −
    * n₁(n₁+1)/2) / (n₁·n₀), with ties at half credit (the Mann–Whitney
    * convention) — and WITHOUT a global window: ranks come from the
    * distinct-score profile and [[ScaleOps.globalRunningSum]]'s
    * range-partitioned prefix image, so no single reducer ever holds the
    * score column. The whole statistic reduces to integer sums — one
    * double division at the end — so it replays bit-exact.
    *
    * Returns one row: (n_pos, n_neg, auc, gini) with gini = 2·AUC − 1.
    */
  def rocAuc(df: DataFrame, score: Column, label: Column): DataFrame = {
    val base = df.select(score.cast("double").as("s"),
        label.cast("long").as("y"))
      .filter(col("s").isNotNull && col("y").isNotNull)
    val prof = base.groupBy(col("s"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("npos"))
    // inclusive running count over distinct scores ascending; a tied
    // block's average rank is cum_before + (n+1)/2 — kept ×2 in integers
    val run = ScaleOps.globalRunningSum(prof, Seq(col("s")), col("n"), "cum")
    val agg = run.agg(
      sum(col("npos") * (lit(2L) * (col("cum") - col("n")) + col("n") + lit(1L)))
        .as("s2"),
      sum(col("npos")).as("n1"), sum(col("n")).as("nt"))
    val aucRaw = (col("s2") - col("n1") * (col("n1") + lit(1L))).cast("double") /
      (lit(2L) * col("n1") * (col("nt") - col("n1"))).cast("double")
    agg.select(col("n1").as("n_pos"), (col("nt") - col("n1")).as("n_neg"),
      round(aucRaw, 6).as("auc"),
      round(lit(2.0) * aucRaw - lit(1.0), 6).as("gini"))
  }

  /** Energy-distance two-sample test (Székely & Rizzo): for samples
    * X (n) and Y (m),
    *
    *   E = 2·Σ|x−y|/(n·m) − Σ|x−x'|/n² − Σ|y−y'|/m²,
    *   T = (n·m/(n+m))·E
    *
    * — zero iff the distributions match, consistent against EVERY
    * alternative (location, scale, shape), where KS (q6u) keys on the
    * single largest CDF gap and rank tests (q7o) see location only. No
    * distributional assumption, no kernel bandwidth: |·| distances on
    * 2-decimal values stay in EXACT DECIMAL arithmetic end to end, so the
    * pair sums are integers-in-decimal and the statistic replays
    * hash-exact (an RBF-kernel MMD would need exp — not oracle-safe).
    *
    * Contract: `a`/`b` are bounded AUDIT PANELS (the qa8 discipline —
    * the pair joins are quadratic in the panel, thin deterministically
    * upstream); `idCol` is the unique within-sample tiebreak. One row:
    * (n_a, n_b, e_dist, t_stat).
    */
  def energyDistance(a: DataFrame, b: DataFrame,
      idCol: String, valueCol: String): DataFrame = {
    def panel(df: DataFrame, p: String) = df
      .filter(col(valueCol).isNotNull)
      .select(col(idCol).as(s"${p}_id"),
        col(valueCol).cast("decimal(18,2)").as(s"${p}_v"))
    val ax = panel(a, "ax"); val ay = panel(a, "ay")
    val bx = panel(b, "bx"); val by = panel(b, "by")
    val cross = ax.crossJoin(bx)
      .agg(sum(abs(col("ax_v") - col("bx_v"))).as("sab"))
    val within = (p: DataFrame, q: DataFrame, pi: String, qi: String,
        pv: String, qv: String, out: String) =>
      p.join(q, col(pi) < col(qi))
        .agg((sum(abs(col(pv) - col(qv))) * lit(2)).as(out))
    val saa = within(ax, ay, "ax_id", "ay_id", "ax_v", "ay_v", "saa")
    val sbb = within(bx, by, "bx_id", "by_id", "bx_v", "by_v", "sbb")
    val counts = ax.agg(count(lit(1)).as("n_a"))
      .crossJoin(bx.agg(count(lit(1)).as("n_b")))
    val na = col("n_a").cast("double"); val nb = col("n_b").cast("double")
    val e = lit(2.0) * col("sab").cast("double") / (na * nb) -
      coalesce(col("saa").cast("double"), lit(0.0)) / (na * na) -
      coalesce(col("sbb").cast("double"), lit(0.0)) / (nb * nb)
    counts.crossJoin(broadcast(cross))
      .crossJoin(broadcast(saa)).crossJoin(broadcast(sbb))
      .select(col("n_a"), col("n_b"),
        round(e, 6).as("e_dist"),
        round(na * nb / (na + nb) * e, 6).as("t_stat"))
  }
}

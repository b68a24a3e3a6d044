package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A/B-experiment readouts — the decision-grade statistics a product
  * analytics stack computes over an assignment column: CUPED
  * variance-reduced means (Deng, Xu, Kohavi & Walker 2013, public
  * literature) and the classic pooled two-proportion z-test. Both are
  * pure aggregate algebra (division/sqrt parity is proven engine-wide),
  * so they carry exact DuckDB oracles.
  */
object Experiment {

  /** CUPED-adjusted experiment metric. Input: one row per unit with the
    * experiment arm, a PRE-period covariate (computed before assignment,
    * identical across arms in expectation) and the POST-period metric.
    *
    * θ = cov(pre, post)/var(pre) and the pre-mean are estimated POOLED
    * across arms (the standard single-θ CUPED variant), both snapped to
    * the 9-grid; each unit's adjusted metric
    * `adj = round(post − θ·(pre − mean_pre), 9)` then aggregates per arm
    * through exact decimal power sums.
    *
    * Output, one row per arm: `arm`, `n`, `mean_post`, `mean_adjusted`
    * (equal-in-expectation to mean_post; equal pre-means make them close),
    * `var_post`, `var_adjusted`, `var_reduction` (1 − var_adj/var_post,
    * the CUPED win — ρ² in the limit). Intended for bounded-magnitude
    * metrics (the [[Stats.groupedMoments]] contract: x² inside the
    * double↔decimal agreement bound).
    *
    * Scale shape: one global 1-row aggregate (broadcast back — never a
    * driver round-trip inside the plan), one map-side-combinable per-arm
    * aggregate. No windows, no per-unit state.
    */
  def cuped(
      df: DataFrame, armCol: String, preCol: String,
      postCol: String): DataFrame = {
    val pre = col(preCol).cast("double")
    val post = col(postCol).cast("double")
    val base = df
      .filter(pre.isNotNull && post.isNotNull && col(armCol).isNotNull)
      .select(col(armCol).as("arm"), pre.as("__pre"), post.as("__post"))

    val pooled = base.agg(
        count(lit(1)).as("__n"),
        sum(col("__pre").cast("decimal(38,6)")).as("__sx"),
        sum(col("__post").cast("decimal(38,6)")).as("__sy"),
        sum((col("__pre") * col("__post")).cast("decimal(38,6)")).as("__sxy"),
        sum((col("__pre") * col("__pre")).cast("decimal(38,6)")).as("__sxx"))
      .select(
        round(col("__sx").cast("double") / col("__n"), 9).as("__mean_pre"),
        round(
          (col("__sxy").cast("double") / col("__n") -
            (col("__sx").cast("double") / col("__n")) *
              (col("__sy").cast("double") / col("__n"))) /
            (col("__sxx").cast("double") / col("__n") -
              (col("__sx").cast("double") / col("__n")) *
                (col("__sx").cast("double") / col("__n"))), 9).as("__theta"))

    val adj = round(
      col("__post") - col("__theta") * (col("__pre") - col("__mean_pre")), 9)

    val perArm = base.crossJoin(broadcast(pooled))
      .withColumn("__adj", adj)
      .groupBy(col("arm"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("__post").cast("decimal(38,6)")).as("__sp"),
        sum((col("__post") * col("__post")).cast("decimal(38,6)")).as("__spp"),
        sum(col("__adj").cast("decimal(38,9)")).as("__sa"),
        sum((col("__adj") * col("__adj")).cast("decimal(38,9)")).as("__saa"))

    val n = col("n").cast("double")
    val mp = col("__sp").cast("double") / n
    val ma = col("__sa").cast("double") / n
    val vp = col("__spp").cast("double") / n - mp * mp
    val va = col("__saa").cast("double") / n - ma * ma
    perArm.select(col("arm"), col("n"),
      round(mp, 6).as("mean_post"),
      round(ma, 6).as("mean_adjusted"),
      round(vp, 6).as("var_post"),
      round(va, 6).as("var_adjusted"),
      when(vp > 0, round(lit(1.0) - va / vp, 6)).as("var_reduction"))
  }

  /** Pooled two-proportion z-test over a unit-level conversion flag.
    * Arms are ordered: `arm_a` = smallest arm label, `arm_b` = largest
    * (designed for two-arm experiments; with more arms it compares the
    * extremes — callers filter first). Output is ONE row: per-arm n/x/p,
    * `z = (p_a − p_b)/sqrt(p̂(1−p̂)(1/n_a+1/n_b))` (6-rounded) and the
    * |z| > 1.96 two-sided 5% flag on the rounded statistic.
    *
    * Scale shape: one map-side-combinable groupBy(arm), then a 2-row →
    * 1-row struct-min/max fold (the LPA winner-selection idiom) — no
    * windows, no collect.
    */
  def twoProportionZ(
      df: DataFrame, armCol: String, convCol: String): DataFrame = {
    val g = df
      .filter(col(armCol).isNotNull && col(convCol).isNotNull)
      .select(col(armCol).as("arm"), col(convCol).cast("int").as("__c"))
      .groupBy("arm")
      .agg(count(lit(1)).as("__n"), sum(col("__c")).cast("long").as("__x"))

    val folded = g
      .agg(min(struct(col("arm"), col("__n"), col("__x"))).as("__a"),
        max(struct(col("arm"), col("__n"), col("__x"))).as("__b"))
      .select(
        col("__a.arm").as("arm_a"), col("__a.__n").as("n_a"),
        col("__a.__x").as("x_a"),
        col("__b.arm").as("arm_b"), col("__b.__n").as("n_b"),
        col("__b.__x").as("x_b"))

    val na = col("n_a").cast("double")
    val nb = col("n_b").cast("double")
    val pa = col("x_a").cast("double") / na
    val pb = col("x_b").cast("double") / nb
    val pPool = (col("x_a") + col("x_b")).cast("double") / (na + nb)
    // degenerate pools (everyone or no one converts) have zero pooled
    // variance — z is undefined, surfaced as null rather than an ANSI
    // divide-by-zero abort
    val denomOk = pPool > 0 && pPool < 1
    val z = (pa - pb) /
      sqrt(pPool * (lit(1.0) - pPool) * (lit(1.0) / na + lit(1.0) / nb))
    folded.select(
      col("arm_a"), col("n_a"), col("x_a"),
      col("arm_b"), col("n_b"), col("x_b"),
      round(pa, 6).as("p_a"), round(pb, 6).as("p_b"),
      when(denomOk, round(z, 6)).as("z"),
      when(denomOk, abs(round(z, 6)) > lit(1.96)).as("significant_5pct"))
  }

  /** Minimum detectable effect for the two-arm conversion experiment —
    * the "how long must this test run" planning number: with baseline
    * rate p̂ (pooled across arms) and per-arm size n (conservatively the
    * SMALLER arm), the normal-approximation MDE at significance α and
    * power 1−β is (z_{α/2} + z_β)·√(2·p̂(1−p̂)/n). Defaults are the
    * standard 5% two-sided / 80% power quantiles, passed as EXPLICIT
    * double literals (1.959964, 0.841621) so the oracle replays the
    * identical arithmetic — no inverse-normal evaluation anywhere.
    *
    * Output: one row — `n_a`, `n_b`, `n_eff`, `x_pooled`, `p_base`,
    * `mde_abs`, `mde_rel` (both 6-rounded; null when p̂ is degenerate).
    * Same aggregate shape as [[twoProportionZ]]: windowless, no collect.
    */
  def minDetectableEffect(
      df: DataFrame, armCol: String, convCol: String,
      zAlpha: Double = 1.959964, zBeta: Double = 0.841621): DataFrame = {
    val g = df
      .filter(col(armCol).isNotNull && col(convCol).isNotNull)
      .select(col(armCol).as("arm"), col(convCol).cast("int").as("__c"))
      .groupBy("arm")
      .agg(count(lit(1)).as("__n"), sum(col("__c")).cast("long").as("__x"))
    val folded = g
      .agg(min(struct(col("arm"), col("__n"), col("__x"))).as("__a"),
        max(struct(col("arm"), col("__n"), col("__x"))).as("__b"))
      .select(
        col("__a.__n").as("n_a"), col("__b.__n").as("n_b"),
        (col("__a.__x") + col("__b.__x")).as("x_pooled"))
    val nEff = least(col("n_a"), col("n_b"))
    val p = col("x_pooled").cast("double") /
      (col("n_a") + col("n_b")).cast("double")
    val ok = p > 0 && p < 1
    val mde = lit(zAlpha + zBeta) *
      sqrt(lit(2.0) * p * (lit(1.0) - p) / nEff.cast("double"))
    folded.select(col("n_a"), col("n_b"), nEff.as("n_eff"), col("x_pooled"),
      round(p, 6).as("p_base"),
      when(ok, round(mde, 6)).as("mde_abs"),
      when(ok, round(mde / p, 6)).as("mde_rel"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-to-event (survival) analysis — the "how long until a user
  * converts / a document gets re-crawled / a job fails" estimator family,
  * with right-censoring handled properly instead of the naive
  * mean-of-observed-durations (which is biased low the moment any subject
  * is still alive at the observation boundary).
  *
  * Estimators (Kaplan & Meier 1958; Nelson 1972 / Aalen 1978 — public
  * literature):
  *
  *  - Nelson–Aalen cumulative hazard H(t) = Σ_{tᵢ≤t} dᵢ/nᵢ — a SUM of
  *    per-time hazard increments, so it rides the engine's exact-decimal
  *    accumulation discipline directly (each dᵢ/nᵢ is one proven-parity
  *    double division snapped to the 9-grid, summed through
  *    DECIMAL(28,9)).
  *  - Kaplan–Meier survival in LOG space: ln S(t) = Σ_{tᵢ≤t} ln(1−dᵢ/nᵢ).
  *    The product form Π(1−dᵢ/nᵢ) would need either exp (NOT
  *    cross-engine-reproducible — libm last-ulp differences) or an ordered
  *    cumulative product; the log form is again a plain snapped sum, and
  *    ln/division parity is proven engine-wide (q3y/q38/q4d). Callers
  *    wanting S(t) exponentiate downstream (display precision, not join
  *    keys). Times where everyone at risk dies (dᵢ = nᵢ) have
  *    ln 0 = −∞: from that point on `km_log_survival` is null, flagged
  *    rather than propagated as a non-replayable infinity.
  *
  * Scale shape: ONE groupBy collapses raw subjects to the distinct-time
  * life table (bounded by the duration domain — days/hours buckets, the
  * q6d aggregated-table window contract), after which every window runs
  * over that aggregated table. n_at_risk comes from the standard
  * "total − prior exits" prefix identity, never a per-subject scan per
  * time point.
  */
object Survival {

  /** Life table over per-subject (duration, event) rows: `durationCol`
    * (non-negative integer time bucket; e.g. days to conversion) and
    * `eventCol` (1 = event observed, 0 = right-censored at that time).
    *
    * Output, one row per distinct duration ascending: `t`, `n_risk`,
    * `d_events`, `c_censored`, `hazard` (dᵢ/nᵢ, 9-snapped),
    * `na_cum_hazard` (Nelson–Aalen, 6-rounded), `km_log_survival`
    * (ln S(t), 6-rounded; null once any earlier time exhausted the risk
    * set). Follows the standard convention that deaths at t precede
    * censorings at t (both are in the time-t risk set).
    */
  def lifeTable(df: DataFrame, durationCol: String, eventCol: String): DataFrame = {
    val byT = df
      .select(col(durationCol).cast("long").as("t"),
        col(eventCol).cast("int").as("__e"))
      .filter(col("t").isNotNull && col("t") >= 0 && col("__e").isNotNull)
      .groupBy("t")
      .agg(sum(col("__e")).cast("long").as("d_events"),
        sum(lit(1) - col("__e")).cast("long").as("c_censored"))

    // windows over the AGGREGATED life table only (duration-domain-bounded)
    val upTo = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val prior = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val all = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)

    val exits = col("d_events") + col("c_censored")
    val nRisk = sum(exits).over(all) - coalesce(sum(exits).over(prior), lit(0L))

    val d = col("d_events").cast("double")
    val n = col("n_risk").cast("double")
    val hazard = round(d / n, 9)
    // ln(1 - d/n) only while the risk set survives the time point
    val lnTerm = when(col("d_events") < col("n_risk"),
      round(log(lit(1.0) - d / n), 9))
    val exhaustedSoFar =
      sum(when(col("d_events") >= col("n_risk"), 1).otherwise(0)).over(upTo)

    byT
      .withColumn("n_risk", nRisk)
      .withColumn("hazard", hazard)
      .withColumn("__ln", lnTerm)
      .withColumn("na_cum_hazard",
        round(sum(col("hazard").cast("decimal(28,9)")).over(upTo)
          .cast("double"), 6))
      .withColumn("km_log_survival",
        when(exhaustedSoFar === 0,
          round(sum(col("__ln").cast("decimal(28,9)")).over(upTo)
            .cast("double"), 6)))
      .select(col("t"), col("n_risk"), col("d_events"), col("c_censored"),
        col("hazard"), col("na_cum_hazard"), col("km_log_survival"))
  }

  /** Two-group log-rank test (Mantel 1966) — "do these two cohorts have
    * the same survival curve?", the censoring-correct alternative to a
    * t-test on observed durations. At each distinct event time t the
    * observed group-A deaths d_A are compared to the hypergeometric
    * expectation E_A = d·n_A/n given the at-risk split, with variance
    * V_t = d·(n_A/n)·(n_B/n)·(n−d)/(n−1); the statistic is
    * z = Σ(d_A−E_A)/√ΣV_t (χ² = z²). Group A is the MIN group label
    * (deterministic, no caller ordering contract).
    *
    * Reproducibility: E and (d_A−E_A) terms are 9-snapped doubles summed
    * through DECIMAL(28,9); V terms 12-snapped through DECIMAL(28,12) —
    * division/sqrt-only links. Scale shape: ONE groupBy collapses
    * subjects to the per-time two-group life table, prefix-identity
    * windows run over that aggregated (duration-domain-bounded) table
    * only; the final reduction is a scalar aggregate.
    */
  def logRank(df: DataFrame, durationCol: String, eventCol: String,
      groupCol: String): DataFrame = {
    val base = df
      .select(col(durationCol).cast("long").as("t"),
        col(eventCol).cast("int").as("__e"), col(groupCol).as("__g"))
      .filter(col("t").isNotNull && col("t") >= 0 &&
        col("__e").isNotNull && col("__g").isNotNull)
    val gA = base.agg(min(col("__g")).as("__gA"))
    val byT = base.crossJoin(broadcast(gA))
      .groupBy("t")
      .agg(
        sum(when(col("__g") === col("__gA"), col("__e")).otherwise(lit(0)))
          .cast("long").as("d1"),
        sum(when(col("__g") === col("__gA"), lit(1)).otherwise(lit(0)))
          .cast("long").as("x1"),
        sum(col("__e")).cast("long").as("d"),
        count(lit(1)).as("x"))

    val prior = Window.orderBy("t")
      .rowsBetween(Window.unboundedPreceding, -1)
    val all = Window.partitionBy(lit(1))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    val n1 = sum(col("x1")).over(all) -
      coalesce(sum(col("x1")).over(prior), lit(0L))
    val n = sum(col("x")).over(all) -
      coalesce(sum(col("x")).over(prior), lit(0L))

    val terms = byT
      .withColumn("n1", n1)
      .withColumn("n", n)
      .withColumn("e1",
        round(col("d").cast("double") * col("n1").cast("double") /
          col("n").cast("double"), 9))
      .withColumn("oe",
        round(col("d1").cast("double") - col("e1"), 9)
          .cast("decimal(28,9)"))
      .withColumn("vt",
        when(col("n") > 1,
          round(col("d").cast("double") *
            (col("n1").cast("double") / col("n").cast("double")) *
            ((col("n") - col("n1")).cast("double") / col("n").cast("double")) *
            ((col("n") - col("d")).cast("double") /
              (col("n") - 1).cast("double")), 12))
          .cast("decimal(28,12)"))

    terms.agg(
        count(lit(1)).as("n_times"),
        sum(col("d1")).as("deaths_a"),
        sum(col("d") - col("d1")).as("deaths_b"),
        sum(col("oe")).as("oe_sum"),
        sum(col("vt")).as("v_sum"))
      .select(col("n_times"), col("deaths_a"), col("deaths_b"),
        round(col("oe_sum").cast("double"), 6).as("o_minus_e"),
        round(col("v_sum").cast("double"), 6).as("variance"),
        round(col("oe_sum").cast("double") /
          sqrt(col("v_sum").cast("double")), 6).as("z"),
        round(col("oe_sum").cast("double") * col("oe_sum").cast("double") /
          col("v_sum").cast("double"), 6).as("chi2"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-step funnel analysis: how many users completed step 1, then step
  * 2 STRICTLY AFTER their first step-1 completion, then step 3 after that —
  * the classic conversion query (signup → activation → purchase).
  *
  * Shape: one filtered aggregate per step over that step's event sliver,
  * each joined to the previous step's per-user completion time (a
  * users-sized frame; the join strategy is left to Catalyst — broadcast
  * when it fits, shuffle join at billions of users). Each step frame is
  * localCheckpoint-ed, so K steps = K passes, not K² lineage replays; no
  * per-user event-list collection, no window over the whole event stream,
  * so a power user with 10⁸ events costs the same as anyone else
  * (min-aggregates combine map-side).
  *
  * "Strictly after" uses the first (minimum) completion of the previous
  * step — the standard earliest-completion funnel. `maxGapMs` bounds each
  * step-to-step gap (the conversion window that makes a funnel a funnel —
  * unbounded, any long-lived user eventually "converts"). Re-orderable
  * ties are impossible by construction (pure min/count aggregates).
  */
object Funnel {

  /** Per-user earliest completion time of each step, in order. Returns one
    * frame per step: (userCol, __t) — frame i contains only users who
    * reached step i (within `maxGapMs` of step i−1 when bounded).
    */
  def stepCompletions(
      events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      steps: Seq[String], maxGapMs: Option[Long] = None): Seq[DataFrame] = {
    require(steps.nonEmpty, "need at least one funnel step")
    require(maxGapMs.forall(_ > 0), s"maxGapMs must be positive, got $maxGapMs")
    val frames = Seq.newBuilder[DataFrame]
    var prev: Option[DataFrame] = None
    steps.foreach { step =>
      val slice = events.filter(col(typeCol) === step)
        .select(col(userCol), col(tsCol))
      val reached = prev match {
        case None =>
          slice.groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
        case Some(p) =>
          val inWindow = maxGapMs match {
            case Some(g) => col(tsCol) > col("__prev") &&
              col(tsCol) <= col("__prev") + g
            case None => col(tsCol) > col("__prev")
          }
          // no broadcast() hint: it is MANDATORY (AQE cannot demote it),
          // and at billions of users the per-user frame exceeds the 8 GB
          // broadcast limit — let Catalyst pick broadcast vs shuffle by size
          slice
            .join(p.withColumnRenamed("__t", "__prev"), Seq(userCol))
            .filter(inWindow)
            .groupBy(col(userCol)).agg(min(col(tsCol)).as("__t"))
      }
      // localCheckpoint: frame i is reused as frame i+1's build side AND in
      // the counts union — without truncation, K steps replay each other's
      // lineage (K(K+1)/2 event scans instead of K)
      val materialized = reached.localCheckpoint()
      frames += materialized
      prev = Some(materialized)
    }
    frames.result()
  }

  /** The funnel report: (step_idx, step, n_users), strictly ordered. */
  def stepCounts(
      events: DataFrame, userCol: String, typeCol: String, tsCol: String,
      steps: Seq[String], maxGapMs: Option[Long] = None): DataFrame =
    stepCompletions(events, userCol, typeCol, tsCol, steps, maxGapMs).zipWithIndex
      .map { case (df, i) =>
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(i + 1).as("step_idx"), lit(steps(i)).as("step"),
            col("n_users"))
      }
      .reduce(_ unionByName _)
      .orderBy(col("step_idx"))

  /** Cohort retention matrix: users grouped by their FIRST-activity day
    * (the cohort), counted on each later day-offset they were active —
    * the other classic event analytic next to funnels and sessions.
    * Output: (cohort_day, day_offset, n_users), day 0 = cohort size.
    *
    * Two aggregates and a broadcast join of the users-sized cohort frame:
    * per-user first day, per-(user, day) distinct activity, offset
    * subtraction, then a count-distinct per cell. No window over the
    * event stream; cells are bounded by users × active-day span.
    */
  def retention(
      events: DataFrame, userCol: String, tsCol: String,
      dayMs: Long = 86400000L): DataFrame = {
    require(dayMs > 0, s"dayMs must be positive, got $dayMs (div 0 is NULL, not an error)")
    // exact integer FLOOR division, staged through a fixed column name so
    // the user-supplied column is never interpolated into SQL text — double
    // division + cast could misround at day boundaries. Spark's `div` alone
    // truncates toward zero while DuckDB's `//` floors, so pre-1970
    // (negative epoch-ms) events would bucket one day late; subtracting the
    // non-negative pmod remainder first makes `div` exact, hence a true
    // floor on both engines.
    val days = events
      .select(col(userCol), col(tsCol).as("__ts"))
      .select(col(userCol),
        expr(s"(__ts - pmod(__ts, $dayMs)) div $dayMs").as("__day"))
      .distinct()
    val cohorts = days.groupBy(col(userCol)).agg(min(col("__day")).as("__cohort"))
    // plain count: `days` is distinct per (user, day) and a cell's day is
    // cohort + offset, so each user contributes at most one row per cell —
    // countDistinct would pay the distinct-aggregate path for nothing.
    // No broadcast hint (same reason as the funnel): size-based choice.
    days.join(cohorts, Seq(userCol))
      .groupBy(col("__cohort").as("cohort_day"),
        (col("__day") - col("__cohort")).as("day_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_day"), col("day_offset"))
  }

  /** First/last-touch attribution: each conversion joined to the touch
    * events of the same key within `lookbackMs` BEFORE it, reduced to the
    * earliest and latest touch plus the touch count. Conversions with no
    * in-window touch survive with null attribution (left join, not a
    * silent drop).
    *
    * Shape at scale: [[RangeJoin.within]] buckets time so the
    * touch×conversion pairing is an equi-join bounded by the lookback
    * window (never a time-cross-product), and the first/last pick is a
    * map-side-combinable `min/max(struct(ts, id, type))` aggregate — not
    * a per-conversion window — so a viral conversion with millions of
    * in-window touches partial-aggregates in every map task (the q4j
    * de-skew rule applied at birth).
    *
    * @param touches     (keyCols, touchTs epoch-ms, touchId unique,
    *                    touchType) candidate attribution events
    * @param conversions (keyCols, convTs epoch-ms, convId unique)
    */
  def touchAttribution(
      touches: DataFrame, conversions: DataFrame, keyCols: Seq[String],
      touchTs: String, touchId: String, touchType: String,
      convTs: String, convId: String, lookbackMs: Long): DataFrame = {
    val t = touches.select(
      (keyCols.map(col) :+ col(touchTs).as("__tt") :+
        col(touchId).as("__tid") :+ col(touchType).as("__ttype")): _*)
    val c = conversions.select(
      (keyCols.map(col) :+ col(convTs).as("__ct") :+
        col(convId).as("__cid")): _*)
    // touch.ts ∈ [conv.ts − lookback, conv.ts]  ⇔  conv.ts ∈ [touch.ts,
    // touch.ts + lookback] — the within() orientation with touches left
    val joined = RangeJoin.within(t, c, keyCols, "__tt", "__ct", lookbackMs)
    val att = joined
      .groupBy((keyCols :+ "r___cid").map(col): _*)
      .agg(
        count(lit(1)).as("n_touches"),
        min(struct(col("__tt"), col("__tid"), col("__ttype"))).as("__f"),
        max(struct(col("__tt"), col("__tid"), col("__ttype"))).as("__l"))
      .select(
        (keyCols.map(col) :+ col("r___cid").as("__cid") :+
          col("n_touches") :+
          col("__f.__ttype").as("first_touch_type") :+
          col("__f.__tt").as("first_touch_ms") :+
          col("__l.__ttype").as("last_touch_type") :+
          col("__l.__tt").as("last_touch_ms")): _*)
    c.join(att, keyCols :+ "__cid", "left")
      .select(
        (keyCols.map(col) :+ col("__cid").as(convId) :+
          col("__ct").as(convTs) :+
          coalesce(col("n_touches"), lit(0L)).as("n_touches") :+
          col("first_touch_type") :+ col("first_touch_ms") :+
          col("last_touch_type") :+ col("last_touch_ms")): _*)
  }
}

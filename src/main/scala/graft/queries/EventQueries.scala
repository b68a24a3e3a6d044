package graft.queries

import graft.Tables
import graft.operators.{AsOfJoin, Drift, Funnel, Sessionize}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream analytics (the case/alert north star): as-of enrichment,
  * sessionization, inter-event deltas, tumbling windows, table stats,
  * exact percentiles. All over the `events`/TPC-H tables with exact
  * DuckDB oracles.
  */
object EventQueries {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .withColumn("ts_ms", unix_millis(col("ts")))

  val defs: Map[String, Q] = Map(

    // As-of join: each purchase enriched with the user's most recent
    // prior-or-simultaneous view event.
    "q40_asof_enrich" -> Q(
      fn = (s, dir) => {
        val e = ev(s, dir)
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("event_id"), col("ts_ms"))
        val views = e.filter(col("event_type") === "view")
          .select(col("user_id"), col("event_id"), col("ts_ms"),
            col("event_id").as("view_event_id"), col("ts_ms").as("view_ts_ms"))
        AsOfJoin.asOf(purchases, views, Seq("user_id"), "ts_ms", "event_id",
            payload = Seq("view_event_id", "view_ts_ms"))
          .select(col("event_id"), col("user_id"), col("ts_ms"),
            col("__asof.view_event_id").as("view_event_id"),
            col("__asof.view_ts_ms").as("view_ts_ms"))
          .orderBy(col("event_id"))
      },
      oracle = Some("""
        WITH u AS (
          SELECT user_id, event_id, epoch_ms(ts) AS ts_ms,
                 CASE WHEN event_type = 'view' THEN 0 ELSE 1 END AS side,
                 event_type,
                 CASE WHEN event_type = 'view' THEN event_id END AS v_id,
                 CASE WHEN event_type = 'view' THEN epoch_ms(ts) END AS v_ts
          FROM events WHERE event_type IN ('view', 'purchase')),
        w AS (
          SELECT *,
                 last_value(v_id IGNORE NULLS) OVER (PARTITION BY user_id
                   ORDER BY ts_ms, side, event_id
                   ROWS UNBOUNDED PRECEDING) AS view_event_id,
                 last_value(v_ts IGNORE NULLS) OVER (PARTITION BY user_id
                   ORDER BY ts_ms, side, event_id
                   ROWS UNBOUNDED PRECEDING) AS view_ts_ms
          FROM u)
        SELECT event_id, user_id, ts_ms, view_event_id, view_ts_ms
        FROM w WHERE event_type = 'purchase' ORDER BY event_id"""),
      headline = true),

    // Sessionization: 30-minute inactivity gap, per-session rollup.
    "q41_sessions" -> Q(
      fn = (s, dir) => {
        val sessionized = Sessionize.byGap(
          ev(s, dir).select(col("user_id"), col("event_id"), col("ts_ms"), col("value")),
          Seq("user_id"), col("ts_ms"), col("event_id"), gapMs = 1800000L)
        Sessionize.sessionStats(sessionized, Seq("user_id"), col("ts_ms"), col("value"))
          .orderBy(col("user_id"), col("session_seq"))
      },
      oracle = Some("""
        WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, value FROM events),
        s AS (
          SELECT *, CASE WHEN prev IS NULL OR ts_ms - prev > 1800000 THEN 1 ELSE 0 END AS st
          FROM (SELECT *, lag(ts_ms) OVER (PARTITION BY user_id
                  ORDER BY ts_ms, event_id) AS prev FROM e)),
        g AS (
          SELECT *, SUM(st) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                  ROWS UNBOUNDED PRECEDING) AS session_seq
          FROM s)
        SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
               MIN(ts_ms) AS session_start, MAX(ts_ms) AS session_end,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS session_value
        FROM g GROUP BY user_id, session_seq ORDER BY user_id, session_seq"""),
      headline = true),

    // Ordered-step funnel, hash-exact: users completing view → click →
    // purchase in strict temporal order, each step within a 1-DAY window
    // of the user's first completion of the previous one (unbounded, the
    // sparse fixture converts everyone — the window makes the funnel
    // discriminate: 150 → 60 → 25 at sf0.01). K cheap per-step
    // aggregates, no per-user event collection.
    "q48_funnel" -> Q(
      fn = (s, dir) =>
        Funnel.stepCounts(ev(s, dir), "user_id", "event_type", "ts_ms",
          Seq("view", "click", "purchase"), maxGapMs = Some(86400000L)),
      oracle = Some("""
        WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
        s1 AS (SELECT user_id, MIN(ts_ms) AS t FROM e
               WHERE event_type = 'view' GROUP BY user_id),
        s2 AS (SELECT e.user_id, MIN(e.ts_ms) AS t FROM e JOIN s1 USING (user_id)
               WHERE e.event_type = 'click' AND e.ts_ms > s1.t
                 AND e.ts_ms <= s1.t + 86400000 GROUP BY e.user_id),
        s3 AS (SELECT e.user_id, MIN(e.ts_ms) AS t FROM e JOIN s2 USING (user_id)
               WHERE e.event_type = 'purchase' AND e.ts_ms > s2.t
                 AND e.ts_ms <= s2.t + 86400000 GROUP BY e.user_id)
        SELECT * FROM (VALUES
          (1, 'view', (SELECT CAST(COUNT(*) AS BIGINT) FROM s1)),
          (2, 'click', (SELECT CAST(COUNT(*) AS BIGINT) FROM s2)),
          (3, 'purchase', (SELECT CAST(COUNT(*) AS BIGINT) FROM s3)))
          t(step_idx, step, n_users)
        ORDER BY step_idx""")),

    // Cohort retention matrix, hash-exact: users bucketed by first-activity
    // day, counted per later active day-offset. Integer day arithmetic on
    // epoch-ms; DuckDB replays with the same integer division.
    "q4a_retention" -> Q(
      fn = (s, dir) =>
        Funnel.retention(ev(s, dir), "user_id", "ts_ms"),
      oracle = Some("""
        WITH d AS (
          SELECT DISTINCT user_id,
                 CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day
          FROM events),
        c AS (SELECT user_id, MIN(day) AS cohort FROM d GROUP BY user_id)
        SELECT c.cohort AS cohort_day, d.day - c.cohort AS day_offset,
               CAST(COUNT(DISTINCT d.user_id) AS BIGINT) AS n_users
        FROM d JOIN c USING (user_id)
        GROUP BY cohort_day, day_offset
        ORDER BY cohort_day, day_offset""")),

    // Inter-event deltas (lag) + next-event lookahead (lead).
    "q42_event_deltas" -> Q(
      fn = (s, dir) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts_ms"), col("event_id"))
        ev(s, dir)
          .select(col("user_id"), col("event_id"), col("ts_ms"), col("event_type"))
          .withColumn("gap_ms", col("ts_ms") - lag(col("ts_ms"), 1).over(w))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .orderBy(col("user_id"), col("ts_ms"), col("event_id"))
      },
      oracle = Some("""
        SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type,
               epoch_ms(ts) - lag(epoch_ms(ts)) OVER (PARTITION BY user_id
                 ORDER BY epoch_ms(ts), event_id) AS gap_ms,
               lead(event_type) OVER (PARTITION BY user_id
                 ORDER BY epoch_ms(ts), event_id) AS next_type
        FROM events ORDER BY user_id, ts_ms, event_id""")),

    // Tumbling 1-hour windows (batch twin of the streaming windowed agg).
    "q5i_ema_features" -> Q(
      // Per-user exponential moving average of event values (α = 0.2, zero
      // seed) — the classic sequential feature-engineering fold, hash-exact
      // across engines because BOTH walk the identical ordered fold with a
      // per-step 9-decimal snap (the q4b grid recipe applied inside an
      // aggregate HOF / list_reduce): y ← round(0.2·x + 0.8·y, 9) over
      // events ordered by (ts, event_id). Per-user state is the ordered
      // value list — bounded by user activity, grouped not windowed.
      fn = (s, dir) => {
        val e = ev(s, dir)
          .filter(col("value").isNotNull)
          .select(col("user_id"), col("ts_ms"), col("event_id"),
            col("value").cast("double").as("v"))
        e.groupBy("user_id")
          .agg(count(lit(1)).as("n_events"),
            array_sort(collect_list(struct(col("ts_ms"), col("event_id"),
              col("v")))).as("__seq"))
          .withColumn("ema", round(aggregate(col("__seq"), lit(0.0),
            (acc, x) => round(lit(0.2) * x.getField("v") + lit(0.8) * acc, 9)), 6))
          .select(col("user_id"), col("n_events"), col("ema"))
          .orderBy(col("user_id"))
      },
      oracle = Some("""
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
               ROUND(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list(CAST(value AS DOUBLE) ORDER BY epoch_ms(ts), event_id)),
                 (acc, x) -> ROUND(CAST(0.2 AS DOUBLE) * x
                             + CAST(0.8 AS DOUBLE) * acc, 9)), 6) AS ema
        FROM events WHERE value IS NOT NULL
        GROUP BY user_id ORDER BY user_id""")),

    // SCD2 history build: each user's event_type stream collapsed into
    // validity intervals [valid_from, valid_to) — one row per distinct
    // consecutive state, lead() closing each interval, open interval =
    // current row. Two windows over one partitioning (single Exchange).
    "q5q_scd2_history" -> Q(
      fn = (s, dir) => {
        val e = ev(s, dir)
          .select(col("user_id"), col("ts_ms"), col("event_id"),
            col("event_type"))
        graft.operators.Scd.scd2(e, "user_id", "ts_ms", "event_id",
            Seq("event_type"))
          .select(col("user_id"), col("event_type").as("state"),
            col("valid_from").as("valid_from_ms"),
            col("valid_to").as("valid_to_ms"),
            col("is_current"), col("event_id"))
          .orderBy(col("user_id"), col("valid_from_ms"), col("event_id"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id, epoch_ms(ts) AS ts_ms, event_id, event_type,
                 lag(event_type) OVER w AS prev_type,
                 lag(event_id) OVER w AS prev_id
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)),
        o AS (
          SELECT user_id, ts_ms, event_id, event_type FROM e
          WHERE prev_id IS NULL OR prev_type IS DISTINCT FROM event_type),
        f AS (
          SELECT user_id, event_type AS state, ts_ms AS valid_from_ms,
                 lead(ts_ms) OVER (PARTITION BY user_id
                   ORDER BY ts_ms, event_id) AS valid_to_ms,
                 event_id
          FROM o)
        SELECT user_id, state, valid_from_ms, valid_to_ms,
               valid_to_ms IS NULL AS is_current, event_id
        FROM f ORDER BY user_id, valid_from_ms, event_id""")),

    // Gap-fill + linear interpolation: each user's hourly value series
    // densified onto its full [first, last] hour grid, missing hours
    // interpolated between bracketing observations. Observed values are
    // exact DECIMAL sums; interpolated values are the identical double
    // expression on both engines, snapped to 6 decimals.
    "q5t_gap_fill" -> Q(
      fn = (s, dir) => {
        val hourly = ev(s, dir)
          .filter(col("value").isNotNull)
          .withColumn("hb", expr("ts_ms div 3600000"))
          .groupBy(col("user_id"), col("hb"))
          .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("v"))
        graft.operators.Resample.gapFillLinear(hourly, "user_id", "hb", "v")
          .select(col("user_id"), col("hb"), col("value"), col("filled"))
          .orderBy(col("user_id"), col("hb"))
      },
      oracle = Some("""
        WITH obs AS (
          SELECT user_id, epoch_ms(ts) // 3600000 AS hb,
                 CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
          FROM events WHERE value IS NOT NULL
          GROUP BY 1, 2),
        span AS (
          SELECT user_id, MIN(hb) AS lo, MAX(hb) AS hi FROM obs GROUP BY 1),
        grid AS (
          SELECT user_id, unnest(generate_series(lo, hi)) AS hb FROM span),
        j AS (
          SELECT g.user_id, g.hb, o.v FROM grid g
          LEFT JOIN obs o ON g.user_id = o.user_id AND g.hb = o.hb),
        w AS (
          SELECT user_id, hb, v,
                 last_value(v IGNORE NULLS) OVER wb AS pv,
                 last_value(CASE WHEN v IS NOT NULL THEN hb END IGNORE NULLS)
                   OVER wb AS pb,
                 first_value(v IGNORE NULLS) OVER wa AS nv,
                 first_value(CASE WHEN v IS NOT NULL THEN hb END IGNORE NULLS)
                   OVER wa AS nb
          FROM j
          WINDOW wb AS (PARTITION BY user_id ORDER BY hb
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wa AS (PARTITION BY user_id ORDER BY hb
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
        SELECT user_id, hb,
               CASE WHEN v IS NOT NULL THEN v
                    ELSE FLOOR((pv + (nv - pv) *
                      (CAST(hb - pb AS DOUBLE) / CAST(nb - pb AS DOUBLE)))
                      * 1e6 + CAST(0.5 AS DOUBLE)) / 1e6
               END AS value,
               v IS NULL AS filled
        FROM w ORDER BY user_id, hb""")),

    // LOCF densification (q5t's causal sibling): missing hours carry the
    // last observed value forward — exact copies, no float contract; the
    // variant a streaming pipeline can maintain incrementally.
    "q6r_gap_fill_locf" -> Q(
      fn = (s, dir) => {
        val hourly = ev(s, dir)
          .filter(col("value").isNotNull)
          .withColumn("hb", expr("ts_ms div 3600000"))
          .groupBy(col("user_id"), col("hb"))
          .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("v"))
        graft.operators.Resample.gapFillLocf(hourly, "user_id", "hb", "v")
          .select(col("user_id"), col("hb"), col("value"), col("filled"))
          .orderBy(col("user_id"), col("hb"))
      },
      oracle = Some("""
        WITH obs AS (
          SELECT user_id, epoch_ms(ts) // 3600000 AS hb,
                 CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
          FROM events WHERE value IS NOT NULL
          GROUP BY 1, 2),
        span AS (
          SELECT user_id, MIN(hb) AS lo, MAX(hb) AS hi FROM obs GROUP BY 1),
        grid AS (
          SELECT user_id, unnest(generate_series(lo, hi)) AS hb FROM span),
        j AS (
          SELECT g.user_id, g.hb, o.v FROM grid g
          LEFT JOIN obs o ON g.user_id = o.user_id AND g.hb = o.hb)
        SELECT user_id, hb,
               last_value(v IGNORE NULLS) OVER (PARTITION BY user_id
                 ORDER BY hb ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS value,
               v IS NULL AS filled
        FROM j ORDER BY user_id, hb""")),

    // Rolling features over the gap-filled hourly grid (q5t composed with
    // a 24-bucket trailing window): on a dense grid a ROWS frame equals a
    // RANGE frame, so "trailing 24 rows" genuinely means "trailing 24
    // hours". Mean sums through DECIMAL(18,6) (exact for the grid's
    // 6-decimal values) with the floor-based half-up snap — trailing
    // means of decimal values land on exact midpoints where engines'
    // ROUND tie rules diverge.
    "q5w_rolling_features" -> Q(
      fn = (s, dir) => {
        val hourly = ev(s, dir)
          .filter(col("value").isNotNull)
          .withColumn("hb", expr("ts_ms div 3600000"))
          .groupBy(col("user_id"), col("hb"))
          .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("v"))
        val dense = graft.operators.Resample.gapFillLinear(
          hourly, "user_id", "hb", "v")
        graft.operators.Resample.rollingStats(
            dense, "user_id", "hb", "value", nBuckets = 24)
          .select(col("user_id"), col("hb"), col("value"), col("roll_n"),
            col("roll_mean"), col("roll_min"), col("roll_max"))
          .orderBy(col("user_id"), col("hb"))
      },
      oracle = Some("""
        WITH obs AS (
          SELECT user_id, epoch_ms(ts) // 3600000 AS hb,
                 CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
          FROM events WHERE value IS NOT NULL
          GROUP BY 1, 2),
        span AS (
          SELECT user_id, MIN(hb) AS lo, MAX(hb) AS hi FROM obs GROUP BY 1),
        grid AS (
          SELECT user_id, unnest(generate_series(lo, hi)) AS hb FROM span),
        j AS (
          SELECT g.user_id, g.hb, o.v FROM grid g
          LEFT JOIN obs o ON g.user_id = o.user_id AND g.hb = o.hb),
        w AS (
          SELECT user_id, hb, v,
                 last_value(v IGNORE NULLS) OVER wb AS pv,
                 last_value(CASE WHEN v IS NOT NULL THEN hb END IGNORE NULLS)
                   OVER wb AS pb,
                 first_value(v IGNORE NULLS) OVER wa AS nv,
                 first_value(CASE WHEN v IS NOT NULL THEN hb END IGNORE NULLS)
                   OVER wa AS nb
          FROM j
          WINDOW wb AS (PARTITION BY user_id ORDER BY hb
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wa AS (PARTITION BY user_id ORDER BY hb
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)),
        filled AS (
          SELECT user_id, hb,
                 CASE WHEN v IS NOT NULL THEN v
                      ELSE FLOOR((pv + (nv - pv) *
                        (CAST(hb - pb AS DOUBLE) / CAST(nb - pb AS DOUBLE)))
                        * 1e6 + CAST(0.5 AS DOUBLE)) / 1e6
                 END AS value
          FROM w)
        SELECT user_id, hb, value,
               COUNT(*) OVER r AS roll_n,
               FLOOR((CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER r AS DOUBLE)
                      / COUNT(*) OVER r) * 1e6 + CAST(0.5 AS DOUBLE)) / 1e6
                 AS roll_mean,
               MIN(value) OVER r AS roll_min,
               MAX(value) OVER r AS roll_max
        FROM filled
        WINDOW r AS (PARTITION BY user_id ORDER BY hb
               ROWS BETWEEN 23 PRECEDING AND CURRENT ROW)
        ORDER BY user_id, hb""")),

    // First/last-touch attribution: each purchase attributed to the
    // earliest and latest view/click of the same user in the trailing 24 h.
    // The touch×purchase pairing is the bucketed interval join (q4u's
    // RangeJoin — equi-join on (user, time-bucket), never a cross
    // product); the first/last pick is a map-side-combinable
    // min/max(struct) aggregate, not a per-conversion window.
    "q5x_touch_attribution" -> Q(
      fn = (s, dir) => {
        val e = ev(s, dir)
        val touches = e
          .filter(col("event_type").isin("view", "click"))
          .select(col("user_id"), col("ts_ms"), col("event_id"),
            col("event_type"))
        val conv = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts_ms"), col("event_id"))
        graft.operators.Funnel.touchAttribution(
            touches, conv, Seq("user_id"),
            touchTs = "ts_ms", touchId = "event_id", touchType = "event_type",
            convTs = "ts_ms", convId = "event_id", lookbackMs = 86400000L)
          .orderBy(col("event_id"))
      },
      oracle = Some("""
        WITH t AS (
          SELECT user_id, epoch_ms(ts) AS tt, event_id AS tid,
                 event_type AS ttype
          FROM events WHERE event_type IN ('view', 'click')),
        p AS (
          SELECT user_id, epoch_ms(ts) AS ct, event_id AS cid
          FROM events WHERE event_type = 'purchase'),
        j AS (
          SELECT p.user_id, p.cid, t.tt, t.tid, t.ttype
          FROM p JOIN t ON p.user_id = t.user_id
                       AND t.tt >= p.ct - 86400000 AND t.tt <= p.ct),
        r AS (
          SELECT *,
                 ROW_NUMBER() OVER (PARTITION BY user_id, cid
                   ORDER BY tt, tid) AS rf,
                 ROW_NUMBER() OVER (PARTITION BY user_id, cid
                   ORDER BY tt DESC, tid DESC) AS rl,
                 COUNT(*) OVER (PARTITION BY user_id, cid) AS nt
          FROM j),
        f AS (SELECT user_id, cid, ttype AS first_touch_type,
                     tt AS first_touch_ms, nt
              FROM r WHERE rf = 1),
        l AS (SELECT user_id, cid, ttype AS last_touch_type,
                     tt AS last_touch_ms
              FROM r WHERE rl = 1)
        SELECT p.user_id, p.cid AS event_id, p.ct AS ts_ms,
               CAST(COALESCE(f.nt, 0) AS BIGINT) AS n_touches,
               f.first_touch_type, f.first_touch_ms,
               l.last_touch_type, l.last_touch_ms
        FROM p LEFT JOIN f USING (user_id, cid)
               LEFT JOIN l USING (user_id, cid)
        ORDER BY event_id""")),

    // Markov next-event transition matrix: per-user ordered event pairs
    // via lead(), counts per (from, to), row-normalized probabilities.
    // The probability window runs over the AGGREGATED 5×5 matrix, not
    // raw events.
    "q6b_markov_transitions" -> Q(
      fn = (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts_ms"), col("event_id"))
        val tr = ev(s, dir)
          .select(col("user_id"), col("ts_ms"), col("event_id"),
            col("event_type"))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .filter(col("next_type").isNotNull)
        val counts = tr
          .groupBy(col("event_type").as("from_type"),
            col("next_type").as("to_type"))
          .agg(count(lit(1)).as("n"))
        val wf = Window.partitionBy("from_type")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        counts
          .withColumn("p",
            round(col("n").cast("double") / sum(col("n")).over(wf), 6))
          .orderBy(col("from_type"), col("to_type"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id, epoch_ms(ts) AS ts_ms, event_id, event_type,
                 lead(event_type) OVER (PARTITION BY user_id
                   ORDER BY epoch_ms(ts), event_id) AS next_type
          FROM events),
        c AS (
          SELECT event_type AS from_type, next_type AS to_type,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM e WHERE next_type IS NOT NULL GROUP BY 1, 2)
        SELECT from_type, to_type, n,
               ROUND(CAST(n AS DOUBLE) /
                 SUM(n) OVER (PARTITION BY from_type), 6) AS p
        FROM c ORDER BY from_type, to_type""")),

    // Join-key skew diagnostic: the 10 heaviest user_ids with corpus
    // share plus distribution-wide n_keys/total/Shannon-entropy summary
    // columns (−p·ln p terms on the 9-grid, DECIMAL(28,9) accumulation —
    // the q3j surprisal recipe, order-free).
    "q6d_key_skew" -> Q(
      fn = (s, dir) =>
        graft.operators.Profile.keySkew(ev(s, dir), "user_id", topK = 10)
          .orderBy(col("cnt").desc, col("user_id")),
      oracle = Some("""
        WITH c AS (
          SELECT user_id AS key, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM events GROUP BY 1),
        t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS tt FROM c),
        s AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
                 CAST(MAX(tt) AS BIGINT) AS total,
                 ROUND(CAST(SUM(CAST(ROUND(
                   (-(CAST(cnt AS DOUBLE) / CAST(tt AS DOUBLE)))
                   * ln(CAST(cnt AS DOUBLE) / CAST(tt AS DOUBLE)), 9)
                   AS DECIMAL(28,9))) AS DOUBLE), 6) AS entropy
          FROM c CROSS JOIN t)
        SELECT c.key AS user_id, c.cnt,
               ROUND(CAST(c.cnt AS DOUBLE) / s.total, 6) AS share,
               s.n_keys, s.total, s.entropy
        FROM c CROSS JOIN s
        ORDER BY c.cnt DESC, user_id LIMIT 10""")),

    // SCD2 consumption (q5q composed with q40's as-of machinery): the
    // state each probe event's user was in AT THAT MOMENT — the
    // effective-dated dimension lookup every warehouse join against SCD2
    // history performs. Change-open rows sort before probes at equal
    // (ts, id), so a probe that IS the change event sees its own new
    // state — the half-open interval contract.
    "q6e_state_at_event" -> Q(
      fn = (s, dir) => {
        val e = ev(s, dir)
        val hist = graft.operators.Scd.scd2(
          e.select(col("user_id"), col("ts_ms"), col("event_id"),
            col("event_type")),
          "user_id", "ts_ms", "event_id", Seq("event_type"))
        val opens = hist.select(col("user_id"),
          col("valid_from").as("ts_ms"), col("event_id"),
          col("event_type").as("state"),
          col("valid_from").as("state_since"))
        val probes = e.filter(col("event_id") % 7 === 0)
          .select(col("user_id"), col("ts_ms"), col("event_id"))
        graft.operators.AsOfJoin.asOf(probes, opens, Seq("user_id"),
            "ts_ms", "event_id", payload = Seq("state", "state_since"))
          .select(col("event_id"), col("user_id"), col("ts_ms"),
            col("__asof.state").as("state"),
            col("__asof.state_since").as("state_since_ms"))
          .orderBy(col("event_id"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id, epoch_ms(ts) AS ts_ms, event_id, event_type,
                 lag(event_type) OVER w AS prev_type,
                 lag(event_id) OVER w AS prev_id
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id)),
        o AS (
          SELECT user_id, ts_ms, event_id, event_type FROM e
          WHERE prev_id IS NULL OR prev_type IS DISTINCT FROM event_type),
        u AS (
          SELECT user_id, ts_ms, event_id, 0 AS side,
                 event_type AS state, ts_ms AS since
          FROM o
          UNION ALL
          SELECT user_id, epoch_ms(ts), event_id, 1,
                 CAST(NULL AS VARCHAR), CAST(NULL AS BIGINT)
          FROM events WHERE event_id % 7 = 0),
        w AS (
          SELECT *, last_value(state IGNORE NULLS) OVER win AS st,
                 last_value(since IGNORE NULLS) OVER win AS ss
          FROM u
          WINDOW win AS (PARTITION BY user_id ORDER BY ts_ms, side, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT event_id, user_id, ts_ms, st AS state, ss AS state_since_ms
        FROM w WHERE side = 1 ORDER BY event_id""")),

    // Hour-of-day latency-curve percentiles per event type (the ops
    // dashboard classic): exact interpolated p50/p95 (q45 parity) over
    // engine-neutral integer hour buckets.
    "q6h_hourly_percentiles" -> Q(
      fn = (s, dir) =>
        ev(s, dir)
          .filter(col("value").isNotNull)
          .withColumn("hod", (expr("ts_ms div 3600000") % 24).cast("int"))
          .groupBy(col("event_type"), col("hod"))
          .agg(count(lit(1)).as("n"),
            expr("percentile(value, 0.5)").as("p50"),
            expr("percentile(value, 0.95)").as("p95"))
          .orderBy(col("event_type"), col("hod")),
      oracle = Some("""
        SELECT event_type,
               CAST((epoch_ms(ts) // 3600000) % 24 AS INT) AS hod,
               CAST(COUNT(*) AS BIGINT) AS n,
               quantile_cont(value, 0.5) AS p50,
               quantile_cont(value, 0.95) AS p95
        FROM events WHERE value IS NOT NULL
        GROUP BY 1, 2 ORDER BY event_type, hod""")),

    // MAD-based robust outlier profile per event type: median and median
    // absolute deviation (both exact interpolated percentiles — q45
    // parity), outliers = |v − med| > 3·MAD. Three linear passes, 5-row
    // broadcast stats between them; no window over raw events.
    "q6i_mad_outliers" -> Q(
      fn = (s, dir) => {
        val e = ev(s, dir).filter(col("value").isNotNull)
          .select(col("event_type"), col("value").cast("double").as("v"))
        val med = e.groupBy("event_type")
          .agg(expr("percentile(v, 0.5)").as("med"))
        val withMed = e.join(broadcast(med), "event_type")
        val mad = withMed.groupBy("event_type")
          .agg(expr("percentile(abs(v - med), 0.5)").as("mad"))
        withMed.join(broadcast(mad), "event_type")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            max(col("med")).as("med"),
            max(col("mad")).as("mad"),
            sum(when(abs(col("v") - col("med")) > lit(3.0) * col("mad"), 1L)
              .otherwise(0L)).as("n_outliers"))
          .orderBy(col("event_type"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT event_type, CAST(value AS DOUBLE) AS v FROM events
          WHERE value IS NOT NULL),
        m AS (
          SELECT event_type, quantile_cont(v, 0.5) AS med
          FROM e GROUP BY 1),
        d AS (
          SELECT e.event_type, e.v, m.med FROM e JOIN m USING (event_type)),
        md AS (
          SELECT event_type, quantile_cont(abs(v - med), 0.5) AS mad
          FROM d GROUP BY 1)
        SELECT d.event_type, CAST(COUNT(*) AS BIGINT) AS n,
               MAX(d.med) AS med, MAX(md.mad) AS mad,
               CAST(SUM(CASE WHEN abs(d.v - d.med) >
                 CAST(3 AS DOUBLE) * md.mad THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_outliers
        FROM d JOIN md USING (event_type)
        GROUP BY 1 ORDER BY event_type""")),

    // Sequential pattern mining (lightweight): the 20 most common 3-step
    // event paths across users — lead(1)/lead(2) over one per-user
    // ordering, then a plain count. String keys, integer counts: parity
    // is structural.
    "q6j_top_paths" -> Q(
      fn = (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts_ms"), col("event_id"))
        ev(s, dir)
          .select(col("user_id"), col("ts_ms"), col("event_id"),
            col("event_type"))
          .withColumn("t2", lead(col("event_type"), 1).over(w))
          .withColumn("t3", lead(col("event_type"), 2).over(w))
          .filter(col("t3").isNotNull)
          .select(concat_ws(">", col("event_type"), col("t2"), col("t3"))
            .as("path"))
          .groupBy("path").agg(count(lit(1)).as("n"))
          .orderBy(col("n").desc, col("path"))
          .limit(20)
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id, event_type,
                 lead(event_type, 1) OVER w AS t2,
                 lead(event_type, 2) OVER w AS t3
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts), event_id))
        SELECT concat_ws('>', event_type, t2, t3) AS path,
               CAST(COUNT(*) AS BIGINT) AS n
        FROM e WHERE t3 IS NOT NULL
        GROUP BY 1 ORDER BY n DESC, path LIMIT 20""")),

    // Time-to-convert distribution: per user, first signup → first
    // subsequent purchase; one-row summary with exact interpolated delay
    // percentiles (q45 parity) and the unconverted count.
    "q6k_conversion_latency" -> Q(
      fn = (s, dir) => {
        val e = ev(s, dir)
        val su = e.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min(col("ts_ms")).as("s"))
        val delays = e.filter(col("event_type") === "purchase")
          .join(broadcast(su), "user_id")
          .filter(col("ts_ms") >= col("s"))
          .groupBy(col("user_id"), col("s"))
          .agg(min(col("ts_ms")).as("p"))
          .select((col("p") - col("s")).as("delay_ms"))
        val converted = delays.agg(
          count(lit(1)).as("n_converted"),
          expr("percentile(delay_ms, 0.5)").as("p50_ms"),
          expr("percentile(delay_ms, 0.9)").as("p90_ms"),
          max(col("delay_ms")).as("max_ms"))
        su.agg(count(lit(1)).as("n_signups")).crossJoin(converted)
          .select(col("n_signups"), col("n_converted"),
            (col("n_signups") - col("n_converted")).as("n_unconverted"),
            col("p50_ms"), col("p90_ms"), col("max_ms"))
      },
      oracle = Some("""
        WITH su AS (
          SELECT user_id, MIN(epoch_ms(ts)) AS s FROM events
          WHERE event_type = 'signup' GROUP BY 1),
        d AS (
          SELECT e.user_id, MIN(epoch_ms(e.ts)) - MAX(su.s) AS delay_ms
          FROM events e JOIN su ON e.user_id = su.user_id
          WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) >= su.s
          GROUP BY e.user_id),
        c AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_converted,
                 quantile_cont(delay_ms, 0.5) AS p50_ms,
                 quantile_cont(delay_ms, 0.9) AS p90_ms,
                 CAST(MAX(delay_ms) AS BIGINT) AS max_ms
          FROM d),
        t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_signups FROM su)
        SELECT t.n_signups, c.n_converted,
               t.n_signups - c.n_converted AS n_unconverted,
               c.p50_ms, c.p90_ms, c.max_ms
        FROM t, c""")),

    // Gini concentration of per-user event mass: integer-exact sorted-rank
    // numerator over the aggregated key-count table, one final double
    // expression — the companion number to q6d's entropy.
    "q6m_gini" -> Q(
      fn = (s, dir) =>
        graft.operators.Stats.giniOfCounts(ev(s, dir), "user_id"),
      oracle = Some("""
        WITH c AS (
          SELECT user_id AS key, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM events GROUP BY 1),
        r AS (SELECT key, cnt,
                     CAST(ROW_NUMBER() OVER (ORDER BY cnt, key) AS BIGINT) AS i
              FROM c)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
               CAST(SUM(cnt) AS BIGINT) AS total,
               ROUND(CAST(2 AS DOUBLE) * SUM(i * cnt)
                       / (COUNT(*) * SUM(cnt))
                     - CAST(COUNT(*) + 1 AS DOUBLE) / COUNT(*), 6) AS gini
        FROM r""")),

    // Series autocorrelation at lags 1-3 over the global hourly value
    // series: standardize with 9-snapped mean/sd (z stays O(1), products
    // inside the decimal agreement bound), ACF = Σz·z₊ₖ / Σz². The lead
    // window runs over the aggregated hourly table, not raw events.
    "q6o_autocorrelation" -> Q(
      fn = (s, dir) => {
        val hourly = ev(s, dir)
          .filter(col("value").isNotNull)
          .withColumn("hb", expr("ts_ms div 3600000"))
          .groupBy("hb")
          .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("v"))
        graft.operators.Stats.autocorrelation(hourly, "hb", "v", maxLag = 3)
      },
      oracle = Some("""
        WITH h AS (
          SELECT epoch_ms(ts) // 3600000 AS hb,
                 CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
          FROM events WHERE value IS NOT NULL GROUP BY 1),
        st AS (
          SELECT ROUND(CAST(SUM(CAST(v AS DECIMAL(28,6))) AS DOUBLE)
                   / COUNT(*), 9) AS m,
                 ROUND(SQRT(CAST(SUM(CAST(v*v AS DECIMAL(38,6))) AS DOUBLE)
                     / COUNT(*)
                   - (CAST(SUM(CAST(v AS DECIMAL(28,6))) AS DOUBLE)/COUNT(*))
                   * (CAST(SUM(CAST(v AS DECIMAL(28,6))) AS DOUBLE)/COUNT(*))),
                   9) AS sd
          FROM h),
        z AS (SELECT hb, ROUND((v - st.m) / st.sd, 9) AS z FROM h, st),
        l AS (SELECT z,
                     lead(z, 1) OVER (ORDER BY hb) AS z1,
                     lead(z, 2) OVER (ORDER BY hb) AS z2,
                     lead(z, 3) OVER (ORDER BY hb) AS z3
              FROM z)
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(CAST(SUM(CAST(z*z1 AS DECIMAL(28,12))) AS DOUBLE)
                 / CAST(SUM(CAST(z*z AS DECIMAL(28,12))) AS DOUBLE), 6) AS acf_1,
               ROUND(CAST(SUM(CAST(z*z2 AS DECIMAL(28,12))) AS DOUBLE)
                 / CAST(SUM(CAST(z*z AS DECIMAL(28,12))) AS DOUBLE), 6) AS acf_2,
               ROUND(CAST(SUM(CAST(z*z3 AS DECIMAL(28,12))) AS DOUBLE)
                 / CAST(SUM(CAST(z*z AS DECIMAL(28,12))) AS DOUBLE), 6) AS acf_3
        FROM l""")),

    // Per-type OLS trend of hourly value mass: exact decimal cross-sums,
    // x re-based per group (conditioning + decimal agreement bound),
    // slope/intercept/r² in one algebraic expression.
    "q6q_trend_lines" -> Q(
      fn = (s, dir) => {
        val hourly = ev(s, dir)
          .filter(col("value").isNotNull)
          .withColumn("hb", expr("ts_ms div 3600000"))
          .groupBy(col("event_type"), col("hb"))
          .agg(sum(col("value").cast("decimal(18,2)")).cast("double").as("v"))
        graft.operators.Stats.groupedTrend(hourly, "event_type", "hb", "v")
          .orderBy(col("event_type"))
      },
      oracle = Some("""
        WITH h AS (
          SELECT event_type, epoch_ms(ts) // 3600000 AS hb,
                 CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS v
          FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
        r AS (
          SELECT h.event_type,
                 CAST(h.hb AS DOUBLE) - m.x0 AS x, h.v AS y
          FROM h JOIN (SELECT event_type, CAST(MIN(hb) AS DOUBLE) AS x0
                       FROM h GROUP BY 1) m USING (event_type)),
        a AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(x AS DECIMAL(38,6))) AS sx,
                 SUM(CAST(y AS DECIMAL(38,6))) AS sy,
                 SUM(CAST(x*y AS DECIMAL(38,6))) AS sxy,
                 SUM(CAST(x*x AS DECIMAL(38,6))) AS sxx,
                 SUM(CAST(y*y AS DECIMAL(38,6))) AS syy
          FROM r GROUP BY 1),
        t AS (
          SELECT event_type, n,
                 CAST(sxy AS DOUBLE)/n
                   - (CAST(sx AS DOUBLE)/n)*(CAST(sy AS DOUBLE)/n) AS cov,
                 CAST(sxx AS DOUBLE)/n
                   - (CAST(sx AS DOUBLE)/n)*(CAST(sx AS DOUBLE)/n) AS varx,
                 CAST(syy AS DOUBLE)/n
                   - (CAST(sy AS DOUBLE)/n)*(CAST(sy AS DOUBLE)/n) AS vary,
                 CAST(sx AS DOUBLE)/n AS mx, CAST(sy AS DOUBLE)/n AS my
          FROM a)
        SELECT event_type, n,
               CASE WHEN varx > 0 THEN ROUND(cov/varx, 6) END AS slope,
               CASE WHEN varx > 0
                    THEN ROUND(my - (cov/varx)*mx, 6) END AS intercept,
               CASE WHEN varx > 0 AND vary > 0
                    THEN ROUND((cov*cov)/(varx*vary), 6) END AS r2
        FROM t ORDER BY event_type""")),

    // Chi-square independence test on the event_type × hour-of-day
    // contingency table: expectations e = rowTot·colTot/N (integer-derived
    // doubles), chi² via 9-grid terms in DECIMAL(28,9) — q6n's
    // goodness-of-fit cousin, against independence instead of Benford.
    "q6s_chi2_independence" -> Q(
      fn = (s, dir) => {
        val cells = ev(s, dir)
          .withColumn("hod", (expr("ts_ms div 3600000") % 24).cast("int"))
          .groupBy(col("event_type"), col("hod"))
          .agg(count(lit(1)).as("n"))
        val tot = Window.partitionBy(lit(1))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val rowW = Window.partitionBy("event_type")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val colW = Window.partitionBy("hod")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val e = sum(col("n")).over(rowW).cast("double") *
          sum(col("n")).over(colW) / sum(col("n")).over(tot)
        val diff = col("n").cast("double") - col("e")
        cells
          .withColumn("e", e)
          .withColumn("__t", round(diff * diff / col("e"), 9))
          .withColumn("chi2",
            round(sum(col("__t").cast("decimal(28,9)")).over(tot)
              .cast("double"), 6))
          .select(col("event_type"), col("hod"), col("n"),
            round(col("e"), 6).as("expected"), col("chi2"))
          .orderBy(col("event_type"), col("hod"))
      },
      oracle = Some("""
        WITH c AS (
          SELECT event_type,
                 CAST((epoch_ms(ts) // 3600000) % 24 AS INT) AS hod,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2),
        x AS (
          SELECT event_type, hod, n,
                 CAST(SUM(n) OVER (PARTITION BY event_type) AS DOUBLE)
                   * SUM(n) OVER (PARTITION BY hod)
                   / SUM(n) OVER () AS e
          FROM c),
        t AS (
          SELECT *, ROUND((CAST(n AS DOUBLE) - e) * (CAST(n AS DOUBLE) - e)
                   / e, 9) AS term
          FROM x)
        SELECT event_type, hod, n, ROUND(e, 6) AS expected,
               ROUND(CAST(SUM(CAST(term AS DECIMAL(28,9))) OVER ()
                 AS DOUBLE), 6) AS chi2
        FROM t ORDER BY event_type, hod""")),

    // Conditional entropy of the next event given the current one — the
    // sequence-predictability number over q6b's transition counts:
    // H(next|cur) = −Σ (n_ij/N)·ln(n_ij/n_i·), 9-grid terms, order-free
    // accumulation. One row.
    "q6t_entropy_rate" -> Q(
      fn = (s, dir) => {
        val w = Window.partitionBy("user_id").orderBy(col("ts_ms"), col("event_id"))
        val tr = ev(s, dir)
          .select(col("user_id"), col("ts_ms"), col("event_id"),
            col("event_type"))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .filter(col("next_type").isNotNull)
          .groupBy(col("event_type"), col("next_type"))
          .agg(count(lit(1)).as("nij"))
        val rowW = Window.partitionBy("event_type")
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val term = round(
          -(col("nij").cast("double") / col("total")) *
            log(col("nij").cast("double") / sum(col("nij")).over(rowW)), 9)
        val tot = tr.agg(sum(col("nij")).as("total"))
        tr.crossJoin(broadcast(tot))
          .withColumn("__t", term)
          .agg(
            sum(col("nij")).as("n_transitions"),
            round(sum(col("__t").cast("decimal(28,9)")).cast("double"), 6)
              .as("entropy_rate"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT event_type,
                 lead(event_type) OVER (PARTITION BY user_id
                   ORDER BY epoch_ms(ts), event_id) AS next_type
          FROM events),
        c AS (
          SELECT event_type, next_type, CAST(COUNT(*) AS BIGINT) AS nij
          FROM e WHERE next_type IS NOT NULL GROUP BY 1, 2),
        tot AS (SELECT CAST(SUM(nij) AS BIGINT) AS total FROM c),
        t AS (
          SELECT nij,
                 ROUND((-(CAST(nij AS DOUBLE) / tot.total))
                   * ln(CAST(nij AS DOUBLE)
                        / SUM(nij) OVER (PARTITION BY event_type)), 9) AS term
          FROM c, tot)
        SELECT CAST(SUM(nij) AS BIGINT) AS n_transitions,
               ROUND(CAST(SUM(CAST(term AS DECIMAL(28,9))) AS DOUBLE), 6)
                 AS entropy_rate
        FROM t""")),

    // Exact two-sample Kolmogorov–Smirnov distance between the even- and
    // odd-event-id value distributions: ECDFs over the aggregated
    // distinct-value table (domain-bounded windows, the q5z AUC
    // discipline), D = max |F₁ − F₂|. PSI (q5l/q5m) is the binned drift
    // detector; KS is its exact unbinned sibling.
    "q6u_ks_distance" -> Q(
      fn = (s, dir) => {
        val e = ev(s, dir)
          .filter(col("value").isNotNull)
          .select((col("event_id") % 2 === 0).as("is_even"),
            col("value").cast("double").as("v"))
        val byV = e.groupBy("v").agg(
          sum(when(col("is_even"), 1L).otherwise(0L)).as("ne"),
          sum(when(!col("is_even"), 1L).otherwise(0L)).as("no"))
        val cum = Window.orderBy("v")
          .rowsBetween(Window.unboundedPreceding, 0)
        val tot = Window.partitionBy(lit(1))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        val diff = abs(
          sum(col("ne")).over(cum).cast("double") / sum(col("ne")).over(tot) -
            sum(col("no")).over(cum).cast("double") / sum(col("no")).over(tot))
        byV.withColumn("__d", diff)
          .agg(
            sum(col("ne")).as("n_even"),
            sum(col("no")).as("n_odd"),
            count(lit(1)).as("n_values"),
            round(max(col("__d")), 6).as("ks"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT (event_id % 2 = 0) AS is_even, CAST(value AS DOUBLE) AS v
          FROM events WHERE value IS NOT NULL),
        b AS (
          SELECT v,
                 CAST(SUM(CASE WHEN is_even THEN 1 ELSE 0 END) AS BIGINT) AS ne,
                 CAST(SUM(CASE WHEN NOT is_even THEN 1 ELSE 0 END) AS BIGINT) AS no
          FROM e GROUP BY v),
        d AS (
          SELECT ne, no,
                 abs(CAST(SUM(ne) OVER w AS DOUBLE) / SUM(ne) OVER ()
                   - CAST(SUM(no) OVER w AS DOUBLE) / SUM(no) OVER ()) AS dd
          FROM b
          WINDOW w AS (ORDER BY v
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        SELECT CAST(SUM(ne) AS BIGINT) AS n_even,
               CAST(SUM(no) AS BIGINT) AS n_odd,
               CAST(COUNT(*) AS BIGINT) AS n_values,
               ROUND(MAX(dd), 6) AS ks
        FROM d""")),

    // Funnel conversion rates with Wilson 95% confidence intervals — the
    // statistical-rigor layer over q48's raw counts: p̂ plus the interval
    // a small denominator honestly widens. Pure algebra + sqrt on
    // integer-derived doubles; z = 1.96 as an explicit literal.
    "q6y_funnel_confidence" -> Q(
      fn = (s, dir) => {
        val counts = graft.operators.Funnel.stepCounts(
          ev(s, dir), "user_id", "event_type", "ts_ms",
          Seq("signup", "view", "purchase"))
        val w = Window.orderBy("step_idx")
        val prev = lag(col("n_users"), 1).over(w)
        val z = lit(1.96)
        val p = col("n_users").cast("double") / col("__prev")
        val nn = col("__prev").cast("double")
        val center = p + z * z / (lit(2.0) * nn)
        val half = z * sqrt(p * (lit(1.0) - p) / nn +
          z * z / (lit(4.0) * nn * nn))
        val denom = lit(1.0) + z * z / nn
        counts
          .withColumn("__prev", prev)
          .withColumn("conv_rate",
            when(col("__prev").isNotNull && col("__prev") > 0, round(p, 6)))
          .withColumn("ci_low",
            when(col("__prev").isNotNull && col("__prev") > 0,
              round((center - half) / denom, 6)))
          .withColumn("ci_high",
            when(col("__prev").isNotNull && col("__prev") > 0,
              round((center + half) / denom, 6)))
          .select(col("step_idx"), col("step"), col("n_users"),
            col("conv_rate"), col("ci_low"), col("ci_high"))
          .orderBy(col("step_idx"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
        s1 AS (
          SELECT user_id, MIN(ts_ms) AS t FROM e
          WHERE event_type = 'signup' GROUP BY 1),
        s2 AS (
          SELECT e.user_id, MIN(e.ts_ms) AS t
          FROM e JOIN s1 ON e.user_id = s1.user_id
          WHERE e.event_type = 'view' AND e.ts_ms > s1.t GROUP BY 1),
        s3 AS (
          SELECT e.user_id, MIN(e.ts_ms) AS t
          FROM e JOIN s2 ON e.user_id = s2.user_id
          WHERE e.event_type = 'purchase' AND e.ts_ms > s2.t GROUP BY 1),
        c AS (
          SELECT 1 AS step_idx, 'signup' AS step,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n_users
          UNION ALL
          SELECT 2, 'view', (SELECT CAST(COUNT(*) AS BIGINT) FROM s2)
          UNION ALL
          SELECT 3, 'purchase', (SELECT CAST(COUNT(*) AS BIGINT) FROM s3)),
        l AS (
          SELECT *, lag(n_users) OVER (ORDER BY step_idx) AS prev FROM c),
        m AS (
          SELECT *, CAST(n_users AS DOUBLE) / prev AS p,
                 CAST(prev AS DOUBLE) AS nn,
                 CAST(1.96 AS DOUBLE) AS z
          FROM l)
        SELECT step_idx, step, n_users,
               CASE WHEN prev IS NOT NULL AND prev > 0
                    THEN ROUND(p, 6) END AS conv_rate,
               CASE WHEN prev IS NOT NULL AND prev > 0 THEN
                 ROUND(((p + z*z / (CAST(2 AS DOUBLE) * nn))
                   - z * sqrt(p * (CAST(1 AS DOUBLE) - p) / nn
                       + z*z / (CAST(4 AS DOUBLE) * nn * nn)))
                   / (CAST(1 AS DOUBLE) + z*z / nn), 6) END AS ci_low,
               CASE WHEN prev IS NOT NULL AND prev > 0 THEN
                 ROUND(((p + z*z / (CAST(2 AS DOUBLE) * nn))
                   + z * sqrt(p * (CAST(1 AS DOUBLE) - p) / nn
                       + z*z / (CAST(4 AS DOUBLE) * nn * nn)))
                   / (CAST(1 AS DOUBLE) + z*z / nn), 6) END AS ci_high
        FROM m ORDER BY step_idx""")),

    // Session-duration rollup over q41's sessionization: bounce rate
    // (single-event sessions), exact duration percentiles, per-session
    // value stats — one row.
    "q6z_session_rollup" -> Q(
      fn = (s, dir) => {
        val sessionized = Sessionize.byGap(
          ev(s, dir).select(col("user_id"), col("event_id"), col("ts_ms"),
            col("value")),
          Seq("user_id"), col("ts_ms"), col("event_id"), gapMs = 1800000L)
        val st = Sessionize.sessionStats(sessionized, Seq("user_id"),
          col("ts_ms"), col("value"))
        st.agg(
          count(lit(1)).as("n_sessions"),
          sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounce"),
          round(sum(when(col("n_events") === 1, 1L).otherwise(0L))
            .cast("double") / count(lit(1)), 6).as("bounce_rate"),
          expr("percentile(session_end - session_start, 0.5)").as("p50_dur_ms"),
          expr("percentile(session_end - session_start, 0.9)").as("p90_dur_ms"),
          max(col("session_end") - col("session_start")).as("max_dur_ms"),
          round(sum(col("session_value").cast("decimal(18,2)"))
            .cast("double") / count(lit(1)), 6).as("mean_session_value"))
      },
      oracle = Some("""
        WITH e AS (SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, value
                   FROM events),
        s AS (
          SELECT *, CASE WHEN prev IS NULL OR ts_ms - prev > 1800000
                    THEN 1 ELSE 0 END AS st
          FROM (SELECT *, lag(ts_ms) OVER (PARTITION BY user_id
                  ORDER BY ts_ms, event_id) AS prev FROM e)),
        g AS (
          SELECT *, SUM(st) OVER (PARTITION BY user_id ORDER BY ts_ms, event_id
                  ROWS UNBOUNDED PRECEDING) AS session_seq
          FROM s),
        sess AS (
          SELECT user_id, session_seq,
                 MIN(ts_ms) AS session_start, MAX(ts_ms) AS session_end,
                 CAST(COUNT(*) AS BIGINT) AS n_events,
                 SUM(CAST(value AS DECIMAL(18,2))) AS session_value
          FROM g GROUP BY 1, 2)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
               CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_bounce,
               ROUND(CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
                 AS DOUBLE) / COUNT(*), 6) AS bounce_rate,
               quantile_cont(session_end - session_start, 0.5) AS p50_dur_ms,
               quantile_cont(session_end - session_start, 0.9) AS p90_dur_ms,
               CAST(MAX(session_end - session_start) AS BIGINT) AS max_dur_ms,
               ROUND(CAST(SUM(session_value) AS DOUBLE) / COUNT(*), 6)
                 AS mean_session_value
        FROM sess""")),

    "q43_hourly_windows" -> Q(
      fn = (s, dir) =>
        Tables(s, dir, "events")
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
          .select(unix_millis(col("w.start")).as("window_start_ms"),
            col("event_type"), col("n_events"), col("sum_value"))
          .orderBy(col("window_start_ms"), col("event_type")),
      oracle = Some("""
        SELECT epoch_ms(date_trunc('hour', ts)) AS window_start_ms, event_type,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        FROM events GROUP BY 1, 2 ORDER BY window_start_ms, event_type""")),

    // A1/A2-style store stats across tables.
    "q44_table_stats" -> Q(
      fn = (s, dir) => {
        def cnt(n: String, as: String) =
          Tables(s, dir, n).agg(count(lit(1)).as(as))
        cnt("lineitem", "n_lineitem")
          .crossJoin(cnt("orders", "n_orders"))
          .crossJoin(cnt("documents", "n_documents"))
          .crossJoin(cnt("events", "n_events"))
      },
      oracle = Some("""
        SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem) AS n_lineitem,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_orders,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM documents) AS n_documents,
               (SELECT CAST(COUNT(*) AS BIGINT) FROM events) AS n_events""")),

    // Date arithmetic (§2.6 datediff surface): order-age histogram in
    // 30-day buckets from a fixed epoch.
    "q46_order_age_histogram" -> Q(
      fn = (s, dir) =>
        Tables(s, dir, "orders")
          .withColumn("age_days", datediff(col("o_orderdate"), lit("1995-01-01")))
          // floor, not cast-truncation: they differ on negative ages and the
          // oracle uses FLOOR
          .groupBy(floor(col("age_days") / 30).cast("long").as("age_bucket"))
          .agg(count(lit(1)).as("n_orders"))
          .orderBy(col("age_bucket")),
      oracle = Some("""
        SELECT CAST(FLOOR(datediff('day', DATE '1995-01-01', o_orderdate) / 30.0) AS BIGINT) AS age_bucket,
               CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM orders GROUP BY age_bucket ORDER BY age_bucket"""),
      ),

    // Sliding windows: 2-hour windows every hour (each event in 2 windows).
    "q47_sliding_windows" -> Q(
      fn = (s, dir) =>
        Tables(s, dir, "events")
          .groupBy(window(col("ts"), "2 hours", "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n_events"))
          .select(unix_millis(col("w.start")).as("window_start_ms"),
            col("event_type"), col("n_events"))
          .orderBy(col("window_start_ms"), col("event_type")),
      oracle = Some("""
        WITH e AS (
          SELECT event_type, unnest([
            epoch_ms(date_trunc('hour', ts)) - 3600000,
            epoch_ms(date_trunc('hour', ts))]) AS window_start_ms
          FROM events)
        SELECT window_start_ms, event_type, CAST(COUNT(*) AS BIGINT) AS n_events
        FROM e GROUP BY window_start_ms, event_type
        ORDER BY window_start_ms, event_type""")),

    // Exact percentiles (linear interpolation — both engines' continuous
    // quantile definition; quantities are small integers so the arithmetic
    // is dyadic-exact).
    "q45_quantity_percentiles" -> Q(
      fn = (s, dir) =>
        Tables(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(
            expr("percentile(l_quantity, 0.5)").as("p50"),
            expr("percentile(l_quantity, 0.9)").as("p90"),
            min(col("l_quantity")).as("min_qty"),
            max(col("l_quantity")).as("max_qty"))
          .orderBy(col("l_returnflag")),
      oracle = Some("""
        SELECT l_returnflag,
               quantile_cont(l_quantity, 0.5) AS p50,
               quantile_cont(l_quantity, 0.9) AS p90,
               MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""")),

    // Bounded interval-join attribution: per purchase, ALL views in the
    // preceding hour (q40's as-of gives the latest ONE; this is the
    // bounded-window ALL-matches correlate). RangeJoin buckets both sides
    // by floor(ts/window) so the join is a pure equi-join on
    // (user, bucket) — DuckDB replays the naive inequality join, which is
    // definitionally equivalent (RangeJoinSpec proves it on the Spark
    // side too).
    "q4u_attribution_window" -> Q(
      fn = (s, dir) => {
        val e = ev(s, dir)
        val views = e.filter(col("event_type") === "view")
          .select(col("user_id"), col("ts_ms"), col("event_id").as("view_id"))
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts_ms"), col("event_id").as("purchase_id"))
        graft.operators.RangeJoin
          .within(views, purchases, Seq("user_id"), "ts_ms", "ts_ms", 3600000L)
          .groupBy(col("r_purchase_id").as("purchase_id"), col("user_id"),
            col("r_ts_ms").as("purchase_ts"))
          .agg(count(lit(1)).as("n_views"), min(col("view_id")).as("first_view_id"))
          .orderBy(col("purchase_id"))
      },
      oracle = Some("""
        WITH e AS (SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms
                   FROM events),
        v AS (SELECT user_id, event_id AS view_id, ts_ms FROM e
              WHERE event_type = 'view'),
        p AS (SELECT user_id, event_id AS purchase_id, ts_ms AS purchase_ts
              FROM e WHERE event_type = 'purchase')
        SELECT p.purchase_id, p.user_id, p.purchase_ts,
               CAST(COUNT(*) AS BIGINT) AS n_views,
               MIN(v.view_id) AS first_view_id
        FROM p JOIN v ON v.user_id = p.user_id
          AND p.purchase_ts >= v.ts_ms AND p.purchase_ts <= v.ts_ms + 3600000
        GROUP BY 1, 2, 3 ORDER BY purchase_id""")),

    // Event-rate spike detection over 6-hour tumbling windows, per type:
    // a window is a spike when its count exceeds the type's mean by more
    // than two standard deviations — computed ENTIRELY in integers, no
    // float ever: with W windows, sum S1 and sum-of-squares S2,
    // n − μ > 2σ  ⇔  n·W − S1 > 0  ∧  (n·W − S1)² > 4·(W·S2 − S1²)
    // (multiply through by W²; every quantity is an exact BIGINT). The
    // alert-stream "is this hour anomalous" signal with zero cross-engine
    // float risk.
    "q4w_event_spikes" -> Q(
      fn = (s, dir) => {
        val counts = graft.operators.SpikeDetect.windowCounts(
          ev(s, dir), "event_type", "ts_ms", windowMs = 21600000L) // 6 h
        graft.operators.SpikeDetect.flags(counts)
          .select(col("g").as("event_type"), col("window_start_ms"),
            col("n"), col("is_spike"))
          .orderBy(col("event_type"), col("window_start_ms"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT event_type,
                 epoch_ms(ts) - epoch_ms(ts) % 21600000 AS window_start_ms
          FROM events),
        counts AS MATERIALIZED (
          SELECT event_type, window_start_ms, CAST(COUNT(*) AS BIGINT) AS n
          FROM e GROUP BY 1, 2),
        stats AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS w,
                 CAST(SUM(n) AS BIGINT) AS s1,
                 CAST(SUM(n * n) AS BIGINT) AS s2
          FROM counts GROUP BY 1)
        SELECT c.event_type, c.window_start_ms, c.n,
               CASE WHEN c.n * s.w - s.s1 > 0
                     AND (c.n * s.w - s.s1) * (c.n * s.w - s.s1)
                         > 4 * (s.w * s.s2 - s.s1 * s.s1)
                    THEN 1 ELSE 0 END AS is_spike
        FROM counts c JOIN stats s USING (event_type)
        ORDER BY event_type, window_start_ms""")),

    // Distribution drift (PSI) on event_type between two corpus slices
    // (even/odd event ids — a deterministic stand-in for week-over-week
    // snapshots). Smoothed proportions and the psi term run in DOUBLE on
    // both engines (ln/division parity per q3y/q38), snapped to 6 decimals.
    "q5l_drift_categorical" -> Q(
      fn = (s, dir) => {
        val e = ev(s, dir)
        Drift.categoricalDrift(
            e.filter(pmod(col("event_id"), lit(2)) === 0),
            e.filter(pmod(col("event_id"), lit(2)) === 1),
            "event_type")
          .select(col("value"), col("n_ref"), col("n_cur"),
            round(col("p_ref"), 6).as("p_ref"),
            round(col("p_cur"), 6).as("p_cur"),
            round(col("psi_term"), 6).as("psi_term"))
          .orderBy(col("value"))
      },
      oracle = Some("""
        WITH rc AS (
          SELECT event_type AS value, CAST(COUNT(*) AS BIGINT) AS n_ref
          FROM events WHERE event_id % 2 = 0 AND event_type IS NOT NULL
          GROUP BY 1),
        cc AS (
          SELECT event_type AS value, CAST(COUNT(*) AS BIGINT) AS n_cur
          FROM events WHERE event_id % 2 = 1 AND event_type IS NOT NULL
          GROUP BY 1),
        j AS (
          SELECT COALESCE(rc.value, cc.value) AS value,
                 CAST(COALESCE(n_ref, 0) AS BIGINT) AS n_ref,
                 CAST(COALESCE(n_cur, 0) AS BIGINT) AS n_cur
          FROM rc FULL OUTER JOIN cc ON rc.value = cc.value),
        t AS (
          SELECT CAST(SUM(n_ref) AS DOUBLE) AS tr,
                 CAST(SUM(n_cur) AS DOUBLE) AS tc,
                 CAST(COUNT(*) AS DOUBLE) AS k FROM j),
        p AS (
          SELECT value, n_ref, n_cur,
                 (CAST(n_ref AS DOUBLE) + 0.5) / (tr + 0.5 * k) AS p_ref,
                 (CAST(n_cur AS DOUBLE) + 0.5) / (tc + 0.5 * k) AS p_cur
          FROM j, t)
        SELECT value, n_ref, n_cur,
               ROUND(p_ref, 6) AS p_ref, ROUND(p_cur, 6) AS p_cur,
               ROUND((p_cur - p_ref) * ln(p_cur / p_ref), 6) AS psi_term
        FROM p ORDER BY value""")),

    // Numeric drift: event values through fixed-width bins
    // (lo=0, width=50, 10 bins; outliers clamp into the edge bins), same
    // PSI machinery keyed by bin index.
    "q5m_drift_binned" -> Q(
      fn = (s, dir) => {
        val e = ev(s, dir)
        Drift.binnedDrift(
            e.filter(pmod(col("event_id"), lit(2)) === 0),
            e.filter(pmod(col("event_id"), lit(2)) === 1),
            "value", lo = 0.0, width = 50.0, nBins = 10)
          .select(col("value"), col("n_ref"), col("n_cur"),
            round(col("p_ref"), 6).as("p_ref"),
            round(col("p_cur"), 6).as("p_cur"),
            round(col("psi_term"), 6).as("psi_term"))
          .orderBy(col("value"))
      },
      oracle = Some("""
        WITH b AS (
          SELECT event_id,
                 LEAST(GREATEST(CAST(FLOOR((CAST(value AS DOUBLE) - 0.0) / 50.0)
                   AS BIGINT), 0), 9) AS value
          FROM events WHERE value IS NOT NULL),
        rc AS (
          SELECT value, CAST(COUNT(*) AS BIGINT) AS n_ref
          FROM b WHERE event_id % 2 = 0 GROUP BY 1),
        cc AS (
          SELECT value, CAST(COUNT(*) AS BIGINT) AS n_cur
          FROM b WHERE event_id % 2 = 1 GROUP BY 1),
        j AS (
          SELECT COALESCE(rc.value, cc.value) AS value,
                 CAST(COALESCE(n_ref, 0) AS BIGINT) AS n_ref,
                 CAST(COALESCE(n_cur, 0) AS BIGINT) AS n_cur
          FROM rc FULL OUTER JOIN cc ON rc.value = cc.value),
        t AS (
          SELECT CAST(SUM(n_ref) AS DOUBLE) AS tr,
                 CAST(SUM(n_cur) AS DOUBLE) AS tc,
                 CAST(COUNT(*) AS DOUBLE) AS k FROM j),
        p AS (
          SELECT value, n_ref, n_cur,
                 (CAST(n_ref AS DOUBLE) + 0.5) / (tr + 0.5 * k) AS p_ref,
                 (CAST(n_cur AS DOUBLE) + 0.5) / (tc + 0.5 * k) AS p_cur
          FROM j, t)
        SELECT value, n_ref, n_cur,
               ROUND(p_ref, 6) AS p_ref, ROUND(p_cur, 6) AS p_cur,
               ROUND((p_cur - p_ref) * ln(p_cur / p_ref), 6) AS psi_term
        FROM p ORDER BY value""")),

    // Kaplan-Meier / Nelson-Aalen life table over days-to-conversion
    // (first view → first subsequent purchase), users without a purchase
    // right-censored at the corpus horizon. Hazards are proven-parity
    // divisions snapped to the 9-grid and SUMMED through DECIMAL(28,9)
    // (Nelson-Aalen directly; KM in log space — ln parity is proven, exp
    // is not), so the whole censored estimator replays exactly.
    "q7a_survival" -> Q(
      fn = (s, dir) => {
        val e = ev(s, dir)
        val v0 = e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("ts_ms")).as("t0"))
        val te = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts_ms"))
          .join(v0, "user_id")
          .filter(col("ts_ms") >= col("t0"))
          .groupBy("user_id").agg(min(col("ts_ms")).as("te"))
        val horizon = e.agg(max(col("ts_ms")).as("__tmax"))
        val subjects = v0.join(te, Seq("user_id"), "left")
          .crossJoin(broadcast(horizon))
          .select(
            when(col("te").isNotNull, expr("(te - t0) div 86400000"))
              .otherwise(expr("(__tmax - t0) div 86400000")).as("duration"),
            when(col("te").isNotNull, 1).otherwise(0).as("event"))
        graft.operators.Survival.lifeTable(subjects, "duration", "event")
          .orderBy(col("t"))
      },
      oracle = Some("""
        WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
        v0 AS (SELECT user_id, MIN(ts_ms) AS t0 FROM e
               WHERE event_type = 'view' GROUP BY 1),
        te AS (SELECT e.user_id, MIN(e.ts_ms) AS te FROM e JOIN v0 USING (user_id)
               WHERE e.event_type = 'purchase' AND e.ts_ms >= v0.t0 GROUP BY 1),
        gm AS (SELECT MAX(ts_ms) AS tmax FROM e),
        subj AS (
          SELECT CASE WHEN te.te IS NOT NULL THEN (te.te - v0.t0) // 86400000
                      ELSE ((SELECT tmax FROM gm) - v0.t0) // 86400000 END AS t,
                 CASE WHEN te.te IS NOT NULL THEN 1 ELSE 0 END AS ev
          FROM v0 LEFT JOIN te USING (user_id)),
        byt AS (
          SELECT t, CAST(SUM(ev) AS BIGINT) AS d_events,
                 CAST(SUM(1 - ev) AS BIGINT) AS c_censored
          FROM subj GROUP BY 1),
        lt AS (
          SELECT *, CAST(SUM(d_events + c_censored) OVER ()
                 - COALESCE(SUM(d_events + c_censored) OVER (ORDER BY t
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS n_risk
          FROM byt),
        h AS (
          SELECT *, ROUND(CAST(d_events AS DOUBLE) / n_risk, 9) AS hazard,
                 CASE WHEN d_events < n_risk THEN
                   ROUND(LN(CAST(1 AS DOUBLE)
                     - CAST(d_events AS DOUBLE) / n_risk), 9) END AS lnterm,
                 CASE WHEN d_events >= n_risk THEN 1 ELSE 0 END AS exh
          FROM lt)
        SELECT t, n_risk, d_events, c_censored, hazard,
               ROUND(CAST(SUM(CAST(hazard AS DECIMAL(28,9))) OVER (ORDER BY t
                 ROWS UNBOUNDED PRECEDING) AS DOUBLE), 6) AS na_cum_hazard,
               CASE WHEN SUM(exh) OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) = 0
                    THEN ROUND(CAST(SUM(CAST(lnterm AS DECIMAL(28,9)))
                      OVER (ORDER BY t ROWS UNBOUNDED PRECEDING) AS DOUBLE), 6)
                      + CAST(0 AS DOUBLE) END AS km_log_survival
        FROM h ORDER BY t""")),

    // CUPED variance-reduced experiment readout: arms by user-id parity,
    // pre = view-value mass, post = purchase-value mass per user; pooled
    // theta and pre-mean snap to the 9-grid, per-unit adjusted metrics
    // aggregate through exact decimal power sums. The q6q cross-sum
    // algebra applied to the Deng-Xu-Kohavi-Walker estimator.
    "q7b_cuped" -> Q(
      fn = (s, dir) => {
        val per = ev(s, dir).groupBy("user_id").agg(
          coalesce(sum(when(col("event_type") === "view", col("value"))
            .cast("decimal(18,2)")).cast("double"), lit(0.0)).as("pre"),
          coalesce(sum(when(col("event_type") === "purchase", col("value"))
            .cast("decimal(18,2)")).cast("double"), lit(0.0)).as("post"))
          .select((col("user_id") % 2).cast("int").as("arm"),
            col("pre"), col("post"))
        graft.operators.Experiment.cuped(per, "arm", "pre", "post")
          .orderBy(col("arm"))
      },
      oracle = Some("""
        WITH per AS (
          SELECT CAST(user_id % 2 AS INT) AS arm,
                 COALESCE(CAST(SUM(CASE WHEN event_type = 'view'
                   THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE),
                   CAST(0 AS DOUBLE)) AS pre,
                 COALESCE(CAST(SUM(CASE WHEN event_type = 'purchase'
                   THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE),
                   CAST(0 AS DOUBLE)) AS post
          FROM events GROUP BY user_id),
        pool AS (
          SELECT COUNT(*) AS n,
                 SUM(CAST(pre AS DECIMAL(38,6))) AS sx,
                 SUM(CAST(post AS DECIMAL(38,6))) AS sy,
                 SUM(CAST(pre * post AS DECIMAL(38,6))) AS sxy,
                 SUM(CAST(pre * pre AS DECIMAL(38,6))) AS sxx
          FROM per),
        th AS (
          SELECT ROUND(CAST(sx AS DOUBLE) / n, 9) AS mean_pre,
                 ROUND((CAST(sxy AS DOUBLE) / n
                     - (CAST(sx AS DOUBLE) / n) * (CAST(sy AS DOUBLE) / n))
                   / (CAST(sxx AS DOUBLE) / n
                     - (CAST(sx AS DOUBLE) / n) * (CAST(sx AS DOUBLE) / n)),
                   9) AS theta
          FROM pool),
        adj AS (
          SELECT arm, post,
                 ROUND(post - th.theta * (pre - th.mean_pre), 9) AS a
          FROM per, th),
        g AS (
          SELECT arm, CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(post AS DECIMAL(38,6))) AS sp,
                 SUM(CAST(post * post AS DECIMAL(38,6))) AS spp,
                 SUM(CAST(a AS DECIMAL(38,9))) AS sa,
                 SUM(CAST(a * a AS DECIMAL(38,9))) AS saa
          FROM adj GROUP BY 1)
        SELECT arm, n,
               ROUND(CAST(sp AS DOUBLE) / n, 6) AS mean_post,
               ROUND(CAST(sa AS DOUBLE) / n, 6) + CAST(0 AS DOUBLE)
                 AS mean_adjusted,
               ROUND(CAST(spp AS DOUBLE) / n
                 - (CAST(sp AS DOUBLE) / n) * (CAST(sp AS DOUBLE) / n), 6)
                 AS var_post,
               ROUND(CAST(saa AS DOUBLE) / n
                 - (CAST(sa AS DOUBLE) / n) * (CAST(sa AS DOUBLE) / n), 6)
                 AS var_adjusted,
               CASE WHEN (CAST(spp AS DOUBLE) / n
                   - (CAST(sp AS DOUBLE) / n) * (CAST(sp AS DOUBLE) / n)) > 0
                 THEN ROUND(CAST(1 AS DOUBLE)
                   - (CAST(saa AS DOUBLE) / n
                      - (CAST(sa AS DOUBLE) / n) * (CAST(sa AS DOUBLE) / n))
                     / (CAST(spp AS DOUBLE) / n
                      - (CAST(sp AS DOUBLE) / n) * (CAST(sp AS DOUBLE) / n)),
                   6) + CAST(0 AS DOUBLE) END AS var_reduction
        FROM g ORDER BY arm""")),

    // Pooled two-proportion z-test on 1-day view→purchase conversion by
    // user-id-parity arm (the unbounded "ever purchased" flag converts the
    // whole dense fixture — a degenerate pool; the window makes the rate
    // discriminate, the q48 lesson): exact integer counts, one sqrt
    // (proven parity), the 5% significance flag decided on the ROUNDED
    // statistic so both engines compare identical doubles.
    "q7c_ab_conversion" -> Q(
      fn = (s, dir) => {
        val e = ev(s, dir)
        val v0 = e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("ts_ms")).as("t0"))
        val converted = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts_ms"))
          .join(v0, "user_id")
          .filter(col("ts_ms") > col("t0") &&
            col("ts_ms") <= col("t0") + lit(86400000L))
          .select(col("user_id")).distinct()
          .withColumn("__c", lit(1))
        val per = v0.join(converted, Seq("user_id"), "left")
          .select((col("user_id") % 2).cast("int").as("arm"),
            coalesce(col("__c"), lit(0)).as("conv"))
        graft.operators.Experiment.twoProportionZ(per, "arm", "conv")
      },
      oracle = Some("""
        WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
        v0 AS (SELECT user_id, MIN(ts_ms) AS t0 FROM e
               WHERE event_type = 'view' GROUP BY 1),
        cv AS (SELECT DISTINCT e.user_id FROM e JOIN v0 USING (user_id)
               WHERE e.event_type = 'purchase' AND e.ts_ms > v0.t0
                 AND e.ts_ms <= v0.t0 + 86400000),
        per AS (
          SELECT CAST(v0.user_id % 2 AS INT) AS arm,
                 CASE WHEN cv.user_id IS NOT NULL THEN 1 ELSE 0 END AS conv
          FROM v0 LEFT JOIN cv ON cv.user_id = v0.user_id),
        g AS (
          SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                 CAST(SUM(CASE WHEN arm = 0 THEN conv ELSE 0 END) AS BIGINT) AS x_a,
                 CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
                 CAST(SUM(CASE WHEN arm = 1 THEN conv ELSE 0 END) AS BIGINT) AS x_b
          FROM per),
        z AS (
          SELECT CAST(0 AS INT) AS arm_a, n_a, x_a,
                 CAST(1 AS INT) AS arm_b, n_b, x_b,
                 CAST(x_a AS DOUBLE) / n_a AS pa,
                 CAST(x_b AS DOUBLE) / n_b AS pb,
                 CAST(x_a + x_b AS DOUBLE) / (CAST(n_a AS DOUBLE) + n_b) AS pp
          FROM g)
        SELECT arm_a, n_a, x_a, arm_b, n_b, x_b,
               ROUND(pa, 6) AS p_a, ROUND(pb, 6) AS p_b,
               ROUND((pa - pb) / SQRT(pp * (CAST(1 AS DOUBLE) - pp)
                 * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b)), 6)
                 + CAST(0 AS DOUBLE) AS z,
               ABS(ROUND((pa - pb) / SQRT(pp * (CAST(1 AS DOUBLE) - pp)
                 * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b)), 6))
                 > CAST(1.96 AS DOUBLE) AS significant_5pct
        FROM z""")),

    // Holt linear-trend forecast of daily event volume per type
    // (alpha = 0.5, beta = 0.25 — dyadic rationals, so 1-alpha/1-beta are
    // exact in binary on both engines): the q5i ordered-fold recipe with a
    // TWO-field struct accumulator, per-step 9-snapped level AND trend,
    // replayed by DuckDB's list_reduce over struct elements (q3s idiom).
    "q7d_holt_forecast" -> Q(
      fn = (s, dir) => {
        val daily = ev(s, dir)
          .withColumn("day", expr("ts_ms div 86400000"))
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).cast("double").as("y"))
        graft.operators.Forecast.holtLinear(daily, "event_type", "day", "y",
            alpha = 0.5, beta = 0.25, horizon = 7)
          .orderBy(col("event_type"))
      },
      oracle = Some("""
        WITH d AS (
          SELECT event_type, epoch_ms(ts) // 86400000 AS day,
                 CAST(COUNT(*) AS DOUBLE) AS y
          FROM events GROUP BY 1, 2),
        s AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_obs,
                 list(y ORDER BY day) AS ys
          FROM d GROUP BY 1),
        f AS (
          -- accumulator is a 2-element LIST [level, trend], NOT a struct:
          -- DuckDB's list_reduce mutates a struct accumulator in place
          -- field-by-field (the second field's expression sees the
          -- freshly-written first field), while the list accumulator is
          -- pure — probed directly, see CLAUDE.md
          SELECT event_type, n_obs,
                 list_reduce(
                   list_prepend([ys[1], CAST(0 AS DOUBLE)],
                     list_transform(ys[2:], x -> [x, CAST(0 AS DOUBLE)])),
                   (acc, e) -> [
                     ROUND(CAST(0.5 AS DOUBLE) * e[1]
                       + CAST(0.5 AS DOUBLE) * (acc[1] + acc[2]), 9),
                     ROUND(CAST(0.25 AS DOUBLE)
                       * (ROUND(CAST(0.5 AS DOUBLE) * e[1]
                           + CAST(0.5 AS DOUBLE) * (acc[1] + acc[2]), 9)
                          - acc[1])
                       + CAST(0.75 AS DOUBLE) * acc[2], 9)]) AS st
          FROM s)
        SELECT event_type, n_obs,
               ROUND(st[1], 6) AS level,
               ROUND(st[2], 6) + CAST(0 AS DOUBLE) AS trend,
               ROUND(st[1] + CAST(7 AS DOUBLE) * st[2], 6)
                 + CAST(0 AS DOUBLE) AS forecast_7
        FROM f ORDER BY event_type""")),

    // Cohort LTV curves: users bucketed by first-activity day (the q4a
    // cohort key), purchase value accumulated per day offset — cumulative
    // DECIMAL sums over the cohort x offset table (bounded domain), LTV
    // per user one proven-parity division. The revenue-weighted upgrade
    // of the retention matrix.
    "q7i_cohort_ltv" -> Q(
      fn = (s, dir) => {
        val e = ev(s, dir)
        val first = e.groupBy("user_id")
          .agg(min(expr("ts_ms div 86400000")).as("cohort_day"))
        val sizes = first.groupBy("cohort_day")
          .agg(count(lit(1)).as("n_users"))
        val pv = e.filter(col("event_type") === "purchase" &&
            col("value").isNotNull)
          .withColumn("day", expr("ts_ms div 86400000"))
          .join(first, "user_id")
          .groupBy(col("cohort_day"), (col("day") - col("cohort_day")).as("day_offset"))
          .agg(sum(col("value").cast("decimal(18,2)")).as("__pv"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("cohort_day").orderBy("day_offset")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
        pv.join(sizes, "cohort_day")
          .withColumn("__cum", sum(col("__pv")).over(w))
          .select(col("cohort_day"), col("day_offset"), col("n_users"),
            col("__pv").cast("double").as("period_value"),
            col("__cum").cast("double").as("cum_value"),
            round(col("__cum").cast("double") / col("n_users"), 6)
              .as("ltv_per_user"))
          .orderBy(col("cohort_day"), col("day_offset"))
      },
      oracle = Some("""
        WITH e AS (SELECT user_id, event_type, value,
                          epoch_ms(ts) // 86400000 AS day FROM events),
        f AS (SELECT user_id, MIN(day) AS cohort_day FROM e GROUP BY 1),
        sz AS (SELECT cohort_day, CAST(COUNT(*) AS BIGINT) AS n_users
               FROM f GROUP BY 1),
        pv AS (
          SELECT f.cohort_day, e.day - f.cohort_day AS day_offset,
                 SUM(CAST(e.value AS DECIMAL(18,2))) AS pv
          FROM e JOIN f USING (user_id)
          WHERE e.event_type = 'purchase' AND e.value IS NOT NULL
          GROUP BY 1, 2),
        c AS (
          SELECT cohort_day, day_offset, pv,
                 SUM(pv) OVER (PARTITION BY cohort_day ORDER BY day_offset
                   ROWS UNBOUNDED PRECEDING) AS cum
          FROM pv)
        SELECT c.cohort_day, c.day_offset, sz.n_users,
               CAST(pv AS DOUBLE) AS period_value,
               CAST(cum AS DOUBLE) AS cum_value,
               ROUND(CAST(cum AS DOUBLE) / sz.n_users, 6) AS ltv_per_user
        FROM c JOIN sz USING (cohort_day)
        ORDER BY cohort_day, day_offset""")),

    // RFM segmentation: per-user recency/frequency/monetary quintiles via
    // the exact ntile operator (constant group — the q3t exact twin;
    // perGroupQuantileBandsApprox is the documented 100 TB path), R
    // inverted so 5 = most recent, deterministic (metric, user_id)
    // tiebreaks, composite segment code as pure int arithmetic.
    "q7j_rfm_segments" -> Q(
      fn = (s, dir) => {
        val e = ev(s, dir)
        val dmax = e.agg(max(expr("ts_ms div 86400000")).as("__dmax"))
        val per = e.groupBy("user_id").agg(
          max(expr("ts_ms div 86400000")).as("__last"),
          sum(when(col("event_type") === "purchase", 1).otherwise(0))
            .cast("long").as("frequency"),
          coalesce(sum(when(col("event_type") === "purchase", col("value"))
            .cast("decimal(18,2)")).cast("double"), lit(0.0)).as("monetary"))
          .crossJoin(broadcast(dmax))
          .withColumn("recency_days", col("__dmax") - col("__last"))
          .withColumn("__g", lit(1))
        val banded = Seq(("recency_days", "__rb"), ("frequency", "__fb"),
          ("monetary", "__mb")).foldLeft(per) { case (df, (c, out)) =>
          graft.operators.DataMix.perGroupQuantileBands(df, "__g", c, "user_id", 5)
            .withColumnRenamed("band", out)
        }
        banded.select(col("user_id"), col("recency_days"), col("frequency"),
            col("monetary"),
            (lit(6) - col("__rb")).as("r"), col("__fb").as("f"),
            col("__mb").as("m"),
            ((lit(6) - col("__rb")) * 100 + col("__fb") * 10 + col("__mb"))
              .as("rfm"))
          .orderBy(col("user_id"))
      },
      oracle = Some("""
        WITH e AS (SELECT user_id, event_type, value,
                          epoch_ms(ts) // 86400000 AS day FROM events),
        per AS (
          SELECT user_id, MAX(day) AS last_day,
                 CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS BIGINT) AS frequency,
                 COALESCE(CAST(SUM(CASE WHEN event_type = 'purchase'
                   THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE),
                   CAST(0 AS DOUBLE)) AS monetary
          FROM e GROUP BY 1),
        r AS (
          SELECT user_id,
                 (SELECT MAX(day) FROM e) - last_day AS recency_days,
                 frequency, monetary
          FROM per),
        b AS (
          SELECT *,
                 CAST(NTILE(5) OVER (ORDER BY recency_days, user_id) AS INT) AS rb,
                 CAST(NTILE(5) OVER (ORDER BY frequency, user_id) AS INT) AS fb,
                 CAST(NTILE(5) OVER (ORDER BY monetary, user_id) AS INT) AS mb
          FROM r)
        SELECT user_id, recency_days, frequency, monetary,
               6 - rb AS r, fb AS f, mb AS m,
               (6 - rb) * 100 + fb * 10 + mb AS rfm
        FROM b ORDER BY user_id""")),

    // Minimum detectable effect for the q7c experiment: the planning
    // number next to the readout. Explicit z literals (1.959964 + 0.841621
    // — 5% two-sided / 80% power), one sqrt; null-guarded like the z-test.
    "q7k_experiment_mde" -> Q(
      fn = (s, dir) => {
        val e = ev(s, dir)
        val v0 = e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("ts_ms")).as("t0"))
        val converted = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts_ms"))
          .join(v0, "user_id")
          .filter(col("ts_ms") > col("t0") &&
            col("ts_ms") <= col("t0") + lit(86400000L))
          .select(col("user_id")).distinct()
          .withColumn("__c", lit(1))
        val per = v0.join(converted, Seq("user_id"), "left")
          .select((col("user_id") % 2).cast("int").as("arm"),
            coalesce(col("__c"), lit(0)).as("conv"))
        graft.operators.Experiment.minDetectableEffect(per, "arm", "conv")
      },
      oracle = Some("""
        WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
        v0 AS (SELECT user_id, MIN(ts_ms) AS t0 FROM e
               WHERE event_type = 'view' GROUP BY 1),
        cv AS (SELECT DISTINCT e.user_id FROM e JOIN v0 USING (user_id)
               WHERE e.event_type = 'purchase' AND e.ts_ms > v0.t0
                 AND e.ts_ms <= v0.t0 + 86400000),
        per AS (
          SELECT CAST(v0.user_id % 2 AS INT) AS arm,
                 CASE WHEN cv.user_id IS NOT NULL THEN 1 ELSE 0 END AS conv
          FROM v0 LEFT JOIN cv ON cv.user_id = v0.user_id),
        g AS (
          SELECT CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                 CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
                 CAST(SUM(conv) AS BIGINT) AS x_pooled
          FROM per),
        m AS (
          SELECT n_a, n_b, LEAST(n_a, n_b) AS n_eff, x_pooled,
                 CAST(x_pooled AS DOUBLE) / (CAST(n_a AS DOUBLE) + n_b) AS p,
                 (CAST(1.959964 AS DOUBLE) + CAST(0.841621 AS DOUBLE))
                   * SQRT(CAST(2 AS DOUBLE)
                     * (CAST(x_pooled AS DOUBLE) / (CAST(n_a AS DOUBLE) + n_b))
                     * (CAST(1 AS DOUBLE)
                        - CAST(x_pooled AS DOUBLE) / (CAST(n_a AS DOUBLE) + n_b))
                     / LEAST(n_a, n_b)) AS mde
          FROM g)
        SELECT n_a, n_b, n_eff, x_pooled,
               ROUND(p, 6) AS p_base,
               CASE WHEN p > 0 AND p < 1 THEN ROUND(mde, 6) END AS mde_abs,
               CASE WHEN p > 0 AND p < 1 THEN ROUND(mde / p, 6) END AS mde_rel
        FROM m""")),

    // Holt backtest: q7d's fit with one-step-ahead in-sample MAE/RMSE
    // accumulated INSIDE the fold (4-state accumulator — level, trend,
    // sum|e|, sum e²; the oracle must carry it as a LIST, the q7d
    // struct-mutation finding). The forecast-honesty number.
    "q7l_holt_backtest" -> Q(
      fn = (s, dir) => {
        val daily = ev(s, dir)
          .withColumn("day", expr("ts_ms div 86400000"))
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).cast("double").as("y"))
        graft.operators.Forecast.holtBacktest(daily, "event_type", "day", "y",
            alpha = 0.5, beta = 0.25, horizon = 7)
          .orderBy(col("event_type"))
      },
      oracle = Some("""
        WITH d AS (
          SELECT event_type, epoch_ms(ts) // 86400000 AS day,
                 CAST(COUNT(*) AS DOUBLE) AS y
          FROM events GROUP BY 1, 2),
        s AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_obs,
                 list(y ORDER BY day) AS ys
          FROM d GROUP BY 1),
        f AS (
          SELECT event_type, n_obs,
                 list_reduce(
                   list_prepend([ys[1], CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
                                 CAST(0 AS DOUBLE)],
                     list_transform(ys[2:], x -> [x, CAST(0 AS DOUBLE),
                                 CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)])),
                   (acc, e) -> [
                     ROUND(CAST(0.5 AS DOUBLE) * e[1]
                       + CAST(0.5 AS DOUBLE) * (acc[1] + acc[2]), 9),
                     ROUND(CAST(0.25 AS DOUBLE)
                       * (ROUND(CAST(0.5 AS DOUBLE) * e[1]
                           + CAST(0.5 AS DOUBLE) * (acc[1] + acc[2]), 9)
                          - acc[1])
                       + CAST(0.75 AS DOUBLE) * acc[2], 9),
                     ROUND(acc[3]
                       + ROUND(ABS(e[1] - (acc[1] + acc[2])), 9), 9),
                     ROUND(acc[4]
                       + ROUND((e[1] - (acc[1] + acc[2]))
                           * (e[1] - (acc[1] + acc[2])), 9), 9)]) AS st
          FROM s)
        SELECT event_type, n_obs,
               ROUND(st[1], 6) AS level,
               ROUND(st[2], 6) + CAST(0 AS DOUBLE) AS trend,
               ROUND(st[1] + CAST(7 AS DOUBLE) * st[2], 6)
                 + CAST(0 AS DOUBLE) AS forecast_7,
               CASE WHEN n_obs > 1
                    THEN ROUND(st[3] / (n_obs - 1), 6) END AS mae,
               CASE WHEN n_obs > 1
                    THEN ROUND(SQRT(st[4] / (n_obs - 1)), 6) END AS rmse
        FROM f ORDER BY event_type""")),

    // Welch's unequal-variance t-test on per-user purchase mass across
    // the parity arms — the continuous-metric companion to q7c's
    // proportion test: exact decimal power sums, 9-snapped means and
    // sample variances, Welch-Satterthwaite dof. One row.
    "q7n_welch_ttest" -> Q(
      fn = (s, dir) => {
        val per = ev(s, dir).groupBy("user_id").agg(
          coalesce(sum(when(col("event_type") === "purchase", col("value"))
            .cast("decimal(18,2)")).cast("double"), lit(0.0)).as("post"))
          .select((col("user_id") % 2).cast("int").as("arm"), col("post"))
        graft.operators.Stats.welchTTest(per, "arm", "post")
      },
      oracle = Some("""
        WITH per AS (
          SELECT CAST(user_id % 2 AS INT) AS arm,
                 COALESCE(CAST(SUM(CASE WHEN event_type = 'purchase'
                   THEN CAST(value AS DECIMAL(18,2)) END) AS DOUBLE),
                   CAST(0 AS DOUBLE)) AS post
          FROM events GROUP BY user_id),
        g AS (
          SELECT arm, CAST(COUNT(*) AS DOUBLE) AS n,
                 SUM(CAST(post AS DECIMAL(38,6))) AS s1,
                 SUM(CAST(post * post AS DECIMAL(38,6))) AS s2
          FROM per GROUP BY 1),
        w AS (
          SELECT
            MAX(CASE WHEN arm = 0 THEN n END) AS na,
            MAX(CASE WHEN arm = 0 THEN ROUND(CAST(s1 AS DOUBLE) / n, 9) END)
              AS mean_a,
            MAX(CASE WHEN arm = 0 THEN ROUND((CAST(s2 AS DOUBLE)
              - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1), 9) END)
              AS var_a,
            MAX(CASE WHEN arm = 1 THEN n END) AS nb,
            MAX(CASE WHEN arm = 1 THEN ROUND(CAST(s1 AS DOUBLE) / n, 9) END)
              AS mean_b,
            MAX(CASE WHEN arm = 1 THEN ROUND((CAST(s2 AS DOUBLE)
              - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / n) / (n - 1), 9) END)
              AS var_b
          FROM g)
        SELECT CAST(0 AS INT) AS group_a, CAST(na AS BIGINT) AS n_a,
               mean_a, var_a,
               CAST(1 AS INT) AS group_b, CAST(nb AS BIGINT) AS n_b,
               mean_b, var_b,
               CASE WHEN na > 1 AND nb > 1 AND (var_a/na + var_b/nb) > 0
                 THEN ROUND((mean_a - mean_b) / SQRT(var_a/na + var_b/nb), 6)
                   + CAST(0 AS DOUBLE) END AS t,
               CASE WHEN na > 1 AND nb > 1 AND (var_a/na + var_b/nb) > 0
                 THEN ROUND((var_a/na + var_b/nb) * (var_a/na + var_b/nb)
                   / ((var_a/na) * (var_a/na) / (na - 1)
                      + (var_b/nb) * (var_b/nb) / (nb - 1)), 3) END AS dof
        FROM w""")),

    // Mann-Whitney U on raw view-event values across the parity arms:
    // rank-based and outlier-proof, average ranks from prefix counts over
    // the aggregated distinct-value table (never a per-row rank window),
    // normal approximation with the tie correction. One row.
    "q7o_mann_whitney" -> Q(
      fn = (s, dir) => {
        val base = ev(s, dir)
          .filter(col("event_type") === "view" && col("value").isNotNull)
          .select((col("user_id") % 2).cast("int").as("arm"),
            col("value").cast("double").as("v"))
        graft.operators.Stats.mannWhitneyU(base, "arm", "v")
      },
      oracle = Some("""
        WITH base AS (
          SELECT CAST(user_id % 2 AS INT) AS grp, CAST(value AS DOUBLE) AS v
          FROM events WHERE event_type = 'view' AND value IS NOT NULL),
        lab AS (
          SELECT CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
                 CAST(SUM(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_b
          FROM base),
        bv AS (
          SELECT v, CAST(SUM(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS ca,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM base GROUP BY 1),
        r AS (
          SELECT *, COALESCE(SUM(c) OVER (ORDER BY v
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS prior
          FROM bv),
        a AS (
          SELECT SUM(CAST(CAST(ca AS DOUBLE)
                   * (CAST(prior AS DOUBLE)
                      + CAST(c + 1 AS DOUBLE) / CAST(2 AS DOUBLE))
                 AS DECIMAL(38,6))) AS r1,
                 SUM(CAST(c*c*c - c AS DECIMAL(38,0))) AS tsum
          FROM r)
        SELECT CAST(0 AS INT) AS group_a, lab.n_a,
               CAST(1 AS INT) AS group_b, lab.n_b,
               ROUND(CAST(r1 AS DOUBLE)
                 - CAST(lab.n_a AS DOUBLE) * (CAST(lab.n_a AS DOUBLE) + 1)
                   / CAST(2 AS DOUBLE), 3) AS u1,
               ROUND(CAST(lab.n_a AS DOUBLE) * CAST(lab.n_b AS DOUBLE)
                 - (CAST(r1 AS DOUBLE)
                    - CAST(lab.n_a AS DOUBLE) * (CAST(lab.n_a AS DOUBLE) + 1)
                      / CAST(2 AS DOUBLE)), 3) AS u2,
               CASE WHEN CAST(lab.n_a AS DOUBLE) * lab.n_b / 12
                   * ((CAST(lab.n_a AS DOUBLE) + lab.n_b + 1)
                      - CAST(tsum AS DOUBLE)
                        / ((CAST(lab.n_a AS DOUBLE) + lab.n_b)
                           * (CAST(lab.n_a AS DOUBLE) + lab.n_b - 1))) > 0
                 THEN ROUND(((CAST(r1 AS DOUBLE)
                     - CAST(lab.n_a AS DOUBLE) * (CAST(lab.n_a AS DOUBLE) + 1)
                       / CAST(2 AS DOUBLE))
                   - CAST(lab.n_a AS DOUBLE) * lab.n_b / CAST(2 AS DOUBLE))
                   / SQRT(CAST(lab.n_a AS DOUBLE) * lab.n_b / CAST(12 AS DOUBLE)
                     * ((CAST(lab.n_a AS DOUBLE) + lab.n_b + 1)
                        - CAST(tsum AS DOUBLE)
                          / ((CAST(lab.n_a AS DOUBLE) + lab.n_b)
                             * (CAST(lab.n_a AS DOUBLE) + lab.n_b - 1)))), 6)
                   + CAST(0 AS DOUBLE) END AS z
        FROM a, lab""")),

    // Weekly seasonality profile: per event type, day-of-week mean daily
    // volume and the seasonal index vs the type's own mean — exact
    // integer count sums, two proven-parity divisions, windows over the
    // (type x dow) aggregated table.
    "q7p_weekly_seasonality" -> Q(
      fn = (s, dir) => {
        val daily = ev(s, dir)
          .withColumn("day", expr("ts_ms div 86400000"))
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).as("y"))
        val byDow = daily
          .withColumn("dow", pmod(col("day"), lit(7)).cast("int"))
          .groupBy(col("event_type"), col("dow"))
          .agg(count(lit(1)).as("n_days"), sum(col("y")).as("__sy"))
        val tw = org.apache.spark.sql.expressions.Window
          .partitionBy("event_type")
          .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
            org.apache.spark.sql.expressions.Window.unboundedFollowing)
        byDow
          .withColumn("__dm",
            round(col("__sy").cast("double") / col("n_days"), 9))
          .withColumn("__tm",
            round(sum(col("__sy")).over(tw).cast("double") /
              sum(col("n_days")).over(tw), 9))
          .select(col("event_type"), col("dow"), col("n_days"),
            round(col("__dm"), 6).as("dow_mean"),
            round(col("__dm") / col("__tm"), 6).as("seasonal_index"))
          .orderBy(col("event_type"), col("dow"))
      },
      oracle = Some("""
        WITH d AS (
          SELECT event_type, epoch_ms(ts) // 86400000 AS day,
                 CAST(COUNT(*) AS BIGINT) AS y
          FROM events GROUP BY 1, 2),
        g AS (
          SELECT event_type, CAST(day % 7 AS INT) AS dow,
                 CAST(COUNT(*) AS BIGINT) AS n_days,
                 CAST(SUM(y) AS BIGINT) AS sy
          FROM d GROUP BY 1, 2),
        w AS (
          SELECT *, ROUND(CAST(sy AS DOUBLE) / n_days, 9) AS dm,
                 ROUND(CAST(SUM(sy) OVER (PARTITION BY event_type) AS DOUBLE)
                   / SUM(n_days) OVER (PARTITION BY event_type), 9) AS tm
          FROM g)
        SELECT event_type, dow, n_days,
               ROUND(dm, 6) AS dow_mean,
               ROUND(dm / tm, 6) AS seasonal_index
        FROM w ORDER BY event_type, dow""")),

    // CUSUM changepoint scan of total daily volume: cumulative 9-snapped
    // deviations from the snapped mean through DECIMAL(28,9), the
    // |CUSUM|-argmax day flagged — the classic level-shift monitor over
    // the aggregated series table.
    "q7q_cusum_changepoint" -> Q(
      fn = (s, dir) => {
        val daily = ev(s, dir)
          .withColumn("day", expr("ts_ms div 86400000"))
          .groupBy(col("day"))
          .agg(count(lit(1)).cast("double").as("y"))
        graft.operators.Stats.cusum(daily, "day", "y")
          .orderBy(col("day"))
      },
      oracle = Some("""
        WITH d AS (
          SELECT epoch_ms(ts) // 86400000 AS day,
                 CAST(COUNT(*) AS DOUBLE) AS y
          FROM events GROUP BY 1),
        m AS (
          SELECT ROUND(CAST(SUM(CAST(y AS DECIMAL(28,6))) AS DOUBLE)
                   / COUNT(*), 9) AS mean
          FROM d),
        c AS (
          SELECT day, y, ROUND(y - m.mean, 9) AS dev FROM d, m),
        s AS (
          SELECT day, y,
                 ROUND(CAST(SUM(CAST(dev AS DECIMAL(28,9))) OVER (ORDER BY day
                   ROWS UNBOUNDED PRECEDING) AS DOUBLE), 6)
                   + CAST(0 AS DOUBLE) AS cusum
          FROM c)
        SELECT day, y, cusum,
               ABS(cusum) = MAX(ABS(cusum)) OVER () AS is_changepoint
        FROM s ORDER BY day""")),

    // Additive Holt-Winters (weekly seasonality) on daily volume per
    // type: the 9-element rotating-ring fold — [level, trend, s_cur..s+6]
    // — with per-step 9-snaps on all three updated states; the oracle
    // replays the identical ring as a pure LIST accumulator. Forecast
    // adds the matching seasonal slot.
    "q7r_holt_winters" -> Q(
      fn = (s, dir) => {
        val daily = ev(s, dir)
          .withColumn("day", expr("ts_ms div 86400000"))
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).cast("double").as("y"))
        graft.operators.Forecast.holtWinters(daily, "event_type", "day", "y",
            alpha = 0.5, beta = 0.25, gamma = 0.25, period = 7, horizon = 7)
          .orderBy(col("event_type"))
      },
      oracle = Some("""
        WITH d AS (
          SELECT event_type, epoch_ms(ts) // 86400000 AS day,
                 CAST(COUNT(*) AS DOUBLE) AS y
          FROM events GROUP BY 1, 2),
        s AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_obs,
                 list(y ORDER BY day) AS ys
          FROM d GROUP BY 1),
        f AS (
          SELECT event_type, n_obs,
                 list_reduce(
                   list_prepend([ys[1], CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
                       CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
                       CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)],
                     list_transform(ys[2:], x -> [x, CAST(0 AS DOUBLE),
                       CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
                       CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
                       CAST(0 AS DOUBLE)])),
                   (acc, e) -> [
                     ROUND(CAST(0.5 AS DOUBLE) * (e[1] - acc[3])
                       + CAST(0.5 AS DOUBLE) * (acc[1] + acc[2]), 9),
                     ROUND(CAST(0.25 AS DOUBLE)
                       * (ROUND(CAST(0.5 AS DOUBLE) * (e[1] - acc[3])
                           + CAST(0.5 AS DOUBLE) * (acc[1] + acc[2]), 9)
                          - acc[1])
                       + CAST(0.75 AS DOUBLE) * acc[2], 9),
                     acc[4], acc[5], acc[6], acc[7], acc[8], acc[9],
                     ROUND(CAST(0.25 AS DOUBLE)
                       * (e[1] - ROUND(CAST(0.5 AS DOUBLE) * (e[1] - acc[3])
                           + CAST(0.5 AS DOUBLE) * (acc[1] + acc[2]), 9))
                       + CAST(0.75 AS DOUBLE) * acc[3], 9)]) AS st
          FROM s)
        SELECT event_type, n_obs,
               ROUND(st[1], 6) AS level,
               ROUND(st[2], 6) + CAST(0 AS DOUBLE) AS trend,
               ROUND(st[3], 6) + CAST(0 AS DOUBLE) AS s_next,
               ROUND(st[1] + CAST(7 AS DOUBLE) * st[2] + st[9], 6)
                 + CAST(0 AS DOUBLE) AS forecast_7
        FROM f ORDER BY event_type""")),

    // k-anonymity profile of the (event_type, hour-of-day, value-band)
    // quasi-identifier: equivalence-class sizes, the achieved k, and the
    // suppression rate a k=20 release would pay — the disclosure-risk
    // audit before any data release. Exact integers + one division.
    "q7s_k_anonymity" -> Q(
      fn = (s, dir) => {
        val e = ev(s, dir)
          .withColumn("hod", (expr("ts_ms div 3600000") % 24).cast("int"))
          .withColumn("vband",
            coalesce(floor(col("value") / lit(100.0)).cast("long"), lit(-1L)))
        graft.operators.Privacy.kAnonymityProfile(
            e.select(col("event_type"), col("hod"), col("vband")),
            Seq("event_type", "hod", "vband"), k = 20L)
          .orderBy(col("event_type"), col("hod"), col("vband"))
      },
      oracle = Some("""
        WITH c AS (
          SELECT event_type,
                 CAST((epoch_ms(ts) // 3600000) % 24 AS INT) AS hod,
                 CAST(COALESCE(FLOOR(CAST(value AS DOUBLE) / 100), -1)
                   AS BIGINT) AS vband,
                 CAST(COUNT(*) AS BIGINT) AS class_size
          FROM events GROUP BY 1, 2, 3)
        SELECT event_type, hod, vband, class_size,
               class_size < 20 AS violates,
               CAST(COUNT(*) OVER () AS BIGINT) AS n_classes,
               CAST(SUM(class_size) OVER () AS BIGINT) AS n_rows,
               CAST(MIN(class_size) OVER () AS BIGINT) AS k_achieved,
               ROUND(CAST(SUM(CASE WHEN class_size < 20 THEN class_size
                   ELSE 0 END) OVER () AS DOUBLE)
                 / SUM(class_size) OVER (), 6) AS suppression_rate
        FROM c ORDER BY event_type, hod, vband""")),

    // eps-DP noisy counts per event type (eps = 0.5): DETERMINISTIC
    // Laplace noise from the salted md5 uniform through the inverse CDF —
    // hex-parse + ln parity (the q4d recipe), so the release replays
    // exactly; rotating the salt rotates the noise. n_true kept for the
    // audit (a real release drops it).
    "q7t_dp_counts" -> Q(
      fn = (s, dir) =>
        graft.operators.Privacy.dpCounts(ev(s, dir), "event_type",
            eps = 0.5, salt = "dp1")
          .orderBy(col("event_type")),
      oracle = Some("""
        WITH g AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_true
          FROM events WHERE event_type IS NOT NULL GROUP BY 1),
        n AS (
          SELECT *,
                 (CAST(CAST('0x' || substring(md5(event_type || 'dp1'), 1, 8)
                     AS BIGINT) AS DOUBLE) + CAST(0.5 AS DOUBLE))
                   / CAST(4294967296 AS DOUBLE) AS u
          FROM g),
        z AS (
          SELECT event_type, n_true,
                 ROUND((CAST(-1 AS DOUBLE) / CAST(0.5 AS DOUBLE))
                   * (CASE WHEN (u - CAST(0.5 AS DOUBLE)) < 0
                           THEN CAST(-1 AS DOUBLE) ELSE CAST(1 AS DOUBLE) END)
                   * LN(CAST(1 AS DOUBLE)
                       - CAST(2 AS DOUBLE) * ABS(u - CAST(0.5 AS DOUBLE))), 6)
                   + CAST(0 AS DOUBLE) AS noise
          FROM n)
        SELECT event_type, n_true, noise,
               ROUND(GREATEST(ROUND(n_true + noise, 6), CAST(0 AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS n_released
        FROM z ORDER BY event_type""")),

    // Sliding 7-day HLL union — the mergeable-sketch WINDOW pattern that
    // makes rolling distinct counts affordable at 100 TB: per-day register
    // partials are built ONCE (one corpus-linear pass), then every day's
    // trailing-7-day WAU is a max-merge over ≤7×1024 register rows —
    // sketch-sized work per window, the raw events are never rescanned.
    // Exact DAU/WAU computed alongside (affordable at fixture scale) so
    // the estimate's error is visible in the output; stickiness =
    // dau_est/wau_est. Registers, the dyadic Z sum, and the small-range
    // correction replay in DuckDB via the q4m machinery, grouped by day.
    "qcs_sliding_hll_wau" -> Q(
      fn = (s, dir) => {
        import graft.operators.HllSketch
        val e = ev(s, dir)
          .select(expr("unix_millis(ts) div 86400000").as("day"),
            col("user_id"))
        val regs = HllSketch.groupedRegisters(
          e.select(col("day").as("g"), col("user_id")), "g", "user_id")
          .localCheckpoint(eager = false)
        val days = regs.select(col("g").as("d")).distinct()
        val slid = regs.join(days,
            col("g") <= col("d") && col("g") > col("d") - lit(7L))
          .select(col("d").as("g"), col("bucket"), col("rho"))
          .groupBy("g", "bucket").agg(max("rho").as("rho"))
        val dauEst = HllSketch.groupedEstimate(regs)
          .select(col("g").as("day"), col("est_distinct").as("dau_est"))
        val wauEst = HllSketch.groupedEstimate(slid)
          .select(col("g").as("day"), col("est_distinct").as("wau_est"))
        val dauExact = e.groupBy("day")
          .agg(count_distinct(col("user_id")).as("dau_exact"))
        val wauExact = e.select(col("day").as("g"), col("user_id"))
          .join(days, col("g") <= col("d") && col("g") > col("d") - lit(7L))
          .groupBy(col("d").as("day"))
          .agg(count_distinct(col("user_id")).as("wau_exact"))
        dauExact.join(wauExact, Seq("day")).join(dauEst, Seq("day"))
          .join(wauEst, Seq("day"))
          .withColumn("stickiness", round(col("dau_est") / col("wau_est"), 6))
          .orderBy(col("day"))
      },
      oracle = Some {
        val seedLit =
          s"CAST(${java.lang.Long.toUnsignedString(graft.operators.HllSketch.Seed)} AS HUGEINT)"
        val inner = "SELECT day, " +
          OracleSql.xor64("CAST(k AS HUGEINT)", seedLit) + " AS hx FROM e"
        val (mixed, h) = OracleSql.mix64Nested(inner, "hx", "hh", keep = "day")
        val alpha = "(CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + " +
          "CAST(1.079 AS DOUBLE) / CAST(1024.0 AS DOUBLE))) * " +
          "CAST(1024.0 AS DOUBLE) * CAST(1024.0 AS DOUBLE)"
        def estCtes(regsCte: String, p: String): String = {
          val raw = s"$alpha * CAST(36028797018963968 AS DOUBLE) / CAST(zs AS DOUBLE)"
          s"""aggr_$p AS (
            SELECT day, SUM(CAST(CAST(1 AS BIGINT) << (55 - rho) AS HUGEINT)) AS zn,
                   COUNT(*) AS ne
            FROM $regsCte GROUP BY day),
          zv_$p AS (
            SELECT day, COALESCE(zn, CAST(0 AS HUGEINT))
                     + (1024 - ne) * CAST(36028797018963968 AS HUGEINT) AS zs,
                   CAST(1024 - ne AS BIGINT) AS v
            FROM aggr_$p),
          est_$p AS (
            SELECT day, ROUND(CASE WHEN v > 0 AND $raw <= CAST(2560.0 AS DOUBLE)
              THEN CAST(1024.0 AS DOUBLE) * ln(CAST(1024.0 AS DOUBLE) / CAST(v AS DOUBLE))
              ELSE $raw END, 6) AS est
            FROM zv_$p)"""
        }
        s"""
        WITH e AS MATERIALIZED (
          SELECT CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
                 CAST(user_id AS BIGINT) AS k
          FROM events WHERE user_id IS NOT NULL),
        br AS (
          SELECT day, CAST(($h) % 1024 AS INT) AS bucket,
                 CASE WHEN (($h) // 1024) = 0 THEN 55
                      ELSE 55 - LENGTH(format('{:b}', CAST(($h) // 1024 AS BIGINT)))
                 END AS rho
          FROM ($mixed)),
        regs AS MATERIALIZED (
          SELECT day, bucket, MAX(rho) AS rho FROM br GROUP BY day, bucket),
        days AS (SELECT DISTINCT day AS d FROM regs),
        slid AS MATERIALIZED (
          SELECT d.d AS day, bucket, MAX(rho) AS rho
          FROM regs r JOIN days d ON r.day <= d.d AND r.day > d.d - 7
          GROUP BY d.d, bucket),
        ${estCtes("regs", "dau")},
        ${estCtes("slid", "wau")},
        dx AS (SELECT day, CAST(COUNT(DISTINCT k) AS BIGINT) AS dau_exact
               FROM e GROUP BY day),
        wx AS (SELECT d.d AS day, CAST(COUNT(DISTINCT k) AS BIGINT) AS wau_exact
               FROM e JOIN days d ON e.day <= d.d AND e.day > d.d - 7
               GROUP BY d.d)
        SELECT dx.day, dx.dau_exact, wx.wau_exact,
               est_dau.est AS dau_est, est_wau.est AS wau_est,
               ROUND(est_dau.est / est_wau.est, 6) AS stickiness
        FROM dx JOIN wx USING (day)
        JOIN est_dau ON est_dau.day = dx.day
        JOIN est_wau ON est_wau.day = dx.day
        ORDER BY dx.day"""
      }),

    // Energy-distance two-sample test (Székely–Rizzo) between the
    // purchase and click value distributions — consistent against EVERY
    // distributional difference where KS (q6u) keys on one CDF gap and
    // rank tests see location only. Panels thinned deterministically
    // (event_id % 17 = 0) so the quadratic pair sums stay bounded at any
    // SF (the qa8 audit-panel contract); |·| distances ride EXACT
    // DECIMAL(18,2) end to end, so the pair sums are exact and the
    // statistic replays hash-exact (an RBF MMD would need exp — not
    // oracle-safe, per the q5a sigmoid lesson).
    "qcv_energy_distance" -> Q(
      fn = (s, dir) => {
        val e = ev(s, dir).filter(col("event_id") % 17 === 0)
        graft.operators.Stats.energyDistance(
          e.filter(col("event_type") === "purchase"),
          e.filter(col("event_type") === "click"),
          "event_id", "value")
      },
      oracle = Some("""
        WITH a AS MATERIALIZED (
          SELECT event_id AS id, CAST(value AS DECIMAL(18,2)) AS v
          FROM events
          WHERE event_id % 17 = 0 AND event_type = 'purchase'
            AND value IS NOT NULL),
        b AS MATERIALIZED (
          SELECT event_id AS id, CAST(value AS DECIMAL(18,2)) AS v
          FROM events
          WHERE event_id % 17 = 0 AND event_type = 'click'
            AND value IS NOT NULL),
        sab AS (SELECT SUM(ABS(a.v - b.v)) AS sab FROM a CROSS JOIN b),
        saa AS (SELECT SUM(ABS(x.v - y.v)) * 2 AS saa
                FROM a x JOIN a y ON x.id < y.id),
        sbb AS (SELECT SUM(ABS(x.v - y.v)) * 2 AS sbb
                FROM b x JOIN b y ON x.id < y.id),
        n AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM a) AS n_a,
                     (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS n_b)
        SELECT n_a, n_b,
               ROUND(CAST(2 AS DOUBLE) * CAST(sab AS DOUBLE)
                   / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
                 - COALESCE(CAST(saa AS DOUBLE), CAST(0 AS DOUBLE))
                   / (CAST(n_a AS DOUBLE) * CAST(n_a AS DOUBLE))
                 - COALESCE(CAST(sbb AS DOUBLE), CAST(0 AS DOUBLE))
                   / (CAST(n_b AS DOUBLE) * CAST(n_b AS DOUBLE)), 6) AS e_dist,
               ROUND(CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                   / (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                 * (CAST(2 AS DOUBLE) * CAST(sab AS DOUBLE)
                     / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
                   - COALESCE(CAST(saa AS DOUBLE), CAST(0 AS DOUBLE))
                     / (CAST(n_a AS DOUBLE) * CAST(n_a AS DOUBLE))
                   - COALESCE(CAST(sbb AS DOUBLE), CAST(0 AS DOUBLE))
                     / (CAST(n_b AS DOUBLE) * CAST(n_b AS DOUBLE))), 6)
                 AS t_stat
        FROM n CROSS JOIN sab CROSS JOIN saa CROSS JOIN sbb"""))
  )
}

package graft.queries

import graft.Tables
import graft.functions.TextAnalysis
import graft.operators.{Calibration, Drift, Expectations, FeatureEncode, FuzzyJoin, Intervals, Segment, Stats, VectorSearch}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 analytics families (SURVEY.md §2.12 north star), q7v–q92:
  * segmentation and ranking on the distributed global-rank primitives
  * (RFM, ABC, weighted quantiles, lift table, percent rank, Zipf),
  * feature encoding (WOE-IV, target encoding), interval analytics
  * (islands, coverage), sequence/text mining (trigrams, PMI, Heaps,
  * diversity), matching (mutual-NN exact + LSH scale path,
  * sorted-neighborhood blocking), data quality (expectations suite,
  * reconciliation, fingerprint, golden record), statistics (correlation
  * matrix, mutual information, kappa, bootstrap envelope,
  * cross-correlation, residual anomalies), pipeline ops (incremental
  * aggregates, temperature mixing, IOC extraction/correlation), and
  * relational-surface completions (pivot, cube, window gallery, salted
  * join equivalence). All hash-exact against DuckDB oracles at
  * sf0.001/0.01/0.1.
  */
object AnalyticsQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events").withColumn("ts_ms", unix_millis(col("ts")))

  val defs: Map[String, Q] = Map(

    // RFM segmentation: per-customer recency/frequency/monetary quintiles
    // via the distributed global NTILE (range-repartition + bounded offset
    // image — no one-partition window anywhere in the plan).
    "q7v_rfm" -> Q(
      fn = (s, dir) => {
        // o_orderdate ships as TIMESTAMP_NTZ; the session zone is pinned
        // UTC, so the cast lands on the instant DuckDB's epoch_ms reads.
        val o = t(s, dir, "orders")
          .select(col("o_custkey"),
            unix_millis(col("o_orderdate").cast("timestamp")).as("ts_ms"),
            col("o_totalprice"))
        Segment.rfm(o, "o_custkey", col("ts_ms"),
            col("o_totalprice").cast("decimal(18,2)"), k = 5)
          .select(col("o_custkey").as("custkey"), col("recency_ms"),
            col("frequency"), col("monetary"), col("r_score"), col("f_score"),
            col("m_score"), col("segment"))
          .orderBy(col("custkey"))
      },
      oracle = Some("""
        WITH c AS (
          SELECT o_custkey AS custkey, MAX(epoch_ms(o_orderdate)) AS recency_ms,
                 CAST(COUNT(*) AS BIGINT) AS frequency,
                 SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS mon
          FROM orders GROUP BY 1),
        s AS (
          SELECT custkey, recency_ms, frequency, mon,
                 CAST(NTILE(5) OVER (ORDER BY recency_ms DESC, custkey) AS INT) AS r_score,
                 CAST(NTILE(5) OVER (ORDER BY frequency DESC, custkey) AS INT) AS f_score,
                 CAST(NTILE(5) OVER (ORDER BY mon DESC, custkey) AS INT) AS m_score
          FROM c)
        SELECT custkey, recency_ms, frequency, CAST(mon AS DOUBLE) AS monetary,
               r_score, f_score, m_score,
               CAST(r_score * 100 + f_score * 10 + m_score AS INT) AS segment
        FROM s ORDER BY custkey"""),
      headline = true),

    // ABC / Pareto classification of parts by revenue: exact DECIMAL
    // cumulative revenue through the distributed running sum, share and
    // class from the same rounded doubles in both engines.
    "q7w_abc" -> Q(
      fn = (s, dir) => {
        val rev = t(s, dir, "lineitem")
          .groupBy(col("l_partkey"))
          .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
              .cast("decimal(18,6)"))
            .cast("decimal(18,2)").as("rev"))
        Segment.abcClassify(rev, Seq("l_partkey"), col("rev"))
          .select(col("l_partkey").as("partkey"),
            col("rev").cast("double").as("revenue"),
            col("cum_value").as("cum_revenue"), col("value_share").as("rev_share"),
            col("abc_class"))
          .orderBy(col("revenue").desc, col("partkey"))
      },
      oracle = Some("""
        WITH r AS (
          SELECT l_partkey AS partkey,
                 CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                     AS DECIMAL(18,6))), 2) AS DECIMAL(18,2)) AS rev
          FROM lineitem GROUP BY 1),
        c AS (
          SELECT partkey, rev,
                 SUM(rev) OVER (ORDER BY rev DESC, partkey
                   ROWS UNBOUNDED PRECEDING) AS cum,
                 (SELECT SUM(rev) FROM r) AS tot
          FROM r)
        SELECT partkey, CAST(rev AS DOUBLE) AS revenue,
               CAST(cum AS DOUBLE) AS cum_revenue,
               ROUND(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS rev_share,
               CASE WHEN ROUND(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE), 6)
                         <= CAST(0.8 AS DOUBLE) THEN 'A'
                    WHEN ROUND(CAST(cum AS DOUBLE) / CAST(tot AS DOUBLE), 6)
                         <= CAST(0.95 AS DOUBLE) THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM c ORDER BY revenue DESC, partkey"""),
      headline = true),

    // WOE / Information Value binning of order value against the
    // finished-order label: Laplace-smoothed per-bin weight of evidence,
    // IV terms, and the DECIMAL-summed total IV.
    "q7x_woe_iv" -> Q(
      fn = (s, dir) =>
        FeatureEncode.woeIv(t(s, dir, "orders"), col("o_totalprice"),
            (col("o_orderstatus") === "F").cast("int"),
            bins = 10, lo = 0.0, hi = 600000.0)
          .orderBy(col("bin")),
      oracle = Some("""
        WITH b AS (
          SELECT CAST(LEAST(GREATEST(CAST(FLOOR((CAST(o_totalprice AS DOUBLE)
                   - CAST(0 AS DOUBLE)) / CAST(60000 AS DOUBLE)) AS INT), 0), 9)
                 AS INT) AS bin,
                 CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
          FROM orders),
        g AS (
          SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(y) AS BIGINT) AS pos,
                 CAST(COUNT(*) - SUM(y) AS BIGINT) AS neg
          FROM b GROUP BY 1),
        w AS (
          SELECT *,
                 (CAST(pos AS DOUBLE) + CAST(0.5 AS DOUBLE))
                   / CAST(SUM(pos) OVER () AS DOUBLE) AS dpos,
                 (CAST(neg AS DOUBLE) + CAST(0.5 AS DOUBLE))
                   / CAST(SUM(neg) OVER () AS DOUBLE) AS dneg
          FROM g),
        i AS (
          SELECT bin, n, pos, neg,
                 ROUND(LN(dpos / dneg), 6) + CAST(0 AS DOUBLE) AS woe,
                 ROUND((dpos - dneg) * LN(dpos / dneg), 6)
                   + CAST(0 AS DOUBLE) AS iv_term
          FROM w)
        SELECT bin, n, pos, neg, woe, iv_term,
               CAST(SUM(CAST(iv_term AS DECIMAL(18,6))) OVER () AS DOUBLE) AS iv_total
        FROM i ORDER BY bin"""),
      headline = false),

    // Smoothed target encoding of order priority against the finished
    // label: the global prior rides in as one scalar literal, the
    // per-category encoding is a pure map-side groupBy.
    "q7y_target_encoding" -> Q(
      fn = (s, dir) =>
        FeatureEncode.targetEncode(t(s, dir, "orders"), col("o_orderpriority"),
            (col("o_orderstatus") === "F").cast("int"), m = 20.0)
          .orderBy(col("category")),
      oracle = Some("""
        WITH t AS (
          SELECT CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                   AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS prior
          FROM orders),
        g AS (
          SELECT o_orderpriority AS category, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END)
                   AS BIGINT) AS sum_y
          FROM orders GROUP BY 1)
        SELECT category, n, sum_y,
               ROUND((SELECT prior FROM t), 6) AS prior,
               ROUND((CAST(sum_y AS DOUBLE)
                   + CAST(20 AS DOUBLE) * (SELECT prior FROM t))
                 / (CAST(n AS DOUBLE) + CAST(20 AS DOUBLE)), 6) AS enc
        FROM g ORDER BY category""")),

    // Gaps-and-islands: each event opens a 30-minute activity interval;
    // overlapping-or-touching intervals merge into per-user coverage
    // islands (uptime-stitching shape).
    "q7z_islands" -> Q(
      fn = (s, dir) => {
        val e = ev(s, dir)
          .select(col("user_id"), col("event_id"), col("ts_ms"),
            (col("ts_ms") + 1800000L).as("end_ms"))
        Intervals.mergeIntervals(e, Seq("user_id"), col("ts_ms"), col("end_ms"),
            col("event_id"))
          .orderBy(col("user_id"), col("island_seq"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id, event_id, epoch_ms(ts) AS s,
                 epoch_ms(ts) + 1800000 AS en
          FROM events),
        m AS (
          SELECT *, MAX(en) OVER (PARTITION BY user_id ORDER BY s, en, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
          FROM e),
        f AS (
          SELECT *, CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END AS st
          FROM m),
        g AS (
          SELECT *, SUM(st) OVER (PARTITION BY user_id ORDER BY s, en, event_id
                 ROWS UNBOUNDED PRECEDING) AS island_seq
          FROM f)
        SELECT user_id, CAST(island_seq AS BIGINT) AS island_seq,
               MIN(s) AS island_start, MAX(en) AS island_end,
               CAST(COUNT(*) AS BIGINT) AS n_intervals,
               MAX(en) - MIN(s) AS covered_ms
        FROM g GROUP BY 1, 2 ORDER BY user_id, island_seq"""),
      headline = true),

    // Sequential pattern mining: per-user ordered event-type trigrams
    // (window leads — per-user state only), support by occurrence and by
    // distinct user.
    "q80_seq_trigrams" -> Q(
      fn = (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_ms"), col("event_id"))
        ev(s, dir)
          .withColumn("t2", lead(col("event_type"), 1).over(w))
          .withColumn("t3", lead(col("event_type"), 2).over(w))
          .filter(col("t2").isNotNull && col("t3").isNotNull)
          .select(concat_ws(">", col("event_type"), col("t2"), col("t3"))
            .as("pattern"), col("user_id"))
          .groupBy(col("pattern"))
          .agg(count(lit(1)).as("n"), countDistinct(col("user_id")).as("n_users"))
          .orderBy(col("n").desc, col("pattern"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id, event_type, epoch_ms(ts) AS ts_ms, event_id FROM events),
        l AS (
          SELECT user_id, event_type AS t1,
                 LEAD(event_type, 1) OVER (PARTITION BY user_id
                   ORDER BY ts_ms, event_id) AS t2,
                 LEAD(event_type, 2) OVER (PARTITION BY user_id
                   ORDER BY ts_ms, event_id) AS t3
          FROM e)
        SELECT t1 || '>' || t2 || '>' || t3 AS pattern,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
        FROM l WHERE t2 IS NOT NULL AND t3 IS NOT NULL
        GROUP BY 1 ORDER BY n DESC, pattern""")),

    // Mutual nearest neighbors: exact top-1 cosine neighbor each way (the
    // map-side partial top-k aggregator), pairs kept only when the match
    // is reciprocal — the high-precision entity-match filter.
    "q81_mutual_nn" -> Q(
      fn = (s, dir) => {
        val e = t(s, dir, "embeddings")
        val top1 = VectorSearch.knnJoinViaAggregator(
          e.select(col("vec_id").as("q_id"), col("embedding").as("qv")),
          e.select(col("vec_id").as("c_id"), col("embedding").as("cv")),
          "q_id", "qv", "c_id", "cv", k = 1)
        val fwd = top1.select(col("query_id").as("vec_a"),
          col("neighbor_id").as("vec_b"), col("score"))
        val rev = top1.select(col("query_id").as("r_q"), col("neighbor_id").as("r_n"))
        fwd.join(rev, fwd("vec_a") === rev("r_n") && fwd("vec_b") === rev("r_q"))
          .filter(col("vec_a") < col("vec_b"))
          .select(col("vec_a"), col("vec_b"), col("score"))
          .orderBy(col("vec_a"))
      },
      oracle = Some("""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        s AS (
          SELECT a.vec_id AS qid, b.vec_id AS nid,
                 ROUND(CAST(list_cosine_similarity(a.v, b.v) AS DOUBLE), 6) AS score
          FROM e a JOIN e b ON a.vec_id <> b.vec_id),
        t AS (
          SELECT qid, nid, score FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
              ORDER BY score DESC, nid) AS rn FROM s)
          WHERE rn = 1)
        SELECT x.qid AS vec_a, x.nid AS vec_b, x.score
        FROM t x JOIN t y ON x.qid = y.nid AND x.nid = y.qid
        WHERE x.qid < x.nid ORDER BY vec_a""")),

    // Declarative data-quality expectations: row-local checks in one
    // shared aggregate pass, uniqueness via two-phase distinct, referential
    // integrity via anti join — the ingest gate report.
    "q82_expectations" -> Q(
      fn = (s, dir) => {
        val o = t(s, dir, "orders")
        val li = t(s, dir, "lineitem")
        Expectations.suite(Seq(
          Expectations.rowChecks(o, Seq(
            "orders_custkey_not_null" -> col("o_custkey").isNotNull,
            "orders_status_accepted" -> col("o_orderstatus").isin("F", "O", "P"),
            "orders_totalprice_nonneg" -> (col("o_totalprice") >= 0))),
          Expectations.uniqueCheck(o, "orders_orderkey_unique", Seq("o_orderkey")),
          Expectations.refCheck(li, o, "lineitem_orderkey_ref",
            Seq("l_orderkey"), Seq("o_orderkey"))))
          .orderBy(col("check_name"))
      },
      oracle = Some("""
        WITH u AS (
          SELECT 'orders_custkey_not_null' AS check_name, 'row' AS kind,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM orders) AS n_rows,
                 (SELECT CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END)
                    AS BIGINT) FROM orders) AS n_violations
          UNION ALL
          SELECT 'orders_status_accepted', 'row',
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
                 (SELECT CAST(SUM(CASE WHEN o_orderstatus IN ('F','O','P')
                      THEN 0 ELSE 1 END) AS BIGINT) FROM orders)
          UNION ALL
          SELECT 'orders_totalprice_nonneg', 'row',
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
                 (SELECT CAST(SUM(CASE WHEN o_totalprice >= 0 THEN 0 ELSE 1 END)
                    AS BIGINT) FROM orders)
          UNION ALL
          SELECT 'orders_orderkey_unique', 'unique',
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM orders),
                 (SELECT CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT)
                  FROM orders)
          UNION ALL
          SELECT 'lineitem_orderkey_ref', 'ref',
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem),
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem l
                  LEFT JOIN (SELECT DISTINCT o_orderkey FROM orders) o
                    ON l.l_orderkey = o.o_orderkey
                  WHERE o.o_orderkey IS NULL))
        SELECT check_name, kind, n_rows, n_violations,
               n_violations = 0 AS passed
        FROM u ORDER BY check_name""")),

    // Exact weighted quantiles (median + p90 of price weighted by
    // quantity) per return flag: the ordered scan rides the grouped
    // global running sum — no per-group one-reducer window — and the
    // crossing test is exact DECIMAL arithmetic.
    "q83_weighted_quantiles" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_extendedprice"),
            col("l_quantity").cast("decimal(18,2)").as("w"),
            col("l_orderkey"), col("l_linenumber"))
        Stats.weightedQuantiles(li, Seq("l_returnflag"),
            col("l_extendedprice"), col("w"), Seq(500, 900),
            Seq(col("l_orderkey"), col("l_linenumber")))
          .orderBy(col("l_returnflag"))
      },
      oracle = Some("""
        WITH l AS (
          SELECT l_returnflag, l_extendedprice AS v,
                 CAST(l_quantity AS DECIMAL(18,2)) AS w,
                 l_orderkey, l_linenumber
          FROM lineitem),
        c AS (
          SELECT *,
                 SUM(w) OVER (PARTITION BY l_returnflag
                   ORDER BY v, l_orderkey, l_linenumber
                   ROWS UNBOUNDED PRECEDING) AS cumw,
                 SUM(w) OVER (PARTITION BY l_returnflag) AS totw
          FROM l)
        SELECT l_returnflag,
               MIN(CASE WHEN cumw * 1000 >= totw * 500 THEN v END) AS wq_500,
               MIN(CASE WHEN cumw * 1000 >= totw * 900 THEN v END) AS wq_900
        FROM c GROUP BY 1 ORDER BY 1"""),
      headline = true),

    // Sorted-neighborhood entity blocking: global lexicographic rank via
    // the distributed row-number primitive, candidates limited to the 3
    // next-ranked names, Jaro-Winkler pruning — the bounded-candidate ER
    // shape jaroWinklerPairs' vocabulary cap points at.
    "q84_sorted_neighborhood" -> Q(
      fn = (s, dir) =>
        FuzzyJoin.sortedNeighborhoodPairs(t(s, dir, "part"), "p_name",
            windowSize = 3, minSim = 0.85)
          .orderBy(col("str_a"), col("str_b")),
      oracle = Some("""
        WITH d AS (SELECT DISTINCT p_name AS s FROM part WHERE p_name IS NOT NULL),
        r AS (SELECT s, ROW_NUMBER() OVER (ORDER BY s) AS rn FROM d),
        p AS (
          SELECT a.s AS str_a, b.s AS str_b,
                 jaro_winkler_similarity(a.s, b.s) AS jw
          FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 3)
        SELECT str_a, str_b, ROUND(jw, 6) AS sim
        FROM p WHERE jw >= 0.85 ORDER BY str_a, str_b""")),

    // Decile gains/lift chart: orders ranked by value (the mock
    // propensity score), finished-order rate per decile, cumulative
    // capture and lift — the ranking-model acceptance report, bucketed by
    // the distributed global NTILE.
    "q85_lift_chart" -> Q(
      fn = (s, dir) =>
        Calibration.liftTable(t(s, dir, "orders"),
            col("o_totalprice"), (col("o_orderstatus") === "F").cast("int"),
            buckets = 10, tiebreaks = Seq(col("o_orderkey")))
          .orderBy(col("bucket")),
      oracle = Some("""
        WITH s AS (
          SELECT CAST(NTILE(10) OVER (ORDER BY o_totalprice DESC, o_orderkey)
                   AS INT) AS bucket,
                 CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS y
          FROM orders),
        g AS (
          SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(y) AS BIGINT) AS pos
          FROM s GROUP BY 1),
        w AS (
          SELECT *,
                 SUM(n) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cn,
                 SUM(pos) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING) AS cp,
                 SUM(n) OVER () AS tn, SUM(pos) OVER () AS tp
          FROM g)
        SELECT bucket, n, pos,
               ROUND(CAST(pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS response_rate,
               ROUND(CAST(cp AS DOUBLE) / CAST(tp AS DOUBLE), 6) AS cum_capture,
               ROUND((CAST(cp AS DOUBLE) / CAST(cn AS DOUBLE))
                 / (CAST(tp AS DOUBLE) / CAST(tn AS DOUBLE)), 6) AS cum_lift
        FROM w ORDER BY bucket""")),

    // Audience overlap: pairwise event-type co-user counts and Jaccard —
    // the segment-intersection report. Distinct (type, user) first (two-
    // phase distinct discipline), then a user-keyed self-join that
    // shuffles (type, type) pairs only.
    "q86_audience_overlap" -> Q(
      fn = (s, dir) => {
        val ut = ev(s, dir)
          .select(col("event_type"), col("user_id"))
          .filter(col("event_type").isNotNull)
          .distinct()
        val sizes = ut.groupBy(col("event_type")).agg(count(lit(1)).as("n"))
        val a = ut.select(col("event_type").as("type_a"), col("user_id"))
        val b = ut.select(col("event_type").as("type_b"), col("user_id"))
        a.join(b, Seq("user_id")).filter(col("type_a") < col("type_b"))
          .groupBy(col("type_a"), col("type_b"))
          .agg(count(lit(1)).as("n_both"))
          .join(broadcast(sizes.select(col("event_type").as("type_a"),
            col("n").as("n_a"))), Seq("type_a"))
          .join(broadcast(sizes.select(col("event_type").as("type_b"),
            col("n").as("n_b"))), Seq("type_b"))
          .select(col("type_a"), col("type_b"), col("n_a"), col("n_b"),
            col("n_both"),
            round(col("n_both").cast("double")
              / (col("n_a") + col("n_b") - col("n_both")).cast("double"), 6)
              .as("jaccard"))
          .orderBy(col("type_a"), col("type_b"))
      },
      oracle = Some("""
        WITH ut AS (
          SELECT DISTINCT event_type, user_id FROM events
          WHERE event_type IS NOT NULL),
        sz AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n
          FROM ut GROUP BY 1),
        p AS (
          SELECT a.event_type AS type_a, b.event_type AS type_b,
                 CAST(COUNT(*) AS BIGINT) AS n_both
          FROM ut a JOIN ut b ON a.user_id = b.user_id
            AND a.event_type < b.event_type
          GROUP BY 1, 2)
        SELECT type_a, type_b, sa.n AS n_a, sb.n AS n_b, n_both,
               ROUND(CAST(n_both AS DOUBLE)
                 / CAST(sa.n + sb.n - n_both AS DOUBLE), 6) AS jaccard
        FROM p JOIN sz sa ON p.type_a = sa.event_type
               JOIN sz sb ON p.type_b = sb.event_type
        ORDER BY type_a, type_b""")),

    // Vocabulary drift: token-distribution PSI between the even- and
    // odd-doc halves of the corpus — the text twin of q5l's categorical
    // drift, token counts through the same smoothed-PSI core.
    "q87_vocab_drift" -> Q(
      fn = (s, dir) => {
        val toks = Tables(s, dir, "documents")
          .select(col("doc_id"),
            explode(TextAnalysis.tokens(col("text"))).as("tok"))
        Drift.categoricalDrift(
            toks.filter(pmod(col("doc_id"), lit(2)) === 0),
            toks.filter(pmod(col("doc_id"), lit(2)) === 1), "tok")
          .select(col("value"), col("n_ref"), col("n_cur"),
            round(col("p_ref"), 6).as("p_ref"),
            round(col("p_cur"), 6).as("p_cur"),
            round(col("psi_term"), 6).as("psi_term"))
          .orderBy(col("value"))
      },
      oracle = Some("""
        WITH tk AS (
          SELECT doc_id,
                 unnest(regexp_split_to_array(trim(text), '\s+')) AS value
          FROM documents),
        rc AS (
          SELECT value, CAST(COUNT(*) AS BIGINT) AS n_ref
          FROM tk WHERE doc_id % 2 = 0 GROUP BY 1),
        cc AS (
          SELECT value, CAST(COUNT(*) AS BIGINT) AS n_cur
          FROM tk WHERE doc_id % 2 = 1 GROUP BY 1),
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

    // Forecast-residual anomaly monitor: Holt one-step-ahead residuals on
    // daily per-type volume, flagged beyond 2 sigma (backtest RMSE). The
    // fold carries every step's 9-snapped residual in the q7d LIST-
    // accumulator discipline; the oracle replays it with a growing list.
    "q88_holt_residual_anomalies" -> Q(
      fn = (s, dir) => {
        val daily = ev(s, dir)
          .withColumn("day", expr("ts_ms div 86400000"))
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).cast("double").as("y"))
        graft.operators.Forecast.holtResidualAnomalies(daily, "event_type",
            "day", "y", alpha = 0.5, beta = 0.25, z = 2.0)
          .select(col("event_type"), col("o").as("day"), col("y"),
            col("resid"), col("sigma"), col("is_anomaly"))
          .orderBy(col("event_type"), col("day"))
      },
      oracle = Some("""
        WITH d AS (
          SELECT event_type, epoch_ms(ts) // 86400000 AS day,
                 CAST(COUNT(*) AS DOUBLE) AS y
          FROM events GROUP BY 1, 2),
        s AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_obs,
                 list(y ORDER BY day) AS ys,
                 list(day ORDER BY day) AS ds
          FROM d GROUP BY 1),
        f AS (
          -- LIST accumulator [l, b, sse, r_1, r_2, ...] (struct accs
          -- mutate in place — CLAUDE.md); each step appends its 9-snapped
          -- one-step-ahead residual
          SELECT event_type, n_obs, ys, ds,
                 list_reduce(
                   list_prepend([ys[1], CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)],
                     list_transform(ys[2:], x -> [x])),
                   (acc, e) -> list_concat(list_concat([
                     ROUND(CAST(0.5 AS DOUBLE) * e[1]
                       + CAST(0.5 AS DOUBLE) * (acc[1] + acc[2]), 9),
                     ROUND(CAST(0.25 AS DOUBLE)
                       * (ROUND(CAST(0.5 AS DOUBLE) * e[1]
                           + CAST(0.5 AS DOUBLE) * (acc[1] + acc[2]), 9)
                          - acc[1])
                       + CAST(0.75 AS DOUBLE) * acc[2], 9),
                     ROUND(acc[3] + ROUND((e[1] - (acc[1] + acc[2]))
                       * (e[1] - (acc[1] + acc[2])), 9), 9)],
                     acc[4:]),
                     [ROUND(e[1] - (acc[1] + acc[2]), 9)])) AS st
          FROM s WHERE n_obs > 1),
        g AS (
          SELECT event_type,
                 ROUND(SQRT(st[3] / CAST(n_obs - 1 AS DOUBLE)), 6) AS sigma,
                 st[4:] AS rs, ys, ds
          FROM f),
        x AS (
          SELECT event_type, sigma,
                 unnest(list_transform(range(1, len(rs) + 1),
                   i -> {'d': ds[i + 1], 'y': ys[i + 1], 'r': rs[i]})) AS u
          FROM g)
        SELECT event_type, u['d'] AS day, u['y'] AS y,
               ROUND(u['r'], 6) + CAST(0 AS DOUBLE) AS resid, sigma,
               ABS(u['r']) > CAST(2 AS DOUBLE) * sigma AS is_anomaly
        FROM x ORDER BY event_type, day""")),

    // Split-conformal interval on the q88 forecaster: calibration = the
    // first 14 one-step residuals per type, q̂ = the ⌈15·0.8⌉ = 12th
    // smallest |residual| (exact order statistic, rank computed in
    // BigDecimal driver-side), empirical holdout coverage reported — the
    // distribution-free honest band next to q88's gaussian z·σ. The
    // oracle replays the q88 fold verbatim, then pure window ranks.
    "qcu_conformal_interval" -> Q(
      fn = (s, dir) => {
        val daily = ev(s, dir)
          .withColumn("day", expr("ts_ms div 86400000"))
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).cast("double").as("y"))
        graft.operators.Forecast.conformalHoltInterval(daily, "event_type",
            "day", "y", alpha = 0.5, beta = 0.25, calN = 14, miscoverage = 0.2)
          .orderBy(col("event_type"))
      },
      oracle = Some("""
        WITH d AS (
          SELECT event_type, epoch_ms(ts) // 86400000 AS day,
                 CAST(COUNT(*) AS DOUBLE) AS y
          FROM events GROUP BY 1, 2),
        s AS (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_obs,
                 list(y ORDER BY day) AS ys,
                 list(day ORDER BY day) AS ds
          FROM d GROUP BY 1),
        f AS (
          SELECT event_type, n_obs, ys, ds,
                 list_reduce(
                   list_prepend([ys[1], CAST(0 AS DOUBLE), CAST(0 AS DOUBLE)],
                     list_transform(ys[2:], x -> [x])),
                   (acc, e) -> list_concat(list_concat([
                     ROUND(CAST(0.5 AS DOUBLE) * e[1]
                       + CAST(0.5 AS DOUBLE) * (acc[1] + acc[2]), 9),
                     ROUND(CAST(0.25 AS DOUBLE)
                       * (ROUND(CAST(0.5 AS DOUBLE) * e[1]
                           + CAST(0.5 AS DOUBLE) * (acc[1] + acc[2]), 9)
                          - acc[1])
                       + CAST(0.75 AS DOUBLE) * acc[2], 9),
                     ROUND(acc[3] + ROUND((e[1] - (acc[1] + acc[2]))
                       * (e[1] - (acc[1] + acc[2])), 9), 9)],
                     acc[4:]),
                     [ROUND(e[1] - (acc[1] + acc[2]), 9)])) AS st
          FROM s WHERE n_obs > 1),
        x AS (
          SELECT event_type,
                 unnest(list_transform(range(1, len(st[4:]) + 1),
                   i -> {'d': ds[i + 1], 'r': st[4:][i]})) AS u
          FROM f),
        rr AS (
          SELECT event_type, u['d'] AS day, ABS(ROUND(u['r'], 6)) AS ar
          FROM x),
        pos AS (
          SELECT event_type, day, ar,
                 ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS pos
          FROM rr),
        qh AS (
          SELECT event_type, ar AS q_hat FROM (
            SELECT event_type, ar,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                     ORDER BY ar, day) AS rk
            FROM pos WHERE pos <= 14)
          WHERE rk = 12),
        t AS (
          SELECT pos.event_type,
                 CAST(COUNT(*) AS BIGINT) AS n_test,
                 CAST(SUM(CASE WHEN ar <= q_hat THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_covered,
                 MAX(q_hat) AS q_hat
          FROM pos JOIN qh ON qh.event_type = pos.event_type
          WHERE pos.pos > 14
          GROUP BY pos.event_type)
        SELECT event_type, CAST(14 AS INT) AS n_cal, n_test, q_hat,
               ROUND(CAST(n_covered AS DOUBLE) / CAST(n_test AS DOUBLE), 6)
                 AS coverage,
               ROUND(CAST(2 AS DOUBLE) * q_hat, 6) AS width
        FROM t ORDER BY event_type""")),

    // Incremental aggregate maintenance, proven by construction: the
    // Spark side builds yesterday's per-priority aggregate (orderkey % 7
    // != 0), applies an op-weighted delta (inserts: % 7 = 0; deletes:
    // % 5 = 0 among the base), and the ORACLE recomputes the final set
    // from scratch — hash equality IS the incremental-correctness proof.
    "q89_incremental_agg" -> Q(
      fn = (s, dir) => {
        val o = t(s, dir, "orders")
        val price = col("o_totalprice").cast("decimal(18,2)")
        val base = o.filter(col("o_orderkey") % 7 =!= 0)
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), sum(price).as("total"))
        val inserts = o.filter(col("o_orderkey") % 7 === 0)
          .withColumn("__op", lit(1L))
        val deletes = o.filter(col("o_orderkey") % 7 =!= 0
            && col("o_orderkey") % 5 === 0)
          .withColumn("__op", lit(-1L))
        graft.operators.Merge.incrementalSumAgg(
            base, inserts.unionByName(deletes), Seq("o_orderpriority"),
            col("__op"), Seq("total" -> price))
          .select(col("o_orderpriority"), col("n"),
            col("total").cast("double").as("total"))
          .orderBy(col("o_orderpriority"))
      },
      oracle = Some("""
        SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
        FROM orders
        WHERE o_orderkey % 7 = 0 OR o_orderkey % 5 <> 0
        GROUP BY 1 ORDER BY 1""")),

    // Recommender evaluation: global top-10 popular parts as the static
    // recommendation list, hit rate and MRR over per-order relevant sets.
    // 1/rank rides DECIMAL(18,9) so the cross-order mean is order-free.
    "q8a_recsys_eval" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem")
        val top = li.groupBy(col("l_partkey"))
          .agg(count(lit(1)).as("cnt"))
          .orderBy(col("cnt").desc, col("l_partkey"))
          .limit(10)
          .withColumn("rank", row_number().over(
            Window.orderBy(col("cnt").desc, col("l_partkey"))))
          .select(col("l_partkey"), col("rank"))
        val perOrder = li.select(col("l_orderkey"), col("l_partkey")).distinct()
          .join(broadcast(top), Seq("l_partkey"), "left")
          .groupBy(col("l_orderkey"))
          .agg(min(col("rank")).as("best_rank"))
        perOrder.agg(
          count(lit(1)).as("n_orders"),
          sum(when(col("best_rank").isNotNull, 1L).otherwise(0L)).as("hits"),
          round(sum(when(col("best_rank").isNotNull, 1L).otherwise(0L))
            .cast("double") / count(lit(1)).cast("double"), 6).as("hit_rate"),
          round(sum(coalesce(
              round(lit(1.0) / col("best_rank").cast("double"), 9), lit(0.0))
              .cast("decimal(18,9)")).cast("double")
            / count(lit(1)).cast("double"), 6).as("mrr"))
      },
      oracle = Some("""
        WITH top AS (
          SELECT l_partkey, CAST(ROW_NUMBER() OVER (ORDER BY cnt DESC,
                   l_partkey) AS INT) AS rank
          FROM (SELECT l_partkey, COUNT(*) AS cnt FROM lineitem GROUP BY 1)
          ORDER BY cnt DESC, l_partkey LIMIT 10),
        o AS (
          SELECT d.l_orderkey, MIN(top.rank) AS best_rank
          FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) d
          LEFT JOIN top ON d.l_partkey = top.l_partkey
          GROUP BY 1)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CASE WHEN best_rank IS NOT NULL THEN 1 ELSE 0 END)
                 AS BIGINT) AS hits,
               ROUND(CAST(SUM(CASE WHEN best_rank IS NOT NULL THEN 1 ELSE 0 END)
                   AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS hit_rate,
               ROUND(CAST(SUM(CAST(COALESCE(
                     ROUND(CAST(1 AS DOUBLE) / best_rank, 9), 0)
                   AS DECIMAL(18,9))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS mrr
        FROM o""")),

    // Per-user coverage rollup over the q7z islands: island count, total
    // covered time and interior gap time — the uptime report.
    "q8b_coverage" -> Q(
      fn = (s, dir) => {
        val e = ev(s, dir)
          .select(col("user_id"), col("event_id"), col("ts_ms"),
            (col("ts_ms") + 1800000L).as("end_ms"))
        Intervals.coverageStats(
            Intervals.mergeIntervals(e, Seq("user_id"), col("ts_ms"),
              col("end_ms"), col("event_id")), Seq("user_id"))
          .orderBy(col("user_id"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id, event_id, epoch_ms(ts) AS s,
                 epoch_ms(ts) + 1800000 AS en
          FROM events),
        m AS (
          SELECT *, MAX(en) OVER (PARTITION BY user_id ORDER BY s, en, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pmax
          FROM e),
        f AS (
          SELECT *, CASE WHEN pmax IS NULL OR s > pmax THEN 1 ELSE 0 END AS st
          FROM m),
        g AS (
          SELECT *, SUM(st) OVER (PARTITION BY user_id ORDER BY s, en, event_id
                 ROWS UNBOUNDED PRECEDING) AS island_seq
          FROM f),
        i AS (
          SELECT user_id, island_seq, MIN(s) AS island_start,
                 MAX(en) AS island_end, MAX(en) - MIN(s) AS covered_ms
          FROM g GROUP BY 1, 2)
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_islands,
               CAST(SUM(covered_ms) AS BIGINT) AS covered_ms,
               CAST(MAX(island_end) - MIN(island_start) - SUM(covered_ms)
                 AS BIGINT) AS gap_ms
        FROM i GROUP BY 1 ORDER BY user_id""")),

    // Pairwise Pearson correlation matrix over the lineitem numeric
    // columns: ONE aggregate pass carries all sums/squares/products
    // through exact DECIMAL(38,6); each r is a fixed double chain.
    "q8c_correlation_matrix" -> Q(
      fn = (s, dir) =>
        Stats.correlationMatrix(t(s, dir, "lineitem"),
            Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
          .orderBy(col("col_a"), col("col_b")),
      oracle = Some("""
        WITH b AS (
          SELECT CAST(l_quantity AS DOUBLE) AS c1,
                 CAST(l_extendedprice AS DOUBLE) AS c2,
                 CAST(l_discount AS DOUBLE) AS c3,
                 CAST(l_tax AS DOUBLE) AS c4
          FROM lineitem
          WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
            AND l_discount IS NOT NULL AND l_tax IS NOT NULL),
        a AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(ROUND(c1, 6) AS DECIMAL(38,6))) AS s1,
                 SUM(CAST(ROUND(c1*c1, 6) AS DECIMAL(38,6))) AS ss1,
                 SUM(CAST(ROUND(c2, 6) AS DECIMAL(38,6))) AS s2,
                 SUM(CAST(ROUND(c2*c2, 6) AS DECIMAL(38,6))) AS ss2,
                 SUM(CAST(ROUND(c3, 6) AS DECIMAL(38,6))) AS s3,
                 SUM(CAST(ROUND(c3*c3, 6) AS DECIMAL(38,6))) AS ss3,
                 SUM(CAST(ROUND(c4, 6) AS DECIMAL(38,6))) AS s4,
                 SUM(CAST(ROUND(c4*c4, 6) AS DECIMAL(38,6))) AS ss4,
                 SUM(CAST(ROUND(c1*c2, 6) AS DECIMAL(38,6))) AS p12,
                 SUM(CAST(ROUND(c1*c3, 6) AS DECIMAL(38,6))) AS p13,
                 SUM(CAST(ROUND(c1*c4, 6) AS DECIMAL(38,6))) AS p14,
                 SUM(CAST(ROUND(c2*c3, 6) AS DECIMAL(38,6))) AS p23,
                 SUM(CAST(ROUND(c2*c4, 6) AS DECIMAL(38,6))) AS p24,
                 SUM(CAST(ROUND(c3*c4, 6) AS DECIMAL(38,6))) AS p34
          FROM b),
        m AS (
          SELECT n, CAST(n AS DOUBLE) AS nd,
                 CAST(s1 AS DOUBLE) AS d1, CAST(ss1 AS DOUBLE) AS e1,
                 CAST(s2 AS DOUBLE) AS d2, CAST(ss2 AS DOUBLE) AS e2,
                 CAST(s3 AS DOUBLE) AS d3, CAST(ss3 AS DOUBLE) AS e3,
                 CAST(s4 AS DOUBLE) AS d4, CAST(ss4 AS DOUBLE) AS e4,
                 CAST(p12 AS DOUBLE) AS q12, CAST(p13 AS DOUBLE) AS q13,
                 CAST(p14 AS DOUBLE) AS q14, CAST(p23 AS DOUBLE) AS q23,
                 CAST(p24 AS DOUBLE) AS q24, CAST(p34 AS DOUBLE) AS q34
          FROM a)
        SELECT col_a, col_b, n,
               CASE WHEN (ea/nd - (sa/nd)*(sa/nd)) > 0
                     AND (eb/nd - (sb/nd)*(sb/nd)) > 0
                    THEN ROUND((sp/nd - (sa/nd)*(sb/nd))
                      / SQRT((ea/nd - (sa/nd)*(sa/nd))
                           * (eb/nd - (sb/nd)*(sb/nd))), 6) END AS r
        FROM (
          SELECT n, nd, 'l_extendedprice' AS col_a, 'l_discount' AS col_b,
                 d2 AS sa, e2 AS ea, d3 AS sb, e3 AS eb, q23 AS sp FROM m
          UNION ALL
          SELECT n, nd, 'l_discount', 'l_tax', d3, e3, d4, e4, q34 FROM m
          UNION ALL
          SELECT n, nd, 'l_extendedprice', 'l_tax', d2, e2, d4, e4, q24 FROM m
          UNION ALL
          SELECT n, nd, 'l_quantity', 'l_discount', d1, e1, d3, e3, q13 FROM m
          UNION ALL
          SELECT n, nd, 'l_quantity', 'l_extendedprice', d1, e1, d2, e2, q12 FROM m
          UNION ALL
          SELECT n, nd, 'l_quantity', 'l_tax', d1, e1, d4, e4, q14 FROM m)
        ORDER BY col_a, col_b""")),

    // Mutual information between event type and day-of-week (nats):
    // joint cells from one map-side groupBy, marginals over the bounded
    // cell table, total MI through DECIMAL.
    "q8d_mutual_info" -> Q(
      fn = (s, dir) => {
        val e = ev(s, dir)
          .withColumn("dow", (expr("ts_ms div 86400000") % 7).cast("int"))
        Stats.mutualInformation(e, col("event_type"), col("dow"))
          .orderBy(col("x"), col("y"))
      },
      oracle = Some("""
        WITH c AS (
          SELECT event_type AS x,
                 CAST((epoch_ms(ts) // 86400000) % 7 AS INT) AS y,
                 CAST(COUNT(*) AS BIGINT) AS n_xy
          FROM events WHERE event_type IS NOT NULL
          GROUP BY 1, 2),
        w AS (
          SELECT *,
                 CAST(n_xy AS DOUBLE)
                   / CAST(SUM(n_xy) OVER () AS DOUBLE) AS pxy,
                 CAST(SUM(n_xy) OVER (PARTITION BY x) AS DOUBLE)
                   / CAST(SUM(n_xy) OVER () AS DOUBLE) AS px,
                 CAST(SUM(n_xy) OVER (PARTITION BY y) AS DOUBLE)
                   / CAST(SUM(n_xy) OVER () AS DOUBLE) AS py
          FROM c),
        i AS (
          SELECT x, y, n_xy, ROUND(pxy, 6) AS p_xy,
                 ROUND(pxy * LN(pxy / (px * py)), 6)
                   + CAST(0 AS DOUBLE) AS mi_term
          FROM w)
        SELECT x, y, n_xy, p_xy, mi_term,
               CAST(SUM(CAST(mi_term AS DECIMAL(18,6))) OVER () AS DOUBLE)
                 AS mi_total
        FROM i ORDER BY x, y""")),

    // Bigram collocations by pointwise mutual information: adjacent-token
    // pair counts vs unigram marginals (min pair count 5), top 20 —
    // the phrase-discovery op of the text pipeline.
    "q8e_collocations" -> Q(
      fn = (s, dir) => {
        val toks = Tables(s, dir, "documents")
          .select(col("doc_id"),
            posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "tok")))
        val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val pairs = toks
          .withColumn("nxt", lead(col("tok"), 1).over(w))
          .filter(col("nxt").isNotNull)
          .groupBy(col("tok").as("tok_a"), col("nxt").as("tok_b"))
          .agg(count(lit(1)).as("n_xy"))
        val uni = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
        val totals = pairs.agg(sum(col("n_xy")).cast("double").as("np"))
          .crossJoin(uni.agg(sum(col("c")).cast("double").as("nu")))
        pairs
          .join(uni.select(col("tok").as("tok_a"), col("c").as("c_a")), "tok_a")
          .join(uni.select(col("tok").as("tok_b"), col("c").as("c_b")), "tok_b")
          .crossJoin(broadcast(totals))
          .filter(col("n_xy") >= 5)
          .select(col("tok_a"), col("tok_b"), col("n_xy"),
            round(log((col("n_xy").cast("double") / col("np"))
              / ((col("c_a").cast("double") / col("nu"))
                * (col("c_b").cast("double") / col("nu")))), 6).as("pmi"))
          .orderBy(col("pmi").desc, col("tok_a"), col("tok_b"))
          .limit(20)
      },
      oracle = Some("""
        WITH t AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ts
          FROM documents),
        u AS (SELECT unnest(ts) AS tok FROM t),
        cu AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c FROM u GROUP BY 1),
        bg AS (
          SELECT unnest(list_transform(range(1, len(ts)),
                   i -> {'a': ts[i], 'b': ts[i + 1]})) AS p
          FROM t),
        cb AS (
          SELECT p['a'] AS tok_a, p['b'] AS tok_b,
                 CAST(COUNT(*) AS BIGINT) AS n_xy
          FROM bg GROUP BY 1, 2),
        tot AS (
          SELECT (SELECT CAST(SUM(c) AS DOUBLE) FROM cu) AS nu,
                 (SELECT CAST(SUM(n_xy) AS DOUBLE) FROM cb) AS np)
        SELECT tok_a, tok_b, n_xy,
               ROUND(LN((CAST(n_xy AS DOUBLE) / np)
                 / ((CAST(ca.c AS DOUBLE) / nu)
                   * (CAST(cbu.c AS DOUBLE) / nu))), 6) AS pmi
        FROM cb
        JOIN cu ca ON cb.tok_a = ca.tok
        JOIN cu cbu ON cb.tok_b = cbu.tok, tot
        WHERE n_xy >= 5
        ORDER BY pmi DESC, tok_a, tok_b LIMIT 20""")),

    // Vocabulary growth (Heaps-law diagnostic) over bigram types: distinct
    // bigrams first seen by geometric document checkpoints (1/2/5/10/20/
    // 100% of the corpus), with the log-log Heaps exponent fitted over the
    // checkpoint curve. First-occurrence via min-doc aggregation — no
    // quadratic prefix-distinct anywhere.
    "q8f_vocab_growth" -> Q(
      fn = (s, dir) => {
        val toks = Tables(s, dir, "documents")
          .select(col("doc_id"),
            posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "tok")))
        val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val big = toks.withColumn("nxt", lead(col("tok"), 1).over(w))
          .filter(col("nxt").isNotNull)
          .select(col("doc_id"), concat_ws(" ", col("tok"), col("nxt")).as("b"))
        val first = big.groupBy(col("b")).agg(min(col("doc_id")).as("fst"))
        val perDoc = big.groupBy(col("doc_id")).agg(count(lit(1)).as("occ"))
        val cps = Tables(s, dir, "documents").agg(max(col("doc_id")).as("mx"))
          .select(explode(array(Seq(1, 2, 5, 10, 20, 100).map(lit): _*)).as("pct"),
            col("mx"))
          .select(expr("(mx + 1) * pct div 100 - 1").as("c"))
        val vocab = first.join(broadcast(cps), col("fst") <= col("c"))
          .groupBy(col("c")).agg(count(lit(1)).as("vocab"))
        val occ = perDoc.join(broadcast(cps), col("doc_id") <= col("c"))
          .groupBy(col("c"))
          .agg(count(lit(1)).as("n_docs"), sum(col("occ")).as("n_occurrences"))
        val curve = occ.join(vocab, Seq("c"))
        val beta = Stats.loglogFit(curve, col("n_occurrences"), col("vocab"))
          .select(col("slope").as("heaps_beta"))
        curve.crossJoin(broadcast(beta))
          .select(col("c"), col("n_docs"), col("n_occurrences"), col("vocab"),
            col("heaps_beta"))
          .orderBy(col("c"))
      },
      oracle = Some("""
        WITH t AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ts
          FROM documents),
        bg AS (
          SELECT doc_id, unnest(list_transform(range(1, len(ts)),
                   i -> ts[i] || ' ' || ts[i + 1])) AS b
          FROM t),
        f AS (SELECT b, MIN(doc_id) AS fst FROM bg GROUP BY 1),
        pd AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS occ FROM bg GROUP BY 1),
        cp AS (
          SELECT (mx + 1) * pct // 100 - 1 AS c
          FROM (SELECT MAX(doc_id) AS mx FROM documents),
               (VALUES (1), (2), (5), (10), (20), (100)) p(pct)),
        curve AS (
          SELECT cp.c,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM pd WHERE doc_id <= cp.c)
                   AS n_docs,
                 (SELECT CAST(SUM(occ) AS BIGINT) FROM pd WHERE doc_id <= cp.c)
                   AS n_occurrences,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM f WHERE fst <= cp.c)
                   AS vocab
          FROM cp),
        pts AS (
          SELECT ROUND(LN(CAST(n_occurrences AS DOUBLE)), 9) AS x,
                 ROUND(LN(CAST(vocab AS DOUBLE)), 9) AS y
          FROM curve WHERE n_occurrences > 0 AND vocab > 0),
        fit AS (
          SELECT CAST(COUNT(*) AS DOUBLE) AS nd,
                 CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) AS sx,
                 CAST(SUM(CAST(y AS DECIMAL(28,12))) AS DOUBLE) AS sy,
                 CAST(SUM(CAST(ROUND(x * y, 9) AS DECIMAL(28,12))) AS DOUBLE) AS sxy,
                 CAST(SUM(CAST(ROUND(x * x, 9) AS DECIMAL(28,12))) AS DOUBLE) AS sxx
          FROM pts),
        b AS (
          SELECT CASE WHEN (sxx/nd - (sx/nd)*(sx/nd)) > 0
                      THEN ROUND((sxy/nd - (sx/nd)*(sy/nd))
                        / (sxx/nd - (sx/nd)*(sx/nd)), 6) END AS heaps_beta
          FROM fit)
        SELECT c, n_docs, n_occurrences, vocab, (SELECT heaps_beta FROM b)
                 AS heaps_beta
        FROM curve ORDER BY c""")),

    // Zipf rank-frequency fit over bigram types: global frequency rank
    // via the distributed row number, log-log slope over the top 500
    // ranks — the corpus-shape diagnostic next to q8f.
    "q8g_zipf_fit" -> Q(
      fn = (s, dir) => {
        val toks = Tables(s, dir, "documents")
          .select(col("doc_id"),
            posexplode(TextAnalysis.tokens(col("text"))).as(Seq("pos", "tok")))
        val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val freq = toks.withColumn("nxt", lead(col("tok"), 1).over(w))
          .filter(col("nxt").isNotNull)
          .select(concat_ws(" ", col("tok"), col("nxt")).as("b"))
          .groupBy(col("b")).agg(count(lit(1)).as("freq"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(
          freq, Seq(col("freq").desc, col("b")), "rank")
        Stats.loglogFit(ranked.filter(col("rank") <= 500),
          col("rank"), col("freq"))
      },
      oracle = Some("""
        WITH t AS (
          SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS ts
          FROM documents),
        bg AS (
          SELECT unnest(list_transform(range(1, len(ts)),
                   i -> ts[i] || ' ' || ts[i + 1])) AS b
          FROM t),
        fr AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS freq FROM bg GROUP BY 1),
        rk AS (
          SELECT freq, ROW_NUMBER() OVER (ORDER BY freq DESC, b) AS rank
          FROM fr),
        pts AS (
          SELECT ROUND(LN(CAST(rank AS DOUBLE)), 9) AS x,
                 ROUND(LN(CAST(freq AS DOUBLE)), 9) AS y
          FROM rk WHERE rank <= 500),
        fit AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
                 CAST(COUNT(*) AS DOUBLE) AS nd,
                 CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) AS sx,
                 CAST(SUM(CAST(y AS DECIMAL(28,12))) AS DOUBLE) AS sy,
                 CAST(SUM(CAST(ROUND(x * y, 9) AS DECIMAL(28,12))) AS DOUBLE) AS sxy,
                 CAST(SUM(CAST(ROUND(x * x, 9) AS DECIMAL(28,12))) AS DOUBLE) AS sxx
          FROM pts)
        SELECT n_points,
               CASE WHEN (sxx/nd - (sx/nd)*(sx/nd)) > 0
                    THEN ROUND((sxy/nd - (sx/nd)*(sy/nd))
                      / (sxx/nd - (sx/nd)*(sx/nd)), 6) END AS slope,
               CASE WHEN (sxx/nd - (sx/nd)*(sx/nd)) > 0
                    THEN ROUND(sy/nd - ((sxy/nd - (sx/nd)*(sy/nd))
                        / (sxx/nd - (sx/nd)*(sx/nd))) * (sx/nd), 6) END
                 AS intercept
        FROM fit""")),

    // Lagged cross-correlation between daily view and purchase volume
    // (calendar lags -3..+3): integer day-count products ride exact
    // DECIMAL sums, one bounded self-join per lag on the daily table.
    "q8h_cross_correlation" -> Q(
      fn = (s, dir) => {
        val daily = ev(s, dir)
          .withColumn("day", expr("ts_ms div 86400000"))
          .groupBy(col("day"))
          .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("v"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("p"))
        val lagDf = daily.sparkSession.range(0, 1)
          .select(explode(array((-3 to 3).map(l => lit(l)): _*)).as("lag"))
        val pairs = daily.select(col("day"), col("v"))
          .crossJoin(broadcast(lagDf))
          .join(daily.select(col("day").as("d2"), col("p").as("p2")),
            col("d2") === col("day") + col("lag"))
        def dec(c: org.apache.spark.sql.Column) = sum(c.cast("decimal(38,6)"))
        val agg = pairs.groupBy(col("lag"))
          .agg(count(lit(1)).as("n_days"),
            dec(col("v")).as("__sv"), dec(col("p2")).as("__sp"),
            dec(col("v") * col("p2")).as("__svp"),
            dec(col("v") * col("v")).as("__svv"),
            dec(col("p2") * col("p2")).as("__spp"))
        val n = col("n_days").cast("double")
        def d(c: String) = col(c).cast("double")
        val cov = d("__svp") / n - (d("__sv") / n) * (d("__sp") / n)
        val va = d("__svv") / n - (d("__sv") / n) * (d("__sv") / n)
        val vb = d("__spp") / n - (d("__sp") / n) * (d("__sp") / n)
        agg.select(col("lag"), col("n_days"),
          when(va > 0 && vb > 0, round(cov / sqrt(va * vb), 6)).as("r"))
          .orderBy(col("lag"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT epoch_ms(ts) // 86400000 AS day,
                 CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                   AS BIGINT) AS v,
                 CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                   AS BIGINT) AS p
          FROM events GROUP BY 1),
        l AS (SELECT CAST(lag AS INT) AS lag
              FROM (VALUES (-3),(-2),(-1),(0),(1),(2),(3)) t(lag)),
        j AS (
          SELECT l.lag, a.v, b.p AS p2
          FROM l JOIN daily a ON TRUE
          JOIN daily b ON b.day = a.day + l.lag),
        agg AS (
          SELECT lag, CAST(COUNT(*) AS BIGINT) AS n_days,
                 CAST(COUNT(*) AS DOUBLE) AS nd,
                 CAST(SUM(CAST(v AS DECIMAL(38,6))) AS DOUBLE) AS sv,
                 CAST(SUM(CAST(p2 AS DECIMAL(38,6))) AS DOUBLE) AS sp,
                 CAST(SUM(CAST(v * p2 AS DECIMAL(38,6))) AS DOUBLE) AS svp,
                 CAST(SUM(CAST(v * v AS DECIMAL(38,6))) AS DOUBLE) AS svv,
                 CAST(SUM(CAST(p2 * p2 AS DECIMAL(38,6))) AS DOUBLE) AS spp
          FROM j GROUP BY 1)
        SELECT lag, n_days,
               CASE WHEN (svv/nd - (sv/nd)*(sv/nd)) > 0
                     AND (spp/nd - (sp/nd)*(sp/nd)) > 0
                    THEN ROUND((svp/nd - (sv/nd)*(sp/nd))
                      / SQRT((svv/nd - (sv/nd)*(sv/nd))
                           * (spp/nd - (sp/nd)*(sp/nd))), 6) END AS r
        FROM agg ORDER BY lag""")),

    // Embedding-corpus diagnostics: norm envelope and isotropy proxy
    // (mean cosine to the corpus centroid). The centroid is a bounded
    // per-dimension DECIMAL mean (64 rows) collected once and re-entered
    // as a literal float vector; every cosine then rides the proven
    // codegen/DOUBLE[] parity path, and cross-vector means sum through
    // DECIMAL so nothing depends on addition order.
    "q8i_embedding_diagnostics" -> Q(
      fn = (s, dir) => {
        val e = t(s, dir, "embeddings")
        val n = e.count()
        val cent = e
          .select(posexplode(col("embedding")).as(Seq("i", "x")))
          .groupBy(col("i"))
          .agg(round(sum(col("x").cast("double").cast("decimal(28,12)"))
            .cast("double") / lit(n.toDouble), 9).as("c"))
          .orderBy(col("i"))
          .collect().map(_.getDouble(1))
        val centLit = array(cent.toIndexedSeq.map(v => lit(v)): _*)
        val scored = e.select(
          graft.functions.VectorFunctions.l2Norm(col("embedding")).as("nrm"),
          round(graft.functions.VectorFunctions.cosine(col("embedding"), centLit), 6)
            .as("cos"))
        scored.agg(
          count(lit(1)).as("n_vecs"),
          round(sum(round(col("nrm"), 9).cast("decimal(28,12)")).cast("double")
            / count(lit(1)).cast("double"), 6).as("mean_norm"),
          min(round(col("nrm"), 6)).as("min_norm"),
          max(round(col("nrm"), 6)).as("max_norm"),
          round(sum(col("cos").cast("decimal(18,6)")).cast("double")
            / count(lit(1)).cast("double"), 6).as("mean_cos_centroid"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd FROM e),
        pairs AS (
          SELECT u['i'] AS i, u['x'] AS x FROM (
            SELECT unnest(list_transform(range(1, len(v) + 1),
                     i -> {'i': i, 'x': v[i]})) AS u
            FROM e)),
        dims AS (
          SELECT i, ROUND(CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE)
                   / (SELECT nd FROM nn), 9) AS c
          FROM pairs GROUP BY i),
        cent AS (
          SELECT CAST(CAST(list(c ORDER BY i) AS REAL[]) AS DOUBLE[]) AS cv
          FROM dims),
        per AS (
          SELECT sqrt(list_sum(list_transform(v, x -> x * x))) AS nrm,
                 ROUND(CAST(list_cosine_similarity(v, cv) AS DOUBLE), 6) AS cos
          FROM e, cent)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_vecs,
               ROUND(CAST(SUM(CAST(ROUND(nrm, 9) AS DECIMAL(28,12))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS mean_norm,
               MIN(ROUND(nrm, 6)) AS min_norm,
               MAX(ROUND(nrm, 6)) AS max_norm,
               ROUND(CAST(SUM(CAST(cos AS DECIMAL(18,6))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS mean_cos_centroid
        FROM per""")),

    // Pivot (wide) heatmap: event volume by type x day-of-week through
    // Spark's relational pivot — the wide twin of q5o's unpivot. Fixed
    // pivot value list, so the plan is a single aggregate (no distinct-
    // values pre-pass).
    "q8j_pivot_heatmap" -> Q(
      fn = (s, dir) =>
        ev(s, dir)
          .withColumn("dow", (expr("ts_ms div 86400000") % 7).cast("int"))
          .groupBy(col("event_type"))
          .pivot("dow", 0 to 6)
          .agg(count(lit(1)))
          .na.fill(0L)
          .select(col("event_type") +: (0 to 6).map(d =>
            col(d.toString).as(s"d$d")): _*)
          .orderBy(col("event_type")),
      oracle = Some("""
        SELECT event_type,
               CAST(SUM(CASE WHEN dow = 0 THEN 1 ELSE 0 END) AS BIGINT) AS d0,
               CAST(SUM(CASE WHEN dow = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
               CAST(SUM(CASE WHEN dow = 2 THEN 1 ELSE 0 END) AS BIGINT) AS d2,
               CAST(SUM(CASE WHEN dow = 3 THEN 1 ELSE 0 END) AS BIGINT) AS d3,
               CAST(SUM(CASE WHEN dow = 4 THEN 1 ELSE 0 END) AS BIGINT) AS d4,
               CAST(SUM(CASE WHEN dow = 5 THEN 1 ELSE 0 END) AS BIGINT) AS d5,
               CAST(SUM(CASE WHEN dow = 6 THEN 1 ELSE 0 END) AS BIGINT) AS d6
        FROM (SELECT event_type,
                CAST((epoch_ms(ts) // 86400000) % 7 AS INT) AS dow
              FROM events)
        GROUP BY event_type ORDER BY event_type""")),

    // CUBE with grouping_id: all four aggregation lattices (type x dow,
    // type, dow, grand total) in one pass — completes the rollup (q11)
    // corner of the grouping-sets surface.
    "q8k_cube" -> Q(
      fn = (s, dir) =>
        ev(s, dir)
          .withColumn("dow", (expr("ts_ms div 86400000") % 7).cast("int"))
          .cube(col("event_type"), col("dow"))
          .agg(count(lit(1)).as("n"),
            grouping_id().cast("int").as("gid"))
          .orderBy(col("gid"), col("event_type"), col("dow")),
      oracle = Some("""
        SELECT event_type, dow, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(GROUPING(event_type) * 2 + GROUPING(dow) AS INT) AS gid
        FROM (SELECT event_type,
                CAST((epoch_ms(ts) // 86400000) % 7 AS INT) AS dow
              FROM events)
        GROUP BY CUBE (event_type, dow)
        ORDER BY gid, event_type, dow""")),

    // New-vs-returning daily actives: each user's first-seen day splits
    // every day's actives — the product-analytics acquisition report.
    // First-seen via min-aggregation (no ordered scan), one distinct
    // (day, user) pass.
    "q8m_new_vs_returning" -> Q(
      fn = (s, dir) => {
        val du = ev(s, dir)
          .select(expr("ts_ms div 86400000").as("day"), col("user_id"))
          .distinct()
        val first = du.groupBy(col("user_id")).agg(min(col("day")).as("fday"))
        du.join(first, Seq("user_id"))
          .groupBy(col("day"))
          .agg(count(lit(1)).as("n_active"),
            sum(when(col("day") === col("fday"), 1L).otherwise(0L)).as("n_new"),
            sum(when(col("day") =!= col("fday"), 1L).otherwise(0L))
              .as("n_returning"))
          .orderBy(col("day"))
      },
      oracle = Some("""
        WITH du AS (
          SELECT DISTINCT epoch_ms(ts) // 86400000 AS day, user_id FROM events),
        f AS (SELECT user_id, MIN(day) AS fday FROM du GROUP BY 1)
        SELECT day, CAST(COUNT(*) AS BIGINT) AS n_active,
               CAST(SUM(CASE WHEN day = fday THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_new,
               CAST(SUM(CASE WHEN day <> fday THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_returning
        FROM du JOIN f USING (user_id)
        GROUP BY day ORDER BY day""")),

    // Reconciliation report: header total vs recomputed lineitem total per
    // order, exact DECIMAL diffs, mismatches beyond a cent tolerance —
    // the warehouse consistency audit in one pass + one key join.
    "q8n_reconciliation" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount"))
              * (lit(1) + col("l_tax"))).cast("decimal(18,6)"))
            .cast("decimal(18,2)").as("computed"))
        val o = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice").cast("decimal(18,2)")
            .as("header"))
        val d = o.join(li, o("o_orderkey") === li("l_orderkey"), "left")
          .select(col("o_orderkey"),
            (coalesce(col("computed"), lit(0).cast("decimal(18,2)"))
              - col("header")).as("diff"))
        d.agg(count(lit(1)).as("n_orders"),
          sum(when(abs(col("diff")) <= lit("0.01").cast("decimal(18,2)"), 1L).otherwise(0L))
            .as("n_matched"),
          sum(when(abs(col("diff")) > lit("0.01").cast("decimal(18,2)"), 1L).otherwise(0L))
            .as("n_mismatched"),
          max(abs(col("diff"))).cast("double").as("max_abs_diff"),
          sum(abs(col("diff"))).cast("double").as("total_abs_diff"))
      },
      oracle = Some("""
        WITH li AS (
          SELECT l_orderkey,
                 CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                     * (1 + l_tax) AS DECIMAL(18,6))), 2) AS DECIMAL(18,2))
                   AS computed
          FROM lineitem GROUP BY 1),
        d AS (
          SELECT o_orderkey,
                 COALESCE(computed, CAST(0 AS DECIMAL(18,2)))
                   - CAST(o_totalprice AS DECIMAL(18,2)) AS diff
          FROM orders LEFT JOIN li ON o_orderkey = l_orderkey)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(CASE WHEN ABS(diff) <= 0.01 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_matched,
               CAST(SUM(CASE WHEN ABS(diff) > 0.01 THEN 1 ELSE 0 END)
                 AS BIGINT) AS n_mismatched,
               CAST(MAX(ABS(diff)) AS DOUBLE) AS max_abs_diff,
               CAST(SUM(ABS(diff)) AS DOUBLE) AS total_abs_diff
        FROM d""")),

    // Share-of-parent: each nation's revenue share within its region —
    // the hierarchical percent-of-total report; totals join back on the
    // bounded region grain.
    "q8o_share_of_region" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem")
        val su = t(s, dir, "supplier")
        val n = t(s, dir, "nation")
        val r = t(s, dir, "region")
        val rev = li.join(broadcast(su), li("l_suppkey") === su("s_suppkey"))
          .join(broadcast(n), su("s_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .groupBy(col("r_name"), col("n_name"))
          .agg(sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
              .cast("decimal(18,6)"))
            .cast("decimal(18,2)").as("rev"))
        val tot = rev.groupBy(col("r_name")).agg(sum(col("rev")).as("rtot"))
        rev.join(broadcast(tot), Seq("r_name"))
          .select(col("r_name"), col("n_name"),
            col("rev").cast("double").as("revenue"),
            col("rtot").cast("double").as("region_revenue"),
            round(col("rev").cast("double") / col("rtot").cast("double"), 6)
              .as("share"))
          .orderBy(col("r_name"), col("n_name"))
      },
      oracle = Some("""
        WITH rev AS (
          SELECT r_name, n_name,
                 CAST(ROUND(SUM(CAST(l_extendedprice * (1 - l_discount)
                     AS DECIMAL(18,6))), 2) AS DECIMAL(18,2)) AS rev
          FROM lineitem
          JOIN supplier ON l_suppkey = s_suppkey
          JOIN nation ON s_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY 1, 2),
        tot AS (SELECT r_name, SUM(rev) AS rtot FROM rev GROUP BY 1)
        SELECT rev.r_name, n_name, CAST(rev AS DOUBLE) AS revenue,
               CAST(rtot AS DOUBLE) AS region_revenue,
               ROUND(CAST(rev AS DOUBLE) / CAST(rtot AS DOUBLE), 6) AS share
        FROM rev JOIN tot ON rev.r_name = tot.r_name
        ORDER BY rev.r_name, n_name""")),

    // Dataset content fingerprint — the dataset-versioning primitive: each
    // row canonicalizes to a pipe-joined string (floats through DECIMAL
    // images — raw float formatting is not replayable, rule 10), hashes to
    // a 32-bit md5 prefix integer (the proven hex-parse recipe), and the
    // order-FREE exact DECIMAL sum of row hashes is the table fingerprint.
    // Equal fingerprints across runs/versions ⇒ byte-identical content,
    // any row change moves the sum.
    "q8p_dataset_fingerprint" -> Q(
      fn = (s, dir) => {
        def fp(df: DataFrame, name: String, key: org.apache.spark.sql.Column) =
          df.select(conv(substring(md5(key), 1, 8), 16, 10)
              .cast("long").as("__h"))
            .agg(count(lit(1)).as("n_rows"),
              sum(col("__h").cast("decimal(38,0)")).cast("string")
                .as("fingerprint"))
            .select(lit(name).as("table_name"), col("n_rows"),
              col("fingerprint"))
        val o = t(s, dir, "orders")
        val c = t(s, dir, "customer")
        val e = ev(s, dir)
        fp(o, "orders", concat_ws("|", col("o_orderkey"), col("o_custkey"),
            col("o_orderstatus"), col("o_orderpriority"),
            unix_millis(col("o_orderdate").cast("timestamp"))))
          .unionByName(fp(c, "customer", concat_ws("|", col("c_custkey"),
            col("c_name"), col("c_nationkey"),
            col("c_acctbal").cast("decimal(18,2)").cast("string"),
            col("c_mktsegment"))))
          .unionByName(fp(e, "events", concat_ws("|", col("event_id"),
            col("ts_ms"), col("user_id"), col("event_type"),
            coalesce(col("value").cast("decimal(18,2)").cast("string"),
              lit("null")))))
          .orderBy(col("table_name"))
      },
      oracle = Some("""
        WITH o AS (
          SELECT CAST('0x' || substring(md5(concat_ws('|', o_orderkey,
                   o_custkey, o_orderstatus, o_orderpriority,
                   epoch_ms(o_orderdate))), 1, 8) AS BIGINT) AS h
          FROM orders),
        c AS (
          SELECT CAST('0x' || substring(md5(concat_ws('|', c_custkey, c_name,
                   c_nationkey, CAST(CAST(c_acctbal AS DECIMAL(18,2))
                     AS VARCHAR), c_mktsegment)), 1, 8) AS BIGINT) AS h
          FROM customer),
        e AS (
          SELECT CAST('0x' || substring(md5(concat_ws('|', event_id,
                   epoch_ms(ts), user_id, event_type,
                   COALESCE(CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR),
                     'null'))), 1, 8) AS BIGINT) AS h
          FROM events)
        SELECT * FROM (
          SELECT 'customer' AS table_name,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM c) AS n_rows,
                 (SELECT CAST(SUM(h) AS VARCHAR) FROM c) AS fingerprint
          UNION ALL
          SELECT 'events',
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM e),
                 (SELECT CAST(SUM(h) AS VARCHAR) FROM e)
          UNION ALL
          SELECT 'orders',
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM o),
                 (SELECT CAST(SUM(h) AS VARCHAR) FROM o))
        ORDER BY table_name""")),

    // IOC extraction — the observable harvest of the reference's
    // security-incident domain (TheHive observables): IPv4 / CVE / hash
    // indicators pulled from document text by anchored regex and rolled
    // up per indicator. The fixture corpus carries no IOCs, so both
    // engines derive the same structure deterministically (the q3u
    // vacuity rule): indicators are appended from doc_id arithmetic.
    "q8q_ioc_extraction" -> Q(
      fn = (s, dir) => {
        val enriched = Tables(s, dir, "documents").select(col("doc_id"),
          concat(col("text"),
            lit(" src=10.0."), (col("doc_id") % 50).cast("string"), lit(".1"),
            lit(" threat=CVE-2024-"),
            lpad((col("doc_id") % 30).cast("string"), 4, "0"),
            lit(" hash="), substring(md5(col("doc_id").cast("string")), 1, 16))
            .as("t"))
        val iocs = Seq(
          ("ipv4", "src=([0-9.]+)"),
          ("cve", "threat=(CVE-[0-9-]+)"),
          ("hash", "hash=([0-9a-f]{16})"))
        iocs.map { case (kind, pat) =>
          enriched.select(col("doc_id"), lit(kind).as("ioc_type"),
            regexp_extract(col("t"), pat, 1).as("ioc_value"))
        }.reduce(_ unionByName _)
          .filter(col("ioc_value") =!= "")
          .groupBy(col("ioc_type"), col("ioc_value"))
          .agg(countDistinct(col("doc_id")).as("n_docs"))
          .orderBy(col("ioc_type"), col("ioc_value"))
      },
      oracle = Some("""
        WITH d AS (
          SELECT doc_id,
                 text || ' src=10.0.' || CAST(doc_id % 50 AS VARCHAR) || '.1'
                   || ' threat=CVE-2024-'
                   || lpad(CAST(doc_id % 30 AS VARCHAR), 4, '0')
                   || ' hash=' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 16)
                   AS t
          FROM documents),
        x AS (
          SELECT doc_id, 'ipv4' AS ioc_type,
                 regexp_extract(t, 'src=([0-9.]+)', 1) AS ioc_value FROM d
          UNION ALL
          SELECT doc_id, 'cve', regexp_extract(t, 'threat=(CVE-[0-9-]+)', 1)
          FROM d
          UNION ALL
          SELECT doc_id, 'hash', regexp_extract(t, 'hash=([0-9a-f]{16})', 1)
          FROM d)
        SELECT ioc_type, ioc_value, CAST(COUNT(DISTINCT doc_id) AS BIGINT)
                 AS n_docs
        FROM x WHERE ioc_value <> ''
        GROUP BY 1, 2 ORDER BY ioc_type, ioc_value""")),

    // Shared-IOC document linking: documents co-mentioning ≥ 2 distinct
    // indicators become correlation edges — the observable-correlation
    // join of an incident-response pipeline. The self-join shuffles
    // (indicator → doc pair) only; edges keyed and counted exactly.
    "q8r_ioc_colink" -> Q(
      fn = (s, dir) => {
        val enriched = Tables(s, dir, "documents").select(col("doc_id"),
          concat(lit("src=10.0."), (col("doc_id") % 50).cast("string"),
            lit(".1 threat=CVE-2024-"),
            lpad((col("doc_id") % 30).cast("string"), 4, "0")).as("t"))
        val iocs = Seq(("ipv4", "src=([0-9.]+)"), ("cve", "threat=(CVE-[0-9-]+)"))
          .map { case (kind, pat) =>
            enriched.select(col("doc_id"), lit(kind).as("ioc_type"),
              regexp_extract(col("t"), pat, 1).as("ioc_value"))
          }.reduce(_ unionByName _)
          .filter(col("ioc_value") =!= "").distinct()
        val a = iocs.select(col("ioc_type"), col("ioc_value"),
          col("doc_id").as("doc_a"))
        val b = iocs.select(col("ioc_type"), col("ioc_value"),
          col("doc_id").as("doc_b"))
        a.join(b, Seq("ioc_type", "ioc_value"))
          .filter(col("doc_a") < col("doc_b"))
          .groupBy(col("doc_a"), col("doc_b"))
          .agg(count(lit(1)).as("shared_iocs"))
          .filter(col("shared_iocs") >= 2)
          .orderBy(col("doc_a"), col("doc_b"))
      },
      oracle = Some("""
        WITH d AS (
          SELECT doc_id,
                 'src=10.0.' || CAST(doc_id % 50 AS VARCHAR) || '.1'
                   || ' threat=CVE-2024-'
                   || lpad(CAST(doc_id % 30 AS VARCHAR), 4, '0') AS t
          FROM documents),
        x AS (
          SELECT DISTINCT doc_id, ioc_type, ioc_value FROM (
            SELECT doc_id, 'ipv4' AS ioc_type,
                   regexp_extract(t, 'src=([0-9.]+)', 1) AS ioc_value FROM d
            UNION ALL
            SELECT doc_id, 'cve', regexp_extract(t, 'threat=(CVE-[0-9-]+)', 1)
            FROM d)
          WHERE ioc_value <> '')
        SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
               CAST(COUNT(*) AS BIGINT) AS shared_iocs
        FROM x a JOIN x b ON a.ioc_type = b.ioc_type
          AND a.ioc_value = b.ioc_value AND a.doc_id < b.doc_id
        GROUP BY 1, 2 HAVING COUNT(*) >= 2
        ORDER BY doc_a, doc_b""")),

    // Golden-record survivorship (MDM merge): per entity, each field
    // keeps its LATEST NON-NULL value independently — null-field rows
    // become null structs so the max aggregate skips them, and the
    // (ts, event_id) prefix makes the lexicographic struct max the
    // deterministic recency winner. One map-side-combinable aggregate.
    "q8s_golden_record" -> Q(
      fn = (s, dir) => {
        def latest(c: org.apache.spark.sql.Column, out: String) =
          max(when(c.isNotNull,
            struct(col("ts_ms").as("t"), col("event_id").as("e"), c.as("v"))))
            .getField("v").as(out)
        ev(s, dir).groupBy(col("user_id"))
          .agg(count(lit(1)).as("n_events"), max(col("ts_ms")).as("last_seen"),
            latest(col("value"), "last_value"),
            latest(col("event_type"), "last_type"),
            latest(col("props"), "last_props"))
          .orderBy(col("user_id"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id, event_id, epoch_ms(ts) AS t, value, event_type,
                 props
          FROM events)
        SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n_events,
               MAX(t) AS last_seen,
               MAX(CASE WHEN value IS NOT NULL
                   THEN {'t': t, 'e': event_id, 'v': value} END)['v']
                 AS last_value,
               MAX(CASE WHEN event_type IS NOT NULL
                   THEN {'t': t, 'e': event_id, 'v': event_type} END)['v']
                 AS last_type,
               MAX(CASE WHEN props IS NOT NULL
                   THEN {'t': t, 'e': event_id, 'v': props} END)['v']
                 AS last_props
        FROM e GROUP BY user_id ORDER BY user_id""")),

    // Temperature-scaled source mixing (α = 0.5 via the proven-parity
    // SQRT): per-source weights ∝ n^α, integer doc targets for a fixed
    // budget by largest-remainder allocation — the multi-source corpus
    // mixing recipe. Bounded source table; windows touch only it.
    "q8t_temperature_mix" -> Q(
      fn = (s, dir) => {
        val budget = 10000L
        val sizes = Tables(s, dir, "documents")
          .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        val all = Window.partitionBy() // one row per source — bounded
        val w = sqrt(col("n_docs").cast("double")) /
          sum(sqrt(col("n_docs").cast("double"))).over(all)
        val exact = lit(budget.toDouble) * w
        val base = floor(exact).cast("long")
        val rem = (lit(budget) - sum(base).over(all)).cast("long")
        val rk = row_number().over(
          Window.orderBy((exact - base).desc, col("source")))
        sizes
          .withColumn("weight", round(w, 6))
          .withColumn("__base", base)
          .withColumn("__rk", rk)
          .withColumn("target_docs",
            (col("__base") + when(col("__rk") <= rem, 1L).otherwise(0L))
              .cast("long"))
          .select(col("source"), col("n_docs"), col("weight"),
            col("target_docs"))
          .orderBy(col("source"))
      },
      oracle = Some("""
        WITH sz AS (
          SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs
          FROM documents GROUP BY 1),
        wts AS (
          SELECT *,
                 SQRT(CAST(n_docs AS DOUBLE))
                   / SUM(SQRT(CAST(n_docs AS DOUBLE))) OVER () AS w
          FROM sz),
        a AS (
          SELECT *, CAST(10000 AS DOUBLE) * w AS exact_t,
                 CAST(FLOOR(CAST(10000 AS DOUBLE) * w) AS BIGINT) AS base
          FROM wts),
        r AS (
          SELECT *, 10000 - SUM(base) OVER () AS rem,
                 ROW_NUMBER() OVER (ORDER BY exact_t - base DESC, source) AS rk
          FROM a)
        SELECT source, n_docs, ROUND(w, 6) AS weight,
               CAST(base + CASE WHEN rk <= rem THEN 1 ELSE 0 END AS BIGINT)
                 AS target_docs
        FROM r ORDER BY source""")),

    // Cohen's kappa inter-rater agreement: the embeddings label vs a
    // deterministically perturbed second rater (vec_id arithmetic — the
    // q3u vacuity rule), observed vs chance agreement from one joint
    // cell aggregate.
    "q8u_cohens_kappa" -> Q(
      fn = (s, dir) => {
        val e = t(s, dir, "embeddings")
          .select(col("label").cast("int").as("r1"),
            when(col("vec_id") % 7 === 0, (col("label") + 1) % 3)
              .otherwise(col("label")).cast("int").as("r2"))
        val cells = e.groupBy(col("r1"), col("r2")).agg(count(lit(1)).as("n"))
        val all = Window.partitionBy() // label-domain cells — bounded
        def d(c: org.apache.spark.sql.Column) = c.cast("double")
        val tot = d(sum(col("n")).over(all))
        val po = d(sum(when(col("r1") === col("r2"), col("n"))
          .otherwise(0L)).over(all)) / tot
        val p1 = d(sum(col("n")).over(Window.partitionBy(col("r1")))) / tot
        val p2 = d(sum(col("n")).over(Window.partitionBy(col("r2")))) / tot
        // pe = Σ_k p1(k)·p2(k): per-cell p1·p2 counted once per (k,k) pair
        val diag = cells
          .withColumn("__po", po)
          .withColumn("__pe_term",
            when(col("r1") === col("r2"), round(p1 * p2, 9)).otherwise(0.0))
        diag.agg(
          sum(col("n")).as("n_items"),
          round(min(col("__po")), 6).as("p_observed"),
          round(sum(col("__pe_term").cast("decimal(18,9)")).cast("double"), 6)
            .as("p_expected"),
          round((min(col("__po"))
              - sum(col("__pe_term").cast("decimal(18,9)")).cast("double"))
            / (lit(1.0)
              - sum(col("__pe_term").cast("decimal(18,9)")).cast("double")), 6)
            .as("kappa"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT CAST(label AS INT) AS r1,
                 CAST(CASE WHEN vec_id % 7 = 0 THEN (label + 1) % 3
                      ELSE label END AS INT) AS r2
          FROM embeddings),
        c AS (SELECT r1, r2, CAST(COUNT(*) AS BIGINT) AS n FROM e GROUP BY 1, 2),
        w AS (
          SELECT *,
                 CAST(SUM(n) OVER () AS DOUBLE) AS tot,
                 CAST(SUM(CASE WHEN r1 = r2 THEN n ELSE 0 END) OVER ()
                   AS DOUBLE) AS agree,
                 CAST(SUM(n) OVER (PARTITION BY r1) AS DOUBLE) AS n1,
                 CAST(SUM(n) OVER (PARTITION BY r2) AS DOUBLE) AS n2
          FROM c),
        t AS (
          SELECT n, agree / tot AS po,
                 CASE WHEN r1 = r2 THEN ROUND((n1 / tot) * (n2 / tot), 9)
                      ELSE CAST(0 AS DOUBLE) END AS pe_term
          FROM w)
        SELECT CAST(SUM(n) AS BIGINT) AS n_items,
               ROUND(MIN(po), 6) AS p_observed,
               ROUND(CAST(SUM(CAST(pe_term AS DECIMAL(18,9))) AS DOUBLE), 6)
                 AS p_expected,
               ROUND((MIN(po)
                   - CAST(SUM(CAST(pe_term AS DECIMAL(18,9))) AS DOUBLE))
                 / (CAST(1 AS DOUBLE)
                   - CAST(SUM(CAST(pe_term AS DECIMAL(18,9))) AS DOUBLE)), 6)
                 AS kappa
        FROM t""")),

    // Quantile-transform feature scaling: percent rank of order value
    // through the distributed global row number ((rn-1)/(n-1) with a
    // unique tiebreak ≡ SQL PERCENT_RANK) — rank normalization that
    // never plans a one-partition window.
    "q8v_percent_rank" -> Q(
      fn = (s, dir) => {
        val o = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice"))
        val n = o.count()
        graft.operators.ScaleOps.globalRowNumber(o,
            Seq(col("o_totalprice"), col("o_orderkey")), "__rn")
          .select(col("o_orderkey"), col("o_totalprice"),
            round((col("__rn") - 1).cast("double") / lit((n - 1).toDouble), 6)
              .as("pr"))
          .orderBy(col("o_orderkey"))
      },
      oracle = Some("""
        WITH r AS (
          SELECT o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rn,
                 COUNT(*) OVER () AS n
          FROM orders)
        SELECT o_orderkey, o_totalprice,
               ROUND(CAST(rn - 1 AS DOUBLE) / CAST(n - 1 AS DOUBLE), 6) AS pr
        FROM r ORDER BY o_orderkey""")),

    // Deterministic subsample bootstrap: 20 half-sample replicates keyed
    // by salted md5 draws (integer parity test — no float threshold), the
    // replicate-mean RANGE as the dispersion envelope of the corpus mean.
    // Replicate expansion is map-side combinable (20 aggregate cells).
    "q8w_bootstrap_ci" -> Q(
      fn = (s, dir) => {
        val o = t(s, dir, "orders")
        val full = o.agg(count(lit(1)).as("n_total"),
          round(sum(col("o_totalprice").cast("decimal(18,2)")).cast("double")
            / count(lit(1)).cast("double"), 6).as("mean_full"))
        val reps = o
          .select(col("o_orderkey"),
            col("o_totalprice").cast("decimal(18,2)").as("v"))
          .withColumn("b", explode(sequence(lit(1), lit(20))))
          .withColumn("__draw",
            conv(substring(md5(concat_ws("|", col("o_orderkey"), col("b"))),
              1, 8), 16, 10).cast("long"))
          .filter(col("__draw") % 2 === 0)
          .groupBy(col("b"))
          .agg(round(sum(col("v")).cast("double")
            / count(lit(1)).cast("double"), 6).as("m"))
        val env = reps.agg(min(col("m")).as("rep_mean_lo"),
          max(col("m")).as("rep_mean_hi"),
          count(lit(1)).as("n_replicates"))
        full.crossJoin(env)
          .select(col("n_total"), col("mean_full"), col("n_replicates"),
            col("rep_mean_lo"), col("rep_mean_hi"))
      },
      oracle = Some("""
        WITH f AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
                 ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                     AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS mean_full
          FROM orders),
        reps AS (
          SELECT b, ROUND(CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
                   AS m
          FROM (
            SELECT r.b, CAST(o_totalprice AS DECIMAL(18,2)) AS v,
                   CAST('0x' || substring(md5(concat_ws('|', o_orderkey, r.b)),
                     1, 8) AS BIGINT) AS draw
            FROM orders, range(1, 21) r(b))
          WHERE draw % 2 = 0 GROUP BY b),
        env AS (
          SELECT MIN(m) AS rep_mean_lo, MAX(m) AS rep_mean_hi,
                 CAST(COUNT(*) AS BIGINT) AS n_replicates
          FROM reps)
        SELECT n_total, mean_full, n_replicates, rep_mean_lo, rep_mean_hi
        FROM f, env""")),

    // Hourly trending top-3 event types: tumbling-window counts ranked
    // within each hour — row_number ≤ k lowers to WindowGroupLimit, so
    // per-hour state is bounded map-side.
    "q8x_trending_topk" -> Q(
      fn = (s, dir) => {
        val hourly = ev(s, dir)
          .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
          .agg(count(lit(1)).as("n"))
          .select(unix_millis(col("w.start")).as("hour_start_ms"),
            col("event_type"), col("n"))
        val rk = Window.partitionBy(col("hour_start_ms"))
          .orderBy(col("n").desc, col("event_type"))
        hourly.withColumn("rank", row_number().over(rk).cast("int"))
          .filter(col("rank") <= 3)
          .orderBy(col("hour_start_ms"), col("rank"))
      },
      oracle = Some("""
        WITH h AS (
          SELECT (epoch_ms(ts) // 3600000) * 3600000 AS hour_start_ms,
                 event_type, CAST(COUNT(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2),
        r AS (
          SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY hour_start_ms
                   ORDER BY n DESC, event_type) AS INT) AS rank
          FROM h)
        SELECT hour_start_ms, event_type, n, rank
        FROM r WHERE rank <= 3
        ORDER BY hour_start_ms, rank""")),

    // Window-function gallery — the remaining ranking/navigation surface
    // in one per-user pass: dense_rank, cume_dist, nth_value, lag with an
    // explicit default. Unique (ts, event_id) ordering keeps every
    // function tie-free and hash-exact.
    "q8y_window_gallery" -> Q(
      fn = (s, dir) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts_ms"), col("event_id"))
        val wf = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ev(s, dir)
          .select(col("user_id"), col("event_id"), col("ts_ms"),
            col("event_type"))
          .withColumn("seq", row_number().over(w).cast("int"))
          .withColumn("type_rank", dense_rank().over(
            Window.partitionBy(col("user_id")).orderBy(col("event_type")))
            .cast("int"))
          .withColumn("cd", round(cume_dist().over(w), 6))
          .withColumn("second_type", nth_value(col("event_type"), 2).over(wf))
          .withColumn("prev_type",
            lag(col("event_type"), 1, "none").over(w))
          .orderBy(col("user_id"), col("seq"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id, event_id, epoch_ms(ts) AS ts_ms, event_type
          FROM events)
        SELECT user_id, event_id, ts_ms, event_type,
               CAST(ROW_NUMBER() OVER w AS INT) AS seq,
               CAST(DENSE_RANK() OVER (PARTITION BY user_id
                 ORDER BY event_type) AS INT) AS type_rank,
               ROUND(CUME_DIST() OVER w, 6) AS cd,
               NTH_VALUE(event_type, 2) OVER (PARTITION BY user_id
                 ORDER BY ts_ms, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS second_type,
               COALESCE(LAG(event_type, 1) OVER w, 'none') AS prev_type
        FROM e
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_ms, event_id)
        ORDER BY user_id, seq""")),

    // ANN quality measurement as a first-class query: recall@5 of the
    // LSH-bucketed search against the exact top-5, per-query hit counts
    // rolled to mean/full/zero recall shares — the acceptance gate a
    // recall-sensitive deployment runs before trusting the approximate
    // path (RecallSpec's assertion, now oracle-replayed end to end).
    "q8z_ann_recall" -> Q(
      fn = (s, dir) => {
        val e = t(s, dir, "embeddings")
        val queries = e.filter(col("vec_id") < 100)
          .select(col("vec_id").as("q_id"), col("embedding").as("qv"))
        val corpus = e.select(col("vec_id").as("c_id"), col("embedding").as("cv"))
        val exact = VectorSearch.knnJoinViaAggregator(queries, corpus,
          "q_id", "qv", "c_id", "cv", k = 5)
          .select(col("query_id"), col("neighbor_id"))
        val approx = VectorSearch.lshBucketJoin(queries, corpus,
          "q_id", "qv", "c_id", "cv", k = 5, nBits = 4)
          .select(col("query_id").as("a_q"), col("neighbor_id").as("a_n"))
        val hits = exact
          .join(approx, exact("query_id") === approx("a_q")
            && exact("neighbor_id") === approx("a_n"))
          .groupBy(col("query_id")).agg(count(lit(1)).as("hits"))
        val per = exact.select(col("query_id")).distinct()
          .join(hits, Seq("query_id"), "left")
          .withColumn("hits", coalesce(col("hits"), lit(0L)))
        per.agg(
          count(lit(1)).as("n_queries"),
          round(sum(col("hits")).cast("double")
            / (count(lit(1)) * 5).cast("double"), 6).as("mean_recall"),
          sum(when(col("hits") === 5L, 1L).otherwise(0L)).as("n_full"),
          sum(when(col("hits") === 0L, 1L).otherwise(0L)).as("n_zero"))
      },
      oracle = {
        val bucketExpr = (0 until 4).map { b =>
          val lit = VectorSearch.hyperplane(b, 64).mkString("[", ",", "]")
          s"(CASE WHEN list_dot_product(v, $lit) >= 0 THEN ${1 << b} ELSE 0 END)"
        }.mkString(" + ")
        Some(s"""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id < 100),
        exact AS (
          SELECT q_id, c_id FROM (
            SELECT q.q_id, e.vec_id AS c_id,
                   ROW_NUMBER() OVER (PARTITION BY q.q_id ORDER BY
                     ROUND(CAST(list_cosine_similarity(e.v, q.qv) AS DOUBLE), 6)
                       DESC, e.vec_id) AS rn
            FROM e CROSS JOIN q WHERE e.vec_id <> q.q_id)
          WHERE rn <= 5),
        b AS (SELECT vec_id, v, $bucketExpr AS bucket FROM e),
        qb AS (SELECT vec_id AS q_id, v AS qv, bucket FROM b WHERE vec_id < 100),
        approx AS (
          SELECT q_id, c_id FROM (
            SELECT qb.q_id, c.vec_id AS c_id,
                   ROW_NUMBER() OVER (PARTITION BY qb.q_id ORDER BY
                     ROUND(CAST(list_cosine_similarity(c.v, qb.qv) AS DOUBLE), 6)
                       DESC, c.vec_id) AS rn
            FROM b c JOIN qb ON c.bucket = qb.bucket AND c.vec_id <> qb.q_id)
          WHERE rn <= 5),
        h AS (
          SELECT exact.q_id, CAST(COUNT(approx.c_id) AS BIGINT) AS hits
          FROM exact LEFT JOIN approx
            ON exact.q_id = approx.q_id AND exact.c_id = approx.c_id
          GROUP BY 1)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_queries,
               ROUND(CAST(SUM(hits) AS DOUBLE)
                 / CAST(COUNT(*) * 5 AS DOUBLE), 6) AS mean_recall,
               CAST(SUM(CASE WHEN hits = 5 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_full,
               CAST(SUM(CASE WHEN hits = 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_zero
        FROM h""")
      }),

    // Mutual-NN through the SCALE path: reciprocal top-1 over LSH
    // candidate pairs — no unbounded broadcast anywhere — run at a
    // saturating table count so the result must equal the EXACT
    // reciprocal pairs the q81 oracle computes. The approximate machinery
    // is thus gated against the exact semantics, hash-for-hash.
    "q90_mutual_nn_lsh" -> Q(
      fn = (s, dir) =>
        VectorSearch.mutualNearestLsh(t(s, dir, "embeddings"),
            "vec_id", "embedding", nBits = 1, nTables = 16)
          .orderBy(col("vec_a")),
      oracle = Some("""
        WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        s AS (
          SELECT a.vec_id AS qid, b.vec_id AS nid,
                 ROUND(CAST(list_cosine_similarity(a.v, b.v) AS DOUBLE), 6) AS score
          FROM e a JOIN e b ON a.vec_id <> b.vec_id),
        t AS (
          SELECT qid, nid, score FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY qid
              ORDER BY score DESC, nid) AS rn FROM s)
          WHERE rn = 1)
        SELECT x.qid AS vec_a, x.nid AS vec_b, x.score
        FROM t x JOIN t y ON x.qid = y.nid AND x.nid = y.qid
        WHERE x.qid < x.nid ORDER BY vec_a""")),

    // Corpus diversity (self-similarity audit): mean pairwise trigram
    // Jaccard over a deterministic ~10% document sample (salted-hash
    // pick), 1 − mean as the diversity score — the cheap
    // repetitiveness probe run before training on a new source. Pairs
    // ride the proven q24 machinery under one constant block.
    "q91_corpus_diversity" -> Q(
      fn = (s, dir) => {
        val sampled = Tables(s, dir, "documents")
          .filter(conv(substring(md5(concat(col("doc_id").cast("string"),
            lit("|div"))), 1, 8), 16, 10).cast("long") % 10 === 0)
          .withColumn("__blk", lit(1))
        val pairs = graft.operators.Dedup.ngramJaccardPairs(sampled,
          "doc_id", "text", blockCols = Seq("__blk"), n = 3)
        val nDocs = sampled.count()
        pairs.agg(
          lit(nDocs).as("n_docs_sampled"),
          count(lit(1)).as("n_pairs"),
          round(sum(round(col("jaccard"), 9).cast("decimal(28,12)"))
            .cast("double") / count(lit(1)).cast("double"), 6)
            .as("mean_jaccard"))
          .withColumn("diversity", round(lit(1.0) - col("mean_jaccard"), 6))
      },
      oracle = Some("""
        WITH d AS (
          SELECT doc_id, text FROM documents
          WHERE CAST('0x' || substring(md5(CAST(doc_id AS VARCHAR) || '|div'),
                  1, 8) AS BIGINT) % 10 = 0),
        t AS (
          SELECT doc_id,
                 list_distinct(CASE WHEN len(toks) >= 3
                   THEN list_transform(range(1, len(toks) - 1),
                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
                   ELSE [trim(text)] END) AS grams
          FROM (SELECT doc_id, text,
                       regexp_split_to_array(trim(text), '\s+') AS toks
                FROM d WHERE len(regexp_replace(text, '\s', '', 'g')) > 0)),
        p AS (
          SELECT ROUND(CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                   / len(list_distinct(a.grams || b.grams)), 9) AS j
          FROM t a JOIN t b ON a.doc_id < b.doc_id),
        agg AS (
          SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM d) AS n_docs_sampled,
                 CAST(COUNT(*) AS BIGINT) AS n_pairs,
                 ROUND(CAST(SUM(CAST(j AS DECIMAL(28,12))) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE), 6) AS mean_jaccard
          FROM p)
        SELECT n_docs_sampled, n_pairs, mean_jaccard,
               ROUND(CAST(1 AS DOUBLE) - mean_jaccard, 6) AS diversity
        FROM agg""")),

    // Salted skew join, oracle-proven result-identical: the hot-key
    // spreading machinery (8-way salt replication) must aggregate to
    // exactly what the plain join produces — the DuckDB side IS the
    // plain join, so hash equality proves salting never loses or
    // duplicates a row.
    "q92_salted_join" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select(col("l_orderkey").as("key"), col("l_quantity"))
        val o = t(s, dir, "orders")
          .select(col("o_orderkey").as("key"), col("o_orderstatus"))
        graft.operators.SkewJoin.saltedEquiJoin(li, o, "key", nSalts = 8)
          .groupBy(col("o_orderstatus"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
              .as("total_qty"))
          .orderBy(col("o_orderstatus"))
      },
      oracle = Some("""
        SELECT o_orderstatus, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)
                 AS total_qty
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY 1 ORDER BY 1""")),

    // Retention decay fit: observable-window-corrected retention rate per
    // day offset, exponential decay rate from the semi-log fit, half-life
    // in days — the summary number cohort curves exist to produce.
    "q93_retention_decay" -> Q(
      fn = (s, dir) => {
        val du = ev(s, dir)
          .select(col("user_id"), expr("ts_ms div 86400000").as("day"))
          .distinct()
        val cohort = du.groupBy(col("user_id")).agg(min(col("day")).as("cohort"))
        val maxd = du.agg(max(col("day")).as("maxd"))
        val ret = du.join(cohort, Seq("user_id"))
          .groupBy((col("day") - col("cohort")).as("day_offset"))
          .agg(count(lit(1)).as("n_retained"))
        val elig = cohort.crossJoin(broadcast(maxd))
          .join(broadcast(ret.select(col("day_offset"))),
            col("cohort") <= col("maxd") - col("day_offset"))
          .groupBy(col("day_offset")).agg(count(lit(1)).as("n_eligible"))
        val curve = ret.join(elig, Seq("day_offset"))
          .withColumn("rate", round(col("n_retained").cast("double")
            / col("n_eligible").cast("double"), 6))
        val fit = Stats.semiLogFit(curve.filter(col("day_offset") >= 1),
            col("day_offset"), col("rate"))
          .select(col("slope").as("decay_rate"),
            when(col("slope") < 0,
              round(log(lit(2.0)) / -col("slope"), 6)).as("half_life_days"))
        curve.crossJoin(broadcast(fit))
          .select(col("day_offset"), col("n_retained"), col("n_eligible"),
            col("rate"), col("decay_rate"), col("half_life_days"))
          .orderBy(col("day_offset"))
      },
      oracle = Some("""
        WITH du AS (
          SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day FROM events),
        c AS (SELECT user_id, MIN(day) AS cohort FROM du GROUP BY 1),
        m AS (SELECT MAX(day) AS maxd FROM du),
        ret AS (
          SELECT du.day - c.cohort AS day_offset,
                 CAST(COUNT(*) AS BIGINT) AS n_retained
          FROM du JOIN c USING (user_id) GROUP BY 1),
        elig AS (
          SELECT r.day_offset, CAST(COUNT(*) AS BIGINT) AS n_eligible
          FROM (SELECT DISTINCT day_offset FROM ret) r, c, m
          WHERE c.cohort <= m.maxd - r.day_offset
          GROUP BY 1),
        curve AS (
          SELECT ret.day_offset, n_retained, n_eligible,
                 ROUND(CAST(n_retained AS DOUBLE)
                   / CAST(n_eligible AS DOUBLE), 6) AS rate
          FROM ret JOIN elig USING (day_offset)),
        pts AS (
          SELECT ROUND(CAST(day_offset AS DOUBLE), 9) AS x,
                 ROUND(LN(rate), 9) AS y
          FROM curve WHERE day_offset >= 1 AND rate > 0),
        f AS (
          SELECT CAST(COUNT(*) AS DOUBLE) AS nd,
                 CAST(SUM(CAST(x AS DECIMAL(28,12))) AS DOUBLE) AS sx,
                 CAST(SUM(CAST(y AS DECIMAL(28,12))) AS DOUBLE) AS sy,
                 CAST(SUM(CAST(ROUND(x * y, 9) AS DECIMAL(28,12))) AS DOUBLE)
                   AS sxy,
                 CAST(SUM(CAST(ROUND(x * x, 9) AS DECIMAL(28,12))) AS DOUBLE)
                   AS sxx
          FROM pts),
        fit AS (
          SELECT CASE WHEN (sxx/nd - (sx/nd)*(sx/nd)) > 0
                      THEN ROUND((sxy/nd - (sx/nd)*(sy/nd))
                        / (sxx/nd - (sx/nd)*(sx/nd)), 6) END AS decay_rate
          FROM f)
        SELECT day_offset, n_retained, n_eligible, rate,
               (SELECT decay_rate FROM fit) AS decay_rate,
               (SELECT CASE WHEN decay_rate < 0
                       THEN ROUND(LN(CAST(2 AS DOUBLE)) / -decay_rate, 6) END
                FROM fit) AS half_life_days
        FROM curve ORDER BY day_offset""")),

    // Partial correlation: price-discount association with quantity
    // controlled out, composed from the 6-rounded pairwise r's (both
    // engines start from identical rounded inputs, so the closed-form
    // partial is bit-identical).
    "q94_partial_correlation" -> Q(
      fn = (s, dir) => {
        val m = Stats.correlationMatrix(t(s, dir, "lineitem"),
          Seq("l_quantity", "l_extendedprice", "l_discount"))
        def r(a: String, b: String) =
          max(when(col("col_a") === a && col("col_b") === b, col("r")))
        val one = m.agg(
          r("l_quantity", "l_extendedprice").as("r_qp"),
          r("l_quantity", "l_discount").as("r_qd"),
          r("l_extendedprice", "l_discount").as("r_pd"))
        one.select(col("r_qp"), col("r_qd"), col("r_pd"),
          round((col("r_pd") - col("r_qp") * col("r_qd"))
            / sqrt((lit(1.0) - col("r_qp") * col("r_qp"))
              * (lit(1.0) - col("r_qd") * col("r_qd"))), 6)
            .as("r_pd_given_q"))
      },
      oracle = Some("""
        WITH b AS (
          SELECT CAST(l_quantity AS DOUBLE) AS c1,
                 CAST(l_extendedprice AS DOUBLE) AS c2,
                 CAST(l_discount AS DOUBLE) AS c3
          FROM lineitem
          WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL
            AND l_discount IS NOT NULL),
        a AS (
          SELECT CAST(COUNT(*) AS DOUBLE) AS nd,
                 CAST(SUM(CAST(ROUND(c1, 6) AS DECIMAL(38,6))) AS DOUBLE) AS s1,
                 CAST(SUM(CAST(ROUND(c1*c1, 6) AS DECIMAL(38,6))) AS DOUBLE) AS e1,
                 CAST(SUM(CAST(ROUND(c2, 6) AS DECIMAL(38,6))) AS DOUBLE) AS s2,
                 CAST(SUM(CAST(ROUND(c2*c2, 6) AS DECIMAL(38,6))) AS DOUBLE) AS e2,
                 CAST(SUM(CAST(ROUND(c3, 6) AS DECIMAL(38,6))) AS DOUBLE) AS s3,
                 CAST(SUM(CAST(ROUND(c3*c3, 6) AS DECIMAL(38,6))) AS DOUBLE) AS e3,
                 CAST(SUM(CAST(ROUND(c1*c2, 6) AS DECIMAL(38,6))) AS DOUBLE) AS p12,
                 CAST(SUM(CAST(ROUND(c1*c3, 6) AS DECIMAL(38,6))) AS DOUBLE) AS p13,
                 CAST(SUM(CAST(ROUND(c2*c3, 6) AS DECIMAL(38,6))) AS DOUBLE) AS p23
          FROM b),
        rr AS (
          SELECT
            ROUND((p12/nd - (s1/nd)*(s2/nd))
              / SQRT((e1/nd - (s1/nd)*(s1/nd)) * (e2/nd - (s2/nd)*(s2/nd))), 6)
              AS r_qp,
            ROUND((p13/nd - (s1/nd)*(s3/nd))
              / SQRT((e1/nd - (s1/nd)*(s1/nd)) * (e3/nd - (s3/nd)*(s3/nd))), 6)
              AS r_qd,
            ROUND((p23/nd - (s2/nd)*(s3/nd))
              / SQRT((e2/nd - (s2/nd)*(s2/nd)) * (e3/nd - (s3/nd)*(s3/nd))), 6)
              AS r_pd
          FROM a)
        SELECT r_qp, r_qd, r_pd,
               ROUND((r_pd - r_qp * r_qd)
                 / SQRT((CAST(1 AS DOUBLE) - r_qp * r_qp)
                      * (CAST(1 AS DOUBLE) - r_qd * r_qd)), 6) AS r_pd_given_q
        FROM rr""")),

    // Process conformance (process-mining check): clicks require a PRIOR
    // view, purchases a PRIOR click — events arriving before their
    // required predecessor's first occurrence are violations. Per-user
    // first-occurrence times from one min-aggregate; no ordered scan.
    "q95_conformance" -> Q(
      fn = (s, dir) => {
        val e = ev(s, dir)
        val firsts = e.groupBy(col("user_id")).agg(
          min(when(col("event_type") === "view", col("ts_ms"))).as("f_view"),
          min(when(col("event_type") === "click", col("ts_ms"))).as("f_click"))
        val checked = e.join(firsts, Seq("user_id"))
          .withColumn("violates",
            when(col("event_type") === "click",
              col("f_view").isNull || col("f_view") > col("ts_ms"))
            .when(col("event_type") === "purchase",
              col("f_click").isNull || col("f_click") > col("ts_ms")))
          .filter(col("event_type").isin("click", "purchase"))
        checked.groupBy(col("event_type"))
          .agg(count(lit(1)).as("n_events"),
            sum(when(col("violates"), 1L).otherwise(0L)).as("n_violations"))
          .withColumn("violation_rate",
            round(col("n_violations").cast("double")
              / col("n_events").cast("double"), 6))
          .orderBy(col("event_type"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id, event_type, epoch_ms(ts) AS ts_ms FROM events),
        f AS (
          SELECT user_id,
                 MIN(CASE WHEN event_type = 'view' THEN ts_ms END) AS f_view,
                 MIN(CASE WHEN event_type = 'click' THEN ts_ms END) AS f_click
          FROM e GROUP BY 1)
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(CASE
                 WHEN event_type = 'click'
                      AND (f_view IS NULL OR f_view > ts_ms) THEN 1
                 WHEN event_type = 'purchase'
                      AND (f_click IS NULL OR f_click > ts_ms) THEN 1
                 ELSE 0 END) AS BIGINT) AS n_violations,
               ROUND(CAST(SUM(CASE
                 WHEN event_type = 'click'
                      AND (f_view IS NULL OR f_view > ts_ms) THEN 1
                 WHEN event_type = 'purchase'
                      AND (f_click IS NULL OR f_click > ts_ms) THEN 1
                 ELSE 0 END) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
                 AS violation_rate
        FROM e JOIN f USING (user_id)
        WHERE event_type IN ('click', 'purchase')
        GROUP BY 1 ORDER BY 1""")),

    // Dataset-version profile diff: the q5f data card computed for two
    // slices (the q8p fingerprint's companion — WHAT changed, not just
    // THAT it changed): per-column row/null/distinct deltas and numeric
    // range drift between the even- and odd-key halves.
    "q96_profile_diff" -> Q(
      fn = (s, dir) => {
        val o = t(s, dir, "orders")
        val cols = Seq("o_orderkey", "o_totalprice", "o_orderstatus",
          "o_orderpriority")
        def card(df: DataFrame, side: String) =
          graft.operators.Profile.tableProfile(df, cols)
            .select(col("column"), col("n").as(s"n_$side"),
              col("n_null").as(s"null_$side"),
              col("n_distinct").as(s"distinct_$side"),
              col("min_num").as(s"min_$side"), col("max_num").as(s"max_$side"))
        card(o.filter(col("o_orderkey") % 2 === 0), "a")
          .join(card(o.filter(col("o_orderkey") % 2 =!= 0), "b"), Seq("column"))
          .select(col("column"), col("n_a"), col("n_b"),
            round(col("null_a").cast("double") / col("n_a").cast("double"), 6)
              .as("null_rate_a"),
            round(col("null_b").cast("double") / col("n_b").cast("double"), 6)
              .as("null_rate_b"),
            (col("distinct_b") - col("distinct_a")).as("d_distinct"),
            round(col("min_b") - col("min_a"), 6).as("d_min_num"),
            round(col("max_b") - col("max_a"), 6).as("d_max_num"))
          .orderBy(col("column"))
      },
      oracle = Some {
        def num(c: String, pred: String, side: String) = s"""
          SELECT '$c' AS "column", CAST(COUNT(*) AS BIGINT) AS n_$side,
                 CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS null_$side,
                 CAST(COUNT(DISTINCT $c) AS BIGINT) AS distinct_$side,
                 CAST(MIN($c) AS DOUBLE) AS min_$side,
                 CAST(MAX($c) AS DOUBLE) AS max_$side
          FROM orders WHERE $pred"""
        def str(c: String, pred: String, side: String) = s"""
          SELECT '$c' AS "column", CAST(COUNT(*) AS BIGINT) AS n_$side,
                 CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS null_$side,
                 CAST(COUNT(DISTINCT $c) AS BIGINT) AS distinct_$side,
                 CAST(NULL AS DOUBLE) AS min_$side,
                 CAST(NULL AS DOUBLE) AS max_$side
          FROM orders WHERE $pred"""
        def side(pred: String, s0: String) =
          Seq(num("o_orderkey", pred, s0), num("o_totalprice", pred, s0),
            str("o_orderstatus", pred, s0), str("o_orderpriority", pred, s0))
            .mkString("(", " UNION ALL ", ")")
        s"""
        WITH a AS ${side("o_orderkey % 2 = 0", "a")},
        b AS ${side("o_orderkey % 2 <> 0", "b")}
        SELECT a."column", n_a, n_b,
               ROUND(CAST(null_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6)
                 AS null_rate_a,
               ROUND(CAST(null_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6)
                 AS null_rate_b,
               CAST(distinct_b - distinct_a AS BIGINT) AS d_distinct,
               ROUND(min_b - min_a, 6) AS d_min_num,
               ROUND(max_b - max_a, 6) AS d_max_num
        FROM a JOIN b ON a."column" = b."column"
        ORDER BY a."column""""
      }),

    // Quantile normalization across slices (batch-effect correction):
    // each even-half order's value maps to the odd-half value at the
    // proportional rank — two distributed global row numbers and one
    // exact BIGINT rank-mapping join, no floats anywhere in the mapping.
    "q97_quantile_normalization" -> Q(
      fn = (s, dir) => {
        val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_totalprice"))
        val aSide = o.filter(col("o_orderkey") % 2 === 0)
        val bSide = o.filter(col("o_orderkey") % 2 =!= 0)
        val na = aSide.count()
        val nb = bSide.count()
        val ra = graft.operators.ScaleOps.globalRowNumber(aSide,
          Seq(col("o_totalprice"), col("o_orderkey")), "__ra")
        val rb = graft.operators.ScaleOps.globalRowNumber(
          bSide.select(col("o_totalprice").as("norm_price"), col("o_orderkey")
            .as("__bk")),
          Seq(col("norm_price"), col("__bk")), "__rb")
          .select(col("__rb"), col("norm_price"))
        ra.withColumn("__target",
            expr(s"(__ra - 1) * ${nb - 1} div ${na - 1} + 1"))
          .join(rb, col("__target") === col("__rb"))
          .select(col("o_orderkey"), col("o_totalprice"), col("norm_price"))
          .orderBy(col("o_orderkey"))
      },
      oracle = Some("""
        WITH a0 AS (
          SELECT o_orderkey, o_totalprice,
                 ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS ra,
                 COUNT(*) OVER () AS na
          FROM orders WHERE o_orderkey % 2 = 0),
        b AS (
          SELECT o_totalprice AS norm_price,
                 ROW_NUMBER() OVER (ORDER BY o_totalprice, o_orderkey) AS rb,
                 COUNT(*) OVER () AS nb
          FROM orders WHERE o_orderkey % 2 <> 0),
        a AS (
          SELECT o_orderkey, o_totalprice,
                 (ra - 1) * ((SELECT MAX(nb) FROM b) - 1) // (na - 1) + 1
                   AS target
          FROM a0)
        SELECT o_orderkey, o_totalprice, norm_price
        FROM a JOIN b ON a.target = b.rb
        ORDER BY o_orderkey""")),

    // Time-decay multi-touch attribution: every click in the 7 days
    // before a purchase earns weight 2^-days — EXACT dyadic doubles, so
    // per-purchase totals are addition-order-free without DECIMAL; only
    // the cross-purchase credit mean rides the 9-snap/DECIMAL rail.
    // Channel is derived from the props payload (k mod 4, vacuity rule).
    "q98_decay_attribution" -> Q(
      fn = (s, dir) => {
        val e = ev(s, dir)
        val clicks = e.filter(col("event_type") === "click")
          .select(col("user_id"), col("ts_ms").as("tc"),
            (get_json_object(col("props"), "$.k").cast("long") % 4)
              .as("channel"))
        val purchases = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts_ms").as("tp"),
            col("event_id").as("pid"))
        val touches = purchases.join(clicks, Seq("user_id"))
          .filter(col("tc") <= col("tp")
            && col("tp") - col("tc") <= lit(7L * 86400000L))
          .withColumn("d", expr("(tp - tc) div 86400000").cast("int"))
          .withColumn("w", lit(1.0) / expr("shiftleft(1L, d)").cast("double"))
        val tot = touches.groupBy(col("pid")).agg(sum(col("w")).as("totw"))
        touches.join(tot, Seq("pid"))
          .withColumn("share", round(col("w") / col("totw"), 9))
          .groupBy(col("channel"))
          .agg(count(lit(1)).as("n_touches"),
            round(sum(col("share").cast("decimal(28,12)")).cast("double"), 6)
              .as("credit"))
          .orderBy(col("channel"))
      },
      oracle = Some("""
        WITH c AS (
          SELECT user_id, epoch_ms(ts) AS tc,
                 CAST(json_extract_string(props, '$.k') AS BIGINT) % 4
                   AS channel
          FROM events WHERE event_type = 'click'),
        p AS (
          SELECT user_id, epoch_ms(ts) AS tp, event_id AS pid
          FROM events WHERE event_type = 'purchase'),
        t AS (
          SELECT pid, channel,
                 CAST(1 AS DOUBLE)
                   / CAST(1 << CAST((tp - tc) // 86400000 AS INT) AS DOUBLE)
                   AS w
          FROM p JOIN c USING (user_id)
          WHERE tc <= tp AND tp - tc <= 7 * 86400000),
        tw AS (SELECT pid, SUM(w) AS totw FROM t GROUP BY 1),
        sh AS (
          SELECT channel, ROUND(w / totw, 9) AS share
          FROM t JOIN tw USING (pid))
        SELECT channel, CAST(COUNT(*) AS BIGINT) AS n_touches,
               ROUND(CAST(SUM(CAST(share AS DECIMAL(28,12))) AS DOUBLE), 6)
                 AS credit
        FROM sh GROUP BY 1 ORDER BY channel""")),

    // Executive summary: the cross-table north-star metrics in ONE long-
    // format result — each metric a bounded scalar aggregate, unioned.
    // The dashboard query a reference user runs first.
    "q99_summary_dashboard" -> Q(
      fn = (s, dir) => {
        def metric(name: String, df: DataFrame) =
          df.select(lit(name).as("metric"), col("value"))
        val e = ev(s, dir)
        val li = t(s, dir, "lineitem")
        val docs = Tables(s, dir, "documents")
        Seq(
          metric("documents", docs.agg(count(lit(1)).cast("double").as("value"))),
          metric("doc_tokens", docs.select(
            size(TextAnalysis.tokens(col("text"))).as("n"))
            .agg(sum(col("n")).cast("double").as("value"))),
          metric("events", e.agg(count(lit(1)).cast("double").as("value"))),
          metric("active_users", e.agg(countDistinct(col("user_id"))
            .cast("double").as("value"))),
          metric("purchase_rate", e.agg(round(
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .cast("double") / count(lit(1)).cast("double"), 6).as("value"))),
          metric("orders", t(s, dir, "orders")
            .agg(count(lit(1)).cast("double").as("value"))),
          metric("gross_revenue", li.agg(
            sum((col("l_extendedprice") * (lit(1) - col("l_discount")))
              .cast("decimal(18,6)")).cast("decimal(18,2)").cast("double")
              .as("value"))),
          metric("avg_order_lines", li.agg(round(
            count(lit(1)).cast("double")
              / countDistinct(col("l_orderkey")).cast("double"), 6)
            .as("value"))))
          .reduce(_ unionByName _)
          .orderBy(col("metric"))
      },
      oracle = Some("""
        SELECT * FROM (
          SELECT 'documents' AS metric,
                 (SELECT CAST(COUNT(*) AS DOUBLE) FROM documents) AS value
          UNION ALL
          SELECT 'doc_tokens',
                 (SELECT CAST(SUM(len(regexp_split_to_array(trim(text),
                    '\s+'))) AS DOUBLE) FROM documents)
          UNION ALL
          SELECT 'events', (SELECT CAST(COUNT(*) AS DOUBLE) FROM events)
          UNION ALL
          SELECT 'active_users',
                 (SELECT CAST(COUNT(DISTINCT user_id) AS DOUBLE) FROM events)
          UNION ALL
          SELECT 'purchase_rate',
                 (SELECT ROUND(CAST(SUM(CASE WHEN event_type = 'purchase'
                      THEN 1 ELSE 0 END) AS DOUBLE)
                    / CAST(COUNT(*) AS DOUBLE), 6) FROM events)
          UNION ALL
          SELECT 'orders', (SELECT CAST(COUNT(*) AS DOUBLE) FROM orders)
          UNION ALL
          SELECT 'gross_revenue',
                 (SELECT CAST(CAST(ROUND(SUM(CAST(l_extendedprice
                      * (1 - l_discount) AS DECIMAL(18,6))), 2)
                    AS DECIMAL(18,2)) AS DOUBLE) FROM lineitem)
          UNION ALL
          SELECT 'avg_order_lines',
                 (SELECT ROUND(CAST(COUNT(*) AS DOUBLE)
                    / CAST(COUNT(DISTINCT l_orderkey) AS DOUBLE), 6)
                  FROM lineitem))
        ORDER BY metric""")),

    // Grouped anti-join rate: parts never sold, per brand — the
    // assortment dead-stock report (two-phase distinct sold set, left
    // anti against it, rates per bounded brand grain).
    "q9a_dead_stock" -> Q(
      fn = (s, dir) => {
        val p = t(s, dir, "part")
        val sold = t(s, dir, "lineitem").select(col("l_partkey")).distinct()
        val dead = p.join(sold, p("p_partkey") === sold("l_partkey"),
            "left_anti")
          .groupBy(col("p_brand")).agg(count(lit(1)).as("n_dead"))
        p.groupBy(col("p_brand")).agg(count(lit(1)).as("n_parts"))
          .join(dead, Seq("p_brand"), "left")
          .withColumn("n_dead", coalesce(col("n_dead"), lit(0L)))
          .withColumn("dead_rate", round(col("n_dead").cast("double")
            / col("n_parts").cast("double"), 6))
          .orderBy(col("p_brand"))
      },
      oracle = Some("""
        WITH sold AS (SELECT DISTINCT l_partkey FROM lineitem),
        d AS (
          SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_dead
          FROM part WHERE p_partkey NOT IN (SELECT l_partkey FROM sold)
          GROUP BY 1),
        a AS (
          SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS n_parts
          FROM part GROUP BY 1)
        SELECT a.p_brand, n_parts,
               CAST(COALESCE(n_dead, 0) AS BIGINT) AS n_dead,
               ROUND(CAST(COALESCE(n_dead, 0) AS DOUBLE)
                 / CAST(n_parts AS DOUBLE), 6) AS dead_rate
        FROM a LEFT JOIN d ON a.p_brand = d.p_brand
        ORDER BY a.p_brand""")),

    // Order-size histogram: lines-per-order distribution — two cheap
    // grouped aggregates, the fact-table shape profile.
    "q9b_order_size_histogram" -> Q(
      fn = (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_lines"))
          .groupBy(col("n_lines")).agg(count(lit(1)).as("n_orders"))
          .orderBy(col("n_lines")),
      oracle = Some("""
        SELECT n_lines, CAST(COUNT(*) AS BIGINT) AS n_orders
        FROM (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_lines
              FROM lineitem GROUP BY 1)
        GROUP BY 1 ORDER BY n_lines""")),

    // Peak hour per event type: deterministic argmax over the bounded
    // (type, hour) cell table via lexicographic struct-max — no window.
    "q9c_peak_hour" -> Q(
      fn = (s, dir) =>
        ev(s, dir)
          .withColumn("hod", (expr("ts_ms div 3600000") % 24).cast("int"))
          .groupBy(col("event_type"), col("hod"))
          .agg(count(lit(1)).as("n"))
          .groupBy(col("event_type"))
          .agg(max(struct(col("n"), (-col("hod")).as("neg"), col("hod")))
            .as("w"), sum(col("n")).as("n_total"))
          .select(col("event_type"), col("w.hod").as("peak_hour"),
            col("w.n").as("peak_n"), col("n_total"),
            round(col("w.n").cast("double") / col("n_total").cast("double"), 6)
              .as("peak_share"))
          .orderBy(col("event_type")),
      oracle = Some("""
        WITH c AS (
          SELECT event_type,
                 CAST((epoch_ms(ts) // 3600000) % 24 AS INT) AS hod,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2)
        SELECT event_type,
               MAX({'n': n, 'neg': -hod, 'hod': hod})['hod'] AS peak_hour,
               MAX({'n': n, 'neg': -hod, 'hod': hod})['n'] AS peak_n,
               CAST(SUM(n) AS BIGINT) AS n_total,
               ROUND(CAST(MAX({'n': n, 'neg': -hod, 'hod': hod})['n']
                   AS DOUBLE) / CAST(SUM(n) AS DOUBLE), 6) AS peak_share
        FROM c GROUP BY event_type ORDER BY event_type""")),

    // Shipping-lag quantiles per priority: exact median/p90 of the
    // ship-minus-order day gap through the grouped global running sum
    // (unit weights — the weighted-quantile machinery doubles as the
    // exact unweighted one). Negative lags are reported honestly — the
    // synthetic fixture ships before ordering half the time.
    "q9e_ship_lag" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem")
        val o = t(s, dir, "orders")
        val lag = li.join(o, li("l_orderkey") === o("o_orderkey"))
          .select(col("o_orderpriority"),
            ((unix_millis(col("l_shipdate").cast("timestamp"))
              - unix_millis(col("o_orderdate").cast("timestamp")))
              / lit(86400000L)).cast("long").as("lag_days"),
            col("l_orderkey"), col("l_linenumber"),
            lit(java.math.BigDecimal.ONE).cast("decimal(18,2)").as("w"))
        Stats.weightedQuantiles(lag, Seq("o_orderpriority"),
            col("lag_days"), col("w"), Seq(500, 900),
            Seq(col("l_orderkey"), col("l_linenumber")))
          .orderBy(col("o_orderpriority"))
      },
      oracle = Some("""
        WITH l AS (
          SELECT o_orderpriority,
                 CAST((epoch_ms(l_shipdate) - epoch_ms(o_orderdate))
                   / 86400000 AS BIGINT) AS v,
                 CAST(1 AS DECIMAL(18,2)) AS w, l_orderkey, l_linenumber
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
        c AS (
          SELECT *,
                 SUM(w) OVER (PARTITION BY o_orderpriority
                   ORDER BY v, l_orderkey, l_linenumber
                   ROWS UNBOUNDED PRECEDING) AS cumw,
                 SUM(w) OVER (PARTITION BY o_orderpriority) AS totw
          FROM l)
        SELECT o_orderpriority,
               MIN(CASE WHEN cumw * 1000 >= totw * 500 THEN v END) AS wq_500,
               MIN(CASE WHEN cumw * 1000 >= totw * 900 THEN v END) AS wq_900
        FROM c GROUP BY 1 ORDER BY 1""")),

    // Year-over-year growth per calendar month: the bounded monthly
    // revenue table self-joined at month − 12 (no global window), growth
    // as one rounded division.
    "q9f_yoy_growth" -> Q(
      fn = (s, dir) => {
        val o = t(s, dir, "orders")
          .withColumn("ym", (year(col("o_orderdate")) * 12
            + month(col("o_orderdate")) - 1).cast("long"))
        val monthly = o.groupBy(col("ym"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
        monthly
          .join(monthly.select((col("ym") + 12).as("ym"),
            col("rev").as("prev_rev")), Seq("ym"), "left")
          .select(col("ym"), col("rev").cast("double").as("revenue"),
            col("prev_rev").cast("double").as("revenue_prev_year"),
            round(col("rev").cast("double") / col("prev_rev").cast("double")
              - 1.0, 6).as("yoy_growth"))
          .orderBy(col("ym"))
      },
      oracle = Some("""
        WITH m AS (
          SELECT CAST(date_part('year', o_orderdate) * 12
                   + date_part('month', o_orderdate) - 1 AS BIGINT) AS ym,
                 SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
          FROM orders GROUP BY 1)
        SELECT a.ym, CAST(a.rev AS DOUBLE) AS revenue,
               CAST(b.rev AS DOUBLE) AS revenue_prev_year,
               ROUND(CAST(a.rev AS DOUBLE) / CAST(b.rev AS DOUBLE)
                 - CAST(1 AS DOUBLE), 6) AS yoy_growth
        FROM m a LEFT JOIN m b ON a.ym = b.ym + 12
        ORDER BY a.ym"""))
  )
}

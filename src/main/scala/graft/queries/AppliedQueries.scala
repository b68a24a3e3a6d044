package graft.queries

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-8 session-4 families: applied business/ops analytics that the
  * qa0-qfw waves have not yet touched — segregation & abundance profile
  * comparison, forecast-acceptance error batteries, return/risk ratio
  * cards, regional-economics decompositions (shift-share, RCA), revenue
  * retention, signal cleaning (Savitzky-Golay + Hampel), credibility /
  * chain-ladder actuarial methods, and HAC-robust regression inference.
  *
  * Every query carries an exact DuckDB oracle under the CLAUDE.md parity
  * rules: DECIMAL moment sums with per-term 9-decimal rounds, ln/÷/sqrt
  * -only float links, DECIMAL multiplies wherever an exact grid product
  * could land on a rounding half-boundary (rule 15), and `+ CAST(0 AS
  * DOUBLE)` guards on any ROUND whose argument can be a tiny negative.
  *
  * Reference anchor: the-hive's analytics surface stops at counts and
  * rollups (internal/server/search_handler.go, internal/server/stats_handler.go); these
  * queries extend the engine's applied-analytics battery the same way
  * the earlier waves do — declaratively, over the driver fixtures,
  * oracle-exact, with every shuffle keyed and every scalar broadcast.
  */
object AppliedQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** Daily order revenue in millions, exact DECIMAL(18,8) (the StatQueries
    * recipe): /1e6 of a 2-decimal sum has exactly 8 decimals, so values
    * stay O(1..10) and every downstream ROUND(x,6) term remains inside
    * the 15-significant-digit oracle-safe envelope.
    */
  private def dailyRevenueM(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000")
        .as("day"))
      .agg((sum(col("o_totalprice").cast("decimal(18,2)")) / lit(1000000))
        .cast("decimal(18,8)").as("ym"))

  private val dailyRevenueMSql: String =
    """SELECT CAST(epoch_ms(o_orderdate) // 86400000 AS BIGINT) AS day,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) / 1000000
      |         AS DECIMAL(18,8)) AS ym
      |FROM orders GROUP BY 1""".stripMargin

  /** round-9 → DECIMAL(20,9) accumulator term (the q4b grid recipe). */
  private def g9(c: Column): Column = round(c, 9).cast("decimal(20,9)")

  val defs: Map[String, Q] = Map(

    // Segregation / dissimilarity card over the customer market-segment
    // × nation distribution: Duncan's dissimilarity D between the two
    // reference segments, the isolation and interaction exposure
    // indices, and Theil's entropy segregation index H over all five
    // segments — the demography/market-structure battery (how unevenly
    // are segments spread across nations). All shares are exact-integer
    // ratios; ln is the only float link; per-term 9-grid DECIMAL sums.
    "qfx_segregation_indices" -> Q(
      fn = (s, dir) => {
        val c = t(s, dir, "customer")
          .groupBy(col("c_nationkey").as("n"), col("c_mktsegment").as("g"))
          .agg(count(lit(1)).as("cnt"))
          .localCheckpoint(eager = false)
        val natT = c.groupBy(col("n")).agg(sum(col("cnt")).as("tn"))
        val tot = c.agg(sum(col("cnt")).as("tt"),
          sum(when(col("g") === "AUTOMOBILE", col("cnt")).otherwise(0L))
            .as("ca"),
          sum(when(col("g") === "BUILDING", col("cnt")).otherwise(0L))
            .as("cb"))
        // per-nation a/b counts (0 where a segment is absent)
        val ab = c.groupBy(col("n")).agg(
          sum(when(col("g") === "AUTOMOBILE", col("cnt")).otherwise(0L))
            .as("a"),
          sum(when(col("g") === "BUILDING", col("cnt")).otherwise(0L))
            .as("b"))
        val duncan = ab.crossJoin(broadcast(tot))
          .join(natT, Seq("n"))
          .select(
            g9(abs(col("a").cast("double") / col("ca").cast("double") -
              col("b").cast("double") / col("cb").cast("double"))).as("dd"),
            g9((col("a").cast("double") / col("ca").cast("double")) *
              (col("a").cast("double") / col("tn").cast("double"))).as("iso"),
            g9((col("a").cast("double") / col("ca").cast("double")) *
              (col("b").cast("double") / col("tn").cast("double"))).as("ixn"))
          .agg(sum(col("dd")).as("sdd"), sum(col("iso")).as("siso"),
            sum(col("ixn")).as("sixn"))
        // global entropy E over segments, per-nation entropy E_n
        val eGlob = c.groupBy(col("g")).agg(sum(col("cnt")).as("gg"))
          .crossJoin(broadcast(tot))
          .select(g9(-(col("gg").cast("double") / col("tt").cast("double")) *
            log(col("gg").cast("double") / col("tt").cast("double")))
            .as("e"))
          .agg(sum(col("e")).as("se"))
        val eNat = c.join(natT, Seq("n"))
          .select(col("n"), col("tn"),
            g9(-(col("cnt").cast("double") / col("tn").cast("double")) *
              log(col("cnt").cast("double") / col("tn").cast("double")))
              .as("e"))
          .groupBy(col("n"), col("tn")).agg(sum(col("e")).as("en"))
        val h = eNat.crossJoin(broadcast(eGlob)).crossJoin(broadcast(tot))
          .select(g9((col("tn").cast("double") / col("tt").cast("double")) *
            (col("se").cast("double") - col("en").cast("double")) /
            col("se").cast("double")).as("ht"))
          .agg(sum(col("ht")).as("sh"))
        duncan.crossJoin(broadcast(h))
          .select(
            round(col("sdd").cast("double") / 2, 6).as("duncan_d"),
            round(col("siso").cast("double"), 6).as("isolation_a"),
            round(col("sixn").cast("double"), 6).as("interaction_ab"),
            (round(col("sh").cast("double"), 6) + lit(0.0).cast("double"))
              .as("entropy_h"))
      },
      oracle = Some("""
        WITH c AS MATERIALIZED (
          SELECT c_nationkey AS n, c_mktsegment AS g,
                 CAST(COUNT(*) AS BIGINT) AS cnt
          FROM customer GROUP BY 1, 2),
        natt AS (SELECT n, CAST(SUM(cnt) AS BIGINT) AS tn FROM c GROUP BY 1),
        tot AS (
          SELECT CAST(SUM(cnt) AS BIGINT) AS tt,
                 CAST(SUM(CASE WHEN g = 'AUTOMOBILE' THEN cnt ELSE 0 END)
                   AS BIGINT) AS ca,
                 CAST(SUM(CASE WHEN g = 'BUILDING' THEN cnt ELSE 0 END)
                   AS BIGINT) AS cb
          FROM c),
        ab AS (
          SELECT n,
                 CAST(SUM(CASE WHEN g = 'AUTOMOBILE' THEN cnt ELSE 0 END)
                   AS BIGINT) AS a,
                 CAST(SUM(CASE WHEN g = 'BUILDING' THEN cnt ELSE 0 END)
                   AS BIGINT) AS b
          FROM c GROUP BY 1),
        duncan AS (
          SELECT SUM(CAST(ROUND(abs(CAST(a AS DOUBLE) / CAST(ca AS DOUBLE) -
                   CAST(b AS DOUBLE) / CAST(cb AS DOUBLE)), 9)
                 AS DECIMAL(20,9))) AS sdd,
                 SUM(CAST(ROUND((CAST(a AS DOUBLE) / CAST(ca AS DOUBLE)) *
                   (CAST(a AS DOUBLE) / CAST(tn AS DOUBLE)), 9)
                 AS DECIMAL(20,9))) AS siso,
                 SUM(CAST(ROUND((CAST(a AS DOUBLE) / CAST(ca AS DOUBLE)) *
                   (CAST(b AS DOUBLE) / CAST(tn AS DOUBLE)), 9)
                 AS DECIMAL(20,9))) AS sixn
          FROM ab CROSS JOIN tot JOIN natt USING (n)),
        eglob AS (
          SELECT SUM(CAST(ROUND(-(CAST(gg AS DOUBLE) / CAST(tt AS DOUBLE)) *
                   ln(CAST(gg AS DOUBLE) / CAST(tt AS DOUBLE)), 9)
                 AS DECIMAL(20,9))) AS se
          FROM (SELECT g, CAST(SUM(cnt) AS BIGINT) AS gg FROM c GROUP BY 1)
               CROSS JOIN tot),
        enat AS (
          SELECT n, tn,
                 SUM(CAST(ROUND(-(CAST(cnt AS DOUBLE) / CAST(tn AS DOUBLE)) *
                   ln(CAST(cnt AS DOUBLE) / CAST(tn AS DOUBLE)), 9)
                 AS DECIMAL(20,9))) AS en
          FROM c JOIN natt USING (n) GROUP BY 1, 2),
        h AS (
          SELECT SUM(CAST(ROUND((CAST(tn AS DOUBLE) / CAST(tt AS DOUBLE)) *
                   (CAST(se AS DOUBLE) - CAST(en AS DOUBLE)) /
                   CAST(se AS DOUBLE), 9) AS DECIMAL(20,9))) AS sh
          FROM enat CROSS JOIN eglob CROSS JOIN tot)
        SELECT ROUND(CAST(sdd AS DOUBLE) / 2, 6) AS duncan_d,
               ROUND(CAST(siso AS DOUBLE), 6) AS isolation_a,
               ROUND(CAST(sixn AS DOUBLE), 6) AS interaction_ab,
               ROUND(CAST(sh AS DOUBLE), 6) + CAST(0 AS DOUBLE) AS entropy_h
        FROM duncan CROSS JOIN h""")),

    // Abundance-profile distance battery between the early and late
    // shipping halves of the brand mix: Bray-Curtis dissimilarity,
    // Morisita-Horn overlap, Hellinger distance and total variation —
    // the ecology/ML toolkit for "did the corpus composition move",
    // complementing qcz's Jensen-Shannon and qav's Wasserstein with the
    // abundance-native indices. Counts are exact integers end-to-end;
    // only the final ratios and sqrt links run in doubles.
    "qfy_abundance_distance" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem")
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(
            sum(when(col("l_shipdate") < lit("1998-07-01").cast("timestamp"),
              1L).otherwise(0L)).as("x"),
            sum(when(col("l_shipdate") >= lit("1998-07-01").cast("timestamp"),
              1L).otherwise(0L)).as("y"))
          .localCheckpoint(eager = false)
        val tots = li.agg(sum(col("x")).as("xx"), sum(col("y")).as("yy"))
        val agg = li.crossJoin(broadcast(tots))
          .select(col("x"), col("y"), col("xx"), col("yy"),
            g9(sqrt((col("x").cast("double") / col("xx").cast("double")) *
              (col("y").cast("double") / col("yy").cast("double"))))
              .as("bcc"),
            g9(abs(col("x").cast("double") / col("xx").cast("double") -
              col("y").cast("double") / col("yy").cast("double"))).as("tv"))
          .agg(
            sum(abs(col("x") - col("y"))).as("sad"),
            sum(col("x") + col("y")).as("stot"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"),
            first(col("xx")).as("xx"), first(col("yy")).as("yy"),
            sum(col("bcc")).as("sbcc"), sum(col("tv")).as("stv"))
        agg.select(
          round(col("sad").cast("double") / col("stot").cast("double"), 6)
            .as("bray_curtis"),
          round(lit(2.0) * col("sxy").cast("double") /
            ((col("sxx").cast("double") /
              (col("xx").cast("double") * col("xx").cast("double")) +
              col("syy").cast("double") /
                (col("yy").cast("double") * col("yy").cast("double"))) *
              col("xx").cast("double") * col("yy").cast("double")), 6)
            .as("morisita_horn"),
          round(sqrt(greatest(lit(1.0) - col("sbcc").cast("double"),
            lit(0.0))), 6).as("hellinger"),
          round(col("stv").cast("double") / 2, 6).as("total_variation"))
      },
      oracle = Some("""
        WITH li AS MATERIALIZED (
          SELECT p_brand,
                 CAST(SUM(CASE WHEN l_shipdate < TIMESTAMP '1998-07-01'
                   THEN 1 ELSE 0 END) AS BIGINT) AS x,
                 CAST(SUM(CASE WHEN l_shipdate >= TIMESTAMP '1998-07-01'
                   THEN 1 ELSE 0 END) AS BIGINT) AS y
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY 1),
        tots AS (
          SELECT CAST(SUM(x) AS BIGINT) AS xx, CAST(SUM(y) AS BIGINT) AS yy
          FROM li),
        agg AS (
          SELECT CAST(SUM(abs(x - y)) AS BIGINT) AS sad,
                 CAST(SUM(x + y) AS BIGINT) AS stot,
                 CAST(SUM(x * y) AS BIGINT) AS sxy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx,
                 CAST(SUM(y * y) AS BIGINT) AS syy,
                 MAX(xx) AS xx, MAX(yy) AS yy,
                 SUM(CAST(ROUND(sqrt((CAST(x AS DOUBLE) / CAST(xx AS DOUBLE)) *
                   (CAST(y AS DOUBLE) / CAST(yy AS DOUBLE))), 9)
                   AS DECIMAL(20,9))) AS sbcc,
                 SUM(CAST(ROUND(abs(CAST(x AS DOUBLE) / CAST(xx AS DOUBLE) -
                   CAST(y AS DOUBLE) / CAST(yy AS DOUBLE)), 9)
                   AS DECIMAL(20,9))) AS stv
          FROM li CROSS JOIN tots)
        SELECT ROUND(CAST(sad AS DOUBLE) / CAST(stot AS DOUBLE), 6)
                 AS bray_curtis,
               ROUND(CAST(2 AS DOUBLE) * CAST(sxy AS DOUBLE) /
                 ((CAST(sxx AS DOUBLE) /
                   (CAST(xx AS DOUBLE) * CAST(xx AS DOUBLE)) +
                   CAST(syy AS DOUBLE) /
                   (CAST(yy AS DOUBLE) * CAST(yy AS DOUBLE))) *
                  CAST(xx AS DOUBLE) * CAST(yy AS DOUBLE)), 6)
                 AS morisita_horn,
               ROUND(sqrt(GREATEST(CAST(1 AS DOUBLE) -
                 CAST(sbcc AS DOUBLE), CAST(0 AS DOUBLE))), 6) AS hellinger,
               ROUND(CAST(stv AS DOUBLE) / 2, 6) AS total_variation
        FROM agg""")),

    // Forecast-acceptance error battery: naive (lag-1) vs seasonal-naive
    // (lag-7) one-step forecasts of daily revenue, scored with the
    // production acceptance metrics q7l's Holt backtest does not carry —
    // MAPE, sMAPE, MASE (scaled by the naive MAE), pinball loss at
    // τ=0.9 and directional accuracy. Errors are EXACT DECIMAL(19,8)
    // differences of the exact daily-revenue grid; squared/pinball
    // terms multiply in DECIMAL (rule 15) so every sum is exact or
    // 9-grid-snapped before the final ratios.
    "qfz_forecast_errors" -> Q(
      fn = (s, dir) => {
        val w = Window.orderBy(col("day"))
        val base = dailyRevenueM(s, dir)
          .select(col("day"), col("ym"),
            lag(col("ym"), 1).over(w).as("f1"),
            lag(col("ym"), 7).over(w).as("f7"),
            row_number().over(w).as("rn"))
          .filter(col("rn") > 7)
          .localCheckpoint(eager = false)
        val rows = base.select(lit("naive").as("method"), col("ym"),
          col("f1").as("f"), col("f1"))
          .unionByName(base.select(lit("snaive").as("method"), col("ym"),
            col("f7").as("f"), col("f1")))
        val per = rows
          .select(col("method"), col("ym"), col("f"), col("f1"),
            (col("ym") - col("f")).as("e"))
          .select(col("method"),
            abs(col("e")).as("ae"),
            round(col("e") * col("e"), 9).as("e2"),
            g9(abs(col("e")).cast("double") / col("ym").cast("double"))
              .as("ape"),
            g9(lit(2.0) * abs(col("e")).cast("double") /
              (col("f") + col("ym")).cast("double")).as("sape"),
            when(col("e") >= 0, col("e") * lit(0.9).cast("decimal(2,1)"))
              .otherwise(-col("e") * lit(0.1).cast("decimal(2,1)"))
              .as("pb"),
            when((col("f") > col("f1") && col("ym") > col("f1")) ||
              (col("f") < col("f1") && col("ym") < col("f1")) ||
              (col("f") === col("f1") && col("ym") === col("f1")), 1L)
              .otherwise(0L).as("hit"))
          .groupBy(col("method"))
          .agg(count(lit(1)).as("n"), sum(col("ae")).as("sae"),
            sum(col("e2")).as("se2"), sum(col("ape")).as("sape_"),
            sum(col("sape")).as("ssape"), sum(col("pb")).as("spb"),
            sum(col("hit")).as("hits"))
          .localCheckpoint(eager = false)
        val naiveMae = per.filter(col("method") === "naive")
          .select(col("sae").as("nsae"))
        per.crossJoin(broadcast(naiveMae))
          .select(col("method"), col("n"),
            round(col("sae").cast("double") / col("n").cast("double"), 6)
              .as("mae"),
            round(sqrt(col("se2").cast("double") / col("n").cast("double")),
              6).as("rmse"),
            round(col("sape_").cast("double") / col("n").cast("double"), 6)
              .as("mape"),
            round(col("ssape").cast("double") / col("n").cast("double"), 6)
              .as("smape"),
            round(col("sae").cast("double") / col("nsae").cast("double"), 6)
              .as("mase"),
            round(col("spb").cast("double") / col("n").cast("double"), 6)
              .as("pinball90"),
            round(col("hits").cast("double") / col("n").cast("double"), 6)
              .as("dir_acc"))
          .orderBy(col("method"))
      },
      oracle = Some(s"""
        WITH d AS ($dailyRevenueMSql),
        base AS MATERIALIZED (
          SELECT * FROM (
            SELECT day, ym,
                   LAG(ym, 1) OVER (ORDER BY day) AS f1,
                   LAG(ym, 7) OVER (ORDER BY day) AS f7,
                   ROW_NUMBER() OVER (ORDER BY day) AS rn
            FROM d) WHERE rn > 7),
        rows_ AS (
          SELECT 'naive' AS method, ym, f1 AS f, f1 FROM base
          UNION ALL
          SELECT 'snaive' AS method, ym, f7 AS f, f1 FROM base),
        per AS MATERIALIZED (
          SELECT method, CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(abs(ym - f)) AS sae,
                 SUM(ROUND(CAST(ym - f AS DECIMAL(19,8)) *
                   CAST(ym - f AS DECIMAL(19,8)), 9)) AS se2,
                 SUM(CAST(ROUND(CAST(abs(ym - f) AS DOUBLE) /
                   CAST(ym AS DOUBLE), 9) AS DECIMAL(20,9))) AS sape_,
                 SUM(CAST(ROUND(CAST(2 AS DOUBLE) *
                   CAST(abs(ym - f) AS DOUBLE) /
                   CAST(f + ym AS DOUBLE), 9) AS DECIMAL(20,9))) AS ssape,
                 SUM(CASE WHEN ym - f >= 0 THEN (ym - f) * 0.9
                          ELSE -(ym - f) * 0.1 END) AS spb,
                 CAST(SUM(CASE WHEN (f > f1 AND ym > f1) OR
                   (f < f1 AND ym < f1) OR (f = f1 AND ym = f1)
                   THEN 1 ELSE 0 END) AS BIGINT) AS hits
          FROM rows_ GROUP BY 1),
        nmae AS (SELECT sae AS nsae FROM per WHERE method = 'naive')
        SELECT method, n,
               ROUND(CAST(sae AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mae,
               ROUND(sqrt(CAST(se2 AS DOUBLE) / CAST(n AS DOUBLE)), 6)
                 AS rmse,
               ROUND(CAST(sape_ AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mape,
               ROUND(CAST(ssape AS DOUBLE) / CAST(n AS DOUBLE), 6) AS smape,
               ROUND(CAST(sae AS DOUBLE) / CAST(nsae AS DOUBLE), 6) AS mase,
               ROUND(CAST(spb AS DOUBLE) / CAST(n AS DOUBLE), 6)
                 AS pinball90,
               ROUND(CAST(hits AS DOUBLE) / CAST(n AS DOUBLE), 6)
                 AS dir_acc
        FROM per CROSS JOIN nmae ORDER BY method""")),

    // Return/risk ratio card on the daily-revenue first differences:
    // Sharpe, Sortino (downside deviation), Omega (gain/loss mass),
    // Kelly fraction (mean/variance) and hit rate — the finance-desk
    // acceptance numbers qfi's VaR/CVaR and qfj's drawdown card do not
    // cover. Differences are exact DECIMAL(19,8); squares multiply in
    // DECIMAL and snap to the 9-grid; gain/loss masses stay exact.
    "qg0_revenue_risk_card" -> Q(
      fn = (s, dir) => {
        val w = Window.orderBy(col("day"))
        val r = dailyRevenueM(s, dir)
          .select(col("day"), (col("ym") - lag(col("ym"), 1).over(w))
            .as("r"))
          .filter(col("r").isNotNull)
        val agg = r.agg(
          count(lit(1)).as("n"),
          sum(col("r")).as("sr"),
          sum(round(col("r") * col("r"), 9)).as("srr"),
          sum(when(col("r") < 0, round(col("r") * col("r"), 9))
            .otherwise(lit(0).cast("decimal(20,9)"))).as("sdr"),
          sum(when(col("r") > 0, col("r")).otherwise(lit(0)
            .cast("decimal(19,8)"))).as("spos"),
          sum(when(col("r") < 0, -col("r")).otherwise(lit(0)
            .cast("decimal(19,8)"))).as("sneg"),
          sum(when(col("r") > 0, 1L).otherwise(0L)).as("hits"))
        agg.select(col("n").as("n_days"),
          (round(col("sr").cast("double") / col("n").cast("double"), 6) +
            lit(0.0)).as("mean_r"),
          round(sqrt((col("srr").cast("double") -
            col("sr").cast("double") * col("sr").cast("double") /
              col("n").cast("double")) / (col("n") - 1).cast("double")), 6)
            .as("std_r"),
          (round((col("sr").cast("double") / col("n").cast("double")) /
            sqrt((col("srr").cast("double") -
              col("sr").cast("double") * col("sr").cast("double") /
                col("n").cast("double")) / (col("n") - 1).cast("double")),
            6) + lit(0.0)).as("sharpe"),
          (round((col("sr").cast("double") / col("n").cast("double")) /
            sqrt(col("sdr").cast("double") / col("n").cast("double")), 6) +
            lit(0.0)).as("sortino"),
          round(col("spos").cast("double") / col("sneg").cast("double"), 6)
            .as("omega"),
          (round((col("sr").cast("double") / col("n").cast("double")) /
            ((col("srr").cast("double") -
              col("sr").cast("double") * col("sr").cast("double") /
                col("n").cast("double")) / (col("n") - 1).cast("double")),
            6) + lit(0.0)).as("kelly"),
          round(col("hits").cast("double") / col("n").cast("double"), 6)
            .as("hit_rate"))
      },
      oracle = Some(s"""
        WITH d AS ($dailyRevenueMSql),
        r AS (
          SELECT CAST(ym - LAG(ym, 1) OVER (ORDER BY day)
            AS DECIMAL(19,8)) AS r
          FROM d QUALIFY r IS NOT NULL),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(r) AS sr,
                 SUM(ROUND(r * r, 9)) AS srr,
                 SUM(CASE WHEN r < 0 THEN ROUND(r * r, 9)
                     ELSE CAST(0 AS DECIMAL(20,9)) END) AS sdr,
                 SUM(CASE WHEN r > 0 THEN r
                     ELSE CAST(0 AS DECIMAL(19,8)) END) AS spos,
                 SUM(CASE WHEN r < 0 THEN -r
                     ELSE CAST(0 AS DECIMAL(19,8)) END) AS sneg,
                 CAST(SUM(CASE WHEN r > 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS hits
          FROM r)
        SELECT n AS n_days,
               ROUND(CAST(sr AS DOUBLE) / CAST(n AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS mean_r,
               ROUND(sqrt((CAST(srr AS DOUBLE) -
                 CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE) /
                 CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE)), 6) AS std_r,
               ROUND((CAST(sr AS DOUBLE) / CAST(n AS DOUBLE)) /
                 sqrt((CAST(srr AS DOUBLE) -
                   CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE) /
                   CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS sharpe,
               ROUND((CAST(sr AS DOUBLE) / CAST(n AS DOUBLE)) /
                 sqrt(CAST(sdr AS DOUBLE) / CAST(n AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS sortino,
               ROUND(CAST(spos AS DOUBLE) / CAST(sneg AS DOUBLE), 6)
                 AS omega,
               ROUND((CAST(sr AS DOUBLE) / CAST(n AS DOUBLE)) /
                 ((CAST(srr AS DOUBLE) -
                   CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE) /
                   CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS kelly,
               ROUND(CAST(hits AS DOUBLE) / CAST(n AS DOUBLE), 6)
                 AS hit_rate
        FROM agg""")),

    // Shift-share decomposition of nation revenue growth between the
    // pre-1998 and post-1998 halves, industry = brand: national-share
    // (what the nation would gain growing at the aggregate rate),
    // industry-mix (its brand portfolio's differential growth) and the
    // residual competitive shift — with rs defined as e2 − e1·(1+g_b)
    // the three components sum EXACTLY to the observed change even for
    // cells that appear or vanish. Revenue in exact millions; the only
    // float links are the growth-rate ratios; per-term 9-grid sums.
    "qg1_shift_share" -> Q(
      fn = (s, dir) => {
        val cell = t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .groupBy(col("c_nationkey").as("n"), col("p_brand").as("b"))
          .agg(
            (sum(when(col("o_orderdate") < lit("1998-01-01")
              .cast("timestamp"), col("l_extendedprice")).otherwise(0.0)
              .cast("decimal(18,2)")) / lit(1000000)).cast("decimal(18,8)")
              .as("e1"),
            (sum(when(col("o_orderdate") >= lit("1998-01-01")
              .cast("timestamp"), col("l_extendedprice")).otherwise(0.0)
              .cast("decimal(18,2)")) / lit(1000000)).cast("decimal(18,8)")
              .as("e2"))
          .localCheckpoint(eager = false)
        val brand = cell.groupBy(col("b"))
          .agg(sum(col("e1")).as("b1"), sum(col("e2")).as("b2"))
        val tot = cell.agg(sum(col("e1")).as("t1"), sum(col("e2")).as("t2"))
        cell.join(broadcast(brand), Seq("b")).crossJoin(broadcast(tot))
          .select(col("n"), col("e1"), col("e2"),
            (col("t2").cast("double") / col("t1").cast("double") - 1)
              .as("g"),
            (col("b2").cast("double") / col("b1").cast("double") - 1)
              .as("gb"))
          .select(col("n"), col("e1"), col("e2"),
            g9(col("e1").cast("double") * col("g")).as("ns"),
            g9(col("e1").cast("double") * (col("gb") - col("g"))).as("im"),
            g9(col("e2").cast("double") -
              col("e1").cast("double") * (col("gb") + 1)).as("rs"))
          .groupBy(col("n"))
          .agg(sum(col("e1")).as("se1"), sum(col("e2") - col("e1"))
            .as("chg"), sum(col("ns")).as("sns"), sum(col("im")).as("sim"),
            sum(col("rs")).as("srs"))
          .select(col("n"),
            round(col("se1").cast("double"), 6).as("base_m"),
            (round(col("chg").cast("double"), 6) + lit(0.0)).as("change_m"),
            (round(col("sns").cast("double"), 6) + lit(0.0))
              .as("national_share"),
            (round(col("sim").cast("double"), 6) + lit(0.0))
              .as("industry_mix"),
            (round(col("srs").cast("double"), 6) + lit(0.0))
              .as("competitive_shift"))
          .orderBy(col("n"))
      },
      oracle = Some("""
        WITH cell AS MATERIALIZED (
          SELECT c_nationkey AS n, p_brand AS b,
                 CAST(SUM(CAST(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                   THEN l_extendedprice ELSE 0 END AS DECIMAL(18,2)))
                   / 1000000 AS DECIMAL(18,8)) AS e1,
                 CAST(SUM(CAST(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
                   THEN l_extendedprice ELSE 0 END AS DECIMAL(18,2)))
                   / 1000000 AS DECIMAL(18,8)) AS e2
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN part ON l_partkey = p_partkey
          GROUP BY 1, 2),
        brand AS (
          SELECT b, SUM(e1) AS b1, SUM(e2) AS b2 FROM cell GROUP BY 1),
        tot AS (SELECT SUM(e1) AS t1, SUM(e2) AS t2 FROM cell),
        terms AS (
          SELECT n, e1, e2,
                 CAST(ROUND(CAST(e1 AS DOUBLE) * g, 9) AS DECIMAL(20,9))
                   AS ns,
                 CAST(ROUND(CAST(e1 AS DOUBLE) * (gb - g), 9)
                   AS DECIMAL(20,9)) AS im,
                 CAST(ROUND(CAST(e2 AS DOUBLE) -
                   CAST(e1 AS DOUBLE) * (gb + 1), 9) AS DECIMAL(20,9)) AS rs
          FROM (
            SELECT n, e1, e2,
                   CAST(t2 AS DOUBLE) / CAST(t1 AS DOUBLE) - 1 AS g,
                   CAST(b2 AS DOUBLE) / CAST(b1 AS DOUBLE) - 1 AS gb
            FROM cell JOIN brand USING (b) CROSS JOIN tot))
        SELECT n,
               ROUND(CAST(SUM(e1) AS DOUBLE), 6) AS base_m,
               ROUND(CAST(SUM(e2 - e1) AS DOUBLE), 6) + CAST(0 AS DOUBLE)
                 AS change_m,
               ROUND(CAST(SUM(ns) AS DOUBLE), 6) + CAST(0 AS DOUBLE)
                 AS national_share,
               ROUND(CAST(SUM(im) AS DOUBLE), 6) + CAST(0 AS DOUBLE)
                 AS industry_mix,
               ROUND(CAST(SUM(rs) AS DOUBLE), 6) + CAST(0 AS DOUBLE)
                 AS competitive_shift
        FROM terms GROUP BY n ORDER BY n""")),

    // Balassa revealed-comparative-advantage matrix over nation × brand
    // line counts: RCA = (c_nb/c_n)/(c_b/T) — which nations
    // over-purchase which brands relative to the world mix. Pure
    // exact-integer arithmetic to ONE double division (both products
    // stay far below 2^53); the top-20 cut is tie-broken on (n, b) so
    // the emitted set is engine-stable at every SF (RCA → 1 as cells
    // grow, so a fixed threshold would go vacuous at bench scale).
    "qg2_rca_balassa" -> Q(
      fn = (s, dir) => {
        val cell = t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .groupBy(col("c_nationkey").as("n"), col("p_brand").as("b"))
          .agg(count(lit(1)).as("cnb"))
          .localCheckpoint(eager = false)
        val natC = cell.groupBy(col("n")).agg(sum(col("cnb")).as("cn"))
        val brC = cell.groupBy(col("b")).agg(sum(col("cnb")).as("cb"))
        val tot = cell.agg(sum(col("cnb")).as("tt"))
        cell.join(natC, Seq("n")).join(broadcast(brC), Seq("b"))
          .crossJoin(broadcast(tot))
          .select(col("n"), col("b"), col("cnb"),
            round((col("cnb") * col("tt")).cast("double") /
              (col("cn") * col("cb")).cast("double"), 6).as("rca"))
          .orderBy(col("rca").desc, col("n"), col("b"))
          .limit(20)
      },
      oracle = Some("""
        WITH cell AS MATERIALIZED (
          SELECT c_nationkey AS n, p_brand AS b,
                 CAST(COUNT(*) AS BIGINT) AS cnb
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN part ON l_partkey = p_partkey
          GROUP BY 1, 2),
        natc AS (SELECT n, CAST(SUM(cnb) AS BIGINT) AS cn FROM cell
                 GROUP BY 1),
        brc AS (SELECT b, CAST(SUM(cnb) AS BIGINT) AS cb FROM cell
                GROUP BY 1),
        tot AS (SELECT CAST(SUM(cnb) AS BIGINT) AS tt FROM cell)
        SELECT n, b, cnb,
               ROUND(CAST(cnb * tt AS DOUBLE) / CAST(cn * cb AS DOUBLE), 6)
                 AS rca
        FROM cell JOIN natc USING (n) JOIN brc USING (b) CROSS JOIN tot
        ORDER BY rca DESC, n, b LIMIT 20""")),

    // Net / gross revenue retention by calendar month: for each month
    // pair (m, m+1), the revenue of month-m active customers observed
    // in m+1 — uncapped (NRR, expansion counts) and capped at each
    // customer's month-m revenue (GRR, only contraction counts) — the
    // SaaS-board metric pair q7i's cohort-LTV curves do not give.
    // Revenue stays exact DECIMAL(18,2); LEAST of exact decimals is
    // exact; the two ratios are the only float links.
    "qg3_nrr_grr" -> Q(
      fn = (s, dir) => {
        val cm = t(s, dir, "orders")
          .groupBy(col("o_custkey").as("c"),
            expr("CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)")
              .as("m"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
          .localCheckpoint(eager = false)
        val maxM = cm.agg(max(col("m")).as("mx"))
        cm.join(cm.select(col("c"), (col("m") - 1).as("m"),
          col("rev").as("rev_next")), Seq("c", "m"), "left")
          .crossJoin(broadcast(maxM))
          .filter(col("m") < col("mx"))
          .select(col("m"), col("rev"),
            coalesce(col("rev_next"), lit(0).cast("decimal(18,2)"))
              .as("rn2"))
          .groupBy(col("m"))
          .agg(count(lit(1)).as("n_active"),
            sum(col("rev")).as("base"),
            sum(col("rn2")).as("nextrev"),
            sum(least(col("rn2"), col("rev"))).as("capped"))
          .select(col("m"), col("n_active"),
            round(col("base").cast("double"), 2).as("base_rev"),
            round(col("nextrev").cast("double") /
              col("base").cast("double"), 6).as("nrr"),
            round(col("capped").cast("double") /
              col("base").cast("double"), 6).as("grr"))
          .orderBy(col("m"))
      },
      oracle = Some("""
        WITH cm AS MATERIALIZED (
          SELECT o_custkey AS c,
                 CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                   AS m,
                 SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
          FROM orders GROUP BY 1, 2),
        mx AS (SELECT MAX(m) AS mx FROM cm),
        j AS (
          SELECT a.m, a.rev,
                 COALESCE(b.rev, CAST(0 AS DECIMAL(18,2))) AS rn2
          FROM cm a LEFT JOIN cm b ON b.c = a.c AND b.m = a.m + 1
          CROSS JOIN mx WHERE a.m < mx)
        SELECT m, CAST(COUNT(*) AS BIGINT) AS n_active,
               ROUND(CAST(SUM(rev) AS DOUBLE), 2) AS base_rev,
               ROUND(CAST(SUM(rn2) AS DOUBLE) / CAST(SUM(rev) AS DOUBLE), 6)
                 AS nrr,
               ROUND(CAST(SUM(LEAST(rn2, rev)) AS DOUBLE) /
                 CAST(SUM(rev) AS DOUBLE), 6) AS grr
        FROM j GROUP BY m ORDER BY m""")),

    // Signal cleaning over the 1997 daily-revenue series: Savitzky-Golay
    // quadratic window-5 smoothing (the published integer kernel
    // (-3,12,17,12,-3)/35 — preserves local quadratic structure where a
    // moving average flattens it) plus a Hampel rolling-median outlier
    // flag (window 7, 3·1.4826·MAD). The kernel combination and both
    // medians are EXACT DECIMAL arithmetic — the outlier comparison
    // never touches a float, so the boolean is engine-stable by
    // construction; only the /35 smoother output rides a double.
    "qg4_savgol_hampel" -> Q(
      fn = (s, dir) => {
        val w = Window.orderBy(col("day"))
        val ww = Window.orderBy(col("day")).rowsBetween(-3, 3)
        val d = t(s, dir, "orders")
          .filter(expr("year(o_orderdate) = 1997"))
          .groupBy(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) " +
            "div 86400000").as("day"))
          .agg((sum(col("o_totalprice").cast("decimal(18,2)")) /
            lit(1000000)).cast("decimal(18,8)").as("ym"))
        val win = d.select(col("day"), col("ym"),
          lag(col("ym"), 2).over(w).as("l2"),
          lag(col("ym"), 1).over(w).as("l1"),
          lead(col("ym"), 1).over(w).as("u1"),
          lead(col("ym"), 2).over(w).as("u2"),
          lag(col("ym"), 3).over(w).as("l3"),
          lead(col("ym"), 3).over(w).as("u3"),
          sort_array(collect_list(col("ym")).over(ww)).as("arr"))
          .filter(col("l3").isNotNull && col("u3").isNotNull)
        val med = win.select(col("day"), col("ym"),
          (col("l2") * -3 + col("l1") * 12 + col("ym") * 17 +
            col("u1") * 12 + col("u2") * -3).as("sgnum"),
          element_at(col("arr"), 4).as("med"), col("arr"))
        val dev = med.select(col("day"), col("ym"), col("sgnum"), col("med"),
          element_at(sort_array(transform(col("arr"),
            v => abs(v - col("med")))), 4).as("mad"))
        dev.select(col("day"),
          round(col("ym").cast("double"), 6).as("ym"),
          round(col("sgnum").cast("double") / 35, 6).as("sg_smooth"),
          when(abs(col("ym") - col("med")) >
            col("mad") * lit(4.4478).cast("decimal(5,4)"), 1)
            .otherwise(0).cast("int").as("is_outlier"))
          .orderBy(col("day"))
      },
      oracle = Some("""
        WITH d AS (
          SELECT CAST(epoch_ms(o_orderdate) // 86400000 AS BIGINT) AS day,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) / 1000000
                   AS DECIMAL(18,8)) AS ym
          FROM orders WHERE year(o_orderdate) = 1997 GROUP BY 1),
        win AS (
          SELECT day, ym,
                 LAG(ym, 2) OVER (ORDER BY day) AS l2,
                 LAG(ym, 1) OVER (ORDER BY day) AS l1,
                 LEAD(ym, 1) OVER (ORDER BY day) AS u1,
                 LEAD(ym, 2) OVER (ORDER BY day) AS u2,
                 LAG(ym, 3) OVER (ORDER BY day) AS l3,
                 LEAD(ym, 3) OVER (ORDER BY day) AS u3,
                 list_sort(list(ym) OVER (ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)) AS arr
          FROM d),
        med AS (
          SELECT day, ym,
                 ym * 17 + (l1 + u1) * 12 - (l2 + u2) * 3 AS sgnum,
                 arr[4] AS med, arr
          FROM win WHERE l3 IS NOT NULL AND u3 IS NOT NULL),
        dev AS (
          SELECT day, ym, sgnum, med,
                 list_sort(list_transform(arr, v -> abs(v - med)))[4] AS mad
          FROM med)
        SELECT day,
               ROUND(CAST(ym AS DOUBLE), 6) AS ym,
               ROUND(CAST(sgnum AS DOUBLE) / 35, 6) AS sg_smooth,
               CAST(CASE WHEN abs(ym - med) > mad * 4.4478
                 THEN 1 ELSE 0 END AS INT) AS is_outlier
        FROM dev ORDER BY day""")),

    // Steady-state Kalman local-level filter over the daily event
    // counts (known variances q=1, r=4): the Riccati gain recursion
    // K = P⁻/(P⁻+r) and level update walk the q4b grid recipe — every
    // per-step quantity is division/add/multiply of 9-snapped values
    // (magnitudes O(1..1e4), well inside the 15-digit envelope), so the
    // Spark ordered fold and the DuckDB recursive CTE produce identical
    // doubles step for step. The filter is the optimal online smoother
    // the q5i EMA card approximates with a fixed gain.
    "qg5_kalman_level" -> Q(
      fn = (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(expr("CAST(unix_millis(ts) div 86400000 AS BIGINT)")
            .as("day"))
          .agg(count(lit(1)).as("y"))
        daily.agg(array_sort(collect_list(struct(col("day"), col("y"))))
          .as("a"))
          .select(expr("""
            aggregate(
              slice(a, 2, size(a) - 1),
              named_struct(
                'x', round(CAST(a[0].y AS DOUBLE), 9),
                'p', CAST(4 AS DOUBLE),
                'out', array(named_struct(
                  'day', a[0].day, 'y', a[0].y,
                  'lvl', round(CAST(a[0].y AS DOUBLE), 9),
                  'k', CAST(0 AS DOUBLE)))),
              (acc, v) -> named_struct(
                'x', round(acc.x + round((acc.p + 1) / (acc.p + 5), 9) *
                  (v.y - acc.x), 9),
                'p', round((1 - round((acc.p + 1) / (acc.p + 5), 9)) *
                  (acc.p + 1), 9),
                'out', array_append(acc.out, named_struct(
                  'day', v.day, 'y', v.y,
                  'lvl', round(acc.x + round((acc.p + 1) / (acc.p + 5), 9) *
                    (v.y - acc.x), 9),
                  'k', round((acc.p + 1) / (acc.p + 5), 9)))),
              acc -> acc.out) AS kal"""))
          .select(explode(col("kal")).as("r"))
          .select(col("r.day").as("day"), col("r.y").as("y"),
            round(col("r.lvl"), 6).as("level"),
            round(col("r.k"), 6).as("gain"))
          .orderBy(col("day"))
      },
      oracle = Some("""
        WITH RECURSIVE d AS MATERIALIZED (
          SELECT day, y, CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT)
                   AS rn
          FROM (SELECT CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
                       CAST(COUNT(*) AS BIGINT) AS y
                FROM events GROUP BY 1)),
        kal AS (
          SELECT rn, day, y, ROUND(CAST(y AS DOUBLE), 9) AS x,
                 CAST(4 AS DOUBLE) AS p, CAST(0 AS DOUBLE) AS k
          FROM d WHERE rn = 1
          UNION ALL
          SELECT d.rn, d.day, d.y,
                 ROUND(k.x + ROUND((k.p + 1) / (k.p + 5), 9) *
                   (d.y - k.x), 9),
                 ROUND((1 - ROUND((k.p + 1) / (k.p + 5), 9)) *
                   (k.p + 1), 9),
                 ROUND((k.p + 1) / (k.p + 5), 9)
          FROM kal k JOIN d ON d.rn = k.rn + 1)
        SELECT day, y, ROUND(x, 6) AS level, ROUND(k, 6) AS gain
        FROM kal ORDER BY day""")),

    // OLS trend of daily revenue with Newey-West HAC (lag-5 Bartlett)
    // standard errors — the serial-correlation-robust inference the
    // qc0/qcw diagnostics call for when Durbin-Watson rejects. Centered
    // regressors keep every moment exact (x̃² is an exact quarter-integer
    // DECIMAL sum); residual cross-products are scaled to O(1) before
    // the 9-grid snap so no term exceeds the 15-digit envelope; lag
    // covariances come from a bounded rn-offset self-join, Bartlett
    // weights fold in exact integer arithmetic ((6-l)·Γ_l summed in
    // DECIMAL, one /6 at the end).
    "qg6_newey_west" -> Q(
      fn = (s, dir) => {
        val w = Window.orderBy(col("day"))
        val d0 = dailyRevenueM(s, dir)
          .select(col("day"), col("ym"), row_number().over(w).as("rn"))
          .localCheckpoint(eager = false)
        val n0 = d0.agg(count(lit(1)).as("n"),
          sum(col("ym")).as("sy"))
        val cent = d0.crossJoin(broadcast(n0))
          .select(col("rn"), col("n"),
            (col("rn").cast("double") -
              (col("n") + 1).cast("double") / 2).as("xt"),
            (col("ym").cast("double") -
              col("sy").cast("double") / col("n").cast("double")).as("yc"))
          .localCheckpoint(eager = false)
        val mom = cent.agg(
          sum(round(col("xt") * col("xt"), 2).cast("decimal(20,2)"))
            .as("sxx"),
          sum(g9(col("xt") * col("yc") / 1000)).as("sxy"))
        val u = cent.crossJoin(broadcast(mom.select(
          (col("sxy").cast("double") * 1000 / col("sxx").cast("double"))
            .as("b"))))
          .select(col("rn"),
            ((col("yc") - col("b") * col("xt")) * col("xt") / 1000).as("u"),
            (col("yc") - col("b") * col("xt")).as("e"))
          .localCheckpoint(eager = false)
        val g0 = u.agg(sum(g9(col("u") * col("u"))).as("g0"),
          sum(g9(col("e") * col("e"))).as("see"), count(lit(1)).as("n"))
        val gl = u.select(col("rn"), col("u"))
          .join(u.select(explode(sequence(lit(1), lit(5))).as("l"),
            (col("rn") + col("l")).as("rn"), col("u").as("ul")),
            Seq("rn"))
          .groupBy(col("l")).agg(sum(g9(col("u") * col("ul"))).as("gll"))
          .agg(sum(col("gll") * (lit(6) - col("l"))).as("wsum"))
        g0.crossJoin(broadcast(gl)).crossJoin(broadcast(mom))
          .select(col("n"),
            col("sxy").cast("double").multiply(1000)
              .divide(col("sxx").cast("double")).as("b"),
            (col("g0").cast("double") +
              lit(2.0) * col("wsum").cast("double") / 6).as("om"),
            col("sxx").cast("double").as("sxx"),
            col("see").cast("double").as("see"))
          .select(col("n").as("n_days"),
            (round(col("b"), 8) + lit(0.0)).as("slope_m_per_day"),
            round(sqrt(col("see") / (col("n") - 2) / col("sxx")), 8)
              .as("se_iid"),
            round(sqrt(col("om") * 1000000) / col("sxx"), 8).as("se_hac"),
            (round(col("b") / (sqrt(col("om") * 1000000) / col("sxx")), 4)
              + lit(0.0)).as("t_hac"),
            round(sqrt(col("om") * 1000000) / col("sxx") /
              sqrt(col("see") / (col("n") - 2) / col("sxx")), 6)
              .as("hac_iid_ratio"))
      },
      oracle = Some(s"""
        WITH dd AS ($dailyRevenueMSql),
        d0 AS MATERIALIZED (
          SELECT day, ym, CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT)
                   AS rn
          FROM dd),
        n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(ym) AS sy FROM d0),
        cent AS MATERIALIZED (
          SELECT rn, n,
                 CAST(rn AS DOUBLE) - CAST(n + 1 AS DOUBLE) / 2 AS xt,
                 CAST(ym AS DOUBLE) - CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)
                   AS yc
          FROM d0 CROSS JOIN n0),
        mom AS (
          SELECT SUM(CAST(ROUND(xt * xt, 2) AS DECIMAL(20,2))) AS sxx,
                 SUM(CAST(ROUND(xt * yc / 1000, 9) AS DECIMAL(20,9)))
                   AS sxy
          FROM cent),
        u AS MATERIALIZED (
          SELECT rn,
                 (yc - b * xt) * xt / 1000 AS u,
                 yc - b * xt AS e
          FROM cent CROSS JOIN
            (SELECT CAST(sxy AS DOUBLE) * 1000 / CAST(sxx AS DOUBLE) AS b
             FROM mom)),
        g0 AS (
          SELECT SUM(CAST(ROUND(u * u, 9) AS DECIMAL(20,9))) AS g0,
                 SUM(CAST(ROUND(e * e, 9) AS DECIMAL(20,9))) AS see,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM u),
        gl AS (
          SELECT SUM(gll * (6 - l)) AS wsum
          FROM (
            SELECT l.l,
                   SUM(CAST(ROUND(a.u * b.u, 9) AS DECIMAL(20,9))) AS gll
            FROM range(1, 6) AS l(l)
            JOIN u a ON TRUE
            JOIN u b ON b.rn + l.l = a.rn
            GROUP BY 1)),
        fin AS (
          SELECT n,
                 CAST(sxy AS DOUBLE) * 1000 / CAST(sxx AS DOUBLE) AS b,
                 CAST(g0 AS DOUBLE) + CAST(2 AS DOUBLE) *
                   CAST(wsum AS DOUBLE) / 6 AS om,
                 CAST(sxx AS DOUBLE) AS sxx,
                 CAST(see AS DOUBLE) AS see
          FROM g0 CROSS JOIN gl CROSS JOIN mom)
        SELECT n AS n_days,
               ROUND(b, 8) + CAST(0 AS DOUBLE) AS slope_m_per_day,
               ROUND(sqrt(see / (n - 2) / sxx), 8) AS se_iid,
               ROUND(sqrt(om * 1000000) / sxx, 8) AS se_hac,
               ROUND(b / (sqrt(om * 1000000) / sxx), 4)
                 + CAST(0 AS DOUBLE) AS t_hac,
               ROUND(sqrt(om * 1000000) / sxx /
                 sqrt(see / (n - 2) / sxx), 6) AS hac_iid_ratio
        FROM fin""")),

    // Chain-ladder development of the order-cohort run-off triangle
    // (cohort = order month, development age = ship-lag in months
    // capped at 4): volume-weighted link ratios f_j over the cohorts
    // that have both ages observed, cumulative development-to-ultimate
    // factors as a 9-grid product chain (4 unrolled steps — rule-15
    // safe), and per-cohort ultimates + IBNR-style reserve — the
    // classic actuarial projection, driven here by shipping lag. The
    // triangle grid is densified (cohort × age 0..4, zero-filled) so
    // cumulative sums and link-ratio denominators are well-defined
    // even for sparse cohort-age cells at small SF.
    "qg7_chain_ladder" -> Q(
      fn = (s, dir) => {
        val cw = Window.partitionBy(col("i")).orderBy(col("j"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val cell = t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .groupBy(
            expr("CAST(year(o_orderdate) * 12 + month(o_orderdate) " +
              "AS BIGINT)").as("i"),
            least(greatest(
              expr("CAST(year(l_shipdate) * 12 + month(l_shipdate) - " +
                "year(o_orderdate) * 12 - month(o_orderdate) AS BIGINT)"),
              lit(0L)), lit(4L)).as("j"))
          .agg((sum(col("l_extendedprice").cast("decimal(18,2)")) /
            lit(1000000)).cast("decimal(18,8)").as("inc"))
        val grid = cell.select(col("i")).distinct()
          .crossJoin(broadcast(s.range(0, 5).select(col("id").as("j"))))
          .join(cell, Seq("i", "j"), "left")
          .select(col("i"), col("j"),
            coalesce(col("inc"), lit(0).cast("decimal(18,8)")).as("inc"))
        val cum = grid.select(col("i"), col("j"),
          sum(col("inc")).over(cw).as("c"))
          .localCheckpoint(eager = false)
        val latest = cum.agg(max(col("i")).as("mx"))
        val fx = cum.select(col("i"), col("j"), col("c"))
          .join(cum.select(col("i"), (col("j") - 1).as("j"),
            col("c").as("cn")), Seq("i", "j"))
          .crossJoin(broadcast(latest))
          .filter(col("i") + col("j") + 1 <= col("mx"))
          .groupBy(col("j"))
          .agg(sum(col("cn")).as("num"), sum(col("c")).as("den"))
          .agg(
            sum(when(col("j") === 0, round(col("num").cast("double") /
              col("den").cast("double"), 9))).as("f0"),
            sum(when(col("j") === 1, round(col("num").cast("double") /
              col("den").cast("double"), 9))).as("f1"),
            sum(when(col("j") === 2, round(col("num").cast("double") /
              col("den").cast("double"), 9))).as("f2"),
            sum(when(col("j") === 3, round(col("num").cast("double") /
              col("den").cast("double"), 9))).as("f3"))
          .select(
            lit(1.0).as("g4"), col("f3").as("g3"),
            round(col("f3") * col("f2"), 9).as("g2"),
            round(col("f3") * round(col("f2") * col("f1"), 9), 9).as("g1"),
            round(col("f3") * round(col("f2") * round(col("f1") *
              col("f0"), 9), 9), 9).as("g0"))
        cum.crossJoin(broadcast(latest))
          .filter(col("j") === least(lit(4L), col("mx") - col("i")))
          .crossJoin(broadcast(fx))
          .select(col("i").as("cohort_m"), col("j").as("dev_age"),
            round(col("c").cast("double"), 6).as("paid_m"),
            round(col("c").cast("double") *
              when(col("j") === 4, col("g4"))
                .when(col("j") === 3, col("g3"))
                .when(col("j") === 2, col("g2"))
                .when(col("j") === 1, col("g1"))
                .otherwise(col("g0")), 6).as("ultimate_m"),
            (round(col("c").cast("double") *
              (when(col("j") === 4, col("g4"))
                .when(col("j") === 3, col("g3"))
                .when(col("j") === 2, col("g2"))
                .when(col("j") === 1, col("g1"))
                .otherwise(col("g0")) - 1), 6) + lit(0.0)).as("reserve_m"))
          .orderBy(col("cohort_m"))
      },
      oracle = Some("""
        WITH cell AS MATERIALIZED (
          SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
                   AS i,
                 LEAST(GREATEST(CAST(year(l_shipdate) * 12 +
                   month(l_shipdate) - year(o_orderdate) * 12 -
                   month(o_orderdate) AS BIGINT), 0), 4) AS j,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) / 1000000
                   AS DECIMAL(18,8)) AS inc
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          GROUP BY 1, 2),
        grid AS (
          SELECT i, CAST(j AS BIGINT) AS j,
                 COALESCE(inc, CAST(0 AS DECIMAL(18,8))) AS inc
          FROM (SELECT DISTINCT i FROM cell) CROSS JOIN range(0, 5) r(j)
          LEFT JOIN cell USING (i, j)),
        cum AS MATERIALIZED (
          SELECT i, j,
                 SUM(inc) OVER (PARTITION BY i ORDER BY j
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS c
          FROM grid),
        latest AS (SELECT MAX(i) AS mx FROM cum),
        lr AS (
          SELECT a.j, SUM(b.c) AS num, SUM(a.c) AS den
          FROM cum a JOIN cum b ON b.i = a.i AND b.j = a.j + 1
          CROSS JOIN latest
          WHERE a.i + a.j + 1 <= mx
          GROUP BY 1),
        fr AS (
          SELECT SUM(CASE WHEN j = 0 THEN ROUND(CAST(num AS DOUBLE) /
                   CAST(den AS DOUBLE), 9) END) AS f0,
                 SUM(CASE WHEN j = 1 THEN ROUND(CAST(num AS DOUBLE) /
                   CAST(den AS DOUBLE), 9) END) AS f1,
                 SUM(CASE WHEN j = 2 THEN ROUND(CAST(num AS DOUBLE) /
                   CAST(den AS DOUBLE), 9) END) AS f2,
                 SUM(CASE WHEN j = 3 THEN ROUND(CAST(num AS DOUBLE) /
                   CAST(den AS DOUBLE), 9) END) AS f3
          FROM lr),
        fx AS (
          SELECT CAST(1 AS DOUBLE) AS g4, f3 AS g3,
                 ROUND(f3 * f2, 9) AS g2,
                 ROUND(f3 * ROUND(f2 * f1, 9), 9) AS g1,
                 ROUND(f3 * ROUND(f2 * ROUND(f1 * f0, 9), 9), 9) AS g0
          FROM fr)
        SELECT i AS cohort_m, j AS dev_age,
               ROUND(CAST(c AS DOUBLE), 6) AS paid_m,
               ROUND(CAST(c AS DOUBLE) *
                 (CASE WHEN j = 4 THEN g4 WHEN j = 3 THEN g3
                       WHEN j = 2 THEN g2 WHEN j = 1 THEN g1
                       ELSE g0 END), 6) AS ultimate_m,
               ROUND(CAST(c AS DOUBLE) *
                 ((CASE WHEN j = 4 THEN g4 WHEN j = 3 THEN g3
                        WHEN j = 2 THEN g2 WHEN j = 1 THEN g1
                        ELSE g0 END) - 1), 6) + CAST(0 AS DOUBLE)
                 AS reserve_m
        FROM cum CROSS JOIN latest CROSS JOIN fx
        WHERE j = LEAST(4, mx - i)
        ORDER BY cohort_m""")),

    // Bühlmann-Straub credibility premiums per nation over per-order
    // values (in exact millions): within-variance s² from per-nation
    // raw moments, between-variance â from the size-weighted mean
    // spread with the (I−1)s² bias correction, credibility weight
    // Z_i = m_i/(m_i + s²/â), and the blended premium — the actuarial
    // shrinkage counterpart of qcb's James-Stein and qez's
    // beta-binomial, for continuous severities with unequal exposure.
    // Moment sums ride the 9-grid DECIMAL recipe; the â>0 guard
    // compares engine-identical doubles so the degenerate branch is
    // stable.
    "qg8_buhlmann_credibility" -> Q(
      fn = (s, dir) => {
        val x = t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .select(col("c_nationkey").as("n"),
            (col("o_totalprice").cast("decimal(18,2)") / lit(1000000))
              .cast("decimal(18,8)").as("x"))
        val nat = x.groupBy(col("n"))
          .agg(count(lit(1)).as("m"), sum(col("x")).as("sx"),
            sum(round(col("x") * col("x"), 9)).as("sxx"))
          .localCheckpoint(eager = false)
        val glob = nat.agg(
          count(lit(1)).as("i_cnt"), sum(col("m")).as("mm"),
          sum(col("sx")).as("tsx"),
          sum(col("m") * col("m")).as("smm"),
          sum(g9(col("sxx").cast("double") -
            col("sx").cast("double") * col("sx").cast("double") /
              col("m").cast("double"))).as("sw"),
          sum(col("m") - 1).as("dfw"))
        val params = nat.crossJoin(broadcast(glob))
          .select(col("n"), col("m"), col("sx"), col("i_cnt"), col("mm"),
            col("tsx"), col("smm"), col("sw"), col("dfw"),
            (col("tsx").cast("double") / col("mm").cast("double"))
              .as("gmean"),
            (col("sw").cast("double") / col("dfw").cast("double"))
              .as("s2"))
        val btw = params
          .select(col("n"), col("m"), col("sx"), col("gmean"), col("s2"),
            col("i_cnt"), col("mm"), col("smm"),
            g9(col("m").cast("double") *
              (col("sx").cast("double") / col("m").cast("double") -
                col("gmean")) *
              (col("sx").cast("double") / col("m").cast("double") -
                col("gmean"))).as("bt"))
        val a = btw.groupBy(col("gmean"), col("s2"), col("i_cnt"),
          col("mm"), col("smm"))
          .agg(sum(col("bt")).as("sbt"))
          .select(col("gmean"), col("s2"),
            ((col("sbt").cast("double") -
              (col("i_cnt") - 1).cast("double") * col("s2")) /
              (col("mm").cast("double") -
                col("smm").cast("double") / col("mm").cast("double")))
              .as("a"))
        btw.select(col("n"), col("m"), col("sx"))
          .crossJoin(broadcast(a))
          .select(col("n"), col("m").as("n_orders"),
            round(col("sx").cast("double") / col("m").cast("double"), 6)
              .as("xbar_m"),
            round(when(col("a") > 0,
              col("m").cast("double") /
                (col("m").cast("double") + col("s2") / col("a")))
              .otherwise(lit(0.0)), 6).as("z"),
            round(when(col("a") > 0,
              (col("m").cast("double") /
                (col("m").cast("double") + col("s2") / col("a"))) *
                (col("sx").cast("double") / col("m").cast("double")) +
                (lit(1.0) - col("m").cast("double") /
                  (col("m").cast("double") + col("s2") / col("a"))) *
                  col("gmean"))
              .otherwise(col("gmean")), 6).as("premium_m"))
          .orderBy(col("n"))
      },
      oracle = Some("""
        WITH x AS (
          SELECT c_nationkey AS n,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) / 1000000
                   AS DECIMAL(18,8)) AS x
          FROM orders JOIN customer ON o_custkey = c_custkey),
        nat AS MATERIALIZED (
          SELECT n, CAST(COUNT(*) AS BIGINT) AS m, SUM(x) AS sx,
                 SUM(ROUND(CAST(x AS DECIMAL(19,8)) *
                   CAST(x AS DECIMAL(19,8)), 9)) AS sxx
          FROM x GROUP BY 1),
        gparams AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS i_cnt,
                 CAST(SUM(m) AS BIGINT) AS mm,
                 SUM(sx) AS tsx,
                 CAST(SUM(m * m) AS BIGINT) AS smm,
                 SUM(CAST(ROUND(CAST(sxx AS DOUBLE) -
                   CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE) /
                   CAST(m AS DOUBLE), 9) AS DECIMAL(20,9))) AS sw,
                 CAST(SUM(m - 1) AS BIGINT) AS dfw
          FROM nat),
        params AS MATERIALIZED (
          SELECT n, m, sx, i_cnt, mm, smm,
                 CAST(tsx AS DOUBLE) / CAST(mm AS DOUBLE) AS gmean,
                 CAST(sw AS DOUBLE) / CAST(dfw AS DOUBLE) AS s2,
                 CAST(ROUND(CAST(m AS DOUBLE) *
                   (CAST(sx AS DOUBLE) / CAST(m AS DOUBLE) -
                    CAST(tsx AS DOUBLE) / CAST(mm AS DOUBLE)) *
                   (CAST(sx AS DOUBLE) / CAST(m AS DOUBLE) -
                    CAST(tsx AS DOUBLE) / CAST(mm AS DOUBLE)), 9)
                   AS DECIMAL(20,9)) AS bt
          FROM nat CROSS JOIN gparams),
        av AS (
          SELECT MAX(gmean) AS gmean, MAX(s2) AS s2,
                 (CAST(SUM(bt) AS DOUBLE) -
                  CAST(MAX(i_cnt) - 1 AS DOUBLE) * MAX(s2)) /
                 (CAST(MAX(mm) AS DOUBLE) -
                  CAST(MAX(smm) AS DOUBLE) / CAST(MAX(mm) AS DOUBLE)) AS a
          FROM params)
        SELECT n, m AS n_orders,
               ROUND(CAST(sx AS DOUBLE) / CAST(m AS DOUBLE), 6) AS xbar_m,
               ROUND(CASE WHEN av.a > 0 THEN CAST(m AS DOUBLE) /
                 (CAST(m AS DOUBLE) + av.s2 / av.a)
                 ELSE CAST(0 AS DOUBLE) END, 6) AS z,
               ROUND(CASE WHEN av.a > 0 THEN
                 (CAST(m AS DOUBLE) / (CAST(m AS DOUBLE) + av.s2 / av.a)) *
                 (CAST(sx AS DOUBLE) / CAST(m AS DOUBLE)) +
                 (1 - CAST(m AS DOUBLE) /
                  (CAST(m AS DOUBLE) + av.s2 / av.a)) * av.gmean
                 ELSE av.gmean END, 6) AS premium_m
        FROM params CROSS JOIN av ORDER BY n""")),

    // LOWESS-style local linear smoother over the 1997 daily-revenue
    // series: tricube weights (1-u³)³ on a ±14-day window (u = day
    // distance / 15 is an exact rational, so both engines walk the
    // same doubles), weighted least squares solved in closed form per
    // target day. Targets are every 7th observed day; neighbors attach
    // through an exploded day-offset EQUALITY join (the q4u interval
    // recipe) — never a cross join — so the plan stays linear in the
    // series length at any scale.
    "qg9_lowess" -> Q(
      fn = (s, dir) => {
        val w = Window.orderBy(col("day"))
        val d = t(s, dir, "orders")
          .filter(expr("year(o_orderdate) = 1997"))
          .groupBy(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) " +
            "div 86400000").as("day"))
          .agg((sum(col("o_totalprice").cast("decimal(18,2)")) /
            lit(1000000)).cast("decimal(18,8)").as("ym"))
          .localCheckpoint(eager = false)
        val targets = d.select(col("day"), col("ym"),
          row_number().over(w).as("rn"))
          .filter(col("rn") % 7 === 0)
        val cand = targets.select(col("day").as("t_day"),
          col("ym").as("t_ym"),
          explode(sequence(lit(-14L), lit(14L))).as("off"))
          .select(col("t_day"), col("t_ym"),
            (col("t_day") + col("off")).as("day"))
          .join(d, Seq("day"))
        val fit = cand
          .select(col("t_day"), col("t_ym"),
            (col("day") - col("t_day")).cast("double").as("xt"),
            col("ym").cast("double").as("y"),
            (abs(col("day") - col("t_day")).cast("double") / 15).as("u"))
          // tricube via explicit products — libm pow() is NOT
          // last-ulp-identical across engines, x*x*x is (IEEE)
          .select(col("t_day"), col("t_ym"), col("xt"), col("y"),
            (lit(1.0) - col("u") * col("u") * col("u")).as("v"))
          .select(col("t_day"), col("t_ym"), col("xt"), col("y"),
            (col("v") * col("v") * col("v")).as("wt"))
          .select(col("t_day"), col("t_ym"), g9(col("wt")).as("sw"),
            g9(col("wt") * col("xt")).as("sx"),
            g9(col("wt") * col("xt") * col("xt")).as("sxx"),
            g9(col("wt") * col("y")).as("sy"),
            g9(col("wt") * col("xt") * col("y")).as("sxy"))
          .groupBy(col("t_day"), col("t_ym"))
          .agg(sum(col("sw")).as("sw"), sum(col("sx")).as("sx"),
            sum(col("sxx")).as("sxx"), sum(col("sy")).as("sy"),
            sum(col("sxy")).as("sxy"))
        fit.select(col("t_day").as("day"),
          round(col("t_ym").cast("double"), 6).as("ym"),
          round((col("sxx").cast("double") * col("sy").cast("double") -
            col("sx").cast("double") * col("sxy").cast("double")) /
            (col("sw").cast("double") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")), 6)
            .as("lowess"))
          .orderBy(col("day"))
      },
      oracle = Some("""
        WITH d AS MATERIALIZED (
          SELECT CAST(epoch_ms(o_orderdate) // 86400000 AS BIGINT) AS day,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) / 1000000
                   AS DECIMAL(18,8)) AS ym
          FROM orders WHERE year(o_orderdate) = 1997 GROUP BY 1),
        targets AS (
          SELECT day AS t_day, ym AS t_ym
          FROM (SELECT day, ym, ROW_NUMBER() OVER (ORDER BY day) AS rn
                FROM d)
          WHERE rn % 7 = 0),
        cand AS (
          SELECT t_day, t_ym, xt, y, v * v * v AS wt
          FROM (
            SELECT t_day, t_ym, xt, y, 1 - u * u * u AS v
            FROM (
              SELECT t.t_day, t.t_ym,
                     CAST(d.day - t.t_day AS DOUBLE) AS xt,
                     CAST(d.ym AS DOUBLE) AS y,
                     CAST(abs(d.day - t.t_day) AS DOUBLE) / 15 AS u
              FROM targets t
              CROSS JOIN range(-14, 15) o(off)
              JOIN d ON d.day = t.t_day + o.off))),
        fit AS (
          SELECT t_day, t_ym,
                 SUM(CAST(ROUND(wt, 9) AS DECIMAL(20,9))) AS sw,
                 SUM(CAST(ROUND(wt * xt, 9) AS DECIMAL(20,9))) AS sx,
                 SUM(CAST(ROUND(wt * xt * xt, 9) AS DECIMAL(20,9))) AS sxx,
                 SUM(CAST(ROUND(wt * y, 9) AS DECIMAL(20,9))) AS sy,
                 SUM(CAST(ROUND(wt * xt * y, 9) AS DECIMAL(20,9))) AS sxy
          FROM cand GROUP BY 1, 2)
        SELECT t_day AS day,
               ROUND(CAST(t_ym AS DOUBLE), 6) AS ym,
               ROUND((CAST(sxx AS DOUBLE) * CAST(sy AS DOUBLE) -
                 CAST(sx AS DOUBLE) * CAST(sxy AS DOUBLE)) /
                 (CAST(sw AS DOUBLE) * CAST(sxx AS DOUBLE) -
                  CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS lowess
        FROM fit ORDER BY day""")),

    // Matrix profile (window 7, exclusion zone ±3) over the 30-day
    // event-count series: z-normalized nearest-neighbor distance per
    // subsequence — the motif/discord primitive behind modern
    // time-series mining, complementing qa9's DTW with the
    // subsequence-self-similarity view. Dot products between
    // subsequences are EXACT integers (join on the in-window offset,
    // never a per-pair array carry); σ²>0 guards are exact-integer
    // comparisons; the argmin rides a (rounded-distance, index) struct
    // so ties break identically in both engines.
    "qga_matrix_profile" -> Q(
      fn = (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy(expr("CAST(unix_millis(ts) div 86400000 AS BIGINT)")
            .as("day"))
          .agg(count(lit(1)).as("y"))
        val w = Window.orderBy(col("day"))
        val idx = daily.select(col("day"), col("y"),
          row_number().over(w).cast("long").as("rn"))
          .localCheckpoint(eager = false)
        // subsequence membership: (start i, offset k 0..6, value)
        val sub = idx.select(explode(sequence(lit(0L), lit(6L))).as("k"),
          (col("rn") - col("k")).as("i"), col("y"), col("day"))
          .filter(col("i") >= 1)
        val stats = sub.groupBy(col("i"))
          .agg(count(lit(1)).as("m"), sum(col("y")).as("sy"),
            sum(col("y") * col("y")).as("syy"),
            min(when(col("k") === 0, col("day"))).as("day0"))
          .filter(col("m") === 7 &&
            col("syy") * 7 > col("sy") * col("sy"))
          .localCheckpoint(eager = false)
        val dots = sub.select(col("i"), col("k"), col("y"))
          .join(sub.select(col("i").as("j"), col("k"), col("y").as("yj")),
            Seq("k"))
          .filter(abs(col("i") - col("j")) > 3)
          .groupBy(col("i"), col("j"))
          .agg(count(lit(1)).as("mk"), sum(col("y") * col("yj")).as("dot"))
          .filter(col("mk") === 7)
        val dist = dots
          .join(stats.select(col("i"), col("sy").as("syi"),
            col("syy").as("syyi"), col("day0")), Seq("i"))
          .join(stats.select(col("i").as("j"), col("sy").as("syj"),
            col("syy").as("syyj")), Seq("j"))
          .select(col("i"), col("j"), col("day0"),
            round(sqrt(greatest(lit(0.0),
              lit(14.0) * (lit(1.0) -
                (lit(7.0) * col("dot").cast("double") -
                  col("syi").cast("double") * col("syj").cast("double")) /
                  (sqrt(lit(7.0) * col("syyi").cast("double") -
                    col("syi").cast("double") * col("syi").cast("double")) *
                    sqrt(lit(7.0) * col("syyj").cast("double") -
                      col("syj").cast("double") *
                        col("syj").cast("double")))))), 9).as("d9"))
        dist.groupBy(col("i"), col("day0"))
          .agg(min(struct(col("d9"), col("j"))).as("nn"))
          .select(col("i").as("start_idx"), col("day0").as("start_day"),
            col("nn.j").as("nn_idx"),
            round(col("nn.d9"), 6).as("mp_dist"))
          .orderBy(col("start_idx"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
                 CAST(COUNT(*) AS BIGINT) AS y
          FROM events GROUP BY 1),
        idx AS (
          SELECT day, y, CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT)
                   AS rn
          FROM daily),
        sub AS MATERIALIZED (
          SELECT rn - k.k AS i, k.k AS k, y, day
          FROM idx CROSS JOIN range(0, 7) k(k)
          WHERE rn - k.k >= 1),
        stats AS MATERIALIZED (
          SELECT i, CAST(COUNT(*) AS BIGINT) AS m,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(y * y) AS BIGINT) AS syy,
                 MIN(CASE WHEN k = 0 THEN day END) AS day0
          FROM sub GROUP BY 1
          HAVING COUNT(*) = 7 AND SUM(y * y) * 7 > SUM(y) * SUM(y)),
        dots AS (
          SELECT a.i, b.i AS j, CAST(COUNT(*) AS BIGINT) AS mk,
                 CAST(SUM(a.y * b.y) AS BIGINT) AS dot
          FROM sub a JOIN sub b ON a.k = b.k AND abs(a.i - b.i) > 3
          GROUP BY 1, 2 HAVING COUNT(*) = 7),
        dist AS (
          SELECT d.i, d.j, sa.day0,
                 ROUND(sqrt(GREATEST(CAST(0 AS DOUBLE),
                   CAST(14 AS DOUBLE) * (1 -
                     (CAST(7 AS DOUBLE) * CAST(dot AS DOUBLE) -
                      CAST(sa.sy AS DOUBLE) * CAST(sb.sy AS DOUBLE)) /
                     (sqrt(CAST(7 AS DOUBLE) * CAST(sa.syy AS DOUBLE) -
                        CAST(sa.sy AS DOUBLE) * CAST(sa.sy AS DOUBLE)) *
                      sqrt(CAST(7 AS DOUBLE) * CAST(sb.syy AS DOUBLE) -
                        CAST(sb.sy AS DOUBLE) * CAST(sb.sy AS DOUBLE)))))),
                   9) AS d9
          FROM dots d
          JOIN stats sa ON sa.i = d.i
          JOIN stats sb ON sb.i = d.j)
        SELECT i AS start_idx, day0 AS start_day,
               MIN({'d': d9, 'j': j})['j'] AS nn_idx,
               ROUND(MIN({'d': d9, 'j': j})['d'], 6) AS mp_dist
        FROM dist GROUP BY 1, 2 ORDER BY start_idx"""),
      headline = true),

    // Discrete transfer entropy between the view and purchase daily
    // up/down series: TE(X→Y) = Σ p(y_t,y_{t-1},x_{t-1}) ·
    // ln[p(y_t|y_{t-1},x_{t-1}) / p(y_t|y_{t-1})], both directions plus
    // the net flow — the directed-information upgrade of qc0's Granger
    // card (model-free, catches sign-flip coupling a linear F-test
    // misses). Everything is exact integer counts into ONE ln of an
    // integer-product ratio (all products ≪ 2^53), so the plug-in
    // estimate replays exactly.
    "qgb_transfer_entropy" -> Q(
      fn = (s, dir) => {
        val w = Window.orderBy(col("day"))
        val d = t(s, dir, "events")
          .groupBy(expr("CAST(unix_millis(ts) div 86400000 AS BIGINT)")
            .as("day"))
          .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("xv"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("yv"))
        val bin = d.select(col("day"),
          when(col("xv") > lag(col("xv"), 1).over(w), 1L).otherwise(0L)
            .as("bx"),
          when(col("yv") > lag(col("yv"), 1).over(w), 1L).otherwise(0L)
            .as("by"),
          lag(col("xv"), 1).over(w).as("px"))
          .filter(col("px").isNotNull)
        val tr = bin.select(col("day"), col("bx"), col("by"),
          lag(col("bx"), 1).over(w).as("x0"),
          lag(col("by"), 1).over(w).as("y0"))
          .filter(col("x0").isNotNull)
          .localCheckpoint(eager = false)
        def te(tgt: String, tgt0: String, src0: String): DataFrame = {
          val trip = tr.select(col(tgt).as("y1"), col(tgt0).as("y0"),
            col(src0).as("x0"))
          val a = trip.groupBy(col("y1"), col("y0"), col("x0"))
            .agg(count(lit(1)).as("nyyx"))
          val nyx = trip.groupBy(col("y0"), col("x0"))
            .agg(count(lit(1)).as("nyx"))
          val nyy = trip.groupBy(col("y1"), col("y0"))
            .agg(count(lit(1)).as("nyy"))
          val ny = trip.groupBy(col("y0")).agg(count(lit(1)).as("ny"))
          val nn = trip.agg(count(lit(1)).as("nn"))
          a.join(nyx, Seq("y0", "x0")).join(nyy, Seq("y1", "y0"))
            .join(ny, Seq("y0")).crossJoin(broadcast(nn))
            .select(g9((col("nyyx").cast("double") /
              col("nn").cast("double")) *
              log((col("nyyx") * col("ny")).cast("double") /
                (col("nyx") * col("nyy")).cast("double"))).as("term"),
              col("nn"))
            .groupBy(col("nn")).agg(sum(col("term")).as("te"))
        }
        val xy = te("by", "y0", "x0")
          .select(col("nn").as("n_triples"), col("te").as("te_xy"))
        val yx = te("bx", "x0", "y0").select(col("te").as("te_yx"))
        xy.crossJoin(broadcast(yx))
          .select(col("n_triples"),
            round(col("te_xy").cast("double"), 6).as("te_view_to_purchase"),
            round(col("te_yx").cast("double"), 6).as("te_purchase_to_view"),
            (round(col("te_xy").cast("double") -
              col("te_yx").cast("double"), 6) + lit(0.0)).as("net_flow"))
      },
      oracle = Some("""
        WITH d AS (
          SELECT CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
                 CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                   AS BIGINT) AS xv,
                 CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1
                   ELSE 0 END) AS BIGINT) AS yv
          FROM events GROUP BY 1),
        bin AS (
          SELECT day,
                 CASE WHEN xv > LAG(xv, 1) OVER (ORDER BY day) THEN 1
                   ELSE 0 END AS bx,
                 CASE WHEN yv > LAG(yv, 1) OVER (ORDER BY day) THEN 1
                   ELSE 0 END AS by,
                 LAG(xv, 1) OVER (ORDER BY day) AS px
          FROM d QUALIFY px IS NOT NULL),
        tr AS MATERIALIZED (
          SELECT day, bx, by,
                 LAG(bx, 1) OVER (ORDER BY day) AS x0,
                 LAG(by, 1) OVER (ORDER BY day) AS y0
          FROM bin QUALIFY x0 IS NOT NULL),
        txy AS (
          SELECT MAX(nn) AS nn, SUM(term) AS te
          FROM (
            SELECT a.nn,
                   CAST(ROUND((CAST(nyyx AS DOUBLE) / CAST(nn AS DOUBLE)) *
                     ln(CAST(nyyx * ny AS DOUBLE) /
                        CAST(nyx * nyy AS DOUBLE)), 9) AS DECIMAL(20,9))
                     AS term
            FROM (
              SELECT y1, y0, x0, CAST(COUNT(*) AS BIGINT) AS nyyx,
                     CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS nn
              FROM (SELECT by AS y1, y0, x0 FROM tr) GROUP BY 1, 2, 3) a
            JOIN (SELECT y0, x0, CAST(COUNT(*) AS BIGINT) AS nyx
                  FROM (SELECT y0, x0 FROM tr) GROUP BY 1, 2) b
              USING (y0, x0)
            JOIN (SELECT y1, y0, CAST(COUNT(*) AS BIGINT) AS nyy
                  FROM (SELECT by AS y1, y0 FROM tr) GROUP BY 1, 2) c
              USING (y1, y0)
            JOIN (SELECT y0, CAST(COUNT(*) AS BIGINT) AS ny
                  FROM (SELECT y0 FROM tr) GROUP BY 1) e USING (y0))),
        tyx AS (
          SELECT SUM(term) AS te
          FROM (
            SELECT CAST(ROUND((CAST(nyyx AS DOUBLE) / CAST(nn AS DOUBLE)) *
                     ln(CAST(nyyx * ny AS DOUBLE) /
                        CAST(nyx * nyy AS DOUBLE)), 9) AS DECIMAL(20,9))
                     AS term
            FROM (
              SELECT y1, y0, x0, CAST(COUNT(*) AS BIGINT) AS nyyx,
                     CAST(SUM(COUNT(*)) OVER () AS BIGINT) AS nn
              FROM (SELECT bx AS y1, x0 AS y0, y0 AS x0 FROM tr)
              GROUP BY 1, 2, 3) a
            JOIN (SELECT y0, x0, CAST(COUNT(*) AS BIGINT) AS nyx
                  FROM (SELECT x0 AS y0, y0 AS x0 FROM tr) GROUP BY 1, 2) b
              USING (y0, x0)
            JOIN (SELECT y1, y0, CAST(COUNT(*) AS BIGINT) AS nyy
                  FROM (SELECT bx AS y1, x0 AS y0 FROM tr) GROUP BY 1, 2) c
              USING (y1, y0)
            JOIN (SELECT y0, CAST(COUNT(*) AS BIGINT) AS ny
                  FROM (SELECT x0 AS y0 FROM tr) GROUP BY 1) e USING (y0)))
        SELECT nn AS n_triples,
               ROUND(CAST(txy.te AS DOUBLE), 6) AS te_view_to_purchase,
               ROUND(CAST(tyx.te AS DOUBLE), 6) AS te_purchase_to_view,
               ROUND(CAST(txy.te AS DOUBLE) - CAST(tyx.te AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS net_flow
        FROM txy CROSS JOIN tyx""")),

    // Rank-biased overlap (p = 1/2, fully conjoint so the sum is the
    // EXACT RBO) between the brand revenue-rank lists of the early and
    // late order halves: per-depth overlap, agreement and geometric
    // contribution, plus the RBO scalar — the top-weighted alternative
    // to qfb's rank-distance card (footrule/Kendall weight all
    // positions equally; RBO answers "do the lists agree where it
    // matters, at the top"). p = 1/2 makes every weight an exact
    // dyadic 2^-d, so the only float op is the final division.
    "qgc_rbo_rankings" -> Q(
      fn = (s, dir) => {
        val wA = Window.orderBy(col("ca").desc, col("b"))
        val wB = Window.orderBy(col("cb").desc, col("b"))
        val cnt = t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand").as("b"))
          .agg(sum(when(col("o_orderdate") < lit("1998-01-01")
            .cast("timestamp"), 1L).otherwise(0L)).as("ca"),
            sum(when(col("o_orderdate") >= lit("1998-01-01")
              .cast("timestamp"), 1L).otherwise(0L)).as("cb"))
          .localCheckpoint(eager = false)
        val mr = cnt
          .select(col("b"), row_number().over(wA).cast("long").as("ra"))
          .join(cnt.select(col("b"),
            row_number().over(wB).cast("long").as("rb")), Seq("b"))
          .select(greatest(col("ra"), col("rb")).as("mr"))
          .groupBy(col("mr")).agg(count(lit(1)).as("c"))
        val cw = Window.orderBy(col("d"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val depth = s.range(1, 26).select(col("id").as("d"))
          .join(mr.select(col("mr").as("d"), col("c")), Seq("d"), "left")
          .select(col("d"), coalesce(col("c"), lit(0L)).as("c"))
          .select(col("d"), sum(col("c")).over(cw).as("m"))
          .select(col("d"), col("m"),
            round(col("m").cast("double") / col("d").cast("double"), 6)
              .as("agreement"),
            g9((col("m").cast("double") / col("d").cast("double")) /
              expr("CAST(shiftleft(CAST(1 AS BIGINT), CAST(d AS INT)) " +
                "AS DOUBLE)")).as("contrib"))
          .localCheckpoint(eager = false)
        val rbo = depth.agg(round(sum(col("contrib")).cast("double"), 6)
          .as("rbo"))
        depth.crossJoin(broadcast(rbo))
          .select(col("d"), col("m").as("overlap"), col("agreement"),
            round(col("contrib").cast("double"), 9).as("contribution"),
            col("rbo"))
          .orderBy(col("d"))
      },
      oracle = Some("""
        WITH cnt AS MATERIALIZED (
          SELECT p_brand AS b,
                 CAST(SUM(CASE WHEN o_orderdate < TIMESTAMP '1998-01-01'
                   THEN 1 ELSE 0 END) AS BIGINT) AS ca,
                 CAST(SUM(CASE WHEN o_orderdate >= TIMESTAMP '1998-01-01'
                   THEN 1 ELSE 0 END) AS BIGINT) AS cb
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN part ON l_partkey = p_partkey
          GROUP BY 1),
        mr AS (
          SELECT GREATEST(ra, rb) AS mr, CAST(COUNT(*) AS BIGINT) AS c
          FROM (SELECT b, CAST(ROW_NUMBER() OVER (ORDER BY ca DESC, b)
                  AS BIGINT) AS ra FROM cnt)
          JOIN (SELECT b, CAST(ROW_NUMBER() OVER (ORDER BY cb DESC, b)
                  AS BIGINT) AS rb FROM cnt) USING (b)
          GROUP BY 1),
        depth AS MATERIALIZED (
          SELECT d, m,
                 ROUND(CAST(m AS DOUBLE) / CAST(d AS DOUBLE), 6)
                   AS agreement,
                 CAST(ROUND((CAST(m AS DOUBLE) / CAST(d AS DOUBLE)) /
                   CAST(1 << CAST(d AS INT) AS DOUBLE), 9)
                   AS DECIMAL(20,9)) AS contrib
          FROM (
            SELECT d.d, CAST(SUM(COALESCE(mr.c, 0)) OVER (ORDER BY d.d
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
              AS m
            FROM (SELECT CAST(r.range AS BIGINT) AS d
                  FROM range(1, 26) r) d
            LEFT JOIN mr ON mr.mr = d.d)),
        rbo AS (
          SELECT ROUND(CAST(SUM(contrib) AS DOUBLE), 6) AS rbo FROM depth)
        SELECT d, m AS overlap, agreement,
               ROUND(CAST(contrib AS DOUBLE), 9) AS contribution, rbo
        FROM depth CROSS JOIN rbo ORDER BY d""")),

    // SAX symbolization of the 30-day event-count series: piecewise
    // aggregate approximation into 3-day segments, z-scored against the
    // whole-series moments, then discretized with the published
    // Gaussian breakpoints for a 4-symbol alphabet (±0.67449, 0) — the
    // symbolic compression behind SAX-family motif mining, giving qa9's
    // DTW and qga's matrix profile a vocabulary form. Moments are exact
    // integer sums; the z-scores are engine-identical doubles, so the
    // CASE discretization lands on the same symbol in both engines.
    "qgd_sax_symbols" -> Q(
      fn = (s, dir) => {
        val w = Window.orderBy(col("day"))
        val d = t(s, dir, "events")
          .groupBy(expr("CAST(unix_millis(ts) div 86400000 AS BIGINT)")
            .as("day"))
          .agg(count(lit(1)).as("y"))
        val idx = d.select(col("day"), col("y"),
          row_number().over(w).cast("long").as("rn"))
          .select(col("day"), col("y"),
            expr("(rn - 1) div 3").as("seg"))
          .localCheckpoint(eager = false)
        val mom = idx.agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
          sum(col("y") * col("y")).as("syy"))
        val paa = idx.groupBy(col("seg"))
          .agg(count(lit(1)).as("m"), sum(col("y")).as("ssy"),
            min(col("day")).as("day0"))
          .crossJoin(broadcast(mom))
          .select(col("seg"), col("day0"),
            ((col("ssy").cast("double") / col("m").cast("double") -
              col("sy").cast("double") / col("n").cast("double")) /
              sqrt((col("syy").cast("double") -
                col("sy").cast("double") * col("sy").cast("double") /
                  col("n").cast("double")) / (col("n") - 1).cast("double")))
              .as("z"))
        paa.select(col("seg"), col("day0"),
          (round(col("z"), 6) + lit(0.0)).as("paa_z"),
          when(col("z") < -0.67449, "a")
            .when(col("z") < 0.0, "b")
            .when(col("z") < 0.67449, "c")
            .otherwise("d").as("sym"))
          .orderBy(col("seg"))
      },
      oracle = Some("""
        WITH d AS (
          SELECT CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
                 CAST(COUNT(*) AS BIGINT) AS y
          FROM events GROUP BY 1),
        idx AS MATERIALIZED (
          SELECT day, y,
                 CAST((ROW_NUMBER() OVER (ORDER BY day) - 1) // 3
                   AS BIGINT) AS seg
          FROM d),
        mom AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(y * y) AS BIGINT) AS syy
          FROM idx),
        paa AS (
          SELECT seg, day0,
                 (CAST(ssy AS DOUBLE) / CAST(m AS DOUBLE) -
                  CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) /
                 sqrt((CAST(syy AS DOUBLE) -
                   CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) /
                   CAST(n AS DOUBLE)) / CAST(n - 1 AS DOUBLE)) AS z
          FROM (SELECT seg, CAST(COUNT(*) AS BIGINT) AS m,
                       CAST(SUM(y) AS BIGINT) AS ssy,
                       MIN(day) AS day0
                FROM idx GROUP BY 1)
          CROSS JOIN mom)
        SELECT seg, day0,
               ROUND(z, 6) + CAST(0 AS DOUBLE) AS paa_z,
               CASE WHEN z < -0.67449 THEN 'a'
                    WHEN z < 0.0 THEN 'b'
                    WHEN z < 0.67449 THEN 'c'
                    ELSE 'd' END AS sym
        FROM paa ORDER BY seg""")),

    // Direct and indirect standardization of per-nation ordering rates
    // across market-segment strata — the epidemiology/actuarial
    // adjustment (qek's risk measures compare two raw groups; this
    // card removes segment-mix confounding from 25 group rates): crude
    // rate, direct standardized rate (nation's stratum rates weighted
    // by the REFERENCE population), SMR = observed/expected from
    // reference stratum rates, and the indirect standardized rate.
    // Every rate is an exact-integer ratio; products of two rationals
    // ride the 9-grid DECIMAL sums.
    "qge_rate_standardization" -> Q(
      fn = (s, dir) => {
        val cust = t(s, dir, "customer")
          .groupBy(col("c_nationkey").as("n"), col("c_mktsegment").as("g"))
          .agg(count(lit(1)).as("m"))
        val ord = t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_nationkey").as("n"), col("c_mktsegment").as("g"))
          .agg(count(lit(1)).as("d"))
        val cell = cust.join(ord, Seq("n", "g"), "left")
          .select(col("n"), col("g"), col("m"),
            coalesce(col("d"), lit(0L)).as("d"))
          .localCheckpoint(eager = false)
        val ref = cell.groupBy(col("g"))
          .agg(sum(col("m")).as("mg"), sum(col("d")).as("dg"))
        val tot = ref.agg(sum(col("mg")).as("mm"), sum(col("dg")).as("dd"))
        cell.join(broadcast(ref), Seq("g")).crossJoin(broadcast(tot))
          .select(col("n"), col("m"), col("d"),
            g9((col("d").cast("double") / col("m").cast("double")) *
              (col("mg").cast("double") / col("mm").cast("double")))
              .as("dirterm"),
            g9(col("m").cast("double") *
              (col("dg").cast("double") / col("mg").cast("double")))
              .as("expterm"),
            col("dd"), col("mm"))
          .groupBy(col("n"), col("dd"), col("mm"))
          .agg(sum(col("m")).as("mn"), sum(col("d")).as("dn"),
            sum(col("dirterm")).as("direct"),
            sum(col("expterm")).as("expected"))
          .select(col("n"),
            round(col("dn").cast("double") / col("mn").cast("double"), 6)
              .as("crude_rate"),
            round(col("direct").cast("double"), 6).as("direct_rate"),
            round(col("dn").cast("double") /
              col("expected").cast("double"), 6).as("smr"),
            round((col("dn").cast("double") /
              col("expected").cast("double")) *
              (col("dd").cast("double") / col("mm").cast("double")), 6)
              .as("indirect_rate"))
          .orderBy(col("n"))
      },
      oracle = Some("""
        WITH cust AS (
          SELECT c_nationkey AS n, c_mktsegment AS g,
                 CAST(COUNT(*) AS BIGINT) AS m
          FROM customer GROUP BY 1, 2),
        ord AS (
          SELECT c_nationkey AS n, c_mktsegment AS g,
                 CAST(COUNT(*) AS BIGINT) AS d
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY 1, 2),
        cell AS MATERIALIZED (
          SELECT cust.n, cust.g, cust.m, COALESCE(ord.d, 0) AS d
          FROM cust LEFT JOIN ord ON cust.n = ord.n AND cust.g = ord.g),
        ref AS (
          SELECT g, CAST(SUM(m) AS BIGINT) AS mg,
                 CAST(SUM(d) AS BIGINT) AS dg
          FROM cell GROUP BY 1),
        tot AS (
          SELECT CAST(SUM(mg) AS BIGINT) AS mm,
                 CAST(SUM(dg) AS BIGINT) AS dd
          FROM ref),
        agg AS (
          SELECT n, dd, mm,
                 CAST(SUM(m) AS BIGINT) AS mn,
                 CAST(SUM(d) AS BIGINT) AS dn,
                 SUM(CAST(ROUND((CAST(d AS DOUBLE) / CAST(m AS DOUBLE)) *
                   (CAST(mg AS DOUBLE) / CAST(mm AS DOUBLE)), 9)
                   AS DECIMAL(20,9))) AS direct,
                 SUM(CAST(ROUND(CAST(m AS DOUBLE) *
                   (CAST(dg AS DOUBLE) / CAST(mg AS DOUBLE)), 9)
                   AS DECIMAL(20,9))) AS expected
          FROM cell JOIN ref USING (g) CROSS JOIN tot
          GROUP BY 1, 2, 3)
        SELECT n,
               ROUND(CAST(dn AS DOUBLE) / CAST(mn AS DOUBLE), 6)
                 AS crude_rate,
               ROUND(CAST(direct AS DOUBLE), 6) AS direct_rate,
               ROUND(CAST(dn AS DOUBLE) / CAST(expected AS DOUBLE), 6)
                 AS smr,
               ROUND((CAST(dn AS DOUBLE) / CAST(expected AS DOUBLE)) *
                 (CAST(dd AS DOUBLE) / CAST(mm AS DOUBLE)), 6)
                 AS indirect_rate
        FROM agg ORDER BY n""")),

    // NODF nestedness of the nation × brand purchase matrix (presence
    // = cell count above the global mean, which keeps the matrix
    // half-full at EVERY SF — a fixed threshold saturates to all-ones
    // at bench scale): paired overlap over both axes, counting only
    // decreasing-degree pairs per the NODF definition — the
    // ecological-network structure measure (do specialist nations buy
    // subsets of what generalist nations buy?). Presence, degrees and
    // overlaps are exact integers; two final divisions.
    "qgf_nodf_nestedness" -> Q(
      fn = (s, dir) => {
        val cell = t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .groupBy(col("c_nationkey").as("n"), col("p_brand").as("b"))
          .agg(count(lit(1)).as("c"))
          .localCheckpoint(eager = false)
        val tot = cell.agg(sum(col("c")).as("tc"),
          count(lit(1)).as("ncells"))
        val pres = cell.crossJoin(broadcast(tot))
          .filter(col("c") * col("ncells") > col("tc"))
          .select(col("n"), col("b"))
          .localCheckpoint(eager = false)
        def axis(key: String, other: String, alias: String): DataFrame = {
          val deg = pres.groupBy(col(key)).agg(count(lit(1)).as("deg"))
          val ov = pres.select(col(key).as("i"), col(other))
            .join(pres.select(col(key).as("j"), col(other)), Seq(other))
            .filter(col("i") < col("j"))
            .groupBy(col("i"), col("j")).agg(count(lit(1)).as("ov"))
          deg.select(col(key).as("i"), col("deg").as("di"))
            .join(deg.select(col(key).as("j"), col("deg").as("dj")))
            .filter(col("i") < col("j"))
            .join(ov, Seq("i", "j"), "left")
            .select(col("i"), col("j"), col("di"), col("dj"),
              coalesce(col("ov"), lit(0L)).as("ov"))
            .select(
              when(col("di") > col("dj"),
                g9(lit(100.0) * col("ov").cast("double") /
                  col("dj").cast("double")))
                .when(col("dj") > col("di"),
                  g9(lit(100.0) * col("ov").cast("double") /
                    col("di").cast("double")))
                .otherwise(lit(0).cast("decimal(20,9)")).as("np"))
            .agg(count(lit(1)).as(s"${alias}_pairs"),
              sum(col("np")).as(s"${alias}_sum"))
        }
        axis("n", "b", "rows").crossJoin(broadcast(axis("b", "n", "cols")))
          .select(col("rows_pairs"), col("cols_pairs"),
            round(col("rows_sum").cast("double") /
              col("rows_pairs").cast("double"), 6).as("nodf_rows"),
            round(col("cols_sum").cast("double") /
              col("cols_pairs").cast("double"), 6).as("nodf_cols"),
            round((col("rows_sum") + col("cols_sum")).cast("double") /
              (col("rows_pairs") + col("cols_pairs")).cast("double"), 6)
              .as("nodf"))
      },
      oracle = Some("""
        WITH cell AS MATERIALIZED (
          SELECT c_nationkey AS n, p_brand AS b,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN part ON l_partkey = p_partkey
          GROUP BY 1, 2),
        tot AS (SELECT CAST(SUM(c) AS BIGINT) AS tc,
                       CAST(COUNT(*) AS BIGINT) AS ncells FROM cell),
        pres AS MATERIALIZED (
          SELECT n, b FROM cell CROSS JOIN tot
          WHERE c * ncells > tc),
        degr AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS deg FROM pres
                 GROUP BY 1),
        ovr AS (
          SELECT a.n AS i, b.n AS j, CAST(COUNT(*) AS BIGINT) AS ov
          FROM pres a JOIN pres b ON a.b = b.b AND a.n < b.n
          GROUP BY 1, 2),
        rowsax AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS rows_pairs,
                 SUM(CASE
                   WHEN di.deg > dj.deg THEN CAST(ROUND(
                     CAST(100 AS DOUBLE) * CAST(COALESCE(ov, 0) AS DOUBLE) /
                     CAST(dj.deg AS DOUBLE), 9) AS DECIMAL(20,9))
                   WHEN dj.deg > di.deg THEN CAST(ROUND(
                     CAST(100 AS DOUBLE) * CAST(COALESCE(ov, 0) AS DOUBLE) /
                     CAST(di.deg AS DOUBLE), 9) AS DECIMAL(20,9))
                   ELSE CAST(0 AS DECIMAL(20,9)) END) AS rows_sum
          FROM degr di JOIN degr dj ON di.n < dj.n
          LEFT JOIN ovr ON ovr.i = di.n AND ovr.j = dj.n),
        degc AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS deg FROM pres
                 GROUP BY 1),
        ovc AS (
          SELECT a.b AS i, b.b AS j, CAST(COUNT(*) AS BIGINT) AS ov
          FROM pres a JOIN pres b ON a.n = b.n AND a.b < b.b
          GROUP BY 1, 2),
        colsax AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS cols_pairs,
                 SUM(CASE
                   WHEN di.deg > dj.deg THEN CAST(ROUND(
                     CAST(100 AS DOUBLE) * CAST(COALESCE(ov, 0) AS DOUBLE) /
                     CAST(dj.deg AS DOUBLE), 9) AS DECIMAL(20,9))
                   WHEN dj.deg > di.deg THEN CAST(ROUND(
                     CAST(100 AS DOUBLE) * CAST(COALESCE(ov, 0) AS DOUBLE) /
                     CAST(di.deg AS DOUBLE), 9) AS DECIMAL(20,9))
                   ELSE CAST(0 AS DECIMAL(20,9)) END) AS cols_sum
          FROM degc di JOIN degc dj ON di.b < dj.b
          LEFT JOIN ovc ON ovc.i = di.b AND ovc.j = dj.b)
        SELECT rows_pairs, cols_pairs,
               ROUND(CAST(rows_sum AS DOUBLE) / CAST(rows_pairs AS DOUBLE),
                 6) AS nodf_rows,
               ROUND(CAST(cols_sum AS DOUBLE) / CAST(cols_pairs AS DOUBLE),
                 6) AS nodf_cols,
               ROUND(CAST(rows_sum + cols_sum AS DOUBLE) /
                 CAST(rows_pairs + cols_pairs AS DOUBLE), 6) AS nodf
        FROM rowsax CROSS JOIN colsax""")),

    // Diebold-Mariano forecast-comparison test between the naive and
    // seasonal-naive one-step forecasts of daily revenue (absolute-
    // error loss): the loss differential is an EXACT DECIMAL per day,
    // its serial correlation is absorbed by a Bartlett lag-5 HAC
    // variance (the qg6 machinery applied to d_t), and the verdict
    // column makes the acceptance decision explicit — the missing
    // inferential step after qfz's point metrics ("is snaive's lower
    // MAE real or noise?").
    "qgg_diebold_mariano" -> Q(
      fn = (s, dir) => {
        val w = Window.orderBy(col("day"))
        val base = dailyRevenueM(s, dir)
          .select(col("day"), col("ym"),
            lag(col("ym"), 1).over(w).as("f1"),
            lag(col("ym"), 7).over(w).as("f7"),
            row_number().over(w).cast("long").as("rn"))
          .filter(col("rn") > 7)
          .select((col("rn") - 7).as("rn"),
            (abs(col("ym") - col("f1")) - abs(col("ym") - col("f7")))
              .as("dt"))
          .localCheckpoint(eager = false)
        val mom = base.agg(count(lit(1)).as("n"), sum(col("dt")).as("sd"))
        val cent = base.crossJoin(broadcast(mom))
          .select(col("rn"), col("n"),
            (col("dt").cast("double") -
              col("sd").cast("double") / col("n").cast("double")).as("dc"))
          .localCheckpoint(eager = false)
        val g0 = cent.agg(first(col("n")).as("n"),
          sum(g9(col("dc") * col("dc"))).as("g0"))
        val gl = cent.select(col("rn"), col("dc"))
          .join(cent.select(explode(sequence(lit(1L), lit(5L))).as("l"),
            (col("rn") + col("l")).as("rn"), col("dc").as("dl")),
            Seq("rn"))
          .groupBy(col("l")).agg(sum(g9(col("dc") * col("dl"))).as("gll"))
          .agg(sum(col("gll") * (lit(6) - col("l"))).as("wsum"))
        g0.crossJoin(broadcast(gl)).crossJoin(broadcast(mom
          .select(col("sd"))))
          .select(col("n"),
            (col("sd").cast("double") / col("n").cast("double"))
              .as("dbar"),
            ((col("g0").cast("double") +
              lit(2.0) * col("wsum").cast("double") / 6) /
              col("n").cast("double")).as("lrv"))
          .select(col("n").as("n_days"),
            (round(col("dbar"), 8) + lit(0.0)).as("mean_loss_diff"),
            (round(col("dbar") /
              sqrt(col("lrv") / col("n").cast("double")), 4) + lit(0.0))
              .as("dm_stat"),
            when(col("dbar") > 0, "snaive").when(col("dbar") < 0, "naive")
              .otherwise("tie").as("lower_loss"))
      },
      oracle = Some(s"""
        WITH dd AS ($dailyRevenueMSql),
        base AS MATERIALIZED (
          SELECT rn - 7 AS rn,
                 CAST(abs(ym - f1) - abs(ym - f7) AS DECIMAL(19,8)) AS dt
          FROM (
            SELECT day, ym,
                   LAG(ym, 1) OVER (ORDER BY day) AS f1,
                   LAG(ym, 7) OVER (ORDER BY day) AS f7,
                   CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS rn
            FROM dd) WHERE rn > 7),
        mom AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(dt) AS sd FROM base),
        cent AS MATERIALIZED (
          SELECT rn, n,
                 CAST(dt AS DOUBLE) -
                   CAST(sd AS DOUBLE) / CAST(n AS DOUBLE) AS dc
          FROM base CROSS JOIN mom),
        g0 AS (
          SELECT MAX(n) AS n,
                 SUM(CAST(ROUND(dc * dc, 9) AS DECIMAL(20,9))) AS g0
          FROM cent),
        gl AS (
          SELECT SUM(gll * (6 - l)) AS wsum
          FROM (
            SELECT l.l,
                   SUM(CAST(ROUND(a.dc * b.dc, 9) AS DECIMAL(20,9))) AS gll
            FROM range(1, 6) AS l(l)
            JOIN cent a ON TRUE
            JOIN cent b ON b.rn + l.l = a.rn
            GROUP BY 1)),
        fin AS (
          SELECT g0.n,
                 CAST(sd AS DOUBLE) / CAST(g0.n AS DOUBLE) AS dbar,
                 (CAST(g0.g0 AS DOUBLE) + CAST(2 AS DOUBLE) *
                   CAST(wsum AS DOUBLE) / 6) / CAST(g0.n AS DOUBLE) AS lrv
          FROM g0 CROSS JOIN gl CROSS JOIN mom)
        SELECT n AS n_days,
               ROUND(dbar, 8) + CAST(0 AS DOUBLE) AS mean_loss_diff,
               ROUND(dbar / sqrt(lrv / CAST(n AS DOUBLE)), 4)
                 + CAST(0 AS DOUBLE) AS dm_stat,
               CASE WHEN dbar > 0 THEN 'snaive'
                    WHEN dbar < 0 THEN 'naive' ELSE 'tie' END
                 AS lower_loss
        FROM fin""")),

    // Competing-risks cumulative incidence (discrete Aalen-Johansen):
    // first purchase vs first error as competing terminal events per
    // user, censoring at end of observation — the decomposition q7a's
    // single-cause Kaplan-Meier cannot give (1-KM overestimates each
    // cause's incidence when the other competes). The survival product
    // and CIF increments walk the q4b 9-grid recipe (values ≤ 1, raw
    // products snapped per step), so the Spark ordered fold and the
    // DuckDB recursive CTE agree bit-for-bit; risk sets come from one
    // cumulative count scan, never an inequality join.
    "qgh_competing_risks" -> Q(
      fn = (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("user_id"),
            expr("CAST(unix_millis(ts) div 86400000 AS BIGINT)").as("day"),
            col("event_type"))
        val users = ev.groupBy(col("user_id"))
          .agg(min(col("day")).as("u0"),
            min(when(col("event_type") === "purchase", col("day")))
              .as("fp"),
            min(when(col("event_type") === "error", col("day"))).as("fe"))
        val horizon = ev.agg(max(col("day")).as("mx"))
        val subj = users.crossJoin(broadcast(horizon))
          .select(
            when(col("fp").isNotNull &&
              (col("fe").isNull || col("fp") <= col("fe")),
              col("fp") - col("u0"))
              .when(col("fe").isNotNull, col("fe") - col("u0"))
              .otherwise(col("mx") - col("u0")).as("tt"),
            when(col("fp").isNotNull &&
              (col("fe").isNull || col("fp") <= col("fe")), 1L)
              .when(col("fe").isNotNull, 2L).otherwise(0L).as("k"))
          .localCheckpoint(eager = false)
        val nTot = subj.agg(count(lit(1)).as("nn"))
        val wT = Window.orderBy(col("tt"))
          .rowsBetween(Window.unboundedPreceding, -1)
        val table = subj.groupBy(col("tt"))
          .agg(count(lit(1)).as("ct"),
            sum(when(col("k") === 1, 1L).otherwise(0L)).as("d1"),
            sum(when(col("k") === 2, 1L).otherwise(0L)).as("d2"))
          .crossJoin(broadcast(nTot))
          .select(col("tt"), col("d1"), col("d2"),
            (col("nn") - coalesce(sum(col("ct")).over(wT), lit(0L)))
              .as("nr"))
          .filter(col("d1") + col("d2") > 0)
        table.agg(array_sort(collect_list(struct(col("tt"), col("nr"),
          col("d1"), col("d2")))).as("a"))
          .select(expr("""
            aggregate(
              a,
              named_struct('s', CAST(1 AS DOUBLE), 'c1', CAST(0 AS DOUBLE),
                'c2', CAST(0 AS DOUBLE),
                'out', CAST(array() AS ARRAY<STRUCT<tt: BIGINT, nr: BIGINT,
                  d1: BIGINT, d2: BIGINT, s: DOUBLE, c1: DOUBLE,
                  c2: DOUBLE>>)),
              (acc, v) -> named_struct(
                's', round(acc.s * (1 - (v.d1 + v.d2) / CAST(v.nr AS
                  DOUBLE)), 9),
                'c1', round(acc.c1 + round(acc.s * v.d1 /
                  CAST(v.nr AS DOUBLE), 9), 9),
                'c2', round(acc.c2 + round(acc.s * v.d2 /
                  CAST(v.nr AS DOUBLE), 9), 9),
                'out', array_append(acc.out, named_struct(
                  'tt', v.tt, 'nr', v.nr, 'd1', v.d1, 'd2', v.d2,
                  's', round(acc.s * (1 - (v.d1 + v.d2) /
                    CAST(v.nr AS DOUBLE)), 9),
                  'c1', round(acc.c1 + round(acc.s * v.d1 /
                    CAST(v.nr AS DOUBLE), 9), 9),
                  'c2', round(acc.c2 + round(acc.s * v.d2 /
                    CAST(v.nr AS DOUBLE), 9), 9)))),
              acc -> acc.out) AS lt"""))
          .select(explode(col("lt")).as("r"))
          .select(col("r.tt").as("t_days"), col("r.nr").as("n_risk"),
            col("r.d1").as("d_purchase"), col("r.d2").as("d_error"),
            round(col("r.s"), 6).as("surv"),
            round(col("r.c1"), 6).as("cif_purchase"),
            round(col("r.c2"), 6).as("cif_error"))
          .orderBy(col("t_days"))
      },
      oracle = Some("""
        WITH RECURSIVE ev AS (
          SELECT user_id, CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
                 event_type
          FROM events),
        users AS (
          SELECT user_id, MIN(day) AS u0,
                 MIN(CASE WHEN event_type = 'purchase' THEN day END) AS fp,
                 MIN(CASE WHEN event_type = 'error' THEN day END) AS fe
          FROM ev GROUP BY 1),
        horizon AS (SELECT MAX(day) AS mx FROM ev),
        subj AS MATERIALIZED (
          SELECT CASE
                   WHEN fp IS NOT NULL AND (fe IS NULL OR fp <= fe)
                     THEN fp - u0
                   WHEN fe IS NOT NULL THEN fe - u0
                   ELSE mx - u0 END AS tt,
                 CASE
                   WHEN fp IS NOT NULL AND (fe IS NULL OR fp <= fe) THEN 1
                   WHEN fe IS NOT NULL THEN 2 ELSE 0 END AS k
          FROM users CROSS JOIN horizon),
        ntot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM subj),
        tbl AS MATERIALIZED (
          SELECT tt, d1, d2, nr,
                 CAST(ROW_NUMBER() OVER (ORDER BY tt) AS BIGINT) AS rn
          FROM (
            SELECT tt,
                   CAST(SUM(CASE WHEN k = 1 THEN 1 ELSE 0 END) AS BIGINT)
                     AS d1,
                   CAST(SUM(CASE WHEN k = 2 THEN 1 ELSE 0 END) AS BIGINT)
                     AS d2,
                   nn - CAST(COALESCE(SUM(COUNT(*)) OVER (ORDER BY tt
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                     AS BIGINT) AS nr
            FROM subj CROSS JOIN ntot GROUP BY tt, nn)
          WHERE d1 + d2 > 0),
        aj AS (
          SELECT rn, tt, nr, d1, d2,
                 ROUND(1 * (1 - (d1 + d2) / CAST(nr AS DOUBLE)), 9) AS s,
                 ROUND(0 + ROUND(1 * d1 / CAST(nr AS DOUBLE), 9), 9)
                   AS c1,
                 ROUND(0 + ROUND(1 * d2 / CAST(nr AS DOUBLE), 9), 9)
                   AS c2
          FROM tbl WHERE rn = 1
          UNION ALL
          SELECT t.rn, t.tt, t.nr, t.d1, t.d2,
                 ROUND(aj.s * (1 - (t.d1 + t.d2) / CAST(t.nr AS DOUBLE)),
                   9),
                 ROUND(aj.c1 + ROUND(aj.s * t.d1 /
                   CAST(t.nr AS DOUBLE), 9), 9),
                 ROUND(aj.c2 + ROUND(aj.s * t.d2 /
                   CAST(t.nr AS DOUBLE), 9), 9)
          FROM aj JOIN tbl t ON t.rn = aj.rn + 1)
        SELECT tt AS t_days, nr AS n_risk, d1 AS d_purchase,
               d2 AS d_error,
               ROUND(s, 6) AS surv,
               ROUND(c1, 6) AS cif_purchase,
               ROUND(c2, 6) AS cif_error
        FROM aj ORDER BY t_days""")),

    // Deterministic capacity-backlog flow (the Lindley recursion
    // B_t = max(0, B_{t-1} + y_t - c) over daily order arrivals with
    // integer capacity c = ⌈N/days⌉): solved in CLOSED FORM as
    // B_t = P_t - min(0, min_{j≤t} P_j) over the centered prefix sums,
    // so the "simulation" is two window scans — exact integers
    // end-to-end, no recursion, no float — the what-if primitive
    // behind qau's Erlang staffing and qar's Little's-law cards.
    "qgi_capacity_backlog" -> Q(
      fn = (s, dir) => {
        val d = t(s, dir, "events")
          .groupBy(expr("CAST(unix_millis(ts) div 86400000 AS BIGINT)")
            .as("day"))
          .agg(count(lit(1)).as("y"))
        val cap = d.agg(expr("CAST((sum(y) + count(1) - 1) div count(1) " +
          "AS BIGINT)").as("c"))
        val w = Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        d.crossJoin(broadcast(cap))
          .select(col("day"), col("y"), col("c"),
            sum(col("y") - col("c")).over(w).as("p"))
          .select(col("day"), col("y"), col("c"), col("p"),
            min(col("p")).over(w).as("mp"))
          .select(col("day"), col("y"), col("c").as("capacity"),
            (col("p") - least(col("mp"), lit(0L))).as("backlog"),
            round((col("p") - least(col("mp"), lit(0L))).cast("double") /
              col("c").cast("double"), 6).as("wait_days"))
          .orderBy(col("day"))
      },
      oracle = Some("""
        WITH d AS (
          SELECT CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
                 CAST(COUNT(*) AS BIGINT) AS y
          FROM events GROUP BY 1),
        cap AS (
          SELECT CAST((SUM(y) + COUNT(*) - 1) // COUNT(*) AS BIGINT) AS c
          FROM d),
        pre AS (
          SELECT day, y, c,
                 CAST(SUM(y - c) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS p
          FROM d CROSS JOIN cap),
        mm AS (
          SELECT day, y, c, p,
                 CAST(MIN(p) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS mp
          FROM pre)
        SELECT day, y, c AS capacity,
               p - LEAST(mp, 0) AS backlog,
               ROUND(CAST(p - LEAST(mp, 0) AS DOUBLE) / CAST(c AS DOUBLE),
                 6) AS wait_days
        FROM mm ORDER BY day""")),

    // Gravity model of inter-nation trade: lineitem flows between
    // customer and supplier nations regressed as ln(flow) on
    // ln(mass_i · mass_j) — the workhorse spatial-interaction model;
    // the elasticity says how super/sub-linear trade is in combined
    // market size, and the top positive residuals name the
    // over-trading corridors (the economics twin of qa7's link
    // prediction). ln of exact-integer products is the only float
    // link; OLS rides 9-grid moment sums.
    "qgj_gravity_model" -> Q(
      fn = (s, dir) => {
        val flow = t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .filter(col("c_nationkey") =!= col("s_nationkey"))
          .groupBy(col("c_nationkey").as("i"), col("s_nationkey").as("j"))
          .agg(count(lit(1)).as("f"))
          .localCheckpoint(eager = false)
        val mi = flow.groupBy(col("i")).agg(sum(col("f")).as("m1"))
        val mj = flow.groupBy(col("j")).agg(sum(col("f")).as("m2"))
        val xy = flow.join(mi, Seq("i")).join(broadcast(mj), Seq("j"))
          .select(col("i"), col("j"), col("f"),
            log((col("m1") * col("m2")).cast("double")).as("x"),
            log(col("f").cast("double")).as("y"))
          .localCheckpoint(eager = false)
        val mom = xy.agg(count(lit(1)).as("n"), sum(g9(col("x"))).as("sx"),
          sum(g9(col("y"))).as("sy"), sum(g9(col("x") * col("x")))
            .as("sxx"),
          sum(g9(col("x") * col("y"))).as("sxy"),
          sum(g9(col("y") * col("y"))).as("syy"))
          // closed form in doubles from the exact decimal images (every
          // scaled sum ≪ 2^53, so the casts are exact in both engines;
          // decimal×decimal here would blow the 38-digit width)
          .select(col("n").cast("double").as("nd"),
            col("sx").cast("double").as("sxd"),
            col("sy").cast("double").as("syd"),
            col("sxx").cast("double").as("sxxd"),
            col("sxy").cast("double").as("sxyd"),
            col("syy").cast("double").as("syyd"), col("n"))
          .select(col("n"),
            ((col("nd") * col("sxyd") - col("sxd") * col("syd")) /
              (col("nd") * col("sxxd") - col("sxd") * col("sxd"))).as("b"),
            col("nd"), col("sxd"), col("syd"), col("sxxd"), col("sxyd"),
            col("syyd"))
          .select(col("n"), col("b"),
            ((col("syd") - col("b") * col("sxd")) / col("nd")).as("a"),
            (((col("nd") * col("sxyd") - col("sxd") * col("syd")) *
              (col("nd") * col("sxyd") - col("sxd") * col("syd"))) /
              ((col("nd") * col("sxxd") - col("sxd") * col("sxd")) *
                (col("nd") * col("syyd") - col("syd") * col("syd"))))
              .as("r2"))
        xy.crossJoin(broadcast(mom))
          .select(col("i"), col("j"), col("f"),
            col("n").as("n_cells"),
            round(col("b"), 6).as("elasticity"),
            (round(col("a"), 6) + lit(0.0)).as("intercept"),
            round(col("r2"), 6).as("r2"),
            (round(col("y") - col("a") - col("b") * col("x"), 6) +
              lit(0.0)).as("log_residual"))
          .orderBy(col("log_residual").desc, col("i"), col("j"))
          .limit(10)
      },
      oracle = Some("""
        WITH flow AS MATERIALIZED (
          SELECT c_nationkey AS i, s_nationkey AS j,
                 CAST(COUNT(*) AS BIGINT) AS f
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN supplier ON l_suppkey = s_suppkey
          WHERE c_nationkey <> s_nationkey
          GROUP BY 1, 2),
        mi AS (SELECT i, CAST(SUM(f) AS BIGINT) AS m1 FROM flow
               GROUP BY 1),
        mj AS (SELECT j, CAST(SUM(f) AS BIGINT) AS m2 FROM flow
               GROUP BY 1),
        xy AS MATERIALIZED (
          SELECT i, j, f,
                 ln(CAST(m1 * m2 AS DOUBLE)) AS x,
                 ln(CAST(f AS DOUBLE)) AS y
          FROM flow JOIN mi USING (i) JOIN mj USING (j)),
        mom AS (
          SELECT n, nd, sxd, syd, sxxd, sxyd, syyd,
                 (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd) AS b
          FROM (
            SELECT n, CAST(n AS DOUBLE) AS nd,
                   CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
                   CAST(sxx AS DOUBLE) AS sxxd,
                   CAST(sxy AS DOUBLE) AS sxyd,
                   CAST(syy AS DOUBLE) AS syyd
            FROM (
              SELECT CAST(COUNT(*) AS BIGINT) AS n,
                     SUM(CAST(ROUND(x, 9) AS DECIMAL(20,9))) AS sx,
                     SUM(CAST(ROUND(y, 9) AS DECIMAL(20,9))) AS sy,
                     SUM(CAST(ROUND(x * x, 9) AS DECIMAL(20,9))) AS sxx,
                     SUM(CAST(ROUND(x * y, 9) AS DECIMAL(20,9))) AS sxy,
                     SUM(CAST(ROUND(y * y, 9) AS DECIMAL(20,9))) AS syy
              FROM xy))),
        fin AS (
          SELECT n, b,
                 (syd - b * sxd) / nd AS a,
                 ((nd * sxyd - sxd * syd) * (nd * sxyd - sxd * syd)) /
                 ((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd)) AS r2
          FROM mom)
        SELECT i, j, f, n AS n_cells,
               ROUND(b, 6) AS elasticity,
               ROUND(a, 6) + CAST(0 AS DOUBLE) AS intercept,
               ROUND(r2, 6) AS r2,
               ROUND(y - a - b * x, 6) + CAST(0 AS DOUBLE)
                 AS log_residual
        FROM xy CROSS JOIN fin
        ORDER BY log_residual DESC, i, j LIMIT 10""")),

    // Wagner-Whitin optimal lot-sizing over the 30-day purchase-demand
    // series (setup cost K=50, holding h=1/unit/day): the classic
    // dynamic program f(t) = min_j [f(j-1) + K + H(j,t)], with the
    // holding term closed-form from two integer prefix sums — the
    // EXACT-integer counterpart of qdk's newsvendor fractile and qb1's
    // (s,S) policy (deterministic demand, time-varying, provably
    // optimal plan). Zero float arithmetic anywhere: the Spark fold
    // and the DuckDB recursive CTE carry the f(·) table as an integer
    // LIST, and argmin ties break to the earliest setup in both.
    "qgk_wagner_whitin" -> Q(
      fn = (s, dir) => {
        val d = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(expr("CAST(unix_millis(ts) div 86400000 AS BIGINT)")
            .as("day"))
          .agg(count(lit(1)).as("dm"))
        val w = Window.orderBy(col("day"))
        val pre = d.select(col("day"), col("dm"),
          row_number().over(w).cast("long").as("tix"))
        pre.agg(array_sort(collect_list(struct(col("tix"), col("day"),
          col("dm")))).as("a"))
          .select(expr("""
            aggregate(
              a,
              named_struct(
                'f', array(CAST(0 AS BIGINT)),
                'dp', array(CAST(0 AS BIGINT)),
                'wp', array(CAST(0 AS BIGINT)),
                'out', CAST(array() AS ARRAY<STRUCT<tix: BIGINT,
                  day: BIGINT, dm: BIGINT, cost: BIGINT, setup: BIGINT>>)),
              (acc, v) -> named_struct(
                'f', array_append(acc.f, array_min(transform(
                  sequence(1, CAST(v.tix AS INT)),
                  j -> element_at(acc.f, j) + 50L +
                    (element_at(acc.wp, CAST(v.tix AS INT)) -
                       element_at(acc.wp, j)
                     + v.tix * v.dm - CAST(j AS BIGINT) *
                       (element_at(acc.dp, CAST(v.tix AS INT)) -
                        element_at(acc.dp, j) + v.dm))))),
                'dp', array_append(acc.dp,
                  element_at(acc.dp, CAST(v.tix AS INT)) + v.dm),
                'wp', array_append(acc.wp,
                  element_at(acc.wp, CAST(v.tix AS INT)) +
                    v.tix * v.dm),
                'out', array_append(acc.out, named_struct(
                  'tix', v.tix, 'day', v.day, 'dm', v.dm,
                  'cost', array_min(transform(
                    sequence(1, CAST(v.tix AS INT)),
                    j -> element_at(acc.f, j) + 50L +
                      (element_at(acc.wp, CAST(v.tix AS INT)) -
                         element_at(acc.wp, j)
                       + v.tix * v.dm - CAST(j AS BIGINT) *
                         (element_at(acc.dp, CAST(v.tix AS INT)) -
                          element_at(acc.dp, j) + v.dm)))),
                  'setup', CAST(array_position(transform(
                    sequence(1, CAST(v.tix AS INT)),
                    j -> element_at(acc.f, j) + 50L +
                      (element_at(acc.wp, CAST(v.tix AS INT)) -
                         element_at(acc.wp, j)
                       + v.tix * v.dm - CAST(j AS BIGINT) *
                         (element_at(acc.dp, CAST(v.tix AS INT)) -
                          element_at(acc.dp, j) + v.dm))),
                    array_min(transform(
                      sequence(1, CAST(v.tix AS INT)),
                      j -> element_at(acc.f, j) + 50L +
                        (element_at(acc.wp, CAST(v.tix AS INT)) -
                           element_at(acc.wp, j)
                         + v.tix * v.dm - CAST(j AS BIGINT) *
                           (element_at(acc.dp, CAST(v.tix AS INT)) -
                            element_at(acc.dp, j) + v.dm)))))
                    AS BIGINT)))),
              acc -> acc.out) AS ww"""))
          .select(explode(col("ww")).as("r"))
          .select(col("r.tix").as("t"), col("r.day").as("day"),
            col("r.dm").as("demand"), col("r.cost").as("total_cost"),
            col("r.setup").as("last_setup"))
          .orderBy(col("t"))
      },
      oracle = Some("""
        WITH RECURSIVE d AS (
          SELECT CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
                 CAST(COUNT(*) AS BIGINT) AS dm
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        pre AS MATERIALIZED (
          SELECT day, dm, CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT)
                   AS tix
          FROM d),
        nmax AS (SELECT CAST(MAX(tix) AS BIGINT) AS nt FROM pre),
        ww AS (
          SELECT CAST(0 AS BIGINT) AS tix, CAST(0 AS BIGINT) AS day,
                 CAST(0 AS BIGINT) AS dm,
                 [CAST(0 AS BIGINT)] AS f,
                 [CAST(0 AS BIGINT)] AS dp,
                 [CAST(0 AS BIGINT)] AS wp,
                 CAST(0 AS BIGINT) AS cost, CAST(0 AS BIGINT) AS setup
          UNION ALL
          SELECT p.tix, p.day, p.dm,
                 list_append(ww.f, list_min(list_transform(
                   range(1, CAST(p.tix AS INT) + 1),
                   j -> ww.f[j] + 50 +
                     (ww.wp[CAST(p.tix AS INT)] - ww.wp[j]
                      + p.tix * p.dm - CAST(j AS BIGINT) *
                        (ww.dp[CAST(p.tix AS INT)] - ww.dp[j]
                         + p.dm))))),
                 list_append(ww.dp, ww.dp[CAST(p.tix AS INT)] + p.dm),
                 list_append(ww.wp, ww.wp[CAST(p.tix AS INT)] +
                   p.tix * p.dm),
                 list_min(list_transform(
                   range(1, CAST(p.tix AS INT) + 1),
                   j -> ww.f[j] + 50 +
                     (ww.wp[CAST(p.tix AS INT)] - ww.wp[j]
                      + p.tix * p.dm - CAST(j AS BIGINT) *
                        (ww.dp[CAST(p.tix AS INT)] - ww.dp[j]
                         + p.dm)))),
                 CAST(list_position(list_transform(
                   range(1, CAST(p.tix AS INT) + 1),
                   j -> ww.f[j] + 50 +
                     (ww.wp[CAST(p.tix AS INT)] - ww.wp[j]
                      + p.tix * p.dm - CAST(j AS BIGINT) *
                        (ww.dp[CAST(p.tix AS INT)] - ww.dp[j]
                         + p.dm))),
                   list_min(list_transform(
                     range(1, CAST(p.tix AS INT) + 1),
                     j -> ww.f[j] + 50 +
                       (ww.wp[CAST(p.tix AS INT)] - ww.wp[j]
                        + p.tix * p.dm - CAST(j AS BIGINT) *
                          (ww.dp[CAST(p.tix AS INT)] - ww.dp[j]
                           + p.dm))))) AS BIGINT)
          FROM ww JOIN pre p ON p.tix = ww.tix + 1)
        SELECT tix AS t, day, dm AS demand, cost AS total_cost,
               setup AS last_setup
        FROM ww WHERE tix >= 1 ORDER BY t""")),

    // Seat apportionment of 100 "delegates" to nations by customer
    // population under the three canonical rules — D'Hondt (favors
    // large), Sainte-Laguë (odd divisors, near-unbiased) and Hamilton
    // largest-remainder — with ties broken (quotient, population,
    // nation) identically in both engines. The divisor methods are a
    // top-100 over an exploded nation × divisor quotient table; every
    // comparison is a correctly-rounded double of an exact-integer
    // ratio. The proportionality workhorse behind quota sampling and
    // shard assignment, not just parliaments.
    "qgl_apportionment" -> Q(
      fn = (s, dir) => {
        val popd = t(s, dir, "customer")
          .groupBy(col("c_nationkey").as("n"))
          .agg(count(lit(1)).as("c"))
          .localCheckpoint(eager = false)
        val tot = popd.agg(sum(col("c")).as("cc"), count(lit(1)).as("k"))
        def divisor(div: Column => Column, name: String): DataFrame = {
          val wq = Window.orderBy(col("q").desc, col("c").desc, col("n"),
            col("kk"))
          popd.select(col("n"), col("c"),
            explode(sequence(lit(1L), lit(100L))).as("kk"))
            .select(col("n"), col("c"), col("kk"),
              (col("c").cast("double") / div(col("kk")).cast("double"))
                .as("q"))
            .select(col("n"), row_number().over(wq).as("rk"))
            .filter(col("rk") <= 100)
            .groupBy(col("n")).agg(count(lit(1)).as(name))
        }
        val dh = divisor(k => k, "dhondt")
        val sl = divisor(k => k * 2 - 1, "sainte_lague")
        val wr = Window.orderBy(
          (col("c") * 100 - col("base") * col("cc")).desc, col("c").desc,
          col("n"))
        val ham = popd.crossJoin(broadcast(tot))
          .select(col("n"), col("c"), col("cc"),
            expr("(c * 100) div cc").as("base"))
          .select(col("n"), col("c"), col("cc"), col("base"),
            row_number().over(wr).as("rr"),
            sum(col("base")).over(Window.partitionBy()).as("sb"))
          .select(col("n"),
            (col("base") + when(col("rr") <= lit(100) - col("sb"), 1L)
              .otherwise(0L)).as("hamilton"))
        popd.join(dh, Seq("n"), "left").join(sl, Seq("n"), "left")
          .join(ham, Seq("n"), "left")
          .select(col("n"), col("c").as("customers"),
            coalesce(col("dhondt"), lit(0L)).as("dhondt"),
            coalesce(col("sainte_lague"), lit(0L)).as("sainte_lague"),
            coalesce(col("hamilton"), lit(0L)).as("hamilton"))
          .orderBy(col("n"))
      },
      oracle = Some("""
        WITH popd AS MATERIALIZED (
          SELECT c_nationkey AS n, CAST(COUNT(*) AS BIGINT) AS c
          FROM customer GROUP BY 1),
        tot AS (SELECT CAST(SUM(c) AS BIGINT) AS cc FROM popd),
        dh AS (
          SELECT n, CAST(COUNT(*) AS BIGINT) AS dhondt
          FROM (
            SELECT n, ROW_NUMBER() OVER (ORDER BY
              CAST(c AS DOUBLE) / CAST(kk AS DOUBLE) DESC, c DESC, n, kk)
              AS rk
            FROM (SELECT n, c, CAST(k.range AS BIGINT) AS kk
                  FROM popd CROSS JOIN range(1, 101) k))
          WHERE rk <= 100 GROUP BY 1),
        sl AS (
          SELECT n, CAST(COUNT(*) AS BIGINT) AS sainte_lague
          FROM (
            SELECT n, ROW_NUMBER() OVER (ORDER BY
              CAST(c AS DOUBLE) / CAST(kk * 2 - 1 AS DOUBLE) DESC, c DESC,
              n, kk) AS rk
            FROM (SELECT n, c, CAST(k.range AS BIGINT) AS kk
                  FROM popd CROSS JOIN range(1, 101) k))
          WHERE rk <= 100 GROUP BY 1),
        hb AS (
          SELECT n, c, cc, (c * 100) // cc AS base
          FROM popd CROSS JOIN tot),
        ham AS (
          SELECT n, base + CASE WHEN rr <= 100 - sb THEN 1 ELSE 0 END
                   AS hamilton
          FROM (
            SELECT n, c, cc, base,
                   ROW_NUMBER() OVER (ORDER BY c * 100 - base * cc DESC,
                     c DESC, n) AS rr,
                   SUM(base) OVER () AS sb
            FROM hb))
        SELECT popd.n, popd.c AS customers,
               CAST(COALESCE(dh.dhondt, 0) AS BIGINT) AS dhondt,
               CAST(COALESCE(sl.sainte_lague, 0) AS BIGINT)
                 AS sainte_lague,
               CAST(COALESCE(ham.hamilton, 0) AS BIGINT) AS hamilton
        FROM popd LEFT JOIN dh ON popd.n = dh.n
        LEFT JOIN sl ON popd.n = sl.n
        LEFT JOIN ham ON popd.n = ham.n
        ORDER BY popd.n""")),

    // Classifier fairness audit across market segments: a "high-value"
    // flag (order value above the exact global mean — an exact DECIMAL
    // comparison, so group membership is engine-stable) scored against
    // an urgent-priority outcome; per-group selection rate, TPR and
    // FPR, plus the demographic-parity ratio and equalized-odds gaps —
    // the disparate-impact numbers a production scoring pipeline must
    // report alongside q5z's aggregate AUC. All rates are
    // exact-integer ratios.
    "qgm_fairness_audit" -> Q(
      fn = (s, dir) => {
        val o = t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .select(col("c_mktsegment").as("g"),
            col("o_totalprice").cast("decimal(18,2)").as("p"),
            when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L)
              .otherwise(0L).as("y"))
        val thr = o.agg(sum(col("p")).as("sp"), count(lit(1)).as("np"))
        val scored = o.crossJoin(broadcast(thr))
          .select(col("g"), col("y"),
            when(col("p") * col("np") > col("sp"), 1L).otherwise(0L)
              .as("yh"))
        val grp = scored.groupBy(col("g"))
          .agg(count(lit(1)).as("n"),
            sum(col("yh")).as("sel"),
            sum(when(col("y") === 1 && col("yh") === 1, 1L).otherwise(0L))
              .as("tp"),
            sum(col("y")).as("pos"),
            sum(when(col("y") === 0 && col("yh") === 1, 1L).otherwise(0L))
              .as("fp"))
          .select(col("g"), col("n"),
            (col("sel").cast("double") / col("n").cast("double"))
              .as("selr"),
            (col("tp").cast("double") / col("pos").cast("double"))
              .as("tpr"),
            (col("fp").cast("double") /
              (col("n") - col("pos")).cast("double")).as("fpr"))
          .localCheckpoint(eager = false)
        val gaps = grp.agg(
          (min(col("selr")) / max(col("selr"))).as("dp_ratio"),
          (max(col("tpr")) - min(col("tpr"))).as("eo_tpr_gap"),
          (max(col("fpr")) - min(col("fpr"))).as("eo_fpr_gap"))
        grp.crossJoin(broadcast(gaps))
          .select(col("g"), col("n"),
            round(col("selr"), 6).as("selection_rate"),
            round(col("tpr"), 6).as("tpr"),
            round(col("fpr"), 6).as("fpr"),
            round(col("dp_ratio"), 6).as("dp_ratio"),
            round(col("eo_tpr_gap"), 6).as("eo_tpr_gap"),
            round(col("eo_fpr_gap"), 6).as("eo_fpr_gap"))
          .orderBy(col("g"))
      },
      oracle = Some("""
        WITH o AS (
          SELECT c_mktsegment AS g,
                 CAST(o_totalprice AS DECIMAL(18,2)) AS p,
                 CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                   THEN 1 ELSE 0 END AS y
          FROM orders JOIN customer ON o_custkey = c_custkey),
        thr AS (SELECT SUM(p) AS sp, CAST(COUNT(*) AS BIGINT) AS np
                FROM o),
        scored AS (
          SELECT g, y,
                 CASE WHEN p * np > sp THEN 1 ELSE 0 END AS yh
          FROM o CROSS JOIN thr),
        grp AS MATERIALIZED (
          SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(yh) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                   AS selr,
                 CAST(SUM(CASE WHEN y = 1 AND yh = 1 THEN 1 ELSE 0 END)
                   AS DOUBLE) / CAST(SUM(y) AS DOUBLE) AS tpr,
                 CAST(SUM(CASE WHEN y = 0 AND yh = 1 THEN 1 ELSE 0 END)
                   AS DOUBLE) /
                   CAST(COUNT(*) - SUM(y) AS DOUBLE) AS fpr
          FROM scored GROUP BY 1),
        gaps AS (
          SELECT MIN(selr) / MAX(selr) AS dp_ratio,
                 MAX(tpr) - MIN(tpr) AS eo_tpr_gap,
                 MAX(fpr) - MIN(fpr) AS eo_fpr_gap
          FROM grp)
        SELECT g, n,
               ROUND(selr, 6) AS selection_rate,
               ROUND(tpr, 6) AS tpr,
               ROUND(fpr, 6) AS fpr,
               ROUND(dp_ratio, 6) AS dp_ratio,
               ROUND(eo_tpr_gap, 6) AS eo_tpr_gap,
               ROUND(eo_fpr_gap, 6) AS eo_fpr_gap
        FROM grp CROSS JOIN gaps ORDER BY g""")),

    // Instrumental-variable (Wald) estimate: urgent order priority as
    // the instrument, line count as the endogenous "effort" exposure,
    // order value as the outcome — the two-group ratio estimator
    // β_IV = (ȳ₁−ȳ₀)/(x̄₁−x̄₀) with its first-stage and reduced-form
    // components reported (weak-instrument diagnosis by inspection) —
    // the simplest member of the causal family qbk's diff-in-diff and
    // qfo's stratified ATE belong to. Group moments are exact DECIMAL
    // / integer sums; the three ratios are the only float ops.
    "qgn_iv_wald" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem").groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("nl"))
        val o = t(s, dir, "orders")
          .join(li, col("o_orderkey") === col("l_orderkey"), "left")
          .select(
            when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)
              .as("z"),
            coalesce(col("nl"), lit(0L)).as("x"),
            (col("o_totalprice").cast("decimal(18,2)") / lit(1000000))
              .cast("decimal(18,8)").as("y"))
        val g = o.groupBy(col("z"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("y")).as("sy"))
        val z1 = g.filter(col("z") === 1)
          .select(col("n").as("n1"), col("sx").as("sx1"),
            col("sy").as("sy1"))
        val z0 = g.filter(col("z") === 0)
          .select(col("n").as("n0"), col("sx").as("sx0"),
            col("sy").as("sy0"))
        z1.crossJoin(broadcast(z0))
          .select(col("n1"), col("n0"),
            (col("sy1").cast("double") / col("n1").cast("double") -
              col("sy0").cast("double") / col("n0").cast("double"))
              .as("rf"),
            (col("sx1").cast("double") / col("n1").cast("double") -
              col("sx0").cast("double") / col("n0").cast("double"))
              .as("fs"))
          .select(col("n1").as("n_urgent"), col("n0").as("n_other"),
            (round(col("rf"), 8) + lit(0.0)).as("reduced_form_m"),
            (round(col("fs"), 8) + lit(0.0)).as("first_stage_lines"),
            (round(col("rf") / col("fs"), 8) + lit(0.0))
              .as("wald_iv_m_per_line"))
      },
      oracle = Some("""
        WITH li AS (
          SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS nl
          FROM lineitem GROUP BY 1),
        o AS (
          SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
                   AS z,
                 COALESCE(nl, 0) AS x,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) / 1000000
                   AS DECIMAL(18,8)) AS y
          FROM orders LEFT JOIN li ON o_orderkey = l_orderkey),
        g AS (
          SELECT z, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx, SUM(y) AS sy
          FROM o GROUP BY 1),
        f AS (
          SELECT z1.n AS n1, z0.n AS n0,
                 CAST(z1.sy AS DOUBLE) / CAST(z1.n AS DOUBLE) -
                   CAST(z0.sy AS DOUBLE) / CAST(z0.n AS DOUBLE) AS rf,
                 CAST(z1.sx AS DOUBLE) / CAST(z1.n AS DOUBLE) -
                   CAST(z0.sx AS DOUBLE) / CAST(z0.n AS DOUBLE) AS fs
          FROM (SELECT * FROM g WHERE z = 1) z1
          CROSS JOIN (SELECT * FROM g WHERE z = 0) z0)
        SELECT n1 AS n_urgent, n0 AS n_other,
               ROUND(rf, 8) + CAST(0 AS DOUBLE) AS reduced_form_m,
               ROUND(fs, 8) + CAST(0 AS DOUBLE) AS first_stage_lines,
               ROUND(rf / fs, 8) + CAST(0 AS DOUBLE)
                 AS wald_iv_m_per_line
        FROM f""")),

    // Sharp regression discontinuity at account balance 0 (the
    // "delinquent" cutoff): local linear fits on each side within a
    // ±1000 bandwidth, outcome = orders per customer; the jump of the
    // two intercepts at the cutoff is the RD effect — the
    // quasi-experimental design the causal family still lacked.
    // Balances are exact DECIMAL(18,2) regressors scaled to O(1);
    // each side's OLS rides the 9-grid moment sums.
    "qgo_regression_discontinuity" -> Q(
      fn = (s, dir) => {
        val ord = t(s, dir, "orders").groupBy(col("o_custkey"))
          .agg(count(lit(1)).as("no"))
        val cst = t(s, dir, "customer")
          .join(ord, col("c_custkey") === col("o_custkey"), "left")
          .select(col("c_acctbal").cast("decimal(18,2)").as("bal"),
            coalesce(col("no"), lit(0L)).as("y"))
          .filter(col("bal") >= -1000 && col("bal") < 1000)
          .select(when(col("bal") >= 0, lit("right")).otherwise(lit("left"))
            .as("side"),
            (col("bal").cast("double") / 1000).as("x"),
            col("y").cast("double").as("y"))
        val mom = cst.groupBy(col("side"))
          .agg(count(lit(1)).as("n"), sum(g9(col("x"))).as("sx"),
            sum(g9(col("y"))).as("sy"),
            sum(g9(col("x") * col("x"))).as("sxx"),
            sum(g9(col("x") * col("y"))).as("sxy"))
          .select(col("side"), col("n"),
            col("n").cast("double").as("nd"),
            col("sx").cast("double").as("sxd"),
            col("sy").cast("double").as("syd"),
            col("sxx").cast("double").as("sxxd"),
            col("sxy").cast("double").as("sxyd"))
          .select(col("side"), col("n"),
            ((col("nd") * col("sxyd") - col("sxd") * col("syd")) /
              (col("nd") * col("sxxd") - col("sxd") * col("sxd")))
              .as("b"),
            col("nd"), col("sxd"), col("syd"))
          .select(col("side"), col("n"), col("b"),
            ((col("syd") - col("b") * col("sxd")) / col("nd")).as("a"))
          .localCheckpoint(eager = false)
        val l = mom.filter(col("side") === "left")
          .select(col("n").as("n_left"), col("a").as("al"),
            col("b").as("bl"))
        val r = mom.filter(col("side") === "right")
          .select(col("n").as("n_right"), col("a").as("ar"),
            col("b").as("br"))
        l.crossJoin(broadcast(r))
          .select(col("n_left"), col("n_right"),
            (round(col("al"), 6) + lit(0.0)).as("intercept_left"),
            (round(col("ar"), 6) + lit(0.0)).as("intercept_right"),
            (round(col("bl"), 6) + lit(0.0)).as("slope_left"),
            (round(col("br"), 6) + lit(0.0)).as("slope_right"),
            (round(col("ar") - col("al"), 6) + lit(0.0))
              .as("rd_effect_orders"))
      },
      oracle = Some("""
        WITH ord AS (
          SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS no
          FROM orders GROUP BY 1),
        cst AS (
          SELECT CASE WHEN bal >= 0 THEN 'right' ELSE 'left' END AS side,
                 CAST(bal AS DOUBLE) / 1000 AS x,
                 CAST(y AS DOUBLE) AS y
          FROM (
            SELECT CAST(c_acctbal AS DECIMAL(18,2)) AS bal,
                   COALESCE(no, 0) AS y
            FROM customer LEFT JOIN ord ON c_custkey = o_custkey)
          WHERE bal >= -1000 AND bal < 1000),
        mom AS MATERIALIZED (
          SELECT side, n, b, (syd - b * sxd) / nd AS a
          FROM (
            SELECT side, n, nd, sxd, syd,
                   (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd) AS b
            FROM (
              SELECT side, n, CAST(n AS DOUBLE) AS nd,
                     CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
                     CAST(sxx AS DOUBLE) AS sxxd,
                     CAST(sxy AS DOUBLE) AS sxyd
              FROM (
                SELECT side, CAST(COUNT(*) AS BIGINT) AS n,
                       SUM(CAST(ROUND(x, 9) AS DECIMAL(20,9))) AS sx,
                       SUM(CAST(ROUND(y, 9) AS DECIMAL(20,9))) AS sy,
                       SUM(CAST(ROUND(x * x, 9) AS DECIMAL(20,9))) AS sxx,
                       SUM(CAST(ROUND(x * y, 9) AS DECIMAL(20,9))) AS sxy
                FROM cst GROUP BY 1))))
        SELECT l.n AS n_left, r.n AS n_right,
               ROUND(l.a, 6) + CAST(0 AS DOUBLE) AS intercept_left,
               ROUND(r.a, 6) + CAST(0 AS DOUBLE) AS intercept_right,
               ROUND(l.b, 6) + CAST(0 AS DOUBLE) AS slope_left,
               ROUND(r.b, 6) + CAST(0 AS DOUBLE) AS slope_right,
               ROUND(r.a - l.a, 6) + CAST(0 AS DOUBLE)
                 AS rd_effect_orders
        FROM (SELECT * FROM mom WHERE side = 'left') l
        CROSS JOIN (SELECT * FROM mom WHERE side = 'right') r""")),

    // Baxter-King bandpass filter (pass band 4-16 days, K=8 taps per
    // side) over the 30-day event-count series: ideal-filter sinc
    // weights w_k = (sin(ω₂k) − sin(ω₁k))/(πk) with args reduced mod
    // 2π and 9-snapped BEFORE the trig call (the qca/qcd lesson —
    // large-arg libm reduction diverges, reduced-arg sin is
    // engine-identical), then the zero-sum adjustment, applied through
    // the day-offset equality join. Extracts the business-cycle
    // component qaw's seasonal decomposition leaves mixed into its
    // trend.
    "qgp_baxter_king" -> Q(
      fn = (s, dir) => {
        val d = t(s, dir, "events")
          .groupBy(expr("CAST(unix_millis(ts) div 86400000 AS BIGINT)")
            .as("day"))
          .agg(count(lit(1)).cast("double").as("y"))
          .localCheckpoint(eager = false)
        // raw weights for |k| = 0..8; w0 = 2/4 - 2/16 = 0.375 exactly
        val wk = s.range(0, 9).select(col("id").as("k"))
          .select(col("k"),
            when(col("k") === 0, lit(0.375))
              .otherwise(g9((sin(round(lit(6.283185307179586) *
                pmod(col("k"), lit(4L)).cast("double") / 4, 9)) -
                sin(round(lit(6.283185307179586) *
                  col("k").cast("double") / 16, 9))) /
                (lit(3.141592653589793) * col("k").cast("double")))
                .cast("double")).as("w"))
          .localCheckpoint(eager = false)
        val adj = wk.agg((-(sum(when(col("k") === 0, col("w"))
          .otherwise(col("w") * 2))) / 17).as("theta"))
        val wadj = wk.crossJoin(broadcast(adj))
          .select(col("k"), (col("w") + col("theta")).as("w"))
        val taps = d.select(col("day").as("t_day"),
          explode(sequence(lit(-8L), lit(8L))).as("off"))
          .select(col("t_day"), col("off"),
            (col("t_day") + col("off")).as("day"),
            abs(col("off")).as("k"))
          .join(d, Seq("day"))
          .join(broadcast(wadj), Seq("k"))
        taps.groupBy(col("t_day"))
          .agg(count(lit(1)).as("ntap"),
            sum(g9(col("w") * col("y"))).as("cyc"),
            max(when(col("off") === 0, col("y"))).as("yy"))
          .filter(col("ntap") === 17)
          .select(col("t_day").as("day"), col("yy").cast("long").as("y"),
            (round(col("cyc").cast("double"), 6) + lit(0.0)).as("cycle"))
          .orderBy(col("day"))
      },
      oracle = Some("""
        WITH d AS MATERIALIZED (
          SELECT CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
                 CAST(COUNT(*) AS DOUBLE) AS y
          FROM events GROUP BY 1),
        wk AS (
          SELECT k,
                 CASE WHEN k = 0 THEN CAST(0.375 AS DOUBLE)
                 ELSE CAST(CAST(ROUND((sin(ROUND(6.283185307179586 *
                   CAST(k % 4 AS DOUBLE) / 4, 9)) -
                   sin(ROUND(6.283185307179586 * CAST(k AS DOUBLE) / 16,
                     9))) / (3.141592653589793 * CAST(k AS DOUBLE)), 9)
                   AS DECIMAL(20,9)) AS DOUBLE) END AS w
          FROM (SELECT CAST(r.range AS BIGINT) AS k FROM range(0, 9) r)),
        adj AS (
          SELECT -(SUM(CASE WHEN k = 0 THEN w ELSE w * 2 END)) / 17
                   AS theta
          FROM wk),
        wadj AS (
          SELECT k, w + theta AS w FROM wk CROSS JOIN adj),
        taps AS (
          SELECT t.day AS t_day, o.off,
                 abs(o.off) AS k, d2.y,
                 CASE WHEN o.off = 0 THEN d2.y END AS y0
          FROM d t
          CROSS JOIN (SELECT CAST(r.range AS BIGINT) AS off
                      FROM range(-8, 9) r) o
          JOIN d d2 ON d2.day = t.day + o.off),
        agg AS (
          SELECT t_day, CAST(COUNT(*) AS BIGINT) AS ntap,
                 SUM(CAST(ROUND(w * y, 9) AS DECIMAL(20,9))) AS cyc,
                 CAST(MAX(y0) AS BIGINT) AS y
          FROM taps JOIN wadj USING (k)
          GROUP BY 1)
        SELECT t_day AS day, y,
               ROUND(CAST(cyc AS DOUBLE), 6) + CAST(0 AS DOUBLE) AS cycle
        FROM agg WHERE ntap = 17 ORDER BY day""")),

    // Mean cumulative function for recurrent purchase events with
    // staggered entry (each user enters observation at their first
    // event): MCF(t) = Σ_{s≤t} d(s)/n(s) with the risk set growing as
    // users enroll — the recurrent-events counterpart of q7a's
    // single-event Kaplan-Meier (expected cumulative purchases per
    // user-under-observation, the warranty-claims / repeat-orders
    // curve). Increments are exact-integer ratios on the 9-grid; the
    // risk set is one cumulative scan, never an inequality join.
    "qgq_mcf_recurrent" -> Q(
      fn = (s, dir) => {
        val ev = t(s, dir, "events")
          .select(col("user_id"),
            expr("CAST(unix_millis(ts) div 86400000 AS BIGINT)").as("day"),
            col("event_type"))
          .localCheckpoint(eager = false)
        val entry = ev.groupBy(col("user_id")).agg(min(col("day")).as("u0"))
          .groupBy(col("u0")).agg(count(lit(1)).as("enr"))
        val days = ev.select(col("day")).distinct()
        val wc = Window.orderBy(col("day"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val risk = days
          .join(entry.select(col("u0").as("day"), col("enr")), Seq("day"),
            "left")
          .select(col("day"), coalesce(col("enr"), lit(0L)).as("enr"))
          .select(col("day"), sum(col("enr")).over(wc).as("nobs"))
        val d = ev.filter(col("event_type") === "purchase")
          .groupBy(col("day")).agg(count(lit(1)).as("dp"))
        risk.join(d, Seq("day"), "left")
          .select(col("day"), col("nobs"),
            coalesce(col("dp"), lit(0L)).as("dp"))
          .select(col("day"), col("nobs"), col("dp"),
            g9(col("dp").cast("double") / col("nobs").cast("double"))
              .as("inc"))
          .select(col("day"), col("nobs"), col("dp"),
            round(sum(col("inc")).over(wc).cast("double"), 6).as("mcf"))
          .orderBy(col("day"))
      },
      oracle = Some("""
        WITH ev AS MATERIALIZED (
          SELECT user_id, CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
                 event_type
          FROM events),
        entry AS (
          SELECT u0, CAST(COUNT(*) AS BIGINT) AS enr
          FROM (SELECT user_id, MIN(day) AS u0 FROM ev GROUP BY 1)
          GROUP BY 1),
        days AS (SELECT DISTINCT day FROM ev),
        risk AS (
          SELECT day,
                 CAST(SUM(COALESCE(enr, 0)) OVER (ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS nobs
          FROM days LEFT JOIN entry ON entry.u0 = days.day),
        d AS (
          SELECT day, CAST(COUNT(*) AS BIGINT) AS dp
          FROM ev WHERE event_type = 'purchase' GROUP BY 1),
        inc AS (
          SELECT risk.day, nobs, COALESCE(dp, 0) AS dp,
                 CAST(ROUND(CAST(COALESCE(dp, 0) AS DOUBLE) /
                   CAST(nobs AS DOUBLE), 9) AS DECIMAL(20,9)) AS inc
          FROM risk LEFT JOIN d ON d.day = risk.day)
        SELECT day, nobs, dp,
               ROUND(CAST(SUM(inc) OVER (ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                 AS DOUBLE), 6) AS mcf
        FROM inc ORDER BY day""")),

    // Tukey biweight one-step M-estimate of the typical order value:
    // EXACT global median and MAD (both even-count medians taken as
    // the exact DECIMAL mean of the two middle order statistics via
    // the distributed globalRowNumber primitive — no interpolating
    // percentile whose semantics could differ between engines), then
    // bisquare weights w = (1-u²)² at tuning 9·MAD — the
    // high-breakdown location estimate beside q6c's winsorized means
    // (winsorizing clips at fixed percentiles; the biweight
    // down-weights smoothly and rejects gross outliers entirely).
    "qgr_biweight_mean" -> Q(
      fn = (s, dir) => {
        val x = t(s, dir, "orders")
          .select(col("o_orderkey"),
            (col("o_totalprice").cast("decimal(18,2)") / lit(1000000))
              .cast("decimal(18,8)").as("x"))
        val rx = graft.operators.ScaleOps.globalRowNumber(x,
          Seq(col("x"), col("o_orderkey")), "rk")
          .localCheckpoint(eager = false)
        val n0 = rx.agg(count(lit(1)).as("n"))
        val med = rx.crossJoin(broadcast(n0))
          .filter(col("rk") === expr("n div 2") ||
            col("rk") === expr("n div 2 + 1"))
          .agg((sum(col("x")) * lit(0.5).cast("decimal(2,1)")).as("med"))
        val dev = x.crossJoin(broadcast(med))
          .select(col("o_orderkey"), col("x"),
            abs(col("x") - col("med")).as("ad"), col("med"))
          .localCheckpoint(eager = false)
        val rd = graft.operators.ScaleOps.globalRowNumber(
          dev.select(col("o_orderkey"), col("ad")),
          Seq(col("ad"), col("o_orderkey")), "rk")
        val mad = rd.crossJoin(broadcast(n0))
          .filter(col("rk") === expr("n div 2") ||
            col("rk") === expr("n div 2 + 1"))
          .agg((sum(col("ad")) * lit(0.5).cast("decimal(2,1)")).as("mad"))
        val wts = dev.crossJoin(broadcast(mad))
          .select(col("x"), col("med"), col("mad"),
            (abs(col("x") - col("med")).cast("double") /
              (lit(9.0) * col("mad").cast("double"))).as("u"))
          .select(col("x"), col("med"), col("mad"),
            when(col("u") < 1,
              (lit(1.0) - col("u") * col("u")) *
                (lit(1.0) - col("u") * col("u")))
              .otherwise(lit(0.0)).as("w"))
        wts.groupBy(col("med"), col("mad"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("w") > 0, 1L).otherwise(0L)).as("n_used"),
            sum(g9(col("w") * col("x").cast("double"))).as("swx"),
            sum(g9(col("w"))).as("sw"))
          .select(col("n"), col("n_used"),
            round(col("med").cast("double"), 6).as("median_m"),
            round(col("mad").cast("double"), 6).as("mad_m"),
            round(col("swx").cast("double") / col("sw").cast("double"), 6)
              .as("biweight_mean_m"))
      },
      oracle = Some("""
        WITH x AS MATERIALIZED (
          SELECT o_orderkey,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) / 1000000
                   AS DECIMAL(18,8)) AS x
          FROM orders),
        n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM x),
        med AS (
          SELECT SUM(x) * 0.5 AS med
          FROM (SELECT x, ROW_NUMBER() OVER (ORDER BY x, o_orderkey)
                  AS rk FROM x) CROSS JOIN n0
          WHERE rk = n // 2 OR rk = n // 2 + 1),
        dev AS MATERIALIZED (
          SELECT o_orderkey, x, abs(x - med) AS ad, med
          FROM x CROSS JOIN med),
        mad AS (
          SELECT SUM(ad) * 0.5 AS mad
          FROM (SELECT ad, ROW_NUMBER() OVER (ORDER BY ad, o_orderkey)
                  AS rk FROM dev) CROSS JOIN n0
          WHERE rk = n // 2 OR rk = n // 2 + 1),
        wts AS (
          SELECT x, med, mad,
                 CASE WHEN u < 1 THEN (1 - u * u) * (1 - u * u)
                      ELSE CAST(0 AS DOUBLE) END AS w
          FROM (
            SELECT x, med, mad,
                   CAST(abs(x - med) AS DOUBLE) /
                     (CAST(9 AS DOUBLE) * CAST(mad AS DOUBLE)) AS u
            FROM dev CROSS JOIN mad))
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN w > 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_used,
               ROUND(CAST(MAX(med) AS DOUBLE), 6) AS median_m,
               ROUND(CAST(MAX(mad) AS DOUBLE), 6) AS mad_m,
               ROUND(CAST(SUM(CAST(ROUND(w * CAST(x AS DOUBLE), 9)
                 AS DECIMAL(20,9))) AS DOUBLE) /
                 CAST(SUM(CAST(ROUND(w, 9) AS DECIMAL(20,9))) AS DOUBLE),
                 6) AS biweight_mean_m
        FROM wts""")),

    // Baron-Kenny mediation decomposition: does urgent priority (X)
    // move order value (Y) through line count (M)? Path a (X→M), path
    // b (M→Y holding X), total effect c, direct effect c′, indirect
    // a·b and the proportion mediated — the 2-covariate OLS solved in
    // closed form by Cramer's rule over EXACT moment images (binary X
    // makes every cross-moment a conditional sum: integers and
    // DECIMALs, no per-row float at all until the final ratios).
    "qgs_mediation" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem").groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("nl"))
        val o = t(s, dir, "orders")
          .join(li, col("o_orderkey") === col("l_orderkey"), "left")
          .select(
            when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)
              .as("x"),
            coalesce(col("nl"), lit(0L)).as("m"),
            (col("o_totalprice").cast("decimal(18,2)") / lit(1000000))
              .cast("decimal(18,8)").as("y"))
        val mm = o.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("m")).as("sm"), sum(col("y")).as("sy"),
          sum(col("x") * col("m")).as("sxm"),
          sum(when(col("x") === 1, col("y"))
            .otherwise(lit(0).cast("decimal(18,8)"))).as("sxy"),
          sum(col("m") * col("y")).as("smy"),
          sum(col("m") * col("m")).as("smm"))
        val cv = mm.select(
          col("n").cast("double").as("nd"),
          col("sx").cast("double").as("sxd"),
          col("sm").cast("double").as("smd"),
          col("sy").cast("double").as("syd"),
          col("sxm").cast("double").as("sxmd"),
          col("sxy").cast("double").as("sxyd"),
          col("smy").cast("double").as("smyd"),
          col("smm").cast("double").as("smmd"))
          .select(
            (col("nd") * col("sxmd") - col("sxd") * col("smd")).as("cxm"),
            (col("nd") * col("sxyd") - col("sxd") * col("syd")).as("cxy"),
            (col("nd") * col("smyd") - col("smd") * col("syd")).as("cmy"),
            (col("nd") * col("sxd") - col("sxd") * col("sxd")).as("vx"),
            (col("nd") * col("smmd") - col("smd") * col("smd")).as("vm"))
        cv.select(
          (col("cxm") / col("vx")).as("a"),
          ((col("vx") * col("cmy") - col("cxm") * col("cxy")) /
            (col("vx") * col("vm") - col("cxm") * col("cxm"))).as("b"),
          (col("cxy") / col("vx")).as("c"),
          ((col("vm") * col("cxy") - col("cxm") * col("cmy")) /
            (col("vx") * col("vm") - col("cxm") * col("cxm"))).as("cp"))
          .select(
            (round(col("a"), 6) + lit(0.0)).as("path_a_lines"),
            (round(col("b"), 8) + lit(0.0)).as("path_b_m_per_line"),
            (round(col("c"), 8) + lit(0.0)).as("total_effect_m"),
            (round(col("cp"), 8) + lit(0.0)).as("direct_effect_m"),
            (round(col("a") * col("b"), 8) + lit(0.0))
              .as("indirect_effect_m"),
            (round(col("a") * col("b") / col("c"), 6) + lit(0.0))
              .as("prop_mediated"))
      },
      oracle = Some("""
        WITH li AS (
          SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS nl
          FROM lineitem GROUP BY 1),
        o AS (
          SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
                   AS x,
                 COALESCE(nl, 0) AS m,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) / 1000000
                   AS DECIMAL(18,8)) AS y
          FROM orders LEFT JOIN li ON o_orderkey = l_orderkey),
        mm AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(m) AS BIGINT) AS sm,
                 SUM(y) AS sy,
                 CAST(SUM(x * m) AS BIGINT) AS sxm,
                 SUM(CASE WHEN x = 1 THEN y
                     ELSE CAST(0 AS DECIMAL(18,8)) END) AS sxy,
                 SUM(m * y) AS smy,
                 CAST(SUM(m * m) AS BIGINT) AS smm
          FROM o),
        cv AS (
          SELECT nd * sxmd - sxd * smd AS cxm,
                 nd * sxyd - sxd * syd AS cxy,
                 nd * smyd - smd * syd AS cmy,
                 nd * sxd - sxd * sxd AS vx,
                 nd * smmd - smd * smd AS vm
          FROM (
            SELECT CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
                   CAST(sm AS DOUBLE) AS smd, CAST(sy AS DOUBLE) AS syd,
                   CAST(sxm AS DOUBLE) AS sxmd,
                   CAST(sxy AS DOUBLE) AS sxyd,
                   CAST(smy AS DOUBLE) AS smyd,
                   CAST(smm AS DOUBLE) AS smmd
            FROM mm)),
        paths AS (
          SELECT cxm / vx AS a,
                 (vx * cmy - cxm * cxy) / (vx * vm - cxm * cxm) AS b,
                 cxy / vx AS c,
                 (vm * cxy - cxm * cmy) / (vx * vm - cxm * cxm) AS cp
          FROM cv)
        SELECT ROUND(a, 6) + CAST(0 AS DOUBLE) AS path_a_lines,
               ROUND(b, 8) + CAST(0 AS DOUBLE) AS path_b_m_per_line,
               ROUND(c, 8) + CAST(0 AS DOUBLE) AS total_effect_m,
               ROUND(cp, 8) + CAST(0 AS DOUBLE) AS direct_effect_m,
               ROUND(a * b, 8) + CAST(0 AS DOUBLE) AS indirect_effect_m,
               ROUND(a * b / c, 6) + CAST(0 AS DOUBLE) AS prop_mediated
        FROM paths""")),

    // Engle's ARCH LM test on the daily-revenue series: are squared
    // deviations from the mean autocorrelated (volatility clustering)?
    // Regress e²ₜ on e²ₜ₋₁, LM = n·R² ~ χ²(1). Deviations and squares
    // snap to the 9-grid per CLAUDE.md rule 15 (products of two 9-grid
    // factors round safely at 9); all regression moments are
    // DECIMAL(20,9) sums; the final R²/LM is pure ×−÷ on identical
    // doubles. The conditional-heteroskedasticity companion to qb3's
    // Ljung–Box (which tests the LEVELS).
    "qgt_arch_lm" -> Q(
      fn = (s, dir) => {
        val y = dailyRevenueM(s, dir)
        val mu = y.agg(count(lit(1)).as("n"),
            sum(col("ym")).as("sy"))
          .select(col("n"),
            round(col("sy").cast("double") / col("n").cast("double"), 9)
              .as("mu"))
        val u = y.crossJoin(broadcast(mu))
          .select(col("day"),
            round(col("ym").cast("double") - col("mu"), 9).as("e"))
          .select(col("day"), round(col("e") * col("e"), 9).as("u"))
        val w = Window.orderBy("day")
        val p = u.withColumn("x", lag("u", 1).over(w))
          .filter(col("x").isNotNull)
        val m = p.agg(count(lit(1)).as("n2"),
          sum(g9(col("x"))).as("sx"), sum(g9(col("u"))).as("sy2"),
          sum(g9(round(col("x") * col("u"), 9))).as("sxy"),
          sum(g9(round(col("x") * col("x"), 9))).as("sxx"),
          sum(g9(round(col("u") * col("u"), 9))).as("syy"))
        m.select(col("n2").cast("double").as("nd"),
            col("sx").cast("double").as("sxd"),
            col("sy2").cast("double").as("syd"),
            col("sxy").cast("double").as("sxyd"),
            col("sxx").cast("double").as("sxxd"),
            col("syy").cast("double").as("syyd"), col("n2"))
          .select(col("n2").as("n_obs"),
            (col("nd") * col("sxyd") - col("sxd") * col("syd")).as("cxy"),
            (col("nd") * col("sxxd") - col("sxd") * col("sxd")).as("vx"),
            (col("nd") * col("syyd") - col("syd") * col("syd")).as("vy"),
            col("nd"))
          .select(col("n_obs"),
            (round(col("cxy") / col("vx"), 6) + lit(0.0)).as("arch_slope"),
            (round(col("nd") * col("cxy") * col("cxy") /
              (col("vx") * col("vy")), 6) + lit(0.0)).as("lm_stat"),
            when(col("nd") * col("cxy") * col("cxy") /
              (col("vx") * col("vy")) > lit(3.841459), 1)
              .otherwise(0).cast("int").as("reject_5pct"))
      },
      oracle = Some(s"""
        WITH y AS ($dailyRevenueMSql),
        mu AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 ROUND(CAST(SUM(ym) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
                   9) AS mu
          FROM y),
        u AS (
          SELECT day, ROUND(e * e, 9) AS u
          FROM (SELECT day, ROUND(CAST(ym AS DOUBLE) - mu, 9) AS e
                FROM y CROSS JOIN mu)),
        p AS (
          SELECT * FROM (
            SELECT u, LAG(u, 1) OVER (ORDER BY day) AS x FROM u)
          WHERE x IS NOT NULL),
        m AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n2,
                 SUM(CAST(ROUND(x, 9) AS DECIMAL(20,9))) AS sx,
                 SUM(CAST(ROUND(u, 9) AS DECIMAL(20,9))) AS sy2,
                 SUM(CAST(ROUND(x * u, 9) AS DECIMAL(20,9))) AS sxy,
                 SUM(CAST(ROUND(x * x, 9) AS DECIMAL(20,9))) AS sxx,
                 SUM(CAST(ROUND(u * u, 9) AS DECIMAL(20,9))) AS syy
          FROM p),
        cv AS (
          SELECT n2, nd,
                 nd * sxyd - sxd * syd AS cxy,
                 nd * sxxd - sxd * sxd AS vx,
                 nd * syyd - syd * syd AS vy
          FROM (
            SELECT n2, CAST(n2 AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
                   CAST(sy2 AS DOUBLE) AS syd, CAST(sxy AS DOUBLE) AS sxyd,
                   CAST(sxx AS DOUBLE) AS sxxd, CAST(syy AS DOUBLE) AS syyd
            FROM m))
        SELECT n2 AS n_obs,
               ROUND(cxy / vx, 6) + CAST(0 AS DOUBLE) AS arch_slope,
               ROUND(nd * cxy * cxy / (vx * vy), 6) + CAST(0 AS DOUBLE)
                 AS lm_stat,
               CAST(CASE WHEN nd * cxy * cxy / (vx * vy)
                 > CAST(3.841459 AS DOUBLE) THEN 1 ELSE 0 END AS INT)
                 AS reject_5pct
        FROM cv""")),

    // Quantile treatment effects: the urgent-priority order-value
    // distribution against all other priorities, compared decile by
    // decile — where in the distribution does urgency move value, not
    // just at the mean (q7n's t-test view). Per-group exact type-1
    // quantiles via the skew-proof weightedQuantiles primitive (the q9e
    // recipe: grouped running sum, no global window); the effects are
    // exact DECIMAL differences of order statistics.
    "qgu_quantile_treatment" -> Q(
      fn = (s, dir) => {
        val o = t(s, dir, "orders")
          .select(
            when(col("o_orderpriority") === "1-URGENT", "urgent")
              .otherwise("other").as("grp"),
            col("o_totalprice").cast("decimal(18,2)").as("v"),
            col("o_orderkey"),
            lit(java.math.BigDecimal.ONE).cast("decimal(18,2)").as("w"))
        val pm = (1 to 9).map(_ * 100)
        val qs = graft.operators.Stats.weightedQuantiles(o, Seq("grp"),
          col("v"), col("w"), pm, Seq(col("o_orderkey")))
        val urg = qs.filter(col("grp") === "urgent")
          .select(pm.map(q => col(s"wq_$q").as(s"t_$q")): _*)
        val oth = qs.filter(col("grp") === "other")
          .select(pm.map(q => col(s"wq_$q").as(s"c_$q")): _*)
        val stacked = pm.map(q => s"$q, t_$q, c_$q").mkString(", ")
        urg.crossJoin(broadcast(oth))
          .select(expr(s"stack(9, $stacked) AS (per_mille, qt, qc)"))
          .select(col("per_mille").cast("int").as("per_mille"),
            col("qt").cast("double").as("q_treated"),
            col("qc").cast("double").as("q_control"),
            (col("qt") - col("qc")).cast("double").as("qte"))
          .orderBy("per_mille")
      },
      oracle = Some({
        val qsel = (1 to 9).map(q =>
          s"MIN(CASE WHEN cumw * 1000 >= totw * ${q * 100} THEN v END) AS wq_${q * 100}")
          .mkString(",\n                 ")
        val rows = (1 to 9).map(q =>
          s"""SELECT CAST(${q * 100} AS INT) AS per_mille,
             |       CAST(u.wq_${q * 100} AS DOUBLE) AS q_treated,
             |       CAST(o.wq_${q * 100} AS DOUBLE) AS q_control,
             |       CAST(u.wq_${q * 100} - o.wq_${q * 100} AS DOUBLE) AS qte
             |FROM u CROSS JOIN o""".stripMargin).mkString("\n        UNION ALL\n        ")
        s"""
        WITH l AS (
          SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 'urgent'
                      ELSE 'other' END AS grp,
                 CAST(o_totalprice AS DECIMAL(18,2)) AS v,
                 CAST(1 AS DECIMAL(18,2)) AS w, o_orderkey
          FROM orders),
        c AS (
          SELECT *,
                 SUM(w) OVER (PARTITION BY grp ORDER BY v, o_orderkey
                   ROWS UNBOUNDED PRECEDING) AS cumw,
                 SUM(w) OVER (PARTITION BY grp) AS totw
          FROM l),
        q AS (
          SELECT grp,
                 $qsel
          FROM c GROUP BY 1),
        u AS (SELECT * FROM q WHERE grp = 'urgent'),
        o AS (SELECT * FROM q WHERE grp = 'other')
        $rows
        ORDER BY per_mille"""
      })),

    // Theta-method forecast (Assimakopoulos & Nikolopoulos) of daily
    // purchase revenue: the classical theta(0,2) decomposition — a
    // closed-form OLS trend line plus simple exponential smoothing of
    // the theta-2 line (2yₜ − trendₜ), combined half-and-half at each
    // horizon. The SES level walks the q7d fold recipe (ordered
    // aggregate, per-step ROUND 9, LIST accumulator on the DuckDB
    // side); trend moments are exact DECIMAL/integer sums.
    "qgx_theta_forecast" -> Q(
      fn = (s, dir) => {
        val d0 = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(expr("unix_millis(ts) div 86400000").as("day"))
          .agg(sum(col("value").cast("decimal(18,2)")).as("yv"))
        val d = d0.withColumn("t",
          row_number().over(Window.orderBy("day")).cast("long"))
        val mm = d.agg(count(lit(1)).as("n"), sum(col("t")).as("st"),
          sum(col("yv")).as("sy"), sum(col("t") * col("t")).as("stt"),
          sum(col("t").cast("decimal(18,2)") * col("yv")).as("sty"))
        val ab = mm.select(col("n"),
            ((col("n").cast("double") * col("sty").cast("double") -
              col("st").cast("double") * col("sy").cast("double")) /
              (col("n").cast("double") * col("stt").cast("double") -
                col("st").cast("double") * col("st").cast("double")))
              .as("b"), col("st"), col("sy"))
          .select(col("n"), col("b"),
            ((col("sy").cast("double") - col("b") * col("st").cast("double"))
              / col("n").cast("double")).as("a"))
        val th = d.crossJoin(broadcast(ab))
          .select(col("t"), col("n"), col("a"), col("b"),
            round(lit(2.0) * col("yv").cast("double") -
              (col("a") + col("b") * col("t").cast("double")), 9).as("d2"))
        val folded = th.groupBy(col("n"), col("a"), col("b"))
          .agg(expr("transform(array_sort(collect_list(struct(t, d2))), x -> x.d2)")
            .as("ds"))
          .select(col("n"), col("a"), col("b"),
            expr("aggregate(slice(ds, 2, size(ds) - 1), element_at(ds, 1)," +
              " (acc, x) -> round(0.5d * x + 0.5d * acc, 9))").as("lvl"))
        folded.select(col("n"), col("a"), col("b"), col("lvl"),
            explode(expr("sequence(1, 7)")).as("h"))
          .select(col("h").cast("int").as("h"), col("n").as("n_obs"),
            (round(col("lvl"), 6) + lit(0.0)).as("ses_level"),
            (round(col("b"), 6) + lit(0.0)).as("trend_slope"),
            (round(lit(0.5) * (col("a") + col("b") *
              (col("n") + col("h")).cast("double")) +
              lit(0.5) * col("lvl"), 6) + lit(0.0)).as("forecast"))
          .orderBy("h")
      },
      oracle = Some("""
        WITH d0 AS (
          SELECT epoch_ms(ts) // 86400000 AS day,
                 SUM(CAST(value AS DECIMAL(18,2))) AS yv
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        d AS (
          SELECT day, yv,
                 CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS t
          FROM d0),
        mm AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(t) AS BIGINT) AS st, SUM(yv) AS sy,
                 CAST(SUM(t * t) AS BIGINT) AS stt,
                 SUM(CAST(t AS DECIMAL(18,2)) * yv) AS sty
          FROM d),
        ab AS (
          SELECT n, b,
                 (CAST(sy AS DOUBLE) - b * CAST(st AS DOUBLE))
                   / CAST(n AS DOUBLE) AS a
          FROM (
            SELECT n, st, sy,
                   (CAST(n AS DOUBLE) * CAST(sty AS DOUBLE)
                     - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE)) /
                   (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
                     - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)) AS b
            FROM mm)),
        th AS (
          SELECT n, a, b,
                 list(ROUND(CAST(2 AS DOUBLE) * CAST(yv AS DOUBLE)
                   - (a + b * CAST(t AS DOUBLE)), 9) ORDER BY t) AS ds
          FROM d CROSS JOIN ab GROUP BY 1, 2, 3),
        f AS (
          SELECT n, a, b,
                 list_reduce(ds,
                   (acc, x) -> ROUND(CAST(0.5 AS DOUBLE) * x
                     + CAST(0.5 AS DOUBLE) * acc, 9)) AS lvl
          FROM th)
        SELECT CAST(h AS INT) AS h, n AS n_obs,
               ROUND(lvl, 6) + CAST(0 AS DOUBLE) AS ses_level,
               ROUND(b, 6) + CAST(0 AS DOUBLE) AS trend_slope,
               ROUND(CAST(0.5 AS DOUBLE) * (a + b * CAST(n + h AS DOUBLE))
                 + CAST(0.5 AS DOUBLE) * lvl, 6) + CAST(0 AS DOUBLE)
                 AS forecast
        FROM f CROSS JOIN (SELECT unnest(range(1, 8)) AS h)
        ORDER BY h""")),

    // kth-nearest-neighbor distance outlier scores over the embedding
    // corpus (Ramaswamy et al.): score = cosine distance to the 5th
    // nearest neighbor, the classical distance-based outlier measure —
    // LOF's (qa8) non-density sibling. Exact tier via the map-side
    // top-k heap aggregator (≤k rows per partition shuffle, queries
    // broadcast); at corpus scale the candidate pool pre-restricts via
    // IVF/LSH (q3g/q34 machinery) exactly as hardNegatives documents.
    "qgy_knn_outlier" -> Q(
      fn = (s, dir) => {
        val e = t(s, dir, "embeddings")
        val q = e.select(col("vec_id").as("q_id"), col("embedding").as("qv"))
        val c = e.select(col("vec_id").as("c_id"), col("embedding").as("cv"))
        graft.operators.VectorSearch
          .knnJoinViaAggregator(q, c, "q_id", "qv", "c_id", "cv", k = 5)
          .filter(col("rn") === 5)
          .select(col("query_id").as("vec_id"),
            col("neighbor_id").as("nn5_id"),
            round(lit(1.0) - col("score"), 6).as("knn_dist"))
          .orderBy(col("knn_dist").desc, col("vec_id"))
          .limit(20)
      },
      oracle = Some("""
        WITH e AS (
          SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
        scored AS (
          SELECT a.vec_id AS q_id, b.vec_id AS c_id,
                 ROUND(CAST(list_cosine_similarity(b.v, a.v) AS DOUBLE), 6)
                   AS score
          FROM e a JOIN e b ON a.vec_id <> b.vec_id),
        r AS (
          SELECT q_id, c_id, score,
                 ROW_NUMBER() OVER (PARTITION BY q_id
                   ORDER BY score DESC, c_id) AS rn
          FROM scored)
        SELECT q_id AS vec_id, c_id AS nn5_id,
               ROUND(CAST(1 AS DOUBLE) - score, 6) AS knn_dist
        FROM r WHERE rn = 5
        ORDER BY knn_dist DESC, vec_id LIMIT 20""")),

    // Restricted mean residual life from the signup→purchase Kaplan–
    // Meier curve: at each hour of the life table, the expected
    // REMAINING hours to conversion given survival to that point,
    // integrating the KM step function out to the last observed time
    // (users without a later purchase are right-censored at the
    // observation window's end). S walks an ordered fold of 9-grid
    // factors (two-9-grid products round safely at 9, the q4b recipe)
    // carried as a growing-array accumulator so the whole PATH comes
    // back, not just the endpoint; the residual integral is a
    // DECIMAL window sum from the tail. The "how much longer" answer
    // q7a's survival curve and q6k's latency histogram don't give.
    "qgw_mean_residual_life" -> Q(
      fn = (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            unix_millis(col("ts")).as("ms"))
        val su = e.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min(col("ms")).as("sms"))
        val pu = e.filter(col("event_type") === "purchase")
          .join(su, "user_id")
          .filter(col("ms") >= col("sms"))
          .groupBy("user_id").agg(min(col("ms")).as("pms"))
        val mx = e.agg(max(col("ms")).as("mms"))
        val durs = su.join(pu, Seq("user_id"), "left")
          .crossJoin(broadcast(mx))
          .select(
            when(col("pms").isNotNull, 1L).otherwise(0L).as("ev"),
            when(col("pms").isNotNull,
              expr("(pms - sms) div 3600000"))
              .otherwise(expr("(mms - sms) div 3600000")).as("t"))
        val ntot = durs.agg(count(lit(1)).as("ntot"))
        val lt = durs.groupBy("t")
          .agg(sum(col("ev")).as("d"), count(lit(1)).as("m"))
        val cum = lt.crossJoin(broadcast(ntot))
          .withColumn("cm", sum(col("m")).over(
            Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)))
          .withColumn("nr", col("ntot") - (col("cm") - col("m")))
          .withColumn("f", round(lit(1.0) -
            col("d").cast("double") / col("nr").cast("double"), 9))
        // The KM fold multiplies two 9-grid factors — and f can be a
        // SHORT decimal like 0.5 (d=1, n=2 near the table's end), which
        // parks the exact product ON the digit-10 half boundary (t=330
        // at sf0.1 hit 0.0019999995): rule-15 territory, so the fold
        // runs in exact DECIMAL(18,9) with half-up ROUND in both
        // engines, never through a double product.
        val packed = cum.agg(expr(
          "array_sort(collect_list(struct(t, d, nr, f)))").as("rows"))
        val zipped = packed.select(expr(
          """explode(arrays_zip(
            |  transform(rows, x -> x.t),
            |  transform(rows, x -> x.d),
            |  transform(rows, x -> x.nr),
            |  slice(aggregate(
            |    transform(rows, x -> cast(x.f as decimal(18,9))),
            |    array(cast(1.0 as decimal(18,9))),
            |    (acc, fv) -> concat(acc,
            |      array(cast(round(element_at(acc, -1) * fv, 9)
            |        as decimal(18,9))))),
            |    2, size(rows)))) AS z""".stripMargin))
          .select(col("z.0").as("t"), col("z.1").as("d"),
            col("z.2").as("nr"), col("z.3").as("sv"))
        val wOrd = Window.orderBy("t")
        val terms = zipped
          .withColumn("delta",
            coalesce(lead("t", 1).over(wOrd), col("t")) - col("t"))
          .withColumn("term",
            (col("sv") * col("delta").cast("decimal(10,0)"))
              .cast("decimal(28,9)"))
        terms
          .withColumn("rsum", sum(col("term")).over(
            Window.orderBy(col("t").desc)
              .rowsBetween(Window.unboundedPreceding, 0)))
          .select(col("t").as("t_hours"), col("nr").as("n_risk"),
            col("d").as("d_events"),
            round(col("sv").cast("double"), 6).as("surv"),
            when(col("sv") > 0,
              round(col("rsum").cast("double") / col("sv").cast("double"),
                6) + lit(0.0))
              .as("rmrl_hours"))
          .orderBy("t_hours")
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
        su AS (
          SELECT user_id, MIN(ms) AS sms FROM e
          WHERE event_type = 'signup' GROUP BY 1),
        pu AS (
          SELECT e.user_id, MIN(ms) AS pms
          FROM e JOIN su ON e.user_id = su.user_id
          WHERE e.event_type = 'purchase' AND e.ms >= su.sms
          GROUP BY 1),
        mx AS (SELECT MAX(ms) AS mms FROM e),
        durs AS (
          SELECT CASE WHEN pms IS NOT NULL THEN 1 ELSE 0 END AS ev,
                 CASE WHEN pms IS NOT NULL THEN (pms - sms) // 3600000
                      ELSE (mms - sms) // 3600000 END AS t
          FROM su LEFT JOIN pu ON su.user_id = pu.user_id
          CROSS JOIN mx),
        ntot AS (SELECT CAST(COUNT(*) AS BIGINT) AS ntot FROM durs),
        lt AS (
          SELECT t, CAST(SUM(ev) AS BIGINT) AS d,
                 CAST(COUNT(*) AS BIGINT) AS m
          FROM durs GROUP BY 1),
        cum AS (
          SELECT t, d, m,
                 CAST(ntot - (SUM(m) OVER (ORDER BY t
                   ROWS UNBOUNDED PRECEDING) - m) AS BIGINT) AS nr
          FROM lt CROSS JOIN ntot),
        cum2 AS (
          SELECT t, d, nr,
                 ROUND(CAST(1 AS DOUBLE)
                   - CAST(d AS DOUBLE) / CAST(nr AS DOUBLE), 9) AS f
          FROM cum),
        packed AS (
          SELECT list(t ORDER BY t) AS tl, list(d ORDER BY t) AS dl,
                 list(nr ORDER BY t) AS nl, list(f ORDER BY t) AS fl
          FROM cum2),
        path AS (
          SELECT tl, dl, nl,
                 list_reduce(
                   list_prepend([CAST(1 AS DECIMAL(18,9))],
                     list_transform(fl,
                       f -> [CAST(f AS DECIMAL(18,9))])),
                   (acc, e) -> acc ||
                     [CAST(ROUND(acc[-1] * e[1], 9) AS DECIMAL(18,9))])
                   [2:] AS svals
          FROM packed),
        rows_z AS (
          SELECT unnest(tl) AS t, unnest(dl) AS d, unnest(nl) AS nr,
                 unnest(svals) AS sv
          FROM path),
        wd AS (
          SELECT t, d, nr, sv,
                 COALESCE(LEAD(t) OVER (ORDER BY t), t) - t AS delta
          FROM rows_z),
        terms AS (
          SELECT *, CAST(sv * CAST(delta AS DECIMAL(10,0))
                   AS DECIMAL(28,9)) AS term
          FROM wd),
        rs AS (
          SELECT *, SUM(term) OVER (ORDER BY t DESC
                   ROWS UNBOUNDED PRECEDING) AS rsum
          FROM terms)
        SELECT t AS t_hours, nr AS n_risk, d AS d_events,
               ROUND(CAST(sv AS DOUBLE), 6) AS surv,
               CASE WHEN sv > 0 THEN
                 ROUND(CAST(rsum AS DOUBLE) / CAST(sv AS DOUBLE), 6)
                   + CAST(0 AS DOUBLE)
               END AS rmrl_hours
        FROM rs ORDER BY t_hours""")),

    // Free-disposal-hull (FDH) output efficiency per nation: among
    // peers using no more of EITHER input (customers, orders), the
    // best-achieved revenue ratio — the LP-free, convexity-free
    // frontier benchmark from production economics (Deprins–Simar–
    // Tulkens). The dominance join runs on the bounded nation panel
    // (25 rows, broadcast); peer selection is an exact struct argmax
    // (max revenue, min key on ties); one double division per unit.
    "qgz_fdh_efficiency" -> Q(
      fn = (s, dir) => {
        val cust = t(s, dir, "customer")
          .groupBy(col("c_nationkey").cast("long").as("nk"))
          .agg(count(lit(1)).as("x1"))
        val ord = t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_nationkey").cast("long").as("nk2"))
          .agg(count(lit(1)).as("x2"),
            sum(col("o_totalprice").cast("decimal(18,2)")).as("y"))
        val u = cust.join(ord, col("nk") === col("nk2"))
          .select(col("nk"), col("x1"), col("x2"), col("y"))
        val peers = u.crossJoin(broadcast(u.select(
            col("nk").as("pk"), col("x1").as("px1"),
            col("x2").as("px2"), col("y").as("py"))))
          .filter(col("px1") <= col("x1") && col("px2") <= col("x2"))
          .groupBy(col("nk"), col("x1"), col("x2"), col("y"))
          .agg(max(struct(col("py").as("py"), (-col("pk")).as("negk")))
            .as("w"))
        peers.select(col("nk").as("nation"),
            col("x1").as("n_customers"), col("x2").as("n_orders"),
            col("y").cast("double").as("revenue"),
            (-col("w.negk")).as("peer_nation"),
            round(col("w.py").cast("double") / col("y").cast("double"), 6)
              .as("fdh_efficiency"),
            when(col("w.py") === col("y"), 1).otherwise(0).cast("int")
              .as("on_frontier"))
          .orderBy("nation")
      },
      oracle = Some("""
        WITH cust AS (
          SELECT CAST(c_nationkey AS BIGINT) AS nk,
                 CAST(COUNT(*) AS BIGINT) AS x1
          FROM customer GROUP BY 1),
        ord AS (
          SELECT CAST(c_nationkey AS BIGINT) AS nk,
                 CAST(COUNT(*) AS BIGINT) AS x2,
                 SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS y
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY 1),
        u AS MATERIALIZED (
          SELECT cust.nk, x1, x2, y
          FROM cust JOIN ord ON cust.nk = ord.nk),
        peers AS (
          SELECT a.nk, a.x1, a.x2, a.y,
                 MAX({'py': b.y, 'negk': -b.nk}) AS w
          FROM u a JOIN u b ON b.x1 <= a.x1 AND b.x2 <= a.x2
          GROUP BY 1, 2, 3, 4)
        SELECT nk AS nation, x1 AS n_customers, x2 AS n_orders,
               CAST(y AS DOUBLE) AS revenue,
               -w['negk'] AS peer_nation,
               ROUND(CAST(w['py'] AS DOUBLE) / CAST(y AS DOUBLE), 6)
                 AS fdh_efficiency,
               CAST(CASE WHEN w['py'] = y THEN 1 ELSE 0 END AS INT)
                 AS on_frontier
        FROM peers ORDER BY nation""")),

    // Risk-adjusted return card over daily revenue growth: Sharpe
    // (mean/sd), Sortino (mean/downside deviation), the RELATIVE
    // maximum drawdown off the exact DECIMAL prefix-max scan, and
    // Calmar (mean/maxDD) — the ratio battery that prices qfj's raw
    // drawdown and qfi's VaR into comparable per-unit-risk numbers.
    // Returns snap to the 9-grid; moment sums are DECIMAL(20,9);
    // sd/downside links are sqrt-only.
    "qh0_risk_adjusted" -> Q(
      fn = (s, dir) => {
        val y = dailyRevenueM(s, dir)
        val w = Window.orderBy("day")
        val r = y.withColumn("prev", lag("ym", 1).over(w))
          .filter(col("prev").isNotNull)
          .select(col("day"),
            round((col("ym") - col("prev")).cast("double") /
              col("prev").cast("double"), 9).as("r"))
        val mom = r.agg(count(lit(1)).as("n"),
          sum(g9(col("r"))).as("sr"),
          sum(g9(round(col("r") * col("r"), 9))).as("srr"),
          sum(g9(round(
            least(col("r"), lit(0.0)) * least(col("r"), lit(0.0)), 9)))
            .as("sdd"))
        val dd = y.withColumn("runmax", max(col("ym")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
          .select(((col("runmax") - col("ym")).cast("double") /
            col("runmax").cast("double")).as("rdd"))
          .agg(max(round(col("rdd"), 9)).as("maxdd"))
        mom.crossJoin(broadcast(dd))
          .select(col("n"),
            (col("sr").cast("double") / col("n").cast("double")).as("mu"),
            sqrt((col("n").cast("double") * col("srr").cast("double") -
              col("sr").cast("double") * col("sr").cast("double")) /
              (col("n").cast("double") * (col("n") - 1).cast("double")))
              .as("sd"),
            sqrt(col("sdd").cast("double") / col("n").cast("double"))
              .as("ddv"),
            col("maxdd"))
          .select(col("n").as("n_days"),
            (round(col("mu"), 6) + lit(0.0)).as("mean_r"),
            round(col("sd"), 6).as("sd_r"),
            (round(col("mu") / col("sd"), 6) + lit(0.0)).as("sharpe"),
            (round(col("mu") / col("ddv"), 6) + lit(0.0)).as("sortino"),
            round(col("maxdd"), 6).as("max_drawdown_rel"),
            (round(col("mu") / col("maxdd"), 6) + lit(0.0)).as("calmar"))
      },
      oracle = Some(s"""
        WITH y AS ($dailyRevenueMSql),
        r AS (
          SELECT day, ROUND(CAST(ym - prev AS DOUBLE)
                   / CAST(prev AS DOUBLE), 9) AS r
          FROM (SELECT day, ym, LAG(ym) OVER (ORDER BY day) AS prev
                FROM y)
          WHERE prev IS NOT NULL),
        mom AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(ROUND(r, 9) AS DECIMAL(20,9))) AS sr,
                 SUM(CAST(ROUND(r * r, 9) AS DECIMAL(20,9))) AS srr,
                 SUM(CAST(ROUND(LEAST(r, CAST(0 AS DOUBLE))
                   * LEAST(r, CAST(0 AS DOUBLE)), 9) AS DECIMAL(20,9)))
                   AS sdd
          FROM r),
        dd AS (
          SELECT MAX(ROUND(CAST(runmax - ym AS DOUBLE)
                   / CAST(runmax AS DOUBLE), 9)) AS maxdd
          FROM (SELECT ym, MAX(ym) OVER (ORDER BY day
                  ROWS UNBOUNDED PRECEDING) AS runmax FROM y)),
        f AS (
          SELECT n,
                 CAST(sr AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
                 SQRT((CAST(n AS DOUBLE) * CAST(srr AS DOUBLE)
                   - CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE))
                   / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE))) AS sd,
                 SQRT(CAST(sdd AS DOUBLE) / CAST(n AS DOUBLE)) AS ddv,
                 maxdd
          FROM mom CROSS JOIN dd)
        SELECT n AS n_days,
               ROUND(mu, 6) + CAST(0 AS DOUBLE) AS mean_r,
               ROUND(sd, 6) AS sd_r,
               ROUND(mu / sd, 6) + CAST(0 AS DOUBLE) AS sharpe,
               ROUND(mu / ddv, 6) + CAST(0 AS DOUBLE) AS sortino,
               ROUND(maxdd, 6) AS max_drawdown_rel,
               ROUND(mu / maxdd, 6) + CAST(0 AS DOUBLE) AS calmar
        FROM f""")),

    // Permutation inference for the qbk difference-in-differences:
    // 40 deterministic md5-draw reassignments of the 10-nation
    // treatment label (exactly T nations treated per permutation, the
    // rank-by-hash device = sampling without replacement), DiD
    // recomputed per permutation from the once-aggregated nation ×
    // period cells (10×2 exact DECIMAL images — the permutations
    // never touch row data), and the Fisher p-value (1 + #{|DiD_b| ≥
    // |DiD_obs|}) / (B+1). Design-based inference that needs no
    // variance formula — the robustness companion to qbk's unpooled-SE
    // t-stat.
    "qh1_did_permutation" -> Q(
      fn = (s, dir) => {
        val base = t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
          .filter(col("n_regionkey") <= 1)
          .select(col("n_nationkey").cast("long").as("nk"),
            when(col("n_regionkey") === 0, 1).otherwise(0).as("tr_obs"),
            when(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"), 1)
              .otherwise(0).as("post"),
            col("o_totalprice").cast("decimal(18,2)").as("y"))
        val cells = base.groupBy(col("nk"), col("post"))
          .agg(count(lit(1)).as("cn"), sum(col("y")).as("csy"))
          .localCheckpoint(eager = false)
        val nat = base.select(col("nk"), col("tr_obs")).distinct()
        val tcount = nat.agg(sum(col("tr_obs")).as("tt"))
        def didOf(asg: DataFrame): DataFrame = {
          // asg: (b, nk, tr); cells joined, group means per (b, tr, post)
          val g = asg.join(cells, "nk")
            .groupBy(col("b"), col("tr"), col("post"))
            .agg(sum(col("cn")).as("n"), sum(col("csy")).as("sy"))
            .select(col("b"), col("tr"), col("post"),
              round(col("sy").cast("double") / col("n").cast("double"), 9)
                .as("m"))
          def cell(tv: Int, pv: Int) =
            max(when(col("tr") === tv && col("post") === pv, col("m")))
          g.groupBy(col("b"))
            .agg(((cell(1, 1) - cell(1, 0)) - (cell(0, 1) - cell(0, 0)))
              .as("did"))
        }
        val obs = didOf(nat.select(lit(0L).as("b"), col("nk"),
            col("tr_obs").as("tr")))
          .select(col("did").as("did_obs"))
        val perms = nat.select(col("nk"))
          .crossJoin(broadcast(tcount))
          .select(col("nk"), col("tt"),
            explode(expr("sequence(1L, 40L)")).as("b"))
          .withColumn("draw",
            conv(substring(md5(concat(lit("didperm"), col("b"),
              lit("|"), col("nk"))), 1, 12), 16, 10).cast("long"))
          .withColumn("rk", row_number().over(
            Window.partitionBy("b").orderBy(col("draw"), col("nk"))))
          .select(col("b"), col("nk"),
            when(col("rk") <= col("tt"), 1).otherwise(0).as("tr"))
        val dids = didOf(perms)
        dids.crossJoin(broadcast(obs))
          .agg(count(lit(1)).as("n_perms"),
            sum(when(abs(col("did")) >= abs(col("did_obs")), 1L)
              .otherwise(0L)).as("n_extreme"),
            max(col("did_obs")).as("dob"))
          .select(col("n_perms"),
            (round(col("dob"), 6) + lit(0.0)).as("did_obs"),
            col("n_extreme"),
            round((lit(1.0) + col("n_extreme").cast("double")) /
              (col("n_perms").cast("double") + lit(1.0)), 6)
              .as("p_value"))
      },
      oracle = Some("""
        WITH base AS (
          SELECT CAST(n_nationkey AS BIGINT) AS nk,
                 CASE WHEN n_regionkey = 0 THEN 1 ELSE 0 END AS tr_obs,
                 CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01'
                      THEN 1 ELSE 0 END AS post,
                 CAST(o_totalprice AS DECIMAL(18,2)) AS y
          FROM orders JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          WHERE n_regionkey <= 1),
        cells AS MATERIALIZED (
          SELECT nk, post, CAST(COUNT(*) AS BIGINT) AS cn,
                 SUM(y) AS csy
          FROM base GROUP BY 1, 2),
        nat AS MATERIALIZED (SELECT DISTINCT nk, tr_obs FROM base),
        tc AS (SELECT CAST(SUM(tr_obs) AS BIGINT) AS tt FROM nat),
        obs_g AS (
          SELECT tr_obs AS tr, post,
                 ROUND(CAST(SUM(csy) AS DOUBLE)
                   / CAST(SUM(cn) AS DOUBLE), 9) AS m
          FROM nat JOIN cells USING (nk) GROUP BY 1, 2),
        obs AS (
          SELECT (MAX(CASE WHEN tr = 1 AND post = 1 THEN m END)
                - MAX(CASE WHEN tr = 1 AND post = 0 THEN m END))
               - (MAX(CASE WHEN tr = 0 AND post = 1 THEN m END)
                - MAX(CASE WHEN tr = 0 AND post = 0 THEN m END))
                 AS did_obs
          FROM obs_g),
        draws AS (
          SELECT b, nk,
                 CAST('0x' || substr(md5('didperm' || CAST(b AS VARCHAR)
                   || '|' || CAST(nk AS VARCHAR)), 1, 12) AS BIGINT)
                   AS draw
          FROM nat CROSS JOIN (SELECT unnest(range(1, 41)) AS b)),
        asg AS (
          SELECT b, nk,
                 CASE WHEN ROW_NUMBER() OVER (PARTITION BY b
                   ORDER BY draw, nk) <= tt THEN 1 ELSE 0 END AS tr
          FROM draws CROSS JOIN tc),
        g AS (
          SELECT b, tr, post,
                 ROUND(CAST(SUM(csy) AS DOUBLE)
                   / CAST(SUM(cn) AS DOUBLE), 9) AS m
          FROM asg JOIN cells USING (nk) GROUP BY 1, 2, 3),
        dids AS (
          SELECT b,
                 (MAX(CASE WHEN tr = 1 AND post = 1 THEN m END)
                - MAX(CASE WHEN tr = 1 AND post = 0 THEN m END))
               - (MAX(CASE WHEN tr = 0 AND post = 1 THEN m END)
                - MAX(CASE WHEN tr = 0 AND post = 0 THEN m END)) AS did
          FROM g GROUP BY 1)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_perms,
               ROUND(MAX(did_obs), 6) + CAST(0 AS DOUBLE) AS did_obs,
               CAST(SUM(CASE WHEN ABS(did) >= ABS(did_obs)
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_extreme,
               ROUND((CAST(1 AS DOUBLE)
                 + CAST(SUM(CASE WHEN ABS(did) >= ABS(did_obs)
                     THEN 1 ELSE 0 END) AS DOUBLE))
                 / (CAST(COUNT(*) AS DOUBLE) + CAST(1 AS DOUBLE)), 6)
                 AS p_value
        FROM dids CROSS JOIN obs""")),

    // X̄-R control chart over daily order-value subgroups (first 5
    // orders per day by key, the classical fixed-n rational subgroup):
    // subgroup means/ranges in exact DECIMAL, Shewhart limits from the
    // n=5 constants A₂ = 0.577, D₃ = 0, D₄ = 2.114, and the
    // out-of-control counts on both charts — the SUBGROUPED member of
    // the SPC family (qf2's I-MR charts individuals, qds's p-chart
    // proportions). Values carried in millions so every mean is inside
    // the 15-significant-digit oracle envelope.
    "qh2_xbar_r_chart" -> Q(
      fn = (s, dir) => {
        val o = t(s, dir, "orders")
          .select(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP))" +
              " div 86400000").as("day"),
            col("o_orderkey"),
            (col("o_totalprice").cast("decimal(18,2)") / lit(1000000))
              .cast("decimal(18,8)").as("v"))
        val sub = o.withColumn("rn", row_number().over(
            Window.partitionBy("day").orderBy("o_orderkey")))
          .filter(col("rn") <= 5)
          .groupBy("day")
          .agg(count(lit(1)).as("m"),
            (sum(col("v")) * lit(0.2).cast("decimal(2,1)")).as("xbar"),
            (max(col("v")) - min(col("v"))).as("r"))
          .filter(col("m") === 5)
          .localCheckpoint(eager = false)
        val grand = sub.agg(count(lit(1)).as("n_subgroups"),
            round(sum(col("xbar")).cast("double") /
              count(lit(1)).cast("double"), 9).as("xbb"),
            round(sum(col("r")).cast("double") /
              count(lit(1)).cast("double"), 9).as("rbar"))
          .withColumn("uclx", col("xbb") + lit(0.577) * col("rbar"))
          .withColumn("lclx", col("xbb") - lit(0.577) * col("rbar"))
          .withColumn("uclr", lit(2.114) * col("rbar"))
        val viol = sub.crossJoin(broadcast(grand))
          .agg(sum(when(col("xbar").cast("double") > col("uclx") ||
              col("xbar").cast("double") < col("lclx"), 1L).otherwise(0L))
              .as("n_viol_x"),
            sum(when(col("r").cast("double") > col("uclr"), 1L)
              .otherwise(0L)).as("n_viol_r"))
        grand.crossJoin(broadcast(viol))
          .select(col("n_subgroups"),
            round(col("xbb"), 6).as("xbar_bar_m"),
            round(col("rbar"), 6).as("rbar_m"),
            round(col("uclx"), 6).as("ucl_x"),
            (round(col("lclx"), 6) + lit(0.0)).as("lcl_x"),
            round(col("uclr"), 6).as("ucl_r"),
            col("n_viol_x"), col("n_viol_r"))
      },
      oracle = Some("""
        WITH o AS (
          SELECT CAST(epoch_ms(o_orderdate) // 86400000 AS BIGINT) AS day,
                 o_orderkey,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) / 1000000
                   AS DECIMAL(18,8)) AS v
          FROM orders),
        sub AS MATERIALIZED (
          SELECT day, CAST(COUNT(*) AS BIGINT) AS m,
                 CAST(SUM(v) AS DECIMAL(18,8))
                   * CAST(0.2 AS DECIMAL(2,1)) AS xbar,
                 MAX(v) - MIN(v) AS r
          FROM (SELECT day, v, ROW_NUMBER() OVER (PARTITION BY day
                  ORDER BY o_orderkey) AS rn
                FROM o)
          WHERE rn <= 5
          GROUP BY day HAVING COUNT(*) = 5),
        grand AS (
          SELECT n_subgroups, xbb, rbar,
                 xbb + CAST(0.577 AS DOUBLE) * rbar AS uclx,
                 xbb - CAST(0.577 AS DOUBLE) * rbar AS lclx,
                 CAST(2.114 AS DOUBLE) * rbar AS uclr
          FROM (
            SELECT CAST(COUNT(*) AS BIGINT) AS n_subgroups,
                   ROUND(CAST(SUM(xbar) AS DOUBLE)
                     / CAST(COUNT(*) AS DOUBLE), 9) AS xbb,
                   ROUND(CAST(SUM(r) AS DOUBLE)
                     / CAST(COUNT(*) AS DOUBLE), 9) AS rbar
            FROM sub)),
        viol AS (
          SELECT CAST(SUM(CASE WHEN CAST(xbar AS DOUBLE) > uclx
                   OR CAST(xbar AS DOUBLE) < lclx THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_viol_x,
                 CAST(SUM(CASE WHEN CAST(r AS DOUBLE) > uclr
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_viol_r
          FROM sub CROSS JOIN grand)
        SELECT n_subgroups,
               ROUND(xbb, 6) AS xbar_bar_m,
               ROUND(rbar, 6) AS rbar_m,
               ROUND(uclx, 6) AS ucl_x,
               ROUND(lclx, 6) + CAST(0 AS DOUBLE) AS lcl_x,
               ROUND(uclr, 6) AS ucl_r,
               n_viol_x, n_viol_r
        FROM grand CROSS JOIN viol""")),

    // Beta-binomial overdispersion of user activity: each user's count
    // of active days out of the fixed n-day observation window, fitted
    // by the method of moments (α, β from the first two sample
    // moments; ICC ρ = 1/(α+β+1) is the within-user clumping). The
    // engagement-heterogeneity companion to qbs's negative-binomial
    // event-count fit — binomial trials here are BOUNDED (n days), so
    // overdispersion shows up as mass at the extremes, not a long
    // tail. Integer sums only; three double divisions at the end.
    "qh3_beta_binomial" -> Q(
      fn = (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("user_id"),
            expr("unix_millis(ts) div 86400000").as("day"))
        val nt = e.agg(countDistinct(col("day")).as("n"))
        val ku = e.groupBy("user_id")
          .agg(countDistinct(col("day")).as("k"))
        val mm = ku.agg(count(lit(1)).as("nu"),
          sum(col("k")).as("sk"), sum(col("k") * col("k")).as("skk"))
        mm.crossJoin(broadcast(nt))
          .select(col("nu"), col("n"),
            col("n").cast("double").as("nd"),
            col("nu").cast("double").as("nud"),
            col("sk").cast("double").as("skd"),
            col("skk").cast("double").as("skkd"))
          .select(col("nu").as("n_users"), col("n").as("n_trials"),
            (col("skd") / col("nud")).as("m1"),
            (col("skkd") / col("nud")).as("m2"),
            ((col("nud") * col("skkd") - col("skd") * col("skd")) /
              (col("nud") * (col("nud") - lit(1.0)))).as("vk"),
            col("nd"))
          .select(col("n_users"), col("n_trials"),
            round(col("m1"), 6).as("mean_k"),
            round(col("vk"), 6).as("var_k"),
            (round((col("nd") * col("m1") - col("m2")) /
              (col("nd") * (col("m2") / col("m1") - col("m1") - lit(1.0))
                + col("m1")), 6) + lit(0.0)).as("alpha"),
            (round((col("nd") - col("m1")) *
              (col("nd") - col("m2") / col("m1")) /
              (col("nd") * (col("m2") / col("m1") - col("m1") - lit(1.0))
                + col("m1")), 6) + lit(0.0)).as("beta"),
            (round(lit(1.0) / ((col("nd") * col("m1") - col("m2")) /
              (col("nd") * (col("m2") / col("m1") - col("m1") - lit(1.0))
                + col("m1")) + (col("nd") - col("m1")) *
              (col("nd") - col("m2") / col("m1")) /
              (col("nd") * (col("m2") / col("m1") - col("m1") - lit(1.0))
                + col("m1")) + lit(1.0)), 6) + lit(0.0)).as("icc"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id, epoch_ms(ts) // 86400000 AS day FROM events),
        nt AS (SELECT CAST(COUNT(DISTINCT day) AS BIGINT) AS n FROM e),
        ku AS (
          SELECT user_id, CAST(COUNT(DISTINCT day) AS BIGINT) AS k
          FROM e GROUP BY 1),
        mm AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS nu,
                 CAST(SUM(k) AS BIGINT) AS sk,
                 CAST(SUM(k * k) AS BIGINT) AS skk
          FROM ku),
        d AS (
          SELECT nu, n, CAST(n AS DOUBLE) AS nd, CAST(nu AS DOUBLE) AS nud,
                 CAST(sk AS DOUBLE) AS skd, CAST(skk AS DOUBLE) AS skkd
          FROM mm CROSS JOIN nt),
        m AS (
          SELECT nu AS n_users, n AS n_trials, nd,
                 skd / nud AS m1, skkd / nud AS m2,
                 (nud * skkd - skd * skd)
                   / (nud * (nud - CAST(1 AS DOUBLE))) AS vk
          FROM d),
        f AS (
          SELECT n_users, n_trials, m1, vk,
                 (nd * m1 - m2)
                   / (nd * (m2 / m1 - m1 - CAST(1 AS DOUBLE)) + m1) AS a,
                 (nd - m1) * (nd - m2 / m1)
                   / (nd * (m2 / m1 - m1 - CAST(1 AS DOUBLE)) + m1) AS b
          FROM m)
        SELECT n_users, n_trials,
               ROUND(m1, 6) AS mean_k,
               ROUND(vk, 6) AS var_k,
               ROUND(a, 6) + CAST(0 AS DOUBLE) AS alpha,
               ROUND(b, 6) + CAST(0 AS DOUBLE) AS beta,
               ROUND(CAST(1 AS DOUBLE) / (a + b + CAST(1 AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS icc
        FROM f""")),

    // Burt's network constraint (structural holes): per node i,
    // Σ_{j∈N(i)} (p_ij + Σ_q p_iq·p_qj)² over the uniform-weight
    // contact shares p_ij = 1/deg(i) — LOW constraint marks brokers
    // whose contacts are disconnected from each other, the
    // social-capital metric the centrality battery (qba/qbb/qad)
    // doesn't see (centrality rewards reach; constraint penalizes
    // redundant reach). Two self-joins of the bounded-degree edge
    // list (the q4g triangle-count shape), never materializing paths;
    // 9-grid shares, 12-grid products into DECIMAL sums.
    "qh4_burt_constraint" -> Q(
      fn = (s, dir) => {
        val e0 = t(s, dir, "orders")
          .filter(col("o_orderkey") % 17 === 0)
          .select((col("o_custkey") % 400).cast("long").as("src"),
            (col("o_orderkey") % 400).cast("long").as("dst"))
          .filter(col("src") =!= col("dst"))
        val und = e0.union(e0.select(col("dst").as("src"),
            col("src").as("dst"))).distinct()
          .localCheckpoint(eager = false)
        val deg = und.groupBy(col("src").as("i")).agg(count(lit(1)).as("dg"))
        val p = und.join(deg, col("src") === col("i"))
          .select(col("src").as("pi"), col("dst").as("pj"),
            round(lit(1.0) / col("dg").cast("double"), 9).as("pv"))
          .localCheckpoint(eager = false)
        val p2 = p.select(col("pi").as("i2"), col("pj").as("q"),
            col("pv").as("piq"))
          .join(p.select(col("pi").as("q2"), col("pj").as("j2"),
            col("pv").as("pqj")), col("q") === col("q2"))
          .filter(col("i2") =!= col("j2"))
          .groupBy(col("i2"), col("j2"))
          .agg(sum(round(col("piq") * col("pqj"), 12)
            .cast("decimal(28,12)")).as("ind"))
        val terms = p
          .join(p2, col("pi") === col("i2") && col("pj") === col("j2"),
            "left")
          .select(col("pi"), col("pj"),
            (col("pv") + coalesce(col("ind").cast("double"), lit(0.0)))
              .as("tv"))
        terms.groupBy(col("pi").as("node"))
          .agg(count(lit(1)).as("degree"),
            sum(round(col("tv") * col("tv"), 12).cast("decimal(28,12)"))
              .as("cs"))
          .select(col("node"), col("degree"),
            round(col("cs").cast("double"), 6).as("constraint"))
          .orderBy(col("node"))
      },
      oracle = Some("""
        WITH e0 AS (
          SELECT CAST(o_custkey % 400 AS BIGINT) AS src,
                 CAST(o_orderkey % 400 AS BIGINT) AS dst
          FROM orders
          WHERE o_orderkey % 17 = 0 AND o_custkey % 400 <> o_orderkey % 400),
        und AS MATERIALIZED (
          SELECT DISTINCT src, dst FROM (
            SELECT src, dst FROM e0
            UNION ALL SELECT dst, src FROM e0)),
        deg AS (
          SELECT src AS i, CAST(COUNT(*) AS BIGINT) AS dg
          FROM und GROUP BY 1),
        p AS MATERIALIZED (
          SELECT src AS pi, dst AS pj,
                 ROUND(CAST(1 AS DOUBLE) / CAST(dg AS DOUBLE), 9) AS pv
          FROM und JOIN deg ON src = i),
        p2 AS (
          SELECT a.pi AS i2, b.pj AS j2,
                 SUM(CAST(ROUND(a.pv * b.pv, 12) AS DECIMAL(28,12)))
                   AS ind
          FROM p a JOIN p b ON a.pj = b.pi
          WHERE a.pi <> b.pj
          GROUP BY 1, 2),
        terms AS (
          SELECT p.pi, p.pj,
                 p.pv + COALESCE(CAST(ind AS DOUBLE), CAST(0 AS DOUBLE))
                   AS tv
          FROM p LEFT JOIN p2 ON p.pi = i2 AND p.pj = j2)
        SELECT pi AS node, CAST(COUNT(*) AS BIGINT) AS degree,
               ROUND(CAST(SUM(CAST(ROUND(tv * tv, 12) AS DECIMAL(28,12)))
                 AS DOUBLE), 6) AS constraint
        FROM terms GROUP BY 1 ORDER BY 1""")),

    // Greenwood confidence bands on the signup→first-error survival
    // curve (time-to-first-failure, the reliability reading): per life-
    // table day, log-survival as the proven ln-link cumulative, the
    // Greenwood variance Σ d/(n(n−d)) in 12-grid DECIMAL, and the
    // ±1.96·SE band ON THE LOG SCALE (exp is not oracle-parity-safe,
    // CLAUDE.md rule 14 — and log-scale bands are the
    // better-calibrated form anyway). Terminal rows where everyone at
    // risk fails (d = n) are excluded: Greenwood's variance is
    // undefined there and always last (no one remains at risk after).
    "qh6_greenwood_bands" -> Q(
      fn = (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            unix_millis(col("ts")).as("ms"))
        val su = e.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min(col("ms")).as("sms"))
        val er = e.filter(col("event_type") === "error")
          .join(su, "user_id")
          .filter(col("ms") >= col("sms"))
          .groupBy("user_id").agg(min(col("ms")).as("ems"))
        val mx = e.agg(max(col("ms")).as("mms"))
        val durs = su.join(er, Seq("user_id"), "left")
          .crossJoin(broadcast(mx))
          .select(
            when(col("ems").isNotNull, 1L).otherwise(0L).as("ev"),
            when(col("ems").isNotNull, expr("(ems - sms) div 86400000"))
              .otherwise(expr("(mms - sms) div 86400000")).as("t"))
        val ntot = durs.agg(count(lit(1)).as("ntot"))
        val lt = durs.groupBy("t")
          .agg(sum(col("ev")).as("d"), count(lit(1)).as("m"))
        val w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
        lt.crossJoin(broadcast(ntot))
          .withColumn("nr", col("ntot") -
            (sum(col("m")).over(w) - col("m")))
          .filter(col("d") < col("nr"))
          .withColumn("lnf", round(log(lit(1.0) -
            col("d").cast("double") / col("nr").cast("double")), 12)
            .cast("decimal(28,12)"))
          .withColumn("gw", round(col("d").cast("double") /
            (col("nr").cast("double") *
              (col("nr") - col("d")).cast("double")), 12)
            .cast("decimal(28,12)"))
          .withColumn("lns", sum(col("lnf")).over(w).cast("double"))
          .withColumn("se", sqrt(sum(col("gw")).over(w).cast("double")))
          .select(col("t").as("t_days"), col("nr").as("n_risk"),
            col("d").as("d_events"),
            (round(col("lns"), 6) + lit(0.0)).as("log_surv"),
            round(col("se"), 6).as("se_log"),
            (round(col("lns") - lit(1.96) * col("se"), 6) + lit(0.0))
              .as("lo_log"),
            (round(col("lns") + lit(1.96) * col("se"), 6) + lit(0.0))
              .as("hi_log"))
          .orderBy("t_days")
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
        su AS (
          SELECT user_id, MIN(ms) AS sms FROM e
          WHERE event_type = 'signup' GROUP BY 1),
        er AS (
          SELECT e.user_id, MIN(ms) AS ems
          FROM e JOIN su ON e.user_id = su.user_id
          WHERE e.event_type = 'error' AND e.ms >= su.sms
          GROUP BY 1),
        mx AS (SELECT MAX(ms) AS mms FROM e),
        durs AS (
          SELECT CASE WHEN ems IS NOT NULL THEN 1 ELSE 0 END AS ev,
                 CASE WHEN ems IS NOT NULL THEN (ems - sms) // 86400000
                      ELSE (mms - sms) // 86400000 END AS t
          FROM su LEFT JOIN er ON su.user_id = er.user_id
          CROSS JOIN mx),
        ntot AS (SELECT CAST(COUNT(*) AS BIGINT) AS ntot FROM durs),
        lt AS (
          SELECT t, CAST(SUM(ev) AS BIGINT) AS d,
                 CAST(COUNT(*) AS BIGINT) AS m
          FROM durs GROUP BY 1),
        cum AS (
          SELECT t, d,
                 CAST(ntot - (SUM(m) OVER (ORDER BY t
                   ROWS UNBOUNDED PRECEDING) - m) AS BIGINT) AS nr
          FROM lt CROSS JOIN ntot),
        fl AS (
          SELECT t, d, nr,
                 CAST(ROUND(ln(CAST(1 AS DOUBLE)
                   - CAST(d AS DOUBLE) / CAST(nr AS DOUBLE)), 12)
                   AS DECIMAL(28,12)) AS lnf,
                 CAST(ROUND(CAST(d AS DOUBLE)
                   / (CAST(nr AS DOUBLE) * CAST(nr - d AS DOUBLE)), 12)
                   AS DECIMAL(28,12)) AS gw
          FROM cum WHERE d < nr),
        cc AS (
          SELECT t, d, nr,
                 CAST(SUM(lnf) OVER (ORDER BY t
                   ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS lns,
                 SQRT(CAST(SUM(gw) OVER (ORDER BY t
                   ROWS UNBOUNDED PRECEDING) AS DOUBLE)) AS se
          FROM fl)
        SELECT t AS t_days, nr AS n_risk, d AS d_events,
               ROUND(lns, 6) + CAST(0 AS DOUBLE) AS log_surv,
               ROUND(se, 6) AS se_log,
               ROUND(lns - CAST(1.96 AS DOUBLE) * se, 6)
                 + CAST(0 AS DOUBLE) AS lo_log,
               ROUND(lns + CAST(1.96 AS DOUBLE) * se, 6)
                 + CAST(0 AS DOUBLE) AS hi_log
        FROM cc ORDER BY t_days""")),

    // Chao1 + ACE species-richness estimators over the corpus token
    // abundance profile: how many word types does the corpus REALLY
    // have, given the singletons and doubletons it shows? (Chao1's
    // bias-corrected form; ACE over the ≤10-count rare tier with its
    // sample-coverage C and CV² inflation.) The "how much is unseen"
    // question qao's Good–Turing mass answers for PROBABILITY,
    // answered for TYPE COUNT — the vocabulary-budget number a
    // tokenizer trainer needs. Pure integer abundance sums; three
    // guarded double ratios.
    "qh7_chao1_ace" -> Q(
      fn = (s, dir) => {
        // species = word TRIGRAMS: the fixture's unigram (31 types) and
        // bigram vocabularies saturate at sf0.01 — every type lands in
        // the abundant tier and the rare-tier ratios divide by zero
        // (the CLAUDE.md vacuity rule). The trigram space stays open at
        // every SF (f1, f2, n_rare all nonzero, f1 < n_rare).
        val cnts = t(s, dir, "documents")
          .select(graft.functions.TextAnalysis.tokens(col("text")).as("a"))
          .filter(size(col("a")) >= 3)
          .select(explode(expr("transform(sequence(1, size(a) - 2)," +
            " i -> concat_ws(' ', element_at(a, i), element_at(a, i + 1)," +
            " element_at(a, i + 2)))")).as("token"))
          .groupBy("token").agg(count(lit(1)).as("c"))
        val prof = cnts.agg(
          count(lit(1)).as("s_obs"), sum(col("c")).as("n_tokens"),
          sum(when(col("c") === 1, 1L).otherwise(0L)).as("f1"),
          sum(when(col("c") === 2, 1L).otherwise(0L)).as("f2"),
          sum(when(col("c") <= 10, 1L).otherwise(0L)).as("s_rare"),
          sum(when(col("c") > 10, 1L).otherwise(0L)).as("s_abund"),
          sum(when(col("c") <= 10, col("c")).otherwise(0L)).as("n_rare"),
          sum(when(col("c") <= 10, col("c") * (col("c") - 1))
            .otherwise(0L)).as("sk1"))
        prof.select(col("s_obs"), col("n_tokens"), col("f1"), col("f2"),
            col("s_rare"), col("s_abund"),
            col("f1").cast("double").as("f1d"),
            col("f2").cast("double").as("f2d"),
            col("s_obs").cast("double").as("sod"),
            col("s_rare").cast("double").as("srd"),
            col("s_abund").cast("double").as("sad"),
            col("n_rare").cast("double").as("nrd"),
            col("sk1").cast("double").as("sk1d"))
          .withColumn("cace", lit(1.0) - col("f1d") / col("nrd"))
          .withColumn("g2", greatest(
            (col("srd") / col("cace")) * col("sk1d") /
              (col("nrd") * (col("nrd") - lit(1.0))) - lit(1.0),
            lit(0.0)))
          .select(col("s_obs"), col("n_tokens"), col("f1"), col("f2"),
            round(col("sod") + col("f1d") * (col("f1d") - lit(1.0)) /
              (lit(2.0) * (col("f2d") + lit(1.0))), 6).as("chao1"),
            round(col("sad") + col("srd") / col("cace") +
              col("f1d") / col("cace") * col("g2"), 6).as("ace"),
            round(col("cace"), 6).as("coverage_rare"))
      },
      oracle = Some("""
        WITH cnts AS (
          SELECT token, CAST(COUNT(*) AS BIGINT) AS c
          FROM (
            SELECT unnest(list_transform(range(1, len(a) - 1),
                     i -> a[i] || ' ' || a[i + 1] || ' ' || a[i + 2]))
                   AS token
            FROM (SELECT regexp_split_to_array(trim(text), '\s+') AS a
                  FROM documents)
            WHERE len(a) >= 3)
          GROUP BY 1),
        prof AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS s_obs,
                 CAST(SUM(c) AS BIGINT) AS n_tokens,
                 CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS f1,
                 CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
                   AS f2,
                 CAST(SUM(CASE WHEN c <= 10 THEN 1 ELSE 0 END) AS BIGINT)
                   AS s_rare,
                 CAST(SUM(CASE WHEN c > 10 THEN 1 ELSE 0 END) AS BIGINT)
                   AS s_abund,
                 CAST(SUM(CASE WHEN c <= 10 THEN c ELSE 0 END) AS BIGINT)
                   AS n_rare,
                 CAST(SUM(CASE WHEN c <= 10 THEN c * (c - 1) ELSE 0 END)
                   AS BIGINT) AS sk1
          FROM cnts),
        d AS (
          SELECT *, CAST(f1 AS DOUBLE) AS f1d, CAST(f2 AS DOUBLE) AS f2d,
                 CAST(s_obs AS DOUBLE) AS sod,
                 CAST(s_rare AS DOUBLE) AS srd,
                 CAST(s_abund AS DOUBLE) AS sad,
                 CAST(n_rare AS DOUBLE) AS nrd,
                 CAST(sk1 AS DOUBLE) AS sk1d
          FROM prof),
        cc AS (
          SELECT *, CAST(1 AS DOUBLE) - f1d / nrd AS cace
          FROM d),
        gg AS (
          SELECT *, GREATEST((srd / cace) * sk1d
                   / (nrd * (nrd - CAST(1 AS DOUBLE)))
                   - CAST(1 AS DOUBLE), CAST(0 AS DOUBLE)) AS g2
          FROM cc)
        SELECT s_obs, n_tokens, f1, f2,
               ROUND(sod + f1d * (f1d - CAST(1 AS DOUBLE))
                 / (CAST(2 AS DOUBLE) * (f2d + CAST(1 AS DOUBLE))), 6)
                 AS chao1,
               ROUND(sad + srd / cace + f1d / cace * g2, 6) AS ace,
               ROUND(cace, 6) AS coverage_rare
        FROM gg""")),

    // Page–Hinkley drift monitor over daily purchase counts: the
    // sequential changepoint statistic PH_t = U_t − min_{i≤t} U_i with
    // U_t = Σ(x_i − x̄_i − δ), where x̄_i is the RUNNING mean — the
    // streaming-world alternative to qc9's offline binary-seg scan
    // and q7q's fixed-mean CUSUM (PH self-centers, so it needs no
    // training period). δ = 5 counts of slack, alarm at λ = 50.
    // Integer counts, 9-grid running means, exact DECIMAL cumulatives
    // and running min.
    "qh8_page_hinkley" -> Q(
      fn = (s, dir) => {
        val x = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(expr("unix_millis(ts) div 86400000").as("day"))
          .agg(count(lit(1)).as("x"))
        val w = Window.orderBy("day").rowsBetween(
          Window.unboundedPreceding, 0)
        x.withColumn("tix", row_number().over(Window.orderBy("day")))
          .withColumn("mt", round(sum(col("x")).over(w).cast("double") /
            col("tix").cast("double"), 9))
          .withColumn("term", g9(round(col("x").cast("double") -
            col("mt") - lit(5.0), 9)))
          .withColumn("u", sum(col("term")).over(w))
          .withColumn("runmin", min(col("u")).over(w))
          .select(col("day"), col("x").as("n_purchases"),
            round(col("mt"), 6).as("mean_to_date"),
            (round(col("u").cast("double"), 6) + lit(0.0)).as("u_t"),
            round((col("u") - col("runmin")).cast("double"), 6)
              .as("ph_stat"),
            when((col("u") - col("runmin")).cast("double") > lit(50.0), 1)
              .otherwise(0).cast("int").as("alarm"))
          .orderBy("day")
      },
      oracle = Some("""
        WITH x AS (
          SELECT epoch_ms(ts) // 86400000 AS day,
                 CAST(COUNT(*) AS BIGINT) AS x
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        m AS (
          SELECT day, x,
                 ROUND(CAST(SUM(x) OVER (ORDER BY day
                   ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                   / CAST(ROW_NUMBER() OVER (ORDER BY day) AS DOUBLE), 9)
                   AS mt
          FROM x),
        u AS (
          SELECT day, x, mt,
                 SUM(CAST(ROUND(CAST(x AS DOUBLE) - mt
                   - CAST(5 AS DOUBLE), 9) AS DECIMAL(20,9)))
                   OVER (ORDER BY day ROWS UNBOUNDED PRECEDING) AS u
          FROM m),
        r AS (
          SELECT day, x, mt, u,
                 MIN(u) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                   AS runmin
          FROM u)
        SELECT day, x AS n_purchases,
               ROUND(mt, 6) AS mean_to_date,
               ROUND(CAST(u AS DOUBLE), 6) + CAST(0 AS DOUBLE) AS u_t,
               ROUND(CAST(u - runmin AS DOUBLE), 6) AS ph_stat,
               CAST(CASE WHEN CAST(u - runmin AS DOUBLE)
                 > CAST(50 AS DOUBLE) THEN 1 ELSE 0 END AS INT) AS alarm
        FROM r ORDER BY day""")),

    // Empirical upper-tail dependence between daily view and purchase
    // volume: λ_U(q) = P(purchases in top (1−q) | views in top (1−q))
    // at q ∈ {0.6, 0.7, 0.8, 0.9} — do extreme-traffic days and
    // extreme-buying days coincide? The copula-tail question that
    // correlation (q8h) misses entirely (ρ is dominated by the body).
    // Rank-based and integer-exact: thresholds compare r·1000 >
    // n·q_permille, no float until the final share.
    "qh9_tail_dependence" -> Q(
      fn = (s, dir) => {
        val d = t(s, dir, "events")
          .groupBy(expr("unix_millis(ts) div 86400000").as("day"))
          .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("xv"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("yv"))
        val ranked = d
          .withColumn("rx", row_number().over(
            Window.orderBy(col("xv"), col("day"))).cast("long"))
          .withColumn("ry", row_number().over(
            Window.orderBy(col("yv"), col("day"))).cast("long"))
        val n0 = ranked.agg(count(lit(1)).as("n"))
        ranked.crossJoin(broadcast(n0))
          .select(col("rx"), col("ry"), col("n"),
            explode(expr("array(600, 700, 800, 900)")).as("q_permille"))
          .groupBy(col("q_permille"))
          .agg(max(col("n")).as("n_days"),
            sum(when(col("rx") * 1000 > col("n") * col("q_permille"), 1L)
              .otherwise(0L)).as("k_x"),
            sum(when(col("rx") * 1000 > col("n") * col("q_permille") &&
              col("ry") * 1000 > col("n") * col("q_permille"), 1L)
              .otherwise(0L)).as("k_both"))
          .select(col("q_permille"), col("n_days"), col("k_x"),
            col("k_both"),
            round(col("k_both").cast("double") / col("k_x").cast("double"),
              6).as("lambda_u"))
          .orderBy("q_permille")
      },
      oracle = Some("""
        WITH d AS (
          SELECT epoch_ms(ts) // 86400000 AS day,
                 CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                   AS BIGINT) AS xv,
                 CAST(SUM(CASE WHEN event_type = 'purchase'
                   THEN 1 ELSE 0 END) AS BIGINT) AS yv
          FROM events GROUP BY 1),
        ranked AS (
          SELECT CAST(ROW_NUMBER() OVER (ORDER BY xv, day) AS BIGINT)
                   AS rx,
                 CAST(ROW_NUMBER() OVER (ORDER BY yv, day) AS BIGINT)
                   AS ry
          FROM d),
        n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ranked),
        f AS (
          SELECT q_permille, n,
                 CASE WHEN rx * 1000 > n * q_permille THEN 1 ELSE 0 END
                   AS inx,
                 CASE WHEN rx * 1000 > n * q_permille
                   AND ry * 1000 > n * q_permille THEN 1 ELSE 0 END
                   AS inb
          FROM ranked CROSS JOIN n0
          CROSS JOIN (SELECT unnest([600, 700, 800, 900]) AS q_permille))
        SELECT q_permille, MAX(n) AS n_days,
               CAST(SUM(inx) AS BIGINT) AS k_x,
               CAST(SUM(inb) AS BIGINT) AS k_both,
               ROUND(CAST(SUM(inb) AS DOUBLE) / CAST(SUM(inx) AS DOUBLE),
                 6) AS lambda_u
        FROM f GROUP BY 1 ORDER BY 1""")),

    // Restricted mean survival time difference between the user-parity
    // experiment arms (the q7c/qbm assignment): area under each arm's
    // signup→purchase KM curve out to τ = 30 days — "days of
    // unconverted time saved" — the modern effect measure when
    // proportional hazards can't be assumed (a hazard ratio has no
    // such reading). Each arm's KM path is the qgw exact-DECIMAL(18,9)
    // fold run per group; the τ-truncated integral adds the S=1 lead-in
    // up to the first event time.
    "qha_rmst_difference" -> Q(
      fn = (s, dir) => {
        val tau = 30L
        val e = t(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            unix_millis(col("ts")).as("ms"))
        val su = e.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min(col("ms")).as("sms"))
        val pu = e.filter(col("event_type") === "purchase")
          .join(su, "user_id")
          .filter(col("ms") >= col("sms"))
          .groupBy("user_id").agg(min(col("ms")).as("pms"))
        val mx = e.agg(max(col("ms")).as("mms"))
        val durs = su.join(pu, Seq("user_id"), "left")
          .crossJoin(broadcast(mx))
          .select((col("user_id") % 2).cast("int").as("arm"),
            when(col("pms").isNotNull, 1L).otherwise(0L).as("ev"),
            least(when(col("pms").isNotNull,
              expr("(pms - sms) div 86400000"))
              .otherwise(expr("(mms - sms) div 86400000")), lit(tau))
              .as("t"))
        val ntot = durs.groupBy("arm").agg(count(lit(1)).as("ntot"),
          sum(col("ev")).as("nev"))
        val lt = durs.groupBy("arm", "t")
          .agg(sum(col("ev")).as("d"), count(lit(1)).as("m"))
        val wArm = Window.partitionBy("arm").orderBy("t")
          .rowsBetween(Window.unboundedPreceding, 0)
        val cum = lt.join(ntot, "arm")
          .withColumn("nr", col("ntot") -
            (sum(col("m")).over(wArm) - col("m")))
          .withColumn("f", round(lit(1.0) -
            col("d").cast("double") / col("nr").cast("double"), 9))
        val packed = cum.groupBy("arm", "ntot", "nev")
          .agg(expr("array_sort(collect_list(struct(t, f)))").as("rows"))
        val zipped = packed.select(col("arm"), col("ntot"), col("nev"),
            expr(s"""explode(arrays_zip(
              |  transform(rows, x -> x.t),
              |  slice(aggregate(
              |    transform(rows, x -> cast(x.f as decimal(18,9))),
              |    array(cast(1.0 as decimal(18,9))),
              |    (acc, fv) -> concat(acc,
              |      array(cast(round(element_at(acc, -1) * fv, 9)
              |        as decimal(18,9))))),
              |    2, size(rows)))) AS z""".stripMargin))
          .select(col("arm"), col("ntot"), col("nev"),
            col("z.0").as("t"), col("z.1").as("sv"))
        val wLead = Window.partitionBy("arm").orderBy("t")
        val terms = zipped
          .withColumn("delta",
            coalesce(lead("t", 1).over(wLead), lit(tau)) - col("t"))
          .withColumn("term",
            (col("sv") * col("delta").cast("decimal(10,0)"))
              .cast("decimal(28,9)"))
        val rmst = terms.groupBy("arm", "ntot", "nev")
          .agg((min(col("t")).cast("decimal(28,9)") + sum(col("term")))
            .as("rm"))
        rmst.agg(
            max(when(col("arm") === 0, col("ntot"))).as("n_arm0"),
            max(when(col("arm") === 1, col("ntot"))).as("n_arm1"),
            max(when(col("arm") === 0, col("nev"))).as("ev_arm0"),
            max(when(col("arm") === 1, col("nev"))).as("ev_arm1"),
            max(when(col("arm") === 0, col("rm"))).as("r0"),
            max(when(col("arm") === 1, col("rm"))).as("r1"))
          .select(col("n_arm0"), col("n_arm1"), col("ev_arm0"),
            col("ev_arm1"),
            round(col("r0").cast("double"), 6).as("rmst_arm0"),
            round(col("r1").cast("double"), 6).as("rmst_arm1"),
            (round((col("r1") - col("r0")).cast("double"), 6) + lit(0.0))
              .as("rmst_diff"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
        su AS (
          SELECT user_id, MIN(ms) AS sms FROM e
          WHERE event_type = 'signup' GROUP BY 1),
        pu AS (
          SELECT e.user_id, MIN(ms) AS pms
          FROM e JOIN su ON e.user_id = su.user_id
          WHERE e.event_type = 'purchase' AND e.ms >= su.sms
          GROUP BY 1),
        mx AS (SELECT MAX(ms) AS mms FROM e),
        durs AS (
          SELECT CAST(su.user_id % 2 AS INT) AS arm,
                 CASE WHEN pms IS NOT NULL THEN 1 ELSE 0 END AS ev,
                 LEAST(CASE WHEN pms IS NOT NULL
                     THEN (pms - sms) // 86400000
                     ELSE (mms - sms) // 86400000 END, 30) AS t
          FROM su LEFT JOIN pu ON su.user_id = pu.user_id
          CROSS JOIN mx),
        ntot AS (
          SELECT arm, CAST(COUNT(*) AS BIGINT) AS ntot,
                 CAST(SUM(ev) AS BIGINT) AS nev
          FROM durs GROUP BY 1),
        lt AS (
          SELECT arm, t, CAST(SUM(ev) AS BIGINT) AS d,
                 CAST(COUNT(*) AS BIGINT) AS m
          FROM durs GROUP BY 1, 2),
        cum AS (
          SELECT lt.arm, t, d, ntot, nev,
                 CAST(ntot - (SUM(m) OVER (PARTITION BY lt.arm ORDER BY t
                   ROWS UNBOUNDED PRECEDING) - m) AS BIGINT) AS nr
          FROM lt JOIN ntot ON lt.arm = ntot.arm),
        c2 AS (
          SELECT arm, t, ntot, nev,
                 ROUND(CAST(1 AS DOUBLE)
                   - CAST(d AS DOUBLE) / CAST(nr AS DOUBLE), 9) AS f
          FROM cum),
        packed AS (
          SELECT arm, ntot, nev, list(t ORDER BY t) AS tl,
                 list(f ORDER BY t) AS fl
          FROM c2 GROUP BY 1, 2, 3),
        path AS (
          SELECT arm, ntot, nev, tl,
                 list_reduce(
                   list_prepend([CAST(1 AS DECIMAL(18,9))],
                     list_transform(fl,
                       f -> [CAST(f AS DECIMAL(18,9))])),
                   (acc, e) -> acc ||
                     [CAST(ROUND(acc[-1] * e[1], 9) AS DECIMAL(18,9))])
                   [2:] AS svals
          FROM packed),
        rows_z AS (
          SELECT arm, ntot, nev, unnest(tl) AS t, unnest(svals) AS sv
          FROM path),
        wd AS (
          SELECT arm, ntot, nev, t, sv,
                 COALESCE(LEAD(t) OVER (PARTITION BY arm ORDER BY t), 30)
                   - t AS delta
          FROM rows_z),
        rm AS (
          SELECT arm, ntot, nev,
                 CAST(MIN(t) AS DECIMAL(28,9))
                   + SUM(CAST(sv * CAST(delta AS DECIMAL(10,0))
                       AS DECIMAL(28,9))) AS rm
          FROM wd GROUP BY 1, 2, 3)
        SELECT MAX(CASE WHEN arm = 0 THEN ntot END) AS n_arm0,
               MAX(CASE WHEN arm = 1 THEN ntot END) AS n_arm1,
               MAX(CASE WHEN arm = 0 THEN nev END) AS ev_arm0,
               MAX(CASE WHEN arm = 1 THEN nev END) AS ev_arm1,
               ROUND(CAST(MAX(CASE WHEN arm = 0 THEN rm END) AS DOUBLE),
                 6) AS rmst_arm0,
               ROUND(CAST(MAX(CASE WHEN arm = 1 THEN rm END) AS DOUBLE),
                 6) AS rmst_arm1,
               ROUND(CAST(MAX(CASE WHEN arm = 1 THEN rm END)
                 - MAX(CASE WHEN arm = 0 THEN rm END) AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS rmst_diff
        FROM rm"""),
      headline = true),

    // Skyline (Pareto-front) operator over the brand panel: which
    // brands are not dominated on (unit price ↓, total volume ↑,
    // catalog breadth ↑)? The classic multi-objective DB operator —
    // weak dominance with at least one strict inequality, counted per
    // brand so "how contested" is visible, not just the frontier flag.
    // The 25-brand panel broadcasts; metrics are exact DECIMAL/integer
    // aggregates with one 9-grid price ratio.
    "qhb_skyline" -> Q(
      fn = (s, dir) => {
        val m = t(s, dir, "lineitem")
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand").as("brand"))
          .agg(
            round(sum(col("l_extendedprice").cast("decimal(18,2)"))
              .cast("double") /
              sum(col("l_quantity").cast("decimal(18,2)")).cast("double"),
              9).as("unit_price"),
            sum(col("l_quantity").cast("decimal(18,2)")).as("volume"),
            countDistinct(col("l_partkey")).as("n_parts"))
          .localCheckpoint(eager = false)
        val dom = m.crossJoin(broadcast(m.select(
            col("brand").as("b2"), col("unit_price").as("up2"),
            col("volume").as("vol2"), col("n_parts").as("np2"))))
          .filter(col("b2") =!= col("brand") &&
            col("up2") <= col("unit_price") &&
            col("vol2") >= col("volume") &&
            col("np2") >= col("n_parts") &&
            (col("up2") < col("unit_price") ||
              col("vol2") > col("volume") ||
              col("np2") > col("n_parts")))
          .groupBy(col("brand").as("bd"))
          .agg(count(lit(1)).as("dominated_by"))
        m.join(dom, col("brand") === col("bd"), "left")
          .select(col("brand"), round(col("unit_price"), 6).as("unit_price"),
            col("volume").cast("double").as("volume"),
            col("n_parts"),
            coalesce(col("dominated_by"), lit(0L)).as("dominated_by"),
            when(col("dominated_by").isNull, 1).otherwise(0).cast("int")
              .as("on_skyline"))
          .orderBy("brand")
      },
      oracle = Some("""
        WITH m AS MATERIALIZED (
          SELECT p_brand AS brand,
                 ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2)))
                   AS DOUBLE) /
                   CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE),
                   9) AS unit_price,
                 SUM(CAST(l_quantity AS DECIMAL(18,2))) AS volume,
                 CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY 1),
        dom AS (
          SELECT a.brand AS bd, CAST(COUNT(*) AS BIGINT) AS dominated_by
          FROM m a JOIN m b ON b.brand <> a.brand
            AND b.unit_price <= a.unit_price
            AND b.volume >= a.volume
            AND b.n_parts >= a.n_parts
            AND (b.unit_price < a.unit_price OR b.volume > a.volume
              OR b.n_parts > a.n_parts)
          GROUP BY 1)
        SELECT brand, ROUND(unit_price, 6) AS unit_price,
               CAST(volume AS DOUBLE) AS volume, n_parts,
               COALESCE(dominated_by, 0) AS dominated_by,
               CAST(CASE WHEN dominated_by IS NULL THEN 1 ELSE 0 END
                 AS INT) AS on_skyline
        FROM m LEFT JOIN dom ON brand = bd
        ORDER BY brand""")),

    // Qini curve for engagement-ranked uplift: users ranked by total
    // event count (the "model score"), exact-NTILE deciles (the q7v
    // cut formula), and per-decile cumulative incremental conversions
    // q(k) = convT(k) − convC(k)·NT(k)/NC(k) against the
    // random-targeting diagonal — the uplift-model acceptance curve
    // that qbm's per-segment effects don't order. Arms by the q7c
    // user-parity assignment; conversion = purchase within 1 day of
    // first view; everything integer until the final ratios.
    "qhc_qini_uplift" -> Q(
      fn = (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            unix_millis(col("ts")).as("ms"))
        val fv = e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("ms")).as("v0"))
        val conv = e.filter(col("event_type") === "purchase")
          .join(fv, "user_id")
          .filter(col("ms") >= col("v0") &&
            col("ms") < col("v0") + lit(86400000L))
          .select(col("user_id")).distinct()
          .withColumn("cv", lit(1L))
        val score = e.groupBy("user_id").agg(count(lit(1)).as("sc"))
        val base = score.join(fv, Seq("user_id"))
          .join(conv, Seq("user_id"), "left")
          .select(col("user_id"), col("sc"),
            (col("user_id") % 2).cast("int").as("arm"),
            coalesce(col("cv"), lit(0L)).as("cv"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(base,
          Seq(col("sc").desc, col("user_id")), "rn")
        val n0 = ranked.agg(count(lit(1)).as("n"))
        // exact NTILE(10) from the global row number (the q7v formula)
        val dec = ranked.crossJoin(broadcast(n0))
          .withColumn("base_sz", expr("n div 10"))
          .withColumn("rem", expr("n % 10"))
          .withColumn("cut", col("rem") * (col("base_sz") + 1))
          .withColumn("decile",
            expr("CAST(CASE WHEN rn <= cut" +
              " THEN (rn - 1) div (base_sz + 1) + 1" +
              " ELSE rem + (rn - 1 - cut) div base_sz + 1 END AS INT)"))
        val cells = dec.groupBy("decile")
          .agg(sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nt"),
            sum(when(col("arm") === 0, 1L).otherwise(0L)).as("nc"),
            sum(when(col("arm") === 1, col("cv")).otherwise(0L)).as("ct"),
            sum(when(col("arm") === 0, col("cv")).otherwise(0L)).as("cc"))
        val w = Window.orderBy("decile")
          .rowsBetween(Window.unboundedPreceding, 0)
        cells
          .withColumn("cnt", sum(col("nt")).over(w))
          .withColumn("cnc", sum(col("nc")).over(w))
          .withColumn("cct", sum(col("ct")).over(w))
          .withColumn("ccc", sum(col("cc")).over(w))
          .select(col("decile"), col("nt"), col("nc"), col("ct"),
            col("cc"),
            (round(col("cct").cast("double") -
              col("ccc").cast("double") * col("cnt").cast("double") /
              col("cnc").cast("double"), 6) + lit(0.0)).as("qini_q"))
          .orderBy("decile")
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
        fv AS (
          SELECT user_id, MIN(ms) AS v0 FROM e
          WHERE event_type = 'view' GROUP BY 1),
        conv AS (
          SELECT DISTINCT e.user_id, 1 AS cv
          FROM e JOIN fv ON e.user_id = fv.user_id
          WHERE e.event_type = 'purchase' AND e.ms >= fv.v0
            AND e.ms < fv.v0 + 86400000),
        score AS (
          SELECT user_id, CAST(COUNT(*) AS BIGINT) AS sc
          FROM e GROUP BY 1),
        base AS (
          SELECT score.user_id, sc,
                 CAST(score.user_id % 2 AS INT) AS arm,
                 CAST(COALESCE(cv, 0) AS BIGINT) AS cv
          FROM score JOIN fv ON score.user_id = fv.user_id
          LEFT JOIN conv ON score.user_id = conv.user_id),
        ranked AS (
          SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY sc DESC, user_id)
                   AS BIGINT) AS rn,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM base) AS n
          FROM base),
        dec AS (
          SELECT *, CAST(CASE WHEN rn <= rem * (base_sz + 1)
                   THEN (rn - 1) // (base_sz + 1) + 1
                   ELSE rem + (rn - 1 - rem * (base_sz + 1)) // base_sz
                     + 1 END AS INT) AS decile
          FROM (SELECT *, n // 10 AS base_sz, n % 10 AS rem FROM ranked)),
        cells AS (
          SELECT decile,
                 CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS nt,
                 CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS nc,
                 CAST(SUM(CASE WHEN arm = 1 THEN cv ELSE 0 END) AS BIGINT)
                   AS ct,
                 CAST(SUM(CASE WHEN arm = 0 THEN cv ELSE 0 END) AS BIGINT)
                   AS cc
          FROM dec GROUP BY 1),
        cum AS (
          SELECT decile, nt, nc, ct, cc,
                 CAST(SUM(nt) OVER (ORDER BY decile
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cnt,
                 CAST(SUM(nc) OVER (ORDER BY decile
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cnc,
                 CAST(SUM(ct) OVER (ORDER BY decile
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cct,
                 CAST(SUM(cc) OVER (ORDER BY decile
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ccc
          FROM cells)
        SELECT decile, nt, nc, ct, cc,
               ROUND(CAST(cct AS DOUBLE) - CAST(ccc AS DOUBLE)
                 * CAST(cnt AS DOUBLE) / CAST(cnc AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS qini_q
        FROM cum ORDER BY decile""")),

    // Funnel bullwhip: variance amplification down the
    // view→click→purchase daily-count chain — Var and CV² ratios per
    // adjacent stage (CV² is the classical bullwhip measure; raw
    // variance ratios mislead when stage means differ 10×, exactly
    // this funnel). Integer daily counts, exact integer power sums,
    // doubles only in the final ratios.
    "qhd_bullwhip" -> Q(
      fn = (s, dir) => {
        val d = t(s, dir, "events")
          .groupBy(expr("unix_millis(ts) div 86400000").as("day"))
          .agg(
            sum(when(col("event_type") === "view", 1L).otherwise(0L))
              .as("v"),
            sum(when(col("event_type") === "click", 1L).otherwise(0L))
              .as("c"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("p"))
        val m = d.agg(count(lit(1)).as("n"),
          sum(col("v")).as("sv"), sum(col("v") * col("v")).as("svv"),
          sum(col("c")).as("sc"), sum(col("c") * col("c")).as("scc"),
          sum(col("p")).as("sp"), sum(col("p") * col("p")).as("spp"))
        def vr(sx: String, sxx: String) =
          (col("n").cast("double") * col(sxx).cast("double") -
            col(sx).cast("double") * col(sx).cast("double")) /
          (col("n").cast("double") * (col("n") - 1).cast("double"))
        def cv2(sx: String, sxx: String) =
          vr(sx, sxx) /
            ((col(sx).cast("double") / col("n").cast("double")) *
             (col(sx).cast("double") / col("n").cast("double")))
        m.select(col("n").as("n_days"),
            round(vr("sv", "svv"), 6).as("var_views"),
            round(vr("sc", "scc"), 6).as("var_clicks"),
            round(vr("sp", "spp"), 6).as("var_purchases"),
            round(vr("sc", "scc") / vr("sv", "svv"), 6)
              .as("var_ratio_click_view"),
            round(vr("sp", "spp") / vr("sc", "scc"), 6)
              .as("var_ratio_purchase_click"),
            round(cv2("sc", "scc") / cv2("sv", "svv"), 6)
              .as("bullwhip_click_view"),
            round(cv2("sp", "spp") / cv2("sc", "scc"), 6)
              .as("bullwhip_purchase_click"))
      },
      oracle = Some("""
        WITH d AS (
          SELECT epoch_ms(ts) // 86400000 AS day,
                 CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                   AS BIGINT) AS v,
                 CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0
                   END) AS BIGINT) AS c,
                 CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                   END) AS BIGINT) AS p
          FROM events GROUP BY 1),
        m AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(v) AS BIGINT) AS sv,
                 CAST(SUM(v * v) AS BIGINT) AS svv,
                 CAST(SUM(c) AS BIGINT) AS sc,
                 CAST(SUM(c * c) AS BIGINT) AS scc,
                 CAST(SUM(p) AS BIGINT) AS sp,
                 CAST(SUM(p * p) AS BIGINT) AS spp
          FROM d),
        f AS (
          SELECT n,
                 (CAST(n AS DOUBLE) * CAST(svv AS DOUBLE)
                   - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE))
                   / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) AS vv,
                 (CAST(n AS DOUBLE) * CAST(scc AS DOUBLE)
                   - CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE))
                   / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) AS vc,
                 (CAST(n AS DOUBLE) * CAST(spp AS DOUBLE)
                   - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE))
                   / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)) AS vp,
                 CAST(sv AS DOUBLE) / CAST(n AS DOUBLE) AS mv,
                 CAST(sc AS DOUBLE) / CAST(n AS DOUBLE) AS mc,
                 CAST(sp AS DOUBLE) / CAST(n AS DOUBLE) AS mp
          FROM m)
        SELECT n AS n_days,
               ROUND(vv, 6) AS var_views,
               ROUND(vc, 6) AS var_clicks,
               ROUND(vp, 6) AS var_purchases,
               ROUND(vc / vv, 6) AS var_ratio_click_view,
               ROUND(vp / vc, 6) AS var_ratio_purchase_click,
               ROUND((vc / (mc * mc)) / (vv / (mv * mv)), 6)
                 AS bullwhip_click_view,
               ROUND((vp / (mp * mp)) / (vc / (mc * mc)), 6)
                 AS bullwhip_purchase_click
        FROM f""")),

    // Kaplan–Meier median time-to-first-error with a test-inversion
    // confidence interval from the qh6 Greenwood bands: the median is
    // the first life-table day whose log-survival crosses ln(0.5), the
    // CI collects the days whose ±1.96·SE log-band still CONTAINS
    // ln(0.5) — all on the log scale (rule 14: no exp), with ln(0.5)
    // spelled as the shared 15-digit literal so both engines compare
    // against the identical constant.
    "qhe_km_median_ci" -> Q(
      fn = (s, dir) => {
        val lnHalf = -0.693147180559945
        val e = t(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            unix_millis(col("ts")).as("ms"))
        val su = e.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min(col("ms")).as("sms"))
        val er = e.filter(col("event_type") === "error")
          .join(su, "user_id")
          .filter(col("ms") >= col("sms"))
          .groupBy("user_id").agg(min(col("ms")).as("ems"))
        val mx = e.agg(max(col("ms")).as("mms"))
        val durs = su.join(er, Seq("user_id"), "left")
          .crossJoin(broadcast(mx))
          .select(
            when(col("ems").isNotNull, 1L).otherwise(0L).as("ev"),
            when(col("ems").isNotNull, expr("(ems - sms) div 86400000"))
              .otherwise(expr("(mms - sms) div 86400000")).as("t"))
        val ntot = durs.agg(count(lit(1)).as("ntot"))
        val lt = durs.groupBy("t")
          .agg(sum(col("ev")).as("d"), count(lit(1)).as("m"))
        val w = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
        val bands = lt.crossJoin(broadcast(ntot))
          .withColumn("nr", col("ntot") -
            (sum(col("m")).over(w) - col("m")))
          .filter(col("d") < col("nr"))
          .withColumn("lnf", round(log(lit(1.0) -
            col("d").cast("double") / col("nr").cast("double")), 12)
            .cast("decimal(28,12)"))
          .withColumn("gw", round(col("d").cast("double") /
            (col("nr").cast("double") *
              (col("nr") - col("d")).cast("double")), 12)
            .cast("decimal(28,12)"))
          .withColumn("lns", sum(col("lnf")).over(w).cast("double"))
          .withColumn("se", sqrt(sum(col("gw")).over(w).cast("double")))
          .withColumn("lo", col("lns") - lit(1.96) * col("se"))
          .withColumn("hi", col("lns") + lit(1.96) * col("se"))
        bands.agg(
            min(when(col("lns") <= lit(lnHalf), col("t"))).as("t_median"),
            min(when(col("lo") <= lit(lnHalf), col("t"))).as("t_ci_lo"),
            min(when(col("hi") <= lit(lnHalf), col("t"))).as("t_ci_hi"),
            count(lit(1)).as("n_times"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
        su AS (
          SELECT user_id, MIN(ms) AS sms FROM e
          WHERE event_type = 'signup' GROUP BY 1),
        er AS (
          SELECT e.user_id, MIN(ms) AS ems
          FROM e JOIN su ON e.user_id = su.user_id
          WHERE e.event_type = 'error' AND e.ms >= su.sms
          GROUP BY 1),
        mx AS (SELECT MAX(ms) AS mms FROM e),
        durs AS (
          SELECT CASE WHEN ems IS NOT NULL THEN 1 ELSE 0 END AS ev,
                 CASE WHEN ems IS NOT NULL THEN (ems - sms) // 86400000
                      ELSE (mms - sms) // 86400000 END AS t
          FROM su LEFT JOIN er ON su.user_id = er.user_id
          CROSS JOIN mx),
        ntot AS (SELECT CAST(COUNT(*) AS BIGINT) AS ntot FROM durs),
        lt AS (
          SELECT t, CAST(SUM(ev) AS BIGINT) AS d,
                 CAST(COUNT(*) AS BIGINT) AS m
          FROM durs GROUP BY 1),
        cum AS (
          SELECT t, d,
                 CAST(ntot - (SUM(m) OVER (ORDER BY t
                   ROWS UNBOUNDED PRECEDING) - m) AS BIGINT) AS nr
          FROM lt CROSS JOIN ntot),
        fl AS (
          SELECT t, d, nr,
                 CAST(ROUND(ln(CAST(1 AS DOUBLE)
                   - CAST(d AS DOUBLE) / CAST(nr AS DOUBLE)), 12)
                   AS DECIMAL(28,12)) AS lnf,
                 CAST(ROUND(CAST(d AS DOUBLE)
                   / (CAST(nr AS DOUBLE) * CAST(nr - d AS DOUBLE)), 12)
                   AS DECIMAL(28,12)) AS gw
          FROM cum WHERE d < nr),
        cc AS (
          SELECT t,
                 CAST(SUM(lnf) OVER (ORDER BY t
                   ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS lns,
                 SQRT(CAST(SUM(gw) OVER (ORDER BY t
                   ROWS UNBOUNDED PRECEDING) AS DOUBLE)) AS se
          FROM fl)
        SELECT MIN(CASE WHEN lns <= CAST(-0.693147180559945 AS DOUBLE)
                 THEN t END) AS t_median,
               MIN(CASE WHEN lns - CAST(1.96 AS DOUBLE) * se
                 <= CAST(-0.693147180559945 AS DOUBLE) THEN t END)
                 AS t_ci_lo,
               MIN(CASE WHEN lns + CAST(1.96 AS DOUBLE) * se
                 <= CAST(-0.693147180559945 AS DOUBLE) THEN t END)
                 AS t_ci_hi,
               CAST(COUNT(*) AS BIGINT) AS n_times
        FROM cc""")),

    // Cross-price elasticity matrix for the top-3 brands by volume:
    // OLS slope of ln(daily quantity of brand A) on ln(daily mean unit
    // price of brand B) over shared days — own-price elasticities on
    // the diagonal (qbh's single-brand number), substitution /
    // complementarity off it. ln links only (proven parity); 9-grid
    // series, DECIMAL moment sums, bounded 3×3 output.
    "qhf_cross_elasticity" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem")
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .select(col("p_brand").as("brand"),
            expr("unix_millis(CAST(o_orderdate AS TIMESTAMP))" +
              " div 86400000").as("day"),
            col("l_extendedprice").cast("decimal(18,2)").as("ep"),
            col("l_quantity").cast("decimal(18,2)").as("qty"))
        val top = li.groupBy("brand").agg(sum(col("qty")).as("tv"))
          .orderBy(col("tv").desc, col("brand")).limit(3)
          .select(col("brand").as("tb"))
        val daily = li.join(broadcast(top), col("brand") === col("tb"))
          .groupBy("brand", "day")
          .agg(round(log(sum(col("qty")).cast("double")), 9).as("lq"),
            round(log(sum(col("ep")).cast("double") /
              sum(col("qty")).cast("double")), 9).as("lp"))
          .localCheckpoint(eager = false)
        val pairs = daily.select(col("brand").as("ba"), col("day"),
            col("lq"))
          .join(daily.select(col("brand").as("bb"), col("day").as("d2"),
            col("lp")), col("day") === col("d2"))
        pairs.groupBy(col("ba").as("brand_qty"), col("bb").as("brand_price"))
          .agg(count(lit(1)).as("n_days"),
            sum(g9(col("lp"))).as("sx"), sum(g9(col("lq"))).as("sy"),
            sum(g9(round(col("lp") * col("lq"), 9))).as("sxy"),
            sum(g9(round(col("lp") * col("lp"), 9))).as("sxx"))
          .select(col("brand_qty"), col("brand_price"), col("n_days"),
            (round((col("n_days").cast("double") *
              col("sxy").cast("double") -
              col("sx").cast("double") * col("sy").cast("double")) /
              (col("n_days").cast("double") * col("sxx").cast("double") -
                col("sx").cast("double") * col("sx").cast("double")), 6)
              + lit(0.0)).as("elasticity"))
          .orderBy("brand_qty", "brand_price")
      },
      oracle = Some("""
        WITH li AS (
          SELECT p_brand AS brand,
                 CAST(epoch_ms(o_orderdate) // 86400000 AS BIGINT) AS day,
                 CAST(l_extendedprice AS DECIMAL(18,2)) AS ep,
                 CAST(l_quantity AS DECIMAL(18,2)) AS qty
          FROM lineitem JOIN part ON l_partkey = p_partkey
          JOIN orders ON l_orderkey = o_orderkey),
        top AS (
          SELECT brand AS tb FROM (
            SELECT brand, SUM(qty) AS tv FROM li GROUP BY 1)
          ORDER BY tv DESC, brand LIMIT 3),
        daily AS MATERIALIZED (
          SELECT brand, day,
                 ROUND(ln(CAST(SUM(qty) AS DOUBLE)), 9) AS lq,
                 ROUND(ln(CAST(SUM(ep) AS DOUBLE)
                   / CAST(SUM(qty) AS DOUBLE)), 9) AS lp
          FROM li JOIN top ON brand = tb
          GROUP BY 1, 2),
        pairs AS (
          SELECT a.brand AS brand_qty, b.brand AS brand_price,
                 a.lq, b.lp
          FROM daily a JOIN daily b ON a.day = b.day),
        mm AS (
          SELECT brand_qty, brand_price,
                 CAST(COUNT(*) AS BIGINT) AS n_days,
                 SUM(CAST(ROUND(lp, 9) AS DECIMAL(20,9))) AS sx,
                 SUM(CAST(ROUND(lq, 9) AS DECIMAL(20,9))) AS sy,
                 SUM(CAST(ROUND(lp * lq, 9) AS DECIMAL(20,9))) AS sxy,
                 SUM(CAST(ROUND(lp * lp, 9) AS DECIMAL(20,9))) AS sxx
          FROM pairs GROUP BY 1, 2)
        SELECT brand_qty, brand_price, n_days,
               ROUND((CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE)
                 - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS elasticity
        FROM mm ORDER BY brand_qty, brand_price""")),

    // Mincer–Zarnowitz forecast-rationality regression: realized daily
    // revenue on the naive lag-1 forecast — an unbiased, efficient
    // forecaster has (α, β) = (0, 1), and the joint F-stat
    // [(SSE₀ − SSE)/2] / [SSE/(n−2)] prices the deviation. SSE₀ under
    // H₀ is Σ(y−ŷ)² from raw power sums, SSE from the fitted line —
    // both algebraic in DECIMAL moment images; the verdict companion
    // to qfz's loss battery and qgg's loss COMPARISON.
    "qhg_mincer_zarnowitz" -> Q(
      fn = (s, dir) => {
        val y = dailyRevenueM(s, dir)
        val w = Window.orderBy("day")
        val p = y.withColumn("fh", lag("ym", 1).over(w))
          .filter(col("fh").isNotNull)
          .select(col("ym").as("yv"), col("fh"))
        val m = p.agg(count(lit(1)).as("n"),
          sum(col("fh")).as("sx"), sum(col("yv")).as("sy"),
          sum((col("fh") * col("yv")).cast("decimal(38,16)")).as("sxy"),
          sum((col("fh") * col("fh")).cast("decimal(38,16)")).as("sxx"),
          sum((col("yv") * col("yv")).cast("decimal(38,16)")).as("syy"),
          sum(((col("yv") - col("fh")) * (col("yv") - col("fh")))
            .cast("decimal(38,16)")).as("see"))
        m.select(col("n"),
            col("n").cast("double").as("nd"),
            col("sx").cast("double").as("sxd"),
            col("sy").cast("double").as("syd"),
            expr("CAST(CAST(sxy AS STRING) AS DOUBLE)").as("sxyd"),
            expr("CAST(CAST(sxx AS STRING) AS DOUBLE)").as("sxxd"),
            expr("CAST(CAST(syy AS STRING) AS DOUBLE)").as("syyd"),
            expr("CAST(CAST(see AS STRING) AS DOUBLE)").as("seed"))
          .withColumn("b", (col("nd") * col("sxyd") -
            col("sxd") * col("syd")) /
            (col("nd") * col("sxxd") - col("sxd") * col("sxd")))
          .withColumn("a", (col("syd") - col("b") * col("sxd")) / col("nd"))
          .withColumn("sse", col("syyd") -
            col("a") * col("syd") - col("b") * col("sxyd"))
          .select(col("n").as("n_days"),
            (round(col("a"), 6) + lit(0.0)).as("alpha"),
            round(col("b"), 6).as("beta"),
            (round((col("seed") - col("sse")) / lit(2.0) /
              (col("sse") / (col("nd") - lit(2.0))), 6) + lit(0.0))
              .as("mz_f_stat"),
            when((col("seed") - col("sse")) / lit(2.0) /
              (col("sse") / (col("nd") - lit(2.0))) > lit(3.0),
              "reject_rationality").otherwise("consistent")
              .as("verdict"))
      },
      oracle = Some(s"""
        WITH y AS ($dailyRevenueMSql),
        p AS (
          SELECT ym AS yv, fh FROM (
            SELECT day, ym, LAG(ym) OVER (ORDER BY day) AS fh FROM y)
          WHERE fh IS NOT NULL),
        m AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(fh) AS sx, SUM(yv) AS sy,
                 SUM(CAST(fh AS DECIMAL(19,8))
                   * CAST(yv AS DECIMAL(19,8))) AS sxy,
                 SUM(CAST(fh AS DECIMAL(19,8))
                   * CAST(fh AS DECIMAL(19,8))) AS sxx,
                 SUM(CAST(yv AS DECIMAL(19,8))
                   * CAST(yv AS DECIMAL(19,8))) AS syy,
                 SUM(CAST(yv - fh AS DECIMAL(19,8))
                   * CAST(yv - fh AS DECIMAL(19,8))) AS see
          FROM p),
        d AS (
          SELECT n, CAST(n AS DOUBLE) AS nd,
                 CAST(sx AS DOUBLE) AS sxd, CAST(sy AS DOUBLE) AS syd,
                 CAST(CAST(sxy AS VARCHAR) AS DOUBLE) AS sxyd,
                 CAST(CAST(sxx AS VARCHAR) AS DOUBLE) AS sxxd,
                 CAST(CAST(syy AS VARCHAR) AS DOUBLE) AS syyd,
                 CAST(CAST(see AS VARCHAR) AS DOUBLE) AS seed
          FROM m),
        f AS (
          SELECT *, (syd - b * sxd) / nd AS a
          FROM (SELECT *, (nd * sxyd - sxd * syd)
                  / (nd * sxxd - sxd * sxd) AS b FROM d)),
        g AS (
          SELECT *, syyd - a * syd - b * sxyd AS sse FROM f)
        SELECT n AS n_days,
               ROUND(a, 6) + CAST(0 AS DOUBLE) AS alpha,
               ROUND(b, 6) AS beta,
               ROUND((seed - sse) / CAST(2 AS DOUBLE)
                 / (sse / (nd - CAST(2 AS DOUBLE))), 6)
                 + CAST(0 AS DOUBLE) AS mz_f_stat,
               CASE WHEN (seed - sse) / CAST(2 AS DOUBLE)
                 / (sse / (nd - CAST(2 AS DOUBLE)))
                 > CAST(3 AS DOUBLE) THEN 'reject_rationality'
                 ELSE 'consistent' END AS verdict
        FROM g""")),

    // Lorenz asymmetry coefficient for order values: S = F(μ) + L(μ) —
    // the share of orders below the mean plus their value share. S < 1
    // says inequality is driven by many small orders, S > 1 by a few
    // giants — the SHAPE diagnostic the scalar Gini (q6m) and the
    // Lorenz points (q7m) leave ambiguous (two very different
    // economies share a Gini). Exact integer counts and DECIMAL value
    // sums against the exact 9-grid mean; two final divisions.
    "qhh_lorenz_asymmetry" -> Q(
      fn = (s, dir) => {
        val o = t(s, dir, "orders")
          .select(col("o_totalprice").cast("decimal(18,2)").as("v"))
        val mu = o.agg(count(lit(1)).as("n"), sum(col("v")).as("sv"))
          .select(col("n"), col("sv"),
            round(col("sv").cast("double") / col("n").cast("double"), 9)
              .as("mu"))
        o.crossJoin(broadcast(mu))
          .agg(max(col("n")).as("n_orders"),
            max(col("mu")).as("mu"),
            max(col("sv")).as("sv"),
            sum(when(col("v").cast("double") < col("mu"), 1L)
              .otherwise(0L)).as("n_below"),
            sum(when(col("v").cast("double") < col("mu"), col("v"))
              .otherwise(lit(0).cast("decimal(18,2)"))).as("v_below"))
          .select(col("n_orders"),
            round(col("mu"), 6).as("mean_value"),
            col("n_below"),
            round(col("n_below").cast("double") /
              col("n_orders").cast("double"), 6).as("f_mu"),
            round(col("v_below").cast("double") /
              col("sv").cast("double"), 6).as("l_mu"),
            round(col("n_below").cast("double") /
              col("n_orders").cast("double") +
              col("v_below").cast("double") / col("sv").cast("double"), 6)
              .as("lorenz_asymmetry"))
      },
      oracle = Some("""
        WITH o AS (
          SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS v FROM orders),
        mu AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(v) AS sv,
                 ROUND(CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
                   9) AS mu
          FROM o),
        f AS (
          SELECT MAX(n) AS n_orders, MAX(mu) AS mu,
                 CAST(MAX(sv) AS DOUBLE) AS svd,
                 CAST(SUM(CASE WHEN CAST(v AS DOUBLE) < mu THEN 1 ELSE 0
                   END) AS BIGINT) AS n_below,
                 CAST(SUM(CASE WHEN CAST(v AS DOUBLE) < mu THEN v
                   ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE)
                   AS v_below
          FROM o CROSS JOIN mu)
        SELECT n_orders,
               ROUND(mu, 6) AS mean_value,
               n_below,
               ROUND(CAST(n_below AS DOUBLE) / CAST(n_orders AS DOUBLE),
                 6) AS f_mu,
               ROUND(v_below / svd, 6) AS l_mu,
               ROUND(CAST(n_below AS DOUBLE) / CAST(n_orders AS DOUBLE)
                 + v_below / svd, 6) AS lorenz_asymmetry
        FROM f""")),

    // Daily growth accounting: every active user classified as new
    // (first-ever day), retained (also active yesterday) or
    // resurrected (seen before, skipped ≥1 day), with churned = users
    // active yesterday who went dark today — and the quick ratio
    // (new + resurrected)/churned that separates leaky-bucket growth
    // from compounding growth. The product-analytics ledger the
    // retention matrix (q4a) summarizes away. Pure integer per-user
    // lag/lead classification over the bounded user × day activity
    // table; one guarded ratio.
    "qhi_growth_accounting" -> Q(
      fn = (s, dir) => {
        val act = t(s, dir, "events")
          .select(col("user_id"),
            expr("unix_millis(ts) div 86400000").as("day"))
          .distinct()
        val mx = act.agg(max(col("day")).as("maxday"))
        val wU = Window.partitionBy("user_id").orderBy("day")
        val cls = act
          .withColumn("first_day", min(col("day")).over(
            Window.partitionBy("user_id")))
          .withColumn("prev", lag("day", 1).over(wU))
          .withColumn("next", lead("day", 1).over(wU))
        val daily = cls.groupBy("day")
          .agg(count(lit(1)).as("active"),
            sum(when(col("day") === col("first_day"), 1L).otherwise(0L))
              .as("new_users"),
            sum(when(col("prev") === col("day") - 1, 1L).otherwise(0L))
              .as("retained"),
            sum(when(col("day") =!= col("first_day") &&
              (col("prev").isNull || col("prev") < col("day") - 1), 1L)
              .otherwise(0L)).as("resurrected"))
        // churn attributed to day d+1: active on d, not active on d+1
        val churn = cls.crossJoin(broadcast(mx))
          .filter(col("day") < col("maxday") &&
            (col("next").isNull || col("next") =!= col("day") + 1))
          .groupBy((col("day") + 1).as("cday"))
          .agg(count(lit(1)).as("churned"))
        daily.join(churn, col("day") === col("cday"), "left")
          .select(col("day"), col("active"), col("new_users"),
            col("retained"), col("resurrected"),
            coalesce(col("churned"), lit(0L)).as("churned"),
            when(coalesce(col("churned"), lit(0L)) > 0,
              round((col("new_users") + col("resurrected")).cast("double")
                / col("churned").cast("double"), 6)).as("quick_ratio"))
          .orderBy("day")
      },
      oracle = Some("""
        WITH act AS (
          SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day
          FROM events),
        mx AS (SELECT MAX(day) AS maxday FROM act),
        cls AS (
          SELECT user_id, day,
                 MIN(day) OVER (PARTITION BY user_id) AS first_day,
                 LAG(day) OVER (PARTITION BY user_id ORDER BY day)
                   AS prev,
                 LEAD(day) OVER (PARTITION BY user_id ORDER BY day)
                   AS next
          FROM act),
        daily AS (
          SELECT day, CAST(COUNT(*) AS BIGINT) AS active,
                 CAST(SUM(CASE WHEN day = first_day THEN 1 ELSE 0 END)
                   AS BIGINT) AS new_users,
                 CAST(SUM(CASE WHEN prev = day - 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS retained,
                 CAST(SUM(CASE WHEN day <> first_day
                   AND (prev IS NULL OR prev < day - 1) THEN 1 ELSE 0
                   END) AS BIGINT) AS resurrected
          FROM cls GROUP BY 1),
        churn AS (
          SELECT day + 1 AS cday, CAST(COUNT(*) AS BIGINT) AS churned
          FROM cls CROSS JOIN mx
          WHERE day < maxday AND (next IS NULL OR next <> day + 1)
          GROUP BY 1)
        SELECT day, active, new_users, retained, resurrected,
               COALESCE(churned, 0) AS churned,
               CASE WHEN COALESCE(churned, 0) > 0 THEN
                 ROUND(CAST(new_users + resurrected AS DOUBLE)
                   / CAST(churned AS DOUBLE), 6) END AS quick_ratio
        FROM daily LEFT JOIN churn ON day = cday
        ORDER BY day""")),

    // LMDI (log-mean Divisia) decomposition of the revenue change
    // across the qbk period cut through the multiplicative KPI tree
    // revenue = customers × orders-per-customer × revenue-per-order:
    // each factor's contribution is L(V₁,V₀)·ln(X₁/X₀) with the
    // logarithmic mean L(a,b) = (a−b)/(ln a − ln b) — the only
    // decomposition that is exactly additive with no residual (the
    // Divisia property), unlike naive one-at-a-time bridges. ln links
    // only; the reported residual row PROVES additivity to rounding.
    "qhj_lmdi_decomposition" -> Q(
      fn = (s, dir) => {
        val o = t(s, dir, "orders")
          .select(
            when(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"),
              1).otherwise(0).as("per"),
            col("o_custkey"),
            (col("o_totalprice").cast("decimal(18,2)") / lit(1000000))
              .cast("decimal(18,8)").as("v"))
        val cells = o.groupBy("per")
          .agg(countDistinct(col("o_custkey")).as("c"),
            count(lit(1)).as("nord"), sum(col("v")).as("rev"))
        def p(per: Int, c: String) = max(when(col("per") === per, col(c)))
        cells.agg(
            p(0, "c").as("c0"), p(1, "c").as("c1"),
            p(0, "nord").as("n0"), p(1, "nord").as("n1"),
            p(0, "rev").as("v0"), p(1, "rev").as("v1"))
          .select(col("c0"), col("c1"), col("n0"), col("n1"),
            col("v0").cast("double").as("v0d"),
            col("v1").cast("double").as("v1d"),
            col("c0").cast("double").as("c0d"),
            col("c1").cast("double").as("c1d"),
            col("n0").cast("double").as("n0d"),
            col("n1").cast("double").as("n1d"))
          .withColumn("lm", (col("v1d") - col("v0d")) /
            (log(col("v1d")) - log(col("v0d"))))
          .withColumn("dc", col("lm") * log(col("c1d") / col("c0d")))
          .withColumn("df", col("lm") * log((col("n1d") / col("c1d")) /
            (col("n0d") / col("c0d"))))
          .withColumn("da", col("lm") * log((col("v1d") / col("n1d")) /
            (col("v0d") / col("n0d"))))
          .select(
            round(col("v0d"), 6).as("rev_pre_m"),
            round(col("v1d"), 6).as("rev_post_m"),
            (round(col("v1d") - col("v0d"), 6) + lit(0.0)).as("delta_m"),
            (round(col("dc"), 6) + lit(0.0)).as("contrib_customers"),
            (round(col("df"), 6) + lit(0.0)).as("contrib_frequency"),
            (round(col("da"), 6) + lit(0.0)).as("contrib_basket"),
            (round(col("v1d") - col("v0d") -
              col("dc") - col("df") - col("da"), 6) + lit(0.0))
              .as("residual"))
      },
      oracle = Some("""
        WITH o AS (
          SELECT CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01'
                 THEN 1 ELSE 0 END AS per,
                 o_custkey,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) / 1000000
                   AS DECIMAL(18,8)) AS v
          FROM orders),
        cells AS (
          SELECT per, CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS c,
                 CAST(COUNT(*) AS BIGINT) AS nord, SUM(v) AS rev
          FROM o GROUP BY 1),
        w AS (
          SELECT CAST(MAX(CASE WHEN per = 0 THEN c END) AS DOUBLE) AS c0d,
                 CAST(MAX(CASE WHEN per = 1 THEN c END) AS DOUBLE) AS c1d,
                 CAST(MAX(CASE WHEN per = 0 THEN nord END) AS DOUBLE)
                   AS n0d,
                 CAST(MAX(CASE WHEN per = 1 THEN nord END) AS DOUBLE)
                   AS n1d,
                 CAST(MAX(CASE WHEN per = 0 THEN rev END) AS DOUBLE)
                   AS v0d,
                 CAST(MAX(CASE WHEN per = 1 THEN rev END) AS DOUBLE)
                   AS v1d
          FROM cells),
        f AS (
          SELECT *, (v1d - v0d) / (ln(v1d) - ln(v0d)) AS lm
          FROM w),
        g AS (
          SELECT *,
                 lm * ln(c1d / c0d) AS dc,
                 lm * ln((n1d / c1d) / (n0d / c0d)) AS df,
                 lm * ln((v1d / n1d) / (v0d / n0d)) AS da
          FROM f)
        SELECT ROUND(v0d, 6) AS rev_pre_m,
               ROUND(v1d, 6) AS rev_post_m,
               ROUND(v1d - v0d, 6) + CAST(0 AS DOUBLE) AS delta_m,
               ROUND(dc, 6) + CAST(0 AS DOUBLE) AS contrib_customers,
               ROUND(df, 6) + CAST(0 AS DOUBLE) AS contrib_frequency,
               ROUND(da, 6) + CAST(0 AS DOUBLE) AS contrib_basket,
               ROUND(v1d - v0d - dc - df - da, 6) + CAST(0 AS DOUBLE)
                 AS residual
        FROM g""")),

    // Kupiec proportion-of-failures VaR backtest: the 95% historical
    // VaR of daily revenue changes is estimated on the FIRST half of
    // the series (exact order statistic at rank ⌈0.05·n⌉, integer
    // arithmetic) and tested out-of-sample on the second half — breach
    // count vs the 5% coverage through the binomial likelihood ratio
    // LR = 2[x·ln((x/n)/p) + (n−x)·ln((1−x/n)/(1−p))] ~ χ²(1). The
    // governance loop qfi's in-sample VaR number lacks: a VaR that
    // never gets backtested is a guess. ln links only; breach
    // comparisons on exact DECIMALs.
    "qhk_var_backtest" -> Q(
      fn = (s, dir) => {
        val y = dailyRevenueM(s, dir)
        val w = Window.orderBy("day")
        val d = y.withColumn("prev", lag("ym", 1).over(w))
          .filter(col("prev").isNotNull)
          .select(col("day"), (col("ym") - col("prev")).as("chg"))
          .localCheckpoint(eager = false)
        val n0 = d.agg(count(lit(1)).as("ntot"))
        val split = d.crossJoin(broadcast(n0))
          .withColumn("rn_t", row_number().over(Window.orderBy("day")))
          .withColumn("half", when(col("rn_t") * 2 <= col("ntot"), 0)
            .otherwise(1))
        val h1 = split.filter(col("half") === 0)
        val n1 = h1.agg(count(lit(1)).as("n1"))
        val varRow = h1.crossJoin(broadcast(n1))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("chg"), col("day"))))
          .filter(col("rk") === expr("(n1 + 19) div 20"))
          .select(col("chg").as("var95"), col("n1"))
        val h2 = split.filter(col("half") === 1)
        h2.crossJoin(broadcast(varRow))
          .agg(max(col("n1")).as("n_train"),
            count(lit(1)).as("n_test"),
            max(col("var95")).as("v95"),
            sum(when(col("chg") < col("var95"), 1L).otherwise(0L))
              .as("breaches"))
          .select(col("n_train"), col("n_test"),
            round(col("v95").cast("double"), 6).as("var95_m"),
            col("breaches"),
            round(col("breaches").cast("double") /
              col("n_test").cast("double"), 6).as("breach_rate"),
            (round(lit(2.0) * (
              when(col("breaches") > 0,
                col("breaches").cast("double") *
                log((col("breaches").cast("double") /
                  col("n_test").cast("double")) / lit(0.05)))
                .otherwise(lit(0.0)) +
              when(col("breaches") < col("n_test"),
                (col("n_test") - col("breaches")).cast("double") *
                log((lit(1.0) - col("breaches").cast("double") /
                  col("n_test").cast("double")) / lit(0.95)))
                .otherwise(lit(0.0))), 6) + lit(0.0)).as("kupiec_lr"))
      },
      oracle = Some(s"""
        WITH y AS ($dailyRevenueMSql),
        d AS (
          SELECT day, ym - prev AS chg FROM (
            SELECT day, ym, LAG(ym) OVER (ORDER BY day) AS prev FROM y)
          WHERE prev IS NOT NULL),
        n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS ntot FROM d),
        split AS (
          SELECT day, chg,
                 CASE WHEN CAST(ROW_NUMBER() OVER (ORDER BY day)
                   AS BIGINT) * 2 <= ntot THEN 0 ELSE 1 END AS half
          FROM d CROSS JOIN n0),
        n1 AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n1 FROM split
          WHERE half = 0),
        v AS (
          SELECT chg AS var95, n1 FROM (
            SELECT chg, n1, ROW_NUMBER() OVER (ORDER BY chg, day) AS rk
            FROM split CROSS JOIN n1 WHERE half = 0)
          WHERE rk = (n1 + 19) // 20),
        f AS (
          SELECT MAX(n1) AS n_train,
                 CAST(COUNT(*) AS BIGINT) AS n_test,
                 MAX(var95) AS v95,
                 CAST(SUM(CASE WHEN chg < var95 THEN 1 ELSE 0 END)
                   AS BIGINT) AS breaches
          FROM split CROSS JOIN v WHERE half = 1)
        SELECT n_train, n_test,
               ROUND(CAST(v95 AS DOUBLE), 6) AS var95_m,
               breaches,
               ROUND(CAST(breaches AS DOUBLE) / CAST(n_test AS DOUBLE), 6)
                 AS breach_rate,
               ROUND(CAST(2 AS DOUBLE) * (
                 CASE WHEN breaches > 0 THEN CAST(breaches AS DOUBLE)
                   * ln((CAST(breaches AS DOUBLE)
                     / CAST(n_test AS DOUBLE)) / CAST(0.05 AS DOUBLE))
                   ELSE CAST(0 AS DOUBLE) END +
                 CASE WHEN breaches < n_test
                   THEN CAST(n_test - breaches AS DOUBLE)
                   * ln((CAST(1 AS DOUBLE) - CAST(breaches AS DOUBLE)
                     / CAST(n_test AS DOUBLE)) / CAST(0.95 AS DOUBLE))
                   ELSE CAST(0 AS DOUBLE) END), 6) + CAST(0 AS DOUBLE)
                 AS kupiec_lr
        FROM f""")),

    // Customer value-tier migration across the qbk period cut: spend
    // quintile (exact-NTILE, q7v cut formula) in each half, customers
    // absent from a half in tier 0 — the ≤36-cell transition matrix
    // that prices upgrades, downgrades, churn (t→0) and acquisition
    // (0→t), which q7j's single-snapshot RFM can't see. All integer
    // ranks and counts.
    "qhl_tier_migration" -> Q(
      fn = (s, dir) => {
        def tiers(per: Int): DataFrame = {
          val sp = t(s, dir, "orders")
            .filter((col("o_orderdate") >=
              lit("1996-01-01").cast("timestamp")).cast("int") === per)
            .groupBy(col("o_custkey"))
            .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("sp"))
          val ranked = graft.operators.ScaleOps.globalRowNumber(sp,
            Seq(col("sp").desc, col("o_custkey")), "rn")
          val n0 = ranked.agg(count(lit(1)).as("n"))
          ranked.crossJoin(broadcast(n0))
            .withColumn("base_sz", expr("n div 5"))
            .withColumn("rem", expr("n % 5"))
            .withColumn("cut", col("rem") * (col("base_sz") + 1))
            .select(col("o_custkey").as(s"ck$per"),
              expr("CAST(CASE WHEN rn <= cut" +
                " THEN (rn - 1) div (base_sz + 1) + 1" +
                " ELSE rem + (rn - 1 - cut) div base_sz + 1 END AS INT)")
                .as(s"tier$per"))
        }
        val t0 = tiers(0)
        val t1 = tiers(1)
        t0.join(t1, col("ck0") === col("ck1"), "full")
          .select(coalesce(col("tier0"), lit(0)).as("tier_pre"),
            coalesce(col("tier1"), lit(0)).as("tier_post"))
          .groupBy("tier_pre", "tier_post")
          .agg(count(lit(1)).as("n_customers"))
          .orderBy("tier_pre", "tier_post")
      },
      oracle = Some({
        def half(per: Int) =
          s"""SELECT o_custkey AS ck$per,
             |  CAST(CASE WHEN rn <= rem * (base_sz + 1)
             |    THEN (rn - 1) // (base_sz + 1) + 1
             |    ELSE rem + (rn - 1 - rem * (base_sz + 1)) // base_sz + 1
             |    END AS INT) AS tier$per
             |FROM (
             |  SELECT o_custkey, rn, n // 5 AS base_sz, n % 5 AS rem
             |  FROM (
             |    SELECT o_custkey,
             |           CAST(ROW_NUMBER() OVER (ORDER BY sp DESC,
             |             o_custkey) AS BIGINT) AS rn,
             |           (SELECT CAST(COUNT(*) AS BIGINT) FROM h$per) AS n
             |    FROM h$per))""".stripMargin
        s"""
        WITH h0 AS MATERIALIZED (
          SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            AS sp
          FROM orders WHERE o_orderdate < TIMESTAMP '1996-01-01'
          GROUP BY 1),
        h1 AS MATERIALIZED (
          SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            AS sp
          FROM orders WHERE o_orderdate >= TIMESTAMP '1996-01-01'
          GROUP BY 1),
        t0 AS (${half(0)}),
        t1 AS (${half(1)})
        SELECT COALESCE(tier0, 0) AS tier_pre,
               COALESCE(tier1, 0) AS tier_post,
               CAST(COUNT(*) AS BIGINT) AS n_customers
        FROM t0 FULL OUTER JOIN t1 ON ck0 = ck1
        GROUP BY 1, 2 ORDER BY 1, 2"""
      })),

    // Sample-ratio-mismatch health check for the user-parity
    // experiment assignment: overall arm counts with the 1-df χ²
    // against 50/50, plus the worst single-day standardized imbalance
    // — the first thing to audit before believing ANY of the
    // experiment readouts (q7b/q7c/qbm/qhc); a biased assignment
    // invalidates them all silently. Integer counts; χ² and z are
    // pure doubles from integers.
    "qhm_srm_check" -> Q(
      fn = (s, dir) => {
        val u = t(s, dir, "events")
          .select(col("user_id"),
            expr("unix_millis(ts) div 86400000").as("day"))
        val overall = u.select(col("user_id")).distinct()
          .agg(count(lit(1)).as("n_users"),
            sum(when(col("user_id") % 2 === 1, 1L).otherwise(0L))
              .as("n_arm1"))
        val daily = u.distinct()
          .groupBy("day")
          .agg(count(lit(1)).as("nd"),
            sum(when(col("user_id") % 2 === 1, 1L).otherwise(0L))
              .as("n1d"))
          .select(col("day"),
            (abs(lit(2.0) * col("n1d").cast("double") -
              col("nd").cast("double")) /
              sqrt(col("nd").cast("double"))).as("z"))
        val worst = daily.agg(
          max(struct(round(col("z"), 9).as("z"), col("day").as("day")))
            .as("w"))
        overall.crossJoin(broadcast(worst))
          .select(col("n_users"),
            (col("n_users") - col("n_arm1")).as("n_arm0"),
            col("n_arm1"),
            round((lit(2.0) * col("n_arm1").cast("double") -
              col("n_users").cast("double")) *
              (lit(2.0) * col("n_arm1").cast("double") -
                col("n_users").cast("double")) /
              col("n_users").cast("double"), 6).as("chi2"),
            when((lit(2.0) * col("n_arm1").cast("double") -
              col("n_users").cast("double")) *
              (lit(2.0) * col("n_arm1").cast("double") -
                col("n_users").cast("double")) /
              col("n_users").cast("double") > lit(3.841459), 1)
              .otherwise(0).cast("int").as("srm_flag"),
            round(col("w.z"), 6).as("worst_day_z"),
            col("w.day").as("worst_day"))
      },
      oracle = Some("""
        WITH u AS (
          SELECT user_id, epoch_ms(ts) // 86400000 AS day FROM events),
        overall AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
                 CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_arm1
          FROM (SELECT DISTINCT user_id FROM u)),
        daily AS (
          SELECT day,
                 ABS(CAST(2 AS DOUBLE) * CAST(n1d AS DOUBLE)
                   - CAST(nd AS DOUBLE)) / SQRT(CAST(nd AS DOUBLE)) AS z
          FROM (
            SELECT day, CAST(COUNT(*) AS BIGINT) AS nd,
                   CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                     AS BIGINT) AS n1d
            FROM (SELECT DISTINCT user_id, day FROM u)
            GROUP BY 1)),
        worst AS (
          SELECT MAX({'z': ROUND(z, 9), 'day': day}) AS w FROM daily)
        SELECT n_users, n_users - n_arm1 AS n_arm0, n_arm1,
               ROUND((CAST(2 AS DOUBLE) * CAST(n_arm1 AS DOUBLE)
                 - CAST(n_users AS DOUBLE))
                 * (CAST(2 AS DOUBLE) * CAST(n_arm1 AS DOUBLE)
                 - CAST(n_users AS DOUBLE))
                 / CAST(n_users AS DOUBLE), 6) AS chi2,
               CAST(CASE WHEN (CAST(2 AS DOUBLE)
                 * CAST(n_arm1 AS DOUBLE) - CAST(n_users AS DOUBLE))
                 * (CAST(2 AS DOUBLE)
                 * CAST(n_arm1 AS DOUBLE) - CAST(n_users AS DOUBLE))
                 / CAST(n_users AS DOUBLE) > CAST(3.841459 AS DOUBLE)
                 THEN 1 ELSE 0 END AS INT) AS srm_flag,
               ROUND(w['z'], 6) AS worst_day_z,
               w['day'] AS worst_day
        FROM overall CROSS JOIN worst""")),

    // Ellison–Glaeser agglomeration index per brand: is a brand's
    // volume more geographically concentrated than its PART-level
    // lumpiness alone explains? γ = (G − (1−Σx²)H) / ((1−Σx²)(1−H))
    // with G the raw spatial concentration over the DENSE brand ×
    // region grid (absent regions contribute (0−x_r)², so the grid is
    // completed before squaring) and H the within-brand part
    // Herfindahl — the spatial-economics measure that separates
    // "concentrated because few plants" from "concentrated because
    // co-located". 9-grid shares, 12-grid squares into DECIMAL sums.
    "qhn_ellison_glaeser" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem")
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
          .select(col("p_brand").as("brand"), col("l_partkey").as("pk"),
            col("n_regionkey").cast("long").as("rg"),
            col("l_quantity").cast("decimal(18,2)").as("q"))
          .localCheckpoint(eager = false)
        val tot = li.agg(sum(col("q")).as("qt"))
        val xr = li.groupBy("rg").agg(sum(col("q")).as("qr"))
          .crossJoin(broadcast(tot))
          .select(col("rg"),
            round(col("qr").cast("double") / col("qt").cast("double"), 9)
              .as("x"))
          .localCheckpoint(eager = false)
        val sx2 = xr.agg(sum(round(col("x") * col("x"), 12)
          .cast("decimal(28,12)")).as("sxx"))
          .select(col("sxx").cast("double").as("sx2"))
        val bq = li.groupBy("brand").agg(sum(col("q")).as("qb"))
        val brg = li.groupBy("brand", "rg").agg(sum(col("q")).as("qbr"))
        val dense = bq.crossJoin(broadcast(xr))
          .join(brg, Seq("brand", "rg"), "left")
          .select(col("brand"), col("qb"), col("x"),
            round(coalesce(col("qbr"), lit(0).cast("decimal(18,2)"))
              .cast("double") / col("qb").cast("double"), 9).as("sr"))
        val g = dense.groupBy("brand", "qb")
          .agg(sum(round((col("sr") - col("x")) * (col("sr") - col("x")),
            12).cast("decimal(28,12)")).as("gsum"))
          .select(col("brand"), col("qb"),
            col("gsum").cast("double").as("gg"))
        val h = li.groupBy("brand", "pk").agg(sum(col("q")).as("qp"))
          .join(bq, "brand")
          .select(col("brand"),
            round(col("qp").cast("double") / col("qb").cast("double"), 9)
              .as("ps"))
          .groupBy("brand")
          .agg(sum(round(col("ps") * col("ps"), 12)
            .cast("decimal(28,12)")).as("hsum"))
          .select(col("brand").as("b2"), col("hsum").cast("double").as("hh"))
        g.join(h, col("brand") === col("b2"))
          .crossJoin(broadcast(sx2))
          .select(col("brand"),
            round(col("gg"), 6).as("g_raw"),
            round(col("hh"), 6).as("h_plant"),
            (round((col("gg") - (lit(1.0) - col("sx2")) * col("hh")) /
              ((lit(1.0) - col("sx2")) * (lit(1.0) - col("hh"))), 6)
              + lit(0.0)).as("eg_gamma"))
          .orderBy("brand")
      },
      oracle = Some("""
        WITH li AS MATERIALIZED (
          SELECT p_brand AS brand, l_partkey AS pk,
                 CAST(n_regionkey AS BIGINT) AS rg,
                 CAST(l_quantity AS DECIMAL(18,2)) AS q
          FROM lineitem JOIN part ON l_partkey = p_partkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey),
        tot AS (SELECT SUM(q) AS qt FROM li),
        xr AS MATERIALIZED (
          SELECT rg, ROUND(CAST(SUM(q) AS DOUBLE)
                   / CAST(qt AS DOUBLE), 9) AS x
          FROM li CROSS JOIN tot GROUP BY rg, qt),
        sx2 AS (
          SELECT CAST(SUM(CAST(ROUND(x * x, 12) AS DECIMAL(28,12)))
                   AS DOUBLE) AS sx2
          FROM xr),
        bq AS MATERIALIZED (
          SELECT brand, SUM(q) AS qb FROM li GROUP BY 1),
        brg AS (
          SELECT brand, rg, SUM(q) AS qbr FROM li GROUP BY 1, 2),
        dense AS (
          SELECT bq.brand, bq.qb, xr.x,
                 ROUND(CAST(COALESCE(qbr, CAST(0 AS DECIMAL(18,2)))
                   AS DOUBLE) / CAST(qb AS DOUBLE), 9) AS sr
          FROM bq CROSS JOIN xr
          LEFT JOIN brg ON bq.brand = brg.brand AND xr.rg = brg.rg),
        g AS (
          SELECT brand,
                 CAST(SUM(CAST(ROUND((sr - x) * (sr - x), 12)
                   AS DECIMAL(28,12))) AS DOUBLE) AS gg
          FROM dense GROUP BY 1),
        h AS (
          SELECT brand,
                 CAST(SUM(CAST(ROUND(ps * ps, 12) AS DECIMAL(28,12)))
                   AS DOUBLE) AS hh
          FROM (
            SELECT pq.brand,
                   ROUND(CAST(qp AS DOUBLE) / CAST(qb AS DOUBLE), 9) AS ps
            FROM (SELECT brand, pk, SUM(q) AS qp FROM li GROUP BY 1, 2) pq
            JOIN bq ON pq.brand = bq.brand)
          GROUP BY 1)
        SELECT g.brand,
               ROUND(gg, 6) AS g_raw,
               ROUND(hh, 6) AS h_plant,
               ROUND((gg - (CAST(1 AS DOUBLE) - sx2) * hh)
                 / ((CAST(1 AS DOUBLE) - sx2)
                   * (CAST(1 AS DOUBLE) - hh)), 6) + CAST(0 AS DOUBLE)
                 AS eg_gamma
        FROM g JOIN h ON g.brand = h.brand CROSS JOIN sx2
        ORDER BY g.brand""")),

    // KMV (k-minimum-values) distinct-count sketch, audited against the
    // exact answer: the 64 smallest 48-bit md5 draws over the customer
    // keys, estimate (k−1)·2⁴⁸/h₍ₖ₎ — the third sketch family beside
    // HLL (q4m: register maxima) and CMS (q4l: counter matrix), and
    // the one whose state doubles as a uniform SAMPLE of the keys
    // (mergeable by keeping the k smallest of a union). Integer hash
    // arithmetic per CLAUDE.md rule 12; one double ratio.
    "qho_kmv_distinct" -> Q(
      fn = (s, dir) => {
        val k = 64
        val h = t(s, dir, "orders").select(col("o_custkey")).distinct()
          .select(col("o_custkey"),
            conv(substring(md5(col("o_custkey").cast("string")), 1, 12),
              16, 10).cast("long").as("h"))
        val n0 = h.agg(count(lit(1)).as("n_exact"))
        val hk = h.select(col("h")).distinct()
          .withColumn("rk", row_number().over(Window.orderBy("h")))
          .filter(col("rk") === k)
          .select(col("h").as("hk"))
        n0.crossJoin(broadcast(hk))
          .withColumn("est", lit((k - 1).toDouble) * lit(2.0) *
            lit((1L << 47).toDouble) / col("hk").cast("double"))
          .select(col("n_exact"), lit(k).as("k"), col("hk"),
            round(col("est"), 6).as("kmv_estimate"),
            (round((col("est") - col("n_exact").cast("double")) /
              col("n_exact").cast("double"), 6) + lit(0.0)).as("rel_error"))
      },
      oracle = Some("""
        WITH h AS (
          SELECT CAST('0x' || substr(md5(CAST(o_custkey AS VARCHAR)),
                   1, 12) AS BIGINT) AS h
          FROM (SELECT DISTINCT o_custkey FROM orders)),
        n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_exact FROM h),
        hk AS (
          SELECT h AS hk FROM (
            SELECT h, ROW_NUMBER() OVER (ORDER BY h) AS rk
            FROM (SELECT DISTINCT h FROM h))
          WHERE rk = 64)
        SELECT n_exact, CAST(64 AS INT) AS k, hk,
               ROUND(CAST(63 AS DOUBLE) * CAST(2 AS DOUBLE)
                 * CAST(140737488355328 AS DOUBLE)
                 / CAST(hk AS DOUBLE), 6) AS kmv_estimate,
               ROUND((CAST(63 AS DOUBLE) * CAST(2 AS DOUBLE)
                 * CAST(140737488355328 AS DOUBLE) / CAST(hk AS DOUBLE)
                 - CAST(n_exact AS DOUBLE))
                 / CAST(n_exact AS DOUBLE), 6) + CAST(0 AS DOUBLE)
                 AS rel_error
        FROM n0 CROSS JOIN hk""")),

    // DAU/MAU stickiness curve: daily actives over the trailing-window
    // monthly actives (the 30-day fixture makes MAU the cumulative
    // distinct-user count — Σ of daily new users, exactly the qhi
    // ledger's first column) — the engagement-intensity ratio product
    // teams track beside raw DAU; 0.5 means the average monthly user
    // shows up every other day. Pure integer counts, one division.
    "qhp_dau_mau_stickiness" -> Q(
      fn = (s, dir) => {
        val act = t(s, dir, "events")
          .select(col("user_id"),
            expr("unix_millis(ts) div 86400000").as("day"))
          .distinct()
        val firstd = act.groupBy("user_id").agg(min(col("day")).as("fd"))
        val newu = firstd.groupBy(col("fd").as("day"))
          .agg(count(lit(1)).as("nu"))
        val dau = act.groupBy("day").agg(count(lit(1)).as("dau"))
        val w = Window.orderBy("day").rowsBetween(
          Window.unboundedPreceding, 0)
        dau.join(newu, Seq("day"), "left")
          .withColumn("mau",
            sum(coalesce(col("nu"), lit(0L))).over(w))
          .select(col("day"), col("dau"), col("mau"),
            round(col("dau").cast("double") / col("mau").cast("double"), 6)
              .as("stickiness"))
          .orderBy("day")
      },
      oracle = Some("""
        WITH act AS (
          SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day
          FROM events),
        firstd AS (
          SELECT user_id, MIN(day) AS fd FROM act GROUP BY 1),
        newu AS (
          SELECT fd AS day, CAST(COUNT(*) AS BIGINT) AS nu
          FROM firstd GROUP BY 1),
        dau AS (
          SELECT day, CAST(COUNT(*) AS BIGINT) AS dau
          FROM act GROUP BY 1)
        SELECT day, dau,
               CAST(SUM(COALESCE(nu, 0)) OVER (ORDER BY day
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS mau,
               ROUND(CAST(dau AS DOUBLE)
                 / CAST(SUM(COALESCE(nu, 0)) OVER (ORDER BY day
                     ROWS UNBOUNDED PRECEDING) AS DOUBLE), 6)
                 AS stickiness
        FROM dau LEFT JOIN newu USING (day)
        ORDER BY day""")),

    // Multiplicative Holt–Winters over the daily per-type event counts:
    // the q7r additive twin for PROPORTIONAL seasonality (the weekend
    // swing scales with the level). Same rotating-ring fold replayed as
    // a DuckDB LIST fold; the seasonal links are divisions (proven
    // parity), the ring seeds at the multiplicative identity 1.
    "qhq_hw_multiplicative" -> Q(
      fn = (s, dir) => {
        val daily = t(s, dir, "events")
          .withColumn("day", expr("unix_millis(ts) div 86400000"))
          .groupBy(col("event_type"), col("day"))
          .agg(count(lit(1)).cast("double").as("y"))
        graft.operators.Forecast.holtWintersMultiplicative(daily,
            "event_type", "day", "y",
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
          FROM d WHERE y > 0 GROUP BY 1),
        f AS (
          SELECT event_type, n_obs,
                 list_reduce(
                   list_prepend([ys[1], CAST(0 AS DOUBLE), CAST(1 AS DOUBLE),
                       CAST(1 AS DOUBLE), CAST(1 AS DOUBLE), CAST(1 AS DOUBLE),
                       CAST(1 AS DOUBLE), CAST(1 AS DOUBLE), CAST(1 AS DOUBLE)],
                     list_transform(ys[2:], x -> [x, CAST(0 AS DOUBLE),
                       CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
                       CAST(0 AS DOUBLE), CAST(0 AS DOUBLE), CAST(0 AS DOUBLE),
                       CAST(0 AS DOUBLE)])),
                   (acc, e) -> [
                     ROUND(CAST(0.5 AS DOUBLE) * (e[1] / acc[3])
                       + CAST(0.5 AS DOUBLE) * (acc[1] + acc[2]), 9),
                     ROUND(CAST(0.25 AS DOUBLE)
                       * (ROUND(CAST(0.5 AS DOUBLE) * (e[1] / acc[3])
                           + CAST(0.5 AS DOUBLE) * (acc[1] + acc[2]), 9)
                          - acc[1])
                       + CAST(0.75 AS DOUBLE) * acc[2], 9),
                     acc[4], acc[5], acc[6], acc[7], acc[8], acc[9],
                     ROUND(CAST(0.25 AS DOUBLE)
                       * (e[1] / ROUND(CAST(0.5 AS DOUBLE) * (e[1] / acc[3])
                           + CAST(0.5 AS DOUBLE) * (acc[1] + acc[2]), 9))
                       + CAST(0.75 AS DOUBLE) * acc[3], 9)]) AS st
          FROM s)
        SELECT event_type, n_obs,
               ROUND(st[1], 6) AS level,
               ROUND(st[2], 6) + CAST(0 AS DOUBLE) AS trend,
               ROUND(st[3], 6) + CAST(0 AS DOUBLE) AS s_next,
               ROUND((st[1] + CAST(7 AS DOUBLE) * st[2]) * st[9], 6)
                 + CAST(0 AS DOUBLE) AS forecast_7
        FROM f ORDER BY event_type""")),

    // Hill diversity profile of the brand mix per region: richness
    // (D₀), Shannon entropy in nats (ln D₁ — exp is not parity-safe,
    // rule 14, and the log form is the standard report anyway),
    // inverse-Simpson D₂ and Pielou evenness J = H/ln(richness) — the
    // ecology-style assortment card that says WHICH regions
    // concentrate their volume into few brands vs spread it. 9-grid
    // shares, 12-grid p·ln p and p² terms into DECIMAL sums.
    "qhr_hill_diversity" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem")
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
          .select(col("n_regionkey").cast("long").as("rg"),
            col("p_brand").as("brand"),
            col("l_quantity").cast("decimal(18,2)").as("q"))
        val rb = li.groupBy("rg", "brand").agg(sum(col("q")).as("qb"))
        val rt = rb.groupBy("rg").agg(sum(col("qb")).as("qt"),
          count(lit(1)).as("rich"))
        rb.join(rt, "rg")
          .select(col("rg"), col("rich"),
            round(col("qb").cast("double") / col("qt").cast("double"), 9)
              .as("p"))
          .groupBy("rg", "rich")
          .agg(
            sum(round(-col("p") * log(col("p")), 12)
              .cast("decimal(28,12)")).as("hs"),
            sum(round(col("p") * col("p"), 12)
              .cast("decimal(28,12)")).as("sp2"))
          .select(col("rg").as("region"), col("rich").as("richness"),
            round(col("hs").cast("double"), 6).as("shannon_h"),
            round(lit(1.0) / col("sp2").cast("double"), 6)
              .as("inv_simpson_d2"),
            round(col("hs").cast("double") /
              log(col("rich").cast("double")), 6).as("pielou_j"))
          .orderBy("region")
      },
      oracle = Some("""
        WITH li AS (
          SELECT CAST(n_regionkey AS BIGINT) AS rg, p_brand AS brand,
                 CAST(l_quantity AS DECIMAL(18,2)) AS q
          FROM lineitem JOIN part ON l_partkey = p_partkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey),
        rb AS (
          SELECT rg, brand, SUM(q) AS qb FROM li GROUP BY 1, 2),
        rt AS (
          SELECT rg, SUM(qb) AS qt, CAST(COUNT(*) AS BIGINT) AS rich
          FROM rb GROUP BY 1),
        p AS (
          SELECT rb.rg, rich,
                 ROUND(CAST(qb AS DOUBLE) / CAST(qt AS DOUBLE), 9) AS p
          FROM rb JOIN rt ON rb.rg = rt.rg),
        agg AS (
          SELECT rg, rich,
                 CAST(SUM(CAST(ROUND(-p * ln(p), 12) AS DECIMAL(28,12)))
                   AS DOUBLE) AS hs,
                 CAST(SUM(CAST(ROUND(p * p, 12) AS DECIMAL(28,12)))
                   AS DOUBLE) AS sp2
          FROM p GROUP BY 1, 2)
        SELECT rg AS region, rich AS richness,
               ROUND(hs, 6) AS shannon_h,
               ROUND(CAST(1 AS DOUBLE) / sp2, 6) AS inv_simpson_d2,
               ROUND(hs / ln(CAST(rich AS DOUBLE)), 6) AS pielou_j
        FROM agg ORDER BY region""")),

    // Recurrence quantification of the 30-day purchase-revenue series:
    // recurrence rate (how often the system revisits a state, |xᵢ−xⱼ|
    // within ε = 10% of the range), determinism DET (the share of
    // recurrences sitting on ≥2-long DIAGONAL structures — revisits
    // that continue in parallel, the signature of deterministic
    // dynamics) and laminarity LAM (vertical structures — sticking
    // near one state). The phase-space view the scalar chaos battery
    // (qcy/qd0/qbc) compresses away. 9-grid values, integer pair
    // bookkeeping on the bounded daily panel.
    "qhs_recurrence_quantification" -> Q(
      fn = (s, dir) => {
        val x = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(expr("unix_millis(ts) div 86400000").as("day"))
          .agg(sum(col("value").cast("decimal(18,2)")).as("yv"))
          .select(row_number().over(Window.orderBy("day")).cast("long")
            .as("i"), round(col("yv").cast("double"), 9).as("v"))
          .localCheckpoint(eager = false)
        val rng = x.agg(count(lit(1)).as("n"),
            round(lit(0.1) * (max(col("v")) - min(col("v"))), 9).as("eps"))
        val rec = x.select(col("i").as("a"), col("v").as("va"))
          .join(x.select(col("i").as("b"), col("v").as("vb")),
            col("a") < col("b"))
          .crossJoin(broadcast(rng))
          .filter(abs(col("va") - col("vb")) <= col("eps"))
          .select(col("a"), col("b"))
          .localCheckpoint(eager = false)
        val diag = rec.select((col("a") + 1).as("a2"), (col("b") + 1).as("b2"))
        val diagDown = rec.select((col("a") - 1).as("a3"), (col("b") - 1).as("b3"))
        val vert = rec.select(col("a").as("a4"), (col("b") + 1).as("b4"))
        val vertDown = rec.select(col("a").as("a5"), (col("b") - 1).as("b5"))
        val marked = rec
          .join(diag, col("a") === col("a2") && col("b") === col("b2"),
            "left")
          .join(diagDown, col("a") === col("a3") && col("b") === col("b3"),
            "left")
          .join(vert, col("a") === col("a4") && col("b") === col("b4"),
            "left")
          .join(vertDown, col("a") === col("a5") && col("b") === col("b5"),
            "left")
          .select(col("a"), col("b"),
            when(col("a2").isNotNull || col("a3").isNotNull, 1L)
              .otherwise(0L).as("ond"),
            when(col("a4").isNotNull || col("a5").isNotNull, 1L)
              .otherwise(0L).as("onv"))
        marked.agg(count(lit(1)).as("n_rec"),
            sum(col("ond")).as("n_diag"), sum(col("onv")).as("n_vert"))
          .crossJoin(broadcast(rng))
          .select(col("n").as("n_days"), round(col("eps"), 6).as("eps"),
            col("n_rec"),
            round(lit(2.0) * col("n_rec").cast("double") /
              (col("n").cast("double") * (col("n") - 1).cast("double")), 6)
              .as("recurrence_rate"),
            round(col("n_diag").cast("double") /
              col("n_rec").cast("double"), 6).as("det"),
            round(col("n_vert").cast("double") /
              col("n_rec").cast("double"), 6).as("lam"))
      },
      oracle = Some("""
        WITH d0 AS (
          SELECT epoch_ms(ts) // 86400000 AS day,
                 SUM(CAST(value AS DECIMAL(18,2))) AS yv
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        x AS MATERIALIZED (
          SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i,
                 ROUND(CAST(yv AS DOUBLE), 9) AS v
          FROM d0),
        rng AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 ROUND(CAST(0.1 AS DOUBLE) * (MAX(v) - MIN(v)), 9) AS eps
          FROM x),
        rec AS MATERIALIZED (
          SELECT a.i AS a, b.i AS b
          FROM x a JOIN x b ON a.i < b.i CROSS JOIN rng
          WHERE ABS(a.v - b.v) <= eps),
        marked AS (
          SELECT r.a, r.b,
                 CASE WHEN EXISTS (SELECT 1 FROM rec u
                     WHERE u.a = r.a + 1 AND u.b = r.b + 1)
                   OR EXISTS (SELECT 1 FROM rec u
                     WHERE u.a = r.a - 1 AND u.b = r.b - 1)
                   THEN 1 ELSE 0 END AS ond,
                 CASE WHEN EXISTS (SELECT 1 FROM rec u
                     WHERE u.a = r.a AND u.b = r.b + 1)
                   OR EXISTS (SELECT 1 FROM rec u
                     WHERE u.a = r.a AND u.b = r.b - 1)
                   THEN 1 ELSE 0 END AS onv
          FROM rec r)
        SELECT n AS n_days, ROUND(eps, 6) AS eps,
               CAST(COUNT(*) AS BIGINT) AS n_rec,
               ROUND(CAST(2 AS DOUBLE) * CAST(COUNT(*) AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)), 6)
                 AS recurrence_rate,
               ROUND(CAST(SUM(ond) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
                 6) AS det,
               ROUND(CAST(SUM(onv) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
                 6) AS lam
        FROM marked CROSS JOIN rng
        GROUP BY n, eps""")),

    // Natural visibility graph of the daily purchase-revenue series:
    // days a and b see each other when no day between them pokes above
    // the sight line — the Lacasa mapping that turns a time series
    // into a network (periodic → regular graph, random → exponential
    // degrees, fractal → scale-free). The visibility test is cleared
    // of divisions: (x_c−x_b)(b−a) < (x_a−x_b)(b−c) compares
    // integer-scaled 9-grid products, identical in both engines. Per-
    // day degree plus the series' mean degree on every row.
    "qht_visibility_graph" -> Q(
      fn = (s, dir) => {
        val x = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(expr("unix_millis(ts) div 86400000").as("day"))
          .agg(sum(col("value").cast("decimal(18,2)")).as("yv"))
          .select(row_number().over(Window.orderBy("day")).cast("long")
            .as("i"), round(col("yv").cast("double"), 9).as("v"))
          .localCheckpoint(eager = false)
        val pairs = x.select(col("i").as("a"), col("v").as("va"))
          .join(x.select(col("i").as("b"), col("v").as("vb")),
            col("a") < col("b"))
        val blocked = pairs
          .join(x.select(col("i").as("c"), col("v").as("vc")),
            col("c") > col("a") && col("c") < col("b") &&
            (col("vc") - col("vb")) * (col("b") - col("a"))
              .cast("double") >=
            (col("va") - col("vb")) * (col("b") - col("c"))
              .cast("double"), "left_semi")
          .select(col("a"), col("b"))
        val edges = pairs.select(col("a"), col("b"))
          .except(blocked)
          .localCheckpoint(eager = false)
        val deg = edges.select(col("a").as("node"))
          .union(edges.select(col("b")))
          .groupBy("node").agg(count(lit(1)).as("degree"))
        val meanDeg = edges.agg(count(lit(1)).as("ne"))
        x.join(deg, col("i") === col("node"), "left")
          .crossJoin(broadcast(meanDeg))
          .crossJoin(broadcast(x.agg(count(lit(1)).as("n"))))
          .select(col("i").as("t_index"),
            round(col("v"), 6).as("value"),
            coalesce(col("degree"), lit(0L)).as("degree"),
            round(lit(2.0) * col("ne").cast("double") /
              col("n").cast("double"), 6).as("mean_degree"))
          .orderBy("t_index")
      },
      oracle = Some("""
        WITH d0 AS (
          SELECT epoch_ms(ts) // 86400000 AS day,
                 SUM(CAST(value AS DECIMAL(18,2))) AS yv
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        x AS MATERIALIZED (
          SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i,
                 ROUND(CAST(yv AS DOUBLE), 9) AS v
          FROM d0),
        pairs AS (
          SELECT a.i AS a, a.v AS va, b.i AS b, b.v AS vb
          FROM x a JOIN x b ON a.i < b.i),
        edges AS MATERIALIZED (
          SELECT a, b FROM pairs p
          WHERE NOT EXISTS (
            SELECT 1 FROM x c
            WHERE c.i > p.a AND c.i < p.b
              AND (c.v - p.vb) * CAST(p.b - p.a AS DOUBLE)
                >= (p.va - p.vb) * CAST(p.b - c.i AS DOUBLE))),
        deg AS (
          SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
          FROM (SELECT a AS node FROM edges
                UNION ALL SELECT b FROM edges)
          GROUP BY 1),
        ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS ne FROM edges),
        n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM x)
        SELECT i AS t_index, ROUND(v, 6) AS value,
               COALESCE(degree, 0) AS degree,
               ROUND(CAST(2 AS DOUBLE) * CAST(ne AS DOUBLE)
                 / CAST(n AS DOUBLE), 6) AS mean_degree
        FROM x LEFT JOIN deg ON i = node
        CROSS JOIN ne CROSS JOIN n0
        ORDER BY t_index""")),

    // Split-half reliability of the per-user activity measure: odd-day
    // vs even-day event counts correlated across users, stepped up by
    // Spearman–Brown 2r/(1+r) — is "how active a user is" a stable
    // trait of the user or day-to-day noise? The two-halves complement
    // of qc4's Cronbach α (which needs ≥3 items; the calendar-parity
    // split needs none). Integer moment sums; sqrt-only links.
    "qhu_split_half" -> Q(
      fn = (s, dir) => {
        val u = t(s, dir, "events")
          .select(col("user_id"),
            expr("unix_millis(ts) div 86400000").as("day"))
          .groupBy("user_id")
          .agg(sum(when(col("day") % 2 === 1, 1L).otherwise(0L)).as("o"),
            sum(when(col("day") % 2 === 0, 1L).otherwise(0L)).as("e"))
        val m = u.agg(count(lit(1)).as("n"),
          sum(col("o")).as("so"), sum(col("e")).as("se"),
          sum(col("o") * col("o")).as("soo"),
          sum(col("e") * col("e")).as("see"),
          sum(col("o") * col("e")).as("soe"))
        m.select(col("n"),
            ((col("n").cast("double") * col("soe").cast("double") -
              col("so").cast("double") * col("se").cast("double")) /
            (sqrt(col("n").cast("double") * col("soo").cast("double") -
              col("so").cast("double") * col("so").cast("double")) *
             sqrt(col("n").cast("double") * col("see").cast("double") -
              col("se").cast("double") * col("se").cast("double"))))
              .as("r"))
          .select(col("n").as("n_users"),
            (round(col("r"), 6) + lit(0.0)).as("split_half_r"),
            (round(lit(2.0) * col("r") / (lit(1.0) + col("r")), 6)
              + lit(0.0)).as("spearman_brown"))
      },
      oracle = Some("""
        WITH u AS (
          SELECT user_id,
                 CAST(SUM(CASE WHEN day % 2 = 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS o,
                 CAST(SUM(CASE WHEN day % 2 = 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS e
          FROM (SELECT user_id, epoch_ms(ts) // 86400000 AS day
                FROM events)
          GROUP BY 1),
        m AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(o) AS BIGINT) AS so,
                 CAST(SUM(e) AS BIGINT) AS se,
                 CAST(SUM(o * o) AS BIGINT) AS soo,
                 CAST(SUM(e * e) AS BIGINT) AS see,
                 CAST(SUM(o * e) AS BIGINT) AS soe
          FROM u),
        f AS (
          SELECT n,
                 (CAST(n AS DOUBLE) * CAST(soe AS DOUBLE)
                   - CAST(so AS DOUBLE) * CAST(se AS DOUBLE))
                 / (SQRT(CAST(n AS DOUBLE) * CAST(soo AS DOUBLE)
                     - CAST(so AS DOUBLE) * CAST(so AS DOUBLE))
                    * SQRT(CAST(n AS DOUBLE) * CAST(see AS DOUBLE)
                     - CAST(se AS DOUBLE) * CAST(se AS DOUBLE))) AS r
          FROM m)
        SELECT n AS n_users,
               ROUND(r, 6) + CAST(0 AS DOUBLE) AS split_half_r,
               ROUND(CAST(2 AS DOUBLE) * r / (CAST(1 AS DOUBLE) + r), 6)
                 + CAST(0 AS DOUBLE) AS spearman_brown
        FROM f""")),

    // Erlang-B blocking curve: the probability an arriving purchase
    // finds all s servers busy, for s = 1..10, at the offered load
    // a = mean purchases/hour (unit service time) — the LOSS-system
    // companion to qau's Erlang-C waiting staffing (C queues, B
    // drops). The classical recursion B(s) = a·B(s−1)/(s + a·B(s−1))
    // walks a path-carrying 9-grid fold (division links only — the
    // factorials that overflow a naive formula never materialize).
    "qhv_erlang_b_loss" -> Q(
      fn = (s, dir) => {
        val a = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(expr("unix_millis(ts) div 3600000").as("hr"))
          .agg(count(lit(1)).as("c"))
          .agg(round(sum(col("c")).cast("double") /
            count(lit(1)).cast("double"), 9).as("a"))
        val path = a.select(col("a"), expr(
          """slice(aggregate(sequence(1, 10),
            |  array(cast(1.0 as double)),
            |  (acc, s) -> concat(acc, array(round(
            |    a * element_at(acc, -1) /
            |    (cast(s as double) + a * element_at(acc, -1)), 9)))),
            |  2, 10) AS bs""".stripMargin))
        path.select(col("a"),
            posexplode(col("bs")).as(Seq("pos", "b")))
          .select((col("pos") + 1).cast("int").as("servers"),
            round(col("a"), 6).as("offered_load"),
            round(col("b"), 6).as("blocking_prob"),
            round(col("a") * (lit(1.0) - col("b")) /
              (col("pos") + 1).cast("double"), 6).as("utilization"))
          .orderBy("servers")
      },
      oracle = Some("""
        WITH a0 AS (
          SELECT ROUND(CAST(SUM(c) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
                   9) AS a
          FROM (SELECT epoch_ms(ts) // 3600000 AS hr,
                       CAST(COUNT(*) AS BIGINT) AS c
                FROM events WHERE event_type = 'purchase' GROUP BY 1)),
        path AS (
          SELECT a,
                 list_reduce(
                   list_prepend([CAST(0 AS DOUBLE), CAST(1 AS DOUBLE)],
                     list_transform(range(1, 11),
                       s -> [CAST(s AS DOUBLE), CAST(0 AS DOUBLE)])),
                   (acc, e) -> acc ||
                     [e[1], ROUND(a * acc[-1] / (e[1] + a * acc[-1]), 9)])
                   AS st
          FROM a0),
        rows_b AS (
          SELECT a, unnest(range(1, 11)) AS s, st FROM path)
        SELECT CAST(s AS INT) AS servers,
               ROUND(a, 6) AS offered_load,
               ROUND(st[2 * s + 2], 6) AS blocking_prob,
               ROUND(a * (CAST(1 AS DOUBLE) - st[2 * s + 2])
                 / CAST(s AS DOUBLE), 6) AS utilization
        FROM rows_b ORDER BY servers""")),

    // FDH Malmquist productivity index per nation across the qbk
    // period cut: efficiency change (own-frontier catch-up) ×
    // technical change (frontier shift), M = √[(D₁(p₁)/D₁(p₀)) ·
    // (D₀(p₁)/D₀(p₀))] with the free-disposal-hull single-input
    // (orders) single-output (revenue) distance D_s(x,y) = y/F_s(x),
    // F_s(x) = best revenue among period-s nations using ≤ x orders —
    // the dynamic sequel to qgz's static frontier. Nations whose
    // input falls outside a cross-period frontier's support evaluate
    // to NULL loudly (no extrapolation). Bounded 25-nation panels;
    // sqrt links only.
    "qhw_malmquist" -> Q(
      fn = (s, dir) => {
        val u = t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .select(col("c_nationkey").cast("long").as("nk"),
            when(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"),
              1).otherwise(0).as("per"),
            col("o_totalprice").cast("decimal(18,2)").as("v"))
          .groupBy("nk", "per")
          .agg(count(lit(1)).as("x"), sum(col("v")).as("y"))
          .localCheckpoint(eager = false)
        def dist(pointPer: Int, frontierPer: Int, nm: String): DataFrame = {
          val pts = u.filter(col("per") === pointPer)
            .select(col("nk"), col("x"), col("y"))
          val fr = u.filter(col("per") === frontierPer)
            .select(col("x").as("fx"), col("y").as("fy"))
          pts.join(broadcast(fr), col("fx") <= col("x"), "left")
            .groupBy(col("nk"), col("y"))
            .agg(max(col("fy")).as("best"))
            .select(col("nk"),
              when(col("best").isNotNull,
                round(col("y").cast("double") / col("best").cast("double"),
                  9)).as(nm))
        }
        val d00 = dist(0, 0, "d00")
        val d11 = dist(1, 1, "d11")
        val d10 = dist(1, 0, "d10") // period-1 point vs period-0 frontier
        val d01 = dist(0, 1, "d01") // period-0 point vs period-1 frontier
        d00.join(d11, "nk").join(d10, "nk").join(d01, "nk")
          .select(col("nk").as("nation"),
            round(col("d00"), 6).as("eff_pre"),
            round(col("d11"), 6).as("eff_post"),
            round(col("d11") / col("d00"), 6).as("eff_change"),
            round(sqrt((col("d10") / col("d11")) *
              (col("d00") / col("d01"))), 6).as("tech_change"),
            round(sqrt((col("d10") / col("d00")) *
              (col("d11") / col("d01"))), 6).as("malmquist"))
          .orderBy("nation")
      },
      oracle = Some("""
        WITH u AS MATERIALIZED (
          SELECT CAST(c_nationkey AS BIGINT) AS nk,
                 CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01'
                      THEN 1 ELSE 0 END AS per,
                 CAST(COUNT(*) AS BIGINT) AS x,
                 SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS y
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY 1, 2),
        d00 AS (
          SELECT p.nk, CASE WHEN MAX(f.fy) IS NOT NULL THEN
                 ROUND(CAST(p.y AS DOUBLE) / CAST(MAX(f.fy) AS DOUBLE), 9)
                 END AS d00
          FROM (SELECT nk, x, y FROM u WHERE per = 0) p
          LEFT JOIN (SELECT x AS fx, y AS fy FROM u WHERE per = 0) f
            ON f.fx <= p.x
          GROUP BY p.nk, p.y),
        d11 AS (
          SELECT p.nk, CASE WHEN MAX(f.fy) IS NOT NULL THEN
                 ROUND(CAST(p.y AS DOUBLE) / CAST(MAX(f.fy) AS DOUBLE), 9)
                 END AS d11
          FROM (SELECT nk, x, y FROM u WHERE per = 1) p
          LEFT JOIN (SELECT x AS fx, y AS fy FROM u WHERE per = 1) f
            ON f.fx <= p.x
          GROUP BY p.nk, p.y),
        d10 AS (
          SELECT p.nk, CASE WHEN MAX(f.fy) IS NOT NULL THEN
                 ROUND(CAST(p.y AS DOUBLE) / CAST(MAX(f.fy) AS DOUBLE), 9)
                 END AS d10
          FROM (SELECT nk, x, y FROM u WHERE per = 1) p
          LEFT JOIN (SELECT x AS fx, y AS fy FROM u WHERE per = 0) f
            ON f.fx <= p.x
          GROUP BY p.nk, p.y),
        d01 AS (
          SELECT p.nk, CASE WHEN MAX(f.fy) IS NOT NULL THEN
                 ROUND(CAST(p.y AS DOUBLE) / CAST(MAX(f.fy) AS DOUBLE), 9)
                 END AS d01
          FROM (SELECT nk, x, y FROM u WHERE per = 0) p
          LEFT JOIN (SELECT x AS fx, y AS fy FROM u WHERE per = 1) f
            ON f.fx <= p.x
          GROUP BY p.nk, p.y)
        SELECT d00.nk AS nation,
               ROUND(d00, 6) AS eff_pre,
               ROUND(d11, 6) AS eff_post,
               ROUND(d11 / d00, 6) AS eff_change,
               ROUND(SQRT((d10 / d11) * (d00 / d01)), 6) AS tech_change,
               ROUND(SQRT((d10 / d00) * (d11 / d01)), 6) AS malmquist
        FROM d00 JOIN d11 ON d00.nk = d11.nk
        JOIN d10 ON d00.nk = d10.nk
        JOIN d01 ON d00.nk = d01.nk
        ORDER BY nation""")),

    // Stochastic-dominance screen between urgent and other order-value
    // distributions on a 19-point pooled-quantile grid: first-order
    // (CDF envelope — does one distribution sit everywhere to the
    // right) and second-order (cumulative CDF integral — preferred by
    // every risk-averse evaluator) with explicit verdicts. The
    // DIRECTIONAL companion to q6u's two-sided KS sup. Grid from the
    // exact per-mille order statistics; CDF counts are integers; the
    // SSD integral is an exact DECIMAL trapezoid over the grid.
    "qhx_stochastic_dominance" -> Q(
      fn = (s, dir) => {
        val o = t(s, dir, "orders")
          .select(
            when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0)
              .as("g"),
            col("o_totalprice").cast("decimal(18,2)").as("v"),
            col("o_orderkey"))
          .localCheckpoint(eager = false)
        val n0 = o.agg(count(lit(1)).as("n"))
        val grid = o.crossJoin(broadcast(n0))
          .withColumn("rn", row_number().over(
            Window.orderBy(col("v"), col("o_orderkey"))))
          .filter((1 to 19).map(k =>
            col("rn") === expr(s"(n * ${k * 50} + 999) div 1000"))
            .reduce(_ || _))
          .select(col("v").as("gv"), col("rn"))
          .withColumn("gk", row_number().over(Window.orderBy("rn")))
          .select(col("gk"), col("gv"))
          .localCheckpoint(eager = false)
        val gtot = o.groupBy("g").agg(count(lit(1)).as("ng"))
        val cdf = o.crossJoin(broadcast(grid))
          .groupBy("gk", "gv")
          .agg(
            sum(when(col("g") === 1 && col("v") <= col("gv"), 1L)
              .otherwise(0L)).as("c1"),
            sum(when(col("g") === 0 && col("v") <= col("gv"), 1L)
              .otherwise(0L)).as("c0"))
          .crossJoin(broadcast(gtot.agg(
            max(when(col("g") === 1, col("ng"))).as("n1"),
            max(when(col("g") === 0, col("ng"))).as("n0"))))
          .select(col("gk"), col("gv"),
            round(col("c1").cast("double") / col("n1").cast("double"), 9)
              .as("f1"),
            round(col("c0").cast("double") / col("n0").cast("double"), 9)
              .as("f0"))
        val w = Window.orderBy("gk").rowsBetween(
          Window.unboundedPreceding, 0)
        val wLag = Window.orderBy("gk")
        val ssd = cdf
          .withColumn("dv",
            (col("gv") - coalesce(lag("gv", 1).over(wLag), col("gv")))
              .cast("double"))
          .withColumn("term", g9(round(
            (col("f1") - col("f0")) * col("dv"), 9)))
          .withColumn("integ", sum(col("term")).over(w))
        ssd.agg(count(lit(1)).as("n_grid"),
            round(max(col("f1") - col("f0")), 6).as("max_f1_minus_f0"),
            round(max(col("f0") - col("f1")), 6).as("max_f0_minus_f1"),
            round(max(col("integ")).cast("double"), 6).as("max_ssd_integral"),
            round(min(col("integ")).cast("double"), 6).as("min_ssd_integral"))
          .select(col("n_grid"), col("max_f1_minus_f0"),
            col("max_f0_minus_f1"),
            (col("max_ssd_integral") + lit(0.0)).as("max_ssd_integral"),
            (col("min_ssd_integral") + lit(0.0)).as("min_ssd_integral"),
            when(col("max_f1_minus_f0") <= 0, "urgent_fsd_dominates")
              .when(col("max_f0_minus_f1") <= 0, "other_fsd_dominates")
              .otherwise("no_fsd").as("fsd_verdict"),
            when(col("max_ssd_integral") <= 0, "urgent_ssd_dominates")
              .when(col("min_ssd_integral") >= 0, "other_ssd_dominates")
              .otherwise("no_ssd").as("ssd_verdict"))
      },
      oracle = Some({
        val gridcond = (1 to 19).map(k =>
          s"rn = (n * ${k * 50} + 999) // 1000").mkString(" OR ")
        s"""
        WITH o AS MATERIALIZED (
          SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
                   AS g,
                 CAST(o_totalprice AS DECIMAL(18,2)) AS v, o_orderkey
          FROM orders),
        n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM o),
        grid AS MATERIALIZED (
          SELECT CAST(ROW_NUMBER() OVER (ORDER BY rn) AS BIGINT) AS gk,
                 v AS gv
          FROM (SELECT v, CAST(ROW_NUMBER() OVER (ORDER BY v, o_orderkey)
                  AS BIGINT) AS rn
                FROM o) CROSS JOIN n0
          WHERE $gridcond),
        gtot AS (
          SELECT CAST(MAX(CASE WHEN g = 1 THEN ng END) AS BIGINT) AS n1,
                 CAST(MAX(CASE WHEN g = 0 THEN ng END) AS BIGINT) AS n0
          FROM (SELECT g, COUNT(*) AS ng FROM o GROUP BY 1)),
        cdf AS (
          SELECT gk, gv,
                 ROUND(CAST(SUM(CASE WHEN g = 1 AND v <= gv THEN 1
                   ELSE 0 END) AS DOUBLE) / CAST(n1 AS DOUBLE), 9) AS f1,
                 ROUND(CAST(SUM(CASE WHEN g = 0 AND v <= gv THEN 1
                   ELSE 0 END) AS DOUBLE) / CAST(n0 AS DOUBLE), 9) AS f0
          FROM o CROSS JOIN grid CROSS JOIN gtot
          GROUP BY gk, gv, n1, n0),
        dv AS (
          SELECT gk, f1, f0,
                 CAST(ROUND((f1 - f0) * CAST(gv -
                   COALESCE(LAG(gv) OVER (ORDER BY gk), gv) AS DOUBLE),
                   9) AS DECIMAL(20,9)) AS term
          FROM cdf),
        ssd AS (
          SELECT gk, f1, f0,
                 SUM(term) OVER (ORDER BY gk ROWS UNBOUNDED PRECEDING)
                   AS integ
          FROM dv),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_grid,
                 ROUND(MAX(f1 - f0), 6) AS ma,
                 ROUND(MAX(f0 - f1), 6) AS mb,
                 ROUND(CAST(MAX(integ) AS DOUBLE), 6) AS mi,
                 ROUND(CAST(MIN(integ) AS DOUBLE), 6) AS mn
          FROM ssd)
        SELECT n_grid, ma AS max_f1_minus_f0, mb AS max_f0_minus_f1,
               mi + CAST(0 AS DOUBLE) AS max_ssd_integral,
               mn + CAST(0 AS DOUBLE) AS min_ssd_integral,
               CASE WHEN ma <= 0 THEN 'urgent_fsd_dominates'
                    WHEN mb <= 0 THEN 'other_fsd_dominates'
                    ELSE 'no_fsd' END AS fsd_verdict,
               CASE WHEN mi <= 0 THEN 'urgent_ssd_dominates'
                    WHEN mn >= 0 THEN 'other_ssd_dominates'
                    ELSE 'no_ssd' END AS ssd_verdict
        FROM agg"""
      })),

    // Mean-excess (mean-residual-value) curve at the order-value
    // deciles: e(u) = E[X − u | X > u] — the EVT shape diagnostic read
    // BEFORE fitting qcc's generalized Pareto (a linearly rising mean
    // excess ⇒ heavy Pareto tail, flat ⇒ exponential, falling ⇒ short
    // tail). Thresholds are exact per-mille order statistics; the
    // conditional sums are exact DECIMALs; one division per row.
    "qhy_mean_excess" -> Q(
      fn = (s, dir) => {
        val o = t(s, dir, "orders")
          .select(col("o_totalprice").cast("decimal(18,2)").as("v"),
            col("o_orderkey"))
          .localCheckpoint(eager = false)
        val n0 = o.agg(count(lit(1)).as("n"))
        val thr = o.crossJoin(broadcast(n0))
          .withColumn("rn", row_number().over(
            Window.orderBy(col("v"), col("o_orderkey"))))
          .filter((1 to 9).map(k =>
            col("rn") === expr(s"(n * ${k * 100} + 999) div 1000"))
            .reduce(_ || _))
          .select(col("rn"), col("v").as("u"))
          .withColumn("per_mille", (row_number().over(
            Window.orderBy("rn")) * 100).cast("int"))
          .select(col("per_mille"), col("u"))
        o.crossJoin(broadcast(thr))
          .filter(col("v") > col("u"))
          .groupBy("per_mille", "u")
          .agg(count(lit(1)).as("n_exceed"),
            sum(col("v") - col("u")).as("sx"))
          .select(col("per_mille"),
            round(col("u").cast("double"), 2).as("threshold"),
            col("n_exceed"),
            round(col("sx").cast("double") / col("n_exceed").cast("double"),
              6).as("mean_excess"))
          .orderBy("per_mille")
      },
      oracle = Some({
        val thrcond = (1 to 9).map(k =>
          s"rn = (n * ${k * 100} + 999) // 1000").mkString(" OR ")
        s"""
        WITH o AS MATERIALIZED (
          SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS v, o_orderkey
          FROM orders),
        n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM o),
        thr AS (
          SELECT CAST(ROW_NUMBER() OVER (ORDER BY rn) * 100 AS INT)
                   AS per_mille,
                 v AS u
          FROM (SELECT v, CAST(ROW_NUMBER() OVER (ORDER BY v, o_orderkey)
                  AS BIGINT) AS rn
                FROM o) CROSS JOIN n0
          WHERE $thrcond)
        SELECT per_mille,
               ROUND(CAST(u AS DOUBLE), 2) AS threshold,
               CAST(COUNT(*) AS BIGINT) AS n_exceed,
               ROUND(CAST(SUM(v - u) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
                 6) AS mean_excess
        FROM o CROSS JOIN thr
        WHERE v > u
        GROUP BY per_mille, u
        ORDER BY per_mille"""
      })),

    // Chained log-Törnqvist monthly price index over the parts traded
    // in consecutive months: ln link_m = Σ ½(w_im + w_i,m−1)·
    // ln(p_im/p_i,m−1) over matched parts, chained by cumulative sum —
    // the superlative index in its exactly-replayable LOG form (exp is
    // rule-14-banned; economists read log points anyway), beside qax's
    // fixed-base Laspeyres/Paasche/Fisher. Unit prices and value
    // shares on the 9-grid; link terms on the 12-grid into DECIMALs.
    "qhz_tornqvist_chain" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .select(
            expr("year(o_orderdate) * 12 + month(o_orderdate) - 1")
              .cast("long").as("m"),
            col("l_partkey").as("pk"),
            col("l_extendedprice").cast("decimal(18,2)").as("ep"),
            col("l_quantity").cast("decimal(18,2)").as("qty"))
          .groupBy("m", "pk")
          .agg(sum(col("ep")).as("val"), sum(col("qty")).as("q"))
          .localCheckpoint(eager = false)
        val matched = li.select(col("m"), col("pk"), col("val"), col("q"))
          .join(li.select((col("m") + 1).as("m2"), col("pk").as("pk2"),
            col("val").as("pval"), col("q").as("pq")),
            col("m") === col("m2") && col("pk") === col("pk2"))
        val tot = matched.groupBy("m")
          .agg(sum(col("val")).as("tv"), sum(col("pval")).as("tpv"))
        val links = matched.join(tot, "m")
          .select(col("m"), col("pk"),
            round(col("val").cast("double") / col("tv").cast("double"), 9)
              .as("w1"),
            round(col("pval").cast("double") / col("tpv").cast("double"),
              9).as("w0"),
            round(log((col("val").cast("double") / col("q").cast("double"))
              / (col("pval").cast("double") / col("pq").cast("double"))),
              9).as("dlp"))
          // ½(w1+w0)·dlp rounded as a DOUBLE parked one sf0.1 term on the
          // digit-10 half boundary (rule 15: the 0.5 factor makes the
          // exact product a SHORT decimal) — so the whole term rides
          // DECIMAL: (12,10) × (12,9) multiplies exactly in INT128 and
          // ROUND(·, 9) is the same half-up in both engines. No double
          // touches the term before the grid.
          .withColumn("wavg",
            ((col("w1").cast("decimal(11,9)") +
              col("w0").cast("decimal(11,9)")) *
              lit(0.5).cast("decimal(2,1)")).cast("decimal(12,10)"))
          .groupBy("m")
          .agg(count(lit(1)).as("n_matched"),
            sum(round(col("wavg") * col("dlp").cast("decimal(12,9)"), 9)
              .cast("decimal(20,9)")).as("lnlink"))
        val w = Window.orderBy("m").rowsBetween(
          Window.unboundedPreceding, 0)
        // ROUND the exact DECIMALs, not their double casts: the sf0.1
        // chain lands EXACTLY on −0.1295285 at one month — a digit-7
        // half boundary where double-space rounding (DuckDB) and
        // shortest-repr rounding (Spark) disagree; decimal ROUND is the
        // same half-up in both engines (the qbi rule-15 device).
        links
          .withColumn("lnchain", sum(col("lnlink")).over(w))
          .select(col("m").as("month_index"), col("n_matched"),
            (round(col("lnlink"), 6).cast("double") + lit(0.0))
              .as("ln_link"),
            (round(col("lnchain"), 6).cast("double") + lit(0.0))
              .as("ln_chained_index"))
          .orderBy("month_index")
      },
      oracle = Some("""
        WITH li AS MATERIALIZED (
          SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                   AS BIGINT) AS m,
                 l_partkey AS pk,
                 SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS val,
                 SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          GROUP BY 1, 2),
        matched AS (
          SELECT a.m, a.pk, a.val, a.q, b.val AS pval, b.q AS pq
          FROM li a JOIN li b ON a.m = b.m + 1 AND a.pk = b.pk),
        tot AS (
          SELECT m, SUM(val) AS tv, SUM(pval) AS tpv
          FROM matched GROUP BY 1),
        terms AS (
          SELECT matched.m,
                 CAST((CAST(ROUND(CAST(val AS DOUBLE)
                     / CAST(tv AS DOUBLE), 9) AS DECIMAL(11,9))
                   + CAST(ROUND(CAST(pval AS DOUBLE)
                     / CAST(tpv AS DOUBLE), 9) AS DECIMAL(11,9)))
                   * CAST(0.5 AS DECIMAL(2,1)) AS DECIMAL(12,10)) AS wavg,
                 CAST(ROUND(ln((CAST(val AS DOUBLE) / CAST(q AS DOUBLE))
                   / (CAST(pval AS DOUBLE) / CAST(pq AS DOUBLE))), 9)
                   AS DECIMAL(12,9)) AS dlp
          FROM matched JOIN tot ON matched.m = tot.m),
        links AS (
          SELECT m, CAST(COUNT(*) AS BIGINT) AS n_matched,
                 SUM(CAST(ROUND(wavg * dlp, 9) AS DECIMAL(20,9)))
                   AS lnlink
          FROM terms GROUP BY 1)
        SELECT m AS month_index, n_matched,
               CAST(ROUND(lnlink, 6) AS DOUBLE) + CAST(0 AS DOUBLE)
                 AS ln_link,
               CAST(ROUND(SUM(lnlink) OVER (ORDER BY m
                 ROWS UNBOUNDED PRECEDING), 6) AS DOUBLE)
                 + CAST(0 AS DOUBLE) AS ln_chained_index
        FROM links ORDER BY month_index""")),

    // Service-incident reliability card from per-user error bursts:
    // errors ≤6 h apart merge into one incident (the q7z islands
    // device), MTBF = mean gap between a user's consecutive incident
    // STARTS, MTTR = mean incident duration (first→last error), and
    // availability = 1 − incident time over observed user time — the
    // ops-reliability summary (the classical MTBF/MTTR/availability
    // triple) on top of the raw error-rate views (q16/q4w). Integer
    // millisecond arithmetic end to end; three final divisions.
    "qi0_incident_mtbf" -> Q(
      fn = (s, dir) => {
        val er = t(s, dir, "events")
          .filter(col("event_type") === "error")
          .select(col("user_id"), unix_millis(col("ts")).as("ms"))
        val wU = Window.partitionBy("user_id").orderBy("ms")
        val inc = er
          .withColumn("prev", lag("ms", 1).over(wU))
          .withColumn("newinc",
            when(col("prev").isNull ||
              col("ms") - col("prev") > 21600000L, 1L).otherwise(0L))
          .withColumn("iid", sum(col("newinc")).over(
            wU.rowsBetween(Window.unboundedPreceding, 0)))
          .groupBy("user_id", "iid")
          .agg(min(col("ms")).as("start"), max(col("ms")).as("fin"))
        val gaps = inc
          .withColumn("pstart", lag("start", 1).over(
            Window.partitionBy("user_id").orderBy("start")))
        val obs = t(s, dir, "events")
          .groupBy(col("user_id").as("u2"))
          .agg((max(unix_millis(col("ts"))) -
            min(unix_millis(col("ts")))).as("span"))
        val incAgg = gaps.agg(
          count(lit(1)).as("n_incidents"),
          countDistinct(col("user_id")).as("n_users_affected"),
          sum(col("fin") - col("start")).as("ttr_ms"),
          sum(when(col("pstart").isNotNull, col("start") - col("pstart")))
            .as("tbf_ms"),
          sum(when(col("pstart").isNotNull, 1L).otherwise(0L)).as("n_gaps"))
        val obsAgg = obs.agg(sum(col("span")).as("obs_ms"))
        incAgg.crossJoin(broadcast(obsAgg))
          .select(col("n_incidents"), col("n_users_affected"),
            round(col("tbf_ms").cast("double") /
              col("n_gaps").cast("double") / lit(3600000.0), 6)
              .as("mtbf_hours"),
            round(col("ttr_ms").cast("double") /
              col("n_incidents").cast("double") / lit(3600000.0), 6)
              .as("mttr_hours"),
            round(lit(1.0) - col("ttr_ms").cast("double") /
              col("obs_ms").cast("double"), 6).as("availability"))
      },
      oracle = Some("""
        WITH er AS (
          SELECT user_id, epoch_ms(ts) AS ms FROM events
          WHERE event_type = 'error'),
        lagd AS (
          SELECT user_id, ms,
                 LAG(ms) OVER (PARTITION BY user_id ORDER BY ms) AS prev
          FROM er),
        marked AS (
          SELECT user_id, ms,
                 CASE WHEN prev IS NULL OR ms - prev > 21600000
                   THEN 1 ELSE 0 END AS newinc
          FROM lagd),
        iids AS (
          SELECT user_id, ms,
                 SUM(newinc) OVER (PARTITION BY user_id ORDER BY ms
                   ROWS UNBOUNDED PRECEDING) AS iid
          FROM marked),
        inc AS (
          SELECT user_id, iid, MIN(ms) AS start, MAX(ms) AS fin
          FROM iids GROUP BY 1, 2),
        gaps AS (
          SELECT user_id, start, fin,
                 LAG(start) OVER (PARTITION BY user_id ORDER BY start)
                   AS pstart
          FROM inc),
        obs AS (
          SELECT CAST(SUM(span) AS BIGINT) AS obs_ms FROM (
            SELECT user_id,
                   MAX(epoch_ms(ts)) - MIN(epoch_ms(ts)) AS span
            FROM events GROUP BY 1)),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_incidents,
                 CAST(COUNT(DISTINCT user_id) AS BIGINT)
                   AS n_users_affected,
                 CAST(SUM(fin - start) AS BIGINT) AS ttr_ms,
                 CAST(SUM(CASE WHEN pstart IS NOT NULL
                   THEN start - pstart END) AS BIGINT) AS tbf_ms,
                 CAST(SUM(CASE WHEN pstart IS NOT NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_gaps
          FROM gaps)
        SELECT n_incidents, n_users_affected,
               ROUND(CAST(tbf_ms AS DOUBLE) / CAST(n_gaps AS DOUBLE)
                 / CAST(3600000 AS DOUBLE), 6) AS mtbf_hours,
               ROUND(CAST(ttr_ms AS DOUBLE) / CAST(n_incidents AS DOUBLE)
                 / CAST(3600000 AS DOUBLE), 6) AS mttr_hours,
               ROUND(CAST(1 AS DOUBLE) - CAST(ttr_ms AS DOUBLE)
                 / CAST(obs_ms AS DOUBLE), 6) AS availability
        FROM agg CROSS JOIN obs""")),

    // Gibrat's law test: is customer spend GROWTH independent of
    // initial SIZE? ln(spend₁/spend₀) regressed on ln(spend₀) across
    // customers active in both qbk periods — β ≈ 0 is Gibrat (the
    // lognormal-size-distribution generator), β < 0 mean-reversion
    // (small customers catch up), β > 0 rich-get-richer. ln links
    // only; 9-grid series into DECIMAL moments.
    "qi1_gibrat_growth" -> Q(
      fn = (s, dir) => {
        val sp = t(s, dir, "orders")
          .select(col("o_custkey").as("ck"),
            when(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"),
              1).otherwise(0).as("per"),
            col("o_totalprice").cast("decimal(18,2)").as("v"))
          .groupBy("ck", "per").agg(sum(col("v")).as("sp"))
        val both = sp.filter(col("per") === 0)
          .select(col("ck"), col("sp").as("s0"))
          .join(sp.filter(col("per") === 1)
            .select(col("ck").as("ck1"), col("sp").as("s1")),
            col("ck") === col("ck1"))
          .select(
            round(log(col("s0").cast("double")), 9).as("x"),
            round(log(col("s1").cast("double") /
              col("s0").cast("double")), 9).as("g"))
        val m = both.agg(count(lit(1)).as("n"),
          sum(g9(col("x"))).as("sx"), sum(g9(col("g"))).as("sy"),
          sum(g9(round(col("x") * col("g"), 9))).as("sxy"),
          sum(g9(round(col("x") * col("x"), 9))).as("sxx"),
          sum(g9(round(col("g") * col("g"), 9))).as("syy"))
        m.select(col("n"),
            col("n").cast("double").as("nd"),
            col("sx").cast("double").as("sxd"),
            col("sy").cast("double").as("syd"),
            col("sxy").cast("double").as("sxyd"),
            col("sxx").cast("double").as("sxxd"),
            col("syy").cast("double").as("syyd"))
          .withColumn("b", (col("nd") * col("sxyd") -
            col("sxd") * col("syd")) /
            (col("nd") * col("sxxd") - col("sxd") * col("sxd")))
          .withColumn("r2",
            (col("nd") * col("sxyd") - col("sxd") * col("syd")) *
            (col("nd") * col("sxyd") - col("sxd") * col("syd")) /
            ((col("nd") * col("sxxd") - col("sxd") * col("sxd")) *
             (col("nd") * col("syyd") - col("syd") * col("syd"))))
          .select(col("n").as("n_customers"),
            (round(col("b"), 6) + lit(0.0)).as("beta_size"),
            (round((col("syd") - col("b") * col("sxd")) / col("nd"), 6)
              + lit(0.0)).as("alpha"),
            round(col("r2"), 6).as("r2"),
            when(abs(col("b")) < lit(0.05), "gibrat_holds")
              .when(col("b") < 0, "mean_reversion")
              .otherwise("rich_get_richer").as("verdict"))
      },
      oracle = Some("""
        WITH sp AS (
          SELECT o_custkey AS ck,
                 CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01'
                      THEN 1 ELSE 0 END AS per,
                 SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS sp
          FROM orders GROUP BY 1, 2),
        both_p AS (
          SELECT ROUND(ln(CAST(a.sp AS DOUBLE)), 9) AS x,
                 ROUND(ln(CAST(b.sp AS DOUBLE)
                   / CAST(a.sp AS DOUBLE)), 9) AS g
          FROM sp a JOIN sp b ON a.ck = b.ck
          WHERE a.per = 0 AND b.per = 1),
        m AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(ROUND(x, 9) AS DECIMAL(20,9))) AS sx,
                 SUM(CAST(ROUND(g, 9) AS DECIMAL(20,9))) AS sy,
                 SUM(CAST(ROUND(x * g, 9) AS DECIMAL(20,9))) AS sxy,
                 SUM(CAST(ROUND(x * x, 9) AS DECIMAL(20,9))) AS sxx,
                 SUM(CAST(ROUND(g * g, 9) AS DECIMAL(20,9))) AS syy
          FROM both_p),
        d AS (
          SELECT n, CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
                 CAST(sy AS DOUBLE) AS syd, CAST(sxy AS DOUBLE) AS sxyd,
                 CAST(sxx AS DOUBLE) AS sxxd, CAST(syy AS DOUBLE) AS syyd
          FROM m),
        f AS (
          SELECT *, (nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)
                   AS b
          FROM d)
        SELECT n AS n_customers,
               ROUND(b, 6) + CAST(0 AS DOUBLE) AS beta_size,
               ROUND((syd - b * sxd) / nd, 6) + CAST(0 AS DOUBLE)
                 AS alpha,
               ROUND((nd * sxyd - sxd * syd) * (nd * sxyd - sxd * syd)
                 / ((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd)),
                 6) AS r2,
               CASE WHEN ABS(b) < CAST(0.05 AS DOUBLE)
                 THEN 'gibrat_holds'
                 WHEN b < 0 THEN 'mean_reversion'
                 ELSE 'rich_get_richer' END AS verdict
        FROM f""")),

    // Preferential attachment test on the evolving order graph: do
    // nodes with more period-0 edges attract more NEW period-1 edges?
    // Slope and correlation of the per-node gain on the initial
    // degree — the Barabási–Albert mechanism check that decides
    // whether the graph's future hubs are predictable. Degrees and
    // gains are exact integers off distinct-edge sets; one Cramer
    // slope at the end.
    "qi2_preferential_attachment" -> Q(
      fn = (s, dir) => {
        val o = t(s, dir, "orders")
          .select((col("o_custkey") % 400).cast("long").as("a"),
            (col("o_orderkey") % 400).cast("long").as("b"),
            when(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"),
              1).otherwise(0).as("per"))
          .filter(col("a") =!= col("b"))
        def und(df: DataFrame): DataFrame =
          df.select(col("a"), col("b"))
            .union(df.select(col("b").as("a"), col("a").as("b")))
            .distinct()
        val e0 = und(o.filter(col("per") === 0)).localCheckpoint(eager = false)
        val e1new = und(o.filter(col("per") === 1))
          .except(e0).localCheckpoint(eager = false)
        val d0 = e0.groupBy(col("a").as("node"))
          .agg(count(lit(1)).as("deg0"))
        val gain = e1new.groupBy(col("a").as("n2"))
          .agg(count(lit(1)).as("gn"))
        val base = d0.join(gain, col("node") === col("n2"), "left")
          .select(col("node"), col("deg0"),
            coalesce(col("gn"), lit(0L)).as("gain"))
        val m = base.agg(count(lit(1)).as("n"),
          sum(col("deg0")).as("sx"), sum(col("gain")).as("sy"),
          sum(col("deg0") * col("gain")).as("sxy"),
          sum(col("deg0") * col("deg0")).as("sxx"),
          sum(col("gain") * col("gain")).as("syy"))
        m.select(col("n").cast("double").as("nd"), col("n"),
            col("sx").cast("double").as("sxd"),
            col("sy").cast("double").as("syd"),
            col("sxy").cast("double").as("sxyd"),
            col("sxx").cast("double").as("sxxd"),
            col("syy").cast("double").as("syyd"))
          .select(col("n").as("n_nodes"),
            round(col("sxd") / col("nd"), 6).as("mean_deg0"),
            round(col("syd") / col("nd"), 6).as("mean_gain"),
            (round((col("nd") * col("sxyd") - col("sxd") * col("syd")) /
              (col("nd") * col("sxxd") - col("sxd") * col("sxd")), 6)
              + lit(0.0)).as("pa_slope"),
            (round((col("nd") * col("sxyd") - col("sxd") * col("syd")) /
              (sqrt(col("nd") * col("sxxd") - col("sxd") * col("sxd")) *
               sqrt(col("nd") * col("syyd") - col("syd") * col("syd"))),
              6) + lit(0.0)).as("pa_corr"))
      },
      oracle = Some("""
        WITH o AS (
          SELECT CAST(o_custkey % 400 AS BIGINT) AS a,
                 CAST(o_orderkey % 400 AS BIGINT) AS b,
                 CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01'
                      THEN 1 ELSE 0 END AS per
          FROM orders WHERE o_custkey % 400 <> o_orderkey % 400),
        e0 AS MATERIALIZED (
          SELECT DISTINCT a, b FROM (
            SELECT a, b FROM o WHERE per = 0
            UNION ALL SELECT b, a FROM o WHERE per = 0)),
        e1new AS MATERIALIZED (
          SELECT a, b FROM (
            SELECT DISTINCT a, b FROM (
              SELECT a, b FROM o WHERE per = 1
              UNION ALL SELECT b, a FROM o WHERE per = 1))
          EXCEPT SELECT a, b FROM e0),
        d0 AS (
          SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS deg0
          FROM e0 GROUP BY 1),
        gain AS (
          SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS gn
          FROM e1new GROUP BY 1),
        base AS (
          SELECT d0.node, deg0,
                 CAST(COALESCE(gn, 0) AS BIGINT) AS gain
          FROM d0 LEFT JOIN gain ON d0.node = gain.node),
        m AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(deg0) AS BIGINT) AS sx,
                 CAST(SUM(gain) AS BIGINT) AS sy,
                 CAST(SUM(deg0 * gain) AS BIGINT) AS sxy,
                 CAST(SUM(deg0 * deg0) AS BIGINT) AS sxx,
                 CAST(SUM(gain * gain) AS BIGINT) AS syy
          FROM base),
        d AS (
          SELECT n, CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
                 CAST(sy AS DOUBLE) AS syd, CAST(sxy AS DOUBLE) AS sxyd,
                 CAST(sxx AS DOUBLE) AS sxxd, CAST(syy AS DOUBLE) AS syyd
          FROM m)
        SELECT n AS n_nodes,
               ROUND(sxd / nd, 6) AS mean_deg0,
               ROUND(syd / nd, 6) AS mean_gain,
               ROUND((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd),
                 6) + CAST(0 AS DOUBLE) AS pa_slope,
               ROUND((nd * sxyd - sxd * syd)
                 / (SQRT(nd * sxxd - sxd * sxd)
                   * SQRT(nd * syyd - syd * syd)), 6)
                 + CAST(0 AS DOUBLE) AS pa_corr
        FROM d""")),

    // Two-state burst detection over the daily purchase share
    // (Kleinberg-style, FILTERED): per day, the running minimum costs
    // of "baseline" (rate p₀ = overall purchase share) vs "burst"
    // (p₁ = 1.5·p₀) states under binomial log-loss, with a γ = 10
    // entry toll for 0→1 — the day is flagged bursting when the burst
    // path is cheaper SO FAR (the online reading; an offline Viterbi
    // would also backtrack). The path-carrying 9-grid fold of the
    // q7d/qgw family; ln links only.
    "qi3_burst_detection" -> Q(
      fn = (s, dir) => {
        val d = t(s, dir, "events")
          .groupBy(expr("unix_millis(ts) div 86400000").as("day"))
          .agg(sum(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)).as("x"), count(lit(1)).as("ntot"))
        val rates = d.agg(
            round(sum(col("x")).cast("double") /
              sum(col("ntot")).cast("double"), 9).as("p0"))
          .select(col("p0"),
            round(lit(1.5) * col("p0"), 9).as("p1"))
          .select(
            round(log(col("p0")), 9).as("l0"),
            round(log(lit(1.0) - col("p0")), 9).as("l0c"),
            round(log(col("p1")), 9).as("l1"),
            round(log(lit(1.0) - col("p1")), 9).as("l1c"))
        val costs = d.crossJoin(broadcast(rates))
          .select(col("day"), col("x"), col("ntot"),
            round(-(col("x").cast("double") * col("l0") +
              (col("ntot") - col("x")).cast("double") * col("l0c")), 9)
              .as("c0"),
            round(-(col("x").cast("double") * col("l1") +
              (col("ntot") - col("x")).cast("double") * col("l1c")), 9)
              .as("c1"))
        val packed = costs.agg(expr(
          "array_sort(collect_list(struct(day, x, ntot, c0, c1)))")
          .as("rows"))
        // flat min-cost path [a0₁,a1₁,a0₂,a1₂,…] (seed [0, γ] sliced off),
        // then per-day components extracted by index
        val folded = packed
          .withColumn("path", expr(
            """slice(aggregate(rows,
              |  array(cast(0.0 as double), cast(10.0 as double)),
              |  (acc, r) -> concat(acc, array(
              |    round(r.c0 + least(element_at(acc, -2),
              |      element_at(acc, -1)), 9),
              |    round(r.c1 + least(element_at(acc, -2) + 10.0d,
              |      element_at(acc, -1)), 9)))),
              |  3, 2 * size(rows))""".stripMargin))
          .select(expr(
            """explode(arrays_zip(
              |  transform(rows, r -> r.day),
              |  transform(rows, r -> r.x),
              |  transform(rows, r -> r.ntot),
              |  transform(sequence(1, size(rows)),
              |    i -> element_at(path, 2 * i - 1)),
              |  transform(sequence(1, size(rows)),
              |    i -> element_at(path, 2 * i)))) AS z""".stripMargin))
        folded.select(col("z.0").as("day"), col("z.1").as("n_purchases"),
            col("z.2").as("n_events"),
            round(col("z.3"), 6).as("cost_base"),
            round(col("z.4"), 6).as("cost_burst"),
            when(col("z.4") < col("z.3"), 1).otherwise(0).cast("int")
              .as("bursting"))
          .orderBy("day")
      },
      oracle = Some("""
        WITH d AS (
          SELECT epoch_ms(ts) // 86400000 AS day,
                 CAST(SUM(CASE WHEN event_type = 'purchase'
                   THEN 1 ELSE 0 END) AS BIGINT) AS x,
                 CAST(COUNT(*) AS BIGINT) AS ntot
          FROM events GROUP BY 1),
        rates AS (
          SELECT ROUND(ln(p0), 9) AS l0,
                 ROUND(ln(CAST(1 AS DOUBLE) - p0), 9) AS l0c,
                 ROUND(ln(p1), 9) AS l1,
                 ROUND(ln(CAST(1 AS DOUBLE) - p1), 9) AS l1c
          FROM (
            SELECT p0, ROUND(CAST(1.5 AS DOUBLE) * p0, 9) AS p1
            FROM (
              SELECT ROUND(CAST(SUM(x) AS DOUBLE)
                / CAST(SUM(ntot) AS DOUBLE), 9) AS p0
              FROM d))),
        costs AS (
          SELECT day, x, ntot,
                 ROUND(-(CAST(x AS DOUBLE) * l0
                   + CAST(ntot - x AS DOUBLE) * l0c), 9) AS c0,
                 ROUND(-(CAST(x AS DOUBLE) * l1
                   + CAST(ntot - x AS DOUBLE) * l1c), 9) AS c1
          FROM d CROSS JOIN rates),
        packed AS (
          SELECT list(day ORDER BY day) AS dl,
                 list(x ORDER BY day) AS xl,
                 list(ntot ORDER BY day) AS nl,
                 list(c0 ORDER BY day) AS c0l,
                 list(c1 ORDER BY day) AS c1l,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM costs),
        pathed AS (
          SELECT dl, xl, nl, n,
                 list_reduce(
                   list_prepend([CAST(0 AS DOUBLE), CAST(10 AS DOUBLE)],
                     list_transform(range(1, CAST(n + 1 AS BIGINT)),
                       i -> [c0l[i], c1l[i]])),
                   (acc, e) -> acc || [
                     ROUND(e[1] + LEAST(acc[-2], acc[-1]), 9),
                     ROUND(e[2] + LEAST(acc[-2] + CAST(10 AS DOUBLE),
                       acc[-1]), 9)])[3:] AS path
          FROM packed),
        split_p AS (
          SELECT dl, xl, nl,
                 list_transform(range(1, CAST(n + 1 AS BIGINT)),
                   i -> path[2 * i - 1]) AS c0p,
                 list_transform(range(1, CAST(n + 1 AS BIGINT)),
                   i -> path[2 * i]) AS c1p
          FROM pathed)
        SELECT day, n_purchases, n_events,
               ROUND(a0, 6) AS cost_base,
               ROUND(a1, 6) AS cost_burst,
               CAST(CASE WHEN a1 < a0 THEN 1 ELSE 0 END AS INT)
                 AS bursting
        FROM (
          SELECT unnest(dl) AS day, unnest(xl) AS n_purchases,
                 unnest(nl) AS n_events, unnest(c0p) AS a0,
                 unnest(c1p) AS a1
          FROM split_p)
        ORDER BY day""")),

    // Second-digit Benford screen on order totals: the second
    // significant digit's law P(d) = Σ_{k=1..9} log₁₀(1 + 1/(10k+d))
    // is far flatter than the first digit's — and far harder for a
    // fabricator to fake, which is why forensic practice (Nigrini)
    // tests it SECOND after q6n's first-digit χ² and qfc's last-digit
    // uniformity. Digits extracted by exact string arithmetic on the
    // cent-scaled integer (no float log10); expectations via the
    // proven ln link; per-digit χ² components summed exactly.
    "qi4_benford_second_digit" -> Q(
      fn = (s, dir) => {
        val digits = t(s, dir, "orders")
          .select(expr(
            "CAST(substring(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))" +
              " * 100 AS BIGINT) AS STRING), 2, 1) AS INT)").as("d2"))
          .filter(col("d2").isNotNull)
        val obs = digits.groupBy("d2").agg(count(lit(1)).as("n_obs"))
        val tot = digits.agg(count(lit(1)).as("n"))
        // P(d) per Benford: Σ_k log10(1 + 1/(10k+d)), log10 = ln/ln(10)
        val pexpr = (1 to 9).map(k =>
          s"round(ln(1.0d + 1.0d / (10 * $k + d2)) / ln(10.0d), 12)")
          .mkString(" + ")
        obs.crossJoin(broadcast(tot))
          .withColumn("p", round(expr(pexpr), 9))
          .select(col("d2").as("digit"), col("n_obs"),
            round(col("p"), 6).as("p_benford"),
            round(col("p") * col("n").cast("double"), 6).as("expected"),
            round((col("n_obs").cast("double") -
              col("p") * col("n").cast("double")) *
              (col("n_obs").cast("double") -
                col("p") * col("n").cast("double")) /
              (col("p") * col("n").cast("double")), 6)
              .as("chi2_component"))
          .orderBy("digit")
      },
      oracle = Some({
        val pexpr = (1 to 9).map(k =>
          s"ROUND(ln(CAST(1 AS DOUBLE) + CAST(1 AS DOUBLE) " +
            s"/ CAST(10 * $k + d2 AS DOUBLE)) / ln(CAST(10 AS DOUBLE)), 12)")
          .mkString(" + ")
        s"""
        WITH digits AS (
          SELECT CAST(substr(CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2))
                   * 100 AS BIGINT) AS VARCHAR), 2, 1) AS INT) AS d2
          FROM orders),
        obs AS (
          SELECT d2, CAST(COUNT(*) AS BIGINT) AS n_obs
          FROM digits WHERE d2 IS NOT NULL GROUP BY 1),
        tot AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n FROM digits
          WHERE d2 IS NOT NULL),
        f AS (
          SELECT d2, n_obs, n, ROUND($pexpr, 9) AS p
          FROM obs CROSS JOIN tot)
        SELECT d2 AS digit, n_obs,
               ROUND(p, 6) AS p_benford,
               ROUND(p * CAST(n AS DOUBLE), 6) AS expected,
               ROUND((CAST(n_obs AS DOUBLE) - p * CAST(n AS DOUBLE))
                 * (CAST(n_obs AS DOUBLE) - p * CAST(n AS DOUBLE))
                 / (p * CAST(n AS DOUBLE)), 6) AS chi2_component
        FROM f ORDER BY digit"""
      })),

    // Price-stickiness card: how often does a part's monthly unit
    // price actually move month-over-month, and by how much when it
    // does — the menu-cost microdata summary (change frequency ⇒
    // implied price-spell duration 1/freq). Unit prices snap to a
    // 4-decimal grid before the equality compare, so "changed" is an
    // exact decimal predicate in both engines; magnitudes are exact
    // DECIMAL |Δ| sums.
    "qi5_price_stickiness" -> Q(
      fn = (s, dir) => {
        val mp = t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .select(
            expr("year(o_orderdate) * 12 + month(o_orderdate) - 1")
              .cast("long").as("m"),
            col("l_partkey").as("pk"),
            col("l_extendedprice").cast("decimal(18,2)").as("ep"),
            col("l_quantity").cast("decimal(18,2)").as("qty"))
          .groupBy("m", "pk")
          .agg(round(sum(col("ep")).cast("double") /
            sum(col("qty")).cast("double"), 4).cast("decimal(14,4)")
            .as("u"))
          .localCheckpoint(eager = false)
        val links = mp.join(mp.select((col("m") + 1).as("m2"),
            col("pk").as("pk2"), col("u").as("pu")),
            col("m") === col("m2") && col("pk") === col("pk2"))
        links.agg(
            countDistinct(col("pk")).as("n_parts"),
            count(lit(1)).as("n_links"),
            sum(when(col("u") =!= col("pu"), 1L).otherwise(0L))
              .as("n_changes"),
            sum(when(col("u") =!= col("pu"), abs(col("u") - col("pu")))
              .otherwise(lit(0).cast("decimal(14,4)"))).as("sabs"))
          .select(col("n_parts"), col("n_links"), col("n_changes"),
            round(col("n_changes").cast("double") /
              col("n_links").cast("double"), 6).as("change_freq"),
            round(col("n_links").cast("double") /
              col("n_changes").cast("double"), 6)
              .as("implied_spell_months"),
            round(col("sabs").cast("double") /
              col("n_changes").cast("double"), 6)
              .as("mean_abs_change"))
      },
      oracle = Some("""
        WITH mp AS MATERIALIZED (
          SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                   AS BIGINT) AS m,
                 l_partkey AS pk,
                 CAST(ROUND(CAST(SUM(CAST(l_extendedprice
                     AS DECIMAL(18,2))) AS DOUBLE)
                   / CAST(SUM(CAST(l_quantity AS DECIMAL(18,2)))
                     AS DOUBLE), 4) AS DECIMAL(14,4)) AS u
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          GROUP BY 1, 2),
        links AS (
          SELECT a.pk, a.u, b.u AS pu
          FROM mp a JOIN mp b ON a.m = b.m + 1 AND a.pk = b.pk),
        agg AS (
          SELECT CAST(COUNT(DISTINCT pk) AS BIGINT) AS n_parts,
                 CAST(COUNT(*) AS BIGINT) AS n_links,
                 CAST(SUM(CASE WHEN u <> pu THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_changes,
                 SUM(CASE WHEN u <> pu THEN ABS(u - pu)
                     ELSE CAST(0 AS DECIMAL(14,4)) END) AS sabs
          FROM links)
        SELECT n_parts, n_links, n_changes,
               ROUND(CAST(n_changes AS DOUBLE) / CAST(n_links AS DOUBLE),
                 6) AS change_freq,
               ROUND(CAST(n_links AS DOUBLE) / CAST(n_changes AS DOUBLE),
                 6) AS implied_spell_months,
               ROUND(CAST(sabs AS DOUBLE) / CAST(n_changes AS DOUBLE), 6)
                 AS mean_abs_change
        FROM agg""")),

    // Cochrane–Orcutt AR(1)-corrected trend regression on daily
    // revenue: stage 1 fits the OLS trend and estimates the residual
    // autocorrelation ρ; stage 2 re-fits on the quasi-differenced
    // series (yₜ − ρyₜ₋₁ on tₜ − ρtₜ₋₁). Where qg6's HAC only fixes
    // the STANDARD ERROR, CO fixes the ESTIMATE's efficiency — the
    // textbook pair of serial-correlation remedies. Residuals snap to
    // the 9-grid; both stages are DECIMAL moment images.
    "qi6_cochrane_orcutt" -> Q(
      fn = (s, dir) => {
        val y = dailyRevenueM(s, dir)
          .withColumn("tt",
            row_number().over(Window.orderBy("day")).cast("long"))
          .select(col("tt"), col("ym"))
          .localCheckpoint(eager = false)
        val m1 = y.agg(count(lit(1)).as("n"), sum(col("tt")).as("st"),
          sum(col("ym")).as("sy"), sum(col("tt") * col("tt")).as("stt"),
          sum(col("tt").cast("decimal(18,2)") * col("ym")).as("sty"))
        val ab = m1.select(col("n"),
            ((col("n").cast("double") *
              expr("CAST(CAST(sty AS STRING) AS DOUBLE)") -
              col("st").cast("double") * col("sy").cast("double")) /
              (col("n").cast("double") * col("stt").cast("double") -
                col("st").cast("double") * col("st").cast("double")))
              .as("b"), col("st"), col("sy"))
          .select(col("n"), col("b"),
            ((col("sy").cast("double") - col("b") * col("st").cast("double"))
              / col("n").cast("double")).as("a"))
        val res = y.crossJoin(broadcast(ab))
          .select(col("tt"), col("ym"), col("n"), col("a"), col("b"),
            round(col("ym").cast("double") -
              (col("a") + col("b") * col("tt").cast("double")), 9)
              .as("e"))
        val wl = Window.orderBy("tt")
        val lagged = res.withColumn("ep", lag("e", 1).over(wl))
          .withColumn("yp", lag("ym", 1).over(wl))
          .filter(col("ep").isNotNull)
          .localCheckpoint(eager = false)
        val rho = lagged.agg(
            sum(g9(round(col("e") * col("ep"), 9))).as("see"),
            sum(g9(round(col("ep") * col("ep"), 9))).as("spp"))
          .select(round(col("see").cast("double") /
            col("spp").cast("double"), 9).as("rho"))
        val star = lagged.crossJoin(broadcast(rho))
          .select(col("rho"),
            round(col("ym").cast("double") -
              col("rho") * col("yp").cast("double"), 9).as("ys"),
            round(col("tt").cast("double") -
              col("rho") * (col("tt") - 1).cast("double"), 9).as("ts"))
        val m2 = star.groupBy("rho").agg(count(lit(1)).as("n2"),
          sum(g9(col("ts"))).as("sx"), sum(g9(col("ys"))).as("sy2"),
          sum(g9(round(col("ts") * col("ys"), 9))).as("sxy"),
          sum(g9(round(col("ts") * col("ts"), 9))).as("sxx"))
        m2.crossJoin(broadcast(ab.select(col("b").as("b_ols"))))
          .withColumn("bco", (col("n2").cast("double") *
            col("sxy").cast("double") -
            col("sx").cast("double") * col("sy2").cast("double")) /
            (col("n2").cast("double") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")))
          .select(col("n2").as("n_obs"),
            (round(col("rho"), 6) + lit(0.0)).as("rho"),
            (round(col("b_ols"), 6) + lit(0.0)).as("beta_ols"),
            (round(col("bco"), 6) + lit(0.0)).as("beta_co"),
            (round(((col("sy2").cast("double") -
              col("bco") * col("sx").cast("double")) /
              col("n2").cast("double")) / (lit(1.0) - col("rho")), 6)
              + lit(0.0)).as("alpha_co"))
      },
      oracle = Some(s"""
        WITH yd AS ($dailyRevenueMSql),
        y AS MATERIALIZED (
          SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS tt,
                 ym
          FROM yd),
        m1 AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(tt) AS BIGINT) AS st, SUM(ym) AS sy,
                 CAST(SUM(tt * tt) AS BIGINT) AS stt,
                 SUM(CAST(tt AS DECIMAL(18,2)) * ym) AS sty
          FROM y),
        ab AS (
          SELECT n, b,
                 (CAST(sy AS DOUBLE) - b * CAST(st AS DOUBLE))
                   / CAST(n AS DOUBLE) AS a
          FROM (
            SELECT n, st, sy,
                   (CAST(n AS DOUBLE)
                     * CAST(CAST(sty AS VARCHAR) AS DOUBLE)
                     - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE)) /
                   (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
                     - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)) AS b
            FROM m1)),
        res AS (
          SELECT tt, ym, a, b,
                 ROUND(CAST(ym AS DOUBLE)
                   - (a + b * CAST(tt AS DOUBLE)), 9) AS e
          FROM y CROSS JOIN ab),
        lagged AS MATERIALIZED (
          SELECT * FROM (
            SELECT tt, ym, e,
                   LAG(e) OVER (ORDER BY tt) AS ep,
                   LAG(ym) OVER (ORDER BY tt) AS yp
            FROM res)
          WHERE ep IS NOT NULL),
        rho AS (
          SELECT ROUND(
              CAST(SUM(CAST(ROUND(e * ep, 9) AS DECIMAL(20,9)))
                AS DOUBLE) /
              CAST(SUM(CAST(ROUND(ep * ep, 9) AS DECIMAL(20,9)))
                AS DOUBLE), 9) AS rho
          FROM lagged),
        star AS (
          SELECT rho,
                 ROUND(CAST(ym AS DOUBLE) - rho * CAST(yp AS DOUBLE), 9)
                   AS ys,
                 ROUND(CAST(tt AS DOUBLE) - rho * CAST(tt - 1 AS DOUBLE),
                   9) AS ts
          FROM lagged CROSS JOIN rho),
        m2 AS (
          SELECT rho, CAST(COUNT(*) AS BIGINT) AS n2,
                 SUM(CAST(ROUND(ts, 9) AS DECIMAL(20,9))) AS sx,
                 SUM(CAST(ROUND(ys, 9) AS DECIMAL(20,9))) AS sy2,
                 SUM(CAST(ROUND(ts * ys, 9) AS DECIMAL(20,9))) AS sxy,
                 SUM(CAST(ROUND(ts * ts, 9) AS DECIMAL(20,9))) AS sxx
          FROM star GROUP BY 1),
        f AS (
          SELECT n2, rho, b AS b_ols,
                 (CAST(n2 AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy2 AS DOUBLE)) /
                 (CAST(n2 AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS bco,
                 CAST(sx AS DOUBLE) AS sxd, CAST(sy2 AS DOUBLE) AS syd
          FROM m2 CROSS JOIN ab)
        SELECT n2 AS n_obs,
               ROUND(rho, 6) + CAST(0 AS DOUBLE) AS rho,
               ROUND(b_ols, 6) + CAST(0 AS DOUBLE) AS beta_ols,
               ROUND(bco, 6) + CAST(0 AS DOUBLE) AS beta_co,
               ROUND(((syd - bco * sxd) / CAST(n2 AS DOUBLE))
                 / (CAST(1 AS DOUBLE) - rho), 6) + CAST(0 AS DOUBLE)
                 AS alpha_co
        FROM f""")),

    // Kneedle elbow of the brand-concentration curve: brands ranked by
    // volume, the cumulative-share curve normalized to the unit
    // square, and the knee = argmax of (y_norm − x_norm) — "how many
    // brands are enough", the same geometric device that picks k for
    // k-means or the IVF cell count (q4y/q3g operational tuning).
    // Exact integer ranks, 9-grid shares, deterministic argmax
    // tiebreak on rank.
    "qi7_kneedle_elbow" -> Q(
      fn = (s, dir) => {
        val b = t(s, dir, "lineitem")
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand").as("brand"))
          .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("q"))
        val ranked = b
          .withColumn("rk", row_number().over(
            Window.orderBy(col("q").desc, col("brand"))).cast("long"))
        val tot = b.agg(sum(col("q")).as("qt"), count(lit(1)).as("nb"))
        val curve = ranked.crossJoin(broadcast(tot))
          .withColumn("cum", sum(col("q")).over(
            Window.orderBy("rk").rowsBetween(Window.unboundedPreceding, 0)))
          .select(col("rk"), col("brand"), col("nb"),
            round(col("cum").cast("double") / col("qt").cast("double"), 9)
              .as("cshare"))
          .withColumn("xn",
            (col("rk") - 1).cast("double") / (col("nb") - 1).cast("double"))
          .withColumn("d", round(col("cshare") - col("xn"), 9))
        val knee = curve.agg(max(struct(col("d").as("d"),
          (-col("rk")).as("nrk"))).as("w"))
        curve.crossJoin(broadcast(knee))
          .select(col("rk").cast("int").as("rank"), col("brand"),
            round(col("cshare"), 6).as("cum_share"),
            round(col("xn"), 6).as("x_norm"),
            (round(col("d"), 6) + lit(0.0)).as("kneedle_d"),
            when(col("rk") === -col("w.nrk"), 1).otherwise(0).cast("int")
              .as("is_elbow"))
          .orderBy("rank")
      },
      oracle = Some("""
        WITH b AS (
          SELECT p_brand AS brand,
                 SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY 1),
        ranked AS (
          SELECT brand, q,
                 CAST(ROW_NUMBER() OVER (ORDER BY q DESC, brand)
                   AS BIGINT) AS rk
          FROM b),
        tot AS (
          SELECT SUM(q) AS qt, CAST(COUNT(*) AS BIGINT) AS nb FROM b),
        curve AS MATERIALIZED (
          SELECT rk, brand, nb,
                 ROUND(CAST(SUM(q) OVER (ORDER BY rk
                     ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                   / CAST(qt AS DOUBLE), 9) AS cshare,
                 CAST(rk - 1 AS DOUBLE) / CAST(nb - 1 AS DOUBLE) AS xn
          FROM ranked CROSS JOIN tot),
        curve2 AS (
          SELECT *, ROUND(cshare - xn, 9) AS d FROM curve),
        knee AS (
          SELECT MAX({'d': d, 'nrk': -rk}) AS w FROM curve2)
        SELECT CAST(rk AS INT) AS rank, brand,
               ROUND(cshare, 6) AS cum_share,
               ROUND(xn, 6) AS x_norm,
               ROUND(d, 6) + CAST(0 AS DOUBLE) AS kneedle_d,
               CAST(CASE WHEN rk = -(w['nrk']) THEN 1 ELSE 0 END AS INT)
                 AS is_elbow
        FROM curve2 CROSS JOIN knee
        ORDER BY rank""")),

    // Pettitt changepoint test on the 30-day purchase-revenue series:
    // the rank-based (Mann–Whitney) statistic U_t over every split,
    // K = max|U_t| and its argmax day — the nonparametric
    // complement of q7q's CUSUM (fixed reference) and qc9's binary
    // segmentation (squared-error). Significance via the exp-free
    // inequality 6K²/(n³+n²) > ln(2/α) — ln is the proven link, so no
    // p-value exponential is ever evaluated. Pure integer sign sums
    // over the bounded pair panel.
    "qi8_pettitt_changepoint" -> Q(
      fn = (s, dir) => {
        val x = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(expr("unix_millis(ts) div 86400000").as("day"))
          .agg(sum(col("value").cast("decimal(18,2)")).as("yv"))
          .select(row_number().over(Window.orderBy("day")).cast("long")
            .as("i"), col("yv"))
          .localCheckpoint(eager = false)
        val n0 = x.agg(count(lit(1)).as("n"))
        val pairs = x.select(col("i").as("a"), col("yv").as("va"))
          .join(x.select(col("i").as("b"), col("yv").as("vb")),
            col("a") < col("b"))
          .select(col("a"), col("b"),
            when(col("va") > col("vb"), 1L)
              .when(col("va") < col("vb"), -1L).otherwise(0L).as("sg"))
        val grid = x.select(col("i").as("t"))
        val ut = pairs.join(broadcast(grid),
            col("a") <= col("t") && col("b") > col("t"))
          .groupBy("t").agg(sum(col("sg")).as("u"))
        val best = ut.agg(max(struct(abs(col("u")).as("k"),
          (-col("t")).as("nt"))).as("w"))
        best.crossJoin(broadcast(n0))
          .select(col("n").as("n_days"),
            col("w.k").as("pettitt_k"),
            (-col("w.nt")).as("changepoint_day_index"),
            round(lit(6.0) * col("w.k").cast("double") *
              col("w.k").cast("double") /
              (col("n").cast("double") * col("n").cast("double") *
                col("n").cast("double") +
               col("n").cast("double") * col("n").cast("double")), 6)
              .as("stat_6k2"),
            when(lit(6.0) * col("w.k").cast("double") *
              col("w.k").cast("double") /
              (col("n").cast("double") * col("n").cast("double") *
                col("n").cast("double") +
               col("n").cast("double") * col("n").cast("double")) >
              log(lit(40.0)), 1).otherwise(0).cast("int")
              .as("significant_5pct"))
      },
      oracle = Some("""
        WITH d0 AS (
          SELECT epoch_ms(ts) // 86400000 AS day,
                 SUM(CAST(value AS DECIMAL(18,2))) AS yv
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        x AS MATERIALIZED (
          SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i,
                 yv
          FROM d0),
        n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM x),
        pairs AS (
          SELECT a.i AS a, b.i AS b,
                 CASE WHEN a.yv > b.yv THEN 1
                      WHEN a.yv < b.yv THEN -1 ELSE 0 END AS sg
          FROM x a JOIN x b ON a.i < b.i),
        ut AS (
          SELECT t, CAST(SUM(sg) AS BIGINT) AS u
          FROM pairs JOIN (SELECT i AS t FROM x) g
            ON a <= t AND b > t
          GROUP BY 1),
        best AS (
          SELECT MAX({'k': ABS(u), 'nt': -t}) AS w FROM ut)
        SELECT n AS n_days,
               w['k'] AS pettitt_k,
               -(w['nt']) AS changepoint_day_index,
               ROUND(CAST(6 AS DOUBLE) * CAST(w['k'] AS DOUBLE)
                 * CAST(w['k'] AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                     * CAST(n AS DOUBLE)
                   + CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6)
                 AS stat_6k2,
               CAST(CASE WHEN CAST(6 AS DOUBLE) * CAST(w['k'] AS DOUBLE)
                 * CAST(w['k'] AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                     * CAST(n AS DOUBLE)
                   + CAST(n AS DOUBLE) * CAST(n AS DOUBLE))
                 > ln(CAST(40 AS DOUBLE)) THEN 1 ELSE 0 END AS INT)
                 AS significant_5pct
        FROM best CROSS JOIN n0""")),

    // Sarle's bimodality coefficient per order priority: b = (g₁²+1) /
    // (g₂ + 3(n−1)²/((n−2)(n−3))) over the exact-moment skewness and
    // excess kurtosis (the q6l machinery, values in millions to stay
    // inside the power-sum envelope) — b > 0.555 (the uniform's value)
    // flags a possibly two-regime value distribution that a mean ±
    // variance readout would average away. Computed FROM the 6-rounded
    // moment outputs, so the oracle replays the identical arithmetic.
    "qi9_bimodality" -> Q(
      fn = (s, dir) => {
        val o = t(s, dir, "orders")
          .select(col("o_orderpriority").as("prio"),
            (col("o_totalprice").cast("decimal(18,2)") / lit(1000000))
              .cast("decimal(18,8)").as("v"))
        val m = graft.operators.Stats.groupedMoments(o, "prio", "v")
        m.select(col("prio"), col("n"),
            col("skewness"), col("kurtosis"))
          .withColumn("corr3", lit(3.0) *
            (col("n") - 1).cast("double") * (col("n") - 1).cast("double") /
            ((col("n") - 2).cast("double") * (col("n") - 3).cast("double")))
          .select(col("prio"), col("n"),
            col("skewness"), col("kurtosis"),
            round((col("skewness") * col("skewness") + lit(1.0)) /
              (col("kurtosis") + col("corr3")), 6)
              .as("bimodality_coeff"),
            when((col("skewness") * col("skewness") + lit(1.0)) /
              (col("kurtosis") + col("corr3")) > lit(0.555), 1)
              .otherwise(0).cast("int").as("bimodal_flag"))
          .orderBy("prio")
      },
      oracle = Some("""
        WITH o AS (
          SELECT o_orderpriority AS prio,
                 CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) / 1000000
                   AS DECIMAL(18,8)) AS DOUBLE) AS x
          FROM orders),
        agg AS (
          SELECT prio, CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(x AS DECIMAL(38,6))) AS s1,
                 SUM(CAST(x * x AS DECIMAL(38,6))) AS s2,
                 SUM(CAST(x * x * x AS DECIMAL(38,6))) AS s3,
                 SUM(CAST(x * x * x * x AS DECIMAL(38,6))) AS s4
          FROM o GROUP BY 1),
        mo AS (
          SELECT prio, n,
                 CASE WHEN m2 > 0 THEN ROUND(m3 / (m2 * SQRT(m2)), 6) END
                   AS skewness,
                 CASE WHEN m2 > 0 THEN
                   ROUND(m4 / (m2 * m2) - CAST(3 AS DOUBLE), 6) END
                   AS kurtosis
          FROM (
            SELECT prio, n, m2,
                   CAST(s3 AS DOUBLE) / nd - CAST(3 AS DOUBLE) * mean
                     * (CAST(s2 AS DOUBLE) / nd)
                     + CAST(2 AS DOUBLE) * mean * mean * mean AS m3,
                   CAST(s4 AS DOUBLE) / nd - CAST(4 AS DOUBLE) * mean
                     * (CAST(s3 AS DOUBLE) / nd)
                     + CAST(6 AS DOUBLE) * mean * mean
                       * (CAST(s2 AS DOUBLE) / nd)
                     - CAST(3 AS DOUBLE) * mean * mean * mean * mean
                     AS m4
            FROM (
              SELECT prio, n, CAST(n AS DOUBLE) AS nd,
                     CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
                     CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                       - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                       * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) AS m2,
                     s2, s3, s4
              FROM agg))),
        f AS (
          SELECT prio, n, skewness, kurtosis,
                 CAST(3 AS DOUBLE) * CAST(n - 1 AS DOUBLE)
                   * CAST(n - 1 AS DOUBLE)
                   / (CAST(n - 2 AS DOUBLE) * CAST(n - 3 AS DOUBLE))
                   AS corr3
          FROM mo)
        SELECT prio, n, skewness, kurtosis,
               ROUND((skewness * skewness + CAST(1 AS DOUBLE))
                 / (kurtosis + corr3), 6) AS bimodality_coeff,
               CAST(CASE WHEN (skewness * skewness + CAST(1 AS DOUBLE))
                 / (kurtosis + corr3) > CAST(0.555 AS DOUBLE)
                 THEN 1 ELSE 0 END AS INT) AS bimodal_flag
        FROM f ORDER BY prio""")),

    // Top-k assortment turnover: Jaccard similarity of each month's
    // top-20 brand set (by revenue) with the previous month's — how
    // stable is "what sells" over time, the TEMPORAL version of qgc's
    // two-list RBO. Ranks are exact with (revenue, brand) tiebreaks;
    // intersections are integer set counts off a self-join.
    "qia_topk_turnover" -> Q(
      fn = (s, dir) => {
        val mb = t(s, dir, "lineitem")
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .select(
            expr("year(o_orderdate) * 12 + month(o_orderdate) - 1")
              .cast("long").as("m"),
            col("p_brand").as("brand"),
            col("l_extendedprice").cast("decimal(18,2)").as("ep"))
          .groupBy("m", "brand").agg(sum(col("ep")).as("rev"))
        val topk = mb
          .withColumn("rk", row_number().over(
            Window.partitionBy("m").orderBy(col("rev").desc, col("brand"))))
          .filter(col("rk") <= 20)
          .select(col("m"), col("brand"))
          .localCheckpoint(eager = false)
        val sizes = topk.groupBy("m").agg(count(lit(1)).as("sz"))
        val inter = topk.join(topk.select((col("m") + 1).as("m2"),
            col("brand").as("b2")),
            col("m") === col("m2") && col("brand") === col("b2"))
          .groupBy("m").agg(count(lit(1)).as("ix"))
        sizes.join(sizes.select((col("m") + 1).as("mp"),
            col("sz").as("psz")), col("m") === col("mp"))
          .join(inter, Seq("m"), "left")
          .select(col("m").as("month_index"),
            col("sz").as("k_current"), col("psz").as("k_prev"),
            coalesce(col("ix"), lit(0L)).as("n_common"),
            round(coalesce(col("ix"), lit(0L)).cast("double") /
              (col("sz") + col("psz") -
                coalesce(col("ix"), lit(0L))).cast("double"), 6)
              .as("jaccard"))
          .orderBy("month_index")
      },
      oracle = Some("""
        WITH mb AS (
          SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                   AS BIGINT) AS m,
                 p_brand AS brand,
                 SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
          FROM lineitem JOIN part ON l_partkey = p_partkey
          JOIN orders ON l_orderkey = o_orderkey
          GROUP BY 1, 2),
        topk AS MATERIALIZED (
          SELECT m, brand FROM (
            SELECT m, brand, ROW_NUMBER() OVER (PARTITION BY m
              ORDER BY rev DESC, brand) AS rk
            FROM mb)
          WHERE rk <= 20),
        sizes AS (
          SELECT m, CAST(COUNT(*) AS BIGINT) AS sz FROM topk GROUP BY 1),
        inter AS (
          SELECT a.m, CAST(COUNT(*) AS BIGINT) AS ix
          FROM topk a JOIN topk b
            ON a.m = b.m + 1 AND a.brand = b.brand
          GROUP BY 1)
        SELECT a.m AS month_index,
               a.sz AS k_current, p.sz AS k_prev,
               COALESCE(ix, 0) AS n_common,
               ROUND(CAST(COALESCE(ix, 0) AS DOUBLE)
                 / CAST(a.sz + p.sz - COALESCE(ix, 0) AS DOUBLE), 6)
                 AS jaccard
        FROM sizes a JOIN sizes p ON a.m = p.m + 1
        LEFT JOIN inter ON a.m = inter.m
        ORDER BY month_index""")),

    // One-step Huber M-regression of order value on line count: OLS
    // start, MAD residual scale from EXACT lower-median order
    // statistics (no interpolation — rank (n+1)÷2, deterministic in
    // both engines), Huber weights w = min(1, 1.345s/|e|), and the
    // weighted re-fit — the robust-SLOPE member beside qac's Theil–Sen
    // (rank-based) and qgr's biweight LOCATION. 9-grid weights and
    // products into DECIMAL moment sums.
    "qib_huber_regression" -> Q(
      fn = (s, dir) => {
        val feats = t(s, dir, "lineitem").groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("x"))
        val base = t(s, dir, "orders")
          .join(feats, col("o_orderkey") === col("l_orderkey"))
          .select(col("o_orderkey").as("ok"), col("x"),
            (col("o_totalprice").cast("decimal(18,2)") / lit(1000000))
              .cast("decimal(18,8)").as("y"))
          .localCheckpoint(eager = false)
        val m1 = base.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
          sum(col("x").cast("decimal(18,2)") * col("y")).as("sxy"))
        val ab = m1.select(col("n"),
            ((col("n").cast("double") *
              expr("CAST(CAST(sxy AS STRING) AS DOUBLE)") -
              col("sx").cast("double") * col("sy").cast("double")) /
              (col("n").cast("double") * col("sxx").cast("double") -
                col("sx").cast("double") * col("sx").cast("double")))
              .as("b"), col("sx"), col("sy"))
          .select(col("n"), col("b"),
            ((col("sy").cast("double") - col("b") * col("sx").cast("double"))
              / col("n").cast("double")).as("a"))
        val res = base.crossJoin(broadcast(ab))
          .select(col("ok"), col("x"), col("y"), col("n"),
            round(col("y").cast("double") -
              (col("a") + col("b") * col("x").cast("double")), 9).as("e"))
          .localCheckpoint(eager = false)
        val rd = graft.operators.ScaleOps.globalRowNumber(
          res.select(col("ok"), abs(col("e")).as("ae")),
          Seq(col("ae"), col("ok")), "rk")
        val mad = rd.crossJoin(broadcast(res.agg(max(col("n")).as("n2"))))
          .filter(col("rk") === expr("(n2 + 1) div 2"))
          .select(col("ae").as("s"))
        val wts = res.crossJoin(broadcast(mad))
          .withColumn("w", round(
            when(abs(col("e")) <= lit(1.345) * col("s"), lit(1.0))
              .otherwise(lit(1.345) * col("s") / abs(col("e"))), 9))
        val m2 = wts.agg(count(lit(1)).as("n"),
          sum(when(col("w") < 1.0, 1L).otherwise(0L)).as("n_down"),
          max(col("s")).as("smax"),
          sum(g9(col("w"))).as("sw"),
          sum(g9(round(col("w") * col("x").cast("double"), 9))).as("swx"),
          sum(g9(round(col("w") * col("y").cast("double"), 9))).as("swy"),
          sum(g9(round(col("w") * col("x").cast("double") *
            col("y").cast("double"), 9))).as("swxy"),
          sum(g9(round(col("w") * col("x").cast("double") *
            col("x").cast("double"), 9))).as("swxx"))
        m2.crossJoin(broadcast(ab.select(col("b").as("b_ols"))))
          .withColumn("bh", (col("sw").cast("double") *
            col("swxy").cast("double") -
            col("swx").cast("double") * col("swy").cast("double")) /
            (col("sw").cast("double") * col("swxx").cast("double") -
              col("swx").cast("double") * col("swx").cast("double")))
          .select(col("n").as("n_orders"), col("n_down").as("n_downweighted"),
            round(col("smax"), 6).as("mad_scale"),
            (round(col("b_ols"), 6) + lit(0.0)).as("slope_ols"),
            (round(col("bh"), 6) + lit(0.0)).as("slope_huber"),
            (round((col("swy").cast("double") -
              col("bh") * col("swx").cast("double")) /
              col("sw").cast("double"), 6) + lit(0.0))
              .as("intercept_huber"))
      },
      oracle = Some("""
        WITH feats AS (
          SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS x
          FROM lineitem GROUP BY 1),
        base AS MATERIALIZED (
          SELECT o_orderkey AS ok, x,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) / 1000000
                   AS DECIMAL(18,8)) AS y
          FROM orders JOIN feats ON o_orderkey = l_orderkey),
        m1 AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx, SUM(y) AS sy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx,
                 SUM(CAST(x AS DECIMAL(18,2)) * y) AS sxy
          FROM base),
        ab AS (
          SELECT n, b,
                 (CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE))
                   / CAST(n AS DOUBLE) AS a
          FROM (
            SELECT n, sx, sy,
                   (CAST(n AS DOUBLE)
                     * CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
                   (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b
            FROM m1)),
        res AS MATERIALIZED (
          SELECT ok, x, y, n,
                 ROUND(CAST(y AS DOUBLE)
                   - (a + b * CAST(x AS DOUBLE)), 9) AS e
          FROM base CROSS JOIN ab),
        mad AS (
          SELECT ae AS s FROM (
            SELECT ABS(e) AS ae, ok,
                   ROW_NUMBER() OVER (ORDER BY ABS(e), ok) AS rk,
                   n
            FROM res)
          WHERE rk = (n + 1) // 2),
        wts AS (
          SELECT x, y,
                 ROUND(CASE WHEN ABS(e) <= CAST(1.345 AS DOUBLE) * s
                   THEN CAST(1 AS DOUBLE)
                   ELSE CAST(1.345 AS DOUBLE) * s / ABS(e) END, 9) AS w,
                 s
          FROM res CROSS JOIN mad),
        m2 AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CASE WHEN w < 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_down,
                 MAX(s) AS smax,
                 SUM(CAST(ROUND(w, 9) AS DECIMAL(20,9))) AS sw,
                 SUM(CAST(ROUND(w * CAST(x AS DOUBLE), 9)
                   AS DECIMAL(20,9))) AS swx,
                 SUM(CAST(ROUND(w * CAST(y AS DOUBLE), 9)
                   AS DECIMAL(20,9))) AS swy,
                 SUM(CAST(ROUND(w * CAST(x AS DOUBLE)
                   * CAST(y AS DOUBLE), 9) AS DECIMAL(20,9))) AS swxy,
                 SUM(CAST(ROUND(w * CAST(x AS DOUBLE)
                   * CAST(x AS DOUBLE), 9) AS DECIMAL(20,9))) AS swxx
          FROM wts),
        f AS (
          SELECT m2.n AS n, n_down, smax, b AS b_ols,
                 (CAST(sw AS DOUBLE) * CAST(swxy AS DOUBLE)
                   - CAST(swx AS DOUBLE) * CAST(swy AS DOUBLE)) /
                 (CAST(sw AS DOUBLE) * CAST(swxx AS DOUBLE)
                   - CAST(swx AS DOUBLE) * CAST(swx AS DOUBLE)) AS bh,
                 CAST(sw AS DOUBLE) AS swd, CAST(swx AS DOUBLE) AS swxd,
                 CAST(swy AS DOUBLE) AS swyd
          FROM m2 CROSS JOIN ab)
        SELECT n AS n_orders, n_down AS n_downweighted,
               ROUND(smax, 6) AS mad_scale,
               ROUND(b_ols, 6) + CAST(0 AS DOUBLE) AS slope_ols,
               ROUND(bh, 6) + CAST(0 AS DOUBLE) AS slope_huber,
               ROUND((swyd - bh * swxd) / swd, 6) + CAST(0 AS DOUBLE)
                 AS intercept_huber
        FROM f""")),

    // Banzhaf power index over revenue-weighted regional voting: with
    // each region's revenue share as its voting weight and a
    // half-of-total quota, a region's power is the count of coalitions
    // where it SWINGS the outcome — enumerated EXACTLY over all 2⁵
    // coalitions (the game is 5 players; no sampling). Voting power ≠
    // weight share — that gap is the whole point of the index. Exact
    // DECIMAL coalition sums; one normalization at the end.
    "qic_banzhaf_power" -> Q(
      fn = (s, dir) => {
        val w = t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_regionkey").cast("long").as("rg"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("wv"))
          .localCheckpoint(eager = false)
        val tot = w.agg(sum(col("wv")).as("twv"))
        val masks = w.sparkSession.range(0, 32)
          .select(col("id").as("mask"))
        val csums = masks.crossJoin(broadcast(w))
          .filter(expr("(mask div CAST(pow(2, rg) AS BIGINT)) % 2 = 1"))
          .groupBy("mask").agg(sum(col("wv")).as("cs"))
        val swings = w.crossJoin(broadcast(
            masks.join(csums, Seq("mask"), "left")
              .select(col("mask"),
                coalesce(col("cs"), lit(0).cast("decimal(18,2)"))
                  .as("cs"))))
          .crossJoin(broadcast(tot))
          .filter(expr("(mask div CAST(pow(2, rg) AS BIGINT)) % 2 = 0"))
          .filter(col("cs") * 2 < col("twv") &&
            (col("cs") + col("wv")) * 2 >= col("twv"))
          .groupBy(col("rg"), col("wv"), col("twv"))
          .agg(count(lit(1)).as("swings"))
        val totsw = swings.agg(sum(col("swings")).as("tsw"))
        swings.crossJoin(broadcast(totsw))
          .select(col("rg").as("region"),
            round(col("wv").cast("double") / col("twv").cast("double"), 6)
              .as("weight_share"),
            col("swings"),
            round(col("swings").cast("double") / col("tsw").cast("double"),
              6).as("banzhaf_index"))
          .orderBy("region")
      },
      oracle = Some("""
        WITH w AS MATERIALIZED (
          SELECT CAST(n_regionkey AS BIGINT) AS rg,
                 SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS wv
          FROM orders JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          GROUP BY 1),
        tot AS (SELECT SUM(wv) AS twv FROM w),
        masks AS (SELECT unnest(range(0, 32)) AS mask),
        csums AS (
          SELECT mask, COALESCE(SUM(CASE
                   WHEN (mask // CAST(POW(2, rg) AS BIGINT)) % 2 = 1
                   THEN wv END), CAST(0 AS DECIMAL(18,2))) AS cs
          FROM masks CROSS JOIN w
          GROUP BY 1),
        swings AS (
          SELECT rg, wv, twv, CAST(COUNT(*) AS BIGINT) AS swings
          FROM w CROSS JOIN csums CROSS JOIN tot
          WHERE (mask // CAST(POW(2, rg) AS BIGINT)) % 2 = 0
            AND cs * 2 < twv AND (cs + wv) * 2 >= twv
          GROUP BY 1, 2, 3),
        totsw AS (SELECT CAST(SUM(swings) AS BIGINT) AS tsw FROM swings)
        SELECT rg AS region,
               ROUND(CAST(wv AS DOUBLE) / CAST(twv AS DOUBLE), 6)
                 AS weight_share,
               swings,
               ROUND(CAST(swings AS DOUBLE) / CAST(tsw AS DOUBLE), 6)
                 AS banzhaf_index
        FROM swings CROSS JOIN totsw
        ORDER BY region""")),

    // Nearest-neighbor matching ATT: region-0 (treated) customers
    // matched to the region-1 control with the closest PRE-period
    // spend (the sorted-merge prev/next device — struct max/min over
    // ordered frames, no IGNORE NULLS dependence), a 10% caliper, and
    // the average post-period spend difference over matches — the
    // matching-estimator member of the causal family (qbk DiD assumes
    // parallel trends; matching assumes selection-on-pre-spend).
    // Exact DECIMAL spends; the nearer-neighbor choice compares exact
    // decimal gaps.
    "qid_nn_matching_att" -> Q(
      fn = (s, dir) => {
        val sp = t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
          .filter(col("n_regionkey") <= 1)
          .select(col("o_custkey").as("ck"),
            when(col("n_regionkey") === 0, 1).otherwise(0).as("treat"),
            when(col("o_orderdate") < lit("1996-01-01").cast("timestamp"),
              col("o_totalprice").cast("decimal(18,2)"))
              .otherwise(lit(0).cast("decimal(18,2)")).as("pre"),
            when(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"),
              col("o_totalprice").cast("decimal(18,2)"))
              .otherwise(lit(0).cast("decimal(18,2)")).as("post"))
          .groupBy("ck", "treat")
          .agg(sum(col("pre")).as("pre"), sum(col("post")).as("post"))
          .filter(col("pre") > 0)
          .localCheckpoint(eager = false)
        val wOrd = Window.orderBy(col("pre"), col("ck"))
        val marked = sp
          .withColumn("prevc", max(when(col("treat") === 0,
            struct(col("pre").as("p"), col("post").as("o"))))
            .over(wOrd.rowsBetween(Window.unboundedPreceding, -1)))
          .withColumn("nextc", min(when(col("treat") === 0,
            struct(col("pre").as("p"), col("post").as("o"))))
            .over(wOrd.rowsBetween(1, Window.unboundedFollowing)))
        val matched = marked.filter(col("treat") === 1)
          .withColumn("dprev",
            when(col("prevc").isNotNull, col("pre") - col("prevc.p")))
          .withColumn("dnext",
            when(col("nextc").isNotNull, col("nextc.p") - col("pre")))
          .withColumn("mpost",
            when(col("dprev").isNotNull &&
              (col("dnext").isNull || col("dprev") <= col("dnext")),
              col("prevc.o"))
              .otherwise(col("nextc.o")))
          .withColumn("gap",
            when(col("dprev").isNotNull &&
              (col("dnext").isNull || col("dprev") <= col("dnext")),
              col("dprev")).otherwise(col("dnext")))
          .filter(col("gap").isNotNull &&
            col("gap").cast("double") <=
              lit(0.1) * col("pre").cast("double"))
        matched.agg(count(lit(1)).as("n_matched"),
            sum(col("post") - col("mpost")).as("sdiff"),
            sum(col("post")).as("st"), sum(col("mpost")).as("sc"))
          .crossJoin(broadcast(sp.filter(col("treat") === 1)
            .agg(count(lit(1)).as("n_treated"))))
          .select(col("n_treated"), col("n_matched"),
            round(col("st").cast("double") / col("n_matched").cast("double"),
              6).as("mean_post_treated"),
            round(col("sc").cast("double") / col("n_matched").cast("double"),
              6).as("mean_post_matched"),
            (round(col("sdiff").cast("double") /
              col("n_matched").cast("double"), 6) + lit(0.0)).as("att"))
      },
      oracle = Some("""
        WITH sp AS MATERIALIZED (
          SELECT o_custkey AS ck,
                 CASE WHEN n_regionkey = 0 THEN 1 ELSE 0 END AS treat,
                 SUM(CASE WHEN o_orderdate < TIMESTAMP '1996-01-01'
                   THEN CAST(o_totalprice AS DECIMAL(18,2))
                   ELSE CAST(0 AS DECIMAL(18,2)) END) AS pre,
                 SUM(CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01'
                   THEN CAST(o_totalprice AS DECIMAL(18,2))
                   ELSE CAST(0 AS DECIMAL(18,2)) END) AS post
          FROM orders JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          WHERE n_regionkey <= 1
          GROUP BY 1, 2 HAVING SUM(CASE WHEN o_orderdate
            < TIMESTAMP '1996-01-01'
            THEN CAST(o_totalprice AS DECIMAL(18,2))
            ELSE CAST(0 AS DECIMAL(18,2)) END) > 0),
        marked AS (
          SELECT *,
                 MAX(CASE WHEN treat = 0 THEN {'p': pre, 'o': post} END)
                   OVER (ORDER BY pre, ck
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prevc,
                 MIN(CASE WHEN treat = 0 THEN {'p': pre, 'o': post} END)
                   OVER (ORDER BY pre, ck
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                   AS nextc
          FROM sp),
        matched AS (
          SELECT * FROM (
            SELECT pre, post,
                   CASE WHEN dprev IS NOT NULL
                     AND (dnext IS NULL OR dprev <= dnext)
                     THEN prevc['o'] ELSE nextc['o'] END AS mpost,
                   CASE WHEN dprev IS NOT NULL
                     AND (dnext IS NULL OR dprev <= dnext)
                     THEN dprev ELSE dnext END AS gap
            FROM (
              SELECT pre, post, prevc, nextc,
                     CASE WHEN prevc IS NOT NULL
                       THEN pre - prevc['p'] END AS dprev,
                     CASE WHEN nextc IS NOT NULL
                       THEN nextc['p'] - pre END AS dnext
              FROM marked WHERE treat = 1))
          WHERE gap IS NOT NULL
            AND CAST(gap AS DOUBLE)
              <= CAST(0.1 AS DOUBLE) * CAST(pre AS DOUBLE)),
        nt AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_treated FROM sp
          WHERE treat = 1)
        SELECT n_treated,
               CAST(COUNT(*) AS BIGINT) AS n_matched,
               ROUND(CAST(SUM(post) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
                 6) AS mean_post_treated,
               ROUND(CAST(SUM(mpost) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS mean_post_matched,
               ROUND(CAST(SUM(post - mpost) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) + CAST(0 AS DOUBLE)
                 AS att
        FROM matched CROSS JOIN nt
        GROUP BY n_treated""")),

    // Small-world card for the order graph: transitivity C = 3T/W from
    // the exact triangle and wedge censuses, characteristic path
    // length L from the 10-seed bounded BFS (the qba walk), and the
    // Humphries–Gurney σ = (C/C_rand)/(L/L_rand) against the
    // same-density random graph's closed forms C_rand = ⟨k⟩/n,
    // L_rand = ln n/ln⟨k⟩ — σ ≫ 1 is the clustered-yet-short
    // small-world signature. Integer censuses; ln links only.
    "qie_small_world" -> Q(
      fn = (s, dir) => {
        val raw = t(s, dir, "orders").select(
          (col("o_custkey") % 80).cast("long").as("src"),
          (col("o_orderkey") % 97).cast("long").as("dst"))
          .filter(col("src") =!= col("dst"))
        val und = raw.select(least(col("src"), col("dst")).as("u"),
            greatest(col("src"), col("dst")).as("v"))
          .distinct().localCheckpoint(eager = false)
        val tri = und.as("e1")
          .join(und.as("e2"), col("e2.u") === col("e1.v"))
          .join(und.as("e3"), col("e3.u") === col("e1.u") &&
            col("e3.v") === col("e2.v"))
          .agg(count(lit(1)).as("t"))
        val deg = und.select(col("u").as("node"))
          .union(und.select(col("v")))
          .groupBy("node").agg(count(lit(1)).as("dg"))
        val degAgg = deg.agg(count(lit(1)).as("nn"),
          sum(col("dg")).as("sdg"),
          sum(col("dg") * (col("dg") - 1)).as("w2"))
        val ne = und.agg(count(lit(1)).as("ne"))
        val seeds = raw.sparkSession.range(0, 10).select(col("id").as("node"))
        val walk = graft.operators.GraphOps.harmonicCentrality(
            und.select(col("u").as("src"), col("v").as("dst"))
              .union(und.select(col("v").as("src"), col("u").as("dst"))),
            seeds, maxHops = 6)
          .agg(sum(col("reached")).as("rch"),
            sum(col("total_dist")).as("tdist"))
        tri.crossJoin(broadcast(degAgg)).crossJoin(broadcast(ne))
          .crossJoin(broadcast(walk))
          .withColumn("cc", lit(3.0) * lit(2.0) * col("t").cast("double") /
            col("w2").cast("double"))
          .withColumn("kavg", lit(2.0) * col("ne").cast("double") /
            col("nn").cast("double"))
          .withColumn("lpath", col("tdist").cast("double") /
            col("rch").cast("double"))
          .withColumn("crand", col("kavg") / col("nn").cast("double"))
          .withColumn("lrand",
            log(col("nn").cast("double")) / log(col("kavg")))
          .select(col("nn").as("n_nodes"), col("ne").as("n_edges"),
            col("t").as("n_triangles"),
            round(col("cc"), 6).as("transitivity"),
            round(col("lpath"), 6).as("avg_path_sampled"),
            round(col("crand"), 6).as("c_random"),
            round(col("lrand"), 6).as("l_random"),
            round((col("cc") / col("crand")) /
              (col("lpath") / col("lrand")), 6).as("sigma_small_world"))
      },
      oracle = Some("""
        WITH RECURSIVE raw AS (
          SELECT CAST(o_custkey % 80 AS BIGINT) AS src,
                 CAST(o_orderkey % 97 AS BIGINT) AS dst
          FROM orders WHERE o_custkey % 80 <> o_orderkey % 97),
        und AS MATERIALIZED (
          SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
          FROM raw),
        tri AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS t
          FROM und e1
          JOIN und e2 ON e2.u = e1.v
          JOIN und e3 ON e3.u = e1.u AND e3.v = e2.v),
        deg AS (
          SELECT node, CAST(COUNT(*) AS BIGINT) AS dg
          FROM (SELECT u AS node FROM und UNION ALL SELECT v FROM und)
          GROUP BY 1),
        dega AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS nn,
                 CAST(SUM(dg * (dg - 1)) AS BIGINT) AS w2
          FROM deg),
        ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS ne FROM und),
        bi AS MATERIALIZED (
          SELECT u AS src, v AS dst FROM und
          UNION ALL SELECT v, u FROM und),
        walk(source, node, dist) AS (
          SELECT CAST(range AS BIGINT), CAST(range AS BIGINT),
                 CAST(0 AS BIGINT)
          FROM range(0, 10)
          UNION
          SELECT w.source, e.dst, w.dist + 1
          FROM walk w JOIN bi e ON e.src = w.node
          WHERE w.dist < 6),
        md AS (
          SELECT source, node, MIN(dist) AS dist FROM walk GROUP BY 1, 2),
        wk AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS rch,
                 CAST(SUM(dist) AS BIGINT) AS tdist
          FROM md WHERE dist > 0),
        f AS (
          SELECT nn, ne, t,
                 CAST(3 AS DOUBLE) * CAST(2 AS DOUBLE)
                   * CAST(t AS DOUBLE) / CAST(w2 AS DOUBLE) AS cc,
                 CAST(2 AS DOUBLE) * CAST(ne AS DOUBLE)
                   / CAST(nn AS DOUBLE) AS kavg,
                 CAST(tdist AS DOUBLE) / CAST(rch AS DOUBLE) AS lpath
          FROM tri CROSS JOIN dega CROSS JOIN ne CROSS JOIN wk),
        g AS (
          SELECT *, kavg / CAST(nn AS DOUBLE) AS crand,
                 ln(CAST(nn AS DOUBLE)) / ln(kavg) AS lrand
          FROM f)
        SELECT nn AS n_nodes, ne AS n_edges, t AS n_triangles,
               ROUND(cc, 6) AS transitivity,
               ROUND(lpath, 6) AS avg_path_sampled,
               ROUND(crand, 6) AS c_random,
               ROUND(lrand, 6) AS l_random,
               ROUND((cc / crand) / (lpath / lrand), 6)
                 AS sigma_small_world
        FROM g""")),

    // Two-way ANOVA of order value over region × priority: main-effect
    // sums of squares from the weighted marginal means, the
    // interaction as the cell remainder (sequential/Type-I convention,
    // stated — the fixture is unbalanced), error from within-cell
    // variation, and both F ratios — the factorial upgrade of qbn's
    // one-way. Every SS is algebraic in exact DECIMAL power sums (the
    // q8c discipline: ROUND inside the big-decimal cast, VARCHAR
    // bridge on the squares).
    "qif_two_way_anova" -> Q(
      fn = (s, dir) => {
        val o = t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
          .select(col("n_regionkey").cast("long").as("ra"),
            col("o_orderpriority").as("pb"),
            (col("o_totalprice").cast("decimal(18,2)") / lit(1000000))
              .cast("decimal(18,8)").as("y"))
        val cells = o.groupBy("ra", "pb")
          .agg(count(lit(1)).as("nc"), sum(col("y")).as("sc"),
            sum((col("y") * col("y")).cast("decimal(38,16)")).as("ssc"))
          .localCheckpoint(eager = false)
        val g = cells.agg(sum(col("nc")).as("n"), sum(col("sc")).as("st"),
          sum(col("ssc")).as("sst"),
          countDistinct(col("ra")).as("na"),
          countDistinct(col("pb")).as("nb"),
          count(lit(1)).as("ncell"))
        val ssA = cells.groupBy("ra")
          .agg(sum(col("nc")).as("ni"), sum(col("sc")).as("si"))
          .agg(sum(g9(round(
            expr("CAST(si AS DOUBLE) * CAST(si AS DOUBLE) / CAST(ni AS DOUBLE)"),
            9))).as("qa"))
        val ssB = cells.groupBy("pb")
          .agg(sum(col("nc")).as("ni"), sum(col("sc")).as("si"))
          .agg(sum(g9(round(
            expr("CAST(si AS DOUBLE) * CAST(si AS DOUBLE) / CAST(ni AS DOUBLE)"),
            9))).as("qb"))
        val ssCells = cells.agg(sum(g9(round(
          expr("CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE) / CAST(nc AS DOUBLE)"),
          9))).as("qc"))
        g.crossJoin(broadcast(ssA)).crossJoin(broadcast(ssB))
          .crossJoin(broadcast(ssCells))
          .withColumn("cf", expr(
            "CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(n AS DOUBLE)"))
          .withColumn("ssa", col("qa").cast("double") - col("cf"))
          .withColumn("ssb", col("qb").cast("double") - col("cf"))
          .withColumn("ssab", col("qc").cast("double") -
            col("qa").cast("double") - col("qb").cast("double") + col("cf"))
          .withColumn("sse",
            expr("CAST(CAST(sst AS STRING) AS DOUBLE)") -
              col("qc").cast("double"))
          .withColumn("dfa", (col("na") - 1).cast("double"))
          .withColumn("dfb", (col("nb") - 1).cast("double"))
          .withColumn("dfab", (col("ncell") - col("na") - col("nb") + 1)
            .cast("double"))
          .withColumn("dfe", (col("n") - col("ncell")).cast("double"))
          .select(col("n").as("n_obs"),
            (round(col("ssa"), 6) + lit(0.0)).as("ss_region"),
            (round(col("ssb"), 6) + lit(0.0)).as("ss_priority"),
            (round(col("ssab"), 6) + lit(0.0)).as("ss_interaction"),
            round(col("sse"), 6).as("ss_error"),
            (round((col("ssa") / col("dfa")) /
              (col("sse") / col("dfe")), 6) + lit(0.0)).as("f_region"),
            (round((col("ssb") / col("dfb")) /
              (col("sse") / col("dfe")), 6) + lit(0.0)).as("f_priority"),
            (round((col("ssab") / col("dfab")) /
              (col("sse") / col("dfe")), 6) + lit(0.0))
              .as("f_interaction"))
      },
      oracle = Some("""
        WITH o AS (
          SELECT CAST(n_regionkey AS BIGINT) AS ra,
                 o_orderpriority AS pb,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) / 1000000
                   AS DECIMAL(18,8)) AS y
          FROM orders JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey),
        cells AS MATERIALIZED (
          SELECT ra, pb, CAST(COUNT(*) AS BIGINT) AS nc,
                 SUM(y) AS sc,
                 SUM(CAST(y AS DECIMAL(19,8)) * CAST(y AS DECIMAL(19,8)))
                   AS ssc
          FROM o GROUP BY 1, 2),
        g AS (
          SELECT CAST(SUM(nc) AS BIGINT) AS n, SUM(sc) AS st,
                 SUM(ssc) AS sst,
                 CAST(COUNT(DISTINCT ra) AS BIGINT) AS na,
                 CAST(COUNT(DISTINCT pb) AS BIGINT) AS nb,
                 CAST(COUNT(*) AS BIGINT) AS ncell
          FROM cells),
        qa AS (
          SELECT SUM(CAST(ROUND(CAST(si AS DOUBLE) * CAST(si AS DOUBLE)
                   / CAST(ni AS DOUBLE), 9) AS DECIMAL(20,9))) AS qa
          FROM (SELECT ra, CAST(SUM(nc) AS BIGINT) AS ni,
                       SUM(sc) AS si
                FROM cells GROUP BY 1)),
        qb AS (
          SELECT SUM(CAST(ROUND(CAST(si AS DOUBLE) * CAST(si AS DOUBLE)
                   / CAST(ni AS DOUBLE), 9) AS DECIMAL(20,9))) AS qb
          FROM (SELECT pb, CAST(SUM(nc) AS BIGINT) AS ni,
                       SUM(sc) AS si
                FROM cells GROUP BY 1)),
        qc AS (
          SELECT SUM(CAST(ROUND(CAST(sc AS DOUBLE) * CAST(sc AS DOUBLE)
                   / CAST(nc AS DOUBLE), 9) AS DECIMAL(20,9))) AS qc
          FROM cells),
        f AS (
          SELECT n, na, nb, ncell,
                 CAST(st AS DOUBLE) * CAST(st AS DOUBLE)
                   / CAST(n AS DOUBLE) AS cf,
                 CAST(qa AS DOUBLE) AS qad, CAST(qb AS DOUBLE) AS qbd,
                 CAST(qc AS DOUBLE) AS qcd,
                 CAST(CAST(sst AS VARCHAR) AS DOUBLE) AS sstd
          FROM g CROSS JOIN qa CROSS JOIN qb CROSS JOIN qc),
        h AS (
          SELECT n,
                 qad - cf AS ssa, qbd - cf AS ssb,
                 qcd - qad - qbd + cf AS ssab,
                 sstd - qcd AS sse,
                 CAST(na - 1 AS DOUBLE) AS dfa,
                 CAST(nb - 1 AS DOUBLE) AS dfb,
                 CAST(ncell - na - nb + 1 AS DOUBLE) AS dfab,
                 CAST(n - ncell AS DOUBLE) AS dfe
          FROM f)
        SELECT n AS n_obs,
               ROUND(ssa, 6) + CAST(0 AS DOUBLE) AS ss_region,
               ROUND(ssb, 6) + CAST(0 AS DOUBLE) AS ss_priority,
               ROUND(ssab, 6) + CAST(0 AS DOUBLE) AS ss_interaction,
               ROUND(sse, 6) AS ss_error,
               ROUND((ssa / dfa) / (sse / dfe), 6) + CAST(0 AS DOUBLE)
                 AS f_region,
               ROUND((ssb / dfb) / (sse / dfe), 6) + CAST(0 AS DOUBLE)
                 AS f_priority,
               ROUND((ssab / dfab) / (sse / dfe), 6) + CAST(0 AS DOUBLE)
                 AS f_interaction
        FROM h""")),

    // Duplication-of-purchase law over the top-5 brands: the share of
    // brand A's buyers who also bought brand B against the
    // Ehrenberg prediction duplication ≈ D·penetration(B) — the
    // marketing-science regularity that brand buyers are SHARED in
    // proportion to size, not segmented. D is fitted through the
    // origin by exact least squares over the 20 ordered pairs;
    // deviations flag genuine partitions. Integer buyer counts; two
    // divisions per pair.
    "qig_duplication_law" -> Q(
      fn = (s, dir) => {
        val bb = t(s, dir, "lineitem")
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .select(col("p_brand").as("brand"), col("o_custkey").as("ck"))
          .distinct()
          .localCheckpoint(eager = false)
        val top = bb.groupBy("brand").agg(count(lit(1)).as("nb"))
          .orderBy(col("nb").desc, col("brand")).limit(5)
          .localCheckpoint(eager = false)
        val nAll = t(s, dir, "orders")
          .select(col("o_custkey")).distinct().agg(count(lit(1)).as("nu"))
        val tb = bb.join(broadcast(top.select(col("brand"))), "brand")
        val pairs = tb.select(col("brand").as("ba"), col("ck"))
          .join(tb.select(col("brand").as("bc"), col("ck").as("ck2")),
            col("ck") === col("ck2") && col("ba") =!= col("bc"))
          .groupBy("ba", "bc").agg(count(lit(1)).as("nab"))
        val sized = pairs
          .join(broadcast(top.select(col("brand").as("ba"),
            col("nb").as("na0"))), "ba")
          .join(broadcast(top.select(col("brand").as("bc"),
            col("nb").as("nc0"))), "bc")
          .crossJoin(broadcast(nAll))
          .select(col("ba"), col("bc"),
            round(col("nab").cast("double") / col("na0").cast("double"), 9)
              .as("dup"),
            round(col("nc0").cast("double") / col("nu").cast("double"), 9)
              .as("pen"))
          .localCheckpoint(eager = false)
        val dfit = sized.agg(
            sum(g9(round(col("dup") * col("pen"), 9))).as("sxy"),
            sum(g9(round(col("pen") * col("pen"), 9))).as("sxx"))
          .select(round(col("sxy").cast("double") /
            col("sxx").cast("double"), 9).as("dcoef"))
        sized.crossJoin(broadcast(dfit))
          .select(col("ba").as("brand_buyers_of"),
            col("bc").as("also_bought"),
            round(col("dup"), 6).as("duplication"),
            round(col("pen"), 6).as("penetration"),
            round(col("dcoef"), 6).as("d_coefficient"),
            (round(col("dup") - col("dcoef") * col("pen"), 6) + lit(0.0))
              .as("residual"))
          .orderBy("brand_buyers_of", "also_bought")
      },
      oracle = Some("""
        WITH bb AS MATERIALIZED (
          SELECT DISTINCT p_brand AS brand, o_custkey AS ck
          FROM lineitem JOIN part ON l_partkey = p_partkey
          JOIN orders ON l_orderkey = o_orderkey),
        top AS MATERIALIZED (
          SELECT brand, nb FROM (
            SELECT brand, CAST(COUNT(*) AS BIGINT) AS nb
            FROM bb GROUP BY 1)
          ORDER BY nb DESC, brand LIMIT 5),
        nall AS (
          SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS nu
          FROM orders),
        tb AS MATERIALIZED (
          SELECT bb.brand, ck FROM bb JOIN top ON bb.brand = top.brand),
        pairs AS (
          SELECT a.brand AS ba, b.brand AS bc,
                 CAST(COUNT(*) AS BIGINT) AS nab
          FROM tb a JOIN tb b ON a.ck = b.ck AND a.brand <> b.brand
          GROUP BY 1, 2),
        sized AS MATERIALIZED (
          SELECT ba, bc,
                 ROUND(CAST(nab AS DOUBLE) / CAST(ta.nb AS DOUBLE), 9)
                   AS dup,
                 ROUND(CAST(tc.nb AS DOUBLE) / CAST(nu AS DOUBLE), 9)
                   AS pen
          FROM pairs
          JOIN top ta ON ba = ta.brand
          JOIN top tc ON bc = tc.brand
          CROSS JOIN nall),
        dfit AS (
          SELECT ROUND(
              CAST(SUM(CAST(ROUND(dup * pen, 9) AS DECIMAL(20,9)))
                AS DOUBLE) /
              CAST(SUM(CAST(ROUND(pen * pen, 9) AS DECIMAL(20,9)))
                AS DOUBLE), 9) AS dcoef
          FROM sized)
        SELECT ba AS brand_buyers_of, bc AS also_bought,
               ROUND(dup, 6) AS duplication,
               ROUND(pen, 6) AS penetration,
               ROUND(dcoef, 6) AS d_coefficient,
               ROUND(dup - dcoef * pen, 6) + CAST(0 AS DOUBLE)
                 AS residual
        FROM sized CROSS JOIN dfit
        ORDER BY brand_buyers_of, also_bought""")),

    // CUSUM-of-squares variance-stability scan (Brown–Durbin–Evans) on
    // the daily revenue changes: S_t = Σ_{i≤t}e²ᵢ / Σe² against the
    // uniform diagonal t/n, the max |S_t − t/n| and its day — a MEAN
    // break leaves this flat while a VOLATILITY break bends it, the
    // exact complement of q7q's mean-CUSUM (and qgt's ARCH test, which
    // is a 1-lag parametric cousin). Squares ride the 9-grid into
    // DECIMAL cumulatives; the envelope comparison is one division
    // per row.
    "qih_cusum_squares" -> Q(
      fn = (s, dir) => {
        val y = dailyRevenueM(s, dir)
        val w = Window.orderBy("day")
        val e = y.withColumn("prev", lag("ym", 1).over(w))
          .filter(col("prev").isNotNull)
          .select(col("day"),
            round((col("ym") - col("prev")).cast("double"), 9).as("e"))
          .withColumn("e2", g9(round(col("e") * col("e"), 9)))
          .withColumn("tix",
            row_number().over(Window.orderBy("day")).cast("long"))
          .localCheckpoint(eager = false)
        val tot = e.agg(count(lit(1)).as("n"), sum(col("e2")).as("se2"))
        val scan = e.crossJoin(broadcast(tot))
          .withColumn("cum", sum(col("e2")).over(
            Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)))
          .withColumn("st", col("cum").cast("double") /
            col("se2").cast("double"))
          .withColumn("dev", round(abs(col("st") -
            col("tix").cast("double") / col("n").cast("double")), 9))
        val worst = scan.agg(max(struct(col("dev").as("d"),
          (-col("tix")).as("nt"))).as("w"), max(col("n")).as("n"))
        worst.select(col("n").as("n_changes"),
            round(col("w.d"), 6).as("max_deviation"),
            (-col("w.nt")).as("at_index"),
            // Brown-Durbin-Evans 5% envelope c ≈ 0.948/√n (large-sample)
            round(lit(0.948) / sqrt(col("n").cast("double")), 6)
              .as("envelope_5pct"),
            when(col("w.d") > lit(0.948) / sqrt(col("n").cast("double")),
              1).otherwise(0).cast("int").as("variance_break_flag"))
      },
      oracle = Some(s"""
        WITH y AS ($dailyRevenueMSql),
        e AS MATERIALIZED (
          SELECT day,
                 ROUND(CAST(ym - prev AS DOUBLE), 9) AS e,
                 CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS tix
          FROM (SELECT day, ym, LAG(ym) OVER (ORDER BY day) AS prev
                FROM y)
          WHERE prev IS NOT NULL),
        e2 AS MATERIALIZED (
          SELECT day, tix,
                 CAST(ROUND(e * e, 9) AS DECIMAL(20,9)) AS e2
          FROM e),
        tot AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(e2) AS se2 FROM e2),
        scan AS (
          SELECT tix, n,
                 ROUND(ABS(CAST(SUM(e2) OVER (ORDER BY day
                     ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                   / CAST(se2 AS DOUBLE)
                   - CAST(tix AS DOUBLE) / CAST(n AS DOUBLE)), 9) AS dev
          FROM e2 CROSS JOIN tot),
        worst AS (
          SELECT MAX({'d': dev, 'nt': -tix}) AS w, MAX(n) AS n
          FROM scan)
        SELECT n AS n_changes,
               ROUND(w['d'], 6) AS max_deviation,
               -(w['nt']) AS at_index,
               ROUND(CAST(0.948 AS DOUBLE) / SQRT(CAST(n AS DOUBLE)), 6)
                 AS envelope_5pct,
               CAST(CASE WHEN w['d'] > CAST(0.948 AS DOUBLE)
                 / SQRT(CAST(n AS DOUBLE)) THEN 1 ELSE 0 END AS INT)
                 AS variance_break_flag
        FROM worst""")),

    // Allan variance of the daily purchase-revenue series at
    // averaging times τ = 1, 2, 4, 8 days: σ²(τ) = ½·mean((ȳ_{k+1} −
    // ȳ_k)²) over non-overlapping τ-blocks — the stability-vs-
    // averaging-window diagnostic from time/frequency metrology (white
    // noise falls as 1/τ, drift RISES — a plain variance can't tell
    // them apart). Block means are exact DECIMAL/τ ratios on the
    // 9-grid; one pooled mean per τ.
    "qii_allan_variance" -> Q(
      fn = (s, dir) => {
        val x = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(expr("unix_millis(ts) div 86400000").as("day"))
          .agg(sum(col("value").cast("decimal(18,2)")).as("yv"))
          .select((row_number().over(Window.orderBy("day")) - 1)
            .cast("long").as("i"), col("yv"))
          .localCheckpoint(eager = false)
        val taus = Seq(1, 2, 4, 8)
        val perTau = taus.map { tau =>
          val blocks = x.withColumn("blk", expr(s"i div $tau"))
            .groupBy("blk")
            .agg(count(lit(1)).as("m"), sum(col("yv")).as("sv"))
            .filter(col("m") === tau)
            .select(col("blk"),
              round(col("sv").cast("double") / lit(tau.toDouble), 9)
                .as("bm"))
          val wB = Window.orderBy("blk")
          blocks.withColumn("nxt", lead("bm", 1).over(wB))
            .filter(col("nxt").isNotNull)
            .select(round((col("nxt") - col("bm")) *
              (col("nxt") - col("bm")), 9).as("d2"))
            .agg(count(lit(1)).as("n_pairs"),
              sum(g9(col("d2"))).as("sd2"))
            .select(lit(tau).as("tau_days"), col("n_pairs"),
              round(lit(0.5) * col("sd2").cast("double") /
                col("n_pairs").cast("double"), 6).as("allan_var"))
        }
        perTau.reduce(_ unionAll _).orderBy("tau_days")
      },
      oracle = Some({
        def one(tau: Int) =
          s"""SELECT CAST($tau AS INT) AS tau_days,
             |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
             |  ROUND(CAST(0.5 AS DOUBLE)
             |    * CAST(SUM(CAST(ROUND(d2, 9) AS DECIMAL(20,9)))
             |        AS DOUBLE)
             |    / CAST(COUNT(*) AS DOUBLE), 6) AS allan_var
             |FROM (
             |  SELECT ROUND((nxt - bm) * (nxt - bm), 9) AS d2
             |  FROM (
             |    SELECT bm, LEAD(bm) OVER (ORDER BY blk) AS nxt
             |    FROM (
             |      SELECT i // $tau AS blk,
             |             ROUND(CAST(SUM(yv) AS DOUBLE)
             |               / CAST($tau AS DOUBLE), 9) AS bm
             |      FROM x GROUP BY 1 HAVING COUNT(*) = $tau))
             |  WHERE nxt IS NOT NULL)""".stripMargin
        s"""
        WITH d0 AS (
          SELECT epoch_ms(ts) // 86400000 AS day,
                 SUM(CAST(value AS DECIMAL(18,2))) AS yv
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        x AS MATERIALIZED (
          SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) - 1 AS BIGINT)
                   AS i, yv
          FROM d0)
        ${Seq(1, 2, 4, 8).map(one).mkString("\n        UNION ALL\n        ")}
        ORDER BY tau_days"""
      })),

    // Disparity-filter backbone of the brand co-purchase graph
    // (Serrano–Boguñá): an edge survives when its weight share is
    // significant against the null of uniformly-split node strength —
    // tested ENTIRELY in log space, (k−1)·ln(1 − w/s) < ln(α), so the
    // banned exponential never evaluates (the α_ij = (1−w/s)^(k−1)
    // power is compared, not computed). Keeps the statistically
    // meaningful skeleton that a global weight threshold (q7e's top-k)
    // distorts for small-strength nodes. 9-grid shares; ln links.
    "qij_disparity_backbone" -> Q(
      // Graph choice matters: the brand–brand co-purchase and the
      // nation trade matrices in this fixture are UNIFORM — nothing
      // passes the filter at any SF (hash-matching on empty output,
      // the vacuity trap). The customer→brand bipartite has genuine
      // small-sample skew (k ~ 5–20 brands per customer), so the
      // backbone is non-empty at every SF (6 / 93 / 906 edges).
      fn = (s, dir) => {
        val e = t(s, dir, "lineitem")
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_custkey").as("ck"), col("p_brand").as("brand"))
          .agg(count(lit(1)).as("w"))
          .localCheckpoint(eager = false)
        val strength = e.groupBy("ck")
          .agg(sum(col("w")).as("si"), count(lit(1)).as("ki"))
        val scored = e.join(strength, "ck")
          .withColumn("la", when(col("ki") > 1,
            round((col("ki") - 1).cast("double") *
              log(lit(1.0) - round(col("w").cast("double") /
                col("si").cast("double"), 9)), 9)))
        val kept = scored.filter(col("la") < log(lit(0.05)))
        val nKept = kept.agg(count(lit(1)).as("n_backbone"))
        kept.crossJoin(broadcast(nKept))
          .select(col("ck").as("customer"), col("brand"),
            col("w").as("weight"), col("ki").as("n_brands"),
            (round(col("la"), 6) + lit(0.0)).as("log_alpha"),
            col("n_backbone"))
          .orderBy(col("log_alpha"), col("customer"), col("brand"))
          .limit(30)
      },
      oracle = Some("""
        WITH e AS MATERIALIZED (
          SELECT o_custkey AS ck, p_brand AS brand,
                 CAST(COUNT(*) AS BIGINT) AS w
          FROM lineitem JOIN part ON l_partkey = p_partkey
          JOIN orders ON l_orderkey = o_orderkey
          GROUP BY 1, 2),
        strength AS (
          SELECT ck, CAST(SUM(w) AS BIGINT) AS si,
                 CAST(COUNT(*) AS BIGINT) AS ki
          FROM e GROUP BY 1),
        scored AS (
          SELECT e.ck, brand, w, ki,
                 CASE WHEN ki > 1 THEN
                   ROUND(CAST(ki - 1 AS DOUBLE)
                     * ln(CAST(1 AS DOUBLE)
                       - ROUND(CAST(w AS DOUBLE) / CAST(si AS DOUBLE),
                           9)), 9) END AS la
          FROM e JOIN strength ON e.ck = strength.ck),
        kept AS MATERIALIZED (
          SELECT * FROM scored WHERE la < ln(CAST(0.05 AS DOUBLE))),
        nk AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_backbone FROM kept)
        SELECT ck AS customer, brand, w AS weight, ki AS n_brands,
               ROUND(la, 6) + CAST(0 AS DOUBLE) AS log_alpha,
               n_backbone
        FROM kept CROSS JOIN nk
        ORDER BY log_alpha, customer, brand LIMIT 30""")),

    // Streak-conditional purchase rates ("hot hand"): P(purchase |
    // previous k events were purchases) for k = 1, 2, 3 against the
    // k = 0 base rate, per-user ordered lags — does buying beget
    // buying within a session stream, or is the streak an illusion?
    // (Read with care: streak-conditional frequencies carry the
    // Miller–Sanjurjo selection bias in short sequences — reported
    // beside the base, not as a test.) Pure integer lag counting.
    "qik_streak_conditional" -> Q(
      fn = (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("user_id"), unix_millis(col("ts")).as("ms"),
            col("event_id"),
            when(col("event_type") === "purchase", 1L).otherwise(0L)
              .as("p"))
        val wU = Window.partitionBy("user_id")
          .orderBy(col("ms"), col("event_id"))
        val lagged = e
          .withColumn("p1", lag("p", 1).over(wU))
          .withColumn("p2", lag("p", 2).over(wU))
          .withColumn("p3", lag("p", 3).over(wU))
          .localCheckpoint(eager = false)
        val base = lagged.agg(lit(0).as("k"),
          count(lit(1)).as("n_cond"), sum(col("p")).as("n_hits"))
        def cond(k: Int) = {
          val f = (1 to k).map(i => col(s"p$i") === 1L).reduce(_ && _)
          lagged.filter((1 to k).map(i => col(s"p$i").isNotNull)
              .reduce(_ && _) && f)
            .agg(lit(k).as("k"), count(lit(1)).as("n_cond"),
              sum(col("p")).as("n_hits"))
        }
        val all = base.unionAll(cond(1)).unionAll(cond(2)).unionAll(cond(3))
        val b = base.select((col("n_hits").cast("double") /
          col("n_cond").cast("double")).as("base_rate"))
        all.crossJoin(broadcast(b))
          .select(col("k"), col("n_cond"), col("n_hits"),
            round(col("n_hits").cast("double") /
              col("n_cond").cast("double"), 6).as("p_purchase"),
            round((col("n_hits").cast("double") /
              col("n_cond").cast("double")) / col("base_rate"), 6)
              .as("lift_vs_base"))
          .orderBy("k")
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id, epoch_ms(ts) AS ms, event_id,
                 CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS p
          FROM events),
        lagged AS MATERIALIZED (
          SELECT p,
                 LAG(p, 1) OVER (PARTITION BY user_id
                   ORDER BY ms, event_id) AS p1,
                 LAG(p, 2) OVER (PARTITION BY user_id
                   ORDER BY ms, event_id) AS p2,
                 LAG(p, 3) OVER (PARTITION BY user_id
                   ORDER BY ms, event_id) AS p3
          FROM e),
        rows_k AS (
          SELECT CAST(0 AS INT) AS k, CAST(COUNT(*) AS BIGINT) AS n_cond,
                 CAST(SUM(p) AS BIGINT) AS n_hits
          FROM lagged
          UNION ALL
          SELECT CAST(1 AS INT), CAST(COUNT(*) AS BIGINT),
                 CAST(SUM(p) AS BIGINT)
          FROM lagged WHERE p1 = 1
          UNION ALL
          SELECT CAST(2 AS INT), CAST(COUNT(*) AS BIGINT),
                 CAST(SUM(p) AS BIGINT)
          FROM lagged WHERE p1 = 1 AND p2 = 1
          UNION ALL
          SELECT CAST(3 AS INT), CAST(COUNT(*) AS BIGINT),
                 CAST(SUM(p) AS BIGINT)
          FROM lagged WHERE p1 = 1 AND p2 = 1 AND p3 = 1),
        base AS (
          SELECT CAST(n_hits AS DOUBLE) / CAST(n_cond AS DOUBLE)
                   AS base_rate
          FROM rows_k WHERE k = 0)
        SELECT k, n_cond, n_hits,
               ROUND(CAST(n_hits AS DOUBLE) / CAST(n_cond AS DOUBLE), 6)
                 AS p_purchase,
               ROUND((CAST(n_hits AS DOUBLE) / CAST(n_cond AS DOUBLE))
                 / base_rate, 6) AS lift_vs_base
        FROM rows_k CROSS JOIN base
        ORDER BY k""")),

    // Randomized-response privacy mechanism, audited end to end: each
    // user answers "did you purchase?" truthfully with q = 3/4, else a
    // forced md5 coin — the reported rate is debiased by
    // π̂ = (p̂ − (1−q)/2)/q and compared against the true rate the
    // mechanism never saw. The LOCAL-privacy member of the family (q7t
    // adds central DP noise to aggregates; RR protects each ROW).
    // Coins are exact 48-bit integer threshold compares (no float
    // draws); the debias is two divisions.
    "qil_randomized_response" -> Q(
      fn = (s, dir) => {
        val truth = t(s, dir, "events")
          .groupBy("user_id")
          .agg(max(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)).as("tr"))
        def draw(salt: String) =
          conv(substring(md5(concat(lit(salt),
            col("user_id").cast("string"))), 1, 12), 16, 10).cast("long")
        // thresholds: 0.75·2^48 and 0.5·2^48, exact integers
        val reported = truth
          .withColumn("d1", draw("rr1"))
          .withColumn("d2", draw("rr2"))
          .withColumn("ans",
            when(col("d1") < lit(211106232532992L), col("tr"))
              .otherwise(when(col("d2") < lit(140737488355328L), 1L)
                .otherwise(0L)))
        reported.agg(count(lit(1)).as("n_users"),
            sum(col("tr")).as("n_true"), sum(col("ans")).as("n_yes"))
          .select(col("n_users"),
            round(col("n_true").cast("double") /
              col("n_users").cast("double"), 6).as("true_rate"),
            round(col("n_yes").cast("double") /
              col("n_users").cast("double"), 6).as("reported_rate"),
            (round((col("n_yes").cast("double") /
              col("n_users").cast("double") - lit(0.125)) / lit(0.75), 6)
              + lit(0.0)).as("debiased_rate"),
            (round(abs((col("n_yes").cast("double") /
              col("n_users").cast("double") - lit(0.125)) / lit(0.75) -
              col("n_true").cast("double") /
              col("n_users").cast("double")), 6) + lit(0.0))
              .as("abs_error"))
      },
      oracle = Some("""
        WITH truth AS (
          SELECT user_id,
                 CAST(MAX(CASE WHEN event_type = 'purchase'
                   THEN 1 ELSE 0 END) AS BIGINT) AS tr
          FROM events GROUP BY 1),
        reported AS (
          SELECT tr,
                 CASE WHEN CAST('0x' || substr(md5('rr1'
                     || CAST(user_id AS VARCHAR)), 1, 12) AS BIGINT)
                     < 211106232532992 THEN tr
                   WHEN CAST('0x' || substr(md5('rr2'
                     || CAST(user_id AS VARCHAR)), 1, 12) AS BIGINT)
                     < 140737488355328 THEN 1
                   ELSE 0 END AS ans
          FROM truth),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
                 CAST(SUM(tr) AS BIGINT) AS n_true,
                 CAST(SUM(ans) AS BIGINT) AS n_yes
          FROM reported)
        SELECT n_users,
               ROUND(CAST(n_true AS DOUBLE) / CAST(n_users AS DOUBLE), 6)
                 AS true_rate,
               ROUND(CAST(n_yes AS DOUBLE) / CAST(n_users AS DOUBLE), 6)
                 AS reported_rate,
               ROUND((CAST(n_yes AS DOUBLE) / CAST(n_users AS DOUBLE)
                 - CAST(0.125 AS DOUBLE)) / CAST(0.75 AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS debiased_rate,
               ROUND(ABS((CAST(n_yes AS DOUBLE) / CAST(n_users AS DOUBLE)
                 - CAST(0.125 AS DOUBLE)) / CAST(0.75 AS DOUBLE)
                 - CAST(n_true AS DOUBLE) / CAST(n_users AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS abs_error
        FROM agg""")),

    // Giant-component profile of the (1/97-sampled) order graph: the
    // top-5 connected components by size with the giant share — the
    // percolation summary that says whether the graph IS one connected
    // object or an archipelago (every graph metric upstream silently
    // assumes an answer). Components from the proven pointer-jumping
    // CC (q37's operator); the oracle replays reachability with the
    // recursive MIN-label CTE.
    "qim_giant_component" -> Q(
      fn = (s, dir) => {
        val pairs = t(s, dir, "orders")
          .filter(col("o_orderkey") % 97 === 0)
          .select((col("o_custkey") % 400).cast("long").as("doc_a"),
            (col("o_orderkey") % 400).cast("long").as("doc_b"))
          .filter(col("doc_a") =!= col("doc_b"))
          .distinct()
        val comps = graft.operators.Dedup.connectedComponents(pairs)
        val sizes = comps.groupBy("component_id")
          .agg(count(lit(1)).as("sz"))
        val tot = sizes.agg(count(lit(1)).as("n_components"),
          sum(col("sz")).as("n_nodes"))
        sizes.crossJoin(broadcast(tot))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("sz").desc, col("component_id"))))
          .filter(col("rk") <= 5)
          .select(col("rk").cast("int").as("comp_rank"),
            col("component_id"), col("sz").as("size"),
            col("n_components"), col("n_nodes"),
            round(col("sz").cast("double") / col("n_nodes").cast("double"),
              6).as("share"))
          .orderBy("comp_rank")
      },
      oracle = Some("""
        WITH RECURSIVE pairs AS (
          SELECT DISTINCT CAST(o_custkey % 400 AS BIGINT) AS doc_a,
                 CAST(o_orderkey % 400 AS BIGINT) AS doc_b
          FROM orders
          WHERE o_orderkey % 97 = 0
            AND o_custkey % 400 <> o_orderkey % 400),
        edges AS MATERIALIZED (
          SELECT doc_a AS src, doc_b AS dst FROM pairs
          UNION SELECT doc_b, doc_a FROM pairs),
        reach(node, comp) AS (
          SELECT src, src FROM edges
          UNION
          SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.node),
        comps AS (
          SELECT node, MIN(comp) AS component_id FROM reach GROUP BY 1),
        sizes AS (
          SELECT component_id, CAST(COUNT(*) AS BIGINT) AS sz
          FROM comps GROUP BY 1),
        tot AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_components,
                 CAST(SUM(sz) AS BIGINT) AS n_nodes
          FROM sizes),
        ranked AS (
          SELECT component_id, sz, n_components, n_nodes,
                 CAST(ROW_NUMBER() OVER (ORDER BY sz DESC, component_id)
                   AS INT) AS rk
          FROM sizes CROSS JOIN tot)
        SELECT rk AS comp_rank, component_id, sz AS size,
               n_components, n_nodes,
               ROUND(CAST(sz AS DOUBLE) / CAST(n_nodes AS DOUBLE), 6)
                 AS share
        FROM ranked WHERE rk <= 5
        ORDER BY comp_rank""")),

    // Longest dependency chain (≤6 hops) in the low→high-keyed DAG cut
    // of the sampled order graph: per-node longest incoming chain by
    // six unrolled max-relaxation rounds (the q4b per-round-checkpoint
    // discipline — the DP is monotone, so round k holds the exact
    // ≤k-hop answer; the horizon is declared, not silent) — the
    // critical-path primitive for any precedence graph. The oracle
    // enumerates (node, depth) pairs with a depth-bounded recursive
    // CTE: identical maxima, polynomially-bounded both ways.
    "qin_longest_chain" -> Q(
      fn = (s, dir) => {
        val edges = t(s, dir, "orders")
          .filter(col("o_orderkey") % 97 === 0)
          .select((col("o_custkey") % 400).cast("long").as("u"),
            (col("o_orderkey") % 400).cast("long").as("v"))
          .filter(col("u") < col("v")).distinct()
          .localCheckpoint(eager = false)
        val nodes = edges.select(col("u").as("node"))
          .union(edges.select(col("v"))).distinct()
        var dist = nodes.withColumn("d", lit(0L))
          .localCheckpoint(eager = false)
        for (_ <- 1 to 6) {
          val relaxed = edges
            .join(dist.select(col("node").as("u"), col("d")), Seq("u"))
            .select(col("v").as("node"), (col("d") + 1).as("d"))
          dist = dist.union(relaxed)
            .groupBy("node").agg(max(col("d")).as("d"))
            .localCheckpoint(eager = false)
        }
        val mx = dist.agg(max(col("d")).as("maxchain"),
          count(lit(1)).as("n_nodes"))
        dist.crossJoin(broadcast(mx))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("d").desc, col("node"))))
          .filter(col("rk") <= 10)
          .select(col("rk").cast("int").as("rank"), col("node"),
            col("d").as("chain_len"), col("maxchain"), col("n_nodes"))
          .orderBy("rank")
      },
      oracle = Some("""
        WITH RECURSIVE edges AS MATERIALIZED (
          SELECT DISTINCT CAST(o_custkey % 400 AS BIGINT) AS u,
                 CAST(o_orderkey % 400 AS BIGINT) AS v
          FROM orders
          WHERE o_orderkey % 97 = 0
            AND o_custkey % 400 < o_orderkey % 400),
        nodes AS (
          SELECT DISTINCT node FROM (
            SELECT u AS node FROM edges UNION ALL SELECT v FROM edges)),
        walk(node, d) AS (
          SELECT node, CAST(0 AS BIGINT) FROM nodes
          UNION
          SELECT e.v, w.d + 1
          FROM walk w JOIN edges e ON e.u = w.node
          WHERE w.d < 6),
        dist AS (
          SELECT node, MAX(d) AS d FROM walk GROUP BY 1),
        mx AS (
          SELECT MAX(d) AS maxchain, CAST(COUNT(*) AS BIGINT) AS n_nodes
          FROM dist),
        ranked AS (
          SELECT node, d, maxchain, n_nodes,
                 CAST(ROW_NUMBER() OVER (ORDER BY d DESC, node) AS INT)
                   AS rk
          FROM dist CROSS JOIN mx)
        SELECT rk AS rank, node, d AS chain_len, maxchain, n_nodes
        FROM ranked WHERE rk <= 10
        ORDER BY rank""")),

    // Delete-a-group jackknife for the revenue-per-order ratio: 25
    // leave-one-nation-out replicates R₍g₎ = (ΣY−Y_g)/(ΣN−N_g), SE =
    // √((G−1)/G · Σ(R₍g₎−R̄)²) — the survey-practice variance device
    // for NONLINEAR statistics (a ratio's SE is not the ratio of SEs),
    // closed-form because deletion only shifts the two totals. Exact
    // DECIMAL group images; replicate deviations on the 12-grid.
    "qio_jackknife_ratio" -> Q(
      fn = (s, dir) => {
        val g = t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_nationkey").cast("long").as("nk"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("yg"),
            count(lit(1)).as("ng"))
          .localCheckpoint(eager = false)
        val tot = g.agg(sum(col("yg")).as("sy"), sum(col("ng")).as("sn"),
          count(lit(1)).as("gg"))
        val reps = g.crossJoin(broadcast(tot))
          .select(col("gg"), col("sy"), col("sn"),
            round((col("sy") - col("yg")).cast("double") /
              (col("sn") - col("ng")).cast("double"), 9).as("rg"))
        val rbar = reps.agg(max(col("gg")).as("gg"),
            max(col("sy")).as("sy"), max(col("sn")).as("sn"),
            round(sum(g9(col("rg"))).cast("double") /
              count(lit(1)).cast("double"), 9).as("rb"))
        reps.crossJoin(broadcast(rbar.select(col("rb"))))
          .agg(max(col("gg")).as("n_groups"),
            max(col("sy")).as("syx"), max(col("sn")).as("snx"),
            sum(round((col("rg") - col("rb")) * (col("rg") - col("rb")),
              12).cast("decimal(28,12)")).as("ssq"))
          .select(col("n_groups"),
            round(col("syx").cast("double") / col("snx").cast("double"), 6)
              .as("ratio"),
            round(sqrt((col("n_groups") - 1).cast("double") /
              col("n_groups").cast("double") *
              col("ssq").cast("double")), 6).as("se_jackknife"),
            (round(col("syx").cast("double") / col("snx").cast("double") -
              lit(1.96) * sqrt((col("n_groups") - 1).cast("double") /
                col("n_groups").cast("double") *
                col("ssq").cast("double")), 6) + lit(0.0)).as("ci_lo"),
            (round(col("syx").cast("double") / col("snx").cast("double") +
              lit(1.96) * sqrt((col("n_groups") - 1).cast("double") /
                col("n_groups").cast("double") *
                col("ssq").cast("double")), 6) + lit(0.0)).as("ci_hi"))
      },
      oracle = Some("""
        WITH g AS MATERIALIZED (
          SELECT CAST(c_nationkey AS BIGINT) AS nk,
                 SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS yg,
                 CAST(COUNT(*) AS BIGINT) AS ng
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY 1),
        tot AS (
          SELECT SUM(yg) AS sy, CAST(SUM(ng) AS BIGINT) AS sn,
                 CAST(COUNT(*) AS BIGINT) AS gg
          FROM g),
        reps AS (
          SELECT gg, sy, sn,
                 ROUND(CAST(sy - yg AS DOUBLE)
                   / CAST(sn - ng AS DOUBLE), 9) AS rg
          FROM g CROSS JOIN tot),
        rbar AS (
          SELECT ROUND(CAST(SUM(CAST(ROUND(rg, 9) AS DECIMAL(20,9)))
                   AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9) AS rb
          FROM reps),
        f AS (
          SELECT MAX(gg) AS n_groups, MAX(sy) AS syx, MAX(sn) AS snx,
                 CAST(SUM(CAST(ROUND((rg - rb) * (rg - rb), 12)
                   AS DECIMAL(28,12))) AS DOUBLE) AS ssq
          FROM reps CROSS JOIN rbar),
        h AS (
          SELECT n_groups,
                 CAST(syx AS DOUBLE) / CAST(snx AS DOUBLE) AS ratio,
                 SQRT(CAST(n_groups - 1 AS DOUBLE)
                   / CAST(n_groups AS DOUBLE) * ssq) AS se
          FROM f)
        SELECT n_groups,
               ROUND(ratio, 6) AS ratio,
               ROUND(se, 6) AS se_jackknife,
               ROUND(ratio - CAST(1.96 AS DOUBLE) * se, 6)
                 + CAST(0 AS DOUBLE) AS ci_lo,
               ROUND(ratio + CAST(1.96 AS DOUBLE) * se, 6)
                 + CAST(0 AS DOUBLE) AS ci_hi
        FROM h""")),

    // SETAR two-regime AR(1) on daily revenue: the series' own lagged
    // value (split at its exact lower median) selects the regime, each
    // regime gets its own AR(1) fit, and the pooled-vs-split SSE F
    // tests whether the dynamics genuinely switch — the simplest
    // THRESHOLD nonlinearity beside qb9's single-regime Yule–Walker
    // (mean reversion from a low base often differs from decay from a
    // high one). Exact median threshold; all fits from 9-grid DECIMAL
    // moment images.
    "qip_setar" -> Q(
      fn = (s, dir) => {
        val y = dailyRevenueM(s, dir)
        val w = Window.orderBy("day")
        val p = y.withColumn("yl", lag("ym", 1).over(w))
          .filter(col("yl").isNotNull)
          .select(col("day"),
            round(col("ym").cast("double"), 9).as("yt"),
            round(col("yl").cast("double"), 9).as("ylag"))
          .localCheckpoint(eager = false)
        val n0 = p.agg(count(lit(1)).as("n"))
        val thr = p.crossJoin(broadcast(n0))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("ylag"), col("day"))))
          .filter(col("rk") === expr("(n + 1) div 2"))
          .select(col("ylag").as("thr"))
        val tagged = p.crossJoin(broadcast(thr))
          .withColumn("rg", when(col("ylag") <= col("thr"), 0)
            .otherwise(1))
        def mom(df: DataFrame, gcols: Seq[Column]) = df
          .groupBy(gcols: _*)
          .agg(count(lit(1)).as("n"),
            sum(g9(col("ylag"))).as("sx"), sum(g9(col("yt"))).as("sy"),
            sum(g9(round(col("ylag") * col("yt"), 9))).as("sxy"),
            sum(g9(round(col("ylag") * col("ylag"), 9))).as("sxx"),
            sum(g9(round(col("yt") * col("yt"), 9))).as("syy"))
        def fit(pref: String): Column => Column = identity
        def sseCols(df: DataFrame): DataFrame = df
          .withColumn("nd", col("n").cast("double"))
          .withColumn("b", (col("nd") *
            col("sxy").cast("double") - col("sx").cast("double") *
            col("sy").cast("double")) /
            (col("nd") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")))
          .withColumn("a", (col("sy").cast("double") -
            col("b") * col("sx").cast("double")) / col("nd"))
          .withColumn("sse", col("syy").cast("double") -
            col("a") * col("sy").cast("double") -
            col("b") * col("sxy").cast("double"))
        val reg = sseCols(mom(tagged, Seq(col("rg"))))
        val pooled = sseCols(mom(tagged.withColumn("all", lit(0)),
          Seq(col("all"))))
        val regW = reg.agg(
          max(when(col("rg") === 0, col("b"))).as("b_lo"),
          max(when(col("rg") === 1, col("b"))).as("b_hi"),
          max(when(col("rg") === 0, col("a"))).as("a_lo"),
          max(when(col("rg") === 1, col("a"))).as("a_hi"),
          sum(col("sse")).as("sse_split"),
          sum(col("n")).as("ntot"))
        regW.crossJoin(broadcast(pooled.select(
            col("sse").as("sse_pool"), col("b").as("b_pool"))))
          .crossJoin(broadcast(thr))
          .select(col("ntot").as("n_obs"),
            round(col("thr"), 6).as("threshold_m"),
            (round(col("b_lo"), 6) + lit(0.0)).as("ar_low"),
            (round(col("b_hi"), 6) + lit(0.0)).as("ar_high"),
            (round(col("b_pool"), 6) + lit(0.0)).as("ar_pooled"),
            (round((col("sse_pool") - col("sse_split")) / lit(2.0) /
              (col("sse_split") / (col("ntot") - 4).cast("double")), 6)
              + lit(0.0)).as("f_regime"))
      },
      oracle = Some(s"""
        WITH yd AS ($dailyRevenueMSql),
        p AS MATERIALIZED (
          SELECT day, ROUND(CAST(ym AS DOUBLE), 9) AS yt,
                 ROUND(CAST(yl AS DOUBLE), 9) AS ylag
          FROM (SELECT day, ym, LAG(ym) OVER (ORDER BY day) AS yl
                FROM yd)
          WHERE yl IS NOT NULL),
        n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM p),
        thr AS (
          SELECT ylag AS thr FROM (
            SELECT ylag, ROW_NUMBER() OVER (ORDER BY ylag, day) AS rk, n
            FROM p CROSS JOIN n0)
          WHERE rk = (n + 1) // 2),
        tagged AS MATERIALIZED (
          SELECT p.*, CASE WHEN ylag <= thr THEN 0 ELSE 1 END AS rg
          FROM p CROSS JOIN thr),
        mom AS (
          SELECT rg, CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(ROUND(ylag, 9) AS DECIMAL(20,9))) AS sx,
                 SUM(CAST(ROUND(yt, 9) AS DECIMAL(20,9))) AS sy,
                 SUM(CAST(ROUND(ylag * yt, 9) AS DECIMAL(20,9))) AS sxy,
                 SUM(CAST(ROUND(ylag * ylag, 9) AS DECIMAL(20,9)))
                   AS sxx,
                 SUM(CAST(ROUND(yt * yt, 9) AS DECIMAL(20,9))) AS syy
          FROM tagged GROUP BY 1),
        momp AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(ROUND(ylag, 9) AS DECIMAL(20,9))) AS sx,
                 SUM(CAST(ROUND(yt, 9) AS DECIMAL(20,9))) AS sy,
                 SUM(CAST(ROUND(ylag * yt, 9) AS DECIMAL(20,9))) AS sxy,
                 SUM(CAST(ROUND(ylag * ylag, 9) AS DECIMAL(20,9)))
                   AS sxx,
                 SUM(CAST(ROUND(yt * yt, 9) AS DECIMAL(20,9))) AS syy
          FROM tagged),
        fits AS (
          SELECT rg, n, b,
                 (CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE))
                   / CAST(n AS DOUBLE) AS a,
                 CAST(syy AS DOUBLE)
                   - ((CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE))
                     / CAST(n AS DOUBLE)) * CAST(sy AS DOUBLE)
                   - b * CAST(sxy AS DOUBLE) AS sse
          FROM (
            SELECT rg, n, sx, sy, sxy, syy,
                   (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
                   (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b
            FROM mom)),
        fitp AS (
          SELECT b AS b_pool,
                 CAST(syy AS DOUBLE)
                   - ((CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE))
                     / CAST(n AS DOUBLE)) * CAST(sy AS DOUBLE)
                   - b * CAST(sxy AS DOUBLE) AS sse_pool
          FROM (
            SELECT n, sx, sy, sxy, syy,
                   (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
                   (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b
            FROM momp)),
        agg AS (
          SELECT MAX(CASE WHEN rg = 0 THEN b END) AS b_lo,
                 MAX(CASE WHEN rg = 1 THEN b END) AS b_hi,
                 CAST(SUM(sse) AS DOUBLE) AS sse_split,
                 CAST(SUM(n) AS BIGINT) AS ntot
          FROM fits)
        SELECT ntot AS n_obs,
               ROUND(thr, 6) AS threshold_m,
               ROUND(b_lo, 6) + CAST(0 AS DOUBLE) AS ar_low,
               ROUND(b_hi, 6) + CAST(0 AS DOUBLE) AS ar_high,
               ROUND(b_pool, 6) + CAST(0 AS DOUBLE) AS ar_pooled,
               ROUND((sse_pool - sse_split) / CAST(2 AS DOUBLE)
                 / (sse_split / CAST(ntot - 4 AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS f_regime
        FROM agg CROSS JOIN fitp CROSS JOIN thr""")),

    // Inverse-propensity weight diagnostics for the stratified user-
    // parity design: within activity-quintile strata, control units
    // get the ATT odds weight p̂ₛ/(1−p̂ₛ); the card reports each arm's
    // effective sample size (Σw)²/Σw², the ESS ratio, and the largest
    // normalized weight — the "is this reweighting trustworthy" gate
    // read BEFORE any IPW estimate (qfo's stratified ATE). Weights are
    // exact integer odds on the 9-grid; ESS is two divisions.
    "qiq_weight_diagnostics" -> Q(
      fn = (s, dir) => {
        val u = t(s, dir, "events")
          .groupBy("user_id").agg(count(lit(1)).as("act"))
          .select(col("user_id"), col("act"),
            (col("user_id") % 2).cast("int").as("arm"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(u,
          Seq(col("act").desc, col("user_id")), "rn")
        val n0 = ranked.agg(count(lit(1)).as("n"))
        val strat = ranked.crossJoin(broadcast(n0))
          .withColumn("base_sz", expr("n div 5"))
          .withColumn("rem", expr("n % 5"))
          .withColumn("cut", col("rem") * (col("base_sz") + 1))
          .withColumn("st", expr("CAST(CASE WHEN rn <= cut" +
            " THEN (rn - 1) div (base_sz + 1) + 1" +
            " ELSE rem + (rn - 1 - cut) div base_sz + 1 END AS INT)"))
        val ps = strat.groupBy("st")
          .agg(count(lit(1)).as("ns"),
            sum(when(col("arm") === 1, 1L).otherwise(0L)).as("nt"))
        val wts = strat.join(broadcast(ps), "st")
          .withColumn("wt", when(col("arm") === 1, lit(1.0))
            .otherwise(round(col("nt").cast("double") /
              (col("ns") - col("nt")).cast("double"), 9)))
        wts.groupBy("arm")
          .agg(count(lit(1)).as("n_units"),
            sum(g9(col("wt"))).as("sw"),
            sum(g9(round(col("wt") * col("wt"), 9))).as("sww"),
            max(col("wt")).as("wmax"))
          .select(col("arm"), col("n_units"),
            round(col("sw").cast("double"), 6).as("sum_w"),
            round(col("sw").cast("double") * col("sw").cast("double") /
              col("sww").cast("double"), 6).as("ess"),
            round(col("sw").cast("double") * col("sw").cast("double") /
              col("sww").cast("double") / col("n_units").cast("double"),
              6).as("ess_ratio"),
            round(col("wmax") / col("sw").cast("double"), 6)
              .as("max_norm_weight"))
          .orderBy("arm")
      },
      oracle = Some("""
        WITH u AS (
          SELECT user_id, CAST(COUNT(*) AS BIGINT) AS act,
                 CAST(user_id % 2 AS INT) AS arm
          FROM events GROUP BY 1),
        ranked AS (
          SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY act DESC, user_id)
                   AS BIGINT) AS rn,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM u) AS n
          FROM u),
        strat AS (
          SELECT *, CAST(CASE WHEN rn <= rem * (base_sz + 1)
                   THEN (rn - 1) // (base_sz + 1) + 1
                   ELSE rem + (rn - 1 - rem * (base_sz + 1)) // base_sz
                     + 1 END AS INT) AS st
          FROM (SELECT *, n // 5 AS base_sz, n % 5 AS rem FROM ranked)),
        ps AS (
          SELECT st, CAST(COUNT(*) AS BIGINT) AS ns,
                 CAST(SUM(CASE WHEN arm = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS nt
          FROM strat GROUP BY 1),
        wts AS (
          SELECT arm,
                 CASE WHEN arm = 1 THEN CAST(1 AS DOUBLE)
                   ELSE ROUND(CAST(nt AS DOUBLE)
                     / CAST(ns - nt AS DOUBLE), 9) END AS wt
          FROM strat JOIN ps ON strat.st = ps.st),
        agg AS (
          SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_units,
                 SUM(CAST(ROUND(wt, 9) AS DECIMAL(20,9))) AS sw,
                 SUM(CAST(ROUND(wt * wt, 9) AS DECIMAL(20,9))) AS sww,
                 MAX(wt) AS wmax
          FROM wts GROUP BY 1)
        SELECT arm, n_units,
               ROUND(CAST(sw AS DOUBLE), 6) AS sum_w,
               ROUND(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)
                 / CAST(sww AS DOUBLE), 6) AS ess,
               ROUND(CAST(sw AS DOUBLE) * CAST(sw AS DOUBLE)
                 / CAST(sww AS DOUBLE) / CAST(n_units AS DOUBLE), 6)
                 AS ess_ratio,
               ROUND(wmax / CAST(sw AS DOUBLE), 6) AS max_norm_weight
        FROM agg ORDER BY arm""")),

    // Logistic adoption-curve fit of cumulative user sign-ups: with
    // the carrying capacity pinned at K = ⌈1.05 · total users⌉ the
    // S-curve LINEARIZES — ln(c/(K−c)) is a straight line in t — so
    // the growth rate r and midpoint t₀ = −α/r come from one exact
    // OLS, no nonlinear solver (the qbz Bass model's single-parameter
    // cousin; Bass fits WHO adopts, logistic fits WHEN saturation
    // bites). ln links on exact integer ratios; 9-grid moments.
    "qir_logistic_adoption" -> Q(
      // Adoption unit: CATALOG DISCOVERY (first month each part is ever
      // ordered), not user sign-ups — the events fixture front-loads
      // every user's first activity into days 1-4 (1 point at sf0.001,
      // a degenerate OLS), while part discovery accumulates over ~80
      // months toward the catalog size at every SF.
      fn = (s, dir) => {
        val firstd = t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_partkey"))
          .agg(min(expr("year(o_orderdate) * 12 + month(o_orderdate) - 1")
            .cast("long")).as("fd"))
        val daily = firstd.groupBy(col("fd").as("day"))
          .agg(count(lit(1)).as("nu"))
        val w = Window.orderBy("day")
        val cum = daily
          .withColumn("c", sum(col("nu")).over(
            w.rowsBetween(Window.unboundedPreceding, 0)))
          .withColumn("tt",
            row_number().over(Window.orderBy("day")).cast("long"))
        val kcap = firstd.agg(
          expr("CAST(ceil(1.05 * COUNT(*)) AS BIGINT)").as("k"))
        val z = cum.crossJoin(broadcast(kcap))
          .filter(col("c") < col("k"))
          .select(col("tt"), col("k"),
            round(log(col("c").cast("double") /
              (col("k") - col("c")).cast("double")), 9).as("z"))
        val m = z.groupBy("k").agg(count(lit(1)).as("n"),
          sum(col("tt")).as("st"), sum(g9(col("z"))).as("sz"),
          sum(col("tt") * col("tt")).as("stt"),
          sum(g9(round(col("tt").cast("double") * col("z"), 9))).as("stz"))
        m.withColumn("r", (col("n").cast("double") *
            col("stz").cast("double") -
            col("st").cast("double") * col("sz").cast("double")) /
            (col("n").cast("double") * col("stt").cast("double") -
              col("st").cast("double") * col("st").cast("double")))
          .withColumn("a", (col("sz").cast("double") -
            col("r") * col("st").cast("double")) / col("n").cast("double"))
          .select(col("n").as("n_months"), col("k").as("capacity"),
            (round(col("r"), 6) + lit(0.0)).as("growth_rate"),
            (round(-col("a") / col("r"), 6) + lit(0.0))
              .as("midpoint_month"),
            (round(col("a"), 6) + lit(0.0)).as("intercept"))
      },
      oracle = Some("""
        WITH firstd AS (
          SELECT l_partkey,
                 CAST(MIN(year(o_orderdate) * 12 + month(o_orderdate)
                   - 1) AS BIGINT) AS fd
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          GROUP BY 1),
        daily AS (
          SELECT fd AS day, CAST(COUNT(*) AS BIGINT) AS nu
          FROM firstd GROUP BY 1),
        kcap AS (
          SELECT CAST(CEIL(1.05 * COUNT(*)) AS BIGINT) AS k
          FROM firstd),
        cum AS (
          SELECT day,
                 CAST(SUM(nu) OVER (ORDER BY day
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c,
                 CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS tt
          FROM daily),
        z AS (
          SELECT tt, k,
                 ROUND(ln(CAST(c AS DOUBLE) / CAST(k - c AS DOUBLE)), 9)
                   AS z
          FROM cum CROSS JOIN kcap WHERE c < k),
        m AS (
          SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(tt) AS BIGINT) AS st,
                 SUM(CAST(ROUND(z, 9) AS DECIMAL(20,9))) AS sz,
                 CAST(SUM(tt * tt) AS BIGINT) AS stt,
                 SUM(CAST(ROUND(CAST(tt AS DOUBLE) * z, 9)
                   AS DECIMAL(20,9))) AS stz
          FROM z GROUP BY 1),
        f AS (
          SELECT k, n,
                 (CAST(n AS DOUBLE) * CAST(stz AS DOUBLE)
                   - CAST(st AS DOUBLE) * CAST(sz AS DOUBLE)) /
                 (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
                   - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)) AS r,
                 CAST(st AS DOUBLE) AS std, CAST(sz AS DOUBLE) AS szd
          FROM m),
        g AS (
          SELECT k, n, r, (szd - r * std) / CAST(n AS DOUBLE) AS a
          FROM f)
        SELECT n AS n_months, k AS capacity,
               ROUND(r, 6) + CAST(0 AS DOUBLE) AS growth_rate,
               ROUND(-a / r, 6) + CAST(0 AS DOUBLE) AS midpoint_month,
               ROUND(a, 6) + CAST(0 AS DOUBLE) AS intercept
        FROM g""")),

    // Extremal index of daily purchase revenue: exceedances above the
    // empirical 90th percentile, clustered by the runs estimator
    // (a new cluster starts when the previous day was NOT an
    // exceedance) — θ̂ = clusters/exceedances ≈ 1/mean-cluster-size.
    // θ < 1 means extremes arrive in BURSTS, and every iid-based
    // return level (qb8 Gumbel, qcc GPD) overstates protection by
    // roughly 1/θ — the dependence correction the EVT family needs.
    // Exact order-statistic threshold; pure integer run counting.
    "qit_extremal_index" -> Q(
      fn = (s, dir) => {
        val x = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(expr("unix_millis(ts) div 86400000").as("day"))
          .agg(sum(col("value").cast("decimal(18,2)")).as("yv"))
          .localCheckpoint(eager = false)
        val n0 = x.agg(count(lit(1)).as("n"))
        val thr = x.crossJoin(broadcast(n0))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("yv"), col("day"))))
          .filter(col("rk") === expr("(n * 900 + 999) div 1000"))
          .select(col("yv").as("u"))
        val w = Window.orderBy("day")
        val flags = x.crossJoin(broadcast(thr))
          .withColumn("exc", when(col("yv") > col("u"), 1L).otherwise(0L))
          .withColumn("pexc", lag("exc", 1).over(w))
          .withColumn("cl_start", when(col("exc") === 1 &&
            (col("pexc").isNull || col("pexc") === 0), 1L).otherwise(0L))
        flags.crossJoin(broadcast(n0))
          .agg(max(col("n")).as("n_days"),
            round(max(col("u")).cast("double"), 6).as("threshold"),
            sum(col("exc")).as("n_exceed"),
            sum(col("cl_start")).as("n_clusters"))
          .select(col("n_days"), col("threshold"), col("n_exceed"),
            col("n_clusters"),
            round(col("n_clusters").cast("double") /
              col("n_exceed").cast("double"), 6).as("extremal_index"),
            round(col("n_exceed").cast("double") /
              col("n_clusters").cast("double"), 6).as("mean_cluster_size"))
      },
      oracle = Some("""
        WITH d0 AS (
          SELECT epoch_ms(ts) // 86400000 AS day,
                 SUM(CAST(value AS DECIMAL(18,2))) AS yv
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d0),
        thr AS (
          SELECT yv AS u FROM (
            SELECT yv, ROW_NUMBER() OVER (ORDER BY yv, day) AS rk, n
            FROM d0 CROSS JOIN n0)
          WHERE rk = (n * 900 + 999) // 1000),
        flags AS (
          SELECT day, exc,
                 LAG(exc) OVER (ORDER BY day) AS pexc
          FROM (
            SELECT day,
                   CASE WHEN yv > u THEN 1 ELSE 0 END AS exc
            FROM d0 CROSS JOIN thr)),
        agg AS (
          SELECT CAST(SUM(exc) AS BIGINT) AS n_exceed,
                 CAST(SUM(CASE WHEN exc = 1
                   AND (pexc IS NULL OR pexc = 0) THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_clusters
          FROM flags)
        SELECT n AS n_days,
               ROUND(CAST(u AS DOUBLE), 6) AS threshold,
               n_exceed, n_clusters,
               ROUND(CAST(n_clusters AS DOUBLE)
                 / CAST(n_exceed AS DOUBLE), 6) AS extremal_index,
               ROUND(CAST(n_exceed AS DOUBLE)
                 / CAST(n_clusters AS DOUBLE), 6) AS mean_cluster_size
        FROM agg CROSS JOIN thr CROSS JOIN n0""")),

    // Rosenbaum sensitivity bounds for the qid matching estimate: at
    // hidden-bias levels Γ ∈ {1, 1.5, 2}, the worst-case sign-test
    // z = (T − n·p_Γ)/√(n·p_Γ(1−p_Γ)) with p_Γ = Γ/(1+Γ) over the
    // matched pairs' post-spend signs — how much unobserved
    // confounding would it take to explain the effect away? (Γ = 1 is
    // the no-bias McNemar z.) Pure integer sign counts; the bound is
    // a closed normal approximation, no exponentials.
    "qiu_rosenbaum_bounds" -> Q(
      fn = (s, dir) => {
        val sp = t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
          .filter(col("n_regionkey") <= 1)
          .select(col("o_custkey").as("ck"),
            when(col("n_regionkey") === 0, 1).otherwise(0).as("treat"),
            when(col("o_orderdate") < lit("1996-01-01").cast("timestamp"),
              col("o_totalprice").cast("decimal(18,2)"))
              .otherwise(lit(0).cast("decimal(18,2)")).as("pre"),
            when(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"),
              col("o_totalprice").cast("decimal(18,2)"))
              .otherwise(lit(0).cast("decimal(18,2)")).as("post"))
          .groupBy("ck", "treat")
          .agg(sum(col("pre")).as("pre"), sum(col("post")).as("post"))
          .filter(col("pre") > 0)
          .localCheckpoint(eager = false)
        val wOrd = Window.orderBy(col("pre"), col("ck"))
        val marked = sp
          .withColumn("prevc", max(when(col("treat") === 0,
            struct(col("pre").as("p"), col("post").as("o"))))
            .over(wOrd.rowsBetween(Window.unboundedPreceding, -1)))
          .withColumn("nextc", min(when(col("treat") === 0,
            struct(col("pre").as("p"), col("post").as("o"))))
            .over(wOrd.rowsBetween(1, Window.unboundedFollowing)))
        val matched = marked.filter(col("treat") === 1)
          .withColumn("dprev",
            when(col("prevc").isNotNull, col("pre") - col("prevc.p")))
          .withColumn("dnext",
            when(col("nextc").isNotNull, col("nextc.p") - col("pre")))
          .withColumn("mpost",
            when(col("dprev").isNotNull &&
              (col("dnext").isNull || col("dprev") <= col("dnext")),
              col("prevc.o"))
              .otherwise(col("nextc.o")))
          .withColumn("gap",
            when(col("dprev").isNotNull &&
              (col("dnext").isNull || col("dprev") <= col("dnext")),
              col("dprev")).otherwise(col("dnext")))
          .filter(col("gap").isNotNull &&
            col("gap").cast("double") <=
              lit(0.1) * col("pre").cast("double"))
          .filter(col("post") =!= col("mpost"))
        val counts = matched.agg(count(lit(1)).as("np"),
          sum(when(col("post") > col("mpost"), 1L).otherwise(0L)).as("tp"))
        val gammas = counts.select(col("np"), col("tp"),
          explode(expr("array(CAST(1.0 AS DOUBLE)," +
            " CAST(1.5 AS DOUBLE), CAST(2.0 AS DOUBLE))")).as("gam"))
        gammas
          .withColumn("pg", col("gam") / (lit(1.0) + col("gam")))
          .select(round(col("gam"), 2).as("gamma"),
            col("np").as("n_pairs"), col("tp").as("n_positive"),
            round(col("pg"), 6).as("p_gamma"),
            (round((col("tp").cast("double") -
              col("np").cast("double") * col("pg")) /
              sqrt(col("np").cast("double") * col("pg") *
                (lit(1.0) - col("pg"))), 6) + lit(0.0)).as("z_bound"),
            when((col("tp").cast("double") -
              col("np").cast("double") * col("pg")) /
              sqrt(col("np").cast("double") * col("pg") *
                (lit(1.0) - col("pg"))) > lit(1.645), 1)
              .otherwise(0).cast("int").as("still_significant"))
          .orderBy("gamma")
      },
      oracle = Some("""
        WITH sp AS MATERIALIZED (
          SELECT o_custkey AS ck,
                 CASE WHEN n_regionkey = 0 THEN 1 ELSE 0 END AS treat,
                 SUM(CASE WHEN o_orderdate < TIMESTAMP '1996-01-01'
                   THEN CAST(o_totalprice AS DECIMAL(18,2))
                   ELSE CAST(0 AS DECIMAL(18,2)) END) AS pre,
                 SUM(CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01'
                   THEN CAST(o_totalprice AS DECIMAL(18,2))
                   ELSE CAST(0 AS DECIMAL(18,2)) END) AS post
          FROM orders JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          WHERE n_regionkey <= 1
          GROUP BY 1, 2 HAVING SUM(CASE WHEN o_orderdate
            < TIMESTAMP '1996-01-01'
            THEN CAST(o_totalprice AS DECIMAL(18,2))
            ELSE CAST(0 AS DECIMAL(18,2)) END) > 0),
        marked AS (
          SELECT *,
                 MAX(CASE WHEN treat = 0 THEN {'p': pre, 'o': post} END)
                   OVER (ORDER BY pre, ck
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                   AS prevc,
                 MIN(CASE WHEN treat = 0 THEN {'p': pre, 'o': post} END)
                   OVER (ORDER BY pre, ck
                     ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING)
                   AS nextc
          FROM sp),
        matched AS (
          SELECT * FROM (
            SELECT pre, post,
                   CASE WHEN dprev IS NOT NULL
                     AND (dnext IS NULL OR dprev <= dnext)
                     THEN prevc['o'] ELSE nextc['o'] END AS mpost,
                   CASE WHEN dprev IS NOT NULL
                     AND (dnext IS NULL OR dprev <= dnext)
                     THEN dprev ELSE dnext END AS gap
            FROM (
              SELECT pre, post, prevc, nextc,
                     CASE WHEN prevc IS NOT NULL
                       THEN pre - prevc['p'] END AS dprev,
                     CASE WHEN nextc IS NOT NULL
                       THEN nextc['p'] - pre END AS dnext
              FROM marked WHERE treat = 1))
          WHERE gap IS NOT NULL
            AND CAST(gap AS DOUBLE)
              <= CAST(0.1 AS DOUBLE) * CAST(pre AS DOUBLE)
            AND post <> mpost),
        counts AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS np,
                 CAST(SUM(CASE WHEN post > mpost THEN 1 ELSE 0 END)
                   AS BIGINT) AS tp
          FROM matched),
        gam AS (
          SELECT np, tp, gam, gam / (CAST(1 AS DOUBLE) + gam) AS pg
          FROM counts CROSS JOIN (SELECT unnest([CAST(1.0 AS DOUBLE),
            CAST(1.5 AS DOUBLE), CAST(2.0 AS DOUBLE)]) AS gam))
        SELECT ROUND(gam, 2) AS gamma, np AS n_pairs,
               tp AS n_positive,
               ROUND(pg, 6) AS p_gamma,
               ROUND((CAST(tp AS DOUBLE) - CAST(np AS DOUBLE) * pg)
                 / SQRT(CAST(np AS DOUBLE) * pg
                   * (CAST(1 AS DOUBLE) - pg)), 6) + CAST(0 AS DOUBLE)
                 AS z_bound,
               CAST(CASE WHEN (CAST(tp AS DOUBLE)
                 - CAST(np AS DOUBLE) * pg)
                 / SQRT(CAST(np AS DOUBLE) * pg
                   * (CAST(1 AS DOUBLE) - pg)) > CAST(1.645 AS DOUBLE)
                 THEN 1 ELSE 0 END AS INT) AS still_significant
        FROM gam ORDER BY gamma""")),

    // VanderWeele E-value for the urgent-vs-other conversion risk
    // ratio: the minimum confounder strength (on the risk-ratio
    // scale, with BOTH exposure and outcome) that could explain the
    // observed association away — E = RR + √(RR(RR−1)) — plus the
    // E-value of the CI bound nearer the null. The one-line
    // sensitivity answer to "but maybe it's confounded". Integer
    // rates; sqrt links only.
    "qiv_e_value" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem").groupBy(col("l_orderkey"))
          .agg(max(when(col("l_returnflag") === "R", 1L).otherwise(0L))
            .as("ret"))
        val o = t(s, dir, "orders")
          .join(li, col("o_orderkey") === col("l_orderkey"))
          .select(
            when(col("o_orderpriority") === "1-URGENT", 1).otherwise(0)
              .as("x"), col("ret"))
        val m = o.groupBy("x")
          .agg(count(lit(1)).as("n"), sum(col("ret")).as("k"))
        val rr = m.agg(
            max(when(col("x") === 1, col("n"))).as("n1"),
            max(when(col("x") === 1, col("k"))).as("k1"),
            max(when(col("x") === 0, col("n"))).as("n0"),
            max(when(col("x") === 0, col("k"))).as("k0"))
          .withColumn("p1", col("k1").cast("double") /
            col("n1").cast("double"))
          .withColumn("p0", col("k0").cast("double") /
            col("n0").cast("double"))
          .withColumn("rr0", col("p1") / col("p0"))
          // work with RR ≥ 1 (invert when protective — the E-value is
          // symmetric under inversion)
          .withColumn("rrx", when(col("rr0") >= 1, col("rr0"))
            .otherwise(lit(1.0) / col("rr0")))
          .withColumn("selog", sqrt(
            (lit(1.0) - col("p1")) / col("k1").cast("double") +
            (lit(1.0) - col("p0")) / col("k0").cast("double")))
          // CI bound nearer the null on the LOG scale: ln RR ∓ 1.96·se;
          // exp is banned, so the bound's E-value is reported on the
          // log scale too (monotone — the verdict is unchanged)
          .withColumn("lnrr", log(col("rrx")))
          .withColumn("lnlo", col("lnrr") - lit(1.96) * col("selog"))
        rr.select(col("n1"), col("n0"),
            round(col("p1"), 6).as("rate_exposed"),
            round(col("p0"), 6).as("rate_unexposed"),
            round(col("rrx"), 6).as("risk_ratio"),
            round(col("rrx") + sqrt(col("rrx") *
              (col("rrx") - lit(1.0))), 6).as("e_value"),
            (round(col("lnlo"), 6) + lit(0.0)).as("ln_rr_ci_lo"),
            when(col("lnlo") <= 0, 1).otherwise(0).cast("int")
              .as("ci_crosses_null"))
      },
      oracle = Some("""
        WITH li AS (
          SELECT l_orderkey,
                 CAST(MAX(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                   AS BIGINT) AS ret
          FROM lineitem GROUP BY 1),
        o AS (
          SELECT CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
                   AS x, ret
          FROM orders JOIN li ON o_orderkey = l_orderkey),
        m AS (
          SELECT x, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(ret) AS BIGINT) AS k
          FROM o GROUP BY 1),
        rr AS (
          SELECT MAX(CASE WHEN x = 1 THEN n END) AS n1,
                 MAX(CASE WHEN x = 1 THEN k END) AS k1,
                 MAX(CASE WHEN x = 0 THEN n END) AS n0,
                 MAX(CASE WHEN x = 0 THEN k END) AS k0
          FROM m),
        f AS (
          SELECT n1, n0, p1, p0,
                 CASE WHEN p1 / p0 >= 1 THEN p1 / p0
                   ELSE CAST(1 AS DOUBLE) / (p1 / p0) END AS rrx,
                 SQRT((CAST(1 AS DOUBLE) - p1) / CAST(k1 AS DOUBLE)
                   + (CAST(1 AS DOUBLE) - p0) / CAST(k0 AS DOUBLE))
                   AS selog
          FROM (
            SELECT n1, n0, k1, k0,
                   CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
                   CAST(k0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS p0
            FROM rr)),
        g AS (
          SELECT *, ln(rrx) - CAST(1.96 AS DOUBLE) * selog AS lnlo
          FROM f)
        SELECT n1, n0,
               ROUND(p1, 6) AS rate_exposed,
               ROUND(p0, 6) AS rate_unexposed,
               ROUND(rrx, 6) AS risk_ratio,
               ROUND(rrx + SQRT(rrx * (rrx - CAST(1 AS DOUBLE))), 6)
                 AS e_value,
               ROUND(lnlo, 6) + CAST(0 AS DOUBLE) AS ln_rr_ci_lo,
               CAST(CASE WHEN lnlo <= 0 THEN 1 ELSE 0 END AS INT)
                 AS ci_crosses_null
        FROM g""")),

    // Parallel-trends pretest for the qbk DiD: per-group OLS slopes of
    // monthly revenue over the PRE-period months, the slope gap, and
    // its t-stat from the two fits' residual variances — the
    // assumption audit that decides whether qbk's estimate means
    // anything (a DiD with diverging pre-trends measures the
    // divergence, not the treatment). 9-grid monthly series; exact
    // DECIMAL moments; sqrt/÷ links.
    "qiw_parallel_trends" -> Q(
      fn = (s, dir) => {
        val m0 = t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
          .filter(col("n_regionkey") <= 1 &&
            col("o_orderdate") < lit("1996-01-01").cast("timestamp"))
          .select(
            when(col("n_regionkey") === 0, 1).otherwise(0).as("g"),
            expr("year(o_orderdate) * 12 + month(o_orderdate) - 1")
              .cast("long").as("m"),
            (col("o_totalprice").cast("decimal(18,2)") / lit(1000000))
              .cast("decimal(18,8)").as("v"))
          .groupBy("g", "m").agg(sum(col("v")).as("ym"))
        val idx = m0.withColumn("tt", col("m") -
            min(col("m")).over(Window.partitionBy("g")) + 1)
          .select(col("g"), col("tt").cast("long").as("tt"),
            round(col("ym").cast("double"), 9).as("y"))
        val mm = idx.groupBy("g")
          .agg(count(lit(1)).as("n"), sum(col("tt")).as("st"),
            sum(g9(col("y"))).as("sy"),
            sum(col("tt") * col("tt")).as("stt"),
            sum(g9(round(col("tt").cast("double") * col("y"), 9)))
              .as("sty"),
            sum(g9(round(col("y") * col("y"), 9))).as("syy"))
        val fits = mm
          .withColumn("nd", col("n").cast("double"))
          .withColumn("den", col("nd") * col("stt").cast("double") -
            col("st").cast("double") * col("st").cast("double"))
          .withColumn("b", (col("nd") * col("sty").cast("double") -
            col("st").cast("double") * col("sy").cast("double")) /
            col("den"))
          .withColumn("a", (col("sy").cast("double") -
            col("b") * col("st").cast("double")) / col("nd"))
          .withColumn("sse", col("syy").cast("double") -
            col("a") * col("sy").cast("double") -
            col("b") * col("sty").cast("double"))
          .withColumn("seb", sqrt(col("sse") / (col("nd") - lit(2.0)) *
            col("nd") / col("den")))
        fits.agg(
            max(when(col("g") === 1, col("b"))).as("slope_treated"),
            max(when(col("g") === 0, col("b"))).as("slope_control"),
            max(when(col("g") === 1, col("seb"))).as("se_t"),
            max(when(col("g") === 0, col("seb"))).as("se_c"),
            max(col("n")).as("n_months"))
          .select(col("n_months"),
            (round(col("slope_treated"), 6) + lit(0.0))
              .as("slope_treated"),
            (round(col("slope_control"), 6) + lit(0.0))
              .as("slope_control"),
            (round(col("slope_treated") - col("slope_control"), 6)
              + lit(0.0)).as("slope_gap"),
            (round((col("slope_treated") - col("slope_control")) /
              sqrt(col("se_t") * col("se_t") + col("se_c") * col("se_c")),
              6) + lit(0.0)).as("t_gap"),
            when(abs((col("slope_treated") - col("slope_control")) /
              sqrt(col("se_t") * col("se_t") + col("se_c") * col("se_c")))
              > lit(1.96), "trends_diverge")
              .otherwise("parallel_ok").as("verdict"))
      },
      oracle = Some("""
        WITH m0 AS (
          SELECT CASE WHEN n_regionkey = 0 THEN 1 ELSE 0 END AS g,
                 CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                   AS BIGINT) AS m,
                 SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) / 1000000
                   AS DECIMAL(18,8))) AS ym
          FROM orders JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          WHERE n_regionkey <= 1
            AND o_orderdate < TIMESTAMP '1996-01-01'
          GROUP BY 1, 2),
        idx AS (
          SELECT g, CAST(m - MIN(m) OVER (PARTITION BY g) + 1 AS BIGINT)
                   AS tt,
                 ROUND(CAST(ym AS DOUBLE), 9) AS y
          FROM m0),
        mm AS (
          SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(tt) AS BIGINT) AS st,
                 SUM(CAST(ROUND(y, 9) AS DECIMAL(20,9))) AS sy,
                 CAST(SUM(tt * tt) AS BIGINT) AS stt,
                 SUM(CAST(ROUND(CAST(tt AS DOUBLE) * y, 9)
                   AS DECIMAL(20,9))) AS sty,
                 SUM(CAST(ROUND(y * y, 9) AS DECIMAL(20,9))) AS syy
          FROM idx GROUP BY 1),
        fits AS (
          SELECT g, n, b,
                 SQRT((CAST(syy AS DOUBLE) - a * CAST(sy AS DOUBLE)
                     - b * CAST(sty AS DOUBLE))
                   / (CAST(n AS DOUBLE) - CAST(2 AS DOUBLE))
                   * CAST(n AS DOUBLE) / den) AS seb
          FROM (
            SELECT g, n, sy, sty, syy, den, b,
                   (CAST(sy AS DOUBLE) - b * CAST(st AS DOUBLE))
                     / CAST(n AS DOUBLE) AS a
            FROM (
              SELECT g, n, st, sy, sty, syy,
                     CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
                       - CAST(st AS DOUBLE) * CAST(st AS DOUBLE) AS den,
                     (CAST(n AS DOUBLE) * CAST(sty AS DOUBLE)
                       - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE)) /
                     (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
                       - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)) AS b
              FROM mm))),
        agg AS (
          SELECT MAX(CASE WHEN g = 1 THEN b END) AS bt,
                 MAX(CASE WHEN g = 0 THEN b END) AS bc,
                 MAX(CASE WHEN g = 1 THEN seb END) AS se_t,
                 MAX(CASE WHEN g = 0 THEN seb END) AS se_c,
                 MAX(n) AS n_months
          FROM fits)
        SELECT n_months,
               ROUND(bt, 6) + CAST(0 AS DOUBLE) AS slope_treated,
               ROUND(bc, 6) + CAST(0 AS DOUBLE) AS slope_control,
               ROUND(bt - bc, 6) + CAST(0 AS DOUBLE) AS slope_gap,
               ROUND((bt - bc) / SQRT(se_t * se_t + se_c * se_c), 6)
                 + CAST(0 AS DOUBLE) AS t_gap,
               CASE WHEN ABS((bt - bc)
                 / SQRT(se_t * se_t + se_c * se_c))
                 > CAST(1.96 AS DOUBLE) THEN 'trends_diverge'
                 ELSE 'parallel_ok' END AS verdict
        FROM agg""")),

    // Ranked probability score for the naive categorical forecaster
    // (last month's order-priority mix predicts this month's): RPS =
    // mean over months of Σ(cumF − cumO)² across the 5 ordered
    // priority classes, against the climatology baseline (the overall
    // mix) — the PROPER score for ordered-category forecasts that
    // plain accuracy ignores (being one class off beats being four
    // off). Shares on the 9-grid; cumulative squared gaps on the
    // 12-grid into DECIMAL sums.
    "qix_rps" -> Q(
      fn = (s, dir) => {
        val mix = t(s, dir, "orders")
          .select(expr("year(o_orderdate) * 12 + month(o_orderdate) - 1")
            .cast("long").as("m"),
            substring(col("o_orderpriority"), 1, 1).cast("int").as("pr"))
          .groupBy("m", "pr").agg(count(lit(1)).as("c"))
        val tot = mix.groupBy("m").agg(sum(col("c")).as("tm"))
        val sh = mix.join(tot, "m")
          .select(col("m"), col("pr"),
            round(col("c").cast("double") / col("tm").cast("double"), 9)
              .as("sh"))
        // dense month × class grid so absent classes carry share 0
        val months = tot.select(col("m"))
        val classes = mix.select(col("pr")).distinct()
        val dense = months.crossJoin(broadcast(classes))
          .join(sh, Seq("m", "pr"), "left")
          .select(col("m"), col("pr"),
            coalesce(col("sh"), lit(0.0)).as("sh"))
        val wC = Window.partitionBy("m").orderBy("pr")
          .rowsBetween(Window.unboundedPreceding, 0)
        val cum = dense.withColumn("cf", sum(col("sh")).over(wC))
        val paired = cum.select(col("m"), col("pr"), col("cf"))
          .join(cum.select((col("m") + 1).as("m2"), col("pr").as("pr2"),
            col("cf").as("cfp")),
            col("m") === col("m2") && col("pr") === col("pr2"))
        val clim = dense.groupBy("pr")
          .agg(round(avg(col("sh")), 9).as("csh"))
          .withColumn("ccf", sum(col("csh")).over(
            Window.orderBy("pr").rowsBetween(Window.unboundedPreceding, 0)))
        val rpsNaive = paired
          .select(col("m"),
            round((col("cf") - col("cfp")) * (col("cf") - col("cfp")), 12)
              .as("g2"))
          .groupBy("m").agg(sum(col("g2").cast("decimal(28,12)")).as("sg"))
          .agg(count(lit(1)).as("n_months"),
            round(sum(col("sg")).cast("double") /
              count(lit(1)).cast("double"), 6).as("rps_naive"))
        val rpsClim = paired.select(col("m"), col("pr"), col("cf"))
          .join(broadcast(clim.select(col("pr"), col("ccf"))), "pr")
          .select(col("m"),
            round((col("cf") - col("ccf")) * (col("cf") - col("ccf")), 12)
              .as("g2"))
          .groupBy("m").agg(sum(col("g2").cast("decimal(28,12)")).as("sg"))
          .agg(round(sum(col("sg")).cast("double") /
            count(lit(1)).cast("double"), 6).as("rps_climatology"))
        rpsNaive.crossJoin(broadcast(rpsClim))
          .select(col("n_months"), col("rps_naive"),
            col("rps_climatology"),
            (round(lit(1.0) - col("rps_naive") / col("rps_climatology"),
              6) + lit(0.0)).as("rps_skill"))
      },
      oracle = Some("""
        WITH mix AS (
          SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                   AS BIGINT) AS m,
                 CAST(substr(o_orderpriority, 1, 1) AS INT) AS pr,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM orders GROUP BY 1, 2),
        tot AS (SELECT m, CAST(SUM(c) AS BIGINT) AS tm
                FROM mix GROUP BY 1),
        sh AS (
          SELECT mix.m, pr,
                 ROUND(CAST(c AS DOUBLE) / CAST(tm AS DOUBLE), 9) AS sh
          FROM mix JOIN tot ON mix.m = tot.m),
        dense AS MATERIALIZED (
          SELECT months.m, classes.pr,
                 COALESCE(sh, CAST(0 AS DOUBLE)) AS sh
          FROM (SELECT m FROM tot) months
          CROSS JOIN (SELECT DISTINCT pr FROM mix) classes
          LEFT JOIN sh ON months.m = sh.m AND classes.pr = sh.pr),
        cum AS MATERIALIZED (
          SELECT m, pr,
                 SUM(sh) OVER (PARTITION BY m ORDER BY pr
                   ROWS UNBOUNDED PRECEDING) AS cf
          FROM dense),
        paired AS MATERIALIZED (
          SELECT a.m, a.pr, a.cf, b.cf AS cfp
          FROM cum a JOIN cum b ON a.m = b.m + 1 AND a.pr = b.pr),
        clim AS (
          SELECT pr,
                 SUM(csh) OVER (ORDER BY pr ROWS UNBOUNDED PRECEDING)
                   AS ccf
          FROM (SELECT pr, ROUND(AVG(sh), 9) AS csh
                FROM dense GROUP BY 1)),
        rn AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_months,
                 ROUND(CAST(SUM(sg) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
                   6) AS rps_naive
          FROM (
            SELECT m, SUM(CAST(ROUND((cf - cfp) * (cf - cfp), 12)
                     AS DECIMAL(28,12))) AS sg
            FROM paired GROUP BY 1)),
        rc AS (
          SELECT ROUND(CAST(SUM(sg) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
                   6) AS rps_climatology
          FROM (
            SELECT m, SUM(CAST(ROUND((cf - ccf) * (cf - ccf), 12)
                     AS DECIMAL(28,12))) AS sg
            FROM paired JOIN clim ON paired.pr = clim.pr
            GROUP BY 1))
        SELECT n_months, rps_naive, rps_climatology,
               ROUND(CAST(1 AS DOUBLE) - rps_naive / rps_climatology, 6)
                 + CAST(0 AS DOUBLE) AS rps_skill
        FROM rn CROSS JOIN rc""")),

    // Systematic PPS (probability-proportional-to-size) estimation:
    // 100 grid points walk the cumulative cent-scaled revenue line
    // from a deterministic md5 start, every hit weights its order by
    // V/(100·vᵢ), and the HT estimator projects TOTAL QUANTITY from
    // the revenue-sized sample — the audit/survey design qed's
    // Poisson sampling doesn't cover (systematic PPS has ZERO
    // variance for y ∝ size; the gap measures how far quantity is
    // from proportional). Hit counts are pure BIGINT floor arithmetic
    // (shifted positive so both engines' integer division agrees);
    // cum positions ride the range-partitioned running sum.
    "qiy_pps_systematic" -> Q(
      fn = (s, dir) => {
        val o = t(s, dir, "orders")
          .join(t(s, dir, "lineitem"), col("o_orderkey") === col("l_orderkey"))
          .groupBy(col("o_orderkey"))
          .agg(max((col("o_totalprice").cast("decimal(18,2)") * 100)
            .cast("long")).as("vc"),
            sum(col("l_quantity").cast("decimal(18,2)")).as("q"))
        val cum = graft.operators.ScaleOps.globalRunningSum(o,
            Seq(col("o_orderkey")), col("vc"), "cumv")
          .localCheckpoint(eager = false)
        val tot = cum.agg(max(col("cumv")).as("vtot"),
          sum(col("q")).as("qtot"))
        val start = tot.select(col("vtot"), col("qtot"),
          (conv(substring(md5(lit("pps-seed")), 1, 12), 16, 10)
            .cast("long") % expr("vtot div 100")).as("st"))
        val hits = cum.crossJoin(broadcast(start))
          .withColumn("fb",
            expr("((cumv - st + vtot) * 100) div vtot - 100"))
          .withColumn("fa",
            expr("((cumv - vc - st + vtot) * 100) div vtot - 100"))
          .withColumn("h", col("fb") - col("fa"))
          .filter(col("h") > 0)
        hits.agg(max(col("vtot")).as("vt"), max(col("qtot")).as("qt"),
            count(lit(1)).as("n_selected"), sum(col("h")).as("n_hits"),
            sum(g9(round(col("h").cast("double") *
              col("q").cast("double") * col("vtot").cast("double") /
              (lit(100.0) * col("vc").cast("double")), 6)))
              .as("est"))
          .select(col("n_selected"), col("n_hits"),
            round(col("qt").cast("double"), 2).as("true_total_qty"),
            round(col("est").cast("double"), 2).as("ht_total_qty"),
            (round((col("est").cast("double") -
              col("qt").cast("double")) / col("qt").cast("double"), 6)
              + lit(0.0)).as("rel_error"))
      },
      oracle = Some("""
        WITH o AS (
          SELECT o_orderkey,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                   AS BIGINT) AS vc,
                 SUM(CAST(l_quantity AS DECIMAL(18,2))) AS q
          FROM orders JOIN lineitem ON o_orderkey = l_orderkey
          GROUP BY 1, o_totalprice),
        cum AS MATERIALIZED (
          SELECT o_orderkey, vc, q,
                 CAST(SUM(vc) OVER (ORDER BY o_orderkey
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cumv
          FROM o),
        tot AS (
          SELECT MAX(cumv) AS vtot, SUM(q) AS qtot FROM cum),
        st AS (
          SELECT vtot, qtot,
                 CAST('0x' || substr(md5('pps-seed'), 1, 12) AS BIGINT)
                   % (vtot // 100) AS st
          FROM tot),
        hits AS (
          SELECT vc, q, vtot, qtot,
                 ((cumv - st + vtot) * 100) // vtot - 100
                   - (((cumv - vc - st + vtot) * 100) // vtot - 100)
                   AS h
          FROM cum CROSS JOIN st),
        sel AS (SELECT * FROM hits WHERE h > 0),
        agg AS (
          SELECT MAX(qtot) AS qt,
                 CAST(COUNT(*) AS BIGINT) AS n_selected,
                 CAST(SUM(h) AS BIGINT) AS n_hits,
                 SUM(CAST(ROUND(CAST(h AS DOUBLE) * CAST(q AS DOUBLE)
                   * CAST(vtot AS DOUBLE)
                   / (CAST(100 AS DOUBLE) * CAST(vc AS DOUBLE)), 6)
                   AS DECIMAL(20,9))) AS est
          FROM sel)
        SELECT n_selected, n_hits,
               ROUND(CAST(qt AS DOUBLE), 2) AS true_total_qty,
               ROUND(CAST(est AS DOUBLE), 2) AS ht_total_qty,
               ROUND((CAST(est AS DOUBLE) - CAST(qt AS DOUBLE))
                 / CAST(qt AS DOUBLE), 6) + CAST(0 AS DOUBLE)
                 AS rel_error
        FROM agg""")),

    // Peak prominence over the 30-day purchase-revenue series: local
    // maxima (strictly above the previous day, at least the next),
    // each peak's base = the higher of the two key saddles (the MIN
    // between the peak and the nearest strictly-higher day on each
    // side, series edge when none) — the topographic measure that
    // separates real events from ripples, which a plain local-max
    // scan (q9c's argmax) cannot. Bounded panel joins; exact DECIMAL
    // value comparisons.
    "qiz_peak_prominence" -> Q(
      fn = (s, dir) => {
        val x = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(expr("unix_millis(ts) div 86400000").as("day"))
          .agg(sum(col("value").cast("decimal(18,2)")).as("yv"))
          .select(row_number().over(Window.orderBy("day")).cast("long")
            .as("i"), col("yv"))
          .localCheckpoint(eager = false)
        val w = Window.orderBy("i")
        val peaks = x
          .withColumn("pv", lag("yv", 1).over(w))
          .withColumn("nv", lead("yv", 1).over(w))
          .filter(col("pv").isNotNull && col("yv") > col("pv") &&
            (col("nv").isNull || col("yv") >= col("nv")))
          .select(col("i").as("pi"), col("yv").as("pvv"))
          .localCheckpoint(eager = false)
        val hiL = peaks.join(x, col("i") < col("pi") &&
            col("yv") > col("pvv"), "left")
          .groupBy("pi", "pvv").agg(max(col("i")).as("lb"))
        val hiR = peaks.join(x, col("i") > col("pi") &&
            col("yv") > col("pvv"), "left")
          .groupBy("pi", "pvv").agg(min(col("i")).as("rb"))
        val based = hiL.join(hiR, Seq("pi", "pvv"))
          .join(x.select(col("i").as("li"), col("yv").as("lv")),
            col("li") < col("pi") &&
            col("li") >= coalesce(col("lb"), lit(0L)), "left")
          .groupBy("pi", "pvv", "rb").agg(min(col("lv")).as("lbase"))
        val based2 = based
          .join(x.select(col("i").as("ri"), col("yv").as("rv")),
            col("ri") > col("pi") &&
            col("ri") <= coalesce(col("rb"), lit(1000000L)), "left")
          .groupBy("pi", "pvv", "lbase").agg(min(col("rv")).as("rbase"))
        based2
          .withColumn("base", greatest(
            coalesce(col("lbase"), col("rbase")),
            coalesce(col("rbase"), col("lbase"))))
          .select(col("pi").as("t_index"),
            round(col("pvv").cast("double"), 2).as("peak_value"),
            round((col("pvv") - col("base")).cast("double"), 2)
              .as("prominence"))
          .orderBy(col("prominence").desc, col("t_index"))
      },
      oracle = Some("""
        WITH d0 AS (
          SELECT epoch_ms(ts) // 86400000 AS day,
                 SUM(CAST(value AS DECIMAL(18,2))) AS yv
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        x AS MATERIALIZED (
          SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS i,
                 yv
          FROM d0),
        peaks AS MATERIALIZED (
          SELECT i AS pi, yv AS pvv FROM (
            SELECT i, yv, LAG(yv) OVER (ORDER BY i) AS pv,
                   LEAD(yv) OVER (ORDER BY i) AS nv
            FROM x)
          WHERE pv IS NOT NULL AND yv > pv
            AND (nv IS NULL OR yv >= nv)),
        hil AS (
          SELECT pi, pvv, MAX(x.i) AS lb
          FROM peaks LEFT JOIN x ON x.i < pi AND x.yv > pvv
          GROUP BY 1, 2),
        hir AS (
          SELECT pi, pvv, MIN(x.i) AS rb
          FROM peaks LEFT JOIN x ON x.i > pi AND x.yv > pvv
          GROUP BY 1, 2),
        basedl AS (
          SELECT hil.pi, hil.pvv, rb, MIN(x.yv) AS lbase
          FROM hil JOIN hir ON hil.pi = hir.pi
          LEFT JOIN x ON x.i < hil.pi
            AND x.i >= COALESCE(lb, 0)
          GROUP BY 1, 2, 3),
        basedr AS (
          SELECT pi, pvv, lbase, MIN(x.yv) AS rbase
          FROM basedl LEFT JOIN x ON x.i > pi
            AND x.i <= COALESCE(rb, 1000000)
          GROUP BY 1, 2, 3)
        SELECT pi AS t_index,
               ROUND(CAST(pvv AS DOUBLE), 2) AS peak_value,
               ROUND(CAST(pvv - GREATEST(
                 COALESCE(lbase, rbase), COALESCE(rbase, lbase))
                 AS DOUBLE), 2) AS prominence
        FROM basedr
        ORDER BY prominence DESC, t_index""")),

    // Greedy knapsack over the brand panel: pick brands by revenue-
    // per-volume density into a 50%-of-total-volume budget, against
    // the fractional-LP bound (greedy value + the split item's
    // prorated density) — the classic budget-allocation heuristic with
    // its optimality certificate attached (the gap to the LP bound
    // bounds the regret of the integral answer). Exact DECIMAL
    // costs/values, 9-grid densities, integer-exact cut selection.
    "qj0_knapsack_greedy" -> Q(
      fn = (s, dir) => {
        val b = t(s, dir, "lineitem")
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand").as("brand"))
          .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("vol"),
            sum(col("l_extendedprice").cast("decimal(18,2)")).as("rev"))
          .localCheckpoint(eager = false)
        val budget = b.agg((sum(col("vol")) / 2).as("bud"))
        val ranked = b
          .withColumn("dens", round(col("rev").cast("double") /
            col("vol").cast("double"), 9))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("dens").desc, col("brand"))))
          .crossJoin(broadcast(budget))
          .withColumn("cumv", sum(col("vol")).over(
            Window.orderBy("rk").rowsBetween(Window.unboundedPreceding, 0)))
          .localCheckpoint(eager = false)
        val chosen = ranked.filter(col("cumv") <= col("bud"))
        val agg = chosen.agg(count(lit(1)).as("n_chosen"),
          sum(col("vol")).as("volc"), sum(col("rev")).as("valc"))
        val nextItem = ranked.filter(col("cumv") > col("bud"))
          .orderBy("rk").limit(1)
          .select(col("dens").as("next_dens"))
        agg.crossJoin(broadcast(budget)).crossJoin(broadcast(nextItem))
          .select(col("n_chosen"),
            round(col("bud").cast("double"), 2).as("budget_volume"),
            round(col("volc").cast("double"), 2).as("used_volume"),
            round(col("valc").cast("double"), 2).as("greedy_value"),
            round(col("valc").cast("double") +
              (col("bud") - col("volc")).cast("double") * col("next_dens"),
              2).as("lp_bound"),
            round(col("valc").cast("double") /
              (col("valc").cast("double") +
                (col("bud") - col("volc")).cast("double") *
                col("next_dens")), 6).as("greedy_to_bound_ratio"))
      },
      oracle = Some("""
        WITH b AS MATERIALIZED (
          SELECT p_brand AS brand,
                 SUM(CAST(l_quantity AS DECIMAL(18,2))) AS vol,
                 SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY 1),
        budget AS (SELECT SUM(vol) / 2 AS bud FROM b),
        ranked AS MATERIALIZED (
          SELECT brand, vol, rev, dens, bud,
                 SUM(vol) OVER (ORDER BY rk
                   ROWS UNBOUNDED PRECEDING) AS cumv, rk
          FROM (
            SELECT brand, vol, rev, bud,
                   ROUND(CAST(rev AS DOUBLE) / CAST(vol AS DOUBLE), 9)
                     AS dens,
                   ROW_NUMBER() OVER (ORDER BY
                     ROUND(CAST(rev AS DOUBLE) / CAST(vol AS DOUBLE), 9)
                     DESC, brand) AS rk
            FROM b CROSS JOIN budget)),
        chosen AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_chosen,
                 SUM(vol) AS volc, SUM(rev) AS valc
          FROM ranked WHERE cumv <= bud),
        nxt AS (
          SELECT dens AS next_dens FROM ranked
          WHERE cumv > bud ORDER BY rk LIMIT 1)
        SELECT n_chosen,
               ROUND(CAST(bud AS DOUBLE), 2) AS budget_volume,
               ROUND(CAST(volc AS DOUBLE), 2) AS used_volume,
               ROUND(CAST(valc AS DOUBLE), 2) AS greedy_value,
               ROUND(CAST(valc AS DOUBLE) + CAST(bud - volc AS DOUBLE)
                 * next_dens, 2) AS lp_bound,
               ROUND(CAST(valc AS DOUBLE) / (CAST(valc AS DOUBLE)
                 + CAST(bud - volc AS DOUBLE) * next_dens), 6)
                 AS greedy_to_bound_ratio
        FROM chosen CROSS JOIN budget CROSS JOIN nxt""")),

    // Inverse-MSE forecast combination: three one-step forecasters of
    // daily revenue (naive lag-1, expanding mean, seasonal-naive
    // lag-7) weighted by their FIRST-half inverse MSEs and evaluated
    // out-of-sample on the second half against each component and the
    // equal-weight ensemble — the "forecast combination puzzle" card
    // (equal weights are famously hard to beat; this measures by how
    // much, exactly). Errors snap to the 9-grid; weights are exact
    // ratios of DECIMAL MSE sums.
    "qj1_forecast_combination" -> Q(
      fn = (s, dir) => {
        val y = dailyRevenueM(s, dir)
        val w = Window.orderBy("day")
        val f = y
          .withColumn("tt", row_number().over(w).cast("long"))
          .withColumn("yd", round(col("ym").cast("double"), 9))
          .withColumn("f1", lag("ym", 1).over(w).cast("double"))
          .withColumn("f7", lag("ym", 7).over(w).cast("double"))
          .withColumn("fm", round(
            (sum(col("ym")).over(w.rowsBetween(
              Window.unboundedPreceding, -1))).cast("double") /
            (col("tt") - 1).cast("double"), 9))
          .filter(col("f1").isNotNull && col("f7").isNotNull)
          .localCheckpoint(eager = false)
        val n0 = f.agg(count(lit(1)).as("n"))
        val half = f.crossJoin(broadcast(n0))
          .withColumn("rn2", row_number().over(Window.orderBy("tt")))
          .withColumn("tr", when(col("rn2") * 2 <= col("n"), 1)
            .otherwise(0))
          .withColumn("e1", g9(round((col("yd") - col("f1")) *
            (col("yd") - col("f1")), 9)))
          .withColumn("e7", g9(round((col("yd") - col("f7")) *
            (col("yd") - col("f7")), 9)))
          .withColumn("em", g9(round((col("yd") - col("fm")) *
            (col("yd") - col("fm")), 9)))
          .localCheckpoint(eager = false)
        val wts = half.filter(col("tr") === 1)
          .agg(sum(col("e1")).as("m1"), sum(col("e7")).as("m7"),
            sum(col("em")).as("mm"))
          .select(
            round(lit(1.0) / col("m1").cast("double"), 9).as("i1"),
            round(lit(1.0) / col("m7").cast("double"), 9).as("i7"),
            round(lit(1.0) / col("mm").cast("double"), 9).as("im"))
          .select(
            round(col("i1") / (col("i1") + col("i7") + col("im")), 9)
              .as("w1"),
            round(col("i7") / (col("i1") + col("i7") + col("im")), 9)
              .as("w7"),
            round(col("im") / (col("i1") + col("i7") + col("im")), 9)
              .as("wm"))
        val test = half.filter(col("tr") === 0)
          .crossJoin(broadcast(wts))
          .withColumn("fc", round(col("w1") * col("f1") +
            col("w7") * col("f7") + col("wm") * col("fm"), 9))
          .withColumn("fe", round((col("f1") + col("f7") + col("fm")) /
            lit(3.0), 9))
          .withColumn("ec", g9(round((col("yd") - col("fc")) *
            (col("yd") - col("fc")), 9)))
          .withColumn("ee", g9(round((col("yd") - col("fe")) *
            (col("yd") - col("fe")), 9)))
        test.agg(count(lit(1)).as("n_test"),
            max(col("w1")).as("w1x"), max(col("w7")).as("w7x"),
            sum(col("e1")).as("s1"), sum(col("e7")).as("s7"),
            sum(col("em")).as("sm"), sum(col("ec")).as("sc"),
            sum(col("ee")).as("se"))
          .select(col("n_test"),
            round(col("w1x"), 6).as("weight_naive"),
            round(col("w7x"), 6).as("weight_seasonal"),
            round(col("s1").cast("double") / col("n_test").cast("double"),
              6).as("mse_naive"),
            round(col("s7").cast("double") / col("n_test").cast("double"),
              6).as("mse_seasonal"),
            round(col("sm").cast("double") / col("n_test").cast("double"),
              6).as("mse_mean"),
            round(col("sc").cast("double") / col("n_test").cast("double"),
              6).as("mse_invmse_combo"),
            round(col("se").cast("double") / col("n_test").cast("double"),
              6).as("mse_equal_combo"))
      },
      oracle = Some(s"""
        WITH yd AS ($dailyRevenueMSql),
        f AS MATERIALIZED (
          SELECT * FROM (
            SELECT day,
                   CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT)
                     AS tt,
                   ROUND(CAST(ym AS DOUBLE), 9) AS y,
                   CAST(LAG(ym, 1) OVER (ORDER BY day) AS DOUBLE) AS f1,
                   CAST(LAG(ym, 7) OVER (ORDER BY day) AS DOUBLE) AS f7,
                   ROUND(CAST(SUM(ym) OVER (ORDER BY day
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
                     AS DOUBLE)
                     / CAST(ROW_NUMBER() OVER (ORDER BY day) - 1
                       AS DOUBLE), 9) AS fm
            FROM yd)
          WHERE f1 IS NOT NULL AND f7 IS NOT NULL),
        n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM f),
        half AS MATERIALIZED (
          SELECT *,
                 CASE WHEN CAST(ROW_NUMBER() OVER (ORDER BY tt)
                   AS BIGINT) * 2 <= n THEN 1 ELSE 0 END AS tr,
                 CAST(ROUND((y - f1) * (y - f1), 9) AS DECIMAL(20,9))
                   AS e1,
                 CAST(ROUND((y - f7) * (y - f7), 9) AS DECIMAL(20,9))
                   AS e7,
                 CAST(ROUND((y - fm) * (y - fm), 9) AS DECIMAL(20,9))
                   AS em
          FROM f CROSS JOIN n0),
        wts AS (
          SELECT ROUND(i1 / (i1 + i7 + im), 9) AS w1,
                 ROUND(i7 / (i1 + i7 + im), 9) AS w7,
                 ROUND(im / (i1 + i7 + im), 9) AS wm
          FROM (
            SELECT ROUND(CAST(1 AS DOUBLE) / CAST(SUM(e1) AS DOUBLE), 9)
                     AS i1,
                   ROUND(CAST(1 AS DOUBLE) / CAST(SUM(e7) AS DOUBLE), 9)
                     AS i7,
                   ROUND(CAST(1 AS DOUBLE) / CAST(SUM(em) AS DOUBLE), 9)
                     AS im
            FROM half WHERE tr = 1)),
        test AS (
          SELECT y, e1, e7, em, w1, w7, wm,
                 CAST(ROUND((y - fc) * (y - fc), 9) AS DECIMAL(20,9))
                   AS ec,
                 CAST(ROUND((y - fe) * (y - fe), 9) AS DECIMAL(20,9))
                   AS ee
          FROM (
            SELECT y, e1, e7, em, w1, w7, wm,
                   ROUND(w1 * f1 + w7 * f7 + wm * fm, 9) AS fc,
                   ROUND((f1 + f7 + fm) / CAST(3 AS DOUBLE), 9) AS fe
            FROM half CROSS JOIN wts
            WHERE tr = 0))
        SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
               ROUND(MAX(w1), 6) AS weight_naive,
               ROUND(MAX(w7), 6) AS weight_seasonal,
               ROUND(CAST(SUM(e1) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
                 6) AS mse_naive,
               ROUND(CAST(SUM(e7) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
                 6) AS mse_seasonal,
               ROUND(CAST(SUM(em) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
                 6) AS mse_mean,
               ROUND(CAST(SUM(ec) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
                 6) AS mse_invmse_combo,
               ROUND(CAST(SUM(ee) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
                 6) AS mse_equal_combo
        FROM test""")),

    // OTIF (on-time-in-full) service levels per order priority: on
    // time = every line ships within 7 days of the order date, in
    // full = no line returned, OTIF = both — the supply-chain
    // headline KPI that neither the ship-lag quantiles (q9e) nor the
    // return-rate views report as the composite the contract is
    // actually written against. Pure integer line predicates rolled
    // up to order level, then one ratio per priority.
    "qj2_otif" -> Q(
      fn = (s, dir) => {
        val lines = t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("o_orderkey"), col("o_orderpriority"))
          .agg(
            min(when(expr("(unix_millis(CAST(l_shipdate AS TIMESTAMP))" +
              " - unix_millis(CAST(o_orderdate AS TIMESTAMP)))" +
              " div 86400000") <= 7, 1L).otherwise(0L)).as("on_time"),
            min(when(col("l_returnflag") =!= "R", 1L).otherwise(0L))
              .as("in_full"))
        lines.groupBy(col("o_orderpriority").as("priority"))
          .agg(count(lit(1)).as("n_orders"),
            sum(col("on_time")).as("n_on_time"),
            sum(col("in_full")).as("n_in_full"),
            sum(col("on_time") * col("in_full")).as("n_otif"))
          .select(col("priority"), col("n_orders"),
            round(col("n_on_time").cast("double") /
              col("n_orders").cast("double"), 6).as("on_time_rate"),
            round(col("n_in_full").cast("double") /
              col("n_orders").cast("double"), 6).as("in_full_rate"),
            round(col("n_otif").cast("double") /
              col("n_orders").cast("double"), 6).as("otif_rate"))
          .orderBy("priority")
      },
      oracle = Some("""
        WITH lines AS (
          SELECT o_orderkey, o_orderpriority,
                 CAST(MIN(CASE WHEN (epoch_ms(l_shipdate)
                   - epoch_ms(o_orderdate)) // 86400000 <= 7
                   THEN 1 ELSE 0 END) AS BIGINT) AS on_time,
                 CAST(MIN(CASE WHEN l_returnflag <> 'R'
                   THEN 1 ELSE 0 END) AS BIGINT) AS in_full
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          GROUP BY 1, 2)
        SELECT o_orderpriority AS priority,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               ROUND(CAST(SUM(on_time) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS on_time_rate,
               ROUND(CAST(SUM(in_full) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS in_full_rate,
               ROUND(CAST(SUM(on_time * in_full) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS otif_rate
        FROM lines GROUP BY 1 ORDER BY 1""")),

    // Win-back targeting by log alive-score: the Schmittlein-style
    // heuristic ln P(alive) = x·ln(t_x/T) (x orders, last order at
    // t_x of an observation span T — frequent buyers who stopped
    // abruptly score most-dead) — reported in LOG form (exp is
    // rule-14-banned; the ranking is monotone anyway), crossed with
    // spend to surface the top-20 highest-value most-likely-churned
    // customers: the CRM kill list. ln link on exact day ratios;
    // integer × 9-grid products.
    "qj3_alive_score" -> Q(
      fn = (s, dir) => {
        val o = t(s, dir, "orders")
          .select(col("o_custkey").as("ck"),
            expr("unix_millis(CAST(o_orderdate AS TIMESTAMP))" +
              " div 86400000").as("d"),
            col("o_totalprice").cast("decimal(18,2)").as("v"))
        val span = o.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
        val cust = o.crossJoin(broadcast(span))
          .groupBy("ck", "d0", "d1")
          .agg(count(lit(1)).as("x"), max(col("d")).as("dx"),
            sum(col("v")).as("spend"))
          .filter(col("dx") > col("d0")) // t_x = 0 would send ln to −∞
          .withColumn("lnr", round(log(
            (col("dx") - col("d0")).cast("double") /
            (col("d1") - col("d0")).cast("double")), 9))
          .withColumn("ln_alive", round(col("x").cast("double") *
            col("lnr"), 9))
        graft.operators.ScaleOps.globalRowNumber(cust,
            Seq(col("ln_alive"), (-col("spend")).cast("double"), col("ck")),
            "rk")
          .filter(col("rk") <= 20)
          .select(col("rk").cast("int").as("rank"),
            col("ck").as("customer"), col("x").as("n_orders"),
            (col("dx") - col("d0")).as("last_order_day"),
            (col("d1") - col("d0")).as("span_days"),
            round(col("spend").cast("double"), 2).as("spend"),
            (round(col("ln_alive"), 6) + lit(0.0)).as("ln_alive_score"))
          .orderBy("rank")
      },
      oracle = Some("""
        WITH o AS (
          SELECT o_custkey AS ck,
                 CAST(epoch_ms(o_orderdate) // 86400000 AS BIGINT) AS d,
                 CAST(o_totalprice AS DECIMAL(18,2)) AS v
          FROM orders),
        span AS (SELECT MIN(d) AS d0, MAX(d) AS d1 FROM o),
        cust AS (
          SELECT ck, d0, d1, CAST(COUNT(*) AS BIGINT) AS x,
                 MAX(d) AS dx, SUM(v) AS spend
          FROM o CROSS JOIN span
          GROUP BY 1, 2, 3 HAVING MAX(d) > d0),
        scored AS (
          SELECT ck, x, dx - d0 AS last_order_day,
                 d1 - d0 AS span_days, spend,
                 ROUND(CAST(x AS DOUBLE)
                   * ROUND(ln(CAST(dx - d0 AS DOUBLE)
                     / CAST(d1 - d0 AS DOUBLE)), 9), 9) AS ln_alive
          FROM cust),
        ranked AS (
          SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY ln_alive,
                   -CAST(spend AS DOUBLE), ck) AS INT) AS rk
          FROM scored)
        SELECT rk AS rank, ck AS customer, x AS n_orders,
               last_order_day, span_days,
               ROUND(CAST(spend AS DOUBLE), 2) AS spend,
               ROUND(ln_alive, 6) + CAST(0 AS DOUBLE) AS ln_alive_score
        FROM ranked WHERE rk <= 20
        ORDER BY rank""")),

    // Deterministic CLV card per spend quintile: average order value ×
    // orders-per-active-year × expected remaining lifetime from the
    // tier's inactivity-based churn proxy (share of the tier silent in
    // the final quarter of the window; lifetime = 1/churn years,
    // capped at 10) — the back-of-envelope CLV every finance deck
    // starts from, with each factor exposed for audit. Exact-NTILE
    // tiers; integer counts; capped ratio links.
    "qj4_clv_card" -> Q(
      fn = (s, dir) => {
        val o = t(s, dir, "orders")
          .select(col("o_custkey").as("ck"),
            expr("unix_millis(CAST(o_orderdate AS TIMESTAMP))" +
              " div 86400000").as("d"),
            col("o_totalprice").cast("decimal(18,2)").as("v"))
        val span = o.agg(max(col("d")).as("d1"), min(col("d")).as("d0"))
        val cust = o.crossJoin(broadcast(span))
          .groupBy("ck")
          .agg(count(lit(1)).as("x"), sum(col("v")).as("spend"),
            max(col("d")).as("dx"), max(col("d1")).as("d1"),
            max(col("d0")).as("d0"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(cust,
          Seq(col("spend").desc, col("ck")), "rn")
        val n0 = ranked.agg(count(lit(1)).as("n"))
        val tiers = ranked.crossJoin(broadcast(n0))
          .withColumn("base_sz", expr("n div 5"))
          .withColumn("rem", expr("n % 5"))
          .withColumn("cut", col("rem") * (col("base_sz") + 1))
          .withColumn("tier", expr("CAST(CASE WHEN rn <= cut" +
            " THEN (rn - 1) div (base_sz + 1) + 1" +
            " ELSE rem + (rn - 1 - cut) div base_sz + 1 END AS INT)"))
        val card = tiers.groupBy("tier")
          .agg(count(lit(1)).as("n_cust"),
            sum(col("spend")).as("sv"), sum(col("x")).as("sx"),
            max(col("d1") - col("d0")).as("span_days"),
            sum(when(expr("dx < d1 - (d1 - d0) div 4"), 1L).otherwise(0L))
              .as("n_inactive"))
        card.select(col("tier"), col("n_cust"),
            round(col("sv").cast("double") / col("sx").cast("double"), 6)
              .as("aov"),
            round(col("sx").cast("double") / col("n_cust").cast("double")
              / (col("span_days").cast("double") / lit(365.0)), 6)
              .as("orders_per_year"),
            round(col("n_inactive").cast("double") /
              col("n_cust").cast("double"), 6).as("churn_proxy"),
            round(when(col("n_inactive") > 0,
              least(col("n_cust").cast("double") /
                col("n_inactive").cast("double"), lit(10.0)))
              .otherwise(lit(10.0)), 6).as("exp_lifetime_years"),
            round((col("sv").cast("double") / col("sx").cast("double")) *
              (col("sx").cast("double") / col("n_cust").cast("double") /
                (col("span_days").cast("double") / lit(365.0))) *
              when(col("n_inactive") > 0,
                least(col("n_cust").cast("double") /
                  col("n_inactive").cast("double"), lit(10.0)))
                .otherwise(lit(10.0)), 2).as("clv"))
          .orderBy("tier")
      },
      oracle = Some("""
        WITH o AS (
          SELECT o_custkey AS ck,
                 CAST(epoch_ms(o_orderdate) // 86400000 AS BIGINT) AS d,
                 CAST(o_totalprice AS DECIMAL(18,2)) AS v
          FROM orders),
        span AS (SELECT MAX(d) AS d1, MIN(d) AS d0 FROM o),
        cust AS (
          SELECT ck, CAST(COUNT(*) AS BIGINT) AS x, SUM(v) AS spend,
                 MAX(d) AS dx, MAX(d1) AS d1, MAX(d0) AS d0
          FROM o CROSS JOIN span GROUP BY 1),
        ranked AS (
          SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY spend DESC, ck)
                   AS BIGINT) AS rn,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM cust) AS n
          FROM cust),
        tiers AS (
          SELECT *, CAST(CASE WHEN rn <= rem * (base_sz + 1)
                   THEN (rn - 1) // (base_sz + 1) + 1
                   ELSE rem + (rn - 1 - rem * (base_sz + 1)) // base_sz
                     + 1 END AS INT) AS tier
          FROM (SELECT *, n // 5 AS base_sz, n % 5 AS rem FROM ranked)),
        card AS (
          SELECT tier, CAST(COUNT(*) AS BIGINT) AS n_cust,
                 SUM(spend) AS sv, CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(MAX(d1 - d0) AS BIGINT) AS span_days,
                 CAST(SUM(CASE WHEN dx < d1 - (d1 - d0) // 4
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_inactive
          FROM tiers GROUP BY 1)
        SELECT tier, n_cust,
               ROUND(CAST(sv AS DOUBLE) / CAST(sx AS DOUBLE), 6) AS aov,
               ROUND(CAST(sx AS DOUBLE) / CAST(n_cust AS DOUBLE)
                 / (CAST(span_days AS DOUBLE) / CAST(365 AS DOUBLE)), 6)
                 AS orders_per_year,
               ROUND(CAST(n_inactive AS DOUBLE)
                 / CAST(n_cust AS DOUBLE), 6) AS churn_proxy,
               ROUND(CASE WHEN n_inactive > 0
                 THEN LEAST(CAST(n_cust AS DOUBLE)
                   / CAST(n_inactive AS DOUBLE), CAST(10 AS DOUBLE))
                 ELSE CAST(10 AS DOUBLE) END, 6)
                 AS exp_lifetime_years,
               ROUND((CAST(sv AS DOUBLE) / CAST(sx AS DOUBLE))
                 * (CAST(sx AS DOUBLE) / CAST(n_cust AS DOUBLE)
                   / (CAST(span_days AS DOUBLE) / CAST(365 AS DOUBLE)))
                 * CASE WHEN n_inactive > 0
                   THEN LEAST(CAST(n_cust AS DOUBLE)
                     / CAST(n_inactive AS DOUBLE), CAST(10 AS DOUBLE))
                   ELSE CAST(10 AS DOUBLE) END, 2)
                 AS clv
        FROM card ORDER BY tier""")),

    // Standardized Pearson residuals for the region × priority
    // contingency table: rᵢⱼ = (O−E)/√(E(1−rowshare)(1−colshare)) —
    // WHICH cells drive q6s's omnibus χ², with |r| > 2 flags. The
    // post-hoc localization step without which a significant χ² is
    // unactionable. Integer table; closed-form shares; one sqrt.
    "qj5_chi2_residuals" -> Q(
      fn = (s, dir) => {
        val o = t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_regionkey").cast("long").as("rg"),
            col("o_orderpriority").as("pr"))
          .agg(count(lit(1)).as("obs"))
          .localCheckpoint(eager = false)
        val rowt = o.groupBy("rg").agg(sum(col("obs")).as("nr"))
        val colt = o.groupBy("pr").agg(sum(col("obs")).as("nc"))
        val tot = o.agg(sum(col("obs")).as("nn"))
        o.join(rowt, "rg").join(colt, "pr").crossJoin(broadcast(tot))
          .withColumn("e", col("nr").cast("double") *
            col("nc").cast("double") / col("nn").cast("double"))
          .withColumn("res", (col("obs").cast("double") - col("e")) /
            sqrt(col("e") *
              (lit(1.0) - col("nr").cast("double") /
                col("nn").cast("double")) *
              (lit(1.0) - col("nc").cast("double") /
                col("nn").cast("double"))))
          .select(col("rg").as("region"), col("pr").as("priority"),
            col("obs"), round(col("e"), 6).as("expected"),
            (round(col("res"), 6) + lit(0.0)).as("std_residual"),
            when(abs(col("res")) > 2, 1).otherwise(0).cast("int")
              .as("cell_flag"))
          .orderBy("region", "priority")
      },
      oracle = Some("""
        WITH o AS MATERIALIZED (
          SELECT CAST(n_regionkey AS BIGINT) AS rg,
                 o_orderpriority AS pr,
                 CAST(COUNT(*) AS BIGINT) AS obs
          FROM orders JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          GROUP BY 1, 2),
        rowt AS (SELECT rg, CAST(SUM(obs) AS BIGINT) AS nr
                 FROM o GROUP BY 1),
        colt AS (SELECT pr, CAST(SUM(obs) AS BIGINT) AS nc
                 FROM o GROUP BY 1),
        tot AS (SELECT CAST(SUM(obs) AS BIGINT) AS nn FROM o),
        f AS (
          SELECT o.rg, o.pr, obs,
                 CAST(nr AS DOUBLE) * CAST(nc AS DOUBLE)
                   / CAST(nn AS DOUBLE) AS e,
                 CAST(nr AS DOUBLE) / CAST(nn AS DOUBLE) AS rs,
                 CAST(nc AS DOUBLE) / CAST(nn AS DOUBLE) AS cs
          FROM o JOIN rowt ON o.rg = rowt.rg
          JOIN colt ON o.pr = colt.pr CROSS JOIN tot),
        g AS (
          SELECT rg, pr, obs, e,
                 (CAST(obs AS DOUBLE) - e)
                   / SQRT(e * (CAST(1 AS DOUBLE) - rs)
                     * (CAST(1 AS DOUBLE) - cs)) AS res
          FROM f)
        SELECT rg AS region, pr AS priority, obs,
               ROUND(e, 6) AS expected,
               ROUND(res, 6) + CAST(0 AS DOUBLE) AS std_residual,
               CAST(CASE WHEN ABS(res) > 2 THEN 1 ELSE 0 END AS INT)
                 AS cell_flag
        FROM g ORDER BY region, priority""")),

    // Replenishment regularity: customers with ≥4 orders classified by
    // the coefficient of variation of their inter-order gaps —
    // clockwork (CV < 0.5, auto-replenishment candidates), Poisson-
    // random (CV ≤ 1.5) or bursty (stock-up behavior) — the per-
    // CUSTOMER regularity read that qd6's series-level burstiness
    // aggregates away, and the segmentation subscription programs are
    // built on. Integer day gaps; exact integer moment sums per
    // customer; one CV division.
    "qj6_replenishment_regularity" -> Q(
      fn = (s, dir) => {
        val o = t(s, dir, "orders")
          .select(col("o_custkey").as("ck"),
            expr("unix_millis(CAST(o_orderdate AS TIMESTAMP))" +
              " div 86400000").as("d"),
            col("o_orderkey"))
        val wC = Window.partitionBy("ck").orderBy(col("d"), col("o_orderkey"))
        val gaps = o.withColumn("pd", lag("d", 1).over(wC))
          .filter(col("pd").isNotNull)
          .select(col("ck"), (col("d") - col("pd")).as("g"))
        val cust = gaps.groupBy("ck")
          .agg(count(lit(1)).as("ng"), sum(col("g")).as("sg"),
            sum(col("g") * col("g")).as("sgg"))
          .filter(col("ng") >= 3) // ≥4 orders = ≥3 gaps
          .withColumn("mg", round(col("sg").cast("double") /
            col("ng").cast("double"), 9))
          .withColumn("vg", (col("ng").cast("double") *
            col("sgg").cast("double") - col("sg").cast("double") *
            col("sg").cast("double")) /
            (col("ng").cast("double") * (col("ng") - 1).cast("double")))
          .withColumn("cv", round(sqrt(col("vg")) / col("mg"), 9))
          .withColumn("cls", when(col("cv") < 0.5, "regular")
            .when(col("cv") <= 1.5, "random").otherwise("bursty"))
        val tot = cust.agg(count(lit(1)).as("nc"))
        cust.groupBy("cls")
          .agg(count(lit(1)).as("n_customers"),
            sum(g9(col("mg"))).as("smg"), sum(g9(col("cv"))).as("scv"))
          .crossJoin(broadcast(tot))
          .select(col("cls").as("regularity"), col("n_customers"),
            round(col("n_customers").cast("double") /
              col("nc").cast("double"), 6).as("share"),
            round(col("smg").cast("double") /
              col("n_customers").cast("double"), 6).as("avg_gap_days"),
            round(col("scv").cast("double") /
              col("n_customers").cast("double"), 6).as("avg_cv"))
          .orderBy("regularity")
      },
      oracle = Some("""
        WITH o AS (
          SELECT o_custkey AS ck,
                 CAST(epoch_ms(o_orderdate) // 86400000 AS BIGINT) AS d,
                 o_orderkey
          FROM orders),
        gaps AS (
          SELECT ck, d - pd AS g FROM (
            SELECT ck, d, LAG(d) OVER (PARTITION BY ck
              ORDER BY d, o_orderkey) AS pd
            FROM o)
          WHERE pd IS NOT NULL),
        cust AS MATERIALIZED (
          SELECT ck, cv, mg,
                 CASE WHEN cv < CAST(0.5 AS DOUBLE) THEN 'regular'
                      WHEN cv <= CAST(1.5 AS DOUBLE) THEN 'random'
                      ELSE 'bursty' END AS cls
          FROM (
            SELECT ck, mg,
                   ROUND(SQRT(vg) / mg, 9) AS cv
            FROM (
              SELECT ck,
                     ROUND(CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE), 9)
                       AS mg,
                     (CAST(ng AS DOUBLE) * CAST(sgg AS DOUBLE)
                       - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE))
                       / (CAST(ng AS DOUBLE) * CAST(ng - 1 AS DOUBLE))
                       AS vg
              FROM (
                SELECT ck, CAST(COUNT(*) AS BIGINT) AS ng,
                       CAST(SUM(g) AS BIGINT) AS sg,
                       CAST(SUM(g * g) AS BIGINT) AS sgg
                FROM gaps GROUP BY 1)
              WHERE ng >= 3))),
        tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS nc FROM cust)
        SELECT cls AS regularity,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(nc AS DOUBLE), 6)
                 AS share,
               ROUND(CAST(SUM(CAST(ROUND(mg, 9) AS DECIMAL(20,9)))
                 AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
                 AS avg_gap_days,
               ROUND(CAST(SUM(CAST(ROUND(cv, 9) AS DECIMAL(20,9)))
                 AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS avg_cv
        FROM cust CROSS JOIN tot
        GROUP BY cls, nc ORDER BY regularity""")),

    // Three-step Markov reward per starting event type: V₃(s) =
    // (P·r + P²·r + P³·r)(s) with transition rates over the full
    // 5-state chain and per-state average event value as the arrival
    // reward — "what is a user in state s worth over their next three
    // events", the MDP-flavored composite of qf5's stationary mix and
    // q6b's raw transitions. Three unrolled matrix-vector rounds on
    // the q4b 9-grid; 12-grid rates.
    "qj7_markov_reward" -> Q(
      fn = (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("user_id"), unix_millis(col("ts")).as("ms"),
            col("event_id"), col("event_type").as("st"),
            coalesce(col("value"), lit(0.0)).as("v"))
        val wU = Window.partitionBy("user_id")
          .orderBy(col("ms"), col("event_id"))
        val tr = e.withColumn("nxt", lead("st", 1).over(wU))
          .filter(col("nxt").isNotNull)
        val tot = tr.groupBy("st").agg(count(lit(1)).as("ntot"))
        val p = tr.groupBy("st", "nxt").agg(count(lit(1)).as("n"))
          .join(tot, "st")
          .select(col("st"), col("nxt"),
            round(col("n").cast("double") / col("ntot").cast("double"), 12)
              .as("p"))
          .localCheckpoint(eager = false)
        val r = e.groupBy(col("st").as("rs"))
          .agg(round(sum(col("v").cast("decimal(18,2)")).cast("double") /
            count(lit(1)).cast("double"), 9).as("rv"))
          .localCheckpoint(eager = false)
        def step(v: DataFrame): DataFrame = p
          .join(v.select(col("rs").as("nxt2"), col("rv").as("vv")),
            col("nxt") === col("nxt2"))
          .groupBy(col("st").as("rs"))
          .agg(round(sum(round(col("p") * col("vv"), 12)
            .cast("decimal(28,12)")).cast("double"), 9).as("rv"))
        val w1 = step(r).localCheckpoint(eager = false)
        val w2 = step(w1).localCheckpoint(eager = false)
        val w3 = step(w2)
        w1.select(col("rs"), col("rv").as("v1"))
          .join(w2.select(col("rs").as("r2"), col("rv").as("v2")),
            col("rs") === col("r2"))
          .join(w3.select(col("rs").as("r3"), col("rv").as("v3")),
            col("rs") === col("r3"))
          .select(col("rs").as("state"),
            round(col("v1"), 6).as("exp_value_1step"),
            round(col("v1") + col("v2") + col("v3"), 6)
              .as("exp_value_3steps"))
          .orderBy("state")
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id, epoch_ms(ts) AS ms, event_id,
                 event_type AS st,
                 COALESCE(value, CAST(0 AS DOUBLE)) AS v
          FROM events),
        tr AS (
          SELECT st, nxt FROM (
            SELECT st, LEAD(st) OVER (PARTITION BY user_id
              ORDER BY ms, event_id) AS nxt
            FROM e)
          WHERE nxt IS NOT NULL),
        tot AS (SELECT st, CAST(COUNT(*) AS BIGINT) AS ntot
                FROM tr GROUP BY 1),
        p AS MATERIALIZED (
          SELECT c.st, c.nxt,
                 ROUND(CAST(c.n AS DOUBLE) / CAST(ntot AS DOUBLE), 12)
                   AS p
          FROM (SELECT st, nxt, CAST(COUNT(*) AS BIGINT) AS n
                FROM tr GROUP BY 1, 2) c
          JOIN tot ON tot.st = c.st),
        r AS MATERIALIZED (
          SELECT st AS rs,
                 ROUND(CAST(SUM(CAST(v AS DECIMAL(18,2))) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE), 9) AS rv
          FROM e GROUP BY 1),
        w1 AS MATERIALIZED (
          SELECT p.st AS rs,
                 ROUND(CAST(SUM(CAST(ROUND(p * rv, 12)
                   AS DECIMAL(28,12))) AS DOUBLE), 9) AS rv
          FROM p JOIN r ON p.nxt = r.rs GROUP BY 1),
        w2 AS MATERIALIZED (
          SELECT p.st AS rs,
                 ROUND(CAST(SUM(CAST(ROUND(p * w1.rv, 12)
                   AS DECIMAL(28,12))) AS DOUBLE), 9) AS rv
          FROM p JOIN w1 ON p.nxt = w1.rs GROUP BY 1),
        w3 AS (
          SELECT p.st AS rs,
                 ROUND(CAST(SUM(CAST(ROUND(p * w2.rv, 12)
                   AS DECIMAL(28,12))) AS DOUBLE), 9) AS rv
          FROM p JOIN w2 ON p.nxt = w2.rs GROUP BY 1)
        SELECT w1.rs AS state,
               ROUND(w1.rv, 6) AS exp_value_1step,
               ROUND(w1.rv + w2.rv + w3.rv, 6) AS exp_value_3steps
        FROM w1 JOIN w2 ON w1.rs = w2.rs JOIN w3 ON w1.rs = w3.rs
        ORDER BY state""")),

    // Expected steps to absorption from each transient journey state:
    // t = (I − Q)⁻¹·1, the fundamental-matrix row sums through the
    // same exact Cramer solve as qah's absorption probabilities —
    // "how many more events until this user converts or errors out",
    // the TIME companion to qah's WHERE. Identical 12-grid rate
    // contract; the oracle replays the 3×3 solve with the ones RHS.
    "qj8_absorption_time" -> Q(
      fn = (s, dir) =>
        graft.operators.AbsorbingChain.expectedSteps(
            t(s, dir, "events").withColumn("ts_ms", unix_millis(col("ts"))),
            "user_id", "ts_ms", "event_id", "event_type",
            transient = Seq("click", "signup", "view"),
            absorbing = Seq("purchase", "error"))
          .orderBy(col("state")),
      oracle = Some {
        val transient = Seq("click", "signup", "view")
        val cells = (for {
          (fi, i) <- transient.zipWithIndex
          (tj, j) <- transient.zipWithIndex
        } yield
          s"COALESCE(MAX(CASE WHEN st = '$fi' AND nxt = '$tj' THEN p END), " +
            s"CAST(0 AS DOUBLE)) AS q${i + 1}${j + 1}")
          .mkString(",\n                 ")
        s"""
        WITH e AS (
          SELECT event_type AS st,
                 lead(event_type) OVER (PARTITION BY user_id
                   ORDER BY epoch_ms(ts), event_id) AS nxt
          FROM events),
        tr AS (
          SELECT st, nxt FROM e
          WHERE nxt IS NOT NULL AND st IN ('click', 'signup', 'view')),
        tot AS (SELECT st, CAST(COUNT(*) AS BIGINT) AS ntot
                FROM tr GROUP BY 1),
        rates AS (
          SELECT c.st, c.nxt,
                 ROUND(CAST(c.n AS DOUBLE) / CAST(tot.ntot AS DOUBLE), 12)
                   AS p
          FROM (SELECT st, nxt, CAST(COUNT(*) AS BIGINT) AS n
                FROM tr GROUP BY 1, 2) c
          JOIN tot ON tot.st = c.st),
        cells AS (
          SELECT $cells
          FROM rates),
        m AS (
          SELECT *,
                 CAST(1 AS DOUBLE) - q11 AS m11,
                 CAST(0 AS DOUBLE) - q12 AS m12,
                 CAST(0 AS DOUBLE) - q13 AS m13,
                 CAST(0 AS DOUBLE) - q21 AS m21,
                 CAST(1 AS DOUBLE) - q22 AS m22,
                 CAST(0 AS DOUBLE) - q23 AS m23,
                 CAST(0 AS DOUBLE) - q31 AS m31,
                 CAST(0 AS DOUBLE) - q32 AS m32,
                 CAST(1 AS DOUBLE) - q33 AS m33,
                 CAST(1 AS DOUBLE) AS o1, CAST(1 AS DOUBLE) AS o2,
                 CAST(1 AS DOUBLE) AS o3
          FROM cells),
        d AS (
          SELECT *,
                 m11 * (m22 * m33 - m23 * m32)
                   - m12 * (m21 * m33 - m23 * m31)
                   + m13 * (m21 * m32 - m22 * m31) AS det
          FROM m),
        sv AS (
          SELECT *,
                 ROUND((o1 * (m22 * m33 - m23 * m32)
                   - m12 * (o2 * m33 - m23 * o3)
                   + m13 * (o2 * m32 - m22 * o3)) / det, 9) AS t1,
                 ROUND((m11 * (o2 * m33 - m23 * o3)
                   - o1 * (m21 * m33 - m23 * m31)
                   + m13 * (m21 * o3 - o2 * m31)) / det, 9) AS t2,
                 ROUND((m11 * (m22 * o3 - o2 * m32)
                   - m12 * (m21 * o3 - o2 * m31)
                   + o1 * (m21 * m32 - m22 * m31)) / det, 9) AS t3
          FROM d)
        SELECT 'click' AS state, ROUND(t1, 6) AS expected_steps FROM sv
        UNION ALL
        SELECT 'signup', ROUND(t2, 6) FROM sv
        UNION ALL
        SELECT 'view', ROUND(t3, 6) FROM sv
        ORDER BY state"""
      }),

    // Ratio-to-moving-average seasonal indices: daily events revenue
    // over its centered 7-day moving average (full windows only),
    // ratios averaged per weekday and normalized to mean 1 — the
    // classical MULTIPLICATIVE seasonal-index construction (census
    // method I), the ratio twin of qaw's additive day-of-week indices.
    // A Tuesday index of 1.12 reads directly as "+12%". CMA and
    // ratios on the 9-grid; index normalization is one exact mean.
    "qj9_ratio_to_ma" -> Q(
      fn = (s, dir) => {
        val d = t(s, dir, "events")
          .groupBy(expr("unix_millis(ts) div 86400000").as("day"))
          .agg(sum(coalesce(col("value"), lit(0.0))
            .cast("decimal(18,2)")).as("yv"))
        val w = Window.orderBy("day").rowsBetween(-3, 3)
        val cma = d
          .withColumn("nw", count(lit(1)).over(w))
          .withColumn("sw", sum(col("yv")).over(w))
          .filter(col("nw") === 7)
          .withColumn("cma", round(col("sw").cast("double") / lit(7.0), 9))
          .withColumn("ratio", round(col("yv").cast("double") /
            col("cma"), 9))
          .withColumn("dow", ((col("day") + 4) % 7).cast("int"))
        val per = cma.groupBy("dow")
          .agg(count(lit(1)).as("n_days"),
            round(sum(g9(col("ratio"))).cast("double") /
              count(lit(1)).cast("double"), 9).as("raw_idx"))
        val norm = per.agg(round(sum(g9(col("raw_idx"))).cast("double") /
          count(lit(1)).cast("double"), 9).as("mean_idx"))
        per.crossJoin(broadcast(norm))
          .select(col("dow").as("day_of_week"), col("n_days"),
            round(col("raw_idx"), 6).as("raw_ratio"),
            round(col("raw_idx") / col("mean_idx"), 6)
              .as("seasonal_index"))
          .orderBy("day_of_week")
      },
      oracle = Some("""
        WITH d AS (
          SELECT epoch_ms(ts) // 86400000 AS day,
                 SUM(CAST(COALESCE(value, CAST(0 AS DOUBLE))
                   AS DECIMAL(18,2))) AS yv
          FROM events GROUP BY 1),
        cma AS (
          SELECT day, yv,
                 COUNT(*) OVER (ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS nw,
                 SUM(yv) OVER (ORDER BY day
                   ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS sw
          FROM d),
        rat AS (
          SELECT CAST((day + 4) % 7 AS INT) AS dow,
                 ROUND(CAST(yv AS DOUBLE) /
                   ROUND(CAST(sw AS DOUBLE) / CAST(7 AS DOUBLE), 9), 9)
                   AS ratio
          FROM cma WHERE nw = 7),
        per AS (
          SELECT dow, CAST(COUNT(*) AS BIGINT) AS n_days,
                 ROUND(CAST(SUM(CAST(ROUND(ratio, 9) AS DECIMAL(20,9)))
                   AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9) AS raw_idx
          FROM rat GROUP BY 1),
        norm AS (
          SELECT ROUND(CAST(SUM(CAST(ROUND(raw_idx, 9)
                   AS DECIMAL(20,9))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 9) AS mean_idx
          FROM per)
        SELECT dow AS day_of_week, n_days,
               ROUND(raw_idx, 6) AS raw_ratio,
               ROUND(raw_idx / mean_idx, 6) AS seasonal_index
        FROM per CROSS JOIN norm
        ORDER BY day_of_week""")),

    // Decision-curve analysis for "activity predicts purchase": net
    // benefit NB(p_t) = TP/n − FP/n · p_t/(1−p_t) at per-mille
    // thresholds, against the treat-ALL and treat-NONE policies — the
    // model-evaluation view that prices FALSE POSITIVES by the
    // threshold odds (an AUC of 0.8 can still be clinically useless;
    // NB says WHERE the score earns its keep). Score = exact activity
    // percentile; everything integer until the odds ratio.
    "qja_decision_curve" -> Q(
      fn = (s, dir) => {
        val u = t(s, dir, "events")
          .groupBy("user_id")
          .agg(count(lit(1)).as("act"),
            max(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("y"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(u,
          Seq(col("act").desc, col("user_id")), "rn")
        val n0 = ranked.agg(count(lit(1)).as("n"), sum(col("y")).as("np"))
        val th = Seq(100, 200, 300, 400, 500)
        val cells = ranked.crossJoin(broadcast(n0))
          .select(col("rn"), col("y"), col("n"), col("np"),
            explode(expr(s"array(${th.mkString(", ")})")).as("pt"))
          // classify positive when the user's activity percentile beats
          // the threshold: rn ≤ (1000 − pt)·n/1000 — higher threshold
          // odds demand a shorter treated list
          .withColumn("pos",
            when(col("rn") * 1000 <= (lit(1000) - col("pt")) * col("n"),
              1L).otherwise(0L))
        cells.groupBy("pt")
          .agg(max(col("n")).as("n"), max(col("np")).as("np"),
            sum(col("pos") * col("y")).as("tp"),
            sum(col("pos") * (lit(1L) - col("y"))).as("fp"))
          .select(col("pt").cast("int").as("threshold_permille"),
            col("tp"), col("fp"),
            (round(col("tp").cast("double") / col("n").cast("double") -
              col("fp").cast("double") / col("n").cast("double") *
              (col("pt").cast("double") /
                (lit(1000.0) - col("pt").cast("double"))), 6) + lit(0.0))
              .as("net_benefit"),
            (round(col("np").cast("double") / col("n").cast("double") -
              (lit(1.0) - col("np").cast("double") /
                col("n").cast("double")) *
              (col("pt").cast("double") /
                (lit(1000.0) - col("pt").cast("double"))), 6) + lit(0.0))
              .as("nb_treat_all"))
          .orderBy("threshold_permille")
      },
      oracle = Some({
        val th = Seq(100, 200, 300, 400, 500)
        s"""
        WITH u AS (
          SELECT user_id, CAST(COUNT(*) AS BIGINT) AS act,
                 CAST(MAX(CASE WHEN event_type = 'purchase'
                   THEN 1 ELSE 0 END) AS BIGINT) AS y
          FROM events GROUP BY 1),
        ranked AS (
          SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY act DESC, user_id)
                   AS BIGINT) AS rn,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM u) AS n,
                 (SELECT CAST(SUM(y) AS BIGINT) FROM u) AS np
          FROM u),
        cells AS (
          SELECT pt, n, np,
                 CASE WHEN rn * 1000 <= (1000 - pt) * n THEN 1 ELSE 0
                   END AS pos, y
          FROM ranked CROSS JOIN
            (SELECT unnest([${th.mkString(", ")}]) AS pt)),
        agg AS (
          SELECT pt, MAX(n) AS n, MAX(np) AS np,
                 CAST(SUM(pos * y) AS BIGINT) AS tp,
                 CAST(SUM(pos * (1 - y)) AS BIGINT) AS fp
          FROM cells GROUP BY 1)
        SELECT CAST(pt AS INT) AS threshold_permille, tp, fp,
               ROUND(CAST(tp AS DOUBLE) / CAST(n AS DOUBLE)
                 - CAST(fp AS DOUBLE) / CAST(n AS DOUBLE)
                 * (CAST(pt AS DOUBLE)
                   / (CAST(1000 AS DOUBLE) - CAST(pt AS DOUBLE))), 6)
                 + CAST(0 AS DOUBLE) AS net_benefit,
               ROUND(CAST(np AS DOUBLE) / CAST(n AS DOUBLE)
                 - (CAST(1 AS DOUBLE) - CAST(np AS DOUBLE)
                   / CAST(n AS DOUBLE))
                 * (CAST(pt AS DOUBLE)
                   / (CAST(1000 AS DOUBLE) - CAST(pt AS DOUBLE))), 6)
                 + CAST(0 AS DOUBLE) AS nb_treat_all
        FROM agg ORDER BY threshold_permille"""
      })),

    // Mean-reversion half-life of daily revenue: AR(1) on deviations
    // from the series mean, half-life = ln(½)/ln(φ) days — "how long
    // until half of a shock has decayed", the number a raw φ = 0.8
    // never communicates (3.1 days) — with the stationarity verdict.
    // ln links only (ln(½) is the same shared literal as qhe's);
    // 9-grid deviation moments.
    "qjb_ar_half_life" -> Q(
      fn = (s, dir) => {
        val y = dailyRevenueM(s, dir)
        val mu = y.agg(count(lit(1)).as("n"), sum(col("ym")).as("sy"))
          .select(round(col("sy").cast("double") / col("n").cast("double"),
            9).as("mu"))
        val w = Window.orderBy("day")
        val dev = y.crossJoin(broadcast(mu))
          .select(col("day"),
            round(col("ym").cast("double") - col("mu"), 9).as("z"))
          .withColumn("zp", lag("z", 1).over(w))
          .filter(col("zp").isNotNull)
        val m = dev.agg(count(lit(1)).as("n"),
          sum(g9(round(col("z") * col("zp"), 9))).as("szp"),
          sum(g9(round(col("zp") * col("zp"), 9))).as("spp"))
        m.withColumn("phi", col("szp").cast("double") /
            col("spp").cast("double"))
          .select(col("n").as("n_obs"),
            (round(col("phi"), 6) + lit(0.0)).as("phi"),
            when(col("phi") > 0 && col("phi") < 1,
              round(lit(-0.693147180559945) / log(col("phi")), 6))
              .as("half_life_days"),
            when(col("phi") >= 1, "non_stationary")
              .when(col("phi") <= 0, "oscillatory_or_white")
              .otherwise("mean_reverting").as("verdict"))
      },
      oracle = Some(s"""
        WITH yd AS ($dailyRevenueMSql),
        mu AS (
          SELECT ROUND(CAST(SUM(ym) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
                   9) AS mu
          FROM yd),
        dev AS (
          SELECT z, LAG(z) OVER (ORDER BY day) AS zp
          FROM (SELECT day, ROUND(CAST(ym AS DOUBLE) - mu, 9) AS z
                FROM yd CROSS JOIN mu)),
        m AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(ROUND(z * zp, 9) AS DECIMAL(20,9))) AS szp,
                 SUM(CAST(ROUND(zp * zp, 9) AS DECIMAL(20,9))) AS spp
          FROM dev WHERE zp IS NOT NULL),
        f AS (
          SELECT n, CAST(szp AS DOUBLE) / CAST(spp AS DOUBLE) AS phi
          FROM m)
        SELECT n AS n_obs,
               ROUND(phi, 6) + CAST(0 AS DOUBLE) AS phi,
               CASE WHEN phi > 0 AND phi < 1 THEN
                 ROUND(CAST(-0.693147180559945 AS DOUBLE) / ln(phi), 6)
               END AS half_life_days,
               CASE WHEN phi >= 1 THEN 'non_stationary'
                    WHEN phi <= 0 THEN 'oscillatory_or_white'
                    ELSE 'mean_reverting' END AS verdict
        FROM f""")),

    // l-diversity and t-closeness over the q7s quasi-identifier
    // classes: per (event_type, hour, value-band) equivalence class,
    // the count of DISTINCT sensitive values (user activity tier) and
    // the total-variation distance of the class's tier mix from the
    // global mix — k-anonymity (q7s) stops re-identification, but a
    // k-large class whose members ALL share one sensitive value still
    // leaks it (the homogeneity attack l-diversity counts, the
    // skew t-closeness prices). Integer tiers and counts; exact
    // share differences.
    "qjc_l_diversity" -> Q(
      fn = (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            (expr("unix_millis(ts) div 3600000") % 24).cast("int")
              .as("hod"),
            coalesce(floor(col("value") / lit(100.0)).cast("long"),
              lit(-1L)).as("vband"))
        val tier = t(s, dir, "events")
          .groupBy("user_id").agg(count(lit(1)).as("act"))
          .select(col("user_id").as("u2"),
            when(col("act") >= 40, 2).when(col("act") >= 20, 1)
              .otherwise(0).as("tier"))
        val rows = e.join(tier, col("user_id") === col("u2"))
        val global = rows.groupBy("tier")
          .agg(count(lit(1)).as("gt"))
          .crossJoin(broadcast(rows.agg(count(lit(1)).as("gn"))))
          .select(col("tier"),
            round(col("gt").cast("double") / col("gn").cast("double"), 9)
              .as("gshare"))
        val cls = rows.groupBy("event_type", "hod", "vband", "tier")
          .agg(count(lit(1)).as("ct"))
        val clsTot = cls.groupBy("event_type", "hod", "vband")
          .agg(sum(col("ct")).as("cn"),
            countDistinct(col("tier")).as("l_div"))
        // dense class × GLOBAL-tier grid (the oracle's cross join): a
        // class missing a tier must still pay |0 − gshare| for it
        val tv = clsTot.crossJoin(broadcast(global))
          .join(cls, Seq("event_type", "hod", "vband", "tier"), "left")
          .select(col("event_type"), col("hod"), col("vband"), col("cn"),
            col("l_div"),
            abs(coalesce(round(col("ct").cast("double") /
              col("cn").cast("double"), 9), lit(0.0)) - col("gshare"))
              .as("ad"))
          .groupBy("event_type", "hod", "vband", "cn", "l_div")
          .agg(round(sum(g9(col("ad"))).cast("double") / lit(2.0), 6)
            .as("t_closeness"))
        val agg = tv.agg(count(lit(1)).as("n_classes"),
          min(col("l_div")).as("min_l"),
          sum(when(col("l_div") === 1, 1L).otherwise(0L))
            .as("n_homogeneous"),
          max(col("t_closeness")).as("max_t"),
          round(sum(g9(col("t_closeness"))).cast("double") /
            count(lit(1)).cast("double"), 6).as("avg_t"))
        agg.select(col("n_classes"), col("min_l"), col("n_homogeneous"),
          round(col("max_t"), 6).as("max_t_closeness"),
          col("avg_t").as("avg_t_closeness"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id, event_type,
                 CAST((epoch_ms(ts) // 3600000) % 24 AS INT) AS hod,
                 COALESCE(CAST(FLOOR(value / CAST(100 AS DOUBLE))
                   AS BIGINT), -1) AS vband
          FROM events),
        tier AS (
          SELECT user_id AS u2,
                 CASE WHEN act >= 40 THEN 2 WHEN act >= 20 THEN 1
                   ELSE 0 END AS tier
          FROM (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS act
                FROM events GROUP BY 1)),
        rows_t AS MATERIALIZED (
          SELECT event_type, hod, vband, tier
          FROM e JOIN tier ON user_id = u2),
        global AS (
          SELECT tier,
                 ROUND(CAST(COUNT(*) AS DOUBLE) /
                   CAST((SELECT COUNT(*) FROM rows_t) AS DOUBLE), 9)
                   AS gshare
          FROM rows_t GROUP BY 1),
        cls AS (
          SELECT event_type, hod, vband, tier,
                 CAST(COUNT(*) AS BIGINT) AS ct
          FROM rows_t GROUP BY 1, 2, 3, 4),
        clstot AS (
          SELECT event_type, hod, vband, CAST(SUM(ct) AS BIGINT) AS cn,
                 CAST(COUNT(DISTINCT tier) AS BIGINT) AS l_div
          FROM cls GROUP BY 1, 2, 3),
        tv AS (
          SELECT event_type, hod, vband, cn, l_div,
                 ROUND(CAST(SUM(CAST(ROUND(ad, 9) AS DECIMAL(20,9)))
                   AS DOUBLE) / CAST(2 AS DOUBLE), 6) AS t_closeness
          FROM (
            SELECT ct.event_type, ct.hod, ct.vband, ct.cn, ct.l_div,
                   ABS(COALESCE(ROUND(CAST(cls.ct AS DOUBLE)
                     / CAST(ct.cn AS DOUBLE), 9), CAST(0 AS DOUBLE))
                     - gshare) AS ad
            FROM clstot ct
            CROSS JOIN global g
            LEFT JOIN cls ON cls.event_type = ct.event_type
              AND cls.hod = ct.hod AND cls.vband = ct.vband
              AND cls.tier = g.tier)
          GROUP BY 1, 2, 3, 4, 5)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_classes,
               MIN(l_div) AS min_l,
               CAST(SUM(CASE WHEN l_div = 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_homogeneous,
               ROUND(MAX(t_closeness), 6) AS max_t_closeness,
               ROUND(CAST(SUM(CAST(ROUND(t_closeness, 9)
                 AS DECIMAL(20,9))) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
                 6) AS avg_t_closeness
        FROM tv""")),

    // Dixon's Q test on the 25-nation revenue panel: Q = (suspect −
    // nearest neighbor) / range for the largest AND smallest values
    // against the n=25 critical value 0.29 — the SMALL-SAMPLE outlier
    // test (Grubbs qdg needs near-normality and more data; Dixon was
    // built for exactly this panel size). Exact order statistics via
    // rank picks; two ratios.
    "qjd_dixon_q" -> Q(
      fn = (s, dir) => {
        val g = t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_nationkey").cast("long").as("nk"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
        val ranked = g
          .withColumn("rk", row_number().over(
            Window.orderBy(col("rev"), col("nk"))))
          .crossJoin(broadcast(g.agg(count(lit(1)).as("n"))))
        val picks = ranked.agg(
          max(when(col("rk") === 1, col("rev"))).as("x1"),
          max(when(col("rk") === 2, col("rev"))).as("x2"),
          max(when(col("rk") === col("n") - 1, col("rev"))).as("xn1"),
          max(when(col("rk") === col("n"), col("rev"))).as("xn"),
          max(col("n")).as("n"))
        picks.select(col("n").as("n_nations"),
            round((col("xn") - col("xn1")).cast("double") /
              (col("xn") - col("x1")).cast("double"), 6).as("q_high"),
            round((col("x2") - col("x1")).cast("double") /
              (col("xn") - col("x1")).cast("double"), 6).as("q_low"),
            when((col("xn") - col("xn1")).cast("double") /
              (col("xn") - col("x1")).cast("double") > lit(0.29), 1)
              .otherwise(0).cast("int").as("high_outlier_flag"),
            when((col("x2") - col("x1")).cast("double") /
              (col("xn") - col("x1")).cast("double") > lit(0.29), 1)
              .otherwise(0).cast("int").as("low_outlier_flag"))
      },
      oracle = Some("""
        WITH g AS (
          SELECT CAST(c_nationkey AS BIGINT) AS nk,
                 SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY 1),
        ranked AS (
          SELECT rev, ROW_NUMBER() OVER (ORDER BY rev, nk) AS rk,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM g) AS n
          FROM g),
        picks AS (
          SELECT MAX(CASE WHEN rk = 1 THEN rev END) AS x1,
                 MAX(CASE WHEN rk = 2 THEN rev END) AS x2,
                 MAX(CASE WHEN rk = n - 1 THEN rev END) AS xn1,
                 MAX(CASE WHEN rk = n THEN rev END) AS xn,
                 MAX(n) AS n
          FROM ranked)
        SELECT n AS n_nations,
               ROUND(CAST(xn - xn1 AS DOUBLE) / CAST(xn - x1 AS DOUBLE),
                 6) AS q_high,
               ROUND(CAST(x2 - x1 AS DOUBLE) / CAST(xn - x1 AS DOUBLE),
                 6) AS q_low,
               CAST(CASE WHEN CAST(xn - xn1 AS DOUBLE)
                 / CAST(xn - x1 AS DOUBLE) > CAST(0.29 AS DOUBLE)
                 THEN 1 ELSE 0 END AS INT) AS high_outlier_flag,
               CAST(CASE WHEN CAST(x2 - x1 AS DOUBLE)
                 / CAST(xn - x1 AS DOUBLE) > CAST(0.29 AS DOUBLE)
                 THEN 1 ELSE 0 END AS INT) AS low_outlier_flag
        FROM picks""")),

    // Explicit GROUPING SETS surface: the ((region), (priority),
    // (region, priority), ()) lattice with grouping_id — the
    // ARBITRARY-subset member of the SQL aggregation-lattice family
    // that q11's ROLLUP (prefix chain) and q8k's CUBE (full power
    // set) bracket; real reports want exactly the sets they'll
    // render, not the power set's waste. grouping_id replays as
    // GROUPING()·2+GROUPING() per the q8k convention.
    "qje_grouping_sets" -> Q(
      fn = (s, dir) => {
        val o = t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
          .select(col("n_regionkey").cast("long").as("region"),
            col("o_orderpriority").as("priority"),
            col("o_totalprice").cast("decimal(18,2)").as("v"))
        o.createOrReplaceTempView("qje_orders")
        o.sparkSession.sql("""
          SELECT region, priority,
                 CAST(grouping_id(region, priority) AS INT) AS gid,
                 CAST(COUNT(*) AS BIGINT) AS n_orders,
                 CAST(SUM(v) AS DOUBLE) AS revenue
          FROM qje_orders
          GROUP BY GROUPING SETS ((region), (priority),
            (region, priority), ())
          ORDER BY gid, region, priority""")
      },
      oracle = Some("""
        WITH o AS (
          SELECT CAST(n_regionkey AS BIGINT) AS region,
                 o_orderpriority AS priority,
                 CAST(o_totalprice AS DECIMAL(18,2)) AS v
          FROM orders JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey)
        SELECT region, priority,
               CAST(GROUPING(region) * 2 + GROUPING(priority) AS INT)
                 AS gid,
               CAST(COUNT(*) AS BIGINT) AS n_orders,
               CAST(SUM(v) AS DOUBLE) AS revenue
        FROM o
        GROUP BY GROUPING SETS ((region), (priority),
          (region, priority), ())
        ORDER BY gid, region, priority""")),

    // Log spectral flatness (Wiener entropy) of daily purchase
    // revenue: mean(ln Pₖ) − ln(mean Pₖ) over the k = 1..14 Fourier
    // powers — 0 for white noise, increasingly negative as power
    // concentrates into few frequencies; the geometric/arithmetic
    // ratio REPORTED IN LOGS (exp is rule-14-banned; the log form is
    // the standard dB-style reading anyway). Angles reduce mod n
    // BEFORE the trig call (the qca/qcd large-arg libm lesson);
    // cos/sin terms on the 9-grid.
    "qjf_spectral_flatness" -> Q(
      fn = (s, dir) => {
        val d = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(expr("unix_millis(ts) div 86400000").as("day"))
          .agg(sum(col("value").cast("decimal(18,2)")).as("yv"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(d,
          Seq(col("day")), "rn").localCheckpoint(eager = false)
        val mu = ranked.agg(count(lit(1)).as("n"), sum(col("yv")).as("sy"))
          .select(col("n"),
            round(col("sy").cast("double") / col("n").cast("double"), 9)
              .as("mu"))
        val ks = d.sparkSession.range(1, 15).select(col("id").as("k"))
        val pows = ranked.crossJoin(broadcast(ks))
          .crossJoin(broadcast(mu))
          .withColumn("ang", lit(2.0 * math.Pi) *
            pmod(col("rn") * col("k"), col("n")).cast("double") /
            col("n").cast("double"))
          .withColumn("yc", col("yv").cast("double") - col("mu"))
          .groupBy(col("k"))
          .agg(first(col("n")).as("n"),
            sum(round(col("yc") * cos(col("ang")), 9)
              .cast("decimal(28,9)")).as("ct"),
            sum(round(col("yc") * sin(col("ang")), 9)
              .cast("decimal(28,9)")).as("st"))
          .withColumn("power", round(
            (col("ct").cast("double") * col("ct").cast("double") +
             col("st").cast("double") * col("st").cast("double")) *
            lit(2.0) / col("n").cast("double"), 9))
          .filter(col("power") > 0)
        pows.agg(count(lit(1)).as("n_freqs"),
            sum(g9(col("power"))).as("sp"),
            sum(round(log(col("power")), 12).cast("decimal(28,12)"))
              .as("slnp"))
          .select(col("n_freqs"),
            round(col("sp").cast("double") / col("n_freqs").cast("double"),
              6).as("mean_power"),
            (round(col("slnp").cast("double") /
              col("n_freqs").cast("double") -
              log(col("sp").cast("double") /
                col("n_freqs").cast("double")), 6) + lit(0.0))
              .as("log_flatness"),
            when(col("slnp").cast("double") /
              col("n_freqs").cast("double") -
              log(col("sp").cast("double") /
                col("n_freqs").cast("double")) > lit(-0.5),
              "near_white").otherwise("tonal").as("verdict"))
      },
      oracle = Some("""
        WITH d0 AS (
          SELECT epoch_ms(ts) // 86400000 AS day,
                 SUM(CAST(value AS DECIMAL(18,2))) AS yv
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        ranked AS MATERIALIZED (
          SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS rn,
                 yv
          FROM d0),
        mu AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 ROUND(CAST(SUM(yv) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
                   9) AS mu
          FROM ranked),
        pows AS (
          SELECT k, n,
                 ROUND((CAST(ct AS DOUBLE) * CAST(ct AS DOUBLE)
                   + CAST(st AS DOUBLE) * CAST(st AS DOUBLE))
                   * CAST(2 AS DOUBLE) / CAST(n AS DOUBLE), 9) AS power
          FROM (
            SELECT k, MAX(n) AS n,
                   SUM(CAST(ROUND(yc * COS(ang), 9) AS DECIMAL(28,9)))
                     AS ct,
                   SUM(CAST(ROUND(yc * SIN(ang), 9) AS DECIMAL(28,9)))
                     AS st
            FROM (
              SELECT k, n,
                     CAST(2 AS DOUBLE) * PI()
                       * CAST((rn * k) % n AS DOUBLE)
                       / CAST(n AS DOUBLE) AS ang,
                     CAST(yv AS DOUBLE) - mu AS yc
              FROM ranked
              CROSS JOIN (SELECT unnest(range(1, 15)) AS k)
              CROSS JOIN mu)
            GROUP BY 1)),
        pos AS (SELECT * FROM pows WHERE power > 0),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_freqs,
                 SUM(CAST(ROUND(power, 9) AS DECIMAL(20,9))) AS sp,
                 SUM(CAST(ROUND(ln(power), 12) AS DECIMAL(28,12)))
                   AS slnp
          FROM pos)
        SELECT n_freqs,
               ROUND(CAST(sp AS DOUBLE) / CAST(n_freqs AS DOUBLE), 6)
                 AS mean_power,
               ROUND(CAST(slnp AS DOUBLE) / CAST(n_freqs AS DOUBLE)
                 - ln(CAST(sp AS DOUBLE) / CAST(n_freqs AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS log_flatness,
               CASE WHEN CAST(slnp AS DOUBLE) / CAST(n_freqs AS DOUBLE)
                 - ln(CAST(sp AS DOUBLE) / CAST(n_freqs AS DOUBLE))
                 > CAST(-0.5 AS DOUBLE) THEN 'near_white'
                 ELSE 'tonal' END AS verdict
        FROM agg""")),

    // BCG growth–share matrix over brands: relative market share
    // (brand volume / LARGEST OTHER brand's volume — the actual BCG
    // definition, not plain share) × period-over-period volume growth
    // across the qbk cut, classified star / cash-cow / question-mark /
    // dog at the canonical 1.0 / median-growth cuts. Exact DECIMAL
    // volumes; the growth median is an exact lower-median order
    // statistic.
    "qjg_bcg_matrix" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem")
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .select(col("p_brand").as("brand"),
            when(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"),
              1).otherwise(0).as("per"),
            col("l_quantity").cast("decimal(18,2)").as("q"))
          .groupBy("brand", "per").agg(sum(col("q")).as("v"))
        val wide = li.groupBy("brand")
          .agg(max(when(col("per") === 0, col("v"))).as("v0"),
            max(when(col("per") === 1, col("v"))).as("v1"))
          .filter(col("v0").isNotNull && col("v1").isNotNull)
          .localCheckpoint(eager = false)
        val top2 = wide.select(col("brand").as("b2"), col("v1").as("vo"))
        val rel = wide.join(broadcast(top2), col("b2") =!= col("brand"))
          .groupBy("brand", "v0", "v1")
          .agg(max(col("vo")).as("vmaxother"))
          .withColumn("rms", round(col("v1").cast("double") /
            col("vmaxother").cast("double"), 9))
          .withColumn("growth", round((col("v1") - col("v0"))
            .cast("double") / col("v0").cast("double"), 9))
          .localCheckpoint(eager = false)
        val n0 = rel.agg(count(lit(1)).as("n"))
        val medg = rel.crossJoin(broadcast(n0))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("growth"), col("brand"))))
          .filter(col("rk") === expr("(n + 1) div 2"))
          .select(col("growth").as("gmed"))
        rel.crossJoin(broadcast(medg))
          .select(col("brand"),
            round(col("rms"), 6).as("relative_share"),
            (round(col("growth"), 6) + lit(0.0)).as("growth"),
            when(col("rms") >= 1.0 && col("growth") > col("gmed"), "star")
              .when(col("rms") >= 1.0, "cash_cow")
              .when(col("growth") > col("gmed"), "question_mark")
              .otherwise("dog").as("quadrant"))
          .orderBy("brand")
      },
      oracle = Some("""
        WITH li AS (
          SELECT p_brand AS brand,
                 CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01'
                   THEN 1 ELSE 0 END AS per,
                 CAST(l_quantity AS DECIMAL(18,2)) AS q
          FROM lineitem JOIN part ON l_partkey = p_partkey
          JOIN orders ON l_orderkey = o_orderkey),
        agg0 AS (
          SELECT brand, per, SUM(q) AS v FROM li GROUP BY 1, 2),
        wide AS MATERIALIZED (
          SELECT brand,
                 MAX(CASE WHEN per = 0 THEN v END) AS v0,
                 MAX(CASE WHEN per = 1 THEN v END) AS v1
          FROM agg0 GROUP BY 1
          HAVING MAX(CASE WHEN per = 0 THEN v END) IS NOT NULL
             AND MAX(CASE WHEN per = 1 THEN v END) IS NOT NULL),
        rel AS MATERIALIZED (
          SELECT a.brand, a.v0, a.v1,
                 ROUND(CAST(a.v1 AS DOUBLE) / CAST(MAX(b.v1) AS DOUBLE),
                   9) AS rms,
                 ROUND(CAST(a.v1 - a.v0 AS DOUBLE)
                   / CAST(a.v0 AS DOUBLE), 9) AS growth
          FROM wide a JOIN wide b ON b.brand <> a.brand
          GROUP BY 1, 2, 3),
        n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM rel),
        medg AS (
          SELECT growth AS gmed FROM (
            SELECT growth, ROW_NUMBER() OVER (ORDER BY growth, brand)
                   AS rk, n
            FROM rel CROSS JOIN n0)
          WHERE rk = (n + 1) // 2)
        SELECT brand,
               ROUND(rms, 6) AS relative_share,
               ROUND(growth, 6) + CAST(0 AS DOUBLE) AS growth,
               CASE WHEN rms >= 1 AND growth > gmed THEN 'star'
                    WHEN rms >= 1 THEN 'cash_cow'
                    WHEN growth > gmed THEN 'question_mark'
                    ELSE 'dog' END AS quadrant
        FROM rel CROSS JOIN medg
        ORDER BY brand""")),

    // Kraljic purchasing-portfolio matrix per part: profit impact
    // (spend) × supply risk (single- or dual-sourced — few suppliers
    // have ever shipped it), classified strategic / bottleneck /
    // leverage / routine at the exact median spend — the procurement
    // framework every sourcing review starts from, over the supplier
    // dimension this engine's other 570 queries barely touch. Integer
    // supplier counts; exact DECIMAL spend; exact median cut. Top 20
    // strategic parts by spend plus quadrant counts on every row.
    "qjh_kraljic" -> Q(
      fn = (s, dir) => {
        val p = t(s, dir, "lineitem")
          .groupBy(col("l_partkey").as("pk"))
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)"))
            .as("spend"),
            countDistinct(col("l_suppkey")).as("n_supp"))
          .localCheckpoint(eager = false)
        // rank cuts ride ScaleOps.globalRowNumber, not an unpartitioned
        // row_number() window: the part profile is dimension-sized today
        // but a single-partition sort of it is the named 100×
        // scale-killer (round-9 VERDICT task 2); same total order, so
        // the oracle is unchanged
        val n0 = p.agg(count(lit(1)).as("n"))
        val medspend = graft.operators.ScaleOps
          .globalRowNumber(p, Seq(col("spend"), col("pk")), "rk")
          .crossJoin(broadcast(n0))
          .filter(col("rk") === expr("(n + 1) div 2"))
          .select(col("spend").as("smed"))
        // supply risk is RELATIVE scarcity: every part in this fixture
        // has 8+ suppliers, so an absolute "<= 2 sources" cut is vacuous
        // at every SF — the risk axis is n_supp at or below the exact
        // median supplier count instead
        val medsupp = graft.operators.ScaleOps
          .globalRowNumber(p, Seq(col("n_supp"), col("pk")), "rk")
          .crossJoin(broadcast(n0))
          .filter(col("rk") === expr("(n + 1) div 2"))
          .select(col("n_supp").as("nmed"))
        val classed = p.crossJoin(broadcast(medspend))
          .crossJoin(broadcast(medsupp))
          .withColumn("quadrant",
            when(col("spend") > col("smed") && col("n_supp") <= col("nmed"),
              "strategic")
              .when(col("spend") > col("smed"), "leverage")
              .when(col("n_supp") <= col("nmed"), "bottleneck")
              .otherwise("routine"))
          .localCheckpoint(eager = false)
        val counts = classed.groupBy("quadrant")
          .agg(count(lit(1)).as("qn"))
          .agg(
            max(when(col("quadrant") === "strategic", col("qn")))
              .as("n_strategic"),
            max(when(col("quadrant") === "bottleneck", col("qn")))
              .as("n_bottleneck"))
        graft.operators.ScaleOps.globalRowNumber(
            classed.filter(col("quadrant") === "strategic"),
            Seq(col("spend").desc, col("pk")), "rk2")
          .crossJoin(broadcast(counts))
          .filter(col("rk2") <= 20)
          .select(col("rk2").cast("int").as("rank"),
            col("pk").as("partkey"),
            round(col("spend").cast("double"), 2).as("spend"),
            col("n_supp").as("n_suppliers"),
            coalesce(col("n_strategic"), lit(0L)).as("n_strategic"),
            coalesce(col("n_bottleneck"), lit(0L)).as("n_bottleneck"))
          .orderBy("rank")
      },
      oracle = Some("""
        WITH p AS MATERIALIZED (
          SELECT l_partkey AS pk,
                 SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS spend,
                 CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supp
          FROM lineitem GROUP BY 1),
        n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM p),
        medspend AS (
          SELECT spend AS smed FROM (
            SELECT spend, ROW_NUMBER() OVER (ORDER BY spend, pk) AS rk, n
            FROM p CROSS JOIN n0)
          WHERE rk = (n + 1) // 2),
        medsupp AS (
          SELECT n_supp AS nmed FROM (
            SELECT n_supp, ROW_NUMBER() OVER (ORDER BY n_supp, pk)
                   AS rk, n
            FROM p CROSS JOIN n0)
          WHERE rk = (n + 1) // 2),
        classed AS MATERIALIZED (
          SELECT pk, spend, n_supp,
                 CASE WHEN spend > smed AND n_supp <= nmed
                        THEN 'strategic'
                      WHEN spend > smed THEN 'leverage'
                      WHEN n_supp <= nmed THEN 'bottleneck'
                      ELSE 'routine' END AS quadrant
          FROM p CROSS JOIN medspend CROSS JOIN medsupp),
        counts AS (
          SELECT MAX(CASE WHEN quadrant = 'strategic' THEN qn END)
                   AS n_strategic,
                 MAX(CASE WHEN quadrant = 'bottleneck' THEN qn END)
                   AS n_bottleneck
          FROM (SELECT quadrant, CAST(COUNT(*) AS BIGINT) AS qn
                FROM classed GROUP BY 1))
        SELECT CAST(rk2 AS INT) AS rank, pk AS partkey,
               ROUND(CAST(spend AS DOUBLE), 2) AS spend,
               n_supp AS n_suppliers,
               COALESCE(n_strategic, 0) AS n_strategic,
               COALESCE(n_bottleneck, 0) AS n_bottleneck
        FROM (
          SELECT pk, spend, n_supp,
                 ROW_NUMBER() OVER (ORDER BY spend DESC, pk) AS rk2
          FROM classed WHERE quadrant = 'strategic')
        CROSS JOIN counts
        WHERE rk2 <= 20 ORDER BY rank"""),
      headline = true),

    // Supplier scorecard: per supplier, delivery (share of lines
    // shipped ≤ 7 days), quality (non-returned share), and volume
    // (revenue), composited by average rank — the vendor-management
    // one-pager over the supplier dimension. Exact integer rates,
    // exact rank composite, top 20 by composite (best first) with
    // deterministic tiebreaks.
    "qji_supplier_scorecard" -> Q(
      fn = (s, dir) => {
        val m = t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_suppkey").as("sk"))
          .agg(count(lit(1)).as("n_lines"),
            sum(col("l_extendedprice").cast("decimal(18,2)")).as("rev"),
            sum(when(expr("(unix_millis(CAST(l_shipdate AS TIMESTAMP))" +
              " - unix_millis(CAST(o_orderdate AS TIMESTAMP)))" +
              " div 86400000") <= 7, 1L).otherwise(0L)).as("n_ontime"),
            sum(when(col("l_returnflag") =!= "R", 1L).otherwise(0L))
              .as("n_ok"))
          .filter(col("n_lines") >= 10)
          .localCheckpoint(eager = false)
        val ranked = m
          .withColumn("r_del", row_number().over(Window.orderBy(
            expr("(n_ontime * 1000000) div n_lines").desc, col("sk"))))
          .withColumn("r_qual", row_number().over(Window.orderBy(
            expr("(n_ok * 1000000) div n_lines").desc, col("sk"))))
          .withColumn("r_vol", row_number().over(Window.orderBy(
            col("rev").desc, col("sk"))))
          .withColumn("composite",
            col("r_del") + col("r_qual") + col("r_vol"))
        ranked
          .withColumn("rk", row_number().over(
            Window.orderBy(col("composite"), col("sk"))))
          .filter(col("rk") <= 20)
          .select(col("rk").cast("int").as("rank"),
            col("sk").as("suppkey"), col("n_lines"),
            round(col("n_ontime").cast("double") /
              col("n_lines").cast("double"), 6).as("on_time_rate"),
            round(col("n_ok").cast("double") /
              col("n_lines").cast("double"), 6).as("quality_rate"),
            round(col("rev").cast("double"), 2).as("revenue"),
            col("composite").cast("long").as("composite_rank_sum"))
          .orderBy("rank")
      },
      oracle = Some("""
        WITH m AS MATERIALIZED (
          SELECT l_suppkey AS sk, CAST(COUNT(*) AS BIGINT) AS n_lines,
                 SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev,
                 CAST(SUM(CASE WHEN (epoch_ms(l_shipdate)
                   - epoch_ms(o_orderdate)) // 86400000 <= 7
                   THEN 1 ELSE 0 END) AS BIGINT) AS n_ontime,
                 CAST(SUM(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0
                   END) AS BIGINT) AS n_ok
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          GROUP BY 1 HAVING COUNT(*) >= 10),
        ranked AS (
          SELECT *,
                 ROW_NUMBER() OVER (ORDER BY
                   (n_ontime * 1000000) // n_lines DESC, sk) AS r_del,
                 ROW_NUMBER() OVER (ORDER BY
                   (n_ok * 1000000) // n_lines DESC, sk) AS r_qual,
                 ROW_NUMBER() OVER (ORDER BY rev DESC, sk) AS r_vol
          FROM m),
        comp AS (
          SELECT *, r_del + r_qual + r_vol AS composite FROM ranked)
        SELECT CAST(rk AS INT) AS rank, sk AS suppkey, n_lines,
               ROUND(CAST(n_ontime AS DOUBLE) / CAST(n_lines AS DOUBLE),
                 6) AS on_time_rate,
               ROUND(CAST(n_ok AS DOUBLE) / CAST(n_lines AS DOUBLE), 6)
                 AS quality_rate,
               ROUND(CAST(rev AS DOUBLE), 2) AS revenue,
               CAST(composite AS BIGINT) AS composite_rank_sum
        FROM (
          SELECT *, ROW_NUMBER() OVER (ORDER BY composite, sk) AS rk
          FROM comp)
        WHERE rk <= 20 ORDER BY rank""")),

    // Sourcing-risk profile: parts by supplier multiplicity (single /
    // dual / multi-sourced), each tier's part count and SPEND AT RISK
    // share — the single-sourced spend fraction is the number a
    // resilience review leads with (a part with one supplier and big
    // spend is the outage that hurts). Exact integer multiplicities;
    // exact DECIMAL spend shares.
    "qjj_sourcing_risk" -> Q(
      fn = (s, dir) => {
        // the fixture has no single-sourced parts (min 8 suppliers) —
        // tiers cut at the exact supplier-count quartiles instead, so
        // "scarce" is the bottom-quartile multiplicity RELATIVE to peers
        val p0 = t(s, dir, "lineitem")
          .groupBy(col("l_partkey").as("pk"))
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)"))
            .as("spend"),
            countDistinct(col("l_suppkey")).as("ns"))
          .localCheckpoint(eager = false)
        val n0j = p0.agg(count(lit(1)).as("n"))
        // quartile cuts via the range-partitioned global row number —
        // never a single-partition sort of the part dimension (r9 sweep)
        val cuts = graft.operators.ScaleOps
          .globalRowNumber(p0, Seq(col("ns"), col("pk")), "rk")
          .crossJoin(broadcast(n0j))
          .agg(max(when(col("rk") === expr("(n + 3) div 4"), col("ns")))
            .as("q1"),
            max(when(col("rk") === expr("(3 * n + 3) div 4"), col("ns")))
              .as("q3"))
        val p = p0.crossJoin(broadcast(cuts))
          .withColumn("tier", when(col("ns") <= col("q1"),
            "scarce_sourced")
            .when(col("ns") >= col("q3"), "broad_sourced")
            .otherwise("mid_sourced"))
        val tot = p.agg(count(lit(1)).as("np"), sum(col("spend")).as("sp"))
        p.groupBy("tier")
          .agg(count(lit(1)).as("n_parts"), sum(col("spend")).as("tspend"))
          .crossJoin(broadcast(tot))
          .select(col("tier"), col("n_parts"),
            round(col("n_parts").cast("double") / col("np").cast("double"),
              6).as("part_share"),
            round(col("tspend").cast("double"), 2).as("spend"),
            round(col("tspend").cast("double") / col("sp").cast("double"),
              6).as("spend_share"))
          .orderBy("tier")
      },
      oracle = Some("""
        WITH p AS MATERIALIZED (
          SELECT l_partkey AS pk,
                 SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS spend,
                 CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS ns
          FROM lineitem GROUP BY 1),
        n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM p),
        cuts AS (
          SELECT MAX(CASE WHEN rk = (n + 3) // 4 THEN ns END) AS q1,
                 MAX(CASE WHEN rk = (3 * n + 3) // 4 THEN ns END) AS q3
          FROM (SELECT ns, ROW_NUMBER() OVER (ORDER BY ns, pk) AS rk, n
                FROM p CROSS JOIN n0)),
        tiers AS (
          SELECT CASE WHEN ns <= q1 THEN 'scarce_sourced'
                      WHEN ns >= q3 THEN 'broad_sourced'
                      ELSE 'mid_sourced' END AS tier,
                 spend
          FROM p CROSS JOIN cuts),
        tot AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS np, SUM(spend) AS sp
          FROM tiers)
        SELECT tier, CAST(COUNT(*) AS BIGINT) AS n_parts,
               ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(np AS DOUBLE), 6)
                 AS part_share,
               ROUND(CAST(SUM(spend) AS DOUBLE), 2) AS spend,
               ROUND(CAST(SUM(spend) AS DOUBLE) / CAST(sp AS DOUBLE), 6)
                 AS spend_share
        FROM tiers CROSS JOIN tot
        GROUP BY tier, np, sp ORDER BY tier""")),

    // Dominant-supplier switching across the period cut: each part's
    // top supplier per period (struct argmax: volume, then key), the
    // switch rate, and the top-20 biggest-spend parts that changed
    // hands — the supplier-churn read procurement tracks as
    // relationship health (a high switch rate means either healthy
    // competition or a qualification problem; either way you want the
    // list). Exact DECIMAL volumes; deterministic argmax.
    "qjk_supplier_switching" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .select(col("l_partkey").as("pk"), col("l_suppkey").as("sk"),
            when(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"),
              1).otherwise(0).as("per"),
            col("l_extendedprice").cast("decimal(18,2)").as("v"))
          .groupBy("pk", "sk", "per").agg(sum(col("v")).as("sv"))
        val dom = li.groupBy("pk", "per")
          .agg(max(struct(col("sv").as("v"), (-col("sk")).as("nsk")))
            .as("w"), sum(col("sv")).as("tot"))
          .select(col("pk"), col("per"), (-col("w.nsk")).as("top_sk"),
            col("tot"))
        val wide = dom.groupBy("pk")
          .agg(max(when(col("per") === 0, col("top_sk"))).as("s0"),
            max(when(col("per") === 1, col("top_sk"))).as("s1"),
            sum(col("tot")).as("spend"))
          .filter(col("s0").isNotNull && col("s1").isNotNull)
          .withColumn("switched", when(col("s0") =!= col("s1"), 1L)
            .otherwise(0L))
          .localCheckpoint(eager = false)
        val rate = wide.agg(count(lit(1)).as("n_parts"),
          sum(col("switched")).as("n_switched"))
        graft.operators.ScaleOps.globalRowNumber(
            wide.filter(col("switched") === 1),
            Seq(col("spend").desc, col("pk")), "rk")
          .crossJoin(broadcast(rate))
          .filter(col("rk") <= 20)
          .select(col("rk").cast("int").as("rank"),
            col("pk").as("partkey"), col("s0").as("supplier_pre"),
            col("s1").as("supplier_post"),
            round(col("spend").cast("double"), 2).as("total_spend"),
            col("n_parts"), col("n_switched"),
            round(col("n_switched").cast("double") /
              col("n_parts").cast("double"), 6).as("switch_rate"))
          .orderBy("rank")
      },
      oracle = Some("""
        WITH li AS (
          SELECT l_partkey AS pk, l_suppkey AS sk,
                 CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01'
                   THEN 1 ELSE 0 END AS per,
                 SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS sv
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          GROUP BY 1, 2, 3),
        dom AS (
          SELECT pk, per, -(MAX({'v': sv, 'nsk': -sk})['nsk']) AS top_sk,
                 SUM(sv) AS tot
          FROM li GROUP BY 1, 2),
        wide AS MATERIALIZED (
          SELECT pk,
                 MAX(CASE WHEN per = 0 THEN top_sk END) AS s0,
                 MAX(CASE WHEN per = 1 THEN top_sk END) AS s1,
                 SUM(tot) AS spend
          FROM dom GROUP BY 1
          HAVING MAX(CASE WHEN per = 0 THEN top_sk END) IS NOT NULL
             AND MAX(CASE WHEN per = 1 THEN top_sk END) IS NOT NULL),
        sw AS MATERIALIZED (
          SELECT *, CASE WHEN s0 <> s1 THEN 1 ELSE 0 END AS switched
          FROM wide),
        rate AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
                 CAST(SUM(switched) AS BIGINT) AS n_switched
          FROM sw)
        SELECT CAST(rk AS INT) AS rank, pk AS partkey,
               s0 AS supplier_pre, s1 AS supplier_post,
               ROUND(CAST(spend AS DOUBLE), 2) AS total_spend,
               n_parts, n_switched,
               ROUND(CAST(n_switched AS DOUBLE)
                 / CAST(n_parts AS DOUBLE), 6) AS switch_rate
        FROM (
          SELECT *, ROW_NUMBER() OVER (ORDER BY spend DESC, pk) AS rk
          FROM sw WHERE switched = 1)
        CROSS JOIN rate
        WHERE rk <= 20 ORDER BY rank""")),

    // Nation trade balance over the customer-nation → supplier-nation
    // flow matrix: per nation, exports (what its suppliers earn from
    // OTHER nations' customers), imports (what its customers spend
    // with OTHER nations' suppliers), balance, and trade openness
    // ((X+M)/total flow) — the international-economics read on the
    // supplier axis qgj's gravity model sizes pairwise. Exact DECIMAL
    // flow sums; two ratios per nation.
    "qjl_trade_balance" -> Q(
      fn = (s, dir) => {
        val cn = t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey").cast("long")
            .as("cnat"))
        val sn = t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey").cast("long")
            .as("snat"))
        val flows = t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(cn, col("o_custkey") === col("c_custkey"))
          .join(sn, col("l_suppkey") === col("s_suppkey"))
          .filter(col("cnat") =!= col("snat"))
          .groupBy("cnat", "snat")
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("f"))
          .localCheckpoint(eager = false)
        val exports = flows.groupBy(col("snat").as("nation"))
          .agg(sum(col("f")).as("x"))
        val imports = flows.groupBy(col("cnat").as("n2"))
          .agg(sum(col("f")).as("m"))
        val tot = flows.agg(sum(col("f")).as("w"))
        exports.join(imports, col("nation") === col("n2"), "full")
          .select(coalesce(col("nation"), col("n2")).as("nation"),
            coalesce(col("x"), lit(0).cast("decimal(18,2)")).as("x"),
            coalesce(col("m"), lit(0).cast("decimal(18,2)")).as("m"))
          .crossJoin(broadcast(tot))
          .select(col("nation"),
            round(col("x").cast("double"), 2).as("exports"),
            round(col("m").cast("double"), 2).as("imports"),
            (round((col("x") - col("m")).cast("double"), 2) + lit(0.0))
              .as("balance"),
            round((col("x") + col("m")).cast("double") /
              col("w").cast("double"), 6).as("openness_share"))
          .orderBy("nation")
      },
      oracle = Some("""
        WITH flows AS MATERIALIZED (
          SELECT CAST(c_nationkey AS BIGINT) AS cnat,
                 CAST(s_nationkey AS BIGINT) AS snat,
                 SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS f
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN supplier ON l_suppkey = s_suppkey
          WHERE c_nationkey <> s_nationkey
          GROUP BY 1, 2),
        exports AS (
          SELECT snat AS nation, SUM(f) AS x FROM flows GROUP BY 1),
        imports AS (
          SELECT cnat AS nation, SUM(f) AS m FROM flows GROUP BY 1),
        tot AS (SELECT SUM(f) AS w FROM flows)
        SELECT COALESCE(exports.nation, imports.nation) AS nation,
               ROUND(CAST(COALESCE(x, CAST(0 AS DECIMAL(18,2)))
                 AS DOUBLE), 2) AS exports,
               ROUND(CAST(COALESCE(m, CAST(0 AS DECIMAL(18,2)))
                 AS DOUBLE), 2) AS imports,
               ROUND(CAST(COALESCE(x, CAST(0 AS DECIMAL(18,2)))
                 - COALESCE(m, CAST(0 AS DECIMAL(18,2))) AS DOUBLE), 2)
                 + CAST(0 AS DOUBLE) AS balance,
               ROUND(CAST(COALESCE(x, CAST(0 AS DECIMAL(18,2)))
                 + COALESCE(m, CAST(0 AS DECIMAL(18,2))) AS DOUBLE)
                 / CAST(w AS DOUBLE), 6) AS openness_share
        FROM exports FULL OUTER JOIN imports
          ON exports.nation = imports.nation
        CROSS JOIN tot
        ORDER BY nation""")),

    // Wilson lower-bound supplier ranking: quality rate's 95% lower
    // confidence bound (p̂ + z²/2n − z√(p̂(1−p̂)/n + z²/4n²))/(1+z²/n) —
    // the small-sample-honest ranking (a 10/10 supplier should NOT
    // outrank a 980/1000 one; the raw rate says it does, the Wilson
    // bound doesn't). Top-20 by bound with the naive-rank column
    // showing exactly where the correction reorders. Integer
    // rates; sqrt links.
    "qjm_wilson_ranking" -> Q(
      fn = (s, dir) => {
        val m = t(s, dir, "lineitem")
          .groupBy(col("l_suppkey").as("sk"))
          .agg(count(lit(1)).as("n"),
            sum(when(col("l_returnflag") =!= "R", 1L).otherwise(0L))
              .as("k"))
        // z² as the shared decimal literal 3.8416 — computing 1.96·1.96
        // in Scala lands 1 ulp BELOW the literal's nearest double
        val scored = m
          .withColumn("p", col("k").cast("double") / col("n").cast("double"))
          .withColumn("nd", col("n").cast("double"))
          .withColumn("wlb", round(
            (col("p") + lit(3.8416) / (lit(2.0) * col("nd")) -
              lit(1.96) * sqrt(col("p") * (lit(1.0) - col("p")) /
                col("nd") + lit(3.8416) / (lit(4.0) * col("nd") * col("nd"))))
              / (lit(1.0) + lit(3.8416) / col("nd")), 9))
          .localCheckpoint(eager = false)
        val naive = scored.withColumn("naive_rank", row_number().over(
          Window.orderBy(col("p").desc, col("sk"))))
        naive
          .withColumn("rk", row_number().over(
            Window.orderBy(col("wlb").desc, col("sk"))))
          .filter(col("rk") <= 20)
          .select(col("rk").cast("int").as("rank"),
            col("sk").as("suppkey"), col("n").as("n_lines"),
            round(col("p"), 6).as("raw_rate"),
            round(col("wlb"), 6).as("wilson_lower_bound"),
            col("naive_rank").cast("int").as("naive_rank"))
          .orderBy("rank")
      },
      oracle = Some("""
        WITH m AS (
          SELECT l_suppkey AS sk, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CASE WHEN l_returnflag <> 'R' THEN 1 ELSE 0
                   END) AS BIGINT) AS k
          FROM lineitem GROUP BY 1),
        scored AS MATERIALIZED (
          SELECT sk, n, p,
                 ROUND((p + CAST(3.8416 AS DOUBLE)
                     / (CAST(2 AS DOUBLE) * nd)
                   - CAST(1.96 AS DOUBLE)
                     * SQRT(p * (CAST(1 AS DOUBLE) - p) / nd
                       + CAST(3.8416 AS DOUBLE)
                         / (CAST(4 AS DOUBLE) * nd * nd)))
                   / (CAST(1 AS DOUBLE) + CAST(3.8416 AS DOUBLE) / nd),
                   9) AS wlb
          FROM (
            SELECT sk, n, CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p,
                   CAST(n AS DOUBLE) AS nd
            FROM m)),
        naive AS (
          SELECT *, ROW_NUMBER() OVER (ORDER BY p DESC, sk)
                   AS naive_rank
          FROM scored)
        SELECT CAST(rk AS INT) AS rank, sk AS suppkey, n AS n_lines,
               ROUND(p, 6) AS raw_rate,
               ROUND(wlb, 6) AS wilson_lower_bound,
               CAST(naive_rank AS INT) AS naive_rank
        FROM (
          SELECT *, ROW_NUMBER() OVER (ORDER BY wlb DESC, sk) AS rk
          FROM naive)
        WHERE rk <= 20 ORDER BY rank""")),

    // Retention-curve shape discrimination: the day-offset retention
    // rates fit BOTH ways — exponential (ln r on t, q93's memoryless
    // form) and power-law (ln r on ln t, the Duolingo/forgetting-curve
    // form) — with R²s and the verdict. The shapes imply opposite
    // product truths (exponential = constant hazard, power = the
    // longer they stay the safer they are), and only the fit
    // comparison can tell them apart. ln links; 9-grid moments.
    "qjn_retention_shape" -> Q(
      fn = (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("user_id"),
            expr("unix_millis(ts) div 86400000").as("day"))
          .distinct()
        val first = e.groupBy("user_id").agg(min(col("day")).as("fd"))
        val coh = first.groupBy("fd").agg(count(lit(1)).as("n0"))
        val ret = e.join(first, "user_id")
          .select(col("fd"), (col("day") - col("fd")).as("off"))
          .filter(col("off") >= 1)
          .groupBy("fd", "off").agg(count(lit(1)).as("na"))
          .join(coh, "fd")
          .groupBy("off")
          .agg(sum(col("na")).as("act"), sum(col("n0")).as("base"))
          .select(col("off"),
            round(log(col("act").cast("double") /
              col("base").cast("double")), 9).as("lnr"),
            round(log(col("off").cast("double")), 9).as("lnt"))
          .localCheckpoint(eager = false)
        val fe = ret.withColumn("xo", col("off").cast("double"))
        val mmE = fe.agg(count(lit(1)).as("n"),
          sum(g9(col("xo"))).as("sx"), sum(g9(col("lnr"))).as("sy"),
          sum(g9(round(col("xo") * col("lnr"), 9))).as("sxy"),
          sum(g9(round(col("xo") * col("xo"), 9))).as("sxx"),
          sum(g9(round(col("lnr") * col("lnr"), 9))).as("syy"))
        def solve(mm: DataFrame) = mm.select(col("n"),
          ((col("n").cast("double") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double")) /
            (col("n").cast("double") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")))
            .as("b"),
          ((col("n").cast("double") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double")) *
           (col("n").cast("double") * col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double")) /
            ((col("n").cast("double") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")) *
             (col("n").cast("double") * col("syy").cast("double") -
              col("sy").cast("double") * col("sy").cast("double"))))
            .as("r2"))
        val eF = solve(mmE)
        val mmP = ret.agg(count(lit(1)).as("n"),
          sum(g9(col("lnt"))).as("sx"), sum(g9(col("lnr"))).as("sy"),
          sum(g9(round(col("lnt") * col("lnr"), 9))).as("sxy"),
          sum(g9(round(col("lnt") * col("lnt"), 9))).as("sxx"),
          sum(g9(round(col("lnr") * col("lnr"), 9))).as("syy"))
        val pF = solve(mmP)
        eF.select(col("n").as("n_offsets"),
            (round(col("b"), 6) + lit(0.0)).as("exp_rate"),
            round(col("r2"), 6).as("exp_r2"))
          .crossJoin(broadcast(pF.select(
            (round(col("b"), 6) + lit(0.0)).as("power_exponent"),
            round(col("r2"), 6).as("power_r2"))))
          .withColumn("shape_verdict",
            when(col("power_r2") > col("exp_r2"), "power_law")
              .otherwise("exponential"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT DISTINCT user_id, epoch_ms(ts) // 86400000 AS day
          FROM events),
        fd AS (SELECT user_id, MIN(day) AS fd FROM e GROUP BY 1),
        coh AS (SELECT fd, CAST(COUNT(*) AS BIGINT) AS n0
                FROM fd GROUP BY 1),
        ret AS MATERIALIZED (
          SELECT off,
                 ROUND(ln(CAST(act AS DOUBLE) / CAST(base AS DOUBLE)), 9)
                   AS lnr,
                 ROUND(ln(CAST(off AS DOUBLE)), 9) AS lnt,
                 CAST(off AS DOUBLE) AS xo
          FROM (
            SELECT off, CAST(SUM(na) AS BIGINT) AS act,
                   CAST(SUM(n0) AS BIGINT) AS base
            FROM (
              SELECT r.fd, day - r.fd AS off,
                     CAST(COUNT(*) AS BIGINT) AS na
              FROM e JOIN fd r ON e.user_id = r.user_id
              WHERE day - r.fd >= 1
              GROUP BY 1, 2) a
            JOIN coh ON a.fd = coh.fd
            GROUP BY 1)),
        me AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(ROUND(xo, 9) AS DECIMAL(20,9))) AS sx,
                 SUM(CAST(ROUND(lnr, 9) AS DECIMAL(20,9))) AS sy,
                 SUM(CAST(ROUND(xo * lnr, 9) AS DECIMAL(20,9))) AS sxy,
                 SUM(CAST(ROUND(xo * xo, 9) AS DECIMAL(20,9))) AS sxx,
                 SUM(CAST(ROUND(lnr * lnr, 9) AS DECIMAL(20,9))) AS syy
          FROM ret),
        mp AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(ROUND(lnt, 9) AS DECIMAL(20,9))) AS sx,
                 SUM(CAST(ROUND(lnr, 9) AS DECIMAL(20,9))) AS sy,
                 SUM(CAST(ROUND(lnt * lnr, 9) AS DECIMAL(20,9))) AS sxy,
                 SUM(CAST(ROUND(lnt * lnt, 9) AS DECIMAL(20,9))) AS sxx,
                 SUM(CAST(ROUND(lnr * lnr, 9) AS DECIMAL(20,9))) AS syy
          FROM ret),
        fe AS (
          SELECT n,
                 (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
                 (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b,
                 (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r2
          FROM me),
        fp AS (
          SELECT (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
                 (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b,
                 (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))) AS r2
          FROM mp)
        SELECT fe.n AS n_offsets,
               ROUND(fe.b, 6) + CAST(0 AS DOUBLE) AS exp_rate,
               ROUND(fe.r2, 6) AS exp_r2,
               ROUND(fp.b, 6) + CAST(0 AS DOUBLE) AS power_exponent,
               ROUND(fp.r2, 6) AS power_r2,
               CASE WHEN ROUND(fp.r2, 6) > ROUND(fe.r2, 6)
                 THEN 'power_law' ELSE 'exponential' END AS shape_verdict
        FROM fe CROSS JOIN fp""")),

    // Frequency–severity (compound) variance decomposition of daily
    // revenue: Var(S) ≈ E[N]·Var(X) + Var(N)·E[X]² — how much of
    // revenue volatility is purchase-COUNT noise vs ticket-SIZE noise
    // (they demand opposite fixes: demand smoothing vs mix control).
    // The identity is exact for iid compound sums; the residual row
    // measures how far the data is from that. Exact integer/DECIMAL
    // power sums; value in thousands for the moment envelope.
    "qjo_compound_variance" -> Q(
      fn = (s, dir) => {
        val pv = t(s, dir, "events")
          .filter(col("event_type") === "purchase" &&
            col("value").isNotNull)
          .select(expr("unix_millis(ts) div 86400000").as("day"),
            (col("value").cast("decimal(18,2)") / lit(1000))
              .cast("decimal(18,5)").as("x"))
        val daily = pv.groupBy("day")
          .agg(count(lit(1)).as("nd"), sum(col("x")).as("sd"))
        val mN = daily.agg(count(lit(1)).as("days"),
          sum(col("nd")).as("sn"), sum(col("nd") * col("nd")).as("snn"),
          sum(col("sd")).as("ss"),
          sum((col("sd") * col("sd")).cast("decimal(38,10)")).as("sss"))
        val mX = pv.agg(count(lit(1)).as("nx"), sum(col("x")).as("sx"),
          sum((col("x") * col("x")).cast("decimal(38,10)")).as("sxx"))
        mN.crossJoin(broadcast(mX))
          .select(col("days"),
            (col("sn").cast("double") / col("days").cast("double"))
              .as("en"),
            ((col("days").cast("double") * col("snn").cast("double") -
              col("sn").cast("double") * col("sn").cast("double")) /
              (col("days").cast("double") *
                (col("days") - 1).cast("double"))).as("vn"),
            (col("sx").cast("double") / col("nx").cast("double"))
              .as("ex"),
            ((col("nx").cast("double") *
              expr("CAST(CAST(sxx AS STRING) AS DOUBLE)") -
              col("sx").cast("double") * col("sx").cast("double")) /
              (col("nx").cast("double") *
                (col("nx") - 1).cast("double"))).as("vx"),
            ((col("days").cast("double") *
              expr("CAST(CAST(sss AS STRING) AS DOUBLE)") -
              col("ss").cast("double") * col("ss").cast("double")) /
              (col("days").cast("double") *
                (col("days") - 1).cast("double"))).as("vs"))
          .select(col("days").as("n_days"),
            round(col("en"), 6).as("mean_daily_count"),
            round(col("ex"), 6).as("mean_ticket_k"),
            round(col("vs"), 6).as("var_daily_revenue"),
            round(col("en") * col("vx"), 6).as("severity_component"),
            round(col("vn") * col("ex") * col("ex"), 6)
              .as("frequency_component"),
            (round(col("vs") - col("en") * col("vx") -
              col("vn") * col("ex") * col("ex"), 6) + lit(0.0))
              .as("residual"),
            round(col("vn") * col("ex") * col("ex") /
              (col("en") * col("vx") +
                col("vn") * col("ex") * col("ex")), 6)
              .as("frequency_share"))
      },
      oracle = Some("""
        WITH pv AS MATERIALIZED (
          SELECT epoch_ms(ts) // 86400000 AS day,
                 CAST(CAST(value AS DECIMAL(18,2)) / 1000
                   AS DECIMAL(18,5)) AS x
          FROM events
          WHERE event_type = 'purchase' AND value IS NOT NULL),
        daily AS (
          SELECT day, CAST(COUNT(*) AS BIGINT) AS nd, SUM(x) AS sd
          FROM pv GROUP BY 1),
        mn AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS days,
                 CAST(SUM(nd) AS BIGINT) AS sn,
                 CAST(SUM(nd * nd) AS BIGINT) AS snn,
                 SUM(sd) AS ss,
                 SUM(CAST(sd AS DECIMAL(19,5)) * CAST(sd AS DECIMAL(19,5)))
                   AS sss
          FROM daily),
        mx AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS nx, SUM(x) AS sx,
                 SUM(CAST(x AS DECIMAL(19,5)) * CAST(x AS DECIMAL(19,5)))
                   AS sxx
          FROM pv),
        f AS (
          SELECT days,
                 CAST(sn AS DOUBLE) / CAST(days AS DOUBLE) AS en,
                 (CAST(days AS DOUBLE) * CAST(snn AS DOUBLE)
                   - CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE))
                   / (CAST(days AS DOUBLE) * CAST(days - 1 AS DOUBLE))
                   AS vn,
                 CAST(sx AS DOUBLE) / CAST(nx AS DOUBLE) AS ex,
                 (CAST(nx AS DOUBLE)
                   * CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                   / (CAST(nx AS DOUBLE) * CAST(nx - 1 AS DOUBLE)) AS vx,
                 (CAST(days AS DOUBLE)
                   * CAST(CAST(sss AS VARCHAR) AS DOUBLE)
                   - CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE))
                   / (CAST(days AS DOUBLE) * CAST(days - 1 AS DOUBLE))
                   AS vs
          FROM mn CROSS JOIN mx)
        SELECT days AS n_days,
               ROUND(en, 6) AS mean_daily_count,
               ROUND(ex, 6) AS mean_ticket_k,
               ROUND(vs, 6) AS var_daily_revenue,
               ROUND(en * vx, 6) AS severity_component,
               ROUND(vn * ex * ex, 6) AS frequency_component,
               ROUND(vs - en * vx - vn * ex * ex, 6)
                 + CAST(0 AS DOUBLE) AS residual,
               ROUND(vn * ex * ex / (en * vx + vn * ex * ex), 6)
                 AS frequency_share
        FROM f""")),

    // Load-factor card per event type: peak-to-average ratio, load
    // factor (average/peak) and the top-3-hour concentration over the
    // hour-of-day profile — the capacity-planning shape summary
    // (a 0.4 load factor means provisioning for peak wastes 60% —
    // the argument for smoothing or pricing off the peak). Exact
    // integer hourly counts; ratios at the end.
    "qjp_load_factor" -> Q(
      fn = (s, dir) => {
        val h = t(s, dir, "events")
          .groupBy(col("event_type"),
            (expr("unix_millis(ts) div 3600000") % 24).cast("int")
              .as("hod"))
          .agg(count(lit(1)).as("c"))
        val ranked = h
          .withColumn("rk", row_number().over(
            Window.partitionBy("event_type")
              .orderBy(col("c").desc, col("hod"))))
        ranked.groupBy("event_type")
          .agg(sum(col("c")).as("total"),
            max(col("c")).as("peak"),
            sum(when(col("rk") <= 3, col("c")).otherwise(0L)).as("top3"))
          .select(col("event_type"), col("total"),
            col("peak"),
            round(col("peak").cast("double") * lit(24.0) /
              col("total").cast("double"), 6).as("peak_to_avg"),
            round(col("total").cast("double") /
              (col("peak").cast("double") * lit(24.0)), 6)
              .as("load_factor"),
            round(col("top3").cast("double") / col("total").cast("double"),
              6).as("top3_hour_share"))
          .orderBy("event_type")
      },
      oracle = Some("""
        WITH h AS (
          SELECT event_type,
                 CAST((epoch_ms(ts) // 3600000) % 24 AS INT) AS hod,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2),
        ranked AS (
          SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                   ORDER BY c DESC, hod) AS rk
          FROM h)
        SELECT event_type,
               CAST(SUM(c) AS BIGINT) AS total,
               CAST(MAX(c) AS BIGINT) AS peak,
               ROUND(CAST(MAX(c) AS DOUBLE) * CAST(24 AS DOUBLE)
                 / CAST(SUM(c) AS DOUBLE), 6) AS peak_to_avg,
               ROUND(CAST(SUM(c) AS DOUBLE)
                 / (CAST(MAX(c) AS DOUBLE) * CAST(24 AS DOUBLE)), 6)
                 AS load_factor,
               ROUND(CAST(SUM(CASE WHEN rk <= 3 THEN c ELSE 0 END)
                 AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6)
                 AS top3_hour_share
        FROM ranked GROUP BY 1 ORDER BY 1""")),

    // Law-of-one-price dispersion: per part, the coefficient of
    // variation of its per-line unit price — the IO-economics measure
    // of market friction (identical goods, different prices) that
    // qi5's TIME dimension (stickiness) doesn't see: this is the
    // CROSS-SECTION spread. Top-20 most-dispersed parts (≥10 lines)
    // plus the corpus-wide mean CV on each row. Unit prices on the
    // 9-grid; exact moment sums per part.
    "qjq_price_dispersion" -> Q(
      fn = (s, dir) => {
        val u = t(s, dir, "lineitem")
          .select(col("l_partkey").as("pk"), col("l_orderkey"),
            col("l_linenumber"),
            round(col("l_extendedprice").cast("double") /
              col("l_quantity").cast("double"), 9).as("up"))
        val m = u.groupBy("pk")
          .agg(count(lit(1)).as("n"),
            sum(g9(col("up"))).as("su"),
            sum(g9(round(col("up") * col("up"), 9))).as("suu"))
          .filter(col("n") >= 10)
          .withColumn("mean_p", col("su").cast("double") /
            col("n").cast("double"))
          .withColumn("cv", round(sqrt(
            (col("n").cast("double") * col("suu").cast("double") -
              col("su").cast("double") * col("su").cast("double")) /
            (col("n").cast("double") * (col("n") - 1).cast("double"))) /
            col("mean_p"), 9))
          .localCheckpoint(eager = false)
        val overall = m.agg(count(lit(1)).as("n_parts"),
          round(sum(g9(col("cv"))).cast("double") /
            count(lit(1)).cast("double"), 6).as("mean_cv"))
        m.crossJoin(broadcast(overall))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("cv").desc, col("pk"))))
          .filter(col("rk") <= 20)
          .select(col("rk").cast("int").as("rank"),
            col("pk").as("partkey"), col("n").as("n_lines"),
            round(col("mean_p"), 6).as("mean_unit_price"),
            round(col("cv"), 6).as("price_cv"),
            col("n_parts"), col("mean_cv"))
          .orderBy("rank")
      },
      oracle = Some("""
        WITH u AS (
          SELECT l_partkey AS pk,
                 ROUND(CAST(l_extendedprice AS DOUBLE)
                   / CAST(l_quantity AS DOUBLE), 9) AS up
          FROM lineitem),
        m AS MATERIALIZED (
          SELECT pk, n, mean_p,
                 ROUND(SQRT((CAST(n AS DOUBLE) * CAST(suu AS DOUBLE)
                     - CAST(su AS DOUBLE) * CAST(su AS DOUBLE))
                   / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)))
                   / mean_p, 9) AS cv
          FROM (
            SELECT pk, CAST(COUNT(*) AS BIGINT) AS n,
                   SUM(CAST(ROUND(up, 9) AS DECIMAL(20,9))) AS su,
                   SUM(CAST(ROUND(up * up, 9) AS DECIMAL(20,9))) AS suu,
                   CAST(SUM(CAST(ROUND(up, 9) AS DECIMAL(20,9)))
                     AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_p
            FROM u GROUP BY 1 HAVING COUNT(*) >= 10)),
        overall AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
                 ROUND(CAST(SUM(CAST(ROUND(cv, 9) AS DECIMAL(20,9)))
                   AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS mean_cv
          FROM m)
        SELECT CAST(rk AS INT) AS rank, pk AS partkey, n AS n_lines,
               ROUND(mean_p, 6) AS mean_unit_price,
               ROUND(cv, 6) AS price_cv,
               n_parts, mean_cv
        FROM (
          SELECT *, ROW_NUMBER() OVER (ORDER BY cv DESC, pk) AS rk
          FROM m CROSS JOIN overall)
        WHERE rk <= 20 ORDER BY rank""")),

    // Cost-of-returns Pareto by brand: returned-line revenue ranked,
    // cumulative share, and the vital-few count (brands covering 80%
    // of return cost) — the quality-cost concentration read that says
    // whether returns are a SYSTEMIC problem or two bad brands
    // (q7w's ABC logic pointed at the quality ledger). Exact DECIMAL
    // return revenue; exact cumulative shares.
    "qjr_return_pareto" -> Q(
      fn = (s, dir) => {
        val b = t(s, dir, "lineitem")
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand").as("brand"))
          .agg(sum(when(col("l_returnflag") === "R",
            col("l_extendedprice").cast("decimal(18,2)"))
            .otherwise(lit(0).cast("decimal(18,2)"))).as("ret_rev"),
            sum(col("l_extendedprice").cast("decimal(18,2)")).as("rev"))
        val tot = b.agg(sum(col("ret_rev")).as("trr"))
        val ranked = b.crossJoin(broadcast(tot))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("ret_rev").desc, col("brand"))))
          .withColumn("cum", sum(col("ret_rev")).over(
            Window.orderBy("rk").rowsBetween(Window.unboundedPreceding, 0)))
          .withColumn("cshare", round(col("cum").cast("double") /
            col("trr").cast("double"), 9))
          .localCheckpoint(eager = false)
        val vital = ranked.filter(col("cshare") < 0.8)
          .agg((count(lit(1)) + 1).as("vital_few"))
        ranked.crossJoin(broadcast(vital))
          .select(col("rk").cast("int").as("rank"), col("brand"),
            round(col("ret_rev").cast("double"), 2).as("return_revenue"),
            round(col("ret_rev").cast("double") /
              col("rev").cast("double"), 6).as("brand_return_rate"),
            round(col("cshare"), 6).as("cum_share"),
            col("vital_few"))
          .orderBy("rank")
      },
      oracle = Some("""
        WITH b AS (
          SELECT p_brand AS brand,
                 SUM(CASE WHEN l_returnflag = 'R'
                   THEN CAST(l_extendedprice AS DECIMAL(18,2))
                   ELSE CAST(0 AS DECIMAL(18,2)) END) AS ret_rev,
                 SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY 1),
        tot AS (SELECT SUM(ret_rev) AS trr FROM b),
        ranked AS MATERIALIZED (
          SELECT *, ROUND(CAST(SUM(ret_rev) OVER (ORDER BY rk
                   ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                 / CAST(trr AS DOUBLE), 9) AS cshare
          FROM (
            SELECT brand, ret_rev, rev, trr,
                   ROW_NUMBER() OVER (ORDER BY ret_rev DESC, brand)
                     AS rk
            FROM b CROSS JOIN tot)),
        vital AS (
          SELECT CAST(COUNT(*) + 1 AS BIGINT) AS vital_few
          FROM ranked WHERE cshare < CAST(0.8 AS DOUBLE))
        SELECT CAST(rk AS INT) AS rank, brand,
               ROUND(CAST(ret_rev AS DOUBLE), 2) AS return_revenue,
               ROUND(CAST(ret_rev AS DOUBLE) / CAST(rev AS DOUBLE), 6)
                 AS brand_return_rate,
               ROUND(cshare, 6) AS cum_share,
               vital_few
        FROM ranked CROSS JOIN vital
        ORDER BY rank""")),

    // One-covariate ANCOVA: post-period spend per region adjusted for
    // pre-period spend — the common within-group slope b_w from pooled
    // within moments, adjusted means ȳ_g − b_w(x̄_g − x̄), and the
    // adjusted-vs-raw gap per region — the "fair comparison" the raw
    // group means can't make when groups start from different bases
    // (regression-to-mean eats naive before/after readings, qfp's
    // lesson institutionalized). Exact DECIMAL moments per group;
    // doubles in the final algebra.
    "qjs_ancova" -> Q(
      fn = (s, dir) => {
        val sp = t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
          .select(col("o_custkey").as("ck"),
            col("n_regionkey").cast("long").as("rg"),
            when(col("o_orderdate") < lit("1996-01-01").cast("timestamp"),
              (col("o_totalprice").cast("decimal(18,2)") / lit(1000000))
                .cast("decimal(18,8)"))
              .otherwise(lit(0).cast("decimal(18,8)")).as("x"),
            when(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"),
              (col("o_totalprice").cast("decimal(18,2)") / lit(1000000))
                .cast("decimal(18,8)"))
              .otherwise(lit(0).cast("decimal(18,8)")).as("y"))
          .groupBy("ck", "rg")
          .agg(sum(col("x")).as("x"), sum(col("y")).as("y"))
        val g = sp.groupBy("rg")
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("y")).as("sy"),
            sum((col("x") * col("y")).cast("decimal(38,16)")).as("sxy"),
            sum((col("x") * col("x")).cast("decimal(38,16)")).as("sxx"))
          .localCheckpoint(eager = false)
        // pooled WITHIN-group cross moments: Σ_g (Sxy_g − Sx_g·Sy_g/n_g)
        val within = g.agg(
            sum(col("n")).as("nt"), sum(col("sx")).as("sxt"),
            sum(col("sy")).as("syt"),
            sum(g9(round(
              expr("CAST(CAST(sxy AS STRING) AS DOUBLE)") -
                col("sx").cast("double") * col("sy").cast("double") /
                col("n").cast("double"), 9))).as("wxy"),
            sum(g9(round(
              expr("CAST(CAST(sxx AS STRING) AS DOUBLE)") -
                col("sx").cast("double") * col("sx").cast("double") /
                col("n").cast("double"), 9))).as("wxx"))
          .select(col("nt"), col("sxt"), col("syt"),
            (col("wxy").cast("double") / col("wxx").cast("double"))
              .as("bw"))
        g.crossJoin(broadcast(within))
          .withColumn("xbar", col("sx").cast("double") /
            col("n").cast("double"))
          .withColumn("ybar", col("sy").cast("double") /
            col("n").cast("double"))
          .withColumn("xgrand", col("sxt").cast("double") /
            col("nt").cast("double"))
          .withColumn("adj", col("ybar") - col("bw") *
            (col("xbar") - col("xgrand")))
          .select(col("rg").as("region"), col("n").as("n_customers"),
            round(col("xbar"), 6).as("pre_mean_m"),
            round(col("ybar"), 6).as("post_mean_raw_m"),
            round(col("adj"), 6).as("post_mean_adjusted_m"),
            (round(-col("bw") * (col("xbar") - col("xgrand")), 6)
              + lit(0.0)).as("adjustment"),
            round(col("bw"), 6).as("common_slope"))
          .orderBy("region")
      },
      oracle = Some("""
        WITH sp AS (
          SELECT o_custkey AS ck, CAST(n_regionkey AS BIGINT) AS rg,
                 SUM(CASE WHEN o_orderdate < TIMESTAMP '1996-01-01'
                   THEN CAST(CAST(o_totalprice AS DECIMAL(18,2))
                     / 1000000 AS DECIMAL(18,8))
                   ELSE CAST(0 AS DECIMAL(18,8)) END) AS x,
                 SUM(CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01'
                   THEN CAST(CAST(o_totalprice AS DECIMAL(18,2))
                     / 1000000 AS DECIMAL(18,8))
                   ELSE CAST(0 AS DECIMAL(18,8)) END) AS y
          FROM orders JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          GROUP BY 1, 2),
        g AS MATERIALIZED (
          SELECT rg, CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(x) AS sx, SUM(y) AS sy,
                 SUM(CAST(x AS DECIMAL(19,8)) * CAST(y AS DECIMAL(19,8)))
                   AS sxy,
                 SUM(CAST(x AS DECIMAL(19,8)) * CAST(x AS DECIMAL(19,8)))
                   AS sxx
          FROM sp GROUP BY 1),
        within AS (
          SELECT CAST(SUM(n) AS BIGINT) AS nt, SUM(sx) AS sxt,
                 SUM(sy) AS syt,
                 CAST(SUM(CAST(ROUND(
                   CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)
                     / CAST(n AS DOUBLE), 9) AS DECIMAL(20,9)))
                   AS DOUBLE)
                 / CAST(SUM(CAST(ROUND(
                   CAST(CAST(sxx AS VARCHAR) AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                     / CAST(n AS DOUBLE), 9) AS DECIMAL(20,9)))
                   AS DOUBLE) AS bw
          FROM g)
        SELECT rg AS region, n AS n_customers,
               ROUND(xbar, 6) AS pre_mean_m,
               ROUND(ybar, 6) AS post_mean_raw_m,
               ROUND(ybar - bw * (xbar - xgrand), 6)
                 AS post_mean_adjusted_m,
               ROUND(-(bw * (xbar - xgrand)), 6) + CAST(0 AS DOUBLE)
                 AS adjustment,
               ROUND(bw, 6) AS common_slope
        FROM (
          SELECT rg, n, bw,
                 CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS xbar,
                 CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS ybar,
                 CAST(sxt AS DOUBLE) / CAST(nt AS DOUBLE) AS xgrand
          FROM g CROSS JOIN within)
        ORDER BY region""")),

    // Seasonal-amplitude trend: per year, the within-year monthly
    // revenue swing (max − min, in millions), OLS'd over years — is
    // seasonality itself growing (multiplicative world, qhq's
    // assumption) or fixed (additive, q7r's)? The one-number answer
    // to which Holt–Winters variant this series wants. Exact monthly
    // DECIMALs; one tiny OLS over the year panel.
    "qjt_seasonal_amplitude" -> Q(
      fn = (s, dir) => {
        val m = t(s, dir, "orders")
          .groupBy(expr("year(o_orderdate)").cast("long").as("yr"),
            expr("month(o_orderdate)").cast("int").as("mo"))
          .agg((sum(col("o_totalprice").cast("decimal(18,2)")) /
            lit(1000000)).cast("decimal(18,8)").as("rev"))
        val amp = m.groupBy("yr")
          .agg(count(lit(1)).as("n_months"),
            (max(col("rev")) - min(col("rev"))).as("amp"))
          .filter(col("n_months") === 12)
          .select(col("yr"), round(col("amp").cast("double"), 9).as("a"))
          .localCheckpoint(eager = false)
        val base = amp.agg(min(col("yr")).as("y0"))
        val idx = amp.crossJoin(broadcast(base))
          .select((col("yr") - col("y0") + 1).as("tt"), col("a"))
        val mm = idx.agg(count(lit(1)).as("n"), sum(col("tt")).as("st"),
          sum(g9(col("a"))).as("sa"),
          sum(col("tt") * col("tt")).as("stt"),
          sum(g9(round(col("tt").cast("double") * col("a"), 9)))
            .as("sta"))
        mm.select(col("n").as("n_years"),
            (round((col("n").cast("double") * col("sta").cast("double") -
              col("st").cast("double") * col("sa").cast("double")) /
              (col("n").cast("double") * col("stt").cast("double") -
                col("st").cast("double") * col("st").cast("double")), 6)
              + lit(0.0)).as("amplitude_slope_m_per_year"),
            round(col("sa").cast("double") / col("n").cast("double"), 6)
              .as("mean_amplitude_m"),
            when((col("n").cast("double") * col("sta").cast("double") -
              col("st").cast("double") * col("sa").cast("double")) /
              (col("n").cast("double") * col("stt").cast("double") -
                col("st").cast("double") * col("st").cast("double")) > 0,
              "growing_multiplicative").otherwise("stable_additive")
              .as("verdict"))
      },
      oracle = Some("""
        WITH m AS (
          SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
                 CAST(month(o_orderdate) AS INT) AS mo,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) / 1000000
                   AS DECIMAL(18,8)) AS rev
          FROM orders GROUP BY 1, 2),
        amp AS MATERIALIZED (
          SELECT yr, ROUND(CAST(MAX(rev) - MIN(rev) AS DOUBLE), 9) AS a
          FROM m GROUP BY 1 HAVING COUNT(*) = 12),
        base AS (SELECT MIN(yr) AS y0 FROM amp),
        idx AS (
          SELECT yr - y0 + 1 AS tt, a FROM amp CROSS JOIN base),
        mm AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(tt) AS BIGINT) AS st,
                 SUM(CAST(ROUND(a, 9) AS DECIMAL(20,9))) AS sa,
                 CAST(SUM(tt * tt) AS BIGINT) AS stt,
                 SUM(CAST(ROUND(CAST(tt AS DOUBLE) * a, 9)
                   AS DECIMAL(20,9))) AS sta
          FROM idx),
        f AS (
          SELECT n,
                 (CAST(n AS DOUBLE) * CAST(sta AS DOUBLE)
                   - CAST(st AS DOUBLE) * CAST(sa AS DOUBLE)) /
                 (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
                   - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)) AS slope,
                 CAST(sa AS DOUBLE) / CAST(n AS DOUBLE) AS meana
          FROM mm)
        SELECT n AS n_years,
               ROUND(slope, 6) + CAST(0 AS DOUBLE)
                 AS amplitude_slope_m_per_year,
               ROUND(meana, 6) AS mean_amplitude_m,
               CASE WHEN slope > 0 THEN 'growing_multiplicative'
                 ELSE 'stable_additive' END AS verdict
        FROM f""")),

    // u-chart (defects per unit) over daily order lines: returned
    // lines per order per day against ū ± 3·√(ū/nᵢ) — the SPC chart
    // whose limits WIDEN on thin days (a 50% defect day with 2 orders
    // is noise; with 200 it's a crisis — fixed-limit charts can't say
    // that). Integer defect/unit counts; per-day limits from the
    // pooled rate; violations flagged exactly.
    "qju_u_chart" -> Q(
      fn = (s, dir) => {
        val d = t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .groupBy(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP))" +
            " div 86400000").as("day"))
          .agg(countDistinct(col("o_orderkey")).as("n_units"),
            sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
              .as("n_def"))
        val ubar = d.agg(
          round(sum(col("n_def")).cast("double") /
            sum(col("n_units")).cast("double"), 9).as("ub"))
        val scan = d.crossJoin(broadcast(ubar))
          .withColumn("u", round(col("n_def").cast("double") /
            col("n_units").cast("double"), 9))
          .withColumn("ucl", col("ub") + lit(3.0) *
            sqrt(col("ub") / col("n_units").cast("double")))
          .withColumn("lcl", greatest(col("ub") - lit(3.0) *
            sqrt(col("ub") / col("n_units").cast("double")), lit(0.0)))
          .withColumn("viol", when(col("u") > col("ucl") ||
            (col("lcl") > 0 && col("u") < col("lcl")), 1L).otherwise(0L))
        scan.agg(count(lit(1)).as("n_days"),
            max(col("ub")).as("ubx"),
            sum(col("viol")).as("n_violations"),
            max(struct(col("u").as("u"), col("day").as("day"))).as("w"))
          .select(col("n_days"),
            round(col("ubx"), 6).as("u_bar"),
            col("n_violations"),
            round(col("w.u"), 6).as("worst_u"),
            col("w.day").as("worst_day"))
      },
      oracle = Some("""
        WITH d AS (
          SELECT CAST(epoch_ms(o_orderdate) // 86400000 AS BIGINT)
                   AS day,
                 CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_units,
                 CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0
                   END) AS BIGINT) AS n_def
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          GROUP BY 1),
        ubar AS (
          SELECT ROUND(CAST(SUM(n_def) AS DOUBLE)
                 / CAST(SUM(n_units) AS DOUBLE), 9) AS ub
          FROM d),
        scan AS (
          SELECT day, ub,
                 ROUND(CAST(n_def AS DOUBLE) / CAST(n_units AS DOUBLE),
                   9) AS u,
                 ub + CAST(3 AS DOUBLE)
                   * SQRT(ub / CAST(n_units AS DOUBLE)) AS ucl,
                 GREATEST(ub - CAST(3 AS DOUBLE)
                   * SQRT(ub / CAST(n_units AS DOUBLE)),
                   CAST(0 AS DOUBLE)) AS lcl
          FROM d CROSS JOIN ubar)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
               ROUND(MAX(ub), 6) AS u_bar,
               CAST(SUM(CASE WHEN u > ucl OR (lcl > 0 AND u < lcl)
                 THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
               ROUND(MAX({'u': u, 'day': day})['u'], 6) AS worst_u,
               MAX({'u': u, 'day': day})['day'] AS worst_day
        FROM scan""")),

    // Market-concentration trend: monthly brand HHI (exact 9-grid
    // share squares) with its OLS slope over month index — is the
    // market concentrating or fragmenting, the dynamic question
    // qas's single concentration snapshot can't answer. Exact DECIMAL
    // revenue shares; tiny OLS over the month panel.
    "qjv_hhi_trend" -> Q(
      fn = (s, dir) => {
        val mb = t(s, dir, "lineitem")
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .select(expr("year(o_orderdate) * 12 + month(o_orderdate) - 1")
            .cast("long").as("m"), col("p_brand").as("brand"),
            col("l_extendedprice").cast("decimal(18,2)").as("v"))
          .groupBy("m", "brand").agg(sum(col("v")).as("bv"))
        val tot = mb.groupBy("m").agg(sum(col("bv")).as("tv"))
        val hhi = mb.join(tot, "m")
          .select(col("m"),
            round(col("bv").cast("double") / col("tv").cast("double"), 9)
              .as("sh"))
          .groupBy("m")
          .agg(round(sum(round(col("sh") * col("sh"), 12)
            .cast("decimal(28,12)")).cast("double") * lit(10000.0), 9)
            .as("hhi"))
          .localCheckpoint(eager = false)
        val base = hhi.agg(min(col("m")).as("m0"))
        val idx = hhi.crossJoin(broadcast(base))
          .select((col("m") - col("m0") + 1).as("tt"), col("hhi"))
        val mm = idx.agg(count(lit(1)).as("n"), sum(col("tt")).as("st"),
          sum(g9(col("hhi"))).as("sh"),
          sum(col("tt") * col("tt")).as("stt"),
          sum(round(col("tt").cast("double") * col("hhi"), 6)
            .cast("decimal(28,6)")).as("sth"))
        mm.select(col("n").as("n_months"),
            round(col("sh").cast("double") / col("n").cast("double"), 6)
              .as("mean_hhi"),
            (round((col("n").cast("double") *
              expr("CAST(CAST(sth AS STRING) AS DOUBLE)") -
              col("st").cast("double") * col("sh").cast("double")) /
              (col("n").cast("double") * col("stt").cast("double") -
                col("st").cast("double") * col("st").cast("double")), 6)
              + lit(0.0)).as("hhi_slope_per_month"))
      },
      oracle = Some("""
        WITH mb AS (
          SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                   AS BIGINT) AS m,
                 p_brand AS brand,
                 SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS bv
          FROM lineitem JOIN part ON l_partkey = p_partkey
          JOIN orders ON l_orderkey = o_orderkey
          GROUP BY 1, 2),
        tot AS (SELECT m, SUM(bv) AS tv FROM mb GROUP BY 1),
        hhi AS MATERIALIZED (
          SELECT mb.m,
                 ROUND(CAST(SUM(CAST(ROUND(sh * sh, 12)
                   AS DECIMAL(28,12))) AS DOUBLE)
                   * CAST(10000 AS DOUBLE), 9) AS hhi
          FROM (
            SELECT mb.m, ROUND(CAST(bv AS DOUBLE) / CAST(tv AS DOUBLE),
                     9) AS sh
            FROM mb JOIN tot ON mb.m = tot.m) mb
          GROUP BY 1),
        base AS (SELECT MIN(m) AS m0 FROM hhi),
        idx AS (
          SELECT m - m0 + 1 AS tt, hhi FROM hhi CROSS JOIN base),
        mm AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(tt) AS BIGINT) AS st,
                 SUM(CAST(ROUND(hhi, 9) AS DECIMAL(20,9))) AS sh,
                 CAST(SUM(tt * tt) AS BIGINT) AS stt,
                 SUM(CAST(ROUND(CAST(tt AS DOUBLE) * hhi, 6)
                   AS DECIMAL(28,6))) AS sth
          FROM idx)
        SELECT n AS n_months,
               ROUND(CAST(sh AS DOUBLE) / CAST(n AS DOUBLE), 6)
                 AS mean_hhi,
               ROUND((CAST(n AS DOUBLE)
                 * CAST(CAST(sth AS VARCHAR) AS DOUBLE)
                 - CAST(st AS DOUBLE) * CAST(sh AS DOUBLE)) /
                 (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
                   - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS hhi_slope_per_month
        FROM mm""")),

    // Double jeopardy (Ehrenberg's law): small brands are punished
    // twice — fewer buyers AND lower purchase frequency per buyer.
    // Frequency regressed on ln penetration across the 25 brands,
    // with the smallest- and largest-brand fitted frequencies shown —
    // the empirical regularity (with qig's duplication law) that
    // brand-growth strategy debates keep rediscovering. ln link;
    // integer buyer/purchase counts; 9-grid moments.
    "qjw_double_jeopardy" -> Q(
      fn = (s, dir) => {
        val bb = t(s, dir, "lineitem")
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("p_brand").as("brand"))
          .agg(countDistinct(col("o_custkey")).as("buyers"),
            countDistinct(col("o_orderkey")).as("purchases"))
        val nAll = t(s, dir, "orders")
          .select(col("o_custkey")).distinct().agg(count(lit(1)).as("nu"))
        val pts = bb.crossJoin(broadcast(nAll))
          .select(col("brand"),
            round(log(col("buyers").cast("double") /
              col("nu").cast("double")), 9).as("lpen"),
            round(col("purchases").cast("double") /
              col("buyers").cast("double"), 9).as("freq"))
          .localCheckpoint(eager = false)
        val mm = pts.agg(count(lit(1)).as("n"),
          sum(g9(col("lpen"))).as("sx"), sum(g9(col("freq"))).as("sy"),
          sum(g9(round(col("lpen") * col("freq"), 9))).as("sxy"),
          sum(g9(round(col("lpen") * col("lpen"), 9))).as("sxx"),
          min(col("lpen")).as("xmin"), max(col("lpen")).as("xmax"))
        mm.withColumn("b", (col("n").cast("double") *
            col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double")) /
            (col("n").cast("double") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")))
          .withColumn("a", (col("sy").cast("double") -
            col("b") * col("sx").cast("double")) / col("n").cast("double"))
          .select(col("n").as("n_brands"),
            (round(col("b"), 6) + lit(0.0)).as("freq_on_lnpen_slope"),
            round(col("a") + col("b") * col("xmin"), 6)
              .as("fitted_freq_smallest"),
            round(col("a") + col("b") * col("xmax"), 6)
              .as("fitted_freq_largest"),
            when(col("b") > 0, "double_jeopardy_holds")
              .otherwise("anomalous").as("verdict"))
      },
      oracle = Some("""
        WITH bb AS (
          SELECT p_brand AS brand,
                 CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS buyers,
                 CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS purchases
          FROM lineitem JOIN part ON l_partkey = p_partkey
          JOIN orders ON l_orderkey = o_orderkey
          GROUP BY 1),
        nall AS (
          SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS nu
          FROM orders),
        pts AS MATERIALIZED (
          SELECT brand,
                 ROUND(ln(CAST(buyers AS DOUBLE) / CAST(nu AS DOUBLE)),
                   9) AS lpen,
                 ROUND(CAST(purchases AS DOUBLE)
                   / CAST(buyers AS DOUBLE), 9) AS freq
          FROM bb CROSS JOIN nall),
        mm AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(ROUND(lpen, 9) AS DECIMAL(20,9))) AS sx,
                 SUM(CAST(ROUND(freq, 9) AS DECIMAL(20,9))) AS sy,
                 SUM(CAST(ROUND(lpen * freq, 9) AS DECIMAL(20,9)))
                   AS sxy,
                 SUM(CAST(ROUND(lpen * lpen, 9) AS DECIMAL(20,9)))
                   AS sxx,
                 MIN(lpen) AS xmin, MAX(lpen) AS xmax
          FROM pts),
        f AS (
          SELECT n, xmin, xmax, b,
                 (CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE))
                   / CAST(n AS DOUBLE) AS a
          FROM (
            SELECT *, (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
                 (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b
            FROM mm))
        SELECT n AS n_brands,
               ROUND(b, 6) + CAST(0 AS DOUBLE) AS freq_on_lnpen_slope,
               ROUND(a + b * xmin, 6) AS fitted_freq_smallest,
               ROUND(a + b * xmax, 6) AS fitted_freq_largest,
               CASE WHEN b > 0 THEN 'double_jeopardy_holds'
                 ELSE 'anomalous' END AS verdict
        FROM f""")),

    // Birthday-collision audit of the engine's own hash machinery:
    // customer keys md5-bucketed into 2²⁰ slots, observed colliding
    // PAIRS vs the birthday expectation C(n,2)/B — every banded-dedup
    // and LSH path upstream assumes this hash spreads like uniform
    // randomness; this measures it. Pure integer bucket arithmetic
    // (rule 12 hex prefix), one expectation ratio.
    "qjx_birthday_collisions" -> Q(
      fn = (s, dir) => {
        val h = t(s, dir, "customer")
          .select((conv(substring(md5(col("c_custkey").cast("string")),
            1, 12), 16, 10).cast("long") % 1048576L).as("b"))
        val n0 = h.agg(count(lit(1)).as("n"))
        val coll = h.groupBy("b").agg(count(lit(1)).as("c"))
          .agg(sum(expr("c * (c - 1) div 2")).as("obs_pairs"),
            sum(when(col("c") > 1, 1L).otherwise(0L))
              .as("buckets_with_collisions"))
        coll.crossJoin(broadcast(n0))
          .select(col("n").as("n_keys"),
            col("obs_pairs"), col("buckets_with_collisions"),
            round(col("n").cast("double") * (col("n") - 1).cast("double") /
              (lit(2.0) * lit(1048576.0)), 6).as("expected_pairs"),
            (round(col("obs_pairs").cast("double") /
              (col("n").cast("double") * (col("n") - 1).cast("double") /
                (lit(2.0) * lit(1048576.0))), 6) + lit(0.0))
              .as("obs_to_expected"))
      },
      oracle = Some("""
        WITH h AS (
          SELECT CAST('0x' || substr(md5(CAST(c_custkey AS VARCHAR)),
                   1, 12) AS BIGINT) % 1048576 AS b
          FROM customer),
        n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM h),
        coll AS (
          SELECT CAST(SUM(c * (c - 1) // 2) AS BIGINT) AS obs_pairs,
                 CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS buckets_with_collisions
          FROM (SELECT b, CAST(COUNT(*) AS BIGINT) AS c
                FROM h GROUP BY 1))
        SELECT n AS n_keys, obs_pairs, buckets_with_collisions,
               ROUND(CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)
                 / (CAST(2 AS DOUBLE) * CAST(1048576 AS DOUBLE)), 6)
                 AS expected_pairs,
               ROUND(CAST(obs_pairs AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE)
                   / (CAST(2 AS DOUBLE) * CAST(1048576 AS DOUBLE))), 6)
                 + CAST(0 AS DOUBLE) AS obs_to_expected
        FROM coll CROSS JOIN n0""")),

    // A/A negative control for the experiment stack: the CONTROL arm
    // split by a second independent hash bit (user_id div 2 parity),
    // conversion difference + pooled z — a "significant" A/A effect
    // means the assignment, the metric, or the test machinery is
    // broken, and every q7b/q7c/qbm/qhc readout is suspect. The
    // calibration run every experimentation platform schedules.
    // Integer rates; one pooled z.
    "qjy_aa_test" -> Q(
      fn = (s, dir) => {
        val u = t(s, dir, "events")
          .groupBy("user_id")
          .agg(max(when(col("event_type") === "purchase", 1L)
            .otherwise(0L)).as("cv"))
          .filter(col("user_id") % 2 === 0) // control arm only
          .select(expr("(user_id div 2) % 2").cast("int").as("aa"),
            col("cv"))
        val m = u.groupBy("aa")
          .agg(count(lit(1)).as("n"), sum(col("cv")).as("k"))
        m.agg(max(when(col("aa") === 0, col("n"))).as("n0"),
            max(when(col("aa") === 0, col("k"))).as("k0"),
            max(when(col("aa") === 1, col("n"))).as("n1"),
            max(when(col("aa") === 1, col("k"))).as("k1"))
          .withColumn("p0", col("k0").cast("double") /
            col("n0").cast("double"))
          .withColumn("p1", col("k1").cast("double") /
            col("n1").cast("double"))
          .withColumn("pp", (col("k0") + col("k1")).cast("double") /
            (col("n0") + col("n1")).cast("double"))
          // degenerate pooled variance (everyone or no one converts):
          // no detectable difference is possible — z = 0 by convention
          .withColumn("zden", col("pp") * (lit(1.0) - col("pp")) *
            (lit(1.0) / col("n0").cast("double") +
             lit(1.0) / col("n1").cast("double")))
          .withColumn("z", when(col("zden") > 0,
            (col("p1") - col("p0")) / sqrt(col("zden")))
            .otherwise(lit(0.0)))
          .select(col("n0"), col("n1"),
            round(col("p0"), 6).as("rate_a1"),
            round(col("p1"), 6).as("rate_a2"),
            (round(col("p1") - col("p0"), 6) + lit(0.0)).as("diff"),
            (round(col("z"), 6) + lit(0.0)).as("z"),
            when(abs(col("z")) > lit(1.96), "BROKEN_machinery")
              .otherwise("calibrated").as("verdict"))
      },
      oracle = Some("""
        WITH u AS (
          SELECT CAST((user_id // 2) % 2 AS INT) AS aa,
                 CAST(MAX(CASE WHEN event_type = 'purchase'
                   THEN 1 ELSE 0 END) AS BIGINT) AS cv
          FROM events
          GROUP BY user_id HAVING user_id % 2 = 0),
        m AS (
          SELECT aa, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(cv) AS BIGINT) AS k
          FROM u GROUP BY 1),
        w AS (
          SELECT MAX(CASE WHEN aa = 0 THEN n END) AS n0,
                 MAX(CASE WHEN aa = 0 THEN k END) AS k0,
                 MAX(CASE WHEN aa = 1 THEN n END) AS n1,
                 MAX(CASE WHEN aa = 1 THEN k END) AS k1
          FROM m),
        f AS (
          SELECT n0, n1, p0, p1,
                 CASE WHEN pp * (CAST(1 AS DOUBLE) - pp)
                   * (CAST(1 AS DOUBLE) / CAST(n0 AS DOUBLE)
                     + CAST(1 AS DOUBLE) / CAST(n1 AS DOUBLE)) > 0
                   THEN (p1 - p0) / SQRT(pp * (CAST(1 AS DOUBLE) - pp)
                     * (CAST(1 AS DOUBLE) / CAST(n0 AS DOUBLE)
                       + CAST(1 AS DOUBLE) / CAST(n1 AS DOUBLE)))
                   ELSE CAST(0 AS DOUBLE) END AS z
          FROM (
            SELECT n0, n1, k0, k1,
                   CAST(k0 AS DOUBLE) / CAST(n0 AS DOUBLE) AS p0,
                   CAST(k1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
                   CAST(k0 + k1 AS DOUBLE) / CAST(n0 + n1 AS DOUBLE)
                     AS pp
            FROM w))
        SELECT n0, n1,
               ROUND(p0, 6) AS rate_a1,
               ROUND(p1, 6) AS rate_a2,
               ROUND(p1 - p0, 6) + CAST(0 AS DOUBLE) AS diff,
               ROUND(z, 6) + CAST(0 AS DOUBLE) AS z,
               CASE WHEN ABS(z) > CAST(1.96 AS DOUBLE)
                 THEN 'BROKEN_machinery' ELSE 'calibrated' END
                 AS verdict
        FROM f""")),

    // Capacity what-if: the qhv Erlang-B blocking curve re-run at
    // +20% offered load, side by side — "can today's s servers absorb
    // next quarter's demand, and where does the blocking knee move" —
    // the scenario read a capacity review actually asks for. Same
    // path-carrying recursion fold at both loads; division links.
    "qjz_capacity_scenario" -> Q(
      fn = (s, dir) => {
        val a0 = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(expr("unix_millis(ts) div 3600000").as("hr"))
          .agg(count(lit(1)).as("c"))
          .agg(round(sum(col("c")).cast("double") /
            count(lit(1)).cast("double"), 9).as("a"))
          .withColumn("a2", round(lit(1.2) * col("a"), 9))
        def foldExpr(load: String) =
          s"""slice(aggregate(sequence(1, 10),
             |  array(cast(1.0 as double)),
             |  (acc, s) -> concat(acc, array(round(
             |    $load * element_at(acc, -1) /
             |    (cast(s as double) + $load * element_at(acc, -1)), 9)))),
             |  2, 10)""".stripMargin
        val path = a0.select(col("a"), col("a2"),
          expr(foldExpr("a")).as("b1"), expr(foldExpr("a2")).as("b2"))
        path.select(col("a"), col("a2"),
            posexplode(col("b1")).as(Seq("pos", "bb1")))
          .join(path.select(posexplode(col("b2")).as(Seq("pos2", "bb2"))),
            col("pos") === col("pos2"))
          .select((col("pos") + 1).cast("int").as("servers"),
            round(col("a"), 6).as("load_now"),
            round(col("a2"), 6).as("load_plus20"),
            round(col("bb1"), 6).as("blocking_now"),
            round(col("bb2"), 6).as("blocking_plus20"),
            (round(col("bb2") - col("bb1"), 6) + lit(0.0))
              .as("blocking_delta"))
          .orderBy("servers")
      },
      oracle = Some("""
        WITH a0 AS (
          SELECT a, ROUND(CAST(1.2 AS DOUBLE) * a, 9) AS a2
          FROM (
            SELECT ROUND(CAST(SUM(c) AS DOUBLE)
                     / CAST(COUNT(*) AS DOUBLE), 9) AS a
            FROM (SELECT epoch_ms(ts) // 3600000 AS hr,
                         CAST(COUNT(*) AS BIGINT) AS c
                  FROM events WHERE event_type = 'purchase'
                  GROUP BY 1))),
        paths AS (
          SELECT a, a2,
                 list_reduce(
                   list_prepend([CAST(0 AS DOUBLE), CAST(1 AS DOUBLE)],
                     list_transform(range(1, 11),
                       s -> [CAST(s AS DOUBLE), CAST(0 AS DOUBLE)])),
                   (acc, e) -> acc ||
                     [e[1], ROUND(a * acc[-1] / (e[1] + a * acc[-1]),
                        9)]) AS st1,
                 list_reduce(
                   list_prepend([CAST(0 AS DOUBLE), CAST(1 AS DOUBLE)],
                     list_transform(range(1, 11),
                       s -> [CAST(s AS DOUBLE), CAST(0 AS DOUBLE)])),
                   (acc, e) -> acc ||
                     [e[1], ROUND(a2 * acc[-1] / (e[1] + a2 * acc[-1]),
                        9)]) AS st2
          FROM a0),
        rows_b AS (
          SELECT a, a2, unnest(range(1, 11)) AS s, st1, st2 FROM paths)
        SELECT CAST(s AS INT) AS servers,
               ROUND(a, 6) AS load_now,
               ROUND(a2, 6) AS load_plus20,
               ROUND(st1[2 * s + 2], 6) AS blocking_now,
               ROUND(st2[2 * s + 2], 6) AS blocking_plus20,
               ROUND(st2[2 * s + 2] - st1[2 * s + 2], 6)
                 + CAST(0 AS DOUBLE) AS blocking_delta
        FROM rows_b ORDER BY servers""")),

    // Fano factor across window scales: Var/Mean of purchase counts in
    // 1-, 2-, 4- and 7-day windows — 1 for a Poisson process at every
    // scale, RISING with window size under clustering (the count-
    // domain reading qii's Allan variance gives for amplitudes). Full
    // windows only; integer counts and power sums throughout.
    "qk0_fano_factor" -> Q(
      fn = (s, dir) => {
        val x = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(expr("unix_millis(ts) div 86400000").as("day"))
          .agg(count(lit(1)).as("c"))
          .select((row_number().over(Window.orderBy("day")) - 1)
            .cast("long").as("i"), col("c"))
          .localCheckpoint(eager = false)
        val taus = Seq(1, 2, 4, 7)
        taus.map { tau =>
          x.withColumn("blk", expr(s"i div $tau"))
            .groupBy("blk")
            .agg(count(lit(1)).as("m"), sum(col("c")).as("w"))
            .filter(col("m") === tau)
            .agg(count(lit(1)).as("n_windows"),
              sum(col("w")).as("sw"), sum(col("w") * col("w")).as("sww"))
            .select(lit(tau).as("window_days"), col("n_windows"),
              round(col("sw").cast("double") /
                col("n_windows").cast("double"), 6).as("mean_count"),
              (round(((col("n_windows").cast("double") *
                col("sww").cast("double") -
                col("sw").cast("double") * col("sw").cast("double")) /
                (col("n_windows").cast("double") *
                  (col("n_windows") - 1).cast("double"))) /
                (col("sw").cast("double") /
                  col("n_windows").cast("double")), 6) + lit(0.0))
                .as("fano_factor"))
        }.reduce(_ unionAll _).orderBy("window_days")
      },
      oracle = Some({
        def one(tau: Int) =
          s"""SELECT CAST($tau AS INT) AS window_days,
             |  CAST(COUNT(*) AS BIGINT) AS n_windows,
             |  ROUND(CAST(SUM(w) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
             |    6) AS mean_count,
             |  ROUND(((CAST(COUNT(*) AS DOUBLE) * CAST(SUM(w * w)
             |      AS DOUBLE)
             |    - CAST(SUM(w) AS DOUBLE) * CAST(SUM(w) AS DOUBLE))
             |    / (CAST(COUNT(*) AS DOUBLE)
             |      * CAST(COUNT(*) - 1 AS DOUBLE)))
             |    / (CAST(SUM(w) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)),
             |    6) + CAST(0 AS DOUBLE) AS fano_factor
             |FROM (
             |  SELECT i // $tau AS blk, CAST(SUM(c) AS BIGINT) AS w
             |  FROM x GROUP BY 1 HAVING COUNT(*) = $tau)""".stripMargin
        s"""
        WITH d0 AS (
          SELECT epoch_ms(ts) // 86400000 AS day,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        x AS MATERIALIZED (
          SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) - 1 AS BIGINT)
                   AS i, c
          FROM d0)
        ${Seq(1, 2, 4, 7).map(one).mkString("\n        UNION ALL\n        ")}
        ORDER BY window_days"""
      })),

    // Hour × day-of-week activity heatmap with each type's peak cell —
    // the operational staffing grid every dashboard leads with,
    // emitted as the top-3 cells per event type (the full 168-cell
    // grid is the pivot q8j already shapes; the TOP cells are what a
    // staffing decision reads). Exact integer counts; struct-argmax
    // ranking with deterministic tiebreaks.
    "qk1_peak_cells" -> Q(
      fn = (s, dir) => {
        val g = t(s, dir, "events")
          .groupBy(col("event_type"),
            ((expr("unix_millis(ts) div 86400000") + 4) % 7).cast("int")
              .as("dow"),
            (expr("unix_millis(ts) div 3600000") % 24).cast("int")
              .as("hod"))
          .agg(count(lit(1)).as("c"))
        val tot = g.groupBy("event_type").agg(sum(col("c")).as("tt"))
        g.join(tot, "event_type")
          .withColumn("rk", row_number().over(
            Window.partitionBy("event_type")
              .orderBy(col("c").desc, col("dow"), col("hod"))))
          .filter(col("rk") <= 3)
          .select(col("event_type"), col("rk").cast("int").as("rank"),
            col("dow"), col("hod"), col("c").as("n_events"),
            round(col("c").cast("double") / col("tt").cast("double"), 6)
              .as("cell_share"))
          .orderBy("event_type", "rank")
      },
      oracle = Some("""
        WITH g AS (
          SELECT event_type,
                 CAST((epoch_ms(ts) // 86400000 + 4) % 7 AS INT) AS dow,
                 CAST((epoch_ms(ts) // 3600000) % 24 AS INT) AS hod,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2, 3),
        tot AS (
          SELECT event_type, CAST(SUM(c) AS BIGINT) AS tt
          FROM g GROUP BY 1),
        ranked AS (
          SELECT g.event_type, dow, hod, c, tt,
                 ROW_NUMBER() OVER (PARTITION BY g.event_type
                   ORDER BY c DESC, dow, hod) AS rk
          FROM g JOIN tot ON g.event_type = tot.event_type)
        SELECT event_type, CAST(rk AS INT) AS rank, dow, hod,
               c AS n_events,
               ROUND(CAST(c AS DOUBLE) / CAST(tt AS DOUBLE), 6)
                 AS cell_share
        FROM ranked WHERE rk <= 3
        ORDER BY event_type, rank""")),

    // Line-position effect: does a line's POSITION within its order
    // predict its value? Mean value and quantity by l_linenumber with
    // the per-position share of order-total — a nonzero slope here is
    // a data-generation artifact detector (real commerce has no
    // reason for line 1 to be pricier), the forensic sibling of qfc's
    // digit tests. Exact DECIMAL means per position.
    "qk2_position_effect" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem")
          .select(col("l_linenumber").cast("int").as("pos"),
            col("l_extendedprice").cast("decimal(18,2)").as("v"),
            col("l_quantity").cast("decimal(18,2)").as("q"))
        val m = li.groupBy("pos")
          .agg(count(lit(1)).as("n_lines"), sum(col("v")).as("sv"),
            sum(col("q")).as("sq"))
        val tot = m.agg(sum(col("sv")).as("tv"))
        m.crossJoin(broadcast(tot))
          .select(col("pos").as("line_position"), col("n_lines"),
            round(col("sv").cast("double") / col("n_lines").cast("double"),
              6).as("mean_value"),
            round(col("sq").cast("double") / col("n_lines").cast("double"),
              6).as("mean_quantity"),
            round(col("sv").cast("double") / col("tv").cast("double"), 6)
              .as("revenue_share"))
          .orderBy("line_position")
      },
      oracle = Some("""
        WITH li AS (
          SELECT CAST(l_linenumber AS INT) AS pos,
                 CAST(l_extendedprice AS DECIMAL(18,2)) AS v,
                 CAST(l_quantity AS DECIMAL(18,2)) AS q
          FROM lineitem),
        m AS (
          SELECT pos, CAST(COUNT(*) AS BIGINT) AS n_lines,
                 SUM(v) AS sv, SUM(q) AS sq
          FROM li GROUP BY 1),
        tot AS (SELECT SUM(sv) AS tv FROM m)
        SELECT pos AS line_position, n_lines,
               ROUND(CAST(sv AS DOUBLE) / CAST(n_lines AS DOUBLE), 6)
                 AS mean_value,
               ROUND(CAST(sq AS DOUBLE) / CAST(n_lines AS DOUBLE), 6)
                 AS mean_quantity,
               ROUND(CAST(sv AS DOUBLE) / CAST(tv AS DOUBLE), 6)
                 AS revenue_share
        FROM m CROSS JOIN tot
        ORDER BY line_position""")),

    // Durbin–Watson on the daily-revenue trend residuals: DW =
    // Σ(eₜ−eₜ₋₁)²/Σe² with the canonical <1.5 / >2.5 bands — THE
    // textbook first look at serial correlation (qi6 then fixes it,
    // qg6 then robustifies around it; DW is the stat referees ask for
    // by name). 9-grid residuals; exact DECIMAL quadratic sums.
    "qk3_durbin_watson" -> Q(
      fn = (s, dir) => {
        val y = dailyRevenueM(s, dir)
          .withColumn("tt",
            row_number().over(Window.orderBy("day")).cast("long"))
        val m1 = y.agg(count(lit(1)).as("n"), sum(col("tt")).as("st"),
          sum(col("ym")).as("sy"), sum(col("tt") * col("tt")).as("stt"),
          sum(col("tt").cast("decimal(18,2)") * col("ym")).as("sty"))
        val ab = m1.select(col("n"),
            ((col("n").cast("double") *
              expr("CAST(CAST(sty AS STRING) AS DOUBLE)") -
              col("st").cast("double") * col("sy").cast("double")) /
              (col("n").cast("double") * col("stt").cast("double") -
                col("st").cast("double") * col("st").cast("double")))
              .as("b"), col("st"), col("sy"))
          .select(col("n"), col("b"),
            ((col("sy").cast("double") - col("b") * col("st").cast("double"))
              / col("n").cast("double")).as("a"))
        val res = y.crossJoin(broadcast(ab))
          .select(col("tt"),
            round(col("ym").cast("double") -
              (col("a") + col("b") * col("tt").cast("double")), 9).as("e"))
        val w = Window.orderBy("tt")
        val lagged = res.withColumn("ep", lag("e", 1).over(w))
        lagged.agg(count(lit(1)).as("n"),
            sum(g9(round(col("e") * col("e"), 9))).as("see"),
            sum(when(col("ep").isNotNull,
              g9(round((col("e") - col("ep")) * (col("e") - col("ep")),
                9))).otherwise(lit(0).cast("decimal(20,9)"))).as("sdd"))
          .select(col("n").as("n_obs"),
            round(col("sdd").cast("double") / col("see").cast("double"),
              6).as("durbin_watson"),
            when(col("sdd").cast("double") / col("see").cast("double") <
              lit(1.5), "positive_autocorrelation")
              .when(col("sdd").cast("double") / col("see").cast("double")
                > lit(2.5), "negative_autocorrelation")
              .otherwise("no_evidence").as("verdict"))
      },
      oracle = Some(s"""
        WITH yd AS ($dailyRevenueMSql),
        y AS MATERIALIZED (
          SELECT CAST(ROW_NUMBER() OVER (ORDER BY day) AS BIGINT) AS tt,
                 ym
          FROM yd),
        m1 AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(tt) AS BIGINT) AS st, SUM(ym) AS sy,
                 CAST(SUM(tt * tt) AS BIGINT) AS stt,
                 SUM(CAST(tt AS DECIMAL(18,2)) * ym) AS sty
          FROM y),
        ab AS (
          SELECT n, b,
                 (CAST(sy AS DOUBLE) - b * CAST(st AS DOUBLE))
                   / CAST(n AS DOUBLE) AS a
          FROM (
            SELECT n, st, sy,
                   (CAST(n AS DOUBLE)
                     * CAST(CAST(sty AS VARCHAR) AS DOUBLE)
                     - CAST(st AS DOUBLE) * CAST(sy AS DOUBLE)) /
                   (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
                     - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)) AS b
            FROM m1)),
        res AS (
          SELECT tt, ROUND(CAST(ym AS DOUBLE)
                   - (a + b * CAST(tt AS DOUBLE)), 9) AS e
          FROM y CROSS JOIN ab),
        lagged AS (
          SELECT e, LAG(e) OVER (ORDER BY tt) AS ep FROM res),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(ROUND(e * e, 9) AS DECIMAL(20,9))) AS see,
                 SUM(CASE WHEN ep IS NOT NULL
                   THEN CAST(ROUND((e - ep) * (e - ep), 9)
                     AS DECIMAL(20,9))
                   ELSE CAST(0 AS DECIMAL(20,9)) END) AS sdd
          FROM lagged)
        SELECT n AS n_obs,
               ROUND(CAST(sdd AS DOUBLE) / CAST(see AS DOUBLE), 6)
                 AS durbin_watson,
               CASE WHEN CAST(sdd AS DOUBLE) / CAST(see AS DOUBLE)
                   < CAST(1.5 AS DOUBLE) THEN 'positive_autocorrelation'
                 WHEN CAST(sdd AS DOUBLE) / CAST(see AS DOUBLE)
                   > CAST(2.5 AS DOUBLE) THEN 'negative_autocorrelation'
                 ELSE 'no_evidence' END AS verdict
        FROM agg""")),

    // Breusch–Pagan heteroskedasticity test: squared residuals of the
    // order-value-on-line-count regression regressed back on the
    // regressor, LM = n·R² ~ χ²(1) — does error VARIANCE grow with
    // order size (it should: more lines, more variance), in which case
    // every naive OLS standard error upstream is wrong and qg6's HAC
    // was necessary, not decorative. 9-grid residuals; squares on the
    // 9-grid (same-factor products); DECIMAL moment images.
    "qk4_breusch_pagan" -> Q(
      fn = (s, dir) => {
        val feats = t(s, dir, "lineitem").groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("x"))
        val base = t(s, dir, "orders")
          .join(feats, col("o_orderkey") === col("l_orderkey"))
          .select(col("x").cast("long").as("x"),
            (col("o_totalprice").cast("decimal(18,2)") / lit(1000000))
              .cast("decimal(18,8)").as("y"))
          .localCheckpoint(eager = false)
        val m1 = base.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
          sum(col("x").cast("decimal(18,2)") * col("y")).as("sxy"))
        val ab = m1.select(col("n"),
            ((col("n").cast("double") *
              expr("CAST(CAST(sxy AS STRING) AS DOUBLE)") -
              col("sx").cast("double") * col("sy").cast("double")) /
              (col("n").cast("double") * col("sxx").cast("double") -
                col("sx").cast("double") * col("sx").cast("double")))
              .as("b"), col("sx"), col("sy"))
          .select(col("n"), col("b"),
            ((col("sy").cast("double") - col("b") * col("sx").cast("double"))
              / col("n").cast("double")).as("a"))
        val e2 = base.crossJoin(broadcast(ab))
          .select(col("x"),
            round(col("y").cast("double") -
              (col("a") + col("b") * col("x").cast("double")), 9).as("e"))
          .select(col("x"), round(col("e") * col("e"), 9).as("u"))
        val m2 = e2.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(g9(col("u"))).as("su"),
          sum(col("x") * col("x")).as("sxx"),
          sum(g9(round(col("x").cast("double") * col("u"), 9))).as("sxu"),
          sum(g9(round(col("u") * col("u"), 9))).as("suu"))
        m2.select(col("n"),
            col("n").cast("double").as("nd"),
            col("sx").cast("double").as("sxd"),
            col("su").cast("double").as("sud"),
            col("sxu").cast("double").as("sxud"),
            col("sxx").cast("double").as("sxxd"),
            col("suu").cast("double").as("suud"))
          .select(col("n").as("n_obs"),
            (round((col("nd") * col("sxud") - col("sxd") * col("sud")) /
              (col("nd") * col("sxxd") - col("sxd") * col("sxd")), 9)
              + lit(0.0)).as("e2_slope"),
            (round(col("nd") *
              (col("nd") * col("sxud") - col("sxd") * col("sud")) *
              (col("nd") * col("sxud") - col("sxd") * col("sud")) /
              ((col("nd") * col("sxxd") - col("sxd") * col("sxd")) *
               (col("nd") * col("suud") - col("sud") * col("sud"))), 6)
              + lit(0.0)).as("bp_lm"),
            when(col("nd") *
              (col("nd") * col("sxud") - col("sxd") * col("sud")) *
              (col("nd") * col("sxud") - col("sxd") * col("sud")) /
              ((col("nd") * col("sxxd") - col("sxd") * col("sxd")) *
               (col("nd") * col("suud") - col("sud") * col("sud"))) >
              lit(3.841459), "heteroskedastic")
              .otherwise("homoskedastic").as("verdict"))
      },
      oracle = Some("""
        WITH feats AS (
          SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS x
          FROM lineitem GROUP BY 1),
        base AS MATERIALIZED (
          SELECT x,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) / 1000000
                   AS DECIMAL(18,8)) AS y
          FROM orders JOIN feats ON o_orderkey = l_orderkey),
        m1 AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx, SUM(y) AS sy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx,
                 SUM(CAST(x AS DECIMAL(18,2)) * y) AS sxy
          FROM base),
        ab AS (
          SELECT n, b,
                 (CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE))
                   / CAST(n AS DOUBLE) AS a
          FROM (
            SELECT n, sx, sy,
                   (CAST(n AS DOUBLE)
                     * CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
                   (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b
            FROM m1)),
        e2 AS (
          SELECT x, ROUND(e * e, 9) AS u
          FROM (
            SELECT x, ROUND(CAST(y AS DOUBLE)
                     - (a + b * CAST(x AS DOUBLE)), 9) AS e
            FROM base CROSS JOIN ab)),
        m2 AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 SUM(CAST(ROUND(u, 9) AS DECIMAL(20,9))) AS su,
                 CAST(SUM(x * x) AS BIGINT) AS sxx,
                 SUM(CAST(ROUND(CAST(x AS DOUBLE) * u, 9)
                   AS DECIMAL(20,9))) AS sxu,
                 SUM(CAST(ROUND(u * u, 9) AS DECIMAL(20,9))) AS suu
          FROM e2),
        d AS (
          SELECT n, CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
                 CAST(su AS DOUBLE) AS sud, CAST(sxu AS DOUBLE) AS sxud,
                 CAST(sxx AS DOUBLE) AS sxxd, CAST(suu AS DOUBLE) AS suud
          FROM m2)
        SELECT n AS n_obs,
               ROUND((nd * sxud - sxd * sud) / (nd * sxxd - sxd * sxd),
                 9) + CAST(0 AS DOUBLE) AS e2_slope,
               ROUND(nd * (nd * sxud - sxd * sud)
                 * (nd * sxud - sxd * sud)
                 / ((nd * sxxd - sxd * sxd) * (nd * suud - sud * sud)),
                 6) + CAST(0 AS DOUBLE) AS bp_lm,
               CASE WHEN nd * (nd * sxud - sxd * sud)
                 * (nd * sxud - sxd * sud)
                 / ((nd * sxxd - sxd * sxd) * (nd * suud - sud * sud))
                 > CAST(3.841459 AS DOUBLE) THEN 'heteroskedastic'
                 ELSE 'homoskedastic' END AS verdict
        FROM d""")),

    // Ramsey RESET for functional form: does adding ŷ² to the
    // order-value-on-line-count regression buy significant SSE
    // reduction? F = (SSE₁−SSE₂)/(SSE₂/(n−3)) via the qgs Cramer
    // machinery on (x, ŷ²) — a significant RESET means the LINEAR
    // spec is wrong (curvature, interactions) and every slope reading
    // on it is a misspecification artifact. 9-grid fitted values
    // (ŷ² is a same-factor product, 9-safe); exact DECIMAL moments.
    "qk5_ramsey_reset" -> Q(
      fn = (s, dir) => {
        val feats = t(s, dir, "lineitem").groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("x"))
        val base = t(s, dir, "orders")
          .join(feats, col("o_orderkey") === col("l_orderkey"))
          .select(col("x").cast("long").as("x"),
            (col("o_totalprice").cast("decimal(18,2)") / lit(1000000))
              .cast("decimal(18,8)").as("y"))
          .localCheckpoint(eager = false)
        val m1 = base.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
          sum(col("x").cast("decimal(18,2)") * col("y")).as("sxy"),
          sum((col("y") * col("y")).cast("decimal(38,16)")).as("syy"))
        val ab = m1.select(col("n"), col("sy"), col("sxy"), col("syy"),
            ((col("n").cast("double") *
              expr("CAST(CAST(sxy AS STRING) AS DOUBLE)") -
              col("sx").cast("double") * col("sy").cast("double")) /
              (col("n").cast("double") * col("sxx").cast("double") -
                col("sx").cast("double") * col("sx").cast("double")))
              .as("b"), col("sx"))
          .select(col("n"), col("b"), col("sy"), col("sxy"), col("syy"),
            ((col("sy").cast("double") - col("b") * col("sx").cast("double"))
              / col("n").cast("double")).as("a"))
          .localCheckpoint(eager = false)
        val aug = base.crossJoin(broadcast(ab.select(col("a"), col("b"))))
          .withColumn("yh", round(col("a") + col("b") *
            col("x").cast("double"), 9))
          .select(col("x"), col("y"),
            round(col("yh") * col("yh"), 9).as("z"))
        // centered 2-regressor solve, the qgs Cramer shapes
        val mm = aug.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(g9(col("z"))).as("sz"), sum(col("y")).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(g9(round(col("x").cast("double") * col("z"), 9))).as("sxz"),
          sum(g9(round(col("z") * col("z"), 9))).as("szz"),
          sum(col("x").cast("decimal(18,2)") * col("y")).as("sxy"),
          sum((col("z").cast("decimal(18,9)") * col("y"))
            .cast("decimal(38,17)")).as("szy"))
        val cv = mm.select(col("n"),
            col("n").cast("double").as("nd"),
            col("sx").cast("double").as("sxd"),
            col("sz").cast("double").as("szd"),
            col("sy").cast("double").as("syd"),
            col("sxx").cast("double").as("sxxd"),
            col("sxz").cast("double").as("sxzd"),
            col("szz").cast("double").as("szzd"),
            expr("CAST(CAST(sxy AS STRING) AS DOUBLE)").as("sxyd"),
            expr("CAST(CAST(szy AS STRING) AS DOUBLE)").as("szyd"))
          .select(col("n"), col("nd"), col("syd"), col("sxyd"),
            col("szyd"),
            (col("nd") * col("sxzd") - col("sxd") * col("szd")).as("cxz"),
            (col("nd") * col("sxyd") - col("sxd") * col("syd")).as("cxy"),
            (col("nd") * col("szyd") - col("szd") * col("syd")).as("czy"),
            (col("nd") * col("sxxd") - col("sxd") * col("sxd")).as("vx"),
            (col("nd") * col("szzd") - col("szd") * col("szd")).as("vz"),
            col("sxd"), col("szd"))
        val fit2 = cv.select(col("n"), col("nd"), col("syd"),
            col("sxyd"), col("szyd"), col("sxd"), col("szd"),
            ((col("vz") * col("cxy") - col("cxz") * col("czy")) /
              (col("vx") * col("vz") - col("cxz") * col("cxz"))).as("b1"),
            ((col("vx") * col("czy") - col("cxz") * col("cxy")) /
              (col("vx") * col("vz") - col("cxz") * col("cxz"))).as("b2"))
          .withColumn("b0", (col("syd") - col("b1") * col("sxd") -
            col("b2") * col("szd")) / col("nd"))
        val sses = fit2.crossJoin(broadcast(ab.select(
            col("a").as("a1"), col("b").as("bb1"),
            expr("CAST(CAST(syy AS STRING) AS DOUBLE)").as("syyd"),
            col("sy").cast("double").as("sy1"),
            expr("CAST(CAST(sxy AS STRING) AS DOUBLE)").as("sxy1"))))
          .withColumn("sse1", col("syyd") - col("a1") * col("sy1") -
            col("bb1") * col("sxy1"))
          .withColumn("sse2", col("syyd") - col("b0") * col("syd") -
            col("b1") * col("sxyd") - col("b2") * col("szyd"))
        sses.select(col("n").as("n_obs"),
            (round(col("b2"), 6) + lit(0.0)).as("yhat_sq_coef"),
            round(col("sse1"), 6).as("sse_linear"),
            round(col("sse2"), 6).as("sse_reset"),
            (round((col("sse1") - col("sse2")) /
              (col("sse2") / (col("nd") - lit(3.0))), 6) + lit(0.0))
              .as("reset_f"),
            when((col("sse1") - col("sse2")) /
              (col("sse2") / (col("nd") - lit(3.0))) > lit(3.841459),
              "misspecified").otherwise("linear_ok").as("verdict"))
      },
      oracle = Some("""
        WITH feats AS (
          SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS x
          FROM lineitem GROUP BY 1),
        base AS MATERIALIZED (
          SELECT x,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) / 1000000
                   AS DECIMAL(18,8)) AS y
          FROM orders JOIN feats ON o_orderkey = l_orderkey),
        m1 AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx, SUM(y) AS sy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx,
                 SUM(CAST(x AS DECIMAL(18,2)) * y) AS sxy,
                 SUM(CAST(y AS DECIMAL(19,8)) * CAST(y AS DECIMAL(19,8)))
                   AS syy
          FROM base),
        ab AS MATERIALIZED (
          SELECT n, b, sy, sxy, syy, sx,
                 (CAST(sy AS DOUBLE) - b * CAST(sx AS DOUBLE))
                   / CAST(n AS DOUBLE) AS a
          FROM (
            SELECT n, sx, sy, sxy, syy,
                   (CAST(n AS DOUBLE)
                     * CAST(CAST(sxy AS VARCHAR) AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
                   (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS b
            FROM m1)),
        aug AS MATERIALIZED (
          SELECT x, y, ROUND(yh * yh, 9) AS z
          FROM (
            SELECT x, y,
                   ROUND(a + b * CAST(x AS DOUBLE), 9) AS yh
            FROM base CROSS JOIN ab)),
        mm AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 SUM(CAST(ROUND(z, 9) AS DECIMAL(20,9))) AS sz,
                 SUM(y) AS sy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx,
                 SUM(CAST(ROUND(CAST(x AS DOUBLE) * z, 9)
                   AS DECIMAL(20,9))) AS sxz,
                 SUM(CAST(ROUND(z * z, 9) AS DECIMAL(20,9))) AS szz,
                 SUM(CAST(x AS DECIMAL(18,2)) * y) AS sxy,
                 SUM(CAST(CAST(z AS DECIMAL(18,9)) * y
                   AS DECIMAL(38,17))) AS szy
          FROM aug),
        cv AS (
          SELECT n, nd, syd, sxyd, szyd, sxd, szd,
                 nd * sxzd - sxd * szd AS cxz,
                 nd * sxyd - sxd * syd AS cxy,
                 nd * szyd - szd * syd AS czy,
                 nd * sxxd - sxd * sxd AS vx,
                 nd * szzd - szd * szd AS vz
          FROM (
            SELECT n, CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
                   CAST(sz AS DOUBLE) AS szd, CAST(sy AS DOUBLE) AS syd,
                   CAST(sxx AS DOUBLE) AS sxxd,
                   CAST(sxz AS DOUBLE) AS sxzd,
                   CAST(szz AS DOUBLE) AS szzd,
                   CAST(CAST(sxy AS VARCHAR) AS DOUBLE) AS sxyd,
                   CAST(CAST(szy AS VARCHAR) AS DOUBLE) AS szyd
            FROM mm)),
        fit2 AS (
          SELECT n, nd, syd, sxyd, szyd,
                 (vz * cxy - cxz * czy) / (vx * vz - cxz * cxz) AS b1,
                 (vx * czy - cxz * cxy) / (vx * vz - cxz * cxz) AS b2,
                 sxd, szd
          FROM cv),
        fit2b AS (
          SELECT *, (syd - b1 * sxd - b2 * szd) / nd AS b0
          FROM fit2),
        sses AS (
          SELECT fit2b.*,
                 CAST(CAST(ab.syy AS VARCHAR) AS DOUBLE)
                   - ab.a * CAST(ab.sy AS DOUBLE)
                   - ab.b * CAST(CAST(ab.sxy AS VARCHAR) AS DOUBLE)
                   AS sse1,
                 CAST(CAST(ab.syy AS VARCHAR) AS DOUBLE)
                   - b0 * syd - b1 * sxyd - b2 * szyd AS sse2
          FROM fit2b CROSS JOIN ab)
        SELECT n AS n_obs,
               ROUND(b2, 6) + CAST(0 AS DOUBLE) AS yhat_sq_coef,
               ROUND(sse1, 6) AS sse_linear,
               ROUND(sse2, 6) AS sse_reset,
               ROUND((sse1 - sse2) / (sse2 / (nd - CAST(3 AS DOUBLE))),
                 6) + CAST(0 AS DOUBLE) AS reset_f,
               CASE WHEN (sse1 - sse2)
                 / (sse2 / (nd - CAST(3 AS DOUBLE)))
                 > CAST(3.841459 AS DOUBLE) THEN 'misspecified'
                 ELSE 'linear_ok' END AS verdict
        FROM sses""")),

    // Attribution-model disagreement card: each converting user's
    // pre-purchase touches credited under FOUR rules at once —
    // first-touch, last-touch, linear, and U-shaped (40/20/40) — per
    // channel (event type), side by side. The uncomfortable table
    // every marketing-mix meeting runs on: when the models disagree
    // 2×, the budget fight is about the RULE, not the data (q5x and
    // q98 each report one rule; this is the confrontation view).
    // Exact dyadic U-weights over integer touch positions.
    "qk6_attribution_compare" -> Q(
      fn = (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            unix_millis(col("ts")).as("ms"), col("event_id"))
        val conv = e.filter(col("event_type") === "purchase")
          .groupBy("user_id").agg(min(col("ms")).as("pms"))
        val touches = e.join(conv, "user_id")
          .filter(col("ms") < col("pms") &&
            col("event_type") =!= "purchase")
          .withColumn("pos", row_number().over(
            Window.partitionBy("user_id")
              .orderBy(col("ms"), col("event_id"))))
          .withColumn("npos", count(lit(1)).over(
            Window.partitionBy("user_id")))
        // U-shaped: 0.4 first, 0.4 last, 0.2 split over middles;
        // single-touch journeys take 1.0, two-touch 0.5/0.5
        val credited = touches
          .withColumn("w_first",
            when(col("pos") === 1, lit(1.0)).otherwise(lit(0.0)))
          .withColumn("w_last",
            when(col("pos") === col("npos"), lit(1.0)).otherwise(lit(0.0)))
          .withColumn("w_linear",
            round(lit(1.0) / col("npos").cast("double"), 9))
          .withColumn("w_u",
            when(col("npos") === 1, lit(1.0))
              .when(col("npos") === 2, lit(0.5))
              .when(col("pos") === 1 || col("pos") === col("npos"),
                lit(0.4))
              .otherwise(round(lit(0.2) /
                (col("npos") - 2).cast("double"), 9)))
        credited.groupBy("event_type")
          .agg(count(lit(1)).as("n_touches"),
            round(sum(g9(col("w_first"))).cast("double"), 6)
              .as("credit_first"),
            round(sum(g9(col("w_last"))).cast("double"), 6)
              .as("credit_last"),
            round(sum(g9(col("w_linear"))).cast("double"), 6)
              .as("credit_linear"),
            round(sum(g9(col("w_u"))).cast("double"), 6).as("credit_u"))
          .orderBy("event_type")
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id, event_type, epoch_ms(ts) AS ms, event_id
          FROM events),
        conv AS (
          SELECT user_id, MIN(ms) AS pms FROM e
          WHERE event_type = 'purchase' GROUP BY 1),
        touches AS MATERIALIZED (
          SELECT e.user_id, event_type,
                 ROW_NUMBER() OVER (PARTITION BY e.user_id
                   ORDER BY ms, event_id) AS pos,
                 COUNT(*) OVER (PARTITION BY e.user_id) AS npos
          FROM e JOIN conv ON e.user_id = conv.user_id
          WHERE ms < pms AND event_type <> 'purchase'),
        credited AS (
          SELECT event_type,
                 CASE WHEN pos = 1 THEN CAST(1 AS DOUBLE)
                   ELSE CAST(0 AS DOUBLE) END AS w_first,
                 CASE WHEN pos = npos THEN CAST(1 AS DOUBLE)
                   ELSE CAST(0 AS DOUBLE) END AS w_last,
                 ROUND(CAST(1 AS DOUBLE) / CAST(npos AS DOUBLE), 9)
                   AS w_linear,
                 CASE WHEN npos = 1 THEN CAST(1 AS DOUBLE)
                      WHEN npos = 2 THEN CAST(0.5 AS DOUBLE)
                      WHEN pos = 1 OR pos = npos THEN CAST(0.4 AS DOUBLE)
                      ELSE ROUND(CAST(0.2 AS DOUBLE)
                        / CAST(npos - 2 AS DOUBLE), 9) END AS w_u
          FROM touches)
        SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_touches,
               ROUND(CAST(SUM(CAST(ROUND(w_first, 9) AS DECIMAL(20,9)))
                 AS DOUBLE), 6) AS credit_first,
               ROUND(CAST(SUM(CAST(ROUND(w_last, 9) AS DECIMAL(20,9)))
                 AS DOUBLE), 6) AS credit_last,
               ROUND(CAST(SUM(CAST(ROUND(w_linear, 9) AS DECIMAL(20,9)))
                 AS DOUBLE), 6) AS credit_linear,
               ROUND(CAST(SUM(CAST(ROUND(w_u, 9) AS DECIMAL(20,9)))
                 AS DOUBLE), 6) AS credit_u
        FROM credited GROUP BY 1 ORDER BY 1""")),

    // Rise/fall asymmetry of daily revenue: mean up-step vs mean
    // down-step, their count split, and the longest run each way —
    // "slow climbs, sharp drops" (or the reverse) is a SHAPE fact the
    // variance can't express and drawdown (qfj) only half-sees.
    // Exact DECIMAL steps; runs via the islands device on the sign
    // sequence.
    "qk7_rise_fall_asymmetry" -> Q(
      fn = (s, dir) => {
        val y = dailyRevenueM(s, dir)
        val w = Window.orderBy("day")
        val steps = y.withColumn("prev", lag("ym", 1).over(w))
          .filter(col("prev").isNotNull)
          .select(col("day"), (col("ym") - col("prev")).as("d"))
          .withColumn("sgn", when(col("d") > 0, 1)
            .when(col("d") < 0, -1).otherwise(0))
          .localCheckpoint(eager = false)
        val runs = steps
          .withColumn("psgn", lag("sgn", 1).over(Window.orderBy("day")))
          .withColumn("brk", when(col("psgn").isNull ||
            col("sgn") =!= col("psgn"), 1L).otherwise(0L))
          .withColumn("rid", sum(col("brk")).over(
            Window.orderBy("day").rowsBetween(
              Window.unboundedPreceding, 0)))
          .groupBy("rid", "sgn").agg(count(lit(1)).as("len"))
        val runAgg = runs.agg(
          max(when(col("sgn") === 1, col("len"))).as("longest_rise"),
          max(when(col("sgn") === -1, col("len"))).as("longest_fall"))
        steps.agg(
            sum(when(col("sgn") === 1, 1L).otherwise(0L)).as("n_up"),
            sum(when(col("sgn") === -1, 1L).otherwise(0L)).as("n_down"),
            sum(when(col("sgn") === 1, col("d"))
              .otherwise(lit(0).cast("decimal(18,8)"))).as("sum_up"),
            sum(when(col("sgn") === -1, -col("d"))
              .otherwise(lit(0).cast("decimal(18,8)"))).as("sum_down"))
          .crossJoin(broadcast(runAgg))
          .select(col("n_up"), col("n_down"),
            round(col("sum_up").cast("double") /
              col("n_up").cast("double"), 6).as("mean_rise_m"),
            round(col("sum_down").cast("double") /
              col("n_down").cast("double"), 6).as("mean_fall_m"),
            (round(col("sum_down").cast("double") /
              col("n_down").cast("double") /
              (col("sum_up").cast("double") /
                col("n_up").cast("double")), 6) + lit(0.0))
              .as("fall_to_rise_ratio"),
            col("longest_rise"), col("longest_fall"))
      },
      oracle = Some(s"""
        WITH yd AS ($dailyRevenueMSql),
        steps AS MATERIALIZED (
          SELECT day, d,
                 CASE WHEN d > 0 THEN 1 WHEN d < 0 THEN -1 ELSE 0 END
                   AS sgn
          FROM (SELECT day, ym - LAG(ym) OVER (ORDER BY day) AS d
                FROM yd)
          WHERE d IS NOT NULL),
        runs AS (
          SELECT rid, sgn, CAST(COUNT(*) AS BIGINT) AS len
          FROM (
            SELECT day, sgn,
                   SUM(brk) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
                     AS rid
            FROM (
              SELECT day, sgn,
                     CASE WHEN LAG(sgn) OVER (ORDER BY day) IS NULL
                       OR sgn <> LAG(sgn) OVER (ORDER BY day)
                       THEN 1 ELSE 0 END AS brk
              FROM steps))
          GROUP BY 1, 2),
        runagg AS (
          SELECT MAX(CASE WHEN sgn = 1 THEN len END) AS longest_rise,
                 MAX(CASE WHEN sgn = -1 THEN len END) AS longest_fall
          FROM runs),
        agg AS (
          SELECT CAST(SUM(CASE WHEN sgn = 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_up,
                 CAST(SUM(CASE WHEN sgn = -1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_down,
                 SUM(CASE WHEN sgn = 1 THEN d
                   ELSE CAST(0 AS DECIMAL(18,8)) END) AS sum_up,
                 SUM(CASE WHEN sgn = -1 THEN -d
                   ELSE CAST(0 AS DECIMAL(18,8)) END) AS sum_down
          FROM steps)
        SELECT n_up, n_down,
               ROUND(CAST(sum_up AS DOUBLE) / CAST(n_up AS DOUBLE), 6)
                 AS mean_rise_m,
               ROUND(CAST(sum_down AS DOUBLE) / CAST(n_down AS DOUBLE),
                 6) AS mean_fall_m,
               ROUND(CAST(sum_down AS DOUBLE) / CAST(n_down AS DOUBLE)
                 / (CAST(sum_up AS DOUBLE) / CAST(n_up AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS fall_to_rise_ratio,
               longest_rise, longest_fall
        FROM agg CROSS JOIN runagg""")),

    // Syntetos–Boylan demand classification: per part, the average
    // inter-demand interval (ADI, in months) × the demand-size CV²,
    // cut at the published 1.32 / 0.49 boundaries into smooth /
    // intermittent / erratic / lumpy — the classifier that DECIDES
    // the forecasting method (smooth → SES/Holt, intermittent →
    // qbe's Croston, lumpy → don't forecast, buffer). Quadrant counts
    // plus share of spend in each class. Exact integer months;
    // 9-grid size moments.
    "qk8_demand_classes" -> Q(
      fn = (s, dir) => {
        val pm = t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .select(col("l_partkey").as("pk"),
            expr("year(o_orderdate) * 12 + month(o_orderdate) - 1")
              .cast("long").as("m"),
            col("l_quantity").cast("decimal(18,2)").as("q"),
            col("l_extendedprice").cast("decimal(18,2)").as("v"))
          .groupBy("pk", "m")
          .agg(sum(col("q")).as("dq"), sum(col("v")).as("dv"))
        val span = pm.agg((max(col("m")) - min(col("m")) + 1)
          .as("n_months"))
        val parts = pm.groupBy("pk")
          .agg(count(lit(1)).as("nd"), sum(col("dv")).as("spend"),
            sum(g9(col("dq").cast("double"))).as("sq"),
            sum(g9(round(col("dq").cast("double") *
              col("dq").cast("double"), 9))).as("sqq"))
          .filter(col("nd") >= 5)
          .crossJoin(broadcast(span))
          .withColumn("adi", round(col("n_months").cast("double") /
            col("nd").cast("double"), 9))
          .withColumn("mu", col("sq").cast("double") /
            col("nd").cast("double"))
          .withColumn("cv2", round(
            ((col("nd").cast("double") * col("sqq").cast("double") -
              col("sq").cast("double") * col("sq").cast("double")) /
              (col("nd").cast("double") * (col("nd") - 1).cast("double")))
              / (col("mu") * col("mu")), 9))
          .withColumn("cls",
            when(col("adi") < 1.32 && col("cv2") < 0.49, "smooth")
              .when(col("adi") >= 1.32 && col("cv2") < 0.49,
                "intermittent")
              .when(col("adi") < 1.32, "erratic")
              .otherwise("lumpy"))
        val tot = parts.agg(count(lit(1)).as("np"),
          sum(col("spend")).as("sp"))
        parts.groupBy("cls")
          .agg(count(lit(1)).as("n_parts"), sum(col("spend")).as("cspend"),
            round(sum(g9(col("adi"))).cast("double") /
              count(lit(1)).cast("double"), 6).as("avg_adi"),
            round(sum(g9(col("cv2"))).cast("double") /
              count(lit(1)).cast("double"), 6).as("avg_cv2"))
          .crossJoin(broadcast(tot))
          .select(col("cls").as("demand_class"), col("n_parts"),
            round(col("n_parts").cast("double") / col("np").cast("double"),
              6).as("part_share"),
            round(col("cspend").cast("double") / col("sp").cast("double"),
              6).as("spend_share"),
            col("avg_adi"), col("avg_cv2"))
          .orderBy("demand_class")
      },
      oracle = Some("""
        WITH pm AS (
          SELECT l_partkey AS pk,
                 CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1
                   AS BIGINT) AS m,
                 SUM(CAST(l_quantity AS DECIMAL(18,2))) AS dq,
                 SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS dv
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          GROUP BY 1, 2),
        span AS (
          SELECT CAST(MAX(m) - MIN(m) + 1 AS BIGINT) AS n_months
          FROM pm),
        parts AS MATERIALIZED (
          SELECT pk, nd, spend,
                 ROUND(CAST(n_months AS DOUBLE) / CAST(nd AS DOUBLE), 9)
                   AS adi,
                 ROUND(((CAST(nd AS DOUBLE) * CAST(sqq AS DOUBLE)
                     - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE))
                   / (CAST(nd AS DOUBLE) * CAST(nd - 1 AS DOUBLE)))
                   / ((CAST(sq AS DOUBLE) / CAST(nd AS DOUBLE))
                     * (CAST(sq AS DOUBLE) / CAST(nd AS DOUBLE))), 9)
                   AS cv2
          FROM (
            SELECT pk, CAST(COUNT(*) AS BIGINT) AS nd,
                   SUM(dv) AS spend,
                   SUM(CAST(ROUND(CAST(dq AS DOUBLE), 9)
                     AS DECIMAL(20,9))) AS sq,
                   SUM(CAST(ROUND(CAST(dq AS DOUBLE)
                     * CAST(dq AS DOUBLE), 9) AS DECIMAL(20,9))) AS sqq
            FROM pm GROUP BY 1 HAVING COUNT(*) >= 5)
          CROSS JOIN span),
        classed AS (
          SELECT *, CASE
                 WHEN adi < CAST(1.32 AS DOUBLE)
                   AND cv2 < CAST(0.49 AS DOUBLE) THEN 'smooth'
                 WHEN adi >= CAST(1.32 AS DOUBLE)
                   AND cv2 < CAST(0.49 AS DOUBLE) THEN 'intermittent'
                 WHEN adi < CAST(1.32 AS DOUBLE) THEN 'erratic'
                 ELSE 'lumpy' END AS cls
          FROM parts),
        tot AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS np, SUM(spend) AS sp
          FROM classed)
        SELECT cls AS demand_class,
               CAST(COUNT(*) AS BIGINT) AS n_parts,
               ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(np AS DOUBLE), 6)
                 AS part_share,
               ROUND(CAST(SUM(spend) AS DOUBLE) / CAST(sp AS DOUBLE), 6)
                 AS spend_share,
               ROUND(CAST(SUM(CAST(ROUND(adi, 9) AS DECIMAL(20,9)))
                 AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS avg_adi,
               ROUND(CAST(SUM(CAST(ROUND(cv2, 9) AS DECIMAL(20,9)))
                 AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS avg_cv2
        FROM classed CROSS JOIN tot
        GROUP BY cls, np, sp ORDER BY demand_class""")),

    // Exceedance correlation: views↔purchases daily correlation over
    // ALL days vs over the days where views exceed their 75th
    // percentile — correlations that STRENGTHEN in the tail mean the
    // system couples exactly when capacity is scarce (the finance
    // "correlations go to 1 in a crisis" effect, read operationally).
    // Exact order-statistic threshold; integer moment sums on both
    // panels.
    "qk9_exceedance_correlation" -> Q(
      fn = (s, dir) => {
        val d = t(s, dir, "events")
          .groupBy(expr("unix_millis(ts) div 86400000").as("day"))
          .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("x"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("y"))
          .localCheckpoint(eager = false)
        val n0 = d.agg(count(lit(1)).as("n"))
        val thr = d.crossJoin(broadcast(n0))
          .withColumn("rk", row_number().over(
            Window.orderBy(col("x"), col("day"))))
          .filter(col("rk") === expr("(n * 750 + 999) div 1000"))
          .select(col("x").as("u"))
        def corrOf(df: DataFrame, nm: String): DataFrame = df
          .agg(count(lit(1)).as(s"n_$nm"),
            sum(col("x")).as("sx"), sum(col("y")).as("sy"),
            sum(col("x") * col("y")).as("sxy"),
            sum(col("x") * col("x")).as("sxx"),
            sum(col("y") * col("y")).as("syy"))
          .select(col(s"n_$nm"),
            (round((col(s"n_$nm").cast("double") *
              col("sxy").cast("double") -
              col("sx").cast("double") * col("sy").cast("double")) /
              (sqrt(col(s"n_$nm").cast("double") *
                col("sxx").cast("double") -
                col("sx").cast("double") * col("sx").cast("double")) *
               sqrt(col(s"n_$nm").cast("double") *
                col("syy").cast("double") -
                col("sy").cast("double") * col("sy").cast("double"))),
              6) + lit(0.0)).as(s"corr_$nm"))
        val all = corrOf(d, "all")
        val tail = corrOf(d.crossJoin(broadcast(thr))
          .filter(col("x") > col("u")), "tail")
        all.crossJoin(broadcast(tail))
          .crossJoin(broadcast(thr))
          .select(col("n_all"), col("corr_all"),
            col("n_tail"), col("corr_tail"),
            col("u").as("view_threshold"),
            (round(col("corr_tail") - col("corr_all"), 6) + lit(0.0))
              .as("tail_minus_all"))
      },
      oracle = Some("""
        WITH d AS MATERIALIZED (
          SELECT epoch_ms(ts) // 86400000 AS day,
                 CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0
                   END) AS BIGINT) AS x,
                 CAST(SUM(CASE WHEN event_type = 'purchase'
                   THEN 1 ELSE 0 END) AS BIGINT) AS y
          FROM events GROUP BY 1),
        n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM d),
        thr AS (
          SELECT x AS u FROM (
            SELECT x, ROW_NUMBER() OVER (ORDER BY x, day) AS rk, n
            FROM d CROSS JOIN n0)
          WHERE rk = (n * 750 + 999) // 1000),
        ca AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_all,
                 ROUND((CAST(COUNT(*) AS DOUBLE) * CAST(SUM(x * y)
                     AS DOUBLE)
                   - CAST(SUM(x) AS DOUBLE) * CAST(SUM(y) AS DOUBLE))
                   / (SQRT(CAST(COUNT(*) AS DOUBLE) * CAST(SUM(x * x)
                       AS DOUBLE)
                     - CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE))
                   * SQRT(CAST(COUNT(*) AS DOUBLE) * CAST(SUM(y * y)
                       AS DOUBLE)
                     - CAST(SUM(y) AS DOUBLE) * CAST(SUM(y) AS DOUBLE))),
                   6) + CAST(0 AS DOUBLE) AS corr_all
          FROM d),
        ct AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_tail,
                 ROUND((CAST(COUNT(*) AS DOUBLE) * CAST(SUM(x * y)
                     AS DOUBLE)
                   - CAST(SUM(x) AS DOUBLE) * CAST(SUM(y) AS DOUBLE))
                   / (SQRT(CAST(COUNT(*) AS DOUBLE) * CAST(SUM(x * x)
                       AS DOUBLE)
                     - CAST(SUM(x) AS DOUBLE) * CAST(SUM(x) AS DOUBLE))
                   * SQRT(CAST(COUNT(*) AS DOUBLE) * CAST(SUM(y * y)
                       AS DOUBLE)
                     - CAST(SUM(y) AS DOUBLE) * CAST(SUM(y) AS DOUBLE))),
                   6) + CAST(0 AS DOUBLE) AS corr_tail
          FROM d CROSS JOIN thr WHERE x > u)
        SELECT n_all, corr_all, n_tail, corr_tail,
               u AS view_threshold,
               ROUND(corr_tail - corr_all, 6) + CAST(0 AS DOUBLE)
                 AS tail_minus_all
        FROM ca CROSS JOIN ct CROSS JOIN thr""")),

    // Price–volume–mix bridge per brand across the period cut:
    // ΔRevenue = Δq·p₀ (volume) + q₀·Δp (price) + Δq·Δp (cross), with
    // the totals row proving EXACT additivity — the finance bridge
    // every revenue review walks (qhj's LMDI is the log-exact
    // three-factor on totals; PVM is the per-brand additive ledger the
    // CFO actually reads). Unit prices on the 4-grid DECIMAL; every
    // component an exact DECIMAL product.
    "qka_pvm_bridge" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem")
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .select(col("p_brand").as("brand"),
            when(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"),
              1).otherwise(0).as("per"),
            col("l_quantity").cast("decimal(18,2)").as("q"),
            col("l_extendedprice").cast("decimal(18,2)").as("v"))
          .groupBy("brand", "per")
          .agg(sum(col("q")).as("qt"), sum(col("v")).as("vt"))
        val wide = li.groupBy("brand")
          .agg(max(when(col("per") === 0, col("qt"))).as("q0"),
            max(when(col("per") === 1, col("qt"))).as("q1"),
            max(when(col("per") === 0, col("vt"))).as("v0"),
            max(when(col("per") === 1, col("vt"))).as("v1"))
          .filter(col("q0").isNotNull && col("q1").isNotNull)
          .withColumn("p0", round(col("v0").cast("double") /
            col("q0").cast("double"), 4).cast("decimal(14,4)"))
          .withColumn("p1", round(col("v1").cast("double") /
            col("q1").cast("double"), 4).cast("decimal(14,4)"))
          .withColumn("vol_eff",
            ((col("q1") - col("q0")) * col("p0")).cast("decimal(24,6)"))
          .withColumn("price_eff",
            (col("q0") * (col("p1") - col("p0"))).cast("decimal(24,6)"))
          .withColumn("cross_eff",
            ((col("q1") - col("q0")) * (col("p1") - col("p0")))
              .cast("decimal(24,6)"))
          .localCheckpoint(eager = false)
        wide.agg(count(lit(1)).as("n_brands"),
            sum(col("vol_eff")).as("sv"), sum(col("price_eff")).as("sp"),
            sum(col("cross_eff")).as("sc"),
            sum((col("q1").cast("decimal(18,2)") * col("p1"))
              .cast("decimal(24,6)") -
              (col("q0").cast("decimal(18,2)") * col("p0"))
                .cast("decimal(24,6)")).as("dtotal"))
          .select(col("n_brands"),
            (round(col("sv").cast("double"), 2) + lit(0.0))
              .as("volume_effect"),
            (round(col("sp").cast("double"), 2) + lit(0.0))
              .as("price_effect"),
            (round(col("sc").cast("double"), 2) + lit(0.0))
              .as("cross_effect"),
            (round(col("dtotal").cast("double"), 2) + lit(0.0))
              .as("delta_revenue_px"),
            (round((col("sv") + col("sp") + col("sc") - col("dtotal"))
              .cast("double"), 6) + lit(0.0)).as("additivity_residual"))
      },
      oracle = Some("""
        WITH li AS (
          SELECT p_brand AS brand,
                 CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01'
                   THEN 1 ELSE 0 END AS per,
                 SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qt,
                 SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS vt
          FROM lineitem JOIN part ON l_partkey = p_partkey
          JOIN orders ON l_orderkey = o_orderkey
          GROUP BY 1, 2),
        wide AS MATERIALIZED (
          SELECT brand, q0, q1,
                 CAST(ROUND(CAST(v0 AS DOUBLE) / CAST(q0 AS DOUBLE), 4)
                   AS DECIMAL(14,4)) AS p0,
                 CAST(ROUND(CAST(v1 AS DOUBLE) / CAST(q1 AS DOUBLE), 4)
                   AS DECIMAL(14,4)) AS p1
          FROM (
            SELECT brand,
                   MAX(CASE WHEN per = 0 THEN qt END) AS q0,
                   MAX(CASE WHEN per = 1 THEN qt END) AS q1,
                   MAX(CASE WHEN per = 0 THEN vt END) AS v0,
                   MAX(CASE WHEN per = 1 THEN vt END) AS v1
            FROM li GROUP BY 1
            HAVING MAX(CASE WHEN per = 0 THEN qt END) IS NOT NULL
               AND MAX(CASE WHEN per = 1 THEN qt END) IS NOT NULL)),
        eff AS (
          SELECT brand,
                 CAST((q1 - q0) * p0 AS DECIMAL(24,6)) AS vol_eff,
                 CAST(q0 * (p1 - p0) AS DECIMAL(24,6)) AS price_eff,
                 CAST((q1 - q0) * (p1 - p0) AS DECIMAL(24,6))
                   AS cross_eff,
                 CAST(CAST(q1 AS DECIMAL(18,2)) * p1 AS DECIMAL(24,6))
                   - CAST(CAST(q0 AS DECIMAL(18,2)) * p0
                     AS DECIMAL(24,6)) AS dt
          FROM wide)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_brands,
               ROUND(CAST(SUM(vol_eff) AS DOUBLE), 2)
                 + CAST(0 AS DOUBLE) AS volume_effect,
               ROUND(CAST(SUM(price_eff) AS DOUBLE), 2)
                 + CAST(0 AS DOUBLE) AS price_effect,
               ROUND(CAST(SUM(cross_eff) AS DOUBLE), 2)
                 + CAST(0 AS DOUBLE) AS cross_effect,
               ROUND(CAST(SUM(dt) AS DOUBLE), 2) + CAST(0 AS DOUBLE)
                 AS delta_revenue_px,
               ROUND(CAST(SUM(vol_eff) + SUM(price_eff) + SUM(cross_eff)
                 - SUM(dt) AS DOUBLE), 6) + CAST(0 AS DOUBLE)
                 AS additivity_residual
        FROM eff""")),

    // Missingness-mechanism probe: the NULL rate of `value` per event
    // type with the independence G-test — MCAR (missing completely at
    // random) predicts one flat rate; a significant G says missingness
    // DEPENDS on the event type, and any complete-case analysis
    // upstream (every AVG(value)) carries selection bias. Integer
    // null/total counts; ln-link G terms (the qdb device) with
    // zero-cell guards.
    "qkb_missingness" -> Q(
      fn = (s, dir) => {
        val m = t(s, dir, "events")
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(when(col("value").isNull, 1L).otherwise(0L)).as("miss"))
          .localCheckpoint(eager = false)
        val tot = m.agg(sum(col("n")).as("nt"), sum(col("miss")).as("mt"))
        val g = m.crossJoin(broadcast(tot))
          .withColumn("e1", col("n").cast("double") *
            col("mt").cast("double") / col("nt").cast("double"))
          .withColumn("e0", col("n").cast("double") *
            (col("nt") - col("mt")).cast("double") /
            col("nt").cast("double"))
          .withColumn("t1", when(col("miss") > 0,
            g9(round(col("miss").cast("double") *
              log(col("miss").cast("double") / col("e1")), 9)))
            .otherwise(lit(0).cast("decimal(20,9)")))
          .withColumn("t0", when(col("n") - col("miss") > 0,
            g9(round((col("n") - col("miss")).cast("double") *
              log((col("n") - col("miss")).cast("double") / col("e0")),
              9))).otherwise(lit(0).cast("decimal(20,9)")))
        val gstat = g.agg((sum(col("t1")) + sum(col("t0"))).as("gsum"),
          count(lit(1)).as("k"))
        val rates = m.crossJoin(broadcast(tot))
          .select(col("event_type"), col("n"), col("miss"),
            round(col("miss").cast("double") / col("n").cast("double"), 6)
              .as("null_rate"))
        rates.crossJoin(broadcast(gstat))
          .select(col("event_type"), col("n"), col("miss"),
            col("null_rate"),
            (round(lit(2.0) * col("gsum").cast("double"), 6) + lit(0.0))
              .as("g_statistic"),
            when(lit(2.0) * col("gsum").cast("double") > lit(9.487729),
              "not_mcar").otherwise("mcar_plausible").as("verdict"))
          .orderBy("event_type")
      },
      oracle = Some("""
        WITH m AS MATERIALIZED (
          SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CASE WHEN value IS NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS miss
          FROM events GROUP BY 1),
        tot AS (
          SELECT CAST(SUM(n) AS BIGINT) AS nt,
                 CAST(SUM(miss) AS BIGINT) AS mt
          FROM m),
        g AS (
          SELECT CASE WHEN miss > 0 THEN
                   CAST(ROUND(CAST(miss AS DOUBLE)
                     * ln(CAST(miss AS DOUBLE)
                       / (CAST(n AS DOUBLE) * CAST(mt AS DOUBLE)
                         / CAST(nt AS DOUBLE))), 9) AS DECIMAL(20,9))
                   ELSE CAST(0 AS DECIMAL(20,9)) END AS t1,
                 CASE WHEN n - miss > 0 THEN
                   CAST(ROUND(CAST(n - miss AS DOUBLE)
                     * ln(CAST(n - miss AS DOUBLE)
                       / (CAST(n AS DOUBLE) * CAST(nt - mt AS DOUBLE)
                         / CAST(nt AS DOUBLE))), 9) AS DECIMAL(20,9))
                   ELSE CAST(0 AS DECIMAL(20,9)) END AS t0
          FROM m CROSS JOIN tot),
        gstat AS (
          SELECT SUM(t1) + SUM(t0) AS gsum FROM g)
        SELECT event_type, n, miss,
               ROUND(CAST(miss AS DOUBLE) / CAST(n AS DOUBLE), 6)
                 AS null_rate,
               ROUND(CAST(2 AS DOUBLE) * CAST(gsum AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS g_statistic,
               CASE WHEN CAST(2 AS DOUBLE) * CAST(gsum AS DOUBLE)
                 > CAST(9.487729 AS DOUBLE) THEN 'not_mcar'
                 ELSE 'mcar_plausible' END AS verdict
        FROM m CROSS JOIN tot CROSS JOIN gstat
        ORDER BY event_type""")),

    // Trading-day effect: monthly revenue regressed on the month's
    // CALENDAR weekday count — the unrolled 6-term remainder formula
    // computes weekdays(month) from pure epoch-day integer arithmetic
    // identically in both engines (no date-library dependence) — the
    // adjustment official statistics applies before ANY month-over-
    // month comparison (a 23-weekday March beats a 20-weekday
    // February by calendar alone). Slope = revenue per weekday.
    "qkc_trading_days" -> Q(
      fn = (s, dir) => {
        val mrev = t(s, dir, "orders")
          .groupBy(expr("year(o_orderdate)").cast("long").as("yr"),
            expr("month(o_orderdate)").cast("long").as("mo"))
          .agg((sum(col("o_totalprice").cast("decimal(18,2)")) /
            lit(1000000)).cast("decimal(18,8)").as("rev"),
            min(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP))" +
              " div 86400000 - (day(o_orderdate) - 1)")).as("d0"),
            max(expr("day(last_day(o_orderdate))")).cast("long").as("len"))
        // weekdays in [d0, d0+len): 5·(len div 7) + Σ_{j<len%7}
        // [(dow0+j) % 7 < 5], dow0 = (d0+4) % 7 (epoch day 0 = Thursday)
        val extras = (0 to 5).map(j =>
          when(expr(s"pmod(pmod(d0 + 4, 7) + $j, 7)") < 5 &&
            expr(s"len % 7") > j, 1L).otherwise(0L))
          .reduce(_ + _)
        val wd = mrev
          .withColumn("weekdays", expr("5 * (len div 7)") + extras)
          .select(col("yr"), col("mo"),
            round(col("rev").cast("double"), 9).as("y"),
            col("weekdays").cast("long").as("x"))
        val mm = wd.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
          sum(g9(col("y"))).as("sy"),
          sum(col("x") * col("x")).as("sxx"),
          sum(g9(round(col("x").cast("double") * col("y"), 9))).as("sxy"),
          sum(g9(round(col("y") * col("y"), 9))).as("syy"))
        mm.select(col("n"),
            col("n").cast("double").as("nd"),
            col("sx").cast("double").as("sxd"),
            col("sy").cast("double").as("syd"),
            col("sxy").cast("double").as("sxyd"),
            col("sxx").cast("double").as("sxxd"),
            col("syy").cast("double").as("syyd"))
          .select(col("n").as("n_months"),
            (round((col("nd") * col("sxyd") - col("sxd") * col("syd")) /
              (col("nd") * col("sxxd") - col("sxd") * col("sxd")), 6)
              + lit(0.0)).as("rev_per_weekday_m"),
            (round((col("nd") * col("sxyd") - col("sxd") * col("syd")) *
              (col("nd") * col("sxyd") - col("sxd") * col("syd")) /
              ((col("nd") * col("sxxd") - col("sxd") * col("sxd")) *
               (col("nd") * col("syyd") - col("syd") * col("syd"))), 6)
              + lit(0.0)).as("r2_trading_days"))
      },
      oracle = Some({
        val extras = (0 to 5).map(j =>
          s"CASE WHEN ((d0 + 4) % 7 + $j) % 7 < 5 AND len % 7 > $j" +
            s" THEN 1 ELSE 0 END").mkString(" + ")
        s"""
        WITH mrev AS (
          SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
                 CAST(month(o_orderdate) AS BIGINT) AS mo,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) / 1000000
                   AS DECIMAL(18,8)) AS rev,
                 CAST(MIN(epoch_ms(o_orderdate) // 86400000
                   - (day(o_orderdate) - 1)) AS BIGINT) AS d0,
                 CAST(MAX(day(last_day(o_orderdate))) AS BIGINT) AS len
          FROM orders GROUP BY 1, 2),
        wd AS (
          SELECT yr, mo, ROUND(CAST(rev AS DOUBLE), 9) AS y,
                 CAST(5 * (len // 7) + $extras AS BIGINT) AS x
          FROM mrev),
        mm AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 SUM(CAST(ROUND(y, 9) AS DECIMAL(20,9))) AS sy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx,
                 SUM(CAST(ROUND(CAST(x AS DOUBLE) * y, 9)
                   AS DECIMAL(20,9))) AS sxy,
                 SUM(CAST(ROUND(y * y, 9) AS DECIMAL(20,9))) AS syy
          FROM wd),
        d AS (
          SELECT n, CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
                 CAST(sy AS DOUBLE) AS syd, CAST(sxy AS DOUBLE) AS sxyd,
                 CAST(sxx AS DOUBLE) AS sxxd, CAST(syy AS DOUBLE) AS syyd
          FROM mm)
        SELECT n AS n_months,
               ROUND((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd),
                 6) + CAST(0 AS DOUBLE) AS rev_per_weekday_m,
               ROUND((nd * sxyd - sxd * syd) * (nd * sxyd - sxd * syd)
                 / ((nd * sxxd - sxd * sxd) * (nd * syyd - syd * syd)),
                 6) + CAST(0 AS DOUBLE) AS r2_trading_days
        FROM d"""
      })),

    // Stable-seasonality F (the X-11 presence test): one-way ANOVA of
    // daily purchase revenue BY day-of-week — is there weekly
    // seasonality AT ALL, the gate read before any seasonal machinery
    // (qj9's indices, q7r/qhq's Holt–Winters) is allowed to run on
    // the series. Between/within SS from exact DECIMAL group images;
    // the same sequential-SS discipline as qif.
    "qkd_seasonal_f" -> Q(
      fn = (s, dir) => {
        val d = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy(expr("unix_millis(ts) div 86400000").as("day"))
          .agg((sum(col("value").cast("decimal(18,2)")) / lit(1000))
            .cast("decimal(18,5)").as("y"))
          .withColumn("dow", ((col("day") + 4) % 7).cast("int"))
        val g = d.groupBy("dow")
          .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
            sum((col("y") * col("y")).cast("decimal(38,10)")).as("syy"))
        val agg = g.agg(sum(col("n")).as("nt"), sum(col("sy")).as("st"),
          sum(col("syy")).as("sst"), count(lit(1)).as("k"),
          sum(g9(round(expr(
            "CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)"),
            9))).as("qg"))
        agg.select(col("nt").as("n_days"), col("k").as("n_groups"),
            col("nt").cast("double").as("ntd"),
            col("k").cast("double").as("kd"),
            (col("qg").cast("double") -
              col("st").cast("double") * col("st").cast("double") /
              col("nt").cast("double")).as("ssb"),
            (expr("CAST(CAST(sst AS STRING) AS DOUBLE)") -
              col("qg").cast("double")).as("ssw"))
          .select(col("n_days"), col("n_groups"),
            (round(col("ssb"), 6) + lit(0.0)).as("ss_between"),
            round(col("ssw"), 6).as("ss_within"),
            (round((col("ssb") / (col("kd") - lit(1.0))) /
              (col("ssw") / (col("ntd") - col("kd"))), 6) + lit(0.0))
              .as("seasonal_f"),
            when((col("ssb") / (col("kd") - lit(1.0))) /
              (col("ssw") / (col("ntd") - col("kd"))) > lit(2.5),
              "seasonality_present").otherwise("no_stable_seasonality")
              .as("verdict"))
      },
      oracle = Some("""
        WITH d AS (
          SELECT CAST((day + 4) % 7 AS INT) AS dow, y
          FROM (
            SELECT epoch_ms(ts) // 86400000 AS day,
                   CAST(SUM(CAST(value AS DECIMAL(18,2))) / 1000
                     AS DECIMAL(18,5)) AS y
            FROM events WHERE event_type = 'purchase' GROUP BY 1)),
        g AS (
          SELECT dow, CAST(COUNT(*) AS BIGINT) AS n, SUM(y) AS sy,
                 SUM(CAST(y AS DECIMAL(19,5)) * CAST(y AS DECIMAL(19,5)))
                   AS syy
          FROM d GROUP BY 1),
        agg AS (
          SELECT CAST(SUM(n) AS BIGINT) AS nt, SUM(sy) AS st,
                 SUM(syy) AS sst, CAST(COUNT(*) AS BIGINT) AS k,
                 SUM(CAST(ROUND(CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                   / CAST(n AS DOUBLE), 9) AS DECIMAL(20,9))) AS qg
          FROM g),
        f AS (
          SELECT nt, k, CAST(nt AS DOUBLE) AS ntd, CAST(k AS DOUBLE)
                   AS kd,
                 CAST(qg AS DOUBLE) - CAST(st AS DOUBLE)
                   * CAST(st AS DOUBLE) / CAST(nt AS DOUBLE) AS ssb,
                 CAST(CAST(sst AS VARCHAR) AS DOUBLE)
                   - CAST(qg AS DOUBLE) AS ssw
          FROM agg)
        SELECT nt AS n_days, k AS n_groups,
               ROUND(ssb, 6) + CAST(0 AS DOUBLE) AS ss_between,
               ROUND(ssw, 6) AS ss_within,
               ROUND((ssb / (kd - CAST(1 AS DOUBLE)))
                 / (ssw / (ntd - kd)), 6) + CAST(0 AS DOUBLE)
                 AS seasonal_f,
               CASE WHEN (ssb / (kd - CAST(1 AS DOUBLE)))
                 / (ssw / (ntd - kd)) > CAST(2.5 AS DOUBLE)
                 THEN 'seasonality_present'
                 ELSE 'no_stable_seasonality' END AS verdict
        FROM f""")),

    // Spend-rank persistence: Spearman correlation of customer spend
    // RANKS between the two halves of the window — do the same
    // customers stay on top (persistent hierarchy) or reshuffle
    // (churning market)? The nonparametric twin of qi1's Gibrat
    // regression (which tests growth-vs-size in logs; this tests
    // ORDER preservation directly). Exact integer ranks; the classic
    // 1 − 6Σd²/(n(n²−1)) closed form.
    "qke_persistence" -> Q(
      fn = (s, dir) => {
        val sp = t(s, dir, "orders")
          .select(col("o_custkey").as("ck"),
            when(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"),
              1).otherwise(0).as("per"),
            col("o_totalprice").cast("decimal(18,2)").as("v"))
          .groupBy("ck", "per").agg(sum(col("v")).as("sp"))
        val both = sp.filter(col("per") === 0)
          .select(col("ck"), col("sp").as("s0"))
          .join(sp.filter(col("per") === 1)
            .select(col("ck").as("ck1"), col("sp").as("s1")),
            col("ck") === col("ck1"))
          .select(col("ck"), col("s0"), col("s1"))
          .localCheckpoint(eager = false)
        // two global ranks over the customer dimension — each through the
        // range-partitioned machinery (globalRowNumber is already LONG),
        // never TWO single-partition sorts back to back (r9 sweep)
        val ranked = graft.operators.ScaleOps.globalRowNumber(
          graft.operators.ScaleOps.globalRowNumber(
            both, Seq(col("s0"), col("ck")), "r0"),
          Seq(col("s1"), col("ck")), "r1")
        ranked.agg(count(lit(1)).as("n"),
            sum((col("r0") - col("r1")) * (col("r0") - col("r1")))
              .as("sd2"))
          .select(col("n").as("n_customers"),
            (round(lit(1.0) - lit(6.0) * col("sd2").cast("double") /
              (col("n").cast("double") *
                (col("n").cast("double") * col("n").cast("double") -
                  lit(1.0))), 6) + lit(0.0)).as("spearman_rho"),
            when(lit(1.0) - lit(6.0) * col("sd2").cast("double") /
              (col("n").cast("double") *
                (col("n").cast("double") * col("n").cast("double") -
                  lit(1.0))) > lit(0.5), "persistent_hierarchy")
              .otherwise("reshuffling").as("verdict"))
      },
      oracle = Some("""
        WITH sp AS (
          SELECT o_custkey AS ck,
                 CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01'
                   THEN 1 ELSE 0 END AS per,
                 SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS sp
          FROM orders GROUP BY 1, 2),
        both_p AS MATERIALIZED (
          SELECT a.ck, a.sp AS s0, b.sp AS s1
          FROM sp a JOIN sp b ON a.ck = b.ck
          WHERE a.per = 0 AND b.per = 1),
        ranked AS (
          SELECT CAST(ROW_NUMBER() OVER (ORDER BY s0, ck) AS BIGINT)
                   AS r0,
                 CAST(ROW_NUMBER() OVER (ORDER BY s1, ck) AS BIGINT)
                   AS r1
          FROM both_p),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM((r0 - r1) * (r0 - r1)) AS BIGINT) AS sd2
          FROM ranked)
        SELECT n AS n_customers,
               ROUND(CAST(1 AS DOUBLE) - CAST(6 AS DOUBLE)
                 * CAST(sd2 AS DOUBLE) / (CAST(n AS DOUBLE)
                   * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                     - CAST(1 AS DOUBLE))), 6) + CAST(0 AS DOUBLE)
                 AS spearman_rho,
               CASE WHEN CAST(1 AS DOUBLE) - CAST(6 AS DOUBLE)
                 * CAST(sd2 AS DOUBLE) / (CAST(n AS DOUBLE)
                   * (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                     - CAST(1 AS DOUBLE))) > CAST(0.5 AS DOUBLE)
                 THEN 'persistent_hierarchy' ELSE 'reshuffling' END
                 AS verdict
        FROM agg"""),
      headline = true),

    // Demand-law audit: per part (≥10 lines), the correlation between
    // its per-line unit price and quantity — economics says negative;
    // the share of parts violating it (positive correlation) is a
    // data-generation forensic (synthetic or aggregated data often
    // breaks micro demand structure). 9-grid per-part moments; the
    // share and the pooled mean correlation. Degenerate parts (zero
    // price or quantity variance) are excluded loudly via the
    // variance guard, not silently zeroed.
    "qkf_demand_law_audit" -> Q(
      fn = (s, dir) => {
        val u = t(s, dir, "lineitem")
          .select(col("l_partkey").as("pk"),
            round(col("l_extendedprice").cast("double") /
              col("l_quantity").cast("double"), 9).as("p"),
            col("l_quantity").cast("decimal(18,2)").as("q"))
        val m = u.groupBy("pk")
          .agg(count(lit(1)).as("n"),
            sum(g9(col("p"))).as("sp"),
            sum(col("q")).as("sq"),
            sum(g9(round(col("p") * col("p"), 9))).as("spp"),
            sum((col("q") * col("q")).cast("decimal(38,6)")).as("sqq"),
            sum(g9(round(col("p") * col("q").cast("double"), 9)))
              .as("spq"))
          .filter(col("n") >= 10)
          .withColumn("vp", col("n").cast("double") *
            col("spp").cast("double") -
            col("sp").cast("double") * col("sp").cast("double"))
          .withColumn("vq", col("n").cast("double") *
            expr("CAST(CAST(sqq AS STRING) AS DOUBLE)") -
            col("sq").cast("double") * col("sq").cast("double"))
          .filter(col("vp") > 0 && col("vq") > 0)
          .withColumn("r", round((col("n").cast("double") *
            col("spq").cast("double") -
            col("sp").cast("double") * col("sq").cast("double")) /
            (sqrt(col("vp")) * sqrt(col("vq"))), 9))
        m.agg(count(lit(1)).as("n_parts"),
            sum(when(col("r") > 0, 1L).otherwise(0L)).as("n_positive"),
            sum(g9(col("r"))).as("sr"))
          .select(col("n_parts"), col("n_positive"),
            round(col("n_positive").cast("double") /
              col("n_parts").cast("double"), 6).as("violation_share"),
            (round(col("sr").cast("double") /
              col("n_parts").cast("double"), 6) + lit(0.0))
              .as("mean_price_qty_corr"))
      },
      oracle = Some("""
        WITH u AS (
          SELECT l_partkey AS pk,
                 ROUND(CAST(l_extendedprice AS DOUBLE)
                   / CAST(l_quantity AS DOUBLE), 9) AS p,
                 CAST(l_quantity AS DECIMAL(18,2)) AS q
          FROM lineitem),
        m AS MATERIALIZED (
          SELECT pk, n,
                 ROUND((CAST(n AS DOUBLE) * CAST(spq AS DOUBLE)
                   - CAST(sp AS DOUBLE) * CAST(sq AS DOUBLE))
                   / (SQRT(vp) * SQRT(vq)), 9) AS r
          FROM (
            SELECT pk, n, sp, sq, spq,
                   CAST(n AS DOUBLE) * CAST(spp AS DOUBLE)
                     - CAST(sp AS DOUBLE) * CAST(sp AS DOUBLE) AS vp,
                   CAST(n AS DOUBLE)
                     * CAST(CAST(sqq AS VARCHAR) AS DOUBLE)
                     - CAST(sq AS DOUBLE) * CAST(sq AS DOUBLE) AS vq
            FROM (
              SELECT pk, CAST(COUNT(*) AS BIGINT) AS n,
                     SUM(CAST(ROUND(p, 9) AS DECIMAL(20,9))) AS sp,
                     SUM(q) AS sq,
                     SUM(CAST(ROUND(p * p, 9) AS DECIMAL(20,9))) AS spp,
                     SUM(CAST(q AS DECIMAL(19,2)) * CAST(q
                       AS DECIMAL(19,2))) AS sqq,
                     SUM(CAST(ROUND(p * CAST(q AS DOUBLE), 9)
                       AS DECIMAL(20,9))) AS spq
              FROM u GROUP BY 1 HAVING COUNT(*) >= 10))
          WHERE vp > 0 AND vq > 0)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
               CAST(SUM(CASE WHEN r > 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_positive,
               ROUND(CAST(SUM(CASE WHEN r > 0 THEN 1 ELSE 0 END)
                 AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
                 AS violation_share,
               ROUND(CAST(SUM(CAST(ROUND(r, 9) AS DECIMAL(20,9)))
                 AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS mean_price_qty_corr
        FROM m""")),

    // Per-brand Benford conformity (Nigrini MAD): each brand's
    // first-digit distribution of line prices against Benford, scored
    // by the mean absolute deviation and the published conformity
    // bands (<0.006 close, <0.012 acceptable, <0.015 marginal) — the
    // fraud-TRIAGE view (q6n's single global χ² says "something's
    // off"; this says WHICH ledger to audit first). First digits via
    // explicit FLOOR (DuckDB's decimal→int cast ROUNDS, Spark's
    // truncates — floor agrees); dense digit grid per brand.
    "qkg_benford_by_brand" -> Q(
      fn = (s, dir) => {
        val d1 = t(s, dir, "lineitem")
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .select(col("p_brand").as("brand"),
            expr("CAST(substring(CAST(CAST(FLOOR(l_extendedprice)" +
              " AS BIGINT) AS STRING), 1, 1) AS INT)").as("d"))
        val obs = d1.groupBy("brand", "d").agg(count(lit(1)).as("c"))
        val tot = d1.groupBy("brand").agg(count(lit(1)).as("n"))
        val digits = d1.sparkSession.range(1, 10)
          .select(col("id").cast("int").as("dd"))
        val obs2 = obs.select(col("brand").as("b2"), col("d"), col("c"))
        val dense = tot.crossJoin(broadcast(digits))
          .join(obs2, col("brand") === col("b2") && col("dd") === col("d"),
            "left")
          .select(col("brand"), col("dd"), col("n"),
            coalesce(col("c"), lit(0L)).as("c"))
          .withColumn("pb", round(
            log(lit(1.0) + lit(1.0) / col("dd").cast("double")) /
              log(lit(10.0)), 12))
          .withColumn("ad", round(abs(col("c").cast("double") /
            col("n").cast("double") - col("pb")), 9))
        dense.groupBy("brand", "n")
          .agg(round(sum(g9(col("ad"))).cast("double") / lit(9.0), 6)
            .as("mad"))
          .select(col("brand"), col("n").as("n_lines"), col("mad"),
            when(col("mad") < 0.006, "close_conformity")
              .when(col("mad") < 0.012, "acceptable")
              .when(col("mad") < 0.015, "marginal")
              .otherwise("nonconformity").as("nigrini_band"))
          .orderBy(col("mad").desc, col("brand"))
      },
      oracle = Some("""
        WITH d1 AS (
          SELECT p_brand AS brand,
                 CAST(substr(CAST(CAST(FLOOR(l_extendedprice) AS BIGINT)
                   AS VARCHAR), 1, 1) AS INT) AS d
          FROM lineitem JOIN part ON l_partkey = p_partkey),
        obs AS (
          SELECT brand, d, CAST(COUNT(*) AS BIGINT) AS c
          FROM d1 GROUP BY 1, 2),
        tot AS (
          SELECT brand, CAST(COUNT(*) AS BIGINT) AS n
          FROM d1 GROUP BY 1),
        dense AS (
          SELECT tot.brand, dd, n, COALESCE(c, 0) AS c,
                 ROUND(ln(CAST(1 AS DOUBLE) + CAST(1 AS DOUBLE)
                   / CAST(dd AS DOUBLE)) / ln(CAST(10 AS DOUBLE)), 12)
                   AS pb
          FROM tot
          CROSS JOIN (SELECT unnest(range(1, 10)) AS dd)
          LEFT JOIN obs ON tot.brand = obs.brand AND dd = obs.d),
        mads AS (
          SELECT brand, n,
                 ROUND(CAST(SUM(CAST(ROUND(ABS(CAST(c AS DOUBLE)
                   / CAST(n AS DOUBLE) - pb), 9) AS DECIMAL(20,9)))
                   AS DOUBLE) / CAST(9 AS DOUBLE), 6) AS mad
          FROM dense GROUP BY 1, 2)
        SELECT brand, n AS n_lines, mad,
               CASE WHEN mad < CAST(0.006 AS DOUBLE)
                      THEN 'close_conformity'
                    WHEN mad < CAST(0.012 AS DOUBLE) THEN 'acceptable'
                    WHEN mad < CAST(0.015 AS DOUBLE) THEN 'marginal'
                    ELSE 'nonconformity' END AS nigrini_band
        FROM mads ORDER BY mad DESC, brand""")),

    // Per-priority Weibull shapes for shipping delay: the qbu Weibull-
    // plot fit (Bernard ranks, ln(−ln(1−F)) on ln t) run PER GROUP via
    // the grouped running-count ranks — does urgency change the
    // hazard's SHAPE (k < 1 improving, ≈ 1 memoryless, > 1 wearout),
    // not just its scale? Comparative reliability reading on the one
    // duration every order has. Per-group ranks ride the skew-proof
    // grouped running sum; ln links only.
    "qkh_weibull_by_group" -> Q(
      fn = (s, dir) => {
        val durs = t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .select(col("o_orderpriority").as("grp"),
            ((unix_millis(col("l_shipdate").cast("timestamp")) -
              unix_millis(col("o_orderdate").cast("timestamp"))) /
              lit(86400000.0)).as("tt"),
            col("l_orderkey"), col("l_linenumber"),
            lit(java.math.BigDecimal.ONE).cast("decimal(18,2)").as("w"))
          .filter(col("tt") > 0)
        val ranked = graft.operators.ScaleOps.groupedGlobalRunningSum(
          durs, Seq("grp"),
          Seq(col("tt"), col("l_orderkey"), col("l_linenumber")),
          col("w"), "__cumw")
          .withColumn("i", col("__cumw").cast("long"))
        val n0 = durs.groupBy("grp").agg(count(lit(1)).as("n"))
        val pts = ranked.join(n0, "grp")
          .select(col("grp"),
            round(log(col("tt")), 9).as("x"),
            round(log(-log(lit(1.0) -
              (col("i").cast("double") - lit(0.3)) /
              (col("n").cast("double") + lit(0.4)))), 9).as("y"))
        val mm = pts.groupBy("grp")
          .agg(count(lit(1)).as("n"),
            sum(g9(col("x"))).as("sx"), sum(g9(col("y"))).as("sy"),
            sum(g9(round(col("x") * col("y"), 9))).as("sxy"),
            sum(g9(round(col("x") * col("x"), 9))).as("sxx"))
        mm.withColumn("k", (col("n").cast("double") *
            col("sxy").cast("double") -
            col("sx").cast("double") * col("sy").cast("double")) /
            (col("n").cast("double") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")))
          .withColumn("a", (col("sy").cast("double") -
            col("k") * col("sx").cast("double")) / col("n").cast("double"))
          .select(col("grp").as("priority"), col("n").as("n_lines"),
            round(col("k"), 6).as("weibull_shape"),
            (round(-col("a") / col("k"), 6) + lit(0.0)).as("ln_scale"),
            when(col("k") < 0.95, "improving_hazard")
              .when(col("k") <= 1.05, "near_memoryless")
              .otherwise("wearout_hazard").as("shape_class"))
          .orderBy("priority")
      },
      oracle = Some("""
        WITH durs AS MATERIALIZED (
          SELECT o_orderpriority AS grp,
                 CAST(epoch_ms(l_shipdate) - epoch_ms(o_orderdate)
                   AS DOUBLE) / CAST(86400000 AS DOUBLE) AS tt,
                 l_orderkey, l_linenumber
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE CAST(epoch_ms(l_shipdate) - epoch_ms(o_orderdate)
            AS DOUBLE) / CAST(86400000 AS DOUBLE) > 0),
        ranked AS (
          SELECT grp, tt,
                 CAST(ROW_NUMBER() OVER (PARTITION BY grp
                   ORDER BY tt, l_orderkey, l_linenumber) AS BIGINT)
                   AS i
          FROM durs),
        n0 AS (
          SELECT grp, CAST(COUNT(*) AS BIGINT) AS n
          FROM durs GROUP BY 1),
        pts AS (
          SELECT ranked.grp,
                 ROUND(ln(tt), 9) AS x,
                 ROUND(ln(-ln(CAST(1 AS DOUBLE)
                   - (CAST(i AS DOUBLE) - CAST(0.3 AS DOUBLE))
                     / (CAST(n AS DOUBLE) + CAST(0.4 AS DOUBLE)))), 9)
                   AS y
          FROM ranked JOIN n0 ON ranked.grp = n0.grp),
        mm AS (
          SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(ROUND(x, 9) AS DECIMAL(20,9))) AS sx,
                 SUM(CAST(ROUND(y, 9) AS DECIMAL(20,9))) AS sy,
                 SUM(CAST(ROUND(x * y, 9) AS DECIMAL(20,9))) AS sxy,
                 SUM(CAST(ROUND(x * x, 9) AS DECIMAL(20,9))) AS sxx
          FROM pts GROUP BY 1),
        f AS (
          SELECT grp, n, k,
                 (CAST(sy AS DOUBLE) - k * CAST(sx AS DOUBLE))
                   / CAST(n AS DOUBLE) AS a
          FROM (
            SELECT grp, n, sx, sy,
                   (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
                   (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                     - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS k
            FROM mm))
        SELECT grp AS priority, n AS n_lines,
               ROUND(k, 6) AS weibull_shape,
               ROUND(-a / k, 6) + CAST(0 AS DOUBLE) AS ln_scale,
               CASE WHEN k < CAST(0.95 AS DOUBLE)
                      THEN 'improving_hazard'
                    WHEN k <= CAST(1.05 AS DOUBLE)
                      THEN 'near_memoryless'
                    ELSE 'wearout_hazard' END AS shape_class
        FROM f ORDER BY priority""")),

    // Vintage quality: per signup-day cohort, the 7-day conversion
    // rate, with the OLS trend across vintages — "are the users we
    // acquire THIS week worse than last week's", the acquisition-
    // quality drift read (q4a's retention matrix shows WHEN users
    // leave; vintages show whether the INTAKE is degrading). Integer
    // cohort cells; trend over the bounded vintage panel.
    "qki_vintage_quality" -> Q(
      fn = (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("user_id"), col("event_type"),
            unix_millis(col("ts")).as("ms"))
        val su = e.filter(col("event_type") === "signup")
          .groupBy("user_id").agg(min(col("ms")).as("sms"))
          .withColumn("vd", expr("sms div 86400000"))
        val conv = e.filter(col("event_type") === "purchase")
          .join(su, "user_id")
          .filter(col("ms") >= col("sms") &&
            col("ms") < col("sms") + lit(604800000L))
          .select(col("user_id")).distinct()
          .withColumn("cv", lit(1L))
        val vint = su.join(conv, Seq("user_id"), "left")
          .groupBy("vd")
          .agg(count(lit(1)).as("n_users"),
            sum(coalesce(col("cv"), lit(0L))).as("n_conv"))
          .withColumn("rate", round(col("n_conv").cast("double") /
            col("n_users").cast("double"), 9))
          .localCheckpoint(eager = false)
        val base = vint.agg(min(col("vd")).as("v0"))
        val idx = vint.crossJoin(broadcast(base))
          .select((col("vd") - col("v0") + 1).as("tt"), col("vd"),
            col("n_users"), col("n_conv"), col("rate"))
        val mm = idx.agg(count(lit(1)).as("n"), sum(col("tt")).as("st"),
          sum(g9(col("rate"))).as("sr"),
          sum(col("tt") * col("tt")).as("stt"),
          sum(g9(round(col("tt").cast("double") * col("rate"), 9)))
            .as("str"))
        idx.crossJoin(broadcast(mm))
          .withColumn("slope", (col("n").cast("double") *
            col("str").cast("double") -
            col("st").cast("double") * col("sr").cast("double")) /
            (col("n").cast("double") * col("stt").cast("double") -
              col("st").cast("double") * col("st").cast("double")))
          .select(col("vd").as("vintage_day"), col("n_users"),
            col("n_conv"), round(col("rate"), 6).as("conv_rate_7d"),
            (round(col("slope"), 9) + lit(0.0))
              .as("vintage_trend_per_day"),
            when(col("slope") < 0, "intake_degrading")
              .otherwise("intake_stable_or_improving")
              .as("trend_verdict"))
          .orderBy("vintage_day")
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id, event_type, epoch_ms(ts) AS ms FROM events),
        su AS (
          SELECT user_id, MIN(ms) AS sms,
                 MIN(ms) // 86400000 AS vd
          FROM e WHERE event_type = 'signup' GROUP BY 1),
        conv AS (
          SELECT DISTINCT e.user_id, 1 AS cv
          FROM e JOIN su ON e.user_id = su.user_id
          WHERE e.event_type = 'purchase' AND e.ms >= su.sms
            AND e.ms < su.sms + 604800000),
        vint AS MATERIALIZED (
          SELECT vd, CAST(COUNT(*) AS BIGINT) AS n_users,
                 CAST(SUM(COALESCE(cv, 0)) AS BIGINT) AS n_conv,
                 ROUND(CAST(SUM(COALESCE(cv, 0)) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE), 9) AS rate
          FROM su LEFT JOIN conv ON su.user_id = conv.user_id
          GROUP BY 1),
        base AS (SELECT MIN(vd) AS v0 FROM vint),
        idx AS (
          SELECT vd - v0 + 1 AS tt, vd, n_users, n_conv, rate
          FROM vint CROSS JOIN base),
        mm AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(tt) AS BIGINT) AS st,
                 SUM(CAST(ROUND(rate, 9) AS DECIMAL(20,9))) AS sr,
                 CAST(SUM(tt * tt) AS BIGINT) AS stt,
                 SUM(CAST(ROUND(CAST(tt AS DOUBLE) * rate, 9)
                   AS DECIMAL(20,9))) AS str
          FROM idx),
        f AS (
          SELECT (CAST(n AS DOUBLE) * CAST(str AS DOUBLE)
                   - CAST(st AS DOUBLE) * CAST(sr AS DOUBLE)) /
                 (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE)
                   - CAST(st AS DOUBLE) * CAST(st AS DOUBLE)) AS slope
          FROM mm)
        SELECT vd AS vintage_day, n_users, n_conv,
               ROUND(rate, 6) AS conv_rate_7d,
               ROUND(slope, 9) + CAST(0 AS DOUBLE)
                 AS vintage_trend_per_day,
               CASE WHEN slope < 0 THEN 'intake_degrading'
                 ELSE 'intake_stable_or_improving' END AS trend_verdict
        FROM idx CROSS JOIN f
        ORDER BY vintage_day""")),

    // Runner / repeater / stranger classification: parts by the
    // number of distinct order-months they appear in, cut at the
    // exact tertiles RELATIVE to the panel (the absolute-threshold
    // vacuity lesson, applied) — runners justify continuous-flow
    // handling, strangers justify make-to-order; each tier's part and
    // spend share quantifies how much of the business each regime
    // carries. Integer month counts; exact rank cuts.
    "qkj_runner_repeater" -> Q(
      fn = (s, dir) => {
        val p = t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("l_partkey").as("pk"))
          .agg(countDistinct(expr(
            "year(o_orderdate) * 12 + month(o_orderdate)")).as("nm"),
            sum(col("l_extendedprice").cast("decimal(18,2)")).as("spend"))
          .localCheckpoint(eager = false)
        val n0 = p.agg(count(lit(1)).as("n"))
        // tertile cuts via the range-partitioned global row number —
        // never a single-partition sort of the part dimension (r9 sweep)
        val cuts = graft.operators.ScaleOps
          .globalRowNumber(p, Seq(col("nm"), col("pk")), "rk")
          .crossJoin(broadcast(n0))
          .agg(max(when(col("rk") === expr("(n + 2) div 3"), col("nm")))
            .as("t1"),
            max(when(col("rk") === expr("(2 * n + 2) div 3"), col("nm")))
              .as("t2"))
        val classed = p.crossJoin(broadcast(cuts))
          .withColumn("tier", when(col("nm") <= col("t1"), "stranger")
            .when(col("nm") <= col("t2"), "repeater")
            .otherwise("runner"))
        val tot = p.agg(count(lit(1)).as("np"), sum(col("spend")).as("sp"))
        classed.groupBy("tier")
          .agg(count(lit(1)).as("n_parts"),
            sum(col("spend")).as("tspend"),
            round(sum(col("nm")).cast("double") /
              count(lit(1)).cast("double"), 6).as("avg_months"))
          .crossJoin(broadcast(tot))
          .select(col("tier"), col("n_parts"),
            round(col("n_parts").cast("double") / col("np").cast("double"),
              6).as("part_share"),
            round(col("tspend").cast("double") / col("sp").cast("double"),
              6).as("spend_share"),
            col("avg_months"))
          .orderBy("tier")
      },
      oracle = Some("""
        WITH p AS MATERIALIZED (
          SELECT l_partkey AS pk,
                 CAST(COUNT(DISTINCT year(o_orderdate) * 12
                   + month(o_orderdate)) AS BIGINT) AS nm,
                 SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS spend
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          GROUP BY 1),
        n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM p),
        cuts AS (
          SELECT MAX(CASE WHEN rk = (n + 2) // 3 THEN nm END) AS t1,
                 MAX(CASE WHEN rk = (2 * n + 2) // 3 THEN nm END) AS t2
          FROM (SELECT nm, ROW_NUMBER() OVER (ORDER BY nm, pk) AS rk, n
                FROM p CROSS JOIN n0)),
        classed AS (
          SELECT pk, nm, spend,
                 CASE WHEN nm <= t1 THEN 'stranger'
                      WHEN nm <= t2 THEN 'repeater'
                      ELSE 'runner' END AS tier
          FROM p CROSS JOIN cuts),
        tot AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS np, SUM(spend) AS sp
          FROM p)
        SELECT tier, CAST(COUNT(*) AS BIGINT) AS n_parts,
               ROUND(CAST(COUNT(*) AS DOUBLE) / CAST(np AS DOUBLE), 6)
                 AS part_share,
               ROUND(CAST(SUM(spend) AS DOUBLE) / CAST(sp AS DOUBLE), 6)
                 AS spend_share,
               ROUND(CAST(SUM(nm) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
                 6) AS avg_months
        FROM classed CROSS JOIN tot
        GROUP BY tier, np, sp ORDER BY tier"""),
      headline = true)
  )
}

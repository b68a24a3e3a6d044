package graft.queries

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 session-2 families: regression diagnostics (Durbin-Watson
  * serial correlation, Breusch-Pagan heteroskedasticity, Chow structural
  * break), complexity / information measures (sample entropy,
  * Jensen-Shannon divergence), and their relatives. Every query carries
  * an exact DuckDB oracle under the CLAUDE.md parity rules: DECIMAL
  * moment sums, ln/÷/sqrt-only float links, 9-decimal grid snaps, and
  * DECIMAL multiplies wherever an exact grid product could land on a
  * rounding half-boundary (rule 15).
  *
  * Reference anchor: the-hive's analytics surface stops at counts and
  * rollups (internal/server/search_handler.go,
  * internal/server/stats_handler.go); this
  * file extends the engine's inference battery the same way the qa0-qcv
  * families do — declaratively, over the driver fixtures, oracle-exact.
  */
object StatQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** Daily order revenue in millions: DECIMAL(18,8) — /1e6 of a 2-decimal
    * sum has exactly 8 decimals, so the cast is exact in both engines and
    * centered values stay O(1..10) at every test SF (keeps every ROUND(x,6)
    * term within the 15-significant-digit oracle-safe envelope).
    */
  private def dailyRevenueM(s: SparkSession, dir: String): DataFrame =
    t(s, dir, "orders")
      .groupBy(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP)) div 86400000")
        .as("day"))
      .agg((sum(col("o_totalprice").cast("decimal(18,2)")) / lit(1000000))
        .cast("decimal(18,8)").as("ym"))

  /** Deterministic pseudo-random coordinate from a key (the SciQueries
    * hashCoord pattern — md5 hex draw, replayable in DuckDB via
    * CAST('0x'||…)) scaled to a 3-decimal degree grid.
    */
  private def hashCoord(key: org.apache.spark.sql.Column, salt: String,
      mod: Long, shift: Double): org.apache.spark.sql.Column =
    (conv(substring(md5(concat(key.cast("string"), lit(salt))), 1, 12),
      16, 10).cast("long") % mod).cast("double") / lit(1000.0) - lit(shift)

  private def coordSql(key: String, salt: String, mod: Long,
      shift: Int): String =
    s"CAST(CAST('0x' || substr(md5(CAST($key AS VARCHAR) || '$salt'), 1, 12) " +
      s"AS BIGINT) % $mod AS DOUBLE) / CAST(1000 AS DOUBLE) - " +
      s"CAST($shift AS DOUBLE)"

  private val dailyRevenueMSql: String =
    """SELECT CAST(epoch_ms(o_orderdate) // 86400000 AS BIGINT) AS day,
      |       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) / 1000000
      |         AS DECIMAL(18,8)) AS ym
      |FROM orders GROUP BY 1""".stripMargin

  val defs: Map[String, Q] = Map(

    // Durbin-Watson + Breusch-Pagan over the OLS time trend of the daily
    // revenue series: the two canonical residual diagnostics (is there
    // serial correlation left? does the error variance drift with time?)
    // that q6q's grouped trend fits never ask. x = the row index, so
    // xbar = (n+1)/2 and every dx is an exact half-integer; residuals
    // snap to the 9-grid; the BP cross-moment Σ dx·(u-ubar) is an exact
    // half-integer × 9-grid product — multiplied in DECIMAL per rule 15
    // (rounded at any width it lands exactly on the half-boundary for
    // ~half the rows). BP is the Koenker studentized LM = n·R²_aux.
    "qcw_ols_residual_diagnostics" -> Q(
      fn = (s, dir) => {
        val ranked = graft.operators.ScaleOps.globalRowNumber(
          dailyRevenueM(s, dir), Seq(col("day")), "rn")
          .localCheckpoint(eager = false)
        val st = ranked.agg(count(lit(1)).as("n"), sum(col("ym")).as("sy"))
          .select(col("n"),
            round(col("sy").cast("double") / col("n").cast("double"), 9)
              .as("mu"),
            ((col("n") + 1).cast("double") / lit(2.0)).as("xbar"))
        val cen = ranked.crossJoin(broadcast(st))
          .select(col("rn"),
            (col("ym").cast("double") - col("mu")).as("c"),
            (col("rn").cast("double") - col("xbar")).as("dx"))
          .localCheckpoint(eager = false)
        val mom = cen.agg(
          sum(round(col("dx") * col("dx"), 6).cast("decimal(28,6)")).as("sxxd"),
          sum(round(col("dx") * col("c"), 6).cast("decimal(28,6)")).as("sxyd"))
          .select(col("sxxd").cast("double").as("sxx"),
            col("sxyd").cast("double").as("sxy"))
          .withColumn("b", round(col("sxy") / col("sxx"), 9))
        val res = cen.crossJoin(broadcast(mom))
          .select(col("rn"), col("dx"), col("sxx"), col("b"),
            round(col("c") - col("b") * col("dx"), 9).as("e"))
          .localCheckpoint(eager = false)
        val dwn = res.select(col("rn"), col("e").as("ea"))
          .join(res.select((col("rn") - 1).as("rn"), col("e").as("eb")),
            Seq("rn"))
          .agg(sum(round((col("eb") - col("ea")) * (col("eb") - col("ea")), 9)
            .cast("decimal(28,9)")).as("dwnum"))
        val see = res.agg(
          sum(round(col("e") * col("e"), 9).cast("decimal(28,9)")).as("seed"),
          count(lit(1)).as("nn"))
          .select(col("seed").cast("double").as("see"),
            round(col("seed").cast("double") / col("nn").cast("double"), 9)
              .as("ubar"),
            col("nn"))
        val aux = res.crossJoin(broadcast(see.select(col("ubar"))))
          .select(col("dx"),
            (round(col("e") * col("e"), 9) - col("ubar")).as("uc"))
          .agg(
            sum(col("dx").cast("decimal(7,1)") * col("uc").cast("decimal(20,9)"))
              .as("sxud"),
            sum(round(col("uc") * col("uc"), 9).cast("decimal(38,9)"))
              .as("suud"))
          .select(col("sxud").cast("double").as("sxu"),
            col("suud").cast("double").as("suu"))
        st.crossJoin(broadcast(mom)).crossJoin(broadcast(dwn))
          .crossJoin(broadcast(see.select(col("see"))))
          .crossJoin(broadcast(aux))
          .select(col("n"),
            round(col("b"), 6).as("slope"),
            round(col("mu").cast("decimal(20,9)") -
              col("b").cast("decimal(12,9)") * col("xbar").cast("decimal(7,1)"),
              6).cast("double").as("intercept"),
            round(col("dwnum").cast("double") / col("see"), 6).as("dw"),
            round(col("n").cast("double") *
              (col("sxu") * col("sxu") / (col("sxx") * col("suu"))), 6)
              .as("bp_lm"))
      },
      oracle = Some(s"""
        WITH daily AS ($dailyRevenueMSql),
        r AS (SELECT ym, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM daily),
        st AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 ROUND(CAST(SUM(ym) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
                   AS mu,
                 CAST(COUNT(*) + 1 AS DOUBLE) / CAST(2 AS DOUBLE) AS xbar
          FROM r),
        cen AS MATERIALIZED (
          SELECT rn, CAST(ym AS DOUBLE) - st.mu AS c,
                 CAST(rn AS DOUBLE) - st.xbar AS dx
          FROM r CROSS JOIN st),
        mom AS (
          SELECT CAST(SUM(CAST(ROUND(dx * dx, 6) AS DECIMAL(28,6))) AS DOUBLE)
                   AS sxx,
                 CAST(SUM(CAST(ROUND(dx * c, 6) AS DECIMAL(28,6))) AS DOUBLE)
                   AS sxy
          FROM cen),
        mom2 AS (SELECT *, ROUND(sxy / sxx, 9) AS b FROM mom),
        res AS MATERIALIZED (
          SELECT rn, dx, ROUND(c - m.b * dx, 9) AS e
          FROM cen CROSS JOIN mom2 m),
        dwn AS (
          SELECT SUM(CAST(ROUND((b.e - a.e) * (b.e - a.e), 9)
                   AS DECIMAL(28,9))) AS dwnum
          FROM res a JOIN res b ON b.rn = a.rn + 1),
        see AS (
          SELECT CAST(SUM(CAST(ROUND(e * e, 9) AS DECIMAL(28,9))) AS DOUBLE)
                   AS see,
                 ROUND(CAST(SUM(CAST(ROUND(e * e, 9) AS DECIMAL(28,9)))
                     AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9) AS ubar
          FROM res),
        aux AS (
          SELECT CAST(SUM(CAST(dx AS DECIMAL(7,1)) *
                   CAST(ROUND(e * e, 9) - see.ubar AS DECIMAL(20,9)))
                   AS DOUBLE) AS sxu,
                 CAST(SUM(CAST(ROUND((ROUND(e * e, 9) - see.ubar) *
                   (ROUND(e * e, 9) - see.ubar), 9) AS DECIMAL(38,9)))
                   AS DOUBLE) AS suu
          FROM res CROSS JOIN see)
        SELECT st.n,
               ROUND(m.b, 6) + CAST(0 AS DOUBLE) AS slope,
               CAST(ROUND(CAST(st.mu AS DECIMAL(20,9)) -
                 CAST(m.b AS DECIMAL(12,9)) * CAST(st.xbar AS DECIMAL(7,1)), 6)
                 AS DOUBLE) AS intercept,
               ROUND(CAST(dwn.dwnum AS DOUBLE) / see.see, 6)
                 + CAST(0 AS DOUBLE) AS dw,
               ROUND(CAST(st.n AS DOUBLE) *
                 (aux.sxu * aux.sxu / (m.sxx * aux.suu)), 6)
                 + CAST(0 AS DOUBLE) AS bp_lm
        FROM st CROSS JOIN mom2 m CROSS JOIN dwn CROSS JOIN see
        CROSS JOIN aux""")),

    // Chow structural-break F test at the sample midpoint: fit the time
    // trend pooled and per half, F = ((SSEp - SSE1 - SSE2)/k) /
    // ((SSE1 + SSE2)/(n - 2k)), k = 2. Pooled is just seg 0 of the same
    // UNION ALL pipeline, so one grouped moment pass serves all three
    // fits; each segment's x-mean is an exact half-integer (contiguous
    // row indexes), SSE = Syy - Sxy²/Sxx with every link on the 9-grid.
    "qcx_chow_break_test" -> Q(
      fn = (s, dir) => {
        val ranked = graft.operators.ScaleOps.globalRowNumber(
          dailyRevenueM(s, dir), Seq(col("day")), "rn")
          .localCheckpoint(eager = false)
        val n0 = ranked.agg(count(lit(1)).as("n"))
          .select(col("n"), (col("n").cast("double") / lit(2.0)).cast("long")
            .as("h"))
        val seg = ranked.crossJoin(broadcast(n0))
          .select(col("rn"), col("ym"), col("n"), col("h"),
            when(col("rn") <= col("h"), lit(1)).otherwise(lit(2)).as("seg"))
        val grps = seg.select(col("rn"), col("ym"), lit(0).as("seg"))
          .unionByName(seg.select(col("rn"), col("ym"), col("seg")))
          .localCheckpoint(eager = false)
        val gst = grps.groupBy(col("seg"))
          .agg(count(lit(1)).as("cnt"), sum(col("ym")).as("sy"),
            sum(col("rn")).as("srn"))
          .select(col("seg"),
            round(col("sy").cast("double") / col("cnt").cast("double"), 9)
              .as("mu"),
            (col("srn").cast("double") / col("cnt").cast("double")).as("xbar"))
        val mom = grps.join(gst, Seq("seg"))
          .select(col("seg"),
            (col("ym").cast("double") - col("mu")).as("c"),
            (col("rn").cast("double") - col("xbar")).as("dx"))
          .groupBy(col("seg"))
          .agg(
            sum(round(col("dx") * col("dx"), 6).cast("decimal(28,6)"))
              .as("sxxd"),
            sum(round(col("dx") * col("c"), 6).cast("decimal(28,6)"))
              .as("sxyd"),
            sum(round(col("c") * col("c"), 6).cast("decimal(28,6)"))
              .as("syyd"))
          .select(col("seg"),
            round(
              round(col("sxyd").cast("double") * col("sxyd").cast("double") /
                col("sxxd").cast("double"), 9)
                .unary_-.+(col("syyd").cast("double")), 9).as("sse"))
        val wide = mom.groupBy()
          .agg(max(when(col("seg") === 0, col("sse"))).as("sse_pooled"),
            max(when(col("seg") === 1, col("sse"))).as("sse_seg1"),
            max(when(col("seg") === 2, col("sse"))).as("sse_seg2"))
        n0.crossJoin(broadcast(wide))
          .select(col("n"), col("h"),
            round(col("sse_pooled"), 6).as("sse_pooled"),
            round(col("sse_seg1"), 6).as("sse_seg1"),
            round(col("sse_seg2"), 6).as("sse_seg2"),
            round(((col("sse_pooled") - col("sse_seg1") - col("sse_seg2")) /
              lit(2.0)) /
              ((col("sse_seg1") + col("sse_seg2")) /
                (col("n") - 4).cast("double")), 6).as("f_stat"))
      },
      oracle = Some(s"""
        WITH daily AS ($dailyRevenueMSql),
        r AS (SELECT ym, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM daily),
        n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                      CAST(COUNT(*) // 2 AS BIGINT) AS h FROM r),
        grps AS MATERIALIZED (
          SELECT rn, ym, 0 AS seg FROM r
          UNION ALL
          SELECT rn, ym,
                 CASE WHEN rn <= n0.h THEN 1 ELSE 2 END AS seg
          FROM r CROSS JOIN n0),
        gst AS (
          SELECT seg,
                 ROUND(CAST(SUM(ym) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
                   AS mu,
                 CAST(SUM(rn) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS xbar
          FROM grps GROUP BY 1),
        mom AS (
          SELECT g.seg,
                 CAST(SUM(CAST(ROUND((CAST(rn AS DOUBLE) - gst.xbar) *
                   (CAST(rn AS DOUBLE) - gst.xbar), 6) AS DECIMAL(28,6)))
                   AS DOUBLE) AS sxx,
                 CAST(SUM(CAST(ROUND((CAST(rn AS DOUBLE) - gst.xbar) *
                   (CAST(ym AS DOUBLE) - gst.mu), 6) AS DECIMAL(28,6)))
                   AS DOUBLE) AS sxy,
                 CAST(SUM(CAST(ROUND((CAST(ym AS DOUBLE) - gst.mu) *
                   (CAST(ym AS DOUBLE) - gst.mu), 6) AS DECIMAL(28,6)))
                   AS DOUBLE) AS syy
          FROM grps g JOIN gst ON g.seg = gst.seg
          GROUP BY 1),
        sse AS (
          SELECT seg, ROUND(syy - ROUND(sxy * sxy / sxx, 9), 9) AS sse
          FROM mom),
        wide AS (
          SELECT MAX(CASE WHEN seg = 0 THEN sse END) AS sse_pooled,
                 MAX(CASE WHEN seg = 1 THEN sse END) AS sse_seg1,
                 MAX(CASE WHEN seg = 2 THEN sse END) AS sse_seg2
          FROM sse)
        SELECT n, h,
               ROUND(sse_pooled, 6) + CAST(0 AS DOUBLE) AS sse_pooled,
               ROUND(sse_seg1, 6) + CAST(0 AS DOUBLE) AS sse_seg1,
               ROUND(sse_seg2, 6) + CAST(0 AS DOUBLE) AS sse_seg2,
               ROUND(((sse_pooled - sse_seg1 - sse_seg2) / CAST(2 AS DOUBLE)) /
                 ((sse_seg1 + sse_seg2) / CAST(n - 4 AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS f_stat
        FROM n0 CROSS JOIN wide""")),

    // Sample entropy (Richman-Moorman, m = 2, r = sd/5) of the daily
    // event-count series: the regularity measure behind physiological
    // and load-pattern monitoring — counts template matches of length m
    // and m+1 under a Chebyshev tolerance, SampEn = ln(B) - ln(A).
    // Daily counts are integers, so every distance comparison is an exact
    // integer against a non-grid tolerance; r = sd/5 divides the 9-grid
    // sd by 5 (last digit ∈ {0,2,4,6,8} — never a rounding boundary).
    // The 30-point daily panel (events span exactly 30 days) bounds the
    // pair join at ~400 rows at any SF.
    "qcy_sample_entropy" -> Q(
      fn = (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy((unix_millis(col("ts")) / lit(86400000L)).cast("long")
            .as("day"))
          .agg(count(lit(1)).as("x"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(daily,
          Seq(col("day")), "rn").localCheckpoint(eager = false)
        val st = ranked.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
          .select(col("n"),
            round(col("sx").cast("double") / col("n").cast("double"), 9)
              .as("mu"))
        val varr = ranked.crossJoin(broadcast(st))
          .select((col("x").cast("double") - col("mu")).as("cx"), col("n"))
          .agg(sum(round(col("cx") * col("cx"), 6).cast("decimal(28,6)"))
            .as("ss"), first(col("n")).as("n"))
          .select(col("n"),
            round(sqrt(col("ss").cast("double") /
              (col("n") - 1).cast("double")), 9).as("sd"))
          .withColumn("rtol", col("sd") / lit(5.0))
        val vecs = ranked.select(col("rn"), col("x").as("x0"))
          .join(ranked.select((col("rn") - 1).as("rn"), col("x").as("x1")),
            Seq("rn"))
          .join(ranked.select((col("rn") - 2).as("rn"), col("x").as("x2")),
            Seq("rn"))
          .localCheckpoint(eager = false)
        val pairs = vecs.select(col("rn").as("ri"), col("x0").as("i0"),
          col("x1").as("i1"), col("x2").as("i2"))
          .join(vecs.select(col("rn").as("rj"), col("x0").as("j0"),
            col("x1").as("j1"), col("x2").as("j2")), col("ri") < col("rj"))
          .crossJoin(broadcast(varr))
          .select(
            greatest(abs(col("i0") - col("j0")), abs(col("i1") - col("j1")))
              .cast("double").as("d2"),
            greatest(abs(col("i0") - col("j0")), abs(col("i1") - col("j1")),
              abs(col("i2") - col("j2"))).cast("double").as("d3"),
            col("rtol"))
        val cnts = pairs.agg(
          sum(when(col("d2") <= col("rtol"), 1L).otherwise(0L)).as("b_count"),
          sum(when(col("d3") <= col("rtol"), 1L).otherwise(0L)).as("a_count"))
        varr.crossJoin(broadcast(cnts))
          .select(col("n"), round(col("sd"), 6).as("sd"),
            round(col("rtol"), 6).as("r_tol"),
            col("b_count"), col("a_count"),
            when(col("a_count") > 0,
              round(log(col("b_count").cast("double")) -
                log(col("a_count").cast("double")), 6)).as("sampen"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
                 CAST(COUNT(*) AS BIGINT) AS x
          FROM events GROUP BY 1),
        r AS (SELECT x, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM daily),
        st AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 ROUND(CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
                   AS mu
          FROM r),
        varr AS (
          SELECT st.n,
                 ROUND(sqrt(CAST(SUM(CAST(ROUND(
                     (CAST(x AS DOUBLE) - st.mu) * (CAST(x AS DOUBLE) - st.mu),
                     6) AS DECIMAL(28,6))) AS DOUBLE)
                   / CAST(st.n - 1 AS DOUBLE)), 9) AS sd
          FROM r CROSS JOIN st GROUP BY st.n),
        varr2 AS (SELECT *, sd / CAST(5 AS DOUBLE) AS rtol FROM varr),
        vecs AS MATERIALIZED (
          SELECT a.rn, a.x AS x0, b.x AS x1, c.x AS x2
          FROM r a JOIN r b ON b.rn = a.rn + 1 JOIN r c ON c.rn = a.rn + 2),
        pairs AS (
          SELECT GREATEST(ABS(i.x0 - j.x0), ABS(i.x1 - j.x1)) AS d2,
                 GREATEST(ABS(i.x0 - j.x0), ABS(i.x1 - j.x1),
                   ABS(i.x2 - j.x2)) AS d3,
                 v.rtol
          FROM vecs i JOIN vecs j ON i.rn < j.rn CROSS JOIN varr2 v),
        cnts AS (
          SELECT CAST(SUM(CASE WHEN CAST(d2 AS DOUBLE) <= rtol
                   THEN 1 ELSE 0 END) AS BIGINT) AS b_count,
                 CAST(SUM(CASE WHEN CAST(d3 AS DOUBLE) <= rtol
                   THEN 1 ELSE 0 END) AS BIGINT) AS a_count
          FROM pairs)
        SELECT n, ROUND(sd, 6) + CAST(0 AS DOUBLE) AS sd,
               ROUND(rtol, 6) + CAST(0 AS DOUBLE) AS r_tol,
               b_count, a_count,
               CASE WHEN a_count > 0 THEN
                 ROUND(ln(CAST(b_count AS DOUBLE)) -
                   ln(CAST(a_count AS DOUBLE)), 6) + CAST(0 AS DOUBLE)
               END AS sampen
        FROM varr2 CROSS JOIN cnts""")),

    // Jensen-Shannon divergence (plus both KL directions) between the
    // event-type mixes of the first and second halves of the observed
    // month — the symmetric, bounded drift measure next to q87's PSI
    // (which buckets by token and clips; JSD is the proper
    // information-theoretic distance). Every probability is a raw double
    // ratio of exact BIGINT counts computed with the identical expression
    // shape in both engines (no grid products anywhere), terms snap to
    // the 9-grid per type, and only ln carries the float link (parity
    // proven q3y/q38).
    "qcz_jensen_shannon_drift" -> Q(
      fn = (s, dir) => {
        val e = t(s, dir, "events")
          .withColumn("day", (unix_millis(col("ts")) / lit(86400000L))
            .cast("long"))
        val half = e.crossJoin(broadcast(e.agg(min(col("day")).as("d0"))))
          .select(col("event_type"),
            when(col("day") - col("d0") < 15, lit("a")).otherwise(lit("b"))
              .as("half"))
        val cnt = half.groupBy(col("event_type"))
          .agg(sum(when(col("half") === "a", 1L).otherwise(0L)).as("ca"),
            sum(when(col("half") === "b", 1L).otherwise(0L)).as("cb"))
          .filter(col("ca") > 0 && col("cb") > 0)
        val tot = cnt.agg(sum(col("ca")).as("na"), sum(col("cb")).as("nb"))
        val terms = cnt.crossJoin(broadcast(tot))
          .select(
            (col("ca").cast("double") / col("na").cast("double")).as("p"),
            (col("cb").cast("double") / col("nb").cast("double")).as("q"),
            ((col("ca") * col("nb") + col("cb") * col("na")).cast("double") /
              (lit(2L) * col("na") * col("nb")).cast("double")).as("m"),
            col("na"), col("nb"))
        val agg = terms.agg(
          sum(round(col("p") * log(col("p") / col("q")), 9)
            .cast("decimal(18,9)")).as("klab"),
          sum(round(col("q") * log(col("q") / col("p")), 9)
            .cast("decimal(18,9)")).as("klba"),
          sum(round(col("p") * log(col("p") / col("m")), 9)
            .cast("decimal(18,9)")).as("jpa"),
          sum(round(col("q") * log(col("q") / col("m")), 9)
            .cast("decimal(18,9)")).as("jqb"),
          first(col("na")).as("na"), first(col("nb")).as("nb"))
        agg.select(col("na"), col("nb"),
          round(col("klab").cast("double"), 6).as("kl_ab"),
          round(col("klba").cast("double"), 6).as("kl_ba"),
          round(lit(0.5) * (col("jpa").cast("double") +
            col("jqb").cast("double")), 6).as("jsd"),
          round(lit(0.5) * (col("jpa").cast("double") +
            col("jqb").cast("double")) / log(lit(2.0)), 6).as("jsd_bits"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT event_type,
                 CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day
          FROM events),
        d0 AS (SELECT MIN(day) AS d0 FROM e),
        half AS (
          SELECT event_type,
                 CASE WHEN day - d0.d0 < 15 THEN 'a' ELSE 'b' END AS half
          FROM e CROSS JOIN d0),
        cnt AS (
          SELECT event_type,
                 CAST(SUM(CASE WHEN half = 'a' THEN 1 ELSE 0 END) AS BIGINT)
                   AS ca,
                 CAST(SUM(CASE WHEN half = 'b' THEN 1 ELSE 0 END) AS BIGINT)
                   AS cb
          FROM half GROUP BY 1
          HAVING SUM(CASE WHEN half = 'a' THEN 1 ELSE 0 END) > 0
             AND SUM(CASE WHEN half = 'b' THEN 1 ELSE 0 END) > 0),
        tot AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
                       CAST(SUM(cb) AS BIGINT) AS nb FROM cnt),
        terms AS (
          SELECT CAST(ca AS DOUBLE) / CAST(na AS DOUBLE) AS p,
                 CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE) AS q,
                 CAST(ca * nb + cb * na AS DOUBLE) /
                   CAST(2 * na * nb AS DOUBLE) AS m,
                 na, nb
          FROM cnt CROSS JOIN tot),
        agg AS (
          SELECT MAX(na) AS na, MAX(nb) AS nb,
                 SUM(CAST(ROUND(p * ln(p / q), 9) AS DECIMAL(18,9))) AS klab,
                 SUM(CAST(ROUND(q * ln(q / p), 9) AS DECIMAL(18,9))) AS klba,
                 SUM(CAST(ROUND(p * ln(p / m), 9) AS DECIMAL(18,9))) AS jpa,
                 SUM(CAST(ROUND(q * ln(q / m), 9) AS DECIMAL(18,9))) AS jqb
          FROM terms)
        SELECT na, nb,
               ROUND(CAST(klab AS DOUBLE), 6) + CAST(0 AS DOUBLE) AS kl_ab,
               ROUND(CAST(klba AS DOUBLE), 6) + CAST(0 AS DOUBLE) AS kl_ba,
               ROUND(CAST(0.5 AS DOUBLE) * (CAST(jpa AS DOUBLE) +
                 CAST(jqb AS DOUBLE)), 6) + CAST(0 AS DOUBLE) AS jsd,
               ROUND(CAST(0.5 AS DOUBLE) * (CAST(jpa AS DOUBLE) +
                 CAST(jqb AS DOUBLE)) / ln(CAST(2 AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS jsd_bits
        FROM agg""")),

    // Lexical-richness battery over the whole document corpus: Yule's K
    // (repeat-rate characteristic, scale-free in N), Simpson's D, the
    // Good-Turing unseen-mass estimate V1/N (the singleton-probability
    // bound behind smoothing; qao estimates the TRIGRAM unseen mass —
    // this is the unigram vocabulary view), Herdan's C, and Honoré's R —
    // the vocabulary-shape summary next to q8f's Heaps-law growth
    // exponent (which tracks HOW vocabulary grows; this is the
    // equilibrium shape).
    // Every statistic is a ratio of exact BIGINT count-of-counts; ln is
    // the only float link.
    "qd1_lexical_richness" -> Q(
      fn = (s, dir) => {
        val tf = t(s, dir, "documents")
          .select(explode(split(lower(col("text")), "[\t\n\f\r ]+"))
            .as("tok"))
          .filter(col("tok") =!= "")
          .groupBy(col("tok")).agg(count(lit(1)).as("tf"))
        val voc = tf.groupBy(col("tf")).agg(count(lit(1)).as("vm"))
        val agg = voc.agg(
          sum(col("tf") * col("vm")).as("ntok"),
          sum(col("vm")).as("vocab"),
          sum(col("tf") * col("tf") * col("vm")).as("sm2"),
          sum(col("tf") * (col("tf") - 1) * col("vm")).as("sp2"),
          sum(when(col("tf") === 1, col("vm")).otherwise(0L)).as("v1"),
          sum(when(col("tf") === 2, col("vm")).otherwise(0L)).as("v2"))
        agg.select(col("ntok"), col("vocab"), col("v1"), col("v2"),
          round(lit(10000.0) * (col("sm2") - col("ntok")).cast("double") /
            (col("ntok").cast("double") * col("ntok").cast("double")), 6)
            .as("yule_k"),
          round(col("sp2").cast("double") /
            (col("ntok").cast("double") * (col("ntok") - 1).cast("double")), 9)
            .as("simpson_d"),
          round(col("v1").cast("double") / col("ntok").cast("double"), 6)
            .as("gt_unseen"),
          round(log(col("vocab").cast("double")) /
            log(col("ntok").cast("double")), 6).as("herdan_c"),
          when(col("v1") < col("vocab"),
            round(lit(100.0) * log(col("ntok").cast("double")) /
              (lit(1.0) - col("v1").cast("double") /
                col("vocab").cast("double")), 6)).as("honore_r"))
      },
      oracle = Some("""
        WITH toks AS (
          SELECT UNNEST(string_split_regex(lower(text),
                   '[\t\n\x0B\f\r ]+')) AS tok
          FROM documents),
        tf AS (
          SELECT tok, CAST(COUNT(*) AS BIGINT) AS tf
          FROM toks WHERE tok <> '' GROUP BY 1),
        voc AS (
          SELECT tf, CAST(COUNT(*) AS BIGINT) AS vm FROM tf GROUP BY 1),
        agg AS (
          SELECT CAST(SUM(tf * vm) AS BIGINT) AS ntok,
                 CAST(SUM(vm) AS BIGINT) AS vocab,
                 CAST(SUM(tf * tf * vm) AS BIGINT) AS sm2,
                 CAST(SUM(tf * (tf - 1) * vm) AS BIGINT) AS sp2,
                 CAST(SUM(CASE WHEN tf = 1 THEN vm ELSE 0 END) AS BIGINT)
                   AS v1,
                 CAST(SUM(CASE WHEN tf = 2 THEN vm ELSE 0 END) AS BIGINT)
                   AS v2
          FROM voc)
        SELECT ntok, vocab, v1, v2,
               ROUND(CAST(10000 AS DOUBLE) * CAST(sm2 - ntok AS DOUBLE) /
                 (CAST(ntok AS DOUBLE) * CAST(ntok AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS yule_k,
               ROUND(CAST(sp2 AS DOUBLE) /
                 (CAST(ntok AS DOUBLE) * CAST(ntok - 1 AS DOUBLE)), 9)
                 + CAST(0 AS DOUBLE) AS simpson_d,
               ROUND(CAST(v1 AS DOUBLE) / CAST(ntok AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS gt_unseen,
               ROUND(ln(CAST(vocab AS DOUBLE)) / ln(CAST(ntok AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS herdan_c,
               CASE WHEN v1 < vocab THEN
                 ROUND(CAST(100 AS DOUBLE) * ln(CAST(ntok AS DOUBLE)) /
                   (CAST(1 AS DOUBLE) - CAST(v1 AS DOUBLE) /
                     CAST(vocab AS DOUBLE)), 6) + CAST(0 AS DOUBLE)
               END AS honore_r
        FROM agg""")),

    // Paired categorical tests: McNemar's chi-square (continuity-
    // corrected) on each user's purchase behavior flipping between the
    // month halves — the within-subject twin of q7c's two-proportion
    // z-test (which assumes independent samples; the same users appear in
    // both halves here, so only the discordant pairs carry information —
    // and Cochran's Q across the three 10-day purchase windows (the
    // k-repeated-measures generalization; any-event-in-month flags would
    // make every row all-ones and zero the denominator), computed from
    // the all-integer identity Q = ((k-1)(kΣCj² - T²)) / (kT - ΣRi²),
    // guarded when no mixed rows exist.
    "qd2_mcnemar_cochran_q" -> Q(
      fn = (s, dir) => {
        val e = t(s, dir, "events")
          .withColumn("day", (unix_millis(col("ts")) / lit(86400000L))
            .cast("long"))
        val rel = e.crossJoin(broadcast(e.agg(min(col("day")).as("d0"))))
          .select(col("user_id"), col("event_type"),
            (col("day") - col("d0")).as("rel"))
        val flags = rel.groupBy(col("user_id")).agg(
          max(when(col("event_type") === "purchase" && col("rel") < 15, 1L)
            .otherwise(0L)).as("pa"),
          max(when(col("event_type") === "purchase" && col("rel") >= 15, 1L)
            .otherwise(0L)).as("pb"),
          max(when(col("event_type") === "purchase" && col("rel") < 10, 1L)
            .otherwise(0L)).as("f1"),
          max(when(col("event_type") === "purchase" && col("rel") >= 10 &&
            col("rel") < 20, 1L).otherwise(0L)).as("f2"),
          max(when(col("event_type") === "purchase" && col("rel") >= 20, 1L)
            .otherwise(0L)).as("f3"))
        val agg = flags.agg(
          count(lit(1)).as("n_users"),
          sum(when(col("pa") === 1 && col("pb") === 0, 1L).otherwise(0L))
            .as("mcn_b"),
          sum(when(col("pa") === 0 && col("pb") === 1, 1L).otherwise(0L))
            .as("mcn_c"),
          sum(col("f1")).as("c1"), sum(col("f2")).as("c2"),
          sum(col("f3")).as("c3"),
          sum((col("f1") + col("f2") + col("f3")) *
            (col("f1") + col("f2") + col("f3"))).as("sr2"))
        agg.select(col("n_users"), col("mcn_b"), col("mcn_c"),
          when(col("mcn_b") + col("mcn_c") > 0,
            round((abs(col("mcn_b") - col("mcn_c")) - 1).cast("double") *
              (abs(col("mcn_b") - col("mcn_c")) - 1).cast("double") /
              (col("mcn_b") + col("mcn_c")).cast("double"), 6))
            .as("mcnemar_chi2"),
          when(lit(3L) * (col("c1") + col("c2") + col("c3")) =!= col("sr2"),
            round((lit(2L) * (lit(3L) * (col("c1") * col("c1") +
              col("c2") * col("c2") + col("c3") * col("c3")) -
              (col("c1") + col("c2") + col("c3")) *
                (col("c1") + col("c2") + col("c3")))).cast("double") /
              (lit(3L) * (col("c1") + col("c2") + col("c3")) - col("sr2"))
                .cast("double"), 6)).as("cochran_q"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id, event_type,
                 CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day
          FROM events),
        d0 AS (SELECT MIN(day) AS d0 FROM e),
        rel AS (
          SELECT user_id, event_type, day - d0.d0 AS rel
          FROM e CROSS JOIN d0),
        flags AS (
          SELECT user_id,
                 MAX(CASE WHEN event_type = 'purchase' AND rel < 15
                   THEN 1 ELSE 0 END) AS pa,
                 MAX(CASE WHEN event_type = 'purchase' AND rel >= 15
                   THEN 1 ELSE 0 END) AS pb,
                 MAX(CASE WHEN event_type = 'purchase' AND rel < 10
                   THEN 1 ELSE 0 END) AS f1,
                 MAX(CASE WHEN event_type = 'purchase' AND rel >= 10
                   AND rel < 20 THEN 1 ELSE 0 END) AS f2,
                 MAX(CASE WHEN event_type = 'purchase' AND rel >= 20
                   THEN 1 ELSE 0 END) AS f3
          FROM rel GROUP BY 1),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
                 CAST(SUM(CASE WHEN pa = 1 AND pb = 0 THEN 1 ELSE 0 END)
                   AS BIGINT) AS mcn_b,
                 CAST(SUM(CASE WHEN pa = 0 AND pb = 1 THEN 1 ELSE 0 END)
                   AS BIGINT) AS mcn_c,
                 CAST(SUM(f1) AS BIGINT) AS c1,
                 CAST(SUM(f2) AS BIGINT) AS c2,
                 CAST(SUM(f3) AS BIGINT) AS c3,
                 CAST(SUM((f1 + f2 + f3) * (f1 + f2 + f3)) AS BIGINT) AS sr2
          FROM flags)
        SELECT n_users, mcn_b, mcn_c,
               CASE WHEN mcn_b + mcn_c > 0 THEN
                 ROUND(CAST(ABS(mcn_b - mcn_c) - 1 AS DOUBLE) *
                   CAST(ABS(mcn_b - mcn_c) - 1 AS DOUBLE) /
                   CAST(mcn_b + mcn_c AS DOUBLE), 6) + CAST(0 AS DOUBLE)
               END AS mcnemar_chi2,
               CASE WHEN 3 * (c1 + c2 + c3) <> sr2 THEN
                 ROUND(CAST(2 * (3 * (c1 * c1 + c2 * c2 + c3 * c3) -
                     (c1 + c2 + c3) * (c1 + c2 + c3)) AS DOUBLE) /
                   CAST(3 * (c1 + c2 + c3) - sr2 AS DOUBLE), 6)
                   + CAST(0 AS DOUBLE)
               END AS cochran_q
        FROM agg""")),

    // Hotelling's T² two-sample test on per-user 2-D activity vectors
    // (event count, purchase count) between the even/odd user-id cohorts
    // — the multivariate mean-difference test q7n's Welch t can't express
    // (it ignores the correlation between the coordinates; T² whitens by
    // the pooled covariance). The 2×2 inverse is closed-form; centered
    // values are exact 9-grid, cross-moments ride round-6 DECIMAL sums,
    // and the final quadratic form is raw-double algebra with ln-free
    // links. Also emits the exact F transform (n1+n2-p-1 scaling).
    "qd3_hotelling_t2" -> Q(
      fn = (s, dir) => {
        val u = t(s, dir, "events")
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("x1"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("x2"))
          .select((col("user_id") % 2).as("g"), col("x1"), col("x2"))
        val gs = u.groupBy(col("g"))
          .agg(count(lit(1)).as("cnt"), sum(col("x1")).as("s1"),
            sum(col("x2")).as("s2"))
          .select(col("g"), col("cnt"),
            round(col("s1").cast("double") / col("cnt").cast("double"), 9)
              .as("m1"),
            round(col("s2").cast("double") / col("cnt").cast("double"), 9)
              .as("m2"))
        val mom = u.join(gs, Seq("g"))
          .select(col("g"),
            (col("x1").cast("double") - col("m1")).as("c1"),
            (col("x2").cast("double") - col("m2")).as("c2"))
          .agg(
            sum(round(col("c1") * col("c1"), 6).cast("decimal(28,6)"))
              .as("w11"),
            sum(round(col("c1") * col("c2"), 6).cast("decimal(28,6)"))
              .as("w12"),
            sum(round(col("c2") * col("c2"), 6).cast("decimal(28,6)"))
              .as("w22"))
        val wide = gs.groupBy().agg(
          max(when(col("g") === 0, col("cnt"))).as("n1"),
          max(when(col("g") === 1, col("cnt"))).as("n2"),
          max(when(col("g") === 0, col("m1"))).as("a1"),
          max(when(col("g") === 0, col("m2"))).as("a2"),
          max(when(col("g") === 1, col("m1"))).as("b1"),
          max(when(col("g") === 1, col("m2"))).as("b2"))
        wide.crossJoin(broadcast(mom))
          .select(col("n1"), col("n2"),
            col("w11").cast("double").as("w11"),
            col("w12").cast("double").as("w12"),
            col("w22").cast("double").as("w22"),
            (col("a1") - col("b1")).as("d1"),
            (col("a2") - col("b2")).as("d2"),
            ((col("n1") + col("n2") - 2)).cast("double").as("df"))
          .select(col("n1"), col("n2"),
            round(col("d1"), 6).as("d1"), round(col("d2"), 6).as("d2"),
            round(
              (col("n1") * col("n2")).cast("double") /
                (col("n1") + col("n2")).cast("double") *
                (col("d1") * col("d1") * (col("w22") / col("df")) -
                  lit(2.0) * col("d1") * col("d2") * (col("w12") / col("df")) +
                  col("d2") * col("d2") * (col("w11") / col("df"))) /
                ((col("w11") / col("df")) * (col("w22") / col("df")) -
                  (col("w12") / col("df")) * (col("w12") / col("df"))), 6)
              .as("t2"),
            round(
              ((col("n1") + col("n2") - 3)).cast("double") /
                (lit(2.0) * ((col("n1") + col("n2") - 2)).cast("double")) *
                ((col("n1") * col("n2")).cast("double") /
                  (col("n1") + col("n2")).cast("double") *
                  (col("d1") * col("d1") * (col("w22") / col("df")) -
                    lit(2.0) * col("d1") * col("d2") *
                      (col("w12") / col("df")) +
                    col("d2") * col("d2") * (col("w11") / col("df"))) /
                  ((col("w11") / col("df")) * (col("w22") / col("df")) -
                    (col("w12") / col("df")) * (col("w12") / col("df")))), 6)
              .as("f_stat"))
      },
      oracle = Some("""
        WITH u AS (
          SELECT user_id % 2 AS g, CAST(COUNT(*) AS BIGINT) AS x1,
                 CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                   END) AS BIGINT) AS x2
          FROM events GROUP BY user_id),
        gs AS (
          SELECT g, CAST(COUNT(*) AS BIGINT) AS cnt,
                 ROUND(CAST(SUM(x1) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
                   AS m1,
                 ROUND(CAST(SUM(x2) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
                   AS m2
          FROM u GROUP BY 1),
        mom AS (
          SELECT
            CAST(SUM(CAST(ROUND((CAST(x1 AS DOUBLE) - gs.m1) *
              (CAST(x1 AS DOUBLE) - gs.m1), 6) AS DECIMAL(28,6)))
              AS DOUBLE) AS w11,
            CAST(SUM(CAST(ROUND((CAST(x1 AS DOUBLE) - gs.m1) *
              (CAST(x2 AS DOUBLE) - gs.m2), 6) AS DECIMAL(28,6)))
              AS DOUBLE) AS w12,
            CAST(SUM(CAST(ROUND((CAST(x2 AS DOUBLE) - gs.m2) *
              (CAST(x2 AS DOUBLE) - gs.m2), 6) AS DECIMAL(28,6)))
              AS DOUBLE) AS w22
          FROM u JOIN gs USING (g)),
        wide AS (
          SELECT MAX(CASE WHEN g = 0 THEN cnt END) AS n1,
                 MAX(CASE WHEN g = 1 THEN cnt END) AS n2,
                 MAX(CASE WHEN g = 0 THEN m1 END) AS a1,
                 MAX(CASE WHEN g = 0 THEN m2 END) AS a2,
                 MAX(CASE WHEN g = 1 THEN m1 END) AS b1,
                 MAX(CASE WHEN g = 1 THEN m2 END) AS b2
          FROM gs),
        pre AS (
          SELECT n1, n2, w11, w12, w22,
                 a1 - b1 AS d1, a2 - b2 AS d2,
                 CAST(n1 + n2 - 2 AS DOUBLE) AS df
          FROM wide CROSS JOIN mom)
        SELECT n1, n2,
               ROUND(d1, 6) + CAST(0 AS DOUBLE) AS d1,
               ROUND(d2, 6) + CAST(0 AS DOUBLE) AS d2,
               ROUND(CAST(n1 * n2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE) *
                 (d1 * d1 * (w22 / df) -
                   CAST(2 AS DOUBLE) * d1 * d2 * (w12 / df) +
                   d2 * d2 * (w11 / df)) /
                 ((w11 / df) * (w22 / df) - (w12 / df) * (w12 / df)), 6)
                 + CAST(0 AS DOUBLE) AS t2,
               ROUND(CAST(n1 + n2 - 3 AS DOUBLE) /
                 (CAST(2 AS DOUBLE) * CAST(n1 + n2 - 2 AS DOUBLE)) *
                 (CAST(n1 * n2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE) *
                   (d1 * d1 * (w22 / df) -
                     CAST(2 AS DOUBLE) * d1 * d2 * (w12 / df) +
                     d2 * d2 * (w11 / df)) /
                   ((w11 / df) * (w22 / df) - (w12 / df) * (w12 / df))), 6)
                 + CAST(0 AS DOUBLE) AS f_stat
        FROM pre""")),

    // LZ76 sequence complexity of the daily event-count series binarized
    // at its median: the model-free randomness measure next to qbc's
    // permutation entropy and qcy's sample entropy. The Kaspar-Schuster
    // parser is a deterministic integer state machine
    // (operators/Complexity.scala, hand-derived goldens in
    // ComplexitySpec); the oracle replays the identical (i,k,l,kmax,c)
    // transitions as a recursive CTE over the same bit string. Median =
    // the exact ((n+1) div 2)-th order statistic with the day tiebreak;
    // the parse is O(n²) driver-free steps on the 30-point daily panel.
    "qd0_lz76_complexity" -> Q(
      fn = (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy((unix_millis(col("ts")) / lit(86400000L)).cast("long")
            .as("day"))
          .agg(count(lit(1)).as("x"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(daily,
          Seq(col("day")), "rn")
        val byVal = graft.operators.ScaleOps.globalRowNumber(ranked,
          Seq(col("x"), col("day")), "vr").localCheckpoint(eager = false)
        val st = byVal.agg(count(lit(1)).as("n"))
        val med = byVal.crossJoin(broadcast(st))
          .filter(col("vr") ===
            floor((col("n") + 1).cast("double") / lit(2.0)).cast("long"))
          .select(col("x").as("med"))
        val lzUdf = udf((bits: String) => graft.operators.Complexity.lz76(bits))
        val sdf = byVal.crossJoin(broadcast(med))
          .select(col("rn"),
            when(col("x") >= col("med"), lit("1")).otherwise(lit("0"))
              .as("b"), col("med"))
          .agg(
            array_join(transform(
              array_sort(collect_list(struct(col("rn"), col("b")))),
              x => x.getField("b")), "").as("bits"),
            count(lit(1)).as("n"), first(col("med")).as("med"))
        sdf.select(col("n"), col("med"), col("bits"),
          lzUdf(col("bits")).as("c_lz"))
          .withColumn("c_norm",
            round(col("c_lz").cast("double") * log(col("n").cast("double")) /
              (col("n").cast("double") * log(lit(2.0))), 6))
      },
      oracle = Some("""
        WITH RECURSIVE daily AS (
          SELECT CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
                 CAST(COUNT(*) AS BIGINT) AS x
          FROM events GROUP BY 1),
        r AS (
          SELECT x, ROW_NUMBER() OVER (ORDER BY day) AS rn,
                 ROW_NUMBER() OVER (ORDER BY x, day) AS vr
          FROM daily),
        st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM r),
        med AS (
          SELECT x AS med FROM r CROSS JOIN st WHERE vr = (n + 1) // 2),
        bits AS (
          SELECT string_agg(CASE WHEN x >= med THEN '1' ELSE '0' END, ''
                   ORDER BY rn) AS s,
                 MAX(med) AS med, CAST(COUNT(*) AS BIGINT) AS n
          FROM r CROSS JOIN med),
        parse AS (
          SELECT 0 AS i, 1 AS k, 1 AS l, 1 AS kmax, 1 AS c,
                 false AS done, s, n
          FROM bits
          UNION ALL
          SELECT
            CASE WHEN m THEN i WHEN i + 1 = l THEN 0 ELSE i + 1 END AS i,
            CASE WHEN m THEN k + 1 ELSE 1 END AS k,
            CASE WHEN m THEN l
                 WHEN i + 1 = l THEN l + GREATEST(k, kmax)
                 ELSE l END AS l,
            CASE WHEN m THEN kmax
                 WHEN i + 1 = l THEN 1
                 ELSE GREATEST(k, kmax) END AS kmax,
            CASE WHEN m AND l + k + 1 > n THEN c + 1
                 WHEN m THEN c
                 WHEN i + 1 = l THEN c + 1
                 ELSE c END AS c,
            CASE WHEN m THEN l + k + 1 > n
                 WHEN i + 1 = l THEN l + GREATEST(k, kmax) + 1 > n
                 ELSE false END AS done,
            s, n
          FROM (SELECT p.*,
                  substr(s, i + k, 1) = substr(s, l + k, 1) AS m
                FROM parse p WHERE NOT done) q)
        SELECT b.n, b.med, b.s AS bits, CAST(p.c AS INT) AS c_lz,
               ROUND(CAST(p.c AS DOUBLE) * ln(CAST(b.n AS DOUBLE)) /
                 (CAST(b.n AS DOUBLE) * ln(CAST(2 AS DOUBLE))), 6)
                 + CAST(0 AS DOUBLE) AS c_norm
        FROM parse p CROSS JOIN bits b WHERE p.done""")),

    // KPSS level-stationarity test of the daily revenue series: partial
    // sums of the demeaned series against the Newey-West long-run
    // variance (Bartlett kernel, bandwidth 4·(n/100)^(1/4) via two
    // sqrts — pow is not oracle-safe, nested sqrt is). The unit-root
    // complement of qbd's Engle-Granger residual test: KPSS takes
    // stationarity as the NULL, so the two tests bracket the
    // trend-vs-drift question. Partial sums ride an exact DECIMAL(20,9)
    // running sum (the q83 skew-proof scan); autocovariance products are
    // round-6 DECIMAL sums; every link is *,/,sqrt on the 9-grid.
    "qd4_kpss_level" -> Q(
      fn = (s, dir) => {
        val ranked = graft.operators.ScaleOps.globalRowNumber(
          dailyRevenueM(s, dir), Seq(col("day")), "rn")
          .localCheckpoint(eager = false)
        val st = ranked.agg(count(lit(1)).as("n"), sum(col("ym")).as("sy"))
          .select(col("n"),
            round(col("sy").cast("double") / col("n").cast("double"), 9)
              .as("mu"),
            floor(lit(4.0) * sqrt(sqrt(col("n").cast("double") / lit(100.0))))
              .cast("long").as("bw"))
        val cen = ranked.crossJoin(broadcast(st))
          .select(col("rn"), col("n"), col("bw"),
            (col("ym").cast("double") - col("mu")).cast("decimal(20,9)")
              .as("e"))
          .localCheckpoint(eager = false)
        val cum = graft.operators.ScaleOps.globalRunningSum(cen,
          Seq(col("rn")), col("e"), "s_t")
        val ssq = cum.agg(
          sum(round(col("s_t").cast("double") * col("s_t").cast("double"), 6)
            .cast("decimal(28,6)")).as("ss2d"))
          .select(col("ss2d").cast("double").as("ss2"))
        // lag-j autocovariances for j = 0..bw via a bounded lag join
        // (the daily panel is date-grain bounded at any SF)
        val lagged = cen.select(col("rn"), col("e").cast("double").as("ea"),
          col("n"), col("bw"))
          .join(cen.select(col("rn").as("rn2"),
            col("e").cast("double").as("eb")),
            col("rn2").between(col("rn") - col("bw"), col("rn")))
          .select(col("n"), col("bw"), (col("rn") - col("rn2")).as("j"),
            col("ea"), col("eb"))
          .groupBy(col("n"), col("bw"), col("j"))
          .agg(sum(round(col("ea") * col("eb"), 6).cast("decimal(28,6)"))
            .as("sprod"))
          .select(col("n"), col("bw"), col("j"),
            round(col("sprod").cast("double") / col("n").cast("double"), 9)
              .as("gamma"))
        val lrv = lagged.groupBy(col("n"), col("bw"))
          .agg(sum(round(
            when(col("j") === 0, col("gamma")).otherwise(
              lit(2.0) * (lit(1.0) - col("j").cast("double") /
                (col("bw") + 1).cast("double")) * col("gamma")), 9)
            .cast("decimal(18,9)")).as("lrvd"),
            max(when(col("j") === 0, col("gamma"))).as("gamma0"))
          .select(col("n"), col("bw"), col("gamma0"),
            col("lrvd").cast("double").as("lrv"))
        lrv.crossJoin(broadcast(ssq))
          .select(col("n"), col("bw"),
            round(col("gamma0"), 6).as("gamma0"),
            round(col("lrv"), 6).as("lrv"),
            round(col("ss2") /
              (col("n").cast("double") * col("n").cast("double") *
                col("lrv")), 6).as("kpss_eta"))
      },
      oracle = Some(s"""
        WITH daily AS ($dailyRevenueMSql),
        r AS (SELECT ym, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM daily),
        st AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 ROUND(CAST(SUM(ym) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
                   AS mu,
                 CAST(FLOOR(CAST(4 AS DOUBLE) *
                   sqrt(sqrt(CAST(COUNT(*) AS DOUBLE) / CAST(100 AS DOUBLE))))
                   AS BIGINT) AS bw
          FROM r),
        cen AS MATERIALIZED (
          SELECT rn, st.n, st.bw,
                 CAST(CAST(ym AS DOUBLE) - st.mu AS DECIMAL(20,9)) AS e
          FROM r CROSS JOIN st),
        cum AS (
          SELECT SUM(e) OVER (ORDER BY rn
                   ROWS UNBOUNDED PRECEDING) AS s_t
          FROM cen),
        ssq AS (
          SELECT CAST(SUM(CAST(ROUND(CAST(s_t AS DOUBLE) *
                   CAST(s_t AS DOUBLE), 6) AS DECIMAL(28,6))) AS DOUBLE)
                   AS ss2
          FROM cum),
        lagged AS (
          SELECT a.n, a.bw, a.rn - b.rn AS j,
                 CAST(a.e AS DOUBLE) AS ea, CAST(b.e AS DOUBLE) AS eb
          FROM cen a JOIN cen b
            ON b.rn BETWEEN a.rn - a.bw AND a.rn),
        gam AS (
          SELECT n, bw, j,
                 ROUND(CAST(SUM(CAST(ROUND(ea * eb, 6) AS DECIMAL(28,6)))
                   AS DOUBLE) / CAST(n AS DOUBLE), 9) AS gamma
          FROM lagged GROUP BY 1, 2, 3),
        lrv AS (
          SELECT n, bw,
                 MAX(CASE WHEN j = 0 THEN gamma END) AS gamma0,
                 CAST(SUM(CAST(ROUND(CASE WHEN j = 0 THEN gamma
                   ELSE CAST(2 AS DOUBLE) *
                     (CAST(1 AS DOUBLE) - CAST(j AS DOUBLE) /
                       CAST(bw + 1 AS DOUBLE)) * gamma END, 9)
                   AS DECIMAL(18,9))) AS DOUBLE) AS lrv
          FROM gam GROUP BY 1, 2)
        SELECT n, bw,
               ROUND(gamma0, 6) + CAST(0 AS DOUBLE) AS gamma0,
               ROUND(lrv, 6) + CAST(0 AS DOUBLE) AS lrv,
               ROUND(ssq.ss2 / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * lrv),
                 6) + CAST(0 AS DOUBLE) AS kpss_eta
        FROM lrv CROSS JOIN ssq""")),

    // Lo-MacKinlay variance-ratio test (q = 5) on daily log revenue
    // returns: VR(q) = unbiased q-period variance over q x 1-period
    // variance, with the homoskedastic z — the random-walk diagnostic
    // beside qby's Hurst R/S exponent (Hurst measures long-memory
    // curvature; VR tests a specific horizon). Log returns snap to the
    // 9-grid (ln of ratios of exact DECIMAL(18,8) daily values), the
    // q-period sums are differences of an exact DECIMAL(18,9) running
    // scan, and deviations from q·mu stay on the grid end to end.
    "qd5_variance_ratio" -> Q(
      fn = (s, dir) => {
        val ranked = graft.operators.ScaleOps.globalRowNumber(
          dailyRevenueM(s, dir), Seq(col("day")), "rn")
          .localCheckpoint(eager = false)
        val ret = ranked.select(col("rn").as("rr"),
          col("ym").cast("double").as("ya"))
          .join(ranked.select((col("rn") - 1).as("rr"),
            col("ym").cast("double").as("yb")), Seq("rr"))
          .select(col("rr"),
            round(log(col("yb") / col("ya")), 9).cast("decimal(18,9)")
              .as("rt"))
          .localCheckpoint(eager = false)
        val st = ret.agg(count(lit(1)).as("nq"), sum(col("rt")).as("sr"))
          .select(col("nq"),
            round(col("sr").cast("double") / col("nq").cast("double"), 9)
              .as("mu"))
        val s1 = ret.crossJoin(broadcast(st))
          .select((col("rt").cast("double") - col("mu")).as("d"), col("nq"))
          .agg(sum(round(col("d") * col("d"), 6).cast("decimal(28,6)"))
            .as("sdd"), first(col("nq")).as("nq"))
          .select(round(col("sdd").cast("double") /
            (col("nq") - 1).cast("double"), 9).as("s1"))
        val cum = graft.operators.ScaleOps.globalRunningSum(ret,
          Seq(col("rr")), col("rt"), "ct")
        val win = cum.select(col("rr"), col("ct"))
          .join(cum.select((col("rr") + 5).as("rr"), col("ct").as("cp")),
            Seq("rr"), "left")
          .filter(col("rr") >= 5)
          .crossJoin(broadcast(st))
          .select((col("ct").cast("double") -
            coalesce(col("cp"), lit(0).cast("decimal(18,9)")).cast("double") -
            lit(5.0) * col("mu")).as("dq"), col("nq"))
        val sq = win.agg(
          sum(round(col("dq") * col("dq"), 6).cast("decimal(28,6)"))
            .as("sqq"), first(col("nq")).as("nq"))
          .select(col("nq"),
            round(col("sqq").cast("double") /
              (lit(5.0) * (col("nq") - 4).cast("double") *
                (lit(1.0) - lit(5.0) / col("nq").cast("double"))), 9)
              .as("sq"))
        sq.crossJoin(broadcast(s1))
          .select(col("nq"), lit(5).as("q"),
            round(col("s1"), 6).as("sigma1_sq"),
            round(col("sq"), 6).as("sigmaq_sq"),
            round(col("sq") / col("s1"), 6).as("vr"),
            round((col("sq") / col("s1") - lit(1.0)) /
              sqrt(lit(2.0) * lit(9.0) * lit(4.0) /
                (lit(15.0) * col("nq").cast("double"))), 6).as("z_stat"))
      },
      oracle = Some(s"""
        WITH daily AS ($dailyRevenueMSql),
        r AS (SELECT ym, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM daily),
        ret AS MATERIALIZED (
          SELECT a.rn AS rr,
                 CAST(ROUND(ln(CAST(b.ym AS DOUBLE) / CAST(a.ym AS DOUBLE)),
                   9) AS DECIMAL(18,9)) AS rt
          FROM r a JOIN r b ON b.rn = a.rn + 1),
        st AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS nq,
                 ROUND(CAST(SUM(rt) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
                   AS mu
          FROM ret),
        s1 AS (
          SELECT ROUND(CAST(SUM(CAST(ROUND(
                   (CAST(rt AS DOUBLE) - st.mu) *
                   (CAST(rt AS DOUBLE) - st.mu), 6) AS DECIMAL(28,6)))
                   AS DOUBLE) / CAST(st.nq - 1 AS DOUBLE), 9) AS s1
          FROM ret CROSS JOIN st GROUP BY st.nq),
        cum AS (
          SELECT rr, SUM(rt) OVER (ORDER BY rr ROWS UNBOUNDED PRECEDING)
                   AS ct
          FROM ret),
        win AS (
          SELECT (CAST(a.ct AS DOUBLE) -
                  CAST(COALESCE(b.ct, CAST(0 AS DECIMAL(18,9))) AS DOUBLE) -
                  CAST(5 AS DOUBLE) * st.mu) AS dq, st.nq
          FROM cum a LEFT JOIN cum b ON a.rr = b.rr + 5
          CROSS JOIN st
          WHERE a.rr >= 5),
        sq AS (
          SELECT MAX(nq) AS nq,
                 ROUND(CAST(SUM(CAST(ROUND(dq * dq, 6) AS DECIMAL(28,6)))
                   AS DOUBLE) /
                   (CAST(5 AS DOUBLE) * CAST(MAX(nq) - 4 AS DOUBLE) *
                    (CAST(1 AS DOUBLE) - CAST(5 AS DOUBLE) /
                      CAST(MAX(nq) AS DOUBLE))), 9) AS sq
          FROM win)
        SELECT nq, 5 AS q,
               ROUND(s1.s1, 6) + CAST(0 AS DOUBLE) AS sigma1_sq,
               ROUND(sq.sq, 6) + CAST(0 AS DOUBLE) AS sigmaq_sq,
               ROUND(sq.sq / s1.s1, 6) + CAST(0 AS DOUBLE) AS vr,
               ROUND((sq.sq / s1.s1 - CAST(1 AS DOUBLE)) /
                 sqrt(CAST(2 AS DOUBLE) * CAST(9 AS DOUBLE) *
                   CAST(4 AS DOUBLE) /
                   (CAST(15 AS DOUBLE) * CAST(nq AS DOUBLE))), 6)
                 + CAST(0 AS DOUBLE) AS z_stat
        FROM sq CROSS JOIN s1""")),

    // Inter-event-time structure of the purchase stream: Goh-Barabási
    // burstiness B = (σ-μ)/(σ+μ), the lag-1 memory coefficient
    // (Pearson over consecutive gap pairs), and the daily Fano factor
    // (dispersion of daily purchase counts) — the three standard
    // measures separating Poisson from clustered arrival processes.
    // Gaps are exact BIGINT millisecond differences ordered by
    // (ts, event_id); all second moments ride exact DECIMAL products of
    // DECIMAL(12,0) gaps, cast to DOUBLE before any ratio (every scaled
    // value stays under 2^53, so the casts are exact in both engines).
    "qd6_burstiness_memory" -> Q(
      fn = (s, dir) => {
        val p = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .select(unix_millis(col("ts")).as("ts_ms"), col("event_id"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(p,
          Seq(col("ts_ms"), col("event_id")), "rn")
          .localCheckpoint(eager = false)
        val iet = ranked.select(col("rn"), col("ts_ms").as("t0"))
          .join(ranked.select((col("rn") - 1).as("rn"),
            col("ts_ms").as("t1")), Seq("rn"))
          .select(col("rn"), (col("t1") - col("t0")).as("tau"))
          .localCheckpoint(eager = false)
        val m1 = iet.agg(count(lit(1)).as("ni"),
          sum(col("tau").cast("decimal(28,0)")).as("sx"),
          sum(col("tau").cast("decimal(12,0)") *
            col("tau").cast("decimal(12,0)")).as("sxx"))
          .select(col("ni"), col("sx").cast("double").as("sx"),
            col("sxx").cast("double").as("sxx"))
        val pairs = iet.select(col("rn"), col("tau").as("ta"))
          .join(iet.select((col("rn") - 1).as("rn"), col("tau").as("tb")),
            Seq("rn"))
          .agg(count(lit(1)).as("np"),
            sum(col("ta").cast("decimal(28,0)")).as("sa"),
            sum(col("tb").cast("decimal(28,0)")).as("sb"),
            sum(col("ta").cast("decimal(12,0)") *
              col("ta").cast("decimal(12,0)")).as("saa"),
            sum(col("tb").cast("decimal(12,0)") *
              col("tb").cast("decimal(12,0)")).as("sbb"),
            sum(col("ta").cast("decimal(12,0)") *
              col("tb").cast("decimal(12,0)")).as("sab"))
          .select(col("np").cast("double").as("np"),
            col("sa").cast("double").as("sa"),
            col("sb").cast("double").as("sb"),
            col("saa").cast("double").as("saa"),
            col("sbb").cast("double").as("sbb"),
            col("sab").cast("double").as("sab"))
        val fano = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy((unix_millis(col("ts")) / lit(86400000L)).cast("long")
            .as("day"))
          .agg(count(lit(1)).as("x"))
          .agg(count(lit(1)).as("nd"), sum(col("x")).as("sd1"),
            sum(col("x") * col("x")).as("sd2"))
          .select(col("nd").cast("double").as("nd"),
            col("sd1").cast("double").as("sd1"),
            col("sd2").cast("double").as("sd2"))
        m1.crossJoin(broadcast(pairs)).crossJoin(broadcast(fano))
          .select(col("ni"),
            round((sqrt((col("sxx") - col("sx") * col("sx") /
              col("ni").cast("double")) / (col("ni") - 1).cast("double")) -
              col("sx") / col("ni").cast("double")) /
              (sqrt((col("sxx") - col("sx") * col("sx") /
                col("ni").cast("double")) / (col("ni") - 1).cast("double")) +
                col("sx") / col("ni").cast("double")), 6).as("burstiness"),
            round((col("np") * col("sab") - col("sa") * col("sb")) /
              (sqrt(col("np") * col("saa") - col("sa") * col("sa")) *
                sqrt(col("np") * col("sbb") - col("sb") * col("sb"))), 6)
              .as("memory_coef"),
            round(((col("sd2") - col("sd1") * col("sd1") / col("nd")) /
              (col("nd") - lit(1.0))) / (col("sd1") / col("nd")), 6)
              .as("fano_daily"))
      },
      oracle = Some("""
        WITH p AS (
          SELECT epoch_ms(ts) AS ts_ms, event_id
          FROM events WHERE event_type = 'purchase'),
        r AS (
          SELECT ts_ms,
                 ROW_NUMBER() OVER (ORDER BY ts_ms, event_id) AS rn
          FROM p),
        iet AS MATERIALIZED (
          SELECT a.rn, b.ts_ms - a.ts_ms AS tau
          FROM r a JOIN r b ON b.rn = a.rn + 1),
        m1 AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS ni,
                 CAST(CAST(SUM(CAST(tau AS DECIMAL(28,0))) AS DECIMAL(38,0))
                   AS DOUBLE) AS sx,
                 CAST(SUM(CAST(tau AS DECIMAL(12,0)) *
                   CAST(tau AS DECIMAL(12,0))) AS DOUBLE) AS sxx
          FROM iet),
        pairs AS (
          SELECT CAST(COUNT(*) AS DOUBLE) AS np,
                 CAST(SUM(CAST(a.tau AS DECIMAL(28,0))) AS DOUBLE) AS sa,
                 CAST(SUM(CAST(b.tau AS DECIMAL(28,0))) AS DOUBLE) AS sb,
                 CAST(SUM(CAST(a.tau AS DECIMAL(12,0)) *
                   CAST(a.tau AS DECIMAL(12,0))) AS DOUBLE) AS saa,
                 CAST(SUM(CAST(b.tau AS DECIMAL(12,0)) *
                   CAST(b.tau AS DECIMAL(12,0))) AS DOUBLE) AS sbb,
                 CAST(SUM(CAST(a.tau AS DECIMAL(12,0)) *
                   CAST(b.tau AS DECIMAL(12,0))) AS DOUBLE) AS sab
          FROM iet a JOIN iet b ON b.rn = a.rn + 1),
        fano AS (
          SELECT CAST(COUNT(*) AS DOUBLE) AS nd,
                 CAST(SUM(x) AS DOUBLE) AS sd1,
                 CAST(SUM(x * x) AS DOUBLE) AS sd2
          FROM (SELECT CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
                       CAST(COUNT(*) AS BIGINT) AS x
                FROM events WHERE event_type = 'purchase' GROUP BY 1))
        SELECT ni,
               ROUND((sqrt((sxx - sx * sx / CAST(ni AS DOUBLE)) /
                   CAST(ni - 1 AS DOUBLE)) - sx / CAST(ni AS DOUBLE)) /
                 (sqrt((sxx - sx * sx / CAST(ni AS DOUBLE)) /
                   CAST(ni - 1 AS DOUBLE)) + sx / CAST(ni AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS burstiness,
               ROUND((np * sab - sa * sb) /
                 (sqrt(np * saa - sa * sa) * sqrt(np * sbb - sb * sb)), 6)
                 + CAST(0 AS DOUBLE) AS memory_coef,
               ROUND(((sd2 - sd1 * sd1 / nd) / (nd - CAST(1 AS DOUBLE))) /
                 (sd1 / nd), 6) + CAST(0 AS DOUBLE) AS fano_daily
        FROM m1 CROSS JOIN pairs CROSS JOIN fano""")),

    // ICC(1) intraclass correlation of order value within order priority:
    // the one-way random-effects decomposition (how much of the price
    // variance is "between priorities"?) with the unbalanced-design k0 =
    // (N - Σni²/N)/(a-1) — the agreement/clustering coefficient qbn's
    // ANOVA F omits. Group squares are computed IN DECIMAL ((12,2)² per
    // rule 13), the >2^53-scaled Σy² decimals bridge to DOUBLE through
    // VARCHAR in DuckDB (its int128→double cast double-rounds), and the
    // between-group terms ni·d² multiply INTEGER × 9-grid in DECIMAL
    // (rule 15).
    "qd8_icc_oneway" -> Q(
      fn = (s, dir) => {
        val g = t(s, dir, "orders")
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("ni"),
            sum(col("o_totalprice").cast("decimal(18,2)")).as("syd"),
            sum(col("o_totalprice").cast("decimal(12,2)") *
              col("o_totalprice").cast("decimal(12,2)")).as("syyd"))
          .select(col("ni"), col("syd").cast("double").as("syg"),
            col("syyd").cast("double").as("syyg"))
          .localCheckpoint(eager = false)
        val tot = g.agg(sum(col("ni")).as("nn"), count(lit(1)).as("a"),
          sum(col("syg")).as("sy0"), sum(col("ni") * col("ni")).as("sni2"))
          .select(col("nn"), col("a"), col("sni2"),
            round(col("sy0") / col("nn").cast("double"), 9).as("ybar"))
        val parts = g.crossJoin(broadcast(tot))
          .select(col("ni"), col("nn"), col("a"), col("sni2"),
            round(col("syyg") - col("syg") * col("syg") /
              col("ni").cast("double"), 6).as("ssw_g"),
            (round(col("syg") / col("ni").cast("double"), 9) - col("ybar"))
              .as("dg"))
          .select(col("ni"), col("nn"), col("a"), col("sni2"),
            col("ssw_g"), round(col("dg") * col("dg"), 9).as("dg2"))
          .agg(
            sum(col("ssw_g").cast("decimal(28,6)")).as("sswd"),
            sum(col("ni").cast("decimal(10,0)") *
              col("dg2").cast("decimal(20,9)")).as("ssbd"),
            first(col("nn")).as("nn"), first(col("a")).as("a"),
            first(col("sni2")).as("sni2"))
        parts.select(col("nn").as("n"), col("a"),
          round((col("nn").cast("double") -
            col("sni2").cast("double") / col("nn").cast("double")) /
            (col("a") - 1).cast("double"), 6).as("k0"),
          round((col("ssbd").cast("double") / (col("a") - 1).cast("double")) /
            (col("sswd").cast("double") / (col("nn") - col("a"))
              .cast("double")), 6).as("f_anova"),
          round(
            (col("ssbd").cast("double") / (col("a") - 1).cast("double") -
              col("sswd").cast("double") / (col("nn") - col("a"))
                .cast("double")) /
            (col("ssbd").cast("double") / (col("a") - 1).cast("double") +
              ((col("nn").cast("double") -
                col("sni2").cast("double") / col("nn").cast("double")) /
                (col("a") - 1).cast("double") - lit(1.0)) *
                (col("sswd").cast("double") / (col("nn") - col("a"))
                  .cast("double"))), 6).as("icc1"))
      },
      oracle = Some("""
        WITH g AS (
          SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS ni,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS syg,
                 CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) *
                   CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR)
                   AS DOUBLE) AS syyg
          FROM orders GROUP BY 1),
        tot AS (
          SELECT CAST(SUM(ni) AS BIGINT) AS nn,
                 CAST(COUNT(*) AS BIGINT) AS a,
                 CAST(SUM(ni * ni) AS BIGINT) AS sni2,
                 ROUND(SUM(syg) / CAST(SUM(ni) AS DOUBLE), 9) AS ybar
          FROM g),
        parts AS (
          SELECT
            CAST(SUM(CAST(ROUND(syyg - syg * syg / CAST(ni AS DOUBLE), 6)
              AS DECIMAL(28,6))) AS DOUBLE) AS ssw,
            CAST(SUM(CAST(ni AS DECIMAL(10,0)) *
              CAST(ROUND((ROUND(syg / CAST(ni AS DOUBLE), 9) - tot.ybar) *
                (ROUND(syg / CAST(ni AS DOUBLE), 9) - tot.ybar), 9)
                AS DECIMAL(20,9))) AS DOUBLE) AS ssb,
            MAX(tot.nn) AS nn, MAX(tot.a) AS a, MAX(tot.sni2) AS sni2
          FROM g CROSS JOIN tot)
        SELECT nn AS n, a,
               ROUND((CAST(nn AS DOUBLE) -
                 CAST(sni2 AS DOUBLE) / CAST(nn AS DOUBLE)) /
                 CAST(a - 1 AS DOUBLE), 6) + CAST(0 AS DOUBLE) AS k0,
               ROUND((ssb / CAST(a - 1 AS DOUBLE)) /
                 (ssw / CAST(nn - a AS DOUBLE)), 6) + CAST(0 AS DOUBLE)
                 AS f_anova,
               ROUND((ssb / CAST(a - 1 AS DOUBLE) -
                   ssw / CAST(nn - a AS DOUBLE)) /
                 (ssb / CAST(a - 1 AS DOUBLE) +
                   ((CAST(nn AS DOUBLE) -
                     CAST(sni2 AS DOUBLE) / CAST(nn AS DOUBLE)) /
                     CAST(a - 1 AS DOUBLE) - CAST(1 AS DOUBLE)) *
                   (ssw / CAST(nn - a AS DOUBLE))), 6) + CAST(0 AS DOUBLE)
                 AS icc1
        FROM parts""")),

    // Method-comparison of the two daily "business volume" instruments —
    // order-dated revenue (o_totalprice) vs ship-dated invoice value
    // (Σ extprice·(1-disc)·(1+tax)) — via Bland-Altman limits of
    // agreement and Deming errors-in-variables regression (λ = 1): the
    // right tools when BOTH series carry noise, where q6q's OLS would
    // attenuate the slope. Both series are exact DECIMAL in millions
    // (the /1e6 quotients have ≤12 decimals, within double-roundtrip
    // recovery in both engines); the ±1.96·sd band and the intercept
    // multiply grid values in DECIMAL per rule 15.
    "qd9_bland_altman_deming" -> Q(
      fn = (s, dir) => {
        val a = dailyRevenueM(s, dir)
        val b = t(s, dir, "lineitem")
          .groupBy(expr("unix_millis(CAST(l_shipdate AS TIMESTAMP))" +
            " div 86400000").as("day"))
          .agg((sum(col("l_extendedprice").cast("decimal(12,2)") *
            (lit(1).cast("decimal(4,2)") -
              col("l_discount").cast("decimal(4,2)")) *
            (lit(1).cast("decimal(4,2)") +
              col("l_tax").cast("decimal(4,2)"))) / lit(1000000))
            .cast("decimal(24,12)").as("yb"))
        val j = a.join(b, Seq("day"))
          .select(col("ym").as("ya"), col("yb"),
            (col("ym") - col("yb")).as("d"))
          .localCheckpoint(eager = false)
        val st = j.agg(count(lit(1)).as("n"), sum(col("d")).as("sdd"),
          sum(col("ya")).as("sya"), sum(col("yb")).as("syb"))
          .select(col("n"),
            round(col("sdd").cast("double") / col("n").cast("double"), 9)
              .as("md"),
            round(col("sya").cast("double") / col("n").cast("double"), 9)
              .as("mx"),
            round(col("syb").cast("double") / col("n").cast("double"), 9)
              .as("my"))
        val mom = j.crossJoin(broadcast(st))
          .select(col("n"), col("md"), col("mx"), col("my"),
            (col("d").cast("double") - col("md")).as("cd"),
            (col("ya").cast("double") - col("mx")).as("cx"),
            (col("yb").cast("double") - col("my")).as("cy"))
          .agg(
            sum(round(col("cd") * col("cd"), 6).cast("decimal(28,6)"))
              .as("sdd2"),
            sum(round(col("cx") * col("cx"), 6).cast("decimal(28,6)"))
              .as("sxx"),
            sum(round(col("cy") * col("cy"), 6).cast("decimal(28,6)"))
              .as("syy"),
            sum(round(col("cx") * col("cy"), 6).cast("decimal(28,6)"))
              .as("sxy"),
            first(col("n")).as("n"), first(col("md")).as("md"),
            first(col("mx")).as("mx"), first(col("my")).as("my"))
        val pre = mom.select(col("n"), col("md"), col("mx"), col("my"),
          round(sqrt(col("sdd2").cast("double") /
            (col("n") - 1).cast("double")), 9).as("sd"),
          col("sxx").cast("double").as("sxx"),
          col("syy").cast("double").as("syy"),
          col("sxy").cast("double").as("sxy"))
          .withColumn("slope_raw",
            (col("syy") - col("sxx") +
              sqrt((col("syy") - col("sxx")) * (col("syy") - col("sxx")) +
                lit(4.0) * col("sxy") * col("sxy"))) /
              (lit(2.0) * col("sxy")))
        pre.select(col("n"),
          round(col("md"), 6).as("mean_diff"),
          round(col("sd"), 6).as("sd_diff"),
          round(col("md").cast("decimal(20,9)") -
            lit(1.96).cast("decimal(3,2)") * col("sd").cast("decimal(12,9)"),
            6).cast("double").as("loa_low"),
          round(col("md").cast("decimal(20,9)") +
            lit(1.96).cast("decimal(3,2)") * col("sd").cast("decimal(12,9)"),
            6).cast("double").as("loa_high"),
          round(col("slope_raw"), 6).as("deming_slope"),
          round(col("my").cast("decimal(20,9)") -
            round(col("slope_raw"), 9).cast("decimal(12,9)") *
              col("mx").cast("decimal(20,9)"), 6).cast("double")
            .as("deming_intercept"))
      },
      oracle = Some(s"""
        WITH a AS ($dailyRevenueMSql),
        b AS (
          SELECT CAST(epoch_ms(l_shipdate) // 86400000 AS BIGINT) AS day,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                   (CAST(1 AS DECIMAL(4,2)) -
                     CAST(l_discount AS DECIMAL(4,2))) *
                   (CAST(1 AS DECIMAL(4,2)) +
                     CAST(l_tax AS DECIMAL(4,2)))) / 1000000
                   AS DECIMAL(24,12)) AS yb
          FROM lineitem GROUP BY 1),
        j AS MATERIALIZED (
          SELECT a.ym AS ya, b.yb, a.ym - b.yb AS d
          FROM a JOIN b USING (day)),
        st AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 ROUND(CAST(SUM(d) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
                   AS md,
                 ROUND(CAST(SUM(ya) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
                   AS mx,
                 ROUND(CAST(SUM(yb) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
                   AS my
          FROM j),
        mom AS (
          SELECT MAX(st.n) AS n, MAX(st.md) AS md, MAX(st.mx) AS mx,
                 MAX(st.my) AS my,
                 CAST(SUM(CAST(ROUND((CAST(d AS DOUBLE) - st.md) *
                   (CAST(d AS DOUBLE) - st.md), 6) AS DECIMAL(28,6)))
                   AS DOUBLE) AS sdd2,
                 CAST(SUM(CAST(ROUND((CAST(ya AS DOUBLE) - st.mx) *
                   (CAST(ya AS DOUBLE) - st.mx), 6) AS DECIMAL(28,6)))
                   AS DOUBLE) AS sxx,
                 CAST(SUM(CAST(ROUND((CAST(yb AS DOUBLE) - st.my) *
                   (CAST(yb AS DOUBLE) - st.my), 6) AS DECIMAL(28,6)))
                   AS DOUBLE) AS syy,
                 CAST(SUM(CAST(ROUND((CAST(ya AS DOUBLE) - st.mx) *
                   (CAST(yb AS DOUBLE) - st.my), 6) AS DECIMAL(28,6)))
                   AS DOUBLE) AS sxy
          FROM j CROSS JOIN st),
        pre AS (
          SELECT n, md, mx, my,
                 ROUND(sqrt(sdd2 / CAST(n - 1 AS DOUBLE)), 9) AS sd,
                 sxx, syy, sxy,
                 (syy - sxx + sqrt((syy - sxx) * (syy - sxx) +
                   CAST(4 AS DOUBLE) * sxy * sxy)) /
                   (CAST(2 AS DOUBLE) * sxy) AS slope_raw
          FROM mom)
        SELECT n,
               ROUND(md, 6) + CAST(0 AS DOUBLE) AS mean_diff,
               ROUND(sd, 6) + CAST(0 AS DOUBLE) AS sd_diff,
               CAST(ROUND(CAST(md AS DECIMAL(20,9)) -
                 CAST(1.96 AS DECIMAL(3,2)) * CAST(sd AS DECIMAL(12,9)), 6)
                 AS DOUBLE) AS loa_low,
               CAST(ROUND(CAST(md AS DECIMAL(20,9)) +
                 CAST(1.96 AS DECIMAL(3,2)) * CAST(sd AS DECIMAL(12,9)), 6)
                 AS DOUBLE) AS loa_high,
               ROUND(slope_raw, 6) + CAST(0 AS DOUBLE) AS deming_slope,
               CAST(ROUND(CAST(my AS DECIMAL(20,9)) -
                 CAST(ROUND(slope_raw, 9) AS DECIMAL(12,9)) *
                   CAST(mx AS DECIMAL(20,9)), 6) AS DOUBLE)
                 AS deming_intercept
        FROM pre""")),

    // Detrended fluctuation analysis of the daily revenue series: box
    // sizes 4/8/16/32, per-box linear detrend via the closed-form
    // SSE = Syy - Sxy²/Sxx (local x is 1..s, so Sxx = s(s²-1)/12 is an
    // exact integer and Σdx = 0 kills the centering cross-term), and the
    // scaling exponent α as the OLS slope of ln F(s) on ln s — the
    // long-memory measure that, unlike qby's Hurst R/S, is robust to
    // the series' nonstationary trend. The profile rides the exact
    // DECIMAL(20,9) running scan; the 4-point log-log fit sums 9-grid
    // terms in DECIMAL so the tiny aggregation is order-free.
    "qd7_dfa_exponent" -> Q(
      fn = (s, dir) => {
        val ranked = graft.operators.ScaleOps.globalRowNumber(
          dailyRevenueM(s, dir), Seq(col("day")), "rn")
          .localCheckpoint(eager = false)
        val st = ranked.agg(count(lit(1)).as("n"), sum(col("ym")).as("sy"))
          .select(col("n"),
            round(col("sy").cast("double") / col("n").cast("double"), 9)
              .as("mu"))
        val cen = ranked.crossJoin(broadcast(st))
          .select(col("rn"), col("n"),
            (col("ym").cast("double") - col("mu")).cast("decimal(20,9)")
              .as("e"))
        val cum = graft.operators.ScaleOps.globalRunningSum(cen,
          Seq(col("rn")), col("e"), "y").localCheckpoint(eager = false)
        val sizes = cum.sparkSession.range(1)
          .select(explode(array(lit(4L), lit(8L), lit(16L), lit(32L)))
            .as("bs"))
        val boxed = cum.crossJoin(broadcast(sizes))
          .withColumn("b", expr("(rn - 1) div bs"))
          .filter(expr("b < (n div bs)"))
          .select(col("bs"), col("b"),
            (col("rn") - col("b") * col("bs")).as("lx"),
            col("y").cast("double").as("yd"))
        val perBox = boxed
          .select(col("bs"), col("b"), col("yd"),
            (col("lx").cast("double") -
              (col("bs") + 1).cast("double") / lit(2.0)).as("dxl"))
          .groupBy(col("bs"), col("b"))
          .agg(count(lit(1)).as("cnt"),
            sum(col("yd").cast("decimal(20,9)")).as("syd"),
            sum(round(col("yd") * col("yd"), 6).cast("decimal(28,6)"))
              .as("syyd"),
            sum(round(col("dxl") * col("yd"), 6).cast("decimal(28,6)"))
              .as("sxyd"))
          .select(col("bs"), col("b"),
            round(
              (col("syyd").cast("double") -
                col("bs").cast("double") *
                  round(
                    round(col("syd").cast("double") /
                      col("bs").cast("double"), 9) *
                    round(col("syd").cast("double") /
                      col("bs").cast("double"), 9), 9)) -
              round(col("sxyd").cast("double") * col("sxyd").cast("double") /
                expr("bs * (bs * bs - 1) div 12").cast("double"), 9), 9)
              .as("sse"))
        val perS = perBox.groupBy(col("bs"))
          .agg(count(lit(1)).as("nb"),
            sum(col("sse").cast("decimal(28,9)")).as("ssed"))
          .select(col("bs"), col("nb"),
            round(sqrt(round(col("ssed").cast("double") /
              (col("nb") * col("bs")).cast("double"), 9)), 9).as("fs"))
          .select(col("bs"), col("fs"),
            round(log(col("bs").cast("double")), 9).as("lxs"),
            round(log(col("fs")), 9).as("lys"))
          .localCheckpoint(eager = false)
        val fit = perS.agg(count(lit(1)).as("k"),
          sum(col("lxs").cast("decimal(18,9)")).as("slx"),
          sum(col("lys").cast("decimal(18,9)")).as("sly"),
          sum(round(col("lxs") * col("lys"), 9).cast("decimal(18,9)"))
            .as("sxy"),
          sum(round(col("lxs") * col("lxs"), 9).cast("decimal(18,9)"))
            .as("sxx"))
          .select(round(
            (col("k").cast("double") * col("sxy").cast("double") -
              col("slx").cast("double") * col("sly").cast("double")) /
            (col("k").cast("double") * col("sxx").cast("double") -
              col("slx").cast("double") * col("slx").cast("double")), 6)
            .as("alpha"))
        val wide = perS.groupBy()
          .agg(max(when(col("bs") === 4, col("fs"))).as("f4"),
            max(when(col("bs") === 8, col("fs"))).as("f8"),
            max(when(col("bs") === 16, col("fs"))).as("f16"),
            max(when(col("bs") === 32, col("fs"))).as("f32"))
        st.select(col("n")).crossJoin(broadcast(wide))
          .crossJoin(broadcast(fit))
          .select(col("n"),
            round(col("f4"), 6).as("f4"), round(col("f8"), 6).as("f8"),
            round(col("f16"), 6).as("f16"), round(col("f32"), 6).as("f32"),
            col("alpha"))
      },
      oracle = Some(s"""
        WITH daily AS ($dailyRevenueMSql),
        r AS (SELECT ym, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM daily),
        st AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 ROUND(CAST(SUM(ym) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
                   AS mu
          FROM r),
        cen AS (
          SELECT rn, st.n,
                 CAST(CAST(ym AS DOUBLE) - st.mu AS DECIMAL(20,9)) AS e
          FROM r CROSS JOIN st),
        cum AS MATERIALIZED (
          SELECT rn, n,
                 SUM(e) OVER (ORDER BY rn ROWS UNBOUNDED PRECEDING) AS y
          FROM cen),
        sizes AS (SELECT CAST(UNNEST([4, 8, 16, 32]) AS BIGINT) AS bs),
        boxed AS (
          SELECT bs, (rn - 1) // bs AS b,
                 rn - ((rn - 1) // bs) * bs AS lx,
                 CAST(y AS DOUBLE) AS yd
          FROM cum CROSS JOIN sizes
          WHERE (rn - 1) // bs < n // bs),
        perbox AS (
          SELECT bs, b,
                 CAST(SUM(CAST(yd AS DECIMAL(20,9))) AS DOUBLE) AS syd,
                 CAST(SUM(CAST(ROUND(yd * yd, 6) AS DECIMAL(28,6)))
                   AS DOUBLE) AS syy,
                 CAST(SUM(CAST(ROUND((CAST(lx AS DOUBLE) -
                   CAST(bs + 1 AS DOUBLE) / CAST(2 AS DOUBLE)) * yd, 6)
                   AS DECIMAL(28,6))) AS DOUBLE) AS sxy
          FROM boxed GROUP BY 1, 2),
        sse AS (
          SELECT bs, b,
                 ROUND((syy - CAST(bs AS DOUBLE) *
                     ROUND(ROUND(syd / CAST(bs AS DOUBLE), 9) *
                       ROUND(syd / CAST(bs AS DOUBLE), 9), 9)) -
                   ROUND(sxy * sxy /
                     CAST(bs * (bs * bs - 1) // 12 AS DOUBLE), 9), 9)
                   AS sse
          FROM perbox),
        pers AS MATERIALIZED (
          SELECT bs,
                 ROUND(sqrt(ROUND(
                   CAST(SUM(CAST(sse AS DECIMAL(28,9))) AS DOUBLE) /
                   CAST(COUNT(*) * bs AS DOUBLE), 9)), 9) AS fs
          FROM sse GROUP BY 1),
        pers2 AS (
          SELECT bs, fs,
                 ROUND(ln(CAST(bs AS DOUBLE)), 9) AS lxs,
                 ROUND(ln(fs), 9) AS lys
          FROM pers),
        fit AS (
          SELECT ROUND(
            (CAST(COUNT(*) AS DOUBLE) *
              CAST(SUM(CAST(ROUND(lxs * lys, 9) AS DECIMAL(18,9)))
                AS DOUBLE) -
             CAST(SUM(CAST(lxs AS DECIMAL(18,9))) AS DOUBLE) *
              CAST(SUM(CAST(lys AS DECIMAL(18,9))) AS DOUBLE)) /
            (CAST(COUNT(*) AS DOUBLE) *
              CAST(SUM(CAST(ROUND(lxs * lxs, 9) AS DECIMAL(18,9)))
                AS DOUBLE) -
             CAST(SUM(CAST(lxs AS DECIMAL(18,9))) AS DOUBLE) *
              CAST(SUM(CAST(lxs AS DECIMAL(18,9))) AS DOUBLE)), 6)
            AS alpha
          FROM pers2),
        wide AS (
          SELECT MAX(CASE WHEN bs = 4 THEN fs END) AS f4,
                 MAX(CASE WHEN bs = 8 THEN fs END) AS f8,
                 MAX(CASE WHEN bs = 16 THEN fs END) AS f16,
                 MAX(CASE WHEN bs = 32 THEN fs END) AS f32
          FROM pers2)
        SELECT st.n,
               ROUND(f4, 6) + CAST(0 AS DOUBLE) AS f4,
               ROUND(f8, 6) + CAST(0 AS DOUBLE) AS f8,
               ROUND(f16, 6) + CAST(0 AS DOUBLE) AS f16,
               ROUND(f32, 6) + CAST(0 AS DOUBLE) AS f32,
               alpha + CAST(0 AS DOUBLE) AS alpha
        FROM st CROSS JOIN wide CROSS JOIN fit""")),

    // Kulldorff-style temporal scan statistic over the 30-day window
    // lattice: for every contiguous day window, the Poisson LLR of the
    // purchase count against its share-of-all-events expectation,
    // c·ln(c/e) + (C-c)·ln((C-c)/(C-e)) when c exceeds e — the
    // disease-surveillance "hot window" detector beside q4w's two-sigma
    // spike flags (which test days independently; the scan finds the
    // jointly most anomalous INTERVAL). Window sums are differences of
    // exact integer running sums; the c > e gate compares c·N > C·n_w in
    // exact BIGINTs; ln is the only float link. Top 10 windows by LLR
    // with the (i, j) tiebreak.
    "qda_temporal_scan" -> Q(
      fn = (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy((unix_millis(col("ts")) / lit(86400000L)).cast("long")
            .as("day"))
          .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("c"), count(lit(1)).as("nall"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(daily,
          Seq(col("day")), "rn")
        val cum1 = graft.operators.ScaleOps.globalRunningSum(ranked,
          Seq(col("rn")), col("c"), "cc")
        val cum2 = graft.operators.ScaleOps.globalRunningSum(cum1,
          Seq(col("rn")), col("nall"), "cn")
          .select(col("rn"), col("cc"), col("cn"))
          .localCheckpoint(eager = false)
        val z = cum2.unionByName(
          cum2.sparkSession.range(1).select(lit(0L).as("rn"),
            lit(0L).as("cc"), lit(0L).as("cn")))
        val tot = cum2.agg(max(col("cc")).as("ctot"), max(col("cn")).as("ntot"))
        val wins = z.select(col("rn").as("i0"), col("cc").as("cci"),
          col("cn").as("cni"))
          .join(z.select(col("rn").as("j"), col("cc").as("ccj"),
            col("cn").as("cnj")), col("i0") < col("j"))
          .crossJoin(broadcast(tot))
          .select((col("i0") + 1).as("i"), col("j"),
            (col("ccj") - col("cci")).as("cw"),
            (col("cnj") - col("cni")).as("nw"),
            col("ctot"), col("ntot"))
          .filter(col("cw") * col("ntot") > col("ctot") * col("nw"))
          .select(col("i"), col("j"), col("cw"), col("nw"),
            round(col("ctot").cast("double") * col("nw").cast("double") /
              col("ntot").cast("double"), 6).as("e_w"),
            round(
              col("cw").cast("double") *
                log(col("cw").cast("double") /
                  (col("ctot").cast("double") * col("nw").cast("double") /
                    col("ntot").cast("double"))) +
              when(col("ctot") > col("cw"),
                (col("ctot") - col("cw")).cast("double") *
                  log((col("ctot") - col("cw")).cast("double") /
                    (col("ctot").cast("double") -
                      col("ctot").cast("double") * col("nw").cast("double") /
                        col("ntot").cast("double")))).otherwise(lit(0.0)),
              6).as("llr"))
        wins.orderBy(col("llr").desc, col("i"), col("j")).limit(10)
      },
      oracle = Some("""
        WITH daily AS (
          SELECT CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
                 CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                   END) AS BIGINT) AS c,
                 CAST(COUNT(*) AS BIGINT) AS nall
          FROM events GROUP BY 1),
        r AS (
          SELECT c, nall, ROW_NUMBER() OVER (ORDER BY day) AS rn
          FROM daily),
        cum AS (
          SELECT rn,
                 SUM(c) OVER (ORDER BY rn ROWS UNBOUNDED PRECEDING) AS cc,
                 SUM(nall) OVER (ORDER BY rn ROWS UNBOUNDED PRECEDING) AS cn
          FROM r),
        z AS (
          SELECT CAST(rn AS BIGINT) AS rn, CAST(cc AS BIGINT) AS cc,
                 CAST(cn AS BIGINT) AS cn
          FROM cum
          UNION ALL SELECT 0, 0, 0),
        tot AS (
          SELECT MAX(cc) AS ctot, MAX(cn) AS ntot FROM z),
        wins AS (
          SELECT a.rn + 1 AS i, b.rn AS j,
                 b.cc - a.cc AS cw, b.cn - a.cn AS nw, t.ctot, t.ntot
          FROM z a JOIN z b ON a.rn < b.rn CROSS JOIN tot t
          WHERE (b.cc - a.cc) * t.ntot > t.ctot * (b.cn - a.cn)),
        scored AS (
          SELECT CAST(i AS BIGINT) AS i, CAST(j AS BIGINT) AS j, cw, nw,
                 ROUND(CAST(ctot AS DOUBLE) * CAST(nw AS DOUBLE) /
                   CAST(ntot AS DOUBLE), 6) + CAST(0 AS DOUBLE) AS e_w,
                 ROUND(CAST(cw AS DOUBLE) *
                     ln(CAST(cw AS DOUBLE) /
                       (CAST(ctot AS DOUBLE) * CAST(nw AS DOUBLE) /
                         CAST(ntot AS DOUBLE))) +
                   CASE WHEN ctot > cw THEN
                     CAST(ctot - cw AS DOUBLE) *
                       ln(CAST(ctot - cw AS DOUBLE) /
                         (CAST(ctot AS DOUBLE) -
                           CAST(ctot AS DOUBLE) * CAST(nw AS DOUBLE) /
                             CAST(ntot AS DOUBLE)))
                   ELSE CAST(0 AS DOUBLE) END, 6) + CAST(0 AS DOUBLE)
                   AS llr
          FROM wins)
        SELECT * FROM scored
        ORDER BY llr DESC, i, j LIMIT 10""")),

    // G-test (likelihood-ratio chi-square) of independence between event
    // type and week-phase (epoch-day mod 7), next to q6s's Pearson
    // chi-square: the G statistic is additive under partitioning and is
    // what large-count Poisson models actually maximize. Both statistics
    // come off the same margins; cells are exact BIGINTs, expectations
    // are raw ratios of exact integers, per-cell terms snap to the
    // 9-grid and sum in DECIMAL; ln is the only float link.
    "qdb_g_test_independence" -> Q(
      fn = (s, dir) => {
        val cells = t(s, dir, "events")
          .select(col("event_type"),
            pmod((unix_millis(col("ts")) / lit(86400000L)).cast("long"),
              lit(7L)).as("dow"))
          .groupBy(col("event_type"), col("dow"))
          .agg(count(lit(1)).as("nij"))
        val rows = cells.groupBy(col("event_type"))
          .agg(sum(col("nij")).as("ri"))
        val cols = cells.groupBy(col("dow")).agg(sum(col("nij")).as("cj"))
        val tot = cells.agg(sum(col("nij")).as("nn"),
          countDistinct(col("event_type")).as("r"),
          countDistinct(col("dow")).as("c"))
        val terms = cells.join(rows, Seq("event_type"))
          .join(cols, Seq("dow")).crossJoin(broadcast(tot))
          .select(col("nij"), col("nn"), col("r"), col("c"),
            (col("ri").cast("double") * col("cj").cast("double") /
              col("nn").cast("double")).as("eij"))
        val agg = terms.agg(
          sum(round(col("nij").cast("double") *
            log(col("nij").cast("double") / col("eij")), 9)
            .cast("decimal(18,9)")).as("gsum"),
          sum(round((col("nij").cast("double") - col("eij")) *
            (col("nij").cast("double") - col("eij")) / col("eij"), 9)
            .cast("decimal(18,9)")).as("x2sum"),
          first(col("nn")).as("n"),
          first((col("r") - 1) * (col("c") - 1)).as("df"))
        agg.select(col("n"), col("df"),
          round(lit(2.0) * col("gsum").cast("double"), 6).as("g_stat"),
          round(col("x2sum").cast("double"), 6).as("chi2"))
      },
      oracle = Some("""
        WITH cells AS (
          SELECT event_type,
                 (CAST(epoch_ms(ts) // 86400000 AS BIGINT) % 7) AS dow,
                 CAST(COUNT(*) AS BIGINT) AS nij
          FROM events GROUP BY 1, 2),
        rows_m AS (
          SELECT event_type, CAST(SUM(nij) AS BIGINT) AS ri
          FROM cells GROUP BY 1),
        cols_m AS (
          SELECT dow, CAST(SUM(nij) AS BIGINT) AS cj FROM cells GROUP BY 1),
        tot AS (
          SELECT CAST(SUM(nij) AS BIGINT) AS nn,
                 CAST(COUNT(DISTINCT event_type) AS BIGINT) AS r,
                 CAST(COUNT(DISTINCT dow) AS BIGINT) AS c
          FROM cells),
        terms AS (
          SELECT nij, nn, r, c,
                 CAST(ri AS DOUBLE) * CAST(cj AS DOUBLE) /
                   CAST(nn AS DOUBLE) AS eij
          FROM cells JOIN rows_m USING (event_type)
          JOIN cols_m USING (dow) CROSS JOIN tot),
        agg AS (
          SELECT MAX(nn) AS n, MAX((r - 1) * (c - 1)) AS df,
                 SUM(CAST(ROUND(CAST(nij AS DOUBLE) *
                   ln(CAST(nij AS DOUBLE) / eij), 9) AS DECIMAL(18,9)))
                   AS gsum,
                 SUM(CAST(ROUND((CAST(nij AS DOUBLE) - eij) *
                   (CAST(nij AS DOUBLE) - eij) / eij, 9) AS DECIMAL(18,9)))
                   AS x2sum
          FROM terms)
        SELECT n, df,
               ROUND(CAST(2 AS DOUBLE) * CAST(gsum AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS g_stat,
               ROUND(CAST(x2sum AS DOUBLE), 6) + CAST(0 AS DOUBLE) AS chi2
        FROM agg""")),

    // Fisher-z inference for the daily revenue × event-count correlation:
    // the z transform 0.5·ln((1+r)/(1-r)), its exact-n standard error,
    // the 95% CI in z-space (the back-transform needs exp — not
    // oracle-safe, per the q5a sigmoid lesson — so the CI is reported on
    // the z scale, where it is exact), and the two-sample z comparison
    // of the month-half correlations — the inference layer q8c's
    // correlation matrix stops short of. One three-panel UNION ALL
    // moment pass (all/first/second) serves every r.
    "qdc_fisher_z_correlation" -> Q(
      fn = (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy((unix_millis(col("ts")) / lit(86400000L)).cast("long")
            .as("day"))
          .agg(count(lit(1)).as("x"),
            sum(coalesce(col("value"), lit(0.0)).cast("decimal(18,2)"))
              .as("v"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(daily,
          Seq(col("day")), "rn").localCheckpoint(eager = false)
        val n0 = ranked.agg(count(lit(1)).as("nt"))
        val seg = ranked.crossJoin(broadcast(n0))
          .select(col("rn"), col("x"), col("v"),
            when(col("rn") * 2 <= col("nt"), lit(1)).otherwise(lit(2))
              .as("sg"))
        val grps = seg.select(col("x"), col("v"), lit(0).as("sg"))
          .unionByName(seg.select(col("x"), col("v"), col("sg")))
          .localCheckpoint(eager = false)
        val gst = grps.groupBy(col("sg"))
          .agg(count(lit(1)).as("cnt"), sum(col("x")).as("sx"),
            sum(col("v")).as("sv"))
          .select(col("sg"), col("cnt"),
            round(col("sx").cast("double") / col("cnt").cast("double"), 9)
              .as("mx"),
            round(col("sv").cast("double") / col("cnt").cast("double"), 9)
              .as("mv"))
        val rs = grps.join(gst, Seq("sg"))
          .select(col("sg"), col("cnt"),
            (col("x").cast("double") - col("mx")).as("cx"),
            (col("v").cast("double") - col("mv")).as("cv"))
          .groupBy(col("sg"))
          .agg(first(col("cnt")).as("cnt"),
            sum(round(col("cx") * col("cx"), 6).cast("decimal(28,6)"))
              .as("sxx"),
            sum(round(col("cv") * col("cv"), 6).cast("decimal(28,6)"))
              .as("svv"),
            sum(round(col("cx") * col("cv"), 6).cast("decimal(28,6)"))
              .as("sxv"))
          .select(col("sg"), col("cnt"),
            round(col("sxv").cast("double") /
              (sqrt(col("sxx").cast("double")) *
                sqrt(col("svv").cast("double"))), 9).as("r"))
          .select(col("sg"), col("cnt"), col("r"),
            round(lit(0.5) * log((lit(1.0) + col("r")) /
              (lit(1.0) - col("r"))), 9).as("z"))
        val wide = rs.groupBy().agg(
          max(when(col("sg") === 0, col("cnt"))).as("n"),
          max(when(col("sg") === 0, col("r"))).as("r_all"),
          max(when(col("sg") === 0, col("z"))).as("z_all"),
          max(when(col("sg") === 1, col("cnt"))).as("n1"),
          max(when(col("sg") === 1, col("r"))).as("r_first"),
          max(when(col("sg") === 1, col("z"))).as("z1"),
          max(when(col("sg") === 2, col("cnt"))).as("n2"),
          max(when(col("sg") === 2, col("r"))).as("r_second"),
          max(when(col("sg") === 2, col("z"))).as("z2"))
        wide.select(col("n"),
          round(col("r_all"), 6).as("r"),
          round(col("z_all"), 6).as("z"),
          round(lit(1.0) / sqrt((col("n") - 3).cast("double")), 6).as("se"),
          round(col("z_all") - lit(1.96) /
            sqrt((col("n") - 3).cast("double")), 6).as("z_lo"),
          round(col("z_all") + lit(1.96) /
            sqrt((col("n") - 3).cast("double")), 6).as("z_hi"),
          round(col("r_first"), 6).as("r_first"),
          round(col("r_second"), 6).as("r_second"),
          round((col("z1") - col("z2")) /
            sqrt(lit(1.0) / (col("n1") - 3).cast("double") +
              lit(1.0) / (col("n2") - 3).cast("double")), 6).as("z_diff"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
                 CAST(COUNT(*) AS BIGINT) AS x,
                 SUM(CAST(COALESCE(value, 0) AS DECIMAL(18,2))) AS v
          FROM events GROUP BY 1),
        r0 AS (
          SELECT x, v, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM daily),
        n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS nt FROM r0),
        grps AS MATERIALIZED (
          SELECT x, v, 0 AS sg FROM r0
          UNION ALL
          SELECT x, v, CASE WHEN rn * 2 <= n0.nt THEN 1 ELSE 2 END AS sg
          FROM r0 CROSS JOIN n0),
        gst AS (
          SELECT sg, CAST(COUNT(*) AS BIGINT) AS cnt,
                 ROUND(CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
                   AS mx,
                 ROUND(CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
                   AS mv
          FROM grps GROUP BY 1),
        rs AS (
          SELECT g.sg, MAX(gst.cnt) AS cnt,
                 ROUND(CAST(SUM(CAST(ROUND((CAST(x AS DOUBLE) - gst.mx) *
                     (CAST(v AS DOUBLE) - gst.mv), 6) AS DECIMAL(28,6)))
                     AS DOUBLE) /
                   (sqrt(CAST(SUM(CAST(ROUND((CAST(x AS DOUBLE) - gst.mx) *
                     (CAST(x AS DOUBLE) - gst.mx), 6) AS DECIMAL(28,6)))
                     AS DOUBLE)) *
                    sqrt(CAST(SUM(CAST(ROUND((CAST(v AS DOUBLE) - gst.mv) *
                     (CAST(v AS DOUBLE) - gst.mv), 6) AS DECIMAL(28,6)))
                     AS DOUBLE))), 9) AS r
          FROM grps g JOIN gst ON g.sg = gst.sg
          GROUP BY g.sg),
        rz AS (
          SELECT sg, cnt, r,
                 ROUND(CAST(0.5 AS DOUBLE) *
                   ln((CAST(1 AS DOUBLE) + r) / (CAST(1 AS DOUBLE) - r)), 9)
                   AS z
          FROM rs),
        wide AS (
          SELECT MAX(CASE WHEN sg = 0 THEN cnt END) AS n,
                 MAX(CASE WHEN sg = 0 THEN r END) AS r_all,
                 MAX(CASE WHEN sg = 0 THEN z END) AS z_all,
                 MAX(CASE WHEN sg = 1 THEN cnt END) AS n1,
                 MAX(CASE WHEN sg = 1 THEN r END) AS r_first,
                 MAX(CASE WHEN sg = 1 THEN z END) AS z1,
                 MAX(CASE WHEN sg = 2 THEN cnt END) AS n2,
                 MAX(CASE WHEN sg = 2 THEN r END) AS r_second,
                 MAX(CASE WHEN sg = 2 THEN z END) AS z2
          FROM rz)
        SELECT n,
               ROUND(r_all, 6) + CAST(0 AS DOUBLE) AS r,
               ROUND(z_all, 6) + CAST(0 AS DOUBLE) AS z,
               ROUND(CAST(1 AS DOUBLE) / sqrt(CAST(n - 3 AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS se,
               ROUND(z_all - CAST(1.96 AS DOUBLE) /
                 sqrt(CAST(n - 3 AS DOUBLE)), 6) + CAST(0 AS DOUBLE)
                 AS z_lo,
               ROUND(z_all + CAST(1.96 AS DOUBLE) /
                 sqrt(CAST(n - 3 AS DOUBLE)), 6) + CAST(0 AS DOUBLE)
                 AS z_hi,
               ROUND(r_first, 6) + CAST(0 AS DOUBLE) AS r_first,
               ROUND(r_second, 6) + CAST(0 AS DOUBLE) AS r_second,
               ROUND((z1 - z2) /
                 sqrt(CAST(1 AS DOUBLE) / CAST(n1 - 3 AS DOUBLE) +
                   CAST(1 AS DOUBLE) / CAST(n2 - 3 AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS z_diff
        FROM wide""")),

    // Influence diagnostics for the daily-revenue time trend: leverage
    // h_i = 1/n + dx²/Sxx and Cook's distance D_i = e²·h /
    // (p·s²·(1-h)²) per day, top 10 — WHICH days bent the q6q-style
    // trend line, not just whether the fit drifts (qcw tests that).
    // Same 9-grid residual pipeline as qcw; every link is a raw ratio
    // of exact-grid doubles with a total (D, rn) output order.
    "qdd_cooks_distance" -> Q(
      fn = (s, dir) => {
        val ranked = graft.operators.ScaleOps.globalRowNumber(
          dailyRevenueM(s, dir), Seq(col("day")), "rn")
          .localCheckpoint(eager = false)
        val st = ranked.agg(count(lit(1)).as("n"), sum(col("ym")).as("sy"))
          .select(col("n"),
            round(col("sy").cast("double") / col("n").cast("double"), 9)
              .as("mu"),
            ((col("n") + 1).cast("double") / lit(2.0)).as("xbar"))
        val cen = ranked.crossJoin(broadcast(st))
          .select(col("rn"), col("n"),
            (col("ym").cast("double") - col("mu")).as("c"),
            (col("rn").cast("double") - col("xbar")).as("dx"))
          .localCheckpoint(eager = false)
        val mom = cen.agg(
          sum(round(col("dx") * col("dx"), 6).cast("decimal(28,6)"))
            .as("sxxd"),
          sum(round(col("dx") * col("c"), 6).cast("decimal(28,6)"))
            .as("sxyd"))
          .select(col("sxxd").cast("double").as("sxx"),
            round(col("sxyd").cast("double") / col("sxxd").cast("double"), 9)
              .as("b"))
        val res = cen.crossJoin(broadcast(mom))
          .select(col("rn"), col("n"), col("dx"), col("sxx"),
            round(col("c") - col("b") * col("dx"), 9).as("e"))
          .localCheckpoint(eager = false)
        val s2 = res.agg(
          sum(round(col("e") * col("e"), 9).cast("decimal(28,9)")).as("seed"),
          first(col("n")).as("nn"))
          .select(round(col("seed").cast("double") /
            (col("nn") - 2).cast("double"), 9).as("s2"))
        res.crossJoin(broadcast(s2))
          .select(col("rn").cast("long").as("rn"),
            round(col("e"), 6).as("residual"),
            round(lit(1.0) / col("n").cast("double") +
              col("dx") * col("dx") / col("sxx"), 9).as("hraw"),
            col("dx"), col("sxx"), col("n"), col("e"), col("s2"))
          .select(col("rn"), col("residual"),
            round(col("hraw"), 6).as("leverage"),
            round(col("e") * col("e") * col("hraw") /
              (lit(2.0) * col("s2") * (lit(1.0) - col("hraw")) *
                (lit(1.0) - col("hraw"))), 6).as("cooks_d"))
          .orderBy(col("cooks_d").desc, col("rn")).limit(10)
      },
      oracle = Some(s"""
        WITH daily AS ($dailyRevenueMSql),
        r AS (SELECT ym, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM daily),
        st AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 ROUND(CAST(SUM(ym) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
                   AS mu,
                 CAST(COUNT(*) + 1 AS DOUBLE) / CAST(2 AS DOUBLE) AS xbar
          FROM r),
        cen AS MATERIALIZED (
          SELECT rn, st.n, CAST(ym AS DOUBLE) - st.mu AS c,
                 CAST(rn AS DOUBLE) - st.xbar AS dx
          FROM r CROSS JOIN st),
        mom AS (
          SELECT CAST(SUM(CAST(ROUND(dx * dx, 6) AS DECIMAL(28,6)))
                   AS DOUBLE) AS sxx,
                 ROUND(CAST(SUM(CAST(ROUND(dx * c, 6) AS DECIMAL(28,6)))
                     AS DOUBLE) /
                   CAST(SUM(CAST(ROUND(dx * dx, 6) AS DECIMAL(28,6)))
                     AS DOUBLE), 9) AS b
          FROM cen),
        res AS MATERIALIZED (
          SELECT rn, n, dx, m.sxx, ROUND(c - m.b * dx, 9) AS e
          FROM cen CROSS JOIN mom m),
        s2 AS (
          SELECT ROUND(CAST(SUM(CAST(ROUND(e * e, 9) AS DECIMAL(28,9)))
                   AS DOUBLE) / CAST(MAX(n) - 2 AS DOUBLE), 9) AS s2
          FROM res),
        scored AS (
          SELECT CAST(rn AS BIGINT) AS rn,
                 ROUND(e, 6) + CAST(0 AS DOUBLE) AS residual,
                 ROUND(CAST(1 AS DOUBLE) / CAST(n AS DOUBLE) +
                   dx * dx / sxx, 9) AS hraw,
                 e, s2.s2
          FROM res CROSS JOIN s2)
        SELECT rn, residual,
               ROUND(hraw, 6) + CAST(0 AS DOUBLE) AS leverage,
               ROUND(e * e * hraw /
                 (CAST(2 AS DOUBLE) * s2 * (CAST(1 AS DOUBLE) - hraw) *
                   (CAST(1 AS DOUBLE) - hraw)), 6) + CAST(0 AS DOUBLE)
                 AS cooks_d
        FROM scored
        ORDER BY cooks_d DESC, rn LIMIT 10""")),

    // Jarque-Bera normality test of the trend residuals: the
    // skewness/kurtosis omnibus JB = n·(S²/6 + K²/24) closing the qcw
    // diagnostic suite (DW asks "independent?", BP asks
    // "homoskedastic?", JB asks "gaussian?" — the three assumptions the
    // OLS inference rests on). Residual power sums ride round-6 DECIMAL;
    // S and K are raw ratios with the m2·sqrt(m2) denominator (sqrt is
    // the only irrational link).
    "qde_jarque_bera" -> Q(
      fn = (s, dir) => {
        val ranked = graft.operators.ScaleOps.globalRowNumber(
          dailyRevenueM(s, dir), Seq(col("day")), "rn")
          .localCheckpoint(eager = false)
        val st = ranked.agg(count(lit(1)).as("n"), sum(col("ym")).as("sy"))
          .select(col("n"),
            round(col("sy").cast("double") / col("n").cast("double"), 9)
              .as("mu"),
            ((col("n") + 1).cast("double") / lit(2.0)).as("xbar"))
        val cen = ranked.crossJoin(broadcast(st))
          .select(col("rn"), col("n"),
            (col("ym").cast("double") - col("mu")).as("c"),
            (col("rn").cast("double") - col("xbar")).as("dx"))
          .localCheckpoint(eager = false)
        val mom = cen.agg(
          sum(round(col("dx") * col("dx"), 6).cast("decimal(28,6)"))
            .as("sxxd"),
          sum(round(col("dx") * col("c"), 6).cast("decimal(28,6)"))
            .as("sxyd"))
          .select(round(col("sxyd").cast("double") /
            col("sxxd").cast("double"), 9).as("b"))
        val pw = cen.crossJoin(broadcast(mom))
          .select(col("n"), round(col("c") - col("b") * col("dx"), 9).as("e"))
          .agg(first(col("n")).as("n"),
            sum(round(col("e") * col("e"), 6).cast("decimal(28,6)"))
              .as("p2"),
            sum(round(col("e") * col("e") * col("e"), 6)
              .cast("decimal(28,6)")).as("p3"),
            sum(round(col("e") * col("e") * col("e") * col("e"), 6)
              .cast("decimal(28,6)")).as("p4"))
          .select(col("n"),
            round(col("p2").cast("double") / col("n").cast("double"), 9)
              .as("m2"),
            round(col("p3").cast("double") / col("n").cast("double"), 9)
              .as("m3"),
            round(col("p4").cast("double") / col("n").cast("double"), 9)
              .as("m4"))
        pw.select(col("n"),
          round(col("m3") / (col("m2") * sqrt(col("m2"))), 6)
            .as("skewness"),
          round(col("m4") / (col("m2") * col("m2")) - lit(3.0), 6)
            .as("kurt_excess"),
          round(col("n").cast("double") *
            ((col("m3") / (col("m2") * sqrt(col("m2")))) *
              (col("m3") / (col("m2") * sqrt(col("m2")))) / lit(6.0) +
             (col("m4") / (col("m2") * col("m2")) - lit(3.0)) *
              (col("m4") / (col("m2") * col("m2")) - lit(3.0)) / lit(24.0)),
            6).as("jb_stat"))
      },
      oracle = Some(s"""
        WITH daily AS ($dailyRevenueMSql),
        r AS (SELECT ym, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM daily),
        st AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 ROUND(CAST(SUM(ym) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
                   AS mu,
                 CAST(COUNT(*) + 1 AS DOUBLE) / CAST(2 AS DOUBLE) AS xbar
          FROM r),
        cen AS MATERIALIZED (
          SELECT rn, st.n, CAST(ym AS DOUBLE) - st.mu AS c,
                 CAST(rn AS DOUBLE) - st.xbar AS dx
          FROM r CROSS JOIN st),
        mom AS (
          SELECT ROUND(CAST(SUM(CAST(ROUND(dx * c, 6) AS DECIMAL(28,6)))
                     AS DOUBLE) /
                   CAST(SUM(CAST(ROUND(dx * dx, 6) AS DECIMAL(28,6)))
                     AS DOUBLE), 9) AS b
          FROM cen),
        pw AS (
          SELECT MAX(n) AS n,
                 ROUND(CAST(SUM(CAST(ROUND(e * e, 6) AS DECIMAL(28,6)))
                   AS DOUBLE) / CAST(MAX(n) AS DOUBLE), 9) AS m2,
                 ROUND(CAST(SUM(CAST(ROUND(e * e * e, 6) AS DECIMAL(28,6)))
                   AS DOUBLE) / CAST(MAX(n) AS DOUBLE), 9) AS m3,
                 ROUND(CAST(SUM(CAST(ROUND(e * e * e * e, 6)
                   AS DECIMAL(28,6))) AS DOUBLE) / CAST(MAX(n) AS DOUBLE), 9)
                   AS m4
          FROM (SELECT n, ROUND(c - m.b * dx, 9) AS e
                FROM cen CROSS JOIN mom m))
        SELECT n,
               ROUND(m3 / (m2 * sqrt(m2)), 6) + CAST(0 AS DOUBLE)
                 AS skewness,
               ROUND(m4 / (m2 * m2) - CAST(3 AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS kurt_excess,
               ROUND(CAST(n AS DOUBLE) *
                 ((m3 / (m2 * sqrt(m2))) * (m3 / (m2 * sqrt(m2))) /
                    CAST(6 AS DOUBLE) +
                  (m4 / (m2 * m2) - CAST(3 AS DOUBLE)) *
                  (m4 / (m2 * m2) - CAST(3 AS DOUBLE)) /
                    CAST(24 AS DOUBLE)), 6) + CAST(0 AS DOUBLE) AS jb_stat
        FROM pw""")),

    // Higuchi fractal dimension of the daily event-count series: curve
    // lengths L_m(k) over strides k = 1..4 and phases m, FD = -slope of
    // ln L(k) on ln k — the direct fractal measure beside qd7's DFA
    // (DFA detrends then measures fluctuation growth; Higuchi measures
    // raw curve-length shrinkage). Stride differences are exact integer
    // |gaps|; phase lengths and the 4-point log-log fit ride 9-grid
    // DECIMAL sums.
    "qdf_higuchi_fd" -> Q(
      fn = (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy((unix_millis(col("ts")) / lit(86400000L)).cast("long")
            .as("day"))
          .agg(count(lit(1)).as("x"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(daily,
          Seq(col("day")), "rn").localCheckpoint(eager = false)
        val n0 = ranked.agg(count(lit(1)).as("n"))
        val ks = ranked.sparkSession.range(1)
          .select(explode(array(lit(1L), lit(2L), lit(3L), lit(4L)))
            .as("k"))
        val diffs = ranked.select(col("rn"), col("x").as("x0"))
          .crossJoin(broadcast(ks))
          .join(ranked.select(col("rn").as("rn2"), col("x").as("x1")),
            col("rn2") === col("rn") + col("k"))
          .crossJoin(broadcast(n0))
          .select(col("k"), pmod(col("rn") - 1, col("k")).as("m"),
            abs(col("x1") - col("x0")).as("ad"), col("n"))
        val perPhase = diffs.groupBy(col("k"), col("m"))
          .agg(sum(col("ad")).as("sd"), count(lit(1)).as("cnt"),
            first(col("n")).as("n"))
          .select(col("k"), col("m"),
            round(col("sd").cast("double") * (col("n") - 1).cast("double") /
              (col("cnt").cast("double") * col("k").cast("double") *
                col("k").cast("double")), 9).as("lm"))
        val perK = perPhase.groupBy(col("k"))
          .agg(sum(col("lm").cast("decimal(20,9)")).as("lsum"),
            count(lit(1)).as("nm"))
          .select(col("k"),
            round(col("lsum").cast("double") / col("nm").cast("double"), 9)
              .as("lk"))
          .select(col("k"), col("lk"),
            round(log(col("k").cast("double")), 9).as("lxs"),
            round(log(col("lk")), 9).as("lys"))
          .localCheckpoint(eager = false)
        val fit = perK.agg(count(lit(1)).as("kk"),
          sum(col("lxs").cast("decimal(18,9)")).as("slx"),
          sum(col("lys").cast("decimal(18,9)")).as("sly"),
          sum(round(col("lxs") * col("lys"), 9).cast("decimal(18,9)"))
            .as("sxy"),
          sum(round(col("lxs") * col("lxs"), 9).cast("decimal(18,9)"))
            .as("sxx"))
          .select(round(
            (col("kk").cast("double") * col("sxy").cast("double") -
              col("slx").cast("double") * col("sly").cast("double")) /
            (col("kk").cast("double") * col("sxx").cast("double") -
              col("slx").cast("double") * col("slx").cast("double")), 6)
            .unary_-.as("higuchi_fd"))
        val wide = perK.groupBy()
          .agg(max(when(col("k") === 1, col("lk"))).as("l1"),
            max(when(col("k") === 2, col("lk"))).as("l2"),
            max(when(col("k") === 3, col("lk"))).as("l3"),
            max(when(col("k") === 4, col("lk"))).as("l4"))
        n0.crossJoin(broadcast(wide)).crossJoin(broadcast(fit))
          .select(col("n"),
            round(col("l1"), 6).as("l1"), round(col("l2"), 6).as("l2"),
            round(col("l3"), 6).as("l3"), round(col("l4"), 6).as("l4"),
            col("higuchi_fd"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
                 CAST(COUNT(*) AS BIGINT) AS x
          FROM events GROUP BY 1),
        r AS (SELECT x, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM daily),
        n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM r),
        ks AS (SELECT CAST(UNNEST([1, 2, 3, 4]) AS BIGINT) AS k),
        diffs AS (
          SELECT k.k, (a.rn - 1) % k.k AS m, ABS(b.x - a.x) AS ad, n0.n
          FROM r a CROSS JOIN ks k
          JOIN r b ON b.rn = a.rn + k.k
          CROSS JOIN n0),
        perphase AS (
          SELECT k, m,
                 ROUND(CAST(SUM(ad) AS DOUBLE) * CAST(MAX(n) - 1 AS DOUBLE) /
                   (CAST(COUNT(*) AS DOUBLE) * CAST(k AS DOUBLE) *
                     CAST(k AS DOUBLE)), 9) AS lm
          FROM diffs GROUP BY 1, 2),
        perk AS MATERIALIZED (
          SELECT k,
                 ROUND(CAST(SUM(CAST(lm AS DECIMAL(20,9))) AS DOUBLE) /
                   CAST(COUNT(*) AS DOUBLE), 9) AS lk
          FROM perphase GROUP BY 1),
        perk2 AS (
          SELECT k, lk, ROUND(ln(CAST(k AS DOUBLE)), 9) AS lxs,
                 ROUND(ln(lk), 9) AS lys
          FROM perk),
        fit AS (
          SELECT -ROUND(
            (CAST(COUNT(*) AS DOUBLE) *
              CAST(SUM(CAST(ROUND(lxs * lys, 9) AS DECIMAL(18,9)))
                AS DOUBLE) -
             CAST(SUM(CAST(lxs AS DECIMAL(18,9))) AS DOUBLE) *
              CAST(SUM(CAST(lys AS DECIMAL(18,9))) AS DOUBLE)) /
            (CAST(COUNT(*) AS DOUBLE) *
              CAST(SUM(CAST(ROUND(lxs * lxs, 9) AS DECIMAL(18,9)))
                AS DOUBLE) -
             CAST(SUM(CAST(lxs AS DECIMAL(18,9))) AS DOUBLE) *
              CAST(SUM(CAST(lxs AS DECIMAL(18,9))) AS DOUBLE)), 6)
            + CAST(0 AS DOUBLE) AS higuchi_fd
          FROM perk2),
        wide AS (
          SELECT MAX(CASE WHEN k = 1 THEN lk END) AS l1,
                 MAX(CASE WHEN k = 2 THEN lk END) AS l2,
                 MAX(CASE WHEN k = 3 THEN lk END) AS l3,
                 MAX(CASE WHEN k = 4 THEN lk END) AS l4
          FROM perk2)
        SELECT n,
               ROUND(l1, 6) + CAST(0 AS DOUBLE) AS l1,
               ROUND(l2, 6) + CAST(0 AS DOUBLE) AS l2,
               ROUND(l3, 6) + CAST(0 AS DOUBLE) AS l3,
               ROUND(l4, 6) + CAST(0 AS DOUBLE) AS l4,
               higuchi_fd
        FROM n0 CROSS JOIN wide CROSS JOIN fit""")),

    // Grubbs max-studentized-deviate of the daily revenue series: the
    // single-outlier screening statistic G = max|y - ybar|/s with the
    // offending day surfaced via the struct-argmax pattern (q8s — field-
    // order-lexicographic max is identical in both engines). The
    // diagnostic MAD profile (q6i) flags many outliers robustly; Grubbs
    // is the classical single-most-extreme test the audit trail expects.
    "qdg_grubbs_deviate" -> Q(
      fn = (s, dir) => {
        val ranked = graft.operators.ScaleOps.globalRowNumber(
          dailyRevenueM(s, dir), Seq(col("day")), "rn")
          .localCheckpoint(eager = false)
        val st = ranked.agg(count(lit(1)).as("n"), sum(col("ym")).as("sy"))
          .select(col("n"),
            round(col("sy").cast("double") / col("n").cast("double"), 9)
              .as("mu"))
        val cen = ranked.crossJoin(broadcast(st))
          .select(col("rn").cast("long").as("rn"), col("n"), col("mu"),
            (col("ym").cast("double") - col("mu")).as("c"))
        val agg = cen.agg(first(col("n")).as("n"), first(col("mu")).as("mu"),
          sum(round(col("c") * col("c"), 6).cast("decimal(28,6)")).as("ss"),
          max(struct(round(abs(col("c")), 9).as("ad"), col("rn")))
            .as("top"))
        agg.select(col("n"), round(col("mu"), 6).as("mean_m"),
          round(sqrt(col("ss").cast("double") /
            (col("n") - 1).cast("double")), 6).as("sd_m"),
          round(col("top.ad") /
            sqrt(col("ss").cast("double") / (col("n") - 1).cast("double")),
            6).as("g_stat"),
          col("top.rn").as("argmax_rn"),
          round(col("top.ad"), 6).as("argmax_dev"))
      },
      oracle = Some(s"""
        WITH daily AS ($dailyRevenueMSql),
        r AS (SELECT ym, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM daily),
        st AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 ROUND(CAST(SUM(ym) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
                   AS mu
          FROM r),
        cen AS (
          SELECT CAST(rn AS BIGINT) AS rn, st.n, st.mu,
                 CAST(ym AS DOUBLE) - st.mu AS c
          FROM r CROSS JOIN st),
        agg AS (
          SELECT MAX(n) AS n, MAX(mu) AS mu,
                 CAST(SUM(CAST(ROUND(c * c, 6) AS DECIMAL(28,6)))
                   AS DOUBLE) AS ss,
                 MAX({'ad': ROUND(ABS(c), 9), 'rn': rn}) AS top
          FROM cen)
        SELECT n,
               ROUND(mu, 6) + CAST(0 AS DOUBLE) AS mean_m,
               ROUND(sqrt(ss / CAST(n - 1 AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS sd_m,
               ROUND(top['ad'] / sqrt(ss / CAST(n - 1 AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS g_stat,
               top['rn'] AS argmax_rn,
               ROUND(top['ad'], 6) + CAST(0 AS DOUBLE) AS argmax_dev
        FROM agg""")),

    // Theil's U forecast-quality decomposition for the drift
    // extrapolation y[t-1] + (y[t-1] - y[t-2]) on daily revenue: U2 < 1
    // iff the drift beats the naive no-change forecast, U1 normalizes by
    // the series energy — the standard acceptance gate a forecaster
    // (q7d Holt, q7r Holt-Winters) must clear before shipping. Daily
    // values carry exactly 8 decimals, so every error and its DECIMAL
    // square (12,8)² = (25,16) is EXACT with zero rounding; sums are
    // rounded half-up at 6 in both engines before the only sqrt links.
    "qdh_theil_u_drift" -> Q(
      fn = (s, dir) => {
        val ranked = graft.operators.ScaleOps.globalRowNumber(
          dailyRevenueM(s, dir), Seq(col("day")), "rn")
          .localCheckpoint(eager = false)
        val tri = ranked.select(col("rn"), col("ym").as("y0"))
          .join(ranked.select((col("rn") + 1).as("rn"), col("ym").as("y1")),
            Seq("rn"))
          .join(ranked.select((col("rn") + 2).as("rn"), col("ym").as("y2")),
            Seq("rn"))
          .select(
            (lit(2).cast("decimal(10,0)") * col("y1") - col("y2") -
              col("y0")).cast("decimal(12,8)").as("ef"),
            (col("y1") - col("y0")).cast("decimal(12,8)").as("en"),
            col("y0").cast("decimal(12,8)").as("ya"),
            (lit(2).cast("decimal(10,0)") * col("y1") - col("y2"))
              .cast("decimal(12,8)").as("yf"))
        val agg = tri.agg(count(lit(1)).as("n_eval"),
          sum(col("ef") * col("ef")).as("sef"),
          sum(col("en") * col("en")).as("sen"),
          sum(col("ya") * col("ya")).as("sya"),
          sum(col("yf") * col("yf")).as("syf"),
          sum(abs(col("ef"))).as("aef"),
          sum(abs(col("en"))).as("aen"))
        agg.select(col("n_eval"),
          round(sqrt(round(col("sef"), 6).cast("double") /
            round(col("sen"), 6).cast("double")), 6).as("u2"),
          round(sqrt(round(col("sef"), 6).cast("double") /
            col("n_eval").cast("double")) /
            (sqrt(round(col("syf"), 6).cast("double") /
              col("n_eval").cast("double")) +
             sqrt(round(col("sya"), 6).cast("double") /
               col("n_eval").cast("double"))), 6).as("u1"),
          round(col("aef").cast("double") / col("n_eval").cast("double"), 6)
            .as("mae_drift"),
          round(col("aen").cast("double") / col("n_eval").cast("double"), 6)
            .as("mae_naive"))
      },
      oracle = Some(s"""
        WITH daily AS ($dailyRevenueMSql),
        r AS (SELECT ym, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM daily),
        tri AS (
          SELECT
            CAST(CAST(2 AS DECIMAL(10,0)) * b.ym - c.ym - a.ym
              AS DECIMAL(12,8)) AS ef,
            CAST(b.ym - a.ym AS DECIMAL(12,8)) AS en,
            CAST(a.ym AS DECIMAL(12,8)) AS ya,
            CAST(CAST(2 AS DECIMAL(10,0)) * b.ym - c.ym AS DECIMAL(12,8))
              AS yf
          FROM r a JOIN r b ON b.rn = a.rn - 1 JOIN r c ON c.rn = a.rn - 2),
        agg AS (
          -- (19,8) factors force INT128 products in DuckDB (the qb8
          -- width lesson); values are identical to Spark's exact
          -- (12,8)x(12,8) = (25,16) squares
          SELECT CAST(COUNT(*) AS BIGINT) AS n_eval,
                 SUM(CAST(ef AS DECIMAL(19,8)) * CAST(ef AS DECIMAL(19,8)))
                   AS sef,
                 SUM(CAST(en AS DECIMAL(19,8)) * CAST(en AS DECIMAL(19,8)))
                   AS sen,
                 SUM(CAST(ya AS DECIMAL(19,8)) * CAST(ya AS DECIMAL(19,8)))
                   AS sya,
                 SUM(CAST(yf AS DECIMAL(19,8)) * CAST(yf AS DECIMAL(19,8)))
                   AS syf,
                 SUM(ABS(ef)) AS aef, SUM(ABS(en)) AS aen
          FROM tri)
        SELECT n_eval,
               ROUND(sqrt(CAST(ROUND(sef, 6) AS DOUBLE) /
                 CAST(ROUND(sen, 6) AS DOUBLE)), 6) + CAST(0 AS DOUBLE)
                 AS u2,
               ROUND(sqrt(CAST(ROUND(sef, 6) AS DOUBLE) /
                   CAST(n_eval AS DOUBLE)) /
                 (sqrt(CAST(ROUND(syf, 6) AS DOUBLE) /
                    CAST(n_eval AS DOUBLE)) +
                  sqrt(CAST(ROUND(sya, 6) AS DOUBLE) /
                    CAST(n_eval AS DOUBLE))), 6) + CAST(0 AS DOUBLE) AS u1,
               ROUND(CAST(aef AS DOUBLE) / CAST(n_eval AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS mae_drift,
               ROUND(CAST(aen AS DOUBLE) / CAST(n_eval AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS mae_naive
        FROM agg""")),

    // Inter-rater agreement battery beyond Cohen's kappa (q8u): quadratic
    // weighted kappa, Gwet's AC1 (stable when marginals are extreme —
    // the kappa paradox), and Krippendorff's nominal alpha, all over the
    // same two deterministic "raters" — each document's length tertile
    // vs its token-count tertile (the q7v exact-NTILE identity on two
    // global rank orders, bit-for-bit equal to DuckDB's NTILE). Every
    // ingredient is an exact integer cell/margin count; the statistics
    // are single raw ratios rounded at 6.
    "qdi_agreement_battery" -> Q(
      fn = (s, dir) => {
        val feats = t(s, dir, "documents")
          .select(col("doc_id"), length(col("text")).cast("long").as("lenc"),
            size(split(col("text"), "[\t\n\f\r ]+")).cast("long").as("tokc"))
        val ra = graft.operators.ScaleOps.globalRowNumber(feats,
          Seq(col("lenc"), col("doc_id")), "rl")
          .select(col("doc_id"), col("rl"))
        val rb = graft.operators.ScaleOps.globalRowNumber(feats,
          Seq(col("tokc"), col("doc_id")), "rt")
          .select(col("doc_id").as("doc_id2"), col("rt"))
        val n0 = feats.agg(count(lit(1)).as("n"))
          .select(col("n"), expr("n div 3").as("base"),
            pmod(col("n"), lit(3)).as("rem"))
          .select(col("n"), col("base"), col("rem"),
            (col("rem") * (col("base") + 1)).as("cut"))
        val cells = ra.join(rb, col("doc_id") === col("doc_id2"))
          .crossJoin(broadcast(n0))
          .select(
            when(col("rl") <= col("cut"),
              expr("(rl - 1) div (base + 1) + 1"))
              .otherwise(expr("rem + (rl - 1 - cut) div base + 1")).as("ta"),
            when(col("rt") <= col("cut"),
              expr("(rt - 1) div (base + 1) + 1"))
              .otherwise(expr("rem + (rt - 1 - cut) div base + 1")).as("tb"),
            col("n"))
          .groupBy(col("ta"), col("tb"))
          .agg(count(lit(1)).as("nij"), first(col("n")).as("n"))
          .localCheckpoint(eager = false)
        val rows = cells.groupBy(col("ta")).agg(sum(col("nij")).as("ri"))
        val colsM = cells.groupBy(col("tb")).agg(sum(col("nij")).as("cj"))
        val base = cells.agg(first(col("n")).as("n"),
          sum(when(col("ta") === col("tb"), col("nij")).otherwise(0L))
            .as("diag"),
          sum((col("ta") - col("tb")) * (col("ta") - col("tb")) * col("nij"))
            .as("pen"))
        val penE = rows.crossJoin(colsM)
          .agg(sum((col("ta") - col("tb")) * (col("ta") - col("tb")) *
            col("ri") * col("cj")).as("pen_e"))
        val pis = rows.join(colsM, col("ta") === col("tb"))
          .crossJoin(broadcast(base.select(col("n").as("nn"))))
          .select(((col("ri") + col("cj")).cast("double") /
            (lit(2L) * col("nn")).cast("double")).as("piq"),
            (col("ri") + col("cj")).as("mq"), col("nn"))
          .agg(
            sum(round(col("piq") * (lit(1.0) - col("piq")), 9)
              .cast("decimal(18,9)")).as("spi"),
            sum(col("mq") * (lit(2L) * col("nn") - col("mq"))).as("sde"),
            first(col("nn")).as("nn"))
        base.crossJoin(broadcast(penE)).crossJoin(broadcast(pis))
          .select(col("n"),
            round(col("diag").cast("double") / col("n").cast("double"), 6)
              .as("po"),
            round(lit(1.0) -
              col("n").cast("double") * col("pen").cast("double") /
                col("pen_e").cast("double"), 6).as("kappa_w"),
            round(
              (col("diag").cast("double") / col("n").cast("double") -
                col("spi").cast("double") / lit(2.0)) /
              (lit(1.0) - col("spi").cast("double") / lit(2.0)), 6)
              .as("gwet_ac1"),
            round(lit(1.0) -
              (lit(1.0) - col("diag").cast("double") /
                col("n").cast("double")) /
              (col("sde").cast("double") /
                ((lit(2L) * col("nn")).cast("double") *
                  (lit(2L) * col("nn") - 1).cast("double"))), 6)
              .as("kripp_alpha"))
      },
      oracle = Some("""
        WITH feats AS (
          SELECT doc_id, CAST(length(text) AS BIGINT) AS lenc,
                 CAST(len(string_split_regex(text, '[\t\n\x0B\f\r ]+'))
                   AS BIGINT) AS tokc
          FROM documents),
        ranked AS (
          SELECT doc_id,
                 NTILE(3) OVER (ORDER BY lenc, doc_id) AS ta,
                 NTILE(3) OVER (ORDER BY tokc, doc_id) AS tb
          FROM feats),
        cells AS MATERIALIZED (
          SELECT CAST(ta AS BIGINT) AS ta, CAST(tb AS BIGINT) AS tb,
                 CAST(COUNT(*) AS BIGINT) AS nij
          FROM ranked GROUP BY 1, 2),
        n0 AS (SELECT CAST(SUM(nij) AS BIGINT) AS n FROM cells),
        rows_m AS (
          SELECT ta, CAST(SUM(nij) AS BIGINT) AS ri FROM cells GROUP BY 1),
        cols_m AS (
          SELECT tb, CAST(SUM(nij) AS BIGINT) AS cj FROM cells GROUP BY 1),
        base AS (
          SELECT MAX(n0.n) AS n,
                 CAST(SUM(CASE WHEN ta = tb THEN nij ELSE 0 END) AS BIGINT)
                   AS diag,
                 CAST(SUM((ta - tb) * (ta - tb) * nij) AS BIGINT) AS pen
          FROM cells CROSS JOIN n0),
        pen_e AS (
          SELECT CAST(SUM((ta - tb) * (ta - tb) * ri * cj) AS BIGINT)
                   AS pen_e
          FROM rows_m CROSS JOIN cols_m),
        pis AS (
          SELECT SUM(CAST(ROUND(
                   (CAST(ri + cj AS DOUBLE) /
                     CAST(2 * n0.n AS DOUBLE)) *
                   (CAST(1 AS DOUBLE) - CAST(ri + cj AS DOUBLE) /
                     CAST(2 * n0.n AS DOUBLE)), 9) AS DECIMAL(18,9)))
                   AS spi,
                 CAST(SUM((ri + cj) * (2 * n0.n - (ri + cj))) AS BIGINT)
                   AS sde,
                 MAX(n0.n) AS nn
          FROM rows_m JOIN cols_m ON rows_m.ta = cols_m.tb
          CROSS JOIN n0)
        SELECT n,
               ROUND(CAST(diag AS DOUBLE) / CAST(n AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS po,
               ROUND(CAST(1 AS DOUBLE) -
                 CAST(n AS DOUBLE) * CAST(pen AS DOUBLE) /
                   CAST(pen_e AS DOUBLE), 6) + CAST(0 AS DOUBLE)
                 AS kappa_w,
               ROUND((CAST(diag AS DOUBLE) / CAST(n AS DOUBLE) -
                   CAST(spi AS DOUBLE) / CAST(2 AS DOUBLE)) /
                 (CAST(1 AS DOUBLE) -
                   CAST(spi AS DOUBLE) / CAST(2 AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS gwet_ac1,
               ROUND(CAST(1 AS DOUBLE) -
                 (CAST(1 AS DOUBLE) -
                   CAST(diag AS DOUBLE) / CAST(n AS DOUBLE)) /
                 (CAST(sde AS DOUBLE) /
                   (CAST(2 * nn AS DOUBLE) *
                    CAST(2 * nn - 1 AS DOUBLE))), 6) + CAST(0 AS DOUBLE)
                 AS kripp_alpha
        FROM base CROSS JOIN pen_e CROSS JOIN pis""")),

    // Spectral entropy of the daily event-count series over the Fourier
    // frequencies k = 1..14: H = -Σ p·ln p of the normalized periodogram
    // — flat spectrum (noise) → H near ln K, one dominant line → H near
    // 0. The global frequency-domain summary where qca scores only five
    // candidate periods. Phases reduce mod n BEFORE the trig call
    // ((rn·k) mod n is exact integer arithmetic — the qca lesson), trig
    // terms 9-snap through DECIMAL, powers are 9-grid, and the entropy
    // terms p·ln p ride 9-grid DECIMAL sums.
    "qdj_spectral_entropy" -> Q(
      fn = (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy((unix_millis(col("ts")) / lit(86400000L)).cast("long")
            .as("day"))
          .agg(count(lit(1)).as("x"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(daily,
          Seq(col("day")), "rn").localCheckpoint(eager = false)
        val mu = ranked.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
          .select(col("n"),
            round(col("sx").cast("double") / col("n").cast("double"), 9)
              .as("mu"))
        val terms = ranked.crossJoin(broadcast(mu))
          .select(col("rn"), col("n"),
            (col("x").cast("double") - col("mu")).as("yc"),
            explode(sequence(lit(1L), lit(14L))).as("k"))
          .withColumn("ang", lit(2.0 * math.Pi) *
            pmod(col("rn") * col("k"), col("n")).cast("double") /
            col("n").cast("double"))
          .groupBy(col("k"))
          .agg(first(col("n")).as("n"),
            sum(round(col("yc") * cos(col("ang")), 9).cast("decimal(28,9)"))
              .as("ct"),
            sum(round(col("yc") * sin(col("ang")), 9).cast("decimal(28,9)"))
              .as("st"))
          .select(col("k"), col("n"),
            round(col("ct").cast("double") * col("ct").cast("double") +
              col("st").cast("double") * col("st").cast("double"), 9)
              .as("pw"))
          .localCheckpoint(eager = false)
        val tot = terms.agg(sum(col("pw").cast("decimal(28,9)")).as("tp"))
        val probs = terms.crossJoin(broadcast(tot))
          .select(col("k"), col("n"), col("pw"),
            (col("pw") / col("tp").cast("double")).as("p"))
        val agg = probs.agg(first(col("n")).as("n"),
          sum(when(col("p") > 0, round(col("p") * log(col("p")), 9))
            .otherwise(0.0).cast("decimal(18,9)")).as("hsum"),
          max(struct(col("p").as("pv"), (-col("k")).as("nk"))).as("w"),
          count(lit(1)).as("kk"))
        agg.select(col("n"),
          (-col("w.nk")).as("dominant_k"),
          round(col("w.pv"), 6).as("p_dominant"),
          round(-col("hsum").cast("double"), 6).as("h_spec"),
          round(-col("hsum").cast("double") /
            log(col("kk").cast("double")), 6).as("h_norm"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
                 CAST(COUNT(*) AS BIGINT) AS x
          FROM events GROUP BY 1),
        r AS (SELECT x, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM daily),
        mu AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 ROUND(CAST(SUM(x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
                   AS mu
          FROM r),
        ks AS (SELECT CAST(UNNEST(range(1, 15)) AS BIGINT) AS k),
        terms AS (
          SELECT k, MAX(mu.n) AS n,
                 SUM(CAST(ROUND((CAST(x AS DOUBLE) - mu.mu) *
                   COS(CAST(2 AS DOUBLE) * pi() *
                     CAST((rn * k) % mu.n AS DOUBLE) /
                     CAST(mu.n AS DOUBLE)), 9) AS DECIMAL(28,9))) AS ct,
                 SUM(CAST(ROUND((CAST(x AS DOUBLE) - mu.mu) *
                   SIN(CAST(2 AS DOUBLE) * pi() *
                     CAST((rn * k) % mu.n AS DOUBLE) /
                     CAST(mu.n AS DOUBLE)), 9) AS DECIMAL(28,9))) AS st
          FROM r CROSS JOIN ks CROSS JOIN mu
          GROUP BY 1),
        pw AS MATERIALIZED (
          SELECT k, n,
                 ROUND(CAST(ct AS DOUBLE) * CAST(ct AS DOUBLE) +
                   CAST(st AS DOUBLE) * CAST(st AS DOUBLE), 9) AS pw
          FROM terms),
        tot AS (SELECT SUM(CAST(pw AS DECIMAL(28,9))) AS tp FROM pw),
        probs AS (
          SELECT k, n, pw, pw / CAST(tot.tp AS DOUBLE) AS p
          FROM pw CROSS JOIN tot),
        agg AS (
          SELECT MAX(n) AS n,
                 SUM(CAST(CASE WHEN p > 0 THEN ROUND(p * ln(p), 9)
                   ELSE CAST(0 AS DOUBLE) END AS DECIMAL(18,9))) AS hsum,
                 MAX({'pv': p, 'nk': -k}) AS w,
                 CAST(COUNT(*) AS BIGINT) AS kk
          FROM probs)
        SELECT n,
               -(w['nk']) AS dominant_k,
               ROUND(w['pv'], 6) + CAST(0 AS DOUBLE) AS p_dominant,
               ROUND(-CAST(hsum AS DOUBLE), 6) + CAST(0 AS DOUBLE)
                 AS h_spec,
               ROUND(-CAST(hsum AS DOUBLE) / ln(CAST(kk AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS h_norm
        FROM agg""")),

    // Newsvendor critical-fractile stock levels from the empirical daily
    // purchase-demand distribution: for each (underage, overage) cost
    // pair, the optimal stock is the demand order statistic at rank
    // ceil(n·cu/(cu+co)) — computed entirely in integers, so the
    // quantile is exact at any SF. The inventory-economics closure of
    // qb1's (Q,r) policy (which assumed a gaussian demand; this is the
    // distribution-free version).
    "qdk_newsvendor_fractile" -> Q(
      fn = (s, dir) => {
        val daily = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy((unix_millis(col("ts")) / lit(86400000L)).cast("long")
            .as("day"))
          .agg(count(lit(1)).as("d"))
        val byVal = graft.operators.ScaleOps.globalRowNumber(daily,
          Seq(col("d"), col("day")), "vr").localCheckpoint(eager = false)
        val n0 = byVal.agg(count(lit(1)).as("n"),
          sum(col("d")).as("sd"))
        val scen = byVal.sparkSession.createDataFrame(
          Seq((1L, 3L), (1L, 1L), (3L, 1L), (9L, 1L))).toDF("cu", "co")
        val ranksNeeded = scen.crossJoin(broadcast(n0))
          .select(col("cu"), col("co"), col("n"), col("sd"),
            ((col("n") * col("cu") + col("cu") + col("co") - 1) /
              (col("cu") + col("co"))).cast("long").as("rank"))
        ranksNeeded.join(byVal, col("vr") === col("rank"))
          .select(col("cu"), col("co"),
            round(col("cu").cast("double") /
              (col("cu") + col("co")).cast("double"), 6).as("fractile"),
            col("rank"), col("d").as("stock_level"),
            round(col("sd").cast("double") / col("n").cast("double"), 6)
              .as("mean_demand"))
          .orderBy(col("fractile"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
                 CAST(COUNT(*) AS BIGINT) AS d
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        r AS (
          SELECT d, ROW_NUMBER() OVER (ORDER BY d, day) AS vr FROM daily),
        n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                      CAST(SUM(d) AS BIGINT) AS sd FROM r),
        scen AS (
          SELECT CAST(cu AS BIGINT) AS cu, CAST(co AS BIGINT) AS co
          FROM (VALUES (1, 3), (1, 1), (3, 1), (9, 1)) AS v(cu, co)),
        ranks AS (
          SELECT cu, co, n, sd,
                 (n * cu + cu + co - 1) // (cu + co) AS rank
          FROM scen CROSS JOIN n0)
        SELECT cu, co,
               ROUND(CAST(cu AS DOUBLE) / CAST(cu + co AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS fractile,
               CAST(rank AS BIGINT) AS rank,
               r.d AS stock_level,
               ROUND(CAST(sd AS DOUBLE) / CAST(n AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS mean_demand
        FROM ranks JOIN r ON r.vr = ranks.rank
        ORDER BY fractile""")),

    // Brown-Forsythe robust homogeneity-of-variance test: one-way ANOVA
    // on |y - group median| of order value across priorities — the
    // assumption check qbn's ANOVA F itself rests on (and the robust
    // sibling of qdq's Bartlett: BF keeps its size under heavy tails
    // where Bartlett inflates). Group medians are exact order statistics
    // via global-rank offsets (no per-group window); deviations are
    // exact DECIMAL(18,2); the ANOVA moments reuse the qd8 recipe
    // (DECIMAL squares, VARCHAR-bridged >2^53 casts, ni·d² multiplied
    // INTEGER × 9-grid in DECIMAL).
    "qdl_brown_forsythe" -> Q(
      fn = (s, dir) => {
        val o = t(s, dir, "orders")
          .select(col("o_orderpriority").as("g"),
            col("o_totalprice").cast("decimal(18,2)").as("y"),
            col("o_orderkey").as("k"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(o,
          Seq(col("g"), col("y"), col("k")), "grn")
          .localCheckpoint(eager = false)
        val gmin = ranked.groupBy(col("g"))
          .agg(min(col("grn")).as("g0"), count(lit(1)).as("ni"))
        val meds = ranked.join(gmin, Seq("g"))
          .filter(col("grn") - col("g0") + 1 ===
            floor((col("ni") + 1).cast("double") / lit(2.0)).cast("long"))
          .select(col("g"), col("y").as("med"))
        val z = ranked.join(meds, Seq("g"))
          .select(col("g"), abs(col("y") - col("med")).as("z"))
        val gm = z.groupBy(col("g"))
          .agg(count(lit(1)).as("ni"),
            sum(col("z")).as("szd"),
            sum(col("z").cast("decimal(12,2)") *
              col("z").cast("decimal(12,2)")).as("szzd"))
          .select(col("g"), col("ni"), col("szd").cast("double").as("sz"),
            col("szzd").cast("double").as("szz"))
          .localCheckpoint(eager = false)
        val tot = gm.agg(sum(col("ni")).as("nn"), count(lit(1)).as("a"),
          sum(col("sz")).as("sz0"))
          .select(col("nn"), col("a"),
            round(col("sz0") / col("nn").cast("double"), 9).as("zbar"))
        val parts = gm.crossJoin(broadcast(tot))
          .select(col("ni"), col("nn"), col("a"),
            round(col("szz") - col("sz") * col("sz") /
              col("ni").cast("double"), 6).as("ssw_g"),
            round((round(col("sz") / col("ni").cast("double"), 9) -
              col("zbar")) *
              (round(col("sz") / col("ni").cast("double"), 9) -
                col("zbar")), 9).as("dg2"))
          .agg(first(col("nn")).as("nn"), first(col("a")).as("a"),
            sum(col("ssw_g").cast("decimal(28,6)")).as("ssw"),
            sum(col("ni").cast("decimal(10,0)") *
              col("dg2").cast("decimal(20,9)")).as("ssb"))
        parts.select(col("nn").as("n"), col("a"),
          round((col("ssb").cast("double") / (col("a") - 1).cast("double")) /
            (col("ssw").cast("double") / (col("nn") - col("a"))
              .cast("double")), 6).as("f_bf"),
          round(col("ssb").cast("double") /
            (col("ssb").cast("double") + col("ssw").cast("double")), 6)
            .as("eta_sq"))
      },
      oracle = Some("""
        WITH o AS (
          SELECT o_orderpriority AS g,
                 CAST(o_totalprice AS DECIMAL(18,2)) AS y,
                 o_orderkey AS k
          FROM orders),
        ranked AS MATERIALIZED (
          SELECT g, y, ROW_NUMBER() OVER (ORDER BY g, y, k) AS grn
          FROM o),
        gmin AS (
          SELECT g, MIN(grn) AS g0, CAST(COUNT(*) AS BIGINT) AS ni
          FROM ranked GROUP BY 1),
        meds AS (
          SELECT r.g, r.y AS med
          FROM ranked r JOIN gmin USING (g)
          WHERE r.grn - gmin.g0 + 1 = (gmin.ni + 1) // 2),
        z AS (
          SELECT r.g, ABS(r.y - meds.med) AS z
          FROM ranked r JOIN meds USING (g)),
        gm AS MATERIALIZED (
          SELECT g, CAST(COUNT(*) AS BIGINT) AS ni,
                 CAST(SUM(z) AS DOUBLE) AS sz,
                 CAST(CAST(SUM(CAST(z AS DECIMAL(12,2)) *
                   CAST(z AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS szz
          FROM z GROUP BY 1),
        tot AS (
          SELECT CAST(SUM(ni) AS BIGINT) AS nn,
                 CAST(COUNT(*) AS BIGINT) AS a,
                 ROUND(SUM(sz) / CAST(SUM(ni) AS DOUBLE), 9) AS zbar
          FROM gm),
        parts AS (
          SELECT MAX(tot.nn) AS nn, MAX(tot.a) AS a,
                 CAST(SUM(CAST(ROUND(szz - sz * sz / CAST(ni AS DOUBLE), 6)
                   AS DECIMAL(28,6))) AS DOUBLE) AS ssw,
                 CAST(SUM(CAST(ni AS DECIMAL(10,0)) *
                   CAST(ROUND((ROUND(sz / CAST(ni AS DOUBLE), 9) -
                     tot.zbar) * (ROUND(sz / CAST(ni AS DOUBLE), 9) -
                     tot.zbar), 9) AS DECIMAL(20,9))) AS DOUBLE) AS ssb
          FROM gm CROSS JOIN tot)
        SELECT nn AS n, a,
               ROUND((ssb / CAST(a - 1 AS DOUBLE)) /
                 (ssw / CAST(nn - a AS DOUBLE)), 6) + CAST(0 AS DOUBLE)
                 AS f_bf,
               ROUND(ssb / (ssb + ssw), 6) + CAST(0 AS DOUBLE) AS eta_sq
        FROM parts""")),
    // Siegel-Tukey rank-dispersion test between the purchase and click
    // value distributions: ranks assigned outside-in (1 to the smallest,
    // 2-3 to the two largest, 4-5 to the next two smallest, ...) turn
    // the Mann-Whitney machinery (q7o tests LOCATION) into a test of
    // SCALE — which sample's values spread wider — with no variance
    // estimate at all. The outside-in rank has an exact closed form in
    // the pooled order statistic (depth d = min(i, N+1-i); bottom: odd
    // d → 2d-1, even → 2d; top: mirrored), so the whole statistic is
    // integer arithmetic until one final z ratio.
    "qdm_siegel_tukey" -> Q(
      fn = (s, dir) => {
        val e = t(s, dir, "events")
          .filter(col("event_type").isin("purchase", "click") &&
            col("value").isNotNull)
          .select(col("value").cast("decimal(18,2)").as("v"),
            when(col("event_type") === "purchase", 1L).otherwise(0L)
              .as("g"), col("event_id"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(e,
          Seq(col("v"), col("g"), col("event_id")), "i")
          .localCheckpoint(eager = false)
        val tot = ranked.agg(count(lit(1)).as("nn"), sum(col("g")).as("n1"))
          .select(col("nn"), col("n1"), (col("nn") - col("n1")).as("n2"))
        val st = ranked.crossJoin(broadcast(tot))
          .select(col("g"), col("nn"), col("n1"), col("n2"),
            least(col("i"), col("nn") + 1 - col("i")).as("d"),
            (col("i") * 2 <= col("nn") + 1).as("bottom"))
          .select(col("g"), col("nn"), col("n1"), col("n2"),
            when(col("bottom"),
              when(pmod(col("d"), lit(2L)) === 1, lit(2L) * col("d") - 1)
                .otherwise(lit(2L) * col("d")))
              .otherwise(
                when(pmod(col("d"), lit(2L)) === 1, lit(2L) * col("d"))
                  .otherwise(lit(2L) * col("d") - 1)).as("str"))
        val agg = st.agg(first(col("nn")).as("nn"),
          first(col("n1")).as("n1"), first(col("n2")).as("n2"),
          sum(when(col("g") === 1, col("str")).otherwise(0L)).as("w"))
        agg.select(col("n1"), col("n2"), col("w").as("w_stat"),
          round((col("w").cast("double") -
            col("n1").cast("double") * (col("nn") + 1).cast("double") /
              lit(2.0)) /
            sqrt(col("n1").cast("double") * col("n2").cast("double") *
              (col("nn") + 1).cast("double") / lit(12.0)), 6).as("z_st"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT CAST(value AS DECIMAL(18,2)) AS v,
                 CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g,
                 event_id
          FROM events
          WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL),
        ranked AS MATERIALIZED (
          SELECT g, CAST(ROW_NUMBER() OVER (ORDER BY v, g, event_id)
            AS BIGINT) AS i
          FROM e),
        tot AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS nn,
                 CAST(SUM(g) AS BIGINT) AS n1,
                 CAST(COUNT(*) AS BIGINT) - CAST(SUM(g) AS BIGINT) AS n2
          FROM ranked),
        st AS (
          SELECT g, nn, n1, n2,
                 CASE WHEN i * 2 <= nn + 1 THEN
                   CASE WHEN LEAST(i, nn + 1 - i) % 2 = 1
                     THEN 2 * LEAST(i, nn + 1 - i) - 1
                     ELSE 2 * LEAST(i, nn + 1 - i) END
                 ELSE
                   CASE WHEN LEAST(i, nn + 1 - i) % 2 = 1
                     THEN 2 * LEAST(i, nn + 1 - i)
                     ELSE 2 * LEAST(i, nn + 1 - i) - 1 END
                 END AS str
          FROM ranked CROSS JOIN tot),
        agg AS (
          SELECT MAX(nn) AS nn, MAX(n1) AS n1, MAX(n2) AS n2,
                 CAST(SUM(CASE WHEN g = 1 THEN str ELSE 0 END) AS BIGINT)
                   AS w
          FROM st)
        SELECT n1, n2, w AS w_stat,
               ROUND((CAST(w AS DOUBLE) -
                 CAST(n1 AS DOUBLE) * CAST(nn + 1 AS DOUBLE) /
                   CAST(2 AS DOUBLE)) /
                 sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) *
                   CAST(nn + 1 AS DOUBLE) / CAST(12 AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS z_st
        FROM agg""")),
    // Cochran-Mantel-Haenszel test of the weekend-uplift question
    // "are purchases associated with the week-phase, controlling for
    // which week it was?" — five weekly strata of 2×2 (phase-weekend ×
    // purchase) tables, the CONTINUITY-CORRECTED CMH chi-square (qaq
    // ships the uncorrected statistic on nation-stratified lineitem
    // tables; the 0.5 correction is what epi software reports for
    // sparse strata) and the Mantel-Haenszel pooled odds ratio. The
    // stratified version of q6s/qdb's marginal independence tests
    // (which a week-level trend would confound). Every E_k and V_k is a raw ratio of exact BIGINT
    // margins, 9-snapped and summed in DECIMAL.
    "qdn_cmh_stratified" -> Q(
      fn = (s, dir) => {
        val e = t(s, dir, "events")
          .select((unix_millis(col("ts")) / lit(86400000L)).cast("long")
            .as("day"), col("event_type"))
        val rel = e.crossJoin(broadcast(e.agg(min(col("day")).as("d0"))))
          .select(((col("day") - col("d0")) / lit(7)).cast("long").as("wk"),
            (pmod(col("day") - col("d0"), lit(7)) >= 5).as("wknd"),
            (col("event_type") === "purchase").as("pur"))
        val strata = rel.groupBy(col("wk"))
          .agg(
            sum(when(col("wknd") && col("pur"), 1L).otherwise(0L)).as("a"),
            sum(when(col("wknd") && !col("pur"), 1L).otherwise(0L)).as("b"),
            sum(when(!col("wknd") && col("pur"), 1L).otherwise(0L)).as("c"),
            sum(when(!col("wknd") && !col("pur"), 1L).otherwise(0L)).as("d"))
          .select(col("wk"), col("a"), col("b"), col("c"), col("d"),
            (col("a") + col("b")).as("n1"), (col("c") + col("d")).as("n0"),
            (col("a") + col("c")).as("m1"),
            (col("a") + col("b") + col("c") + col("d")).as("tt"))
        val agg = strata.agg(count(lit(1)).as("n_strata"),
          sum(col("a")).as("sa"),
          sum(round(col("n1").cast("double") * col("m1").cast("double") /
            col("tt").cast("double"), 9).cast("decimal(18,9)")).as("se"),
          sum(round(col("n1").cast("double") * col("n0").cast("double") *
            col("m1").cast("double") * (col("tt") - col("m1")).cast("double") /
            (col("tt").cast("double") * col("tt").cast("double") *
              (col("tt") - 1).cast("double")), 9).cast("decimal(18,9)"))
            .as("sv"),
          sum(round(col("a").cast("double") * col("d").cast("double") /
            col("tt").cast("double"), 9).cast("decimal(18,9)")).as("sad"),
          sum(round(col("b").cast("double") * col("c").cast("double") /
            col("tt").cast("double"), 9).cast("decimal(18,9)")).as("sbc"))
        agg.select(col("n_strata"), col("sa").as("sum_a"),
          round(col("se").cast("double"), 6).as("sum_e"),
          round(
            (abs(col("sa").cast("double") - col("se").cast("double")) -
              lit(0.5)) *
            (abs(col("sa").cast("double") - col("se").cast("double")) -
              lit(0.5)) / col("sv").cast("double"), 6).as("cmh_stat"),
          round(col("sad").cast("double") / col("sbc").cast("double"), 6)
            .as("or_mh"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
                 event_type
          FROM events),
        d0 AS (SELECT MIN(day) AS d0 FROM e),
        rel AS (
          SELECT (day - d0.d0) // 7 AS wk,
                 ((day - d0.d0) % 7) >= 5 AS wknd,
                 event_type = 'purchase' AS pur
          FROM e CROSS JOIN d0),
        strata AS (
          SELECT wk,
                 CAST(SUM(CASE WHEN wknd AND pur THEN 1 ELSE 0 END)
                   AS BIGINT) AS a,
                 CAST(SUM(CASE WHEN wknd AND NOT pur THEN 1 ELSE 0 END)
                   AS BIGINT) AS b,
                 CAST(SUM(CASE WHEN NOT wknd AND pur THEN 1 ELSE 0 END)
                   AS BIGINT) AS c,
                 CAST(SUM(CASE WHEN NOT wknd AND NOT pur THEN 1 ELSE 0 END)
                   AS BIGINT) AS d
          FROM rel GROUP BY 1),
        m AS (
          SELECT wk, a, b, c, d, a + b AS n1, c + d AS n0, a + c AS m1,
                 a + b + c + d AS tt
          FROM strata),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
                 CAST(SUM(a) AS BIGINT) AS sa,
                 SUM(CAST(ROUND(CAST(n1 AS DOUBLE) * CAST(m1 AS DOUBLE) /
                   CAST(tt AS DOUBLE), 9) AS DECIMAL(18,9))) AS se,
                 SUM(CAST(ROUND(CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE) *
                   CAST(m1 AS DOUBLE) * CAST(tt - m1 AS DOUBLE) /
                   (CAST(tt AS DOUBLE) * CAST(tt AS DOUBLE) *
                     CAST(tt - 1 AS DOUBLE)), 9) AS DECIMAL(18,9))) AS sv,
                 SUM(CAST(ROUND(CAST(a AS DOUBLE) * CAST(d AS DOUBLE) /
                   CAST(tt AS DOUBLE), 9) AS DECIMAL(18,9))) AS sad,
                 SUM(CAST(ROUND(CAST(b AS DOUBLE) * CAST(c AS DOUBLE) /
                   CAST(tt AS DOUBLE), 9) AS DECIMAL(18,9))) AS sbc
          FROM m)
        SELECT n_strata, sa AS sum_a,
               ROUND(CAST(se AS DOUBLE), 6) + CAST(0 AS DOUBLE) AS sum_e,
               ROUND((ABS(CAST(sa AS DOUBLE) - CAST(se AS DOUBLE)) -
                   CAST(0.5 AS DOUBLE)) *
                 (ABS(CAST(sa AS DOUBLE) - CAST(se AS DOUBLE)) -
                   CAST(0.5 AS DOUBLE)) / CAST(sv AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS cmh_stat,
               ROUND(CAST(sad AS DOUBLE) / CAST(sbc AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS or_mh
        FROM agg""")),

    // Mood's median test of order value across the five priorities: the
    // k-sample above/below-grand-median chi-square — the coarsest, most
    // outlier-proof location test (qbo's Kruskal-Wallis uses full ranks;
    // Mood only asks which side of the grand median each order falls,
    // so single wild values cannot move it). The grand median is the
    // exact ((N+1) div 2) order statistic; values equal to the median
    // count as "not above" (noted tie policy); the chi-square is a
    // 9-snapped DECIMAL sum of exact-integer-margin terms.
    "qdo_mood_median" -> Q(
      fn = (s, dir) => {
        val o = t(s, dir, "orders")
          .select(col("o_orderpriority").as("g"),
            col("o_totalprice").cast("decimal(18,2)").as("y"),
            col("o_orderkey").as("k"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(o,
          Seq(col("y"), col("k")), "vr").localCheckpoint(eager = false)
        val n0 = ranked.agg(count(lit(1)).as("nn"))
        val med = ranked.crossJoin(broadcast(n0))
          .filter(col("vr") ===
            floor((col("nn") + 1).cast("double") / lit(2.0)).cast("long"))
          .select(col("y").as("med"))
        val cells = ranked.crossJoin(broadcast(med))
          .groupBy(col("g"))
          .agg(count(lit(1)).as("ni"),
            sum(when(col("y") > col("med"), 1L).otherwise(0L)).as("ai"))
        val tot = cells.agg(sum(col("ni")).as("nn"), sum(col("ai")).as("aa"),
          count(lit(1)).as("k"))
        val terms = cells.crossJoin(broadcast(tot))
          .select(col("nn"), col("k"), col("aa"),
            col("ai").cast("double").as("a"),
            (col("ni") - col("ai")).cast("double").as("b"),
            (col("ni").cast("double") * col("aa").cast("double") /
              col("nn").cast("double")).as("ea"),
            (col("ni").cast("double") *
              (col("nn") - col("aa")).cast("double") /
              col("nn").cast("double")).as("eb"))
          .agg(first(col("nn")).as("n"), first(col("k")).as("k"),
            first(col("aa")).as("n_above"),
            sum(round((col("a") - col("ea")) * (col("a") - col("ea")) /
              col("ea") +
              (col("b") - col("eb")) * (col("b") - col("eb")) / col("eb"),
              9).cast("decimal(18,9)")).as("x2"))
        terms.crossJoin(broadcast(med))
          .select(col("n"), col("k"), col("n_above"),
            col("med").cast("double").as("grand_median"),
            round(col("x2").cast("double"), 6).as("chi2_mood"))
      },
      oracle = Some("""
        WITH o AS (
          SELECT o_orderpriority AS g,
                 CAST(o_totalprice AS DECIMAL(18,2)) AS y,
                 o_orderkey AS k
          FROM orders),
        ranked AS MATERIALIZED (
          SELECT g, y, ROW_NUMBER() OVER (ORDER BY y, k) AS vr FROM o),
        n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM ranked),
        med AS (
          SELECT y AS med FROM ranked CROSS JOIN n0
          WHERE vr = (nn + 1) // 2),
        cells AS (
          SELECT g, CAST(COUNT(*) AS BIGINT) AS ni,
                 CAST(SUM(CASE WHEN y > med.med THEN 1 ELSE 0 END)
                   AS BIGINT) AS ai
          FROM ranked CROSS JOIN med GROUP BY 1),
        tot AS (
          SELECT CAST(SUM(ni) AS BIGINT) AS nn,
                 CAST(SUM(ai) AS BIGINT) AS aa,
                 CAST(COUNT(*) AS BIGINT) AS k
          FROM cells),
        terms AS (
          SELECT MAX(tot.nn) AS n, MAX(tot.k) AS k, MAX(tot.aa) AS n_above,
                 SUM(CAST(ROUND(
                   (CAST(ai AS DOUBLE) - CAST(ni AS DOUBLE) *
                     CAST(aa AS DOUBLE) / CAST(tot.nn AS DOUBLE)) *
                   (CAST(ai AS DOUBLE) - CAST(ni AS DOUBLE) *
                     CAST(aa AS DOUBLE) / CAST(tot.nn AS DOUBLE)) /
                   (CAST(ni AS DOUBLE) * CAST(aa AS DOUBLE) /
                     CAST(tot.nn AS DOUBLE)) +
                   (CAST(ni - ai AS DOUBLE) - CAST(ni AS DOUBLE) *
                     CAST(tot.nn - aa AS DOUBLE) / CAST(tot.nn AS DOUBLE)) *
                   (CAST(ni - ai AS DOUBLE) - CAST(ni AS DOUBLE) *
                     CAST(tot.nn - aa AS DOUBLE) / CAST(tot.nn AS DOUBLE)) /
                   (CAST(ni AS DOUBLE) * CAST(tot.nn - aa AS DOUBLE) /
                     CAST(tot.nn AS DOUBLE)), 9) AS DECIMAL(18,9))) AS x2
          FROM cells CROSS JOIN tot)
        SELECT n, k, n_above,
               CAST(med AS DOUBLE) AS grand_median,
               ROUND(CAST(x2 AS DOUBLE), 6) + CAST(0 AS DOUBLE)
                 AS chi2_mood
        FROM terms CROSS JOIN med""")),
    // Fixed-effect meta-analysis pooling the five regions' mean order
    // values: inverse-variance weights, the pooled estimate and its
    // standard error, Cochran's Q heterogeneity and the I² share — "do
    // the regional markets tell one story?" asked the way evidence
    // synthesis asks it (q99's dashboard juxtaposes the means; this
    // pools them with uncertainty). Per-region moments reuse the qd8
    // recipe (DECIMAL squares, VARCHAR-bridged >2^53 casts); weight
    // terms are rounded at 12 (well inside 15 significant digits at
    // these magnitudes) and summed in DECIMAL so the 5-term aggregation
    // is order-free.
    "qdp_meta_analysis_pool" -> Q(
      fn = (s, dir) => {
        val g = t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
          .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"))
          .agg(count(lit(1)).as("ni"),
            sum(col("o_totalprice").cast("decimal(18,2)")).as("syd"),
            sum(col("o_totalprice").cast("decimal(12,2)") *
              col("o_totalprice").cast("decimal(12,2)")).as("syyd"))
          .select(col("r_name"), col("ni"),
            col("syd").cast("double").as("syg"),
            col("syyd").cast("double").as("syyg"))
          .select(col("r_name"), col("ni"),
            round(col("syg") / col("ni").cast("double"), 9).as("mi"),
            round((col("syyg") - col("syg") * col("syg") /
              col("ni").cast("double")) /
              ((col("ni") - 1).cast("double") * col("ni").cast("double")),
              9).as("se2"))
          .localCheckpoint(eager = false)
        val pool = g.agg(count(lit(1)).as("k"),
          sum(round(lit(1.0) / col("se2"), 12).cast("decimal(24,12)"))
            .as("sw"),
          sum(round(col("mi") / col("se2"), 12).cast("decimal(24,12)"))
            .as("swm"))
          .select(col("k"),
            col("sw").cast("double").as("sw"),
            round(col("swm").cast("double") / col("sw").cast("double"), 9)
              .as("pooled"))
        val het = g.crossJoin(broadcast(pool))
          .select(col("k"), col("sw"), col("pooled"),
            (col("mi") - col("pooled")).as("dm"), col("se2"))
          .agg(first(col("k")).as("k"), first(col("sw")).as("sw"),
            first(col("pooled")).as("pooled"),
            sum(round(col("dm") * col("dm") / col("se2"), 9)
              .cast("decimal(18,9)")).as("qd"))
        het.select(col("k"),
          round(col("pooled"), 6).as("pooled_mean"),
          round(lit(1.0) / sqrt(col("sw")), 6).as("pooled_se"),
          round(col("qd").cast("double"), 6).as("q_het"),
          round(greatest(lit(0.0),
            (col("qd").cast("double") - (col("k") - 1).cast("double")) /
              col("qd").cast("double")), 6).as("i2"))
      },
      oracle = Some("""
        WITH g0 AS (
          SELECT r_name, CAST(COUNT(*) AS BIGINT) AS ni,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                   AS syg,
                 CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2)) *
                   CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR)
                   AS DOUBLE) AS syyg
          FROM orders
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY 1),
        g AS MATERIALIZED (
          SELECT r_name, ni,
                 ROUND(syg / CAST(ni AS DOUBLE), 9) AS mi,
                 ROUND((syyg - syg * syg / CAST(ni AS DOUBLE)) /
                   (CAST(ni - 1 AS DOUBLE) * CAST(ni AS DOUBLE)), 9) AS se2
          FROM g0),
        pool AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS k,
                 CAST(SUM(CAST(ROUND(CAST(1 AS DOUBLE) / se2, 12)
                   AS DECIMAL(24,12))) AS DOUBLE) AS sw,
                 ROUND(CAST(SUM(CAST(ROUND(mi / se2, 12)
                     AS DECIMAL(24,12))) AS DOUBLE) /
                   CAST(SUM(CAST(ROUND(CAST(1 AS DOUBLE) / se2, 12)
                     AS DECIMAL(24,12))) AS DOUBLE), 9) AS pooled
          FROM g),
        het AS (
          SELECT MAX(pool.k) AS k, MAX(pool.sw) AS sw,
                 MAX(pool.pooled) AS pooled,
                 SUM(CAST(ROUND((mi - pool.pooled) * (mi - pool.pooled) /
                   se2, 9) AS DECIMAL(18,9))) AS qd
          FROM g CROSS JOIN pool)
        SELECT k,
               ROUND(pooled, 6) + CAST(0 AS DOUBLE) AS pooled_mean,
               ROUND(CAST(1 AS DOUBLE) / sqrt(sw), 6) + CAST(0 AS DOUBLE)
                 AS pooled_se,
               ROUND(CAST(qd AS DOUBLE), 6) + CAST(0 AS DOUBLE) AS q_het,
               ROUND(GREATEST(CAST(0 AS DOUBLE),
                 (CAST(qd AS DOUBLE) - CAST(k - 1 AS DOUBLE)) /
                   CAST(qd AS DOUBLE)), 6) + CAST(0 AS DOUBLE) AS i2
        FROM het""")),

    // Bartlett's test for equal order-value variances across priorities
    // — the parametric sibling of qdl's Brown-Forsythe (Bartlett is the
    // likelihood-ratio test and the more powerful one under normality;
    // BF is the one that survives heavy tails — shipping both brackets
    // the assumption). Values scale to thousands so every variance sits
    // within the 15-digit ROUND envelope; (ni-1)·ln(s²) terms multiply
    // INTEGER × 9-grid in DECIMAL per rule 15; the small-sample C
    // correction sums 1/(ni-1) terms rounded at 12 in DECIMAL so the
    // 5-term aggregation is order-free.
    "qdq_bartlett" -> Q(
      fn = (s, dir) => {
        val g = t(s, dir, "orders")
          .select(col("o_orderpriority").as("g"),
            (col("o_totalprice").cast("decimal(18,2)") / lit(1000))
              .cast("decimal(15,5)").as("y"))
          .groupBy(col("g"))
          .agg(count(lit(1)).as("ni"), sum(col("y")).as("syd"),
            sum(col("y").cast("decimal(12,5)") *
              col("y").cast("decimal(12,5)")).as("syyd"))
          .select(col("g"), col("ni"), col("syd").cast("double").as("sy"),
            col("syyd").cast("double").as("syy"))
          .select(col("g"), col("ni"),
            round((col("syy") - col("sy") * col("sy") /
              col("ni").cast("double")) / (col("ni") - 1).cast("double"), 9)
              .as("s2"),
            round(col("syy") - col("sy") * col("sy") /
              col("ni").cast("double"), 6).as("ssw_g"))
          .localCheckpoint(eager = false)
        val agg = g.agg(sum(col("ni")).as("nn"), count(lit(1)).as("k"),
          sum(col("ssw_g").cast("decimal(28,6)")).as("ssw"),
          sum((col("ni") - 1).cast("decimal(10,0)") *
            round(log(col("s2")), 9).cast("decimal(16,9)")).as("slns"),
          sum(round(lit(1.0) / (col("ni") - 1).cast("double"), 12)
            .cast("decimal(24,12)")).as("sinv"))
        val pre = agg.select(col("nn"), col("k"),
          round(col("ssw").cast("double") /
            (col("nn") - col("k")).cast("double"), 9).as("s2p"),
          col("slns").cast("double").as("slns"),
          col("sinv").cast("double").as("sinv"))
        pre.select(col("nn").as("n"), col("k"),
          round(col("s2p"), 6).as("pooled_var_k"),
          round(lit(1.0) + (col("sinv") -
            lit(1.0) / (col("nn") - col("k")).cast("double")) /
            (lit(3.0) * (col("k") - 1).cast("double")), 6).as("c_factor"),
          round(
            ((col("nn") - col("k")).cast("decimal(10,0)") *
              round(log(col("s2p")), 9).cast("decimal(16,9)"))
              .cast("double").-(col("slns")) /
            (lit(1.0) + (col("sinv") -
              lit(1.0) / (col("nn") - col("k")).cast("double")) /
              (lit(3.0) * (col("k") - 1).cast("double"))), 6)
            .as("bartlett_stat"))
      },
      oracle = Some("""
        WITH g0 AS (
          SELECT o_orderpriority AS g, CAST(COUNT(*) AS BIGINT) AS ni,
                 CAST(SUM(CAST(CAST(o_totalprice AS DECIMAL(18,2)) / 1000
                   AS DECIMAL(15,5))) AS DOUBLE) AS sy,
                 CAST(CAST(SUM(
                   CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) / 1000
                     AS DECIMAL(15,5)) AS DECIMAL(12,5)) *
                   CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) / 1000
                     AS DECIMAL(15,5)) AS DECIMAL(12,5))) AS VARCHAR)
                   AS DOUBLE) AS syy
          FROM orders GROUP BY 1),
        g AS MATERIALIZED (
          SELECT g, ni,
                 ROUND((syy - sy * sy / CAST(ni AS DOUBLE)) /
                   CAST(ni - 1 AS DOUBLE), 9) AS s2,
                 ROUND(syy - sy * sy / CAST(ni AS DOUBLE), 6) AS ssw_g
          FROM g0),
        agg AS (
          SELECT CAST(SUM(ni) AS BIGINT) AS nn,
                 CAST(COUNT(*) AS BIGINT) AS k,
                 CAST(SUM(CAST(ssw_g AS DECIMAL(28,6))) AS DOUBLE) AS ssw,
                 CAST(SUM(CAST(ni - 1 AS DECIMAL(10,0)) *
                   CAST(ROUND(ln(s2), 9) AS DECIMAL(16,9))) AS DOUBLE)
                   AS slns,
                 CAST(SUM(CAST(ROUND(CAST(1 AS DOUBLE) /
                   CAST(ni - 1 AS DOUBLE), 12) AS DECIMAL(24,12)))
                   AS DOUBLE) AS sinv
          FROM g),
        pre AS (
          SELECT nn, k,
                 ROUND(ssw / CAST(nn - k AS DOUBLE), 9) AS s2p,
                 slns, sinv
          FROM agg)
        SELECT nn AS n, k,
               ROUND(s2p, 6) + CAST(0 AS DOUBLE) AS pooled_var_k,
               ROUND(CAST(1 AS DOUBLE) + (sinv -
                 CAST(1 AS DOUBLE) / CAST(nn - k AS DOUBLE)) /
                 (CAST(3 AS DOUBLE) * CAST(k - 1 AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS c_factor,
               ROUND((CAST(CAST(nn - k AS DECIMAL(10,0)) *
                   CAST(ROUND(ln(s2p), 9) AS DECIMAL(16,9)) AS DOUBLE) -
                 slns) /
                 (CAST(1 AS DOUBLE) + (sinv -
                   CAST(1 AS DOUBLE) / CAST(nn - k AS DOUBLE)) /
                   (CAST(3 AS DOUBLE) * CAST(k - 1 AS DOUBLE))), 6)
                 + CAST(0 AS DOUBLE) AS bartlett_stat
        FROM pre""")),
    // Friedman rank test + Page's L ordered-trend test over the weekly
    // blocks: each full week ranks its seven daily event counts
    // (deterministic (count, phase) tiebreak, noted in lieu of average
    // ranks — daily totals are distinct in practice), Friedman asks "do
    // the week-phases differ at all?", Page asks "do they INCREASE along
    // the phase order?" — the repeated-measures complements of qbn's
    // one-way ANOVA (independent groups) on a design where every week
    // sees every phase. Both statistics are pure integer arithmetic
    // until one final ratio / sqrt.
    "qdr_friedman_page" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val daily = t(s, dir, "events")
          .groupBy((unix_millis(col("ts")) / lit(86400000L)).cast("long")
            .as("day"))
          .agg(count(lit(1)).as("x"))
        val rel = daily.crossJoin(broadcast(
          daily.agg(min(col("day")).as("d0"))))
          .select(((col("day") - col("d0")) / lit(7)).cast("long").as("wk"),
            pmod(col("day") - col("d0"), lit(7L)).as("ph"), col("x"))
        val full = rel.groupBy(col("wk")).agg(count(lit(1)).as("c"))
          .filter(col("c") === 7).select(col("wk"))
        val ranks = rel.join(full, Seq("wk"))
          .select(col("wk"), col("ph"), col("x"),
            row_number().over(Window.partitionBy(col("wk"))
              .orderBy(col("x"), col("ph"))).cast("long").as("rk"))
        val rj = ranks.groupBy(col("ph"))
          .agg(sum(col("rk")).as("rjs"), count(lit(1)).as("b"))
        val agg = rj.agg(first(col("b")).as("b"), count(lit(1)).as("k"),
          sum(col("rjs") * col("rjs")).as("sr2"),
          sum((col("ph") + 1) * col("rjs")).as("pl"))
        agg.select(col("b"), col("k"),
          round((lit(12L) * col("sr2")).cast("double") /
            (col("b") * col("k") * (col("k") + 1)).cast("double") -
            (lit(3L) * col("b") * (col("k") + 1)).cast("double"), 6)
            .as("friedman_chi2"),
          col("pl").as("page_l"),
          round((col("pl").cast("double") -
            (col("b") * col("k") * (col("k") + 1) * (col("k") + 1))
              .cast("double") / lit(4.0)) /
            sqrt((col("b") * col("k") * col("k") * (col("k") + 1))
              .cast("double") *
              (col("k") * col("k") - 1).cast("double") / lit(144.0)), 6)
            .as("page_z"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
                 CAST(COUNT(*) AS BIGINT) AS x
          FROM events GROUP BY 1),
        d0 AS (SELECT MIN(day) AS d0 FROM daily),
        rel AS (
          SELECT (day - d0.d0) // 7 AS wk,
                 (day - d0.d0) % 7 AS ph, x
          FROM daily CROSS JOIN d0),
        full_wk AS (
          SELECT wk FROM rel GROUP BY 1 HAVING COUNT(*) = 7),
        ranks AS (
          SELECT wk, ph, x,
                 CAST(ROW_NUMBER() OVER (PARTITION BY wk ORDER BY x, ph)
                   AS BIGINT) AS rk
          FROM rel JOIN full_wk USING (wk)),
        rj AS (
          SELECT ph, CAST(SUM(rk) AS BIGINT) AS rjs,
                 CAST(COUNT(*) AS BIGINT) AS b
          FROM ranks GROUP BY 1),
        agg AS (
          SELECT MAX(b) AS b, CAST(COUNT(*) AS BIGINT) AS k,
                 CAST(SUM(rjs * rjs) AS BIGINT) AS sr2,
                 CAST(SUM((ph + 1) * rjs) AS BIGINT) AS pl
          FROM rj)
        SELECT b, k,
               ROUND(CAST(12 * sr2 AS DOUBLE) /
                   CAST(b * k * (k + 1) AS DOUBLE) -
                 CAST(3 * b * (k + 1) AS DOUBLE), 6) + CAST(0 AS DOUBLE)
                 AS friedman_chi2,
               pl AS page_l,
               ROUND((CAST(pl AS DOUBLE) -
                   CAST(b * k * (k + 1) * (k + 1) AS DOUBLE) /
                     CAST(4 AS DOUBLE)) /
                 sqrt(CAST(b * k * k * (k + 1) AS DOUBLE) *
                   CAST(k * k - 1 AS DOUBLE) / CAST(144 AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS page_z
        FROM agg""")),

    // Attribute control chart (p-chart) of the daily purchase share:
    // per-day 3-sigma binomial limits around the pooled rate — the
    // unequal-n attribute twin of qc1's EWMA chart (which tracks a
    // continuous level; this monitors a PROPORTION with per-day sample
    // size in the limit width). Emits every day with its limits and
    // flag so the output is non-vacuous whichever days are in control.
    // All shares are raw ratios of exact BIGINTs; the flag compares
    // identically-computed doubles in both engines.
    "qds_p_chart" -> Q(
      fn = (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy((unix_millis(col("ts")) / lit(86400000L)).cast("long")
            .as("day"))
          .agg(count(lit(1)).as("nd"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("xd"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(daily,
          Seq(col("day")), "rn").localCheckpoint(eager = false)
        val pbar = ranked.agg(sum(col("xd")).as("sx"), sum(col("nd")).as("sn"))
          .select((col("sx").cast("double") / col("sn").cast("double"))
            .as("pb"))
        ranked.crossJoin(broadcast(pbar))
          .select(col("rn").cast("long").as("rn"), col("nd"), col("xd"),
            col("pb"),
            (col("xd").cast("double") / col("nd").cast("double")).as("pd"),
            (col("pb") - lit(3.0) * sqrt(col("pb") * (lit(1.0) - col("pb")) /
              col("nd").cast("double"))).as("lo"),
            (col("pb") + lit(3.0) * sqrt(col("pb") * (lit(1.0) - col("pb")) /
              col("nd").cast("double"))).as("hi"))
          .select(col("rn"), col("nd"), col("xd"),
            round(col("pd"), 6).as("p_day"),
            round(col("pb"), 6).as("p_bar"),
            round(col("lo"), 6).as("lcl"),
            round(col("hi"), 6).as("ucl"),
            when(col("pd") < col("lo"), lit("low"))
              .when(col("pd") > col("hi"), lit("high"))
              .otherwise(lit("in")).as("flag"))
          .orderBy(col("rn"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
                 CAST(COUNT(*) AS BIGINT) AS nd,
                 CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                   END) AS BIGINT) AS xd
          FROM events GROUP BY 1),
        r AS (
          SELECT nd, xd, ROW_NUMBER() OVER (ORDER BY day) AS rn
          FROM daily),
        pbar AS (
          SELECT CAST(SUM(xd) AS DOUBLE) / CAST(SUM(nd) AS DOUBLE) AS pb
          FROM r),
        scored AS (
          SELECT CAST(rn AS BIGINT) AS rn, nd, xd, pb,
                 CAST(xd AS DOUBLE) / CAST(nd AS DOUBLE) AS pd,
                 pb - CAST(3 AS DOUBLE) *
                   sqrt(pb * (CAST(1 AS DOUBLE) - pb) /
                     CAST(nd AS DOUBLE)) AS lo,
                 pb + CAST(3 AS DOUBLE) *
                   sqrt(pb * (CAST(1 AS DOUBLE) - pb) /
                     CAST(nd AS DOUBLE)) AS hi
          FROM r CROSS JOIN pbar)
        SELECT rn, nd, xd,
               ROUND(pd, 6) + CAST(0 AS DOUBLE) AS p_day,
               ROUND(pb, 6) + CAST(0 AS DOUBLE) AS p_bar,
               ROUND(lo, 6) + CAST(0 AS DOUBLE) AS lcl,
               ROUND(hi, 6) + CAST(0 AS DOUBLE) AS ucl,
               CASE WHEN pd < lo THEN 'low'
                    WHEN pd > hi THEN 'high'
                    ELSE 'in' END AS flag
        FROM scored ORDER BY rn""")),

    // Two-sample Anderson-Darling statistic between the purchase and
    // click value distributions (Pettitt's rank form): A² = (1/(nm)) ·
    // Σ_{i<N} (M_i·N - n·i)² / (i(N-i)) — weights the CDF gap by the
    // tail variance, so it out-powers KS (q6u) exactly where drift
    // hides: in the tails. M_i rides an exact integer running count
    // over the pooled (value, sample, event_id) order (the explicit
    // tiebreak makes cross-sample ties deterministic in both engines —
    // noted in place of the tie-averaged variant); every term is an
    // exact-integer ratio, 9-snapped and summed in DECIMAL.
    "qdt_anderson_darling" -> Q(
      fn = (s, dir) => {
        val e = t(s, dir, "events")
          .filter(col("event_type").isin("purchase", "click") &&
            col("value").isNotNull)
          .select(col("value").cast("decimal(18,2)").as("v"),
            when(col("event_type") === "purchase", 1L).otherwise(0L)
              .as("g"), col("event_id"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(e,
          Seq(col("v"), col("g"), col("event_id")), "i")
        val cum = graft.operators.ScaleOps.globalRunningSum(ranked,
          Seq(col("i")), col("g"), "mi").localCheckpoint(eager = false)
        val tot = cum.agg(count(lit(1)).as("nn"), sum(col("g")).as("n1"))
          .select(col("nn"), col("n1"), (col("nn") - col("n1")).as("n2"))
        val terms = cum.crossJoin(broadcast(tot))
          .filter(col("i") < col("nn"))
          .select(
            round(
              ((col("mi") * col("nn") - col("n1") * col("i")) *
                (col("mi") * col("nn") - col("n1") * col("i")))
                .cast("double") /
              (col("i") * (col("nn") - col("i"))).cast("double"), 9)
              .as("term"), col("nn"), col("n1"), col("n2"))
        terms.agg(first(col("n1")).as("n1"), first(col("n2")).as("n2"),
          sum(col("term").cast("decimal(28,9)")).as("ts"))
          .select(col("n1"), col("n2"),
            round(col("ts").cast("double") /
              (col("n1") * col("n2")).cast("double"), 6).as("a2_stat"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT CAST(value AS DECIMAL(18,2)) AS v,
                 CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g,
                 event_id
          FROM events
          WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL),
        ranked AS (
          SELECT g, ROW_NUMBER() OVER (ORDER BY v, g, event_id) AS i
          FROM e),
        cum AS MATERIALIZED (
          SELECT i, SUM(g) OVER (ORDER BY i ROWS UNBOUNDED PRECEDING)
                   AS mi
          FROM ranked),
        tot2 AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS nn,
                 CAST(MAX(mi) AS BIGINT) AS n1,
                 CAST(COUNT(*) AS BIGINT) - CAST(MAX(mi) AS BIGINT) AS n2
          FROM cum),
        terms AS (
          SELECT ROUND(CAST((CAST(mi AS BIGINT) * nn - n1 * i) *
                   (CAST(mi AS BIGINT) * nn - n1 * i) AS DOUBLE) /
                 CAST(i * (nn - i) AS DOUBLE), 9) AS term, n1, n2
          FROM cum CROSS JOIN tot2
          WHERE i < nn)
        SELECT MAX(n1) AS n1, MAX(n2) AS n2,
               ROUND(CAST(SUM(CAST(term AS DECIMAL(28,9))) AS DOUBLE) /
                 CAST(MAX(n1) * MAX(n2) AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS a2_stat
        FROM terms""")),

    // Murphy decomposition of the Brier score for a LEAVE-ONE-OUT
    // week-phase forecaster of "above-median purchase day": Brier =
    // uncertainty - resolution + reliability, conditioning on the
    // forecast value. qap decomposes an in-sample forecaster (its
    // reliability is an artifact of binning); holding each day out
    // makes reliability a real miscalibration signal — the honest
    // out-of-sample variant, beyond q5s's reliability-only table. LOO rates are exact
    // rationals (c_k - o_d)/(n_k - 1); forecast groups key on the exact
    // integer 12·f (denominators 3 and 4 both divide 12), so equal
    // forecasts merge exactly; every component is a raw ratio of exact
    // integers with 9-snapped DECIMAL term sums.
    "qdu_brier_murphy" -> Q(
      fn = (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy((unix_millis(col("ts")) / lit(86400000L)).cast("long")
            .as("day"))
          .agg(sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
            .as("x"))
        val rel = daily.crossJoin(broadcast(
          daily.agg(min(col("day")).as("d0"))))
          .select(col("day"), pmod(col("day") - col("d0"), lit(7L)).as("ph"),
            col("x"))
        val byVal = graft.operators.ScaleOps.globalRowNumber(rel,
          Seq(col("x"), col("day")), "vr").localCheckpoint(eager = false)
        val n0 = byVal.agg(count(lit(1)).as("n"))
        val med = byVal.crossJoin(broadcast(n0))
          .filter(col("vr") ===
            floor((col("n") + 1).cast("double") / lit(2.0)).cast("long"))
          .select(col("x").as("med"))
        val oc = byVal.crossJoin(broadcast(med))
          .select(col("ph"), when(col("x") > col("med"), 1L).otherwise(0L)
            .as("o"))
          .localCheckpoint(eager = false)
        val pk = oc.groupBy(col("ph"))
          .agg(count(lit(1)).as("nk"), sum(col("o")).as("ck"))
        val scored = oc.join(pk, Seq("ph"))
          .select(col("o"),
            ((col("ck") - col("o")) * (lit(12L) / (col("nk") - 1)))
              .as("fkey"),
            ((col("ck") - col("o")).cast("double") /
              (col("nk") - 1).cast("double")).as("f"))
          .localCheckpoint(eager = false)
        val base = scored.agg(count(lit(1)).as("n"), sum(col("o")).as("so"),
          sum(round((col("f") - col("o").cast("double")) *
            (col("f") - col("o").cast("double")), 9)
            .cast("decimal(18,9)")).as("bsum"))
          .select(col("n"), col("so"),
            (col("so").cast("double") / col("n").cast("double")).as("obar"),
            col("bsum"))
        val grps = scored.groupBy(col("fkey"))
          .agg(count(lit(1)).as("ng"), sum(col("o")).as("sog"),
            first(col("f")).as("fg"))
        val parts = grps.crossJoin(broadcast(base))
          .select(col("n"), col("obar"), col("bsum"),
            round(col("ng").cast("double") *
              (col("sog").cast("double") / col("ng").cast("double") -
                col("obar")) *
              (col("sog").cast("double") / col("ng").cast("double") -
                col("obar")), 9).cast("decimal(18,9)").as("rest"),
            round(col("ng").cast("double") *
              (col("fg") - col("sog").cast("double") /
                col("ng").cast("double")) *
              (col("fg") - col("sog").cast("double") /
                col("ng").cast("double")), 9).cast("decimal(18,9)")
              .as("relt"))
          .groupBy(col("n"), col("obar"), col("bsum"))
          .agg(sum(col("rest")).as("ress"), sum(col("relt")).as("rels"))
        parts.select(col("n"),
          round(col("bsum").cast("double") / col("n").cast("double"), 6)
            .as("brier"),
          round(col("obar") * (lit(1.0) - col("obar")), 6).as("uncertainty"),
          round(col("ress").cast("double") / col("n").cast("double"), 6)
            .as("resolution"),
          round(col("rels").cast("double") / col("n").cast("double"), 6)
            .as("reliability"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
                 CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                   END) AS BIGINT) AS x
          FROM events GROUP BY 1),
        d0 AS (SELECT MIN(day) AS d0 FROM daily),
        rel AS (
          SELECT day, (day - d0.d0) % 7 AS ph, x
          FROM daily CROSS JOIN d0),
        r AS (
          SELECT ph, x, ROW_NUMBER() OVER (ORDER BY x, day) AS vr
          FROM rel),
        n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM r),
        med AS (
          SELECT x AS med FROM r CROSS JOIN n0 WHERE vr = (n + 1) // 2),
        oc AS MATERIALIZED (
          SELECT ph, CASE WHEN x > med THEN 1 ELSE 0 END AS o
          FROM r CROSS JOIN med),
        pk AS (
          SELECT ph, CAST(COUNT(*) AS BIGINT) AS nk,
                 CAST(SUM(o) AS BIGINT) AS ck
          FROM oc GROUP BY 1),
        scored AS MATERIALIZED (
          SELECT o, (ck - o) * (12 // (nk - 1)) AS fkey,
                 CAST(ck - o AS DOUBLE) / CAST(nk - 1 AS DOUBLE) AS f
          FROM oc JOIN pk USING (ph)),
        base AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(o) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                   AS obar,
                 SUM(CAST(ROUND((f - CAST(o AS DOUBLE)) *
                   (f - CAST(o AS DOUBLE)), 9) AS DECIMAL(18,9))) AS bsum
          FROM scored),
        grps AS (
          SELECT fkey, CAST(COUNT(*) AS BIGINT) AS ng,
                 CAST(SUM(o) AS BIGINT) AS sog, MAX(f) AS fg
          FROM scored GROUP BY 1),
        parts AS (
          SELECT MAX(base.n) AS n, MAX(base.obar) AS obar,
                 MAX(CAST(base.bsum AS DOUBLE)) AS bsum,
                 SUM(CAST(ROUND(CAST(ng AS DOUBLE) *
                   (CAST(sog AS DOUBLE) / CAST(ng AS DOUBLE) - base.obar) *
                   (CAST(sog AS DOUBLE) / CAST(ng AS DOUBLE) - base.obar),
                   9) AS DECIMAL(18,9))) AS ress,
                 SUM(CAST(ROUND(CAST(ng AS DOUBLE) *
                   (fg - CAST(sog AS DOUBLE) / CAST(ng AS DOUBLE)) *
                   (fg - CAST(sog AS DOUBLE) / CAST(ng AS DOUBLE)), 9)
                   AS DECIMAL(18,9))) AS rels
          FROM grps CROSS JOIN base)
        SELECT n,
               ROUND(bsum / CAST(n AS DOUBLE), 6) + CAST(0 AS DOUBLE)
                 AS brier,
               ROUND(obar * (CAST(1 AS DOUBLE) - obar), 6)
                 + CAST(0 AS DOUBLE) AS uncertainty,
               ROUND(CAST(ress AS DOUBLE) / CAST(n AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS resolution,
               ROUND(CAST(rels AS DOUBLE) / CAST(n AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS reliability
        FROM parts""")),

    // M/G/1 queueing metrics for the purchase stream by the
    // Pollaczek-Khinchine formula: arrival rate from the exact
    // millisecond span, a deterministic value-derived service time
    // (100·value ms, exact integers), utilization rho, and the P-K
    // queue length / waiting time with Little's-law companions. qar
    // measures L = λW empirically and qau sizes an M/M/c pool; P-K is
    // the GENERAL-service single-server law both of those bracket —
    // the second moment E[S²] is what neither computes. E[S] and E[S²] are
    // exact integer moments; every queueing link is a raw ratio.
    "qdv_mg1_queueing" -> Q(
      fn = (s, dir) => {
        val p = t(s, dir, "events")
          .filter(col("event_type") === "purchase" && col("value").isNotNull)
          .select(unix_millis(col("ts")).as("ts_ms"),
            (col("value").cast("decimal(18,2)") * lit(100))
              .cast("long").as("sv"))
        val agg = p.agg(count(lit(1)).as("nj"),
          min(col("ts_ms")).as("t0"), max(col("ts_ms")).as("t1"),
          sum(col("sv")).as("ss"),
          sum(col("sv").cast("decimal(14,0)") *
            col("sv").cast("decimal(14,0)")).as("ss2"))
          .select(col("nj"),
            ((col("nj") - 1).cast("double") /
              (col("t1") - col("t0")).cast("double")).as("lam"),
            (col("ss").cast("double") / col("nj").cast("double")).as("es"),
            (col("ss2").cast("double") / col("nj").cast("double")).as("es2"))
        agg.select(col("nj").as("n_jobs"),
          round(col("lam"), 12).as("lambda_per_ms"),
          round(col("es"), 6).as("mean_service_ms"),
          round(col("lam") * col("es"), 6).as("rho"),
          round(col("lam") * col("lam") * col("es2") /
            (lit(2.0) * (lit(1.0) - col("lam") * col("es"))), 6).as("lq"),
          round(col("lam") * col("es2") /
            (lit(2.0) * (lit(1.0) - col("lam") * col("es"))), 6)
            .as("wq_ms"),
          round(col("lam") * col("es2") /
            (lit(2.0) * (lit(1.0) - col("lam") * col("es"))) + col("es"), 6)
            .as("w_ms"),
          round(col("lam") * (col("lam") * col("es2") /
            (lit(2.0) * (lit(1.0) - col("lam") * col("es"))) + col("es")),
            6).as("l_system"))
      },
      oracle = Some("""
        WITH p AS (
          SELECT epoch_ms(ts) AS ts_ms,
                 CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS sv
          FROM events
          WHERE event_type = 'purchase' AND value IS NOT NULL),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS nj,
                 CAST(COUNT(*) - 1 AS DOUBLE) /
                   CAST(MAX(ts_ms) - MIN(ts_ms) AS DOUBLE) AS lam,
                 CAST(SUM(sv) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS es,
                 CAST(SUM(CAST(sv AS DECIMAL(14,0)) *
                   CAST(sv AS DECIMAL(14,0))) AS DOUBLE) /
                   CAST(COUNT(*) AS DOUBLE) AS es2
          FROM p)
        SELECT nj AS n_jobs,
               ROUND(lam, 12) + CAST(0 AS DOUBLE) AS lambda_per_ms,
               ROUND(es, 6) + CAST(0 AS DOUBLE) AS mean_service_ms,
               ROUND(lam * es, 6) + CAST(0 AS DOUBLE) AS rho,
               ROUND(lam * lam * es2 /
                 (CAST(2 AS DOUBLE) * (CAST(1 AS DOUBLE) - lam * es)), 6)
                 + CAST(0 AS DOUBLE) AS lq,
               ROUND(lam * es2 /
                 (CAST(2 AS DOUBLE) * (CAST(1 AS DOUBLE) - lam * es)), 6)
                 + CAST(0 AS DOUBLE) AS wq_ms,
               ROUND(lam * es2 /
                 (CAST(2 AS DOUBLE) * (CAST(1 AS DOUBLE) - lam * es)) + es,
                 6) + CAST(0 AS DOUBLE) AS w_ms,
               ROUND(lam * (lam * es2 /
                 (CAST(2 AS DOUBLE) * (CAST(1 AS DOUBLE) - lam * es)) + es),
                 6) + CAST(0 AS DOUBLE) AS l_system
        FROM agg""")),

    // Baumgartner-Weiss-Schindler two-sample test between purchase and
    // click values: the variance-weighted rank statistic B =
    // (B_X + B_Y)/2 — more powerful than KS (q6u) and Wilcoxon (q7o)
    // against both location AND scale shifts, the modern default
    // nonparametric two-sample test. Within-sample indexes come from
    // global-rank offsets (the qdl trick, no per-group window); every
    // term is a rational in exact integers, 9-snapped and DECIMAL-
    // summed; the (value, sample, id) tiebreak fixes cross-sample ties
    // deterministically.
    "qdw_bws_test" -> Q(
      fn = (s, dir) => {
        val e = t(s, dir, "events")
          .filter(col("event_type").isin("purchase", "click") &&
            col("value").isNotNull)
          .select(col("value").cast("decimal(18,2)").as("v"),
            when(col("event_type") === "purchase", 1L).otherwise(0L)
              .as("g"), col("event_id"))
        val pooled = graft.operators.ScaleOps.globalRowNumber(e,
          Seq(col("v"), col("g"), col("event_id")), "pr")
        val bySample = graft.operators.ScaleOps.globalRowNumber(pooled,
          Seq(col("g"), col("v"), col("event_id")), "sr")
          .localCheckpoint(eager = false)
        val offs = bySample.groupBy(col("g"))
          .agg(min(col("sr")).as("s0"), count(lit(1)).as("cnt"))
        val tot = offs.agg(sum(col("cnt")).as("nn"),
          max(when(col("g") === 1, col("cnt"))).as("n1"),
          max(when(col("g") === 0, col("cnt"))).as("n0"))
        val terms = bySample.join(offs, Seq("g"))
          .crossJoin(broadcast(tot))
          .select(col("g"),
            round(
              (col("pr").cast("double") -
                col("nn").cast("double") /
                  when(col("g") === 1, col("n1")).otherwise(col("n0"))
                    .cast("double") *
                  (col("sr") - col("s0") + 1).cast("double")) *
              (col("pr").cast("double") -
                col("nn").cast("double") /
                  when(col("g") === 1, col("n1")).otherwise(col("n0"))
                    .cast("double") *
                  (col("sr") - col("s0") + 1).cast("double")) /
              (((col("sr") - col("s0") + 1).cast("double") /
                (when(col("g") === 1, col("n1")).otherwise(col("n0")) + 1)
                  .cast("double")) *
                (lit(1.0) - (col("sr") - col("s0") + 1).cast("double") /
                  (when(col("g") === 1, col("n1")).otherwise(col("n0")) + 1)
                    .cast("double")) *
                (when(col("g") === 1, col("n0")).otherwise(col("n1"))
                  .cast("double") * col("nn").cast("double") /
                  when(col("g") === 1, col("n1")).otherwise(col("n0"))
                    .cast("double"))), 9).as("term"),
            when(col("g") === 1, col("n1")).otherwise(col("n0")).as("ns"))
        val bs = terms.groupBy(col("g"))
          .agg(first(col("ns")).as("ns"),
            sum(col("term").cast("decimal(28,9)")).as("ts"))
          .select(col("g"),
            round(col("ts").cast("double") / col("ns").cast("double"), 9)
              .as("b"))
        bs.groupBy()
          .agg(max(when(col("g") === 1, col("b"))).as("b_x"),
            max(when(col("g") === 0, col("b"))).as("b_y"))
          .select(round(col("b_x"), 6).as("b_x"),
            round(col("b_y"), 6).as("b_y"),
            round((col("b_x") + col("b_y")) / lit(2.0), 6).as("bws_b"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT CAST(value AS DECIMAL(18,2)) AS v,
                 CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g,
                 event_id
          FROM events
          WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL),
        pooled AS MATERIALIZED (
          SELECT g,
                 CAST(ROW_NUMBER() OVER (ORDER BY v, g, event_id)
                   AS BIGINT) AS pr,
                 CAST(ROW_NUMBER() OVER (ORDER BY g, v, event_id)
                   AS BIGINT) AS sr
          FROM e),
        offs AS (
          SELECT g, MIN(sr) AS s0, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM pooled GROUP BY 1),
        tot AS (
          SELECT CAST(SUM(cnt) AS BIGINT) AS nn,
                 MAX(CASE WHEN g = 1 THEN cnt END) AS n1,
                 MAX(CASE WHEN g = 0 THEN cnt END) AS n0
          FROM offs),
        terms AS (
          SELECT p.g,
                 ROUND((CAST(pr AS DOUBLE) -
                     CAST(nn AS DOUBLE) /
                       CAST(CASE WHEN p.g = 1 THEN n1 ELSE n0 END
                         AS DOUBLE) *
                       CAST(sr - s0 + 1 AS DOUBLE)) *
                   (CAST(pr AS DOUBLE) -
                     CAST(nn AS DOUBLE) /
                       CAST(CASE WHEN p.g = 1 THEN n1 ELSE n0 END
                         AS DOUBLE) *
                       CAST(sr - s0 + 1 AS DOUBLE)) /
                   ((CAST(sr - s0 + 1 AS DOUBLE) /
                       CAST((CASE WHEN p.g = 1 THEN n1 ELSE n0 END) + 1
                         AS DOUBLE)) *
                    (CAST(1 AS DOUBLE) - CAST(sr - s0 + 1 AS DOUBLE) /
                       CAST((CASE WHEN p.g = 1 THEN n1 ELSE n0 END) + 1
                         AS DOUBLE)) *
                    (CAST(CASE WHEN p.g = 1 THEN n0 ELSE n1 END
                       AS DOUBLE) * CAST(nn AS DOUBLE) /
                     CAST(CASE WHEN p.g = 1 THEN n1 ELSE n0 END
                       AS DOUBLE))), 9) AS term,
                 CASE WHEN p.g = 1 THEN n1 ELSE n0 END AS ns
          FROM pooled p JOIN offs o ON p.g = o.g CROSS JOIN tot),
        bs AS (
          SELECT g,
                 ROUND(CAST(SUM(CAST(term AS DECIMAL(28,9))) AS DOUBLE) /
                   CAST(MAX(ns) AS DOUBLE), 9) AS b
          FROM terms GROUP BY 1)
        SELECT ROUND(MAX(CASE WHEN g = 1 THEN b END), 6)
                 + CAST(0 AS DOUBLE) AS b_x,
               ROUND(MAX(CASE WHEN g = 0 THEN b END), 6)
                 + CAST(0 AS DOUBLE) AS b_y,
               ROUND((MAX(CASE WHEN g = 1 THEN b END) +
                 MAX(CASE WHEN g = 0 THEN b END)) / CAST(2 AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS bws_b
        FROM bs""")),

    // Hoeffding's D test of independence between a user's activity
    // volume and spend (thinned user panel, the qa8 audit discipline):
    // the rank-based statistic that is consistent against EVERY form of
    // dependence — qa4's Spearman/Kendall see monotone association
    // only; a U-shaped spend-volume relationship is invisible to them
    // and loud to D. Ranks carry a uid tiebreak so Q_i dominance counts
    // are exact integers; D's five-factorial normalization is a single
    // exact-integer ratio.
    "qdx_hoeffdings_d" -> Q(
      fn = (s, dir) => {
        val users = t(s, dir, "events")
          .filter(col("user_id") % 11 === 0)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("x"),
            sum(coalesce(col("value"), lit(0.0)).cast("decimal(18,2)"))
              .as("y"))
        val rx = graft.operators.ScaleOps.globalRowNumber(users,
          Seq(col("x"), col("user_id")), "r")
        val rxy = graft.operators.ScaleOps.globalRowNumber(rx,
          Seq(col("y"), col("user_id")), "s2")
          .select(col("user_id"), col("r"), col("s2"))
          .localCheckpoint(eager = false)
        val q = rxy.select(col("user_id"), col("r"), col("s2"))
          .join(rxy.select(col("r").as("rj"), col("s2").as("sj")),
            col("rj") < col("r") && col("sj") < col("s2"), "left")
          .groupBy(col("user_id"), col("r"), col("s2"))
          .agg(sum(when(col("rj").isNotNull, 1L).otherwise(0L)).as("qi"))
        val agg = q.agg(count(lit(1)).as("n"),
          sum(col("qi") * (col("qi") - 1)).as("d1"),
          sum((col("r") - 1) * (col("r") - 2) * (col("s2") - 1) *
            (col("s2") - 2)).as("d2"),
          sum((col("r") - 2) * (col("s2") - 2) * col("qi")).as("d3"))
        agg.select(col("n"), col("d1"), col("d2"), col("d3"),
          when(col("n") > 4, round(lit(30.0) *
            ((col("n") - 2).cast("double") * (col("n") - 3).cast("double") *
              col("d1").cast("double") + col("d2").cast("double") -
              lit(2.0) * (col("n") - 2).cast("double") *
                col("d3").cast("double")) /
            (col("n").cast("double") * (col("n") - 1).cast("double") *
              (col("n") - 2).cast("double") * (col("n") - 3).cast("double") *
              (col("n") - 4).cast("double")), 9)).as("hoeffding_d"))
      },
      oracle = Some("""
        WITH users AS (
          SELECT user_id, CAST(COUNT(*) AS BIGINT) AS x,
                 SUM(CAST(COALESCE(value, 0) AS DECIMAL(18,2))) AS y
          FROM events WHERE user_id % 11 = 0 GROUP BY 1),
        rx AS (
          SELECT user_id, y,
                 CAST(ROW_NUMBER() OVER (ORDER BY x, user_id) AS BIGINT)
                   AS r
          FROM users),
        rxy AS MATERIALIZED (
          SELECT user_id, r,
                 CAST(ROW_NUMBER() OVER (ORDER BY y, user_id) AS BIGINT)
                   AS s2
          FROM rx),
        q AS (
          SELECT a.user_id, a.r, a.s2,
                 CAST(SUM(CASE WHEN b.r IS NOT NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS qi
          FROM rxy a LEFT JOIN rxy b ON b.r < a.r AND b.s2 < a.s2
          GROUP BY 1, 2, 3),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(qi * (qi - 1)) AS BIGINT) AS d1,
                 CAST(SUM((r - 1) * (r - 2) * (s2 - 1) * (s2 - 2))
                   AS BIGINT) AS d2,
                 CAST(SUM((r - 2) * (s2 - 2) * qi) AS BIGINT) AS d3
          FROM q)
        SELECT n, d1, d2, d3,
               CASE WHEN n > 4 THEN
                 ROUND(CAST(30 AS DOUBLE) *
                   (CAST(n - 2 AS DOUBLE) * CAST(n - 3 AS DOUBLE) *
                     CAST(d1 AS DOUBLE) + CAST(d2 AS DOUBLE) -
                     CAST(2 AS DOUBLE) * CAST(n - 2 AS DOUBLE) *
                       CAST(d3 AS DOUBLE)) /
                   (CAST(n AS DOUBLE) * CAST(n - 1 AS DOUBLE) *
                     CAST(n - 2 AS DOUBLE) * CAST(n - 3 AS DOUBLE) *
                     CAST(n - 4 AS DOUBLE)), 9) + CAST(0 AS DOUBLE)
               END AS hoeffding_d
        FROM agg""")),

    // Lin's concordance correlation coefficient between the order-dated
    // and ship-dated daily volume instruments: CCC = 2·sxy /
    // (sx² + sy² + (x̄-ȳ)²) — agreement with the 45° IDENTITY line,
    // decomposed into precision (Pearson r) and accuracy (the bias
    // factor C_b). qd9's Bland-Altman bounds the differences and Deming
    // fits the best line; CCC is the single calibrated-agreement score
    // a method-transfer report leads with. Same exact-DECIMAL daily
    // series; the mean-gap square multiplies 9-grid values at round 9
    // (safe per rule 15's closing note).
    "qdy_lins_ccc" -> Q(
      fn = (s, dir) => {
        val a = dailyRevenueM(s, dir)
        val b = t(s, dir, "lineitem")
          .groupBy(expr("unix_millis(CAST(l_shipdate AS TIMESTAMP))" +
            " div 86400000").as("day"))
          .agg((sum(col("l_extendedprice").cast("decimal(12,2)") *
            (lit(1).cast("decimal(4,2)") -
              col("l_discount").cast("decimal(4,2)")) *
            (lit(1).cast("decimal(4,2)") +
              col("l_tax").cast("decimal(4,2)"))) / lit(1000000))
            .cast("decimal(24,12)").as("yb"))
        val j = a.join(b, Seq("day"))
          .select(col("ym").as("ya"), col("yb"))
          .localCheckpoint(eager = false)
        val st = j.agg(count(lit(1)).as("n"), sum(col("ya")).as("sya"),
          sum(col("yb")).as("syb"))
          .select(col("n"),
            round(col("sya").cast("double") / col("n").cast("double"), 9)
              .as("mx"),
            round(col("syb").cast("double") / col("n").cast("double"), 9)
              .as("my"))
        val mom = j.crossJoin(broadcast(st))
          .select(col("n"), col("mx"), col("my"),
            (col("ya").cast("double") - col("mx")).as("cx"),
            (col("yb").cast("double") - col("my")).as("cy"))
          .agg(first(col("n")).as("n"), first(col("mx")).as("mx"),
            first(col("my")).as("my"),
            sum(round(col("cx") * col("cx"), 6).cast("decimal(28,6)"))
              .as("sxx"),
            sum(round(col("cy") * col("cy"), 6).cast("decimal(28,6)"))
              .as("syy"),
            sum(round(col("cx") * col("cy"), 6).cast("decimal(28,6)"))
              .as("sxy"))
        mom.select(col("n"),
          round(col("sxy").cast("double") /
            (sqrt(col("sxx").cast("double")) *
              sqrt(col("syy").cast("double"))), 6).as("pearson_r"),
          round(lit(2.0) * col("sxy").cast("double") /
            (col("sxx").cast("double") + col("syy").cast("double") +
              col("n").cast("double") *
                round((col("mx") - col("my")) * (col("mx") - col("my")),
                  9)), 6).as("ccc"),
          round((lit(2.0) * col("sxy").cast("double") /
            (col("sxx").cast("double") + col("syy").cast("double") +
              col("n").cast("double") *
                round((col("mx") - col("my")) * (col("mx") - col("my")),
                  9))) /
            (col("sxy").cast("double") /
              (sqrt(col("sxx").cast("double")) *
                sqrt(col("syy").cast("double")))), 6).as("c_b"))
      },
      oracle = Some(s"""
        WITH a AS ($dailyRevenueMSql),
        b AS (
          SELECT CAST(epoch_ms(l_shipdate) // 86400000 AS BIGINT) AS day,
                 CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
                   (CAST(1 AS DECIMAL(4,2)) -
                     CAST(l_discount AS DECIMAL(4,2))) *
                   (CAST(1 AS DECIMAL(4,2)) +
                     CAST(l_tax AS DECIMAL(4,2)))) / 1000000
                   AS DECIMAL(24,12)) AS yb
          FROM lineitem GROUP BY 1),
        j AS MATERIALIZED (
          SELECT a.ym AS ya, b.yb FROM a JOIN b USING (day)),
        st AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 ROUND(CAST(SUM(ya) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
                   AS mx,
                 ROUND(CAST(SUM(yb) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
                   AS my
          FROM j),
        mom AS (
          SELECT MAX(st.n) AS n, MAX(st.mx) AS mx, MAX(st.my) AS my,
                 CAST(SUM(CAST(ROUND((CAST(ya AS DOUBLE) - st.mx) *
                   (CAST(ya AS DOUBLE) - st.mx), 6) AS DECIMAL(28,6)))
                   AS DOUBLE) AS sxx,
                 CAST(SUM(CAST(ROUND((CAST(yb AS DOUBLE) - st.my) *
                   (CAST(yb AS DOUBLE) - st.my), 6) AS DECIMAL(28,6)))
                   AS DOUBLE) AS syy,
                 CAST(SUM(CAST(ROUND((CAST(ya AS DOUBLE) - st.mx) *
                   (CAST(yb AS DOUBLE) - st.my), 6) AS DECIMAL(28,6)))
                   AS DOUBLE) AS sxy
          FROM j CROSS JOIN st)
        SELECT n,
               ROUND(sxy / (sqrt(sxx) * sqrt(syy)), 6)
                 + CAST(0 AS DOUBLE) AS pearson_r,
               ROUND(CAST(2 AS DOUBLE) * sxy /
                 (sxx + syy + CAST(n AS DOUBLE) *
                   ROUND((mx - my) * (mx - my), 9)), 6)
                 + CAST(0 AS DOUBLE) AS ccc,
               ROUND((CAST(2 AS DOUBLE) * sxy /
                 (sxx + syy + CAST(n AS DOUBLE) *
                   ROUND((mx - my) * (mx - my), 9))) /
                 (sxy / (sqrt(sxx) * sqrt(syy))), 6)
                 + CAST(0 AS DOUBLE) AS c_b
        FROM mom""")),

    // Information-criterion model-selection card for the daily revenue
    // series: mean-only, linear-trend (qcw's fit) and week-phase-means
    // models compared by SSE, adjusted R², AIC = n·ln(SSE/n) + 2k and
    // BIC — the "which structure does the data earn?" table that the
    // individual fits (q6q trend, q7p seasonality) each assume an
    // answer to. Every SSE lands on the established 9-grid recipes
    // (trend via Syy - Sxy²/Sxx, phase model via per-group moments);
    // ln is the only float link.
    "qdz_model_selection" -> Q(
      fn = (s, dir) => {
        val ranked = graft.operators.ScaleOps.globalRowNumber(
          dailyRevenueM(s, dir), Seq(col("day")), "rn")
          .localCheckpoint(eager = false)
        val st = ranked.agg(count(lit(1)).as("n"), sum(col("ym")).as("sy"))
          .select(col("n"),
            round(col("sy").cast("double") / col("n").cast("double"), 9)
              .as("mu"),
            ((col("n") + 1).cast("double") / lit(2.0)).as("xbar"))
        val cen = ranked.crossJoin(broadcast(st))
          .select(col("rn"), col("day"), col("n"),
            (col("ym").cast("double") - col("mu")).as("c"),
            (col("rn").cast("double") - col("xbar")).as("dx"))
          .localCheckpoint(eager = false)
        val sse0d = cen.agg(
          sum(round(col("c") * col("c"), 6).cast("decimal(28,6)"))
            .as("syyd"),
          sum(round(col("dx") * col("dx"), 6).cast("decimal(28,6)"))
            .as("sxxd"),
          sum(round(col("dx") * col("c"), 6).cast("decimal(28,6)"))
            .as("sxyd"))
          .select(col("syyd").cast("double").as("sse0"),
            round(col("syyd").cast("double") -
              round(col("sxyd").cast("double") * col("sxyd").cast("double") /
                col("sxxd").cast("double"), 9), 9).as("sse1"))
        val phases = cen.select(pmod(col("day"), lit(7L)).as("ph"), col("c"))
          .groupBy(col("ph"))
          .agg(count(lit(1)).as("np"),
            sum(col("c").cast("decimal(20,9)")).as("scd"),
            sum(round(col("c") * col("c"), 6).cast("decimal(28,6)"))
              .as("sccd"))
          .select(
            round(col("sccd").cast("double") -
              round(col("scd").cast("double") * col("scd").cast("double") /
                col("np").cast("double"), 9), 9).as("ssw_p"))
          .agg(sum(col("ssw_p").cast("decimal(28,9)")).as("sse2d"))
          .select(col("sse2d").cast("double").as("sse2"))
        val models = st.select(col("n")).crossJoin(broadcast(sse0d))
          .crossJoin(broadcast(phases))
          .select(col("n"),
            explode(array(
              struct(lit("m0_mean").as("model"), lit(1L).as("k"),
                col("sse0").as("sse")),
              struct(lit("m1_trend").as("model"), lit(2L).as("k"),
                col("sse1").as("sse")),
              struct(lit("m2_phase").as("model"), lit(7L).as("k"),
                col("sse2").as("sse")))).as("m"),
            col("sse0"))
          .select(col("n"), col("m.model").as("model"), col("m.k").as("k"),
            col("m.sse").as("sse"), col("sse0"))
        models.select(col("model"), col("n"), col("k"),
          round(col("sse"), 6).as("sse"),
          round(lit(1.0) -
            (col("sse") / (col("n") - col("k")).cast("double")) /
            (col("sse0") / (col("n") - 1).cast("double")), 6).as("r2_adj"),
          round(col("n").cast("double") *
            log(col("sse") / col("n").cast("double")) +
            lit(2.0) * col("k").cast("double"), 6).as("aic"),
          round(col("n").cast("double") *
            log(col("sse") / col("n").cast("double")) +
            col("k").cast("double") * log(col("n").cast("double")), 6)
            .as("bic"))
          .orderBy(col("model"))
      },
      oracle = Some(s"""
        WITH daily AS ($dailyRevenueMSql),
        r AS (SELECT day, ym, ROW_NUMBER() OVER (ORDER BY day) AS rn
              FROM daily),
        st AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 ROUND(CAST(SUM(ym) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
                   AS mu,
                 CAST(COUNT(*) + 1 AS DOUBLE) / CAST(2 AS DOUBLE) AS xbar
          FROM r),
        cen AS MATERIALIZED (
          SELECT rn, day, st.n, CAST(ym AS DOUBLE) - st.mu AS c,
                 CAST(rn AS DOUBLE) - st.xbar AS dx
          FROM r CROSS JOIN st),
        sse01 AS (
          SELECT CAST(SUM(CAST(ROUND(c * c, 6) AS DECIMAL(28,6)))
                   AS DOUBLE) AS sse0,
                 ROUND(CAST(SUM(CAST(ROUND(c * c, 6) AS DECIMAL(28,6)))
                     AS DOUBLE) -
                   ROUND(CAST(SUM(CAST(ROUND(dx * c, 6) AS DECIMAL(28,6)))
                       AS DOUBLE) *
                     CAST(SUM(CAST(ROUND(dx * c, 6) AS DECIMAL(28,6)))
                       AS DOUBLE) /
                     CAST(SUM(CAST(ROUND(dx * dx, 6) AS DECIMAL(28,6)))
                       AS DOUBLE), 9), 9) AS sse1
          FROM cen),
        phases AS (
          SELECT CAST(SUM(CAST(ssw_p AS DECIMAL(28,9))) AS DOUBLE) AS sse2
          FROM (
            SELECT ROUND(CAST(SUM(CAST(ROUND(c * c, 6) AS DECIMAL(28,6)))
                     AS DOUBLE) -
                   ROUND(CAST(SUM(CAST(c AS DECIMAL(20,9))) AS DOUBLE) *
                     CAST(SUM(CAST(c AS DECIMAL(20,9))) AS DOUBLE) /
                     CAST(COUNT(*) AS DOUBLE), 9), 9) AS ssw_p
            FROM cen GROUP BY day % 7)),
        models AS (
          SELECT st.n, m.model, m.k,
                 CASE m.model WHEN 'm0_mean' THEN sse0
                              WHEN 'm1_trend' THEN sse1
                              ELSE sse2 END AS sse,
                 sse0
          FROM st CROSS JOIN sse01 CROSS JOIN phases
          CROSS JOIN (VALUES ('m0_mean', CAST(1 AS BIGINT)),
                             ('m1_trend', CAST(2 AS BIGINT)),
                             ('m2_phase', CAST(7 AS BIGINT)))
            AS m(model, k))
        SELECT model, n, k,
               ROUND(sse, 6) + CAST(0 AS DOUBLE) AS sse,
               ROUND(CAST(1 AS DOUBLE) -
                 (sse / CAST(n - k AS DOUBLE)) /
                 (sse0 / CAST(n - 1 AS DOUBLE)), 6) + CAST(0 AS DOUBLE)
                 AS r2_adj,
               ROUND(CAST(n AS DOUBLE) * ln(sse / CAST(n AS DOUBLE)) +
                 CAST(2 AS DOUBLE) * CAST(k AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS aic,
               ROUND(CAST(n AS DOUBLE) * ln(sse / CAST(n AS DOUBLE)) +
                 CAST(k AS DOUBLE) * ln(CAST(n AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS bic
        FROM models ORDER BY model""")),

    // Cucconi joint location-scale test between purchase and click
    // values: U from the squared pooled ranks, V from the squared
    // contra-ranks, combined through their exact correlation ρ =
    // 2(N²-4)/((2N+1)(8N+11)) - 1 — the single-statistic alternative to
    // running q7o (location) and qdm (scale) separately, older than and
    // competitive with Lepage. ΣR² and ΣR'² are exact BIGINTs off the
    // tiebroken pooled ranking; everything else is one rational + sqrt.
    "qe0_cucconi_test" -> Q(
      fn = (s, dir) => {
        val e = t(s, dir, "events")
          .filter(col("event_type").isin("purchase", "click") &&
            col("value").isNotNull)
          .select(col("value").cast("decimal(18,2)").as("v"),
            when(col("event_type") === "purchase", 1L).otherwise(0L)
              .as("g"), col("event_id"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(e,
          Seq(col("v"), col("g"), col("event_id")), "r")
        val both = ranked.crossJoin(broadcast(
          ranked.agg(count(lit(1)).as("nn"))))
          .select(col("g"), col("r"), col("nn"))
          .agg(first(col("nn")).as("nn"),
            sum(col("g")).as("n1"),
            sum(when(col("g") === 1, col("r") * col("r")).otherwise(0L))
              .as("sr2"),
            sum(when(col("g") === 1,
              (col("nn") + 1 - col("r")) * (col("nn") + 1 - col("r")))
              .otherwise(0L)).as("sc2"))
        both.select(col("nn"), col("n1"), (col("nn") - col("n1")).as("n2"),
          col("sr2"), col("sc2"))
          .select(col("n1"), col("n2"), col("nn"),
            round((lit(6.0) * col("sr2").cast("double") -
              col("n1").cast("double") * (col("nn") + 1).cast("double") *
                (lit(2L) * col("nn") + 1).cast("double")) /
              sqrt(col("n1").cast("double") * col("n2").cast("double") *
                (col("nn") + 1).cast("double") *
                (lit(2L) * col("nn") + 1).cast("double") *
                (lit(8L) * col("nn") + 11).cast("double") / lit(5.0)), 9)
              .as("u"),
            round((lit(6.0) * col("sc2").cast("double") -
              col("n1").cast("double") * (col("nn") + 1).cast("double") *
                (lit(2L) * col("nn") + 1).cast("double")) /
              sqrt(col("n1").cast("double") * col("n2").cast("double") *
                (col("nn") + 1).cast("double") *
                (lit(2L) * col("nn") + 1).cast("double") *
                (lit(8L) * col("nn") + 11).cast("double") / lit(5.0)), 9)
              .as("vv"),
            round(lit(2.0) *
              (col("nn").cast("double") * col("nn").cast("double") -
                lit(4.0)) /
              ((lit(2L) * col("nn") + 1).cast("double") *
                (lit(8L) * col("nn") + 11).cast("double")) - lit(1.0), 9)
              .as("rho"))
          .select(col("n1"), col("n2"),
            round(col("u"), 6).as("u_stat"),
            round(col("vv"), 6).as("v_stat"),
            round((col("u") * col("u") + col("vv") * col("vv") -
              lit(2.0) * col("rho") * col("u") * col("vv")) /
              (lit(2.0) * (lit(1.0) - col("rho") * col("rho"))), 6)
              .as("cucconi_c"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT CAST(value AS DECIMAL(18,2)) AS v,
                 CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g,
                 event_id
          FROM events
          WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL),
        ranked AS MATERIALIZED (
          SELECT g, CAST(ROW_NUMBER() OVER (ORDER BY v, g, event_id)
            AS BIGINT) AS r
          FROM e),
        n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM ranked),
        bt AS (
          SELECT MAX(n0.nn) AS nn,
                 CAST(SUM(g) AS BIGINT) AS n1,
                 CAST(SUM(CASE WHEN g = 1 THEN r * r ELSE 0 END)
                   AS BIGINT) AS sr2,
                 CAST(SUM(CASE WHEN g = 1 THEN
                   (n0.nn + 1 - r) * (n0.nn + 1 - r) ELSE 0 END)
                   AS BIGINT) AS sc2
          FROM ranked CROSS JOIN n0),
        pre AS (
          SELECT n1, nn - n1 AS n2, nn, sr2, sc2,
                 ROUND((CAST(6 AS DOUBLE) * CAST(sr2 AS DOUBLE) -
                   CAST(n1 AS DOUBLE) * CAST(nn + 1 AS DOUBLE) *
                     CAST(2 * nn + 1 AS DOUBLE)) /
                   sqrt(CAST(n1 AS DOUBLE) * CAST(nn - n1 AS DOUBLE) *
                     CAST(nn + 1 AS DOUBLE) * CAST(2 * nn + 1 AS DOUBLE) *
                     CAST(8 * nn + 11 AS DOUBLE) / CAST(5 AS DOUBLE)), 9)
                   AS u,
                 ROUND((CAST(6 AS DOUBLE) * CAST(sc2 AS DOUBLE) -
                   CAST(n1 AS DOUBLE) * CAST(nn + 1 AS DOUBLE) *
                     CAST(2 * nn + 1 AS DOUBLE)) /
                   sqrt(CAST(n1 AS DOUBLE) * CAST(nn - n1 AS DOUBLE) *
                     CAST(nn + 1 AS DOUBLE) * CAST(2 * nn + 1 AS DOUBLE) *
                     CAST(8 * nn + 11 AS DOUBLE) / CAST(5 AS DOUBLE)), 9)
                   AS vv,
                 ROUND(CAST(2 AS DOUBLE) *
                   (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE) -
                     CAST(4 AS DOUBLE)) /
                   (CAST(2 * nn + 1 AS DOUBLE) *
                     CAST(8 * nn + 11 AS DOUBLE)) - CAST(1 AS DOUBLE), 9)
                   AS rho
          FROM bt)
        SELECT n1, n2,
               ROUND(u, 6) + CAST(0 AS DOUBLE) AS u_stat,
               ROUND(vv, 6) + CAST(0 AS DOUBLE) AS v_stat,
               ROUND((u * u + vv * vv -
                 CAST(2 AS DOUBLE) * rho * u * vv) /
                 (CAST(2 AS DOUBLE) * (CAST(1 AS DOUBLE) - rho * rho)), 6)
                 + CAST(0 AS DOUBLE) AS cucconi_c
        FROM pre""")),

    // Categorical effect-size card for the event-type × week-phase
    // table: Cramér's V, the contingency coefficient C, Tschuprow's T,
    // Goodman-Kruskal λ (proportional-reduction-in-error predicting the
    // phase from the type — a pure integer argmax statistic) and
    // Theil's uncertainty coefficient U(Y|X) — the "HOW BIG is the
    // association" companions to q6s/qdb, which only say whether it
    // exists. χ² terms and entropies ride 9-snapped DECIMAL sums; λ is
    // exact integer arithmetic end to end.
    "qe1_categorical_effects" -> Q(
      fn = (s, dir) => {
        val cells = t(s, dir, "events")
          .select(col("event_type").as("x"),
            pmod((unix_millis(col("ts")) / lit(86400000L)).cast("long"),
              lit(7L)).as("y"))
          .groupBy(col("x"), col("y"))
          .agg(count(lit(1)).as("nij"))
          .localCheckpoint(eager = false)
        val rows = cells.groupBy(col("x")).agg(sum(col("nij")).as("ri"),
          max(col("nij")).as("rowmax"))
        val colsM = cells.groupBy(col("y")).agg(sum(col("nij")).as("cj"))
        val tot = cells.agg(sum(col("nij")).as("nn"),
          countDistinct(col("x")).as("r"),
          countDistinct(col("y")).as("c"))
        val chi = cells.join(rows.select(col("x"), col("ri")), Seq("x"))
          .join(colsM, Seq("y")).crossJoin(broadcast(tot))
          .select(col("nij"), col("nn"), col("r"), col("c"),
            (col("ri").cast("double") * col("cj").cast("double") /
              col("nn").cast("double")).as("eij"))
          .agg(first(col("nn")).as("nn"), first(col("r")).as("r"),
            first(col("c")).as("c"),
            sum(round((col("nij").cast("double") - col("eij")) *
              (col("nij").cast("double") - col("eij")) / col("eij"), 9)
              .cast("decimal(18,9)")).as("x2d"))
          .select(col("nn"), col("r"), col("c"),
            col("x2d").cast("double").as("x2"))
        val lam = rows.agg(sum(col("rowmax")).as("smax"))
          .crossJoin(broadcast(colsM.agg(max(col("cj")).as("cmax"))))
        val hx = rows.crossJoin(broadcast(tot.select(col("nn"))))
          .agg(sum(round(
            (col("ri").cast("double") / col("nn").cast("double")) *
              log(col("ri").cast("double") / col("nn").cast("double")), 9)
            .cast("decimal(18,9)")).as("hxd"))
        val hy = colsM.crossJoin(broadcast(tot.select(col("nn").as("nn2"))))
          .agg(sum(round(
            (col("cj").cast("double") / col("nn2").cast("double")) *
              log(col("cj").cast("double") / col("nn2").cast("double")), 9)
            .cast("decimal(18,9)")).as("hyd"))
        val hxy = cells.crossJoin(broadcast(tot.select(col("nn").as("nn3"))))
          .agg(sum(round(
            (col("nij").cast("double") / col("nn3").cast("double")) *
              log(col("nij").cast("double") / col("nn3").cast("double")), 9)
            .cast("decimal(18,9)")).as("hxyd"))
        chi.crossJoin(broadcast(lam)).crossJoin(broadcast(hx))
          .crossJoin(broadcast(hy)).crossJoin(broadcast(hxy))
          .select(col("nn").as("n"),
            round(sqrt(col("x2") / (col("nn").cast("double") *
              least(col("r") - 1, col("c") - 1).cast("double"))), 6)
              .as("cramers_v"),
            round(sqrt(col("x2") / (col("x2") + col("nn").cast("double"))),
              6).as("contingency_c"),
            round(sqrt(col("x2") / (col("nn").cast("double") *
              sqrt(((col("r") - 1) * (col("c") - 1)).cast("double")))), 6)
              .as("tschuprow_t"),
            round((col("smax") - col("cmax")).cast("double") /
              (col("nn") - col("cmax")).cast("double"), 6)
              .as("gk_lambda"),
            round((col("hyd").cast("double") - (col("hxyd").cast("double") -
              col("hxd").cast("double"))) / col("hyd").cast("double"), 6)
              .as("theil_u"))
      },
      oracle = Some("""
        WITH cells AS MATERIALIZED (
          SELECT event_type AS x,
                 (CAST(epoch_ms(ts) // 86400000 AS BIGINT) % 7) AS y,
                 CAST(COUNT(*) AS BIGINT) AS nij
          FROM events GROUP BY 1, 2),
        rows_m AS (
          SELECT x, CAST(SUM(nij) AS BIGINT) AS ri,
                 CAST(MAX(nij) AS BIGINT) AS rowmax
          FROM cells GROUP BY 1),
        cols_m AS (
          SELECT y, CAST(SUM(nij) AS BIGINT) AS cj FROM cells GROUP BY 1),
        tot AS (
          SELECT CAST(SUM(nij) AS BIGINT) AS nn,
                 CAST(COUNT(DISTINCT x) AS BIGINT) AS r,
                 CAST(COUNT(DISTINCT y) AS BIGINT) AS c
          FROM cells),
        chi AS (
          SELECT MAX(tot.nn) AS nn, MAX(tot.r) AS r, MAX(tot.c) AS c,
                 CAST(SUM(CAST(ROUND(
                   (CAST(nij AS DOUBLE) - CAST(ri AS DOUBLE) *
                     CAST(cj AS DOUBLE) / CAST(tot.nn AS DOUBLE)) *
                   (CAST(nij AS DOUBLE) - CAST(ri AS DOUBLE) *
                     CAST(cj AS DOUBLE) / CAST(tot.nn AS DOUBLE)) /
                   (CAST(ri AS DOUBLE) * CAST(cj AS DOUBLE) /
                     CAST(tot.nn AS DOUBLE)), 9) AS DECIMAL(18,9)))
                   AS DOUBLE) AS x2
          FROM cells JOIN rows_m USING (x) JOIN cols_m USING (y)
          CROSS JOIN tot),
        lam AS (
          SELECT (SELECT CAST(SUM(rowmax) AS BIGINT) FROM rows_m) AS smax,
                 (SELECT CAST(MAX(cj) AS BIGINT) FROM cols_m) AS cmax),
        hx AS (
          SELECT CAST(SUM(CAST(ROUND(
                   (CAST(ri AS DOUBLE) / CAST(tot.nn AS DOUBLE)) *
                   ln(CAST(ri AS DOUBLE) / CAST(tot.nn AS DOUBLE)), 9)
                   AS DECIMAL(18,9))) AS DOUBLE) AS hxd
          FROM rows_m CROSS JOIN tot),
        hy AS (
          SELECT CAST(SUM(CAST(ROUND(
                   (CAST(cj AS DOUBLE) / CAST(tot.nn AS DOUBLE)) *
                   ln(CAST(cj AS DOUBLE) / CAST(tot.nn AS DOUBLE)), 9)
                   AS DECIMAL(18,9))) AS DOUBLE) AS hyd
          FROM cols_m CROSS JOIN tot),
        hxy AS (
          SELECT CAST(SUM(CAST(ROUND(
                   (CAST(nij AS DOUBLE) / CAST(tot.nn AS DOUBLE)) *
                   ln(CAST(nij AS DOUBLE) / CAST(tot.nn AS DOUBLE)), 9)
                   AS DECIMAL(18,9))) AS DOUBLE) AS hxyd
          FROM cells CROSS JOIN tot)
        SELECT nn AS n,
               ROUND(sqrt(x2 / (CAST(nn AS DOUBLE) *
                 CAST(LEAST(r - 1, c - 1) AS DOUBLE))), 6)
                 + CAST(0 AS DOUBLE) AS cramers_v,
               ROUND(sqrt(x2 / (x2 + CAST(nn AS DOUBLE))), 6)
                 + CAST(0 AS DOUBLE) AS contingency_c,
               ROUND(sqrt(x2 / (CAST(nn AS DOUBLE) *
                 sqrt(CAST((r - 1) * (c - 1) AS DOUBLE)))), 6)
                 + CAST(0 AS DOUBLE) AS tschuprow_t,
               ROUND(CAST(smax - cmax AS DOUBLE) /
                 CAST(nn - cmax AS DOUBLE), 6) + CAST(0 AS DOUBLE)
                 AS gk_lambda,
               ROUND((hyd - (hxyd - hxd)) / hyd, 6) + CAST(0 AS DOUBLE)
                 AS theil_u
        FROM chi CROSS JOIN lam CROSS JOIN hx CROSS JOIN hy
        CROSS JOIN hxy""")),

    // Jonckheere-Terpstra test for an ORDERED alternative: does order
    // value trend monotonically across the priority levels 1-URGENT →
    // 5-LOW? qbn's ANOVA and qbo's Kruskal-Wallis test "any difference";
    // JT spends its power on the ordering and qbp's Cochran-Armitage
    // only handles binary outcomes. Doubled statistic 2·JT = Σ_{g<h}
    // (2·strict + ties) stays in exact integers over the per-(group,
    // value) count table of a deterministically thinned order panel
    // (the pair join is quadratic in distinct values — the qa8
    // discipline); the tie-free normal approximation is noted.
    "qe2_jonckheere_terpstra" -> Q(
      fn = (s, dir) => {
        val cnts = t(s, dir, "orders")
          .filter(col("o_orderkey") % 7 === 0)
          .groupBy(col("o_orderpriority").as("g"),
            col("o_totalprice").cast("decimal(18,2)").as("v"))
          .agg(count(lit(1)).as("c"))
          .localCheckpoint(eager = false)
        val jt = cnts.select(col("g").as("ga"), col("v").as("va"),
          col("c").as("ca"))
          .join(cnts.select(col("g").as("gb"), col("v").as("vb"),
            col("c").as("cb")),
            col("ga") < col("gb") && col("va") <= col("vb"))
          .agg(sum(when(col("va") < col("vb"),
            lit(2L) * col("ca") * col("cb"))
            .otherwise(col("ca") * col("cb"))).as("jt2"))
        val sizes = cnts.groupBy(col("g")).agg(sum(col("c")).as("ng"))
          .agg(sum(col("ng")).as("nn"), sum(col("ng") * col("ng")).as("sn2"),
            sum(col("ng") * col("ng") * (lit(2L) * col("ng") + 3))
              .as("sn23"))
        jt.crossJoin(broadcast(sizes))
          .select(col("nn").as("n"), col("jt2"),
            round((col("jt2").cast("double") / lit(2.0) -
              (col("nn") * col("nn") - col("sn2")).cast("double") /
                lit(4.0)) /
              sqrt((col("nn").cast("double") * col("nn").cast("double") *
                (lit(2L) * col("nn") + 3).cast("double") -
                col("sn23").cast("double")) / lit(72.0)), 6).as("jt_z"))
      },
      oracle = Some("""
        WITH cnts AS MATERIALIZED (
          SELECT o_orderpriority AS g,
                 CAST(o_totalprice AS DECIMAL(18,2)) AS v,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM orders WHERE o_orderkey % 7 = 0 GROUP BY 1, 2),
        jt AS (
          SELECT CAST(SUM(CASE WHEN a.v < b.v
                   THEN 2 * a.c * b.c ELSE a.c * b.c END) AS BIGINT)
                   AS jt2
          FROM cnts a JOIN cnts b ON a.g < b.g AND a.v <= b.v),
        sizes AS (
          SELECT CAST(SUM(ng) AS BIGINT) AS nn,
                 CAST(SUM(ng * ng) AS BIGINT) AS sn2,
                 CAST(SUM(ng * ng * (2 * ng + 3)) AS BIGINT) AS sn23
          FROM (SELECT g, CAST(SUM(c) AS BIGINT) AS ng
                FROM cnts GROUP BY 1))
        SELECT nn AS n, jt2,
               ROUND((CAST(jt2 AS DOUBLE) / CAST(2 AS DOUBLE) -
                 CAST(nn * nn - sn2 AS DOUBLE) / CAST(4 AS DOUBLE)) /
                 sqrt((CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE) *
                   CAST(2 * nn + 3 AS DOUBLE) -
                   CAST(sn23 AS DOUBLE)) / CAST(72 AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS jt_z
        FROM jt CROSS JOIN sizes""")),

    // TOST equivalence test of weekend vs weekday purchase RATES: two
    // one-sided z tests against a ±0.01 absolute margin — the question
    // q7c's difference test cannot answer ("absence of evidence" is not
    // "evidence of absence"; TOST rejects non-equivalence). Rates and
    // the unpooled standard error are raw ratios of exact BIGINTs; the
    // verdict compares identically-computed doubles against 1.645 in
    // both engines.
    "qe3_tost_equivalence" -> Q(
      fn = (s, dir) => {
        val e = t(s, dir, "events")
          .select((unix_millis(col("ts")) / lit(86400000L)).cast("long")
            .as("day"), col("event_type"))
        val rel = e.crossJoin(broadcast(e.agg(min(col("day")).as("d0"))))
          .select((pmod(col("day") - col("d0"), lit(7L)) >= 5).as("wknd"),
            (col("event_type") === "purchase").as("pur"))
        val agg = rel.groupBy(col("wknd"))
          .agg(count(lit(1)).as("nt"), sum(when(col("pur"), 1L)
            .otherwise(0L)).as("np"))
        val wide = agg.groupBy()
          .agg(max(when(col("wknd"), col("nt"))).as("n1"),
            max(when(col("wknd"), col("np"))).as("x1"),
            max(when(!col("wknd"), col("nt"))).as("n2"),
            max(when(!col("wknd"), col("np"))).as("x2"))
        val pre = wide.select(col("n1"), col("n2"),
          (col("x1").cast("double") / col("n1").cast("double")).as("p1"),
          (col("x2").cast("double") / col("n2").cast("double")).as("p2"))
          .withColumn("se", sqrt(
            col("p1") * (lit(1.0) - col("p1")) / col("n1").cast("double") +
            col("p2") * (lit(1.0) - col("p2")) / col("n2").cast("double")))
          .withColumn("z_lower",
            (col("p1") - col("p2") + lit(0.01)) / col("se"))
          .withColumn("z_upper",
            (lit(0.01) - (col("p1") - col("p2"))) / col("se"))
        pre.select(col("n1"), col("n2"),
          round(col("p1"), 6).as("p_wknd"),
          round(col("p2"), 6).as("p_wkdy"),
          round(col("p1") - col("p2"), 6).as("diff"),
          round(col("z_lower"), 6).as("z_lower"),
          round(col("z_upper"), 6).as("z_upper"),
          when(least(col("z_lower"), col("z_upper")) > 1.645, lit("yes"))
            .otherwise(lit("no")).as("equivalent_90"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
                 event_type
          FROM events),
        d0 AS (SELECT MIN(day) AS d0 FROM e),
        rel AS (
          SELECT ((day - d0.d0) % 7) >= 5 AS wknd,
                 event_type = 'purchase' AS pur
          FROM e CROSS JOIN d0),
        agg AS (
          SELECT wknd, CAST(COUNT(*) AS BIGINT) AS nt,
                 CAST(SUM(CASE WHEN pur THEN 1 ELSE 0 END) AS BIGINT)
                   AS np
          FROM rel GROUP BY 1),
        wide AS (
          SELECT MAX(CASE WHEN wknd THEN nt END) AS n1,
                 MAX(CASE WHEN wknd THEN np END) AS x1,
                 MAX(CASE WHEN NOT wknd THEN nt END) AS n2,
                 MAX(CASE WHEN NOT wknd THEN np END) AS x2
          FROM agg),
        pre AS (
          SELECT n1, n2,
                 CAST(x1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
                 CAST(x2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS p2
          FROM wide),
        pre2 AS (
          SELECT *,
                 sqrt(p1 * (CAST(1 AS DOUBLE) - p1) / CAST(n1 AS DOUBLE) +
                   p2 * (CAST(1 AS DOUBLE) - p2) / CAST(n2 AS DOUBLE))
                   AS se
          FROM pre),
        pre3 AS (
          SELECT *,
                 (p1 - p2 + CAST(0.01 AS DOUBLE)) / se AS z_lower,
                 (CAST(0.01 AS DOUBLE) - (p1 - p2)) / se AS z_upper
          FROM pre2)
        SELECT n1, n2,
               ROUND(p1, 6) + CAST(0 AS DOUBLE) AS p_wknd,
               ROUND(p2, 6) + CAST(0 AS DOUBLE) AS p_wkdy,
               ROUND(p1 - p2, 6) + CAST(0 AS DOUBLE) AS diff,
               ROUND(z_lower, 6) + CAST(0 AS DOUBLE) AS z_lower,
               ROUND(z_upper, 6) + CAST(0 AS DOUBLE) AS z_upper,
               CASE WHEN LEAST(z_lower, z_upper) > CAST(1.645 AS DOUBLE)
                 THEN 'yes' ELSE 'no' END AS equivalent_90
        FROM pre3""")),

    // Standardized effect sizes for the purchase-vs-click value gap:
    // Cohen's d (pooled), Hedges' g (the exact small-sample correction
    // 1 - 3/(4·df - 1)), Glass's Δ (control-sd denominator) and the
    // common-language effect size P(X > Y) from the exact rank-sum U —
    // the magnitude card that turns q7n's Welch t (significance only)
    // into something a meta-analysis (qdp) can pool. Moments ride the
    // established round-6 DECIMAL sums; CLES is an exact integer ratio
    // off the tiebroken pooled ranking.
    "qe4_effect_sizes" -> Q(
      fn = (s, dir) => {
        val e = t(s, dir, "events")
          .filter(col("event_type").isin("purchase", "click") &&
            col("value").isNotNull)
          .select(col("value").cast("decimal(18,2)").as("v"),
            when(col("event_type") === "purchase", 1L).otherwise(0L)
              .as("g"), col("event_id"))
        val gs = e.groupBy(col("g"))
          .agg(count(lit(1)).as("ni"), sum(col("v")).as("svd"))
          .select(col("g"), col("ni"),
            round(col("svd").cast("double") / col("ni").cast("double"), 9)
              .as("mi"))
        val mom = e.join(gs, Seq("g"))
          .select(col("g"), (col("v").cast("double") - col("mi")).as("cv"))
          .groupBy(col("g"))
          .agg(sum(round(col("cv") * col("cv"), 6).cast("decimal(28,6)"))
            .as("ssd"))
        val wide = gs.join(mom, Seq("g")).groupBy()
          .agg(max(when(col("g") === 1, col("ni"))).as("n1"),
            max(when(col("g") === 1, col("mi"))).as("m1"),
            max(when(col("g") === 1, col("ssd"))).as("ss1"),
            max(when(col("g") === 0, col("ni"))).as("n2"),
            max(when(col("g") === 0, col("mi"))).as("m2"),
            max(when(col("g") === 0, col("ssd"))).as("ss2"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(e,
          Seq(col("v"), col("g"), col("event_id")), "r")
        val u = ranked.agg(
          sum(when(col("g") === 1, col("r")).otherwise(0L)).as("r1"),
          sum(col("g")).as("nu1"), count(lit(1)).as("nnu"))
          .select((col("r1") - col("nu1") * (col("nu1") + 1) / 2).as("uu"))
        val pre = wide.crossJoin(broadcast(u))
          .select(col("n1"), col("n2"), col("m1"), col("m2"), col("uu"),
            sqrt((col("ss1").cast("double") + col("ss2").cast("double")) /
              (col("n1") + col("n2") - 2).cast("double")).as("sp"),
            sqrt(col("ss2").cast("double") /
              (col("n2") - 1).cast("double")).as("s2"))
        pre.select(col("n1"), col("n2"),
          round((col("m1") - col("m2")) / col("sp"), 6).as("cohens_d"),
          round(((col("m1") - col("m2")) / col("sp")) *
            (lit(1.0) - lit(3.0) /
              (lit(4.0) * (col("n1") + col("n2") - 2).cast("double") -
                lit(1.0))), 6).as("hedges_g"),
          round((col("m1") - col("m2")) / col("s2"), 6).as("glass_delta"),
          round(col("uu").cast("double") /
            (col("n1") * col("n2")).cast("double"), 6).as("cles"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT CAST(value AS DECIMAL(18,2)) AS v,
                 CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS g,
                 event_id
          FROM events
          WHERE event_type IN ('purchase', 'click') AND value IS NOT NULL),
        gs AS (
          SELECT g, CAST(COUNT(*) AS BIGINT) AS ni,
                 ROUND(CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
                   AS mi
          FROM e GROUP BY 1),
        mom AS (
          SELECT e.g,
                 CAST(SUM(CAST(ROUND((CAST(v AS DOUBLE) - gs.mi) *
                   (CAST(v AS DOUBLE) - gs.mi), 6) AS DECIMAL(28,6)))
                   AS DOUBLE) AS ssd
          FROM e JOIN gs ON e.g = gs.g GROUP BY e.g),
        wide AS (
          SELECT MAX(CASE WHEN gs.g = 1 THEN ni END) AS n1,
                 MAX(CASE WHEN gs.g = 1 THEN mi END) AS m1,
                 MAX(CASE WHEN gs.g = 1 THEN ssd END) AS ss1,
                 MAX(CASE WHEN gs.g = 0 THEN ni END) AS n2,
                 MAX(CASE WHEN gs.g = 0 THEN mi END) AS m2,
                 MAX(CASE WHEN gs.g = 0 THEN ssd END) AS ss2
          FROM gs JOIN mom ON gs.g = mom.g),
        ranked AS (
          SELECT g, CAST(ROW_NUMBER() OVER (ORDER BY v, g, event_id)
            AS BIGINT) AS r
          FROM e),
        u AS (
          SELECT CAST(SUM(CASE WHEN g = 1 THEN r ELSE 0 END) AS BIGINT) -
                 CAST(SUM(g) AS BIGINT) * (CAST(SUM(g) AS BIGINT) + 1) // 2
                   AS uu
          FROM ranked),
        pre AS (
          SELECT n1, n2, m1, m2, uu,
                 sqrt((ss1 + ss2) / CAST(n1 + n2 - 2 AS DOUBLE)) AS sp,
                 sqrt(ss2 / CAST(n2 - 1 AS DOUBLE)) AS s2
          FROM wide CROSS JOIN u)
        SELECT n1, n2,
               ROUND((m1 - m2) / sp, 6) + CAST(0 AS DOUBLE) AS cohens_d,
               ROUND(((m1 - m2) / sp) *
                 (CAST(1 AS DOUBLE) - CAST(3 AS DOUBLE) /
                   (CAST(4 AS DOUBLE) * CAST(n1 + n2 - 2 AS DOUBLE) -
                     CAST(1 AS DOUBLE))), 6) + CAST(0 AS DOUBLE)
                 AS hedges_g,
               ROUND((m1 - m2) / s2, 6) + CAST(0 AS DOUBLE)
                 AS glass_delta,
               ROUND(CAST(uu AS DOUBLE) /
                 CAST(n1 * n2 AS DOUBLE), 6) + CAST(0 AS DOUBLE) AS cles
        FROM pre""")),

    // Dunn's post-hoc test after Kruskal-Wallis (qbo): all ten pairwise
    // priority comparisons from ONE global ranking pass — z_ij =
    // (R̄_i - R̄_j)/sqrt((N(N+1)/12)(1/n_i + 1/n_j)) with the Bonferroni
    // significance flag at |z| > 2.807 (α = 0.05 two-sided over 10
    // comparisons) — WHICH priorities differ, not just whether any do.
    // Rank sums are exact BIGINTs off the tiebroken global order
    // (tiebreak noted in lieu of average ranks); one row per pair with
    // a total output order.
    "qe5_dunn_posthoc" -> Q(
      fn = (s, dir) => {
        val o = t(s, dir, "orders")
          .select(col("o_orderpriority").as("g"),
            col("o_totalprice").cast("decimal(18,2)").as("v"),
            col("o_orderkey").as("k"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(o,
          Seq(col("v"), col("k")), "r")
        val gs = ranked.groupBy(col("g"))
          .agg(count(lit(1)).as("ni"), sum(col("r")).as("sr"))
          .localCheckpoint(eager = false)
        val n0 = gs.agg(sum(col("ni")).as("nn"))
        val pairs = gs.select(col("g").as("gi"), col("ni").as("na"),
          col("sr").as("sa"))
          .join(gs.select(col("g").as("gj"), col("ni").as("nb"),
            col("sr").as("sb")), col("gi") < col("gj"))
          .crossJoin(broadcast(n0))
          .select(col("gi"), col("gj"),
            round((col("sa").cast("double") / col("na").cast("double") -
              col("sb").cast("double") / col("nb").cast("double")) /
              sqrt((col("nn").cast("double") *
                (col("nn") + 1).cast("double") / lit(12.0)) *
                (lit(1.0) / col("na").cast("double") +
                  lit(1.0) / col("nb").cast("double"))), 6).as("z_dunn"))
        pairs.select(col("gi"), col("gj"), col("z_dunn"),
          when(abs(col("z_dunn")) > 2.807, lit("yes")).otherwise(lit("no"))
            .as("sig_bonf_05"))
          .orderBy(col("gi"), col("gj"))
      },
      oracle = Some("""
        WITH o AS (
          SELECT o_orderpriority AS g,
                 CAST(o_totalprice AS DECIMAL(18,2)) AS v,
                 o_orderkey AS k
          FROM orders),
        ranked AS (
          SELECT g, CAST(ROW_NUMBER() OVER (ORDER BY v, k) AS BIGINT)
            AS r
          FROM o),
        gs AS MATERIALIZED (
          SELECT g, CAST(COUNT(*) AS BIGINT) AS ni,
                 CAST(SUM(r) AS BIGINT) AS sr
          FROM ranked GROUP BY 1),
        n0 AS (SELECT CAST(SUM(ni) AS BIGINT) AS nn FROM gs),
        pairs AS (
          SELECT a.g AS gi, b.g AS gj,
                 ROUND((CAST(a.sr AS DOUBLE) / CAST(a.ni AS DOUBLE) -
                   CAST(b.sr AS DOUBLE) / CAST(b.ni AS DOUBLE)) /
                   sqrt((CAST(nn AS DOUBLE) * CAST(nn + 1 AS DOUBLE) /
                     CAST(12 AS DOUBLE)) *
                     (CAST(1 AS DOUBLE) / CAST(a.ni AS DOUBLE) +
                      CAST(1 AS DOUBLE) / CAST(b.ni AS DOUBLE))), 6)
                   AS z_dunn
          FROM gs a JOIN gs b ON a.g < b.g CROSS JOIN n0)
        SELECT gi, gj, z_dunn + CAST(0 AS DOUBLE) AS z_dunn,
               CASE WHEN ABS(z_dunn) > CAST(2.807 AS DOUBLE) THEN 'yes'
                    ELSE 'no' END AS sig_bonf_05
        FROM pairs ORDER BY gi, gj""")),

    // Train/val n-gram novelty measurement: what fraction of the val
    // split's word trigrams (by TYPE and by TOKEN) already appear in
    // the train split — the measured memorization-risk report that
    // q3f's decontamination FILTER acts on and q3z's split assumes.
    // The split is the deterministic doc_id mod-10 rule; trigrams come
    // from window-free array slicing; both overlap rates are exact
    // integer ratios.
    "qe6_ngram_novelty" -> Q(
      fn = (s, dir) => {
        val d = t(s, dir, "documents")
          .select(col("doc_id"),
            split(lower(col("text")), "[\t\n\f\r ]+").as("arr"),
            (pmod(col("doc_id"), lit(10L)) < 8).as("is_train"))
        val tris = d
          .select(col("doc_id"), col("is_train"),
            explode(expr("transform(sequence(0, size(arr) - 3), " +
              "i -> concat_ws(' ', arr[i], arr[i+1], arr[i+2]))"))
              .as("g"))
          .filter(col("g") =!= "" && !col("g").startsWith(" ") &&
            !col("g").endsWith(" "))
          .localCheckpoint(eager = false)
        val docs = d.groupBy(col("is_train")).agg(countDistinct(col("doc_id"))
          .as("nd"))
        val trainTypes = tris.filter(col("is_train"))
          .select(col("g")).distinct()
          .withColumn("in_train", lit(1L))
        val valGrams = tris.filter(!col("is_train"))
          .groupBy(col("g")).agg(count(lit(1)).as("c"))
        val ov = valGrams.join(trainTypes, Seq("g"), "left")
          .agg(count(lit(1)).as("vtypes"),
            sum(coalesce(col("in_train"), lit(0L))).as("vtypes_hit"),
            sum(col("c")).as("vtok"),
            sum(when(col("in_train").isNotNull, col("c")).otherwise(0L))
              .as("vtok_hit"))
        val wide = docs.groupBy()
          .agg(max(when(col("is_train"), col("nd"))).as("n_train_docs"),
            max(when(!col("is_train"), col("nd"))).as("n_val_docs"))
        wide.crossJoin(broadcast(ov))
          .select(col("n_train_docs"), col("n_val_docs"),
            col("vtypes").as("val_gram_types"),
            col("vtok").as("val_gram_tokens"),
            round(col("vtypes_hit").cast("double") /
              col("vtypes").cast("double"), 6).as("type_overlap"),
            round(col("vtok_hit").cast("double") /
              col("vtok").cast("double"), 6).as("token_overlap"))
      },
      oracle = Some("""
        WITH d AS (
          SELECT doc_id,
                 string_split_regex(lower(text), '[\t\n\x0B\f\r ]+') AS arr,
                 (doc_id % 10) < 8 AS is_train
          FROM documents),
        tris AS MATERIALIZED (
          SELECT doc_id, is_train, g
          FROM (
            SELECT doc_id, is_train,
                   UNNEST(list_transform(range(1, len(arr) - 1),
                     i -> arr[i] || ' ' || arr[i + 1] || ' ' ||
                          arr[i + 2])) AS g
            FROM d)
          WHERE g <> '' AND g NOT LIKE ' %' AND g NOT LIKE '% '),
        docs AS (
          SELECT is_train, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS nd
          FROM d GROUP BY 1),
        train_types AS (
          SELECT DISTINCT g, CAST(1 AS BIGINT) AS in_train
          FROM tris WHERE is_train),
        val_grams AS (
          SELECT g, CAST(COUNT(*) AS BIGINT) AS c
          FROM tris WHERE NOT is_train GROUP BY 1),
        ov AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS vtypes,
                 CAST(SUM(COALESCE(in_train, 0)) AS BIGINT) AS vtypes_hit,
                 CAST(SUM(c) AS BIGINT) AS vtok,
                 CAST(SUM(CASE WHEN in_train IS NOT NULL THEN c ELSE 0
                   END) AS BIGINT) AS vtok_hit
          FROM val_grams LEFT JOIN train_types USING (g)),
        wide AS (
          SELECT MAX(CASE WHEN is_train THEN nd END) AS n_train_docs,
                 MAX(CASE WHEN NOT is_train THEN nd END) AS n_val_docs
          FROM docs)
        SELECT n_train_docs, n_val_docs,
               vtypes AS val_gram_types,
               vtok AS val_gram_tokens,
               ROUND(CAST(vtypes_hit AS DOUBLE) / CAST(vtypes AS DOUBLE),
                 6) + CAST(0 AS DOUBLE) AS type_overlap,
               ROUND(CAST(vtok_hit AS DOUBLE) / CAST(vtok AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS token_overlap
        FROM wide CROSS JOIN ov""")),

    // Vocabulary coverage planning: the corpus-token share covered by
    // the top-k frequent types at k = 100 / 1000 / 5000, and the
    // smallest vocabulary covering 90% and 99% of tokens (exact integer
    // rank thresholds off the frequency-ranked running sum) — the
    // practical "what vocab size do we ship?" card between q8f's Heaps
    // growth and q8g's Zipf fit, and the size planner for the BPE
    // tokenizer's vocabulary budget. Everything is exact integers; the
    // 90/99% gates compare cum·100 ≥ share·N in BIGINTs.
    "qe7_vocab_coverage" -> Q(
      fn = (s, dir) => {
        val tf = t(s, dir, "documents")
          .select(explode(split(lower(col("text")), "[\t\n\f\r ]+"))
            .as("tok"))
          .filter(col("tok") =!= "")
          .groupBy(col("tok")).agg(count(lit(1)).as("c"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(
          tf.select((-col("c")).as("negc"), col("tok"), col("c")),
          Seq(col("negc"), col("tok")), "rk")
        val cum = graft.operators.ScaleOps.globalRunningSum(ranked,
          Seq(col("rk")), col("c"), "cum").localCheckpoint(eager = false)
        val tot = cum.agg(max(col("cum")).as("nt"), count(lit(1)).as("v"))
        val at = cum.crossJoin(broadcast(tot))
          .agg(first(col("nt")).as("n_tokens"), first(col("v")).as("vocab"),
            max(when(col("rk") === 100, col("cum"))).as("c100"),
            max(when(col("rk") === 1000, col("cum"))).as("c1000"),
            max(when(col("rk") === 5000, col("cum"))).as("c5000"),
            min(when(col("cum") * 100 >= lit(90L) * col("nt"), col("rk")))
              .as("k90"),
            min(when(col("cum") * 100 >= lit(99L) * col("nt"), col("rk")))
              .as("k99"))
        at.select(col("n_tokens"), col("vocab"),
          round(col("c100").cast("double") / col("n_tokens").cast("double"),
            6).as("cov_top100"),
          round(col("c1000").cast("double") / col("n_tokens").cast("double"),
            6).as("cov_top1000"),
          when(col("c5000").isNotNull,
            round(col("c5000").cast("double") /
              col("n_tokens").cast("double"), 6)).as("cov_top5000"),
          col("k90").as("vocab_for_90"), col("k99").as("vocab_for_99"))
      },
      oracle = Some("""
        WITH tf AS (
          SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
          FROM (SELECT UNNEST(string_split_regex(lower(text),
                  '[\t\n\x0B\f\r ]+')) AS tok FROM documents)
          WHERE tok <> '' GROUP BY 1),
        ranked AS (
          SELECT c, CAST(ROW_NUMBER() OVER (ORDER BY -c, tok) AS BIGINT)
            AS rk
          FROM tf),
        cum AS MATERIALIZED (
          SELECT rk, SUM(c) OVER (ORDER BY rk ROWS UNBOUNDED PRECEDING)
            AS cum
          FROM ranked),
        tot AS (
          SELECT CAST(MAX(cum) AS BIGINT) AS nt,
                 CAST(COUNT(*) AS BIGINT) AS v
          FROM cum),
        at AS (
          SELECT MAX(tot.nt) AS n_tokens, MAX(tot.v) AS vocab,
                 MAX(CASE WHEN rk = 100 THEN CAST(cum AS BIGINT) END)
                   AS c100,
                 MAX(CASE WHEN rk = 1000 THEN CAST(cum AS BIGINT) END)
                   AS c1000,
                 MAX(CASE WHEN rk = 5000 THEN CAST(cum AS BIGINT) END)
                   AS c5000,
                 MIN(CASE WHEN CAST(cum AS BIGINT) * 100 >= 90 * tot.nt
                   THEN rk END) AS k90,
                 MIN(CASE WHEN CAST(cum AS BIGINT) * 100 >= 99 * tot.nt
                   THEN rk END) AS k99
          FROM cum CROSS JOIN tot)
        SELECT n_tokens, vocab,
               ROUND(CAST(c100 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS cov_top100,
               ROUND(CAST(c1000 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS cov_top1000,
               CASE WHEN c5000 IS NOT NULL THEN
                 ROUND(CAST(c5000 AS DOUBLE) / CAST(n_tokens AS DOUBLE),
                   6) + CAST(0 AS DOUBLE) END AS cov_top5000,
               k90 AS vocab_for_90, k99 AS vocab_for_99
        FROM at""")),

    // Survey design effect of user-clustered sampling: events arrive
    // clustered by user, so "n events" is not "n independent draws" —
    // DEFF = 1 + (k0 - 1)·ICC with the one-way ANOVA intraclass
    // correlation across users, and the effective sample size N/DEFF
    // that q7k's MDE planner should really be fed. Per-user moments
    // ride the qd8 recipe (DECIMAL squares, VARCHAR-bridged casts,
    // ni·d² in DECIMAL); every downstream link is a raw ratio.
    "qe8_design_effect" -> Q(
      fn = (s, dir) => {
        val g = t(s, dir, "events")
          .filter(col("value").isNotNull)
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("ni"),
            sum(col("value").cast("decimal(18,2)")).as("syd"),
            sum(col("value").cast("decimal(12,2)") *
              col("value").cast("decimal(12,2)")).as("syyd"))
          .select(col("ni"), col("syd").cast("double").as("syg"),
            col("syyd").cast("double").as("syyg"))
          .localCheckpoint(eager = false)
        val tot = g.agg(sum(col("ni")).as("nn"), count(lit(1)).as("a"),
          sum(col("syg")).as("sy0"), sum(col("ni") * col("ni")).as("sni2"))
          .select(col("nn"), col("a"), col("sni2"),
            round(col("sy0") / col("nn").cast("double"), 9).as("ybar"))
        val parts = g.crossJoin(broadcast(tot))
          .select(col("ni"), col("nn"), col("a"), col("sni2"),
            round(col("syyg") - col("syg") * col("syg") /
              col("ni").cast("double"), 6).as("ssw_g"),
            round((round(col("syg") / col("ni").cast("double"), 9) -
              col("ybar")) *
              (round(col("syg") / col("ni").cast("double"), 9) -
                col("ybar")), 9).as("dg2"))
          .agg(first(col("nn")).as("nn"), first(col("a")).as("a"),
            first(col("sni2")).as("sni2"),
            sum(col("ssw_g").cast("decimal(28,6)")).as("sswd"),
            sum(col("ni").cast("decimal(10,0)") *
              col("dg2").cast("decimal(20,9)")).as("ssbd"))
        val pre = parts.select(col("nn"), col("a"),
          (col("ssbd").cast("double") / (col("a") - 1).cast("double"))
            .as("msb"),
          (col("sswd").cast("double") / (col("nn") - col("a"))
            .cast("double")).as("msw"),
          ((col("nn").cast("double") -
            col("sni2").cast("double") / col("nn").cast("double")) /
            (col("a") - 1).cast("double")).as("k0"))
          .withColumn("icc", (col("msb") - col("msw")) /
            (col("msb") + (col("k0") - lit(1.0)) * col("msw")))
          .withColumn("deff", lit(1.0) +
            (col("k0") - lit(1.0)) * col("icc"))
        pre.select(col("nn").as("n_events"), col("a").as("n_users"),
          round(col("k0"), 6).as("k0"),
          round(col("icc"), 6).as("icc"),
          round(col("deff"), 6).as("deff"),
          round(col("nn").cast("double") / col("deff"), 6).as("n_eff"))
      },
      oracle = Some("""
        WITH g AS MATERIALIZED (
          SELECT user_id, CAST(COUNT(*) AS BIGINT) AS ni,
                 CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS syg,
                 CAST(CAST(SUM(CAST(value AS DECIMAL(12,2)) *
                   CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE)
                   AS syyg
          FROM events WHERE value IS NOT NULL GROUP BY 1),
        tot AS (
          SELECT CAST(SUM(ni) AS BIGINT) AS nn,
                 CAST(COUNT(*) AS BIGINT) AS a,
                 CAST(SUM(ni * ni) AS BIGINT) AS sni2,
                 ROUND(SUM(syg) / CAST(SUM(ni) AS DOUBLE), 9) AS ybar
          FROM g),
        parts AS (
          SELECT MAX(tot.nn) AS nn, MAX(tot.a) AS a,
                 MAX(tot.sni2) AS sni2,
                 CAST(SUM(CAST(ROUND(syyg - syg * syg /
                   CAST(ni AS DOUBLE), 6) AS DECIMAL(28,6))) AS DOUBLE)
                   AS ssw,
                 CAST(SUM(CAST(ni AS DECIMAL(10,0)) *
                   CAST(ROUND((ROUND(syg / CAST(ni AS DOUBLE), 9) -
                     tot.ybar) * (ROUND(syg / CAST(ni AS DOUBLE), 9) -
                     tot.ybar), 9) AS DECIMAL(20,9))) AS DOUBLE) AS ssb
          FROM g CROSS JOIN tot),
        pre AS (
          SELECT nn, a,
                 ssb / CAST(a - 1 AS DOUBLE) AS msb,
                 ssw / CAST(nn - a AS DOUBLE) AS msw,
                 (CAST(nn AS DOUBLE) -
                   CAST(sni2 AS DOUBLE) / CAST(nn AS DOUBLE)) /
                   CAST(a - 1 AS DOUBLE) AS k0
          FROM parts),
        pre2 AS (
          SELECT *,
                 (msb - msw) / (msb + (k0 - CAST(1 AS DOUBLE)) * msw)
                   AS icc
          FROM pre),
        pre3 AS (
          SELECT *,
                 CAST(1 AS DOUBLE) + (k0 - CAST(1 AS DOUBLE)) * icc
                   AS deff
          FROM pre2)
        SELECT nn AS n_events, a AS n_users,
               ROUND(k0, 6) + CAST(0 AS DOUBLE) AS k0,
               ROUND(icc, 6) + CAST(0 AS DOUBLE) AS icc,
               ROUND(deff, 6) + CAST(0 AS DOUBLE) AS deff,
               ROUND(CAST(nn AS DOUBLE) / deff, 6) + CAST(0 AS DOUBLE)
                 AS n_eff
        FROM pre3""")),

    // Clark-Evans nearest-neighbor index of the synthetic customer
    // point pattern: R = observed mean NN distance over the CSR
    // expectation 0.5/sqrt(density), with the Donnelly-style z — the
    // NN-based aggregation test beside qcq's Ripley K (K integrates ALL
    // pair distances at chosen radii; Clark-Evans summarizes just the
    // first neighbor, the field-standard single number). Planar
    // distances on the 3-decimal synthetic degree grid (documented —
    // the grid is synthetic, so no geodesic is pretended), a capped
    // 600-point panel bounds the all-pairs NN scan, and the bounding-
    // box density is exact-grid arithmetic.
    "qe9_clark_evans" -> Q(
      fn = (s, dir) => {
        val pts = t(s, dir, "customer")
          .filter(col("c_custkey") <= 600)
          .select(col("c_custkey").as("pid"),
            hashCoord(col("c_custkey"), "lat", 180000L, 90.0).as("la"),
            hashCoord(col("c_custkey"), "lon", 360000L, 180.0).as("lo"))
          .localCheckpoint(eager = false)
        val nn = pts.select(col("pid"), col("la"), col("lo"))
          .join(pts.select(col("pid").as("pj"), col("la").as("lb"),
            col("lo").as("lb2")), col("pid") =!= col("pj"))
          .select(col("pid"),
            ((col("la") - col("lb")) * (col("la") - col("lb")) +
              (col("lo") - col("lb2")) * (col("lo") - col("lb2")))
              .as("d2"))
          .groupBy(col("pid")).agg(min(col("d2")).as("mind2"))
          .select(round(sqrt(col("mind2")), 9).as("dnn"))
        val dbar = nn.agg(count(lit(1)).as("n"),
          sum(col("dnn").cast("decimal(20,9)")).as("sd"))
          .select(col("n"),
            round(col("sd").cast("double") / col("n").cast("double"), 9)
              .as("dbar"))
        val box = pts.agg(min(col("la")).as("la0"), max(col("la")).as("la1"),
          min(col("lo")).as("lo0"), max(col("lo")).as("lo1"))
          .select(((col("la1") - col("la0")) * (col("lo1") - col("lo0")))
            .as("area"))
        dbar.crossJoin(broadcast(box))
          .select(col("n"), col("dbar"), col("area"),
            (col("n").cast("double") / col("area")).as("rho"))
          .select(col("n"),
            round(col("dbar"), 6).as("mean_nn"),
            round(lit(0.5) / sqrt(col("rho")), 6).as("expected_nn"),
            round(col("dbar") / (lit(0.5) / sqrt(col("rho"))), 6)
              .as("ce_index"),
            round((col("dbar") - lit(0.5) / sqrt(col("rho"))) /
              (lit(0.26136) / sqrt(col("n").cast("double") * col("rho"))),
              6).as("z_ce"))
      },
      oracle = Some(s"""
        WITH pts AS MATERIALIZED (
          SELECT c_custkey AS pid,
                 ${coordSql("c_custkey", "lat", 180000L, 90)} AS la,
                 ${coordSql("c_custkey", "lon", 360000L, 180)} AS lo
          FROM customer WHERE c_custkey <= 600),
        nn AS (
          SELECT a.pid,
                 ROUND(sqrt(MIN((a.la - b.la) * (a.la - b.la) +
                   (a.lo - b.lo) * (a.lo - b.lo))), 9) AS dnn
          FROM pts a JOIN pts b ON a.pid <> b.pid
          GROUP BY a.pid),
        dbar AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 ROUND(CAST(SUM(CAST(dnn AS DECIMAL(20,9))) AS DOUBLE) /
                   CAST(COUNT(*) AS DOUBLE), 9) AS dbar
          FROM nn),
        box AS (
          SELECT (MAX(la) - MIN(la)) * (MAX(lo) - MIN(lo)) AS area
          FROM pts),
        pre AS (
          SELECT n, dbar, area,
                 CAST(n AS DOUBLE) / area AS rho
          FROM dbar CROSS JOIN box)
        SELECT n,
               ROUND(dbar, 6) + CAST(0 AS DOUBLE) AS mean_nn,
               ROUND(CAST(0.5 AS DOUBLE) / sqrt(rho), 6)
                 + CAST(0 AS DOUBLE) AS expected_nn,
               ROUND(dbar / (CAST(0.5 AS DOUBLE) / sqrt(rho)), 6)
                 + CAST(0 AS DOUBLE) AS ce_index,
               ROUND((dbar - CAST(0.5 AS DOUBLE) / sqrt(rho)) /
                 (CAST(0.26136 AS DOUBLE) /
                   sqrt(CAST(n AS DOUBLE) * rho)), 6)
                 + CAST(0 AS DOUBLE) AS z_ce
        FROM pre""")),

    // Bowker test of transition symmetry: is the user journey's
    // event-type transition matrix (q6b) REVERSIBLE — χ² =
    // Σ_{i<j} (n_ij - n_ji)²/(n_ij + n_ji) over the off-diagonal pairs,
    // the k×k generalization of qd2's McNemar. A significant Bowker
    // says the journey has a directed flow (e.g. view → purchase ≫
    // purchase → view) that any undirected co-occurrence analysis
    // (q7e) erases. Transition counts are exact BIGINTs off the
    // per-user ordered lead; terms are 9-snapped integer rationals.
    "qea_bowker_symmetry" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts_ms"), col("event_id"))
        val tr = t(s, dir, "events")
          .withColumn("ts_ms", unix_millis(col("ts")))
          .select(col("user_id"), col("ts_ms"), col("event_id"),
            col("event_type"))
          .withColumn("next_type", lead(col("event_type"), 1).over(w))
          .filter(col("next_type").isNotNull &&
            col("next_type") =!= col("event_type"))
          .groupBy(col("event_type").as("a"), col("next_type").as("b"))
          .agg(count(lit(1)).as("n"))
        val pairs = tr.select(col("a"), col("b"), col("n"))
          .join(tr.select(col("b").as("a"), col("a").as("b"),
            col("n").as("m")), Seq("a", "b"), "left")
          .filter(col("a") < col("b"))
          .select(col("a"), col("b"), col("n"),
            coalesce(col("m"), lit(0L)).as("m"))
        val agg = pairs.agg(count(lit(1)).as("df"),
          sum(round((col("n") - col("m")).cast("double") *
            (col("n") - col("m")).cast("double") /
            (col("n") + col("m")).cast("double"), 9)
            .cast("decimal(18,9)")).as("x2d"),
          sum(col("n") + col("m")).as("n_trans"))
        agg.select(col("n_trans"), col("df"),
          round(col("x2d").cast("double"), 6).as("bowker_chi2"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id, event_type,
                 lead(event_type) OVER (PARTITION BY user_id
                   ORDER BY epoch_ms(ts), event_id) AS next_type
          FROM events),
        tr AS MATERIALIZED (
          SELECT event_type AS a, next_type AS b,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM e
          WHERE next_type IS NOT NULL AND next_type <> event_type
          GROUP BY 1, 2),
        pairs AS (
          SELECT x.a, x.b, x.n, CAST(COALESCE(y.n, 0) AS BIGINT) AS m
          FROM tr x LEFT JOIN tr y ON x.a = y.b AND x.b = y.a
          WHERE x.a < x.b),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS df,
                 SUM(CAST(ROUND(CAST(n - m AS DOUBLE) *
                   CAST(n - m AS DOUBLE) / CAST(n + m AS DOUBLE), 9)
                   AS DECIMAL(18,9))) AS x2d,
                 CAST(SUM(n + m) AS BIGINT) AS n_trans
          FROM pairs)
        SELECT n_trans, df,
               ROUND(CAST(x2d AS DOUBLE), 6) + CAST(0 AS DOUBLE)
                 AS bowker_chi2
        FROM agg""")),

    // Ordinal-association battery between order priority (1-URGENT →
    // 5-LOW) and order-value tertile: Goodman-Kruskal γ, Somers'
    // d(value|priority) and d(priority|value), and Stuart's τ_c — the
    // ordered-table effect sizes qa4's numeric τ-b doesn't give for a
    // CROSS-TABULATED design (and qe2's JT only tests, never sizes).
    // Concordant/discordant and every tie class are exact integer
    // counts off the 15-cell table (cell-pair double loop is 225 rows);
    // each coefficient is one exact ratio.
    "qeb_ordinal_association" -> Q(
      fn = (s, dir) => {
        val o = t(s, dir, "orders")
          .select(regexp_extract(col("o_orderpriority"), "^([0-9])", 1)
            .cast("long").as("gx"),
            col("o_totalprice").cast("decimal(18,2)").as("v"),
            col("o_orderkey").as("k"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(o,
          Seq(col("v"), col("k")), "rn")
        val n0 = ranked.agg(count(lit(1)).as("n"))
          .select(col("n"), expr("n div 3").as("base"),
            pmod(col("n"), lit(3)).as("rem"))
          .select(col("n"), col("base"), col("rem"),
            (col("rem") * (col("base") + 1)).as("cut"))
        val cells = ranked.crossJoin(broadcast(n0))
          .select(col("gx"),
            when(col("rn") <= col("cut"),
              expr("(rn - 1) div (base + 1) + 1"))
              .otherwise(expr("rem + (rn - 1 - cut) div base + 1"))
              .as("gy"))
          .groupBy(col("gx"), col("gy")).agg(count(lit(1)).as("nij"))
          .localCheckpoint(eager = false)
        val cd = cells.select(col("gx").as("xa"), col("gy").as("ya"),
          col("nij").as("na"))
          .crossJoin(cells.select(col("gx").as("xb"), col("gy").as("yb"),
            col("nij").as("nb")))
          .agg(
            sum(when(col("xb") > col("xa") && col("yb") > col("ya"),
              col("na") * col("nb")).otherwise(0L)).as("c2"),
            sum(when(col("xb") > col("xa") && col("yb") < col("ya"),
              col("na") * col("nb")).otherwise(0L)).as("d2"))
        val ties = cells.agg(sum(col("nij")).as("nn"),
          sum(col("nij") * (col("nij") - 1) / 2).as("tboth"))
        val tx = cells.groupBy(col("gx")).agg(sum(col("nij")).as("ri"))
          .agg(sum(col("ri") * (col("ri") - 1) / 2).as("tiedx"),
            countDistinct(col("gx")).as("r"))
        val ty = cells.groupBy(col("gy")).agg(sum(col("nij")).as("cj"))
          .agg(sum(col("cj") * (col("cj") - 1) / 2).as("tiedy"),
            countDistinct(col("gy")).as("c"))
        cd.crossJoin(broadcast(ties)).crossJoin(broadcast(tx))
          .crossJoin(broadcast(ty))
          .select(col("nn").as("n"), col("c2").as("concordant"),
            col("d2").as("discordant"),
            round((col("c2") - col("d2")).cast("double") /
              (col("c2") + col("d2")).cast("double"), 6).as("gamma"),
            round((col("c2") - col("d2")).cast("double") /
              (col("nn") * (col("nn") - 1) / 2 - col("tiedx"))
                .cast("double"), 6).as("somers_d_yx"),
            round((col("c2") - col("d2")).cast("double") /
              (col("nn") * (col("nn") - 1) / 2 - col("tiedy"))
                .cast("double"), 6).as("somers_d_xy"),
            round((col("c2") - col("d2")).cast("double") * lit(2.0) *
              least(col("r"), col("c")).cast("double") /
              (col("nn").cast("double") * col("nn").cast("double") *
                (least(col("r"), col("c")) - 1).cast("double")), 6)
              .as("stuart_tau_c"))
      },
      oracle = Some("""
        WITH o AS (
          SELECT CAST(regexp_extract(o_orderpriority, '^([0-9])', 1)
                   AS BIGINT) AS gx,
                 CAST(o_totalprice AS DECIMAL(18,2)) AS v,
                 o_orderkey AS k
          FROM orders),
        ranked AS (
          SELECT gx, ROW_NUMBER() OVER (ORDER BY v, k) AS rn FROM o),
        n0 AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(COUNT(*) // 3 AS BIGINT) AS base,
                 CAST(COUNT(*) % 3 AS BIGINT) AS rem
          FROM ranked),
        cells AS MATERIALIZED (
          SELECT gx,
                 CAST(NTILE(3) OVER (ORDER BY rn) AS BIGINT) AS gy,
                 CAST(COUNT(*) OVER () AS BIGINT) AS dummy
          FROM ranked),
        cellc AS (
          SELECT gx, gy, CAST(COUNT(*) AS BIGINT) AS nij
          FROM cells GROUP BY 1, 2),
        cd AS (
          SELECT CAST(SUM(CASE WHEN b.gx > a.gx AND b.gy > a.gy
                   THEN a.nij * b.nij ELSE 0 END) AS BIGINT) AS c2,
                 CAST(SUM(CASE WHEN b.gx > a.gx AND b.gy < a.gy
                   THEN a.nij * b.nij ELSE 0 END) AS BIGINT) AS d2
          FROM cellc a CROSS JOIN cellc b),
        ties AS (
          SELECT CAST(SUM(nij) AS BIGINT) AS nn,
                 CAST(SUM(nij * (nij - 1) // 2) AS BIGINT) AS tboth
          FROM cellc),
        tx AS (
          SELECT CAST(SUM(ri * (ri - 1) // 2) AS BIGINT) AS tiedx,
                 CAST(COUNT(*) AS BIGINT) AS r
          FROM (SELECT gx, CAST(SUM(nij) AS BIGINT) AS ri
                FROM cellc GROUP BY 1)),
        ty AS (
          SELECT CAST(SUM(cj * (cj - 1) // 2) AS BIGINT) AS tiedy,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM (SELECT gy, CAST(SUM(nij) AS BIGINT) AS cj
                FROM cellc GROUP BY 1))
        SELECT nn AS n, c2 AS concordant, d2 AS discordant,
               ROUND(CAST(c2 - d2 AS DOUBLE) / CAST(c2 + d2 AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS gamma,
               ROUND(CAST(c2 - d2 AS DOUBLE) /
                 CAST(nn * (nn - 1) // 2 - tiedx AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS somers_d_yx,
               ROUND(CAST(c2 - d2 AS DOUBLE) /
                 CAST(nn * (nn - 1) // 2 - tiedy AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS somers_d_xy,
               ROUND(CAST(c2 - d2 AS DOUBLE) * CAST(2 AS DOUBLE) *
                 CAST(LEAST(r, c) AS DOUBLE) /
                 (CAST(nn AS DOUBLE) * CAST(nn AS DOUBLE) *
                   CAST(LEAST(r, c) - 1 AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS stuart_tau_c
        FROM cd CROSS JOIN ties CROSS JOIN tx CROSS JOIN ty""")),

    // Mantel matrix-association statistic: the Pearson correlation
    // between the pairwise GEOGRAPHIC distance matrix and the pairwise
    // spend-difference matrix of the capped customer panel — "do nearby
    // customers spend alike?" asked at the matrix level, the
    // distance-decay companion to qcl's Moran (Moran fixes a contiguity
    // radius; Mantel uses the full distance spectrum). Planar grid
    // distances (the qe9 convention), |Δ ln spend| on the 9-grid,
    // pair moments on round-6 DECIMAL sums over the bounded
    // 400-point panel; the permutation null is out of scope (noted) —
    // the statistic itself is the deliverable.
    "qec_mantel_statistic" -> Q(
      fn = (s, dir) => {
        val spend = t(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("sp"))
        val pts = t(s, dir, "customer")
          .filter(col("c_custkey") <= 400)
          .join(spend, col("c_custkey") === col("o_custkey"))
          .select(col("c_custkey").as("pid"),
            hashCoord(col("c_custkey"), "lat", 180000L, 90.0).as("la"),
            hashCoord(col("c_custkey"), "lon", 360000L, 180.0).as("lo"),
            round(log(col("sp").cast("double")), 9).as("a"))
          .localCheckpoint(eager = false)
        val pairs = pts.select(col("pid"), col("la"), col("lo"), col("a"))
          .join(pts.select(col("pid").as("pj"), col("la").as("lb"),
            col("lo").as("lb2"), col("a").as("ab")),
            col("pid") < col("pj"))
          .select(
            round(sqrt((col("la") - col("lb")) * (col("la") - col("lb")) +
              (col("lo") - col("lb2")) * (col("lo") - col("lb2"))), 9)
              .as("d"),
            abs(round(col("a") - col("ab"), 9)).as("v"))
          .localCheckpoint(eager = false)
        val st = pairs.agg(count(lit(1)).as("np"),
          sum(col("d").cast("decimal(20,9)")).as("sdd"),
          sum(col("v").cast("decimal(20,9)")).as("svd"))
          .select(col("np"),
            round(col("sdd").cast("double") / col("np").cast("double"), 9)
              .as("md"),
            round(col("svd").cast("double") / col("np").cast("double"), 9)
              .as("mv"))
        val mom = pairs.crossJoin(broadcast(st))
          .select(col("np"),
            (col("d") - col("md")).as("cd"), (col("v") - col("mv")).as("cv"))
          .agg(first(col("np")).as("np"),
            sum(round(col("cd") * col("cd"), 6).cast("decimal(28,6)"))
              .as("sxx"),
            sum(round(col("cv") * col("cv"), 6).cast("decimal(28,6)"))
              .as("syy"),
            sum(round(col("cd") * col("cv"), 6).cast("decimal(28,6)"))
              .as("sxy"))
        mom.select(col("np").as("n_pairs"),
          round(col("sxy").cast("double") /
            (sqrt(col("sxx").cast("double")) *
              sqrt(col("syy").cast("double"))), 6).as("mantel_r"))
      },
      oracle = Some(s"""
        WITH spend AS (
          SELECT o_custkey,
                 SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS sp
          FROM orders GROUP BY 1),
        pts AS MATERIALIZED (
          SELECT c_custkey AS pid,
                 ${coordSql("c_custkey", "lat", 180000L, 90)} AS la,
                 ${coordSql("c_custkey", "lon", 360000L, 180)} AS lo,
                 ROUND(ln(CAST(sp AS DOUBLE)), 9) AS a
          FROM customer JOIN spend ON c_custkey = o_custkey
          WHERE c_custkey <= 400),
        pairs AS MATERIALIZED (
          SELECT ROUND(sqrt((x.la - y.la) * (x.la - y.la) +
                   (x.lo - y.lo) * (x.lo - y.lo)), 9) AS d,
                 ABS(ROUND(x.a - y.a, 9)) AS v
          FROM pts x JOIN pts y ON x.pid < y.pid),
        st AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS np,
                 ROUND(CAST(SUM(CAST(d AS DECIMAL(20,9))) AS DOUBLE) /
                   CAST(COUNT(*) AS DOUBLE), 9) AS md,
                 ROUND(CAST(SUM(CAST(v AS DECIMAL(20,9))) AS DOUBLE) /
                   CAST(COUNT(*) AS DOUBLE), 9) AS mv
          FROM pairs),
        mom AS (
          SELECT MAX(st.np) AS np,
                 CAST(SUM(CAST(ROUND((d - st.md) * (d - st.md), 6)
                   AS DECIMAL(28,6))) AS DOUBLE) AS sxx,
                 CAST(SUM(CAST(ROUND((v - st.mv) * (v - st.mv), 6)
                   AS DECIMAL(28,6))) AS DOUBLE) AS syy,
                 CAST(SUM(CAST(ROUND((d - st.md) * (v - st.mv), 6)
                   AS DECIMAL(28,6))) AS DOUBLE) AS sxy
          FROM pairs CROSS JOIN st)
        SELECT np AS n_pairs,
               ROUND(sxy / (sqrt(sxx) * sqrt(syy)), 6)
                 + CAST(0 AS DOUBLE) AS mantel_r
        FROM mom""")),

    // Horvitz-Thompson estimation under deterministic Poisson PPS
    // sampling: inclusion probability p ∝ sqrt(order value) (capped at
    // 1), an md5 uniform draw per order (the q4d hashDraw machinery),
    // the π-weighted total, its exact relative error against the true
    // total, and the HT variance estimate — the design-based estimation
    // audit for every weighted sample this engine draws (q4d/q7h give
    // samples; this checks what an estimator built on them would
    // report). Sample terms y/p are rounded at 6 and DECIMAL-summed so
    // the aggregation is order-free; the SE is one sqrt.
    "qed_horvitz_thompson" -> Q(
      fn = (s, dir) => {
        val o = t(s, dir, "orders")
          .select(col("o_orderkey").as("k"),
            col("o_totalprice").cast("decimal(18,2)").as("y"))
          .withColumn("p", least(lit(1.0),
            sqrt(col("y").cast("double")) / lit(600.0)))
          .withColumn("u",
            conv(substring(md5(concat(col("k").cast("string"), lit("ht"))),
              1, 12), 16, 10).cast("double") /
              lit(281474976710656.0))
        val tot = o.agg(count(lit(1)).as("n_pop"), sum(col("y")).as("ty"))
        val samp = o.filter(col("u") < col("p"))
          .agg(count(lit(1)).as("n_sample"),
            sum(round(col("y").cast("double") / col("p"), 6)
              .cast("decimal(28,6)")).as("htd"),
            sum(round((lit(1.0) - col("p")) *
              (col("y").cast("double") / col("p")) *
              (col("y").cast("double") / col("p")), 2)
              .cast("decimal(38,2)")).as("vard"))
        tot.crossJoin(broadcast(samp))
          .select(col("n_pop"), col("n_sample"),
            round(col("ty"), 2).cast("double").as("true_total"),
            round(col("htd").cast("double"), 2).as("ht_estimate"),
            round((col("htd").cast("double") - col("ty").cast("double")) /
              col("ty").cast("double"), 6).as("rel_err"),
            round(sqrt(col("vard").cast("double")), 2).as("ht_se"))
      },
      oracle = Some("""
        WITH o AS (
          SELECT o_orderkey AS k,
                 CAST(o_totalprice AS DECIMAL(18,2)) AS y,
                 LEAST(CAST(1 AS DOUBLE),
                   sqrt(CAST(o_totalprice AS DOUBLE)) /
                     CAST(600 AS DOUBLE)) AS p,
                 CAST(CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)
                   || 'ht'), 1, 12) AS BIGINT) AS DOUBLE) /
                   CAST(281474976710656 AS DOUBLE) AS u
          FROM orders),
        tot AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_pop, SUM(y) AS ty FROM o),
        samp AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_sample,
                 SUM(CAST(ROUND(CAST(y AS DOUBLE) / p, 6)
                   AS DECIMAL(28,6))) AS htd,
                 SUM(CAST(ROUND((CAST(1 AS DOUBLE) - p) *
                   (CAST(y AS DOUBLE) / p) * (CAST(y AS DOUBLE) / p), 2)
                   AS DECIMAL(38,2))) AS vard
          FROM o WHERE u < p)
        SELECT n_pop, n_sample,
               CAST(ROUND(ty, 2) AS DOUBLE) AS true_total,
               ROUND(CAST(htd AS DOUBLE), 2) + CAST(0 AS DOUBLE)
                 AS ht_estimate,
               ROUND((CAST(htd AS DOUBLE) - CAST(ty AS DOUBLE)) /
                 CAST(ty AS DOUBLE), 6) + CAST(0 AS DOUBLE) AS rel_err,
               ROUND(sqrt(CAST(vard AS DOUBLE)), 2) + CAST(0 AS DOUBLE)
                 AS ht_se
        FROM tot CROSS JOIN samp""")),

    // Geometric median of the customer point panel by two unrolled
    // Weiszfeld rounds from the centroid (the q4b iterative recipe:
    // per-term 9-snap, DECIMAL sums, a new 9-grid estimate each round)
    // — the robust 2-D "central facility" location a single wild point
    // cannot drag, where the centroid (emitted for contrast) moves
    // linearly with every outlier. Objective Σd at the centroid and at
    // the round-2 estimate shows the descent. Planar grid coordinates
    // (qe9 convention); sqrt is the only irrational link.
    "qee_geometric_median" -> Q(
      fn = (s, dir) => {
        val pts = t(s, dir, "customer")
          .filter(col("c_custkey") <= 500)
          .select(col("c_custkey").as("pid"),
            hashCoord(col("c_custkey"), "lat", 180000L, 90.0).as("la"),
            hashCoord(col("c_custkey"), "lon", 360000L, 180.0).as("lo"))
          .localCheckpoint(eager = false)
        val c0 = pts.agg(count(lit(1)).as("n"),
          sum(col("la").cast("decimal(20,9)")).as("sla"),
          sum(col("lo").cast("decimal(20,9)")).as("slo"))
          .select(col("n"),
            round(col("sla").cast("double") / col("n").cast("double"), 9)
              .as("cx0"),
            round(col("slo").cast("double") / col("n").cast("double"), 9)
              .as("cy0"))
        def step(cx: String, cy: String, base: DataFrame, tag: String) = {
          val d = pts.crossJoin(broadcast(base))
            .select(col("la"), col("lo"), col(cx), col(cy),
              round(sqrt((col("la") - col(cx)) * (col("la") - col(cx)) +
                (col("lo") - col(cy)) * (col("lo") - col(cy))), 9).as("d"))
            .filter(col("d") > 0)
          d.agg(
            sum(round(col("la") / col("d"), 9).cast("decimal(24,9)"))
              .as("swx"),
            sum(round(col("lo") / col("d"), 9).cast("decimal(24,9)"))
              .as("swy"),
            sum(round(lit(1.0) / col("d"), 9).cast("decimal(24,9)"))
              .as("sw"),
            sum(col("d").cast("decimal(20,9)")).as("obj"))
            .select(
              round(col("swx").cast("double") / col("sw").cast("double"), 9)
                .as(s"cx$tag"),
              round(col("swy").cast("double") / col("sw").cast("double"), 9)
                .as(s"cy$tag"),
              col("obj").cast("double").as(s"obj$tag"))
        }
        val s1 = step("cx0", "cy0", c0.select(col("cx0"), col("cy0")), "1")
        val s2 = step("cx1", "cy1", s1.select(col("cx1"), col("cy1")), "2")
        c0.crossJoin(broadcast(s1)).crossJoin(broadcast(s2))
          .select(col("n"),
            round(col("cx0"), 6).as("centroid_lat"),
            round(col("cy0"), 6).as("centroid_lon"),
            round(col("cx2"), 6).as("gmed_lat"),
            round(col("cy2"), 6).as("gmed_lon"),
            round(col("obj1"), 6).as("obj_at_centroid"),
            round(col("obj2"), 6).as("obj_at_round1"))
      },
      oracle = Some(s"""
        WITH pts AS MATERIALIZED (
          SELECT c_custkey AS pid,
                 ${coordSql("c_custkey", "lat", 180000L, 90)} AS la,
                 ${coordSql("c_custkey", "lon", 360000L, 180)} AS lo
          FROM customer WHERE c_custkey <= 500),
        c0 AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 ROUND(CAST(SUM(CAST(la AS DECIMAL(20,9))) AS DOUBLE) /
                   CAST(COUNT(*) AS DOUBLE), 9) AS cx0,
                 ROUND(CAST(SUM(CAST(lo AS DECIMAL(20,9))) AS DOUBLE) /
                   CAST(COUNT(*) AS DOUBLE), 9) AS cy0
          FROM pts),
        d1 AS (
          SELECT la, lo,
                 ROUND(sqrt((la - c0.cx0) * (la - c0.cx0) +
                   (lo - c0.cy0) * (lo - c0.cy0)), 9) AS d
          FROM pts CROSS JOIN c0
          WHERE ROUND(sqrt((la - c0.cx0) * (la - c0.cx0) +
            (lo - c0.cy0) * (lo - c0.cy0)), 9) > 0),
        s1 AS (
          SELECT ROUND(CAST(SUM(CAST(ROUND(la / d, 9) AS DECIMAL(24,9)))
                   AS DOUBLE) /
                 CAST(SUM(CAST(ROUND(CAST(1 AS DOUBLE) / d, 9)
                   AS DECIMAL(24,9))) AS DOUBLE), 9) AS cx1,
                 ROUND(CAST(SUM(CAST(ROUND(lo / d, 9) AS DECIMAL(24,9)))
                   AS DOUBLE) /
                 CAST(SUM(CAST(ROUND(CAST(1 AS DOUBLE) / d, 9)
                   AS DECIMAL(24,9))) AS DOUBLE), 9) AS cy1,
                 CAST(SUM(CAST(d AS DECIMAL(20,9))) AS DOUBLE) AS obj1
          FROM d1),
        d2 AS (
          SELECT la, lo,
                 ROUND(sqrt((la - s1.cx1) * (la - s1.cx1) +
                   (lo - s1.cy1) * (lo - s1.cy1)), 9) AS d
          FROM pts CROSS JOIN s1
          WHERE ROUND(sqrt((la - s1.cx1) * (la - s1.cx1) +
            (lo - s1.cy1) * (lo - s1.cy1)), 9) > 0),
        s2 AS (
          SELECT ROUND(CAST(SUM(CAST(ROUND(la / d, 9) AS DECIMAL(24,9)))
                   AS DOUBLE) /
                 CAST(SUM(CAST(ROUND(CAST(1 AS DOUBLE) / d, 9)
                   AS DECIMAL(24,9))) AS DOUBLE), 9) AS cx2,
                 ROUND(CAST(SUM(CAST(ROUND(lo / d, 9) AS DECIMAL(24,9)))
                   AS DOUBLE) /
                 CAST(SUM(CAST(ROUND(CAST(1 AS DOUBLE) / d, 9)
                   AS DECIMAL(24,9))) AS DOUBLE), 9) AS cy2,
                 CAST(SUM(CAST(d AS DECIMAL(20,9))) AS DOUBLE) AS obj2
          FROM d2)
        SELECT n,
               ROUND(cx0, 6) + CAST(0 AS DOUBLE) AS centroid_lat,
               ROUND(cy0, 6) + CAST(0 AS DOUBLE) AS centroid_lon,
               ROUND(cx2, 6) + CAST(0 AS DOUBLE) AS gmed_lat,
               ROUND(cy2, 6) + CAST(0 AS DOUBLE) AS gmed_lon,
               ROUND(obj1, 6) + CAST(0 AS DOUBLE) AS obj_at_centroid,
               ROUND(obj2, 6) + CAST(0 AS DOUBLE) AS obj_at_round1
        FROM c0 CROSS JOIN s1 CROSS JOIN s2""")),

    // Van Elteren stratified Wilcoxon: weekend vs weekday purchase
    // VALUES compared within each week stratum, per-stratum rank sums
    // combined with 1/(n_k+1) weights — the design-based companion to
    // qdn's CMH (CMH stratifies a binary outcome; van Elteren
    // stratifies a continuous one, killing the week-trend confound
    // that a pooled q7o would absorb). Per-stratum ranks come from
    // global-rank offsets over (week, value, id) — no per-group window
    // — and every null-moment term is an exact integer rational,
    // 9-snapped and DECIMAL-summed.
    "qef_van_elteren" -> Q(
      fn = (s, dir) => {
        val e = t(s, dir, "events")
          .filter(col("event_type") === "purchase" && col("value").isNotNull)
          .select((unix_millis(col("ts")) / lit(86400000L)).cast("long")
            .as("day"), col("value").cast("decimal(18,2)").as("v"),
            col("event_id"))
        val rel = e.crossJoin(broadcast(e.agg(min(col("day")).as("d0"))))
          .select(((col("day") - col("d0")) / lit(7)).cast("long").as("wk"),
            (pmod(col("day") - col("d0"), lit(7L)) >= 5).as("wknd"),
            col("v"), col("event_id"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(rel,
          Seq(col("wk"), col("v"), col("event_id")), "grn")
          .localCheckpoint(eager = false)
        val offs = ranked.groupBy(col("wk"))
          .agg(min(col("grn")).as("g0"), count(lit(1)).as("nk"))
        val strat = ranked.join(offs, Seq("wk"))
          .select(col("wk"), col("wknd"), col("nk"),
            (col("grn") - col("g0") + 1).as("r"))
          .groupBy(col("wk"))
          .agg(first(col("nk")).as("nk"),
            sum(when(col("wknd"), 1L).otherwise(0L)).as("n1k"),
            sum(when(col("wknd"), col("r")).otherwise(0L)).as("w1k"))
          .select(col("wk"), col("nk"), col("n1k"),
            (col("nk") - col("n1k")).as("n2k"), col("w1k"))
        val agg = strat.agg(count(lit(1)).as("n_strata"),
          sum(round(col("w1k").cast("double") /
            (col("nk") + 1).cast("double"), 9).cast("decimal(18,9)"))
            .as("ve"),
          sum(col("n1k")).as("sn1"),
          sum(round(col("n1k").cast("double") * col("n2k").cast("double") /
            (lit(12.0) * (col("nk") + 1).cast("double")), 9)
            .cast("decimal(18,9)")).as("vvar"))
        agg.select(col("n_strata"),
          round(col("ve").cast("double"), 6).as("ve_stat"),
          round(col("sn1").cast("double") / lit(2.0), 6).as("ve_null_mean"),
          round((col("ve").cast("double") -
            col("sn1").cast("double") / lit(2.0)) /
            sqrt(col("vvar").cast("double")), 6).as("ve_z"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
                 CAST(value AS DECIMAL(18,2)) AS v, event_id
          FROM events
          WHERE event_type = 'purchase' AND value IS NOT NULL),
        d0 AS (SELECT MIN(day) AS d0 FROM e),
        rel AS (
          SELECT (day - d0.d0) // 7 AS wk,
                 ((day - d0.d0) % 7) >= 5 AS wknd, v, event_id
          FROM e CROSS JOIN d0),
        ranked AS MATERIALIZED (
          SELECT wk, wknd,
                 CAST(ROW_NUMBER() OVER (ORDER BY wk, v, event_id)
                   AS BIGINT) AS grn
          FROM rel),
        offs AS (
          SELECT wk, MIN(grn) AS g0, CAST(COUNT(*) AS BIGINT) AS nk
          FROM ranked GROUP BY 1),
        strat AS (
          SELECT r.wk, MAX(offs.nk) AS nk,
                 CAST(SUM(CASE WHEN wknd THEN 1 ELSE 0 END) AS BIGINT)
                   AS n1k,
                 MAX(offs.nk) -
                   CAST(SUM(CASE WHEN wknd THEN 1 ELSE 0 END) AS BIGINT)
                   AS n2k,
                 CAST(SUM(CASE WHEN wknd THEN grn - offs.g0 + 1 ELSE 0
                   END) AS BIGINT) AS w1k
          FROM ranked r JOIN offs USING (wk)
          GROUP BY r.wk),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
                 SUM(CAST(ROUND(CAST(w1k AS DOUBLE) /
                   CAST(nk + 1 AS DOUBLE), 9) AS DECIMAL(18,9))) AS ve,
                 CAST(SUM(n1k) AS BIGINT) AS sn1,
                 SUM(CAST(ROUND(CAST(n1k AS DOUBLE) *
                   CAST(n2k AS DOUBLE) /
                   (CAST(12 AS DOUBLE) * CAST(nk + 1 AS DOUBLE)), 9)
                   AS DECIMAL(18,9))) AS vvar
          FROM strat)
        SELECT n_strata,
               ROUND(CAST(ve AS DOUBLE), 6) + CAST(0 AS DOUBLE)
                 AS ve_stat,
               ROUND(CAST(sn1 AS DOUBLE) / CAST(2 AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS ve_null_mean,
               ROUND((CAST(ve AS DOUBLE) -
                 CAST(sn1 AS DOUBLE) / CAST(2 AS DOUBLE)) /
                 sqrt(CAST(vvar AS DOUBLE)), 6) + CAST(0 AS DOUBLE)
                 AS ve_z
        FROM agg""")),

    // Directed-graph structure card on the deterministic %997 link
    // graph (the qct construction): full dyad census (mutual /
    // asymmetric / null), edge reciprocity, and Newman's CATEGORICAL
    // assortativity over the node-community attribute (node mod 5) via
    // the exact integer identity r = (E·Σm_ii − Σ rowᵢ·colᵢ) /
    // (E² − Σ rowᵢ·colᵢ) — q7f measures DEGREE mixing; this measures
    // attribute homophily, and the dyad census is the SNA base rate
    // every directed-graph claim needs. All counts are exact BIGINTs.
    "qeg_dyad_census" -> Q(
      fn = (s, dir) => {
        val sres = t(s, dir, "orders")
          .select((col("o_orderkey") % 997).cast("long").as("s")).distinct()
        val edges = sres.select(col("s").as("src"),
          ((col("s") * 31 + 7) % 997).as("dst"))
          .unionByName(sres.select(col("s").as("src"),
            ((col("s") * 17 + 3) % 997).as("dst")))
          .filter(col("src") =!= col("dst"))
          .distinct()
          .localCheckpoint(eager = false)
        val n0 = sres.agg(count(lit(1)).as("n"))
        val recip = edges.join(edges.select(col("dst").as("src"),
          col("src").as("dst")).withColumn("rev", lit(1L)),
          Seq("src", "dst"), "left")
          .agg(count(lit(1)).as("ecnt"),
            sum(coalesce(col("rev"), lit(0L))).as("erecip"))
          .select(col("ecnt"), col("erecip"),
            (col("erecip") / 2).cast("long").as("mutual"),
            (col("ecnt") - col("erecip")).as("asym"))
        val mix = edges
          .select(pmod(col("src"), lit(5L)).as("ci"),
            pmod(col("dst"), lit(5L)).as("cj"))
          .groupBy(col("ci"), col("cj")).agg(count(lit(1)).as("m"))
          .localCheckpoint(eager = false)
        val diag = mix.agg(sum(col("m")).as("ee"),
          sum(when(col("ci") === col("cj"), col("m")).otherwise(0L))
            .as("mii"))
        val rows = mix.groupBy(col("ci")).agg(sum(col("m")).as("ai"))
        val cols2 = mix.groupBy(col("cj")).agg(sum(col("m")).as("bi"))
        val ab = rows.join(cols2, col("ci") === col("cj"))
          .agg(sum(col("ai") * col("bi")).as("sab"))
        n0.crossJoin(broadcast(recip)).crossJoin(broadcast(diag))
          .crossJoin(broadcast(ab))
          .select(col("n").as("n_nodes"), col("ecnt").as("n_edges"),
            col("mutual"), col("asym"),
            (col("n") * (col("n") - 1) / 2 - col("mutual") - col("asym"))
              .cast("long").as("null_dyads"),
            round(col("erecip").cast("double") / col("ecnt").cast("double"),
              6).as("reciprocity"),
            round((col("ee").cast("double") * col("mii").cast("double") -
              col("sab").cast("double")) /
              (col("ee").cast("double") * col("ee").cast("double") -
                col("sab").cast("double")), 6).as("attr_assortativity"))
      },
      oracle = Some("""
        WITH sres AS (
          SELECT DISTINCT CAST(o_orderkey % 997 AS BIGINT) AS s
          FROM orders),
        edges AS MATERIALIZED (
          SELECT DISTINCT src, dst FROM (
            SELECT s AS src, (s * 31 + 7) % 997 AS dst FROM sres
            UNION ALL
            SELECT s AS src, (s * 17 + 3) % 997 AS dst FROM sres)
          WHERE src <> dst),
        n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM sres),
        recip AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS ecnt,
                 CAST(SUM(CASE WHEN r.src IS NOT NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS erecip
          FROM edges e LEFT JOIN edges r
            ON e.src = r.dst AND e.dst = r.src),
        recip2 AS (
          SELECT ecnt, erecip, erecip // 2 AS mutual,
                 ecnt - erecip AS asym
          FROM recip),
        mix AS MATERIALIZED (
          SELECT src % 5 AS ci, dst % 5 AS cj,
                 CAST(COUNT(*) AS BIGINT) AS m
          FROM edges GROUP BY 1, 2),
        diag AS (
          SELECT CAST(SUM(m) AS BIGINT) AS ee,
                 CAST(SUM(CASE WHEN ci = cj THEN m ELSE 0 END) AS BIGINT)
                   AS mii
          FROM mix),
        ab AS (
          SELECT CAST(SUM(ai * bi) AS BIGINT) AS sab
          FROM (SELECT ci, CAST(SUM(m) AS BIGINT) AS ai
                FROM mix GROUP BY 1) r
          JOIN (SELECT cj, CAST(SUM(m) AS BIGINT) AS bi
                FROM mix GROUP BY 1) c ON r.ci = c.cj)
        SELECT n AS n_nodes, ecnt AS n_edges, mutual, asym,
               CAST(n * (n - 1) // 2 - mutual - asym AS BIGINT)
                 AS null_dyads,
               ROUND(CAST(erecip AS DOUBLE) / CAST(ecnt AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS reciprocity,
               ROUND((CAST(ee AS DOUBLE) * CAST(mii AS DOUBLE) -
                 CAST(sab AS DOUBLE)) /
                 (CAST(ee AS DOUBLE) * CAST(ee AS DOUBLE) -
                   CAST(sab AS DOUBLE)), 6) + CAST(0 AS DOUBLE)
                 AS attr_assortativity
        FROM n0 CROSS JOIN recip2 CROSS JOIN diag CROSS JOIN ab""")),

    // Rich-club connectivity curve of the undirected %997 link graph:
    // φ(k) = 2·E_k / (n_k(n_k−1)) over the subgraphs induced by nodes
    // of degree > k for k = 1/2/3 — do the hubs talk to each other
    // more densely than the graph at large (the global density is the
    // k = 0 row)? The hub-interconnection lens that q7f's degree
    // assortativity summarizes to one number and q4s's k-core
    // (cohesion) doesn't ask. Exact integer edge/degree arithmetic
    // end to end.
    "qeh_rich_club" -> Q(
      fn = (s, dir) => {
        val sres = t(s, dir, "orders")
          .select((col("o_orderkey") % 997).cast("long").as("s")).distinct()
        val und = sres.select(col("s").as("a"),
          ((col("s") * 31 + 7) % 997).as("b"))
          .unionByName(sres.select(col("s").as("a"),
            ((col("s") * 17 + 3) % 997).as("b")))
          .filter(col("a") =!= col("b"))
          .select(least(col("a"), col("b")).as("u"),
            greatest(col("a"), col("b")).as("v"))
          .distinct()
          .localCheckpoint(eager = false)
        val deg = und.select(col("u").as("nd"))
          .unionByName(und.select(col("v").as("nd")))
          .groupBy(col("nd")).agg(count(lit(1)).as("dg"))
        val ks = und.sparkSession.range(1)
          .select(explode(array(lit(0L), lit(1L), lit(2L), lit(3L)))
            .as("k"))
        val nodesK = deg.crossJoin(broadcast(ks))
          .filter(col("dg") > col("k"))
          .groupBy(col("k")).agg(count(lit(1)).as("nk"))
        val edgesK = und
          .join(deg.select(col("nd").as("u"), col("dg").as("du")), Seq("u"))
          .join(deg.select(col("nd").as("v"), col("dg").as("dv")), Seq("v"))
          .crossJoin(broadcast(ks.select(col("k").as("k2"))))
          .filter(col("du") > col("k2") && col("dv") > col("k2"))
          .groupBy(col("k2")).agg(count(lit(1)).as("ek"))
        nodesK.join(edgesK, col("k") === col("k2"), "left")
          .select(col("k"), col("nk"),
            coalesce(col("ek"), lit(0L)).as("ek"),
            when(col("nk") > 1,
              round(lit(2.0) * coalesce(col("ek"), lit(0L)).cast("double") /
                (col("nk") * (col("nk") - 1)).cast("double"), 6))
              .as("phi"))
          .orderBy(col("k"))
      },
      oracle = Some("""
        WITH sres AS (
          SELECT DISTINCT CAST(o_orderkey % 997 AS BIGINT) AS s
          FROM orders),
        und AS MATERIALIZED (
          SELECT DISTINCT LEAST(a, b) AS u, GREATEST(a, b) AS v FROM (
            SELECT s AS a, (s * 31 + 7) % 997 AS b FROM sres
            UNION ALL
            SELECT s AS a, (s * 17 + 3) % 997 AS b FROM sres)
          WHERE a <> b),
        deg AS (
          SELECT nd, CAST(COUNT(*) AS BIGINT) AS dg
          FROM (SELECT u AS nd FROM und UNION ALL SELECT v FROM und)
          GROUP BY 1),
        ks AS (SELECT CAST(UNNEST([0, 1, 2, 3]) AS BIGINT) AS k),
        nodesk AS (
          SELECT k, CAST(COUNT(*) AS BIGINT) AS nk
          FROM deg CROSS JOIN ks WHERE dg > k GROUP BY 1),
        edgesk AS (
          SELECT k, CAST(COUNT(*) AS BIGINT) AS ek
          FROM und
          JOIN deg du ON und.u = du.nd
          JOIN deg dv ON und.v = dv.nd
          CROSS JOIN ks
          WHERE du.dg > k AND dv.dg > k
          GROUP BY 1)
        SELECT n.k, n.nk, CAST(COALESCE(e.ek, 0) AS BIGINT) AS ek,
               CASE WHEN n.nk > 1 THEN
                 ROUND(CAST(2 AS DOUBLE) * CAST(COALESCE(e.ek, 0)
                   AS DOUBLE) /
                   CAST(n.nk * (n.nk - 1) AS DOUBLE), 6)
                   + CAST(0 AS DOUBLE)
               END AS phi
        FROM nodesk n LEFT JOIN edgesk e ON n.k = e.k
        ORDER BY n.k""")),

    // Inequality diagnostics card over customer lifetime spend: Palma
    // ratio (top-10% share over bottom-40% share), the S80/S20 quintile
    // ratio, the Lorenz asymmetry coefficient (WHERE the curve bends —
    // two distributions can share a Gini yet differ here), Atkinson's
    // index at ε = 2 (harmonic-mean based, so fully algebraic) and the
    // mean log deviation (Theil-L) — the distribution-shape battery
    // around q6m's single Gini number and q7m's curve points. Exact
    // rank cuts off the spend-ordered running sum (grouped-data
    // convention, no interpolation at the quantile cuts — noted); ln
    // and one harmonic sum are the only float links.
    "qei_inequality_card" -> Q(
      fn = (s, dir) => {
        val spend = t(s, dir, "orders")
          .groupBy(col("o_custkey").as("ck"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("y"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(spend,
          Seq(col("y"), col("ck")), "vr")
        val cum = graft.operators.ScaleOps.globalRunningSum(ranked,
          Seq(col("vr")), col("y"), "cy").localCheckpoint(eager = false)
        val tot = cum.agg(count(lit(1)).as("n"), max(col("cy")).as("ty"))
          .select(col("n"), col("ty").cast("double").as("t"),
            round(col("ty").cast("double") / col("n").cast("double"), 9)
              .as("mu"))
        val cuts = cum.crossJoin(broadcast(tot))
          .agg(first(col("n")).as("n"), first(col("t")).as("t"),
            first(col("mu")).as("mu"),
            max(when(col("vr") === expr("n * 2 div 5"),
              col("cy").cast("double"))).as("c40"),
            max(when(col("vr") === expr("n div 5"),
              col("cy").cast("double"))).as("c20"),
            max(when(col("vr") === expr("n * 4 div 5"),
              col("cy").cast("double"))).as("c80"),
            max(when(col("vr") === expr("n * 9 div 10"),
              col("cy").cast("double"))).as("c90"),
            sum(when(col("y").cast("double") < col("mu"), 1L).otherwise(0L))
              .as("mlt"),
            sum(when(col("y").cast("double") < col("mu"),
              col("y").cast("double")).otherwise(0.0)
              .cast("decimal(28,2)")).as("cmlt"),
            sum(round(lit(1.0) / col("y").cast("double"), 12)
              .cast("decimal(24,12)")).as("sinv"),
            sum(round(log(col("y").cast("double")), 9)
              .cast("decimal(20,9)")).as("slny"))
        cuts.select(col("n"),
          round((col("t") - col("c90")) / col("c40"), 6).as("palma"),
          round((col("t") - col("c80")) / col("c20"), 6).as("s80_s20"),
          round(col("mlt").cast("double") / col("n").cast("double") +
            col("cmlt").cast("double") / col("t"), 6).as("lorenz_asym"),
          round(lit(1.0) -
            (col("n").cast("double") / col("sinv").cast("double")) /
            col("mu"), 6).as("atkinson_2"),
          round(log(col("mu")) -
            col("slny").cast("double") / col("n").cast("double"), 6)
            .as("theil_l"))
      },
      oracle = Some("""
        WITH spend AS (
          SELECT o_custkey AS ck,
                 SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS y
          FROM orders GROUP BY 1),
        r AS (
          SELECT y, ROW_NUMBER() OVER (ORDER BY y, ck) AS vr FROM spend),
        cum AS MATERIALIZED (
          SELECT y, vr,
                 SUM(y) OVER (ORDER BY vr ROWS UNBOUNDED PRECEDING) AS cy
          FROM r),
        tot AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(MAX(cy) AS DOUBLE) AS t,
                 ROUND(CAST(MAX(cy) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
                   9) AS mu
          FROM cum),
        cuts AS (
          SELECT MAX(tot.n) AS n, MAX(tot.t) AS t, MAX(tot.mu) AS mu,
                 MAX(CASE WHEN vr = tot.n * 2 // 5
                   THEN CAST(cy AS DOUBLE) END) AS c40,
                 MAX(CASE WHEN vr = tot.n // 5
                   THEN CAST(cy AS DOUBLE) END) AS c20,
                 MAX(CASE WHEN vr = tot.n * 4 // 5
                   THEN CAST(cy AS DOUBLE) END) AS c80,
                 MAX(CASE WHEN vr = tot.n * 9 // 10
                   THEN CAST(cy AS DOUBLE) END) AS c90,
                 CAST(SUM(CASE WHEN CAST(y AS DOUBLE) < tot.mu THEN 1
                   ELSE 0 END) AS BIGINT) AS mlt,
                 SUM(CAST(CASE WHEN CAST(y AS DOUBLE) < tot.mu
                   THEN CAST(y AS DOUBLE) ELSE CAST(0 AS DOUBLE) END
                   AS DECIMAL(28,2))) AS cmlt,
                 SUM(CAST(ROUND(CAST(1 AS DOUBLE) / CAST(y AS DOUBLE), 12)
                   AS DECIMAL(24,12))) AS sinv,
                 SUM(CAST(ROUND(ln(CAST(y AS DOUBLE)), 9)
                   AS DECIMAL(20,9))) AS slny
          FROM cum CROSS JOIN tot)
        SELECT n,
               ROUND((t - c90) / c40, 6) + CAST(0 AS DOUBLE) AS palma,
               ROUND((t - c80) / c20, 6) + CAST(0 AS DOUBLE) AS s80_s20,
               ROUND(CAST(mlt AS DOUBLE) / CAST(n AS DOUBLE) +
                 CAST(cmlt AS DOUBLE) / t, 6) + CAST(0 AS DOUBLE)
                 AS lorenz_asym,
               ROUND(CAST(1 AS DOUBLE) -
                 (CAST(n AS DOUBLE) / CAST(sinv AS DOUBLE)) / mu, 6)
                 + CAST(0 AS DOUBLE) AS atkinson_2,
               ROUND(ln(mu) - CAST(slny AS DOUBLE) / CAST(n AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS theil_l
        FROM cuts""")),

    // Covariate-balance table ("love plot" data) comparing weekend vs
    // weekday events on three covariates — value, hour-of-day, and the
    // acting user's total activity — via the standardized mean
    // difference SMD = (m₁-m₀)/sqrt((s₁²+s₀²)/2): THE causal-inference
    // pre-check (|SMD| < 0.1 ⇒ balanced) that qbk's diff-in-diff and
    // q7b's CUPED silently assume. One long-format moment pass serves
    // all covariates; moments ride round-6 DECIMAL sums.
    "qej_covariate_balance" -> Q(
      fn = (s, dir) => {
        val ua = t(s, dir, "events")
          .groupBy(col("user_id")).agg(count(lit(1)).as("uact"))
        val base = t(s, dir, "events")
          .join(ua, Seq("user_id"))
          .select(
            (pmod((unix_millis(col("ts")) / lit(86400000L)).cast("long"),
              lit(7L)) >= 5).as("wknd"),
            coalesce(col("value"), lit(0.0)).cast("decimal(18,2)")
              .cast("double").as("c_value"),
            pmod((unix_millis(col("ts")) / lit(3600000L)).cast("long"),
              lit(24L)).cast("double").as("c_hour"),
            col("uact").cast("double").as("c_uact"))
        val long = base.select(col("wknd"), lit("1_value").as("cov"),
          col("c_value").as("x"))
          .unionByName(base.select(col("wknd"), lit("2_hour").as("cov"),
            col("c_hour").as("x")))
          .unionByName(base.select(col("wknd"), lit("3_user_activity")
            .as("cov"), col("c_uact").as("x")))
          .localCheckpoint(eager = false)
        val gs = long.groupBy(col("cov"), col("wknd"))
          .agg(count(lit(1)).as("ni"),
            sum(col("x").cast("decimal(28,2)")).as("sxd"))
          .select(col("cov"), col("wknd"), col("ni"),
            round(col("sxd").cast("double") / col("ni").cast("double"), 9)
              .as("mi"))
        val mom = long.join(gs, Seq("cov", "wknd"))
          .select(col("cov"), col("wknd"), col("ni"),
            (col("x") - col("mi")).as("cx"))
          .groupBy(col("cov"), col("wknd"))
          .agg(first(col("ni")).as("ni"),
            sum(round(col("cx") * col("cx"), 6).cast("decimal(28,6)"))
              .as("ssd"))
          .select(col("cov"), col("wknd"), col("ni"),
            round(col("ssd").cast("double") / (col("ni") - 1).cast("double"),
              9).as("s2"))
        val wide = gs.join(mom.select(col("cov"), col("wknd"), col("s2")),
          Seq("cov", "wknd"))
          .groupBy(col("cov"))
          .agg(max(when(col("wknd"), col("mi"))).as("m1"),
            max(when(col("wknd"), col("s2"))).as("v1"),
            max(when(!col("wknd"), col("mi"))).as("m0"),
            max(when(!col("wknd"), col("s2"))).as("v0"))
        wide.select(col("cov").as("covariate"),
          round(col("m1"), 6).as("mean_wknd"),
          round(col("m0"), 6).as("mean_wkdy"),
          round((col("m1") - col("m0")) /
            sqrt((col("v1") + col("v0")) / lit(2.0)), 6).as("smd"),
          when(abs((col("m1") - col("m0")) /
            sqrt((col("v1") + col("v0")) / lit(2.0))) < 0.1, lit("yes"))
            .otherwise(lit("no")).as("balanced"))
          .orderBy(col("covariate"))
      },
      oracle = Some("""
        WITH ua AS (
          SELECT user_id, CAST(COUNT(*) AS BIGINT) AS uact
          FROM events GROUP BY 1),
        base AS (
          SELECT ((CAST(epoch_ms(ts) // 86400000 AS BIGINT)) % 7) >= 5
                   AS wknd,
                 CAST(CAST(COALESCE(value, 0) AS DECIMAL(18,2)) AS DOUBLE)
                   AS c_value,
                 CAST((epoch_ms(ts) // 3600000) % 24 AS DOUBLE) AS c_hour,
                 CAST(uact AS DOUBLE) AS c_uact
          FROM events JOIN ua USING (user_id)),
        long_f AS MATERIALIZED (
          SELECT wknd, '1_value' AS cov, c_value AS x FROM base
          UNION ALL
          SELECT wknd, '2_hour' AS cov, c_hour AS x FROM base
          UNION ALL
          SELECT wknd, '3_user_activity' AS cov, c_uact AS x FROM base),
        gs AS (
          SELECT cov, wknd, CAST(COUNT(*) AS BIGINT) AS ni,
                 ROUND(CAST(SUM(CAST(x AS DECIMAL(28,2))) AS DOUBLE) /
                   CAST(COUNT(*) AS DOUBLE), 9) AS mi
          FROM long_f GROUP BY 1, 2),
        mom AS (
          SELECT l.cov, l.wknd, MAX(gs.ni) AS ni,
                 ROUND(CAST(SUM(CAST(ROUND((x - gs.mi) * (x - gs.mi), 6)
                   AS DECIMAL(28,6))) AS DOUBLE) /
                   CAST(MAX(gs.ni) - 1 AS DOUBLE), 9) AS s2
          FROM long_f l JOIN gs ON l.cov = gs.cov AND l.wknd = gs.wknd
          GROUP BY l.cov, l.wknd),
        wide AS (
          SELECT gs.cov,
                 MAX(CASE WHEN gs.wknd THEN mi END) AS m1,
                 MAX(CASE WHEN gs.wknd THEN s2 END) AS v1,
                 MAX(CASE WHEN NOT gs.wknd THEN mi END) AS m0,
                 MAX(CASE WHEN NOT gs.wknd THEN s2 END) AS v0
          FROM gs JOIN mom ON gs.cov = mom.cov AND gs.wknd = mom.wknd
          GROUP BY gs.cov)
        SELECT cov AS covariate,
               ROUND(m1, 6) + CAST(0 AS DOUBLE) AS mean_wknd,
               ROUND(m0, 6) + CAST(0 AS DOUBLE) AS mean_wkdy,
               ROUND((m1 - m0) /
                 sqrt((v1 + v0) / CAST(2 AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS smd,
               CASE WHEN ABS((m1 - m0) /
                 sqrt((v1 + v0) / CAST(2 AS DOUBLE))) <
                 CAST(0.1 AS DOUBLE) THEN 'yes' ELSE 'no' END AS balanced
        FROM wide ORDER BY covariate""")),

    // Epidemiological risk-measure card for "does the weekend phase
    // change purchase behavior": risk ratio, odds ratio, risk
    // difference, attributable fraction in the exposed, population
    // attributable fraction, number needed to "treat", and
    // VanderWeele's E-value — the sensitivity bound saying how strong
    // an unmeasured confounder would have to be to explain the
    // observed RR away. Every measure is a raw ratio of four exact
    // BIGINT cells; the E-value's only irrational link is one sqrt,
    // branch taken on RR vs 1 deterministically.
    "qek_risk_measures" -> Q(
      fn = (s, dir) => {
        val e = t(s, dir, "events")
          .select((pmod((unix_millis(col("ts")) / lit(86400000L))
            .cast("long"), lit(7L)) >= 5).as("wknd"),
            (col("event_type") === "purchase").as("pur"))
        val cells = e.agg(
          sum(when(col("wknd") && col("pur"), 1L).otherwise(0L)).as("a"),
          sum(when(col("wknd") && !col("pur"), 1L).otherwise(0L)).as("b"),
          sum(when(!col("wknd") && col("pur"), 1L).otherwise(0L)).as("c"),
          sum(when(!col("wknd") && !col("pur"), 1L).otherwise(0L)).as("d"))
        val pre = cells.select(col("a"), col("b"), col("c"), col("d"),
          (col("a").cast("double") / (col("a") + col("b")).cast("double"))
            .as("p1"),
          (col("c").cast("double") / (col("c") + col("d")).cast("double"))
            .as("p0"),
          ((col("a") + col("c")).cast("double") /
            (col("a") + col("b") + col("c") + col("d")).cast("double"))
            .as("pp"))
          .withColumn("rr", col("p1") / col("p0"))
          .withColumn("rrstar",
            when(col("rr") >= 1.0, col("rr")).otherwise(lit(1.0) / col("rr")))
        pre.select(col("a"), col("b"), col("c"), col("d"),
          round(col("rr"), 6).as("risk_ratio"),
          round(col("a").cast("double") * col("d").cast("double") /
            (col("b").cast("double") * col("c").cast("double")), 6)
            .as("odds_ratio"),
          round(col("p1") - col("p0"), 6).as("risk_diff"),
          round((col("rr") - lit(1.0)) / col("rr"), 6).as("af_exposed"),
          round((col("pp") - col("p0")) / col("pp"), 6).as("paf"),
          round(lit(1.0) / abs(col("p1") - col("p0")), 6).as("nnt"),
          round(col("rrstar") +
            sqrt(col("rrstar") * (col("rrstar") - lit(1.0))), 6)
            .as("e_value"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT ((CAST(epoch_ms(ts) // 86400000 AS BIGINT)) % 7) >= 5
                   AS wknd,
                 event_type = 'purchase' AS pur
          FROM events),
        cells AS (
          SELECT CAST(SUM(CASE WHEN wknd AND pur THEN 1 ELSE 0 END)
                   AS BIGINT) AS a,
                 CAST(SUM(CASE WHEN wknd AND NOT pur THEN 1 ELSE 0 END)
                   AS BIGINT) AS b,
                 CAST(SUM(CASE WHEN NOT wknd AND pur THEN 1 ELSE 0 END)
                   AS BIGINT) AS c,
                 CAST(SUM(CASE WHEN NOT wknd AND NOT pur THEN 1 ELSE 0
                   END) AS BIGINT) AS d
          FROM e),
        pre AS (
          SELECT a, b, c, d,
                 CAST(a AS DOUBLE) / CAST(a + b AS DOUBLE) AS p1,
                 CAST(c AS DOUBLE) / CAST(c + d AS DOUBLE) AS p0,
                 CAST(a + c AS DOUBLE) / CAST(a + b + c + d AS DOUBLE)
                   AS pp
          FROM cells),
        pre2 AS (
          SELECT *, p1 / p0 AS rr FROM pre),
        pre3 AS (
          SELECT *,
                 CASE WHEN rr >= CAST(1 AS DOUBLE) THEN rr
                      ELSE CAST(1 AS DOUBLE) / rr END AS rrstar
          FROM pre2)
        SELECT a, b, c, d,
               ROUND(rr, 6) + CAST(0 AS DOUBLE) AS risk_ratio,
               ROUND(CAST(a AS DOUBLE) * CAST(d AS DOUBLE) /
                 (CAST(b AS DOUBLE) * CAST(c AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS odds_ratio,
               ROUND(p1 - p0, 6) + CAST(0 AS DOUBLE) AS risk_diff,
               ROUND((rr - CAST(1 AS DOUBLE)) / rr, 6)
                 + CAST(0 AS DOUBLE) AS af_exposed,
               ROUND((pp - p0) / pp, 6) + CAST(0 AS DOUBLE) AS paf,
               ROUND(CAST(1 AS DOUBLE) / ABS(p1 - p0), 6)
                 + CAST(0 AS DOUBLE) AS nnt,
               ROUND(rrstar + sqrt(rrstar * (rrstar - CAST(1 AS DOUBLE))),
                 6) + CAST(0 AS DOUBLE) AS e_value
        FROM pre3""")),

    // Graded ranking-evaluation metrics for "activity predicts
    // conversion": users ranked by total activity (desc, uid tiebreak),
    // relevance = made a purchase — average precision (the PR-curve
    // area), R-precision, and DCG/NDCG@20 with the 1/log2(1+i)
    // discount — the IR metric battery beyond q8a's hit-rate@k/MRR
    // (those score ONE hit; AP and NDCG score the whole ranking).
    // Ranks and precision numerators are exact integers off the global
    // running sum of relevance; ln is the only float link.
    "qel_ranking_metrics" -> Q(
      fn = (s, dir) => {
        val users = t(s, dir, "events")
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("act"),
            max(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("rel"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(
          users.select((-col("act")).as("negact"), col("user_id"),
            col("rel")),
          Seq(col("negact"), col("user_id")), "i")
        val cum = graft.operators.ScaleOps.globalRunningSum(ranked,
          Seq(col("i")), col("rel"), "hits").localCheckpoint(eager = false)
        val tot = cum.agg(count(lit(1)).as("n"), sum(col("rel")).as("npos"))
        val ap = cum.crossJoin(broadcast(tot))
          .agg(first(col("n")).as("n"), first(col("npos")).as("npos"),
            sum(when(col("rel") === 1,
              round(col("hits").cast("double") / col("i").cast("double"), 9))
              .otherwise(0.0).cast("decimal(18,9)")).as("apd"),
            max(when(col("i") === col("npos"), col("hits"))).as("rprec_hits"),
            sum(when(col("i") <= 20,
              round(col("rel").cast("double") /
                (log((col("i") + 1).cast("double")) / log(lit(2.0))), 9))
              .otherwise(0.0).cast("decimal(18,9)")).as("dcgd"),
            sum(when(col("i") <= 20,
              round(lit(1.0) /
                (log((col("i") + 1).cast("double")) / log(lit(2.0))), 9))
              .otherwise(0.0).cast("decimal(18,9)")).as("idcgd"))
        ap.select(col("n").as("n_users"), col("npos").as("n_converters"),
          round(col("apd").cast("double") / col("npos").cast("double"), 6)
            .as("avg_precision"),
          round(col("rprec_hits").cast("double") /
            col("npos").cast("double"), 6).as("r_precision"),
          round(col("dcgd").cast("double"), 6).as("dcg_20"),
          round(col("dcgd").cast("double") / col("idcgd").cast("double"), 6)
            .as("ndcg_20"))
      },
      oracle = Some("""
        WITH users AS (
          SELECT user_id, CAST(COUNT(*) AS BIGINT) AS act,
                 CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                   END) AS BIGINT) AS rel
          FROM events GROUP BY 1),
        ranked AS (
          SELECT rel, CAST(ROW_NUMBER() OVER (ORDER BY -act, user_id)
            AS BIGINT) AS i
          FROM users),
        cum AS MATERIALIZED (
          SELECT i, rel,
                 CAST(SUM(rel) OVER (ORDER BY i ROWS UNBOUNDED PRECEDING)
                   AS BIGINT) AS hits
          FROM ranked),
        tot AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(rel) AS BIGINT) AS npos
          FROM cum),
        ap AS (
          SELECT MAX(tot.n) AS n, MAX(tot.npos) AS npos,
                 SUM(CAST(CASE WHEN rel = 1 THEN
                   ROUND(CAST(hits AS DOUBLE) / CAST(i AS DOUBLE), 9)
                   ELSE CAST(0 AS DOUBLE) END AS DECIMAL(18,9))) AS apd,
                 MAX(CASE WHEN i = tot.npos THEN hits END) AS rprec_hits,
                 SUM(CAST(CASE WHEN i <= 20 THEN
                   ROUND(CAST(rel AS DOUBLE) /
                     (ln(CAST(i + 1 AS DOUBLE)) /
                      ln(CAST(2 AS DOUBLE))), 9)
                   ELSE CAST(0 AS DOUBLE) END AS DECIMAL(18,9))) AS dcgd,
                 SUM(CAST(CASE WHEN i <= 20 THEN
                   ROUND(CAST(1 AS DOUBLE) /
                     (ln(CAST(i + 1 AS DOUBLE)) /
                      ln(CAST(2 AS DOUBLE))), 9)
                   ELSE CAST(0 AS DOUBLE) END AS DECIMAL(18,9))) AS idcgd
          FROM cum CROSS JOIN tot)
        SELECT n AS n_users, npos AS n_converters,
               ROUND(CAST(apd AS DOUBLE) / CAST(npos AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS avg_precision,
               ROUND(CAST(rprec_hits AS DOUBLE) / CAST(npos AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS r_precision,
               ROUND(CAST(dcgd AS DOUBLE), 6) + CAST(0 AS DOUBLE)
                 AS dcg_20,
               ROUND(CAST(dcgd AS DOUBLE) / CAST(idcgd AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS ndcg_20
        FROM ap""")),

    // Extreme-value tail-index estimator comparison on order values:
    // Pickands (pure order-statistic ratio through one ln), the
    // Dekkers-Einmahl-de Haan moment estimator (mean and mean-square
    // log excesses over the top-k threshold — valid for ALL tail
    // regimes where qb5's Hill assumes heavy tails), and the Hill
    // replay on the same threshold for contrast. Order statistics are
    // exact global ranks; log excesses ride round-9 DECIMAL sums.
    "qem_tail_estimators" -> Q(
      fn = (s, dir) => {
        val o = t(s, dir, "orders")
          .select(col("o_totalprice").cast("decimal(18,2)").as("y"),
            col("o_orderkey").as("okey"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(
          o.select((-col("y")).as("negy"), col("y"), col("okey")),
          Seq(col("negy"), col("okey")), "i").localCheckpoint(eager = false)
        val n0 = ranked.agg(count(lit(1)).as("n"))
          .select(col("n"), expr("n div 100").as("k"))
        val picks = ranked.crossJoin(broadcast(n0))
          .agg(first(col("n")).as("n"), first(col("k")).as("k"),
            max(when(col("i") === col("k"), col("y").cast("double")))
              .as("xk"),
            max(when(col("i") === col("k") * 2, col("y").cast("double")))
              .as("x2k"),
            max(when(col("i") === col("k") * 4, col("y").cast("double")))
              .as("x4k"),
            max(when(col("i") === col("k") + 1, col("y").cast("double")))
              .as("xk1"))
        val excess = ranked.crossJoin(broadcast(n0))
          .filter(col("i") <= col("k"))
          .crossJoin(broadcast(picks.select(col("xk1"))))
          .select(round(log(col("y").cast("double") / col("xk1")), 9)
            .as("le"))
          .agg(count(lit(1)).as("kk"),
            sum(col("le").cast("decimal(18,9)")).as("m1d"),
            sum(round(col("le") * col("le"), 9).cast("decimal(18,9)"))
              .as("m2d"))
          .select(col("kk"),
            round(col("m1d").cast("double") / col("kk").cast("double"), 9)
              .as("m1"),
            round(col("m2d").cast("double") / col("kk").cast("double"), 9)
              .as("m2"))
        picks.crossJoin(broadcast(excess))
          .select(col("n"), col("k"),
            round(log((col("xk") - col("x2k")) /
              (col("x2k") - col("x4k"))) / log(lit(2.0)), 6)
              .as("pickands_xi"),
            round(col("m1") + lit(1.0) - lit(0.5) /
              (lit(1.0) - col("m1") * col("m1") / col("m2")), 6)
              .as("dedh_moment_xi"),
            round(col("m1"), 6).as("hill_xi"))
      },
      oracle = Some("""
        WITH o AS (
          SELECT CAST(o_totalprice AS DECIMAL(18,2)) AS y,
                 o_orderkey AS okey
          FROM orders),
        ranked AS MATERIALIZED (
          SELECT y, CAST(ROW_NUMBER() OVER (ORDER BY -y, okey) AS BIGINT)
            AS i
          FROM o),
        n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                      CAST(COUNT(*) // 100 AS BIGINT) AS k
               FROM ranked),
        picks AS (
          SELECT MAX(n0.n) AS n, MAX(n0.k) AS k,
                 MAX(CASE WHEN i = n0.k THEN CAST(y AS DOUBLE) END) AS xk,
                 MAX(CASE WHEN i = n0.k * 2 THEN CAST(y AS DOUBLE) END)
                   AS x2k,
                 MAX(CASE WHEN i = n0.k * 4 THEN CAST(y AS DOUBLE) END)
                   AS x4k,
                 MAX(CASE WHEN i = n0.k + 1 THEN CAST(y AS DOUBLE) END)
                   AS xk1
          FROM ranked CROSS JOIN n0),
        excess AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS kk,
                 ROUND(CAST(SUM(CAST(ROUND(ln(CAST(y AS DOUBLE) /
                     picks.xk1), 9) AS DECIMAL(18,9))) AS DOUBLE) /
                   CAST(COUNT(*) AS DOUBLE), 9) AS m1,
                 ROUND(CAST(SUM(CAST(ROUND(
                     ROUND(ln(CAST(y AS DOUBLE) / picks.xk1), 9) *
                     ROUND(ln(CAST(y AS DOUBLE) / picks.xk1), 9), 9)
                     AS DECIMAL(18,9))) AS DOUBLE) /
                   CAST(COUNT(*) AS DOUBLE), 9) AS m2
          FROM ranked CROSS JOIN n0 CROSS JOIN picks
          WHERE i <= n0.k)
        SELECT n, k,
               ROUND(ln((xk - x2k) / (x2k - x4k)) /
                 ln(CAST(2 AS DOUBLE)), 6) + CAST(0 AS DOUBLE)
                 AS pickands_xi,
               ROUND(m1 + CAST(1 AS DOUBLE) - CAST(0.5 AS DOUBLE) /
                 (CAST(1 AS DOUBLE) - m1 * m1 / m2), 6)
                 + CAST(0 AS DOUBLE) AS dedh_moment_xi,
               ROUND(m1, 6) + CAST(0 AS DOUBLE) AS hill_xi
        FROM picks CROSS JOIN excess""")),

    // Oaxaca-Blinder decomposition of the spend gap between BUILDING
    // and AUTOMOBILE market segments: how much of the mean-spend
    // difference is EXPLAINED by account-balance composition (the
    // endowment term β_B·(x̄_A - x̄_B)) vs unexplained (coefficients +
    // intercept) — the standard wage-gap econometrics qbk's
    // diff-in-diff can't produce without a time dimension. Per-group
    // simple OLS by the qcw moment recipe; the endowment product
    // multiplies 9-grid values at round 9 (rule-15 closing note);
    // explained + unexplained ≡ gap by construction.
    "qen_oaxaca_blinder" -> Q(
      fn = (s, dir) => {
        val spend = t(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("sp"))
        val base = t(s, dir, "customer")
          .filter(col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
          .join(spend, col("c_custkey") === col("o_custkey"))
          .select(when(col("c_mktsegment") === "BUILDING", lit("a"))
            .otherwise(lit("b")).as("g"),
            (col("sp") / lit(1000)).cast("decimal(18,5)").cast("double")
              .as("y"),
            (col("c_acctbal").cast("decimal(12,2)") / lit(1000))
              .cast("decimal(12,5)").cast("double").as("x"))
          .localCheckpoint(eager = false)
        val gs = base.groupBy(col("g"))
          .agg(count(lit(1)).as("ni"),
            sum(col("y").cast("decimal(28,5)")).as("sy"),
            sum(col("x").cast("decimal(28,5)")).as("sx"))
          .select(col("g"), col("ni"),
            round(col("sy").cast("double") / col("ni").cast("double"), 9)
              .as("my"),
            round(col("sx").cast("double") / col("ni").cast("double"), 9)
              .as("mx"))
        val mom = base.join(gs, Seq("g"))
          .select(col("g"),
            (col("x") - col("mx")).as("cx"), (col("y") - col("my")).as("cy"))
          .groupBy(col("g"))
          .agg(sum(round(col("cx") * col("cx"), 6).cast("decimal(28,6)"))
            .as("sxx"),
            sum(round(col("cx") * col("cy"), 6).cast("decimal(28,6)"))
              .as("sxy"))
          .select(col("g"),
            round(col("sxy").cast("double") / col("sxx").cast("double"), 9)
              .as("beta"))
        val wide = gs.join(mom, Seq("g")).groupBy()
          .agg(max(when(col("g") === "a", col("ni"))).as("na"),
            max(when(col("g") === "a", col("my"))).as("mya"),
            max(when(col("g") === "a", col("mx"))).as("mxa"),
            max(when(col("g") === "a", col("beta"))).as("ba"),
            max(when(col("g") === "b", col("ni"))).as("nb"),
            max(when(col("g") === "b", col("my"))).as("myb"),
            max(when(col("g") === "b", col("mx"))).as("mxb"),
            max(when(col("g") === "b", col("beta"))).as("bb"))
        wide.select(col("na"), col("nb"),
          round(col("mya") - col("myb"), 6).as("gap_k"),
          round(round(col("bb") * (col("mxa") - col("mxb")), 9), 6)
            .as("explained_k"),
          round((col("mya") - col("myb")) -
            round(col("bb") * (col("mxa") - col("mxb")), 9), 6)
            .as("unexplained_k"),
          round(round(col("bb") * (col("mxa") - col("mxb")), 9) /
            (col("mya") - col("myb")), 6).as("explained_share"),
          round(col("ba"), 6).as("beta_building"),
          round(col("bb"), 6).as("beta_automobile"))
      },
      oracle = Some("""
        WITH spend AS (
          SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            AS sp
          FROM orders GROUP BY 1),
        base AS MATERIALIZED (
          SELECT CASE WHEN c_mktsegment = 'BUILDING' THEN 'a' ELSE 'b'
                   END AS g,
                 CAST(CAST(sp / 1000 AS DECIMAL(18,5)) AS DOUBLE) AS y,
                 CAST(CAST(CAST(c_acctbal AS DECIMAL(12,2)) / 1000
                   AS DECIMAL(12,5)) AS DOUBLE) AS x
          FROM customer JOIN spend ON c_custkey = o_custkey
          WHERE c_mktsegment IN ('BUILDING', 'AUTOMOBILE')),
        gs AS (
          SELECT g, CAST(COUNT(*) AS BIGINT) AS ni,
                 ROUND(CAST(SUM(CAST(y AS DECIMAL(28,5))) AS DOUBLE) /
                   CAST(COUNT(*) AS DOUBLE), 9) AS my,
                 ROUND(CAST(SUM(CAST(x AS DECIMAL(28,5))) AS DOUBLE) /
                   CAST(COUNT(*) AS DOUBLE), 9) AS mx
          FROM base GROUP BY 1),
        mom AS (
          SELECT b.g,
                 ROUND(CAST(SUM(CAST(ROUND((x - gs.mx) * (y - gs.my), 6)
                     AS DECIMAL(28,6))) AS DOUBLE) /
                   CAST(SUM(CAST(ROUND((x - gs.mx) * (x - gs.mx), 6)
                     AS DECIMAL(28,6))) AS DOUBLE), 9) AS beta
          FROM base b JOIN gs ON b.g = gs.g GROUP BY b.g),
        wide AS (
          SELECT MAX(CASE WHEN gs.g = 'a' THEN ni END) AS na,
                 MAX(CASE WHEN gs.g = 'a' THEN my END) AS mya,
                 MAX(CASE WHEN gs.g = 'a' THEN mx END) AS mxa,
                 MAX(CASE WHEN gs.g = 'a' THEN beta END) AS ba,
                 MAX(CASE WHEN gs.g = 'b' THEN ni END) AS nb,
                 MAX(CASE WHEN gs.g = 'b' THEN my END) AS myb,
                 MAX(CASE WHEN gs.g = 'b' THEN mx END) AS mxb,
                 MAX(CASE WHEN gs.g = 'b' THEN beta END) AS bb
          FROM gs JOIN mom ON gs.g = mom.g)
        SELECT na, nb,
               ROUND(mya - myb, 6) + CAST(0 AS DOUBLE) AS gap_k,
               ROUND(ROUND(bb * (mxa - mxb), 9), 6) + CAST(0 AS DOUBLE)
                 AS explained_k,
               ROUND((mya - myb) - ROUND(bb * (mxa - mxb), 9), 6)
                 + CAST(0 AS DOUBLE) AS unexplained_k,
               ROUND(ROUND(bb * (mxa - mxb), 9) / (mya - myb), 6)
                 + CAST(0 AS DOUBLE) AS explained_share,
               ROUND(ba, 6) + CAST(0 AS DOUBLE) AS beta_building,
               ROUND(bb, 6) + CAST(0 AS DOUBLE) AS beta_automobile
        FROM wide""")),

    // Classification-metrics card for the deterministic
    // "above-median-activity user purchases in the FINAL week" rule
    // (ever-purchased is degenerate — nearly every user qualifies): Matthews correlation
    // (the single balanced summary), F1 and F2, balanced accuracy,
    // informedness (Youden's J at THIS threshold — qc2 searches the
    // optimal one) and markedness — the q5z confusion-matrix
    // evaluation's missing chance-corrected layer. Median activity is
    // an exact order statistic; every metric is a raw ratio of four
    // exact BIGINT cells (all MCC products stay far below 2^53).
    "qeo_classification_card" -> Q(
      fn = (s, dir) => {
        val ev0 = t(s, dir, "events")
          .withColumn("day", (unix_millis(col("ts")) / lit(86400000L))
            .cast("long"))
        val users = ev0.crossJoin(broadcast(ev0.agg(min(col("day"))
          .as("d0"))))
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("act"),
            max(when(col("event_type") === "purchase" &&
              col("day") - col("d0") >= 23, 1L).otherwise(0L)).as("y"))
        val byAct = graft.operators.ScaleOps.globalRowNumber(users,
          Seq(col("act"), col("user_id")), "vr").localCheckpoint(eager = false)
        val n0 = byAct.agg(count(lit(1)).as("n"))
        val med = byAct.crossJoin(broadcast(n0))
          .filter(col("vr") ===
            floor((col("n") + 1).cast("double") / lit(2.0)).cast("long"))
          .select(col("act").as("medact"))
        val cells = byAct.crossJoin(broadcast(med))
          .agg(
            sum(when(col("act") > col("medact") && col("y") === 1, 1L)
              .otherwise(0L)).as("tp"),
            sum(when(col("act") > col("medact") && col("y") === 0, 1L)
              .otherwise(0L)).as("fp"),
            sum(when(col("act") <= col("medact") && col("y") === 1, 1L)
              .otherwise(0L)).as("fn"),
            sum(when(col("act") <= col("medact") && col("y") === 0, 1L)
              .otherwise(0L)).as("tn"))
        val pre = cells.select(col("tp"), col("fp"), col("fn"), col("tn"),
          (col("tp").cast("double") / (col("tp") + col("fn")).cast("double"))
            .as("tpr"),
          (col("tn").cast("double") / (col("tn") + col("fp")).cast("double"))
            .as("tnr"),
          (col("tp").cast("double") / (col("tp") + col("fp")).cast("double"))
            .as("ppv"),
          (col("tn").cast("double") / (col("tn") + col("fn")).cast("double"))
            .as("npv"))
        pre.select(col("tp"), col("fp"), col("fn"), col("tn"),
          round((col("tp").cast("double") * col("tn").cast("double") -
            col("fp").cast("double") * col("fn").cast("double")) /
            sqrt((col("tp") + col("fp")).cast("double") *
              (col("tp") + col("fn")).cast("double") *
              (col("tn") + col("fp")).cast("double") *
              (col("tn") + col("fn")).cast("double")), 6).as("mcc"),
          round(lit(2.0) * col("tp").cast("double") /
            (lit(2.0) * col("tp").cast("double") +
              col("fp").cast("double") + col("fn").cast("double")), 6)
            .as("f1"),
          round(lit(5.0) * col("tp").cast("double") /
            (lit(5.0) * col("tp").cast("double") +
              lit(4.0) * col("fn").cast("double") +
              col("fp").cast("double")), 6).as("f2"),
          round((col("tpr") + col("tnr")) / lit(2.0), 6)
            .as("balanced_acc"),
          round(col("tpr") + col("tnr") - lit(1.0), 6).as("informedness"),
          round(col("ppv") + col("npv") - lit(1.0), 6).as("markedness"))
      },
      oracle = Some("""
        WITH e0 AS (
          SELECT user_id, event_type,
                 CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day
          FROM events),
        d0 AS (SELECT MIN(day) AS d0 FROM e0),
        users AS (
          SELECT user_id, CAST(COUNT(*) AS BIGINT) AS act,
                 CAST(MAX(CASE WHEN event_type = 'purchase'
                   AND day - d0.d0 >= 23 THEN 1 ELSE 0 END) AS BIGINT)
                   AS y
          FROM e0 CROSS JOIN d0 GROUP BY 1),
        r AS (
          SELECT act, y, ROW_NUMBER() OVER (ORDER BY act, user_id) AS vr
          FROM users),
        n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM r),
        med AS (
          SELECT act AS medact FROM r CROSS JOIN n0
          WHERE vr = (n + 1) // 2),
        cells AS (
          SELECT CAST(SUM(CASE WHEN act > medact AND y = 1 THEN 1 ELSE 0
                   END) AS BIGINT) AS tp,
                 CAST(SUM(CASE WHEN act > medact AND y = 0 THEN 1 ELSE 0
                   END) AS BIGINT) AS fp,
                 CAST(SUM(CASE WHEN act <= medact AND y = 1 THEN 1 ELSE 0
                   END) AS BIGINT) AS fn,
                 CAST(SUM(CASE WHEN act <= medact AND y = 0 THEN 1 ELSE 0
                   END) AS BIGINT) AS tn
          FROM r CROSS JOIN med),
        pre AS (
          SELECT tp, fp, fn, tn,
                 CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) AS tpr,
                 CAST(tn AS DOUBLE) / CAST(tn + fp AS DOUBLE) AS tnr,
                 CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) AS ppv,
                 CAST(tn AS DOUBLE) / CAST(tn + fn AS DOUBLE) AS npv
          FROM cells)
        SELECT tp, fp, fn, tn,
               ROUND((CAST(tp AS DOUBLE) * CAST(tn AS DOUBLE) -
                 CAST(fp AS DOUBLE) * CAST(fn AS DOUBLE)) /
                 sqrt(CAST(tp + fp AS DOUBLE) * CAST(tp + fn AS DOUBLE) *
                   CAST(tn + fp AS DOUBLE) * CAST(tn + fn AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS mcc,
               ROUND(CAST(2 AS DOUBLE) * CAST(tp AS DOUBLE) /
                 (CAST(2 AS DOUBLE) * CAST(tp AS DOUBLE) +
                   CAST(fp AS DOUBLE) + CAST(fn AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS f1,
               ROUND(CAST(5 AS DOUBLE) * CAST(tp AS DOUBLE) /
                 (CAST(5 AS DOUBLE) * CAST(tp AS DOUBLE) +
                   CAST(4 AS DOUBLE) * CAST(fn AS DOUBLE) +
                   CAST(fp AS DOUBLE)), 6) + CAST(0 AS DOUBLE) AS f2,
               ROUND((tpr + tnr) / CAST(2 AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS balanced_acc,
               ROUND(tpr + tnr - CAST(1 AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS informedness,
               ROUND(ppv + npv - CAST(1 AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS markedness
        FROM pre""")),

    // Cost-optimal decision thresholds for the activity-ranked
    // conversion rule under three FP:FN cost ratios (1:1, 1:5, 5:1):
    // sweep every activity cutoff via the exact cumulative confusion
    // counts and take the integer-cost argmin (struct-min with the
    // threshold tiebreak) — the decision-analysis layer on top of
    // qeo's fixed-threshold card and qc2's single Youden optimum
    // (Youden weighs errors equally; real deployments don't). Pure
    // integer arithmetic end to end.
    "qep_cost_threshold" -> Q(
      fn = (s, dir) => {
        val users = t(s, dir, "events")
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("act"),
            max(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("y"))
        val byAct = graft.operators.ScaleOps.globalRowNumber(
          users.select((-col("act")).as("negact"), col("act"),
            col("user_id"), col("y")),
          Seq(col("negact"), col("user_id")), "i")
        val cum = graft.operators.ScaleOps.globalRunningSum(byAct,
          Seq(col("i")), col("y"), "cpos").localCheckpoint(eager = false)
        val tot = cum.agg(count(lit(1)).as("n"), sum(col("y")).as("npos"))
        // predicting positive for the top-i users: TP = cpos, FP = i-cpos,
        // FN = npos - cpos; cost = cfp·FP + cfn·FN (TN free)
        val scen = cum.sparkSession.createDataFrame(
          Seq((1L, 1L), (1L, 5L), (5L, 1L))).toDF("cfp", "cfn")
        val best = cum.crossJoin(broadcast(tot)).crossJoin(broadcast(scen))
          .select(col("cfp"), col("cfn"),
            struct(
              (col("cfp") * (col("i") - col("cpos")) +
                col("cfn") * (col("npos") - col("cpos"))).as("cost"),
              col("i"), col("cpos"), col("act")).as("st"))
          .groupBy(col("cfp"), col("cfn"))
          .agg(min(col("st")).as("w"))
        best.select(col("cfp"), col("cfn"),
          col("w.cost").as("min_cost"),
          col("w.i").as("top_k"),
          col("w.act").as("act_threshold"),
          col("w.cpos").as("tp_at_k"))
          .orderBy(col("cfp"), col("cfn"))
      },
      oracle = Some("""
        WITH users AS (
          SELECT user_id, CAST(COUNT(*) AS BIGINT) AS act,
                 CAST(MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                   END) AS BIGINT) AS y
          FROM events GROUP BY 1),
        r AS (
          SELECT act, y,
                 CAST(ROW_NUMBER() OVER (ORDER BY -act, user_id)
                   AS BIGINT) AS i
          FROM users),
        cum AS MATERIALIZED (
          SELECT i, act,
                 CAST(SUM(y) OVER (ORDER BY i ROWS UNBOUNDED PRECEDING)
                   AS BIGINT) AS cpos
          FROM r),
        tot AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(MAX(cpos) AS BIGINT) AS npos
          FROM cum),
        scen AS (
          SELECT CAST(cfp AS BIGINT) AS cfp, CAST(cfn AS BIGINT) AS cfn
          FROM (VALUES (1, 1), (1, 5), (5, 1)) AS v(cfp, cfn)),
        best AS (
          SELECT cfp, cfn,
                 MIN({'cost': cfp * (i - cpos) + cfn * (npos - cpos),
                      'i': i, 'cpos': cpos, 'act': act}) AS w
          FROM cum CROSS JOIN tot CROSS JOIN scen
          GROUP BY 1, 2)
        SELECT cfp, cfn,
               w['cost'] AS min_cost,
               w['i'] AS top_k,
               w['act'] AS act_threshold,
               w['cpos'] AS tp_at_k
        FROM best ORDER BY cfp, cfn""")),

    // Laplace trend test on the error-event stream: are failures
    // speeding up? z = (Σt_i/(nT) - 1/2)·sqrt(12n) over event times
    // measured from the corpus start — the centroid test every
    // reliability program runs before quoting an MTBF (a drifting
    // process makes the plain q4w spike flags and a constant-rate MTBF
    // both wrong). Times are exact millisecond integers; one raw ratio
    // and sqrt; the verdict compares the identically-computed z against
    // ±1.96 in both engines.
    "qeq_laplace_trend" -> Q(
      fn = (s, dir) => {
        val all0 = t(s, dir, "events")
          .agg(min(unix_millis(col("ts"))).as("t0"))
        val err = t(s, dir, "events")
          .filter(col("event_type") === "error")
          .select(unix_millis(col("ts")).as("ts_ms"))
          .crossJoin(broadcast(all0))
          .select((col("ts_ms") - col("t0")).as("ti"))
        val agg = err.agg(count(lit(1)).as("n"),
          sum(col("ti").cast("decimal(28,0)")).as("st"),
          max(col("ti")).as("tt"))
        val pre = agg.select(col("n"), col("tt"),
          ((col("st").cast("double") /
            (col("n").cast("double") * col("tt").cast("double"))) -
            lit(0.5)).as("craw"))
          .withColumn("z", col("craw") *
            sqrt(lit(12.0) * col("n").cast("double")))
        pre.select(col("n").as("n_errors"),
          round(col("tt").cast("double") / (col("n") - 1).cast("double"), 2)
            .as("mtbf_ms"),
          round(col("z"), 6).as("laplace_z"),
          when(col("z") > 1.96, lit("degrading"))
            .when(col("z") < -1.96, lit("improving"))
            .otherwise(lit("stable")).as("trend"))
      },
      oracle = Some("""
        WITH all0 AS (
          SELECT CAST(MIN(epoch_ms(ts)) AS BIGINT) AS t0 FROM events),
        err AS (
          SELECT CAST(epoch_ms(ts) AS BIGINT) - all0.t0 AS ti
          FROM events CROSS JOIN all0
          WHERE event_type = 'error'),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CAST(ti AS DECIMAL(28,0))) AS DOUBLE) AS st,
                 CAST(MAX(ti) AS BIGINT) AS tt
          FROM err),
        pre AS (
          SELECT n, tt,
                 ((st / (CAST(n AS DOUBLE) * CAST(tt AS DOUBLE))) -
                   CAST(0.5 AS DOUBLE)) *
                   sqrt(CAST(12 AS DOUBLE) * CAST(n AS DOUBLE)) AS z
          FROM agg)
        SELECT n AS n_errors,
               ROUND(CAST(tt AS DOUBLE) / CAST(n - 1 AS DOUBLE), 2)
                 + CAST(0 AS DOUBLE) AS mtbf_ms,
               ROUND(z, 6) + CAST(0 AS DOUBLE) AS laplace_z,
               CASE WHEN z > CAST(1.96 AS DOUBLE) THEN 'degrading'
                    WHEN z < CAST(-1.96 AS DOUBLE) THEN 'improving'
                    ELSE 'stable' END AS trend
        FROM pre""")),

    // Crow-AMSAA (NHPP power-law) reliability-growth fit on the error
    // stream: the closed-form MLE β = n / Σ ln(T/t_i) — β < 1 means
    // the system is improving, β > 1 degrading — with ln λ and the
    // instantaneous MTBF T/(nβ). The MODEL behind the qeq trend test's
    // yes/no answer. Event times are offset by +1 ms from the corpus
    // start so the first ln is finite (documented convention); the ln
    // terms ride round-9 DECIMAL sums.
    "qer_crow_amsaa" -> Q(
      fn = (s, dir) => {
        val all0 = t(s, dir, "events")
          .agg(min(unix_millis(col("ts"))).as("t0"))
        val err = t(s, dir, "events")
          .filter(col("event_type") === "error")
          .select(unix_millis(col("ts")).as("ts_ms"))
          .crossJoin(broadcast(all0))
          .select((col("ts_ms") - col("t0") + 1).as("ti"))
          .localCheckpoint(eager = false)
        val tt = err.agg(max(col("ti")).as("tt"), count(lit(1)).as("n"))
        val lnsum = err.crossJoin(broadcast(tt))
          .select(round(log(col("tt").cast("double") /
            col("ti").cast("double")), 9).as("lr"))
          .agg(sum(col("lr").cast("decimal(20,9)")).as("sl"))
        tt.crossJoin(broadcast(lnsum))
          .select(col("n").as("n_errors"),
            round(col("n").cast("double") / col("sl").cast("double"), 6)
              .as("beta_mle"),
            round(log(col("n").cast("double")) -
              (col("n").cast("double") / col("sl").cast("double")) *
                log(col("tt").cast("double")), 6).as("ln_lambda"),
            round(col("tt").cast("double") /
              (col("n").cast("double") *
                (col("n").cast("double") / col("sl").cast("double"))), 2)
              .as("mtbf_inst_ms"),
            when(col("n").cast("double") / col("sl").cast("double") < 1.0,
              lit("improving")).otherwise(lit("degrading")).as("growth"))
      },
      oracle = Some("""
        WITH all0 AS (
          SELECT CAST(MIN(epoch_ms(ts)) AS BIGINT) AS t0 FROM events),
        err AS (
          SELECT CAST(epoch_ms(ts) AS BIGINT) - all0.t0 + 1 AS ti
          FROM events CROSS JOIN all0
          WHERE event_type = 'error'),
        tt AS (
          SELECT CAST(MAX(ti) AS BIGINT) AS tt,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM err),
        lnsum AS (
          SELECT CAST(SUM(CAST(ROUND(ln(CAST(tt.tt AS DOUBLE) /
                   CAST(ti AS DOUBLE)), 9) AS DECIMAL(20,9))) AS DOUBLE)
                   AS sl
          FROM err CROSS JOIN tt)
        SELECT n AS n_errors,
               ROUND(CAST(n AS DOUBLE) / sl, 6) + CAST(0 AS DOUBLE)
                 AS beta_mle,
               ROUND(ln(CAST(n AS DOUBLE)) -
                 (CAST(n AS DOUBLE) / sl) * ln(CAST(tt AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS ln_lambda,
               ROUND(CAST(tt AS DOUBLE) /
                 (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) / sl)), 2)
                 + CAST(0 AS DOUBLE) AS mtbf_inst_ms,
               CASE WHEN CAST(n AS DOUBLE) / sl < CAST(1 AS DOUBLE)
                 THEN 'improving' ELSE 'degrading' END AS growth
        FROM tt CROSS JOIN lnsum""")),

    // Inspection-paradox card for purchase inter-event times: the
    // plain mean gap, the length-biased mean E[X²]/E[X] (what a
    // randomly-arriving observer's CURRENT gap averages), and the mean
    // forward recurrence time E[X²]/2E[X] (how long that observer
    // waits) — the renewal-theory correction behind every "average
    // time between purchases" claim; with bursty gaps (qd6's B > 0)
    // the biased mean can be several times the plain one. Exact
    // integer moment sums (the qd6 DECIMAL machinery), three raw
    // ratios.
    "qes_inspection_paradox" -> Q(
      fn = (s, dir) => {
        val p = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .select(unix_millis(col("ts")).as("ts_ms"), col("event_id"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(p,
          Seq(col("ts_ms"), col("event_id")), "rn")
        val iet = ranked.select(col("rn"), col("ts_ms").as("t0"))
          .join(ranked.select((col("rn") - 1).as("rn"),
            col("ts_ms").as("t1")), Seq("rn"))
          .select((col("t1") - col("t0")).as("tau"))
        val agg = iet.agg(count(lit(1)).as("n"),
          sum(col("tau").cast("decimal(28,0)")).as("sx"),
          sum(col("tau").cast("decimal(12,0)") *
            col("tau").cast("decimal(12,0)")).as("sxx"))
          .select(col("n"), col("sx").cast("double").as("sx"),
            col("sxx").cast("double").as("sxx"))
        agg.select(col("n").as("n_gaps"),
          round(col("sx") / col("n").cast("double"), 2).as("mean_gap_ms"),
          round(col("sxx") / col("sx"), 2).as("length_biased_ms"),
          round(col("sxx") / (lit(2.0) * col("sx")), 2)
            .as("fwd_recurrence_ms"),
          round((col("sxx") / col("sx")) /
            (col("sx") / col("n").cast("double")), 6).as("paradox_ratio"))
      },
      oracle = Some("""
        WITH p AS (
          SELECT epoch_ms(ts) AS ts_ms, event_id
          FROM events WHERE event_type = 'purchase'),
        r AS (
          SELECT ts_ms, ROW_NUMBER() OVER (ORDER BY ts_ms, event_id)
            AS rn
          FROM p),
        iet AS (
          SELECT b.ts_ms - a.ts_ms AS tau
          FROM r a JOIN r b ON b.rn = a.rn + 1),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CAST(tau AS DECIMAL(28,0))) AS DOUBLE) AS sx,
                 CAST(SUM(CAST(tau AS DECIMAL(12,0)) *
                   CAST(tau AS DECIMAL(12,0))) AS DOUBLE) AS sxx
          FROM iet)
        SELECT n AS n_gaps,
               ROUND(sx / CAST(n AS DOUBLE), 2) + CAST(0 AS DOUBLE)
                 AS mean_gap_ms,
               ROUND(sxx / sx, 2) + CAST(0 AS DOUBLE)
                 AS length_biased_ms,
               ROUND(sxx / (CAST(2 AS DOUBLE) * sx), 2)
                 + CAST(0 AS DOUBLE) AS fwd_recurrence_ms,
               ROUND((sxx / sx) / (sx / CAST(n AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS paradox_ratio
        FROM agg""")),

    // Corpus compressibility card: unigram entropy in bits/token, the
    // bigram CONDITIONAL entropy H(w₂|w₁) = H(bigram) − H(unigram)
    // (what an order-1 model still can't predict), redundancy against
    // the uniform log₂V bound, bits per character, and the implied
    // optimal compression ratio over 8-bit bytes — the source-coding
    // budget that says how far ANY tokenizer/compressor can squeeze
    // this corpus (the planning number behind the BPE vocabulary and
    // qe7's coverage curve). Counts are exact BIGINTs; ln is the only
    // float link.
    "qet_compressibility" -> Q(
      fn = (s, dir) => {
        val d = t(s, dir, "documents")
          .select(col("doc_id"),
            split(lower(col("text")), "[\t\n\f\r ]+").as("arr"))
        val toks = d.select(explode(col("arr")).as("tok"))
          .filter(col("tok") =!= "")
        val uni = toks.groupBy(col("tok")).agg(count(lit(1)).as("c"))
          .localCheckpoint(eager = false)
        val tot = uni.agg(sum(col("c")).as("nt"), count(lit(1)).as("v"),
          sum(col("c") * length(col("tok"))).as("chars"))
        val h1 = uni.crossJoin(broadcast(tot))
          .agg(first(col("nt")).as("nt"), first(col("v")).as("v"),
            first(col("chars")).as("chars"),
            sum(round((col("c").cast("double") / col("nt").cast("double")) *
              log(col("c").cast("double") / col("nt").cast("double")), 9)
              .cast("decimal(18,9)")).as("h1d"))
        val bi = d.select(explode(expr(
          "transform(sequence(0, size(arr) - 2), " +
            "i -> concat_ws(' ', arr[i], arr[i+1]))")).as("g"))
          .filter(col("g") =!= "" && !col("g").startsWith(" ") &&
            !col("g").endsWith(" "))
          .groupBy(col("g")).agg(count(lit(1)).as("c"))
        val h2 = bi.crossJoin(broadcast(bi.agg(sum(col("c")).as("nb"))))
          .agg(sum(round((col("c").cast("double") / col("nb").cast("double")) *
            log(col("c").cast("double") / col("nb").cast("double")), 9)
            .cast("decimal(18,9)")).as("h2d"))
        h1.crossJoin(broadcast(h2))
          .select(col("nt").as("n_tokens"), col("v").as("vocab"),
            round(-col("h1d").cast("double") / log(lit(2.0)), 6)
              .as("h1_bits"),
            round((-col("h2d").cast("double") + col("h1d").cast("double")) /
              log(lit(2.0)), 6).as("h2cond_bits"),
            round(lit(1.0) + col("h1d").cast("double") /
              log(col("v").cast("double")), 6).as("redundancy"),
            round(-col("h1d").cast("double") / log(lit(2.0)) /
              (col("chars").cast("double") / col("nt").cast("double") +
                lit(1.0)), 6).as("bits_per_char"),
            round(lit(8.0) /
              (-col("h1d").cast("double") / log(lit(2.0)) /
                (col("chars").cast("double") / col("nt").cast("double") +
                  lit(1.0))), 6).as("est_compression"))
      },
      oracle = Some("""
        WITH d AS (
          SELECT doc_id,
                 string_split_regex(lower(text), '[\t\n\x0B\f\r ]+') AS arr
          FROM documents),
        uni AS MATERIALIZED (
          SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
          FROM (SELECT UNNEST(arr) AS tok FROM d)
          WHERE tok <> '' GROUP BY 1),
        tot AS (
          SELECT CAST(SUM(c) AS BIGINT) AS nt,
                 CAST(COUNT(*) AS BIGINT) AS v,
                 CAST(SUM(c * length(tok)) AS BIGINT) AS chars
          FROM uni),
        h1 AS (
          SELECT MAX(tot.nt) AS nt, MAX(tot.v) AS v,
                 MAX(tot.chars) AS chars,
                 SUM(CAST(ROUND((CAST(c AS DOUBLE) /
                   CAST(tot.nt AS DOUBLE)) *
                   ln(CAST(c AS DOUBLE) / CAST(tot.nt AS DOUBLE)), 9)
                   AS DECIMAL(18,9))) AS h1d
          FROM uni CROSS JOIN tot),
        bi AS (
          SELECT g, CAST(COUNT(*) AS BIGINT) AS c
          FROM (
            SELECT UNNEST(list_transform(range(1, len(arr)),
              i -> arr[i] || ' ' || arr[i + 1])) AS g
            FROM d)
          WHERE g <> '' AND g NOT LIKE ' %' AND g NOT LIKE '% '
          GROUP BY 1),
        nb AS (SELECT CAST(SUM(c) AS BIGINT) AS nb FROM bi),
        h2 AS (
          SELECT SUM(CAST(ROUND((CAST(c AS DOUBLE) /
                   CAST(nb.nb AS DOUBLE)) *
                   ln(CAST(c AS DOUBLE) / CAST(nb.nb AS DOUBLE)), 9)
                   AS DECIMAL(18,9))) AS h2d
          FROM bi CROSS JOIN nb)
        SELECT nt AS n_tokens, v AS vocab,
               ROUND(-CAST(h1d AS DOUBLE) / ln(CAST(2 AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS h1_bits,
               ROUND((-CAST(h2d AS DOUBLE) + CAST(h1d AS DOUBLE)) /
                 ln(CAST(2 AS DOUBLE)), 6) + CAST(0 AS DOUBLE)
                 AS h2cond_bits,
               ROUND(CAST(1 AS DOUBLE) + CAST(h1d AS DOUBLE) /
                 ln(CAST(v AS DOUBLE)), 6) + CAST(0 AS DOUBLE)
                 AS redundancy,
               ROUND(-CAST(h1d AS DOUBLE) / ln(CAST(2 AS DOUBLE)) /
                 (CAST(chars AS DOUBLE) / CAST(nt AS DOUBLE) +
                   CAST(1 AS DOUBLE)), 6) + CAST(0 AS DOUBLE)
                 AS bits_per_char,
               ROUND(CAST(8 AS DOUBLE) /
                 (-CAST(h1d AS DOUBLE) / ln(CAST(2 AS DOUBLE)) /
                   (CAST(chars AS DOUBLE) / CAST(nt AS DOUBLE) +
                     CAST(1 AS DOUBLE))), 6) + CAST(0 AS DOUBLE)
                 AS est_compression
        FROM h1 CROSS JOIN h2""")),

    // Word burstiness (Church-Gale): mean occurrences per CONTAINING
    // document cf/df for the corpus' most clumped frequent words — a
    // bursty term (jargon, names) concentrates where a function word
    // spreads, the signal behind df-based relevance weighting that raw
    // frequency (qe7's coverage) hides. Top 20 by exact integer
    // (cf·10⁶ div df) score with the token tiebreak — the ranking key
    // itself stays integer so ORDER BY needs no float comparison.
    "qeu_word_burstiness" -> Q(
      fn = (s, dir) => {
        val occ = t(s, dir, "documents")
          .select(col("doc_id"),
            explode(split(lower(col("text")), "[\t\n\f\r ]+")).as("tok"))
          .filter(col("tok") =!= "")
          .groupBy(col("tok"), col("doc_id")).agg(count(lit(1)).as("k"))
        val stats = occ.groupBy(col("tok"))
          .agg(sum(col("k")).as("cf"), count(lit(1)).as("df"))
          .filter(col("cf") >= 20)
          .select(col("tok"), col("cf"), col("df"),
            expr("cf * 1000000 div df").as("score"))
        stats
          .orderBy(col("score").desc, col("tok"))
          .limit(20)
          .select(col("tok"), col("cf"), col("df"),
            round(col("score").cast("double") / lit(1000000.0), 6)
              .as("burstiness"))
      },
      oracle = Some("""
        WITH occ AS (
          SELECT tok, doc_id, CAST(COUNT(*) AS BIGINT) AS k
          FROM (SELECT doc_id,
                  UNNEST(string_split_regex(lower(text),
                    '[\t\n\x0B\f\r ]+')) AS tok
                FROM documents)
          WHERE tok <> '' GROUP BY 1, 2),
        stats AS (
          SELECT tok, CAST(SUM(k) AS BIGINT) AS cf,
                 CAST(COUNT(*) AS BIGINT) AS df,
                 CAST(SUM(k) AS BIGINT) * 1000000 //
                   CAST(COUNT(*) AS BIGINT) AS score
          FROM occ GROUP BY 1
          HAVING SUM(k) >= 20)
        SELECT tok, cf, df,
               ROUND(CAST(score AS DOUBLE) / CAST(1000000 AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS burstiness
        FROM stats ORDER BY score DESC, tok LIMIT 20""")),

    // Gries' deviation-of-proportions dispersion for the ten most
    // frequent words: DP = ½·Σ_docs |share-of-word-in-doc −
    // share-of-doc-in-corpus| — 0 means the word spreads exactly with
    // document sizes, 1 means it all sits in one document; the
    // dispersion axis that neither frequency (qe7) nor burstiness
    // (qeu) measures. Every proportion is an exact integer pair
    // multiplied out, |v·N_c − s·cf| summed in DECIMAL before one
    // final division — fully exact until the last ratio.
    "qev_word_dispersion" -> Q(
      fn = (s, dir) => {
        val toks = t(s, dir, "documents")
          .select(col("doc_id"),
            explode(split(lower(col("text")), "[\t\n\f\r ]+")).as("tok"))
          .filter(col("tok") =!= "")
          .localCheckpoint(eager = false)
        val sizes = toks.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
        val totsz = sizes.agg(sum(col("sz")).as("nc"))
        val top = toks.groupBy(col("tok")).agg(count(lit(1)).as("cf"))
          .orderBy(col("cf").desc, col("tok")).limit(10)
          .localCheckpoint(eager = false)
        val occ = toks.join(broadcast(top.select(col("tok"))), Seq("tok"))
          .groupBy(col("tok"), col("doc_id")).agg(count(lit(1)).as("k"))
        // per (word, doc): |k/cf - sz/NC| = |k·NC - sz·cf| / (cf·NC);
        // docs without the word contribute sz·cf/(cf·NC) — handled via
        // a full join against the size table.
        val grid = sizes.crossJoin(broadcast(top))
          .join(occ, Seq("tok", "doc_id"), "left")
          .crossJoin(broadcast(totsz))
          .select(col("tok"), col("cf"),
            abs(coalesce(col("k"), lit(0L)) * col("nc") -
              col("sz") * col("cf")).as("num"), col("nc"))
        grid.groupBy(col("tok"))
          .agg(first(col("cf")).as("cf"), first(col("nc")).as("nc"),
            sum(col("num").cast("decimal(28,0)")).as("snum"))
          .select(col("tok"), col("cf"),
            round(col("snum").cast("double") /
              (lit(2.0) * col("cf").cast("double") *
                col("nc").cast("double")), 6).as("gries_dp"))
          .orderBy(col("cf").desc, col("tok"))
      },
      oracle = Some("""
        WITH toks AS MATERIALIZED (
          SELECT doc_id, tok
          FROM (SELECT doc_id,
                  UNNEST(string_split_regex(lower(text),
                    '[\t\n\x0B\f\r ]+')) AS tok
                FROM documents)
          WHERE tok <> ''),
        sizes AS (
          SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS sz
          FROM toks GROUP BY 1),
        totsz AS (SELECT CAST(SUM(sz) AS BIGINT) AS nc FROM sizes),
        top AS MATERIALIZED (
          SELECT tok, CAST(COUNT(*) AS BIGINT) AS cf
          FROM toks GROUP BY 1
          ORDER BY cf DESC, tok LIMIT 10),
        occ AS (
          SELECT t.tok, t.doc_id, CAST(COUNT(*) AS BIGINT) AS k
          FROM toks t JOIN top ON t.tok = top.tok
          GROUP BY 1, 2),
        grid AS (
          SELECT top.tok, top.cf,
                 ABS(COALESCE(occ.k, 0) * totsz.nc -
                   sizes.sz * top.cf) AS num,
                 totsz.nc
          FROM sizes CROSS JOIN top
          LEFT JOIN occ ON occ.tok = top.tok
            AND occ.doc_id = sizes.doc_id
          CROSS JOIN totsz)
        SELECT tok, MAX(cf) AS cf,
               ROUND(CAST(SUM(CAST(num AS DECIMAL(28,0))) AS DOUBLE) /
                 (CAST(2 AS DOUBLE) * CAST(MAX(cf) AS DOUBLE) *
                   CAST(MAX(nc) AS DOUBLE)), 6) + CAST(0 AS DOUBLE)
                 AS gries_dp
        FROM grid GROUP BY tok ORDER BY cf DESC, tok""")),

    // Dunning log-likelihood keyness: which words distinguish the
    // even-doc_id half of the corpus from the odd half — the G² corpus-
    // comparison statistic (signed by over/under-use) that q3y's
    // TF-IDF (within-corpus salience) and q8e's PMI (collocation)
    // don't compute. Expected counts are raw ratios of exact BIGINTs,
    // the four x·ln(x/E) terms ride the 9-grid, and the top 20 rows
    // order by the rounded G² with the token tiebreak.
    "qew_keyness_loglik" -> Q(
      fn = (s, dir) => {
        val toks = t(s, dir, "documents")
          .select((pmod(col("doc_id"), lit(2L)) === 0).as("ha"),
            explode(split(lower(col("text")), "[\t\n\f\r ]+")).as("tok"))
          .filter(col("tok") =!= "")
        val cnt = toks.groupBy(col("tok"))
          .agg(sum(when(col("ha"), 1L).otherwise(0L)).as("a"),
            sum(when(!col("ha"), 1L).otherwise(0L)).as("b"))
          .localCheckpoint(eager = false)
        val tot = cnt.agg(sum(col("a")).as("na"), sum(col("b")).as("nb"))
        val scored = cnt.crossJoin(broadcast(tot))
          .filter(col("a") + col("b") >= 20)
          .select(col("tok"), col("a"), col("b"),
            (col("na").cast("double") *
              (col("a") + col("b")).cast("double") /
              (col("na") + col("nb")).cast("double")).as("ea"),
            (col("nb").cast("double") *
              (col("a") + col("b")).cast("double") /
              (col("na") + col("nb")).cast("double")).as("eb"))
          .select(col("tok"), col("a"), col("b"),
            round(lit(2.0) * (
              when(col("a") > 0, round(col("a").cast("double") *
                log(col("a").cast("double") / col("ea")), 9))
                .otherwise(0.0) +
              when(col("b") > 0, round(col("b").cast("double") *
                log(col("b").cast("double") / col("eb")), 9))
                .otherwise(0.0)), 6).as("g2"),
            when(col("a").cast("double") > col("ea"), lit("even"))
              .otherwise(lit("odd")).as("overused_in"))
        scored.orderBy(col("g2").desc, col("tok")).limit(20)
      },
      oracle = Some("""
        WITH toks AS (
          SELECT (doc_id % 2 = 0) AS ha, tok
          FROM (SELECT doc_id,
                  UNNEST(string_split_regex(lower(text),
                    '[\t\n\x0B\f\r ]+')) AS tok
                FROM documents)
          WHERE tok <> ''),
        cnt AS MATERIALIZED (
          SELECT tok,
                 CAST(SUM(CASE WHEN ha THEN 1 ELSE 0 END) AS BIGINT) AS a,
                 CAST(SUM(CASE WHEN NOT ha THEN 1 ELSE 0 END) AS BIGINT)
                   AS b
          FROM toks GROUP BY 1),
        tot AS (
          SELECT CAST(SUM(a) AS BIGINT) AS na,
                 CAST(SUM(b) AS BIGINT) AS nb
          FROM cnt),
        scored AS (
          SELECT tok, a, b,
                 ROUND(CAST(2 AS DOUBLE) * (
                   CASE WHEN a > 0 THEN
                     ROUND(CAST(a AS DOUBLE) * ln(CAST(a AS DOUBLE) /
                       (CAST(na AS DOUBLE) * CAST(a + b AS DOUBLE) /
                        CAST(na + nb AS DOUBLE))), 9)
                   ELSE CAST(0 AS DOUBLE) END +
                   CASE WHEN b > 0 THEN
                     ROUND(CAST(b AS DOUBLE) * ln(CAST(b AS DOUBLE) /
                       (CAST(nb AS DOUBLE) * CAST(a + b AS DOUBLE) /
                        CAST(na + nb AS DOUBLE))), 9)
                   ELSE CAST(0 AS DOUBLE) END), 6) AS g2,
                 CASE WHEN CAST(a AS DOUBLE) >
                   (CAST(na AS DOUBLE) * CAST(a + b AS DOUBLE) /
                    CAST(na + nb AS DOUBLE)) THEN 'even' ELSE 'odd' END
                   AS overused_in
          FROM cnt CROSS JOIN tot
          WHERE a + b >= 20)
        SELECT * FROM scored ORDER BY g2 DESC, tok LIMIT 20""")),

    // Levenshtein near-pair mining over part names, blocked by brand
    // (the q84 sorted-neighborhood discipline: never all-pairs — the
    // brand block bounds candidates at any SF): the exact integer edit
    // distance both engines implement natively, reported as the top-20
    // closest distinct name pairs with a similarity ratio — the
    // absolute-edit-budget companion to q5y's Jaro-Winkler (JW rewards
    // shared prefixes; Levenshtein counts real keystrokes, the measure
    // dedup QA teams quote).
    "qex_levenshtein_pairs" -> Q(
      fn = (s, dir) => {
        val p = t(s, dir, "part")
          .select(col("p_brand"), col("p_partkey"), col("p_name"))
        val pairs = p.select(col("p_brand"), col("p_partkey").as("ka"),
          col("p_name").as("na"))
          .join(p.select(col("p_brand"), col("p_partkey").as("kb"),
            col("p_name").as("nb")), Seq("p_brand"))
          .filter(col("ka") < col("kb"))
          .select(col("p_brand"), col("ka"), col("kb"), col("na"),
            col("nb"),
            levenshtein(col("na"), col("nb")).cast("long").as("dist"),
            greatest(length(col("na")), length(col("nb"))).cast("long")
              .as("maxlen"))
        pairs
          .orderBy(col("dist"), col("p_brand"), col("ka"), col("kb"))
          .limit(20)
          .select(col("p_brand"), col("ka"), col("kb"), col("dist"),
            round(lit(1.0) - col("dist").cast("double") /
              col("maxlen").cast("double"), 6).as("similarity"))
      },
      oracle = Some("""
        WITH p AS (
          SELECT p_brand, p_partkey, p_name FROM part),
        pairs AS (
          SELECT a.p_brand, a.p_partkey AS ka, b.p_partkey AS kb,
                 CAST(levenshtein(a.p_name, b.p_name) AS BIGINT) AS dist,
                 CAST(GREATEST(length(a.p_name), length(b.p_name))
                   AS BIGINT) AS maxlen
          FROM p a JOIN p b ON a.p_brand = b.p_brand
            AND a.p_partkey < b.p_partkey)
        SELECT p_brand, ka, kb, dist,
               ROUND(CAST(1 AS DOUBLE) - CAST(dist AS DOUBLE) /
                 CAST(maxlen AS DOUBLE), 6) + CAST(0 AS DOUBLE)
                 AS similarity
        FROM pairs
        ORDER BY dist, p_brand, ka, kb LIMIT 20""")),

    // Two-part ("hurdle") decomposition of revenue per user:
    // E[spend] = P(any purchase) · E[spend | purchaser] — the
    // health-econometrics decomposition separating the participation
    // margin from the intensity margin, which a single mean (q99's
    // dashboard) conflates. Both parts carry their exact-moment
    // standard errors and recombine into the overall mean by
    // construction. Purchase values are exact DECIMAL sums; the
    // participation SE is one binomial sqrt.
    "qey_two_part_model" -> Q(
      fn = (s, dir) => {
        val users = t(s, dir, "events")
          .groupBy(col("user_id"))
          .agg(sum(when(col("event_type") === "purchase",
            coalesce(col("value"), lit(0.0)).cast("decimal(18,2)"))
            .otherwise(lit(0.0).cast("decimal(18,2)"))).as("spend"),
            max(when(col("event_type") === "purchase" &&
              col("value").isNotNull, 1L).otherwise(0L)).as("buyer"))
          .localCheckpoint(eager = false)
        val parts = users.agg(count(lit(1)).as("n"),
          sum(col("buyer")).as("nb"),
          sum(when(col("buyer") === 1, col("spend"))
            .otherwise(lit(0).cast("decimal(18,2)"))).as("sv"),
          sum(when(col("buyer") === 1,
            col("spend").cast("decimal(12,2)") *
              col("spend").cast("decimal(12,2)"))
            .otherwise(lit(0).cast("decimal(25,4)"))).as("svv"))
          .select(col("n"), col("nb"),
            col("sv").cast("double").as("sv"),
            col("svv").cast("double").as("svv"))
        parts.select(col("n").as("n_users"), col("nb").as("n_buyers"),
          round(col("nb").cast("double") / col("n").cast("double"), 6)
            .as("p_buy"),
          round(sqrt((col("nb").cast("double") / col("n").cast("double")) *
            (lit(1.0) - col("nb").cast("double") / col("n").cast("double")) /
            col("n").cast("double")), 6).as("p_buy_se"),
          round(col("sv") / col("nb").cast("double"), 2)
            .as("mean_if_buyer"),
          round(sqrt((col("svv") - col("sv") * col("sv") /
            col("nb").cast("double")) /
            ((col("nb") - 1).cast("double") * col("nb").cast("double"))), 2)
            .as("mean_if_buyer_se"),
          round((col("nb").cast("double") / col("n").cast("double")) *
            (col("sv") / col("nb").cast("double")), 2).as("overall_mean"))
      },
      oracle = Some("""
        WITH users AS MATERIALIZED (
          SELECT user_id,
                 SUM(CASE WHEN event_type = 'purchase'
                   THEN CAST(COALESCE(value, 0) AS DECIMAL(18,2))
                   ELSE CAST(0 AS DECIMAL(18,2)) END) AS spend,
                 CAST(MAX(CASE WHEN event_type = 'purchase'
                   AND value IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
                   AS buyer
          FROM events GROUP BY 1),
        parts AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(buyer) AS BIGINT) AS nb,
                 CAST(SUM(CASE WHEN buyer = 1 THEN spend
                   ELSE CAST(0 AS DECIMAL(18,2)) END) AS DOUBLE) AS sv,
                 CAST(SUM(CASE WHEN buyer = 1 THEN
                   CAST(spend AS DECIMAL(12,2)) *
                   CAST(spend AS DECIMAL(12,2))
                   ELSE CAST(0 AS DECIMAL(25,4)) END) AS DOUBLE) AS svv
          FROM users)
        SELECT n AS n_users, nb AS n_buyers,
               ROUND(CAST(nb AS DOUBLE) / CAST(n AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS p_buy,
               ROUND(sqrt((CAST(nb AS DOUBLE) / CAST(n AS DOUBLE)) *
                 (CAST(1 AS DOUBLE) - CAST(nb AS DOUBLE) /
                   CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS p_buy_se,
               ROUND(sv / CAST(nb AS DOUBLE), 2) + CAST(0 AS DOUBLE)
                 AS mean_if_buyer,
               ROUND(sqrt((svv - sv * sv / CAST(nb AS DOUBLE)) /
                 (CAST(nb - 1 AS DOUBLE) * CAST(nb AS DOUBLE))), 2)
                 + CAST(0 AS DOUBLE) AS mean_if_buyer_se,
               ROUND((CAST(nb AS DOUBLE) / CAST(n AS DOUBLE)) *
                 (sv / CAST(nb AS DOUBLE)), 2) + CAST(0 AS DOUBLE)
                 AS overall_mean
        FROM parts""")),

    // Empirical-Bayes beta-binomial shrinkage of per-user conversion
    // rates (purchases / events): method-of-moments prior (α, β) from
    // the across-user rate mean and variance, then shrunk rates
    // (x + α)/(m + α + β) for the ten most active users — the
    // industry-standard CTR stabilizer (a 1/1 user is NOT a 100%
    // converter), the applied counterpart of qcb's James-Stein on
    // gaussian means. Rate moments ride round-9 DECIMAL sums; the MoM
    // prior and every shrunk rate are raw ratios.
    "qez_eb_shrinkage" -> Q(
      fn = (s, dir) => {
        val users = t(s, dir, "events")
          .groupBy(col("user_id"))
          .agg(count(lit(1)).as("m"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("x"))
          .localCheckpoint(eager = false)
        val st = users.select((col("x").cast("double") /
          col("m").cast("double")).as("r"))
          .agg(count(lit(1)).as("n"),
            sum(round(col("r"), 9).cast("decimal(18,9)")).as("sr"),
            sum(round(col("r") * col("r"), 9).cast("decimal(18,9)"))
              .as("srr"))
          .select(col("n"),
            round(col("sr").cast("double") / col("n").cast("double"), 9)
              .as("mu"),
            round((col("srr").cast("double") -
              col("sr").cast("double") * col("sr").cast("double") /
                col("n").cast("double")) / (col("n") - 1).cast("double"), 9)
              .as("vr"))
          .select(col("n"), col("mu"), col("vr"),
            round(col("mu") * (col("mu") * (lit(1.0) - col("mu")) /
              col("vr") - lit(1.0)), 9).as("alpha"),
            round((lit(1.0) - col("mu")) *
              (col("mu") * (lit(1.0) - col("mu")) / col("vr") - lit(1.0)),
              9).as("beta"))
        val top = users
          .orderBy(col("m").desc, col("user_id")).limit(10)
        top.crossJoin(broadcast(st))
          .select(col("user_id"), col("m"), col("x"),
            round(col("x").cast("double") / col("m").cast("double"), 6)
              .as("raw_rate"),
            round((col("x").cast("double") + col("alpha")) /
              (col("m").cast("double") + col("alpha") + col("beta")), 6)
              .as("shrunk_rate"),
            round(col("alpha"), 6).as("prior_alpha"),
            round(col("beta"), 6).as("prior_beta"))
          .orderBy(col("m").desc, col("user_id"))
      },
      oracle = Some("""
        WITH users AS MATERIALIZED (
          SELECT user_id, CAST(COUNT(*) AS BIGINT) AS m,
                 CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                   END) AS BIGINT) AS x
          FROM events GROUP BY 1),
        st0 AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CAST(ROUND(CAST(x AS DOUBLE) /
                   CAST(m AS DOUBLE), 9) AS DECIMAL(18,9))) AS DOUBLE)
                   AS sr,
                 CAST(SUM(CAST(ROUND((CAST(x AS DOUBLE) /
                   CAST(m AS DOUBLE)) * (CAST(x AS DOUBLE) /
                   CAST(m AS DOUBLE)), 9) AS DECIMAL(18,9))) AS DOUBLE)
                   AS srr
          FROM users),
        st1 AS (
          SELECT n, ROUND(sr / CAST(n AS DOUBLE), 9) AS mu,
                 ROUND((srr - sr * sr / CAST(n AS DOUBLE)) /
                   CAST(n - 1 AS DOUBLE), 9) AS vr
          FROM st0),
        st AS (
          SELECT n, mu, vr,
                 ROUND(mu * (mu * (CAST(1 AS DOUBLE) - mu) / vr -
                   CAST(1 AS DOUBLE)), 9) AS alpha,
                 ROUND((CAST(1 AS DOUBLE) - mu) *
                   (mu * (CAST(1 AS DOUBLE) - mu) / vr -
                     CAST(1 AS DOUBLE)), 9) AS beta
          FROM st1),
        top AS (
          SELECT user_id, m, x FROM users
          ORDER BY m DESC, user_id LIMIT 10)
        SELECT user_id, m, x,
               ROUND(CAST(x AS DOUBLE) / CAST(m AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS raw_rate,
               ROUND((CAST(x AS DOUBLE) + alpha) /
                 (CAST(m AS DOUBLE) + alpha + beta), 6)
                 + CAST(0 AS DOUBLE) AS shrunk_rate,
               ROUND(alpha, 6) + CAST(0 AS DOUBLE) AS prior_alpha,
               ROUND(beta, 6) + CAST(0 AS DOUBLE) AS prior_beta
        FROM top CROSS JOIN st
        ORDER BY m DESC, user_id""")),

    // Concentration index and Kakwani decomposition: customer spend
    // concentrated against the ACCOUNT-BALANCE ranking — the
    // health-equity economics measure (is consumption concentrated
    // among the asset-rich?) that q6m's Gini cannot ask because Gini
    // ranks by the outcome itself; Kakwani = CI − Gini isolates the
    // cross-ranking component. Both indexes come from the same exact
    // DECIMAL Σ y·rank sums over two global rankings; one final ratio
    // each.
    "qf0_concentration_index" -> Q(
      fn = (s, dir) => {
        val base = t(s, dir, "customer")
          .join(t(s, dir, "orders")
            .groupBy(col("o_custkey"))
            .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("y")),
            col("c_custkey") === col("o_custkey"))
          .select(col("c_custkey").as("ck"), col("c_acctbal"), col("y"))
        val rBal = graft.operators.ScaleOps.globalRowNumber(base,
          Seq(col("c_acctbal"), col("ck")), "rb")
        val rY = graft.operators.ScaleOps.globalRowNumber(rBal,
          Seq(col("y"), col("ck")), "ry").localCheckpoint(eager = false)
        val agg = rY.agg(count(lit(1)).as("n"),
          sum(col("y")).as("sy"),
          sum(col("y").cast("decimal(18,2)") *
            col("rb").cast("decimal(10,0)")).as("syrb"),
          sum(col("y").cast("decimal(18,2)") *
            col("ry").cast("decimal(10,0)")).as("syry"))
        val pre = agg.select(col("n"),
          (lit(2.0) * col("syrb").cast("double") /
            (col("n").cast("double") * col("sy").cast("double")) -
            (col("n") + 1).cast("double") / col("n").cast("double"))
            .as("ci"),
          (lit(2.0) * col("syry").cast("double") /
            (col("n").cast("double") * col("sy").cast("double")) -
            (col("n") + 1).cast("double") / col("n").cast("double"))
            .as("gini"))
        pre.select(col("n"),
          round(col("ci"), 6).as("ci_by_balance"),
          round(col("gini"), 6).as("gini"),
          round(col("ci") - col("gini"), 6).as("kakwani"))
      },
      oracle = Some("""
        WITH base AS (
          SELECT c_custkey AS ck, c_acctbal, y
          FROM customer JOIN (
            SELECT o_custkey,
                   SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS y
            FROM orders GROUP BY 1) o ON c_custkey = o_custkey),
        r AS MATERIALIZED (
          SELECT y,
                 CAST(ROW_NUMBER() OVER (ORDER BY c_acctbal, ck)
                   AS BIGINT) AS rb,
                 CAST(ROW_NUMBER() OVER (ORDER BY y, ck) AS BIGINT) AS ry
          FROM base),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(y) AS DOUBLE) AS sy,
                 CAST(SUM(CAST(y AS DECIMAL(18,2)) *
                   CAST(rb AS DECIMAL(10,0))) AS DOUBLE) AS syrb,
                 CAST(SUM(CAST(y AS DECIMAL(18,2)) *
                   CAST(ry AS DECIMAL(10,0))) AS DOUBLE) AS syry
          FROM r),
        pre AS (
          SELECT n,
                 CAST(2 AS DOUBLE) * syrb /
                   (CAST(n AS DOUBLE) * sy) -
                   CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE) AS ci,
                 CAST(2 AS DOUBLE) * syry /
                   (CAST(n AS DOUBLE) * sy) -
                   CAST(n + 1 AS DOUBLE) / CAST(n AS DOUBLE) AS gini
          FROM agg)
        SELECT n,
               ROUND(ci, 6) + CAST(0 AS DOUBLE) AS ci_by_balance,
               ROUND(gini, 6) + CAST(0 AS DOUBLE) AS gini,
               ROUND(ci - gini, 6) + CAST(0 AS DOUBLE) AS kakwani
        FROM pre""")),

    // Shewhart individuals / moving-range chart of daily revenue: the
    // variables-chart companion of qds's attribute p-chart — control
    // limits x̄ ± 2.66·MR̄ from the mean moving range (the d₂-based
    // short-term sigma that ignores slow drift), the out-of-control
    // count, and the worst violation day by struct argmax. Moving
    // ranges are exact DECIMAL |differences|; the ±2.66 band
    // multiplies DECIMALs per rule 15.
    "qf2_imr_chart" -> Q(
      fn = (s, dir) => {
        val ranked = graft.operators.ScaleOps.globalRowNumber(
          dailyRevenueM(s, dir), Seq(col("day")), "rn")
          .localCheckpoint(eager = false)
        val st = ranked.agg(count(lit(1)).as("n"), sum(col("ym")).as("sy"))
          .select(col("n"),
            round(col("sy").cast("double") / col("n").cast("double"), 9)
              .as("xbar"))
        val mr = ranked.select(col("rn"), col("ym").as("x0"))
          .join(ranked.select((col("rn") - 1).as("rn"), col("ym").as("x1")),
            Seq("rn"))
          .agg(count(lit(1)).as("nmr"),
            sum(abs(col("x1") - col("x0"))).as("smr"))
          .select(col("nmr"),
            round(col("smr").cast("double") / col("nmr").cast("double"), 9)
              .as("mrbar"))
        val lim = st.crossJoin(broadcast(mr))
          .select(col("n"), col("xbar"), col("mrbar"),
            (col("xbar").cast("decimal(20,9)") -
              lit(2.66).cast("decimal(3,2)") *
                col("mrbar").cast("decimal(12,9)")).cast("double").as("lcl"),
            (col("xbar").cast("decimal(20,9)") +
              lit(2.66).cast("decimal(3,2)") *
                col("mrbar").cast("decimal(12,9)")).cast("double").as("ucl"))
        val ooc = ranked.crossJoin(broadcast(lim))
          .select(col("rn"), col("n"), col("xbar"), col("mrbar"),
            col("lcl"), col("ucl"),
            col("ym").cast("double").as("x"))
          .agg(first(col("n")).as("n"), first(col("xbar")).as("xbar"),
            first(col("mrbar")).as("mrbar"), first(col("lcl")).as("lcl"),
            first(col("ucl")).as("ucl"),
            sum(when(col("x") < col("lcl") || col("x") > col("ucl"), 1L)
              .otherwise(0L)).as("n_beyond"),
            max(struct(round(abs(col("x") - col("xbar")), 9).as("ad"),
              col("rn").cast("long").as("rn"))).as("w"))
        ooc.select(col("n"), round(col("xbar"), 6).as("xbar"),
          round(col("mrbar"), 6).as("mr_bar"),
          round(col("lcl"), 6).as("lcl"), round(col("ucl"), 6).as("ucl"),
          col("n_beyond"), col("w.rn").as("worst_rn"),
          round(col("w.ad"), 6).as("worst_dev"))
      },
      oracle = Some(s"""
        WITH daily AS ($dailyRevenueMSql),
        r AS (SELECT ym, ROW_NUMBER() OVER (ORDER BY day) AS rn
              FROM daily),
        st AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 ROUND(CAST(SUM(ym) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
                   9) AS xbar
          FROM r),
        mr AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS nmr,
                 ROUND(CAST(SUM(ABS(b.ym - a.ym)) AS DOUBLE) /
                   CAST(COUNT(*) AS DOUBLE), 9) AS mrbar
          FROM r a JOIN r b ON b.rn = a.rn + 1),
        lim AS (
          SELECT n, xbar, mrbar,
                 CAST(CAST(xbar AS DECIMAL(20,9)) -
                   CAST(2.66 AS DECIMAL(3,2)) *
                   CAST(mrbar AS DECIMAL(12,9)) AS DOUBLE) AS lcl,
                 CAST(CAST(xbar AS DECIMAL(20,9)) +
                   CAST(2.66 AS DECIMAL(3,2)) *
                   CAST(mrbar AS DECIMAL(12,9)) AS DOUBLE) AS ucl
          FROM st CROSS JOIN mr),
        ooc AS (
          SELECT MAX(lim.n) AS n, MAX(lim.xbar) AS xbar,
                 MAX(lim.mrbar) AS mrbar, MAX(lim.lcl) AS lcl,
                 MAX(lim.ucl) AS ucl,
                 CAST(SUM(CASE WHEN CAST(ym AS DOUBLE) < lim.lcl OR
                   CAST(ym AS DOUBLE) > lim.ucl THEN 1 ELSE 0 END)
                   AS BIGINT) AS n_beyond,
                 MAX({'ad': ROUND(ABS(CAST(ym AS DOUBLE) - lim.xbar), 9),
                      'rn': CAST(rn AS BIGINT)}) AS w
          FROM r CROSS JOIN lim)
        SELECT n, ROUND(xbar, 6) + CAST(0 AS DOUBLE) AS xbar,
               ROUND(mrbar, 6) + CAST(0 AS DOUBLE) AS mr_bar,
               ROUND(lcl, 6) + CAST(0 AS DOUBLE) AS lcl,
               ROUND(ucl, 6) + CAST(0 AS DOUBLE) AS ucl,
               n_beyond, w['rn'] AS worst_rn,
               ROUND(w['ad'], 6) + CAST(0 AS DOUBLE) AS worst_dev
        FROM ooc""")),

    // Entropy-weighted TOPSIS multi-criteria ranking of brands on
    // (revenue↑, shipped quantity↑, mean unit price↓): vector-normalized
    // criteria, objective entropy weights (criteria that discriminate
    // get weight — no analyst judgment call), and closeness to the
    // ideal/anti-ideal pair — the standard MCDM machinery none of the
    // single-axis rankings (q7w ABC, qdl→BF swap, q8x top-k) provide.
    // Criterion scalars are DECIMAL sums; normalized values and ideals
    // snap to the 9-grid before min/max so both engines pick identical
    // poles; per-row distances have a FIXED three-term expression (no
    // float aggregation).
    "qf1_topsis_brands" -> Q(
      fn = (s, dir) => {
        val brands = t(s, dir, "lineitem")
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand"))
          .agg(((sum(col("l_extendedprice").cast("decimal(12,2)")) /
            lit(1000000)).cast("decimal(18,8)")).cast("double").as("rev"),
            sum(col("l_quantity").cast("long")).as("qty"),
            sum(col("l_extendedprice").cast("decimal(12,2)")).as("ext"),
            sum(col("l_quantity").cast("long")).as("qty2"))
          .select(col("p_brand"), col("rev"),
            col("qty").cast("double").as("qty"),
            round(col("ext").cast("double") / col("qty2").cast("double"), 9)
              .as("price"))
          .localCheckpoint(eager = false)
        val sc = brands.agg(count(lit(1)).as("nb"),
          sum(round(col("rev") * col("rev"), 6).cast("decimal(28,6)"))
            .as("q1"),
          sum(round(col("qty") * col("qty"), 6).cast("decimal(38,6)"))
            .as("q2"),
          sum(round(col("price") * col("price"), 6).cast("decimal(28,6)"))
            .as("q3"),
          sum(col("rev").cast("decimal(28,8)")).as("s1"),
          sum(col("qty").cast("decimal(28,0)")).as("s2"),
          sum(col("price").cast("decimal(28,9)")).as("s3"))
        val ent = brands.crossJoin(broadcast(sc))
          .select(col("nb"),
            (col("rev") / col("s1").cast("double")).as("p1"),
            (col("qty") / col("s2").cast("double")).as("p2"),
            (col("price") / col("s3").cast("double")).as("p3"))
          .agg(first(col("nb")).as("nb"),
            sum(round(col("p1") * log(col("p1")), 9).cast("decimal(18,9)"))
              .as("e1"),
            sum(round(col("p2") * log(col("p2")), 9).cast("decimal(18,9)"))
              .as("e2"),
            sum(round(col("p3") * log(col("p3")), 9).cast("decimal(18,9)"))
              .as("e3"))
          .select(col("nb"),
            (lit(1.0) + col("e1").cast("double") /
              log(col("nb").cast("double"))).as("d1"),
            (lit(1.0) + col("e2").cast("double") /
              log(col("nb").cast("double"))).as("d2"),
            (lit(1.0) + col("e3").cast("double") /
              log(col("nb").cast("double"))).as("d3"))
          .select(
            round(col("d1") / (col("d1") + col("d2") + col("d3")), 9)
              .as("w1"),
            round(col("d2") / (col("d1") + col("d2") + col("d3")), 9)
              .as("w2"),
            round(col("d3") / (col("d1") + col("d2") + col("d3")), 9)
              .as("w3"))
        val vmat = brands.crossJoin(broadcast(sc.select(col("q1"),
          col("q2"), col("q3")))).crossJoin(broadcast(ent))
          .select(col("p_brand"),
            round(col("w1") * col("rev") /
              sqrt(col("q1").cast("double")), 9).as("v1"),
            round(col("w2") * col("qty") /
              sqrt(col("q2").cast("double")), 9).as("v2"),
            round(col("w3") * col("price") /
              sqrt(col("q3").cast("double")), 9).as("v3"))
          .localCheckpoint(eager = false)
        val poles = vmat.agg(
          max(col("v1")).as("i1"), min(col("v1")).as("a1"),
          max(col("v2")).as("i2"), min(col("v2")).as("a2"),
          min(col("v3")).as("i3"), max(col("v3")).as("a3"))
        vmat.crossJoin(broadcast(poles))
          .select(col("p_brand"),
            sqrt((col("v1") - col("i1")) * (col("v1") - col("i1")) +
              (col("v2") - col("i2")) * (col("v2") - col("i2")) +
              (col("v3") - col("i3")) * (col("v3") - col("i3"))).as("dp"),
            sqrt((col("v1") - col("a1")) * (col("v1") - col("a1")) +
              (col("v2") - col("a2")) * (col("v2") - col("a2")) +
              (col("v3") - col("a3")) * (col("v3") - col("a3"))).as("dm"))
          .select(col("p_brand"),
            round(col("dm") / (col("dp") + col("dm")), 6).as("closeness"))
          .orderBy(col("closeness").desc, col("p_brand"))
      },
      oracle = Some("""
        WITH brands AS MATERIALIZED (
          SELECT p_brand,
                 CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) /
                   1000000 AS DECIMAL(18,8)) AS DOUBLE) AS rev,
                 CAST(CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT)
                   AS DOUBLE) AS qty,
                 ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
                     AS DOUBLE) /
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE), 9)
                   AS price
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY 1),
        sc AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS nb,
                 CAST(SUM(CAST(ROUND(rev * rev, 6) AS DECIMAL(28,6)))
                   AS DOUBLE) AS q1,
                 CAST(SUM(CAST(ROUND(qty * qty, 6) AS DECIMAL(38,6)))
                   AS DOUBLE) AS q2,
                 CAST(SUM(CAST(ROUND(price * price, 6) AS DECIMAL(28,6)))
                   AS DOUBLE) AS q3,
                 CAST(SUM(CAST(rev AS DECIMAL(28,8))) AS DOUBLE) AS s1,
                 CAST(SUM(CAST(qty AS DECIMAL(28,0))) AS DOUBLE) AS s2,
                 CAST(SUM(CAST(price AS DECIMAL(28,9))) AS DOUBLE) AS s3
          FROM brands),
        ent0 AS (
          SELECT MAX(sc.nb) AS nb,
                 SUM(CAST(ROUND((rev / sc.s1) * ln(rev / sc.s1), 9)
                   AS DECIMAL(18,9))) AS e1,
                 SUM(CAST(ROUND((qty / sc.s2) * ln(qty / sc.s2), 9)
                   AS DECIMAL(18,9))) AS e2,
                 SUM(CAST(ROUND((price / sc.s3) * ln(price / sc.s3), 9)
                   AS DECIMAL(18,9))) AS e3
          FROM brands CROSS JOIN sc),
        ent1 AS (
          SELECT (CAST(1 AS DOUBLE) + CAST(e1 AS DOUBLE) /
                   ln(CAST(nb AS DOUBLE))) AS d1,
                 (CAST(1 AS DOUBLE) + CAST(e2 AS DOUBLE) /
                   ln(CAST(nb AS DOUBLE))) AS d2,
                 (CAST(1 AS DOUBLE) + CAST(e3 AS DOUBLE) /
                   ln(CAST(nb AS DOUBLE))) AS d3
          FROM ent0),
        ent AS (
          SELECT ROUND(d1 / (d1 + d2 + d3), 9) AS w1,
                 ROUND(d2 / (d1 + d2 + d3), 9) AS w2,
                 ROUND(d3 / (d1 + d2 + d3), 9) AS w3
          FROM ent1),
        vmat AS MATERIALIZED (
          SELECT p_brand,
                 ROUND(ent.w1 * rev / sqrt(sc.q1), 9) AS v1,
                 ROUND(ent.w2 * qty / sqrt(sc.q2), 9) AS v2,
                 ROUND(ent.w3 * price / sqrt(sc.q3), 9) AS v3
          FROM brands CROSS JOIN sc CROSS JOIN ent),
        poles AS (
          SELECT MAX(v1) AS i1, MIN(v1) AS a1,
                 MAX(v2) AS i2, MIN(v2) AS a2,
                 MIN(v3) AS i3, MAX(v3) AS a3
          FROM vmat)
        SELECT p_brand,
               ROUND(sqrt((v1 - a1) * (v1 - a1) + (v2 - a2) * (v2 - a2) +
                   (v3 - a3) * (v3 - a3)) /
                 (sqrt((v1 - i1) * (v1 - i1) + (v2 - i2) * (v2 - i2) +
                   (v3 - i3) * (v3 - i3)) +
                  sqrt((v1 - a1) * (v1 - a1) + (v2 - a2) * (v2 - a2) +
                   (v3 - a3) * (v3 - a3))), 6) + CAST(0 AS DOUBLE)
                 AS closeness
        FROM vmat CROSS JOIN poles
        ORDER BY closeness DESC, p_brand""")),

    // Band-averaged squared coherence between the daily all-events and
    // purchase series: cross-spectrum over Fourier k with the qca/qdj
    // phase-mod-n trig recipe, auto/cross spectra averaged over
    // 3-frequency bands (raw single-taper coherence is identically 1 —
    // the classic trap; band smoothing is what makes it informative) —
    // the frequency-domain companion of q8h's time-domain lagged
    // cross-correlation: WHICH rhythm do the two series share? Spectra
    // are 9-grid; band sums ride DECIMAL.
    "qf3_spectral_coherence" -> Q(
      fn = (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy((unix_millis(col("ts")) / lit(86400000L)).cast("long")
            .as("day"))
          .agg(count(lit(1)).as("xa"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("ya"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(daily,
          Seq(col("day")), "rn").localCheckpoint(eager = false)
        val mu = ranked.agg(count(lit(1)).as("n"),
          sum(col("xa")).as("sx"), sum(col("ya")).as("sy"))
          .select(col("n"),
            round(col("sx").cast("double") / col("n").cast("double"), 9)
              .as("mx"),
            round(col("sy").cast("double") / col("n").cast("double"), 9)
              .as("my"))
        val terms = ranked.crossJoin(broadcast(mu))
          .select(col("rn"), col("n"),
            (col("xa").cast("double") - col("mx")).as("cx"),
            (col("ya").cast("double") - col("my")).as("cy"),
            explode(sequence(lit(1L), lit(8L))).as("k"))
          .withColumn("ang", lit(2.0 * math.Pi) *
            pmod(col("rn") * col("k"), col("n")).cast("double") /
            col("n").cast("double"))
          .groupBy(col("k"))
          .agg(
            sum(round(col("cx") * cos(col("ang")), 9).cast("decimal(28,9)"))
              .as("ax"),
            sum(round(col("cx") * sin(col("ang")), 9).cast("decimal(28,9)"))
              .as("bx"),
            sum(round(col("cy") * cos(col("ang")), 9).cast("decimal(28,9)"))
              .as("ay"),
            sum(round(col("cy") * sin(col("ang")), 9).cast("decimal(28,9)"))
              .as("by"))
          .select(col("k"),
            round(col("ax").cast("double") * col("ax").cast("double") +
              col("bx").cast("double") * col("bx").cast("double"), 9)
              .as("pxx"),
            round(col("ay").cast("double") * col("ay").cast("double") +
              col("by").cast("double") * col("by").cast("double"), 9)
              .as("pyy"),
            round(col("ax").cast("double") * col("ay").cast("double") +
              col("bx").cast("double") * col("by").cast("double"), 9)
              .as("cc"),
            round(col("bx").cast("double") * col("ay").cast("double") -
              col("ax").cast("double") * col("by").cast("double"), 9)
              .as("qq"))
          .localCheckpoint(eager = false)
        val bands = terms.select(col("k"), col("pxx"), col("pyy"),
          col("cc"), col("qq"))
          .join(terms.select(col("k").as("k2"), col("pxx").as("px2"),
            col("pyy").as("py2"), col("cc").as("cc2"),
            col("qq").as("qq2")),
            col("k2").between(col("k") - 1, col("k") + 1))
          .filter(col("k") >= 2 && col("k") <= 7)
          .groupBy(col("k"))
          .agg(sum(col("px2").cast("decimal(28,9)")).as("spx"),
            sum(col("py2").cast("decimal(28,9)")).as("spy"),
            sum(col("cc2").cast("decimal(28,9)")).as("scc"),
            sum(col("qq2").cast("decimal(28,9)")).as("sqq"))
        bands.select(col("k"),
          round((col("scc").cast("double") * col("scc").cast("double") +
            col("sqq").cast("double") * col("sqq").cast("double")) /
            (col("spx").cast("double") * col("spy").cast("double")), 6)
            .as("coherence2"))
          .orderBy(col("k"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
                 CAST(COUNT(*) AS BIGINT) AS xa,
                 CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                   END) AS BIGINT) AS ya
          FROM events GROUP BY 1),
        r AS (SELECT xa, ya, ROW_NUMBER() OVER (ORDER BY day) AS rn
              FROM daily),
        mu AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 ROUND(CAST(SUM(xa) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
                   9) AS mx,
                 ROUND(CAST(SUM(ya) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
                   9) AS my
          FROM r),
        ks AS (SELECT CAST(UNNEST(range(1, 9)) AS BIGINT) AS k),
        terms0 AS (
          SELECT k,
                 SUM(CAST(ROUND((CAST(xa AS DOUBLE) - mu.mx) *
                   COS(CAST(2 AS DOUBLE) * pi() *
                     CAST((rn * k) % mu.n AS DOUBLE) /
                     CAST(mu.n AS DOUBLE)), 9) AS DECIMAL(28,9))) AS ax,
                 SUM(CAST(ROUND((CAST(xa AS DOUBLE) - mu.mx) *
                   SIN(CAST(2 AS DOUBLE) * pi() *
                     CAST((rn * k) % mu.n AS DOUBLE) /
                     CAST(mu.n AS DOUBLE)), 9) AS DECIMAL(28,9))) AS bx,
                 SUM(CAST(ROUND((CAST(ya AS DOUBLE) - mu.my) *
                   COS(CAST(2 AS DOUBLE) * pi() *
                     CAST((rn * k) % mu.n AS DOUBLE) /
                     CAST(mu.n AS DOUBLE)), 9) AS DECIMAL(28,9))) AS ay,
                 SUM(CAST(ROUND((CAST(ya AS DOUBLE) - mu.my) *
                   SIN(CAST(2 AS DOUBLE) * pi() *
                     CAST((rn * k) % mu.n AS DOUBLE) /
                     CAST(mu.n AS DOUBLE)), 9) AS DECIMAL(28,9))) AS by
          FROM r CROSS JOIN ks CROSS JOIN mu
          GROUP BY 1),
        terms AS MATERIALIZED (
          SELECT k,
                 ROUND(CAST(ax AS DOUBLE) * CAST(ax AS DOUBLE) +
                   CAST(bx AS DOUBLE) * CAST(bx AS DOUBLE), 9) AS pxx,
                 ROUND(CAST(ay AS DOUBLE) * CAST(ay AS DOUBLE) +
                   CAST(by AS DOUBLE) * CAST(by AS DOUBLE), 9) AS pyy,
                 ROUND(CAST(ax AS DOUBLE) * CAST(ay AS DOUBLE) +
                   CAST(bx AS DOUBLE) * CAST(by AS DOUBLE), 9) AS cc,
                 ROUND(CAST(bx AS DOUBLE) * CAST(ay AS DOUBLE) -
                   CAST(ax AS DOUBLE) * CAST(by AS DOUBLE), 9) AS qq
          FROM terms0),
        bands AS (
          SELECT a.k,
                 SUM(CAST(b.pxx AS DECIMAL(28,9))) AS spx,
                 SUM(CAST(b.pyy AS DECIMAL(28,9))) AS spy,
                 SUM(CAST(b.cc AS DECIMAL(28,9))) AS scc,
                 SUM(CAST(b.qq AS DECIMAL(28,9))) AS sqq
          FROM terms a JOIN terms b ON b.k BETWEEN a.k - 1 AND a.k + 1
          WHERE a.k >= 2 AND a.k <= 7
          GROUP BY a.k)
        SELECT k,
               ROUND((CAST(scc AS DOUBLE) * CAST(scc AS DOUBLE) +
                 CAST(sqq AS DOUBLE) * CAST(sqq AS DOUBLE)) /
                 (CAST(spx AS DOUBLE) * CAST(spy AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS coherence2
        FROM bands ORDER BY k""")),

    // VAR(1) fit of the centered (all-events, purchases) daily pair:
    // per-equation two-regressor OLS by Cramer's rule on the lag
    // moments, the companion-matrix spectral radius (closed-form 2×2
    // eigenvalues, complex case via sqrt(det)) and the stability
    // verdict — the multivariate dynamics qc0's Granger test
    // (one-directional F) and qb9's univariate AR(2) each see only half
    // of. Lag moments ride round-6 DECIMAL sums; all four coefficients
    // snap to the 9-grid; the eigen branch is a deterministic CASE on
    // the discriminant's sign.
    "qf4_var1_fit" -> Q(
      fn = (s, dir) => {
        val daily = t(s, dir, "events")
          .groupBy((unix_millis(col("ts")) / lit(86400000L)).cast("long")
            .as("day"))
          .agg(count(lit(1)).as("xa"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("ya"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(daily,
          Seq(col("day")), "rn").localCheckpoint(eager = false)
        val mu = ranked.agg(count(lit(1)).as("n"),
          sum(col("xa")).as("sx"), sum(col("ya")).as("sy"))
          .select(
            round(col("sx").cast("double") / col("n").cast("double"), 9)
              .as("mx"),
            round(col("sy").cast("double") / col("n").cast("double"), 9)
              .as("my"))
        val cen = ranked.crossJoin(broadcast(mu))
          .select(col("rn"),
            (col("xa").cast("double") - col("mx")).as("cx"),
            (col("ya").cast("double") - col("my")).as("cy"))
          .localCheckpoint(eager = false)
        val lag = cen.select(col("rn"), col("cx").as("x1"),
          col("cy").as("y1"))
          .join(cen.select((col("rn") + 1).as("rn"), col("cx").as("x0"),
            col("cy").as("y0")), Seq("rn"))
        val mom = lag.agg(
          sum(round(col("x0") * col("x0"), 6).cast("decimal(28,6)"))
            .as("sxx"),
          sum(round(col("y0") * col("y0"), 6).cast("decimal(28,6)"))
            .as("syy"),
          sum(round(col("x0") * col("y0"), 6).cast("decimal(28,6)"))
            .as("sxy"),
          sum(round(col("x1") * col("x0"), 6).cast("decimal(28,6)"))
            .as("b1x"),
          sum(round(col("x1") * col("y0"), 6).cast("decimal(28,6)"))
            .as("b1y"),
          sum(round(col("y1") * col("x0"), 6).cast("decimal(28,6)"))
            .as("b2x"),
          sum(round(col("y1") * col("y0"), 6).cast("decimal(28,6)"))
            .as("b2y"))
          .select(col("sxx").cast("double").as("sxx"),
            col("syy").cast("double").as("syy"),
            col("sxy").cast("double").as("sxy"),
            col("b1x").cast("double").as("b1x"),
            col("b1y").cast("double").as("b1y"),
            col("b2x").cast("double").as("b2x"),
            col("b2y").cast("double").as("b2y"))
          .withColumn("dd", col("sxx") * col("syy") - col("sxy") * col("sxy"))
          .select(
            round((col("b1x") * col("syy") - col("b1y") * col("sxy")) /
              col("dd"), 9).as("a11"),
            round((col("b1y") * col("sxx") - col("b1x") * col("sxy")) /
              col("dd"), 9).as("a12"),
            round((col("b2x") * col("syy") - col("b2y") * col("sxy")) /
              col("dd"), 9).as("a21"),
            round((col("b2y") * col("sxx") - col("b2x") * col("sxy")) /
              col("dd"), 9).as("a22"))
        val eig = mom
          .withColumn("tr", col("a11") + col("a22"))
          .withColumn("dt", round(col("a11") * col("a22"), 9) -
            round(col("a12") * col("a21"), 9))
          .withColumn("disc", col("tr") * col("tr") - lit(4.0) * col("dt"))
          .withColumn("rho",
            when(col("disc") >= 0,
              greatest(abs((col("tr") + sqrt(col("disc"))) / lit(2.0)),
                abs((col("tr") - sqrt(col("disc"))) / lit(2.0))))
              .otherwise(sqrt(abs(col("dt")))))
        eig.select(round(col("a11"), 6).as("a11"),
          round(col("a12"), 6).as("a12"),
          round(col("a21"), 6).as("a21"),
          round(col("a22"), 6).as("a22"),
          round(col("rho"), 6).as("spectral_radius"),
          when(col("rho") < 1.0, lit("stable")).otherwise(lit("unstable"))
            .as("verdict"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
                 CAST(COUNT(*) AS BIGINT) AS xa,
                 CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                   END) AS BIGINT) AS ya
          FROM events GROUP BY 1),
        r AS (SELECT xa, ya, ROW_NUMBER() OVER (ORDER BY day) AS rn
              FROM daily),
        mu AS (
          SELECT ROUND(CAST(SUM(xa) AS DOUBLE) /
                   CAST(COUNT(*) AS DOUBLE), 9) AS mx,
                 ROUND(CAST(SUM(ya) AS DOUBLE) /
                   CAST(COUNT(*) AS DOUBLE), 9) AS my
          FROM r),
        cen AS MATERIALIZED (
          SELECT rn, CAST(xa AS DOUBLE) - mu.mx AS cx,
                 CAST(ya AS DOUBLE) - mu.my AS cy
          FROM r CROSS JOIN mu),
        lag AS (
          SELECT a.cx AS x1, a.cy AS y1, b.cx AS x0, b.cy AS y0
          FROM cen a JOIN cen b ON b.rn = a.rn - 1),
        mom0 AS (
          SELECT CAST(SUM(CAST(ROUND(x0 * x0, 6) AS DECIMAL(28,6)))
                   AS DOUBLE) AS sxx,
                 CAST(SUM(CAST(ROUND(y0 * y0, 6) AS DECIMAL(28,6)))
                   AS DOUBLE) AS syy,
                 CAST(SUM(CAST(ROUND(x0 * y0, 6) AS DECIMAL(28,6)))
                   AS DOUBLE) AS sxy,
                 CAST(SUM(CAST(ROUND(x1 * x0, 6) AS DECIMAL(28,6)))
                   AS DOUBLE) AS b1x,
                 CAST(SUM(CAST(ROUND(x1 * y0, 6) AS DECIMAL(28,6)))
                   AS DOUBLE) AS b1y,
                 CAST(SUM(CAST(ROUND(y1 * x0, 6) AS DECIMAL(28,6)))
                   AS DOUBLE) AS b2x,
                 CAST(SUM(CAST(ROUND(y1 * y0, 6) AS DECIMAL(28,6)))
                   AS DOUBLE) AS b2y
          FROM lag),
        mom AS (
          SELECT ROUND((b1x * syy - b1y * sxy) /
                   (sxx * syy - sxy * sxy), 9) AS a11,
                 ROUND((b1y * sxx - b1x * sxy) /
                   (sxx * syy - sxy * sxy), 9) AS a12,
                 ROUND((b2x * syy - b2y * sxy) /
                   (sxx * syy - sxy * sxy), 9) AS a21,
                 ROUND((b2y * sxx - b2x * sxy) /
                   (sxx * syy - sxy * sxy), 9) AS a22
          FROM mom0),
        eig0 AS (
          SELECT *, a11 + a22 AS tr,
                 ROUND(a11 * a22, 9) - ROUND(a12 * a21, 9) AS dt
          FROM mom),
        eig1 AS (
          SELECT *, tr * tr - CAST(4 AS DOUBLE) * dt AS disc
          FROM eig0),
        eig AS (
          SELECT *,
                 CASE WHEN disc >= CAST(0 AS DOUBLE) THEN
                   GREATEST(ABS((tr + sqrt(disc)) / CAST(2 AS DOUBLE)),
                     ABS((tr - sqrt(disc)) / CAST(2 AS DOUBLE)))
                 ELSE sqrt(ABS(dt)) END AS rho
          FROM eig1)
        SELECT ROUND(a11, 6) + CAST(0 AS DOUBLE) AS a11,
               ROUND(a12, 6) + CAST(0 AS DOUBLE) AS a12,
               ROUND(a21, 6) + CAST(0 AS DOUBLE) AS a21,
               ROUND(a22, 6) + CAST(0 AS DOUBLE) AS a22,
               ROUND(rho, 6) + CAST(0 AS DOUBLE) AS spectral_radius,
               CASE WHEN rho < CAST(1 AS DOUBLE) THEN 'stable'
                    ELSE 'unstable' END AS verdict
        FROM eig""")),

    // Stationary distribution of the q6b user-journey Markov chain by
    // three unrolled power-iteration rounds from the uniform vector
    // (the q4b recipe: transition probabilities and every iterate on
    // the 9-grid, matrix-vector products as grouped DECIMAL sums) —
    // where the journey SETTLES, beside the empirical state mix it is
    // converging from (both emitted per state). qah solves the
    // absorbing case; this is the ergodic one.
    "qf5_markov_stationary" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id")
          .orderBy(col("ts_ms"), col("event_id"))
        val tr = t(s, dir, "events")
          .withColumn("ts_ms", unix_millis(col("ts")))
          .select(col("user_id"), col("ts_ms"), col("event_id"),
            col("event_type"))
          .withColumn("nxt", lead(col("event_type"), 1).over(w))
          .filter(col("nxt").isNotNull)
          .groupBy(col("event_type").as("a"), col("nxt").as("b"))
          .agg(count(lit(1)).as("n"))
          .localCheckpoint(eager = false)
        val outd = tr.groupBy(col("a")).agg(sum(col("n")).as("tot"))
        val pmat = tr.join(outd, Seq("a"))
          .select(col("a"), col("b"),
            round(col("n").cast("double") / col("tot").cast("double"), 9)
              .as("p"))
          .localCheckpoint(eager = false)
        val states = pmat.select(col("a").as("st")).distinct()
        val k0 = states.agg(count(lit(1)).as("k"))
        val v0 = states.crossJoin(broadcast(k0))
          .select(col("st"),
            round(lit(1.0) / col("k").cast("double"), 9).as("v"))
        def step(v: DataFrame) = pmat
          .join(v.select(col("st").as("a"), col("v")), Seq("a"))
          .groupBy(col("b"))
          .agg(sum(round(col("v") * col("p"), 9).cast("decimal(18,9)"))
            .as("vd"))
          .select(col("b").as("st"),
            round(col("vd").cast("double"), 9).as("v"))
        val v3 = step(step(step(v0)))
        val emp = tr.groupBy(col("a")).agg(sum(col("n")).as("cnt"))
          .crossJoin(broadcast(tr.agg(sum(col("n")).as("ntot"))))
          .select(col("a").as("st"),
            round(col("cnt").cast("double") / col("ntot").cast("double"), 6)
              .as("p_empirical"))
        emp.join(v3, Seq("st"))
          .select(col("st").as("state"), col("p_empirical"),
            round(col("v"), 6).as("p_stationary_3it"))
          .orderBy(col("state"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id, event_type,
                 lead(event_type) OVER (PARTITION BY user_id
                   ORDER BY epoch_ms(ts), event_id) AS nxt
          FROM events),
        tr AS MATERIALIZED (
          SELECT event_type AS a, nxt AS b, CAST(COUNT(*) AS BIGINT) AS n
          FROM e WHERE nxt IS NOT NULL GROUP BY 1, 2),
        outd AS (
          SELECT a, CAST(SUM(n) AS BIGINT) AS tot FROM tr GROUP BY 1),
        pmat AS MATERIALIZED (
          SELECT tr.a, tr.b,
                 ROUND(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE), 9) AS p
          FROM tr JOIN outd ON tr.a = outd.a),
        states AS (SELECT DISTINCT a AS st FROM pmat),
        k0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM states),
        v0 AS (
          SELECT st, ROUND(CAST(1 AS DOUBLE) / CAST(k AS DOUBLE), 9) AS v
          FROM states CROSS JOIN k0),
        v1 AS (
          SELECT b AS st,
                 ROUND(CAST(SUM(CAST(ROUND(v * p, 9) AS DECIMAL(18,9)))
                   AS DOUBLE), 9) AS v
          FROM pmat JOIN v0 ON pmat.a = v0.st GROUP BY b),
        v2 AS (
          SELECT b AS st,
                 ROUND(CAST(SUM(CAST(ROUND(v * p, 9) AS DECIMAL(18,9)))
                   AS DOUBLE), 9) AS v
          FROM pmat JOIN v1 ON pmat.a = v1.st GROUP BY b),
        v3 AS (
          SELECT b AS st,
                 ROUND(CAST(SUM(CAST(ROUND(v * p, 9) AS DECIMAL(18,9)))
                   AS DOUBLE), 9) AS v
          FROM pmat JOIN v2 ON pmat.a = v2.st GROUP BY b),
        emp AS (
          SELECT a AS st,
                 ROUND(CAST(SUM(n) AS DOUBLE) /
                   CAST((SELECT SUM(n) FROM tr) AS DOUBLE), 6)
                   AS p_empirical
          FROM tr GROUP BY 1)
        SELECT emp.st AS state, p_empirical,
               ROUND(v3.v, 6) + CAST(0 AS DOUBLE) AS p_stationary_3it
        FROM emp JOIN v3 ON emp.st = v3.st
        ORDER BY state""")),

    // Simpson's-paradox detector for the weekend-purchase association:
    // the marginal odds ratio beside each week stratum's OR with a
    // per-stratum reversal flag — does aggregation FLIP the story the
    // strata tell (the reason qdn stratifies at all, here surfaced as
    // an explicit audit row per stratum)? Haldane +0.5 smoothing keeps
    // empty cells finite (noted); sign comparison happens on the
    // identically-computed doubles in both engines.
    "qf6_simpsons_paradox" -> Q(
      fn = (s, dir) => {
        val e = t(s, dir, "events")
          .select((unix_millis(col("ts")) / lit(86400000L)).cast("long")
            .as("day"), col("event_type"))
        val rel = e.crossJoin(broadcast(e.agg(min(col("day")).as("d0"))))
          .select(((col("day") - col("d0")) / lit(7)).cast("long").as("wk"),
            (pmod(col("day") - col("d0"), lit(7L)) >= 5).as("wknd"),
            (col("event_type") === "purchase").as("pur"))
        val strata = rel.groupBy(col("wk"))
          .agg(
            sum(when(col("wknd") && col("pur"), 1L).otherwise(0L)).as("a"),
            sum(when(col("wknd") && !col("pur"), 1L).otherwise(0L)).as("b"),
            sum(when(!col("wknd") && col("pur"), 1L).otherwise(0L)).as("c"),
            sum(when(!col("wknd") && !col("pur"), 1L).otherwise(0L)).as("d"))
          .localCheckpoint(eager = false)
        val marg = strata.agg(sum(col("a")).as("ma"), sum(col("b")).as("mb"),
          sum(col("c")).as("mc"), sum(col("d")).as("md"))
          .select(((col("ma").cast("double") + 0.5) *
            (col("md").cast("double") + 0.5) /
            ((col("mb").cast("double") + 0.5) *
              (col("mc").cast("double") + 0.5))).as("or_marg"))
        strata.crossJoin(broadcast(marg))
          .select(col("wk"), col("a"), col("b"), col("c"), col("d"),
            ((col("a").cast("double") + 0.5) *
              (col("d").cast("double") + 0.5) /
              ((col("b").cast("double") + 0.5) *
                (col("c").cast("double") + 0.5))).as("or_k"),
            col("or_marg"))
          .select(col("wk"), col("a"), col("b"), col("c"), col("d"),
            round(col("or_k"), 6).as("or_stratum"),
            round(col("or_marg"), 6).as("or_marginal"),
            when((col("or_k") > 1.0 && col("or_marg") < 1.0) ||
              (col("or_k") < 1.0 && col("or_marg") > 1.0), lit("yes"))
              .otherwise(lit("no")).as("reversed"))
          .orderBy(col("wk"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
                 event_type
          FROM events),
        d0 AS (SELECT MIN(day) AS d0 FROM e),
        rel AS (
          SELECT (day - d0.d0) // 7 AS wk,
                 ((day - d0.d0) % 7) >= 5 AS wknd,
                 event_type = 'purchase' AS pur
          FROM e CROSS JOIN d0),
        strata AS MATERIALIZED (
          SELECT wk,
                 CAST(SUM(CASE WHEN wknd AND pur THEN 1 ELSE 0 END)
                   AS BIGINT) AS a,
                 CAST(SUM(CASE WHEN wknd AND NOT pur THEN 1 ELSE 0 END)
                   AS BIGINT) AS b,
                 CAST(SUM(CASE WHEN NOT wknd AND pur THEN 1 ELSE 0 END)
                   AS BIGINT) AS c,
                 CAST(SUM(CASE WHEN NOT wknd AND NOT pur THEN 1 ELSE 0
                   END) AS BIGINT) AS d
          FROM rel GROUP BY 1),
        marg AS (
          SELECT (CAST(SUM(a) AS DOUBLE) + CAST(0.5 AS DOUBLE)) *
                 (CAST(SUM(d) AS DOUBLE) + CAST(0.5 AS DOUBLE)) /
                 ((CAST(SUM(b) AS DOUBLE) + CAST(0.5 AS DOUBLE)) *
                  (CAST(SUM(c) AS DOUBLE) + CAST(0.5 AS DOUBLE)))
                   AS or_marg
          FROM strata)
        SELECT wk, a, b, c, d,
               ROUND((CAST(a AS DOUBLE) + CAST(0.5 AS DOUBLE)) *
                 (CAST(d AS DOUBLE) + CAST(0.5 AS DOUBLE)) /
                 ((CAST(b AS DOUBLE) + CAST(0.5 AS DOUBLE)) *
                  (CAST(c AS DOUBLE) + CAST(0.5 AS DOUBLE))), 6)
                 + CAST(0 AS DOUBLE) AS or_stratum,
               ROUND(or_marg, 6) + CAST(0 AS DOUBLE) AS or_marginal,
               CASE WHEN ((CAST(a AS DOUBLE) + CAST(0.5 AS DOUBLE)) *
                 (CAST(d AS DOUBLE) + CAST(0.5 AS DOUBLE)) /
                 ((CAST(b AS DOUBLE) + CAST(0.5 AS DOUBLE)) *
                  (CAST(c AS DOUBLE) + CAST(0.5 AS DOUBLE))) >
                    CAST(1 AS DOUBLE)
                 AND or_marg < CAST(1 AS DOUBLE)) OR
                 ((CAST(a AS DOUBLE) + CAST(0.5 AS DOUBLE)) *
                 (CAST(d AS DOUBLE) + CAST(0.5 AS DOUBLE)) /
                 ((CAST(b AS DOUBLE) + CAST(0.5 AS DOUBLE)) *
                  (CAST(c AS DOUBLE) + CAST(0.5 AS DOUBLE))) <
                    CAST(1 AS DOUBLE)
                 AND or_marg > CAST(1 AS DOUBLE))
               THEN 'yes' ELSE 'no' END AS reversed
        FROM strata CROSS JOIN marg ORDER BY wk""")),

    // Disproportionality screening of return rates by brand — the
    // pharmacovigilance signal battery (PRR, ROR, and the BCPNN
    // information component IC = log₂(a·N / ((a+b)(a+c)))) applied to
    // "which brands return disproportionately": each brand's returns
    // against the rest of the corpus, top 10 by IC — the
    // screening-scale version of a per-brand chi-square loop. Cells
    // are exact BIGINTs; ln is the only float link; total (IC, brand)
    // output order.
    "qf7_disproportionality" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem")
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .select(col("p_brand"),
            (col("l_returnflag") === "R").as("ret"))
        val cells = li.groupBy(col("p_brand"))
          .agg(sum(when(col("ret"), 1L).otherwise(0L)).as("a"),
            sum(when(!col("ret"), 1L).otherwise(0L)).as("b"))
          .localCheckpoint(eager = false)
        val tot = cells.agg(sum(col("a")).as("ta"), sum(col("b")).as("tb"))
        val scored = cells.crossJoin(broadcast(tot))
          .select(col("p_brand"), col("a"), col("b"),
            (col("ta") - col("a")).as("c"), (col("tb") - col("b")).as("d"),
            (col("ta") + col("tb")).as("nn"))
          .select(col("p_brand"), col("a"), col("b"), col("c"), col("d"),
            round((col("a").cast("double") /
              (col("a") + col("b")).cast("double")) /
              (col("c").cast("double") /
                (col("c") + col("d")).cast("double")), 6).as("prr"),
            round(col("a").cast("double") * col("d").cast("double") /
              (col("b").cast("double") * col("c").cast("double")), 6)
              .as("ror"),
            round(log(col("a").cast("double") * col("nn").cast("double") /
              ((col("a") + col("b")).cast("double") *
                (col("a") + col("c")).cast("double"))) / log(lit(2.0)), 6)
              .as("ic"))
        scored.orderBy(col("ic").desc, col("p_brand")).limit(10)
      },
      oracle = Some("""
        WITH li AS (
          SELECT p_brand, l_returnflag = 'R' AS ret
          FROM lineitem JOIN part ON l_partkey = p_partkey),
        cells AS MATERIALIZED (
          SELECT p_brand,
                 CAST(SUM(CASE WHEN ret THEN 1 ELSE 0 END) AS BIGINT)
                   AS a,
                 CAST(SUM(CASE WHEN NOT ret THEN 1 ELSE 0 END) AS BIGINT)
                   AS b
          FROM li GROUP BY 1),
        tot AS (
          SELECT CAST(SUM(a) AS BIGINT) AS ta,
                 CAST(SUM(b) AS BIGINT) AS tb
          FROM cells),
        scored AS (
          SELECT p_brand, a, b, ta - a AS c, tb - b AS d,
                 ROUND((CAST(a AS DOUBLE) / CAST(a + b AS DOUBLE)) /
                   (CAST(ta - a AS DOUBLE) /
                    CAST(ta - a + tb - b AS DOUBLE)), 6) AS prr,
                 ROUND(CAST(a AS DOUBLE) * CAST(tb - b AS DOUBLE) /
                   (CAST(b AS DOUBLE) * CAST(ta - a AS DOUBLE)), 6)
                   AS ror,
                 ROUND(ln(CAST(a AS DOUBLE) * CAST(ta + tb AS DOUBLE) /
                   (CAST(a + b AS DOUBLE) * CAST(ta AS DOUBLE))) /
                   ln(CAST(2 AS DOUBLE)), 6) AS ic
          FROM cells CROSS JOIN tot)
        SELECT p_brand, a, b, c, d,
               prr + CAST(0 AS DOUBLE) AS prr,
               ror + CAST(0 AS DOUBLE) AS ror,
               ic + CAST(0 AS DOUBLE) AS ic
        FROM scored ORDER BY ic DESC, p_brand LIMIT 10""")),

    // Process-capability indices for order value in thousands against
    // deterministic spec limits (median ± 25%): Cp (spread capability),
    // Cpk (centered capability) and the observed out-of-spec rate —
    // the SPC acceptance numbers qf2's I-MR chart (stability) is the
    // prerequisite for. The median is an exact order statistic; sigma
    // comes from the established round-6 DECIMAL moments; the spec
    // band is exact DECIMAL arithmetic.
    "qf8_process_capability" -> Q(
      fn = (s, dir) => {
        val o = t(s, dir, "orders")
          .select((col("o_totalprice").cast("decimal(18,2)") / lit(1000))
            .cast("decimal(15,5)").as("y"), col("o_orderkey").as("k"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(o,
          Seq(col("y"), col("k")), "vr").localCheckpoint(eager = false)
        val n0 = ranked.agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
        val med = ranked.crossJoin(broadcast(n0))
          .filter(col("vr") ===
            floor((col("n") + 1).cast("double") / lit(2.0)).cast("long"))
          .select(col("y").as("med"))
        val lims = med.select(col("med"),
          (col("med") * lit(0.75).cast("decimal(3,2)"))
            .cast("decimal(18,7)").as("lsl"),
          (col("med") * lit(1.25).cast("decimal(3,2)"))
            .cast("decimal(18,7)").as("usl"))
        val st = ranked.crossJoin(broadcast(n0.select(col("n"))))
          .agg(first(col("n")).as("n"), sum(col("y")).as("sy"))
          .select(col("n"),
            round(col("sy").cast("double") / col("n").cast("double"), 9)
              .as("mu"))
        val mom = ranked.crossJoin(broadcast(st))
          .select(col("n"), col("mu"),
            (col("y").cast("double") - col("mu")).as("c"), col("y"))
          .crossJoin(broadcast(lims))
          .agg(first(col("n")).as("n"), first(col("mu")).as("mu"),
            first(col("med").cast("double")).as("medd"),
            first(col("lsl").cast("double")).as("lsl"),
            first(col("usl").cast("double")).as("usl"),
            sum(round(col("c") * col("c"), 6).cast("decimal(28,6)"))
              .as("ss"),
            sum(when(col("y") < col("lsl") || col("y") > col("usl"), 1L)
              .otherwise(0L)).as("oos"))
          .select(col("n"), col("mu"), col("medd"), col("lsl"), col("usl"),
            round(sqrt(col("ss").cast("double") /
              (col("n") - 1).cast("double")), 9).as("sg"), col("oos"))
        mom.select(col("n"),
          round(col("medd"), 6).as("median_k"),
          round(col("lsl"), 6).as("lsl"), round(col("usl"), 6).as("usl"),
          round((col("usl") - col("lsl")) / (lit(6.0) * col("sg")), 6)
            .as("cp"),
          round(least(col("usl") - col("mu"), col("mu") - col("lsl")) /
            (lit(3.0) * col("sg")), 6).as("cpk"),
          round(col("oos").cast("double") / col("n").cast("double"), 6)
            .as("oos_rate"))
      },
      oracle = Some("""
        WITH o AS (
          SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) / 1000
                   AS DECIMAL(15,5)) AS y,
                 o_orderkey AS k
          FROM orders),
        r AS (
          SELECT y, ROW_NUMBER() OVER (ORDER BY y, k) AS vr FROM o),
        n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM r),
        med AS (
          SELECT y AS med FROM r CROSS JOIN n0
          WHERE vr = (n + 1) // 2),
        lims AS (
          SELECT med,
                 CAST(med * CAST(0.75 AS DECIMAL(3,2)) AS DECIMAL(18,7))
                   AS lsl,
                 CAST(med * CAST(1.25 AS DECIMAL(3,2)) AS DECIMAL(18,7))
                   AS usl
          FROM med),
        st AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 ROUND(CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
                   9) AS mu
          FROM r),
        mom AS (
          SELECT MAX(st.n) AS n, MAX(st.mu) AS mu,
                 MAX(CAST(lims.med AS DOUBLE)) AS medd,
                 MAX(CAST(lims.lsl AS DOUBLE)) AS lsl,
                 MAX(CAST(lims.usl AS DOUBLE)) AS usl,
                 CAST(SUM(CAST(ROUND((CAST(y AS DOUBLE) - st.mu) *
                   (CAST(y AS DOUBLE) - st.mu), 6) AS DECIMAL(28,6)))
                   AS DOUBLE) AS ss,
                 CAST(SUM(CASE WHEN y < lims.lsl OR y > lims.usl THEN 1
                   ELSE 0 END) AS BIGINT) AS oos
          FROM r CROSS JOIN st CROSS JOIN lims),
        pre AS (
          SELECT n, mu, medd, lsl, usl, oos,
                 ROUND(sqrt(ss / CAST(n - 1 AS DOUBLE)), 9) AS sg
          FROM mom)
        SELECT n,
               ROUND(medd, 6) + CAST(0 AS DOUBLE) AS median_k,
               ROUND(lsl, 6) + CAST(0 AS DOUBLE) AS lsl,
               ROUND(usl, 6) + CAST(0 AS DOUBLE) AS usl,
               ROUND((usl - lsl) / (CAST(6 AS DOUBLE) * sg), 6)
                 + CAST(0 AS DOUBLE) AS cp,
               ROUND(LEAST(usl - mu, mu - lsl) /
                 (CAST(3 AS DOUBLE) * sg), 6) + CAST(0 AS DOUBLE)
                 AS cpk,
               ROUND(CAST(oos AS DOUBLE) / CAST(n AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS oos_rate
        FROM pre""")),

    // Bradley-Terry paired-comparison strengths for brands, where brand
    // A "beats" brand B inside an order when its mean unit price is
    // higher (deterministic tiebreak: the lexicographically smaller
    // brand wins ties): two unrolled Hunter MM rounds s_i ← w_i /
    // Σ_j n_ij/(s_i+s_j) from uniform strengths, every iterate
    // 9-snapped and renormalized — the pairwise-preference ranking
    // model behind every LLM-eval arena, fit the q4b iterative way.
    // Within-order brand pairs are bounded by order size; the pair
    // matrix aggregates once.
    "qf9_bradley_terry" -> Q(
      fn = (s, dir) => {
        val ob = t(s, dir, "lineitem")
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .groupBy(col("l_orderkey"), col("p_brand"))
          .agg(sum(col("l_extendedprice").cast("decimal(12,2)")).as("ext"),
            sum(col("l_quantity").cast("long")).as("qty"))
          .select(col("l_orderkey").as("ok"), col("p_brand"),
            round(col("ext").cast("double") / col("qty").cast("double"), 9)
              .as("up"))
          .localCheckpoint(eager = false)
        val games = ob.select(col("ok"), col("p_brand").as("ba"),
          col("up").as("ua"))
          .join(ob.select(col("ok"), col("p_brand").as("bb"),
            col("up").as("ub")), Seq("ok"))
          .filter(col("ba") < col("bb"))
          .select(col("ba"), col("bb"),
            when(col("ua") >= col("ub"), lit(1L)).otherwise(0L).as("wa"))
        val mat = games.groupBy(col("ba"), col("bb"))
          .agg(count(lit(1)).as("nij"), sum(col("wa")).as("wij"))
          .localCheckpoint(eager = false)
        val wins = mat.select(col("ba").as("br"), col("wij").as("w"))
          .unionByName(mat.select(col("bb").as("br"),
            (col("nij") - col("wij")).as("w")))
          .groupBy(col("br")).agg(sum(col("w")).as("wi"))
          .localCheckpoint(eager = false)
        val nb = wins.agg(count(lit(1)).as("k"))
        val s0 = wins.select(col("br"), lit(1.0).as("sv"))
        def mm(sv: DataFrame) = {
          val paired = mat
            .join(sv.select(col("br").as("ba"), col("sv").as("sa")),
              Seq("ba"))
            .join(sv.select(col("br").as("bb"), col("sv").as("sb")),
              Seq("bb"))
          val denom = paired.select(col("ba").as("br"),
            round(col("nij").cast("double") / (col("sa") + col("sb")), 9)
              .as("term"))
            .unionByName(paired.select(col("bb").as("br"),
              round(col("nij").cast("double") / (col("sa") + col("sb")), 9)
                .as("term")))
            .groupBy(col("br"))
            .agg(sum(col("term").cast("decimal(18,9)")).as("dd"))
          val raw = wins.join(denom, Seq("br"))
            .select(col("br"),
              round(col("wi").cast("double") / col("dd").cast("double"), 9)
                .as("sraw"))
          val tot = raw.agg(sum(col("sraw").cast("decimal(18,9)"))
            .as("ts")).crossJoin(broadcast(nb))
          raw.crossJoin(broadcast(tot))
            .select(col("br"),
              round(col("sraw") * col("k").cast("double") /
                col("ts").cast("double"), 9).as("sv"))
        }
        val s2 = mm(mm(s0))
        s2.join(wins, Seq("br"))
          .select(col("br").as("p_brand"), col("wi").as("wins"),
            round(col("sv"), 6).as("bt_strength"))
          .orderBy(col("sv").desc, col("br")).limit(10)
      },
      oracle = Some("""
        WITH ob AS MATERIALIZED (
          SELECT l_orderkey AS ok, p_brand,
                 ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)))
                     AS DOUBLE) /
                   CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE), 9)
                   AS up
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY 1, 2),
        games AS (
          SELECT a.p_brand AS ba, b.p_brand AS bb,
                 CASE WHEN a.up >= b.up THEN 1 ELSE 0 END AS wa
          FROM ob a JOIN ob b ON a.ok = b.ok AND a.p_brand < b.p_brand),
        mat AS MATERIALIZED (
          SELECT ba, bb, CAST(COUNT(*) AS BIGINT) AS nij,
                 CAST(SUM(wa) AS BIGINT) AS wij
          FROM games GROUP BY 1, 2),
        wins AS MATERIALIZED (
          SELECT br, CAST(SUM(w) AS BIGINT) AS wi
          FROM (SELECT ba AS br, wij AS w FROM mat
                UNION ALL SELECT bb, nij - wij FROM mat)
          GROUP BY 1),
        nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM wins),
        s0 AS (SELECT br, CAST(1 AS DOUBLE) AS sv FROM wins),
        d1 AS (
          SELECT br, SUM(CAST(term AS DECIMAL(18,9))) AS dd
          FROM (
            SELECT m.ba AS br,
                   ROUND(CAST(nij AS DOUBLE) / (sa.sv + sb.sv), 9) AS term
            FROM mat m JOIN s0 sa ON m.ba = sa.br
            JOIN s0 sb ON m.bb = sb.br
            UNION ALL
            SELECT m.bb AS br,
                   ROUND(CAST(nij AS DOUBLE) / (sa.sv + sb.sv), 9) AS term
            FROM mat m JOIN s0 sa ON m.ba = sa.br
            JOIN s0 sb ON m.bb = sb.br)
          GROUP BY 1),
        r1 AS (
          SELECT wins.br,
                 ROUND(CAST(wi AS DOUBLE) / CAST(dd AS DOUBLE), 9)
                   AS sraw
          FROM wins JOIN d1 ON wins.br = d1.br),
        t1 AS (SELECT CAST(SUM(CAST(sraw AS DECIMAL(18,9))) AS DOUBLE)
                 AS ts FROM r1),
        s1 AS (
          SELECT br, ROUND(sraw * CAST(nb.k AS DOUBLE) / t1.ts, 9) AS sv
          FROM r1 CROSS JOIN t1 CROSS JOIN nb),
        d2 AS (
          SELECT br, SUM(CAST(term AS DECIMAL(18,9))) AS dd
          FROM (
            SELECT m.ba AS br,
                   ROUND(CAST(nij AS DOUBLE) / (sa.sv + sb.sv), 9) AS term
            FROM mat m JOIN s1 sa ON m.ba = sa.br
            JOIN s1 sb ON m.bb = sb.br
            UNION ALL
            SELECT m.bb AS br,
                   ROUND(CAST(nij AS DOUBLE) / (sa.sv + sb.sv), 9) AS term
            FROM mat m JOIN s1 sa ON m.ba = sa.br
            JOIN s1 sb ON m.bb = sb.br)
          GROUP BY 1),
        r2 AS (
          SELECT wins.br,
                 ROUND(CAST(wi AS DOUBLE) / CAST(dd AS DOUBLE), 9)
                   AS sraw
          FROM wins JOIN d2 ON wins.br = d2.br),
        t2 AS (SELECT CAST(SUM(CAST(sraw AS DECIMAL(18,9))) AS DOUBLE)
                 AS ts FROM r2),
        s2 AS (
          SELECT br, ROUND(sraw * CAST(nb.k AS DOUBLE) / t2.ts, 9) AS sv
          FROM r2 CROSS JOIN t2 CROSS JOIN nb)
        SELECT s2.br AS p_brand, wins.wi AS wins,
               ROUND(s2.sv, 6) + CAST(0 AS DOUBLE) AS bt_strength
        FROM s2 JOIN wins ON s2.br = wins.br
        ORDER BY s2.sv DESC, s2.br LIMIT 10""")),

    // Social-choice aggregation of the five regional brand rankings:
    // Borda points (k − rank summed across regions, all integer) and
    // the pairwise Condorcet check for the Borda winner — does the
    // winner also beat every rival head-to-head region by region?
    // Voting theory's answer to "which brand leads overall" when
    // regions disagree — a question q99's single-total dashboard
    // begs. Regional ranks come from one 125-row aggregate panel;
    // everything is exact integers.
    "qfa_borda_condorcet" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val rev = t(s, dir, "lineitem")
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
          .join(t(s, dir, "region"), col("n_regionkey") === col("r_regionkey"))
          .groupBy(col("r_name"), col("p_brand"))
          .agg(sum(col("l_extendedprice").cast("decimal(12,2)")).as("v"))
          .localCheckpoint(eager = false)
        val ranks = rev.select(col("r_name"), col("p_brand"),
          row_number().over(Window.partitionBy(col("r_name"))
            .orderBy(col("v").desc, col("p_brand"))).cast("long").as("rk"))
          .localCheckpoint(eager = false)
        val k0 = ranks.groupBy(col("r_name")).agg(max(col("rk")).as("k"))
          .agg(max(col("k")).as("k"))
        val borda = ranks.crossJoin(broadcast(k0))
          .groupBy(col("p_brand"))
          .agg(sum(col("k") - col("rk")).as("borda"))
          .localCheckpoint(eager = false)
        val winner = borda
          .orderBy(col("borda").desc, col("p_brand")).limit(1)
          .select(col("p_brand").as("wb"))
        val duels = ranks.join(broadcast(winner),
          col("p_brand") === col("wb"))
          .select(col("r_name"), col("rk").as("wrk"), col("wb"))
          .join(ranks, Seq("r_name"))
          .filter(col("p_brand") =!= col("wb"))
          .groupBy(col("p_brand"))
          .agg(sum(when(col("wrk") < col("rk"), 1L).otherwise(0L))
            .as("w_beats"))
        val cond = duels.agg(count(lit(1)).as("rivals"),
          sum(when(col("w_beats") * 2 > 5, 1L).otherwise(0L))
            .as("majority_wins"))
        borda.orderBy(col("borda").desc, col("p_brand")).limit(10)
          .crossJoin(broadcast(winner)).crossJoin(broadcast(cond))
          .select(col("p_brand"), col("borda"),
            col("wb").as("borda_winner"),
            when(col("majority_wins") === col("rivals"), lit("yes"))
              .otherwise(lit("no")).as("winner_is_condorcet"))
          .orderBy(col("borda").desc, col("p_brand"))
      },
      oracle = Some("""
        WITH rev AS MATERIALIZED (
          SELECT r_name, p_brand,
                 SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS v
          FROM lineitem
          JOIN part ON l_partkey = p_partkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          JOIN region ON n_regionkey = r_regionkey
          GROUP BY 1, 2),
        ranks AS MATERIALIZED (
          SELECT r_name, p_brand,
                 CAST(ROW_NUMBER() OVER (PARTITION BY r_name
                   ORDER BY v DESC, p_brand) AS BIGINT) AS rk
          FROM rev),
        k0 AS (
          SELECT CAST(MAX(k) AS BIGINT) AS k
          FROM (SELECT r_name, MAX(rk) AS k FROM ranks GROUP BY 1)),
        borda AS MATERIALIZED (
          SELECT p_brand, CAST(SUM(k0.k - rk) AS BIGINT) AS borda
          FROM ranks CROSS JOIN k0 GROUP BY 1),
        winner AS (
          SELECT p_brand AS wb FROM borda
          ORDER BY borda DESC, p_brand LIMIT 1),
        duels AS (
          SELECT r.p_brand,
                 CAST(SUM(CASE WHEN w.wrk < r.rk THEN 1 ELSE 0 END)
                   AS BIGINT) AS w_beats
          FROM (SELECT ranks.r_name, rk AS wrk
                FROM ranks JOIN winner ON p_brand = wb) w
          JOIN ranks r ON r.r_name = w.r_name
          WHERE r.p_brand <> (SELECT wb FROM winner)
          GROUP BY 1),
        cond AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS rivals,
                 CAST(SUM(CASE WHEN w_beats * 2 > 5 THEN 1 ELSE 0 END)
                   AS BIGINT) AS majority_wins
          FROM duels),
        top10 AS (
          SELECT p_brand, borda FROM borda
          ORDER BY borda DESC, p_brand LIMIT 10)
        SELECT t.p_brand, t.borda,
               winner.wb AS borda_winner,
               CASE WHEN cond.majority_wins = cond.rivals THEN 'yes'
                    ELSE 'no' END AS winner_is_condorcet
        FROM top10 t CROSS JOIN winner CROSS JOIN cond
        ORDER BY t.borda DESC, t.p_brand""")),

    // Permutation-distance card between the first- and second-half
    // brand revenue rankings: normalized Kendall tau distance (pairwise
    // disagreements over C(k,2)), Spearman's footrule Σ|r₁-r₂| with its
    // k²/2-ish maximum, and the maximum single displacement — HOW
    // STABLE is the leaderboard, as a proper distance (q6w lists the
    // movers; this scores the whole permutation). Ranks from two
    // 25-row aggregate panels; every distance is exact integer
    // arithmetic.
    "qfb_rank_distance" -> Q(
      fn = (s, dir) => {
        import org.apache.spark.sql.expressions.Window
        val li = t(s, dir, "lineitem")
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .select(col("p_brand"),
            expr("unix_millis(CAST(l_shipdate AS TIMESTAMP))" +
              " div 86400000").as("day"),
            col("l_extendedprice").cast("decimal(12,2)").as("ext"))
        val mid = li.agg(((min(col("day")) + max(col("day"))) / lit(2))
          .cast("long").as("dmid"))
        val per = li.crossJoin(broadcast(mid))
          .groupBy(col("p_brand"),
            (col("day") <= col("dmid")).as("h1"))
          .agg(sum(col("ext")).as("v"))
        val ranks = per.select(col("p_brand"), col("h1"),
          row_number().over(Window.partitionBy(col("h1"))
            .orderBy(col("v").desc, col("p_brand"))).cast("long").as("rk"))
        val wide = ranks.groupBy(col("p_brand"))
          .agg(max(when(col("h1"), col("rk"))).as("r1"),
            max(when(!col("h1"), col("rk"))).as("r2"))
          .localCheckpoint(eager = false)
        val foot = wide.agg(count(lit(1)).as("k"),
          sum(abs(col("r1") - col("r2"))).as("fr"),
          max(abs(col("r1") - col("r2"))).as("maxd"))
        val kend = wide.select(col("r1").as("a1"), col("r2").as("a2"))
          .join(wide.select(col("r1").as("b1"), col("r2").as("b2")),
            col("a1") < col("b1"))
          .agg(sum(when(col("a2") > col("b2"), 1L).otherwise(0L))
            .as("disc"))
        foot.crossJoin(broadcast(kend))
          .select(col("k").as("n_brands"),
            col("disc").as("kendall_discordant"),
            round(col("disc").cast("double") /
              (col("k") * (col("k") - 1) / 2).cast("double"), 6)
              .as("kendall_tau_dist"),
            col("fr").as("footrule"),
            round(col("fr").cast("double") /
              expr("(k * k div 2)").cast("double"), 6)
              .as("footrule_norm"),
            col("maxd").as("max_displacement"))
      },
      oracle = Some("""
        WITH li AS (
          SELECT p_brand,
                 CAST(epoch_ms(l_shipdate) // 86400000 AS BIGINT) AS day,
                 CAST(l_extendedprice AS DECIMAL(12,2)) AS ext
          FROM lineitem JOIN part ON l_partkey = p_partkey),
        mid AS (SELECT (MIN(day) + MAX(day)) // 2 AS dmid FROM li),
        per AS (
          SELECT p_brand, day <= mid.dmid AS h1, SUM(ext) AS v
          FROM li CROSS JOIN mid GROUP BY 1, 2),
        ranks AS (
          SELECT p_brand, h1,
                 CAST(ROW_NUMBER() OVER (PARTITION BY h1
                   ORDER BY v DESC, p_brand) AS BIGINT) AS rk
          FROM per),
        wide AS MATERIALIZED (
          SELECT p_brand,
                 MAX(CASE WHEN h1 THEN rk END) AS r1,
                 MAX(CASE WHEN NOT h1 THEN rk END) AS r2
          FROM ranks GROUP BY 1),
        foot AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS k,
                 CAST(SUM(ABS(r1 - r2)) AS BIGINT) AS fr,
                 CAST(MAX(ABS(r1 - r2)) AS BIGINT) AS maxd
          FROM wide),
        kend AS (
          SELECT CAST(SUM(CASE WHEN a.r2 > b.r2 THEN 1 ELSE 0 END)
                   AS BIGINT) AS disc
          FROM wide a JOIN wide b ON a.r1 < b.r1)
        SELECT k AS n_brands,
               disc AS kendall_discordant,
               ROUND(CAST(disc AS DOUBLE) /
                 CAST(k * (k - 1) // 2 AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS kendall_tau_dist,
               fr AS footrule,
               ROUND(CAST(fr AS DOUBLE) / CAST(k * k // 2 AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS footrule_norm,
               maxd AS max_displacement
        FROM foot CROSS JOIN kend""")),

    // Last-two-digit uniformity forensics on order prices: invented
    // numbers cluster on round cents where organic ones spread — the
    // chi-square of the 100 cent-pair cells against uniform, the count
    // of .00 endings vs the 1% expectation, and the most overloaded
    // cell by struct argmax — the fraud-screening complement of q6n's
    // FIRST-digit Benford test (first digits follow log; last digits
    // follow uniform). Cents are exact integers end to end.
    "qfc_last_digit_forensics" -> Q(
      fn = (s, dir) => {
        val cents = t(s, dir, "orders")
          .select(pmod((col("o_totalprice").cast("decimal(18,2)") *
            lit(100)).cast("long"), lit(100L)).as("cc"))
        val cells = cents.groupBy(col("cc")).agg(count(lit(1)).as("m"))
        val tot = cells.agg(sum(col("m")).as("n"), count(lit(1)).as("kc"))
        val agg = cells.crossJoin(broadcast(tot))
          .select(col("cc"), col("m"), col("n"), col("kc"),
            (col("n").cast("double") / lit(100.0)).as("e"))
          .agg(first(col("n")).as("n"), first(col("kc")).as("k_cells"),
            sum(round((col("m").cast("double") - col("e")) *
              (col("m").cast("double") - col("e")) / col("e"), 9)
              .cast("decimal(18,9)")).as("x2d"),
            sum(when(col("cc") === 0, col("m")).otherwise(0L)).as("zz"),
            max(struct(col("m").as("m"), col("cc").as("cc"))).as("w"))
        agg.select(col("n"), col("k_cells"),
          round(col("x2d").cast("double"), 6).as("chi2_uniform"),
          col("zz").as("n_round_00"),
          round(col("zz").cast("double") / col("n").cast("double"), 6)
            .as("share_00"),
          col("w.cc").as("modal_cents"), col("w.m").as("modal_count"))
      },
      oracle = Some("""
        WITH cents AS (
          SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100
                   AS BIGINT) % 100 AS cc
          FROM orders),
        cells AS (
          SELECT cc, CAST(COUNT(*) AS BIGINT) AS m
          FROM cents GROUP BY 1),
        tot AS (
          SELECT CAST(SUM(m) AS BIGINT) AS n,
                 CAST(COUNT(*) AS BIGINT) AS kc
          FROM cells),
        agg AS (
          SELECT MAX(tot.n) AS n, MAX(tot.kc) AS k_cells,
                 SUM(CAST(ROUND((CAST(m AS DOUBLE) -
                   CAST(tot.n AS DOUBLE) / CAST(100 AS DOUBLE)) *
                   (CAST(m AS DOUBLE) -
                   CAST(tot.n AS DOUBLE) / CAST(100 AS DOUBLE)) /
                   (CAST(tot.n AS DOUBLE) / CAST(100 AS DOUBLE)), 9)
                   AS DECIMAL(18,9))) AS x2d,
                 CAST(SUM(CASE WHEN cc = 0 THEN m ELSE 0 END) AS BIGINT)
                   AS zz,
                 MAX({'m': m, 'cc': cc}) AS w
          FROM cells CROSS JOIN tot)
        SELECT n, k_cells,
               ROUND(CAST(x2d AS DOUBLE), 6) + CAST(0 AS DOUBLE)
                 AS chi2_uniform,
               zz AS n_round_00,
               ROUND(CAST(zz AS DOUBLE) / CAST(n AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS share_00,
               w['cc'] AS modal_cents, w['m'] AS modal_count
        FROM agg""")),

    // Records test on the daily revenue series: the observed count of
    // running-maximum records against the i.i.d. expectation Σ 1/i and
    // variance Σ (1/i − 1/i²) — under exchangeability record counts are
    // distribution-free, so an excess says TREND with no model at all
    // (the qc7 Mann-Kendall question answered by records theory).
    // Records come off an exact DECIMAL prefix-max scan; the harmonic
    // moments are 12-snapped DECIMAL sums over the bounded day index.
    "qfd_records_test" -> Q(
      fn = (s, dir) => {
        val ranked = graft.operators.ScaleOps.globalRowNumber(
          dailyRevenueM(s, dir), Seq(col("day")), "rn")
          .localCheckpoint(eager = false)
        val pre = ranked.select(col("rn"), col("ym"))
          .join(ranked.select(col("rn").as("rn2"), col("ym").as("ymp")),
            col("rn2") < col("rn"), "left")
          .groupBy(col("rn"), col("ym"))
          .agg(max(col("ymp")).as("prevmax"))
          .select(col("rn"),
            when(col("prevmax").isNull || col("ym") > col("prevmax"), 1L)
              .otherwise(0L).as("isrec"))
        val agg = pre.agg(count(lit(1)).as("n"), sum(col("isrec")).as("r"))
        val moments = ranked.select(col("rn"))
          .agg(
            sum(round(lit(1.0) / col("rn").cast("double"), 12)
              .cast("decimal(24,12)")).as("hn"),
            sum(round(lit(1.0) / col("rn").cast("double") -
              lit(1.0) / (col("rn") * col("rn")).cast("double"), 12)
              .cast("decimal(24,12)")).as("vn"))
        agg.crossJoin(broadcast(moments))
          .select(col("n"), col("r").as("n_records"),
            round(col("hn").cast("double"), 6).as("expected_records"),
            round((col("r").cast("double") - col("hn").cast("double")) /
              sqrt(col("vn").cast("double")), 6).as("records_z"))
      },
      oracle = Some(s"""
        WITH daily AS ($dailyRevenueMSql),
        r AS (SELECT ym, ROW_NUMBER() OVER (ORDER BY day) AS rn
              FROM daily),
        pre AS (
          SELECT a.rn,
                 CASE WHEN MAX(b.ym) IS NULL OR a.ym > MAX(b.ym)
                   THEN 1 ELSE 0 END AS isrec
          FROM r a LEFT JOIN r b ON b.rn < a.rn
          GROUP BY a.rn, a.ym),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(isrec) AS BIGINT) AS rr
          FROM pre),
        moments AS (
          SELECT CAST(SUM(CAST(ROUND(CAST(1 AS DOUBLE) /
                   CAST(rn AS DOUBLE), 12) AS DECIMAL(24,12)))
                   AS DOUBLE) AS hn,
                 CAST(SUM(CAST(ROUND(CAST(1 AS DOUBLE) /
                   CAST(rn AS DOUBLE) - CAST(1 AS DOUBLE) /
                   CAST(rn * rn AS DOUBLE), 12) AS DECIMAL(24,12)))
                   AS DOUBLE) AS vn
          FROM r)
        SELECT n, rr AS n_records,
               ROUND(hn, 6) + CAST(0 AS DOUBLE) AS expected_records,
               ROUND((CAST(rr AS DOUBLE) - hn) / sqrt(vn), 6)
                 + CAST(0 AS DOUBLE) AS records_z
        FROM agg CROSS JOIN moments""")),

    // German-tank (serial-number) estimation audit: from a
    // deterministic 5% sample of order keys, the UMVU estimate
    // N̂ = m(1 + 1/k) − 1 of the maximum serial number, its exact
    // standard error, and the relative error against the TRUE maximum
    // the fixture knows — the capture-style estimator for "how big is
    // the namespace" when only samples leak (qbv capture-recapture
    // needs two samples; this needs one). Everything is exact integer
    // arithmetic to one final ratio/sqrt.
    "qfe_german_tank" -> Q(
      fn = (s, dir) => {
        val o = t(s, dir, "orders").select(col("o_orderkey").as("k"))
        val tot = o.agg(max(col("k")).as("ntrue"))
        val samp = o.filter(col("k") % 20 === 7)
          .agg(count(lit(1)).as("kk"), max(col("k")).as("m"))
        samp.crossJoin(broadcast(tot))
          .select(col("kk").as("n_sample"), col("m").as("sample_max"),
            col("ntrue").as("true_max"),
            round(col("m").cast("double") *
              (lit(1.0) + lit(1.0) / col("kk").cast("double")) - lit(1.0),
              2).as("n_hat"),
            round(sqrt(col("m").cast("double") *
              (col("m").cast("double") - col("kk").cast("double")) *
              (col("m").cast("double") + lit(1.0)) /
              (col("kk").cast("double") * col("kk").cast("double") *
                (col("kk").cast("double") + lit(2.0)))), 2).as("se_hat"),
            round((col("m").cast("double") *
              (lit(1.0) + lit(1.0) / col("kk").cast("double")) - lit(1.0) -
              col("ntrue").cast("double")) / col("ntrue").cast("double"), 6)
              .as("rel_err"))
      },
      oracle = Some("""
        WITH o AS (SELECT o_orderkey AS k FROM orders),
        tot AS (SELECT CAST(MAX(k) AS BIGINT) AS ntrue FROM o),
        samp AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS kk,
                 CAST(MAX(k) AS BIGINT) AS m
          FROM o WHERE k % 20 = 7)
        SELECT kk AS n_sample, m AS sample_max, ntrue AS true_max,
               ROUND(CAST(m AS DOUBLE) *
                 (CAST(1 AS DOUBLE) + CAST(1 AS DOUBLE) /
                   CAST(kk AS DOUBLE)) - CAST(1 AS DOUBLE), 2)
                 + CAST(0 AS DOUBLE) AS n_hat,
               ROUND(sqrt(CAST(m AS DOUBLE) *
                 (CAST(m AS DOUBLE) - CAST(kk AS DOUBLE)) *
                 (CAST(m AS DOUBLE) + CAST(1 AS DOUBLE)) /
                 (CAST(kk AS DOUBLE) * CAST(kk AS DOUBLE) *
                   (CAST(kk AS DOUBLE) + CAST(2 AS DOUBLE)))), 2)
                 + CAST(0 AS DOUBLE) AS se_hat,
               ROUND((CAST(m AS DOUBLE) *
                 (CAST(1 AS DOUBLE) + CAST(1 AS DOUBLE) /
                   CAST(kk AS DOUBLE)) - CAST(1 AS DOUBLE) -
                 CAST(ntrue AS DOUBLE)) / CAST(ntrue AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS rel_err
        FROM samp CROSS JOIN tot""")),

    // Lead statistics (arcsine-law territory) for the weekend-vs-
    // weekday purchase race: walk the 30 days accumulating (weekend
    // purchases · 5) − (weekday purchases · 2) — weights equalize the
    // 2:5 day split — and report the fraction of days the weekend side
    // leads, the longest lead streak, and the final margin. Under a
    // fair race the lead fraction follows the arcsine law (piles near
    // 0 and 1), NOT the intuitive ½ — the fluctuation-theory caveat
    // for "X was ahead most of the month" claims. Exact integer
    // running sums; streaks via the gaps-and-islands grouping key
    // rn − run_index.
    "qfg_arcsine_lead" -> Q(
      fn = (s, dir) => {
        val daily = t(s, dir, "events")
          .filter(col("event_type") === "purchase")
          .groupBy((unix_millis(col("ts")) / lit(86400000L)).cast("long")
            .as("day"))
          .agg(count(lit(1)).as("p"))
        val rel = daily.crossJoin(broadcast(
          daily.agg(min(col("day")).as("d0"))))
          .select(col("day"),
            when(pmod(col("day") - col("d0"), lit(7L)) >= 5,
              col("p") * 5).otherwise(-col("p") * 2).as("step"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(rel,
          Seq(col("day")), "rn")
        val cum = graft.operators.ScaleOps.globalRunningSum(ranked,
          Seq(col("rn")), col("step"), "lead")
          .select(col("rn"), col("lead"), (col("lead") > 0).as("up"))
          .localCheckpoint(eager = false)
        val upRank = graft.operators.ScaleOps.globalRowNumber(
          cum.filter(col("up")), Seq(col("rn")), "ur")
        val streak = upRank.select((col("rn") - col("ur")).as("grp"))
          .groupBy(col("grp")).agg(count(lit(1)).as("len"))
          .agg(coalesce(max(col("len")), lit(0L)).as("longest_lead"))
        val agg = cum.agg(count(lit(1)).as("n"),
          sum(when(col("up"), 1L).otherwise(0L)).as("nup"),
          max(when(col("rn") === 1, col("lead"))).as("dummy"))
        val fin = cum.crossJoin(broadcast(agg.select(col("n").as("nn"))))
          .filter(col("rn") === col("nn"))
          .select(col("lead").as("final_margin"))
        agg.crossJoin(broadcast(streak)).crossJoin(broadcast(fin))
          .select(col("n").as("n_days"), col("nup").as("days_leading"),
            round(col("nup").cast("double") / col("n").cast("double"), 6)
              .as("lead_fraction"),
            col("longest_lead"), col("final_margin"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day,
                 CAST(COUNT(*) AS BIGINT) AS p
          FROM events WHERE event_type = 'purchase' GROUP BY 1),
        d0 AS (SELECT MIN(day) AS d0 FROM daily),
        rel AS (
          SELECT day,
                 CASE WHEN ((day - d0.d0) % 7) >= 5 THEN p * 5
                      ELSE -p * 2 END AS step
          FROM daily CROSS JOIN d0),
        r AS (
          SELECT step, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM rel),
        cum AS MATERIALIZED (
          SELECT rn,
                 CAST(SUM(step) OVER (ORDER BY rn
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS lead,
                 SUM(step) OVER (ORDER BY rn ROWS UNBOUNDED PRECEDING)
                   > 0 AS up
          FROM r),
        streak AS (
          SELECT CAST(COALESCE(MAX(len), 0) AS BIGINT) AS longest_lead
          FROM (
            SELECT CAST(COUNT(*) AS BIGINT) AS len
            FROM (
              SELECT rn, rn - ROW_NUMBER() OVER (ORDER BY rn) AS grp
              FROM cum WHERE up)
            GROUP BY grp)),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(CASE WHEN up THEN 1 ELSE 0 END) AS BIGINT)
                   AS nup
          FROM cum),
        fin AS (
          SELECT lead AS final_margin
          FROM cum CROSS JOIN agg WHERE rn = agg.n)
        SELECT n AS n_days, nup AS days_leading,
               ROUND(CAST(nup AS DOUBLE) / CAST(n AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS lead_fraction,
               longest_lead, final_margin
        FROM agg CROSS JOIN streak CROSS JOIN fin""")),

    // Coupon-collector audit of brand discovery: replay the lineitem
    // stream in (shipdate, orderkey, linenumber) order and find the
    // exact position where the last of the 25 brands first appears,
    // against the k·H_k coupon-collector expectation — "how much
    // assortment must a crawler ingest before it has seen everything",
    // the waiting-time sibling of qe7's coverage curve. First-seen
    // positions are exact global row numbers; H_k is a 12-snapped
    // DECIMAL sum over k terms.
    "qfh_coupon_collector" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem")
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .select(col("p_brand"),
            expr("unix_millis(CAST(l_shipdate AS TIMESTAMP))" +
              " div 86400000").as("day"),
            col("l_orderkey").as("ok"), col("l_linenumber").as("ln"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(li,
          Seq(col("day"), col("ok"), col("ln")), "pos")
          .localCheckpoint(eager = false)
        val firsts = ranked.groupBy(col("p_brand"))
          .agg(min(col("pos")).as("fpos"))
        val agg = firsts.agg(count(lit(1)).as("k"),
          max(col("fpos")).as("complete_at"))
        val harm = firsts
          .select(row_number().over(
            org.apache.spark.sql.expressions.Window
              .orderBy(col("fpos"), col("p_brand"))).cast("long").as("i"))
          .agg(sum(round(lit(1.0) / col("i").cast("double"), 12)
            .cast("decimal(24,12)")).as("hk"))
        val n0 = ranked.agg(count(lit(1)).as("n"))
        agg.crossJoin(broadcast(harm)).crossJoin(broadcast(n0))
          .select(col("n").as("n_lines"), col("k").as("n_brands"),
            col("complete_at"),
            round(col("k").cast("double") * col("hk").cast("double"), 2)
              .as("expected_draws"),
            round(col("complete_at").cast("double") /
              (col("k").cast("double") * col("hk").cast("double")), 6)
              .as("obs_over_exp"))
      },
      oracle = Some("""
        WITH li AS (
          SELECT p_brand,
                 CAST(epoch_ms(l_shipdate) // 86400000 AS BIGINT) AS day,
                 l_orderkey AS ok, l_linenumber AS ln
          FROM lineitem JOIN part ON l_partkey = p_partkey),
        ranked AS MATERIALIZED (
          SELECT p_brand,
                 CAST(ROW_NUMBER() OVER (ORDER BY day, ok, ln) AS BIGINT)
                   AS pos
          FROM li),
        firsts AS (
          SELECT p_brand, CAST(MIN(pos) AS BIGINT) AS fpos
          FROM ranked GROUP BY 1),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS k,
                 CAST(MAX(fpos) AS BIGINT) AS complete_at
          FROM firsts),
        harm AS (
          SELECT CAST(SUM(CAST(ROUND(CAST(1 AS DOUBLE) /
                   CAST(i AS DOUBLE), 12) AS DECIMAL(24,12))) AS DOUBLE)
                   AS hk
          FROM (SELECT CAST(ROW_NUMBER() OVER (ORDER BY fpos, p_brand)
                  AS BIGINT) AS i FROM firsts)),
        n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM ranked)
        SELECT n AS n_lines, k AS n_brands, complete_at,
               ROUND(CAST(k AS DOUBLE) * hk, 2) + CAST(0 AS DOUBLE)
                 AS expected_draws,
               ROUND(CAST(complete_at AS DOUBLE) /
                 (CAST(k AS DOUBLE) * hk), 6) + CAST(0 AS DOUBLE)
                 AS obs_over_exp
        FROM agg CROSS JOIN harm CROSS JOIN n0""")),

    // Historical VaR / CVaR of day-over-day revenue changes: the 95%
    // and 99% value-at-risk as exact order statistics of the change
    // distribution and the conditional tail means beyond them — the
    // risk-management quantities (worst plausible day, and how bad the
    // worst days average) that q9e-style quantiles never point at the
    // LOSS tail. Changes are exact DECIMAL differences; tail means
    // divide exact DECIMAL sums; rank cuts are integer ceil
    // arithmetic.
    "qfi_var_cvar" -> Q(
      fn = (s, dir) => {
        val ranked = graft.operators.ScaleOps.globalRowNumber(
          dailyRevenueM(s, dir), Seq(col("day")), "rn")
          .localCheckpoint(eager = false)
        val chg = ranked.select(col("rn"), col("ym").as("y0"))
          .join(ranked.select((col("rn") + 1).as("rn"), col("ym").as("yp")),
            Seq("rn"))
          .select((col("y0") - col("yp")).as("d"), col("rn"))
        val byD = graft.operators.ScaleOps.globalRowNumber(chg,
          Seq(col("d"), col("rn")), "vr").localCheckpoint(eager = false)
        val n0 = byD.agg(count(lit(1)).as("n"))
          .select(col("n"),
            expr("(n + 19) div 20").as("k95"),
            expr("(n + 99) div 100").as("k99"))
        val cuts = byD.crossJoin(broadcast(n0))
          .agg(first(col("n")).as("n"), first(col("k95")).as("k95"),
            first(col("k99")).as("k99"),
            max(when(col("vr") === col("k95"), col("d").cast("double")))
              .as("var95"),
            max(when(col("vr") === col("k99"), col("d").cast("double")))
              .as("var99"),
            sum(when(col("vr") <= col("k95"), col("d"))
              .otherwise(lit(0).cast("decimal(18,8)"))).as("s95"),
            sum(when(col("vr") <= col("k99"), col("d"))
              .otherwise(lit(0).cast("decimal(18,8)"))).as("s99"))
        cuts.select(col("n").as("n_changes"),
          round(col("var95"), 6).as("var_95"),
          round(col("s95").cast("double") / col("k95").cast("double"), 6)
            .as("cvar_95"),
          round(col("var99"), 6).as("var_99"),
          round(col("s99").cast("double") / col("k99").cast("double"), 6)
            .as("cvar_99"))
      },
      oracle = Some(s"""
        WITH daily AS ($dailyRevenueMSql),
        r AS (SELECT ym, ROW_NUMBER() OVER (ORDER BY day) AS rn
              FROM daily),
        chg AS (
          SELECT a.ym - b.ym AS d, a.rn
          FROM r a JOIN r b ON b.rn = a.rn - 1),
        byd AS MATERIALIZED (
          SELECT d, ROW_NUMBER() OVER (ORDER BY d, rn) AS vr FROM chg),
        n0 AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST((COUNT(*) + 19) // 20 AS BIGINT) AS k95,
                 CAST((COUNT(*) + 99) // 100 AS BIGINT) AS k99
          FROM byd),
        cuts AS (
          SELECT MAX(n0.n) AS n, MAX(n0.k95) AS k95, MAX(n0.k99) AS k99,
                 MAX(CASE WHEN vr = n0.k95 THEN CAST(d AS DOUBLE) END)
                   AS var95,
                 MAX(CASE WHEN vr = n0.k99 THEN CAST(d AS DOUBLE) END)
                   AS var99,
                 SUM(CASE WHEN vr <= n0.k95 THEN d
                   ELSE CAST(0 AS DECIMAL(18,8)) END) AS s95,
                 SUM(CASE WHEN vr <= n0.k99 THEN d
                   ELSE CAST(0 AS DECIMAL(18,8)) END) AS s99
          FROM byd CROSS JOIN n0)
        SELECT n AS n_changes,
               ROUND(var95, 6) + CAST(0 AS DOUBLE) AS var_95,
               ROUND(CAST(s95 AS DOUBLE) / CAST(k95 AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS cvar_95,
               ROUND(var99, 6) + CAST(0 AS DOUBLE) AS var_99,
               ROUND(CAST(s99 AS DOUBLE) / CAST(k99 AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS cvar_99
        FROM cuts""")),

    // Maximum drawdown of the daily revenue level: the deepest
    // peak-to-current drop off the exact DECIMAL prefix-max scan, with
    // the peak's running maximum and the trough day via struct argmax,
    // plus the current (end-of-series) drawdown — the path-risk number
    // beside qfi's marginal-distribution VaR (two series can share a
    // VaR and differ 10× in drawdown). Entirely exact DECIMAL
    // arithmetic until the final rounds.
    "qfj_max_drawdown" -> Q(
      fn = (s, dir) => {
        val ranked = graft.operators.ScaleOps.globalRowNumber(
          dailyRevenueM(s, dir), Seq(col("day")), "rn")
          .localCheckpoint(eager = false)
        val withMax = ranked.select(col("rn"), col("ym"))
          .join(ranked.select(col("rn").as("rn2"), col("ym").as("ymp")),
            col("rn2") <= col("rn"))
          .groupBy(col("rn"), col("ym"))
          .agg(max(col("ymp")).as("runmax"))
          .select(col("rn"), col("ym"), col("runmax"),
            (col("runmax") - col("ym")).as("dd"))
          .localCheckpoint(eager = false)
        val n0 = withMax.agg(count(lit(1)).as("n"))
        val worst = withMax.agg(
          max(struct(col("dd").as("dd"), col("rn").cast("long").as("rn"),
            col("runmax").as("pk"))).as("w"))
        val last = withMax.crossJoin(broadcast(n0))
          .filter(col("rn") === col("n"))
          .select(col("dd").as("ddl"))
        n0.crossJoin(broadcast(worst)).crossJoin(broadcast(last))
          .select(col("n"),
            round(col("w.dd").cast("double"), 6).as("max_drawdown"),
            col("w.rn").as("trough_rn"),
            round(col("w.pk").cast("double"), 6).as("peak_level"),
            round(col("ddl").cast("double"), 6).as("current_drawdown"))
      },
      oracle = Some(s"""
        WITH daily AS ($dailyRevenueMSql),
        r AS (SELECT ym, ROW_NUMBER() OVER (ORDER BY day) AS rn
              FROM daily),
        wm AS MATERIALIZED (
          SELECT a.rn, a.ym, MAX(b.ym) AS runmax,
                 MAX(b.ym) - a.ym AS dd
          FROM r a JOIN r b ON b.rn <= a.rn
          GROUP BY a.rn, a.ym),
        n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM wm),
        worst AS (
          SELECT MAX({'dd': dd, 'rn': CAST(rn AS BIGINT),
                      'pk': runmax}) AS w
          FROM wm),
        lastd AS (
          SELECT dd AS ddl FROM wm CROSS JOIN n0 WHERE rn = n0.n)
        SELECT n,
               ROUND(CAST(w['dd'] AS DOUBLE), 6) + CAST(0 AS DOUBLE)
                 AS max_drawdown,
               w['rn'] AS trough_rn,
               ROUND(CAST(w['pk'] AS DOUBLE), 6) + CAST(0 AS DOUBLE)
                 AS peak_level,
               ROUND(CAST(ddl AS DOUBLE), 6) + CAST(0 AS DOUBLE)
                 AS current_drawdown
        FROM n0 CROSS JOIN worst CROSS JOIN lastd""")),

    // Quadrat-count test of complete spatial randomness: bin the
    // synthetic customer points into a fixed 12×24 degree grid, the
    // index of dispersion (n_cells−1)·s²/x̄ against its χ² null, and
    // the variance-to-mean ratio — the third classic CSR test beside
    // qcq's Ripley K (distance spectrum) and qe9's Clark–Evans (first
    // neighbor): quadrats see density HETEROGENEITY at the bin scale.
    // Counts per cell are exact integers (empty cells enter through the
    // fixed cell total, not a join); one ratio at the end.
    "qfk_quadrat_test" -> Q(
      fn = (s, dir) => {
        val pts = t(s, dir, "customer")
          .filter(col("c_custkey") <= 1500)
          .select(
            floor((hashCoord(col("c_custkey"), "lat", 180000L, 90.0) +
              lit(90.0)) / lit(15.0)).cast("long").as("gy"),
            floor((hashCoord(col("c_custkey"), "lon", 360000L, 180.0) +
              lit(180.0)) / lit(15.0)).cast("long").as("gx"))
        val cells = pts.groupBy(col("gy"), col("gx"))
          .agg(count(lit(1)).as("m"))
        val agg = cells.agg(sum(col("m")).as("npts"),
          count(lit(1)).as("occupied"),
          sum(col("m") * col("m")).as("sm2"))
        // fixed grid: 12 lat bands x 24 lon bands = 288 cells; empty
        // cells contribute zero to counts and sm2 but enter K
        agg.select(col("npts"), col("occupied"), lit(288L).as("k_cells"),
          round(col("npts").cast("double") / lit(288.0), 6).as("mean_m"),
          round(
            (col("sm2").cast("double") -
              col("npts").cast("double") * col("npts").cast("double") /
                lit(288.0)) / (lit(288.0) - 1.0) /
              (col("npts").cast("double") / lit(288.0)), 6).as("vmr"),
          round(
            (col("sm2").cast("double") -
              col("npts").cast("double") * col("npts").cast("double") /
                lit(288.0)) /
              (col("npts").cast("double") / lit(288.0)), 6)
            .as("dispersion_chi2"))
      },
      oracle = Some(s"""
        WITH pts AS (
          SELECT CAST(FLOOR((${coordSql("c_custkey", "lat", 180000L, 90)} +
                   CAST(90 AS DOUBLE)) / CAST(15 AS DOUBLE)) AS BIGINT)
                   AS gy,
                 CAST(FLOOR((${coordSql("c_custkey", "lon", 360000L, 180)} +
                   CAST(180 AS DOUBLE)) / CAST(15 AS DOUBLE)) AS BIGINT)
                   AS gx
          FROM customer WHERE c_custkey <= 1500),
        cells AS (
          SELECT gy, gx, CAST(COUNT(*) AS BIGINT) AS m
          FROM pts GROUP BY 1, 2),
        agg AS (
          SELECT CAST(SUM(m) AS BIGINT) AS npts,
                 CAST(COUNT(*) AS BIGINT) AS occupied,
                 CAST(SUM(m * m) AS BIGINT) AS sm2
          FROM cells)
        SELECT npts, occupied, CAST(288 AS BIGINT) AS k_cells,
               ROUND(CAST(npts AS DOUBLE) / CAST(288 AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS mean_m,
               ROUND((CAST(sm2 AS DOUBLE) -
                 CAST(npts AS DOUBLE) * CAST(npts AS DOUBLE) /
                   CAST(288 AS DOUBLE)) /
                 (CAST(288 AS DOUBLE) - CAST(1 AS DOUBLE)) /
                 (CAST(npts AS DOUBLE) / CAST(288 AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS vmr,
               ROUND((CAST(sm2 AS DOUBLE) -
                 CAST(npts AS DOUBLE) * CAST(npts AS DOUBLE) /
                   CAST(288 AS DOUBLE)) /
                 (CAST(npts AS DOUBLE) / CAST(288 AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS dispersion_chi2
        FROM agg""")),

    // Inverse-distance-weighted spatial prediction with leave-one-out
    // cross-validation: predict each panel point's ln-spend from every
    // other point with 1/d² weights and score the RMSE against a
    // mean-only baseline — the kriging-lite "is spend spatially
    // predictable" number that qcl's Moran (association) and qec's
    // Mantel (matrix correlation) stop short of: an actual PREDICTION
    // skill score. Quadratic on the capped panel (the qa8 discipline);
    // per-term weights snap to the 12-grid before the per-point DECIMAL
    // sums so the fold is order-free.
    "qfl_idw_loocv" -> Q(
      fn = (s, dir) => {
        val spend = t(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("sp"))
        val pts = t(s, dir, "customer")
          .filter(col("c_custkey") <= 400)
          .join(spend, col("c_custkey") === col("o_custkey"))
          .select(col("c_custkey").as("pid"),
            hashCoord(col("c_custkey"), "lat", 180000L, 90.0).as("la"),
            hashCoord(col("c_custkey"), "lon", 360000L, 180.0).as("lo"),
            round(log(col("sp").cast("double")), 9).as("a"))
          .localCheckpoint(eager = false)
        val preds = pts.select(col("pid"), col("la"), col("lo"), col("a"))
          .join(pts.select(col("pid").as("pj"), col("la").as("lb"),
            col("lo").as("lb2"), col("a").as("aj")),
            col("pid") =!= col("pj"))
          .select(col("pid"), col("a"),
            round(lit(1.0) /
              ((col("la") - col("lb")) * (col("la") - col("lb")) +
                (col("lo") - col("lb2")) * (col("lo") - col("lb2"))), 12)
              .as("w"), col("aj"))
          .select(col("pid"), col("a"), col("w"),
            round(col("w") * col("aj"), 12).as("wy"))
          .groupBy(col("pid"), col("a"))
          .agg(sum(col("w").cast("decimal(24,12)")).as("sw"),
            sum(col("wy").cast("decimal(24,12)")).as("swy"))
          .select(col("pid"), col("a"),
            round(col("swy").cast("double") / col("sw").cast("double"), 9)
              .as("pred"))
          .localCheckpoint(eager = false)
        val mu = preds.agg(count(lit(1)).as("n"),
          sum(col("a").cast("decimal(20,9)")).as("sa"))
          .select(col("n"),
            round(col("sa").cast("double") / col("n").cast("double"), 9)
              .as("abar"))
        val scores = preds.crossJoin(broadcast(mu))
          .select(col("n"),
            (col("a") - col("pred")).as("e"),
            (col("a") - col("abar")).as("e0"))
          .agg(first(col("n")).as("n"),
            sum(round(col("e") * col("e"), 9).cast("decimal(18,9)"))
              .as("sse"),
            sum(round(col("e0") * col("e0"), 9).cast("decimal(18,9)"))
              .as("sse0"))
        scores.select(col("n"),
          round(sqrt(col("sse").cast("double") / col("n").cast("double")),
            6).as("rmse_idw"),
          round(sqrt(col("sse0").cast("double") / col("n").cast("double")),
            6).as("rmse_mean"),
          round(lit(1.0) - col("sse").cast("double") /
            col("sse0").cast("double"), 6).as("skill_r2"))
      },
      oracle = Some(s"""
        WITH spend AS (
          SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2)))
            AS sp
          FROM orders GROUP BY 1),
        pts AS MATERIALIZED (
          SELECT c_custkey AS pid,
                 ${coordSql("c_custkey", "lat", 180000L, 90)} AS la,
                 ${coordSql("c_custkey", "lon", 360000L, 180)} AS lo,
                 ROUND(ln(CAST(sp AS DOUBLE)), 9) AS a
          FROM customer JOIN spend ON c_custkey = o_custkey
          WHERE c_custkey <= 400),
        preds AS MATERIALIZED (
          SELECT x.pid, x.a,
                 ROUND(CAST(SUM(CAST(ROUND(
                     ROUND(CAST(1 AS DOUBLE) /
                       ((x.la - y.la) * (x.la - y.la) +
                        (x.lo - y.lo) * (x.lo - y.lo)), 12) * y.a, 12)
                     AS DECIMAL(24,12))) AS DOUBLE) /
                   CAST(SUM(CAST(ROUND(CAST(1 AS DOUBLE) /
                       ((x.la - y.la) * (x.la - y.la) +
                        (x.lo - y.lo) * (x.lo - y.lo)), 12)
                     AS DECIMAL(24,12))) AS DOUBLE), 9) AS pred
          FROM pts x JOIN pts y ON x.pid <> y.pid
          GROUP BY x.pid, x.a),
        mu AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 ROUND(CAST(SUM(CAST(a AS DECIMAL(20,9))) AS DOUBLE) /
                   CAST(COUNT(*) AS DOUBLE), 9) AS abar
          FROM preds),
        scores AS (
          SELECT MAX(mu.n) AS n,
                 SUM(CAST(ROUND((a - pred) * (a - pred), 9)
                   AS DECIMAL(18,9))) AS sse,
                 SUM(CAST(ROUND((a - mu.abar) * (a - mu.abar), 9)
                   AS DECIMAL(18,9))) AS sse0
          FROM preds CROSS JOIN mu)
        SELECT n,
               ROUND(sqrt(CAST(sse AS DOUBLE) / CAST(n AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS rmse_idw,
               ROUND(sqrt(CAST(sse0 AS DOUBLE) / CAST(n AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS rmse_mean,
               ROUND(CAST(1 AS DOUBLE) -
                 CAST(sse AS DOUBLE) / CAST(sse0 AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS skill_r2
        FROM scores""")),

    // Burrows' Delta stylometric distance between the even- and
    // odd-doc_id corpus halves: z-score the top-20 word frequencies
    // per 1000 tokens against corpus-wide means, Delta = mean |Δz| —
    // THE authorship-attribution distance, here auditing whether the
    // two halves "write alike" (they should: same generator — Delta
    // near 0 is the expected baseline the fixture pins). Per-half
    // rates are raw ratios of exact counts; z links are 9-grid with a
    // round-6 final mean over the fixed 20-word panel.
    "qfn_burrows_delta" -> Q(
      fn = (s, dir) => {
        val toks = t(s, dir, "documents")
          .select((pmod(col("doc_id"), lit(2L)) === 0).as("ha"),
            explode(split(lower(col("text")), "[\t\n\f\r ]+")).as("tok"))
          .filter(col("tok") =!= "")
          .localCheckpoint(eager = false)
        val top = toks.groupBy(col("tok")).agg(count(lit(1)).as("cf"))
          .orderBy(col("cf").desc, col("tok")).limit(20)
          .localCheckpoint(eager = false)
        val sizes = toks.groupBy(col("ha")).agg(count(lit(1)).as("nt"))
        val rates = toks.join(broadcast(top.select(col("tok"))), Seq("tok"))
          .groupBy(col("tok"), col("ha")).agg(count(lit(1)).as("c"))
          .join(sizes, Seq("ha"))
          .select(col("tok"), col("ha"),
            round(col("c").cast("double") * lit(1000.0) /
              col("nt").cast("double"), 9).as("r"))
          .localCheckpoint(eager = false)
        val stats = rates.groupBy(col("tok"))
          .agg(count(lit(1)).as("k"),
            sum(col("r").cast("decimal(18,9)")).as("sr"),
            sum(round(col("r") * col("r"), 9).cast("decimal(18,9)"))
              .as("srr"))
          .select(col("tok"),
            round(col("sr").cast("double") / col("k").cast("double"), 9)
              .as("mr"),
            round(sqrt(
              (col("srr").cast("double") -
                col("sr").cast("double") * col("sr").cast("double") /
                  col("k").cast("double")) / (col("k") - 1).cast("double")),
              9).as("sd"))
        val dz = rates.groupBy(col("tok"))
          .agg(max(when(col("ha"), col("r"))).as("ra"),
            max(when(!col("ha"), col("r"))).as("rb"))
          .join(stats, Seq("tok"))
          .filter(col("sd") > 0)
          .select(col("tok"),
            round(abs((col("ra") - col("mr")) / col("sd") -
              (col("rb") - col("mr")) / col("sd")), 9).as("adz"))
        dz.agg(count(lit(1)).as("n_words"),
          sum(col("adz").cast("decimal(18,9)")).as("sdz"))
          .select(col("n_words"),
            round(col("sdz").cast("double") / col("n_words").cast("double"),
              6).as("burrows_delta"))
      },
      oracle = Some("""
        WITH toks AS MATERIALIZED (
          SELECT (doc_id % 2 = 0) AS ha, tok
          FROM (SELECT doc_id,
                  UNNEST(string_split_regex(lower(text),
                    '[\t\n\x0B\f\r ]+')) AS tok
                FROM documents)
          WHERE tok <> ''),
        top AS MATERIALIZED (
          SELECT tok, CAST(COUNT(*) AS BIGINT) AS cf
          FROM toks GROUP BY 1 ORDER BY cf DESC, tok LIMIT 20),
        sizes AS (
          SELECT ha, CAST(COUNT(*) AS BIGINT) AS nt
          FROM toks GROUP BY 1),
        rates AS MATERIALIZED (
          SELECT t.tok, t.ha,
                 ROUND(CAST(COUNT(*) AS DOUBLE) * CAST(1000 AS DOUBLE) /
                   CAST(MAX(sizes.nt) AS DOUBLE), 9) AS r
          FROM toks t JOIN top ON t.tok = top.tok
          JOIN sizes ON t.ha = sizes.ha
          GROUP BY t.tok, t.ha),
        stats AS (
          SELECT tok,
                 ROUND(CAST(SUM(CAST(r AS DECIMAL(18,9))) AS DOUBLE) /
                   CAST(COUNT(*) AS DOUBLE), 9) AS mr,
                 ROUND(sqrt((CAST(SUM(CAST(ROUND(r * r, 9)
                     AS DECIMAL(18,9))) AS DOUBLE) -
                   CAST(SUM(CAST(r AS DECIMAL(18,9))) AS DOUBLE) *
                   CAST(SUM(CAST(r AS DECIMAL(18,9))) AS DOUBLE) /
                     CAST(COUNT(*) AS DOUBLE)) /
                   CAST(COUNT(*) - 1 AS DOUBLE)), 9) AS sd
          FROM rates GROUP BY 1),
        dz AS (
          SELECT r.tok,
                 ROUND(ABS((MAX(CASE WHEN ha THEN r.r END) - stats.mr) /
                     stats.sd -
                   (MAX(CASE WHEN NOT ha THEN r.r END) - stats.mr) /
                     stats.sd), 9) AS adz
          FROM rates r JOIN stats ON r.tok = stats.tok
          WHERE stats.sd > 0
          GROUP BY r.tok, stats.mr, stats.sd)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_words,
               ROUND(CAST(SUM(CAST(adz AS DECIMAL(18,9))) AS DOUBLE) /
                 CAST(COUNT(*) AS DOUBLE), 6) + CAST(0 AS DOUBLE)
                 AS burrows_delta
        FROM dz""")),

    // Stratified average treatment effect of the weekend "exposure" on
    // purchase value, stratified by the acting user's activity quintile
    // — the poor-man's propensity adjustment (exact NTILE strata stand
    // in for the propensity score, whose logistic fit needs exp — not
    // oracle-safe): per-stratum weekend/weekday means, the
    // stratum-size-weighted ATE, and the crude unadjusted difference
    // for contrast. Quintiles ride the exact NTILE identity; stratum
    // terms multiply INTEGER weights × 9-grid differences in DECIMAL
    // per rule 15.
    "qfo_stratified_ate" -> Q(
      fn = (s, dir) => {
        val ua = t(s, dir, "events")
          .groupBy(col("user_id")).agg(count(lit(1)).as("act"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(ua,
          Seq(col("act"), col("user_id")), "rn")
        val n0 = ranked.agg(count(lit(1)).as("n"))
          .select(col("n"), expr("n div 5").as("base"),
            pmod(col("n"), lit(5)).as("rem"))
          .select(col("n"), col("base"), col("rem"),
            (col("rem") * (col("base") + 1)).as("cut"))
        val strata = ranked.crossJoin(broadcast(n0))
          .select(col("user_id"),
            when(col("rn") <= col("cut"),
              expr("(rn - 1) div (base + 1) + 1"))
              .otherwise(expr("rem + (rn - 1 - cut) div base + 1"))
              .as("q"))
        val ev0 = t(s, dir, "events")
          .filter(col("event_type") === "purchase" && col("value").isNotNull)
          .select(col("user_id"),
            (pmod((unix_millis(col("ts")) / lit(86400000L)).cast("long"),
              lit(7L)) >= 5).as("wknd"),
            col("value").cast("decimal(18,2)").as("v"))
          .join(strata, Seq("user_id"))
        val cell = ev0.groupBy(col("q"), col("wknd"))
          .agg(count(lit(1)).as("m"), sum(col("v")).as("sv"))
          .select(col("q"), col("wknd"), col("m"),
            round(col("sv").cast("double") / col("m").cast("double"), 9)
              .as("mv"))
        val wide = cell.groupBy(col("q"))
          .agg(sum(col("m")).as("mq"),
            max(when(col("wknd"), col("mv"))).as("m1"),
            max(when(!col("wknd"), col("mv"))).as("m0"))
          .filter(col("m1").isNotNull && col("m0").isNotNull)
          .localCheckpoint(eager = false)
        val ate = wide.agg(sum(col("mq")).as("mt"),
          sum(col("mq").cast("decimal(12,0)") *
            round(col("m1") - col("m0"), 9).cast("decimal(16,9)"))
            .as("wsum"))
          .select(col("mt"),
            round(col("wsum").cast("double") / col("mt").cast("double"), 6)
              .as("ate_stratified"))
        val crude = ev0.groupBy(col("wknd"))
          .agg(count(lit(1)).as("m"), sum(col("v")).as("sv"))
          .groupBy()
          .agg(max(when(col("wknd"),
            round(col("sv").cast("double") / col("m").cast("double"), 9)))
            .as("c1"),
            max(when(!col("wknd"),
              round(col("sv").cast("double") / col("m").cast("double"), 9)))
              .as("c0"))
          .select(round(col("c1") - col("c0"), 6).as("ate_crude"))
        ate.crossJoin(broadcast(crude))
          .select(col("mt").as("n_purchases"), col("ate_stratified"),
            col("ate_crude"))
      },
      oracle = Some("""
        WITH ua AS (
          SELECT user_id, CAST(COUNT(*) AS BIGINT) AS act
          FROM events GROUP BY 1),
        strata AS MATERIALIZED (
          SELECT user_id,
                 CAST(NTILE(5) OVER (ORDER BY act, user_id) AS BIGINT)
                   AS q
          FROM ua),
        ev0 AS MATERIALIZED (
          SELECT e.user_id, s.q,
                 ((CAST(epoch_ms(ts) // 86400000 AS BIGINT)) % 7) >= 5
                   AS wknd,
                 CAST(value AS DECIMAL(18,2)) AS v
          FROM events e JOIN strata s ON e.user_id = s.user_id
          WHERE event_type = 'purchase' AND value IS NOT NULL),
        cell AS (
          SELECT q, wknd, CAST(COUNT(*) AS BIGINT) AS m,
                 ROUND(CAST(SUM(v) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
                   9) AS mv
          FROM ev0 GROUP BY 1, 2),
        wide AS MATERIALIZED (
          SELECT q, CAST(SUM(m) AS BIGINT) AS mq,
                 MAX(CASE WHEN wknd THEN mv END) AS m1,
                 MAX(CASE WHEN NOT wknd THEN mv END) AS m0
          FROM cell GROUP BY 1
          HAVING MAX(CASE WHEN wknd THEN mv END) IS NOT NULL
             AND MAX(CASE WHEN NOT wknd THEN mv END) IS NOT NULL),
        ate AS (
          SELECT CAST(SUM(mq) AS BIGINT) AS mt,
                 ROUND(CAST(SUM(CAST(mq AS DECIMAL(12,0)) *
                   CAST(ROUND(m1 - m0, 9) AS DECIMAL(16,9))) AS DOUBLE) /
                   CAST(SUM(mq) AS DOUBLE), 6) AS ate_stratified
          FROM wide),
        crude AS (
          SELECT ROUND(
            MAX(CASE WHEN wknd THEN mvv END) -
            MAX(CASE WHEN NOT wknd THEN mvv END), 6) AS ate_crude
          FROM (
            SELECT wknd,
                   ROUND(CAST(SUM(v) AS DOUBLE) /
                     CAST(COUNT(*) AS DOUBLE), 9) AS mvv
            FROM ev0 GROUP BY 1))
        SELECT mt AS n_purchases,
               ate_stratified + CAST(0 AS DOUBLE) AS ate_stratified,
               ate_crude + CAST(0 AS DOUBLE) AS ate_crude
        FROM ate CROSS JOIN crude""")),

    // Regression-to-the-mean audit: users in the top activity decile of
    // the first half-month — where does their SECOND-half percentile
    // land, and what fraction of their elevation melts away? The
    // fallacy-check every "our best users declined" narrative needs
    // (qcb's James-Stein SHRINKS for this reason; here the raw effect
    // is measured). Percentiles are exact integer ranks over the two
    // half panels; the melt fraction is one ratio.
    "qfp_regression_to_mean" -> Q(
      fn = (s, dir) => {
        val e = t(s, dir, "events")
          .select(col("user_id"),
            (unix_millis(col("ts")) / lit(86400000L)).cast("long").as("day"))
        val rel = e.crossJoin(broadcast(e.agg(min(col("day")).as("d0"))))
          .select(col("user_id"),
            (col("day") - col("d0") < 15).as("h1"))
        val users = rel.groupBy(col("user_id"))
          .agg(sum(when(col("h1"), 1L).otherwise(0L)).as("a1"),
            sum(when(!col("h1"), 1L).otherwise(0L)).as("a2"))
        val r1 = graft.operators.ScaleOps.globalRowNumber(users,
          Seq(col("a1"), col("user_id")), "rk1")
        val r2 = graft.operators.ScaleOps.globalRowNumber(r1,
          Seq(col("a2"), col("user_id")), "rk2")
          .localCheckpoint(eager = false)
        val n0 = r2.agg(count(lit(1)).as("n"))
        val top = r2.crossJoin(broadcast(n0))
          .filter(col("rk1") * 10 > col("n") * 9)
        val agg = top.agg(count(lit(1)).as("ntop"),
          sum(col("rk1")).as("s1"), sum(col("rk2")).as("s2"),
          first(col("n")).as("n"))
        agg.select(col("n").as("n_users"), col("ntop"),
          round(col("s1").cast("double") /
            (col("ntop").cast("double") * col("n").cast("double")), 6)
            .as("mean_pctl_h1"),
          round(col("s2").cast("double") /
            (col("ntop").cast("double") * col("n").cast("double")), 6)
            .as("mean_pctl_h2"),
          round(
            (col("s1").cast("double") /
              (col("ntop").cast("double") * col("n").cast("double")) -
              col("s2").cast("double") /
                (col("ntop").cast("double") * col("n").cast("double"))) /
            (col("s1").cast("double") /
              (col("ntop").cast("double") * col("n").cast("double")) -
              lit(0.5)), 6).as("melt_fraction"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id,
                 CAST(epoch_ms(ts) // 86400000 AS BIGINT) AS day
          FROM events),
        d0 AS (SELECT MIN(day) AS d0 FROM e),
        users AS (
          SELECT user_id,
                 CAST(SUM(CASE WHEN day - d0.d0 < 15 THEN 1 ELSE 0 END)
                   AS BIGINT) AS a1,
                 CAST(SUM(CASE WHEN day - d0.d0 >= 15 THEN 1 ELSE 0 END)
                   AS BIGINT) AS a2
          FROM e CROSS JOIN d0 GROUP BY 1),
        r AS MATERIALIZED (
          SELECT user_id,
                 CAST(ROW_NUMBER() OVER (ORDER BY a1, user_id) AS BIGINT)
                   AS rk1,
                 CAST(ROW_NUMBER() OVER (ORDER BY a2, user_id) AS BIGINT)
                   AS rk2
          FROM users),
        n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM r),
        agg AS (
          SELECT MAX(n0.n) AS n, CAST(COUNT(*) AS BIGINT) AS ntop,
                 CAST(SUM(rk1) AS BIGINT) AS s1,
                 CAST(SUM(rk2) AS BIGINT) AS s2
          FROM r CROSS JOIN n0 WHERE rk1 * 10 > n0.n * 9)
        SELECT n AS n_users, ntop,
               ROUND(CAST(s1 AS DOUBLE) /
                 (CAST(ntop AS DOUBLE) * CAST(n AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS mean_pctl_h1,
               ROUND(CAST(s2 AS DOUBLE) /
                 (CAST(ntop AS DOUBLE) * CAST(n AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS mean_pctl_h2,
               ROUND((CAST(s1 AS DOUBLE) /
                 (CAST(ntop AS DOUBLE) * CAST(n AS DOUBLE)) -
                 CAST(s2 AS DOUBLE) /
                 (CAST(ntop AS DOUBLE) * CAST(n AS DOUBLE))) /
                 (CAST(s1 AS DOUBLE) /
                 (CAST(ntop AS DOUBLE) * CAST(n AS DOUBLE)) -
                 CAST(0.5 AS DOUBLE)), 6) + CAST(0 AS DOUBLE)
                 AS melt_fraction
        FROM agg""")),

    // Spatial co-location quotient: are BUILDING-segment customers'
    // nearest neighbors disproportionately AUTOMOBILE-segment ones?
    // CLQ(A→B) = (NN-of-A-in-B share) / (B's share of everyone else) —
    // the directional segment-mixing measure qeg's graph assortativity
    // asks on edges, here asked on the map. NN assignment reuses the
    // qe9 capped-panel scan with the (distance², pid) struct-min
    // tiebreak; the quotient is exact integer counts to one ratio.
    "qfq_colocation_quotient" -> Q(
      fn = (s, dir) => {
        val pts = t(s, dir, "customer")
          .filter(col("c_custkey") <= 600 &&
            col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
          .select(col("c_custkey").as("pid"),
            col("c_mktsegment").as("seg"),
            hashCoord(col("c_custkey"), "lat", 180000L, 90.0).as("la"),
            hashCoord(col("c_custkey"), "lon", 360000L, 180.0).as("lo"))
          .localCheckpoint(eager = false)
        val nn = pts.select(col("pid"), col("seg"), col("la"), col("lo"))
          .join(pts.select(col("pid").as("pj"), col("seg").as("segj"),
            col("la").as("lb"), col("lo").as("lb2")),
            col("pid") =!= col("pj"))
          .select(col("pid"), col("seg"),
            struct(
              ((col("la") - col("lb")) * (col("la") - col("lb")) +
                (col("lo") - col("lb2")) * (col("lo") - col("lb2")))
                .as("d2"),
              col("pj"), col("segj")).as("st"))
          .groupBy(col("pid"), col("seg"))
          .agg(min(col("st")).as("w"))
          .select(col("pid"), col("seg"), col("w.segj").as("nnseg"))
          .localCheckpoint(eager = false)
        val tot = nn.groupBy(col("seg")).agg(count(lit(1)).as("nseg"))
        val nAll = tot.agg(sum(col("nseg")).as("nt"))
        val hits = nn.filter(col("seg") === "BUILDING")
          .agg(count(lit(1)).as("na"),
            sum(when(col("nnseg") === "AUTOMOBILE", 1L).otherwise(0L))
              .as("nab"))
        val nb = tot.filter(col("seg") === "AUTOMOBILE")
          .select(col("nseg").as("nbn"))
        hits.crossJoin(broadcast(nb)).crossJoin(broadcast(nAll))
          .select(col("na").as("n_building"), col("nbn").as("n_automobile"),
            col("nab").as("nn_in_automobile"),
            round((col("nab").cast("double") / col("na").cast("double")) /
              (col("nbn").cast("double") / (col("nt") - 1).cast("double")),
              6).as("clq_a_to_b"))
      },
      oracle = Some(s"""
        WITH pts AS MATERIALIZED (
          SELECT c_custkey AS pid, c_mktsegment AS seg,
                 ${coordSql("c_custkey", "lat", 180000L, 90)} AS la,
                 ${coordSql("c_custkey", "lon", 360000L, 180)} AS lo
          FROM customer
          WHERE c_custkey <= 600
            AND c_mktsegment IN ('BUILDING', 'AUTOMOBILE')),
        nn AS MATERIALIZED (
          SELECT x.pid, x.seg,
                 MIN({'d2': (x.la - y.la) * (x.la - y.la) +
                       (x.lo - y.lo) * (x.lo - y.lo),
                      'pj': y.pid, 'segj': y.seg})['segj'] AS nnseg
          FROM pts x JOIN pts y ON x.pid <> y.pid
          GROUP BY x.pid, x.seg),
        tot AS (
          SELECT seg, CAST(COUNT(*) AS BIGINT) AS nseg
          FROM nn GROUP BY 1),
        nall AS (SELECT CAST(SUM(nseg) AS BIGINT) AS nt FROM tot),
        hits AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS na,
                 CAST(SUM(CASE WHEN nnseg = 'AUTOMOBILE' THEN 1 ELSE 0
                   END) AS BIGINT) AS nab
          FROM nn WHERE seg = 'BUILDING'),
        nb AS (
          SELECT nseg AS nbn FROM tot WHERE seg = 'AUTOMOBILE')
        SELECT na AS n_building, nbn AS n_automobile,
               nab AS nn_in_automobile,
               ROUND((CAST(nab AS DOUBLE) / CAST(na AS DOUBLE)) /
                 (CAST(nbn AS DOUBLE) / CAST(nt - 1 AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS clq_a_to_b
        FROM hits CROSS JOIN nb CROSS JOIN nall""")),

    // Rolling-origin one-step evaluation of three daily-revenue
    // forecasters — prefix mean, prefix OLS trend, prefix week-phase
    // mean — entirely via exact prefix moments (running sums of y,
    // t·y, and per-phase y), scoring each day t from only days < t:
    // the HONEST out-of-sample answer to qdz's in-sample AIC question,
    // with no refitting loop because every prefix fit is closed-form
    // in the scans. Predictions and errors are 9-grid; MAEs divide
    // exact DECIMAL |error| sums.
    "qfr_rolling_origin_cv" -> Q(
      fn = (s, dir) => {
        val ranked = graft.operators.ScaleOps.globalRowNumber(
          dailyRevenueM(s, dir), Seq(col("day")), "rn")
          .withColumn("ph", pmod(col("day"), lit(7L)))
          .localCheckpoint(eager = false)
        val c1 = graft.operators.ScaleOps.globalRunningSum(ranked,
          Seq(col("rn")), col("ym"), "cy")
        val c2 = graft.operators.ScaleOps.globalRunningSum(c1,
          Seq(col("rn")), (col("ym") * col("rn").cast("decimal(10,0)"))
            .cast("decimal(28,8)"), "cty")
        val c3 = graft.operators.ScaleOps.groupedGlobalRunningSum(c2,
          Seq("ph"), Seq(col("rn")), col("ym"), "cphy")
        val c4 = graft.operators.ScaleOps.groupedGlobalRunningSum(c3,
          Seq("ph"), Seq(col("rn")), lit(1L), "cphn")
          .localCheckpoint(eager = false)
        // at day t (rn = t), prefix = rows 1..t-1: subtract own row
        val pre = c4.select(col("rn"), col("ym"), col("ph"),
          (col("cy") - col("ym")).as("py"),
          (col("cty") - (col("ym") * col("rn").cast("decimal(10,0)"))
            .cast("decimal(28,8)")).as("pty"),
          (col("cphy") - col("ym")).as("pphy"),
          (col("cphn") - 1).as("pphn"),
          (col("rn") - 1).as("m"))
          .filter(col("rn") >= 8 && col("pphn") > 0)
        // prefix OLS on t=1..m: Sx = m(m+1)/2, Sxx = m(m+1)(2m+1)/6
        val scored = pre.select(col("rn"), col("ym"),
          round(col("py").cast("double") / col("m").cast("double"), 9)
            .as("pred_mean"),
          round(col("pphy").cast("double") / col("pphn").cast("double"), 9)
            .as("pred_phase"),
          col("py"), col("pty"), col("m"))
          .withColumn("sx", (col("m") * (col("m") + 1) / 2).cast("double"))
          .withColumn("sxx", (col("m") * (col("m") + 1) *
            (lit(2L) * col("m") + 1) / 6).cast("double"))
          .withColumn("beta", round(
            (col("m").cast("double") * col("pty").cast("double") -
              col("sx") * col("py").cast("double")) /
            (col("m").cast("double") * col("sxx") - col("sx") * col("sx")),
            9))
          .withColumn("alpha", round(
            (col("py").cast("double") - col("beta") * col("sx")) /
              col("m").cast("double"), 9))
          .withColumn("pred_trend",
            round(col("alpha") + col("beta") * col("rn").cast("double"), 9))
        val agg = scored.agg(count(lit(1)).as("n_eval"),
          sum(abs(round(col("ym").cast("double") - col("pred_mean"), 9))
            .cast("decimal(18,9)")).as("ae_mean"),
          sum(abs(round(col("ym").cast("double") - col("pred_trend"), 9))
            .cast("decimal(18,9)")).as("ae_trend"),
          sum(abs(round(col("ym").cast("double") - col("pred_phase"), 9))
            .cast("decimal(18,9)")).as("ae_phase"))
        agg.select(col("n_eval"),
          round(col("ae_mean").cast("double") / col("n_eval").cast("double"),
            6).as("mae_mean"),
          round(col("ae_trend").cast("double") /
            col("n_eval").cast("double"), 6).as("mae_trend"),
          round(col("ae_phase").cast("double") /
            col("n_eval").cast("double"), 6).as("mae_phase"))
      },
      oracle = Some(s"""
        WITH daily AS ($dailyRevenueMSql),
        r AS (SELECT day, ym, ROW_NUMBER() OVER (ORDER BY day) AS rn
              FROM daily),
        r2 AS (
          SELECT rn, ym, day % 7 AS ph,
                 SUM(ym) OVER (ORDER BY rn ROWS UNBOUNDED PRECEDING)
                   AS cy,
                 SUM(CAST(ym * CAST(rn AS DECIMAL(10,0)) AS DECIMAL(28,8)))
                   OVER (ORDER BY rn ROWS UNBOUNDED PRECEDING) AS cty,
                 SUM(ym) OVER (PARTITION BY day % 7 ORDER BY rn
                   ROWS UNBOUNDED PRECEDING) AS cphy,
                 COUNT(*) OVER (PARTITION BY day % 7 ORDER BY rn
                   ROWS UNBOUNDED PRECEDING) AS cphn
          FROM r),
        pre AS MATERIALIZED (
          SELECT rn, ym,
                 cy - ym AS py,
                 cty - CAST(ym * CAST(rn AS DECIMAL(10,0))
                   AS DECIMAL(28,8)) AS pty,
                 cphy - ym AS pphy,
                 cphn - 1 AS pphn,
                 CAST(rn - 1 AS BIGINT) AS m
          FROM r2
          WHERE rn >= 8 AND cphn - 1 > 0),
        scored AS (
          SELECT rn, ym,
                 ROUND(CAST(py AS DOUBLE) / CAST(m AS DOUBLE), 9)
                   AS pred_mean,
                 ROUND(CAST(pphy AS DOUBLE) / CAST(pphn AS DOUBLE), 9)
                   AS pred_phase,
                 CAST(m * (m + 1) // 2 AS DOUBLE) AS sx,
                 CAST(m * (m + 1) * (2 * m + 1) // 6 AS DOUBLE) AS sxx,
                 CAST(py AS DOUBLE) AS pyd, CAST(pty AS DOUBLE) AS ptyd,
                 CAST(m AS DOUBLE) AS md
          FROM pre),
        scored2 AS (
          SELECT *, ROUND((md * ptyd - sx * pyd) /
                   (md * sxx - sx * sx), 9) AS beta
          FROM scored),
        scored3 AS (
          SELECT *, ROUND((pyd - beta * sx) / md, 9) AS alpha
          FROM scored2),
        scored4 AS (
          SELECT rn, ym, pred_mean, pred_phase,
                 ROUND(alpha + beta * CAST(rn AS DOUBLE), 9) AS pred_trend
          FROM scored3),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_eval,
                 SUM(CAST(ABS(ROUND(CAST(ym AS DOUBLE) - pred_mean, 9))
                   AS DECIMAL(18,9))) AS ae_mean,
                 SUM(CAST(ABS(ROUND(CAST(ym AS DOUBLE) - pred_trend, 9))
                   AS DECIMAL(18,9))) AS ae_trend,
                 SUM(CAST(ABS(ROUND(CAST(ym AS DOUBLE) - pred_phase, 9))
                   AS DECIMAL(18,9))) AS ae_phase
          FROM scored4)
        SELECT n_eval,
               ROUND(CAST(ae_mean AS DOUBLE) / CAST(n_eval AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS mae_mean,
               ROUND(CAST(ae_trend AS DOUBLE) / CAST(n_eval AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS mae_trend,
               ROUND(CAST(ae_phase AS DOUBLE) / CAST(n_eval AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS mae_phase
        FROM agg""")),

    // Box-Cox transformation ladder for order values: the profile
    // log-likelihood -n/2·ln(var(y^λ)) + (λ-1)·Σln y at λ ∈
    // {-1, -1/2, 0, 1/2, 1} — every rung algebraic (1/y, 1/√y, ln y,
    // √y, y; no pow needed, the reason this grid and not a continuum)
    // — with the argmax rung: WHICH scale the analysis should run on,
    // the question every log-or-not debate hand-waves. Transformed
    // moments ride round-6 DECIMAL sums; ln/sqrt are the only links;
    // the winner is a struct argmax over five 9-grid likelihoods.
    "qfs_box_cox" -> Q(
      fn = (s, dir) => {
        val y = t(s, dir, "orders")
          .select((col("o_totalprice").cast("decimal(18,2)") / lit(1000))
            .cast("decimal(15,5)").cast("double").as("y"))
          .localCheckpoint(eager = false)
        val lam = y.sparkSession.range(1)
          .select(explode(array(lit(-1.0), lit(-0.5), lit(0.0), lit(0.5),
            lit(1.0))).as("lam"))
        val tx = y.crossJoin(broadcast(lam))
          .select(col("lam"),
            round(when(col("lam") === -1.0, lit(1.0) / col("y"))
              .when(col("lam") === -0.5, lit(1.0) / sqrt(col("y")))
              .when(col("lam") === 0.0, log(col("y")))
              .when(col("lam") === 0.5, sqrt(col("y")))
              .otherwise(col("y")), 9).as("z"),
            round(log(col("y")), 9).as("ly"))
        val mom = tx.groupBy(col("lam"))
          .agg(count(lit(1)).as("n"),
            sum(col("z").cast("decimal(24,9)")).as("sz"),
            sum(round(col("z") * col("z"), 9).cast("decimal(28,9)"))
              .as("szz"),
            sum(col("ly").cast("decimal(24,9)")).as("sly"))
          .select(col("lam"), col("n"),
            round((col("szz").cast("double") -
              col("sz").cast("double") * col("sz").cast("double") /
                col("n").cast("double")) / col("n").cast("double"), 9)
              .as("varz"),
            col("sly").cast("double").as("sly"))
          .select(col("lam"), col("n"),
            round(-col("n").cast("double") / lit(2.0) * log(col("varz")) +
              (col("lam") - lit(1.0)) * col("sly"), 6).as("loglik"))
          .localCheckpoint(eager = false)
        val best = mom.agg(max(struct(col("loglik").as("ll"),
          col("lam").as("lam"))).as("w"))
          .select(col("w.lam").as("best_lambda"))
        mom.crossJoin(broadcast(best))
          .select(col("lam").as("lambda"), col("loglik"),
            col("best_lambda"))
          .orderBy(col("lambda"))
      },
      oracle = Some("""
        WITH y0 AS MATERIALIZED (
          SELECT CAST(CAST(CAST(o_totalprice AS DECIMAL(18,2)) / 1000
            AS DECIMAL(15,5)) AS DOUBLE) AS y
          FROM orders),
        lam AS (
          SELECT UNNEST([CAST(-1 AS DOUBLE), CAST(-0.5 AS DOUBLE),
            CAST(0 AS DOUBLE), CAST(0.5 AS DOUBLE), CAST(1 AS DOUBLE)])
            AS lam),
        tx AS (
          SELECT lam,
                 ROUND(CASE WHEN lam = CAST(-1 AS DOUBLE)
                     THEN CAST(1 AS DOUBLE) / y
                   WHEN lam = CAST(-0.5 AS DOUBLE)
                     THEN CAST(1 AS DOUBLE) / sqrt(y)
                   WHEN lam = CAST(0 AS DOUBLE) THEN ln(y)
                   WHEN lam = CAST(0.5 AS DOUBLE) THEN sqrt(y)
                   ELSE y END, 9) AS z,
                 ROUND(ln(y), 9) AS ly
          FROM y0 CROSS JOIN lam),
        mom AS MATERIALIZED (
          SELECT lam, CAST(COUNT(*) AS BIGINT) AS n,
                 ROUND(-CAST(COUNT(*) AS DOUBLE) / CAST(2 AS DOUBLE) *
                   ln(ROUND((CAST(SUM(CAST(ROUND(z * z, 9)
                       AS DECIMAL(28,9))) AS DOUBLE) -
                     CAST(SUM(CAST(z AS DECIMAL(24,9))) AS DOUBLE) *
                     CAST(SUM(CAST(z AS DECIMAL(24,9))) AS DOUBLE) /
                       CAST(COUNT(*) AS DOUBLE)) /
                     CAST(COUNT(*) AS DOUBLE), 9)) +
                   (lam - CAST(1 AS DOUBLE)) *
                     CAST(SUM(CAST(ly AS DECIMAL(24,9))) AS DOUBLE), 6)
                   AS loglik
          FROM tx GROUP BY 1),
        best AS (
          SELECT MAX({'ll': loglik, 'lam': lam})['lam'] AS best_lambda
          FROM mom)
        SELECT lam AS lambda, loglik + CAST(0 AS DOUBLE) AS loglik,
               best_lambda
        FROM mom CROSS JOIN best ORDER BY lambda""")),

    // Broken-stick (segmented) regression of the daily revenue trend:
    // the best single breakpoint over a coarse candidate grid by total
    // two-side SSE, the slopes either side, and the F improvement over
    // the single trend — qcx tests ONE fixed midpoint break in level;
    // this SEARCHES for a slope break (qc9's binseg looks for mean
    // shifts). Per-candidate per-side stats come from one conditional
    // aggregation over the days × candidates grid (both bounded);
    // side x-means are exact half-integers, SSEs ride the established
    // round-6 recipes, and the winner is a struct-min on the rounded
    // total SSE.
    "qft_broken_stick" -> Q(
      fn = (s, dir) => {
        val ranked = graft.operators.ScaleOps.globalRowNumber(
          dailyRevenueM(s, dir), Seq(col("day")), "rn")
          .localCheckpoint(eager = false)
        val n0 = ranked.agg(count(lit(1)).as("n"))
        val cands = ranked.crossJoin(broadcast(n0))
          .filter(col("rn") % 30 === 0 && col("rn") >= 60 &&
            col("rn") <= col("n") - 60)
          .select(col("rn").as("tau"))
          .localCheckpoint(eager = false)
        val grid = ranked.crossJoin(cands)
          .select(col("tau"), col("rn"), col("ym"),
            (col("rn") <= col("tau")).as("lft"))
        val sides = grid.groupBy(col("tau"), col("lft"))
          .agg(count(lit(1)).as("m"), sum(col("ym")).as("sy"),
            sum(col("rn")).as("srn"),
            sum((col("ym") * col("rn").cast("decimal(10,0)"))
              .cast("decimal(28,8)")).as("sty"),
            sum(col("rn") * col("rn")).as("stt"))
          .select(col("tau"), col("lft"), col("m"),
            round(col("sy").cast("double") / col("m").cast("double"), 9)
              .as("my"),
            (col("srn").cast("double") / col("m").cast("double")).as("mx"),
            col("sy").cast("double").as("syd"),
            col("sty").cast("double").as("styd"),
            col("srn").cast("double").as("srnd"),
            col("stt").cast("double").as("sttd"))
          .select(col("tau"), col("lft"), col("m"),
            (col("sttd") - col("srnd") * col("srnd") /
              col("m").cast("double")).as("sxx"),
            (col("styd") - col("srnd") * col("syd") /
              col("m").cast("double")).as("sxy"))
        val syy = grid.join(
          grid.groupBy(col("tau"), col("lft"))
            .agg((sum(col("ym")).cast("double") /
              count(lit(1)).cast("double")).as("myr"),
              count(lit(1)).as("m2")),
          Seq("tau", "lft"))
          .select(col("tau"), col("lft"),
            (col("ym").cast("double") - round(col("myr"), 9)).as("c"))
          .groupBy(col("tau"), col("lft"))
          .agg(sum(round(col("c") * col("c"), 6).cast("decimal(28,6)"))
            .as("syyd"))
          .select(col("tau"), col("lft"), col("syyd").cast("double")
            .as("syy"))
        val sse = sides.join(syy, Seq("tau", "lft"))
          .select(col("tau"), col("lft"), col("m"),
            round(col("sxy") / col("sxx"), 9).as("beta"),
            round(col("syy") -
              round(col("sxy") * col("sxy") / col("sxx"), 9), 9)
              .as("sse_side"))
        val byTau = sse.groupBy(col("tau"))
          .agg(sum(round(col("sse_side"), 6).cast("decimal(28,6)"))
            .as("ssed"),
            max(when(col("lft"), col("beta"))).as("beta_l"),
            max(when(!col("lft"), col("beta"))).as("beta_r"))
          .select(col("tau"), col("ssed").cast("double").as("sse2"),
            col("beta_l"), col("beta_r"))
        val best = byTau.agg(min(struct(
          round(col("sse2"), 6).as("s"), col("tau").as("tau"),
          col("beta_l").as("bl"), col("beta_r").as("br"))).as("w"))
        val single = ranked.crossJoin(broadcast(n0))
          .select(col("rn"), col("ym"), col("n"),
            (col("rn").cast("double") -
              (col("n") + 1).cast("double") / lit(2.0)).as("dx"))
          .crossJoin(broadcast(ranked.agg(
            round(sum(col("ym")).cast("double") / count(lit(1))
              .cast("double"), 9).as("mu"))))
          .select(col("rn"), col("dx"),
            (col("ym").cast("double") - col("mu")).as("c"), col("n"))
          .agg(first(col("n")).as("n"),
            sum(round(col("dx") * col("dx"), 6).cast("decimal(28,6)"))
              .as("sxxd"),
            sum(round(col("dx") * col("c"), 6).cast("decimal(28,6)"))
              .as("sxyd"),
            sum(round(col("c") * col("c"), 6).cast("decimal(28,6)"))
              .as("syyd"))
          .select(col("n"),
            round(col("syyd").cast("double") -
              round(col("sxyd").cast("double") * col("sxyd").cast("double") /
                col("sxxd").cast("double"), 9), 9).as("sse1"))
        single.crossJoin(broadcast(best))
          .select(col("n"), col("w.tau").as("break_rn"),
            round(col("w.bl"), 6).as("slope_left"),
            round(col("w.br"), 6).as("slope_right"),
            round(col("sse1"), 6).as("sse_single"),
            round(col("w.s"), 6).as("sse_broken"),
            round(((col("sse1") - col("w.s")) / lit(2.0)) /
              (col("w.s") / (col("n") - 4).cast("double")), 6)
              .as("f_improvement"))
      },
      oracle = Some(s"""
        WITH daily AS ($dailyRevenueMSql),
        r AS (SELECT ym, ROW_NUMBER() OVER (ORDER BY day) AS rn
              FROM daily),
        n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM r),
        cands AS MATERIALIZED (
          SELECT rn AS tau FROM r CROSS JOIN n0
          WHERE rn % 30 = 0 AND rn >= 60 AND rn <= n - 60),
        grid AS MATERIALIZED (
          SELECT tau, rn, ym, rn <= tau AS lft
          FROM r CROSS JOIN cands),
        sides AS (
          SELECT tau, lft, CAST(COUNT(*) AS BIGINT) AS m,
                 ROUND(CAST(SUM(ym) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
                   9) AS my,
                 (CAST(SUM(rn) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                   AS mx,
                 CAST(SUM(ym) AS DOUBLE) AS syd,
                 CAST(SUM(CAST(ym * CAST(rn AS DECIMAL(10,0))
                   AS DECIMAL(28,8))) AS DOUBLE) AS styd,
                 CAST(SUM(rn) AS DOUBLE) AS srnd,
                 CAST(SUM(rn * rn) AS DOUBLE) AS sttd
          FROM grid GROUP BY 1, 2),
        sides2 AS (
          SELECT tau, lft, m,
                 sttd - srnd * srnd / CAST(m AS DOUBLE) AS sxx,
                 styd - srnd * syd / CAST(m AS DOUBLE) AS sxy,
                 my
          FROM sides),
        syy AS (
          SELECT g.tau, g.lft,
                 CAST(SUM(CAST(ROUND(
                   (CAST(g.ym AS DOUBLE) - ROUND(s.my0, 9)) *
                   (CAST(g.ym AS DOUBLE) - ROUND(s.my0, 9)), 6)
                   AS DECIMAL(28,6))) AS DOUBLE) AS syy
          FROM grid g JOIN (
            SELECT tau, lft,
                   CAST(SUM(ym) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
                     AS my0
            FROM grid GROUP BY 1, 2) s
            ON g.tau = s.tau AND g.lft = s.lft
          GROUP BY 1, 2),
        sse AS (
          SELECT s2.tau, s2.lft, s2.m,
                 ROUND(s2.sxy / s2.sxx, 9) AS beta,
                 ROUND(syy.syy -
                   ROUND(s2.sxy * s2.sxy / s2.sxx, 9), 9) AS sse_side
          FROM sides2 s2 JOIN syy ON s2.tau = syy.tau
            AND s2.lft = syy.lft),
        bytau AS (
          SELECT tau,
                 CAST(SUM(CAST(ROUND(sse_side, 6) AS DECIMAL(28,6)))
                   AS DOUBLE) AS sse2,
                 MAX(CASE WHEN lft THEN beta END) AS beta_l,
                 MAX(CASE WHEN NOT lft THEN beta END) AS beta_r
          FROM sse GROUP BY 1),
        best AS (
          SELECT MIN({'s': ROUND(sse2, 6), 'tau': tau,
                      'bl': beta_l, 'br': beta_r}) AS w
          FROM bytau),
        mu AS (
          SELECT ROUND(CAST(SUM(ym) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
                   9) AS mu
          FROM r),
        single AS (
          SELECT MAX(n0.n) AS n,
                 ROUND(CAST(SUM(CAST(ROUND(
                     (CAST(ym AS DOUBLE) - mu.mu) *
                     (CAST(ym AS DOUBLE) - mu.mu), 6) AS DECIMAL(28,6)))
                     AS DOUBLE) -
                   ROUND(CAST(SUM(CAST(ROUND(
                       (CAST(rn AS DOUBLE) -
                         CAST(n0.n + 1 AS DOUBLE) / CAST(2 AS DOUBLE)) *
                       (CAST(ym AS DOUBLE) - mu.mu), 6)
                       AS DECIMAL(28,6))) AS DOUBLE) *
                     CAST(SUM(CAST(ROUND(
                       (CAST(rn AS DOUBLE) -
                         CAST(n0.n + 1 AS DOUBLE) / CAST(2 AS DOUBLE)) *
                       (CAST(ym AS DOUBLE) - mu.mu), 6)
                       AS DECIMAL(28,6))) AS DOUBLE) /
                     CAST(SUM(CAST(ROUND(
                       (CAST(rn AS DOUBLE) -
                         CAST(n0.n + 1 AS DOUBLE) / CAST(2 AS DOUBLE)) *
                       (CAST(rn AS DOUBLE) -
                         CAST(n0.n + 1 AS DOUBLE) / CAST(2 AS DOUBLE)),
                       6) AS DECIMAL(28,6))) AS DOUBLE), 9), 9) AS sse1
          FROM r CROSS JOIN n0 CROSS JOIN mu)
        SELECT n, w['tau'] AS break_rn,
               ROUND(w['bl'], 6) + CAST(0 AS DOUBLE) AS slope_left,
               ROUND(w['br'], 6) + CAST(0 AS DOUBLE) AS slope_right,
               ROUND(sse1, 6) + CAST(0 AS DOUBLE) AS sse_single,
               ROUND(w['s'], 6) + CAST(0 AS DOUBLE) AS sse_broken,
               ROUND(((sse1 - w['s']) / CAST(2 AS DOUBLE)) /
                 (w['s'] / CAST(n - 4 AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS f_improvement
        FROM single CROSS JOIN best""")),

    // Behavioral-fingerprint similarity: cosine similarity between the
    // 24-hour activity profiles of every event-type pair — do clicks
    // and views share a daily rhythm that errors don't? The
    // profile-level companion of qdb's independence test (which says
    // THAT type and time associate; this says WHICH types look alike).
    // Dot products and norms are exact integer arithmetic over the
    // 5×24 count matrix; one sqrt ratio per pair, all ten pairs
    // emitted in a total order.
    "qfu_profile_similarity" -> Q(
      fn = (s, dir) => {
        val prof = t(s, dir, "events")
          .groupBy(col("event_type").as("et"),
            pmod((unix_millis(col("ts")) / lit(3600000L)).cast("long"),
              lit(24L)).as("hr"))
          .agg(count(lit(1)).as("c"))
          .localCheckpoint(eager = false)
        val pairs = prof.select(col("et").as("ea"), col("hr"),
          col("c").as("ca"))
          .join(prof.select(col("et").as("eb"), col("hr"),
            col("c").as("cb")), Seq("hr"))
          .filter(col("ea") < col("eb"))
          .groupBy(col("ea"), col("eb"))
          .agg(sum(col("ca") * col("cb")).as("dot"),
            sum(col("ca") * col("ca")).as("na2"),
            sum(col("cb") * col("cb")).as("nb2"))
        pairs.select(col("ea"), col("eb"),
          round(col("dot").cast("double") /
            (sqrt(col("na2").cast("double")) *
              sqrt(col("nb2").cast("double"))), 6).as("cosine"))
          .orderBy(col("ea"), col("eb"))
      },
      oracle = Some("""
        WITH prof AS MATERIALIZED (
          SELECT event_type AS et,
                 (epoch_ms(ts) // 3600000) % 24 AS hr,
                 CAST(COUNT(*) AS BIGINT) AS c
          FROM events GROUP BY 1, 2),
        pairs AS (
          SELECT a.et AS ea, b.et AS eb,
                 CAST(SUM(a.c * b.c) AS BIGINT) AS dot,
                 CAST(SUM(a.c * a.c) AS BIGINT) AS na2,
                 CAST(SUM(b.c * b.c) AS BIGINT) AS nb2
          FROM prof a JOIN prof b ON a.hr = b.hr AND a.et < b.et
          GROUP BY 1, 2)
        SELECT ea, eb,
               ROUND(CAST(dot AS DOUBLE) /
                 (sqrt(CAST(na2 AS DOUBLE)) * sqrt(CAST(nb2 AS DOUBLE))),
                 6) + CAST(0 AS DOUBLE) AS cosine
        FROM pairs ORDER BY ea, eb""")),

    // Spacings-based uniformity self-audit of the engine's own md5
    // hash draws (the q4d/qed sampling machinery): sort the unit-
    // interval draws for a thinned key set, and test the spacings —
    // Moran's statistic −Σ ln((n+1)·spacing) against its Γ-based
    // normal approximation, plus the maximum spacing — the PRNG
    // battery every deterministic-sampling pipeline owes its users
    // (a lattice defect would load the spacings long before a mean
    // test noticed). Draws and spacings are exact integer differences
    // over 2⁴⁸; ln is the only float link.
    "qfv_prng_spacings" -> Q(
      fn = (s, dir) => {
        val draws = t(s, dir, "orders")
          .filter(col("o_orderkey") % 13 === 0)
          .select(conv(substring(md5(concat(col("o_orderkey")
            .cast("string"), lit("sp"))), 1, 12), 16, 10).cast("long")
            .as("u"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(draws,
          Seq(col("u")), "i").localCheckpoint(eager = false)
        val n0 = ranked.agg(count(lit(1)).as("n"))
        // spacings include the two boundary gaps: u_(1) - 0 and 2^48 - u_(n)
        val gaps = ranked.select(col("i"), col("u"))
          .join(ranked.select((col("i") - 1).as("i"), col("u").as("up")),
            Seq("i"), "left")
          .crossJoin(broadcast(n0))
          .select(
            when(col("up").isNull, lit(281474976710656L) - col("u"))
              .otherwise(col("up") - col("u")).as("g"), col("n"))
          .unionByName(ranked.crossJoin(broadcast(n0))
            .filter(col("i") === 1)
            .select(col("u").as("g"), col("n")))
        val agg = gaps
          .select(col("n"), col("g"),
            round(log((col("n") + 1).cast("double") *
              (col("g").cast("double") / lit(281474976710656.0))), 9)
              .as("lg"))
          .agg(first(col("n")).as("n"),
            sum(col("lg").cast("decimal(20,9)")).as("slg"),
            max(col("g")).as("maxg"))
        // Moran M = -sum ln((n+1)*D_i); null mean ~ (n+1)*gamma_e,
        // var ~ (n+1)*(pi^2/6 - 1); emit the z with literal constants
        agg.select(col("n").as("n_draws"),
          round(-col("slg").cast("double"), 6).as("moran_m"),
          round((-col("slg").cast("double") -
            (col("n") + 1).cast("double") * lit(0.5772156649)) /
            sqrt((col("n") + 1).cast("double") * lit(0.6449340668)), 6)
            .as("moran_z"),
          round(col("maxg").cast("double") / lit(281474976710656.0) *
            (col("n") + 1).cast("double"), 6).as("max_spacing_ratio"))
      },
      oracle = Some("""
        WITH draws AS (
          SELECT CAST(CAST('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)
            || 'sp'), 1, 12) AS BIGINT) AS BIGINT) AS u
          FROM orders WHERE o_orderkey % 13 = 0),
        r AS MATERIALIZED (
          SELECT u, ROW_NUMBER() OVER (ORDER BY u) AS i FROM draws),
        n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM r),
        gaps AS (
          SELECT CASE WHEN b.u IS NULL THEN 281474976710656 - a.u
                      ELSE b.u - a.u END AS g, n0.n
          FROM r a LEFT JOIN r b ON b.i = a.i + 1 CROSS JOIN n0
          UNION ALL
          SELECT u AS g, n0.n FROM r CROSS JOIN n0 WHERE i = 1),
        agg AS (
          SELECT MAX(n) AS n,
                 SUM(CAST(ROUND(ln(CAST(n + 1 AS DOUBLE) *
                   (CAST(g AS DOUBLE) /
                    CAST(281474976710656 AS DOUBLE))), 9)
                   AS DECIMAL(20,9))) AS slg,
                 CAST(MAX(g) AS BIGINT) AS maxg
          FROM gaps)
        SELECT n AS n_draws,
               ROUND(-CAST(slg AS DOUBLE), 6) + CAST(0 AS DOUBLE)
                 AS moran_m,
               ROUND((-CAST(slg AS DOUBLE) -
                 CAST(n + 1 AS DOUBLE) * CAST(0.5772156649 AS DOUBLE)) /
                 sqrt(CAST(n + 1 AS DOUBLE) *
                   CAST(0.6449340668 AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS moran_z,
               ROUND(CAST(maxg AS DOUBLE) /
                 CAST(281474976710656 AS DOUBLE) *
                 CAST(n + 1 AS DOUBLE), 6) + CAST(0 AS DOUBLE)
                 AS max_spacing_ratio
        FROM agg""")),

    // Butterfly (4-cycle) counting in the bipartite order × brand
    // graph: butterflies = Σ C(m_ij, 2) over brand-pair co-order
    // counts, caterpillars (3-paths) from per-pair wedge counts, and
    // the bipartite clustering coefficient 4·butterflies/caterpillars
    // — the bipartite cohesion motif q4g's triangles cannot see (a
    // bipartite graph has NO triangles). Brand-pair aggregation bounds
    // the quadratic at 25² regardless of order count; all exact
    // integers to one final ratio.
    "qfw_butterfly_count" -> Q(
      fn = (s, dir) => {
        val ob = t(s, dir, "lineitem")
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .select(col("l_orderkey").as("ok"), col("p_brand")).distinct()
          .localCheckpoint(eager = false)
        val pairCo = ob.select(col("ok"), col("p_brand").as("ba"))
          .join(ob.select(col("ok"), col("p_brand").as("bb")), Seq("ok"))
          .filter(col("ba") < col("bb"))
          .groupBy(col("ba"), col("bb")).agg(count(lit(1)).as("m"))
        val bf = pairCo.agg(
          sum(col("m") * (col("m") - 1) / 2).as("butterflies"))
        val degs = ob.groupBy(col("p_brand")).agg(count(lit(1)).as("db"))
        val odeg = ob.groupBy(col("ok")).agg(count(lit(1)).as("dk"))
        // caterpillars (paths of length 3) = Σ_orders Σ_{brand pairs in
        // order} (d_ba - 1 + d_bb - 1) ... use the standard wedge-based
        // form: Σ_pairs m_ij · ((d_i - m_ij) + (d_j - m_ij)) + ... for
        // the coefficient we use the simpler Σ_wedges form below.
        val wedgeB = degs.agg(
          sum(col("db") * (col("db") - 1) / 2).as("wb"))
        val wedgeO = odeg.agg(
          sum(col("dk") * (col("dk") - 1) / 2).as("wo"))
        bf.crossJoin(broadcast(wedgeB)).crossJoin(broadcast(wedgeO))
          .select(
            col("butterflies").cast("long").as("butterflies"),
            col("wb").cast("long").as("brand_wedges"),
            col("wo").cast("long").as("order_wedges"),
            round(lit(4.0) * col("butterflies") /
              (col("wb") + col("wo")), 6).as("bipartite_cc"))
      },
      oracle = Some("""
        WITH ob AS MATERIALIZED (
          SELECT DISTINCT l_orderkey AS ok, p_brand
          FROM lineitem JOIN part ON l_partkey = p_partkey),
        pairco AS (
          SELECT a.p_brand AS ba, b.p_brand AS bb,
                 CAST(COUNT(*) AS BIGINT) AS m
          FROM ob a JOIN ob b ON a.ok = b.ok AND a.p_brand < b.p_brand
          GROUP BY 1, 2),
        bf AS (
          SELECT CAST(SUM(m * (m - 1) // 2) AS BIGINT) AS butterflies
          FROM pairco),
        wedgeb AS (
          SELECT CAST(SUM(db * (db - 1) // 2) AS BIGINT) AS wb
          FROM (SELECT p_brand, CAST(COUNT(*) AS BIGINT) AS db
                FROM ob GROUP BY 1)),
        wedgeo AS (
          SELECT CAST(SUM(dk * (dk - 1) // 2) AS BIGINT) AS wo
          FROM (SELECT ok, CAST(COUNT(*) AS BIGINT) AS dk
                FROM ob GROUP BY 1))
        SELECT butterflies, wb AS brand_wedges, wo AS order_wedges,
               ROUND(CAST(4 AS DOUBLE) * CAST(butterflies AS DOUBLE) /
                 CAST(wb + wo AS DOUBLE), 6) + CAST(0 AS DOUBLE)
                 AS bipartite_cc
        FROM bf CROSS JOIN wedgeb CROSS JOIN wedgeo"""))
  )
}

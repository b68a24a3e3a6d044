package graft.queries

import graft.Tables
import graft.functions.TimeWarp
import graft.operators.{Geo, LinkPredict, NaiveBayesText, Outliers, Regress}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-7 session-3 families: closed-form model fitting (multi-feature
  * OLS by normal equations, exact decision stumps, isotonic calibration
  * via the PAVA max-min closed form), rank statistics (Spearman ρ with
  * average ranks, Kendall τ-b from exact pair counts), and a multinomial
  * Naive Bayes text classifier trained and scored as pure relational
  * algebra. Every query carries an exact DuckDB oracle under the
  * CLAUDE.md parity rules (DECIMAL moment sums, ln/÷/sqrt-only float
  * links, 9-decimal grid snaps, struct argmax).
  */
object SciQueries {

  private def t(s: SparkSession, dir: String, n: String): DataFrame = Tables(s, dir, n)

  /** Deterministic pseudo-random coordinate from a key: an md5 hex draw
    * (the q4d pattern — replayable in DuckDB via CAST('0x'||…)) scaled to
    * a 3-decimal degree grid. Lattice-free, so radius joins are
    * non-vacuous at every SF.
    */
  private def hashCoord(key: Column, salt: String, mod: Long,
      shift: Double): Column =
    (conv(substring(md5(concat(key.cast("string"), lit(salt))), 1, 12),
      16, 10).cast("long") % mod).cast("double") / lit(1000.0) - lit(shift)

  private def coordSql(key: String, salt: String, mod: Long,
      shift: Int): String =
    s"CAST(CAST('0x' || substr(md5(CAST($key AS VARCHAR) || '$salt'), 1, 12) " +
      s"AS BIGINT) % $mod AS DOUBLE) / CAST(1000 AS DOUBLE) - " +
      s"CAST($shift AS DOUBLE)"

  val defs: Map[String, Q] = Map(

    // Multi-feature OLS by the normal equations: o_totalprice regressed
    // on (line count, total quantity) per order. One DECIMAL moment
    // aggregate, Cramer's rule in fixed-shape doubles, R² algebraic from
    // the same moments — no per-row residual pass anywhere.
    "qa0_ols_regression" -> Q(
      fn = (s, dir) => {
        val feats = t(s, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("x1"), sum(col("l_quantity")).as("x2"))
        val joined = t(s, dir, "orders")
          .join(feats, col("o_orderkey") === col("l_orderkey"))
        Regress.ols2(joined, col("o_totalprice"), col("x1"), col("x2"))
      },
      oracle = Some("""
        WITH f AS (
          SELECT CAST(o_totalprice AS DOUBLE) AS y,
                 CAST(x1 AS DOUBLE) AS x1, CAST(x2 AS DOUBLE) AS x2
          FROM orders JOIN (
            SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS x1,
                   SUM(l_quantity) AS x2
            FROM lineitem GROUP BY 1) li ON o_orderkey = l_orderkey),
        a AS (
          SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                 CAST(SUM(CAST(ROUND(x1, 6) AS DECIMAL(38,6))) AS DOUBLE) AS s1,
                 CAST(SUM(CAST(ROUND(x2, 6) AS DECIMAL(38,6))) AS DOUBLE) AS s2,
                 CAST(SUM(CAST(ROUND(x1*x1, 6) AS DECIMAL(38,6))) AS DOUBLE) AS s11,
                 CAST(SUM(CAST(ROUND(x1*x2, 6) AS DECIMAL(38,6))) AS DOUBLE) AS s12,
                 CAST(SUM(CAST(ROUND(x2*x2, 6) AS DECIMAL(38,6))) AS DOUBLE) AS s22,
                 CAST(SUM(CAST(ROUND(y, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sy,
                 CAST(SUM(CAST(ROUND(x1*y, 6) AS DECIMAL(38,6))) AS DOUBLE) AS s1y,
                 CAST(SUM(CAST(ROUND(x2*y, 6) AS DECIMAL(38,6))) AS DOUBLE) AS s2y,
                 CAST(SUM(CAST(ROUND(y*y, 6) AS DECIMAL(38,6))) AS DOUBLE) AS syy
          FROM f),
        d AS (
          SELECT *,
                 n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
                   + s2 * (s1 * s12 - s11 * s2) AS det,
                 sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
                   + s2 * (s1y * s12 - s11 * s2y) AS det0,
                 n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
                   + s2 * (s1 * s2y - s1y * s2) AS det1,
                 n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
                   + sy * (s1 * s12 - s11 * s2) AS det2
          FROM a),
        b AS (
          SELECT *, ROUND(det0 / det, 9) AS b0, ROUND(det1 / det, 9) AS b1,
                 ROUND(det2 / det, 9) AS b2
          FROM d),
        e AS (
          SELECT *,
                 syy - CAST(2 AS DOUBLE) * (b0 * sy + b1 * s1y + b2 * s2y)
                     + (b0 * b0 * n + b1 * b1 * s11 + b2 * b2 * s22
                        + CAST(2 AS DOUBLE) * b0 * b1 * s1
                        + CAST(2 AS DOUBLE) * b0 * b2 * s2
                        + CAST(2 AS DOUBLE) * b1 * b2 * s12) AS sse,
                 syy - sy * sy / n AS sst
          FROM b)
        SELECT CAST(n AS BIGINT) AS n, ROUND(b0, 6) AS b0, ROUND(b1, 6) AS b1,
               ROUND(b2, 6) AS b2,
               ROUND(CAST(1 AS DOUBLE) - sse / sst, 6) AS r2
        FROM e""")),

    // Multinomial Naive Bayes language classifier: add-one smoothing,
    // trained on doc_id % 5 <> 0, scored on the held-out fifth. The model
    // IS the bounded (class, token) count table — broadcast into the
    // scoring join; log terms ride DECIMAL(28,12) so token addition order
    // cannot perturb bits.
    "qa1_naive_bayes" -> Q(
      fn = (s, dir) => {
        val docs = t(s, dir, "documents")
        NaiveBayesText.classify(
            docs.filter(col("doc_id") % 5 =!= 0),
            docs.filter(col("doc_id") % 5 === 0),
            "doc_id", "text", "lang")
          .orderBy(col("doc_id"))
      },
      headline = true,
      oracle = Some("""
        WITH train AS (SELECT * FROM documents WHERE doc_id % 5 <> 0),
        test AS (SELECT * FROM documents WHERE doc_id % 5 = 0),
        ttok AS (
          SELECT lang AS cls, tok FROM (
            SELECT lang, unnest(string_split(text, ' ')) AS tok FROM train)
          WHERE tok <> ''),
        ct AS MATERIALIZED (
          SELECT cls, tok, CAST(COUNT(*) AS BIGINT) AS cnt
          FROM ttok GROUP BY 1, 2),
        tot AS (SELECT cls, CAST(SUM(cnt) AS BIGINT) AS tot FROM ct GROUP BY 1),
        voc AS (SELECT DISTINCT tok FROM ct),
        vs AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM voc),
        pri AS (
          SELECT lang AS cls,
                 ln(CAST(COUNT(*) AS DOUBLE) /
                    CAST((SELECT COUNT(*) FROM train) AS DOUBLE)) AS prior_ln
          FROM train GROUP BY 1),
        tt AS (
          SELECT doc_id, lang, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM (
            SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok
            FROM test)
          WHERE tok <> '' GROUP BY 1, 2, 3),
        ttv AS (SELECT tt.* FROM tt JOIN voc USING (tok)),
        sc AS MATERIALIZED (
          SELECT t.doc_id, t.lang, c.cls,
                 CAST(p.prior_ln AS DECIMAL(28,12)) +
                 SUM(CAST(CAST(t.tf AS DOUBLE) *
                     ln(CAST(COALESCE(ct.cnt, 0) + 1 AS DOUBLE) /
                        CAST(c.tot + vs.v AS DOUBLE)) AS DECIMAL(28,12)))
                   AS score
          FROM ttv t CROSS JOIN tot c CROSS JOIN vs
          LEFT JOIN ct ON ct.cls = c.cls AND ct.tok = t.tok
          JOIN pri p ON p.cls = c.cls
          GROUP BY t.doc_id, t.lang, c.cls, p.prior_ln),
        best AS (
          SELECT doc_id, lang, MAX(score) AS best FROM sc GROUP BY 1, 2)
        SELECT s.doc_id, s.lang AS actual, MIN(s.cls) AS predicted,
               ROUND(CAST(b.best AS DOUBLE), 6) AS score
        FROM sc s JOIN best b
          ON b.doc_id = s.doc_id AND b.lang = s.lang AND s.score = b.best
        GROUP BY s.doc_id, s.lang, b.best
        ORDER BY s.doc_id""")),

    // Exact decision stumps: per candidate feature, the best binary split
    // by weighted Gini scanned over EVERY distinct (binned) value — one
    // bounded profile per feature, cumulative class counts, argmin via
    // the map-side-combinable min(struct(...)).
    "qa2_decision_stump" -> Q(
      fn = (s, dir) =>
        Regress.decisionStump(t(s, dir, "lineitem"),
            Seq(
              "discount_pct" -> round(col("l_discount") * 100, 0),
              "price_k" -> floor(col("l_extendedprice") / 1000),
              "quantity" -> col("l_quantity")),
            (col("l_returnflag") === "R").cast("long"))
          .orderBy(col("feature")),
      oracle = Some("""
        WITH li AS (
          SELECT l_returnflag,
                 ROUND(CAST(l_discount AS DOUBLE) * 100, 0) AS f1,
                 FLOOR(CAST(l_extendedprice AS DOUBLE) / 1000) AS f2,
                 CAST(l_quantity AS DOUBLE) AS f3
          FROM lineitem),
        raw AS (
          SELECT 'discount_pct' AS feature, f1 AS v FROM li
          UNION ALL SELECT 'price_k', f2 FROM li
          UNION ALL SELECT 'quantity', f3 FROM li),
        lab AS (
          SELECT 'discount_pct' AS feature, f1 AS v,
                 CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y FROM li
          UNION ALL SELECT 'price_k', f2,
                 CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END FROM li
          UNION ALL SELECT 'quantity', f3,
                 CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END FROM li),
        prof AS (
          SELECT feature, v, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(y) AS BIGINT) AS pos
          FROM lab GROUP BY 1, 2),
        scan AS (
          SELECT feature, v,
                 CAST(SUM(n) OVER (PARTITION BY feature ORDER BY v
                   ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS nl,
                 CAST(SUM(pos) OVER (PARTITION BY feature ORDER BY v
                   ROWS UNBOUNDED PRECEDING) AS DOUBLE) AS pl,
                 CAST(SUM(n) OVER (PARTITION BY feature) AS DOUBLE) AS nt,
                 CAST(SUM(pos) OVER (PARTITION BY feature) AS DOUBLE) AS pt
          FROM prof),
        g AS (
          SELECT feature, v, nl, nt,
                 ROUND((nl / nt) *
                   (CAST(1 AS DOUBLE) - (pl / nl) * (pl / nl)
                     - ((nl - pl) / nl) * ((nl - pl) / nl))
                   + ((nt - nl) / nt) *
                   (CAST(1 AS DOUBLE)
                     - ((pt - pl) / (nt - nl)) * ((pt - pl) / (nt - nl))
                     - (((nt - nl) - (pt - pl)) / (nt - nl))
                       * (((nt - nl) - (pt - pl)) / (nt - nl))), 12) AS gini
          FROM scan WHERE nl < nt)
        SELECT feature,
               MIN({'gini': gini, 'v': v, 'nl': nl, 'nt': nt})['v'] AS threshold,
               ROUND(MIN({'gini': gini, 'v': v, 'nl': nl, 'nt': nt})['gini'], 6)
                 AS gini,
               CAST(MIN({'gini': gini, 'v': v, 'nl': nl, 'nt': nt})['nl']
                 AS BIGINT) AS n_left,
               CAST(MIN({'gini': gini, 'v': v, 'nl': nl, 'nt': nt})['nt']
                 - MIN({'gini': gini, 'v': v, 'nl': nl, 'nt': nt})['nl']
                 AS BIGINT) AS n_right
        FROM g GROUP BY feature
        ORDER BY feature""")),

    // Isotonic calibration by the PAVA closed form over the bounded
    // discount-bin profile: iso(i) = max_{j≤i} min_{k≥j} pooled mean.
    // The O(B²) pool lattice is a constant-size self-join over 11 bins.
    "qa3_isotonic" -> Q(
      fn = (s, dir) => {
        val bins = t(s, dir, "lineitem")
          .groupBy(round(col("l_discount") * 100, 0).cast("long").as("bin"))
          .agg(sum((col("l_returnflag") === "R").cast("long"))
              .cast("decimal(18,2)").as("sum_y"),
            count(lit(1)).as("n"))
        Regress.isotonicBins(bins).orderBy(col("bin"))
      },
      oracle = Some("""
        WITH b AS (
          SELECT CAST(ROUND(CAST(l_discount AS DOUBLE) * 100, 0) AS BIGINT)
                   AS bin,
                 CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
                   AS DECIMAL(18,2)) AS sum_y,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM lineitem GROUP BY 1),
        pre AS (
          SELECT bin, sum_y, n,
                 SUM(sum_y) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cs,
                 SUM(n) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING) AS cn
          FROM b),
        pooled AS (
          SELECT j.jb AS jb,
                 ROUND(CAST(k.cs_hi - j.cs_lo AS DOUBLE) /
                       CAST(k.cn_hi - j.cn_lo AS DOUBLE), 9) AS mean_jk
          FROM (SELECT bin AS jb, cs - sum_y AS cs_lo, cn - n AS cn_lo
                FROM pre) j
          JOIN (SELECT bin AS kb, cs AS cs_hi, cn AS cn_hi FROM pre) k
            ON k.kb >= j.jb),
        mk AS (SELECT jb, MIN(mean_jk) AS min_j FROM pooled GROUP BY 1),
        iso AS (
          SELECT b.bin, MAX(mk.min_j) AS iso_rate
          FROM b JOIN mk ON mk.jb <= b.bin GROUP BY 1)
        SELECT b.bin,
               ROUND(ROUND(CAST(b.sum_y AS DOUBLE) / CAST(b.n AS DOUBLE), 9), 6)
                 AS rate,
               ROUND(iso.iso_rate, 6) AS iso_rate
        FROM b JOIN iso ON iso.bin = b.bin
        ORDER BY b.bin""")),

    // Rank statistics per nation over the customer (acctbal, total spend)
    // panel: Spearman ρ on average ranks (ties exact) — scale-safe — and
    // Kendall τ-b from exact pair counts over the bounded per-nation
    // panels (the q91 bounded-slice contract for O(n²) enumeration).
    "qa4_rank_corr" -> Q(
      fn = (s, dir) => {
        val spend = t(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("spend"))
        val pan = t(s, dir, "customer")
          .join(spend, col("c_custkey") === col("o_custkey"))
          .select(col("c_nationkey").as("nation"), col("c_acctbal"),
            col("spend"), col("c_custkey"))
        Regress.rankCorrelation(pan, Seq("nation"),
            col("c_acctbal"), col("spend"), col("c_custkey"))
          .orderBy(col("nation"))
      },
      oracle = Some("""
        WITH pan AS (
          SELECT c_nationkey AS nation, CAST(c_acctbal AS DOUBLE) AS x,
                 CAST(spend AS DOUBLE) AS y, c_custkey AS id
          FROM customer JOIN (
            SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
            FROM orders GROUP BY 1) o ON c_custkey = o_custkey),
        ranked AS (
          SELECT nation, x, y, id,
                 CAST(RANK() OVER (PARTITION BY nation ORDER BY x) AS DOUBLE)
                   + (CAST(COUNT(*) OVER (PARTITION BY nation, x) AS DOUBLE)
                      - CAST(1 AS DOUBLE)) / CAST(2 AS DOUBLE) AS rx,
                 CAST(RANK() OVER (PARTITION BY nation ORDER BY y) AS DOUBLE)
                   + (CAST(COUNT(*) OVER (PARTITION BY nation, y) AS DOUBLE)
                      - CAST(1 AS DOUBLE)) / CAST(2 AS DOUBLE) AS ry
          FROM pan),
        sp AS (
          SELECT nation, CAST(COUNT(*) AS DOUBLE) AS n,
                 CAST(SUM(CAST(ROUND(rx, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sx,
                 CAST(SUM(CAST(ROUND(ry, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sy,
                 CAST(SUM(CAST(ROUND(rx*rx, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sxx,
                 CAST(SUM(CAST(ROUND(ry*ry, 6) AS DECIMAL(38,6))) AS DOUBLE) AS syy,
                 CAST(SUM(CAST(ROUND(rx*ry, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sxy
          FROM ranked GROUP BY 1),
        spr AS (
          SELECT nation, CAST(n AS BIGINT) AS n,
                 CASE WHEN (sxx/n - (sx/n)*(sx/n)) > 0
                       AND (syy/n - (sy/n)*(sy/n)) > 0
                      THEN ROUND((sxy/n - (sx/n)*(sy/n)) /
                        SQRT((sxx/n - (sx/n)*(sx/n))
                           * (syy/n - (sy/n)*(sy/n))), 6) END AS spearman_rho
          FROM sp),
        kt AS (
          SELECT a.nation,
                 CAST(COUNT(*) AS BIGINT) AS n0,
                 CAST(SUM(CASE WHEN (CASE WHEN a.x < b.x THEN 1
                     WHEN a.x > b.x THEN -1 ELSE 0 END)
                   * (CASE WHEN a.y < b.y THEN 1
                     WHEN a.y > b.y THEN -1 ELSE 0 END) = 1
                   THEN 1 ELSE 0 END) AS BIGINT) AS nc,
                 CAST(SUM(CASE WHEN (CASE WHEN a.x < b.x THEN 1
                     WHEN a.x > b.x THEN -1 ELSE 0 END)
                   * (CASE WHEN a.y < b.y THEN 1
                     WHEN a.y > b.y THEN -1 ELSE 0 END) = -1
                   THEN 1 ELSE 0 END) AS BIGINT) AS nd,
                 CAST(SUM(CASE WHEN a.x = b.x THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                 CAST(SUM(CASE WHEN a.y = b.y THEN 1 ELSE 0 END) AS BIGINT) AS n2
          FROM pan a JOIN pan b ON a.nation = b.nation AND a.id < b.id
          GROUP BY 1),
        ktau AS (
          SELECT nation,
                 CASE WHEN (n0 - n1) > 0 AND (n0 - n2) > 0
                      THEN ROUND(CAST(nc - nd AS DOUBLE) /
                        SQRT(CAST(n0 - n1 AS DOUBLE)
                           * CAST(n0 - n2 AS DOUBLE)), 6) END AS kendall_tau
          FROM kt)
        SELECT spr.nation, spr.n, spr.spearman_rho, ktau.kendall_tau
        FROM spr LEFT JOIN ktau ON ktau.nation = spr.nation
        ORDER BY spr.nation""")),

    // Geohash cell profile: standard 5-char geohash (pure codegen bit
    // interleave, no UDF) over md5-derived customer coordinates, rolled
    // up by 2-char prefix cell. The oracle replays the same 25-bit
    // interleave and base-32 rendering via generated SQL (the q3k
    // Z-order precedent).
    "qa5_geohash_cells" -> Q(
      fn = (s, dir) => {
        val pts = t(s, dir, "customer").select(col("c_custkey"),
          hashCoord(col("c_custkey"), "lat", 180000L, 90.0).as("lat"),
          hashCoord(col("c_custkey"), "lon", 360000L, 180.0).as("lon"))
        pts.withColumn("gh", Geo.geohash5(col("lat"), col("lon")))
          .groupBy(substring(col("gh"), 1, 2).as("cell"))
          .agg(count(lit(1)).as("n"),
            countDistinct(col("gh")).as("n_gh5"),
            min(col("c_custkey")).as("min_key"),
            max(col("c_custkey")).as("max_key"))
          .orderBy(col("cell"))
      },
      oracle = Some(s"""
        WITH pts AS (
          SELECT c_custkey,
                 ${coordSql("c_custkey", "lat", 180000L, 90)} AS lat,
                 ${coordSql("c_custkey", "lon", 360000L, 180)} AS lon
          FROM customer),
        idx AS (
          SELECT c_custkey,
                 CAST(FLOOR((lon + CAST(180 AS DOUBLE)) / CAST(360 AS DOUBLE)
                   * CAST(8192 AS DOUBLE)) AS BIGINT) AS lonidx,
                 CAST(FLOOR((lat + CAST(90 AS DOUBLE)) / CAST(180 AS DOUBLE)
                   * CAST(4096 AS DOUBLE)) AS BIGINT) AS latidx
          FROM pts),
        v AS (
          SELECT c_custkey,
                 ${Geo.interleave25Sql("lonidx", "latidx")} AS vv
          FROM idx),
        gh AS (
          SELECT c_custkey, ${Geo.base32Sql("vv")} AS gh FROM v)
        SELECT substr(gh, 1, 2) AS cell, CAST(COUNT(*) AS BIGINT) AS n,
               CAST(COUNT(DISTINCT gh) AS BIGINT) AS n_gh5,
               MIN(c_custkey) AS min_key, MAX(c_custkey) AS max_key
        FROM gh GROUP BY 1 ORDER BY 1""")),

    // Radius join by grid cells: customer pairs within 800 km inside the
    // |lat| ≤ 70 band. Spark runs the cell-bucketed equality join (wrap-
    // safe longitude ring, 5°×(2·2+1)×(2·5+1) neighbor window) — the
    // O(n²) cross product never materializes; the oracle replays the
    // NAIVE all-pairs filter, proving the bucketed plan loses no pair
    // (antimeridian included).
    "qa6_radius_join" -> Q(
      fn = (s, dir) => {
        val pts = t(s, dir, "customer").select(col("c_custkey"),
            hashCoord(col("c_custkey"), "lat", 180000L, 90.0).as("lat"),
            hashCoord(col("c_custkey"), "lon", 360000L, 180.0).as("lon"))
          .filter(abs(col("lat")) <= lit(70.0))
        val a = pts.select(col("c_custkey").as("a_id"),
          col("lat").as("a_lat"), col("lon").as("a_lon"))
        val b = pts.select(col("c_custkey").as("b_id"),
          col("lat").as("b_lat"), col("lon").as("b_lon"))
        Geo.radiusJoinCells(a, "a_lat", "a_lon", b, "b_lat", "b_lon",
            radiusKm = 800.0, cellDeg = 5.0, kLat = 2, kLon = 5)
          .filter(col("a_id") < col("b_id"))
          .select(col("a_id"), col("b_id"), col("dist_km"))
          .orderBy(col("a_id"), col("b_id"))
      },
      oracle = Some(s"""
        WITH pts AS (
          SELECT * FROM (
            SELECT c_custkey AS id,
                   ${coordSql("c_custkey", "lat", 180000L, 90)} AS lat,
                   ${coordSql("c_custkey", "lon", 360000L, 180)} AS lon
            FROM customer)
          WHERE ABS(lat) <= CAST(70 AS DOUBLE)),
        p AS (
          SELECT a.id AS a_id, b.id AS b_id,
                 ROUND(CAST(12742 AS DOUBLE) * ASIN(SQRT(
                   SIN(RADIANS(b.lat - a.lat) / CAST(2 AS DOUBLE))
                     * SIN(RADIANS(b.lat - a.lat) / CAST(2 AS DOUBLE))
                   + COS(RADIANS(a.lat)) * COS(RADIANS(b.lat))
                     * SIN(RADIANS(b.lon - a.lon) / CAST(2 AS DOUBLE))
                     * SIN(RADIANS(b.lon - a.lon) / CAST(2 AS DOUBLE)))), 6)
                   AS dist_km
          FROM pts a JOIN pts b ON a.id < b.id)
        SELECT a_id, b_id, dist_km FROM p
        WHERE dist_km <= CAST(800 AS DOUBLE)
        ORDER BY a_id, b_id""")),

    // Link prediction on the q4b order graph: common neighbors, Jaccard,
    // Adamic–Adar and preferential attachment for every open wedge, top
    // 100 by AA. Candidates come from the wedge join (Σ deg² bound),
    // never a node cross product; AA terms ride DECIMAL(28,12).
    "qa7_link_prediction" -> Q(
      fn = (s, dir) => {
        val edges = t(s, dir, "orders").select(
          (col("o_custkey") % 80).cast("long").as("src"),
          (col("o_orderkey") % 97).cast("long").as("dst"))
        LinkPredict.wedgeScores(edges)
          .orderBy(col("aa").desc, col("u"), col("w"))
          .limit(100)
      },
      oracle = Some("""
        WITH e0 AS (
          SELECT DISTINCT CAST(o_custkey % 80 AS BIGINT) AS s,
                          CAST(o_orderkey % 97 AS BIGINT) AS d
          FROM orders WHERE o_custkey % 80 <> o_orderkey % 97),
        und AS MATERIALIZED (
          SELECT DISTINCT LEAST(s, d) AS u, GREATEST(s, d) AS v FROM e0),
        adj AS MATERIALIZED (
          SELECT u AS a, v AS b FROM und UNION ALL SELECT v, u FROM und),
        deg AS MATERIALIZED (
          SELECT a, CAST(COUNT(*) AS BIGINT) AS deg FROM adj GROUP BY 1),
        wedge AS (
          SELECT x.b AS wu, y.b AS ww, x.a AS z
          FROM adj x JOIN adj y ON x.a = y.a AND x.b < y.b),
        open AS (
          SELECT wedge.* FROM wedge
          LEFT JOIN und ON und.u = wedge.wu AND und.v = wedge.ww
          WHERE und.u IS NULL),
        sc AS (
          SELECT wu AS u, ww AS w, CAST(COUNT(*) AS BIGINT) AS cn,
                 CAST(SUM(CAST(CAST(1 AS DOUBLE) /
                   ln(CAST(dz.deg AS DOUBLE)) AS DECIMAL(28,12)))
                   AS DOUBLE) AS aa_sum
          FROM open JOIN deg dz ON dz.a = open.z GROUP BY 1, 2)
        SELECT sc.u, sc.w, sc.cn,
               ROUND(CAST(sc.cn AS DOUBLE) /
                 CAST(du.deg + dw.deg - sc.cn AS DOUBLE), 6) AS jaccard,
               ROUND(aa_sum, 6) AS aa, du.deg * dw.deg AS pa
        FROM sc JOIN deg du ON du.a = sc.u JOIN deg dw ON dw.a = sc.w
        ORDER BY aa DESC, sc.u, sc.w LIMIT 100""")),

    // Local Outlier Factor (Breunig et al.) over a bounded embedding
    // panel: exact all-pairs kNN (the q31 bounded-slice contract; the
    // 100 TB path feeds LSH candidate pairs instead), k-distance,
    // reachability, lrd and LOF — distances on the 9-decimal grid,
    // neighborhood sums through DECIMAL(28,12).
    "qa8_lof_outliers" -> Q(
      fn = (s, dir) =>
        Outliers.lof(t(s, dir, "embeddings").filter(col("vec_id") < 200)
            .select(col("vec_id"), col("embedding")),
          "vec_id", "embedding", k = 5)
          .orderBy(col("id")),
      headline = true,
      oracle = Some("""
        WITH e AS MATERIALIZED (
          SELECT vec_id AS id, CAST(embedding AS DOUBLE[]) AS v
          FROM embeddings WHERE vec_id < 200),
        pairs AS MATERIALIZED (
          SELECT a.id AS a_id, b.id AS b_id,
                 ROUND(SQRT(list_sum(list_transform(list_zip(a.v, b.v),
                   p -> (p[1]-p[2])*(p[1]-p[2])))), 9) AS d
          FROM e a JOIN e b ON a.id <> b.id),
        knn AS MATERIALIZED (
          SELECT a_id, b_id, d FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY a_id
              ORDER BY d, b_id) AS rn FROM pairs)
          WHERE rn <= 5),
        kd AS MATERIALIZED (
          SELECT a_id, MAX(d) AS kdist FROM knn GROUP BY 1),
        lrd AS MATERIALIZED (
          SELECT k.a_id,
                 ROUND(CAST(5 AS DOUBLE) /
                   CAST(SUM(CAST(GREATEST(kb.kdist, k.d) AS DECIMAL(28,12)))
                     AS DOUBLE), 9) AS lrd
          FROM knn k JOIN kd kb ON kb.a_id = k.b_id
          GROUP BY 1),
        lofs AS (
          SELECT k.a_id,
                 ROUND(CAST(SUM(CAST(lb.lrd AS DECIMAL(28,12))) AS DOUBLE)
                   / CAST(5 AS DOUBLE) / la.lrd, 6) AS lof
          FROM knn k JOIN lrd lb ON lb.a_id = k.b_id
          JOIN lrd la ON la.a_id = k.a_id
          GROUP BY k.a_id, la.lrd)
        SELECT kd.a_id AS id, kd.kdist, lrd.lrd, lofs.lof
        FROM kd JOIN lrd ON lrd.a_id = kd.a_id
        JOIN lofs ON lofs.a_id = kd.a_id
        ORDER BY id""")),

    // Dynamic time warping between hourly event-type profiles: the DP is
    // exact Long arithmetic end-to-end (integer counts, |a−b| costs), so
    // the oracle's recursive-CTE replay — row-major cells with a sliding
    // 25-value window — matches bit-for-bit with zero float reasoning.
    "qa9_dtw_profiles" -> Q(
      fn = (s, dir) => {
        val cnt = Tables(s, dir, "events")
          .withColumn("ts_ms", unix_millis(col("ts")))
          .withColumn("hod", (expr("ts_ms div 3600000") % 24).cast("long"))
          .groupBy(col("event_type"), col("hod"))
          .agg(count(lit(1)).as("n"))
        val types = cnt.select(col("event_type")).distinct()
        val hours = types.sparkSession.range(24).select(col("id").as("hod"))
        val prof = types.crossJoin(hours)
          .join(cnt, Seq("event_type", "hod"), "left")
          .withColumn("n0", coalesce(col("n"), lit(0L)))
          .groupBy(col("event_type"))
          .agg(transform(sort_array(collect_list(struct(col("hod"), col("n0")))),
            x => x.getField("n0")).as("arr"))
        prof.select(col("event_type").as("et_a"), col("arr").as("av"))
          .join(prof.select(col("event_type").as("et_b"), col("arr").as("bv")),
            col("et_a") < col("et_b"))
          .select(col("et_a"), col("et_b"),
            TimeWarp.dtwUdf(col("av"), col("bv")).as("dtw"))
          .orderBy(col("et_a"), col("et_b"))
      },
      oracle = Some("""
        WITH RECURSIVE hours AS (
          SELECT CAST(UNNEST(range(24)) AS BIGINT) AS hod),
        cnt AS (
          SELECT event_type,
                 CAST((epoch_ms(ts) // 3600000) % 24 AS BIGINT) AS hod,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM events GROUP BY 1, 2),
        et AS (SELECT DISTINCT event_type FROM cnt),
        prof AS MATERIALIZED (
          SELECT e.event_type,
                 list(COALESCE(c.n, CAST(0 AS BIGINT)) ORDER BY h.hod) AS arr
          FROM et e CROSS JOIN hours h
          LEFT JOIN cnt c ON c.event_type = e.event_type AND c.hod = h.hod
          GROUP BY 1),
        pairs AS MATERIALIZED (
          SELECT x.event_type AS et_a, y.event_type AS et_b,
                 x.arr AS av, y.arr AS bv
          FROM prof x JOIN prof y ON x.event_type < y.event_type),
        dp AS (
          SELECT et_a, et_b, av, bv, 0 AS t,
                 list_transform(range(25),
                   x -> CAST(1099511627776 AS BIGINT)) AS acc
          FROM pairs
          UNION ALL
          SELECT et_a, et_b, av, bv, t + 1,
                 list_append(list_slice(acc, 2, 25),
                   ABS(av[(t // 24) + 1] - bv[(t % 24) + 1]) +
                   CASE WHEN t = 0 THEN CAST(0 AS BIGINT)
                        ELSE LEAST(
                          CASE WHEN t >= 24 THEN acc[2]
                               ELSE CAST(1099511627776 AS BIGINT) END,
                          CASE WHEN (t % 24) <> 0 THEN acc[25]
                               ELSE CAST(1099511627776 AS BIGINT) END,
                          CASE WHEN t >= 24 AND (t % 24) <> 0 THEN acc[1]
                               ELSE CAST(1099511627776 AS BIGINT) END) END)
          FROM dp WHERE t < 576)
        SELECT et_a, et_b, acc[25] AS dtw FROM dp WHERE t = 576
        ORDER BY et_a, et_b""")),

    // Exact ROC-AUC of event value predicting the purchase class, by the
    // rank identity with half-credit ties — computed WITHOUT any global
    // window (distinct-score profile + the range-partitioned running-sum
    // image), reduced to integer sums and one double division.
    "qaa_auc_exact" -> Q(
      fn = (s, dir) =>
        graft.operators.Stats.rocAuc(
          Tables(s, dir, "events").filter(col("value").isNotNull),
          col("value"), (col("event_type") === "purchase").cast("long")),
      oracle = Some("""
        WITH e AS (
          SELECT CAST(value AS DOUBLE) AS s,
                 CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
          FROM events WHERE value IS NOT NULL),
        prof AS (
          SELECT s, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(y) AS BIGINT) AS npos
          FROM e GROUP BY 1),
        r AS (
          SELECT *, SUM(n) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) AS cum
          FROM prof),
        agg AS (
          SELECT CAST(SUM(npos * (2 * (cum - n) + n + 1)) AS BIGINT) AS s2,
                 CAST(SUM(npos) AS BIGINT) AS n1,
                 CAST(SUM(n) AS BIGINT) AS nt
          FROM r)
        SELECT n1 AS n_pos, nt - n1 AS n_neg,
               ROUND(CAST(s2 - n1 * (n1 + 1) AS DOUBLE) /
                 CAST(2 * n1 * (nt - n1) AS DOUBLE), 6) AS auc,
               ROUND(CAST(2 AS DOUBLE) *
                 (CAST(s2 - n1 * (n1 + 1) AS DOUBLE) /
                  CAST(2 * n1 * (nt - n1) AS DOUBLE))
                 - CAST(1 AS DOUBLE), 6) AS gini
        FROM agg""")),

    // 5-fold cross-validation of the qa0 OLS in ONE aggregation pass:
    // per-fold DECIMAL moments, train moments by exact decimal
    // subtraction (total − fold), per-fold Cramer fit, held-out RMSE/R²
    // algebraic from the fold's own moments — CV cost independent of K.
    "qab_ols_cv" -> Q(
      fn = (s, dir) => {
        val feats = t(s, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("x1"), sum(col("l_quantity")).as("x2"))
        val joined = t(s, dir, "orders")
          .join(feats, col("o_orderkey") === col("l_orderkey"))
        Regress.ols2CvFolds(joined, col("o_totalprice"), col("x1"),
            col("x2"), col("o_orderkey") % 5)
          .orderBy(col("fold"))
      },
      oracle = Some("""
        WITH f AS (
          SELECT CAST(o_orderkey % 5 AS BIGINT) AS fold,
                 CAST(o_totalprice AS DOUBLE) AS y,
                 CAST(x1 AS DOUBLE) AS x1, CAST(x2 AS DOUBLE) AS x2
          FROM orders JOIN (
            SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS x1,
                   SUM(l_quantity) AS x2
            FROM lineitem GROUP BY 1) li ON o_orderkey = l_orderkey),
        pf AS (
          SELECT fold, CAST(COUNT(*) AS BIGINT) AS fn,
                 SUM(CAST(ROUND(x1, 6) AS DECIMAL(38,6))) AS fs1,
                 SUM(CAST(ROUND(x2, 6) AS DECIMAL(38,6))) AS fs2,
                 SUM(CAST(ROUND(x1*x1, 6) AS DECIMAL(38,6))) AS fs11,
                 SUM(CAST(ROUND(x1*x2, 6) AS DECIMAL(38,6))) AS fs12,
                 SUM(CAST(ROUND(x2*x2, 6) AS DECIMAL(38,6))) AS fs22,
                 SUM(CAST(ROUND(y, 6) AS DECIMAL(38,6))) AS fsy,
                 SUM(CAST(ROUND(x1*y, 6) AS DECIMAL(38,6))) AS fs1y,
                 SUM(CAST(ROUND(x2*y, 6) AS DECIMAL(38,6))) AS fs2y,
                 SUM(CAST(ROUND(y*y, 6) AS DECIMAL(38,6))) AS fsyy
          FROM f GROUP BY 1),
        tt AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS tn,
                 SUM(CAST(ROUND(x1, 6) AS DECIMAL(38,6))) AS ts1,
                 SUM(CAST(ROUND(x2, 6) AS DECIMAL(38,6))) AS ts2,
                 SUM(CAST(ROUND(x1*x1, 6) AS DECIMAL(38,6))) AS ts11,
                 SUM(CAST(ROUND(x1*x2, 6) AS DECIMAL(38,6))) AS ts12,
                 SUM(CAST(ROUND(x2*x2, 6) AS DECIMAL(38,6))) AS ts22,
                 SUM(CAST(ROUND(y, 6) AS DECIMAL(38,6))) AS tsy,
                 SUM(CAST(ROUND(x1*y, 6) AS DECIMAL(38,6))) AS ts1y,
                 SUM(CAST(ROUND(x2*y, 6) AS DECIMAL(38,6))) AS ts2y,
                 SUM(CAST(ROUND(y*y, 6) AS DECIMAL(38,6))) AS tsyy
          FROM f),
        m AS (
          SELECT fold, fn, tn,
                 CAST(tn - fn AS DOUBLE) AS n,
                 CAST(ts1 - fs1 AS DOUBLE) AS s1,
                 CAST(ts2 - fs2 AS DOUBLE) AS s2,
                 CAST(ts11 - fs11 AS DOUBLE) AS s11,
                 CAST(ts12 - fs12 AS DOUBLE) AS s12,
                 CAST(ts22 - fs22 AS DOUBLE) AS s22,
                 CAST(tsy - fsy AS DOUBLE) AS sy,
                 CAST(ts1y - fs1y AS DOUBLE) AS s1y,
                 CAST(ts2y - fs2y AS DOUBLE) AS s2y,
                 CAST(fn AS DOUBLE) AS e_n,
                 CAST(fs1 AS DOUBLE) AS e_s1, CAST(fs2 AS DOUBLE) AS e_s2,
                 CAST(fs11 AS DOUBLE) AS e_s11,
                 CAST(fs12 AS DOUBLE) AS e_s12,
                 CAST(fs22 AS DOUBLE) AS e_s22,
                 CAST(fsy AS DOUBLE) AS e_sy,
                 CAST(fs1y AS DOUBLE) AS e_s1y,
                 CAST(fs2y AS DOUBLE) AS e_s2y,
                 CAST(fsyy AS DOUBLE) AS e_syy
          FROM pf CROSS JOIN tt),
        d AS (
          SELECT *,
                 n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
                   + s2 * (s1 * s12 - s11 * s2) AS det,
                 sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
                   + s2 * (s1y * s12 - s11 * s2y) AS det0,
                 n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
                   + s2 * (s1 * s2y - s1y * s2) AS det1,
                 n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
                   + sy * (s1 * s12 - s11 * s2) AS det2
          FROM m),
        b AS (
          SELECT *, ROUND(det0 / det, 9) AS b0, ROUND(det1 / det, 9) AS b1,
                 ROUND(det2 / det, 9) AS b2
          FROM d),
        e AS (
          SELECT *,
                 e_syy - CAST(2 AS DOUBLE) *
                     (b0 * e_sy + b1 * e_s1y + b2 * e_s2y)
                   + (b0 * b0 * e_n + b1 * b1 * e_s11 + b2 * b2 * e_s22
                      + CAST(2 AS DOUBLE) * b0 * b1 * e_s1
                      + CAST(2 AS DOUBLE) * b0 * b2 * e_s2
                      + CAST(2 AS DOUBLE) * b1 * b2 * e_s12) AS sse_t,
                 e_syy - e_sy * e_sy / e_n AS sst_t
          FROM b)
        SELECT fold, tn - fn AS n_train, fn AS n_test,
               ROUND(b0, 6) AS b0, ROUND(b1, 6) AS b1, ROUND(b2, 6) AS b2,
               ROUND(SQRT(GREATEST(sse_t, CAST(0 AS DOUBLE)) / e_n), 6)
                 AS rmse,
               ROUND(CAST(1 AS DOUBLE) - sse_t / sst_t, 6) AS r2_test
        FROM e ORDER BY fold""")),

    // Theil–Sen robust regression per nation: lower-median pairwise
    // slope and lower-median residual intercept — order statistics, not
    // averages, so the estimate is exact. O(n²) pair enumeration over
    // the bounded per-nation panels (q91 contract). The oracle appends
    // + CAST(0 AS DOUBLE) to every ROUND whose argument can be a tiny
    // negative (the −0.0 gotcha: zero-numerator slopes take the sign of
    // the denominator in DuckDB, Spark normalizes).
    "qac_theil_sen" -> Q(
      fn = (s, dir) => {
        val spend = t(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("spend"))
        val pan = t(s, dir, "customer")
          .join(spend, col("c_custkey") === col("o_custkey"))
          .select(col("c_nationkey").as("nation"), col("c_acctbal"),
            col("spend"), col("c_custkey"))
        Regress.theilSen(pan, Seq("nation"), col("c_acctbal"), col("spend"),
            col("c_custkey"))
          .orderBy(col("nation"))
      },
      oracle = Some("""
        WITH pan AS (
          SELECT c_nationkey AS nation, CAST(c_acctbal AS DOUBLE) AS x,
                 CAST(spend AS DOUBLE) AS y, c_custkey AS id
          FROM customer JOIN (
            SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS spend
            FROM orders GROUP BY 1) o ON c_custkey = o_custkey),
        sl AS (
          SELECT a.nation, a.id AS ai, b.id AS bi,
                 ROUND((b.y - a.y) / (b.x - a.x), 9) + CAST(0 AS DOUBLE)
                   AS slope
          FROM pan a JOIN pan b
            ON a.nation = b.nation AND a.id < b.id AND a.x <> b.x),
        np AS (
          SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_pairs
          FROM sl GROUP BY 1),
        sen AS (
          SELECT nation, n_pairs, slope AS sen_slope FROM (
            SELECT s.nation, s.slope, np.n_pairs,
                   ROW_NUMBER() OVER (PARTITION BY s.nation
                     ORDER BY s.slope, s.ai, s.bi) AS rn
            FROM sl s JOIN np USING (nation))
          WHERE rn = (n_pairs + 1) // 2),
        nn AS (
          SELECT nation, CAST(COUNT(*) AS BIGINT) AS n FROM pan GROUP BY 1),
        res AS (
          SELECT p.nation, p.id,
                 ROUND(p.y - sen.sen_slope * p.x, 9) + CAST(0 AS DOUBLE)
                   AS r0
          FROM pan p JOIN sen USING (nation)),
        ic AS (
          SELECT nation, r0 AS sen_intercept FROM (
            SELECT r.nation, r.r0, r.id, nn.n,
                   ROW_NUMBER() OVER (PARTITION BY r.nation
                     ORDER BY r.r0, r.id) AS rn
            FROM res r JOIN nn USING (nation))
          WHERE rn = (n + 1) // 2)
        SELECT nn.nation, nn.n, sen.n_pairs,
               ROUND(sen.sen_slope, 6) + CAST(0 AS DOUBLE) AS sen_slope,
               ROUND(ic.sen_intercept, 6) + CAST(0 AS DOUBLE)
                 AS sen_intercept
        FROM nn JOIN sen USING (nation) JOIN ic USING (nation)
        ORDER BY nation""")),

    // Katz centrality on the q4b order graph: 3 rounds of x ← 1 + α·Aᵀx
    // (α = 0.1), per-round DECIMAL contribution sums snapped to the
    // 9-decimal grid — the q4b unrolled-CTE recipe without the
    // dangling-mass machinery.
    "qad_katz" -> Q(
      fn = (s, dir) => {
        val edges = t(s, dir, "orders").select(
          (col("o_custkey") % 80).cast("long").as("src"),
          (col("o_orderkey") % 97).cast("long").as("dst"))
        graft.operators.GraphOps.katz(edges, alpha = 0.1, iterations = 3)
          .select(col("node"), round(col("katz"), 6).as("katz"))
          .orderBy(col("node"))
      },
      oracle = Some {
        val iters = (1 to 3).map { i =>
          val prev = s"x${i - 1}"
          s""",
        c$i AS (
          SELECT e.d AS node, SUM(CAST(x.katz AS DECIMAL(28,12))) AS csum
          FROM edges e JOIN $prev x ON x.node = e.s GROUP BY 1),
        x$i AS MATERIALIZED (
          SELECT n.node,
                 ROUND(CAST(1 AS DOUBLE) + CAST(0.1 AS DOUBLE) *
                   COALESCE(CAST(c.csum AS DOUBLE), CAST(0 AS DOUBLE)), 9)
                   AS katz
          FROM nodes n LEFT JOIN c$i c ON c.node = n.node)"""
        }.mkString
        s"""
        WITH edges AS MATERIALIZED (
          SELECT DISTINCT CAST(o_custkey % 80 AS BIGINT) AS s,
                          CAST(o_orderkey % 97 AS BIGINT) AS d
          FROM orders WHERE o_custkey % 80 <> o_orderkey % 97),
        nodes AS MATERIALIZED (
          SELECT s AS node FROM edges UNION SELECT d FROM edges),
        x0 AS (SELECT node, CAST(1 AS DOUBLE) AS katz FROM nodes)$iters
        SELECT node, ROUND(katz, 6) AS katz FROM x3 ORDER BY node"""
      }),

    // Gradient-boosted stumps (2 rounds, squared loss, lr 0.5) on
    // l_extendedprice ~ (quantity, discount): residual moments are
    // ALGEBRAIC from exact DECIMAL profile cumulants (never per-row), the
    // round-2 side joins the broadcast winner row, and every stage is a
    // fixed-shape double expression — the q5a/q4y training-oracle recipe
    // extended to ensembles.
    "qae_boosted_stumps" -> Q(
      fn = (s, dir) =>
        graft.operators.Boost.boostedStumps2(t(s, dir, "lineitem"),
            col("l_extendedprice"), "quantity", col("l_quantity"),
            "discount_pct", round(col("l_discount") * 100, 0), lr = 0.5)
          .orderBy(col("round")),
      headline = true,
      oracle = Some("""
        WITH li AS (
          SELECT CAST(l_extendedprice AS DOUBLE) AS y,
                 CAST(l_quantity AS DOUBLE) AS f1,
                 ROUND(CAST(l_discount AS DOUBLE) * 100, 0) AS f2
          FROM lineitem),
        g AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(y AS DECIMAL(18,2))) AS sy,
                 SUM(CAST(y AS DECIMAL(18,2)) * CAST(y AS DECIMAL(18,2))) AS syy
          FROM li),
        f0r AS MATERIALIZED (
          SELECT ROUND(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 9) AS f0,
                 ROUND(CAST(CAST(syy AS VARCHAR) AS DOUBLE)
                   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)
                     / CAST(n AS DOUBLE), 6) AS sst
          FROM g),
        p1 AS (
          SELECT 'quantity' AS feature, f1 AS v, CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(y AS DECIMAL(18,2))) AS sy,
                 SUM(CAST(y AS DECIMAL(18,2)) * CAST(y AS DECIMAL(18,2))) AS syy
          FROM li GROUP BY 2
          UNION ALL
          SELECT 'discount_pct', f2, CAST(COUNT(*) AS BIGINT),
                 SUM(CAST(y AS DECIMAL(18,2))),
                 SUM(CAST(y AS DECIMAL(18,2)) * CAST(y AS DECIMAL(18,2)))
          FROM li GROUP BY 2),
        scan1 AS (
          SELECT feature, v,
                 SUM(n) OVER wv AS nl, SUM(sy) OVER wv AS syl,
                 SUM(syy) OVER wv AS syyl,
                 SUM(n) OVER wf AS nt, SUM(sy) OVER wf AS syt,
                 SUM(syy) OVER wf AS syyt
          FROM p1
          WINDOW wv AS (PARTITION BY feature ORDER BY v
                        ROWS UNBOUNDED PRECEDING),
                 wf AS (PARTITION BY feature)),
        s1 AS (
          SELECT feature, v, CAST(nl AS DOUBLE) AS nld,
                 CAST(nt - nl AS DOUBLE) AS nrd,
                 CAST(syl AS DOUBLE) - CAST(nl AS DOUBLE) * f0 AS sl,
                 CAST(syt - syl AS DOUBLE)
                   - CAST(nt - nl AS DOUBLE) * f0 AS sr,
                 CAST(CAST(syyl AS VARCHAR) AS DOUBLE)
                   - CAST(2 AS DOUBLE) * f0 * CAST(syl AS DOUBLE)
                   + CAST(nl AS DOUBLE) * f0 * f0 AS ssl,
                 CAST(CAST(syyt - syyl AS VARCHAR) AS DOUBLE)
                   - CAST(2 AS DOUBLE) * f0 * CAST(syt - syl AS DOUBLE)
                   + CAST(nt - nl AS DOUBLE) * f0 * f0 AS ssr
          FROM scan1 CROSS JOIN f0r WHERE nl < nt),
        sse1c AS (
          SELECT feature, v, nld, nrd, sl, sr,
                 ROUND((ssl - sl*sl/nld) + (ssr - sr*sr/nrd), 6) AS sse
          FROM s1),
        w1r AS (
          SELECT MIN({'sse': sse, 'feature': feature, 'v': v, 'sl': sl,
                      'sr': sr, 'nld': nld, 'nrd': nrd}) AS w
          FROM sse1c),
        win1 AS MATERIALIZED (
          SELECT w['sse'] AS sse1, w['feature'] AS feat1, w['v'] AS t1,
                 ROUND(w['sl'] / w['nld'], 9) AS wl1,
                 ROUND(w['sr'] / w['nrd'], 9) AS wr1,
                 f0, sst,
                 f0 + CAST(0.5 AS DOUBLE) * ROUND(w['sl'] / w['nld'], 9) AS cl1,
                 f0 + CAST(0.5 AS DOUBLE) * ROUND(w['sr'] / w['nrd'], 9) AS cr1
          FROM w1r CROSS JOIN f0r),
        sided AS (
          SELECT li.y, li.f1, li.f2,
                 CASE WHEN w.feat1 = 'quantity' THEN li.f1 <= w.t1
                      ELSE li.f2 <= w.t1 END AS side1
          FROM li CROSS JOIN win1 w),
        p2 AS (
          SELECT 'quantity' AS feature, f1 AS v,
                 CAST(SUM(CASE WHEN NOT side1 THEN 1 ELSE 0 END) AS BIGINT) AS n0,
                 COALESCE(SUM(CASE WHEN NOT side1
                   THEN CAST(y AS DECIMAL(18,2)) END),
                   CAST(0 AS DECIMAL(18,2))) AS sy0,
                 COALESCE(SUM(CASE WHEN NOT side1
                   THEN CAST(y AS DECIMAL(18,2)) * CAST(y AS DECIMAL(18,2)) END),
                   CAST(0 AS DECIMAL(18,4))) AS syy0,
                 CAST(SUM(CASE WHEN side1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                 COALESCE(SUM(CASE WHEN side1
                   THEN CAST(y AS DECIMAL(18,2)) END),
                   CAST(0 AS DECIMAL(18,2))) AS sy1,
                 COALESCE(SUM(CASE WHEN side1
                   THEN CAST(y AS DECIMAL(18,2)) * CAST(y AS DECIMAL(18,2)) END),
                   CAST(0 AS DECIMAL(18,4))) AS syy1
          FROM sided GROUP BY 2
          UNION ALL
          SELECT 'discount_pct', f2,
                 CAST(SUM(CASE WHEN NOT side1 THEN 1 ELSE 0 END) AS BIGINT),
                 COALESCE(SUM(CASE WHEN NOT side1
                   THEN CAST(y AS DECIMAL(18,2)) END),
                   CAST(0 AS DECIMAL(18,2))),
                 COALESCE(SUM(CASE WHEN NOT side1
                   THEN CAST(y AS DECIMAL(18,2)) * CAST(y AS DECIMAL(18,2)) END),
                   CAST(0 AS DECIMAL(18,4))),
                 CAST(SUM(CASE WHEN side1 THEN 1 ELSE 0 END) AS BIGINT),
                 COALESCE(SUM(CASE WHEN side1
                   THEN CAST(y AS DECIMAL(18,2)) END),
                   CAST(0 AS DECIMAL(18,2))),
                 COALESCE(SUM(CASE WHEN side1
                   THEN CAST(y AS DECIMAL(18,2)) * CAST(y AS DECIMAL(18,2)) END),
                   CAST(0 AS DECIMAL(18,4)))
          FROM sided GROUP BY 2),
        scan2 AS (
          SELECT feature, v,
                 SUM(n0) OVER wv AS nl0, SUM(sy0) OVER wv AS syl0,
                 SUM(syy0) OVER wv AS syyl0,
                 SUM(n1) OVER wv AS nl1, SUM(sy1) OVER wv AS syl1,
                 SUM(syy1) OVER wv AS syyl1,
                 SUM(n0) OVER wf AS nt0, SUM(sy0) OVER wf AS syt0,
                 SUM(syy0) OVER wf AS syyt0,
                 SUM(n1) OVER wf AS nt1, SUM(sy1) OVER wf AS syt1,
                 SUM(syy1) OVER wf AS syyt1
          FROM p2
          WINDOW wv AS (PARTITION BY feature ORDER BY v
                        ROWS UNBOUNDED PRECEDING),
                 wf AS (PARTITION BY feature)),
        s2 AS (
          SELECT feature, v,
                 CAST(nl0 + nl1 AS DOUBLE) AS nld,
                 CAST((nt0 - nl0) + (nt1 - nl1) AS DOUBLE) AS nrd,
                 (CAST(syl0 AS DOUBLE) - CAST(nl0 AS DOUBLE) * cr1)
                   + (CAST(syl1 AS DOUBLE) - CAST(nl1 AS DOUBLE) * cl1) AS sl,
                 (CAST(syt0 - syl0 AS DOUBLE)
                    - CAST(nt0 - nl0 AS DOUBLE) * cr1)
                   + (CAST(syt1 - syl1 AS DOUBLE)
                    - CAST(nt1 - nl1 AS DOUBLE) * cl1) AS sr,
                 (CAST(CAST(syyl0 AS VARCHAR) AS DOUBLE)
                    - CAST(2 AS DOUBLE) * cr1 * CAST(syl0 AS DOUBLE)
                    + CAST(nl0 AS DOUBLE) * cr1 * cr1)
                   + (CAST(CAST(syyl1 AS VARCHAR) AS DOUBLE)
                    - CAST(2 AS DOUBLE) * cl1 * CAST(syl1 AS DOUBLE)
                    + CAST(nl1 AS DOUBLE) * cl1 * cl1) AS ssl,
                 (CAST(CAST(syyt0 - syyl0 AS VARCHAR) AS DOUBLE)
                    - CAST(2 AS DOUBLE) * cr1 * CAST(syt0 - syl0 AS DOUBLE)
                    + CAST(nt0 - nl0 AS DOUBLE) * cr1 * cr1)
                   + (CAST(CAST(syyt1 - syyl1 AS VARCHAR) AS DOUBLE)
                    - CAST(2 AS DOUBLE) * cl1 * CAST(syt1 - syl1 AS DOUBLE)
                    + CAST(nt1 - nl1 AS DOUBLE) * cl1 * cl1) AS ssr
          FROM scan2 CROSS JOIN win1
          WHERE (nl0 + nl1) < (nt0 + nt1)),
        sse2c AS (
          SELECT feature, v, nld, nrd, sl, sr,
                 ROUND((ssl - sl*sl/nld) + (ssr - sr*sr/nrd), 6) AS sse
          FROM s2),
        win2 AS (
          SELECT w['sse'] AS sse2, w['feature'] AS feat2, w['v'] AS t2,
                 ROUND(w['sl'] / w['nld'], 9) AS wl2,
                 ROUND(w['sr'] / w['nrd'], 9) AS wr2
          FROM (SELECT MIN({'sse': sse, 'feature': feature, 'v': v,
                            'sl': sl, 'sr': sr, 'nld': nld,
                            'nrd': nrd}) AS w
                FROM sse2c))
        SELECT CAST(0 AS INT) AS round, '(const)' AS feature,
               CAST(NULL AS DOUBLE) AS threshold, f0 AS w_left,
               f0 AS w_right, sst AS sse
        FROM f0r
        UNION ALL
        SELECT CAST(1 AS INT), feat1, t1, wl1, wr1, sse1 FROM win1
        UNION ALL
        SELECT CAST(2 AS INT), feat2, t2, wl2, wr2, sse2 FROM win2
        ORDER BY round""")),

    // Exact Shapley-value channel attribution: user exposure sets before
    // the first HIGH-VALUE purchase (value > 180, so conversion actually
    // varies — every user eventually sees every event type) reduce to a
    // 16-row coalition table (one groupBy
    // chain), and each channel's credit is the exact Shapley enumeration
    // over that bounded table — factorial weights in fixed-shape double
    // divisions, terms through DECIMAL(28,12).
    "qaf_shapley_attribution" -> Q(
      fn = (s, dir) =>
        graft.operators.Shapley.attribution(
            Tables(s, dir, "events").withColumn("ts_ms", unix_millis(col("ts"))),
            "user_id", "ts_ms", "event_type",
            col("event_type") === "purchase" && col("value") > 180.0,
            Seq("click", "error", "signup", "view"))
          .orderBy(col("channel")),
      oracle = Some("""
        WITH ev AS (
          SELECT user_id AS u, epoch_ms(ts) AS ts, event_type AS ch,
                 CAST(value AS DOUBLE) AS v
          FROM events),
        fp AS (
          SELECT u, MIN(ts) AS fp FROM ev
          WHERE ch = 'purchase' AND v > CAST(180 AS DOUBLE) GROUP BY 1),
        expo AS (
          SELECT e.u, e.ch FROM ev e LEFT JOIN fp ON fp.u = e.u
          WHERE NOT (e.ch = 'purchase' AND e.v > CAST(180 AS DOUBLE))
            AND (fp.fp IS NULL OR e.ts < fp.fp)),
        em AS (
          SELECT u,
                 MAX(CASE WHEN ch = 'click' THEN 1 ELSE 0 END)
               + MAX(CASE WHEN ch = 'error' THEN 2 ELSE 0 END)
               + MAX(CASE WHEN ch = 'signup' THEN 4 ELSE 0 END)
               + MAX(CASE WHEN ch = 'view' THEN 8 ELSE 0 END) AS mask
          FROM expo GROUP BY 1),
        um AS (
          SELECT d.u, CAST(COALESCE(em.mask, 0) AS BIGINT) AS mask,
                 CASE WHEN fp.u IS NULL THEN 0 ELSE 1 END AS conv
          FROM (SELECT DISTINCT u FROM ev) d
          LEFT JOIN em ON em.u = d.u LEFT JOIN fp ON fp.u = d.u),
        coal AS (
          SELECT mask, CAST(COUNT(*) AS BIGINT) AS users,
                 CAST(SUM(conv) AS BIGINT) AS converted
          FROM um GROUP BY 1),
        allm AS (SELECT CAST(UNNEST(range(16)) AS BIGINT) AS mask),
        vt AS MATERIALIZED (
          SELECT a.mask,
                 COALESCE(ROUND(CAST(c.converted AS DOUBLE) /
                   CAST(c.users AS DOUBLE), 12), CAST(0 AS DOUBLE)) AS v
          FROM allm a LEFT JOIN coal c ON c.mask = a.mask),
        ch AS (SELECT * FROM (VALUES ('click', 0), ('error', 1),
               ('signup', 2), ('view', 3)) AS t(channel, bit)),
        pairs AS (
          SELECT ch.channel,
                 ((a.mask >> 0) & 1) + ((a.mask >> 1) & 1)
               + ((a.mask >> 2) & 1) + ((a.mask >> 3) & 1) AS s,
                 a.v AS v_s, b.v AS v_si
          FROM ch CROSS JOIN vt a
          JOIN vt b ON b.mask = a.mask + (1 << ch.bit)
          WHERE ((a.mask >> ch.bit) & 1) = 0),
        terms AS (
          SELECT channel,
                 CAST(ROUND(
                   ([CAST(1 AS DOUBLE), CAST(1 AS DOUBLE), CAST(2 AS DOUBLE),
                     CAST(6 AS DOUBLE), CAST(24 AS DOUBLE)][CAST(s + 1 AS INT)]
                    * [CAST(1 AS DOUBLE), CAST(1 AS DOUBLE), CAST(2 AS DOUBLE),
                       CAST(6 AS DOUBLE), CAST(24 AS DOUBLE)][CAST(4 - s AS INT)]
                    / CAST(24 AS DOUBLE)) * (v_si - v_s), 12)
                   AS DECIMAL(28,12)) AS term
          FROM pairs)
        SELECT channel, ROUND(CAST(SUM(term) AS DOUBLE), 6) AS phi
        FROM terms GROUP BY 1 ORDER BY 1""")),

    // Blocking-quality report for entity resolution: sorted-neighborhood
    // candidates evaluated against the q5j edit-distance ground truth —
    // reduction ratio, pair completeness (recall) and pair quality
    // (precision), the standard Christen blocking metrics. The sort key
    // is the REVERSED token order (noun first): the fixture's matches
    // differ in the leading adjective, so raw-order neighborhoods catch
    // none of them — the key choice IS the finding this report exists to
    // surface. Candidates come from k = 1..3 rank-shift EQUI joins on
    // the distributed global row number (no non-equi join, no global
    // window).
    "qag_blocking_metrics" -> Q(
      fn = (s, dir) => {
        val d = t(s, dir, "part")
          .select(col("p_name").cast("string").as("name"))
          .filter(col("name").isNotNull).distinct()
          .withColumn("key",
            concat_ws(" ", reverse(split(col("name"), " "))))
        val ranked = graft.operators.ScaleOps.globalRowNumber(
          d, Seq(col("key"), col("name")), "ra")
        val cand = ranked
          .withColumn("k", explode(array(lit(1), lit(2), lit(3))))
          .withColumn("rb", col("ra") + col("k"))
          .join(ranked.select(col("name").as("nb"), col("ra").as("rb")),
            Seq("rb"))
          .select(least(col("name"), col("nb")).as("sa"),
            greatest(col("name"), col("nb")).as("sb"))
        val truth = graft.operators.FuzzyJoin
          .editDistancePairs(t(s, dir, "part"), "p_name", maxDist = 2)
          .select(col("str_a").as("sa"), col("str_b").as("sb"))
        val found = cand.join(truth, Seq("sa", "sb"))
        d.agg(count(lit(1)).as("n_names"))
          .crossJoin(cand.agg(count(lit(1)).as("n_cand")))
          .crossJoin(truth.agg(count(lit(1)).as("n_true")))
          .crossJoin(found.agg(count(lit(1)).as("n_found")))
          .select(col("n_names"), col("n_cand"), col("n_true"),
            col("n_found"),
            round(lit(1.0) - col("n_cand").cast("double") /
              (col("n_names").cast("double") *
                (col("n_names") - 1).cast("double") / lit(2.0)), 6)
              .as("reduction_ratio"),
            round(col("n_found").cast("double") /
              col("n_true").cast("double"), 6).as("pair_completeness"),
            round(col("n_found").cast("double") /
              col("n_cand").cast("double"), 6).as("pair_quality"))
      },
      oracle = Some("""
        WITH d AS (
          SELECT DISTINCT p_name AS s FROM part WHERE p_name IS NOT NULL),
        dk AS (
          SELECT s, array_to_string(list_reverse(string_split(s, ' ')), ' ')
                   AS k
          FROM d),
        r AS (
          SELECT s, ROW_NUMBER() OVER (ORDER BY k, s) AS rn FROM dk),
        cand AS (
          SELECT LEAST(a.s, b.s) AS sa, GREATEST(a.s, b.s) AS sb
          FROM r a JOIN r b ON b.rn > a.rn AND b.rn <= a.rn + 3),
        truth AS (
          SELECT a.s AS sa, b.s AS sb
          FROM d a JOIN d b ON a.s < b.s
          WHERE levenshtein(a.s, b.s) BETWEEN 1 AND 2),
        counts AS (
          SELECT
            (SELECT CAST(COUNT(*) AS BIGINT) FROM dk) AS n_names,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM cand) AS n_cand,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_true,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM cand
             JOIN truth ON truth.sa = cand.sa AND truth.sb = cand.sb)
              AS n_found)
        SELECT n_names, n_cand, n_true, n_found,
               ROUND(CAST(1 AS DOUBLE) - CAST(n_cand AS DOUBLE) /
                 (CAST(n_names AS DOUBLE) * CAST(n_names - 1 AS DOUBLE)
                  / CAST(2 AS DOUBLE)), 6) AS reduction_ratio,
               ROUND(CAST(n_found AS DOUBLE) / CAST(n_true AS DOUBLE), 6)
                 AS pair_completeness,
               ROUND(CAST(n_found AS DOUBLE) / CAST(n_cand AS DOUBLE), 6)
                 AS pair_quality
        FROM counts""")),

    // Absorbing Markov chain solve: transition rates from consecutive
    // per-user events, then the EXACT fundamental-matrix answer
    // (I − Q)⁻¹R via the 3×3 Cramer chain — "starting from click /
    // signup / view, does the user end in purchase or error?". Rates on
    // the 12-grid, solution on the 9-grid, fixed-shape doubles.
    "qah_absorption" -> Q(
      fn = (s, dir) =>
        graft.operators.AbsorbingChain.absorption(
            Tables(s, dir, "events").withColumn("ts_ms", unix_millis(col("ts"))),
            "user_id", "ts_ms", "event_id", "event_type",
            transient = Seq("click", "signup", "view"),
            absorbing = Seq("purchase", "error"))
          .orderBy(col("state")),
      oracle = Some {
        val transient = Seq("click", "signup", "view")
        val states = transient ++ Seq("purchase", "error")
        val cells = (for {
          (fi, i) <- transient.zipWithIndex
          (tj, j) <- states.zipWithIndex
        } yield {
          val nm = if (j < 3) s"q${i + 1}${j + 1}" else s"r${i + 1}${j - 2}"
          s"COALESCE(MAX(CASE WHEN st = '$fi' AND nxt = '$tj' THEN p END), " +
            s"CAST(0 AS DOUBLE)) AS $nm"
        }).mkString(",\n                 ")
        def solveSql(rc: String, out: String): String = s"""
                 ROUND((${rc}1 * (m22 * m33 - m23 * m32)
                   - m12 * (${rc}2 * m33 - m23 * ${rc}3)
                   + m13 * (${rc}2 * m32 - m22 * ${rc}3)) / det, 9) AS ${out}1,
                 ROUND((m11 * (${rc}2 * m33 - m23 * ${rc}3)
                   - ${rc}1 * (m21 * m33 - m23 * m31)
                   + m13 * (m21 * ${rc}3 - ${rc}2 * m31)) / det, 9) AS ${out}2,
                 ROUND((m11 * (m22 * ${rc}3 - ${rc}2 * m32)
                   - m12 * (m21 * ${rc}3 - ${rc}2 * m31)
                   + ${rc}1 * (m21 * m32 - m22 * m31)) / det, 9) AS ${out}3"""
        s"""
        WITH e AS (
          SELECT event_type AS st,
                 lead(event_type) OVER (PARTITION BY user_id
                   ORDER BY epoch_ms(ts), event_id) AS nxt
          FROM events),
        tr AS (
          SELECT st, nxt FROM e
          WHERE nxt IS NOT NULL AND st IN ('click', 'signup', 'view')),
        tot AS (SELECT st, CAST(COUNT(*) AS BIGINT) AS ntot FROM tr GROUP BY 1),
        rates AS (
          SELECT c.st, c.nxt,
                 ROUND(CAST(c.n AS DOUBLE) / CAST(tot.ntot AS DOUBLE), 12) AS p
          FROM (SELECT st, nxt, CAST(COUNT(*) AS BIGINT) AS n
                FROM tr GROUP BY 1, 2) c
          JOIN tot ON tot.st = c.st),
        cells AS (
          SELECT $cells
          FROM rates),
        m AS (
          SELECT *,
                 CAST(1 AS DOUBLE) - q11 AS m11, CAST(0 AS DOUBLE) - q12 AS m12,
                 CAST(0 AS DOUBLE) - q13 AS m13, CAST(0 AS DOUBLE) - q21 AS m21,
                 CAST(1 AS DOUBLE) - q22 AS m22, CAST(0 AS DOUBLE) - q23 AS m23,
                 CAST(0 AS DOUBLE) - q31 AS m31, CAST(0 AS DOUBLE) - q32 AS m32,
                 CAST(1 AS DOUBLE) - q33 AS m33,
                 r11 AS ra1, r21 AS ra2, r31 AS ra3,
                 r12 AS rb1, r22 AS rb2, r32 AS rb3
          FROM cells),
        d AS (
          SELECT *,
                 m11 * (m22 * m33 - m23 * m32) - m12 * (m21 * m33 - m23 * m31)
                   + m13 * (m21 * m32 - m22 * m31) AS det
          FROM m),
        sv AS (
          SELECT *,${solveSql("ra", "pa")},${solveSql("rb", "pb")}
          FROM d)
        SELECT 'click' AS state, ROUND(pa1, 6) AS p_purchase,
               ROUND(pb1, 6) AS p_error FROM sv
        UNION ALL
        SELECT 'signup', ROUND(pa2, 6), ROUND(pb2, 6) FROM sv
        UNION ALL
        SELECT 'view', ROUND(pa3, 6), ROUND(pb3, 6) FROM sv
        ORDER BY state"""
      }),

    // Native session_window surface: Spark's built-in session windows
    // (batch mode, 10-minute gap) proven value-exact against the
    // hand-rolled gaps-and-islands construction — merge iff the gap is
    // STRICTLY under 10 min (window ends are exclusive), session end =
    // last event + gap.
    "qai_session_window" -> Q(
      fn = (s, dir) =>
        Tables(s, dir, "events")
          .select(col("user_id"), col("ts"),
            col("value").cast("decimal(18,2)").as("v"))
          .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
          .agg(count(lit(1)).as("n_events"), sum(col("v")).as("vsum"))
          .select(col("user_id"),
            unix_millis(col("session_window.start")).as("start_ms"),
            unix_millis(col("session_window.end")).as("end_ms"),
            col("n_events"), col("vsum").cast("double").as("value_sum"))
          .orderBy(col("user_id"), col("start_ms")),
      oracle = Some("""
        WITH e AS (
          SELECT user_id, epoch_ms(ts) AS ts_ms,
                 CAST(value AS DECIMAL(18,2)) AS v,
                 CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER w
                        >= 600000 THEN 1
                      WHEN lag(epoch_ms(ts)) OVER w IS NULL THEN 1
                      ELSE 0 END AS brk
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts))),
        s AS (
          SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_ms
                      ROWS UNBOUNDED PRECEDING) AS sid
          FROM e)
        SELECT user_id, MIN(ts_ms) AS start_ms,
               MAX(ts_ms) + 600000 AS end_ms,
               CAST(COUNT(*) AS BIGINT) AS n_events,
               CAST(SUM(v) AS DOUBLE) AS value_sum
        FROM s GROUP BY user_id, sid
        ORDER BY user_id, start_ms""")),

    // Jenks natural breaks: the exact optimal 4-segmentation of the
    // quantity distribution by DP over the bounded (value, weight)
    // profile — integer prefix sums, 9-grid segment SSEs, struct-argmin
    // per level, k unrolled so the oracle chains the same 4 CTE levels.
    "qaj_natural_breaks" -> Q(
      fn = (s, dir) =>
        graft.operators.Jenks.naturalBreaks(t(s, dir, "lineitem"),
          col("l_quantity"), k = 4),
      oracle = Some("""
        WITH prof AS (
          SELECT CAST(l_quantity AS BIGINT) AS v, CAST(COUNT(*) AS BIGINT) AS n
          FROM lineitem GROUP BY 1),
        pre AS (
          SELECT v, n, CAST(ROW_NUMBER() OVER (ORDER BY v) AS INT) AS i,
                 SUM(n) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cn,
                 SUM(n*v) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cs,
                 SUM(n*v*v) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS css
          FROM prof),
        lo AS (
          SELECT i - 1 AS j, cn - n AS cn_lo, cs - n*v AS cs_lo,
                 css - n*v*v AS css_lo
          FROM pre),
        hi AS (
          SELECT i AS ii, cn AS cn_hi, cs AS cs_hi, css AS css_hi FROM pre),
        segs AS MATERIALIZED (
          SELECT j, ii,
                 ROUND(CAST(css_hi - css_lo AS DOUBLE)
                   - CAST(cs_hi - cs_lo AS DOUBLE)
                     * CAST(cs_hi - cs_lo AS DOUBLE)
                     / CAST(cn_hi - cn_lo AS DOUBLE), 9) AS sse
          FROM lo JOIN hi ON ii >= j + 1),
        d1 AS MATERIALIZED (
          SELECT ii AS i, sse AS cost, 0 AS argj FROM segs WHERE j = 0),
        d2 AS MATERIALIZED (
          SELECT i, w['tot'] AS cost, w['j'] AS argj FROM (
            SELECT s.ii AS i,
                   MIN({'tot': ROUND(p.cost + s.sse, 9), 'j': s.j}) AS w
            FROM d1 p JOIN segs s ON s.j = p.i GROUP BY 1)),
        d3 AS MATERIALIZED (
          SELECT i, w['tot'] AS cost, w['j'] AS argj FROM (
            SELECT s.ii AS i,
                   MIN({'tot': ROUND(p.cost + s.sse, 9), 'j': s.j}) AS w
            FROM d2 p JOIN segs s ON s.j = p.i GROUP BY 1)),
        d4 AS MATERIALIZED (
          SELECT i, w['tot'] AS cost, w['j'] AS argj FROM (
            SELECT s.ii AS i,
                   MIN({'tot': ROUND(p.cost + s.sse, 9), 'j': s.j}) AS w
            FROM d3 p JOIN segs s ON s.j = p.i GROUP BY 1)),
        c4 AS (
          SELECT i AS ck4, argj AS ck3 FROM d4
          WHERE i = (SELECT MAX(i) FROM pre)),
        c2 AS (
          SELECT c4.ck4, c4.ck3, d3.argj AS ck2, d2.argj AS ck1
          FROM c4 JOIN d3 ON d3.i = c4.ck3
          JOIN d2 ON d2.i = d3.argj),
        ranges AS (
          SELECT 1 AS segment, 0 AS jlo, ck1 AS jhi FROM c2
          UNION ALL SELECT 2, ck1, ck2 FROM c2
          UNION ALL SELECT 3, ck2, ck3 FROM c2
          UNION ALL SELECT 4, ck3, ck4 FROM c2),
        loJ AS (
          SELECT i AS jlo, cn AS cn_lo, cs AS cs_lo, css AS css_lo FROM pre
          UNION ALL
          SELECT 0, CAST(0 AS HUGEINT), CAST(0 AS HUGEINT),
                 CAST(0 AS HUGEINT)),
        hiJ AS (
          SELECT i AS jhi, v AS hi_v, cn AS cn_hi, cs AS cs_hi,
                 css AS css_hi
          FROM pre),
        loV AS (SELECT i - 1 AS jlo2, v AS lo_v FROM pre)
        SELECT r.segment, loV.lo_v, hiJ.hi_v,
               CAST(cn_hi - cn_lo AS BIGINT) AS n,
               ROUND(CAST(cs_hi - cs_lo AS DOUBLE)
                 / CAST(cn_hi - cn_lo AS DOUBLE), 6) AS mean,
               ROUND(ROUND(CAST(css_hi - css_lo AS DOUBLE)
                 - CAST(cs_hi - cs_lo AS DOUBLE)
                   * CAST(cs_hi - cs_lo AS DOUBLE)
                   / CAST(cn_hi - cn_lo AS DOUBLE), 9), 6) AS sse
        FROM ranges r
        JOIN loJ ON loJ.jlo = r.jlo
        JOIN hiJ ON hiJ.jhi = r.jhi
        JOIN loV ON loV.jlo2 = r.jlo
        ORDER BY r.segment""")),

    // Silhouette acceptance report for the q4y k-means clustering:
    // assignments from the full corpus, the O(n²) silhouette on the
    // bounded audit panel (vec_id < 500) — cosine distances on the
    // 6-grid, per-point sums through DECIMAL, singletons 0 by
    // convention. The clustering-quality number SemDeDup/k-means
    // deployments gate on.
    "qam_silhouette" -> Q(
      fn = (s, dir) => {
        val e = t(s, dir, "embeddings")
        val idx0 = graft.operators.IvfIndex.centroidsByDraw(
          e, "vec_id", "embedding", nCells = 8)
        val idx = graft.operators.IvfIndex.refineExact(
          e, "embedding", idx0, iters = 2)
        val best = graft.operators.IvfIndex.assignCellScore(
          col("embedding"), idx)
        val assigned = e.select(col("vec_id"), col("embedding"),
          best.getField("cell").as("cell"))
        graft.operators.Silhouette.cosineSilhouette(
            assigned.filter(col("vec_id") < 500),
            "vec_id", "embedding", "cell")
          .orderBy(col("cell"))
      },
      oracle = Some(s"""
        ${VectorQueries.kmeansCtes(nCells = 8, iters = 2)},
        fin AS MATERIALIZED (
          SELECT vec_id, cell, v FROM (
            SELECT e.vec_id, c.cell, e.v,
                   ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
                     ROUND(CAST(list_cosine_similarity(e.v, c.cv) AS DOUBLE),
                       6) DESC, c.cell) AS rn
            FROM e CROSS JOIN cent2 c) WHERE rn = 1),
        pan AS MATERIALIZED (
          SELECT vec_id AS ai, cell AS ac, v FROM fin WHERE vec_id < 500),
        pr AS MATERIALIZED (
          SELECT a.ai, a.ac, b.ac AS bc,
                 CAST(1 AS DOUBLE) -
                   ROUND(CAST(list_cosine_similarity(a.v, b.v) AS DOUBLE), 6)
                   AS d
          FROM pan a JOIN pan b ON a.ai <> b.ai),
        sz AS (SELECT ac, CAST(COUNT(*) AS BIGINT) AS n_c FROM pan GROUP BY 1),
        own AS (
          SELECT ai, ac,
                 ROUND(CAST(SUM(CAST(d AS DECIMAL(28,12))) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE), 9) AS a_mean
          FROM pr WHERE ac = bc GROUP BY 1, 2),
        oth AS (
          SELECT ai, ac, MIN(o_mean) AS b_mean FROM (
            SELECT ai, ac, bc,
                   ROUND(CAST(SUM(CAST(d AS DECIMAL(28,12))) AS DOUBLE)
                     / CAST(COUNT(*) AS DOUBLE), 9) AS o_mean
            FROM pr WHERE ac <> bc GROUP BY 1, 2, 3)
          GROUP BY 1, 2),
        sc AS (
          SELECT p.ai, p.ac,
                 CASE WHEN sz.n_c = 1 THEN CAST(0 AS DOUBLE)
                      WHEN GREATEST(own.a_mean, oth.b_mean) > 0
                      THEN ROUND((oth.b_mean - own.a_mean)
                        / GREATEST(own.a_mean, oth.b_mean), 6)
                      ELSE CAST(0 AS DOUBLE) END AS s
          FROM pan p
          JOIN sz ON sz.ac = p.ac
          LEFT JOIN own ON own.ai = p.ai AND own.ac = p.ac
          LEFT JOIN oth ON oth.ai = p.ai AND oth.ac = p.ac)
        SELECT ac AS cell, CAST(COUNT(*) AS BIGINT) AS n,
               ROUND(CAST(SUM(CAST(s AS DECIMAL(28,12))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS mean_silhouette
        FROM sc GROUP BY 1 ORDER BY 1""")),

    // MATCH_RECOGNIZE-style sequence patterns, which Spark SQL lacks as
    // a native operator: encode each user's ordered event history as an
    // initials string (one map-side collect per user, bounded by the
    // per-user history), then count non-overlapping
    // view→click→purchase-with-no-error-between journeys as a plain
    // regex over that string — leftmost-first greedy semantics agree
    // between Java and RE2 on this custom alphabet (no \\s, no Unicode
    // classes, per the CLAUDE.md regex-parity rules).
    "qan_event_patterns" -> Q(
      fn = (s, dir) => {
        val seqs = Tables(s, dir, "events")
          .withColumn("ts_ms", unix_millis(col("ts")))
          .select(col("user_id"), col("ts_ms"), col("event_id"),
            substring(col("event_type"), 1, 1).as("c"))
          .groupBy(col("user_id"))
          .agg(concat_ws("", transform(
            sort_array(collect_list(struct(col("ts_ms"), col("event_id"),
              col("c")))), x => x.getField("c"))).as("seq"))
        seqs.select(col("user_id"), length(col("seq")).as("seq_len"),
            regexp_count(col("seq"), lit("v[^e]*c[^e]*p")).as("n_journeys"),
            regexp_count(col("seq"), lit("e+")).as("n_error_runs"))
          .filter(col("n_journeys") >= 1)
          .orderBy(col("user_id"))
      },
      oracle = Some("""
        WITH s AS (
          SELECT user_id,
                 string_agg(substr(event_type, 1, 1), ''
                   ORDER BY epoch_ms(ts), event_id) AS seq
          FROM events GROUP BY 1),
        m AS (
          SELECT user_id, CAST(len(seq) AS INT) AS seq_len,
                 CAST(len(regexp_extract_all(seq, 'v[^e]*c[^e]*p')) AS INT)
                   AS n_journeys,
                 CAST(len(regexp_extract_all(seq, 'e+')) AS INT)
                   AS n_error_runs
          FROM s)
        SELECT user_id, seq_len, n_journeys, n_error_runs
        FROM m WHERE n_journeys >= 1 ORDER BY user_id""")),

    // Good–Turing / Chao1 unseen-mass diagnostics over word trigrams:
    // counts-of-counts from one grouped profile, the unseen-probability
    // mass n1/N, sample coverage, the Chao1 richness estimate
    // V + n1²/(2·n2) and the Good–Turing adjusted hapax count 2·n2/n1 —
    // the "how much tail have we not seen yet" number a dedup/LM
    // pipeline budgets by. Trigram hapaxes are non-vacuous at every SF
    // (probed: n1 = 9402/9424/207).
    "qao_unseen_mass" -> Q(
      fn = (s, dir) => {
        val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
        val toks = t(s, dir, "documents")
          .select(col("doc_id"),
            posexplode(split(col("text"), " ")).as(Seq("pos", "tok")))
          .filter(col("tok") =!= "")
        val tri = toks
          .withColumn("t2", lead(col("tok"), 1).over(w))
          .withColumn("t3", lead(col("tok"), 2).over(w))
          .filter(col("t2").isNotNull && col("t3").isNotNull)
          .select(concat_ws(" ", col("tok"), col("t2"), col("t3")).as("g"))
          .groupBy(col("g")).agg(count(lit(1)).as("n"))
        tri.agg(count(lit(1)).as("v"), sum(col("n")).as("ntot"),
            sum(when(col("n") === 1, 1L).otherwise(0L)).as("n1"),
            sum(when(col("n") === 2, 1L).otherwise(0L)).as("n2"))
          .select(col("v"), col("ntot"), col("n1"), col("n2"),
            round(col("n1").cast("double") / col("ntot").cast("double"), 6)
              .as("p0_unseen"),
            round(lit(1.0) - col("n1").cast("double") /
              col("ntot").cast("double"), 6).as("coverage"),
            when(col("n2") > 0, round(col("v").cast("double") +
              col("n1").cast("double") * col("n1").cast("double") /
                (lit(2.0) * col("n2").cast("double")), 6)).as("chao1"),
            when(col("n1") > 0, round(lit(2.0) * col("n2").cast("double") /
              col("n1").cast("double"), 6)).as("gt_hapax_adjusted"))
      },
      oracle = Some("""
        WITH t AS (
          SELECT doc_id, unnest(string_split(text, ' ')) AS tok,
                 generate_subscripts(string_split(text, ' '), 1) AS pos
          FROM documents),
        tt AS (SELECT * FROM t WHERE tok <> ''),
        l AS (
          SELECT tok AS t1,
                 LEAD(tok, 1) OVER (PARTITION BY doc_id ORDER BY pos) AS t2,
                 LEAD(tok, 2) OVER (PARTITION BY doc_id ORDER BY pos) AS t3
          FROM tt),
        c AS (
          SELECT t1 || ' ' || t2 || ' ' || t3 AS g,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM l WHERE t2 IS NOT NULL AND t3 IS NOT NULL GROUP BY 1),
        a AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS v, CAST(SUM(n) AS BIGINT) AS ntot,
                 CAST(SUM(CASE WHEN n = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                 CAST(SUM(CASE WHEN n = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2
          FROM c)
        SELECT v, ntot, n1, n2,
               ROUND(CAST(n1 AS DOUBLE) / CAST(ntot AS DOUBLE), 6)
                 AS p0_unseen,
               ROUND(CAST(1 AS DOUBLE) - CAST(n1 AS DOUBLE)
                 / CAST(ntot AS DOUBLE), 6) AS coverage,
               CASE WHEN n2 > 0 THEN ROUND(CAST(v AS DOUBLE)
                 + CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE)
                   / (CAST(2 AS DOUBLE) * CAST(n2 AS DOUBLE)), 6) END
                 AS chao1,
               CASE WHEN n1 > 0 THEN ROUND(CAST(2 AS DOUBLE)
                 * CAST(n2 AS DOUBLE) / CAST(n1 AS DOUBLE), 6) END
                 AS gt_hapax_adjusted
        FROM a""")),

    // Murphy's Brier-score decomposition (reliability − resolution +
    // uncertainty) over the discount-as-forecast profile: one bounded
    // forecast-bin table, every term an exact count ratio, and the
    // decomposition identity emitted as its own column — the calibration
    // audit that says WHY a forecast's Brier score is what it is.
    "qap_brier" -> Q(
      fn = (s, dir) => {
        val base = t(s, dir, "lineitem").select(
          round(col("l_discount") * 10, 6).as("p"),
          (col("l_returnflag") === "R").cast("long").as("y"))
        val bins = base.groupBy(col("p"))
          .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
        val tot = bins.agg(sum(col("n")).as("nt"), sum(col("pos")).as("post"))
          .select(col("nt"), col("post"),
            round(col("post").cast("double") / col("nt").cast("double"), 12)
              .as("ybar"))
        val terms = bins.crossJoin(broadcast(tot))
          .withColumn("yb",
            round(col("pos").cast("double") / col("n").cast("double"), 12))
          .withColumn("rel_t",
            (col("n").cast("double") * (col("p") - col("yb")) *
              (col("p") - col("yb"))).cast("decimal(28,12)"))
          .withColumn("res_t",
            (col("n").cast("double") * (col("yb") - col("ybar")) *
              (col("yb") - col("ybar"))).cast("decimal(28,12)"))
          .withColumn("brier_t",
            (col("pos").cast("double") * (lit(1.0) - col("p")) *
              (lit(1.0) - col("p")) +
              (col("n") - col("pos")).cast("double") * col("p") * col("p"))
              .cast("decimal(28,12)"))
        terms.groupBy(col("nt"), col("ybar"))
          .agg(sum(col("rel_t")).as("rel_s"), sum(col("res_t")).as("res_s"),
            sum(col("brier_t")).as("brier_s"))
          .select(col("nt").as("n"),
            round(col("brier_s").cast("double") / col("nt").cast("double"), 6)
              .as("brier"),
            round(col("rel_s").cast("double") / col("nt").cast("double"), 6)
              .as("reliability"),
            round(col("res_s").cast("double") / col("nt").cast("double"), 6)
              .as("resolution"),
            round(col("ybar") * (lit(1.0) - col("ybar")), 6).as("uncertainty"),
            round((col("brier_s").cast("double") / col("nt").cast("double")) -
              ((col("rel_s").cast("double") / col("nt").cast("double")) -
                (col("res_s").cast("double") / col("nt").cast("double")) +
                col("ybar") * (lit(1.0) - col("ybar"))), 6)
              .as("identity_residual"))
      },
      oracle = Some("""
        WITH base AS (
          SELECT ROUND(CAST(l_discount AS DOUBLE) * 10, 6) AS p,
                 CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
          FROM lineitem),
        bins AS (
          SELECT p, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(y) AS BIGINT) AS pos
          FROM base GROUP BY 1),
        tot AS (
          SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(pos) AS BIGINT) AS post,
                 ROUND(CAST(SUM(pos) AS DOUBLE) / CAST(SUM(n) AS DOUBLE), 12)
                   AS ybar
          FROM bins),
        terms AS (
          SELECT b.*, t.nt, t.ybar,
                 ROUND(CAST(b.pos AS DOUBLE) / CAST(b.n AS DOUBLE), 12) AS yb
          FROM bins b CROSS JOIN tot t),
        s AS (
          SELECT nt, ybar,
                 SUM(CAST(CAST(n AS DOUBLE) * (p - yb) * (p - yb)
                   AS DECIMAL(28,12))) AS rel_s,
                 SUM(CAST(CAST(n AS DOUBLE) * (yb - ybar) * (yb - ybar)
                   AS DECIMAL(28,12))) AS res_s,
                 SUM(CAST(CAST(pos AS DOUBLE) * (CAST(1 AS DOUBLE) - p)
                     * (CAST(1 AS DOUBLE) - p)
                   + CAST(n - pos AS DOUBLE) * p * p
                   AS DECIMAL(28,12))) AS brier_s
          FROM terms GROUP BY 1, 2)
        SELECT nt AS n,
               ROUND(CAST(brier_s AS DOUBLE) / CAST(nt AS DOUBLE), 6) AS brier,
               ROUND(CAST(rel_s AS DOUBLE) / CAST(nt AS DOUBLE), 6)
                 AS reliability,
               ROUND(CAST(res_s AS DOUBLE) / CAST(nt AS DOUBLE), 6)
                 AS resolution,
               ROUND(ybar * (CAST(1 AS DOUBLE) - ybar), 6) AS uncertainty,
               ROUND((CAST(brier_s AS DOUBLE) / CAST(nt AS DOUBLE))
                 - ((CAST(rel_s AS DOUBLE) / CAST(nt AS DOUBLE))
                    - (CAST(res_s AS DOUBLE) / CAST(nt AS DOUBLE))
                    + ybar * (CAST(1 AS DOUBLE) - ybar)), 6)
                 + CAST(0 AS DOUBLE) AS identity_residual
        FROM s""")),

    // Cochran–Mantel–Haenszel stratified association: does a deep
    // discount associate with returns CONSISTENTLY across nation strata?
    // One bounded 2×2-per-stratum table, the CMH statistic
    // (Σ(a−E))²/ΣV and the MH common odds ratio — exact count arithmetic
    // with DECIMAL cross-stratum sums.
    "qaq_cmh" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .select(col("c_nationkey").as("stratum"),
            (col("l_discount") >= 0.05).cast("long").as("x"),
            (col("l_returnflag") === "R").cast("long").as("y"))
        val cells = li.groupBy(col("stratum"))
          .agg(sum(col("x") * col("y")).as("a"),
            sum(col("x") * (lit(1L) - col("y"))).as("b"),
            sum((lit(1L) - col("x")) * col("y")).as("c"),
            sum((lit(1L) - col("x")) * (lit(1L) - col("y"))).as("d"))
          .withColumn("n", col("a") + col("b") + col("c") + col("d"))
          .withColumn("e_a",
            round((col("a") + col("b")).cast("double") *
              (col("a") + col("c")).cast("double") /
              col("n").cast("double"), 12))
          .withColumn("v_a",
            round((col("a") + col("b")).cast("double") *
              (col("c") + col("d")).cast("double") *
              (col("a") + col("c")).cast("double") *
              (col("b") + col("d")).cast("double") /
              (col("n").cast("double") * col("n").cast("double") *
                (col("n") - 1).cast("double")), 12))
          .withColumn("rr_t",
            round(col("a").cast("double") * col("d").cast("double") /
              col("n").cast("double"), 12).cast("decimal(28,12)"))
          .withColumn("ss_t",
            round(col("b").cast("double") * col("c").cast("double") /
              col("n").cast("double"), 12).cast("decimal(28,12)"))
        cells.agg(
            count(lit(1)).as("n_strata"),
            sum(col("a")).as("sum_a"),
            sum(col("e_a").cast("decimal(28,12)")).as("sum_e"),
            sum(col("v_a").cast("decimal(28,12)")).as("sum_v"),
            sum(col("rr_t")).as("sum_rr"), sum(col("ss_t")).as("sum_ss"))
          .select(col("n_strata"), col("sum_a"),
            round(col("sum_e").cast("double"), 6).as("sum_expected"),
            round((col("sum_a").cast("double") - col("sum_e").cast("double")) *
              (col("sum_a").cast("double") - col("sum_e").cast("double")) /
              col("sum_v").cast("double"), 6).as("cmh_statistic"),
            round(col("sum_rr").cast("double") /
              col("sum_ss").cast("double"), 6).as("mh_odds_ratio"))
      },
      oracle = Some("""
        WITH li AS (
          SELECT c_nationkey AS stratum,
                 CASE WHEN CAST(l_discount AS DOUBLE)
                   >= CAST(0.05 AS DOUBLE) THEN 1 ELSE 0 END AS x,
                 CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END AS y
          FROM lineitem
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey),
        cells AS (
          SELECT stratum,
                 CAST(SUM(x * y) AS BIGINT) AS a,
                 CAST(SUM(x * (1 - y)) AS BIGINT) AS b,
                 CAST(SUM((1 - x) * y) AS BIGINT) AS c,
                 CAST(SUM((1 - x) * (1 - y)) AS BIGINT) AS d
          FROM li GROUP BY 1),
        k AS (
          SELECT *, a + b + c + d AS n,
                 ROUND(CAST(a + b AS DOUBLE) * CAST(a + c AS DOUBLE)
                   / CAST(a + b + c + d AS DOUBLE), 12) AS e_a,
                 ROUND(CAST(a + b AS DOUBLE) * CAST(c + d AS DOUBLE)
                   * CAST(a + c AS DOUBLE) * CAST(b + d AS DOUBLE)
                   / (CAST(a + b + c + d AS DOUBLE)
                      * CAST(a + b + c + d AS DOUBLE)
                      * CAST(a + b + c + d - 1 AS DOUBLE)), 12) AS v_a,
                 CAST(ROUND(CAST(a AS DOUBLE) * CAST(d AS DOUBLE)
                   / CAST(a + b + c + d AS DOUBLE), 12) AS DECIMAL(28,12))
                   AS rr_t,
                 CAST(ROUND(CAST(b AS DOUBLE) * CAST(c AS DOUBLE)
                   / CAST(a + b + c + d AS DOUBLE), 12) AS DECIMAL(28,12))
                   AS ss_t
          FROM cells),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
                 CAST(SUM(a) AS BIGINT) AS sum_a,
                 SUM(CAST(e_a AS DECIMAL(28,12))) AS sum_e,
                 SUM(CAST(v_a AS DECIMAL(28,12))) AS sum_v,
                 SUM(rr_t) AS sum_rr, SUM(ss_t) AS sum_ss
          FROM k)
        SELECT n_strata, sum_a,
               ROUND(CAST(sum_e AS DOUBLE), 6) AS sum_expected,
               ROUND((CAST(sum_a AS DOUBLE) - CAST(sum_e AS DOUBLE))
                 * (CAST(sum_a AS DOUBLE) - CAST(sum_e AS DOUBLE))
                 / CAST(sum_v AS DOUBLE), 6) AS cmh_statistic,
               ROUND(CAST(sum_rr AS DOUBLE) / CAST(sum_ss AS DOUBLE), 6)
                 AS mh_odds_ratio
        FROM agg""")),

    // Little's law from the raw event log: sessions (the qai 10-min
    // session windows) as jobs, concurrency by an interval-sweep
    // integral over ±1 boundary points — the global cumsum rides
    // ScaleOps.globalRunningSum and the "next point" is a row-number
    // shift EQUI join, so there is no single-partition window anywhere.
    // The sweep integral equals Σ durations EXACTLY (both BIGINTs are
    // emitted — the hash proves the interval machinery), and therefore
    // L = λ·W holds by construction; λ, W, L are the operational
    // throughput/latency/occupancy numbers.
    "qar_littles_law" -> Q(
      fn = (s, dir) => {
        val sess = Tables(s, dir, "events")
          .select(col("user_id"), col("ts"))
          .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
          .agg(count(lit(1)).as("n_ev"))
          .select(col("user_id"),
            unix_millis(col("session_window.start")).as("st"),
            unix_millis(col("session_window.end")).as("en"))
        val pts = sess.select(col("st").as("t"), lit(1L).as("delta"),
            col("user_id"))
          .unionByName(sess.select(col("en").as("t"), lit(-1L).as("delta"),
            col("user_id")))
        val ranked = graft.operators.ScaleOps.globalRowNumber(pts,
          Seq(col("t"), col("delta"), col("user_id")), "rn")
        val cum = graft.operators.ScaleOps.globalRunningSum(ranked,
          Seq(col("t"), col("delta"), col("user_id")), col("delta"), "c")
        val seg = cum
          .join(ranked.select((col("rn") - 1).as("rn"), col("t").as("t_next")),
            Seq("rn"))
          .select((col("c") * (col("t_next") - col("t"))).as("area"))
        val sweep = seg.agg(sum(col("area")).as("active_ms"))
        val stats = sess.agg(count(lit(1)).as("n_sessions"),
          min(col("st")).as("t0"), max(col("en")).as("t1"),
          sum(col("en") - col("st")).as("dur_ms"))
        stats.crossJoin(sweep)
          .select(col("n_sessions"), (col("t1") - col("t0")).as("span_ms"),
            col("active_ms"), col("dur_ms"),
            round(col("n_sessions").cast("double") * lit(3600000.0) /
              (col("t1") - col("t0")).cast("double"), 6)
              .as("lambda_per_hour"),
            round(col("dur_ms").cast("double") /
              col("n_sessions").cast("double"), 6).as("w_mean_ms"),
            round(col("active_ms").cast("double") /
              (col("t1") - col("t0")).cast("double"), 6).as("l_avg"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT user_id, epoch_ms(ts) AS ts_ms,
                 CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER w
                        >= 600000 THEN 1
                      WHEN lag(epoch_ms(ts)) OVER w IS NULL THEN 1
                      ELSE 0 END AS brk
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts))),
        s0 AS (
          SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_ms
                      ROWS UNBOUNDED PRECEDING) AS sid
          FROM e),
        sess AS (
          SELECT user_id, MIN(ts_ms) AS st, MAX(ts_ms) + 600000 AS en
          FROM s0 GROUP BY user_id, sid),
        pts AS (
          SELECT st AS t, CAST(1 AS BIGINT) AS delta, user_id FROM sess
          UNION ALL
          SELECT en, CAST(-1 AS BIGINT), user_id FROM sess),
        r AS (
          SELECT *, ROW_NUMBER() OVER (ORDER BY t, delta, user_id) AS rn,
                 SUM(delta) OVER (ORDER BY t, delta, user_id
                   ROWS UNBOUNDED PRECEDING) AS c
          FROM pts),
        seg AS (
          SELECT a.c * (b.t - a.t) AS area
          FROM r a JOIN r b ON b.rn = a.rn + 1),
        sweep AS (SELECT CAST(SUM(area) AS BIGINT) AS active_ms FROM seg),
        stats AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_sessions,
                 MIN(st) AS t0, MAX(en) AS t1,
                 CAST(SUM(en - st) AS BIGINT) AS dur_ms
          FROM sess)
        SELECT n_sessions, t1 - t0 AS span_ms, active_ms, dur_ms,
               ROUND(CAST(n_sessions AS DOUBLE) * CAST(3600000 AS DOUBLE)
                 / CAST(t1 - t0 AS DOUBLE), 6) AS lambda_per_hour,
               ROUND(CAST(dur_ms AS DOUBLE) / CAST(n_sessions AS DOUBLE), 6)
                 AS w_mean_ms,
               ROUND(CAST(active_ms AS DOUBLE) / CAST(t1 - t0 AS DOUBLE), 6)
                 AS l_avg
        FROM stats CROSS JOIN sweep""")),

    // Market concentration per supplier nation: Herfindahl–Hirschman
    // index over supplier revenue shares, the effective number of
    // suppliers 1/HHI, and the CR4 top-4 concentration ratio — shares on
    // the 12-grid, HHI/CR4 through DECIMAL, the top-4 rank lowering to
    // WindowGroupLimit (bounded per-group map-side state).
    "qas_concentration" -> Q(
      fn = (s, dir) => {
        val rev = t(s, dir, "lineitem")
          .join(t(s, dir, "supplier"), col("l_suppkey") === col("s_suppkey"))
          .groupBy(col("s_nationkey").as("nation"), col("s_suppkey"))
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("rev"))
        val tot = rev.groupBy(col("nation"))
          .agg(sum(col("rev")).as("tot"), count(lit(1)).as("n_suppliers"))
        val shares = rev.join(tot, Seq("nation"))
          .withColumn("share",
            round(col("rev").cast("double") / col("tot").cast("double"), 12))
        val hhi = shares
          .withColumn("sq", (col("share") * col("share")).cast("decimal(28,12)"))
          .groupBy(col("nation"))
          .agg(sum(col("sq")).as("hhi_d"))
        val w = Window.partitionBy(col("nation"))
          .orderBy(col("rev").desc, col("s_suppkey"))
        val cr4 = shares.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 4)
          .groupBy(col("nation"))
          .agg(sum(col("share").cast("decimal(28,12)")).as("cr4_d"))
        tot.join(hhi, Seq("nation")).join(cr4, Seq("nation"))
          .select(col("nation"), col("n_suppliers"),
            round(col("hhi_d").cast("double"), 6).as("hhi"),
            round(lit(1.0) / col("hhi_d").cast("double"), 6).as("eff_n"),
            round(col("cr4_d").cast("double"), 6).as("cr4"))
          .orderBy(col("nation"))
      },
      oracle = Some("""
        WITH rev AS (
          SELECT s_nationkey AS nation, s_suppkey,
                 SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
          FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
          GROUP BY 1, 2),
        tot AS (
          SELECT nation, SUM(rev) AS tot, CAST(COUNT(*) AS BIGINT)
                   AS n_suppliers
          FROM rev GROUP BY 1),
        sh AS (
          SELECT r.nation, r.s_suppkey, r.rev,
                 ROUND(CAST(r.rev AS DOUBLE) / CAST(t.tot AS DOUBLE), 12)
                   AS share
          FROM rev r JOIN tot t ON t.nation = r.nation),
        hhi AS (
          SELECT nation, SUM(CAST(share * share AS DECIMAL(28,12))) AS hhi_d
          FROM sh GROUP BY 1),
        cr4 AS (
          SELECT nation, SUM(CAST(share AS DECIMAL(28,12))) AS cr4_d FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY nation
              ORDER BY rev DESC, s_suppkey) AS rn FROM sh)
          WHERE rn <= 4 GROUP BY 1)
        SELECT t.nation, t.n_suppliers,
               ROUND(CAST(h.hhi_d AS DOUBLE), 6) AS hhi,
               ROUND(CAST(1 AS DOUBLE) / CAST(h.hhi_d AS DOUBLE), 6) AS eff_n,
               ROUND(CAST(c.cr4_d AS DOUBLE), 6) AS cr4
        FROM tot t JOIN hhi h ON h.nation = t.nation
        JOIN cr4 c ON c.nation = t.nation
        ORDER BY t.nation""")),

    // ABC–XYZ inventory matrix over brand×type demand keys: revenue
    // Pareto class (the q7w abcClassify machinery — distributed
    // cumulative share, no global window) × demand-variability TERTILES
    // of the weekly-demand coefficient of variation over the DENSE
    // key × week grid (zero weeks count). Tertiles via the distributed
    // global NTILE keep the XYZ axis populated at EVERY scale — fixed
    // 0.5/1.0 cv cuts degenerate to one class as volume shifts (probed:
    // all-Z at sf0.001, all-X at sf0.1). CV on the 9-grid with a
    // GREATEST(var, 0) cancellation guard.
    "qat_abc_xyz" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem")
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .select(concat(col("p_brand"), lit("/"), col("p_type")).as("k"),
            expr("unix_millis(CAST(l_shipdate AS TIMESTAMP)) div 604800000")
              .as("week"),
            col("l_quantity").cast("long").as("q"),
            col("l_extendedprice").cast("decimal(18,2)").as("rev"))
        val wk = li.groupBy(col("k"), col("week")).agg(sum(col("q")).as("qty"))
        val weeks = li.select(col("week")).distinct()
        val keys = li.groupBy(col("k")).agg(sum(col("rev")).as("rev"))
        val grid = keys.select(col("k")).crossJoin(broadcast(weeks))
          .join(wk, Seq("k", "week"), "left")
          .withColumn("q0", coalesce(col("qty"), lit(0L)))
        val mean = col("cs").cast("double") / col("n").cast("double")
        val variance = col("css").cast("double") / col("n").cast("double") -
          (col("cs").cast("double") / col("n").cast("double")) *
          (col("cs").cast("double") / col("n").cast("double"))
        val cv = grid.groupBy(col("k"))
          .agg(count(lit(1)).as("n"), sum(col("q0")).as("cs"),
            sum(col("q0") * col("q0")).as("css"))
          .withColumn("cv",
            round(sqrt(greatest(variance, lit(0.0))) / mean, 9))
        val xyz = graft.operators.ScaleOps.globalNtile(
            cv.select(col("k"), col("cv")), Seq(col("cv"), col("k")), 3,
            "tert")
          .withColumn("xyz_class",
            when(col("tert") === 1, "X").when(col("tert") === 2, "Y")
              .otherwise("Z"))
          .select(col("k"), col("xyz_class"))
        val abc = graft.operators.Segment.abcClassify(keys,
          Seq("k"), col("rev"))
        abc.join(xyz, Seq("k"))
          .groupBy(col("abc_class"), col("xyz_class"))
          .agg(count(lit(1)).as("n_keys"),
            round(sum(col("rev")).cast("double"), 2).as("revenue"))
          .orderBy(col("abc_class"), col("xyz_class"))
      },
      oracle = Some("""
        WITH li AS (
          SELECT p_brand || '/' || p_type AS k,
                 CAST(epoch_ms(l_shipdate) // 604800000 AS BIGINT) AS week,
                 CAST(l_quantity AS BIGINT) AS q,
                 CAST(l_extendedprice AS DECIMAL(18,2)) AS rev
          FROM lineitem JOIN part ON l_partkey = p_partkey),
        wk AS (
          SELECT k, week, CAST(SUM(q) AS BIGINT) AS qty
          FROM li GROUP BY 1, 2),
        weeks AS (SELECT DISTINCT week FROM li),
        keys AS (SELECT k, SUM(rev) AS rev FROM li GROUP BY 1),
        grid AS (
          SELECT ks.k, w.week, COALESCE(wk.qty, CAST(0 AS BIGINT)) AS q0
          FROM (SELECT k FROM keys) ks CROSS JOIN weeks w
          LEFT JOIN wk ON wk.k = ks.k AND wk.week = w.week),
        cvw AS (
          SELECT k, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(q0) AS BIGINT) AS cs,
                 CAST(SUM(q0 * q0) AS BIGINT) AS css
          FROM grid GROUP BY 1),
        cvc AS (
          SELECT k,
                 ROUND(SQRT(GREATEST(
                     CAST(css AS DOUBLE) / CAST(n AS DOUBLE)
                       - (CAST(cs AS DOUBLE) / CAST(n AS DOUBLE))
                         * (CAST(cs AS DOUBLE) / CAST(n AS DOUBLE)),
                     CAST(0 AS DOUBLE)))
                   / (CAST(cs AS DOUBLE) / CAST(n AS DOUBLE)), 9) AS cv
          FROM cvw),
        xyz AS (
          SELECT k, CASE WHEN tert = 1 THEN 'X' WHEN tert = 2 THEN 'Y'
                 ELSE 'Z' END AS xyz_class
          FROM (SELECT k, CAST(NTILE(3) OVER (ORDER BY cv, k) AS INT)
                  AS tert FROM cvc)),
        tot AS (SELECT SUM(rev) AS t FROM keys),
        abc AS (
          SELECT k, rev,
                 CASE WHEN share <= CAST(0.8 AS DOUBLE) THEN 'A'
                      WHEN share <= CAST(0.95 AS DOUBLE) THEN 'B'
                      ELSE 'C' END AS abc_class
          FROM (
            SELECT p.k, p.rev,
                   ROUND(CAST(SUM(p.rev) OVER (ORDER BY p.rev DESC,
                       p.k ROWS UNBOUNDED PRECEDING) AS DOUBLE)
                     / CAST(t.t AS DOUBLE), 6) AS share
            FROM keys p CROSS JOIN tot t))
        SELECT abc.abc_class, xyz.xyz_class,
               CAST(COUNT(*) AS BIGINT) AS n_keys,
               ROUND(CAST(SUM(abc.rev) AS DOUBLE), 2) AS revenue
        FROM abc JOIN xyz ON xyz.k = abc.k
        GROUP BY 1, 2 ORDER BY 1, 2""")),

    // Erlang-C staffing from the measured event log: offered load
    // a = Σ session time / span (the qar occupancy, snapped to the
    // 9-grid), then the wait probability and average speed of answer for
    // candidate agent counts s = 3..7. The Erlang-C series is pure
    // powers/factorials/divisions — NO exp/pow anywhere (powers are
    // chained multiplications, libm pow parity is unproven), so the
    // whole staffing table replays hash-exact.
    "qau_erlang_staffing" -> Q(
      fn = (s, dir) => {
        val sess = Tables(s, dir, "events")
          .select(col("user_id"), col("ts"))
          .groupBy(col("user_id"), session_window(col("ts"), "10 minutes"))
          .agg(count(lit(1)).as("n_ev"))
          .select(unix_millis(col("session_window.start")).as("st"),
            unix_millis(col("session_window.end")).as("en"))
        val base = sess.agg(count(lit(1)).as("n"), min(col("st")).as("t0"),
            max(col("en")).as("t1"), sum(col("en") - col("st")).as("dur"))
          .select(
            round(col("dur").cast("double") /
              (col("t1") - col("t0")).cast("double"), 9).as("a"),
            round(col("dur").cast("double") / col("n").cast("double"), 6)
              .as("w_ms"))
        val fact = Seq(1.0, 1.0, 2.0, 6.0, 24.0, 120.0, 720.0, 5040.0)
        val withPows = (1 to 7).foldLeft(base.withColumn("p0", lit(1.0))) {
          case (d, k) => d.withColumn(s"p$k", col(s"p${k - 1}") * col("a"))
        }
        val rows = Seq(3, 4, 5, 6, 7).map { sAgents =>
          val rho = col("a") / lit(sAgents.toDouble)
          val num = col(s"p$sAgents") /
            (lit(fact(sAgents)) * (lit(1.0) - rho))
          val den = (0 until sAgents)
            .map(k => col(s"p$k") / lit(fact(k)))
            .reduce(_ + _) + num
          val pw = num / den
          struct(lit(sAgents).as("s_agents"),
            round(rho, 6).as("rho"),
            when(lit(sAgents.toDouble) > col("a"),
              round(pw, 6)).as("p_wait"),
            when(lit(sAgents.toDouble) > col("a"),
              round(pw * col("w_ms") /
                (lit(sAgents.toDouble) - col("a")), 3)).as("asa_ms"))
        }
        withPows.select(col("a"), col("w_ms"),
            explode(array(rows: _*)).as("r"))
          .select(round(col("a"), 6).as("offered_load"), col("w_ms"),
            col("r.s_agents"), col("r.rho"), col("r.p_wait"), col("r.asa_ms"))
          .orderBy(col("s_agents"))
      },
      oracle = Some {
        val fact = Seq(1.0, 1.0, 2.0, 6.0, 24.0, 120.0, 720.0, 5040.0)
        def f(i: Int) = s"CAST(${fact(i).toInt} AS DOUBLE)"
        val rows = Seq(3, 4, 5, 6, 7).map { sA =>
          val rho = s"(a / CAST($sA AS DOUBLE))"
          val numE = s"(p$sA / (${f(sA)} * (CAST(1 AS DOUBLE) - $rho)))"
          val denE = (0 until sA).map(k => s"p$k / ${f(k)}")
            .mkString(" + ") + s" + $numE"
          s"""
          SELECT ROUND(a, 6) AS offered_load, w_ms,
                 CAST($sA AS INT) AS s_agents,
                 ROUND($rho, 6) AS rho,
                 CASE WHEN CAST($sA AS DOUBLE) > a
                      THEN ROUND($numE / ($denE), 6) END AS p_wait,
                 CASE WHEN CAST($sA AS DOUBLE) > a
                      THEN ROUND(($numE / ($denE)) * w_ms
                        / (CAST($sA AS DOUBLE) - a), 3) END AS asa_ms
          FROM pows"""
        }.mkString("\n          UNION ALL")
        s"""
        WITH e AS (
          SELECT user_id, epoch_ms(ts) AS ts_ms,
                 CASE WHEN epoch_ms(ts) - lag(epoch_ms(ts)) OVER w
                        >= 600000 THEN 1
                      WHEN lag(epoch_ms(ts)) OVER w IS NULL THEN 1
                      ELSE 0 END AS brk
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ms(ts))),
        s0 AS (
          SELECT *, SUM(brk) OVER (PARTITION BY user_id ORDER BY ts_ms
                      ROWS UNBOUNDED PRECEDING) AS sid
          FROM e),
        sess AS (
          SELECT MIN(ts_ms) AS st, MAX(ts_ms) + 600000 AS en
          FROM s0 GROUP BY user_id, sid),
        base AS (
          SELECT ROUND(CAST(SUM(en - st) AS DOUBLE)
                   / CAST(MAX(en) - MIN(st) AS DOUBLE), 9) AS a,
                 ROUND(CAST(SUM(en - st) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE), 6) AS w_ms
          FROM sess),
        pows AS (
          SELECT a, w_ms, CAST(1 AS DOUBLE) AS p0,
                 a AS p1, a*a AS p2, a*a*a AS p3, a*a*a*a AS p4,
                 a*a*a*a*a AS p5, a*a*a*a*a*a AS p6,
                 a*a*a*a*a*a*a AS p7
          FROM base)
        $rows
        ORDER BY s_agents"""
      }),

    // Exact 1-D Wasserstein-1 (earth mover's) distance between the
    // urgent- and low-priority quantity distributions: in one dimension
    // W1 = ∫|F_a − F_b| — a sum of |cdf gap|·(value gap) terms over the
    // merged bounded value profile. Integer counts, 12-grid cdf ratios,
    // DECIMAL term sums; completes the q6u KS distance with the metric
    // that weighs HOW FAR mass must move, not just the max gap.
    "qav_wasserstein" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .select(col("l_quantity").cast("long").as("v"),
            col("o_orderpriority").as("pr"))
          .filter(col("pr").isin("1-URGENT", "5-LOW"))
        val prof = li.groupBy(col("v"))
          .agg(sum((col("pr") === "1-URGENT").cast("long")).as("na"),
            sum((col("pr") === "5-LOW").cast("long")).as("nb"))
        val w = Window.orderBy(col("v"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val tot = prof.agg(sum(col("na")).as("ta"), sum(col("nb")).as("tb"))
        val steps = prof
          .withColumn("ca", sum(col("na")).over(w))
          .withColumn("cb", sum(col("nb")).over(w))
          .withColumn("vn", lead(col("v"), 1).over(Window.orderBy(col("v"))))
          .filter(col("vn").isNotNull)
          .crossJoin(broadcast(tot))
          .withColumn("gap",
            (abs(round(col("ca").cast("double") / col("ta").cast("double"), 12)
              - round(col("cb").cast("double") / col("tb").cast("double"), 12))
              * (col("vn") - col("v")).cast("double")).cast("decimal(28,12)"))
        steps.groupBy(col("ta"), col("tb"))
          .agg(sum(col("gap")).as("w1_d"))
          .select(col("ta").as("n_urgent"), col("tb").as("n_low"),
            round(col("w1_d").cast("double"), 6).as("wasserstein_1"))
      },
      oracle = Some("""
        WITH li AS (
          SELECT CAST(l_quantity AS BIGINT) AS v, o_orderpriority AS pr
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
        prof AS (
          SELECT v,
                 CAST(SUM(CASE WHEN pr = '1-URGENT' THEN 1 ELSE 0 END)
                   AS BIGINT) AS na,
                 CAST(SUM(CASE WHEN pr = '5-LOW' THEN 1 ELSE 0 END)
                   AS BIGINT) AS nb
          FROM li GROUP BY 1),
        tot AS (
          SELECT CAST(SUM(na) AS BIGINT) AS ta, CAST(SUM(nb) AS BIGINT) AS tb
          FROM prof),
        steps AS (
          SELECT v,
                 SUM(na) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS ca,
                 SUM(nb) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cb,
                 LEAD(v) OVER (ORDER BY v) AS vn
          FROM prof),
        terms AS (
          SELECT t.ta, t.tb,
                 CAST(ABS(ROUND(CAST(s.ca AS DOUBLE) / CAST(t.ta AS DOUBLE), 12)
                   - ROUND(CAST(s.cb AS DOUBLE) / CAST(t.tb AS DOUBLE), 12))
                   * CAST(s.vn - s.v AS DOUBLE) AS DECIMAL(28,12)) AS gap
          FROM steps s CROSS JOIN tot t WHERE s.vn IS NOT NULL)
        SELECT ta AS n_urgent, tb AS n_low,
               ROUND(CAST(SUM(gap) AS DOUBLE), 6) AS wasserstein_1
        FROM terms GROUP BY 1, 2""")),

    // Laspeyres / Paasche / Fisher price indices, 1995 → 1996, over the
    // parts traded in both years: per-period unit prices on the 9-grid
    // from exact DECIMAL value / integer quantity, index terms p·q on
    // the 12-grid summed through DECIMAL, Fisher by proven-parity SQRT —
    // the economics index-number family.
    "qax_price_index" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .select(col("l_partkey"), year(col("o_orderdate")).as("yr"),
            col("l_quantity").cast("long").as("q"),
            col("l_extendedprice").cast("decimal(18,2)").as("val"))
          .filter(col("yr").isin(1995, 1996))
        val per = li.groupBy(col("l_partkey"), col("yr"))
          .agg(sum(col("q")).as("qty"), sum(col("val")).as("value"))
          .withColumn("p",
            round(col("value").cast("double") / col("qty").cast("double"), 9))
        val both = per.filter(col("yr") === 1995)
          .select(col("l_partkey"), col("p").as("p0"), col("qty").as("q0"))
          .join(per.filter(col("yr") === 1996)
            .select(col("l_partkey"), col("p").as("p1"), col("qty").as("q1")),
            Seq("l_partkey"))
        def term(p: String, q: String) =
          round(col(p) * col(q).cast("double"), 12).cast("decimal(28,12)")
        both.agg(count(lit(1)).as("n_parts"),
            sum(term("p1", "q0")).as("l_num"), sum(term("p0", "q0")).as("l_den"),
            sum(term("p1", "q1")).as("p_num"), sum(term("p0", "q1")).as("p_den"))
          .select(col("n_parts"),
            round(col("l_num").cast("double") / col("l_den").cast("double"), 6)
              .as("laspeyres"),
            round(col("p_num").cast("double") / col("p_den").cast("double"), 6)
              .as("paasche"),
            round(sqrt(
              (col("l_num").cast("double") / col("l_den").cast("double")) *
                (col("p_num").cast("double") / col("p_den").cast("double"))), 6)
              .as("fisher"))
      },
      oracle = Some("""
        WITH li AS (
          SELECT l_partkey, CAST(date_part('year', o_orderdate) AS INT) AS yr,
                 CAST(l_quantity AS BIGINT) AS q,
                 CAST(l_extendedprice AS DECIMAL(18,2)) AS val
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          WHERE CAST(date_part('year', o_orderdate) AS INT) IN (1995, 1996)),
        per AS (
          SELECT l_partkey, yr, CAST(SUM(q) AS BIGINT) AS qty,
                 SUM(val) AS value,
                 ROUND(CAST(SUM(val) AS DOUBLE) / CAST(SUM(q) AS DOUBLE), 9)
                   AS p
          FROM li GROUP BY 1, 2),
        bp AS (
          SELECT a.l_partkey, a.p AS p0, a.qty AS q0, b.p AS p1, b.qty AS q1
          FROM (SELECT * FROM per WHERE yr = 1995) a
          JOIN (SELECT * FROM per WHERE yr = 1996) b
            ON b.l_partkey = a.l_partkey),
        agg AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n_parts,
                 SUM(CAST(ROUND(p1 * CAST(q0 AS DOUBLE), 12)
                   AS DECIMAL(28,12))) AS l_num,
                 SUM(CAST(ROUND(p0 * CAST(q0 AS DOUBLE), 12)
                   AS DECIMAL(28,12))) AS l_den,
                 SUM(CAST(ROUND(p1 * CAST(q1 AS DOUBLE), 12)
                   AS DECIMAL(28,12))) AS p_num,
                 SUM(CAST(ROUND(p0 * CAST(q1 AS DOUBLE), 12)
                   AS DECIMAL(28,12))) AS p_den
          FROM bp)
        SELECT n_parts,
               ROUND(CAST(l_num AS DOUBLE) / CAST(l_den AS DOUBLE), 6)
                 AS laspeyres,
               ROUND(CAST(p_num AS DOUBLE) / CAST(p_den AS DOUBLE), 6)
                 AS paasche,
               ROUND(SQRT((CAST(l_num AS DOUBLE) / CAST(l_den AS DOUBLE))
                 * (CAST(p_num AS DOUBLE) / CAST(p_den AS DOUBLE))), 6)
                 AS fisher
        FROM agg""")),

    // Split conformal prediction (Vovk; the distribution-free interval
    // recipe): fit the qa0 OLS on the train split, take the
    // ⌈0.9·(n+1)⌉-th smallest absolute calibration residual as q̂ — an
    // exact order statistic selected by the distributed global row
    // number, no quantile approximation — and report empirical coverage
    // of ŷ ± q̂ on the held-out test split. Residuals come from the
    // 6-snapped published coefficients, so every stage replays exactly.
    "qay_conformal" -> Q(
      fn = (s, dir) => {
        val feats = t(s, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(count(lit(1)).as("x1"), sum(col("l_quantity")).as("x2"))
        val joined = t(s, dir, "orders")
          .join(feats, col("o_orderkey") === col("l_orderkey"))
          .select(col("o_orderkey").as("okey"),
            col("o_totalprice").cast("double").as("y"),
            col("x1").cast("double").as("x1"), col("x2").cast("double").as("x2"))
          .localCheckpoint(eager = false)
        val model = Regress.ols2(joined.filter(col("okey") % 4 === 0 ||
            col("okey") % 4 === 2), col("y"), col("x1"), col("x2"))
          .select(col("b0"), col("b1"), col("b2"))
        def absr = abs(col("y") - (col("b0") + col("b1") * col("x1") +
          col("b2") * col("x2")))
        val cal = joined.filter(col("okey") % 4 === 1)
          .crossJoin(broadcast(model))
          .select(col("okey"), round(absr, 6).as("r"))
        val nCal = cal.agg(count(lit(1)).as("n_cal"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(cal,
          Seq(col("r"), col("okey")), "rn")
        val qhat = ranked.crossJoin(broadcast(nCal))
          .filter(col("rn") ===
            ceil(lit(0.9) * (col("n_cal") + 1).cast("double")).cast("long"))
          .select(col("r").as("q_hat"), col("n_cal"))
        val test = joined.filter(col("okey") % 4 === 3)
          .crossJoin(broadcast(model))
          .select(round(absr, 6).as("r"))
          .crossJoin(broadcast(qhat))
        test.groupBy(col("n_cal"), col("q_hat"))
          .agg(count(lit(1)).as("n_test"),
            sum((col("r") <= col("q_hat")).cast("long")).as("covered"))
          .select(col("n_cal"), col("n_test"), col("q_hat"),
            round(col("covered").cast("double") /
              col("n_test").cast("double"), 6).as("coverage"))
      },
      oracle = Some("""
        WITH j AS (
          SELECT o_orderkey AS okey, CAST(o_totalprice AS DOUBLE) AS y,
                 CAST(x1 AS DOUBLE) AS x1, CAST(x2 AS DOUBLE) AS x2
          FROM orders JOIN (
            SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS x1,
                   SUM(l_quantity) AS x2
            FROM lineitem GROUP BY 1) li ON o_orderkey = l_orderkey),
        f AS (SELECT * FROM j WHERE okey % 4 = 0 OR okey % 4 = 2),
        a AS (
          SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                 CAST(SUM(CAST(ROUND(x1, 6) AS DECIMAL(38,6))) AS DOUBLE) AS s1,
                 CAST(SUM(CAST(ROUND(x2, 6) AS DECIMAL(38,6))) AS DOUBLE) AS s2,
                 CAST(SUM(CAST(ROUND(x1*x1, 6) AS DECIMAL(38,6))) AS DOUBLE) AS s11,
                 CAST(SUM(CAST(ROUND(x1*x2, 6) AS DECIMAL(38,6))) AS DOUBLE) AS s12,
                 CAST(SUM(CAST(ROUND(x2*x2, 6) AS DECIMAL(38,6))) AS DOUBLE) AS s22,
                 CAST(SUM(CAST(ROUND(y, 6) AS DECIMAL(38,6))) AS DOUBLE) AS sy,
                 CAST(SUM(CAST(ROUND(x1*y, 6) AS DECIMAL(38,6))) AS DOUBLE) AS s1y,
                 CAST(SUM(CAST(ROUND(x2*y, 6) AS DECIMAL(38,6))) AS DOUBLE) AS s2y
          FROM f),
        d AS (
          SELECT *,
                 n * (s11 * s22 - s12 * s12) - s1 * (s1 * s22 - s12 * s2)
                   + s2 * (s1 * s12 - s11 * s2) AS det,
                 sy * (s11 * s22 - s12 * s12) - s1 * (s1y * s22 - s12 * s2y)
                   + s2 * (s1y * s12 - s11 * s2y) AS det0,
                 n * (s1y * s22 - s12 * s2y) - sy * (s1 * s22 - s12 * s2)
                   + s2 * (s1 * s2y - s1y * s2) AS det1,
                 n * (s11 * s2y - s1y * s12) - s1 * (s1 * s2y - s1y * s2)
                   + sy * (s1 * s12 - s11 * s2) AS det2
          FROM a),
        m AS (
          SELECT ROUND(ROUND(det0 / det, 9), 6) AS b0,
                 ROUND(ROUND(det1 / det, 9), 6) AS b1,
                 ROUND(ROUND(det2 / det, 9), 6) AS b2
          FROM d),
        cal AS (
          SELECT j.okey,
                 ROUND(ABS(j.y - (m.b0 + m.b1 * j.x1 + m.b2 * j.x2)), 6) AS r
          FROM j CROSS JOIN m WHERE j.okey % 4 = 1),
        nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_cal FROM cal),
        qh AS (
          SELECT r AS q_hat, n_cal FROM (
            SELECT cal.r, nc.n_cal,
                   ROW_NUMBER() OVER (ORDER BY cal.r, cal.okey) AS rn
            FROM cal CROSS JOIN nc)
          WHERE rn = CAST(CEIL(CAST(0.9 AS DOUBLE)
            * CAST(n_cal + 1 AS DOUBLE)) AS BIGINT)),
        tst AS (
          SELECT ROUND(ABS(j.y - (m.b0 + m.b1 * j.x1 + m.b2 * j.x2)), 6) AS r
          FROM j CROSS JOIN m WHERE j.okey % 4 = 3)
        SELECT qh.n_cal, CAST(COUNT(*) AS BIGINT) AS n_test, qh.q_hat,
               ROUND(CAST(SUM(CASE WHEN tst.r <= qh.q_hat THEN 1 ELSE 0 END)
                   AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS coverage
        FROM tst CROSS JOIN qh
        GROUP BY qh.n_cal, qh.q_hat""")),

    // Spectral bisection of the q4b order graph: 3 deflated power-
    // iteration rounds toward the Fiedler direction of D⁻¹A (the q4b
    // per-round discipline — DECIMAL neighbor sums, scalar mean/scale
    // aggregates, 9-grid snaps), sign split, and the cut's conductance
    // cut/min(vol) — the spectral-partitioning quality number.
    "qaz_spectral_cut" -> Q(
      fn = (s, dir) => {
        val edges = t(s, dir, "orders").select(
          (col("o_custkey") % 80).cast("long").as("src"),
          (col("o_orderkey") % 97).cast("long").as("dst"))
        val split = graft.operators.GraphOps.spectralSplit(edges, 3)
          .select(col("node"), col("side"))
        val und = edges
          .select(least(col("src"), col("dst")).as("u"),
            greatest(col("src"), col("dst")).as("v"))
          .filter(col("u") =!= col("v")).distinct()
        val deg = und.select(col("u").as("node"))
          .union(und.select(col("v").as("node")))
          .groupBy(col("node")).agg(count(lit(1)).as("deg"))
        val cut = und
          .join(split.select(col("node").as("u"), col("side").as("su")),
            Seq("u"))
          .join(split.select(col("node").as("v"), col("side").as("sv")),
            Seq("v"))
          .agg(sum((col("su") =!= col("sv")).cast("long")).as("cut_edges"))
        val sides = split.join(deg, Seq("node"))
          .groupBy(col("side"))
          .agg(count(lit(1)).as("n_nodes"), sum(col("deg")).as("volume"))
        val minVol = sides.agg(min(col("volume")).as("min_vol"))
        sides.crossJoin(broadcast(cut)).crossJoin(broadcast(minVol))
          .select(col("side"), col("n_nodes"), col("volume"),
            col("cut_edges"),
            round(col("cut_edges").cast("double") /
              col("min_vol").cast("double"), 6).as("conductance"))
          .orderBy(col("side"))
      },
      oracle = Some {
        val iters = (1 to 3).map { k =>
          val prev = s"x${k - 1}"
          s""",
        nbr$k AS (
          SELECT adj.a AS node, SUM(CAST(x.x AS DECIMAL(28,12))) AS sx
          FROM adj JOIN $prev x ON x.node = adj.b GROUP BY 1),
        st$k AS (
          SELECT d.node, d.deg,
                 COALESCE(CAST(n.sx AS DOUBLE), CAST(0 AS DOUBLE))
                   / CAST(d.deg AS DOUBLE) AS px
          FROM deg d LEFT JOIN nbr$k n ON n.node = d.node),
        mu$k AS (
          SELECT CAST(SUM(CAST(px * CAST(deg AS DOUBLE) AS DECIMAL(28,12)))
                   AS DOUBLE) / CAST(SUM(deg) AS DOUBLE) AS mu
          FROM st$k),
        ce$k AS (
          SELECT node, deg, px - (SELECT mu FROM mu$k) AS cx FROM st$k),
        mx$k AS (SELECT MAX(ABS(ROUND(cx, 9))) AS mx FROM ce$k),
        x$k AS MATERIALIZED (
          SELECT node, deg,
                 CASE WHEN (SELECT mx FROM mx$k) > 0
                      THEN ROUND(ROUND(cx, 9) / (SELECT mx FROM mx$k), 9)
                      ELSE CAST(0 AS DOUBLE) END AS x
          FROM ce$k)"""
        }.mkString
        s"""
        WITH e0 AS (
          SELECT DISTINCT CAST(o_custkey % 80 AS BIGINT) AS s,
                          CAST(o_orderkey % 97 AS BIGINT) AS d
          FROM orders WHERE o_custkey % 80 <> o_orderkey % 97),
        und AS MATERIALIZED (
          SELECT DISTINCT LEAST(s, d) AS u, GREATEST(s, d) AS v FROM e0),
        adj AS MATERIALIZED (
          SELECT u AS a, v AS b FROM und UNION ALL SELECT v, u FROM und),
        deg AS MATERIALIZED (
          SELECT a AS node, CAST(COUNT(*) AS BIGINT) AS deg
          FROM adj GROUP BY 1),
        x0 AS (
          SELECT node, deg,
                 CASE WHEN node % 2 = 0 THEN CAST(1 AS DOUBLE)
                      ELSE CAST(-1 AS DOUBLE) END AS x
          FROM deg)$iters,
        split AS MATERIALIZED (
          SELECT node, CASE WHEN x > 0 THEN 1 ELSE 0 END AS side FROM x3),
        cut AS (
          SELECT CAST(SUM(CASE WHEN a.side <> b.side THEN 1 ELSE 0 END)
                   AS BIGINT) AS cut_edges
          FROM und JOIN split a ON a.node = und.u
          JOIN split b ON b.node = und.v),
        sides AS (
          SELECT s.side, CAST(COUNT(*) AS BIGINT) AS n_nodes,
                 CAST(SUM(d.deg) AS BIGINT) AS volume
          FROM split s JOIN deg d ON d.node = s.node GROUP BY 1),
        mv AS (SELECT MIN(volume) AS min_vol FROM sides)
        SELECT sides.side, sides.n_nodes, sides.volume, cut.cut_edges,
               ROUND(CAST(cut.cut_edges AS DOUBLE)
                 / CAST(mv.min_vol AS DOUBLE), 6) AS conductance
        FROM sides CROSS JOIN cut CROSS JOIN mv
        ORDER BY sides.side"""
      }),

    // Canonical correlation analysis, closed form for 2+2 variables:
    // the canonical correlations between (quantity, discount) and
    // (extendedprice, tax) are the square roots of the eigenvalues of
    // Sxx⁻¹SxySyy⁻¹Syx — one DECIMAL moment aggregate, explicit 2×2
    // inverses/products on the 12-grid, the quadratic formula with
    // proven-parity SQRT. The multivariate completion of the q8c
    // correlation matrix.
    "qb0_cca" -> Q(
      fn = (s, dir) => {
        val base = t(s, dir, "lineitem").select(
          col("l_quantity").cast("double").as("a1"),
          col("l_discount").cast("double").as("a2"),
          col("l_extendedprice").cast("double").as("b1"),
          col("l_tax").cast("double").as("b2"))
        // every variable is an exact <=2-decimal value: products in
        // DECIMAL(18,2)x(18,2) are exact, dodging the rule-13 trap on
        // the 1e10-magnitude price squares
        def dec(c: Column) = c.cast("decimal(18,2)")
        val cols = Seq("a1", "a2", "b1", "b2")
        val sums = cols.map(c => sum(dec(col(c))).as(s"s_$c")) ++
          (for { i <- cols.indices; j <- i until cols.size }
            yield sum(dec(col(cols(i))) * dec(col(cols(j))))
              .as(s"s_${cols(i)}${cols(j)}"))
        val aggExprs = count(lit(1)).cast("double").as("n") +: sums
        val m = base.agg(aggExprs.head, aggExprs.tail: _*)
        def cov(x: String, y: String): Column = {
          val key = if (cols.indexOf(x) <= cols.indexOf(y)) s"$x$y" else s"$y$x"
          round(col(s"s_$key").cast("double") / col("n") -
            (col(s"s_$x").cast("double") / col("n")) *
              (col(s"s_$y").cast("double") / col("n")), 12)
        }
        val withCov = m
          .withColumn("xx11", cov("a1", "a1")).withColumn("xx12", cov("a1", "a2"))
          .withColumn("xx22", cov("a2", "a2"))
          .withColumn("yy11", cov("b1", "b1")).withColumn("yy12", cov("b1", "b2"))
          .withColumn("yy22", cov("b2", "b2"))
          .withColumn("xy11", cov("a1", "b1")).withColumn("xy12", cov("a1", "b2"))
          .withColumn("xy21", cov("a2", "b1")).withColumn("xy22", cov("a2", "b2"))
          .withColumn("dy", col("yy11") * col("yy22") - col("yy12") * col("yy12"))
          .withColumn("t11", round((col("xy11") * col("yy22") -
            col("xy12") * col("yy12")) / col("dy"), 12))
          .withColumn("t12", round((col("xy12") * col("yy11") -
            col("xy11") * col("yy12")) / col("dy"), 12))
          .withColumn("t21", round((col("xy21") * col("yy22") -
            col("xy22") * col("yy12")) / col("dy"), 12))
          .withColumn("t22", round((col("xy22") * col("yy11") -
            col("xy21") * col("yy12")) / col("dy"), 12))
          .withColumn("p11", col("t11") * col("xy11") + col("t12") * col("xy12"))
          .withColumn("p12", col("t11") * col("xy21") + col("t12") * col("xy22"))
          .withColumn("p21", col("t21") * col("xy11") + col("t22") * col("xy12"))
          .withColumn("p22", col("t21") * col("xy21") + col("t22") * col("xy22"))
          .withColumn("dx", col("xx11") * col("xx22") - col("xx12") * col("xx12"))
          .withColumn("m11", round((col("xx22") * col("p11") -
            col("xx12") * col("p21")) / col("dx"), 12))
          .withColumn("m12", round((col("xx22") * col("p12") -
            col("xx12") * col("p22")) / col("dx"), 12))
          .withColumn("m21", round((col("xx11") * col("p21") -
            col("xx12") * col("p11")) / col("dx"), 12))
          .withColumn("m22", round((col("xx11") * col("p22") -
            col("xx12") * col("p12")) / col("dx"), 12))
          .withColumn("tr", col("m11") + col("m22"))
          .withColumn("dd", col("m11") * col("m22") - col("m12") * col("m21"))
          .withColumn("disc",
            greatest(col("tr") * col("tr") - lit(4.0) * col("dd"), lit(0.0)))
        withCov.select(col("n").cast("long").as("n"),
          round(sqrt(greatest((col("tr") + sqrt(col("disc"))) / lit(2.0),
            lit(0.0))), 6).as("rho1"),
          round(sqrt(greatest((col("tr") - sqrt(col("disc"))) / lit(2.0),
            lit(0.0))), 6).as("rho2"))
      },
      oracle = Some("""
        WITH base AS (
          SELECT CAST(l_quantity AS DOUBLE) AS a1,
                 CAST(l_discount AS DOUBLE) AS a2,
                 CAST(l_extendedprice AS DOUBLE) AS b1,
                 CAST(l_tax AS DOUBLE) AS b2
          FROM lineitem),
        m AS (
          SELECT CAST(COUNT(*) AS DOUBLE) AS n,
                 CAST(SUM(CAST(a1 AS DECIMAL(18,2))) AS DOUBLE) AS s_a1,
                 CAST(SUM(CAST(a2 AS DECIMAL(18,2))) AS DOUBLE) AS s_a2,
                 CAST(SUM(CAST(b1 AS DECIMAL(18,2))) AS DOUBLE) AS s_b1,
                 CAST(SUM(CAST(b2 AS DECIMAL(18,2))) AS DOUBLE) AS s_b2,
                 CAST(SUM(CAST(a1 AS DECIMAL(18,2)) * CAST(a1 AS DECIMAL(18,2))) AS DOUBLE) AS s_a1a1,
                 CAST(SUM(CAST(a1 AS DECIMAL(18,2)) * CAST(a2 AS DECIMAL(18,2))) AS DOUBLE) AS s_a1a2,
                 CAST(CAST(SUM(CAST(a1 AS DECIMAL(18,2)) * CAST(b1 AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS s_a1b1,
                 CAST(SUM(CAST(a1 AS DECIMAL(18,2)) * CAST(b2 AS DECIMAL(18,2))) AS DOUBLE) AS s_a1b2,
                 CAST(SUM(CAST(a2 AS DECIMAL(18,2)) * CAST(a2 AS DECIMAL(18,2))) AS DOUBLE) AS s_a2a2,
                 CAST(SUM(CAST(a2 AS DECIMAL(18,2)) * CAST(b1 AS DECIMAL(18,2))) AS DOUBLE) AS s_a2b1,
                 CAST(SUM(CAST(a2 AS DECIMAL(18,2)) * CAST(b2 AS DECIMAL(18,2))) AS DOUBLE) AS s_a2b2,
                 CAST(CAST(SUM(CAST(b1 AS DECIMAL(18,2)) * CAST(b1 AS DECIMAL(18,2))) AS VARCHAR) AS DOUBLE) AS s_b1b1,
                 CAST(SUM(CAST(b1 AS DECIMAL(18,2)) * CAST(b2 AS DECIMAL(18,2))) AS DOUBLE) AS s_b1b2,
                 CAST(SUM(CAST(b2 AS DECIMAL(18,2)) * CAST(b2 AS DECIMAL(18,2))) AS DOUBLE) AS s_b2b2
          FROM base),
        cv AS (
          SELECT n,
            ROUND(s_a1a1/n - (s_a1/n)*(s_a1/n), 12) AS xx11,
            ROUND(s_a1a2/n - (s_a1/n)*(s_a2/n), 12) AS xx12,
            ROUND(s_a2a2/n - (s_a2/n)*(s_a2/n), 12) AS xx22,
            ROUND(s_b1b1/n - (s_b1/n)*(s_b1/n), 12) AS yy11,
            ROUND(s_b1b2/n - (s_b1/n)*(s_b2/n), 12) AS yy12,
            ROUND(s_b2b2/n - (s_b2/n)*(s_b2/n), 12) AS yy22,
            ROUND(s_a1b1/n - (s_a1/n)*(s_b1/n), 12) AS xy11,
            ROUND(s_a1b2/n - (s_a1/n)*(s_b2/n), 12) AS xy12,
            ROUND(s_a2b1/n - (s_a2/n)*(s_b1/n), 12) AS xy21,
            ROUND(s_a2b2/n - (s_a2/n)*(s_b2/n), 12) AS xy22
          FROM m),
        tt AS (
          SELECT *, yy11*yy22 - yy12*yy12 AS dy FROM cv),
        t2 AS (
          SELECT *,
            ROUND((xy11*yy22 - xy12*yy12) / dy, 12) AS t11,
            ROUND((xy12*yy11 - xy11*yy12) / dy, 12) AS t12,
            ROUND((xy21*yy22 - xy22*yy12) / dy, 12) AS t21,
            ROUND((xy22*yy11 - xy21*yy12) / dy, 12) AS t22
          FROM tt),
        p2 AS (
          SELECT *,
            t11*xy11 + t12*xy12 AS p11, t11*xy21 + t12*xy22 AS p12,
            t21*xy11 + t22*xy12 AS p21, t21*xy21 + t22*xy22 AS p22,
            xx11*xx22 - xx12*xx12 AS dx
          FROM t2),
        m2 AS (
          SELECT *,
            ROUND((xx22*p11 - xx12*p21) / dx, 12) AS m11,
            ROUND((xx22*p12 - xx12*p22) / dx, 12) AS m12,
            ROUND((xx11*p21 - xx12*p11) / dx, 12) AS m21,
            ROUND((xx11*p22 - xx12*p12) / dx, 12) AS m22
          FROM p2),
        ev AS (
          SELECT *, m11 + m22 AS tr,
                 m11*m22 - m12*m21 AS dd
          FROM m2),
        fin AS (
          SELECT *, GREATEST(tr*tr - CAST(4 AS DOUBLE)*dd, CAST(0 AS DOUBLE))
                   AS disc
          FROM ev)
        SELECT CAST(n AS BIGINT) AS n,
               ROUND(SQRT(GREATEST((tr + SQRT(disc)) / CAST(2 AS DOUBLE),
                 CAST(0 AS DOUBLE))), 6) AS rho1,
               ROUND(SQRT(GREATEST((tr - SQRT(disc)) / CAST(2 AS DOUBLE),
                 CAST(0 AS DOUBLE))), 6) AS rho2
        FROM fin""")),

    // Inventory policy per brand: EOQ = sqrt(2·D·S/H) on the measured
    // annualized demand rate, safety stock z·σ_w·sqrt(L) from the
    // weekly-demand deviation (the qat dense-grid moments), reorder
    // point = d_w·L + safety — the classical (Q, r) policy, every link
    // sqrt/÷/× with fixed literals (z = 1.645, L = 2 weeks, S = 100,
    // H = 0.2), completing the ops family (Little qar, Erlang-C qau).
    "qb1_inventory_policy" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem")
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .select(col("p_brand").as("brand"),
            expr("unix_millis(CAST(l_shipdate AS TIMESTAMP)) div 604800000")
              .as("week"),
            col("l_quantity").cast("long").as("q"))
        val wk = li.groupBy(col("brand"), col("week")).agg(sum(col("q")).as("qty"))
        val weeks = li.select(col("week")).distinct()
        val brands = li.select(col("brand")).distinct()
        val grid = brands.crossJoin(broadcast(weeks))
          .join(wk, Seq("brand", "week"), "left")
          .withColumn("q0", coalesce(col("qty"), lit(0L)))
        val nD = col("n").cast("double")
        val mean = col("cs").cast("double") / nD
        val variance = col("css").cast("double") / nD -
          (col("cs").cast("double") / nD) * (col("cs").cast("double") / nD)
        grid.groupBy(col("brand"))
          .agg(count(lit(1)).as("n"), sum(col("q0")).as("cs"),
            sum(col("q0") * col("q0")).as("css"))
          .withColumn("d_week", round(mean, 9))
          .withColumn("sigma_week",
            round(sqrt(greatest(variance, lit(0.0))), 9))
          .withColumn("d_annual", round(col("d_week") * lit(52.0), 6))
          .select(col("brand"), col("n").as("n_weeks"),
            round(col("d_week"), 6).as("demand_week"),
            round(col("sigma_week"), 6).as("sigma_week"),
            round(sqrt(lit(2.0) * col("d_annual") * lit(100.0) / lit(0.2)), 6)
              .as("eoq"),
            round(lit(1.645) * col("sigma_week") * sqrt(lit(2.0)), 6)
              .as("safety_stock"),
            round(col("d_week") * lit(2.0) +
              lit(1.645) * col("sigma_week") * sqrt(lit(2.0)), 6)
              .as("reorder_point"))
          .orderBy(col("brand"))
      },
      oracle = Some("""
        WITH li AS (
          SELECT p_brand AS brand,
                 CAST(epoch_ms(l_shipdate) // 604800000 AS BIGINT) AS week,
                 CAST(l_quantity AS BIGINT) AS q
          FROM lineitem JOIN part ON l_partkey = p_partkey),
        wk AS (
          SELECT brand, week, CAST(SUM(q) AS BIGINT) AS qty
          FROM li GROUP BY 1, 2),
        weeks AS (SELECT DISTINCT week FROM li),
        brands AS (SELECT DISTINCT brand FROM li),
        grid AS (
          SELECT b.brand, w.week, COALESCE(wk.qty, CAST(0 AS BIGINT)) AS q0
          FROM brands b CROSS JOIN weeks w
          LEFT JOIN wk ON wk.brand = b.brand AND wk.week = w.week),
        m AS (
          SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(q0) AS BIGINT) AS cs,
                 CAST(SUM(q0 * q0) AS BIGINT) AS css
          FROM grid GROUP BY 1),
        c AS (
          SELECT brand, n,
                 ROUND(CAST(cs AS DOUBLE) / CAST(n AS DOUBLE), 9) AS d_week,
                 ROUND(SQRT(GREATEST(
                     CAST(css AS DOUBLE) / CAST(n AS DOUBLE)
                       - (CAST(cs AS DOUBLE) / CAST(n AS DOUBLE))
                         * (CAST(cs AS DOUBLE) / CAST(n AS DOUBLE)),
                     CAST(0 AS DOUBLE))), 9) AS sigma_week
          FROM m),
        f AS (
          SELECT *, ROUND(d_week * CAST(52 AS DOUBLE), 6) AS d_annual
          FROM c)
        SELECT brand, n AS n_weeks,
               ROUND(d_week, 6) AS demand_week,
               ROUND(sigma_week, 6) AS sigma_week,
               ROUND(SQRT(CAST(2 AS DOUBLE) * d_annual * CAST(100 AS DOUBLE)
                 / CAST(0.2 AS DOUBLE)), 6) AS eoq,
               ROUND(CAST(1.645 AS DOUBLE) * sigma_week
                 * SQRT(CAST(2 AS DOUBLE)), 6) AS safety_stock,
               ROUND(d_week * CAST(2 AS DOUBLE)
                 + CAST(1.645 AS DOUBLE) * sigma_week
                   * SQRT(CAST(2 AS DOUBLE)), 6) AS reorder_point
        FROM f ORDER BY brand""")),

    // MinHash-LSH acceptance report: the q29 candidate pairs evaluated
    // against the EXACT trigram-Jaccard ≥ 0.2 truth (inverted-index
    // pair generation — docs sharing ≥ 1 trigram — never an O(n²)
    // cross). Precision/recall as exact count ratios; the oracle embeds
    // the full proven q29 minhash pipeline as a nested-WITH subquery.
    "qb2_lsh_quality" -> Q(
      fn = (s, dir) => {
        val d = t(s, dir, "documents")
        val lsh = graft.operators.Dedup.minhashCandidatePairs(
          d, "doc_id", "text", minEstJaccard = 0.2)
          .select(col("doc_a"), col("doc_b"))
        val tg = d.select(col("doc_id"), split(col("text"), " ").as("toks"))
          .filter(size(col("toks")) >= 3)
          .select(col("doc_id"), array_distinct(expr(
            "transform(sequence(1, size(toks) - 2), " +
              "i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))"))
            .as("grams"))
        val sz = tg.select(col("doc_id"), size(col("grams")).as("n"))
        val inv = tg.select(col("doc_id"), explode(col("grams")).as("g"))
        val inter = inv.select(col("doc_id").as("da"), col("g"))
          .join(inv.select(col("doc_id").as("db"), col("g")), Seq("g"))
          .filter(col("da") < col("db"))
          .groupBy(col("da"), col("db")).agg(count(lit(1)).as("ni"))
        val truth = inter
          .join(sz.select(col("doc_id").as("da"), col("n").as("na")), Seq("da"))
          .join(sz.select(col("doc_id").as("db"), col("n").as("nb")), Seq("db"))
          .filter(col("ni").cast("double") /
            (col("na") + col("nb") - col("ni")).cast("double") >= 0.2)
          .select(col("da").as("doc_a"), col("db").as("doc_b"))
        val found = lsh.join(truth, Seq("doc_a", "doc_b"))
        truth.agg(count(lit(1)).as("n_truth"))
          .crossJoin(lsh.agg(count(lit(1)).as("n_cand")))
          .crossJoin(found.agg(count(lit(1)).as("n_found")))
          .select(col("n_truth"), col("n_cand"), col("n_found"),
            round(col("n_found").cast("double") /
              col("n_cand").cast("double"), 6).as("precision"),
            round(col("n_found").cast("double") /
              col("n_truth").cast("double"), 6).as("recall"))
      },
      oracle = Some(s"""
        WITH lsh AS MATERIALIZED (
          SELECT doc_a, doc_b FROM (
            ${OracleSql.minhashPairsOracle(minEstJaccard = 0.2,
              maxBucketSize = 1000)}) z),
        tt AS (
          SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
        tg AS (
          SELECT doc_id,
                 list_distinct(list_transform(range(1, len(toks) - 1),
                   i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]))
                   AS grams
          FROM tt WHERE len(toks) >= 3),
        sz AS (SELECT doc_id, len(grams) AS n FROM tg),
        inv AS (SELECT doc_id, unnest(grams) AS g FROM tg),
        inter AS (
          SELECT a.doc_id AS da, b.doc_id AS db, CAST(COUNT(*) AS BIGINT)
                   AS ni
          FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
        truthp AS (
          SELECT i.da AS doc_a, i.db AS doc_b
          FROM inter i JOIN sz sa ON sa.doc_id = i.da
          JOIN sz sb ON sb.doc_id = i.db
          WHERE CAST(i.ni AS DOUBLE)
            / CAST(sa.n + sb.n - i.ni AS DOUBLE) >= CAST(0.2 AS DOUBLE)),
        counts AS (
          SELECT
            (SELECT CAST(COUNT(*) AS BIGINT) FROM truthp) AS n_truth,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM lsh) AS n_cand,
            (SELECT CAST(COUNT(*) AS BIGINT) FROM lsh
             JOIN truthp ON truthp.doc_a = lsh.doc_a
               AND truthp.doc_b = lsh.doc_b) AS n_found)
        SELECT n_truth, n_cand, n_found,
               ROUND(CAST(n_found AS DOUBLE) / CAST(n_cand AS DOUBLE), 6)
                 AS precision,
               ROUND(CAST(n_found AS DOUBLE) / CAST(n_truth AS DOUBLE), 6)
                 AS recall
        FROM counts""")),

    // Ljung–Box portmanteau over the daily revenue series: exact
    // autocorrelations at lags 1..7 (revenue scaled to thousands so the
    // 6-grid centered products stay within 15 significant digits — the
    // rule-13 budget), lag alignment by row-number-shift EQUI joins, and
    // the Q statistic n(n+2)Σr²/(n−k). The serial-dependence audit for
    // any forecast residual.
    "qb3_ljung_box" -> Q(
      fn = (s, dir) => {
        val daily = t(s, dir, "orders")
          .groupBy(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP))" +
            " div 86400000").as("day"))
          .agg((sum(col("o_totalprice").cast("decimal(18,2)")) /
            lit(1000)).cast("decimal(18,5)").as("yk"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(daily,
          Seq(col("day")), "rn").localCheckpoint(eager = false)
        val stats = ranked.agg(count(lit(1)).as("n"), sum(col("yk")).as("sy"))
          .select(col("n"),
            round(col("sy").cast("double") / col("n").cast("double"), 9)
              .as("mu"))
        val centered = ranked.crossJoin(broadcast(stats))
          .select(col("rn"), (col("yk").cast("double") - col("mu")).as("c"),
            col("n"))
          .localCheckpoint(eager = false)
        val denom = centered.agg(
          sum(round(col("c") * col("c"), 6).cast("decimal(28,6)")).as("d0"),
          first(col("n")).as("n"))
        val lags = (1 to 7).map { k =>
          centered.select(col("rn"), col("c").as("ca"))
            .join(centered.select((col("rn") - k).as("rn"), col("c").as("cb")),
              Seq("rn"))
            .agg(sum(round(col("ca") * col("cb"), 6).cast("decimal(28,6)"))
              .as("num"))
            .select(lit(k).as("lag"), col("num"))
        }.reduce(_ unionByName _)
        val rks = lags.crossJoin(broadcast(denom))
          .select(col("lag"), col("n"),
            round(col("num").cast("double") / col("d0").cast("double"), 9)
              .as("rk"))
          .localCheckpoint(eager = false)
        val q = rks.agg(first(col("n")).as("n"),
            sum(round(col("rk") * col("rk") /
              (col("n") - col("lag")).cast("double"), 12)
              .cast("decimal(28,12)")).as("qsum"))
          .select((col("n").cast("double") * (col("n") + 2).cast("double") *
            col("qsum").cast("double")).as("q_raw"))
          .select(round(col("q_raw"), 6).as("q_stat"))
        rks.crossJoin(broadcast(q))
          .select(col("lag"), round(col("rk"), 6).as("acf"), col("q_stat"))
          .orderBy(col("lag"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT CAST(epoch_ms(o_orderdate) // 86400000 AS BIGINT) AS day,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                   / 1000 AS DECIMAL(18,5)) AS yk
          FROM orders GROUP BY 1),
        r AS (
          SELECT yk, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM daily),
        st AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 ROUND(CAST(SUM(yk) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
                   AS mu
          FROM r),
        c AS (
          SELECT rn, CAST(yk AS DOUBLE) - st.mu AS c, st.n
          FROM r CROSS JOIN st),
        d0 AS (
          SELECT SUM(CAST(ROUND(c * c, 6) AS DECIMAL(28,6))) AS d0,
                 MAX(n) AS n
          FROM c),
        lagt AS (SELECT CAST(UNNEST(range(1, 8)) AS INT) AS lag),
        nums AS (
          SELECT l.lag,
                 SUM(CAST(ROUND(a.c * b.c, 6) AS DECIMAL(28,6))) AS num
          FROM lagt l
          JOIN c a ON TRUE
          JOIN c b ON b.rn = a.rn + l.lag
          GROUP BY 1),
        rks AS (
          SELECT nums.lag, d0.n,
                 ROUND(CAST(num AS DOUBLE) / CAST(d0.d0 AS DOUBLE), 9) AS rk
          FROM nums CROSS JOIN d0),
        q AS (
          SELECT ROUND(CAST(MAX(n) AS DOUBLE) * CAST(MAX(n) + 2 AS DOUBLE)
                   * CAST(SUM(CAST(ROUND(rk * rk
                       / CAST(n - lag AS DOUBLE), 12)
                     AS DECIMAL(28,12))) AS DOUBLE), 6) AS q_stat
          FROM rks)
        SELECT rks.lag, ROUND(rks.rk, 6) AS acf, q.q_stat
        FROM rks CROSS JOIN q
        ORDER BY rks.lag""")),

    // Wald–Wolfowitz runs test on the daily revenue series: runs of
    // above/below-mean days counted by a row-number-shift equi-join,
    // then the exact closed-form z = (R − μ_R)/σ_R — integer counts all
    // the way to two divisions and one sqrt.
    "qb4_runs_test" -> Q(
      fn = (s, dir) => {
        val daily = t(s, dir, "orders")
          .groupBy(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP))" +
            " div 86400000").as("day"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(daily,
          Seq(col("day")), "rn").localCheckpoint(eager = false)
        val mu = ranked.agg(count(lit(1)).as("n"), sum(col("rev")).as("sy"))
          .select(col("n"),
            round(col("sy").cast("double") / col("n").cast("double"), 9)
              .as("mu"))
        val signed = ranked.crossJoin(broadcast(mu))
          .select(col("rn"),
            (col("rev").cast("double") > col("mu")).cast("long").as("x"))
          .localCheckpoint(eager = false)
        val flips = signed.select(col("rn"), col("x").as("xa"))
          .join(signed.select((col("rn") - 1).as("rn"), col("x").as("xb")),
            Seq("rn"))
          .agg(sum((col("xa") =!= col("xb")).cast("long")).as("n_flips"))
        val cnt = signed.agg(sum(col("x")).as("n1"),
          sum(lit(1L) - col("x")).as("n2"))
        val n1d = col("n1").cast("double"); val n2d = col("n2").cast("double")
        val nD = (col("n1") + col("n2")).cast("double")
        val muR = lit(2.0) * n1d * n2d / nD + lit(1.0)
        val varR = lit(2.0) * n1d * n2d *
          (lit(2.0) * n1d * n2d - nD) / (nD * nD * (nD - lit(1.0)))
        cnt.crossJoin(flips)
          .withColumn("runs", col("n_flips") + 1)
          .select(col("n1"), col("n2"), col("runs"),
            round(muR, 6).as("expected_runs"),
            round((col("runs").cast("double") - muR) /
              sqrt(varR), 6).as("z"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT CAST(epoch_ms(o_orderdate) // 86400000 AS BIGINT) AS day,
                 SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
          FROM orders GROUP BY 1),
        r AS (
          SELECT rev, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM daily),
        st AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 ROUND(CAST(SUM(rev) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
                   AS mu
          FROM r),
        sgn AS (
          SELECT rn,
                 CASE WHEN CAST(rev AS DOUBLE) > st.mu THEN 1 ELSE 0 END AS x
          FROM r CROSS JOIN st),
        fl AS (
          SELECT CAST(SUM(CASE WHEN a.x <> b.x THEN 1 ELSE 0 END) AS BIGINT)
                   AS n_flips
          FROM sgn a JOIN sgn b ON b.rn = a.rn - 1),
        cnt AS (
          SELECT CAST(SUM(x) AS BIGINT) AS n1,
                 CAST(SUM(1 - x) AS BIGINT) AS n2
          FROM sgn)
        SELECT cnt.n1, cnt.n2, fl.n_flips + 1 AS runs,
               ROUND(CAST(2 AS DOUBLE) * CAST(n1 AS DOUBLE)
                 * CAST(n2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)
                 + CAST(1 AS DOUBLE), 6) AS expected_runs,
               ROUND((CAST(fl.n_flips + 1 AS DOUBLE)
                 - (CAST(2 AS DOUBLE) * CAST(n1 AS DOUBLE)
                    * CAST(n2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE)
                    + CAST(1 AS DOUBLE)))
                 / SQRT(CAST(2 AS DOUBLE) * CAST(n1 AS DOUBLE)
                     * CAST(n2 AS DOUBLE)
                     * (CAST(2 AS DOUBLE) * CAST(n1 AS DOUBLE)
                        * CAST(n2 AS DOUBLE) - CAST(n1 + n2 AS DOUBLE))
                     / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 AS DOUBLE)
                        * (CAST(n1 + n2 AS DOUBLE) - CAST(1 AS DOUBLE)))),
                 6) AS z
        FROM cnt CROSS JOIN fl""")),

    // Hill tail-index estimator for order values: the top-100 order
    // statistics by the distributed global row number (no sort-limit on
    // a single partition), ξ̂ = mean ln(x_i / x_(k+1)) with ln terms on
    // the 12-grid through DECIMAL — the heavy-tail exponent that decides
    // whether mean-based capacity planning is even valid.
    "qb5_hill_tail" -> Q(
      fn = (s, dir) => {
        val ranked = graft.operators.ScaleOps.globalRowNumber(
          t(s, dir, "orders").select(
            col("o_totalprice").cast("double").as("x"), col("o_orderkey")),
          Seq(col("x").desc, col("o_orderkey")), "rn")
          .filter(col("rn") <= 101)
          .localCheckpoint(eager = false)
        val xk = ranked.filter(col("rn") === 101)
          .select(col("x").as("x_threshold"))
        val hill = ranked.filter(col("rn") <= 100)
          .crossJoin(broadcast(xk))
          .select(round(log(col("x") / col("x_threshold")), 12)
            .cast("decimal(28,12)").as("t"), col("x_threshold"))
          .groupBy(col("x_threshold"))
          .agg(count(lit(1)).as("k"), sum(col("t")).as("tsum"))
        hill.select(col("k"), round(col("x_threshold"), 2).as("x_threshold"),
          round(col("tsum").cast("double") / col("k").cast("double"), 6)
            .as("xi_hat"),
          round(col("k").cast("double") / col("tsum").cast("double"), 6)
            .as("alpha_hat"))
      },
      oracle = Some("""
        WITH r AS (
          SELECT CAST(o_totalprice AS DOUBLE) AS x,
                 ROW_NUMBER() OVER (ORDER BY CAST(o_totalprice AS DOUBLE)
                   DESC, o_orderkey) AS rn
          FROM orders),
        xk AS (SELECT x AS x_threshold FROM r WHERE rn = 101),
        h AS (
          SELECT xk.x_threshold, CAST(COUNT(*) AS BIGINT) AS k,
                 SUM(CAST(ROUND(ln(r.x / xk.x_threshold), 12)
                   AS DECIMAL(28,12))) AS tsum
          FROM r CROSS JOIN xk WHERE r.rn <= 100
          GROUP BY 1)
        SELECT k, ROUND(x_threshold, 2) AS x_threshold,
               ROUND(CAST(tsum AS DOUBLE) / CAST(k AS DOUBLE), 6) AS xi_hat,
               ROUND(CAST(k AS DOUBLE) / CAST(tsum AS DOUBLE), 6)
                 AS alpha_hat
        FROM h""")),

    // Haar wavelet energy decomposition of the first 1024 revenue days
    // (rank-indexed, revenue in millions so squared details stay inside
    // the rule-13 digit budget): 5 dyadic levels of pairwise
    // average/difference — division by 2 is EXACT in binary, so the
    // cascade is pure deterministic IEEE — with per-level detail energy
    // summed through DECIMAL. Which timescale carries the variance.
    "qb6_haar_energy" -> Q(
      fn = (s, dir) => {
        val daily = t(s, dir, "orders")
          .groupBy(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP))" +
            " div 86400000").as("day"))
          .agg((sum(col("o_totalprice").cast("decimal(18,2)")) /
            lit(1000000)).cast("decimal(18,8)").as("ym"))
        var x = graft.operators.ScaleOps.globalRowNumber(daily,
            Seq(col("day")), "rn")
          .filter(col("rn") <= 1024)
          .select(col("rn"), col("ym").cast("double").as("x"))
          .localCheckpoint(eager = false)
        val levels = (1 to 5).map { lvl =>
          val odd = x.filter(pmod(col("rn"), lit(2L)) === 1)
            .select(((col("rn") + 1) / 2).cast("long").as("p"),
              col("x").as("xo"))
          val even = x.filter(pmod(col("rn"), lit(2L)) === 0)
            .select((col("rn") / 2).cast("long").as("p"), col("x").as("xe"))
          val paired = odd.join(even, Seq("p"))
            .select(col("p"), ((col("xo") + col("xe")) / lit(2.0)).as("a"),
              ((col("xo") - col("xe")) / lit(2.0)).as("d"))
            .localCheckpoint(eager = false)
          x = paired.select(col("p").as("rn"), col("a").as("x"))
            .localCheckpoint(eager = false)
          paired.agg(count(lit(1)).as("n_coeffs"),
              sum(round(col("d") * col("d"), 6).cast("decimal(28,6)"))
                .as("e"))
            .select(lit(lvl).as("level"), col("n_coeffs"),
              round(col("e").cast("double"), 6).as("detail_energy"))
        }
        levels.reduce(_ unionByName _).orderBy(col("level"))
      },
      oracle = Some {
        val lvls = (1 to 5).map { l =>
          val prev = s"x${l - 1}"
          s""",
        pr$l AS (
          SELECT o.p, (o.xo + e.xe) / CAST(2 AS DOUBLE) AS a,
                 (o.xo - e.xe) / CAST(2 AS DOUBLE) AS d
          FROM (SELECT CAST((rn + 1) / 2 AS BIGINT) AS p, x AS xo
                FROM $prev WHERE rn % 2 = 1) o
          JOIN (SELECT CAST(rn / 2 AS BIGINT) AS p, x AS xe
                FROM $prev WHERE rn % 2 = 0) e ON e.p = o.p),
        x$l AS MATERIALIZED (SELECT p AS rn, a AS x FROM pr$l),
        en$l AS (
          SELECT CAST($l AS INT) AS level, CAST(COUNT(*) AS BIGINT)
                   AS n_coeffs,
                 ROUND(CAST(SUM(CAST(ROUND(d * d, 6) AS DECIMAL(28,6)))
                   AS DOUBLE), 6) AS detail_energy
          FROM pr$l)"""
        }.mkString
        s"""
        WITH daily AS (
          SELECT CAST(epoch_ms(o_orderdate) // 86400000 AS BIGINT) AS day,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                   / 1000000 AS DECIMAL(18,8)) AS ym
          FROM orders GROUP BY 1),
        x0 AS (
          SELECT rn, CAST(ym AS DOUBLE) AS x FROM (
            SELECT ym, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM daily)
          WHERE rn <= 1024)$lvls
        SELECT level, n_coeffs, detail_energy
        FROM (SELECT * FROM en1 UNION ALL SELECT * FROM en2
              UNION ALL SELECT * FROM en3 UNION ALL SELECT * FROM en4
              UNION ALL SELECT * FROM en5)
        ORDER BY level"""
      }),

    // Theil-T inequality of customer spend with the exact between/within
    // nation decomposition — T = T_between + Σ s_g·T_g, the additive
    // property that makes Theil the panel inequality measure (Gini q6m
    // doesn't decompose). ln terms on the 12-grid through DECIMAL; the
    // identity residual is emitted and hash-proven ≡ 0 (the qap
    // discipline).
    "qb7_theil_decomposition" -> Q(
      fn = (s, dir) => {
        val spend = t(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("y"))
          .join(t(s, dir, "customer"),
            col("o_custkey") === col("c_custkey"))
          .select(col("c_nationkey").as("g"), col("o_custkey").as("id"),
            col("y"))
          .localCheckpoint(eager = false)
        val tot = spend.agg(count(lit(1)).as("n"), sum(col("y")).as("sy"))
          .select(col("n"), col("sy"),
            round(col("sy").cast("double") / col("n").cast("double"), 9)
              .as("mu"))
        val terms = spend.crossJoin(broadcast(tot))
          .withColumn("yd", col("y").cast("double"))
          .withColumn("t_i",
            round((col("yd") / col("sy").cast("double")) *
              log(col("yd") / col("mu")), 12).cast("decimal(28,12)"))
        val total = terms.agg(sum(col("t_i")).as("t_all"))
          .select(round(col("t_all").cast("double"), 9).as("theil_total"))
        val grp = spend.groupBy(col("g"))
          .agg(count(lit(1)).as("ng"), sum(col("y")).as("syg"))
          .crossJoin(broadcast(tot))
          .select(col("g"), col("ng"), col("syg"),
            round(col("syg").cast("double") / col("ng").cast("double"), 9)
              .as("mug"),
            round(col("syg").cast("double") / col("sy").cast("double"), 12)
              .as("sg"),
            col("mu"))
        val between = grp
          .withColumn("tb",
            round(col("sg") * log(col("mug") / col("mu")), 12)
              .cast("decimal(28,12)"))
          .agg(sum(col("tb")).as("b"))
          .select(round(col("b").cast("double"), 9).as("theil_between"))
        val within = spend.join(broadcast(grp.select(col("g"), col("syg"),
            col("mug"), col("sg"))), Seq("g"))
          .withColumn("yd", col("y").cast("double"))
          .withColumn("tw",
            round(col("sg") * ((col("yd") / col("syg").cast("double")) *
              log(col("yd") / col("mug"))), 12).cast("decimal(28,12)"))
          .agg(sum(col("tw")).as("w"))
          .select(round(col("w").cast("double"), 9).as("theil_within"))
        total.crossJoin(between).crossJoin(within)
          .select(round(col("theil_total"), 6).as("theil_total"),
            round(col("theil_between"), 6).as("theil_between"),
            round(col("theil_within"), 6).as("theil_within"),
            (round(col("theil_total") -
              (col("theil_between") + col("theil_within")), 6) +
              lit(0.0)).as("identity_residual"))
      },
      oracle = Some("""
        WITH spend AS (
          SELECT c_nationkey AS g, o_custkey AS id, y
          FROM (SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS y
                FROM orders GROUP BY 1) s
          JOIN customer ON o_custkey = c_custkey),
        tot AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(y) AS sy,
                 ROUND(CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
                   AS mu
          FROM spend),
        tt AS (
          SELECT ROUND(CAST(SUM(CAST(ROUND(
                   (CAST(y AS DOUBLE) / CAST(t.sy AS DOUBLE))
                     * ln(CAST(y AS DOUBLE) / t.mu), 12)
                 AS DECIMAL(28,12))) AS DOUBLE), 9) AS theil_total
          FROM spend CROSS JOIN tot t),
        grp AS (
          SELECT g, CAST(COUNT(*) AS BIGINT) AS ng, SUM(y) AS syg,
                 ROUND(CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
                   AS mug,
                 ROUND(CAST(SUM(y) AS DOUBLE) /
                   (SELECT CAST(sy AS DOUBLE) FROM tot), 12) AS sg
          FROM spend GROUP BY 1),
        bt AS (
          SELECT ROUND(CAST(SUM(CAST(ROUND(
                   sg * ln(mug / (SELECT mu FROM tot)), 12)
                 AS DECIMAL(28,12))) AS DOUBLE), 9) AS theil_between
          FROM grp),
        wt AS (
          SELECT ROUND(CAST(SUM(CAST(ROUND(
                   grp.sg * ((CAST(spend.y AS DOUBLE)
                     / CAST(grp.syg AS DOUBLE))
                     * ln(CAST(spend.y AS DOUBLE) / grp.mug)), 12)
                 AS DECIMAL(28,12))) AS DOUBLE), 9) AS theil_within
          FROM spend JOIN grp ON grp.g = spend.g)
        SELECT ROUND(tt.theil_total, 6) AS theil_total,
               ROUND(bt.theil_between, 6) AS theil_between,
               ROUND(wt.theil_within, 6) AS theil_within,
               ROUND(tt.theil_total
                 - (bt.theil_between + wt.theil_within), 6)
                 + CAST(0 AS DOUBLE) AS identity_residual
        FROM tt CROSS JOIN bt CROSS JOIN wt""")),

    // Gumbel block-maxima return levels for daily revenue: weekly maxima
    // → method-of-moments fit (β̂ = s√6/π, μ̂ = m − γβ̂ with the Euler
    // constant as an exact literal) → 52- and 104-week return levels
    // x_T = μ̂ − β̂·ln(−ln(1 − 1/T)) — every link √/÷/ln, no exp, no
    // CDF inversion. The extreme-value twin of qb5's Hill tail.
    "qb8_gumbel_return_levels" -> Q(
      fn = (s, dir) => {
        val daily = t(s, dir, "orders")
          .groupBy(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP))" +
            " div 86400000").as("day"))
          .agg((sum(col("o_totalprice").cast("decimal(18,2)")) /
            lit(1000000)).cast("decimal(14,8)").as("ym"))
        val weekly = daily
          .groupBy((col("day") / 7).cast("long").as("wk"))
          .agg(max(col("ym")).as("m"))
        // m*m stays pure decimal in BOTH engines: Spark widens (14,8)^2 to
        // DECIMAL(29,16) automatically; DuckDB multiplies in the operand's
        // INT64 storage width and overflows at sf0.1 unless the oracle
        // pre-casts each factor to DECIMAL(19,8) (→ INT128, DECIMAL(38,16)).
        // Same exact value either way; crosses to double via VARCHAR bridge.
        val mom = weekly.agg(count(lit(1)).as("n"),
            sum(col("m")).as("sm"),
            sum(col("m") * col("m")).as("smm"))
          .select(col("n"),
            round(col("sm").cast("double") / col("n").cast("double"), 9)
              .as("mean"),
            round(sqrt(greatest(
              col("smm").cast("double") / col("n").cast("double") -
                (col("sm").cast("double") / col("n").cast("double")) *
                (col("sm").cast("double") / col("n").cast("double")),
              lit(0.0))), 9).as("sd"))
        val gamma = 0.5772156649015329
        val pi = math.Pi
        val fitted = mom
          .withColumn("beta", round(col("sd") * sqrt(lit(6.0)) / lit(pi), 9))
          .withColumn("mu", round(col("mean") - lit(gamma) * col("beta"), 9))
        def rl(t: Int) = round(col("mu") - col("beta") *
          log(-log(lit(1.0) - lit(1.0) / lit(t.toDouble))), 6)
        fitted.select(col("n").as("n_weeks"),
          round(col("mu"), 6).as("gumbel_mu"),
          round(col("beta"), 6).as("gumbel_beta"),
          rl(52).as("rl_52w"), rl(104).as("rl_104w"))
      },
      oracle = Some(s"""
        WITH daily AS (
          SELECT CAST(epoch_ms(o_orderdate) // 86400000 AS BIGINT) AS day,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                   / 1000000 AS DECIMAL(14,8)) AS ym
          FROM orders GROUP BY 1),
        weekly AS (
          SELECT CAST(day // 7 AS BIGINT) AS wk, MAX(ym) AS m
          FROM daily GROUP BY 1),
        mom AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 ROUND(CAST(SUM(m) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
                   AS mean,
                 ROUND(SQRT(GREATEST(
                   CAST(CAST(SUM(CAST(m AS DECIMAL(19,8))
                     * CAST(m AS DECIMAL(19,8))) AS VARCHAR) AS DOUBLE)
                     / CAST(COUNT(*) AS DOUBLE)
                     - (CAST(SUM(m) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE))
                       * (CAST(SUM(m) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)),
                   CAST(0 AS DOUBLE))), 9) AS sd
          FROM weekly),
        fit AS (
          SELECT *,
                 ROUND(sd * SQRT(CAST(6 AS DOUBLE))
                   / ${math.Pi}, 9) AS beta
          FROM mom),
        fit2 AS (
          SELECT *, ROUND(mean - CAST(0.5772156649015329 AS DOUBLE) * beta, 9) AS mu
          FROM fit)
        SELECT n AS n_weeks, ROUND(mu, 6) AS gumbel_mu,
               ROUND(beta, 6) AS gumbel_beta,
               ROUND(mu - beta * ln(-ln(CAST(1 AS DOUBLE)
                 - CAST(1 AS DOUBLE) / CAST(52 AS DOUBLE))), 6) AS rl_52w,
               ROUND(mu - beta * ln(-ln(CAST(1 AS DOUBLE)
                 - CAST(1 AS DOUBLE) / CAST(104 AS DOUBLE))), 6) AS rl_104w
        FROM fit2""")),

    // Yule-Walker AR(2) fit of the daily revenue series (thousands, the
    // qb3 scaling) from the EXACT lag-1/lag-2 autocorrelations:
    // phi1 = r1(1-r2)/(1-r1^2), phi2 = (r2-r1^2)/(1-r1^2), the innovation
    // variance ratio 1 - phi1*r1 - phi2*r2, and 3-step-ahead forecasts
    // recursed from the last two centered observations — every link
    // *,-,/ on the 9-grid, the algebraic-only contract. The model-fitting
    // closure of the qb3 diagnostic (Ljung-Box tells you there IS serial
    // structure; this fits it).
    "qb9_yule_walker_ar2" -> Q(
      fn = (s, dir) => {
        val daily = t(s, dir, "orders")
          .groupBy(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP))" +
            " div 86400000").as("day"))
          .agg((sum(col("o_totalprice").cast("decimal(18,2)")) /
            lit(1000)).cast("decimal(18,5)").as("yk"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(daily,
          Seq(col("day")), "rn").localCheckpoint(eager = false)
        val stats = ranked.agg(count(lit(1)).as("n"), sum(col("yk")).as("sy"))
          .select(col("n"),
            round(col("sy").cast("double") / col("n").cast("double"), 9)
              .as("mu"))
        val centered = ranked.crossJoin(broadcast(stats))
          .select(col("rn"), (col("yk").cast("double") - col("mu")).as("c"),
            col("n"), col("mu"))
          .localCheckpoint(eager = false)
        val denom = centered.agg(
          sum(round(col("c") * col("c"), 6).cast("decimal(28,6)")).as("d0"))
        val nums = Seq(1, 2).map { k =>
          centered.select(col("rn"), col("c").as("ca"))
            .join(centered.select((col("rn") - k).as("rn"), col("c").as("cb")),
              Seq("rn"))
            .agg(sum(round(col("ca") * col("cb"), 6).cast("decimal(28,6)"))
              .as("num"))
            .select(lit(k).as("lag"), col("num"))
        }.reduce(_ unionByName _)
        val rs = nums.crossJoin(broadcast(denom))
          .groupBy()
          .agg(
            max(when(col("lag") === 1,
              round(col("num").cast("double") / col("d0").cast("double"), 9)))
              .as("r1"),
            max(when(col("lag") === 2,
              round(col("num").cast("double") / col("d0").cast("double"), 9)))
              .as("r2"))
        val fit = rs
          .withColumn("den", round(lit(1.0) - col("r1") * col("r1"), 9))
          .withColumn("phi1",
            round(col("r1") * (lit(1.0) - col("r2")) / col("den"), 9))
          .withColumn("phi2",
            round((col("r2") - col("r1") * col("r1")) / col("den"), 9))
          .withColumn("ivr",
            round(lit(1.0) - col("phi1") * col("r1") -
              col("phi2") * col("r2"), 9))
        val last = centered.agg(
          max(when(col("rn") === col("n"), col("c"))).as("cn"),
          max(when(col("rn") === col("n") - 1, col("c"))).as("cn1"),
          first(col("n")).as("n"), first(col("mu")).as("mu"))
        fit.crossJoin(broadcast(last))
          .withColumn("f1",
            round(col("phi1") * col("cn") + col("phi2") * col("cn1"), 9))
          .withColumn("f2",
            round(col("phi1") * col("f1") + col("phi2") * col("cn"), 9))
          .withColumn("f3",
            round(col("phi1") * col("f2") + col("phi2") * col("f1"), 9))
          .select(col("n"),
            round(col("r1"), 6).as("acf1"), round(col("r2"), 6).as("acf2"),
            round(col("phi1"), 6).as("phi1"), round(col("phi2"), 6).as("phi2"),
            round(col("ivr"), 6).as("innovation_ratio"),
            round(col("mu") + col("f1"), 6).as("fc_1"),
            round(col("mu") + col("f2"), 6).as("fc_2"),
            round(col("mu") + col("f3"), 6).as("fc_3"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT CAST(epoch_ms(o_orderdate) // 86400000 AS BIGINT) AS day,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                   / 1000 AS DECIMAL(18,5)) AS yk
          FROM orders GROUP BY 1),
        r AS (
          SELECT yk, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM daily),
        st AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 ROUND(CAST(SUM(yk) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
                   AS mu
          FROM r),
        c AS (
          SELECT rn, CAST(yk AS DOUBLE) - st.mu AS c, st.n, st.mu
          FROM r CROSS JOIN st),
        d0 AS (
          SELECT SUM(CAST(ROUND(c * c, 6) AS DECIMAL(28,6))) AS d0 FROM c),
        lagt AS (SELECT CAST(UNNEST(range(1, 3)) AS BIGINT) AS lag),
        nums AS (
          SELECT l.lag,
                 SUM(CAST(ROUND(a.c * b.c, 6) AS DECIMAL(28,6))) AS num
          FROM lagt l
          JOIN c a ON TRUE
          JOIN c b ON b.rn = a.rn + l.lag
          GROUP BY 1),
        rs AS (
          SELECT
            MAX(CASE WHEN lag = 1 THEN ROUND(CAST(num AS DOUBLE)
              / CAST(d0.d0 AS DOUBLE), 9) END) AS r1,
            MAX(CASE WHEN lag = 2 THEN ROUND(CAST(num AS DOUBLE)
              / CAST(d0.d0 AS DOUBLE), 9) END) AS r2
          FROM nums CROSS JOIN d0),
        fit AS (
          SELECT r1, r2,
                 ROUND(CAST(1 AS DOUBLE) - r1 * r1, 9) AS den
          FROM rs),
        fit2 AS (
          SELECT *,
                 ROUND(r1 * (CAST(1 AS DOUBLE) - r2) / den, 9) AS phi1,
                 ROUND((r2 - r1 * r1) / den, 9) AS phi2
          FROM fit),
        fit3 AS (
          SELECT *,
                 ROUND(CAST(1 AS DOUBLE) - phi1 * r1 - phi2 * r2, 9) AS ivr
          FROM fit2),
        lastv AS (
          SELECT MAX(CASE WHEN rn = n THEN c END) AS cn,
                 MAX(CASE WHEN rn = n - 1 THEN c END) AS cn1,
                 MAX(n) AS n, MAX(mu) AS mu
          FROM c),
        f1t AS (
          SELECT *, ROUND(phi1 * cn + phi2 * cn1, 9) AS f1
          FROM fit3 CROSS JOIN lastv),
        f2t AS (SELECT *, ROUND(phi1 * f1 + phi2 * cn, 9) AS f2 FROM f1t),
        f3t AS (SELECT *, ROUND(phi1 * f2 + phi2 * f1, 9) AS f3 FROM f2t)
        SELECT n,
               ROUND(r1, 6) + CAST(0 AS DOUBLE) AS acf1,
               ROUND(r2, 6) + CAST(0 AS DOUBLE) AS acf2,
               ROUND(phi1, 6) + CAST(0 AS DOUBLE) AS phi1,
               ROUND(phi2, 6) + CAST(0 AS DOUBLE) AS phi2,
               ROUND(ivr, 6) + CAST(0 AS DOUBLE) AS innovation_ratio,
               ROUND(mu + f1, 6) + CAST(0 AS DOUBLE) AS fc_1,
               ROUND(mu + f2, 6) + CAST(0 AS DOUBLE) AS fc_2,
               ROUND(mu + f3, 6) + CAST(0 AS DOUBLE) AS fc_3
        FROM f3t"""))
,

    // Harmonic centrality of a bounded seed set over the %400 link graph
    // (the closeness variant defined on disconnected graphs) — the
    // source-tagged multi-source BFS of GraphOps.harmonicCentrality, 1/d
    // terms summed through DECIMAL(28,12) on the 12-grid so the
    // recursive-CTE oracle walks identical doubles. total_dist stays an
    // exact integer (closeness' denominator over the reached set).
    "qba_harmonic_centrality" -> Q(
      fn = (s, dir) => {
        val edges = t(s, dir, "orders").select(
          (col("o_custkey") % 400).cast("long").as("src"),
          (col("o_orderkey") % 400).cast("long").as("dst"))
        val seeds = s.range(0, 10).select(col("id").as("node"))
        graft.operators.GraphOps.harmonicCentrality(edges, seeds, maxHops = 4)
          .orderBy(col("node"))
      },
      oracle = Some("""
        WITH RECURSIVE edges AS MATERIALIZED (
          SELECT DISTINCT CAST(o_custkey % 400 AS BIGINT) AS src,
                          CAST(o_orderkey % 400 AS BIGINT) AS dst
          FROM orders WHERE o_custkey % 400 <> o_orderkey % 400),
        walk(source, node, dist) AS (
          SELECT CAST(range AS BIGINT), CAST(range AS BIGINT),
                 CAST(0 AS BIGINT)
          FROM range(0, 10)
          UNION
          SELECT w.source, e.dst, w.dist + 1
          FROM walk w JOIN edges e ON e.src = w.node
          WHERE w.dist < 4),
        md AS (SELECT source, node, MIN(dist) AS dist FROM walk GROUP BY 1, 2)
        SELECT source AS node,
               CAST(COUNT(*) AS BIGINT) AS reached,
               CAST(SUM(dist) AS BIGINT) AS total_dist,
               ROUND(CAST(SUM(CAST(ROUND(
                 CAST(1 AS DOUBLE) / CAST(dist AS DOUBLE), 12)
                 AS DECIMAL(28,12))) AS DOUBLE), 6) AS harmonic
        FROM md WHERE dist > 0
        GROUP BY 1 ORDER BY 1""")),

    // Bounded-radius Brandes betweenness from 8 sources over the %400
    // graph: forward BFS levels carry exact BIGINT path counts σ, the
    // backward sweep δ(v) = Σ (σv/σw)(1+δw) over tight edges rides
    // 12-grid terms through DECIMAL(28,12) snapped to the 9-grid per
    // level — so the 3-level unrolled oracle replays identical doubles.
    // Sources excluded per Brandes; the depth-3 truncation frontier is
    // excluded as not-fully-accumulated.
    "qbb_betweenness" -> Q(
      fn = (s, dir) => {
        val edges = t(s, dir, "orders").select(
          (col("o_custkey") % 400).cast("long").as("src"),
          (col("o_orderkey") % 400).cast("long").as("dst"))
        val sources = s.range(0, 8).select(col("id").as("node"))
        graft.operators.GraphOps.betweennessFromSources(edges, sources,
            maxDepth = 3)
          .orderBy(col("node"))
      },
      headline = true,
      oracle = Some("""
        WITH edges AS MATERIALIZED (
          SELECT DISTINCT CAST(o_custkey % 400 AS BIGINT) AS src,
                          CAST(o_orderkey % 400 AS BIGINT) AS dst
          FROM orders WHERE o_custkey % 400 <> o_orderkey % 400),
        l0 AS MATERIALIZED (
          SELECT CAST(range AS BIGINT) AS source, CAST(range AS BIGINT) AS node,
                 CAST(1 AS BIGINT) AS sigma
          FROM range(0, 8)),
        l1 AS MATERIALIZED (
          SELECT l0.source, e.dst AS node, CAST(SUM(l0.sigma) AS BIGINT) AS sigma
          FROM l0 JOIN edges e ON e.src = l0.node
          WHERE NOT EXISTS (SELECT 1 FROM l0 v
                            WHERE v.source = l0.source AND v.node = e.dst)
          GROUP BY 1, 2),
        l2 AS MATERIALIZED (
          SELECT l1.source, e.dst AS node, CAST(SUM(l1.sigma) AS BIGINT) AS sigma
          FROM l1 JOIN edges e ON e.src = l1.node
          WHERE NOT EXISTS (SELECT 1 FROM l0 v
                            WHERE v.source = l1.source AND v.node = e.dst)
            AND NOT EXISTS (SELECT 1 FROM l1 v
                            WHERE v.source = l1.source AND v.node = e.dst)
          GROUP BY 1, 2),
        l3 AS MATERIALIZED (
          SELECT l2.source, e.dst AS node, CAST(SUM(l2.sigma) AS BIGINT) AS sigma
          FROM l2 JOIN edges e ON e.src = l2.node
          WHERE NOT EXISTS (SELECT 1 FROM l0 v
                            WHERE v.source = l2.source AND v.node = e.dst)
            AND NOT EXISTS (SELECT 1 FROM l1 v
                            WHERE v.source = l2.source AND v.node = e.dst)
            AND NOT EXISTS (SELECT 1 FROM l2 v
                            WHERE v.source = l2.source AND v.node = e.dst)
          GROUP BY 1, 2),
        d3 AS MATERIALIZED (
          SELECT source, node, sigma, CAST(0 AS DOUBLE) AS delta FROM l3),
        d2 AS MATERIALIZED (
          SELECT l2.source, l2.node, l2.sigma,
                 ROUND(COALESCE(CAST(SUM(CAST(ROUND(
                   CAST(l2.sigma AS DOUBLE) / CAST(w.sigma AS DOUBLE)
                     * (CAST(1 AS DOUBLE) + w.delta), 12)
                   AS DECIMAL(28,12))) AS DOUBLE), CAST(0 AS DOUBLE)), 9)
                   AS delta
          FROM l2
          LEFT JOIN edges e ON e.src = l2.node
          LEFT JOIN d3 w ON w.source = l2.source AND w.node = e.dst
          GROUP BY 1, 2, 3),
        d1 AS MATERIALIZED (
          SELECT l1.source, l1.node, l1.sigma,
                 ROUND(COALESCE(CAST(SUM(CAST(ROUND(
                   CAST(l1.sigma AS DOUBLE) / CAST(w.sigma AS DOUBLE)
                     * (CAST(1 AS DOUBLE) + w.delta), 12)
                   AS DECIMAL(28,12))) AS DOUBLE), CAST(0 AS DOUBLE)), 9)
                   AS delta
          FROM l1
          LEFT JOIN edges e ON e.src = l1.node
          LEFT JOIN d2 w ON w.source = l1.source AND w.node = e.dst
          GROUP BY 1, 2, 3)
        SELECT node,
               ROUND(CAST(SUM(CAST(delta AS DECIMAL(28,9))) AS DOUBLE), 6)
                 AS betweenness
        FROM (SELECT * FROM d1 UNION ALL SELECT * FROM d2) u
        GROUP BY 1 ORDER BY 1""")),

    // Permutation entropy (Bandt-Pompe, order 3) of the daily revenue
    // series: each consecutive triple maps to its ordinal pattern (ranks
    // with the stable earlier-index tie-break — pure DECIMAL comparisons,
    // exact in both engines), pattern frequencies feed H = -Σ p·ln p on
    // the 12-grid, normalized by ln 6. The complexity measure that is
    // invariant to monotone transforms of the series.
    "qbc_permutation_entropy" -> Q(
      fn = (s, dir) => {
        val daily = t(s, dir, "orders")
          .groupBy(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP))" +
            " div 86400000").as("day"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("yk"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(daily,
          Seq(col("day")), "rn").localCheckpoint(eager = false)
        val t0 = ranked.select(col("rn"), col("yk").as("y0"))
        val t1 = ranked.select((col("rn") - 1).as("rn"), col("yk").as("y1"))
        val t2 = ranked.select((col("rn") - 2).as("rn"), col("yk").as("y2"))
        val coded = t0.join(t1, Seq("rn")).join(t2, Seq("rn"))
          .select((
            ((col("y1") < col("y0")).cast("int") +
             (col("y2") < col("y0")).cast("int")) * 9 +
            ((col("y0") <= col("y1")).cast("int") +
             (col("y2") < col("y1")).cast("int")) * 3 +
            ((col("y0") <= col("y2")).cast("int") +
             (col("y1") <= col("y2")).cast("int"))).as("code"))
        val hist = coded.groupBy(col("code")).agg(count(lit(1)).as("cnt"))
        val tot = hist.agg(sum(col("cnt")).as("n"), count(lit(1)).as("k"))
        hist.crossJoin(broadcast(tot))
          .select(col("code"), col("cnt"), col("n"), col("k"),
            round(col("cnt").cast("double") / col("n").cast("double") *
              log(col("cnt").cast("double") / col("n").cast("double")), 12)
              .cast("decimal(28,12)").as("term"))
          .groupBy(col("n"), col("k"))
          .agg(sum(col("term")).as("hsum"),
            min(struct((-col("cnt")).as("nc"), col("code").as("c"))).as("w"),
            max(col("cnt")).as("maxc"))
          .select(col("n").as("n_triples"), col("k").as("distinct_patterns"),
            round(-col("hsum").cast("double"), 6).as("h_nats"),
            round(-col("hsum").cast("double") / log(lit(6.0)), 6).as("h_norm"),
            col("w.c").as("modal_code"),
            round(col("maxc").cast("double") / col("n").cast("double"), 6)
              .as("modal_share"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT CAST(epoch_ms(o_orderdate) // 86400000 AS BIGINT) AS day,
                 SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS yk
          FROM orders GROUP BY 1),
        r AS (SELECT yk, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM daily),
        tri AS (
          SELECT a.yk AS y0, b.yk AS y1, c.yk AS y2
          FROM r a JOIN r b ON b.rn = a.rn + 1 JOIN r c ON c.rn = a.rn + 2),
        coded AS (
          SELECT (CAST(y1 < y0 AS INT) + CAST(y2 < y0 AS INT)) * 9
               + (CAST(y0 <= y1 AS INT) + CAST(y2 < y1 AS INT)) * 3
               + (CAST(y0 <= y2 AS INT) + CAST(y1 <= y2 AS INT)) AS code
          FROM tri),
        hist AS (SELECT code, CAST(COUNT(*) AS BIGINT) AS cnt
                 FROM coded GROUP BY 1),
        tot AS (SELECT CAST(SUM(cnt) AS BIGINT) AS n,
                       CAST(COUNT(*) AS BIGINT) AS k FROM hist),
        terms AS (
          SELECT hist.code, hist.cnt, t.n, t.k,
                 CAST(ROUND(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE)
                   * ln(CAST(cnt AS DOUBLE) / CAST(n AS DOUBLE)), 12)
                   AS DECIMAL(28,12)) AS term
          FROM hist CROSS JOIN tot t)
        SELECT n AS n_triples, k AS distinct_patterns,
               ROUND(-CAST(SUM(term) AS DOUBLE), 6) AS h_nats,
               ROUND(-CAST(SUM(term) AS DOUBLE) / ln(CAST(6 AS DOUBLE)), 6)
                 AS h_norm,
               MIN({'nc': -cnt, 'c': code})['c'] AS modal_code,
               ROUND(CAST(MAX(cnt) AS DOUBLE) / CAST(n AS DOUBLE), 6)
                 AS modal_share
        FROM terms GROUP BY 1, 2""")),

    // Engle-Granger cointegration of region-0 vs region-1 monthly revenue
    // (millions): step-1 OLS in closed form from DECIMAL moments, step-2
    // Dickey-Fuller on the 9-grid residuals — γ̂ from exact 6-grid
    // cross-products, the t-statistic through one sqrt. Every float link
    // algebraic; the verdict is a fixed-threshold comparison on the
    // shared double.
    "qbd_engle_granger" -> Q(
      fn = (s, dir) => {
        val rev = t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_regionkey").as("rg"),
            expr("unix_millis(CAST(o_orderdate AS TIMESTAMP))" +
              " div 86400000 div 30").as("mo"))
          .agg((sum(col("o_totalprice").cast("decimal(18,2)")) /
            lit(1000000)).cast("decimal(14,8)").as("v"))
        val pair = rev.filter(col("rg") === 0).select(col("mo"), col("v").as("x"))
          .join(rev.filter(col("rg") === 1).select(col("mo"), col("v").as("y")),
            Seq("mo"))
          .localCheckpoint(eager = false)
        val mom = pair.agg(count(lit(1)).as("n"),
          sum(col("x")).as("sx"), sum(col("y")).as("sy"),
          sum(round(col("x") * col("x"), 6).cast("decimal(28,6)")).as("sxx"),
          sum(round(col("x") * col("y"), 6).cast("decimal(28,6)")).as("sxy"))
        val fit = mom
          .withColumn("nd", col("n").cast("double"))
          .withColumn("beta", round(
            (col("nd") * col("sxy").cast("double") -
              col("sx").cast("double") * col("sy").cast("double")) /
            (col("nd") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")), 9))
          .withColumn("alpha", round((col("sy").cast("double") -
            col("beta") * col("sx").cast("double")) / col("nd"), 9))
        val resid = pair.crossJoin(broadcast(
            fit.select(col("n"), col("beta"), col("alpha"))))
          .select(col("mo"),
            round(col("y").cast("double") - col("alpha") -
              col("beta") * col("x").cast("double"), 9).as("e"),
            col("n"), col("beta"), col("alpha"))
        val rr = graft.operators.ScaleOps.globalRowNumber(resid,
          Seq(col("mo")), "rn").localCheckpoint(eager = false)
        val dif = rr.select(col("rn"), col("e").as("e1"), col("n"),
            col("beta"), col("alpha"))
          .join(rr.select((col("rn") - 1).as("rn"), col("e").as("e0")),
            Seq("rn"))
          .withColumn("de", round(col("e0") - col("e1"), 9))
        val g = dif.agg(first(col("n")).as("n"), first(col("beta")).as("beta"),
            first(col("alpha")).as("alpha"), count(lit(1)).as("m"),
            sum(round(col("e1") * col("de"), 6).cast("decimal(28,6)"))
              .as("sed"),
            sum(round(col("e1") * col("e1"), 6).cast("decimal(28,6)"))
              .as("see"))
          .withColumn("gamma",
            round(col("sed").cast("double") / col("see").cast("double"), 9))
        val ssu = dif.crossJoin(broadcast(g.select(col("gamma").as("gm"))))
          .agg(sum(round((col("de") - col("gm") * col("e1")) *
            (col("de") - col("gm") * col("e1")), 6).cast("decimal(28,6)"))
            .as("ssu"))
        g.crossJoin(broadcast(ssu))
          .withColumn("sev", round(sqrt(
            (col("ssu").cast("double") /
              (col("m").cast("double") - lit(1.0))) /
            col("see").cast("double")), 9))
          .select(col("n").as("n_months"), col("m").as("n_diffs"),
            round(col("beta"), 6).as("beta"),
            round(col("alpha"), 6).as("alpha"),
            round(col("gamma"), 6).as("gamma"),
            round(col("gamma") / col("sev"), 6).as("df_stat"),
            when(col("gamma") / col("sev") < lit(-2.86), lit(1))
              .otherwise(lit(0)).as("cointegrated"))
      },
      oracle = Some("""
        WITH rev AS (
          SELECT n_regionkey AS rg,
                 CAST(epoch_ms(o_orderdate) // 86400000 // 30 AS BIGINT) AS mo,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) / 1000000
                   AS DECIMAL(14,8)) AS v
          FROM orders JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          GROUP BY 1, 2),
        pair AS MATERIALIZED (
          SELECT a.mo, a.v AS x, b.v AS y
          FROM rev a JOIN rev b ON a.mo = b.mo AND a.rg = 0 AND b.rg = 1),
        mom AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
                 SUM(CAST(ROUND(CAST(x AS DECIMAL(19,8))
                   * CAST(x AS DECIMAL(19,8)), 6) AS DECIMAL(28,6))) AS sxx,
                 SUM(CAST(ROUND(CAST(x AS DECIMAL(19,8))
                   * CAST(y AS DECIMAL(19,8)), 6) AS DECIMAL(28,6))) AS sxy
          FROM pair),
        f1 AS (
          SELECT n, CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
                 CAST(sy AS DOUBLE) AS syd, CAST(sxx AS DOUBLE) AS sxxd,
                 CAST(sxy AS DOUBLE) AS sxyd
          FROM mom),
        f2 AS (SELECT *, ROUND((nd * sxyd - sxd * syd)
                 / (nd * sxxd - sxd * sxd), 9) AS beta FROM f1),
        f3 AS (SELECT *, ROUND((syd - beta * sxd) / nd, 9) AS alpha FROM f2),
        resid AS MATERIALIZED (
          SELECT p.mo,
                 ROUND(CAST(p.y AS DOUBLE) - f3.alpha
                   - f3.beta * CAST(p.x AS DOUBLE), 9) AS e,
                 f3.n, f3.beta, f3.alpha
          FROM pair p CROSS JOIN f3),
        rr AS (SELECT *, ROW_NUMBER() OVER (ORDER BY mo) AS rn FROM resid),
        dif AS MATERIALIZED (
          SELECT a.e AS e1, ROUND(b.e - a.e, 9) AS de, a.n, a.beta, a.alpha
          FROM rr a JOIN rr b ON b.rn = a.rn + 1),
        g AS (
          SELECT MAX(n) AS n, MAX(beta) AS beta, MAX(alpha) AS alpha,
                 CAST(COUNT(*) AS BIGINT) AS m,
                 SUM(CAST(ROUND(e1 * de, 6) AS DECIMAL(28,6))) AS sed,
                 SUM(CAST(ROUND(e1 * e1, 6) AS DECIMAL(28,6))) AS see
          FROM dif),
        g2 AS (SELECT *, ROUND(CAST(sed AS DOUBLE) / CAST(see AS DOUBLE), 9)
                 AS gamma FROM g),
        uu AS (
          SELECT SUM(CAST(ROUND((de - g2.gamma * e1) * (de - g2.gamma * e1),
                   6) AS DECIMAL(28,6))) AS ssu
          FROM dif CROSS JOIN g2),
        se AS (
          SELECT g2.*, uu.ssu,
                 ROUND(SQRT((CAST(uu.ssu AS DOUBLE)
                   / (CAST(g2.m AS DOUBLE) - CAST(1 AS DOUBLE)))
                   / CAST(g2.see AS DOUBLE)), 9) AS sev
          FROM g2 CROSS JOIN uu)
        SELECT n AS n_months, m AS n_diffs,
               ROUND(beta, 6) + CAST(0 AS DOUBLE) AS beta,
               ROUND(alpha, 6) + CAST(0 AS DOUBLE) AS alpha,
               ROUND(gamma, 6) + CAST(0 AS DOUBLE) AS gamma,
               ROUND(gamma / sev, 6) + CAST(0 AS DOUBLE) AS df_stat,
               CASE WHEN gamma / sev < CAST(-2.86 AS DOUBLE) THEN 1 ELSE 0 END
                 AS cointegrated
        FROM se""")),

    // Croston's method for intermittent per-brand demand: smooth demand
    // SIZE and inter-demand INTERVAL separately over the nonzero points
    // (plain smoothing decays to zero between spikes and under-forecasts)
    // — Forecast.croston's pinned seed convention, 9-snap-per-step fold,
    // Syntetos-Boylan 0.75·z/p bias correction. Oracle mirrors the fold
    // with a LIST accumulator (the q7d list_reduce finding).
    "qbe_croston_demand" -> Q(
      fn = (s, dir) => {
        val d = t(s, dir, "lineitem")
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand").as("brand"),
            expr("unix_millis(CAST(l_shipdate AS TIMESTAMP))" +
              " div 86400000").as("day"))
          .agg(sum(col("l_quantity")).as("q"))
        graft.operators.Forecast.croston(d, "brand", "day", "q")
          .orderBy(col("brand"))
      },
      oracle = Some("""
        WITH d AS (
          SELECT p_brand AS brand,
                 CAST(epoch_ms(l_shipdate) // 86400000 AS BIGINT) AS day,
                 SUM(l_quantity) AS q
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY 1, 2),
        s AS (
          SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_points,
                 list(day ORDER BY day) AS ds,
                 list(CAST(q AS DOUBLE) ORDER BY day) AS zs
          FROM d WHERE q > 0 GROUP BY 1),
        f AS (
          SELECT brand, n_points,
                 list_reduce(
                   list_prepend([zs[1], CAST(ds[2] - ds[1] AS DOUBLE)],
                     list_transform(range(2, n_points + 1),
                       i -> [zs[i], CAST(ds[i] - ds[i-1] AS DOUBLE)])),
                   (acc, e) -> [
                     ROUND(CAST(0.5 AS DOUBLE) * e[1]
                       + CAST(0.5 AS DOUBLE) * acc[1], 9),
                     ROUND(CAST(0.5 AS DOUBLE) * e[2]
                       + CAST(0.5 AS DOUBLE) * acc[2], 9)]) AS st
          FROM s WHERE n_points >= 2)
        SELECT brand, n_points,
               ROUND(st[1], 6) AS z_level,
               ROUND(st[2], 6) AS p_interval,
               ROUND(st[1] / st[2], 6) AS croston,
               ROUND(CAST(0.75 AS DOUBLE) * st[1] / st[2], 6) AS sba
        FROM f ORDER BY brand""")),

    // Two-cohort log-rank test on conversion survival (q7a's subjects,
    // arms split by user-id parity — the q7c assignment): per event time
    // the hypergeometric O−E and variance, censoring handled properly —
    // the test a t-test on observed durations gets wrong the moment
    // anyone is still alive at the boundary. Survival.logRank's
    // aggregated-life-table windows; algebraic links only.
    "qbf_logrank" -> Q(
      fn = (s, dir) => {
        val e = Tables(s, dir, "events")
          .withColumn("ts_ms", unix_millis(col("ts")))
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
          .select((col("user_id") % 2).cast("int").as("arm"),
            when(col("te").isNotNull, expr("(te - t0) div 86400000"))
              .otherwise(expr("(__tmax - t0) div 86400000")).as("duration"),
            when(col("te").isNotNull, 1).otherwise(0).as("event"))
        graft.operators.Survival.logRank(subjects, "duration", "event", "arm")
      },
      oracle = Some("""
        WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms
                   FROM events),
        v0 AS (SELECT user_id, MIN(ts_ms) AS t0 FROM e
               WHERE event_type = 'view' GROUP BY 1),
        te AS (SELECT e.user_id, MIN(e.ts_ms) AS te
               FROM e JOIN v0 USING (user_id)
               WHERE e.event_type = 'purchase' AND e.ts_ms >= v0.t0
               GROUP BY 1),
        hz AS (SELECT MAX(ts_ms) AS tmax FROM e),
        subj AS (
          SELECT CAST(v0.user_id % 2 AS INT) AS arm,
                 CASE WHEN te.te IS NOT NULL
                      THEN (te.te - v0.t0) // 86400000
                      ELSE (hz.tmax - v0.t0) // 86400000 END AS dur,
                 CASE WHEN te.te IS NOT NULL THEN 1 ELSE 0 END AS ev
          FROM v0 LEFT JOIN te ON v0.user_id = te.user_id CROSS JOIN hz),
        byt AS (
          SELECT dur AS t,
                 CAST(SUM(CASE WHEN arm = 0 THEN ev ELSE 0 END) AS BIGINT)
                   AS d1,
                 CAST(SUM(CASE WHEN arm = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS x1,
                 CAST(SUM(ev) AS BIGINT) AS d,
                 CAST(COUNT(*) AS BIGINT) AS x
          FROM subj GROUP BY 1),
        w AS (
          SELECT t, d1, d,
                 CAST(SUM(x1) OVER ()
                   - COALESCE(SUM(x1) OVER (ORDER BY t ROWS BETWEEN
                       UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                   AS n1,
                 CAST(SUM(x) OVER ()
                   - COALESCE(SUM(x) OVER (ORDER BY t ROWS BETWEEN
                       UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
                   AS n
          FROM byt),
        terms AS (
          SELECT t, d1, d,
                 CAST(ROUND(CAST(d1 AS DOUBLE)
                   - ROUND(CAST(d AS DOUBLE) * CAST(n1 AS DOUBLE)
                       / CAST(n AS DOUBLE), 9), 9) AS DECIMAL(28,9)) AS oe,
                 CASE WHEN n > 1 THEN
                   CAST(ROUND(CAST(d AS DOUBLE)
                     * (CAST(n1 AS DOUBLE) / CAST(n AS DOUBLE))
                     * (CAST(n - n1 AS DOUBLE) / CAST(n AS DOUBLE))
                     * (CAST(n - d AS DOUBLE) / CAST(n - 1 AS DOUBLE)), 12)
                   AS DECIMAL(28,12)) END AS vt
          FROM w)
        SELECT CAST(COUNT(*) AS BIGINT) AS n_times,
               CAST(SUM(d1) AS BIGINT) AS deaths_a,
               CAST(SUM(d - d1) AS BIGINT) AS deaths_b,
               ROUND(CAST(SUM(oe) AS DOUBLE), 6) + CAST(0 AS DOUBLE)
                 AS o_minus_e,
               ROUND(CAST(SUM(vt) AS DOUBLE), 6) AS variance,
               ROUND(CAST(SUM(oe) AS DOUBLE)
                 / SQRT(CAST(SUM(vt) AS DOUBLE)), 6) + CAST(0 AS DOUBLE) AS z,
               ROUND(CAST(SUM(oe) AS DOUBLE) * CAST(SUM(oe) AS DOUBLE)
                 / CAST(SUM(vt) AS DOUBLE), 6) AS chi2
        FROM terms""")),

    // Benjamini-Hochberg FDR over per-nation mean-price screens with
    // DISTRIBUTION-FREE Chebyshev p-bounds: p_i = min(1, 1/z_i²) is a
    // valid (conservative) p-value bound requiring no normality — the
    // honest way to BH-correct when the test statistic's null law is
    // unknown (erf/Φ is also not cross-engine-reproducible). Step-up:
    // reject ranks 1..k* where k* = max{k : p_(k) ≤ k·α/m}, α = 0.5.
    // Moments in exact DECIMAL; the price-square sum crosses to double
    // over the VARCHAR bridge (rule 13).
    "qbg_bh_fdr" -> Q(
      fn = (s, dir) => {
        val o = t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .select(col("c_nationkey").as("nation"),
            col("o_totalprice").cast("decimal(18,2)").as("p"))
        val g = o.agg(count(lit(1)).as("n"), sum(col("p")).as("sy"),
            sum(col("p") * col("p")).as("syy"))
          .select(col("n"), col("syy"),
            round(col("sy").cast("double") / col("n").cast("double"), 9)
              .as("m0"))
          .select(col("n"), col("m0"),
            ((col("syy").cast("double") -
              col("n").cast("double") * col("m0") * col("m0")) /
              (col("n") - 1).cast("double")).as("s2"))
        val per = o.groupBy(col("nation"))
          .agg(count(lit(1)).as("n_orders"), sum(col("p")).as("syi"))
          .crossJoin(broadcast(g))
          .withColumn("mi",
            round(col("syi").cast("double") / col("n_orders").cast("double"),
              9))
          .withColumn("zf", (col("mi") - col("m0")) /
            sqrt(col("s2") / col("n_orders").cast("double")))
          .withColumn("p_cheb",
            least(lit(1.0), lit(1.0) / (col("zf") * col("zf"))))
        val m = lit(25.0)
        val ranked = per.withColumn("rnk",
          row_number().over(Window.orderBy(col("p_cheb"), col("nation"))))
          .withColumn("thr",
            col("rnk").cast("double") * lit(0.5) / m)
        val kstar = ranked.agg(
          max(when(col("p_cheb") <= col("thr"), col("rnk"))).as("k"))
        ranked.crossJoin(broadcast(kstar))
          .select(col("nation"), col("n_orders"),
            round(col("mi"), 6).as("mean_price"),
            round(col("zf"), 6).as("z"),
            round(col("p_cheb"), 6).as("p_cheb"),
            col("rnk"), round(col("thr"), 6).as("bh_thr"),
            when(col("rnk") <= coalesce(col("k"), lit(0)), lit(1))
              .otherwise(lit(0)).as("rejected"))
          .orderBy(col("rnk"))
      },
      oracle = Some("""
        WITH o AS (
          SELECT c_nationkey AS nation,
                 CAST(o_totalprice AS DECIMAL(18,2)) AS p
          FROM orders JOIN customer ON o_custkey = c_custkey),
        g0 AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(p) AS sy,
                 SUM(CAST(p AS DECIMAL(19,2)) * CAST(p AS DECIMAL(19,2)))
                   AS syy
          FROM o),
        g1 AS (
          SELECT n, ROUND(CAST(sy AS DOUBLE) / CAST(n AS DOUBLE), 9) AS m0,
                 syy
          FROM g0),
        g AS (
          SELECT n, m0,
                 (CAST(CAST(syy AS VARCHAR) AS DOUBLE)
                   - CAST(n AS DOUBLE) * m0 * m0)
                   / CAST(n - 1 AS DOUBLE) AS s2
          FROM g1),
        per AS (
          SELECT nation, CAST(COUNT(*) AS BIGINT) AS n_orders,
                 SUM(p) AS syi
          FROM o GROUP BY 1),
        zt AS (
          SELECT per.nation, per.n_orders,
                 ROUND(CAST(syi AS DOUBLE) / CAST(n_orders AS DOUBLE), 9)
                   AS mi,
                 g.m0, g.s2
          FROM per CROSS JOIN g),
        z2 AS (
          SELECT *, (mi - m0) / SQRT(s2 / CAST(n_orders AS DOUBLE)) AS zf
          FROM zt),
        z3 AS (
          SELECT *, LEAST(CAST(1 AS DOUBLE),
                          CAST(1 AS DOUBLE) / (zf * zf)) AS p_cheb
          FROM z2),
        rk AS (
          SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY p_cheb, nation) AS INT)
                   AS rnk
          FROM z3),
        rk2 AS MATERIALIZED (
          SELECT *, CAST(rnk AS DOUBLE) * CAST(0.5 AS DOUBLE)
                   / CAST(25 AS DOUBLE) AS thr
          FROM rk),
        ks AS (SELECT MAX(CASE WHEN p_cheb <= thr THEN rnk END) AS k
               FROM rk2)
        SELECT nation, n_orders,
               ROUND(mi, 6) AS mean_price,
               ROUND(zf, 6) + CAST(0 AS DOUBLE) AS z,
               ROUND(p_cheb, 6) AS p_cheb,
               rnk, ROUND(thr, 6) AS bh_thr,
               CASE WHEN rnk <= COALESCE(ks.k, 0) THEN 1 ELSE 0 END
                 AS rejected
        FROM rk2 CROSS JOIN ks ORDER BY rnk""")),

    // Per-brand price elasticity of demand: the log-log OLS slope
    // d ln q / d ln p per brand, in closed form from one grouped DECIMAL
    // moment pass — fully distributed (one groupBy, no per-row residual
    // pass), ln/÷-only links on the 9-grid.
    "qbh_price_elasticity" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem")
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .select(col("p_brand").as("brand"),
            round(log(col("l_extendedprice") / col("l_quantity")), 9).as("u"),
            round(log(col("l_quantity")), 9).as("v"))
        li.groupBy(col("brand"))
          .agg(count(lit(1)).as("n_lines"),
            sum(col("u").cast("decimal(28,9)")).as("su"),
            sum(col("v").cast("decimal(28,9)")).as("sv"),
            sum(round(col("u") * col("v"), 6).cast("decimal(28,6)"))
              .as("suv"),
            sum(round(col("u") * col("u"), 6).cast("decimal(28,6)"))
              .as("suu"))
          .withColumn("nd", col("n_lines").cast("double"))
          .withColumn("slope", round(
            (col("nd") * col("suv").cast("double") -
              col("su").cast("double") * col("sv").cast("double")) /
            (col("nd") * col("suu").cast("double") -
              col("su").cast("double") * col("su").cast("double")), 9))
          .select(col("brand"), col("n_lines"),
            round(col("slope"), 6).as("elasticity"),
            round((col("sv").cast("double") -
              col("slope") * col("su").cast("double")) / col("nd"), 6)
              .as("intercept"))
          .orderBy(col("brand"))
      },
      oracle = Some("""
        WITH li AS (
          SELECT p_brand AS brand,
                 ROUND(ln(l_extendedprice / l_quantity), 9) AS u,
                 ROUND(ln(l_quantity), 9) AS v
          FROM lineitem JOIN part ON l_partkey = p_partkey),
        g AS (
          SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_lines,
                 SUM(CAST(u AS DECIMAL(28,9))) AS su,
                 SUM(CAST(v AS DECIMAL(28,9))) AS sv,
                 SUM(CAST(ROUND(u * v, 6) AS DECIMAL(28,6))) AS suv,
                 SUM(CAST(ROUND(u * u, 6) AS DECIMAL(28,6))) AS suu
          FROM li GROUP BY 1),
        f AS (
          SELECT brand, n_lines, CAST(n_lines AS DOUBLE) AS nd,
                 CAST(su AS DOUBLE) AS sud, CAST(sv AS DOUBLE) AS svd,
                 CAST(suv AS DOUBLE) AS suvd, CAST(suu AS DOUBLE) AS suud
          FROM g),
        f2 AS (
          SELECT *, ROUND((nd * suvd - sud * svd)
                   / (nd * suud - sud * sud), 9) AS slope
          FROM f)
        SELECT brand, n_lines,
               ROUND(slope, 6) + CAST(0 AS DOUBLE) AS elasticity,
               ROUND((svd - slope * sud) / nd, 6) + CAST(0 AS DOUBLE)
                 AS intercept
        FROM f2 ORDER BY brand""")),

    // Rank-1 ALS matrix factorization of the customer × brand quantity
    // matrix: two alternating closed-form least-squares rounds over the
    // OBSERVED entries (u_i = Σrv/Σv², v_j = Σru/Σu²), exactly the
    // textbook ALS update truncated at rank 1 — each half-step is one
    // join + one grouped DECIMAL moment aggregate, the u table stays
    // keyed by customer (never broadcast: unbounded at scale), brand
    // factors broadcast (bounded dim). Final reconstruction SSE over
    // observed entries on the 9/6 grids.
    "qbi_als_rank1" -> Q(
      fn = (s, dir) => {
        val r = t(s, dir, "lineitem")
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .groupBy(col("o_custkey").as("cust"), col("p_brand").as("brand"))
          .agg(sum(col("l_quantity")).as("r"))
          .localCheckpoint(eager = false)
        // Every r·factor / factor² term is squared/multiplied IN DECIMAL:
        // a 9-grid factor times an integer r lands its exact product's
        // 7th-9th decimals on "500" about once per thousand terms, and a
        // double's representation error then decides the 6-round
        // direction differently per engine (the qae boundary class).
        // Exact decimal products half-up-round identically everywhere.
        def uStep(v: DataFrame): DataFrame =
          r.join(broadcast(v), Seq("brand"))
            .withColumn("rd", col("r").cast("decimal(18,3)"))
            .withColumn("vd", col("v").cast("decimal(18,9)"))
            .groupBy(col("cust"))
            .agg(
              sum(round(col("rd") * col("vd"), 6).cast("decimal(28,6)"))
                .as("num"),
              sum(round(col("vd") * col("vd"), 6).cast("decimal(28,6)"))
                .as("den"))
            .select(col("cust"),
              round(col("num").cast("double") / col("den").cast("double"), 9)
                .as("u"))
        def vStep(u: DataFrame): DataFrame =
          r.join(u, Seq("cust"))
            .withColumn("rd", col("r").cast("decimal(18,3)"))
            .withColumn("ud", col("u").cast("decimal(18,9)"))
            .groupBy(col("brand"))
            .agg(count(lit(1)).as("n_ratings"),
              sum(round(col("rd") * col("ud"), 6).cast("decimal(28,6)"))
                .as("num"),
              sum(round(col("ud") * col("ud"), 6).cast("decimal(28,6)"))
                .as("den"))
            .select(col("brand"), col("n_ratings"),
              round(col("num").cast("double") / col("den").cast("double"), 9)
                .as("v"))
        val v0 = r.select(col("brand")).distinct().withColumn("v", lit(1.0))
        val u1 = uStep(v0).localCheckpoint(eager = false)
        val v1 = vStep(u1).localCheckpoint(eager = false)
        val u2 = uStep(v1.select(col("brand"), col("v")))
          .localCheckpoint(eager = false)
        val v2 = vStep(u2).localCheckpoint(eager = false)
        // err is EXACTLY a 9-grid value (integer r minus a 9-snapped
        // product) but err² needs up to 18 decimals at magnitude 1e6 —
        // beyond what a double determines at the 6th decimal (the qae
        // trap). Square IN DECIMAL: the (18,9)² product is exact and
        // both engines half-up-round it identically. (DuckDB side
        // pre-casts to (19,9) to force INT128 — the qb8 overflow lesson.)
        val sse = r.join(u2, Seq("cust"))
          .join(broadcast(v2.select(col("brand"), col("v"))), Seq("brand"))
          .withColumn("err",
            (col("r") - round(col("u") * col("v"), 9)).cast("decimal(18,9)"))
          .agg(sum(round(col("err") * col("err"), 6).cast("decimal(28,6)"))
            .as("sse"))
          .select(round(col("sse").cast("double"), 6).as("sse"))
        v2.crossJoin(broadcast(sse))
          .select(col("brand"), col("n_ratings"),
            round(col("v"), 6).as("factor"), col("sse"))
          .orderBy(col("brand"))
      },
      headline = true,
      oracle = Some("""
        WITH r AS MATERIALIZED (
          SELECT o_custkey AS cust, p_brand AS brand, SUM(l_quantity) AS r
          FROM lineitem JOIN orders ON l_orderkey = o_orderkey
          JOIN part ON l_partkey = p_partkey
          GROUP BY 1, 2),
        u1 AS MATERIALIZED (
          SELECT cust,
                 ROUND(CAST(SUM(CAST(ROUND(CAST(r AS DECIMAL(18,3))
                     * CAST(1 AS DECIMAL(19,9)), 6)
                     AS DECIMAL(28,6))) AS DOUBLE)
                   / CAST(SUM(CAST(ROUND(CAST(1 AS DECIMAL(19,9))
                     * CAST(1 AS DECIMAL(19,9)), 6)
                     AS DECIMAL(28,6))) AS DOUBLE), 9) AS u
          FROM r GROUP BY 1),
        v1 AS MATERIALIZED (
          SELECT brand,
                 ROUND(CAST(SUM(CAST(ROUND(CAST(r.r AS DECIMAL(18,3))
                     * CAST(u1.u AS DECIMAL(19,9)), 6)
                     AS DECIMAL(28,6))) AS DOUBLE)
                   / CAST(SUM(CAST(ROUND(CAST(u1.u AS DECIMAL(19,9))
                     * CAST(u1.u AS DECIMAL(19,9)), 6)
                     AS DECIMAL(28,6))) AS DOUBLE), 9) AS v
          FROM r JOIN u1 USING (cust) GROUP BY 1),
        u2 AS MATERIALIZED (
          SELECT cust,
                 ROUND(CAST(SUM(CAST(ROUND(CAST(r.r AS DECIMAL(18,3))
                     * CAST(v1.v AS DECIMAL(19,9)), 6)
                     AS DECIMAL(28,6))) AS DOUBLE)
                   / CAST(SUM(CAST(ROUND(CAST(v1.v AS DECIMAL(19,9))
                     * CAST(v1.v AS DECIMAL(19,9)), 6)
                     AS DECIMAL(28,6))) AS DOUBLE), 9) AS u
          FROM r JOIN v1 USING (brand) GROUP BY 1),
        v2 AS MATERIALIZED (
          SELECT brand, CAST(COUNT(*) AS BIGINT) AS n_ratings,
                 ROUND(CAST(SUM(CAST(ROUND(CAST(r.r AS DECIMAL(18,3))
                     * CAST(u2.u AS DECIMAL(19,9)), 6)
                     AS DECIMAL(28,6))) AS DOUBLE)
                   / CAST(SUM(CAST(ROUND(CAST(u2.u AS DECIMAL(19,9))
                     * CAST(u2.u AS DECIMAL(19,9)), 6)
                     AS DECIMAL(28,6))) AS DOUBLE), 9) AS v
          FROM r JOIN u2 USING (cust) GROUP BY 1),
        sse AS (
          SELECT ROUND(CAST(SUM(CAST(ROUND(
                   CAST(r.r - ROUND(u2.u * v2.v, 9) AS DECIMAL(19,9))
                     * CAST(r.r - ROUND(u2.u * v2.v, 9) AS DECIMAL(19,9)), 6)
                 AS DECIMAL(28,6))) AS DOUBLE), 6) AS sse
          FROM r JOIN u2 USING (cust) JOIN v2 USING (brand))
        SELECT brand, n_ratings,
               ROUND(v, 6) AS factor, sse.sse
        FROM v2 CROSS JOIN sse ORDER BY brand""")),

    // DBSCAN over the deterministic customer geo panel (the qa5/qa6
    // hash-coordinates, custkey-bounded so density is comparable across
    // SFs): eps-pairs from the cell-bucketed radius join (never
    // all-pairs), cores by neighbor count, clusters = CC over core-core
    // edges, borders attach to the MIN core-neighbor cluster (plain
    // DBSCAN's border rule is scan-order-dependent — not reproducible on
    // a cluster; min is the pinned convention). The naive all-pairs
    // oracle doubles as the zero-candidate-loss proof (qa6 discipline).
    "qbj_dbscan_geo" -> Q(
      fn = (s, dir) => {
        val pts = t(s, dir, "customer")
          .filter(col("c_custkey") <= 1500)
          .select(col("c_custkey").as("pid"),
            hashCoord(col("c_custkey"), "lat", 180000L, 90.0).as("lat"),
            hashCoord(col("c_custkey"), "lon", 360000L, 180.0).as("lon"))
          .filter(abs(col("lat")) <= lit(70.0))
        graft.operators.Dbscan.geo(pts, "pid", "lat", "lon",
            epsKm = 400.0, minNeighbors = 2, cellDeg = 5.0, kLat = 1, kLon = 3)
          .orderBy(col("id"))
      },
      oracle = Some(s"""
        WITH RECURSIVE pts AS MATERIALIZED (
          SELECT * FROM (
            SELECT c_custkey AS id,
                   ${coordSql("c_custkey", "lat", 180000L, 90)} AS lat,
                   ${coordSql("c_custkey", "lon", 360000L, 180)} AS lon
            FROM customer WHERE c_custkey <= 1500)
          WHERE ABS(lat) <= CAST(70 AS DOUBLE)),
        pairs AS MATERIALIZED (
          SELECT a.id AS a_id, b.id AS b_id
          FROM pts a JOIN pts b ON a.id < b.id
          WHERE ROUND(CAST(12742 AS DOUBLE) * ASIN(SQRT(
                  SIN(RADIANS(b.lat - a.lat) / CAST(2 AS DOUBLE))
                    * SIN(RADIANS(b.lat - a.lat) / CAST(2 AS DOUBLE))
                  + COS(RADIANS(a.lat)) * COS(RADIANS(b.lat))
                    * SIN(RADIANS(b.lon - a.lon) / CAST(2 AS DOUBLE))
                    * SIN(RADIANS(b.lon - a.lon) / CAST(2 AS DOUBLE)))), 6)
                <= CAST(400 AS DOUBLE)),
        deg AS (
          SELECT id, CAST(COUNT(*) AS BIGINT) AS nn
          FROM (SELECT a_id AS id FROM pairs
                UNION ALL SELECT b_id FROM pairs)
          GROUP BY 1),
        core AS MATERIALIZED (SELECT id FROM deg WHERE nn >= 2),
        ce AS MATERIALIZED (
          SELECT a_id, b_id FROM pairs
          JOIN core ca ON ca.id = a_id JOIN core cb ON cb.id = b_id),
        edges AS (SELECT a_id AS src, b_id AS dst FROM ce
                  UNION SELECT b_id, a_id FROM ce),
        reach(node, comp) AS (
          SELECT src, src FROM edges
          UNION
          SELECT e.dst, r.comp FROM reach r JOIN edges e ON e.src = r.node),
        cc AS (SELECT node AS id, MIN(comp) AS comp FROM reach GROUP BY 1),
        corelab AS MATERIALIZED (
          SELECT core.id, COALESCE(cc.comp, core.id) AS cluster
          FROM core LEFT JOIN cc ON core.id = cc.id),
        nbr AS (
          SELECT x.id, MIN(cl.cluster) AS bcluster
          FROM (SELECT a_id AS id, b_id AS nbr FROM pairs
                UNION ALL SELECT b_id, a_id FROM pairs) x
          JOIN corelab cl ON cl.id = x.nbr
          GROUP BY 1)
        SELECT p.id,
               CASE WHEN corelab.id IS NOT NULL THEN 'core'
                    WHEN nbr.id IS NOT NULL THEN 'border'
                    ELSE 'noise' END AS role,
               CASE WHEN corelab.id IS NOT NULL THEN corelab.cluster
                    ELSE nbr.bcluster END AS cluster
        FROM pts p
        LEFT JOIN corelab ON corelab.id = p.id
        LEFT JOIN nbr ON nbr.id = p.id
        ORDER BY p.id""")),

    // Difference-in-differences: region-0 (treated) vs region-1 (control)
    // order values, pre/post the 1996-01-01 cut — the 2×2 cell-mean
    // estimator with the unpooled SE from exact DECIMAL cell moments
    // (price squares in DECIMAL, the syy→double cast over the VARCHAR
    // bridge per rule 13). The causal-inference staple the engine's A/B
    // family (q7b CUPED, q7c two-proportion) was missing.
    "qbk_diff_in_diff" -> Q(
      fn = (s, dir) => {
        val o = t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
          .filter(col("n_regionkey") <= 1)
          .select(
            when(col("n_regionkey") === 0, 1).otherwise(0).as("treat"),
            when(col("o_orderdate") >= lit("1996-01-01").cast("timestamp"), 1)
              .otherwise(0).as("post"),
            col("o_totalprice").cast("decimal(18,2)").as("y"))
        val cells = o.groupBy(col("treat"), col("post"))
          .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
            sum(col("y") * col("y")).as("syy"))
          .select(col("treat"), col("post"), col("n"),
            round(col("sy").cast("double") / col("n").cast("double"), 9)
              .as("m"),
            col("syy"))
          .withColumn("s2",
            (col("syy").cast("double") -
              col("n").cast("double") * col("m") * col("m")) /
            (col("n") - 1).cast("double"))
        def cell(t: Int, p: Int, c: String) =
          max(when(col("treat") === t && col("post") === p, col(c)))
        cells.agg(
            sum(col("n")).as("n_total"),
            cell(1, 0, "m").as("m_t_pre"), cell(1, 1, "m").as("m_t_post"),
            cell(0, 0, "m").as("m_c_pre"), cell(0, 1, "m").as("m_c_post"),
            cell(1, 0, "s2").as("v10"), cell(1, 1, "s2").as("v11"),
            cell(0, 0, "s2").as("v00"), cell(0, 1, "s2").as("v01"),
            cell(1, 0, "n").as("n10"), cell(1, 1, "n").as("n11"),
            cell(0, 0, "n").as("n00"), cell(0, 1, "n").as("n01"))
          .withColumn("did",
            (col("m_t_post") - col("m_t_pre")) -
            (col("m_c_post") - col("m_c_pre")))
          .withColumn("se", sqrt(
            col("v11") / col("n11").cast("double") +
            col("v10") / col("n10").cast("double") +
            col("v01") / col("n01").cast("double") +
            col("v00") / col("n00").cast("double")))
          .select(col("n_total"),
            round(col("m_t_pre"), 6).as("m_t_pre"),
            round(col("m_t_post"), 6).as("m_t_post"),
            round(col("m_c_pre"), 6).as("m_c_pre"),
            round(col("m_c_post"), 6).as("m_c_post"),
            round(col("did"), 6).as("did"),
            round(col("se"), 6).as("se"),
            round(col("did") / col("se"), 6).as("t_stat"))
      },
      oracle = Some("""
        WITH o AS (
          SELECT CASE WHEN n_regionkey = 0 THEN 1 ELSE 0 END AS treat,
                 CASE WHEN o_orderdate >= TIMESTAMP '1996-01-01'
                      THEN 1 ELSE 0 END AS post,
                 CAST(o_totalprice AS DECIMAL(18,2)) AS y
          FROM orders JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          WHERE n_regionkey <= 1),
        cells AS (
          SELECT treat, post, CAST(COUNT(*) AS BIGINT) AS n,
                 ROUND(CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
                   AS m,
                 SUM(CAST(y AS DECIMAL(19,2)) * CAST(y AS DECIMAL(19,2)))
                   AS syy
          FROM o GROUP BY 1, 2),
        cv AS (
          SELECT treat, post, n, m,
                 (CAST(CAST(syy AS VARCHAR) AS DOUBLE)
                   - CAST(n AS DOUBLE) * m * m) / CAST(n - 1 AS DOUBLE) AS s2
          FROM cells),
        w AS (
          SELECT CAST(SUM(n) AS BIGINT) AS n_total,
                 MAX(CASE WHEN treat = 1 AND post = 0 THEN m END) AS m_t_pre,
                 MAX(CASE WHEN treat = 1 AND post = 1 THEN m END) AS m_t_post,
                 MAX(CASE WHEN treat = 0 AND post = 0 THEN m END) AS m_c_pre,
                 MAX(CASE WHEN treat = 0 AND post = 1 THEN m END) AS m_c_post,
                 MAX(CASE WHEN treat = 1 AND post = 0 THEN s2 END) AS v10,
                 MAX(CASE WHEN treat = 1 AND post = 1 THEN s2 END) AS v11,
                 MAX(CASE WHEN treat = 0 AND post = 0 THEN s2 END) AS v00,
                 MAX(CASE WHEN treat = 0 AND post = 1 THEN s2 END) AS v01,
                 MAX(CASE WHEN treat = 1 AND post = 0 THEN n END) AS n10,
                 MAX(CASE WHEN treat = 1 AND post = 1 THEN n END) AS n11,
                 MAX(CASE WHEN treat = 0 AND post = 0 THEN n END) AS n00,
                 MAX(CASE WHEN treat = 0 AND post = 1 THEN n END) AS n01
          FROM cv),
        w2 AS (
          SELECT *, (m_t_post - m_t_pre) - (m_c_post - m_c_pre) AS did,
                 SQRT(v11 / CAST(n11 AS DOUBLE) + v10 / CAST(n10 AS DOUBLE)
                   + v01 / CAST(n01 AS DOUBLE) + v00 / CAST(n00 AS DOUBLE))
                   AS se
          FROM w)
        SELECT n_total,
               ROUND(m_t_pre, 6) AS m_t_pre, ROUND(m_t_post, 6) AS m_t_post,
               ROUND(m_c_pre, 6) AS m_c_pre, ROUND(m_c_post, 6) AS m_c_post,
               ROUND(did, 6) + CAST(0 AS DOUBLE) AS did,
               ROUND(se, 6) AS se,
               ROUND(did / se, 6) + CAST(0 AS DOUBLE) AS t_stat
        FROM w2""")),

    // Iterative proportional fitting (raking): rake the region × priority
    // ORDER-COUNT table onto revenue margins — 3 unrolled row/column
    // scaling rounds, each a margin sum through DECIMAL(28,9) and one
    // 9-snapped multiplicative update, over the bounded 25-cell table.
    // The survey-weighting / dataset-rebalancing primitive; margins from
    // a DIFFERENT measure than the seed keep the fixpoint non-trivial.
    "qbl_ipf_raking" -> Q(
      fn = (s, dir) => {
        val o = t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
          .select(col("n_regionkey").as("rg"), col("o_orderpriority").as("pr"),
            col("o_totalprice").cast("decimal(18,2)").as("y"))
        val seed = o.groupBy(col("rg"), col("pr"))
          .agg(count(lit(1)).as("n"))
          .withColumn("w", col("n").cast("double"))
          .localCheckpoint(eager = false)
        // targets as unit-scale revenue SHARES, not absolute revenue:
        // absolute targets would push w to 1e9-scale, whose DECIMAL(28,9)
        // margin sums exceed the 2^53 exact-cast budget at sf0.1
        val tot = o.agg(sum(col("y")).as("ty"))
        val rowT = o.groupBy(col("rg")).agg(sum(col("y")).as("syr"))
          .crossJoin(broadcast(tot))
          .select(col("rg"), round(col("syr").cast("double") /
            col("ty").cast("double"), 9).as("rt"))
        val colT = o.groupBy(col("pr")).agg(sum(col("y")).as("syc"))
          .crossJoin(broadcast(tot))
          .select(col("pr"), round(col("syc").cast("double") /
            col("ty").cast("double"), 9).as("ct"))
        var w = seed
        for (_ <- 1 to 3) {
          val rs = w.groupBy(col("rg"))
            .agg(sum(col("w").cast("decimal(28,9)")).cast("double").as("rsum"))
          w = w.join(rs, Seq("rg")).join(broadcast(rowT), Seq("rg"))
            .withColumn("w", round(col("w") * col("rt") / col("rsum"), 9))
            .select(col("rg"), col("pr"), col("n"), col("w"))
          val cs = w.groupBy(col("pr"))
            .agg(sum(col("w").cast("decimal(28,9)")).cast("double").as("csum"))
          w = w.join(cs, Seq("pr")).join(broadcast(colT), Seq("pr"))
            .withColumn("w", round(col("w") * col("ct") / col("csum"), 9))
            .select(col("rg"), col("pr"), col("n"), col("w"))
            .localCheckpoint(eager = false)
        }
        // output at the grid's own precision: re-rounding a 9-grid value
        // at a COARSER scale puts ~1/10 of values exactly on the half
        // boundary (rule 15's trap in another guise)
        w.select(col("rg"), col("pr"), col("n"), round(col("w"), 9).as("w"))
          .orderBy(col("rg"), col("pr"))
      },
      oracle = Some("""
        WITH o AS (
          SELECT n_regionkey AS rg, o_orderpriority AS pr,
                 CAST(o_totalprice AS DECIMAL(18,2)) AS y
          FROM orders JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey),
        seed AS (
          SELECT rg, pr, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(COUNT(*) AS DOUBLE) AS w
          FROM o GROUP BY 1, 2),
        tot AS (SELECT CAST(SUM(y) AS DOUBLE) AS ty FROM o),
        rowt AS (SELECT rg, ROUND(CAST(SUM(y) AS DOUBLE)
                   / (SELECT ty FROM tot), 9) AS rt
                 FROM o GROUP BY 1),
        colt AS (SELECT pr, ROUND(CAST(SUM(y) AS DOUBLE)
                   / (SELECT ty FROM tot), 9) AS ct
                 FROM o GROUP BY 1),
        r1 AS MATERIALIZED (
          SELECT s.rg, s.pr, s.n,
                 ROUND(s.w * rowt.rt / rs.rsum, 9) AS w
          FROM seed s
          JOIN (SELECT rg, CAST(SUM(CAST(w AS DECIMAL(28,9))) AS DOUBLE)
                  AS rsum FROM seed GROUP BY 1) rs ON rs.rg = s.rg
          JOIN rowt ON rowt.rg = s.rg),
        c1 AS MATERIALIZED (
          SELECT s.rg, s.pr, s.n,
                 ROUND(s.w * colt.ct / cs.csum, 9) AS w
          FROM r1 s
          JOIN (SELECT pr, CAST(SUM(CAST(w AS DECIMAL(28,9))) AS DOUBLE)
                  AS csum FROM r1 GROUP BY 1) cs ON cs.pr = s.pr
          JOIN colt ON colt.pr = s.pr),
        r2 AS MATERIALIZED (
          SELECT s.rg, s.pr, s.n,
                 ROUND(s.w * rowt.rt / rs.rsum, 9) AS w
          FROM c1 s
          JOIN (SELECT rg, CAST(SUM(CAST(w AS DECIMAL(28,9))) AS DOUBLE)
                  AS rsum FROM c1 GROUP BY 1) rs ON rs.rg = s.rg
          JOIN rowt ON rowt.rg = s.rg),
        c2 AS MATERIALIZED (
          SELECT s.rg, s.pr, s.n,
                 ROUND(s.w * colt.ct / cs.csum, 9) AS w
          FROM r2 s
          JOIN (SELECT pr, CAST(SUM(CAST(w AS DECIMAL(28,9))) AS DOUBLE)
                  AS csum FROM r2 GROUP BY 1) cs ON cs.pr = s.pr
          JOIN colt ON colt.pr = s.pr),
        r3 AS MATERIALIZED (
          SELECT s.rg, s.pr, s.n,
                 ROUND(s.w * rowt.rt / rs.rsum, 9) AS w
          FROM c2 s
          JOIN (SELECT rg, CAST(SUM(CAST(w AS DECIMAL(28,9))) AS DOUBLE)
                  AS rsum FROM c2 GROUP BY 1) rs ON rs.rg = s.rg
          JOIN rowt ON rowt.rg = s.rg),
        c3 AS MATERIALIZED (
          SELECT s.rg, s.pr, s.n,
                 ROUND(s.w * colt.ct / cs.csum, 9) AS w
          FROM r3 s
          JOIN (SELECT pr, CAST(SUM(CAST(w AS DECIMAL(28,9))) AS DOUBLE)
                  AS csum FROM r3 GROUP BY 1) cs ON cs.pr = s.pr
          JOIN colt ON colt.pr = s.pr)
        SELECT rg, pr, n, ROUND(w, 9) AS w
        FROM c3 ORDER BY rg, pr""")),

    // Two-model uplift by engagement segment: arms by the q7c user-parity
    // assignment, conversion = purchase within 1 day of first view,
    // segments by fixed per-user event-count thresholds — uplift
    // p₁ − p₀ per segment with the two-proportion unpooled SE and a
    // null-guarded z (se = 0 in a degenerate cell → null, loudly absent
    // rather than a non-replayable NaN).
    "qbm_uplift_segments" -> Q(
      fn = (s, dir) => {
        val e = Tables(s, dir, "events")
          .withColumn("ts_ms", unix_millis(col("ts")))
        val v0 = e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("ts_ms")).as("t0"))
        val conv = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts_ms"))
          .join(v0, "user_id")
          .filter(col("ts_ms") > col("t0") &&
            col("ts_ms") <= col("t0") + lit(86400000L))
          .select(col("user_id")).distinct()
          .withColumn("__c", lit(1))
        val cnt = e.join(v0.select(col("user_id")), Seq("user_id"))
          .groupBy("user_id").agg(count(lit(1)).as("nev"))
        val per = v0.join(conv, Seq("user_id"), "left")
          .join(cnt, Seq("user_id"))
          .select(
            when(col("nev") <= 62, "low").when(col("nev") <= 71, "mid")
              .otherwise("high").as("segment"),
            (col("user_id") % 2).cast("int").as("arm"),
            coalesce(col("__c"), lit(0)).as("conv"))
        val cells = per.groupBy(col("segment"), col("arm"))
          .agg(count(lit(1)).as("n"), sum(col("conv")).cast("long").as("k"))
          .withColumn("p",
            round(col("k").cast("double") / col("n").cast("double"), 9))
        def arm(a: Int, c: String) = max(when(col("arm") === a, col(c)))
        cells.groupBy(col("segment"))
          .agg(arm(0, "n").as("n0"), arm(1, "n").as("n1"),
            arm(0, "p").as("p0"), arm(1, "p").as("p1"))
          .withColumn("se", sqrt(
            col("p1") * (lit(1.0) - col("p1")) / col("n1").cast("double") +
            col("p0") * (lit(1.0) - col("p0")) / col("n0").cast("double")))
          .select(col("segment"), col("n0"), col("n1"),
            round(col("p0"), 6).as("p0"), round(col("p1"), 6).as("p1"),
            round(col("p1") - col("p0"), 6).as("uplift"),
            when(col("se") > 0,
              round((col("p1") - col("p0")) / col("se"), 6)).as("z"))
          .orderBy(col("segment"))
      },
      oracle = Some("""
        WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms
                   FROM events),
        v0 AS (SELECT user_id, MIN(ts_ms) AS t0 FROM e
               WHERE event_type = 'view' GROUP BY 1),
        conv AS (
          SELECT DISTINCT e.user_id
          FROM e JOIN v0 USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts_ms > v0.t0
            AND e.ts_ms <= v0.t0 + 86400000),
        cnt AS (SELECT e.user_id, CAST(COUNT(*) AS BIGINT) AS nev
                FROM e JOIN v0 USING (user_id) GROUP BY 1),
        per AS (
          SELECT CASE WHEN nev <= 62 THEN 'low'
                      WHEN nev <= 71 THEN 'mid' ELSE 'high' END AS segment,
                 CAST(v0.user_id % 2 AS INT) AS arm,
                 CASE WHEN conv.user_id IS NOT NULL THEN 1 ELSE 0 END AS conv
          FROM v0 LEFT JOIN conv ON v0.user_id = conv.user_id
          JOIN cnt ON cnt.user_id = v0.user_id),
        cells AS (
          SELECT segment, arm, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(conv) AS BIGINT) AS k
          FROM per GROUP BY 1, 2),
        cp AS (
          SELECT *, ROUND(CAST(k AS DOUBLE) / CAST(n AS DOUBLE), 9) AS p
          FROM cells),
        wide AS (
          SELECT segment,
                 MAX(CASE WHEN arm = 0 THEN n END) AS n0,
                 MAX(CASE WHEN arm = 1 THEN n END) AS n1,
                 MAX(CASE WHEN arm = 0 THEN p END) AS p0,
                 MAX(CASE WHEN arm = 1 THEN p END) AS p1
          FROM cp GROUP BY 1),
        w2 AS (
          SELECT *, SQRT(p1 * (CAST(1 AS DOUBLE) - p1) / CAST(n1 AS DOUBLE)
                   + p0 * (CAST(1 AS DOUBLE) - p0) / CAST(n0 AS DOUBLE))
                   AS se
          FROM wide)
        SELECT segment, n0, n1,
               ROUND(p0, 6) AS p0, ROUND(p1, 6) AS p1,
               ROUND(p1 - p0, 6) + CAST(0 AS DOUBLE) AS uplift,
               CASE WHEN se > 0
                    THEN ROUND((p1 - p0) / se, 6) + CAST(0 AS DOUBLE) END
                 AS z
        FROM w2 ORDER BY segment""")),

    // One-way ANOVA F across regions on order value: SSB/SSW in closed
    // form from per-group DECIMAL moments (price squares in DECIMAL, the
    // rule-13 VARCHAR bridge), plus η² effect size. The k-group
    // parametric sibling of qbo's Kruskal-Wallis; q7n's Welch t is the
    // 2-group special case.
    "qbn_anova_oneway" -> Q(
      fn = (s, dir) => {
        // order values in MILLIONS: SSW at raw scale is ~1e14 at sf0.1,
        // beyond the 15-significant-digit budget a 6-round of a double
        // determines (rule 13); unit-range values keep every rounded
        // term well inside it
        val o = t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
          .select(col("n_regionkey").as("rg"),
            (col("o_totalprice").cast("decimal(18,2)") / lit(1000000))
              .cast("decimal(14,8)").as("y"))
        val g = o.groupBy(col("rg"))
          .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
            sum(col("y") * col("y")).as("syy"))
          .withColumn("m",
            round(col("sy").cast("double") / col("n").cast("double"), 9))
        val tot = g.agg(sum(col("n")).as("nt"), sum(col("sy")).as("syt"),
            count(lit(1)).as("k"))
          .withColumn("mt",
            round(col("syt").cast("double") / col("nt").cast("double"), 9))
        g.crossJoin(broadcast(tot))
          .withColumn("ssb_i", col("n").cast("double") *
            (col("m") - col("mt")) * (col("m") - col("mt")))
          .withColumn("ssw_i",
            col("syy").cast("double") -
              col("n").cast("double") * col("m") * col("m"))
          .groupBy(col("nt"), col("k"))
          .agg(
            sum(round(col("ssb_i"), 6).cast("decimal(28,6)")).as("ssb"),
            sum(round(col("ssw_i"), 6).cast("decimal(28,6)")).as("ssw"))
          .select(col("nt").as("n"), col("k"),
            round((col("ssb").cast("double") / (col("k") - 1).cast("double")) /
              (col("ssw").cast("double") /
                (col("nt") - col("k")).cast("double")), 6).as("f_stat"),
            round(col("ssb").cast("double") /
              (col("ssb").cast("double") + col("ssw").cast("double")), 6)
              .as("eta_sq"))
      },
      oracle = Some("""
        WITH o AS (
          SELECT n_regionkey AS rg,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) / 1000000
                   AS DECIMAL(14,8)) AS y
          FROM orders JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey),
        g AS (
          SELECT rg, CAST(COUNT(*) AS BIGINT) AS n, SUM(y) AS sy,
                 SUM(CAST(y AS DECIMAL(19,8)) * CAST(y AS DECIMAL(19,8)))
                   AS syy,
                 ROUND(CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
                   AS m
          FROM o GROUP BY 1),
        tot AS (
          SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(COUNT(*) AS BIGINT) AS k,
                 ROUND(CAST(SUM(sy) AS DOUBLE)
                   / CAST(SUM(n) AS DOUBLE), 9) AS mt
          FROM g),
        terms AS (
          SELECT tot.nt, tot.k,
                 CAST(ROUND(CAST(n AS DOUBLE) * (m - mt) * (m - mt), 6)
                   AS DECIMAL(28,6)) AS ssb_i,
                 CAST(ROUND(CAST(CAST(syy AS VARCHAR) AS DOUBLE)
                   - CAST(n AS DOUBLE) * m * m, 6) AS DECIMAL(28,6)) AS ssw_i
          FROM g CROSS JOIN tot)
        SELECT nt AS n, k,
               ROUND((CAST(SUM(ssb_i) AS DOUBLE) / CAST(k - 1 AS DOUBLE))
                 / (CAST(SUM(ssw_i) AS DOUBLE) / CAST(nt - k AS DOUBLE)), 6)
                 AS f_stat,
               ROUND(CAST(SUM(ssb_i) AS DOUBLE)
                 / (CAST(SUM(ssb_i) AS DOUBLE) + CAST(SUM(ssw_i) AS DOUBLE)),
                 6) AS eta_sq
        FROM terms GROUP BY 1, 2""")),

    // Kruskal-Wallis k-group rank test (q7o Mann-Whitney's k-group
    // extension): GLOBAL average ranks carried as the exact INTEGER 2R
    // (2·count-smaller + t + 1) from the range-partitioned running count
    // over distinct values — no unpartitioned window over raw rows — with
    // the tie-corrected H from Σ(t³−t). Everything integer until the
    // final fixed-shape double formula.
    "qbo_kruskal_wallis" -> Q(
      fn = (s, dir) => {
        val o = t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
          .select(col("n_regionkey").as("rg"),
            col("o_totalprice").cast("decimal(18,2)").as("y"))
        val vc = o.groupBy(col("y")).agg(count(lit(1)).as("t"))
        val ranked = graft.operators.ScaleOps.globalRunningSum(vc,
            Seq(col("y")), col("t"), "cum")
          .select(col("y"), col("t"),
            (lit(2L) * (col("cum") - col("t")) + col("t") + 1).as("r2"))
          .localCheckpoint(eager = false)
        val gv = o.groupBy(col("rg"), col("y")).agg(count(lit(1)).as("c"))
          .join(ranked.select(col("y"), col("r2")), Seq("y"))
          .groupBy(col("rg"))
          .agg(sum(col("c")).as("ng"), sum(col("c") * col("r2")).as("s2g"))
        val ties = ranked.agg(
          sum(col("t") * col("t") * col("t") - col("t")).as("tt"))
        val tot = gv.agg(sum(col("ng")).as("nt"), count(lit(1)).as("k"))
        // unit-scale mean ranks ū_g = S_g/(N·n_g): the raw Σ(S_g²/n_g)
        // form carries ~1e15 terms at sf0.1 — past the 6-round digit
        // budget (rule 13). H = 12N/(N+1)·Σ n_g(ū_g − ū)², ū = (N+1)/2N.
        gv.crossJoin(broadcast(tot))
          .withColumn("ntd", col("nt").cast("double"))
          .withColumn("ug", round(col("s2g").cast("double") /
            (lit(2.0) * col("ntd") * col("ng").cast("double")), 9))
          .withColumn("ubar",
            (col("ntd") + lit(1.0)) / (lit(2.0) * col("ntd")))
          .withColumn("hterm", col("ng").cast("double") *
            (col("ug") - col("ubar")) * (col("ug") - col("ubar")))
          .groupBy(col("nt"), col("k"), col("ntd"))
          .agg(sum(round(col("hterm"), 9).cast("decimal(28,9)")).as("sh"))
          .crossJoin(broadcast(ties))
          .withColumn("h",
            lit(12.0) * col("ntd") / (col("ntd") + lit(1.0)) *
              col("sh").cast("double"))
          .withColumn("corr",
            lit(1.0) - col("tt").cast("double") /
              (col("ntd") * col("ntd") * col("ntd") - col("ntd")))
          .select(col("nt").as("n"), col("k"),
            round(col("h"), 6).as("h_stat"),
            round(col("h") / col("corr"), 6).as("h_tie_corrected"))
      },
      oracle = Some("""
        WITH o AS (
          SELECT n_regionkey AS rg, CAST(o_totalprice AS DECIMAL(18,2)) AS y
          FROM orders JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey),
        vc AS (
          SELECT y, CAST(COUNT(*) AS BIGINT) AS t FROM o GROUP BY 1),
        ranked AS (
          SELECT y, t,
                 2 * (CAST(SUM(t) OVER (ORDER BY y
                        ROWS UNBOUNDED PRECEDING) AS BIGINT) - t) + t + 1
                   AS r2
          FROM vc),
        gv AS (
          SELECT o.rg, CAST(COUNT(*) AS BIGINT) AS c, r.r2
          FROM o JOIN ranked r ON o.y = r.y
          GROUP BY 1, 3),
        gs AS (
          SELECT rg, CAST(SUM(c) AS BIGINT) AS ng,
                 CAST(SUM(c * r2) AS BIGINT) AS s2g
          FROM gv GROUP BY 1),
        ties AS (
          SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tt FROM ranked),
        tot AS (SELECT CAST(SUM(ng) AS BIGINT) AS nt,
                       CAST(COUNT(*) AS BIGINT) AS k FROM gs),
        ht AS (
          SELECT tot.nt, tot.k, CAST(tot.nt AS DOUBLE) AS ntd,
                 CAST(ROUND(CAST(ng AS DOUBLE)
                   * (ROUND(CAST(s2g AS DOUBLE)
                        / (CAST(2 AS DOUBLE) * CAST(tot.nt AS DOUBLE)
                           * CAST(ng AS DOUBLE)), 9)
                      - (CAST(tot.nt AS DOUBLE) + CAST(1 AS DOUBLE))
                        / (CAST(2 AS DOUBLE) * CAST(tot.nt AS DOUBLE)))
                   * (ROUND(CAST(s2g AS DOUBLE)
                        / (CAST(2 AS DOUBLE) * CAST(tot.nt AS DOUBLE)
                           * CAST(ng AS DOUBLE)), 9)
                      - (CAST(tot.nt AS DOUBLE) + CAST(1 AS DOUBLE))
                        / (CAST(2 AS DOUBLE) * CAST(tot.nt AS DOUBLE))), 9)
                   AS DECIMAL(28,9)) AS hterm
          FROM gs CROSS JOIN tot),
        agg1 AS (
          SELECT nt, k, ntd, CAST(SUM(hterm) AS DOUBLE) AS sh FROM ht
          GROUP BY 1, 2, 3),
        f AS (
          SELECT nt, k, ntd, sh,
                 (SELECT CAST(tt AS DOUBLE) FROM ties) AS ttd
          FROM agg1),
        f2 AS (
          SELECT nt, k,
                 CAST(12 AS DOUBLE) * ntd / (ntd + CAST(1 AS DOUBLE)) * sh
                   AS h,
                 CAST(1 AS DOUBLE) - ttd / (ntd * ntd * ntd - ntd) AS corr
          FROM f)
        SELECT nt AS n, k,
               ROUND(h, 6) AS h_stat,
               ROUND(h / corr, 6) AS h_tie_corrected
        FROM f2""")),

    // Cochran-Armitage trend test: does the URGENT-order share trend
    // across order YEARS (scores 0..6)? The ordered-category test a
    // plain chi-square (q6s) throws power away on — all integer sums to
    // one fixed-shape z. Oracle replays the identical closed form.
    "qbp_cochran_armitage" -> Q(
      fn = (s, dir) => {
        val o = t(s, dir, "orders")
          .select((year(col("o_orderdate")) - 1992).cast("long").as("s"),
            when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)
              .as("x"))
        val g = o.groupBy(col("s"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("r"))
        val m = g.agg(sum(col("n")).as("nt"), sum(col("r")).as("rt"),
          sum(col("s") * col("n")).as("sn"),
          sum(col("s") * col("s") * col("n")).as("ssn"),
          sum(col("s") * col("r")).as("sr"))
        m.withColumn("pbar",
            round(col("rt").cast("double") / col("nt").cast("double"), 9))
          .withColumn("tnum",
            col("sr").cast("double") -
              col("pbar") * col("sn").cast("double"))
          .withColumn("tden", sqrt(
            col("pbar") * (lit(1.0) - col("pbar")) *
              (col("ssn").cast("double") -
                col("sn").cast("double") * col("sn").cast("double") /
                  col("nt").cast("double"))))
          .select(col("nt").as("n"), col("rt").as("n_urgent"),
            round(col("pbar"), 6).as("p_urgent"),
            round(col("tnum"), 6).as("trend_num"),
            round(col("tnum") / col("tden"), 6).as("z"))
      },
      oracle = Some("""
        WITH o AS (
          SELECT CAST(year(o_orderdate) - 1992 AS BIGINT) AS s,
                 CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END
                   AS x
          FROM orders),
        g AS (
          SELECT s, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS r
          FROM o GROUP BY 1),
        m AS (
          SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(r) AS BIGINT) AS rt,
                 CAST(SUM(s * n) AS BIGINT) AS sn,
                 CAST(SUM(s * s * n) AS BIGINT) AS ssn,
                 CAST(SUM(s * r) AS BIGINT) AS sr
          FROM g),
        f AS (
          SELECT *, ROUND(CAST(rt AS DOUBLE) / CAST(nt AS DOUBLE), 9)
                   AS pbar
          FROM m),
        f2 AS (
          SELECT *,
                 CAST(sr AS DOUBLE) - pbar * CAST(sn AS DOUBLE) AS tnum,
                 SQRT(pbar * (CAST(1 AS DOUBLE) - pbar)
                   * (CAST(ssn AS DOUBLE)
                      - CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE)
                        / CAST(nt AS DOUBLE))) AS tden
          FROM f)
        SELECT nt AS n, rt AS n_urgent,
               ROUND(pbar, 6) AS p_urgent,
               ROUND(tnum, 6) + CAST(0 AS DOUBLE) AS trend_num,
               ROUND(tnum / tden, 6) + CAST(0 AS DOUBLE) AS z
        FROM f2""")),

    // Wald's SPRT on the conversion stream: users ordered by first-view
    // time, cumulative log-likelihood ratio for H1: p=0.08 vs H0: p=0.04
    // (ln-only links), first crossing of the ±ln 19 bounds (α=β=0.05)
    // found by a struct-argmin — the sequential test that stops reading
    // the stream as soon as the evidence suffices, vs q7k's fixed-horizon
    // MDE. Running conversion counts ride the range-partitioned prefix
    // image, never an unpartitioned window.
    "qbq_sprt" -> Q(
      fn = (s, dir) => {
        val e = Tables(s, dir, "events")
          .withColumn("ts_ms", unix_millis(col("ts")))
        val v0 = e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("ts_ms")).as("t0"))
        val conv = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts_ms"))
          .join(v0, "user_id")
          .filter(col("ts_ms") > col("t0") &&
            col("ts_ms") <= col("t0") + lit(86400000L))
          .select(col("user_id")).distinct()
          .withColumn("__c", lit(1L))
        val subj = v0.join(conv, Seq("user_id"), "left")
          .select(col("user_id"), col("t0"),
            coalesce(col("__c"), lit(0L)).as("x"))
        val cum = graft.operators.ScaleOps.globalRunningSum(subj,
            Seq(col("t0"), col("user_id")), col("x"), "sconv")
        val rn = graft.operators.ScaleOps.globalRowNumber(cum,
          Seq(col("t0"), col("user_id")), "k")
        val l1 = log(lit(0.08) / lit(0.04))
        val l0 = log(lit(0.92) / lit(0.96))
        val bound = log(lit(19.0))
        val walk = rn.withColumn("llr",
            round(col("sconv").cast("double") * l1 +
              (col("k") - col("sconv")).cast("double") * l0, 9))
          .withColumn("cross",
            when(col("llr") >= bound, lit(1))
              .when(col("llr") <= -bound, lit(-1)))
          .localCheckpoint(eager = false)
        val first = walk.filter(col("cross").isNotNull)
          .agg(min(struct(col("k").as("k"), col("cross").as("d")))
            .as("w"))
          .select(col("w.k").as("stop_k"), col("w.d").as("decision"))
        val fin = walk.agg(count(lit(1)).as("n"),
          sum(col("x")).as("conversions"),
          max(struct(col("k"), col("llr"))).as("last"))
        fin.crossJoin(broadcast(first))
          .select(col("n"), col("conversions"),
            round(col("last.llr"), 6).as("llr_final"),
            col("stop_k"), col("decision"))
      },
      oracle = Some("""
        WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms
                   FROM events),
        v0 AS (SELECT user_id, MIN(ts_ms) AS t0 FROM e
               WHERE event_type = 'view' GROUP BY 1),
        conv AS (
          SELECT DISTINCT e.user_id
          FROM e JOIN v0 USING (user_id)
          WHERE e.event_type = 'purchase' AND e.ts_ms > v0.t0
            AND e.ts_ms <= v0.t0 + 86400000),
        subj AS (
          SELECT v0.user_id, v0.t0,
                 CASE WHEN conv.user_id IS NOT NULL THEN 1 ELSE 0 END AS x
          FROM v0 LEFT JOIN conv ON v0.user_id = conv.user_id),
        walk AS (
          SELECT CAST(ROW_NUMBER() OVER (ORDER BY t0, user_id) AS BIGINT)
                   AS k,
                 CAST(SUM(x) OVER (ORDER BY t0, user_id
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS sconv,
                 x
          FROM subj),
        w2 AS (
          SELECT k, sconv, x,
                 ROUND(CAST(sconv AS DOUBLE)
                     * ln(CAST(0.08 AS DOUBLE) / CAST(0.04 AS DOUBLE))
                   + CAST(k - sconv AS DOUBLE)
                     * ln(CAST(0.92 AS DOUBLE) / CAST(0.96 AS DOUBLE)), 9)
                   AS llr
          FROM walk),
        w3 AS (
          SELECT *,
                 CASE WHEN llr >= ln(CAST(19 AS DOUBLE)) THEN 1
                      WHEN llr <= -ln(CAST(19 AS DOUBLE)) THEN -1 END
                   AS crs
          FROM w2),
        first AS (
          SELECT MIN({'k': k, 'd': crs}) AS w FROM w3 WHERE crs IS NOT NULL),
        fin AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS conversions,
                 MAX({'k': k, 'llr': llr}) AS last
          FROM w3)
        SELECT fin.n, fin.conversions,
               ROUND(fin.last['llr'], 6) + CAST(0 AS DOUBLE) AS llr_final,
               first.w['k'] AS stop_k,
               first.w['d'] AS decision
        FROM fin CROSS JOIN first""")),

    // k-truss of the q4g graph (k=4, 3 bounded peel rounds): keep edges
    // in ≥ 2 triangles, recompute support inside survivors, repeat — the
    // EDGE-cohesion sibling of q4s's k-core, finding communities k-core
    // misses (a hub star has high core number but zero truss). Exact
    // integer supports; final support recomputed within the survivor
    // set. Bounded peeling IS the semantics (the q6p Bellman-Ford
    // contract); KTrussSpec proves fixpoint on hand graphs.
    "qbr_ktruss" -> Q(
      fn = (s, dir) => {
        val edges = t(s, dir, "orders").select(
          (col("o_custkey") % 80).cast("long").as("src"),
          (col("o_orderkey") % 97).cast("long").as("dst"))
        graft.operators.GraphOps.kTruss(edges, k = 4, maxRounds = 3)
          .orderBy(col("u"), col("v"))
      },
      oracle = Some("""
        WITH raw AS (
          SELECT CAST(o_custkey % 80 AS BIGINT) AS src,
                 CAST(o_orderkey % 97 AS BIGINT) AS dst
          FROM orders),
        u0 AS MATERIALIZED (
          SELECT DISTINCT LEAST(src, dst) AS u, GREATEST(src, dst) AS v
          FROM raw WHERE src <> dst),
        t0 AS MATERIALIZED (
          SELECT e1.u AS a, e1.v AS b, e2.v AS c
          FROM u0 e1 JOIN u0 e2 ON e2.u = e1.v
          JOIN u0 e3 ON e3.u = e1.u AND e3.v = e2.v),
        s0 AS (
          SELECT u, v, CAST(COUNT(*) AS BIGINT) AS sup FROM (
            SELECT a AS u, b AS v FROM t0
            UNION ALL SELECT b, c FROM t0
            UNION ALL SELECT a, c FROM t0) GROUP BY 1, 2),
        u1 AS MATERIALIZED (
          SELECT u0.u, u0.v FROM u0 JOIN s0 USING (u, v) WHERE s0.sup >= 2),
        t1 AS MATERIALIZED (
          SELECT e1.u AS a, e1.v AS b, e2.v AS c
          FROM u1 e1 JOIN u1 e2 ON e2.u = e1.v
          JOIN u1 e3 ON e3.u = e1.u AND e3.v = e2.v),
        s1 AS (
          SELECT u, v, CAST(COUNT(*) AS BIGINT) AS sup FROM (
            SELECT a AS u, b AS v FROM t1
            UNION ALL SELECT b, c FROM t1
            UNION ALL SELECT a, c FROM t1) GROUP BY 1, 2),
        u2 AS MATERIALIZED (
          SELECT u1.u, u1.v FROM u1 JOIN s1 USING (u, v) WHERE s1.sup >= 2),
        t2 AS MATERIALIZED (
          SELECT e1.u AS a, e1.v AS b, e2.v AS c
          FROM u2 e1 JOIN u2 e2 ON e2.u = e1.v
          JOIN u2 e3 ON e3.u = e1.u AND e3.v = e2.v),
        s2 AS (
          SELECT u, v, CAST(COUNT(*) AS BIGINT) AS sup FROM (
            SELECT a AS u, b AS v FROM t2
            UNION ALL SELECT b, c FROM t2
            UNION ALL SELECT a, c FROM t2) GROUP BY 1, 2),
        u3 AS MATERIALIZED (
          SELECT u2.u, u2.v FROM u2 JOIN s2 USING (u, v) WHERE s2.sup >= 2),
        t3 AS MATERIALIZED (
          SELECT e1.u AS a, e1.v AS b, e2.v AS c
          FROM u3 e1 JOIN u3 e2 ON e2.u = e1.v
          JOIN u3 e3 ON e3.u = e1.u AND e3.v = e2.v),
        s3 AS (
          SELECT u, v, CAST(COUNT(*) AS BIGINT) AS sup FROM (
            SELECT a AS u, b AS v FROM t3
            UNION ALL SELECT b, c FROM t3
            UNION ALL SELECT a, c FROM t3) GROUP BY 1, 2)
        SELECT u3.u, u3.v, COALESCE(s3.sup, 0) AS support
        FROM u3 LEFT JOIN s3 USING (u, v)
        ORDER BY u, v""")),

    // Negative-binomial overdispersion fit of weekly per-brand demand by
    // method of moments: r̂ = m²/(v−m), p̂ = m/v — the count model that
    // captures what a Poisson assumption (variance = mean) misses.
    // Counts are exact integers end to end; brands that are NOT
    // overdispersed (v ≤ m) emit null fit parameters, loudly.
    "qbs_negbin_fit" -> Q(
      fn = (s, dir) => {
        val wk = t(s, dir, "lineitem")
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand").as("brand"),
            expr("unix_millis(CAST(l_shipdate AS TIMESTAMP))" +
              " div 86400000 div 7").as("w"))
          .agg(count(lit(1)).as("x"))
        val g = wk.groupBy(col("brand"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("x") * col("x")).as("sxx"))
          .withColumn("nd", col("n").cast("double"))
          .withColumn("m",
            round(col("sx").cast("double") / col("nd"), 9))
          .withColumn("v", round(
            (col("sxx").cast("double") -
              col("nd") * col("m") * col("m")) /
            (col("nd") - lit(1.0)), 9))
        g.select(col("brand"), col("n").as("n_weeks"),
            round(col("m"), 6).as("mean"),
            round(col("v"), 6).as("variance"),
            round(col("v") / col("m"), 6).as("dispersion"),
            when(col("v") > col("m"),
              round(col("m") * col("m") / (col("v") - col("m")), 6))
              .as("r_hat"),
            when(col("v") > col("m"),
              round(col("m") / col("v"), 6)).as("p_hat"))
          .orderBy(col("brand"))
      },
      oracle = Some("""
        WITH wk AS (
          SELECT p_brand AS brand,
                 CAST(epoch_ms(l_shipdate) // 86400000 // 7 AS BIGINT) AS w,
                 CAST(COUNT(*) AS BIGINT) AS x
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY 1, 2),
        g AS (
          SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(x * x) AS BIGINT) AS sxx
          FROM wk GROUP BY 1),
        f AS (
          SELECT brand, n, CAST(n AS DOUBLE) AS nd,
                 ROUND(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 9) AS m,
                 sxx
          FROM g),
        f2 AS (
          SELECT *, ROUND((CAST(sxx AS DOUBLE) - nd * m * m)
                   / (nd - CAST(1 AS DOUBLE)), 9) AS v
          FROM f)
        SELECT brand, n AS n_weeks,
               ROUND(m, 6) AS mean,
               ROUND(v, 6) AS variance,
               ROUND(v / m, 6) AS dispersion,
               CASE WHEN v > m
                    THEN ROUND(m * m / (v - m), 6) END AS r_hat,
               CASE WHEN v > m THEN ROUND(m / v, 6) END AS p_hat
        FROM f2 ORDER BY brand""")),

    // Adstock carryover regression: daily purchase counts regressed on
    // the geometric adstock of daily view counts (a_t = x_t + λ·a_{t−1},
    // λ = 0.5) — the marketing-mix transform that captures delayed ad
    // effect a plain same-week regression misses. Adstock is an ordered
    // fold on the 9-grid (the uuid5 flat-LIST-accumulator idiom carries
    // [current ∥ emitted] through DuckDB's list_reduce); OLS in closed
    // form from 6-grid DECIMAL moments.
    "qbt_adstock_regression" -> Q(
      fn = (s, dir) => {
        val e = Tables(s, dir, "events")
          .withColumn("w", expr("unix_millis(ts) div 86400000"))
        val wk = e.groupBy(col("w"))
          .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("x"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("yy"))
        val packed = wk
          .agg(count(lit(1)).as("n"),
            array_sort(collect_list(struct(col("w").as("o"),
              col("x").cast("double").as("x"),
              col("yy").cast("double").as("y")))).as("seq"))
          .withColumn("xs", transform(col("seq"), s0 => s0.getField("x")))
          .withColumn("ys", transform(col("seq"), s0 => s0.getField("y")))
        def stepAd(acc: Column, x: Column): Column = {
          val nw = round(x + lit(0.5) * element_at(acc, 1), 9)
          concat(array(nw), slice(acc, 2, 100000), array(nw))
        }
        val withAd = packed.withColumn("fold",
            aggregate(slice(col("xs"), lit(2),
              greatest(size(col("xs")) - 1, lit(0))),
              array(element_at(col("xs"), 1), element_at(col("xs"), 1)),
              stepAd))
          .withColumn("ad", slice(col("fold"), 2, 1000000))
        val rows = withAd.select(col("n"),
            posexplode(col("ad")).as(Seq("i", "a")))
          .join(withAd.select(posexplode(col("ys")).as(Seq("i", "y"))),
            Seq("i"))
        rows.groupBy(col("n"))
          .agg(count(lit(1)).as("nw"),
            sum(round(col("a"), 6).cast("decimal(28,6)")).as("sa"),
            sum(round(col("y"), 6).cast("decimal(28,6)")).as("sy"),
            sum(round(col("a") * col("y"), 6).cast("decimal(28,6)"))
              .as("say"),
            sum(round(col("a") * col("a"), 6).cast("decimal(28,6)"))
              .as("saa"),
            sum(round(col("y") * col("y"), 6).cast("decimal(28,6)"))
              .as("syy"))
          .withColumn("nd", col("nw").cast("double"))
          .withColumn("beta", round(
            (col("nd") * col("say").cast("double") -
              col("sa").cast("double") * col("sy").cast("double")) /
            (col("nd") * col("saa").cast("double") -
              col("sa").cast("double") * col("sa").cast("double")), 9))
          .withColumn("alpha", round(
            (col("sy").cast("double") - col("beta") *
              col("sa").cast("double")) / col("nd"), 9))
          .withColumn("r2num",
            (col("nd") * col("say").cast("double") -
              col("sa").cast("double") * col("sy").cast("double")))
          .select(col("nw").as("n_days"),
            round(col("beta"), 6).as("beta"),
            round(col("alpha"), 6).as("alpha"),
            round(col("r2num") * col("r2num") /
              ((col("nd") * col("saa").cast("double") -
                col("sa").cast("double") * col("sa").cast("double")) *
               (col("nd") * col("syy").cast("double") -
                col("sy").cast("double") * col("sy").cast("double"))), 6)
              .as("r2"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT epoch_ms(ts) // 86400000 AS w, event_type
          FROM events),
        wk AS (
          SELECT w,
                 CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                   AS BIGINT) AS x,
                 CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                   END) AS BIGINT) AS yy
          FROM e GROUP BY 1),
        packed AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 list(CAST(x AS DOUBLE) ORDER BY w) AS xs,
                 list(CAST(yy AS DOUBLE) ORDER BY w) AS ys
          FROM wk),
        folded AS (
          SELECT n, ys,
                 list_reduce(
                   list_prepend([xs[1], xs[1]],
                     list_transform(xs[2:], x -> [x])),
                   (acc, e) -> list_prepend(
                     ROUND(e[1] + CAST(0.5 AS DOUBLE) * acc[1], 9),
                     acc[2:] ||
                       [ROUND(e[1] + CAST(0.5 AS DOUBLE) * acc[1], 9)]))
                   AS fold
          FROM packed),
        rows_ AS (
          SELECT n, i, fold[2:][i] AS a, ys[i] AS y
          FROM (SELECT n, ys, fold,
                       unnest(range(1, CAST(n AS INT) + 1)) AS i
                FROM folded)),
        mom AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS nw,
                 SUM(CAST(ROUND(a, 6) AS DECIMAL(28,6))) AS sa,
                 SUM(CAST(ROUND(y, 6) AS DECIMAL(28,6))) AS sy,
                 SUM(CAST(ROUND(a * y, 6) AS DECIMAL(28,6))) AS say,
                 SUM(CAST(ROUND(a * a, 6) AS DECIMAL(28,6))) AS saa,
                 SUM(CAST(ROUND(y * y, 6) AS DECIMAL(28,6))) AS syy
          FROM rows_),
        f AS (
          SELECT nw, CAST(nw AS DOUBLE) AS nd,
                 CAST(sa AS DOUBLE) AS sad, CAST(sy AS DOUBLE) AS syd,
                 CAST(say AS DOUBLE) AS sayd, CAST(saa AS DOUBLE) AS saad,
                 CAST(syy AS DOUBLE) AS syyd
          FROM mom),
        f2 AS (
          SELECT *, ROUND((nd * sayd - sad * syd)
                   / (nd * saad - sad * sad), 9) AS beta
          FROM f)
        SELECT nw AS n_days,
               ROUND(beta, 6) + CAST(0 AS DOUBLE) AS beta,
               ROUND((syd - beta * sad) / nd, 6) + CAST(0 AS DOUBLE)
                 AS alpha,
               ROUND((nd * sayd - sad * syd) * (nd * sayd - sad * syd)
                 / ((nd * saad - sad * sad) * (nd * syyd - syd * syd)), 6)
                 AS r2
        FROM f2""")),

    // Weibull fit of conversion times by median-rank regression (the
    // reliability-engineering "Weibull plot"): uncensored durations
    // sorted, Bernard's approximation F_i = (i−0.3)/(n+0.4), OLS of
    // ln(−ln(1−F)) on ln t — slope = shape k̂, and the scale is emitted
    // in LOG form (ln λ̂ = −intercept/k̂; exponentiating is display-side,
    // exp being the one non-replayable link). Ranks off the
    // range-partitioned global row number; tied durations are
    // order-invariant (same t, the (ln t, y_i) pair multiset is
    // identical whichever tied row takes which rank).
    "qbu_weibull_fit" -> Q(
      fn = (s, dir) => {
        val e = Tables(s, dir, "events")
          .withColumn("ts_ms", unix_millis(col("ts")))
        val v0 = e.filter(col("event_type") === "view")
          .groupBy("user_id").agg(min(col("ts_ms")).as("t0"))
        val te = e.filter(col("event_type") === "purchase")
          .select(col("user_id"), col("ts_ms"))
          .join(v0, "user_id")
          .filter(col("ts_ms") >= col("t0"))
          .groupBy("user_id").agg(min(col("ts_ms")).as("te"))
        val durs = v0.join(te, Seq("user_id"))
          .select(col("user_id"), ((col("te") - col("t0")) / lit(3600000.0))
            .as("t"))
          .filter(col("t") > 0)
        val ranked = graft.operators.ScaleOps.globalRowNumber(durs,
          Seq(col("t"), col("user_id")), "i")
        val n = ranked.agg(count(lit(1)).as("n"))
        val pts = ranked.crossJoin(broadcast(n))
          .select(
            round(log(col("t")), 9).as("x"),
            round(log(-log(lit(1.0) -
              (col("i").cast("double") - lit(0.3)) /
              (col("n").cast("double") + lit(0.4)))), 9).as("y"),
            col("n"))
        pts.groupBy(col("n"))
          .agg(
            sum(col("x").cast("decimal(28,9)")).as("sx"),
            sum(col("y").cast("decimal(28,9)")).as("sy"),
            sum(round(col("x") * col("y"), 6).cast("decimal(28,6)"))
              .as("sxy"),
            sum(round(col("x") * col("x"), 6).cast("decimal(28,6)"))
              .as("sxx"))
          .withColumn("nd", col("n").cast("double"))
          .withColumn("shape", round(
            (col("nd") * col("sxy").cast("double") -
              col("sx").cast("double") * col("sy").cast("double")) /
            (col("nd") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")), 9))
          .withColumn("icept", round(
            (col("sy").cast("double") - col("shape") *
              col("sx").cast("double")) / col("nd"), 9))
          .select(col("n").as("n_conversions"),
            round(col("shape"), 6).as("weibull_shape"),
            round(-col("icept") / col("shape"), 6).as("ln_scale_hours"))
      },
      oracle = Some("""
        WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms
                   FROM events),
        v0 AS (SELECT user_id, MIN(ts_ms) AS t0 FROM e
               WHERE event_type = 'view' GROUP BY 1),
        te AS (SELECT e.user_id, MIN(e.ts_ms) AS te
               FROM e JOIN v0 USING (user_id)
               WHERE e.event_type = 'purchase' AND e.ts_ms >= v0.t0
               GROUP BY 1),
        durs AS (
          SELECT v0.user_id,
                 CAST(te.te - v0.t0 AS DOUBLE) / CAST(3600000 AS DOUBLE)
                   AS t
          FROM v0 JOIN te ON v0.user_id = te.user_id
          WHERE CAST(te.te - v0.t0 AS DOUBLE) > 0),
        ranked AS (
          SELECT t, CAST(ROW_NUMBER() OVER (ORDER BY t, user_id) AS BIGINT)
                   AS i,
                 CAST(COUNT(*) OVER () AS BIGINT) AS n
          FROM durs),
        pts AS (
          SELECT n, ROUND(ln(t), 9) AS x,
                 ROUND(ln(-ln(CAST(1 AS DOUBLE)
                   - (CAST(i AS DOUBLE) - CAST(0.3 AS DOUBLE))
                     / (CAST(n AS DOUBLE) + CAST(0.4 AS DOUBLE)))), 9) AS y
          FROM ranked),
        mom AS (
          SELECT n,
                 SUM(CAST(x AS DECIMAL(28,9))) AS sx,
                 SUM(CAST(y AS DECIMAL(28,9))) AS sy,
                 SUM(CAST(ROUND(x * y, 6) AS DECIMAL(28,6))) AS sxy,
                 SUM(CAST(ROUND(x * x, 6) AS DECIMAL(28,6))) AS sxx
          FROM pts GROUP BY 1),
        f AS (
          SELECT n, CAST(n AS DOUBLE) AS nd, CAST(sx AS DOUBLE) AS sxd,
                 CAST(sy AS DOUBLE) AS syd, CAST(sxy AS DOUBLE) AS sxyd,
                 CAST(sxx AS DOUBLE) AS sxxd
          FROM mom),
        f2 AS (
          SELECT *, ROUND((nd * sxyd - sxd * syd)
                   / (nd * sxxd - sxd * sxd), 9) AS shape
          FROM f),
        f3 AS (
          SELECT *, ROUND((syd - shape * sxd) / nd, 9) AS icept
          FROM f2)
        SELECT n AS n_conversions,
               ROUND(shape, 6) AS weibull_shape,
               ROUND(-icept / shape, 6) + CAST(0 AS DOUBLE)
                 AS ln_scale_hours
        FROM f3""")),

    // Chapman capture-recapture: estimate the total customer population
    // from two observation windows (orders in 1996 vs 1999) — the
    // nearly-unbiased (n1+1)(n2+1)/(m+1) − 1 estimator with its closed-
    // form variance, next to the naive Lincoln-Petersen and the actually
    // observed distinct count for calibration. The coverage-estimation
    // primitive ("how much of the population has our pipeline seen").
    "qbv_capture_recapture" -> Q(
      fn = (s, dir) => {
        val o = t(s, dir, "orders")
        def inYear(y: Int) = o
          .filter(year(col("o_orderdate")) === y)
          .select(col("o_custkey")).distinct()
        val s1 = inYear(1996)
        val s2 = inYear(1999)
        val stats = s1.agg(count(lit(1)).as("n1"))
          .crossJoin(s2.agg(count(lit(1)).as("n2")))
          .crossJoin(s1.join(s2, Seq("o_custkey"))
            .agg(count(lit(1)).as("m")))
          .crossJoin(o.select(col("o_custkey")).distinct()
            .agg(count(lit(1)).as("observed_ever")))
        stats
          .withColumn("chap",
            round((col("n1") + 1).cast("double") *
              (col("n2") + 1).cast("double") /
              (col("m") + 1).cast("double") - lit(1.0), 9))
          .withColumn("varc",
            (col("n1") + 1).cast("double") * (col("n2") + 1).cast("double") *
              (col("n1") - col("m")).cast("double") *
              (col("n2") - col("m")).cast("double") /
              ((col("m") + 1).cast("double") * (col("m") + 1).cast("double") *
               (col("m") + 2).cast("double")))
          .select(col("n1"), col("n2"), col("m"), col("observed_ever"),
            round(col("chap"), 6).as("chapman_n"),
            round(sqrt(col("varc")), 6).as("chapman_se"),
            when(col("m") > 0,
              round(col("n1").cast("double") * col("n2").cast("double") /
                col("m").cast("double"), 6)).as("lincoln_petersen"))
      },
      oracle = Some("""
        WITH s1 AS (SELECT DISTINCT o_custkey FROM orders
                    WHERE year(o_orderdate) = 1996),
        s2 AS (SELECT DISTINCT o_custkey FROM orders
               WHERE year(o_orderdate) = 1999),
        st AS (
          SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n1,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS n2,
                 (SELECT CAST(COUNT(*) AS BIGINT)
                  FROM s1 JOIN s2 USING (o_custkey)) AS m,
                 (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
                  FROM orders) AS observed_ever),
        f AS (
          SELECT *,
                 ROUND(CAST(n1 + 1 AS DOUBLE) * CAST(n2 + 1 AS DOUBLE)
                   / CAST(m + 1 AS DOUBLE) - CAST(1 AS DOUBLE), 9) AS chap,
                 CAST(n1 + 1 AS DOUBLE) * CAST(n2 + 1 AS DOUBLE)
                   * CAST(n1 - m AS DOUBLE) * CAST(n2 - m AS DOUBLE)
                   / (CAST(m + 1 AS DOUBLE) * CAST(m + 1 AS DOUBLE)
                      * CAST(m + 2 AS DOUBLE)) AS varc
          FROM st)
        SELECT n1, n2, m, observed_ever,
               ROUND(chap, 6) AS chapman_n,
               ROUND(SQRT(varc), 6) AS chapman_se,
               CASE WHEN m > 0 THEN
                 ROUND(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                   / CAST(m AS DOUBLE), 6) END AS lincoln_petersen
        FROM f""")),

    // Bivariate Mahalanobis outliers over (ln spend, ln order count) per
    // customer: means and the 2×2 covariance from one DECIMAL moment
    // pass, the closed-form inverse inside a fixed-shape d² expression,
    // top 20 by distance (total tiebreak) with the χ²₂ 99.9% flag —
    // the CORRELATION-AWARE outlier score q6i's per-axis MAD cannot
    // express (a point can be 3σ-normal on each axis yet wildly off the
    // correlation ridge).
    "qbw_mahalanobis_outliers" -> Q(
      fn = (s, dir) => {
        val per = t(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("spend"),
            count(lit(1)).as("cnt"))
          .select(col("o_custkey").as("cust"),
            round(log(col("spend").cast("double")), 9).as("a"),
            round(log(col("cnt").cast("double")), 9).as("b"))
          .localCheckpoint(eager = false)
        val mom = per.agg(count(lit(1)).as("n"),
          sum(col("a").cast("decimal(28,9)")).as("sa"),
          sum(col("b").cast("decimal(28,9)")).as("sb"),
          sum(round(col("a") * col("a"), 6).cast("decimal(28,6)")).as("saa"),
          sum(round(col("b") * col("b"), 6).cast("decimal(28,6)")).as("sbb"),
          sum(round(col("a") * col("b"), 6).cast("decimal(28,6)")).as("sab"))
        val cov = mom
          .withColumn("nd", col("n").cast("double"))
          .withColumn("ma", round(col("sa").cast("double") / col("nd"), 9))
          .withColumn("mb", round(col("sb").cast("double") / col("nd"), 9))
          .withColumn("s11",
            round((col("saa").cast("double") -
              col("nd") * col("ma") * col("ma")) /
              (col("nd") - lit(1.0)), 9))
          .withColumn("s22",
            round((col("sbb").cast("double") -
              col("nd") * col("mb") * col("mb")) /
              (col("nd") - lit(1.0)), 9))
          .withColumn("s12",
            round((col("sab").cast("double") -
              col("nd") * col("ma") * col("mb")) /
              (col("nd") - lit(1.0)), 9))
          .select(col("ma"), col("mb"), col("s11"), col("s22"), col("s12"))
        per.crossJoin(broadcast(cov))
          .withColumn("da", col("a") - col("ma"))
          .withColumn("db", col("b") - col("mb"))
          .withColumn("det",
            col("s11") * col("s22") - col("s12") * col("s12"))
          .withColumn("d2", round(
            (col("s22") * col("da") * col("da") -
              lit(2.0) * col("s12") * col("da") * col("db") +
              col("s11") * col("db") * col("db")) / col("det"), 9))
          .orderBy(col("d2").desc, col("cust"))
          .limit(20)
          .select(col("cust"), round(col("a"), 6).as("ln_spend"),
            round(col("b"), 6).as("ln_orders"),
            round(col("d2"), 6).as("mahalanobis_d2"),
            when(col("d2") > lit(13.816), 1).otherwise(0).as("extreme"))
      },
      oracle = Some("""
        WITH per AS (
          SELECT o_custkey AS cust,
                 ROUND(ln(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                   AS DOUBLE)), 9) AS a,
                 ROUND(ln(CAST(COUNT(*) AS DOUBLE)), 9) AS b
          FROM orders GROUP BY 1),
        mom AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(a AS DECIMAL(28,9))) AS sa,
                 SUM(CAST(b AS DECIMAL(28,9))) AS sb,
                 SUM(CAST(ROUND(a * a, 6) AS DECIMAL(28,6))) AS saa,
                 SUM(CAST(ROUND(b * b, 6) AS DECIMAL(28,6))) AS sbb,
                 SUM(CAST(ROUND(a * b, 6) AS DECIMAL(28,6))) AS sab
          FROM per),
        c1 AS (
          SELECT CAST(n AS DOUBLE) AS nd,
                 ROUND(CAST(sa AS DOUBLE) / CAST(n AS DOUBLE), 9) AS ma,
                 ROUND(CAST(sb AS DOUBLE) / CAST(n AS DOUBLE), 9) AS mb,
                 CAST(saa AS DOUBLE) AS saad, CAST(sbb AS DOUBLE) AS sbbd,
                 CAST(sab AS DOUBLE) AS sabd
          FROM mom),
        cov AS (
          SELECT ma, mb,
                 ROUND((saad - nd * ma * ma) / (nd - CAST(1 AS DOUBLE)), 9)
                   AS s11,
                 ROUND((sbbd - nd * mb * mb) / (nd - CAST(1 AS DOUBLE)), 9)
                   AS s22,
                 ROUND((sabd - nd * ma * mb) / (nd - CAST(1 AS DOUBLE)), 9)
                   AS s12
          FROM c1),
        d AS (
          SELECT per.cust, per.a, per.b,
                 ROUND((cov.s22 * (per.a - cov.ma) * (per.a - cov.ma)
                   - CAST(2 AS DOUBLE) * cov.s12 * (per.a - cov.ma)
                     * (per.b - cov.mb)
                   + cov.s11 * (per.b - cov.mb) * (per.b - cov.mb))
                   / (cov.s11 * cov.s22 - cov.s12 * cov.s12), 9) AS d2
          FROM per CROSS JOIN cov)
        SELECT cust, ROUND(a, 6) AS ln_spend, ROUND(b, 6) AS ln_orders,
               ROUND(d2, 6) AS mahalanobis_d2,
               CASE WHEN d2 > CAST(13.816 AS DOUBLE) THEN 1 ELSE 0 END
                 AS extreme
        FROM d ORDER BY d2 DESC, cust LIMIT 20""")),

    // Hurst exponent by rescaled-range (R/S) analysis of daily revenue:
    // dyadic block sizes 8..64, per-block cumulative-deviation range over
    // EXACT DECIMAL prefixes (a windowed double sum is not order-safe —
    // DuckDB's segment-tree accumulation adds in a different order than
    // Spark's incremental frame), H = slope of mean ln(R/S) on ln(n).
    // H≈0.5 is a random walk; the long-memory diagnostic next to qb5's
    // tail index and qb6's Haar cascade. Windows run only over ≤64-row
    // blocks.
    "qbx_hurst_rs" -> Q(
      fn = (s, dir) => {
        val daily = t(s, dir, "orders")
          .groupBy(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP))" +
            " div 86400000").as("day"))
          .agg((sum(col("o_totalprice").cast("decimal(18,2)")) /
            lit(1000000)).cast("decimal(14,8)").as("ym"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(daily,
          Seq(col("day")), "rn").localCheckpoint(eager = false)
        val n = ranked.agg(count(lit(1)).as("n"))
        val sizes = s.createDataFrame(Seq(Tuple1(8L), Tuple1(16L),
          Tuple1(32L), Tuple1(64L))).toDF("bs")
        val blocks = ranked.crossJoin(broadcast(sizes))
          .crossJoin(broadcast(n))
          .withColumn("blk", ((col("rn") - 1) / col("bs")).cast("long"))
          .filter(col("blk") < (col("n") / col("bs")).cast("long"))
        val bm = blocks.groupBy(col("bs"), col("blk"))
          .agg(sum(col("ym")).as("sym"))
          .select(col("bs"), col("blk"),
            round(col("sym").cast("double") / col("bs").cast("double"), 9)
              .as("m"))
        val withMean = blocks
          .join(bm, Seq("bs", "blk"))
          .withColumn("dev",
            (col("ym") - col("m").cast("decimal(18,9)"))
              .cast("decimal(15,9)"))
        val w = Window.partitionBy(col("bs"), col("blk")).orderBy(col("rn"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val perBlock = withMean
          .withColumn("pref", sum(col("dev")).over(w))
          .groupBy(col("bs"), col("blk"))
          .agg(
            max(col("pref")).as("mx"), min(col("pref")).as("mn"),
            sum(round(col("dev") * col("dev"), 12).cast("decimal(28,12)"))
              .as("ss"),
            count(lit(1)).as("cnt"))
          .withColumn("r", round(
            greatest(col("mx").cast("double"), lit(0.0)) -
            least(col("mn").cast("double"), lit(0.0)), 9))
          .withColumn("sdev", round(sqrt(col("ss").cast("double") /
            col("cnt").cast("double")), 9))
          .filter(col("sdev") > 0)
          .withColumn("lrs", round(log(col("r") / col("sdev")), 9))
        val perSize = perBlock.groupBy(col("bs"))
          .agg(count(lit(1)).as("n_blocks"),
            sum(col("lrs").cast("decimal(28,9)")).as("sl"))
          .withColumn("mlrs", round(col("sl").cast("double") /
            col("n_blocks").cast("double"), 9))
          .withColumn("lx", round(log(col("bs").cast("double")), 9))
          .localCheckpoint(eager = false)
        val slope = perSize.agg(count(lit(1)).as("k"),
            sum(col("lx").cast("decimal(28,9)")).as("sx"),
            sum(col("mlrs").cast("decimal(28,9)")).as("sy"),
            sum(round(col("lx") * col("mlrs"), 12).cast("decimal(28,12)"))
              .as("sxy"),
            sum(round(col("lx") * col("lx"), 12).cast("decimal(28,12)"))
              .as("sxx"))
          .select(round(
            (col("k").cast("double") * col("sxy").cast("double") -
              col("sx").cast("double") * col("sy").cast("double")) /
            (col("k").cast("double") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")), 6)
            .as("hurst"))
        perSize.crossJoin(broadcast(slope))
          .select(col("bs"), col("n_blocks"),
            round(col("mlrs"), 6).as("mean_log_rs"), col("hurst"))
          .orderBy(col("bs"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT CAST(epoch_ms(o_orderdate) // 86400000 AS BIGINT) AS day,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) / 1000000
                   AS DECIMAL(14,8)) AS ym
          FROM orders GROUP BY 1),
        ranked AS (
          SELECT ym, ROW_NUMBER() OVER (ORDER BY day) AS rn,
                 CAST(COUNT(*) OVER () AS BIGINT) AS n
          FROM daily),
        sizes AS (SELECT CAST(unnest([8, 16, 32, 64]) AS BIGINT) AS bs),
        blocks AS (
          SELECT r.ym, r.rn, s.bs, CAST((r.rn - 1) // s.bs AS BIGINT) AS blk
          FROM ranked r CROSS JOIN sizes s
          WHERE CAST((r.rn - 1) // s.bs AS BIGINT) < r.n // s.bs),
        means AS (
          SELECT bs, blk,
                 ROUND(CAST(SUM(ym) AS DOUBLE) / CAST(bs AS DOUBLE), 9) AS m
          FROM blocks GROUP BY 1, 2),
        dev AS (
          SELECT b.bs, b.blk, b.rn,
                 CAST(b.ym - CAST(m.m AS DECIMAL(18,9)) AS DECIMAL(15,9))
                   AS dev
          FROM blocks b JOIN means m ON b.bs = m.bs AND b.blk = m.blk),
        pref AS (
          SELECT bs, blk, dev,
                 SUM(dev) OVER (PARTITION BY bs, blk ORDER BY rn
                   ROWS UNBOUNDED PRECEDING) AS pref
          FROM dev),
        pb AS (
          SELECT bs, blk,
                 ROUND(GREATEST(CAST(MAX(pref) AS DOUBLE), CAST(0 AS DOUBLE))
                   - LEAST(CAST(MIN(pref) AS DOUBLE), CAST(0 AS DOUBLE)), 9)
                   AS r,
                 ROUND(SQRT(CAST(SUM(CAST(ROUND(
                     CAST(dev AS DECIMAL(19,9)) * CAST(dev AS DECIMAL(19,9)),
                     12) AS DECIMAL(28,12))) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE)), 9) AS sdev
          FROM pref GROUP BY 1, 2),
        lrs AS (
          SELECT bs, ROUND(ln(r / sdev), 9) AS lrs
          FROM pb WHERE sdev > 0),
        ps AS MATERIALIZED (
          SELECT bs, CAST(COUNT(*) AS BIGINT) AS n_blocks,
                 ROUND(CAST(SUM(CAST(lrs AS DECIMAL(28,9))) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE), 9) AS mlrs,
                 ROUND(ln(CAST(bs AS DOUBLE)), 9) AS lx
          FROM lrs GROUP BY 1),
        sl AS (
          SELECT CAST(COUNT(*) AS DOUBLE) AS k,
                 CAST(SUM(CAST(lx AS DECIMAL(28,9))) AS DOUBLE) AS sx,
                 CAST(SUM(CAST(mlrs AS DECIMAL(28,9))) AS DOUBLE) AS sy,
                 CAST(SUM(CAST(ROUND(lx * mlrs, 12) AS DECIMAL(28,12)))
                   AS DOUBLE) AS sxy,
                 CAST(SUM(CAST(ROUND(lx * lx, 12) AS DECIMAL(28,12)))
                   AS DOUBLE) AS sxx
          FROM ps),
        h AS (
          SELECT ROUND((k * sxy - sx * sy) / (k * sxx - sx * sx), 6)
                   AS hurst
          FROM sl)
        SELECT ps.bs, ps.n_blocks, ROUND(ps.mlrs, 6) AS mean_log_rs,
               h.hurst
        FROM ps CROSS JOIN h ORDER BY ps.bs""")),

    // Two-way fixed-effects (within) regression of ln monthly nation
    // revenue on ln order count: ÿ = y − ȳ_i − ȳ_t + ȳ strips every
    // nation-level and month-level confounder before the slope — the
    // panel-econometrics workhorse between pooled OLS (qa0) and DiD
    // (qbk). Cells are the bounded nation × month table; all demeaning
    // means ride DECIMAL(28,9) sums.
    "qby_panel_fixed_effects" -> Q(
      fn = (s, dir) => {
        val cell = t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_nationkey").as("i"),
            expr("unix_millis(CAST(o_orderdate AS TIMESTAMP))" +
              " div 86400000 div 30").as("tt"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"),
            count(lit(1)).as("cnt"))
          .select(col("i"), col("tt"),
            round(log(col("rev").cast("double")), 9).as("y"),
            round(log(col("cnt").cast("double")), 9).as("x"))
          .localCheckpoint(eager = false)
        def meansBy(keys: Seq[String], ya: String, xa: String) = {
          val grouped = if (keys.isEmpty) cell.groupBy()
                        else cell.groupBy(keys.map(col): _*)
          grouped.agg(count(lit(1)).as("__c"),
              sum(col("y").cast("decimal(28,9)")).as("__sy"),
              sum(col("x").cast("decimal(28,9)")).as("__sx"))
            .select((keys.map(col) ++ Seq(
              round(col("__sy").cast("double") / col("__c").cast("double"),
                9).as(ya),
              round(col("__sx").cast("double") / col("__c").cast("double"),
                9).as(xa))): _*)
        }
        val mi = meansBy(Seq("i"), "yi", "xi")
        val mt = meansBy(Seq("tt"), "yt", "xt")
        val mg = meansBy(Seq.empty, "yg", "xg")
        val within = cell.join(mi, Seq("i")).join(mt, Seq("tt"))
          .crossJoin(broadcast(mg))
          .withColumn("yd",
            col("y") - col("yi") - col("yt") + col("yg"))
          .withColumn("xd",
            col("x") - col("xi") - col("xt") + col("xg"))
        val counts = cell.agg(count(lit(1)).as("n"),
          countDistinct(col("i")).as("ni"),
          countDistinct(col("tt")).as("nt"))
        val mom = within.agg(
          sum(round(col("xd") * col("yd"), 12).cast("decimal(28,12)"))
            .as("sxy"),
          sum(round(col("xd") * col("xd"), 12).cast("decimal(28,12)"))
            .as("sxx"))
          .withColumn("beta", round(col("sxy").cast("double") /
            col("sxx").cast("double"), 9))
        val sse = within.crossJoin(broadcast(mom.select(col("beta"))))
          .agg(sum(round(
            (col("yd") - col("beta") * col("xd")) *
            (col("yd") - col("beta") * col("xd")), 12)
            .cast("decimal(28,12)")).as("ssr"))
        mom.crossJoin(broadcast(sse)).crossJoin(broadcast(counts))
          .withColumn("df",
            (col("n") - col("ni") - col("nt") + 1).cast("double"))
          .withColumn("se", round(sqrt(
            (col("ssr").cast("double") / col("df")) /
            col("sxx").cast("double")), 9))
          .select(col("n").as("n_cells"), col("ni").as("n_nations"),
            col("nt").as("n_months"),
            round(col("beta"), 6).as("beta_within"),
            round(col("se"), 6).as("se"),
            round(col("beta") / col("se"), 6).as("t_stat"))
      },
      oracle = Some("""
        WITH cell AS (
          SELECT c_nationkey AS i,
                 CAST(epoch_ms(o_orderdate) // 86400000 // 30 AS BIGINT)
                   AS tt,
                 ROUND(ln(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                   AS DOUBLE)), 9) AS y,
                 ROUND(ln(CAST(COUNT(*) AS DOUBLE)), 9) AS x
          FROM orders JOIN customer ON o_custkey = c_custkey
          GROUP BY 1, 2),
        mi AS (
          SELECT i,
                 ROUND(CAST(SUM(CAST(y AS DECIMAL(28,9))) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE), 9) AS yi,
                 ROUND(CAST(SUM(CAST(x AS DECIMAL(28,9))) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE), 9) AS xi
          FROM cell GROUP BY 1),
        mt AS (
          SELECT tt,
                 ROUND(CAST(SUM(CAST(y AS DECIMAL(28,9))) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE), 9) AS yt,
                 ROUND(CAST(SUM(CAST(x AS DECIMAL(28,9))) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE), 9) AS xt
          FROM cell GROUP BY 1),
        mg AS (
          SELECT ROUND(CAST(SUM(CAST(y AS DECIMAL(28,9))) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE), 9) AS yg,
                 ROUND(CAST(SUM(CAST(x AS DECIMAL(28,9))) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE), 9) AS xg
          FROM cell),
        within AS MATERIALIZED (
          SELECT cell.y - mi.yi - mt.yt + mg.yg AS yd,
                 cell.x - mi.xi - mt.xt + mg.xg AS xd
          FROM cell JOIN mi USING (i) JOIN mt USING (tt) CROSS JOIN mg),
        counts AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(COUNT(DISTINCT i) AS BIGINT) AS ni,
                 CAST(COUNT(DISTINCT tt) AS BIGINT) AS nt
          FROM cell),
        mom AS (
          SELECT CAST(SUM(CAST(ROUND(xd * yd, 12) AS DECIMAL(28,12)))
                   AS DOUBLE) AS sxy,
                 CAST(SUM(CAST(ROUND(xd * xd, 12) AS DECIMAL(28,12)))
                   AS DOUBLE) AS sxx
          FROM within),
        b AS (SELECT *, ROUND(sxy / sxx, 9) AS beta FROM mom),
        sse AS (
          SELECT CAST(SUM(CAST(ROUND((yd - b.beta * xd)
                   * (yd - b.beta * xd), 12) AS DECIMAL(28,12))) AS DOUBLE)
                   AS ssr
          FROM within CROSS JOIN b),
        f AS (
          SELECT counts.n, counts.ni, counts.nt, b.beta, b.sxx, sse.ssr,
                 CAST(counts.n - counts.ni - counts.nt + 1 AS DOUBLE) AS df
          FROM counts CROSS JOIN b CROSS JOIN sse),
        f2 AS (
          SELECT *, ROUND(SQRT((ssr / df) / sxx), 9) AS se
          FROM f)
        SELECT n AS n_cells, ni AS n_nations, nt AS n_months,
               ROUND(beta, 6) + CAST(0 AS DOUBLE) AS beta_within,
               ROUND(se, 6) AS se,
               ROUND(beta / se, 6) + CAST(0 AS DOUBLE) AS t_stat
        FROM f2""")),

    // Bass diffusion fit of customer adoption: monthly NEW adopters
    // regressed on cumulative adopters and its square (the discrete Bass
    // form n_t = pM + (q−p)C − (q/M)C²), solved by Cramer's rule over a
    // 3×3 normal-equation system whose power moments stay EXACT 64-bit
    // integers (C ≤ 15 k ⇒ ΣC⁴ < 2⁶³), then (M̂, p̂, q̂) recovered from
    // the quadratic root — innovation vs imitation coefficients for the
    // adoption curve, the diffusion twin of qb8's extreme-value fit.
    "qbz_bass_diffusion" -> Q(
      fn = (s, dir) => {
        val first = t(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(min(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP))" +
            " div 86400000 div 30")).as("mo"))
        val adopt = first.groupBy(col("mo"))
          .agg(count(lit(1)).as("nn"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(adopt,
            Seq(col("mo")), "rn")
          .localCheckpoint(eager = false)
        val cum = graft.operators.ScaleOps.globalRunningSum(ranked,
            Seq(col("rn")), col("nn"), "ctot")
          .withColumn("c", col("ctot") - col("nn"))
        val mom = cum
          .withColumn("c2", col("c") * col("c"))
          .agg(count(lit(1)).as("n"),
            sum(col("c")).as("s1"), sum(col("c2")).as("s2"),
            sum(col("c2") * col("c")).as("s3"),
            sum(col("c2") * col("c2")).as("s4"),
            sum(col("nn")).as("t0"), sum(col("nn") * col("c")).as("t1"),
            sum(col("nn") * col("c2")).as("t2"))
        val d = mom.select(
          col("n").cast("double").as("s0"), col("s1").cast("double").as("s1"),
          col("s2").cast("double").as("s2"), col("s3").cast("double").as("s3"),
          col("s4").cast("double").as("s4"), col("t0").cast("double").as("t0"),
          col("t1").cast("double").as("t1"), col("t2").cast("double").as("t2"),
          col("n"))
        val solved = d
          .withColumn("det",
            col("s0") * (col("s2") * col("s4") - col("s3") * col("s3")) -
            col("s1") * (col("s1") * col("s4") - col("s2") * col("s3")) +
            col("s2") * (col("s1") * col("s3") - col("s2") * col("s2")))
          .withColumn("a", round((
            col("t0") * (col("s2") * col("s4") - col("s3") * col("s3")) -
            col("s1") * (col("t1") * col("s4") - col("t2") * col("s3")) +
            col("s2") * (col("t1") * col("s3") - col("t2") * col("s2"))) /
            col("det"), 9))
          .withColumn("b", round((
            col("s0") * (col("t1") * col("s4") - col("t2") * col("s3")) -
            col("t0") * (col("s1") * col("s4") - col("s2") * col("s3")) +
            col("s2") * (col("s1") * col("t2") - col("s2") * col("t1"))) /
            col("det"), 9))
          .withColumn("cc", round((
            col("s0") * (col("s2") * col("t2") - col("s3") * col("t1")) -
            col("s1") * (col("s1") * col("t2") - col("s3") * col("t0")) +
            col("s2") * (col("s1") * col("t1") - col("s2") * col("t0"))) /
            col("det"), 9))
        solved
          .withColumn("disc", col("b") * col("b") - lit(4.0) * col("a") *
            col("cc"))
          .withColumn("mhat",
            when(col("cc") < 0 && col("disc") > 0,
              round((-col("b") - sqrt(col("disc"))) / (lit(2.0) * col("cc")),
                9)))
          .withColumn("p", when(col("mhat").isNotNull,
            round(col("a") / col("mhat"), 9)))
          .select(col("n").as("n_months"),
            round(col("a"), 6).as("coef_const"),
            round(col("b"), 6).as("coef_c"),
            round(col("cc"), 6).as("coef_c2"),
            round(col("mhat"), 2).as("market_size"),
            round(col("p"), 6).as("p_innovation"),
            when(col("p").isNotNull, round(col("b") + col("p"), 6))
              .as("q_imitation"))
      },
      oracle = Some("""
        WITH first_o AS (
          SELECT o_custkey,
                 MIN(CAST(epoch_ms(o_orderdate) // 86400000 // 30
                   AS BIGINT)) AS mo
          FROM orders GROUP BY 1),
        adopt AS (
          SELECT mo, CAST(COUNT(*) AS BIGINT) AS nn
          FROM first_o GROUP BY 1),
        cum AS (
          SELECT nn,
                 CAST(SUM(nn) OVER (ORDER BY mo ROWS UNBOUNDED PRECEDING)
                   AS BIGINT) - nn AS c
          FROM adopt),
        mom AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(c) AS BIGINT) AS s1,
                 CAST(SUM(c * c) AS BIGINT) AS s2,
                 CAST(SUM(c * c * c) AS BIGINT) AS s3,
                 CAST(SUM(c * c * c * c) AS BIGINT) AS s4,
                 CAST(SUM(nn) AS BIGINT) AS t0,
                 CAST(SUM(nn * c) AS BIGINT) AS t1,
                 CAST(SUM(nn * c * c) AS BIGINT) AS t2
          FROM cum),
        d AS (
          SELECT CAST(n AS DOUBLE) AS s0, CAST(s1 AS DOUBLE) AS s1,
                 CAST(s2 AS DOUBLE) AS s2, CAST(s3 AS DOUBLE) AS s3,
                 CAST(s4 AS DOUBLE) AS s4, CAST(t0 AS DOUBLE) AS t0,
                 CAST(t1 AS DOUBLE) AS t1, CAST(t2 AS DOUBLE) AS t2,
                 n
          FROM mom),
        dt AS (
          SELECT *, s0 * (s2 * s4 - s3 * s3) - s1 * (s1 * s4 - s2 * s3)
                   + s2 * (s1 * s3 - s2 * s2) AS det
          FROM d),
        sv AS (
          SELECT *,
            ROUND((t0 * (s2 * s4 - s3 * s3) - s1 * (t1 * s4 - t2 * s3)
              + s2 * (t1 * s3 - t2 * s2)) / det, 9) AS a,
            ROUND((s0 * (t1 * s4 - t2 * s3) - t0 * (s1 * s4 - s2 * s3)
              + s2 * (s1 * t2 - s2 * t1)) / det, 9) AS b,
            ROUND((s0 * (s2 * t2 - s3 * t1) - s1 * (s1 * t2 - s3 * t0)
              + s2 * (s1 * t1 - s2 * t0)) / det, 9) AS cc
          FROM dt),
        sv2 AS (
          SELECT *, b * b - CAST(4 AS DOUBLE) * a * cc AS disc
          FROM sv),
        sv3 AS (
          SELECT *,
            CASE WHEN cc < 0 AND disc > 0
                 THEN ROUND((-b - SQRT(disc)) / (CAST(2 AS DOUBLE) * cc), 9)
            END AS mhat
          FROM sv2),
        sv4 AS (
          SELECT *, CASE WHEN mhat IS NOT NULL
                         THEN ROUND(a / mhat, 9) END AS p
          FROM sv3)
        SELECT n AS n_months,
               ROUND(a, 6) + CAST(0 AS DOUBLE) AS coef_const,
               ROUND(b, 6) + CAST(0 AS DOUBLE) AS coef_c,
               ROUND(cc, 6) + CAST(0 AS DOUBLE) AS coef_c2,
               ROUND(mhat, 2) AS market_size,
               ROUND(p, 6) AS p_innovation,
               CASE WHEN p IS NOT NULL
                    THEN ROUND(b + p, 6) + CAST(0 AS DOUBLE) END
                 AS q_imitation
        FROM sv4""")),

    // Granger causality, DAILY view volume → purchase volume: does
    // adding lagged views to the purchase AR(1) model cut SSE? Restricted
    // (y ~ y₋₁) vs unrestricted (y ~ y₋₁ + x₋₁) closed-form OLS —
    // the unrestricted solve is qbz's 3×3 Cramer on 6-grid DECIMAL
    // moments — and the incremental-F statistic on exact SSE sums.
    "qc0_granger_causality" -> Q(
      fn = (s, dir) => {
        val e = Tables(s, dir, "events")
          .withColumn("w", expr("unix_millis(ts) div 86400000"))
        val wk = e.groupBy(col("w"))
          .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L))
            .as("xv"),
            sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
              .as("yv"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(wk,
          Seq(col("w")), "rn").localCheckpoint(eager = false)
        val pair = ranked
          .select((col("rn") - 1).as("rn"), col("yv").cast("double").as("y"))
          .join(ranked.select(col("rn"),
            col("yv").cast("double").as("yl"),
            col("xv").cast("double").as("xl")), Seq("rn"))
          .localCheckpoint(eager = false)
        val mom = pair.agg(count(lit(1)).as("n"),
          sum(col("yl").cast("decimal(28,6)")).as("s1"),
          sum(col("xl").cast("decimal(28,6)")).as("sx"),
          sum(round(col("yl") * col("yl"), 6).cast("decimal(28,6)"))
            .as("s11"),
          sum(round(col("xl") * col("xl"), 6).cast("decimal(28,6)"))
            .as("sxx"),
          sum(round(col("yl") * col("xl"), 6).cast("decimal(28,6)"))
            .as("s1x"),
          sum(col("y").cast("decimal(28,6)")).as("t0"),
          sum(round(col("y") * col("yl"), 6).cast("decimal(28,6)"))
            .as("t1"),
          sum(round(col("y") * col("xl"), 6).cast("decimal(28,6)"))
            .as("tx"),
          sum(round(col("y") * col("y"), 6).cast("decimal(28,6)"))
            .as("tyy"))
        val d = mom.select(col("n"),
          col("n").cast("double").as("s0"),
          col("s1").cast("double").as("s1"),
          col("sx").cast("double").as("sx"),
          col("s11").cast("double").as("s11"),
          col("sxx").cast("double").as("sxx"),
          col("s1x").cast("double").as("s1x"),
          col("t0").cast("double").as("t0"),
          col("t1").cast("double").as("t1"),
          col("tx").cast("double").as("tx"))
        // restricted y ~ 1 + y₋₁ (2×2), unrestricted adds x₋₁ (3×3 Cramer)
        val coefs = d
          .withColumn("br", round(
            (col("s0") * col("t1") - col("s1") * col("t0")) /
            (col("s0") * col("s11") - col("s1") * col("s1")), 9))
          .withColumn("ar", round(
            (col("t0") - col("br") * col("s1")) / col("s0"), 9))
          .withColumn("det",
            col("s0") * (col("s11") * col("sxx") - col("s1x") * col("s1x")) -
            col("s1") * (col("s1") * col("sxx") - col("s1x") * col("sx")) +
            col("sx") * (col("s1") * col("s1x") - col("s11") * col("sx")))
          .withColumn("au", round((
            col("t0") * (col("s11") * col("sxx") - col("s1x") * col("s1x")) -
            col("s1") * (col("t1") * col("sxx") - col("tx") * col("s1x")) +
            col("sx") * (col("t1") * col("s1x") - col("tx") * col("s11"))) /
            col("det"), 9))
          .withColumn("bu", round((
            col("s0") * (col("t1") * col("sxx") - col("tx") * col("s1x")) -
            col("t0") * (col("s1") * col("sxx") - col("sx") * col("s1x")) +
            col("sx") * (col("s1") * col("tx") - col("sx") * col("t1"))) /
            col("det"), 9))
          .withColumn("cu", round((
            col("s0") * (col("s11") * col("tx") - col("s1x") * col("t1")) -
            col("s1") * (col("s1") * col("tx") - col("sx") * col("t1")) +
            col("t0") * (col("s1") * col("s1x") - col("s11") * col("sx"))) /
            col("det"), 9))
          .select(col("n"), col("ar"), col("br"), col("au"), col("bu"),
            col("cu"))
        val sses = pair.crossJoin(broadcast(coefs))
          .agg(first(col("n")).as("n"),
            sum(round((col("y") - col("ar") - col("br") * col("yl")) *
              (col("y") - col("ar") - col("br") * col("yl")), 6)
              .cast("decimal(28,6)")).as("sser"),
            sum(round((col("y") - col("au") - col("bu") * col("yl") -
              col("cu") * col("xl")) *
              (col("y") - col("au") - col("bu") * col("yl") -
               col("cu") * col("xl")), 6)
              .cast("decimal(28,6)")).as("sseu"),
            first(col("bu")).as("bu"), first(col("cu")).as("cu"))
        sses
          .withColumn("f", round(
            (col("sser").cast("double") - col("sseu").cast("double")) /
            (col("sseu").cast("double") /
              (col("n") - 3).cast("double")), 6))
          .select(col("n").as("n_days"),
            round(col("sser").cast("double"), 6).as("sse_restricted"),
            round(col("sseu").cast("double"), 6).as("sse_unrestricted"),
            round(col("bu"), 6).as("ar_coef"),
            round(col("cu"), 6).as("lag_views_coef"),
            col("f").as("granger_f"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT epoch_ms(ts) // 86400000 AS w, event_type
          FROM events),
        wk AS (
          SELECT w,
                 CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                   AS BIGINT) AS xv,
                 CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0
                   END) AS BIGINT) AS yv
          FROM e GROUP BY 1),
        ranked AS (
          SELECT CAST(ROW_NUMBER() OVER (ORDER BY w) AS BIGINT) AS rn,
                 CAST(xv AS DOUBLE) AS xv, CAST(yv AS DOUBLE) AS yv
          FROM wk),
        pair AS MATERIALIZED (
          SELECT a.yv AS y, b.yv AS yl, b.xv AS xl
          FROM ranked a JOIN ranked b ON a.rn = b.rn + 1),
        mom AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(yl AS DECIMAL(28,6))) AS s1,
                 SUM(CAST(xl AS DECIMAL(28,6))) AS sx,
                 SUM(CAST(ROUND(yl * yl, 6) AS DECIMAL(28,6))) AS s11,
                 SUM(CAST(ROUND(xl * xl, 6) AS DECIMAL(28,6))) AS sxx,
                 SUM(CAST(ROUND(yl * xl, 6) AS DECIMAL(28,6))) AS s1x,
                 SUM(CAST(y AS DECIMAL(28,6))) AS t0,
                 SUM(CAST(ROUND(y * yl, 6) AS DECIMAL(28,6))) AS t1,
                 SUM(CAST(ROUND(y * xl, 6) AS DECIMAL(28,6))) AS tx
          FROM pair),
        d AS (
          SELECT n, CAST(n AS DOUBLE) AS s0, CAST(s1 AS DOUBLE) AS s1,
                 CAST(sx AS DOUBLE) AS sx, CAST(s11 AS DOUBLE) AS s11,
                 CAST(sxx AS DOUBLE) AS sxx, CAST(s1x AS DOUBLE) AS s1x,
                 CAST(t0 AS DOUBLE) AS t0, CAST(t1 AS DOUBLE) AS t1,
                 CAST(tx AS DOUBLE) AS tx
          FROM mom),
        cf0 AS (
          SELECT *, ROUND((s0 * t1 - s1 * t0) / (s0 * s11 - s1 * s1), 9)
                   AS br
          FROM d),
        cf1 AS (SELECT *, ROUND((t0 - br * s1) / s0, 9) AS ar FROM cf0),
        cf2 AS (
          SELECT *, s0 * (s11 * sxx - s1x * s1x)
                   - s1 * (s1 * sxx - s1x * sx)
                   + sx * (s1 * s1x - s11 * sx) AS det
          FROM cf1),
        cf AS (
          SELECT *,
            ROUND((t0 * (s11 * sxx - s1x * s1x) - s1 * (t1 * sxx - tx * s1x)
              + sx * (t1 * s1x - tx * s11)) / det, 9) AS au,
            ROUND((s0 * (t1 * sxx - tx * s1x) - t0 * (s1 * sxx - sx * s1x)
              + sx * (s1 * tx - sx * t1)) / det, 9) AS bu,
            ROUND((s0 * (s11 * tx - s1x * t1) - s1 * (s1 * tx - sx * t1)
              + t0 * (s1 * s1x - s11 * sx)) / det, 9) AS cu
          FROM cf2),
        sses AS (
          SELECT cf.n, cf.bu, cf.cu,
                 SUM(CAST(ROUND((p.y - cf.ar - cf.br * p.yl)
                   * (p.y - cf.ar - cf.br * p.yl), 6)
                   AS DECIMAL(28,6))) AS sser,
                 SUM(CAST(ROUND((p.y - cf.au - cf.bu * p.yl - cf.cu * p.xl)
                   * (p.y - cf.au - cf.bu * p.yl - cf.cu * p.xl), 6)
                   AS DECIMAL(28,6))) AS sseu
          FROM pair p CROSS JOIN cf
          GROUP BY 1, 2, 3)
        SELECT n AS n_days,
               ROUND(CAST(sser AS DOUBLE), 6) AS sse_restricted,
               ROUND(CAST(sseu AS DOUBLE), 6) AS sse_unrestricted,
               ROUND(bu, 6) + CAST(0 AS DOUBLE) AS ar_coef,
               ROUND(cu, 6) + CAST(0 AS DOUBLE) AS lag_views_coef,
               ROUND((CAST(sser AS DOUBLE) - CAST(sseu AS DOUBLE))
                 / (CAST(sseu AS DOUBLE) / CAST(n - 3 AS DOUBLE)), 6)
                 AS granger_f
        FROM sses""")),

    // EWMA control chart of daily revenue (λ = 0.25, asymptotic ±3σ√(λ/
    // (2−λ)) = 3σ/√7 limits — the time-varying (1−λ)^2t factor needs pow,
    // which is not cross-engine-replayable; asymptotic limits are the
    // standard steady-state chart): the small-persistent-shift detector
    // complementing q7q's CUSUM. Fold on the 9-grid via the qbt flat-LIST
    // accumulator; one row per day with the breach flag.
    "qc1_ewma_chart" -> Q(
      fn = (s, dir) => {
        val daily = t(s, dir, "orders")
          .groupBy(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP))" +
            " div 86400000").as("day"))
          .agg((sum(col("o_totalprice").cast("decimal(18,2)")) /
            lit(1000000)).cast("decimal(14,8)").as("ym"))
        val stats = daily.agg(count(lit(1)).as("n"),
            sum(col("ym")).as("sy"),
            sum(round(col("ym") * col("ym"), 6).cast("decimal(28,6)"))
              .as("syy"))
          .withColumn("nd", col("n").cast("double"))
          .withColumn("mu", round(col("sy").cast("double") / col("nd"), 9))
          .withColumn("sig", round(sqrt(
            (col("syy").cast("double") - col("nd") * col("mu") * col("mu")) /
            (col("nd") - lit(1.0))), 9))
          .withColumn("lim", round(lit(3.0) * col("sig") *
            sqrt(lit(1.0) / lit(7.0)), 9))
          .select(col("mu"), col("lim"))
        val packed = daily
          .agg(array_sort(collect_list(struct(col("day").as("o"),
            col("ym").cast("double").as("y")))).as("seq"))
          .withColumn("ds", transform(col("seq"), x => x.getField("o")))
          .withColumn("ys", transform(col("seq"), x => x.getField("y")))
        def stepZ(acc: Column, x: Column): Column = {
          val nw = round(lit(0.25) * x + lit(0.75) * element_at(acc, 1), 9)
          concat(array(nw), slice(acc, lit(2), lit(1000000)), array(nw))
        }
        val folded = packed.withColumn("fold",
            aggregate(slice(col("ys"), lit(2),
              greatest(size(col("ys")) - 1, lit(0))),
              array(element_at(col("ys"), 1), element_at(col("ys"), 1)),
              stepZ))
          .withColumn("zs", slice(col("fold"), lit(2), lit(1000000)))
        folded.select(posexplode(col("zs")).as(Seq("i", "z")),
            col("ds"))
          .select(element_at(col("ds"), col("i") + 1).as("day"), col("z"))
          .crossJoin(broadcast(stats))
          .select(col("day"), round(col("z"), 6).as("ewma"),
            round(col("mu") - col("lim"), 6).as("lcl"),
            round(col("mu") + col("lim"), 6).as("ucl"),
            when(col("z") > col("mu") + col("lim"), 1)
              .when(col("z") < col("mu") - col("lim"), -1)
              .otherwise(0).as("breach"))
          .orderBy(col("day"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT CAST(epoch_ms(o_orderdate) // 86400000 AS BIGINT) AS day,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) / 1000000
                   AS DECIMAL(14,8)) AS ym
          FROM orders GROUP BY 1),
        st AS (
          SELECT CAST(COUNT(*) AS DOUBLE) AS nd,
                 ROUND(CAST(SUM(ym) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
                   9) AS mu,
                 SUM(CAST(ROUND(CAST(ym AS DECIMAL(19,8))
                   * CAST(ym AS DECIMAL(19,8)), 6) AS DECIMAL(28,6)))
                   AS syy
          FROM daily),
        st2 AS (
          SELECT mu,
                 ROUND(CAST(3 AS DOUBLE) * ROUND(SQRT(
                   (CAST(syy AS DOUBLE) - nd * mu * mu)
                     / (nd - CAST(1 AS DOUBLE))), 9)
                   * SQRT(CAST(1 AS DOUBLE) / CAST(7 AS DOUBLE)), 9)
                   AS lim
          FROM st),
        packed AS (
          SELECT list(day ORDER BY day) AS ds,
                 list(CAST(ym AS DOUBLE) ORDER BY day) AS ys,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM daily),
        folded AS (
          SELECT ds, n,
                 list_reduce(
                   list_prepend([ys[1], ys[1]],
                     list_transform(ys[2:], x -> [x])),
                   (acc, e) -> list_prepend(
                     ROUND(CAST(0.25 AS DOUBLE) * e[1]
                       + CAST(0.75 AS DOUBLE) * acc[1], 9),
                     acc[2:] || [ROUND(CAST(0.25 AS DOUBLE) * e[1]
                       + CAST(0.75 AS DOUBLE) * acc[1], 9)])) AS fold
          FROM packed),
        rows_ AS (
          SELECT ds[i] AS day, fold[2:][i] AS z
          FROM (SELECT ds, fold, unnest(range(1, CAST(n AS INT) + 1)) AS i
                FROM folded))
        SELECT day, ROUND(z, 6) AS ewma,
               ROUND(st2.mu - st2.lim, 6) AS lcl,
               ROUND(st2.mu + st2.lim, 6) AS ucl,
               CASE WHEN z > st2.mu + st2.lim THEN 1
                    WHEN z < st2.mu - st2.lim THEN -1 ELSE 0 END AS breach
        FROM rows_ CROSS JOIN st2
        ORDER BY day""")),

    // Youden-J optimal threshold from the exact ROC sweep (qaa's
    // setting): per distinct score, TPR/FPR from descending cumulative
    // counts off the range-partitioned running sum — never an
    // unpartitioned window over the data-sized score domain — and the
    // argmax by struct (ties pin to the HIGHEST threshold). The
    // operating-point selector that turns qaa's AUC into a deployable
    // cutoff.
    "qc2_youden_threshold" -> Q(
      fn = (s, dir) => {
        val e = Tables(s, dir, "events")
          .filter(col("value").isNotNull)
          .select(col("value").cast("double").as("s0"),
            (col("event_type") === "purchase").cast("long").as("y"))
        val prof = e.groupBy(col("s0"))
          .agg(count(lit(1)).as("n"), sum(col("y")).as("npos"))
          .withColumn("negs", -col("s0"))
        val cum = graft.operators.ScaleOps.globalRunningSum(
            graft.operators.ScaleOps.globalRunningSum(prof,
              Seq(col("negs")), col("npos"), "cpos"),
            Seq(col("negs")), col("n"), "ctot")
        val tot = prof.agg(sum(col("npos")).as("p"),
          (sum(col("n")) - sum(col("npos"))).as("q"))
        val j = cum.crossJoin(broadcast(tot))
          .withColumn("tpr",
            round(col("cpos").cast("double") / col("p").cast("double"), 9))
          .withColumn("fpr",
            round((col("ctot") - col("cpos")).cast("double") /
              col("q").cast("double"), 9))
          .withColumn("jv", round(col("tpr") - col("fpr"), 9))
        j.agg(first(col("p")).as("n_pos"), first(col("q")).as("n_neg"),
            max(struct(col("jv").as("j"), col("s0").as("thr"),
              col("tpr").as("tpr"), col("fpr").as("fpr"))).as("w"))
          .select(col("n_pos"), col("n_neg"),
            round(col("w.j"), 6).as("youden_j"),
            round(col("w.thr"), 6).as("best_threshold"),
            round(col("w.tpr"), 6).as("tpr"),
            round(col("w.fpr"), 6).as("fpr"))
      },
      oracle = Some("""
        WITH e AS (
          SELECT CAST(value AS DOUBLE) AS s,
                 CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS y
          FROM events WHERE value IS NOT NULL),
        prof AS (
          SELECT s, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(y) AS BIGINT) AS npos
          FROM e GROUP BY 1),
        cum AS (
          SELECT s,
                 CAST(SUM(npos) OVER (ORDER BY s DESC
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cpos,
                 CAST(SUM(n) OVER (ORDER BY s DESC
                   ROWS UNBOUNDED PRECEDING) AS BIGINT) AS ctot
          FROM prof),
        tot AS (
          SELECT CAST(SUM(npos) AS BIGINT) AS p,
                 CAST(SUM(n) - SUM(npos) AS BIGINT) AS q
          FROM prof),
        j AS (
          SELECT s,
                 ROUND(CAST(cpos AS DOUBLE) / CAST(tot.p AS DOUBLE), 9)
                   AS tpr,
                 ROUND(CAST(ctot - cpos AS DOUBLE)
                   / CAST(tot.q AS DOUBLE), 9) AS fpr
          FROM cum CROSS JOIN tot),
        j2 AS (
          SELECT s, tpr, fpr, ROUND(tpr - fpr, 9) AS jv FROM j),
        best AS (
          SELECT MAX({'j': jv, 'thr': s, 'tpr': tpr, 'fpr': fpr}) AS w
          FROM j2)
        SELECT tot.p AS n_pos, tot.q AS n_neg,
               ROUND(best.w['j'], 6) AS youden_j,
               ROUND(best.w['thr'], 6) AS best_threshold,
               ROUND(best.w['tpr'], 6) AS tpr,
               ROUND(best.w['fpr'], 6) AS fpr
        FROM best CROSS JOIN tot""")),

    // Hierarchical forecast reconciliation: per-region Holt forecasts
    // (bottom-up leaves) vs the total-series Holt forecast allocated
    // top-down by historical revenue shares — the coherence gap between
    // the two is exactly what reconciliation methods minimize. Reuses
    // Forecast.holtLinear verbatim on the 5 leaf series and the root.
    "qc3_forecast_reconciliation" -> Q(
      fn = (s, dir) => {
        val cell = t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_regionkey").as("rg"),
            expr("unix_millis(CAST(o_orderdate AS TIMESTAMP))" +
              " div 86400000 div 30").as("mo"))
          .agg((sum(col("o_totalprice").cast("decimal(18,2)")) /
            lit(1000000)).cast("decimal(14,8)").as("v"))
          .localCheckpoint(eager = false)
        val leaf = graft.operators.Forecast.holtLinear(cell, "rg", "mo", "v",
          horizon = 3)
        val total = graft.operators.Forecast.holtLinear(
          cell.groupBy(col("mo")).agg(sum(col("v")).as("v"))
            .withColumn("k", lit(0)),
          "k", "mo", "v", horizon = 3)
        val shares = cell.groupBy(col("rg")).agg(sum(col("v")).as("sv"))
          .crossJoin(broadcast(cell.agg(sum(col("v")).as("tv"))))
          .select(col("rg"), round(col("sv").cast("double") /
            col("tv").cast("double"), 9).as("share"))
        val bu = leaf.agg(
          sum(col("forecast_3").cast("decimal(28,6)")).as("bus"))
        leaf.join(shares, Seq("rg"))
          .crossJoin(broadcast(total.select(
            col("forecast_3").as("fc_total"))))
          .crossJoin(broadcast(bu))
          .select(col("rg"), col("n_obs"),
            col("forecast_3").as("fc_leaf"),
            round(col("share"), 6).as("share"),
            round(col("fc_total") * col("share"), 6).as("fc_topdown"),
            round(col("forecast_3") - col("fc_total") * col("share"), 6)
              .as("recon_gap"),
            col("fc_total"),
            round(col("bus").cast("double"), 6).as("bu_total"))
          .orderBy(col("rg"))
      },
      oracle = Some("""
        WITH cell AS (
          SELECT n_regionkey AS rg,
                 CAST(epoch_ms(o_orderdate) // 86400000 // 30 AS BIGINT)
                   AS mo,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) / 1000000
                   AS DECIMAL(14,8)) AS v
          FROM orders JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          GROUP BY 1, 2),
        leafs AS (
          SELECT rg, CAST(COUNT(*) AS BIGINT) AS n_obs,
                 list(CAST(v AS DOUBLE) ORDER BY mo) AS ys
          FROM cell GROUP BY 1),
        leaff AS (
          SELECT rg, n_obs,
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
          FROM leafs),
        leaf AS MATERIALIZED (
          SELECT rg, n_obs,
                 ROUND(st[1] + CAST(3 AS DOUBLE) * st[2], 6) AS fc
          FROM leaff),
        tots AS (
          SELECT list(CAST(v AS DOUBLE) ORDER BY mo) AS ys
          FROM (SELECT mo, SUM(v) AS v FROM cell GROUP BY 1)),
        totf AS (
          SELECT list_reduce(
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
          FROM tots),
        tfc AS (SELECT ROUND(st[1] + CAST(3 AS DOUBLE) * st[2], 6) AS fc
                FROM totf),
        shares AS (
          SELECT rg, ROUND(CAST(SUM(v) AS DOUBLE)
                   / (SELECT CAST(SUM(v) AS DOUBLE) FROM cell), 9) AS share
          FROM cell GROUP BY 1),
        bu AS (
          SELECT ROUND(CAST(SUM(CAST(fc AS DECIMAL(28,6))) AS DOUBLE), 6)
                   AS bu_total
          FROM leaf)
        SELECT leaf.rg, leaf.n_obs, leaf.fc AS fc_leaf,
               ROUND(shares.share, 6) AS share,
               ROUND(tfc.fc * shares.share, 6) AS fc_topdown,
               ROUND(leaf.fc - tfc.fc * shares.share, 6) + CAST(0 AS DOUBLE)
                 AS recon_gap,
               tfc.fc AS fc_total,
               bu.bu_total
        FROM leaf JOIN shares ON leaf.rg = shares.rg
        CROSS JOIN tfc CROSS JOIN bu
        ORDER BY leaf.rg""")),

    // Cronbach's alpha of the 5 order-priority spend "items" per
    // customer: α = k/(k−1)·(1 − Σσ²ᵢ/σ²_total) — internal-consistency
    // reliability, computed WITHOUT densifying the customer × item
    // matrix (absent cells are zeros and contribute nothing to any
    // moment sum). Item squares multiply in DECIMAL (rule 15 hygiene).
    "qc4_cronbach_alpha" -> Q(
      fn = (s, dir) => {
        val o = t(s, dir, "orders")
          .groupBy(col("o_custkey").as("cust"),
            col("o_orderpriority").as("item"))
          .agg((sum(col("o_totalprice").cast("decimal(18,2)")) /
            lit(1000000)).cast("decimal(14,8)").as("x"))
          .localCheckpoint(eager = false)
        val nc = o.select(col("cust")).distinct().count()
        val items = o.groupBy(col("item"))
          .agg(sum(col("x")).as("sx"),
            sum(round(col("x") * col("x"), 6).cast("decimal(28,6)"))
              .as("sxx"))
          .withColumn("nd", lit(nc).cast("double"))
          .withColumn("m", round(col("sx").cast("double") / col("nd"), 9))
          .withColumn("vi", round(
            (col("sxx").cast("double") - col("nd") * col("m") * col("m")) /
            (col("nd") - lit(1.0)), 9))
        val tv = o.groupBy(col("cust")).agg(sum(col("x")).as("tx"))
          .agg(sum(col("tx")).as("st"),
            sum(round(col("tx") * col("tx"), 6).cast("decimal(28,6)"))
              .as("stt"))
          .withColumn("nd", lit(nc).cast("double"))
          .withColumn("mt", round(col("st").cast("double") / col("nd"), 9))
          .withColumn("vt", round(
            (col("stt").cast("double") - col("nd") * col("mt") * col("mt")) /
            (col("nd") - lit(1.0)), 9))
        items.agg(count(lit(1)).as("k"),
            sum(col("vi").cast("decimal(28,9)")).as("svi"))
          .crossJoin(broadcast(tv.select(col("vt"))))
          .select(lit(nc).as("n_customers"), col("k").as("k_items"),
            round(col("svi").cast("double"), 6).as("sum_item_var"),
            round(col("vt"), 6).as("total_var"),
            round((col("k").cast("double") /
              (col("k").cast("double") - lit(1.0))) *
              (lit(1.0) - col("svi").cast("double") / col("vt")), 6)
              .as("alpha"))
      },
      oracle = Some("""
        WITH o AS (
          SELECT o_custkey AS cust, o_orderpriority AS item,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) / 1000000
                   AS DECIMAL(14,8)) AS x
          FROM orders GROUP BY 1, 2),
        nc AS (SELECT CAST(COUNT(DISTINCT cust) AS BIGINT) AS n FROM o),
        items AS (
          SELECT item, SUM(x) AS sx,
                 SUM(CAST(ROUND(CAST(x AS DECIMAL(19,8))
                   * CAST(x AS DECIMAL(19,8)), 6) AS DECIMAL(28,6))) AS sxx
          FROM o GROUP BY 1),
        iv AS (
          SELECT item,
                 ROUND((CAST(sxx AS DOUBLE)
                   - CAST(nc.n AS DOUBLE)
                     * ROUND(CAST(sx AS DOUBLE) / CAST(nc.n AS DOUBLE), 9)
                     * ROUND(CAST(sx AS DOUBLE) / CAST(nc.n AS DOUBLE), 9))
                   / (CAST(nc.n AS DOUBLE) - CAST(1 AS DOUBLE)), 9) AS vi
          FROM items CROSS JOIN nc),
        tvs AS (
          SELECT SUM(tx) AS st,
                 SUM(CAST(ROUND(CAST(tx AS DECIMAL(19,8))
                   * CAST(tx AS DECIMAL(19,8)), 6) AS DECIMAL(28,6)))
                   AS stt
          FROM (SELECT cust, SUM(x) AS tx FROM o GROUP BY 1)),
        tv AS (
          SELECT ROUND((CAST(stt AS DOUBLE)
                   - CAST(nc.n AS DOUBLE)
                     * ROUND(CAST(st AS DOUBLE) / CAST(nc.n AS DOUBLE), 9)
                     * ROUND(CAST(st AS DOUBLE) / CAST(nc.n AS DOUBLE), 9))
                   / (CAST(nc.n AS DOUBLE) - CAST(1 AS DOUBLE)), 9) AS vt
          FROM tvs CROSS JOIN nc),
        agg1 AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS k,
                 CAST(SUM(CAST(vi AS DECIMAL(28,9))) AS DOUBLE) AS svi
          FROM iv)
        SELECT nc.n AS n_customers, agg1.k AS k_items,
               ROUND(agg1.svi, 6) AS sum_item_var,
               ROUND(tv.vt, 6) AS total_var,
               ROUND((CAST(agg1.k AS DOUBLE)
                 / (CAST(agg1.k AS DOUBLE) - CAST(1 AS DOUBLE)))
                 * (CAST(1 AS DOUBLE) - agg1.svi / tv.vt), 6) AS alpha
        FROM agg1 CROSS JOIN tv CROSS JOIN nc""")),

    // Taylor's power law across brands: ln(variance) of daily demand
    // against ln(mean) — the variance-scaling exponent b (b≈1 Poisson,
    // b→2 clumped) from 25 brand points, all brand moments exact 64-bit
    // integers. The aggregation-level diagnostic that tells you how
    // demand noise scales before you pick a forecast model.
    "qc5_taylor_law" -> Q(
      fn = (s, dir) => {
        val d = t(s, dir, "lineitem")
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .groupBy(col("p_brand").as("brand"),
            expr("unix_millis(CAST(l_shipdate AS TIMESTAMP))" +
              " div 86400000").as("day"))
          .agg(sum(col("l_quantity")).cast("long").as("x"))
        val g = d.groupBy(col("brand"))
          .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
            sum(col("x") * col("x")).as("sxx"))
          .withColumn("nd", col("n").cast("double"))
          .withColumn("m", round(col("sx").cast("double") / col("nd"), 9))
          .withColumn("v", round(
            (col("sxx").cast("double") - col("nd") * col("m") * col("m")) /
            (col("nd") - lit(1.0)), 9))
          .filter(col("v") > 0)
          .select(col("brand"), round(log(col("m")), 9).as("lm"),
            round(log(col("v")), 9).as("lv"))
        g.agg(count(lit(1)).as("k"),
            sum(col("lm").cast("decimal(28,9)")).as("sx"),
            sum(col("lv").cast("decimal(28,9)")).as("sy"),
            sum(round(col("lm") * col("lv"), 6).cast("decimal(28,6)"))
              .as("sxy"),
            sum(round(col("lm") * col("lm"), 6).cast("decimal(28,6)"))
              .as("sxx"),
            sum(round(col("lv") * col("lv"), 6).cast("decimal(28,6)"))
              .as("syy"))
          .withColumn("kd", col("k").cast("double"))
          .withColumn("b", round(
            (col("kd") * col("sxy").cast("double") -
              col("sx").cast("double") * col("sy").cast("double")) /
            (col("kd") * col("sxx").cast("double") -
              col("sx").cast("double") * col("sx").cast("double")), 9))
          .select(col("k").as("n_brands"),
            round(col("b"), 6).as("taylor_b"),
            round((col("sy").cast("double") - col("b") *
              col("sx").cast("double")) / col("kd"), 6).as("ln_a"),
            round(
              (col("kd") * col("sxy").cast("double") -
                col("sx").cast("double") * col("sy").cast("double")) *
              (col("kd") * col("sxy").cast("double") -
                col("sx").cast("double") * col("sy").cast("double")) /
              ((col("kd") * col("sxx").cast("double") -
                col("sx").cast("double") * col("sx").cast("double")) *
               (col("kd") * col("syy").cast("double") -
                col("sy").cast("double") * col("sy").cast("double"))), 6)
              .as("r2"))
      },
      oracle = Some("""
        WITH d AS (
          SELECT p_brand AS brand,
                 CAST(epoch_ms(l_shipdate) // 86400000 AS BIGINT) AS day,
                 CAST(SUM(l_quantity) AS BIGINT) AS x
          FROM lineitem JOIN part ON l_partkey = p_partkey
          GROUP BY 1, 2),
        g AS (
          SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx,
                 CAST(SUM(x * x) AS BIGINT) AS sxx
          FROM d GROUP BY 1),
        mv AS (
          SELECT brand, CAST(n AS DOUBLE) AS nd,
                 ROUND(CAST(sx AS DOUBLE) / CAST(n AS DOUBLE), 9) AS m,
                 sxx
          FROM g),
        mv2 AS (
          SELECT brand, m,
                 ROUND((CAST(sxx AS DOUBLE) - nd * m * m)
                   / (nd - CAST(1 AS DOUBLE)), 9) AS v
          FROM mv),
        pts AS (
          SELECT ROUND(ln(m), 9) AS lm, ROUND(ln(v), 9) AS lv
          FROM mv2 WHERE v > 0),
        mom AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS k,
                 CAST(SUM(CAST(lm AS DECIMAL(28,9))) AS DOUBLE) AS sx,
                 CAST(SUM(CAST(lv AS DECIMAL(28,9))) AS DOUBLE) AS sy,
                 CAST(SUM(CAST(ROUND(lm * lv, 6) AS DECIMAL(28,6)))
                   AS DOUBLE) AS sxy,
                 CAST(SUM(CAST(ROUND(lm * lm, 6) AS DECIMAL(28,6)))
                   AS DOUBLE) AS sxx,
                 CAST(SUM(CAST(ROUND(lv * lv, 6) AS DECIMAL(28,6)))
                   AS DOUBLE) AS syy
          FROM pts),
        f AS (
          SELECT k, CAST(k AS DOUBLE) AS kd, sx, sy, sxy, sxx, syy
          FROM mom),
        f2 AS (
          SELECT *, ROUND((kd * sxy - sx * sy) / (kd * sxx - sx * sx), 9)
                   AS b
          FROM f)
        SELECT k AS n_brands,
               ROUND(b, 6) + CAST(0 AS DOUBLE) AS taylor_b,
               ROUND((sy - b * sx) / kd, 6) + CAST(0 AS DOUBLE) AS ln_a,
               ROUND((kd * sxy - sx * sy) * (kd * sxy - sx * sy)
                 / ((kd * sxx - sx * sx) * (kd * syy - sy * sy)), 6) AS r2
        FROM f2""")),

    // Post-stratified mean order value: strata weights from the CUSTOMER
    // population (region shares — including never-ordering customers,
    // which is the point of post-stratification), strata means/variances
    // from order moments, the Σ W²s²/n SE and the design effect vs the
    // simple-random mean. The survey-estimation sibling of qbl's raking.
    "qc6_post_stratified" -> Q(
      fn = (s, dir) => {
        val popw = t(s, dir, "customer")
          .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_regionkey").as("rg"))
          .agg(count(lit(1)).as("pop"))
        val wts = popw.crossJoin(broadcast(
            popw.agg(sum(col("pop")).as("ptot"))))
          .select(col("rg"), round(col("pop").cast("double") /
            col("ptot").cast("double"), 9).as("wh"))
        val o = t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
          .select(col("n_regionkey").as("rg"),
            (col("o_totalprice").cast("decimal(18,2)") / lit(1000000))
              .cast("decimal(14,8)").as("y"))
        val strata = o.groupBy(col("rg"))
          .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
            sum(round(col("y") * col("y"), 6).cast("decimal(28,6)"))
              .as("syy"))
          .withColumn("nd", col("n").cast("double"))
          .withColumn("m", round(col("sy").cast("double") / col("nd"), 9))
          .withColumn("s2", round(
            (col("syy").cast("double") - col("nd") * col("m") * col("m")) /
            (col("nd") - lit(1.0)), 12))
        val tot = o.agg(count(lit(1)).as("nt"), sum(col("y")).as("syt"),
            sum(round(col("y") * col("y"), 6).cast("decimal(28,6)"))
              .as("syyt"))
          .withColumn("ntd", col("nt").cast("double"))
          .withColumn("mt", round(col("syt").cast("double") / col("ntd"), 9))
          .withColumn("s2t", round(
            (col("syyt").cast("double") -
              col("ntd") * col("mt") * col("mt")) /
            (col("ntd") - lit(1.0)), 12))
        strata.join(wts, Seq("rg"))
          .agg(
            sum(round(col("wh") * col("m"), 12).cast("decimal(28,12)"))
              .as("pm"),
            sum(round(col("wh") * col("wh") * col("s2") / col("nd"), 12)
              .cast("decimal(28,12)")).as("pv"))
          .crossJoin(broadcast(tot.select(col("nt"), col("ntd"), col("mt"),
            col("s2t"))))
          .select(col("nt").as("n_orders"),
            round(col("pm").cast("double"), 6).as("post_strat_mean"),
            round(sqrt(col("pv").cast("double")), 6).as("post_strat_se"),
            round(col("mt"), 6).as("srs_mean"),
            round(sqrt(col("s2t") / col("ntd")), 6).as("srs_se"),
            round(col("pv").cast("double") /
              (col("s2t") / col("ntd")), 6).as("design_effect"))
      },
      oracle = Some("""
        WITH popw AS (
          SELECT n_regionkey AS rg, CAST(COUNT(*) AS BIGINT) AS pop
          FROM customer JOIN nation ON c_nationkey = n_nationkey
          GROUP BY 1),
        wts AS (
          SELECT rg, ROUND(CAST(pop AS DOUBLE)
                   / (SELECT CAST(SUM(pop) AS DOUBLE) FROM popw), 9) AS wh
          FROM popw),
        o AS (
          SELECT n_regionkey AS rg,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) / 1000000
                   AS DECIMAL(14,8)) AS y
          FROM orders JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey),
        strata AS (
          SELECT rg, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(COUNT(*) AS DOUBLE) AS nd,
                 ROUND(CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
                   AS m,
                 SUM(CAST(ROUND(CAST(y AS DECIMAL(19,8))
                   * CAST(y AS DECIMAL(19,8)), 6) AS DECIMAL(28,6))) AS syy
          FROM o GROUP BY 1),
        sv AS (
          SELECT rg, n, nd, m,
                 ROUND((CAST(syy AS DOUBLE) - nd * m * m)
                   / (nd - CAST(1 AS DOUBLE)), 12) AS s2
          FROM strata),
        tot AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS nt,
                 CAST(COUNT(*) AS DOUBLE) AS ntd,
                 ROUND(CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
                   AS mt,
                 SUM(CAST(ROUND(CAST(y AS DECIMAL(19,8))
                   * CAST(y AS DECIMAL(19,8)), 6) AS DECIMAL(28,6)))
                   AS syyt
          FROM o),
        tv AS (
          SELECT nt, ntd, mt,
                 ROUND((CAST(syyt AS DOUBLE) - ntd * mt * mt)
                   / (ntd - CAST(1 AS DOUBLE)), 12) AS s2t
          FROM tot),
        agg1 AS (
          SELECT CAST(SUM(CAST(ROUND(wts.wh * sv.m, 12) AS DECIMAL(28,12)))
                   AS DOUBLE) AS pm,
                 CAST(SUM(CAST(ROUND(wts.wh * wts.wh * sv.s2 / sv.nd, 12)
                   AS DECIMAL(28,12))) AS DOUBLE) AS pv
          FROM sv JOIN wts ON sv.rg = wts.rg)
        SELECT tv.nt AS n_orders,
               ROUND(agg1.pm, 6) AS post_strat_mean,
               ROUND(SQRT(agg1.pv), 6) AS post_strat_se,
               ROUND(tv.mt, 6) AS srs_mean,
               ROUND(SQRT(tv.s2t / tv.ntd), 6) AS srs_se,
               ROUND(agg1.pv / (tv.s2t / tv.ntd), 6) AS design_effect
        FROM agg1 CROSS JOIN tv""")),

    // Mann-Kendall trend test on the daily revenue series: S from the
    // exact sign-pair enumeration over the bounded day-domain panel (the
    // qa8/qam audit contract — ~2400 rows, 2.9M pairs), tie-corrected
    // Var(S), continuity-corrected z. The distribution-free trend test
    // beside qac's Theil-Sen slope (which estimates WHAT the trend is;
    // this tests WHETHER it exists).
    "qc7_mann_kendall" -> Q(
      fn = (s, dir) => {
        val daily = t(s, dir, "orders")
          .groupBy(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP))" +
            " div 86400000").as("day"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("yk"))
          .localCheckpoint(eager = false)
        val a = daily.select(col("day").as("da"), col("yk").as("ya"))
        val b = daily.select(col("day").as("db"), col("yk").as("yb"))
        val sgn = a.crossJoin(broadcast(b)).filter(col("da") < col("db"))
          .agg(
            sum(when(col("yb") > col("ya"), 1L)
              .when(col("yb") < col("ya"), -1L).otherwise(0L)).as("sstat"))
        val n = daily.agg(count(lit(1)).as("n"))
        val ties = daily.groupBy(col("yk")).agg(count(lit(1)).as("t"))
          .filter(col("t") > 1)
          .agg(coalesce(sum(col("t") * (col("t") - 1) *
            (lit(2) * col("t") + 5)), lit(0L)).as("tc"))
        sgn.crossJoin(broadcast(n)).crossJoin(broadcast(ties))
          .withColumn("vs",
            ((col("n") * (col("n") - 1) * (lit(2) * col("n") + 5) -
              col("tc")).cast("double")) / lit(18.0))
          .select(col("n"), col("sstat"),
            round(col("vs"), 6).as("var_s"),
            round(
              when(col("sstat") > 0,
                (col("sstat") - 1).cast("double") / sqrt(col("vs")))
              .when(col("sstat") < 0,
                (col("sstat") + 1).cast("double") / sqrt(col("vs")))
              .otherwise(lit(0.0)), 6).as("z"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT CAST(epoch_ms(o_orderdate) // 86400000 AS BIGINT) AS day,
                 SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS yk
          FROM orders GROUP BY 1),
        sg AS (
          SELECT CAST(SUM(CASE WHEN b.yk > a.yk THEN 1
                               WHEN b.yk < a.yk THEN -1 ELSE 0 END)
                   AS BIGINT) AS sstat
          FROM daily a JOIN daily b ON a.day < b.day),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
        ties AS (
          SELECT CAST(COALESCE(SUM(t * (t - 1) * (2 * t + 5)), 0)
                   AS BIGINT) AS tc
          FROM (SELECT yk, CAST(COUNT(*) AS BIGINT) AS t
                FROM daily GROUP BY 1) x
          WHERE t > 1),
        f AS (
          SELECT sg.sstat, nn.n, ties.tc,
                 CAST(nn.n * (nn.n - 1) * (2 * nn.n + 5) - ties.tc
                   AS DOUBLE) / CAST(18 AS DOUBLE) AS vs
          FROM sg CROSS JOIN nn CROSS JOIN ties)
        SELECT n, sstat,
               ROUND(vs, 6) AS var_s,
               ROUND(CASE WHEN sstat > 0
                          THEN CAST(sstat - 1 AS DOUBLE) / SQRT(vs)
                          WHEN sstat < 0
                          THEN CAST(sstat + 1 AS DOUBLE) / SQRT(vs)
                          ELSE CAST(0 AS DOUBLE) END, 6)
                 + CAST(0 AS DOUBLE) AS z
        FROM f""")),

    // Kendall's W: do the 5 regions RANK the 25 brands the same way by
    // revenue? Rankings by row_number over the dense region × brand grid
    // (absent cells are zero revenue; total (rev desc, brand) order makes
    // every rank deterministic, so the no-ties W formula is exact),
    // W = 12S/(m²(n³−n)) with the χ² transform — the k-ranker
    // concordance statistic beside q8u's two-rater kappa.
    "qc8_kendalls_w" -> Q(
      fn = (s, dir) => {
        val rev = t(s, dir, "lineitem")
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
          .groupBy(col("n_regionkey").as("rg"), col("p_brand").as("brand"))
          .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("rev"))
        val grid = t(s, dir, "nation").select(col("n_regionkey").as("rg"))
          .distinct()
          .crossJoin(t(s, dir, "part").select(col("p_brand").as("brand"))
            .distinct())
          .join(rev, Seq("rg", "brand"), "left")
          .withColumn("rev",
            coalesce(col("rev"), lit(0).cast("decimal(18,2)")))
        val ranked = grid.withColumn("rk",
          row_number().over(Window.partitionBy(col("rg"))
            .orderBy(col("rev").desc, col("brand"))))
        val sums = ranked.groupBy(col("brand"))
          .agg(sum(col("rk")).cast("long").as("rsum"))
        val dims = ranked.agg(countDistinct(col("rg")).as("m"),
          countDistinct(col("brand")).as("nb"))
        sums.crossJoin(broadcast(dims))
          .withColumn("dev2", (lit(2L) * col("rsum") -
            col("m") * (col("nb") + 1)) *
            (lit(2L) * col("rsum") - col("m") * (col("nb") + 1)))
          .groupBy(col("m"), col("nb"))
          .agg(sum(col("dev2")).as("s4"))
          .select(col("nb").as("n_brands"), col("m").as("m_raters"),
            round(col("s4").cast("double") * lit(3.0) /
              (col("m").cast("double") * col("m").cast("double") *
               (col("nb").cast("double") * col("nb").cast("double") *
                col("nb").cast("double") - col("nb").cast("double"))), 6)
              .as("w"),
            round(col("m").cast("double") *
              (col("nb").cast("double") - lit(1.0)) *
              (col("s4").cast("double") * lit(3.0) /
               (col("m").cast("double") * col("m").cast("double") *
                (col("nb").cast("double") * col("nb").cast("double") *
                 col("nb").cast("double") - col("nb").cast("double")))), 6)
              .as("chi2"))
      },
      oracle = Some("""
        WITH rev AS (
          SELECT n_regionkey AS rg, p_brand AS brand,
                 SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS rev
          FROM lineitem JOIN part ON l_partkey = p_partkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          GROUP BY 1, 2),
        grid AS (
          SELECT r.rg, b.brand,
                 COALESCE(rev.rev, CAST(0 AS DECIMAL(18,2))) AS rev
          FROM (SELECT DISTINCT n_regionkey AS rg FROM nation) r
          CROSS JOIN (SELECT DISTINCT p_brand AS brand FROM part) b
          LEFT JOIN rev ON rev.rg = r.rg AND rev.brand = b.brand),
        ranked AS (
          SELECT rg, brand,
                 CAST(ROW_NUMBER() OVER (PARTITION BY rg
                   ORDER BY rev DESC, brand) AS BIGINT) AS rk
          FROM grid),
        sums AS (
          SELECT brand, CAST(SUM(rk) AS BIGINT) AS rsum
          FROM ranked GROUP BY 1),
        dims AS (
          SELECT CAST(COUNT(DISTINCT rg) AS BIGINT) AS m,
                 CAST(COUNT(DISTINCT brand) AS BIGINT) AS nb
          FROM ranked),
        dv AS (
          SELECT dims.m, dims.nb,
                 CAST(SUM((2 * rsum - dims.m * (dims.nb + 1))
                   * (2 * rsum - dims.m * (dims.nb + 1))) AS BIGINT) AS s4
          FROM sums CROSS JOIN dims
          GROUP BY 1, 2)
        SELECT nb AS n_brands, m AS m_raters,
               ROUND(CAST(s4 AS DOUBLE) * CAST(3 AS DOUBLE)
                 / (CAST(m AS DOUBLE) * CAST(m AS DOUBLE)
                    * (CAST(nb AS DOUBLE) * CAST(nb AS DOUBLE)
                       * CAST(nb AS DOUBLE) - CAST(nb AS DOUBLE))), 6) AS w,
               ROUND(CAST(m AS DOUBLE) * (CAST(nb AS DOUBLE)
                   - CAST(1 AS DOUBLE))
                 * (CAST(s4 AS DOUBLE) * CAST(3 AS DOUBLE)
                    / (CAST(m AS DOUBLE) * CAST(m AS DOUBLE)
                       * (CAST(nb AS DOUBLE) * CAST(nb AS DOUBLE)
                          * CAST(nb AS DOUBLE) - CAST(nb AS DOUBLE)))), 6)
                 AS chi2
        FROM dv""")),

    // Single-changepoint location by binary segmentation: the split k
    // minimizing SSE_left + SSE_right, every candidate's SSE in closed
    // form from EXACT DECIMAL prefix sums (the range-partitioned running
    // sum — no O(n²) residual scan, no raw-row window), argmin by struct
    // with the earliest-day tiebreak, and the F-like variance-ratio
    // statistic. q7q's CUSUM detects THAT the level shifted; this
    // LOCATES the best single break and sizes it.
    "qc9_changepoint_binseg" -> Q(
      fn = (s, dir) => {
        val daily = t(s, dir, "orders")
          .groupBy(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP))" +
            " div 86400000").as("day"))
          .agg((sum(col("o_totalprice").cast("decimal(18,2)")) /
            lit(1000000)).cast("decimal(14,8)").as("ym"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(daily,
          Seq(col("day")), "rn").localCheckpoint(eager = false)
        val pre = graft.operators.ScaleOps.globalRunningSum(
            ranked.withColumn("yy",
              round(col("ym") * col("ym"), 6).cast("decimal(28,6)")),
            Seq(col("rn")), col("ym"), "cy")
        val pre2 = graft.operators.ScaleOps.globalRunningSum(pre,
            Seq(col("rn")), col("yy"), "cyy")
          .localCheckpoint(eager = false)
        val tot = pre2.agg(max(col("rn")).as("n"),
          max(col("cy")).as("ty"), max(col("cyy")).as("tyy"))
        val cand = pre2.crossJoin(broadcast(tot))
          .filter(col("rn") >= 7 && col("rn") <= col("n") - 7)
          .withColumn("kd", col("rn").cast("double"))
          .withColumn("nd", col("n").cast("double"))
          .withColumn("sseL",
            col("cyy").cast("double") -
              col("cy").cast("double") * col("cy").cast("double") /
              col("kd"))
          .withColumn("sseR",
            (col("tyy") - col("cyy")).cast("double") -
              (col("ty") - col("cy")).cast("double") *
              (col("ty") - col("cy")).cast("double") /
              (col("nd") - col("kd")))
          .withColumn("sse", round(col("sseL") + col("sseR"), 9))
        val best = cand.agg(
          min(struct(col("sse").as("s"), col("rn").as("k"),
            col("day").as("d"))).as("w"),
          first(col("n")).as("n"),
          first(round(col("tyy").cast("double") -
            col("ty").cast("double") * col("ty").cast("double") /
            col("nd"), 9)).as("sst"))
        best.select(col("n"),
          col("w.k").as("split_rn"), col("w.d").as("split_day"),
          round(col("w.s"), 6).as("sse_split"),
          round(col("sst"), 6).as("sse_total"),
          round((col("sst") - col("w.s")) /
            (col("w.s") / (col("n") - 2).cast("double")), 6).as("f_stat"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT CAST(epoch_ms(o_orderdate) // 86400000 AS BIGINT) AS day,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) / 1000000
                   AS DECIMAL(14,8)) AS ym
          FROM orders GROUP BY 1),
        ranked AS (
          SELECT day, ym, ROW_NUMBER() OVER (ORDER BY day) AS rn,
                 CAST(ROUND(CAST(ym AS DECIMAL(19,8))
                   * CAST(ym AS DECIMAL(19,8)), 6) AS DECIMAL(28,6)) AS yy
          FROM daily),
        pre AS (
          SELECT day, rn,
                 SUM(ym) OVER (ORDER BY rn ROWS UNBOUNDED PRECEDING) AS cy,
                 SUM(yy) OVER (ORDER BY rn ROWS UNBOUNDED PRECEDING) AS cyy
          FROM ranked),
        tot AS (
          SELECT CAST(MAX(rn) AS BIGINT) AS n, MAX(cy) AS ty,
                 MAX(cyy) AS tyy
          FROM pre),
        cand AS (
          SELECT pre.day, pre.rn, tot.n,
                 CAST(pre.rn AS DOUBLE) AS kd, CAST(tot.n AS DOUBLE) AS nd,
                 CAST(pre.cy AS DOUBLE) AS cyd,
                 CAST(pre.cyy AS DOUBLE) AS cyyd,
                 CAST(tot.ty AS DOUBLE) AS tyd,
                 CAST(tot.tyy AS DOUBLE) AS tyyd,
                 CAST(tot.ty - pre.cy AS DOUBLE) AS ryd,
                 CAST(tot.tyy - pre.cyy AS DOUBLE) AS ryyd
          FROM pre CROSS JOIN tot
          WHERE pre.rn >= 7 AND pre.rn <= tot.n - 7),
        sse AS (
          SELECT day, rn, n, nd, tyd, tyyd,
                 ROUND((cyyd - cyd * cyd / kd)
                   + (ryyd - ryd * ryd / (nd - kd)), 9) AS sse
          FROM cand),
        best AS (
          SELECT MIN({'s': sse, 'k': rn, 'd': day}) AS w,
                 MAX(n) AS n,
                 ROUND(MAX(tyyd) - MAX(tyd) * MAX(tyd) / MAX(nd), 9)
                   AS sst
          FROM sse)
        SELECT n, w['k'] AS split_rn, w['d'] AS split_day,
               ROUND(w['s'], 6) AS sse_split,
               ROUND(sst, 6) AS sse_total,
               ROUND((sst - w['s']) / (w['s'] / CAST(n - 2 AS DOUBLE)), 6)
                 AS f_stat
        FROM best""")),

    // Periodogram of daily revenue at candidate periods 7/14/30/91/365:
    // spectral power (Σy·cos)² + (Σy·sin)² with phases reduced mod the
    // period BEFORE the trig call (t mod P keeps arguments in [0, 2π),
    // where sin/cos parity is qa6-proven; large-argument reduction is
    // libm-divergent) and every trig term 9-snapped through DECIMAL so
    // last-ulp noise never reaches the sum. Dominant period by struct
    // argmax. The frequency-domain twin of q7p's day-of-week profile.
    "qca_periodogram" -> Q(
      fn = (s, dir) => {
        val daily = t(s, dir, "orders")
          .groupBy(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP))" +
            " div 86400000").as("day"))
          .agg((sum(col("o_totalprice").cast("decimal(18,2)")) /
            lit(1000000)).cast("decimal(14,8)").as("ym"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(daily,
          Seq(col("day")), "rn").localCheckpoint(eager = false)
        val mu = ranked.agg(count(lit(1)).as("n"), sum(col("ym")).as("sy"))
          .select(col("n"),
            round(col("sy").cast("double") / col("n").cast("double"), 9)
              .as("mu"))
        val periods = s.createDataFrame(Seq(Tuple1(7L), Tuple1(14L),
          Tuple1(30L), Tuple1(91L), Tuple1(365L))).toDF("p")
        val terms = ranked.crossJoin(broadcast(periods))
          .crossJoin(broadcast(mu))
          .withColumn("ang", lit(2.0 * math.Pi) *
            pmod(col("rn"), col("p")).cast("double") /
            col("p").cast("double"))
          .withColumn("yc", col("ym").cast("double") - col("mu"))
          .groupBy(col("p"))
          .agg(first(col("n")).as("n"),
            sum(round(col("yc") * cos(col("ang")), 9)
              .cast("decimal(28,9)")).as("ct"),
            sum(round(col("yc") * sin(col("ang")), 9)
              .cast("decimal(28,9)")).as("st"))
          .withColumn("power", round(
            (col("ct").cast("double") * col("ct").cast("double") +
             col("st").cast("double") * col("st").cast("double")) *
            lit(2.0) / col("n").cast("double"), 9))
        val dom = terms.agg(
          max(struct(col("power").as("pw"), (-col("p")).as("np"))).as("w"))
          .select((-col("w.np")).as("dominant_period"))
        terms.crossJoin(broadcast(dom))
          .select(col("p").as("period"), col("n").as("n_days"),
            round(col("ct").cast("double"), 6).as("cos_sum"),
            round(col("st").cast("double"), 6).as("sin_sum"),
            round(col("power"), 6).as("power"),
            col("dominant_period"))
          .orderBy(col("period"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT CAST(epoch_ms(o_orderdate) // 86400000 AS BIGINT) AS day,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) / 1000000
                   AS DECIMAL(14,8)) AS ym
          FROM orders GROUP BY 1),
        ranked AS (
          SELECT ym, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM daily),
        mu AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 ROUND(CAST(SUM(ym) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
                   9) AS mu
          FROM ranked),
        periods AS (SELECT CAST(unnest([7, 14, 30, 91, 365]) AS BIGINT)
                      AS p),
        terms AS (
          SELECT p, MAX(mu.n) AS n,
                 SUM(CAST(ROUND((CAST(ym AS DOUBLE) - mu.mu)
                   * COS(CAST(2 AS DOUBLE) * pi()
                     * CAST(rn % p AS DOUBLE) / CAST(p AS DOUBLE)), 9)
                   AS DECIMAL(28,9))) AS ct,
                 SUM(CAST(ROUND((CAST(ym AS DOUBLE) - mu.mu)
                   * SIN(CAST(2 AS DOUBLE) * pi()
                     * CAST(rn % p AS DOUBLE) / CAST(p AS DOUBLE)), 9)
                   AS DECIMAL(28,9))) AS st
          FROM ranked CROSS JOIN periods CROSS JOIN mu
          GROUP BY 1),
        pw AS (
          SELECT p, n, ct, st,
                 ROUND((CAST(ct AS DOUBLE) * CAST(ct AS DOUBLE)
                   + CAST(st AS DOUBLE) * CAST(st AS DOUBLE))
                   * CAST(2 AS DOUBLE) / CAST(n AS DOUBLE), 9) AS power
          FROM terms),
        dom AS (
          SELECT -(MAX({'pw': power, 'np': -p})['np']) AS dominant_period
          FROM pw)
        SELECT p AS period, n AS n_days,
               ROUND(CAST(ct AS DOUBLE), 6) + CAST(0 AS DOUBLE) AS cos_sum,
               ROUND(CAST(st AS DOUBLE), 6) + CAST(0 AS DOUBLE) AS sin_sum,
               ROUND(power, 6) AS power,
               dom.dominant_period
        FROM pw CROSS JOIN dom
        ORDER BY period""")),

    // James-Stein shrinkage of the 25 nation mean order values toward
    // the grand mean: B = 1 − (k−3)·σ̄²/Σ(m_i−m̄)² with the positive-part
    // rule, σ̄² the average squared standard error — the estimator that
    // dominates the raw means whenever k ≥ 4, and the simplest empirical
    // Bayes result worth shipping next to q7y's target encoding.
    "qcb_james_stein" -> Q(
      fn = (s, dir) => {
        val g = t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_nationkey").as("nation"))
          .agg(count(lit(1)).as("n"),
            sum((col("o_totalprice").cast("decimal(18,2)") / lit(1000000))
              .cast("decimal(14,8)")).as("sy"),
            sum(round((col("o_totalprice").cast("decimal(18,2)") /
              lit(1000000)).cast("decimal(14,8)") *
              (col("o_totalprice").cast("decimal(18,2)") / lit(1000000))
                .cast("decimal(14,8)"), 6).cast("decimal(28,6)")).as("syy"))
          .withColumn("nd", col("n").cast("double"))
          .withColumn("m", round(col("sy").cast("double") / col("nd"), 9))
          .withColumn("se2", round(
            ((col("syy").cast("double") - col("nd") * col("m") * col("m")) /
              (col("nd") - lit(1.0))) / col("nd"), 12))
          .localCheckpoint(eager = false)
        val gm = g.agg(count(lit(1)).as("k"),
            sum(col("m").cast("decimal(28,9)")).as("sm"),
            sum(col("se2").cast("decimal(28,12)")).as("sse2"))
          .withColumn("kd", col("k").cast("double"))
          .withColumn("mbar", round(col("sm").cast("double") / col("kd"), 9))
          .withColumn("s2bar",
            round(col("sse2").cast("double") / col("kd"), 12))
        val dev = g.crossJoin(broadcast(gm.select(col("mbar"))))
          .agg(sum(round((col("m") - col("mbar")) * (col("m") - col("mbar")),
            12).cast("decimal(28,12)")).as("ssd"))
        val shrink = gm.crossJoin(broadcast(dev))
          .withColumn("b", round(greatest(lit(0.0),
            lit(1.0) - (col("kd") - lit(3.0)) * col("s2bar") /
              col("ssd").cast("double")), 9))
          .select(col("mbar"), col("b"), col("k"))
        g.crossJoin(broadcast(shrink))
          .select(col("nation"), col("n"),
            round(col("m"), 6).as("raw_mean"),
            round(col("mbar") + col("b") * (col("m") - col("mbar")), 6)
              .as("js_mean"),
            round(col("b"), 6).as("shrink_factor"))
          .orderBy(col("nation"))
      },
      oracle = Some("""
        WITH o AS (
          SELECT c_nationkey AS nation,
                 CAST(CAST(o_totalprice AS DECIMAL(18,2)) / 1000000
                   AS DECIMAL(14,8)) AS y
          FROM orders JOIN customer ON o_custkey = c_custkey),
        g AS (
          SELECT nation, CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(COUNT(*) AS DOUBLE) AS nd,
                 ROUND(CAST(SUM(y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 9)
                   AS m,
                 SUM(CAST(ROUND(CAST(y AS DECIMAL(19,8))
                   * CAST(y AS DECIMAL(19,8)), 6) AS DECIMAL(28,6))) AS syy
          FROM o GROUP BY 1),
        g2 AS MATERIALIZED (
          SELECT nation, n, m,
                 ROUND(((CAST(syy AS DOUBLE) - nd * m * m)
                   / (nd - CAST(1 AS DOUBLE))) / nd, 12) AS se2
          FROM g),
        gm AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS k,
                 CAST(COUNT(*) AS DOUBLE) AS kd,
                 ROUND(CAST(SUM(CAST(m AS DECIMAL(28,9))) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE), 9) AS mbar,
                 ROUND(CAST(SUM(CAST(se2 AS DECIMAL(28,12))) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE), 12) AS s2bar
          FROM g2),
        dev AS (
          SELECT CAST(SUM(CAST(ROUND((g2.m - gm.mbar) * (g2.m - gm.mbar),
                   12) AS DECIMAL(28,12))) AS DOUBLE) AS ssd
          FROM g2 CROSS JOIN gm),
        sh AS (
          SELECT gm.mbar,
                 ROUND(GREATEST(CAST(0 AS DOUBLE),
                   CAST(1 AS DOUBLE) - (gm.kd - CAST(3 AS DOUBLE))
                     * gm.s2bar / dev.ssd), 9) AS b
          FROM gm CROSS JOIN dev)
        SELECT g2.nation, g2.n,
               ROUND(g2.m, 6) AS raw_mean,
               ROUND(sh.mbar + sh.b * (g2.m - sh.mbar), 6) AS js_mean,
               ROUND(sh.b, 6) AS shrink_factor
        FROM g2 CROSS JOIN sh ORDER BY g2.nation""")),

    // Peaks-over-threshold GPD fit of daily revenue exceedances: the
    // 90th-percentile threshold is the exact ⌈0.9n⌉-th order statistic
    // (global row number, pinned definition), exceedances stay EXACT
    // DECIMALS, and the generalized-Pareto fit comes from method of
    // moments — ξ̂ = ½(1 − m²/s²), σ̂ = m(1−ξ̂) = ½m(m²/s² + 1). The
    // POT complement of qb8's block-maxima Gumbel.
    "qcc_gpd_pot" -> Q(
      fn = (s, dir) => {
        val daily = t(s, dir, "orders")
          .groupBy(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP))" +
            " div 86400000").as("day"))
          .agg((sum(col("o_totalprice").cast("decimal(18,2)")) /
            lit(1000000)).cast("decimal(14,8)").as("ym"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(daily,
          Seq(col("ym"), col("day")), "rn").localCheckpoint(eager = false)
        val n = ranked.agg(count(lit(1)).as("n"))
        val thr = ranked.crossJoin(broadcast(n))
          .filter(col("rn") === ceil(col("n") * lit(0.9)).cast("long"))
          .select(col("ym").as("u"))
        val exc = ranked.crossJoin(broadcast(thr))
          .filter(col("ym") > col("u"))
          .select((col("ym") - col("u")).as("e"), col("u"))
        val mom = exc.agg(count(lit(1)).as("ne"), first(col("u")).as("u"),
            sum(col("e")).as("se"),
            sum(round(col("e") * col("e"), 6).cast("decimal(28,6)"))
              .as("see"))
          .withColumn("ned", col("ne").cast("double"))
          .withColumn("m", round(col("se").cast("double") / col("ned"), 9))
          .withColumn("s2", round(
            (col("see").cast("double") - col("ned") * col("m") * col("m")) /
            (col("ned") - lit(1.0)), 12))
        mom
          .withColumn("r", col("m") * col("m") / col("s2"))
          .select(col("ne").as("n_exceedances"),
            round(col("u").cast("double"), 6).as("threshold"),
            round(col("m"), 6).as("mean_excess"),
            round(lit(0.5) * (lit(1.0) - col("r")), 6).as("gpd_xi"),
            round(lit(0.5) * col("m") * (col("r") + lit(1.0)), 6)
              .as("gpd_sigma"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT CAST(epoch_ms(o_orderdate) // 86400000 AS BIGINT) AS day,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) / 1000000
                   AS DECIMAL(14,8)) AS ym
          FROM orders GROUP BY 1),
        ranked AS (
          SELECT ym, ROW_NUMBER() OVER (ORDER BY ym, day) AS rn,
                 CAST(COUNT(*) OVER () AS BIGINT) AS n
          FROM daily),
        thr AS (
          SELECT ym AS u FROM ranked
          WHERE rn = CAST(CEIL(CAST(n AS DOUBLE) * CAST(0.9 AS DOUBLE))
                     AS BIGINT)),
        exc AS (
          SELECT ranked.ym - thr.u AS e, thr.u
          FROM ranked CROSS JOIN thr
          WHERE ranked.ym > thr.u),
        mom AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS ne,
                 CAST(COUNT(*) AS DOUBLE) AS ned,
                 MAX(u) AS u, SUM(e) AS se,
                 SUM(CAST(ROUND(CAST(e AS DECIMAL(19,8))
                   * CAST(e AS DECIMAL(19,8)), 6) AS DECIMAL(28,6)))
                   AS see
          FROM exc),
        f AS (
          SELECT ne, u,
                 ROUND(CAST(se AS DOUBLE) / ned, 9) AS m,
                 ned, see
          FROM mom),
        f2 AS (
          SELECT *, ROUND((CAST(see AS DOUBLE) - ned * m * m)
                   / (ned - CAST(1 AS DOUBLE)), 12) AS s2
          FROM f),
        f3 AS (SELECT *, m * m / s2 AS r FROM f2)
        SELECT ne AS n_exceedances,
               ROUND(CAST(u AS DOUBLE), 6) AS threshold,
               ROUND(m, 6) AS mean_excess,
               ROUND(CAST(0.5 AS DOUBLE) * (CAST(1 AS DOUBLE) - r), 6)
                 + CAST(0 AS DOUBLE) AS gpd_xi,
               ROUND(CAST(0.5 AS DOUBLE) * m * (r + CAST(1 AS DOUBLE)), 6)
                 AS gpd_sigma
        FROM f3""")),

    // Cosinor (harmonic) regression: daily revenue on the annual
    // cos/sin pair — the 3×3 Cramer solve over 9-snapped trig-product
    // moments (qca's mod-the-period phase discipline), annual amplitude
    // √(b²+c²), and R² from the algebraic SSE identity
    // SSE = Σy² − θᵀXᵀy (exact at the LS solution — no residual pass).
    // Fits WHAT qca's periodogram only scores.
    "qcd_cosinor_regression" -> Q(
      fn = (s, dir) => {
        val daily = t(s, dir, "orders")
          .groupBy(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP))" +
            " div 86400000").as("day"))
          .agg((sum(col("o_totalprice").cast("decimal(18,2)")) /
            lit(1000000)).cast("decimal(14,8)").as("ym"))
        val terms = daily
          .withColumn("ang", lit(2.0 * math.Pi) *
            pmod(col("day"), lit(365L)).cast("double") / lit(365.0))
          .select(col("ym").cast("double").as("y"),
            round(cos(col("ang")), 9).as("cc"),
            round(sin(col("ang")), 9).as("ss"))
        val mom = terms.agg(count(lit(1)).as("n"),
          sum(round(col("cc"), 9).cast("decimal(28,9)")).as("s1"),
          sum(round(col("ss"), 9).cast("decimal(28,9)")).as("s2"),
          sum(round(col("cc") * col("cc"), 9).cast("decimal(28,9)"))
            .as("s11"),
          sum(round(col("ss") * col("ss"), 9).cast("decimal(28,9)"))
            .as("s22"),
          sum(round(col("cc") * col("ss"), 9).cast("decimal(28,9)"))
            .as("s12"),
          sum(round(col("y"), 9).cast("decimal(28,9)")).as("t0"),
          sum(round(col("y") * col("cc"), 9).cast("decimal(28,9)"))
            .as("t1"),
          sum(round(col("y") * col("ss"), 9).cast("decimal(28,9)"))
            .as("t2"),
          sum(round(col("y") * col("y"), 6).cast("decimal(28,6)"))
            .as("tyy"))
        val d = mom.select(col("n"),
          col("n").cast("double").as("s0"),
          col("s1").cast("double").as("s1"), col("s2").cast("double").as("s2"),
          col("s11").cast("double").as("s11"),
          col("s22").cast("double").as("s22"),
          col("s12").cast("double").as("s12"),
          col("t0").cast("double").as("t0"), col("t1").cast("double").as("t1"),
          col("t2").cast("double").as("t2"),
          col("tyy").cast("double").as("tyy"))
        d.withColumn("det",
            col("s0") * (col("s11") * col("s22") - col("s12") * col("s12")) -
            col("s1") * (col("s1") * col("s22") - col("s12") * col("s2")) +
            col("s2") * (col("s1") * col("s12") - col("s11") * col("s2")))
          .withColumn("a", round((
            col("t0") * (col("s11") * col("s22") - col("s12") * col("s12")) -
            col("s1") * (col("t1") * col("s22") - col("t2") * col("s12")) +
            col("s2") * (col("t1") * col("s12") - col("t2") * col("s11"))) /
            col("det"), 9))
          .withColumn("b", round((
            col("s0") * (col("t1") * col("s22") - col("t2") * col("s12")) -
            col("t0") * (col("s1") * col("s22") - col("s2") * col("s12")) +
            col("s2") * (col("s1") * col("t2") - col("s2") * col("t1"))) /
            col("det"), 9))
          .withColumn("c", round((
            col("s0") * (col("s11") * col("t2") - col("s12") * col("t1")) -
            col("s1") * (col("s1") * col("t2") - col("s12") * col("t0")) +
            col("t0") * (col("s1") * col("s12") - col("s11") * col("s2"))) /
            col("det"), 9))
          .withColumn("sse", round(col("tyy") - col("a") * col("t0") -
            col("b") * col("t1") - col("c") * col("t2"), 9))
          .withColumn("sst", round(col("tyy") -
            col("t0") * col("t0") / col("s0"), 9))
          .select(col("n").as("n_days"),
            round(col("a"), 6).as("mesor"),
            round(col("b"), 6).as("cos_coef"),
            round(col("c"), 6).as("sin_coef"),
            round(sqrt(col("b") * col("b") + col("c") * col("c")), 6)
              .as("amplitude"),
            round(lit(1.0) - col("sse") / col("sst"), 6).as("r2"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT CAST(epoch_ms(o_orderdate) // 86400000 AS BIGINT) AS day,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) / 1000000
                   AS DECIMAL(14,8)) AS ym
          FROM orders GROUP BY 1),
        terms AS (
          SELECT CAST(ym AS DOUBLE) AS y,
                 ROUND(COS(CAST(2 AS DOUBLE) * pi()
                   * CAST(day % 365 AS DOUBLE) / CAST(365 AS DOUBLE)), 9)
                   AS cc,
                 ROUND(SIN(CAST(2 AS DOUBLE) * pi()
                   * CAST(day % 365 AS DOUBLE) / CAST(365 AS DOUBLE)), 9)
                   AS ss
          FROM daily),
        mom AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(ROUND(cc, 9) AS DECIMAL(28,9))) AS s1,
                 SUM(CAST(ROUND(ss, 9) AS DECIMAL(28,9))) AS s2,
                 SUM(CAST(ROUND(cc * cc, 9) AS DECIMAL(28,9))) AS s11,
                 SUM(CAST(ROUND(ss * ss, 9) AS DECIMAL(28,9))) AS s22,
                 SUM(CAST(ROUND(cc * ss, 9) AS DECIMAL(28,9))) AS s12,
                 SUM(CAST(ROUND(y, 9) AS DECIMAL(28,9))) AS t0,
                 SUM(CAST(ROUND(y * cc, 9) AS DECIMAL(28,9))) AS t1,
                 SUM(CAST(ROUND(y * ss, 9) AS DECIMAL(28,9))) AS t2,
                 SUM(CAST(ROUND(y * y, 6) AS DECIMAL(28,6))) AS tyy
          FROM terms),
        d AS (
          SELECT n, CAST(n AS DOUBLE) AS s0,
                 CAST(s1 AS DOUBLE) AS s1, CAST(s2 AS DOUBLE) AS s2,
                 CAST(s11 AS DOUBLE) AS s11, CAST(s22 AS DOUBLE) AS s22,
                 CAST(s12 AS DOUBLE) AS s12,
                 CAST(t0 AS DOUBLE) AS t0, CAST(t1 AS DOUBLE) AS t1,
                 CAST(t2 AS DOUBLE) AS t2, CAST(tyy AS DOUBLE) AS tyy
          FROM mom),
        dt AS (
          SELECT *, s0 * (s11 * s22 - s12 * s12)
                   - s1 * (s1 * s22 - s12 * s2)
                   + s2 * (s1 * s12 - s11 * s2) AS det
          FROM d),
        cf AS (
          SELECT *,
            ROUND((t0 * (s11 * s22 - s12 * s12) - s1 * (t1 * s22 - t2 * s12)
              + s2 * (t1 * s12 - t2 * s11)) / det, 9) AS a,
            ROUND((s0 * (t1 * s22 - t2 * s12) - t0 * (s1 * s22 - s2 * s12)
              + s2 * (s1 * t2 - s2 * t1)) / det, 9) AS b,
            ROUND((s0 * (s11 * t2 - s12 * t1) - s1 * (s1 * t2 - s12 * t0)
              + t0 * (s1 * s12 - s11 * s2)) / det, 9) AS c
          FROM dt),
        fin AS (
          SELECT *, ROUND(tyy - a * t0 - b * t1 - c * t2, 9) AS sse,
                 ROUND(tyy - t0 * t0 / s0, 9) AS sst
          FROM cf)
        SELECT n AS n_days,
               ROUND(a, 6) AS mesor,
               ROUND(b, 6) + CAST(0 AS DOUBLE) AS cos_coef,
               ROUND(c, 6) + CAST(0 AS DOUBLE) AS sin_coef,
               ROUND(SQRT(b * b + c * c), 6) AS amplitude,
               ROUND(CAST(1 AS DOUBLE) - sse / sst, 6) AS r2
        FROM fin""")),

    // Circular statistics of the order day-of-week: mean resultant
    // length R̄ from the 7-cell count profile (θ takes 7 values — the
    // trig runs over the bounded profile, one cos/sin per cell),
    // circular variance 1 − R̄, and the Rayleigh uniformity statistic
    // z = nR̄² — "is ordering uniform over the week?" asked the
    // direction-aware way (q7p's day-of-week profile can't distinguish
    // concentration from its phase).
    "qce_circular_dow" -> Q(
      fn = (s, dir) => {
        val cells = t(s, dir, "orders")
          .groupBy(pmod(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP))" +
            " div 86400000"), lit(7L)).as("dow"))
          .agg(count(lit(1)).as("nd"))
          .withColumn("ang", lit(2.0 * math.Pi) *
            col("dow").cast("double") / lit(7.0))
        val agg1 = cells.agg(sum(col("nd")).as("n"),
          sum(round(col("nd").cast("double") * cos(col("ang")), 9)
            .cast("decimal(28,9)")).as("cs"),
          sum(round(col("nd").cast("double") * sin(col("ang")), 9)
            .cast("decimal(28,9)")).as("sn"))
        agg1
          .withColumn("rbar", round(sqrt(
            col("cs").cast("double") * col("cs").cast("double") +
            col("sn").cast("double") * col("sn").cast("double")) /
            col("n").cast("double"), 9))
          .select(col("n").as("n_orders"),
            round(col("cs").cast("double"), 6).as("cos_sum"),
            round(col("sn").cast("double"), 6).as("sin_sum"),
            round(col("rbar"), 6).as("mean_resultant"),
            round(lit(1.0) - col("rbar"), 6).as("circular_variance"),
            round(col("n").cast("double") * col("rbar") * col("rbar"), 6)
              .as("rayleigh_z"))
      },
      oracle = Some("""
        WITH cells AS (
          SELECT CAST((epoch_ms(o_orderdate) // 86400000) % 7 AS BIGINT)
                   AS dow,
                 CAST(COUNT(*) AS BIGINT) AS nd
          FROM orders GROUP BY 1),
        agg1 AS (
          SELECT CAST(SUM(nd) AS BIGINT) AS n,
                 SUM(CAST(ROUND(CAST(nd AS DOUBLE)
                   * COS(CAST(2 AS DOUBLE) * pi() * CAST(dow AS DOUBLE)
                     / CAST(7 AS DOUBLE)), 9) AS DECIMAL(28,9))) AS cs,
                 SUM(CAST(ROUND(CAST(nd AS DOUBLE)
                   * SIN(CAST(2 AS DOUBLE) * pi() * CAST(dow AS DOUBLE)
                     / CAST(7 AS DOUBLE)), 9) AS DECIMAL(28,9))) AS sn
          FROM cells),
        f AS (
          SELECT n,
                 CAST(cs AS DOUBLE) AS csd, CAST(sn AS DOUBLE) AS snd,
                 ROUND(SQRT(CAST(cs AS DOUBLE) * CAST(cs AS DOUBLE)
                   + CAST(sn AS DOUBLE) * CAST(sn AS DOUBLE))
                   / CAST(n AS DOUBLE), 9) AS rbar
          FROM agg1)
        SELECT n AS n_orders,
               ROUND(csd, 6) + CAST(0 AS DOUBLE) AS cos_sum,
               ROUND(snd, 6) + CAST(0 AS DOUBLE) AS sin_sum,
               ROUND(rbar, 6) AS mean_resultant,
               ROUND(CAST(1 AS DOUBLE) - rbar, 6) AS circular_variance,
               ROUND(CAST(n AS DOUBLE) * rbar * rbar, 6) AS rayleigh_z
        FROM f""")),

    // Hutcheson's t-test for Shannon diversity: brand-mix entropy of
    // region 0 vs region 1 lineitems, each with its estimator variance
    // (Σp·ln²p − H²)/N and the Welch-style df — the significance test
    // behind "is this region's assortment more diverse", which a point
    // estimate of H (q91's corpus diversity) cannot answer.
    "qcf_diversity_ttest" -> Q(
      fn = (s, dir) => {
        val li = t(s, dir, "lineitem")
          .join(t(s, dir, "part"), col("l_partkey") === col("p_partkey"))
          .join(t(s, dir, "orders"), col("l_orderkey") === col("o_orderkey"))
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
          .filter(col("n_regionkey") <= 1)
          .select(col("n_regionkey").as("rg"), col("p_brand").as("brand"))
        val cnt = li.groupBy(col("rg"), col("brand"))
          .agg(count(lit(1)).as("c"))
        val tot = cnt.groupBy(col("rg")).agg(sum(col("c")).as("nt"))
        val ent = cnt.join(tot, Seq("rg"))
          .withColumn("p", col("c").cast("double") /
            col("nt").cast("double"))
          .withColumn("lp", log(col("p")))
          .groupBy(col("rg"))
          .agg(first(col("nt")).as("nt"),
            sum(round(-col("p") * col("lp"), 12).cast("decimal(28,12)"))
              .as("h"),
            sum(round(col("p") * col("lp") * col("lp"), 12)
              .cast("decimal(28,12)")).as("hl2"))
          .withColumn("hd", round(col("h").cast("double"), 9))
          .withColumn("vh", round(
            (col("hl2").cast("double") - col("hd") * col("hd")) /
            col("nt").cast("double"), 12))
        def side(r: Int, c: String) = max(when(col("rg") === r, col(c)))
        ent.agg(
            side(0, "nt").as("n0"), side(1, "nt").as("n1"),
            side(0, "hd").as("h0"), side(1, "hd").as("h1"),
            side(0, "vh").as("v0"), side(1, "vh").as("v1"))
          .withColumn("se", sqrt(col("v0") + col("v1")))
          .select(col("n0"), col("n1"),
            round(col("h0"), 6).as("h_region0"),
            round(col("h1"), 6).as("h_region1"),
            round((col("h0") - col("h1")) / col("se"), 6).as("t_stat"),
            round((col("v0") + col("v1")) * (col("v0") + col("v1")) /
              (col("v0") * col("v0") / col("n0").cast("double") +
               col("v1") * col("v1") / col("n1").cast("double")), 2)
              .as("welch_df"))
      },
      oracle = Some("""
        WITH li AS (
          SELECT n_regionkey AS rg, p_brand AS brand
          FROM lineitem JOIN part ON l_partkey = p_partkey
          JOIN orders ON l_orderkey = o_orderkey
          JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          WHERE n_regionkey <= 1),
        cnt AS (
          SELECT rg, brand, CAST(COUNT(*) AS BIGINT) AS c
          FROM li GROUP BY 1, 2),
        tot AS (SELECT rg, CAST(SUM(c) AS BIGINT) AS nt
                FROM cnt GROUP BY 1),
        ent AS (
          SELECT cnt.rg, MAX(tot.nt) AS nt,
                 SUM(CAST(ROUND(-(CAST(c AS DOUBLE)
                     / CAST(tot.nt AS DOUBLE))
                   * ln(CAST(c AS DOUBLE) / CAST(tot.nt AS DOUBLE)), 12)
                   AS DECIMAL(28,12))) AS h,
                 SUM(CAST(ROUND((CAST(c AS DOUBLE)
                     / CAST(tot.nt AS DOUBLE))
                   * ln(CAST(c AS DOUBLE) / CAST(tot.nt AS DOUBLE))
                   * ln(CAST(c AS DOUBLE) / CAST(tot.nt AS DOUBLE)), 12)
                   AS DECIMAL(28,12))) AS hl2
          FROM cnt JOIN tot ON cnt.rg = tot.rg
          GROUP BY 1),
        ev AS (
          SELECT rg, nt, ROUND(CAST(h AS DOUBLE), 9) AS hd,
                 ROUND((CAST(hl2 AS DOUBLE)
                   - ROUND(CAST(h AS DOUBLE), 9)
                     * ROUND(CAST(h AS DOUBLE), 9))
                   / CAST(nt AS DOUBLE), 12) AS vh
          FROM ent),
        w AS (
          SELECT MAX(CASE WHEN rg = 0 THEN nt END) AS n0,
                 MAX(CASE WHEN rg = 1 THEN nt END) AS n1,
                 MAX(CASE WHEN rg = 0 THEN hd END) AS h0,
                 MAX(CASE WHEN rg = 1 THEN hd END) AS h1,
                 MAX(CASE WHEN rg = 0 THEN vh END) AS v0,
                 MAX(CASE WHEN rg = 1 THEN vh END) AS v1
          FROM ev)
        SELECT n0, n1,
               ROUND(h0, 6) AS h_region0,
               ROUND(h1, 6) AS h_region1,
               ROUND((h0 - h1) / SQRT(v0 + v1), 6) + CAST(0 AS DOUBLE)
                 AS t_stat,
               ROUND((v0 + v1) * (v0 + v1)
                 / (v0 * v0 / CAST(n0 AS DOUBLE)
                    + v1 * v1 / CAST(n1 AS DOUBLE)), 2) AS welch_df
        FROM w""")),

    // Two-sample Cramér-von Mises: region-0 vs region-1 order values,
    // T = nm/N² · Σ over the POOLED sample of (F₁−F₂)² — integrates the
    // whole ECDF gap where q6u's KS takes only its supremum, so it sees
    // distributed shape differences KS misses. Cumulative counts off the
    // range-partitioned running sum over the distinct-value profile;
    // each distinct value contributes its multiplicity times the exact
    // squared gap on the 12-grid.
    "qcg_cramer_von_mises" -> Q(
      fn = (s, dir) => {
        val o = t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
          .filter(col("n_regionkey") <= 1)
          .select(col("n_regionkey").as("rg"),
            col("o_totalprice").cast("decimal(18,2)").as("y"))
        val prof = o.groupBy(col("y"))
          .agg(sum(when(col("rg") === 0, 1L).otherwise(0L)).as("c1"),
            sum(when(col("rg") === 1, 1L).otherwise(0L)).as("c2"))
        val cum = graft.operators.ScaleOps.globalRunningSum(
            graft.operators.ScaleOps.globalRunningSum(prof,
              Seq(col("y")), col("c1"), "k1"),
            Seq(col("y")), col("c2"), "k2")
        val tot = prof.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
        val stat = cum.crossJoin(broadcast(tot))
          .withColumn("gap",
            round(col("k1").cast("double") / col("n1").cast("double") -
              col("k2").cast("double") / col("n2").cast("double"), 9))
          .agg(first(col("n1")).as("n1"), first(col("n2")).as("n2"),
            sum(round((col("c1") + col("c2")).cast("double") *
              col("gap") * col("gap"), 12).cast("decimal(28,12)"))
              .as("sg"))
        stat.select(col("n1"), col("n2"),
          round(col("n1").cast("double") * col("n2").cast("double") /
            ((col("n1") + col("n2")).cast("double") *
             (col("n1") + col("n2")).cast("double")) *
            col("sg").cast("double"), 6).as("cvm_t"))
      },
      oracle = Some("""
        WITH o AS (
          SELECT n_regionkey AS rg, CAST(o_totalprice AS DECIMAL(18,2)) AS y
          FROM orders JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          WHERE n_regionkey <= 1),
        prof AS (
          SELECT y,
                 CAST(SUM(CASE WHEN rg = 0 THEN 1 ELSE 0 END) AS BIGINT)
                   AS c1,
                 CAST(SUM(CASE WHEN rg = 1 THEN 1 ELSE 0 END) AS BIGINT)
                   AS c2
          FROM o GROUP BY 1),
        cum AS (
          SELECT y, c1, c2,
                 CAST(SUM(c1) OVER (ORDER BY y ROWS UNBOUNDED PRECEDING)
                   AS BIGINT) AS k1,
                 CAST(SUM(c2) OVER (ORDER BY y ROWS UNBOUNDED PRECEDING)
                   AS BIGINT) AS k2
          FROM prof),
        tot AS (
          SELECT CAST(SUM(c1) AS BIGINT) AS n1,
                 CAST(SUM(c2) AS BIGINT) AS n2
          FROM prof),
        stat AS (
          SELECT tot.n1, tot.n2,
                 SUM(CAST(ROUND(CAST(c1 + c2 AS DOUBLE)
                   * ROUND(CAST(k1 AS DOUBLE) / CAST(tot.n1 AS DOUBLE)
                       - CAST(k2 AS DOUBLE) / CAST(tot.n2 AS DOUBLE), 9)
                   * ROUND(CAST(k1 AS DOUBLE) / CAST(tot.n1 AS DOUBLE)
                       - CAST(k2 AS DOUBLE) / CAST(tot.n2 AS DOUBLE), 9),
                   12) AS DECIMAL(28,12))) AS sg
          FROM cum CROSS JOIN tot
          GROUP BY 1, 2)
        SELECT n1, n2,
               ROUND(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
                 / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 AS DOUBLE))
                 * CAST(sg AS DOUBLE), 6) AS cvm_t
        FROM stat""")),

    // Wilcoxon signed-rank on PAIRED region-0/region-1 monthly revenue:
    // exact decimal differences, average ranks of |d| over the bounded
    // month table (the qa4 tie idiom), W⁺ and the tie-corrected normal
    // approximation — the paired-sample slot between q7o's unpaired
    // Mann-Whitney and q7n's parametric t.
    "qch_wilcoxon_signed_rank" -> Q(
      fn = (s, dir) => {
        val rev = t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
          .filter(col("n_regionkey") <= 1)
          .groupBy(col("n_regionkey").as("rg"),
            expr("unix_millis(CAST(o_orderdate AS TIMESTAMP))" +
              " div 86400000 div 30").as("mo"))
          .agg((sum(col("o_totalprice").cast("decimal(18,2)")) /
            lit(1000000)).cast("decimal(14,8)").as("v"))
        val pair = rev.filter(col("rg") === 0)
          .select(col("mo"), col("v").as("x"))
          .join(rev.filter(col("rg") === 1)
            .select(col("mo"), col("v").as("yv")), Seq("mo"))
          .withColumn("d", col("yv") - col("x"))
          .filter(col("d") =!= lit(0).cast("decimal(15,8)"))
          .withColumn("ad", abs(col("d")))
        val wr = Window.orderBy(col("ad"))
        val wt = Window.partitionBy(col("ad"))
        val ranked = pair
          .withColumn("rk", rank().over(wr).cast("double") +
            (count(lit(1)).over(wt).cast("double") - lit(1.0)) / lit(2.0))
        val ties = pair.groupBy(col("ad")).agg(count(lit(1)).as("t"))
          .agg(coalesce(sum(col("t") * col("t") * col("t") - col("t")),
            lit(0L)).as("tc"))
        val agg1 = ranked.agg(count(lit(1)).as("n"),
          sum(when(col("d") > 0, round(col("rk"), 6)).otherwise(lit(0.0))
            .cast("decimal(28,6)")).as("wplus"))
        agg1.crossJoin(broadcast(ties))
          .withColumn("nd", col("n").cast("double"))
          .withColumn("mu", col("nd") * (col("nd") + lit(1.0)) / lit(4.0))
          .withColumn("v",
            col("nd") * (col("nd") + lit(1.0)) *
              (lit(2.0) * col("nd") + lit(1.0)) / lit(24.0) -
            col("tc").cast("double") / lit(48.0))
          .select(col("n").as("n_pairs"),
            round(col("wplus").cast("double"), 6).as("w_plus"),
            round(col("mu"), 6).as("expected"),
            round((col("wplus").cast("double") - col("mu")) /
              sqrt(col("v")), 6).as("z"))
      },
      oracle = Some("""
        WITH rev AS (
          SELECT n_regionkey AS rg,
                 CAST(epoch_ms(o_orderdate) // 86400000 // 30 AS BIGINT)
                   AS mo,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) / 1000000
                   AS DECIMAL(14,8)) AS v
          FROM orders JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          WHERE n_regionkey <= 1
          GROUP BY 1, 2),
        pair AS MATERIALIZED (
          SELECT a.mo, b.v - a.v AS d, ABS(b.v - a.v) AS ad
          FROM rev a JOIN rev b ON a.mo = b.mo AND a.rg = 0 AND b.rg = 1
          WHERE b.v - a.v <> 0),
        ranked AS (
          SELECT d,
                 CAST(RANK() OVER (ORDER BY ad) AS DOUBLE)
                   + (CAST(COUNT(*) OVER (PARTITION BY ad) AS DOUBLE)
                      - CAST(1 AS DOUBLE)) / CAST(2 AS DOUBLE) AS rk
          FROM pair),
        ties AS (
          SELECT CAST(COALESCE(SUM(t * t * t - t), 0) AS BIGINT) AS tc
          FROM (SELECT ad, CAST(COUNT(*) AS BIGINT) AS t
                FROM pair GROUP BY 1)),
        agg1 AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(CAST(CASE WHEN d > 0 THEN ROUND(rk, 6)
                          ELSE CAST(0 AS DOUBLE) END AS DECIMAL(28,6)))
                   AS wplus
          FROM ranked),
        f AS (
          SELECT n, CAST(n AS DOUBLE) AS nd,
                 CAST(wplus AS DOUBLE) AS wp, ties.tc
          FROM agg1 CROSS JOIN ties),
        f2 AS (
          SELECT *,
                 nd * (nd + CAST(1 AS DOUBLE)) / CAST(4 AS DOUBLE) AS mu,
                 nd * (nd + CAST(1 AS DOUBLE))
                   * (CAST(2 AS DOUBLE) * nd + CAST(1 AS DOUBLE))
                   / CAST(24 AS DOUBLE)
                   - CAST(tc AS DOUBLE) / CAST(48 AS DOUBLE) AS v
          FROM f)
        SELECT n AS n_pairs,
               ROUND(wp, 6) AS w_plus,
               ROUND(mu, 6) AS expected,
               ROUND((wp - mu) / SQRT(v), 6) + CAST(0 AS DOUBLE) AS z
        FROM f2""")),

    // Turning-point test for serial randomness of the daily series:
    // count strict local extrema via the qbc triple joins, z against
    // E[T] = 2(n−2)/3, Var = (16n−29)/90 — the randomness check that
    // complements qb4's runs test (runs see level persistence, turning
    // points see local oscillation).
    "qci_turning_points" -> Q(
      fn = (s, dir) => {
        val daily = t(s, dir, "orders")
          .groupBy(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP))" +
            " div 86400000").as("day"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("yk"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(daily,
          Seq(col("day")), "rn").localCheckpoint(eager = false)
        val t0 = ranked.select(col("rn"), col("yk").as("y0"))
        val t1 = ranked.select((col("rn") - 1).as("rn"), col("yk").as("y1"))
        val t2 = ranked.select((col("rn") - 2).as("rn"), col("yk").as("y2"))
        val tp = t0.join(t1, Seq("rn")).join(t2, Seq("rn"))
          .agg(sum(when(
            (col("y1") > col("y0") && col("y1") > col("y2")) ||
            (col("y1") < col("y0") && col("y1") < col("y2")), 1L)
            .otherwise(0L)).as("tp"))
        val n = ranked.agg(count(lit(1)).as("n"))
        tp.crossJoin(broadcast(n))
          .withColumn("nd", col("n").cast("double"))
          .withColumn("e", lit(2.0) * (col("nd") - lit(2.0)) / lit(3.0))
          .withColumn("v",
            (lit(16.0) * col("nd") - lit(29.0)) / lit(90.0))
          .select(col("n"), col("tp").as("turning_points"),
            round(col("e"), 6).as("expected"),
            round((col("tp").cast("double") - col("e")) / sqrt(col("v")), 6)
              .as("z"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT CAST(epoch_ms(o_orderdate) // 86400000 AS BIGINT) AS day,
                 SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS yk
          FROM orders GROUP BY 1),
        r AS (SELECT yk, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM daily),
        tp AS (
          SELECT CAST(SUM(CASE WHEN (b.yk > a.yk AND b.yk > c.yk)
                                 OR (b.yk < a.yk AND b.yk < c.yk)
                               THEN 1 ELSE 0 END) AS BIGINT) AS tp
          FROM r a JOIN r b ON b.rn = a.rn + 1 JOIN r c ON c.rn = a.rn + 2),
        nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM daily),
        f AS (
          SELECT tp.tp, nn.n, CAST(nn.n AS DOUBLE) AS nd
          FROM tp CROSS JOIN nn),
        f2 AS (
          SELECT *,
                 CAST(2 AS DOUBLE) * (nd - CAST(2 AS DOUBLE))
                   / CAST(3 AS DOUBLE) AS e,
                 (CAST(16 AS DOUBLE) * nd - CAST(29 AS DOUBLE))
                   / CAST(90 AS DOUBLE) AS v
          FROM f)
        SELECT n, tp AS turning_points,
               ROUND(e, 6) AS expected,
               ROUND((CAST(tp AS DOUBLE) - e) / SQRT(v), 6)
                 + CAST(0 AS DOUBLE) AS z
        FROM f2""")),

    // Partial autocorrelations at lags 1..5 by the Durbin-Levinson
    // recursion, unrolled over qb3's EXACT lag ACFs — every φ level
    // 9-snapped, staged CTEs in the oracle (rule 9: lateral aliases
    // inline). PACF is THE AR-order selector: qb9 fits AR(2) on faith,
    // this shows where the partial correlations actually cut off.
    "qcj_pacf_durbin_levinson" -> Q(
      fn = (s, dir) => {
        val daily = t(s, dir, "orders")
          .groupBy(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP))" +
            " div 86400000").as("day"))
          .agg((sum(col("o_totalprice").cast("decimal(18,2)")) /
            lit(1000)).cast("decimal(18,5)").as("yk"))
        val ranked = graft.operators.ScaleOps.globalRowNumber(daily,
          Seq(col("day")), "rn").localCheckpoint(eager = false)
        val stats = ranked.agg(count(lit(1)).as("n"), sum(col("yk")).as("sy"))
          .select(col("n"),
            round(col("sy").cast("double") / col("n").cast("double"), 9)
              .as("mu"))
        val centered = ranked.crossJoin(broadcast(stats))
          .select(col("rn"), (col("yk").cast("double") - col("mu")).as("c"),
            col("n"))
          .localCheckpoint(eager = false)
        val denom = centered.agg(
          sum(round(col("c") * col("c"), 6).cast("decimal(28,6)")).as("d0"),
          first(col("n")).as("n"))
        val lags = (1 to 5).map { k =>
          centered.select(col("rn"), col("c").as("ca"))
            .join(centered.select((col("rn") - k).as("rn"),
              col("c").as("cb")), Seq("rn"))
            .agg(sum(round(col("ca") * col("cb"), 6).cast("decimal(28,6)"))
              .as("num"))
            .select(lit(k).as("lag"), col("num"))
        }.reduce(_ unionByName _)
        def rk(k: Int) = max(when(col("lag") === k,
          round(col("num").cast("double") / col("d0").cast("double"), 9)))
        val rs = lags.crossJoin(broadcast(denom))
          .agg(first(col("n")).as("n"), rk(1).as("r1"), rk(2).as("r2"),
            rk(3).as("r3"), rk(4).as("r4"), rk(5).as("r5"))
        rs
          .withColumn("p11", col("r1"))
          .withColumn("p22", round((col("r2") - col("p11") * col("r1")) /
            (lit(1.0) - col("p11") * col("r1")), 9))
          .withColumn("p21", round(col("p11") - col("p22") * col("p11"), 9))
          .withColumn("p33", round(
            (col("r3") - (col("p21") * col("r2") + col("p22") * col("r1"))) /
            (lit(1.0) - (col("p21") * col("r1") + col("p22") * col("r2"))),
            9))
          .withColumn("p31", round(col("p21") - col("p33") * col("p22"), 9))
          .withColumn("p32", round(col("p22") - col("p33") * col("p21"), 9))
          .withColumn("p44", round(
            (col("r4") - (col("p31") * col("r3") + col("p32") * col("r2") +
              col("p33") * col("r1"))) /
            (lit(1.0) - (col("p31") * col("r1") + col("p32") * col("r2") +
              col("p33") * col("r3"))), 9))
          .withColumn("p41", round(col("p31") - col("p44") * col("p33"), 9))
          .withColumn("p42", round(col("p32") - col("p44") * col("p32"), 9))
          .withColumn("p43", round(col("p33") - col("p44") * col("p31"), 9))
          .withColumn("p55", round(
            (col("r5") - (col("p41") * col("r4") + col("p42") * col("r3") +
              col("p43") * col("r2") + col("p44") * col("r1"))) /
            (lit(1.0) - (col("p41") * col("r1") + col("p42") * col("r2") +
              col("p43") * col("r3") + col("p44") * col("r4"))), 9))
          .select(col("n"),
            round(col("p11"), 6).as("pacf1"),
            round(col("p22"), 6).as("pacf2"),
            round(col("p33"), 6).as("pacf3"),
            round(col("p44"), 6).as("pacf4"),
            round(col("p55"), 6).as("pacf5"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT CAST(epoch_ms(o_orderdate) // 86400000 AS BIGINT) AS day,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) / 1000
                   AS DECIMAL(18,5)) AS yk
          FROM orders GROUP BY 1),
        r AS (SELECT yk, ROW_NUMBER() OVER (ORDER BY day) AS rn FROM daily),
        st AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 ROUND(CAST(SUM(yk) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
                   9) AS mu
          FROM r),
        c AS (SELECT rn, CAST(yk AS DOUBLE) - st.mu AS c, st.n
              FROM r CROSS JOIN st),
        d0 AS (SELECT SUM(CAST(ROUND(c * c, 6) AS DECIMAL(28,6))) AS d0,
                      MAX(n) AS n
               FROM c),
        lagt AS (SELECT CAST(unnest(range(1, 6)) AS BIGINT) AS lag),
        nums AS (
          SELECT l.lag,
                 SUM(CAST(ROUND(a.c * b.c, 6) AS DECIMAL(28,6))) AS num
          FROM lagt l
          JOIN c a ON TRUE
          JOIN c b ON b.rn = a.rn + l.lag
          GROUP BY 1),
        rs AS (
          SELECT MAX(d0.n) AS n,
            MAX(CASE WHEN lag = 1 THEN ROUND(CAST(num AS DOUBLE)
              / CAST(d0.d0 AS DOUBLE), 9) END) AS r1,
            MAX(CASE WHEN lag = 2 THEN ROUND(CAST(num AS DOUBLE)
              / CAST(d0.d0 AS DOUBLE), 9) END) AS r2,
            MAX(CASE WHEN lag = 3 THEN ROUND(CAST(num AS DOUBLE)
              / CAST(d0.d0 AS DOUBLE), 9) END) AS r3,
            MAX(CASE WHEN lag = 4 THEN ROUND(CAST(num AS DOUBLE)
              / CAST(d0.d0 AS DOUBLE), 9) END) AS r4,
            MAX(CASE WHEN lag = 5 THEN ROUND(CAST(num AS DOUBLE)
              / CAST(d0.d0 AS DOUBLE), 9) END) AS r5
          FROM nums CROSS JOIN d0),
        l1 AS (SELECT *, r1 AS p11 FROM rs),
        l2 AS (
          SELECT *, ROUND((r2 - p11 * r1)
                   / (CAST(1 AS DOUBLE) - p11 * r1), 9) AS p22
          FROM l1),
        l2b AS (SELECT *, ROUND(p11 - p22 * p11, 9) AS p21 FROM l2),
        l3 AS (
          SELECT *, ROUND((r3 - (p21 * r2 + p22 * r1))
                   / (CAST(1 AS DOUBLE) - (p21 * r1 + p22 * r2)), 9) AS p33
          FROM l2b),
        l3b AS (
          SELECT *, ROUND(p21 - p33 * p22, 9) AS p31,
                 ROUND(p22 - p33 * p21, 9) AS p32
          FROM l3),
        l4 AS (
          SELECT *, ROUND((r4 - (p31 * r3 + p32 * r2 + p33 * r1))
                   / (CAST(1 AS DOUBLE)
                      - (p31 * r1 + p32 * r2 + p33 * r3)), 9) AS p44
          FROM l3b),
        l4b AS (
          SELECT *, ROUND(p31 - p44 * p33, 9) AS p41,
                 ROUND(p32 - p44 * p32, 9) AS p42,
                 ROUND(p33 - p44 * p31, 9) AS p43
          FROM l4),
        l5 AS (
          SELECT *, ROUND((r5 - (p41 * r4 + p42 * r3 + p43 * r2 + p44 * r1))
                   / (CAST(1 AS DOUBLE)
                      - (p41 * r1 + p42 * r2 + p43 * r3 + p44 * r4)), 9)
                   AS p55
          FROM l4b)
        SELECT n,
               ROUND(p11, 6) + CAST(0 AS DOUBLE) AS pacf1,
               ROUND(p22, 6) + CAST(0 AS DOUBLE) AS pacf2,
               ROUND(p33, 6) + CAST(0 AS DOUBLE) AS pacf3,
               ROUND(p44, 6) + CAST(0 AS DOUBLE) AS pacf4,
               ROUND(p55, 6) + CAST(0 AS DOUBLE) AS pacf5
        FROM l5""")),

    // Hodges-Lehmann estimator of the paired region revenue shift: the
    // exact median of all Walsh averages (dᵢ+dⱼ)/2 over the bounded
    // month panel — the robust location estimate dual to qch's
    // signed-rank test (HL is what the test actually localizes). Walsh
    // SUMS stay exact DECIMALS; the median halves at the very end in
    // doubles.
    "qck_hodges_lehmann" -> Q(
      fn = (s, dir) => {
        val rev = t(s, dir, "orders")
          .join(t(s, dir, "customer"), col("o_custkey") === col("c_custkey"))
          .join(t(s, dir, "nation"), col("c_nationkey") === col("n_nationkey"))
          .filter(col("n_regionkey") <= 1)
          .groupBy(col("n_regionkey").as("rg"),
            expr("unix_millis(CAST(o_orderdate AS TIMESTAMP))" +
              " div 86400000 div 30").as("mo"))
          .agg((sum(col("o_totalprice").cast("decimal(18,2)")) /
            lit(1000000)).cast("decimal(14,8)").as("v"))
        val d = rev.filter(col("rg") === 0).select(col("mo"), col("v").as("x"))
          .join(rev.filter(col("rg") === 1)
            .select(col("mo"), col("v").as("yv")), Seq("mo"))
          .select(col("mo"), (col("yv") - col("x")).as("d"))
          .localCheckpoint(eager = false)
        val walsh = d.select(col("mo").as("ma"), col("d").as("da"))
          .join(d.select(col("mo").as("mb"), col("d").as("db")),
            col("ma") <= col("mb"))
          .select((col("da") + col("db")).as("s2"), col("ma"), col("mb"))
        val ranked = walsh
          .withColumn("rw", row_number().over(
            Window.orderBy(col("s2"), col("ma"), col("mb"))))
        val cnt = walsh.agg(count(lit(1)).as("nw"))
        val med = ranked.crossJoin(broadcast(cnt))
          .filter(col("rw") === ((col("nw") + 1) / lit(2)).cast("long") ||
            col("rw") === (col("nw") / lit(2) + 1).cast("long"))
          .agg(sum(col("s2")).as("ssel"), count(lit(1)).as("npick"),
            first(col("nw")).as("nw"))
        val mean = d.agg(count(lit(1)).as("nm"), sum(col("d")).as("sd"))
        med.crossJoin(broadcast(mean))
          .select(col("nm").as("n_months"), col("nw").as("n_walsh"),
            round(col("ssel").cast("double") /
              (lit(2.0) * col("npick").cast("double")), 6)
              .as("hodges_lehmann"),
            round(col("sd").cast("double") / col("nm").cast("double"), 6)
              .as("mean_diff"))
      },
      oracle = Some("""
        WITH rev AS (
          SELECT n_regionkey AS rg,
                 CAST(epoch_ms(o_orderdate) // 86400000 // 30 AS BIGINT)
                   AS mo,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) / 1000000
                   AS DECIMAL(14,8)) AS v
          FROM orders JOIN customer ON o_custkey = c_custkey
          JOIN nation ON c_nationkey = n_nationkey
          WHERE n_regionkey <= 1
          GROUP BY 1, 2),
        d AS MATERIALIZED (
          SELECT a.mo, b.v - a.v AS d
          FROM rev a JOIN rev b ON a.mo = b.mo AND a.rg = 0 AND b.rg = 1),
        walsh AS MATERIALIZED (
          SELECT a.d + b.d AS s2, a.mo AS ma, b.mo AS mb
          FROM d a JOIN d b ON a.mo <= b.mo),
        ranked AS (
          SELECT s2, CAST(ROW_NUMBER() OVER (ORDER BY s2, ma, mb)
                   AS BIGINT) AS rw
          FROM walsh),
        cnt AS (SELECT CAST(COUNT(*) AS BIGINT) AS nw FROM walsh),
        med AS (
          SELECT SUM(s2) AS ssel, CAST(COUNT(*) AS BIGINT) AS npick,
                 MAX(cnt.nw) AS nw
          FROM ranked CROSS JOIN cnt
          WHERE rw = (cnt.nw + 1) // 2 OR rw = cnt.nw // 2 + 1),
        mn AS (SELECT CAST(COUNT(*) AS BIGINT) AS nm, SUM(d) AS sd FROM d)
        SELECT mn.nm AS n_months, med.nw AS n_walsh,
               ROUND(CAST(med.ssel AS DOUBLE)
                 / (CAST(2 AS DOUBLE) * CAST(med.npick AS DOUBLE)), 6)
                 + CAST(0 AS DOUBLE) AS hodges_lehmann,
               ROUND(CAST(mn.sd AS DOUBLE) / CAST(mn.nm AS DOUBLE), 6)
                 + CAST(0 AS DOUBLE) AS mean_diff
        FROM med CROSS JOIN mn""")),

    // Moran's I spatial autocorrelation of ln customer spend over the
    // qbj geo panel with binary 400 km contiguity weights (the same
    // cell-bucketed radius join — never all-pairs on the Spark side;
    // the naive oracle doubles as the candidate-loss proof): I, its
    // randomization expectation −1/(n−1), and the normal-approximation
    // z from the closed-form S₀/S₁/S₂ variance. The spatial family's
    // missing inferential piece next to qa5/qa6/qbj.
    "qcl_morans_i" -> Q(
      fn = (s, dir) => {
        val spend = t(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("sp"))
        val pts = t(s, dir, "customer")
          .filter(col("c_custkey") <= 1500)
          .join(spend, col("c_custkey") === col("o_custkey"))
          .select(col("c_custkey").as("pid"),
            hashCoord(col("c_custkey"), "lat", 180000L, 90.0).as("lat"),
            hashCoord(col("c_custkey"), "lon", 360000L, 180.0).as("lon"),
            round(log(col("sp").cast("double")), 9).as("a"))
          .filter(abs(col("lat")) <= lit(70.0))
          .localCheckpoint(eager = false)
        val mu = pts.agg(count(lit(1)).as("n"),
            sum(col("a").cast("decimal(28,9)")).as("sa"))
          .select(col("n"),
            round(col("sa").cast("double") / col("n").cast("double"), 9)
              .as("mu"))
        val aa = pts.select(col("pid").as("a_id"), col("lat").as("a_lat"),
          col("lon").as("a_lon"), col("a").as("va"))
        val bb = pts.select(col("pid").as("b_id"), col("lat").as("b_lat"),
          col("lon").as("b_lon"), col("a").as("vb"))
        val pairs = Geo.radiusJoinCells(aa, "a_lat", "a_lon",
            bb, "b_lat", "b_lon", 400.0, 5.0, 1, 3)
          .filter(col("a_id") < col("b_id"))
          .select(col("a_id"), col("b_id"), col("va"), col("vb"))
          .localCheckpoint(eager = false)
        val num = pairs.crossJoin(broadcast(mu))
          .agg(count(lit(1)).as("p"),
            sum(round((col("va") - col("mu")) * (col("vb") - col("mu")), 12)
              .cast("decimal(28,12)")).as("cross"))
        val den = pts.crossJoin(broadcast(mu))
          .agg(sum(round((col("a") - col("mu")) * (col("a") - col("mu")), 12)
            .cast("decimal(28,12)")).as("ss"))
        val degs = pairs.select(col("a_id").as("id"))
          .union(pairs.select(col("b_id")))
          .groupBy("id").agg(count(lit(1)).as("dg"))
          .agg(coalesce(sum(col("dg") * col("dg")), lit(0L)).as("sdeg2"))
        num.crossJoin(broadcast(den)).crossJoin(broadcast(degs))
          .crossJoin(broadcast(mu.select(col("n"))))
          .withColumn("nd", col("n").cast("double"))
          .withColumn("s0", lit(2.0) * col("p").cast("double"))
          .withColumn("s1", lit(4.0) * col("p").cast("double"))
          .withColumn("s2v", lit(4.0) * col("sdeg2").cast("double"))
          .withColumn("i", round(
            (col("nd") / col("s0")) *
            (lit(2.0) * col("cross").cast("double") /
              col("ss").cast("double")), 9))
          .withColumn("ei", -lit(1.0) / (col("nd") - lit(1.0)))
          .withColumn("vi",
            (col("nd") * col("nd") * col("s1") - col("nd") * col("s2v") +
              lit(3.0) * col("s0") * col("s0")) /
            ((col("nd") * col("nd") - lit(1.0)) * col("s0") * col("s0")) -
            col("ei") * col("ei"))
          .select(col("n").as("n_points"), col("p").as("n_edges"),
            round(col("i"), 6).as("morans_i"),
            round(col("ei"), 6).as("expected_i"),
            round((col("i") - col("ei")) / sqrt(col("vi")), 6).as("z"))
      },
      oracle = Some(s"""
        WITH spend AS (
          SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS sp
          FROM orders GROUP BY 1),
        pts AS MATERIALIZED (
          SELECT * FROM (
            SELECT c_custkey AS id,
                   ${coordSql("c_custkey", "lat", 180000L, 90)} AS lat,
                   ${coordSql("c_custkey", "lon", 360000L, 180)} AS lon,
                   ROUND(ln(CAST(sp AS DOUBLE)), 9) AS a
            FROM customer JOIN spend ON c_custkey = o_custkey
            WHERE c_custkey <= 1500)
          WHERE ABS(lat) <= CAST(70 AS DOUBLE)),
        mu AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 ROUND(CAST(SUM(CAST(a AS DECIMAL(28,9))) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE), 9) AS mu
          FROM pts),
        pairs AS MATERIALIZED (
          SELECT a.id AS a_id, b.id AS b_id, a.a AS va, b.a AS vb
          FROM pts a JOIN pts b ON a.id < b.id
          WHERE ROUND(CAST(12742 AS DOUBLE) * ASIN(SQRT(
                  SIN(RADIANS(b.lat - a.lat) / CAST(2 AS DOUBLE))
                    * SIN(RADIANS(b.lat - a.lat) / CAST(2 AS DOUBLE))
                  + COS(RADIANS(a.lat)) * COS(RADIANS(b.lat))
                    * SIN(RADIANS(b.lon - a.lon) / CAST(2 AS DOUBLE))
                    * SIN(RADIANS(b.lon - a.lon) / CAST(2 AS DOUBLE)))), 6)
                <= CAST(400 AS DOUBLE)),
        num AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS p,
                 SUM(CAST(ROUND((va - mu.mu) * (vb - mu.mu), 12)
                   AS DECIMAL(28,12))) AS crs
          FROM pairs CROSS JOIN mu),
        den AS (
          SELECT SUM(CAST(ROUND((a - mu.mu) * (a - mu.mu), 12)
                   AS DECIMAL(28,12))) AS ss
          FROM pts CROSS JOIN mu),
        degs AS (
          SELECT CAST(COALESCE(SUM(dg * dg), 0) AS BIGINT) AS sdeg2
          FROM (SELECT id, CAST(COUNT(*) AS BIGINT) AS dg
                FROM (SELECT a_id AS id FROM pairs
                      UNION ALL SELECT b_id FROM pairs)
                GROUP BY 1)),
        f AS (
          SELECT mu.n, num.p, CAST(mu.n AS DOUBLE) AS nd,
                 CAST(2 AS DOUBLE) * CAST(num.p AS DOUBLE) AS s0,
                 CAST(4 AS DOUBLE) * CAST(num.p AS DOUBLE) AS s1,
                 CAST(4 AS DOUBLE) * CAST(degs.sdeg2 AS DOUBLE) AS s2v,
                 CAST(num.crs AS DOUBLE) AS crsd,
                 CAST(den.ss AS DOUBLE) AS ssd
          FROM num CROSS JOIN den CROSS JOIN degs CROSS JOIN mu),
        f2 AS (
          SELECT *, ROUND((nd / s0) * (CAST(2 AS DOUBLE) * crsd / ssd), 9)
                   AS i,
                 -CAST(1 AS DOUBLE) / (nd - CAST(1 AS DOUBLE)) AS ei
          FROM f),
        f3 AS (
          SELECT *, (nd * nd * s1 - nd * s2v
                   + CAST(3 AS DOUBLE) * s0 * s0)
                   / ((nd * nd - CAST(1 AS DOUBLE)) * s0 * s0)
                   - ei * ei AS vi
          FROM f2)
        SELECT n AS n_points, p AS n_edges,
               ROUND(i, 6) + CAST(0 AS DOUBLE) AS morans_i,
               ROUND(ei, 6) AS expected_i,
               ROUND((i - ei) / SQRT(vi), 6) + CAST(0 AS DOUBLE) AS z
        FROM f3"""),
      // bench headline: the spatial family's cell-bucketed radius join is
      // the one join shape with no other bench presence (VERDICT r7 §8)
      headline = true),

    // Geary's C over the same contiguity graph: the squared-DIFFERENCE
    // complement of qcl's cross-product Moran (C is sensitive to local
    // gradients where I measures global clustering; E[C] = 1, C < 1 =
    // positive autocorrelation). Differences of exact 9-grid values
    // square on the 12-grid; one pair pass + one point pass.
    "qcm_gearys_c" -> Q(
      fn = (s, dir) => {
        val spend = t(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("sp"))
        val pts = t(s, dir, "customer")
          .filter(col("c_custkey") <= 1500)
          .join(spend, col("c_custkey") === col("o_custkey"))
          .select(col("c_custkey").as("pid"),
            hashCoord(col("c_custkey"), "lat", 180000L, 90.0).as("lat"),
            hashCoord(col("c_custkey"), "lon", 360000L, 180.0).as("lon"),
            round(log(col("sp").cast("double")), 9).as("a"))
          .filter(abs(col("lat")) <= lit(70.0))
          .localCheckpoint(eager = false)
        val mu = pts.agg(count(lit(1)).as("n"),
            sum(col("a").cast("decimal(28,9)")).as("sa"))
          .select(col("n"),
            round(col("sa").cast("double") / col("n").cast("double"), 9)
              .as("mu"))
        val aa = pts.select(col("pid").as("a_id"), col("lat").as("a_lat"),
          col("lon").as("a_lon"), col("a").as("va"))
        val bb = pts.select(col("pid").as("b_id"), col("lat").as("b_lat"),
          col("lon").as("b_lon"), col("a").as("vb"))
        val pairs = Geo.radiusJoinCells(aa, "a_lat", "a_lon",
            bb, "b_lat", "b_lon", 400.0, 5.0, 1, 3)
          .filter(col("a_id") < col("b_id"))
          .agg(count(lit(1)).as("p"),
            sum(round((col("va") - col("vb")) * (col("va") - col("vb")), 12)
              .cast("decimal(28,12)")).as("sqd"))
        val den = pts.crossJoin(broadcast(mu))
          .agg(first(col("n")).as("n"),
            sum(round((col("a") - col("mu")) * (col("a") - col("mu")), 12)
              .cast("decimal(28,12)")).as("ss"))
        pairs.crossJoin(broadcast(den))
          .withColumn("nd", col("n").cast("double"))
          .withColumn("s0", lit(2.0) * col("p").cast("double"))
          .withColumn("c", round(
            ((col("nd") - lit(1.0)) / (lit(2.0) * col("s0"))) *
            (lit(2.0) * col("sqd").cast("double") /
              col("ss").cast("double")), 9))
          .select(col("n").as("n_points"), col("p").as("n_edges"),
            round(col("c"), 6).as("gearys_c"),
            round(col("c") - lit(1.0), 6).as("c_minus_1"))
      },
      oracle = Some(s"""
        WITH spend AS (
          SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS sp
          FROM orders GROUP BY 1),
        pts AS MATERIALIZED (
          SELECT * FROM (
            SELECT c_custkey AS id,
                   ${coordSql("c_custkey", "lat", 180000L, 90)} AS lat,
                   ${coordSql("c_custkey", "lon", 360000L, 180)} AS lon,
                   ROUND(ln(CAST(sp AS DOUBLE)), 9) AS a
            FROM customer JOIN spend ON c_custkey = o_custkey
            WHERE c_custkey <= 1500)
          WHERE ABS(lat) <= CAST(70 AS DOUBLE)),
        mu AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 ROUND(CAST(SUM(CAST(a AS DECIMAL(28,9))) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE), 9) AS mu
          FROM pts),
        pairs AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS p,
                 SUM(CAST(ROUND((a.a - b.a) * (a.a - b.a), 12)
                   AS DECIMAL(28,12))) AS sqd
          FROM pts a JOIN pts b ON a.id < b.id
          WHERE ROUND(CAST(12742 AS DOUBLE) * ASIN(SQRT(
                  SIN(RADIANS(b.lat - a.lat) / CAST(2 AS DOUBLE))
                    * SIN(RADIANS(b.lat - a.lat) / CAST(2 AS DOUBLE))
                  + COS(RADIANS(a.lat)) * COS(RADIANS(b.lat))
                    * SIN(RADIANS(b.lon - a.lon) / CAST(2 AS DOUBLE))
                    * SIN(RADIANS(b.lon - a.lon) / CAST(2 AS DOUBLE)))), 6)
                <= CAST(400 AS DOUBLE)),
        den AS (
          SELECT MAX(mu.n) AS n,
                 SUM(CAST(ROUND((a - mu.mu) * (a - mu.mu), 12)
                   AS DECIMAL(28,12))) AS ss
          FROM pts CROSS JOIN mu),
        f AS (
          SELECT den.n, pairs.p, CAST(den.n AS DOUBLE) AS nd,
                 CAST(2 AS DOUBLE) * CAST(pairs.p AS DOUBLE) AS s0,
                 CAST(pairs.sqd AS DOUBLE) AS sqdd,
                 CAST(den.ss AS DOUBLE) AS ssd
          FROM pairs CROSS JOIN den),
        f2 AS (
          SELECT *, ROUND(((nd - CAST(1 AS DOUBLE))
                   / (CAST(2 AS DOUBLE) * s0))
                   * (CAST(2 AS DOUBLE) * sqdd / ssd), 9) AS c
          FROM f)
        SELECT n AS n_points, p AS n_edges,
               ROUND(c, 6) AS gearys_c,
               ROUND(c - CAST(1 AS DOUBLE), 6) + CAST(0 AS DOUBLE)
                 AS c_minus_1
        FROM f2""")),

    // Getis-Ord General G of raw customer spend on the same graph:
    // G = Σ_w x_i x_j / Σ_{i≠j} x_i x_j — high-value CLUSTERING
    // specifically (Moran can't tell hot spots from cold spots; G > E[G]
    // = S0/(n(n−1)) means high values neighbor high values). The
    // denominator needs no pair join at all: Σ_{i≠j} x_i x_j =
    // (Σx)² − Σx², exact algebra over spends in millions.
    "qcn_getis_ord_g" -> Q(
      fn = (s, dir) => {
        val spend = t(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg((sum(col("o_totalprice").cast("decimal(18,2)")) /
            lit(1000000)).cast("decimal(14,8)").as("sp"))
        val pts = t(s, dir, "customer")
          .filter(col("c_custkey") <= 1500)
          .join(spend, col("c_custkey") === col("o_custkey"))
          .select(col("c_custkey").as("pid"),
            hashCoord(col("c_custkey"), "lat", 180000L, 90.0).as("lat"),
            hashCoord(col("c_custkey"), "lon", 360000L, 180.0).as("lon"),
            col("sp"))
          .filter(abs(col("lat")) <= lit(70.0))
          .localCheckpoint(eager = false)
        val aa = pts.select(col("pid").as("a_id"), col("lat").as("a_lat"),
          col("lon").as("a_lon"), col("sp").as("xa"))
        val bb = pts.select(col("pid").as("b_id"), col("lat").as("b_lat"),
          col("lon").as("b_lon"), col("sp").as("xb"))
        val num = Geo.radiusJoinCells(aa, "a_lat", "a_lon",
            bb, "b_lat", "b_lon", 400.0, 5.0, 1, 3)
          .filter(col("a_id") < col("b_id"))
          .agg(count(lit(1)).as("p"),
            sum(round(col("xa") * col("xb"), 6).cast("decimal(28,6)"))
              .as("wxx"))
        val tot = pts.agg(count(lit(1)).as("n"), sum(col("sp")).as("sx"),
          sum(round(col("sp") * col("sp"), 6).cast("decimal(28,6)"))
            .as("sxx"))
        num.crossJoin(broadcast(tot))
          .withColumn("nd", col("n").cast("double"))
          .withColumn("allxx",
            col("sx").cast("double") * col("sx").cast("double") -
            col("sxx").cast("double"))
          .withColumn("g", round(
            lit(2.0) * col("wxx").cast("double") / col("allxx"), 9))
          .withColumn("eg",
            lit(2.0) * col("p").cast("double") /
            (col("nd") * (col("nd") - lit(1.0))))
          .select(col("n").as("n_points"), col("p").as("n_edges"),
            round(col("g"), 6).as("general_g"),
            round(col("eg"), 6).as("expected_g"),
            round(col("g") / col("eg"), 6).as("g_ratio"))
      },
      oracle = Some(s"""
        WITH spend AS (
          SELECT o_custkey,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) / 1000000
                   AS DECIMAL(14,8)) AS sp
          FROM orders GROUP BY 1),
        pts AS MATERIALIZED (
          SELECT * FROM (
            SELECT c_custkey AS id,
                   ${coordSql("c_custkey", "lat", 180000L, 90)} AS lat,
                   ${coordSql("c_custkey", "lon", 360000L, 180)} AS lon,
                   sp
            FROM customer JOIN spend ON c_custkey = o_custkey
            WHERE c_custkey <= 1500)
          WHERE ABS(lat) <= CAST(70 AS DOUBLE)),
        num AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS p,
                 SUM(CAST(ROUND(CAST(a.sp AS DECIMAL(19,8))
                   * CAST(b.sp AS DECIMAL(19,8)), 6) AS DECIMAL(28,6)))
                   AS wxx
          FROM pts a JOIN pts b ON a.id < b.id
          WHERE ROUND(CAST(12742 AS DOUBLE) * ASIN(SQRT(
                  SIN(RADIANS(b.lat - a.lat) / CAST(2 AS DOUBLE))
                    * SIN(RADIANS(b.lat - a.lat) / CAST(2 AS DOUBLE))
                  + COS(RADIANS(a.lat)) * COS(RADIANS(b.lat))
                    * SIN(RADIANS(b.lon - a.lon) / CAST(2 AS DOUBLE))
                    * SIN(RADIANS(b.lon - a.lon) / CAST(2 AS DOUBLE)))), 6)
                <= CAST(400 AS DOUBLE)),
        tot AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n, SUM(sp) AS sx,
                 SUM(CAST(ROUND(CAST(sp AS DECIMAL(19,8))
                   * CAST(sp AS DECIMAL(19,8)), 6) AS DECIMAL(28,6)))
                   AS sxx
          FROM pts),
        f AS (
          SELECT tot.n, num.p, CAST(tot.n AS DOUBLE) AS nd,
                 CAST(tot.sx AS DOUBLE) * CAST(tot.sx AS DOUBLE)
                   - CAST(tot.sxx AS DOUBLE) AS allxx,
                 CAST(num.wxx AS DOUBLE) AS wxxd
          FROM num CROSS JOIN tot),
        f2 AS (
          SELECT *, ROUND(CAST(2 AS DOUBLE) * wxxd / allxx, 9) AS g,
                 CAST(2 AS DOUBLE) * CAST(p AS DOUBLE)
                   / (nd * (nd - CAST(1 AS DOUBLE))) AS eg
          FROM f)
        SELECT n AS n_points, p AS n_edges,
               ROUND(g, 6) AS general_g,
               ROUND(eg, 6) AS expected_g,
               ROUND(g / eg, 6) AS g_ratio
        FROM f2""")),

    // Local Getis-Ord G*ᵢ hot spots: per-point star sums (self + 400 km
    // neighbors) standardized by the closed-form permutation moments —
    // z_i = (S_i − W_i·x̄) / (s·√((n·W_i − W_i²)/(n−1))) — top 20 by z
    // with total tiebreak, flagged at 2.58. The LOCAL indicator qcn's
    // single global G cannot give: WHERE the high-spend clusters are.
    "qco_local_gstar_hotspots" -> Q(
      fn = (s, dir) => {
        val spend = t(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg((sum(col("o_totalprice").cast("decimal(18,2)")) /
            lit(1000000)).cast("decimal(14,8)").as("sp"))
        val pts = t(s, dir, "customer")
          .filter(col("c_custkey") <= 1500)
          .join(spend, col("c_custkey") === col("o_custkey"))
          .select(col("c_custkey").as("pid"),
            hashCoord(col("c_custkey"), "lat", 180000L, 90.0).as("lat"),
            hashCoord(col("c_custkey"), "lon", 360000L, 180.0).as("lon"),
            col("sp"))
          .filter(abs(col("lat")) <= lit(70.0))
          .localCheckpoint(eager = false)
        val aa = pts.select(col("pid").as("a_id"), col("lat").as("a_lat"),
          col("lon").as("a_lon"), col("sp").as("xa"))
        val bb = pts.select(col("pid").as("b_id"), col("lat").as("b_lat"),
          col("lon").as("b_lon"), col("sp").as("xb"))
        val pairs = Geo.radiusJoinCells(aa, "a_lat", "a_lon",
            bb, "b_lat", "b_lon", 400.0, 5.0, 1, 3)
          .filter(col("a_id") < col("b_id"))
          .select(col("a_id"), col("b_id"), col("xa"), col("xb"))
          .localCheckpoint(eager = false)
        val nbr = pairs.select(col("a_id").as("pid"), col("xb").as("xn"))
          .union(pairs.select(col("b_id").as("pid"), col("xa").as("xn")))
          .groupBy("pid")
          .agg(count(lit(1)).as("k"), sum(col("xn")).as("nsum"))
        val mom = pts.agg(count(lit(1)).as("n"), sum(col("sp")).as("sx"),
            sum(round(col("sp") * col("sp"), 6).cast("decimal(28,6)"))
              .as("sxx"))
          .withColumn("nd", col("n").cast("double"))
          .withColumn("xbar", round(col("sx").cast("double") / col("nd"), 9))
          .withColumn("sdev", round(sqrt(
            (col("sxx").cast("double") -
              col("nd") * col("xbar") * col("xbar")) /
            (col("nd") - lit(1.0))), 9))
          .select(col("n"), col("nd"), col("xbar"), col("sdev"))
        pts.join(nbr, Seq("pid"), "left")
          .crossJoin(broadcast(mom))
          .withColumn("wi", (coalesce(col("k"), lit(0L)) + 1).cast("double"))
          .withColumn("si",
            (coalesce(col("nsum"), lit(0).cast("decimal(24,8)")) +
              col("sp")).cast("double"))
          .withColumn("z", round(
            (col("si") - col("wi") * col("xbar")) /
            (col("sdev") * sqrt(
              (col("nd") * col("wi") - col("wi") * col("wi")) /
              (col("nd") - lit(1.0)))), 9))
          .orderBy(col("z").desc, col("pid"))
          .limit(20)
          .select(col("pid"), coalesce(col("k"), lit(0L)).as("n_neighbors"),
            round(col("si"), 6).as("star_sum"),
            round(col("z"), 6).as("gstar_z"),
            when(col("z") > lit(2.58), 1).otherwise(0).as("hot"))
      },
      oracle = Some(s"""
        WITH spend AS (
          SELECT o_custkey,
                 CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) / 1000000
                   AS DECIMAL(14,8)) AS sp
          FROM orders GROUP BY 1),
        pts AS MATERIALIZED (
          SELECT * FROM (
            SELECT c_custkey AS id,
                   ${coordSql("c_custkey", "lat", 180000L, 90)} AS lat,
                   ${coordSql("c_custkey", "lon", 360000L, 180)} AS lon,
                   sp
            FROM customer JOIN spend ON c_custkey = o_custkey
            WHERE c_custkey <= 1500)
          WHERE ABS(lat) <= CAST(70 AS DOUBLE)),
        pairs AS MATERIALIZED (
          SELECT a.id AS a_id, b.id AS b_id, a.sp AS xa, b.sp AS xb
          FROM pts a JOIN pts b ON a.id < b.id
          WHERE ROUND(CAST(12742 AS DOUBLE) * ASIN(SQRT(
                  SIN(RADIANS(b.lat - a.lat) / CAST(2 AS DOUBLE))
                    * SIN(RADIANS(b.lat - a.lat) / CAST(2 AS DOUBLE))
                  + COS(RADIANS(a.lat)) * COS(RADIANS(b.lat))
                    * SIN(RADIANS(b.lon - a.lon) / CAST(2 AS DOUBLE))
                    * SIN(RADIANS(b.lon - a.lon) / CAST(2 AS DOUBLE)))), 6)
                <= CAST(400 AS DOUBLE)),
        nbr AS (
          SELECT pid, CAST(COUNT(*) AS BIGINT) AS k, SUM(xn) AS nsum
          FROM (SELECT a_id AS pid, xb AS xn FROM pairs
                UNION ALL SELECT b_id, xa FROM pairs)
          GROUP BY 1),
        mom AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(COUNT(*) AS DOUBLE) AS nd,
                 ROUND(CAST(SUM(sp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE),
                   9) AS xbar,
                 SUM(CAST(ROUND(CAST(sp AS DECIMAL(19,8))
                   * CAST(sp AS DECIMAL(19,8)), 6) AS DECIMAL(28,6)))
                   AS sxx
          FROM pts),
        m2 AS (
          SELECT n, nd, xbar,
                 ROUND(SQRT((CAST(sxx AS DOUBLE) - nd * xbar * xbar)
                   / (nd - CAST(1 AS DOUBLE))), 9) AS sdev
          FROM mom),
        zt AS (
          SELECT pts.id,
                 COALESCE(nbr.k, 0) AS k,
                 CAST(COALESCE(nbr.k, 0) + 1 AS DOUBLE) AS wi,
                 CAST(COALESCE(nbr.nsum, CAST(0 AS DECIMAL(24,8))) + pts.sp
                   AS DOUBLE) AS si,
                 m2.nd, m2.xbar, m2.sdev
          FROM pts LEFT JOIN nbr ON pts.id = nbr.pid CROSS JOIN m2),
        z2 AS (
          SELECT id, k, si,
                 ROUND((si - wi * xbar)
                   / (sdev * SQRT((nd * wi - wi * wi)
                       / (nd - CAST(1 AS DOUBLE)))), 9) AS z
          FROM zt)
        SELECT id AS pid, CAST(k AS BIGINT) AS n_neighbors,
               ROUND(si, 6) AS star_sum,
               ROUND(z, 6) + CAST(0 AS DOUBLE) AS gstar_z,
               CASE WHEN z > CAST(2.58 AS DOUBLE) THEN 1 ELSE 0 END AS hot
        FROM z2 ORDER BY z DESC, pid LIMIT 20""")),

    // Classical seasonal decomposition (STL-lite) of the daily revenue
    // series: centered MA-7 trend over the bounded day series (exact
    // DECIMAL window sums, full windows only), centered day-of-week
    // seasonal indices, and the decomposition R² = 1 − var(remainder)/
    // var(y). Big squared-sum casts ride the VARCHAR bridge (rule 13).
    "qaw_seasonal_decomposition" -> Q(
      fn = (s, dir) => {
        val daily = t(s, dir, "orders")
          .groupBy(expr("unix_millis(CAST(o_orderdate AS TIMESTAMP))" +
            " div 86400000").as("day"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("rev"))
        val w7 = Window.orderBy(col("day")).rowsBetween(-3, 3)
        val full = daily
          .withColumn("s7", sum(col("rev")).over(w7))
          .withColumn("c7", count(lit(1)).over(w7))
          .filter(col("c7") === 7)
          .withColumn("y", col("rev").cast("double"))
          .withColumn("trend", round(col("s7").cast("double") / lit(7.0), 9))
          .withColumn("det", col("y") - col("trend"))
          .withColumn("dow", pmod(col("day"), lit(7L)))
          .localCheckpoint(eager = false)
        val sRaw = full.groupBy(col("dow"))
          .agg(round(sum(col("det").cast("decimal(28,12)")).cast("double") /
            count(lit(1)).cast("double"), 9).as("s_raw"))
        val sMean = sRaw.agg(
          round(sum(col("s_raw").cast("decimal(28,12)")).cast("double") /
            lit(7.0), 9).as("sm"))
        val seasonal = sRaw.crossJoin(broadcast(sMean))
          .withColumn("seasonal", round(col("s_raw") - col("sm"), 9))
          .select(col("dow"), col("seasonal"))
        val withS = full.join(broadcast(seasonal), Seq("dow"))
          .withColumn("rem", col("det") - col("seasonal"))
        val ms = withS.agg(
          count(lit(1)).as("n"),
          sum(col("rev")).as("sy"),
          sum(col("rev") * col("rev")).as("syy"),
          sum(round(col("rem"), 4).cast("decimal(19,4)")).as("sr"),
          sum(round(col("rem"), 4).cast("decimal(19,4)") *
            round(col("rem"), 4).cast("decimal(19,4)")).as("srr"))
        val nD = col("n").cast("double")
        val r2row = ms.select(col("n"),
          (col("syy").cast("double") / nD -
            (col("sy").cast("double") / nD) * (col("sy").cast("double") / nD))
            .as("var_y"),
          (col("srr").cast("double") / nD -
            (col("sr").cast("double") / nD) * (col("sr").cast("double") / nD))
            .as("var_r"))
          .select(col("n").as("n_days"),
            round(lit(1.0) - col("var_r") / col("var_y"), 6).as("r2"))
        seasonal.crossJoin(broadcast(r2row))
          .select(col("dow"), round(col("seasonal"), 2).as("seasonal_index"),
            col("n_days"), col("r2"))
          .orderBy(col("dow"))
      },
      oracle = Some("""
        WITH daily AS (
          SELECT CAST(epoch_ms(o_orderdate) // 86400000 AS BIGINT) AS day,
                 SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS rev
          FROM orders GROUP BY 1),
        full7 AS (
          SELECT * FROM (
            SELECT day, rev,
                   SUM(rev) OVER (ORDER BY day
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS s7,
                   COUNT(*) OVER (ORDER BY day
                     ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS c7
            FROM daily)
          WHERE c7 = 7),
        f AS (
          SELECT day, rev, CAST(rev AS DOUBLE) AS y,
                 ROUND(CAST(s7 AS DOUBLE) / CAST(7 AS DOUBLE), 9) AS trend,
                 CAST(rev AS DOUBLE)
                   - ROUND(CAST(s7 AS DOUBLE) / CAST(7 AS DOUBLE), 9) AS det,
                 day % 7 AS dow
          FROM full7),
        sraw AS (
          SELECT dow,
                 ROUND(CAST(SUM(CAST(det AS DECIMAL(28,12))) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE), 9) AS s_raw
          FROM f GROUP BY 1),
        sm AS (
          SELECT ROUND(CAST(SUM(CAST(s_raw AS DECIMAL(28,12))) AS DOUBLE)
                   / CAST(7 AS DOUBLE), 9) AS sm
          FROM sraw),
        seas AS (
          SELECT dow, ROUND(s_raw - sm, 9) AS seasonal
          FROM sraw CROSS JOIN sm),
        withs AS (
          SELECT f.*, seas.seasonal, f.det - seas.seasonal AS rem
          FROM f JOIN seas ON seas.dow = f.dow),
        ms AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 SUM(rev) AS sy, SUM(rev * rev) AS syy,
                 SUM(CAST(ROUND(rem, 4) AS DECIMAL(19,4))) AS sr,
                 SUM(CAST(ROUND(rem, 4) AS DECIMAL(19,4))
                   * CAST(ROUND(rem, 4) AS DECIMAL(19,4))) AS srr
          FROM withs),
        r2 AS (
          SELECT n AS n_days,
                 ROUND(CAST(1 AS DOUBLE) -
                   (CAST(CAST(srr AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)
                     - (CAST(sr AS DOUBLE) / CAST(n AS DOUBLE))
                       * (CAST(sr AS DOUBLE) / CAST(n AS DOUBLE)))
                   / (CAST(CAST(syy AS VARCHAR) AS DOUBLE) / CAST(n AS DOUBLE)
                     - (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))
                       * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE))), 6) AS r2
          FROM ms)
        SELECT seas.dow, ROUND(seas.seasonal, 2) AS seasonal_index,
               r2.n_days, r2.r2
        FROM seas CROSS JOIN r2
        ORDER BY seas.dow""")),

    // Ripley's K point-pattern statistic over the geo panel — the spatial
    // family's MISSING half: qcl/qcm/qcn test autocorrelation of VALUES at
    // points; K(r) tests clustering of the POINT LOCATIONS themselves
    // (K̂(r) = A·2·P(r)/(n(n−1)) vs πr² under CSR, L(r)−r > 0 =
    // clustered). ONE cell-bucketed radius join at the largest radius
    // (never all-pairs on the Spark side), conditional counts per radius,
    // area of the |lat|≤70 band inlined as a literal computed once
    // driver-side so both engines use the identical double. The naive
    // all-pairs oracle doubles as the candidate-loss proof (qa6 pattern).
    "qcq_ripleys_k" -> Q(
      fn = (s, dir) => {
        val radii = Seq(200, 400, 600)
        val areaKm2 = 4.0 * math.Pi * 6371.0 * 6371.0 *
          math.sin(math.toRadians(70.0))
        val pts = t(s, dir, "customer").filter(col("c_custkey") <= 3000)
          .select(col("c_custkey"),
            hashCoord(col("c_custkey"), "lat", 180000L, 90.0).as("lat"),
            hashCoord(col("c_custkey"), "lon", 360000L, 180.0).as("lon"))
          .filter(abs(col("lat")) <= lit(70.0))
          .localCheckpoint(eager = false)
        val a = pts.select(col("c_custkey").as("a_id"),
          col("lat").as("a_lat"), col("lon").as("a_lon"))
        val b = pts.select(col("c_custkey").as("b_id"),
          col("lat").as("b_lat"), col("lon").as("b_lon"))
        val n = pts.agg(count(lit(1)).as("n_pts"))
        val counts = Geo.radiusJoinCells(a, "a_lat", "a_lon",
            b, "b_lat", "b_lon", radii.max.toDouble, 5.0, 2, 5)
          .filter(col("a_id") < col("b_id"))
          .agg(coalesce(sum(when(col("dist_km") <= radii.head, 1L)), lit(0L))
              .as(s"p${radii.head}"),
            radii.tail.map(r => coalesce(
              sum(when(col("dist_km") <= r, 1L)), lit(0L)).as(s"p$r")): _*)
        val rows = radii.map { r =>
          val k = round(lit(areaKm2) * lit(2.0) * col(s"p$r").cast("double") /
            (col("n_pts").cast("double") * (col("n_pts").cast("double") - lit(1.0))), 6)
          struct(lit(r).as("r_km"), col("n_pts"), col(s"p$r").as("n_pairs"),
            k.as("k_hat"),
            round(sqrt(k / lit(math.Pi)) - lit(r.toDouble), 6).as("l_minus_r"))
        }
        counts.crossJoin(broadcast(n))
          .select(explode(array(rows: _*)).as("z")).select(col("z.*"))
          .orderBy(col("r_km"))
      },
      oracle = Some {
        val areaKm2 = 4.0 * math.Pi * 6371.0 * 6371.0 *
          math.sin(math.toRadians(70.0))
        val radii = Seq(200, 400, 600)
        val branches = radii.map { r =>
          val k = s"ROUND(CAST($areaKm2 AS DOUBLE) * CAST(2 AS DOUBLE) " +
            s"* CAST(p$r AS DOUBLE) / (CAST(n_pts AS DOUBLE) " +
            s"* (CAST(n_pts AS DOUBLE) - CAST(1 AS DOUBLE))), 6)"
          s"""SELECT $r AS r_km, n_pts, p$r AS n_pairs, $k AS k_hat,
               ROUND(SQRT($k / CAST(${math.Pi} AS DOUBLE))
                 - CAST($r AS DOUBLE), 6) AS l_minus_r
             FROM counts CROSS JOIN n"""
        }
        s"""
        WITH pts AS MATERIALIZED (
          SELECT * FROM (
            SELECT c_custkey AS id,
                   ${coordSql("c_custkey", "lat", 180000L, 90)} AS lat,
                   ${coordSql("c_custkey", "lon", 360000L, 180)} AS lon
            FROM customer WHERE c_custkey <= 3000)
          WHERE ABS(lat) <= CAST(70 AS DOUBLE)),
        d AS (
          SELECT ROUND(CAST(12742 AS DOUBLE) * ASIN(SQRT(
                   SIN(RADIANS(b.lat - a.lat) / CAST(2 AS DOUBLE))
                     * SIN(RADIANS(b.lat - a.lat) / CAST(2 AS DOUBLE))
                   + COS(RADIANS(a.lat)) * COS(RADIANS(b.lat))
                     * SIN(RADIANS(b.lon - a.lon) / CAST(2 AS DOUBLE))
                     * SIN(RADIANS(b.lon - a.lon) / CAST(2 AS DOUBLE)))), 6)
                   AS dist_km
          FROM pts a JOIN pts b ON a.id < b.id),
        counts AS (
          SELECT ${radii.map(r =>
            s"COALESCE(SUM(CASE WHEN dist_km <= $r THEN 1 END), 0)" +
              s"::BIGINT AS p$r").mkString(", ")}
          FROM d),
        n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pts FROM pts)
        ${branches.mkString(" UNION ALL ")}
        ORDER BY r_km"""
      }),

    // HyperANF neighborhood function: per-node HLL sketches of the h-hop
    // ball, max-merged along edges per hop — distance distributions /
    // effective diameter at sketch cost (O(n·1024) state, one edge join
    // per hop) where exact all-pairs reachability is O(n²). Graph: a
    // deterministic out-degree-2 functional graph on the order-key
    // residues mod 997 (balls grow ≈2^h — the curve is informative, not
    // saturated). Registers, per-node estimates and the DECIMAL-summed
    // totals all replay via the q4m HLL machinery, hop CTEs unrolled.
    "qct_hyperanf_reach" -> Q(
      fn = (s, dir) => {
        val sres = t(s, dir, "orders")
          .select((col("o_orderkey") % 997).cast("long").as("s")).distinct()
        val edges = sres.select(col("s").as("src"),
            ((col("s") * 31 + 7) % 997).as("dst"))
          .unionByName(sres.select(col("s").as("src"),
            ((col("s") * 17 + 3) % 997).as("dst")))
          .filter(col("src") =!= col("dst"))
        graft.operators.GraphOps.neighborhoodFunction(edges, maxHops = 3)
          .orderBy(col("h"))
      },
      oracle = Some {
        val seedLit =
          s"CAST(${java.lang.Long.toUnsignedString(graft.operators.HllSketch.Seed)} AS HUGEINT)"
        val inner = "SELECT node, " +
          OracleSql.xor64("CAST(node AS HUGEINT)", seedLit) + " AS hx FROM nodes"
        val (mixed, h) = OracleSql.mix64Nested(inner, "hx", "hh", keep = "node")
        val alpha = "(CAST(0.7213 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + " +
          "CAST(1.079 AS DOUBLE) / CAST(1024.0 AS DOUBLE))) * " +
          "CAST(1024.0 AS DOUBLE) * CAST(1024.0 AS DOUBLE)"
        def hop(prev: String, cur: String): String =
          s"""$cur AS MATERIALIZED (
            SELECT node, bucket, MAX(rho) AS rho FROM (
              SELECT node, bucket, rho FROM $prev
              UNION ALL
              SELECT e.src AS node, p.bucket, p.rho
              FROM e JOIN $prev p ON p.node = e.dst)
            GROUP BY node, bucket)"""
        def hopRow(hh: Int, regs: String): String = {
          val raw = s"$alpha * CAST(36028797018963968 AS DOUBLE) / CAST(zs AS DOUBLE)"
          s"""SELECT $hh AS h, CAST(COUNT(*) AS BIGINT) AS n_nodes,
               CAST(SUM(CAST(ROUND(est, 6) AS DECIMAL(18,6))) AS DOUBLE)
                 AS total_reach,
               ROUND(CAST(SUM(CAST(ROUND(est, 6) AS DECIMAL(18,6))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS mean_reach
             FROM (
               SELECT node, ROUND(CASE WHEN v > 0 AND $raw <= CAST(2560.0 AS DOUBLE)
                 THEN CAST(1024.0 AS DOUBLE) * ln(CAST(1024.0 AS DOUBLE) / CAST(v AS DOUBLE))
                 ELSE $raw END, 6) AS est
               FROM (
                 SELECT node, COALESCE(zn, CAST(0 AS HUGEINT))
                          + (1024 - ne) * CAST(36028797018963968 AS HUGEINT) AS zs,
                        CAST(1024 - ne AS BIGINT) AS v
                 FROM (
                   SELECT node,
                          SUM(CAST(CAST(1 AS BIGINT) << (55 - rho) AS HUGEINT)) AS zn,
                          COUNT(*) AS ne
                   FROM $regs GROUP BY node)))"""
        }
        s"""
        WITH sres AS (
          SELECT DISTINCT CAST(o_orderkey % 997 AS BIGINT) AS s FROM orders),
        e AS MATERIALIZED (
          SELECT DISTINCT src, dst FROM (
            SELECT s AS src, (s * 31 + 7) % 997 AS dst FROM sres
            UNION ALL SELECT s, (s * 17 + 3) % 997 FROM sres)
          WHERE src <> dst),
        nodes AS (
          SELECT DISTINCT node FROM (
            SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
        br AS (
          SELECT node, CAST(($h) % 1024 AS INT) AS bucket,
                 CASE WHEN (($h) // 1024) = 0 THEN 55
                      ELSE 55 - LENGTH(format('{:b}', CAST(($h) // 1024 AS BIGINT)))
                 END AS rho
          FROM ($mixed)),
        r0 AS MATERIALIZED (
          SELECT node, bucket, MAX(rho) AS rho FROM br GROUP BY node, bucket),
        ${hop("r0", "r1")},
        ${hop("r1", "r2")},
        ${hop("r2", "r3")}
        ${Seq(hopRow(0, "r0"), hopRow(1, "r1"), hopRow(2, "r2"),
          hopRow(3, "r3")).mkString(" UNION ALL ")}
        ORDER BY h"""
      }),

    // Binary join-count statistics over the qcl contiguity graph: are
    // BUILDING-segment customers spatially clustered? BB / BW / WW
    // neighbor-pair counts with the Cliff–Ord nonfree-sampling moments
    // for BW: E[BW] = S0·nb·nw/n₍₂₎ and E[BW²] = ¼[2S1·2nbnw/n₍₂₎ +
    // (S2−2S1)·nbnw/n₍₂₎ + (S0²+S1−S2)·4nb₍₂₎nw₍₂₎/n₍₄₎] (the shared-
    // index term simplifies because nb+nw−2 = n−2 cancels against
    // n₍₃₎), z = (BW−E)/√Var. The CATEGORICAL spatial-autocorrelation
    // member of the family — qcl/qcm/qcn all need an interval mark.
    // Same cell-bucketed radius join, never all-pairs; every count is
    // an exact integer, the moments are pure doubles from integers.
    "qgv_join_counts" -> Q(
      fn = (s, dir) => {
        val pts = t(s, dir, "customer")
          .filter(col("c_custkey") <= 1500)
          .select(col("c_custkey").as("pid"),
            hashCoord(col("c_custkey"), "lat", 180000L, 90.0).as("lat"),
            hashCoord(col("c_custkey"), "lon", 360000L, 180.0).as("lon"),
            when(col("c_mktsegment") === "BUILDING", 1L).otherwise(0L)
              .as("b"))
          .filter(abs(col("lat")) <= lit(70.0))
          .localCheckpoint(eager = false)
        val cnt = pts.agg(count(lit(1)).as("n"), sum(col("b")).as("nb"))
        val aa = pts.select(col("pid").as("a_id"), col("lat").as("a_lat"),
          col("lon").as("a_lon"), col("b").as("va"))
        val bb = pts.select(col("pid").as("b_id"), col("lat").as("b_lat"),
          col("lon").as("b_lon"), col("b").as("vb"))
        val pairs = Geo.radiusJoinCells(aa, "a_lat", "a_lon",
            bb, "b_lat", "b_lon", 400.0, 5.0, 1, 3)
          .filter(col("a_id") < col("b_id"))
          .select(col("a_id"), col("b_id"), col("va"), col("vb"))
          .localCheckpoint(eager = false)
        val jc = pairs.agg(count(lit(1)).as("j"),
          sum(col("va") * col("vb")).as("bbc"),
          sum((lit(1L) - col("va")) * (lit(1L) - col("vb"))).as("wwc"))
        val degs = pairs.select(col("a_id").as("id"))
          .union(pairs.select(col("b_id")))
          .groupBy("id").agg(count(lit(1)).as("dg"))
          .agg(coalesce(sum(col("dg") * col("dg")), lit(0L)).as("sdeg2"))
        jc.crossJoin(broadcast(cnt)).crossJoin(broadcast(degs))
          .withColumn("bw", col("j") - col("bbc") - col("wwc"))
          .withColumn("nd", col("n").cast("double"))
          .withColumn("nbd", col("nb").cast("double"))
          .withColumn("nwd", col("nd") - col("nbd"))
          .withColumn("s0", lit(2.0) * col("j").cast("double"))
          .withColumn("s1", lit(4.0) * col("j").cast("double"))
          .withColumn("s2v", lit(4.0) * col("sdeg2").cast("double"))
          .withColumn("n2f", col("nd") * (col("nd") - lit(1.0)))
          .withColumn("n4f", col("n2f") * (col("nd") - lit(2.0)) *
            (col("nd") - lit(3.0)))
          .withColumn("ebw",
            col("s0") * col("nbd") * col("nwd") / col("n2f"))
          .withColumn("ebw2", lit(0.25) * (
            lit(2.0) * col("s1") *
              (lit(2.0) * col("nbd") * col("nwd") / col("n2f")) +
            (col("s2v") - lit(2.0) * col("s1")) *
              (col("nbd") * col("nwd") / col("n2f")) +
            (col("s0") * col("s0") + col("s1") - col("s2v")) *
              (lit(4.0) * col("nbd") * (col("nbd") - lit(1.0)) *
                col("nwd") * (col("nwd") - lit(1.0)) / col("n4f"))))
          .select(col("n").as("n_points"), col("nb").as("n_black"),
            col("j").as("n_edges"), col("bbc").as("bb"),
            col("bw"), col("wwc").as("ww"),
            round(col("ebw"), 6).as("e_bw"),
            (round((col("bw").cast("double") - col("ebw")) /
              sqrt(col("ebw2") - col("ebw") * col("ebw")), 6) + lit(0.0))
              .as("z_bw"))
      },
      oracle = Some(s"""
        WITH pts AS MATERIALIZED (
          SELECT * FROM (
            SELECT c_custkey AS id,
                   ${coordSql("c_custkey", "lat", 180000L, 90)} AS lat,
                   ${coordSql("c_custkey", "lon", 360000L, 180)} AS lon,
                   CASE WHEN c_mktsegment = 'BUILDING' THEN 1 ELSE 0 END
                     AS b
            FROM customer WHERE c_custkey <= 1500)
          WHERE ABS(lat) <= CAST(70 AS DOUBLE)),
        cnt AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(b) AS BIGINT) AS nb
          FROM pts),
        pairs AS MATERIALIZED (
          SELECT a.id AS a_id, b.id AS b_id, a.b AS va, b.b AS vb
          FROM pts a JOIN pts b ON a.id < b.id
          WHERE ROUND(CAST(12742 AS DOUBLE) * ASIN(SQRT(
                  SIN(RADIANS(b.lat - a.lat) / CAST(2 AS DOUBLE))
                    * SIN(RADIANS(b.lat - a.lat) / CAST(2 AS DOUBLE))
                  + COS(RADIANS(a.lat)) * COS(RADIANS(b.lat))
                    * SIN(RADIANS(b.lon - a.lon) / CAST(2 AS DOUBLE))
                    * SIN(RADIANS(b.lon - a.lon) / CAST(2 AS DOUBLE)))), 6)
                <= CAST(400 AS DOUBLE)),
        jc AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS j,
                 CAST(COALESCE(SUM(va * vb), 0) AS BIGINT) AS bbc,
                 CAST(COALESCE(SUM((1 - va) * (1 - vb)), 0) AS BIGINT)
                   AS wwc
          FROM pairs),
        degs AS (
          SELECT CAST(COALESCE(SUM(dg * dg), 0) AS BIGINT) AS sdeg2
          FROM (SELECT id, CAST(COUNT(*) AS BIGINT) AS dg
                FROM (SELECT a_id AS id FROM pairs
                      UNION ALL SELECT b_id FROM pairs)
                GROUP BY 1)),
        f AS (
          SELECT n, nb, j, bbc, wwc, j - bbc - wwc AS bw,
                 CAST(n AS DOUBLE) AS nd, CAST(nb AS DOUBLE) AS nbd,
                 CAST(n AS DOUBLE) - CAST(nb AS DOUBLE) AS nwd,
                 CAST(2 AS DOUBLE) * CAST(j AS DOUBLE) AS s0,
                 CAST(4 AS DOUBLE) * CAST(j AS DOUBLE) AS s1,
                 CAST(4 AS DOUBLE) * CAST(sdeg2 AS DOUBLE) AS s2v
          FROM jc CROSS JOIN cnt CROSS JOIN degs),
        f2 AS (
          SELECT *, nd * (nd - CAST(1 AS DOUBLE)) AS n2f,
                 nd * (nd - CAST(1 AS DOUBLE)) * (nd - CAST(2 AS DOUBLE))
                   * (nd - CAST(3 AS DOUBLE)) AS n4f
          FROM f),
        f3 AS (
          SELECT *, s0 * nbd * nwd / n2f AS ebw,
                 CAST(0.25 AS DOUBLE) * (
                   CAST(2 AS DOUBLE) * s1 *
                     (CAST(2 AS DOUBLE) * nbd * nwd / n2f) +
                   (s2v - CAST(2 AS DOUBLE) * s1) * (nbd * nwd / n2f) +
                   (s0 * s0 + s1 - s2v) *
                     (CAST(4 AS DOUBLE) * nbd * (nbd - CAST(1 AS DOUBLE))
                       * nwd * (nwd - CAST(1 AS DOUBLE)) / n4f)) AS ebw2
          FROM f2)
        SELECT n AS n_points, nb AS n_black, j AS n_edges, bbc AS bb,
               bw, wwc AS ww,
               ROUND(ebw, 6) AS e_bw,
               ROUND((CAST(bw AS DOUBLE) - ebw)
                 / SQRT(ebw2 - ebw * ebw), 6) + CAST(0 AS DOUBLE) AS z_bw
        FROM f3""")),

    // Empirical semivariogram of ln customer spend: γ(h) = Σ(vᵃ−vᵇ)² /
    // (2·N_h) over 100 km distance bins out to 400 km — the
    // geostatistical range/nugget diagnostic that qcl/qcm summarize
    // into one number (Moran/Geary are the variogram's scalar
    // shadows). Pairs come from the same cell-bucketed radius join
    // (never all-pairs); the bin key is floor of the 6-rounded
    // haversine both engines share; squared differences of 9-grid
    // values round at 12 into DECIMAL sums.
    "qh5_semivariogram" -> Q(
      fn = (s, dir) => {
        val spend = t(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("sp"))
        val pts = t(s, dir, "customer")
          .filter(col("c_custkey") <= 1500)
          .join(spend, col("c_custkey") === col("o_custkey"))
          .select(col("c_custkey").as("pid"),
            hashCoord(col("c_custkey"), "lat", 180000L, 90.0).as("lat"),
            hashCoord(col("c_custkey"), "lon", 360000L, 180.0).as("lon"),
            round(log(col("sp").cast("double")), 9).as("a"))
          .filter(abs(col("lat")) <= lit(70.0))
          .localCheckpoint(eager = false)
        val aa = pts.select(col("pid").as("a_id"), col("lat").as("a_lat"),
          col("lon").as("a_lon"), col("a").as("va"))
        val bb = pts.select(col("pid").as("b_id"), col("lat").as("b_lat"),
          col("lon").as("b_lon"), col("a").as("vb"))
        Geo.radiusJoinCells(aa, "a_lat", "a_lon",
            bb, "b_lat", "b_lon", 400.0, 5.0, 1, 3)
          .filter(col("a_id") < col("b_id"))
          .select(floor(col("dist_km") / lit(100.0)).cast("int").as("bin"),
            col("dist_km"), col("va"), col("vb"))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n_pairs"),
            sum(col("dist_km").cast("decimal(18,6)")).as("sdist"),
            sum(round((col("va") - col("vb")) * (col("va") - col("vb")), 12)
              .cast("decimal(28,12)")).as("ssq"))
          .select((col("bin") * 100).as("bin_km_lo"), col("n_pairs"),
            round(col("sdist").cast("double") / col("n_pairs").cast("double"),
              6).as("mean_dist_km"),
            round(col("ssq").cast("double") /
              (lit(2.0) * col("n_pairs").cast("double")), 6).as("gamma"))
          .orderBy("bin_km_lo")
      },
      oracle = Some(s"""
        WITH spend AS (
          SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS sp
          FROM orders GROUP BY 1),
        pts AS MATERIALIZED (
          SELECT * FROM (
            SELECT c_custkey AS id,
                   ${coordSql("c_custkey", "lat", 180000L, 90)} AS lat,
                   ${coordSql("c_custkey", "lon", 360000L, 180)} AS lon,
                   ROUND(ln(CAST(sp AS DOUBLE)), 9) AS a
            FROM customer JOIN spend ON c_custkey = o_custkey
            WHERE c_custkey <= 1500)
          WHERE ABS(lat) <= CAST(70 AS DOUBLE)),
        pairs AS (
          SELECT a.a AS va, b.a AS vb,
                 ROUND(CAST(12742 AS DOUBLE) * ASIN(SQRT(
                   SIN(RADIANS(b.lat - a.lat) / CAST(2 AS DOUBLE))
                     * SIN(RADIANS(b.lat - a.lat) / CAST(2 AS DOUBLE))
                   + COS(RADIANS(a.lat)) * COS(RADIANS(b.lat))
                     * SIN(RADIANS(b.lon - a.lon) / CAST(2 AS DOUBLE))
                     * SIN(RADIANS(b.lon - a.lon) / CAST(2 AS DOUBLE)))), 6)
                   AS dist_km
          FROM pts a JOIN pts b ON a.id < b.id),
        binned AS (
          SELECT CAST(FLOOR(dist_km / CAST(100 AS DOUBLE)) AS INT) AS bin,
                 dist_km, va, vb
          FROM pairs WHERE dist_km <= CAST(400 AS DOUBLE))
        SELECT bin * 100 AS bin_km_lo,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               ROUND(CAST(SUM(CAST(dist_km AS DECIMAL(18,6))) AS DOUBLE)
                 / CAST(COUNT(*) AS DOUBLE), 6) AS mean_dist_km,
               ROUND(CAST(SUM(CAST(ROUND((va - vb) * (va - vb), 12)
                 AS DECIMAL(28,12))) AS DOUBLE)
                 / (CAST(2 AS DOUBLE) * CAST(COUNT(*) AS DOUBLE)), 6)
                 AS gamma
        FROM binned GROUP BY 1 ORDER BY 1""")),

    // LISA — local Moran's Iᵢ over the qcl contiguity graph with the
    // Anselin quadrant typing: Iᵢ = (zᵢ/m₂)·Σ_{j∈N(i)} zⱼ, HH/LL =
    // clusters, HL/LH = spatial OUTLIERS — the per-point answer qcl's
    // single global I averages away, and the cluster/outlier
    // distinction qco's G*ᵢ (which only sees magnitude) cannot make.
    // Same cell-bucketed radius join; top 20 by |Iᵢ| with id
    // tiebreaks; 12-grid products into DECIMAL sums.
    "qis_local_morans" -> Q(
      fn = (s, dir) => {
        val spend = t(s, dir, "orders")
          .groupBy(col("o_custkey"))
          .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("sp"))
        val pts = t(s, dir, "customer")
          .filter(col("c_custkey") <= 1500)
          .join(spend, col("c_custkey") === col("o_custkey"))
          .select(col("c_custkey").as("pid"),
            hashCoord(col("c_custkey"), "lat", 180000L, 90.0).as("lat"),
            hashCoord(col("c_custkey"), "lon", 360000L, 180.0).as("lon"),
            round(log(col("sp").cast("double")), 9).as("a"))
          .filter(abs(col("lat")) <= lit(70.0))
          .localCheckpoint(eager = false)
        val mu = pts.agg(count(lit(1)).as("n"),
            sum(col("a").cast("decimal(28,9)")).as("sa"))
          .select(col("n"),
            round(col("sa").cast("double") / col("n").cast("double"), 9)
              .as("mu"))
        val zs = pts.crossJoin(broadcast(mu))
          .select(col("pid"), col("lat"), col("lon"),
            round(col("a") - col("mu"), 9).as("z"), col("n"))
          .localCheckpoint(eager = false)
        val m2 = zs.agg(max(col("n")).as("n"),
            sum(round(col("z") * col("z"), 12).cast("decimal(28,12)"))
              .as("szz"))
          .select(col("n"),
            round(col("szz").cast("double") / col("n").cast("double"), 9)
              .as("m2"))
        val aa = zs.select(col("pid").as("a_id"), col("lat").as("a_lat"),
          col("lon").as("a_lon"), col("z").as("za"))
        val bb = zs.select(col("pid").as("b_id"), col("lat").as("b_lat"),
          col("lon").as("b_lon"), col("z").as("zb"))
        val lags = Geo.radiusJoinCells(aa, "a_lat", "a_lon",
            bb, "b_lat", "b_lon", 400.0, 5.0, 1, 3)
          .filter(col("a_id") =!= col("b_id"))
          .groupBy(col("a_id"), col("za"))
          .agg(count(lit(1)).as("n_nbrs"),
            sum(round(col("zb"), 9).cast("decimal(20,9)")).as("zlag"))
        lags.crossJoin(broadcast(m2.select(col("m2"))))
          .withColumn("ii", round(col("za") / col("m2") *
            col("zlag").cast("double"), 9))
          .withColumn("quad",
            when(col("za") > 0 && col("zlag") > 0, "HH")
              .when(col("za") < 0 && col("zlag") < 0, "LL")
              .when(col("za") > 0 && col("zlag") <= 0, "HL")
              .otherwise("LH"))
          .withColumn("rk", row_number().over(
            Window.orderBy(abs(col("ii")).desc, col("a_id"))))
          .filter(col("rk") <= 20)
          .select(col("rk").cast("int").as("rank"),
            col("a_id").as("point_id"), col("n_nbrs"),
            (round(col("za"), 6) + lit(0.0)).as("z_i"),
            (round(col("zlag").cast("double"), 6) + lit(0.0))
              .as("z_lag_sum"),
            (round(col("ii"), 6) + lit(0.0)).as("local_i"),
            col("quad"))
          .orderBy("rank")
      },
      oracle = Some(s"""
        WITH spend AS (
          SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS sp
          FROM orders GROUP BY 1),
        pts AS MATERIALIZED (
          SELECT * FROM (
            SELECT c_custkey AS id,
                   ${coordSql("c_custkey", "lat", 180000L, 90)} AS lat,
                   ${coordSql("c_custkey", "lon", 360000L, 180)} AS lon,
                   ROUND(ln(CAST(sp AS DOUBLE)), 9) AS a
            FROM customer JOIN spend ON c_custkey = o_custkey
            WHERE c_custkey <= 1500)
          WHERE ABS(lat) <= CAST(70 AS DOUBLE)),
        mu AS (
          SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 ROUND(CAST(SUM(CAST(a AS DECIMAL(28,9))) AS DOUBLE)
                   / CAST(COUNT(*) AS DOUBLE), 9) AS mu
          FROM pts),
        zs AS MATERIALIZED (
          SELECT id, lat, lon, ROUND(a - mu, 9) AS z, n
          FROM pts CROSS JOIN mu),
        m2 AS (
          SELECT ROUND(CAST(SUM(CAST(ROUND(z * z, 12) AS DECIMAL(28,12)))
                   AS DOUBLE) / CAST(MAX(n) AS DOUBLE), 9) AS m2
          FROM zs),
        lags AS (
          SELECT a.id AS a_id, a.z AS za,
                 CAST(COUNT(*) AS BIGINT) AS n_nbrs,
                 SUM(CAST(ROUND(b.z, 9) AS DECIMAL(20,9))) AS zlag
          FROM zs a JOIN zs b ON a.id <> b.id
          WHERE ROUND(CAST(12742 AS DOUBLE) * ASIN(SQRT(
                  SIN(RADIANS(b.lat - a.lat) / CAST(2 AS DOUBLE))
                    * SIN(RADIANS(b.lat - a.lat) / CAST(2 AS DOUBLE))
                  + COS(RADIANS(a.lat)) * COS(RADIANS(b.lat))
                    * SIN(RADIANS(b.lon - a.lon) / CAST(2 AS DOUBLE))
                    * SIN(RADIANS(b.lon - a.lon) / CAST(2 AS DOUBLE)))), 6)
                <= CAST(400 AS DOUBLE)
          GROUP BY 1, 2),
        scored AS (
          SELECT a_id, za, n_nbrs, zlag,
                 ROUND(za / m2 * CAST(zlag AS DOUBLE), 9) AS ii,
                 CASE WHEN za > 0 AND zlag > 0 THEN 'HH'
                      WHEN za < 0 AND zlag < 0 THEN 'LL'
                      WHEN za > 0 AND zlag <= 0 THEN 'HL'
                      ELSE 'LH' END AS quad
          FROM lags CROSS JOIN m2),
        ranked AS (
          SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY ABS(ii) DESC, a_id)
                   AS INT) AS rk
          FROM scored)
        SELECT rk AS rank, a_id AS point_id, n_nbrs,
               ROUND(za, 6) + CAST(0 AS DOUBLE) AS z_i,
               ROUND(CAST(zlag AS DOUBLE), 6) + CAST(0 AS DOUBLE)
                 AS z_lag_sum,
               ROUND(ii, 6) + CAST(0 AS DOUBLE) AS local_i,
               quad
        FROM ranked WHERE rk <= 20
        ORDER BY rank"""))
  )
}

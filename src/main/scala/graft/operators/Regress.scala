package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Closed-form model fitting that stays exact under the oracle contract.
  *
  * Everything here reduces a model fit to (a) a bounded set of exact
  * DECIMAL moment sums over the data — one map-side-combinable aggregate,
  * no per-row driver traffic — and (b) a fixed-shape double expression
  * over those moments. Per-row products are rounded to 6 decimals by the
  * DECIMAL(38,6) cast (Spark's decimal cast is half-up; the DuckDB oracle
  * spells the same half-up via ROUND-inside-CAST, the q8c
  * correlation-matrix recipe), so both engines walk bit-identical doubles
  * and even multi-stage formulas (Cramer's rule, PAVA pool means, τ-b
  * normalization) replay hash-exact.
  *
  * Scale: each fit is one aggregation, or a bounded-profile self-join
  * (PAVA's input is a binned calibration table, never raw rows), so the
  * only data-proportional stage is the partial aggregate of the moments.
  */
object Regress {

  private def dec6(c: Column): Column = c.cast("decimal(38,6)")

  /** Two-feature ordinary least squares y ~ b0 + b1·x1 + b2·x2 by the
    * normal equations, solved with Cramer's rule on the exact 3×3 moment
    * matrix. R² comes ALGEBRAICALLY from the same moments
    * (SSE = Syy − 2βᵀSxy + βᵀ Sxx β) — never from per-row residuals — so
    * no order-dependent double summation exists anywhere. Coefficients
    * snap to the 9-decimal grid before feeding SSE (the q4b recipe);
    * reported columns round to 6.
    *
    * Returns one row: n, b0, b1, b2, r2.
    */
  def ols2(df: DataFrame, y: Column, x1: Column, x2: Column): DataFrame = {
    val base = df.select(y.cast("double").as("y"),
        x1.cast("double").as("x1"), x2.cast("double").as("x2"))
      .filter(col("y").isNotNull && col("x1").isNotNull && col("x2").isNotNull)
    val one = base.agg(
      count(lit(1)).cast("double").as("n"),
      sum(dec6(col("x1"))).cast("double").as("s1"),
      sum(dec6(col("x2"))).cast("double").as("s2"),
      sum(dec6(col("x1") * col("x1"))).cast("double").as("s11"),
      sum(dec6(col("x1") * col("x2"))).cast("double").as("s12"),
      sum(dec6(col("x2") * col("x2"))).cast("double").as("s22"),
      sum(dec6(col("y"))).cast("double").as("sy"),
      sum(dec6(col("x1") * col("y"))).cast("double").as("s1y"),
      sum(dec6(col("x2") * col("y"))).cast("double").as("s2y"),
      sum(dec6(col("y") * col("y"))).cast("double").as("syy"))
    cramer3(one)
      .withColumn("sse", sseExpr("n", "s1", "s2", "s11", "s12", "s22",
        "sy", "s1y", "s2y", "syy"))
      .withColumn("sst", col("syy") - col("sy") * col("sy") / col("n"))
      .select(col("n").cast("long").as("n"),
        round(col("b0"), 6).as("b0"), round(col("b1"), 6).as("b1"),
        round(col("b2"), 6).as("b2"),
        round(lit(1.0) - col("sse") / col("sst"), 6).as("r2"))
  }

  /** Cramer's rule on moment columns (n, s1, s2, s11, s12, s22, sy, s1y,
    * s2y): adds det/det0/det1/det2 and the 9-snapped b0/b1/b2. The
    * expression shapes are the oracle contract — every DuckDB twin
    * mirrors them operation for operation.
    */
  private def cramer3(m: DataFrame): DataFrame =
    m.withColumn("det",
        col("n") * (col("s11") * col("s22") - col("s12") * col("s12")) -
          col("s1") * (col("s1") * col("s22") - col("s12") * col("s2")) +
          col("s2") * (col("s1") * col("s12") - col("s11") * col("s2")))
      .withColumn("det0",
        col("sy") * (col("s11") * col("s22") - col("s12") * col("s12")) -
          col("s1") * (col("s1y") * col("s22") - col("s12") * col("s2y")) +
          col("s2") * (col("s1y") * col("s12") - col("s11") * col("s2y")))
      .withColumn("det1",
        col("n") * (col("s1y") * col("s22") - col("s12") * col("s2y")) -
          col("sy") * (col("s1") * col("s22") - col("s12") * col("s2")) +
          col("s2") * (col("s1") * col("s2y") - col("s1y") * col("s2")))
      .withColumn("det2",
        col("n") * (col("s11") * col("s2y") - col("s1y") * col("s12")) -
          col("s1") * (col("s1") * col("s2y") - col("s1y") * col("s2")) +
          col("sy") * (col("s1") * col("s12") - col("s11") * col("s2")))
      .withColumn("b0", round(col("det0") / col("det"), 9))
      .withColumn("b1", round(col("det1") / col("det"), 9))
      .withColumn("b2", round(col("det2") / col("det"), 9))

  /** SSE = Syy − 2βᵀSxy + βᵀSxxβ over the named moment columns, using
    * the b0/b1/b2 added by [[cramer3]].
    */
  private def sseExpr(n: String, s1: String, s2: String, s11: String,
      s12: String, s22: String, sy: String, s1y: String, s2y: String,
      syy: String) =
    col(syy) -
      lit(2.0) * (col("b0") * col(sy) + col("b1") * col(s1y) +
        col("b2") * col(s2y)) +
      (col("b0") * col("b0") * col(n) +
        col("b1") * col("b1") * col(s11) +
        col("b2") * col("b2") * col(s22) +
        lit(2.0) * col("b0") * col("b1") * col(s1) +
        lit(2.0) * col("b0") * col("b2") * col(s2) +
        lit(2.0) * col("b1") * col("b2") * col(s12))

  /** K-fold cross-validation of the two-feature OLS in ONE pass over the
    * data: per-fold DECIMAL moments aggregate once, each fold's TRAIN
    * moments are the exact decimal subtraction total − fold (no second
    * scan, no per-fold jobs), the fit is [[cramer3]] per fold-row, and
    * the held-out error is algebraic from the fold's own moments — so
    * the whole CV costs one aggregation regardless of K.
    *
    * `fold` must be a non-null integer column. Returns per fold:
    * (fold, n_train, n_test, b0, b1, b2, rmse, r2_test).
    */
  def ols2CvFolds(df: DataFrame, y: Column, x1: Column, x2: Column,
      fold: Column): DataFrame = {
    val base = df.select(fold.cast("long").as("fold"),
        y.cast("double").as("y"), x1.cast("double").as("x1"),
        x2.cast("double").as("x2"))
      .filter(col("fold").isNotNull && col("y").isNotNull &&
        col("x1").isNotNull && col("x2").isNotNull)
    val moms: Seq[(String, Column)] = Seq(
      "s1" -> col("x1"), "s2" -> col("x2"),
      "s11" -> col("x1") * col("x1"), "s12" -> col("x1") * col("x2"),
      "s22" -> col("x2") * col("x2"), "sy" -> col("y"),
      "s1y" -> col("x1") * col("y"), "s2y" -> col("x2") * col("y"),
      "syy" -> col("y") * col("y"))
    val perFold = base.groupBy(col("fold")).agg(
      count(lit(1)).as("fn"),
      moms.map { case (nm, c) => sum(dec6(c)).as("f" + nm) }: _*)
    val tot = base.agg(
      count(lit(1)).as("tn"),
      moms.map { case (nm, c) => sum(dec6(c)).as("t" + nm) }: _*)
    val trainCols = Seq("n" -> (col("tn") - col("fn")).cast("double")) ++
      moms.map { case (nm, _) =>
        nm -> (col("t" + nm) - col("f" + nm)).cast("double")
      }
    val fitted = cramer3(trainCols.foldLeft(
      perFold.crossJoin(broadcast(tot))) { case (d, (nm, c)) =>
      d.withColumn(nm, c)
    })
    val testD = (Seq("n" -> "fn") ++ moms.map { case (nm, _) =>
      nm -> ("f" + nm)
    }).foldLeft(fitted) { case (d, (nm, src)) =>
      d.withColumn("e_" + nm, col(src).cast("double"))
    }
    testD
      .withColumn("sse_t", sseExpr("e_n", "e_s1", "e_s2", "e_s11", "e_s12",
        "e_s22", "e_sy", "e_s1y", "e_s2y", "e_syy"))
      .withColumn("sst_t",
        col("e_syy") - col("e_sy") * col("e_sy") / col("e_n"))
      .select(col("fold"), (col("tn") - col("fn")).as("n_train"),
        col("fn").as("n_test"),
        round(col("b0"), 6).as("b0"), round(col("b1"), 6).as("b1"),
        round(col("b2"), 6).as("b2"),
        round(sqrt(greatest(col("sse_t"), lit(0.0)) / col("e_n")), 6)
          .as("rmse"),
        round(lit(1.0) - col("sse_t") / col("sst_t"), 6).as("r2_test"))
  }

  /** Best single binary split per candidate feature by weighted Gini
    * impurity, scanned EXACTLY over every distinct feature value: one
    * groupBy to the bounded (value, n, pos) profile, cumulative class
    * counts in value order, the split impurity at every threshold, argmin
    * per feature via the map-side-combinable min(struct(...)). The only
    * window runs over the bounded distinct-value profile (callers bin
    * continuous features first), never over raw rows.
    *
    * `features` maps feature name → (binned) numeric column; `label`
    * must be 0/1. Returns one row per feature:
    * (feature, threshold, gini, n_left, n_right) — threshold is the
    * largest value routed left.
    */
  def decisionStump(df: DataFrame, features: Seq[(String, Column)],
      label: Column): DataFrame = {
    val perFeature = features.map { case (name, c) =>
      val prof = df.select(c.cast("double").as("v"),
          label.cast("long").as("y"))
        .filter(col("v").isNotNull && col("y").isNotNull)
        .groupBy(col("v"))
        .agg(count(lit(1)).as("n"), sum(col("y")).as("pos"))
      val w = Window.orderBy(col("v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wAll = Window.partitionBy()
      val scan = prof
        .withColumn("nl", sum(col("n")).over(w).cast("double"))
        .withColumn("pl", sum(col("pos")).over(w).cast("double"))
        .withColumn("nt", sum(col("n")).over(wAll).cast("double"))
        .withColumn("pt", sum(col("pos")).over(wAll).cast("double"))
        .filter(col("nl") < col("nt")) // right side must stay non-empty
      val nr = col("nt") - col("nl"); val pr = col("pt") - col("pl")
      val gl = lit(1.0) - (col("pl") / col("nl")) * (col("pl") / col("nl")) -
        ((col("nl") - col("pl")) / col("nl")) *
          ((col("nl") - col("pl")) / col("nl"))
      val gr = lit(1.0) - (pr / nr) * (pr / nr) -
        ((nr - pr) / nr) * ((nr - pr) / nr)
      scan
        .withColumn("gini",
          round((col("nl") / col("nt")) * gl + (nr / col("nt")) * gr, 12))
        .groupBy()
        .agg(min(struct(col("gini"), col("v"), col("nl"), col("nt"))).as("win"))
        .select(lit(name).as("feature"), col("win.v").as("threshold"),
          round(col("win.gini"), 6).as("gini"),
          col("win.nl").cast("long").as("n_left"),
          (col("win.nt") - col("win.nl")).cast("long").as("n_right"))
    }
    perFeature.reduce(_ unionByName _)
  }

  /** Isotonic regression over a pre-binned profile by the closed-form
    * PAVA solution iso(i) = max_{j ≤ i} min_{k ≥ j} mean(y over bins
    * j..k). The profile is bounded (a binned calibration table, never raw
    * rows), so the O(B²) pool enumeration is a constant-size self-join.
    * Bin sums arrive as DECIMAL; each pooled mean is one double division
    * rounded to 9, so the min/max lattice compares identical grid points
    * in both engines.
    *
    * `bins` columns: (bin, sum_y DECIMAL, n LONG), distinct bin values.
    * Returns (bin, rate, iso_rate).
    */
  def isotonicBins(bins: DataFrame): DataFrame = {
    val w = Window.orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val pre = bins
      .withColumn("cs", sum(col("sum_y")).over(w))
      .withColumn("cn", sum(col("n")).over(w))
    val jRows = pre.select(col("bin").as("j"),
      (col("cs") - col("sum_y")).as("cs_lo"),
      (col("cn") - col("n")).as("cn_lo"))
    val kRows = pre.select(col("bin").as("k"),
      col("cs").as("cs_hi"), col("cn").as("cn_hi"))
    val pooled = jRows.join(kRows, col("k") >= col("j"))
      .select(col("j"),
        round((col("cs_hi") - col("cs_lo")).cast("double") /
          (col("cn_hi") - col("cn_lo")).cast("double"), 9).as("mean_jk"))
    val minOverK = pooled.groupBy(col("j")).agg(min(col("mean_jk")).as("min_j"))
    val iso = bins.select(col("bin")).join(minOverK, col("j") <= col("bin"))
      .groupBy(col("bin")).agg(max(col("min_j")).as("iso_rate"))
    bins.select(col("bin"),
        round(col("sum_y").cast("double") / col("n").cast("double"), 9)
          .as("rate"))
      .join(iso, Seq("bin"))
      .select(col("bin"), round(col("rate"), 6).as("rate"),
        round(col("iso_rate"), 6).as("iso_rate"))
  }

  /** Theil–Sen robust regression per group: slope = lower median of all
    * pairwise slopes (x_i ≠ x_j), intercept = lower median of
    * y − slope·x. The lower median (rank ⌈m/2⌉ with (slope, i, j)
    * tie-break) replaces the classical midpoint average so the estimate
    * is an order statistic — exact in both engines with no float
    * averaging. The O(n²) pair enumeration REQUIRES bounded groups (the
    * q91 contract); slopes ride the 9-decimal grid.
    *
    * `idCol` must be unique inside each group. Returns per group:
    * (n, n_pairs, sen_slope, sen_intercept).
    */
  def theilSen(df: DataFrame, groupCols: Seq[String], x: Column, y: Column,
      idCol: Column): DataFrame = {
    val g = groupCols.map(col)
    val base = df.select(g :+ x.cast("double").as("x") :+
        y.cast("double").as("y") :+ idCol.as("id"): _*)
      .filter(col("x").isNotNull && col("y").isNotNull)
    val l = base.select(g :+ col("x").as("ax") :+ col("y").as("ay") :+
      col("id").as("ai"): _*)
    val r = base.select(g :+ col("x").as("bx") :+ col("y").as("by") :+
      col("id").as("bi"): _*)
    val slopes = l.join(r, groupCols)
      .filter(col("ai") < col("bi") && col("ax") =!= col("bx"))
      .withColumn("slope",
        round((col("by") - col("ay")) / (col("bx") - col("ax")), 9))
    val wS = Window.partitionBy(g: _*)
      .orderBy(col("slope"), col("ai"), col("bi"))
    val mPairs = slopes.groupBy(g: _*).agg(count(lit(1)).as("n_pairs"))
    val sen = slopes.withColumn("rn", row_number().over(wS))
      .join(mPairs, groupCols)
      .filter(col("rn") === ((col("n_pairs") + 1) / 2).cast("int"))
      .select(g :+ col("n_pairs") :+ col("slope").as("sen_slope"): _*)
    val resid = base.join(sen, groupCols)
      .withColumn("r0", round(col("y") - col("sen_slope") * col("x"), 9))
    val wR = Window.partitionBy(g: _*).orderBy(col("r0"), col("id"))
    val nPts = base.groupBy(g: _*).agg(count(lit(1)).as("n"))
    val intercept = resid.withColumn("rn", row_number().over(wR))
      .join(nPts, groupCols)
      .filter(col("rn") === ((col("n") + 1) / 2).cast("int"))
      .select(g :+ col("n") :+ col("r0").as("sen_intercept"): _*)
    nPts.join(sen, groupCols).join(
        intercept.select(g :+ col("sen_intercept"): _*), groupCols)
      .select(g :+ col("n") :+ col("n_pairs") :+
        round(col("sen_slope"), 6).as("sen_slope") :+
        round(col("sen_intercept"), 6).as("sen_intercept"): _*)
  }

  /** Spearman ρ (average ranks, so ties are exact) and Kendall τ-b per
    * group. Spearman is scale-safe (two in-group rank windows + one
    * moment aggregate); the τ-b pair enumeration is O(n²) per group by
    * construction and therefore REQUIRES bounded groups — callers at
    * scale pass group slices (stratified samples, per-entity panels),
    * the q91 pairwise-diversity contract.
    *
    * `idCol` must be a unique numeric id inside each group (the i < j
    * pair order). Returns per group: (n, spearman_rho, kendall_tau).
    */
  def rankCorrelation(df: DataFrame, groupCols: Seq[String],
      x: Column, y: Column, idCol: Column): DataFrame = {
    val g = groupCols.map(col)
    val base = df.select(g :+ x.cast("double").as("x") :+
        y.cast("double").as("y") :+ idCol.as("id"): _*)
      .filter(col("x").isNotNull && col("y").isNotNull)
    def avgRank(c: Column): Column = {
      val wr = Window.partitionBy(g: _*).orderBy(c)
      val wt = Window.partitionBy(g :+ c: _*)
      rank().over(wr).cast("double") +
        (count(lit(1)).over(wt).cast("double") - lit(1.0)) / lit(2.0)
    }
    val ranked = base
      .withColumn("rx", avgRank(col("x")))
      .withColumn("ry", avgRank(col("y")))
    val spearman = ranked.groupBy(g: _*).agg(
        count(lit(1)).cast("double").as("n"),
        sum(dec6(col("rx"))).cast("double").as("sx"),
        sum(dec6(col("ry"))).cast("double").as("sy"),
        sum(dec6(col("rx") * col("rx"))).cast("double").as("sxx"),
        sum(dec6(col("ry") * col("ry"))).cast("double").as("syy"),
        sum(dec6(col("rx") * col("ry"))).cast("double").as("sxy"))
      .withColumn("cov", col("sxy") / col("n") -
        (col("sx") / col("n")) * (col("sy") / col("n")))
      .withColumn("vx", col("sxx") / col("n") -
        (col("sx") / col("n")) * (col("sx") / col("n")))
      .withColumn("vy", col("syy") / col("n") -
        (col("sy") / col("n")) * (col("sy") / col("n")))
      .select(g :+ col("n").cast("long").as("n") :+
        when(col("vx") > 0 && col("vy") > 0,
          round(col("cov") / sqrt(col("vx") * col("vy")), 6))
          .as("spearman_rho"): _*)
    val l = base.select(g :+ col("x").as("ax") :+ col("y").as("ay") :+
      col("id").as("ai"): _*)
    val r = base.select(g :+ col("x").as("bx") :+ col("y").as("by") :+
      col("id").as("bi"): _*)
    val sgn = (a: Column, b: Column) =>
      when(a < b, lit(1)).when(a > b, lit(-1)).otherwise(lit(0))
    val kt = l.join(r, groupCols).filter(col("ai") < col("bi"))
      .withColumn("prod", sgn(col("ax"), col("bx")) * sgn(col("ay"), col("by")))
      .withColumn("tx", (col("ax") === col("bx")).cast("long"))
      .withColumn("ty", (col("ay") === col("by")).cast("long"))
      .groupBy(g: _*)
      .agg(count(lit(1)).as("n0"),
        sum(when(col("prod") === 1, 1L).otherwise(0L)).as("nc"),
        sum(when(col("prod") === -1, 1L).otherwise(0L)).as("nd"),
        sum(col("tx")).as("n1"), sum(col("ty")).as("n2"))
      .select(g :+
        when((col("n0") - col("n1")) > 0 && (col("n0") - col("n2")) > 0,
          round((col("nc") - col("nd")).cast("double") /
            sqrt((col("n0") - col("n1")).cast("double") *
              (col("n0") - col("n2")).cast("double")), 6))
          .as("kendall_tau"): _*)
    spearman.join(kt, groupCols, "left")
  }
}

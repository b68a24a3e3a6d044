package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import IterCheckpoint.Pinnable

/** Gradient boosting with depth-1 regression trees (stumps) on squared
  * loss — Friedman's classic algorithm, two rounds, fully distributed
  * and exact under the oracle contract.
  *
  * The trick that keeps it oracle-exact: residuals are NEVER
  * materialized per row. Each round aggregates a bounded profile of the
  * ORIGINAL target's DECIMAL moments keyed by (feature value ×
  * previous-round side), cumulates them in exact DECIMAL windows over
  * the bounded profile, and converts to residual moments ALGEBRAICALLY
  * at the threshold level (Σ(y−c)² = Syy − 2cSy + nc² per cell, with the
  * per-cell prediction c snapped to the 9-decimal grid) — a fixed-shape
  * double expression per candidate threshold, so no order-dependent
  * double summation exists anywhere and DuckDB replays bit-for-bit
  * (the q5a/q4y "training can be oracled" recipe, extended to
  * ensembles).
  *
  * Winner selection is the map-side-combinable min(struct(...)), the
  * round-2 side assignment joins the broadcast 1-row winner (no driver
  * collect), and the only data-proportional work per round is one
  * partial-aggregated groupBy of the raw table — the same scan-bound
  * shape a 1000-executor GBM round runs at 100 TB.
  */
object Boost {

  /** y as an exact 2-decimal DECIMAL — the target must be a monetary
    * 2-decimal value, so y and y·y are EXACT decimal arithmetic with no
    * float rounding anywhere (ROUND(y²,6) at 1e10 magnitude would need
    * 17 significant digits, beyond what a double determines — the one
    * per-row rounding that engines disagree on).
    */
  private def yd: Column = col("y").cast("decimal(18,2)")

  /** Two boosting rounds over two candidate features. Returns 3 rows:
    *   round 0: ('(const)', null, F0, F0, total SST)
    *   round r: (feature, threshold, w_left, w_right, post-split SSE)
    * with leaf values on the residual scale (apply with learning rate
    * `lr`: F_r(x) = F_{r-1}(x) + lr·w_side(x)).
    */
  def boostedStumps2(df: DataFrame, y: Column,
      f1Name: String, f1: Column, f2Name: String, f2: Column,
      lr: Double): DataFrame = {
    val base = df.select(y.cast("double").as("y"),
        f1.cast("double").as("f1"), f2.cast("double").as("f2"))
      .filter(col("y").isNotNull && col("f1").isNotNull && col("f2").isNotNull)
      .iterCheckpoint(eager = false)

    // ---- round 0: global mean and total SST ----
    val g = base.agg(count(lit(1)).as("n"),
      sum(yd).as("sy"), sum(yd * yd).as("syy"))
    val f0row = g.select(col("n"),
        round(col("sy").cast("double") / col("n").cast("double"), 9).as("f0"),
        col("sy").cast("double").as("syd"), col("syy").cast("double").as("syyd"))
      .withColumn("sst",
        round(col("syyd") - col("syd") * col("syd") / col("n").cast("double"), 6))
      .select(col("f0"), col("sst"))
      .iterCheckpoint(eager = false)

    // ---- round 1: stump on r = y − F0 ----
    // profile of RAW y moments per (feature, value); residual conversion
    // happens at the threshold level with c = F0
    def prof1(name: String, f: Column): DataFrame =
      base.groupBy(f.as("v"))
        .agg(count(lit(1)).as("n"), sum(yd).as("sy"),
          sum(yd * yd).as("syy"))
        .select(lit(name).as("feature"), col("v"), col("n"), col("sy"),
          col("syy"))
    val p1 = prof1(f1Name, col("f1")).unionByName(prof1(f2Name, col("f2")))
    val w1 = Window.partitionBy(col("feature")).orderBy(col("v"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wt1 = Window.partitionBy(col("feature"))
    val scan1 = p1
      .withColumn("nl", sum(col("n")).over(w1))
      .withColumn("syl", sum(col("sy")).over(w1))
      .withColumn("syyl", sum(col("syy")).over(w1))
      .withColumn("nt", sum(col("n")).over(wt1))
      .withColumn("syt", sum(col("sy")).over(wt1))
      .withColumn("syyt", sum(col("syy")).over(wt1))
      .filter(col("nl") < col("nt"))
      .crossJoin(broadcast(f0row))
    // residual moments, algebraic: S = Sy − n·c, SYY = Syy − 2c·Sy + n·c²
    def rS(sy: Column, n: Column, c: Column) =
      sy - n * c
    def rSS(syy: Column, sy: Column, n: Column, c: Column) =
      syy - lit(2.0) * c * sy + n * c * c
    val s1 = scan1
      .withColumn("nld", col("nl").cast("double"))
      .withColumn("nrd", (col("nt") - col("nl")).cast("double"))
      .withColumn("sl", rS(col("syl").cast("double"), col("nld"), col("f0")))
      .withColumn("sr", rS((col("syt") - col("syl")).cast("double"),
        col("nrd"), col("f0")))
      .withColumn("ssl", rSS(col("syyl").cast("double"),
        col("syl").cast("double"), col("nld"), col("f0")))
      .withColumn("ssr", rSS((col("syyt") - col("syyl")).cast("double"),
        (col("syt") - col("syl")).cast("double"), col("nrd"), col("f0")))
      .withColumn("sse", round(
        (col("ssl") - col("sl") * col("sl") / col("nld")) +
          (col("ssr") - col("sr") * col("sr") / col("nrd")), 6))
    val win1 = s1.groupBy()
      .agg(min(struct(col("sse"), col("feature"), col("v"), col("sl"),
        col("sr"), col("nld"), col("nrd"))).as("w"))
      .select(col("w.sse").as("sse1"), col("w.feature").as("feat1"),
        col("w.v").as("t1"),
        round(col("w.sl") / col("w.nld"), 9).as("wl1"),
        round(col("w.sr") / col("w.nrd"), 9).as("wr1"))
      .crossJoin(broadcast(f0row))
      .withColumn("cl1", col("f0") + lit(lr) * col("wl1"))
      .withColumn("cr1", col("f0") + lit(lr) * col("wr1"))
      .iterCheckpoint(eager = false)

    // ---- round 2: stump on r2 = y − F1(x), F1 side from the broadcast
    // winner (no driver collect) ----
    val sided = base.crossJoin(broadcast(win1))
      .withColumn("side1",
        when(col("feat1") === f1Name, col("f1") <= col("t1"))
          .otherwise(col("f2") <= col("t1")))
    def prof2(name: String, f: Column): DataFrame =
      sided.groupBy(f.as("v"))
        .agg(
          sum(when(!col("side1"), lit(1L)).otherwise(lit(0L))).as("n0"),
          sum(when(!col("side1"), yd)
            .otherwise(lit(null))).as("sy0"),
          sum(when(!col("side1"), yd * yd)
            .otherwise(lit(null))).as("syy0"),
          sum(when(col("side1"), lit(1L)).otherwise(lit(0L))).as("n1"),
          sum(when(col("side1"), yd)
            .otherwise(lit(null))).as("sy1"),
          sum(when(col("side1"), yd * yd)
            .otherwise(lit(null))).as("syy1"))
        .select(lit(name).as("feature"), col("v"),
          col("n0"), coalesce(col("sy0"), lit(0).cast("decimal(18,2)")).as("sy0"),
          coalesce(col("syy0"), lit(0).cast("decimal(18,4)")).as("syy0"),
          col("n1"), coalesce(col("sy1"), lit(0).cast("decimal(18,2)")).as("sy1"),
          coalesce(col("syy1"), lit(0).cast("decimal(18,4)")).as("syy1"))
    val p2 = prof2(f1Name, col("f1")).unionByName(prof2(f2Name, col("f2")))
    val scan2 = p2
      .withColumn("nl0", sum(col("n0")).over(w1))
      .withColumn("syl0", sum(col("sy0")).over(w1))
      .withColumn("syyl0", sum(col("syy0")).over(w1))
      .withColumn("nl1", sum(col("n1")).over(w1))
      .withColumn("syl1", sum(col("sy1")).over(w1))
      .withColumn("syyl1", sum(col("syy1")).over(w1))
      .withColumn("nt0", sum(col("n0")).over(wt1))
      .withColumn("syt0", sum(col("sy0")).over(wt1))
      .withColumn("syyt0", sum(col("syy0")).over(wt1))
      .withColumn("nt1", sum(col("n1")).over(wt1))
      .withColumn("syt1", sum(col("sy1")).over(wt1))
      .withColumn("syyt1", sum(col("syy1")).over(wt1))
      .filter(col("nl0") + col("nl1") < col("nt0") + col("nt1"))
      .crossJoin(broadcast(win1.select(col("cl1"), col("cr1"))))
    val s2 = scan2
      .withColumn("nld", (col("nl0") + col("nl1")).cast("double"))
      .withColumn("nrd",
        ((col("nt0") - col("nl0")) + (col("nt1") - col("nl1"))).cast("double"))
      .withColumn("sl",
        rS(col("syl0").cast("double"), col("nl0").cast("double"), col("cr1")) +
          rS(col("syl1").cast("double"), col("nl1").cast("double"), col("cl1")))
      .withColumn("sr",
        rS((col("syt0") - col("syl0")).cast("double"),
          (col("nt0") - col("nl0")).cast("double"), col("cr1")) +
          rS((col("syt1") - col("syl1")).cast("double"),
            (col("nt1") - col("nl1")).cast("double"), col("cl1")))
      .withColumn("ssl",
        rSS(col("syyl0").cast("double"), col("syl0").cast("double"),
          col("nl0").cast("double"), col("cr1")) +
          rSS(col("syyl1").cast("double"), col("syl1").cast("double"),
            col("nl1").cast("double"), col("cl1")))
      .withColumn("ssr",
        rSS((col("syyt0") - col("syyl0")).cast("double"),
          (col("syt0") - col("syl0")).cast("double"),
          (col("nt0") - col("nl0")).cast("double"), col("cr1")) +
          rSS((col("syyt1") - col("syyl1")).cast("double"),
            (col("syt1") - col("syl1")).cast("double"),
            (col("nt1") - col("nl1")).cast("double"), col("cl1")))
      .withColumn("sse", round(
        (col("ssl") - col("sl") * col("sl") / col("nld")) +
          (col("ssr") - col("sr") * col("sr") / col("nrd")), 6))
    val win2 = s2.groupBy()
      .agg(min(struct(col("sse"), col("feature"), col("v"), col("sl"),
        col("sr"), col("nld"), col("nrd"))).as("w"))
      .select(col("w.sse").as("sse2"), col("w.feature").as("feat2"),
        col("w.v").as("t2"),
        round(col("w.sl") / col("w.nld"), 9).as("wl2"),
        round(col("w.sr") / col("w.nrd"), 9).as("wr2"))

    // ---- 3-row model table ----
    val r0 = f0row.select(lit(0).as("round"), lit("(const)").as("feature"),
      lit(null).cast("double").as("threshold"), col("f0").as("w_left"),
      col("f0").as("w_right"), col("sst").as("sse"))
    val r1 = win1.select(lit(1).as("round"), col("feat1").as("feature"),
      col("t1").as("threshold"), col("wl1").as("w_left"),
      col("wr1").as("w_right"), col("sse1").as("sse"))
    val r2 = win2.select(lit(2).as("round"), col("feat2").as("feature"),
      col("t2").as("threshold"), col("wl2").as("w_left"),
      col("wr2").as("w_right"), col("sse2").as("sse"))
    r0.unionByName(r1).unionByName(r2)
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import IterCheckpoint.Pinnable

/** Jenks natural breaks (Fisher's exact 1-D k-segmentation): partition a
  * weighted value profile into k contiguous segments minimizing total
  * within-segment squared error — the classical choropleth/histogram
  * binning optimum, solved exactly by dynamic programming.
  *
  * Scale/exactness shape: the raw table reduces to a bounded
  * (value, weight) profile first (the PAVA/stump discipline — the DP
  * never sees raw rows), prefix sums over the profile are exact integer
  * arithmetic, each segment SSE is one fixed-shape double expression on
  * the 9-grid, and every DP level is a bounded pair-join + struct-argmin
  * (smallest split on ties). k is unrolled, so the DuckDB oracle chains
  * k CTE levels and replays bit-for-bit.
  */
object Jenks {

  /** Break `df`'s integer-valued `valueCol` (weighted by row count) into
    * `k` contiguous segments. Returns k rows:
    * (segment, lo, hi, n, mean, sse), ordered by segment.
    */
  def naturalBreaks(df: DataFrame, valueCol: Column, k: Int): DataFrame = {
    require(k >= 2 && k <= 8, s"k must be in [2,8], got $k")
    val prof = df.select(valueCol.cast("long").as("v"))
      .filter(col("v").isNotNull)
      .groupBy(col("v")).agg(count(lit(1)).as("n"))
    val wOrd = Window.orderBy(col("v"))
    val wCum = wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // bounded profile: rank + exact integer prefixes (n, n·v, n·v²)
    val pre = prof
      .withColumn("i", row_number().over(wOrd))
      .withColumn("cn", sum(col("n")).over(wCum))
      .withColumn("cs", sum(col("n") * col("v")).over(wCum))
      .withColumn("css", sum(col("n") * col("v") * col("v")).over(wCum))
      .iterCheckpoint(eager = false)
    val b = pre.count().toInt
    require(b >= k, s"need at least $k distinct values, got $b")
    // prefix-at-j rows keyed by j = i − 1, so j ranges 0..B−1 and
    // SSE(j+1..ii) = hi(ii) − prefix(j) with the j = 0 base present
    val lo = pre.select((col("i") - 1).as("j"),
      (col("cn") - col("n")).as("cn_lo"),
      (col("cs") - col("n") * col("v")).as("cs_lo"),
      (col("css") - col("n") * col("v") * col("v")).as("css_lo"))
    val hi = pre.select(col("i").as("ii"), col("cn").as("cn_hi"),
      col("cs").as("cs_hi"), col("css").as("css_hi"))
    // SSE of bins (j+1 .. ii): css − cs²/cn over the slice, 9-grid
    def sseCol: Column = round(
      (col("css_hi") - col("css_lo")).cast("double") -
        (col("cs_hi") - col("cs_lo")).cast("double") *
        (col("cs_hi") - col("cs_lo")).cast("double") /
        (col("cn_hi") - col("cn_lo")).cast("double"), 9)
    val segs = lo.join(hi, col("ii") >= col("j") + 1)
      .select(col("j"), col("ii"), sseCol.as("sse"))
      .iterCheckpoint(eager = false) // bounded B·(B+1)/2 rows
    // DP levels: D1 = SSE(1..i); Dk[i] = min_j Dk-1[j] + SSE(j+1..i)
    var d = segs.filter(col("j") === 0)
      .select(col("ii").as("i"), col("sse").as("cost"),
        lit(0).as("argj"))
    val levels = scala.collection.mutable.ArrayBuffer(d)
    for (_ <- 2 to k) {
      d = d.select(col("i").as("j"), col("cost").as("pcost"))
        .join(segs, Seq("j"))
        .withColumn("tot", round(col("pcost") + col("sse"), 9))
        .groupBy(col("ii").as("i"))
        .agg(min(struct(col("tot"), col("j"))).as("w"))
        .select(col("i"), col("w.tot").as("cost"), col("w.j").as("argj"))
      levels += d
    }
    // backtrack: from Dk at i = B down the argmins
    var cuts = levels(k - 1).filter(col("i") === b)
      .select(col("i").as(s"c$k"), col("argj").as(s"c${k - 1}"))
    for (lvl <- (k - 1) until 1 by -1) {
      cuts = cuts.join(
        levels(lvl - 1).select(col("i").as(s"c$lvl"),
          col("argj").as(s"c${lvl - 1}")), Seq(s"c$lvl"))
    }
    // segment s spans bin ranks (c_{s-1}+1 .. c_s); report value bounds
    val binV = pre.select(col("i"), col("v"), col("cn"), col("cs"),
      col("css"), col("n"))
    val segRows = (1 to k).map { s0 =>
      struct(lit(s0).as("segment"), col(s"c${s0 - 1}").as("jlo"),
        col(s"c$s0").as("jhi"))
    }
    val ranges = cuts.withColumn("c0", lit(0))
      .select(explode(array(segRows: _*)).as("r"))
      .select(col("r.segment"), col("r.jlo"), col("r.jhi"))
    val loJ = binV.select(col("i").as("jlo"), col("cn").as("cn_lo"),
      col("cs").as("cs_lo"), col("css").as("css_lo"))
      .unionByName(ranges.sparkSession.range(1)
        .select(lit(0).as("jlo"), lit(0L).as("cn_lo"), lit(0L).as("cs_lo"),
          lit(0L).as("css_lo")))
    val hiJ = binV.select(col("i").as("jhi"), col("v").as("hi_v"),
      col("cn").as("cn_hi"), col("cs").as("cs_hi"), col("css").as("css_hi"))
    val loV = binV.select((col("i") - 1).as("jlo"), col("v").as("lo_v"))
    ranges.join(loJ, Seq("jlo")).join(hiJ, Seq("jhi")).join(loV, Seq("jlo"))
      .select(col("segment"), col("lo_v"), col("hi_v"),
        (col("cn_hi") - col("cn_lo")).as("n"),
        round((col("cs_hi") - col("cs_lo")).cast("double") /
          (col("cn_hi") - col("cn_lo")).cast("double"), 6).as("mean"),
        round(sseCol, 6).as("sse"))
      .orderBy(col("segment"))
  }
}

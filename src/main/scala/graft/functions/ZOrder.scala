package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering keys: interleave the bits of several
  * non-negative integer dimensions into one BIGINT address, so that sorting
  * or range-partitioning by the address co-locates rows that are close in
  * EVERY dimension at once.
  *
  * The 100 TB layout lever behind it: parquet min/max statistics prune by
  * file/row-group. A table sorted by one column skips scans only for
  * predicates on that column; written in z-order
  * (`repartitionByRange($"z") .sortWithinPartitions($"z")`), each file
  * covers a tight range of every interleaved dimension, so selective
  * predicates on ANY of them skip most files (ZOrderSpec quantifies this
  * against a single-column sort). Pure bit arithmetic — whole-stage codegen,
  * no shuffle, and exactly replayable in SQL for the q3k oracle.
  */
object ZOrder {

  /** Morton address of `cols`: bit b of dimension d lands at position
    * b × nDims + d. Dimensions must be non-negative and fit `bitsPerDim`
    * bits — higher bits are silently dropped (pre-scale or clamp wider
    * domains; [[quantileBins]] maps arbitrary numerics into range).
    */
  def interleave(cols: Seq[Column], bitsPerDim: Int): Column = {
    val n = cols.size
    require(n >= 1, "interleave needs at least one dimension")
    require(bitsPerDim >= 1 && n * bitsPerDim <= 63,
      s"$n dims × $bitsPerDim bits must fit a positive BIGINT (≤ 63 bits)")
    val terms =
      for { b <- 0 until bitsPerDim; (c, d) <- cols.zipWithIndex }
        yield shiftleft(shiftright(c.cast("long"), b).bitwiseAND(lit(1L)),
          b * n + d)
    terms.reduce(_ + _)
  }

  /** The same bit arithmetic as ANSI SQL (DuckDB-ready), for oracle
    * replay: `((CAST(col AS BIGINT) >> b) & 1) << (b·n + d)` summed.
    */
  def interleaveSql(cols: Seq[String], bitsPerDim: Int): String = {
    val n = cols.size
    (for { b <- 0 until bitsPerDim; (c, d) <- cols.zipWithIndex }
      yield s"(((CAST($c AS BIGINT) >> $b) & 1) << ${b * n + d})")
      .mkString(" + ")
  }

  /** Literal quantile boundaries for mapping an arbitrary numeric column
    * into [0, nBins) before interleaving: one driver-side approxQuantile
    * per dimension (bounded work, like centroid/hyperplane metadata), then
    * [[binByBoundaries]] is a narrow codegen CASE ladder — no window, no
    * global sort, no shuffle.
    */
  def quantileBins(
      df: org.apache.spark.sql.DataFrame, colName: String, nBins: Int,
      relativeError: Double = 0.001): Array[Double] = {
    require(nBins >= 2, s"nBins must be ≥ 2, got $nBins")
    df.stat.approxQuantile(colName,
      (1 until nBins).map(_.toDouble / nBins).toArray, relativeError)
  }

  /** Bin index in [0, boundaries.length] from ascending literal boundaries
    * (value ≤ boundaries(i) → first such bin i).
    */
  def binByBoundaries(c: Column, boundaries: Array[Double]): Column =
    boundaries.zipWithIndex.reverse.foldLeft(lit(boundaries.length)) {
      case (acc, (bound, i)) => when(c.cast("double") <= bound, lit(i)).otherwise(acc)
    }
}

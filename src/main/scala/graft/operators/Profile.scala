package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-column data-quality profiling (the Deequ-style "data card" pass a
  * training pipeline runs before trusting a new corpus snapshot): row
  * count, null count, exact distinct count and min/max per column, one row
  * per profiled column.
  *
  * Output schema (one row per column, `column` ordered as requested):
  * (column, n, n_null, n_distinct, min_num, max_num, min_str, max_str) —
  * numeric columns fill the `_num` pair (as DOUBLE, the stored values
  * themselves so no formatting is involved), string/date columns fill the
  * `_str` pair (dates via ISO cast, identical in Spark and DuckDB). The
  * split exists because float→string rendering is NOT cross-engine
  * replayable (shortest-repr vs %g — the q36 lesson) while the values
  * themselves are.
  *
  * Scale shape: ONE aggregation pass over the table — all per-column
  * aggregates ride the same partial-agg tree, and the result is K scalar
  * rows assembled driver-side (profile metadata, never data). Exact
  * distinct counts make the pass a multi-distinct expand (K× the scan in
  * shuffle rows); at 100 TB swap in approx_count_distinct or the auditable
  * [[HllSketch]] — the profile contract keeps the exact version because
  * the DuckDB oracle replays it value-for-value.
  */
object Profile {

  private def isNumeric(dt: DataType): Boolean = dt match {
    case _: NumericType => true
    case _ => false
  }

  def tableProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val schema = df.schema
    cols.foreach(c => require(schema.fieldNames.contains(c), s"no such column: $c"))

    val aggs = cols.flatMap { c =>
      val dt = schema(c).dataType
      val base = Seq(
        count(lit(1)).as(s"__n_$c"),
        count(when(col(c).isNull, lit(1))).as(s"__nn_$c"),
        count_distinct(col(c)).as(s"__nd_$c"))
      if (isNumeric(dt))
        base ++ Seq(min(col(c)).cast("double").as(s"__min_$c"),
          max(col(c)).cast("double").as(s"__max_$c"))
      else
        base ++ Seq(min(col(c).cast("string")).as(s"__min_$c"),
          max(col(c).cast("string")).as(s"__max_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()

    val spark = df.sparkSession
    import spark.implicits._
    cols.map { c =>
      val dt = schema(c).dataType
      val n = row.getAs[Long](s"__n_$c")
      val nn = row.getAs[Long](s"__nn_$c")
      val nd = row.getAs[Long](s"__nd_$c")
      if (isNumeric(dt))
        (c, n, nn, nd,
          Option(row.getAs[java.lang.Double](s"__min_$c")).map(_.doubleValue),
          Option(row.getAs[java.lang.Double](s"__max_$c")).map(_.doubleValue),
          Option.empty[String], Option.empty[String])
      else
        (c, n, nn, nd, Option.empty[Double], Option.empty[Double],
          Option(row.getAs[String](s"__min_$c")),
          Option(row.getAs[String](s"__max_$c")))
    }.toDF("column", "n", "n_null", "n_distinct",
      "min_num", "max_num", "min_str", "max_str")
  }

  /** Mergeable per-column state for the STREAMING data card: counts ADD
    * (the CMS exactly-once contract), extremes MERGE (idempotent), and
    * distinct tracking rides [[HllSketch]] register max-merge (idempotent,
    * ≤ 1024 ints per column) — exact distinct is the one [[tableProfile]]
    * statistic with no bounded-state merge, so the streaming card reports
    * the auditable HLL estimate instead.
    */
  final class ColumnState {
    var n: Long = 0L
    var nNull: Long = 0L
    var minNum: Option[Double] = None
    var maxNum: Option[Double] = None
    var minStr: Option[String] = None
    var maxStr: Option[String] = None
    val hll: scala.collection.mutable.Map[Int, Int] =
      scala.collection.mutable.Map.empty
  }

  /** Fold one micro-batch into the accumulated card: one aggregation pass
    * for counts/extremes plus one HLL register pass per column (keys =
    * xxhash64 of the non-null values, so every type funnels through one
    * sketch contract). Driver state per column: 6 scalars + ≤ 1024 ints.
    */
  def mergeBatchProfile(
      acc: scala.collection.mutable.Map[String, ColumnState],
      df: DataFrame, cols: Seq[String]): Unit = {
    require(cols.nonEmpty, "profile needs at least one column")
    val schema = df.schema
    cols.foreach(c => require(schema.fieldNames.contains(c), s"no such column: $c"))
    val aggs = cols.flatMap { c =>
      val dt = schema(c).dataType
      val base = Seq(
        count(lit(1)).as(s"__n_$c"),
        count(when(col(c).isNull, lit(1))).as(s"__nn_$c"))
      if (isNumeric(dt))
        base ++ Seq(min(col(c)).cast("double").as(s"__min_$c"),
          max(col(c)).cast("double").as(s"__max_$c"))
      else
        base ++ Seq(min(col(c).cast("string")).as(s"__min_$c"),
          max(col(c).cast("string")).as(s"__max_$c"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    cols.foreach { c =>
      val st = acc.getOrElseUpdate(c, new ColumnState)
      st.n += row.getAs[Long](s"__n_$c")
      st.nNull += row.getAs[Long](s"__nn_$c")
      def mergeOpt[T](cur: Option[T], v: Option[T], pick: (T, T) => T): Option[T] =
        (cur, v) match {
          case (Some(a), Some(b)) => Some(pick(a, b))
          case (a, b) => a.orElse(b)
        }
      if (isNumeric(schema(c).dataType)) {
        val mn = Option(row.getAs[java.lang.Double](s"__min_$c")).map(_.doubleValue)
        val mx = Option(row.getAs[java.lang.Double](s"__max_$c")).map(_.doubleValue)
        st.minNum = mergeOpt[Double](st.minNum, mn, math.min(_, _))
        st.maxNum = mergeOpt[Double](st.maxNum, mx, math.max(_, _))
      } else {
        val mn = Option(row.getAs[String](s"__min_$c"))
        val mx = Option(row.getAs[String](s"__max_$c"))
        st.minStr = mergeOpt[String](st.minStr, mn, (a, b) => if (a <= b) a else b)
        st.maxStr = mergeOpt[String](st.maxStr, mx, (a, b) => if (a >= b) a else b)
      }
      // nulls filtered BEFORE hashing: xxhash64(null) is the seed, not null
      HllSketch.mergeRegisters(st.hll,
        HllSketch.registers(
          df.filter(col(c).isNotNull).select(xxhash64(col(c)).as("__k")), "__k"))
    }
  }

  /** The accumulated card as a DataFrame — [[tableProfile]]'s shape with
    * `est_distinct` (the HLL estimate, a double) in place of the exact
    * `n_distinct`. Streaming and batch share the estimate arithmetic via
    * [[HllSketch.estimate]].
    */
  def imageToProfile(
      spark: SparkSession,
      acc: scala.collection.Map[String, ColumnState]): DataFrame = {
    import spark.implicits._
    acc.toSeq.sortBy(_._1).map { case (c, st) =>
      val est = HllSketch.estimate(HllSketch.imageToRegisters(spark, st.hll))
        .collect()(0).getAs[Double]("est_distinct")
      (c, st.n, st.nNull, est, st.minNum, st.maxNum, st.minStr, st.maxStr)
    }.toDF("column", "n", "n_null", "est_distinct",
      "min_num", "max_num", "min_str", "max_str")
  }

  /** Join-key skew diagnostic — the data-ops question behind every slow
    * shuffle: how concentrated is this key? Emits the `topK` heaviest
    * keys (count + corpus share) with three distribution-wide summary
    * columns repeated per row: `n_keys`, `total`, and the Shannon
    * `entropy` of the key distribution in nats (ln parity is
    * cross-engine-proven; each −p·ln p term snaps to the 9-grid and
    * accumulates in DECIMAL(28,9), the q3j surprisal recipe, so the sum
    * is order-free).
    *
    * Shape at scale: one map-side-combinable count per key, then (a) a
    * TakeOrderedAndProject top-k heap and (b) a second linear aggregate
    * over the key-count table for the summary — never a window over raw
    * rows, never a collect. Null keys count as a key (skew diagnosis
    * must see the null bucket — it is usually the problem).
    */
  def keySkew(df: DataFrame, keyCol: String, topK: Int): DataFrame = {
    require(topK > 0, s"topK must be positive, got $topK")
    require(df.columns.contains(keyCol), s"column $keyCol missing")
    val counts = df.groupBy(col(keyCol).as("key"))
      .agg(count(lit(1)).as("cnt"))
    val tot = counts.agg(sum(col("cnt")).as("__t"))
    val p = col("cnt").cast("double") / col("__t").cast("double")
    val summary = counts.crossJoin(broadcast(tot))
      .agg(
        count(lit(1)).as("n_keys"),
        max(col("__t")).as("total"),
        sum(round(-p * log(p), 9).cast("decimal(28,9)")).as("__h"))
      .select(col("n_keys"), col("total"),
        round(col("__h").cast("double"), 6).as("entropy"))
    counts
      .orderBy(col("cnt").desc, col("key"))
      .limit(topK)
      .crossJoin(broadcast(summary))
      .select(col("key").as(keyCol), col("cnt"),
        round(col("cnt").cast("double") / col("total"), 6).as("share"),
        col("n_keys"), col("total"), col("entropy"))
  }
}

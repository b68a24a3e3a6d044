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

  def tableProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profile needs at least one column")
    val schema = df.schema
    cols.foreach(c => require(schema.fieldNames.contains(c), s"no such column: $c"))

    def isNumeric(dt: DataType): Boolean = dt match {
      case _: NumericType => true
      case _ => false
    }

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
}

package graft

import graft.queries.{AnalyticsQueries, AppliedQueries, EventQueries, Q, RelationalQueries, SciQueries, StatQueries, TextQueries, VectorQueries}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every implemented operator from SURVEY.md §2 is declared here as a named
  * query; those expressible in ANSI SQL carry a DuckDB oracle for the
  * driver's hash-match correctness gate, the rest get rows-only checks and
  * ScalaTest coverage.
  */
object SparkEntry {

  val all: Map[String, Q] =
    RelationalQueries.defs ++ TextQueries.defs ++ VectorQueries.defs ++
      EventQueries.defs ++ AnalyticsQueries.defs ++ SciQueries.defs ++
      StatQueries.defs ++ AppliedQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Exact cosine top-k through the codegen'd CosineSimilarity expression.
    */
  def entry(spark: SparkSession): DataFrame =
    all("q30_ann_topk").fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, q) => k -> q.fn }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.collect { case (k, q) if q.oracle.isDefined => k -> q.oracle.get.trim }

  /** The benchmark headline set (Bench.scala). */
  def headline: Seq[String] =
    all.collect { case (k, q) if q.headline => k }.toSeq.sorted
}

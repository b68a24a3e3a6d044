package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

package object queries {
  /** One engine query: the Spark implementation, an optional DuckDB oracle
    * (exact hash-match contract — column names/types/order-by must agree),
    * and whether it belongs in the per-round benchmark headline set.
    */
  final case class Q(
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String],
      headline: Boolean = false)
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-resilient aggregation building blocks for 100 TB runs. */
object ScaleOps {

  /** Exact distinct count per key without per-key distinct-set state:
    * phase 1 collapses (key, value) pairs (map-side combine sheds
    * duplicates early), phase 2 counts survivors per key. Unlike
    * `countDistinct`, no task ever holds a large distinct set for a hot key.
    */
  def exactDistinctCount(
      df: DataFrame, keyCols: Seq[String], valueCol: Column,
      as: String = "n_distinct"): DataFrame =
    df.select((keyCols.map(col) :+ valueCol.as("__v")): _*)
      .groupBy((keyCols.map(col) :+ col("__v")): _*)
      .agg(count(lit(1)).as("__dup"))
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as(as))

  /** Two-phase salted sum for pathologically hot keys: phase 1 aggregates
    * (key, salt) — spreading one hot key over `salts` reducers — phase 2
    * combines partials. Results are identical to a direct sum for any salt
    * assignment; `spark_partition_id` needs no extra column or randomness.
    */
  def saltedSum(
      df: DataFrame, keyCols: Seq[String], valueCol: Column,
      salts: Int = 32, as: String = "sum"): DataFrame =
    df.withColumn("__salt", pmod(spark_partition_id(), lit(salts)))
      .groupBy((keyCols.map(col) :+ col("__salt")): _*)
      .agg(sum(valueCol).as("__partial"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("__partial")).as(as))
}

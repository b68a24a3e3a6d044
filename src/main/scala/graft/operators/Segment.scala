package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Customer/key segmentation over rank statistics — RFM quintile scoring
  * and ABC (Pareto) classification. Both are *global*-rank shaped, the
  * classic way to sneak a one-partition window into a pipeline; here every
  * global ordering rides [[ScaleOps.globalNtile]] /
  * [[ScaleOps.globalRunningSum]] (range-repartition + bounded
  * per-partition offset images), so the shape survives a 10^9-key table.
  *
  * Reference provenance: the-hive exposes no segmentation; these are the
  * standard marketing-analytics operators a training-data/BI pipeline
  * needs (SURVEY.md §2.12 north star), defined from their textbook
  * formulations.
  */
object Segment {

  /** RFM scores per key from an order-grain table: recency = max event
    * time, frequency = row count, monetary = exact DECIMAL sum of
    * `valueCol`. Each score is NTILE(`k`) over (metric DESC, key) — score
    * 1 is the top quintile — with the key as unique tiebreak so every
    * global numbering is deterministic. `valueCol` must be DECIMAL for an
    * exact monetary sum; the output `monetary` is its DOUBLE image.
    */
  def rfm(df: DataFrame, keyCol: String, tsCol: Column, valueCol: Column,
      k: Int = 5): DataFrame = {
    val base = df.groupBy(col(keyCol))
      .agg(max(tsCol).as("recency_ms"), count(lit(1)).as("frequency"),
        sum(valueCol).as("__mon"))
    val scored = Seq(
      ("r_score", "recency_ms"), ("f_score", "frequency"), ("m_score", "__mon")
    ).foldLeft(base) { case (acc, (score, metric)) =>
      ScaleOps.globalNtile(acc, Seq(col(metric).desc, col(keyCol)), k, score)
    }
    scored
      .withColumn("monetary", col("__mon").cast("double"))
      .withColumn("segment",
        (col("r_score") * 100 + col("f_score") * 10 + col("m_score")).cast("int"))
      .drop("__mon")
  }

  /** ABC / Pareto classification: keys ordered by `valueCol` DESC (key
    * tiebreak), exact DECIMAL cumulative value via the distributed running
    * sum, share = cum/total in DOUBLE rounded to 6, class A while the
    * rounded share is ≤ `cutA`, B while ≤ `cutB`, else C. The total is one
    * scalar aggregate job (a bounded driver action), injected as an exact
    * DECIMAL literal so both engines divide the same doubles. Input is one
    * row per key with a DECIMAL `valueCol`.
    */
  def abcClassify(df: DataFrame, keyCols: Seq[String], valueCol: Column,
      cutA: Double = 0.8, cutB: Double = 0.95): DataFrame = {
    val sort = valueCol.desc +: keyCols.map(col)
    val cum = ScaleOps.globalRunningSum(df, sort, valueCol, "__cum")
    val total = df.agg(sum(valueCol)).collect()(0).getDecimal(0)
    cum
      .withColumn("cum_value", col("__cum").cast("double"))
      .withColumn("value_share",
        round(col("__cum").cast("double") / lit(total).cast("double"), 6))
      .withColumn("abc_class",
        when(col("value_share") <= cutA, "A")
          .when(col("value_share") <= cutB, "B")
          .otherwise("C"))
      .drop("__cum")
  }
}

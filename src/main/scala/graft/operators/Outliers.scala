package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Density-based outlier scoring: Local Outlier Factor (Breunig et al.,
  * SIGMOD 2000) over an embedding panel, as pure relational algebra.
  *
  * This exact all-pairs formulation REQUIRES a bounded panel (hundreds to
  * low thousands of points) — the q91/q31 bounded-slice contract. The
  * 100 TB path swaps the all-pairs stage for LSH-bucketed candidate
  * pairs (the q90 mutual-NN recipe): every later stage (k-dist, reach,
  * lrd, lof) only consumes the kNN lists, whose size is points × k.
  *
  * Determinism: the variant pins the neighborhood to EXACTLY k neighbors
  * with (distance, id) tie-break — the classical definition extends the
  * set through distance ties; with 9-decimal rounded distances over
  * continuous embeddings, ties occur only at exact duplicates, where the
  * id tie-break keeps both engines on the same set. Distances snap to
  * the 9-decimal grid, per-neighborhood sums ride DECIMAL(28,12), and
  * lrd/lof are fixed-shape divisions, so the oracle replays hash-exact.
  */
object Outliers {

  /** LOF over `points` (idCol, vecCol ARRAY<FLOAT>). Returns one row per
    * point: (id, kdist, lrd, lof), lof rounded to 6.
    */
  def lof(points: DataFrame, idCol: String, vecCol: String,
      k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val a = points.select(col(idCol).as("a_id"), col(vecCol).as("av"))
    val b = points.select(col(idCol).as("b_id"), col(vecCol).as("bv"))
    val pairs = a.join(b, col("a_id") =!= col("b_id"))
      .select(col("a_id"), col("b_id"),
        round(sqrt(VectorFunctions.l2Sq(col("av"), col("bv"))), 9).as("d"))
    val w = Window.partitionBy(col("a_id")).orderBy(col("d"), col("b_id"))
    val knn = pairs.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= k)
      .localCheckpoint(eager = false) // one shuffle, three consumers
    val kdist = knn.groupBy(col("a_id")).agg(max(col("d")).as("kdist"))
    // reach(a ← b) = max(kdist(b), d(a, b)); lrd(a) = k / Σ reach
    val reach = knn
      .join(kdist.select(col("a_id").as("b_id"), col("kdist").as("kdist_b")),
        Seq("b_id"))
      .withColumn("reach", greatest(col("kdist_b"), col("d")))
    val lrd = reach.groupBy(col("a_id"))
      .agg(sum(col("reach").cast("decimal(28,12)")).as("rsum"))
      .select(col("a_id"),
        round(lit(k.toDouble) / col("rsum").cast("double"), 9).as("lrd"))
    val lofScore = knn
      .join(lrd.select(col("a_id").as("b_id"), col("lrd").as("lrd_b")),
        Seq("b_id"))
      .groupBy(col("a_id"))
      .agg(sum(col("lrd_b").cast("decimal(28,12)")).as("lsum"))
      .join(lrd, Seq("a_id"))
      .select(col("a_id"),
        round(col("lsum").cast("double") / lit(k.toDouble) / col("lrd"), 6)
          .as("lof"))
    kdist.join(lrd, Seq("a_id")).join(lofScore, Seq("a_id"))
      .select(col("a_id").as("id"), col("kdist"), col("lrd"), col("lof"))
  }
}

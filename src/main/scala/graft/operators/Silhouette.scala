package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Silhouette scores (Rousseeuw 1987) for a clustering over an
  * embedding panel, cosine-distance variant: s(i) = (b − a)/max(a, b)
  * with a = mean distance to own cluster, b = the closest other
  * cluster's mean distance. The clustering-quality acceptance number
  * for the k-means / SemDeDup family.
  *
  * Contract: `points` is the bounded AUDIT SAMPLE (the q31/q91
  * bounded-panel discipline — assignments come from the full corpus,
  * the O(n²) silhouette runs on the sample). Distances are
  * 1 − round(cos, 6) (exact 6-decimal values), per-point sums ride
  * DECIMAL(28,12), per-cluster means are single divisions on the
  * 9-grid — hash-exact in the oracle replay. Singletons score 0 by the
  * standard convention.
  */
object Silhouette {

  /** Per-cluster silhouette summary over `points` (idCol, vecCol
    * ARRAY<FLOAT>, cellCol). Returns one row per cluster:
    * (cell, n, mean_silhouette), mean over round(s_i, 6) rounded to 6.
    */
  def cosineSilhouette(points: DataFrame, idCol: String, vecCol: String,
      cellCol: String): DataFrame = {
    val a = points.select(col(idCol).as("ai"), col(vecCol).as("av"),
      col(cellCol).as("ac"))
    val b = points.select(col(idCol).as("bi"), col(vecCol).as("bv"),
      col(cellCol).as("bc"))
    val pairs = a.join(b, col("ai") =!= col("bi"))
      .select(col("ai"), col("ac"), col("bc"),
        (lit(1.0) - round(VectorFunctions.cosine(col("av"), col("bv")), 6))
          .as("d"))
      .localCheckpoint(eager = false)
    val sizes = points.groupBy(col(cellCol).as("ac"))
      .agg(count(lit(1)).as("n_c"))
    val own = pairs.filter(col("ac") === col("bc"))
      .groupBy(col("ai"), col("ac"))
      .agg(sum(col("d").cast("decimal(28,12)")).as("sd"),
        count(lit(1)).as("nd"))
      .select(col("ai"), col("ac"),
        round(col("sd").cast("double") / col("nd").cast("double"), 9)
          .as("a_mean"))
    val other = pairs.filter(col("ac") =!= col("bc"))
      .groupBy(col("ai"), col("ac"), col("bc"))
      .agg(sum(col("d").cast("decimal(28,12)")).as("sd"),
        count(lit(1)).as("nd"))
      .select(col("ai"), col("ac"),
        round(col("sd").cast("double") / col("nd").cast("double"), 9)
          .as("o_mean"))
      .groupBy(col("ai"), col("ac"))
      .agg(min(col("o_mean")).as("b_mean"))
    val scored = points.select(col(idCol).as("ai"), col(cellCol).as("ac"))
      .join(sizes, Seq("ac"))
      .join(own, Seq("ai", "ac"), "left")
      .join(other, Seq("ai", "ac"), "left")
      .withColumn("s",
        when(col("n_c") === 1, lit(0.0))
          // single-cluster panel: b_mean is null for every non-singleton
          // point (no other cluster exists). greatest() SKIPS null
          // operands, so without this branch s would go null and the
          // cluster mean would silently divide by the wrong denominator —
          // score 0 explicitly (no between-cluster evidence).
          .when(col("b_mean").isNull, lit(0.0))
          .when(greatest(col("a_mean"), col("b_mean")) > 0,
            round((col("b_mean") - col("a_mean")) /
              greatest(col("a_mean"), col("b_mean")), 6))
          .otherwise(lit(0.0)))
    scored.groupBy(col("ac").as("cell"))
      .agg(count(lit(1)).as("n"),
        round(sum(col("s").cast("decimal(28,12)")).cast("double") /
          count(lit(1)).cast("double"), 6).as("mean_silhouette"))
  }
}

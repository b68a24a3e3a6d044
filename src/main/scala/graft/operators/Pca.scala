package graft.operators

import java.math.{MathContext, RoundingMode}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import IterCheckpoint.Pinnable

/** Top principal direction of an embedding matrix by deterministic power
  * iteration — the PCA-lite every embedding-space curation step leans on
  * (ABBA-style whitening, anisotropy diagnostics, dominant-direction
  * removal before cosine dedup).
  *
  * v ← Xᵀ(Xv) / ‖·‖ without ever materializing the d×d Gram matrix: per
  * iteration one broadcast join (row dot v — the 64-row direction vector
  * rides the task closure), one shuffle by row id, one 64-group
  * aggregation. The only driver state is the d-vector itself — the same
  * bounded-index discipline as IVF centroids. The exploded (id, pos, x)
  * table is localCheckpointed once and reused across iterations.
  *
  * Oracle-exact by the q4b/q4y recipe lifted to vectors: every
  * data-dependent sum runs in DECIMAL(28,12) (order-free), every derived
  * scalar snaps to the 9-decimal double grid, max-normalization keeps all
  * squared terms inside the double↔decimal agreement bound, and the only
  * transcendental is sqrt (cross-engine parity proven; exp is NOT, and is
  * not used).
  */
object Pca {

  private def snap(x: Double, scale: Int): Double =
    java.math.BigDecimal.valueOf(x)
      .setScale(scale, RoundingMode.HALF_UP).doubleValue()

  /** Decimal(28,12)-exact driver-side sum of already-snapped doubles —
    * mirrors SUM(CAST(x AS DECIMAL(28,12))) bit-for-bit.
    */
  private def decSum(xs: Iterable[Double]): Double =
    xs.foldLeft(java.math.BigDecimal.ZERO) { (acc, x) =>
      acc.add(java.math.BigDecimal.valueOf(x)
        .setScale(12, RoundingMode.HALF_UP))
    }.round(new MathContext(28)).doubleValue()

  /** The dominant right-singular direction of the n×d matrix in `vecCol`
    * after `iters` power-iteration rounds, plus the singular-value-squared
    * estimate `sigma` (= ‖XᵀXv‖, identical on every row).
    *
    * Output: (`dim` 1-based INT, `component` DOUBLE, `sigma` DOUBLE),
    * d rows. Rows whose vector is null or not `dim`-long are dropped.
    */
  def topComponent(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      iters: Int): DataFrame = {
    require(dim >= 1, s"dim must be positive, got $dim")
    require(iters >= 1, s"iters must be positive, got $iters")
    val spark = df.sparkSession
    import spark.implicits._

    val ex = df
      .filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(col(idCol).as("id"),
        posexplode(col(vecCol)).as(Seq("pos0", "xf")))
      .select(col("id"), (col("pos0") + 1).as("pos"),
        col("xf").cast("double").as("x"))
      .iterCheckpoint()

    var v: Map[Int, Double] =
      (1 to dim).map(p => p -> snap(1.0 / math.sqrt(dim.toDouble), 9)).toMap
    var m = 0.0
    var norm = 0.0

    for (_ <- 1 to iters) {
      val vdf = v.toSeq.sortBy(_._1).toDF("pos", "val")
      // c_i = round9(Σ_p x_ip · v_p)  — order-free decimal sum
      val c = ex.join(broadcast(vdf), "pos")
        .groupBy("id")
        .agg(round(sum((col("x") * col("val")).cast("decimal(28,12)"))
          .cast("double"), 9).as("c"))
      // s_p = round9(Σ_i x_ip · c_i)
      val s = ex.join(c, "id")
        .groupBy("pos")
        .agg(round(sum((col("x") * col("c")).cast("decimal(28,12)"))
          .cast("double"), 9).as("s"))
        .collect()
        .map(r => r.getInt(0) -> r.getDouble(1))
        .toMap
      // bounded d-vector finish on the driver, same grid arithmetic as
      // the SQL oracle: max-normalize (keeps u² ≤ 1 inside the decimal
      // agreement bound), L2-normalize, snap each step.
      m = s.valuesIterator.map(math.abs).max
      require(m > 0.0, "power iteration collapsed to the zero vector")
      val u = s.map { case (p, x) => p -> snap(x / m, 9) }
      norm = snap(math.sqrt(decSum(u.values.map(x => x * x))), 9)
      v = u.map { case (p, x) => p -> snap(x / norm, 9) }
    }

    val sigma = snap(m * norm, 6)
    v.toSeq.sortBy(_._1)
      .map { case (p, x) => (p, x, sigma) }
      .toDF("dim", "component", "sigma")
  }

  /** Per-row projection diagnostics against a fixed unit `direction`
    * (1-based dim → component, e.g. [[topComponent]]'s output): the
    * projection coefficient ⟨x, v⟩ and the L2 norms before and after
    * removing the component (w = x − ⟨x,v⟩·v) — the whitening /
    * anisotropy numbers (how much of each embedding the dominant
    * direction explains).
    *
    * Same decimal-grid arithmetic as the iteration: coefficient snapped
    * to 9 decimals (emitted as-is — re-rounding a 9-grid value to 6
    * decimals can land on an exact tie where engines' double ROUND rules
    * diverge), norms through order-free DECIMAL(28,12) square sums with
    * sqrt-snap to 6. Two shuffles by row id, d-row broadcast, no collect.
    */
  def projectionStats(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      direction: Map[Int, Double]): DataFrame = {
    require(direction.size == dim, s"direction must have $dim components")
    val spark = df.sparkSession
    import spark.implicits._

    val ex = df
      .filter(col(vecCol).isNotNull && size(col(vecCol)) === dim)
      .select(col(idCol).as("id"),
        posexplode(col(vecCol)).as(Seq("pos0", "xf")))
      .select(col("id"), (col("pos0") + 1).as("pos"),
        col("xf").cast("double").as("x"))

    val vdf = broadcast(direction.toSeq.sortBy(_._1).toDF("pos", "val"))
    val withV = ex.join(vdf, "pos")
    val head = withV.groupBy("id")
      .agg(
        round(sum((col("x") * col("val")).cast("decimal(28,12)"))
          .cast("double"), 9).as("coef"),
        round(sqrt(sum((col("x") * col("x")).cast("decimal(28,12)"))
          .cast("double")), 6).as("norm_before"))
    val w = col("x") - col("coef") * col("val")
    val after = withV.join(head.select("id", "coef"), "id")
      .groupBy("id")
      .agg(round(sqrt(sum((w * w).cast("decimal(28,12)"))
        .cast("double")), 6).as("norm_after"))
    head.join(after, "id")
      .select(col("id").as(idCol), col("coef"),
        col("norm_before"), col("norm_after"))
  }
}

package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** HyperLogLog distinct counting (Flajolet et al. 2007), built from scratch
  * on the splitmix64 family so every register — and therefore the estimate —
  * replays exactly in the DuckDB oracle (Spark's own approx_count_distinct
  * is HLL++ with an opaque hash; this one is deterministic and auditable).
  *
  * The 100 TB shape is the same bounded-shuffle story as [[CmSketch]]: the
  * register table is ≤ m rows per partition after map-side max-combine
  * (`groupBy(bucket).max` — partial aggregation collapses a partition's
  * rows to its register image before the wire), so cardinality questions
  * over 10¹⁰-key spaces shuffle kilobytes. Registers are mergeable across
  * corpora by the same max.
  *
  * Determinism contract: rho is an exact integer (bit length of the
  * post-bucket hash remainder); Z sums the dyadic register terms as the
  * exact scaled integer Σ 2^(55−rho) (DECIMAL(38,0) — never a float sum),
  * and the estimate is a fixed literal-for-literal double expression with
  * the small-range ln correction (ln parity per q3y/q38).
  */
object HllSketch {

  val P = 10
  val M: Int = 1 << P                   // 1024 registers
  private val WBits = 64 - P            // hash bits left after the bucket
  private[graft] val RhoEmpty = WBits + 1 // rho when the remainder is 0

  private[graft] val Seed: Long =
    graft.functions.TextHashing.mix64(0x9e3779b97f4a7c15L * 7)

  /** alpha_m · m² for m = 1024 — spelled in the exact operation order the
    * oracle uses, so both engines hold the same double.
    */
  private[graft] val AlphaM2: Double =
    0.7213 / (1.0 + 1.079 / 1024.0) * 1024.0 * 1024.0

  private[graft] def bucketRho(key: Long): (Int, Int) = {
    val h = graft.functions.TextHashing.mix64(key ^ Seed)
    val bucket = (h & (M - 1)).toInt
    val w = h >>> P
    val rho = if (w == 0) RhoEmpty else WBits - (64 - java.lang.Long.numberOfLeadingZeros(w)) + 1
    (bucket, rho)
  }

  /** Register table (bucket, rho = max rank) over `df`'s long-castable
    * `keyCol`; null keys skipped, empty buckets absent (readers treat
    * missing as 0).
    */
  def registers(df: DataFrame, keyCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(keyCol).cast("long")).filter(col(keyCol).isNotNull).as[Long]
      .map(bucketRho)
      .toDF("bucket", "rho")
      .groupBy("bucket").agg(max(col("rho")).as("rho"))
  }

  /** Streaming twin: fold one micro-batch's register table into an
    * accumulated register image (max per bucket). The collect is bounded
    * by M = 1024 rows BY CONSTRUCTION (the IvfIndex-centroid class of
    * driver state, not a data-sized collect), so incremental cardinality
    * over an unbounded stream carries ≤ M integers of state per sketch —
    * use from `foreachBatch`, then [[imageToRegisters]] + [[estimate]]
    * for the same arithmetic path as the batch twin.
    */
  def mergeRegisters(acc: scala.collection.mutable.Map[Int, Int],
      regs: DataFrame): Unit =
    regs.collect().foreach { r =>
      val b = r.getInt(0); val rho = r.getInt(1)
      if (rho > acc.getOrElse(b, 0)) acc(b) = rho
    }

  /** An accumulated image back as a register DataFrame (feeds [[estimate]]
    * so streaming and batch share every arithmetic step).
    */
  def imageToRegisters(spark: org.apache.spark.sql.SparkSession,
      acc: scala.collection.Map[Int, Int]): DataFrame = {
    import spark.implicits._
    acc.toSeq.toDF("bucket", "rho")
  }

  /** One-row estimate from a register table: (z_scaled, v, est_distinct).
    * z_scaled = Σ 2^(55−rho) over all m registers (empty ⇒ 2^55) as an
    * exact integer; v = empty-register count; est = alpha·m²·2^55/Z with
    * the small-range correction m·ln(m/v) when v > 0 and the raw estimate
    * is ≤ 2.5m. All arithmetic shapes mirror the oracle literal-for-literal.
    */
  def estimate(regs: DataFrame): DataFrame =
    zsAndV(regs.agg(znAndNonempty.head, znAndNonempty.tail: _*))
      .select(
        col("zs").cast("double").as("z_scaled"),
        col("v"),
        estExpr.as("est_distinct"))

  /** Per-group register table (g, bucket, rho) — the auditable
    * `approx_count_distinct ... GROUP BY` shape. Same bounded-shuffle
    * economics per group; registers of a group merge by max like the
    * ungrouped sketch.
    */
  def groupedRegisters(df: DataFrame, groupCol: String, keyCol: String): DataFrame = {
    val br = udf((k: Long) => bucketRho(k))
    // filter on the CAST value (like registers()): a non-long-castable key
    // casts to null, and a null UDF input would emit a (g, null, null)
    // register row that inflates the group's nonempty count
    df.withColumn("__k", col(keyCol).cast("long"))
      .filter(col("__k").isNotNull)
      .select(col(groupCol).as("g"), br(col("__k")).as("br"))
      .select(col("g"), col("br._1").as("bucket"), col("br._2").as("rho"))
      .groupBy("g", "bucket").agg(max(col("rho")).as("rho"))
  }

  /** Per-group estimates (g, est_distinct) — [[estimate]]'s arithmetic,
    * grouped.
    */
  def groupedEstimate(regs: DataFrame): DataFrame =
    zsAndV(regs.groupBy("g").agg(znAndNonempty.head, znAndNonempty.tail: _*),
      keep = Seq(col("g")))
      .select(col("g"), estExpr.as("est_distinct"))

  private val Two55 = 36028797018963968L // 2^55

  private def znAndNonempty = Seq(
    sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${RhoEmpty} - rho)")
      .cast("decimal(38,0)")).as("zn"),
    count(lit(1)).as("nonempty"))

  private def zsAndV(agged: DataFrame,
      keep: Seq[org.apache.spark.sql.Column] = Seq.empty): DataFrame =
    agged.select(keep ++ Seq(
      (coalesce(col("zn"), lit(0L).cast("decimal(38,0)")) +
        (lit(M.toLong) - col("nonempty")).cast("decimal(38,0)") *
          lit(Two55).cast("decimal(38,0)")).as("zs"),
      (lit(M.toLong) - col("nonempty")).as("v")): _*)

  private def estExpr: org.apache.spark.sql.Column = {
    val raw = lit(AlphaM2) * lit(Two55.toDouble) / col("zs").cast("double")
    round(
      when(col("v") > 0 && raw <= lit(2.5 * M),
        lit(M.toDouble) * log(lit(M.toDouble) / col("v").cast("double")))
        .otherwise(raw),
      6)
  }
}

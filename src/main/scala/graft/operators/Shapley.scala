package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact Shapley-value channel attribution (Shapley 1953, applied to
  * conversion credit à la the classical marketing-attribution setup):
  * every user contributes their pre-conversion exposure SET, the
  * coalition value v(S) is the observed conversion rate of users with
  * exposure set exactly S, and each channel's credit is the exact
  * Shapley sum  φ_i = Σ_{S ⊆ C∖{i}} |S|!(|C|−1−|S|)!/|C|! ·
  * (v(S∪{i}) − v(S)).
  *
  * Exactness and scale share one trick: the data-proportional work is a
  * single groupBy(user) → groupBy(mask) reduction to the 2^|C| coalition
  * table (bounded — |C| is a handful of channels), and the Shapley
  * enumeration is pure arithmetic over that bounded table: factorial
  * weights as fixed-shape double divisions, v-rates rounded to 12,
  * per-channel sums through DECIMAL(28,12). The efficiency property
  * Σφ_i = v(C) − v(∅) holds exactly up to the 12-decimal grid (spec).
  */
object Shapley {

  /** Attribution over `events` (userCol, tsMsCol, channelCol) where the
    * boolean `conv` predicate (over the raw event row) marks conversion
    * events. Exposure = distinct non-conversion channels seen strictly
    * BEFORE the user's first conversion (all channels for
    * never-converters). `channels` fixes the universe and bit order —
    * at most 20 for the 2^n coalition table to stay bounded.
    *
    * Returns one row per channel: (channel, phi) with phi rounded to 6.
    */
  def attribution(events: DataFrame, userCol: String, tsMsCol: String,
      channelCol: String, conv: Column,
      channels: Seq[String]): DataFrame = {
    require(channels.nonEmpty && channels.size <= 20,
      s"need 1..20 channels, got ${channels.size}")
    require(channels.distinct == channels, "channels must be distinct")
    val n = channels.size
    val spark = events.sparkSession
    import spark.implicits._

    val firstConv = events.filter(conv)
      .select(col(userCol).as("u"), col(tsMsCol).as("ts"))
      .groupBy(col("u")).agg(min(col("ts")).as("fp"))
    val ev = events.select(col(userCol).as("u"), col(tsMsCol).as("ts"),
      col(channelCol).as("ch"))
    val exposed = events.filter(!conv)
      .select(col(userCol).as("u"), col(tsMsCol).as("ts"),
        col(channelCol).as("ch"))
      .join(firstConv, Seq("u"), "left")
      .filter(col("fp").isNull || col("ts") < col("fp"))
    val indicators = channels.zipWithIndex.map { case (c, i) =>
      max(when(col("ch") === c, lit(1L << i)).otherwise(lit(0L))).as(s"b$i")
    }
    val exposureMask = exposed.groupBy(col("u"))
      .agg(indicators.head, indicators.tail: _*)
      .withColumn("mask",
        channels.indices.map(i => col(s"b$i")).reduce(_ + _))
      .select(col("u"), col("mask"))
    // zero-exposure users (e.g. conversion-first) belong to v(∅)
    val masks = ev.select(col("u")).distinct()
      .join(exposureMask, Seq("u"), "left")
      .withColumn("mask", coalesce(col("mask"), lit(0L)))
      .join(firstConv, Seq("u"), "left")
      .withColumn("conv", col("fp").isNotNull.cast("long"))
    val coal = masks.groupBy(col("mask"))
      .agg(count(lit(1)).as("users"), sum(col("conv")).as("converted"))
    // dense 2^n coalition table; empty coalitions value 0
    val all = spark.range(1L << n).select(col("id").as("mask"))
      .join(coal, Seq("mask"), "left")
      .withColumn("v",
        coalesce(round(col("converted").cast("double") /
          col("users").cast("double"), 12), lit(0.0)))
      .select(col("mask"), col("v"))
    // Shapley enumeration: channels × subsets-without-the-channel
    val fact: IndexedSeq[Double] =
      (0 to 20).map(k => (1 to k).foldLeft(1.0)(_ * _.toDouble))
    val chDf = channels.zipWithIndex.toDF("channel", "bit")
    val pop = channels.indices.map(i =>
      shiftright(col("mask"), i).bitwiseAND(lit(1L))).reduce(_ + _)
    val pairs = chDf.crossJoin(all.select(col("mask"), col("v").as("v_s")))
      .filter(expr("shiftright(mask, bit) & 1") === 0)
      .withColumn("s", pop)
      .join(all.select(col("mask").as("mask_i"), col("v").as("v_si")),
        col("mask_i") === expr("mask + shiftleft(CAST(1 AS BIGINT), bit)"))
      .withColumn("w",
        element_at(array(fact.take(n + 1).map(lit): _*),
          (col("s") + 1).cast("int")) *
          element_at(array(fact.take(n + 1).map(lit): _*),
            (lit(n - 1) - col("s") + 1).cast("int")) / lit(fact(n)))
      .withColumn("term",
        round(col("w") * (col("v_si") - col("v_s")), 12)
          .cast("decimal(28,12)"))
    pairs.groupBy(col("channel"))
      .agg(sum(col("term")).as("phi_d"))
      .select(col("channel"),
        round(col("phi_d").cast("double"), 6).as("phi"))
  }
}

package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Absorbing Markov chain analysis over an event stream: estimate the
  * transition matrix from consecutive per-user events, then solve the
  * fundamental-matrix system (I − Q)·a = r EXACTLY with Cramer's rule —
  * the closed-form answer to "starting from state s, what is the
  * probability the user eventually absorbs into X rather than Y?".
  *
  * Restricted to 3 transient states so the solve is the fixed-shape 3×3
  * Cramer chain (the qa0 discipline — larger state spaces want an
  * iterative unrolled solve like q4b instead). The data-proportional
  * work is one lead() window per user and a bounded (from, to) count
  * table; rates snap to the 12-grid, so the oracle replays bit-exact.
  */
object AbsorbingChain {

  /** Absorption probabilities from each of exactly 3 `transient` states
    * into each of the two `absorbing` states. Events: (userCol, tsCol
    * ordering column, tieCol unique within user, stateCol). Transitions
    * out of absorbing states are ignored (they self-loop by definition);
    * rows whose state lies outside the 5 named states are rejected
    * loudly. Returns 3 rows: (state, p_first, p_second) for the two
    * absorbing states in the order given.
    */
  def absorption(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, stateCol: String, transient: Seq[String],
      absorbing: Seq[String]): DataFrame = {
    require(transient.size == 3, s"exactly 3 transient states, got $transient")
    require(absorbing.size == 2, s"exactly 2 absorbing states, got $absorbing")
    val states = transient ++ absorbing
    require(states.distinct == states, "states must be distinct")
    // "rejected loudly": a state outside the declared 5-state universe
    // would silently deflate absorption mass (its inbound transitions
    // stay in the denominator while feeding no q/r cell) — probe with one
    // bounded count aggregate (the Merge.incrementalSumAgg negatives-check
    // pattern) and refuse the whole input instead.
    val unknown = events
      .filter(!col(stateCol).isin(states: _*) || col(stateCol).isNull)
      .limit(1).count()
    require(unknown == 0L,
      s"events contain states outside the declared universe $states")
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    val tr = events
      .select(col(userCol), col(tsCol), col(tieCol), col(stateCol).as("st"))
      .withColumn("nxt", lead(col("st"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .filter(col("st").isin(transient: _*)) // absorbing rows self-loop
    val tot = tr.groupBy(col("st")).agg(count(lit(1)).as("ntot"))
    val rates = tr.groupBy(col("st"), col("nxt"))
      .agg(count(lit(1)).as("n"))
      .join(tot, Seq("st"))
      .withColumn("p",
        round(col("n").cast("double") / col("ntot").cast("double"), 12))
    // one-row matrix image: q_ij over transient, r_ik into absorbing
    val cellAggs = (for {
      (fi, i) <- transient.zipWithIndex
      (tj, j) <- states.zipWithIndex
    } yield {
      val nm = if (j < 3) s"q${i + 1}${j + 1}" else s"r${i + 1}${j - 2}"
      coalesce(max(when(col("st") === fi && col("nxt") === tj, col("p"))),
        lit(0.0)).as(nm)
    }).toSeq
    val m = rates.agg(cellAggs.head, cellAggs.tail: _*)
      // M = I − Q
      .withColumn("m11", lit(1.0) - col("q11"))
      .withColumn("m12", lit(0.0) - col("q12"))
      .withColumn("m13", lit(0.0) - col("q13"))
      .withColumn("m21", lit(0.0) - col("q21"))
      .withColumn("m22", lit(1.0) - col("q22"))
      .withColumn("m23", lit(0.0) - col("q23"))
      .withColumn("m31", lit(0.0) - col("q31"))
      .withColumn("m32", lit(0.0) - col("q32"))
      .withColumn("m33", lit(1.0) - col("q33"))
      .withColumn("det",
        col("m11") * (col("m22") * col("m33") - col("m23") * col("m32")) -
          col("m12") * (col("m21") * col("m33") - col("m23") * col("m31")) +
          col("m13") * (col("m21") * col("m32") - col("m22") * col("m31")))
    def solve(rc: String, out: String): DataFrame => DataFrame = df => df
      .withColumn(s"${out}1", round((
        col(rc + "1") * (col("m22") * col("m33") - col("m23") * col("m32")) -
          col("m12") * (col(rc + "2") * col("m33") - col("m23") * col(rc + "3")) +
          col("m13") * (col(rc + "2") * col("m32") - col("m22") * col(rc + "3"))
        ) / col("det"), 9))
      .withColumn(s"${out}2", round((
        col("m11") * (col(rc + "2") * col("m33") - col("m23") * col(rc + "3")) -
          col(rc + "1") * (col("m21") * col("m33") - col("m23") * col("m31")) +
          col("m13") * (col("m21") * col(rc + "3") - col(rc + "2") * col("m31"))
        ) / col("det"), 9))
      .withColumn(s"${out}3", round((
        col("m11") * (col("m22") * col(rc + "3") - col(rc + "2") * col("m32")) -
          col("m12") * (col("m21") * col(rc + "3") - col(rc + "2") * col("m31")) +
          col(rc + "1") * (col("m21") * col("m32") - col("m22") * col("m31"))
        ) / col("det"), 9))
    // r-columns per absorbing target: rc1 = r11/r21/r31 ... regroup names
    val withCols = m
      .withColumn("ra1", col("r11")).withColumn("ra2", col("r21"))
      .withColumn("ra3", col("r31"))
      .withColumn("rb1", col("r12")).withColumn("rb2", col("r22"))
      .withColumn("rb3", col("r32"))
    val solved = solve("rb", "pb")(solve("ra", "pa")(withCols))
    val rows = transient.zipWithIndex.map { case (st, i) =>
      struct(lit(st).as("state"),
        round(col(s"pa${i + 1}"), 6).as(s"p_${absorbing.head}"),
        round(col(s"pb${i + 1}"), 6).as(s"p_${absorbing(1)}"))
    }
    solved.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }

  /** Expected steps to absorption from each transient state: the same
    * (I − Q) Cramer solve with the all-ones right-hand side — t =
    * (I − Q)⁻¹·1, the fundamental matrix's row sums. Shares the full
    * [[absorption]] contract (3 transient + 2 absorbing states, loud
    * rejection of unknown states, 12-grid rates, 9-snapped solution).
    * Returns 3 rows: (state, expected_steps).
    */
  def expectedSteps(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, stateCol: String, transient: Seq[String],
      absorbing: Seq[String]): DataFrame = {
    require(transient.size == 3, s"exactly 3 transient states, got $transient")
    require(absorbing.size == 2, s"exactly 2 absorbing states, got $absorbing")
    val states = transient ++ absorbing
    require(states.distinct == states, "states must be distinct")
    val unknown = events
      .filter(!col(stateCol).isin(states: _*) || col(stateCol).isNull)
      .limit(1).count()
    require(unknown == 0L,
      s"events contain states outside the declared universe $states")
    val w = Window.partitionBy(userCol).orderBy(col(tsCol), col(tieCol))
    val tr = events
      .select(col(userCol), col(tsCol), col(tieCol), col(stateCol).as("st"))
      .withColumn("nxt", lead(col("st"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .filter(col("st").isin(transient: _*))
    val tot = tr.groupBy(col("st")).agg(count(lit(1)).as("ntot"))
    val rates = tr.groupBy(col("st"), col("nxt"))
      .agg(count(lit(1)).as("n"))
      .join(tot, Seq("st"))
      .withColumn("p",
        round(col("n").cast("double") / col("ntot").cast("double"), 12))
    val cellAggs = (for {
      (fi, i) <- transient.zipWithIndex
      (tj, j) <- transient.zipWithIndex
    } yield coalesce(
      max(when(col("st") === fi && col("nxt") === tj, col("p"))),
      lit(0.0)).as(s"q${i + 1}${j + 1}")).toSeq
    val m = rates.agg(cellAggs.head, cellAggs.tail: _*)
      .withColumn("m11", lit(1.0) - col("q11"))
      .withColumn("m12", lit(0.0) - col("q12"))
      .withColumn("m13", lit(0.0) - col("q13"))
      .withColumn("m21", lit(0.0) - col("q21"))
      .withColumn("m22", lit(1.0) - col("q22"))
      .withColumn("m23", lit(0.0) - col("q23"))
      .withColumn("m31", lit(0.0) - col("q31"))
      .withColumn("m32", lit(0.0) - col("q32"))
      .withColumn("m33", lit(1.0) - col("q33"))
      .withColumn("det",
        col("m11") * (col("m22") * col("m33") - col("m23") * col("m32")) -
          col("m12") * (col("m21") * col("m33") - col("m23") * col("m31")) +
          col("m13") * (col("m21") * col("m32") - col("m22") * col("m31")))
      .withColumn("o1", lit(1.0)).withColumn("o2", lit(1.0))
      .withColumn("o3", lit(1.0))
      .withColumn("t1", round((
        col("o1") * (col("m22") * col("m33") - col("m23") * col("m32")) -
          col("m12") * (col("o2") * col("m33") - col("m23") * col("o3")) +
          col("m13") * (col("o2") * col("m32") - col("m22") * col("o3"))
        ) / col("det"), 9))
      .withColumn("t2", round((
        col("m11") * (col("o2") * col("m33") - col("m23") * col("o3")) -
          col("o1") * (col("m21") * col("m33") - col("m23") * col("m31")) +
          col("m13") * (col("m21") * col("o3") - col("o2") * col("m31"))
        ) / col("det"), 9))
      .withColumn("t3", round((
        col("m11") * (col("m22") * col("o3") - col("o2") * col("m32")) -
          col("m12") * (col("m21") * col("o3") - col("o2") * col("m31")) +
          col("o1") * (col("m21") * col("m32") - col("m22") * col("m31"))
        ) / col("det"), 9))
    val rows = transient.zipWithIndex.map { case (st, i) =>
      struct(lit(st).as("state"),
        round(col(s"t${i + 1}"), 6).as("expected_steps"))
    }
    m.select(explode(array(rows: _*)).as("r")).select(col("r.*"))
  }
}

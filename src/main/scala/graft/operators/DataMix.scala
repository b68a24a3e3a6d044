package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Training-mix construction over a document corpus: deterministic sampling
  * (per-source mix weights) and token-budget sharding — the two transforms
  * that turn a deduplicated corpus into training input at 100 TB.
  *
  * Sampling is HASH-deterministic, not RNG-based: membership depends only on
  * (key, salt), so it is reproducible across runs, engines and partitionings
  * — re-running the pipeline yields the same mix (and the DuckDB oracle can
  * replay it exactly; md5 agrees across engines). Changing the salt redraws
  * the sample.
  */
object DataMix {

  /** First 8 md5 hex chars of (key, salt) — a uniform draw in [0, 2^32) as a
    * fixed-width lowercase hex string; comparing against [[hexThreshold]]
    * keeps an expected `rate` fraction. String comparison IS numeric
    * comparison here (fixed width, single case).
    */
  def hashDraw(key: Column, salt: String): Column =
    substring(md5(concat(key.cast("string"), lit(salt))), 1, 8)

  /** `rate` ∈ [0,1] → the 8-hex-digit threshold for [[hashDraw]]. */
  def hexThreshold(rate: Double): String = {
    require(rate >= 0.0 && rate <= 1.0, s"rate must be in [0,1], got $rate")
    f"${math.round(rate * 4294967296.0).min(4294967295L)}%08x"
  }

  /** rate-vs-draw predicate; rate ≥ 1.0 is literally keep-all — a strict
    * `<` against the capped "ffffffff" threshold would drop the ~1-in-4.3B
    * keys whose draw is exactly ffffffff.
    */
  private def keepAtRate(draw: Column, rate: Double): Column =
    if (rate >= 1.0) lit(true) else draw < lit(hexThreshold(rate))

  /** Keep an expected `rate` fraction of rows, deterministically by key. */
  def deterministicSample(
      df: DataFrame, keyCol: String, rate: Double, salt: String): DataFrame =
    df.filter(keepAtRate(hashDraw(col(keyCol), salt), rate))

  /** Weighted sample WITHOUT replacement (Efraimidis–Spirakis A-Res): the
    * top `k` rows by exponential key — rank ln(u)/w, monotone-equivalent to
    * the textbook u^(1/w), where u ∈ (0,1) is this row's [[hashDraw]]
    * mapped to the unit interval. Selection probability is proportional to
    * weight (exactly w_i/Σw for k = 1), the quality-weighted corpus
    * selection step ("sample by score, don't hard-threshold"). Same
    * (key, salt) ⇒ same sample across runs, partitionings and engines;
    * changing the salt redraws. Rows with non-positive weight are never
    * sampled (excluded up front — ln(u)/w flips sign there and would
    * otherwise rank garbage first). Scale: `orderBy().limit(k)` lowers to
    * TakeOrderedAndProject — per-partition heaps, O(k) per partition
    * shuffled, never a global sort.
    */
  /** The A-Res exponential key ln(u)/w, u = (draw32 + 0.5)/2^32 — centered
    * so u is never 0 (ln(0) = −Inf) nor 1. Shared by the global sample and
    * the per-group cap so the draw mapping (and its q4d/q4e oracle twins)
    * cannot diverge.
    */
  private def expKey(keyCol: String, weightCol: String, salt: String): Column = {
    val u = (conv(hashDraw(col(keyCol), salt), 16, 10).cast("double") + lit(0.5)) /
      lit(4294967296.0)
    log(u) / col(weightCol).cast("double")
  }

  /** Positive, comparable weight: NaN > 0 is TRUE under Spark's NaN
    * ordering and ln(u)/NaN = NaN sorts LARGEST under desc — without the
    * isnan guard, NaN-weight rows would deterministically fill the sample.
    */
  private def usableWeight(weightCol: String): Column =
    col(weightCol) > 0 && !isnan(col(weightCol).cast("double"))

  /** Refuse inputs whose columns collide with the operator's scratch
    * columns — withColumn would silently OVERWRITE the user's data and the
    * trailing drop would lose it (same guard shape as SkewJoin.salted's
    * __salt/__n/__i reservation).
    */
  private def requireNoScratchClash(df: DataFrame, reserved: String*): Unit = {
    val clash = df.columns.filter(reserved.contains)
    require(clash.isEmpty,
      s"input columns collide with sampling internals: ${clash.mkString(", ")}")
  }

  def weightedSampleTopK(
      df: DataFrame, keyCol: String, weightCol: String, k: Int,
      salt: String): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    requireNoScratchClash(df, "__wkey")
    df.filter(usableWeight(weightCol))
      .withColumn("__wkey", expKey(keyCol, weightCol, salt))
      .orderBy(col("__wkey").desc, col(keyCol))
      .limit(k)
      .drop("__wkey")
  }

  /** Deterministic train/val/test-style split: each row gets the FIRST
    * label whose cumulative weight its md5 draw falls under, so membership
    * depends only on (key, salt) — reproducible across runs, engines and
    * partitionings, and disjoint-and-total by construction (weights must
    * sum to 1). Changing the salt redraws the whole split; adding docs
    * never moves existing ones between splits (per-key draws are
    * independent) — the property that keeps a held-out set held out as the
    * corpus grows.
    */
  def deterministicSplit(
      df: DataFrame, keyCol: String, weights: Seq[(String, Double)],
      salt: String): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 >= 0.0),
      "weights must be non-negative")
    require(math.abs(weights.map(_._2).sum - 1.0) < 1e-9,
      s"weights must sum to 1, got ${weights.map(_._2).sum}")
    val cum = weights.scanLeft(0.0)(_ + _._2).tail
    val draw = hashDraw(col(keyCol), salt)
    // CASE ladder over cumulative hex thresholds; the last label is the
    // otherwise-branch so rounding in hexThreshold can never drop a row
    val labeled = weights.init.zip(cum.init).foldLeft(Option.empty[Column]) {
      case (acc, ((label, _), c)) =>
        val cond = draw < lit(hexThreshold(c))
        Some(acc match {
          case None => when(cond, lit(label))
          case Some(w) => w.when(cond, lit(label))
        })
    }
    val split = labeled match {
      case Some(w) => w.otherwise(lit(weights.last._1))
      case None => lit(weights.last._1)
    }
    df.withColumn("split", split)
  }

  /** Per-source mix: each source keeps its own expected fraction (sources
    * absent from `rates` are dropped — an explicit mix is a whitelist).
    * The draw is materialized once per row — N mix entries must not mean N
    * md5 evaluations in the corpus-scale filter.
    */
  def mixBySource(
      df: DataFrame, sourceCol: String, keyCol: String,
      rates: Map[String, Double], salt: String): DataFrame = {
    requireNoScratchClash(df, "__draw")
    val withDraw = df.withColumn("__draw", hashDraw(col(keyCol), salt))
    val keep = rates.foldLeft(lit(false)) { case (acc, (src, rate)) =>
      acc || (col(sourceCol) === src && keepAtRate(col("__draw"), rate))
    }
    withDraw.filter(keep).drop("__draw")
  }

  /** Per-group deterministic cap: keep at most `n` rows per group, chosen by
    * (hashDraw(key, salt), key) order — domain/source capping, the curation
    * op that bounds any one domain's contribution to a training mix (the
    * heavy-tail complement of [[mixBySource]]'s rate sampling). The kept
    * subset is a uniform pseudo-random draw, reproducible across runs,
    * engines and partitionings; changing the salt redraws it. One window
    * shuffle keyed on the group — groups are never globally sorted, and
    * map-side nothing precedes it, so cost is linear in the corpus with
    * per-group heaps bounded by group size (for pathological mega-groups,
    * pre-filter with [[deterministicSample]] at a rate that overshoots n,
    * then cap exactly).
    */
  def capPerGroup(
      df: DataFrame, groupCol: String, keyCol: String, n: Int,
      salt: String): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    requireNoScratchClash(df, "__draw", "__rn")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__draw"), col(keyCol))
    df.withColumn("__draw", hashDraw(col(keyCol), salt))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__draw", "__rn")
  }

  /** [[capPerGroup]] with WEIGHTED selection: each group keeps its at-most-n
    * rows drawn by the [[weightedSampleTopK]] exponential key ln(u)/w —
    * within a domain, higher-weight (higher-quality) docs survive the cap
    * with proportionally higher probability instead of uniformly at random.
    * The per-domain version of "sample by score": one window shuffle keyed
    * on the group, same cost shape as the uniform cap; non-positive weights
    * are never kept.
    */
  def weightedCapPerGroup(
      df: DataFrame, groupCol: String, keyCol: String, weightCol: String,
      n: Int, salt: String): DataFrame = {
    require(n > 0, s"n must be positive, got $n")
    requireNoScratchClash(df, "__wkey", "__rn")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col("__wkey").desc, col(keyCol))
    df.filter(usableWeight(weightCol))
      .withColumn("__wkey", expKey(keyCol, weightCol, salt))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= n)
      .drop("__wkey", "__rn")
  }

  /** Token-budget sharding: within each group (ordered by `orderCol`), docs
    * are assigned to consecutive bins by EXCLUSIVE prefix token count, so
    * each bin receives ~`budget` tokens (a doc straddling a boundary counts
    * toward the bin it starts in — the standard prefix-sum shard, one
    * window, no iteration; exact greedy packing would need a sequential
    * scan and buys little at corpus scale).
    *
    * `orderCol` MUST be unique within each group (use a content-derived id):
    * with ties, the ROWS-frame running sum depends on post-shuffle arrival
    * order and bin assignment stops being reproducible. Bin arithmetic is
    * exact integer division (no double rounding at any cumulative count).
    */
  def packByTokenBudget(
      df: DataFrame, groupCol: String, orderCol: String,
      tokensCol: String, budget: Long): DataFrame = {
    require(budget > 0, s"budget must be positive, got $budget")
    requireNoScratchClash(df, "__cum", "__start")
    val w = Window.partitionBy(col(groupCol)).orderBy(col(orderCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // exclusive prefix = __cum - tokens, staged as its own column so the
    // user-supplied column name is never interpolated into SQL text
    df.withColumn("__cum", sum(col(tokensCol)).over(w))
      .withColumn("__start", col("__cum") - col(tokensCol))
      .withColumn("bin", expr(s"__start div $budget").cast("bigint"))
      .drop("__cum", "__start")
  }

  /** Per-group quantile bands: each row gets its group-RELATIVE score band
    * 1..k (`ntile` over the group ordered by score) — the per-domain score
    * normalization step of mix construction ("keep each source's top
    * quartile" rather than one global cutoff, which would empty easy
    * domains and keep everything from hard ones; FineWeb-style per-dump
    * normalization).
    *
    * `keyCol` breaks score ties so banding is total-order deterministic and
    * replayable (same discipline as [[capPerGroup]]). `ntile` is ANSI
    * (remainder rows land in the leading bands identically in Spark and
    * DuckDB). One window per group — same shuffle shape as the cap.
    */
  def perGroupQuantileBands(
      df: DataFrame, groupCol: String, scoreCol: String, keyCol: String,
      k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = Window.partitionBy(col(groupCol))
      .orderBy(col(scoreCol), col(keyCol))
    df.withColumn("band", ntile(k).over(w).cast("int"))
  }

  /** Sketch-based twin of [[perGroupQuantileBands]] for the 100 TB regime:
    * instead of a full per-group sort (the ntile window shuffles AND sorts
    * every row), aggregate per-group cutoffs with `percentile_approx` (a
    * mergeable GK sketch — partial aggregation map-side, tiny merge), then
    * band by comparing each score against its group's k−1 broadcast
    * cutoffs. Two narrow passes, no per-row sort anywhere.
    *
    * Trade-off (why both exist): sketch cutoffs are approximate — band
    * edges can differ from [[perGroupQuantileBands]] near quantile
    * boundaries (DataMixSpec gates agreement ≥ 0.9 on the fixture), and
    * the sketch merge is not bit-stable across partitionings, so this
    * variant has no hash-exact oracle. Use the exact ntile form when the
    * group fits a sort; use this when one domain is a terabyte.
    */
  def perGroupQuantileBandsApprox(
      df: DataFrame, groupCol: String, scoreCol: String, k: Int,
      accuracy: Int = 10000): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val probs = array((1 until k).map(i => lit(i.toDouble / k)): _*)
    val cuts = df.groupBy(col(groupCol))
      .agg(percentile_approx(col(scoreCol), probs, lit(accuracy)).as("__cuts"))
    // null-SAFE join: groupBy puts null-group rows in their own cuts row
    // (exactly like the exact variant's window partition), so a plain
    // equi-join would silently drop them — the twins must agree on row set,
    // not just band edges
    df.join(broadcast(cuts.withColumnRenamed(groupCol, "__grp")),
        col(groupCol) <=> col("__grp"))
      .withColumn("band",
        (lit(1) + aggregate(col("__cuts"), lit(0),
          (acc, c) => acc + when(col(scoreCol) > c, 1).otherwise(0)))
          .cast("int"))
      .drop("__cuts", "__grp")
  }

  /** Proportional stratified sample: within each stratum, keep EXACTLY
    * ⌈n_g·num/den⌉ rows (so every non-empty stratum survives — the
    * "don't silently drop rare languages/domains" guarantee a plain
    * Bernoulli `deterministicSample` cannot give), chosen by the salted
    * hash order over `keyCol`. The per-stratum target is computed in
    * INTEGER arithmetic (⌈a/b⌉ = (a+b−1) div b) — no float boundary can
    * disagree across engines or machines.
    *
    * Scale shape: one map-side-combinable groupBy for stratum sizes,
    * broadcast-joined back (stratum domains are bounded — language ×
    * source, not document ids), then ONE row_number window keyed on the
    * stratum. The variable per-stratum limit rules out WindowGroupLimit
    * pushdown, so per-task state is bounded by stratum size, same
    * contract as [[capPerGroup]] — for pathological mega-strata,
    * pre-thin with [[deterministicSample]] overshooting the rate first.
    */
  def stratifiedSample(
      df: DataFrame, stratumCol: String, keyCol: String,
      num: Int, den: Int, salt: String): DataFrame = {
    require(num > 0 && den > 0 && num <= den,
      s"need 0 < num <= den, got $num/$den")
    requireNoScratchClash(df, "__draw", "__rn", "__target", "__strat")
    val sizes = df.groupBy(col(stratumCol).as("__strat"))
      .agg(expr(s"(COUNT(1) * $num + ${den - 1}) DIV $den").as("__target"))
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(col("__draw"), col(keyCol))
    df.join(broadcast(sizes), col(stratumCol) <=> col("__strat"))
      .withColumn("__draw", hashDraw(col(keyCol), salt))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= col("__target"))
      .drop("__draw", "__rn", "__target", "__strat")
  }
}
